"""Incremental recrawl — the analogue of reference
examples/incremental.rb: a first takeover fills the store; a second
takeover with a TTL re-fetches only expired pages (and always the
seeds, p_seeded bypass).

Run from /root/repo:  python examples/incremental.py
"""

import tempfile

import ray

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


ray.init(address="local", num_cpus=8, include_dashboard=False)

from polipus_ray.config import CrawlConfig
from polipus_ray.frontier.engine import CrawlEngine
from polipus_ray.synth.world import WorldSpec, write_world

tmp = tempfile.mkdtemp(prefix="polipus_incr_")
write_world(f"{tmp}/world", "/root/testdata/sf0.001/documents.parquet", WorldSpec())

cfg = CrawlConfig(depth_limit=1, ttl_page=3600)
first = CrawlEngine(f"{tmp}/world", cfg, f"{tmp}/run1")
first.crawl()
print("first takeover stored:", first.pages_table(columns=["uuid"]).num_rows)

# second takeover shares the tracker + stored manifest (the pool);
# nothing has expired -> only the seeds are re-fetched
second = CrawlEngine(f"{tmp}/world", cfg, f"{tmp}/run2", pool=first.pool)
second.crawl()
print("second takeover (fresh TTL) stored:", second.pages_table(columns=["uuid"]).num_rows)

# force-expire everything (clock far in the future) -> full recrawl
cfg3 = CrawlConfig(depth_limit=1, ttl_page=60, clock=lambda: 99_000_000)
third = CrawlEngine(f"{tmp}/world", cfg3, f"{tmp}/run3", pool=first.pool)
third.crawl()
print("third takeover (all expired) stored:", third.pages_table(columns=["uuid"]).num_rows)
ray.shutdown()
