"""Error handling — the analogue of reference
examples/error_handling.rb: error pages are data (stored with an
`error` column), an on_page_error hook observes them, and
retry_errors re-enqueues them once.

Run from /root/repo:  python examples/error_handling.py
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

tmp = tempfile.mkdtemp(prefix="polipus_err_")
write_world(f"{tmp}/world", "/root/testdata/sf0.001/documents.parquet", WorldSpec())

eng = CrawlEngine(f"{tmp}/world", CrawlConfig(depth_limit=1, retry_errors=1), f"{tmp}/run")
eng.on_page_error(lambda errs: print(f"  error pages this round: {errs.num_rows} -> {errs['url'].to_pylist()}"))
# seed one URL that exists and one that will fail to resolve
eng.seed(["http://h2.test/p/2", "http://unreachable.test/boom"])
eng.crawl()

t = eng.pages_table(columns=["url", "code", "error"]).to_pylist()
print("stored:", len(t))
for r in t:
    if r["error"]:
        print("  error page kept in store:", r["url"], "->", r["error"])
ray.shutdown()
