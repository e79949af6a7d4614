"""Basic crawl — the analogue of reference examples/basic.rb:
seed a URL, follow only matching links, store pages, run hooks.

Run from /root/repo:  python examples/basic.py
"""

import tempfile

import ray

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


ray.init(address="local", num_cpus=8, include_dashboard=False)

import polipus_ray
from polipus_ray.synth.world import WorldSpec, write_world

tmp = tempfile.mkdtemp(prefix="polipus_basic_")
write_world(f"{tmp}/world", "/root/testdata/sf0.001/documents.parquet", WorldSpec(redirect_mod=23))


def configure(c):
    # equivalent of the on_page_downloaded block in basic.rb
    c.on_page_downloaded(lambda pages: print(f"  downloaded batch: {pages.num_rows} pages"))


eng = polipus_ray.crawler(
    "basic",
    ["http://h1.test/p/1"],
    world_dir=f"{tmp}/world",
    run_dir=f"{tmp}/run",
    depth_limit=2,
    obey_robots_txt=True,
    follow_links_like=[r"/p/"],
    configure=configure,
)
t = eng.pages_table(columns=["url", "depth", "code", "caption"])
print(f"stored {t.num_rows} pages; sample:")
for r in t.to_pylist()[:5]:
    print(" ", r["url"], r["code"], "depth", r["depth"])
ray.shutdown()
