"""CLI: ``python -m polipus_ray <command>``.

Commands:
  world  --sf-dir DIR --out DIR [--pages N]     generate a synthetic web world
  crawl  --world DIR --run DIR [crawl options]  run a crawl (resumable)
  summary --run DIR                              print run metrics

Owns its Ray session (guarded init) — the library itself never calls
ray.init (driver contract, __ray_entry__.py docstring).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    """(ray, started_here): shut down only sessions we started.

    Address comes from $RAY_ADDRESS so the CLI is `ray job submit`
    compatible: inside a job the supervisor sets RAY_ADDRESS to the
    cluster and we attach to it; standalone (or with RAY_ADDRESS=local,
    as in the test sandbox) we start a fresh local instance."""
    import os

    import ray

    started = False
    if not ray.is_initialized():
        kwargs = {"address": os.environ.get("RAY_ADDRESS", "local"), "include_dashboard": False}
        if num_cpus and kwargs["address"] == "local":
            kwargs["num_cpus"] = num_cpus  # sizing applies only to an instance we own
        ray.init(**kwargs)
        started = True
    return ray, started


def cmd_world(args) -> int:
    from .synth.world import WorldSpec, write_world

    if args.pages:
        _init_ray(args.num_cpus)[0]
        from .synth.bench_world import write_world_ray

        spec = WorldSpec(hosts=args.hosts, out_degree=args.out_degree, num_seeds=args.hosts, redirect_mod=23)
        write_world_ray(args.out, f"{args.sf_dir}/documents.parquet", args.pages, spec=spec, num_buckets=args.hosts)
    else:
        write_world(args.out, f"{args.sf_dir}/documents.parquet", WorldSpec(redirect_mod=23))
    print(json.dumps({"world": args.out, "pages": args.pages or "sf-native"}))
    return 0


def cmd_crawl(args) -> int:
    ray, started = _init_ray(args.num_cpus)
    from .config import CrawlConfig
    from .frontier.engine import CrawlEngine

    depth = False if args.depth_limit in (None, -1) else args.depth_limit
    cfg = CrawlConfig(
        depth_limit=depth,
        obey_robots_txt=args.robots,
        workers=args.workers,
        deterministic_order=not args.relaxed,
        verify_payload=args.verify,
        queue_items_limit=args.queue_items_limit,
    )
    eng = CrawlEngine(args.world, cfg, args.run)
    if args.seed:
        eng.seed(args.seed)
    res = eng.crawl(resume=args.resume)
    print(json.dumps({k: res[k] for k in ("rounds", "stored", "errors", "enqueued", "seen")}))
    if started:
        ray.shutdown()
    return 0


def cmd_summary(args) -> int:
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(args.run, "pages", "round=*", "*.parquet")))
    rows = sum(pq.read_metadata(f).num_rows for f in files)
    ckpt = os.path.join(args.run, "ckpt", "LATEST")
    latest = None
    if os.path.exists(ckpt):
        with open(ckpt) as f:
            latest = json.load(f)["round"]
    print(json.dumps({"run": args.run, "page_files": len(files), "pages": rows, "latest_checkpoint_round": latest}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="polipus_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    w = sub.add_parser("world", help="generate a synthetic web world")
    w.add_argument("--sf-dir", required=True)
    w.add_argument("--out", required=True)
    w.add_argument("--pages", type=int, default=0, help="bench-scale page count (0 = sf-native small world)")
    w.add_argument("--hosts", type=int, default=256)
    w.add_argument("--out-degree", type=int, default=8)
    w.add_argument("--num-cpus", type=int, default=None)
    w.set_defaults(fn=cmd_world)

    c = sub.add_parser("crawl", help="run a crawl")
    c.add_argument("--world", required=True)
    c.add_argument("--run", required=True)
    c.add_argument("--depth-limit", type=int, default=-1, help="-1 = unlimited")
    c.add_argument("--workers", type=int, default=4)
    c.add_argument("--robots", action="store_true")
    c.add_argument("--relaxed", action="store_true", help="relaxed-order (cluster-scale) admission")
    c.add_argument("--verify", action="store_true", help="decode + phash-verify every payload")
    c.add_argument("--queue-items-limit", type=int, default=2_000_000)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--seed", nargs="*", default=None)
    c.add_argument("--num-cpus", type=int, default=None)
    c.set_defaults(fn=cmd_crawl)

    s = sub.add_parser("summary", help="print run metrics")
    s.add_argument("--run", required=True)
    s.set_defaults(fn=cmd_summary)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
