"""Crawl-operator query surface for the correctness driver.

Each function takes ``sf_dir`` and returns a Ray Dataset / Arrow
table whose semantics are reproducible in ANSI SQL over the
``documents`` view (see ``__ray_entry__.oracle_sql`` for the paired
statements; the web-graph derivation they share is documented in
synth/world.py).  Crawl results are memoized per (sf_dir, config)
under /tmp because the driver may invoke several queries that share
the same crawl."""

from __future__ import annotations

import hashlib
import os
import shutil

import pyarrow as pa

from ..config import CrawlConfig
from ..frontier.engine import CrawlEngine, make_link_extractor, make_prefetch_filter
from ..synth.world import load_world
from ..urltools import page_uuid
from .worlds import SQL_SPEC, sql_world_for

_RUNS = "/tmp/polipus_ray_runs"


def _crawled_pages(sf_dir: str, cfg: CrawlConfig, tag: str) -> CrawlEngine:
    world_dir = sql_world_for(sf_dir)
    key = hashlib.md5(f"{world_dir}|{tag}".encode()).hexdigest()[:12]
    run_dir = os.path.join(_RUNS, f"{tag}-{key}")
    done = os.path.join(run_dir, "DONE")
    eng = None
    if not os.path.exists(done):
        shutil.rmtree(run_dir, ignore_errors=True)
        eng = CrawlEngine(world_dir, cfg, run_dir)
        eng.crawl()
        with open(done, "w") as f:
            f.write("ok")
    if eng is None:
        eng = CrawlEngine.__new__(CrawlEngine)  # read-only view: just paths
        eng.pages_root = os.path.join(run_dir, "pages")
        eng.run_dir = run_dir
    return eng


def crawl_bfs_depth2(sf_dir: str) -> pa.Table:
    """Full engine crawl (robots on, depth_limit=2) on the SQL world;
    stored pages as (uuid, url, depth, code).  Oracle: recursive SQL
    reachability with min-depth semantics."""
    cfg = CrawlConfig(depth_limit=2, obey_robots_txt=True, checkpoint=False)
    eng = _crawled_pages(sf_dir, cfg, "bfs2")
    from ..frontier.engine import read_pages_dir

    t = read_pages_dir(eng.pages_root, columns=["uuid", "url", "depth", "code"])
    return t.sort_by("url")


def crawl_web_derivation(sf_dir: str):
    """The derived web graph itself: (doc_id, url, host, code,
    n_links).  Validates the world generator against the SQL
    derivation line by line."""
    import ray.data

    world_dir = sql_world_for(sf_dir)

    def stage(batch: pa.Table) -> pa.Table:
        links = batch["links"]
        n = [len(x) if x is not None else 0 for x in links.to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "url": batch["url"],
                "host": batch["host"],
                "code": batch["code"],
                "n_links": pa.array(n, pa.int64()),
            }
        )

    ds = ray.data.read_parquet(os.path.join(world_dir, "web"), columns=["doc_id", "url", "host", "code", "links"])
    return ds.map_batches(stage, batch_format="pyarrow")


def crawl_link_explode(sf_dir: str):
    """Link extraction (canonicalize + in-domain + per-page dedup) of
    the seed pages -> (url, link) rows, via the engine's real
    LinkExtractor stage."""
    import ray.data

    world_dir = sql_world_for(sf_dir)
    world = load_world(world_dir)
    cfg = CrawlConfig(depth_limit=False)
    extractor = make_link_extractor(cfg, None, world["num_buckets"])

    def to_page_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "url": batch["url"],
                "host": batch["host"],
                "links": batch["links"],
                "depth": pa.array([0] * n, pa.int32()),
                "seq": batch["doc_id"],
                "code": batch["code"],
                "content_type": batch["content_type"],
                "error": pa.array([None] * n, pa.string()),
            }
        )

    import pyarrow.compute as pc

    def seeds_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch["doc_id"], SQL_SPEC.num_seeds))

    ds = ray.data.read_parquet(os.path.join(world_dir, "web"), columns=["doc_id", "url", "host", "links", "code", "content_type"])
    cand = ds.map_batches(seeds_only, batch_format="pyarrow").map_batches(to_page_rows, batch_format="pyarrow").map_batches(extractor, batch_format="pyarrow")

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({"url": batch["referer"], "link": batch["url"]})

    return cand.map_batches(project, batch_format="pyarrow").sort(["url", "link"])


def crawl_robots_filter(sf_dir: str):
    """All page URLs gated through the robots filter (M11) -> allowed
    (doc_id, url) rows."""
    import ray.data

    world_dir = sql_world_for(sf_dir)
    world = load_world(world_dir)
    cfg = CrawlConfig(obey_robots_txt=True)
    from ..frontier.engine import _policy_mask
    from ..robots import RobotsCache

    robots_bodies = world["robots"]

    def stage(batch: pa.Table) -> pa.Table:
        robots = RobotsCache(robots_bodies, cfg.effective_user_agent())
        keep = _policy_mask(batch["url"].to_pylist(), batch["host"].to_pylist(), robots, [], [])
        return pa.table({"doc_id": batch["doc_id"], "url": batch["url"]}).filter(pa.array(keep))

    ds = ray.data.read_parquet(os.path.join(world_dir, "web"), columns=["doc_id", "url", "host"])
    return ds.map_batches(stage, batch_format="pyarrow")


def crawl_pattern_filter(sf_dir: str):
    """Whitelist/blacklist filtering (M9/M10): keep /p/ URLs, skip
    those whose path ends in 0."""
    import ray.data

    world_dir = sql_world_for(sf_dir)
    cfg = CrawlConfig(follow_links_like=[r"/p/"], skip_links_like=[r"0$"])
    import re

    from ..frontier.engine import _policy_mask

    follow = [re.compile(p) for p in cfg.follow_links_like]
    skip = [re.compile(p) for p in cfg.skip_links_like]

    def stage(batch: pa.Table) -> pa.Table:
        keep = _policy_mask(batch["url"].to_pylist(), batch["host"].to_pylist(), None, follow, skip)
        return pa.table({"doc_id": batch["doc_id"], "url": batch["url"]}).filter(pa.array(keep))

    ds = ray.data.read_parquet(os.path.join(world_dir, "web"), columns=["doc_id", "url", "host"])
    return ds.map_batches(stage, batch_format="pyarrow")


def crawl_uuids(sf_dir: str):
    """Storage uuid (MD5) column (M22) for every page URL."""
    import ray.data

    world_dir = sql_world_for(sf_dir)

    def stage(batch: pa.Table) -> pa.Table:
        uu = [page_uuid(u) for u in batch["url"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"], "url": batch["url"], "uuid": pa.array(uu, pa.string())})

    ds = ray.data.read_parquet(os.path.join(world_dir, "web"), columns=["doc_id", "url"])
    return ds.map_batches(stage, batch_format="pyarrow")


def crawl_phash_neardup(sf_dir: str):
    """Near-dup image suppression marks over the world's images
    (rows-only check; pytest oracle covers semantics)."""
    import ray.data

    from ..ops.images import phash_neardup_keep_first

    world_dir = sql_world_for(sf_dir)
    ds = ray.data.read_parquet(os.path.join(world_dir, "web"), columns=["doc_id", "phash"])
    return phash_neardup_keep_first(ds, id_col="doc_id")


_FIXTURES = "/tmp/polipus_ray_fixtures/decode_verify"


def ensure_decode_fixture(sf_dir: str) -> str:
    """Materialize the generator-backed expected table for
    ``crawl_decode_verify`` (scalar reference codec path — see
    synth/world.decode_expected_table) into the stable fixture dir the
    oracle SQL globs.  Files are keyed by the world_key (md5 of the
    sorted doc_id list), so several worlds coexist and regeneration is
    a no-op once the file exists."""
    import pyarrow.parquet as _pq

    docs = os.path.join(sf_dir, "documents.parquet")
    ids = _pq.read_table(docs, columns=["doc_id"])["doc_id"].to_numpy()
    import numpy as np

    wkey = hashlib.md5(",".join(str(int(x)) for x in np.sort(ids.astype(np.int64))).encode()).hexdigest()
    os.makedirs(_FIXTURES, exist_ok=True)
    # filename additionally keyed by the WorldSpec so a spec change
    # regenerates rather than serving a stale expected table; the
    # in-file world_key column stays doc-digest-only (the oracle SQL
    # recomputes THAT from the documents view)
    from dataclasses import asdict

    skey = hashlib.md5(str(sorted(asdict(SQL_SPEC).items())).encode()).hexdigest()[:8]
    path = os.path.join(_FIXTURES, f"expected_{wkey[:12]}_{skey}.parquet")
    if not os.path.exists(path):
        from ..synth.world import decode_expected_table

        tmp = path + ".tmp"
        _pq.write_table(decode_expected_table(docs, SQL_SPEC), tmp)
        os.replace(tmp, path)  # atomic: concurrent callers race safely
    return path


def crawl_decode_verify(sf_dir: str):
    """Image decode + integrity actor-pool stage over the world's
    payloads.  Output (doc_id, ok, phash_ok, lum_centi, n_px) is
    integer/bool-exact and checked against the generator-backed
    fixture (``ensure_decode_fixture``) — the expected table the world
    generator computes through the SCALAR codec path, which the oracle
    SQL reads back via read_parquet keyed on the documents view's
    doc_id digest."""
    import numpy as np
    import ray.data

    from ..ops.images import decode_stage

    ensure_decode_fixture(sf_dir)
    world_dir = sql_world_for(sf_dir)
    ds = ray.data.read_parquet(os.path.join(world_dir, "web"), columns=["doc_id", "bytes", "phash"])

    def quantize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lum = pc.fill_null(batch["mean_lum"], 0.0).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "ok": batch["ok"],
                "phash_ok": batch["phash_ok"],
                "lum_centi": pa.array(np.round(lum * 100).astype(np.int64), pa.int64()),
                "n_px": batch["n_px"],
            }
        )

    return decode_stage(ds, id_col="doc_id").map_batches(quantize, batch_format="pyarrow")


def crawl_host_stats(sf_dir: str) -> pa.Table:
    """Per-host rollup of the depth-2 BFS crawl output (the analytics
    read every crawl ops dashboard runs over the pages table): pages
    stored, 404 count, and min/max depth reached per host.  Reuses the
    memoized bfs2 crawl; the rollup reads only the three narrow
    columns and folds them in ONE argsort + reduceat pass (per-host
    partials over dictionary-encoded host codes) — no per-host rescan,
    so cost is O(pages log pages) regardless of host cardinality."""
    import numpy as np

    cfg = CrawlConfig(depth_limit=2, obey_robots_txt=True, checkpoint=False)
    eng = _crawled_pages(sf_dir, cfg, "bfs2")
    from ..frontier.engine import read_pages_dir

    t = read_pages_dir(eng.pages_root, columns=["host", "code", "depth"])
    # one-pass fold: factorize hosts to integer codes, sort ONCE, then
    # reduceat partials per host run (no per-host rescan of the array)
    henc = t["host"].combine_chunks().dictionary_encode()
    hcode = henc.indices.to_numpy()
    order = np.argsort(hcode, kind="mergesort")
    hc_s = hcode[order]
    code = t["code"].to_numpy()[order]
    depth = t["depth"].to_numpy()[order]
    new = np.ones(len(hc_s), bool)
    new[1:] = hc_s[1:] != hc_s[:-1]
    starts = np.flatnonzero(new)
    uh = np.asarray(henc.dictionary.to_pylist(), dtype=object)[hc_s[starts]]
    n_pages = np.add.reduceat(np.ones(len(hc_s), np.int64), starts)
    n_404 = np.add.reduceat((code == 404).astype(np.int64), starts)
    min_d = np.minimum.reduceat(depth, starts)
    max_d = np.maximum.reduceat(depth, starts)
    horder = np.argsort(uh, kind="mergesort")  # sorted-host output order
    return pa.table(
        {
            "host": pa.array(uh[horder], pa.string()),
            "n_pages": pa.array(n_pages[horder], pa.int64()),
            "n_404": pa.array(n_404[horder], pa.int64()),
            "min_depth": pa.array(min_d[horder].astype(np.int64), pa.int64()),
            "max_depth": pa.array(max_d[horder].astype(np.int64), pa.int64()),
        }
    )
