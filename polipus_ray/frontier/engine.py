"""CrawlEngine — the reference's crawl session (takeover loop) as a
Ray Data wave-per-depth pipeline.

The reference's cyclic dataflow (fetch -> extract -> enqueue -> fetch,
lib/polipus.rb:166-264) becomes a driver-level BFS wave loop; each
round is one acyclic Dataset pipeline:

    read_parquet(active frontier parts)            [narrow columns]
      -> map_batches(prefetch_filter)     dequeue-side re-check:
         robots/whitelist/blacklist (should_be_visited? sans tracker,
         polipus.rb:186,375-395) + storage anti-join w/ TTL
         (page_exists?, :404-416) via batched seen-shard RPCs
      -> groupby(host_bucket).map_groups(Fetcher, concurrency=W)
         simulated fetch w/ redirect folding + per-host politeness
         (host affinity exact because one bucket = one group)
      -> side-effect hooks (on_page_error / on_page_downloaded)
      -> before_save hooks -> filter(storable)
      -> map_batches(mark_stored)  [shard manifest upsert]
      -> write_parquet(pages/round=R)              [idempotent]

    read_parquet(pages/round=R, columns=narrow)    [bytes NOT re-read]
      -> map_batches(link_extractor)    canonicalize + in-domain +
         per-page dedup + depth gate (page.rb:66-78, polipus.rb:239)
      -> groupby(url_hash).map_groups(first)   intra-round distinct,
         deterministic winner by (parent_seq, link_idx)  [A6]
      -> map_batches(candidate_filter)  robots/white/black ->
         TTL-expired bypass -> seen-shard check_and_add  [M14 order]
      -> sort(parent_seq, link_idx) -> assign global seq ->
         frontier spill parts (FIFO)               [O4]

Termination: empty frontier (exact, replacing the reference's 30 s
queue idle timeout).  Crawl ordering: the per-row ``seq`` column is
a faithful reconstruction of the reference's workers=1 FIFO order
(seeds first, then links in parent-processing order), verified against
the oracle simulator.  Checkpoint/resume: see ckpt/manifest.py.

Scale notes (10^10 frontier): the frontier is only ever resident as
the active slice (queue_items_limit rows) of parquet parts; pages
bytes flow straight from fetch to parquet and never enter a shuffle
(dedup/distinct run on narrow link projections); the only wide
shuffles per round are the two groupbys on narrow tables, both keyed
by the single global partitioning key family (host_bucket /
url_hash).  Seq assignment streams sorted survivors through the
driver (narrow columns) — the determinism cost; set
``deterministic_order=False`` to keep everything distributed and
order-keyed by (round, parent_seq, link_idx) instead.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..ckpt import CheckpointManager
from ..config import CrawlConfig
from ..fetch.fetcher import Fetcher
from ..robots import RobotsCache
from ..seen import SeenShardPool
from ..synth.world import load_world
from ..urltools import canonicalize, host_hash64, host_of, url_hash64
from .spill import FrontierSpill

_HTML_RE = re.compile(r"^(text/html|application/xhtml\+xml)\b")

FRONTIER_COLS = ["url", "host", "url_hash", "host_hash", "host_bucket", "referer", "depth", "seeded", "seq", "priority", "attempt", "user_data"]
_PAGE_NARROW = ["url", "host", "links", "depth", "seq", "code", "content_type", "error"]


def _i64(v: int) -> int:
    """64-bit hash -> int64 bit pattern (Arrow/parquet-friendly)."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _u64col(arr) -> np.ndarray:
    return np.asarray(arr, dtype=np.int64).view(np.uint64)


def frontier_table(rows: list[dict], num_buckets: int, include_qs: bool = True) -> pa.Table:
    """Build a frontier-schema Arrow table from row dicts with at least
    {url, referer, depth}; fills hashes/buckets/flags."""
    cols = {c: [] for c in FRONTIER_COLS}
    for r in rows:
        url = r["url"]
        host = host_of(url)
        cols["url"].append(url)
        cols["host"].append(host)
        cols["url_hash"].append(_i64(url_hash64(url, include_qs)))
        hh = host_hash64(host)
        cols["host_hash"].append(_i64(hh))
        cols["host_bucket"].append(hh % num_buckets)
        cols["referer"].append(r.get("referer", ""))
        cols["depth"].append(r.get("depth", 0))
        cols["seeded"].append(bool(r.get("seeded", False)))
        cols["seq"].append(r.get("seq", 0))
        cols["priority"].append(r.get("priority", 0))
        cols["attempt"].append(r.get("attempt", 0))
        cols["user_data"].append(r.get("user_data", "{}"))
    return pa.table(
        {
            "url": pa.array(cols["url"], pa.string()),
            "host": pa.array(cols["host"], pa.string()),
            "url_hash": pa.array(cols["url_hash"], pa.int64()),
            "host_hash": pa.array(cols["host_hash"], pa.int64()),
            "host_bucket": pa.array(cols["host_bucket"], pa.int32()),
            "referer": pa.array(cols["referer"], pa.string()),
            "depth": pa.array(cols["depth"], pa.int32()),
            "seeded": pa.array(cols["seeded"], pa.bool_()),
            "seq": pa.array(cols["seq"], pa.int64()),
            "priority": pa.array(cols["priority"], pa.int64()),
            "attempt": pa.array(cols["attempt"], pa.int32()),
            "user_data": pa.array(cols["user_data"], pa.string()),
        }
    )


# --------------------------------------------------------------------------
# stage factories (closures are cloudpickled to tasks; all captured state
# is small: compiled regexes, robots bodies, shard-pool handles)
# --------------------------------------------------------------------------


def _policy_mask(urls: list[str], hosts: list[str], robots: RobotsCache | None, follow, skip) -> np.ndarray:
    """should_be_visited? prefix (robots -> whitelist -> blacklist),
    lib/polipus.rb:375-384.  Patterns match url.path."""
    n = len(urls)
    keep = np.ones(n, dtype=bool)
    if robots is not None:
        keep &= np.fromiter((robots.allowed(u, h) for u, h in zip(urls, hosts)), dtype=bool, count=n)
    if follow or skip:
        paths = [urlsplit(u).path for u in urls]
        if follow:
            keep &= np.fromiter((any(rx.search(p) for rx in follow) for p in paths), dtype=bool, count=n)
        if skip:
            keep &= np.fromiter((not any(rx.search(p) for rx in skip) for p in paths), dtype=bool, count=n)
    return keep


def make_prefetch_filter(robots_bodies: dict, cfg: CrawlConfig, pool: SeenShardPool, now: int):
    robots = RobotsCache(robots_bodies, str(cfg.user_agent)) if cfg.obey_robots_txt else None
    follow = [re.compile(p) for p in cfg.follow_links_like]
    skip = [re.compile(p) for p in cfg.skip_links_like]
    ttl = cfg.ttl_page

    def prefetch_filter(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
        urls = batch["url"].to_pylist()
        hosts = batch["host"].to_pylist()
        keep = _policy_mask(urls, hosts, robots, follow, skip)
        # page_exists? (storage anti-join): seeds bypass; TTL re-admits
        uh = _u64col(batch["url_hash"])
        hh = _u64col(batch["host_hash"])
        exists, ts = pool.stored_info(uh, hh)
        expired = np.zeros(n, dtype=bool) if ttl is None else (exists & (ts >= 0) & ((now - ttl) > ts))
        seeded = np.asarray(batch["seeded"].to_numpy(zero_copy_only=False), dtype=bool)
        retry = np.asarray(batch["attempt"].to_numpy(zero_copy_only=False)) > 0
        keep &= seeded | retry | ~exists | expired
        return batch.filter(pa.array(keep))

    return prefetch_filter


def make_link_extractor(cfg: CrawlConfig, focus_crawl=None, num_buckets: int = 16):
    aliases = set(cfg.domain_aliases)
    inc = cfg.include_query_string_in_saved_page

    def link_extractor(batch: pa.Table) -> pa.Table:
        urls, hosts, urlh, hosth, buckets, refs, depths, pseqs, lidx = [], [], [], [], [], [], [], [], []
        rows = batch.to_pylist()
        for r in rows:
            if r.get("error"):
                continue
            if not cfg.depth_allowed(r["depth"]):
                continue
            if not _HTML_RE.search(r.get("content_type") or ""):
                continue  # links parsed only from HTML-ish pages (page.rb:87,126)
            raw_links = focus_crawl(r) if focus_crawl is not None else (r["links"] or [])
            page_url = r["url"]
            page_host = r["host"]
            seen_local: set[str] = set()
            li = 0
            for raw in raw_links:
                c = canonicalize(raw, page_url)
                if c is None:
                    continue
                h = host_of(c)
                if h != page_host and h not in aliases:
                    continue  # in-domain filter (page.rb:201-204)
                if c in seen_local:
                    continue  # per-page Set dedup (page.rb:68)
                seen_local.add(c)
                urls.append(c)
                hosts.append(h)
                urlh.append(_i64(url_hash64(c, inc)))
                hh = host_hash64(h)
                hosth.append(_i64(hh))
                buckets.append(hh % num_buckets)
                refs.append(page_url)
                depths.append(r["depth"] + 1)
                pseqs.append(r["seq"])
                lidx.append(li)
                li += 1
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "host": pa.array(hosts, pa.string()),
                "url_hash": pa.array(urlh, pa.int64()),
                "host_hash": pa.array(hosth, pa.int64()),
                "host_bucket": pa.array(buckets, pa.int32()),
                "referer": pa.array(refs, pa.string()),
                "depth": pa.array(depths, pa.int32()),
                "parent_seq": pa.array(pseqs, pa.int64()),
                "link_idx": pa.array(lidx, pa.int32()),
            }
        )

    return link_extractor


def make_candidate_filter(robots_bodies: dict, cfg: CrawlConfig, pool: SeenShardPool, now: int):
    robots = RobotsCache(robots_bodies, str(cfg.user_agent)) if cfg.obey_robots_txt else None
    follow = [re.compile(p) for p in cfg.follow_links_like]
    skip = [re.compile(p) for p in cfg.skip_links_like]
    ttl = cfg.ttl_page

    def candidate_filter(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
        urls = batch["url"].to_pylist()
        hosts = batch["host"].to_pylist()
        keep = _policy_mask(urls, hosts, robots, follow, skip)
        if not keep.any():
            return batch.filter(pa.array(keep))
        # among policy-passing rows: TTL-expired bypass the tracker
        # (should_be_visited? returns true BEFORE the tracker check,
        # polipus.rb:387-390), but enqueue still marks them visited
        # (:433) — check_and_add runs for every enqueued row.
        idx = np.flatnonzero(keep)
        uh = _u64col(batch["url_hash"])[idx]
        hh = _u64col(batch["host_hash"])[idx]
        if ttl is not None:
            exists, ts = pool.stored_info(uh, hh)
            expired = exists & (ts >= 0) & ((now - ttl) > ts)
        else:
            expired = np.zeros(len(idx), dtype=bool)
        seen = pool.check_and_add(uh, hh)
        sub_keep = expired | ~seen
        keep[idx] = sub_keep
        return batch.filter(pa.array(keep))

    return candidate_filter


def make_mark_stored(pool: SeenShardPool):
    def mark_stored(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            pool.mark_stored(_u64col(batch["url_hash"]), _u64col(batch["host_hash"]), batch["fetched_at"].to_numpy(zero_copy_only=False))
        return batch

    return mark_stored


# --------------------------------------------------------------------------


class CrawlEngine:
    """One crawl job over a synthetic world directory.

    Reference lifecycle parity (E1 in SURVEY.md §3): construct with
    config + hooks, ``crawl()`` = takeover, graceful stop via
    ``request_stop()`` (finish round -> checkpoint -> return)."""

    def __init__(self, world_dir: str, cfg: CrawlConfig, run_dir: str, pool: SeenShardPool | None = None, use_ray: bool = True):
        self.world = load_world(world_dir)
        self.cfg = cfg
        self.run_dir = run_dir
        self.num_buckets = self.world["num_buckets"]
        self.use_ray = use_ray
        os.makedirs(run_dir, exist_ok=True)
        self.pages_root = os.path.join(run_dir, "pages")
        os.makedirs(self.pages_root, exist_ok=True)
        self.spill = FrontierSpill(
            os.path.join(run_dir, "frontier"),
            adapter=cfg.queue_overflow_adapter,
            queue_items_limit=cfg.queue_items_limit,
            capped_max=cfg.overflow_capped_max,
        )
        self.pool = pool or SeenShardPool(
            num_shards=cfg.num_seen_shards,
            kind=cfg.seen_kind,
            capacity_per_shard=cfg.seen_capacity_per_shard,
            use_ray=use_ray,
        )
        self.ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))
        self.next_seq = 0
        self.round_no = 0
        self.clock_base = 1_000_000
        self.metrics: list[dict] = []
        self.stop_requested = False
        self._driver_fetcher: Fetcher | None = None
        # hooks (reference builder surface, polipus.rb:283-319)
        self._on_page_downloaded: list = []
        self._on_before_save: list = []
        self._on_page_error: list = []
        self._focus_crawl = None
        self._on_crawl_start: list = []
        self._on_crawl_end: list = []
        self.plugins: list = []

    # -- hook registration (names mirror the reference) -------------------
    def on_page_downloaded(self, fn):
        self._on_page_downloaded.append(fn)
        return self

    def on_before_save(self, fn):
        self._on_before_save.append(fn)
        return self

    def on_page_error(self, fn):
        self._on_page_error.append(fn)
        return self

    def focus_crawl(self, fn):
        self._focus_crawl = fn
        return self

    def on_crawl_start(self, fn):
        self._on_crawl_start.append(fn)
        return self

    def on_crawl_end(self, fn):
        self._on_crawl_end.append(fn)
        return self

    def request_stop(self):
        """Graceful stop (signal-handler analogue): the current round
        finishes, a checkpoint is written, crawl() returns."""
        self.stop_requested = True

    # -- seeding -----------------------------------------------------------
    def seed(self, urls: list[str] | None = None) -> None:
        urls = urls if urls is not None else self.world["seeds"]
        rows = []
        for u in urls:
            c = canonicalize(u)
            rows.append({"url": c, "referer": "", "depth": 0, "seeded": True, "seq": self.next_seq, "user_data": json.dumps({"p_seeded": True})})
            self.next_seq += 1
        self.spill.append_table(frontier_table(rows, self.num_buckets, self.cfg.include_query_string_in_saved_page))

    # -- checkpoint / resume ----------------------------------------------
    def _checkpoint(self) -> None:
        if not self.cfg.checkpoint:
            return
        state = {
            "next_seq": self.next_seq,
            "clock_base": self.clock_base,
            "spill": self.spill.state(),
            "metrics": self.metrics,
            "num_buckets": self.num_buckets,
        }
        self.ckpt.save(self.round_no, state, self.pool.snapshot_all())

    def resume(self) -> bool:
        loaded = self.ckpt.load()
        if loaded is None:
            return False
        state, blobs = loaded
        self.next_seq = state["next_seq"]
        self.clock_base = state["clock_base"]
        self.spill.load_state(state["spill"])
        self.metrics = state["metrics"]
        self.round_no = state["round"] + 1
        self.pool.restore_all(blobs)
        return True

    # -- the wave loop -----------------------------------------------------
    def crawl(self, max_rounds: int | None = None, resume: bool = False) -> dict:
        if resume:
            if not self.resume():
                raise RuntimeError("no checkpoint to resume from")
        elif self.spill.empty():
            self.seed()
        if self.spill.empty():
            return self.summary()  # takeover early-return (polipus.rb:169)
        for cb in self._on_crawl_start:
            cb(self)
        for p in self.plugins:
            getattr(p, "on_crawl_start", lambda e: None)(self)
        n = 0
        while not self.spill.empty():
            if max_rounds is not None and n >= max_rounds:
                break
            self._run_round()
            n += 1
            if self.stop_requested:
                break
        for cb in self._on_crawl_end:
            cb(self)
        for p in self.plugins:
            getattr(p, "on_crawl_end", lambda e: None)(self)
        return self.summary()

    def _now(self) -> int:
        if self.cfg.clock is not None:
            return int(self.cfg.clock())
        return self.clock_base + self.round_no * 10_000

    def _run_round(self) -> None:
        import ray
        import ray.data

        r = self.round_no
        now = self._now()
        active_paths, active_rows = self.spill.take_active()
        if not active_paths:
            self.round_no += 1
            return
        for p in self.plugins:
            getattr(p, "on_message_received", lambda e: None)(self)

        if 0 < active_rows <= int(self.cfg.small_round_threshold or 0):
            self._run_round_local(active_paths, active_rows, now)
            return

        ds = ray.data.read_parquet(active_paths)
        ds = ds.map_batches(
            make_prefetch_filter(self.world["robots"], self.cfg, self.pool, now),
            batch_format="pyarrow",
            batch_size=8192,
        )
        for p in self.plugins:
            getattr(p, "on_before_download", lambda e: None)(self)
        pages = ds.groupby("host_bucket").map_groups(
            Fetcher,
            fn_constructor_kwargs=dict(
                web_dir=self.world["web_dir"],
                robots_bodies=self.world["robots"],
                cfg=self.cfg,
                pool=self.pool,
                round_no=r,
                now=now,
                num_buckets=self.num_buckets,
            ),
            batch_format="pyarrow",
            concurrency=self.cfg.resolved_fetch_concurrency(),
            # fractional: the simulated fetch is lookup/IO-shaped; a pool
            # reserving whole CPUs starves the read/write stages (ray
            # guide pitfall) — sized so pool + other stages co-schedule
            num_cpus=0.5,
        )
        for p in self.plugins:
            getattr(p, "on_after_download", lambda e: None)(self)
        # mutating hooks stay in-pipeline (must be serializable, pure):
        # on_before_save may rewrite columns / unset storable
        # (polipus.rb:302-305, 227-229)
        for fn in self._on_before_save:
            pages = pages.map_batches(fn, batch_format="pyarrow", batch_size=8192)
        pages = pages.map_batches(_filter_storable, batch_format="pyarrow", batch_size=8192)
        pages = pages.map_batches(make_mark_stored(self.pool), batch_format="pyarrow", batch_size=8192)

        round_dir = os.path.join(self.pages_root, f"round={r}")
        if os.path.exists(round_dir):
            shutil.rmtree(round_dir)  # idempotent re-run of this round
        os.makedirs(round_dir, exist_ok=True)
        pages.write_parquet(round_dir)

        page_files = glob.glob(os.path.join(round_dir, "*.parquet"))
        self._dedup_round_output(page_files)
        stored_rows = sum(pq.read_metadata(f).num_rows for f in page_files) if page_files else 0
        error_rows = 0
        if page_files:
            errs = pa.concat_tables([pq.read_table(f, columns=["error"]) for f in page_files])
            error_rows = errs.num_rows - errs["error"].null_count

        # observe-only hooks run driver-side on the written round
        # (closures over driver state work; remote-task side effects
        # would be lost).  They see stored pages only — divergence
        # from the reference (which calls them on every page) noted.
        if (self._on_page_error and error_rows) or (self._on_page_downloaded and stored_rows):
            import pyarrow.compute as pc

            full = pa.concat_tables([pq.read_table(f) for f in page_files])
            if self._on_page_error and error_rows:
                err_t = full.filter(pc.is_valid(full["error"]))
                for fn in self._on_page_error:
                    fn(err_t)
            for fn in self._on_page_downloaded:
                fn(full)

        enqueued = 0
        if stored_rows > 0:
            links = ray.data.read_parquet(round_dir, columns=_PAGE_NARROW)
            cand = links.map_batches(
                make_link_extractor(self.cfg, self._focus_crawl, self.num_buckets),
                batch_format="pyarrow",
                batch_size=4096,
            )
            # intra-round distinct (A6): deterministic first discovery wins
            cand = cand.groupby("url_hash").map_groups(_first_discovery, batch_format="pyarrow")
            cand = cand.map_batches(
                make_candidate_filter(self.world["robots"], self.cfg, self.pool, now),
                batch_format="pyarrow",
                batch_size=8192,
            )
            enqueued += self._emit_frontier(cand, r)
        # bounded error retry (error pages as data, SURVEY.md §4 retries row)
        if self.cfg_retry_errors() > 0 and stored_rows > 0:
            enqueued += self._requeue_errors(round_dir, r)

        self.metrics.append(
            {
                "round": r,
                "active": active_rows,
                "stored": stored_rows,
                "errors": error_rows,
                "enqueued": enqueued,
                "spill_pending": self.spill.total_rows(),
                "now": now,
            }
        )
        for p in self.plugins:
            getattr(p, "on_message_processed", lambda e: None)(self)
        self.round_no += 1
        self._checkpoint()

    def _run_round_local(self, active_paths: list[str], active_rows: int, now: int) -> None:
        """Driver-side round for small frontiers (the BFS tail): the
        SAME stage callables as the distributed path, applied to one
        Arrow table — no cluster dispatch, identical semantics.  At
        100 TB scale the tail rounds of a crawl are tiny; paying
        full pipeline setup for 50 URLs is pure overhead."""
        r = self.round_no
        t = pa.concat_tables([pq.read_table(p) for p in active_paths])
        t = make_prefetch_filter(self.world["robots"], self.cfg, self.pool, now)(t)
        if self._driver_fetcher is None:
            self._driver_fetcher = Fetcher(
                web_dir=self.world["web_dir"],
                robots_bodies=self.world["robots"],
                cfg=self.cfg,
                pool=self.pool,
                round_no=r,
                now=now,
                num_buckets=self.num_buckets,
            )
        self._driver_fetcher.round_no = r
        self._driver_fetcher.now = now
        pages = self._driver_fetcher(t) if t.num_rows else self._driver_fetcher._empty()
        for fn in self._on_before_save:
            pages = fn(pages)
        pages = _filter_storable(pages)
        pages = make_mark_stored(self.pool)(pages)

        round_dir = os.path.join(self.pages_root, f"round={r}")
        if os.path.exists(round_dir):
            shutil.rmtree(round_dir)
        os.makedirs(round_dir, exist_ok=True)
        page_files = []
        if pages.num_rows:
            f = os.path.join(round_dir, "part-0.parquet")
            pq.write_table(pages, f, compression="zstd")
            page_files = [f]
        self._dedup_round_output(page_files)
        stored_rows = sum(pq.read_metadata(f).num_rows for f in page_files) if page_files else 0
        error_rows = 0
        if page_files:
            import pyarrow.compute as pc

            full = pa.concat_tables([pq.read_table(f) for f in page_files])
            error_rows = full.num_rows - full["error"].null_count
            if self._on_page_error and error_rows:
                err_t = full.filter(pc.is_valid(full["error"]))
                for fn in self._on_page_error:
                    fn(err_t)
            for fn in self._on_page_downloaded:
                fn(full)

        enqueued = 0
        if stored_rows > 0:
            narrow = pa.concat_tables([pq.read_table(f, columns=_PAGE_NARROW) for f in page_files])
            cand = make_link_extractor(self.cfg, self._focus_crawl, self.num_buckets)(narrow)
            if cand.num_rows:
                # intra-round distinct, first (parent_seq, link_idx) wins
                order = np.lexsort((cand["link_idx"].to_numpy(), cand["parent_seq"].to_numpy()))
                cand = cand.take(pa.array(order))
                _, first_idx = np.unique(cand["url_hash"].to_numpy(), return_index=True)
                cand = cand.take(pa.array(np.sort(first_idx)))
                cand = make_candidate_filter(self.world["robots"], self.cfg, self.pool, now)(cand)
            if cand.num_rows:
                order = np.lexsort((cand["link_idx"].to_numpy(), cand["parent_seq"].to_numpy()))
                cand = cand.take(pa.array(order))
                n = cand.num_rows
                ft = pa.table(
                    {
                        "url": cand["url"],
                        "host": cand["host"],
                        "url_hash": cand["url_hash"],
                        "host_hash": cand["host_hash"],
                        "host_bucket": cand["host_bucket"],
                        "referer": cand["referer"],
                        "depth": cand["depth"],
                        "seeded": pa.array([False] * n, pa.bool_()),
                        "seq": pa.array(np.arange(self.next_seq, self.next_seq + n), pa.int64()),
                        "priority": pa.array([0] * n, pa.int64()),
                        "attempt": pa.array([0] * n, pa.int32()),
                        "user_data": pa.array(["{}"] * n, pa.string()),
                    }
                )
                self.next_seq += n
                self.spill.append_table(ft)
                enqueued = n
        if self.cfg_retry_errors() > 0 and stored_rows > 0:
            enqueued += self._requeue_errors(round_dir, r)

        self.metrics.append(
            {
                "round": r,
                "active": active_rows,
                "stored": stored_rows,
                "errors": error_rows,
                "enqueued": enqueued,
                "spill_pending": self.spill.total_rows(),
                "now": now,
                "local": True,
            }
        )
        for p in self.plugins:
            getattr(p, "on_message_processed", lambda e: None)(self)
        self.round_no += 1
        self._checkpoint()

    def _dedup_round_output(self, page_files: list[str]) -> None:
        """Within-round uuid dedup, min-seq wins.  Arises only when a
        redirect source and its target are fetched in the same round:
        the reference's FIFO serialization makes the later message hit
        ``page_exists?`` (polipus.rb:209-213); concurrent groups can
        both store, so the deterministic loser rows are dropped here
        (cheap: narrow uuid/seq scan; rewrite only affected files)."""
        if not page_files:
            return
        import pyarrow.compute as pc

        narrow = []
        for f in page_files:
            t = pq.read_table(f, columns=["uuid", "seq"])
            narrow.append((f, t))
        import collections

        best: dict[str, int] = {}
        counts: collections.Counter = collections.Counter()
        for _, t in narrow:
            for u, s in zip(t["uuid"].to_pylist(), t["seq"].to_pylist()):
                counts[u] += 1
                if u not in best or s < best[u]:
                    best[u] = s
        dup_uuids = {u for u, c in counts.items() if c > 1}
        if not dup_uuids:
            return
        winners_marked = []
        for f, t in narrow:
            has_dup = any(u in dup_uuids for u in t["uuid"].to_pylist())
            if not has_dup:
                continue
            full = pq.read_table(f)
            keep = [u not in dup_uuids or s == best[u] for u, s in zip(full["uuid"].to_pylist(), full["seq"].to_pylist())]
            kept = full.filter(pa.array(keep))
            pq.write_table(kept, f, compression="zstd")
            win = kept.filter(pc.is_in(kept["uuid"], value_set=pa.array(list(dup_uuids))))
            if win.num_rows:
                winners_marked.append(win)
        # re-assert winners' fetched_at in the stored manifest (losers
        # may have overwritten it via mark_stored)
        for win in winners_marked:
            self.pool.mark_stored(
                _u64col(win["url_hash"]),
                _u64col(win["host_hash"]),
                win["fetched_at"].to_numpy(zero_copy_only=False),
            )

    def cfg_retry_errors(self) -> int:
        return int(getattr(self.cfg, "retry_errors", 0) or 0)

    def _emit_frontier(self, cand_ds, r: int) -> int:
        """Sorted survivors -> global seq -> spill parts.  Streams
        narrow rows through the driver (see module docstring)."""
        total = 0
        sorted_ds = cand_ds.sort(["parent_seq", "link_idx"])
        for b in sorted_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            n = b.num_rows
            if n == 0:
                continue
            t = pa.table(
                {
                    "url": b["url"],
                    "host": b["host"],
                    "url_hash": b["url_hash"],
                    "host_hash": b["host_hash"],
                    "host_bucket": b["host_bucket"],
                    "referer": b["referer"],
                    "depth": b["depth"],
                    "seeded": pa.array([False] * n, pa.bool_()),
                    "seq": pa.array(np.arange(self.next_seq, self.next_seq + n), pa.int64()),
                    "priority": pa.array([0] * n, pa.int64()),
                    "attempt": pa.array([0] * n, pa.int32()),
                    "user_data": pa.array(["{}"] * n, pa.string()),
                }
            )
            self.next_seq += n
            self.spill.append_table(t)
            total += n
        return total

    def _requeue_errors(self, round_dir: str, r: int) -> int:
        t = pa.concat_tables(
            [pq.read_table(f, columns=["url", "referer", "depth", "error", "seq", "user_data"]) for f in glob.glob(os.path.join(round_dir, "*.parquet"))]
        )
        import pyarrow.compute as pc

        errs = t.filter(pc.is_valid(t["error"]))
        if errs.num_rows == 0:
            return 0
        rows = []
        for rr in errs.to_pylist():
            rows.append({"url": rr["url"], "referer": rr["referer"], "depth": rr["depth"], "seq": self.next_seq, "attempt": 1, "user_data": rr["user_data"]})
            self.next_seq += 1
        # NOTE: single retry (attempt=1); attempt>0 bypasses the
        # exists-check at dequeue, mirroring the reference's
        # user-driven re-enqueue pattern (examples/error_handling.rb)
        ft = frontier_table(rows, self.num_buckets, self.cfg.include_query_string_in_saved_page)
        self.spill.append_table(ft)
        return ft.num_rows

    # -- results -----------------------------------------------------------
    def pages_files(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.pages_root, "round=*", "*.parquet")))

    def pages_table(self, columns: list[str] | None = None) -> pa.Table:
        fs = self.pages_files()
        if not fs:
            return pa.table({})
        return pa.concat_tables([pq.read_table(f, columns=columns) for f in fs])

    def pages_dataset(self, columns: list[str] | None = None):
        import ray.data

        return ray.data.read_parquet(self.pages_root, columns=columns)

    def summary(self) -> dict:
        stored = sum(m["stored"] for m in self.metrics)
        return {
            "rounds": len(self.metrics),
            "stored": stored,
            "errors": sum(m["errors"] for m in self.metrics),
            "enqueued": sum(m["enqueued"] for m in self.metrics),
            "seen": self.pool.counts()["seen"],
            "metrics": self.metrics,
        }


def _first_discovery(group: pa.Table) -> pa.Table:
    order = np.lexsort((group["link_idx"].to_numpy(), group["parent_seq"].to_numpy()))
    return group.take(pa.array([int(order[0])]))


def _filter_storable(batch: pa.Table) -> pa.Table:
    if "storable" not in batch.column_names or batch.num_rows == 0:
        return batch
    mask = np.asarray(batch["storable"].to_numpy(zero_copy_only=False), dtype=bool)
    return batch.filter(pa.array(mask))


