"""CrawlEngine — the reference's crawl session (takeover loop) as a
Ray Data wave-per-depth pipeline.

The reference's cyclic dataflow (fetch -> extract -> enqueue -> fetch,
lib/polipus.rb:166-264) becomes a driver-level BFS wave loop.  Default
execution (``fetch_mode='pool'``) runs each round as ONE barrier over
a persistent fetch-actor pool:

  driver: read active frontier parts (narrow) -> scatter rows to the
  owning actors (fixed, size-balanced bucket->actor map)
  each actor: dequeue-side re-check (robots/whitelist/blacklist sans
  tracker, polipus.rb:186,375-395; storage anti-join + TTL, :404-416)
  -> simulated fetch with redirect folding + per-host politeness
  (exact: a host's bucket lives on one actor for the whole run)
  -> payload decode/phash verification -> mark-stored manifest upsert
  -> parquet part write [idempotent per round] -> link extraction with
  fused enqueue-policy filter
  driver: candidates sorted into FIFO discovery order -> seen-shard
  check_and_add (first-occurrence-wins = intra-round distinct A6 +
  tracker insert in one step) -> FIFO seq assignment -> frontier spill

``fetch_mode='dataset'`` expresses the same round as pure ray.data
pipelines (groupby(host_bucket).map_groups(Fetcher) -> write_parquet;
links via read_parquet -> map_batches), sharing the identical stage
callables; ``use_ray=False`` runs everything in-process.

The web table is broadcast once per run as per-bucket plasma objects;
fetch actors read them zero-copy and keep per-bucket caches +
politeness clocks across every round.

Termination: empty frontier (exact, replacing the reference's 30 s
queue idle timeout).  Crawl ordering: the per-row ``seq`` column
reconstructs the reference's workers=1 FIFO order, verified against
the oracle simulator.  Checkpoint/resume: see ckpt/manifest.py.

Scale notes (10^10 frontier): the frontier is only ever resident as
the active slice (queue_items_limit rows) of parquet parts; page
bytes flow fetch -> parquet and never enter a shuffle; the only
all-to-all per round is the narrow groupby(host_bucket) frontier
shuffle.  Candidate dedup/seq-assignment streams narrow link rows
through the driver — the determinism cost; at larger-than-driver
candidate volumes move distinct back to a groupby (the callable in
stages.py is schedule-agnostic) and accept order keyed by
(round, parent_seq, link_idx)."""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..ckpt import CheckpointManager
from ..config import CrawlConfig
from ..fetch.fetcher import _FETCH_COLUMNS, Fetcher
from ..seen import SeenShardPool
from ..synth.world import load_world
from ..urltools import canonicalize
from .spill import FrontierSpill
from .stages import (
    FRONTIER_COLS,
    PAGE_NARROW,
    _i64,
    _policy_mask,
    _u64col,
    distinct_candidates,
    filter_storable,
    frontier_table,
    make_link_extractor,
    make_mark_stored,
    make_prefetch_filter,
    tracker_admit,
)

# backwards-compat re-exports (pipelines/ and tests import from here)
__all__ = [
    "CrawlEngine",
    "frontier_table",
    "make_prefetch_filter",
    "make_link_extractor",
    "_policy_mask",
    "read_pages_dir",
    "load_tombstones",
]


def load_tombstones(pages_root: str) -> set[tuple[int, int]]:
    """Union of per-round tombstone sidecars: {(url_hash, seq)} of
    same-round redirect-collision loser rows (see
    CrawlEngine._dedup_round_output)."""
    out: set[tuple[int, int]] = set()
    for f in glob.glob(os.path.join(pages_root, "round=*", "_TOMBSTONES.json")):
        with open(f) as fh:
            out.update((a, b) for a, b in json.load(fh))
    return out


def _filter_tombstones(t: pa.Table, tombs: set[tuple[int, int]]) -> pa.Table:
    if not tombs or t.num_rows == 0:
        return t
    h = t["url_hash"].to_numpy()
    s = t["seq"].to_numpy()
    keep = np.fromiter(((a, b) not in tombs for a, b in zip(h.tolist(), s.tolist())), dtype=bool, count=len(h))
    return t.filter(pa.array(keep)) if not keep.all() else t


def read_pages_dir(pages_root: str, columns: list[str] | None = None) -> pa.Table:
    """Read a pages directory with tombstones applied — the canonical
    way to consume crawl output driver-side."""
    fs = sorted(glob.glob(os.path.join(pages_root, "round=*", "*.parquet")))
    if not fs:
        return pa.table({})
    tombs = load_tombstones(pages_root)
    read_cols = columns
    if tombs and columns is not None:
        read_cols = list(dict.fromkeys(list(columns) + ["url_hash", "seq"]))
    t = pa.concat_tables([pq.read_table(f, columns=read_cols) for f in fs])
    if tombs:
        t = _filter_tombstones(t, tombs)
        if columns is not None:
            t = t.select(columns)
    return t


def _single_node() -> bool:
    """True when the Ray cluster is (or will be, in local mode) one
    node — the plasma-frontier mode's locality precondition."""
    try:
        import ray

        if not ray.is_initialized():
            return True  # local auto-init is always single-node
        return len([n for n in ray.nodes() if n.get("Alive", True)]) <= 1
    except Exception:  # pragma: no cover — defensive introspection
        return True


_EMIT_FILE_TASK = None


def _emit_file_task():
    """Lazily-decorated remote task (engine must import without an
    initialized Ray): dataset-mode analogue of Fetcher.emit_frontier —
    reads its OWN spooled candidate file, takes the admitted rows,
    stamps the driver-assigned seqs and writes chunked spill parts."""
    global _EMIT_FILE_TASK
    if _EMIT_FILE_TASK is None:
        import ray

        @ray.remote(num_cpus=0.25)
        def emit_frontier_from_file(path: str, loc, seqs, spill_path: str):
            cand = pq.read_table(path)
            sub = cand.take(pa.array(np.asarray(loc, dtype=np.int64)))
            n = sub.num_rows
            ft = pa.table(
                {
                    "url": sub["url"],
                    "host": sub["host"],
                    "url_hash": sub["url_hash"],
                    "host_hash": sub["host_hash"],
                    "host_bucket": sub["host_bucket"],
                    "referer": sub["referer"],
                    "depth": sub["depth"],
                    "seeded": pa.array(np.zeros(n, dtype=bool)),
                    "seq": pa.array(np.asarray(seqs, dtype=np.int64), pa.int64()),
                    "priority": pa.array(np.zeros(n, dtype=np.int64)),
                    "attempt": pa.array(np.zeros(n, dtype=np.int32)),
                    "user_data": pa.array(["{}"] * n, pa.string()),
                }
            )
            out = []
            for off in range(0, n, 16384):
                chunk = ft.slice(off, 16384)
                cp = spill_path if off == 0 else spill_path.replace(".parquet", f"-{off // 16384}.parquet")
                pq.write_table(chunk, cp, compression="lz4")
                out.append({"path": cp, "rows": chunk.num_rows})
            return out

        _EMIT_FILE_TASK = emit_frontier_from_file
    return _EMIT_FILE_TASK


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
        # enable per-part bucket histograms (slice-exact prebalance)
        self.spill.num_buckets = self.num_buckets
        # plasma frontier: with checkpointing OFF (nothing re-reads
        # parts after a crash) and the pool scheduler, spill parts are
        # Ray objects instead of parquet files — no lz4 encode/decode,
        # no file IO, zero-copy actor reads.  Checkpointable runs and
        # the dataset scheduler (ray.data.read_parquet input) keep
        # parquet parts.  Locality: parts are ROUTED by their bucket
        # histograms (see _fetch_store_pool), and a part's rows are
        # mostly links of pages its producing actor fetched (same-host
        # links), so most parts route back to their producer — on a
        # multi-node cluster the object already lives on the consuming
        # node and the old W-way full-frontier broadcast (ADVICE r3)
        # does not occur.  Auto mode still gates on _single_node()
        # (conservative default for untested real-cluster epochs);
        # cfg.plasma_frontier=True lifts the gate — the 2-virtual-node
        # measurement (tests/multinode_script.py, BASELINE.md r5) runs
        # the plasma frontier across separate object stores and counts
        # the cross-node part transfers the locality routing avoids.
        if cfg.plasma_frontier is not None:
            self.spill.plasma = bool(use_ray and not cfg.checkpoint and cfg.fetch_mode == "pool" and cfg.plasma_frontier)
        else:
            self.spill.plasma = bool(use_ray and not cfg.checkpoint and cfg.fetch_mode == "pool" and _single_node())
        self.route_log: list[dict] = []  # filled when cfg.route_telemetry
        _n_shards = cfg.resolved_num_seen_shards()
        _cap = cfg.seen_capacity_per_shard
        if _cap is None:
            # auto-provision from the world manifest (1.25x URLs over
            # the shards; min 1M = reference bloomfilter default) — an
            # under-provisioned cuckoo degrades into stash scans
            _rows = int(self.world.get("rows", 0) or 0)
            _cap = max(1_000_000, _rows * 5 // (4 * _n_shards))
        self.pool = pool or SeenShardPool(
            num_shards=_n_shards,
            kind=cfg.seen_kind,
            capacity_per_shard=_cap,
            use_ray=use_ray,
        )
        self.ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))
        _required = {"uuid", "url", "host", "host_bucket", "url_hash", "host_hash", "seq", "depth", "code", "content_type", "error", "links", "fetched_at"}
        bad = _required & set(cfg.storage_except or [])
        if bad:
            raise ValueError(f"storage_except may not drop engine-required columns: {sorted(bad)}")
        self.next_seq = 0
        self.round_no = 0
        self.clock_base = 1_000_000
        self.metrics: list[dict] = []
        self.stop_requested = False
        self._driver_fetcher: Fetcher | None = None
        self._fetch_actors: list | None = None
        self._bucket_lut: np.ndarray | None = None
        self._web_refs: dict | None = None
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
        """Graceful stop (signal-handler analogue, reference
        signal_handler.rb): the current round finishes, a checkpoint
        is written, crawl() returns."""
        self.stop_requested = True

    # -- web broadcast -----------------------------------------------------
    def _ensure_web_refs(self) -> dict | None:
        """Broadcast the web table per bucket into the object store,
        once per run.  Fetch actors read it zero-copy every round."""
        if not self.use_ray:
            return None
        if self._web_refs is None:
            import ray

            # num_cpus=0: the broadcast reads are short IO+decompress
            # tasks and MUST stay schedulable after the fetch-actor
            # pool has reserved nearly all CPUs — with a reservation
            # they deadlock small clusters (4 actors x 0.9 on 4 CPUs
            # leaves 0.4 < the task's share; preload then waits forever)
            @ray.remote(num_cpus=0)
            def _read_bucket(files: list[str]) -> pa.Table:
                return pa.concat_tables([pq.read_table(f, columns=_FETCH_COLUMNS) for f in files]).combine_chunks()

            # parallel read; each task's return lands in plasma and the
            # ObjectRef IS the broadcast handle (no driver copy).
            # Submission is WINDOWED: num_cpus=0 tasks have no
            # scheduling bound, so submitting all buckets at once made
            # the raylet spawn a worker per task (~150 transient
            # processes — the round-3 "worker explosion" watch item);
            # keeping <= 2x CPUs in flight reuses a bounded worker set
            # at the same wall time.
            cpus = int(ray.cluster_resources().get("CPU", 8) or 8)
            window = max(8, 2 * cpus)
            refs = {}
            pending: list = []
            for d in sorted(glob.glob(os.path.join(self.world["web_dir"], "host_bucket=*"))):
                b = int(d.split("=")[1])
                files = sorted(glob.glob(os.path.join(d, "*.parquet")))
                r = _read_bucket.remote(files)
                refs[b] = r
                pending.append(r)
                if len(pending) >= window:
                    _, pending = ray.wait(pending, num_returns=1)
            self._web_refs = refs
        return self._web_refs

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
        # _checkpoint() runs AFTER round_no was incremented, so the
        # saved value already names the next round to run.  (A +1 here
        # would skip a round label on graceful-stop resume and, after a
        # mid-round crash, leave the partial round=R directory in place
        # — never re-run — duplicating its rows in pages_table.)
        self.round_no = state["round"]
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
        try:
            while not self.spill.empty():
                if max_rounds is not None and n >= max_rounds:
                    break
                self._run_round()
                n += 1
                if self.stop_requested:
                    break
        except BaseException:
            # a mid-round crash must not leak the fetch-actor pool
            # (their reserved CPUs would starve every later pipeline)
            self.release_pool()
            raise
        for cb in self._on_crawl_end:
            cb(self)
        for p in self.plugins:
            getattr(p, "on_crawl_end", lambda e: None)(self)
        self.release_pool()
        return self.summary()

    def release_pool(self) -> None:
        """Free the persistent fetch actors (their reserved CPUs would
        otherwise starve later pipelines in the same Ray session).
        Recreated on demand if crawl() runs again."""
        if self._fetch_actors:
            import ray

            for a in self._fetch_actors:
                ray.kill(a)
        self._fetch_actors = None

    def _now(self) -> int:
        if self.cfg.clock is not None:
            return int(self.cfg.clock())
        return self.clock_base + self.round_no * 10_000

    # -- one round ---------------------------------------------------------
    def _run_round(self) -> None:
        import time as _time

        _t0 = _time.perf_counter()
        r = self.round_no
        now = self._now()
        active_paths, active_rows = self.spill.take_active()
        if not active_paths:
            self.round_no += 1
            return
        for p in self.plugins:
            getattr(p, "on_message_received", lambda e: None)(self)
            getattr(p, "on_before_download", lambda e: None)(self)

        round_dir = os.path.join(self.pages_root, f"round={r}")
        if os.path.exists(round_dir):
            shutil.rmtree(round_dir)  # idempotent re-run of this round
        os.makedirs(round_dir, exist_ok=True)

        # pool mode: every round goes through the persistent actor pool
        # (a pool barrier on a tiny round is ~0.1 s; the driver-side
        # path would pull whole web buckets into the driver).  The
        # driver-local path serves use_ray=False engines and the BFS
        # tail of dataset mode.
        local = (not self.use_ray) or (self.cfg.fetch_mode == "dataset" and 0 < active_rows <= int(self.cfg.small_round_threshold or 0))
        cand: pa.Table | None = None  # pool/local modes return candidates inline
        self._last_counts = None
        self._last_enqueued = None  # set by relaxed-order pool rounds
        self._last_keys = None  # narrow dedup keys from pool rounds
        self._last_unstorable = None  # narrow unstorable pages (hook parity)
        self._last_phases = None  # per-phase driver timings (pool rounds)
        self._round_deduped = False  # set when every actor deduped in-round
        if local:
            cand = self._fetch_store_local(active_paths, round_dir, r, now)
        elif self.cfg.fetch_mode == "pool":
            cand = self._fetch_store_pool(active_paths, round_dir, r, now)
        else:
            self._fetch_store_distributed(active_paths, round_dir, r, now)
        for p in self.plugins:
            getattr(p, "on_after_download", lambda e: None)(self)

        _t1 = _time.perf_counter()
        page_files = glob.glob(os.path.join(round_dir, "*.parquet"))
        # pool rounds dedup in-actor (duplicate finals are same-host =>
        # same actor); the driver pass remains for local/dataset paths
        removed = 0 if self._round_deduped else self._dedup_round_output(page_files)
        _t2 = _time.perf_counter()
        if self._last_counts is not None:
            stored_rows = self._last_counts[0] - removed
            error_rows = self._last_counts[1]
        else:
            stored_rows = sum(pq.read_metadata(f).num_rows for f in page_files) if page_files else 0
            error_rows = 0
            if page_files:
                errs = pa.concat_tables([pq.read_table(f, columns=["error"]) for f in page_files])
                error_rows = errs.num_rows - errs["error"].null_count

        # observe-only hooks run driver-side on the written round
        # (remote-task side effects on driver closures would be lost).
        # Reads are BYTES-FREE (payloads never enter the driver; set
        # cfg.hook_columns to widen/narrow) and unstorable pages are
        # included via the actors' narrow returns — reference parity:
        # hooks fire on every processed page (polipus.rb:221-237).
        if self._on_page_error or self._on_page_downloaded:
            extras = [t for t in (self._last_unstorable or []) if t is not None and t.num_rows]
            unst_dir = os.path.join(self.run_dir, "unstorable", f"round={r}")
            if os.path.isdir(unst_dir):  # dataset-mode spool
                extras += [pq.read_table(f) for f in glob.glob(os.path.join(unst_dir, "*.parquet"))]
            tables = []
            if page_files and (stored_rows or error_rows):
                if self.cfg.hook_columns is not None:
                    cols = list(self.cfg.hook_columns)
                else:
                    cols = [c for c in pq.read_schema(page_files[0]).names if c != "bytes"]
                tables = [pq.read_table(f, columns=cols) for f in page_files]
                pages_schema = pq.read_schema(page_files[0])

                def _pad(t: pa.Table) -> pa.Table:
                    # unstorable pages lack payload columns (e.g. a
                    # user hook_columns including 'bytes'): pad with
                    # typed nulls so they still reach the hooks instead
                    # of silently vanishing
                    if set(cols) <= set(t.column_names):
                        return t.select(cols)
                    arrays = []
                    for c in cols:
                        if c in t.column_names:
                            arrays.append(t[c])
                        else:
                            typ = pages_schema.field(c).type if pages_schema.get_field_index(c) >= 0 else pa.null()
                            arrays.append(pa.nulls(t.num_rows, type=typ))
                    return pa.table(dict(zip(cols, arrays)))

                extras = [_pad(t) for t in extras]
            full = pa.concat_tables(tables + extras) if (tables or extras) else None
            if full is not None and full.num_rows:
                import pyarrow.compute as pc

                if self._on_page_error:
                    err_t = full.filter(pc.is_valid(full["error"]))
                    if err_t.num_rows:
                        for fn in self._on_page_error:
                            fn(err_t)
                for fn in self._on_page_downloaded:
                    fn(full)

        _t3 = _time.perf_counter()
        enqueued = 0
        if self._last_enqueued is not None:
            enqueued = self._last_enqueued  # relaxed mode: admitted in-actor
        elif stored_rows > 0 and cand is None and not local and self.use_ray and self.cfg.fetch_mode == "dataset":
            # dataset-mode scale path: spooled candidates + narrow-key
            # admission (no driver materialization, same property as
            # pool mode)
            enqueued += self._admit_candidate_files(round_dir, r, now)
        elif stored_rows > 0:
            if cand is None:
                cand = self._extract_candidates(round_dir, local)
            # intra-round distinct (A6) collapses into the tracker
            # probe: candidates sorted into FIFO discovery order first,
            # so the shard-side check_and_add's first-occurrence-wins
            # IS the deterministic winner (the reference's enqueue
            # serialization).  distinct_candidates() remains available
            # for standalone use.
            if cand.num_rows:
                order = np.lexsort((cand["link_idx"].to_numpy(), cand["parent_seq"].to_numpy()))
                cand = cand.take(pa.array(order))
            cand = tracker_admit(cand, self.pool, self.cfg, now)
            enqueued += self._emit_frontier(cand, presorted=True)
        if self.cfg_retry_errors() > 0 and stored_rows > 0:
            enqueued += self._requeue_errors(round_dir, r)
        if self.cfg.storage == "devnull":
            # DevNull store (reference storage/dev_null.rb): pages feed
            # link extraction then vanish; exists? stays always-false
            shutil.rmtree(round_dir, ignore_errors=True)

        _t4 = _time.perf_counter()
        if self._last_phases is not None:
            # driver-side round segments outside the fetch barrier (the
            # scaling-relevant serial fraction; see BASELINE.md r3)
            self._last_phases["drv_dedup_out"] = _t2 - _t1
            self._last_phases["drv_hooks_admit"] = _t4 - _t3
            self._last_phases["round_total"] = _t4 - _t0
        self.metrics.append(
            {
                "round": r,
                "active": active_rows,
                "stored": stored_rows,
                "errors": error_rows,
                "enqueued": enqueued,
                "spill_pending": self.spill.total_rows(),
                "now": now,
                "local": local,
                "phases": {k: round(v, 4) for k, v in (self._last_phases or {}).items()},
                **({"actors": self._last_actor_dump} if getattr(self, "_last_actor_dump", None) else {}),
            }
        )
        self._last_actor_dump = None
        for p in self.plugins:
            getattr(p, "on_message_processed", lambda e: None)(self)
        self.round_no += 1
        self._checkpoint()
        # consumed spill parts are deletable once no retained
        # checkpoint references them (crash-resume needs referenced
        # ones); with checkpointing off nothing ever re-reads them
        self.spill.gc_consumed(self.ckpt.referenced_spill_paths() if self.cfg.checkpoint else None)

    # -- fetch+store, two schedulers --------------------------------------
    def _fetcher_kwargs(self, r: int, now: int, web_refs) -> dict:
        return dict(
            web_dir=self.world["web_dir"],
            robots_bodies=self.world["robots"],
            cfg=self.cfg,
            pool=self.pool,
            round_no=r,
            now=now,
            num_buckets=self.num_buckets,
            web_refs=web_refs,
            prefetch_check=True,
            mark_stored=(self.cfg.storage != "devnull" and not self._on_before_save),
            plasma_spill=self.spill.plasma,
        )

    def _ensure_fetch_pool(self) -> list:
        """Persistent fetch-actor pool (fetch_mode='pool'): created
        once per run; bucket -> actor affinity is FIXED for the whole
        run (per-host politeness clocks and cached web buckets stay
        put) but BALANCED: greedy bin-packing of buckets onto actors
        by web-table bucket size (hash collisions make naive
        ``bucket % W`` skew ~7x — Poisson extremes)."""
        if self._fetch_actors is None:
            import ray

            W = self.cfg.resolved_fetch_concurrency()
            # 0.9 CPU: leaves scheduling headroom for the web-read
            # tasks and shard probes even when W == total CPUs
            A = ray.remote(num_cpus=0.9)(Fetcher)
            kw = self._fetcher_kwargs(0, self._now(), self._ensure_web_refs())
            kw.update(before_save_hooks=self._on_before_save, focus_crawl=self._focus_crawl)
            self._fetch_actors = [A.remote(**kw) for _ in range(W)]
            self._bucket_lut = self._balanced_bucket_lut(W)
            # ship the bucket->actor LUT once: each actor selects its
            # own rows from the round's shared plasma frontier table,
            # so the driver never take()s/serializes per-actor slices
            # (that scatter loop was the dominant serial cost at high W)
            lref = ray.put(self._bucket_lut)
            ray.get([a.set_bucket_lut.remote(lref) for a in self._fetch_actors])
        return self._fetch_actors

    def _rebalance_buckets(self, agg: np.ndarray) -> int:
        """Bounded per-round LUT repair (SURVEY.md skew row / verdict
        r3 #7): with the NEXT round's exact per-bucket frontier rows
        (``agg``), greedily move up to 8 buckets from the most- to the
        least-loaded actor.  Each move ships the bucket's per-host
        politeness clocks + cookie jar donor -> receiver (between
        rounds, no fetch in flight), so per-host serialization and
        fetched_at values stay byte-identical to a static assignment
        (parity suite covers this).  Returns the number of moves."""
        if not self.cfg.rebalance_buckets or self._fetch_actors is None or agg is None:
            return 0
        import ray

        W = len(self._fetch_actors)
        if W < 2 or agg.sum() == 0:
            return 0
        lut = self._bucket_lut
        loads = np.bincount(lut, weights=agg, minlength=W).astype(np.int64)
        mean = loads.sum() / W
        moves: list[tuple[int, int, int]] = []
        for _ in range(8):
            src = int(np.argmax(loads))
            dst = int(np.argmin(loads))
            gap = int(loads[src] - loads[dst])
            if loads[src] <= mean * 1.05 or gap <= 0:
                break
            cand_b = np.flatnonzero((lut == src) & (agg > 0))
            fits = cand_b[agg[cand_b] < gap]  # moving must shrink the gap
            if not len(fits):
                break
            bb = int(fits[np.argmin(np.abs(agg[fits] - gap / 2))])
            moves.append((bb, src, dst))
            lut[bb] = dst
            loads[src] -= agg[bb]
            loads[dst] += agg[bb]
        if not moves:
            return 0
        states = ray.get([self._fetch_actors[s].export_bucket_state.remote(b) for b, s, _ in moves])
        ray.get([self._fetch_actors[d].import_bucket_state.remote(st) for (_, _, d), st in zip(moves, states)])
        lref = ray.put(lut)
        ray.get([a.set_bucket_lut.remote(lref) for a in self._fetch_actors])
        return len(moves)

    def _balanced_bucket_lut(self, W: int) -> np.ndarray:
        """bucket -> actor lookup table: deterministic greedy
        assignment by per-bucket web row counts (largest first onto
        the least-loaded actor)."""
        sizes: dict[int, int] = {}
        for d in glob.glob(os.path.join(self.world["web_dir"], "host_bucket=*")):
            b = int(d.split("=")[1])
            sizes[b] = sum(pq.read_metadata(f).num_rows for f in glob.glob(os.path.join(d, "*.parquet")))
        lut = np.array([b % W for b in range(self.num_buckets)], dtype=np.int64)
        loads = np.zeros(W, dtype=np.int64)
        for b in sorted(sizes, key=lambda x: (-sizes[x], x)):
            a = int(np.argmin(loads))
            lut[b] = a
            loads[a] += sizes[b]
        return lut

    def _fetch_store_pool(self, active_paths: list[str], round_dir: str, r: int, now: int) -> pa.Table | None:
        """One barrier per round: scatter narrow frontier rows to the
        owning actors, each fetches + writes its parquet part +
        extracts candidates."""
        import ray

        import time as _time

        ph: dict[str, float] = {}
        s = _time.perf_counter()
        # active items: plasma refs (plasma mode) and/or parquet paths
        # (seed round, checkpointable runs).  Paths are read once on
        # the driver and put as one more plasma part; ref parts go to
        # the actors untouched — the frontier is never materialized on
        # the driver in steady state.
        hists = self.spill.last_active_hists or [None] * len(active_paths)
        if len(hists) != len(active_paths):  # defensive: caller bypassed take_active
            hists = [None] * len(active_paths)
        part_refs = [x for x in active_paths if not isinstance(x, str)]
        part_hists = [h for x, h in zip(active_paths, hists) if not isinstance(x, str)]
        disk = [x for x in active_paths if isinstance(x, str)]
        if disk:
            t = pa.concat_tables([pq.read_table(p) for p in disk])
            if t.num_rows:
                part_refs.append(ray.put(t))
                dh = [h for x, h in zip(active_paths, hists) if isinstance(x, str)]
                part_hists.append(sum(dh) if all(h is not None for h in dh) else None)
        ph["read_frontier"] = _time.perf_counter() - s
        s = _time.perf_counter()
        actors = self._ensure_fetch_pool()
        W = len(actors)
        relaxed = not self.cfg.deterministic_order
        # slice-exact prebalance: the spill parts carried per-chunk
        # bucket histograms, so take_active() knows the EXACT
        # per-bucket load of the slice about to run — repair the LUT
        # against it now, before scatter.  The end-of-round rebalance
        # (full-frontier estimate) is skipped whenever this will fire
        # next round (see hists_complete), so each round still pays at
        # most one bounded state migration.
        if self.spill.last_active_hist is not None:
            ph["prebalance_moves"] = float(self._rebalance_buckets(self.spill.last_active_hist))
            ph["prebalance"] = _time.perf_counter() - s
            s = _time.perf_counter()
        # hist-based part routing: each part goes ONLY to the actors
        # the LUT says own rows in it (links are mostly same-host, so
        # a producing actor's chunks route largely back to itself) —
        # per-actor transfer + select scan drop from O(frontier) to
        # O(own share), and on a multi-node cluster the round's
        # frontier is no longer a W-way full-object broadcast (ADVICE
        # r3).  Parts without a hist fan out to every actor (exactly
        # the old behavior); per-actor part order is preserved, so the
        # selected rows/order are byte-identical either way (a skipped
        # part provably holds zero of that actor's rows).
        lut = self._bucket_lut
        owners = [None if h is None else set(np.unique(lut[np.flatnonzero(h)]).tolist()) for h in part_hists]
        fan = [len(o) if o is not None else W for o in owners]
        if fan:
            ph["route_fanout_mean"] = float(sum(fan) / len(fan))
        if self.cfg.route_telemetry and part_refs and not isinstance(part_refs[0], str):
            # multi-node locality measurement: where does each plasma
            # part LIVE (pre-dispatch, i.e. its producer's node) and
            # which actors will consume it?
            try:
                from ray.experimental import get_object_locations

                locs = get_object_locations(part_refs, timeout_ms=5000)
                self.route_log.append(
                    {
                        "round": r,
                        "parts": [
                            {
                                "nodes": sorted(locs.get(p, {}).get("node_ids") or []),
                                "consumers": sorted(o) if o is not None else list(range(W)),
                            }
                            for p, o in zip(part_refs, owners)
                        ],
                    }
                )
            except Exception:  # pragma: no cover — telemetry must never break a crawl
                pass
        # actors read their parts zero-copy and filter to their own
        # buckets (select_mine) — the driver never take()s/serializes
        # per-actor sub-tables
        refs = []
        ref_actors = []
        for a in range(W):
            mine = [p for p, o in zip(part_refs, owners) if o is None or a in o]
            spill_path = os.path.join(self.spill.root, f"actor-r{r}-a{a}.parquet")
            refs.append(actors[a].run_round_batch.remote(mine, r, now, os.path.join(round_dir, f"part-{a}.parquet"), spill_path, a, True))
            ref_actors.append(a)
        ph["scatter"] = _time.perf_counter() - s
        s = _time.perf_counter()
        results = ray.get(refs)
        ph["fetch_barrier"] = _time.perf_counter() - s
        # await the actors' async mark-stored RPCs (fired during the
        # round, overlapped with compute): everything downstream —
        # det-mode driver admission, checkpoint snapshots, next round's
        # TTL probes — sees the same shard state a synchronous mark
        # would have left
        s = _time.perf_counter()
        mrefs = [m for res in results for m in (res.get("mark_refs") or ())]
        if mrefs:
            ray.get(mrefs)
        ph["mark_flush"] = _time.perf_counter() - s
        # drop empty shares (actors whose buckets had no rows this round)
        keep = [i for i, res in enumerate(results) if res.get("nrows") != 0]
        results = [results[i] for i in keep]
        ref_actors = [ref_actors[i] for i in keep]
        sizes = [res["nrows"] for res in results if res.get("nrows") is not None]
        if sizes:
            ph["rows_max"] = float(max(sizes))
            ph["rows_mean"] = float(sum(sizes) / len(sizes))
        # actor-side phase times: max (the barrier's critical path) and
        # mean (the useful-work level) — max >> mean flags straggler
        # skew rather than genuinely heavy work
        _ph_n: dict[str, int] = {}
        for res in results:
            for k, v in (res.get("timings") or {}).items():
                if k == "share_total":
                    continue
                ph[f"actor_{k}_max"] = max(ph.get(f"actor_{k}_max", 0.0), v)
                ph[f"actor_{k}_mean"] = ph.get(f"actor_{k}_mean", 0.0) + v
                _ph_n[k] = _ph_n.get(k, 0) + 1
        for k, n in _ph_n.items():
            ph[f"actor_{k}_mean"] /= n
        # whole-share wall time per actor: the barrier length is max
        # over actors of THIS, not of any phase (share_total covers
        # the full method incl. any untimed residue)
        shares = [
            (res.get("timings") or {}).get("share_total") or sum(v for k, v in (res.get("timings") or {}).items() if k != "share_total")
            for res in results
        ]
        if shares:
            ph["actor_share_max"] = max(shares)
            ph["actor_share_mean"] = sum(shares) / len(shares)
        if os.environ.get("GRAFT_PHASE_DUMP"):
            # per-actor timing dump (profiling only): attached to this
            # round's metrics entry by _run_round
            self._last_actor_dump = [
                {"actor": a, "rows": res.get("nrows"), **{k: round(v, 3) for k, v in (res.get("timings") or {}).items()}}
                for a, res in zip(ref_actors, results)
            ]
        self._last_counts = (sum(r_["stored"] for r_ in results), sum(r_["errors"] for r_ in results))
        self._round_deduped = all(r_.get("deduped") for r_ in results) if results else False
        ks = [r_["keys"] for r_ in results if r_.get("keys") is not None and r_["keys"].num_rows]
        self._last_keys = pa.concat_tables(ks) if ks else None
        self._last_unstorable = [r_.get("unstorable") for r_ in results]
        # next-round per-bucket load (for the bounded LUT rebalancer):
        # relaxed mode sums the actors' emitted-row histograms; det
        # mode gets it from the driver's admission pass below
        agg_rows = np.zeros(self.num_buckets, dtype=np.int64)
        for r_ in results:
            br = r_.get("bucket_rows")
            if br is not None:
                agg_rows += np.asarray(br, dtype=np.int64)
        # hot-host-cap deferrals rejoin the frontier (original seq kept)
        for r_ in results:
            d = r_.get("deferred")
            if d is not None and d.num_rows:
                self.spill.append_table(d)
                agg_rows += np.bincount(d["host_bucket"].to_numpy().astype(np.int64), minlength=self.num_buckets)
        if relaxed:
            # round-robin interleave of the actors' chunked spill
            # parts: any later active-slice cut boundary then spreads
            # the leftover across the pool instead of concentrating on
            # the last few actors' (same-host-destined) parts
            s = _time.perf_counter()
            enq = 0
            per_actor = [list(res["spill"]) for res in results if res.get("spill")]
            while per_actor:
                nxt = []
                for parts in per_actor:
                    p = parts.pop(0)
                    if "ref" in p:
                        self.spill.register_ref(p["ref"], p["rows"], hist=p.get("hist"))
                    else:
                        self.spill.register_part(p["path"], p["rows"], hist=p.get("hist"))
                    enq += p["rows"]
                    if parts:
                        nxt.append(parts)
                per_actor = nxt
            self._last_enqueued = enq
            ph["register"] = _time.perf_counter() - s
            s = _time.perf_counter()
            # skip the estimate rebalance when the next round will
            # prebalance slice-exact (all pending parts carry hists)
            ph["rebalance_moves"] = 0.0 if self.spill.hists_complete() else float(self._rebalance_buckets(agg_rows))
            ph["rebalance"] = _time.perf_counter() - s
            self._last_phases = ph
            return None
        s = _time.perf_counter()
        self._admit_phases = {}
        self._admit_bucket_rows = None
        self._last_enqueued = self._admit_narrow_keys(results, ref_actors, actors, now)
        ph["admit"] = _time.perf_counter() - s
        for k, v in self._admit_phases.items():
            ph[f"admit_{k}"] = v
        s = _time.perf_counter()
        if self._admit_bucket_rows is not None:
            agg_rows += self._admit_bucket_rows
        ph["rebalance_moves"] = 0.0 if self.spill.hists_complete() else float(self._rebalance_buckets(agg_rows))
        ph["rebalance"] = _time.perf_counter() - s
        self._last_phases = ph
        return None

    def _admit_narrow_keys(self, results: list[dict], ref_actors: list[int], actors: list, now: int) -> int:
        """Deterministic-mode global FIFO admission.  Default (r5):
        fully distributed — actors shipped {shard: plasma ref} key
        splits and the driver dispatches to ``_admit_distributed``
        (shard-side probes, driver ranks only admitted comps).
        Fallback (TTL recrawl, comp overflow, det_driver_admit): the
        legacy driver merge over NARROW key tables (url_hash,
        host_hash, parent_seq, link_idx — 28 B per candidate):
        merge-sort driver-side, run the tracker probe in discovery
        order (first-occurrence-wins == the reference's enqueue
        serialization), assign global seqs, then call each actor's
        emit_frontier() with its admitted positions + seqs — the
        actor writes its own spill part.  Candidate strings never
        cross the driver on either path; both byte-identical (parity
        suite + test_det_admission_distributed_equals_driver_merge).

        Note: actor-written parts hold interleaved seq ranges, so when
        ``queue_items_limit`` slices a wave into several rounds the
        slice boundary is part-granular rather than strictly
        seq-ordered (seq labels, stored set and per-URL metadata stay
        exact; only which slice a row lands in can shift).  With the
        wave inside the active limit the order is strictly FIFO."""
        cks, tags = [], []
        ref_units = []  # (tag, {shard: plasma ref}, n_cand) — distributed-admission actors
        for i, res in enumerate(results):
            ck = res.get("cand_keys")
            if ck is None:
                continue
            if isinstance(ck, dict):
                if ck["n"]:
                    ref_units.append((ref_actors[i], ck["refs"], ck["n"]))
            elif ck.num_rows:
                cks.append(ck)
                tags.append(ref_actors[i])
        if ref_units and not cks:
            return self._admit_distributed(ref_units, actors, now)
        if ref_units:  # mixed (comp overflow on some actors): pull the
            # plasma splits back and run the driver merge for all
            import ray

            for tag, refs, _n in ref_units:
                parts = ray.get(list(refs.values()))
                comp = np.concatenate([p["comp"] for p in parts])
                uh = np.concatenate([p["uh"] for p in parts])
                hh = np.concatenate([p["hh"] for p in parts])
                oloc = np.concatenate([p["oloc"] for p in parts])
                o = np.argsort(oloc, kind="stable")  # restore unit-local row order
                cks.append(
                    pa.table(
                        {
                            "url_hash": pa.array(uh[o].view(np.int64), pa.int64()),
                            "host_hash": pa.array(hh[o].view(np.int64), pa.int64()),
                            "comp": pa.array(comp[o], pa.int64()),
                            # recoverable exactly: comp == ps << 16 | li
                            "parent_seq": pa.array(comp[o] >> 16, pa.int64()),
                            "link_idx": pa.array(comp[o] & 0xFFFF, pa.int64()),
                        }
                    )
                )
                tags.append(tag)
        return self._admit_keys_core(cks, tags, lambda a, loc, seqs: actors[a].emit_frontier.remote(loc, seqs), now)

    def _admit_distributed(self, ref_units: list[tuple], actors: list, now: int) -> int:
        """Deterministic admission with the keys OFF the driver (r5,
        VERDICT r4 #4): actors pre-split their comp-sorted key tables
        by seen shard into plasma; each shard merges its slice, runs
        the sequential first-occurrence probe, and returns only the
        admitted (comp, tag, oloc) triples; the driver's remaining
        serial work is one argsort over ADMITTED comps to assign
        global seqs (comp is globally unique — parent_seq << 16 |
        link_idx — so the merged order is total) and the emit fanout.
        Driver bytes: ~20 B per ADMITTED row instead of 28 B per
        CANDIDATE plus the probe scatter (~5x less at the bench's
        2.8:1 candidate:admit ratio).  Byte-identical to the driver
        merge: same per-shard probe subsequences, same seq order."""
        import time as _time

        aph: dict[str, float] = {}
        self._admit_phases = aph
        aph["n_cand"] = float(sum(n for _, _, n in ref_units))
        S = self.pool.num_shards
        per_shard_refs: list[list] = [[] for _ in range(S)]
        per_shard_tags: list[list] = [[] for _ in range(S)]
        for tag, refs, _n in ref_units:
            for sh, ref in refs.items():
                per_shard_refs[sh].append(ref)
                per_shard_tags[sh].append(tag)
        s = _time.perf_counter()
        shard_res = self.pool.admit_sorted(per_shard_refs, per_shard_tags, self.num_buckets)
        aph["tracker"] = _time.perf_counter() - s
        s = _time.perf_counter()
        self._admit_bucket_rows = sum((r[3] for r in shard_res), np.zeros(self.num_buckets, np.int64))
        nonempty = [r for r in shard_res if len(r[0])]
        if not nonempty:
            return 0
        comp_all = np.concatenate([r[0] for r in nonempty])
        tag_all = np.concatenate([r[1] for r in nonempty])
        oloc_all = np.concatenate([r[2] for r in nonempty])
        n_admit = len(comp_all)
        order = np.argsort(comp_all, kind="stable")  # S presorted runs
        seqs = np.empty(n_admit, np.int64)
        seqs[order] = np.arange(self.next_seq, self.next_seq + n_admit)
        self.next_seq += n_admit
        aph["sort"] = _time.perf_counter() - s
        s = _time.perf_counter()
        import ray

        refs = []
        for a in sorted(set(tag_all.tolist())):
            sel = tag_all == a
            o2 = np.argsort(seqs[sel], kind="stable")  # == comp order == ascending oloc
            refs.append(actors[a].emit_frontier.remote(oloc_all[sel][o2], seqs[sel][o2]))
        # round-robin registration of the actors' chunked parts (see
        # the relaxed path: spreads active-slice cut boundaries)
        per_actor = [list(spill) for spill in ray.get(refs) if spill]
        while per_actor:
            nxt = []
            for parts in per_actor:
                p = parts.pop(0)
                if "ref" in p:
                    self.spill.register_ref(p["ref"], p["rows"], hist=p.get("hist"))
                else:
                    self.spill.register_part(p["path"], p["rows"], hist=p.get("hist"))
                if parts:
                    nxt.append(parts)
            per_actor = nxt
        aph["emit"] = _time.perf_counter() - s
        return n_admit

    def _admit_keys_core(self, cks: list[pa.Table], tags: list[int], emit, now: int) -> int:
        """Shared narrow-key admission: ``cks[k]`` are the 28-byte key
        tables of unit ``tags[k]`` (a pool actor or a spooled candidate
        file), in that unit's local row order; ``emit(tag, loc, seqs)``
        must return a ray ref resolving to the unit's written spill
        parts ([{path, rows}])."""
        import ray
        import time as _time

        aph: dict[str, float] = {}
        self._admit_phases = aph
        s = _time.perf_counter()
        uh_l = [ck["url_hash"].to_numpy() for ck in cks]
        if not uh_l or not sum(len(a) for a in uh_l):
            return 0
        ns = [len(a) for a in uh_l]
        offs = np.cumsum([0] + ns)
        aph["n_cand"] = float(offs[-1])
        # each span is presorted by the composite FIFO key (parent_seq
        # << 16 | link_idx) actor-side; a stable argsort over the
        # concatenated precomputed key is then a pure W-way run merge
        # (timsort gallops through presorted runs).  Fall back to
        # rebuilding the key (and lexsort on overflow) when a unit
        # didn't ship `comp` (dataset-mode candidate files).
        if all("comp" in ck.column_names for ck in cks):
            comp = np.concatenate([ck["comp"].to_numpy() for ck in cks])
            order = np.argsort(comp, kind="stable")
        else:
            ps = np.concatenate([ck["parent_seq"].to_numpy() for ck in cks])
            li = np.concatenate([ck["link_idx"].to_numpy() for ck in cks])
            li64 = li.astype(np.int64)
            ps64 = ps.astype(np.int64)
            if len(ps64) and ps64.max() < (1 << 47) and li64.max() < (1 << 16) and ps64.min() >= 0:
                order = np.argsort((ps64 << 16) | li64, kind="stable")
            else:
                order = np.lexsort((li, ps))
        aph["argsort"] = _time.perf_counter() - s
        s = _time.perf_counter()
        # unit id + unit-local row index recovered from the merged
        # global order — no act/loc materialization + gather
        span = np.searchsorted(offs, order, side="right") - 1
        loc = order - offs[span]
        act = np.asarray(tags, dtype=np.int64)[span]
        uh = np.concatenate(uh_l)[order]
        uh = uh.view(np.uint64) if uh.dtype == np.int64 else uh.astype(np.uint64)
        hh = np.concatenate([ck["host_hash"].to_numpy() for ck in cks])[order]
        hh = hh.view(np.uint64) if hh.dtype == np.int64 else hh.astype(np.uint64)
        aph["sort"] = _time.perf_counter() - s
        s = _time.perf_counter()
        # tracker/TTL tail of should_be_visited? (same semantics as
        # stages.tracker_admit, on raw arrays)
        if self.cfg.ttl_page is not None:
            exists, ts = self.pool.stored_info(uh, hh)
            expired = exists & (ts >= 0) & ((now - self.cfg.ttl_page) > ts)
        else:
            expired = np.zeros(len(uh), dtype=bool)
        seen = self.pool.check_and_add(uh, hh)
        aph["tracker"] = _time.perf_counter() - s
        s = _time.perf_counter()
        admit = expired | ~seen
        n_admit = int(admit.sum())
        # next-round per-bucket load for the rebalancer (bucket =
        # host_hash % num_buckets; mods stay in uint64 — a mixed
        # uint64 % python-int silently promotes to float64)
        self._admit_bucket_rows = np.bincount(
            (hh[admit] % np.uint64(self.num_buckets)).astype(np.int64), minlength=self.num_buckets
        )
        if n_admit == 0:
            return 0
        seqs = np.zeros(len(uh), dtype=np.int64)
        seqs[admit] = np.arange(self.next_seq, self.next_seq + n_admit)
        self.next_seq += n_admit
        refs = []
        for a in sorted(set(act[admit].tolist())):
            sel = admit & (act == a)
            refs.append(emit(a, loc[sel], seqs[sel]))
        # round-robin registration of the actors' chunked parts (see
        # the relaxed path: spreads active-slice cut boundaries)
        per_actor = [list(spill) for spill in ray.get(refs) if spill]
        while per_actor:
            nxt = []
            for parts in per_actor:
                p = parts.pop(0)
                if "ref" in p:
                    self.spill.register_ref(p["ref"], p["rows"], hist=p.get("hist"))
                else:
                    self.spill.register_part(p["path"], p["rows"], hist=p.get("hist"))
                if parts:
                    nxt.append(parts)
            per_actor = nxt
        aph["emit"] = _time.perf_counter() - s
        return n_admit

    def warm_pool(self) -> None:
        """Spin up + preload the fetch pool and the web broadcast
        before timing starts ('sustained' throughput excludes cluster
        spin-up; see bench.py / BASELINE.md)."""
        import ray

        actors = self._ensure_fetch_pool()
        W = len(actors)
        buckets = sorted(int(d.split("=")[1]) for d in glob.glob(os.path.join(self.world["web_dir"], "host_bucket=*")))
        refs = [actors[a].preload.remote([b for b in buckets if self._bucket_lut[b] == a]) for a in range(W)]
        ray.get(refs)

    def _empty_candidates(self) -> pa.Table:
        return make_link_extractor(self.cfg, None, self.num_buckets)(
            pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "host": pa.array([], pa.string()),
                    "links": pa.array([], pa.list_(pa.string())),
                    "depth": pa.array([], pa.int32()),
                    "seq": pa.array([], pa.int64()),
                    "code": pa.array([], pa.int32()),
                    "content_type": pa.array([], pa.string()),
                    "error": pa.array([], pa.string()),
                }
            )
        )

    def _fetch_store_distributed(self, active_paths: list[str], round_dir: str, r: int, now: int) -> None:
        import ray.data

        ds = ray.data.read_parquet(active_paths)
        pages = ds.groupby("host_bucket").map_groups(
            Fetcher,
            fn_constructor_kwargs=self._fetcher_kwargs(r, now, self._ensure_web_refs()),
            batch_format="pyarrow",
            # autoscaling (1, W): a fixed pool size demands min=max
            # actors before any group runs and can wedge the streaming
            # executor when other actors hold CPUs (see
            # ops.images.decode_stage); actor count never affects
            # fetch semantics (groups are independent, order is
            # driver-admitted)
            concurrency=(1, self.cfg.resolved_fetch_concurrency()),
            # fractional: lookup-shaped stage; whole-CPU actors starve
            # the read/write tasks on small clusters
            num_cpus=0.5,
        )
        if self._on_before_save:
            from .stages import make_filter_storable_spool

            unst_dir = os.path.join(self.run_dir, "unstorable", f"round={r}")
            shutil.rmtree(unst_dir, ignore_errors=True)
            os.makedirs(unst_dir, exist_ok=True)
            for fn in self._on_before_save:
                pages = pages.map_batches(fn, batch_format="pyarrow", batch_size=8192)
            pages = pages.map_batches(make_filter_storable_spool(unst_dir, self.cfg.storage_except), batch_format="pyarrow", batch_size=8192)
            if self.cfg.storage != "devnull":
                pages = pages.map_batches(make_mark_stored(self.pool), batch_format="pyarrow", batch_size=8192)
        if self.cfg.storage_except:
            drop = list(self.cfg.storage_except)
            pages = pages.map_batches(lambda b: b.drop_columns([c for c in drop if c in b.column_names]), batch_format="pyarrow", batch_size=8192)
        pages.write_parquet(round_dir)

    def _fetch_store_local(self, active_paths: list[str], round_dir: str, r: int, now: int) -> pa.Table | None:
        t = pa.concat_tables([pq.read_table(p) for p in active_paths])
        if self._driver_fetcher is None:
            # share the broadcast web (zero-copy plasma) with the pool
            kw = self._fetcher_kwargs(r, now, self._ensure_web_refs())
            kw.update(before_save_hooks=self._on_before_save, focus_crawl=self._focus_crawl)
            self._driver_fetcher = Fetcher(**kw)
        res = self._driver_fetcher.run_round_batch(t, r, now, os.path.join(round_dir, "part-0.parquet"))
        self._last_counts = (res["stored"], res["errors"])
        self._last_unstorable = [res.get("unstorable")]
        if res.get("deferred") is not None and res["deferred"].num_rows:
            self.spill.append_table(res["deferred"])
        return res["cand"] if res["cand"] is not None else self._empty_candidates()

    # -- candidates --------------------------------------------------------
    def _admit_candidate_files(self, round_dir: str, r: int, now: int) -> int:
        """Dataset-mode candidate path with the SAME
        no-driver-materialization property as pool mode: link
        extraction runs distributed and spools candidates as parquet
        parts; the driver reads ONLY the 28-byte admission keys per
        file (columns-pruned), runs global FIFO admission, then remote
        tasks re-read their own file and write the admitted rows as
        spill parts — candidate strings never cross the driver."""
        import ray
        import ray.data

        cand_dir = os.path.join(self.run_dir, "cand", f"round={r}")
        shutil.rmtree(cand_dir, ignore_errors=True)
        extractor = make_link_extractor(self.cfg, self._focus_crawl, self.num_buckets, robots_bodies=self.world["robots"])
        ds = ray.data.read_parquet(round_dir, columns=PAGE_NARROW)
        ds.map_batches(extractor, batch_format="pyarrow", batch_size=4096).write_parquet(cand_dir)
        files = sorted(glob.glob(os.path.join(cand_dir, "*.parquet")))
        cks, tags = [], []
        for fi, f in enumerate(files):
            ck = pq.read_table(f, columns=["url_hash", "host_hash", "parent_seq", "link_idx"])
            if ck.num_rows:
                cks.append(ck)
                tags.append(fi)
        task = _emit_file_task()

        def emit(fi: int, loc: np.ndarray, seqs: np.ndarray):
            return task.remote(files[fi], loc, seqs, os.path.join(self.spill.root, f"dscand-r{r}-f{fi}.parquet"))

        n = self._admit_keys_core(cks, tags, emit, now)
        shutil.rmtree(cand_dir, ignore_errors=True)
        return n

    def _extract_candidates(self, round_dir: str, local: bool) -> pa.Table:
        """Driver-LOCAL candidate extraction (use_ray=False engines and
        the BFS-tail small rounds).  Remote rounds never come here:
        pool mode extracts in-actor, dataset mode spools through
        ``_admit_candidate_files`` — enforced so no scheduler can
        regress into concatenating candidate batches driver-side (the
        round-3 verdict's dead-code finding, now load-bearing)."""
        if not local:
            raise RuntimeError("_extract_candidates is driver-local only; remote rounds admit via _admit_candidate_files / in-actor extraction")
        extractor = make_link_extractor(self.cfg, self._focus_crawl, self.num_buckets, robots_bodies=self.world["robots"])
        narrow = pa.concat_tables([pq.read_table(f, columns=PAGE_NARROW) for f in glob.glob(os.path.join(round_dir, "*.parquet"))])
        return extractor(narrow)

    def _emit_frontier(self, cand: pa.Table, presorted: bool = False) -> int:
        """Admitted candidates -> FIFO seq -> spill parts."""
        if cand.num_rows == 0:
            return 0
        if not presorted:
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
                "seeded": pa.array(np.zeros(n, dtype=bool)),
                "seq": pa.array(np.arange(self.next_seq, self.next_seq + n), pa.int64()),
                "priority": pa.array(np.zeros(n, dtype=np.int64)),
                "attempt": pa.array(np.zeros(n, dtype=np.int32)),
                "user_data": pa.array(["{}"] * n, pa.string()),
            }
        )
        self.next_seq += n
        self.spill.append_table(ft)
        return n

    def _dedup_round_output(self, page_files: list[str]) -> int:
        """Within-round uuid dedup, min-seq wins.  Arises only when a
        redirect source and its target are fetched in the same round:
        the reference's FIFO serialization makes the later message hit
        ``page_exists?`` (polipus.rb:209-213); concurrent actors can
        both store.  Loser rows are recorded as a TOMBSTONES sidecar
        (applied by every pages reader) instead of rewriting parquet —
        a rewrite would re-compress the round's payload bytes.
        Returns the number of rows tombstoned."""
        if not page_files:
            return 0
        # vectorized dup detection on the int64 url_hash (same key
        # space as uuid — both derive from the canonical URL); pool
        # rounds hand the keys over inline, other paths re-read them
        if self._last_keys is not None:
            t = self._last_keys
        else:
            cols = ["url_hash", "host_hash", "seq", "fetched_at"]
            t = pa.concat_tables([pq.read_table(f, columns=cols) for f in page_files])
        if t.num_rows == 0:
            return 0
        h = t["url_hash"].to_numpy()
        s = t["seq"].to_numpy()
        uniq, inv, cnt = np.unique(h, return_inverse=True, return_counts=True)
        if (cnt <= 1).all():
            return 0
        best = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(best, inv, s)
        is_dup = cnt[inv] > 1
        loser = is_dup & (s != best[inv])
        if not loser.any():
            return 0
        winner = is_dup & (s == best[inv])
        round_dir = os.path.dirname(page_files[0])
        with open(os.path.join(round_dir, "_TOMBSTONES.json"), "w") as f:
            json.dump([[int(a), int(b)] for a, b in zip(h[loser].tolist(), s[loser].tolist())], f)
        # re-assert winners' fetched_at in the stored manifest (losers
        # may have overwritten it via mark_stored)
        if self.cfg.storage != "devnull":
            self.pool.mark_stored(
                h[winner].astype(np.int64).view(np.uint64),
                t["host_hash"].to_numpy()[winner].astype(np.int64).view(np.uint64),
                t["fetched_at"].to_numpy()[winner],
            )
        return int(loser.sum())

    def cfg_retry_errors(self) -> int:
        return int(getattr(self.cfg, "retry_errors", 0) or 0)

    def _requeue_errors(self, round_dir: str, r: int) -> int:
        files = glob.glob(os.path.join(round_dir, "*.parquet"))
        if not files:
            return 0
        t = pa.concat_tables([pq.read_table(f, columns=["url", "referer", "depth", "error", "seq", "user_data", "attempt"]) for f in files])
        import pyarrow.compute as pc

        errs = t.filter(pc.is_valid(t["error"]))
        if errs.num_rows == 0:
            return 0
        # bounded retries: only rows under the retry budget re-enqueue
        # (attempt carried through the page row; without this the same
        # dead URL would loop forever)
        errs = errs.filter(pc.less(errs["attempt"], self.cfg_retry_errors()))
        if errs.num_rows == 0:
            return 0
        rows = []
        for rr in errs.to_pylist():
            rows.append({"url": rr["url"], "referer": rr["referer"], "depth": rr["depth"], "seq": self.next_seq, "attempt": rr["attempt"] + 1, "user_data": rr["user_data"]})
            self.next_seq += 1
        # attempt>0 bypasses the exists-check at dequeue, mirroring the
        # reference's user-driven re-enqueue pattern
        # (examples/error_handling.rb)
        ft = frontier_table(rows, self.num_buckets, self.cfg.include_query_string_in_saved_page)
        self.spill.append_table(ft)
        return ft.num_rows

    # -- results -----------------------------------------------------------
    def pages_files(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.pages_root, "round=*", "*.parquet")))

    def pages_table(self, columns: list[str] | None = None) -> pa.Table:
        return read_pages_dir(self.pages_root, columns)

    def pages_dataset(self, columns: list[str] | None = None):
        import ray.data

        tombs = load_tombstones(self.pages_root)
        read_cols = columns
        if tombs and columns is not None:
            read_cols = list(dict.fromkeys(list(columns) + ["url_hash", "seq"]))
        ds = ray.data.read_parquet(self.pages_root, columns=read_cols)
        if tombs:
            want = list(columns) if columns is not None else None

            def drop_tombs(batch: pa.Table) -> pa.Table:
                batch = _filter_tombstones(batch, tombs)
                return batch.select(want) if want is not None else batch

            ds = ds.map_batches(drop_tombs, batch_format="pyarrow")
        return ds

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
