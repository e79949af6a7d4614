"""Fetcher — the simulated-HTTP fetch stage as a map_batches /
map_groups callable class (actor pool).

Replaces the reference's HTTP client micro-pipeline (reference
lib/polipus/http.rb: keep-alive pool :225-267, redirect chain
:161-182, error pages :63-71) with a lookup join against the
synthetic web table: one "fetch" = point lookup of the canonical URL,
following the ``redirect_to`` column up to ``redirect_limit`` hops
(cross-host stops the chain), folding earlier hops into ``aliases``
(polipus.rb:204-216), emitting an error page when the URL resolves
nowhere (the connection-refused analogue).

Statefulness per actor (the reference's per-thread HTTP state T3-T5):
- lazily-loaded web-table partitions: the web table is parquet
  bucketed by ``host_bucket``; an actor loads (and caches) only the
  buckets its batches touch.  The engine routes batches through
  ``groupby("host_bucket")``, so one actor serves whole buckets —
  the co-partitioned-join scale path (SURVEY.md §2 J1): actor memory
  is O(buckets served), not O(web).
- per-host politeness clock ``next_ok[host]`` (reference
  robotex.rb:132-143 Crawl-Delay sleep; north-rule priority queue):
  rows are processed in (priority, seq) order; each fetch advances the
  host's virtual clock by the host's Crawl-Delay (or the configured
  default).  Because ALL URLs of a host live in one host_bucket group,
  the per-host serialization is exact with zero cross-actor
  coordination.  Virtual time is recorded into ``fetched_at``; wall
  sleeping is off by default (``simulate_politeness_wall_clock``).

Post-redirect storage-dedup (reference polipus.rb:209-213): redirect
finals are re-checked against the stored manifest via one batched
shard-pool RPC per batch.
"""

from __future__ import annotations

import glob
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import CrawlConfig
from ..robots import RobotsCache
from ..urltools import canonicalize, host_hash64, host_of, page_uuid, url_hash64

_FETCH_COLUMNS = ["doc_id", "url", "code", "content_type", "redirect_to", "caption", "links", "bytes", "w", "h", "fmt", "phash", "base_href"]


class Fetcher:
    def __init__(
        self,
        web_dir: str,
        robots_bodies: dict[str, str],
        cfg: CrawlConfig,
        pool=None,
        round_no: int = 0,
        now: int = 1_000_000,
        num_buckets: int = 16,
        web_refs: dict | None = None,
        prefetch_check: bool = False,
        mark_stored: bool = False,
        before_save_hooks: list | None = None,
        focus_crawl=None,
    ):
        self.web_dir = web_dir
        self.cfg = cfg
        self.num_buckets = num_buckets
        self.robots = RobotsCache(robots_bodies, cfg.effective_user_agent())
        self.pool = pool
        self.round_no = round_no
        self.now = now
        # web_refs: {bucket: ray.ObjectRef(pa.Table)} — the web table
        # broadcast ONCE per run (ray.put on the driver); plasma reads
        # are zero-copy and shared across actors/rounds on a node,
        # replacing a per-round per-actor parquet re-read
        self.web_refs = web_refs
        self._buckets: dict[int, tuple[dict[str, int], pa.Table]] = {}
        self._next_ok: dict[str, float] = {}
        # per-host cookie jar (T4, reference http.rb:143-152): the
        # simulated server sets a deterministic session cookie on each
        # response; subsequent requests to the host send it.  Exact
        # because a host's bucket lives on one actor for the run.
        # NOTE: jar and politeness clocks are actor-local state
        # EXCLUDED from checkpoints — after a crash-resume the
        # cookies_sent column restarts empty for each host (a fresh
        # session, like the reference's new HTTP client), so it may
        # differ from an uninterrupted run; documented divergence from
        # the byte-identical determinism story (config.accept_cookies).
        self._cookie_jar: dict[str, str] = dict(cfg.cookie_jar or {}) if cfg.accept_cookies else {}
        # fused dequeue-side re-check (policy sans tracker + storage
        # anti-join): saves a map_batches stage per round
        self._prefetch_check = prefetch_check
        self._mark_stored = mark_stored
        self._prefilter = None
        self._prefilter_now = None
        self._robots_bodies = robots_bodies
        self._before_save_hooks = list(before_save_hooks or [])
        self._focus_crawl = focus_crawl
        self._extractor = None
        self._pending_cand: pa.Table | None = None
        self._pending_spill_path: str | None = None

    # -- web-table partition cache ---------------------------------------
    def _bucket_of(self, url: str) -> int:
        return host_hash64(host_of(url)) % self.num_buckets

    def _load_bucket(self, b: int) -> tuple[dict[str, int], pa.Table]:
        got = self._buckets.get(b)
        if got is None:
            if self.web_refs is not None and b in self.web_refs:
                import ray

                t = ray.get(self.web_refs[b])  # zero-copy plasma read
            else:
                files = sorted(glob.glob(os.path.join(self.web_dir, f"host_bucket={b}", "*.parquet")))
                if files:
                    t = pa.concat_tables([pq.read_table(f, columns=_FETCH_COLUMNS) for f in files])
                else:
                    t = pa.table({c: [] for c in _FETCH_COLUMNS})
            t = t.combine_chunks()
            idx = {u: i for i, u in enumerate(t["url"].to_pylist())}
            # per-row hot-loop columns decoded once per bucket (chained
            # ChunkedArray[i].as_py() costs ~10us/row otherwise)
            codes = t["code"].to_numpy()
            redirects = t["redirect_to"].to_pylist()
            got = (idx, t, codes, redirects)
            self._buckets[b] = got
        return got

    def _lookup(self, url: str, bucket: int | None = None):
        idx, t, codes, redirects = self._load_bucket(self._bucket_of(url) if bucket is None else bucket)
        i = idx.get(url)
        return None if i is None else (t, i, int(codes[i]), redirects[i])

    def _delay(self, host: str) -> float:
        if self.cfg.obey_robots_txt:
            d = self.robots.delay(host)
            if d is not None:
                return float(d)
        return float(self.cfg.politeness_default_delay)

    # -- the fetch batch --------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._prefetch_check and self.pool is not None and batch.num_rows:
            if self._prefilter is None or self._prefilter_now != self.now:
                from ..frontier.stages import make_prefetch_filter

                self._prefilter = make_prefetch_filter(self._robots_bodies, self.cfg, self.pool, self.now)
                self._prefilter_now = self.now
            batch = self._prefilter(batch)
        if batch.num_rows == 0:
            return self._empty()
        # per-host priority order (O7): lower priority first, then FIFO seq
        order = np.lexsort((batch["seq"].to_numpy(), batch["priority"].to_numpy()))
        # column lists, not row dicts (to_pylist() on a wide selection
        # builds a dict per row — measurable at frontier scale)
        c_url = batch["url"].to_pylist()
        c_host = batch["host"].to_pylist()
        c_ref = batch["referer"].to_pylist()
        c_depth = batch["depth"].to_pylist()
        c_seeded = batch["seeded"].to_pylist()
        c_seq = batch["seq"].to_pylist()
        c_ud = batch["user_data"].to_pylist()
        c_att = batch["attempt"].to_pylist()
        c_bucket = batch["host_bucket"].to_pylist() if "host_bucket" in batch.column_names else None

        # columnar accumulation in processing order (no per-row dicts:
        # the dict-of-30-fields pattern was the measured hot spot)
        import hashlib as _hl

        accept_ck = self.cfg.accept_cookies
        ua_cfg = self.cfg.user_agent
        ua_is_list = isinstance(ua_cfg, (list, tuple))
        ua_fixed = None if ua_is_list else str(ua_cfg)
        wall = self.cfg.simulate_politeness_wall_clock
        rlimit = self.cfg.redirect_limit
        next_ok = self._next_ok
        o_url: list = []
        o_host: list = []
        o_aliases: list = []
        o_code: list = []
        o_error: list = []
        o_fetched: list = []
        o_ref: list = []
        o_depth: list = []
        o_seeded: list = []
        o_seq: list = []
        o_ud: list = []
        o_att: list = []
        o_resp: list = []
        o_ua: list = []
        o_ck: list = []
        o_hexd: list = []  # md5 hexdigest of the REQUESTED url, reusable when final == requested
        finals: list[tuple[int, pa.Table, int]] = []  # (out_idx, bucket table, row idx)
        for oi in order:
            url = c_url[oi]
            host = c_host[oi]
            # politeness: virtual per-host clock
            t0 = next_ok.get(host, 0.0)
            if t0 < 0.0:
                t0 = 0.0
            d = self._delay(host)
            next_ok[host] = t0 + d
            if wall and d > 0:
                time.sleep(d)
            # redirect chain (same-host, <= redirect_limit hops)
            hops: list[str] = []
            cur = url
            hit = None
            while True:
                # hop 0 reuses the frontier's host_bucket column;
                # later (redirect) hops recompute from the URL
                found = self._lookup(cur, int(c_bucket[oi]) if (c_bucket is not None and not hops) else None)
                if found is None:
                    hit = None
                    break
                t, i, code, rt = found
                hops.append(cur)
                if rt:
                    # Location may be relative (http.rb:167): resolve
                    # against the current URL before the host gate
                    rt = canonicalize(rt, cur)
                if 300 <= code < 400 and rt and host_of(rt) == host_of(cur) and len(hops) <= rlimit:
                    cur = rt
                    hit = (t, i)
                    continue
                hit = (t, i)
                break
            hexd = _hl.md5(url.encode("utf-8", "surrogatepass")).hexdigest()
            uh = int(hexd[:16], 16)
            o_ref.append(c_ref[oi])
            o_depth.append(c_depth[oi])
            o_seeded.append(c_seeded[oi])
            o_seq.append(c_seq[oi])
            o_ud.append(c_ud[oi])
            o_att.append(c_att[oi])
            o_resp.append((uh % 20) + 5)
            # per-request UA sampled by url hash (O6, http.rb:84-90)
            o_ua.append(str(ua_cfg[uh % len(ua_cfg)]) if ua_is_list else ua_fixed)
            # cookies in the jar at request time (T4); jar updated
            # below once the simulated server responds
            o_ck.append(self._cookie_jar.get(host, "") if accept_ck else "")
            if hit is None:
                # error page: original URL, no code, nil fetched_at (http.rb:63-71)
                o_url.append(url)
                o_host.append(host)
                o_aliases.append([])
                o_code.append(None)
                o_error.append("connection failed")
                o_fetched.append(-1)
                o_hexd.append(hexd)
            else:
                t, i = hit
                final_url = hops[-1]
                if accept_ck:
                    # Set-Cookie analogue: the simulated host issues a
                    # deterministic session id on every response
                    self._cookie_jar[host] = "sid=" + _hl.md5(host.encode()).hexdigest()[:8]
                o_url.append(final_url)
                o_host.append(host_of(final_url) if hops[0] != final_url else host)
                o_aliases.append(hops[:-1])
                o_code.append(code)  # final hop's code from the loop above
                o_error.append(None)
                o_fetched.append(self.now + int(t0))
                o_hexd.append(hexd if final_url == url else None)
                finals.append((len(o_url) - 1, t, i))

        n_out = len(o_url)
        # payload columns via batched take per bucket table (vectorized copy)
        payload_cols = ["caption", "links", "content_type", "bytes", "w", "h", "fmt", "phash", "doc_id", "base_href"]
        pay: dict[str, list] = {c: [None] * n_out for c in payload_cols}
        for j, e in enumerate(o_error):
            if e is not None:
                pay["links"][j] = []
                pay["content_type"][j] = ""
        by_table: dict[int, tuple[pa.Table, list[int], list[int]]] = {}
        for out_idx, t, i in finals:
            key = id(t)
            ent = by_table.setdefault(key, (t, [], []))
            ent[1].append(out_idx)
            ent[2].append(i)
        for t, out_idxs, row_idxs in by_table.values():
            sub = t.select(payload_cols).take(pa.array(row_idxs))
            for c in payload_cols:
                vals = sub[c].to_pylist()
                col = pay[c]
                for j, oi2 in enumerate(out_idxs):
                    col[oi2] = vals[j]

        # uuid / hashes: one md5 per row (reused from the request hash
        # when no redirect moved the final url); host hashes cached per
        # host — batches are host-clustered
        inc = self.cfg.include_query_string_in_saved_page
        from ..urltools import strip_query

        o_uuid: list = [None] * n_out
        o_uhash: list = [0] * n_out
        o_hhash: list = [0] * n_out
        o_bucket: list = [0] * n_out
        hh_cache: dict[str, tuple[int, int]] = {}
        for j in range(n_out):
            hexd = o_hexd[j] if inc else None
            if hexd is None:
                u = o_url[j] if inc else strip_query(o_url[j])
                hexd = _hl.md5(u.encode("utf-8", "surrogatepass")).hexdigest()
            o_uuid[j] = hexd
            uhv = int(hexd[:16], 16)
            o_uhash[j] = uhv - (1 << 64) if uhv >= (1 << 63) else uhv
            host = o_host[j]
            got = hh_cache.get(host)
            if got is None:
                hhv = host_hash64(host)
                got = (hhv - (1 << 64) if hhv >= (1 << 63) else hhv, hhv % self.num_buckets)
                hh_cache[host] = got
            o_hhash[j], o_bucket[j] = got

        # redirect-final / generic storage-dedup on the FINAL url
        # (reference re-checks page_exists? after redirects, polipus.rb:209)
        keep = np.ones(n_out, dtype=bool)
        if self.pool is not None:
            redirected = [j for j in range(n_out) if o_aliases[j] and not o_seeded[j]]
            if redirected:
                uh_arr = np.array([o_uhash[j] for j in redirected], dtype=np.int64).view(np.uint64)
                hh_arr = np.array([o_hhash[j] for j in redirected], dtype=np.int64).view(np.uint64)
                exists, ts = self.pool.stored_info(uh_arr, hh_arr)
                ttl = self.cfg.ttl_page
                for k, j in enumerate(redirected):
                    expired = ttl is not None and ts[k] >= 0 and (self.now - ttl) > ts[k]
                    if exists[k] and not expired:
                        keep[j] = False
        cols = {
            "uuid": o_uuid,
            "url": o_url,
            "host": o_host,
            "host_bucket": o_bucket,
            "url_hash": o_uhash,
            "host_hash": o_hhash,
            "aliases": o_aliases,
            "referer": o_ref,
            "depth": o_depth,
            "seeded": o_seeded,
            "code": o_code,
            "bytes": pay["bytes"],
            "caption": pay["caption"],
            "w": pay["w"],
            "h": pay["h"],
            "fmt": pay["fmt"],
            "phash": pay["phash"],
            "links": pay["links"],
            "content_type": pay["content_type"],
            "response_time": o_resp,
            "fetched_at": o_fetched,
            "ua": o_ua,
            "cookies_sent": o_ck,
            "error": o_error,
            "user_data": o_ud,
            "attempt": o_att,
            "seq": o_seq,
            "round": [self.round_no] * n_out,
            "doc_id": pay["doc_id"],
            "base_href": pay["base_href"],
            "storable": [True] * n_out,
        }
        if not keep.all():
            cols = {k: [v for v, kp in zip(vals, keep) if kp] for k, vals in cols.items()}
        schema = self._schema()
        t = pa.table({k: pa.array(v, schema.field(k).type) for k, v in cols.items()}).select(schema.names)
        if self._mark_stored and self.pool is not None and t.num_rows:
            # fused mark-stored (only when no before_save hooks can
            # flip storable): one RPC batch per fetch group
            self.pool.mark_stored(
                np.asarray(t["url_hash"].to_numpy(), dtype=np.int64).view(np.uint64),
                np.asarray(t["host_hash"].to_numpy(), dtype=np.int64).view(np.uint64),
                t["fetched_at"].to_numpy(zero_copy_only=False),
            )
        return t

    # -- persistent-pool round method (fetch_mode='pool') ------------------
    def run_round_batch(self, batch: pa.Table, round_no: int, now: int, out_path: str, spill_path: str | None = None, actor_id: int = 0) -> dict:
        """One actor's share of a round: prefilter+fetch (__call__),
        before_save hooks, storable filter, mark-stored, except-drop,
        parquet write, fused link extraction.  Returns counts + the
        narrow candidate table (policy-prefiltered).  Reuses the exact
        same stage callables as the Dataset path."""
        from ..frontier.stages import PAGE_NARROW, filter_storable, make_link_extractor, make_mark_stored

        self.round_no = round_no
        self.now = now
        tm: dict[str, float] = {}
        deferred = None
        cap = int(self.cfg.max_urls_per_host_per_round or 0)
        if cap > 0 and batch.num_rows:
            # hot-host cap (SURVEY.md §4 skew row): at most `cap` URLs
            # per host per round; the rest defer to the next round with
            # their original seq (FIFO position preserved)
            order = np.lexsort((batch["seq"].to_numpy(), batch["priority"].to_numpy()))
            hosts = batch["host"].to_pylist()
            count: dict[str, int] = {}
            keep = np.zeros(batch.num_rows, dtype=bool)
            for oi in order:
                h_ = hosts[oi]
                c = count.get(h_, 0)
                if c < cap:
                    keep[oi] = True
                count[h_] = c + 1
            if not keep.all():
                deferred = batch.filter(pa.array(~keep))
                batch = batch.filter(pa.array(keep))
        # process in bounded sub-batches: a 60k-row actor share as ONE
        # __call__ builds millions of transient python objects (GC /
        # allocator pressure measurably raises per-row cost); slices of
        # fetch_batch_size keep the per-page cost flat.  Sorting once
        # by (priority, seq) before slicing preserves the exact
        # politeness/FIFO processing order of the unsliced path.
        B = max(1024, int(self.cfg.fetch_batch_size or 4096))
        if batch.num_rows > B:
            order = np.lexsort((batch["seq"].to_numpy(), batch["priority"].to_numpy()))
            batch = batch.take(pa.array(order))
        parts = []
        tm["fetch"] = tm["verify"] = 0.0
        for off in range(0, max(batch.num_rows, 1), B):
            sub = batch.slice(off, B)
            s = time.perf_counter()
            p = self(sub)
            tm["fetch"] += time.perf_counter() - s
            if self.cfg.verify_payload and p.num_rows:
                s = time.perf_counter()
                p = self._verify_payloads(p)
                tm["verify"] += time.perf_counter() - s
            parts.append(p)
        pages = parts[0] if len(parts) == 1 else pa.concat_tables(parts).combine_chunks()
        unstorable = None
        if self._before_save_hooks:
            for fn in self._before_save_hooks:
                pages = fn(pages)
            if pages.num_rows and "storable" in pages.column_names:
                mask = np.asarray(pages["storable"].to_numpy(zero_copy_only=False), dtype=bool)
                if not mask.all():
                    # unstorable pages still reach on_page_downloaded /
                    # on_page_error (reference fires hooks on every
                    # processed page, polipus.rb:221-237) — returned
                    # narrow (bytes-free) for the driver-side hooks
                    unstorable = pages.filter(pa.array(~mask))
            pages = filter_storable(pages)
            if self.cfg.storage != "devnull" and self.pool is not None and pages.num_rows:
                make_mark_stored(self.pool)(pages)
        if self.cfg.storage_except:
            pages = pages.drop_columns([c for c in self.cfg.storage_except if c in pages.column_names])
        if unstorable is not None:
            drop = set(self.cfg.storage_except or ()) | {"bytes"}
            unstorable = unstorable.drop_columns([c for c in drop if c in unstorable.column_names])
        stored = pages.num_rows
        errors = pages.num_rows - pages["error"].null_count if stored else 0
        s = time.perf_counter()
        if stored:
            pq.write_table(pages, out_path, compression="zstd")
        tm["write"] = time.perf_counter() - s
        # narrow dedup keys returned inline: saves the driver a
        # per-round columnar re-read of every part file
        keys = pages.select(["url_hash", "host_hash", "seq", "fetched_at"]) if stored else None
        if self._extractor is None:
            self._extractor = make_link_extractor(self.cfg, self._focus_crawl, self.num_buckets, robots_bodies=self._robots_bodies)
        s = time.perf_counter()
        cand = self._extractor(pages.select(PAGE_NARROW)) if stored else None
        tm["extract"] = time.perf_counter() - s
        spill = None
        cand_keys = None
        if spill_path is not None and self.cfg.deterministic_order and cand is not None and cand.num_rows:
            # deterministic scale path: candidates sorted locally and
            # STAY in the actor; only the narrow ordering/dedup keys
            # (url_hash, host_hash, parent_seq, link_idx — 28 B/row)
            # go to the driver, which runs the global FIFO admission
            # and calls back emit_frontier() with admitted indices +
            # seqs.  Byte-identical order to driver streaming, without
            # candidate strings ever crossing the driver.
            s = time.perf_counter()
            order = np.lexsort((cand["link_idx"].to_numpy(), cand["parent_seq"].to_numpy()))
            cand = cand.take(pa.array(order))
            self._pending_cand = cand
            self._pending_spill_path = spill_path
            cand_keys = cand.select(["url_hash", "host_hash", "parent_seq", "link_idx"])
            cand = None
            tm["keys"] = time.perf_counter() - s
        elif spill_path is not None and not self.cfg.deterministic_order and self.pool is not None and cand is not None and cand.num_rows:
            # relaxed-order scale path: admit + spill in-actor.  Local
            # FIFO sort -> shard check_and_add -> composite seq
            # (round, actor, idx): per-round depth order preserved,
            # intra-round total order approximate.
            s = time.perf_counter()
            order = np.lexsort((cand["link_idx"].to_numpy(), cand["parent_seq"].to_numpy()))
            cand = cand.take(pa.array(order))
            from ..frontier.stages import tracker_admit

            cand = tracker_admit(cand, self.pool, self.cfg, now)
            n = cand.num_rows
            if n:
                # composite-seq layout: 2^28 seqs per (round, actor),
                # 4096 actors per round.  Overflowing either collides
                # adjacent ranges and silently corrupts (url_hash, seq)
                # tombstone identity + FIFO order — fail loudly instead.
                if n >= (1 << 28) or actor_id >= (1 << 12):
                    raise OverflowError(
                        f"relaxed-order seq layout exceeded: n={n} (max 2^28), "
                        f"actor_id={actor_id} (max 4095); widen the composite layout"
                    )
                base = (round_no + 1) * (1 << 40) + actor_id * (1 << 28)
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
                        "seq": pa.array(base + np.arange(n), pa.int64()),
                        "priority": pa.array(np.zeros(n, dtype=np.int64)),
                        "attempt": pa.array(np.zeros(n, dtype=np.int32)),
                        "user_data": pa.array(["{}"] * n, pa.string()),
                    }
                )
                # CHUNKED spill parts: links stay mostly same-host, so
                # one big part per actor routes back to one actor; when
                # the active-slice cap cuts the FIFO mid-round, whole-
                # actor parts would concentrate a round's leftover on
                # few actors (14x skew measured).  Small parts +
                # round-robin registration (engine side) keep any cut
                # boundary spread across the pool.
                spill = []
                for off in range(0, n, 16384):
                    chunk = ft.slice(off, 16384)
                    cp = spill_path if off == 0 else spill_path.replace(".parquet", f"-{off // 16384}.parquet")
                    pq.write_table(chunk, cp, compression="lz4")
                    spill.append({"path": cp, "rows": chunk.num_rows})
            cand = None
            tm["admit_spill"] = time.perf_counter() - s
        return {
            "stored": stored,
            "errors": errors,
            "cand": cand,
            "cand_keys": cand_keys,
            "spill": spill,
            "keys": keys,
            "deferred": deferred,
            "unstorable": unstorable,
            "path": out_path if stored else None,
            "timings": tm,
        }

    def emit_frontier(self, admitted_idx: np.ndarray, seqs: np.ndarray) -> list[dict] | None:
        """Deterministic-mode callback: the driver admitted
        ``admitted_idx`` (positions into this actor's locally-sorted
        pending candidates) with global FIFO ``seqs``; build the
        frontier rows here and write this actor's spill parts (CHUNKED
        for the same active-slice-cut balance reason as the relaxed
        path — links are mostly same-host, so whole-actor parts
        concentrate slice leftovers)."""
        cand = self._pending_cand
        spill_path = self._pending_spill_path
        self._pending_cand = None
        self._pending_spill_path = None
        if cand is None or len(admitted_idx) == 0:
            return None
        sub = cand.take(pa.array(np.asarray(admitted_idx, dtype=np.int64)))
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

    def _verify_payloads(self, pages: pa.Table) -> pa.Table:
        """Decode each image payload and verify the stored perceptual
        hash (per-row decoded-pixel invariant, SURVEY.md M15).  With
        ``phash_scales > 1`` also fingerprints downsampled scales (a
        multi-scale fingerprint pyramid).  Vectorized: images are
        grouped by shape and hashed as batched GEMMs (phash64_batch is
        bit-identical to the scalar phash64)."""
        from ..synth.images import decode_image, phash64_batch

        scales = max(1, int(self.cfg.phash_scales))
        ph = pages["phash"].to_pylist()
        blobs = pages["bytes"].to_pylist()
        n = len(blobs)
        ok = np.zeros(n, dtype=bool)
        groups: dict[tuple[int, int], tuple[list[int], list[np.ndarray]]] = {}
        for i, data in enumerate(blobs):
            if data is None:
                continue
            try:
                px, _, _, _ = decode_image(data)
            except (ValueError, NotImplementedError):
                continue
            g = groups.setdefault(px.shape[:2], ([], []))
            g[0].append(i)
            g[1].append(px)
        # chunked: the float64 DCT pyramid of a whole 60k-row round
        # would peak ~2 GB per actor (x W actors = memory-pressure
        # stalls); 2048-image chunks keep the peak ~70 MB with the
        # same vectorization win
        CHUNK = 2048
        for (h, w), (idxs, pxs) in groups.items():
            for off in range(0, len(idxs), CHUNK):
                stack = np.stack(pxs[off : off + CHUNK])
                got = phash64_batch(stack)
                for s in range(1, scales):
                    side = max(4, 32 >> s)
                    yi = (np.arange(side) * h // side).astype(np.int64)
                    xi = (np.arange(side) * w // side).astype(np.int64)
                    phash64_batch(stack[:, yi[:, None], xi[None, :], :])  # pyramid levels (fingerprint work)
                for k in range(len(got)):
                    i = idxs[off + k]
                    want = ph[i]
                    ok[i] = want is None or int(got[k]) == (want + (1 << 64) if want < 0 else want)
        return pages.append_column("payload_ok", pa.array(ok.tolist(), pa.bool_()))

    def preload(self, buckets: list[int]) -> int:
        """Warm this actor: load its web buckets (pool warm-up)."""
        for b in buckets:
            self._load_bucket(b)
        return len(self._buckets)

    def _schema(self) -> pa.Schema:
        return pa.schema(
            [
                ("uuid", pa.string()),
                ("url", pa.string()),
                ("host", pa.string()),
                ("host_bucket", pa.int32()),
                ("url_hash", pa.int64()),
                ("host_hash", pa.int64()),
                ("aliases", pa.list_(pa.string())),
                ("referer", pa.string()),
                ("depth", pa.int32()),
                ("seeded", pa.bool_()),
                ("code", pa.int32()),
                ("bytes", pa.large_binary()),
                ("caption", pa.string()),
                ("w", pa.int32()),
                ("h", pa.int32()),
                ("fmt", pa.string()),
                ("phash", pa.int64()),
                ("links", pa.list_(pa.string())),
                ("content_type", pa.string()),
                ("response_time", pa.int64()),
                ("fetched_at", pa.int64()),
                ("ua", pa.string()),
                ("cookies_sent", pa.string()),
                ("error", pa.string()),
                ("user_data", pa.string()),
                ("attempt", pa.int32()),
                ("seq", pa.int64()),
                ("round", pa.int32()),
                ("doc_id", pa.int64()),
                ("base_href", pa.string()),
                ("storable", pa.bool_()),
            ]
        )

    def _empty(self) -> pa.Table:
        return self._schema().empty_table()

    def _to_table(self, out: list[dict]) -> pa.Table:
        if not out:
            return self._empty()
        import hashlib

        from ..urltools import strip_query

        inc = self.cfg.include_query_string_in_saved_page
        # one md5 per row: uuid is the hex digest, url_hash the first
        # 8 bytes of the SAME digest (url_hash64 == int(hexdigest[:16],
        # 16) by construction); host hashes cached per host (batches
        # are host-clustered)
        hh_cache: dict[str, tuple[int, int]] = {}
        for r in out:
            u = r["url"] if inc else strip_query(r["url"])
            hexd = hashlib.md5(u.encode("utf-8", "surrogatepass")).hexdigest()
            r["uuid"] = hexd
            uhv = int(hexd[:16], 16)
            r["url_hash"] = uhv - (1 << 64) if uhv >= (1 << 63) else uhv
            host = r["host"]
            got = hh_cache.get(host)
            if got is None:
                hhv = host_hash64(host)
                got = (hhv - (1 << 64) if hhv >= (1 << 63) else hhv, hhv % self.num_buckets)
                hh_cache[host] = got
            r["host_hash"], r["host_bucket"] = got
        schema = self._schema()
        cols = {f.name: [r.get(f.name) for r in out] for f in schema}
        return pa.table({k: pa.array(v, schema.field(k).type) for k, v in cols.items()})


def fetcher_kwargs(web_dir: str, robots_bodies: dict, cfg: CrawlConfig, pool, round_no: int, now: int, num_buckets: int) -> dict:
    """fn_constructor_kwargs for map_batches/map_groups."""
    return dict(web_dir=web_dir, robots_bodies=robots_bodies, cfg=cfg, pool=pool, round_no=round_no, now=now, num_buckets=num_buckets)
