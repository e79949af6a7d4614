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
from ..urltools import canonicalize, host_hash64, host_of, page_uuid, strip_query, url_hash64

_FETCH_COLUMNS = ["doc_id", "url", "code", "content_type", "redirect_to", "caption", "links", "bytes", "w", "h", "fmt", "phash", "base_href"]

# column types for empty buckets (must match the world parquet so the
# payload concat/take path stays type-stable)
_WEB_FETCH_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("code", pa.int32()),
        ("content_type", pa.string()),
        ("redirect_to", pa.string()),
        ("caption", pa.string()),
        ("links", pa.list_(pa.string())),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("phash", pa.int64()),
        ("base_href", pa.string()),
    ]
)


def _drop_rows_sliced(t: pa.Table, keep: np.ndarray) -> pa.Table:
    """Drop rows by composing ZERO-COPY slice runs instead of a
    full-table filter copy.  When drops are sparse (the common case:
    a few duplicate redirect finals in a 60k-row share), the kept
    rows form long contiguous runs — each run becomes a `t.slice`
    view and `concat_tables` stitches them without touching the
    payload bytes.  Falls back to a regular filter when the mask is
    fragmented enough that per-chunk overhead would win instead."""
    idx = np.flatnonzero(keep)
    if idx.size == 0:
        return t.slice(0, 0)
    if idx.size == t.num_rows:
        return t
    brk = np.flatnonzero(np.diff(idx) > 1)
    n_runs = brk.size + 1
    if n_runs > 2048:
        return t.filter(pa.array(keep))
    starts = np.concatenate(([0], brk + 1))
    ends = np.concatenate((brk, [idx.size - 1]))
    pieces = [t.slice(int(idx[s]), int(idx[e] - idx[s] + 1)) for s, e in zip(starts, ends)]
    return pieces[0] if len(pieces) == 1 else pa.concat_tables(pieces)


class _Bucket:
    """One cached web-table partition plus its lookup index: a
    sorted md5-prefix (uint64) array + permutation for batched binary
    search, per-row code/redirect arrays for the hot loop.  Built once
    per bucket per actor (amortized across every round the actor
    serves)."""

    __slots__ = ("t", "urls", "codes", "redirects", "uh_sorted", "perm", "is_redir")

    def __init__(self, t: pa.Table):
        import pyarrow.compute as pc

        from ..ops.md5vec import md5_u64_arrow

        self.t = t
        self.urls = t["url"]
        if t.num_rows:
            self.codes = t["code"].to_numpy()
            self.redirects = t["redirect_to"].to_pylist()
            uh = md5_u64_arrow(t["url"].combine_chunks())
            self.perm = np.argsort(uh, kind="stable")
            self.uh_sorted = uh[self.perm]
            rt_ok = np.asarray(pc.fill_null(pc.not_equal(t["redirect_to"], ""), False).to_numpy(zero_copy_only=False), bool)
            self.is_redir = rt_ok & (self.codes >= 300) & (self.codes < 400)
        else:
            self.codes = np.zeros(0, np.int32)
            self.redirects = []
            self.perm = np.zeros(0, np.int64)
            self.uh_sorted = np.zeros(0, np.uint64)
            self.is_redir = np.zeros(0, bool)


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
        plasma_spill: bool = False,
    ):
        self.web_dir = web_dir
        self.cfg = cfg
        self.num_buckets = num_buckets
        # raw user_agent (possibly a list): robots matching resolves
        # per-request UAs; crawl-delay stays pinned to index 0 (the
        # politeness clock needs one delay per host — see RobotsCache)
        self.robots = RobotsCache(robots_bodies, cfg.user_agent)
        self.pool = pool
        self.round_no = round_no
        self.now = now
        # web_refs: {bucket: ray.ObjectRef(pa.Table)} — the web table
        # broadcast ONCE per run (ray.put on the driver); plasma reads
        # are zero-copy and shared across actors/rounds on a node,
        # replacing a per-round per-actor parquet re-read
        self.web_refs = web_refs
        self._buckets: dict[int, _Bucket] = {}
        # politeness clocks in integer MICROSECONDS: the closed-form
        # per-host schedule (base + k*d) must be bit-stable for
        # fractional crawl delays too, so delays are quantized to us
        # once and all clock arithmetic is exact int64 (ADVICE r3)
        self._next_ok: dict[str, int] = {}
        self._delay_cache: dict[str, int] = {}
        self._hh_cache: dict[str, tuple[int, int]] = {}
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
        self._mark_submit_t = 0.0  # profiling: time blocked in mark RPC submission
        self._verify_ex = None  # lazy 1-thread pool for the fetch/verify pipeline
        # non-None only inside run_round_batch: mark-stored ObjectRefs
        # collected for the engine to await at the round barrier
        self._round_mark_refs: list | None = None
        self._bucket_lut: np.ndarray | None = None
        # plasma mode (engine sets this when checkpointing is off):
        # emit spill parts as Ray objects instead of lz4 parquet files
        self._plasma_spill = bool(plasma_spill)

    def export_bucket_state(self, bucket: int) -> dict:
        """Rebalance-move donor side: hand over the bucket's per-host
        MUTABLE state — politeness clocks and cookie jar — and drop the
        cached web partition.  Clocks/cookies travelling with the
        bucket keep per-host semantics byte-identical to a static
        assignment: a host is still served by exactly one actor at a
        time, and moves happen between rounds (no fetch in flight)."""
        b = int(bucket)
        clocks: dict[str, int] = {}
        for h in list(self._next_ok):
            if host_hash64(h) % self.num_buckets == b:
                clocks[h] = self._next_ok.pop(h)
        cookies: dict[str, str] = {}
        for h in list(self._cookie_jar):
            if host_hash64(h) % self.num_buckets == b:
                cookies[h] = self._cookie_jar.pop(h)
        self._buckets.pop(b, None)  # receiver loads its own copy (plasma, zero-copy)
        return {"clocks": clocks, "cookies": cookies}

    def import_bucket_state(self, state: dict) -> None:
        """Rebalance-move receiver side."""
        self._next_ok.update(state["clocks"])
        self._cookie_jar.update(state["cookies"])

    def set_bucket_lut(self, lut: np.ndarray) -> None:
        """bucket -> actor assignment, shipped once at pool creation so
        ``run_round_batch(select_mine=True)`` can select this actor's
        rows from the round's shared plasma frontier table (the driver
        no longer slices/serializes per-actor sub-tables)."""
        self._bucket_lut = np.asarray(lut, dtype=np.int64)

    # -- web-table partition cache ---------------------------------------
    def _bucket_of(self, url: str) -> int:
        return host_hash64(host_of(url)) % self.num_buckets

    def _load_bucket(self, b: int) -> "_Bucket":
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
                    t = _WEB_FETCH_SCHEMA.empty_table()
            got = _Bucket(t.combine_chunks())
            self._buckets[b] = got
        return got

    def _lookup_in(self, bk: "_Bucket", url: str) -> int:
        """Point lookup within a bucket record: binary search on the
        md5-prefix index, string-verified (collisions resolve by
        scanning the equal-hash run)."""
        import hashlib as _hl

        v = np.uint64(int.from_bytes(_hl.md5(url.encode("utf-8", "surrogatepass")).digest()[:8], "big"))
        lo = int(np.searchsorted(bk.uh_sorted, v, side="left"))
        hi = int(np.searchsorted(bk.uh_sorted, v, side="right"))
        for p in range(lo, hi):
            ri = int(bk.perm[p])
            if bk.urls[ri].as_py() == url:
                return ri
        return -1

    def _lookup(self, url: str, bucket: int | None = None) -> int:
        return self._lookup_in(self._load_bucket(self._bucket_of(url) if bucket is None else bucket), url)

    def _lookup_batch(self, urls: list, bks: np.ndarray) -> np.ndarray:
        """Batched point lookup: one md5 stream + one binary-search
        batch per touched bucket, Arrow-vectorized string verify (the
        hop-0 fast-path machinery, reusable for redirect-hop waves).
        Returns each url's row within its bucket table, -1 on miss."""
        import pyarrow.compute as pc

        from ..ops.md5vec import md5_u64_strs

        n = len(urls)
        row = np.full(n, -1, np.int64)
        if not n:
            return row
        uh = md5_u64_strs(urls, errors="surrogatepass")
        for b in np.unique(bks):
            bk = self._load_bucket(int(b))
            if not len(bk.uh_sorted):
                continue
            sel = np.flatnonzero(bks == b)
            want = uh[sel]
            lo = np.searchsorted(bk.uh_sorted, want, side="left")
            hi = np.searchsorted(bk.uh_sorted, want, side="right")
            width = hi - lo
            m1 = np.flatnonzero(width == 1)
            if len(m1):
                rows1 = bk.perm[lo[m1]]
                eq = np.asarray(
                    pc.equal(bk.t["url"].take(pa.array(rows1)), pa.array([urls[int(i)] for i in sel[m1]])).to_numpy(
                        zero_copy_only=False
                    ),
                    bool,
                )
                row[sel[m1[eq]]] = rows1[eq]
            for k in np.flatnonzero(width > 1):  # rare: shared 64-bit hash prefix
                u = urls[int(sel[k])]
                for p in range(int(lo[k]), int(hi[k])):
                    ri = int(bk.perm[p])
                    if bk.urls[ri].as_py() == u:
                        row[sel[k]] = ri
                        break
        return row

    def _delay(self, host: str) -> float:
        if self.cfg.obey_robots_txt:
            d = self.robots.delay(host)
            if d is not None:
                return float(d)
        return float(self.cfg.politeness_default_delay)

    # -- the fetch batch --------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized fetch: the no-redirect majority path is a batched
        binary-search lookup + numpy column assembly; only 3xx rows
        (reference redirect semantics) and hash-prefix collisions drop
        to per-row Python.  One md5 per row remains — it is the uuid /
        url_hash semantic (M22), not overhead."""
        if self._prefetch_check and self.pool is not None and batch.num_rows:
            if self._prefilter is None or self._prefilter_now != self.now:
                from ..frontier.stages import make_prefetch_filter

                self._prefilter = make_prefetch_filter(self._robots_bodies, self.cfg, self.pool, self.now)
                self._prefilter_now = self.now
            batch = self._prefilter(batch)
        n = batch.num_rows
        if n == 0:
            return self._empty()
        # per-host priority order (O7): lower priority first, then FIFO seq
        order = np.lexsort((batch["seq"].to_numpy(), batch["priority"].to_numpy()))
        if not np.array_equal(order, np.arange(n)):
            batch = batch.take(pa.array(order))

        import hashlib as _hl

        import pyarrow.compute as pc

        from ..ops.md5vec import md5_digest_arrow

        cfg = self.cfg
        urls: list = batch["url"].to_pylist()
        hosts: list = batch["host"].to_pylist()
        # one md5 per REQUESTED url (uuid / url_hash / UA+resp sampling),
        # batched through the numpy-lane kernel straight off the Arrow
        # buffer (hashlib-identical)
        digs = md5_digest_arrow(batch["url"])
        req_uh = digs[:, :8].copy().view(">u8").reshape(-1).astype(np.uint64)

        # --- politeness: closed-form per-host virtual clocks ---------------
        # with the batch in processing order, row k of host h gets
        # t0 = base_h + k*d_h and the clock ends at base_h + m_h*d_h —
        # the per-request accumulation computed for all rows at once
        hu, inv = np.unique(np.asarray(hosts, dtype=object), return_inverse=True)
        G = len(hu)
        delays = np.empty(G, np.int64)  # integer microseconds (exact)
        bases = np.empty(G, np.int64)
        dcache = self._delay_cache
        hcache = self._hh_cache
        hh_g = np.empty(G, np.int64)
        hb_g = np.empty(G, np.int64)
        for gi in range(G):
            h = hu[gi]
            d = dcache.get(h)
            if d is None:
                d = int(round(self._delay(h) * 1_000_000))
                dcache[h] = d
            delays[gi] = d
            b0 = self._next_ok.get(h, 0)
            bases[gi] = 0 if b0 < 0 else b0
            got = hcache.get(h)
            if got is None:
                v = host_hash64(h)
                got = (v - (1 << 64) if v >= (1 << 63) else v, v % self.num_buckets)
                hcache[h] = got
            hh_g[gi], hb_g[gi] = got
        s_idx = np.argsort(inv, kind="stable")
        sinv = inv[s_idx]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(sinv)) + 1))
        sizes = np.diff(np.concatenate((starts, [n])))
        occ = np.empty(n, np.int64)
        occ[s_idx] = np.arange(n) - np.repeat(starts, sizes)
        t0 = bases[inv] + occ * delays[inv]  # int64 us, exact
        for gi in range(G):
            self._next_ok[hu[gi]] = int(bases[gi] + sizes[gi] * delays[gi])
        if cfg.simulate_politeness_wall_clock:
            # simulation-only: one aggregate sleep per sub-batch (same
            # total wall time as per-request sleeps)
            tot = float(delays[inv].sum()) / 1_000_000.0
            if tot > 0:
                time.sleep(tot)
        hh_col = hh_g[inv]
        hb_col = hb_g[inv]

        # --- hop-0 lookup, vectorized per bucket ---------------------------
        if "host_bucket" in batch.column_names:
            bks = batch["host_bucket"].to_numpy().astype(np.int64)
        else:
            bks = np.fromiter((self._bucket_of(u) for u in urls), dtype=np.int64, count=n)
        row_idx = np.full(n, -1, np.int64)  # hop-0 row within its bucket table
        redir_flag = np.zeros(n, bool)  # found AND 3xx-with-location
        code_np = np.zeros(n, np.int32)
        bucket_sel: list[tuple] = []  # (bucket_record, out_positions, table_rows) fast hits
        for b in np.unique(bks):
            bk = self._load_bucket(int(b))
            sel = np.flatnonzero(bks == b)
            if not len(bk.uh_sorted):
                continue
            want = req_uh[sel]
            lo = np.searchsorted(bk.uh_sorted, want, side="left")
            hi = np.searchsorted(bk.uh_sorted, want, side="right")
            width = hi - lo
            m1 = np.flatnonzero(width == 1)
            if len(m1):
                rows1 = bk.perm[lo[m1]]
                eq = np.asarray(
                    pc.equal(bk.t["url"].take(pa.array(rows1)), batch["url"].take(pa.array(sel[m1]))).to_numpy(
                        zero_copy_only=False
                    ),
                    bool,
                )
                row_idx[sel[m1[eq]]] = rows1[eq]
            for k in np.flatnonzero(width > 1):  # rare: shared 64-bit hash prefix
                u = urls[sel[k]]
                for p in range(int(lo[k]), int(hi[k])):
                    ri = int(bk.perm[p])
                    if bk.urls[ri].as_py() == u:
                        row_idx[sel[k]] = ri
                        break
            found_local = np.flatnonzero(row_idx[sel] >= 0)
            if len(found_local):
                rows_f = row_idx[sel[found_local]]
                redir_flag[sel[found_local]] = bk.is_redir[rows_f]
                code_np[sel[found_local]] = bk.codes[rows_f]
            fast_local = found_local[~redir_flag[sel[found_local]]]
            if len(fast_local):
                bucket_sel.append((bk, sel[fast_local], row_idx[sel[fast_local]]))

        hit = (row_idx >= 0) & ~redir_flag

        # --- slow path: redirect chains, wave-batched -----------------------
        # same-host, <= redirect_limit hops, relative Location resolved
        # per hop (http.rb:161-182); a hop resolving nowhere makes the
        # chain an error page with the ORIGINAL url (http.rb:63-71).
        # Hop-0 rows are already resolved by the vectorized lookup
        # above; each further hop level is ONE _lookup_batch call over
        # every still-active chain (per-row Python only for the
        # Location canonicalize/same-host string checks).
        slow_hops: dict[int, list] = {}
        slow_final: dict[int, tuple] = {}
        url_vals: list | None = None
        host_vals: list | None = None
        red0 = np.flatnonzero(redir_flag)
        if len(red0):
            rlimit = cfg.redirect_limit
            jj = [int(j) for j in red0]
            cur_u = [urls[j] for j in jj]
            cur_b = bks[red0].astype(np.int64)
            cur_ri = row_idx[red0].astype(np.int64)
            hops_map: dict[int, list] = {}
            while jj:
                nxt_j: list[int] = []
                nxt_u: list[str] = []
                for k, j in enumerate(jj):
                    bk = self._load_bucket(int(cur_b[k]))
                    ri = int(cur_ri[k])
                    cu = cur_u[k]
                    hops = hops_map.setdefault(j, [])
                    hops.append(cu)
                    code = int(bk.codes[ri])
                    rt = bk.redirects[ri]
                    if rt:
                        rt = canonicalize(rt, cu)
                    if 300 <= code < 400 and rt and host_of(rt) == host_of(cu) and len(hops) <= rlimit:
                        nxt_j.append(j)
                        nxt_u.append(rt)
                    else:
                        slow_final[j] = (bk, ri)
                if not nxt_j:
                    break
                nb = np.fromiter((self._bucket_of(u) for u in nxt_u), np.int64, count=len(nxt_u))
                nri = self._lookup_batch(nxt_u, nb)
                ok_w = nri >= 0  # misses drop out: error page, original url
                keep_w = np.flatnonzero(ok_w)
                jj = [nxt_j[int(k)] for k in keep_w]
                cur_u = [nxt_u[int(k)] for k in keep_w]
                cur_b = nb[keep_w]
                cur_ri = nri[keep_w]
            for j, (bk_f, ri) in slow_final.items():
                hit[j] = True
                slow_hops[j] = hops_map[j]
                code_np[j] = bk_f.codes[ri]
                fu = hops_map[j][-1]
                if fu != urls[j]:
                    if url_vals is None:
                        url_vals = list(urls)
                    url_vals[j] = fu
                    fh = host_of(fu)
                    if fh != hosts[j]:
                        if host_vals is None:
                            host_vals = list(hosts)
                        host_vals[j] = fh
                        got = hcache.get(fh)
                        if got is None:
                            v = host_hash64(fh)
                            got = (v - (1 << 64) if v >= (1 << 63) else v, v % self.num_buckets)
                            hcache[fh] = got
                        hh_col[j], hb_col[j] = got

        # --- uuid / url_hash (md5 reuse when final == requested) -----------
        inc = cfg.include_query_string_in_saved_page
        _hex_all = digs.tobytes().hex()
        uuid_hex = [_hex_all[32 * j : 32 * j + 32] for j in range(n)]
        uh_signed = req_uh.view(np.int64).copy()
        redo: set[int] = set()
        if not inc:
            redo.update(j for j, u in enumerate(urls) if "?" in u)
        if url_vals is not None:
            redo.update(j for j in slow_hops if url_vals[j] != urls[j])
        for j in redo:
            u = url_vals[j] if url_vals is not None else urls[j]
            if not inc:
                u = strip_query(u)
            d = _hl.md5(u.encode("utf-8", "surrogatepass")).digest()
            uuid_hex[j] = d.hex()
            v = int.from_bytes(d[:8], "big")
            uh_signed[j] = v - (1 << 64) if v >= (1 << 63) else v

        # --- payload gather: one vectorized take over a virtual concat -----
        payload_cols = ["caption", "links", "content_type", "bytes", "w", "h", "fmt", "phash", "doc_id", "base_href"]
        subs: list[pa.Table] = []
        src = np.zeros(n, np.int64)
        base = 0
        for bk, out_pos, rows in bucket_sel:
            subs.append(bk.t.select(payload_cols).take(pa.array(rows)))
            src[out_pos] = base + np.arange(len(rows))
            base += len(rows)
        if slow_final:
            # redirect finals grouped per bucket: ONE take per touched
            # bucket instead of one single-row take per redirect (the
            # per-row takes were ~60k calls/round at a 4% redirect
            # rate — the largest pc.take cost in the profile)
            by_bk: dict[int, tuple] = {}
            for j, (bk_f, ri) in slow_final.items():
                g = by_bk.setdefault(id(bk_f), (bk_f, [], []))
                g[1].append(j)
                g[2].append(ri)
            for bk_f, out_pos, rows in by_bk.values():
                subs.append(bk_f.t.select(payload_cols).take(pa.array(rows, pa.int64())))
                src[out_pos] = base + np.arange(len(rows))
                base += len(rows)
        pschema = subs[0].schema if subs else pa.schema([_WEB_FETCH_SCHEMA.field(c) for c in payload_cols])
        filler = []  # miss rows: links=[], content_type='', rest null (http.rb:63-71)
        for f in pschema:
            if f.name == "links":
                filler.append(pa.array([[]], f.type))
            elif f.name == "content_type":
                filler.append(pa.array([""], f.type))
            else:
                filler.append(pa.array([None], f.type))
        subs.append(pa.Table.from_arrays(filler, schema=pschema))
        src[~hit] = base
        # no combine_chunks: after per-bucket grouping the concat has
        # only ~(buckets + 1) chunks, and combining memcpy'd the whole
        # sub-batch payload (bytes included) once more before the take
        payload = pa.concat_tables(subs).take(pa.array(src))

        # --- remaining columns, vectorized ---------------------------------
        lens = np.zeros(n, np.int64)
        for j, hops in slow_hops.items():
            lens[j] = len(hops) - 1
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=offsets[1:])
        avals: list[str] = []
        for j in sorted(slow_hops):
            avals.extend(slow_hops[j][:-1])
        aliases_col = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(avals, pa.string()))
        if isinstance(cfg.user_agent, (list, tuple)):
            # per-request UA sampled by url hash (O6, http.rb:84-90)
            ua_np = np.asarray([str(x) for x in cfg.user_agent], dtype=object)
            ua_col = pa.array(ua_np[(req_uh % np.uint64(len(ua_np))).astype(np.int64)], pa.string())
        else:
            ua_col = pa.array(np.full(n, str(cfg.user_agent), dtype=object), pa.string())
        if cfg.accept_cookies:
            # cookie jar (T4): sent = jar content at request time; the
            # simulated server sets a deterministic session id per host
            # on every successful response
            jar = self._cookie_jar
            ck_vals = []
            for j in range(n):
                h = hosts[j]
                ck_vals.append(jar.get(h, ""))
                if hit[j]:
                    jar[h] = "sid=" + _hl.md5(h.encode()).hexdigest()[:8]
            ck_col = pa.array(ck_vals, pa.string())
        else:
            ck_col = pa.array(np.full(n, "", dtype=object), pa.string())
        if bool(hit.all()):
            err_col = pa.nulls(n, pa.string())
        else:
            err_col = pa.array(["connection failed" if not h_ else None for h_ in hit], pa.string())

        # redirect-final storage-dedup on the FINAL url (polipus.rb:209)
        keep = np.ones(n, bool)
        if self.pool is not None and slow_hops:
            seeded_np = np.asarray(batch["seeded"].to_numpy(zero_copy_only=False), bool)
            red = [j for j in slow_hops if lens[j] > 0 and not seeded_np[j]]
            if red:
                uh_arr = uh_signed[red].view(np.uint64)
                hh_arr = hh_col[red].view(np.uint64)
                exists, ts = self.pool.stored_info(uh_arr, hh_arr)
                ttl = cfg.ttl_page
                for k, j in enumerate(red):
                    expired = ttl is not None and ts[k] >= 0 and (self.now - ttl) > ts[k]
                    if exists[k] and not expired:
                        keep[j] = False

        schema = self._schema()
        cols = {
            "uuid": pa.array(uuid_hex, pa.string()),
            "url": pa.array(url_vals, pa.string()) if url_vals is not None else batch["url"],
            "host": pa.array(host_vals, pa.string()) if host_vals is not None else batch["host"],
            "host_bucket": pa.array(hb_col.astype(np.int32)),
            "url_hash": pa.array(uh_signed),
            "host_hash": pa.array(hh_col),
            "aliases": aliases_col,
            "referer": batch["referer"],
            "depth": batch["depth"],
            "seeded": batch["seeded"],
            "code": pa.array(code_np, mask=~hit),
            "bytes": payload["bytes"],
            "caption": payload["caption"],
            "w": payload["w"],
            "h": payload["h"],
            "fmt": payload["fmt"],
            "phash": payload["phash"],
            "links": payload["links"],
            "content_type": payload["content_type"],
            "response_time": pa.array((req_uh % np.uint64(20) + np.uint64(5)).astype(np.int64)),
            "fetched_at": pa.array(np.where(hit, self.now + t0 // 1_000_000, -1)),
            "ua": ua_col,
            "cookies_sent": ck_col,
            "error": err_col,
            "user_data": batch["user_data"],
            "attempt": batch["attempt"],
            "seq": batch["seq"],
            "round": pa.array(np.full(n, self.round_no, np.int32)),
            "doc_id": payload["doc_id"],
            "base_href": payload["base_href"],
            "storable": pa.array(np.ones(n, bool)),
        }
        arrays = []
        for f in schema:
            col = cols[f.name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if col.type != f.type:
                col = col.cast(f.type)
            arrays.append(col)
        t = pa.Table.from_arrays(arrays, schema=schema)
        if not keep.all():
            t = _drop_rows_sliced(t, keep)
        if self._mark_stored and self.pool is not None and t.num_rows:
            # fused mark-stored (only when no before_save hooks can
            # flip storable): one RPC batch per fetch group.  In pool
            # rounds the refs are collected and awaited at the round
            # barrier (mark_stored_async) instead of blocking here —
            # 32 actors' synchronous marks queue on the shard actors
            # and the wait lands in every actor's critical path.
            args = (
                np.asarray(t["url_hash"].to_numpy(), dtype=np.int64).view(np.uint64),
                np.asarray(t["host_hash"].to_numpy(), dtype=np.int64).view(np.uint64),
                t["fetched_at"].to_numpy(zero_copy_only=False),
            )
            _ms = time.perf_counter()
            if self._round_mark_refs is not None and hasattr(self.pool, "mark_stored_async"):
                self._round_mark_refs.extend(self.pool.mark_stored_async(*args))
            else:
                self.pool.mark_stored(*args)
            self._mark_submit_t += time.perf_counter() - _ms
        return t

    # -- persistent-pool round method (fetch_mode='pool') ------------------
    def run_round_batch(self, batch: pa.Table, round_no: int, now: int, out_path: str, spill_path: str | None = None, actor_id: int = 0, select_mine: bool = False) -> dict:
        """One actor's share of a round: prefilter+fetch (__call__),
        before_save hooks, storable filter, mark-stored, except-drop,
        parquet write, fused link extraction.  Returns counts + the
        narrow candidate table (policy-prefiltered).  Reuses the exact
        same stage callables as the Dataset path.

        ``select_mine``: ``batch`` is the round's WHOLE frontier — a
        shared plasma table or a LIST of plasma part refs (plasma
        frontier mode); filter to the rows whose bucket the LUT
        assigns to this actor.  Parts arrive oldest-first and the
        filter preserves row order — identical rows/order to the old
        driver-side stable-sort + take scatter (parity suite)."""
        from ..frontier.stages import PAGE_NARROW, filter_storable, make_link_extractor, make_mark_stored

        # profiling aid: POLIPUS_CPROFILE=<dir> dumps one pstats file
        # per (actor, round) so per-phase timers can be attributed to
        # actual callees (the in-actor view a driver profiler can't see)
        prof_dir = os.environ.pop("POLIPUS_CPROFILE", None)
        if prof_dir:
            import cProfile

            pr = cProfile.Profile()
            pr.enable()
            try:
                return self.run_round_batch(batch, round_no, now, out_path, spill_path, actor_id, select_mine)
            finally:
                pr.disable()
                os.makedirs(prof_dir, exist_ok=True)
                pr.dump_stats(os.path.join(prof_dir, f"actor{actor_id}-r{round_no}.pstats"))
                os.environ["POLIPUS_CPROFILE"] = prof_dir

        self.round_no = round_no
        self.now = now
        tm: dict[str, float] = {}
        _share_t0 = time.perf_counter()
        self._round_mark_refs = []
        self._mark_submit_t = 0.0
        nrows = None
        if select_mine:
            if self._bucket_lut is None:
                raise RuntimeError("select_mine requires set_bucket_lut() first")
            _sel_t0 = time.perf_counter()
            if isinstance(batch, list):
                import ray

                tables = ray.get(batch)  # zero-copy plasma reads
                if not tables:  # defensive: empty part list (ADVICE r3)
                    self._round_mark_refs = None
                    return {"stored": 0, "errors": 0, "cand": None, "cand_keys": None, "spill": None, "keys": None, "deferred": None, "unstorable": None, "path": None, "timings": tm, "deduped": True, "nrows": 0}
                batch = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
            mine = self._bucket_lut[batch["host_bucket"].to_numpy().astype(np.int64)] == actor_id
            batch = batch.filter(pa.array(mine))
            tm["select"] = time.perf_counter() - _sel_t0
            nrows = batch.num_rows
            if batch.num_rows == 0:
                self._round_mark_refs = None
                return {"stored": 0, "errors": 0, "cand": None, "cand_keys": None, "spill": None, "keys": None, "deferred": None, "unstorable": None, "path": None, "timings": tm, "deduped": True, "nrows": 0}
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
        tm["fetch"] = tm["verify"] = 0.0
        # fetch/verify/extract PIPELINE: payload verification (pure
        # numpy GEMM/gathers) and link extraction (Arrow/RE2 kernels +
        # batched md5 — page-LOCAL, so per-group output rows are
        # byte-identical to a whole-share pass) both run on a single
        # worker thread while the main thread fetches group k+1.
        # Results resolve in order; tm["verify"] records only the
        # end-of-loop join wait.  Per-group extraction runs BEFORE the
        # share-level duplicate-final drop, so candidates whose parent
        # lost that dedup are removed afterwards by parent_seq — the
        # winner's rows are byte-duplicates at lower parent_seq, so the
        # surviving table equals extract-after-dedup exactly.  Gated
        # off when before_save hooks exist (they can flip storable
        # before extraction sees the page).
        pipeline_extract = not self._before_save_hooks
        if pipeline_extract and self._extractor is None:
            self._extractor = make_link_extractor(self.cfg, self._focus_crawl, self.num_buckets, robots_bodies=self._robots_bodies)
        vex = None
        # Verify/extract run INLINE with the fetch loop by default.
        # The worker-thread pipeline (POLIPUS_PIPELINE=1) overlaps
        # verify/extract of group k with the fetch of group k+1, but
        # each actor owns ONE core: with W = cores (the deployment
        # shape — every cluster node saturated) the second thread
        # only adds GIL hand-offs and oversubscription.  Interleaved
        # A/B on the same pre-built world, 32 CPUs: 2.4M pages inline
        # 14.9-18.7 s vs pipelined 19.3-25.3 s; 7.2M inline 50.7/52.9 s
        # vs pipelined 51.7/53.8 s — inline never lost.  The pipeline
        # stays available for actors granted >1 CPU.  Output is
        # byte-identical either way (same _verify_extract per group,
        # results consumed in submission order; parity suite pins it).
        inline = not os.environ.get("POLIPUS_PIPELINE")
        if (self.cfg.verify_payload or pipeline_extract) and not inline:
            vex = self._verify_ex
            if vex is None:
                from concurrent.futures import ThreadPoolExecutor

                vex = self._verify_ex = ThreadPoolExecutor(max_workers=1, thread_name_prefix="verify")

        def _verify_extract(p: pa.Table):
            t0 = time.perf_counter()
            if self.cfg.verify_payload and p.num_rows:
                p = self._verify_payloads(p)
            t1 = time.perf_counter()
            c = self._extractor(p.select(PAGE_NARROW)) if (pipeline_extract and p.num_rows) else None
            return p, c, t1 - t0, time.perf_counter() - t1

        futs: list = []
        for off in range(0, max(batch.num_rows, 1), B):
            sub = batch.slice(off, B)
            s = time.perf_counter()
            p = self(sub)
            tm["fetch"] += time.perf_counter() - s
            if vex is not None and p.num_rows:
                futs.append(vex.submit(_verify_extract, p))
            elif inline and (self.cfg.verify_payload or pipeline_extract) and p.num_rows:
                futs.append(_verify_extract(p))
            else:
                futs.append((p, None, 0.0, 0.0))
        s = time.perf_counter()
        res_parts = [f.result() if hasattr(f, "result") else f for f in futs]
        tm["verify"] = time.perf_counter() - s
        parts = [r[0] for r in res_parts]
        cand_parts = [r[1] for r in res_parts if r[1] is not None and r[1].num_rows]
        tm["verify_work"] = sum(r[2] for r in res_parts)
        tm["extract_work"] = sum(r[3] for r in res_parts)
        s = time.perf_counter()
        # ZERO-COPY concat: keep per-group chunks.  combine_chunks here
        # memcpy'd the whole share (payload bytes included) — ~5 s/actor
        # on the first 2M-row round, where every actor first-touches
        # fresh pages at once and the kernel's zero-fill serializes on
        # memory bandwidth.  Downstream consumers (parquet write, narrow
        # extract select, keys select) all handle chunked columns.
        pages = parts[0] if len(parts) == 1 else pa.concat_tables(parts)
        tm["concat"] = time.perf_counter() - s
        _mark_t0 = time.perf_counter()
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
        if self.cfg.storage_except:
            pages = pages.drop_columns([c for c in self.cfg.storage_except if c in pages.column_names])
        if unstorable is not None:
            drop = set(self.cfg.storage_except or ()) | {"bytes"}
            unstorable = unstorable.drop_columns([c for c in drop if c in unstorable.column_names])
        tm["mark_hooks"] = time.perf_counter() - _mark_t0
        # within-round uuid dedup, min-seq wins (reference FIFO
        # page_exists? serialization, polipus.rb:209-213): done
        # IN-ACTOR because duplicate finals are always same-host
        # (cross-host redirects stop the chain) and a host lives on
        # exactly one actor — per-actor dedup IS the global dedup, so
        # the driver skips its _dedup_round_output pass (`deduped`
        # flag).  Losers are dropped BEFORE extract: their links are
        # byte-duplicates of the winner's and the winner's lower
        # parent_seq wins first-occurrence admission either way
        # (parity suite pins this).
        loser_seqs = None
        if pages.num_rows:
            _du0 = time.perf_counter()
            huh = pages["url_hash"].to_numpy()
            sq = pages["seq"].to_numpy()
            tm["mark_tonp"] = time.perf_counter() - _du0
            _du1 = time.perf_counter()
            uniq_h, inv, cnt = np.unique(huh, return_inverse=True, return_counts=True)
            tm["mark_uniq"] = time.perf_counter() - _du1
            if (cnt > 1).any():
                best = np.full(len(uniq_h), np.iinfo(np.int64).max, dtype=np.int64)
                np.minimum.at(best, inv, sq)
                is_dup = cnt[inv] > 1
                loser = is_dup & (sq != best[inv])
                if loser.any():
                    # losers may have overwritten the winners' manifest
                    # entry via the fused mark-stored — re-assert
                    winner = is_dup & (sq == best[inv])
                    if self.cfg.storage != "devnull" and self.pool is not None:
                        args = (
                            huh[winner].astype(np.int64).view(np.uint64),
                            pages["host_hash"].to_numpy()[winner].astype(np.int64).view(np.uint64),
                            pages["fetched_at"].to_numpy()[winner],
                        )
                        # submitted after this actor's fused marks →
                        # lands after them on each shard (per-caller
                        # actor-task ordering), so the winner's entry
                        # is the final one either way
                        if self._round_mark_refs is not None and hasattr(self.pool, "mark_stored_async"):
                            self._round_mark_refs.extend(self.pool.mark_stored_async(*args))
                        else:
                            self.pool.mark_stored(*args)
                    loser_seqs = sq[loser]
                    _df = time.perf_counter()
                    pages = _drop_rows_sliced(pages, ~loser)
                    tm["mark_filter"] = time.perf_counter() - _df
        stored = pages.num_rows
        errors = pages.num_rows - pages["error"].null_count if stored else 0
        tm["mark"] = time.perf_counter() - _mark_t0
        # parquet write OVERLAPPED with link extraction: zstd
        # compression releases the GIL, and extraction only reads the
        # (immutable) pages table, so a writer thread runs the sink
        # while this thread extracts.  Joined before returning — the
        # round barrier still guarantees the part file is durable.
        _w_t0 = time.perf_counter()
        _w_exc: list[BaseException] = []
        _w_thread = None
        if stored and os.environ.get("POLIPUS_NO_WRITE_THREAD"):
            pq.write_table(pages, out_path, compression="zstd")
        elif stored:
            import threading

            def _write():
                try:
                    pq.write_table(pages, out_path, compression="zstd")
                except BaseException as e:  # re-raised at join
                    _w_exc.append(e)

            _w_thread = threading.Thread(target=_write, daemon=True)
            _w_thread.start()
        # the narrow dedup keys are NOT shipped: this method always
        # applies the within-round dedup in-actor (deduped=True), so
        # the driver's _dedup_round_output — the only consumer of
        # result["keys"] — is skipped every pool round.  Shipping them
        # cost ~2 MB/actor/round of result serialization for nothing.
        keys = None
        if self._extractor is None:
            self._extractor = make_link_extractor(self.cfg, self._focus_crawl, self.num_buckets, robots_bodies=self._robots_bodies)
        s = time.perf_counter()
        if pipeline_extract:
            # candidates were extracted per group in the pipeline;
            # stitch them (zero-copy) and drop rows whose parent lost
            # the duplicate-final dedup — byte-identical to extracting
            # from the deduped share (winner rows are the same bytes
            # at lower parent_seq)
            if cand_parts:
                cand = cand_parts[0] if len(cand_parts) == 1 else pa.concat_tables(cand_parts)
                if loser_seqs is not None and loser_seqs.size and cand.num_rows:
                    keep_c = ~np.isin(cand["parent_seq"].to_numpy(), loser_seqs)
                    if not keep_c.all():
                        cand = _drop_rows_sliced(cand, keep_c)
            else:
                cand = self._extractor(pages.select(PAGE_NARROW).slice(0, 0)) if stored else None
        else:
            cand = self._extractor(pages.select(PAGE_NARROW)) if stored else None
        tm["extract"] = time.perf_counter() - s
        spill = None
        cand_keys = None
        bucket_rows = None
        if spill_path is not None and self.cfg.deterministic_order and cand is not None and cand.num_rows:
            # deterministic scale path: candidates sorted locally and
            # STAY in the actor.  Default (r5): the narrow keys go to
            # PLASMA pre-split by seen shard — the driver sees only
            # refs, the shards probe their slices, and emit_frontier()
            # gets admitted indices + seqs.  Fallback (TTL / comp
            # overflow / det_driver_admit): the 28 B/row key table
            # ships to the driver for the legacy global merge.  Both
            # byte-identical to driver streaming.
            s = time.perf_counter()
            # sort + dedup in INDEX space so the wide candidate table
            # (url/referer strings) is gathered exactly once
            order = np.lexsort((cand["link_idx"].to_numpy(), cand["parent_seq"].to_numpy()))
            ps = cand["parent_seq"].to_numpy()[order]
            li = cand["link_idx"].to_numpy()[order]
            # precompute the driver's composite FIFO key (parent_seq <<
            # 16 | link_idx) actor-side — the driver then merges W
            # presorted spans instead of rebuilding + sorting the key
            comp = None
            if len(ps) and int(ps.max()) < (1 << 47) and int(li.max()) < (1 << 16) and int(ps.min()) >= 0:
                comp = (ps.astype(np.int64) << 16) | li.astype(np.int64)
            if self.cfg.ttl_page is None:
                # intra-actor first-occurrence dedup: with TTL off the
                # admission rule is admit = ~seen(sequential), so only
                # a url_hash's FIRST occurrence (min composite — the
                # order is comp-sorted) can ever admit; later same-actor
                # occurrences are provably rejected.  Dropping them
                # here cuts the driver's key volume ~3x.  (With TTL on,
                # an expired page re-admits EVERY occurrence — keep
                # all rows then.)  check_and_add filter state is
                # unchanged: the kept first occurrence inserts the
                # hash either way.
                uh_a = cand["url_hash"].to_numpy()[order]
                uniq_h, first_idx = np.unique(uh_a, return_index=True)
                if len(uniq_h) < len(uh_a):
                    keep_idx = np.sort(first_idx)
                    order = order[keep_idx]
                    if comp is not None:
                        comp = comp[keep_idx]
            cand = cand.take(pa.array(order))
            self._pending_cand = cand
            self._pending_spill_path = spill_path
            if (
                comp is not None
                and self.cfg.ttl_page is None
                and self.pool is not None
                and getattr(self.pool, "use_ray", False)
                and not getattr(self.cfg, "det_driver_admit", False)  # A/B + ops fallback
                and not os.environ.get("POLIPUS_DET_DRIVER_ADMIT")
            ):
                # distributed admission (r5): the narrow keys go to
                # PLASMA pre-split by seen shard, never through the
                # driver — each shard fetches its slice, probes it in
                # comp order, and returns only the admitted (comp,
                # oloc) triples.  ``oloc`` is the row's position in the
                # comp-sorted pending table (what emit_frontier takes).
                import ray

                hh_k = cand["host_hash"].to_numpy()
                hh_u = hh_k.view(np.uint64) if hh_k.dtype == np.int64 else hh_k.astype(np.uint64)
                uh_k = cand["url_hash"].to_numpy()
                uh_u = uh_k.view(np.uint64) if uh_k.dtype == np.int64 else uh_k.astype(np.uint64)
                S = self.pool.num_shards
                sid = (hh_u % np.uint64(S)).astype(np.int64)
                sorder = np.argsort(sid, kind="stable")  # keeps comp order within shard
                bounds = np.searchsorted(sid[sorder], np.arange(S + 1))
                cand_key_refs = {}
                for sh in range(S):
                    lo, hi = bounds[sh], bounds[sh + 1]
                    if lo == hi:
                        continue
                    idx = sorder[lo:hi]
                    cand_key_refs[sh] = ray.put(
                        {
                            "comp": np.ascontiguousarray(comp[idx]),
                            "uh": np.ascontiguousarray(uh_u[idx]),
                            "hh": np.ascontiguousarray(hh_u[idx]),
                            "oloc": np.ascontiguousarray(idx.astype(np.int64)),
                        }
                    )
                cand_keys = {"refs": cand_key_refs, "n": cand.num_rows}
            else:
                # driver-merge fallback (TTL recrawl semantics need
                # expired-occurrence handling; comp overflow needs the
                # driver's lexsort): ship the 28 B/row key table
                cand_keys = cand.select(["url_hash", "host_hash", "parent_seq", "link_idx"])
                if comp is not None:
                    cand_keys = cand_keys.append_column("comp", pa.array(comp, pa.int64()))
            cand = None
            tm["keys"] = time.perf_counter() - s
        elif spill_path is not None and not self.cfg.deterministic_order and self.pool is not None and cand is not None and cand.num_rows:
            # relaxed-order scale path: admit + spill in-actor.  Local
            # FIFO sort -> shard check_and_add -> composite seq
            # (round, actor, idx): per-round depth order preserved,
            # intra-round total order approximate.
            s = time.perf_counter()
            # FIFO order + admission in INDEX space: the wide candidate
            # table (url/referer strings) is gathered exactly once, with
            # only the admitted rows — a take-all + post-admit filter
            # measured 6.8 s/actor mean at the 7.2M bench (admit_sort)
            order = np.lexsort((cand["link_idx"].to_numpy(), cand["parent_seq"].to_numpy()))
            uh_s = cand["url_hash"].to_numpy().astype(np.uint64, copy=False)[order]
            hh_s = cand["host_hash"].to_numpy().astype(np.uint64, copy=False)[order]
            from ..frontier.stages import tracker_admit_mask

            tm["admit_sort"] = time.perf_counter() - s
            _t1 = time.perf_counter()
            mask = tracker_admit_mask(uh_s, hh_s, self.pool, self.cfg, now)
            sel = order[mask]
            cand = cand.take(pa.array(sel))
            _t1 = time.perf_counter()
            tm["admit_probe"] = _t1 - s - tm["admit_sort"]
            n = cand.num_rows
            if n:
                # next-round load histogram for the driver's bucket
                # rebalancer (256 x int64 — tiny)
                bucket_rows = np.bincount(
                    cand["host_bucket"].to_numpy().astype(np.int64), minlength=self.num_buckets
                )
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
                # boundary spread across the pool.  The chunk size IS
                # the per-actor load granularity under the cap (a
                # chunk's rows are same-host → one owner actor):
                # 16384-row chunks measured 4-vs-3-chunk shares (33%
                # rows-skew) at the 2M slice; 4096 plasma chunks cut
                # that to ~6%.  Parquet chunks stay 16384 to bound the
                # checkpoint-mode file count.
                CH = int(os.environ.get("GRAFT_SPILL_CHUNK", "4096")) if self._plasma_spill else 16384
                spill = []
                hb_all = cand["host_bucket"].to_numpy().astype(np.int64)
                for off in range(0, n, CH):
                    chunk = ft.slice(off, CH)
                    # per-chunk bucket histogram: lets the engine sum
                    # the EXACT per-bucket load of whatever slice of
                    # parts a future round activates and prebalance
                    # the LUT against it (est. full-frontier histos
                    # mispredict capped slices)
                    hist = np.bincount(hb_all[off : off + CH], minlength=self.num_buckets)
                    if self._plasma_spill:
                        import ray

                        spill.append({"ref": ray.put(chunk.combine_chunks()), "rows": chunk.num_rows, "hist": hist})
                    else:
                        cp = spill_path if off == 0 else spill_path.replace(".parquet", f"-{off // CH}.parquet")
                        pq.write_table(chunk, cp, compression="lz4")
                        spill.append({"path": cp, "rows": chunk.num_rows, "hist": hist})
                tm["admit_put"] = time.perf_counter() - _t1
            cand = None
            tm["admit_spill"] = time.perf_counter() - s
        if _w_thread is not None:
            s = time.perf_counter()
            _w_thread.join()
            if _w_exc:
                raise _w_exc[0]
            tm["write_join"] = time.perf_counter() - s
        tm["write"] = time.perf_counter() - _w_t0  # overlapped span (start -> join)
        tm["mark_submit"] = self._mark_submit_t
        tm["share_total"] = time.perf_counter() - _share_t0
        mark_refs, self._round_mark_refs = self._round_mark_refs, None
        return {
            "stored": stored,
            "errors": errors,
            "cand": cand,
            "cand_keys": cand_keys,
            "spill": spill,
            "keys": keys,
            "deferred": deferred,
            "unstorable": unstorable,
            "bucket_rows": bucket_rows,
            "path": out_path if stored else None,
            "timings": tm,
            "deduped": True,  # within-round uuid dedup already applied
            "nrows": nrows,  # this actor's selected frontier rows (select_mine)
            "mark_refs": mark_refs or None,
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
        CH = int(os.environ.get("GRAFT_SPILL_CHUNK", "4096")) if self._plasma_spill else 16384  # see run_round_batch
        hb_all = sub["host_bucket"].to_numpy().astype(np.int64)
        for off in range(0, n, CH):
            chunk = ft.slice(off, CH)
            hist = np.bincount(hb_all[off : off + CH], minlength=self.num_buckets)
            if self._plasma_spill:
                import ray

                out.append({"ref": ray.put(chunk.combine_chunks()), "rows": chunk.num_rows, "hist": hist})
            else:
                cp = spill_path if off == 0 else spill_path.replace(".parquet", f"-{off // CH}.parquet")
                pq.write_table(chunk, cp, compression="lz4")
                out.append({"path": cp, "rows": chunk.num_rows, "hist": hist})
        return out

    def _verify_payloads(self, pages: pa.Table) -> pa.Table:
        """Decode each image payload and verify the stored perceptual
        hash (per-row decoded-pixel invariant, SURVEY.md M15).  With
        ``phash_scales > 1`` also fingerprints downsampled scales (a
        multi-scale fingerprint pyramid).

        Fully vectorized: the codec's layout is a fixed 12-byte header
        + raw h*w*3 pixels, so decode is ONE fancy-index gather per
        shape group straight out of the Arrow binary column's data
        buffer (no per-row ``decode_image`` call, no np.stack of N tiny
        arrays), then batched-GEMM hashing (bit-identical to the scalar
        ``phash64``; pinned by test_synth / the PSNR test)."""
        import pyarrow.compute as pc

        from ..synth.images import _HDR, _MAGIC, gray_batch, phash64_from_gray

        scales = max(1, int(self.cfg.phash_scales))
        n = pages.num_rows
        ok = np.zeros(n, dtype=bool)
        col = pages["bytes"].combine_chunks()
        if n == 0:
            return pages.append_column("payload_ok", pa.array(ok, pa.bool_()))
        off0 = col.offset
        odt = np.int64 if pa.types.is_large_binary(col.type) else np.int32
        offs = np.frombuffer(col.buffers()[1], dtype=odt)[off0 : off0 + n + 1].astype(np.int64)
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        starts = offs[:-1]
        lens = offs[1:] - starts
        valid = np.ones(n, bool) if col.null_count == 0 else pc.is_valid(col).to_numpy(zero_copy_only=False)
        cand = np.nonzero(valid & (lens >= _HDR))[0]
        if cand.size == 0:
            return pages.append_column("payload_ok", pa.array(ok, pa.bool_()))
        hdr = data[starts[cand, None] + np.arange(_HDR)]
        magic = np.frombuffer(_MAGIC, dtype=np.uint8)
        hw = hdr[:, 8].astype(np.int64) | (hdr[:, 9].astype(np.int64) << 8)
        hh = hdr[:, 10].astype(np.int64) | (hdr[:, 11].astype(np.int64) << 8)
        good = (
            (hdr[:, :4] == magic).all(axis=1)  # decode_image's magic check
            & (lens[cand] >= _HDR + hh * hw * 3)  # frombuffer(count=...) would raise
            & (hh > 0)
            & (hw > 0)
        )
        cand, hw, hh = cand[good], hw[good], hh[good]
        want_none = pc.is_null(pages["phash"]).combine_chunks().to_numpy(zero_copy_only=False)
        want_u64 = pc.fill_null(pages["phash"], 0).combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        # chunked: the float64 DCT pyramid of a whole 60k-row round
        # would peak ~2 GB per actor (x W actors = memory-pressure
        # stalls).  512 keeps the chunk's gray stack + gathers ~3 MB —
        # cache-resident under full-box concurrency: measured 2.3x
        # faster than 2048-image chunks at 30 parallel workers (and
        # only ~13% slower at 30-way than at 8-way, vs DRAM-bound
        # streaming at larger chunks — directly lifts 8->32 scaling)
        CHUNK = int(os.environ.get("POLIPUS_VERIFY_CHUNK", "512"))
        for key in np.unique((hh << 16) | hw):
            h, w = int(key >> 16), int(key & 0xFFFF)
            m = h * w * 3
            sel = cand[((hh << 16) | hw) == key]
            body = np.arange(m) + _HDR
            for off in range(0, sel.size, CHUNK):
                s2 = sel[off : off + CHUNK]
                px = data[starts[s2, None] + body].reshape(-1, h, w, 3)
                # luma ONCE per chunk; every pyramid level subsamples
                # the same gray stack (selecting gray pixels commutes
                # with per-pixel luma, so each level is bit-identical
                # to hashing the subsampled uint8 image)
                gray = gray_batch(px)
                got = phash64_from_gray(gray)
                for s in range(1, scales):
                    side = max(4, 32 >> s)
                    yi = (np.arange(side) * h // side).astype(np.int64)
                    xi = (np.arange(side) * w // side).astype(np.int64)
                    # pyramid levels (fingerprint work): composed
                    # subsample indices — gathers compose, so the
                    # intermediate (N, side, side) copy is skipped
                    y2 = yi[(np.arange(32) * side // 32).astype(np.int64)]
                    x2 = xi[(np.arange(32) * side // 32).astype(np.int64)]
                    phash64_from_gray(gray, rows=y2, cols=x2)
                ok[s2] = want_none[s2] | (got == want_u64[s2])
        return pages.append_column("payload_ok", pa.array(ok, pa.bool_()))

    def preload(self, buckets: list[int]) -> int:
        """Warm this actor: load its web buckets (pool warm-up)."""
        for b in buckets:
            self._load_bucket(b)
        return len(self._buckets)

    def node_id(self) -> str:
        """This actor's Ray node id (multi-node locality telemetry)."""
        import ray

        return ray.get_runtime_context().get_node_id()

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
