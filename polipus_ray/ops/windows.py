"""Windowed aggregates over the ``events`` table.

The reference engine has no event-time operators (polipus is a crawl
loop); these are part of the training-data extension suite the brief
asks for ("windowed aggregate, a streaming window" as custom-operator
classes).  All three are expressed Ray-Data-first:

- ``tumbling_window``: fixed-size event-time windows.  The per-batch
  ``map_batches`` pass PRE-AGGREGATES (window, event_type) partials —
  dictionary-encoded type codes + one composite ``np.bincount`` — so
  the ``groupby`` shuffle carries O(windows x types) rows per block,
  never the events.  Value sums are carried as integer CENTS
  (``round(value*100)``), so the result is order-independent and
  bit-exact vs the SQL oracle (float sums would drift with
  reduction order).

- ``session_windows``: gap-based sessionization.  Hash-bucket by
  ``user_id`` into a BOUNDED number of groups (``_bucket_tag`` — not
  one Ray group per user; the user count is unbounded at corpus
  scale), then a fully vectorized multi-user pass per bucket (lexsort
  -> diff -> boundary flags).  Scale note: a session split is
  inherently serial per key, so one pathological user concentrates
  one bucket's work — the same skew class as a hot host in the crawl;
  bound it upstream with a per-user event cap or pre-split by
  (user_id, coarse time) when a key can exceed a block.

- ``event_type_stats``: distinct-count aggregate (users per type).
  Two narrow shuffles: batch-level distinct (event_type, user_id)
  partials collapse duplicates map-side, a pair-level groupby merges
  them, and a second tiny groupby counts pairs per type — the
  classic two-level exact-distinct plan; swap level 1 for an HLL
  sketch when approximate counts suffice at 100 TB.

Timestamps travel as int64 MICROSECONDS (Arrow ``timestamp[us]``
cast), matching DuckDB's ``epoch_us`` in the oracles.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _events_read(sf_dir: str, columns: list[str]):
    import ray.data

    from polipus_ray.ops.dedup import small_read_blocks

    path = f"{sf_dir}/events.parquet"
    return ray.data.read_parquet(path, columns=columns, override_num_blocks=small_read_blocks(path))


def _ts_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    return col.cast(pa.int64()).to_numpy() if hasattr(col, "cast") else np.asarray(col, dtype=np.int64)


_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier


def _bucket_tag(ds, int_col: str, nb: int):
    """Append a bounded hash-bucket column ``pk`` derived from
    ``int_col`` — the shuffle key for the grouped reductions below.
    NOT ``groupby(<the real keys>)``: Ray pays per-group overhead, and
    the real key sets here (user ids, (window, type) pairs) are
    unbounded at corpus scale; ``nb`` hash buckets keep the group
    count fixed while the per-bucket reduction stays one vectorized
    pass."""

    def tag(batch: pa.Table) -> pa.Table:
        v = batch[int_col].to_numpy().astype(np.int64, copy=False)
        pk = ((v.view(np.uint64) * _MIX) >> np.uint64(17)) % np.uint64(nb)
        return batch.append_column("pk", pa.array(pk.astype(np.int32), pa.int32()))

    return ds.map_batches(tag, batch_format="pyarrow").groupby("pk")


def _bucketed_sum(ds, int_col: str, str_col: str, sum_cols: list[str]):
    """Exact integer sums per (int_col, str_col) group through a
    BOUNDED bucket shuffle: rows hash-bucket on ``int_col`` (every row
    of one group lands in one bucket), and each bucket folds its
    groups with one lexsort + ``np.add.reduceat`` — no per-group Ray
    aggregate, no per-group Python call."""
    from polipus_ray.ops.dedup import join_partitions

    def agg(group: pa.Table) -> pa.Table:
        iv = group[int_col].to_numpy()
        enc = pc.dictionary_encode(group[str_col].combine_chunks())
        codes = enc.indices.to_numpy().astype(np.int64)
        order = np.lexsort((codes, iv))
        iv_s, c_s = iv[order], codes[order]
        new = np.ones(len(iv_s), dtype=bool)
        new[1:] = (iv_s[1:] != iv_s[:-1]) | (c_s[1:] != c_s[:-1])
        starts = np.flatnonzero(new)
        cols: dict[str, pa.Array] = {
            int_col: pa.array(iv_s[starts], pa.int64()),
            str_col: enc.dictionary.take(pa.array(c_s[starts])),
        }
        for sc in sum_cols:
            v = group[sc].to_numpy().astype(np.int64)[order]
            cols[sc] = pa.array(np.add.reduceat(v, starts), pa.int64())
        return pa.table(cols)

    return _bucket_tag(ds, int_col, join_partitions(None)).map_groups(agg, batch_format="pyarrow")


def tumbling_window(sf_dir: str, window_s: int = 3600):
    """Count + exact value sum per (tumbling window, event_type)."""
    import ray.data  # noqa: F401

    win_us = int(window_s) * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch["ts"])
        win = (ts // win_us) * win_us
        cents = np.round(batch["value"].to_numpy() * 100.0).astype(np.int64)
        enc = pc.dictionary_encode(batch["event_type"].combine_chunks())
        codes = enc.indices.to_numpy().astype(np.int64)
        types = enc.dictionary.to_pylist()
        # composite (window, type) key -> one bincount per statistic
        wu, winv = np.unique(win, return_inverse=True)
        comp = winv * len(types) + codes
        size = len(wu) * len(types)
        n = np.bincount(comp, minlength=size)
        s = np.bincount(comp, weights=cents.astype(np.float64), minlength=size)
        nz = np.flatnonzero(n)
        return pa.table(
            {
                "win_us": pa.array(wu[nz // len(types)], pa.int64()),
                "event_type": pa.array([types[i] for i in (nz % len(types))], pa.string()),
                "n_events": pa.array(n[nz], pa.int64()),
                # cents < 2^53 per partial: float64 bincount is exact
                "sum_value_cents": pa.array(s[nz].astype(np.int64), pa.int64()),
            }
        )

    # bounded-bucket merge of the partials: the (window, type) group
    # count is unbounded at corpus scale, so the shuffle keys on a
    # fixed bucket count and each bucket folds its groups vectorized
    ds = _events_read(sf_dir, ["ts", "event_type", "value"])
    partials = ds.map_batches(partial, batch_format="pyarrow")
    return _bucketed_sum(partials, "win_us", "event_type", ["n_events", "sum_value_cents"]).sort(
        ["win_us", "event_type"]
    )


def hopping_window(sf_dir: str, window_s: int = 3600, hop_s: int = 900):
    """Hopping (sliding) windows: each event lands in
    ``window_s / hop_s`` overlapping windows.  Same map-side partial
    pattern as ``tumbling_window`` with the event replicated across
    its k hop offsets INSIDE the batch kernel (a tiled bincount, not a
    row explode), so the shuffle still carries only (window, type)
    partial rows — amplification k shows up as k-fold more partial
    keys, never as k-fold event rows."""
    import ray.data  # noqa: F401

    win_us = int(window_s) * 1_000_000
    hop_us = int(hop_s) * 1_000_000
    if win_us % hop_us:
        raise ValueError("window_s must be a multiple of hop_s")
    k = win_us // hop_us

    def partial(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch["ts"])
        enc = pc.dictionary_encode(batch["event_type"].combine_chunks())
        codes = enc.indices.to_numpy().astype(np.int64)
        types = enc.dictionary.to_pylist()
        # window starts containing ts: last hop-aligned start <= ts,
        # going back k hops (clipped below 0 like the SQL oracle)
        base = (ts // hop_us) * hop_us
        starts = base[None, :] - (np.arange(k, dtype=np.int64) * hop_us)[:, None]  # (k, n)
        valid = starts >= 0
        wu, winv = np.unique(starts[valid], return_inverse=True)
        comp = winv * len(types) + np.broadcast_to(codes, (k, len(codes)))[valid]
        n = np.bincount(comp, minlength=len(wu) * len(types))
        nz = np.flatnonzero(n)
        return pa.table(
            {
                "win_us": pa.array(wu[nz // len(types)], pa.int64()),
                "event_type": pa.array([types[i] for i in (nz % len(types))], pa.string()),
                "n_events": pa.array(n[nz], pa.int64()),
            }
        )

    ds = _events_read(sf_dir, ["ts", "event_type"])
    partials = ds.map_batches(partial, batch_format="pyarrow")
    return _bucketed_sum(partials, "win_us", "event_type", ["n_events"]).sort(["win_us", "event_type"])


def top_users_per_type(sf_dir: str, k: int = 3):
    """Top-k users by event count per event_type (ties broken by
    ascending user_id).  The (type, user) count is a narrow two-level
    aggregate (map-side pair partials, then Sum); the per-type top-k
    is a map_groups over the already-collapsed pair rows — the
    bounded-output pattern (shuffle carries distinct pairs, output
    carries k rows per type)."""
    import ray.data  # noqa: F401

    def pair_partial(batch: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(batch["event_type"].combine_chunks())
        codes = enc.indices.to_numpy().astype(np.int64)
        types = enc.dictionary.to_pylist()
        uid = batch["user_id"].to_numpy()
        pairs, counts = np.unique(np.stack([codes, uid], axis=1), axis=0, return_counts=True)
        return pa.table(
            {
                "event_type": pa.array([types[c] for c in pairs[:, 0]], pa.string()),
                "user_id": pa.array(pairs[:, 1], pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    def topk(group: pa.Table) -> pa.Table:
        n = group["n"].to_numpy().astype(np.int64)
        uid = group["user_id"].to_numpy()
        order = np.lexsort((uid, -n))[:k]
        return pa.table(
            {
                "event_type": group["event_type"].take(pa.array(order)),
                "user_id": pa.array(uid[order], pa.int64()),
                "n_events": pa.array(n[order], pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            }
        )

    ds = _events_read(sf_dir, ["event_type", "user_id"])
    pair_counts = _bucketed_sum(ds.map_batches(pair_partial, batch_format="pyarrow"), "user_id", "event_type", ["n"])
    # per-type top-k over the collapsed pairs: the group count here is
    # the (small, bounded) type cardinality, so a per-group call is fine
    return pair_counts.groupby("event_type").map_groups(topk, batch_format="pyarrow").sort(["event_type", "rank"])


def session_windows(sf_dir: str, gap_s: int = 14400):
    """Per-user gap sessions: a new session starts when the gap to the
    previous event (event-time order, event_id tie-break) exceeds
    ``gap_s``.  One row per session."""
    import ray.data  # noqa: F401

    gap_us = int(gap_s) * 1_000_000

    def per_user(group: pa.Table) -> pa.Table:
        ts = _ts_us(group["ts"])
        eid = group["event_id"].to_numpy()
        uid = group["user_id"].to_numpy()
        order = np.lexsort((eid, ts, uid))  # map_groups may batch several keys
        ts, uid = ts[order], uid[order]
        new = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new[1:] = (ts[1:] - ts[:-1] > gap_us) | (uid[1:] != uid[:-1])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(ts)) - 1
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "session_start_us": pa.array(ts[starts], pa.int64()),
                "session_end_us": pa.array(ts[ends], pa.int64()),
                "n_events": pa.array((ends - starts + 1).astype(np.int64), pa.int64()),
            }
        )

    from polipus_ray.ops.dedup import join_partitions

    # hash-bucket on user_id rather than groupby(user_id): the user
    # count is unbounded at corpus scale (one Ray group per user), and
    # per_user already splits multiple users inside one group via the
    # (uid, ts) lexsort + uid-change boundaries
    ds = _events_read(sf_dir, ["event_id", "ts", "user_id"])
    grouped = _bucket_tag(ds, "user_id", join_partitions(None))
    return grouped.map_groups(per_user, batch_format="pyarrow").sort(["user_id", "session_start_us"])


_HLL_P = 12
_HLL_M = 1 << _HLL_P  # 4096 registers, ~1.6% std error
_HLL_WBITS = 64 - _HLL_P  # 52-bit rank window
_HLL_MAXRHO = _HLL_WBITS + 1  # 53


def _hll_estimate(regs: np.ndarray) -> int:
    """Standard HLL estimate from a register array, computed so a SQL
    oracle can replay it bit-exactly: the harmonic sum is an exact
    INTEGER (sum of 1 << (53 - M[j]), a python int / SQL HUGEINT), and
    the float tail is one identical expression on both sides."""
    cnt = np.bincount(regs, minlength=_HLL_MAXRHO + 1)
    s_int = sum(int(c) << (_HLL_MAXRHO - r) for r, c in enumerate(cnt) if c)
    v = int(cnt[0])
    alpha_mm = (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
    est = alpha_mm * 9007199254740992.0 / float(s_int)  # * 2^53 / S
    if est <= 10240.0 and v > 0:  # 2.5 * m: linear-counting range
        est = 4096.0 * math.log(4096.0 / v)
    return int(math.floor(est))


def approx_distinct_users(sf_dir: str):
    """HyperLogLog distinct users per event_type — the SKETCH scale
    path beside ``event_type_stats``'s exact two-level distinct: each
    batch reduces to one 4096-byte register row per type, the groupby
    merge is an elementwise max, so the shuffle carries O(types x
    blocks) sketch rows, never the (event_type, user_id) pairs.
    Hashing is the repo's md5-u64 convention (top 8 md5 bytes of the
    decimal user_id string), so DuckDB replays registers AND estimate
    exactly — the estimate is deliberately integer-exact (see
    ``_hll_estimate``), making this approximate op value-hash-checkable
    rather than rows-only."""
    import ray.data  # noqa: F401

    from polipus_ray.ops.md5vec import md5_u64_arrow

    def partial(batch: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(batch["event_type"].combine_chunks())
        codes = enc.indices.to_numpy().astype(np.int64)
        types = enc.dictionary.to_pylist()
        h = md5_u64_arrow(pc.cast(batch["user_id"].combine_chunks(), pa.string()))
        idx = (h >> np.uint64(_HLL_WBITS)).astype(np.int64)
        w = h & np.uint64((1 << _HLL_WBITS) - 1)
        # exact bit length: w < 2^52 is exactly representable in
        # float64, so frexp's exponent IS bit_length (no log2 ulp risk)
        rho = (_HLL_MAXRHO - np.frexp(w.astype(np.float64))[1]).astype(np.uint8)
        regs = np.zeros((len(types), _HLL_M), dtype=np.uint8)
        np.maximum.at(regs, (codes, idx), rho)
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "regs": pa.array([r.tobytes() for r in regs], pa.binary()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        regs = np.maximum.reduce([np.frombuffer(b, dtype=np.uint8) for b in group["regs"].to_pylist()])
        return pa.table(
            {
                "event_type": group["event_type"].slice(0, 1),
                "n_users_est": pa.array([_hll_estimate(regs)], pa.int64()),
            }
        )

    ds = _events_read(sf_dir, ["event_type", "user_id"])
    return ds.map_batches(partial, batch_format="pyarrow").groupby("event_type").map_groups(merge, batch_format="pyarrow").sort("event_type")


def quantiles_by_type(sf_dir: str, qs: tuple = (0.5, 0.9, 0.99), bins: int = 4096, cap: int = 500_000, max_rounds: int = 6):
    """EXACT per-type quantiles of ``value`` (DuckDB ``quantile_cont``
    lerp semantics, ``s[lo]*(1-frac) + s[hi]*frac`` — bit-parity
    fuzz-pinned in tests) via an iterative histogram sieve, never a
    full sort and never an unbounded driver collect.

    Rounds: (1) one map-only pass folds per-type count/min/max;
    (2) while any type's candidate range holds > ``cap`` values, a
    map-only histogram pass counts ``bins`` buckets over each type's
    current [lo, hi] interval (plus the below-lo count, measured fresh
    each round so no cross-round float-boundary bookkeeping), and the
    driver narrows each type's interval to the bins containing the
    needed order statistics; (3) a final gather pulls ONLY the
    candidate bin values (<= cap per type) and reads the exact order
    stats off a local sort.  Work per pass is map-only + a
    bounded-size fold (type count is bounded); driver state is
    O(types x bins) integers.  At 100 TB: passes = O(log_bins(n/cap)),
    2-3 in practice."""
    import ray
    import ray.data

    ds = _events_read(sf_dir, ["event_type", "value"])

    def _pa_typed(arr: np.ndarray) -> pa.Array:
        if arr.dtype == object:
            return pa.array(arr, pa.string())
        if arr.dtype.kind in "iu":
            return pa.array(arr.astype(np.int64), pa.int64())
        return pa.array(arr.astype(np.float64), pa.float64())

    def _per_type(batch: pa.Table, fn):
        types = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        v = batch["value"].to_numpy()
        cols: dict[str, list] = {}
        for t in sorted(set(types)):
            for name, arr in fn(t, v[types == t]).items():
                cols.setdefault(name, []).append(_pa_typed(np.asarray(arr)))
        return pa.table({k: pa.concat_arrays(v_) for k, v_ in cols.items()})



    def cmm(batch: pa.Table) -> pa.Table:
        return _per_type(
            batch,
            lambda t, vv: {
                "event_type": np.array([t], dtype=object),
                "n": np.array([len(vv)], np.int64),
                "mn": np.array([vv.min()], np.float64),
                "mx": np.array([vv.max()], np.float64),
            },
        )

    # tiny fold on the driver: per-type partial rows are O(blocks x types)
    parts = pa.concat_tables(list(ds.map_batches(cmm, batch_format="pyarrow").iter_batches(batch_size=65536, batch_format="pyarrow")))
    types_all = np.asarray(parts["event_type"].to_pylist(), dtype=object)
    state: dict[str, dict] = {}
    for t in sorted(set(types_all)):
        sel = types_all == t
        state[t] = {
            "n": int(parts["n"].to_numpy()[sel].sum()),
            "lo": float(parts["mn"].to_numpy()[sel].min()),
            "hi": float(parts["mx"].to_numpy()[sel].max()),
        }

    # needed 0-indexed order statistics per type
    def ranks_of(n: int) -> np.ndarray:
        rs = set()
        for q in qs:
            r = (n - 1) * q
            rs.add(int(np.floor(r)))
            rs.add(min(int(np.floor(r)) + 1, n - 1))
        return np.array(sorted(rs), np.int64)

    def bin_idx(vv: np.ndarray, lo: float, hi: float) -> np.ndarray:
        if hi <= lo:  # degenerate: all values equal
            return np.zeros(len(vv), np.int64)
        return np.clip(((vv - lo) * (bins / (hi - lo))).astype(np.int64), 0, bins - 1)

    for t in state:
        state[t]["bmin"], state[t]["bmax"] = 0, bins - 1

    for _ in range(max_rounds):
        need = {t: s for t, s in state.items() if s["n"] > cap and s["hi"] > s["lo"]}
        if not need:
            break
        bref = ray.put({t: (s["lo"], s["hi"]) for t, s in need.items()})

        def hist(batch: pa.Table, _bref=bref) -> pa.Table:
            grids = ray.get(_bref)

            def one(t, vv):
                if t not in grids:
                    return {"event_type": np.array([], dtype=object), "bin": np.array([], np.int64), "cnt": np.array([], np.int64)}
                lo, hi = grids[t]
                below = int((vv < lo).sum())
                inr = vv[(vv >= lo) & (vv <= hi)]
                counts = np.bincount(bin_idx(inr, lo, hi), minlength=bins)
                nz = np.flatnonzero(counts)
                b = np.concatenate([[-1], nz]).astype(np.int64)
                c = np.concatenate([[below], counts[nz]]).astype(np.int64)
                return {"event_type": np.full(len(b), t, dtype=object), "bin": b, "cnt": c}

            return _per_type(batch, one)

        hp = pa.concat_tables(list(ds.map_batches(hist, batch_format="pyarrow").iter_batches(batch_size=65536, batch_format="pyarrow")))
        ht = np.asarray(hp["event_type"].to_pylist(), dtype=object)
        hb, hc = hp["bin"].to_numpy(), hp["cnt"].to_numpy()
        for t, s in need.items():
            sel = ht == t
            below = int(hc[sel & (hb == -1)].sum())
            counts = np.zeros(bins, np.int64)
            np.add.at(counts, hb[sel & (hb >= 0)], hc[sel & (hb >= 0)])
            cum = below + np.cumsum(counts)  # cum[b] = #values with bin <= b, plus below
            rs = ranks_of(s["n"])
            # bins containing the needed ranks (rank r is in bin b iff cum[b-1] <= r < cum[b])
            bneed = np.searchsorted(cum, rs, side="right")
            bmin, bmax = int(bneed.min()), int(bneed.max())
            w = (s["hi"] - s["lo"]) / bins
            new_lo, new_hi = s["lo"] + bmin * w, s["lo"] + (bmax + 1) * w
            n_cand = int(counts[bmin : bmax + 1].sum())
            s["gather_grid"] = (s["lo"], s["hi"], bmin, bmax)  # idx-formula gather, no float-edge drift
            s["lo"], s["hi"], s["n_range"] = new_lo, min(new_hi, s["hi"]), n_cand
            if n_cand <= cap:
                s["n"] = 0  # mark done (sieve converged for this type)

    gref = ray.put({t: s.get("gather_grid") for t, s in state.items()})

    def gather(batch: pa.Table, _gref=gref) -> pa.Table:
        grids = ray.get(_gref)

        def one(t, vv):
            g = grids.get(t)
            if g is None:  # small type: every value is a candidate
                keep = vv
                below = 0
            else:
                lo, hi, bmin, bmax = g
                inr = (vv >= lo) & (vv <= hi)
                idx = bin_idx(vv[inr], lo, hi)
                keep = vv[inr][(idx >= bmin) & (idx <= bmax)]
                below = int((vv < lo).sum()) + int((idx < bmin).sum())
            return {
                "event_type": np.full(len(keep) + 1, t, dtype=object),
                "value": np.concatenate([keep, [0.0]]),
                "below": np.concatenate([np.full(len(keep), -1, np.int64), [below]]),
            }

        return _per_type(batch, one)

    gp = pa.concat_tables(list(ds.map_batches(gather, batch_format="pyarrow").iter_batches(batch_size=65536, batch_format="pyarrow")))
    gt = np.asarray(gp["event_type"].to_pylist(), dtype=object)
    gv, gb = gp["value"].to_numpy(), gp["below"].to_numpy()
    # authoritative per-type n from the stage-1 fold (state[t]["n"] was
    # consumed as a convergence flag in the sieve loop)
    n_by_type = {}
    for t in sorted(set(types_all)):
        sel = types_all == t
        n_by_type[t] = int(parts["n"].to_numpy()[sel].sum())
    out_type, rows = [], []
    for t in sorted(n_by_type):
        sel = gt == t
        below = int(gb[sel & (gb >= 0)].sum())
        s = np.sort(gv[sel & (gb == -1)])
        n = n_by_type[t]
        vals = []
        for q in qs:
            r = (n - 1) * q
            lo_i = int(np.floor(r))
            frac = r - lo_i
            a = s[lo_i - below]
            b = s[min(lo_i + 1, n - 1) - below]
            vals.append(a * (1 - frac) + b * frac)  # DuckDB quantile_cont lerp
        out_type.append(t)
        rows.append(vals)
    cols = {"event_type": pa.array(out_type, pa.string())}
    for j, q in enumerate(qs):
        cols[f"p{int(q * 100)}"] = pa.array([r[j] for r in rows], pa.float64())
    return pa.table(cols)


def asof_join(sf_dir: str, left_type: str = "purchase", right_type: str = "view"):
    """Per-user event-time AS-OF join: each ``left_type`` event is
    matched to the latest ``right_type`` event by the same user at or
    before it (inclusive; DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``
    semantics).  Unmatched left events are dropped (inner as-of).
    Output: event_id, user_id, ts_us, match_ts_us, gap_us.

    Scale shape: both sides are pruned to the two event types BEFORE
    the shuffle (map-side filter on the projected read), then moved
    ONCE by user-id hash bucket (_bucket_tag — bounded group count,
    users are unbounded at corpus scale).  Inside a bucket, one
    lexsort by (uid, ts, side) with rights ordered before lefts at
    equal ts + a forward-fill of right-row indices
    (np.maximum.accumulate) resolves every left row's match — the
    filled index is the nearest preceding right row, and a uid
    equality check drops fills that leaked across user boundaries.
    No per-row Python anywhere."""
    types = pa.array([left_type, right_type])

    def prune(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["event_type"], value_set=types))

    def per_bucket(group: pa.Table) -> pa.Table:
        ts = _ts_us(group["ts"])
        uid = group["user_id"].to_numpy()
        eid = group["event_id"].to_numpy()
        # side: rights sort before lefts at equal (uid, ts) -> inclusive
        side = pc.equal(group["event_type"], left_type).to_numpy(zero_copy_only=False)
        order = np.lexsort((side, ts, uid))
        ts_s, uid_s, eid_s, is_left = ts[order], uid[order], eid[order], side[order]
        n = len(order)
        last_right = np.where(~is_left, np.arange(n), -1)
        np.maximum.accumulate(last_right, out=last_right)
        lefts = np.flatnonzero(is_left)
        m = last_right[lefts]
        ok = (m >= 0) & (uid_s[np.maximum(m, 0)] == uid_s[lefts])
        lefts, m = lefts[ok], m[ok]
        return pa.table(
            {
                "event_id": pa.array(eid_s[lefts], pa.int64()),
                "user_id": pa.array(uid_s[lefts], pa.int64()),
                "ts_us": pa.array(ts_s[lefts], pa.int64()),
                "match_ts_us": pa.array(ts_s[m], pa.int64()),
                "gap_us": pa.array(ts_s[lefts] - ts_s[m], pa.int64()),
            }
        )

    from polipus_ray.ops.dedup import join_partitions

    ds = _events_read(sf_dir, ["event_id", "ts", "user_id", "event_type"]).map_batches(prune, batch_format="pyarrow")
    grouped = _bucket_tag(ds, "user_id", join_partitions(None))
    return grouped.map_groups(per_bucket, batch_format="pyarrow").sort("event_id")


def event_type_stats(sf_dir: str):
    """Per event_type: exact distinct users + event count."""
    import ray.data  # noqa: F401

    def pair_partial(batch: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(batch["event_type"].combine_chunks())
        codes = enc.indices.to_numpy().astype(np.int64)
        types = enc.dictionary.to_pylist()
        uid = batch["user_id"].to_numpy()
        comp = np.stack([codes, uid], axis=1)
        pairs, counts = np.unique(comp, axis=0, return_counts=True)
        return pa.table(
            {
                "event_type": pa.array([types[c] for c in pairs[:, 0]], pa.string()),
                "user_id": pa.array(pairs[:, 1], pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    def pair_stats(batch: pa.Table) -> pa.Table:
        # level-2 partial: the level-1 bucketed sum already made
        # (event_type, user_id) unique, so per-type users/events are a
        # vectorized count/sum per block
        enc = pc.dictionary_encode(batch["event_type"].combine_chunks())
        codes = enc.indices.to_numpy().astype(np.int64)
        types = enc.dictionary.to_pylist()
        users = np.bincount(codes, minlength=len(types))
        ev = np.bincount(codes, weights=batch["n"].to_numpy().astype(np.float64), minlength=len(types))
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "n_users": pa.array(users.astype(np.int64), pa.int64()),
                "n_events": pa.array(ev.astype(np.int64), pa.int64()),
            }
        )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "n_users": batch["sum(n_users)"].cast(pa.int64()),
                "n_events": batch["sum(n_events)"].cast(pa.int64()),
            }
        )

    # level 1 (pair collapse) through the bounded bucket shuffle —
    # distinct (type, user) pairs are unbounded at corpus scale; the
    # final per-type fold has only |types| groups, so Ray's aggregate
    # is fine there
    ds = _events_read(sf_dir, ["event_type", "user_id"])
    pairs = _bucketed_sum(ds.map_batches(pair_partial, batch_format="pyarrow"), "user_id", "event_type", ["n"])
    return (
        pairs.map_batches(pair_stats, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_users"), Sum("n_events"))
        .map_batches(rename, batch_format="pyarrow")
        .sort("event_type")
    )


def funnel_completions(sf_dir: str, steps: tuple[str, ...] = ("view", "click", "purchase"), within_s: int = 7 * 86400):
    """Ordered-funnel completion per user: t1 = the user's earliest
    ``steps[0]`` event, t_k = the earliest ``steps[k]`` event at/after
    t_{k-1} (the classic greedy step-wise definition — well-defined,
    so the SQL oracle replays it exactly); a user completes when every
    step matched and t_last - t1 <= ``within_s``.  One row per
    completing user: user_id, t1_us..tK_us.

    Plan: map-side type prune (only funnel-step events travel), ONE
    bounded user-bucket shuffle, then a vectorized multi-user pass per
    bucket: users are rank-compressed, each step's events sorted once
    by (user, ts), and the per-user "first ts >= threshold" lookup is
    one global ``searchsorted`` on a (user_rank, ts-offset) composite
    key — no per-user Python."""
    import ray.data  # noqa: F401

    from polipus_ray.ops.dedup import join_partitions

    within_us = int(within_s) * 1_000_000
    step_list = list(steps)

    def prune(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["event_type"], value_set=pa.array(step_list))
        t = batch.filter(mask)
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts_us": pa.array(_ts_us(t["ts"]), pa.int64()),
                "step": pc.cast(pc.index_in(t["event_type"], value_set=pa.array(step_list)), pa.int32()),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy()
        ts = group["ts_us"].to_numpy()
        st = group["step"].to_numpy()
        if len(uid) == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()), **{f"t{k + 1}_us": pa.array([], pa.int64()) for k in range(len(step_list))}}
            )
        users = np.unique(uid)
        # rank-compress BOTH key parts so the composite (user-rank,
        # ts-rank) stays well inside int64 regardless of id/timestamp
        # magnitudes: each factor is bounded by the bucket's row count,
        # so the product is bounded by rows^2
        uts = np.unique(ts)
        span = len(uts) + 1
        urank = np.searchsorted(users, uid)

        def key(r: np.ndarray, t: np.ndarray) -> np.ndarray:
            # ts >= c  <=>  rank(ts) >= insertion_point(c), so the
            # rank-space search returns the same position
            return r.astype(np.int64) * span + np.searchsorted(uts, t)

        alive = np.ones(len(users), bool)
        cur = np.zeros(len(users), np.int64)
        t_cols: list[np.ndarray] = []
        all_ranks = np.arange(len(users))
        for k in range(len(step_list)):
            sel = st == k
            r_k, ts_k = urank[sel], ts[sel]
            order = np.lexsort((ts_k, r_k))
            r_s, ts_s = r_k[order], ts_k[order]
            keys = key(r_s, ts_s)
            lo = np.searchsorted(r_s, all_ranks)
            hi = np.searchsorted(r_s, all_ranks, side="right")
            pos = np.searchsorted(keys, key(all_ranks, cur)) if k else lo
            hit = (pos >= lo) & (pos < hi) & (alive if k else np.ones(len(users), bool))
            safe = np.minimum(pos, max(len(ts_s) - 1, 0))
            t_k = np.where(hit, ts_s[safe] if len(ts_s) else 0, 0)
            alive &= hit
            cur = t_k
            t_cols.append(t_k)
        done = alive & (t_cols[-1] - t_cols[0] <= within_us)
        cols: dict[str, pa.Array] = {"user_id": pa.array(users[done], pa.int64())}
        for k, t_k in enumerate(t_cols):
            cols[f"t{k + 1}_us"] = pa.array(t_k[done], pa.int64())
        return pa.table(cols)

    ds = _events_read(sf_dir, ["ts", "user_id", "event_type"])
    pruned = ds.map_batches(prune, batch_format="pyarrow")
    grouped = _bucket_tag(pruned, "user_id", join_partitions(None))
    return grouped.map_groups(per_bucket, batch_format="pyarrow").sort("user_id")


def weekly_retention(sf_dir: str, bucket_s: int = 7 * 86400):
    """Cohort retention: per time bucket (default weekly), how many
    users were active, and how many of those were also active in the
    NEXT bucket.  Output: week (bucket index), n_active, n_retained.

    Plan: the two-level exact-distinct shape (event_type_stats) —
    map-side (user, week) pair dedup, bounded user-bucket merge where
    the (u, w) -> (u, w+1) lookup is one sorted-key searchsorted per
    bucket (all weeks of one user land in one bucket), then a tiny
    groupby(week) fold (bucket count is bounded by the time range)."""
    import ray.data  # noqa: F401

    from polipus_ray.ops.dedup import join_partitions

    bucket_us = int(bucket_s) * 1_000_000

    def pairs(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch["ts"])
        uid = batch["user_id"].to_numpy()
        w = ts // bucket_us
        order = np.lexsort((w, uid))
        u_s, w_s = uid[order], w[order]
        new = np.ones(len(u_s), bool)
        new[1:] = (u_s[1:] != u_s[:-1]) | (w_s[1:] != w_s[:-1])
        return pa.table(
            {
                "user_id": pa.array(u_s[new], pa.int64()),
                "week": pa.array(w_s[new], pa.int64()),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy()
        w = group["week"].to_numpy()
        order = np.lexsort((w, uid))
        u_s, w_s = uid[order], w[order]
        new = np.ones(len(u_s), bool)
        new[1:] = (u_s[1:] != u_s[:-1]) | (w_s[1:] != w_s[:-1])
        u_s, w_s = u_s[new], w_s[new]
        # (u, w+1) present?  rank-compress users first so the packed
        # key stays in int64 even when user ids are 64-bit hashes (raw
        # id * span would overflow); the week multiplier is the
        # bucket's own week SPAN (+2 so w+1 fits), not a fixed 2^20 —
        # a fine-grained bucket_s over a multi-year range produces
        # bucket indices >= 2^20, which would collide across users
        wmin = w_s.min() if len(w_s) else np.int64(0)
        wv = w_s - wmin
        span = (wv.max() if len(wv) else np.int64(0)) + np.int64(2)
        ur = np.searchsorted(np.unique(u_s), u_s)
        k = ur * span + wv
        nxt = ur * span + (wv + 1)
        pos = np.searchsorted(k, nxt)
        safe = np.minimum(pos, len(k) - 1)
        retained = (k[safe] == nxt).astype(np.int64)
        # per-week partials within the bucket
        order2 = np.argsort(w_s, kind="stable")
        w_o = w_s[order2]
        newW = np.ones(len(w_o), bool)
        newW[1:] = w_o[1:] != w_o[:-1]
        starts = np.flatnonzero(newW)
        return pa.table(
            {
                "week": pa.array(w_o[starts], pa.int64()),
                "n_active": pa.array(np.add.reduceat(np.ones(len(w_o), np.int64), starts), pa.int64()),
                "n_retained": pa.array(np.add.reduceat(retained[order2], starts), pa.int64()),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        w = group["week"].to_numpy()
        a = group["n_active"].to_numpy()
        r = group["n_retained"].to_numpy()
        order = np.argsort(w, kind="stable")
        w_s = w[order]
        new = np.ones(len(w_s), bool)
        new[1:] = w_s[1:] != w_s[:-1]
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "week": pa.array(w_s[starts], pa.int64()),
                "n_active": pa.array(np.add.reduceat(a[order], starts), pa.int64()),
                "n_retained": pa.array(np.add.reduceat(r[order], starts), pa.int64()),
            }
        )

    ds = _events_read(sf_dir, ["ts", "user_id"])
    p = ds.map_batches(pairs, batch_format="pyarrow")
    merged = _bucket_tag(p, "user_id", join_partitions(None)).map_groups(per_bucket, batch_format="pyarrow")
    # week count is bounded by the corpus time range — safe groupby
    return _bucket_tag(merged, "week", join_partitions(None)).map_groups(fold, batch_format="pyarrow").sort("week")


def user_pivot(sf_dir: str, types: tuple[str, ...] = ("view", "click", "purchase", "signup", "error")):
    """Per-user wide profile (pivot shape): one row per user with a
    count column per event type plus the exact total value in cents —
    the feature-assembly plan every user-level model input needs.

    Map-side partial: per batch one (user, type) composite bincount ->
    at most |users-in-batch| rows with |types|+1 int columns; then one
    bounded user-bucket merge (elementwise sums).  Integer cents keep
    the value sum order-independent."""
    import ray.data  # noqa: F401

    from polipus_ray.ops.dedup import join_partitions

    tl = list(types)
    K = len(tl)

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy()
        cents = np.round(batch["value"].to_numpy() * 100.0).astype(np.int64)
        code = pc.index_in(batch["event_type"], value_set=pa.array(tl)).to_numpy(zero_copy_only=False)
        known = ~np.isnan(code.astype(np.float64)) if code.dtype.kind == "f" else np.ones(len(code), bool)
        code = np.where(known, code, 0).astype(np.int64)
        users = np.unique(uid)
        urank = np.searchsorted(users, uid)
        cnt = np.bincount((urank * K + code)[known], minlength=len(users) * K).reshape(len(users), K)
        tot = np.zeros(len(users), np.int64)
        order = np.argsort(urank, kind="stable")
        u_s = urank[order]
        new = np.ones(len(u_s), bool)
        new[1:] = u_s[1:] != u_s[:-1]
        starts = np.flatnonzero(new)
        tot[u_s[starts]] = np.add.reduceat(cents[order], starts)
        cols: dict[str, pa.Array] = {"user_id": pa.array(users, pa.int64())}
        for k, t in enumerate(tl):
            cols[f"n_{t}"] = pa.array(cnt[:, k], pa.int64())
        cols["total_value_c"] = pa.array(tot, pa.int64())
        return pa.table(cols)

    def merge(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy()
        users = np.unique(uid)
        urank = np.searchsorted(users, uid)
        order = np.argsort(urank, kind="stable")
        u_s = urank[order]
        new = np.ones(len(u_s), bool)
        new[1:] = u_s[1:] != u_s[:-1]
        starts = np.flatnonzero(new)
        cols: dict[str, pa.Array] = {"user_id": pa.array(users, pa.int64())}
        for c in [f"n_{t}" for t in tl] + ["total_value_c"]:
            v = group[c].to_numpy()[order]
            cols[c] = pa.array(np.add.reduceat(v, starts), pa.int64())
        return pa.table(cols)

    ds = _events_read(sf_dir, ["user_id", "event_type", "value"])
    p = ds.map_batches(partial, batch_format="pyarrow")
    return _bucket_tag(p, "user_id", join_partitions(None)).map_groups(merge, batch_format="pyarrow").sort("user_id")


def value_histogram(sf_dir: str, bin_cents: int = 1000):
    """Fixed-bin value distribution per event type — the data-quality
    histogram every ingest dashboard draws.  Map-side: one composite
    bincount per batch over (type, value_cents // bin_cents); the
    shuffle carries O(types x bins) partial rows, never events; merge
    is a bounded bucket fold.  Output: event_type, bin (lower edge in
    cents), n_events."""
    import ray.data  # noqa: F401

    from polipus_ray.ops.dedup import join_partitions

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.round(batch["value"].to_numpy() * 100.0).astype(np.int64)
        b = (cents // bin_cents) * bin_cents
        enc = pc.dictionary_encode(batch["event_type"].combine_chunks())
        codes = enc.indices.to_numpy().astype(np.int64)
        order = np.lexsort((b, codes))
        c_s, b_s = codes[order], b[order]
        new = np.ones(len(c_s), bool)
        new[1:] = (c_s[1:] != c_s[:-1]) | (b_s[1:] != b_s[:-1])
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "event_type": enc.dictionary.take(pa.array(c_s[starts])),
                "bin": pa.array(b_s[starts], pa.int64()),
                "n_events": pa.array(np.diff(np.append(starts, len(c_s))).astype(np.int64), pa.int64()),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        types = np.asarray(group["event_type"].to_pylist(), dtype=object)
        b = group["bin"].to_numpy()
        n = group["n_events"].to_numpy()
        trank = np.searchsorted(np.sort(np.unique(types)), types)
        order = np.lexsort((b, trank))
        t_s, b_s = trank[order], b[order]
        new = np.ones(len(t_s), bool)
        new[1:] = (t_s[1:] != t_s[:-1]) | (b_s[1:] != b_s[:-1])
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "event_type": pa.array(types[order][starts], pa.string()),
                "bin": pa.array(b_s[starts], pa.int64()),
                "n_events": pa.array(np.add.reduceat(n[order], starts), pa.int64()),
            }
        )

    ds = _events_read(sf_dir, ["event_type", "value"])
    parts = ds.map_batches(partial, batch_format="pyarrow")
    return _bucket_tag(parts, "bin", join_partitions(None)).map_groups(fold, batch_format="pyarrow").sort(["event_type", "bin"])


def type_transitions(sf_dir: str):
    """Per-user event-sequence bigram counts — the transition matrix a
    sequence-model dataset build starts from: for every consecutive
    pair in each user's (ts, event_id)-ordered timeline, count
    (prev_type, event_type).  ONE bounded user-bucket shuffle; each
    bucket lexsorts (user, ts, id) once and folds its bigrams with a
    composite bincount; the final fold is a direct groupby because the
    key domain is |types|^2-bounded.  Output: prev_type, event_type,
    n."""
    import ray.data  # noqa: F401

    from polipus_ray.ops.dedup import join_partitions

    def per_bucket(group: pa.Table) -> pa.Table:
        uid = group["user_id"].to_numpy()
        ts = _ts_us(group["ts"])
        eid = group["event_id"].to_numpy()
        enc = pc.dictionary_encode(group["event_type"].combine_chunks())
        codes = enc.indices.to_numpy().astype(np.int64)
        types = enc.dictionary.to_pylist()
        order = np.lexsort((eid, ts, uid))
        u_s, c_s = uid[order], codes[order]
        same = u_s[1:] == u_s[:-1]
        prev = c_s[:-1][same]
        nxt = c_s[1:][same]
        k = len(types)
        cnt = np.bincount(prev * k + nxt, minlength=k * k)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "prev_type": pa.array([types[i] for i in nz // k], pa.string()),
                "event_type": pa.array([types[i] for i in nz % k], pa.string()),
                "n": pa.array(cnt[nz].astype(np.int64), pa.int64()),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        a = np.asarray(group["prev_type"].to_pylist(), dtype=object)
        b = np.asarray(group["event_type"].to_pylist(), dtype=object)
        n = group["n"].to_numpy()
        out_a, out_b, out_n = [], [], []
        for pt in sorted(set(zip(a, b))):
            sel = (a == pt[0]) & (b == pt[1])
            out_a.append(pt[0]); out_b.append(pt[1]); out_n.append(int(n[sel].sum()))
        return pa.table(
            {
                "prev_type": pa.array(out_a, pa.string()),
                "event_type": pa.array(out_b, pa.string()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    ds = _events_read(sf_dir, ["event_id", "ts", "user_id", "event_type"])
    parts = _bucket_tag(ds, "user_id", join_partitions(None)).map_groups(per_bucket, batch_format="pyarrow")
    # |types|^2-bounded key domain -> direct groupby is safe
    return parts.groupby(["prev_type", "event_type"]).map_groups(fold, batch_format="pyarrow").sort(["prev_type", "event_type"])
