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

- ``session_windows``: gap-based sessionization.  Hash-partition by
  ``user_id`` (``groupby.map_groups``), then a fully vectorized
  per-user pass (lexsort -> diff -> boundary flags -> reduceat-style
  slicing).  Scale note: a session split is inherently serial per
  key, so one pathological user concentrates one group's work — the
  same skew class as a hot host in the crawl; bound it upstream with
  a per-user event cap or pre-split by (user_id, coarse time) when a
  key can exceed a block.

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

    from ray.data.aggregate import Sum

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "win_us": batch["win_us"],
                "event_type": batch["event_type"],
                "n_events": batch["sum(n_events)"].cast(pa.int64()),
                "sum_value_cents": batch["sum(sum_value_cents)"].cast(pa.int64()),
            }
        )

    # vectorized hash aggregate over the partials (one python call per
    # BLOCK, not per window group — the group count is unbounded at
    # corpus scale)
    ds = _events_read(sf_dir, ["ts", "event_type", "value"])
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["win_us", "event_type"])
        .aggregate(Sum("n_events"), Sum("sum_value_cents"))
        .map_batches(rename, batch_format="pyarrow")
        .sort(["win_us", "event_type"])
    )


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

    ds = _events_read(sf_dir, ["event_id", "ts", "user_id"])
    return ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow").sort(["user_id", "session_start_us"])


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
        # level-2 partial: the level-1 aggregate already made
        # (event_type, user_id) unique, so per-type users/events are a
        # vectorized count/sum per block
        enc = pc.dictionary_encode(batch["event_type"].combine_chunks())
        codes = enc.indices.to_numpy().astype(np.int64)
        types = enc.dictionary.to_pylist()
        users = np.bincount(codes, minlength=len(types))
        ev = np.bincount(codes, weights=batch["sum(n)"].to_numpy().astype(np.float64), minlength=len(types))
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

    ds = _events_read(sf_dir, ["event_type", "user_id"])
    return (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("n"))
        .map_batches(pair_stats, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n_users"), Sum("n_events"))
        .map_batches(rename, batch_format="pyarrow")
        .sort("event_type")
    )
