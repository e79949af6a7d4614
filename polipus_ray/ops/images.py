"""Image stages over crawl pages / web tables (multimodal columns).

Images are opaque ``binary`` columns with typed metadata (w/h/fmt) —
the multimodal pattern: decode / feature-extract run as actor-pool
``map_batches`` stages over small batches (payload-heavy rows), and
every wide operation (near-dup grouping) runs on narrow projections
(phash + id), never shipping bytes through a shuffle.

The codec here is the in-repo PRAY raw/qjpg codec
(polipus_ray.synth.images) because the container has no PIL/libjpeg;
``DecodeVerify`` is where a real decoder would slot in (same batch
shape, same output schema).  Unsupported formats surface as
``ok=False`` rows, not exceptions."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..synth.images import decode_image_groups, gray_batch, phash64_from_gray
from .dedup import banded_hamming_pairs, join_partitions


class DecodeVerify:
    """Actor-pool decode + integrity stage: decodes each payload,
    recomputes the perceptual hash and luminance stats.
    Output: id columns + ok / phash_ok / mean_lum / decoded_px.

    Vectorized like the fetcher's ``_verify_payloads``
    (fetch/fetcher.py): one fancy-index gather per shape group out of
    the Arrow binary buffer, luma as one GEMV, hashes as batched GEMMs
    (``phash64_from_gray`` is bit-identical to the scalar ``phash64``
    — pinned by test_synth) — no per-row ``to_pylist`` of payload
    bytes, no per-row decode."""

    def __init__(self, id_col: str = "doc_id"):
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.num_rows
        ok, _fmts, groups = decode_image_groups(batch["bytes"])
        lum = np.zeros(n, np.float64)
        npx = np.zeros(n, np.int64)
        got_ph = np.zeros(n, np.uint64)
        for sel, px4 in groups:
            gray = gray_batch(px4)
            got_ph[sel] = phash64_from_gray(gray)
            lum[sel] = px4.reshape(len(sel), -1).mean(axis=1)
            npx[sel] = px4.shape[1] * px4.shape[2]
        if "phash" in batch.column_names:
            want_none = pc.is_null(batch["phash"]).combine_chunks().to_numpy(zero_copy_only=False)
            want_u64 = (
                pc.fill_null(batch["phash"], 0).combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
            )
            phok = ok & (want_none | (got_ph == want_u64))
        else:
            phok = ok.copy()
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "ok": pa.array(ok, pa.bool_()),
                "phash_ok": pa.array(phok, pa.bool_()),
                "mean_lum": pa.array(lum, pa.float64(), mask=~ok),
                "n_px": pa.array(npx, pa.int64()),
            }
        )


def decode_stage(ds, id_col: str = "doc_id", concurrency: int | tuple[int, int] = (1, 4), batch_size: int = 64):
    """Attach the decode/verify actor-pool stage to a dataset with a
    ``bytes`` column.  Small batch_size: payload-heavy rows.

    ``concurrency`` defaults to an AUTOSCALING range, not a fixed
    size: a fixed int demands min=max actors before any batch runs,
    and on a session where other actors hold CPUs (observed: leftover
    hash-shuffle aggregators on a 4-CPU test session) the pool never
    reaches its minimum and the streaming executor waits forever."""
    return ds.map_batches(
        DecodeVerify,
        fn_constructor_kwargs={"id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def phash_neardup_pairs(ds, id_col: str = "doc_id", max_hamming: int = 4):
    """Near-duplicate image pairs by perceptual hash:
    ``max_hamming + 1`` pigeonhole bit-bands (band_ranges) ->
    groupby(band) -> Hamming-verified pairs (a, b).  Narrow columns
    only.  Banding is LOSSLESS for any max_hamming (a pair within the
    budget leaves >= 1 band untouched), so the output equals
    brute-force all-pairs Hamming<=max_hamming — pinned by
    test_phash_banding_recall."""
    from .dedup import band_ranges

    ranges = band_ranges(max_hamming)

    def explode(batch: pa.Table) -> pa.Table:
        import numpy as np

        ph = batch["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = ph.view(np.uint64)
        n = len(u)
        nb = len(ranges)
        band_val = np.concatenate(
            [((u >> np.uint64(off)) & np.uint64((1 << width) - 1)).astype(np.int64) for off, width in ranges]
        ) if n else np.empty(0, np.int64)
        tile_idx = pa.array(np.tile(np.arange(n, dtype=np.int64), nb))
        return pa.table(
            {
                "band_id": pa.array(np.repeat(np.arange(nb, dtype=np.int32), n)),
                "band_val": pa.array(band_val, pa.int64()),
                "id": batch[id_col].take(tile_idx),
                "phash": pa.array(np.tile(ph, nb), pa.int64()),
            }
        )

    narrow = ds.select_columns([id_col, "phash"])
    banded = narrow.map_batches(explode, batch_format="pyarrow")
    # bounded block-pair path: a degenerate band bucket splits into
    # <= _PAIR_CHUNK-member blocks, so no single task does O(m^2) work
    return banded_hamming_pairs(banded, ["band_id", "band_val"], "id", "phash", max_hamming).sort(["a", "b"])


def _cc_losers_distributed(pairs, max_iters: int = 25, n_pairs: int | None = None):
    """Connected components over the pair graph as iterated min-label
    propagation — every step is a Ray Data join or bounded-bucket
    fold, nothing on the driver.  Converges when the (monotone
    non-increasing) label sum stops changing; returns a
    (loser:int64,) dataset of every non-representative node."""
    import logging

    from ray.data.aggregate import Sum

    from .dedup import min_label_fold

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        return pa.table(
            {"node": pa.array(np.concatenate([a, b]), pa.int64()), "nbr": pa.array(np.concatenate([b, a]), pa.int64())}
        )

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow").materialize()

    def self_label(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"], "label": batch["node"]})

    labels = min_label_fold(edges.map_batches(self_label, batch_format="pyarrow")).materialize()
    prev_sum = None
    for it in range(max_iters):
        nbr = edges.join(
            labels,
            join_type="inner",
            num_partitions=join_partitions(2 * n_pairs if n_pairs else None),
            on=("nbr",),
            right_on=("node",),
            right_suffix="_l",
        )
        # nbr columns: node, nbr, label (the neighbor's label)
        prop = nbr.select_columns(["node", "label"]).union(labels)
        labels = min_label_fold(prop).materialize()
        s = labels.aggregate(Sum("label"))["sum(label)"]
        if s == prev_sum:
            break
        prev_sum = s
    else:
        logging.getLogger(__name__).warning("label propagation hit max_iters=%d without converging", max_iters)

    def losers_only(batch: pa.Table) -> pa.Table:
        keep = batch["label"].to_numpy() != batch["node"].to_numpy()
        return pa.table({"loser": batch.filter(pa.array(keep))["node"]})

    return labels.map_batches(losers_only, batch_format="pyarrow")


def phash_neardup_keep_first(ds, id_col: str = "doc_id", max_hamming: int = 4, driver_pair_limit: int = 1_000_000):
    """Near-dup suppression (SURVEY.md §2 A5): connected components
    over the near-dup pair graph, keep the min-id representative of
    each component; returns (id, keep) for every input id.

    Two component paths behind one fast pair-count check: below
    ``driver_pair_limit`` pairs, a driver-side union-find (exact,
    cheap — pair sets are narrow groupby output); above it, fully
    distributed min-label propagation + an anti-join-style mark, so
    no pair set ever has to fit on the driver."""
    pairs = phash_neardup_pairs(ds, id_col, max_hamming).materialize()
    n_pairs = pairs.count()
    if n_pairs > driver_pair_limit:
        losers_ds = _cc_losers_distributed(pairs, n_pairs=n_pairs)

        # a loser-side marker column makes null-ness observable after
        # the left_outer join (keepers have no matching loser row)
        def add_marker(batch: pa.Table) -> pa.Table:
            return pa.table({"loser": batch["loser"], "marker": pa.array(np.ones(batch.num_rows, dtype=bool))})

        def mark_joined(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.is_null(batch["marker"]).to_numpy(zero_copy_only=False)
            return pa.table({id_col: batch[id_col], "keep": pa.array(keep, pa.bool_())})

        j = ds.select_columns([id_col]).join(
            losers_ds.map_batches(add_marker, batch_format="pyarrow"),
            join_type="left_outer",
            num_partitions=join_partitions(n_pairs),
            on=(id_col,),
            right_on=("loser",),
        )
        return j.map_batches(mark_joined, batch_format="pyarrow")
    rows = pairs.take_all()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        ra, rb = find(r["a"]), find(r["b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = {x: find(x) for x in parent}
    losers = {x for x, r in roots.items() if r != x}

    def mark(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        keep = [i not in losers for i in ids]
        return pa.table({id_col: batch[id_col], "keep": pa.array(keep, pa.bool_())})

    return ds.select_columns([id_col]).map_batches(mark, batch_format="pyarrow")
