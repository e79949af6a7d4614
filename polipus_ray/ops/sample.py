"""Deterministic sampling operators over the ``documents`` table.

Training-data pipelines need reproducible subsampling that any engine
can replay: both ops key off the shared Python/SQL hash
(md5-u64, ops/md5vec.py == DuckDB ``('0x'||substr(md5(s),1,16))::UBIGINT``),
so the SQL oracles select the SAME rows bit-for-bit.

- ``sample_hash_pct``: Bernoulli-style — keep rows whose id-hash mod
  100 falls under ``pct``.  Map-only (no shuffle), the 100 TB shape:
  every task filters its own blocks independently.
- ``sample_stratified_topk``: exactly ``k`` rows per stratum (lang),
  the ``k`` smallest id-hashes — a deterministic uniform-without-
  replacement sample per group.  Map-side partial top-k per batch,
  then one tiny groupby(lang) merge (stratum count is bounded), the
  same partial/merge shape as the ANN brute top-k.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _doc_hash(ids: np.ndarray) -> np.ndarray:
    """md5-u64 of the decimal doc_id string (oracle-parity hash)."""
    from polipus_ray.ops.md5vec import md5_u64_strs

    return md5_u64_strs([str(int(i)) for i in ids])


def sample_hash_pct(sf_dir: str, pct: int = 20):
    """doc_id, lang, n_chars for the deterministic ~pct% hash sample."""
    import ray.data

    from polipus_ray.ops.dedup import small_read_blocks

    def pick(batch: pa.Table) -> pa.Table:
        h = _doc_hash(batch["doc_id"].to_numpy())
        return batch.filter(pa.array(h % np.uint64(100) < np.uint64(pct)))

    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "lang", "n_chars"], override_num_blocks=small_read_blocks(path))
    return ds.map_batches(pick, batch_format="pyarrow")


def sample_stratified_topk(sf_dir: str, k: int = 10):
    """Exactly ``k`` docs per lang (fewer only if the stratum is
    smaller): the k smallest (md5-u64(doc_id), doc_id) per lang.
    Output: lang, doc_id, rank."""
    import ray.data

    from polipus_ray.ops.dedup import small_read_blocks

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
        h = _doc_hash(ids)
        out_lang, out_id, out_h = [], [], []
        for lg in sorted(set(langs)):
            sel = np.flatnonzero(langs == lg)
            order = sel[np.lexsort((ids[sel], h[sel]))[:k]]
            out_lang.append(np.full(len(order), lg, dtype=object))
            out_id.append(ids[order])
            out_h.append(h[order])
        return pa.table(
            {
                "lang": pa.array(np.concatenate(out_lang), pa.string()),
                "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
                "h": pa.array(np.concatenate(out_h).view(np.int64), pa.int64()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        langs = np.asarray(group["lang"].to_pylist(), dtype=object)
        ids = group["doc_id"].to_numpy()
        h = group["h"].to_numpy().view(np.uint64)
        out_lang, out_id, out_rank = [], [], []
        for lg in sorted(set(langs)):
            sel = np.flatnonzero(langs == lg)
            order = sel[np.lexsort((ids[sel], h[sel]))[:k]]
            out_lang.append(np.full(len(order), lg, dtype=object))
            out_id.append(ids[order])
            out_rank.append(np.arange(1, len(order) + 1, dtype=np.int64))
        return pa.table(
            {
                "lang": pa.array(np.concatenate(out_lang), pa.string()),
                "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
                "rank": pa.array(np.concatenate(out_rank), pa.int64()),
            }
        )

    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "lang"], override_num_blocks=small_read_blocks(path))
    return ds.map_batches(partial, batch_format="pyarrow").groupby("lang").map_groups(merge, batch_format="pyarrow").sort(["lang", "rank"])


def pack_greedy(sf_dir: str, capacity: int = 256, group: int = 32):
    """Deterministic sequence packing: docs are split into fixed
    ``group``-sized pack groups by ``doc_id // group``, and within each
    group greedily first-fit packed IN doc_id ORDER into bins of
    ``capacity`` tokens (space-split count) — a new bin starts when the
    running fill would overflow; an oversize doc occupies its own bin.
    Output: doc_id, pack_group, bin_id, n_tokens.

    The greedy scan is inherently serial PER GROUP — that's why the
    group exists: it bounds the serialism to ``group`` docs, groups
    pack independently in parallel (one bounded bucket shuffle), and
    the group id is derivable from doc_id alone so the assignment is
    stable under any execution order.  The SQL oracle replays the scan
    as a recursive CTE stepping one row per group per iteration."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from polipus_ray.ops.dedup import join_partitions, small_read_blocks
    from polipus_ray.ops.windows import _bucket_tag

    def toks(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        n = pc.add(pc.count_substring(batch["text"], " "), 1).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "g": pa.array(ids // group, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
            }
        )

    def pack(bucket: pa.Table) -> pa.Table:
        ids = bucket["doc_id"].to_numpy()
        g = bucket["g"].to_numpy()
        tok = bucket["n_tokens"].to_numpy()
        order = np.lexsort((ids, g))
        ids, g, tok = ids[order], g[order], tok[order]
        bins = np.empty(len(ids), np.int64)
        fill = 0
        b = 0
        for i in range(len(ids)):  # bounded: <= `group` rows per group
            if i == 0 or g[i] != g[i - 1]:
                b, fill = 0, tok[i]
            elif fill + tok[i] > capacity:
                b, fill = b + 1, tok[i]
            else:
                fill += tok[i]
            bins[i] = b
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "pack_group": pa.array(g, pa.int64()),
                "bin_id": pa.array(bins, pa.int64()),
                "n_tokens": pa.array(tok, pa.int64()),
            }
        )

    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"], override_num_blocks=small_read_blocks(path))
    t = ds.map_batches(toks, batch_format="pyarrow")
    return _bucket_tag(t, "g", join_partitions(None)).map_groups(pack, batch_format="pyarrow").sort("doc_id")
