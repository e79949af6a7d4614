"""End-to-end corpus curation verdict — the composite every
training-data pipeline runs before tokenization, here as ONE pass plus
one bounded shuffle:

- **signals** (map-side, vectorized, shared kernels with
  ops/text.py): word counts, distinct-word count, top-word character
  mass, stopword count, character length, and the md5-u64 full-text
  hash (the shared Python/SQL hash).
- **exact-dedup keep** (the only shuffle): hash-bucket on the text
  hash, keep = min doc_id per identical text — first-occurrence-wins
  over the whole corpus, not per block.
- **verdicts** are integer/boolean expressions (cross-multiplied
  ratios, no float division), so the DuckDB oracle replays every
  column bit-for-bit:
    keep_quality     = 30 <= n_words <= 500 and stop_cnt >= 2
    keep_repetition  = distinct/words >= 0.3 and top-word chars <= 20%
    keep             = all of the above and keep_dedup

Gopher-rule shaped (Rae et al., arXiv:2112.11446 §A1.1 motivates the
repetition family); thresholds here are fixed so the oracle is static.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from polipus_ray.ops.text import _STOP_RE, _word_lists

N_WORDS_MIN, N_WORDS_MAX = 30, 500
STOP_MIN = 2
DISTINCT_NUM, DISTINCT_DEN = 3, 10  # distinct/words >= 0.3
TOP_FRAC_DEN = 5  # top-word chars <= 1/5 of chars


def curation(sf_dir: str):
    """doc_id, keep_dedup, keep_quality, keep_repetition, keep."""
    import ray.data

    from polipus_ray.ops.dedup import join_partitions, small_read_blocks
    from polipus_ray.ops.md5vec import md5_u64_strs
    from polipus_ray.ops.windows import _bucket_tag

    def signals(batch: pa.Table) -> pa.Table:
        _, codes, doc_of, n_words, dictionary = _word_lists(batch)
        d = len(n_words)
        order = np.lexsort((codes, doc_of))
        d_s, c_s = doc_of[order], codes[order]
        new = np.ones(len(d_s), bool)
        new[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
        starts = np.flatnonzero(new)
        g_doc, g_code = d_s[starts], c_s[starts]
        g_cnt = np.diff(np.append(starts, len(d_s)))
        n_distinct = np.bincount(g_doc, minlength=d)
        words = np.asarray(dictionary.to_pylist(), dtype=object)
        wrank = np.empty(len(words), np.int64)
        wrank[np.argsort(words, kind="stable")] = np.arange(len(words))
        top_order = np.lexsort((wrank[g_code], -g_cnt, g_doc))
        first = np.ones(len(top_order), bool)
        first[1:] = g_doc[top_order][1:] != g_doc[top_order][:-1]
        top_rows = top_order[first]
        wlen = np.fromiter((len(w) for w in words), np.int64, len(words))
        top_chars = np.zeros(d, np.int64)
        top_chars[g_doc[top_rows]] = wlen[g_code[top_rows]] * g_cnt[top_rows]
        stop_cnt = pc.count_substring_regex(pc.utf8_lower(batch["text"]), _STOP_RE.pattern).to_numpy(zero_copy_only=False).astype(np.int64)
        n_chars = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False).astype(np.int64)
        h = md5_u64_strs(batch["text"].to_pylist())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "h": pa.array(h.view(np.int64), pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
                "n_distinct": pa.array(n_distinct, pa.int64()),
                "top_chars": pa.array(top_chars, pa.int64()),
                "stop_cnt": pa.array(stop_cnt, pa.int64()),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        )

    def verdicts(bucket: pa.Table) -> pa.Table:
        ids = bucket["doc_id"].to_numpy()
        h = bucket["h"].to_numpy()
        order = np.lexsort((ids, h))
        h_s, id_s = h[order], ids[order]
        new = np.ones(len(h_s), bool)
        new[1:] = h_s[1:] != h_s[:-1]
        group_first = id_s[np.flatnonzero(new)]
        keeper_of = np.repeat(group_first, np.diff(np.append(np.flatnonzero(new), len(h_s))))
        keep_dedup = np.empty(len(ids), bool)
        keep_dedup[order] = id_s == keeper_of
        nw = bucket["n_words"].to_numpy()
        nd = bucket["n_distinct"].to_numpy()
        tc = bucket["top_chars"].to_numpy()
        sc = bucket["stop_cnt"].to_numpy()
        nc = bucket["n_chars"].to_numpy()
        keep_quality = (nw >= N_WORDS_MIN) & (nw <= N_WORDS_MAX) & (sc >= STOP_MIN)
        keep_rep = (nd * DISTINCT_DEN >= nw * DISTINCT_NUM) & (tc * TOP_FRAC_DEN <= nc)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "keep_dedup": pa.array(keep_dedup, pa.bool_()),
                "keep_quality": pa.array(keep_quality, pa.bool_()),
                "keep_repetition": pa.array(keep_rep, pa.bool_()),
                "keep": pa.array(keep_dedup & keep_quality & keep_rep, pa.bool_()),
            }
        )

    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"], override_num_blocks=small_read_blocks(path))
    sig = ds.map_batches(signals, batch_format="pyarrow")
    return _bucket_tag(sig, "h", join_partitions(None)).map_groups(verdicts, batch_format="pyarrow").sort("doc_id")


def contamination(sf_dir: str, n: int = 8, bench_mod: int = 97):
    """Benchmark-contamination detection — the decontamination pass
    every pretraining pipeline runs before a corpus ships: flag every
    document sharing at least one word ``n``-gram with the evaluation
    set (here: docs with ``doc_id % bench_mod == 0`` stand in for the
    benchmark, so the op needs no external data and the DuckDB oracle
    replays it exactly).  Output: (doc_id, n_hits = DISTINCT benchmark
    grams the doc contains, contaminated).

    Scale shape: the benchmark side is SMALL by definition (eval sets
    are thousands of documents against a corpus of billions), so its
    distinct gram hashes are collected once, sorted, and broadcast via
    ``ray.put``; the corpus pass is then map-only — batched gram
    hashing (the shared ``_gram_hashes_batch`` md5 kernel) + one
    ``searchsorted`` membership per batch.  No shuffle at all.  Gram
    identity is the md5-u64 hash (the house Python/SQL hash recipe);
    the oracle joins on the gram STRINGS, identical modulo 2^-64
    collisions."""
    import ray
    import ray.data

    from polipus_ray.ops.dedup import _gram_hashes_batch, small_read_blocks

    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"], override_num_blocks=small_read_blocks(path))

    def bench_grams(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        sel = ids % bench_mod == 0
        if not sel.any():
            return pa.table({"gram": pa.array([], pa.int64())})
        texts = batch.filter(pa.array(sel))["text"].to_pylist()
        gs = _gram_hashes_batch(texts, n)
        cat = np.unique(np.concatenate(gs)) if gs else np.empty(0, np.uint64)
        return pa.table({"gram": pa.array(cat.view(np.int64), pa.int64())})

    # small-side index: block-local distinct -> driver unique -> one
    # broadcast object (bounded by the benchmark's gram vocabulary)
    parts = [b["gram"].to_numpy() for b in ds.map_batches(bench_grams, batch_format="pyarrow").iter_batches(batch_size=1 << 20, batch_format="pyarrow")]
    index = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    iref = ray.put(index)

    def mark(batch: pa.Table) -> pa.Table:
        from polipus_ray.ops.dedup import sorted_member

        idx = ray.get(iref)
        gs = _gram_hashes_batch(batch["text"].to_pylist(), n)
        # ONE membership probe for the whole batch's grams, then
        # per-doc segment sums over the gram-count bounds
        counts = np.fromiter((len(g) for g in gs), np.int64, len(gs))
        hits = np.zeros(batch.num_rows, np.int64)
        if counts.sum() and len(idx):
            flat = np.concatenate([g.view(np.int64) for g in gs if len(g)])
            hit, _ = sorted_member(idx, flat)
            c = np.concatenate([[0], np.cumsum(hit, dtype=np.int64)])
            ends = np.cumsum(counts)
            hits = c[ends] - c[ends - counts]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_hits": pa.array(hits, pa.int64()),
                "contaminated": pa.array(hits > 0, pa.bool_()),
            }
        )

    return ds.map_batches(mark, batch_format="pyarrow").sort("doc_id")
