"""Deduplication operators — exact and near-dup, as Ray Data
pipelines (SURVEY.md's training-data extensions).

Scale shapes (the canonical pattern per op):

- exact:   hash per batch (map_batches) -> groupby(hash) keep-min —
           one narrow shuffle of (hash, id).
- MinHash-LSH: shingle+sign per batch -> explode (band, band_hash, id)
           -> groupby(band key) -> candidate pairs -> dedup pairs ->
           verify exact Jaccard.  Verification uses a broadcast
           {doc_id: shingle set} (ray.put) — fine to ~1e6 docs; at
           larger scale swap for a bucketed re-join by doc_id (noted
           inline), the pipeline shape is unchanged.
- SimHash: 64-bit signature -> 4x16-bit pigeonhole bands (any pair
           with Hamming distance <= 3 shares >= 1 exact band) ->
           groupby band -> verify Hamming.
- n-gram Jaccard: inverted index on word n-grams -> co-occurrence
           pairs (hot grams capped) -> verify.
- embedding cosine: broadcast matrix + per-batch float64 matmul.

All pair outputs are (a, b) with a < b, sorted-unique."""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

_PRIME = (1 << 31) - 1  # Mersenne 31: products of 31-bit values fit uint64


def _shingles(text: str, n: int = 5) -> np.ndarray:
    """Char n-gram shingle hashes (uint64, deterministic)."""
    t = text.lower()
    if len(t) < n:
        t = t + " " * (n - len(t))
    out = np.empty(len(t) - n + 1, dtype=np.uint64)
    for i in range(len(t) - n + 1):
        s = t[i : i + n].encode()
        out[i] = (zlib.crc32(s) << 32) | zlib.crc32(s, 777)
    return np.unique(out)


def _minhash_params(num_perm: int, seed: int = 13):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _PRIME, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _PRIME, size=num_perm, dtype=np.uint64)
    return a, b


def _minhash_sig(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Fully vectorized: (P, S) universal-hash matrix min-reduced over
    shingles.  31-bit params x 31-bit folded shingles keep every
    product exact in uint64."""
    h = (shingle_hashes % np.uint64(_PRIME)).astype(np.uint64)
    prods = (a[:, None] * h[None, :] + b[:, None]) % np.uint64(_PRIME)
    return prods.min(axis=1)


def exact_dedup(sf_dir: str):
    """Keep min doc_id per exact text hash.  Oracle-SQL-checked."""
    import ray.data

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5(t.encode()).hexdigest() for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"], "text_hash": pa.array(hs, pa.string())})

    def keep_first(group: pa.Table) -> pa.Table:
        i = int(np.argmin(group["doc_id"].to_numpy()))
        return group.take(pa.array([i]))

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(add_hash, batch_format="pyarrow").groupby("text_hash").map_groups(keep_first, batch_format="pyarrow")


def _pairs_from_group(ids: np.ndarray, cap: int = 64) -> list[tuple[int, int]]:
    ids = np.unique(ids)[:cap]  # hot-bucket cap (documented truncation)
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            out.append((int(ids[i]), int(ids[j])))
    return out


def _dedup_pairs_ds(pairs_ds):
    def first(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    return pairs_ds.groupby(["a", "b"]).map_groups(first, batch_format="pyarrow")


def _docs_read(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.8, num_perm: int = 128, bands: int = 32, ngram: int = 5, table=None):
    """Near-dup pairs by MinHash-LSH, verified with exact Jaccard on
    char n-gram shingles.  Rows-only driver check; pytest oracle is
    the brute-force all-pairs Jaccard."""
    import ray
    import ray.data

    a, b = _minhash_params(num_perm)
    rows_per_band = num_perm // bands

    def sig_stage(batch: pa.Table) -> pa.Table:
        band_id, band_hash, doc = [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sig = _minhash_sig(_shingles(text, ngram), a, b)
            for bi in range(bands):
                chunk = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
                bh = int.from_bytes(hashlib.md5(chunk.tobytes()).digest()[:8], "big") >> 1
                band_id.append(bi)
                band_hash.append(bh)
                doc.append(did)
        return pa.table(
            {"band_id": pa.array(band_id, pa.int32()), "band_hash": pa.array(band_hash, pa.int64()), "doc_id": pa.array(doc, pa.int64())}
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        prs = _pairs_from_group(group["doc_id"].to_numpy())
        return pa.table({"a": pa.array([p[0] for p in prs], pa.int64()), "b": pa.array([p[1] for p in prs], pa.int64())})

    ds = ray.data.from_arrow(table) if table is not None else _docs_read(sf_dir)
    docs = {r["doc_id"]: r["text"] for r in ds.take_all()}  # small side for verify; at scale: bucketed re-join by id
    docs_ref = ray.put({k: _shingles(v, ngram) for k, v in docs.items()})

    cand = (
        ds.map_batches(sig_stage, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    cand = _dedup_pairs_ds(cand)

    def verify(batch: pa.Table) -> pa.Table:
        sh = ray.get(docs_ref)
        keep = []
        for x, y in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            s1, s2 = sh[x], sh[y]
            inter = np.intersect1d(s1, s2, assume_unique=True).size
            jac = inter / (s1.size + s2.size - inter) if (s1.size + s2.size - inter) else 1.0
            keep.append(jac >= threshold)
        return batch.filter(pa.array(keep))

    return verify_sorted(cand.map_batches(verify, batch_format="pyarrow"))


def verify_sorted(ds):
    return ds.sort(["a", "b"])


def simhash64(text: str) -> int:
    """Word-unigram 64-bit SimHash (weights 1), vectorized: one
    (W, 64) bit matrix, column-summed."""
    ws = text.lower().split()
    if not ws:
        return 0
    hs = np.array([(zlib.crc32(w.encode()) << 32) | zlib.crc32(w.encode(), 777) for w in ws], dtype=np.uint64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int32)
    acc = (2 * bits - 1).sum(axis=0)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_pairs(sf_dir: str, max_hamming: int = 3, table=None):
    """Near-dup pairs by SimHash banding (4x16-bit pigeonhole: any
    pair within Hamming<=3 shares at least one exact band)."""
    import ray.data

    def sig_stage(batch: pa.Table) -> pa.Table:
        band_id, band_val, doc, sh = [], [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            s = simhash64(text)
            for bi in range(4):
                band_id.append(bi)
                band_val.append((s >> (16 * bi)) & 0xFFFF)
                doc.append(did)
                sh.append(s - (1 << 64) if s >= 1 << 63 else s)
        return pa.table(
            {
                "band_id": pa.array(band_id, pa.int32()),
                "band_val": pa.array(band_val, pa.int32()),
                "doc_id": pa.array(doc, pa.int64()),
                "simhash": pa.array(sh, pa.int64()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy()
        hs = group["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        uniq, first = np.unique(ids, return_index=True)
        hs = hs[first]
        A, B = [], []
        for i in range(len(uniq)):
            for j in range(i + 1, len(uniq)):
                if bin(int(hs[i]) ^ int(hs[j])).count("1") <= max_hamming:
                    x, y = int(uniq[i]), int(uniq[j])
                    A.append(min(x, y))
                    B.append(max(x, y))
        return pa.table({"a": pa.array(A, pa.int64()), "b": pa.array(B, pa.int64())})

    import ray

    ds = ray.data.from_arrow(table) if table is not None else _docs_read(sf_dir)
    cand = ds.map_batches(sig_stage, batch_format="pyarrow").groupby(["band_id", "band_val"]).map_groups(bucket_pairs, batch_format="pyarrow")
    return verify_sorted(_dedup_pairs_ds(cand))


def ngram_jaccard_pairs(sf_dir: str, n: int = 3, threshold: float = 0.5, hot_cap: int = 64, table=None):
    """Near-dup pairs via word n-gram inverted index + exact Jaccard."""
    import ray
    import ray.data

    def gram_hashes(text: str) -> np.ndarray:
        toks = text.lower().split()
        if len(toks) < n:
            grams = [" ".join(toks)] if toks else []
        else:
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        return np.unique(np.array([int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big") >> 1 for g in grams], dtype=np.int64))

    def explode(batch: pa.Table) -> pa.Table:
        gh, doc = [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for g in gram_hashes(text):
                gh.append(int(g))
                doc.append(did)
        return pa.table({"gram": pa.array(gh, pa.int64()), "doc_id": pa.array(doc, pa.int64())})

    def bucket_pairs(group: pa.Table) -> pa.Table:
        prs = _pairs_from_group(group["doc_id"].to_numpy(), cap=hot_cap)
        return pa.table({"a": pa.array([p[0] for p in prs], pa.int64()), "b": pa.array([p[1] for p in prs], pa.int64())})

    ds = ray.data.from_arrow(table) if table is not None else _docs_read(sf_dir)
    docs = {r["doc_id"]: r["text"] for r in ds.take_all()}
    sets_ref = ray.put({k: gram_hashes(v) for k, v in docs.items()})
    cand = _dedup_pairs_ds(ds.map_batches(explode, batch_format="pyarrow").groupby("gram").map_groups(bucket_pairs, batch_format="pyarrow"))

    def verify(batch: pa.Table) -> pa.Table:
        sets = ray.get(sets_ref)
        keep = []
        for x, y in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            s1, s2 = sets[x], sets[y]
            inter = np.intersect1d(s1, s2, assume_unique=True).size
            union = s1.size + s2.size - inter
            keep.append((inter / union if union else 1.0) >= threshold)
        return batch.filter(pa.array(keep))

    return verify_sorted(cand.map_batches(verify, batch_format="pyarrow"))


def emb_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (zero-copy values)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    dim = len(col[0])
    return col.values.to_numpy(zero_copy_only=False).reshape(-1, dim).astype(np.float64)


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.95):
    """Pairs (a, b) with cosine similarity >= threshold.  SQL-oracle
    checked (DuckDB list_cosine_similarity).  Broadcast full matrix +
    per-batch matmul; at larger scale pre-bucket by LSH of the top
    principal direction before pairing."""
    import ray
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    all_t = pa.concat_tables([b for b in ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow")])
    ids = all_t["vec_id"].to_numpy()
    M = emb_matrix(all_t["embedding"])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((ids, M))

    def stage(batch: pa.Table) -> pa.Table:
        aid, full = ray.get(ref)
        bm = emb_matrix(batch["embedding"])
        bm = bm / np.linalg.norm(bm, axis=1, keepdims=True)
        bids = batch["vec_id"].to_numpy()
        sims = bm @ full.T
        A, B = [], []
        for i in range(len(bids)):
            hits = np.flatnonzero(sims[i] >= threshold)
            for j in hits:
                if aid[j] > bids[i]:
                    A.append(int(bids[i]))
                    B.append(int(aid[j]))
        return pa.table({"a": pa.array(A, pa.int64()), "b": pa.array(B, pa.int64())})

    return ds.map_batches(stage, batch_format="pyarrow", batch_size=256).sort(["a", "b"])
