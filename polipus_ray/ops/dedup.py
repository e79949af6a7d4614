"""Deduplication operators — exact and near-dup, as Ray Data
pipelines (SURVEY.md's training-data extensions).

Scale shapes (the canonical pattern per op):

- exact:   hash per batch (map_batches) -> groupby(hash) keep-min —
           one narrow shuffle of (hash, id).
- MinHash-LSH: shingle+sign per batch -> explode (band_id, band_key,
           doc_id) -> groupby(band key) -> candidate pairs -> dedup
           pairs -> verify exact Jaccard by a DISTRIBUTED double hash
           join of the candidate pairs against a (doc_id, packed
           shingle set) dataset — no driver materialization, no
           whole-corpus broadcast anywhere.
- SimHash: 64-bit signature -> 4x16-bit pigeonhole bands (any pair
           with Hamming distance <= 3 shares >= 1 exact band) ->
           groupby band -> verify Hamming.  Result == ALL pairs with
           Hamming <= max_hamming (banding is lossless pigeonholing).
- n-gram Jaccard: PREFIX-FILTERED inverted index on word n-grams
           (index only each doc's smallest |X| - ceil(t*|X|) + 1 gram
           hashes; any pair with J >= t provably shares a prefix
           gram — the AllPairs/SSJoin prefix filter) -> candidate
           pairs -> the same join-based exact-Jaccard verify.  Exact:
           no silent hot-bucket truncation.
- embedding cosine (exact): per-batch matmul against NORMALIZED
           corpus blocks streamed one at a time from plasma (the
           driver holds only ObjectRefs, each task holds one block +
           one batch).  Exact all-pairs is inherently O(n^2) compute;
           the approximate scale path is the sign-LSH variant below.
- embedding cosine (LSH): sign-bit random-hyperplane bands ->
           bucketed candidates -> exact cosine verify via join.

All pair outputs are (a, b) with a < b, sorted-unique.  Every hash
here is md5-derived so the DuckDB oracles in __ray_entry__.py can
replicate them bit-for-bit (('0x' || substr(md5(s),1,16))::UBIGINT ==
int.from_bytes(md5(s)[:8], 'big'))."""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pyarrow as pa

logger = logging.getLogger(__name__)

_PRIME = (1 << 31) - 1  # Mersenne 31: products of 31-bit values fit int64

# buckets larger than this emit a warning (pair output is O(m^2); a
# bucket this hot usually means boilerplate text / degenerate keys)
_HOT_BUCKET_WARN = 1024


def _h64(s: str) -> int:
    """First 8 bytes of md5, big-endian — the shared Python/SQL hash."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


# per-process shingle/gram hash memo: the n-gram vocabulary is tiny
# relative to total occurrences, so the md5 cost amortizes to a dict
# lookup.  Bounded: cleared when it outgrows ~4M entries.
_H64_CACHE: dict[str, int] = {}
_H64_CACHE_MAX = 1 << 22


def _h64_cached(s: str) -> int:
    h = _H64_CACHE.get(s)
    if h is None:
        if len(_H64_CACHE) >= _H64_CACHE_MAX:
            _H64_CACHE.clear()
        h = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
        _H64_CACHE[s] = h
    return h


def _shingles(text: str, n: int = 5) -> np.ndarray:
    """Distinct char n-gram shingle hashes (uint64, md5-derived)."""
    t = text.lower()
    if len(t) < n:
        t = t + " " * (n - len(t))
    g = _h64_cached
    return np.unique(np.fromiter((g(t[i : i + n]) for i in range(len(t) - n + 1)), dtype=np.uint64, count=len(t) - n + 1))


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

    from ray.data.aggregate import Min

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5(t.encode()).hexdigest() for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"], "text_hash": pa.array(hs, pa.string())})

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"text_hash": batch["text_hash"], "doc_id": batch["min(doc_id)"]})

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # vectorized hash aggregate (one python call per BLOCK, not per
    # group — map_groups would pay a call per distinct hash)
    return ds.map_batches(add_hash, batch_format="pyarrow").groupby("text_hash").aggregate(Min("doc_id")).map_batches(rename, batch_format="pyarrow")


def _pairs_from_group(ids: np.ndarray) -> list[tuple[int, int]]:
    ids = np.unique(ids)
    if len(ids) > _HOT_BUCKET_WARN:
        logger.warning("hot dedup bucket: %d members -> %d candidate pairs", len(ids), len(ids) * (len(ids) - 1) // 2)
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            out.append((int(ids[i]), int(ids[j])))
    return out


def _dedup_pairs_ds(pairs_ds):
    """Distinct (a, b) pairs via a vectorized count aggregate (one
    call per block) rather than map_groups (one python call per pair)."""
    from ray.data.aggregate import Count

    def drop_count(batch: pa.Table) -> pa.Table:
        return batch.select(["a", "b"])

    return pairs_ds.groupby(["a", "b"]).aggregate(Count()).map_batches(drop_count, batch_format="pyarrow")


def _docs_read(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _pack_u64(arr: np.ndarray) -> bytes:
    return np.asarray(arr, dtype=np.uint64).tobytes()


def _unpack_u64(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype=np.uint64)


def _jaccard_verify_join(cand, sigs, threshold: float, num_partitions: int = 8):
    """Distributed exact-Jaccard verify: join candidate pairs against
    the (doc_id, sig:binary packed uint64 set) dataset on both sides,
    then compute Jaccard per pair.  The scale path: pairs and
    signatures both shuffle by key; nothing is materialized on the
    driver or broadcast whole (Arrow joins reject list columns, hence
    the packed-binary signature encoding)."""
    j = cand.join(sigs, join_type="inner", num_partitions=num_partitions, on=("a",), right_on=("doc_id",))
    j = j.join(sigs, join_type="inner", num_partitions=num_partitions, on=("b",), right_on=("doc_id",), right_suffix="_b")

    def verify(batch: pa.Table) -> pa.Table:
        keep = []
        for sa, sb in zip(batch["sig"].to_pylist(), batch["sig_b"].to_pylist()):
            s1, s2 = _unpack_u64(sa), _unpack_u64(sb)
            inter = np.intersect1d(s1, s2, assume_unique=True).size
            union = s1.size + s2.size - inter
            keep.append((inter / union if union else 1.0) >= threshold)
        return batch.filter(pa.array(keep)).select(["a", "b"])

    return verify_sorted(j.map_batches(verify, batch_format="pyarrow"))


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.8, num_perm: int = 128, bands: int = 16, ngram: int = 5, table=None):
    """Near-dup pairs by MinHash-LSH, verified with exact Jaccard on
    char n-gram shingles.  Oracle-SQL-checked: band keys are the
    literal '_'-joined signature values and every hash is md5-derived,
    so the DuckDB oracle reproduces candidates AND verification
    exactly.  Verification is a distributed signature join — nothing
    is pulled to the driver or broadcast whole."""
    import ray.data

    a, b = _minhash_params(num_perm)
    rows_per_band = num_perm // bands

    def shingle_sets(batch: pa.Table) -> pa.Table:
        packed = [_pack_u64(_shingles(t, ngram)) for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"], "sig": pa.array(packed, pa.binary())})

    def band_stage(batch: pa.Table) -> pa.Table:
        # bands derived from the PACKED shingle sets: the expensive
        # shingling runs once total, not once per downstream pipeline
        band_id, band_key, doc = [], [], []
        for did, packed in zip(batch["doc_id"].to_pylist(), batch["sig"].to_pylist()):
            sig = _minhash_sig(_unpack_u64(packed), a, b)
            for bi in range(bands):
                chunk = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
                band_id.append(bi)
                band_key.append("_".join(str(int(v)) for v in chunk))
                doc.append(did)
        return pa.table(
            {"band_id": pa.array(band_id, pa.int32()), "band_key": pa.array(band_key, pa.string()), "doc_id": pa.array(doc, pa.int64())}
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        prs = _pairs_from_group(group["doc_id"].to_numpy())
        return pa.table({"a": pa.array([p[0] for p in prs], pa.int64()), "b": pa.array([p[1] for p in prs], pa.int64())})

    ds = ray.data.from_arrow(table) if table is not None else _docs_read(sf_dir)
    # distributed materialize (object store, never the driver): the
    # sigs feed both the banding pipeline and the verify join
    sigs = ds.map_batches(shingle_sets, batch_format="pyarrow").materialize()
    cand = (
        sigs.map_batches(band_stage, batch_format="pyarrow")
        .groupby(["band_id", "band_key"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    return _jaccard_verify_join(_dedup_pairs_ds(cand), sigs, threshold)


def verify_sorted(ds):
    return ds.sort(["a", "b"])


def simhash64(text: str) -> int:
    """Word-unigram 64-bit SimHash (weights 1, md5 word hashes),
    vectorized: one (W, 64) bit matrix, column-summed."""
    ws = text.lower().split()
    if not ws:
        return 0
    hs = np.array([_h64_cached(w) for w in ws], dtype=np.uint64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int32)
    acc = (2 * bits - 1).sum(axis=0)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_pairs(sf_dir: str, max_hamming: int = 3, table=None):
    """Near-dup pairs by SimHash banding (4x16-bit pigeonhole: any
    pair within Hamming<=3 shares at least one exact band).  The
    banded result equals all-pairs Hamming<=max_hamming exactly, which
    is what the DuckDB oracle computes."""
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

    ds = ray.data.from_arrow(table) if table is not None else _docs_read(sf_dir)
    cand = ds.map_batches(sig_stage, batch_format="pyarrow").groupby(["band_id", "band_val"]).map_groups(bucket_pairs, batch_format="pyarrow")
    return verify_sorted(_dedup_pairs_ds(cand))


def _gram_hashes(text: str, n: int) -> np.ndarray:
    """Distinct word n-gram hashes (uint64, md5-derived)."""
    toks = text.lower().split()
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return np.unique(np.array([_h64_cached(g) for g in grams], dtype=np.uint64))


def ngram_jaccard_pairs(sf_dir: str, n: int = 3, threshold: float = 0.5, table=None):
    """Near-dup pairs via word n-gram Jaccard, exact.  Candidates come
    from a PREFIX-FILTERED inverted index (index each doc's smallest
    |X| - ceil(t*|X|) + 1 gram hashes; the AllPairs prefix filter
    guarantees any pair with J >= t shares an indexed gram), then
    exact Jaccard verification via the distributed signature join.
    Output == brute-force all-pairs Jaccard >= threshold, which is
    what the DuckDB oracle computes."""
    import ray.data

    def explode_prefix(batch: pa.Table) -> pa.Table:
        gh, doc = [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            g = np.sort(_gram_hashes(text, n))
            plen = len(g) - int(np.ceil(threshold * len(g))) + 1 if len(g) else 0
            for v in g[:plen]:
                gh.append(int(v) - (1 << 64) if v >= (1 << 63) else int(v))
                doc.append(did)
        return pa.table({"gram": pa.array(gh, pa.int64()), "doc_id": pa.array(doc, pa.int64())})

    def gram_sets(batch: pa.Table) -> pa.Table:
        packed = [_pack_u64(_gram_hashes(t, n)) for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"], "sig": pa.array(packed, pa.binary())})

    def bucket_pairs(group: pa.Table) -> pa.Table:
        prs = _pairs_from_group(group["doc_id"].to_numpy())
        return pa.table({"a": pa.array([p[0] for p in prs], pa.int64()), "b": pa.array([p[1] for p in prs], pa.int64())})

    ds = ray.data.from_arrow(table) if table is not None else _docs_read(sf_dir)
    sigs = ds.map_batches(gram_sets, batch_format="pyarrow")
    cand = _dedup_pairs_ds(ds.map_batches(explode_prefix, batch_format="pyarrow").groupby("gram").map_groups(bucket_pairs, batch_format="pyarrow"))
    return _jaccard_verify_join(cand, sigs, threshold)


def emb_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix (zero-copy values)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    dim = len(col[0])
    return col.values.to_numpy(zero_copy_only=False).reshape(-1, dim).astype(np.float64)


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.95):
    """Pairs (a, b) with cosine similarity >= threshold — EXACT
    all-pairs (SQL-oracle checked vs DuckDB list_cosine_similarity).

    Scale shape: the corpus is normalized into per-block plasma
    objects by remote tasks (the driver holds only ObjectRefs — no
    driver-side materialization); each map_batches task streams over
    those blocks one at a time, so task memory is O(batch + block)
    while the O(n^2) flops distribute across the cluster.  Exact
    all-pairs is inherently quadratic; use
    ``embedding_dup_pairs_lsh`` as the approximate path at 1e9+
    vectors."""
    import ray
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    @ray.remote
    def _norm_block(t: pa.Table):
        ids = t["vec_id"].to_numpy()
        M = emb_matrix(t["embedding"])
        return ids, M / np.linalg.norm(M, axis=1, keepdims=True)

    raw_refs = ds.to_arrow_refs()  # distributed materialize; refs only on driver
    block_refs = [_norm_block.remote(r) for r in raw_refs]

    def stage(batch: pa.Table) -> pa.Table:
        bm = emb_matrix(batch["embedding"])
        bm = bm / np.linalg.norm(bm, axis=1, keepdims=True)
        bids = batch["vec_id"].to_numpy()
        A: list[int] = []
        B: list[int] = []
        for r in block_refs:
            aid, full = ray.get(r)  # zero-copy plasma read, one block at a time
            sims = bm @ full.T
            ii, jj = np.nonzero(sims >= threshold)
            sel = aid[jj] > bids[ii]
            A.extend(int(x) for x in bids[ii[sel]])
            B.extend(int(x) for x in aid[jj[sel]])
        return pa.table({"a": pa.array(A, pa.int64()), "b": pa.array(B, pa.int64())})

    import ray.data as rd

    src = rd.from_arrow_refs(raw_refs)
    return src.map_batches(stage, batch_format="pyarrow", batch_size=256).sort(["a", "b"])


def embedding_dup_pairs_lsh(sf_dir: str, threshold: float = 0.9, nplanes: int = 128, band_bits: int = 8, seed: int = 5):
    """Approximate near-dup pairs: sign-bit random-hyperplane LSH
    banding for candidates, exact cosine verify via distributed join.
    The scale path for embedding dedup (per-batch work O(bucket), the
    corpus is never broadcast): recall < 1 by design (P[miss] =
    (1 - p^r)^b with p = 1 - theta/pi), pytest pins recall vs the
    exact operator on near-identical pairs; rows-only driver check."""
    import pyarrow.parquet as pq
    import ray.data

    # dimension from file metadata only (no data read on the driver)
    schema = pq.read_schema(f"{sf_dir}/embeddings.parquet")
    dim = schema.field("embedding").type.list_size if hasattr(schema.field("embedding").type, "list_size") else None
    if not dim:
        t0 = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").read_row_group(0, columns=["embedding"])
        dim = len(t0["embedding"][0])
    rng = np.random.default_rng(seed)
    R = rng.standard_normal((dim, nplanes))
    bands = nplanes // band_bits
    weights = (1 << np.arange(band_bits, dtype=np.uint64)).astype(np.uint64)

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def sig_stage(batch: pa.Table) -> pa.Table:
        M = emb_matrix(batch["embedding"])
        bits = (M @ R) >= 0  # (n, nplanes)
        ids = batch["vec_id"].to_numpy()
        band_id, band_key, doc = [], [], []
        for bi in range(bands):
            chunk = bits[:, bi * band_bits : (bi + 1) * band_bits].astype(np.uint64)
            keys = (chunk * weights[None, :]).sum(axis=1)
            band_id.extend([bi] * len(ids))
            band_key.extend(int(k) for k in keys)
            doc.extend(int(i) for i in ids)
        return pa.table(
            {"band_id": pa.array(band_id, pa.int32()), "band_key": pa.array(band_key, pa.int64()), "doc_id": pa.array(doc, pa.int64())}
        )

    def packed_vecs(batch: pa.Table) -> pa.Table:
        M = emb_matrix(batch["embedding"])
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        return pa.table({"doc_id": batch["vec_id"], "sig": pa.array([row.tobytes() for row in M], pa.binary())})

    def bucket_pairs(group: pa.Table) -> pa.Table:
        prs = _pairs_from_group(group["doc_id"].to_numpy())
        return pa.table({"a": pa.array([p[0] for p in prs], pa.int64()), "b": pa.array([p[1] for p in prs], pa.int64())})

    cand = _dedup_pairs_ds(
        ds.map_batches(sig_stage, batch_format="pyarrow").groupby(["band_id", "band_key"]).map_groups(bucket_pairs, batch_format="pyarrow")
    )
    vecs = ds.map_batches(packed_vecs, batch_format="pyarrow")
    j = cand.join(vecs, join_type="inner", num_partitions=8, on=("a",), right_on=("doc_id",))
    j = j.join(vecs, join_type="inner", num_partitions=8, on=("b",), right_on=("doc_id",), right_suffix="_b")

    def verify(batch: pa.Table) -> pa.Table:
        keep = []
        for sa, sb in zip(batch["sig"].to_pylist(), batch["sig_b"].to_pylist()):
            va = np.frombuffer(sa, dtype=np.float64)
            vb = np.frombuffer(sb, dtype=np.float64)
            keep.append(float(va @ vb) >= threshold)
        return batch.filter(pa.array(keep)).select(["a", "b"])

    return verify_sorted(j.map_batches(verify, batch_format="pyarrow"))
