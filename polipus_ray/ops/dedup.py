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

# max ids per sub-block in bounded candidate-pair generation: a hot
# bucket is split into sub-blocks of this size, so no single row/task
# materializes O(m^2) pairs (one degenerate band key at corpus scale
# would otherwise emit billions of pairs from one task)
_PAIR_CHUNK = 512


_JOIN_ROWS_PER_PARTITION = 250_000


def sorted_member(keys_sorted: np.ndarray, queries: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Membership of ``queries`` in a SORTED key array: returns
    ``(hit, pos)`` where ``pos`` is the clamped searchsorted position
    (valid to index ``keys_sorted`` wherever ``hit``).  The one probe
    idiom behind every ray.put broadcast join/anti-join/filter here —
    keep the clamp logic in one place."""
    if not len(keys_sorted):
        return np.zeros(len(queries), bool), np.zeros(len(queries), np.int64)
    pos = np.searchsorted(keys_sorted, queries)
    np.clip(pos, 0, len(keys_sorted) - 1, out=pos)
    return keys_sorted[pos] == queries, pos


def join_partitions(rows: int | None = None, floor: int = 8) -> int:
    """Partition count for Dataset joins, derived from the join input
    size (~250k rows/partition) and clamped to [floor, 4x cluster
    CPUs] — replaces the old hardcoded 8, which starves at scale.
    Also not simply "many": Ray's hash join reserves an
    aggregator-actor memory budget PER PARTITION, so oversizing
    partitions on a small cluster stalls scheduling instead of adding
    parallelism (measured: 64 partitions deadlocks a 32-CPU node with
    two concurrent joins; and per-partition actor spin-up costs ~0.1 s
    each on an idle run).  ``POLIPUS_JOIN_PARTITIONS`` overrides for
    cluster tuning."""
    import os

    env = os.environ.get("POLIPUS_JOIN_PARTITIONS")
    if env:
        return int(env)
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
    except Exception:  # pragma: no cover — defensive: never fail a pipeline on introspection
        cpus = 0
    cap = max(floor, 4 * cpus) if cpus else floor
    if rows is None:
        return min(max(floor, cpus), cap)
    want = rows // _JOIN_ROWS_PER_PARTITION + 1
    if want < floor:
        # tiny join: each hash-join partition spins up an aggregator
        # ACTOR (~0.1-0.3 s each, plus its worker process) — 8-way
        # partitioning a <250k-row join is pure spin-up cost (measured
        # ~1 s/join at sf0.01, and it trips raylet worker-count
        # warnings on small nodes)
        floor = 2
    return int(min(max(floor, want), cap))


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


def _shingles_batch(texts: list[str], n: int = 5) -> list[np.ndarray]:
    """Batched :func:`_shingles` — identical output (sorted-distinct
    md5-u64 char n-gram hashes per doc), no per-gram Python.

    ASCII docs (chars == bytes) go through the vectorized path: one
    byte buffer for the whole batch, n-wide sliding windows gathered by
    fancy index, windows packed into uint64 codes, ONE np.unique over
    the batch, one :func:`polipus_ray.ops.md5vec.md5_u64_fixed` pass
    over the unique grams, then a per-doc (doc, hash) lexsort-dedupe.
    Non-ASCII docs (where a char may be several bytes) fall back to
    the scalar path, preserving character-window semantics; n > 8
    falls back entirely (codes must fit uint64)."""
    if n > 8:
        return [_shingles(t, n) for t in texts]
    from polipus_ray.ops.md5vec import md5_u64_fixed

    out: list[np.ndarray | None] = [None] * len(texts)
    vec_idx: list[int] = []
    enc: list[bytes] = []
    for i, t in enumerate(texts):
        tl = t.lower()
        if len(tl) < n:
            tl = tl + " " * (n - len(tl))
        if tl.isascii():
            vec_idx.append(i)
            enc.append(tl.encode())
        else:
            out[i] = _shingles(t, n)
    d = len(enc)
    if d:
        lens = np.fromiter((len(b) for b in enc), np.int64, d)
        buf = np.frombuffer(b"".join(enc), np.uint8)
        counts = lens - n + 1  # >= 1: short docs were padded above
        offsets = np.cumsum(lens) - lens
        doc_of = np.repeat(np.arange(d), counts)
        cum = np.cumsum(counts) - counts
        within = np.arange(int(counts.sum())) - np.repeat(cum, counts)
        starts = offsets[doc_of] + within
        win = np.lib.stride_tricks.sliding_window_view(buf, n)[starts]  # (G, n) copy
        codes8 = np.zeros((len(win), 8), np.uint8)
        codes8[:, :n] = win
        codes = codes8.view("<u8").ravel()
        # unique + inverse via sort/searchsorted (np.unique's
        # return_inverse argsort is ~4x slower at this volume)
        uniq = np.unique(codes)
        inv = np.searchsorted(uniq, codes)
        uh = md5_u64_fixed(uniq.view(np.uint8).reshape(-1, 8)[:, :n])
        # per-doc sorted-distinct HASHES via one u64 key sort: remap
        # each gram to its hash's rank, pack (doc << 32 | rank), sort,
        # adjacent-dedupe.  rank order == hash order, so each doc's
        # slice comes out hash-sorted, matching np.unique in _shingles.
        hrank = np.empty(len(uniq), np.uint64)
        horder = np.argsort(uh)
        hrank[horder] = np.arange(len(uniq), dtype=np.uint64)
        key = (doc_of.astype(np.uint64) << np.uint64(32)) | hrank[inv]
        key.sort()
        gh = uh[horder][(key & np.uint64(0xFFFFFFFF)).astype(np.int64)]
        d_s = (key >> np.uint64(32)).astype(np.int64)
        first = np.ones(len(key), bool)
        # dedupe on (doc, hash) VALUE, not rank: two distinct grams
        # whose 64-bit hashes collide are rank-adjacent, so this also
        # collapses them exactly as np.unique over hashes would
        first[1:] = (d_s[1:] != d_s[:-1]) | (gh[1:] != gh[:-1])
        d_s, g_s = d_s[first], gh[first]
        bounds = np.searchsorted(d_s, np.arange(d + 1))
        for k, i in enumerate(vec_idx):
            out[i] = g_s[bounds[k] : bounds[k + 1]]
    return out  # type: ignore[return-value]


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


def _minhash_sig_many(sets: list[np.ndarray], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Batched :func:`_minhash_sig`, two structural savings over the
    per-doc path:

    - the (P, U) universal-hash matrix is computed once over the
      batch's UNIQUE gram hashes (U << total occurrences when the
      vocabulary repeats across docs), not per occurrence;
    - per-doc mins come from a row-gather + ``min(axis=0)`` over the
      (U, P) matrix — gather + SIMD min over the contiguous P-wide
      rows, no mul/mod per occurrence.  (Not ``minimum.reduceat``:
      its axis-0 segment loop runs scalar, measured 10x slower than
      the per-doc contiguous reduction.)

    The permutation matrix itself is built with an explicit loop over
    the P rows using ``out=`` buffers: numpy 1.26's uint64 broadcast
    ``a[:,None] * h[None,:]`` hits a scalar fallback ~80x slower than
    the per-row contiguous ufunc (measured 0.97 s vs 0.012 s at
    128 x 65k)."""
    d = len(sets)
    p = len(a)
    out = np.empty((d, p), np.uint64)
    if not d:
        return out
    counts = np.fromiter((len(s) for s in sets), np.int64, d)
    if (counts == 0).any():  # mirror the scalar path (which would also fail)
        raise ValueError("minhash over an empty shingle set")
    flat = np.concatenate(sets)
    uniq = np.unique(flat)
    inv = np.searchsorted(uniq, flat)
    h = uniq % np.uint64(_PRIME)
    # perms x unique-grams matrix, transposed so the per-doc gather
    # below reads contiguous 128-wide rows
    pu = np.empty((p, len(uniq)), np.uint64)
    for i in range(p):
        np.multiply(h, a[i], out=pu[i])
        np.add(pu[i], b[i], out=pu[i])
        np.remainder(pu[i], np.uint64(_PRIME), out=pu[i])
    put = np.ascontiguousarray(pu.T)  # (U, P)
    bounds = np.concatenate([[0], np.cumsum(counts)])
    for k in range(d):
        out[k] = put[inv[bounds[k] : bounds[k + 1]]].min(axis=0)
    return out


def exact_dedup(sf_dir: str):
    """Keep min doc_id per exact text hash.  Oracle-SQL-checked.

    NOT ``groupby(text_hash).aggregate(Min)``: that makes one Ray
    group per DISTINCT DOCUMENT — unbounded at corpus scale, and Ray
    pays per-group overhead (the 72 s / 1.7M-group measurement in
    ``_dedup_pairs_ds``).  Rows hash-bucket on the digest's u64 prefix
    into a bounded group count; the digest travels as TWO int64
    columns so the per-bucket fold is one NUMERIC lexsort +
    first-of-run pick (= min doc_id per hash — no per-row Python
    strings in the shuffle or the sort), and only the winning rows are
    hex-encoded: the two native-order halves are written back into a
    uint64 array and round-trip through ONE ``bytes.hex()`` call
    (sliced per row) — the bytes were viewed in native order, so no
    byteswap is involved.  Digests come from the vectorized in-repo
    MD5 straight off the Arrow buffer (no per-row hashlib)."""
    import ray.data

    from .md5vec import md5_digest_arrow

    nb = 4 * join_partitions(None)
    mix = np.uint64(0x9E3779B97F4A7C15)

    def add_hash(batch: pa.Table) -> pa.Table:
        dig = md5_digest_arrow(batch["text"].combine_chunks())  # (n, 16) u8
        h2 = np.ascontiguousarray(dig).view(np.uint64).reshape(-1, 2)  # little-endian halves
        pk = ((h2[:, 0] * mix) >> np.uint64(17)) % np.uint64(nb)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "h1": pa.array(h2[:, 0].view(np.int64), pa.int64()),
                "h2": pa.array(h2[:, 1].view(np.int64), pa.int64()),
                "pk": pa.array(pk.astype(np.int32), pa.int32()),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        h1 = group["h1"].to_numpy()
        h2 = group["h2"].to_numpy()
        d = group["doc_id"].to_numpy()
        order = np.lexsort((d, h2, h1))
        h1, h2, d = h1[order], h2[order], d[order]
        first = np.ones(len(d), bool)
        first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        h1, h2, d = h1[first], h2[first], d[first]
        dig = np.empty((len(d), 2), np.uint64)
        dig[:, 0] = h1.view(np.uint64)
        dig[:, 1] = h2.view(np.uint64)
        whole = dig.tobytes().hex()  # same byte order the halves were viewed from
        hs = [whole[i << 5 : (i + 1) << 5] for i in range(len(d))]
        return pa.table({"text_hash": pa.array(hs, pa.string()), "doc_id": pa.array(d, pa.int64())})

    ds = _docs_read(sf_dir)
    return ds.map_batches(add_hash, batch_format="pyarrow").groupby("pk").map_groups(fold, batch_format="pyarrow")


_PAIR_BUDGET = 1_000_000  # max pairs one descriptor row may expand to


def _mix_tag(batch: pa.Table, keys: list[str], nb: int) -> pa.Table:
    """Append the bounded hash-bucket column ``pk`` mixed from one or
    more int64 key columns — the multi-key sibling of
    ``windows._bucket_tag`` (same golden-ratio mixing), shared by
    every pair-generation pipeline here so the scheme changes in one
    place."""
    mix = np.uint64(0x9E3779B97F4A7C15)
    acc = np.zeros(batch.num_rows, np.uint64)
    for k in keys:
        v = batch[k].to_numpy()
        v = v.view(np.uint64) if v.dtype == np.int64 else v.astype(np.uint64)
        acc = (acc * mix) ^ v
    pk = ((acc * mix) >> np.uint64(17)) % np.uint64(nb)
    return batch.append_column("pk", pa.array(pk.astype(np.int32), pa.int32()))


def _bucket_segments(group: pa.Table, keys: list[str], id_col: str = "doc_id", meta_cols: tuple = ()):
    """Lexsort one hash bucket into (key-tuple, doc) order, mark the
    key-segment boundaries, and collapse duplicate (segment, doc)
    rows.  Returns ``(d, meta, newseg)`` with ``meta`` an (n, m) int64
    sidecar (None when ``meta_cols`` is empty)."""
    n = group.num_rows
    kcols = [group[k].to_numpy() for k in keys]
    d = group[id_col].to_numpy().astype(np.int64, copy=False)  # tobytes()/frombuffer contract
    order = np.lexsort((d, *kcols))
    d = d[order]
    kcols = [c[order] for c in kcols]
    meta = None
    if meta_cols:
        meta = np.stack([group[c].to_numpy().astype(np.int64, copy=False)[order] for c in meta_cols], axis=1)
    newseg = np.zeros(n, bool)
    if n:
        newseg[0] = True
    for c in kcols:
        newseg[1:] |= c[1:] != c[:-1]
    keep = np.ones(n, bool)  # duplicate (segment, doc) rows collapse
    keep[1:] = newseg[1:] | (d[1:] != d[:-1])
    d, newseg = d[keep], newseg[keep]
    if meta is not None:
        meta = meta[keep]
    return d, meta, newseg


def _segment_descriptors(
    d: np.ndarray, meta, newseg: np.ndarray, cap: int = _PAIR_CHUNK, budget: int = _PAIR_BUDGET
) -> pa.Table:
    """Doc-sorted, segment-contiguous bucket rows -> NARROW descriptor
    rows, each expanding to <= max(budget, cap^2) candidate pairs in
    the downstream generator stage.  This keeps BOTH invariants: the
    r5 bounded GROUP count (the caller buckets on hashed keys, not raw
    band keys) and the r4 bounded PER-TASK OUTPUT (a degenerate bucket
    emits many small rows — bytes proportional to members — never one
    giant pair block; pinned by test_hot_bucket_bounded_split /
    test_descriptor_rows_bounded).

    kind 0: a run of whole small segments (ids + per-segment sizes),
    pair-budgeted; kind 1: one intra block of a hot (> cap) segment;
    kind 2: one cross block pair of a hot segment (ids in b all exceed
    ids in a — consecutive slices of a doc-sorted segment)."""
    mw = 0 if meta is None else meta.shape[1]
    rows: dict[str, list] = {"kind": [], "ids_a": [], "meta_a": [], "ids_b": [], "meta_b": [], "sizes": []}

    def add(kind, ia, ma, ib, mb, sz):
        rows["kind"].append(kind)
        rows["ids_a"].append(ia.tobytes())
        rows["meta_a"].append(b"" if ma is None else np.ascontiguousarray(ma).tobytes())
        rows["ids_b"].append(b"" if ib is None else ib.tobytes())
        rows["meta_b"].append(b"" if mb is None else np.ascontiguousarray(mb).tobytes())
        rows["sizes"].append(b"" if sz is None else np.ascontiguousarray(sz).tobytes())

    starts = np.flatnonzero(newseg)
    ends = np.concatenate([starts[1:], [len(d)]]) if len(starts) else np.empty(0, np.int64)
    sizes = ends - starts
    # singleton segments (the vast majority of LSH band values) can
    # never pair — drop them before any bytes are copied or shipped
    small = (sizes <= cap) & (sizes >= 2)
    if small.any():
        keep_rows = np.repeat(small, sizes)
        d_c = d[keep_rows]
        m_c = meta[keep_rows] if meta is not None else None
        s_sizes = sizes[small]
        pc = s_sizes * (s_sizes - 1) // 2
        cpc = np.cumsum(pc)
        coffs = np.cumsum(s_sizes)
        seg0 = 0
        base = 0
        while seg0 < len(s_sizes):
            seg1 = int(np.searchsorted(cpc, base + budget, side="right"))
            seg1 = max(seg1, seg0 + 1)
            r0 = int(coffs[seg0 - 1]) if seg0 else 0
            r1 = int(coffs[seg1 - 1])
            add(0, d_c[r0:r1], None if m_c is None else m_c[r0:r1], None, None, s_sizes[seg0:seg1])
            base = int(cpc[seg1 - 1])
            seg0 = seg1
    hot = sizes > cap
    for s0, s1 in zip(starts[hot], ends[hot]):
        logger.warning("hot segment: %d members via %d-block pairs", s1 - s0, -(-(s1 - s0) // cap))
        for i in range(s0, s1, cap):
            ei = min(i + cap, s1)
            add(1, d[i:ei], None if meta is None else meta[i:ei], None, None, None)
            for j in range(i + cap, s1, cap):
                ej = min(j + cap, s1)
                add(2, d[i:ei], None if meta is None else meta[i:ei], d[j:ej], None if meta is None else meta[j:ej], None)
    return pa.table(
        {
            "kind": pa.array(rows["kind"], pa.int8()),
            "ids_a": pa.array(rows["ids_a"], pa.binary()),
            "meta_a": pa.array(rows["meta_a"], pa.binary()),
            "ids_b": pa.array(rows["ids_b"], pa.binary()),
            "meta_b": pa.array(rows["meta_b"], pa.binary()),
            "sizes": pa.array(rows["sizes"], pa.binary()),
            "mw": pa.array([mw] * len(rows["kind"]), pa.int8()),
        }
    )


def _expand_pair_descriptors(batch: pa.Table, filt=None):
    """Descriptor rows -> (a, b) candidate pair tables, one yield per
    row so no output block exceeds ~max(budget, cap^2) pairs
    (generator map_batches with a small batch_size — the r4 two-stage
    discipline).  ``filt(meta_left, meta_right) -> keep mask`` applies
    the family predicate (PPJoin positional/length, Hamming budget);
    None keeps every constructed pair."""
    emitted = False
    for k, ia, ma, ib, mb, sz, mw in zip(
        batch["kind"].to_pylist(),
        batch["ids_a"].to_pylist(),
        batch["meta_a"].to_pylist(),
        batch["ids_b"].to_pylist(),
        batch["meta_b"].to_pylist(),
        batch["sizes"].to_pylist(),
        batch["mw"].to_pylist(),
    ):
        da = np.frombuffer(ia, np.int64)
        meta_a = np.frombuffer(ma, np.int64).reshape(len(da), mw) if mw else None
        db = meta_b = None
        if k == 0:
            s_sizes = np.frombuffer(sz, np.int64)
            s_starts = np.cumsum(s_sizes) - s_sizes
            elem_start = np.repeat(s_starts, s_sizes)
            m = len(da)
            w = np.arange(m) - elem_start
            p_total = int(w.sum())
            if not p_total:
                continue
            right = np.repeat(np.arange(m), w)
            offs = np.cumsum(w) - w
            left = np.arange(p_total) - np.repeat(offs, w) + np.repeat(elem_start, w)
        elif k == 1:
            left, right = np.triu_indices(len(da), 1)
            if not len(left):
                continue
        else:
            db = np.frombuffer(ib, np.int64)
            meta_b = np.frombuffer(mb, np.int64).reshape(len(db), mw) if mw else None
            left = np.repeat(np.arange(len(da)), len(db))
            right = np.tile(np.arange(len(db)), len(da))
        if k == 2:
            A, B = da[left], db[right]
            mL = meta_a[left] if meta_a is not None else None
            mR = meta_b[right] if meta_b is not None else None
        else:
            A, B = da[left], da[right]
            mL = meta_a[left] if meta_a is not None else None
            mR = meta_a[right] if meta_a is not None else None
        if filt is not None:
            okm = filt(mL, mR)
            if not okm.all():
                A, B = A[okm], B[okm]
        if len(A):
            emitted = True
            yield pa.table({"a": pa.array(A, pa.int64()), "b": pa.array(B, pa.int64())})
    if not emitted:  # keep the schema observable for downstream stages
        yield pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})


def _pp_filter(threshold: float):
    """PPJoin positional + length occurrence filter (Xiao et al.,
    WWW'08).  meta rows are (set_size, prefix_pos); a pair meeting at
    a gram at 0-based positions i in X and j in Y can overlap at most
    ``min(|X|-i, |Y|-j)`` counting the gram itself, and J >= t needs
    overlap >= t/(1+t)*(|X|+|Y|).  Safe per-occurrence: the FIRST
    common gram of any true pair lies in both prefixes (O >= t|X|
    bounds its position) and passes the bound exactly; later shared
    grams may fail it, which only removes duplicate emissions of the
    same pair.  1e-9 slack keeps the float boundary conservative
    (verify downstream is exact)."""
    q = threshold / (1.0 + threshold)

    def filt(mL: np.ndarray, mR: np.ndarray) -> np.ndarray:
        ssum = mL[:, 0] + mR[:, 0]
        ok = np.minimum(mL[:, 0] - mL[:, 1], mR[:, 0] - mR[:, 1]) >= q * ssum - 1e-9
        ok &= np.minimum(mL[:, 0], mR[:, 0]) * (1.0 + threshold) >= threshold * ssum - 1e-9
        return ok

    return filt


def _hamming_filter(max_hamming: int):
    """popcount(xor(sig_a, sig_b)) <= max_hamming, elementwise on the
    pair arrays via the byte-popcount LUT."""

    def filt(mL: np.ndarray, mR: np.ndarray) -> np.ndarray:
        x = np.ascontiguousarray(mL[:, 0] ^ mR[:, 0])
        bv = x.view(np.uint8).reshape(len(x), 8)
        return _POPCOUNT8[bv].sum(axis=1, dtype=np.uint16) <= max_hamming

    return filt


def _bucketed_candidate_pairs(banded, keys: list[str], meta_cols: tuple = (), id_col: str = "doc_id", filt=None):
    """Banded rows -> candidate (a, b) pairs with a < b, through a
    BOUNDED hash-bucket shuffle (band-key cardinality is unbounded at
    corpus scale and Ray pays per-group overhead), per-bucket
    segment-vectorized descriptor emission (bytes ∝ members), and a
    generator expansion stage whose per-task output is pair-budgeted
    (batch_size=8 -> <= 8 * max(budget, cap^2) pairs per task)."""
    nb = 4 * join_partitions(None)

    def bucket(group: pa.Table) -> pa.Table:
        d, meta, newseg = _bucket_segments(group, keys, id_col, meta_cols)
        return _segment_descriptors(d, meta, newseg)

    desc = (
        banded.map_batches(lambda b: _mix_tag(b, keys, nb), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(bucket, batch_format="pyarrow")
    )
    return desc.map_batches(lambda b: _expand_pair_descriptors(b, filt), batch_format="pyarrow", batch_size=8)


def _pairs_via_descriptors(group: pa.Table, keys: list[str], meta_cols: tuple = (), id_col: str = "doc_id", filt=None, cap: int = _PAIR_CHUNK, budget: int = _PAIR_BUDGET) -> pa.Table:
    """Pure-local composition of the two stages (unit-test harness)."""
    d, meta, newseg = _bucket_segments(group, keys, id_col, meta_cols)
    desc = _segment_descriptors(d, meta, newseg, cap, budget)
    return pa.concat_tables(list(_expand_pair_descriptors(desc, filt)))


def banded_hamming_pairs(banded, keys: list[str], id_col: str, sig_col: str, max_hamming: int):
    """Banded signatures -> Hamming-verified deduped (a, b) pairs with
    a < b, via the bounded-bucket descriptor pipeline."""
    pairs = _bucketed_candidate_pairs(banded, keys, meta_cols=(sig_col,), id_col=id_col, filt=_hamming_filter(max_hamming))
    return _dedup_pairs_ds(pairs)


def _banded_pairs(banded, keys: list[str], dedup: bool = True):
    """Banded rows -> candidate (a, b) pairs with a < b, via the
    bounded-bucket descriptor pipeline.  ``dedup=False`` returns the
    raw (multi-band duplicated) pairs for consumers that fold the
    distinct into their own later stage (e.g. the adaptive Jaccard
    verify, which dedups driver-side below its size limit — skipping
    a full shuffle)."""
    pairs = _bucketed_candidate_pairs(banded, keys)
    return _dedup_pairs_ds(pairs) if dedup else pairs


def band_ranges(max_hamming: int, bits: int = 64) -> list[tuple[int, int]]:
    """(offset, width) bit-ranges for lossless Hamming banding: with
    ``max_hamming + 1`` bands, any pair within Hamming <= max_hamming
    leaves at least one band untouched (pigeonhole), so banded
    candidates == brute-force all-pairs for ANY max_hamming — no
    best-effort regime.  For max_hamming=3 this is the classic 4x16
    split."""
    nb = max_hamming + 1
    w, r = divmod(bits, nb)
    out, off = [], 0
    for i in range(nb):
        wd = w + (1 if i < r else 0)
        out.append((off, wd))
        off += wd
    return out


_POPCOUNT8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1).astype(np.uint8)


def hamming_pairs_vec(uniq_ids: np.ndarray, hs: np.ndarray, max_hamming: int, chunk: int = 2048):
    """All (a, b) id pairs with popcount(h_a ^ h_b) <= max_hamming —
    vectorized byte-popcount LUT over block pairs, so memory stays
    O(chunk^2) however large the bucket.  ``uniq_ids`` must be sorted
    unique int64; ``hs`` the matching uint64 signatures."""
    m = len(uniq_ids)
    if m < 2:
        return np.array([], np.int64), np.array([], np.int64)
    bv = np.ascontiguousarray(hs, dtype=np.uint64).view(np.uint8).reshape(m, 8)
    A, B = [], []
    for s1 in range(0, m, chunk):
        e1 = min(s1 + chunk, m)
        for s2 in range(s1, m, chunk):
            e2 = min(s2 + chunk, m)
            x = bv[s1:e1, None, :] ^ bv[None, s2:e2, :]  # (c1, c2, 8)
            d = _POPCOUNT8[x].sum(axis=2, dtype=np.uint16)
            ii, jj = np.nonzero(d <= max_hamming)
            if s1 == s2:
                sel = jj > ii
                ii, jj = ii[sel], jj[sel]
            if len(ii):
                A.append(uniq_ids[ii + s1])
                B.append(uniq_ids[jj + s2])
    if not A:
        return np.array([], np.int64), np.array([], np.int64)
    return np.concatenate(A), np.concatenate(B)


def _distinct_ab(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized distinct over parallel (a, b) int64 arrays:
    lexsort + adjacent-diff mask (no per-pair Python)."""
    order = np.lexsort((b, a))
    a_s, b_s = a[order], b[order]
    keep = np.ones(len(a_s), dtype=bool)
    keep[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
    return a_s[keep], b_s[keep]


def _dedup_pairs_ds(pairs_ds):
    """Distinct (a, b) pairs.  Two stages, both vectorized:

    - map-side combine: each block drops its own duplicates and tags
      survivors with a mixed-hash bucket ``pk`` (bounded, cpu-derived
      count) — same-pair rows from different bands/blocks all land in
      one bucket;
    - ``groupby(pk).map_groups``: lexsort adjacent-diff distinct per
      bucket.

    NOT ``groupby(["a","b"]).aggregate(Count)``: a pair-dedup makes one
    GROUP PER DISTINCT PAIR, and Ray's aggregate pays per-group
    overhead — measured 72 s for a 4.2M-pair / 1.7M-group dedup at 32
    CPUs vs ~2 s through this bounded-bucket path (the shuffle moves
    the same rows either way; the group count is what kills it)."""
    nb = join_partitions(None)
    mix = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier

    def local(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy()
        b = batch["b"].to_numpy()
        a, b = _distinct_ab(a, b)
        pk = ((a.view(np.uint64) * mix) ^ b.view(np.uint64)) % np.uint64(nb)
        return pa.table(
            {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()), "pk": pa.array(pk.astype(np.int32), pa.int32())}
        )

    def bucket_distinct(group: pa.Table) -> pa.Table:
        a, b = _distinct_ab(group["a"].to_numpy(), group["b"].to_numpy())
        return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})

    return (
        pairs_ds.map_batches(local, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(bucket_distinct, batch_format="pyarrow")
    )


def _docs_read(sf_dir: str):
    import ray.data

    path = f"{sf_dir}/documents.parquet"
    return ray.data.read_parquet(path, columns=["doc_id", "text"], override_num_blocks=small_read_blocks(path))


def _emb_read(sf_dir: str):
    import ray.data

    path = f"{sf_dir}/embeddings.parquet"
    return ray.data.read_parquet(path, columns=["vec_id", "embedding"], override_num_blocks=small_read_blocks(path))


def _parquet_rows(path: str) -> int | None:
    """Row count from parquet footer metadata only (no data read) —
    sizes join partitioning without touching the data."""
    try:
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).metadata.num_rows
    except Exception:
        return None


def small_read_blocks(path: str) -> int | None:
    """``override_num_blocks`` for a parquet read: coalesce SMALL
    inputs so a 5k-row table doesn't fan out into 64 read tasks plus a
    64-partition sort shuffle — at sf0.1 that layout costs 4-5 s of
    ~20 ms scheduler ticks for <20 ms of actual compute (measured:
    exact_dedup 5.3 s -> ~1 s with an 8-block read).  Returns None
    (i.e. keep Ray's size-based default splitting) as soon as the
    row-derived partition count ``rows / 250k`` exceeds the
    :func:`join_partitions` clamp — for anything big enough that block
    SIZE, not task count, should drive the split.  At 100 TB this is
    always None, so the scale path is untouched."""
    rows = _parquet_rows(path)
    if rows is None:
        return None
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
    except Exception:  # pragma: no cover — defensive: never fail a pipeline on introspection
        cpus = 0
    cap = max(8, 4 * cpus) if cpus else 8
    want = rows // _JOIN_ROWS_PER_PARTITION + 1
    # floor of 8 (unlike the tiny-join floor of 2): read blocks feed
    # the vectorized map stages, where 8-way parallelism is still
    # worth 8 task launches
    return int(min(max(8, want), cap)) if want <= cap else None


def _pack_u64(arr: np.ndarray) -> bytes:
    return np.asarray(arr, dtype=np.uint64).tobytes()


def _unpack_u64(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype=np.uint64)


def _jaccard_keep(A: np.ndarray, sigs_a: list, sigs_b: list, threshold: float) -> np.ndarray:
    """Keep mask for pair rows by exact Jaccard of their (sorted
    unique uint64) gram sets.  NOT one ``intersect1d`` per pair: rows
    are grouped into runs sharing the same left doc, and each run does
    ONE ``searchsorted`` of its concatenated partner sets into the
    shared left set + one cumsum-difference for the per-partner
    intersection counts — the candidate generator emits many partners
    per doc, so the per-pair Python overhead amortizes to ~one C call
    per run."""
    m = len(A)
    keep = np.zeros(m, dtype=bool)
    if not m:
        return keep
    order = np.argsort(A, kind="stable")
    bounds = np.flatnonzero(np.diff(A[order])) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [m]])
    for s0, e0 in zip(starts, ends):
        rows = order[s0:e0]
        s1 = sigs_a[rows[0]]
        partners = [sigs_b[r] for r in rows]
        sizes = np.fromiter((len(p) for p in partners), np.int64, len(rows))
        offs = np.cumsum(sizes) - sizes
        cat = np.concatenate(partners) if sizes.sum() else np.empty(0, np.uint64)
        if len(cat) and len(s1):
            pos = np.searchsorted(s1, cat)
            np.clip(pos, 0, len(s1) - 1, out=pos)
            hits = s1[pos] == cat
            # segment sums via cumsum differences (exact for empty
            # segments, unlike reduceat's equal-offset quirk)
            c = np.concatenate([[0], np.cumsum(hits, dtype=np.int64)])
            inter = c[offs + sizes] - c[offs]
        else:
            inter = np.zeros(len(rows), np.int64)
        union = len(s1) + sizes - inter
        keep[rows] = np.where(union > 0, inter / np.maximum(union, 1), 1.0) >= threshold
    return keep


def _jaccard_verify_join(
    cand,
    sigs,
    threshold: float,
    num_partitions: int | None = None,
    rows: int | None = None,
    driver_id_limit: int = 20_000,
    driver_pair_limit: int = 2_000_000,
):
    """Exact-Jaccard verify of candidate pairs, adaptive (the same
    dual-path pattern as phash keep-first's driver_pair_limit):

    - small candidate sets (<= driver_id_limit distinct doc ids,
      ~50 MB of packed signatures): pull ONLY the candidate pairs +
      the candidate ids' signature rows driver-side (narrow, bounded)
      and verify vectorized — the distributed joins' fixed
      aggregator-actor spin-up dominates wall time at this volume
      (measured: ~6 s of an 8.7 s minhash run at 5k docs).
    - above the limit: distributed double hash join of the pairs
      against the (doc_id, sig:binary packed uint64 set) dataset —
      pairs and signatures both shuffle by key; nothing materializes
      on the driver or broadcasts whole (Arrow joins reject list
      columns, hence the packed-binary signature encoding).

    ``cand`` may carry multi-band duplicate pairs: the driver path
    dedups in numpy, the join path with the distinct-shuffle — so the
    small path never pays the extra groupby."""
    n_pairs = None
    if driver_id_limit > 0:
        cand = cand.materialize()
        n_pairs = cand.count()
        # pair rows are 16 B each — the driver can absorb far more PAIRS
        # than signature IDS (driver_pair_limit=2M is ~32 MB pulled; the
        # id gate below still bounds the signature pull), and at this
        # volume the distributed double join's aggregator spin-up
        # dominates wall time
        if n_pairs <= driver_pair_limit:
            pt = pa.concat_tables([pa.Table.from_pydict({"a": [], "b": []}, schema=pa.schema([("a", pa.int64()), ("b", pa.int64())]))] + [b for b in cand.iter_batches(batch_size=65536, batch_format="pyarrow")])
            A = pt["a"].to_numpy()
            B = pt["b"].to_numpy()
            if len(A):  # sorted-distinct (multi-band dup pairs fold here)
                o = np.lexsort((B, A))
                A, B = A[o], B[o]
                first = np.ones(len(A), dtype=bool)
                first[1:] = (A[1:] != A[:-1]) | (B[1:] != B[:-1])
                A, B = A[first], B[first]
            ids = np.unique(np.concatenate([A, B])) if len(A) else np.array([], np.int64)
            if len(ids) <= driver_id_limit:
                import ray.data

                def pick(batch: pa.Table) -> pa.Table:
                    return batch.filter(pa.array(np.isin(batch["doc_id"].to_numpy(), ids)))

                smap: dict[int, np.ndarray] = {}
                for blk in sigs.map_batches(pick, batch_format="pyarrow").iter_batches(batch_size=4096, batch_format="pyarrow"):
                    for did, sb in zip(blk["doc_id"].to_pylist(), blk["sig"].to_pylist()):
                        smap[did] = _unpack_u64(sb)
                # size-bound prefilter (PPJoin length filter): J >= t
                # REQUIRES min(|X|,|Y|)*(1+t) >= t*(|X|+|Y|) — a pure
                # O(1)-per-pair necessary condition, so pruning here
                # cannot drop a true pair (1e-6 slack keeps the float
                # boundary conservative).  At low thresholds the prefix
                # index admits dense candidates (~570k for 256 real
                # pairs at sf0.1 t=0.5) and this prunes most before any
                # intersection work.
                sz = np.zeros(len(ids), np.int64)
                for k_i, did in enumerate(ids):
                    sz[k_i] = len(smap[int(did)])
                sa = sz[np.searchsorted(ids, A)]
                sb_ = sz[np.searchsorted(ids, B)]
                pre = np.minimum(sa, sb_) * (1.0 + threshold) >= threshold * (sa + sb_) - 1e-6
                A1, B1 = A[pre], B[pre]
                keep = _jaccard_keep(A1, [smap[int(a)] for a in A1], [smap[int(b)] for b in B1], threshold)
                return ray.data.from_arrow(
                    pa.table({"a": pa.array(A1[keep], pa.int64()), "b": pa.array(B1[keep], pa.int64())})
                )
    # size the joins from their bigger side: the candidate pairs when
    # known (materialized above), else the corpus row count
    num_partitions = num_partitions or join_partitions(max(n_pairs or 0, rows or 0) or None)
    cand = _dedup_pairs_ds(cand)
    j = cand.join(sigs, join_type="inner", num_partitions=num_partitions, on=("a",), right_on=("doc_id",))
    j = j.join(sigs, join_type="inner", num_partitions=num_partitions, on=("b",), right_on=("doc_id",), right_suffix="_b")

    def verify(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # same size-bound prefilter as the driver path, from the packed
        # binary lengths (8 bytes per element) — no unpacking needed
        sa = pc.binary_length(batch["sig"]).to_numpy(zero_copy_only=False) // 8
        sb_ = pc.binary_length(batch["sig_b"]).to_numpy(zero_copy_only=False) // 8
        pre = np.minimum(sa, sb_) * (1.0 + threshold) >= threshold * (sa + sb_) - 1e-6
        if not pre.all():
            batch = batch.filter(pa.array(pre))
        sigs_a = [_unpack_u64(sb) for sb in batch["sig"].to_pylist()]
        sigs_b = [_unpack_u64(sb) for sb in batch["sig_b"].to_pylist()]
        keep = _jaccard_keep(batch["a"].to_numpy(), sigs_a, sigs_b, threshold)
        return batch.filter(pa.array(keep)).select(["a", "b"])

    return verify_sorted(j.map_batches(verify, batch_format="pyarrow"))


# verified-pair Datasets memoized per (ray session, sf_dir, params):
# dedup_clusters consumes the same pairs dedup_minhash_lsh produces, so
# one sweep should pay the band+verify pipeline once (mirrors the crawl
# memoizer, pipelines/crawl_queries.py).  Values are MATERIALIZED
# datasets — blocks live in the object store, not on the driver.
_MINHASH_PAIRS_CACHE: dict[tuple, object] = {}


def _ray_session_key() -> str:
    """Identify the CURRENT Ray instance: job id alone is not enough —
    a fresh cluster after ray.shutdown()/ray.init() reuses job ids
    (the first driver is always 01000000), which would hand back a
    materialized dataset whose blocks lived in the destroyed object
    store.  The driver's node id changes with every local raylet, so
    (node, job) is unique per live session."""
    try:
        import ray

        if not ray.is_initialized():
            return "uninit"
        ctx = ray.get_runtime_context()
        return f"{ctx.get_node_id()}:{ctx.get_job_id()}"
    except Exception:  # pragma: no cover — introspection must never fail a pipeline
        return "unknown"


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.8, num_perm: int = 128, bands: int = 16, ngram: int = 5, table=None, driver_id_limit: int = 20_000):
    """Near-dup pairs by MinHash-LSH, verified with exact Jaccard on
    char n-gram shingles.  Oracle-SQL-checked: band keys are the
    md5-u64 of the '_'-joined signature values and every hash is
    md5-derived, so the DuckDB oracle reproduces candidates AND
    verification exactly.  Verification is a distributed signature
    join — nothing is pulled to the driver or broadcast whole.
    Parquet-backed calls memoize their verified pairs per Ray session
    (``_MINHASH_PAIRS_CACHE``) so downstream consumers (e.g.
    ``dedup_clusters``) reuse them instead of recomputing."""
    import ray.data

    cache_key = None
    if table is None:
        import os as _os

        try:  # input-file identity: a regenerated corpus must not hit
            st = _os.stat(_os.path.join(sf_dir, "documents.parquet"))
            file_id = (st.st_mtime_ns, st.st_size)
        except OSError:
            file_id = None
        cache_key = (_ray_session_key(), _os.path.abspath(sf_dir), file_id, threshold, num_perm, bands, ngram, driver_id_limit)
        cached = _MINHASH_PAIRS_CACHE.get(cache_key)
        if cached is not None:
            return cached

    a, b = _minhash_params(num_perm)
    rows_per_band = num_perm // bands

    def shingle_sets(batch: pa.Table) -> pa.Table:
        # batched shingling: byte windows + one vectorized md5 pass
        # over the batch's unique grams (no per-gram Python)
        packed = [_pack_u64(s) for s in _shingles_batch(batch["text"].to_pylist(), ngram)]
        return pa.table({"doc_id": batch["doc_id"], "sig": pa.array(packed, pa.binary())})

    def band_stage(batch: pa.Table) -> pa.Table:
        # bands derived from the PACKED shingle sets: the expensive
        # shingling runs once total, not once per downstream pipeline.
        # band_key = md5-u64 of the '_'-joined signature chunk (not the
        # ~150 B string itself): ~10x fewer bytes through the banding
        # shuffle, still exactly replicable in SQL via
        # ('0x'||substr(md5(string_agg(v,'_' ORDER BY j)),1,16))::UBIGINT
        sets = [_unpack_u64(p) for p in batch["sig"].to_pylist()]
        sig_rows = _minhash_sig_many(sets, a, b).tolist()  # Python ints: str() is C-fast
        band_key = np.empty(len(sets) * bands, np.uint64)
        pos = 0
        for row in sig_rows:
            for bi in range(bands):
                band_key[pos] = _h64("_".join(map(str, row[bi * rows_per_band : (bi + 1) * rows_per_band])))
                pos += 1
        doc = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), bands)
        return pa.table(
            {
                "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), len(sets))),
                "band_key": pa.array(band_key.view(np.int64), pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
            }
        )

    ds = ray.data.from_arrow(table) if table is not None else _docs_read(sf_dir)
    # distributed materialize (object store, never the driver): the
    # sigs feed both the banding pipeline and the verify join
    sigs = ds.map_batches(shingle_sets, batch_format="pyarrow").materialize()
    cand = _banded_pairs(sigs.map_batches(band_stage, batch_format="pyarrow"), ["band_id", "band_key"], dedup=False)
    n_docs = table.num_rows if table is not None else _parquet_rows(f"{sf_dir}/documents.parquet")
    out = _jaccard_verify_join(cand, sigs, threshold, rows=n_docs, driver_id_limit=driver_id_limit)
    if cache_key is not None:
        out = out.materialize()
        _MINHASH_PAIRS_CACHE[cache_key] = out
    return out


def verify_sorted(ds):
    return ds.sort(["a", "b"])


def simhash64_batch(texts) -> np.ndarray:
    """Word-unigram 64-bit SimHash (weights 1, md5 word hashes) over a
    whole batch: ONE flat word-hash array for all docs, per-doc bit
    sums via ``np.add.reduceat`` over doc boundaries — no per-doc
    numpy allocation.  Bit i is set iff the doc's +1/-1 column sum is
    > 0, identical to the scalar definition."""
    words_per_doc = [t.lower().split() for t in texts]
    counts = np.fromiter((len(w) for w in words_per_doc), np.int64, len(words_per_doc))
    out = np.zeros(len(texts), np.uint64)
    flat = [w for ws in words_per_doc for w in ws]
    if not flat:
        return out
    hs = np.fromiter((_h64_cached(w) for w in flat), np.uint64, len(flat))
    # bit i of each hash via unpackbits on the little-endian byte view
    # (x86/ARM little-endian assumed; parity pinned by test_simhash_batch)
    b8 = hs.view(np.uint8).reshape(-1, 8)
    nz = np.flatnonzero(counts)
    cnz = counts[nz]
    ends = np.cumsum(cnz)
    offs = ends - cnz
    shifts = np.arange(64, dtype=np.uint64)
    parts = []
    CH = 8192  # words per chunk: the (CH, 64) uint8 bits stay cache-resident
    start = 0
    m = len(nz)
    while start < m:
        end = int(np.searchsorted(ends, offs[start] + CH, side="left")) + 1
        end = min(max(end, start + 1), m)
        lo, hi = int(offs[start]), int(ends[end - 1])
        bits = np.unpackbits(b8[lo:hi], axis=1, bitorder="little")
        bitsum = np.add.reduceat(bits, offs[start:end] - lo, axis=0, dtype=np.int64)
        acc = 2 * bitsum - cnz[start:end, None]
        parts.append(((acc > 0).astype(np.uint64) << shifts[None, :]).sum(axis=1, dtype=np.uint64))
        start = end
    out[nz] = np.concatenate(parts)
    return out


def simhash64(text: str) -> int:
    """Scalar wrapper over :func:`simhash64_batch` (shared kernel)."""
    return int(simhash64_batch([text])[0])


def simhash_pairs(sf_dir: str, max_hamming: int = 3, table=None):
    """Near-dup pairs by SimHash banding (``max_hamming + 1`` bands:
    pigeonhole guarantees any pair within the Hamming budget shares at
    least one exact band, for ANY max_hamming).  The banded result
    equals all-pairs Hamming<=max_hamming exactly, which is what the
    DuckDB oracle computes."""
    import ray.data

    ranges = band_ranges(max_hamming)

    def sig_stage(batch: pa.Table) -> pa.Table:
        # batch-vectorized simhash (one flat word-hash pass); the
        # band explode below is vectorized numpy over the doc axis
        u = simhash64_batch(batch["text"].to_pylist())
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(u)
        nb = len(ranges)
        band_val = np.concatenate(
            [((u >> np.uint64(off)) & np.uint64((1 << width) - 1)).astype(np.int64) for off, width in ranges]
        ) if n else np.empty(0, np.int64)
        return pa.table(
            {
                "band_id": pa.array(np.repeat(np.arange(nb, dtype=np.int32), n)),
                "band_val": pa.array(band_val, pa.int64()),
                "doc_id": pa.array(np.tile(ids, nb)),
                "simhash": pa.array(np.tile(u.view(np.int64), nb)),
            }
        )

    ds = ray.data.from_arrow(table) if table is not None else _docs_read(sf_dir)
    banded = ds.map_batches(sig_stage, batch_format="pyarrow")
    return verify_sorted(banded_hamming_pairs(banded, ["band_id", "band_val"], "doc_id", "simhash", max_hamming))


def _gram_hashes(text: str, n: int) -> np.ndarray:
    """Distinct word n-gram hashes (uint64, md5-derived)."""
    toks = text.lower().split()
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return np.unique(np.array([_h64_cached(g) for g in grams], dtype=np.uint64))


def _gram_hashes_batch(texts: list[str], n: int) -> list[np.ndarray]:
    """Batched :func:`_gram_hashes` — identical per-doc output with no
    per-gram Python.  A word n-gram of the space-normalized doc is a
    byte window of ``" ".join(tokens)``, so gram offsets/lengths are
    numpy cumsums over token lengths and ONE
    :func:`polipus_ray.ops.md5vec.md5_u64_concat` call hashes every
    gram in the batch straight off the concatenated buffer — no join,
    no encode, no dict per gram.  Non-ASCII docs fall back to the
    scalar path (byte windows need chars == bytes)."""
    from polipus_ray.ops.md5vec import md5_u64_concat

    out: list[np.ndarray | None] = [None] * len(texts)
    parts: list[bytes] = []
    gram_off: list[np.ndarray] = []
    gram_len: list[np.ndarray] = []
    vec_idx: list[int] = []
    base = 0
    for i, t in enumerate(texts):
        toks = t.lower().split()
        if not toks:
            out[i] = np.empty(0, np.uint64)
            continue
        normalized = " ".join(toks)
        if not normalized.isascii():
            out[i] = _gram_hashes(t, n)
            continue
        tl = np.fromiter((len(w) for w in toks), np.int64, len(toks))
        ends = np.cumsum(tl + 1) - 1  # token end offsets in normalized
        starts = ends - tl
        if len(toks) < n:
            offs = np.array([0], np.int64)
            lens = np.array([len(normalized)], np.int64)
        else:
            g = len(toks) - n + 1
            offs = starts[:g]
            lens = ends[n - 1 :] - offs
        parts.append(normalized.encode())
        gram_off.append(offs + base)
        gram_len.append(lens)
        vec_idx.append(i)
        base += len(normalized)
    if parts:
        buf = np.frombuffer(b"".join(parts), np.uint8)
        counts = np.fromiter((len(o) for o in gram_off), np.int64, len(gram_off))
        hashes = md5_u64_concat(buf, np.concatenate(gram_off), np.concatenate(gram_len))
        bounds = np.concatenate([[0], np.cumsum(counts)])
        for k, i in enumerate(vec_idx):
            out[i] = np.unique(hashes[bounds[k] : bounds[k + 1]])
    return out  # type: ignore[return-value]


def ngram_jaccard_pairs(sf_dir: str, n: int = 3, threshold: float = 0.5, table=None, driver_id_limit: int = 20_000):
    """Near-dup pairs via word n-gram Jaccard, exact.  Candidates come
    from a PREFIX-FILTERED inverted index (index each doc's smallest
    |X| - ceil(t*|X|) + 1 gram hashes; the AllPairs prefix filter
    guarantees any pair with J >= t shares an indexed gram) with the
    PPJoin POSITIONAL filter applied at pair generation (see
    ``_pp_filter``), then exact Jaccard verification via the
    distributed signature join.  Output == brute-force all-pairs
    Jaccard >= threshold, which is what the DuckDB oracle computes.

    Cost profile (sf0.1, t=0.5): the plain AllPairs prefix admitted
    ~570k distinct candidates for ~256 real pairs; the positional +
    length filters run O(1) per occurrence inside the bounded
    block-pair expansion and cut the verify join's input ~10x+ —
    candidate-side only, verify and oracle unchanged."""
    import ray.data

    def gram_sets(batch: pa.Table) -> pa.Table:
        # batched gram hashing: one md5 pass over byte windows of the
        # space-normalized docs (no per-gram Python)
        packed = [_pack_u64(g) for g in _gram_hashes_batch(batch["text"].to_pylist(), n)]
        return pa.table({"doc_id": batch["doc_id"], "sig": pa.array(packed, pa.binary())})

    def explode_prefix(batch: pa.Table) -> pa.Table:
        # prefix filter derived from the PACKED gram sets (already
        # sorted): each doc is gram-hashed once total, not once per
        # downstream pipeline — mirrors the minhash sigs reuse.
        # (set_size, prefix_pos) ride along for the positional filter.
        gh, doc, sz, ps = [], [], [], []
        for did, packed in zip(batch["doc_id"].to_pylist(), batch["sig"].to_pylist()):
            g = _unpack_u64(packed)
            plen = len(g) - int(np.ceil(threshold * len(g))) + 1 if len(g) else 0
            if plen:
                gh.append(g[:plen].view(np.int64))
                doc.append(np.full(plen, did, np.int64))
                sz.append(np.full(plen, len(g), np.int32))
                ps.append(np.arange(plen, dtype=np.int32))
        cat = lambda arrs, dt: np.concatenate(arrs) if arrs else np.empty(0, dt)
        return pa.table(
            {
                "gram": pa.array(cat(gh, np.int64), pa.int64()),
                "doc_id": pa.array(cat(doc, np.int64), pa.int64()),
                "sz": pa.array(cat(sz, np.int32), pa.int32()),
                "pos": pa.array(cat(ps, np.int32), pa.int32()),
            }
        )

    ds = ray.data.from_arrow(table) if table is not None else _docs_read(sf_dir)
    sigs = ds.map_batches(gram_sets, batch_format="pyarrow").materialize()
    # bounded-bucket descriptor pipeline (gram cardinality is unbounded
    # at corpus scale) with the PPJoin positional/length filter applied
    # at expansion
    cand = _bucketed_candidate_pairs(
        sigs.map_batches(explode_prefix, batch_format="pyarrow"), ["gram"], meta_cols=("sz", "pos"), filt=_pp_filter(threshold)
    )
    n_docs = table.num_rows if table is not None else _parquet_rows(f"{sf_dir}/documents.parquet")
    return _jaccard_verify_join(cand, sigs, threshold, rows=n_docs, driver_id_limit=driver_id_limit)


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

    ds = _emb_read(sf_dir)

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
        A: list[np.ndarray] = []
        B: list[np.ndarray] = []
        for r in block_refs:
            aid, full = ray.get(r)  # zero-copy plasma read, one block at a time
            sims = bm @ full.T
            ii, jj = np.nonzero(sims >= threshold)
            sel = aid[jj] > bids[ii]
            A.append(bids[ii[sel]])
            B.append(aid[jj[sel]])
        cat = lambda parts: np.concatenate(parts) if parts else np.empty(0, np.int64)
        return pa.table({"a": pa.array(cat(A), pa.int64()), "b": pa.array(cat(B), pa.int64())})

    import ray.data as rd

    src = rd.from_arrow_refs(raw_refs)
    return src.map_batches(stage, batch_format="pyarrow", batch_size=256).sort(["a", "b"])


def _emb_dim(sf_dir: str) -> int:
    """Embedding width from file metadata only (no data read on the
    driver; one row-group peek when the list type is unsized)."""
    import pyarrow.parquet as pq

    schema = pq.read_schema(f"{sf_dir}/embeddings.parquet")
    dim = schema.field("embedding").type.list_size if hasattr(schema.field("embedding").type, "list_size") else None
    if not dim:
        t0 = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").read_row_group(0, columns=["embedding"])
        dim = len(t0["embedding"][0])
    return dim


def _cosine_verify_pairs(sf_dir: str, ds, cand, threshold: float, dim: int):
    """Exact-cosine verification of candidate (a, b) pairs, shared by
    the sign-LSH and semantic (cluster-bucketed) embedding dedups.

    Adaptive dual path: when the normalized matrix fits a broadcast
    budget (~64 MB), ``ray.put`` it once and verify candidates with a
    row-gather + einsum inside map_batches — no vector shuffle at all
    (the joins move ~1 KB of packed vectors per PAIR, which dwarfs the
    corpus when banding degenerates).  Above the budget: distributed
    double hash join on packed float64 vectors."""
    n_vecs = _parquet_rows(f"{sf_dir}/embeddings.parquet") or 0

    if n_vecs and n_vecs * dim * 8 <= 64 << 20:
        import ray

        ids_all, M_all = [], []
        for blk in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            ids_all.append(blk["vec_id"].to_numpy())
            M = emb_matrix(blk["embedding"])
            M_all.append(M / np.linalg.norm(M, axis=1, keepdims=True))
        ids_cat = np.concatenate(ids_all)
        order = np.argsort(ids_cat)
        mref = ray.put((ids_cat[order], np.concatenate(M_all)[order]))

        def verify_bcast(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch.select(["a", "b"])
            ids_s, M = ray.get(mref)
            a = np.searchsorted(ids_s, batch["a"].to_numpy())
            b = np.searchsorted(ids_s, batch["b"].to_numpy())
            keep = np.einsum("ij,ij->i", M[a], M[b]) >= threshold
            return batch.filter(pa.array(keep)).select(["a", "b"])

        return verify_sorted(cand.map_batches(verify_bcast, batch_format="pyarrow"))

    def packed_vecs(batch: pa.Table) -> pa.Table:
        M = emb_matrix(batch["embedding"])
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        return pa.table({"doc_id": batch["vec_id"], "sig": pa.array([row.tobytes() for row in M], pa.binary())})

    vecs = ds.map_batches(packed_vecs, batch_format="pyarrow")
    nparts = join_partitions(max(cand.count(), n_vecs))
    j = cand.join(vecs, join_type="inner", num_partitions=nparts, on=("a",), right_on=("doc_id",))
    j = j.join(vecs, join_type="inner", num_partitions=nparts, on=("b",), right_on=("doc_id",), right_suffix="_b")

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(["a", "b"])
        # fixed-width packed float64 sigs: one frombuffer per column,
        # then a vectorized row-wise dot (no per-pair Python)
        A = np.frombuffer(b"".join(batch["sig"].to_pylist()), dtype=np.float64).reshape(batch.num_rows, -1)
        B = np.frombuffer(b"".join(batch["sig_b"].to_pylist()), dtype=np.float64).reshape(batch.num_rows, -1)
        keep = np.einsum("ij,ij->i", A, B) >= threshold
        return batch.filter(pa.array(keep)).select(["a", "b"])

    return verify_sorted(j.map_batches(verify, batch_format="pyarrow"))


def embedding_dup_pairs_lsh(sf_dir: str, threshold: float = 0.9, nplanes: int = 128, band_bits: int = 8, seed: int = 5):
    """Approximate near-dup pairs: sign-bit random-hyperplane LSH
    banding for candidates, exact cosine verify via distributed join.
    The scale path for embedding dedup (per-batch work O(bucket), the
    corpus is never broadcast): recall < 1 by design (P[miss] =
    (1 - p^r)^b with p = 1 - theta/pi), pytest pins recall vs the
    exact operator on near-identical pairs; rows-only driver check."""
    import ray.data

    dim = _emb_dim(sf_dir)
    rng = np.random.default_rng(seed)
    R = rng.standard_normal((dim, nplanes))
    bands = nplanes // band_bits
    weights = (1 << np.arange(band_bits, dtype=np.uint64)).astype(np.uint64)

    ds = _emb_read(sf_dir)

    def sig_stage(batch: pa.Table) -> pa.Table:
        M = emb_matrix(batch["embedding"])
        bits = (M @ R) >= 0  # (n, nplanes)
        ids = batch["vec_id"].to_numpy()
        n = len(ids)
        # (n, bands, band_bits) @ weights -> (n, bands) keys, flattened
        # band-major to match the exploded layout (no per-row Python)
        keys = bits.reshape(n, bands, band_bits).astype(np.uint64) @ weights
        return pa.table(
            {
                "band_id": pa.array(np.repeat(np.arange(bands, dtype=np.int32), n)),
                "band_key": pa.array(keys.T.reshape(-1).astype(np.int64)),
                "doc_id": pa.array(np.tile(ids, bands)),
            }
        )

    # the joins' bigger side is the CANDIDATE PAIRS, not the corpus
    # (degenerate banding can make pairs ~quadratic in corpus rows) —
    # size the hash-join partitions from the materialized pair count
    cand = _banded_pairs(ds.map_batches(sig_stage, batch_format="pyarrow"), ["band_id", "band_key"]).materialize()
    return _cosine_verify_pairs(sf_dir, ds, cand, threshold, dim)


def semantic_dup_pairs(sf_dir: str, threshold: float = 0.9, nlist: int = 8):
    """SemDeDup-style cluster-scoped near-dup pairs (Abbas et al. 2023,
    arXiv:2303.09540): deterministic k-means clusters over the
    embedding space are the candidate buckets — only same-cluster
    pairs are ever compared — then exact cosine >= ``threshold``
    verifies each candidate.  Complements the sign-LSH op: one coarse
    learned partition instead of many random bands, so candidate count
    scales with cluster occupancy (recall < 1 when a dup pair
    straddles a cluster boundary; pytest pins recall vs the exact op).

    Scale shape: k-means is trained once on a deterministic
    distributed sample (ann._ivf_sample — never a full-table driver
    read); assignment is one map-only matmul per batch against the
    broadcast (ray.put) centroid matrix; candidate pairs go through
    the shared bounded-bucket machinery (_banded_pairs), so a hot
    cluster is chunked into <= 512-id sub-blocks instead of one
    O(m^2) task; verification reuses the LSH op's broadcast-or-join
    dual path."""
    import ray
    import ray.data

    from polipus_ray.ops.ann import _ivf_sample, _kmeans

    dim = _emb_dim(sf_dir)
    C = _kmeans(_ivf_sample(sf_dir), nlist)
    cref = ray.put(C)

    def assign_stage(batch: pa.Table) -> pa.Table:
        C_ = ray.get(cref)
        M = emb_matrix(batch["embedding"])
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        cid = np.argmax(M @ C_.T, axis=1)  # first max == lowest cid on ties
        return pa.table(
            {
                "band_key": pa.array(cid.astype(np.int64), pa.int64()),
                "doc_id": batch["vec_id"],
            }
        )

    ds = _emb_read(sf_dir)
    cand = _banded_pairs(ds.map_batches(assign_stage, batch_format="pyarrow"), ["band_key"]).materialize()
    return _cosine_verify_pairs(sf_dir, ds, cand, threshold, dim)


def dedup_clusters(sf_dir: str, threshold: float = 0.8, driver_pair_limit: int = 1_000_000):
    """Cluster assignment for near-duplicate DOCUMENT groups — the
    dedup endgame every corpus pipeline runs after pair generation:
    connected components over the verified MinHash-LSH pair graph,
    each document labeled with its component's min doc_id, keep =
    (label == own id).

    Same dual component path as the phash image flow
    (ops/images.py): driver union-find below ``driver_pair_limit``
    pairs (pair sets are narrow groupby output), distributed min-label
    propagation above it — so no pair set ever has to fit on the
    driver.  Singletons label themselves.  Output: doc_id,
    cluster_id, keep.  Oracle: the MinHash pair SQL wrapped in a
    recursive min-label closure (__ray_entry__._clusters_oracle_sql)."""
    import ray.data

    pairs = minhash_lsh_pairs(sf_dir, threshold=threshold).materialize()
    n_pairs = pairs.count()
    path = f"{sf_dir}/documents.parquet"
    docs = ray.data.read_parquet(path, columns=["doc_id"], override_num_blocks=small_read_blocks(path))

    if n_pairs > driver_pair_limit:
        labels = _cc_labels_distributed(pairs, n_pairs=n_pairs)

        def mark_joined(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ids = batch["doc_id"].to_numpy()
            # singletons have no label row after the left_outer join
            lab = pc.coalesce(batch["label"], batch["doc_id"]).to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "cluster_id": pa.array(lab, pa.int64()),
                    "keep": pa.array(lab == ids, pa.bool_()),
                }
            )

        j = docs.join(
            labels,
            join_type="left_outer",
            num_partitions=join_partitions(n_pairs),
            on=("doc_id",),
            right_on=("node",),
        )
        return j.map_batches(mark_joined, batch_format="pyarrow").sort("doc_id")

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

    def mark(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        lab = np.fromiter((roots.get(int(i), int(i)) for i in ids), np.int64, len(ids))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "cluster_id": pa.array(lab, pa.int64()),
                "keep": pa.array(lab == ids, pa.bool_()),
            }
        )

    return docs.map_batches(mark, batch_format="pyarrow").sort("doc_id")


def min_label_fold(ds):
    """(node, label) rows -> one (node, min label) row per node,
    through a BOUNDED hash-bucket shuffle + per-bucket lexsort fold.
    NOT ``groupby(node).aggregate(Min)``: one Ray group per graph node
    is unbounded at corpus scale and pays per-group overhead (see
    ``_dedup_pairs_ds``)."""
    nb = 4 * join_partitions(None)

    def fold(group: pa.Table) -> pa.Table:
        n = group["node"].to_numpy()
        l = group["label"].to_numpy()
        order = np.lexsort((l, n))
        n, l = n[order], l[order]
        first = np.ones(len(n), bool)
        first[1:] = n[1:] != n[:-1]
        return pa.table({"node": pa.array(n[first], pa.int64()), "label": pa.array(l[first], pa.int64())})

    return (
        ds.map_batches(lambda b: _mix_tag(b.select(["node", "label"]), ["node"], nb), batch_format="pyarrow")
        .groupby("pk")
        .map_groups(fold, batch_format="pyarrow")
    )


def _cc_labels_distributed(pairs, n_pairs: int | None = None, max_iters: int = 25):
    """Min-label propagation over the pair graph returning the full
    (node, label) dataset — the labels twin of
    ops/images._cc_losers_distributed (same join + bounded-fold
    supersteps)."""
    import logging

    from ray.data.aggregate import Sum

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
    for _ in range(max_iters):
        nbr = edges.join(
            labels,
            join_type="inner",
            num_partitions=join_partitions(2 * n_pairs if n_pairs else None),
            on=("nbr",),
            right_on=("node",),
            right_suffix="_l",
        )
        prop = nbr.select_columns(["node", "label"]).union(labels)
        labels = min_label_fold(prop).materialize()
        s = labels.aggregate(Sum("label"))["sum(label)"]
        if s == prev_sum:
            break
        prev_sum = s
    else:
        logging.getLogger(__name__).warning("label propagation hit max_iters=%d without converging", max_iters)
    return labels
