"""Training-data operators vs brute-force / DuckDB oracles at sf0.001."""

import hashlib

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_exact_dedup_vs_duckdb(ray_session):
    from polipus_ray.ops.dedup import exact_dedup

    got = exact_dedup(SF).to_pandas().sort_values("text_hash").reset_index(drop=True)
    want = (
        duckdb.sql(f"SELECT md5(text) AS text_hash, min(doc_id) AS doc_id FROM read_parquet('{SF}/documents.parquet') GROUP BY 1 ORDER BY 1")
        .df()
        .reset_index(drop=True)
    )
    assert got["text_hash"].tolist() == want["text_hash"].tolist()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()


def _docs_with_dups() -> pa.Table:
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = t["text"].to_pylist()[:40]
    ids = list(range(40))
    # exact dup, near dup (token swap), and a prefix-trimmed near dup
    texts += [texts[0], texts[1].replace("the", "a", 1), texts[2][:-10]]
    ids += [1000, 1001, 1002]
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})


def _brute_jaccard_pairs(table, shingle_fn, threshold):
    rows = table.to_pylist()
    sets = {r["doc_id"]: shingle_fn(r["text"]) for r in rows}
    ids = sorted(sets)
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            s1, s2 = sets[ids[i]], sets[ids[j]]
            inter = np.intersect1d(s1, s2, assume_unique=True).size
            union = s1.size + s2.size - inter
            if union and inter / union >= threshold:
                out.append((ids[i], ids[j]))
    return sorted(out)


def test_minhash_lsh_vs_bruteforce(ray_session):
    from polipus_ray.ops.dedup import _shingles, minhash_lsh_pairs

    t = _docs_with_dups()
    got = [(r["a"], r["b"]) for r in minhash_lsh_pairs(SF, threshold=0.8, table=t).take_all()]
    want = _brute_jaccard_pairs(t, _shingles, 0.8)
    # LSH may miss borderline pairs but every returned pair is verified-true;
    # with these dups (J ~ 1.0) recall must be full
    assert got == want
    # the distributed join verify (the at-scale path above
    # driver_id_limit) must agree with the bounded driver verify
    got_join = [(r["a"], r["b"]) for r in minhash_lsh_pairs(SF, threshold=0.8, table=t, driver_id_limit=0).take_all()]
    assert got_join == want
    assert (1000 and (0, 1000) in got) and (1, 1001) in got


def test_simhash_pairs(ray_session):
    from polipus_ray.ops.dedup import simhash64, simhash_pairs

    t = _docs_with_dups()
    got = [(r["a"], r["b"]) for r in simhash_pairs(SF, max_hamming=3, table=t).take_all()]
    # brute force oracle
    rows = t.to_pylist()
    hs = {r["doc_id"]: simhash64(r["text"]) for r in rows}
    ids = sorted(hs)
    want = sorted(
        (ids[i], ids[j])
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if bin(hs[ids[i]] ^ hs[ids[j]]).count("1") <= 3
    )
    assert got == want
    assert (0, 1000) in got


def test_simhash_batch_matches_scalar_definition():
    """Pin the chunked unpackbits batch kernel (incl. the little-endian
    byte-view assumption) against the scalar +1/-1 column-sum
    definition, across chunk boundaries and empty docs."""
    import hashlib
    import random

    import numpy as np

    from polipus_ray.ops.dedup import simhash64_batch

    def scalar(text):
        ws = text.lower().split()
        if not ws:
            return 0
        hs = [int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big") for w in ws]
        out = 0
        for i in range(64):
            acc = sum(1 if (h >> i) & 1 else -1 for h in hs)
            if acc > 0:
                out |= 1 << i
        return out

    rng = random.Random(11)
    vocab = ["the", "cat", "dog"] + [str(i) for i in range(40)]
    texts = (
        ["", "single"]
        + [" ".join(rng.choices(vocab, k=rng.randint(1, 300))) for _ in range(200)]
        + [" ".join(rng.choices(vocab, k=9000))]  # one doc wider than the chunk
        + [""]
    )
    got = simhash64_batch(texts)
    want = np.array([scalar(t) for t in texts], dtype=np.uint64)
    assert (got == want).all()


def test_ngram_jaccard_pairs(ray_session):
    from polipus_ray.ops.dedup import _gram_hashes, ngram_jaccard_pairs

    t = _docs_with_dups()
    got = [(r["a"], r["b"]) for r in ngram_jaccard_pairs(SF, n=3, threshold=0.5, table=t).take_all()]
    assert (0, 1000) in got
    assert all(a < b for a, b in got)
    # exact parity vs brute-force all-pairs Jaccard: the AllPairs prefix
    # + PPJoin positional/length occurrence filters must not drop a true
    # pair at any threshold regime (q = t/(1+t) varies the bound)
    for thr in (0.3, 0.5, 0.8):
        got_t = sorted((r["a"], r["b"]) for r in ngram_jaccard_pairs(SF, n=3, threshold=thr, table=t).take_all())
        want_t = _brute_jaccard_pairs(t, lambda s: _gram_hashes(s, 3), thr)
        assert got_t == want_t, thr


def test_pp_pairs_bucket_block_fallback_matches_vectorized():
    """The hot-gram cap x cap block fallback and the pair-budget
    slicing in the descriptor pipeline must emit exactly the same
    filtered pairs as the single-slice vectorized path."""
    import random

    from polipus_ray.ops.dedup import _pairs_via_descriptors, _pp_filter

    rng = random.Random(7)
    gram, doc, sz, pos = [], [], [], []
    for gidx in range(6):
        members = rng.randint(2, 9)
        for m in range(members):
            gram.append(gidx)
            doc.append(gidx * 100 + m)
            size = rng.randint(4, 40)
            sz.append(size)
            pos.append(rng.randint(0, max(0, size // 2 - 1)))
    grp = pa.table(
        {
            "gram": pa.array(gram, pa.int64()),
            "doc_id": pa.array(doc, pa.int64()),
            "sz": pa.array(sz, pa.int32()),
            "pos": pa.array(pos, pa.int32()),
        }
    )
    as_set = lambda tb: sorted(zip(tb["a"].to_pylist(), tb["b"].to_pylist()))
    for thr in (0.3, 0.5, 0.8):
        run = lambda **kw: _pairs_via_descriptors(grp, ["gram"], meta_cols=("sz", "pos"), filt=_pp_filter(thr), **kw)
        big = run()  # all segments small, one budget slice
        forced_blocks = run(cap=3)  # every segment through block pairs
        forced_budget = run(budget=4)  # many kind-0 slices
        assert as_set(big) == as_set(forced_blocks), thr
        assert as_set(big) == as_set(forced_budget), thr
        assert all(a < b for a, b in as_set(big))


def test_embedding_dup_pairs_vs_duckdb(ray_session):
    from polipus_ray.ops.dedup import embedding_dup_pairs

    got = [(r["a"], r["b"]) for r in embedding_dup_pairs(SF, threshold=0.42).take_all()]
    want = duckdb.sql(
        f"""
        SELECT x.vec_id AS a, y.vec_id AS b
        FROM read_parquet('{SF}/embeddings.parquet') x, read_parquet('{SF}/embeddings.parquet') y
        WHERE x.vec_id < y.vec_id
          AND list_cosine_similarity(x.embedding, y.embedding) >= 0.42
        ORDER BY 1, 2
        """
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_embedding_lsh_recall_and_precision(ray_session):
    from polipus_ray.ops.dedup import embedding_dup_pairs, embedding_dup_pairs_lsh

    exact = {(r["a"], r["b"]) for r in embedding_dup_pairs(SF, threshold=0.42).take_all()}
    lsh = {(r["a"], r["b"]) for r in embedding_dup_pairs_lsh(SF, threshold=0.42, band_bits=4).take_all()}
    assert exact, "exact op should find pairs at this threshold"
    # every LSH pair is verified-true (precision 1); recall bounded below
    assert lsh <= exact
    assert len(lsh) / len(exact) >= 0.9, (len(lsh), len(exact))


def test_dedup_module_never_materializes_on_driver():
    # VERDICT r01: no UNBOUNDED whole-dataset driver materialization in
    # dedup ops.  The single allowed take_all is dedup_clusters' pair
    # union-find, which is gated on a counted pair limit (the same
    # adaptive driver/distributed dual path images.py uses).
    import inspect

    import polipus_ray.ops.dedup as m

    src = inspect.getsource(m)
    assert src.count("take_all") == 1
    assert "driver_pair_limit" in src  # the gate for that one use
    assert ".to_pandas()" not in src


def test_ann_bruteforce_vs_numpy(ray_session):
    from polipus_ray.ops.ann import ann_topk_bruteforce
    from polipus_ray.ops.dedup import emb_matrix

    k, nq = 5, 8
    got = ann_topk_bruteforce(SF, k=k, num_queries=nq).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    M = emb_matrix(t["embedding"])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    order = np.argsort(ids)
    for q in range(nq):
        qi = np.flatnonzero(ids == q)[0]
        sims = M @ M[qi]
        mask = ids != q
        cand = np.flatnonzero(mask)
        top = cand[np.lexsort((ids[cand], -sims[cand]))[:k]]
        want = ids[top].tolist()
        sub = got[got.query_id == q].sort_values("rank")
        assert sub["neighbor_id"].tolist() == want, q


def test_ann_ivf_recall(ray_session):
    from polipus_ray.ops.ann import ann_topk_bruteforce, ann_topk_ivf

    k, nq = 5, 8
    brute = ann_topk_bruteforce(SF, k=k, num_queries=nq).to_pandas()
    ivf = ann_topk_ivf(SF, k=k, num_queries=nq, nlist=8, nprobe=5).to_pandas()
    recalls = []
    for q in range(nq):
        b = set(brute[brute.query_id == q]["neighbor_id"])
        i = set(ivf[ivf.query_id == q]["neighbor_id"])
        recalls.append(len(b & i) / len(b))
    assert np.mean(recalls) >= 0.8, recalls


def test_token_and_quality_vs_duckdb(ray_session):
    from polipus_ray.ops.text import quality_stats, token_counts

    got = token_counts(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(
        f"SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, length(text) AS n_chars FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
    ).df()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()
    assert got["n_chars"].tolist() == want["n_chars"].tolist()
    q = quality_stats(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    wq = duckdb.sql(
        f"""SELECT doc_id,
              len(regexp_extract_all(lower(text), '\\b(the|and|of|a|to|in|is)\\b')) AS stop_cnt,
              len(regexp_extract_all(text, '[.!?,;:]')) AS punct_cnt
            FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"""
    ).df()
    assert q["stop_cnt"].tolist() == wq["stop_cnt"].tolist()
    assert q["punct_cnt"].tolist() == wq["punct_cnt"].tolist()


def test_lang_id_and_fingerprints(ray_session):
    from polipus_ray.ops.text import fingerprints, lang_id

    preds = lang_id(SF).to_pandas()
    assert len(preds) == 500 and set(preds.columns) == {"doc_id", "pred_lang"}
    assert preds["pred_lang"].notna().all()
    fp1 = fingerprints(SF).to_pandas().sort_values("doc_id")
    fp2 = fingerprints(SF).to_pandas().sort_values("doc_id")
    assert fp1["fingerprint"].tolist() == fp2["fingerprint"].tolist()  # deterministic
    assert fp1["fingerprint"].nunique() >= 450  # discriminative


def test_decode_stage_and_phash_neardup(ray_session, tmp_path):
    import ray.data

    from polipus_ray.ops.images import decode_stage, phash_neardup_keep_first
    from polipus_ray.synth.world import WorldSpec, decode_expected_table, make_web_table

    spec = WorldSpec()
    web = make_web_table(f"{SF}/documents.parquet", spec)
    ds = ray.data.from_arrow(web.select(["doc_id", "bytes", "phash"]))
    dec = decode_stage(ds, id_col="doc_id").to_pandas()
    assert dec["ok"].all() and dec["phash_ok"].all()
    # the batched DecodeVerify kernels must reproduce the generator's
    # SCALAR reference path row-for-row (the decode_verify fixture
    # oracle: lum quantized to integer centi-units, n_px exact)
    exp = decode_expected_table(f"{SF}/documents.parquet", spec).to_pandas()
    got = dec.sort_values("doc_id").reset_index(drop=True)
    exp = exp.sort_values("doc_id").reset_index(drop=True)
    assert (np.round(got["mean_lum"].to_numpy() * 100).astype(np.int64) == exp["lum_centi"].to_numpy()).all()
    assert (got["n_px"].to_numpy() == exp["n_px"].to_numpy()).all()
    assert exp["ok"].all() and exp["phash_ok"].all()
    marked = phash_neardup_keep_first(ray.data.from_arrow(web.select(["doc_id", "phash"])), id_col="doc_id").to_pandas()
    dropped = set(marked[~marked.keep]["doc_id"])
    # every generated near-dup row (i % 29 == 1) must be suppressed in
    # favor of its base row i-1 (unless the base itself lost to an
    # earlier member of the same component)
    nd = {i for i in web["doc_id"].to_pylist() if i % spec.neardup_mod == 1 and i > 0}
    assert nd, "world should contain near-dups"
    assert len(dropped & nd) >= len(nd) * 0.9
    keep_ids = set(marked[marked.keep]["doc_id"])
    assert 0 in keep_ids
    # the distributed components path (label propagation + anti-mark
    # join) must agree with the driver union-find exactly
    marked2 = phash_neardup_keep_first(
        ray.data.from_arrow(web.select(["doc_id", "phash"])), id_col="doc_id", driver_pair_limit=0
    ).to_pandas()
    got2 = dict(zip(marked2["doc_id"], marked2["keep"]))
    got1 = dict(zip(marked["doc_id"], marked["keep"]))
    assert got1 == got2


def test_phash_banding_recall(ray_session):
    """Pin the banding guarantee: max_hamming+1 pigeonhole bands make
    banded candidate generation LOSSLESS, so phash_neardup_pairs at
    its default equals brute-force all-pairs Hamming<=default."""
    import ray.data

    from polipus_ray.ops.dedup import hamming_pairs_vec
    from polipus_ray.ops.images import phash_neardup_pairs
    from polipus_ray.synth.world import WorldSpec, make_web_table

    web = make_web_table(f"{SF}/documents.parquet", WorldSpec())
    got = [(r["a"], r["b"]) for r in phash_neardup_pairs(ray.data.from_arrow(web.select(["doc_id", "phash"])), id_col="doc_id").take_all()]
    ids = web["doc_id"].to_numpy()
    hs = web["phash"].to_numpy().astype(np.int64).view(np.uint64)
    order = np.argsort(ids)
    A, B = hamming_pairs_vec(ids[order], hs[order], 4)  # brute force: all pairs, no banding
    want = sorted(zip(A.tolist(), B.tolist()))
    assert sorted(got) == want and len(want) > 0


def test_hamming_pairs_vec_matches_scalar():
    from polipus_ray.ops.dedup import hamming_pairs_vec
    from polipus_ray.synth.images import hamming64

    rng = np.random.default_rng(3)
    hs = rng.integers(0, 1 << 63, size=300, dtype=np.uint64)
    hs[50] = hs[10] ^ np.uint64(0b101)  # a close pair
    ids = np.arange(300, dtype=np.int64)
    A, B = hamming_pairs_vec(ids, hs, 6, chunk=64)  # chunk < n: exercise block tiling
    want = sorted(
        (i, j) for i in range(300) for j in range(i + 1, 300) if hamming64(int(hs[i]), int(hs[j])) <= 6
    )
    assert sorted(zip(A.tolist(), B.tolist())) == want
    assert (10, 50) in want


def test_hot_bucket_bounded_split(ray_session):
    """Degenerate band key (identical docs): the bounded bucket
    expansion must run the hot band through cap x cap block loops (no
    single O(m^2) allocation beyond cap^2) and still emit the exact
    pair set."""
    from polipus_ray.ops.dedup import _PAIR_CHUNK, _pairs_via_descriptors, _segment_descriptors, minhash_lsh_pairs

    n = 600  # > _PAIR_CHUNK so the block path engages end-to-end
    assert n > _PAIR_CHUNK
    t = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array(["the same boilerplate text about nothing at all"] * n, pa.string()),
        }
    )
    got = minhash_lsh_pairs(SF, threshold=0.8, table=t)
    assert got.count() == n * (n - 1) // 2  # every pair, exactly once

    # unit: hot-band block fallback == small-segment vectorized path,
    # and duplicate doc rows within one band collapse first
    grp = pa.table(
        {
            "band": pa.array([0] * 9 + [1] * 4, pa.int64()),
            "doc_id": pa.array([3, 1, 4, 1, 5, 9, 2, 6, 5, 7, 8, 7, 9], pa.int64()),
        }
    )
    fast = _pairs_via_descriptors(grp, ["band"])
    forced = _pairs_via_descriptors(grp, ["band"], cap=3)
    as_set = lambda tb: sorted(zip(tb["a"].to_pylist(), tb["b"].to_pylist()))
    assert as_set(fast) == as_set(forced)
    assert all(a < b for a, b in as_set(fast))
    # band 0 docs {1,2,3,4,5,6,9} -> 21 pairs; band 1 {7,8,9} -> 3
    assert len(as_set(fast)) == 21 + 3




def test_descriptor_rows_bounded():
    """Bounded per-task OUTPUT invariant (the r4 two-stage guarantee):
    a 10k-member degenerate segment emits O((m/cap)^2) NARROW
    descriptor rows (each block <= cap ids), never pair rows; a bucket
    of many medium segments slices kind-0 rows by the pair budget; and
    singleton segments (most LSH band values) are dropped before any
    bytes are copied."""
    from polipus_ray.ops.dedup import _PAIR_BUDGET, _PAIR_CHUNK, _segment_descriptors

    ids = np.arange(10_000, dtype=np.int64)
    newseg = np.zeros(10_000, bool)
    newseg[0] = True
    rows = _segment_descriptors(ids, None, newseg)
    nch = (10_000 + _PAIR_CHUNK - 1) // _PAIR_CHUNK
    assert rows.num_rows == nch * (nch + 1) // 2
    assert max(len(x) for x in rows["ids_a"].to_pylist()) <= _PAIR_CHUNK * 8
    # 1000 segments of 100 members = 4.95M pairs -> >= 5 budget slices
    ids2 = np.arange(100_000, dtype=np.int64)
    newseg2 = np.zeros(100_000, bool)
    newseg2[::100] = True
    rows2 = _segment_descriptors(ids2, None, newseg2)
    assert rows2.num_rows >= 5
    per_row_segs = [len(np.frombuffer(s, np.int64)) for s in rows2["sizes"].to_pylist()]
    per_row_pairs = [n * 100 * 99 // 2 for n in per_row_segs]
    assert max(per_row_pairs) <= _PAIR_BUDGET + 100 * 99 // 2  # one segment may straddle
    # all-singleton bucket -> ZERO descriptor rows (nothing can pair)
    ids3 = np.arange(5_000, dtype=np.int64)
    rows3 = _segment_descriptors(ids3, None, np.ones(5_000, bool))
    assert rows3.num_rows == 0


def test_descriptor_pipeline_accepts_int32_ids():
    """id columns of any integer dtype must survive the tobytes /
    frombuffer round trip (regression: int32 doc_id corrupted or
    crashed the expansion)."""
    from polipus_ray.ops.dedup import _pairs_via_descriptors

    grp = pa.table(
        {
            "band": pa.array([0, 0, 0, 0], pa.int64()),
            "doc_id": pa.array([4, 2, 7, 5], pa.int32()),
        }
    )
    out = _pairs_via_descriptors(grp, ["band"], id_col="doc_id")
    got = sorted(zip(out["a"].to_pylist(), out["b"].to_pylist()))
    assert got == [(2, 4), (2, 5), (2, 7), (4, 5), (4, 7), (5, 7)]


def test_hamming_hot_bucket_bounded_split(ray_session):
    """A degenerate simhash bucket (identical signatures) must run
    through the bounded block-pair path — no single map_groups task
    does O(m^2) popcount work or emits O(m^2) pairs — and still emit
    the exact pair set."""
    from polipus_ray.ops.dedup import _hamming_filter, _pairs_via_descriptors, simhash_pairs

    n = 1500  # ~3 sub-blocks per band bucket
    t = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array(["identical boilerplate page body"] * n, pa.string()),
        }
    )
    got = simhash_pairs(SF, max_hamming=3, table=t)
    assert got.count() == n * (n - 1) // 2  # every pair, exactly once

    # unit: block fallback == elementwise small-segment path on mixed
    # random signatures, at every threshold regime
    rng = np.random.default_rng(3)
    m = 40
    grp = pa.table(
        {
            "band": pa.array([0] * m + [1] * (m // 2), pa.int64()),
            "doc_id": pa.array(list(range(m)) + list(range(100, 100 + m // 2)), pa.int64()),
            "sig": pa.array(rng.integers(0, 1 << 16, size=m + m // 2, dtype=np.uint64).view(np.int64), pa.int64()),
        }
    )
    for mh in (0, 3, 8):
        run = lambda **kw: _pairs_via_descriptors(grp, ["band"], meta_cols=("sig",), filt=_hamming_filter(mh), **kw)
        fast = run()
        forced = run(cap=7)
        budgeted = run(budget=11)
        as_set = lambda tb: sorted(zip(tb["a"].to_pylist(), tb["b"].to_pylist()))
        assert as_set(fast) == as_set(forced), mh
        assert as_set(fast) == as_set(budgeted), mh
        assert all(a < b for a, b in as_set(fast))


def test_md5vec_matches_hashlib():
    """The vectorized MD5 kernel is bit-identical to hashlib across
    message lengths 0..200 (1, 2 and 3+ block messages) — md5 is the
    shared Python/SQL hash, so this parity IS oracle parity."""
    import random

    from polipus_ray.ops.md5vec import md5_u64_fixed, md5_u64_strs

    rng = np.random.default_rng(7)
    for length in (1, 5, 8, 31, 55):
        msgs = rng.integers(0, 256, size=(64, length), dtype=np.uint8)
        want = np.array(
            [int.from_bytes(hashlib.md5(m.tobytes()).digest()[:8], "big") for m in msgs], np.uint64
        )
        assert (md5_u64_fixed(msgs) == want).all()
    r = random.Random(11)
    strs = [
        "".join(r.choices("abcdefgh _0123456789", k=k))
        for k in (0, 1, 54, 55, 56, 63, 64, 100, 119, 120, 128, 200)
        for _ in range(8)
    ]
    want = np.array([int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") for s in strs], np.uint64)
    assert (md5_u64_strs(strs) == want).all()


def test_md5vec_digest_and_surrogatepass():
    """Full-digest mode is bit-identical to hashlib .digest(), and the
    surrogatepass error handler matches the crawl's URL hashing
    (urltools.hash64 / uuid_of use utf-8+surrogatepass)."""
    import random

    from polipus_ray.ops.md5vec import md5_digest_strs, md5_u64_strs

    r = random.Random(23)
    strs = [
        "".join(r.choices("abcdefgh /:?=&.%-_0123456789é中", k=k))
        for k in (0, 1, 7, 54, 55, 56, 63, 64, 100, 200)
        for _ in range(6)
    ]
    strs.append("http://h.example/p?q=\udcff")  # lone surrogate (messy canonicalize output)
    want16 = np.frombuffer(
        b"".join(hashlib.md5(s.encode("utf-8", "surrogatepass")).digest() for s in strs), np.uint8
    ).reshape(-1, 16)
    got16 = md5_digest_strs(strs, errors="surrogatepass")
    assert (got16 == want16).all()
    want64 = np.array(
        [int.from_bytes(hashlib.md5(s.encode("utf-8", "surrogatepass")).digest()[:8], "big") for s in strs],
        np.uint64,
    )
    assert (md5_u64_strs(strs, errors="surrogatepass") == want64).all()


def test_shingles_batch_matches_scalar():
    """Batched byte-window shingling == the scalar per-gram path,
    including short docs (padded), empty text, repeated grams and the
    non-ASCII per-doc fallback."""
    from polipus_ray.ops.dedup import _minhash_params, _minhash_sig, _minhash_sig_many, _shingles, _shingles_batch

    rng = np.random.default_rng(5)
    vocab = "abcdefg hij"
    texts = [
        "",
        "a",
        "abcd",
        "aaaaa",
        " " * 7,
        "ABCdé éé",  # non-ASCII: falls back to the scalar path in-batch
        "héllo wörld" * 10,
    ] + ["".join(rng.choice(list(vocab), size=int(rng.integers(1, 400)))) for _ in range(50)]
    got = _shingles_batch(texts)
    for t, g in zip(texts, got):
        assert (g == _shingles(t)).all(), repr(t[:20])
    sets = [s for s in got if len(s)]
    a, b = _minhash_params(32)
    batched = _minhash_sig_many(sets, a, b)
    for k, s in enumerate(sets):
        assert (batched[k] == _minhash_sig(s, a, b)).all()


def test_gram_hashes_batch_matches_scalar():
    """Batched word-n-gram hashing (byte windows of the normalized
    doc, one vectorized md5 pass) == the scalar join-per-gram path,
    including empty/short docs and the non-ASCII fallback."""
    from polipus_ray.ops.dedup import _gram_hashes, _gram_hashes_batch

    rng = np.random.default_rng(9)
    words = ["alpha", "beta", "gamma", "delta", "x", "longtokenword"]
    texts = [
        "",
        "one",
        "one two",
        "one two three four",
        "  spaced   out  tokens ",
        "héllo wörld foo bar baz",  # non-ASCII: scalar fallback in-batch
    ] + [" ".join(rng.choice(words, size=int(rng.integers(1, 60)))) for _ in range(40)]
    for n in (1, 3, 5):
        got = _gram_hashes_batch(texts, n)
        for t, g in zip(texts, got):
            assert (g == _gram_hashes(t, n)).all(), (n, repr(t[:20]))


def test_jaccard_keep_matches_per_pair():
    """Fuzz the run-grouped Jaccard verify kernel against the scalar
    intersect1d definition, including empty sets and empty trailing
    partners (the cumsum segment sums must not borrow hits across
    segment boundaries the way reduceat's equal-offset quirk does)."""
    import numpy as np

    from polipus_ray.ops.dedup import _jaccard_keep

    rng = np.random.default_rng(7)
    for _ in range(300):
        m = int(rng.integers(0, 40))
        A = rng.integers(0, 6, m).astype(np.int64)
        sa, sb = [], []
        first: dict[int, int] = {}
        for k in range(m):
            n1, n2 = rng.integers(0, 12, 2)
            sa.append(np.unique(rng.integers(0, 30, n1).astype(np.uint64)))
            sb.append(np.unique(rng.integers(0, 30, n2).astype(np.uint64)))
            a = int(A[k])
            if a in first:  # rows of one left doc share its gram set
                sa[k] = sa[first[a]]
            else:
                first[a] = k
        thr = float(rng.uniform(0, 1))
        got = _jaccard_keep(A, sa, sb, thr)
        for k in range(m):
            inter = np.intersect1d(sa[k], sb[k], assume_unique=True).size
            union = sa[k].size + sb[k].size - inter
            want = (inter / union if union else 1.0) >= thr
            assert got[k] == want


def test_semantic_dedup_precision_and_recall(ray_session, tmp_path):
    """Precision: the semantic pair set is a subset of the exact op's
    (every candidate is exact-cosine verified).  Recall: pinned on
    PLANTED near-identical pairs (vector + tiny noise, cos >= 0.99) —
    near-dups have tiny angular distance, so top-1 k-means bucketing
    keeps them together; the real-data set at a loose threshold has no
    recall guarantee by design (cluster-straddling pairs are the
    documented miss mode, like LSH band misses)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from polipus_ray.ops.dedup import embedding_dup_pairs, semantic_dup_pairs

    # precision on real data
    exact = {(r["a"], r["b"]) for r in embedding_dup_pairs(SF, threshold=0.42).take_all()}
    sem = {(r["a"], r["b"]) for r in semantic_dup_pairs(SF, threshold=0.42, nlist=8).take_all()}
    assert exact and sem
    assert sem <= exact

    # recall on planted near-identical pairs
    rng = np.random.default_rng(11)
    base = rng.standard_normal((200, 32)).astype(np.float32)
    dup = (base[:40] + 0.01 * rng.standard_normal((40, 32))).astype(np.float32)
    M = np.concatenate([base, dup])
    ids = np.arange(len(M), dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(M), pa.list_(pa.float32())),
            "label": pa.array(np.zeros(len(M), np.int32), pa.int32()),
        }
    )
    d = tmp_path / "sfplant"
    d.mkdir()
    pq.write_table(t, d / "embeddings.parquet")
    got = {(r["a"], r["b"]) for r in semantic_dup_pairs(str(d), threshold=0.9, nlist=8).take_all()}
    planted = {(i, 200 + i) for i in range(40)}
    assert len(got & planted) / len(planted) >= 0.9, (len(got & planted), len(got))


def test_dedup_clusters_distributed_equals_driver(ray_session):
    """The distributed min-label path (forced via driver_pair_limit=0)
    must produce the same (doc_id, cluster_id, keep) assignment as the
    driver union-find path."""
    from polipus_ray.ops.dedup import dedup_clusters

    a = dedup_clusters(SF, driver_pair_limit=1_000_000).to_pandas().reset_index(drop=True)
    b = dedup_clusters(SF, driver_pair_limit=0).to_pandas().reset_index(drop=True)
    assert (a["doc_id"] == b["doc_id"]).all()
    assert (a["cluster_id"] == b["cluster_id"]).all()
    assert (a["keep"] == b["keep"]).all()
    # keepers are exactly the component minima, and clusters are closed
    assert (a.groupby("cluster_id")["doc_id"].min().to_numpy() == sorted(a.loc[a["keep"], "doc_id"])).all()


def test_pagerank_distributed_equals_driver(ray_session):
    """Forced distributed supersteps (driver_edge_limit=0) must match
    the driver CSR path bit-for-bit (same integer arithmetic)."""
    from polipus_ray.ops.graph import pagerank

    a = pagerank(SF, iters=3).to_pandas().reset_index(drop=True)
    b = pagerank(SF, iters=3, driver_edge_limit=0).to_pandas().reset_index(drop=True)
    assert (a["doc_id"] == b["doc_id"]).all()
    assert (a["rank_int"] == b["rank_int"]).all()


def test_order_revenue_join_paths_equal(ray_session):
    """The gated broadcast join (post-filter orders fit the broadcast
    budget) and the native hash join must produce identical top-n
    results."""
    from polipus_ray.ops.relational import order_revenue_topn

    bcast = order_revenue_topn(SF, n=20).to_pandas().reset_index(drop=True)
    native = order_revenue_topn(SF, n=20, broadcast_limit=0).to_pandas().reset_index(drop=True)
    assert len(bcast) > 0
    assert bcast.equals(native)


def test_unshipped_join_paths_equal(ray_session):
    """The gated broadcast anti-probe and the native left_outer +
    null-marker anti-join must produce identical rows."""
    from polipus_ray.ops.relational import unshipped_orders

    bcast = unshipped_orders(SF).to_pandas().reset_index(drop=True)
    native = unshipped_orders(SF, broadcast_limit=0).to_pandas().reset_index(drop=True)
    assert len(bcast) > 0
    assert bcast.equals(native)
