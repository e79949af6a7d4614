"""Similarity search over the ``embeddings`` table.

- ``ann_topk_bruteforce``: exact cosine top-k.  Query matrix is
  broadcast once (``ray.put``); each batch does one float64 matmul and
  emits per-batch partial top-k rows; a small ``groupby(query_id)``
  merges partials — the map-side pre-aggregation pattern, so the
  shuffle carries O(num_queries * k * num_batches) rows, never the
  corpus.

- ``ann_topk_ivf``: IVF-style scale path.  Deterministic k-means
  (fixed seed/iterations) on a driver-side sample builds ``nlist``
  centroids; vectors are assigned to their nearest centroid in a
  map_batches pass; queries probe only ``nprobe`` lists.  Approximate:
  pytest checks recall >= 0.8 against brute force; rows-only driver
  check (not SQL-expressible).

Ties broken by ascending neighbor id everywhere, in both the numpy
and SQL implementations, so rank output is deterministic."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import emb_matrix


def _load_queries(sf_dir: str, num_queries: int):
    """Load the first ``num_queries`` query vectors with parquet
    predicate pushdown — only matching row groups are decoded, so at
    1e9 vectors the driver still fetches O(num_queries) rows, never
    the table."""
    import pyarrow.parquet as pq

    q = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", num_queries)],
    )
    order = np.argsort(q["vec_id"].to_numpy())
    q = q.take(pa.array(order))
    Q = emb_matrix(q["embedding"])
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    return q["vec_id"].to_numpy(), Q


def ann_topk_bruteforce(sf_dir: str, k: int = 5, num_queries: int = 10):
    import ray
    import ray.data

    qids, Q = _load_queries(sf_dir, num_queries)
    qref = ray.put((qids, Q))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids_, Q_ = ray.get(qref)
        ids = batch["vec_id"].to_numpy()
        M = emb_matrix(batch["embedding"])
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        sims = Q_ @ M.T  # (nq, nb)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids_)):
            s = sims[qi]
            mask = ids != qids_[qi]  # exclude self
            cand = np.flatnonzero(mask)
            if cand.size == 0:
                continue
            order = np.lexsort((ids[cand], -s[cand]))[: k]
            for j in cand[order]:
                out_q.append(int(qids_[qi]))
                out_n.append(int(ids[j]))
                out_s.append(float(s[j]))
        return pa.table(
            {"query_id": pa.array(out_q, pa.int64()), "neighbor_id": pa.array(out_n, pa.int64()), "sim": pa.array(out_s, pa.float64())}
        )

    def merge_topk(group: pa.Table) -> pa.Table:
        sims = group["sim"].to_numpy()
        nid = group["neighbor_id"].to_numpy()
        order = np.lexsort((nid, -sims))[:k]
        return pa.table(
            {
                "query_id": group["query_id"].take(pa.array(order)),
                "neighbor_id": group["neighbor_id"].take(pa.array(order)),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            }
        )

    from polipus_ray.ops.dedup import _emb_read

    ds = _emb_read(sf_dir)
    return (
        ds.map_batches(partial_topk, batch_format="pyarrow", batch_size=1024)
        .groupby("query_id")
        .map_groups(merge_topk, batch_format="pyarrow")
        .sort(["query_id", "rank"])
    )


def ann_range_search(sf_dir: str, threshold: float = 0.3, num_queries: int = 10):
    """Range similarity search: every corpus vector with cosine >=
    ``threshold`` to each query.  Pure map + sort — the per-batch
    matmul against the broadcast query matrix emits only qualifying
    pairs, so nothing shuffles but the (small) result set; there is no
    groupby at all.  The top-k variant above is the bounded-output
    cousin; this is the recall-complete one (near-dup candidate pulls,
    contamination sweeps)."""
    import ray
    import ray.data

    qids, Q = _load_queries(sf_dir, num_queries)
    qref = ray.put((qids, Q))

    def partial(batch: pa.Table) -> pa.Table:
        qids_, Q_ = ray.get(qref)
        ids = batch["vec_id"].to_numpy()
        M = emb_matrix(batch["embedding"])
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        sims = Q_ @ M.T  # (nq, nb)
        hit = sims >= threshold
        hit &= ids[None, :] != qids_[:, None]  # exclude self
        qi, bi = np.nonzero(hit)
        return pa.table(
            {
                "query_id": pa.array(qids_[qi].astype(np.int64), pa.int64()),
                "neighbor_id": pa.array(ids[bi].astype(np.int64), pa.int64()),
            }
        )

    from polipus_ray.ops.dedup import _emb_read

    ds = _emb_read(sf_dir)
    return ds.map_batches(partial, batch_format="pyarrow", batch_size=1024).sort(["query_id", "neighbor_id"])


def _kmeans(M: np.ndarray, nlist: int, iters: int = 5, seed: int = 7) -> np.ndarray:
    """Deterministic mini k-means (cosine space: rows pre-normalized)."""
    n = len(M)
    step = max(1, n // nlist)
    C = M[::step][:nlist].copy()
    for _ in range(iters):
        assign = np.argmax(M @ C.T, axis=1)
        for c in range(len(C)):
            members = M[assign == c]
            if len(members):
                v = members.mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    C[c] = v / nv
    return C


def _ivf_sample(sf_dir: str, cap: int = 4096) -> np.ndarray:
    """Deterministic distributed training sample for k-means: filter
    ``vec_id % mod == 0`` (mod sized so <= cap rows survive) inside
    map_batches, pull ONLY the surviving rows to the driver, sort by
    vec_id (block order independence), normalize.  Never a full-table
    driver read."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    n = pf.metadata.num_rows
    mod = max(1, (n + cap - 1) // cap)
    import ray

    if ray.is_initialized():
        import ray.data

        from polipus_ray.ops.dedup import _emb_read

        ds = _emb_read(sf_dir)
        if mod > 1:

            def pick(batch: pa.Table) -> pa.Table:
                ids = batch["vec_id"].to_numpy()
                return batch.filter(pa.array(ids % mod == 0))

            ds = ds.map_batches(pick, batch_format="pyarrow")
        t = pa.concat_tables(list(ds.iter_batches(batch_size=65536, batch_format="pyarrow")))
    else:
        # ray-less fallback (identical result: the sample depends only
        # on the id filter + sort): stream row groups, keep <= cap rows
        parts = []
        for g in range(pf.num_row_groups):
            rg = pf.read_row_group(g, columns=["vec_id", "embedding"])
            ids = rg["vec_id"].to_numpy()
            parts.append(rg.filter(pa.array(ids % mod == 0)))
        t = pa.concat_tables(parts)
    t = t.take(pa.array(np.argsort(t["vec_id"].to_numpy())))
    M = emb_matrix(t["embedding"])
    return M / np.linalg.norm(M, axis=1, keepdims=True)


def ivf_model(sf_dir: str, num_queries: int, nlist: int, nprobe: int):
    """(qids, Q, centroids, probe_lists) — shared by the Ray pipeline
    and by __ray_entry__.oracle_sql(), which inlines the centroids and
    probe lists as SQL literals so DuckDB replays the same IVF search
    exactly."""
    qids, Q = _load_queries(sf_dir, num_queries)
    C = _kmeans(_ivf_sample(sf_dir), nlist)
    probe_lists = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    return qids, Q, C, probe_lists


def ann_topk_ivf(sf_dir: str, k: int = 5, num_queries: int = 10, nlist: int = 16, nprobe: int = 4):
    import ray
    import ray.data

    qids, Q, C, probe_lists = ivf_model(sf_dir, num_queries, nlist, nprobe)
    qref = ray.put((qids, Q, C, probe_lists))

    def partial(batch: pa.Table) -> pa.Table:
        qids_, Q_, C_, probes_ = ray.get(qref)
        ids = batch["vec_id"].to_numpy()
        Mb = emb_matrix(batch["embedding"])
        Mb = Mb / np.linalg.norm(Mb, axis=1, keepdims=True)
        assign = np.argmax(Mb @ C_.T, axis=1)
        sims = Q_ @ Mb.T
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids_)):
            allowed = np.isin(assign, probes_[qi]) & (ids != qids_[qi])
            cand = np.flatnonzero(allowed)
            if cand.size == 0:
                continue
            order = np.lexsort((ids[cand], -sims[qi][cand]))[:k]
            for j in cand[order]:
                out_q.append(int(qids_[qi]))
                out_n.append(int(ids[j]))
                out_s.append(float(sims[qi][j]))
        return pa.table(
            {"query_id": pa.array(out_q, pa.int64()), "neighbor_id": pa.array(out_n, pa.int64()), "sim": pa.array(out_s, pa.float64())}
        )

    def merge(group: pa.Table) -> pa.Table:
        order = np.lexsort((group["neighbor_id"].to_numpy(), -group["sim"].to_numpy()))[:k]
        return pa.table(
            {
                "query_id": group["query_id"].take(pa.array(order)),
                "neighbor_id": group["neighbor_id"].take(pa.array(order)),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            }
        )

    from polipus_ray.ops.dedup import _emb_read

    ds = _emb_read(sf_dir)
    return ds.map_batches(partial, batch_format="pyarrow", batch_size=1024).groupby("query_id").map_groups(merge, batch_format="pyarrow").sort(["query_id", "rank"])


def label_vector_sums(sf_dir: str, scale: int = 1_000_000):
    """Per-label vector aggregate over the embedding column — the
    centroid-accumulation plan (SemDeDup/IVF training's inner step) as
    a standalone query: for every (label, dimension), the exact sum of
    ``round(value * scale)`` plus the label's vector count.

    Map-side partial: each batch reshapes the list column to an (n, d)
    matrix once and folds per-label sums with one lexsort +
    ``add.reduceat`` — the shuffle carries O(labels x dims) rows per
    block, never vectors.  Integer scaling makes the sums
    order-independent and bit-exact vs the SQL oracle (float32 values
    are exactly representable as doubles, so round(x*scale) agrees
    across engines).  Output: label, dim, sum_scaled, n_vectors."""
    import ray.data

    from polipus_ray.ops.dedup import emb_matrix, small_read_blocks

    def partial(batch: pa.Table) -> pa.Table:
        lab = batch["label"].to_numpy().astype(np.int64)
        M = np.round(emb_matrix(batch["embedding"]) * scale).astype(np.int64)
        d = M.shape[1]
        order = np.argsort(lab, kind="stable")
        l_s = lab[order]
        new = np.ones(len(l_s), bool)
        new[1:] = l_s[1:] != l_s[:-1]
        starts = np.flatnonzero(new)
        labs = l_s[starts]
        sums = np.add.reduceat(M[order], starts, axis=0)  # (L, d)
        cnt = np.diff(np.append(starts, len(l_s)))
        return pa.table(
            {
                "label": pa.array(np.repeat(labs, d), pa.int64()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(labs)), pa.int64()),
                "sum_scaled": pa.array(sums.ravel(), pa.int64()),
                "n_vectors": pa.array(np.repeat(cnt.astype(np.int64), d), pa.int64()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        lab = group["label"].to_numpy()
        dim = group["dim"].to_numpy()
        s = group["sum_scaled"].to_numpy()
        n = group["n_vectors"].to_numpy()
        key = lab * (dim.max() + 1 if len(dim) else 1) + dim
        order = np.argsort(key, kind="stable")
        k_s = key[order]
        new = np.ones(len(k_s), bool)
        new[1:] = k_s[1:] != k_s[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(k_s))
        return pa.table(
            {
                "label": pa.array(lab[order][starts], pa.int64()),
                "dim": pa.array(dim[order][starts], pa.int64()),
                "sum_scaled": pa.array(np.add.reduceat(s[order], starts), pa.int64()),
                # n_vectors rides on every dim row of a label; within a
                # (label, dim) group the per-partial counts SUM
                "n_vectors": pa.array(np.add.reduceat(n[order], starts), pa.int64()),
            }
        )

    path = f"{sf_dir}/embeddings.parquet"
    ds = ray.data.read_parquet(path, columns=["label", "embedding"], override_num_blocks=small_read_blocks(path))
    parts = ds.map_batches(partial, batch_format="pyarrow")
    from polipus_ray.ops.dedup import join_partitions
    from polipus_ray.ops.windows import _bucket_tag

    # bounded bucket shuffle on label (labels x dims rows only)
    folded = _bucket_tag(parts, "label", join_partitions(None)).map_groups(merge, batch_format="pyarrow")
    return folded.sort(["label", "dim"])
