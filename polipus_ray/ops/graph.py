"""Iterative graph analytics over the crawled link graph.

``pagerank`` is the canonical iterative-distributed workload a crawl
corpus feeds (host/page authority for crawl prioritization and
training-data source weighting).  The reference engine has no graph
ops; this is part of the training-data extension surface, expressed
Ray-Data-first as Pregel-style supersteps:

- **edge extraction** is one ``map_batches`` pass over the world
  table: flatten the ``links`` column, regex-extract the target page
  id, apply the same-host (in-domain, M8) filter, dedupe per source
  page, and emit ``(src, dst, outd)`` with the out-degree riding on
  every edge — so the per-iteration plan needs NO separate
  degree join.
- **each superstep** is one distributed hash join (ranks x edges on
  ``src``) + one bounded-bucket grouped sum over ``dst`` (hash
  buckets, not one Ray group per node — node count is unbounded at
  corpus scale), materialized per iteration (the superstep barrier;
  at cluster scale this is also the resume checkpoint).
- **arithmetic is integer**: ranks are scaled to 1e12 and every
  contribution is ``(r * 85) // (100 * outd)`` in int64 — floor
  division on positive ints is engine-independent, so after any
  number of iterations the ranks are bit-exact vs the DuckDB oracle
  (float PageRank would drift with reduction order).  Dangling nodes
  (404 pages) contribute nothing; their mass leaks, which is fine for
  a ranking (both sides leak identically).

Oracle: ``__ray_entry__._pagerank_oracle_sql`` unrolls the same
supersteps as chained CTEs over the SQL-replicable world derivation
(synth/world.py link arithmetic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SCALE = 10**12
DAMP_PCT = 85  # 0.85 damping, in integer percent


def _edges_dataset(world_dir: str, hosts: int):
    """(src, dst, outd) from the world table's links column: regex id
    extraction + in-domain filter + per-source dedupe, all map-side
    (one page's links live in one row, so out-degree is local)."""
    import ray.data

    from polipus_ray.ops.dedup import small_read_blocks

    def extract(batch: pa.Table) -> pa.Table:
        lists = batch["links"].combine_chunks()
        n_links = pc.list_value_length(lists).fill_null(0).to_numpy().astype(np.int64)
        src_of = np.repeat(batch["doc_id"].to_numpy(), n_links)
        flat = pc.list_flatten(lists)
        m = pc.extract_regex(flat, r"/p/(?P<id>[0-9]+)$")
        dst = np.full(len(flat), -1, np.int64)
        valid = pc.is_valid(m).to_numpy(zero_copy_only=False)
        if valid.any():
            if isinstance(m, pa.ChunkedArray):
                m = m.combine_chunks()
            ids = pc.struct_field(m, "id")
            dst_all = pc.cast(ids, pa.int64()).fill_null(-1).to_numpy(zero_copy_only=False)
            dst[valid] = dst_all[valid]
        keep = (dst >= 0) & (dst % hosts == src_of % hosts)  # in-domain (M8)
        src_k, dst_k = src_of[keep], dst[keep]
        # per-source distinct (A4 semantics)
        order = np.lexsort((dst_k, src_k))
        s_s, d_s = src_k[order], dst_k[order]
        new = np.ones(len(s_s), bool)
        new[1:] = (s_s[1:] != s_s[:-1]) | (d_s[1:] != d_s[:-1])
        s_u, d_u = s_s[new], d_s[new]
        # out-degree per source, repeated onto each edge
        first = np.ones(len(s_u), bool)
        first[1:] = s_u[1:] != s_u[:-1]
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, len(s_u)))
        outd = np.repeat(cnt, cnt)
        return pa.table(
            {
                "src": pa.array(s_u, pa.int64()),
                "dst": pa.array(d_u, pa.int64()),
                "outd": pa.array(outd, pa.int64()),
            }
        )

    import os

    path = os.path.join(world_dir, "web")
    ds = ray.data.read_parquet(path, columns=["doc_id", "links"])
    return ds.map_batches(extract, batch_format="pyarrow")


def pagerank(sf_dir: str, iters: int = 5, driver_edge_limit: int = 2_000_000):
    """Integer-scaled PageRank over the in-domain link graph of the
    SQL-checked world derived from ``sf_dir``.  Output: doc_id,
    rank_int (rank x 1e12 after ``iters`` supersteps).

    Adaptive like the dedup verifies: below ``driver_edge_limit``
    edges the (narrow, already-aggregated) edge list is pulled once
    and iterated as gather + ``add.reduceat`` on the driver — a
    15k-edge graph spends 10x longer spinning join aggregator actors
    than computing; above it, fully distributed supersteps (join +
    bounded-bucket sum, materialized per iteration).  Both paths are
    the same integer arithmetic, pinned equal by
    test_pagerank_distributed_equals_driver."""
    import ray.data

    from polipus_ray.ops.dedup import join_partitions
    from polipus_ray.ops.windows import _bucket_tag
    from polipus_ray.pipelines.worlds import SQL_SPEC, sql_world_for

    world_dir = sql_world_for(sf_dir)
    edges = _edges_dataset(world_dir, SQL_SPEC.hosts).materialize()  # reused every superstep
    n_edges = edges.count()
    import os

    nodes = ray.data.read_parquet(os.path.join(world_dir, "web"), columns=["doc_id"])
    base = (100 - DAMP_PCT) * SCALE // 100

    if n_edges <= driver_edge_limit:
        et = edges.to_pandas()
        node_ids = np.sort(nodes.to_pandas()["doc_id"].to_numpy())
        idx_of = np.full(int(node_ids.max()) + 1, -1, np.int64)
        idx_of[node_ids] = np.arange(len(node_ids))
        src = idx_of[et["src"].to_numpy()]
        dst = idx_of[et["dst"].to_numpy()]
        outd = et["outd"].to_numpy()
        # group edges by dst ONCE; per iteration only contribs change
        order = np.argsort(dst, kind="stable")
        dst_s, src_s, outd_s = dst[order], src[order], outd[order]
        new = np.ones(len(dst_s), bool)
        new[1:] = dst_s[1:] != dst_s[:-1]
        starts = np.flatnonzero(new)
        dst_g = dst_s[starts]
        r = np.full(len(node_ids), SCALE, np.int64)
        for _ in range(iters):
            c = (r[src_s] * DAMP_PCT) // (100 * outd_s)
            nxt = np.full(len(node_ids), base, np.int64)
            if len(starts):
                nxt[dst_g] += np.add.reduceat(c, starts)
            r = nxt
        out = pa.table({"doc_id": pa.array(node_ids, pa.int64()), "rank_int": pa.array(r, pa.int64())})
        return ray.data.from_arrow(out)

    def init_ranks(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "r": pa.array(np.full(len(batch), SCALE, np.int64), pa.int64()),
            }
        )

    def zero_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "dst": batch["doc_id"],
                "contrib": pa.array(np.zeros(len(batch), np.int64), pa.int64()),
            }
        )

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow").materialize()
    zeros = nodes.map_batches(zero_rows, batch_format="pyarrow").materialize()
    # size the per-superstep join from the edge count: each hash-join
    # partition spins an aggregator actor, and 5 supersteps x 32
    # oversized partitions is pure spin-up on a small graph
    nparts = join_partitions(n_edges)

    def contrib(batch: pa.Table) -> pa.Table:
        r = batch["r"].to_numpy()
        outd = batch["outd"].to_numpy()
        return pa.table(
            {
                "dst": batch["dst"],
                "contrib": pa.array((r * DAMP_PCT) // (100 * outd), pa.int64()),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        dst = group["dst"].to_numpy()
        c = group["contrib"].to_numpy()
        order = np.argsort(dst, kind="stable")
        d_s = dst[order]
        new = np.ones(len(d_s), bool)
        new[1:] = d_s[1:] != d_s[:-1]
        starts = np.flatnonzero(new)
        return pa.table(
            {
                "doc_id": pa.array(d_s[starts], pa.int64()),
                "r": pa.array(base + np.add.reduceat(c[order], starts), pa.int64()),
            }
        )

    for _ in range(iters):
        j = edges.join(ranks, join_type="inner", num_partitions=nparts, on=("src",), right_on=("doc_id",))
        contribs = j.map_batches(contrib, batch_format="pyarrow").union(zeros)
        # materialize = the superstep barrier/checkpoint; without it
        # the lazy lineage re-executes every prior iteration
        ranks = _bucket_tag(contribs, "dst", nparts).map_groups(fold, batch_format="pyarrow").materialize()

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["doc_id"], "rank_int": batch["r"]})

    return ranks.map_batches(rename, batch_format="pyarrow").sort("doc_id")
