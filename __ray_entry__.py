"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl on sf0.001.  ``queries()`` /
``oracle_sql()`` pair every SQL-expressible operator with a DuckDB
oracle over the pre-registered parquet views; crawl queries derive
their web world deterministically from ``documents`` (the arithmetic
derivation in polipus_ray/synth/world.py is replicated in the SQL
below).  Ray is initialised by the driver — nothing here calls
ray.init/shutdown.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# shared graph constants (keep in sync with polipus_ray.synth.world.WorldSpec)
_H = 16
_OUT_DEGREE = 3
_NOTFOUND_MOD = 37
_ROBOTS_DISALLOW_MOD = 5
_NUM_SEEDS = 4

_URL_SQL = "'http://h' || CAST(doc_id % 16 AS VARCHAR) || '.test/p/' || CAST(doc_id AS VARCHAR)"
_ALLOWED_SQL = "NOT (((doc_id % 16) % 5 = 0) AND CAST(doc_id AS VARCHAR) LIKE '9%')"


def entry() -> Any:
    """Flagship: full crawl (robots, redirects, politeness, phash
    columns) of the world derived from sf0.001; returns the stored
    pages as a Ray Dataset (narrow projection for a stable schema)."""
    from polipus_ray.config import CrawlConfig
    from polipus_ray.frontier.engine import CrawlEngine
    from polipus_ray.pipelines.worlds import full_world_for

    import hashlib
    import os
    import shutil

    sf_dir = "/root/testdata/sf0.001"
    world_dir = full_world_for(sf_dir)
    cfg = CrawlConfig(depth_limit=3, obey_robots_txt=True, politeness_default_delay=0.1)
    run_dir = os.path.join("/tmp/polipus_ray_runs", "entry-" + hashlib.md5(world_dir.encode()).hexdigest()[:8])
    shutil.rmtree(run_dir, ignore_errors=True)
    eng = CrawlEngine(world_dir, cfg, run_dir)
    eng.crawl()
    return eng.pages_dataset(columns=["uuid", "url", "depth", "code", "caption", "phash", "fetched_at", "seq"])


def queries() -> dict[str, Callable[[str], Any]]:
    from polipus_ray.ops.ann import ann_topk_bruteforce, ann_topk_ivf
    from polipus_ray.ops.dedup import (
        embedding_dup_pairs,
        embedding_dup_pairs_lsh,
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        semantic_dup_pairs,
        simhash_pairs,
    )
    from polipus_ray.ops.ann import ann_range_search, label_vector_sums
    from polipus_ray.ops.sample import pack_greedy, sample_hash_pct, sample_stratified_topk
    from polipus_ray.ops.text import (
        chunk_tokens,
        fingerprints,
        lang_id,
        quality_stats,
        repetition_stats,
        tfidf_topk,
        token_counts,
        vocab_stats,
    )
    from polipus_ray.ops.windows import (
        approx_distinct_users,
        asof_join,
        event_type_stats,
        funnel_completions,
        quantiles_by_type,
        hopping_window,
        session_windows,
        top_users_per_type,
        tumbling_window,
        type_transitions,
        user_pivot,
        value_histogram,
        weekly_retention,
    )
    from polipus_ray.ops.relational import order_revenue_topn, pricing_summary, region_sales, unshipped_orders
    from polipus_ray.pipelines import crawl_queries as cq

    return {
        # crawl engine operators (SQL-oracle-checked)
        "crawl_web_derivation": cq.crawl_web_derivation,
        "crawl_bfs_depth2": cq.crawl_bfs_depth2,
        "crawl_link_explode": cq.crawl_link_explode,
        "crawl_robots_filter": cq.crawl_robots_filter,
        "crawl_pattern_filter": cq.crawl_pattern_filter,
        "crawl_uuids": cq.crawl_uuids,
        # crawl image stages (phash_neardup: SQL replay over the world
        # parquet; decode_verify: generator-backed fixture oracle)
        "crawl_phash_neardup": cq.crawl_phash_neardup,
        "crawl_decode_verify": cq.crawl_decode_verify,
        # crawl-output analytics: per-host rollup of the bfs2 crawl
        "crawl_host_stats": cq.crawl_host_stats,
        # training-data operators (SQL-oracle-checked; every hash is
        # md5-derived so DuckDB replicates candidates AND verification)
        "dedup_exact": exact_dedup,
        "dedup_embedding_cosine": lambda sf: embedding_dup_pairs(sf, threshold=0.42),
        "ann_cosine_topk": lambda sf: ann_topk_bruteforce(sf, k=5, num_queries=10),
        "text_token_counts": token_counts,
        "text_quality": quality_stats,
        "dedup_minhash_lsh": lambda sf: minhash_lsh_pairs(sf, threshold=0.8),
        "dedup_simhash": lambda sf: simhash_pairs(sf, max_hamming=3),
        "dedup_ngram_jaccard": lambda sf: ngram_jaccard_pairs(sf, n=3, threshold=0.5),
        "ann_ivf_topk": lambda sf: ann_topk_ivf(sf, k=5, num_queries=10, nlist=8, nprobe=5),
        "ann_range_search": lambda sf: ann_range_search(sf, threshold=0.3, num_queries=10),
        "text_lang_id": lang_id,
        "text_fingerprint": fingerprints,
        "text_vocab": vocab_stats,
        "docs_sample_pct": lambda sf: sample_hash_pct(sf, pct=20),
        "docs_sample_stratified": lambda sf: sample_stratified_topk(sf, k=10),
        # event-time windowed aggregates over the events table
        "events_tumbling_window": lambda sf: tumbling_window(sf, window_s=3600),
        "events_hopping_window": lambda sf: hopping_window(sf, window_s=3600, hop_s=900),
        "events_top_users": lambda sf: top_users_per_type(sf, k=3),
        "events_sessionize": lambda sf: session_windows(sf, gap_s=14400),
        "events_asof_join": lambda sf: asof_join(sf, left_type="purchase", right_type="view"),
        # exact distributed quantiles (histogram sieve; DuckDB
        # quantile_cont lerp bit-parity pinned by fuzz test)
        "events_quantiles": lambda sf: quantiles_by_type(sf, qs=(0.5, 0.9, 0.99)),
        "events_type_stats": event_type_stats,
        # HLL sketch (approximate by design, but integer-exact
        # estimate arithmetic -> still value-hash-checkable in SQL)
        "events_approx_distinct": approx_distinct_users,
        # rows-only (approximate by design: LSH recall < 1, pytest
        # pins recall vs the exact operator; band_bits tuned to the
        # threshold — lower thresholds need shorter bands)
        "dedup_embedding_lsh": lambda sf: embedding_dup_pairs_lsh(sf, threshold=0.42, band_bits=4),
        # SemDeDup-style cluster-scoped embedding dedup: k-means
        # buckets as candidates, exact-cosine verify (oracle replays
        # the same centroids as SQL literals)
        "dedup_semantic": lambda sf: semantic_dup_pairs(sf, threshold=0.42, nlist=8),
        # relational plans over the TPC-H-shaped tables (integer-cents
        # arithmetic -> order-independent, value-hash-exact): map-side
        # partial rollup / large-large hash join + dim broadcast +
        # partial top-n / star-schema broadcast rollup
        "tpch_pricing_summary": pricing_summary,
        "tpch_order_revenue": lambda sf: order_revenue_topn(sf, n=20, segment="BUILDING", date="1998-06-30"),
        "tpch_region_sales": region_sales,
        # distributed ANTI-join (null-marker left_outer, J2's shape)
        "tpch_unshipped_orders": lambda sf: unshipped_orders(sf, date="1998-06-30"),
        # Gopher-style repetition signals (integer numerators), fixed
        # sliding-window token chunking, and integer-scaled TF-IDF
        # retrieval — map-only / partial-top-k plans
        "text_repetition": repetition_stats,
        "docs_chunk_tokens": lambda sf: chunk_tokens(sf, window=32, stride=24),
        "text_tfidf_topk": lambda sf: tfidf_topk(sf, terms=("hash", "merge", "window", "table"), k=10),
        # iterative graph analytics: integer-scaled PageRank supersteps
        # (join + bounded-bucket sum per iteration), bit-exact vs the
        # unrolled-CTE oracle
        "crawl_pagerank": lambda sf: _pagerank(sf, iters=5),
        # dedup endgame: connected components over the verified
        # MinHash pair graph -> min-id cluster label + keep flag
        "dedup_clusters": _dedup_clusters,
        # ordered-funnel completion (greedy step-wise match) and
        # cohort retention — one bounded user-bucket shuffle each
        "events_funnel": lambda sf: funnel_completions(sf, steps=("view", "click", "purchase"), within_s=7 * 86400),
        "events_retention": weekly_retention,
        # per-user wide profile (pivot): count per type + exact cents
        "events_user_pivot": user_pivot,
        # deterministic greedy sequence packing (serialism bounded per
        # pack group; groups pack in parallel)
        "docs_pack_greedy": lambda sf: pack_greedy(sf, capacity=256, group=32),
        # end-to-end curation verdict: exact-dedup keep + quality +
        # repetition rules in one pass + one bounded shuffle
        "docs_curation": _curation,
        # vector-column aggregation: per-(label, dim) integer-scaled
        # centroid sums (the IVF/SemDeDup training inner step)
        "emb_label_sums": label_vector_sums,
        # fixed-bin value distribution per type (data-quality histogram)
        "events_value_histogram": lambda sf: value_histogram(sf, bin_cents=1000),
        # per-user sequence bigrams (transition matrix)
        "events_type_transitions": type_transitions,
        # benchmark-contamination flags: broadcast the (small) eval
        # set's distinct word 8-grams, map-only membership — the
        # decontamination pass every pretraining corpus runs
        "docs_contamination": _contamination,
    }


def _curation(sf: str):
    from polipus_ray.ops.curate import curation

    return curation(sf)


def _contamination(sf: str):
    from polipus_ray.ops.curate import contamination

    return contamination(sf, n=8, bench_mod=97)


def _dedup_clusters(sf: str):
    from polipus_ray.ops.dedup import dedup_clusters

    return dedup_clusters(sf, threshold=0.8)


def _clusters_oracle_sql() -> str:
    """The MinHash pair SQL wrapped in a recursive min-label closure:
    every document labeled with its component's min doc_id."""
    return f"""
WITH RECURSIVE pairs AS ({_minhash_oracle_sql()}),
edges AS (SELECT a AS n, b AS m FROM pairs UNION ALL SELECT b AS n, a AS m FROM pairs),
comp(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.m, c.label FROM comp c JOIN edges e ON e.n = c.node
)
SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster_id,
       (min(label) = node) AS keep
FROM comp GROUP BY node ORDER BY node
"""


def _pagerank(sf: str, iters: int = 5):
    from polipus_ray.ops.graph import pagerank

    return pagerank(sf, iters=iters)


def _pagerank_oracle_sql(iters: int = 5) -> str:
    """PageRank supersteps unrolled as chained CTEs over the
    SQL-replicable world link arithmetic (synth/world.py; same edge
    set the Ray op extracts from the links column after the in-domain
    filter).  All-integer arithmetic: floor-division contributions,
    so any iteration count stays engine-exact."""
    from polipus_ray.ops.graph import DAMP_PCT, SCALE

    n_eff = "(SELECT count(*) - (count(*) % 16) FROM documents)"
    base = (100 - DAMP_PCT) * SCALE // 100
    sql = f"""WITH edges AS (
      SELECT DISTINCT d.doc_id AS src,
             ((d.doc_id + k.k*16*(1 + ((d.doc_id // 16) % 64))) % {n_eff}) AS dst
      FROM documents d CROSS JOIN (SELECT unnest([1,2,3]) AS k) k
      WHERE (d.doc_id % 37) <> 0
    ), outd AS (SELECT src, count(*) AS o FROM edges GROUP BY 1),
    r0 AS (SELECT doc_id, CAST({SCALE} AS BIGINT) AS r FROM documents)"""
    for t in range(1, iters + 1):
        sql += f""",
    r{t} AS (
      SELECT d.doc_id, CAST({base} + coalesce(s.s, 0) AS BIGINT) AS r
      FROM documents d LEFT JOIN (
        SELECT e.dst AS doc_id, sum((r.r * {DAMP_PCT}) // (100 * o.o)) AS s
        FROM edges e JOIN r{t - 1} r ON r.doc_id = e.src JOIN outd o ON o.src = e.src
        GROUP BY 1) s USING (doc_id))"""
    return sql + f"\nSELECT doc_id, r AS rank_int FROM r{iters} ORDER BY doc_id"


def _minhash_oracle_sql(num_perm: int = 128, bands: int = 16, ngram: int = 5, threshold: float = 0.8) -> str:
    """MinHash-LSH replayed in DuckDB: the permutation params are
    inlined as VALUES literals (generated by the same seeded RNG the
    Ray pipeline uses), shingles/band keys use the shared md5-derived
    hash, so candidates and exact-Jaccard verification match the
    pipeline bit-for-bit (polipus_ray/ops/dedup.py)."""
    from polipus_ray.ops.dedup import _minhash_params

    a, b = _minhash_params(num_perm)
    perm_rows = ",".join(f"({j},{int(a[j])},{int(b[j])})" for j in range(num_perm))
    return f"""
WITH perms(j, pa, pb) AS (SELECT * FROM (VALUES {perm_rows}) t(j, pa, pb)),
low AS (
  SELECT doc_id, CASE WHEN length(lower(text)) < {ngram}
                      THEN lower(text) || repeat(' ', {ngram} - length(lower(text)))
                      ELSE lower(text) END AS s
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(substr(s, CAST(u.i AS INTEGER), {ngram})), 1, 16))::UBIGINT AS h
  FROM low, unnest(range(1, length(s) - {ngram - 2})) AS u(i)
), sig AS (
  SELECT doc_id, j,
         min((CAST(pa AS UBIGINT) * (h % 2147483647) + CAST(pb AS UBIGINT)) % 2147483647) AS v
  FROM sh CROSS JOIN perms GROUP BY doc_id, j
), band AS (
  SELECT doc_id, j // {num_perm // bands} AS band_id,
         ('0x' || substr(md5(string_agg(CAST(v AS VARCHAR), '_' ORDER BY j)), 1, 16))::UBIGINT AS band_key
  FROM sig GROUP BY doc_id, j // {num_perm // bands}
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM band x JOIN band y ON y.band_id = x.band_id AND y.band_key = x.band_key AND x.doc_id < y.doc_id
), sz AS (
  SELECT doc_id, count(*) AS s FROM sh GROUP BY 1
), ix AS (
  SELECT c.a, c.b, count(*) AS c
  FROM cand c JOIN sh x ON x.doc_id = c.a JOIN sh y ON y.doc_id = c.b AND y.h = x.h
  GROUP BY 1, 2
)
SELECT ix.a, ix.b FROM ix
JOIN sz sa ON sa.doc_id = ix.a JOIN sz sb ON sb.doc_id = ix.b
WHERE CAST(ix.c AS DOUBLE) / (sa.s + sb.s - ix.c) >= {threshold}
ORDER BY 1, 2
"""


def _ivf_oracle_sql(sf_dir: str, k: int = 5, num_queries: int = 10, nlist: int = 8, nprobe: int = 5) -> str:
    """IVF ANN replayed in DuckDB: centroids + per-query probe lists
    come from the SAME deterministic k-means the Ray pipeline trains
    (polipus_ray/ops/ann.py ivf_model) on the SAME sf dir, inlined as
    literals; DuckDB then reproduces assignment + probe-filtered top-k
    exactly."""
    from polipus_ray.ops.ann import ivf_model

    qids, _, C, probes = ivf_model(sf_dir, num_queries, nlist, nprobe)
    cent_rows = ",".join(f"({ci}, [{','.join(repr(float(x)) for x in C[ci])}]::DOUBLE[])" for ci in range(len(C)))
    probe_rows = ",".join(f"({int(qids[qi])},{int(c)})" for qi in range(len(qids)) for c in probes[qi])
    return f"""
WITH cents(cid, c) AS (SELECT * FROM (VALUES {cent_rows}) t(cid, c)),
probes(query_id, cid) AS (SELECT * FROM (VALUES {probe_rows}) t(query_id, cid)),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, cents.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_cosine_similarity(e.embedding, cents.c) DESC, cents.cid) AS rn
    FROM embeddings e CROSS JOIN cents
  ) WHERE rn = 1
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id) AS rank
  FROM embeddings q
  JOIN embeddings e ON e.vec_id <> q.vec_id
  JOIN asg ON asg.vec_id = e.vec_id
  JOIN probes p ON p.query_id = q.vec_id AND p.cid = asg.cid
  WHERE q.vec_id < {num_queries}
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


def _semantic_oracle_sql(sf_dir: str, threshold: float = 0.42, nlist: int = 8) -> str:
    """SemDeDup-style cluster dedup replayed in DuckDB: the centroids
    come from the SAME deterministic k-means the Ray pipeline trains
    (polipus_ray/ops/ann.py _kmeans over _ivf_sample) on the SAME sf
    dir, inlined as DOUBLE[] literals; DuckDB reproduces the
    nearest-centroid assignment (ties to the lowest cid, matching
    np.argmax's first-max) and the same-cluster exact-cosine pairs."""
    from polipus_ray.ops.ann import _ivf_sample, _kmeans

    C = _kmeans(_ivf_sample(sf_dir), nlist)
    cent_rows = ",".join(f"({ci}, [{','.join(repr(float(x)) for x in C[ci])}]::DOUBLE[])" for ci in range(len(C)))
    return f"""
WITH cents(cid, c) AS (SELECT * FROM (VALUES {cent_rows}) t(cid, c)),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, cents.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_cosine_similarity(e.embedding, cents.c) DESC, cents.cid) AS rn
    FROM embeddings e CROSS JOIN cents
  ) WHERE rn = 1
)
SELECT x.vec_id AS a, y.vec_id AS b
FROM embeddings x
JOIN asg ax ON ax.vec_id = x.vec_id
JOIN embeddings y ON y.vec_id > x.vec_id
JOIN asg ay ON ay.vec_id = y.vec_id AND ay.cid = ax.cid
WHERE list_cosine_similarity(x.embedding, y.embedding) >= {threshold}
ORDER BY a, b
"""


def _embedding_lsh_oracle_sql(sf_dir: str, threshold: float = 0.42, nplanes: int = 128, band_bits: int = 4, seed: int = 5) -> str:
    """Sign-LSH embedding dedup replayed in DuckDB: the seeded random
    hyperplane matrix R (polipus_ray/ops/dedup.py
    embedding_dup_pairs_lsh) is inlined as DOUBLE[] literals — exact
    repr round-trip — so DuckDB reproduces the sign bits, band keys,
    candidate set AND the exact-cosine verification bit-for-bit."""
    import numpy as np
    import pyarrow.parquet as pq

    schema = pq.read_schema(f"{sf_dir}/embeddings.parquet")
    dim = getattr(schema.field("embedding").type, "list_size", None)
    if not dim:
        t0 = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").read_row_group(0, columns=["embedding"])
        dim = len(t0["embedding"][0])
    rng = np.random.default_rng(seed)
    R = rng.standard_normal((dim, nplanes))
    plane_rows = ",".join(f"({pi}, [{','.join(repr(float(x)) for x in R[:, pi])}]::DOUBLE[])" for pi in range(nplanes))
    return f"""
WITH planes(pi, v) AS (SELECT * FROM (VALUES {plane_rows}) t(pi, v)),
emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
dots AS (SELECT vec_id, pi, list_dot_product(e, v) AS d FROM emb CROSS JOIN planes),
band AS (
  SELECT vec_id, pi // {band_bits} AS band_id,
         SUM(CASE WHEN d >= 0 THEN (1::BIGINT << CAST(pi % {band_bits} AS INTEGER)) ELSE 0 END) AS band_key
  FROM dots GROUP BY 1, 2
), cand AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM band x JOIN band y ON y.band_id = x.band_id AND y.band_key = x.band_key AND x.vec_id < y.vec_id
)
SELECT c.a, c.b FROM cand c
JOIN embeddings ea ON ea.vec_id = c.a
JOIN embeddings eb ON eb.vec_id = c.b
WHERE list_cosine_similarity(ea.embedding, eb.embedding) >= {threshold}
ORDER BY 1, 2
"""


def _decode_verify_oracle_sql(sf_dir: str) -> str:
    """crawl_decode_verify oracle: the generator-backed expected table
    (scalar reference codec path — synth/world.decode_expected_table)
    read back via read_parquet.  The codec itself is not
    SQL-expressible, but its output is deterministic, so the world
    generator emits the expected rows at fixture time and DuckDB
    compares them like any other query.  The world_key guard (md5 of
    the documents view's sorted doc_id list, recomputed IN SQL) pins
    the fixture to the same document set the Ray query derived its
    world from."""
    from polipus_ray.pipelines.crawl_queries import ensure_decode_fixture

    path = ensure_decode_fixture(sf_dir)
    return f"""
        SELECT doc_id, ok, phash_ok, lum_centi, n_px
        FROM read_parquet('{path}')
        WHERE world_key = (
            SELECT md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) FROM documents
        )
    """


def _phash_neardup_oracle_sql(sf_dir: str, max_hamming: int = 4) -> str:
    """phash near-dup suppression replayed in DuckDB over the SAME
    derived world parquet the Ray query reads: max_hamming+1 pigeonhole
    bit-bands (lossless — identical to ops/images.py), Hamming verify
    via bit_count(xor(...)), then connected components as a recursive
    min-label closure; keep = (component min id == own id)."""
    import os

    from polipus_ray.ops.dedup import band_ranges
    from polipus_ray.pipelines.worlds import sql_world_for

    world = sql_world_for(sf_dir)
    glob = os.path.join(world, "web", "*", "*.parquet")
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, p, {bi} AS band_id, (p >> {off}) & {(1 << w) - 1} AS band_val FROM ph"
        for bi, (off, w) in enumerate(band_ranges(max_hamming))
    )
    return f"""
WITH RECURSIVE
ph AS (SELECT doc_id, phash AS p FROM read_parquet('{glob}')),
bands AS ({band_union}),
pairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y ON y.band_id = x.band_id AND y.band_val = x.band_val AND x.doc_id < y.doc_id
  WHERE bit_count(xor(x.p, y.p)) <= {max_hamming}
),
edges AS (SELECT a AS n, b AS m FROM pairs UNION ALL SELECT b AS n, a AS m FROM pairs),
comp(node, label) AS (
  SELECT doc_id, doc_id FROM ph
  UNION
  SELECT e.m, c.label FROM comp c JOIN edges e ON e.n = c.node
)
SELECT node AS doc_id, (min(label) = node) AS keep
FROM comp GROUP BY node ORDER BY doc_id
"""


def oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    """Oracle SQL per query, buildable for any sf dir (the driver
    evaluates at sf0.01, the default).  The three oracles that inline
    data-derived literals (IVF centroids, LSH hyperplanes, the derived
    world's phash column) are built lazily and OMITTED — degrading that
    query to the driver's rows-only check — if their inputs are
    unavailable, rather than raising."""
    n_eff = "(SELECT count(*) - (count(*) % 16) FROM documents)"
    out = {
        "crawl_web_derivation": f"""
            SELECT doc_id,
                   {_URL_SQL} AS url,
                   'h' || CAST(doc_id % 16 AS VARCHAR) || '.test' AS host,
                   CASE WHEN doc_id % 37 = 0 THEN 404 ELSE 200 END AS code,
                   CASE WHEN doc_id % 37 = 0 THEN 0
                        WHEN doc_id % 11 = 0 THEN 4 ELSE 3 END AS n_links
            FROM documents
        """,
        "crawl_bfs_depth2": f"""
            WITH RECURSIVE
            links AS (
                SELECT d.doc_id AS src,
                       ((d.doc_id + k.k * 16 * (1 + ((d.doc_id // 16) % 64))) % {n_eff}) AS dst
                FROM documents d CROSS JOIN (SELECT unnest([1,2,3]) AS k) k
                WHERE (d.doc_id % 37) <> 0
            ),
            reach(doc_id, depth) AS (
                SELECT doc_id, 0 FROM documents
                WHERE doc_id < {_NUM_SEEDS} AND {_ALLOWED_SQL}
                UNION
                SELECT l.dst, r.depth + 1
                FROM reach r JOIN links l ON l.src = r.doc_id
                WHERE r.depth < 2
                  AND l.dst IN (SELECT doc_id FROM documents WHERE {_ALLOWED_SQL})
            )
            SELECT md5({_URL_SQL}) AS uuid,
                   {_URL_SQL} AS url,
                   MIN(depth) AS depth,
                   CASE WHEN doc_id % 37 = 0 THEN 404 ELSE 200 END AS code
            FROM reach GROUP BY doc_id
            ORDER BY url
        """,
        "crawl_link_explode": f"""
            WITH l AS (
                SELECT d.doc_id AS src,
                       ((d.doc_id + k.k * 16 * (1 + ((d.doc_id // 16) % 64))) % {n_eff}) AS dst
                FROM documents d CROSS JOIN (SELECT unnest([1,2,3]) AS k) k
                WHERE d.doc_id < {_NUM_SEEDS} AND (d.doc_id % 37) <> 0
            )
            SELECT DISTINCT
                   'http://h' || CAST(src % 16 AS VARCHAR) || '.test/p/' || CAST(src AS VARCHAR) AS url,
                   'http://h' || CAST(dst % 16 AS VARCHAR) || '.test/p/' || CAST(dst AS VARCHAR) AS link
            FROM l ORDER BY url, link
        """,
        "crawl_robots_filter": f"""
            SELECT doc_id, {_URL_SQL} AS url
            FROM documents WHERE {_ALLOWED_SQL}
        """,
        "crawl_pattern_filter": f"""
            SELECT doc_id, {_URL_SQL} AS url
            FROM documents
            WHERE regexp_matches('/p/' || CAST(doc_id AS VARCHAR), '/p/')
              AND NOT regexp_matches('/p/' || CAST(doc_id AS VARCHAR), '0$')
        """,
        "crawl_uuids": f"""
            SELECT doc_id, {_URL_SQL} AS url, md5({_URL_SQL}) AS uuid
            FROM documents
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, min(doc_id) AS doc_id
            FROM documents GROUP BY 1
        """,
        "dedup_embedding_cosine": """
            SELECT x.vec_id AS a, y.vec_id AS b
            FROM embeddings x, embeddings y
            WHERE x.vec_id < y.vec_id
              AND list_cosine_similarity(x.embedding, y.embedding) >= 0.42
            ORDER BY 1, 2
        """,
        "ann_cosine_topk": """
            SELECT query_id, neighbor_id, rank FROM (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id
                       ) AS rank
                FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
                WHERE q.vec_id < 10
            ) WHERE rank <= 5
            ORDER BY query_id, rank
        """,
        "ann_range_search": """
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id
            FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
            WHERE q.vec_id < 10
              AND list_cosine_similarity(q.embedding, e.embedding) >= 0.3
            ORDER BY 1, 2
        """,
        "events_tumbling_window": """
            SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS win_us,
                   event_type,
                   count(*) AS n_events,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "events_hopping_window": """
            SELECT win_us, event_type, count(*) AS n_events FROM (
              SELECT (epoch_us(ts) // 900000000) * 900000000 - j.j * 900000000 AS win_us,
                     event_type
              FROM events CROSS JOIN (SELECT unnest(range(4)) AS j) j
            ) WHERE win_us >= 0
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "events_top_users": """
            SELECT event_type, user_id, n_events, rank FROM (
              SELECT event_type, user_id, count(*) AS n_events,
                     row_number() OVER (PARTITION BY event_type ORDER BY count(*) DESC, user_id) AS rank
              FROM events GROUP BY event_type, user_id
            ) WHERE rank <= 3 ORDER BY event_type, rank
        """,
        "events_sessionize": """
            WITH e AS (
              SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                     lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
              FROM events
            ), s AS (
              SELECT user_id, ts_us,
                     sum(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 14400000000 THEN 1 ELSE 0 END)
                         OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sess
              FROM e
            )
            SELECT user_id, min(ts_us) AS session_start_us,
                   max(ts_us) AS session_end_us, count(*) AS n_events
            FROM s GROUP BY user_id, sess ORDER BY user_id, session_start_us
        """,
        "events_quantiles": """
            SELECT event_type,
                   quantile_cont(value, 0.5) AS p50,
                   quantile_cont(value, 0.9) AS p90,
                   quantile_cont(value, 0.99) AS p99
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        # inclusive as-of: DuckDB ASOF JOIN picks the greatest v.ts
        # satisfying p.ts >= v.ts per (user, purchase) — the same
        # match the Ray op's forward-fill resolves
        "events_asof_join": """
            SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
                   epoch_us(v.ts) AS match_ts_us,
                   epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
              ON p.user_id = v.user_id AND p.ts >= v.ts
            ORDER BY p.event_id
        """,
        "events_type_stats": """
            SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
            FROM events GROUP BY 1 ORDER BY 1
        """,
        # HLL p=12 replayed exactly: register ranks via length(bin())
        # (exact bit length, no float log), harmonic sum as a HUGEINT,
        # and the same float expression order as ops.windows._hll_estimate
        "events_approx_distinct": """
            WITH h AS (
              SELECT event_type,
                     ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT AS h
              FROM events
            ), r AS (
              SELECT event_type,
                     CAST(h >> 52 AS INTEGER) AS idx,
                     CASE WHEN (h & ((1::UBIGINT << 52) - 1::UBIGINT)) = 0::UBIGINT THEN 53
                          ELSE 53 - length(bin(h & ((1::UBIGINT << 52) - 1::UBIGINT))) END AS rho
              FROM h
            ), m AS (
              SELECT event_type, idx, max(rho) AS mj FROM r GROUP BY 1, 2
            ), reg AS (
              SELECT event_type,
                     sum(CAST(1 AS HUGEINT) << (53 - mj))
                       + (4096 - count(*)) * (CAST(1 AS HUGEINT) << 53) AS s_int,
                     4096 - count(*) AS v
              FROM m GROUP BY 1
            )
            SELECT event_type,
                   CAST(floor(CASE WHEN (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0 * 9007199254740992.0 / CAST(s_int AS DOUBLE) <= 10240.0 AND v > 0
                                   THEN 4096.0 * ln(4096.0 / v)
                                   ELSE (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0 * 9007199254740992.0 / CAST(s_int AS DOUBLE) END) AS BIGINT) AS n_users_est
            FROM reg ORDER BY event_type
        """,
        "text_token_counts": """
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
                   length(text) AS n_chars
            FROM documents
        """,
        "text_quality": """
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   len(regexp_extract_all(lower(text), '\\b(the|and|of|a|to|in|is)\\b')) AS stop_cnt,
                   len(regexp_extract_all(text, '[.!?,;:]')) AS punct_cnt
            FROM documents
        """,
        "text_fingerprint": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(string_split(text, ' ')) AS tok,
                     generate_subscripts(string_split(text, ' '), 1) AS i
              FROM documents
            ), h AS (
              SELECT doc_id, i, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h FROM toks
            ), wm AS (
              SELECT doc_id, i, h,
                     min(h) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m,
                     count(*) OVER (PARTITION BY doc_id) AS cnt
              FROM h
            ), sel AS (
              SELECT doc_id, CASE WHEN cnt < 4 THEN h ELSE m END AS v
              FROM wm WHERE cnt < 4 OR i <= cnt - 3
            )
            SELECT doc_id, CAST(bit_xor(v) & 9223372036854775807 AS BIGINT) AS fingerprint
            FROM sel GROUP BY doc_id ORDER BY doc_id
        """,
        "docs_sample_pct": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT % 100 < 20
        """,
        "docs_sample_stratified": """
            SELECT lang, doc_id, rank FROM (
              SELECT lang, doc_id,
                     row_number() OVER (
                       PARTITION BY lang
                       ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT, doc_id
                     ) AS rank
              FROM documents
            ) WHERE rank <= 10 ORDER BY lang, rank
        """,
        # vocab counts DISTINCT md5-u64 token hashes (the shared
        # Python/SQL hash) — equal to distinct tokens modulo 64-bit
        # md5 collisions, which the Ray side counts identically
        "text_vocab": """
            WITH toks AS (
              SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
            )
            SELECT lang,
                   count(DISTINCT ('0x' || substr(md5(tok), 1, 16))::UBIGINT) AS vocab,
                   count(*) AS n_tokens
            FROM toks GROUP BY lang ORDER BY lang
        """,
        "text_lang_id": """
            WITH w AS (
              SELECT doc_id,
                     list_transform(regexp_extract_all(text, '[a-zA-Z]+'), x -> lower(x)) AS toks,
                     len(regexp_extract_all(text, '[^\\x00-\\x7F]')) AS nonascii,
                     length(text) AS nchars
              FROM documents
            ), v AS (
              SELECT doc_id, toks, nonascii, nchars,
                len(list_filter(toks, x -> x IN ('the','and','of','a','to','is','in','that','it'))) AS v_en,
                len(list_filter(toks, x -> x IN ('el','la','de','y','que','en','un','una','los'))) AS v_es,
                len(list_filter(toks, x -> x IN ('der','die','das','und','ist','ein','nicht','mit'))) AS v_de,
                len(list_filter(toks, x -> x IN ('le','la','les','de','et','un','une','est','que'))) AS v_fr
              FROM w
            )
            SELECT doc_id,
              CASE WHEN len(toks) > 0 AND nonascii > nchars * 0.3 THEN 'zh'
                   WHEN greatest(v_de, v_en, v_es, v_fr) = 0 THEN 'unknown'
                   WHEN v_de = greatest(v_de, v_en, v_es, v_fr) THEN 'de'
                   WHEN v_en = greatest(v_de, v_en, v_es, v_fr) THEN 'en'
                   WHEN v_es = greatest(v_de, v_en, v_es, v_fr) THEN 'es'
                   ELSE 'fr' END AS pred_lang
            FROM v ORDER BY doc_id
        """,
        "dedup_simhash": """
            WITH toks AS (
              SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws FROM documents
            ), words AS (
              SELECT doc_id, unnest(ws) AS w FROM toks
            ), wh AS (
              SELECT doc_id, ('0x' || substr(md5(w), 1, 16))::UBIGINT AS h FROM words
            ), bits AS (
              SELECT doc_id, b.bit, SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS acc
              FROM wh CROSS JOIN (SELECT unnest(range(64)) AS bit) b
              GROUP BY doc_id, b.bit
            ), sh AS (
              SELECT doc_id, SUM(CASE WHEN acc > 0 THEN (1::UBIGINT << CAST(bit AS INTEGER)) ELSE 0::UBIGINT END)::UBIGINT AS s
              FROM bits GROUP BY doc_id
            )
            SELECT x.doc_id AS a, y.doc_id AS b
            FROM sh x JOIN sh y ON x.doc_id < y.doc_id
            WHERE bit_count(xor(x.s, y.s)) <= 3
            ORDER BY 1, 2
        """,
        "dedup_ngram_jaccard": """
            WITH toks AS (
              SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t FROM documents
            ), gl AS (
              SELECT doc_id, CASE WHEN len(t) = 0 THEN []
                                  WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                                  ELSE list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END AS gs
              FROM toks
            ), g AS (
              SELECT DISTINCT doc_id, unnest(gs) AS gram FROM gl
            ), sz AS (
              SELECT doc_id, count(*) AS s FROM g GROUP BY 1
            ), ix AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
              FROM g x JOIN g y ON y.gram = x.gram AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            )
            SELECT ix.a, ix.b FROM ix
            JOIN sz sa ON sa.doc_id = ix.a JOIN sz sb ON sb.doc_id = ix.b
            WHERE CAST(ix.c AS DOUBLE) / (sa.s + sb.s - ix.c) >= 0.5
            ORDER BY 1, 2
        """,
        "dedup_minhash_lsh": _minhash_oracle_sql(),
        # relational plans (integer cents: round(x*100) — the source
        # doubles are 2-decimal, so never at a .5 rounding boundary)
        "tpch_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(c) AS BIGINT) AS sum_base_c,
                   CAST(sum(c*(100-d)) AS BIGINT) AS sum_disc_cc,
                   CAST(sum(c*(100-d)*(100+t)) AS BIGINT) AS sum_charge_cccc,
                   count(*) AS n_rows
            FROM (SELECT l_returnflag, l_linestatus, l_quantity,
                         CAST(round(l_extendedprice*100) AS BIGINT) AS c,
                         CAST(round(l_discount*100) AS BIGINT) AS d,
                         CAST(round(l_tax*100) AS BIGINT) AS t
                  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-12-01')
            GROUP BY 1,2 ORDER BY 1,2
        """,
        "tpch_order_revenue": """
            SELECT o.o_orderkey, epoch_us(o.o_orderdate) AS o_orderdate_us, o.o_orderpriority,
                   CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                            * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_cc
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-06-30'
              AND l.l_shipdate > TIMESTAMP '1998-06-30'
            GROUP BY 1,2,3 ORDER BY revenue_cc DESC, o_orderkey LIMIT 20
        """,
        "tpch_region_sales": """
            SELECT r.r_name, n.n_name, count(*) AS n_orders,
                   CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY 1,2 ORDER BY 1,2
        """,
        "tpch_unshipped_orders": """
            SELECT o.o_orderkey, epoch_us(o.o_orderdate) AS o_orderdate_us,
                   CAST(round(o.o_totalprice*100) AS BIGINT) AS o_totalprice_c
            FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                              WHERE l.l_orderkey = o.o_orderkey
                                AND l.l_shipdate > TIMESTAMP '1998-06-30')
            ORDER BY 1
        """,
        # Gopher-style word repetition numerators (space-split words ==
        # DuckDB string_split; top word ties -> smallest word)
        "text_repetition": """
            WITH w AS (
              SELECT doc_id, CAST(u.i AS INTEGER) AS pos,
                     string_split(text,' ')[CAST(u.i AS INTEGER)] AS word
              FROM documents, unnest(range(1, len(string_split(text,' ')) + 1)) AS u(i)
            ), stats AS (
              SELECT doc_id, count(*) AS n_words, count(DISTINCT word) AS n_distinct_words FROM w GROUP BY 1
            ), wc AS (
              SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY 1,2
            ), top AS (
              SELECT doc_id, top_word_chars FROM (
                SELECT doc_id, length(word)*cnt AS top_word_chars,
                       row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, word ASC) AS rn FROM wc)
              WHERE rn = 1
            ), g2 AS (
              SELECT a.doc_id, a.word || ' ' || b.word AS gram
              FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
            ), g2s AS (
              SELECT doc_id, count(*) - count(DISTINCT gram) AS n_dup_2grams FROM g2 GROUP BY 1
            )
            SELECT s.doc_id, s.n_words, s.n_distinct_words, t.top_word_chars,
                   CAST(coalesce(g.n_dup_2grams, 0) AS BIGINT) AS n_dup_2grams
            FROM stats s JOIN top t USING(doc_id) LEFT JOIN g2s g USING(doc_id) ORDER BY doc_id
        """,
        # window=32 / stride=24 (1-based inclusive DuckDB list slice)
        "docs_chunk_tokens": """
            WITH d AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
            c AS (
              SELECT doc_id, CAST(u.j AS BIGINT) AS chunk_id,
                     ws[1 + 24*u.j : least(24*u.j + 32, len(ws))] AS cw
              FROM d, unnest(range(0, (len(ws) + 23) // 24)) AS u(j)
              WHERE 24*u.j < len(ws)
            )
            SELECT doc_id, chunk_id, CAST(len(cw) AS BIGINT) AS n_tokens,
                   array_to_string(cw, ' ') AS chunk_text
            FROM c ORDER BY doc_id, chunk_id
        """,
        # integer floor-division idf — engine-exact (a float ln idf
        # would hash-drift); terms/k mirror queries()
        "text_tfidf_topk": """
            WITH w AS (
              SELECT doc_id, string_split(text,' ')[CAST(u.i AS INTEGER)] AS word
              FROM documents, unnest(range(1, len(string_split(text,' ')) + 1)) AS u(i)
            ), tf AS (
              SELECT doc_id, word, count(*) AS tf FROM w
              WHERE word IN ('hash','merge','window','table') GROUP BY 1,2
            ), df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS n FROM documents),
            sc AS (
              SELECT tf.word AS term, tf.doc_id,
                     tf.tf * ((n.n * 1000000) // df.df) AS score_int
              FROM tf JOIN df ON df.word = tf.word CROSS JOIN n
            ), r AS (
              SELECT *, row_number() OVER (PARTITION BY term ORDER BY score_int DESC, doc_id) AS rank FROM sc)
            SELECT term, doc_id, CAST(score_int AS BIGINT) AS score_int, rank
            FROM r WHERE rank <= 10 ORDER BY term, rank
        """,
        "crawl_pagerank": _pagerank_oracle_sql(iters=5),
        "dedup_clusters": _clusters_oracle_sql(),
        # greedy step-wise funnel: t_k = earliest step-k event at/after
        # t_{k-1}; complete iff t3 - t1 <= 7 days
        "events_funnel": """
            WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
            s1 AS (SELECT user_id, min(t) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(t) AS t2 FROM e JOIN s1 USING(user_id)
                   WHERE e.event_type = 'click' AND e.t >= s1.t1 GROUP BY 1),
            s3 AS (SELECT e.user_id, min(t) AS t3 FROM e JOIN s2 USING(user_id)
                   WHERE e.event_type = 'purchase' AND e.t >= s2.t2 GROUP BY 1)
            SELECT s1.user_id, s1.t1 AS t1_us, s2.t2 AS t2_us, s3.t3 AS t3_us
            FROM s1 JOIN s2 USING(user_id) JOIN s3 USING(user_id)
            WHERE s3.t3 - s1.t1 <= 604800000000 ORDER BY 1
        """,
        "events_retention": """
            WITH a AS (SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS w FROM events)
            SELECT a.w AS week, count(*) AS n_active,
                   CAST(count(b.user_id) AS BIGINT) AS n_retained
            FROM a LEFT JOIN a b ON b.user_id = a.user_id AND b.w = a.w + 1
            GROUP BY 1 ORDER BY 1
        """,
        "events_user_pivot": """
            SELECT user_id,
                   count(*) FILTER (event_type = 'view') AS n_view,
                   count(*) FILTER (event_type = 'click') AS n_click,
                   count(*) FILTER (event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (event_type = 'signup') AS n_signup,
                   count(*) FILTER (event_type = 'error') AS n_error,
                   CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS total_value_c
            FROM events GROUP BY 1 ORDER BY 1
        """,
        # greedy first-fit packing replayed as a recursive CTE that
        # steps one row per pack group per iteration
        "docs_pack_greedy": """
            WITH RECURSIVE t AS (
              SELECT doc_id, doc_id // 32 AS g,
                     CAST(len(string_split(text,' ')) AS BIGINT) AS tok,
                     row_number() OVER (PARTITION BY doc_id // 32 ORDER BY doc_id) AS rn
              FROM documents
            ), p AS (
              SELECT g, rn, doc_id, tok, tok AS fill, CAST(0 AS BIGINT) AS bin FROM t WHERE rn = 1
              UNION ALL
              SELECT t.g, t.rn, t.doc_id, t.tok,
                     CASE WHEN p.fill + t.tok > 256 THEN t.tok ELSE p.fill + t.tok END,
                     CASE WHEN p.fill + t.tok > 256 THEN p.bin + 1 ELSE p.bin END
              FROM t JOIN p ON t.g = p.g AND t.rn = p.rn + 1
            )
            SELECT doc_id, g AS pack_group, bin AS bin_id, tok AS n_tokens
            FROM p ORDER BY doc_id
        """,
        # per-host rollup of the depth-2 crawl (same reach CTE as
        # crawl_bfs_depth2, grouped by host)
        "crawl_host_stats": f"""
            WITH RECURSIVE
            links AS (
                SELECT d.doc_id AS src,
                       ((d.doc_id + k.k * 16 * (1 + ((d.doc_id // 16) % 64))) % {n_eff}) AS dst
                FROM documents d CROSS JOIN (SELECT unnest([1,2,3]) AS k) k
                WHERE (d.doc_id % 37) <> 0
            ),
            reach(doc_id, depth) AS (
                SELECT doc_id, 0 FROM documents
                WHERE doc_id < {_NUM_SEEDS} AND {_ALLOWED_SQL}
                UNION
                SELECT l.dst, r.depth + 1
                FROM reach r JOIN links l ON l.src = r.doc_id
                WHERE r.depth < 2
                  AND l.dst IN (SELECT doc_id FROM documents WHERE {_ALLOWED_SQL})
            ),
            pages AS (SELECT doc_id, MIN(depth) AS depth FROM reach GROUP BY doc_id)
            SELECT 'h' || CAST(doc_id % 16 AS VARCHAR) || '.test' AS host,
                   count(*) AS n_pages,
                   CAST(sum(CASE WHEN doc_id % 37 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_404,
                   CAST(MIN(depth) AS BIGINT) AS min_depth,
                   CAST(MAX(depth) AS BIGINT) AS max_depth
            FROM pages GROUP BY 1 ORDER BY 1
        """,
        "events_type_transitions": """
            WITH e AS (
              SELECT user_id, event_type,
                     lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events)
            SELECT prev AS prev_type, event_type, count(*) AS n
            FROM e WHERE prev IS NOT NULL GROUP BY 1,2 ORDER BY 1,2
        """,
        # fixed $10 bins over integer cents (all values positive, so
        # DuckDB's truncating // == numpy's floor //)
        "events_value_histogram": """
            SELECT event_type,
                   (CAST(round(value*100) AS BIGINT) // 1000) * 1000 AS bin,
                   count(*) AS n_events
            FROM events GROUP BY 1,2 ORDER BY 1,2
        """,
        # per-(label, dim) vector sums; the DOUBLE cast matters — the
        # stored floats are float32 and DuckDB would otherwise multiply
        # in float32 while numpy promotes to float64
        "emb_label_sums": """
            WITH v AS (
              SELECT label, CAST(u.i - 1 AS BIGINT) AS dim,
                     CAST(round(CAST(embedding[CAST(u.i AS INTEGER)] AS DOUBLE) * 1000000) AS BIGINT) AS x
              FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
            )
            SELECT label, dim, CAST(sum(x) AS BIGINT) AS sum_scaled,
                   CAST(count(*) AS BIGINT) AS n_vectors
            FROM v GROUP BY 1,2 ORDER BY 1,2
        """,
        # composite curation verdict (thresholds mirror ops/curate.py)
        "docs_curation": r"""
            WITH w AS (
              SELECT doc_id, string_split(text,' ')[CAST(u.i AS INTEGER)] AS word
              FROM documents, unnest(range(1, len(string_split(text,' ')) + 1)) AS u(i)
            ), stats AS (
              SELECT doc_id, count(*) AS n_words, count(DISTINCT word) AS n_distinct FROM w GROUP BY 1
            ), wc AS (SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY 1,2),
            top AS (
              SELECT doc_id, top_chars FROM (
                SELECT doc_id, length(word)*cnt AS top_chars,
                       row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, word ASC) AS rn FROM wc)
              WHERE rn = 1
            ), sig AS (
              SELECT d.doc_id, s.n_words, s.n_distinct, t.top_chars,
                     len(regexp_extract_all(lower(d.text), '\b(the|and|of|a|to|in|is)\b')) AS stop_cnt,
                     length(d.text) AS n_chars,
                     ('0x'||substr(md5(d.text),1,16))::UBIGINT AS h
              FROM documents d JOIN stats s USING(doc_id) JOIN top t USING(doc_id)
            ), dd AS (SELECT h, min(doc_id) AS keeper FROM sig GROUP BY 1)
            SELECT sig.doc_id,
                   (sig.doc_id = dd.keeper) AS keep_dedup,
                   (sig.n_words BETWEEN 30 AND 500 AND sig.stop_cnt >= 2) AS keep_quality,
                   (sig.n_distinct * 10 >= sig.n_words * 3 AND sig.top_chars * 5 <= sig.n_chars) AS keep_repetition,
                   (sig.doc_id = dd.keeper AND sig.n_words BETWEEN 30 AND 500 AND sig.stop_cnt >= 2
                    AND sig.n_distinct * 10 >= sig.n_words * 3 AND sig.top_chars * 5 <= sig.n_chars) AS keep
            FROM sig JOIN dd USING(h) ORDER BY doc_id
        """,
        # benchmark contamination: the eval set (doc_id % 97 == 0)
        # contributes its distinct word 8-grams; n_hits = how many of
        # those a document contains.  Joins on the gram STRINGS; the
        # Ray op joins on their md5-u64 hashes (identical modulo 2^-64
        # collisions — the shared house hash recipe)
        "docs_contamination": r"""
            WITH toks AS (
              SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t FROM documents
            ), gl AS (
              SELECT doc_id, CASE WHEN len(t) = 0 THEN []
                                  WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
                                  ELSE list_transform(range(1, len(t) - 6), i -> array_to_string(t[i:i+7], ' ')) END AS gs
              FROM toks
            ), g AS (SELECT DISTINCT doc_id, unnest(gs) AS gram FROM gl),
            bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
            hits AS (SELECT g.doc_id, count(*) AS n_hits FROM g JOIN bench USING (gram) GROUP BY 1)
            SELECT d.doc_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
                   COALESCE(h.n_hits, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits h USING (doc_id)
            ORDER BY doc_id
        """,
    }
    for name, builder in (
        ("ann_ivf_topk", _ivf_oracle_sql),
        ("dedup_embedding_lsh", _embedding_lsh_oracle_sql),
        ("dedup_semantic", _semantic_oracle_sql),
        ("crawl_phash_neardup", _phash_neardup_oracle_sql),
        ("crawl_decode_verify", _decode_verify_oracle_sql),
    ):
        try:
            out[name] = builder(sf_dir)
        except Exception as e:  # noqa: BLE001 — degrade to rows-only, never break the whole dict
            # visible degradation (ADVICE r3): a silently-missing oracle
            # weakens the correctness harness with no signal
            import logging

            logging.getLogger("polipus_ray.oracles").warning(
                "oracle_sql: builder for %r failed (%s: %s) — query degrades to the rows-only check", name, type(e).__name__, e
            )
    return out
