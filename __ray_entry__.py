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
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )
    from polipus_ray.ops.text import fingerprints, lang_id, quality_stats, token_counts
    from polipus_ray.pipelines import crawl_queries as cq

    return {
        # crawl engine operators (SQL-oracle-checked)
        "crawl_web_derivation": cq.crawl_web_derivation,
        "crawl_bfs_depth2": cq.crawl_bfs_depth2,
        "crawl_link_explode": cq.crawl_link_explode,
        "crawl_robots_filter": cq.crawl_robots_filter,
        "crawl_pattern_filter": cq.crawl_pattern_filter,
        "crawl_uuids": cq.crawl_uuids,
        # crawl image stages (rows-only)
        "crawl_phash_neardup": cq.crawl_phash_neardup,
        "crawl_decode_verify": cq.crawl_decode_verify,
        # training-data operators (SQL-oracle-checked)
        "dedup_exact": exact_dedup,
        "dedup_embedding_cosine": lambda sf: embedding_dup_pairs(sf, threshold=0.42),
        "ann_cosine_topk": lambda sf: ann_topk_bruteforce(sf, k=5, num_queries=10),
        "text_token_counts": token_counts,
        "text_quality": quality_stats,
        # training-data operators (rows-only: not SQL-expressible)
        "dedup_minhash_lsh": lambda sf: minhash_lsh_pairs(sf, threshold=0.8),
        "dedup_simhash": lambda sf: simhash_pairs(sf, max_hamming=3),
        "dedup_ngram_jaccard": lambda sf: ngram_jaccard_pairs(sf, n=3, threshold=0.5),
        "ann_ivf_topk": lambda sf: ann_topk_ivf(sf, k=5, num_queries=10, nlist=8, nprobe=5),
        "text_lang_id": lang_id,
        "text_fingerprint": fingerprints,
    }


def oracle_sql() -> dict[str, str]:
    n_eff = "(SELECT count(*) - (count(*) % 16) FROM documents)"
    return {
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
    }
