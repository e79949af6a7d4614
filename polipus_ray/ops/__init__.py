"""Training-data pipeline operators over the driver testdata tables
(documents / embeddings / events / TPC-H) and the crawl pages table —
the 100 TB-scale toolbox that complements the crawl engine: dedup
(exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine
exact/LSH, SemDeDup-style cluster-scoped, cluster assignment),
similarity search (brute cosine + IVF + range), text analysis
(lang-id, quality, tokens, fingerprint, vocabulary, repetition,
chunking, TF-IDF retrieval), deterministic sampling + greedy sequence
packing, event-time ops (windows, sessions, as-of join, funnel,
retention, pivot, exact quantile sieve, HLL sketch), relational plans
(rollup / hash join / star), graph analytics (integer PageRank),
corpus curation, image stages (decode / phash / near-dup
suppression)."""

from .ann import ann_range_search, ann_topk_bruteforce, ann_topk_ivf, label_vector_sums
from .dedup import (
    dedup_clusters,
    embedding_dup_pairs,
    embedding_dup_pairs_lsh,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    semantic_dup_pairs,
    simhash_pairs,
)
from .curate import curation
from .graph import pagerank
from .relational import order_revenue_topn, pricing_summary, region_sales, unshipped_orders
from .sample import pack_greedy, sample_hash_pct, sample_stratified_topk
from .images import decode_stage, phash_neardup_keep_first
from .text import (
    chunk_tokens,
    fingerprints,
    lang_id,
    quality_stats,
    repetition_stats,
    tfidf_topk,
    token_counts,
    vocab_stats,
)
from .windows import (
    approx_distinct_users,
    asof_join,
    event_type_stats,
    funnel_completions,
    hopping_window,
    quantiles_by_type,
    session_windows,
    top_users_per_type,
    tumbling_window,
    type_transitions,
    user_pivot,
    value_histogram,
    weekly_retention,
)

__all__ = [
    "ann_range_search",
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "tumbling_window",
    "hopping_window",
    "top_users_per_type",
    "session_windows",
    "event_type_stats",
    "approx_distinct_users",
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "embedding_dup_pairs",
    "decode_stage",
    "phash_neardup_keep_first",
    "lang_id",
    "quality_stats",
    "token_counts",
    "fingerprints",
    "vocab_stats",
    "embedding_dup_pairs_lsh",
    "semantic_dup_pairs",
    "sample_hash_pct",
    "sample_stratified_topk",
    "asof_join",
    "quantiles_by_type",
    "pricing_summary",
    "order_revenue_topn",
    "region_sales",
    "repetition_stats",
    "chunk_tokens",
    "tfidf_topk",
    "pagerank",
    "dedup_clusters",
    "funnel_completions",
    "weekly_retention",
    "user_pivot",
    "pack_greedy",
    "curation",
    "label_vector_sums",
    "value_histogram",
    "type_transitions",
    "unshipped_orders",
]
