"""Training-data pipeline operators over the driver testdata tables
(documents / embeddings) and the crawl pages table — the 100 TB-scale
toolbox that complements the crawl engine: dedup (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding cosine), similarity search (brute
cosine + IVF), text analysis (lang-id, quality, tokens, fingerprint),
image stages (decode / phash / near-dup suppression)."""

from .ann import ann_range_search, ann_topk_bruteforce, ann_topk_ivf
from .dedup import embedding_dup_pairs, exact_dedup, minhash_lsh_pairs, ngram_jaccard_pairs, simhash_pairs
from .images import decode_stage, phash_neardup_keep_first
from .text import fingerprints, lang_id, quality_stats, token_counts
from .windows import (
    approx_distinct_users,
    event_type_stats,
    hopping_window,
    session_windows,
    top_users_per_type,
    tumbling_window,
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
]
