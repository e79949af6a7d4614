"""Training-data curation pipeline — the ops-library counterpart of
the crawl examples: curate a document corpus (quality + repetition +
exact-dedup verdicts), cluster near-duplicates, pack the survivors
into fixed-token sequences, and build a term index — each stage a
Ray Data pipeline from polipus_ray.ops.

Run from /root/repo:  python examples/training_data.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False)

from polipus_ray.ops import curation, dedup_clusters, pack_greedy, tfidf_topk

SF = "/root/testdata/sf0.001"

# 1. per-document verdicts: keep_dedup (exact, first-occurrence-wins),
#    keep_quality (length + stopword floor), keep_repetition (Gopher-
#    style distinct/top-word ratios)
verdicts = curation(SF).to_pandas()
kept = verdicts[verdicts["keep"]]
print(f"curation: {len(kept)}/{len(verdicts)} docs kept")

# 2. near-duplicate clusters (MinHash-LSH pairs -> connected
#    components); keep one representative per cluster
clusters = dedup_clusters(SF, threshold=0.8).to_pandas()
n_clusters = clusters["cluster_id"].nunique()
print(f"clusters: {len(clusters)} docs in {n_clusters} clusters ({int(clusters['keep'].sum())} representatives)")

# 3. pack the corpus into 256-token training sequences (greedy
#    first-fit, parallel across 32-doc pack groups)
packs = pack_greedy(SF, capacity=256, group=32).to_pandas()
print(f"packing: {len(packs)} docs -> {packs.groupby('pack_group')['bin_id'].max().add(1).sum()} sequences")

# 4. a quick term index over the corpus (integer-exact TF-IDF)
top = tfidf_topk(SF, terms=("hash", "merge", "window"), k=3).to_pandas()
print("tf-idf top docs per term:")
for r in top.itertuples():
    print(f"  {r.term:>8} #{r.rank}: doc {r.doc_id} (score {r.score_int})")

ray.shutdown()
