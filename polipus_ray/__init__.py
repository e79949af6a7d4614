"""polipus_ray — a from-scratch Ray-Data-native rebuild of the crawl
engine semantics of taganaka/polipus (reference read-only at
/root/reference).

NOT a port: the reference is a Ruby thread/Redis/Mongo engine; this
package re-expresses the same observable behavior (URL frontier,
URL-seen dedup, politeness, robots gating, overflow spilling,
storage semantics) as a streaming ``ray.data.Dataset`` pipeline of
``map_batches`` stages over zero-copy Arrow batches, driven as a
BFS wave loop, over Lance/Parquet tables of image+caption pairs.

Layout:
    urltools    pure URL functions (canonicalize / uuid / hashes)
    robots      robots.txt parser + matcher (reference quirks kept)
    seen/       sharded URL-seen state (cuckoo filter + exact oracle)
    synth/      deterministic synthetic "web" world generator
    fetch/      Fetcher actor pool (simulated fetch = table lookup)
    frontier/   wave-loop crawl engine + overflow spill adapters
    store/      page stores (parquet/lance, memory, devnull)
    ckpt/       per-round checkpoint manifest + resume
    ext/        user hooks + plugin protocol
    ops/        training-data operators (dedup, ANN, text, images)
    oracle/     reference-semantics single-threaded simulator (tests)
"""

__version__ = "0.1.0"
