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


def crawler(job_name: str = "polipus", urls=(), *, world_dir: str, run_dir: str | None = None, configure=None, **options):
    """One-call crawl API mirroring ``Polipus.crawler(job, urls, opts)
    { |c| ... }`` (reference lib/polipus.rb:18-20): build the engine,
    apply the configure callback (hook registration), run the crawl,
    return the engine.

    >>> eng = crawler("job", ["http://h0.test/p/0"], world_dir=wd,
    ...               depth_limit=2, configure=lambda c: c.on_page_downloaded(fn))
    """
    import tempfile

    from .config import CrawlConfig
    from .frontier.engine import CrawlEngine

    cfg = CrawlConfig(**options)
    run_dir = run_dir or tempfile.mkdtemp(prefix=f"polipus_ray_{job_name}_")
    eng = CrawlEngine(world_dir, cfg, run_dir)
    if configure is not None:
        configure(eng)
    if urls:
        eng.seed(list(urls))
    eng.crawl()
    return eng
