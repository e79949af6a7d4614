"""CrawlConfig — the reference's 28-option config surface
(reference lib/polipus.rb:23-84) re-expressed for the Ray engine.

Options keep the reference names and defaults where the concept
survives; options that are artifacts of the Ruby/Redis runtime
(timeouts on a network queue, redis factories, signal handler...) are
kept as accepted-but-inert fields so a reference user's config dict
still loads, with the replacement semantics noted inline.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class CrawlConfig:
    # --- reference options (same names/defaults) -------------------------
    workers: int = 4  # -> fetch actor-pool concurrency
    user_agent: Any = "polipus-ray - 0.1.0"  # str or list (sampled per-URL by hash, O6)
    depth_limit: Any = False  # False = unlimited
    redirect_limit: int = 5
    # 'parquet'|'lance'|'devnull'.  The reference defaults to DevNull
    # (lib/polipus.rb:111); this engine defaults to the durable sink
    # because the pages parquet IS the pipeline's dataflow — pass
    # 'devnull' explicitly for the discard-everything bench mode
    # (exists? always false, rounds deleted after link extraction).
    storage: str = "parquet"
    proxy_host: Any = None  # inert: no network
    proxy_port: Any = False  # inert
    proxy_user: Any = None  # inert
    proxy_pass: Any = None  # inert
    read_timeout: int = 30  # inert: simulated fetch
    open_timeout: int = 10  # inert
    queue_timeout: int = 30  # termination is exact (empty frontier), not a timeout
    url_tracker: Any = None  # injected SeenShardPool; default cuckoo pool
    redis_options: dict = field(default_factory=dict)  # inert
    logger: Any = None
    logger_level: Any = None
    include_query_string_in_saved_page: bool = True
    queue_items_limit: int = 2_000_000  # per-round active frontier cap (spill beyond)
    queue_overflow_adapter: Any = None  # 'parquet'|'capped'|'devnull'|None
    queue_overflow_manager_check_time: int = 60  # inert: spill handled per round
    stats_enabled: bool = False  # metrics always recorded in round manifests
    cookie_jar: Any = None  # optional pre-seeded {host: cookie} dict
    # T4 parity (reference http.rb:143-152, 193, 211): when True the
    # fetch actor keeps a per-host cookie jar — the simulated server
    # sets a deterministic session cookie on every response, later
    # requests to that host carry it (recorded in `cookies_sent`).
    # Host-bucket affinity makes the jar exact per host.  The jar is
    # actor-local and NOT checkpointed: after crash-resume each host
    # starts a fresh cookie session, so `cookies_sent` can differ from
    # an uninterrupted run (documented determinism exception).
    accept_cookies: bool = False
    domain_aliases: list = field(default_factory=list)
    connection_max_hits: Any = None  # inert: actor lifetime = pool lifetime
    ttl_page: Any = None  # page TTL seconds (recrawl)
    obey_robots_txt: bool = False
    enable_signal_handler: bool = True  # graceful stop = finish round + checkpoint

    # --- patterns / hooks (reference builder methods) --------------------
    follow_links_like: list = field(default_factory=list)  # regex strings (whitelist)
    skip_links_like: list = field(default_factory=list)  # regex strings (blacklist)
    storage_except: list = field(default_factory=list)  # columns dropped before store (M21)

    # --- Ray-engine knobs (new; scale surface) ---------------------------
    fetch_concurrency: Any = None  # actor pool size; default = workers
    fetch_batch_size: int = 1024
    # seen/stored shard-actor count; None = max(8, workers // 2).
    # Shards serve batched probes from EVERY fetch actor (fused
    # mark-stored + admission check_and_add); undersizing serializes
    # the fetch barrier behind shard RPC queues (8 shards under a
    # 32-actor pool cost ~30% of the round), while shards ~= workers
    # oversubscribes the cores and stalls the fetch actors themselves
    # (W=16 with 16 shards measured 2x slower than with 8).
    num_seen_shards: Any = None
    seen_kind: str = "cuckoo"  # 'cuckoo' | 'exact'
    # None = auto: the engine provisions 1.25x the world's URL count
    # across the shards (min 1M/shard, the reference bloomfilter
    # default).  An explicit int is respected as-is.  A fixed default
    # collapses at scale: an under-provisioned cuckoo spills into its
    # overflow stash, whose linear scans exploded the admit-probe
    # phase 37x on a 14.4M-URL crawl with 8 shards (BASELINE.md r4s9).
    seen_capacity_per_shard: Any = None
    # NOTE: the frontier/web partitioning key space (host buckets) is a
    # property of the WORLD layout (world.json num_buckets), not config —
    # the engine reads it from the world manifest.
    max_urls_per_host_per_round: int = 0  # 0 = uncapped; bounds skew/straggler tail
    # pool mode: after each round, move a bounded number of host
    # buckets from the most- to the least-loaded fetch actors using the
    # NEXT round's exact per-bucket row counts (the static web-size LUT
    # can't see per-wave variance — measured 1.13 rows-skew at 7.2M).
    # Semantics stay byte-identical: a bucket's per-host politeness
    # clocks + cookie jar migrate with it, between rounds only.
    rebalance_buckets: bool = True
    overflow_capped_max: int = 0  # capped spill adapter: keep newest N (O5)
    politeness_default_delay: float = 0.0  # seconds of virtual clock per host fetch
    retry_errors: int = 0  # re-enqueue error pages once when > 0 (error_handling pattern)
    # decode every fetched payload + recompute/verify its perceptual
    # hash in the fetch actor (the analogue of the reference parsing
    # every body with Nokogiri; the M15/PSNR invariant path).  Adds a
    # `payload_ok` column.
    verify_payload: bool = False
    # perceptual-hash pyramid depth for verify_payload: 1 = stored-size
    # phash only; k > 1 additionally fingerprints k-1 downsampled
    # scales (multi-scale near-dup robustness; standard image-ingest
    # practice and the bench's representative per-payload compute)
    phash_scales: int = 1
    simulate_politeness_wall_clock: bool = False  # if True, fetcher really sleeps
    checkpoint: bool = True
    # True (default): global FIFO seq assignment — crawl order matches
    #   the reference byte-for-byte (the ordering oracle).  Since r2
    #   this is ALSO cluster-friendly: only 28-byte narrow keys
    #   (hashes + ordering) cross the driver; candidate rows stay in
    #   the fetch actors, which write their own frontier parts after
    #   the driver sends back admitted positions + seqs.
    # False: each fetch actor admits + spills its own candidates
    #   (tracker probe + seq assignment in-actor, composite seq) — no
    #   driver participation at all: stored set / seen set / per-round
    #   depth order unchanged, intra-round total order approximate.
    # See BASELINE.md for the measured scaling of both modes.
    deterministic_order: bool = True
    # force the det-mode DRIVER-merge admission (28 B/candidate key
    # tables shipped to the driver) instead of the distributed path
    # (keys pre-split to plasma, shard-side probes, driver ranks only
    # admitted rows).  Both are byte-identical (pinned by
    # test_det_admission_distributed_equals_driver_merge); this is the
    # A/B switch and ops fallback.  POLIPUS_DET_DRIVER_ADMIT=1 in the
    # WORKER environment forces it too.
    det_driver_admit: bool = False
    # plasma-frontier override: None = auto (pool scheduler, no
    # checkpoint, single node); True forces Ray-object spill parts even
    # on a multi-node cluster (the 2-virtual-node measurement path —
    # see tests/multinode_script.py); False forces parquet parts.
    plasma_frontier: bool | None = None
    # record per-round part routing + object locations (driver-side
    # introspection for the multi-node locality measurement; off in
    # production — it adds a get_object_locations call per round)
    route_telemetry: bool = False
    # 'pool': persistent fetch-actor pool, fixed bucket->actor affinity,
    #   politeness clocks + web-bucket cache persist across rounds, link
    #   extraction fused in-actor (one barrier per round).
    # 'dataset': each round is a pure ray.data pipeline
    #   (groupby(host_bucket).map_groups(Fetcher) -> write_parquet).
    # Same stage callables either way — semantics identical.
    fetch_mode: str = "pool"
    # rounds with <= this many active frontier rows run driver-side
    # through the SAME stage callables (no cluster dispatch): the BFS
    # tail/merge-small-rounds optimization.  0 disables.
    small_round_threshold: int = 4096
    clock: Callable[[], int] | None = None  # injected unix-seconds clock (determinism)
    # columns the driver-side on_page_downloaded/on_page_error hooks
    # see.  None = every stored column EXCEPT the payload bytes (the
    # driver never materializes payloads; list 'bytes' explicitly if a
    # hook truly needs them).
    hook_columns: list | None = None

    def resolved_fetch_concurrency(self) -> int:
        return int(self.fetch_concurrency or self.workers)

    def resolved_num_seen_shards(self) -> int:
        if self.num_seen_shards is not None:
            return int(self.num_seen_shards)
        return max(8, self.resolved_fetch_concurrency() // 2)

    def effective_user_agent(self) -> str:
        """The robots-matching UA: reference samples once at client
        construction (polipus.rb:133-137); we pin the deterministic
        first entry (no RNG in the workflow)."""
        ua = self.user_agent
        if isinstance(ua, (list, tuple)):
            return str(ua[0]) if ua else "polipus-ray"
        return str(ua)

    def user_agent_for(self, url_hash: int) -> str:
        """Per-request UA choice (O6).  Reference samples randomly per
        request when a list is configured (http.rb:84-90); here the
        choice is the deterministic ``ua[url_hash % len]`` so runs are
        reproducible."""
        ua = self.user_agent
        if isinstance(ua, (list, tuple)):
            return str(ua[int(url_hash) % len(ua)]) if ua else "polipus-ray"
        return str(ua)

    def depth_allowed(self, depth: int) -> bool:
        """reference lib/polipus.rb:239: expand links iff
        depth_limit == false or depth_limit > page.depth"""
        return self.depth_limit is False or self.depth_limit is None or int(self.depth_limit) > depth
