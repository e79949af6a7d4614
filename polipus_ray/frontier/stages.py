"""Stage callables shared by the distributed (Ray Dataset) and the
driver-side (small-round) execution paths — one implementation, two
schedulers, so the paths cannot diverge semantically.

Filter precedence replicates should_be_visited? exactly
(reference lib/polipus.rb:375-395): robots -> whitelist -> blacklist
-> TTL-expired(->admit) -> tracker(->drop) -> admit; the tracker probe
doubles as the insert (enqueue marks visited, :433)."""

from __future__ import annotations

import re
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa

from ..config import CrawlConfig
from ..robots import RobotsCache
from ..urltools import canonicalize, host_hash64, host_of, url_hash64

_HTML_RE = re.compile(r"^(text/html|application/xhtml\+xml)\b")

FRONTIER_COLS = ["url", "host", "url_hash", "host_hash", "host_bucket", "referer", "depth", "seeded", "seq", "priority", "attempt", "user_data"]
PAGE_NARROW = ["url", "host", "links", "depth", "seq", "code", "content_type", "error", "base_href"]


def _i64(v: int) -> int:
    """64-bit hash -> int64 bit pattern (Arrow/parquet-friendly)."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _u64col(arr) -> np.ndarray:
    return np.asarray(arr, dtype=np.int64).view(np.uint64)


def frontier_table(rows: list[dict], num_buckets: int, include_qs: bool = True) -> pa.Table:
    """Frontier-schema Arrow table from row dicts with at least
    {url, referer, depth}; fills hashes/buckets/flags."""
    cols: dict[str, list] = {c: [] for c in FRONTIER_COLS}
    for r in rows:
        url = r["url"]
        host = host_of(url)
        cols["url"].append(url)
        cols["host"].append(host)
        cols["url_hash"].append(_i64(url_hash64(url, include_qs)))
        hh = host_hash64(host)
        cols["host_hash"].append(_i64(hh))
        cols["host_bucket"].append(hh % num_buckets)
        cols["referer"].append(r.get("referer", ""))
        cols["depth"].append(r.get("depth", 0))
        cols["seeded"].append(bool(r.get("seeded", False)))
        cols["seq"].append(r.get("seq", 0))
        cols["priority"].append(r.get("priority", 0))
        cols["attempt"].append(r.get("attempt", 0))
        cols["user_data"].append(r.get("user_data", "{}"))
    types = {
        "url": pa.string(),
        "host": pa.string(),
        "url_hash": pa.int64(),
        "host_hash": pa.int64(),
        "host_bucket": pa.int32(),
        "referer": pa.string(),
        "depth": pa.int32(),
        "seeded": pa.bool_(),
        "seq": pa.int64(),
        "priority": pa.int64(),
        "attempt": pa.int32(),
        "user_data": pa.string(),
    }
    return pa.table({k: pa.array(v, types[k]) for k, v in cols.items()})


def _policy_mask(urls, hosts, robots: RobotsCache | None, follow, skip, uhash=None) -> np.ndarray:
    """should_be_visited? prefix (robots -> whitelist -> blacklist),
    lib/polipus.rb:375-384.  Patterns match url.path.

    ``urls``/``hosts`` may be lists or Arrow string arrays (Arrow is
    the hot path: URL strings materialize only for rule-bearing
    hosts' rows inside allowed_mask).
    ``uhash``: optional uint64 url-hash array; with a UA LIST
    configured, each row's robots rules are matched against its
    per-request UA ``ua[uhash % len]`` (the same index the fetcher
    samples for the request's ``ua`` column — reference parity:
    Robotex matches against the requesting client's UA)."""
    n = len(urls)
    keep = np.ones(n, dtype=bool)
    if robots is not None:
        keep &= robots.allowed_mask(urls, hosts, uhash=uhash)
    if follow or skip:
        if not isinstance(urls, list):
            urls = urls.to_pylist()
        paths = [urlsplit(u).path for u in urls]
        if follow:
            keep &= np.fromiter((any(rx.search(p) for rx in follow) for p in paths), dtype=bool, count=n)
        if skip:
            keep &= np.fromiter((not any(rx.search(p) for rx in skip) for p in paths), dtype=bool, count=n)
    return keep


def compile_policy(robots_bodies: dict, cfg: CrawlConfig):
    # the raw user_agent (possibly a list) goes to the cache so robots
    # matching can resolve per-request UAs (see _policy_mask)
    robots = RobotsCache(robots_bodies, cfg.user_agent) if cfg.obey_robots_txt else None
    follow = [re.compile(p) for p in cfg.follow_links_like]
    skip = [re.compile(p) for p in cfg.skip_links_like]
    return robots, follow, skip


def make_prefetch_filter(robots_bodies: dict, cfg: CrawlConfig, pool, now: int):
    """Dequeue-side re-check: policy sans tracker + storage anti-join
    (page_exists? with seed/retry bypass and TTL re-admission)."""
    robots, follow, skip = compile_policy(robots_bodies, cfg)
    ttl = cfg.ttl_page

    def prefetch_filter(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
        uh = _u64col(batch["url_hash"])
        keep = _policy_mask(
            batch["url"], batch["host"], robots, follow, skip, uhash=uh if cfg.include_query_string_in_saved_page else None
        )
        hh = _u64col(batch["host_hash"])
        exists, ts = pool.stored_info(uh, hh)
        expired = np.zeros(n, dtype=bool) if ttl is None else (exists & (ts >= 0) & ((now - ttl) > ts))
        seeded = np.asarray(batch["seeded"].to_numpy(zero_copy_only=False), dtype=bool)
        retry = np.asarray(batch["attempt"].to_numpy(zero_copy_only=False)) > 0
        keep &= seeded | retry | ~exists | expired
        return batch.filter(pa.array(keep))

    return prefetch_filter


# Arrow-RE2 patterns for the vectorized extractor.  The fast-path
# test must be a SUBSET of urltools._FAST_RE's Python-re semantics so
# RE2 rejects fall back to canonicalize() (which re-applies its own
# fast/slow logic) — any engine divergence then costs only speed,
# never output.  The one known divergence: Python's ``$`` also matches
# before a trailing newline, RE2's does not, so RE2 strictly rejects
# more (tested in test_urltools).
_FAST_PAT = r"^https?://[A-Za-z0-9._~\-]+(:[0-9]+)?/[A-Za-z0-9._~!$&'()*+,;=:@/\-]*(\?[A-Za-z0-9._~!$&'()*+,;=:@/\-]+)?$"
_DOT_PAT = r"/\.{1,2}(/|\?|$)"
_HTML_PAT = _HTML_RE.pattern  # anchored, RE2-compatible
_NETLOC_PAT = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?P<h>[^/?#]*)"

_CAND_SCHEMA = {
    "url": pa.string(),
    "host": pa.string(),
    "url_hash": pa.int64(),
    "host_hash": pa.int64(),
    "host_bucket": pa.int32(),
    "referer": pa.string(),
    "depth": pa.int32(),
    "parent_seq": pa.int64(),
    "link_idx": pa.int32(),
}


def _empty_cand() -> pa.Table:
    return pa.table({k: pa.array([], t) for k, t in _CAND_SCHEMA.items()})


def make_link_extractor(cfg: CrawlConfig, focus_crawl=None, num_buckets: int = 16, robots_bodies: dict | None = None):
    """Pages (narrow) -> candidate link rows.  When ``robots_bodies``
    is given, the enqueue-policy prefix (robots/whitelist/blacklist)
    is fused into this stage so candidates arrive pre-filtered and
    only the tracker/TTL step remains (driver-side).

    Two implementations, identical outputs (equivalence pinned in
    test_crawl): a VECTORIZED path (Arrow list_flatten + RE2 kernels +
    batched md5; ~2.5-3x the row loop — this was the largest actor
    phase of the crawl barrier) and the original row loop, kept for
    ``focus_crawl`` (the user hook receives per-page row dicts)."""
    if focus_crawl is None:
        return _make_link_extractor_vec(cfg, num_buckets, robots_bodies)
    return _make_link_extractor_rows(cfg, focus_crawl, num_buckets, robots_bodies)


def _make_link_extractor_vec(cfg: CrawlConfig, num_buckets: int, robots_bodies: dict | None):
    import pyarrow.compute as pc

    from ..ops.md5vec import md5_u64_arrow, md5_u64_strs
    from ..urltools import strip_query

    aliases = set(cfg.domain_aliases)
    inc = cfg.include_query_string_in_saved_page
    policy = compile_policy(robots_bodies, cfg) if robots_bodies is not None else None
    alias_arr = pa.array(sorted(aliases)) if aliases else None

    def link_extractor(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _empty_cand()
        # page-level gates: error-free, depth allowed, HTML-ish
        err = batch["error"]
        err_ok = pc.fill_null(pc.or_kleene(pc.is_null(err), pc.equal(err, "")), False).to_numpy(zero_copy_only=False)
        depth = batch["depth"].to_numpy()
        d_ok = np.zeros(n, dtype=bool)
        for d in np.unique(depth):
            if cfg.depth_allowed(int(d)):
                d_ok |= depth == d
        html = pc.fill_null(pc.match_substring_regex(pc.fill_null(batch["content_type"], ""), _HTML_PAT), False).to_numpy(zero_copy_only=False)
        page_keep = err_ok & d_ok & html
        if not page_keep.any():
            return _empty_cand()
        sub = batch.filter(pa.array(page_keep))
        links = sub["links"].combine_chunks()
        parent = np.asarray(pc.list_parent_indices(links)).astype(np.int64)
        flat = pc.list_flatten(links)
        m = len(flat)
        if m == 0:
            return _empty_cand()
        # canonicalize: RE2 fast-path passthrough; the rest through
        # the full python canonicalize (rare on clean corpora)
        fastm = pc.match_substring_regex(flat, _FAST_PAT)
        dots = pc.match_substring_regex(flat, _DOT_PAT)
        fast = pc.fill_null(pc.and_(fastm, pc.invert(dots)), False).to_numpy(zero_copy_only=False)
        canon_arr = flat
        slow_idx = np.flatnonzero(~fast)
        if slow_idx.size:
            raw_slow = flat.take(pa.array(slow_idx)).to_pylist()
            base_col = sub["base_href"].to_pylist() if "base_href" in sub.column_names else [None] * sub.num_rows
            url_col = sub["url"].to_pylist()
            repl = [canonicalize(raw, base_col[pi] or url_col[pi]) for raw, pi in zip(raw_slow, parent[slow_idx])]
            mask_slow = np.zeros(m, dtype=bool)
            mask_slow[slow_idx] = True
            canon_arr = pc.replace_with_mask(flat, pa.array(mask_slow), pa.array(repl, pa.string()))
        valid = pc.is_valid(canon_arr).to_numpy(zero_copy_only=False)
        # host_of, vectorized for plain ascii netlocs without
        # userinfo/port; python host_of for the rest
        netloc = pc.struct_field(pc.extract_regex(canon_arr, _NETLOC_PAT), "h")
        simple = pc.fill_null(
            pc.and_(pc.string_is_ascii(netloc), pc.invert(pc.match_substring_regex(netloc, "[@:]"))), False
        ).to_numpy(zero_copy_only=False)
        host_arr = pc.utf8_lower(pc.fill_null(netloc, ""))
        fb = np.flatnonzero(valid & ~simple)
        if fb.size:
            canon_fb = canon_arr.take(pa.array(fb)).to_pylist()
            mask_fb = np.zeros(m, dtype=bool)
            mask_fb[fb] = True
            host_arr = pc.replace_with_mask(host_arr, pa.array(mask_fb), pa.array([host_of(c) for c in canon_fb], pa.string()))
        # in-domain filter (page.rb:201-204)
        page_host = pc.take(sub["host"].combine_chunks(), pa.array(parent))
        same = pc.fill_null(pc.equal(host_arr, page_host), False).to_numpy(zero_copy_only=False)
        if alias_arr is not None:
            same |= pc.fill_null(pc.is_in(host_arr, value_set=alias_arr), False).to_numpy(zero_copy_only=False)
        sel0 = np.flatnonzero(valid & same)
        if sel0.size == 0:
            return _empty_cand()
        # per-page first-occurrence dedup (page.rb:68 Set semantics)
        codes = pc.dictionary_encode(canon_arr.take(pa.array(sel0))).indices.to_numpy(zero_copy_only=False).astype(np.int64)
        _, first = np.unique((parent[sel0] << 32) | codes, return_index=True)
        sel = sel0[np.sort(first)]
        canon_f = canon_arr.take(pa.array(sel))
        host_f = host_arr.take(pa.array(sel))
        parent_f = parent[sel]
        # per-page link_idx over emitted rows (parent_f nondecreasing)
        _, firstpos, counts = np.unique(parent_f, return_index=True, return_counts=True)
        li = (np.arange(sel.size) - np.repeat(firstpos, counts)).astype(np.int32)
        # url_hash64: one md5 per DISTINCT url (links repeat ~3x within
        # a share — dictionary_encode dedups at C level), hashed by the
        # vectorized numpy-lane md5 kernel (bit-identical to hashlib,
        # i.e. to _i64(hash64(u)) — pinned in test_ops/test_urltools)
        ud = pc.dictionary_encode(canon_f)
        uidx = ud.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if inc:
            # hash straight off the dictionary's UTF-8 buffer — no
            # per-string Python encode (that prep cost ~3x the hashing)
            urlh_u = md5_u64_arrow(ud.dictionary).view(np.int64)
        else:
            hash_src = [strip_query(u) for u in ud.dictionary.to_pylist()]
            urlh_u = md5_u64_strs(hash_src, errors="surrogatepass").view(np.int64)
        urlh = urlh_u[uidx]
        # host hashes via per-batch dictionary (few distinct hosts)
        hd = pc.dictionary_encode(host_f)
        hosts_uni = hd.dictionary.to_pylist()
        hidx = hd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        hh_uni = np.array([_i64(host_hash64(h)) for h in hosts_uni], dtype=np.int64)
        hb_uni = (hh_uni.view(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
        seq_sub = sub["seq"].to_numpy()
        depth_sub = sub["depth"].to_numpy()
        t = pa.table(
            {
                "url": canon_f,
                "host": host_f,
                "url_hash": pa.array(urlh, pa.int64()),
                "host_hash": pa.array(hh_uni[hidx], pa.int64()),
                "host_bucket": pa.array(hb_uni[hidx], pa.int32()),
                "referer": pc.take(sub["url"].combine_chunks(), pa.array(parent_f)),
                "depth": pa.array((depth_sub[parent_f] + 1).astype(np.int32), pa.int32()),
                "parent_seq": pa.array(seq_sub[parent_f], pa.int64()),
                "link_idx": pa.array(li, pa.int32()),
            }
        )
        if policy is not None and t.num_rows:
            robots, follow, skip = policy
            keep = _policy_mask(canon_f, host_f, robots, follow, skip, uhash=urlh.view(np.uint64) if inc else None)
            t = t.filter(pa.array(keep))
        return t

    return link_extractor


def _make_link_extractor_rows(cfg: CrawlConfig, focus_crawl, num_buckets: int, robots_bodies: dict | None):
    aliases = set(cfg.domain_aliases)
    inc = cfg.include_query_string_in_saved_page
    policy = compile_policy(robots_bodies, cfg) if robots_bodies is not None else None

    def link_extractor(batch: pa.Table) -> pa.Table:
        urls, hosts, urlh, hosth, buckets, refs, depths, pseqs, lidx = [], [], [], [], [], [], [], [], []
        # column lists, not to_pylist() row dicts (a dict per row is
        # the measured hot cost at 60k-row batches)
        c_err = batch["error"].to_pylist()
        c_depth = batch["depth"].to_pylist()
        c_ct = batch["content_type"].to_pylist()
        c_links = batch["links"].to_pylist()
        c_url = batch["url"].to_pylist()
        c_host = batch["host"].to_pylist()
        c_base = batch["base_href"].to_pylist() if "base_href" in batch.column_names else [None] * batch.num_rows
        c_seq = batch["seq"].to_pylist()
        c_code = batch["code"].to_pylist() if (focus_crawl is not None and "code" in batch.column_names) else None
        # host hash/bucket memo: pages cluster on few hosts per batch
        hh_cache: dict[str, tuple[int, int]] = {}
        for j in range(batch.num_rows):
            if c_err[j]:
                continue
            depth = c_depth[j]
            if not cfg.depth_allowed(depth):
                continue
            if not _HTML_RE.search(c_ct[j] or ""):
                continue  # links parsed only from HTML-ish pages (page.rb:87,126)
            if focus_crawl is not None:
                # user hook receives the PAGE_NARROW row dict
                raw_links = focus_crawl(
                    {
                        "url": c_url[j],
                        "host": c_host[j],
                        "links": c_links[j],
                        "depth": depth,
                        "seq": c_seq[j],
                        "code": c_code[j] if c_code is not None else None,
                        "content_type": c_ct[j],
                        "error": c_err[j],
                        "base_href": c_base[j],
                    }
                )
            else:
                raw_links = c_links[j] or []
            page_url = c_url[j]
            page_host = c_host[j]
            resolve_base = c_base[j] or page_url  # <base href> override (M7, page.rb:157-165)
            seen_local: set[str] = set()
            li = 0
            for raw in raw_links:
                c = canonicalize(raw, resolve_base)
                if c is None:
                    continue
                h = host_of(c)
                if h != page_host and h not in aliases:
                    continue  # in-domain filter (page.rb:201-204)
                if c in seen_local:
                    continue  # per-page Set dedup (page.rb:68)
                seen_local.add(c)
                urls.append(c)
                hosts.append(h)
                urlh.append(_i64(url_hash64(c, inc)))
                got = hh_cache.get(h)
                if got is None:
                    hh = host_hash64(h)
                    got = (_i64(hh), hh % num_buckets)
                    hh_cache[h] = got
                hosth.append(got[0])
                buckets.append(got[1])
                refs.append(page_url)
                depths.append(depth + 1)
                pseqs.append(c_seq[j])
                lidx.append(li)
                li += 1
        t = pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "host": pa.array(hosts, pa.string()),
                "url_hash": pa.array(urlh, pa.int64()),
                "host_hash": pa.array(hosth, pa.int64()),
                "host_bucket": pa.array(buckets, pa.int32()),
                "referer": pa.array(refs, pa.string()),
                "depth": pa.array(depths, pa.int32()),
                "parent_seq": pa.array(pseqs, pa.int64()),
                "link_idx": pa.array(lidx, pa.int32()),
            }
        )
        if policy is not None and t.num_rows:
            robots, follow, skip = policy
            keep = _policy_mask(urls, hosts, robots, follow, skip, uhash=np.array(urlh, dtype=np.int64).view(np.uint64) if inc else None)
            t = t.filter(pa.array(keep))
        return t

    return link_extractor


def distinct_candidates(cand: pa.Table) -> pa.Table:
    """Intra-round distinct (A6): deterministic first discovery wins —
    sort by (parent_seq, link_idx), keep first row per url_hash."""
    if cand.num_rows == 0:
        return cand
    order = np.lexsort((cand["link_idx"].to_numpy(), cand["parent_seq"].to_numpy()))
    cand = cand.take(pa.array(order))
    _, first_idx = np.unique(cand["url_hash"].to_numpy(), return_index=True)
    return cand.take(pa.array(np.sort(first_idx)))


def tracker_admit_mask(uh: np.ndarray, hh: np.ndarray, pool, cfg: CrawlConfig, now: int) -> np.ndarray:
    """Index-space core of :func:`tracker_admit`: the admission mask
    over (url_hash, host_hash) arrays, first-occurrence-wins within
    the batch (check_and_add probes unique keys; later duplicates read
    "visited").  Lets callers gather the wide candidate table ONCE
    with only the admitted rows instead of take-all + filter."""
    n = len(uh)
    if cfg.ttl_page is not None:
        exists, ts = pool.stored_info(uh, hh)
        expired = exists & (ts >= 0) & ((now - cfg.ttl_page) > ts)
    else:
        expired = np.zeros(n, dtype=bool)
    seen = pool.check_and_add(uh, hh)
    return expired | ~seen


def tracker_admit(cand: pa.Table, pool, cfg: CrawlConfig, now: int) -> pa.Table:
    """The tracker/TTL tail of should_be_visited?: TTL-expired rows
    bypass the visited check (polipus.rb:387-390) but every admitted
    row is marked visited (check_and_add doubles as the :433 insert).
    Candidates must already be policy-filtered and distinct."""
    n = cand.num_rows
    if n == 0:
        return cand
    mask = tracker_admit_mask(_u64col(cand["url_hash"]), _u64col(cand["host_hash"]), pool, cfg, now)
    return cand.filter(pa.array(mask))


def make_mark_stored(pool):
    def mark_stored(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            pool.mark_stored(_u64col(batch["url_hash"]), _u64col(batch["host_hash"]), batch["fetched_at"].to_numpy(zero_copy_only=False))
        return batch

    return mark_stored


def filter_storable(batch: pa.Table) -> pa.Table:
    if "storable" not in batch.column_names or batch.num_rows == 0:
        return batch
    mask = np.asarray(batch["storable"].to_numpy(zero_copy_only=False), dtype=bool)
    return batch.filter(pa.array(mask))


def make_filter_storable_spool(unstorable_dir: str, storage_except: list[str] | None):
    """filter_storable for the pure-Dataset execution path: storable
    rows pass through; unstorable rows are spooled (bytes-free) to a
    side directory so driver-side page hooks still see them
    (reference fires hooks on every processed page, polipus.rb:221-237)."""

    def fn(batch: pa.Table) -> pa.Table:
        if "storable" not in batch.column_names or batch.num_rows == 0:
            return batch
        mask = np.asarray(batch["storable"].to_numpy(zero_copy_only=False), dtype=bool)
        if not mask.all():
            import os
            import uuid

            import pyarrow.parquet as pq

            un = batch.filter(pa.array(~mask))
            drop = set(storage_except or ()) | {"bytes"}
            un = un.drop_columns([c for c in drop if c in un.column_names])
            pq.write_table(un, os.path.join(unstorable_dir, f"part-{uuid.uuid4().hex}.parquet"), compression="zstd")
        return batch.filter(pa.array(mask))

    return fn
