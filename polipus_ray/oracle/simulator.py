"""Reference-semantics crawl simulator — the test oracle.

A direct, single-threaded transliteration of the reference's
workers=1 message loop (lib/polipus.rb:166-264 takeover,
:375-395 should_be_visited?, :404-416 page_expired?/page_exists?,
:429-435 enqueue, lib/polipus/http.rb:161-182 redirect folding).
The reference's own specs run workers=1 precisely because that makes
FIFO order deterministic (spec/polipus_spec.rb:8); this simulator IS
that deterministic semantics, against the synthetic web table instead
of VCR cassettes.

The Ray engine must match this simulator on: fetch order, stored
uuid set (+codes/aliases/depths), and tracker (URL-seen) contents.
Intentionally simple and slow — dict/deque, no Ray, no numpy.
"""

from __future__ import annotations

import re
from collections import deque
from dataclasses import dataclass, field

from ..config import CrawlConfig
from ..robots import RobotsCache
from ..urltools import canonicalize, host_of, page_uuid, strip_query


@dataclass
class SimPage:
    url: str
    referer: str = ""
    depth: int = 0
    seeded: bool = False
    code: int | None = None
    caption: str | None = None
    links: list[str] = field(default_factory=list)
    content_type: str = ""
    aliases: list[str] = field(default_factory=list)
    base_href: str | None = None
    error: str | None = None
    fetched_at: int | None = None
    doc_id: int | None = None


@dataclass
class SimResult:
    order: list[str]  # urls in fetch order
    stored: dict[str, SimPage]  # uuid -> page
    tracker: set[str]  # tracked (visited) url strings
    fetch_count: int = 0
    error_count: int = 0


def simulate_crawl(
    web: dict[str, dict],
    robots_bodies: dict[str, str],
    seeds: list[str],
    cfg: CrawlConfig,
    clock_start: int = 1_000_000,
) -> SimResult:
    """web: canonical url -> row dict with keys
    (code, links, content_type, redirect_to, caption, doc_id)."""
    inc_qs = cfg.include_query_string_in_saved_page
    # raw user_agent (possibly a list): robots matching resolves each
    # request's UA as ua[url_hash(u64) % len] — mirrors the engine
    robots = RobotsCache(robots_bodies, cfg.user_agent) if cfg.obey_robots_txt else None
    follow = [re.compile(p) for p in cfg.follow_links_like]
    skip = [re.compile(p) for p in cfg.skip_links_like]
    tracker: set[str] = set()
    stored: dict[str, SimPage] = {}
    order: list[str] = []
    clock = [clock_start]
    res = SimResult(order=order, stored=stored, tracker=tracker)

    def track_key(url: str) -> str:
        return url if inc_qs else strip_query(url)

    def uuid_of(url: str) -> str:
        return page_uuid(url, inc_qs)

    def path_part(url: str) -> str:
        # reference matches patterns against url.path (not request_uri)
        from urllib.parse import urlsplit

        return urlsplit(url).path

    def page_expired(url: str) -> bool:
        if cfg.ttl_page is None:
            return False
        sp = stored.get(uuid_of(url))
        if sp is None or sp.fetched_at is None:
            return False
        return (clock[0] - cfg.ttl_page) > sp.fetched_at

    def should_be_visited(url: str, with_tracker: bool = True) -> bool:
        # ordered case: robots -> whitelist -> blacklist -> expired(->True)
        # -> tracker(->False) -> True     (lib/polipus.rb:375-395)
        if robots is not None:
            ua_idx = int(url_hash64(url, True) % robots.n_agents()) if robots.n_agents() > 1 else 0
            if not robots.allowed(url, ua_idx=ua_idx):
                return False
        p = path_part(url)
        if follow and not any(rx.search(p) for rx in follow):
            return False
        if any(rx.search(p) for rx in skip):
            return False
        if page_expired(url):
            return True
        if with_tracker and track_key(url) in tracker:
            return False
        return True

    def page_exists(page: SimPage) -> bool:
        if page.seeded:
            return False
        return uuid_of(page.url) in stored and not page_expired(page.url)

    def fetch(msg: SimPage) -> SimPage:
        """Follow redirect chain <= redirect_limit; cross-host stops;
        final page wins, earlier URLs -> aliases (http.rb:161-182,
        polipus.rb:204-216)."""
        hops: list[str] = []
        url = msg.url
        while True:
            row = web.get(url)
            if row is None:
                # any hop failing -> single error page with the original URL
                # (http.rb:63-71); fetched_at stays nil on error pages
                return SimPage(url=msg.url, referer=msg.referer, depth=msg.depth, seeded=msg.seeded, error="connection failed", fetched_at=None)
            hops.append(url)
            rt = row.get("redirect_to")
            if rt:
                rt = canonicalize(rt, url)  # relative Location (http.rb:167)
            # follow while: 3xx + location + same host + under limit;
            # a cross-host or over-limit redirect page is itself the final
            # page (http.rb:161-182, 276-278)
            if 300 <= row["code"] < 400 and rt and host_of(rt) == host_of(url) and len(hops) <= cfg.redirect_limit:
                url = rt
                continue
            break
        row = web[hops[-1]]
        clock[0] += 1
        return SimPage(
            url=hops[-1],
            referer=msg.referer,
            depth=msg.depth,
            seeded=msg.seeded,
            code=row["code"],
            caption=row.get("caption"),
            links=list(row.get("links") or []),
            content_type=row.get("content_type", ""),
            aliases=hops[:-1],
            base_href=row.get("base_href"),
            fetched_at=clock[0],
            doc_id=row.get("doc_id"),
        )

    def links_for(page: SimPage) -> list[str]:
        # canonicalize, in-domain filter, dedup preserving order (page.rb:66-78)
        out, seen_local = [], set()
        ph = host_of(page.url)
        base = page.base_href or page.url
        for raw in page.links:
            c = canonicalize(raw, base)
            if c is None:
                continue
            if host_of(c) != ph and host_of(c) not in cfg.domain_aliases:
                continue
            if c not in seen_local:
                seen_local.add(c)
                out.append(c)
        return out

    q: deque[SimPage] = deque()
    for u in seeds:
        cu = canonicalize(u)
        q.append(SimPage(url=cu, seeded=True, depth=0))

    while q:
        msg = q.popleft()
        if not should_be_visited(msg.url, with_tracker=False):
            continue
        if page_exists(msg):
            continue
        page = fetch(msg)
        if page.aliases and page_exists(page):
            continue  # redirect-final already stored (polipus.rb:209-213)
        if page.error:
            res.error_count += 1
        stored[uuid_of(page.url)] = page  # storable default true
        order.append(page.url)
        res.fetch_count += 1
        if cfg.depth_allowed(page.depth):
            for link in links_for(page):
                if should_be_visited(link, with_tracker=True):
                    q.append(SimPage(url=link, referer=page.url, depth=page.depth + 1))
                    tracker.add(track_key(link))
    return res


def web_table_to_dict(table) -> dict[str, dict]:
    """Arrow web table -> {url: row dict} for the simulator."""
    cols = ["url", "code", "links", "content_type", "redirect_to", "caption", "doc_id", "base_href"]
    d = table.select([c for c in cols if c in table.column_names]).to_pylist()
    return {r["url"]: r for r in d}
