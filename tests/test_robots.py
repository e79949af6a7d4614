"""Robots matrix mirroring reference spec/polipus/robotex_spec.rb,
including the dead-Allow quirk (see polipus_ray/robots.py docstring)."""

from polipus_ray.robots import ParsedRobots, RobotsCache

ROBOTS = """\
# comment
User-Agent: msnbot
Crawl-Delay: 20

User-Agent: bender
Disallow: /my_shiny_metal_ass

User-Agent: *
Disallow: /secret/*
Disallow: /tmp
Crawl-Delay: 2
"""


def test_disallow_wildcard_and_prefix():
    pr = ParsedRobots.parse(ROBOTS)
    assert pr.allowed("http://h.test/", "foo")
    assert pr.allowed("http://h.test/ok/page", "foo")
    assert not pr.allowed("http://h.test/tmp", "foo")
    assert not pr.allowed("http://h.test/tmpanything", "foo")  # ^-anchored prefix
    assert not pr.allowed("http://h.test/secret/x/y", "foo")
    # agent-specific rule applies only to matching agent
    assert not pr.allowed("http://h.test/my_shiny_metal_ass", "bender")
    assert pr.allowed("http://h.test/my_shiny_metal_ass", "foo")


def test_allow_rules_are_dead_code():
    # reference robotex.rb:58-66: Allow block runs while allowed==true,
    # guarded by `unless allowed` -> never consulted.
    body = "User-agent: *\nAllow: /tmp/ok\nDisallow: /tmp\n"
    pr = ParsedRobots.parse(body)
    assert not pr.allowed("http://h.test/tmp/ok", "foo")


def test_delay_per_agent():
    pr = ParsedRobots.parse(ROBOTS)
    assert pr.delay("msnbot") == 20
    assert pr.delay("foo") == 2


def test_missing_robots_allows_all():
    cache = RobotsCache({}, user_agent="foo")
    assert cache.allowed("http://nowhere.test/anything")
    assert cache.delay("nowhere.test") is None


def test_query_string_matched():
    # request_uri includes the query string
    pr = ParsedRobots.parse("User-agent: *\nDisallow: /p?x=*\n")
    assert not pr.allowed("http://h.test/p?x=1", "foo")
    assert pr.allowed("http://h.test/p", "foo")


def test_per_request_ua_robots_matching():
    """With a UA list, robots rules match each request's sampled UA
    ``ua[url_hash(u64) % len]`` — reference parity with Robotex
    matching against the requesting client's UA (polipus.rb:133-137):
    a bot-specific Disallow only blocks the URLs whose sampled UA is
    that bot."""
    import numpy as np

    from polipus_ray.config import CrawlConfig
    from polipus_ray.frontier.stages import _policy_mask, compile_policy
    from polipus_ray.urltools import url_hash64

    body = "User-agent: evilbot\nDisallow: /\nUser-agent: *\nDisallow: /private\n"
    uas = ["goodbot", "evilbot"]
    cfg = CrawlConfig(user_agent=uas, obey_robots_txt=True)
    robots, follow, skip = compile_policy({"h.example": body}, cfg)
    assert robots.n_agents() == 2
    urls = [f"http://h.example/doc/{i}" for i in range(50)] + ["http://h.example/private/x"]
    hosts = ["h.example"] * len(urls)
    uh = np.array([url_hash64(u) for u in urls], dtype=np.uint64)
    keep = _policy_mask(urls, hosts, robots, follow, skip, uhash=uh)
    # NB: uint64 % python-int promotes to float64 and loses precision
    # near 2^64 — keep the modulo in exact uint64 (as the engine does)
    idx = (uh % np.uint64(2)).astype(np.int64)
    expect = np.array(
        [uas[int(i)] != "evilbot" for i in idx[:-1]] + [False],  # /private blocked for both
        dtype=bool,
    )
    assert (keep == expect).all()
    assert keep[:-1].any() and not keep[:-1].all()  # both agents exercised
    # uhash omitted -> computed internally, same answer
    assert (_policy_mask(urls, hosts, robots, follow, skip) == expect).all()
    # single-UA config: unchanged legacy behavior (rules of that UA only)
    cfg1 = CrawlConfig(user_agent="goodbot", obey_robots_txt=True)
    r1, f1, s1 = compile_policy({"h.example": body}, cfg1)
    k1 = _policy_mask(urls, hosts, r1, f1, s1)
    assert k1[:-1].all() and not k1[-1]


def test_allowed_mask_matches_per_row_allowed_on_odd_shapes():
    """The vectorized allowed_mask (RE2 request-uri extraction + one
    combined-alternation kernel per host/ua) must equal per-row
    ``allowed`` on every shape path_of special-cases: empty path,
    "?"-leading request-uri, fragments, no-netloc URLs, query-string
    rules, wildcard rules, and rule-free hosts."""
    import numpy as np
    import pyarrow as pa

    bodies = {
        "a.test": "User-agent: *\nDisallow: /secret/*\nDisallow: /tmp\nDisallow: /p?x=*\nDisallow: /été\n",
        "q.test": "User-agent: *\nDisallow: /?drop=1\n",
        "free.test": "User-agent: *\nAllow: /\n",
    }
    cache = RobotsCache(bodies, user_agent="foo")
    urls = [
        "http://a.test/",  # empty-ish path
        "http://a.test",  # NO path at all -> path_of '/'
        "http://a.test/tmpanything",
        "http://a.test/secret/x/y",
        "http://a.test/ok#frag",
        "http://a.test/tmp#frag",  # fragment stripped before match
        "http://a.test/p?x=1",  # query string matched
        "http://a.test/p?y=1",
        "http://a.test/%C3%A9t%C3%A9",  # escaped utf-8 path (no match: rule is raw)
        "http://a.test/été",  # raw utf-8 path (matches)
        "http://q.test?drop=1",  # '?'-leading request-uri -> '/?drop=1'
        "http://q.test/?drop=1",
        "http://q.test/keep",
        "http://free.test/anything",
        "relative/no-netloc",  # urlsplit fallback branch of path_of
    ]
    hosts = [u.split("/")[2].split("#")[0].split("?")[0] if "://" in u else "a.test" for u in urls]
    expect = np.array([cache.allowed(u, host=h) for u, h in zip(urls, hosts)], dtype=bool)
    got_list = cache.allowed_mask(urls, hosts)
    assert (got_list == expect).all()
    # Arrow input path, chunked
    ua = pa.chunked_array([urls[:7], urls[7:]])
    ha = pa.chunked_array([hosts[:7], hosts[7:]])
    got_arrow = cache.allowed_mask(ua, ha)
    assert (got_arrow == expect).all()
