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
