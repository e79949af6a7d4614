"""End-to-end crawl invariants vs the reference-semantics simulator
(mirrors reference spec/polipus_spec.rb, which runs workers=1).

The engine must match the oracle on: stored uuid set, FIFO crawl
order (seq), aliases/referer/depth, tracker size."""

import tempfile

import pytest

from polipus_ray.config import CrawlConfig
from polipus_ray.frontier.engine import CrawlEngine
from polipus_ray.oracle.simulator import simulate_crawl, web_table_to_dict
from polipus_ray.synth.world import WorldSpec, make_web_table, robots_bodies, seed_urls, write_world

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def world_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("world")
    spec = WorldSpec(redirect_mod=23)
    write_world(str(d), DOCS, spec)
    return str(d), spec


def run_both(world_dir, spec, cfg, tmpdir=None, max_rounds=None):
    run = tmpdir or tempfile.mkdtemp(prefix="crawlrun_")
    eng = CrawlEngine(world_dir, cfg, run)
    res = eng.crawl(max_rounds=max_rounds)
    web = web_table_to_dict(make_web_table(DOCS, spec, with_images=False))
    sim = simulate_crawl(web, robots_bodies(spec), seed_urls(spec), cfg)
    return eng, res, sim


def check_parity(eng, sim):
    pt = eng.pages_table(columns=["uuid", "url", "seq", "depth", "aliases", "referer", "code"])
    order = [u for _, u in sorted(zip(pt["seq"].to_pylist(), pt["url"].to_pylist()))]
    assert set(pt["uuid"].to_pylist()) == set(sim.stored.keys())
    assert order == sim.order
    got = {r["uuid"]: (r["aliases"], r["referer"], r["depth"], r["code"]) for r in pt.to_pylist()}
    want = {u: (p.aliases, p.referer, p.depth, p.code) for u, p in sim.stored.items()}
    assert got == want


def test_depth2_robots_redirects_pool_mode(ray_session, world_dir):
    # small_round_threshold=0 forces remote execution; default mode =
    # persistent fetch-actor pool
    wd, spec = world_dir
    cfg = CrawlConfig(depth_limit=2, obey_robots_txt=True, small_round_threshold=0)
    eng, res, sim = run_both(wd, spec, cfg)
    check_parity(eng, sim)
    assert res["seen"] == len(sim.tracker)


def test_det_admission_distributed_equals_driver_merge(ray_session, world_dir, tmp_path):
    """The r5 distributed admission (keys in plasma, shard-side probe,
    driver ranks only admitted comps) must reproduce the driver-merge
    path BYTE-exactly: same stored set, same seq order, same metadata.
    cfg.det_driver_admit forces the old path on the same world."""
    wd, spec = world_dir
    cfg = CrawlConfig(depth_limit=2, obey_robots_txt=True, small_round_threshold=0, workers=3)
    eng_new, _, sim = run_both(wd, spec, cfg, tmpdir=str(tmp_path / "new"))
    check_parity(eng_new, sim)
    cfg_old = CrawlConfig(
        depth_limit=2, obey_robots_txt=True, small_round_threshold=0, workers=3, det_driver_admit=True
    )
    eng_old, _, _ = run_both(wd, spec, cfg_old, tmpdir=str(tmp_path / "old"))
    # not vacuous: each engine must have taken ITS path (the driver
    # merge records an argsort phase; the distributed path never does)
    phases = lambda e: {k for m in e.metrics for k in (m.get("phases") or {})}
    assert "admit_argsort" in phases(eng_old)
    assert "admit_argsort" not in phases(eng_new) and "admit_tracker" in phases(eng_new)
    cols = ["uuid", "url", "seq", "depth", "aliases", "referer", "code"]
    new_rows = sorted(eng_new.pages_table(columns=cols).to_pylist(), key=lambda r: r["seq"])
    old_rows = sorted(eng_old.pages_table(columns=cols).to_pylist(), key=lambda r: r["seq"])
    assert new_rows == old_rows


def test_depth2_robots_redirects_dataset_mode(ray_session, world_dir):
    # pure ray.data pipeline path (groupby.map_groups fetch)
    wd, spec = world_dir
    cfg = CrawlConfig(depth_limit=2, obey_robots_txt=True, small_round_threshold=0, fetch_mode="dataset", workers=2)
    eng, res, sim = run_both(wd, spec, cfg)
    check_parity(eng, sim)
    assert res["seen"] == len(sim.tracker)


def test_full_crawl_pure_local_engine(world_dir):
    # use_ray=False: the whole engine runs in-process (no cluster),
    # exercising the driver-local path end to end
    wd, spec = world_dir
    cfg = CrawlConfig(depth_limit=False, obey_robots_txt=True)
    run = tempfile.mkdtemp(prefix="crawllocal_")
    eng = CrawlEngine(wd, cfg, run, use_ray=False)
    res = eng.crawl()
    web = web_table_to_dict(make_web_table(DOCS, spec, with_images=False))
    sim = simulate_crawl(web, robots_bodies(spec), seed_urls(spec), cfg)
    check_parity(eng, sim)
    assert res["seen"] == len(sim.tracker)


def test_blacklist_whitelist(ray_session, world_dir):
    wd, spec = world_dir
    cfg = CrawlConfig(depth_limit=2, obey_robots_txt=True, skip_links_like=[r"/p/1\d$"], follow_links_like=[r"/p/"])
    eng, res, sim = run_both(wd, spec, cfg)
    check_parity(eng, sim)
    # blacklist actually bit: no stored page (except seeds) matches /p/1d
    import re

    urls = eng.pages_table(columns=["url", "seeded"]).to_pylist()
    assert all(not re.search(r"/p/1\d$", r["url"]) or r.get("seeded") for r in urls if r)


def test_error_pages_and_retry(ray_session, world_dir, tmp_path):
    wd, spec = world_dir
    cfg = CrawlConfig(depth_limit=1)
    run = str(tmp_path / "run")
    eng = CrawlEngine(wd, cfg, run)
    eng.seed(["http://h0.test/p/0", "http://nowhere.test/"])
    errors_seen = []
    eng.on_page_error(lambda t: errors_seen.append(t.num_rows))
    eng.crawl()
    pt = eng.pages_table(columns=["url", "error", "code", "fetched_at"])
    errs = [r for r in pt.to_pylist() if r["error"]]
    assert len(errs) == 1 and errs[0]["url"] == "http://nowhere.test/"
    assert errs[0]["code"] is None and errs[0]["fetched_at"] == -1
    assert errors_seen == [1]
    # error pages are stored (reference stores storable error pages)
    assert "http://nowhere.test/" in [r["url"] for r in pt.to_pylist()]


def test_ttl_recrawl_and_seed_refetch(ray_session, world_dir, tmp_path):
    wd, spec = world_dir
    # first takeover
    cfg = CrawlConfig(depth_limit=1, ttl_page=3600)
    run1 = str(tmp_path / "r1")
    eng1 = CrawlEngine(wd, cfg, run1)
    eng1.crawl()
    n1 = eng1.pages_table(columns=["uuid"]).num_rows
    # second takeover, same pool (shared tracker+storage manifest), fresh pages dir
    run2 = str(tmp_path / "r2")
    eng2 = CrawlEngine(wd, cfg, run2, pool=eng1.pool)
    eng2.crawl()
    pt2 = eng2.pages_table(columns=["uuid", "seeded"])
    # seeds always re-fetched (p_seeded bypass), everything else still fresh
    assert pt2.num_rows == len(seed_urls(spec))
    assert all(r["seeded"] for r in pt2.to_pylist())
    # third takeover with everything expired -> full recrawl
    cfg3 = CrawlConfig(depth_limit=1, ttl_page=0, clock=lambda: 10_000_000)
    run3 = str(tmp_path / "r3")
    eng3 = CrawlEngine(wd, cfg3, run3, pool=eng1.pool)
    eng3.crawl()
    assert eng3.pages_table(columns=["uuid"]).num_rows == n1


def test_spill_limit_and_devnull(ray_session, world_dir, tmp_path):
    wd, spec = world_dir
    # tiny active slice: crawl proceeds in small waves but completes identically
    cfg = CrawlConfig(depth_limit=2, obey_robots_txt=True, queue_items_limit=8)
    eng, res, sim = run_both(wd, spec, cfg, tmpdir=str(tmp_path / "small"))
    pt = eng.pages_table(columns=["uuid"])
    assert set(pt["uuid"].to_pylist()) == set(sim.stored.keys())
    # devnull adapter: overflow beyond the limit is dropped -> fewer pages
    cfgd = CrawlConfig(depth_limit=2, obey_robots_txt=True, queue_items_limit=8, queue_overflow_adapter="devnull")
    engd = CrawlEngine(wd, cfgd, str(tmp_path / "dn"))
    engd.crawl()
    assert engd.pages_table(columns=["uuid"]).num_rows < len(sim.stored)


def test_checkpoint_resume(ray_session, world_dir, tmp_path):
    wd, spec = world_dir
    cfg = CrawlConfig(depth_limit=3, obey_robots_txt=True)
    # uninterrupted reference run
    eng_a, _, sim = run_both(wd, spec, cfg, tmpdir=str(tmp_path / "a"))
    # interrupted: stop after 2 rounds, resume in a NEW engine
    run_b = str(tmp_path / "b")
    eng_b1 = CrawlEngine(wd, cfg, run_b)
    eng_b1.crawl(max_rounds=2)
    assert not eng_b1.spill.empty()
    eng_b2 = CrawlEngine(wd, cfg, run_b)
    eng_b2.crawl(resume=True)
    pa_ = eng_a.pages_table(columns=["uuid", "seq", "url"])
    pb = eng_b2.pages_table(columns=["uuid", "seq", "url"])
    assert set(pa_["uuid"].to_pylist()) == set(pb["uuid"].to_pylist()) == set(sim.stored.keys())
    oa = [u for _, u in sorted(zip(pa_["seq"].to_pylist(), pa_["url"].to_pylist()))]
    ob = [u for _, u in sorted(zip(pb["seq"].to_pylist(), pb["url"].to_pylist()))]
    assert oa == ob == sim.order


def test_hooks_and_storable(ray_session, world_dir, tmp_path):
    wd, spec = world_dir
    cfg = CrawlConfig(depth_limit=1)
    eng = CrawlEngine(wd, cfg, str(tmp_path / "run"))
    # seed a page whose links include a 404 (h5/p/37) so the
    # unstorable path actually fires at depth 1
    eng.seed(["http://h5.test/p/5", "http://h1.test/p/1"])
    downloaded = []
    seen_cols = []
    n_404 = []

    def on_dl(t):
        downloaded.append(t.num_rows)
        seen_cols.append(t.column_names)
        n_404.append(sum(1 for c in t["code"].to_pylist() if c == 404))

    eng.on_page_downloaded(on_dl)

    def drop_404(batch):
        import numpy as np
        import pyarrow as pa

        code = batch["code"].to_numpy(zero_copy_only=False)
        storable = np.asarray(batch["storable"].to_numpy(zero_copy_only=False), dtype=bool)
        storable &= ~(code == 404)
        return batch.set_column(batch.schema.get_field_index("storable"), "storable", pa.array(storable))

    eng.on_before_save(drop_404)
    eng.crawl()
    pt = eng.pages_table(columns=["code"])
    assert 404 not in pt["code"].to_pylist()
    # reference parity: hooks fire on EVERY processed page, including
    # the unstorable 404s (polipus.rb:221-237)
    assert sum(n_404) > 0
    assert sum(downloaded) == pt.num_rows + sum(n_404)
    # the driver never materializes payload bytes for hooks
    assert all("bytes" not in cols for cols in seen_cols)


def test_hooks_dataset_mode_unstorable(ray_session, world_dir, tmp_path):
    # pure-Dataset execution path: unstorable rows are spooled by the
    # filter stage and still reach on_page_downloaded, bytes-free
    wd, spec = world_dir
    cfg = CrawlConfig(depth_limit=1, fetch_mode="dataset", small_round_threshold=0)
    eng = CrawlEngine(wd, cfg, str(tmp_path / "run"))
    eng.seed(["http://h5.test/p/5"])  # links include the 404 h5/p/37
    counts, cols404 = [], []

    def on_dl(t):
        counts.append(t.num_rows)
        cols404.append((sum(1 for c in t["code"].to_pylist() if c == 404), t.column_names))

    eng.on_page_downloaded(on_dl)

    def drop_404(batch):
        import numpy as np
        import pyarrow as pa

        code = batch["code"].to_numpy(zero_copy_only=False)
        storable = np.asarray(batch["storable"].to_numpy(zero_copy_only=False), dtype=bool)
        storable &= ~(code == 404)
        return batch.set_column(batch.schema.get_field_index("storable"), "storable", pa.array(storable))

    eng.on_before_save(drop_404)
    eng.crawl()
    pt = eng.pages_table(columns=["code"])
    assert 404 not in pt["code"].to_pylist()
    n404 = sum(c for c, _ in cols404)
    assert n404 > 0 and sum(counts) == pt.num_rows + n404
    assert all("bytes" not in cn for _, cn in cols404)


def test_focus_crawl_and_domain_aliases(ray_session, world_dir, tmp_path):
    wd, spec = world_dir
    # focus_crawl replaces link extraction (reference polipus.rb:316-319):
    # follow only the first link of every page
    cfg = CrawlConfig(depth_limit=2)
    eng = CrawlEngine(wd, cfg, str(tmp_path / "focus"))
    eng.focus_crawl(lambda row: (row["links"] or [])[:1])
    eng.crawl()
    web = web_table_to_dict(make_web_table(DOCS, spec, with_images=False))
    for u, row in web.items():
        row["links"] = (row["links"] or [])[:1]
    sim = simulate_crawl(web, robots_bodies(spec), seed_urls(spec), cfg)
    assert set(eng.pages_table(columns=["uuid"])["uuid"].to_pylist()) == set(sim.stored.keys())

    # domain_aliases admits cross-host links (reference page.rb:201-204).
    # seed doc 11: cross_mod page (11 % 11 == 0) with a cross-host link
    # to doc 12 (host h12)
    hosts = [spec.host_name(i) for i in range(spec.hosts)]
    seeds = ["http://h11.test/p/11"]
    cfg2 = CrawlConfig(depth_limit=1, domain_aliases=hosts)
    eng2 = CrawlEngine(wd, cfg2, str(tmp_path / "aliases"))
    eng2.seed(seeds)
    eng2.crawl()
    web2 = web_table_to_dict(make_web_table(DOCS, spec, with_images=False))
    sim2 = simulate_crawl(web2, robots_bodies(spec), seeds, cfg2)
    check_parity(eng2, sim2)
    stored_hosts = {r["url"].split("/")[2] for r in eng2.pages_table(columns=["url"]).to_pylist()}
    assert "h12.test" in stored_hosts  # cross-host link followed via alias
    # without aliases the cross-host link is dropped
    eng3 = CrawlEngine(wd, CrawlConfig(depth_limit=1), str(tmp_path / "noalias"))
    eng3.seed(seeds)
    eng3.crawl()
    assert "h12.test" not in {r["url"].split("/")[2] for r in eng3.pages_table(columns=["url"]).to_pylist()}


def test_ua_sampling_and_cookie_jar(ray_session, world_dir, tmp_path):
    # O6: per-request UA = ua[url_hash % len] (reference samples
    # randomly per request, http.rb:84-90).  T4: per-host cookie jar —
    # first request to a host sends no cookie, every later one sends
    # the session cookie the simulated server set (http.rb:143-152).
    import collections
    import hashlib

    from polipus_ray.urltools import url_hash64

    wd, spec = world_dir
    uas = ["bot-a/1.0", "bot-b/2.0", "bot-c/3.0"]
    cfg = CrawlConfig(depth_limit=2, user_agent=uas, accept_cookies=True)
    eng = CrawlEngine(wd, cfg, str(tmp_path / "run"))
    eng.crawl()
    pt = eng.pages_table(columns=["url", "host", "aliases", "ua", "cookies_sent", "round", "seq", "error"]).to_pylist()
    assert len(pt) > 20
    for r in pt:
        # UA keyed by the REQUESTED url (first alias when redirected)
        requested = r["aliases"][0] if r["aliases"] else r["url"]
        assert r["ua"] == uas[url_hash64(requested) % len(uas)], r["url"]
    by_host = collections.defaultdict(list)
    for r in pt:
        if not r["error"]:
            by_host[r["host"]].append(r)
    multi = 0
    for host, rows in by_host.items():
        rows.sort(key=lambda r: (r["round"], r["seq"]))
        want = "sid=" + hashlib.md5(host.encode()).hexdigest()[:8]
        assert rows[0]["cookies_sent"] == ""
        for r in rows[1:]:
            assert r["cookies_sent"] == want, (host, r)
        multi += len(rows) > 1
    assert multi > 3  # jars actually exercised across requests


def test_plugin_protocol(ray_session, world_dir, tmp_path):
    from polipus_ray.ext import Plugin, SleeperPlugin

    wd, spec = world_dir
    calls = []

    class Probe(Plugin):
        def on_crawl_start(self, engine):
            calls.append("start")

        def on_message_received(self, engine):
            calls.append("recv")

        def on_message_processed(self, engine):
            calls.append("done")

        def on_crawl_end(self, engine):
            calls.append("end")

    cfg = CrawlConfig(depth_limit=1)
    eng = CrawlEngine(wd, cfg, str(tmp_path / "run"))
    eng.plugins.append(Probe())
    eng.plugins.append(SleeperPlugin(0.25))
    for p in eng.plugins:
        p.on_initialize(eng)
    res = eng.crawl()
    assert calls[0] == "start" and calls[-1] == "end"
    assert calls.count("recv") == res["rounds"] == calls.count("done")
    # SleeperPlugin raised the politeness delay
    assert eng.cfg.politeness_default_delay == 0.25
    # politeness delay shows in per-host virtual fetched_at spacing
    pt = eng.pages_table(columns=["host", "fetched_at", "round"]).to_pylist()
    import collections

    by = collections.defaultdict(list)
    for r in pt:
        by[(r["host"], r["round"])].append(r["fetched_at"])
    gaps_ok = all(
        all(b - a >= 0 for a, b in zip(sorted(v), sorted(v)[1:]))
        for v in by.values()
        if len(v) > 1
    )
    assert gaps_ok


def test_relaxed_order_mode_set_parity(ray_session, world_dir, tmp_path):
    # deterministic_order=False: in-actor candidate admission — stored
    # uuid set, tracker set and per-URL depth must still match the
    # oracle; only the intra-round total order is approximate
    wd, spec = world_dir
    cfg = CrawlConfig(depth_limit=False, obey_robots_txt=True, deterministic_order=False, small_round_threshold=0)
    eng = CrawlEngine(wd, cfg, str(tmp_path / "relaxed"))
    res = eng.crawl()
    web = web_table_to_dict(make_web_table(DOCS, spec, with_images=False))
    sim = simulate_crawl(web, robots_bodies(spec), seed_urls(spec), CrawlConfig(depth_limit=False, obey_robots_txt=True))
    pt = eng.pages_table(columns=["uuid", "url", "depth", "seq", "round"])
    assert set(pt["uuid"].to_pylist()) == set(sim.stored.keys())
    assert res["seen"] == len(sim.tracker)
    got_depth = {r["uuid"]: r["depth"] for r in pt.to_pylist()}
    want_depth = {u: p.depth for u, p in sim.stored.items()}
    assert got_depth == want_depth
    # seq must still be monotone in round (wave/depth order preserved)
    rows = sorted(pt.to_pylist(), key=lambda r: r["seq"])
    rounds = [r["round"] for r in rows]
    assert rounds == sorted(rounds)


def test_messy_world_full_parity(ray_session, tmp_path):
    # FIXTURES.md quirks world: relative/fragment/%-encoded/duplicate
    # links, <base href> overrides, >5-hop redirect chain, cross-host
    # redirect, relative Location, unicode captions — full byte-parity
    # with the oracle simulator
    spec = WorldSpec(
        redirect_mod=23,
        messy_links=True,
        base_href_mod=17,
        long_chain_class=7,
        cross_redirect_mod=41,
        relative_redirect_mod=3,
        unicode_captions=True,
    )
    wd = str(tmp_path / "messy")
    write_world(wd, DOCS, spec)
    cfg = CrawlConfig(depth_limit=False, obey_robots_txt=True)
    eng = CrawlEngine(wd, cfg, str(tmp_path / "run"))
    eng.crawl()
    web = web_table_to_dict(make_web_table(DOCS, spec, with_images=False))
    sim = simulate_crawl(web, robots_bodies(spec), seed_urls(spec), cfg)
    check_parity(eng, sim)
    # the quirks actually occurred
    t = make_web_table(DOCS, spec, with_images=False)
    raw_links = [l for ls in t["links"].to_pylist() for l in (ls or [])]
    assert any(l.startswith("/p/") for l in raw_links)  # relative
    assert any("#frag" in l for l in raw_links)  # fragment
    assert any("%70" in l for l in raw_links)  # percent-encoded
    assert any(b for b in t["base_href"].to_pylist())  # base hrefs
    assert any(r and r.startswith("/p/") for r in t["redirect_to"].to_pylist())  # relative Location
    # long chain: the page at the chain head resolves to a redirect
    # page stored at the hop limit (over-limit chain)
    caps = eng.pages_table(columns=["caption", "code"]).to_pylist()
    assert any("π" in (r["caption"] or "") for r in caps)  # unicode round-trip
    assert any(r["code"] == 301 for r in caps)  # unfollowable redirect stored


def test_hot_host_cap(ray_session, world_dir, tmp_path):
    # max_urls_per_host_per_round bounds per-round per-host load (the
    # straggler/skew cap); reachable SET is unchanged, scheduling shifts
    wd, spec = world_dir
    cfg = CrawlConfig(depth_limit=False, obey_robots_txt=True, max_urls_per_host_per_round=2, small_round_threshold=0)
    eng = CrawlEngine(wd, cfg, str(tmp_path / "capped"))
    res = eng.crawl(max_rounds=200)
    web = web_table_to_dict(make_web_table(DOCS, spec, with_images=False))
    sim = simulate_crawl(web, robots_bodies(spec), seed_urls(spec), CrawlConfig(depth_limit=False, obey_robots_txt=True))
    pt = eng.pages_table(columns=["uuid", "host", "round", "error"]).to_pylist()
    assert {r["uuid"] for r in pt} == set(sim.stored.keys())
    # cap held: never more than 2 pages of one host in one round
    import collections

    per = collections.Counter((r["host"], r["round"]) for r in pt if not r["error"])
    assert max(per.values()) <= 2
    assert res["rounds"] > 12  # crawl actually stretched over more waves


def test_one_call_crawler_api(ray_session, world_dir, tmp_path):
    import polipus_ray

    wd, spec = world_dir
    seen = []
    eng = polipus_ray.crawler(
        "t",
        ["http://h1.test/p/1"],
        world_dir=wd,
        run_dir=str(tmp_path / "r"),
        depth_limit=1,
        obey_robots_txt=True,
        configure=lambda c: c.on_page_downloaded(lambda t: seen.append(t.num_rows)),
    )
    assert eng.pages_table(columns=["uuid"]).num_rows > 0
    assert sum(seen) == eng.pages_table(columns=["uuid"]).num_rows


def test_graceful_stop_and_resume(ray_session, world_dir, tmp_path):
    # request_stop mid-crawl (signal-handler analogue): finishes the
    # current round, checkpoints, returns; resume completes the crawl
    wd, spec = world_dir
    cfg = CrawlConfig(depth_limit=3, obey_robots_txt=True)
    run = str(tmp_path / "run")
    eng = CrawlEngine(wd, cfg, run)

    def stop_after_two(e_):
        if e_.round_no >= 1:
            e_.request_stop()

    class StopPlugin:
        def on_message_processed(self, e_):
            stop_after_two(e_)

    eng.plugins.append(StopPlugin())
    eng.crawl()
    assert not eng.spill.empty()  # stopped early with work remaining
    assert eng.ckpt.latest() is not None
    eng2 = CrawlEngine(wd, cfg, run)
    eng2.crawl(resume=True)
    web = web_table_to_dict(make_web_table(DOCS, spec, with_images=False))
    sim = simulate_crawl(web, robots_bodies(spec), seed_urls(spec), cfg)
    assert set(eng2.pages_table(columns=["uuid"])["uuid"].to_pylist()) == set(sim.stored.keys())


def test_crash_resume_mid_round(ray_session, world_dir, tmp_path):
    # the checkpoint system's primary purpose: a crash AFTER round R's
    # parquet write but BEFORE its checkpoint.  Resume must re-run (and
    # overwrite) the partial round=R directory — no duplicate uuids,
    # byte-identical order vs an uninterrupted run
    wd, spec = world_dir
    cfg = CrawlConfig(depth_limit=3, obey_robots_txt=True)

    class Boom(RuntimeError):
        pass

    class CrashPlugin:
        # on_message_processed fires after the round's parquet write +
        # metrics, before round_no increment + _checkpoint
        def on_message_processed(self, e_):
            if e_.round_no >= 2:
                raise Boom()

    run = str(tmp_path / "run")
    eng = CrawlEngine(wd, cfg, run)
    eng.plugins.append(CrashPlugin())
    with pytest.raises(Boom):
        eng.crawl()
    # the partial round directory exists but is not checkpointed
    import glob as g
    import os

    crashed_round = max(int(os.path.basename(d).split("=")[1]) for d in g.glob(os.path.join(run, "pages", "round=*")))
    eng2 = CrawlEngine(wd, cfg, run)
    eng2.crawl(resume=True)
    # the crashed round was re-run under the SAME round label
    assert any(m["round"] == crashed_round for m in eng2.metrics)
    pt = eng2.pages_table(columns=["uuid", "seq", "url"])
    uuids = pt["uuid"].to_pylist()
    assert len(uuids) == len(set(uuids)), "crash-resume duplicated rows"
    web = web_table_to_dict(make_web_table(DOCS, spec, with_images=False))
    sim = simulate_crawl(web, robots_bodies(spec), seed_urls(spec), cfg)
    assert set(uuids) == set(sim.stored.keys())
    order = [u for _, u in sorted(zip(pt["seq"].to_pylist(), pt["url"].to_pylist()))]
    assert order == sim.order


def test_relaxed_mode_checkpoint_resume(ray_session, world_dir, tmp_path):
    wd, spec = world_dir
    cfg = CrawlConfig(depth_limit=False, obey_robots_txt=True, deterministic_order=False, small_round_threshold=0)
    run = str(tmp_path / "run")
    eng = CrawlEngine(wd, cfg, run)
    eng.crawl(max_rounds=3)
    assert not eng.spill.empty()
    eng2 = CrawlEngine(wd, cfg, run)
    eng2.crawl(resume=True)
    web = web_table_to_dict(make_web_table(DOCS, spec, with_images=False))
    sim = simulate_crawl(web, robots_bodies(spec), seed_urls(spec), CrawlConfig(depth_limit=False, obey_robots_txt=True))
    assert set(eng2.pages_table(columns=["uuid"])["uuid"].to_pylist()) == set(sim.stored.keys())


def test_per_row_payload_invariant(ray_session, world_dir, tmp_path):
    # input_hint invariant, end to end: for every crawled page, the
    # DECODED pixels match the world's source pixels (exact for
    # lossless 'png', PSNR >= 40 dB for lossy 'jpeg') and the caption
    # is byte-equal to the source caption
    from polipus_ray.synth.images import decode_image, psnr
    from polipus_ray.synth.world import _pixels_for

    wd, spec = world_dir
    cfg = CrawlConfig(depth_limit=2, obey_robots_txt=True, verify_payload=True)
    eng = CrawlEngine(wd, cfg, str(tmp_path / "run"))
    eng.crawl()
    pages = eng.pages_table(columns=["doc_id", "bytes", "fmt", "caption", "error", "payload_ok"]).to_pylist()
    web = make_web_table(DOCS, spec, with_images=False).to_pylist()
    captions = {r["doc_id"]: r["caption"] for r in web}
    checked = 0
    for r in pages:
        if r["error"] or r["bytes"] is None:
            continue
        px, _, _, fmt = decode_image(r["bytes"])
        src = _pixels_for(spec, int(r["doc_id"]))
        if fmt == "png":
            assert (px == src).all(), r["doc_id"]
        else:
            p = psnr(src, px)
            assert p >= 40.0, (r["doc_id"], p)
        assert r["caption"] == captions[int(r["doc_id"])]
        assert r["payload_ok"]
        checked += 1
    assert checked > 10
    assert any(r["fmt"] == "jpeg" for r in pages if not r["error"])  # lossy rows exercised


def test_cli_world_crawl_summary(ray_session, tmp_path, capsys):
    # python -m polipus_ray surface: world gen -> crawl -> summary
    import json

    from polipus_ray.__main__ import main

    wd, run = str(tmp_path / "w"), str(tmp_path / "r")
    assert main(["world", "--sf-dir", "/root/testdata/sf0.001", "--out", wd]) == 0
    assert main(["crawl", "--world", wd, "--run", run, "--depth-limit", "1", "--robots"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    res = json.loads(out[-1])
    assert res["stored"] > 0 and res["rounds"] >= 1
    assert main(["summary", "--run", run]) == 0
    summ = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summ["pages"] == res["stored"]


def test_hooks_wide_columns_pad_unstorable(ray_session, world_dir, tmp_path):
    """A user hook_columns list wider than the unstorable narrow
    tables (here incl. 'bytes') must NOT drop unstorable pages from
    hooks — missing columns are padded with typed nulls (ADVICE r2)."""
    wd, spec = world_dir
    cfg = CrawlConfig(depth_limit=1, hook_columns=["url", "code", "error", "bytes"])
    eng = CrawlEngine(wd, cfg, str(tmp_path / "run"))
    eng.seed(["http://h5.test/p/5", "http://h1.test/p/1"])  # links include 404 h5/p/37
    n_404, got_cols = [], []

    def on_dl(t):
        n_404.append(sum(1 for c in t["code"].to_pylist() if c == 404))
        got_cols.append(t.column_names)

    eng.on_page_downloaded(on_dl)

    def drop_404(batch):
        import numpy as np
        import pyarrow as pa

        code = batch["code"].to_numpy(zero_copy_only=False)
        storable = np.asarray(batch["storable"].to_numpy(zero_copy_only=False), dtype=bool)
        storable &= ~(code == 404)
        return batch.set_column(batch.schema.get_field_index("storable"), "storable", pa.array(storable))

    eng.on_before_save(drop_404)
    eng.crawl()
    # the 404s are unstorable (dropped by before_save) yet still reach
    # the hook, with the full requested column set
    assert sum(n_404) > 0
    assert all(cols == ["url", "code", "error", "bytes"] for cols in got_cols)


def test_link_extractor_vectorized_equals_row_loop():
    """The Arrow-RE2 vectorized extractor must be byte-identical to the
    row-loop implementation (kept for focus_crawl) on messy inputs:
    relative links, dot segments, percent/space escapes, fragments,
    userinfo/ports, null links, duplicate links, non-HTML pages,
    errors, trailing newlines (the one known RE2-vs-re divergence:
    RE2 rejects to the slow path, which re-applies the Python fast
    path — output unchanged)."""
    import numpy as np
    import pyarrow as pa

    from polipus_ray.frontier.stages import _make_link_extractor_rows, make_link_extractor

    rng = np.random.default_rng(7)
    hosts = [f"host-{i}.example" for i in range(20)]
    robots = {h: ("User-agent: *\nDisallow: /private\n" if i % 3 == 0 else "") for i, h in enumerate(hosts)}

    def mkbatch(n_pages):
        cols = {k: [] for k in ("url", "host", "links", "depth", "seq", "code", "content_type", "error", "base_href")}
        for i in range(n_pages):
            h = hosts[rng.integers(len(hosts))]
            lk = []
            for _ in range(int(rng.integers(0, 9))):
                th = hosts[rng.integers(len(hosts))] if rng.random() < 0.3 else h
                c = rng.random()
                if c < 0.55:
                    lk.append(f"http://{th}/doc/{rng.integers(0, 99999)}")
                elif c < 0.62:
                    lk.append(f"/rel/{rng.integers(0,99)}")
                elif c < 0.69:
                    lk.append(f"http://{th}/a/../b/{rng.integers(0,99)}")
                elif c < 0.76:
                    lk.append(f"http://{th}/p%41th/{rng.integers(0,99)}#frag")
                elif c < 0.82:
                    lk.append(None)
                elif c < 0.87:
                    lk.append(f"http://{th}/x y/{rng.integers(0,99)}")
                elif c < 0.92:
                    lk.append(f"http://USER@{th.upper()}:80/q/{rng.integers(0,99)}")
                elif c < 0.96:
                    lk.append(f"http://{th}/doc/{rng.integers(0,99)}\n")
                else:
                    lk.append(f"http://{th}/private/{rng.integers(0,99)}")
            if rng.random() < 0.15:
                lk = lk + lk  # per-page Set dedup exercise
            cols["url"].append(f"http://{h}/doc/{i}")
            cols["host"].append(h)
            cols["links"].append(lk if rng.random() > 0.02 else None)
            cols["depth"].append(int(rng.integers(0, 4)))
            cols["seq"].append(i * 7)
            cols["code"].append(200)
            cols["content_type"].append("text/html; charset=utf-8" if rng.random() > 0.1 else "image/png")
            cols["error"].append(None if rng.random() > 0.05 else "boom")
            cols["base_href"].append(None if rng.random() > 0.1 else f"http://{h}/base/")
        return pa.table(
            {
                "url": pa.array(cols["url"]),
                "host": pa.array(cols["host"]),
                "links": pa.array(cols["links"], pa.list_(pa.string())),
                "depth": pa.array(cols["depth"], pa.int32()),
                "seq": pa.array(cols["seq"], pa.int64()),
                "code": pa.array(cols["code"], pa.int32()),
                "content_type": pa.array(cols["content_type"]),
                "error": pa.array(cols["error"], pa.string()),
                "base_href": pa.array(cols["base_href"], pa.string()),
            }
        )

    for aliases in ([], ["host-1.example", "host-2.example"]):
        cfg = CrawlConfig(domain_aliases=aliases, depth_limit=2)
        vec = make_link_extractor(cfg, None, 16, robots_bodies=robots)
        rows = _make_link_extractor_rows(cfg, None, 16, robots_bodies=robots)
        for _ in range(3):
            b = mkbatch(400)
            tv, tr = vec(b), rows(b)
            assert tv.schema.equals(tr.schema)
            assert tv.equals(tr)


def _live_ray_workers() -> int:
    """Count live Ray worker processes via /proc (no psutil in the
    container).  Matches both fresh workers (default_worker.py in
    argv) and retitled ones (Ray rewrites argv to 'ray::<task>')."""
    import glob

    n = 0
    for f in glob.glob("/proc/[0-9]*/cmdline"):
        try:
            cl = open(f, "rb").read().decode(errors="replace")
        except OSError:
            continue
        if "default_worker.py" in cl or cl.startswith("ray::"):
            n += 1
    return n


def test_plasma_frontier_multi_round_bounded_workers(ray_session, world_dir):
    """Regression for the r3 watch item: fetch actors ray.get-ing
    other actors' plasma spill refs (the plasma-frontier mode's
    actor->actor part flow) must not trigger runaway worker spawns,
    and a multi-round plasma crawl must shut down cleanly (pool
    released, stored set == oracle)."""
    wd, spec = world_dir
    before = _live_ray_workers()
    cfg = CrawlConfig(
        depth_limit=4,
        obey_robots_txt=True,
        small_round_threshold=0,
        checkpoint=False,  # plasma frontier engages only without checkpoints
        workers=4,
        deterministic_order=False,  # in-actor admission: refs cross actors
    )
    eng, res, sim = run_both(wd, spec, cfg)
    assert eng.spill.plasma, "plasma frontier mode should be active"
    assert res["rounds"] >= 4  # refs flowed actor->actor across rounds
    pt = eng.pages_table(columns=["uuid"])
    assert set(pt["uuid"].to_pylist()) == set(sim.stored.keys())
    assert eng._fetch_actors is None  # pool released at crawl end
    grew = _live_ray_workers() - before
    # the crawl legitimately adds its own actors (fetch pool + seen
    # shards) and a few task workers; anything far beyond that is the
    # blocked-ray.get worker explosion this test guards against
    assert grew <= cfg.workers + cfg.resolved_num_seen_shards() + 16, grew


def test_drop_rows_sliced_equals_filter():
    """_drop_rows_sliced must equal table.filter for every mask shape:
    sparse runs (the zero-copy path), fragmented alternation (the
    fallback), all-kept (identity), none-kept, and chunked input."""
    import numpy as np
    import pyarrow as pa

    from polipus_ray.fetch.fetcher import _drop_rows_sliced

    rng = np.random.default_rng(7)
    base = pa.table(
        {
            "a": pa.array(np.arange(5000, dtype=np.int64)),
            "b": pa.array([f"s{i}" for i in range(5000)]),
            "c": pa.array(rng.integers(0, 1 << 40, 5000)),
        }
    )
    chunked = pa.concat_tables([base.slice(0, 1700), base.slice(1700, 1300), base.slice(3000)])
    masks = {
        "all": np.ones(5000, bool),
        "none": np.zeros(5000, bool),
        "sparse": np.ones(5000, bool),
        "alternating": np.arange(5000) % 2 == 0,  # 2500 runs -> filter fallback
        "random": rng.random(5000) > 0.3,
    }
    masks["sparse"][rng.choice(5000, 40, replace=False)] = False
    for name, keep in masks.items():
        for t in (base, chunked):
            got = _drop_rows_sliced(t, keep)
            want = t.filter(pa.array(keep))
            assert got.num_rows == want.num_rows, name
            # combine to normalize chunking before value compare
            assert got.combine_chunks().equals(want.combine_chunks()), name


def test_seen_capacity_auto_provisioned_from_world(tmp_path):
    """seen_capacity_per_shard=None sizes the cuckoo from the world
    manifest (1.25x rows over the shards, min 1M); an explicit value is
    respected.  Guards the r4s9 stash-scan regression (an
    under-provisioned filter degrades into linear overflow scans)."""
    import json
    import os

    from polipus_ray.config import CrawlConfig
    from polipus_ray.frontier.engine import CrawlEngine

    world = tmp_path / "bigworld"
    world.mkdir()
    (world / "spec.json").write_text(json.dumps({"hosts": 16}))
    (world / "robots.json").write_text("{}")
    (world / "seeds.json").write_text("[]")
    (world / "world.json").write_text(json.dumps({"num_buckets": 256, "rows": 40_000_000}))

    cfg = CrawlConfig(checkpoint=False, num_seen_shards=8)
    eng = CrawlEngine(str(world), cfg, str(tmp_path / "run1"), use_ray=False)
    # 1.25 * 40M / 8 shards = 6.25M per shard
    assert all(s.capacity == 6_250_000 for s in eng.pool.shards)

    cfg2 = CrawlConfig(checkpoint=False, num_seen_shards=8, seen_capacity_per_shard=123_456)
    eng2 = CrawlEngine(str(world), cfg2, str(tmp_path / "run2"), use_ray=False)
    assert all(s.capacity == 123_456 for s in eng2.pool.shards)

    # small world -> the 1M reference-default floor
    (world / "world.json").write_text(json.dumps({"num_buckets": 256, "rows": 500}))
    eng3 = CrawlEngine(str(world), cfg, str(tmp_path / "run3"), use_ray=False)
    assert all(s.capacity == 1_000_000 for s in eng3.pool.shards)
