"""Cuckoo filter vs exact-set oracle; shard pool routing; snapshots.

Mirrors reference spec/polipus/url_tracker_spec.rb (visit/visited for
both bloom & exact variants) with the cuckoo standing in for bloom."""

import numpy as np
import pytest

from polipus_ray.seen.cuckoo import CuckooFilter
from polipus_ray.seen.shards import SeenShardPool, UrlSeenShard, _ExactFilter
from polipus_ray.urltools import hash64


def _hashes(n, salt=""):
    return np.array([hash64(f"http://h{i % 7}.test/p/{i}{salt}") for i in range(n)], dtype=np.uint64)


def test_cuckoo_basic():
    cf = CuckooFilter(capacity=10_000)
    h = hash64("http://www.asd.com/")
    assert not cf.contains(h)
    cf.add(h)
    assert cf.contains(h)
    cf.remove(h)
    assert not cf.contains(h)


@pytest.mark.parametrize("kind", ["cuckoo", "exact"])
def test_filter_matches_oracle(kind):
    cf = CuckooFilter(capacity=50_000) if kind == "cuckoo" else _ExactFilter()
    oracle = set()
    hs = _hashes(20_000)
    first = cf.check_and_add_many(hs[:10_000])
    assert not first.any()
    again = cf.contains_many(hs[:10_000])
    assert again.all()
    fresh = cf.contains_many(hs[10_000:])
    # FP rate at this size/occupancy must be ~0 (16-bit fingerprints)
    assert fresh.sum() <= 2
    oracle.update(hs[:10_000].tolist())
    mask = cf.contains_many(hs)
    exact = np.array([int(x) in oracle for x in hs])
    # no false negatives ever
    assert not (exact & ~mask).any()


def test_check_and_add_duplicates_within_batch():
    cf = CuckooFilter(capacity=1000)
    h = _hashes(3)
    batch = np.array([h[0], h[1], h[0], h[2], h[1]], dtype=np.uint64)
    seen = cf.check_and_add_many(batch)
    assert seen.tolist() == [False, False, True, False, True]


def test_add_many_matches_scalar_add():
    """Vectorized bulk insert == per-key add: same admission mask,
    same count, same membership — including intra-batch duplicates,
    bucket contention (many keys per bucket), and the i2/kick
    fallback at ~97% load."""
    rng = np.random.default_rng(11)
    hs = rng.integers(0, 2**64, 60_000, dtype=np.uint64)
    hs = np.concatenate([hs, hs[:10_000]])
    rng.shuffle(hs)

    cf_v = CuckooFilter(capacity=80_000)
    out_v = cf_v.check_and_add_many(hs)

    cf_s = CuckooFilter(capacity=80_000)
    uniq, first_idx = np.unique(hs, return_index=True)
    pre = cf_s.contains_many(uniq)
    for h in uniq[~pre]:
        cf_s.add(int(h))
    out_s = np.ones(len(hs), dtype=bool)
    out_s[first_idx[~pre]] = False

    assert np.array_equal(out_v, out_s)
    assert cf_v.count == cf_s.count
    assert cf_v.contains_many(uniq).all()

    # high load: fill to ~97% of slots so placements spill to i2 and
    # the scalar kick path; no key may be lost
    cf = CuckooFilter(capacity=60_000)
    keys = rng.integers(0, 2**64, int(cf.nbuckets * 4 * 0.97), dtype=np.uint64)
    cf.check_and_add_many(keys)
    assert cf.contains_many(keys).all()


def test_cuckoo_overload_never_false_negative():
    # insert far beyond capacity: kicked-out fingerprints must land in
    # the overflow stash, not vanish (a drop would erase a PREVIOUS
    # key and re-admit seen URLs forever)
    cf = CuckooFilter(capacity=64)
    hs = _hashes(4000)
    seen = cf.check_and_add_many(hs)
    assert not seen.any()
    assert cf.contains_many(hs).all()  # every insert still present
    for h in hs[:200]:
        assert cf.contains(int(h))
    assert cf.count == len(np.unique(hs))
    assert len(cf.stash) > 0  # overload actually happened
    # stash survives snapshot round-trip
    cf2 = CuckooFilter.from_bytes(cf.to_bytes())
    assert cf2.contains_many(hs).all() and cf2.count == cf.count
    # remove also reaches stashed entries
    removed = sum(cf.remove(int(h)) for h in hs)
    assert removed == len(np.unique(hs))
    assert not cf.contains_many(hs).any()
    assert cf.count == 0 and not cf.stash


def test_cuckoo_serialization():
    cf = CuckooFilter(capacity=5000)
    hs = _hashes(3000)
    cf.check_and_add_many(hs)
    cf2 = CuckooFilter.from_bytes(cf.to_bytes())
    assert cf2.count == cf.count
    assert cf2.contains_many(hs).all()


def test_shard_local_pool_routing_and_storage():
    pool = SeenShardPool(num_shards=4, kind="exact", use_ray=False)
    urls = [f"http://h{i % 5}.test/p/{i}" for i in range(100)]
    uh = np.array([hash64(u) for u in urls], dtype=np.uint64)
    hh = np.array([hash64(f"h{i % 5}.test") for i in range(100)], dtype=np.uint64)
    seen = pool.check_and_add(uh, hh)
    assert not seen.any()
    seen2 = pool.check_and_add(uh, hh)
    assert seen2.all()
    # storage manifest with TTL timestamps
    pool.mark_stored(uh[:10], hh[:10], np.full(10, 1000))
    ex, ts = pool.stored_info(uh, hh)
    assert ex[:10].all() and not ex[10:].any()
    assert (ts[:10] == 1000).all() and (ts[10:] == -1).all()
    pool.unmark_stored(uh[:5], hh[:5])
    ex, _ = pool.stored_info(uh[:10], hh[:10])
    assert ex.tolist() == [False] * 5 + [True] * 5
    # remove (tracker delete — needed for TTL recrawl)
    pool.remove(uh[:50], hh[:50])
    v = pool.visited(uh, hh)
    assert not v[:50].any() and v[50:].all()


def test_shard_snapshot_restore():
    pool = SeenShardPool(num_shards=3, kind="cuckoo", capacity_per_shard=10_000, use_ray=False)
    uh = _hashes(1000)
    hh = np.array([hash64(f"h{i % 7}.test") for i in range(1000)], dtype=np.uint64)
    pool.check_and_add(uh, hh)
    pool.mark_stored(uh[:100], hh[:100], np.arange(100))
    blobs = pool.snapshot_all()
    pool2 = SeenShardPool(num_shards=3, kind="cuckoo", capacity_per_shard=10_000, use_ray=False)
    pool2.restore_all(blobs)
    assert pool2.visited(uh, hh).all()
    ex, ts = pool2.stored_info(uh[:100], hh[:100])
    assert ex.all() and (ts == np.arange(100)).all()
    assert pool2.counts()["seen"] == pool.counts()["seen"]


def test_shard_pool_on_ray(ray_session):
    pool = SeenShardPool(num_shards=2, kind="cuckoo", capacity_per_shard=10_000, use_ray=True)
    uh = _hashes(500)
    hh = np.array([hash64(f"h{i % 7}.test") for i in range(500)], dtype=np.uint64)
    assert not pool.check_and_add(uh, hh).any()
    assert pool.check_and_add(uh, hh).all()
    assert pool.counts()["seen"] == len(set(uh.tolist()))
