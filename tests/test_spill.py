"""Frontier spill adapters — FIFO, devnull, capped retention
(reference spec/polipus/queue_overflow_spec.rb semantics re-expressed
for the part-file frontier; see frontier/spill.py docstring)."""

import pyarrow as pa

from polipus_ray.frontier.spill import FrontierSpill


def t(ids):
    return pa.table({"seq": pa.array(ids, pa.int64())})


def test_fifo_order_and_take_active(tmp_path):
    sp = FrontierSpill(str(tmp_path), adapter=None, queue_items_limit=10)
    for i in range(6):
        sp.append_table(t([i * 3, i * 3 + 1, i * 3 + 2]))  # 6 parts x 3 rows
    assert sp.total_rows() == 18
    paths, rows = sp.take_active(10)
    assert rows == 9  # whole parts under the limit
    import pyarrow.parquet as pq

    got = [s for p in paths for s in pq.read_table(p)["seq"].to_pylist()]
    assert got == list(range(9))  # oldest first
    assert sp.total_rows() == 9
    paths2, rows2 = sp.take_active(100)
    assert rows2 == 9 and sp.empty()


def test_devnull_drops_oldest_beyond_limit(tmp_path):
    sp = FrontierSpill(str(tmp_path), adapter="devnull", queue_items_limit=10)
    for i in range(10):
        sp.append_table(t([i * 2, i * 2 + 1]))  # 20 rows in 10 parts
    # keeps the NEWEST ~limit rows (reference rotates oldest into DevNull)
    assert sp.total_rows() <= 12 and sp.total_rows() >= 10
    paths, _ = sp.take_active(100)
    import pyarrow.parquet as pq

    got = [s for p in paths for s in pq.read_table(p)["seq"].to_pylist()]
    assert got[-1] == 19 and 0 not in got


def test_capped_keeps_limit_plus_max(tmp_path):
    sp = FrontierSpill(str(tmp_path), adapter="capped", queue_items_limit=10, capped_max=4)
    for i in range(10):
        sp.append_table(t([i * 2, i * 2 + 1]))
    assert 14 <= sp.total_rows() <= 16


def test_uniq_adapter_dedups_on_push(tmp_path):
    # reference queue_overflow_spec: unique mode keeps 2 rows after 40
    # duplicate pushes (mongo_queue.rb:30-32, 53-57)
    import pyarrow as pa

    sp = FrontierSpill(str(tmp_path), adapter="uniq", queue_items_limit=100)
    for _ in range(20):
        sp.append_table(pa.table({"url_hash": pa.array([111, 222], pa.int64()), "seq": pa.array([0, 1], pa.int64())}))
    assert sp.total_rows() == 2
    # state round-trip keeps the pushed set
    sp2 = FrontierSpill(str(tmp_path), adapter="uniq", queue_items_limit=100)
    sp2.load_state(sp.state())
    sp2.append_table(pa.table({"url_hash": pa.array([111, 333], pa.int64()), "seq": pa.array([2, 3], pa.int64())}))
    assert sp2.total_rows() == 3


def test_gc_consumed_part_files(tmp_path):
    import os

    sp = FrontierSpill(str(tmp_path), adapter=None, queue_items_limit=10)
    for i in range(4):
        sp.append_table(t([i]))
    paths, _ = sp.take_active(100)
    assert all(os.path.exists(p) for p in paths)  # deferred deletion
    # checkpoint still references the first two -> they survive GC
    removed = sp.gc_consumed(set(paths[:2]))
    assert removed == 2
    assert [os.path.exists(p) for p in paths] == [True, True, False, False]
    # reference dropped (checkpoint superseded) -> now collectable
    assert sp.gc_consumed(set()) == 2
    assert not any(os.path.exists(p) for p in paths)
    assert sp.consumed == []


def test_state_roundtrip(tmp_path):
    sp = FrontierSpill(str(tmp_path), adapter=None, queue_items_limit=10)
    sp.append_table(t([1, 2, 3]))
    st = sp.state()
    sp2 = FrontierSpill(str(tmp_path), adapter=None, queue_items_limit=10)
    sp2.load_state(st)
    assert sp2.total_rows() == 3 and sp2.parts == sp.parts


def test_part_hists_and_slice_exact_active_hist(tmp_path):
    """Per-part bucket histograms power the engine's slice-exact LUT
    prebalance and part routing (engine._fetch_store_pool): append_table
    computes them when num_buckets is set, take_active sums exactly the
    ACTIVATED slice, and any hist-less part degrades the sum to None
    (fall back to the full-frontier estimate) without breaking routing
    (hist-less parts fan out to every actor)."""
    import numpy as np

    sp = FrontierSpill(str(tmp_path), adapter=None, queue_items_limit=10)
    sp.num_buckets = 4
    for i in range(3):
        sp.append_table(pa.table({"seq": pa.array([i, i, i], pa.int64()), "host_bucket": pa.array([i % 4, (i + 1) % 4, i % 4], pa.int32())}))
    assert sp.hists_complete()
    _, rows = sp.take_active(6)  # activates the first TWO parts only
    assert rows == 6
    # exact histogram of the activated slice: parts 0 and 1
    exp = np.bincount([0, 1, 0, 1, 2, 1], minlength=4)
    assert sp.last_active_hist is not None and (sp.last_active_hist == exp).all()
    # (parts are split at part_rows=limit//4=2 -> the 6-row slice is 4 parts)
    assert sp.last_active_hists is not None and len(sp.last_active_hists) == 4
    assert all(h is not None for h in sp.last_active_hists)
    # a part registered WITHOUT a hist poisons only the slice it is in
    sp.append_table(pa.table({"seq": pa.array([9], pa.int64()), "host_bucket": pa.array([3], pa.int32())}))
    sp.register_part(str(tmp_path / "ext.parquet"), rows=2)  # no hist
    assert not sp.hists_complete()
    _, rows2 = sp.take_active(100)
    assert rows2 == 6
    assert sp.last_active_hist is None  # unknown slice load -> estimate path
    assert sp.last_active_hists[-1] is None  # routing fans that part out
    # checkpoint manifest stays JSON-serializable: hist arrays stripped
    import json

    sp2 = FrontierSpill(str(tmp_path / "s2"), adapter=None, queue_items_limit=10)
    sp2.num_buckets = 4
    sp2.append_table(pa.table({"seq": pa.array([1], pa.int64()), "host_bucket": pa.array([2], pa.int32())}))
    st = sp2.state()
    json.dumps(st)
    assert all("hist" not in p for p in st["parts"])
