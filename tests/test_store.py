"""Page store adapters (reference storage specs re-expressed):
uuid-keyed upsert, each/get/remove/count, `except` column drop,
query-string flag."""

import pyarrow as pa
import pytest

from polipus_ray.store import DevNullPageStore, MemoryPageStore, ParquetPageStore, make_store
from polipus_ray.urltools import page_uuid


def _pages(n=5, round_no=0):
    rows = {
        "uuid": [page_uuid(f"http://h.test/p/{i}") for i in range(n)],
        "url": [f"http://h.test/p/{i}" for i in range(n)],
        "host_bucket": [i % 2 for i in range(n)],
        "bytes": [b"payload-%d" % i for i in range(n)],
        "caption": [f"cap {i}" for i in range(n)],
        "seq": list(range(n)),
    }
    return pa.table(
        {
            "uuid": pa.array(rows["uuid"]),
            "url": pa.array(rows["url"]),
            "host_bucket": pa.array(rows["host_bucket"], pa.int32()),
            "bytes": pa.array(rows["bytes"], pa.binary()),
            "caption": pa.array(rows["caption"]),
            "seq": pa.array(rows["seq"], pa.int64()),
        }
    )


def test_parquet_store_roundtrip(tmp_path):
    st = ParquetPageStore(str(tmp_path / "pages"))
    st.write_round(_pages(5), 0)
    assert st.count() == 5
    got = st.get(page_uuid("http://h.test/p/3"))
    assert got["url"] == "http://h.test/p/3" and got["bytes"] == b"payload-3"
    assert st.get("no-such-uuid") is None
    seen = dict(st.each())
    assert len(seen) == 5
    # idempotent round rewrite
    st.write_round(_pages(3), 0)
    assert st.count() == 3
    # remove
    st.remove([page_uuid("http://h.test/p/0")])
    assert st.count() == 2
    st.clear()
    assert st.count() == 0


def test_parquet_store_except_columns(tmp_path):
    st = ParquetPageStore(str(tmp_path / "pages"), except_columns=["bytes"])
    st.write_round(_pages(4), 0)
    row = st.get(page_uuid("http://h.test/p/1"))
    assert "bytes" not in row and row["caption"] == "cap 1"


def test_memory_store_upsert_and_golden_uuid():
    st = MemoryPageStore()
    st.write_round(_pages(3), 0)
    assert st.count() == 3
    st.write_round(_pages(3), 1)  # same uuids -> upsert
    assert st.count() == 3
    # golden uuid (reference memory_store_spec.rb:11)
    assert page_uuid("http://www.google.com") == "ed646a3334ca891fd3467db131372140"


def test_devnull_and_factory(tmp_path):
    dn = DevNullPageStore()
    dn.write_round(_pages(3), 0)
    assert dn.count() == 0 and dn.get("x") is None and list(dn.each()) == []
    assert isinstance(make_store("memory"), MemoryPageStore)
    assert isinstance(make_store("parquet", str(tmp_path / "x")), ParquetPageStore)
    with pytest.raises(ValueError):
        make_store("mongo")


def test_lance_mirror_via_stub(tmp_path, monkeypatch):
    """The lance mirror is import-gated (no lance wheel in this
    container); drive the real _lance_mirror/lance_dataset code with a
    minimal parquet-backed stub module so the path isn't dead code."""
    import os
    import sys
    import types

    import pyarrow.parquet as pq

    calls = []

    def write_dataset(table, path, mode="create"):
        calls.append((path, mode, table.num_rows))
        os.makedirs(path, exist_ok=True)
        pq.write_table(table, os.path.join(path, f"frag-{len(calls)}.parquet"))

    def dataset(path):
        import glob

        t = pa.concat_tables([pq.read_table(f) for f in sorted(glob.glob(os.path.join(path, "*.parquet")))])

        class _DS:
            def to_table(self):
                return t

            def count_rows(self):
                return t.num_rows

        return _DS()

    stub = types.ModuleType("lance")
    stub.write_dataset = write_dataset
    stub.dataset = dataset
    monkeypatch.setitem(sys.modules, "lance", stub)

    st = ParquetPageStore(str(tmp_path / "pages"))
    st.write_round(_pages(5, 0), 0)
    st.write_round(_pages(3, 1), 1)
    assert [c[1] for c in calls] == ["create", "append"]
    ds = st.lance_dataset()
    assert ds is not None and ds.count_rows() == 8
    assert sorted(ds.to_table()["seq"].to_pylist()) == [0, 0, 1, 1, 2, 2, 3, 4]
