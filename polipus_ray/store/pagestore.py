"""Page stores — the reference storage adapter surface
(reference lib/polipus/storage/base.rb add/exists?/get/remove/count/each
+- mongo_store/rethink_store/memory_store/dev_null) re-expressed for a
columnar engine.

``ParquetPageStore`` is the real sink: pages land as parquet (zstd —
the at-rest compression that replaces the reference's zlib-deflated
body, mongo_store.rb:29) under ``pages/round=R/host_bucket=B/``.
Round-partitioned writes are idempotent (a re-run of round R
overwrites exactly round R's directory) — the Ray-native analogue of
the reference's uuid-keyed upsert.  ``except`` columns (M21,
storage.rb:7,14) are dropped before write.  If the ``lance`` package
is importable the store mirrors each round into a Lance dataset; this
container has no lance, so parquet is the tested path.

Membership/TTL queries (``exists?``-style) are NOT served from these
files — they live in the sharded seen/stored manifest
(polipus_ray.seen.shards) which the engine consults in-pipeline;
driver-side ``get``/``each``/``count`` here exist for API parity and
tests and do a (pruned) parquet read.

``MemoryPageStore`` is the in-process dict store used as the pytest
oracle (reference storage/memory_store.rb); ``DevNullPageStore``
discards everything (reference storage/dev_null.rb — the bench mode).
"""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq


class PageStore:
    include_query_string_in_uuid: bool = True

    def write_round(self, table: pa.Table, round_no: int) -> None:
        raise NotImplementedError

    def count(self) -> int:
        raise NotImplementedError

    def get(self, uuid: str):
        raise NotImplementedError

    def each(self):
        raise NotImplementedError

    def remove(self, uuids: list[str]) -> None:
        raise NotImplementedError

    def clear(self) -> None:
        raise NotImplementedError


class ParquetPageStore(PageStore):
    def __init__(self, root: str, except_columns: list[str] | None = None, num_buckets: int = 8):
        self.root = root
        self.except_columns = list(except_columns or [])
        self.num_buckets = num_buckets
        os.makedirs(root, exist_ok=True)

    def round_dir(self, round_no: int) -> str:
        return os.path.join(self.root, f"round={round_no}")

    def write_round(self, table: pa.Table, round_no: int) -> None:
        """Driver-side write of one round's pages (bucketed by
        host_bucket).  The engine normally writes via
        Dataset.write_parquet into round_dir; this path is for tests
        and small tables."""
        drop = [c for c in self.except_columns if c in table.column_names]
        if drop:
            table = table.drop_columns(drop)
        d = self.round_dir(round_no)
        if os.path.exists(d):
            shutil.rmtree(d)  # idempotent re-run of a round
        os.makedirs(d, exist_ok=True)
        if table.num_rows == 0:
            return
        bucket = table["host_bucket"].to_numpy() % self.num_buckets
        for b in set(bucket.tolist()):
            sub = table.filter(pa.array(bucket == b))
            bd = os.path.join(d, f"host_bucket={b}")
            os.makedirs(bd, exist_ok=True)
            pq.write_table(sub, os.path.join(bd, "part-0.parquet"), compression="zstd")
        self._lance_mirror(table)

    @property
    def lance_path(self) -> str:
        return os.path.join(self.root, "pages.lance")

    def _lance_mirror(self, table: pa.Table) -> None:
        """Mirror the round into a Lance dataset when the package is
        importable (the input_hint's native format).  Import-gated: the
        test container has no lance wheel, so tests exercise this path
        through a parquet-backed stub module (tests/test_store.py) and
        real deployments get a true Lance dataset."""
        try:
            import lance
        except ImportError:
            return
        mode = "append" if os.path.exists(self.lance_path) else "create"
        lance.write_dataset(table, self.lance_path, mode=mode)

    def lance_dataset(self):
        """Open the Lance mirror (None when lance is unavailable or
        nothing was mirrored)."""
        try:
            import lance
        except ImportError:
            return None
        if not os.path.exists(self.lance_path):
            return None
        return lance.dataset(self.lance_path)

    def files(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.root, "round=*", "**", "*.parquet"), recursive=True))

    def read_table(self, columns: list[str] | None = None) -> pa.Table:
        fs = self.files()
        if not fs:
            return pa.table({})
        return pa.concat_tables([pq.read_table(f, columns=columns) for f in fs])

    def count(self) -> int:
        return sum(pq.read_metadata(f).num_rows for f in self.files())

    def get(self, uuid: str):
        t = self.read_table()
        if t.num_rows == 0:
            return None
        import pyarrow.compute as pc

        m = t.filter(pc.equal(t["uuid"], uuid))
        if m.num_rows == 0:
            return None
        return m.slice(m.num_rows - 1, 1).to_pylist()[0]  # latest write wins

    def each(self):
        for row in self.read_table().to_pylist():
            yield row["uuid"], row

    def remove(self, uuids: list[str]) -> None:
        """Rewrite affected files without the given uuids (test-scale
        utility; at scale removal is a tombstone/anti-join concern)."""
        import pyarrow.compute as pc

        kill = set(uuids)
        for f in self.files():
            t = pq.read_table(f)
            mask = pc.invert(pc.is_in(t["uuid"], value_set=pa.array(list(kill))))
            t2 = t.filter(mask)
            if t2.num_rows != t.num_rows:
                pq.write_table(t2, f, compression="zstd")

    def clear(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
        os.makedirs(self.root, exist_ok=True)


class MemoryPageStore(PageStore):
    def __init__(self, except_columns: list[str] | None = None):
        self.except_columns = list(except_columns or [])
        self.pages: dict[str, dict] = {}

    def write_round(self, table: pa.Table, round_no: int) -> None:
        if table.num_rows == 0:
            return
        drop = [c for c in self.except_columns if c in table.column_names]
        if drop:
            table = table.drop_columns(drop)
        for row in table.to_pylist():
            self.pages[row["uuid"]] = row  # upsert by uuid

    def count(self) -> int:
        return len(self.pages)

    def get(self, uuid: str):
        return self.pages.get(uuid)

    def each(self):
        yield from self.pages.items()

    def remove(self, uuids: list[str]) -> None:
        for u in uuids:
            self.pages.pop(u, None)

    def clear(self) -> None:
        self.pages.clear()


class DevNullPageStore(PageStore):
    """Discards everything; exists? is always false (dev_null.rb)."""

    def write_round(self, table: pa.Table, round_no: int) -> None:
        pass

    def count(self) -> int:
        return 0

    def get(self, uuid: str):
        return None

    def each(self):
        return iter(())

    def remove(self, uuids: list[str]) -> None:
        pass

    def clear(self) -> None:
        pass


def make_store(kind: str, root: str | None = None, except_columns: list[str] | None = None) -> PageStore:
    if kind in ("parquet", "lance"):
        assert root, "parquet/lance store needs a root dir"
        return ParquetPageStore(root, except_columns)
    if kind == "memory":
        return MemoryPageStore(except_columns)
    if kind == "devnull":
        return DevNullPageStore()
    raise ValueError(f"unknown store kind {kind!r}")
