"""Frontier spill — the queue-overflow design as data layout.

Reference behavior being re-expressed (SURVEY.md §2 S9-S11, O4-O5, T6;
reference lib/polipus/queue_overflow/*): the Redis main queue holds at
most ``queue_items_limit`` messages; an overflow manager rotates the
*oldest* excess into an adapter (Mongo FIFO / capped / DevNull) and
restores it when the queue drains.

Here the whole frontier is a FIFO list of parquet part files
(seq-ordered).  Per round the engine activates the oldest parts up to
``queue_items_limit`` rows; the rest stays spilled on disk — the
frontier is NEVER fully resident (at 10^10 URLs it cannot be).
Adapter kinds change only the retention policy applied after append
(part-granular, parts are written small enough that the approximation
is tight):

- ``None`` / ``"parquet"``: keep everything (reference: no adapter =
  unbounded Redis; mongo adapter = unbounded spill).
- ``"devnull"``: drop the OLDEST parts beyond ``queue_items_limit``
  (the reference rotates oldest excess into DevNull, i.e. keeps the
  newest ``limit``).
- ``"capped"``: drop the oldest parts beyond ``queue_items_limit +
  capped_max`` (the capped Mongo queue keeps the newest ``max`` of
  the spilled stream, mongo_queue_capped.rb:11-21).
- ``"uniq"``: dedup on push by ``url_hash`` (the reference's
  ensure_uniq upsert mode, mongo_queue.rb:30-32, 53-57 — its spec:
  2 rows after 40 duplicate pushes).  API-parity adapter: the engine
  normally dedups upstream at tracker admission, so the uniq set here
  is only as large as what callers push.

Restored items are re-validated at round start by the engine's
dequeue-side re-check (policy sans tracker + storage anti-join),
which subsumes the reference's restore-time ``url_filter`` +
``storage.exists?`` re-check (manager.rb:35-53, J4).

The parts list is JSON-serializable — it IS the frontier section of
the checkpoint manifest.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


class FrontierSpill:
    def __init__(self, root: str, adapter: str | None = None, queue_items_limit: int = 2_000_000, capped_max: int = 0, part_rows: int | None = None):
        self.root = root
        self.adapter = adapter
        self.limit = queue_items_limit
        self.capped_max = capped_max
        # part granularity bounds both retention precision (devnull/
        # capped trim whole parts) and restore granularity; default:
        # a quarter of the active limit, capped at 64k rows
        self.part_rows = part_rows or max(1, min(65536, queue_items_limit // 4))
        self.parts: list[dict] = []  # {path, rows, part_id[, hist]} FIFO (oldest first)
        # slice-exact prebalancing (engine): parts may carry a
        # per-chunk host_bucket histogram ("hist", np.int64 array of
        # len num_buckets).  take_active() sums the hists of the parts
        # it activates into last_active_hist — the EXACT per-bucket
        # load of the round about to run — so the engine can rebalance
        # the bucket->actor LUT against the real capped slice instead
        # of a full-frontier estimate (which mispredicts whenever
        # queue_items_limit cuts a wave).  num_buckets is set by the
        # engine; None disables hist computation in append_table.
        self.num_buckets: int | None = None
        self.last_active_hist = None
        self.last_active_hists: list | None = None
        # part files consumed by take_active(): they must outlive the
        # checkpoints that reference them (crash-resume re-reads them),
        # so deletion is deferred to gc_consumed()
        self.consumed: list[str] = []
        self._next_part = 0
        # uniq adapter ONLY: url_hashes ever pushed.  SCALE BOUND: this
        # is an unbounded driver-side set (one int per distinct hash)
        # and state() serializes it into every checkpoint manifest —
        # intentional for the small API-parity surface it exists for
        # (reference queue_overflow ensure_uniq specs).  A production
        # frontier uses the sharded cuckoo seen-set (seen/shards.py)
        # for dedup; do NOT enable adapter='uniq' at crawl scale.
        self._pushed: set[int] = set()
        # plasma mode (engine sets this when checkpointing is OFF and
        # the pool scheduler runs): parts are Ray object refs instead
        # of parquet files — no lz4/zstd encode, no file IO, zero-copy
        # reads in the actors.  Checkpointable runs keep parquet parts
        # (refs don't survive the driver, so state() refuses them).
        self.plasma = False
        os.makedirs(root, exist_ok=True)

    # -- append (enqueue side) -------------------------------------------
    def append_table(self, table: pa.Table) -> None:
        if table.num_rows == 0:
            return
        if self.adapter == "uniq" and "url_hash" in table.column_names:
            import numpy as np

            hs = table["url_hash"].to_numpy()
            fresh = np.fromiter((int(h) not in self._pushed for h in hs), dtype=bool, count=len(hs))
            # first occurrence within the batch wins, like upsert
            seen_local: set[int] = set()
            for k, h in enumerate(hs.tolist()):
                if fresh[k]:
                    if h in seen_local:
                        fresh[k] = False
                    else:
                        seen_local.add(h)
            self._pushed.update(seen_local)
            if not fresh.all():
                table = table.filter(pa.array(fresh))
            if table.num_rows == 0:
                return
        hb_all = None
        if self.num_buckets and "host_bucket" in table.column_names:
            import numpy as np

            hb_all = table["host_bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        for off in range(0, table.num_rows, self.part_rows):
            chunk = table.slice(off, self.part_rows)
            hist = None
            if hb_all is not None:
                import numpy as np

                hist = np.bincount(hb_all[off : off + self.part_rows], minlength=self.num_buckets)
            if self.plasma:
                import ray

                part = {"ref": ray.put(chunk.combine_chunks()), "rows": chunk.num_rows, "part_id": self._next_part}
            else:
                path = os.path.join(self.root, f"part-{self._next_part:06d}.parquet")
                pq.write_table(chunk, path, compression="zstd")
                part = {"path": path, "rows": chunk.num_rows, "part_id": self._next_part}
            if hist is not None:
                part["hist"] = hist
            self.parts.append(part)
            self._next_part += 1
        self._enforce()

    def _enforce(self) -> None:
        if self.adapter == "devnull":
            cap = self.limit
        elif self.adapter == "capped":
            cap = self.limit + self.capped_max
        else:
            return
        # drop OLDEST parts while the NEWEST `cap` rows fit without them
        while self.parts and (self.total_rows() - self.parts[0]["rows"]) >= cap:
            dead = self.parts.pop(0)
            if "path" in dead:
                try:
                    os.remove(dead["path"])
                except OSError:
                    pass

    def register_part(self, path: str, rows: int, hist=None) -> None:
        """Adopt a part file written elsewhere (e.g. by a fetch actor
        in relaxed-order mode).  ``hist`` is the part's optional
        per-bucket row histogram (see class docstring note)."""
        if rows <= 0:
            return
        part = {"path": path, "rows": rows, "part_id": self._next_part}
        if hist is not None:
            part["hist"] = hist
        self.parts.append(part)
        self._next_part += 1
        self._enforce()

    def register_ref(self, ref, rows: int, hist=None) -> None:
        """Adopt a plasma part (Ray ObjectRef of a frontier-schema
        Arrow table) written by a fetch actor in plasma mode."""
        if rows <= 0:
            return
        part = {"ref": ref, "rows": rows, "part_id": self._next_part}
        if hist is not None:
            part["hist"] = hist
        self.parts.append(part)
        self._next_part += 1
        self._enforce()

    # -- activate (dequeue side) -----------------------------------------
    def take_active(self, limit_rows: int | None = None) -> tuple[list, int]:
        """Pop the oldest parts covering up to limit_rows (at least one
        part).  Returns (items, rows) — each item is a parquet path or
        a plasma ObjectRef (plasma mode)."""
        limit_rows = limit_rows or self.limit
        items, rows = [], 0
        hists: list = []
        while self.parts and (not items or rows + self.parts[0]["rows"] <= limit_rows):
            p = self.parts.pop(0)
            items.append(p["path"] if "path" in p else p["ref"])
            rows += p["rows"]
            hists.append(p.get("hist"))
        # per-part histograms aligned with items (entries may be None):
        # the engine routes each part only to the actors owning rows in
        # it.  last_active_hist = exact per-bucket load of THIS slice
        # (None when any part predates hist emission, e.g. restored
        # from a checkpoint manifest).
        self.last_active_hists = hists
        self.last_active_hist = sum(h for h in hists if h is not None) if hists and all(h is not None for h in hists) else None
        self.consumed.extend(i for i in items if isinstance(i, str))
        return items, rows

    def gc_consumed(self, referenced: set[str] | None = None) -> int:
        """Delete consumed part files no longer referenced by any
        retained checkpoint manifest (pass the union of their spill
        paths as ``referenced``; None/empty means nothing needs them
        for crash-resume).  Without this every part ever written
        lives for the whole run — unbounded disk on long crawls."""
        referenced = referenced or set()
        live = {p["path"] for p in self.parts if "path" in p} | referenced
        keep, removed = [], 0
        for path in self.consumed:
            if path in live:
                keep.append(path)
                continue
            try:
                os.remove(path)
                removed += 1
            except OSError:
                pass
        self.consumed = keep
        return removed

    def hists_complete(self) -> bool:
        """True when every pending part carries a bucket histogram —
        i.e. the next take_active() will produce a slice-exact
        last_active_hist and the engine can skip its estimate-based
        end-of-round rebalance."""
        return bool(self.parts) and all(p.get("hist") is not None for p in self.parts)

    def total_rows(self) -> int:
        return sum(p["rows"] for p in self.parts)

    def empty(self) -> bool:
        return not self.parts

    # -- checkpoint -------------------------------------------------------
    def state(self) -> dict:
        if any("ref" in p for p in self.parts):
            raise ValueError("plasma spill parts are not checkpointable; run with cfg.checkpoint=True to keep parquet parts")
        # hist arrays are a perf hint, not state: drop from the JSON
        # manifest (restored parts fall back to full-frontier agg)
        st = {"parts": [{k: v for k, v in p.items() if k != "hist"} for p in self.parts], "next_part": self._next_part}
        if self.adapter == "uniq":
            st["pushed"] = sorted(self._pushed)
        return st

    def load_state(self, st: dict) -> None:
        self.parts = list(st["parts"])
        self._next_part = int(st["next_part"])
        self._pushed = set(st.get("pushed", ()))
