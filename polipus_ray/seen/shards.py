"""Sharded URL-seen + stored-page state, held in an actor pool.

Replaces two pieces of reference shared state at once (they collapse
naturally because both are keyed by canonical URL):

- the Redis bloomfilter URL tracker (reference
  lib/polipus/url_tracker/bloomfilter.rb, wired lib/polipus.rb:338-344,
  probed at enqueue lib/polipus.rb:390,433) -> ``CuckooFilter`` (or an
  exact set, the test oracle — reference
  lib/polipus/url_tracker/redis_set.rb);
- the storage ``exists?``/TTL manifest (reference lib/polipus.rb:404-416,
  storage/base.rb) -> a per-shard ``{url_hash64: fetched_at}`` dict.
  The page *content* lives in the parquet/lance page store; only the
  membership+timestamp needed by ``page_exists?``/``page_expired?``
  lives here.

Partitioning: ``shard = host_hash64 % num_shards``.  Host affinity
keeps all URLs of one host in one shard — the same key the frontier
is partitioned by, so a dedup stage's batch usually touches few
shards, and politeness state stays co-located.  Skew: a pathological
single-host crawl concentrates on one shard; the engine's per-round
``max_urls_per_host`` cap bounds the per-round traffic per shard.

At 10^10 URLs: cuckoo ~2.1 B/key -> ~25 GB total; with 256 shards
each actor holds ~100 MB of filter + the stored dict.  Shards are
snapshot-able (bytes) for per-round checkpoints.

The pool works in two modes: ``use_ray=True`` (each shard a Ray actor,
``num_cpus`` fractional — probes are short) or local in-process
objects (unit tests / the oracle simulator).
"""

from __future__ import annotations

import pickle

import numpy as np

from .cuckoo import CuckooFilter


class _ExactFilter:
    """Exact-set stand-in with the CuckooFilter batched API (the
    oracle for the probabilistic filter, as the reference's RedisSet
    is for its bloomfilter)."""

    def __init__(self, capacity: int = 0, max_kicks: int = 0):
        self._s: set[int] = set()

    @property
    def count(self) -> int:
        return len(self._s)

    def contains(self, h: int) -> bool:
        return int(h) in self._s

    def add(self, h: int) -> bool:
        self._s.add(int(h))
        return True

    def remove(self, h: int) -> bool:
        try:
            self._s.remove(int(h))
            return True
        except KeyError:
            return False

    def clear(self) -> None:
        self._s.clear()

    def contains_many(self, hashes) -> np.ndarray:
        return np.fromiter((int(h) in self._s for h in hashes), dtype=bool, count=len(hashes))

    def check_and_add_many(self, hashes) -> np.ndarray:
        out = np.empty(len(hashes), dtype=bool)
        for j, h in enumerate(hashes):
            h = int(h)
            out[j] = h in self._s
            self._s.add(h)
        return out

    def to_bytes(self) -> bytes:
        return pickle.dumps(self._s, protocol=5)

    @classmethod
    def from_bytes(cls, data: bytes) -> "_ExactFilter":
        obj = cls()
        obj._s = pickle.loads(data)
        return obj


_DELETED = np.int64(-2)  # unmark tombstone in the pending journal


class UrlSeenShard:
    """One shard: seen-filter + stored-page manifest.  Runs either as
    a plain object (tests) or as a Ray actor (the pool wraps it).

    The stored manifest (url_hash64 -> fetched_at) is a sorted uint64
    array + int64 timestamps with an append-only pending journal:
    mark/unmark batches append O(1); any probe first folds the journal
    in (one stable argsort, last-write-wins, tombstones dropped) then
    answers with a vectorized searchsorted — no per-row dict loops in
    the admission critical path."""

    def __init__(self, kind: str = "cuckoo", capacity: int = 1_000_000):
        self.kind = kind
        self._mk = CuckooFilter if kind == "cuckoo" else _ExactFilter
        self.filter = self._mk(capacity)
        self.capacity = capacity
        self._st_h = np.empty(0, np.uint64)  # compacted, sorted
        self._st_t = np.empty(0, np.int64)
        self._pend: list[tuple[np.ndarray, np.ndarray]] = []

    # --- tracker API (url_tracker parity: visited?/visit/remove/clear) ---
    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        return self.filter.check_and_add_many(hashes)

    def admit_sorted(self, refs: list, tags: list, num_buckets: int):
        """Distributed deterministic admission for this shard's
        candidate slice (engine det mode, r5): fetch the actors'
        per-shard key splits from plasma (each already comp-sorted),
        merge them into global FIFO order, run the sequential
        first-occurrence probe, and return ONLY the admitted rows'
        (comp, source-actor tag, oloc) plus the per-bucket admitted
        histogram the rebalancer folds.  Byte-identical decisions to
        the old driver merge: the pool's scatter handed this shard the
        same subsequence in the same comp order (per-URL admission
        only depends on the relative probe order of that URL's
        occurrences, and every occurrence of one URL routes here)."""
        import ray

        parts = [ray.get(r) if not isinstance(r, dict) else r for r in refs]
        if not parts:
            z = np.empty(0, np.int64)
            return z, z, z, np.zeros(num_buckets, np.int64)
        comp = np.concatenate([p["comp"] for p in parts])
        uh = np.concatenate([p["uh"] for p in parts])
        hh = np.concatenate([p["hh"] for p in parts])
        oloc = np.concatenate([p["oloc"] for p in parts])
        tag = np.concatenate([np.full(len(p["comp"]), t, np.int64) for p, t in zip(parts, tags)])
        order = np.argsort(comp, kind="stable")  # W presorted runs -> galloping merge
        seen = self.filter.check_and_add_many(uh[order])
        keep = order[~seen]  # ascending comp among admitted
        hist = np.bincount(
            (hh[keep].astype(np.uint64, copy=False) % np.uint64(num_buckets)).astype(np.int64), minlength=num_buckets
        )
        return comp[keep], tag[keep], oloc[keep], hist

    def visited(self, hashes: np.ndarray) -> np.ndarray:
        return self.filter.contains_many(hashes)

    def visit(self, hashes: np.ndarray) -> None:
        for h in np.asarray(hashes, dtype=np.uint64):
            if not self.filter.contains(int(h)):
                self.filter.add(int(h))

    def remove(self, hashes: np.ndarray) -> None:
        for h in np.asarray(hashes, dtype=np.uint64):
            self.filter.remove(int(h))

    def clear(self) -> None:
        self.filter.clear()
        self._st_h = np.empty(0, np.uint64)
        self._st_t = np.empty(0, np.int64)
        self._pend.clear()

    # --- storage manifest API (page_exists? / ttl) -----------------------
    def mark_stored(self, hashes: np.ndarray, fetched_at: np.ndarray) -> None:
        h = np.asarray(hashes, dtype=np.uint64)
        if len(h):
            self._pend.append((h.copy(), np.asarray(fetched_at, dtype=np.int64).copy()))

    def unmark_stored(self, hashes: np.ndarray) -> None:
        h = np.asarray(hashes, dtype=np.uint64)
        if len(h):
            self._pend.append((h.copy(), np.full(len(h), _DELETED, dtype=np.int64)))

    def _compact(self) -> None:
        """Fold the pending journal into the sorted base: stable sort
        by hash keeps arrival order within equal runs, the run's LAST
        entry wins (dict-upsert semantics), tombstones drop out."""
        if not self._pend:
            return
        hs = np.concatenate([self._st_h] + [p[0] for p in self._pend])
        ts = np.concatenate([self._st_t] + [p[1] for p in self._pend])
        self._pend.clear()
        order = np.argsort(hs, kind="stable")
        hs = hs[order]
        ts = ts[order]
        last = np.empty(len(hs), dtype=bool)
        last[-1:] = True
        last[:-1] = hs[1:] != hs[:-1]
        keep = last & (ts != _DELETED)
        self._st_h = np.ascontiguousarray(hs[keep])
        self._st_t = np.ascontiguousarray(ts[keep])

    def stored_info(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(exists mask, fetched_at; -1 where absent)."""
        self._compact()
        q = np.asarray(hashes, dtype=np.uint64)
        n = len(q)
        if not len(self._st_h) or not n:
            return np.zeros(n, dtype=bool), np.full(n, -1, dtype=np.int64)
        pos = np.searchsorted(self._st_h, q)
        pos_c = np.minimum(pos, len(self._st_h) - 1)
        exists = self._st_h[pos_c] == q
        ts = np.where(exists, self._st_t[pos_c], np.int64(-1))
        return exists, ts

    def counts(self) -> dict:
        self._compact()
        return {"seen": self.filter.count, "stored": int(len(self._st_h))}

    # --- checkpoint ------------------------------------------------------
    def snapshot(self) -> bytes:
        self._compact()
        return pickle.dumps(
            {
                "kind": self.kind,
                "capacity": self.capacity,
                "filter": self.filter.to_bytes(),
                "stored_h": self._st_h,
                "stored_t": self._st_t,
            },
            protocol=5,
        )

    def restore(self, data: bytes) -> None:
        st = pickle.loads(data)
        self.kind = st["kind"]
        self.capacity = st["capacity"]
        self._mk = CuckooFilter if self.kind == "cuckoo" else _ExactFilter
        self.filter = self._mk.from_bytes(st["filter"])
        self._pend = []
        if "stored_h" in st:
            self._st_h = np.asarray(st["stored_h"], dtype=np.uint64)
            self._st_t = np.asarray(st["stored_t"], dtype=np.int64)
        else:  # pre-r4 snapshot: dict manifest
            d = st["stored"]
            h = np.fromiter(d.keys(), dtype=np.uint64, count=len(d))
            t = np.fromiter(d.values(), dtype=np.int64, count=len(d))
            o = np.argsort(h)
            self._st_h = h[o]
            self._st_t = t[o]


class SeenShardPool:
    """Routes batched probes to shards by ``host_hash64 % num_shards``
    and reassembles results in input order.  One round-trip per touched
    shard per call (probes are batched, never per-URL RPCs)."""

    def __init__(self, num_shards: int = 8, kind: str = "cuckoo", capacity_per_shard: int = 1_000_000, use_ray: bool = True):
        self.num_shards = num_shards
        self.use_ray = use_ray
        if use_ray:
            import ray

            # num_cpus=0: shards are small mostly-idle state holders
            # serving sub-ms batched probes; reserving CPU per shard
            # would starve the data-task pool on small clusters
            actor = ray.remote(num_cpus=0)(UrlSeenShard)
            self.shards = [actor.remote(kind=kind, capacity=capacity_per_shard) for _ in range(num_shards)]
        else:
            self.shards = [UrlSeenShard(kind=kind, capacity=capacity_per_shard) for _ in range(num_shards)]

    def _gather(self, refs):
        if self.use_ray:
            import ray

            return ray.get(refs)
        return refs

    def _call(self, shard_id: int, method: str, *args):
        h = self.shards[shard_id]
        if self.use_ray:
            return getattr(h, method).remote(*args)
        return getattr(h, method)(*args)

    def _route(self, host_hashes: np.ndarray) -> np.ndarray:
        return (np.asarray(host_hashes, dtype=np.uint64) % np.uint64(self.num_shards)).astype(np.int64)

    def _scatter_gather(self, method: str, url_hashes, host_hashes, extra_cols=()):
        """Partition rows by shard, one batched call per shard, then
        scatter results back to input order."""
        url_hashes = np.asarray(url_hashes, dtype=np.uint64)
        sid = self._route(host_hashes)
        order = np.argsort(sid, kind="stable")
        bounds = np.searchsorted(sid[order], np.arange(self.num_shards + 1))
        refs, spans = [], []
        for s in range(self.num_shards):
            lo, hi = bounds[s], bounds[s + 1]
            if lo == hi:
                continue
            idx = order[lo:hi]
            args = [url_hashes[idx]] + [np.asarray(c)[idx] for c in extra_cols]
            refs.append(self._call(s, method, *args))
            spans.append(idx)
        results = self._gather(refs)
        return results, spans

    def check_and_add(self, url_hashes, host_hashes) -> np.ndarray:
        results, spans = self._scatter_gather("check_and_add", url_hashes, host_hashes)
        out = np.zeros(len(url_hashes), dtype=bool)
        for r, idx in zip(results, spans):
            out[idx] = r
        return out

    def admit_sorted(self, per_shard_refs: list[list], per_shard_tags: list[list], num_buckets: int) -> list:
        """Fan the actors' plasma key-split refs out to their shards
        (one batched admit_sorted per touched shard, all in parallel)
        and gather the narrow admitted triples.  The keys themselves
        never pass through the caller."""
        refs = []
        for s in range(self.num_shards):
            if per_shard_refs[s]:
                refs.append(self._call(s, "admit_sorted", per_shard_refs[s], per_shard_tags[s], num_buckets))
        return self._gather(refs)

    def visited(self, url_hashes, host_hashes) -> np.ndarray:
        results, spans = self._scatter_gather("visited", url_hashes, host_hashes)
        out = np.zeros(len(url_hashes), dtype=bool)
        for r, idx in zip(results, spans):
            out[idx] = r
        return out

    def visit(self, url_hashes, host_hashes) -> None:
        self._scatter_gather("visit", url_hashes, host_hashes)

    def remove(self, url_hashes, host_hashes) -> None:
        self._scatter_gather("remove", url_hashes, host_hashes)

    def mark_stored(self, url_hashes, host_hashes, fetched_at) -> None:
        self._scatter_gather("mark_stored", url_hashes, host_hashes, extra_cols=(np.asarray(fetched_at, dtype=np.int64),))

    def mark_stored_async(self, url_hashes, host_hashes, fetched_at) -> list:
        """Fire-and-forget mark_stored: one batched task per touched
        shard, WITHOUT gathering — returns the ObjectRefs for the
        caller to await at a barrier.  Ray orders tasks per
        (caller, actor) pair, so a caller's later probes to the same
        shard always observe its own marks; cross-caller visibility is
        guaranteed once the refs are awaited (the engine does this at
        the round barrier, overlapping the RPC with other actors'
        compute instead of blocking each actor's critical path)."""
        url_hashes = np.asarray(url_hashes, dtype=np.uint64)
        fetched_at = np.asarray(fetched_at, dtype=np.int64)
        sid = self._route(host_hashes)
        order = np.argsort(sid, kind="stable")
        bounds = np.searchsorted(sid[order], np.arange(self.num_shards + 1))
        refs = []
        for s in range(self.num_shards):
            lo, hi = bounds[s], bounds[s + 1]
            if lo == hi:
                continue
            idx = order[lo:hi]
            r = self._call(s, "mark_stored", url_hashes[idx], fetched_at[idx])
            if self.use_ray:
                refs.append(r)
        return refs

    def unmark_stored(self, url_hashes, host_hashes) -> None:
        self._scatter_gather("unmark_stored", url_hashes, host_hashes)

    def stored_info(self, url_hashes, host_hashes) -> tuple[np.ndarray, np.ndarray]:
        results, spans = self._scatter_gather("stored_info", url_hashes, host_hashes)
        exists = np.zeros(len(url_hashes), dtype=bool)
        ts = np.full(len(url_hashes), -1, dtype=np.int64)
        for (ex, t), idx in zip(results, spans):
            exists[idx] = ex
            ts[idx] = t
        return exists, ts

    def counts(self) -> dict:
        per = self._gather([self._call(s, "counts") for s in range(self.num_shards)])
        return {
            "seen": sum(c["seen"] for c in per),
            "stored": sum(c["stored"] for c in per),
            "per_shard": per,
        }

    def snapshot_all(self) -> list[bytes]:
        return self._gather([self._call(s, "snapshot") for s in range(self.num_shards)])

    def restore_all(self, blobs: list[bytes]) -> None:
        assert len(blobs) == self.num_shards, "shard count mismatch on restore"
        self._gather([self._call(s, "restore", b) for s, b in enumerate(blobs)])

    def clear(self) -> None:
        self._gather([self._call(s, "clear") for s in range(self.num_shards)])
