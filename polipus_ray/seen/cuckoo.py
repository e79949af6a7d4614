"""A numpy-backed cuckoo filter over 64-bit key hashes.

Replaces the reference's Redis bloom filter URL tracker (reference
lib/polipus/url_tracker/bloomfilter.rb: capacity 1e6, 1% FP,
visited?/visit/remove/clear).  A cuckoo filter is used instead of a
bloom filter because the tracker API includes ``remove`` (needed for
TTL-based recrawl) and per the north rule.  Probabilistic FPs are
in-spec (the reference runs at 1% FP); tests pin behavior against the
exact-set oracle at sizes where FP ~ 0.

Layout: ``buckets x 4`` slots of uint16 fingerprints (0 = empty).
fingerprint  = bits 48..63 of the key hash, forced nonzero.
index1       = hash & (buckets-1)
index2       = index1 XOR (fp * 0x5bd1e995) & (buckets-1)   (partial-key cuckoo)
Insert does BFS-free random-walk eviction up to ``max_kicks``.
~2.1 bytes/key at 95% load: a 10^10-URL seen set is ~25 GB total,
shardable across a few hundred actors (see shards.py).

Serialization: ``to_bytes``/``from_bytes`` (checkpoint snapshots).
Deterministic: the eviction "random" walk is seeded from the key.
"""

from __future__ import annotations

import io

import numpy as np

_SLOTS = 4
_MIX = np.uint64(0x5BD1E995)


class CuckooFilter:
    def __init__(self, capacity: int = 1_000_000, max_kicks: int = 500):
        nbuckets = 1
        while nbuckets * _SLOTS < capacity:
            nbuckets *= 2
        # headroom: cuckoo fills to ~95%; add one doubling
        nbuckets *= 2
        self.nbuckets = nbuckets
        self.mask = np.uint64(nbuckets - 1)
        self.table = np.zeros((nbuckets, _SLOTS), dtype=np.uint16)
        self.max_kicks = max_kicks
        self.count = 0
        # overflow stash: when an insert exhausts max_kicks the final
        # homeless fingerprint lands here as (bucket_idx, fp) instead
        # of being dropped — a silent drop would erase a PREVIOUSLY
        # inserted key (false negative), re-admitting seen URLs forever.
        # Non-empty stash == the filter is undersized; inserts still
        # never lose data.  A multiset: distinct keys can collide on
        # (bucket, fp), and each copy must survive its own remove().
        self.stash: dict[tuple[int, int], int] = {}

    # -- key decomposition (plain-int: the single-key hot path) -----------
    def _fp(self, h: int) -> int:
        fp = (h >> 48) & 0xFFFF
        return fp if fp != 0 else 1

    def _i1(self, h: int) -> int:
        return h & (self.nbuckets - 1)

    def _alt(self, i: int, fp: int) -> int:
        # fp * MIX < 2^48: no uint64 wrap -> identical to the
        # vectorized contains_many computation
        return (i ^ (fp * 0x5BD1E995)) & (self.nbuckets - 1)

    # -- single-key ops ---------------------------------------------------
    def contains(self, h: int) -> bool:
        fp = self._fp(h)
        i1 = self._i1(h)
        t = self.table
        if t[i1, 0] == fp or t[i1, 1] == fp or t[i1, 2] == fp or t[i1, 3] == fp:
            return True
        i2 = self._alt(i1, fp)
        if t[i2, 0] == fp or t[i2, 1] == fp or t[i2, 2] == fp or t[i2, 3] == fp:
            return True
        return bool(self.stash) and ((i1, fp) in self.stash or (i2, fp) in self.stash)

    def add(self, h: int) -> bool:
        """Insert; never loses a key: on kick-limit exhaustion the
        homeless fingerprint goes to the overflow stash (returns False
        to signal the filter is over capacity, but membership is
        preserved either way).  Hot path: manual slot scan (numpy
        array-op temporaries cost ~5 us/insert; this is ~1 us — the
        frontier does one insert per unique URL ever discovered)."""
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._alt(i1, fp)
        t = self.table
        for i in (i1, i2):
            for s in range(_SLOTS):
                if t[i, s] == 0:
                    t[i, s] = fp
                    self.count += 1
                    return True
        # evict: deterministic walk seeded by the key (64-bit LCG)
        i = i1 if (h & 1) == 0 else i2
        cur = fp
        state = (h | 1) & 0xFFFFFFFFFFFFFFFF
        for _ in range(self.max_kicks):
            state = (state * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
            slot = (state >> 62) & (_SLOTS - 1)
            cur, t[i, slot] = int(t[i, slot]), cur
            i = self._alt(i, cur)
            for s in range(_SLOTS):
                if t[i, s] == 0:
                    t[i, s] = cur
                    self.count += 1
                    return True
        # full: park the evicted fingerprint in the stash.  `i` is one
        # of cur's two valid buckets (the walk just moved there via
        # alt()), so contains() finds it by either candidate index.
        k = (int(i), int(cur))
        self.stash[k] = self.stash.get(k, 0) + 1
        self.count += 1
        return False  # over capacity — caller should size up / resize

    def remove(self, h: int) -> bool:
        fp = self._fp(h)
        i1 = self._i1(h)
        for i in (i1, self._alt(i1, fp)):
            row = self.table[i]
            hit = np.flatnonzero(row == fp)
            if hit.size:
                row[hit[0]] = 0
                self.count -= 1
                return True
        if self.stash:
            for i in (i1, self._alt(i1, fp)):
                c = self.stash.get((i, fp))
                if c:
                    if c == 1:
                        del self.stash[(i, fp)]
                    else:
                        self.stash[(i, fp)] = c - 1
                    self.count -= 1
                    return True
        return False

    def clear(self) -> None:
        self.table[:] = 0
        self.stash.clear()
        self.count = 0

    # -- batched ops (the hot path from the dedup stage) ------------------
    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        hashes = hashes.astype(np.uint64, copy=False)
        fps = ((hashes >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fps[fps == 0] = 1
        i1 = (hashes & self.mask).astype(np.int64)
        i2 = ((np.uint64(0) + i1.astype(np.uint64)) ^ (fps.astype(np.uint64) * _MIX)) & self.mask
        t1 = self.table[i1]  # (n, SLOTS)
        t2 = self.table[i2.astype(np.int64)]
        f = fps[:, None]
        out = ((t1 == f) | (t2 == f)).any(axis=1)
        if self.stash:
            # stash is only populated at overload; scan just the misses
            st = self.stash
            for j in np.flatnonzero(~out):
                if (int(i1[j]), int(fps[j])) in st or (int(i2[j]), int(fps[j])) in st:
                    out[j] = True
        return out

    def add_many(self, hashes: np.ndarray) -> bool:
        """Vectorized bulk insert of keys KNOWN ABSENT (caller probes
        first).  Placement semantics match the scalar ``add`` hot path
        — first free slot of i1, else of i2 — resolved for a whole
        batch at once: keys are stable-sorted by target bucket, each
        key's within-bucket rank selects the rank-th free slot, and
        only keys whose rank exceeds the bucket's free slots fall
        through (to i2, then to the scalar kick path — rare below
        ~95% load).  Membership is identical to the scalar loop; only
        the kick-chain interleaving can differ, which ``contains``
        is insensitive to (both candidate buckets are probed).
        Returns False if any key overflowed to the stash."""
        h = np.asarray(hashes, dtype=np.uint64)
        n = len(h)
        if n == 0:
            return True
        fps = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fps[fps == 0] = 1
        i1 = (h & self.mask).astype(np.int64)
        i2 = ((i1.astype(np.uint64) ^ (fps.astype(np.uint64) * _MIX)) & self.mask).astype(np.int64)
        t = self.table
        rem = np.arange(n)
        for b_all in (i1, i2):
            if not len(rem):
                break
            b = b_all[rem]
            # claimant order within a bucket is immaterial to
            # membership (every fitting claimant gets SOME free slot),
            # so an unstable sort is fine
            order = np.argsort(b)
            bs = b[order]
            m = len(bs)
            first = np.empty(m, dtype=bool)
            first[0] = True
            np.not_equal(bs[1:], bs[:-1], out=first[1:])
            inv = np.cumsum(first) - 1  # key -> unique-bucket row
            idx = np.arange(m)
            run_start = np.maximum.accumulate(np.where(first, idx, 0))
            rank = idx - run_start
            # per UNIQUE bucket: free-slot count + free-slot positions
            # packed as nibbles (slot of rank r = nibble r) — keeps the
            # per-key work 1-D instead of (m, SLOTS)
            ub = bs[first]
            z = t[ub] == 0  # (u, SLOTS)
            cnt = np.zeros(len(ub), np.int64)
            fs = np.zeros(len(ub), np.int64)
            for j in range(_SLOTS):
                zj = z[:, j]
                fs |= np.where(zj, np.left_shift(j, 4 * cnt), 0)
                cnt += zj
            fits = rank < cnt[inv]
            slot = (fs[inv[fits]] >> (4 * rank[fits])) & 0xF
            t[bs[fits], slot] = fps[rem[order[fits]]]
            self.count += int(fits.sum())
            rem = rem[order[~fits]]
        ok = True
        for j in rem:  # kick path (add() maintains count/stash itself)
            ok &= self.add(int(h[j]))
        return ok

    def check_and_add_many(self, hashes: np.ndarray) -> np.ndarray:
        """For each hash: True if already present, else insert it and
        return False.  Duplicate hashes within the batch behave like
        the reference's serialized enqueue (first occurrence inserts,
        later ones read "visited").  Vectorized probe over the unique
        keys; genuinely-new keys go through the vectorized bulk
        insert."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        if hashes.size == 0:
            return np.zeros(0, dtype=bool)
        uniq, first_idx = np.unique(hashes, return_index=True)
        pre = self.contains_many(uniq)
        overloaded = not self.add_many(uniq[~pre])
        if overloaded and not getattr(self, "_warned_full", False):
            self._warned_full = True
            import logging

            logging.getLogger(__name__).warning(
                "cuckoo filter over capacity (count=%d, buckets=%d): inserts "
                "now land in the overflow stash (%d entries) — size capacity up",
                self.count,
                self.nbuckets,
                len(self.stash),
            )
        out = np.ones(len(hashes), dtype=bool)
        out[first_idx[~pre]] = False
        return out

    # -- snapshot ---------------------------------------------------------
    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        stash = np.array([(i, fp, c) for (i, fp), c in sorted(self.stash.items())], dtype=np.int64).reshape(-1, 3)
        np.savez_compressed(buf, table=self.table, count=np.int64(self.count), max_kicks=np.int64(self.max_kicks), stash=stash)
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        with np.load(io.BytesIO(data)) as z:
            table = z["table"]
            obj = cls.__new__(cls)
            obj.table = table.copy()
            obj.nbuckets = table.shape[0]
            obj.mask = np.uint64(obj.nbuckets - 1)
            obj.count = int(z["count"])
            obj.max_kicks = int(z["max_kicks"])
            obj.stash = {(int(a), int(b)): int(c) for a, b, c in z["stash"]} if "stash" in z else {}
            return obj
