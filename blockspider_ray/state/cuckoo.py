"""Sharded URL-seen set: cuckoo filter + exact shadow set.

The seen-set is the crawl analog of the reference's dedup maps during the
reorg walk (`sidechainmap`/`dedup`, /root/reference/crawler/blocks.go:133,146-155)
and the simulator's `blockmap` index (/root/reference/cmd/reorgd/main.go:111-118).

Design (SURVEY.md §2.6 D1): the *scaled* structure is an approximate
cuckoo filter (16-bit fingerprints, 4-way buckets, partial-key cuckoo
hashing per Fan et al. 2014, "Cuckoo Filter: Practically Better Than
Bloom", CoNEXT) sized per shard; conformance tests require exact
seen-set equality, so each shard also keeps an exact uint64 set which is
authoritative when ``exact=True``. At 10^10-URL scale the exact set is
dropped and the filter's measured FP rate (~2^-13 at 95% load) bounds
over-filtering; because each shard owns a disjoint host range there are
no cross-shard races on membership.
"""

from __future__ import annotations

import numpy as np

_EMPTY = np.uint16(0)


class CuckooFilter:
    """Cuckoo filter over 64-bit keys. 4 slots/bucket, 16-bit fingerprints."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int, seed: int = 11):
        nbuckets = 1
        while nbuckets * self.SLOTS < capacity:
            nbuckets <<= 1
        self.nbuckets = nbuckets
        self.mask = np.uint64(nbuckets - 1)
        self.table = np.zeros((nbuckets, self.SLOTS), dtype=np.uint16)
        self.count = 0
        self._rng = np.random.default_rng(seed)

    def _fp(self, key: int) -> int:
        # fingerprint in [1, 0xffff] (0 marks an empty slot)
        fp = (key ^ (key >> 33)) & 0xFFFF
        return fp if fp != 0 else 1

    def _i1(self, key: int) -> int:
        return int(np.uint64(key >> 16) & self.mask)

    def _i2(self, i1: int, fp: int) -> int:
        # partial-key cuckoo hashing: alternate bucket from fp only
        h = (fp * 0x5BD1E995) & 0xFFFFFFFFFFFFFFFF
        return int((np.uint64(i1) ^ np.uint64(h)) & self.mask)

    def add(self, key: int) -> bool:
        fp = self._fp(key)
        i1 = self._i1(key)
        i2 = self._i2(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == _EMPTY)
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict loop
        i = i1 if self._rng.integers(0, 2) == 0 else i2
        for _ in range(self.MAX_KICKS):
            slot = int(self._rng.integers(0, self.SLOTS))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = self._i2(i, fp)
            row = self.table[i]
            empty = np.flatnonzero(row == _EMPTY)
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        return False  # table full — caller must grow/flag

    def contains(self, key: int) -> bool:
        fp = self._fp(key)
        i1 = self._i1(key)
        if fp in self.table[i1]:
            return True
        return fp in self.table[self._i2(i1, fp)]

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership probe for a uint64 key array."""
        keys = keys.astype(np.uint64, copy=False)
        fp = (keys ^ (keys >> np.uint64(33))) & np.uint64(0xFFFF)
        fp = np.where(fp == 0, np.uint64(1), fp).astype(np.uint16)
        i1 = ((keys >> np.uint64(16)) & self.mask).astype(np.int64)
        h = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        i2 = ((i1.astype(np.uint64) ^ h) & self.mask).astype(np.int64)
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, capacity: int, seed: int = 11) -> "CuckooFilter":
        cf = cls(capacity, seed=seed)
        tbl = np.frombuffer(data, dtype=np.uint16).reshape(-1, cls.SLOTS).copy()
        assert tbl.shape == cf.table.shape, "checkpoint capacity mismatch"
        cf.table = tbl
        cf.count = int((tbl != _EMPTY).sum())
        return cf


class SeenSet:
    """One shard's URL-seen set.

    exact=True (conformance + test scale): a sorted uint64 array with a
    small unsorted tail — membership is a vectorized ``searchsorted`` +
    ``isin``; inserts append to the tail, which is merged into the base
    whenever it outgrows base/4 (amortized O(n) per crawl, all numpy).
    exact=False (10^10 scale path): the cuckoo filter alone, with its
    documented false-positive rate standing in for exactness."""

    _COMPACT_MIN = 4096

    def __init__(self, capacity: int = 1 << 20, exact: bool = True):
        self.exact = exact
        self.filter = CuckooFilter(capacity) if not exact else None
        self._base = np.array([], dtype=np.uint64)  # sorted
        self._tail: list[np.ndarray] = []
        self._tail_n = 0
        self.overflow = 0  # failed filter inserts (approximate mode)

    def __len__(self) -> int:
        if not self.exact:
            return self.filter.count
        return len(self._base) + self._tail_n

    def _compact(self, force: bool = False) -> None:
        if self._tail_n and (
            force or self._tail_n > max(self._COMPACT_MIN, len(self._base) // 4)
        ):
            merged = np.concatenate([self._base, *self._tail])
            merged.sort(kind="stable")
            self._base = merged
            self._tail = []
            self._tail_n = 0

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        if not self.exact:
            return self.filter.contains_many(keys)
        self._compact()
        idx = np.searchsorted(self._base, keys)
        idx = np.minimum(idx, max(len(self._base) - 1, 0))
        hit = self._base[idx] == keys if len(self._base) else np.zeros(len(keys), dtype=bool)
        if self._tail_n:
            tail = np.concatenate(self._tail)
            hit |= np.isin(keys, tail)
        return hit

    def add_many(self, keys: np.ndarray) -> None:
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return
        if not self.exact:
            failed = 0
            for k in keys:
                if not self.filter.add(int(k)):
                    failed += 1
            if failed:
                # a silently dropped insert is a false NEGATIVE forever:
                # the url would be re-enqueued and re-crawled on every
                # discovery. Fail loudly instead — the filter is sized by
                # cfg.cuckoo_capacity_per_shard and must be grown.
                self.overflow += failed
                raise RuntimeError(
                    f"cuckoo filter saturated ({self.filter.count} entries, "
                    f"{self.overflow} dropped inserts): raise "
                    "cuckoo_capacity_per_shard or add shards"
                )
            return
        self._tail.append(keys.copy())
        self._tail_n += len(keys)

    def snapshot(self) -> tuple[bytes, np.ndarray]:
        if not self.exact:
            return self.filter.to_bytes(), np.array([], np.uint64)
        self._compact(force=True)
        # exact mode: no filter bytes persisted — the cuckoo filter is
        # rebuildable from the exact array, and skipping the (MB-scale)
        # table dump keeps per-round checkpoints cheap
        return b"", self._base

    @classmethod
    def restore(cls, filter_bytes: bytes, exact_arr: np.ndarray, capacity: int, exact: bool = True) -> "SeenSet":
        s = cls.__new__(cls)
        s.exact = exact
        s._base = np.array([], dtype=np.uint64)
        s._tail = []
        s._tail_n = 0
        s.overflow = 0
        if exact:
            s.filter = None
            s._base = np.asarray(exact_arr, dtype=np.uint64).copy()
            s._base.sort(kind="stable")
        else:
            s.filter = CuckooFilter.from_bytes(filter_bytes, capacity)
        return s
