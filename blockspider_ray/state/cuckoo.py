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
    """One shard's URL-seen set: cuckoo filter (scale path) + exact uint64
    set (authoritative under ``exact=True``, required by conformance)."""

    def __init__(self, capacity: int = 1 << 20, exact: bool = True):
        self.exact = exact
        self.filter = CuckooFilter(capacity)
        self._set: set[int] = set()

    def __len__(self) -> int:
        return len(self._set) if self.exact else self.filter.count

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        if self.exact:
            return np.fromiter((int(k) in self._set for k in keys), dtype=bool, count=len(keys))
        return self.filter.contains_many(keys)

    def add_many(self, keys: np.ndarray) -> None:
        for k in keys:
            k = int(k)
            self.filter.add(k)
            if self.exact:
                self._set.add(k)

    def snapshot(self) -> tuple[bytes, np.ndarray]:
        exact_arr = np.fromiter(self._set, dtype=np.uint64, count=len(self._set)) if self.exact else np.array([], np.uint64)
        exact_arr.sort()
        return self.filter.to_bytes(), exact_arr

    @classmethod
    def restore(cls, filter_bytes: bytes, exact_arr: np.ndarray, capacity: int, exact: bool = True) -> "SeenSet":
        s = cls.__new__(cls)
        s.exact = exact
        s.filter = CuckooFilter.from_bytes(filter_bytes, capacity)
        s._set = set(int(x) for x in exact_arr) if exact else set()
        return s
