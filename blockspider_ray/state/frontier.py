"""Per-host priority frontier + politeness token buckets.

The frontier is the crawl analog of the reference's ordered task chain
(/root/reference/syncronizer/synchronizer.go:3-55): work is released in a
deterministic order regardless of fetch parallelism. Here the order is
defined (not inherited from a serial committer): within a host, URLs pop
in ``(priority, url)`` ascending order; across hosts, the round's global
sequence is ``(priority, host, url)`` ascending (assigned by the engine).

Politeness is the ticker-interval analog (/root/reference/crawler/crawler.go:34-40):
each host may schedule at most ``tokens_per_host_per_round`` URLs per
round (full refill per round — deterministic, parallelism-independent).
"""

from __future__ import annotations

import heapq
import time
from collections import defaultdict


class TokenBucket:
    """Classic rate-limited token bucket (provided for wall-clock-polite
    deployments; the conformance engine uses per-round full refill, which
    is this bucket with capacity==refill and one refill per round)."""

    def __init__(self, capacity: float, refill_per_sec: float, now: float | None = None):
        self.capacity = float(capacity)
        self.refill = float(refill_per_sec)
        self.tokens = float(capacity)
        self._last = time.monotonic() if now is None else now

    def try_acquire(self, n: float = 1.0, now: float | None = None) -> bool:
        t = time.monotonic() if now is None else now
        self.tokens = min(self.capacity, self.tokens + (t - self._last) * self.refill)
        self._last = t
        if self.tokens >= n:
            self.tokens -= n
            return True
        return False


class HostFrontier:
    """Priority frontier for the hosts one shard owns.

    Per host: a lazy-deletion heap of ``(priority, url)``. Pop order is
    strictly ``(priority, url)`` ascending — deterministic for any insert
    order, which is what makes the distributed engine's output equal to
    the sequential oracle's at any parallelism.
    """

    def __init__(self):
        self._heaps: dict[str, list[tuple[int, str, int]]] = defaultdict(list)
        self._queued: set[str] = set()  # urls currently queued (dedup guard)
        self.size = 0

    def push(self, host: str, url: str, priority: int, url_hash: int = 0) -> bool:
        """Queue a url; returns False if it is already queued.

        ``url_hash`` rides along so the scheduler never re-hashes urls
        (urls are unique within a heap, so the trailing tuple element
        never participates in heap ordering)."""
        if url in self._queued:
            return False
        heapq.heappush(self._heaps[host], (priority, url, url_hash))
        self._queued.add(url)
        self.size += 1
        return True

    def extend_host_unqueued(self, host: str, items: list[tuple[int, str, int]]) -> None:
        """Bulk enqueue of one host's urls KNOWN not to be queued.

        Sound only for fresh-unseen discoveries: the engine marks every
        url seen at enqueue time, so an url that passed the seen-filter
        cannot already be queued (queued ⊆ seen). List extend + one
        heapify is C-level O(m + heap) vs m python ``heappush`` calls —
        the finalize-barrier hot path (engine._finalize_discoveries)."""
        if not items:
            return
        heap = self._heaps[host]
        heap.extend(items)
        heapq.heapify(heap)
        self._queued.update(u for _, u, _ in items)
        self.size += len(items)

    def pop_host(self, host: str, k: int) -> list[tuple[int, str]]:
        """Pop up to k urls of one host in (priority, url) order."""
        heap = self._heaps.get(host)
        out: list[tuple[int, str]] = []
        while heap and len(out) < k:
            prio, url, _ = heapq.heappop(heap)
            self._queued.discard(url)
            self.size -= 1
            out.append((prio, url))
        if heap is not None and not heap:
            del self._heaps[host]
        return out

    def pop_host_hashed(self, host: str, k: int) -> list[tuple[int, str, int]]:
        """pop_host keeping the stored url_hash."""
        heap = self._heaps.get(host)
        out: list[tuple[int, str, int]] = []
        while heap and len(out) < k:
            prio, url, uh = heapq.heappop(heap)
            self._queued.discard(url)
            self.size -= 1
            out.append((prio, url, uh))
        if heap is not None and not heap:
            del self._heaps[host]
        return out

    def pop_round(self, tokens_per_host: int) -> list[tuple[int, str, str]]:
        """One round's politeness-bounded candidates from every host:
        list of (priority, host, url). Hosts are visited in sorted order
        so the result is deterministic."""
        out: list[tuple[int, str, str]] = []
        for host in sorted(self._heaps.keys()):
            for prio, url in self.pop_host(host, tokens_per_host):
                out.append((prio, host, url))
        return out

    def pop_round_hashed(self, tokens_per_host: int) -> list[tuple[int, str, str, int]]:
        """pop_round keeping url hashes: (priority, host, url, url_hash)."""
        out: list[tuple[int, str, str, int]] = []
        for host in sorted(self._heaps.keys()):
            for prio, url, uh in self.pop_host_hashed(host, tokens_per_host):
                out.append((prio, host, url, uh))
        return out

    def pop_round_quota(self, tokens_per_host: int, quota: int) -> list[tuple[int, str, str, int]]:
        """Global top-``quota`` round candidates by (priority, host, url)
        ascending, politeness-capped per host — WITHOUT materializing the
        full politeness pop.

        Equivalent to ``sorted(pop_round_hashed(t))[:quota]`` + pushing
        the rest back, but implemented as a lazy k-way merge over the
        per-host (priority, url)-ordered streams: each host contributes
        at most one in-flight entry to the merge heap, so only
        ``quota + n_hosts`` entries are ever popped (vs the whole
        politeness pop — millions in the giant-round regime this quota
        degradation exists for). In-flight entries left in the merge heap
        when the quota fills are pushed straight back (at most one per
        host). Selection and output order are bit-identical to the
        sort-based form: (priority, host, url) is unique shard-wide, so
        the trailing url_hash never participates in comparisons."""
        taken: dict[str, int] = {}

        def pull(host: str):
            heap = self._heaps.get(host)
            if not heap or taken.get(host, 0) >= tokens_per_host:
                if heap is not None and not heap:
                    del self._heaps[host]
                return None
            prio, url, uh = heapq.heappop(heap)
            self._queued.discard(url)
            self.size -= 1
            taken[host] = taken.get(host, 0) + 1
            if not heap:
                del self._heaps[host]
            return (prio, host, url, uh)

        merge: list[tuple[int, str, str, int]] = []
        for host in list(self._heaps.keys()):
            e = pull(host)
            if e is not None:
                merge.append(e)
        heapq.heapify(merge)
        out: list[tuple[int, str, str, int]] = []
        while merge and len(out) < quota:
            e = heapq.heappop(merge)
            out.append(e)
            nxt = pull(e[1])
            if nxt is not None:
                heapq.heappush(merge, nxt)
        for prio, host, url, uh in merge:  # in-flight leftovers: <= 1/host
            self.push(host, url, prio, uh)
        return out

    def items(self) -> list[tuple[int, str, str]]:
        """All queued (priority, url, host) — checkpoint snapshot order:
        (host, priority, url)."""
        out = []
        for host in sorted(self._heaps.keys()):
            for prio, url, _ in sorted(self._heaps[host]):
                out.append((prio, url, host))
        return out

    def items_hashed(self) -> list[tuple[int, str, str, int]]:
        out = []
        for host in sorted(self._heaps.keys()):
            for prio, url, uh in sorted(self._heaps[host]):
                out.append((prio, url, host, uh))
        return out

    def items_unordered(self) -> list[tuple[int, str, str, int]]:
        """Checkpoint dump without per-host sorting: restore pushes every
        entry back into heaps, so file order is irrelevant to state —
        sorting ~10^5 queued urls per shard per round was pure overhead.
        (Use items_hashed when byte-stable files matter, e.g. tests.)"""
        out = []
        for host in sorted(self._heaps.keys()):
            for prio, url, uh in self._heaps[host]:
                out.append((prio, url, host, uh))
        return out

    def __len__(self) -> int:
        return self.size
