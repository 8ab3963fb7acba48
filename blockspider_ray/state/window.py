"""Bounded rollback window — the reorg-cache analog.

Mirrors the reference's bounded ``BlockStack`` of the last ≤N committed
blocks (/root/reference/cache/stack.go:8-65: push evicts the tail at the
limit; "Must be larger than reorgs", README.md:62). Each shard keeps the
last ≤W ACCEPTED crawl-log rows with their content digests; at round
start the engine re-probes those digests against the page store and
every mismatch triggers a DROPPED retraction + re-crawl (the reorg
walk-back, /root/reference/crawler/blocks.go:131-189). A mutation of a
page whose row has been evicted is undetectable — the documented analog
of "reorg deeper than cache" (SURVEY.md §2.8.4), except we degrade
silently per-URL instead of crashing.
"""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass


@dataclass
class WindowEntry:
    round: int
    seq: int
    url: str
    host: str
    url_hash: int
    priority: int
    digest: int
    n_links: int


class RollbackWindow:
    """Insertion-ordered bounded map url -> WindowEntry; re-crawling a url
    replaces its entry (moves it to newest); eviction drops the oldest."""

    def __init__(self, limit: int):
        self.limit = int(limit)
        self._d: "OrderedDict[str, WindowEntry]" = OrderedDict()

    def push(self, e: WindowEntry) -> None:
        if e.url in self._d:
            del self._d[e.url]
        self._d[e.url] = e
        while len(self._d) > self.limit:
            self._d.popitem(last=False)

    def entries(self) -> list[WindowEntry]:
        return list(self._d.values())

    def remove(self, url: str) -> None:
        self._d.pop(url, None)

    def __len__(self) -> int:
        return len(self._d)

    def __contains__(self, url: str) -> bool:
        return url in self._d
