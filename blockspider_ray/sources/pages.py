"""Host-sharded page store — the fetch-simulation source.

Analog of the reference's RPC point-lookup readers
(/root/reference/common/rpc.go:69-97: GetBlockByHeight/Hash): scheduled
URLs are resolved against a host-sharded Parquet layout
(``pages_dir/pshard=S/part.parquet``, S = hash64(host) %% N_PAGE_SHARDS).

Because both the store layout and the crawl partitioning key off the
host hash, a fetch batch touches few physical shards; each FetchSim
actor lazily loads and caches a url->html dict per physical shard
(actor-state amortization — setup once per actor, not per batch). In a
real deployment this stage is the HTTP fetcher; here it is a
deterministic lookup join (SURVEY.md §2.1 S1).

Mutation support: ``refresh()`` drops caches so mid-crawl page rewrites
(the reorg analog, FIXTURES.md §6) become visible at the next round.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np
import pyarrow.parquet as pq

from ..functions.extract import content_digest
from ..functions.urls import hash64


class PageStore:
    def __init__(self, pages_dir: str, max_cached_shards: int = 16):
        self.pages_dir = pages_dir
        self.max_cached = max_cached_shards
        self.n_shards = len([d for d in os.listdir(pages_dir) if d.startswith("pshard=")])
        self._cache: "OrderedDict[int, dict[str, bytes]]" = OrderedDict()
        self._mtimes: dict[int, float] = {}

    def _shard_path(self, s: int) -> str:
        return os.path.join(self.pages_dir, f"pshard={s}", "part.parquet")

    def _load_shard(self, s: int) -> dict[str, bytes]:
        path = self._shard_path(s)
        mtime = os.path.getmtime(path) if os.path.exists(path) else -1.0
        hit = self._cache.get(s)
        if hit is not None and self._mtimes.get(s) == mtime:
            self._cache.move_to_end(s)
            return hit
        if not os.path.exists(path):
            d: dict[str, bytes] = {}
        else:
            t = pq.read_table(path, columns=["url", "html"])
            d = dict(zip(t.column("url").to_pylist(), t.column("html").to_pylist()))
        self._cache[s] = d
        self._mtimes[s] = mtime
        self._cache.move_to_end(s)
        while len(self._cache) > self.max_cached:
            old, _ = self._cache.popitem(last=False)
            self._mtimes.pop(old, None)
        return d

    def refresh(self) -> None:
        self._cache.clear()
        self._mtimes.clear()

    def shard_of_hosts(self, hosts: list[str]) -> np.ndarray:
        return (hash64(hosts) % np.uint64(self.n_shards)).astype(np.int64)

    def lookup(self, urls: list[str], hosts: list[str]) -> list[bytes | None]:
        """html per url (None = 404 / dead link)."""
        shards = self.shard_of_hosts(hosts)
        out: list[bytes | None] = [None] * len(urls)
        for s in np.unique(shards):
            d = self._load_shard(int(s))
            for i in np.flatnonzero(shards == s):
                out[i] = d.get(urls[i])
        return out

    def lookup_digests(self, urls: list[str], hosts: list[str]) -> np.ndarray:
        """Current content digest per url (0 = missing) — the lineage probe
        used for retraction detection."""
        htmls = self.lookup(urls, hosts)
        return np.fromiter((content_digest(h) if h is not None else 0 for h in htmls), dtype=np.uint64, count=len(urls))

    def read_robots(self) -> dict[str, str]:
        """host -> robots.txt body for every host that has one (preloaded
        once at crawl start and broadcast — config-filter analog)."""
        out: dict[str, str] = {}
        for s in range(self.n_shards):
            path = self._shard_path(s)
            if not os.path.exists(path):
                continue
            t = pq.read_table(path, columns=["url", "text"])
            for u, x in zip(t.column("url").to_pylist(), t.column("text").to_pylist()):
                if u.endswith("/robots.txt"):
                    host = u.split("/")[2]
                    out[host] = x
        return out
