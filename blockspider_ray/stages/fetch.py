"""Fetch-simulation stage: scheduled URLs -> html blobs.

An actor-pool ``map_batches`` stage (callable class: PageStore opened
once per actor in ``__init__``, reused across batches). The crawl analog
of the reference's parallel block fetch
(/root/reference/crawler/blocks.go:62-92 running S1 lookups concurrently
under the synchronizer); parallel fetch is safe because ordering was
already fixed by the scheduler's ``seq`` column — order is data, not
execution (in-order-commit analog, syncronizer/synchronizer.go:12-36).
"""

from __future__ import annotations

import pyarrow as pa

from ..sources.pages import PageStore


class FetchSim:
    def __init__(self, pages_dir: str, max_cached_shards: int = 16):
        self.store = PageStore(pages_dir, max_cached_shards=max_cached_shards)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        hosts = batch.column("host").to_pylist()
        htmls = self.store.lookup(urls, hosts)
        return batch.append_column("html", pa.array(htmls, pa.binary()))


# Worker-process-global PageStore cache: Ray worker processes persist across
# tasks AND across Dataset executions (rounds), so a task-pool stage gets
# actor-pool-grade state amortization without paying actor-pool startup on
# every round. Keyed by pages_dir; mtime checks inside PageStore keep the
# cache coherent across mid-crawl page mutations.
_STORES: dict[str, PageStore] = {}


def worker_store(pages_dir: str, max_cached_shards: int = 16) -> PageStore:
    store = _STORES.get(pages_dir)
    if store is None:
        store = PageStore(pages_dir, max_cached_shards=max_cached_shards)
        _STORES[pages_dir] = store
    return store


def fetch_batch(batch: pa.Table, *, pages_dir: str) -> pa.Table:
    """Task-pool fetch-sim: scheduled rows -> + html column."""
    store = worker_store(pages_dir)
    urls = batch.column("url").to_pylist()
    hosts = batch.column("host").to_pylist()
    htmls = store.lookup(urls, hosts)
    return batch.append_column("html", pa.array(htmls, pa.binary()))
