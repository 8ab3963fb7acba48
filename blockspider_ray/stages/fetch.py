"""Fetch-simulation stage: scheduled URLs -> html blobs.

The crawl analog of the reference's parallel block fetch
(/root/reference/crawler/blocks.go:62-92 running S1 lookups concurrently
under the synchronizer); parallel fetch is safe because ordering was
already fixed by the scheduler's ``seq`` column — order is data, not
execution (in-order-commit analog, syncronizer/synchronizer.go:12-36).

The hot path resolves URLs against ``SharedPages``: per-pshard Arrow
tables living in the Ray object store, read zero-copy by every task
(one physical copy node-wide). Batches arrive pshard-grouped from the
scheduler, so each batch probes exactly one shared table with one
vectorized ``pc.index_in``.
"""

from __future__ import annotations

import pyarrow as pa

from ..sources.pages import PageStore, SharedPages


def fetch_batch(batch: pa.Table, *, pages_refs: dict, n_pshards: int) -> pa.Table:
    """Fetch-sim over the object-store-shared pages: + html column.
    Fully vectorized: the url column goes straight into the index_in
    probe and the gather is a null-safe pc.take (no python round-trip)."""
    shared = SharedPages(pages_refs, n_pshards)
    url_col = batch.column("url").combine_chunks()
    hosts = batch.column("host").to_numpy(zero_copy_only=False)
    htmls = shared.lookup_col(url_col, hosts)
    if isinstance(htmls, pa.ChunkedArray):
        htmls = htmls.combine_chunks()
    return batch.append_column("html", htmls)


class FetchSim:
    """Disk-backed variant (actor-state LRU of url->html dicts) — kept for
    deployments without an object-store-resident page set."""

    def __init__(self, pages_dir: str, max_cached_shards: int = 16):
        self.store = PageStore(pages_dir, max_cached_shards=max_cached_shards)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        hosts = batch.column("host").to_pylist()
        htmls = self.store.lookup(urls, hosts)
        return batch.append_column("html", pa.array(htmls, pa.binary()))
