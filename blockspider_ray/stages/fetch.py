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


def fetch_batch_rpc(batch: pa.Table, *, rpc_url: str, max_conns: int = 8) -> pa.Table:
    """Fetch over the JSON-RPC façade — the load-bearing network path
    (reference semantics: the crawler pulls every block over JSON-RPC,
    /root/reference/common/rpc.go:69-93 one ``eth_getBlockByNumber`` call
    per block, run concurrently under the synchronizer's MaxRoutines cap,
    /root/reference/crawler/blocks.go:55-80). Here: one ``sim_getPage``
    call per scheduled URL against a served ``SimulatorHTTPD`` store,
    ``max_conns`` concurrent connections per batch (the MaxRoutines
    analog). Politeness is enforced upstream by the scheduler's token
    budget — batches arrive host-grouped and politeness-bounded, so the
    per-batch connection cap is the only extra throttle needed.

    Byte parity with the zero-copy path: the daemon base64-encodes the
    stored html verbatim, so decoded bytes are identical to a
    ``SharedPages`` gather (pinned by test_conformance); missing URLs
    come back null, like ``lookup_col``'s null-safe take."""
    import base64
    import time
    from concurrent.futures import ThreadPoolExecutor

    from ..sources.httpd import rpc

    urls = batch.column("url").to_pylist()

    def one(u: str) -> bytes | None:
        # bounded retry: a transient daemon hiccup (refused connect,
        # timeout, truncated read) must not raise out of the Ray task —
        # application exceptions are NOT retried by Ray, so an unhandled
        # one aborts the whole round (the reference crawler's RPC loop
        # likewise survives individual call failures and re-polls).
        last: Exception | None = None
        for attempt in range(3):
            try:
                r = rpc(rpc_url, "sim_getPage", [u])
                rec = r.get("result")
                if rec is None or rec.get("html") is None:
                    return None
                return base64.b64decode(rec["html"])
            except (OSError, ValueError) as e:  # socket/HTTP + JSON decode
                last = e
                time.sleep(0.05 * (2**attempt))
        raise RuntimeError(f"sim_getPage({u!r}) failed after 3 attempts: {last}") from last

    if urls:
        with ThreadPoolExecutor(max_workers=min(max_conns, len(urls))) as ex:
            htmls = list(ex.map(one, urls))
    else:
        htmls = []
    return batch.append_column("html", pa.array(htmls, pa.binary()))


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
