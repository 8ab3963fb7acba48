"""Link-routing stage: discovered links + window candidates -> shard actors.

An actor-pool ``map_batches`` stage that, per batch:

  1. explodes the ``links`` list column, computes each link's canonical
     host / url_hash / owner shard (hash64(host) %% nshards), and ships
     one Arrow sub-table per target shard directly to that shard's
     frontier actor (``ingest``) — the data never touches the driver
     (broadcast-free, driver-free link exchange; the shuffle is the
     actor routing itself, keyed identically to the frontier partition).
  2. ships each ACCEPTED row's rollback-window candidate (digest, text,
     seq, ...) to the row's own shard actor (``window_candidates``).
  3. returns the batch minus the ``links`` column (the crawl-log shape).

Delivery is synchronous per batch (``ray.get`` before returning), so
when the Dataset pipeline completes, every ingest has been applied —
the round barrier analog of the reference's ``taskChain.Finish()``
(/root/reference/syncronizer/synchronizer.go:89-95).

Idempotence: re-delivery of the same links (task retry) is harmless —
the seen-set makes enqueue idempotent and window candidates are keyed by
(url, seq).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.urls import hash64


# worker-process-global actor-handle cache (same persistence argument as
# stages.fetch.worker_store: worker processes outlive rounds)
_HANDLES: dict[str, "ray.actor.ActorHandle"] = {}


def _shard_actor(ns: str, shard: int):
    key = f"{ns}-shard-{shard}"
    h = _HANDLES.get(key)
    if h is None:
        h = ray.get_actor(key)
        _HANDLES[key] = h
    return h


def route_links(batch: pa.Table, *, actor_ns: str, nshards: int) -> pa.Table:
    """Task-pool form of RouteLinks (see class docstring above)."""
    return RouteLinks(actor_ns, nshards)(batch)


class RouteLinks:
    def __init__(self, actor_ns: str, nshards: int):
        self.ns = actor_ns
        self.nshards = nshards

    def _actor(self, shard: int):
        return _shard_actor(self.ns, shard)

    def __call__(self, batch: pa.Table) -> pa.Table:
        links_col = batch.column("links")
        prios = batch.column("priority").to_numpy(zero_copy_only=False)
        refs = []

        # 1. explode links and route to owner shards
        flat_links: list[str] = []
        flat_prio: list[int] = []
        for i in range(batch.num_rows):
            ls = links_col[i].as_py()
            if ls:
                p = int(prios[i]) + 1
                flat_links.extend(ls)
                flat_prio.extend([p] * len(ls))
        if flat_links:
            hosts = [u.split("/")[2].split(":")[0] for u in flat_links]
            hh = hash64(hosts)
            uh = hash64(flat_links)
            shard = (hh % np.uint64(self.nshards)).astype(np.int64)
            ltab = pa.table(
                {
                    "url": pa.array(flat_links, pa.string()),
                    "host": pa.array(hosts, pa.string()),
                    "url_hash": pa.array(uh, pa.uint64()),
                    "priority": pa.array(flat_prio, pa.int64()),
                }
            )
            for s in np.unique(shard):
                sub = ltab.filter(pa.array(shard == s))
                refs.append(self._actor(int(s)).ingest.remote(sub))

        # 2. window candidates for ACCEPTED rows, to the row's own shard
        acc_mask = pa.compute.equal(batch.column("status"), "ACCEPTED")
        acc = batch.filter(acc_mask)
        if acc.num_rows:
            wtab = acc.select(["round", "seq", "url", "host", "url_hash", "priority", "digest", "n_links", "text"])
            shards = acc.column("shard").to_numpy(zero_copy_only=False)
            for s in np.unique(shards):
                sub = wtab.filter(pa.array(shards == s))
                refs.append(self._actor(int(s)).window_candidates.remote(sub))

        if refs:
            ray.get(refs)
        return batch.drop_columns(["links", "digest"])
