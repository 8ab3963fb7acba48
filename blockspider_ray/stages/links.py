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

from ..functions.urls import hash64, url_host


# worker-process-global actor-handle cache (same persistence argument as
# stages.fetch.worker_store: worker processes outlive rounds)
_HANDLES: dict[str, "ray.actor.ActorHandle"] = {}

# worker-process-global cache of resolved seen-snapshot arrays, keyed by
# ObjectRef. The broadcast refs change once per round but every batch of
# the round re-reads them — without the cache that is nshards plasma
# round-trips per batch (a measurable share of route time at 32 cores,
# all hitting the one raylet). Bounded: refs of finished rounds are
# evicted when a new round's ref replaces them.
_SEEN_CACHE: dict[int, tuple["ray.ObjectRef", "np.ndarray"]] = {}


def _seen_array(shard: int, ref):
    hit = _SEEN_CACHE.get(shard)
    if hit is not None and hit[0] == ref:
        return hit[1]
    arr = ray.get(ref)  # sorted uint64, zero-copy from plasma
    _SEEN_CACHE[shard] = (ref, arr)
    return arr


def _shard_actor(ns: str, shard: int):
    key = f"{ns}-shard-{shard}"
    h = _HANDLES.get(key)
    if h is None:
        h = ray.get_actor(key)
        _HANDLES[key] = h
    return h


def route_links(
    batch: pa.Table, *, actor_ns: str, nshards: int, seen_refs: dict | None = None, defer: bool = False
):
    """Task-pool form of RouteLinks (see class docstring above).
    With defer=True returns (table, refs) and the caller owns the
    delivery barrier — lets the parquet write overlap the actor sends."""
    return RouteLinks(actor_ns, nshards, seen_refs)(batch, defer=defer)


class RouteLinks:
    def __init__(self, actor_ns: str, nshards: int, seen_refs: dict | None = None):
        self.ns = actor_ns
        self.nshards = nshards
        # shard -> ObjectRef of that shard's sorted seen url_hash array as
        # of the END OF THE PREVIOUS ROUND (broadcast prefilter). Stale-
        # but-monotone: anything in the snapshot is definitely seen now,
        # so dropping it early is exactly what the owner actor would do at
        # finalize — it only shrinks actor inflow (~10x in steady state),
        # it cannot change the outcome.
        self.seen_refs = seen_refs or {}

    def _actor(self, shard: int):
        return _shard_actor(self.ns, shard)

    def __call__(self, batch: pa.Table, defer: bool = False):
        import pyarrow.compute as pc

        links_col = batch.column("links").combine_chunks()
        prios = batch.column("priority").to_numpy(zero_copy_only=False)
        refs = []
        link_subs: dict[int, pa.Table] = {}
        window_subs: dict[int, pa.Table] = {}

        # 1. explode links (one vectorized flatten, no per-row as_py)
        counts = pc.list_value_length(links_col).to_numpy(zero_copy_only=False)
        flat = links_col.flatten()
        flat_prio = np.repeat(prios + 1, counts)
        if len(flat):
            # host extraction must equal the url_host kernel exactly (the
            # seed path and shard keying use it) — vectorized RE2 over the
            # Arrow array (canonical URLs: host runs to the first ':' '/'
            # or '['), falling back to url_host for the rows the pattern
            # rejects (IPv6 literals). ~6x the python netloc-split path
            # (equivalence pinned by test_kernels.TestRouteHostFastPath).
            ex = pc.extract_regex(flat, pattern=r"^[^:]+://(?P<host>[^/:\[]+)")
            hosts = pc.struct_field(ex, "host").to_numpy(zero_copy_only=False)
            flat_np = flat.to_numpy(zero_copy_only=False)
            miss = pc.is_null(ex).to_numpy(zero_copy_only=False)
            if miss.any():
                for i in np.flatnonzero(miss):
                    hosts[i] = url_host(flat_np[i])
            hh = hash64(hosts)
            uh = hash64(flat_np)
            shard = (hh % np.uint64(self.nshards)).astype(np.int64)
            ltab = pa.table(
                {
                    "url": flat,
                    "host": pa.array(hosts, pa.string()),
                    "url_hash": pa.array(uh, pa.uint64()),
                    "priority": pa.array(flat_prio, pa.int64()),
                    "shard": pa.array(shard, pa.int64()),
                }
            )
            # in-batch combiner: min priority per url_hash (the same rule
            # the owner actor applies at finalize, so this only dedups)
            ltab = ltab.group_by(["shard", "url_hash"]).aggregate(
                [("priority", "min"), ("url", "min"), ("host", "min")]
            )
            ltab = ltab.rename_columns(
                [{"priority_min": "priority", "url_min": "url", "host_min": "host"}.get(c, c) for c in ltab.column_names]
            )
            shard = ltab.column("shard").to_numpy(zero_copy_only=False)
            for s in np.unique(shard):
                sub = ltab.filter(pa.array(shard == s)).drop_columns(["shard"])
                ref = self.seen_refs.get(int(s))
                if ref is not None:
                    seen_arr = _seen_array(int(s), ref)  # worker-cached
                    k = sub.column("url_hash").to_numpy(zero_copy_only=False)
                    if len(seen_arr):
                        idx = np.searchsorted(seen_arr, k)
                        idx = np.minimum(idx, len(seen_arr) - 1)
                        unseen = seen_arr[idx] != k
                        if not unseen.all():
                            sub = sub.filter(pa.array(unseen))
                if sub.num_rows:
                    link_subs[int(s)] = sub

        # 2. window candidates for ACCEPTED rows, to the row's own shard
        acc_mask = pa.compute.equal(batch.column("status"), "ACCEPTED")
        acc = batch.filter(acc_mask)
        if acc.num_rows:
            wtab = acc.select(["round", "seq", "url", "host", "url_hash", "priority", "digest", "n_links"])
            shards = acc.column("shard").to_numpy(zero_copy_only=False)
            for s in np.unique(shards):
                window_subs[int(s)] = wtab.filter(pa.array(shards == s))

        # 3. one fused deliver RPC per target shard (links + window
        # candidates together): halves the per-batch actor-RPC count
        for s in sorted(set(link_subs) | set(window_subs)):
            refs.append(
                self._actor(s).deliver.remote(link_subs.get(s), window_subs.get(s))
            )

        out = batch.drop_columns(["links", "digest"])
        if defer:
            return out, refs
        if refs:
            ray.get(refs)
        return out
