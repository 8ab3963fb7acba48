"""The distributed Ray crawl engine.

Round-based driver loop (the ticker-loop analog,
/root/reference/crawler/crawler.go:34-51 + crawler/blocks.go:25-101)
over:

  * ``ShardActor`` — one raw Ray actor per host-hash shard, the single
    owner of that shard's frontier heap, seen-set, politeness budget and
    rollback window. Raw actors (not a map_batches pool) are justified
    here and only here: this is a shared mutable index that must persist
    across rounds (Dataset executions) — SURVEY.md §7.3.
  * Ray Data stages for everything wide: fetch-sim (actor pool over
    zero-copy Arrow batches), extraction (stateless vectorized kernel),
    link routing (actor pool shipping Arrow sub-tables straight to the
    owner shard actors — the frontier-merge shuffle, keyed by
    hash64(host) %% shards, never touching the driver).

Determinism: the global order of a round is fixed BEFORE any parallel
work — DROPPED retractions (by original (round, seq)) then scheduled
URLs (by (priority, host, url)) get dense ``seq`` values; every
downstream stage carries (round, seq) as data. Output equality with the
sequential oracle at any parallelism follows (SURVEY.md §7.4.1).

Scale notes (10^10-URL frontier):
  * Only the scheduled-URL *metadata* of one round (url/host/priority
    strings, politeness-bounded) passes through the driver for global
    ordering; page payloads never do. For rounds too large even for
    that, ``cfg.driver_order_threshold`` switches (sticky) to per-shard
    quotas of ``max_urls_per_round // shards`` with shard-LOCAL
    ordering, bounding driver traffic to the cap itself.
  * Link exchange and window candidates flow actor-to-actor as Arrow
    tables; the seen-filter runs sharded (no global shuffle).
  * Outputs and checkpoints are round-keyed and idempotent: a re-run of
    an uncommitted round overwrites its files (at-least-once with
    idempotent sinks, SURVEY.md §2.7).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from . import gen, schemas
from .config import CrawlConfig
from .functions.robots import is_allowed, parse_robots
from .functions.urls import canonicalize_url, hash64, url_host, url_path
from .sources.pages import PageStore, SharedPages
from .stages.extractors import extract_batch
from .stages.fetch import FetchSim, fetch_batch, fetch_batch_rpc  # noqa: F401 (FetchSim kept for API)
from .stages.links import RouteLinks, route_links  # noqa: F401


def fetch_extract(batch: pa.Table, *, pages_refs: dict, n_pshards: int) -> pa.Table:
    """Fused fetch-sim + extraction stage (one task dispatch per batch)."""
    return extract_batch(fetch_batch(batch, pages_refs=pages_refs, n_pshards=n_pshards))


def process_and_sink(
    batch: pa.Table,
    *,
    pages_refs: dict,
    n_pshards: int,
    actor_ns: str,
    nshards: int,
    round_dir: str,
    seen_refs: dict | None = None,
    rpc_url: str | None = None,
) -> pa.Table:
    """The whole per-batch crawl step as ONE Ray Data operator:
    fetch-sim -> extract -> route links/window to shard actors -> write
    this batch's crawl-log rows as its own part file in the round dir
    (custom sink inside the stage: removes two operator barriers and the
    write operator's per-round fixed overhead, which dominates small
    rounds; at large rounds the same fusion just removes two object-store
    round-trips per batch). Returns a one-row summary per batch with
    per-stage wall times (aggregated into engine metrics — the stats()
    hook for the fused operator)."""
    import time as _time

    t0 = _time.time()
    if rpc_url is not None:
        # fetch THROUGH the JSON-RPC façade (reference network path:
        # the crawler pulls blocks over RPC, common/rpc.go:69-93);
        # byte-identical to the zero-copy path — see fetch_batch_rpc
        f = fetch_batch_rpc(batch, rpc_url=rpc_url)
    else:
        f = fetch_batch(batch, pages_refs=pages_refs, n_pshards=n_pshards)
    t1 = _time.time()
    out = extract_batch(f)
    t2 = _time.time()
    out, send_refs = route_links(out, actor_ns=actor_ns, nshards=nshards, seen_refs=seen_refs, defer=True)
    t3 = _time.time()
    rows = out.select([f2.name for f2 in schemas.CRAWL_LOG]).cast(schemas.CRAWL_LOG)
    # deterministic per-chunk file name + atomic rename: a Ray task RETRY
    # overwrites its own file instead of appending a duplicate (the chunk's
    # first seq is unique and stable within the round); actor sends are
    # idempotent (seen-filter / keyed window), so retries are safe end to end
    seq0 = rows.column("seq")[0].as_py() if rows.num_rows else 0
    path = os.path.join(round_dir, f"part-{seq0:09d}.parquet")
    tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
    pq.write_table(rows, tmp, compression="zstd", compression_level=1)
    os.replace(tmp, path)
    t4 = _time.time()
    if send_refs:
        ray.get(send_refs)  # delivery barrier AFTER the write overlapped it
    t5 = _time.time()
    return pa.table(
        {
            "n": pa.array([rows.num_rows], pa.int64()),
            "t_fetch": pa.array([t1 - t0], pa.float64()),
            "t_extract": pa.array([t2 - t1], pa.float64()),
            "t_route": pa.array([t3 - t2], pa.float64()),
            "t_write": pa.array([t4 - t3], pa.float64()),
            "t_wait": pa.array([t5 - t4], pa.float64()),
        }
    )


# plain-task form of the fused stage, for tail/drain rounds (see run_round)
_process_task = ray.remote(num_cpus=1)(process_and_sink)
from .stages.sinks import write_sinks
from .state import checkpoint as ckpt
from .state.cuckoo import SeenSet
from .state.frontier import HostFrontier
from .state.window import RollbackWindow, WindowEntry

_EMPTY_WINDOW = pa.table({f.name: pa.array([], f.type) for f in schemas.CHECKPOINT_WINDOW})


def read_crawl_log(out_dir: str) -> pa.Table:
    """Read the ordered crawl log back from its round-keyed layout.

    Files are listed explicitly (no hive-partition inference — ``round``
    is a real column in every file, the partition dirs are only the
    idempotent-overwrite unit)."""
    root = os.path.join(out_dir, "crawl_log")
    if not os.path.isdir(root):
        return pa.table({f.name: pa.array([], f.type) for f in schemas.CRAWL_LOG})
    files = []
    for rd_name in sorted(os.listdir(root)):
        d = os.path.join(root, rd_name)
        if os.path.isdir(d):
            files.extend(os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet"))
    tables = [pq.read_table(f).select([f2.name for f2 in schemas.CRAWL_LOG]) for f in files]
    t = pa.concat_tables([t.cast(schemas.CRAWL_LOG) for t in tables]) if tables else pa.table(
        {f.name: pa.array([], f.type) for f in schemas.CRAWL_LOG}
    )
    return t.sort_by([("round", "ascending"), ("seq", "ascending")])


@ray.remote(num_cpus=0, max_restarts=0)
class ShardActor:
    """Owner of one host-hash shard's crawl state (SURVEY.md §2.4 T1-T6
    analogs fused into the one stateful stage the north_rule mandates)."""

    def __init__(
        self,
        shard: int,
        nshards: int,
        pages_dir: str,
        robots_prefixes: dict[str, list[str]],
        *,
        tokens_per_host: int,
        rollback_window: int,
        cuckoo_capacity: int,
        exact_seen: bool,
    ):
        self.shard = shard
        self.nshards = nshards
        self.tokens_per_host = tokens_per_host
        self.exact_seen = exact_seen
        self.cuckoo_capacity = cuckoo_capacity
        self.robots = robots_prefixes
        self.frontier = HostFrontier()
        self.window = RollbackWindow(rollback_window)
        self.seen = SeenSet(cuckoo_capacity, exact=exact_seen)
        self.seen_urls: dict[int, str] = {}  # url_hash -> url (exact mode)
        self.lineage = "0" * 32
        self._pending_links: list[pa.Table] = []
        self._pending_window: list[pa.Table] = []
        self._pending_window_rows = 0
        # seen-set additions since the last checkpoint (delta persistence)
        self._seen_delta: list[np.ndarray] = []
        self._seen_delta_urls: list[list[str]] = []

    def set_robots(self, robots_prefixes: dict[str, list]) -> None:
        """Deliver this shard's parsed robots rules after construction —
        lets actor spawn overlap the robots scan (robots are only read
        at finalize, and the engine seeds only after this lands)."""
        self.robots = robots_prefixes

    # --- ingestion (called from RouteLinks tasks; order-independent) ----
    def ingest(self, table: pa.Table) -> None:
        self._pending_links.append(table)

    def deliver(self, links: pa.Table | None, window: pa.Table | None) -> None:
        """Fused per-batch delivery: one RPC per (batch, shard) instead
        of separate ingest + window_candidates calls — at 32 shards x
        ~500 batches per 1M-url round that halves the actor-RPC volume
        through the (single, on one node) raylet. Order-independent like
        its parts."""
        if links is not None:
            self.ingest(links)
        if window is not None:
            self.window_candidates(window)

    def window_candidates(self, table: pa.Table) -> None:
        self._pending_window.append(table)
        self._pending_window_rows += table.num_rows
        # only the last <=W rows by seq can survive into the window: keep
        # the buffer bounded instead of accumulating a whole round
        if self._pending_window_rows > 8 * self.window.limit:
            w = pa.concat_tables(self._pending_window)
            order = pc.sort_indices(w, sort_keys=[("seq", "descending")])
            w = w.take(order.slice(0, self.window.limit))
            self._pending_window = [w]
            self._pending_window_rows = w.num_rows

    # --- round protocol -------------------------------------------------
    def begin_round(self, rnd: int, pages_refs: dict, n_pshards: int) -> pa.Table:
        """Retraction scan (reorg-detection analog,
        /root/reference/crawler/blocks.go:105-129): probe the rollback
        window's digests against the current page store; mismatches are
        removed from the window, re-enqueued at original priority, and
        returned for the driver to emit as DROPPED.

        The digest probe reads the object-store-shared pages zero-copy;
        after a mutation the driver re-puts the affected shard tables, so
        the refs passed in this round already see the new content."""
        ents = self.window.entries()
        if not ents:
            return _EMPTY_WINDOW
        shared = SharedPages(pages_refs, n_pshards)
        cur = shared.lookup_digests([e.url for e in ents], [e.host for e in ents])
        dropped = [e for e, d in zip(ents, cur) if int(d) != e.digest]
        for e in dropped:
            self.window.remove(e.url)
            self.frontier.push(e.host, e.url, e.priority, e.url_hash)
        return pa.table(
            {
                "round": pa.array([e.round for e in dropped], pa.int64()),
                "seq": pa.array([e.seq for e in dropped], pa.int64()),
                "url": pa.array([e.url for e in dropped], pa.string()),
                "host": pa.array([e.host for e in dropped], pa.string()),
                "url_hash": pa.array([e.url_hash for e in dropped], pa.uint64()),
                "priority": pa.array([e.priority for e in dropped], pa.int64()),
                "digest": pa.array([e.digest for e in dropped], pa.uint64()),
                "n_links": pa.array([e.n_links for e in dropped], pa.int64()),
            },
            schema=schemas.CHECKPOINT_WINDOW,
        )

    def schedule(self, quota: int | None = None) -> pa.Table:
        """Politeness-bounded per-host pops, (priority, url) order within
        host — this shard's round candidates (url_hash rides along so the
        driver never re-hashes urls).

        ``quota`` (giant-round degradation, cfg.driver_order_threshold):
        THIS shard's globally-first ``quota`` candidates by (priority,
        host, url) — the driver then handles at most shards x quota rows
        instead of the full politeness pop. Selected via the frontier's
        lazy k-way merge (pop_round_quota): only ``quota + n_hosts``
        entries are popped per round, not the whole politeness pop, and
        nothing is bulk re-pushed — exactly the giant-round regime this
        degradation exists for."""
        if quota is not None:
            cand = self.frontier.pop_round_quota(self.tokens_per_host, quota)
        else:
            cand = self.frontier.pop_round_hashed(self.tokens_per_host)
        return pa.table(
            {
                "priority": pa.array([p for p, _, _, _ in cand], pa.int64()),
                "host": pa.array([h for _, h, _, _ in cand], pa.string()),
                "url": pa.array([u for _, _, u, _ in cand], pa.string()),
                "url_hash": pa.array(
                    np.fromiter((x for _, _, _, x in cand), dtype=np.uint64, count=len(cand)), pa.uint64()
                ),
                "shard": pa.array(np.full(len(cand), self.shard, dtype=np.int64), pa.int64()),
            }
        )

    def open_round(
        self, rnd: int, pages_refs: dict, n_pshards: int, check_window: bool = True, quota: int | None = None
    ) -> dict:
        """begin_round + schedule in one RPC (halves the per-round
        barrier count — rounds are latency-bound at small sizes).

        ``check_window=False`` skips the digest probe: the driver passes
        it when the page store provably did not change since the last
        probe (no mutation applied, no shard re-put), in which case no
        digest can differ — content change is the ONLY retraction
        trigger."""
        dropped = self.begin_round(rnd, pages_refs, n_pshards) if check_window else _EMPTY_WINDOW
        return {"dropped": dropped, "candidates": self.schedule(quota)}

    def close_round(self, rnd: int, scheduled_hashes, ckpt_dir: str | None) -> dict:
        """finalize_round + optional checkpoint in one RPC. Returns
        phase timings plus an object-store ref of this shard's sorted
        seen array — next round's route tasks use it as a broadcast
        prefilter (monotone, so filtering on a one-round-stale snapshot
        is always sound)."""
        import time as _time

        t0 = _time.time()
        detail = self.finalize_round(rnd, scheduled_hashes)
        t1 = _time.time()
        if ckpt_dir is not None:
            self.checkpoint(ckpt_dir, rnd)
        else:
            # no persistence: don't let delta buffers grow unboundedly
            self._seen_delta = []
            self._seen_delta_urls = []
        t2 = _time.time()
        seen_ref = None
        if self.exact_seen:
            _, arr = self.seen.snapshot()
            seen_ref = ray.put(arr)
        detail["snap"] = round(_time.time() - t2, 3)
        return {
            "finalize": round(t1 - t0, 3),
            "ckpt": round(t2 - t1, 3),
            "seen_ref": seen_ref,
            "detail": detail,
        }

    def pushback(self, table: pa.Table) -> None:
        """Return candidates truncated by the global round cap."""
        for prio, host, url, uh in zip(
            table.column("priority").to_pylist(),
            table.column("host").to_pylist(),
            table.column("url").to_pylist(),
            table.column("url_hash").to_pylist(),
        ):
            self.frontier.push(host, url, prio, uh)

    def _allowed(self, url: str, host: str) -> bool:
        rules = self.robots.get(host)
        if not rules:
            return True
        return is_allowed(url_path(url), rules)

    def seed(self, table: pa.Table) -> None:
        """Cold-start seeding (cmd/blockspiderd/main.go:100-123 analog):
        canonical seed urls of this shard -> seen + frontier."""
        self.ingest(table)
        self._finalize_discoveries()

    def finalize_round(self, rnd: int, scheduled_hashes) -> dict:
        """Round barrier work: commit window candidates in seq order,
        finalize discoveries (min-priority, robots, seen-filter, enqueue),
        advance the lineage digest chain (over this shard's scheduled
        url-hash sequence, in global seq order). Returns a per-step
        timing/count breakdown (engine metrics surface the cross-shard
        max — the barrier is bounded by the slowest shard)."""
        import time as _time

        t0 = _time.time()
        if self._pending_window:
            w = pa.concat_tables(self._pending_window)
            self._pending_window = []
            self._pending_window_rows = 0
            order = np.argsort(w.column("seq").to_numpy(zero_copy_only=False), kind="stable")
            keep = order[-self.window.limit :] if len(order) > self.window.limit else order
            rows = w.take(pa.array(keep)).to_pylist()
            for r in rows:
                self.window.push(WindowEntry(**r))
        t1 = _time.time()
        detail = self._finalize_discoveries()
        detail["window"] = round(t1 - t0, 3)
        h = hashlib.blake2b(self.lineage.encode(), digest_size=16)
        h.update(np.asarray(scheduled_hashes, dtype=np.uint64).tobytes())
        self.lineage = h.hexdigest()
        return detail

    def _finalize_discoveries(self) -> dict:
        import time as _time

        detail = {"rows_in": 0, "unseen": 0, "concat": 0.0, "seenf": 0.0, "enqueue": 0.0}
        if not self._pending_links:
            return detail
        t0 = _time.time()
        t = pa.concat_tables(self._pending_links)
        self._pending_links = []
        if t.num_rows == 0:
            return detail
        detail["rows_in"] = t.num_rows
        # min priority per url_hash (round-batched enqueue =>
        # order-independent). numpy lexsort + first-per-hash instead of
        # an Arrow group_by with string mins: equal url_hash implies
        # equal url/host (modulo 2^-64 collisions, which the seen-set is
        # keyed by anyway), so no string aggregation is needed — just
        # one gather of the selected rows. ~10x the group_by path on
        # the 10^6-row inflow a 1M-url round feeds the hottest shard.
        uh_all = t.column("url_hash").to_numpy(zero_copy_only=False)
        prio_all = t.column("priority").to_numpy(zero_copy_only=False)
        order = np.lexsort((prio_all, uh_all))
        uh_sorted = uh_all[order]
        first = np.ones(len(uh_sorted), dtype=bool)
        first[1:] = uh_sorted[1:] != uh_sorted[:-1]
        sel = order[first]
        t1 = _time.time()
        # seen-filter (sharded anti-join — the core frontier op, J4 analog)
        unseen = ~self.seen.contains_many(uh_all[sel])
        g = t.take(pa.array(sel[unseen]))
        t2 = _time.time()
        urls = g.column("url").to_pylist()
        hosts = g.column("host").to_pylist()
        prios = g.column("priority").to_numpy(zero_copy_only=False)
        uh = g.column("url_hash").to_numpy(zero_copy_only=False)
        allowed = np.fromiter(
            (self._allowed(u, h) for u, h in zip(urls, hosts)), dtype=bool, count=len(urls)
        )
        self.seen.add_many(uh[allowed])
        self._seen_delta.append(uh[allowed].copy())
        self._seen_delta_urls.append([u for ok, u in zip(allowed, urls) if ok])
        if self.exact_seen:
            self.seen_urls.update(
                (int(k), u) for ok, k, u in zip(allowed, uh, urls) if ok
            )
        # bulk per-host enqueue: group rows by host (stable argsort over
        # factorized codes -> contiguous runs), then one C-level
        # extend+heapify per host instead of a python heappush per url
        # (sound: enqueue marks seen, so unseen => not queued)
        if allowed.any():
            aidx = np.flatnonzero(allowed)
            codes, uniques = pd.factorize(np.asarray(hosts, dtype=object)[aidx])
            horder = np.argsort(codes, kind="stable")
            bounds = np.searchsorted(codes[horder], np.arange(len(uniques) + 1))
            prios_l = prios.tolist()
            uh_l = uh.tolist()
            for hi, host in enumerate(uniques):
                rows = aidx[horder[bounds[hi] : bounds[hi + 1]]]
                self.frontier.extend_host_unqueued(
                    host, [(prios_l[i], urls[i], uh_l[i]) for i in rows]
                )
        detail["unseen"] = len(urls)
        detail["concat"] = round(t1 - t0, 3)
        detail["seenf"] = round(t2 - t1, 3)
        detail["enqueue"] = round(_time.time() - t2, 3)
        return detail

    # --- introspection / persistence -----------------------------------
    def seen_table(self) -> pa.Table:
        hashes = np.fromiter(self.seen_urls.keys(), dtype=np.uint64, count=len(self.seen_urls))
        order = np.argsort(hashes, kind="stable")
        urls = list(self.seen_urls.values())
        return pa.table(
            {
                "url_hash": pa.array(hashes[order], pa.uint64()),
                "url": pa.array([urls[i] for i in order], pa.string()),
            },
            schema=schemas.SEEN,
        )

    def stats(self) -> dict:
        return {
            "shard": self.shard,
            "frontier": len(self.frontier),
            "seen": len(self.seen),
            "window": len(self.window),
            "lineage": self.lineage,
        }

    def checkpoint(self, ckpt_dir: str, rnd: int) -> None:
        delta_h = (
            np.concatenate(self._seen_delta) if self._seen_delta else np.array([], dtype=np.uint64)
        )
        delta_u = [u for part in self._seen_delta_urls for u in part]
        self._seen_delta = []
        self._seen_delta_urls = []
        ckpt.save_shard(
            ckpt_dir,
            rnd,
            self.shard,
            frontier=self.frontier,
            window=self.window,
            lineage=self.lineage,
            seen_delta_hashes=delta_h,
            seen_delta_urls=delta_u if self.exact_seen else None,
            seen_size=len(self.seen),
            cuckoo_bytes=None if self.exact_seen else self.seen.filter.to_bytes(),
        )

    def load_checkpoint(self, ckpt_dir: str, rnd: int) -> None:
        frontier, window, lineage, _ = ckpt.load_shard(ckpt_dir, rnd, self.shard)
        window.limit = self.window.limit
        self.frontier, self.lineage = frontier, lineage
        self.window = window
        hashes, urls, cuckoo_bytes = ckpt.load_seen(ckpt_dir, rnd, self.shard, exact=self.exact_seen)
        if self.exact_seen:
            self.seen = SeenSet.restore(b"", hashes, self.cuckoo_capacity, exact=True)
            self.seen_urls = dict(zip((int(x) for x in hashes), urls))
        else:
            self.seen = SeenSet.restore(cuckoo_bytes, hashes, self.cuckoo_capacity, exact=False)
        self._seen_delta = []
        self._seen_delta_urls = []


class CrawlEngine:
    """Driver for the round-based distributed crawl."""

    def __init__(
        self,
        pages_dir: str,
        seeds: list[str],
        cfg: CrawlConfig,
        out_dir: str,
        *,
        ckpt_dir: str | None = None,
        resume: bool = False,
        mutations: dict[int, list[str]] | None = None,
        fetch_concurrency: int = 8,
        route_concurrency: int = 4,
        batch_size: int = 1024,
        direct_task_threshold: int = 1_000_000,
        name: str | None = None,
        sink_transport=None,
        rpc_url: str | None = None,
    ):
        self.cfg = cfg
        self.pages_dir = pages_dir
        self.out_dir = out_dir
        self.ckpt_dir = ckpt_dir
        self.mutations = mutations or {}
        self.fetch_concurrency = fetch_concurrency
        self.route_concurrency = route_concurrency
        self.batch_size = batch_size
        self.direct_task_threshold = direct_task_threshold
        self.sink_transport = sink_transport  # None = ParquetDirSink
        # optional load-bearing RPC fetch: scheduled URLs resolve via
        # sim_getPage against a served SimulatorHTTPD instead of the
        # object-store pages (the reference's crawler-pulls-over-RPC
        # path, common/rpc.go:69-93 / crawler/blocks.go:66). Everything
        # else (robots scan, window digest probes, retraction text
        # recovery) still reads the shared store — the façade carries
        # the page payloads, exactly what the reference's RPC carries.
        self.rpc_url = rpc_url
        self.ns = name or f"bsr-{uuid.uuid4().hex[:8]}"
        self.metrics: list[dict] = []
        self._seen_refs: dict[int, object] = {}  # shard -> seen-snapshot ref
        # giant-round degradation (cfg.driver_order_threshold): sticky
        # per-shard-quota scheduling once any round's candidate metadata
        # exceeded the threshold; 0 = quota mode from round 0
        self._quota_mode = cfg.driver_order_threshold == 0

        # the simulated web, shared once via the object store (zero-copy
        # for every fetch task and shard actor on the node)
        self.shared = SharedPages.put_store(pages_dir)
        # store-dirty flag: True whenever page content may have changed
        # since the last retraction scan (engine start/resume, mutation
        # hook, or follow-mode refresh) — rounds with a clean store skip
        # the window digest probe entirely
        self._store_dirty = True

        # startup overlap: the robots scan tasks, the page-shard load
        # tasks (put_store above) and the 32 actor PROCESS SPAWNS all run
        # concurrently — actors start with empty robots and receive their
        # shard's rules in one tiny RPC once the scan lands (robots are
        # only consulted at finalize, and the first finalize is the seed
        # barrier below, after set_robots). Serializing these three was
        # most of engine-construction wall (startup_sec in bench.py).
        from .sources.pages import read_robots_async

        robots_refs = read_robots_async(pages_dir)

        self.actors = []
        for s in range(cfg.shards):
            self.actors.append(
                ShardActor.options(name=f"{self.ns}-shard-{s}").remote(
                    s,
                    cfg.shards,
                    pages_dir,
                    {},
                    tokens_per_host=cfg.tokens_per_host_per_round,
                    rollback_window=cfg.rollback_window,
                    cuckoo_capacity=cfg.cuckoo_capacity_per_shard,
                    exact_seen=cfg.exact_seen,
                )
            )

        robots_all: dict[str, list] = {}
        for part in ray.get(robots_refs):
            for h, t in part.items():
                robots_all[h] = parse_robots(t)
        host_shard = {
            h: int(s) for h, s in zip(robots_all, hash64(list(robots_all)) % np.uint64(cfg.shards))
        } if robots_all else {}
        ray.get(
            [
                a.set_robots.remote(
                    {h: r for h, r in robots_all.items() if host_shard.get(h) == s and r}
                )
                for s, a in enumerate(self.actors)
            ]
        )

        self.start_round = 0
        self._next_round = 0
        resumed = False
        if resume and ckpt_dir is not None:
            last = ckpt.latest_committed_round(ckpt_dir)
            if last is not None:
                ray.get([a.load_checkpoint.remote(ckpt_dir, last) for a in self.actors])
                self.start_round = last + 1
                self._next_round = last + 1
                self._clean_rounds_after(last)
                resumed = True
        if not resumed:
            self._seed(seeds)

    def _seed(self, seeds: list[str]) -> None:
        canon = [canonicalize_url(s) for s in seeds]
        canon = [c for c in canon if c is not None]
        if not canon:
            return
        hosts = [url_host(c) for c in canon]
        uh = hash64(canon)
        shard = (hash64(hosts) % np.uint64(self.cfg.shards)).astype(np.int64)
        t = pa.table(
            {
                "url": pa.array(canon, pa.string()),
                "host": pa.array(hosts, pa.string()),
                "url_hash": pa.array(uh, pa.uint64()),
                "priority": pa.array(np.zeros(len(canon), dtype=np.int64), pa.int64()),
            }
        )
        refs = []
        for s in np.unique(shard):
            refs.append(self.actors[int(s)].seed.remote(t.filter(pa.array(shard == s))))
        ray.get(refs)

    def append_seeds(self, seeds: list[str]) -> None:
        """Out-of-band seed ingestion between rounds — the push-ingest
        analog (webhook bridge, /root/reference/cmd/transmuted/main.go:141-174):
        appended urls are canonicalized, seen-filtered and queued so the
        NEXT round's scheduler can pick them up. Call between rounds
        (the engine driver is single-threaded, like the reference's
        no-overlap Syncing flag, crawler/blocks.go:26-32)."""
        self._seed(seeds)

    def _clean_rounds_after(self, last_committed: int) -> None:
        log_root = os.path.join(self.out_dir, "crawl_log")
        if not os.path.isdir(log_root):
            return
        for nm in os.listdir(log_root):
            if nm.startswith("round=") and int(nm.split("=")[1]) > last_committed:
                shutil.rmtree(os.path.join(log_root, nm))

    # --- one crawl round ------------------------------------------------
    def run_round(self, rnd: int) -> bool:
        import time as _time

        _t = {}
        _t0 = _time.time()
        cfg = self.cfg
        if rnd in self.mutations:
            # test hook: the simulator rewrites pages mid-crawl (reorg analog)
            mutated = self.mutations[rnd]
            gen.apply_mutations(self.pages_dir, mutated)
            self.shared.refresh_changed(self.pages_dir)
            self._store_dirty = True  # unconditionally: we just mutated

        # 1+2. one barrier: retraction scan + politeness-bounded candidates
        # (per-shard quotas once a round ever exceeded driver_order_threshold)
        quota = max(1, cfg.max_urls_per_round // cfg.shards) if self._quota_mode else None
        opened = ray.get(
            [
                a.open_round.remote(rnd, self.shared.refs, self.shared.n_shards, self._store_dirty, quota)
                for a in self.actors
            ]
        )
        self._store_dirty = False
        dropped_parts = [o["dropped"] for o in opened if o["dropped"].num_rows]
        dropped = (
            pa.concat_tables(dropped_parts).sort_by([("round", "ascending"), ("seq", "ascending")])
            if dropped_parts
            else None
        )
        ndrop = dropped.num_rows if dropped is not None else 0

        _t["open"] = _time.time() - _t0
        _t0 = _time.time()
        sched_parts = [o["candidates"] for o in opened]
        sched = pa.concat_tables([t for t in sched_parts if t.num_rows]) if any(
            t.num_rows for t in sched_parts
        ) else None
        if sched is None and ndrop == 0:
            return False
        take = None
        if sched is not None:
            if not self._quota_mode and sched.num_rows > cfg.driver_order_threshold:
                # this round still pays the full driver sort; every later
                # round schedules under per-shard quotas (sticky)
                self._quota_mode = True
            sched = sched.sort_by([("priority", "ascending"), ("host", "ascending"), ("url", "ascending")])
            take = sched.slice(0, cfg.max_urls_per_round)
            rest = sched.slice(cfg.max_urls_per_round)
            if rest.num_rows:
                rs = rest.column("shard").to_numpy(zero_copy_only=False)
                ray.get(
                    [
                        self.actors[int(s)].pushback.remote(rest.filter(pa.array(rs == s)))
                        for s in np.unique(rs)
                    ]
                )

        round_dir = os.path.join(self.out_dir, "crawl_log", f"round={rnd}")
        if os.path.isdir(round_dir):
            shutil.rmtree(round_dir)
        os.makedirs(round_dir, exist_ok=True)

        # 3. DROPPED retraction rows come first in the round's sequence.
        # The retracted row's previously-emitted text is recovered from the
        # round-keyed crawl log (the window carries only metadata+digest —
        # texts are not duplicated into actor state or checkpoints).
        if ndrop:
            old_texts = self._old_texts(dropped)
            dt = pa.table(
                {
                    "round": pa.array(np.full(ndrop, rnd, dtype=np.int64), pa.int64()),
                    "seq": pa.array(np.arange(ndrop, dtype=np.int64), pa.int64()),
                    "host": dropped.column("host"),
                    "url": dropped.column("url"),
                    "status": pa.array(["DROPPED"] * ndrop, pa.string()),
                    "n_links": dropped.column("n_links"),
                    "text": pa.array(old_texts, pa.string()),
                    "version": pa.array(np.full(ndrop, 1, dtype=np.int32), pa.int32()),
                },
                schema=schemas.CRAWL_LOG,
            )
            pq.write_table(dt, os.path.join(round_dir, "part-dropped.parquet"), compression="zstd", compression_level=1)

        _t["order"] = _time.time() - _t0
        _t0 = _time.time()
        # 4. fetch -> extract -> route, streaming over Arrow batches
        n_take = take.num_rows if take is not None else 0
        if n_take:
            sched_t = pa.table(
                {
                    "round": pa.array(np.full(n_take, rnd, dtype=np.int64), pa.int64()),
                    "seq": pa.array(np.arange(ndrop, ndrop + n_take, dtype=np.int64), pa.int64()),
                    "url": take.column("url"),
                    "host": take.column("host"),
                    "url_hash": take.column("url_hash"),
                    "priority": take.column("priority"),
                    "shard": take.column("shard"),
                },
                schema=schemas.SCHEDULED,
            )
            # group blocks by physical page shard so each fetch batch is
            # partition-local; hash only the UNIQUE hosts (a round has
            # thousands of hosts but up to 10^5+ urls)
            host_codes, host_uniques = pd.factorize(take.column("host").to_pandas())
            upshard = (hash64(list(host_uniques)) % np.uint64(self.shared.n_shards)).astype(np.int64)
            pshard = upshard[host_codes]
            blocks = [sched_t.filter(pa.array(pshard == s)) for s in np.unique(pshard)]
            # batch size targets ~3 tasks per CPU per round so small rounds
            # still fan out (Ray Data coalesces blocks up to batch_size into
            # one task — a fixed batch_size serializes a small round onto
            # one worker)
            # floor of 256: below that, per-task dispatch + the per-batch
            # shard-actor RPC barrier cost more than the rows' compute
            ncpu = int(ray.cluster_resources().get("CPU", 8))
            bs = max(256, min(self.batch_size, -(-n_take // (ncpu * 4))))
            fn_kwargs = {
                "pages_refs": self.shared.refs,
                "n_pshards": self.shared.n_shards,
                "actor_ns": self.ns,
                "nshards": cfg.shards,
                "round_dir": round_dir,
                "seen_refs": self._seen_refs,
                "rpc_url": self.rpc_url,
            }
            # pre-split blocks to <= bs rows: Ray Data parallelism is
            # per-BLOCK (batch_size slices batches inside one task, it does
            # not split a big block across tasks) — without this a
            # mega-host round (one pshard -> one block) runs single-threaded
            chunks = [b.slice(off, bs) for b in blocks for off in range(0, b.num_rows, bs)]
            if n_take <= self.direct_task_threshold:
                # small-to-medium rounds: the Dataset executor's fixed
                # planning cost (~1s per round) is a material tax — at a
                # 1M-URL round it measured 20-25% of the 32-cpu pipeline
                # wall (back-to-back A/B on the 4M-page fixture: 35.3s vs
                # 46-49s pipeline, identical output) — so submit the same
                # fused stage as plain tasks over the pre-built chunks.
                # Rounds past the threshold (the 10^10-scale steady
                # state, >=10^7 URLs, where 1s amortizes to <1% and the
                # chunk count would make an unpaced driver-side task
                # storm) take the Dataset path below with its streaming
                # backpressure.
                summaries = [r for r in ray.get([_process_task.remote(c, **fn_kwargs) for c in chunks])]
                n_written = sum(r["n"][0].as_py() for r in summaries)
                stage_sec = {
                    k: round(sum(r[k][0].as_py() for r in summaries), 3)
                    for k in ("t_fetch", "t_extract", "t_route", "t_write", "t_wait")
                }
            else:
                # a single task-pool operator (fetch+extract+route+sink
                # fused; worker-process-global caches give per-process
                # state amortization without actor-pool startup per round)
                ds = rd.from_arrow(chunks)
                ds = ds.map_batches(
                    process_and_sink,
                    fn_kwargs=fn_kwargs,
                    batch_format="pyarrow",
                    batch_size=bs,
                    num_cpus=1,
                )
                rows_sum = ds.take_all()
                n_written = sum(r["n"] for r in rows_sum)
                stage_sec = {
                    k: round(sum(r[k] for r in rows_sum), 3)
                    for k in ("t_fetch", "t_extract", "t_route", "t_write", "t_wait")
                }
            _t.update(stage_sec)  # summed task-side wall across all workers
            assert n_written == n_take, f"round {rnd}: wrote {n_written} rows, scheduled {n_take}"

        _t["pipeline"] = _time.time() - _t0
        _t0 = _time.time()
        # 5+7. one barrier: finalize discoveries + lineage + checkpoint
        empty = np.array([], dtype=np.uint64)
        shard_hashes: dict[int, np.ndarray] = {s: empty for s in range(cfg.shards)}
        if n_take:
            sh = sched_t.column("shard").to_numpy(zero_copy_only=False)
            uh = sched_t.column("url_hash").to_numpy(zero_copy_only=False)
            for s in np.unique(sh):
                shard_hashes[int(s)] = uh[sh == s]
        closes = ray.get(
            [a.close_round.remote(rnd, shard_hashes[s], self.ckpt_dir) for s, a in enumerate(self.actors)]
        )
        self._seen_refs = {
            s: c["seen_ref"] for s, c in enumerate(closes) if c.get("seen_ref") is not None
        }
        _t["close_finalize_max"] = max(c["finalize"] for c in closes)
        _t["close_ckpt_max"] = max(c["ckpt"] for c in closes)
        dets = [c.get("detail") or {} for c in closes]
        close_detail = {
            k: max(d.get(k, 0) for d in dets) for k in (dets[0] or {})
        }

        # 6. per-sink filtered streams from this round's rows — BEFORE the
        # commit marker: a crash after commit would never re-run the round,
        # so anything that must exist for a committed round (sink dirs
        # included) is written first; an uncommitted crash re-runs the round
        # and overwrites the idempotent round-keyed sink dirs.
        if cfg.sinks:
            round_table = pq.read_table(round_dir)
            write_sinks(round_table, rnd, self.out_dir, cfg.sinks, transport=self.sink_transport)

        if self.ckpt_dir is not None:
            ckpt.commit_round(self.ckpt_dir, rnd, cfg.shards)

        _t["close"] = _time.time() - _t0
        self.metrics.append(
            {
                "round": rnd,
                "dropped": ndrop,
                "scheduled": n_take,
                "quota_mode": self._quota_mode,
                "phase_sec": {k: round(v, 3) for k, v in _t.items()},
                "close_detail": close_detail,
            }
        )
        self._next_round = max(self._next_round, rnd + 1)
        return True

    def run(self, max_rounds: int | None = None) -> int:
        """Run rounds until the frontier drains or the cap hits; returns
        the number of rounds executed. Per-round metrics (the throughput
        logger analog, /root/reference/crawler/logger.go:9-68) are kept in
        self.metrics and flushed to <out_dir>/metrics.json at the end."""
        R = self.cfg.max_rounds if max_rounds is None else max_rounds
        executed = 0
        for rnd in range(self._next_round, R):
            if not self.run_round(rnd):
                break
            executed += 1
        self._flush_metrics()
        return executed

    def run_follow(
        self,
        *,
        interval_sec: float = 1.0,
        max_idle_ticks: int = 3,
        max_rounds: int | None = None,
    ) -> int:
        """Daemon mode — the reference's polling ticker
        (/root/reference/crawler/crawler.go:34-51): keep running rounds;
        when the frontier drains, poll the page store for external
        changes (mutated/appended shards re-enter via refresh_changed,
        whose new digests trigger DROPPED + re-crawl) every
        ``interval_sec`` until ``max_idle_ticks`` consecutive polls see
        no progress. Rounds never overlap (the Syncing-flag guarantee is
        by construction: one driver loop)."""
        import time as _time

        R = self.cfg.max_rounds if max_rounds is None else max_rounds
        executed = 0
        idle = 0
        rnd = self._next_round
        while rnd < R and idle <= max_idle_ticks:
            # poll the store every tick (the reference reads the remote
            # chain head on every tick, crawler/blocks.go:43) so external
            # page rewrites are visible to this round's digest probe
            if self.shared.refresh_changed(self.pages_dir):
                self._store_dirty = True
            progressed = self.run_round(rnd)
            if progressed:
                executed += 1
                rnd += 1
                idle = 0
                continue
            idle += 1
            _time.sleep(interval_sec)
            if self.shared.refresh_changed(self.pages_dir):
                self._store_dirty = True
        self._flush_metrics()
        return executed

    def _flush_metrics(self) -> None:
        import json

        os.makedirs(self.out_dir, exist_ok=True)
        path = os.path.join(self.out_dir, "metrics.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "rounds": self.metrics,
                    "totals": {
                        "scheduled": sum(m["scheduled"] for m in self.metrics),
                        "dropped": sum(m["dropped"] for m in self.metrics),
                    },
                },
                f,
                indent=1,
            )
        os.replace(tmp, path)

    def _old_texts(self, dropped: pa.Table) -> list[str]:
        """Previously-emitted text per dropped row, read back from the
        crawl log by (round, seq).

        File names alone cannot prune (chunks are pshard-grouped, so the
        seq ranges of a round's part files interleave); instead each
        file's parquet footer is consulted first and the file is only
        READ when its row-group min/max ``seq`` statistics intersect the
        wanted set — a retraction pays footer reads plus the one or two
        parts that actually contain its rows, not a full-round scan."""
        rounds = dropped.column("round").to_pylist()
        seqs = dropped.column("seq").to_pylist()
        need: dict[int, set[int]] = {}
        for r, s_ in zip(rounds, seqs):
            need.setdefault(int(r), set()).add(int(s_))
        found: dict[tuple[int, int], str] = {}
        for r, want in need.items():
            d = os.path.join(self.out_dir, "crawl_log", f"round={r}")
            if not os.path.isdir(d):
                continue
            want_arr = np.sort(np.fromiter(want, dtype=np.int64, count=len(want)))
            for fname in sorted(os.listdir(d)):
                if not fname.endswith(".parquet"):
                    continue
                path = os.path.join(d, fname)
                pf = pq.ParquetFile(path)
                md = pf.metadata
                try:
                    seq_col = pf.schema_arrow.get_field_index("seq")
                except KeyError:
                    seq_col = -1
                overlap = seq_col < 0
                if not overlap:
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(seq_col).statistics
                        if st is None or not st.has_min_max:
                            overlap = True
                            break
                        j = int(np.searchsorted(want_arr, st.min))
                        if j < len(want_arr) and want_arr[j] <= st.max:
                            overlap = True
                            break
                if not overlap:
                    continue
                t = pq.read_table(path, columns=["seq", "text"])
                sv = t.column("seq").to_numpy(zero_copy_only=False)
                hit = np.isin(sv, want_arr)
                if hit.any():
                    tt = t.filter(pa.array(hit))
                    for s2, x in zip(tt.column("seq").to_pylist(), tt.column("text").to_pylist()):
                        found[(r, int(s2))] = x
        return [found.get((int(r), int(s_)), "") for r, s_ in zip(rounds, seqs)]

    # --- results --------------------------------------------------------
    def crawl_log(self) -> pa.Table:
        return read_crawl_log(self.out_dir)

    def seen_table(self) -> pa.Table:
        parts = ray.get([a.seen_table.remote() for a in self.actors])
        t = pa.concat_tables(parts)
        return t.sort_by([("url_hash", "ascending")])

    def stats(self) -> list[dict]:
        return ray.get([a.stats.remote() for a in self.actors])

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
