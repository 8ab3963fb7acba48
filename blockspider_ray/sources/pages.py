"""Host-sharded page store — the fetch-simulation source.

Analog of the reference's RPC point-lookup readers
(/root/reference/common/rpc.go:69-97: GetBlockByHeight/Hash): scheduled
URLs are resolved against a host-sharded Parquet layout
(``pages_dir/pshard=S/part.parquet``, S = hash64(host) %% N_PAGE_SHARDS);
because the store layout and the crawl partitioning both key off the
host hash, a fetch batch touches few physical shards (SURVEY.md §2.1 S1).

Two access paths:

  * ``PageStore`` — disk-backed, per-process LRU of url->html dicts,
    mtime-validated (used for robots preload and small point probes).
  * ``SharedPages`` — the hot path: every physical shard's (url, html)
    Arrow table is ``ray.put`` into the object store ONCE by the engine
    driver and read zero-copy by every fetch task and shard actor.
    Lookups are vectorized ``pc.index_in`` probes against the shared
    table — no per-worker dict copies, no cache thrash, no re-reads.

In a real deployment the fetch stage is an HTTP fetcher and neither
path exists; the object-store share is purely the *simulator's* way of
making "the web" addressable at zero copy (the reference's reorgd
JSON-RPC façade plays the same role, /root/reference/cmd/reorgd/main.go:175-253).
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

    def load_shard_table(self, s: int, columns=("url", "html")):
        """One physical shard as an Arrow table (for object-store sharing).

        The html column is cast to large_binary (64-bit offsets) and
        combined to a SINGLE chunk here, once, at load: a 10M-page store
        has >2 GB of html per shard, which overflows 32-bit binary
        offsets the moment ``pc.take`` concatenates chunks — and the
        single chunk also makes every later gather a direct kernel call
        instead of an implicit whole-column chunk concat per batch."""
        import pyarrow as pa

        path = self._shard_path(s)
        if not os.path.exists(path):
            return pa.table({"url": pa.array([], pa.string()), "html": pa.array([], pa.large_binary())})
        t = pq.read_table(path, columns=list(columns))
        cols = {}
        for name in t.column_names:
            c = t.column(name)
            if name == "html":
                c = c.cast(pa.large_binary())
            cols[name] = c.combine_chunks()
        return pa.table(cols)

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


def _load_shard_table_remote(pages_dir: str, s: int):
    """Ray-task body: read one physical shard's (url, html) table. The
    task's RETURN ref is the plasma object every fetch task reads —
    parquet decode runs on a worker, in parallel across shards, and the
    driver never touches the bytes (at 10M+ pages the serial
    read-and-ray.put loop this replaces was seconds of driver wall per
    run)."""
    return PageStore(pages_dir).load_shard_table(s)


def _shard_robots_remote(path: str) -> dict[str, str]:
    """Ray-task body: one shard's robots bodies (host -> text).

    The robots mask is computed on the url column alone (a few MB even
    at 10M pages) and the wide text column is only decoded when the
    shard actually holds robots rows; the match itself is a vectorized
    Arrow kernel, not a python loop over every page."""
    import pyarrow.compute as pc

    if not os.path.exists(path):
        return {}
    urls = pq.read_table(path, columns=["url"]).column("url")
    mask = pc.ends_with(urls, pattern="/robots.txt")
    if pc.sum(mask).as_py() in (None, 0):
        return {}
    texts = pq.read_table(path, columns=["text"]).column("text").filter(mask)
    hosts = pc.split_pattern(urls.filter(mask), "/")
    return {h[2].as_py(): x for h, x in zip(hosts, texts.to_pylist())}


_LOAD_TASK = None
_ROBOTS_TASK = None


def _tasks():
    """Lazily wrap the task bodies (`ray.remote` at import time would
    bind before workers exist in some embedding contexts)."""
    global _LOAD_TASK, _ROBOTS_TASK
    if _LOAD_TASK is None:
        import ray

        _LOAD_TASK = ray.remote(num_cpus=1)(_load_shard_table_remote)
        _ROBOTS_TASK = ray.remote(num_cpus=1)(_shard_robots_remote)
    return _LOAD_TASK, _ROBOTS_TASK


def read_robots_async(pages_dir: str) -> list:
    """Fire one robots-scan Ray task per physical shard and return the
    refs WITHOUT waiting — the engine overlaps this scan with the shard
    loads and the actor process spawns (startup is wall-serial
    otherwise; the three together dominate engine-construction time)."""
    store = PageStore(pages_dir)
    _, robots_task = _tasks()
    return [robots_task.remote(store._shard_path(s)) for s in range(store.n_shards)]


def read_robots_parallel(pages_dir: str) -> dict[str, str]:
    """host -> robots.txt body for every host that has one, scanned by
    one Ray task per physical shard (the serial driver loop in
    PageStore.read_robots is kept for the oracle, which must not need a
    Ray session)."""
    import ray

    parts = ray.get(read_robots_async(pages_dir))
    out: dict[str, str] = {}
    for d in parts:
        out.update(d)
    return out


class SharedPages:
    """Zero-copy view of the pages store shared via the Ray object store.

    ``refs`` maps physical shard id -> ObjectRef of that shard's
    (url, html) Arrow table (loaded by parallel Ray tasks at engine
    start; re-loaded per shard after a mutation). ``ray.get`` of an
    Arrow table is zero-copy from plasma, so N workers share one
    physical copy."""

    def __init__(self, refs: dict[int, "object"], n_shards: int):
        self.refs = refs
        self.n_shards = n_shards

    @classmethod
    def put_store(cls, pages_dir: str) -> "SharedPages":
        store = PageStore(pages_dir)
        load_task, _ = _tasks()
        # fire one read task per shard; the task-return refs ARE the
        # shared objects (no driver readback, no serial decode)
        refs = {s: load_task.remote(pages_dir, s) for s in range(store.n_shards)}
        sp = cls(refs, store.n_shards)
        sp._pages_dir = pages_dir
        sp._mtimes = {s: sp._mtime(pages_dir, s) for s in range(store.n_shards)}
        return sp

    @staticmethod
    def _mtime(pages_dir: str, s: int) -> float:
        p = os.path.join(pages_dir, f"pshard={s}", "part.parquet")
        return os.path.getmtime(p) if os.path.exists(p) else -1.0

    def refresh_changed(self, pages_dir: str | None = None) -> list[int]:
        """Re-put every physical shard whose file changed on disk since
        the last load (external page mutation / append pickup — the
        daemon's remote-head-poll analog). Returns changed shard ids."""
        import ray

        pages_dir = pages_dir or getattr(self, "_pages_dir", None)
        if pages_dir is None:
            return []
        if not hasattr(self, "_mtimes"):
            self._mtimes = {}
        load_task, _ = _tasks()
        changed = []
        for s in range(self.n_shards):
            m = self._mtime(pages_dir, s)
            if self._mtimes.get(s) != m:
                self.refs[s] = load_task.remote(pages_dir, s)
                self._mtimes[s] = m
                changed.append(s)
        return changed

    def reput_shards(self, pages_dir: str, shard_ids) -> None:
        # plasma objects are immutable: a mutation re-loads the shard
        # table (parallel tasks) and later rounds read the new refs (old
        # objects are GC'd once no task holds them)
        load_task, _ = _tasks()
        for s in shard_ids:
            self.refs[int(s)] = load_task.remote(pages_dir, int(s))

    def lookup_col(self, url_col, host_values) -> "object":
        """Vectorized url -> html gather: returns a binary Arrow array
        aligned with ``url_col`` (null = missing page). Probe is
        ``pc.index_in``, gather is null-safe ``pc.take`` — no per-row
        ``as_py`` in the fetch hot path. ``host_values`` is any sequence
        ``hash64`` accepts (numpy object array from an Arrow column is
        zero-conversion)."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray

        n = len(url_col)
        if n == 0:
            return pa.array([], pa.binary())
        shards = (hash64(host_values) % np.uint64(self.n_shards)).astype(np.int64)
        uniq = np.unique(shards)
        # NB: never combine_chunks() the shared table's html column — that
        # would copy the whole shard's payload per batch; take() accepts a
        # ChunkedArray and only the GATHERED rows are ever materialized.
        if len(uniq) == 1:  # the common case: batches arrive pshard-grouped
            tbl = ray.get(self.refs[int(uniq[0])])
            idx = pc.index_in(url_col, value_set=tbl.column("url"))
            return pc.take(tbl.column("html"), idx)
        parts, pos = [], []
        for s in uniq:
            rows = np.flatnonzero(shards == s)
            tbl = ray.get(self.refs[int(s)])
            sub = url_col.take(pa.array(rows)) if hasattr(url_col, "take") else pa.array(
                [url_col[i] for i in rows], pa.string()
            )
            idx = pc.index_in(sub, value_set=tbl.column("url"))
            got = pc.take(tbl.column("html"), idx)  # gathers |rows| cells only
            parts.append(got.combine_chunks() if isinstance(got, pa.ChunkedArray) else got)
            pos.append(rows)
        cat = pa.concat_arrays(parts)
        inv = np.empty(n, dtype=np.int64)
        inv[np.concatenate(pos)] = np.arange(n, dtype=np.int64)
        return cat.take(pa.array(inv))

    def lookup(self, urls: list[str], hosts: list[str]) -> list:
        import pyarrow as pa

        if not urls:
            return []
        return self.lookup_col(pa.array(urls, pa.string()), hosts).to_pylist()

    def lookup_digests(self, urls: list[str], hosts: list[str]) -> np.ndarray:
        htmls = self.lookup(urls, hosts)
        return np.fromiter(
            (content_digest(h) if h is not None else 0 for h in htmls), dtype=np.uint64, count=len(urls)
        )
