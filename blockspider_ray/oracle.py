"""Sequential single-process oracle crawler.

This is the executable specification of the crawl semantics — the analog
of the reference's single-threaded daemon loop
(/root/reference/crawler/blocks.go:25-101 + cmd/blockspiderd/main.go:100-132),
made deterministic. The distributed Ray engine (engine.py) must produce
byte-identical output at any parallelism. Tests compare:

  - exact ``(round, seq, url, status)`` sequence of the crawl log
    (in-order-commit analog, syncronizer/synchronizer.go:12-36)
  - byte-identical ``text`` per url (RawBlock.Convert golden analog,
    common/blocks_test.go:38-51)
  - final seen set (dedup-map analog, crawler/blocks.go:133,146-155)
  - DROPPED retraction + replay on page mutation (reorg analog,
    crawler/blocks.go:131-189)

Defined semantics (both implementations; SURVEY.md §7.4.1):

  * canonical URLs everywhere; seen-set keyed by hash64(canonical url).
  * round r sequence = DROPPED rows first (ordered by original
    (round, seq)), then scheduled rows ordered by (priority, host, url);
    ``seq`` is dense within the round over both.
  * per-host politeness: at most ``tokens_per_host_per_round`` pops per
    round, popped in (priority, url) order.
  * global cap: candidates sorted by (priority, host, url), first
    ``max_urls_per_round`` scheduled, the rest pushed back.
  * discoveries are finalized at END of round: per new url the minimum
    discovered priority wins; robots-disallowed and already-seen urls are
    dropped; survivors are marked seen and enqueued. (Round-batched
    enqueue makes the result independent of within-round processing
    order — the property the distributed engine needs.)
  * discovered priority = parent priority + 1 (depth).
  * missing pages (dead links) emit status MISSING with empty text and do
    not enter the rollback window.
  * mutation detection: at round start each shard probes its rollback
    window's content digests against the page store; mismatches emit
    DROPPED (with the previously emitted text) and re-enqueue the url at
    its original priority, bypassing the seen check.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import schemas
from .config import CrawlConfig
from .functions.extract import content_digest, extract_links
from .functions.robots import is_allowed, parse_robots
from .functions.urls import canonicalize_url, hash64_one, url_host, url_path
from .state.frontier import HostFrontier
from .state.window import RollbackWindow, WindowEntry


def load_pages_dict(pages_dir: str) -> dict[str, tuple[bytes, str]]:
    """url -> (html, text) for the whole store (oracle scale only)."""
    out: dict[str, tuple[bytes, str]] = {}
    for shard_dir in sorted(os.listdir(pages_dir)):
        p = os.path.join(pages_dir, shard_dir, "part.parquet")
        if not os.path.exists(p):
            continue
        t = pq.read_table(p, columns=["url", "html", "text"])
        for u, h, x in zip(t.column("url").to_pylist(), t.column("html").to_pylist(), t.column("text").to_pylist()):
            out[u] = (h, x)
    return out


def load_robots(pages: dict[str, tuple[bytes, str]]) -> dict[str, list[str]]:
    rules: dict[str, list[str]] = {}
    for url, (_, text) in pages.items():
        if url.endswith("/robots.txt"):
            rules[url_host(url)] = parse_robots(text)
    return rules


class OracleCrawler:
    def __init__(
        self,
        pages_dir: str,
        seeds: list[str],
        cfg: CrawlConfig,
        mutations: dict[int, list[str]] | None = None,
        mutated_pages: dict[int, dict[str, tuple[bytes, str]]] | None = None,
    ):
        self.cfg = cfg
        self.pages = load_pages_dict(pages_dir)
        self.robots = load_robots(self.pages)
        self.mutated_pages = mutated_pages or {}
        self.frontier = HostFrontier()
        self.windows = [RollbackWindow(cfg.rollback_window) for _ in range(cfg.shards)]
        self.seen: dict[int, str] = {}  # url_hash -> url
        self.window_texts: dict[tuple[int, int], str] = {}  # (round, seq) -> emitted text
        self.log_rows: list[tuple] = []
        self._seed(seeds)

    def _shard(self, host: str) -> int:
        return hash64_one(host) % self.cfg.shards

    def _mark_seen(self, url: str) -> bool:
        h = hash64_one(url)
        if h in self.seen:
            return False
        self.seen[h] = url
        return True

    def _allowed(self, url: str) -> bool:
        return is_allowed(url_path(url), self.robots.get(url_host(url), []))

    def _seed(self, seeds: list[str]) -> None:
        # cold start: push configured start urls (cmd/blockspiderd/main.go:100-123)
        cand: dict[str, int] = {}
        for s in seeds:
            cu = canonicalize_url(s)
            if cu is None or not self._allowed(cu):
                continue
            cand[cu] = min(cand.get(cu, 0), 0)
        for cu in sorted(cand):
            if self._mark_seen(cu):
                self.frontier.push(url_host(cu), cu, cand[cu])

    def append_seeds(self, seeds: list[str]) -> None:
        """Out-of-band seed ingestion between rounds (engine.append_seeds
        mirror)."""
        self._seed(seeds)

    def run(self, max_rounds: int | None = None) -> tuple[pa.Table, pa.Table]:
        R = max_rounds if max_rounds is not None else self.cfg.max_rounds
        for rnd in range(R):
            if rnd in self.mutated_pages:
                self.pages.update(self.mutated_pages[rnd])
            progressed = self._run_round(rnd)
            if not progressed:
                break
        return self.crawl_log(), self.seen_table()

    def _run_round(self, rnd: int) -> bool:
        cfg = self.cfg
        seq = 0

        # 1. retraction scan (reorg detection analog)
        dropped: list[WindowEntry] = []
        for s in range(cfg.shards):
            for e in self.windows[s].entries():
                page = self.pages.get(e.url)
                cur = content_digest(page[0]) if page else 0
                if cur != e.digest:
                    dropped.append(e)
        dropped.sort(key=lambda e: (e.round, e.seq))
        for e in dropped:
            old_text = self.window_texts.pop((e.round, e.seq), "")
            self.log_rows.append((rnd, seq, e.host, e.url, "DROPPED", e.n_links, old_text, 1))
            seq += 1
            self.windows[self._shard(e.host)].remove(e.url)
            self.frontier.push(e.host, e.url, e.priority)

        # 2. politeness-bounded scheduling with global cap
        cand = self.frontier.pop_round(cfg.tokens_per_host_per_round)
        cand.sort(key=lambda t: (t[0], t[1], t[2]))  # (priority, host, url)
        take = cand[: cfg.max_urls_per_round]
        for prio, host, url in cand[cfg.max_urls_per_round :]:
            self.frontier.push(host, url, prio)

        if not take and not dropped:
            return False

        # 3. fetch + extract + commit in the defined global order
        discoveries: dict[str, int] = {}
        for prio, host, url in take:
            page = self.pages.get(url)
            if page is None:
                self.log_rows.append((rnd, seq, host, url, "MISSING", 0, "", 1))
                seq += 1
                continue
            html, text = page
            links = extract_links(html, url)
            self.log_rows.append((rnd, seq, host, url, "ACCEPTED", len(links), text, 1))
            self.windows[self._shard(host)].push(
                WindowEntry(rnd, seq, url, host, hash64_one(url), prio, content_digest(html), len(links))
            )
            self.window_texts[(rnd, seq)] = text
            seq += 1
            for link in links:
                p = prio + 1
                if link not in discoveries or p < discoveries[link]:
                    discoveries[link] = p

        # 4. end-of-round discovery finalize
        for link in sorted(discoveries):
            if not self._allowed(link):
                continue
            if self._mark_seen(link):
                self.frontier.push(url_host(link), link, discoveries[link])
        return True

    def crawl_log(self) -> pa.Table:
        cols = list(zip(*self.log_rows)) if self.log_rows else [[]] * 8
        return pa.table(
            {
                "round": pa.array(cols[0], pa.int64()),
                "seq": pa.array(cols[1], pa.int64()),
                "host": pa.array(cols[2], pa.string()),
                "url": pa.array(cols[3], pa.string()),
                "status": pa.array(cols[4], pa.string()),
                "n_links": pa.array(cols[5], pa.int64()),
                "text": pa.array(cols[6], pa.string()),
                "version": pa.array(cols[7], pa.int32()),
            },
            schema=schemas.CRAWL_LOG,
        )

    def seen_table(self) -> pa.Table:
        hashes = np.fromiter(self.seen.keys(), dtype=np.uint64, count=len(self.seen))
        order = np.argsort(hashes, kind="stable")
        urls = list(self.seen.values())
        return pa.table(
            {
                "url_hash": pa.array(hashes[order], pa.uint64()),
                "url": pa.array([urls[i] for i in order], pa.string()),
            },
            schema=schemas.SEEN,
        )
