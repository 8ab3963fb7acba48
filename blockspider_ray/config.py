"""Crawl configuration (analog of the reference's config.json:
/root/reference/params/config.go:16-23 + config.json.example).

Extension surface mirrors the reference's (SURVEY.md §2.9): everything is
configuration; the two documented hooks are ``extract_fn`` and
``link_fn`` (pure + deterministic, or the byte-identity invariant breaks).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, asdict
from typing import Any


@dataclass
class SinkSpec:
    """One output stream with an optional predicate — analog of a Kafka
    topic + its filter params (/root/reference/kafka/kafka.go:5-13).

    ``predicate`` maps column name -> allowed values; empty/None = pass-all
    (the reference's empty-rule wildcard, crawler/blocks.go:207-214).
    Each sink filters the ORIGINAL row set (the intended by-value
    semantics — SURVEY.md §2.8.2)."""

    path: str
    predicate: dict[str, list[str]] | None = None


@dataclass
class CrawlConfig:
    # politeness: per-host scheduling budget per round (token bucket that
    # refills fully each round — ticker-interval analog, crawler/crawler.go:34-40)
    tokens_per_host_per_round: int = 2
    # global cap on scheduled URLs per round (bounds round size like the
    # reference bounds a sync round to [head+1, chainHead])
    max_urls_per_round: int = 500
    # number of host-hash shards == number of frontier-owner actors
    shards: int = 8
    # bounded per-shard rollback window (reorg cache analog; "must be
    # larger than reorgs", /root/reference/README.md:62, cache/stack.go:27-30)
    rollback_window: int = 16
    max_rounds: int = 50
    sinks: list[SinkSpec] = field(default_factory=list)
    # seen-set false-positive budget for the scaled cuckoo filter; tests
    # run with the exact shadow set enabled (SURVEY.md §2.6 D1)
    cuckoo_capacity_per_shard: int = 1 << 20
    exact_seen: bool = True
    # Degradation path for giant rounds (SURVEY.md §4 / engine.py scale
    # notes): when one round's scheduled-candidate METADATA exceeds this
    # many rows, subsequent rounds switch (sticky) to per-shard quotas of
    # ``max_urls_per_round // shards`` with shard-LOCAL (priority, host,
    # url) ordering — the driver then concatenates and orders at most
    # ``max_urls_per_round`` rows instead of the whole politeness pop.
    # 0 = quota mode from round 0.
    driver_order_threshold: int = 2_000_000

    @classmethod
    def from_json(cls, path: str) -> "CrawlConfig":
        with open(path) as f:
            raw: dict[str, Any] = json.load(f)
        sinks = [SinkSpec(**s) for s in raw.pop("sinks", [])]
        return cls(sinks=sinks, **raw)

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(asdict(self), f, indent=2)
