"""Per-sink filtered output streams — the multi-topic Kafka sink analog.

The reference fans one block stream out to multiple Kafka topics, each
with its own filter params (/root/reference/kafka/kafka.go:5-13, emit
loop crawler/blocks.go:230-250). Here each sink is a Parquet directory
fed by a predicate over the crawl-log rows; every sink filters the
ORIGINAL rows (the intended by-value semantics — SURVEY.md §2.8.2
documents the reference's aliasing defect we do not reproduce), and an
empty/None predicate passes everything (the empty-rule wildcard,
crawler/blocks.go:207-214).

Outputs are round-keyed (``<sink>/round=R/``) so a re-run of a round
overwrites instead of duplicating (idempotent at-least-once delivery,
SURVEY.md §2.7).
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..config import SinkSpec


def apply_predicate(table: pa.Table, predicate: dict[str, list[str]] | None) -> pa.Table:
    if not predicate:
        return table
    mask = None
    for col, allowed in predicate.items():
        if not allowed:  # empty rule = wildcard
            continue
        m = pc.is_in(table.column(col), value_set=pa.array(allowed))
        mask = m if mask is None else pc.and_(mask, m)
    return table if mask is None else table.filter(mask)


def write_sinks(round_table: pa.Table, rnd: int, out_root: str, sinks: list[SinkSpec]) -> None:
    for sink in sinks:
        sub = apply_predicate(round_table, sink.predicate)
        d = os.path.join(out_root, sink.path, f"round={rnd}")
        if os.path.isdir(d):
            shutil.rmtree(d)
        os.makedirs(d, exist_ok=True)
        pq.write_table(sub, os.path.join(d, "part-0.parquet"), compression="zstd", compression_level=1)
