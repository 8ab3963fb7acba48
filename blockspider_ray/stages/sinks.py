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
from typing import Protocol, runtime_checkable

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


@runtime_checkable
class SinkTransport(Protocol):
    """Pluggable delivery transport for one sink stream — the writer
    interface the reference hides behind kafka-go
    (/root/reference/kafka/writer.go:14-30, WriteMessages). The contract
    the engine relies on:

      * ``publish(topic, rnd, table)`` delivers one round's filtered rows
        to one topic and is IDEMPOTENT per (topic, round) — re-delivery
        after a crash-and-rerun must overwrite, not append (the engine
        commits the round only after every publish returns).
      * delivery order within a topic is by ascending round; rows within
        a round carry their own (round, seq) order as data.

    The default transport maps topic -> round-keyed Parquet directory
    (no broker exists in this sandbox); a real deployment would drop in
    a Kafka/Kinesis implementation without touching the engine."""

    def publish(self, topic: str, rnd: int, table: pa.Table) -> None: ...


class ParquetDirSink:
    """Default transport: ``<root>/<topic>/round=R/part-0.parquet``,
    idempotent per (topic, round) via dir replace."""

    def __init__(self, out_root: str):
        self.out_root = out_root

    def publish(self, topic: str, rnd: int, table: pa.Table) -> None:
        d = os.path.join(self.out_root, topic, f"round={rnd}")
        if os.path.isdir(d):
            shutil.rmtree(d)
        os.makedirs(d, exist_ok=True)
        pq.write_table(table, os.path.join(d, "part-0.parquet"), compression="zstd", compression_level=1)


class SQLiteQueueSink:
    """Second real transport behind :class:`SinkTransport` — a durable
    single-file message queue on SQLite (stdlib; no broker exists in
    this sandbox). Proves the protocol carries the two guarantees the
    engine relies on (the reference delegates both to Kafka,
    /root/reference/kafka/writer.go:14-30):

      * **idempotence per (topic, round)**: the primary key + ``INSERT
        OR REPLACE`` inside one transaction makes a crash-and-rerun
        re-publish overwrite, never append;
      * **in-topic order by round**: consumers read ``ORDER BY round``;
        rows within a round carry their own (round, seq) as data.

    Payloads are Arrow IPC stream bytes (zstd), so a consumer
    reconstructs the exact schema the engine published. The connection
    opens lazily per process (sqlite3 handles don't pickle; the engine
    publishes from the driver only)."""

    def __init__(self, db_path: str):
        self.db_path = db_path
        self._db = None

    def _conn(self):
        import sqlite3

        if self._db is None:
            os.makedirs(os.path.dirname(self.db_path) or ".", exist_ok=True)
            self._db = sqlite3.connect(self.db_path)
            self._db.execute(
                "CREATE TABLE IF NOT EXISTS messages ("
                " topic TEXT NOT NULL, round INTEGER NOT NULL,"
                " n_rows INTEGER NOT NULL, payload BLOB NOT NULL,"
                " PRIMARY KEY (topic, round))"
            )
            self._db.commit()
        return self._db

    @staticmethod
    def _encode(table: pa.Table) -> bytes:
        sink = pa.BufferOutputStream()
        opts = pa.ipc.IpcWriteOptions(compression="zstd")
        with pa.ipc.new_stream(sink, table.schema, options=opts) as w:
            w.write_table(table)
        return sink.getvalue().to_pybytes()

    def publish(self, topic: str, rnd: int, table: pa.Table) -> None:
        db = self._conn()
        with db:  # one transaction: replace is atomic => idempotent
            db.execute(
                "INSERT OR REPLACE INTO messages (topic, round, n_rows, payload) VALUES (?, ?, ?, ?)",
                (topic, int(rnd), table.num_rows, self._encode(table)),
            )

    # --- consumer side (the kafka/reader.go:25-50 analog) --------------
    def read_topic(self, topic: str, from_round: int = 0) -> list[tuple[int, pa.Table]]:
        """All messages of one topic with round >= from_round, ascending
        round order (the committed-offset consumer pattern)."""
        cur = self._conn().execute(
            "SELECT round, payload FROM messages WHERE topic = ? AND round >= ? ORDER BY round",
            (topic, int(from_round)),
        )
        out = []
        for rnd, payload in cur.fetchall():
            with pa.ipc.open_stream(pa.BufferReader(payload)) as r:
                out.append((int(rnd), r.read_all()))
        return out

    def high_water(self, topic: str) -> int | None:
        """Highest published round for a topic (None if empty)."""
        (mx,) = self._conn().execute(
            "SELECT MAX(round) FROM messages WHERE topic = ?", (topic,)
        ).fetchone()
        return None if mx is None else int(mx)

    def close(self) -> None:
        if self._db is not None:
            self._db.close()
            self._db = None


def write_sinks(
    round_table: pa.Table,
    rnd: int,
    out_root: str,
    sinks: list[SinkSpec],
    transport: SinkTransport | None = None,
) -> None:
    tr = transport if transport is not None else ParquetDirSink(out_root)
    for sink in sinks:
        tr.publish(sink.path, rnd, apply_predicate(round_table, sink.predicate))
