"""Arrow schemas for every table the engine reads or writes.

Two-layer schema discipline mirrors the reference's wire-vs-canonical
split (/root/reference/common/blocks.go:9-31 vs :92-115): ``PAGES`` is
the wire layer (authoritative shape from BASELINE.json input_hint);
``CRAWL_LOG`` is the canonical output envelope (analog of the Kafka
``Payload`` {Status, Block, Version}, /root/reference/kafka/kafka.go:16-20).
"""

from __future__ import annotations

import pyarrow as pa

# authoritative input shape (BASELINE.json input_hint)
PAGES = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

SEEDS = pa.schema([pa.field("url", pa.string()), pa.field("priority", pa.int64())])

FRONTIER = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("host_hash", pa.uint64()),
        pa.field("url_hash", pa.uint64()),
        pa.field("priority", pa.int64()),
        pa.field("round_discovered", pa.int64()),
    ]
)

SCHEDULED = pa.schema(
    [
        pa.field("round", pa.int64()),
        pa.field("seq", pa.int64()),
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("url_hash", pa.uint64()),
        pa.field("priority", pa.int64()),
        pa.field("shard", pa.int64()),
    ]
)

# ordered output event stream (Payload envelope analog); status ACCEPTED |
# DROPPED | MISSING, version const 1 (kafka/kafka.go:16-20)
CRAWL_LOG = pa.schema(
    [
        pa.field("round", pa.int64()),
        pa.field("seq", pa.int64()),
        pa.field("host", pa.string()),
        pa.field("url", pa.string()),
        pa.field("status", pa.string()),
        pa.field("n_links", pa.int64()),
        pa.field("text", pa.string()),
        pa.field("version", pa.int32()),
    ]
)

SEEN = pa.schema([pa.field("url_hash", pa.uint64()), pa.field("url", pa.string())])

# per-shard checkpoint payload (StateFile analog, state/state.go:28-32)
CHECKPOINT_FRONTIER = pa.schema(
    [
        pa.field("priority", pa.int64()),
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("url_hash", pa.uint64()),
        pa.field("round_discovered", pa.int64()),
    ]
)

CHECKPOINT_WINDOW = pa.schema(
    [
        pa.field("round", pa.int64()),
        pa.field("seq", pa.int64()),
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("url_hash", pa.uint64()),
        pa.field("priority", pa.int64()),
        pa.field("digest", pa.uint64()),
        pa.field("n_links", pa.int64()),
    ]
)
