"""Downstream crawl-log consumer — the Kafka consumer analog.

The reference's consumer (/root/reference/cmd/consumer/consumer.go:13-64)
fetches the producer's stream, filters payloads with non-empty logs, and
commits offsets after processing (at-least-once). Here the stream is the
engine's round-keyed crawl-log Parquet; the committed watermark is the
newest round with a checkpoint COMMIT marker (offset-commit analog,
kafka/reader.go:39-50) — rows of uncommitted rounds are not consumed, so
a crashed producer round is invisible downstream until it re-runs.
"""

from __future__ import annotations

import os

import pyarrow.dataset as pads
import ray.data as rd

from ..state import checkpoint as ckpt


def committed_watermark(ckpt_dir: str) -> int | None:
    """Newest committed round (the consumer's committed offset)."""
    return ckpt.latest_committed_round(ckpt_dir)


def consume_crawl_log(
    out_dir: str,
    ckpt_dir: str | None = None,
    *,
    min_links: int = 1,
    from_round: int = 0,
) -> rd.Dataset:
    """Stream committed crawl-log rows with >= min_links out-links
    (the reference's ``len(Logs) > 0`` projection, consumer.go:13-30).

    Reads only the round directories in [from_round, watermark] — file
    pruning by round, no full-log scan."""
    root = os.path.join(out_dir, "crawl_log")
    watermark = committed_watermark(ckpt_dir) if ckpt_dir else None
    files = []
    for name in sorted(os.listdir(root)) if os.path.isdir(root) else []:
        if not name.startswith("round="):
            continue
        r = int(name.split("=")[1])
        if r < from_round or (watermark is not None and r > watermark):
            continue
        d = os.path.join(root, name)
        files.extend(os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet"))
    if not files:
        import pyarrow as pa

        from .. import schemas

        return rd.from_arrow(pa.table({f.name: pa.array([], f.type) for f in schemas.CRAWL_LOG}))
    ds = rd.read_parquet(files, filter=pads.field("n_links") >= min_links)
    return ds
