"""Alternate wire-format ingestion — the Alchemy-webhook parser analog.

The reference accepts a second, differently-shaped wire schema and
normalizes it into the SAME canonical document
(/root/reference/common/alchemy.go:113-143 -> common.Block). Here the
alternate format is a WARC-ish JSON-lines capture:

    {"uri": ..., "timestamp_ms": int, "payload_b64": base64(html),
     "meta": {"lang": ...}}

normalized into the canonical ``pages`` schema (schemas.PAGES) with the
same extraction kernel, so everything downstream (engine, oracle,
pipelines) is format-agnostic — the two-layer wire/canonical schema
discipline of SURVEY.md §1.3.
"""

from __future__ import annotations

import base64
import json
import os

import pyarrow as pa
import ray.data as rd

from .. import schemas
from ..functions.extract import extract_text
from ..functions.urls import canonicalize_url


def normalize_warc_json_batch(batch: pa.Table) -> pa.Table:
    """Vectorized wire->canonical conversion (RawBlock.Convert analog,
    common/blocks.go:34-90): decode payload, canonicalize uri, recompute
    ``text`` with the byte-identity extraction kernel."""
    uris = batch.column("uri").to_pylist()
    ts_ms = batch.column("timestamp_ms").to_pylist()
    payloads = batch.column("payload_b64").to_pylist()
    metas = batch.column("meta").to_pylist()

    urls, ts_us, htmls, texts, langs = [], [], [], [], []
    for uri, t, p, m in zip(uris, ts_ms, payloads, metas):
        cu = canonicalize_url(uri)
        if cu is None:
            continue  # non-crawlable rows are dropped at the wire boundary
        html = base64.b64decode(p) if p else b""
        urls.append(cu)
        ts_us.append(int(t) * 1000)
        htmls.append(html)
        # content-type-aware: robots.txt bodies are plain text (the raw
        # body IS the rule set the frontier's robots cache consumes —
        # the same convention as the fixture generator, gen.py)
        if cu.endswith("/robots.txt"):
            texts.append(html.decode("utf-8", errors="replace"))
        else:
            texts.append(extract_text(html))
        langs.append((m or {}).get("lang", "und"))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts_us, pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=schemas.PAGES,
    )


def read_warc_json(path: str) -> rd.Dataset:
    """JSON-lines WARC-ish capture -> canonical pages Dataset."""
    return rd.read_json(path).map_batches(normalize_warc_json_batch, batch_format="pyarrow")


def write_warc_json(pages: pa.Table, path: str) -> None:
    """Inverse transform (fixture/testdata helper)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for row in pages.to_pylist():
            f.write(
                json.dumps(
                    {
                        "uri": row["url"],
                        "timestamp_ms": int(row["warc_ts"].timestamp() * 1000),
                        "payload_b64": base64.b64encode(row["html"]).decode(),
                        "meta": {"lang": row["lang"]},
                    }
                )
                + "\n"
            )
