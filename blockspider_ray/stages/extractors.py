"""Extraction stage: html -> text + out-links + digest + status.

The normalization kernel of the engine — the ``RawBlock.Convert`` analog
(/root/reference/common/blocks.go:34-90): wire html to canonical crawl-log
row, byte-identical ``text`` per url at any parallelism (pinned by golden
tests like /root/reference/common/blocks_test.go:38-51).

A stateless ``map_batches`` function (module-level compiled regexes; no
per-actor state needed). The per-document parse is inherently row-wise,
but all row iteration happens at C-regex speed inside this one stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.extract import content_digest, extract_links, extract_text


def extract_batch(batch: pa.Table) -> pa.Table:
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    n = len(urls)
    status = np.empty(n, dtype=object)
    texts = np.empty(n, dtype=object)
    links: list[list[str]] = [[]] * n
    n_links = np.zeros(n, dtype=np.int64)
    digests = np.zeros(n, dtype=np.uint64)
    for i in range(n):
        h = htmls[i]
        if h is None:
            status[i] = "MISSING"
            texts[i] = ""
        else:
            status[i] = "ACCEPTED"
            texts[i] = extract_text(h)
            ls = extract_links(h, urls[i])
            links[i] = ls
            n_links[i] = len(ls)
            digests[i] = content_digest(h)
    out = batch.drop_columns(["html"])
    out = out.append_column("status", pa.array(status, pa.string()))
    out = out.append_column("n_links", pa.array(n_links, pa.int64()))
    out = out.append_column("text", pa.array(texts, pa.string()))
    out = out.append_column("digest", pa.array(digests, pa.uint64()))
    out = out.append_column("links", pa.array(links, pa.list_(pa.string())))
    out = out.append_column("version", pa.array(np.full(n, 1, dtype=np.int32), pa.int32()))
    return out
