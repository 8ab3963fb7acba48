"""Text-analysis pipelines over ``documents`` — the training-data
quality toolkit (language id, token counts, quality scores, document
fingerprints), each a vectorized ``map_batches`` stage."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

from ..functions import text as tx
from .common import T, rename


def token_counts(sf_dir: str) -> rd.Dataset:
    """Whitespace + BPE-ish token counts per document."""
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(tx.token_count(texts), pa.int64()),
                "n_bpeish": pa.array(tx.bpeish_token_count(texts), pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def doc_stats_by_lang(sf_dir: str) -> pd.DataFrame:
    """Per-language corpus stats with in-batch partials."""
    ds = T(sf_dir, "documents", columns=["lang", "n_chars", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = tx.token_count(t["text"].to_pylist())
        t = t.select(["lang", "n_chars"]).append_column("toks", pa.array(toks, pa.int64()))
        g = t.group_by("lang").aggregate([("n_chars", "sum"), ("toks", "sum"), ("n_chars", "count")])
        return rename(g, {"n_chars_sum": "p_chars", "toks_sum": "p_toks", "n_chars_count": "p_n"})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("p_chars", alias_name="sum_chars"),
            Sum("p_toks", alias_name="sum_tokens"),
            Sum("p_n", alias_name="n_docs"),
        )
        .to_pandas()
    )
    return out.sort_values("lang").reset_index(drop=True)


def langid(sf_dir: str) -> rd.Dataset:
    """Heuristic language identification (stopword n-gram scorer) —
    deterministic, not SQL-expressible (rows-only oracle check)."""
    ds = T(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def f(t: pa.Table) -> pa.Table:
        detected = [tx.detect_lang(x) for x in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "detected": pa.array(detected, pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def quality(sf_dir: str) -> rd.Dataset:
    """Quality features + fixed-rubric score per document."""
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        feats = tx.quality_features(t["text"].to_pylist())
        score = tx.quality_score(feats)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pa.array(feats["n_chars"], pa.int64()),
                "n_tokens": pa.array(feats["n_tokens"], pa.int64()),
                "alpha_ratio": pa.array(np.round(feats["alpha_ratio"], 4), pa.float64()),
                "quality_score": pa.array(np.round(score, 4), pa.float64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def quality_langid(sf_dir: str) -> rd.Dataset:
    """Fused quality + language-id pass: both feature families share the
    same scan, so one map_batches emits them side by side — no join, no
    driver-side assembly."""
    ds = T(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def f(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        feats = tx.quality_features(texts)
        score = tx.quality_score(feats)
        detected = [tx.detect_lang(x) for x in texts]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pa.array(feats["n_chars"], pa.int64()),
                "n_tokens": pa.array(feats["n_tokens"], pa.int64()),
                "alpha_ratio": pa.array(np.round(feats["alpha_ratio"], 4), pa.float64()),
                "quality_score": pa.array(np.round(score, 4), pa.float64()),
                "lang": t["lang"],
                "detected": pa.array(detected, pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def fingerprints(sf_dir: str) -> rd.Dataset:
    """64-bit rolling-hash fingerprint + simhash per document."""
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fingerprint": pa.array(tx.fingerprint64(texts), pa.uint64()),
                "simhash": pa.array(tx.simhash64(texts), pa.uint64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")
