"""Deduplication pipelines — exact, first-per-key, MinHash-LSH, SimHash,
n-gram Jaccard. The scale pattern for every one: hash/signature computed
vectorized per batch, then the dedup decision made inside the hash-owned
partition (the shuffle IS the dedup router — same design as the engine's
sharded seen-set, SURVEY.md §2.6 D1)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions import text as tx
from ..functions.urls import hash64
from .common import T

_MINHASH_PERMS = 64
_LSH_BANDS = 16  # 16 bands x 4 rows


def exact_dedup(sf_dir: str) -> rd.Dataset:
    """Exact dedup by normalized-text fingerprint: hash per batch ->
    groupby(hash) -> keep min doc_id per group."""
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def add_fp(t: pa.Table) -> pa.Table:
        return t.append_column("fp", pa.array(tx.fingerprint64(t["text"].to_pylist()), pa.uint64())).select(
            ["doc_id", "fp"]
        )

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": [int(g["doc_id"].min())], "fp": [g["fp"].iloc[0]]})

    return (
        ds.map_batches(add_fp, batch_format="pyarrow")
        .groupby("fp")
        .map_groups(first, batch_format="pandas")
        .select_columns(["doc_id"])
    )


def first_per_key(sf_dir: str) -> pd.DataFrame:
    """First-wins dedup per (lang, source) — the reorg-walk first-wins
    dedup analog (crawler/blocks.go:133,146-155: first block per height
    wins)."""
    ds = T(sf_dir, "documents", columns=["doc_id", "lang", "source"])

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]],
                "source": [g["source"].iloc[0]],
                "first_doc": [int(g["doc_id"].min())],
                "n_docs": [len(g)],
            }
        )

    out = ds.groupby(["lang", "source"]).map_groups(first, batch_format="pandas").to_pandas()
    out["first_doc"] = out["first_doc"].astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values(["lang", "source"]).reset_index(drop=True)


def _signatures(t: pa.Table, a: np.ndarray, b: np.ndarray, k: int = 5) -> tuple[list, np.ndarray]:
    texts = t["text"].to_pylist()
    sigs = np.empty((len(texts), len(a)), dtype=np.uint64)
    for i, x in enumerate(texts):
        sh = tx.shingles(x, k=k)
        sigs[i] = tx.minhash_signature(hash64(sh) if sh else np.array([], np.uint64), a, b)
    return texts, sigs


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.5) -> pd.DataFrame:
    """MinHash + LSH near-duplicate pairs:

      shingle -> minhash signature (per batch, vectorized)
      -> explode to (band_id, band_hash, doc_id) rows
      -> groupby(band) => candidate pairs (only same-bucket docs meet)
      -> verify true shingle-set Jaccard >= threshold.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, rounded 4.
    The groupby is the only all-to-all and it moves 16 small rows per
    document, never the text."""
    a, b = tx.minhash_params(_MINHASH_PERMS)
    rows_per_band = _MINHASH_PERMS // _LSH_BANDS
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def bands(t: pa.Table) -> pa.Table:
        _, sigs = _signatures(t, a, b)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        band_ids = np.repeat(np.arange(_LSH_BANDS, dtype=np.int64)[None, :], len(doc_ids), axis=0).ravel()
        # hash each band's rows into one bucket key
        bh = np.zeros((len(doc_ids), _LSH_BANDS), dtype=np.uint64)
        for bi in range(_LSH_BANDS):
            seg = sigs[:, bi * rows_per_band : (bi + 1) * rows_per_band]
            h = np.uint64(1469598103934665603)
            acc = np.full(len(doc_ids), h, dtype=np.uint64)
            for c in range(rows_per_band):
                acc = (acc ^ seg[:, c]) * np.uint64(1099511628211)
            bh[:, bi] = acc
        return pa.table(
            {
                "band_id": pa.array(band_ids, pa.int64()),
                "band_hash": pa.array(bh.ravel(), pa.uint64()),
                "doc_id": pa.array(np.repeat(doc_ids, _LSH_BANDS), pa.int64()),
            }
        )

    MAX_BUCKET = 256  # hot-bucket guard: a bucket of n docs emits O(n^2)
    # pairs; past this bound (boilerplate-heavy corpora) we link each doc
    # to the bucket's min id only (star pattern) — transitively complete
    # for true duplicate CLUSTERS, and it caps the skew explosion the
    # same way the engine caps mega-host share (SURVEY.md §4 skew row)

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(int(x) for x in g["doc_id"]))
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")})
        if len(ids) > MAX_BUCKET:
            root = ids[0]
            return pd.DataFrame({"doc_a": [root] * (len(ids) - 1), "doc_b": ids[1:]})
        pairs = [(x, y) for i, x in enumerate(ids) for y in ids[i + 1 :]]
        return pd.DataFrame({"doc_a": [p[0] for p in pairs], "doc_b": [p[1] for p in pairs]})

    cand = (
        ds.map_batches(bands, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(candidates, batch_format="pandas")
        .to_pandas()
    )
    if len(cand) == 0:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64"), "jaccard": pd.Series([], dtype="float64")}
        )
    cand = cand.drop_duplicates().reset_index(drop=True)

    # verify true Jaccard for the (small) candidate set
    need = sorted(set(cand["doc_a"]) | set(cand["doc_b"]))
    docs = T(sf_dir, "documents", columns=["doc_id", "text"]).to_pandas()
    docs = docs[docs["doc_id"].isin(need)]
    sh = {int(r.doc_id): set(tx.shingles(r.text, k=5)) for r in docs.itertuples()}
    jac = [tx.jaccard(sh[int(x)], sh[int(y)]) for x, y in zip(cand["doc_a"], cand["doc_b"])]
    cand["jaccard"] = np.round(jac, 4)
    out = cand[cand["jaccard"] >= threshold].reset_index(drop=True)
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def simhash_near_dups(sf_dir: str, max_hamming: int = 6) -> pd.DataFrame:
    """SimHash near-dup pairs: 64-bit simhash per doc, bucket by the 4
    16-bit quarters (any pair within hamming<=6 shares >=1 exact quarter
    at these sizes is a heuristic recall filter), verify hamming."""
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def sims(t: pa.Table) -> pa.Table:
        s = tx.simhash64(t["text"].to_pylist())
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(s, pa.uint64())})

    df = ds.map_batches(sims, batch_format="pyarrow").to_pandas()
    sh = df["simhash"].to_numpy(dtype=np.uint64)
    ids = df["doc_id"].to_numpy()
    rows = []
    buckets: dict[tuple[int, int], list[int]] = {}
    for i in range(len(df)):
        for q in range(4):
            key = (q, int((int(sh[i]) >> (16 * q)) & 0xFFFF))
            buckets.setdefault(key, []).append(i)
    seen_pairs = set()
    for idxs in buckets.values():
        for ii, i in enumerate(idxs):
            for j in idxs[ii + 1 :]:
                if (i, j) in seen_pairs:
                    continue
                seen_pairs.add((i, j))
                d = int(tx.hamming64(np.array([sh[i]]), np.array([sh[j]]))[0])
                if d <= max_hamming:
                    a_, b_ = sorted((int(ids[i]), int(ids[j])))
                    rows.append((a_, b_, d))
    out = pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"]).astype(
        {"doc_a": "int64", "doc_b": "int64", "hamming": "int64"}
    )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
