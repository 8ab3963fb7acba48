"""Similarity search over the embedding column (list<float>).

Baseline: brute-force cosine top-k — query matrix broadcast once via
``ray.put``, per-batch numpy matmul, per-batch partial top-k (combiner)
so only k rows per (query, batch) reach the final reduce.

Scale path: LSH-bucketed variant (random-hyperplane signatures) that
only scores candidates sharing a bucket with the query — the IVF/LSH
pattern for 10^9-vector corpora."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .common import T

K = 5
N_QUERIES = 3


def _emb_matrix(t: pa.Table) -> np.ndarray:
    col = t["embedding"]
    flat = col.combine_chunks().flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(t), -1)


def _query_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    q = (
        T(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr=f"vec_id < {N_QUERIES}")
        .to_pandas()  # N_QUERIES rows only
        .sort_values("vec_id")
    )
    qm = np.stack([np.asarray(v, dtype=np.float64) for v in q["embedding"]])
    return q["vec_id"].to_numpy(), qm


def knn_cosine(sf_dir: str) -> pd.DataFrame:
    """Brute-force cosine top-K of each query vector (vec_id < N_QUERIES)
    over the rest of the corpus. Returns (qid, vec_id, sim) rounded 3."""
    qids, qm = _query_matrix(sf_dir)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    ref = ray.put((qids, qn))

    ds = T(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def partial_topk(t: pa.Table) -> pa.Table:
        qids_, qn_ = ray.get(ref)
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        mask = vids >= N_QUERIES
        if not mask.any():
            return pa.table(
                {"qid": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        m = _emb_matrix(t)[mask]
        vids = vids[mask]
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = qn_ @ mn.T  # (Q, B)
        out_q, out_v, out_s = [], [], []
        k = min(K, sims.shape[1])
        for qi in range(sims.shape[0]):
            idx = np.argpartition(-sims[qi], k - 1)[:k]
            out_q.extend([int(qids_[qi])] * len(idx))
            out_v.extend(vids[idx].tolist())
            out_s.extend(sims[qi][idx].tolist())
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(K)
        return g

    out = (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(final_topk, batch_format="pandas")
        .to_pandas()
    )
    out["sim"] = out["sim"].round(3)
    return out.sort_values(["qid", "sim", "vec_id"], ascending=[True, False, True]).reset_index(drop=True)


def knn_lsh(sf_dir: str, n_tables: int = 32, n_planes: int = 5) -> pd.DataFrame:
    """Multi-table LSH ANN: L independent random-hyperplane tables of P
    planes each; a vector is a candidate for a query iff it lands in the
    query's exact bucket in >=1 table. Only candidates are scored —
    the classic recall/scan-fraction tradeoff (tuned here for weakly
    correlated corpora; on real embedding data fewer tables suffice).
    Approximate — rows-only oracle; pytest asserts recall vs knn_cosine."""
    rng = np.random.default_rng(17)
    qids, qm = _query_matrix(sf_dir)
    planes = rng.standard_normal((n_tables, n_planes, qm.shape[1]))
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    pw = 1 << np.arange(n_planes, dtype=np.int64)
    # query bucket id per (query, table)
    qsig = np.stack([(qn @ planes[t].T > 0) @ pw for t in range(n_tables)], axis=1)  # (Q, L)
    ref = ray.put((qids, qn, planes, qsig))

    ds = T(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        qids_, qn_, planes_, qsig_ = ray.get(ref)
        n_tables_ = planes_.shape[0]
        pw_ = 1 << np.arange(planes_.shape[1], dtype=np.int64)
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        mask = vids >= N_QUERIES
        empty = pa.table(
            {"qid": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
        )
        if not mask.any():
            return empty
        m = _emb_matrix(t)[mask]
        vids = vids[mask]
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sig = np.stack([(mn @ planes_[tb].T > 0) @ pw_ for tb in range(n_tables_)], axis=1)  # (B, L)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids_)):
            cand = np.flatnonzero((sig == qsig_[qi][None, :]).any(axis=1))
            if len(cand) == 0:
                continue
            sims = mn[cand] @ qn_[qi]
            k = min(K, len(cand))
            idx = np.argpartition(-sims, k - 1)[:k]
            out_q.extend([int(qids_[qi])] * len(idx))
            out_v.extend(vids[cand][idx].tolist())
            out_s.extend(sims[idx].tolist())
        if not out_q:
            return empty
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(K)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(final_topk, batch_format="pandas")
        .to_pandas()
    )
    out["sim"] = out["sim"].round(3)
    return out.sort_values(["qid", "sim", "vec_id"], ascending=[True, False, True]).reset_index(drop=True)


def label_centroids(sf_dir: str) -> pd.DataFrame:
    """Mean embedding per label via per-batch partial sums (mergeable
    sketch pattern); outputs label, n, centroid norm rounded 4."""
    ds = T(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        labels = t["label"].to_numpy(zero_copy_only=False)
        uniq = np.unique(labels)
        sums = np.stack([m[labels == u].sum(axis=0) for u in uniq])
        ns = np.array([(labels == u).sum() for u in uniq], dtype=np.int64)
        return pa.table(
            {
                "label": pa.array(uniq.astype(np.int64), pa.int64()),
                "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                "n": pa.array(ns, pa.int64()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        vs = np.stack([np.asarray(v) for v in g["vsum"]]).sum(axis=0)
        n = int(g["n"].sum())
        c = vs / n
        return pd.DataFrame(
            {"label": [int(g["label"].iloc[0])], "n": [n], "centroid_norm": [round(float(np.linalg.norm(c)), 4)]}
        )

    out = ds.map_batches(partial, batch_format="pyarrow").groupby("label").map_groups(merge, batch_format="pandas").to_pandas()
    out["label"] = out["label"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values("label").reset_index(drop=True)
