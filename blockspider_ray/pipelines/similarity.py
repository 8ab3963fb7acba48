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


def knn_mmr(
    sf_dir: str, k: int = K, lam: float = 0.7, shortlist: int = 4 * K
) -> pd.DataFrame:
    """Diversity-aware top-k: Maximal Marginal Relevance (Carbonell &
    Goldstein, SIGIR'98) re-rank — greedily pick the candidate
    maximizing ``lam·sim(q,d) − (1−lam)·max_{s∈selected} sim(d,s)``, so
    a shortlist crowded with near-duplicates yields a varied result set
    (the retrieval-side complement of the near-dup miners).

    Scale shape: stage 1 is the distributed brute-force combiner at a
    WIDER k (per-batch partial top-``shortlist``, only shortlist rows
    per (query, batch) reach the reduce); stage 2 gathers the shortlist
    vectors with ONE candidate-bounded filtered pass and runs the
    inherently-sequential greedy loop driver-side over Q×shortlist
    items — query-bounded state, never corpus-sized. The greedy argmax
    is itself vectorized (one running max-sim array per query,
    updated with one matvec per pick). Ties break by the canonical
    (sim desc, vec_id asc) candidate order — fully deterministic.
    ``lam=1`` degenerates to exact brute-force top-k (pinned in
    pytest)."""
    assert 0.0 <= lam <= 1.0 and k <= shortlist
    qids, qm = _query_matrix(sf_dir)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    ref = ray.put((qids, qn))

    _empty = pa.table(
        {
            "qid": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        }
    )

    def partial_topk(t: pa.Table) -> pa.Table:
        qids_, qn_ = ray.get(ref)
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        mask = vids >= N_QUERIES
        if not mask.any():
            return _empty
        m = _emb_matrix(t)[mask]
        vids = vids[mask]
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = qn_ @ mn.T
        kk = min(shortlist, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            idx = np.argpartition(-sims[qi], kk - 1)[:kk]
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
        return g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(shortlist)

    ds = T(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    short = (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(final_topk, batch_format="pandas")
        .to_pandas()  # Q x shortlist rows
    )
    if short.empty:
        return pd.DataFrame(
            {
                "qid": pd.Series([], dtype="int64"),
                "rank": pd.Series([], dtype="int64"),
                "vec_id": pd.Series([], dtype="int64"),
                "sim": pd.Series([], dtype="float64"),
            }
        )

    # ONE candidate-bounded vector gather for the pairwise-sim terms
    cand_ids = np.unique(short["vec_id"].to_numpy(dtype=np.int64))
    cand_ref = ray.put(cand_ids)

    def only_cands(t: pa.Table) -> pa.Table:
        ids_ = ray.get(cand_ref)
        v = t["vec_id"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(ids_, v), len(ids_) - 1)
        return t.filter(pa.array(ids_[pos] == v))

    cand = ds.map_batches(only_cands, batch_format="pyarrow").to_pandas()
    cmat = np.stack([np.asarray(v, dtype=np.float64) for v in cand["embedding"]])
    cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
    cvid = cand["vec_id"].to_numpy(dtype=np.int64)
    row_of = {int(v): i for i, v in enumerate(cvid)}

    rows = []
    for qid, g in short.groupby("qid", sort=True):
        v = g["vec_id"].to_numpy(dtype=np.int64)
        s = g["sim"].to_numpy(dtype=np.float64)
        # canonical candidate order for deterministic ties
        o = np.lexsort((v, -s))
        v, s = v[o], s[o]
        vecs = cmat[[row_of[int(x)] for x in v]]
        chosen: list[int] = []
        max_red = np.full(len(v), -np.inf)  # max sim to any selected item
        taken = np.zeros(len(v), dtype=bool)
        for rank in range(min(k, len(v))):
            score = lam * s - (0.0 if not chosen else (1.0 - lam) * max_red)
            score = np.where(taken, -np.inf, score)
            # argmax with vec_id-asc tie-break: scan in (score desc,
            # vec_id asc) order — v is already sim-desc/vec_id-asc, so
            # a stable argmax over the canonical order suffices
            best = int(np.argmax(score))
            taken[best] = True
            chosen.append(best)
            red = vecs @ vecs[best]
            max_red = np.maximum(max_red, red)
            rows.append((int(qid), rank, int(v[best]), float(s[best])))
    out = pd.DataFrame(rows, columns=["qid", "rank", "vec_id", "sim"]).astype(
        {"qid": "int64", "rank": "int64", "vec_id": "int64", "sim": "float64"}
    )
    out["sim"] = out["sim"].round(3)
    return out.sort_values(["qid", "rank"]).reset_index(drop=True)


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


def _train_quantizer(
    sf_dir: str, n_lists: int, train_sample: int, iters: int
) -> np.ndarray:
    """Spherical k-means coarse quantizer trained on a FIXED-SIZE
    deterministic sample — the driver holds train_sample x dim floats
    (sized by the quantizer, not the corpus). Deterministic seed so the
    fused (``knn_ivf``) and persisted (``ivf_build_index``) paths train
    the identical quantizer and therefore agree byte-for-byte."""
    sample = (
        T(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr=f"vec_id >= {N_QUERIES}")
        .limit(train_sample)
        .to_pandas()  # quantizer-sized, not corpus-sized
    )
    X = np.stack([np.asarray(v, dtype=np.float64) for v in sample["embedding"]])
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    rng = np.random.default_rng(43)
    cent = X[rng.choice(len(X), size=min(n_lists, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ cent.T, axis=1)
        for c in range(len(cent)):
            rows = X[assign == c]
            if len(rows):
                v = rows.sum(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def knn_ivf(
    sf_dir: str,
    n_lists: int = 16,
    n_probe: int = 6,
    train_sample: int = 4096,
    iters: int = 10,
) -> pd.DataFrame:
    """IVF-flat ANN — the inverted-file scale path (complementing the
    multi-table LSH variant): a spherical k-means coarse quantizer is
    trained on a FIXED-SIZE sample (the driver holds train_sample x dim
    floats — sized by the quantizer, not the corpus), the centroid
    matrix is broadcast once, and the corpus pass assigns each vector to
    its nearest centroid and scores cosine ONLY for vectors whose list
    is among the query's ``n_probe`` nearest lists — scan fraction
    ~ n_probe/n_lists. Per-batch partial top-k + one final per-query
    merge, the same combiner shape as ``knn_cosine``.

    This is the ONE-SHOT path: assign and probe fuse into one
    map_batches pass over the corpus, so the index build IS the scan —
    right when a query set is known up front. For the repeated-query
    regime (build once at 10^10 vectors, answer many query batches), use
    ``ivf_build_index`` + ``knn_ivf_indexed``, which persist the
    assignment as list-partitioned parquet and read only the probed
    partitions per query batch. Every returned sim is the TRUE cosine
    (candidates are scored exactly); only recall is approximate —
    rows-only oracle, pytest pins recall against ``knn_cosine`` and
    per-row sim exactness."""
    qids, qm = _query_matrix(sf_dir)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    cent = _train_quantizer(sf_dir, n_lists, train_sample, iters)
    # query probe lists: the n_probe nearest centroids per query
    qprobe = np.argsort(-(qn @ cent.T), axis=1)[:, : min(n_probe, len(cent))]
    ref = ray.put((qids, qn, cent, qprobe))

    ds = T(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    _empty = pa.table(
        {"qid": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
    )

    def partial(t: pa.Table) -> pa.Table:
        qids_, qn_, cent_, qprobe_ = ray.get(ref)
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        mask = vids >= N_QUERIES
        if not mask.any():
            return _empty
        m = _emb_matrix(t)[mask]
        vids = vids[mask]
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        lists = np.argmax(mn @ cent_.T, axis=1)  # IVF assignment
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids_)):
            cand = np.flatnonzero(np.isin(lists, qprobe_[qi]))
            if len(cand) == 0:
                continue
            sims = mn[cand] @ qn_[qi]
            k = min(K, len(cand))
            idx = np.argpartition(-sims, k - 1)[:k]
            out_q.extend([int(qids_[qi])] * len(idx))
            out_v.extend(vids[cand][idx].tolist())
            out_s.extend(sims[idx].tolist())
        if not out_q:
            return _empty
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


def ivf_build_index(
    sf_dir: str,
    index_dir: str,
    n_lists: int = 16,
    train_sample: int = 4096,
    iters: int = 10,
) -> str:
    """Build the PERSISTED inverted-file index: one distributed assign
    pass over the corpus, written as list-partitioned parquet
    (``index_dir/list_id=N/part-*.parquet``) plus the trained centroid
    matrix (``index_dir/centroids.parquet``, n_lists x dim — tiny).

    This is the build-once half of the repeated-query regime: at 10^10
    vectors the assign pass runs exactly once, the layout is resumable
    (a rerun can skip finished list partitions the same way
    ``corpus_prep``'s hive layout does), and every later query batch
    reads ONLY its probed ``list_id=`` directories — scan fraction
    ~ n_probe/n_lists of the corpus, enforced at the path level rather
    than by a row filter. Raw embeddings are stored (not pre-normalized)
    so the query-time arithmetic is bit-identical to the fused path's.
    """
    import os

    import pyarrow.parquet as pq

    cent = _train_quantizer(sf_dir, n_lists, train_sample, iters)
    cent_ref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        cent_ = ray.get(cent_ref)
        m = _emb_matrix(t)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        lists = np.argmax(mn @ cent_.T, axis=1).astype(np.int64)
        return t.append_column("list_id", pa.array(lists, pa.int64()))

    T(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow"
    ).write_parquet(index_dir, partition_cols=["list_id"])

    pq.write_table(
        pa.table(
            {
                "list_id": pa.array(np.arange(len(cent)), pa.int64()),
                "centroid": pa.array(list(cent), pa.list_(pa.float64())),
            }
        ),
        os.path.join(index_dir, "centroids.parquet"),
    )
    return index_dir


def knn_ivf_indexed(
    sf_dir: str,
    index_dir: str | None = None,
    n_lists: int = 16,
    n_probe: int = 6,
    train_sample: int = 4096,
    iters: int = 10,
) -> pd.DataFrame:
    """IVF-flat ANN over the PERSISTED index: load the centroid matrix
    (driver-side, n_lists x dim — tiny), pick each query's ``n_probe``
    nearest lists, and read ONLY the union of probed ``list_id=``
    partition directories — the corpus outside those paths is never
    opened. Scoring reuses the fused path's exact arithmetic (same
    quantizer seed, same float64 normalize + matmul), so the result is
    byte-identical to ``knn_ivf`` with the same parameters — pinned by
    TestIVFIndex. With ``index_dir=None`` a default under /tmp is built
    on first use and reused after (the build-once contract)."""
    import os

    import pyarrow.parquet as pq

    if index_dir is None:
        index_dir = os.path.join(
            "/tmp",
            "bsr_ivf_index",
            f"{os.path.basename(os.path.normpath(sf_dir))}-L{n_lists}-s{train_sample}",
        )
    if not os.path.exists(os.path.join(index_dir, "centroids.parquet")):
        ivf_build_index(sf_dir, index_dir, n_lists, train_sample, iters)

    ct = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    order = np.argsort(ct["list_id"].to_numpy(zero_copy_only=False))
    cent = np.stack(
        [np.asarray(v, dtype=np.float64) for v in ct["centroid"].to_pylist()]
    )[order]

    qids, qm = _query_matrix(sf_dir)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    qprobe = np.argsort(-(qn @ cent.T), axis=1)[:, : min(n_probe, len(cent))]
    probed = sorted({int(l) for row in qprobe for l in row})
    # partition-path read: only files under the probed list_id=
    # directories are opened (read_parquet wants concrete files when
    # handed a list, so enumerate each probed partition's fragments)
    paths = [
        os.path.join(index_dir, f"list_id={l}", f)
        for l in probed
        for f in sorted(os.listdir(os.path.join(index_dir, f"list_id={l}")))
        if f.endswith(".parquet")
    ]
    ds = rd.read_parquet(paths, columns=["vec_id", "embedding"])

    ref = ray.put((qids, qn, cent, qprobe))
    _empty = pa.table(
        {"qid": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
    )

    def partial(t: pa.Table) -> pa.Table:
        """Same candidate arithmetic as the fused path: re-derive the
        list assignment from the broadcast centroids (cheaper than
        shipping list_id per row, and bit-identical by determinism)."""
        qids_, qn_, cent_, qprobe_ = ray.get(ref)
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        mask = vids >= N_QUERIES
        if not mask.any():
            return _empty
        m = _emb_matrix(t)[mask]
        vids = vids[mask]
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        lists = np.argmax(mn @ cent_.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids_)):
            cand = np.flatnonzero(np.isin(lists, qprobe_[qi]))
            if len(cand) == 0:
                continue
            sims = mn[cand] @ qn_[qi]
            k = min(K, len(cand))
            idx = np.argpartition(-sims, k - 1)[:k]
            out_q.extend([int(qids_[qi])] * len(idx))
            out_v.extend(vids[cand][idx].tolist())
            out_s.extend(sims[idx].tolist())
        if not out_q:
            return _empty
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


def embedding_near_dup_pairs(sf_dir: str, threshold: float = 0.4) -> pd.DataFrame:
    """Embedding-cosine near-duplicate PAIRS, exact (the SQL-oracle-able
    member of the embedding-dedup family; ``embedding_near_dup_lsh`` is
    its sublinear approximation):

      normalized corpus matrix broadcast once (ray.put) -> per batch,
      one (B x N) matmul of the batch's rows against the corpus ->
      emit (vec_a, vec_b, sim) where sim >= threshold and vec_a < vec_b.

    Each pair is emitted exactly once (the smaller id's batch owns it).
    O(n^2/p) compute with n-vector broadcast state — the right baseline
    up to ~10^6 vectors; past that the LSH variant bounds the scan."""
    ds = T(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    allv = ds.to_pandas().sort_values("vec_id")  # corpus matrix (small side)
    vids_all = allv["vec_id"].to_numpy(dtype=np.int64)
    m = np.stack([np.asarray(v, dtype=np.float64) for v in allv["embedding"]])
    mn_all = m / np.linalg.norm(m, axis=1, keepdims=True)
    ref = ray.put((vids_all, mn_all))

    _empty = pa.table(
        {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
    )

    def pairs(t: pa.Table) -> pa.Table:
        vids_all_, mn_all_ = ray.get(ref)
        vids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mb = _emb_matrix(t)
        mbn = mb / np.linalg.norm(mb, axis=1, keepdims=True)
        sims = mbn @ mn_all_.T  # (B, N)
        mask = (sims >= threshold) & (vids[:, None] < vids_all_[None, :])
        ii, jj = np.nonzero(mask)
        if len(ii) == 0:
            return _empty
        return pa.table(
            {
                "vec_a": pa.array(vids[ii], pa.int64()),
                "vec_b": pa.array(vids_all_[jj], pa.int64()),
                "sim": pa.array(np.round(sims[mask], 3), pa.float64()),
            }
        )

    out = ds.map_batches(pairs, batch_format="pyarrow").to_pandas()
    out = out.astype({"vec_a": "int64", "vec_b": "int64"})
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def embedding_near_dup_lsh(
    sf_dir: str, threshold: float = 0.4, n_tables: int = 24, n_planes: int = 4
) -> pd.DataFrame:
    """LSH-bucketed embedding near-dup pairs — the 10^9-vector scale
    path: random-hyperplane signatures (Charikar '02), L tables of P
    planes; only same-bucket pairs are scored.

      per batch: P-bit signature per (vector, table)
      -> explode to (table_id, bucket, vec_id, vector, signature) rows
      -> groupby(table, bucket): in-group pairwise cosine (one matmul)
      -> emit a pair only from its MINIMAL matching table (both rows
         carry the full signature vector, so the check is in-group) —
         no cross-group duplicates, no second dedup shuffle.

    The all-to-all moves L fixed-width rows per vector (dim+L floats);
    never the corpus matrix. Approximate (recall < 1 at low cosine):
    rows-only oracle; pytest pins pairs ⊆ exact and planted-dup
    recall. ``n_tables``/``n_planes`` trade scan fraction vs recall
    exactly as in ``knn_lsh``."""
    rng = np.random.default_rng(29)
    dsA = T(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # plane count is independent of corpus size; dim read from one row
    dim = len(dsA.take(1)[0]["embedding"])
    planes = rng.standard_normal((n_tables, n_planes, dim))
    pw = 1 << np.arange(n_planes, dtype=np.int64)
    pref = ray.put(planes)

    def explode(t: pa.Table) -> pa.Table:
        planes_ = ray.get(pref)
        vids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _emb_matrix(t)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sig = np.stack([(mn @ planes_[tb].T > 0) @ pw for tb in range(n_tables)], axis=1)  # (B, L)
        n = len(vids)
        return pa.table(
            {
                "tbl": pa.array(np.tile(np.arange(n_tables, dtype=np.int64), n), pa.int64()),
                "bucket": pa.array(sig.ravel(), pa.int64()),
                "vec_id": pa.array(np.repeat(vids, n_tables), pa.int64()),
                "vec": pa.array(list(np.repeat(mn, n_tables, axis=0)), pa.list_(pa.float64())),
                "sig": pa.array(list(np.repeat(sig, n_tables, axis=0)), pa.list_(pa.int64())),
            }
        )

    _empty = pd.DataFrame(
        {
            "vec_a": pd.Series([], dtype="int64"),
            "vec_b": pd.Series([], dtype="int64"),
            "sim": pd.Series([], dtype="float64"),
        }
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _empty
        tb = int(g["tbl"].iloc[0])
        vids = g["vec_id"].to_numpy(dtype=np.int64)
        order = np.argsort(vids, kind="stable")
        vids = vids[order]
        mn = np.stack([np.asarray(v) for v in g["vec"].iloc[order]])
        sig = np.stack([np.asarray(s) for s in g["sig"].iloc[order]])
        sims = mn @ mn.T
        mask = (sims >= threshold) & (vids[:, None] < vids[None, :])
        # minimal matching table: skip pairs already owned by a smaller
        # table (their buckets there are equal)
        for t2 in range(tb):
            mask &= sig[:, t2][:, None] != sig[:, t2][None, :]
        ii, jj = np.nonzero(mask)
        if len(ii) == 0:
            return _empty
        return pd.DataFrame(
            {"vec_a": vids[ii], "vec_b": vids[jj], "sim": np.round(sims[ii, jj], 3)}
        )

    out = (
        dsA.map_batches(explode, batch_format="pyarrow")
        .groupby(["tbl", "bucket"])
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    out = out.astype({"vec_a": "int64", "vec_b": "int64"})
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


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


def pca_embeddings(sf_dir: str, n_components: int = 2) -> rd.Dataset:
    """Distributed PCA: project every embedding onto the corpus's top
    principal components — the whitening / visualization / compression
    preprocessing an embedding pipeline runs at corpus scale. One pass
    of moment partials (per batch: ``X^T X`` (dim x dim), column sum,
    count — fixed-size regardless of rows, the wide-aggregate shape),
    merged on the driver into the covariance matrix; ``eigh`` of the
    dim x dim matrix is driver-local (model-sized), components are
    sign-canonicalized (largest-|loading| coordinate positive, ties to
    the lowest index) so the output is deterministic, broadcast once;
    projection is one matmul per batch, shuffle-free, Dataset out.

    Not SQL-expressible (eigendecomposition); pinned in pytest against
    a driver-local numpy PCA on the same table (projections to float
    tolerance after the same sign canonicalization)."""
    ds = T(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def moments(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        g = m.T @ m  # dim x dim
        # bucket keys the partial PRE-REDUCE: at 100-TB block counts the
        # raw per-batch partials are #blocks x dim^2 floats — too big to
        # land on the driver — so a 64-group merge folds them worker-side
        # first (any batch->bucket map works; first vec_id is stable)
        b = int(t["vec_id"][0].as_py()) & 63 if t.num_rows else 0
        return pa.table(
            {
                "bucket": pa.array([b], pa.int64()),
                "xtx": pa.array([g.ravel()], pa.list_(pa.float64())),
                "xsum": pa.array([m.sum(axis=0)], pa.list_(pa.float64())),
                "n": pa.array([len(m)], pa.int64()),
            }
        )

    def prereduce(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "xtx": [np.stack([np.asarray(v) for v in g["xtx"]]).sum(axis=0)],
                "xsum": [np.stack([np.asarray(v) for v in g["xsum"]]).sum(axis=0)],
                "n": [int(g["n"].sum())],
            }
        )

    parts = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(prereduce, batch_format="pandas")
        .to_pandas()  # <= 64 rows
    )
    n = int(parts["n"].sum())
    xsum = np.stack([np.asarray(v) for v in parts["xsum"]]).sum(axis=0)
    dim = len(xsum)
    xtx = np.stack([np.asarray(v) for v in parts["xtx"]]).sum(axis=0).reshape(dim, dim)
    mean = xsum / n
    cov = xtx / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    comps = v[:, ::-1][:, :n_components].T  # (n_components, dim), descending
    # canonical sign: the largest-|loading| coordinate (lowest index on
    # ties) is positive — eigh's sign is arbitrary and platform-dependent
    for i in range(len(comps)):
        j = np.argmax(np.abs(comps[i]))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    pref = ray.put((mean, comps))

    def project(t: pa.Table) -> pa.Table:
        mu, c = ray.get(pref)
        p = (_emb_matrix(t) - mu) @ c.T
        cols = {"vec_id": t["vec_id"]}
        for i in range(c.shape[0]):
            cols[f"pc{i + 1}"] = pa.array(p[:, i], pa.float64())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def nearest_centroid_labels(sf_dir: str) -> pd.DataFrame:
    """Nearest-centroid classification: every vector gets the label
    whose mean embedding it is most cosine-similar to — the cheap
    label-propagation / domain-tagging pass a curation pipeline runs
    with a handful of labeled anchors. Pass 1 reduces per-label (sum,
    count) partials to a |labels| x dim centroid matrix (label-bounded
    driver frame, broadcast once); pass 2 is one matmul per batch,
    argmax over ``dot / ||centroid||`` (equivalent to cosine — the
    vector's own norm is constant across labels), ties to the smallest
    label (argmax-first with label-ascending columns, mirrored by the
    oracle's ORDER BY tie-break). Rows never leave their batch: output
    is (vec_id, pred_label), computed shuffle-free."""
    ds = T(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])

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
        return pd.DataFrame({"label": [int(g["label"].iloc[0])], "centroid": [vs / n]})

    cents = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # |labels| rows only
        .sort_values("label")
    )
    labels_sorted = cents["label"].to_numpy(dtype=np.int64)
    C = np.stack([np.asarray(c) for c in cents["centroid"]])
    C = C / np.linalg.norm(C, axis=1, keepdims=True)
    cref = ray.put((labels_sorted, C))

    def classify(t: pa.Table) -> pa.Table:
        labs, cu = ray.get(cref)
        m = _emb_matrix(t)
        a = np.argmax(m @ cu.T, axis=1)  # first max = smallest label (labs ascending)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "pred_label": pa.array(labs[a], pa.int64()),
            }
        )

    out = ds.map_batches(classify, batch_format="pyarrow").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def kmeans_embeddings(sf_dir: str, k: int = 8, iters: int = 5) -> pd.DataFrame:
    """Distributed Lloyd's k-means over the full embedding corpus — the
    clustering pass a curation pipeline runs before per-cluster
    sampling / dedup (SemDeDup-style). Per iteration: centroids are
    BROADCAST (``ray.put`` once, k x dim floats — driver state is
    model-sized, never corpus-sized), assignment + per-centroid partial
    (sum, count) happen in one vectorized ``map_batches`` (argmin over
    ``-2 X @ C.T + ||C||^2``, one matmul per batch), and the reduce is
    a k-row ``groupby.map_groups`` merge — the shuffle moves k rows per
    batch, never an embedding. Exactly one executor launch per
    iteration (fixed ``iters``, no mid-loop convergence materialize —
    the lesson the round-5 PageRank/FastSV probes paid for). Init is
    deterministic: the k vectors with the smallest vec_id.

    Not SQL-expressible (iterative); pinned in pytest against a
    driver-local numpy Lloyd's with identical init and iteration count
    (identical assignments; centroids/inertia to float tolerance —
    partial-sum merge order differs from numpy's single reduction).
    Returns one row per cluster: (cluster_id, n_vecs, inertia, norm)."""
    # iterative loops re-scan their input every pass: materialize the
    # pruned read ONCE so iterations gather object-store blocks (spillable
    # at corpus scale) instead of re-decoding parquet per iteration
    ds = T(sf_dir, "embeddings", columns=["vec_id", "embedding"]).materialize()
    init = (
        ds.filter(expr=f"vec_id < {k}").to_pandas().sort_values("vec_id")
    )  # k rows only
    cent = np.stack([np.asarray(v, dtype=np.float64) for v in init["embedding"]])

    def sums_for(cref):
        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(cref)
            m = _emb_matrix(t)
            d = -2.0 * (m @ c.T) + (c * c).sum(axis=1)[None, :]
            a = np.argmin(d, axis=1)
            uniq = np.unique(a)
            sums = np.stack([m[a == u].sum(axis=0) for u in uniq])
            # inertia partial: ||x||^2 terms + the assigned -2x.c + ||c||^2
            x2 = (m * m).sum(axis=1)
            ine = np.array(
                [(x2[a == u] + d[a == u, u]).sum() for u in uniq], dtype=np.float64
            )
            ns = np.array([(a == u).sum() for u in uniq], dtype=np.int64)
            return pa.table(
                {
                    "cid": pa.array(uniq.astype(np.int64), pa.int64()),
                    "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                    "n": pa.array(ns, pa.int64()),
                    "p_inertia": pa.array(ine, pa.float64()),
                }
            )

        return partial

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        vs = np.stack([np.asarray(v) for v in g["vsum"]]).sum(axis=0)
        return pd.DataFrame(
            {
                "cid": [int(g["cid"].iloc[0])],
                "vsum": [vs],
                "n": [int(g["n"].sum())],
                "inertia": [float(g["p_inertia"].sum())],
            }
        )

    stats = None
    for _ in range(iters):
        cref = ray.put(cent)
        stats = (
            ds.map_batches(sums_for(cref), batch_format="pyarrow")
            .groupby("cid")
            .map_groups(merge, batch_format="pandas")
            .to_pandas()  # k rows only
            .sort_values("cid")
        )
        new_cent = cent.copy()  # empty clusters keep their centroid
        for cid, vsum, n in zip(stats["cid"], stats["vsum"], stats["n"]):
            new_cent[int(cid)] = np.asarray(vsum) / n
        cent = new_cent

    out = pd.DataFrame(
        {
            "cluster_id": stats["cid"].astype("int64"),
            "n_vecs": stats["n"].astype("int64"),
            "inertia": stats["inertia"].round(4),
            "centroid_norm": np.round(np.linalg.norm(cent[stats["cid"].to_numpy()], axis=1), 4),
        }
    )
    return out.sort_values("cluster_id").reset_index(drop=True)


def semantic_dedup(
    sf_dir: str,
    threshold: float = 0.95,
    n_lists: int = 16,
    train_sample: int = 4096,
    iters: int = 10,
) -> pd.DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023,
    arXiv:2303.09540): cluster the embedding space with the k-means
    coarse quantizer, then prune near-duplicates WITHIN each cluster by
    exact pairwise cosine — the modern embedding-space companion to the
    lexical MinHash/n-gram dedup family. Returns the DROP list: one row
    per pruned vector with the kept representative it duplicated and
    their true cosine.

    Scale shape: the quantizer trains on a fixed-size sample and ships
    by broadcast (same seed/arithmetic as ``knn_ivf`` — driver state is
    quantizer-sized); assignment is a shuffle-free map_batches; the ONE
    all-to-all moves (list_id, vec_id, embedding) rows — vectors, never
    raw text — partitioned by cluster id, and the per-cluster prune is
    a dense (k x k) matmul over a bounded group (group count == n_lists,
    so per-group dispatch is amortized by construction; size n_lists to
    the corpus so clusters stay ~10^4-10^5 vectors, and sub-bucket any
    mega-cluster the same way ``corpus.loser_keys`` buckets hot keys).
    Within a cluster the keep rule is deterministic and order-free:
    scan vec_id ascending, drop a vector iff some ALREADY-KEPT smaller
    id sits at cosine >= threshold (the canonical representative is the
    smallest id of its near-dup group, matching ``near_dup_clusters``'
    min-label convention). Like all clustering-blocked dedup, recall is
    approximate (cross-cluster dups survive); every emitted drop is
    exact-verified by construction — pytest pins soundness against the
    all-pairs frame and recall on planted duplicates."""
    cent = _train_quantizer(sf_dir, n_lists, train_sample, iters)
    cent_ref = ray.put(cent)

    ds = T(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def assign(t: pa.Table) -> pa.Table:
        cent_ = ray.get(cent_ref)
        m = _emb_matrix(t)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        lists = np.argmax(mn @ cent_.T, axis=1).astype(np.int64)
        return pa.table(
            {
                "list_id": pa.array(lists, pa.int64()),
                "vec_id": t["vec_id"],
                "embedding": t["embedding"],
            }
        )

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        o = np.argsort(g["vec_id"].to_numpy(dtype=np.int64))
        vids = g["vec_id"].to_numpy(dtype=np.int64)[o]
        m = np.stack([np.asarray(v, dtype=np.float64) for v in g["embedding"].iloc[o]])
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = mn @ mn.T
        kept_mask = np.ones(len(vids), dtype=bool)
        out_v, out_k, out_s = [], [], []
        for j in range(1, len(vids)):
            prior = sims[j, :j][kept_mask[:j]]
            if len(prior) and prior.max() >= threshold:
                kept_ids = vids[:j][kept_mask[:j]]
                i = int(np.argmax(prior))
                kept_mask[j] = False
                out_v.append(int(vids[j]))
                out_k.append(int(kept_ids[i]))
                out_s.append(float(prior[i]))
        return pd.DataFrame(
            {
                "vec_id": pd.Series(out_v, dtype="int64"),
                "kept_id": pd.Series(out_k, dtype="int64"),
                "sim": pd.Series(np.round(out_s, 3), dtype="float64"),
            }
        )

    out = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("list_id")
        .map_groups(prune, batch_format="pandas")
        .to_pandas()
    )
    if "vec_id" not in out.columns:  # zero drops: empty Datasets lose the schema
        out = pd.DataFrame(
            {
                "vec_id": pd.Series([], dtype="int64"),
                "kept_id": pd.Series([], dtype="int64"),
                "sim": pd.Series([], dtype="float64"),
            }
        )
    return out.sort_values("vec_id").reset_index(drop=True)


def _train_pq(
    X: np.ndarray, m_sub: int, n_codes: int, iters: int, seed: int = 47
) -> np.ndarray:
    """Product-quantizer codebooks (Jegou et al. TPAMI 2011): plain
    k-means per disjoint subspace of the NORMALIZED training sample.
    Returns (m_sub, n_codes, dim/m_sub) float64. Driver-side like
    ``_train_quantizer`` — sized by the sample, not the corpus."""
    n, dim = X.shape
    assert dim % m_sub == 0, f"dim {dim} not divisible by m_sub {m_sub}"
    ds = dim // m_sub
    k = min(n_codes, n)
    rng = np.random.default_rng(seed)
    books = np.empty((m_sub, k, ds), dtype=np.float64)
    for m in range(m_sub):
        sub = X[:, m * ds : (m + 1) * ds]
        cent = sub[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(iters):
            # argmin ||x-c||^2 == argmax (x.c - ||c||^2/2), one matmul
            score = sub @ cent.T - 0.5 * (cent * cent).sum(axis=1)
            a = np.argmax(score, axis=1)
            for c in range(k):
                rows = sub[a == c]
                if len(rows):
                    cent[c] = rows.mean(axis=0)
        books[m] = cent
    return books


def _pq_encode(mn: np.ndarray, books: np.ndarray) -> np.ndarray:
    """uint8 PQ codes (n, m_sub) of normalized rows ``mn`` — one matmul
    per subspace, no per-row python."""
    m_sub, _, ds = books.shape
    codes = np.empty((len(mn), m_sub), dtype=np.uint8)
    for m in range(m_sub):
        sub = mn[:, m * ds : (m + 1) * ds]
        score = sub @ books[m].T - 0.5 * (books[m] * books[m]).sum(axis=1)
        codes[:, m] = np.argmax(score, axis=1)
    return codes


def knn_ivfpq(
    sf_dir: str,
    n_lists: int = 16,
    n_probe: int = 6,
    m_sub: int = 8,
    n_codes: int = 64,
    rerank: int = 32,
    train_sample: int = 4096,
    iters: int = 10,
) -> pd.DataFrame:
    """IVF-PQ ANN — the compressed-residence scale path (the FAISS
    recipe: coarse inverted lists + product-quantized codes + ADC
    scoring + exact rerank), completing the ANN ladder
    brute-force -> LSH -> IVF-flat -> IVF-PQ.

    Why it exists at 100 TB: IVF-flat still touches the full float
    vectors of every probed list (~n_probe/n_lists of the corpus bytes
    per query batch). PQ shrinks each vector to ``m_sub`` uint8 codes
    (64-dim float32 = 256 B -> 8 B, 32x), so the probe scan reads codes
    only and reconstructs NOTHING: per query, an asymmetric-distance
    lookup table LUT[m, c] = q_sub_m . codebook[m, c] is built once on
    the driver ((n_queries, m_sub, n_codes) floats, corpus-independent)
    and an estimated sim is a (n_cand, m_sub) uint8 gather + row sum.
    The top ``rerank`` candidates per (query, batch) by ADC estimate
    are then scored with TRUE cosine — so, like ``knn_ivf``, every
    returned sim is exact and only recall is approximate (rows-only op;
    pytest pins recall vs ``knn_cosine`` and per-row sim exactness).

    Scale shape: quantizer + codebooks + LUTs broadcast once
    (``ray.put``); corpus pass is one map_batches (assign list, encode
    codes, ADC-score probed candidates, rerank); per-batch partial
    top-k rides the same tiny (qid, vec_id, sim) shuffle as the other
    knn ops. In a persisted deployment the codes table (vec_id, list_id,
    codes) IS the index — 8 B/vector makes a 10^10-vector index fit
    ~80 GB, object-store-resident; this one-shot path fuses build and
    probe exactly like ``knn_ivf`` vs ``ivf_build_index``."""
    qids, qm = _query_matrix(sf_dir)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    cent = _train_quantizer(sf_dir, n_lists, train_sample, iters)
    sample = (
        T(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr=f"vec_id >= {N_QUERIES}")
        .limit(train_sample)
        .to_pandas()  # quantizer-sized, not corpus-sized
    )
    X = np.stack([np.asarray(v, dtype=np.float64) for v in sample["embedding"]])
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    books = _train_pq(X, m_sub, n_codes, iters)

    dim = qn.shape[1]
    ds_ = dim // m_sub
    # per-query ADC lookup tables: (n_queries, m_sub, n_codes)
    lut = np.einsum("qmd,mcd->qmc", qn.reshape(len(qn), m_sub, ds_), books)
    qprobe = np.argsort(-(qn @ cent.T), axis=1)[:, : min(n_probe, len(cent))]
    ref = ray.put((qids, qn, cent, books, lut, qprobe))

    ds = T(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    _empty = pa.table(
        {"qid": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
    )

    def partial(t: pa.Table) -> pa.Table:
        qids_, qn_, cent_, books_, lut_, qprobe_ = ray.get(ref)
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        mask = vids >= N_QUERIES
        if not mask.any():
            return _empty
        m = _emb_matrix(t)[mask]
        vids = vids[mask]
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        lists = np.argmax(mn @ cent_.T, axis=1)
        codes = _pq_encode(mn, books_)
        msub = books_.shape[0]
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids_)):
            cand = np.flatnonzero(np.isin(lists, qprobe_[qi]))
            if len(cand) == 0:
                continue
            # ADC estimate: uint8 gather into the query's LUT + row sum
            est = lut_[qi][np.arange(msub)[None, :], codes[cand]].sum(axis=1)
            r = min(rerank, len(cand))
            shortlist = cand[np.argpartition(-est, r - 1)[:r]]
            sims = mn[shortlist] @ qn_[qi]  # TRUE cosine on the shortlist only
            k = min(K, len(shortlist))
            idx = np.argpartition(-sims, k - 1)[:k]
            out_q.extend([int(qids_[qi])] * len(idx))
            out_v.extend(vids[shortlist][idx].tolist())
            out_s.extend(sims[idx].tolist())
        if not out_q:
            return _empty
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


def ivfpq_build_index(
    sf_dir: str,
    index_dir: str,
    n_lists: int = 16,
    m_sub: int = 8,
    n_codes: int = 64,
    train_sample: int = 4096,
    iters: int = 10,
) -> str:
    """Build the PERSISTED IVF-PQ index: one distributed
    assign-and-encode pass, written as list-partitioned parquet
    (``index_dir/list_id=N/part-*.parquet``) holding ONLY
    ``(vec_id, lid, codes)`` — ``codes`` is a fixed-size-list<uint8>
    of ``m_sub`` entries, so the persisted probe-scan residence is
    ~``m_sub`` bytes/vector (the 32x story the fused ``knn_ivfpq``
    docstring tells, made real on disk: a 10^10-vector index is
    ~80 GB of codes, object-store/page-cache resident, while the raw
    float vectors stay in the source table and are touched only by
    the rerank's row-group-pruned point gather). Quantizer and PQ
    codebooks are trained on the same fixed-size sample with the same
    seeds as the fused path and stored beside the partitions
    (``centroids.parquet`` / ``books.parquet`` — both tiny), so a
    query session never re-trains."""
    import os

    import pyarrow.parquet as pq

    cent = _train_quantizer(sf_dir, n_lists, train_sample, iters)
    sample = (
        T(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .filter(expr=f"vec_id >= {N_QUERIES}")
        .limit(train_sample)
        .to_pandas()  # quantizer-sized, not corpus-sized
    )
    X = np.stack([np.asarray(v, dtype=np.float64) for v in sample["embedding"]])
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    books = _train_pq(X, m_sub, n_codes, iters)
    ref = ray.put((cent, books))

    def assign_encode(t: pa.Table) -> pa.Table:
        cent_, books_ = ray.get(ref)
        m = _emb_matrix(t)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        lists = np.argmax(mn @ cent_.T, axis=1).astype(np.int64)
        codes = _pq_encode(mn, books_)
        codes_col = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.ravel(), pa.uint8()), books_.shape[0]
        )
        # lid duplicates the partition key INSIDE the file: the probe
        # scan reads codes without embeddings, so it cannot re-derive
        # the assignment the way knn_ivf_indexed does
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "lid": pa.array(lists, pa.int64()),
                "codes": codes_col,
                "list_id": pa.array(lists, pa.int64()),
            }
        )

    T(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
        assign_encode, batch_format="pyarrow"
    ).write_parquet(index_dir, partition_cols=["list_id"])

    pq.write_table(
        pa.table(
            {
                "list_id": pa.array(np.arange(len(cent)), pa.int64()),
                "centroid": pa.array(list(cent), pa.list_(pa.float64())),
            }
        ),
        os.path.join(index_dir, "centroids.parquet"),
    )
    m_sub_, k_, ds_ = books.shape
    pq.write_table(
        pa.table(
            {
                "sub": pa.array(np.repeat(np.arange(m_sub_), k_), pa.int64()),
                "code": pa.array(np.tile(np.arange(k_), m_sub_), pa.int64()),
                "vals": pa.array(list(books.reshape(m_sub_ * k_, ds_)), pa.list_(pa.float64())),
            }
        ),
        os.path.join(index_dir, "books.parquet"),
    )
    return index_dir


def knn_ivfpq_indexed(
    sf_dir: str,
    index_dir: str | None = None,
    n_lists: int = 16,
    n_probe: int = 6,
    m_sub: int = 8,
    n_codes: int = 64,
    rerank: int = 64,
    train_sample: int = 4096,
    iters: int = 10,
    max_shortlist_rows: int = 10_000_000,
) -> pd.DataFrame:
    """IVF-PQ ANN over the PERSISTED codes index — the repeated-query
    serving path (FAISS on-disk recipe): load centroids + codebooks
    (tiny, driver-side), build per-query ADC lookup tables, scan ONLY
    the probed ``list_id=`` partitions' uint8 codes (never the float
    vectors), keep the global top-``rerank`` candidates per query by
    ADC estimate (exact: per-batch per-query top-``rerank`` partials
    are a superset of the global top — the same combiner argument as
    ``knn_cosine``), then re-score the shortlist with TRUE cosine via
    ONE row-group-stats-pruned point gather from the source embeddings
    table (shortlist is n_queries x rerank rows — bounded by the query
    load, not the corpus). ``rerank`` defaults to 2x the fused path's:
    the fused op reranks 32 per (query, BATCH) while this one keeps a
    single GLOBAL shortlist per query, so a larger budget costs one
    tiny frame, not a per-batch tax, and restores the fused recall.
    Returned sims are exact; only recall is
    approximate (rows-only; pytest pins recall vs ``knn_cosine``,
    per-row sim exactness, build-once reuse, and the codes-only index
    layout). ``index_dir=None`` builds a default under /tmp on first
    use and reuses it after (the build-once contract)."""
    import os

    import pyarrow.parquet as pq

    from .common import bounded_driver_frame

    if index_dir is None:
        index_dir = os.path.join(
            "/tmp",
            "bsr_ivfpq_index",
            f"{os.path.basename(os.path.normpath(sf_dir))}"
            f"-L{n_lists}-m{m_sub}-c{n_codes}-s{train_sample}",
        )
    if not os.path.exists(os.path.join(index_dir, "books.parquet")):
        ivfpq_build_index(sf_dir, index_dir, n_lists, m_sub, n_codes, train_sample, iters)

    ct = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    order = np.argsort(ct["list_id"].to_numpy(zero_copy_only=False))
    cent = np.stack(
        [np.asarray(v, dtype=np.float64) for v in ct["centroid"].to_pylist()]
    )[order]
    bt = pq.read_table(os.path.join(index_dir, "books.parquet"))
    sub = bt["sub"].to_numpy(zero_copy_only=False)
    code = bt["code"].to_numpy(zero_copy_only=False)
    vals = np.stack([np.asarray(v, dtype=np.float64) for v in bt["vals"].to_pylist()])
    m_sub_, k_ = int(sub.max()) + 1, int(code.max()) + 1
    books = np.empty((m_sub_, k_, vals.shape[1]), dtype=np.float64)
    books[sub, code] = vals

    qids, qm = _query_matrix(sf_dir)
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    dim = qn.shape[1]
    lut = np.einsum("qmd,mcd->qmc", qn.reshape(len(qn), m_sub_, dim // m_sub_), books)
    qprobe = np.argsort(-(qn @ cent.T), axis=1)[:, : min(n_probe, len(cent))]
    probed = sorted({int(l) for row in qprobe for l in row})
    paths = [
        os.path.join(index_dir, f"list_id={l}", f)
        for l in probed
        for f in sorted(os.listdir(os.path.join(index_dir, f"list_id={l}")))
        if f.endswith(".parquet")
    ]
    ds = rd.read_parquet(paths, columns=["vec_id", "lid", "codes"])

    ref = ray.put((qids, lut, qprobe))
    _empty = pa.table(
        {"qid": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "est": pa.array([], pa.float64())}
    )

    def partial(t: pa.Table) -> pa.Table:
        qids_, lut_, qprobe_ = ray.get(ref)
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        lid = t["lid"].to_numpy(zero_copy_only=False)
        mask = vids >= N_QUERIES
        if not mask.any():
            return _empty
        codes = (
            t["codes"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        ).reshape(len(t), -1)[mask]
        vids, lid = vids[mask], lid[mask]
        msub = codes.shape[1]
        out_q, out_v, out_e = [], [], []
        for qi in range(len(qids_)):
            cand = np.flatnonzero(np.isin(lid, qprobe_[qi]))
            if len(cand) == 0:
                continue
            est = lut_[qi][np.arange(msub)[None, :], codes[cand]].sum(axis=1)
            r = min(rerank, len(cand))
            # deterministic under est ties: (-est, vec_id) lexsort
            top = np.lexsort((vids[cand], -est))[:r]
            out_q.extend([int(qids_[qi])] * r)
            out_v.extend(vids[cand][top].tolist())
            out_e.extend(est[top].tolist())
        if not out_q:
            return _empty
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "est": pa.array(out_e, pa.float64()),
            }
        )

    def merge_topr(g: pd.DataFrame) -> pd.DataFrame:
        order_ = np.lexsort((g["vec_id"].to_numpy(), -g["est"].to_numpy()))
        return g.iloc[order_[:rerank]]

    shortlist = bounded_driver_frame(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(merge_topr, batch_format="pandas"),
        "knn_ivfpq_indexed ADC shortlist (n_queries x rerank rows)",
        max_shortlist_rows,
    )

    # exact rerank: ONE point gather of the shortlist's float vectors,
    # filter pushed to parquet row-group stats (vec_id-ordered table)
    @ray.remote
    def gather(path: str, ids: list) -> pa.Table:
        import pyarrow.dataset as pads

        return pads.dataset(path).to_table(
            columns=["vec_id", "embedding"],
            filter=pads.field("vec_id").isin(ids),
        )

    ids = sorted(set(shortlist["vec_id"].tolist()))
    vt = ray.get(gather.remote(os.path.join(sf_dir, "embeddings.parquet"), ids))
    vmat = _emb_matrix(vt)
    vmat = vmat / np.linalg.norm(vmat, axis=1, keepdims=True)
    vid_sorted = vt["vec_id"].to_numpy(zero_copy_only=False)
    vorder = np.argsort(vid_sorted)
    vid_sorted, vmat = vid_sorted[vorder], vmat[vorder]

    rows_q, rows_v, rows_s = [], [], []
    for qi in range(len(qids)):
        cand = shortlist.loc[shortlist["qid"] == int(qids[qi]), "vec_id"].to_numpy()
        if len(cand) == 0:
            continue
        sims = vmat[np.searchsorted(vid_sorted, cand)] @ qn[qi]
        k = min(K, len(cand))
        top = np.lexsort((cand, -sims))[:k]
        rows_q.extend([int(qids[qi])] * k)
        rows_v.extend(cand[top].tolist())
        rows_s.extend(sims[top].tolist())
    out = pd.DataFrame({"qid": rows_q, "vec_id": rows_v, "sim": np.round(rows_s, 3)})
    return out.sort_values(["qid", "sim", "vec_id"], ascending=[True, False, True]).reset_index(drop=True)


def srp_project(sf_dir: str, d_out: int = 16) -> rd.Dataset:
    """Johnson-Lindenstrauss dimensionality reduction by deterministic
    signed random projection: every embedding maps to ``d_out`` dims
    via ``y = V @ S / sqrt(d_out)`` where ``S[i, j] in {-1, +1}`` comes
    from ``hash64(f"{i}:{j}")`` — no RNG state, so any worker, session
    or cluster derives the SAME matrix (the sampling family's
    integer-ring discipline applied to projections). The cheap
    preprocessing step before brute/IVF search or clustering when the
    input dimension, not the corpus, is the bottleneck: JL preserves
    pairwise distances within (1 +- eps) at d_out = O(ln n / eps^2),
    and sign matrices satisfy the lemma like Gaussians (Achlioptas
    2003, JCSS — database-friendly random projections).

    Scale shape: the sign matrix is d_in x d_out (input-dim-bounded,
    NEVER corpus-bounded) — generated once on the driver, ``ray.put``
    once, one zero-copy matmul per batch; shuffle-free end to end.
    Output (vec_id, proj list<float64>) stays a distributed Dataset."""
    from ..functions.urls import hash64

    ds = T(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    head = ds.take_batch(1, batch_format="pyarrow")
    d_in = len(head["embedding"][0])

    idx = np.array(
        [f"{i}:{j}" for i in range(d_in) for j in range(d_out)], dtype=object
    )
    S = np.where((hash64(idx) & np.uint64(1)).astype(bool), 1.0, -1.0).reshape(
        d_in, d_out
    ) / np.sqrt(float(d_out))
    sref = ray.put(S)

    def project(t: pa.Table) -> pa.Table:
        S_ = ray.get(sref)
        v = _emb_matrix(t)
        y = v @ S_
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "proj": pa.array(list(y), pa.list_(pa.float64())),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def srp_project_rows(sf_dir: str, d_out: int = 16) -> rd.Dataset:
    """:func:`srp_project` exploded to scalar (vec_id, j, x) rows — the
    registered/gate-facing view: correctness harnesses sort and hash
    column VALUES, which a list<float> column defeats; one row per
    projected coordinate carries the identical content in hashable
    form. The list-column Dataset remains the library API."""

    def explode(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].combine_chunks().to_numpy(zero_copy_only=False)
        proj = t["proj"].combine_chunks()
        flat = proj.flatten().to_numpy(zero_copy_only=False)
        d = np.diff(proj.offsets.to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, d), pa.int64()),
                "j": pa.array(
                    np.concatenate([np.arange(k, dtype=np.int64) for k in d])
                    if len(d)
                    else np.array([], np.int64),
                    pa.int64(),
                ),
                "x": pa.array(np.round(flat, 9), pa.float64()),
            }
        )

    return srp_project(sf_dir, d_out=d_out).map_batches(explode, batch_format="pyarrow")
