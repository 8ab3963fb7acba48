"""Deduplication pipelines — exact, first-per-key, MinHash-LSH, SimHash,
n-gram Jaccard. The scale pattern for every one: hash/signature computed
vectorized per batch, then the dedup decision made inside the hash-owned
partition (the shuffle IS the dedup router — same design as the engine's
sharded seen-set, SURVEY.md §2.6 D1)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions import text as tx
from ..functions.urls import hash64
from .common import T, bounded_driver_frame, n_shuffle_buckets

_MINHASH_PERMS = 64
_LSH_BANDS = 16  # 16 bands x 4 rows

# Driver-collection cap for the duplicate-bounded frames these pipelines
# pull to the driver (candidate pairs, kept shingle keys): ~24 B/row, so
# the default bounds the driver pull at ~1 GB. Past it,
# bounded_driver_frame raises with the parquet-spill escape hatch.
_MAX_DRIVER_ROWS = 50_000_000

# byte-wise popcount lookup (numpy<2 has no bitwise_count)
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 ndarray (any shape) -> int64."""
    b = np.ascontiguousarray(x).view(np.uint8).reshape(x.shape + (8,))
    return _POP8[b].sum(axis=-1).astype(np.int64)


def exact_dedup(sf_dir: str) -> rd.Dataset:
    """Exact dedup by normalized-text fingerprint: hash per batch ->
    groupby(hash) -> native Min aggregate keeps the min doc_id per group
    (vectorized — no per-group python). The fingerprint ships as the
    int64 bit pattern of the uint64 hash (equality-only key; keeps every
    shuffle column int64-safe for Arrow inference)."""
    from ray.data.aggregate import Min

    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def add_fp(t: pa.Table) -> pa.Table:
        fp = tx.fingerprint64(t["text"].to_pylist()).view(np.int64)
        return t.append_column("fp", pa.array(fp, pa.int64())).select(["doc_id", "fp"])

    return (
        ds.map_batches(add_fp, batch_format="pyarrow")
        .groupby("fp")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"])
    )


def first_per_key(sf_dir: str) -> pd.DataFrame:
    """First-wins dedup per (lang, source) — the reorg-walk first-wins
    dedup analog (crawler/blocks.go:133,146-155: first block per height
    wins). Native Min/Count aggregates — no per-group python."""
    from ray.data.aggregate import Count, Min

    ds = T(sf_dir, "documents", columns=["doc_id", "lang", "source"])
    out = (
        ds.groupby(["lang", "source"])
        .aggregate(Min("doc_id", alias_name="first_doc"), Count(alias_name="n_docs"))
        .to_pandas()
    )
    out["first_doc"] = out["first_doc"].astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values(["lang", "source"]).reset_index(drop=True)[["lang", "source", "first_doc", "n_docs"]]


def _signatures(t: pa.Table, a: np.ndarray, b: np.ndarray, k: int = 5) -> tuple[list, np.ndarray, np.ndarray]:
    texts = t["text"].to_pylist()
    sigs = np.empty((len(texts), len(a)), dtype=np.uint64)
    nonempty = np.zeros(len(texts), dtype=bool)
    for i, x in enumerate(texts):
        sh = tx.shingles(x, k=k)
        nonempty[i] = bool(sh)
        sigs[i] = tx.minhash_signature(hash64(sh) if sh else np.array([], np.uint64), a, b)
    return texts, sigs, nonempty


def _band_hashes(sigs: np.ndarray) -> np.ndarray:
    """(n, _LSH_BANDS) int64 band-bucket keys from (n, _MINHASH_PERMS)
    uint64 signatures — FNV over each band's rows. Shared by the
    one-shot pair miner and the persisted-index build/probe so the two
    can never drift (drift = an index the probe silently misses in)."""
    rows_per_band = _MINHASH_PERMS // _LSH_BANDS
    n = len(sigs)
    bh = np.zeros((n, _LSH_BANDS), dtype=np.uint64)
    for bi in range(_LSH_BANDS):
        seg = sigs[:, bi * rows_per_band : (bi + 1) * rows_per_band]
        acc = np.full(n, np.uint64(1469598103934665603), dtype=np.uint64)
        for c in range(rows_per_band):
            acc = (acc ^ seg[:, c]) * np.uint64(1099511628211)
        bh[:, bi] = acc
    return bh.view(np.int64)


def minhash_lsh_pairs(
    sf_dir: str,
    threshold: float = 0.5,
    n_buckets: int | None = None,
    max_driver_rows: int = _MAX_DRIVER_ROWS,
) -> pd.DataFrame:
    """MinHash + LSH near-duplicate pairs over the ``documents`` table
    (the query-surface entry; the operator body is
    ``minhash_lsh_pairs_ds``, which ``corpus_prep``'s fuzzy-dedup stage
    reuses over the crawl-log stream)."""
    return minhash_lsh_pairs_ds(
        T(sf_dir, "documents", columns=["doc_id", "text"]),
        threshold=threshold,
        n_buckets=n_buckets,
        max_driver_rows=max_driver_rows,
    )


def minhash_lsh_pairs_ds(
    ds: rd.Dataset,
    threshold: float = 0.5,
    n_buckets: int | None = None,
    max_driver_rows: int = _MAX_DRIVER_ROWS,
) -> pd.DataFrame:
    """MinHash + LSH near-duplicate pairs over any (doc_id int64,
    text string) Dataset:

      shingle -> minhash signature (per batch, vectorized)
      -> explode to (band_id, band_hash, doc_id) rows
      -> groupby(band) => candidate pairs (only same-bucket docs meet)
      -> verify true shingle-set Jaccard >= threshold.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, rounded 4.
    The groupby is the only all-to-all and it moves 16 small rows per
    document, never the text. ``n_buckets`` (default: scaled to cluster
    CPUs, see ``n_shuffle_buckets``) is the dispatch-amortization group
    count for both shuffles; ``max_driver_rows`` caps the candidate-pair
    frame's driver pull (``bounded_driver_frame``)."""
    a, b = tx.minhash_params(_MINHASH_PERMS)
    B = n_buckets or n_shuffle_buckets()

    def bands(t: pa.Table) -> pa.Table:
        _, sigs, nonempty = _signatures(t, a, b)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        # zero-shingle (empty/whitespace) docs emit NO band rows: their
        # constant empty-set signature would otherwise collide in every
        # band, and the exact-Jaccard semantics (both the SQL oracle and
        # ngram_jaccard_pairs) define no pairs for shingle-less docs.
        doc_ids, sigs = doc_ids[nonempty], sigs[nonempty]
        band_ids = np.repeat(np.arange(_LSH_BANDS, dtype=np.int64)[None, :], len(doc_ids), axis=0).ravel()
        # band_hash ships as the int64 BIT PATTERN of the uint64 bucket
        # key: every shuffle column stays in int64 range so no pandas/
        # python round-trip can overflow Arrow int inference into the
        # pickled-object fallback (equality-only key, order irrelevant).
        bh64 = _band_hashes(sigs).ravel()
        return pa.table(
            {
                "band_id": pa.array(band_ids, pa.int64()),
                "band_hash": pa.array(bh64, pa.int64()),
                "doc_id": pa.array(np.repeat(doc_ids, _LSH_BANDS), pa.int64()),
                # shuffle key: bucket of the band hash — co-locates every
                # (band, hash) group while keeping the group COUNT at B
                # (per-group dispatch amortization, same as ngram's sb)
                "cb": pa.array((bh64 % B).astype(np.int64), pa.int64()),
            }
        )

    MAX_BUCKET = 256  # hot-bucket guard: a bucket of n docs emits O(n^2)
    # pairs; past this bound (boilerplate-heavy corpora) we link each doc
    # to the bucket's min id only (star pattern) — transitively complete
    # for true duplicate CLUSTERS, and it caps the skew explosion the
    # same way the engine caps mega-host share (SURVEY.md §4 skew row)

    _empty_cand = pd.DataFrame(
        {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
    )

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        """Pair emission for every (band_id, band_hash) run inside ONE
        hash bucket of band hashes — a numpy run-scan over the lexsorted
        block (each doc appears once per band, so ids within a run are
        distinct and ascending => doc_a < doc_b and star root = min)."""
        if len(g) < 2:
            return _empty_cand
        bid = g["band_id"].to_numpy(dtype=np.int64)
        bh_ = g["band_hash"].to_numpy(dtype=np.int64)
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((ids, bh_, bid))
        bid, bh_, ids = bid[order], bh_[order], ids[order]
        new = np.concatenate(([True], (bid[1:] != bid[:-1]) | (bh_[1:] != bh_[:-1]), [True]))
        bounds = np.flatnonzero(new)
        outs_a, outs_b = [], []
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            m = int(b1 - b0)
            if m < 2:
                continue
            run = ids[b0:b1]
            if m > MAX_BUCKET:
                outs_a.append(np.full(m - 1, run[0], dtype=np.int64))
                outs_b.append(run[1:])
            else:
                ii, jj = np.triu_indices(m, k=1)
                outs_a.append(run[ii])
                outs_b.append(run[jj])
        if not outs_a:
            return _empty_cand
        return pd.DataFrame(
            {"doc_a": np.concatenate(outs_a), "doc_b": np.concatenate(outs_b)}
        )

    cand = bounded_driver_frame(
        ds.map_batches(bands, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(candidates, batch_format="pandas"),
        "minhash_lsh_pairs candidate-pair frame",
        max_driver_rows,
    )  # candidate PAIRS only (ids, no text) — duplicate-bounded, guarded
    if len(cand) == 0:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64"), "jaccard": pd.Series([], dtype="float64")}
        )
    cand = cand.drop_duplicates().reset_index(drop=True)

    # --- distributed Jaccard verify -----------------------------------
    # The documents table is never materialized: the candidate doc-id set
    # and the pair list are broadcast ONCE (ray.put); each batch computes
    # shingle-hash sets only for its candidate rows and emits one
    # (pair_idx, doc_id, shingle-hashes) row per pair membership; a
    # groupby(pair_idx) then scores each pair from its two endpoint sets.
    # The only all-to-all moves candidate shingle-hash arrays — never the
    # text, never non-candidate docs.
    pair_a = cand["doc_a"].to_numpy(dtype=np.int64)
    pair_b = cand["doc_b"].to_numpy(dtype=np.int64)
    need = np.unique(np.concatenate([pair_a, pair_b]))
    # endpoint index: doc_id -> pair ids, as two parallel sorted arrays
    ep_doc = np.concatenate([pair_a, pair_b])
    ep_pair = np.concatenate([np.arange(len(pair_a)), np.arange(len(pair_b))]).astype(np.int64)
    order = np.argsort(ep_doc, kind="stable")
    bcast = ray.put((pair_a, pair_b, need, ep_doc[order], ep_pair[order]))

    # shingle hashes travel as list<int64> BIT VIEWS of the uint64 hash
    # values: Arrow list columns that round-trip pandas/python inside the
    # groupby would otherwise overflow int64 inference (values > 2^63)
    # and silently degrade the whole all-to-all to pickled python objects
    # (observed live in round 2). Set intersection is equality-based, so
    # the bit-pattern reinterpretation changes nothing.
    _empty_sh = pa.table(
        {
            "pair_idx": pa.array([], pa.int64()),
            "pb": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "sh": pa.array([], pa.list_(pa.int64())),
        }
    )

    def shingle_rows(t: pa.Table) -> pa.Table:
        _, _, need_, epd_, epp_ = ray.get(bcast)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(need_, ids), max(len(need_) - 1, 0))
        m = need_[pos] == ids if len(need_) else np.zeros(len(ids), dtype=bool)
        if not m.any():
            return _empty_sh
        sel = np.flatnonzero(m)
        texts = t["text"].take(pa.array(sel)).to_pylist()
        out_pair, out_doc, out_sh = [], [], []
        for k, i in enumerate(sel):
            d = int(ids[i])
            s = tx.shingles(texts[k], k=5)
            hv = np.unique(hash64(s)).view(np.int64) if s else np.array([], dtype=np.int64)
            lo = int(np.searchsorted(epd_, d, side="left"))
            hi = int(np.searchsorted(epd_, d, side="right"))
            for p in epp_[lo:hi]:
                out_pair.append(int(p))
                out_doc.append(d)
                out_sh.append(hv)
        # ListArray built from one flat int64 buffer + offsets — no
        # python list materialization of the hash values
        lens = np.fromiter((len(x) for x in out_sh), dtype=np.int64, count=len(out_sh))
        offsets = np.zeros(len(out_sh) + 1, dtype=np.int32)
        np.cumsum(lens, out=offsets[1:])
        flat = np.concatenate(out_sh) if out_sh else np.array([], dtype=np.int64)
        sh_col = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(flat, pa.int64()))
        out_pair_np = np.asarray(out_pair, dtype=np.int64)
        return pa.table(
            {
                "pair_idx": pa.array(out_pair_np, pa.int64()),
                # shuffle key: pair-index bucket — co-locates both
                # endpoints of every pair while keeping the group count
                # at B (per-group dispatch amortization; at scale the
                # pair count is millions, not the bucket count)
                "pb": pa.array(out_pair_np % B, pa.int64()),
                "doc_id": pa.array(out_doc, pa.int64()),
                "sh": sh_col,
            }
        )

    def score_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Score every pair inside ONE pair-index bucket: endpoint sets
        keyed by (pair, doc), each pair intersected via sorted-array
        searchsorted (sets are np.unique'd at build time)."""
        pair_a_, pair_b_, _, _, _ = ray.get(bcast)
        pid_all = g["pair_idx"].to_numpy(dtype=np.int64)
        doc_all = g["doc_id"].to_numpy(dtype=np.int64)
        sh_all = list(g["sh"])
        order = np.argsort(pid_all, kind="stable")
        bounds = np.flatnonzero(
            np.concatenate(([True], pid_all[order][1:] != pid_all[order][:-1], [True]))
        )
        out_a, out_b, out_j = [], [], []
        empty = np.array([], dtype=np.int64)
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            rows = order[b0:b1]
            pid = int(pid_all[rows[0]])
            a, b = int(pair_a_[pid]), int(pair_b_[pid])
            sa = sb = empty
            for i in rows:
                d = int(doc_all[i])
                v = np.asarray(sh_all[i], dtype=np.int64)
                if d == a:
                    sa = v
                if d == b:
                    sb = v
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            # no-shingles docs never reach here (no band rows); a
            # defensive empty endpoint scores 0.0 — the oracle's
            # no-shingles-no-pairs semantics
            out_a.append(a)
            out_b.append(b)
            out_j.append(float(np.round(inter / union if union else 0.0, 4)))
        return pd.DataFrame(
            {
                "doc_a": np.asarray(out_a, dtype=np.int64),
                "doc_b": np.asarray(out_b, dtype=np.int64),
                "jaccard": np.asarray(out_j, dtype=np.float64),
            }
        )

    out = (
        ds.map_batches(shingle_rows, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(score_pairs, batch_format="pandas")
        .to_pandas()  # verified-pair frame (3 columns, <= |candidates| rows)
    )
    out = out[out["jaccard"] >= threshold].astype({"doc_a": "int64", "doc_b": "int64"})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def ngram_jaccard_pairs(
    sf_dir: str,
    threshold: float = 0.5,
    k: int = 5,
    df_ceiling: int = 256,
    n_buckets: int | None = None,
    max_driver_rows: int = _MAX_DRIVER_ROWS,
) -> pd.DataFrame:
    """EXACT n-gram Jaccard near-duplicate pairs via a distributed
    inverted index (the SQL-oracle-able member of the near-dup family;
    minhash_lsh_pairs is its sublinear approximation):

      per batch: distinct k-shingle hashes per doc -> (sh, doc_id, n_sh)
      (ONE shingling pass, materialized — both the df pass and the pair
      pass consume the same dataset)
      -> groupby(sh).Count: document frequency; keep 2 <= df <= ceiling
      -> groupby(sh): co-occurring docs -> (doc_a, doc_b, n_a, n_b) rows
      -> groupby(pair): count = |A∩B over kept shingles|
      -> jaccard = count / (n_a + n_b - count), filter >= threshold.

    Both shuffles move fixed-width id rows, never text. Docs with zero
    shingles (empty text) have no rows and thus no pairs — the same
    semantics as the SQL oracle.

    ``df_ceiling`` is the prefix-filtering document-frequency cut (Xiao
    et al. WWW'08): a shingle held by d docs emits O(d^2) pair rows, so
    one boilerplate stop-shingle in 10^6 docs would otherwise be a
    round-killer. Shingles with df > ceiling are dropped from the
    INTERSECTION index only; union sizes still count every shingle, so
    the estimate is conservative (a pair whose similarity rests purely
    on boilerplate may be missed, never over-scored). The SQL oracle
    applies the identical cut. df <= 1 removal is a pure optimization
    (singletons can't pair); the materialize keeps shingling from
    running twice — at extreme corpus scale swap it for a parquet spill
    of the same rows.

    ``n_buckets`` (default: scaled to cluster CPUs, see
    ``n_shuffle_buckets``) is the dispatch-amortization group count for
    the pair shuffle; ``max_driver_rows`` caps the kept-shingle frame's
    driver pull (``bounded_driver_frame``)."""
    from ray.data.aggregate import Count, Max

    B = n_buckets or n_shuffle_buckets()
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    _empty_rows = pa.table(
        {
            "sh": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "n_sh": pa.array([], pa.int64()),
        }
    )

    def shingle_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        parts, docs, ns = [], [], []
        for i, x in enumerate(texts):
            s = tx.shingles(x, k=k)
            if not s:
                continue
            # int64 bit view of the uint64 hash — equality-only key,
            # keeps the shuffle column Arrow-int64-safe
            hv = np.unique(hash64(s)).view(np.int64)
            parts.append(hv)
            docs.append(np.full(len(hv), ids[i], dtype=np.int64))
            ns.append(np.full(len(hv), len(hv), dtype=np.int64))
        if not parts:
            return _empty_rows
        return pa.table(
            {
                "sh": pa.array(np.concatenate(parts), pa.int64()),
                "doc_id": pa.array(np.concatenate(docs), pa.int64()),
                "n_sh": pa.array(np.concatenate(ns), pa.int64()),
            }
        )

    _empty_pairs = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "n_a": pd.Series([], dtype="int64"),
            "n_b": pd.Series([], dtype="int64"),
        }
    )

    def co_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Pair emission for every shingle run inside ONE hash bucket of
        shingles (the groupby key is ``sh % B``, not ``sh`` — thousands
        of tiny per-shingle groups would pay Ray's per-group dispatch
        each; B bucket groups amortize it, and the inner loop is a
        numpy run-scan over the lexsorted block). Each run is bounded by
        ``df_ceiling``, so the triu expansion per run stays small."""
        if len(g) < 2:
            return _empty_pairs
        sh_all = g["sh"].to_numpy(dtype=np.int64)
        ids_all = g["doc_id"].to_numpy(dtype=np.int64)
        ns_all = g["n_sh"].to_numpy(dtype=np.int64)
        order = np.lexsort((ids_all, sh_all))
        sh_s, ids_s, ns_s = sh_all[order], ids_all[order], ns_all[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], sh_s[1:] != sh_s[:-1], [True]))
        )
        outs = []
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            m = int(b1 - b0)
            if m < 2:
                continue
            ii, jj = np.triu_indices(m, k=1)
            outs.append(
                (ids_s[b0:b1][ii], ids_s[b0:b1][jj], ns_s[b0:b1][ii], ns_s[b0:b1][jj])
            )
        if not outs:
            return _empty_pairs
        return pd.DataFrame(
            {
                "doc_a": np.concatenate([o[0] for o in outs]),
                "doc_b": np.concatenate([o[1] for o in outs]),
                "n_a": np.concatenate([o[2] for o in outs]),
                "n_b": np.concatenate([o[3] for o in outs]),
            }
        )

    # Pass 1 — document-frequency filter over ONE materialized shingling
    # (shingling text is the dominant per-doc cost; the df pass and the
    # pair pass share the same dataset). df>=2: singletons can't pair
    # (pure optimization — almost all shingles are singletons).
    # df<=ceiling: the prefix-filtering cut documented above.
    shingles_ds = ds.map_batches(shingle_rows, batch_format="pyarrow").materialize()
    keep = bounded_driver_frame(
        shingles_ds.groupby("sh")
        .aggregate(Count(alias_name="df"))
        .filter(expr=f"df >= 2 and df <= {int(df_ceiling)}"),
        "ngram_jaccard_pairs kept-shingle frame",
        max_driver_rows,
    )  # kept shingle keys only — duplicate-bounded, guarded
    keep_keys = np.sort(keep["sh"].to_numpy(dtype=np.int64))
    keep_ref = ray.put(keep_keys)

    def only_kept(t: pa.Table) -> pa.Table:
        keep_ = ray.get(keep_ref)
        if len(keep_) == 0:
            t = t.slice(0, 0)
            kk = np.array([], dtype=np.int64)
        else:
            kk = t["sh"].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(keep_, kk), len(keep_) - 1)
            sel = keep_[pos] == kk
            t = t.filter(pa.array(sel))
            kk = kk[sel]
        # shuffle key = shingle hash bucket (co-locates each shingle's
        # rows while keeping the group count at B — see co_pairs)
        return t.append_column(
            "sb", pa.array((kk % B).astype(np.int64), pa.int64())
        )

    agg = (
        shingles_ds.map_batches(only_kept, batch_format="pyarrow")
        .groupby("sb")
        .map_groups(co_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(
            Count(alias_name="inter"),
            Max("n_a", alias_name="na"),
            Max("n_b", alias_name="nb"),
        )
    )

    def score(t: pa.Table) -> pa.Table:
        inter = t["inter"].to_numpy(zero_copy_only=False).astype(np.float64)
        union = (
            t["na"].to_numpy(zero_copy_only=False) + t["nb"].to_numpy(zero_copy_only=False)
        ).astype(np.float64) - inter
        j = np.round(inter / union, 4)
        keep = pa.array(j >= threshold)
        return pa.table(
            {
                "doc_a": t["doc_a"].filter(keep),
                "doc_b": t["doc_b"].filter(keep),
                "jaccard": pa.array(j[j >= threshold], pa.float64()),
            }
        )

    out = agg.map_batches(score, batch_format="pyarrow").to_pandas()  # final pair frame
    out = out.astype({"doc_a": "int64", "doc_b": "int64"})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def tf_cosine_pairs(
    sf_dir: str,
    threshold: float = 0.05,
    df_ceiling: int = 256,
    n_buckets: int | None = None,
    max_driver_rows: int = _MAX_DRIVER_ROWS,
) -> pd.DataFrame:
    """EXACT all-pairs lexical cosine over sparse term-frequency vectors
    via the distributed inverted index — the bag-of-words sibling of
    ``ngram_jaccard_pairs`` (set overlap) and the lexical counterpart of
    ``embedding_near_dup_pairs`` (dense cosine). One tokenize pass
    (identical ``\\s+`` split to ``explode_tokens``) builds
    ``(token_hash, doc_id, tf, n2)`` rows — docs are batch-whole, so
    per-doc term counts AND the full-vector norm² ``n2 = Σ tf²`` are
    final in-batch, no shuffle. Then:

      -> groupby(token).Count: document frequency; keep 2 <= df <= ceiling
      -> bucketed pair emission per token run: (doc_a, doc_b,
         dot_part = tf_a·tf_b, n2_a, n2_b)
      -> groupby(pair): dot = Σ dot_parts (int64 — order-independent)
      -> cosine = dot / sqrt(n2_a·n2_b), filter >= threshold.

    Every quantity entering the final expression (dot, n2_a, n2_b) is an
    int64 sum, so the score is ONE float expression of three exact
    integers — bit-identical to the SQL oracle regardless of summation
    order (the reason this is tf-cosine, not tf-idf: idf weights would
    put order-dependent float sums on the reduce path).

    ``df_ceiling`` is the same prefix-filtering cut as
    ``ngram_jaccard_pairs`` (a token in d docs emits O(d²) pair rows):
    tokens with df > ceiling contribute to norms but not to dots, so the
    reported cosine is a conservative lower bound — a stopword can never
    create a pair, only dilute one. The oracle applies the identical cut.
    Both shuffles move fixed-width int rows, never text.

    The default ``threshold`` is LOW because the synthetic corpus has no
    planted lexical near-dups (its mid-df-band cosines top out ~0.08, so
    0.05 keeps the oracle gate non-trivial); real dedup runs pass
    0.6-0.8 — the planted-duplicate pytest pins that regime."""
    from ray.data.aggregate import Count

    from .textstats import _token_pairs

    B = n_buckets or n_shuffle_buckets()
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    _empty_rows = pa.table(
        {
            "tk": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64()),
            "n2": pa.array([], pa.int64()),
        }
    )

    def tf_rows(t: pa.Table) -> pa.Table:
        pairs = _token_pairs(t)
        doc = pairs["doc_id"].to_numpy(zero_copy_only=False)
        if len(doc) == 0:
            return _empty_rows
        tk = hash64(pairs["tok"].to_numpy(zero_copy_only=False)).view(np.int64)
        # run-scan the (doc, token-hash) lexsort: run length = tf
        order = np.lexsort((tk, doc))
        d_s, k_s = doc[order], tk[order]
        new = np.concatenate(([True], (d_s[1:] != d_s[:-1]) | (k_s[1:] != k_s[:-1])))
        starts = np.flatnonzero(new)
        tf = np.diff(np.append(starts, len(d_s))).astype(np.int64)
        d_u, k_u = d_s[starts], k_s[starts]
        # full-vector norm² per doc (ALL tokens, before any df cut) —
        # int64 reduceat, NOT bincount(weights=...): bincount sums in
        # float64 and would break the exact-integer contract past 2^53
        tf2 = tf * tf
        doc_new = np.concatenate(([True], d_u[1:] != d_u[:-1]))
        doc_starts = np.flatnonzero(doc_new)
        runs = np.diff(np.append(doc_starts, len(d_u)))
        n2 = np.repeat(np.add.reduceat(tf2, doc_starts), runs)
        return pa.table(
            {
                "tk": pa.array(k_u, pa.int64()),
                "doc_id": pa.array(d_u, pa.int64()),
                "tf": pa.array(tf, pa.int64()),
                "n2": pa.array(n2, pa.int64()),
            }
        )

    _empty_pairs = pd.DataFrame(
        {
            "pb": pd.Series([], dtype="int64"),
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "dot_part": pd.Series([], dtype="int64"),
            "n2_a": pd.Series([], dtype="int64"),
            "n2_b": pd.Series([], dtype="int64"),
        }
    )

    def _pair_combine(
        a: np.ndarray, b: np.ndarray, dot: np.ndarray, na: np.ndarray, nb: np.ndarray
    ) -> tuple[np.ndarray, ...]:
        """Sum dot partials per (a, b) run — lexsort + reduceat, safe
        for arbitrary int64 ids (no key fusing)."""
        order = np.lexsort((b, a))
        a, b, dot, na, nb = a[order], b[order], dot[order], na[order], nb[order]
        new = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        starts = np.flatnonzero(new)
        return (
            a[starts],
            b[starts],
            np.add.reduceat(dot, starts),
            na[starts],
            nb[starts],
        )

    def co_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Pair emission for every token run inside ONE hash bucket (the
        groupby key is ``tk % B`` — B groups amortize Ray's per-group
        dispatch; the inner loop is a numpy run-scan over the lexsorted
        block, each run bounded by df_ceiling). Emits per-(pair, bucket)
        PARTIAL dot products already combined within the bucket, keyed
        by the pair hash ``pb`` for the resolve shuffle."""
        if len(g) < 2:
            return _empty_pairs
        tk_all = g["tk"].to_numpy(dtype=np.int64)
        ids_all = g["doc_id"].to_numpy(dtype=np.int64)
        tf_all = g["tf"].to_numpy(dtype=np.int64)
        n2_all = g["n2"].to_numpy(dtype=np.int64)
        order = np.lexsort((ids_all, tk_all))
        k_s, i_s, f_s, n_s = tk_all[order], ids_all[order], tf_all[order], n2_all[order]
        bounds = np.flatnonzero(np.concatenate(([True], k_s[1:] != k_s[:-1], [True])))
        outs = []
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            m = int(b1 - b0)
            if m < 2:
                continue
            ii, jj = np.triu_indices(m, k=1)
            outs.append(
                (
                    i_s[b0:b1][ii],
                    i_s[b0:b1][jj],
                    f_s[b0:b1][ii] * f_s[b0:b1][jj],
                    n_s[b0:b1][ii],
                    n_s[b0:b1][jj],
                )
            )
        if not outs:
            return _empty_pairs
        a, b, dot, na, nb = _pair_combine(
            np.concatenate([o[0] for o in outs]),
            np.concatenate([o[1] for o in outs]),
            np.concatenate([o[2] for o in outs]),
            np.concatenate([o[3] for o in outs]),
            np.concatenate([o[4] for o in outs]),
        )
        # integer pair mix (fibonacci-hash the fused key): uniform over
        # B buckets without string hashing; uint64 wraparound is the mix
        pb = (
            (a.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + b.view(np.uint64))
            % np.uint64(B)
        ).astype(np.int64)
        return pd.DataFrame(
            {"pb": pb, "doc_a": a, "doc_b": b, "dot_part": dot, "n2_a": na, "n2_b": nb}
        )

    # Pass 1 — document frequency over ONE materialized tokenize (the
    # df pass and the pair pass share the dataset; tokenizing text is
    # the dominant per-doc cost). df >= 2: singletons can't pair.
    tf_ds = ds.map_batches(tf_rows, batch_format="pyarrow").materialize()
    keep = bounded_driver_frame(
        tf_ds.groupby("tk")
        .aggregate(Count(alias_name="df"))
        .filter(expr=f"df >= 2 and df <= {int(df_ceiling)}"),
        "tf_cosine_pairs kept-token frame",
        max_driver_rows,
    )
    keep_keys = np.sort(keep["tk"].to_numpy(dtype=np.int64))
    keep_ref = ray.put(keep_keys)

    def only_kept(t: pa.Table) -> pa.Table:
        keep_ = ray.get(keep_ref)
        if len(keep_) == 0:
            t = t.slice(0, 0)
            kk = np.array([], dtype=np.int64)
        else:
            kk = t["tk"].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(keep_, kk), len(keep_) - 1)
            sel = keep_[pos] == kk
            t = t.filter(pa.array(sel))
            kk = kk[sel]
        return t.append_column("tb", pa.array((kk % B).astype(np.int64), pa.int64()))

    _empty_scored = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "cosine": pd.Series([], dtype="float64"),
        }
    )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        """Final per-pair reduce inside ONE pair-hash bucket (the house
        bucketed run-scan — Ray's native multi-key Sum/Max aggregate
        pays ~1 ms/group at this group count, a measured 60 s on 31k
        pairs at sf0.1; this resolve is one lexsort + reduceat): sum the
        per-token-bucket dot partials, score, filter."""
        a, b, dot, na, nb = _pair_combine(
            g["doc_a"].to_numpy(dtype=np.int64),
            g["doc_b"].to_numpy(dtype=np.int64),
            g["dot_part"].to_numpy(dtype=np.int64),
            g["n2_a"].to_numpy(dtype=np.int64),
            g["n2_b"].to_numpy(dtype=np.int64),
        )
        c = dot.astype(np.float64) / np.sqrt(
            na.astype(np.float64) * nb.astype(np.float64)
        )  # one float expr of three exact ints
        keep_m = c >= threshold
        if not keep_m.any():
            return _empty_scored
        return pd.DataFrame(
            {
                "doc_a": a[keep_m],
                "doc_b": b[keep_m],
                "cosine": np.round(c[keep_m], 4),
            }
        )

    out = (
        tf_ds.map_batches(only_kept, batch_format="pyarrow")
        .groupby("tb")
        .map_groups(co_pairs, batch_format="pandas")
        .groupby("pb")
        .map_groups(resolve, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        out = pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
    out = out.astype({"doc_a": "int64", "doc_b": "int64"})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _levenshtein(a: str, b: str) -> int:
    """Exact Levenshtein distance (unit insert/delete/substitute), DP
    vectorized across each row: python loops only over the SHORTER
    string's units, the row update is numpy. The sequential
    ``cur[j] = min(t[j], cur[j-1]+1)`` dependence is solved by the
    prefix-min identity ``cur[j]-j = min over i<=j of (t[i]-i)`` —
    one ``np.minimum.accumulate`` per row. Strings are compared as
    UTF-8 BYTES — deliberately: DuckDB's ``levenshtein`` is byte-based
    (``levenshtein('héllo','hello')`` = 2 there, not the per-codepoint
    1), and the oracle-parity contract wins; on the ASCII corpus the
    two coincide. A per-codepoint variant would swap in the utf-32
    view of each string."""
    if a == b:
        return 0
    x = np.frombuffer(a.encode("utf-8"), dtype=np.uint8)
    y = np.frombuffer(b.encode("utf-8"), dtype=np.uint8)
    if len(x) < len(y):
        x, y = y, x  # iterate over the longer, vectorize over the shorter
    if len(y) == 0:
        return len(x)
    m = len(y)
    prev = np.arange(m + 1, dtype=np.int64)
    rng = np.arange(1, m + 1, dtype=np.int64)
    idx = np.arange(m + 1, dtype=np.int64)
    for i, cx in enumerate(x, 1):
        t = np.minimum(prev[1:] + 1, prev[:-1] + (y != cx))
        v = np.minimum.accumulate(np.concatenate(([np.int64(i)], t - rng)))
        prev = v + idx
    return int(prev[-1])


def edit_distance_pairs(
    sf_dir: str,
    jaccard_floor: float = 0.3,
    n_buckets: int | None = None,
    max_driver_rows: int = _MAX_DRIVER_ROWS,
) -> pd.DataFrame:
    """Edit-distance VERIFICATION of mined near-dup candidates — the
    character-exact final arbiter a fuzzy-dedup pipeline runs on the
    (small) candidate set its token-level miners produce. Candidates
    come from ``ngram_jaccard_pairs`` at a permissive ``jaccard_floor``;
    each surviving pair gets the exact Levenshtein distance plus the
    normalized similarity ``sim = 1 - dist / max(len_a, len_b)``.

    Distance and both lengths are exact integers, so ``sim`` is ONE
    float expression of three ints — bit-identical to the SQL oracle.

    Shape: the candidate frame is duplicate-bounded (driver-side, the
    ngram miner's contract). Texts are then routed by pair: one
    documents pass emits (pair_id % B, pair_id, side, text) rows for
    participating docs ONLY — the single place in this module where
    text rides a shuffle, and deliberately so: the moved bytes are
    candidate-bounded (2 docs per mined pair), not corpus-bounded,
    and co-locating both texts of a pair is the verify step's
    irreducible cost. Each bucket task then runs the DP per pair.
    O(len_a*len_b) per pair is acceptable BECAUSE candidates are mined,
    never all-pairs; a banded DP would cut the constant further."""
    B = n_buckets or n_shuffle_buckets()
    cand = ngram_jaccard_pairs(
        sf_dir,
        threshold=jaccard_floor,
        n_buckets=n_buckets,
        max_driver_rows=max_driver_rows,
    )
    _empty = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "dist": pd.Series([], dtype="int64"),
            "sim": pd.Series([], dtype="float64"),
        }
    )
    if cand.empty:
        return _empty
    pair_a = cand["doc_a"].to_numpy(dtype=np.int64)
    pair_b = cand["doc_b"].to_numpy(dtype=np.int64)
    n_pairs = len(pair_a)
    # membership index doc -> [(pair_id, side)], broadcast once (pair-
    # bounded: 2 rows per candidate pair)
    docs_all = np.concatenate([pair_a, pair_b])
    pid_all = np.concatenate([np.arange(n_pairs), np.arange(n_pairs)]).astype(np.int64)
    side_all = np.concatenate(
        [np.zeros(n_pairs, dtype=np.int64), np.ones(n_pairs, dtype=np.int64)]
    )
    order = np.argsort(docs_all, kind="stable")
    member_ref = ray.put(
        (docs_all[order], pid_all[order], side_all[order], pair_a, pair_b)
    )

    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    _empty_routed = pa.table(
        {
            "gb": pa.array([], pa.int64()),
            "pid": pa.array([], pa.int64()),
            "side": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
        }
    )

    def route(t: pa.Table) -> pa.Table:
        d_sorted, pid_s, side_s, _, _ = ray.get(member_ref)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        lo = np.searchsorted(d_sorted, doc, side="left")
        hi = np.searchsorted(d_sorted, doc, side="right")
        cnt = hi - lo
        sel = np.flatnonzero(cnt)
        if len(sel) == 0:
            return _empty_routed
        reps = cnt[sel]
        total = int(reps.sum())
        offs = np.repeat(np.cumsum(reps) - reps, reps)
        pos = np.arange(total, dtype=np.int64) - offs + np.repeat(lo[sel], reps)
        pids = pid_s[pos]
        return pa.table(
            {
                "gb": pa.array(pids % B, pa.int64()),
                "pid": pa.array(pids, pa.int64()),
                "side": pa.array(side_s[pos], pa.int64()),
                "text": t["text"].take(pa.array(np.repeat(sel, reps))),
            }
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        _, _, _, pa_ids, pb_ids = ray.get(member_ref)
        pid = g["pid"].to_numpy(dtype=np.int64)
        side = g["side"].to_numpy(dtype=np.int64)
        texts = g["text"].to_numpy(dtype=object)
        order_ = np.lexsort((side, pid))
        pid, side, texts = pid[order_], side[order_], texts[order_]
        rows = []
        for i in range(0, len(pid), 2):
            # both sides of a pair land in this bucket by construction
            p = int(pid[i])
            ta, tb = str(texts[i]), str(texts[i + 1])
            dist = _levenshtein(ta, tb)
            la, lb = len(ta), len(tb)
            mx = max(la, lb)
            sim = 1.0 - dist / mx if mx else 1.0
            rows.append((int(pa_ids[p]), int(pb_ids[p]), dist, np.round(sim, 4)))
        if not rows:
            return _empty
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "dist", "sim"]).astype(
            {"doc_a": "int64", "doc_b": "int64", "dist": "int64", "sim": "float64"}
        )

    out = (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(verify, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return _empty
    out = out.astype({"doc_a": "int64", "doc_b": "int64", "dist": "int64"})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


_SIM_CHUNK = 2048  # pairwise tile edge: 2048^2 uint64 xor = 32 MiB peak


def simhash_near_dups(
    sf_dir: str,
    max_hamming: int = 6,
    blocks: int = 4,
    match_blocks: int = 1,
    n_buckets: int | None = None,
) -> pd.DataFrame:
    """SimHash near-dup pairs, fully distributed:

      simhash per doc (vectorized map_batches)
      -> explode to C(blocks, match_blocks) (combo_id, key, doc_id,
         simhash) rows — ``key`` concatenates the combo's block values
      -> groupby(combo, key) => in-group pairwise hamming, vectorized
         (tiled XOR + byte-table popcount, ``_SIM_CHUNK`` x ``_SIM_CHUNK``
         tiles bound memory on hot buckets)
      -> emit a pair only from its MINIMAL matching combo (computable
         from the two simhashes alone), so cross-group duplicates never
         exist and no second dedup shuffle is needed.

    The only all-to-all moves C(blocks, match_blocks) small fixed-width
    rows per document — never the text. Blocking is Manku et al.
    (WWW'07): split the 64-bit simhash into ``blocks`` equal blocks and
    bucket on every ``match_blocks``-combination of them; by pigeonhole
    the scheme is LOSSLESS for hamming <= blocks - match_blocks. The
    default (blocks=4, match_blocks=1: 4 single-quarter tables, 16-bit
    keys) is the round-1/2 behavior, lossless to hamming<=3 and the
    pinned recall heuristic for the default max_hamming=6.

    ``match_blocks`` is the scale knob the 10^10-doc regime needs:
    16-bit keys cap the table at 65k buckets (bucket size ~n/65k, and
    in-bucket verify is O(m^2)). Raising match_blocks widens the key —
    e.g. blocks=4, match_blocks=2 gives 6 tables of 32-bit keys
    (buckets ~n/4x10^9) at the cost of losslessness dropping to
    hamming <= 2; blocks=8, match_blocks=4 gives 70 tables of 32-bit
    keys, lossless to hamming <= 4."""
    import itertools

    if not (1 <= match_blocks <= blocks <= 64) or 64 % blocks:
        raise ValueError("need 1 <= match_blocks <= blocks, blocks | 64")
    width = 64 // blocks
    B = n_buckets or n_shuffle_buckets()
    bmask = np.uint64((1 << width) - 1)
    combos = list(itertools.combinations(range(blocks), match_blocks))
    # per-combo 64-bit mask over the simhash bits it keys on (for the
    # minimal-combo check inside verify)
    combo_bitmasks = np.array(
        [sum(((1 << width) - 1) << (width * b) for b in c) for c in combos], dtype=np.uint64
    )
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        s = tx.simhash64(t["text"].to_pylist())
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(doc_ids)
        nc = len(combos)
        # key for combo c = its block values concatenated LSB-first —
        # ships as the int64 bit pattern (equality-only key)
        keys = np.zeros((n, nc), dtype=np.uint64)
        for ci, c in enumerate(combos):
            for pos, b in enumerate(c):
                keys[:, ci] |= ((s >> np.uint64(width * b)) & bmask) << np.uint64(width * pos)
        qv64 = keys.ravel().view(np.int64)
        return pa.table(
            {
                "q": pa.array(np.tile(np.arange(nc, dtype=np.int64), n), pa.int64()),
                "qv": pa.array(qv64, pa.int64()),
                "doc_id": pa.array(np.repeat(doc_ids, nc), pa.int64()),
                "simhash": pa.array(np.repeat(s, nc), pa.uint64()),
                # shuffle key: (combo, key-hash bucket) — co-locates every
                # (q, qv) group while keeping the group count at
                # nc x B instead of nc x 2^key-width
                # (per-group dispatch amortization, as in minhash/ngram)
                "qb": pa.array((qv64 % B).astype(np.int64), pa.int64()),
            }
        )

    _empty = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "hamming": pd.Series([], dtype="int64"),
        }
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        """Tiled hamming verify for every (q, qv) run inside ONE
        (q, key-bucket) group — run-scan over the lexsorted block; the
        tiled XOR + popcount and the minimal-combo canonicalization are
        unchanged, applied per run."""
        if len(g) < 2:
            return _empty
        q = int(g["q"].iloc[0])
        qv_all = g["qv"].to_numpy(dtype=np.int64)
        ids_all = g["doc_id"].to_numpy(dtype=np.int64)
        sh_all = g["simhash"].to_numpy(dtype=np.uint64)
        order = np.lexsort((ids_all, qv_all))
        qv_all, ids_all, sh_all = qv_all[order], ids_all[order], sh_all[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], qv_all[1:] != qv_all[:-1], [True]))
        )
        out_a, out_b, out_h = [], [], []
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            n = int(b1 - b0)
            if n < 2:
                continue
            ids, sh = ids_all[b0:b1], sh_all[b0:b1]
            for i0 in range(0, n, _SIM_CHUNK):
                i1 = min(n, i0 + _SIM_CHUNK)
                for j0 in range(i0, n, _SIM_CHUNK):
                    j1 = min(n, j0 + _SIM_CHUNK)
                    x = sh[i0:i1, None] ^ sh[None, j0:j1]
                    d = _popcount64(x)
                    mask = d <= max_hamming
                    # strict upper triangle (ids ascending => doc_a < doc_b)
                    mask &= np.arange(i0, i1)[:, None] < np.arange(j0, j1)[None, :]
                    # canonical combo: skip pairs already emitted by a
                    # smaller matching combo (its keyed bits all equal <=>
                    # xor restricted to its bitmask is zero)
                    for q2 in range(q):
                        mask &= (x & combo_bitmasks[q2]) != 0
                    ii, jj = np.nonzero(mask)
                    if len(ii):
                        out_a.append(ids[i0:i1][ii])
                        out_b.append(ids[j0:j1][jj])
                        out_h.append(d[mask])
        if not out_a:
            return _empty
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a),
                "doc_b": np.concatenate(out_b),
                "hamming": np.concatenate(out_h),
            }
        )

    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["q", "qb"])
        .map_groups(verify, batch_format="pandas")
        .to_pandas()  # verified-pair frame only
    )
    out = out.astype({"doc_a": "int64", "doc_b": "int64", "hamming": "int64"})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def decontaminate(
    sf_dir: str, k: int = 5, every: int = 50, max_driver_rows: int = _MAX_DRIVER_ROWS
) -> rd.Dataset:
    """Benchmark decontamination: count, per training document, the
    distinct k-gram shingles it shares with a held-out eval set — the
    standard pre-training hygiene op (n-gram overlap against benchmark
    suites). The eval set here is the deterministic ``doc_id % every
    == 0`` slice (a stand-in for a real benchmark suite, which is small
    and fixed).

    Scale shape — the broadcast-small-side pattern, zero shuffle:

      pass 1 (small side): distinct shingle hashes of the eval slice,
        np.unique'd per batch, deduped ACROSS batches by a distributed
        groupby-distinct, and only then collected (guarded by
        ``bounded_driver_frame``) and broadcast once via ray.put. With a
        real benchmark suite the collected array is sized by the SUITE,
        not the corpus; the ``doc_id % every == 0`` stand-in used here is
        a corpus-proportional slice (1/every of the corpus), so the
        distributed dedup + driver guard — not the suite-is-small
        assumption — is what bounds the driver pull
      pass 2 (corpus): embarrassingly parallel map_batches — per doc,
        sorted-array membership count (searchsorted) against the
        broadcast set; emits (doc_id, n_overlap) only for contaminated
        docs.

    Shingle hashes ride as int64 bit views (equality-only keys, Arrow
    inference-safe). Docs with zero shingles emit nothing — the same
    no-shingles-no-rows semantics as the n-gram/SQL oracles."""
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def eval_hashes(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        parts = []
        for i, x in enumerate(texts):
            if ids[i] % every:
                continue
            s = tx.shingles(x, k=k)
            if s:
                parts.append(np.unique(hash64(s)).view(np.int64))
        hv = np.concatenate(parts) if parts else np.array([], dtype=np.int64)
        return pa.table({"sh": pa.array(np.unique(hv), pa.int64())})

    from ray.data.aggregate import Count

    ev_frame = bounded_driver_frame(
        ds.map_batches(eval_hashes, batch_format="pyarrow")
        .groupby("sh")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["sh"]),
        "decontaminate eval shingle set",
        max_driver_rows,
    )
    ev = np.sort(ev_frame["sh"].to_numpy(dtype=np.int64))
    ev_ref = ray.put(ev)

    _empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "n_overlap": pa.array([], pa.int64())}
    )

    def overlap(t: pa.Table) -> pa.Table:
        ev_ = ray.get(ev_ref)
        if len(ev_) == 0:
            return _empty
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        out_id, out_n = [], []
        for i, x in enumerate(texts):
            if ids[i] % every == 0:
                continue
            s = tx.shingles(x, k=k)
            if not s:
                continue
            hv = np.unique(hash64(s)).view(np.int64)
            pos = np.minimum(np.searchsorted(ev_, hv), len(ev_) - 1)
            n = int((ev_[pos] == hv).sum())
            if n:
                out_id.append(int(ids[i]))
                out_n.append(n)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_overlap": pa.array(out_n, pa.int64()),
            }
        )

    return ds.map_batches(overlap, batch_format="pyarrow")


def line_dedup_ds(
    ds: rd.Dataset, min_docs: int = 3, max_driver_rows: int = _MAX_DRIVER_ROWS
) -> rd.Dataset:
    """Boilerplate line removal (CCNet/RefinedWeb-style): delete every
    line that appears in >= ``min_docs`` DISTINCT documents (nav bars,
    cookie banners, footers — the dominant web-page noise left after
    exact dedup),
    and return each document's cleaned text plus the removed-line count.

    Scale shape — the decontaminate pattern, with the small side built
    BY the corpus instead of handed to it:

      pass 1: per-batch distinct (doc, line-hash) pairs (globally
        distinct because a document is whole within one batch), additive
        per-hash partials, ONE vocab-bounded groupby-sum, then filter to
        df >= min_docs. The collected frame is the BOILERPLATE
        vocabulary — lines repeated across documents — orders of
        magnitude smaller than the line universe; guarded by
        ``bounded_driver_frame`` and broadcast once as a sorted int64
        array.
      pass 2: shuffle-free map_batches — split, hash, searchsorted
        membership, vectorized per-doc removal counts (np.add.reduceat
        over the contiguous doc runs), and a per-doc join of the kept
        lines (a text kernel, same per-row cost class as the tokenizers).

    Text never rides a shuffle (hashes do); the all-to-all moves one row
    per (line-hash, batch). 64-bit line-hash collisions would remove an
    innocent line (~n_lines^2 / 2^65 expected); at that scale raise to a
    128-bit key. Lines are byte-exact keys (no normalization), matching
    the SQL oracle's GROUP BY line.

    Dataset-in/Dataset-out so it chains (``ccnet_corpus`` runs it on
    paragraph-deduped text): non-text columns pass through, cleaned
    text comes back as ``text``; the thin :func:`line_dedup` wrapper
    keeps the legacy sf_dir + ``text_clean`` frame contract.
    """

    def _split(t: pa.Table):
        import pyarrow.compute as pc

        text = pc.fill_null(t["text"].combine_chunks(), "")
        ls = pc.split_pattern(text, pattern="\n")
        lens = pc.list_value_length(ls).to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.repeat(t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False), lens)
        flat = pc.list_flatten(ls).to_pylist()
        return doc, lens, flat

    def partial_df(t: pa.Table) -> pa.Table:
        doc, _, flat = _split(t)
        lh = hash64(flat).view(np.int64)
        # distinct (doc, line) within the batch == globally distinct
        o = np.lexsort((doc, lh))
        lh_s, doc_s = lh[o], doc[o]
        first = np.concatenate(([True], (lh_s[1:] != lh_s[:-1]) | (doc_s[1:] != doc_s[:-1])))
        g = (
            pa.table({"lh": pa.array(lh_s[first], pa.int64())})
            .group_by("lh")
            .aggregate([([], "count_all")])
        )
        from .common import rename

        return rename(g, {"count_all": "p_df"})

    from ray.data.aggregate import Sum

    boiler_frame = bounded_driver_frame(
        ds.map_batches(partial_df, batch_format="pyarrow")
        .groupby("lh")
        .aggregate(Sum("p_df", alias_name="df"))
        .filter(expr=f"df >= {min_docs}")
        .select_columns(["lh"]),
        "line_dedup boilerplate line set (cross-doc-repeated lines only)",
        max_driver_rows,
    )
    boiler = (
        np.sort(boiler_frame["lh"].to_numpy(dtype=np.int64))
        if "lh" in boiler_frame.columns  # empty Datasets drop the schema
        else np.array([], dtype=np.int64)
    )
    b_ref = ray.put(boiler)

    def clean(t: pa.Table) -> pa.Table:
        b_ = ray.get(b_ref)
        doc, lens, flat = _split(t)
        if len(flat) and len(b_):
            lh = hash64(flat).view(np.int64)
            pos = np.minimum(np.searchsorted(b_, lh), len(b_) - 1)
            drop = b_[pos] == lh
        else:
            drop = np.zeros(len(flat), dtype=bool)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1])).astype(np.int64)
        n_removed = (
            np.add.reduceat(drop.astype(np.int64), starts)
            if len(flat)
            else np.zeros(len(lens), dtype=np.int64)
        )
        n_removed[lens == 0] = 0  # reduceat repeats on empty runs
        texts = []
        for i in range(len(lens)):
            a, b = starts[i], starts[i] + lens[i]
            texts.append("\n".join(flat[j] for j in range(a, b) if not drop[j]))
        cols = {c: t[c] for c in t.column_names if c != "text"}
        cols["text"] = pa.array(texts, pa.string())
        cols["n_removed_lines"] = pa.array(n_removed, pa.int64())
        return pa.table(cols)

    return ds.map_batches(clean, batch_format="pyarrow")


def line_dedup(
    sf_dir: str, min_docs: int = 3, max_driver_rows: int = _MAX_DRIVER_ROWS
) -> pd.DataFrame:
    """sf_dir entry point for :func:`line_dedup_ds` (docstring there):
    reads ``documents``, returns the legacy sorted
    (doc_id, text_clean, n_removed_lines) frame."""
    out = (
        line_dedup_ds(
            T(sf_dir, "documents", columns=["doc_id", "text"]),
            min_docs=min_docs,
            max_driver_rows=max_driver_rows,
        )
        .to_pandas()
        .rename(columns={"text": "text_clean"})
    )
    out = out[["doc_id", "text_clean", "n_removed_lines"]]
    return out.sort_values("doc_id").reset_index(drop=True)


def dedup_index_build(
    sf_dir: str, index_dir: str, n_parts: int = 64, parity: int = 0
) -> int:
    """Persist the corpus's exact-dedup fingerprint set as a
    hash-partitioned parquet index: ``part=N/`` hive directories
    (``part = fp & (n_parts-1)``), each holding the partition's DISTINCT
    int64 fingerprints. The on-disk sibling of the engine's sharded
    seen-set (SURVEY.md §2.6 D1) for the batch regime: a daily-crawl
    pipeline dedups each NEW shard against this index without ever
    re-reading corpus text — index residence is 8 B per distinct doc.

    ``parity`` selects the demo split of the fixture ``documents``
    table (0 = the even-doc_id "existing corpus" half); a production
    caller indexes whole tables and ships new shards through
    ``exact_dedup_incremental``. Returns the distinct-fp count."""
    import json
    import os

    from ray.data.aggregate import Count

    assert n_parts & (n_parts - 1) == 0, f"n_parts must be a power of two, got {n_parts}"
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def add_fp(t: pa.Table) -> pa.Table:
        keep = pa.array(
            (t["doc_id"].to_numpy(zero_copy_only=False) & 1) == parity
        )
        t = t.filter(keep)
        fp = tx.fingerprint64(t["text"].to_pylist()).view(np.int64)
        # per-batch distinct first: the shuffle moves one row per
        # (fp, batch), never per doc
        u = np.unique(fp)
        return pa.table(
            {"part": pa.array(u & (n_parts - 1), pa.int64()), "fp": pa.array(u, pa.int64())}
        )

    distinct = (
        ds.map_batches(add_fp, batch_format="pyarrow")
        .groupby(["part", "fp"])
        .aggregate(Count(alias_name="_c"))
        .select_columns(["part", "fp"])
        .materialize()
    )
    n = distinct.count()
    distinct.write_parquet(index_dir, partition_cols=["part"])
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump({"n_parts": n_parts, "parity": parity}, f)
    return n


def exact_dedup_incremental(
    sf_dir: str,
    index_dir: str | None = None,
    parity: int = 1,
    update_index: bool = False,
) -> rd.Dataset:
    """Incremental exact dedup of a NEW shard against the persisted
    fingerprint index — the operational daily-crawl path: the existing
    corpus is never re-read (only its 8 B/doc fp index), and each index
    partition is opened ONLY by the probe task that owns it.

    Shape: one map_batches fingerprints the new shard (parity-1 docs of
    the fixture split); ONE groupby co-locates rows by ``part = fp &
    (P-1)`` — the same hash routing the index was written with — and the
    per-part probe task reads exactly its own ``part=N/`` files,
    first-wins dedups within the shard (min doc_id per fp, vectorized
    sort + run-scan), and anti-joins against the partition's sorted fp
    array via searchsorted. Dispatch is bounded by P (power of two,
    cluster-sized), never by doc or fp count; nothing index- or
    shard-sized touches the driver. With ``update_index=True`` the
    surviving fps are appended into the same hive layout (new uniquely
    named files per partition), making the op idempotent: a re-run of
    the same shard returns 0 rows — pinned in pytest alongside
    SQL-oracle equality (NOT IN over the normalized text) and the
    planted-duplicate behavior."""
    import json
    import os

    if index_dir is None:
        index_dir = os.path.join(
            "/tmp",
            "bsr_dedup_index",
            f"{os.path.basename(os.path.normpath(sf_dir))}-p{1 - parity}",
        )
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        dedup_index_build(sf_dir, index_dir, parity=1 - parity)
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    n_parts = int(meta["n_parts"])

    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def add_fp(t: pa.Table) -> pa.Table:
        keep = pa.array((t["doc_id"].to_numpy(zero_copy_only=False) & 1) == parity)
        t = t.filter(keep)
        fp = tx.fingerprint64(t["text"].to_pylist()).view(np.int64)
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "part": pa.array(fp & (n_parts - 1), pa.int64()),
                "fp": pa.array(fp, pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
            }
        )

    def probe(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        part = int(g["part"].iloc[0])
        fp = g["fp"].to_numpy(dtype=np.int64)
        doc = g["doc_id"].to_numpy(dtype=np.int64)
        # first-wins within the shard: sort (fp, doc_id), keep run heads
        order = np.lexsort((doc, fp))
        fp_s, doc_s = fp[order], doc[order]
        head = np.concatenate(([True], fp_s[1:] != fp_s[:-1]))
        fp_s, doc_s = fp_s[head], doc_s[head]
        # anti-join against ONLY this task's partition files
        pdir = os.path.join(index_dir, f"part={part}")
        if os.path.isdir(pdir):
            seen = np.sort(pq.read_table(pdir, columns=["fp"])["fp"].to_numpy(zero_copy_only=False))
            if len(seen):
                pos = np.searchsorted(seen, fp_s)
                pos[pos == len(seen)] = len(seen) - 1
                fresh = seen[pos] != fp_s
                fp_s, doc_s = fp_s[fresh], doc_s[fresh]
        return pd.DataFrame(
            {"part": np.full(len(fp_s), part, dtype=np.int64), "fp": fp_s, "doc_id": doc_s}
        )

    survivors = (
        ds.map_batches(add_fp, batch_format="pyarrow")
        .groupby("part")
        .map_groups(probe, batch_format="pandas")
        .materialize()
    )
    if update_index:
        survivors.select_columns(["part", "fp"]).write_parquet(
            index_dir, partition_cols=["part"]
        )
    return survivors.select_columns(["doc_id"])


def repeated_spans(sf_dir: str, k: int = 5, n_buckets: int | None = None) -> rd.Dataset:
    """Substring-level (positional) duplication profile — for every doc,
    how many of its k-token spans also occur elsewhere in the corpus
    (counting multiplicity: a span repeated WITHIN one doc counts too).
    This is the measurement pass of suffix/substring dedup ("Deduplicating
    Training Data Makes Language Models Better", Lee et al. 2022): where
    doc-level MinHash asks "is this document a near-copy", this asks
    "which fraction of it is boilerplate copied from anywhere" — the
    signal used to cut repeated spans out of otherwise-unique pages.

    Scale shape: ONE shingling pass emits one fixed-width row per
    position — (bucket = sh & (B-1), sh, doc_id) — never text and never
    a distinct-ification (multiplicity is the semantics). All positions
    of a given span hash land in one bucket, so a bucket-local numpy
    run-scan over the lexsorted span column reads off GLOBAL
    multiplicities; rows in runs of length >= 2 are repeated positions.
    The per-doc reduction happens inside the bucket (one partial row per
    (doc, bucket)), and a SECOND bucketed run-scan keyed by
    ``doc_id & (B-1)`` sums the B-bounded partials per doc (a native
    Sum aggregate here pays per-group dispatch at 10^4+ docs — see
    ``doc_totals``). Output: (doc_id, n_pos, n_repeated_pos), one row
    per non-empty doc, as a distributed Dataset. Span identity is the
    house 64-bit hash (``hash64``) — same collision convention as
    ``ngram_jaccard_pairs`` (the SQL oracle groups by the span string)."""
    B = n_buckets or n_shuffle_buckets()
    assert B & (B - 1) == 0, f"n_buckets must be a power of two, got {B}"
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    _empty = pa.table(
        {
            "bucket": pa.array([], pa.int64()),
            "sh": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
        }
    )

    def span_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        parts, docs = [], []
        for i, x in enumerate(texts):
            s = tx.shingles(x, k=k)
            if not s:
                continue
            hv = hash64(s).view(np.int64)  # positional: NOT uniqued
            parts.append(hv)
            docs.append(np.full(len(hv), ids[i], dtype=np.int64))
        if not parts:
            return _empty
        sh = np.concatenate(parts)
        return pa.table(
            {
                "bucket": pa.array(sh & np.int64(B - 1), pa.int64()),
                "sh": pa.array(sh, pa.int64()),
                "doc_id": pa.array(np.concatenate(docs), pa.int64()),
            }
        )

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        sh = g["sh"].to_numpy(dtype=np.int64)
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((ids, sh))
        sh_s, ids_s = sh[order], ids[order]
        new_run = np.concatenate(([True], sh_s[1:] != sh_s[:-1]))
        starts = np.flatnonzero(new_run)
        run_len = np.diff(np.append(starts, len(sh_s)))
        repeated = np.repeat(run_len >= 2, run_len)
        # per-doc partials: total positions + repeated positions
        uniq, counts = np.unique(ids_s, return_counts=True)
        rep_counts = np.bincount(
            np.searchsorted(uniq, ids_s[repeated]), minlength=len(uniq)
        )
        return pd.DataFrame(
            {
                # re-key the second exchange by doc ownership
                "doc_bucket": uniq & np.int64(B - 1),
                "doc_id": uniq,
                "p_pos": counts.astype(np.int64),
                "p_rep": rep_counts.astype(np.int64),
            }
        )

    def doc_totals(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized in-bucket reduction (a native Sum aggregate over
        # the pandas map_groups blocks pays a per-group dispatch at
        # 10^4+ doc groups — measured 28 s vs 0.3 s for this run-scan
        # on the sf0.1 corpus; same amortization story as the rest of
        # the bucketed family)
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids_s = ids[order]
        pp = g["p_pos"].to_numpy(dtype=np.int64)[order]
        pr = g["p_rep"].to_numpy(dtype=np.int64)[order]
        uniq, starts = np.unique(ids_s, return_index=True)
        return pd.DataFrame(
            {
                "doc_id": uniq,
                "n_pos": np.add.reduceat(pp, starts),
                "n_repeated_pos": np.add.reduceat(pr, starts),
            }
        )

    return (
        ds.map_batches(span_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_counts, batch_format="pandas")
        .groupby("doc_bucket")
        .map_groups(doc_totals, batch_format="pandas")
    )


def strip_repeated_spans(
    sf_dir: str,
    k: int = 5,
    n_buckets: int | None = None,
    max_broadcast_spans: int = 200_000_000,
) -> rd.Dataset:
    """The REMOVAL pass of substring dedup (Lee et al. 2022) —
    ``repeated_spans`` measures which positions are corpus-repeated;
    this op CUTS them: every token covered by at least one k-token span
    that occurs >= 2 times corpus-wide (multiplicity convention shared
    with ``repeated_spans``) is dropped, and the cleaned text is
    re-emitted per document.

    Scale shape — the corpus_prep two-pass pattern: pass 1 is the same
    bucketed span shuffle as ``repeated_spans`` (fixed-width (bucket,
    sh) rows, never text) whose per-bucket run-scan emits the DISTINCT
    repeated span hashes; that key set is duplicate-bounded, lands
    through ``bounded_driver_frame`` (cap + documented spill escape, the
    ``loser_keys`` discipline — boilerplate-heavy corpora should raise
    the cap or partition the strip by round range), and broadcasts once
    (``ray.put`` of a sorted int64 array). Pass 2 re-reads the text,
    recomputes each doc's span hashes locally, marks covered tokens with
    a vectorized interval-overlay (diff-array + cumsum), and rebuilds
    the text — so text never rides a shuffle and never lands on the
    driver. Span identity is the house ``hash64`` of the span string
    (same collision convention as ``repeated_spans``: the SQL oracle
    groups by the span string itself).

    Returns (doc_id, clean_text, n_dropped) for EVERY document (empty
    docs keep ``clean_text = ''``)."""
    from .common import bounded_driver_frame

    B = n_buckets or n_shuffle_buckets()
    assert B & (B - 1) == 0, f"n_buckets must be a power of two, got {B}"
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    _empty = pa.table({"bucket": pa.array([], pa.int64()), "sh": pa.array([], pa.int64())})

    def span_rows(t: pa.Table) -> pa.Table:
        parts = []
        for x in t["text"].to_pylist():
            s = tx.shingles(x, k=k)
            if s:
                parts.append(hash64(s).view(np.int64))  # positional: NOT uniqued
        if not parts:
            return _empty
        sh = np.concatenate(parts)
        return pa.table(
            {
                "bucket": pa.array(sh & np.int64(B - 1), pa.int64()),
                "sh": pa.array(sh, pa.int64()),
            }
        )

    _empty_rep = pd.DataFrame({"sh": pd.Series([], dtype="int64")})

    def bucket_repeats(g: pd.DataFrame) -> pd.DataFrame:
        sh = np.sort(g["sh"].to_numpy(dtype=np.int64))
        new_run = np.concatenate(([True], sh[1:] != sh[:-1]))
        starts = np.flatnonzero(new_run)
        run_len = np.diff(np.append(starts, len(sh)))
        rep = sh[starts[run_len >= 2]]
        return pd.DataFrame({"sh": rep}) if len(rep) else _empty_rep

    rep_frame = bounded_driver_frame(
        ds.map_batches(span_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_repeats, batch_format="pandas"),
        "strip_repeated_spans repeated-span keys (duplicate-bounded broadcast)",
        max_rows=max_broadcast_spans,
    )
    rep_sorted = np.sort(rep_frame["sh"].to_numpy(dtype=np.int64))
    rep_ref = ray.put(rep_sorted)

    def strip(t: pa.Table) -> pa.Table:
        rep = ray.get(rep_ref)
        out_text, out_drop = [], []
        for x in t["text"].to_pylist():
            toks = tx._RE_TOKEN.findall(x or "")
            n = len(toks)
            if n == 0:
                out_text.append("")
                out_drop.append(0)
                continue
            hv = hash64(tx.shingles(x, k=k)).view(np.int64)
            if len(rep):
                pos = np.minimum(np.searchsorted(rep, hv), len(rep) - 1)
                starts = np.flatnonzero(rep[pos] == hv)
            else:
                starts = np.empty(0, dtype=np.int64)
            if len(starts) == 0:
                out_text.append(" ".join(toks))
                out_drop.append(0)
                continue
            d = np.zeros(n + 1, dtype=np.int64)
            np.add.at(d, starts, 1)
            np.add.at(d, np.minimum(starts + k, n), -1)
            covered = np.cumsum(d[:n]) > 0
            out_text.append(" ".join(np.asarray(toks, dtype=object)[~covered].tolist()))
            out_drop.append(int(covered.sum()))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "clean_text": pa.array(out_text, pa.string()),
                "n_dropped": pa.array(out_drop, pa.int64()),
            }
        )

    return ds.map_batches(strip, batch_format="pyarrow")


def winnow_dedup_pairs(
    sf_dir: str,
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    df_ceiling: int = 256,
    n_buckets: int | None = None,
    max_driver_rows: int = _MAX_DRIVER_ROWS,
) -> pd.DataFrame:
    """Substring-overlap candidate pairs over WINNOWED fingerprints —
    the detection half of the MOSS pipeline
    (``textstats.winnow_fingerprints`` is the profile half; the
    selection kernel is shared, so index and query can never drift).
    Same inverted-index machinery as ``ngram_jaccard_pairs``, but the
    index holds only the ~2/(window+1) winnow-selected shingle hashes
    per doc, cutting index size ~(window+1)/2x while keeping the
    winnowing guarantee: any shared run of ``window + k - 1`` tokens
    still yields >= 1 shared fingerprint, so long-verbatim-overlap
    pairs cannot be missed. Pairs sharing >= ``min_shared``
    fingerprints are returned with the containment-style overlap
    ``n_shared / min(n_a, n_b)`` (exact integers + one float divide).

    df band, bucketed run-scan pair emission, and the lexsort+reduceat
    pair resolve are the ``ngram_jaccard_pairs``/``tf_cosine_pairs``
    discipline — fixed-width int rows on every shuffle, never text."""
    from ray.data.aggregate import Count

    from ..functions import text as _tx
    from .textstats import _winnow_positions

    B = n_buckets or n_shuffle_buckets()
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    _empty_rows = pa.table(
        {
            "fp": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "n_fp": pa.array([], pa.int64()),
        }
    )

    def fp_rows(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        fps, docs, ns = [], [], []
        for i, x in enumerate(texts):
            s = _tx.shingles(x, k=k)
            if not s:
                continue
            h = hash64(s)
            sel = np.unique(h[_winnow_positions(h, window)]).view(np.int64)
            fps.append(sel)
            docs.append(np.full(len(sel), ids[i], dtype=np.int64))
            ns.append(np.full(len(sel), len(sel), dtype=np.int64))
        if not fps:
            return _empty_rows
        return pa.table(
            {
                "fp": pa.array(np.concatenate(fps), pa.int64()),
                "doc_id": pa.array(np.concatenate(docs), pa.int64()),
                "n_fp": pa.array(np.concatenate(ns), pa.int64()),
            }
        )

    fp_ds = ds.map_batches(fp_rows, batch_format="pyarrow").materialize()
    keep = bounded_driver_frame(
        fp_ds.groupby("fp")
        .aggregate(Count(alias_name="df"))
        .filter(expr=f"df >= 2 and df <= {int(df_ceiling)}"),
        "winnow_dedup_pairs kept-fingerprint frame",
        max_driver_rows,
    )
    keep_keys = np.sort(keep["fp"].to_numpy(dtype=np.int64))
    keep_ref = ray.put(keep_keys)

    def only_kept(t: pa.Table) -> pa.Table:
        keep_ = ray.get(keep_ref)
        if len(keep_) == 0:
            t = t.slice(0, 0)
            kk = np.array([], dtype=np.int64)
        else:
            kk = t["fp"].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(keep_, kk), len(keep_) - 1)
            sel = keep_[pos] == kk
            t = t.filter(pa.array(sel))
            kk = kk[sel]
        return t.append_column("fb", pa.array(kk % B, pa.int64()))

    _empty_pairs = pd.DataFrame(
        {
            "pb": pd.Series([], dtype="int64"),
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "shared": pd.Series([], dtype="int64"),
            "n_a": pd.Series([], dtype="int64"),
            "n_b": pd.Series([], dtype="int64"),
        }
    )

    def co_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _empty_pairs
        fp = g["fp"].to_numpy(dtype=np.int64)
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        ns = g["n_fp"].to_numpy(dtype=np.int64)
        order = np.lexsort((ids, fp))
        f_s, i_s, n_s = fp[order], ids[order], ns[order]
        bounds = np.flatnonzero(np.concatenate(([True], f_s[1:] != f_s[:-1], [True])))
        outs = []
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            m = int(b1 - b0)
            if m < 2:
                continue
            ii, jj = np.triu_indices(m, k=1)
            outs.append(
                (
                    i_s[b0:b1][ii],
                    i_s[b0:b1][jj],
                    np.ones(len(ii), dtype=np.int64),
                    n_s[b0:b1][ii],
                    n_s[b0:b1][jj],
                )
            )
        if not outs:
            return _empty_pairs
        a = np.concatenate([o[0] for o in outs])
        b = np.concatenate([o[1] for o in outs])
        cnt = np.concatenate([o[2] for o in outs])
        na = np.concatenate([o[3] for o in outs])
        nb = np.concatenate([o[4] for o in outs])
        # in-bucket per-pair partial combine (lexsort + reduceat)
        order2 = np.lexsort((b, a))
        a, b, cnt, na, nb = a[order2], b[order2], cnt[order2], na[order2], nb[order2]
        new = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        starts = np.flatnonzero(new)
        a, b, na, nb = a[starts], b[starts], na[starts], nb[starts]
        cnt = np.add.reduceat(cnt, starts)
        pb = (
            (a.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + b.view(np.uint64))
            % np.uint64(B)
        ).astype(np.int64)
        return pd.DataFrame(
            {"pb": pb, "doc_a": a, "doc_b": b, "shared": cnt, "n_a": na, "n_b": nb}
        )

    _empty_out = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "n_shared": pd.Series([], dtype="int64"),
            "overlap": pd.Series([], dtype="float64"),
        }
    )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        a = g["doc_a"].to_numpy(dtype=np.int64)
        b = g["doc_b"].to_numpy(dtype=np.int64)
        cnt = g["shared"].to_numpy(dtype=np.int64)
        na = g["n_a"].to_numpy(dtype=np.int64)
        nb = g["n_b"].to_numpy(dtype=np.int64)
        order = np.lexsort((b, a))
        a, b, cnt, na, nb = a[order], b[order], cnt[order], na[order], nb[order]
        new = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        starts = np.flatnonzero(new)
        a, b, na, nb = a[starts], b[starts], na[starts], nb[starts]
        cnt = np.add.reduceat(cnt, starts)
        keep_m = cnt >= min_shared
        if not keep_m.any():
            return _empty_out
        ov = cnt[keep_m] / np.minimum(na[keep_m], nb[keep_m])
        return pd.DataFrame(
            {
                "doc_a": a[keep_m],
                "doc_b": b[keep_m],
                "n_shared": cnt[keep_m],
                "overlap": np.round(ov, 4),
            }
        )

    out = (
        fp_ds.map_batches(only_kept, batch_format="pyarrow")
        .groupby("fb")
        .map_groups(co_pairs, batch_format="pandas")
        .groupby("pb")
        .map_groups(resolve, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return _empty_out
    out = out.astype({"doc_a": "int64", "doc_b": "int64", "n_shared": "int64"})
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def paragraph_dedup_ds(
    ds: rd.Dataset,
    min_chars: int = 1,
    max_driver_rows: int = _MAX_DRIVER_ROWS,
) -> rd.Dataset:
    """Corpus-wide FIRST-OCCURRENCE paragraph dedup (the exact-substring
    half of the CCNet recipe, where ``line_dedup`` is the boilerplate
    half): every newline-delimited paragraph keeps only its globally
    first occurrence — ordered by (doc_id, position) — and every later
    occurrence is deleted, whether it repeats across documents or
    inside one. Paragraphs shorter than ``min_chars`` (default: empty
    lines) are exempt, so blank separators survive.

    Scale shape — ``line_dedup``'s two passes with a WINNER column
    riding the vocab side:

      pass 1: per-batch (line-hash, count, min packed-position)
        partials — packed = doc_id * 2^21 + pidx (asserted: doc_id <
        2^42, <2^21 paragraphs/doc; 8.8e12 docs headroom), min over a
        lexsorted ``np.minimum.reduceat`` — then ONE groupby
        (Min, Sum), filtered to count >= 2. The collected frame is
        bounded by DISTINCT duplicated paragraphs (duplicate-bounded,
        cap-guarded like loser_keys) and broadcast once as two sorted
        int64 arrays.
      pass 2: shuffle-free — re-split, hash, searchsorted membership;
        an occurrence is dropped iff it matches a duplicated paragraph
        AND its packed position differs from the winner's. Reassembly
        and removal counts are the ``line_dedup`` kernels.

    Text never rides a shuffle; the all-to-all moves one fixed-width
    partial row per (line-hash, batch). 64-bit hash collisions would
    merge two paragraphs' occurrence lists (~n^2/2^65); widen to 128
    bits at >10^9 distinct paragraphs, as ``line_dedup`` documents.

    Dataset-in/Dataset-out so it chains (``ccnet_corpus`` feeds its
    output into ``line_dedup_ds``): non-text columns pass through,
    the cleaned text comes back as ``text``. The thin
    :func:`paragraph_dedup` wrapper keeps the legacy sf_dir +
    ``text_clean`` frame contract."""
    SHIFT = 21

    def _split(t: pa.Table):
        import pyarrow.compute as pc

        text = pc.fill_null(t["text"].combine_chunks(), "")
        ls = pc.split_pattern(text, pattern="\n")
        lens = pc.list_value_length(ls).to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.repeat(t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False), lens)
        flat_arr = pc.list_flatten(ls)
        nchars = pc.utf8_length(flat_arr).to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1])).astype(np.int64)
        pidx = np.arange(len(doc), dtype=np.int64) - np.repeat(starts, lens)
        assert len(doc) == 0 or (
            int(doc.min()) >= 0
            and int(doc.max()) < (1 << (63 - SHIFT))
            and int(pidx.max()) < (1 << SHIFT)
        ), "paragraph_dedup: packed (doc_id, position) key out of range (see docstring)"
        return doc, lens, starts, pidx, flat_arr, nchars

    _empty_p = pa.table(
        {
            "lh": pa.array([], pa.int64()),
            "p_n": pa.array([], pa.int64()),
            "p_min": pa.array([], pa.int64()),
        }
    )

    def partial(t: pa.Table) -> pa.Table:
        doc, _, _, pidx, flat_arr, nchars = _split(t)
        el = nchars >= min_chars
        if not el.any():
            return _empty_p
        lh = hash64(np.asarray(flat_arr.to_pylist(), dtype=object)[el]).view(np.int64)
        packed = (doc[el] << SHIFT) + pidx[el]
        o = np.argsort(lh, kind="stable")
        lh_s, pk_s = lh[o], packed[o]
        first = np.concatenate(([True], lh_s[1:] != lh_s[:-1]))
        runs = np.flatnonzero(first)
        return pa.table(
            {
                "lh": pa.array(lh_s[runs], pa.int64()),
                "p_n": pa.array(np.diff(np.append(runs, len(lh_s))), pa.int64()),
                "p_min": pa.array(np.minimum.reduceat(pk_s, runs), pa.int64()),
            }
        )

    from ray.data.aggregate import Min, Sum

    dup_frame = bounded_driver_frame(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lh")
        .aggregate(Sum("p_n", alias_name="n"), Min("p_min", alias_name="win"))
        .filter(expr="n >= 2")
        .select_columns(["lh", "win"]),
        "paragraph_dedup duplicated-paragraph set (distinct dup paragraphs)",
        max_driver_rows,
    )
    if "lh" in dup_frame.columns and len(dup_frame):
        o = np.argsort(dup_frame["lh"].to_numpy(dtype=np.int64))
        dup_lh = dup_frame["lh"].to_numpy(dtype=np.int64)[o]
        dup_win = dup_frame["win"].to_numpy(dtype=np.int64)[o]
    else:  # empty Datasets drop the schema
        dup_lh = np.array([], dtype=np.int64)
        dup_win = np.array([], dtype=np.int64)
    d_ref = ray.put((dup_lh, dup_win))

    def clean(t: pa.Table) -> pa.Table:
        lh_, win_ = ray.get(d_ref)
        doc, lens, starts, pidx, flat_arr, nchars = _split(t)
        flat = flat_arr.to_pylist()
        drop = np.zeros(len(flat), dtype=bool)
        el = nchars >= min_chars
        if el.any() and len(lh_):
            lh = hash64(np.asarray(flat, dtype=object)[el]).view(np.int64)
            packed = (doc[el] << SHIFT) + pidx[el]
            pos = np.minimum(np.searchsorted(lh_, lh), len(lh_) - 1)
            m = lh_[pos] == lh
            drop[np.flatnonzero(el)] = m & (packed != win_[pos])
        n_removed = (
            np.add.reduceat(drop.astype(np.int64), starts)
            if len(flat)
            else np.zeros(len(lens), dtype=np.int64)
        )
        n_removed[lens == 0] = 0  # reduceat repeats on empty runs
        texts = []
        for i in range(len(lens)):
            a, b = starts[i], starts[i] + lens[i]
            texts.append("\n".join(flat[j] for j in range(a, b) if not drop[j]))
        cols = {c: t[c] for c in t.column_names if c != "text"}
        cols["text"] = pa.array(texts, pa.string())
        cols["n_removed_paras"] = pa.array(n_removed, pa.int64())
        return pa.table(cols)

    return ds.map_batches(clean, batch_format="pyarrow")


def paragraph_dedup(
    sf_dir: str,
    min_chars: int = 1,
    max_driver_rows: int = _MAX_DRIVER_ROWS,
) -> pd.DataFrame:
    """sf_dir entry point for :func:`paragraph_dedup_ds` (docstring
    there): reads ``documents``, returns the legacy sorted
    (doc_id, text_clean, n_removed_paras) frame."""
    out = (
        paragraph_dedup_ds(
            T(sf_dir, "documents", columns=["doc_id", "text"]),
            min_chars=min_chars,
            max_driver_rows=max_driver_rows,
        )
        .to_pandas()
        .rename(columns={"text": "text_clean"})
    )
    out = out[["doc_id", "text_clean", "n_removed_paras"]]
    return out.sort_values("doc_id").reset_index(drop=True)


def neardup_index_build(
    sf_dir: str, index_dir: str, parity: int = 0, n_parts: int = 64
) -> int:
    """Persist the corpus's MinHash near-dup probe state as a
    hash-partitioned index — the FUZZY sibling of ``dedup_index_build``
    (which serves only exact dedup): ``bands/part=N/`` holds
    (band_id, band_hash, doc_id) rows routed by ``band_hash & (P-1)``
    and ``sigs/part=M/`` holds each doc's 64-perm signature routed by
    ``doc_id & (P-1)``, so a later shard can find its near-duplicates
    against the corpus WITHOUT re-reading corpus text — index
    residence is 16 band rows + 512 B of signature per doc. Band
    hashing is ``_band_hashes``, shared with the one-shot miner, so
    index and probe can never drift. Staged write + atomic rename
    (the postings-index crash-safety discipline). ``parity`` selects
    the fixture's demo split (0 = even doc_ids as the "existing
    corpus"). Returns the indexed-doc count."""
    import json
    import os
    import shutil

    import pyarrow.parquet as pq

    assert n_parts & (n_parts - 1) == 0, f"n_parts must be a power of two, got {n_parts}"
    a, b = tx.minhash_params(_MINHASH_PERMS)
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def band_rows(t: pa.Table) -> pa.Table:
        keep = pa.array((t["doc_id"].to_numpy(zero_copy_only=False) & 1) == parity)
        t = t.filter(keep)
        _, sigs, nonempty = _signatures(t, a, b)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[nonempty]
        bh = _band_hashes(sigs[nonempty]).ravel()
        return pa.table(
            {
                "part": pa.array(bh & (n_parts - 1), pa.int64()),
                "band_id": pa.array(
                    np.tile(np.arange(_LSH_BANDS, dtype=np.int64), len(ids)), pa.int64()
                ),
                "band_hash": pa.array(bh, pa.int64()),
                "doc_id": pa.array(np.repeat(ids, _LSH_BANDS), pa.int64()),
            }
        )

    def sig_rows(t: pa.Table) -> pa.Table:
        keep = pa.array((t["doc_id"].to_numpy(zero_copy_only=False) & 1) == parity)
        t = t.filter(keep)
        _, sigs, nonempty = _signatures(t, a, b)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[nonempty]
        return pa.table(
            {
                "part": pa.array(ids & (n_parts - 1), pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "sig": pa.array(
                    list(sigs[nonempty].view(np.int64)), pa.list_(pa.int64())
                ),
            }
        )

    staging = index_dir.rstrip("/") + ".build-tmp"
    shutil.rmtree(staging, ignore_errors=True)
    ds.map_batches(band_rows, batch_format="pyarrow").write_parquet(
        os.path.join(staging, "bands"), partition_cols=["part"]
    )
    sig_ds = ds.map_batches(sig_rows, batch_format="pyarrow").materialize()
    n = int(sig_ds.count())
    sig_ds.write_parquet(os.path.join(staging, "sigs"), partition_cols=["part"])
    with open(os.path.join(staging, "meta.json"), "w") as f:
        json.dump({"n_parts": n_parts, "parity": parity, "n_docs": n}, f)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.rename(staging, index_dir)
    return n


def neardup_incremental(
    sf_dir: str,
    index_dir: str | None = None,
    parity: int = 1,
    threshold: float = 0.5,
    update_index: bool = False,
    shard_tag: str = "inc",
    max_driver_rows: int = _MAX_DRIVER_ROWS,
) -> pd.DataFrame:
    """Incremental NEAR-dup detection of a new shard against the
    persisted MinHash index — the fuzzy sibling of
    ``exact_dedup_incremental`` and the missing operational half of
    ``minhash_lsh_pairs`` (one-shot mining re-shingles the whole
    corpus per run; a daily crawl wants yesterday's corpus as an
    INDEX). Returns (new_doc, index_doc, est_jaccard) for every new
    doc whose estimated Jaccard against an indexed doc reaches
    ``threshold``.

    Semantics note (documented divergence from the one-shot miner):
    the verify step scores the SIGNATURE-estimated Jaccard (fraction
    of agreeing minhash rows, 64 perms — standard error ~1/8 at j=0.5)
    rather than re-shingling index text, because the index stores no
    text — that is the point. Pytest pins planted near-dups found,
    unrelated docs rejected at margin, and the post-``update_index``
    re-probe contract.

    Scale shape: the new shard's band rows route to ``part =
    band_hash & (P-1)`` in ONE groupby; each per-part probe task reads
    exactly its own ``bands/part=N/`` files and emits (new, idx)
    id-pairs from a lexsorted run-scan join. Candidate pairs are
    duplicate-bounded (cap-guarded); index signatures are fetched by
    opening ONLY the ``sigs/part=M/`` partitions the candidates' doc
    ids route to (path-pruned); new-side signatures come from one
    shuffle-free filtered pass over the shard. Nothing corpus-sized
    moves or lands."""
    import json
    import os

    import pyarrow.parquet as pq
    import ray

    if index_dir is None:
        import hashlib

        doc_path = os.path.join(sf_dir, "documents.parquet")
        st = os.stat(doc_path)
        fp = hashlib.sha1(
            f"{os.path.abspath(doc_path)}|{st.st_size}|{st.st_mtime_ns}".encode()
        ).hexdigest()[:16]
        index_dir = os.path.join("/tmp", "bsr_neardup_index", fp)
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        neardup_index_build(sf_dir, index_dir, parity=1 - parity)
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    P = int(meta["n_parts"])

    a, b = tx.minhash_params(_MINHASH_PERMS)
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def new_band_rows(t: pa.Table) -> pa.Table:
        keep = pa.array((t["doc_id"].to_numpy(zero_copy_only=False) & 1) == parity)
        t = t.filter(keep)
        _, sigs, nonempty = _signatures(t, a, b)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[nonempty]
        bh = _band_hashes(sigs[nonempty]).ravel()
        return pa.table(
            {
                "part": pa.array(bh & (P - 1), pa.int64()),
                "band_id": pa.array(
                    np.tile(np.arange(_LSH_BANDS, dtype=np.int64), len(ids)), pa.int64()
                ),
                "band_hash": pa.array(bh, pa.int64()),
                "doc_id": pa.array(np.repeat(ids, _LSH_BANDS), pa.int64()),
            }
        )

    _empty_pairs = pd.DataFrame(
        {"new_doc": pd.Series([], dtype="int64"), "index_doc": pd.Series([], dtype="int64")}
    )

    def probe(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["part"].iloc[0])
        pdir = os.path.join(index_dir, "bands", f"part={part}")
        if not os.path.isdir(pdir):
            return _empty_pairs
        idx = pq.read_table(pdir, columns=["band_id", "band_hash", "doc_id"]).to_pandas()
        m = g[["band_id", "band_hash", "doc_id"]].merge(
            idx, on=["band_id", "band_hash"], suffixes=("_new", "_idx")
        )
        if not len(m):
            return _empty_pairs
        out = pd.DataFrame(
            {
                "new_doc": m["doc_id_new"].to_numpy(np.int64),
                "index_doc": m["doc_id_idx"].to_numpy(np.int64),
            }
        )
        out = out[out["new_doc"] != out["index_doc"]]  # post-update self-hits
        return out.drop_duplicates()

    from .common import bounded_driver_frame

    cand = bounded_driver_frame(
        ds.map_batches(new_band_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(probe, batch_format="pandas"),
        "neardup_incremental candidate pairs (duplicate-bounded)",
        max_driver_rows,
    )
    _empty_out = pd.DataFrame(
        {
            "new_doc": pd.Series([], dtype="int64"),
            "index_doc": pd.Series([], dtype="int64"),
            "est_jaccard": pd.Series([], dtype="float64"),
        }
    )
    if len(cand) == 0:
        out = _empty_out
    else:
        cand = cand.drop_duplicates().reset_index(drop=True)
        # index-side signatures: open ONLY the candidate parts
        need_parts = sorted({int(d) & (P - 1) for d in cand["index_doc"]})
        need_docs = set(int(d) for d in cand["index_doc"])
        sig_idx: dict[int, np.ndarray] = {}
        for m_ in need_parts:
            pdir = os.path.join(index_dir, "sigs", f"part={m_}")
            if not os.path.isdir(pdir):
                continue
            t = pq.read_table(pdir, columns=["doc_id", "sig"])
            for did, s in zip(t["doc_id"].to_pylist(), t["sig"].to_pylist()):
                if did in need_docs:
                    sig_idx[did] = np.asarray(s, dtype=np.int64)
        # new-side signatures: one shuffle-free filtered pass
        need_new = set(int(d) for d in cand["new_doc"])
        nref = ray.put(np.sort(np.fromiter(need_new, dtype=np.int64, count=len(need_new))))

        def new_sigs(t: pa.Table) -> pa.Table:
            nd = ray.get(nref)
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(nd, ids), len(nd) - 1) if len(nd) else None
            keep = pa.array(nd[pos] == ids if len(nd) else np.zeros(len(ids), bool))
            t = t.filter(keep)
            _, sigs, nonempty = _signatures(t, a, b)
            ids2 = t["doc_id"].to_numpy(zero_copy_only=False)[nonempty]
            return pa.table(
                {
                    "doc_id": pa.array(ids2, pa.int64()),
                    "sig": pa.array(list(sigs[nonempty].view(np.int64)), pa.list_(pa.int64())),
                }
            )

        nt = ds.map_batches(new_sigs, batch_format="pyarrow").to_pandas()
        sig_new = {int(d): np.asarray(s, dtype=np.int64) for d, s in zip(nt["doc_id"], nt["sig"])}
        est = np.array(
            [
                float((sig_new[int(nd_)] == sig_idx[int(id_)]).mean())
                if int(nd_) in sig_new and int(id_) in sig_idx
                else 0.0
                for nd_, id_ in zip(cand["new_doc"], cand["index_doc"])
            ]
        )
        keep = est >= threshold
        out = pd.DataFrame(
            {
                "new_doc": cand["new_doc"].to_numpy(np.int64)[keep],
                "index_doc": cand["index_doc"].to_numpy(np.int64)[keep],
                "est_jaccard": np.round(est[keep], 4),
            }
        ).sort_values(["new_doc", "index_doc"]).reset_index(drop=True)

    if update_index:
        import pyarrow.parquet as _pq

        tag_path = os.path.join(index_dir, f"ingested-{shard_tag}.json")
        if not os.path.exists(tag_path):  # exactly-once per shard_tag
            # SIGS FIRST: a crash between the two writes must leave
            # orphan signatures (never probed — harmless), not band rows
            # without signatures (probed, scored 0.0, dup silently
            # dropped). A retry re-appends both; duplicate band rows only
            # duplicate candidates, which drop_duplicates() absorbs.
            def shard_sig_rows(t: pa.Table) -> pa.Table:
                keep = pa.array(
                    (t["doc_id"].to_numpy(zero_copy_only=False) & 1) == parity
                )
                t = t.filter(keep)
                _, sigs, nonempty = _signatures(t, a, b)
                ids = t["doc_id"].to_numpy(zero_copy_only=False)[nonempty]
                return pa.table(
                    {
                        "part": pa.array(ids & (P - 1), pa.int64()),
                        "doc_id": pa.array(ids, pa.int64()),
                        "sig": pa.array(list(sigs[nonempty].view(np.int64)), pa.list_(pa.int64())),
                    }
                )

            ds.map_batches(shard_sig_rows, batch_format="pyarrow").write_parquet(
                os.path.join(index_dir, "sigs"), partition_cols=["part"]
            )
            ds.map_batches(new_band_rows, batch_format="pyarrow").write_parquet(
                os.path.join(index_dir, "bands"), partition_cols=["part"]
            )
            with open(tag_path, "w") as f:
                json.dump({"tag": shard_tag}, f)
    return out
