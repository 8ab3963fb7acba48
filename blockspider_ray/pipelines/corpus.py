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
moves (fp, round, seq) triples — never the text. The groupby emits the
LOSER keys (duplicate rows beyond each fingerprint's first); losers are
broadcast once (``ray.put`` of a sorted uint64 key array) and the text
stream is anti-filtered per batch — so text never rides a shuffle and
never lands on the driver. The broadcast is sized by the duplicate
count, not the corpus: at 100 TB with d% duplicates the array is
d% x 8 bytes/row, and a corpus degenerate enough to break that
(>> 10^9 dups) should raise ``max_broadcast_losers`` or pre-partition
by round range.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions import text as tx
from .consumer import consume_crawl_log


def _accepted_only(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    return t.filter(pc.equal(t.column("status"), "ACCEPTED"))


def dedup_keys(ds: rd.Dataset) -> rd.Dataset:
    """Project the corpus stream to (fp, round, seq) triples — the ONLY
    columns the dedup shuffle is allowed to move (schema pinned by
    test_pipelines.TestCorpusPrep)."""

    def fp_keys(t: pa.Table) -> pa.Table:
        fp = tx.fingerprint64(t.column("text").to_pylist())
        return pa.table(
            {
                "fp": pa.array(fp, pa.uint64()),
                "round": t.column("round"),
                "seq": t.column("seq"),
            }
        )

    return ds.map_batches(fp_keys, batch_format="pyarrow")


def loser_keys(
    keys: rd.Dataset,
    n_buckets: int | None = None,
    max_broadcast_losers: int = 200_000_000,
) -> np.ndarray:
    """First-wins dedup decision, dispatch-amortized: the shuffle key is
    ``fp % B`` (B ~ cluster CPUs via ``n_shuffle_buckets``) — NOT the raw
    fingerprint, which at corpus scale is one group per document and pays
    Ray's per-group dispatch 10^10 times. Inside each bucket a numpy
    lexsort run-scan keeps the minimal ``round<<32|seq`` per fingerprint
    run and emits every OTHER row's combined key (the same pattern as
    dedup.py's candidate shuffles). Returns the sorted loser-key array
    (sized by the duplicate count only).

    ``max_broadcast_losers`` caps the driver-heap landing (via
    ``bounded_driver_frame``): one int64 per duplicate row, so the
    default 2e8 is ~1.6 GB of keys — past that the corpus is degenerate
    and the loser set should be spilled to parquet and the anti-filter
    run per round-range instead of one global broadcast."""
    from .common import bounded_driver_frame, n_shuffle_buckets

    B = n_buckets or n_shuffle_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        fp = t["fp"].to_numpy(zero_copy_only=False).astype(np.uint64)
        k = (
            t["round"].to_numpy(zero_copy_only=False).astype(np.uint64) << np.uint64(32)
        ) | t["seq"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "fpb": pa.array((fp % np.uint64(B)).astype(np.int64), pa.int64()),
                # fp ships as the int64 BIT PATTERN (equality-only key,
                # keeps the shuffle column Arrow-int64-safe)
                "fp": pa.array(fp.view(np.int64), pa.int64()),
                # round < 2^31 => k < 2^63: plain non-negative int64, so
                # int64 sort order == uint64 order and min is min
                "k": pa.array(k.view(np.int64), pa.int64()),
            }
        )

    _empty = pd.DataFrame({"k": pd.Series([], dtype="int64")})

    def losers(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _empty
        fp = g["fp"].to_numpy(dtype=np.int64)
        k = g["k"].to_numpy(dtype=np.int64)
        order = np.lexsort((k, fp))
        fp_s, k_s = fp[order], k[order]
        first = np.concatenate(([True], fp_s[1:] != fp_s[:-1]))
        if first.all():
            return _empty
        return pd.DataFrame({"k": k_s[~first]})

    lose = bounded_driver_frame(
        keys.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("fpb")
        .map_groups(losers, batch_format="pandas"),
        "corpus_prep loser_keys (duplicate-bounded broadcast)",
        max_rows=max_broadcast_losers,
    )
    if len(lose) == 0:
        return np.array([], dtype=np.uint64)
    return np.sort(lose["k"].to_numpy(dtype=np.int64).view(np.uint64))


def corpus_prep(
    out_dir: str,
    ckpt_dir: str | None,
    corpus_dir: str,
    *,
    min_quality: float = 0.3,
    min_tokens: int = 5,
    near_dup_threshold: float | None = None,
) -> dict:
    """Run the corpus-prep flow; returns summary counts.

    Output layout: ``corpus_dir/lang=XX/part-*.parquet`` — one directory
    per language, so a rerun can skip finished partitions and training
    readers can prune by language at the path level.

    ``near_dup_threshold`` switches on FUZZY dedup after the exact pass
    (the standard corpus recipe: exact -> minhash-LSH pairs -> connected
    components -> keep one canonical doc per cluster): pairs are mined
    over the exact-deduped stream with ``dedup.minhash_lsh_pairs_ds`` at
    the given Jaccard threshold, resolved to clusters with
    ``clusters.connected_components`` (hash-to-min, fully distributed),
    and every NON-canonical cluster member's (round, seq) key joins the
    loser broadcast. Costs one extra column-pruned read of the log (the
    same reads-over-text-shuffles trade the exact pass documents) plus
    the pair-mining shuffles (fixed-width rows only)."""
    ds = consume_crawl_log(out_dir, ckpt_dir, min_links=0).map_batches(
        _accepted_only, batch_format="pyarrow"
    )

    # exact dedup, first-wins by (round, seq) per normalized-text hash.
    # Pass 1 shuffles (fp, round, seq) triples only; the loser keys come
    # back as one broadcast array; pass 2 re-reads the round-pruned log
    # and anti-filters per batch. Two reads of the (column-pruned,
    # round-keyed) log are far cheaper than one text-bearing shuffle.
    lose = loser_keys(dedup_keys(ds))
    lose_ref = ray.put(lose)

    def drop_losers(t: pa.Table) -> pa.Table:
        lose_ = ray.get(lose_ref)
        if len(lose_) == 0:
            return t
        k = (t.column("round").to_numpy(zero_copy_only=False).astype(np.uint64) << np.uint64(32)) | t.column(
            "seq"
        ).to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = np.minimum(np.searchsorted(lose_, k), len(lose_) - 1)
        return t.filter(pa.array(lose_[pos] != k))

    ds = consume_crawl_log(out_dir, ckpt_dir, min_links=0).map_batches(
        _accepted_only, batch_format="pyarrow"
    ).map_batches(drop_losers, batch_format="pyarrow")

    n_near_dropped = 0
    if near_dup_threshold is not None:
        from .clusters import connected_components
        from .dedup import minhash_lsh_pairs_ds

        # doc key = round<<32|seq (round < 2^31 => non-negative int64),
        # the same combined key the exact pass anti-filters on — so the
        # cluster losers drop with the identical searchsorted pattern
        def to_docs(t: pa.Table) -> pa.Table:
            k = (
                t.column("round").to_numpy(zero_copy_only=False).astype(np.uint64)
                << np.uint64(32)
            ) | t.column("seq").to_numpy(zero_copy_only=False).astype(np.uint64)
            return pa.table(
                {
                    "doc_id": pa.array(k.view(np.int64), pa.int64()),
                    "text": t.column("text"),
                }
            )

        pairs = minhash_lsh_pairs_ds(
            ds.map_batches(to_docs, batch_format="pyarrow"), threshold=near_dup_threshold
        )
        cc = connected_components(pairs)
        nd = cc.loc[cc["doc_id"] != cc["cluster_id"], "doc_id"].to_numpy(dtype=np.int64)
        n_near_dropped = int(len(nd))
        if n_near_dropped:
            nd_ref = ray.put(np.sort(nd.view(np.uint64)))

            def drop_noncanon(t: pa.Table) -> pa.Table:
                nd_ = ray.get(nd_ref)
                k = (
                    t.column("round").to_numpy(zero_copy_only=False).astype(np.uint64)
                    << np.uint64(32)
                ) | t.column("seq").to_numpy(zero_copy_only=False).astype(np.uint64)
                pos = np.minimum(np.searchsorted(nd_, k), len(nd_) - 1)
                return t.filter(pa.array(nd_[pos] != k))

            ds = ds.map_batches(drop_noncanon, batch_format="pyarrow")

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
    return {"kept": int(n_kept), "corpus_dir": corpus_dir, "near_dups_dropped": n_near_dropped}


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


def mixture_sample(
    sf_dir: str,
    rates: dict[str, float] | None = None,
    default_rate: float = 0.5,
) -> rd.Dataset:
    """Deterministic per-source corpus mixing: keep each document with
    its source's target rate (the data-mixture step every multi-source
    training corpus runs — e.g. upsample curated sources, downsample
    raw web). Like ``hash_split``, membership is a pure function of
    doc_id, so the op is a shuffle-free ``map_batches`` filter any
    worker can recompute locally, rerun-stable and join-free at any
    scale; unlike a seeded ``random_shuffle``+``limit`` it needs no
    global pass and keeps per-source proportions exact in expectation
    regardless of partitioning.

    The sampling variate re-mixes ``hash_split``'s Knuth hash through an
    xorshift-multiply round (xxhash's second prime) so the two ops'
    decisions are decorrelated: a doc's split and its mixture draw are
    independent. The DuckDB oracle evaluates the identical integer
    expression in HUGEINT (mod-2^32 ring at every step)."""
    from .common import T

    if rates is None:
        rates = {"src0": 1.0, "src1": 0.25}
    ds = T(sf_dir, "documents", columns=["doc_id", "source"])
    m32 = np.uint64(1 << 32)

    def keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % m32
        u = ((h ^ (h >> np.uint64(16))) * np.uint64(2246822519)) % m32
        draw = u % np.uint64(10000)
        src = np.asarray(t["source"].to_pylist(), dtype=object)
        thresh = np.fromiter(
            (int(rates.get(s, default_rate) * 10000) for s in src),
            dtype=np.uint64,
            count=len(src),
        )
        return t.filter(pa.array(draw < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def rebalance_langs(sf_dir: str) -> rd.Dataset:
    """Language-distribution rebalancing: downsample every language to
    (in expectation) the SMALLEST language's document count — the
    uniform-mixture step a multilingual corpus runs so high-resource
    languages don't drown the tail. Pass 1 is a |langs|-row count
    groupby (in-batch partials); the per-language keep thresholds are
    integer-exact ``(min_count * 10000) // count`` so both engines
    compute the identical cut, broadcast once. Pass 2 is the
    ``mixture_sample`` shuffle-free hash filter (same decorrelated
    xorshift-multiply ring — a doc's rebalance draw equals its mixture
    draw by design: both model 'the' sampling variate of the doc)."""
    from ray.data.aggregate import Sum

    from .common import T, rename

    ds = T(sf_dir, "documents", columns=["doc_id", "lang"])

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("lang").aggregate([([], "count_all")])
        return rename(g, {"count_all": "p_n"})

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("p_n", alias_name="n"))
        .to_pandas()  # |langs| rows only
    )
    mn = int(counts["n"].min())
    thresh = {l: (mn * 10000) // int(n) for l, n in zip(counts["lang"], counts["n"])}
    tref = ray.put(thresh)

    m32 = np.uint64(1 << 32)

    def keep(t: pa.Table) -> pa.Table:
        th = ray.get(tref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % m32
        u = ((h ^ (h >> np.uint64(16))) * np.uint64(2246822519)) % m32
        draw = u % np.uint64(10000)
        lang = np.asarray(t["lang"].to_pylist(), dtype=object)
        cut = np.fromiter((th[s] for s in lang), dtype=np.uint64, count=len(lang))
        return t.filter(pa.array(draw < cut))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(sf_dir: str, n_per: int = 20) -> pd.DataFrame:
    """Deterministic stratified sample: exactly ``n_per`` documents per
    language (or all of a smaller stratum), chosen by ascending
    mixture-hash order — the reproducible eval-set / inspection-sample
    constructor (a seeded random sample whose membership any worker can
    recompute, stable under repartitioning and reruns).

    Scale shape: per-batch partial top-``n_per`` per language (lexsort
    run-scan — one sort per batch, no per-group dispatch), then one
    tiny groupby over at most n_langs x n_per x n_batches partial rows
    for the final cut. The full corpus never sorts globally and the
    shuffle moves only (lang, doc_id, draw) triples. Ties cannot occur:
    the sort key is (draw, doc_id) and doc_id is unique."""
    from .common import T

    ds = T(sf_dir, "documents", columns=["doc_id", "lang"])
    m32 = np.uint64(1 << 32)

    def partial_topn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % m32
        draw = ((h ^ (h >> np.uint64(16))) * np.uint64(2246822519)) % m32
        lang = np.asarray(t["lang"].to_pylist(), dtype=object)
        o = np.lexsort((ids, draw, lang))
        l_s = lang[o]
        starts = np.flatnonzero(np.concatenate(([True], l_s[1:] != l_s[:-1])))
        runs = np.diff(np.append(starts, len(l_s)))
        rank = np.arange(len(l_s)) - np.repeat(starts, runs)
        keep = o[rank < n_per]
        return pa.table(
            {
                "lang": pa.array(lang[keep].tolist(), pa.string()),
                "doc_id": pa.array(ids[keep].view(np.int64), pa.int64()),
                "draw": pa.array(draw[keep].view(np.int64), pa.int64()),
            }
        )

    def final_topn(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["draw", "doc_id"]).head(n_per)

    out = (
        ds.map_batches(partial_topn, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(final_topn, batch_format="pandas")  # n_langs groups, bounded
        .to_pandas()
    )
    out = out[["lang", "doc_id"]].astype({"doc_id": "int64"})
    return out.sort_values(["lang", "doc_id"]).reset_index(drop=True)


def hash_split(sf_dir: str, pcts: tuple[int, int] = (90, 95)) -> rd.Dataset:
    """Deterministic train/val/test assignment by multiplicative hash of
    the document key (Knuth 2654435761 mod 2^32) — the reproducible,
    order-independent, join-free split every training pipeline needs:
    any worker can recompute any doc's split locally, so the op is a
    pure map_batches with no shuffle and no stored split table required.
    The DuckDB oracle evaluates the identical integer expression (mod
    2^32 before the multiply, widened to HUGEINT — equal by the mod-2^32
    ring homomorphism, and overflow-free at any doc_id). Assumes
    doc_id >= 0 (negative ids would wrap differently in numpy uint64 vs
    SQL signed %)."""
    from .common import T

    ds = T(sf_dir, "documents", columns=["doc_id"])
    train_lt, val_lt = pcts

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((ids * np.uint64(2654435761)) % np.uint64(1 << 32)) % np.uint64(100)
        split = np.select([b < train_lt, b < val_lt], ["train", "val"], default="test")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "split": pa.array(split, pa.string()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def poisson_sample(sf_dir: str, k: int = 100) -> rd.Dataset:
    """Weight-proportional Poisson sample: include document *i* with
    probability ``min(1, k * w_i / W)`` where ``w_i = n_chars`` and
    ``W = sum(n_chars)`` — the token-budget subsampler every mixture
    recipe needs (expected sample size ≤ k, long documents favored in
    proportion to the training tokens they contribute). Membership is a
    pure function of ``doc_id`` (the ``hash_split`` ring + the
    ``mixture_sample`` xorshift remix), so any worker can recompute any
    doc's fate locally: the op is one shuffle-free ``map_batches`` after
    a single scalar aggregate for ``W`` (driver state = one int).

    Exactness: the inclusion test ``draw/2^32 < k*w_i/W`` is evaluated
    in INTEGERS on both sides — ``draw <= (k*w_i*2^32 - 1) // W`` — so
    the DuckDB oracle (HUGEINT arithmetic, ``//`` integer division)
    matches bit-for-bit with no float threshold anywhere. The ``min(1,·)``
    branch needs no code: when ``k*w_i >= W`` the threshold is >= 2^32-1
    and every draw passes. Guard: ``k * max(w_i) * 2^32`` must fit
    uint64, i.e. ``k * max_chars < 2^32`` — at a larger token budget,
    split k across sub-samples (documented escape, not silent wrap)."""
    from .common import T

    ds = T(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    # one distributed Sum -> a scalar on the driver (never corpus-sized)
    total_w = int(ds.sum("n_chars"))
    m32 = np.uint64(1 << 32)

    def pick(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % m32
        draw = ((h ^ (h >> np.uint64(16))) * np.uint64(2246822519)) % m32
        w = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if len(w) and int(w.max()) * k >= (1 << 32):
            raise ValueError(
                f"poisson_sample: k={k} * max n_chars={int(w.max())} overflows the "
                f"2^32 threshold ring; split the budget across sub-samples"
            )
        # w == 0 docs are excluded up front: p_i = 0, and the -1 in the
        # exact-threshold form would underflow the uint64 ring
        thresh = (np.uint64(k) * w * m32 - np.uint64(1)) // np.uint64(total_w)
        return t.filter(pa.array((w > 0) & (draw <= thresh)))

    return ds.map_batches(pick, batch_format="pyarrow")


def pack_sequences(sf_dir: str, budget: int = 4096, n_ranges: int | None = None) -> rd.Dataset:
    """Sequence packing — assign documents (ordered by doc_id) to
    fixed-budget bins by cumulative length: doc d goes to bin
    floor(running_total_before(d) / budget). The batching step a
    training pipeline runs between corpus prep and the dataloader
    (contiguous greedy packing; cost = ``n_chars`` so the op needs no
    tokenizer pass — swap in token counts the same way).

    This is the engine's distributed PREFIX-SCAN (window function)
    primitive: a running total is inherently a total order, so it can't
    be a hash shuffle. Shape: (1) one tiny aggregate finds max(doc_id)
    and sizes contiguous RANGES (~4/cpu via ``n_shuffle_buckets`` — the
    dispatch-amortization discipline, range- not hash-keyed because a
    scan needs contiguity); (2) one partial-combiner pass lands
    per-range totals on the driver (#ranges rows), whose cumsum gives
    each range's global prefix OFFSET, broadcast back; (3) one groupby
    co-locates each range, which lexsorts locally and adds its offset
    to the in-range cumsum. The all-to-all moves (doc_id, n_chars)
    pairs once; no global sort, no driver-resident data beyond #ranges
    rows. Mirrors ``SUM() OVER (ORDER BY doc_id ROWS UNBOUNDED
    PRECEDING ... 1 PRECEDING)`` in the oracle."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .common import T, n_shuffle_buckets, rename

    ds = T(sf_dir, "documents", columns=["doc_id", "n_chars"])

    max_id = int(ds.max("doc_id"))
    if n_ranges is None:
        n_ranges = n_shuffle_buckets()
    width = max(max_id // n_ranges + 1, 1)

    def tag(t: pa.Table) -> pa.Table:
        rng = pc.cast(pc.divide(t["doc_id"], width), pa.int64())
        return pa.table({"range_id": rng, "doc_id": t["doc_id"], "n_chars": t["n_chars"]})

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def range_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("range_id").aggregate([("n_chars", "sum")])
        return rename(g, {"n_chars_sum": "p_sum"})

    totals = (
        tagged.map_batches(range_partial, batch_format="pyarrow")
        .groupby("range_id")
        .aggregate(Sum("p_sum", alias_name="range_sum"))
        .to_pandas()  # #ranges rows — driver state bounded by cluster size
        .sort_values("range_id")
    )
    offsets = dict(
        zip(
            totals["range_id"].astype(int),
            np.concatenate(([0], np.cumsum(totals["range_sum"].to_numpy())[:-1])).astype(np.int64),
        )
    )
    offsets_ref = ray.put(offsets)

    def scan_range(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offsets_ref)[int(g["range_id"].iloc[0])]
        g = g.sort_values("doc_id", kind="stable")
        n = g["n_chars"].to_numpy(dtype=np.int64)
        before = off + np.concatenate(([0], np.cumsum(n)[:-1]))
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(dtype=np.int64),
                "cum_before": before,
                "bin_id": before // budget,
            }
        )

    # Returned as a Dataset (one row per doc — full-output ops here never
    # collect; see exact_dedup/scrub_props): the docstring's "no
    # driver-resident data beyond #ranges rows" holds for the operator
    # itself, and a consumer writes or streams the packed assignment.
    return tagged.groupby("range_id").map_groups(scan_range, batch_format="pandas")


def write_corpus_shards(
    sf_dir: str, out_dir: str, n_shards: int = 16
) -> pd.DataFrame:
    """Resumable sharded corpus export — the brief's "resumable output"
    contract as a first-class operator: documents land in
    ``out_dir/shard=K/part-*.parquet`` by a deterministic
    multiplicative hash of ``doc_id`` (the same mod-2^32 ring as
    ``hash_split``, so any worker — or the SQL oracle — recomputes any
    doc's shard locally), and each completed shard gets an ATOMIC
    manifest entry (``_manifest/shard-K.json``, tmp + ``os.replace``)
    written only after the shard's files are read BACK and counted —
    the manifest describes what is actually on disk, not what the
    writer intended.

    Resume semantics: a rerun loads the manifest, deletes any shard
    directory WITHOUT a manifest entry (partial output from a crashed
    run), filters the input to just the missing shards — finished
    shards' rows never leave the scan (predicate before the write, so
    a 1-shard rerun rewrites ~1/n_shards of the corpus, not all of
    it) — and writes + manifests only those. A completed export is a
    no-op rerun. Returns the manifest as a frame: (shard, n_rows,
    sum_n_chars, checksum), checksum = sum of each doc's mixed ring
    value (int64-exact to ~10^9 rows/shard; the SQL oracle evaluates
    the identical expression over the SOURCE table, so a green hash
    match certifies the on-disk shards byte-account for every source
    row)."""
    import json
    import os
    import shutil

    import pyarrow.dataset as pads

    from .common import T

    assert n_shards & (n_shards - 1) == 0, f"n_shards must be a power of two, got {n_shards}"
    mdir = os.path.join(out_dir, "_manifest")
    os.makedirs(mdir, exist_ok=True)

    def _mpath(k: int) -> str:
        return os.path.join(mdir, f"shard-{k}.json")

    done = set()
    for k in range(n_shards):
        try:
            with open(_mpath(k)) as f:
                json.load(f)
            done.add(k)
        except (OSError, ValueError):
            pass
    todo = sorted(set(range(n_shards)) - done)

    if todo:
        for k in todo:  # drop partial output from a crashed run
            shutil.rmtree(os.path.join(out_dir, f"shard={k}"), ignore_errors=True)
        todo_arr = np.array(todo, dtype=np.int64)
        ds = T(sf_dir, "documents", columns=["doc_id", "text", "lang", "n_chars"])

        def assign(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
            mixed = (ids * np.uint64(2654435761)) % np.uint64(1 << 32)
            shard = (mixed & np.uint64(n_shards - 1)).astype(np.int64)
            t = t.append_column("shard", pa.array(shard, pa.int64()))
            keep = np.isin(shard, todo_arr)
            return t.filter(pa.array(keep))

        ds.map_batches(assign, batch_format="pyarrow").write_parquet(
            out_dir, partition_cols=["shard"]
        )

        @ray.remote
        def manifest_shard(shard_dir: str, k: int) -> dict:
            """Read the shard BACK off disk and account for it — python
            ints for the checksum so a 10^9-row shard can't overflow."""
            dset = pads.dataset(shard_dir)
            tbl = dset.to_table(columns=["doc_id", "n_chars"])
            ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
            mixed = (ids * np.uint64(2654435761)) % np.uint64(1 << 32)
            return {
                "shard": k,
                "n_rows": tbl.num_rows,
                "sum_n_chars": int(tbl["n_chars"].to_numpy(zero_copy_only=False).sum()),
                "checksum": int(sum(int(v) for v in mixed)),
            }

        entries = ray.get(
            [
                manifest_shard.remote(os.path.join(out_dir, f"shard={k}"), k)
                for k in todo
                if os.path.isdir(os.path.join(out_dir, f"shard={k}"))
            ]
        )
        by_shard = {e["shard"]: e for e in entries}
        for k in todo:
            e = by_shard.get(k, {"shard": k, "n_rows": 0, "sum_n_chars": 0, "checksum": 0})
            tmp = _mpath(k) + ".tmp"
            with open(tmp, "w") as f:
                json.dump(e, f)
            os.replace(tmp, _mpath(k))  # atomic: entry exists => shard complete

    rows = []
    for k in range(n_shards):
        with open(_mpath(k)) as f:
            rows.append(json.load(f))
    out = pd.DataFrame(rows, columns=["shard", "n_rows", "sum_n_chars", "checksum"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("shard").reset_index(drop=True)


def shuffle_epoch(sf_dir: str, seed: int = 1, n_ranges: int | None = None) -> rd.Dataset:
    """Deterministic training-epoch shuffle: every document gets a
    global position ``epoch_rank`` in a pseudorandom order that is a
    pure function of (doc_id, seed) — the reproducible dataloader
    order a training run needs (same seed -> same order on any
    cluster; next epoch = next seed, no state carried).

    Shape: the shuffle key is the ``hash_split`` multiplicative ring
    mix of (doc_id, seed), so the SQL oracle evaluates the identical
    expression; ranking is the ``pack_sequences`` distributed
    prefix-scan, but RANGE-partitioned over the KEY domain [0, 2^32)
    — the mix is uniform, so fixed-width key ranges are balanced by
    construction (no sampling step a Dataset.sort would need): one
    partial-combiner pass lands per-range COUNTS on the driver
    (#ranges rows), their cumsum is each range's global rank offset
    (broadcast back), and each range lexsorts (key, doc_id) locally
    and adds its offset. No global sort machinery, no driver-resident
    data beyond #ranges rows; ties impossible (doc_id breaks them).
    Mirrors ``ROW_NUMBER() OVER (ORDER BY mixed, doc_id) - 1``."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .common import T, n_shuffle_buckets, rename

    if n_ranges is None:
        n_ranges = n_shuffle_buckets()
    width = (1 << 32) // n_ranges + 1
    mul, smix = np.uint64(2654435761), np.uint64(2246822519)
    ring = np.uint64(1 << 32)
    seed_term = (np.uint64(seed) * smix) % ring

    ds = T(sf_dir, "documents", columns=["doc_id"])

    def tag(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        mixed = ((ids % ring) * mul + seed_term) % ring
        return pa.table(
            {
                "range_id": pa.array((mixed // np.uint64(width)).astype(np.int64), pa.int64()),
                "mixed": pa.array(mixed.astype(np.int64), pa.int64()),
                "doc_id": t["doc_id"],
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def range_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("range_id").aggregate([([], "count_all")])
        return rename(g, {"count_all": "p_n"})

    totals = (
        tagged.map_batches(range_partial, batch_format="pyarrow")
        .groupby("range_id")
        .aggregate(Sum("p_n", alias_name="n"))
        .to_pandas()  # #ranges rows only
        .sort_values("range_id")
    )
    offsets = dict(
        zip(
            totals["range_id"].astype(int),
            np.concatenate(([0], np.cumsum(totals["n"].to_numpy())[:-1])).astype(np.int64),
        )
    )
    offsets_ref = ray.put(offsets)

    def rank_range(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offsets_ref)[int(g["range_id"].iloc[0])]
        mixed = g["mixed"].to_numpy(dtype=np.int64)
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((ids, mixed))
        return pd.DataFrame(
            {
                "doc_id": ids[order],
                "epoch_rank": off + np.arange(len(ids), dtype=np.int64),
            }
        )

    return tagged.groupby("range_id").map_groups(rank_range, batch_format="pandas")


def _dsir_doc_bigram_hashes(t: pa.Table, m: int):
    """Hashed word-bigram features per document: (flat bucket-index
    array, flat doc-row array). Vectorized — tokens flatten once per
    batch, bigram hashes combine the two shifted ``hash64`` streams."""
    import pyarrow.compute as pc

    from ..functions.urls import hash64

    text = pc.fill_null(t["text"].combine_chunks(), "")
    toks = pc.split_pattern_regex(text, pattern=r"\s+")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    h = hash64(flat.to_pylist())[keep]
    row = np.repeat(np.arange(len(lens)), lens)[keep]
    if len(h) < 2:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    pair_ok = row[:-1] == row[1:]
    hb = ((h[:-1] * np.uint64(0x9E3779B97F4A7C15)) ^ h[1:])[pair_ok]
    return (hb % np.uint64(m)).astype(np.int64), row[:-1][pair_ok]


def dsir_sample(sf_dir: str, k: int = 100, m: int = 4096, n_merge: int = 64) -> pd.DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    the log importance ratio of a TARGET hashed-n-gram unigram model
    (here: the ``lang == 'en'`` slice — any labeled target slice works)
    over the RAW corpus model, and keep the top-``k`` scorers — the
    domain-upweighting selection pass between quality filtering and
    mixture sampling.

    Two corpus passes, both fixed-width: (1) hashed word-bigram counts
    for target and raw land as two m-vector partials per batch, merged
    through the bounded groupby tree (driver state = 2m ints); (2) the
    smoothed log-ratio table broadcasts once (``ray.put``, m floats) and
    each batch scores its docs vectorized (``np.add.at`` over the doc's
    bucket hits), then the global top-k is a sort+limit over (doc_id,
    score) rows only. Float log-ratios -> no SQL oracle; pytest pins
    scores and the selected set against a driver-local reference.

    Returns (doc_id, logratio) for the k selected docs, ties broken by
    doc_id asc (deterministic), logratio rounded to 9 dp."""
    from .common import T

    ds = T(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def count_partial(t: pa.Table) -> pa.Table:
        idx, row = _dsir_doc_bigram_hashes(t, m)
        is_t = (
            pa.compute.equal(t["lang"], "en").to_numpy(zero_copy_only=False).astype(bool)
        )
        vt = np.zeros(m, dtype=np.int64)
        vr = np.zeros(m, dtype=np.int64)
        if len(idx):
            np.add.at(vr, idx, 1)
            tm = is_t[row]
            np.add.at(vt, idx[tm], 1)
        b = int(t["doc_id"][0].as_py()) % n_merge if len(t) else 0
        return pa.table(
            {
                "b": pa.array([b], pa.int64()),
                "vt": pa.array([vt.tolist()], pa.list_(pa.int64())),
                "vr": pa.array([vr.tolist()], pa.list_(pa.int64())),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        at = np.zeros(m, dtype=np.int64)
        ar = np.zeros(m, dtype=np.int64)
        for vt, vr in zip(g["vt"], g["vr"]):
            at += np.asarray(vt, dtype=np.int64)
            ar += np.asarray(vr, dtype=np.int64)
        return pd.DataFrame({"b": [int(g["b"].iloc[0])], "vt": [at], "vr": [ar]})

    parts = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("b")
        .map_groups(merge, batch_format="pandas")  # <= n_merge groups
        .to_pandas()
    )
    ct = np.zeros(m, dtype=np.int64)
    cr = np.zeros(m, dtype=np.int64)
    for vt, vr in zip(parts["vt"], parts["vr"]):
        ct += np.asarray(vt, dtype=np.int64)
        cr += np.asarray(vr, dtype=np.int64)
    # add-1 smoothed log probabilities; the ratio table is the model
    logratio = np.log((ct + 1.0) / (ct.sum() + m)) - np.log((cr + 1.0) / (cr.sum() + m))
    ref = ray.put(logratio)

    def score(t: pa.Table) -> pa.Table:
        lr = ray.get(ref)
        idx, row = _dsir_doc_bigram_hashes(t, m)
        s = np.zeros(len(t), dtype=np.float64)
        if len(idx):
            np.add.at(s, row, lr[idx])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "logratio": pa.array(np.round(s, 9), pa.float64()),
            }
        )

    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["logratio", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return out.reset_index(drop=True)


def bottomk_sample(sf_dir: str, k: int = 200, max_partial_rows: int = 5_000_000) -> pd.DataFrame:
    """Exact fixed-size uniform sample: the k documents with the
    smallest deterministic hash keys (``hash_split``'s multiplicative
    ring), tie-broken by doc_id — the distributed-reservoir equivalent
    (bottom-k sketch) that gives a *reproducible, order-independent*
    exactly-k sample where ``poisson_sample`` gives expected-size and
    ``mixture_sample`` gives rate-based. Any two runs — any cluster
    shape, any block order — pick the same k documents.

    Shape: per-batch partial bottom-k (one ``np.argpartition`` per
    batch, ≤ k rows survive per batch) so the driver-landing frame is
    bounded by k x n_blocks (cap-guarded), never the corpus. The final
    exact top-k over partials runs on the driver — k-sized by
    definition."""
    from .common import T, bounded_driver_frame

    ds = T(sf_dir, "documents", columns=["doc_id"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((ids * np.uint64(2654435761)) % np.uint64(1 << 32)).astype(np.int64)
        if len(h) > k:
            keep = np.argpartition(h, k)[:k]
            ids, h = ids[keep], h[keep]
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                "h": pa.array(h, pa.int64()),
            }
        )

    parts = bounded_driver_frame(
        ds.map_batches(partial, batch_format="pyarrow"),
        "bottomk_sample per-block partials (k x n_blocks)",
        max_rows=max_partial_rows,
    )
    out = parts.sort_values(["h", "doc_id"], kind="stable").head(k).reset_index(drop=True)
    return out[["doc_id", "h"]]


def weighted_sample_aes(
    sf_dir: str, k: int = 100, max_partial_rows: int = 5_000_000
) -> pd.DataFrame:
    """Exact weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): keep the k documents with the smallest
    ``score = -ln(u) / w`` — equivalent to top-k by ``u^(1/w)``, which
    draws each subset with probability proportional to sequential
    weighted draws without replacement. Completes the sampling family:
    ``poisson_sample`` is weight-proportional WITH replacement /
    expected-size, ``bottomk_sample`` is uniform without, this is
    weighted without. Weight = ``max(n_chars, 1)`` (char-proportional,
    the byte-budget sampling a corpus-assembly pass wants).

    ``u`` comes from the deterministic multiplicative ring on doc_id
    (same generator as ``hash_split``/``bottomk_sample``), so any two
    runs — any cluster shape, any block order — select the identical k
    documents, and the SQL oracle reproduces the float score
    bit-for-bit: ``u = (ring(id)+1)/2^32`` is exact, ``ln`` is the same
    libm call on both sides (the ``bigram_pmi`` precedent), and the
    divide by an exact integer weight is a single IEEE op.

    Shape: per-batch partial bottom-k (one argpartition, ≤ k rows
    survive per batch), k x n_blocks driver frame (cap-guarded), exact
    head-k with doc_id tie-break on the driver."""
    from .common import T, bounded_driver_frame

    ds = T(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        w = np.maximum(t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64), 1)
        h = (ids * np.uint64(2654435761)) % np.uint64(1 << 32)
        u = (h.astype(np.float64) + 1.0) / float(1 << 32)  # (0, 1], exact
        score = -np.log(u) / w
        if len(score) > k:
            keep = np.argpartition(score, k)[:k]
            ids, w, score = ids[keep], w[keep], score[keep]
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                "w": pa.array(w, pa.int64()),
                "score": pa.array(score, pa.float64()),
            }
        )

    parts = bounded_driver_frame(
        ds.map_batches(partial, batch_format="pyarrow"),
        "weighted_sample_aes per-block partials (k x n_blocks)",
        max_rows=max_partial_rows,
    )
    out = (
        parts.sort_values(["score", "doc_id"], kind="stable")
        .head(k)
        .reset_index(drop=True)
    )
    out["score"] = out["score"].round(6)
    return out[["doc_id", "w", "score"]].sort_values("doc_id").reset_index(drop=True)


def snapshot_diff(sf_dir: str, n_buckets: int | None = None) -> rd.Dataset:
    """Incremental-crawl set diff: compare two corpus snapshots and emit
    every document whose status changed — ``added`` (only in B),
    ``removed`` (only in A), ``changed`` (both, content differs) — the
    batch analog of the engine's retraction/reorg semantics (SET1/O2:
    crawler/blocks.go:131-189 walks back exactly this delta) and the
    recrawl-delta step an incremental training-data pipeline runs
    before reprocessing only what moved.

    Snapshot B is derived deterministically from the documents table
    (drop doc_id % 7 == 0, rewrite text of % 11 == 0, add fresh ids for
    % 13 == 0) so both sides — this pipeline and the SQL oracle —
    compute over identical inputs with no external data.

    Scale shape: text never rides the shuffle — each side fingerprints
    in-batch (64-bit content hash) and only (bucket, doc_id, src, fp)
    rows move; the per-bucket resolve is one lexsort + run-scan.
    Unchanged docs (the overwhelming majority of a recrawl) are dropped
    inside the bucket task, so output is delta-sized. 64-bit fp
    equality stands in for text equality (collision odds 2^-64 per
    pair; the oracle compares text exactly)."""
    from ..functions.urls import hash64
    from .common import T, n_shuffle_buckets

    B = n_buckets or n_shuffle_buckets()
    assert B & (B - 1) == 0, f"n_buckets must be a power of two, got {B}"
    docs = T(sf_dir, "documents", columns=["doc_id", "text"])

    def rows(t: pa.Table, src: int, transform: bool) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        txt = t["text"].to_numpy(zero_copy_only=False)
        if transform:
            keep = ids % 7 != 0
            ids, txt = ids[keep], txt[keep]
            mod = ids % 11 == 0
            if mod.any():
                txt = txt.copy()
                txt[mod] = np.char.add(txt[mod].astype("U"), " [v2]")
        fp = hash64(txt).view(np.int64)
        return pa.table(
            {
                "bucket": pa.array(ids & (B - 1), pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "src": pa.array(np.full(len(ids), src, dtype=np.int64), pa.int64()),
                "fp": pa.array(fp, pa.int64()),
            }
        )

    def added_rows(t: pa.Table, base: int) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ids % 13 == 0
        ids = ids[keep] + base
        txt = np.asarray(["new snapshot doc %d" % i for i in ids], dtype=object)
        fp = hash64(txt).view(np.int64)
        return pa.table(
            {
                "bucket": pa.array(ids & (B - 1), pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "src": pa.array(np.ones(len(ids), dtype=np.int64), pa.int64()),
                "fp": pa.array(fp, pa.int64()),
            }
        )

    # base for fresh ids: one scalar aggregate (max doc_id + 1)
    base = int(docs.select_columns(["doc_id"]).max("doc_id")) + 1

    a = docs.map_batches(lambda t: rows(t, 0, False), batch_format="pyarrow")
    b = docs.map_batches(lambda t: rows(t, 1, True), batch_format="pyarrow")
    new = docs.map_batches(lambda t: added_rows(t, base), batch_format="pyarrow")

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        src = g["src"].to_numpy(dtype=np.int64)
        fp = g["fp"].to_numpy(dtype=np.int64)
        order = np.lexsort((src, ids))
        ids, src, fp = ids[order], src[order], fp[order]
        first = np.concatenate(([True], ids[1:] != ids[:-1]))
        # run length is 1 (one snapshot only) or 2 (both, A then B)
        starts = np.flatnonzero(first)
        lengths = np.diff(np.append(starts, len(ids)))
        solo = starts[lengths == 1]
        both = starts[lengths == 2]
        changed = both[fp[both] != fp[both + 1]]
        out_ids = np.concatenate([ids[solo], ids[changed]])
        status = np.concatenate(
            [
                np.where(src[solo] == 0, "removed", "added"),
                np.full(len(changed), "changed", dtype=object),
            ]
        )
        return pd.DataFrame({"doc_id": out_ids, "status": status})

    return (
        a.union(b)
        .union(new)
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
    )


def fuzzy_dedup_corpus(sf_dir: str, n_buckets: int | None = None) -> rd.Dataset:
    """Fuzzy-dedup corpus filtering — the composition the near-dup
    family exists for: mine verified pairs (exact ngram Jaccard),
    resolve them to clusters (distributed FastSV,
    ``clusters.near_dup_clusters``), and KEEP only cluster canonicals
    plus every unpaired document. Where ``corpus_prep`` drops exact
    duplicates, this drops fuzzy ones; output stays a Dataset of
    (doc_id, n_chars) survivor rows.

    Scale shape: the loser set is duplicate-bounded (one id per
    non-canonical member — the same bound every miner frame in this
    family lives under) and is broadcast ONCE via ``ray.put``; the
    corpus pass is a shuffle-free searchsorted anti-join per batch,
    so the full documents table never rides an all-to-all."""
    import ray

    from .clusters import near_dup_clusters
    from .common import T

    cc = near_dup_clusters(sf_dir, n_buckets=n_buckets)
    lose = np.sort(cc.loc[cc["is_canonical"] == 0, "doc_id"].to_numpy(dtype=np.int64))
    lose_ref = ray.put(lose)

    ds = T(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def survivors(t: pa.Table) -> pa.Table:
        lose_ = ray.get(lose_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        if len(lose_) == 0:
            return t
        pos = np.minimum(np.searchsorted(lose_, ids), len(lose_) - 1)
        return t.filter(pa.array(lose_[pos] != ids))

    return ds.map_batches(survivors, batch_format="pyarrow")


def ccnet_corpus(
    sf_dir: str,
    min_docs: int = 3,
    k: int = 3,
    keep_max_bucket: int = 2,
) -> rd.Dataset:
    """The CCNet cleaning recipe (Wenzek et al. 2020) END TO END, as
    one chained Dataset pipeline — the composition this round's three
    new stages exist for:

      1. :func:`~.dedup.line_dedup_ds` — boilerplate removal (lines in
         >= ``min_docs`` distinct documents: nav bars, footers —
         removed from EVERY copy);
      2. :func:`~.dedup.paragraph_dedup_ds` — corpus-wide
         first-occurrence paragraph dedup of the remaining text
         (repeats below the boilerplate threshold keep one copy);
      3. :func:`~.textstats.fluency_buckets_ds` — per-language
         NTILE(``k``) by the integer-exact corpus-LM fluency score of
         the CLEANED text, keeping buckets <= ``keep_max_bucket``
         (CCNet's head+middle; the tail is dropped).

    Stage order is load-bearing: global paragraph dedup FIRST would
    reduce every repeated line to one copy, leaving the >=min_docs
    boilerplate rule nothing to count — boilerplate is a statistical
    judgment about the raw corpus, so it runs on the raw corpus.

    Output: (doc_id, lang, text, score_q, bucket) for surviving docs —
    text is the stage-2 cleaned text the bucket was scored on. Docs
    whose cleaned text is token-free have no fluency score and drop
    out, exactly as in the SQL oracle's count join.

    Scale shape is the sum of its verified parts: stage 1/2 broadcast
    duplicate- and boilerplate-bounded hash sets (cap-guarded) and
    never shuffle text; stage 3 adds the vocab-bounded LM broadcast
    and the histogram-refinement NTILE whose only collects are the
    coarse histogram and the boundary bins (text explicitly pruned
    from that collect). Between stages the text column moves only
    task-to-task through the object store — no all-to-all carries it."""
    from .common import T
    from .dedup import line_dedup_ds, paragraph_dedup_ds
    from .textstats import fluency_buckets_ds

    ds = T(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    # materialize between stages: every stage's driver-collect
    # (boilerplate set, dup-paragraph set, LM vocab, NTILE histogram)
    # triggers upstream execution, so an unmaterialized chain re-runs
    # the raw read ~4x and the line-clean text kernel ~3x; pinning each
    # stage's output in the (spillable) object store makes every text
    # pass run exactly once
    s1 = line_dedup_ds(ds, min_docs=min_docs).drop_columns(
        ["n_removed_lines"]
    ).materialize()
    s2 = paragraph_dedup_ds(s1).drop_columns(["n_removed_paras"]).materialize()
    s3 = fluency_buckets_ds(s2, k=k, carry_text=True)
    return s3.filter(expr=f"bucket <= {keep_max_bucket}")


def recrawl_priority(
    sf_dir: str, n_buckets: int | None = None, diff: rd.Dataset | None = None
) -> pd.DataFrame:
    """Adaptive recrawl scheduling from a snapshot diff — the
    crawl-strategy rollup the engine's frontier would consume next
    session: per source, how much of its corpus moved between
    snapshots, as an integer-exact change rate and a priority rank
    (recrawl the fastest-moving sources first; blockspider's polling
    ticker applies one global cadence, crawler/crawler.go:34-51 — this
    is the per-publisher refinement).

        change_rate_q = ((n_changed + n_removed) * 10^6) // n_docs
        priority      = ROW_NUMBER() ORDER BY change_rate_q DESC, source

    ``added`` docs carry no source (they are new ids) and are excluded;
    the rate is over the source's ORIGINAL snapshot population.
    Pass a precomputed ``diff`` Dataset (the ``snapshot_diff`` output
    schema: doc_id, status) to roll up an existing delta instead of
    re-deriving it — the registered query re-derives for determinism,
    but an operational caller already holds the diff (7.7 s of the
    sf0.1 bench entry is the re-derivation).

    Scale shape: consumes :func:`snapshot_diff`'s actual delta-sized
    output (never the modular shortcut the oracle is free to exploit);
    the source attach co-locates diff rows with the (doc_id, source)
    pairs by ``doc % B`` — one fixed-width all-to-all, searchsorted
    inside the bucket — and per-source totals come from the house
    in-batch partial groupby. Everything landing on the driver is
    source-bounded."""
    from ray.data.aggregate import Sum

    from ..functions.urls import hash64  # noqa: F401  (parity with siblings)
    from .common import T, n_shuffle_buckets, rename

    B = n_buckets or n_shuffle_buckets()
    assert B & (B - 1) == 0, f"n_buckets must be a power of two, got {B}"

    docs = T(sf_dir, "documents", columns=["doc_id", "source"])

    def totals_partial(t: pa.Table) -> pa.Table:
        g = t.select(["source"]).group_by("source").aggregate([([], "count_all")])
        return rename(g, {"count_all": "p_n"})

    totals = (
        docs.map_batches(totals_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("p_n", alias_name="n_docs"))
        .to_pandas()
    )

    if diff is None:
        diff = snapshot_diff(sf_dir, n_buckets=n_buckets)

    def diff_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        status = t["status"].to_numpy(zero_copy_only=False)
        keep = status != "added"  # new ids have no source
        ids, status = ids[keep], status[keep]
        return pa.table(
            {
                "qb": pa.array(ids % B, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "source": pa.array(np.full(len(ids), "", dtype=object), pa.string()),
                "chg": pa.array((status == "changed").astype(np.int64), pa.int64()),
                "rem": pa.array((status == "removed").astype(np.int64), pa.int64()),
            }
        )

    def src_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        z = np.zeros(len(ids), dtype=np.int64)
        return pa.table(
            {
                "qb": pa.array(ids % B, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "source": t["source"],
                "chg": pa.array(z, pa.int64()),
                "rem": pa.array(z - 1, pa.int64()),  # rem = -1 marks a source row
            }
        )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        rem = g["rem"].to_numpy(dtype=np.int64)
        is_src = rem < 0
        s_ids = ids[is_src]
        s_src = g["source"].to_numpy(dtype=object)[is_src]
        o = np.argsort(s_ids)
        s_ids, s_src = s_ids[o], s_src[o]
        d = g[~is_src]
        if not len(d):
            return pd.DataFrame({"source": [], "p_chg": [], "p_rem": []})
        src = s_src[np.searchsorted(s_ids, d["doc_id"].to_numpy(dtype=np.int64))]
        out = pd.DataFrame(
            {"source": src.astype(str), "p_chg": d["chg"].to_numpy(), "p_rem": d["rem"].to_numpy()}
        )
        return out.groupby("source", as_index=False).sum()

    delta = (
        diff.map_batches(diff_rows, batch_format="pyarrow")
        .union(docs.map_batches(src_rows, batch_format="pyarrow"))
        .groupby("qb")
        .map_groups(attach, batch_format="pandas")
        .groupby("source")
        .aggregate(Sum("p_chg", alias_name="n_changed"), Sum("p_rem", alias_name="n_removed"))
        .to_pandas()
    )

    out = totals.merge(delta, on="source", how="left").fillna(0)
    for c in ("n_docs", "n_changed", "n_removed"):
        out[c] = out[c].astype("int64")
    out["change_rate_q"] = [
        ((int(c) + int(r)) * 10**6) // int(n)
        for c, r, n in zip(out["n_changed"], out["n_removed"], out["n_docs"])
    ]
    out = out.sort_values(
        ["change_rate_q", "source"], ascending=[False, True]
    ).reset_index(drop=True)
    out["priority"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["source", "n_docs", "n_changed", "n_removed", "change_rate_q", "priority"]]
