"""Text-analysis pipelines over ``documents`` — the training-data
quality toolkit (language id, token counts, quality scores, document
fingerprints), each a vectorized ``map_batches`` stage."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
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


def _token_pairs(t: pa.Table) -> pa.Table:
    """Explode a documents batch to ``(doc_id, tok)`` rows, Arrow-native.

    Split on ``\\s+`` then drop empties — identical to
    ``re.findall(r'\\S+')`` on the ASCII corpus (RE2's ``\\s`` class,
    which Arrow and the DuckDB oracle share). No per-row Python: the
    flatten is one kernel, parent doc_ids come from ``np.repeat`` over
    the list lengths.
    """
    text = pc.fill_null(t["text"].combine_chunks(), "")
    toks = pc.split_pattern_regex(text, pattern=r"\s+")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    doc = np.repeat(t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False), lens)
    pairs = pa.table({"doc_id": pa.array(doc, pa.int64()), "tok": pc.list_flatten(toks)})
    return pairs.filter(pc.not_equal(pairs["tok"], ""))


def repetition_stats(sf_dir: str) -> rd.Dataset:
    """Gopher-style repetition signals per document (Rae et al. 2021
    §A1.1 repetition filters): total tokens, distinct tokens, the top
    token's count, and the keep/drop decision (duplicate-token fraction
    <= 0.3 AND top-token fraction <= 0.2).

    Batch-local (a document is one row, never split across batches), so
    there is NO shuffle — one map_batches, all-Arrow group_bys inside.
    Outputs are integer-exact and the keep rule is evaluated in integer
    arithmetic (``10*dup <= 3*n``), so the DuckDB oracle matches with no
    float-rounding tie hazards.
    """
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        pairs = _token_pairs(t)
        cnt = pairs.group_by(["doc_id", "tok"]).aggregate([([], "count_all")])
        agg = cnt.group_by("doc_id").aggregate(
            [("count_all", "sum"), ("count_all", "count"), ("count_all", "max")]
        )
        # left-join back so zero-token docs keep a row (n=0, keep=1)
        base = pa.table({"doc_id": t["doc_id"].combine_chunks()})
        j = base.join(agg, "doc_id", join_type="left outer")
        zero = pa.scalar(0, pa.int64())
        n = pc.cast(pc.coalesce(j["count_all_sum"], zero), pa.int64())
        d = pc.cast(pc.coalesce(j["count_all_count"], zero), pa.int64())
        top = pc.cast(pc.coalesce(j["count_all_max"], zero), pa.int64())
        dup = pc.subtract(n, d)
        keep = pc.and_(
            pc.less_equal(pc.multiply(dup, pa.scalar(10, pa.int64())), pc.multiply(n, pa.scalar(3, pa.int64()))),
            pc.less_equal(pc.multiply(top, pa.scalar(5, pa.int64())), n),
        )
        return pa.table(
            {
                "doc_id": j["doc_id"],
                "n_tokens": n,
                "n_distinct_tokens": d,
                "top_token_count": top,
                "keep": pc.cast(keep, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def vocab_topk(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Corpus vocabulary heavy hitters: top-``k`` tokens by total count
    (vocabulary building / BPE seeding pass).

    In-batch partial counts first — the shuffle moves one row per
    (token, batch), not one per token occurrence; the global topk is a
    groupby-sum then sort+limit over the (already small) vocab table.
    Ties break on token asc in both Ray and the SQL oracle.
    """
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        g = _token_pairs(t).group_by("tok").aggregate([([], "count_all")])
        return rename(g, {"tok": "token", "count_all": "p_n"})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("p_n", alias_name="n"))
        .sort(["n", "token"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return out.reset_index(drop=True)


def normalize_text(sf_dir: str) -> rd.Dataset:
    """Canonical text normalization (the pre-dedup/pre-fingerprint
    transform): lowercase, collapse every whitespace run to one space,
    trim — three Arrow RE2/utf8 kernels fused in one shuffle-free
    ``map_batches``, zero Python per row. Both engines run RE2, so the
    ``\\s`` class is byte-identical to the oracle's
    ``regexp_replace(..., 'g')``."""
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        s = pc.replace_substring_regex(
            pc.fill_null(t["text"], ""), pattern=r"\s+", replacement=" "
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "norm_text": pc.utf8_lower(pc.utf8_trim_whitespace(s)),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")


def top_tokens_per_lang(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Grouped vocabulary heavy hitters: each language's top-``k``
    tokens by count with rank — ``vocab_topk``'s PARTITION BY sibling
    (the per-language stopword/vocab profile). Counts are global after
    the (lang, token) groupby, so a per-batch partial top-k per lang is
    a sound combiner (the global top-k is a subset of the union of
    batch top-ks over final counts): each batch ships <= k rows per
    language to the final |langs|-group merge. Ties break (n DESC,
    token ASC) on both engines."""
    ds = T(sf_dir, "documents", columns=["doc_id", "lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"].combine_chunks(), "")
        toks = pc.split_pattern_regex(text, pattern=r"\s+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        lang = np.repeat(t["lang"].combine_chunks().to_numpy(zero_copy_only=False), lens)
        pairs = pa.table({"lang": pa.array(lang, pa.string()), "tok": pc.list_flatten(toks)})
        pairs = pairs.filter(pc.not_equal(pairs["tok"], ""))
        g = pairs.group_by(["lang", "tok"]).aggregate([([], "count_all")])
        return rename(g, {"count_all": "p_n"})

    def _lang_topk(lang: np.ndarray, tok: np.ndarray, n: np.ndarray) -> pd.DataFrame:
        order = np.lexsort((tok, -n, lang))
        lang_s, tok_s, n_s = lang[order], tok[order], n[order]
        new_lang = np.concatenate(([True], lang_s[1:] != lang_s[:-1]))
        starts = np.flatnonzero(new_lang)
        runs = np.diff(np.append(starts, len(lang_s)))
        rank = np.arange(len(lang_s), dtype=np.int64) - np.repeat(starts, runs) + 1
        keep = rank <= k
        return pd.DataFrame(
            {"lang": lang_s[keep], "token": tok_s[keep], "n": n_s[keep], "rank": rank[keep]}
        )

    def partial_topk(t: pa.Table) -> pa.Table:
        df = _lang_topk(
            t["lang"].to_numpy(zero_copy_only=False),
            t["tok"].to_numpy(zero_copy_only=False),
            t["n"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        # plain pa.table (NOT from_pandas: that attaches the unhashable
        # b'pandas' schema metadata T() exists to keep off the shuffle)
        return pa.table(
            {
                "lang": pa.array(df["lang"], pa.string()),
                "tok": pa.array(df["token"], pa.string()),
                "n": pa.array(df["n"], pa.int64()),
            }
        )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return _lang_topk(
            g["lang"].to_numpy(), g["tok"].to_numpy(), g["n"].to_numpy(dtype=np.int64)
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "tok"])
        .aggregate(Sum("p_n", alias_name="n"))
        .map_batches(partial_topk, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(final_topk, batch_format="pandas")
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    out["rank"] = out["rank"].astype("int64")
    return out.sort_values(["lang", "rank"]).reset_index(drop=True)


def token_doc_freq(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Document-frequency table (the IDF numerator): top-``k`` tokens by
    the number of distinct documents containing them.

    The in-batch partial dedups (doc_id, token) pairs BEFORE the shuffle
    — and because a document is exactly one row in exactly one batch,
    per-batch distinct pairs are globally distinct, so the per-token
    partial counts are additive and the global step is a plain Sum (no
    distinct-count shuffle of raw pairs).
    """
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        distinct = _token_pairs(t).group_by(["doc_id", "tok"]).aggregate([])
        g = distinct.group_by("tok").aggregate([([], "count_all")])
        return rename(g, {"tok": "token", "count_all": "p_df"})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("p_df", alias_name="df"))
        .sort(["df", "token"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return out.reset_index(drop=True)


def tfidf_topk(sf_dir: str, k: int = 3, max_vocab_rows: int = 50_000_000) -> pd.DataFrame:
    """Top-``k`` terms per document by tf-idf (tf * ln(N/df)) — the
    keyword-extraction / relevance-weighting primitive.

    Two passes, one shuffle total:
      1. document frequency over the FULL vocabulary — the additive
         per-batch partial from ``token_doc_freq`` (per-batch distinct
         (doc, tok) pairs are globally distinct because a document is
         whole within one batch) summed by one token groupby. The df
         table is VOCAB-bounded, not corpus-bounded (Zipf: ~10^7
         distinct tokens even at 100 TB), so it lands on the driver
         through ``bounded_driver_frame`` and is broadcast ONCE via
         ``ray.put`` as (sorted token array, df array).
      2. scoring is shuffle-FREE: per-doc tf is exact in-batch (same
         row-atomicity), df lookup is a vectorized ``np.searchsorted``
         against the broadcast vocab, and the per-doc top-k is one
         lexsort run-scan — no groupby, the output IS the per-batch
         result. Ties break by token ascending, matching the SQL
         oracle's ``row_number() OVER (... ORDER BY s DESC, token)``.
    """
    import ray

    from .common import bounded_driver_frame

    ds = T(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = T(sf_dir, "documents", columns=["doc_id"]).count()

    def partial_df(t: pa.Table) -> pa.Table:
        distinct = _token_pairs(t).group_by(["doc_id", "tok"]).aggregate([])
        g = distinct.group_by("tok").aggregate([([], "count_all")])
        return rename(g, {"tok": "token", "count_all": "p_df"})

    df_frame = bounded_driver_frame(
        ds.map_batches(partial_df, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("p_df", alias_name="df")),
        "tfidf_topk document-frequency table (vocab-bounded)",
        max_vocab_rows,
    )
    vocab = df_frame["token"].to_numpy(dtype=object).astype(str)
    order = np.argsort(vocab)
    ref = ray.put((vocab[order], df_frame["df"].to_numpy(dtype=np.int64)[order]))

    def score(t: pa.Table) -> pa.Table:
        vocab_, df_ = ray.get(ref)
        tf_tbl = (
            _token_pairs(t).group_by(["doc_id", "tok"]).aggregate([([], "count_all")])
        )
        doc = tf_tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tok = np.asarray(tf_tbl["tok"].to_pylist(), dtype=str)
        tf = tf_tbl["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        dfv = df_[np.searchsorted(vocab_, tok)]
        s = tf * np.log(float(n_docs) / dfv)
        o = np.lexsort((tok, -s, doc))
        d_s = doc[o]
        starts = np.flatnonzero(np.concatenate(([True], d_s[1:] != d_s[:-1])))
        runs = np.diff(np.append(starts, len(d_s)))
        rank = np.arange(len(d_s)) - np.repeat(starts, runs)
        keep = o[rank < k]
        return pa.table(
            {
                "doc_id": pa.array(doc[keep], pa.int64()),
                "token": pa.array(tok[keep].tolist(), pa.string()),
                "tf": pa.array(tf[keep], pa.int64()),
                "df": pa.array(dfv[keep], pa.int64()),
                "tfidf": pa.array(np.round(s[keep], 3), pa.float64()),
            }
        )

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.sort_values(["doc_id", "tfidf", "token"], ascending=[True, False, True]).reset_index(
        drop=True
    )


def doc_len_quantiles(sf_dir: str, qs: tuple = (0.5, 0.9, 0.99)) -> pd.DataFrame:
    """Per-language EXACT token-length quantiles (linear interpolation,
    matching DuckDB ``quantile_cont``) via a compressed value
    distribution: the in-batch partial emits (lang, n_tokens, count)
    triples — bounded by #distinct lengths per language, not by docs —
    one groupby sums them, and the interpolation runs over the tiny
    compressed histogram per language (group count = #languages,
    bounded ~200 in any real corpus, so the per-group dispatch the
    high-cardinality pipelines amortize away is irrelevant here)."""
    ds = T(sf_dir, "documents", columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = tx.token_count(t["text"].to_pylist())
        g = (
            pa.table({"lang": t["lang"], "n_tokens": pa.array(toks, pa.int64())})
            .group_by(["lang", "n_tokens"])
            .aggregate([([], "count_all")])
        )
        return rename(g, {"count_all": "p_n"})

    def interp(g: pd.DataFrame) -> pd.DataFrame:
        v = g["n_tokens"].to_numpy(dtype=np.float64)
        w = g["n"].to_numpy(dtype=np.int64)
        o = np.argsort(v)
        v, w = v[o], w[o]
        cum = np.cumsum(w)
        total = cum[-1]

        def at(i: np.ndarray) -> np.ndarray:
            return v[np.searchsorted(cum, i, side="right")]

        row = {"lang": g["lang"].iloc[0]}
        for q in qs:
            pos = (total - 1) * q
            lo = np.floor(pos)
            val = at(np.array([lo]))[0]
            hi_val = at(np.array([min(lo + 1, total - 1)]))[0]
            row[f"p{int(q * 100)}"] = round(float(val + (hi_val - val) * (pos - lo)), 3)
        return pd.DataFrame([row])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "n_tokens"])
        .aggregate(Sum("p_n", alias_name="n"))
        .groupby("lang")
        .map_groups(interp, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("lang").reset_index(drop=True)


def unigram_logprob(sf_dir: str, max_vocab_rows: int = 50_000_000) -> pd.DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram LM — the CCNet-style perplexity quality filter (a doc of
    rare/garbage tokens scores low, fluent text scores near the corpus
    mean).

    Same two-pass shape as ``tfidf_topk``: pass 1 builds the unigram
    count table (in-batch additive partials, one vocab-bounded groupby)
    and lands it on the driver through ``bounded_driver_frame`` (Zipf:
    vocab, not corpus, sized) for a single ``ray.put`` broadcast; pass 2
    is shuffle-FREE — token lookups are a vectorized ``searchsorted``
    and the per-doc sum is one ``np.add.reduceat`` over the contiguous
    doc runs ``_token_pairs`` emits. OOV is impossible (the LM is
    trained on the same corpus), so no smoothing term is needed and the
    SQL oracle is the literal ``SUM(ln(c / total)) / n``."""
    import ray

    from .common import bounded_driver_frame

    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        g = _token_pairs(t).group_by("tok").aggregate([([], "count_all")])
        return rename(g, {"tok": "token", "count_all": "p_n"})

    cnt = bounded_driver_frame(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("p_n", alias_name="n")),
        "unigram_logprob LM count table (vocab-bounded)",
        max_vocab_rows,
    )
    vocab = cnt["token"].to_numpy(dtype=object).astype(str)
    order = np.argsort(vocab)
    counts = cnt["n"].to_numpy(dtype=np.float64)[order]
    total = float(counts.sum())
    ref = ray.put((vocab[order], np.log(counts / total)))

    def score(t: pa.Table) -> pa.Table:
        vocab_, logp_ = ray.get(ref)
        pairs = _token_pairs(t)
        if pairs.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "avg_logprob": pa.array([], pa.float64()),
                }
            )
        doc = pairs["doc_id"].to_numpy(zero_copy_only=False)
        tok = np.asarray(pairs["tok"].to_pylist(), dtype=str)
        lp = logp_[np.searchsorted(vocab_, tok)]
        # docs are contiguous runs in _token_pairs (np.repeat order)
        starts = np.flatnonzero(np.concatenate(([True], doc[1:] != doc[:-1])))
        n = np.diff(np.append(starts, len(doc)))
        s = np.add.reduceat(lp, starts)
        return pa.table(
            {
                "doc_id": pa.array(doc[starts], pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "avg_logprob": pa.array(np.round(s / n, 4), pa.float64()),
            }
        )

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def ngram_counts(sf_dir: str, n: int = 2, k: int = 100) -> pd.DataFrame:
    """Corpus heavy-hitter word ``n``-grams (default bigrams) — the LM /
    contamination-analysis companion to ``vocab_topk``, with the same
    partial-count-then-small-groupby shuffle discipline: per-batch
    n-gram counts ride the all-to-all, never raw n-gram occurrences.
    N-grams never cross document boundaries. Ties break n-gram asc."""
    assert n >= 2
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        pairs = _token_pairs(t)
        doc = pairs["doc_id"].to_numpy(zero_copy_only=False)
        tok = np.asarray(pairs["tok"].to_pylist(), dtype=object)
        if len(tok) < n:
            return pa.table({"ngram": pa.array([], pa.string()), "p_n": pa.array([], pa.int64())})
        # valid start i: positions where tokens i..i+n-1 share a doc_id
        valid = doc[: len(doc) - n + 1] == doc[n - 1 :]
        tok_s = tok.astype(str)
        m = len(tok_s) - n + 1
        grams = tok_s[:m]
        for j in range(1, n):
            grams = np.char.add(np.char.add(grams, " "), tok_s[j : m + j])
        g = (
            pa.table({"ngram": pa.array(grams[valid].tolist(), pa.string())})
            .group_by("ngram")
            .aggregate([([], "count_all")])
        )
        return rename(g, {"count_all": "p_n"})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ngram")
        .aggregate(Sum("p_n", alias_name="n"))
        .sort(["n", "ngram"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return out.reset_index(drop=True)


def token_postings(sf_dir: str, n_buckets: int | None = None) -> rd.Dataset:
    """Inverted index build: ``token -> (df, sorted posting list)`` —
    the retrieval-side artifact a web corpus ships next to the text
    (and the input to BM25 / contamination lookup services). Postings
    are emitted as a comma-joined string of ascending doc_ids so the
    row is a plain (string, int64, string) record — the on-disk layout
    a sharded index actually stores per term.

    Shuffle discipline: the per-batch partial dedups (doc_id, token)
    pairs — globally distinct because a document is whole within one
    batch — so the all-to-all moves one row per distinct (doc, token),
    never per occurrence. The grouping key is ``hash64(token) % B``
    (house bucketed dispatch, B ~ cluster CPUs), NOT the raw token: a
    10^7-term vocabulary would otherwise pay Ray's per-group pandas
    dispatch once per term. Inside a bucket one lexsort orders
    (token, doc_id) and the join-per-term runs at C speed via pandas'
    grouped ``str.join``. Output stays a distributed Dataset — the
    index is vocab-partitioned across buckets; no node ever holds all
    postings (stop-word rows are long, but one row each, and Arrow
    strings stream block-by-block)."""
    from .common import n_shuffle_buckets

    B = n_buckets or n_shuffle_buckets()
    assert B & (B - 1) == 0, f"n_buckets must be a power of two, got {B}"
    from ..functions.urls import hash64

    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        distinct = _token_pairs(t).group_by(["doc_id", "tok"]).aggregate([])
        tok = distinct["tok"].combine_chunks()
        b = (hash64(tok.to_pylist()) & np.uint64(B - 1)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(b, pa.int64()),
                "token": tok,
                "doc_id": distinct["doc_id"],
            }
        )

    def build(g: pd.DataFrame) -> pd.DataFrame:
        tok = g["token"].to_numpy(dtype=object)
        doc = g["doc_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((doc, tok))
        tok_s, doc_s = tok[order], doc[order]
        starts = np.flatnonzero(
            np.concatenate(([True], tok_s[1:] != tok_s[:-1]))
        )
        df = np.diff(np.append(starts, len(tok_s)))
        doc_str = doc_s.astype(str)
        postings = [
            ",".join(doc_str[s : s + n]) for s, n in zip(starts, df)
        ]
        return pd.DataFrame(
            {
                "token": tok_s[starts],
                "df": df.astype(np.int64),
                "postings": postings,
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(build, batch_format="pandas")
    )


def cooccurrence_topk(sf_dir: str, window: int = 3, k: int = 100) -> pd.DataFrame:
    """Skip-gram co-occurrence heavy hitters: the top-``k`` ordered
    (center, context) token pairs within ``window`` positions in the
    same document — the count table a word2vec/GloVe-style embedding
    pass accumulates. The window EXPANSION is vectorized in-batch
    (for each offset d in 1..window, one shifted-array zip over the
    flattened token stream with doc-boundary rows masked — the
    ``hopping_window`` tiling discipline applied to token positions),
    pre-aggregated per (w1, w2) before the shuffle (pairs are
    vocab^2-but-Zipf-bounded; raw positions never ride the all-to-all),
    and the global top-k uses the ``top_tokens_per_lang`` combiner
    argument: counts are final after the groupby, so per-batch partial
    top-k is sound. Ties break (n DESC, w1 ASC, w2 ASC) on both sides.
    Both directions are counted ((a,b) at distance d and (b,a) at -d),
    matching the oracle's symmetric positional self-join."""
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def pair_partial(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"].combine_chunks(), "")
        toks_list = pc.split_pattern_regex(text, pattern=r"\s+")
        lens = pc.list_value_length(toks_list).to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        flat = pc.list_flatten(toks_list)
        nonempty = pc.not_equal(flat, "")
        flat = flat.filter(nonempty)
        doc = doc[nonempty.to_numpy(zero_copy_only=False)]
        n = len(flat)
        parts = []
        for d in range(1, window + 1):
            if n <= d:
                break
            same_doc = doc[d:] == doc[:-d]
            idx = np.flatnonzero(same_doc)
            if not len(idx):
                continue
            w1 = flat.take(pa.array(idx, pa.int64()))
            w2 = flat.take(pa.array(idx + d, pa.int64()))
            # both directions: (center, context) at +d and -d
            parts.append(pa.table({"w1": w1, "w2": w2}))
            parts.append(pa.table({"w1": w2, "w2": w1}))
        if not parts:
            return pa.table({"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
                             "p_n": pa.array([], pa.int64())})
        g = pa.concat_tables(parts).group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return rename(g, {"count_all": "p_n"})

    def _pair_topk(w1: np.ndarray, w2: np.ndarray, n: np.ndarray) -> pd.DataFrame:
        order = np.lexsort((w2, w1, -n))[:k]
        return pd.DataFrame({"w1": w1[order], "w2": w2[order], "n": n[order]})

    def partial_topk(t: pa.Table) -> pa.Table:
        df = _pair_topk(
            t["w1"].to_numpy(zero_copy_only=False),
            t["w2"].to_numpy(zero_copy_only=False),
            t["n"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        return pa.table(
            {
                "w1": pa.array(df["w1"], pa.string()),
                "w2": pa.array(df["w2"], pa.string()),
                "n": pa.array(df["n"], pa.int64()),
            }
        )

    counts = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("p_n", alias_name="n"))
        .map_batches(partial_topk, batch_format="pyarrow")
        .to_pandas()  # <= k rows per post-groupby batch
    )
    out = _pair_topk(
        counts["w1"].to_numpy(), counts["w2"].to_numpy(), counts["n"].to_numpy(dtype=np.int64)
    )
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


def bigram_pmi(sf_dir: str, max_vocab_rows: int = 50_000_000) -> rd.Dataset:
    """Pointwise mutual information per adjacent-word bigram —
    ``ln( P(xy) / (P(x) P(y)) )`` — the collocation / phrase-mining
    score (Mikolov et al. 2013 phrase detection; "new york" scores
    high, "the the" low).

    Same two-pass shape as ``tfidf_topk`` / ``unigram_logprob``: the
    unigram count table is vocab-bounded (Zipf), lands on the driver
    through ``bounded_driver_frame`` and is broadcast ONCE via
    ``ray.put`` as (sorted vocab, counts); the bigram count table is
    corpus-bounded so it STAYS a Dataset (in-batch additive partials
    ride the one shuffle, exactly ``ngram_counts``'s discipline) and
    the PMI attach is a shuffle-free vectorized ``searchsorted`` map
    over it. Both scalar totals come from the count tables themselves
    (N_uni = sum of unigram counts; N_bi = sum of bigram counts), so
    the arithmetic ``ln((n/Nb) / ((cx/Nu)*(cy/Nu)))`` is mirrored
    operation-for-operation by the SQL oracle (same float64 division
    tree, same libm log), rounded to 4 decimals on both sides."""
    import ray

    from .common import bounded_driver_frame

    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def uni_partial(t: pa.Table) -> pa.Table:
        g = _token_pairs(t).group_by("tok").aggregate([([], "count_all")])
        return rename(g, {"tok": "token", "count_all": "p_n"})

    cnt = bounded_driver_frame(
        ds.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("p_n", alias_name="n")),
        "bigram_pmi unigram count table (vocab-bounded)",
        max_vocab_rows,
    )
    vocab = cnt["token"].to_numpy(dtype=object).astype(str)
    order = np.argsort(vocab)
    ucounts = cnt["n"].to_numpy(dtype=np.float64)[order]
    nu = float(ucounts.sum())
    ref = ray.put((vocab[order], ucounts))

    def bi_partial(t: pa.Table) -> pa.Table:
        pairs = _token_pairs(t)
        doc = pairs["doc_id"].to_numpy(zero_copy_only=False)
        tok = np.asarray(pairs["tok"].to_pylist(), dtype=str)
        if len(tok) < 2:
            return pa.table(
                {
                    "tok1": pa.array([], pa.string()),
                    "tok2": pa.array([], pa.string()),
                    "p_n": pa.array([], pa.int64()),
                }
            )
        valid = doc[:-1] == doc[1:]  # bigrams never cross documents
        g = (
            pa.table(
                {
                    "tok1": pa.array(tok[:-1][valid], pa.string()),
                    "tok2": pa.array(tok[1:][valid], pa.string()),
                }
            )
            .group_by(["tok1", "tok2"])
            .aggregate([([], "count_all")])
        )
        return rename(g, {"count_all": "p_n"})

    bi = (
        ds.map_batches(bi_partial, batch_format="pyarrow")
        .groupby(["tok1", "tok2"])
        .aggregate(Sum("p_n", alias_name="n"))
        .materialize()
    )
    nb = float(bi.sum("n"))

    def attach(t: pa.Table) -> pa.Table:
        vocab_, cnt_ = ray.get(ref)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        cx = cnt_[np.searchsorted(vocab_, np.asarray(t["tok1"].to_pylist(), dtype=str))]
        cy = cnt_[np.searchsorted(vocab_, np.asarray(t["tok2"].to_pylist(), dtype=str))]
        pmi = np.log((n / nb) / ((cx / nu) * (cy / nu)))
        return pa.table(
            {
                "tok1": t["tok1"],
                "tok2": t["tok2"],
                "n": t["n"],
                "pmi": pa.array(np.round(pmi, 4), pa.float64()),
            }
        )

    return bi.map_batches(attach, batch_format="pyarrow")


def compression_ratio(
    sf_dir: str, min_ratio: float = 0.25, max_ratio: float = 1.0, level: int = 6
) -> rd.Dataset:
    """Per-document zlib compression ratio — the entropy-based quality
    signal (highly compressible text is boilerplate/repetition, nearly
    incompressible text is noise/garbage; Dolma and RefinedWeb both
    gate on this family). ``keep`` = min_ratio <= ratio <= max_ratio.

    Batch-local and shuffle-free: one ``map_batches``, the compressor
    is a per-doc C call (zlib) over the batch — the same
    per-row-C-kernel shape as ``fingerprints``; nothing about a doc's
    score depends on any other doc, so the stage streams at input
    parallelism. Not SQL-expressible (no oracle); pinned in pytest by
    planted repetitive / random / fluent docs and determinism."""
    import zlib

    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        raw = [s.encode() if s else b"" for s in texts]
        n_bytes = np.array([len(b) for b in raw], dtype=np.int64)
        n_comp = np.array(
            [len(zlib.compress(b, level)) for b in raw], dtype=np.int64
        )
        ratio = n_comp / np.maximum(n_bytes, 1)
        keep = (ratio >= min_ratio) & (ratio <= max_ratio) & (n_bytes > 0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "n_compressed": pa.array(n_comp, pa.int64()),
                "ratio": pa.array(np.round(ratio, 4), pa.float64()),
                "keep": pa.array(keep.astype(np.int64), pa.int64()),
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


def bm25_topk(
    sf_dir: str,
    query: str = "hash table scan",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> pd.DataFrame:
    """BM25 keyword search: top-``k`` documents for a query string
    (Robertson-Sparck Jones probabilistic relevance, the lexical
    retrieval baseline next to the kNN family) — what a corpus ships
    the ``token_postings`` index FOR.

    Shuffle-shape: corpus stats (N, avgdl, per-term df) come from ONE
    pass of additive per-batch partials — df only for the query's own
    terms, so the stats frame is query-sized, not vocab-sized — and
    broadcast back. Scoring is then SHUFFLE-FREE: a document is whole
    within one batch, so each batch computes its docs' COMPLETE BM25
    scores (vectorized: one ``_token_pairs`` explode, tf per
    (doc, term) via arrow group_by, one searchsorted into the term
    table) and emits only its local top-k — the global top-k is a
    sort+limit over k rows per batch. The SQL oracle mirrors the
    float64 expression tree (idf = ln((N - df + .5)/(df + .5) + 1);
    tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))) term for term."""
    import ray

    terms = sorted(set(query.split()))
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def stats_partial(t: pa.Table) -> pa.Table:
        pairs = _token_pairs(t)
        tok = pairs["tok"]
        hit = pairs.filter(pc.is_in(tok, value_set=pa.array(terms)))
        dfp = hit.group_by(["doc_id", "tok"]).aggregate([]).group_by("tok").aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "tok": pa.concat_arrays(
                    [dfp["tok"].combine_chunks(), pa.array(["\x00docs", "\x00toks"])]
                ),
                "p_n": pa.array(
                    dfp["count_all"].to_pylist() + [t.num_rows, pairs.num_rows],
                    pa.int64(),
                ),
            }
        )

    st = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("p_n", alias_name="n"))
        .to_pandas()  # |terms| + 2 rows
        .set_index("tok")["n"]
    )
    n_docs = float(st["\x00docs"])
    avgdl = float(st["\x00toks"]) / n_docs
    df = np.array([float(st.get(t_, 0)) for t_ in terms])
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    term_arr = np.array(terms, dtype=object).astype(str)
    ref = ray.put((term_arr, idf))

    def score_topk(t: pa.Table) -> pa.Table:
        terms_, idf_ = ray.get(ref)
        pairs = _token_pairs(t)
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
        )
        if pairs.num_rows == 0:
            return empty
        dl_t = pairs.group_by("doc_id").aggregate([([], "count_all")])
        dl_doc = dl_t["doc_id"].to_numpy(zero_copy_only=False)
        dl_n = dl_t["count_all"].to_numpy(zero_copy_only=False).astype(np.float64)
        hit = pairs.filter(pc.is_in(pairs["tok"], value_set=pa.array(list(terms_))))
        if hit.num_rows == 0:
            return empty
        tf_t = hit.group_by(["doc_id", "tok"]).aggregate([([], "count_all")])
        doc = tf_t["doc_id"].to_numpy(zero_copy_only=False)
        tok = np.asarray(tf_t["tok"].to_pylist(), dtype=str)
        tf = tf_t["count_all"].to_numpy(zero_copy_only=False).astype(np.float64)
        ti = np.searchsorted(terms_, tok)
        dlo = np.argsort(dl_doc)
        dl = dl_n[dlo[np.searchsorted(dl_doc[dlo], doc)]]
        part = idf_[ti] * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        # per-doc sum over its matched terms (docs are batch-whole, so
        # these are COMPLETE scores), then the in-batch top-k combiner
        udoc, inv = np.unique(doc, return_inverse=True)
        score = np.zeros(len(udoc))
        np.add.at(score, inv, part)
        top = np.lexsort((udoc, -score))[: min(k, len(udoc))]
        return pa.table(
            {
                "doc_id": pa.array(udoc[top], pa.int64()),
                "score": pa.array(score[top], pa.float64()),
            }
        )

    out = (
        ds.map_batches(score_topk, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    if "score" not in out.columns:  # no term hit anywhere: empty drops the schema
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype=np.int64), "score": pd.Series([], dtype="float64")}
        )
    out["score"] = out["score"].round(4)
    return out.reset_index(drop=True)


def zscore_by_lang(sf_dir: str) -> rd.Dataset:
    """Per-group feature normalization: z-score each document's length
    within its language — the grouped standardization step an ML prep
    pipeline runs before mixing features across populations (an 'en'
    doc and a 'zh' doc of equal byte length are very different
    lengths relative to their groups).

    Two passes, no all-to-all over rows: pass 1 is the house
    partial-combiner groupby landing |langs| rows of (n, sum, sumsq)
    moments on the driver; the per-lang mean and population std are
    broadcast once, and pass 2 is a shuffle-free vectorized map. The
    SQL oracle mirrors the moment arithmetic (sqrt(sumsq/n - mean^2))
    rather than calling STDDEV_POP, so the float64 trees agree."""
    import ray

    ds = T(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def moments(t: pa.Table) -> pa.Table:
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        t2 = pa.table(
            {"lang": t["lang"], "x": pa.array(x), "xx": pa.array(x * x)}
        )
        g = t2.group_by("lang").aggregate([("x", "sum"), ("xx", "sum"), ([], "count_all")])
        return rename(g, {"x_sum": "p_sum", "xx_sum": "p_sumsq", "count_all": "p_n"})

    mom = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("p_sum", alias_name="s"),
            Sum("p_sumsq", alias_name="ss"),
            Sum("p_n", alias_name="n"),
        )
        .to_pandas()  # |langs| rows
    )
    langs = mom["lang"].to_numpy(dtype=object).astype(str)
    order = np.argsort(langs)
    n = mom["n"].to_numpy(dtype=np.float64)[order]
    mean = mom["s"].to_numpy(dtype=np.float64)[order] / n
    std = np.sqrt(mom["ss"].to_numpy(dtype=np.float64)[order] / n - mean * mean)
    ref = ray.put((langs[order], mean, std))

    def attach(t: pa.Table) -> pa.Table:
        langs_, mean_, std_ = ray.get(ref)
        li = np.searchsorted(langs_, np.asarray(t["lang"].to_pylist(), dtype=str))
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        z = (x - mean_[li]) / std_[li]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "n_chars": t["n_chars"],
                "z_len": pa.array(np.round(z, 4), pa.float64()),
            }
        )

    return ds.map_batches(attach, batch_format="pyarrow")


def doc_len_histogram(sf_dir: str, bin_width: int = 200) -> pd.DataFrame:
    """Fixed-width histogram of document length per language — the
    corpus-profiling distribution a data-quality dashboard plots before
    choosing filter thresholds. Bin assignment is one vectorized integer
    division over the pre-computed ``n_chars`` column (only 2 columns
    leave storage — the text itself is never read); the in-batch partial
    pre-counts per (lang, bin), so the all-to-all moves one row per
    (lang, bin, batch) regardless of corpus size."""
    ds = T(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bin_lo = pc.multiply(
            pc.divide(t["n_chars"], pa.scalar(bin_width, pa.int64())),
            pa.scalar(bin_width, pa.int64()),
        )
        g = (
            pa.table({"lang": t["lang"], "bin_lo": bin_lo})
            .group_by(["lang", "bin_lo"])
            .aggregate([([], "count_all")])
        )
        return rename(g, {"count_all": "p_n"})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "bin_lo"])
        .aggregate(Sum("p_n", alias_name="n_docs"))
        .to_pandas()
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values(["lang", "bin_lo"]).reset_index(drop=True)


def _bpe_merge_flat(flat: np.ndarray, lens: np.ndarray, left: str, right: str):
    """Apply one BPE merge over a flattened symbol array with segment
    lengths ``lens`` (a segment = one word): match (left, right) at
    adjacent positions within a segment, resolve overlapping matches
    leftmost-greedy (consecutive matches only arise when left == right;
    keep alternate positions within each run), replace the kept
    positions with the merged symbol and delete their right neighbors.
    Returns (new_flat, new_lens, changed)."""
    if len(flat) < 2:
        return flat, lens, False
    wid = np.repeat(np.arange(len(lens)), lens)
    m = (flat[:-1] == left) & (flat[1:] == right) & (wid[:-1] == wid[1:])
    p = np.flatnonzero(m)
    if len(p) == 0:
        return flat, lens, False
    new_run = np.empty(len(p), dtype=bool)
    new_run[0] = True
    np.not_equal(p[1:], p[:-1] + 1, out=new_run[1:])
    rs = np.repeat(p[new_run], np.diff(np.append(np.flatnonzero(new_run), len(p))))
    keep = p[((p - rs) % 2) == 0]
    flat2 = flat.copy()
    flat2[keep] = left + right
    mask = np.ones(len(flat), dtype=bool)
    mask[keep + 1] = False
    new_lens = lens - np.bincount(wid[keep + 1], minlength=len(lens))
    return flat2[mask], new_lens, True


def bpe_merges(sf_dir: str, iters: int = 6) -> pd.DataFrame:
    """Distributed BPE merge-table training (Sennrich et al. 2016) — the
    tokenizer-training pass a corpus pipeline runs before packing: learn
    the ``iters`` highest-count symbol-pair merges over the corpus.

    Scale shape: the CORPUS is touched exactly once (the word-frequency
    groupby — in-batch partial counts, the shuffle moves (token, count)
    partials); every iteration then runs over the WORD-VOCAB table
    (zipfian: orders of magnitude smaller than the corpus, but still
    10^7-10^8 rows at 100 TB — kept a distributed Dataset, never
    collected). Per iteration: (1) adjacent-pair counts weighted by word
    frequency, combined in-batch via ``np.unique`` so the all-to-all
    moves one (left, right, cnt) partial per distinct pair per batch;
    (2) the argmax pair lands on the driver via sort+limit(1) — ONE row
    of driver state per iteration (count desc, then (left, right) asc:
    the deterministic tie-break the pytest reference shares); (3) the
    merge is applied vectorized over the flattened symbol array (match
    positions by shifted equality, leftmost-greedy overlap resolution by
    keeping alternate positions inside consecutive-match runs — only
    reachable when left == right), and the vocab re-materializes so the
    next iteration gathers object-store blocks instead of replaying the
    whole merge lineage.

    Iterative + per-iteration argmax -> not SQL-expressible; pytest pins
    the full merge sequence and counts against a pure-Python dict-based
    Sennrich reference on the same corpus. Returns one row per merge:
    (rank, left, right, cnt)."""
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def word_partial(t: pa.Table) -> pa.Table:
        g = _token_pairs(t).group_by("tok").aggregate([([], "count_all")])
        return rename(g, {"tok": "word", "count_all": "p_n"})

    def to_syms(t: pa.Table) -> pa.Table:
        words = t["word"].to_pylist()
        return pa.table(
            {
                "word": t["word"],
                "n": t["n"],
                "syms": pa.array([list(w) for w in words], pa.list_(pa.string())),
            }
        )

    vocab = (
        ds.map_batches(word_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("p_n", alias_name="n"))
        .map_batches(to_syms, batch_format="pyarrow")
        .materialize()
    )

    _empty_pairs = pa.table(
        {"left": pa.array([], pa.string()), "right": pa.array([], pa.string()), "p_cnt": pa.array([], pa.int64())}
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        syms = t["syms"].combine_chunks()
        lens = pc.list_value_length(syms).to_numpy(zero_copy_only=False).astype(np.int64)
        if lens.sum() < 2:
            return _empty_pairs
        flat = np.asarray(pc.list_flatten(syms).to_pylist(), dtype=object)
        wid = np.repeat(np.arange(len(lens)), lens)
        wgt_all = np.repeat(t["n"].to_numpy(zero_copy_only=False).astype(np.int64), lens)
        m = wid[:-1] == wid[1:]
        if not m.any():
            return _empty_pairs
        a = flat[:-1][m].astype(str)
        b = flat[1:][m].astype(str)
        wgt = wgt_all[:-1][m]
        key = np.char.add(np.char.add(a, "\x1f"), b)
        uk, inv = np.unique(key, return_inverse=True)
        cnt = np.bincount(inv, weights=wgt).astype(np.int64)
        parts = np.char.partition(uk, "\x1f")
        return pa.table(
            {
                "left": pa.array(parts[:, 0].tolist(), pa.string()),
                "right": pa.array(parts[:, 2].tolist(), pa.string()),
                "p_cnt": pa.array(cnt, pa.int64()),
            }
        )

    def apply_merge(left: str, right: str):
        def apply(t: pa.Table) -> pa.Table:
            syms = t["syms"].combine_chunks()
            lens = pc.list_value_length(syms).to_numpy(zero_copy_only=False).astype(np.int64)
            flat = np.asarray(pc.list_flatten(syms).to_pylist(), dtype=object)
            flat2, new_lens, changed = _bpe_merge_flat(flat, lens, left, right)
            if not changed:
                return t
            offsets = np.concatenate(([0], np.cumsum(new_lens)))
            return pa.table(
                {
                    "word": t["word"],
                    "n": t["n"],
                    "syms": pa.ListArray.from_arrays(
                        pa.array(offsets, pa.int32()), pa.array(flat2.tolist(), pa.string())
                    ),
                }
            )

        return apply

    out = []
    for rank in range(iters):
        best = (
            vocab.map_batches(pair_partial, batch_format="pyarrow")
            .groupby(["left", "right"])
            .aggregate(Sum("p_cnt", alias_name="cnt"))
            .sort(["cnt", "left", "right"], descending=[True, False, False])
            .limit(1)
            .to_pandas()
        )
        if len(best) == 0 or int(best["cnt"].iloc[0]) < 1:
            break
        left, right, cnt = str(best["left"].iloc[0]), str(best["right"].iloc[0]), int(best["cnt"].iloc[0])
        out.append({"rank": rank, "left": left, "right": right, "cnt": cnt})
        vocab = vocab.map_batches(apply_merge(left, right), batch_format="pyarrow").materialize()

    return pd.DataFrame(out, columns=["rank", "left", "right", "cnt"]).astype(
        {"rank": "int64", "cnt": "int64"}
    )


_QC_FEATS = ["n_chars", "n_tokens", "mean_word_len", "alpha_ratio", "punct_ratio", "stop_ratio"]


def _lazy_qc_block_task():
    import ray

    @ray.remote
    def _qc_block(blk, w, mu, sd):
        """Per-block moment/gradient partial over a materialized feature
        block. ``w is None`` -> standardization moments (sum, sumsq, n);
        else -> the logistic-regression gradient partial at weights
        ``w`` given broadcast moments. Returns a (2d+1,)/(d+2,) float64
        vector — fixed-size regardless of block rows."""
        d = len(_QC_FEATS)
        if isinstance(blk, pa.Table):
            X = np.stack([blk[k].to_numpy(zero_copy_only=False) for k in _QC_FEATS], axis=1)
            y = blk["y"].to_numpy(zero_copy_only=False)
        else:
            X = blk[_QC_FEATS].to_numpy(dtype=np.float64)
            y = blk["y"].to_numpy(dtype=np.float64)
        if w is None:
            return np.concatenate([X.sum(0), (X * X).sum(0), [float(len(X))]])
        Xs = (X - mu) / sd
        z = Xs @ w[:d] + w[d]
        p = 1.0 / (1.0 + np.exp(-z))
        e = p - y
        return np.concatenate([Xs.T @ e, [e.sum()], [float(len(X))]])

    return _qc_block


_qc_block_task = None


def quality_classifier(sf_dir: str, iters: int = 30, lr: float = 0.5) -> pd.DataFrame:
    """Train a quality/language filter ON the engine: full-batch
    logistic regression (label: ``lang == 'en'``) over the
    ``quality_features`` signals — the fasttext-style classifier pass a
    curation pipeline runs to learn a keep/drop filter from a labeled
    slice, expressed with the house iterative shape:

    - features are computed ONCE (one streaming scan; the regex/char
      kernels are the expensive part) and materialized as a compact
      numeric Dataset — iterations never re-featurize text;
    - each iteration maps ONE raw task per materialized block (the
      direct-task tier the crawl engine and the FastSV/PageRank probes
      use: iterating through a full executor launch pays ~1 s of
      planning per pass at any scale) returning a FIXED-SIZE partial
      (d+2 floats), summed on the driver — driver state is model-sized
      (7 floats + nblocks partial vectors), never corpus-sized;
    - weights ride the task args (7 floats/task; the object store holds
      the feature blocks, which never move).

    Iterative + nonlinear -> no SQL oracle; pytest pins the final
    weights against a driver-local numpy implementation of the IDENTICAL
    pipeline (same standardization, zeros init, lr, iteration count) and
    the driver contract records rows-only. Returns (feature, weight)
    rows — ``__bias__`` last."""
    import ray

    from ..functions import text as _tx

    global _qc_block_task
    if _qc_block_task is None:
        _qc_block_task = _lazy_qc_block_task()

    ds = T(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def featurize(t: pa.Table) -> pa.Table:
        f = _tx.quality_features(t["text"].to_pylist())
        cols: dict = {"doc_id": t["doc_id"]}
        for k in _QC_FEATS:
            cols[k] = pa.array(f[k].astype(np.float64), pa.float64())
        cols["y"] = pa.array(
            pc.equal(t["lang"], "en").to_numpy(zero_copy_only=False).astype(np.float64),
            pa.float64(),
        )
        return pa.table(cols)

    feats = ds.map_batches(featurize, batch_format="pyarrow").materialize()
    refs = [r for b in feats.iter_internal_ref_bundles() for r in b.block_refs]
    d = len(_QC_FEATS)

    m = np.sum(ray.get([_qc_block_task.remote(r, None, None, None) for r in refs]), axis=0)
    n_total = m[-1]
    mu = m[:d] / n_total
    sd = np.sqrt(np.maximum(m[d : 2 * d] / n_total - mu * mu, 0.0))
    sd[sd == 0.0] = 1.0

    w = np.zeros(d + 1, dtype=np.float64)
    for _ in range(iters):
        g = np.sum(ray.get([_qc_block_task.remote(r, w, mu, sd) for r in refs]), axis=0)
        w = w - lr * g[: d + 1] / n_total

    return pd.DataFrame({"feature": _QC_FEATS + ["__bias__"], "weight": np.round(w, 9)})


def bpe_encode(sf_dir: str, iters: int = 6) -> rd.Dataset:
    """Apply the learned BPE merge table to the WHOLE corpus and return
    per-document BPE token counts — the encode half of the tokenizer
    story (``bpe_merges`` trains; this measures what the trained
    tokenizer does to every document, the count that drives packing /
    budget decisions). The merge table (``iters`` rows) broadcasts by
    closure; encoding is one shuffle-free ``map_batches``: each batch
    flattens every word of every doc into ONE symbol array and applies
    the ranked merges as ``iters`` vectorized passes over it (never a
    per-word Python merge loop).

    Pinned in pytest against a pure-Python encoder using the same merge
    list (itself pinned to the Sennrich reference). Returns (doc_id,
    n_chars_sym, n_bpe): symbol count before merges (= non-space chars
    of tokenized words) and after."""
    merges = bpe_merges(sf_dir, iters=iters)
    pairs = list(zip(merges["left"].tolist(), merges["right"].tolist()))

    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def encode(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        # flatten: every word of every doc -> char symbols; track word->doc
        word_doc, words = [], []
        for i, x in enumerate(texts):
            toks = tx._RE_TOKEN.findall(x or "")
            words.extend(toks)
            word_doc.extend([i] * len(toks))
        if not words:
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "n_chars_sym": pa.array(np.zeros(len(texts), np.int64)),
                    "n_bpe": pa.array(np.zeros(len(texts), np.int64)),
                }
            )
        lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=len(words))
        flat = np.asarray([c for w in words for c in w], dtype=object)
        n_sym0 = np.bincount(np.asarray(word_doc), weights=lens, minlength=len(texts)).astype(np.int64)
        for left, right in pairs:
            flat, lens, _ = _bpe_merge_flat(flat, lens, left, right)
        n_bpe = np.bincount(np.asarray(word_doc), weights=lens, minlength=len(texts)).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars_sym": pa.array(n_sym0, pa.int64()),
                "n_bpe": pa.array(n_bpe, pa.int64()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")



def oov_rate(sf_dir: str, vocab_k: int = 10) -> rd.Dataset:
    """Out-of-vocabulary rate per document against the corpus's own
    top-``vocab_k`` vocabulary — the coverage check run when fixing a
    tokenizer/vocab budget: the vocab is a distributed exact top-k
    (deterministic (count desc, token asc) tie-break, same as
    ``vocab_topk``), broadcast ONCE as a sorted string array, and the
    per-doc scoring is one shuffle-free vectorized ``map_batches``
    (``np.isin`` membership + bincount per doc). Docs with zero tokens
    are excluded on both sides (the rate is undefined). SQL-oracled:
    the oracle rebuilds the same vocab with the same tie-break."""
    vocab = np.sort(vocab_topk(sf_dir, vocab_k)["token"].to_numpy(dtype=object))
    import ray

    vref = ray.put(vocab)
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        v = ray.get(vref)
        pairs = _token_pairs(t)
        doc = pairs["doc_id"].to_numpy(zero_copy_only=False)
        tok = np.asarray(pairs["tok"].to_pylist(), dtype=object)
        uniq, inv = np.unique(doc, return_inverse=True)
        n_tok = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        oov = ~np.isin(tok, v)
        n_oov = np.bincount(inv, weights=oov.astype(np.float64), minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_oov": pa.array(n_oov, pa.int64()),
                "oov_rate": pa.array(np.round(n_oov / n_tok, 4), pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def _positional_tokens(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_id, pos, tok) arrays for a documents batch — same \\s+ split
    + empty-drop as ``_token_pairs``, with 1-based positions over the
    FILTERED sequence (matching the explode_tokens oracle's
    generate_subscripts-after-list_filter numbering)."""
    pairs = _token_pairs(t)
    doc = pairs["doc_id"].to_numpy(zero_copy_only=False)
    tok = pairs["tok"].to_numpy(zero_copy_only=False)
    if len(doc) == 0:
        return doc, np.empty(0, dtype=np.int64), tok
    first = np.concatenate(([True], doc[1:] != doc[:-1]))
    starts = np.flatnonzero(first)
    offsets = np.repeat(starts, np.diff(np.append(starts, len(doc))))
    pos = np.arange(len(doc), dtype=np.int64) - offsets + 1
    return doc, pos, tok


def _anchor_counts(
    d: np.ndarray, a: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, n_hits) from per-offset anchor match rows: a (doc,
    anchor) pair with exactly ``k`` rows means every phrase offset
    matched there. Lexsort run-scan — safe for arbitrary int64 doc ids
    (no key fusing; a ``doc << 32`` fuse would overflow past 2^31)."""
    order = np.lexsort((a, d))
    d_s, a_s = d[order], a[order]
    new = np.concatenate(([True], (d_s[1:] != d_s[:-1]) | (a_s[1:] != a_s[:-1])))
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, len(d_s)))
    full_docs = d_s[starts][counts == k]  # still doc-sorted
    if len(full_docs) == 0:
        return full_docs, full_docs
    first = np.concatenate(([True], full_docs[1:] != full_docs[:-1]))
    fstarts = np.flatnonzero(first)
    n = np.diff(np.append(fstarts, len(full_docs))).astype(np.int64)
    return full_docs[fstarts], n


def phrase_search(sf_dir: str, phrase: str = "the fast") -> pd.DataFrame:
    """Token-phrase search by direct corpus scan: every document
    containing the query tokens ADJACENT in order, with the match count
    — the grep/contamination-lookup primitive. Entirely in-batch (a
    document is whole within one batch, so anchor intersection never
    crosses batches): ZERO shuffles, and only matching docs leave the
    task — output is hit-sized. The indexed sibling
    (``phrase_search_indexed``) serves the repeated-query regime."""
    toks = [w for w in phrase.split() if w]
    assert toks, "empty phrase"
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def scan(t: pa.Table) -> pa.Table:
        doc, pos, tok = _positional_tokens(t)
        hits_doc: list[np.ndarray] = []
        hits_anchor: list[np.ndarray] = []
        for i, w in enumerate(toks):
            m = tok == w
            hits_doc.append(doc[m])
            hits_anchor.append(pos[m] - i)
        # count rows per (doc, anchor): == len(toks) iff every i matched
        d = np.concatenate(hits_doc)
        a = np.concatenate(hits_anchor)
        if len(d) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "n_hits": pa.array([], pa.int64())}
            )
        docs, n = _anchor_counts(d, a, len(toks))
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.int64()),
                "n_hits": pa.array(n, pa.int64()),
            }
        )

    out = ds.map_batches(scan, batch_format="pyarrow").to_pandas()
    if out.empty:  # zero hits: Ray's to_pandas drops the column names
        out = pd.DataFrame(
            {"doc_id": pd.Series([], dtype=np.int64), "n_hits": pd.Series([], dtype=np.int64)}
        )
    return out.sort_values("doc_id").reset_index(drop=True)


def _postings_rows_fn(n_buckets: int):
    """The tokenize-to-bucketed-postings batch fn, shared by the full
    build and the incremental shard ingest so their tokenization and
    bucketing can never drift apart (drift = shard postings that the
    query-time counts==k exactness silently drops)."""
    from ..functions.urls import hash64

    def rows(t: pa.Table) -> pa.Table:
        doc, pos, tok = _positional_tokens(t)
        b = (hash64(tok) & np.uint64(n_buckets - 1)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(b, pa.int64()),
                "token": pa.array(tok, pa.string()),
                "doc_id": pa.array(doc, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    return rows


def postings_build_index(sf_dir: str, index_dir: str, n_buckets: int = 32) -> str:
    """Build the PERSISTED positional postings index: one distributed
    tokenize pass, written as token-hash-bucketed parquet
    (``index_dir/bucket=N/part-*.parquet`` rows (token, doc_id, pos))
    plus a tiny meta file carrying the bucket count. The build-once
    half of the repeated-query regime (the text twin of
    ``ivf_build_index``): at web-corpus scale the tokenize pass runs
    exactly once, the hive layout is resumable, and every later phrase
    query opens ONLY its query tokens' ``bucket=`` directories — scan
    fraction ~ k/B of the index, enforced at the path level."""
    import os

    import pyarrow.parquet as pq

    from ..functions.urls import hash64

    assert n_buckets & (n_buckets - 1) == 0, (
        f"n_buckets must be a power of two, got {n_buckets}"
    )
    import shutil

    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    # build into a staging dir and atomically rename into place: a
    # crashed or repeated build can never leave (or append into) a
    # partially-built live index — Ray's writer names files uniquely,
    # so a naive re-run over an existing dir would DUPLICATE every
    # posting row and counts==k would then silently drop true matches
    staging = index_dir.rstrip("/") + ".build-tmp"
    shutil.rmtree(staging, ignore_errors=True)
    ds.map_batches(
        _postings_rows_fn(n_buckets), batch_format="pyarrow"
    ).write_parquet(staging, partition_cols=["bucket"])
    pq.write_table(
        pa.table({"n_buckets": pa.array([n_buckets], pa.int64())}),
        os.path.join(staging, "meta.parquet"),
    )
    shutil.rmtree(index_dir, ignore_errors=True)
    os.rename(staging, index_dir)
    return index_dir


def postings_update_index(new_dir: str, index_dir: str, shard_tag: str) -> bool:
    """Incrementally ingest a NEW document shard into an existing
    postings index — the daily-crawl operational path (the phrase-index
    twin of ``dedup_index_build``'s ``update_index``): tokenize ONLY the
    new shard, append its rows into the SAME ``bucket=`` hive layout
    (Ray's writer names files uniquely, so appends never clobber), and
    record ``shard_tag`` in an atomically-replaced manifest sidecar.
    A re-run with an already-ingested tag is a no-op (returns False) —
    idempotence at the shard level, so a failed orchestration can
    simply re-submit. The corpus already in the index is NEVER re-read:
    ingest cost is proportional to the new shard alone."""
    import os

    import pyarrow.parquet as pq

    meta_path = os.path.join(index_dir, "meta.parquet")
    assert os.path.exists(meta_path), f"no postings index at {index_dir}"
    nb = int(pq.read_table(meta_path)["n_buckets"][0].as_py())
    manifest_path = os.path.join(index_dir, "shards.parquet")
    done: list[str] = (
        pq.read_table(manifest_path)["shard_tag"].to_pylist()
        if os.path.exists(manifest_path)
        else []
    )
    if shard_tag in done:
        return False

    ds = T(new_dir, "documents", columns=["doc_id", "text"])
    rows = _postings_rows_fn(nb)  # SHARED with the full build — no drift

    # crash-safe ingest (the write_corpus_shards discipline): stage the
    # shard's postings in a sidecar dir, sweep any tag-prefixed files a
    # previous crashed attempt left in the live buckets, then rename the
    # staged files in (metadata-only moves) and record the manifest LAST
    # via tmp+replace — a crash at any point leaves a state the re-run
    # repairs, so ingest is exactly-once per tag.
    import shutil

    staging = os.path.join(index_dir, f".staging-{shard_tag}")
    shutil.rmtree(staging, ignore_errors=True)
    ds.map_batches(rows, batch_format="pyarrow").write_parquet(
        staging, partition_cols=["bucket"]
    )
    prefix = f"shard-{shard_tag}-"
    for b in range(nb):
        live = os.path.join(index_dir, f"bucket={b}")
        if os.path.isdir(live):
            for f in os.listdir(live):
                if f.startswith(prefix):
                    os.remove(os.path.join(live, f))
    for bdir in sorted(os.listdir(staging)):
        if not bdir.startswith("bucket="):
            continue
        live = os.path.join(index_dir, bdir)
        os.makedirs(live, exist_ok=True)
        src = os.path.join(staging, bdir)
        for i, f in enumerate(sorted(os.listdir(src))):
            os.replace(os.path.join(src, f), os.path.join(live, f"{prefix}{i}.parquet"))
    shutil.rmtree(staging, ignore_errors=True)
    tmp = manifest_path + ".tmp"
    pq.write_table(
        pa.table({"shard_tag": pa.array(done + [shard_tag], pa.string())}), tmp
    )
    os.replace(tmp, manifest_path)
    return True


def phrase_search_indexed(
    sf_dir: str, phrase: str = "the fast", index_dir: str | None = None
) -> pd.DataFrame:
    """Token-phrase search over the PERSISTED postings index: open only
    the query tokens' ``bucket=`` partitions (path-level pruning — the
    corpus text is never read), filter to the query tokens, and resolve
    adjacency with the house bucketed run-scan: one all-to-all of
    (doc, anchor) int pairs, df-bounded by the query tokens, then a
    per-bucket lexsort + run-length pass counts full-phrase anchors.
    Result equals ``phrase_search``'s corpus scan exactly (pinned).
    With ``index_dir=None`` a default under /tmp is built on first use
    and reused (the build-once contract)."""
    import os

    import pyarrow.compute as _pc
    import pyarrow.parquet as pq

    from ..functions.urls import hash64
    from .common import n_shuffle_buckets

    toks = [w for w in phrase.split() if w]
    assert toks, "empty phrase"
    if index_dir is None:
        # keyed by the corpus file's absolute path + size + mtime — NOT
        # just the basename: two corpora named ".../corpus", or one
        # regenerated in place, must never silently share a cached index
        import hashlib

        doc_path = os.path.join(sf_dir, "documents.parquet")
        st = os.stat(doc_path)
        fp = hashlib.sha1(
            f"{os.path.abspath(doc_path)}|{st.st_size}|{st.st_mtime_ns}".encode()
        ).hexdigest()[:16]
        index_dir = os.path.join("/tmp", "bsr_postings_index", fp)
    if not os.path.exists(os.path.join(index_dir, "meta.parquet")):
        postings_build_index(sf_dir, index_dir)
    nb = int(pq.read_table(os.path.join(index_dir, "meta.parquet"))["n_buckets"][0].as_py())
    need = sorted({int(h & np.uint64(nb - 1)) for h in hash64(toks)})
    # a query token may hash to a bucket no corpus token landed in (its
    # directory then doesn't exist) — and a token absent from the corpus
    # means zero matches anyway, so missing dirs just contribute nothing
    dirs = [os.path.join(index_dir, f"bucket={b}") for b in need]
    paths = [
        os.path.join(d, f)
        for d in dirs
        if os.path.isdir(d)
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    if not paths:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype=np.int64), "n_hits": pd.Series([], dtype=np.int64)}
        )
    idx = rd.read_parquet(paths, columns=["token", "doc_id", "pos"])

    B = n_shuffle_buckets()
    tok_to_i = {w: i for i, w in enumerate(toks)}  # last wins; handled below
    k = len(toks)

    def anchors(t: pa.Table) -> pa.Table:
        m = _pc.is_in(t["token"], value_set=pa.array(list(tok_to_i), pa.string()))
        t = t.filter(m)
        tok = t["token"].to_numpy(zero_copy_only=False)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        # a token appearing at several phrase offsets emits one row per
        # offset (e.g. "the ... the"): loop over offsets, not rows
        ds_, as_ = [], []
        for i, w in enumerate(toks):
            mm = tok == w
            ds_.append(doc[mm])
            as_.append(pos[mm] - i)
        d = np.concatenate(ds_)
        a = np.concatenate(as_)
        return pa.table(
            {
                "bucket": pa.array(d & (B - 1), pa.int64()),
                "doc_id": pa.array(d, pa.int64()),
                "anchor": pa.array(a, pa.int64()),
            }
        )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        docs, n = _anchor_counts(
            g["doc_id"].to_numpy(dtype=np.int64),
            g["anchor"].to_numpy(dtype=np.int64),
            k,
        )
        return pd.DataFrame({"doc_id": docs, "n_hits": n})

    out = (
        idx.map_batches(anchors, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(resolve, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:  # zero hits: Ray's to_pandas drops the column names
        out = pd.DataFrame(
            {"doc_id": pd.Series([], dtype=np.int64), "n_hits": pd.Series([], dtype=np.int64)}
        )
    return out.sort_values("doc_id").reset_index(drop=True)


def bigram_logprob(
    sf_dir: str,
    n_buckets: int | None = None,
    max_vocab_rows: int = 50_000_000,
) -> pd.DataFrame:
    """Per-document mean BIGRAM log-probability under the corpus's own
    MLE bigram LM — the next rung of the CCNet-style perplexity ladder
    above ``unigram_logprob`` (fluent word ORDER scores high; shuffled
    or templated word salad scores low even when its unigrams are
    common). ``p(y|x) = c2(x,y) / cx(x)`` with ``cx(x) = Σ_y c2(x,y)``
    (the within-document continuation count), trained on the scored
    corpus itself, so every scored bigram exists in training — no
    smoothing, no OOV.

    Scale shape — this is the family's distributed LOOKUP-JOIN scorer
    (every other scorer broadcasts its model; a web corpus's distinct-
    bigram table is position-bounded, NOT vocab-bounded, so it must
    stay a Dataset):

      pass 1: in-batch (bigram-hash, count) partials -> groupby = the
        c2 count table, kept distributed; the cx table IS vocab-bounded
        (one row per context token) -> ``bounded_driver_frame`` ->
        broadcast, its -ln attached in-batch at emission time
      pass 2: per-batch position rows pre-collapsed per (doc, bigram)
        with multiplicity m, carrying base = -m·ln(cx) — co-located
        with c2 rows by ``bgh % B``, contribution = base + m·ln(c2)
        partial-summed per doc inside the bucket
      pass 3: per-doc final sum, bucketed by ``doc % B`` with a
        lexsorted reduceat (deterministic summation order)

    Every shuffled row is fixed-width (int64 hash/ids, float partials)
    — bigram TEXT never moves. Scores round to 4 (the
    ``unigram_logprob`` float-tolerance precedent: summation order
    differs from SQL's, agreement is ~1e-12)."""
    import ray

    from ..functions.urls import hash64
    from .common import bounded_driver_frame, n_shuffle_buckets

    B = n_buckets or n_shuffle_buckets()
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def _bigram_rows(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(doc, x_tok, bigram_hash) arrays for every bigram position."""
        pairs = _token_pairs(t)
        doc = pairs["doc_id"].to_numpy(zero_copy_only=False)
        tok = pairs["tok"].to_numpy(zero_copy_only=False)
        if len(doc) < 2:
            return doc[:0], tok[:0], np.empty(0, dtype=np.uint64)
        valid = doc[:-1] == doc[1:]
        x = tok[:-1][valid]
        y = tok[1:][valid]
        bg = np.char.add(np.char.add(x.astype(str), " "), y.astype(str))
        return doc[:-1][valid], x, hash64(bg)

    _empty_cnt = pa.table(
        {"bgh": pa.array([], pa.int64()), "p_n": pa.array([], pa.int64()),
         "x": pa.array([], pa.string())}
    )

    def count_partial(t: pa.Table) -> pa.Table:
        _, x, bgh = _bigram_rows(t)
        if len(bgh) == 0:
            return _empty_cnt
        h = bgh.view(np.int64)
        order = np.argsort(h, kind="stable")
        h_s, x_s = h[order], x[order]
        first = np.concatenate(([True], h_s[1:] != h_s[:-1]))
        starts = np.flatnonzero(first)
        n = np.diff(np.append(starts, len(h_s))).astype(np.int64)
        return pa.table(
            {
                "bgh": pa.array(h_s[starts], pa.int64()),
                "p_n": pa.array(n, pa.int64()),
                # the context token rides along so the cx table can be
                # built from the SAME partials (first occurrence per run
                # is enough: all rows of one bigram share x)
                "x": pa.array(x_s[starts], pa.string()),
            }
        )

    partials = ds.map_batches(count_partial, batch_format="pyarrow").materialize()

    # c2: distributed (bgh, c2) count table — position-bounded, stays out
    from ray.data.aggregate import Max

    c2 = (
        partials.groupby("bgh")
        .aggregate(Sum("p_n", alias_name="c2"), Max("x", alias_name="x"))
        .materialize()
    )
    # cx: continuation counts per context token — vocab-bounded
    cx = bounded_driver_frame(
        c2.groupby("x").aggregate(Sum("c2", alias_name="cx")),
        "bigram_logprob context-count table (vocab-bounded)",
        max_vocab_rows,
    )
    cx_tok = cx["x"].to_numpy(dtype=object).astype(str)
    order = np.argsort(cx_tok)
    cx_ref = ray.put((cx_tok[order], np.log(cx["cx"].to_numpy(dtype=np.float64)[order])))

    _empty_pos = pa.table(
        {
            "bucket": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "key": pa.array([], pa.int64()),
            "m": pa.array([], pa.int64()),
            "base": pa.array([], pa.float64()),
            "side": pa.array([], pa.int64()),
        }
    )

    def pos_rows(t: pa.Table) -> pa.Table:
        cx_tok_, cx_log_ = ray.get(cx_ref)
        doc, x, bgh = _bigram_rows(t)
        if len(bgh) == 0:
            return _empty_pos
        h = bgh.view(np.int64)
        lncx = cx_log_[np.searchsorted(cx_tok_, x.astype(str))]
        order_ = np.lexsort((h, doc))
        d_s, h_s, l_s = doc[order_], h[order_], lncx[order_]
        first = np.concatenate(([True], (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])))
        starts = np.flatnonzero(first)
        m = np.diff(np.append(starts, len(d_s))).astype(np.int64)
        base = -np.add.reduceat(l_s, starts)  # = -Σ ln(cx) over the run
        return pa.table(
            {
                "bucket": pa.array(h_s[starts] % B, pa.int64()),
                "doc_id": pa.array(d_s[starts], pa.int64()),
                "key": pa.array(h_s[starts], pa.int64()),
                "m": pa.array(m, pa.int64()),
                "base": pa.array(base, pa.float64()),
                "side": pa.array(np.ones(len(m), dtype=np.int64), pa.int64()),
            }
        )

    def c2_rows(t: pa.Table) -> pa.Table:
        h = t["bgh"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(h % B, pa.int64()),
                "doc_id": pa.array(np.zeros(len(h), dtype=np.int64), pa.int64()),
                "key": pa.array(h, pa.int64()),
                "m": pa.array(t["c2"].to_numpy(zero_copy_only=False), pa.int64()),
                "base": pa.array(np.zeros(len(h)), pa.float64()),
                "side": pa.array(np.zeros(len(h), dtype=np.int64), pa.int64()),
            }
        )

    _empty_parts = pd.DataFrame(
        {
            "db": pd.Series([], dtype="int64"),
            "doc_id": pd.Series([], dtype="int64"),
            "part": pd.Series([], dtype="float64"),
            "m": pd.Series([], dtype="int64"),
        }
    )

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["side"] == 0]
        p = g[g["side"] == 1]
        if len(p) == 0:
            return _empty_parts
        ck = np.sort(c["key"].to_numpy(dtype=np.int64))
        cv = c.sort_values("key")["m"].to_numpy(dtype=np.int64)
        idx = np.searchsorted(ck, p["key"].to_numpy(dtype=np.int64))
        lp = p["base"].to_numpy(dtype=np.float64) + p["m"].to_numpy(
            dtype=np.float64
        ) * np.log(cv[idx].astype(np.float64))
        d = p["doc_id"].to_numpy(dtype=np.int64)
        # deterministic in-bucket per-doc partial: lexsort by (doc, key)
        order_ = np.lexsort((p["key"].to_numpy(dtype=np.int64), d))
        d_s, lp_s, m_s = d[order_], lp[order_], p["m"].to_numpy(dtype=np.int64)[order_]
        first = np.concatenate(([True], d_s[1:] != d_s[:-1]))
        starts = np.flatnonzero(first)
        return pd.DataFrame(
            {
                "db": d_s[starts] % B,
                "doc_id": d_s[starts],
                "part": np.add.reduceat(lp_s, starts),
                "m": np.add.reduceat(m_s, starts),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        d = g["doc_id"].to_numpy(dtype=np.int64)
        part = g["part"].to_numpy(dtype=np.float64)
        m = g["m"].to_numpy(dtype=np.int64)
        order_ = np.lexsort((part, d))  # deterministic summation order
        d_s, p_s, m_s = d[order_], part[order_], m[order_]
        first = np.concatenate(([True], d_s[1:] != d_s[:-1]))
        starts = np.flatnonzero(first)
        tot = np.add.reduceat(p_s, starts)
        n = np.add.reduceat(m_s, starts)
        return pd.DataFrame(
            {
                "doc_id": d_s[starts],
                "n_bigrams": n,
                "avg_logprob": np.round(tot / n, 4),
            }
        )

    out = (
        ds.map_batches(pos_rows, batch_format="pyarrow")
        .union(c2.map_batches(c2_rows, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(attach, batch_format="pandas")
        .groupby("db")
        .map_groups(finish, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        out = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "n_bigrams": pd.Series([], dtype="int64"),
                "avg_logprob": pd.Series([], dtype="float64"),
            }
        )
    return out.sort_values("doc_id").reset_index(drop=True).astype(
        {"doc_id": "int64", "n_bigrams": "int64"}
    )


def _winnow_positions(h: np.ndarray, window: int) -> np.ndarray:
    """Winnowing selection: the sorted distinct positions of each
    frame's minimum hash (rightmost on ties) — shared by the
    fingerprint profile and the pair miner so selection can never
    drift between index and query sides."""
    n = len(h)
    if n <= window:
        # fewer shingles than one frame: a single frame over all
        return np.array([n - 1 - int(np.argmin(h[::-1]))])
    wv = np.lib.stride_tricks.sliding_window_view(h, window)
    # rightmost min per frame: argmin over the reversed frame
    idx = window - 1 - np.argmin(wv[:, ::-1], axis=1)
    return np.unique(np.arange(len(wv)) + idx)


def winnow_fingerprints(
    sf_dir: str, k: int = 5, window: int = 4
) -> rd.Dataset:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-token shingle, slide a
    ``window``-wide frame over the hash sequence, and in each frame
    select the minimum (rightmost on ties); each selected OCCURRENCE is
    recorded once. Guarantees: any shared run of ``window + k - 1``
    tokens between two documents yields at least one shared fingerprint,
    with density ~ 2/(window+1) of all shingles — the local-fingerprint
    upgrade over the whole-doc ``fingerprints`` op, and the standard
    index for substring-level plagiarism/duplication detection.

    Fully batch-local (docs are batch-whole): hashing is the house
    ``hash64``, the sliding min is ONE ``sliding_window_view`` argmin
    over the reversed frame (vectorized rightmost-tie), no shuffle.
    Output per doc: shingle count, selected-fingerprint count, and an
    order-invariant XOR digest of the selected hashes — compact enough
    to ride any later dedup shuffle while still pinning the exact
    selection (pytest compares against a pure-python reference)."""
    from ..functions.urls import hash64

    assert k >= 1 and window >= 1
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    _empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_shingles": pa.array([], pa.int64()),
            "n_fp": pa.array([], pa.int64()),
            "fp_digest": pa.array([], pa.int64()),
        }
    )

    def winnow(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_ns, out_nf, out_dg = [], [], [], []
        for i, x in enumerate(texts):
            s = tx.shingles(x, k=k)
            if not s:
                continue
            h = hash64(s)
            n = len(h)
            sel = h[_winnow_positions(h, window)]
            dg = np.bitwise_xor.reduce(sel.astype(np.uint64))
            out_id.append(int(ids[i]))
            out_ns.append(n)
            out_nf.append(len(sel))
            out_dg.append(int(np.uint64(dg).view(np.int64)))
        if not out_id:
            return _empty
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_shingles": pa.array(out_ns, pa.int64()),
                "n_fp": pa.array(out_nf, pa.int64()),
                "fp_digest": pa.array(out_dg, pa.int64()),
            }
        )

    return ds.map_batches(winnow, batch_format="pyarrow")


def fluency_buckets_ds(
    ds: rd.Dataset,
    k: int = 3,
    scale: int = 10**9,
    bin_shift: int = 48,
    max_vocab_rows: int = 50_000_000,
    max_boundary_rows: int = 20_000_000,
    carry_text: bool = False,
) -> rd.Dataset:
    """CCNet-style head/middle/tail corpus split (Wenzek et al. 2020):
    every document gets a per-language NTILE(``k``) bucket by how
    fluent it looks under the corpus's own unigram LM — bucket 1 is
    the most-fluent third that CCNet keeps, bucket ``k`` the tail it
    drops. Unlike ``unigram_logprob`` (floats, compared at a rounding
    tolerance), the score here is INTEGER-EXACT so the bucket
    assignment has no float-tie ambiguity anywhere:

        s       = sum over token positions of the corpus count c(tok)
        n       = token positions in the doc
        score_q = floor(s * scale / n)   computed as
                  (s // n) * scale + ((s % n) * scale) // n

    and the bucket is ``NTILE(k) OVER (PARTITION BY lang ORDER BY
    score_q DESC, doc_id)`` — fluent, common-token documents rank
    first. Both sides (numpy int64 / DuckDB HUGEINT) evaluate the same
    integer formula, so the hash compare is exact, not tolerance-based.
    Validity bound (asserted): mean per-position token count below
    ``2^63/scale`` (~9.2e9 at the default) — above that (a >10^13-token
    corpus), drop ``scale`` or widen to a two-limb compare like
    ``hash_split``'s HUGEINT oracle.

    Scale shape — three passes, none of which lands a corpus-sized or
    domain-bounded-assumption frame on the driver (the new piece vs
    ``value_deciles``, whose distribution collect assumes a 2-decimal
    value domain):

      pass 1 (LM): vocab-bounded unigram count table, the
        ``unigram_logprob`` broadcast pattern.
      pass 2 (score): shuffle-free ``map_batches`` — searchsorted
        count lookup, ``np.add.reduceat`` per-doc integer sums over
        the contiguous doc runs, one (doc_id, lang, score_q) row per
        doc.
      pass 3 (exact distributed NTILE by histogram refinement): a
        coarse order-preserving histogram (arithmetic-shift bins of
        the DESC sort key, one (lang, bin, n) partial groupby — at
        most ``langs x 2^(64-bin_shift)`` rows) locates the bin
        holding each per-lang cut rank; ONLY those boundary bins'
        rows are collected (expected ~n/2^16 each, cap-guarded) to
        resolve the exact (score_q, doc_id) threshold tuples; a final
        shuffle-free tag pass compares each row against its lang's
        <=k-1 broadcast thresholds. A pathological tie cluster (one
        score_q holding >max_boundary_rows rows AT a cut) trips the
        guard rather than the driver; one more refinement level over
        doc_id would bound it, mirroring the interval join's
        documented hot-key note.

    Docs with zero tokens have no defined score and are excluded on
    both sides (the SQL's count join drops them identically).

    Dataset-in (columns doc_id, lang, text) so it chains —
    ``ccnet_corpus`` scores cleaned text; ``carry_text=True`` rides the
    scored doc's text through to the output (for corpus-emitting
    compositions). The thin :func:`fluency_buckets` wrapper keeps the
    sf_dir contract."""
    import ray

    from .common import bounded_driver_frame

    assert k >= 1

    def partial(t: pa.Table) -> pa.Table:
        g = _token_pairs(t).group_by("tok").aggregate([([], "count_all")])
        return rename(g, {"tok": "token", "count_all": "p_n"})

    cnt = bounded_driver_frame(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("p_n", alias_name="n")),
        "fluency_buckets LM count table (vocab-bounded)",
        max_vocab_rows,
    )
    vocab = cnt["token"].to_numpy(dtype=object).astype(str)
    order = np.argsort(vocab)
    counts = cnt["n"].to_numpy(dtype=np.int64)[order]
    vref = ray.put((vocab[order], counts))

    _scored_cols = {
        "doc_id": pa.array([], pa.int64()),
        "lang": pa.array([], pa.string()),
        "score_q": pa.array([], pa.int64()),
    }
    if carry_text:
        _scored_cols["text"] = pa.array([], pa.string())
    _scored_empty = pa.table(_scored_cols)

    def score(t: pa.Table) -> pa.Table:
        vocab_, cnt_ = ray.get(vref)
        pairs = _token_pairs(t)
        if pairs.num_rows == 0:
            return _scored_empty
        doc = pairs["doc_id"].to_numpy(zero_copy_only=False)
        tok = np.asarray(pairs["tok"].to_pylist(), dtype=str)
        c = cnt_[np.searchsorted(vocab_, tok)]
        starts = np.flatnonzero(np.concatenate(([True], doc[1:] != doc[:-1])))
        n = np.diff(np.append(starts, len(doc))).astype(np.int64)
        s = np.add.reduceat(c, starts)
        q, r = s // n, s % n
        assert q.size == 0 or int(q.max()) < (1 << 63) // scale, (
            "fluency_buckets: mean token count exceeds the int64 x scale "
            "bound; lower `scale` (see docstring)"
        )
        score_q = q * scale + (r * scale) // n
        # docs are whole within a batch; map the per-run doc ids back to
        # the batch rows to fetch lang (some batch rows may be token-free)
        lang = t["lang"].combine_chunks().to_numpy(zero_copy_only=False)
        bid = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        row = np.searchsorted(bid, doc[starts]) if np.all(np.diff(bid) > 0) else None
        if row is None:
            idx = {int(d): i for i, d in enumerate(bid)}
            row = np.fromiter((idx[int(d)] for d in doc[starts]), dtype=np.int64)
        cols = {
            "doc_id": pa.array(doc[starts], pa.int64()),
            "lang": pa.array(lang[row], pa.string()),
            "score_q": pa.array(score_q, pa.int64()),
        }
        if carry_text:
            cols["text"] = t["text"].combine_chunks().take(pa.array(row, pa.int64()))
        return pa.table(cols)

    scored = ds.map_batches(score, batch_format="pyarrow").materialize()

    # ---- pass 3a: coarse order-preserving histogram of the DESC key ----
    def hist_partial(t: pa.Table) -> pa.Table:
        neg = -t["score_q"].combine_chunks().to_numpy(zero_copy_only=False)
        b = neg >> bin_shift  # arithmetic shift: monotonic for int64
        g = (
            pa.table({"lang": t["lang"], "bin": pa.array(b, pa.int64())})
            .group_by(["lang", "bin"])
            .aggregate([([], "count_all")])
        )
        return rename(g, {"count_all": "p_n"})

    hist = bounded_driver_frame(
        scored.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["lang", "bin"])
        .aggregate(Sum("p_n", alias_name="n")),
        "fluency_buckets coarse histogram (langs x bins)",
        max_rows=50_000_000,
    )

    # ---- locate, per lang, the bin holding each NTILE cut rank ----
    boundary: dict[str, list[tuple[int, int]]] = {}  # lang -> [(cut_rank, bin)]
    for lg, grp in hist.groupby("lang"):
        grp = grp.sort_values("bin")
        bins = grp["bin"].to_numpy(dtype=np.int64)
        cum = np.cumsum(grp["n"].to_numpy(dtype=np.int64))
        total = int(cum[-1])
        q0, rem = total // k, total % k
        cuts = np.cumsum([q0 + (1 if i < rem else 0) for i in range(k - 1)])
        cuts = [int(c) for c in cuts if 0 < c < total]
        # threshold row = rank cut-1 (0-indexed, ASC by (neg, doc_id))
        boundary[lg] = [
            (c, int(bins[int(np.searchsorted(cum, c - 1, side="right"))])) for c in cuts
        ]

    need = {(lg, b) for lg, cs in boundary.items() for _, b in cs}

    def in_boundary(t: pa.Table) -> pa.Table:
        neg = -t["score_q"].combine_chunks().to_numpy(zero_copy_only=False)
        b = neg >> bin_shift
        lang = t["lang"].to_numpy(zero_copy_only=False)
        keep = np.fromiter(
            ((lg, int(bb)) in need for lg, bb in zip(lang, b)), dtype=bool, count=len(b)
        )
        # threshold resolution needs only the sort key — never let a
        # carried text column ride the driver collect
        return t.select(["doc_id", "lang", "score_q"]).filter(pa.array(keep))

    bnd = bounded_driver_frame(
        scored.map_batches(in_boundary, batch_format="pyarrow"),
        "fluency_buckets boundary-bin rows (~n/2^16 per cut)",
        max_boundary_rows,
    )

    # ---- resolve exact (neg_score, doc_id) threshold tuples ----
    thresholds: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for lg, cs in boundary.items():
        sub = bnd[bnd["lang"] == lg]
        neg = -sub["score_q"].to_numpy(dtype=np.int64)
        did = sub["doc_id"].to_numpy(dtype=np.int64)
        order2 = np.lexsort((did, neg))
        neg_s, did_s = neg[order2], did[order2]
        bin_of = neg_s >> bin_shift
        t_neg, t_doc = [], []
        grp = hist[hist["lang"] == lg].sort_values("bin")
        bins = grp["bin"].to_numpy(dtype=np.int64)
        cum_excl = np.concatenate(([0], np.cumsum(grp["n"].to_numpy(dtype=np.int64))[:-1]))
        for cut, b in cs:
            below = int(cum_excl[int(np.searchsorted(bins, b))])
            local = np.flatnonzero(bin_of == b)[cut - 1 - below]
            t_neg.append(int(neg_s[local]))
            t_doc.append(int(did_s[local]))
        thresholds[lg] = (np.asarray(t_neg, np.int64), np.asarray(t_doc, np.int64))

    tref = ray.put(thresholds)

    def tag(t: pa.Table) -> pa.Table:
        thr = ray.get(tref)
        neg = -t["score_q"].combine_chunks().to_numpy(zero_copy_only=False)
        did = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        lang = t["lang"].to_numpy(zero_copy_only=False)
        bucket = np.ones(len(neg), dtype=np.int64)
        for lg, (t_neg, t_doc) in thr.items():
            m = lang == lg
            if not m.any() or len(t_neg) == 0:
                continue
            nn, dd = neg[m], did[m]
            acc = np.zeros(m.sum(), dtype=np.int64)
            for tn, td in zip(t_neg, t_doc):
                acc += (nn > tn) | ((nn == tn) & (dd > td))
            bucket[m] += acc
        cols = {c: t[c] for c in t.column_names}
        cols["bucket"] = pa.array(bucket, pa.int64())
        return pa.table(cols)

    return scored.map_batches(tag, batch_format="pyarrow")


def fluency_buckets(
    sf_dir: str,
    k: int = 3,
    scale: int = 10**9,
    bin_shift: int = 48,
    max_vocab_rows: int = 50_000_000,
    max_boundary_rows: int = 20_000_000,
) -> rd.Dataset:
    """sf_dir entry point for :func:`fluency_buckets_ds` (docstring
    there): reads ``documents`` and buckets the raw corpus."""
    return fluency_buckets_ds(
        T(sf_dir, "documents", columns=["doc_id", "lang", "text"]),
        k=k,
        scale=scale,
        bin_shift=bin_shift,
        max_vocab_rows=max_vocab_rows,
        max_boundary_rows=max_boundary_rows,
    )


def bm25_build_sidecar(sf_dir: str, index_dir: str) -> str:
    """Build-once BM25 sidecar next to the postings index: per-doc
    token lengths (``bm25_doclen/part-*.parquet``, one int64 pair per
    doc) and corpus stats (``bm25_stats.parquet``: n_docs incl.
    token-free ones, total_tokens). After this, a BM25 query never
    touches corpus text — term stats come from the index buckets, dl
    and avgdl from here. Staged write + rename, like the index build:
    a crashed build never leaves a half-written live sidecar."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from .common import sum_col_over_blocks

    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def dl_rows(t: pa.Table) -> pa.Table:
        pairs = _token_pairs(t)
        doc = pairs["doc_id"].to_numpy(zero_copy_only=False)
        if len(doc):
            starts = np.flatnonzero(np.concatenate(([True], doc[1:] != doc[:-1])))
            docs, dl = doc[starts], np.diff(np.append(starts, len(doc))).astype(np.int64)
        else:
            docs = dl = np.array([], dtype=np.int64)
        # the batch's TOTAL doc count (incl. token-free docs, which have
        # no dl row but count toward N exactly as in bm25_topk) rides a
        # sentinel row filtered out before the doclen write
        return pa.table(
            {
                "doc_id": pa.array(np.append(docs, -1), pa.int64()),
                "dl": pa.array(np.append(dl, 0), pa.int64()),
                "p_docs": pa.array(
                    np.append(np.zeros(len(docs), np.int64), t.num_rows), pa.int64()
                ),
            }
        )

    staging = os.path.join(index_dir, "bm25_doclen.build-tmp")
    live = os.path.join(index_dir, "bm25_doclen")
    shutil.rmtree(staging, ignore_errors=True)
    mat = ds.map_batches(dl_rows, batch_format="pyarrow").materialize()
    n_docs = int(sum_col_over_blocks(mat, "p_docs"))
    total_tokens = int(sum_col_over_blocks(mat, "dl"))
    mat.filter(expr="doc_id >= 0").select_columns(["doc_id", "dl"]).write_parquet(staging)
    shutil.rmtree(live, ignore_errors=True)
    os.rename(staging, live)
    # stats LAST, via an atomic replace: bm25_topk_indexed gates its
    # build-on-first-use on this file, so it is the commit marker — a
    # crash anywhere above leaves no stats and the next query rebuilds
    stats_tmp = os.path.join(index_dir, "bm25_stats.parquet.tmp")
    pq.write_table(
        pa.table(
            {"n_docs": pa.array([n_docs], pa.int64()),
             "total_tokens": pa.array([total_tokens], pa.int64())}
        ),
        stats_tmp,
    )
    os.replace(stats_tmp, os.path.join(index_dir, "bm25_stats.parquet"))
    return live


def bm25_topk_indexed(
    sf_dir: str,
    query: str = "hash table scan",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    index_dir: str | None = None,
    n_buckets: int | None = None,
) -> pd.DataFrame:
    """BM25 top-``k`` served from the PERSISTED postings index — the
    repeated-query twin of ``bm25_topk`` (which re-scans corpus text
    per query): opens ONLY the query tokens' ``bucket=`` partitions
    (path-level pruning, scan fraction ~|terms|/B of the index), takes
    tf/df from those postings, and dl/avgdl from the build-once
    ``bm25_build_sidecar``. Result equals ``bm25_topk`` (same float64
    expression tree; pinned in pytest and by sharing its SQL oracle).

    Scale shape: (doc, term, tf) candidates collapse per batch then in
    ONE groupby — candidate-bounded (sum of query-term dfs), never
    corpus text; df/idf from a terms-sized aggregate of that table.
    The dl attach is the house bucketed run-scan: candidates and the
    (column-pruned, int64-pair) doclen table co-locate by
    ``doc % B`` — one fixed-width all-to-all — each bucket scores its
    docs completely and emits a local top-k; the global answer is a
    sort+limit over k rows per bucket. The full doclen read is 16
    B/doc; for rare-term queries, hive-bucketing the sidecar by doc
    hash would prune that too (documented trade, not needed while the
    sidecar read is ~1% of one corpus text scan)."""
    import os

    import pyarrow.parquet as pq
    import ray

    from ..functions.urls import hash64
    from .common import n_shuffle_buckets, stripped_schema

    terms = sorted(set(query.split()))
    assert terms, "empty query"
    if index_dir is None:
        import hashlib

        doc_path = os.path.join(sf_dir, "documents.parquet")
        st = os.stat(doc_path)
        fp = hashlib.sha1(
            f"{os.path.abspath(doc_path)}|{st.st_size}|{st.st_mtime_ns}".encode()
        ).hexdigest()[:16]
        index_dir = os.path.join("/tmp", "bsr_postings_index", fp)
    if not os.path.exists(os.path.join(index_dir, "meta.parquet")):
        postings_build_index(sf_dir, index_dir)
    if not os.path.exists(os.path.join(index_dir, "bm25_stats.parquet")):
        bm25_build_sidecar(sf_dir, index_dir)

    stats = pq.read_table(os.path.join(index_dir, "bm25_stats.parquet"))
    n_docs = float(stats["n_docs"][0].as_py())
    avgdl = float(stats["total_tokens"][0].as_py()) / n_docs
    nb = int(pq.read_table(os.path.join(index_dir, "meta.parquet"))["n_buckets"][0].as_py())
    need = sorted({int(h & np.uint64(nb - 1)) for h in hash64(terms)})
    paths = [
        os.path.join(d, f)
        for d in (os.path.join(index_dir, f"bucket={bk}") for bk in need)
        if os.path.isdir(d)
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    _empty = pd.DataFrame(
        {"doc_id": pd.Series([], dtype=np.int64), "score": pd.Series([], dtype="float64")}
    )
    if not paths:
        return _empty

    B = n_buckets or n_shuffle_buckets()
    assert B & (B - 1) == 0, f"n_buckets must be a power of two, got {B}"
    term_set = pa.array(terms)

    def tf_partial(t: pa.Table) -> pa.Table:
        hit = t.filter(pc.is_in(t["token"], value_set=term_set))
        g = hit.select(["doc_id", "token"]).group_by(["doc_id", "token"]).aggregate(
            [([], "count_all")]
        )
        return rename(g, {"count_all": "p_tf"})

    tf = (
        rd.read_parquet(paths, columns=["token", "doc_id"])
        .map_batches(tf_partial, batch_format="pyarrow")
        .groupby(["doc_id", "token"])
        .aggregate(Sum("p_tf", alias_name="tf"))
        .materialize()
    )
    if tf.count() == 0:
        return _empty

    dfr = (
        tf.map_batches(
            lambda t: rename(
                t.select(["token"]).group_by("token").aggregate([([], "count_all")]),
                {"count_all": "p_df"},
            ),
            batch_format="pyarrow",
        )
        .groupby("token")
        .aggregate(Sum("p_df", alias_name="df"))
        .to_pandas()
    )
    df_map = dict(zip(dfr["token"], dfr["df"].astype(float)))
    term_arr = np.array(terms, dtype=object).astype(str)
    idf = np.log(
        (n_docs - np.array([df_map.get(t_, 0.0) for t_ in terms]) + 0.5)
        / (np.array([df_map.get(t_, 0.0) for t_ in terms]) + 0.5)
        + 1.0
    )
    ref = ray.put((term_arr, idf))

    # union candidates (ti >= 0, x = tf) with doclen rows (ti = -1, x = dl),
    # co-located by doc % B; each bucket scores its docs COMPLETELY
    def cand_rows(t: pa.Table) -> pa.Table:
        term_, _ = ray.get(ref)
        doc = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        tok = np.asarray(t["token"].to_pylist(), dtype=str)
        return pa.table(
            {
                "qb": pa.array((doc % B).astype(np.int64), pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "ti": pa.array(np.searchsorted(term_, tok), pa.int64()),
                "x": t["tf"],
            }
        )

    dl_path = os.path.join(index_dir, "bm25_doclen")
    dl_ds = rd.read_parquet(dl_path)

    def dl_rows(t: pa.Table) -> pa.Table:
        doc = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "qb": pa.array((doc % B).astype(np.int64), pa.int64()),
                "doc_id": pa.array(doc, pa.int64()),
                "ti": pa.array(np.full(len(doc), -1, dtype=np.int64), pa.int64()),
                "x": t["dl"],
            }
        )

    both = tf.map_batches(cand_rows, batch_format="pyarrow").union(
        dl_ds.map_batches(dl_rows, batch_format="pyarrow")
    )

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        _, idf_ = ray.get(ref)
        ti = g["ti"].to_numpy(dtype=np.int64)
        doc = g["doc_id"].to_numpy(dtype=np.int64)
        x = g["x"].to_numpy(dtype=np.float64)
        is_dl = ti < 0
        dl_doc = doc[is_dl]
        dlo = np.argsort(dl_doc)
        dl_doc_s, dl_s = dl_doc[dlo], x[is_dl][dlo]
        cdoc, cti, ctf = doc[~is_dl], ti[~is_dl], x[~is_dl]
        if len(cdoc) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "score": pd.Series([], dtype="float64")}
            )
        # consistency guard: a postings doc with no doclen row means the
        # sidecar predates a postings_update_index ingest — an unchecked
        # searchsorted would crash or silently use another doc's length
        pos = np.searchsorted(dl_doc_s, cdoc)
        if len(dl_doc_s) == 0 or (pos >= len(dl_doc_s)).any() or (
            dl_doc_s[np.minimum(pos, len(dl_doc_s) - 1)] != cdoc
        ).any():
            raise RuntimeError(
                "bm25_topk_indexed: postings contain docs absent from the "
                "bm25 doclen sidecar (stale after postings_update_index?); "
                "re-run bm25_build_sidecar over the full corpus"
            )
        dl = dl_s[pos]
        part = idf_[cti] * (ctf * (k1 + 1.0)) / (ctf + k1 * (1.0 - b + b * dl / avgdl))
        order = np.argsort(cdoc, kind="stable")
        cd_s, p_s = cdoc[order], part[order]
        runs = np.flatnonzero(np.concatenate(([True], cd_s[1:] != cd_s[:-1])))
        udoc = cd_s[runs]
        score = np.add.reduceat(p_s, runs)
        top = np.lexsort((udoc, -score))[: min(k, len(udoc))]
        return pd.DataFrame({"doc_id": udoc[top], "score": score[top]})

    out = (
        both.groupby("qb")
        .map_groups(score_bucket, batch_format="pandas")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    out["score"] = out["score"].round(4)
    return out.reset_index(drop=True)
