"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship pipelines (documents corpus-prep + a tiny
deterministic crawl through the full engine); ``queries()`` — one entry
per implemented operator family from SURVEY.md §2 (+ the training-data
additions); ``oracle_sql()`` — DuckDB equivalents with matching column
names for every SQL-expressible query.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in blockspider_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_CRAWL_CACHE: dict[str, Any] = {}

# Exact all-pairs 5-gram Jaccard (inverted self-join) — the oracle for
# ngram_jaccard_pairs, INCLUDING its prefix-filtering document-frequency
# cut (shingles held by more than 256 docs are dropped from the
# intersection index only; union sizes count every shingle — see
# pipelines/dedup.py ngram_jaccard_pairs). minhash_lsh_pairs, being
# probabilistic (16x4 banding), is deliberately NOT held to this exact
# oracle: pytest asserts pairs ⊆ exact-pairs + planted-pair recall.
# token-phrase search ("the fast"): positions over the filtered token
# list (explode_tokens numbering); one anchor row per adjacent match
_PHRASE_SQL = r"""
    WITH toks AS (
      SELECT doc_id, generate_subscripts(toks, 1)::BIGINT AS pos, unnest(toks) AS token
      FROM (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
            FROM documents)
    ),
    m0 AS (SELECT doc_id, pos AS anchor FROM toks WHERE token = 'the'),
    m1 AS (SELECT doc_id, pos - 1 AS anchor FROM toks WHERE token = 'fast')
    SELECT doc_id::BIGINT AS doc_id, COUNT(*)::BIGINT AS n_hits
    FROM m0 JOIN m1 USING (doc_id, anchor)
    GROUP BY doc_id
"""

_NGRAM_JACCARD_SQL = r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
      FROM documents
    ),
    pos AS (
      SELECT doc_id, w,
             unnest(generate_series(1, CASE WHEN len(w) >= 5 THEN len(w) - 4
                                            WHEN len(w) > 0 THEN 1 ELSE 0 END)) AS i
      FROM toks
    ),
    sh AS (SELECT DISTINCT doc_id, array_to_string(w[i : i + 4], ' ') AS s FROM pos),
    kept AS (
      SELECT sh.doc_id, sh.s FROM sh
      JOIN (SELECT s FROM sh GROUP BY s HAVING COUNT(*) BETWEEN 2 AND 256) df USING (s)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a::BIGINT AS doc_a, doc_b::BIGINT AS doc_b,
           ROUND(c / (sa.n + sb.n - c), 4) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
    WHERE ROUND(c / (sa.n + sb.n - c), 4) >= 0.5
"""

# edit_distance_pairs: Levenshtein verification of the ngram miner's
# candidates at jaccard_floor 0.3 (same CTE chain as
# _NGRAM_JACCARD_SQL). dist and both lengths are exact ints; sim is one
# float expression of them — order-independent parity.
_EDIT_DIST_SQL = r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
      FROM documents
    ),
    pos AS (
      SELECT doc_id, w,
             unnest(generate_series(1, CASE WHEN len(w) >= 5 THEN len(w) - 4
                                            WHEN len(w) > 0 THEN 1 ELSE 0 END)) AS i
      FROM toks
    ),
    sh AS (SELECT DISTINCT doc_id, array_to_string(w[i : i + 4], ' ') AS s FROM pos),
    kept AS (
      SELECT sh.doc_id, sh.s FROM sh
      JOIN (SELECT s FROM sh GROUP BY s HAVING COUNT(*) BETWEEN 2 AND 256) df USING (s)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    cand AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
      WHERE ROUND(c / (sa.n + sb.n - c), 4) >= 0.3
    )
    SELECT doc_a::BIGINT AS doc_a, doc_b::BIGINT AS doc_b,
           levenshtein(da.text, db.text)::BIGINT AS dist,
           ROUND(1.0 - levenshtein(da.text, db.text) /
                 GREATEST(length(da.text), length(db.text)), 4) AS sim
    FROM cand JOIN documents da ON da.doc_id = doc_a
              JOIN documents db ON db.doc_id = doc_b
"""

# bigram_logprob: MLE bigram LM trained on the scored corpus (no OOV,
# no smoothing). lp = ln(c2) - ln(cx) mirrors the pipeline's split
# attach; ROUND 4 is the unigram_logprob float-tolerance precedent
# (summation order differs between engines, agreement ~1e-12).
_BIGRAM_LP_SQL = r"""
    WITH toks AS (
      SELECT doc_id, generate_subscripts(w, 1) AS pos, unnest(w) AS tok
      FROM (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
            FROM documents)
    ),
    bg AS (
      SELECT a.doc_id, a.tok AS x, b.tok AS y
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ),
    c2 AS (SELECT x, y, COUNT(*)::BIGINT AS c2 FROM bg GROUP BY x, y),
    cx AS (SELECT x, SUM(c2)::BIGINT AS cx FROM c2 GROUP BY x),
    scored AS (
      SELECT bg.doc_id, ln(c2.c2::DOUBLE) - ln(cx.cx::DOUBLE) AS lp
      FROM bg JOIN c2 USING (x, y) JOIN cx USING (x)
    )
    SELECT doc_id::BIGINT AS doc_id, COUNT(*)::BIGINT AS n_bigrams,
           ROUND(SUM(lp) / COUNT(*), 4) AS avg_logprob
    FROM scored GROUP BY doc_id ORDER BY doc_id
"""

# weighted_sample_aes: Efraimidis-Spirakis weighted bottom-k. The ring
# is the house HUGEINT-safe form; u = (h32+1)/2^32 is exact, ln is the
# same libm call both sides (bigram_pmi precedent), the divide by an
# exact int weight is one IEEE op — so selection AND score match
# bit-for-bit.
_AES_SAMPLE_SQL = r"""
    WITH s AS (
      SELECT doc_id, GREATEST(n_chars, 1)::BIGINT AS w,
             (((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
               % 4294967296)::DOUBLE + 1.0) / 4294967296.0 AS u
      FROM documents
    ),
    top AS (
      SELECT doc_id, w, -ln(u) / w AS score
      FROM s ORDER BY -ln(u) / w, doc_id LIMIT 100
    )
    SELECT doc_id::BIGINT AS doc_id, w, ROUND(score, 6) AS score
    FROM top ORDER BY doc_id
"""

# tf_cosine_pairs: exact all-pairs lexical cosine over sparse tf
# vectors. Every quantity entering the score (dot, n2_a, n2_b) is an
# int64 sum, so cosine is ONE float expression of three exact integers
# on BOTH sides — bit-identical regardless of summation order. The
# df-band [2, 256] cut and the full-vector norms mirror
# pipelines/dedup.tf_cosine_pairs exactly; threshold 0.05 (see the
# pipeline docstring: the synthetic corpus has no planted lexical
# near-dups, the planted-dup pytest pins the 0.6+ regime).
_TF_COSINE_SQL = r"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
      FROM documents
    ),
    tf AS (SELECT doc_id, token, COUNT(*)::BIGINT AS tf FROM toks GROUP BY doc_id, token),
    n2 AS (SELECT doc_id, SUM(tf * tf)::BIGINT AS n2 FROM tf GROUP BY doc_id),
    kept AS (SELECT token FROM tf GROUP BY token HAVING COUNT(*) BETWEEN 2 AND 256),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.tf * b.tf)::BIGINT AS dot
      FROM tf a JOIN tf b USING (token) JOIN kept USING (token)
      WHERE a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a::BIGINT AS doc_a, doc_b::BIGINT AS doc_b,
           ROUND(dot / sqrt((na.n2 * nb.n2)::DOUBLE), 4) AS cosine
    FROM pairs JOIN n2 na ON na.doc_id = doc_a JOIN n2 nb ON nb.doc_id = doc_b
    WHERE dot / sqrt((na.n2 * nb.n2)::DOUBLE) >= 0.05
"""

# same tokenization/shingling CTEs as the n-gram oracle; eval set =
# the deterministic doc_id % 50 == 0 slice (pipelines/dedup.decontaminate)
_DECONTAM_SQL = r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
      FROM documents
    ),
    pos AS (
      SELECT doc_id, w,
             unnest(generate_series(1, CASE WHEN len(w) >= 5 THEN len(w) - 4
                                            WHEN len(w) > 0 THEN 1 ELSE 0 END)) AS i
      FROM toks
    ),
    sh AS (SELECT DISTINCT doc_id, array_to_string(w[i : i + 4], ' ') AS s FROM pos),
    ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0)
    SELECT doc_id::BIGINT AS doc_id, COUNT(*)::BIGINT AS n_overlap
    FROM sh JOIN ev USING (s)
    WHERE doc_id % 50 <> 0
    GROUP BY doc_id
"""

# DuckDB's native ASOF JOIN is the oracle for the bucketed merge_asof
# composition (pipelines/relational.asof_join_events)
_ASOF_SQL = r"""
    WITH p AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'purchase'
    ),
    s AS (
      SELECT user_id, epoch_us(ts) AS signup_ts_us, MAX(value) AS signup_value
      FROM events WHERE event_type = 'signup' GROUP BY 1, 2
    )
    SELECT p.event_id::BIGINT AS event_id, p.user_id::BIGINT AS user_id,
           p.ts_us::BIGINT AS ts_us, s.signup_ts_us::BIGINT AS signup_ts_us,
           s.signup_value AS signup_value
    FROM p ASOF JOIN s ON p.user_id = s.user_id AND p.ts_us >= s.signup_ts_us
"""


def _robots_audit_tiny():
    """Robots-conformance audit of the memoized tiny crawl (shared by
    the crawl_* queries) against the same fixture's robots pages."""
    from blockspider_ray import gen
    from blockspider_ray.pipelines import windows

    pages_dir, _ = gen.ensure_fixture("tiny")
    return windows.robots_audit(pages_dir, _crawl_tiny()[0])


def _crawl_tiny():
    """One deterministic tiny crawl through the distributed engine,
    memoized per process (shared by the crawl_* queries)."""
    if "tiny" not in _CRAWL_CACHE:
        import shutil

        from blockspider_ray import gen
        from blockspider_ray.config import CrawlConfig
        from blockspider_ray.engine import CrawlEngine

        pages_dir, seeds = gen.ensure_fixture("tiny")
        out = "/tmp/bsr_entry_crawl"
        shutil.rmtree(out, ignore_errors=True)
        cfg = CrawlConfig(tokens_per_host_per_round=2, max_urls_per_round=500, shards=4, max_rounds=6)
        eng = CrawlEngine(pages_dir, seeds, cfg, out)
        eng.run()
        log, seen = eng.crawl_log(), eng.seen_table()
        eng.shutdown()
        _CRAWL_CACHE["tiny"] = (log, seen)
    return _CRAWL_CACHE["tiny"]


def entry() -> Any:
    """Flagship: fused quality + language-id over sf0.001 documents
    (one map_batches — both feature families share the scan, no join),
    after smoke-running the tiny crawl through the full distributed
    engine."""
    from blockspider_ray.pipelines import textstats

    log, _ = _crawl_tiny()
    assert log.num_rows > 0, "tiny crawl produced no rows"

    return textstats.quality_langid("/root/testdata/sf0.001")


def _corpus_shards_fresh(sf_dir: str):
    """write_corpus_shards into a clean /tmp export dir (full
    write-every-call so repeat runs are deterministic; the resume path
    is pinned separately in pytest)."""
    import os
    import shutil

    from blockspider_ray.pipelines import corpus

    d = os.path.join(
        "/tmp", "bsr_corpus_shards", os.path.basename(os.path.normpath(sf_dir))
    )
    shutil.rmtree(d, ignore_errors=True)
    return corpus.write_corpus_shards(sf_dir, d)


def queries() -> dict[str, Callable[[str], Any]]:
    from blockspider_ray.pipelines import clusters, corpus, dedup, graph, multimodal, relational, similarity, sketches, textstats, windows

    q: dict[str, Callable[[str], Any]] = {
        # relational core (SURVEY.md §2.2, §2.5, §2.6)
        "q1_pricing_summary": relational.q1_pricing_summary,
        "filter_project": relational.filter_project,
        "join_customer_orders": relational.join_customer_orders,
        "join_orders_lineitem": relational.join_orders_lineitem,
        "join_orders_lineitem_native": relational.join_orders_lineitem_native,
        # Bloom-pushdown join: fixed-size bitmap of the filtered build
        # side prunes the probe side before the all-to-all
        "join_orders_lineitem_bloom": relational.join_orders_lineitem_bloom,
        "topk_orders": relational.topk_orders,
        "top_orders_per_segment": relational.top_orders_per_segment,
        "distinct_segments": relational.distinct_segments,
        "anti_join_customers": relational.anti_join_customers,
        "semi_join_parts": relational.semi_join_parts,
        "global_max": relational.global_max,
        "explode_tokens": relational.explode_tokens,
        # TPC-H Q3 shape: 3-table join composition (broadcast semi +
        # bucketed large-large) with per-bucket-final top-k combiners
        "q3_shipping_priority": relational.q3_shipping_priority,
        # LEFT OUTER broadcast join (null-preserving enrichment)
        "left_join_customer_names": relational.left_join_customer_names,
        # grouped Pearson correlation from one-pass sufficient stats
        "corr_quantity_price": relational.corr_quantity_price,
        # skew-resistant join: distributed hot-key census + salted
        # sub-buckets with small-side replication
        "salted_join_events": relational.salted_join_events,
        # stream-shaped (§2.7)
        "tumbling_hour": windows.tumbling_hour,
        "hopping_window": windows.hopping_window,
        "sessionize": windows.sessionize,
        "user_event_gaps": windows.user_event_gaps,
        # per-key running total (SUM OVER PARTITION BY ... ORDER BY ...)
        "cumulative_spend": windows.cumulative_spend,
        # ROWS-frame trailing window (SUM OVER ... ROWS 2 PRECEDING)
        "rolling_spend_cents": windows.rolling_spend_cents,
        # per-user LEAD event-type bigram (Markov transition counts)
        "event_transitions": windows.event_transitions,
        # weekly revenue with LAG(prev week) alongside (WoW growth)
        "weekly_revenue_wow": windows.weekly_revenue_wow,
        # exact PERCENT_RANK per type — broadcast-CDF, zero shuffles
        "value_percent_rank": windows.value_percent_rank,
        # exact per-group quantile clipping -> robust mean
        "winsorized_value_stats": windows.winsorized_value_stats,
        # integer-exact half-life-decayed value sum (recency weighting)
        "time_decayed_spend": windows.time_decayed_spend,
        # funnel step-pair conversion (view -> purchase within window)
        "funnel_conversions": windows.funnel_conversions,
        # hour-of-day x event-type pivot matrix (in-batch indicator pivot)
        "event_type_matrix": windows.event_type_matrix,
        # distributed NTILE(10): exact global deciles, range-partitioned
        "value_deciles": windows.value_deciles,
        # weekly retention triangle (cohort x offset distinct users)
        "retention_cohorts": windows.retention_cohorts,
        "enrich_props": windows.enrich_props,
        # distinct-cardinality family: exact pair-shuffle companion
        # (SQL-oracled) + HyperLogLog sketch (approximate by
        # construction — rows-only; pytest pins relative error)
        "distinct_users_per_type": sketches.distinct_users_per_type,
        "distinct_users_per_window": sketches.distinct_users_per_window,
        "hll_users_per_type": sketches.hll_users_per_type,
        "scrub_props": windows.scrub_props,
        "events_stats": windows.events_stats,
        # text analysis
        "token_counts": textstats.token_counts,
        "doc_stats_by_lang": textstats.doc_stats_by_lang,
        "langid": textstats.langid,
        "quality": textstats.quality,
        "fingerprints": textstats.fingerprints,
        "repetition_stats": textstats.repetition_stats,
        # zlib entropy quality gate (not SQL-expressible — rows-only;
        # pytest pins planted repetitive/random/fluent docs)
        "compression_ratio": textstats.compression_ratio,
        "vocab_topk": textstats.vocab_topk,
        "token_doc_freq": textstats.token_doc_freq,
        "tfidf_topk": textstats.tfidf_topk,
        "doc_len_quantiles": textstats.doc_len_quantiles,
        "doc_len_histogram": textstats.doc_len_histogram,
        "unigram_logprob": textstats.unigram_logprob,
        # bigram-LM perplexity rung (distributed c2 lookup join — the
        # count table is position-bounded, never broadcast)
        "bigram_logprob": textstats.bigram_logprob,
        # CCNet head/middle/tail split: per-lang NTILE(3) by an
        # INTEGER-EXACT corpus-LM fluency score; the cut ranks resolve
        # through a coarse-histogram refinement (no domain-bounded
        # distribution collect, no float ties anywhere)
        "fluency_buckets": textstats.fluency_buckets,
        # MOSS winnowing local fingerprints (pytest-pinned vs a pure-python
        # reference per doc; no SQL oracle — the selection depends on hash64)
        "winnow_fingerprints": textstats.winnow_fingerprints,
        # the MOSS detection half: substring-overlap pairs over winnowed
        # fps (pytest-pinned: guarantee recall + true-overlap soundness)
        "winnow_dedup_pairs": dedup.winnow_dedup_pairs,
        "ngram_counts": textstats.ngram_counts,
        "token_postings": textstats.token_postings,
        # token-phrase search: direct scan (zero-shuffle, in-batch
        # anchor intersection) and the persisted-postings-index path
        # (opens only the query tokens' bucket= partitions)
        "phrase_search": textstats.phrase_search,
        "phrase_search_indexed": textstats.phrase_search_indexed,
        "bigram_pmi": textstats.bigram_pmi,
        # skip-gram co-occurrence heavy hitters (word2vec count table)
        "cooccurrence_topk": textstats.cooccurrence_topk,
        "bm25_topk": textstats.bm25_topk,
        # BM25 served from the persisted postings index + build-once
        # doclen sidecar: only the query terms' bucket= partitions are
        # opened (path-pruned); equals bm25_topk, shares its oracle
        "bm25_topk_indexed": textstats.bm25_topk_indexed,
        "zscore_by_lang": textstats.zscore_by_lang,
        # dedup family
        "exact_dedup": dedup.exact_dedup,
        "first_per_key": dedup.first_per_key,
        "minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "simhash_near_dups": dedup.simhash_near_dups,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        # exact sparse-tf lexical cosine all-pairs (integer dot/norm partials)
        "tf_cosine_pairs": dedup.tf_cosine_pairs,
        # Levenshtein verification of mined candidates (char-exact arbiter)
        "edit_distance_pairs": dedup.edit_distance_pairs,
        # substring-level duplication profile (positional k-gram
        # multiplicity — the Lee et al. 2022 span-dedup measurement)
        "repeated_spans": dedup.repeated_spans,
        # boilerplate line removal (cross-doc repeated lines); the sf
        # corpora are single-line docs with no cross-doc repeats, so the
        # sf oracle is a semantics-preserving identity — the removal
        # path is pinned by a planted multi-line fixture in pytest
        "line_dedup": dedup.line_dedup,
        # first-occurrence paragraph dedup (the exact-substring half of
        # the CCNet recipe; line_dedup is the boilerplate half) — later
        # occurrences of a repeated paragraph are deleted corpus-wide
        "paragraph_dedup": dedup.paragraph_dedup,
        # the CCNet recipe end-to-end: boilerplate removal ->
        # first-occurrence paragraph dedup -> integer-exact per-lang
        # fluency terciles, tail dropped; one chained Dataset pipeline
        "ccnet_corpus": corpus.ccnet_corpus,
        # incremental exact dedup against the persisted fp index (the
        # daily-crawl path; default index built on first use under /tmp,
        # update_index stays False here so repeat calls are deterministic)
        "exact_dedup_incremental": dedup.exact_dedup_incremental,
        # incremental NEAR-dup against the persisted MinHash band/sig
        # index (no SQL oracle: signature-estimated Jaccard; pytest
        # pins planted dups found, rejections at margin, and the
        # post-update re-probe contract)
        "neardup_incremental": dedup.neardup_incremental,
        # near-dup cluster resolution: distributed connected components
        # (hash-to-min) over the exact ngram pair list
        "near_dup_clusters": clusters.near_dup_clusters,
        # same op forced through the distributed FastSV loop (Dataset
        # input — the spilled-pairs scale path); same SQL oracle
        "near_dup_clusters_dist": clusters.near_dup_clusters_dist,
        # the composition: fuzzy-dedup-filtered corpus (clusters -> keep
        # canonicals + unpaired docs; loser set broadcast, anti-join per batch)
        "fuzzy_dedup_corpus": corpus.fuzzy_dedup_corpus,
        "decontaminate": dedup.decontaminate,
        # temporal join (custom operator: bucketed merge_asof)
        "asof_join_events": relational.asof_join_events,
        # interval (band) join — one-to-many temporal sibling of asof
        "interval_join_events": relational.interval_join_events,
        # hierarchical aggregate (GROUP BY ROLLUP) + full CUBE sibling
        "rollup_revenue": relational.rollup_revenue,
        "cube_revenue": relational.cube_revenue,
        # grouped top-k (ROW_NUMBER PARTITION BY analog / per-domain cap)
        "topk_events_per_user": relational.topk_events_per_user,
        # DDSketch-style log-binned quantiles (approximate by
        # construction — rows-only; pytest pins relative error vs
        # DuckDB quantile_disc and vs numpy on planted lognormals)
        "value_quantiles_sketch": sketches.value_quantiles_sketch,
        # EXACT discrete quantiles at arbitrary q via the
        # histogram-refinement order-statistic primitive (no domain
        # bound, no approximation; rank = ceil(q*n)-1 like DuckDB)
        "value_quantiles_exact": windows.value_quantiles_exact,
        # Misra-Gries heavy hitters (deterministic undercount interval;
        # rows-only — pytest pins the interval vs exact vocab_topk and
        # planted Zipf batches force real trimming)
        "vocab_topk_sketch": sketches.vocab_topk_sketch,
        # Count-Min point-frequency sketch (mergeable SUM partials;
        # approximate by construction -> rows-only driver check)
        "countmin_freq": sketches.countmin_freq,
        # distributed BPE merge-table training (iterative argmax — no SQL
        # oracle; pytest pins the merge sequence vs a Sennrich reference)
        "bpe_merges": textstats.bpe_merges,
        "bpe_encode": textstats.bpe_encode,
        "oov_rate": textstats.oov_rate,
        # on-engine model training: full-batch logistic regression with
        # per-block direct-task gradient partials (no SQL oracle; pytest
        # pins weights vs a driver-local numpy reference)
        "quality_classifier": textstats.quality_classifier,
        # similarity search
        "knn_cosine": similarity.knn_cosine,
        # diversity-aware top-k: MMR re-rank of the brute shortlist
        # (greedy/iterative — no SQL oracle; pytest pins lam=1 == brute
        # top-k, a planted reference-MMR equality, and determinism)
        "knn_mmr": similarity.knn_mmr,
        "knn_lsh": similarity.knn_lsh,
        # IVF-flat ANN (approximate recall, exact per-candidate sims —
        # no SQL oracle; pytest pins recall + sim exactness vs knn_cosine)
        "knn_ivf": similarity.knn_ivf,
        # persisted-index variant: build-once list-partitioned parquet,
        # query reads ONLY probed list_id= partitions; byte-identical to
        # knn_ivf (pytest-pinned), so rows-only here like knn_ivf
        "knn_ivf_indexed": similarity.knn_ivf_indexed,
        # IVF-PQ: product-quantized codes + ADC shortlist + exact rerank
        # (rows-only like knn_ivf; pytest pins recall + sim exactness)
        "knn_ivfpq": similarity.knn_ivfpq,
        # persisted IVF-PQ serving path: codes-only index scan + one
        # row-group-pruned point gather for the exact rerank (rows-only;
        # pytest pins layout, recall, sim exactness, build-once reuse)
        "knn_ivfpq_indexed": similarity.knn_ivfpq_indexed,
        "embedding_near_dup_pairs": similarity.embedding_near_dup_pairs,
        "embedding_near_dup_lsh": similarity.embedding_near_dup_lsh,
        # SemDeDup-style cluster-then-prune semantic dedup (clustering
        # makes recall approximate, so rows-only here; pytest pins
        # soundness vs the exact all-pairs frame + planted-dup recall)
        "semantic_dedup": similarity.semantic_dedup,
        "label_centroids": similarity.label_centroids,
        # distributed Lloyd's k-means (iterative — no SQL oracle;
        # pytest pins it against a driver-local numpy Lloyd's)
        "kmeans_embeddings": similarity.kmeans_embeddings,
        # nearest-centroid classification (SQL-oracled vector op)
        "nearest_centroid_labels": similarity.nearest_centroid_labels,
        # distributed PCA (eigendecomposition — no SQL oracle; pytest
        # pins projections against a driver-local numpy PCA)
        "pca_embeddings": similarity.pca_embeddings,
        # deterministic signed-random-projection JL reduction (no SQL
        # oracle: hash-derived sign matrix; pytest pins bit-equality vs
        # a driver numpy reference + norm/distance preservation).
        # Registered as the exploded scalar-row view: value-hash
        # harnesses sort columns, which a list<float> would defeat
        "srp_project": similarity.srp_project_rows,
        # per-language vocabulary heavy hitters (PARTITION BY top-k)
        "top_tokens_per_lang": textstats.top_tokens_per_lang,
        # multimodal (binary payload columns; decode stubbed, plumbing real)
        "media_features": multimodal.media_features,
        "video_frame_samples": multimodal.video_frame_samples,
        # windowed audio features (rms + zero-crossings per frame window)
        "audio_windows": multimodal.audio_windows,
        # distributed prefix scan (window function): sequence packing
        "pack_sequences": corpus.pack_sequences,
        # flagship: crawl output -> dedup -> quality/lang -> partitioned corpus
        "corpus_prep": corpus.corpus_prep_demo,
        "hash_split": corpus.hash_split,
        # resumable sharded export: fresh /tmp dir per call so the
        # timed path is the full write+manifest; the oracle evaluates
        # the manifest expression over the SOURCE table, so a hash
        # match certifies the on-disk shards account for every row
        "corpus_shards_manifest": _corpus_shards_fresh,
        # deterministic epoch shuffle (ROW_NUMBER over the ring mix)
        "shuffle_epoch": corpus.shuffle_epoch,
        "mixture_sample": corpus.mixture_sample,
        "stratified_sample": corpus.stratified_sample,
        # weight-proportional Poisson sampling (token-budget subsample;
        # integer-exact threshold ring shared with the oracle)
        "poisson_sample": corpus.poisson_sample,
        # exact fixed-size deterministic sample (bottom-k hash keys)
        "bottomk_sample": corpus.bottomk_sample,
        # weighted WITHOUT replacement (A-ES bottom-k on -ln(u)/w)
        "weighted_sample_aes": corpus.weighted_sample_aes,
        # incremental-recrawl set diff (added/removed/changed vs snapshot B)
        "snapshot_diff": corpus.snapshot_diff,
        # per-source change rates + recrawl priority rank from the
        # snapshot diff (the adaptive-cadence refinement of the
        # reference's one global polling ticker)
        "recrawl_priority": corpus.recrawl_priority,
        # DSIR importance resampling (hashed-bigram log-ratio model; no
        # SQL oracle — pytest pins vs a driver-local reference)
        "dsir_sample": corpus.dsir_sample,
        # substring-dedup removal pass (cut corpus-repeated k-token spans)
        "strip_repeated_spans": dedup.strip_repeated_spans,
        # downsample every language to the smallest one's count
        "rebalance_langs": corpus.rebalance_langs,
        # canonical lowercase/whitespace normalization kernel
        "normalize_text": textstats.normalize_text,
        # iterative graph algorithm over the crawl host graph (no SQL
        # oracle: power iteration; pytest pins it to a dense reference)
        "pagerank_hosts": graph.pagerank_hosts,
        # HITS hubs/authorities (iterative — no SQL oracle; pytest pins
        # dense-reference equality and a planted star graph)
        "hits_hosts": graph.hits_hosts,
        # exact global triangle count of the host graph (degree-oriented
        # wedge closure); pytest-pinned vs trace(A^3)/6 — no SQL oracle
        "host_triangles": graph.host_triangles,
        # per-target in-link anchor-text aggregation over the synthetic
        # web (no SQL oracle: HTML parse over the page store; pytest
        # pins a sequential dict reference + handcrafted kernel edges)
        "anchor_texts": graph.anchor_texts,
        # per-host degree/strength/reciprocity profile of the host graph
        # (no SQL oracle: graph closure over the page store; pytest pins
        # a sequential reference + planted mutual/one-way/self-loop)
        "host_degrees": graph.host_degrees,
        # weakly-connected components of the host graph via the same
        # FastSV loop the near-dup family uses (no SQL oracle; pytest
        # pins union-find equality + planted islands)
        "host_components": graph.host_components,
        # k-core decomposition (h-index fixpoint; no SQL oracle —
        # iterative; pytest pins exact peeling-reference equality)
        "host_kcore": graph.host_kcore,
        # the crawl engine itself (deterministic tiny fixture; the oracle
        # equivalence is enforced in pytest, rows-only here)
        "crawl_log": lambda sf_dir: _crawl_tiny()[0],
        # per-host politeness audit of the tiny crawl's log against the
        # engine's own budget (no SQL oracle: audits engine output;
        # pytest pins zero violations here + exact counts on a planted
        # violating log)
        "politeness_audit": lambda sf_dir: windows.politeness_audit(
            _crawl_tiny()[0], budget=2
        ),
        # robots-conformance audit of the tiny crawl against the page
        # store's own robots.txt rules (no SQL oracle; pytest pins the
        # clean engine log + an exactly-counted planted violation)
        "robots_audit": lambda sf_dir: _robots_audit_tiny(),
        "crawl_seen": lambda sf_dir: _crawl_tiny()[1],
    }
    return q


_SQL_BM25 = r"""
            WITH toks AS (
                SELECT doc_id, u.tok AS tok
                FROM documents, unnest(regexp_extract_all(text, '\S+')) AS u(tok)
            ),
            dl AS (SELECT doc_id, COUNT(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
            stats AS (
                SELECT (SELECT COUNT(*) FROM documents)::DOUBLE AS n,
                       (SELECT COUNT(*) FROM toks)::DOUBLE
                         / (SELECT COUNT(*) FROM documents)::DOUBLE AS avgdl
            ),
            df AS (
                SELECT tok, COUNT(DISTINCT doc_id)::DOUBLE AS df
                FROM toks WHERE tok IN ('hash', 'scan', 'table') GROUP BY tok
            ),
            tf AS (
                SELECT doc_id, tok, COUNT(*)::DOUBLE AS tf
                FROM toks WHERE tok IN ('hash', 'scan', 'table') GROUP BY doc_id, tok
            ),
            part AS (
                SELECT tf.doc_id,
                       ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
                         * (tf.tf * (1.2 + 1.0))
                         / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl)) AS p
                FROM tf
                JOIN df d ON d.tok = tf.tok
                JOIN dl l ON l.doc_id = tf.doc_id
                CROSS JOIN stats s
            )
            SELECT doc_id::BIGINT AS doc_id, ROUND(SUM(p), 4) AS score
            FROM part GROUP BY doc_id ORDER BY SUM(p) DESC, doc_id LIMIT 10
        """


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   COUNT(*)::BIGINT AS count_order,
                   ROUND(SUM(l_quantity) / COUNT(*), 4) AS avg_qty,
                   ROUND(SUM(l_extendedprice) / COUNT(*), 4) AS avg_price
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "filter_project": """
            SELECT l_orderkey, l_quantity,
                   l_extendedprice * (1 - l_discount) AS revenue,
                   1::INTEGER AS version
            FROM lineitem WHERE l_quantity > 30 AND l_discount < 0.05
        """,
        "join_customer_orders": """
            SELECT c_mktsegment, ROUND(SUM(o_totalprice), 2) AS total_price, COUNT(*)::BIGINT AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        # TPC-H Q3 shape; ORDER BY the unrounded revenue (the pipeline
        # ranks before rounding) with (date, orderkey) tiebreaks
        "q3_shipping_priority": """
            SELECT l_orderkey::BIGINT AS o_orderkey,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   o_orderdate
            FROM customer, orders, lineitem
            WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
              AND l_orderkey = o_orderkey
              AND o_orderdate < TIMESTAMP '1998-06-01'
              AND l_shipdate > TIMESTAMP '1998-06-01'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, o_orderdate, l_orderkey
            LIMIT 10
        """,
        "left_join_customer_names": """
            SELECT o_orderkey, o_custkey, c_name
            FROM orders LEFT JOIN (
                SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
            ) c ON o_custkey = c_custkey
        """,
        "corr_quantity_price": """
            SELECT l_returnflag, COUNT(*)::BIGINT AS n,
                   ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
            FROM lineitem GROUP BY l_returnflag
        """,
        "salted_join_events": """
            SELECT c_mktsegment, ROUND(SUM(value), 2) AS sum_value,
                   COUNT(*)::BIGINT AS n_events
            FROM events JOIN customer ON user_id = c_custkey
            GROUP BY c_mktsegment
        """,
        # lo/hi replicate the pipeline's (total-1)*q interpolation, which
        # is quantile_cont's convention
        "winsorized_value_stats": """
            WITH q AS (
              SELECT event_type,
                     quantile_cont(value, 0.05) AS lo,
                     quantile_cont(value, 0.95) AS hi
              FROM events GROUP BY event_type
            )
            SELECT e.event_type, COUNT(*)::BIGINT AS n,
                   ROUND(AVG(LEAST(GREATEST(value, lo), hi)), 4) AS clipped_mean
            FROM events e JOIN q USING (event_type)
            GROUP BY e.event_type
        """,
        # every term is integer-exact (cents x dyadic milli-weight) so
        # the sum is order-independent on both engines; SUM(BIGINT) is
        # HUGEINT in DuckDB, hence the ::BIGINT
        "time_decayed_spend": """
            WITH m AS (SELECT MAX(ts) AS tmax FROM events)
            SELECT event_type,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)
                       * CAST(FLOOR(1000 * POWER(0.5,
                             (epoch_us(tmax) - epoch_us(ts)) // 604800000000)) AS BIGINT)
                      )::BIGINT AS decayed_units,
                   COUNT(*)::BIGINT AS n_events
            FROM events, m
            GROUP BY event_type
        """,
        # the self-join the pipeline computes in one linear scan;
        # b.ts >= a.ts: a same-instant purchase counts as converting
        "funnel_conversions": """
            WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
                 c AS (SELECT DISTINCT a.user_id
                       FROM events a JOIN events b ON a.user_id = b.user_id
                       WHERE a.event_type = 'view' AND b.event_type = 'purchase'
                         AND b.ts >= a.ts
                         AND epoch_us(b.ts) - epoch_us(a.ts) <= 3600000000)
            SELECT (SELECT COUNT(*) FROM v)::BIGINT AS n_viewers,
                   (SELECT COUNT(*) FROM c)::BIGINT AS n_converted
        """,
        # integer epoch-week buckets on both sides (no date_trunc
        # week-start convention to match)
        "retention_cohorts": """
            WITH uw AS (SELECT DISTINCT user_id,
                               epoch_us(ts) // 604800000000 AS week
                        FROM events),
                 c AS (SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id)
            SELECT cohort_week::BIGINT AS cohort_week,
                   (week - cohort_week)::BIGINT AS week_offset,
                   COUNT(*)::BIGINT AS n_users
            FROM uw JOIN c USING (user_id)
            GROUP BY cohort_week, week - cohort_week
        """,
        "event_type_matrix": """
            SELECT hour(ts) AS hod,
                   COUNT(*) FILTER (event_type = 'click')::BIGINT AS n_click,
                   COUNT(*) FILTER (event_type = 'error')::BIGINT AS n_error,
                   COUNT(*) FILTER (event_type = 'purchase')::BIGINT AS n_purchase,
                   COUNT(*) FILTER (event_type = 'signup')::BIGINT AS n_signup,
                   COUNT(*) FILTER (event_type = 'view')::BIGINT AS n_view,
                   COUNT(*)::BIGINT AS n_total,
                   ROUND(SUM(value), 2) AS sum_value
            FROM events GROUP BY hour(ts)
        """,
        "value_deciles": """
            SELECT event_id,
                   ntile(10) OVER (ORDER BY value, event_id)::BIGINT AS decile
            FROM events
        """,
        "join_orders_lineitem_native": """
            SELECT o_orderstatus,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   COUNT(*)::BIGINT AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderstatus
        """,
        "join_orders_lineitem_bloom": """
            SELECT o_orderstatus,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   COUNT(*)::BIGINT AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_totalprice > 200000
            GROUP BY o_orderstatus
        """,
        "join_orders_lineitem": """
            SELECT o_orderstatus,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   COUNT(*)::BIGINT AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderstatus
        """,
        "top_orders_per_segment": """
            SELECT c_mktsegment, o_orderkey, o_custkey, o_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
            QUALIFY row_number() OVER (PARTITION BY c_mktsegment
                     ORDER BY o_totalprice DESC, o_orderkey) <= 3
        """,
        "topk_orders": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "distinct_segments": """
            SELECT c_mktsegment, COUNT(*)::BIGINT AS n_customers FROM customer GROUP BY c_mktsegment
        """,
        "anti_join_customers": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        """,
        "semi_join_parts": """
            SELECT p_partkey, p_brand, p_size FROM part
            WHERE p_size > 40 AND p_partkey IN (SELECT l_partkey FROM lineitem)
        """,
        "global_max": """
            SELECT MAX(o_orderdate) AS max_date, ROUND(MAX(o_totalprice), 2) AS max_price FROM orders
        """,
        "explode_tokens": r"""
            SELECT doc_id, generate_subscripts(toks, 1)::BIGINT AS pos, unnest(toks) AS token
            FROM (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
                  FROM documents)
        """,
        "tumbling_hour": """
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   ROUND(SUM(value), 2) AS sum_value, COUNT(*)::BIGINT AS n_events
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        """,
        # 60-min windows hopping every 15 min: each event expands into
        # size/hop = 4 overlapping windows (generate_series mirrors the
        # pipeline's vectorized k = 0..3 tile)
        "hopping_window": """
            WITH e AS (
                SELECT event_type, value,
                       epoch_us(ts) // 900000000 * 900000000 AS base_us
                FROM events
            ),
            x AS (
                SELECT event_type, value,
                       base_us - 900000000 * g.k AS ws_us
                FROM e, (SELECT unnest(generate_series(0, 3)) AS k) g
            )
            SELECT event_type, make_timestamp(ws_us) AS window_start,
                   ROUND(SUM(value), 2) AS sum_value, COUNT(*)::BIGINT AS n_events
            FROM x GROUP BY event_type, make_timestamp(ws_us)
        """,
        "sessionize": """
            WITH d AS (
                SELECT user_id,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                                 OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL '30 minutes'
                            THEN 1 ELSE 0 END AS new_s
                FROM events)
            SELECT user_id, SUM(new_s)::BIGINT AS n_sessions, COUNT(*)::BIGINT AS n_events
            FROM d GROUP BY user_id
        """,
        # LAG inter-arrival gap; -1 sentinel for each user's first event
        # (not NULL, so both sides hash identically); event_id breaks
        # ts ties the same way the pipeline's lexsort does
        "user_event_gaps": """
            SELECT event_id, user_id,
                   COALESCE(epoch_us(ts) - lag(epoch_us(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id), -1)::BIGINT AS gap_us
            FROM events
        """,
        # fixed-point running total: both sides sum integer cents (the
        # half-away ROUND of price*100), so accumulation order can't
        # produce a float hash mismatch
        "cumulative_spend": """
            SELECT o_orderkey, o_custkey,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER
                       (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)::BIGINT
                       AS cum_spend_cents
            FROM orders
        """,
        # ROWS-frame trailing sum: same integer-cents fixed point as
        # cumulative_spend; window = 2 PRECEDING + CURRENT (k=3 rows)
        "rolling_spend_cents": """
            SELECT o_orderkey, o_custkey,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER
                       (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)::BIGINT
                       AS roll_spend_cents
            FROM orders
        """,
        # per-user LEAD bigram; event_id breaks ts ties the same way the
        # pipeline's lexsort does
        "event_transitions": """
            WITH x AS (
                SELECT event_type,
                       lead(event_type) OVER
                           (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
                FROM events)
            SELECT event_type AS from_type, nxt AS to_type, COUNT(*)::BIGINT AS n
            FROM x WHERE nxt IS NOT NULL
            GROUP BY event_type, nxt
        """,
        # weekly totals + LAG; first week's prev is the -1 sentinel (not
        # NULL) so both sides hash identically
        "weekly_revenue_wow": """
            WITH w AS (
                SELECT date_trunc('week', o_orderdate) AS week,
                       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))::BIGINT AS rev_cents
                FROM orders GROUP BY date_trunc('week', o_orderdate))
            SELECT week, rev_cents,
                   COALESCE(lag(rev_cents) OVER (ORDER BY week), -1)::BIGINT AS prev_cents
            FROM w
        """,
        # PERCENT_RANK: both sides compute below/(n-1) in doubles from
        # identical integers, so the division is bit-identical
        "value_percent_rank": """
            SELECT event_id, event_type,
                   percent_rank() OVER (PARTITION BY event_type ORDER BY value) AS pr
            FROM events
        """,
        "enrich_props": r"""
            SELECT event_type,
                   SUM(regexp_extract(props, '"k": (\d+)', 1)::BIGINT)::BIGINT AS sum_k,
                   COUNT(*)::BIGINT AS n_events
            FROM events GROUP BY event_type
        """,
        "distinct_users_per_type": """
            SELECT event_type, COUNT(DISTINCT user_id)::BIGINT AS n_users
            FROM events GROUP BY event_type
        """,
        "distinct_users_per_window": """
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   COUNT(DISTINCT user_id)::BIGINT AS n_users
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        """,
        "events_stats": """
            SELECT event_type, COUNT(*)::BIGINT AS n, ROUND(SUM(value), 2) AS sum_value
            FROM events GROUP BY event_type
        """,
        "token_counts": r"""
            SELECT doc_id,
                   len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT AS n_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+'))::BIGINT AS n_bpeish
            FROM documents
        """,
        "doc_stats_by_lang": r"""
            SELECT lang, SUM(n_chars)::BIGINT AS sum_chars,
                   SUM(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')))::BIGINT AS sum_tokens,
                   COUNT(*)::BIGINT AS n_docs
            FROM documents GROUP BY lang
        """,
        # integer-exact repetition signals (keep rule in int arithmetic —
        # no float-rounding tie hazard between DuckDB and numpy)
        "repetition_stats": r"""
            WITH pairs AS (
                SELECT doc_id, u.tok AS tok
                FROM documents, unnest(regexp_extract_all(text, '\S+')) AS u(tok)
            ),
            cnt AS (
                SELECT doc_id, tok, COUNT(*)::BIGINT AS c FROM pairs GROUP BY doc_id, tok
            ),
            agg AS (
                SELECT doc_id, SUM(c)::BIGINT AS n, COUNT(*)::BIGINT AS d, MAX(c)::BIGINT AS top
                FROM cnt GROUP BY doc_id
            )
            SELECT doc.doc_id,
                   COALESCE(a.n, 0)::BIGINT AS n_tokens,
                   COALESCE(a.d, 0)::BIGINT AS n_distinct_tokens,
                   COALESCE(a.top, 0)::BIGINT AS top_token_count,
                   (CASE WHEN 10 * (COALESCE(a.n, 0) - COALESCE(a.d, 0)) <= 3 * COALESCE(a.n, 0)
                              AND 5 * COALESCE(a.top, 0) <= COALESCE(a.n, 0)
                         THEN 1 ELSE 0 END)::BIGINT AS keep
            FROM documents doc LEFT JOIN agg a ON doc.doc_id = a.doc_id
        """,
        "vocab_topk": r"""
            SELECT u.tok AS token, COUNT(*)::BIGINT AS n
            FROM documents, unnest(regexp_extract_all(text, '\S+')) AS u(tok)
            GROUP BY u.tok ORDER BY n DESC, token LIMIT 100
        """,
        # symmetric positional self-join == the pipeline's both-direction
        # window expansion; |pos diff| in [1, window]
        "cooccurrence_topk": r"""
            WITH p AS (
              SELECT doc_id, generate_subscripts(toks, 1)::BIGINT AS pos, unnest(toks) AS tok
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
                    FROM documents)
            ),
            pairs AS (
              SELECT a.tok AS w1, b.tok AS w2, COUNT(*)::BIGINT AS n
              FROM p a JOIN p b ON a.doc_id = b.doc_id
               AND b.pos BETWEEN a.pos - 3 AND a.pos + 3 AND b.pos <> a.pos
              GROUP BY a.tok, b.tok
            )
            SELECT w1, w2, n FROM pairs ORDER BY n DESC, w1, w2 LIMIT 100
        """,
        "top_tokens_per_lang": r"""
            WITH c AS (
                SELECT lang, u.tok AS token, COUNT(*)::BIGINT AS n
                FROM documents, unnest(regexp_extract_all(text, '\S+')) AS u(tok)
                GROUP BY lang, u.tok)
            SELECT lang, token, n,
                   row_number() OVER (PARTITION BY lang ORDER BY n DESC, token)::BIGINT AS rank
            FROM c QUALIFY rank <= 10
        """,
        # score = dot / ||centroid||: the vector's own norm is constant
        # across labels, so the argmax equals the cosine argmax; ties
        # (exactly-equal scores) go to the smallest label on both sides
        "nearest_centroid_labels": """
            WITH e AS (SELECT vec_id, label, unnest(embedding) AS v,
                              generate_subscripts(embedding, 1) AS pos
                       FROM embeddings),
                 c AS (SELECT label, pos, AVG(v) AS cv FROM e GROUP BY label, pos),
                 cn AS (SELECT label, sqrt(SUM(cv * cv)) AS nrm FROM c GROUP BY label),
                 dots AS (SELECT e.vec_id, c.label, SUM(e.v * c.cv) AS dot
                          FROM e JOIN c USING (pos) GROUP BY e.vec_id, c.label)
            SELECT vec_id, label AS pred_label
            FROM dots JOIN cn USING (label)
            QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dot / nrm DESC, label) = 1
        """,
        "token_doc_freq": r"""
            WITH pairs AS (
                SELECT DISTINCT doc_id, u.tok AS tok
                FROM documents, unnest(regexp_extract_all(text, '\S+')) AS u(tok)
            )
            SELECT tok AS token, COUNT(*)::BIGINT AS df
            FROM pairs GROUP BY tok ORDER BY df DESC, token LIMIT 100
        """,
        # top-3 tf-idf terms per doc; the window tie-break (score DESC,
        # token ASC) mirrors the pipeline's lexsort((tok, -s, doc)).
        # Both sides compute tf * ln(N/df) in float64 (numpy np.log vs
        # DuckDB ln share libm), so the unrounded sort keys agree.
        "tfidf_topk": r"""
            WITH pairs AS (
                SELECT doc_id, u.tok AS tok
                FROM documents, unnest(regexp_extract_all(text, '\S+')) AS u(tok)
            ),
            tf AS (SELECT doc_id, tok, COUNT(*)::BIGINT AS tf FROM pairs GROUP BY doc_id, tok),
            df AS (SELECT tok, COUNT(DISTINCT doc_id)::BIGINT AS df FROM pairs GROUP BY tok),
            n AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM documents),
            s AS (
                SELECT tf.doc_id, tf.tok, tf.tf, df.df,
                       tf.tf * ln(n.n_docs / df.df) AS score
                FROM tf JOIN df USING (tok) CROSS JOIN n
            )
            SELECT doc_id::BIGINT AS doc_id, tok AS token, tf, df,
                   ROUND(score, 3) AS tfidf
            FROM s
            QUALIFY row_number() OVER (PARTITION BY doc_id
                     ORDER BY score DESC, tok) <= 3
        """,
        # per-doc mean unigram log-prob under the corpus's own unigram
        # LM (no smoothing — OOV impossible when scoring the training
        # corpus itself); zero-token docs emit no row on both sides
        "unigram_logprob": r"""
            WITH pairs AS (
                SELECT doc_id, u.tok AS tok
                FROM documents, unnest(regexp_extract_all(text, '\S+')) AS u(tok)
            ),
            cnt AS (SELECT tok, COUNT(*)::DOUBLE AS c FROM pairs GROUP BY tok),
            tot AS (SELECT SUM(c) AS t FROM cnt)
            SELECT doc_id::BIGINT AS doc_id, COUNT(*)::BIGINT AS n_tokens,
                   ROUND(SUM(ln(c / t)) / COUNT(*), 4) AS avg_logprob
            FROM pairs JOIN cnt USING (tok) CROSS JOIN tot
            GROUP BY doc_id
        """,
        "bigram_logprob": _BIGRAM_LP_SQL,
        # integer-exact CCNet tercile: score_q = floor(s*1e9/n) in
        # HUGEINT (s = sum of corpus token counts over the doc's
        # positions), NTILE(3) per lang ORDER BY score_q DESC, doc_id —
        # no float enters the bucket decision on either side
        "fluency_buckets": r"""
            WITH toks AS (
                SELECT doc_id, lang, u.tok
                FROM documents, unnest(regexp_extract_all(text, '\S+')) AS u(tok)
            ),
            cnt AS (SELECT tok, COUNT(*)::HUGEINT AS c FROM toks GROUP BY tok),
            per_doc AS (
                SELECT t.doc_id, t.lang, SUM(c.c)::HUGEINT AS s, COUNT(*)::HUGEINT AS n
                FROM toks t JOIN cnt c USING (tok) GROUP BY t.doc_id, t.lang
            ),
            scored AS (
                SELECT doc_id, lang,
                       ((s // n) * 1000000000 + ((s % n) * 1000000000) // n)::BIGINT
                           AS score_q
                FROM per_doc
            )
            SELECT doc_id::BIGINT AS doc_id, lang, score_q,
                   NTILE(3) OVER (PARTITION BY lang
                                  ORDER BY score_q DESC, doc_id)::BIGINT AS bucket
            FROM scored
        """,
        # top-100 word bigrams; n-grams never cross documents
        "ngram_counts": r"""
            WITH toks AS (
                SELECT list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
                FROM documents
            ),
            b AS (
                SELECT w[g.i] || ' ' || w[g.i + 1] AS ngram
                FROM toks, unnest(generate_series(1, len(w) - 1)) AS g(i)
            )
            SELECT ngram, COUNT(*)::BIGINT AS n
            FROM b GROUP BY ngram ORDER BY n DESC, ngram LIMIT 100
        """,
        # inverted index: postings as the comma-joined ascending doc_id
        # string the pipeline emits per term
        "token_postings": r"""
            WITH pairs AS (
                SELECT DISTINCT doc_id, u.tok AS token
                FROM documents, unnest(regexp_extract_all(text, '\S+')) AS u(tok)
            )
            SELECT token, COUNT(*)::BIGINT AS df,
                   string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
            FROM pairs GROUP BY token
        """,
        # token-phrase search ("the fast"): anchor join over the same
        # filtered-positions tokenization as explode_tokens; overlapping
        # matches count once per anchor on both sides. The indexed path
        # returns the identical result (pinned), so it shares the oracle
        "phrase_search": _PHRASE_SQL,
        "phrase_search_indexed": _PHRASE_SQL,
        # PMI: the division tree ln((n/Nb) / ((cx/Nu)*(cy/Nu))) mirrors
        # the pipeline's numpy expression operation-for-operation (same
        # float64 intermediates, same libm log), rounded to 4 on both
        # sides — the unigram_logprob float-parity approach
        "bigram_pmi": r"""
            WITH toks AS (
                SELECT list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
                FROM documents
            ),
            uni AS (
                SELECT u.tok AS tok, COUNT(*)::DOUBLE AS c
                FROM toks, unnest(w) AS u(tok) GROUP BY u.tok
            ),
            nu AS (SELECT SUM(c) AS nu FROM uni),
            bi AS (
                SELECT w[g.i] AS tok1, w[g.i + 1] AS tok2, COUNT(*)::BIGINT AS n
                FROM toks, unnest(generate_series(1, len(w) - 1)) AS g(i)
                GROUP BY w[g.i], w[g.i + 1]
            ),
            nb AS (SELECT SUM(n)::DOUBLE AS nb FROM bi)
            SELECT b.tok1, b.tok2, b.n,
                   ROUND(ln((b.n::DOUBLE / nb.nb) /
                            ((u1.c / nu.nu) * (u2.c / nu.nu))), 4) AS pmi
            FROM bi b
            JOIN uni u1 ON u1.tok = b.tok1
            JOIN uni u2 ON u2.tok = b.tok2
            CROSS JOIN nu CROSS JOIN nb
        """,
        # BM25 with the pipeline's exact float64 expression tree
        # (left-assoc (idf * tf-part) / denom; avgdl = toks/docs);
        # ORDER BY the unrounded score like the pipeline's sort
        "bm25_topk": _SQL_BM25,
        # identical contract to bm25_topk (the indexed path must return
        # the same answer), so the oracle is shared verbatim
        "bm25_topk_indexed": _SQL_BM25,
        # moment arithmetic mirrored explicitly (sqrt(ss/n - mean^2)),
        # not STDDEV_POP, so the float64 trees agree; the integer sums
        # are float64-exact so partial-order differences vanish
        "zscore_by_lang": """
            WITH m AS (
                SELECT lang, COUNT(*)::DOUBLE AS n,
                       SUM(n_chars::DOUBLE) AS s,
                       SUM(n_chars::DOUBLE * n_chars::DOUBLE) AS ss
                FROM documents GROUP BY lang
            )
            SELECT d.doc_id::BIGINT AS doc_id, d.lang,
                   d.n_chars::BIGINT AS n_chars,
                   ROUND((d.n_chars::DOUBLE - m.s / m.n)
                         / sqrt(m.ss / m.n - (m.s / m.n) * (m.s / m.n)), 4) AS z_len
            FROM documents d JOIN m ON m.lang = d.lang
        """,
        # boilerplate line removal: drop lines held by >= 3 distinct
        # docs, reassemble in original order; docs losing every line
        # keep a row with ''
        "line_dedup": """
            WITH lines AS (
                SELECT doc_id, generate_subscripts(ls, 1)::BIGINT AS idx, unnest(ls) AS line
                FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents)
            ),
            df AS (SELECT line, COUNT(DISTINCT doc_id)::BIGINT AS d FROM lines GROUP BY line),
            kept AS (
                SELECT l.doc_id, l.idx, l.line
                FROM lines l JOIN df USING (line) WHERE d < 3
            ),
            tot AS (SELECT doc_id, COUNT(*)::BIGINT AS n_lines FROM lines GROUP BY doc_id)
            SELECT t.doc_id::BIGINT AS doc_id,
                   COALESCE(string_agg(k.line, chr(10) ORDER BY k.idx), '') AS text_clean,
                   (t.n_lines - COUNT(k.line))::BIGINT AS n_removed_lines
            FROM tot t LEFT JOIN kept k USING (doc_id)
            GROUP BY t.doc_id, t.n_lines
        """,
        # first-occurrence paragraph dedup: the winner of each repeated
        # paragraph is MIN(doc_id * 2^21 + position); empty paragraphs
        # (length < 1) are exempt so blank separators survive
        "paragraph_dedup": """
            WITH lines AS (
                SELECT doc_id, generate_subscripts(ls, 1)::BIGINT AS idx, unnest(ls) AS line
                FROM (SELECT doc_id, string_split(COALESCE(text, ''), chr(10)) AS ls
                      FROM documents)
            ),
            win AS (
                SELECT line, MIN(doc_id * 2097152 + (idx - 1)) AS w, COUNT(*)::BIGINT AS n
                FROM lines WHERE length(line) >= 1 GROUP BY line
            ),
            kept AS (
                SELECT l.doc_id, l.idx, l.line
                FROM lines l LEFT JOIN win ON l.line = win.line AND length(l.line) >= 1
                WHERE win.line IS NULL OR win.n < 2
                      OR l.doc_id * 2097152 + (l.idx - 1) = win.w
            ),
            tot AS (SELECT doc_id, COUNT(*)::BIGINT AS n_lines FROM lines GROUP BY doc_id)
            SELECT t.doc_id::BIGINT AS doc_id,
                   COALESCE(string_agg(k.line, chr(10) ORDER BY k.idx), '') AS text_clean,
                   (t.n_lines - COUNT(k.line))::BIGINT AS n_removed_paras
            FROM tot t LEFT JOIN kept k USING (doc_id)
            GROUP BY t.doc_id, t.n_lines
        """,
        # the CCNet composition: stage-1 boilerplate removal on the RAW
        # corpus, stage-2 first-occurrence paragraph winners over the
        # cleaned text, stage-3 integer-exact fluency NTILE, tail cut
        "ccnet_corpus": r"""
            WITH lines1 AS (
                SELECT doc_id, lang, generate_subscripts(ls, 1)::BIGINT AS idx,
                       unnest(ls) AS line
                FROM (SELECT doc_id, lang,
                             string_split(COALESCE(text, ''), chr(10)) AS ls
                      FROM documents)
            ),
            -- stage 1: boilerplate removal on the RAW corpus
            df1 AS (
                SELECT line, COUNT(DISTINCT doc_id)::BIGINT AS d FROM lines1 GROUP BY line
            ),
            kept1 AS (
                SELECT l.doc_id, l.idx, l.line FROM lines1 l JOIN df1 USING (line)
                WHERE d < 3
            ),
            text1 AS (
                SELECT t.doc_id, t.lang,
                       COALESCE(string_agg(k.line, chr(10) ORDER BY k.idx), '') AS text
                FROM (SELECT DISTINCT doc_id, lang FROM lines1) t
                LEFT JOIN kept1 k USING (doc_id) GROUP BY t.doc_id, t.lang
            ),
            -- stage 2: first-occurrence paragraph dedup of what remains
            lines2 AS (
                SELECT doc_id, lang, generate_subscripts(ls, 1)::BIGINT AS idx,
                       unnest(ls) AS line
                FROM (SELECT doc_id, lang, string_split(text, chr(10)) AS ls FROM text1)
            ),
            win AS (
                SELECT line, MIN(doc_id * 2097152 + (idx - 1)) AS w,
                       COUNT(*)::BIGINT AS n
                FROM lines2 WHERE length(line) >= 1 GROUP BY line
            ),
            kept2 AS (
                SELECT l.doc_id, l.idx, l.line
                FROM lines2 l LEFT JOIN win ON l.line = win.line AND length(l.line) >= 1
                WHERE win.line IS NULL OR win.n < 2
                      OR l.doc_id * 2097152 + (l.idx - 1) = win.w
            ),
            text2 AS (
                SELECT t.doc_id, t.lang,
                       COALESCE(string_agg(k.line, chr(10) ORDER BY k.idx), '') AS text
                FROM (SELECT DISTINCT doc_id, lang FROM lines2) t
                LEFT JOIN kept2 k USING (doc_id) GROUP BY t.doc_id, t.lang
            ),
            -- stage 3: integer-exact fluency NTILE over the cleaned text
            toks AS (
                SELECT doc_id, lang, u.tok
                FROM text2, unnest(regexp_extract_all(text, '\S+')) AS u(tok)
            ),
            cnt AS (SELECT tok, COUNT(*)::HUGEINT AS c FROM toks GROUP BY tok),
            per_doc AS (
                SELECT t.doc_id, t.lang, SUM(c.c)::HUGEINT AS s, COUNT(*)::HUGEINT AS n
                FROM toks t JOIN cnt c USING (tok) GROUP BY t.doc_id, t.lang
            ),
            scored AS (
                SELECT doc_id, lang,
                       ((s // n) * 1000000000 + ((s % n) * 1000000000) // n)::BIGINT
                           AS score_q
                FROM per_doc
            ),
            bucketed AS (
                SELECT doc_id, lang, score_q,
                       NTILE(3) OVER (PARTITION BY lang
                                      ORDER BY score_q DESC, doc_id)::BIGINT AS bucket
                FROM scored
            )
            SELECT b.doc_id::BIGINT AS doc_id, b.lang, t.text, b.score_q, b.bucket
            FROM bucketed b JOIN text2 t ON b.doc_id = t.doc_id
            WHERE b.bucket <= 2
        """,
        # deterministic per-source mixture sampling: the same mod-2^32
        # integer ring as hash_split, remixed through xorshift-multiply
        # (xor(h, h >> 16) * 2246822519) so split and mixture draws are
        # decorrelated; keep when draw < rate * 10000
        # identical integer ring to mixture_sample; thresholds are
        # integer-exact (min*10000)//n so both engines cut identically
        "rebalance_langs": """
            WITH counts AS (SELECT lang, COUNT(*)::HUGEINT AS n FROM documents GROUP BY lang),
                 m AS (SELECT MIN(n) AS mn FROM counts),
                 th AS (SELECT lang, (mn * 10000) // n AS thresh FROM counts, m),
                 h AS (
                   SELECT doc_id, lang,
                          ((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
                           % 4294967296) AS h32
                   FROM documents
                 ),
                 u AS (
                   SELECT doc_id, lang,
                          ((CAST(xor(h32, h32 // 65536) AS HUGEINT) * 2246822519)
                           % 4294967296) % 10000 AS draw
                   FROM h
                 )
            SELECT u.doc_id::BIGINT AS doc_id, u.lang
            FROM u JOIN th USING (lang)
            WHERE draw < thresh
        """,
        "normalize_text": r"""
            SELECT doc_id,
                   lower(trim(regexp_replace(COALESCE(text, ''), '\s+', ' ', 'g'))) AS norm_text
            FROM documents
        """,
        "mixture_sample": """
            WITH h AS (
              SELECT doc_id, source,
                     ((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
                      % 4294967296) AS h32
              FROM documents
            ),
            u AS (
              SELECT doc_id, source,
                     ((CAST(xor(h32, h32 // 65536) AS HUGEINT) * 2246822519)
                      % 4294967296) % 10000 AS draw
              FROM h
            )
            SELECT doc_id::BIGINT AS doc_id, source
            FROM u
            WHERE draw < CASE source WHEN 'src0' THEN 10000
                                     WHEN 'src1' THEN 2500
                                     ELSE 5000 END
        """,
        # weight-proportional Poisson sample: include iff the 32-bit draw
        # clears the integer-exact threshold (k*n_chars*2^32 - 1) // W —
        # the same rational compare corpus.poisson_sample evaluates in
        # numpy uint64, so membership matches bit-for-bit (no float
        # probability anywhere; w=0 rows excluded on both sides)
        "poisson_sample": """
            WITH tot AS (SELECT CAST(SUM(n_chars) AS HUGEINT) AS w FROM documents),
            h AS (
              SELECT doc_id, lang, n_chars,
                     ((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
                      % 4294967296) AS h32
              FROM documents
            ),
            u AS (
              SELECT doc_id, lang, n_chars,
                     ((CAST(xor(h32, h32 // 65536) AS HUGEINT) * 2246822519)
                      % 4294967296) AS draw
              FROM h
            )
            SELECT doc_id::BIGINT AS doc_id, lang, n_chars::BIGINT AS n_chars
            FROM u, tot
            WHERE n_chars > 0
              AND draw <= (100::HUGEINT * n_chars * 4294967296 - 1) // tot.w
        """,
        # exact fixed-size sample: the k smallest multiplicative-hash
        # keys (hash_split's ring), doc_id tie-break — LIMIT under a
        # strict total order is deterministic on both sides
        "bottomk_sample": """
            SELECT doc_id::BIGINT AS doc_id,
                   ((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
                    % 4294967296)::BIGINT AS h
            FROM documents
            ORDER BY h, doc_id LIMIT 200
        """,
        "weighted_sample_aes": _AES_SAMPLE_SQL,
        # incremental-recrawl diff: snapshot B derived in-query (drop
        # %7, rewrite %11, add fresh ids for %13); the pipeline compares
        # 64-bit content fingerprints, the oracle compares text exactly
        # per-source recrawl priority: the oracle is free to exploit the
        # analytic form of snapshot B's modular derivation; the Ray side
        # consumes snapshot_diff's actual output
        # exact discrete quantiles: quantile_disc uses the same
        # rank = ceil(q*n)-1 convention the Ray side implements
        "value_quantiles_exact": """
            SELECT 0.01 AS q, quantile_disc(value, 0.01) AS value FROM events
            UNION ALL
            SELECT 0.25, quantile_disc(value, 0.25) FROM events
            UNION ALL
            SELECT 0.50, quantile_disc(value, 0.50) FROM events
            UNION ALL
            SELECT 0.75, quantile_disc(value, 0.75) FROM events
            UNION ALL
            SELECT 0.99, quantile_disc(value, 0.99) FROM events
        """,
        "recrawl_priority": """
            WITH per AS (
                SELECT source, COUNT(*)::HUGEINT AS n_docs,
                       SUM(CASE WHEN doc_id % 7 != 0 AND doc_id % 11 = 0
                                THEN 1 ELSE 0 END)::BIGINT AS n_changed,
                       SUM(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)::BIGINT
                           AS n_removed
                FROM documents GROUP BY source
            ),
            scored AS (
                SELECT source, n_docs::BIGINT AS n_docs, n_changed, n_removed,
                       (((n_changed + n_removed)::HUGEINT * 1000000) // n_docs)::BIGINT
                           AS change_rate_q
                FROM per
            )
            SELECT source, n_docs, n_changed, n_removed, change_rate_q,
                   ROW_NUMBER() OVER (ORDER BY change_rate_q DESC, source)::BIGINT
                       AS priority
            FROM scored
        """,
        "snapshot_diff": """
            WITH mx AS (SELECT MAX(doc_id) + 1 AS base FROM documents),
            b AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 11 = 0 THEN text || ' [v2]' ELSE text END AS text
              FROM documents WHERE doc_id % 7 <> 0
              UNION ALL
              SELECT doc_id + mx.base AS doc_id,
                     'new snapshot doc ' || (doc_id + mx.base) AS text
              FROM documents, mx WHERE doc_id % 13 = 0
            )
            SELECT COALESCE(a.doc_id, b.doc_id)::BIGINT AS doc_id,
                   CASE WHEN a.doc_id IS NULL THEN 'added'
                        WHEN b.doc_id IS NULL THEN 'removed'
                        ELSE 'changed' END AS status
            FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id
            WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.text <> b.text
        """,
        # deterministic stratified sample: exactly 20 docs per language
        # by ascending mixture-hash order (same integer ring as
        # mixture_sample; ties impossible — doc_id breaks them)
        "stratified_sample": """
            WITH h AS (
              SELECT doc_id, lang,
                     ((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
                      % 4294967296) AS h32
              FROM documents
            ),
            u AS (
              SELECT doc_id, lang,
                     ((CAST(xor(h32, h32 // 65536) AS HUGEINT) * 2246822519)
                      % 4294967296) AS draw
              FROM h
            )
            SELECT lang, doc_id::BIGINT AS doc_id
            FROM u
            QUALIFY row_number() OVER (PARTITION BY lang ORDER BY draw, doc_id) <= 20
        """,
        # exact per-language token-length quantiles; quantile_cont uses
        # the same linear interpolation as the pipeline's compressed-
        # histogram searchsorted interp
        "doc_len_quantiles": r"""
            SELECT lang,
                   ROUND(quantile_cont(n_tokens, 0.5), 3) AS p50,
                   ROUND(quantile_cont(n_tokens, 0.9), 3) AS p90,
                   ROUND(quantile_cont(n_tokens, 0.99), 3) AS p99
            FROM (SELECT lang,
                         len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens
                  FROM documents)
            GROUP BY lang
        """,
        "doc_len_histogram": """
            SELECT lang, (n_chars // 200 * 200)::BIGINT AS bin_lo, COUNT(*)::BIGINT AS n_docs
            FROM documents GROUP BY lang, bin_lo
        """,
        # positional k-gram multiplicity (NO distinct — a span repeated
        # within one doc counts); same tokenize/shingle CTEs as the
        # n-gram Jaccard oracle, short docs collapse to one full-text span
        "repeated_spans": r"""
            WITH toks AS (
              SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
              FROM documents
            ),
            pos AS (
              SELECT doc_id, w,
                     unnest(generate_series(1, CASE WHEN len(w) >= 5 THEN len(w) - 4
                                                    WHEN len(w) > 0 THEN 1 ELSE 0 END)) AS i
              FROM toks
            ),
            g AS (SELECT doc_id, array_to_string(w[i : i + 4], ' ') AS s FROM pos),
            rep AS (SELECT s FROM g GROUP BY s HAVING COUNT(*) >= 2)
            SELECT g.doc_id::BIGINT AS doc_id, COUNT(*)::BIGINT AS n_pos,
                   COUNT(rep.s)::BIGINT AS n_repeated_pos
            FROM g LEFT JOIN rep ON g.s = rep.s
            GROUP BY g.doc_id
        """,
        "exact_dedup": r"""
            SELECT MIN(doc_id)::BIGINT AS doc_id FROM documents
            GROUP BY regexp_replace(trim(text), '\s+', ' ', 'g')
        """,
        "exact_dedup_incremental": r"""
            WITH corp AS (
              SELECT DISTINCT regexp_replace(trim(text), '\s+', ' ', 'g') AS norm
              FROM documents WHERE doc_id % 2 = 0
            ), newd AS (
              SELECT doc_id, regexp_replace(trim(text), '\s+', ' ', 'g') AS norm
              FROM documents WHERE doc_id % 2 = 1
            )
            SELECT MIN(doc_id)::BIGINT AS doc_id FROM newd
            WHERE norm NOT IN (SELECT norm FROM corp)
            GROUP BY norm
        """,
        # exact all-pairs 5-gram Jaccard via inverted self-join with the
        # same df-ceiling prefix filter as the Ray pipeline.
        # minhash_lsh_pairs has NO sql oracle by design: it is a
        # probabilistic algorithm (16x4 banding catches a J=0.5 pair
        # w.p. ~0.64 in theory), so exact equality to the all-pairs SQL
        # would hold only by data luck and break on any fixture/seed
        # change; pytest pins it instead as pairs ⊆ exact-pairs (the
        # verify stage recomputes true Jaccard) + planted-dup recall.
        "ngram_jaccard_pairs": _NGRAM_JACCARD_SQL,
        "tf_cosine_pairs": _TF_COSINE_SQL,
        "edit_distance_pairs": _EDIT_DIST_SQL,
        # cluster resolution over the EXACT (ngram) pair list: recursive
        # min-reachable-id closure == connected components. The Ray side
        # runs the distributed hash-to-min loop (pipelines/clusters.py);
        # the minhash/simhash-mined variants share the operator but are
        # probabilistic upstream, so (like minhash_lsh_pairs) they are
        # pytest-pinned, not SQL-oracled.
        "near_dup_clusters": rf"""
            WITH RECURSIVE pairs AS ({_NGRAM_JACCARD_SQL}),
            edges AS (
              SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION
              SELECT doc_b, doc_a FROM pairs
            ),
            walk(u, lbl) AS (
              SELECT u, v FROM edges
              UNION
              SELECT e.u, w.lbl FROM edges e JOIN walk w ON w.u = e.v
            )
            SELECT u::BIGINT AS doc_id,
                   LEAST(u, MIN(lbl))::BIGINT AS cluster_id,
                   (u <= MIN(lbl))::BIGINT AS is_canonical
            FROM walk GROUP BY u
        """,
        "decontaminate": _DECONTAM_SQL,
        "near_dup_clusters_dist": rf"""
            WITH RECURSIVE pairs AS ({_NGRAM_JACCARD_SQL}),
            edges AS (
              SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION
              SELECT doc_b, doc_a FROM pairs
            ),
            walk(u, lbl) AS (
              SELECT u, v FROM edges
              UNION
              SELECT e.u, w.lbl FROM edges e JOIN walk w ON w.u = e.v
            )
            SELECT u::BIGINT AS doc_id,
                   LEAST(u, MIN(lbl))::BIGINT AS cluster_id,
                   (u <= MIN(lbl))::BIGINT AS is_canonical
            FROM walk GROUP BY u
        """,
        "fuzzy_dedup_corpus": rf"""
            WITH RECURSIVE pairs AS ({_NGRAM_JACCARD_SQL}),
            edges AS (
              SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION
              SELECT doc_b, doc_a FROM pairs
            ),
            walk(u, lbl) AS (
              SELECT u, v FROM edges
              UNION
              SELECT e.u, w.lbl FROM edges e JOIN walk w ON w.u = e.v
            ),
            losers AS (SELECT u FROM walk GROUP BY u HAVING u > MIN(lbl))
            SELECT doc_id::BIGINT AS doc_id, n_chars::BIGINT AS n_chars
            FROM documents WHERE doc_id NOT IN (SELECT u FROM losers)
        """,
        "asof_join_events": _ASOF_SQL,
        "interval_join_events": """
            SELECT p.event_id::BIGINT AS event_id,
                   p.user_id::BIGINT AS user_id,
                   epoch_us(p.ts)::BIGINT AS ts_us,
                   s.event_id::BIGINT AS signup_event_id,
                   epoch_us(s.ts)::BIGINT AS signup_ts_us,
                   s.value AS signup_value
            FROM events p
            JOIN events s
              ON s.user_id = p.user_id
             AND s.ts <= p.ts
             AND s.ts > p.ts - INTERVAL 24 HOUR
            WHERE p.event_type = 'purchase' AND s.event_type = 'signup'
        """,
        "rollup_revenue": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_extendedprice), 2) AS sum_price,
                   COUNT(*)::BIGINT AS n_rows
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "cube_revenue": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_extendedprice), 2) AS sum_price,
                   COUNT(*)::BIGINT AS n_rows
            FROM lineitem
            GROUP BY CUBE(l_returnflag, l_linestatus)
        """,
        "topk_events_per_user": """
            SELECT user_id, event_id, value, rk FROM (
              SELECT user_id::BIGINT AS user_id,
                     event_id::BIGINT AS event_id,
                     value,
                     row_number() OVER (
                       PARTITION BY user_id ORDER BY value DESC, event_id
                     )::BIGINT AS rk
              FROM events
            ) WHERE rk <= 3
        """,
        "pack_sequences": """
            WITH scan AS (
              SELECT doc_id,
                     COALESCE(SUM(n_chars) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0)::BIGINT AS cum_before
              FROM documents
            )
            SELECT doc_id, cum_before, (cum_before // 4096)::BIGINT AS bin_id
            FROM scan
        """,
        # removal pass of substring dedup: spans (with the same short-doc
        # whole-text shingle convention as repeated_spans) repeated >= 2
        # times corpus-wide cover tokens i..min(i+k-1, len); kept tokens
        # rebuild the text in order (empty docs keep clean_text = '')
        "strip_repeated_spans": r"""
            WITH toks AS (
              SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
              FROM documents
            ),
            pos AS (
              SELECT doc_id, w,
                     unnest(generate_series(1, CASE WHEN len(w) >= 5 THEN len(w) - 4
                                                    WHEN len(w) > 0 THEN 1 ELSE 0 END)) AS i
              FROM toks
            ),
            sp AS (SELECT doc_id, i, array_to_string(w[i : i + 4], ' ') AS s FROM pos),
            rep AS (SELECT s FROM sp GROUP BY s HAVING COUNT(*) >= 2),
            cov AS (
              SELECT DISTINCT sp.doc_id,
                     unnest(generate_series(sp.i, LEAST(sp.i + 4, len(t.w)))) AS j
              FROM sp JOIN rep USING (s) JOIN toks t ON t.doc_id = sp.doc_id
            ),
            allpos AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS j FROM toks),
            kept AS (
              SELECT a.doc_id, a.j, a.w[a.j] AS tok
              FROM allpos a LEFT JOIN cov c ON c.doc_id = a.doc_id AND c.j = a.j
              WHERE c.j IS NULL
            ),
            agg AS (
              SELECT doc_id, array_to_string(list(tok ORDER BY j), ' ') AS clean_text,
                     COUNT(*) AS n_kept
              FROM kept GROUP BY doc_id
            )
            SELECT t.doc_id::BIGINT AS doc_id,
                   COALESCE(a.clean_text, '') AS clean_text,
                   (len(t.w) - COALESCE(a.n_kept, 0))::BIGINT AS n_dropped
            FROM toks t LEFT JOIN agg a USING (doc_id)
        """,
        # OOV rate vs the corpus's own top-10 vocabulary (tie-break
        # (count desc, token asc) on both sides; zero-token docs excluded)
        "oov_rate": r"""
            WITH toks AS (
              SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS tok
              FROM documents
            ),
            vocab AS (
              SELECT tok FROM (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok)
              ORDER BY n DESC, tok LIMIT 10
            ),
            per AS (
              SELECT doc_id, COUNT(*) AS n_tokens,
                     SUM(CASE WHEN tok IN (SELECT tok FROM vocab) THEN 0 ELSE 1 END) AS n_oov
              FROM toks GROUP BY doc_id
            )
            SELECT doc_id::BIGINT AS doc_id, n_tokens::BIGINT AS n_tokens,
                   n_oov::BIGINT AS n_oov,
                   round_even(n_oov / n_tokens, 4) AS oov_rate
            FROM per
        """,
        "scrub_props": """
            SELECT event_id::BIGINT AS event_id,
                   regexp_replace(props, '[0-9]+', '#', 'g') AS props_scrubbed
            FROM events
        """,
        "hash_split": """
            -- mod 2^32 BEFORE the multiply (ring homomorphism: identical
            -- result) and widen to HUGEINT so the expression matches the
            -- pipeline's uint64 wraparound instead of raising a BIGINT
            -- overflow for doc_id > ~3.5e9; doc_id >= 0 is assumed by
            -- both sides (see corpus.hash_split docstring)
            WITH h AS (
              SELECT doc_id,
                     ((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
                      % 4294967296) % 100 AS b
              FROM documents
            )
            SELECT doc_id::BIGINT AS doc_id,
                   CASE WHEN b < 90 THEN 'train'
                        WHEN b < 95 THEN 'val'
                        ELSE 'test' END AS split
            FROM h
        """,
        # manifest certified against the SOURCE table: same mixed-ring
        # shard expression as hash_split; all n_shards rows emitted
        # (zero-row shards included) to mirror the writer's manifest
        "corpus_shards_manifest": """
            WITH h AS (
              SELECT n_chars,
                     ((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761)
                      % 4294967296) AS mixed
              FROM documents
            ),
            agg AS (
              SELECT (mixed % 16)::BIGINT AS shard, COUNT(*)::BIGINT AS n_rows,
                     SUM(n_chars)::BIGINT AS sum_n_chars,
                     SUM(mixed)::BIGINT AS checksum
              FROM h GROUP BY (mixed % 16)::BIGINT
            )
            SELECT s.shard::BIGINT AS shard,
                   COALESCE(a.n_rows, 0)::BIGINT AS n_rows,
                   COALESCE(a.sum_n_chars, 0)::BIGINT AS sum_n_chars,
                   COALESCE(a.checksum, 0)::BIGINT AS checksum
            FROM (SELECT unnest(generate_series(0, 15)) AS shard) s
            LEFT JOIN agg a ON a.shard = s.shard
        """,
        # same ring mix as hash_split with the seed term added (seed=1
        # default: + 2246822519); rank = ROW_NUMBER - 1 over (mixed,
        # doc_id) — ties impossible, so the order is total and exact
        "shuffle_epoch": """
            WITH h AS (
              SELECT doc_id,
                     ((CAST(doc_id % 4294967296 AS HUGEINT) * 2654435761
                       + 2246822519) % 4294967296) AS mixed
              FROM documents
            )
            SELECT doc_id::BIGINT AS doc_id,
                   (ROW_NUMBER() OVER (ORDER BY mixed, doc_id) - 1)::BIGINT AS epoch_rank
            FROM h
        """,
        "first_per_key": """
            SELECT lang, source, MIN(doc_id)::BIGINT AS first_doc, COUNT(*)::BIGINT AS n_docs
            FROM documents GROUP BY lang, source
        """,
        "knn_cosine": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3),
                 c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 3)
            SELECT qid, vec_id,
                   ROUND(list_cosine_similarity(qe::DOUBLE[], embedding::DOUBLE[]), 3) AS sim
            FROM q CROSS JOIN c
            QUALIFY row_number() OVER (PARTITION BY qid
                     ORDER BY list_cosine_similarity(qe::DOUBLE[], embedding::DOUBLE[]) DESC, vec_id) <= 5
        """,
        # exact all-pairs cosine near-dups (the embedding-dedup analog of
        # ngram_jaccard_pairs). embedding_near_dup_lsh is deliberately NOT
        # oracled: hyperplane LSH recall < 1 at this threshold; pytest
        # pins pairs ⊆ exact + planted-dup recall instead.
        "embedding_near_dup_pairs": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 3) AS sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
        """,
        "label_centroids": """
            WITH x AS (SELECT label, generate_subscripts(embedding, 1) AS dim,
                              unnest(embedding)::DOUBLE AS v FROM embeddings),
                 a AS (SELECT label, dim, SUM(v) AS s, COUNT(*) AS n FROM x GROUP BY label, dim)
            SELECT label::BIGINT AS label, MAX(n)::BIGINT AS n,
                   ROUND(sqrt(SUM((s / n) * (s / n))), 4) AS centroid_norm
            FROM a GROUP BY label
        """,
    }
