"""Pipeline tests: a fast DuckDB-oracle sweep at sf0.001 (mirrors the
driver's correctness gate) plus semantic tests for the operators whose
oracle is rows-only (dedup recall on crafted near-dups, ANN recall,
lang-id accuracy)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]

# queries small enough to sweep in CI; the full set runs in tools/check_correctness.py
SWEEP = [
    "q1_pricing_summary",
    "filter_project",
    "join_customer_orders",
    "topk_orders",
    "distinct_segments",
    "anti_join_customers",
    "semi_join_parts",
    "global_max",
    "explode_tokens",
    "tumbling_hour",
    "hopping_window",
    "sessionize",
    "user_event_gaps",
    "enrich_props",
    "events_stats",
    "distinct_users_per_type",
    "distinct_users_per_window",
    "token_counts",
    "doc_stats_by_lang",
    "repetition_stats",
    "vocab_topk",
    "token_doc_freq",
    "oov_rate",
    "tfidf_topk",
    "top_tokens_per_lang",
    "nearest_centroid_labels",
    "doc_len_quantiles",
    "unigram_logprob",
    "bigram_logprob",
    "fluency_buckets",
    "ngram_counts",
    "token_postings",
    "phrase_search",
    "phrase_search_indexed",
    "bigram_pmi",
    "cooccurrence_topk",
    "bm25_topk",
    "bm25_topk_indexed",
    "zscore_by_lang",
    "mixture_sample",
    "stratified_sample",
    "poisson_sample",
    "bottomk_sample",
    "snapshot_diff",
    "recrawl_priority",
    "rebalance_langs",
    "normalize_text",
    "pack_sequences",
    "corpus_shards_manifest",
    "shuffle_epoch",
    "line_dedup",
    "paragraph_dedup",
    "ccnet_corpus",
    "exact_dedup",
    "exact_dedup_incremental",
    "first_per_key",
    "ngram_jaccard_pairs",
    "tf_cosine_pairs",
    "edit_distance_pairs",
    "weighted_sample_aes",
    "fuzzy_dedup_corpus",
    "near_dup_clusters",
    "decontaminate",
    "asof_join_events",
    "interval_join_events",
    "q3_shipping_priority",
    "join_orders_lineitem_bloom",
    "salted_join_events",
    "winsorized_value_stats",
    "time_decayed_spend",
    "funnel_conversions",
    "event_type_matrix",
    "value_deciles",
    "value_quantiles_exact",
    "retention_cohorts",
    "left_join_customer_names",
    "corr_quantity_price",
    "cumulative_spend",
    "rolling_spend_cents",
    "event_transitions",
    "weekly_revenue_wow",
    "value_percent_rank",
    "doc_len_histogram",
    "repeated_spans",
    "strip_repeated_spans",
    "rollup_revenue",
    "cube_revenue",
    "topk_events_per_user",
    "scrub_props",
    "hash_split",
    "knn_cosine",
    "embedding_near_dup_pairs",
    "label_centroids",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _to_df(obj):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


@pytest.mark.parametrize("name", SWEEP)
def test_query_matches_oracle(name, ddb):
    import __ray_entry__ as em

    got = _canon(_to_df(em.queries()[name](SF)))
    want = _canon(ddb.sql(em.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)


class TestBucketGuards:
    def test_join_orders_lineitem_rejects_non_power_of_two(self):
        """bit_wise_and bucketing is only a mod for power-of-two B: a
        caller passing e.g. 12 would silently merge/skew buckets
        (VERDICT r4 item 6 — same guard asof_join_events already has)."""
        from blockspider_ray.pipelines.relational import join_orders_lineitem

        with pytest.raises(AssertionError, match="power of two"):
            join_orders_lineitem(SF, n_buckets=12)

    def test_sessionize_rejects_non_power_of_two(self):
        from blockspider_ray.pipelines.windows import sessionize

        with pytest.raises(AssertionError, match="power of two"):
            sessionize(SF, n_buckets=12)

    def test_topk_per_user_rejects_non_power_of_two(self):
        from blockspider_ray.pipelines.relational import topk_events_per_user

        with pytest.raises(AssertionError, match="power of two"):
            topk_events_per_user(SF, n_buckets=12)

    def test_topk_per_user_bucket_count_invariant(self):
        """The two-level top-k must be a pure dispatch choice: 4 fat
        buckets and 64 thin ones yield identical (user, event, rank)
        sets — and the per-batch combiner can't have dropped a global
        winner that wasn't its batch's local winner."""
        from blockspider_ray.pipelines.relational import topk_events_per_user

        def collect(b):
            return (
                topk_events_per_user(SF, n_buckets=b)
                .to_pandas()
                .sort_values(["user_id", "rk"])
                .reset_index(drop=True)
            )

        pd.testing.assert_frame_equal(collect(4), collect(64))

    def test_user_event_gaps_rejects_non_power_of_two(self):
        from blockspider_ray.pipelines.windows import user_event_gaps

        with pytest.raises(AssertionError, match="power of two"):
            user_event_gaps(SF, n_buckets=12)

    def test_user_event_gaps_bucket_count_invariant(self):
        """The lag is computed inside one bucket's sorted run; 4 fat
        buckets and 64 thin ones must produce identical per-event
        gaps (a user's rows may never straddle buckets)."""
        from blockspider_ray.pipelines.windows import user_event_gaps

        def collect(b):
            return (
                user_event_gaps(SF, n_buckets=b)
                .to_pandas()
                .sort_values("event_id")
                .reset_index(drop=True)
            )

        pd.testing.assert_frame_equal(collect(4), collect(64))

    def test_token_postings_rejects_non_power_of_two(self):
        from blockspider_ray.pipelines.textstats import token_postings

        with pytest.raises(AssertionError, match="power of two"):
            token_postings(SF, n_buckets=12)

    def test_token_postings_bucket_count_invariant(self):
        """A term's postings are assembled inside one bucket; the hash
        dispatch width must not change any posting list."""
        from blockspider_ray.pipelines.textstats import token_postings

        def collect(b):
            return (
                token_postings(SF, n_buckets=b)
                .to_pandas()
                .sort_values("token")
                .reset_index(drop=True)
            )

        pd.testing.assert_frame_equal(collect(4), collect(64))

    def test_interval_join_rejects_non_power_of_two(self):
        from blockspider_ray.pipelines.relational import interval_join_events

        with pytest.raises(ValueError, match="power of two"):
            interval_join_events(SF, n_buckets=12)

    def test_pack_sequences_range_count_invariant(self):
        """The prefix scan must be a pure partitioning choice: 2 fat
        ranges and 64 thin ranges yield identical running totals."""
        from blockspider_ray.pipelines.corpus import pack_sequences

        def collect(n):
            return (
                pack_sequences(SF, n_ranges=n)
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )

        pd.testing.assert_frame_equal(collect(2), collect(64))

    def test_sessionize_bucket_count_invariant(self):
        """The bucketed run-scan (hash(user) % B + lexsort + vectorized
        gap scan, VERDICT r4 item 2) must be a pure dispatch choice: a
        tiny B (many users per bucket) and a large B (few per bucket)
        yield identical sessions."""
        from blockspider_ray.pipelines.windows import sessionize

        a = sessionize(SF, n_buckets=4)
        b = sessionize(SF, n_buckets=64)
        pd.testing.assert_frame_equal(a, b)


def _union_find_oracle(pairs: pd.DataFrame) -> pd.DataFrame:
    """Single-process union-find reference for connected_components."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(parent)
    return pd.DataFrame(
        {"doc_id": pd.Series(nodes, dtype="int64"),
         "cluster_id": pd.Series([find(n) for n in nodes], dtype="int64")}
    )


class TestClusterResolution:
    """connected_components (pipelines/clusters.py): the distributed
    hash-to-min loop vs a single-process union-find oracle."""

    def test_miner_pairs_match_union_find(self):
        """Cluster resolution over each miner's real tiny-fixture pair
        list equals union-find (pairs are NOT transitive-closed, so this
        exercises real multi-hop merging)."""
        from blockspider_ray.pipelines.clusters import connected_components
        from blockspider_ray.pipelines.dedup import (
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
            simhash_near_dups,
        )

        import ray.data as rd

        for i, miner in enumerate((ngram_jaccard_pairs, minhash_lsh_pairs, simhash_near_dups)):
            pairs = miner(SF)
            got = connected_components(pairs)  # frame input -> local path
            want = _union_find_oracle(pairs)
            pd.testing.assert_frame_equal(got, want, check_dtype=False)
            assert len(got)  # the fixture does contain near-dups
            if i == 0:
                # Dataset input pins the DISTRIBUTED FastSV loop (the
                # spilled-pairs scale path) against the same oracle
                got_d = connected_components(rd.from_pandas(pairs[["doc_a", "doc_b"]]))
                pd.testing.assert_frame_equal(got_d, want, check_dtype=False)

    def test_embedding_method(self):
        """near_dup_clusters(method='embedding') resolves the vector
        pair miner's frame (vec_a/vec_b endpoints) identically."""
        from blockspider_ray.pipelines.clusters import near_dup_clusters
        from blockspider_ray.pipelines.similarity import embedding_near_dup_pairs

        got = near_dup_clusters(SF, method="embedding")
        pairs = embedding_near_dup_pairs(SF).rename(
            columns={"vec_a": "doc_a", "vec_b": "doc_b"}
        )
        want = _union_find_oracle(pairs)
        want["is_canonical"] = (want["doc_id"] == want["cluster_id"]).astype("int64")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert len(got)

    def test_planted_clusters_10x(self):
        """10x-scale planted structure: 64-node CHAINS (worst-case
        diameter — pins the pointer-jump's logarithmic convergence well
        under max_iters), cliques, and stars, ids scattered by a seeded
        permutation. Exact equality with union-find."""
        from blockspider_ray.pipelines.clusters import connected_components

        rng = np.random.default_rng(11)
        rows = []
        nid = 0
        for _ in range(20):  # chains of 64 (diameter 63)
            ch = np.arange(nid, nid + 64)
            nid += 64
            rows += list(zip(ch[:-1], ch[1:]))
        for _ in range(60):  # cliques of 8
            cl = np.arange(nid, nid + 8)
            nid += 8
            rows += [(cl[i], cl[j]) for i in range(8) for j in range(i + 1, 8)]
        for _ in range(60):  # stars of 12
            st = np.arange(nid, nid + 12)
            nid += 12
            rows += [(st[0], x) for x in st[1:]]
        ids = rng.permutation(nid * 7)  # scatter ids (non-contiguous)
        pairs = pd.DataFrame(
            {
                "doc_a": pd.Series([int(ids[a]) for a, b in rows], dtype="int64"),
                "doc_b": pd.Series([int(ids[b]) for a, b in rows], dtype="int64"),
            }
        )
        import ray.data as rd

        want = _union_find_oracle(pairs)
        # frame input: driver-local vectorized path, exact equality
        got_local = connected_components(pairs)
        pd.testing.assert_frame_equal(got_local, want, check_dtype=False)
        # Dataset input: the DISTRIBUTED loop. Chains converge only via
        # iteration, so a low max_iters must fail...
        with pytest.raises(AssertionError):
            got_low = connected_components(rd.from_pandas(pairs), max_iters=1)
            pd.testing.assert_frame_equal(got_low, want, check_dtype=False)
        # ...and ~log2(63)+slack rounds must converge exactly
        got = connected_components(rd.from_pandas(pairs), max_iters=16)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert got["cluster_id"].nunique() == 140

    def test_empty_pairs(self):
        from blockspider_ray.pipelines.clusters import connected_components

        out = connected_components(pd.DataFrame({"doc_a": [], "doc_b": []}))
        assert list(out.columns) == ["doc_id", "cluster_id"] and len(out) == 0

    def test_corpus_prep_drops_noncanonical_near_dups(self, tmp_path_factory):
        """corpus_prep(near_dup_threshold=...): planted near-dup (NOT
        exact-dup) texts in a synthetic crawl log collapse to one
        canonical doc per cluster; distinct texts all survive."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.corpus import corpus_prep

        base = [
            "the quick brown fox jumps over the lazy dog near the river bank today",
            "completely different content about distributed data processing engines and arrow batches",
            "a third unrelated document discussing crawl frontiers checkpoints and politeness quotas",
        ]
        texts, urls = [], []
        for i, b in enumerate(base):
            texts.append(b)
            urls.append(f"http://h{i}.test/orig")
            for v in range(3):  # near-dups: one token appended (J >> 0.5)
                texts.append(b + f" v{v}")
                urls.append(f"http://h{i}.test/dup{v}")
        work = str(tmp_path_factory.mktemp("ndcorpus"))
        d = f"{work}/out/crawl_log/round=0"
        os.makedirs(d)
        n = len(texts)
        pq.write_table(
            pa.table(
                {
                    "round": pa.array([0] * n, pa.int64()),
                    "seq": pa.array(list(range(n)), pa.int64()),
                    "host": pa.array(["h.test"] * n, pa.string()),
                    "url": pa.array(urls, pa.string()),
                    "status": pa.array(["ACCEPTED"] * n, pa.string()),
                    "n_links": pa.array([1] * n, pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "version": pa.array([1] * n, pa.int32()),
                }
            ),
            f"{d}/part-0.parquet",
        )
        res = corpus_prep(
            f"{work}/out", None, f"{work}/corpus",
            min_quality=0.0, min_tokens=1, near_dup_threshold=0.5,
        )
        # 3 clusters of 4 near-dups -> 3 canonical docs kept, 9 dropped
        assert res["near_dups_dropped"] == 9
        assert res["kept"] == 3
        # without the near-dup pass every doc survives (no exact dups)
        res2 = corpus_prep(
            f"{work}/out", None, f"{work}/corpus2", min_quality=0.0, min_tokens=1
        )
        assert res2["kept"] == n and res2["near_dups_dropped"] == 0


class TestDedupSemantics:
    def test_minhash_subset_of_exact_pairs(self, ddb):
        """minhash_lsh_pairs is probabilistic (16x4 banding), so it is
        NOT held to exact equality with the all-pairs SQL — that held in
        round 2 only by data luck. The sound contract, valid for ANY
        fixture/seed: the verify stage recomputes true Jaccard, so every
        emitted pair must appear in the exact all-pairs set (no df cut)
        with the identical jaccard value."""
        import __ray_entry__ as em
        from blockspider_ray.pipelines.dedup import minhash_lsh_pairs

        exact_sql = r"""
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
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            )
            SELECT doc_a::BIGINT AS doc_a, doc_b::BIGINT AS doc_b,
                   ROUND(c / (sa.n + sb.n - c), 4) AS jaccard
            FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
            WHERE ROUND(c / (sa.n + sb.n - c), 4) >= 0.5
        """
        want = ddb.sql(exact_sql).df()
        exact = {(int(a), int(b)): float(j) for a, b, j in want[["doc_a", "doc_b", "jaccard"]].values}
        got = minhash_lsh_pairs(SF, threshold=0.5)
        assert len(got) > 0, "fixture should contain near-dup pairs"
        for a, b, j in got[["doc_a", "doc_b", "jaccard"]].values:
            key = (int(a), int(b))
            assert key in exact, f"minhash emitted a pair not in the exact set: {key}"
            assert abs(float(j) - exact[key]) < 1e-9, (key, j, exact[key])

    def test_minhash_finds_planted_near_dups(self, tmp_path):
        """Plant near-duplicates into a private documents table and check
        the MinHash-LSH pipeline finds exactly those pairs."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.dedup import minhash_lsh_pairs

        rng = np.random.default_rng(9)
        words = [f"w{i}" for i in range(500)]
        texts = [" ".join(rng.choice(words, size=80)) for _ in range(40)]
        # docs 100/101 near-dup of 0 (drop/replace a few words); 102 = exact dup of 1
        t0 = texts[0].split()
        t0_var = t0[:70] + ["x1", "x2", "x3"] + t0[73:]
        docs = texts + [" ".join(t0_var), " ".join(t0[:78]), texts[1]]
        ids = list(range(40)) + [100, 101, 102]
        d = str(tmp_path)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(docs, pa.string())}),
            f"{d}/documents.parquet",
        )
        out = minhash_lsh_pairs(d, threshold=0.5)
        pairs = set(map(tuple, out[["doc_a", "doc_b"]].values))
        assert (0, 100) in pairs
        assert (0, 101) in pairs
        assert (1, 102) in pairs
        # no false positives among the independent random docs
        for a, b in pairs:
            assert a in (0, 1, 100, 101) or b in (100, 101, 102)

    def test_near_dup_pipelines_scale_10x(self, tmp_path):
        """~10x the sf0.001 doc count through BOTH distributed near-dup
        pipelines. simhash output is checked for EXACT equality with a
        brute-force all-pairs reference of the documented semantics
        (hamming<=6 AND >=1 exact shared 16-bit quarter — the quarter
        blocking is lossless only for hamming<=3, pigeonhole); minhash
        must find every planted near-dup pair. Only pair frames reach
        the driver (VERDICT round-1 done-criterion)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.functions import text as tx
        from blockspider_ray.pipelines.dedup import minhash_lsh_pairs, simhash_near_dups

        rng = np.random.default_rng(23)
        words = [f"w{i}" for i in range(2000)]
        n = 400
        texts = [" ".join(rng.choice(words, size=100)) for _ in range(n)]
        ids = list(range(n))
        docs = list(texts)
        planted = []
        for k in range(10):
            src_i = k * 7
            toks = texts[src_i].split()
            toks[50] = f"zz{k}"
            docs.append(" ".join(toks))
            ids.append(1000 + k)
            planted.append((src_i, 1000 + k))
        d = str(tmp_path)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(docs, pa.string())}),
            f"{d}/documents.parquet",
        )

        out_m = minhash_lsh_pairs(d, threshold=0.5)
        pairs_m = set(map(tuple, out_m[["doc_a", "doc_b"]].values))
        for p in planted:
            assert p in pairs_m, p

        out_s = simhash_near_dups(d, max_hamming=6)
        got = set(map(tuple, out_s[["doc_a", "doc_b", "hamming"]].values))
        # brute-force reference over all pairs
        sh = tx.simhash64(docs)
        idarr = np.array(ids, dtype=np.int64)
        want = set()
        for i in range(len(docs)):
            x = sh[i] ^ sh[i + 1 :]
            dist = tx.hamming64(np.full(len(docs) - i - 1, sh[i], dtype=np.uint64), sh[i + 1 :])
            shares_q = np.zeros(len(x), dtype=bool)
            for q in range(4):
                shares_q |= ((x >> np.uint64(16 * q)) & np.uint64(0xFFFF)) == 0
            for j in np.flatnonzero((dist <= 6) & shares_q):
                a, b = sorted((int(idarr[i]), int(idarr[i + 1 + j])))
                want.add((a, b, int(dist[j])))
        assert got == want

    def test_simhash_blocking_depth_config(self, tmp_path):
        """Deeper blocking (blocks=4, match_blocks=2: 6 tables keyed on
        32-bit block pairs — the 10^10-doc bucket-size knob) against a
        brute-force reference of its documented semantics: hamming<=h
        AND >=1 of the C(4,2) block-pairs exactly equal. Lossless for
        hamming<=2 by pigeonhole, so with max_hamming=2 the output must
        equal the UNBLOCKED brute force too."""
        import itertools

        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.functions import text as tx
        from blockspider_ray.pipelines.dedup import simhash_near_dups

        rng = np.random.default_rng(31)
        words = [f"w{i}" for i in range(1500)]
        texts = [" ".join(rng.choice(words, size=80)) for _ in range(200)]
        ids = list(range(200))
        for k in range(8):  # near-identical planted pairs (tiny edits)
            toks = texts[k * 11].split()
            toks[40] = f"q{k}"
            texts.append(" ".join(toks))
            ids.append(2000 + k)
        d = str(tmp_path)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}),
            f"{d}/documents.parquet",
        )

        sh = tx.simhash64(texts)
        idarr = np.array(ids, dtype=np.int64)
        combos = list(itertools.combinations(range(4), 2))
        masks = [np.uint64(sum(0xFFFF << (16 * b) for b in c)) for c in combos]

        for h in (2, 6):
            out = simhash_near_dups(d, max_hamming=h, blocks=4, match_blocks=2)
            got = set(map(tuple, out[["doc_a", "doc_b", "hamming"]].values))
            want, want_unblocked = set(), set()
            for i in range(len(texts)):
                x = sh[i] ^ sh[i + 1 :]
                dist = tx.hamming64(np.full(len(x), sh[i], dtype=np.uint64), sh[i + 1 :])
                shares = np.zeros(len(x), dtype=bool)
                for m in masks:
                    shares |= (x & m) == 0
                for j in np.flatnonzero((dist <= h) & shares):
                    a, b = sorted((int(idarr[i]), int(idarr[i + 1 + j])))
                    want.add((a, b, int(dist[j])))
                for j in np.flatnonzero(dist <= h):
                    a, b = sorted((int(idarr[i]), int(idarr[i + 1 + j])))
                    want_unblocked.add((a, b, int(dist[j])))
            assert got == want, f"max_hamming={h}"
            if h == 2:  # pigeonhole losslessness: blocking loses nothing
                assert got == want_unblocked

    def test_exact_dedup_keeps_min_doc_id(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.dedup import exact_dedup

        d = str(tmp_path)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([5, 3, 9, 7], pa.int64()),
                    "text": pa.array(["a  b c", "a b c", "unique", "a b  c "], pa.string()),
                }
            ),
            f"{d}/documents.parquet",
        )
        kept = sorted(exact_dedup(d).to_pandas()["doc_id"])
        assert kept == [3, 9]  # whitespace-normalized dups collapse to min id

    def test_ngram_df_ceiling_bounds_hot_shingle(self, tmp_path):
        """Planted boilerplate: 1500 otherwise-random docs end with the
        SAME 5 words, so one shingle has df=1500. Without the prefix-
        filtering df ceiling that single group would expand to ~1.1M
        pair rows; with it the query completes with bounded group output
        and still finds the genuinely near-duplicate planted pair. The
        result must equal the SQL oracle (which applies the same cut)."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        import __ray_entry__ as em
        from blockspider_ray.pipelines.dedup import ngram_jaccard_pairs

        rng = np.random.default_rng(31)
        words = [f"w{i}" for i in range(5000)]
        boiler = "cc0 cc1 cc2 cc3 cc4"
        n = 1500
        docs = [" ".join(rng.choice(words, size=60)) + " " + boiler for _ in range(n)]
        ids = list(range(n))
        # one true near-dup pair: doc 2000 = doc 0 with one word changed
        toks = docs[0].split()
        toks[30] = "zzz"
        docs.append(" ".join(toks))
        ids.append(2000)
        d = str(tmp_path)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(docs, pa.string())}),
            f"{d}/documents.parquet",
        )
        out = ngram_jaccard_pairs(d, threshold=0.5)
        pairs = set(map(tuple, out[["doc_a", "doc_b"]].values))
        assert (0, 2000) in pairs
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
        want = con.sql(em.oracle_sql()["ngram_jaccard_pairs"]).df()
        want_pairs = set(map(tuple, want[["doc_a", "doc_b"]].values.astype(np.int64)))
        assert pairs == want_pairs

    def test_near_dup_pipelines_skip_empty_docs(self, tmp_path):
        """Zero-shingle (empty/whitespace) docs emit no band rows and no
        shingle rows: no pipeline may pair them (the oracle's
        no-shingles-no-pairs semantics), even though their empty-set
        minhash signatures are identical constants."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

        d = str(tmp_path)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                    "text": pa.array(["", "   ", "\n\t", "real text here words", "real text here words"], pa.string()),
                }
            ),
            f"{d}/documents.parquet",
        )
        out_m = minhash_lsh_pairs(d, threshold=0.5)
        assert set(map(tuple, out_m[["doc_a", "doc_b"]].values)) == {(4, 5)}
        out_n = ngram_jaccard_pairs(d, threshold=0.5)
        assert set(map(tuple, out_n[["doc_a", "doc_b"]].values)) == {(4, 5)}

    def test_line_dedup_planted_boilerplate(self, tmp_path):
        """The sf corpora are single-line docs with no cross-doc line
        repeats, so the SWEEP oracle only pins the identity path; this
        plants multi-line docs with real boilerplate (a banner in every
        doc, a footer in half, an EMPTY line in 3 docs) and pins the
        removal path against the same DuckDB oracle SQL over the
        planted table."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        import __ray_entry__ as em
        from blockspider_ray.pipelines.dedup import line_dedup

        rng = np.random.default_rng(11)
        words = np.array(["alpha", "beta", "gamma", "delta", "epsilon", "zeta"])
        texts = []
        for i in range(60):
            lines = ["COOKIE BANNER ACCEPT ALL"]  # in every doc -> removed
            lines += [
                " ".join(rng.choice(words, size=5)) + f" uniq{i}_{j}" for j in range(3)
            ]
            if i % 2 == 0:
                lines.append("footer (c) example")  # in 30 docs -> removed
            if i % 20 == 0:
                lines.append("")  # empty line in 3 docs -> removed too
            texts.append("\n".join(lines))
        d = str(tmp_path)
        pq.write_table(
            pa.table({"doc_id": pa.array(range(60), pa.int64()), "text": pa.array(texts)}),
            f"{d}/documents.parquet",
        )

        got = line_dedup(d)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
        want = (
            con.sql(em.oracle_sql()["line_dedup"]).df().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert (got["n_removed_lines"] >= 1).all()  # the banner is gone everywhere
        assert got["n_removed_lines"].max() == 3  # banner + footer + empty line
        assert not got["text_clean"].str.contains("COOKIE BANNER").any()
        assert got["text_clean"].str.contains("uniq").all()  # unique body kept

    def test_incremental_dedup_planted_and_idempotent(self, tmp_path):
        """The sf corpora have no cross-parity duplicates, so the SWEEP
        oracle only pins the no-dup path; this plants a table where
        every third odd doc duplicates an even doc (cross-shard dup ->
        dropped by the index probe) and two odd docs duplicate EACH
        OTHER (within-shard dup -> first wins), pins against the same
        DuckDB oracle SQL, then pins the operational contract:
        update_index=True appends survivors so a re-run of the same
        shard returns 0 rows, and the index layout is hash-partitioned
        hive directories the probe opens one-of."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        import __ray_entry__ as em
        from blockspider_ray.pipelines.dedup import (
            dedup_index_build,
            exact_dedup_incremental,
        )

        texts, ids = [], []
        for i in range(60):
            ids.append(i)
            if i % 2 == 1 and i % 3 == 0:
                texts.append(f"shared corpus text {i - 1}")  # dup of even doc i-1
            elif i in (41, 43):
                texts.append("twin odd document")  # within-shard dup pair
            else:
                texts.append(f"shared corpus text {i}" if i % 2 == 0 else f"fresh text {i}")
        d = str(tmp_path / "data")
        os.makedirs(d)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}),
            f"{d}/documents.parquet",
        )
        idx = str(tmp_path / "idx")
        n_fp = dedup_index_build(d, idx, n_parts=16)
        assert n_fp == 30  # even docs are all distinct

        got = (
            exact_dedup_incremental(d, idx)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
        want = (
            con.sql(em.oracle_sql()["exact_dedup_incremental"])
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        kept = set(got["doc_id"])
        assert 41 in kept and 43 not in kept  # within-shard first-wins
        assert not any(i % 3 == 0 and i % 2 == 1 for i in kept)  # cross-shard dups dropped

        # hive layout: multiple part= dirs plus the meta sidecar
        parts = [p for p in os.listdir(idx) if p.startswith("part=")]
        assert len(parts) >= 2 and os.path.exists(f"{idx}/meta.json")

        # idempotence: append survivors, re-run returns nothing
        exact_dedup_incremental(d, idx, update_index=True)
        assert exact_dedup_incremental(d, idx).count() == 0

    def test_driver_frame_cap_raises(self, tmp_path):
        """The duplicate-bounded frames these pipelines pull to the
        driver (candidate pairs / kept shingles / decontaminate eval
        set) are guarded: past ``max_driver_rows`` they raise with the
        parquet-spill escape hatch instead of OOM-ing the driver
        (VERDICT r3 item 2). A dup-heavy planted table exceeds a cap of
        2 in every pipeline; an ample cap keeps them all green."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.dedup import (
            decontaminate,
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
        )

        rng = np.random.default_rng(17)
        words = [f"w{i}" for i in range(300)]
        base = " ".join(rng.choice(words, size=60))
        texts = [" ".join(rng.choice(words, size=60)) for _ in range(10)] + [base] * 5
        ids = list(range(len(texts)))
        d = str(tmp_path)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}),
            f"{d}/documents.parquet",
        )
        with pytest.raises(RuntimeError, match="driver-collection cap"):
            minhash_lsh_pairs(d, threshold=0.5, max_driver_rows=2)
        with pytest.raises(RuntimeError, match="driver-collection cap"):
            ngram_jaccard_pairs(d, threshold=0.5, max_driver_rows=2)
        with pytest.raises(RuntimeError, match="driver-collection cap"):
            decontaminate(d, every=2, max_driver_rows=2).count()
        # ample caps: all three still produce their normal results
        out_m = minhash_lsh_pairs(d, threshold=0.5, max_driver_rows=10_000)
        pairs = set(map(tuple, out_m[["doc_a", "doc_b"]].values))
        assert {(10, 11), (10, 12), (11, 12)} <= pairs
        out_n = ngram_jaccard_pairs(d, threshold=0.5, max_driver_rows=10_000)
        assert {(10, 11), (13, 14)} <= set(map(tuple, out_n[["doc_a", "doc_b"]].values))


class TestSimilaritySemantics:
    def test_lsh_recall_vs_brute_force(self):
        from blockspider_ray.pipelines.similarity import knn_cosine, knn_lsh

        exact = knn_cosine(SF)
        approx = knn_lsh(SF)
        # per query, ANN should recover a decent fraction of the true top-5
        recalls = []
        for qid in exact["qid"].unique():
            e = set(exact[exact["qid"] == qid]["vec_id"])
            a = set(approx[approx["qid"] == qid]["vec_id"])
            recalls.append(len(e & a) / len(e))
        # the fixture embeddings are uniform-random (nearest cosine ~0.35,
        # i.e. no real cluster structure), the worst case for LSH; the
        # defaults are tuned for ~0.6 expected recall there
        assert np.mean(recalls) >= 0.45, f"ANN recall too low: {recalls}"

    def test_ivf_recall_and_sim_exactness(self):
        """IVF-flat ANN: candidates are scored with TRUE cosine, so every
        returned (qid, vec_id) that brute force also returns must carry
        the identical sim; recall is bounded below (uniform-random
        embeddings are IVF's worst case too — centroids carve a nearly
        isotropic ball, hence the conservative floor)."""
        from blockspider_ray.pipelines.similarity import knn_cosine, knn_ivf

        exact = knn_cosine(SF)
        approx = knn_ivf(SF)
        ex = {(r.qid, r.vec_id): r.sim for r in exact.itertuples()}
        ap = {(r.qid, r.vec_id): r.sim for r in approx.itertuples()}
        for k in set(ex) & set(ap):
            assert abs(ex[k] - ap[k]) < 1e-9
        recalls = []
        for qid in exact["qid"].unique():
            e = {v for (q, v) in ex if q == qid}
            a = {v for (q, v) in ap if q == qid}
            recalls.append(len(e & a) / len(e))
        assert np.mean(recalls) >= 0.5, f"IVF recall too low: {recalls}"

    def test_ivfpq_recall_and_sim_exactness(self):
        """IVF-PQ: the ADC shortlist is reranked with TRUE cosine, so
        every returned (qid, vec_id) that brute force also returns must
        carry the identical sim; recall floor matches IVF-flat's (on the
        fixture the PQ shortlist loses nothing vs flat — the misses are
        coarse-probe misses shared by both)."""
        from blockspider_ray.pipelines.similarity import knn_cosine, knn_ivfpq

        exact = knn_cosine(SF)
        approx = knn_ivfpq(SF)
        ex = {(r.qid, r.vec_id): r.sim for r in exact.itertuples()}
        ap = {(r.qid, r.vec_id): r.sim for r in approx.itertuples()}
        for key in set(ex) & set(ap):
            assert abs(ex[key] - ap[key]) < 1e-9
        recalls = []
        for qid in exact["qid"].unique():
            e = {v for (q, v) in ex if q == qid}
            a = {v for (q, v) in ap if q == qid}
            recalls.append(len(e & a) / len(e))
        assert np.mean(recalls) >= 0.5, f"IVF-PQ recall too low: {recalls}"

    def test_ivfpq_codes_reconstruct_nothing(self):
        """The ADC estimate must be computable from the uint8 codes and
        the query LUT alone — pin the encoder's shape/type contract and
        that ADC ranks a planted near-duplicate of the query above
        orthogonal noise (the property the shortlist pruning relies on)."""
        import numpy as np

        from blockspider_ray.pipelines.similarity import _pq_encode, _train_pq

        rng = np.random.default_rng(7)
        X = rng.normal(size=(512, 64))
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        books = _train_pq(X, m_sub=8, n_codes=32, iters=5)
        q = X[0] + rng.normal(scale=0.05, size=64)
        q /= np.linalg.norm(q)
        codes = _pq_encode(X, books)
        assert codes.dtype == np.uint8 and codes.shape == (512, 8)
        lut = np.einsum("md,mcd->mc", q.reshape(8, 8), books)
        est = lut[np.arange(8)[None, :], codes].sum(axis=1)
        # the near-dup of q must out-score ~everything under ADC
        assert est[0] >= np.quantile(est, 0.99)

    def test_ivf_persisted_index_matches_fused(self, tmp_path):
        """The build-once persisted index (ivf_build_index +
        knn_ivf_indexed) returns byte-identical results to the fused
        one-shot path with the same parameters, while reading ONLY the
        probed list partitions (n_probe < n_lists directories opened)."""
        import os

        from blockspider_ray.pipelines.similarity import (
            ivf_build_index,
            knn_ivf,
            knn_ivf_indexed,
        )

        idx = str(tmp_path / "ivf")
        ivf_build_index(SF, idx, n_lists=16)
        # layout: one hive directory per list + the centroid sidecar
        parts = sorted(d for d in os.listdir(idx) if d.startswith("list_id="))
        assert len(parts) >= 2 and os.path.exists(f"{idx}/centroids.parquet")

        fused = knn_ivf(SF, n_lists=16, n_probe=6)
        indexed = knn_ivf_indexed(SF, index_dir=idx, n_lists=16, n_probe=6)
        pd.testing.assert_frame_equal(indexed, fused)

        # rebuilding is not required on a second query (build-once)
        mtimes = {p: os.path.getmtime(f"{idx}/{p}") for p in parts}
        again = knn_ivf_indexed(SF, index_dir=idx, n_lists=16, n_probe=6)
        pd.testing.assert_frame_equal(again, fused)
        assert mtimes == {p: os.path.getmtime(f"{idx}/{p}") for p in parts}

    def test_ivfpq_persisted_index(self, tmp_path):
        """The persisted IVF-PQ serving path: the index stores ONLY
        uint8 codes (no embedding column — the 32x residence claim is a
        schema fact, not a docstring), queries reuse the build (mtimes
        unchanged, identical frames), every returned sim is the exact
        cosine (rerank reads true vectors), and recall vs brute force
        clears the fused path's floor."""
        import os

        import pyarrow.parquet as pq_

        from blockspider_ray.pipelines.similarity import (
            ivfpq_build_index,
            knn_cosine,
            knn_ivfpq_indexed,
        )

        idx = str(tmp_path / "ivfpq")
        ivfpq_build_index(SF, idx, n_lists=16)
        parts = sorted(d for d in os.listdir(idx) if d.startswith("list_id="))
        assert len(parts) >= 2
        assert os.path.exists(f"{idx}/centroids.parquet")
        assert os.path.exists(f"{idx}/books.parquet")
        part_file = next(
            f"{idx}/{parts[0]}/{f}"
            for f in sorted(os.listdir(f"{idx}/{parts[0]}"))
            if f.endswith(".parquet")
        )
        schema = pq_.read_schema(part_file)
        assert "embedding" not in schema.names  # codes-only residence
        assert schema.field("codes").type.value_type == "uint8"

        out = knn_ivfpq_indexed(SF, index_dir=idx, n_lists=16)
        exact = knn_cosine(SF)
        ex = {(r.qid, r.vec_id): r.sim for r in exact.itertuples()}
        ap = {(r.qid, r.vec_id): r.sim for r in out.itertuples()}
        for key in set(ex) & set(ap):
            assert abs(ex[key] - ap[key]) < 1e-9  # true-cosine rerank
        recalls = []
        for qid in exact["qid"].unique():
            e = {v for (q, v) in ex if q == qid}
            a = {v for (q, v) in ap if q == qid}
            recalls.append(len(e & a) / len(e))
        assert np.mean(recalls) >= 0.5, f"indexed IVF-PQ recall too low: {recalls}"

        mtimes = {p: os.path.getmtime(f"{idx}/{p}") for p in parts}
        again = knn_ivfpq_indexed(SF, index_dir=idx, n_lists=16)
        pd.testing.assert_frame_equal(again, out)
        assert mtimes == {p: os.path.getmtime(f"{idx}/{p}") for p in parts}

    def test_embedding_near_dup_lsh_subset_and_planted_recall(self, tmp_path):
        """embedding_near_dup_lsh is approximate, so no SQL oracle; the
        sound contract: every emitted pair appears in the exact all-pairs
        set with the identical sim (subset), and PLANTED near-identical
        vectors (cos >= 0.95 — the regime dedup actually targets, where
        hyperplane collision probability per table is high) are all
        recovered."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.similarity import (
            embedding_near_dup_lsh,
            embedding_near_dup_pairs,
        )

        rng = np.random.default_rng(41)
        n, dim = 300, 64
        m = rng.standard_normal((n, dim))
        ids = list(range(n))
        planted = []
        for k in range(10):  # tiny perturbations of existing vectors
            src = k * 13
            v = m[src] + 0.05 * rng.standard_normal(dim)
            m = np.vstack([m, v])
            ids.append(5000 + k)
            planted.append((src, 5000 + k))
        d = str(tmp_path)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array([row.astype(np.float32) for row in m], pa.list_(pa.float32())),
                    "label": pa.array(np.zeros(len(ids), np.int32), pa.int32()),
                }
            ),
            f"{d}/embeddings.parquet",
        )

        exact = embedding_near_dup_pairs(d, threshold=0.4)
        lsh = embedding_near_dup_lsh(d, threshold=0.4)
        epairs = {(a, b): s for a, b, s in exact[["vec_a", "vec_b", "sim"]].itertuples(index=False)}
        for a, b, s in lsh[["vec_a", "vec_b", "sim"]].itertuples(index=False):
            assert (a, b) in epairs and abs(epairs[(a, b)] - s) < 1e-9
        lpairs = set(zip(lsh["vec_a"], lsh["vec_b"]))
        for p in planted:
            assert p in lpairs, f"planted near-dup {p} missed"

    def test_semantic_dedup_soundness_and_planted_recall(self, tmp_path):
        """semantic_dedup (SemDeDup-style cluster-then-prune) has no SQL
        oracle (k-means blocking makes recall approximate); the sound
        contract: every emitted drop is a real exact-cosine near-dup of
        its kept representative (subset of the all-pairs frame, same
        rounded sim, kept_id < vec_id, no kept id is itself dropped) —
        and PLANTED near-identical vectors are all pruned with their
        source as the kept representative."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.similarity import (
            embedding_near_dup_pairs,
            semantic_dedup,
        )

        drops = semantic_dedup(SF, threshold=0.4)
        exact = embedding_near_dup_pairs(SF, threshold=0.4)
        epairs = {(a, b): s for a, b, s in exact[["vec_a", "vec_b", "sim"]].itertuples(index=False)}
        for v, kpt, s in drops[["vec_id", "kept_id", "sim"]].itertuples(index=False):
            assert kpt < v  # canonical representative is the smallest id
            assert (kpt, v) in epairs and abs(epairs[(kpt, v)] - s) < 1e-9
        assert not (set(drops["vec_id"]) & set(drops["kept_id"]))

        # planted near-identical vectors (cos ~0.999): each dropped, with
        # its source kept — the regime SemDeDup targets
        rng = np.random.default_rng(42)
        n, dim = 300, 64
        m = rng.standard_normal((n, dim))
        ids = list(range(n))
        planted = []
        for k in range(10):
            src = k * 13
            v = m[src] + 0.05 * rng.standard_normal(dim)
            m = np.vstack([m, v])
            ids.append(5000 + k)
            planted.append((src, 5000 + k))
        d = str(tmp_path)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array([row.astype(np.float32) for row in m], pa.list_(pa.float32())),
                    "label": pa.array(np.zeros(len(ids), np.int32), pa.int32()),
                }
            ),
            f"{d}/embeddings.parquet",
        )
        got = semantic_dedup(d, threshold=0.95)
        pruned = {(k, v) for v, k in got[["vec_id", "kept_id"]].itertuples(index=False)}
        for p in planted:
            assert p in pruned, f"planted semantic dup {p} not pruned"
        # random 64-d standard normals never reach cos 0.95: ONLY the
        # planted dups are pruned
        assert len(got) == len(planted)


class TestSketches:
    """hll_users_per_type is approximate by construction (no SQL
    oracle); the pins: relative error vs the exact SQL-oracled
    companion on the fixture, and exact+sketch agreement on planted
    10x cardinalities spanning the linear-counting and HLL regimes."""

    def test_hll_error_vs_exact_on_fixture(self):
        from blockspider_ray.pipelines.sketches import (
            distinct_users_per_type,
            hll_users_per_type,
        )

        exact = distinct_users_per_type(SF)
        est = hll_users_per_type(SF)
        j = exact.merge(est, on="event_type")
        assert len(j) == len(exact) > 0
        rel = (j["n_users_est"] - j["n_users"]).abs() / j["n_users"]
        assert (rel < 0.05).all(), j

    def test_hll_planted_cardinalities_10x(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.sketches import (
            distinct_users_per_type,
            hll_users_per_type,
        )

        rng = np.random.default_rng(23)
        planted = {"big": 30_000, "mid": 1_000, "tiny": 37}
        et, uid = [], []
        for name, n in planted.items():
            ids = np.arange(n, dtype=np.int64) * 7 + {"big": 1, "mid": 2, "tiny": 3}[name]
            ids = np.concatenate([ids, ids])  # every user twice
            et += [name] * len(ids)
            uid += ids.tolist()
        order = rng.permutation(len(uid))  # users span batches
        d = str(tmp_path)
        pq.write_table(
            pa.table(
                {
                    "event_type": pa.array(np.asarray(et, dtype=object)[order].tolist(), pa.string()),
                    "user_id": pa.array(np.asarray(uid, dtype=np.int64)[order], pa.int64()),
                }
            ),
            f"{d}/events.parquet",
        )
        exact = distinct_users_per_type(d).set_index("event_type")["n_users"]
        for name, n in planted.items():
            assert exact[name] == n  # duplicates across batches collapse
        est = hll_users_per_type(d).set_index("event_type")["n_users_est"]
        for name, n in planted.items():
            assert abs(est[name] - n) <= max(2, 0.05 * n), (name, est[name], n)

    def test_countmin_exact_on_fixture(self):
        """CM never undercounts; at w=8192 with the fixture's 31-token
        vocabulary there is no collision mass, so the estimates are
        EXACT — a deterministic equality pin, not a tolerance."""
        from blockspider_ray.pipelines.sketches import countmin_freq
        from blockspider_ray.pipelines.textstats import vocab_topk

        est = countmin_freq(SF)
        exact = vocab_topk(SF, 50)
        j = est.merge(exact, on="token")
        assert len(j) == len(exact) > 0
        assert (j["est_n"] == j["n"]).all(), j[j["est_n"] != j["n"]]

    def test_countmin_planted_collisions(self, tmp_path):
        """Narrow width (w=64) against a 2000-token vocabulary forces
        collisions: every estimate must still be >= exact (the CM
        one-sided guarantee) and within the d-row min collision-mass
        ceiling 8*N/w."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.sketches import countmin_freq
        from blockspider_ray.pipelines.textstats import vocab_topk

        rng = np.random.default_rng(7)
        occ = np.repeat(np.arange(2000), np.arange(2000) + 1)  # token i occurs i+1 times
        toks = np.array([f"t{i:04d}" for i in range(2000)], dtype=object)[occ]
        rng.shuffle(toks)
        docs = [" ".join(toks[i : i + 100]) for i in range(0, len(toks), 100)]
        d = str(tmp_path)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(np.arange(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string()),
                }
            ),
            f"{d}/documents.parquet",
        )
        est = countmin_freq(d, w=64, k=50).set_index("token")["est_n"]
        exact = vocab_topk(d, 50).set_index("token")["n"]
        N = len(occ)
        assert sorted(est.index) == sorted(exact.index)
        over = est[exact.index] - exact
        assert (over >= 0).all(), over[over < 0]
        assert (over <= 8 * N / 64).all(), over.max()

    def test_value_quantiles_sketch_vs_duckdb(self, ddb):
        """DDSketch guarantee: every estimate within rel_err of the true
        quantile_disc value (2x slack for the rank-rounding seam)."""
        from blockspider_ray.pipelines.sketches import value_quantiles_sketch

        rel_err = 0.01
        est = value_quantiles_sketch(SF, rel_err=rel_err).set_index("event_type")
        want = ddb.sql(
            """
            SELECT event_type,
                   quantile_disc(value, 0.5) AS p50,
                   quantile_disc(value, 0.9) AS p90,
                   quantile_disc(value, 0.99) AS p99
            FROM events GROUP BY event_type
            """
        ).df().set_index("event_type")
        assert sorted(est.index) == sorted(want.index)
        for c in ("p50", "p90", "p99"):
            rel = (est[c] - want[c]).abs() / want[c]
            assert (rel <= 2 * rel_err).all(), (c, rel)

    def test_value_quantiles_sketch_rejects_non_positive(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.sketches import value_quantiles_sketch

        d = str(tmp_path)
        pq.write_table(
            pa.table(
                {
                    "event_type": pa.array(["a", "a"], pa.string()),
                    "value": pa.array([1.0, -2.0], pa.float64()),
                }
            ),
            f"{d}/events.parquet",
        )
        with pytest.raises(Exception, match="negative|mirrored"):
            value_quantiles_sketch(d)

    def test_value_quantiles_sketch_zero_bin(self, tmp_path):
        """Zeros land in the dedicated zero bin (sorts below every log
        bin): a zero-majority column gets p50 == 0.0 exactly while the
        tail quantiles still come from the log ladder."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.sketches import value_quantiles_sketch

        d = str(tmp_path)
        vals = [0.0] * 60 + [100.0] * 40
        pq.write_table(
            pa.table(
                {
                    "event_type": pa.array(["z"] * len(vals), pa.string()),
                    "value": pa.array(vals, pa.float64()),
                }
            ),
            f"{d}/events.parquet",
        )
        est = value_quantiles_sketch(d).set_index("event_type")
        assert est.loc["z", "p50"] == 0.0
        assert abs(est.loc["z", "p90"] - 100.0) / 100.0 <= 0.02

    def test_vocab_topk_sketch_interval_vs_exact(self, ddb):
        """Misra-Gries guarantee on the fixture: for every reported
        token, n_est <= true count <= n_est + err_bound."""
        from blockspider_ray.pipelines.sketches import vocab_topk_sketch

        est = vocab_topk_sketch(SF, k=50)
        assert (est["err_bound"] >= 0).all()
        bound = int(est["err_bound"].iloc[0])
        truth = ddb.sql(
            r"""
            SELECT tok AS token, COUNT(*)::BIGINT AS n FROM (
              SELECT unnest(regexp_split_to_array(text, '\s+')) AS tok
              FROM documents
            ) WHERE tok <> '' GROUP BY tok
            """
        ).df().set_index("token")["n"]
        for _, r in est.iterrows():
            t = truth[r["token"]]
            assert r["n_est"] <= t <= r["n_est"] + bound, (r["token"], r["n_est"], t, bound)

    def test_vocab_topk_sketch_planted_zipf_trimming(self, tmp_path):
        """m=8 on a long-tailed vocab forces real per-batch trimming;
        the planted heavy hitters tower over the bound so they MUST
        surface in order, and the interval must still hold."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.sketches import vocab_topk_sketch

        rng = np.random.default_rng(11)
        heavy = {"alpha": 5000, "beta": 3000, "gamma": 2000}
        toks = []
        for w, n in heavy.items():
            toks += [w] * n
        toks += [f"tail{i}" for i in range(4000)]  # 4000 singletons
        toks = list(rng.permutation(np.asarray(toks, dtype=object)))
        docs = [" ".join(toks[i : i + 50]) for i in range(0, len(toks), 50)]
        d = str(tmp_path)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string()),
                }
            ),
            f"{d}/documents.parquet",
        )
        est = vocab_topk_sketch(d, k=3, m=8)
        bound = int(est["err_bound"].iloc[0])
        assert bound > 0  # trimming actually happened
        assert list(est["token"]) == ["alpha", "beta", "gamma"]
        for w, n in heavy.items():
            e = int(est.set_index("token").loc[w, "n_est"])
            assert e <= n <= e + bound, (w, e, n, bound)

    def test_value_quantiles_sketch_planted_lognormal(self, tmp_path):
        """Heavy-tailed doubles (every value distinct — the regime where
        the exact compressed-distribution trick degenerates and the
        sketch is the only scale path) against numpy's exact rank."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.sketches import value_quantiles_sketch

        rng = np.random.default_rng(7)
        v = rng.lognormal(mean=2.0, sigma=1.5, size=50_000)
        d = str(tmp_path)
        pq.write_table(
            pa.table(
                {
                    "event_type": pa.array(["heavy"] * len(v), pa.string()),
                    "value": pa.array(v, pa.float64()),
                }
            ),
            f"{d}/events.parquet",
        )
        rel_err = 0.01
        est = value_quantiles_sketch(d, rel_err=rel_err).set_index("event_type")
        sv = np.sort(v)
        for q in (0.5, 0.9, 0.99):
            want = sv[max(int(np.ceil(q * len(sv))) - 1, 0)]
            got = est.loc["heavy", f"p{int(q * 100)}"]
            assert abs(got - want) / want <= 2 * rel_err, (q, got, want)


class TestShardExport:
    def test_resume_rewrites_only_missing_shards(self, tmp_path):
        """The resumable-output contract: a rerun after losing one
        shard's manifest rewrites THAT shard only (other shard dirs'
        file sets untouched), a complete export reruns as a no-op, and
        the union of shards equals the source exactly."""
        import json
        import os

        import pyarrow.dataset as pads
        import pyarrow.parquet as pq_

        from blockspider_ray.pipelines.corpus import write_corpus_shards

        out = str(tmp_path / "export")
        m1 = write_corpus_shards(SF, out, n_shards=8)
        assert len(m1) == 8 and m1["n_rows"].sum() > 0

        def listing():
            return {
                d: sorted(os.listdir(f"{out}/{d}"))
                for d in os.listdir(out)
                if d.startswith("shard=")
            }

        files1 = listing()
        # source accounting: union of shard rows == source table
        src = pq_.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
        got = pads.dataset(
            [f"{out}/{d}/{f}" for d, fs in files1.items() for f in fs]
        ).to_table(columns=["doc_id"])
        assert sorted(got["doc_id"].to_pylist()) == sorted(src["doc_id"].to_pylist())

        # no-op rerun: manifest equal, no file changes anywhere
        m2 = write_corpus_shards(SF, out, n_shards=8)
        pd.testing.assert_frame_equal(m2, m1)
        assert listing() == files1

        # lose shard 3's manifest (simulated crash mid-shard): rerun
        # must rewrite shard 3 and leave every other dir untouched
        os.remove(f"{out}/_manifest/shard-3.json")
        mtimes_other = {
            d: os.path.getmtime(f"{out}/{d}/{f}")
            for d, fs in files1.items()
            if d != "shard=3"
            for f in fs
        }
        m3 = write_corpus_shards(SF, out, n_shards=8)
        pd.testing.assert_frame_equal(m3, m1)
        assert {
            d: os.path.getmtime(f"{out}/{d}/{f}")
            for d, fs in listing().items()
            if d != "shard=3"
            for f in fs
        } == mtimes_other
        with open(f"{out}/_manifest/shard-3.json") as f:
            assert json.load(f)["n_rows"] == int(m1.loc[m1["shard"] == 3, "n_rows"].iloc[0])

    def test_rejects_non_power_of_two(self, tmp_path):
        from blockspider_ray.pipelines.corpus import write_corpus_shards

        with pytest.raises(AssertionError, match="power of two"):
            write_corpus_shards(SF, str(tmp_path / "x"), n_shards=12)


class TestShuffleEpoch:
    def test_permutation_seed_and_range_invariance(self):
        """epoch_rank must be an exact permutation of 0..n-1, identical
        across range widths (the partitioning is a dispatch choice, not
        a semantic one), and a different seed must produce a different
        order while staying a permutation."""
        from blockspider_ray.pipelines.corpus import shuffle_epoch

        def collect(**kw):
            return (
                shuffle_epoch(SF, **kw)
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )

        a = collect(n_ranges=2)
        b = collect(n_ranges=64)
        pd.testing.assert_frame_equal(a, b)
        n = len(a)
        assert sorted(a["epoch_rank"].tolist()) == list(range(n))
        c = collect(seed=2)
        assert sorted(c["epoch_rank"].tolist()) == list(range(n))
        assert (a["epoch_rank"] != c["epoch_rank"]).any()


class TestTextSemantics:
    # the testdata documents are synthetic keyword soup, so lang-id is
    # exercised on crafted natural-language samples instead
    def test_detect_lang_on_real_samples(self):
        from blockspider_ray.functions.text import detect_lang

        assert detect_lang("the cat sat on the mat and it was happy with the state of the world") == "en"
        assert detect_lang("der Hund ist nicht in der Küche und die Katze ist mit dem Ball") == "de"
        assert detect_lang("le chat est dans la maison et les enfants sont dans le jardin") == "fr"
        assert detect_lang("el perro es grande y la casa es pequeña en la ciudad") == "es"
        assert detect_lang("今天天气很好我们一起去公园散步吧然后吃饭") == "zh"
        assert detect_lang("") == "und"
        assert detect_lang("zzz qqq xxx www") == "und"

    def test_langid_pipeline_deterministic(self):
        import __ray_entry__ as em

        a = _to_df(em.queries()["langid"](SF)).sort_values("doc_id").reset_index(drop=True)
        b = _to_df(em.queries()["langid"](SF)).sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_compression_ratio_planted(self, tmp_path):
        """Planted entropy extremes: pure repetition compresses far
        below the keep floor, cryptographic-noise text sits above the
        fluent band's ceiling, natural-ish text lands inside it — and
        ratios must be integer-arithmetic reproducible run-to-run."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.textstats import compression_ratio

        rng = np.random.default_rng(3)
        noise = " ".join(
            "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz0123456789"), size=8))
            for _ in range(60)
        )
        words = [f"w{i}x{i % 7}" for i in range(2000)]
        docs = {
            0: "the quick brown fox jumps over the lazy dog near the quiet river bank",
            1: "spam " * 400,  # pure repetition -> ratio ~0.01
            2: noise,  # high entropy -> ratio ~0.7
            3: " ".join(rng.choice(words, size=150)),  # varied vocab -> ~0.4
        }
        d = str(tmp_path)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values()), pa.string()),
                }
            ),
            f"{d}/documents.parquet",
        )
        out = (
            compression_ratio(d).to_pandas().set_index("doc_id").sort_index()
        )
        assert out.loc[1, "ratio"] < 0.25 and out.loc[1, "keep"] == 0
        assert out.loc[2, "ratio"] > out.loc[3, "ratio"]
        assert out.loc[3, "keep"] == 1
        assert (out["n_compressed"] > 0).all()
        out2 = (
            compression_ratio(d).to_pandas().set_index("doc_id").sort_index()
        )
        pd.testing.assert_frame_equal(out, out2)


class TestPagerank:
    def test_matches_dense_power_iteration(self):
        """The two-shuffle-per-iteration distributed PageRank must equal
        a dense numpy power iteration with identical teleport + dangling
        handling on the same host graph."""
        import numpy as np

        from blockspider_ray import gen
        from blockspider_ray.pipelines.graph import host_graph, pagerank

        pages_dir, _ = gen.ensure_fixture("tiny")
        edges_df = host_graph(pages_dir).to_pandas()
        got = (
            pagerank(host_graph(pages_dir), k=8)
            .to_pandas()
            .sort_values("host")
            .reset_index(drop=True)
        )

        hosts = sorted(set(edges_df["src"]) | set(edges_df["dst"]))
        idx = {h: i for i, h in enumerate(hosts)}
        n = len(hosts)
        W = np.zeros((n, n))
        for s_, d_, w_ in edges_df.itertuples(index=False):
            W[idx[s_], idx[d_]] += w_
        out = W.sum(axis=1)
        P = np.divide(W, out[:, None], where=out[:, None] > 0)
        r = np.full(n, 1.0 / n)
        d = 0.85
        for _ in range(8):
            dang = r[out == 0].sum()
            r = (1 - d) / n + d * (P.T @ r + dang / n)

        assert got["host"].tolist() == hosts
        assert np.allclose(got["r"].to_numpy(), r, atol=1e-9)
        assert abs(got["r"].sum() - 1.0) < 1e-9
        assert n > 3  # the tiny web is a real multi-host graph


class TestTriangleCount:
    @staticmethod
    def _tri(pairs, **kw):
        import ray.data as rd

        from blockspider_ray.pipelines.graph import triangle_count

        df = pd.DataFrame(pairs, columns=["src", "dst"])
        df["w"] = 1.0
        return int(triangle_count(rd.from_pandas(df), **kw)["n_triangles"][0])

    def test_planted_graphs(self):
        path = [(f"h{i}", f"h{i+1}") for i in range(10)]
        assert self._tri(path) == 0
        k5 = [(f"n{i}", f"n{j}") for i in range(5) for j in range(i + 1, 5)]
        assert self._tri(k5) == 10
        # bowtie (2 triangles at a shared apex) + a reverse-duplicate
        # edge and a self-loop, which canonicalization must absorb
        bow = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("d", "e"),
               ("e", "a"), ("b", "a"), ("a", "a")]
        assert self._tri(bow) == 2

    def test_rejects_non_power_of_two(self):
        with pytest.raises(AssertionError, match="power of two"):
            self._tri([("a", "b")], n_buckets=12)

    def test_bucket_count_invariant(self):
        k6 = [(f"n{i}", f"n{j}") for i in range(6) for j in range(i + 1, 6)]
        assert self._tri(k6, n_buckets=4) == self._tri(k6, n_buckets=64) == 20

    def test_host_graph_matches_dense_reference(self):
        """Degree-oriented wedge closure must equal trace(A^3)/6 on the
        tiny fixture's (simple, undirected) host graph."""
        from blockspider_ray import gen
        from blockspider_ray.pipelines.graph import host_graph, triangle_count

        pages_dir, _ = gen.ensure_fixture("tiny")
        e = host_graph(pages_dir).to_pandas()
        hosts = sorted(set(e["src"]) | set(e["dst"]))
        idx = {h: i for i, h in enumerate(hosts)}
        A = np.zeros((len(hosts), len(hosts)), dtype=np.int64)
        for s_, d_ in zip(e["src"], e["dst"]):
            if s_ != d_:
                A[idx[s_], idx[d_]] = 1
                A[idx[d_], idx[s_]] = 1
        want = int(np.trace(A @ A @ A) // 6)
        got = int(triangle_count(host_graph(pages_dir))["n_triangles"][0])
        assert got == want and got > 0


class TestRepeatedSpans:
    def test_planted_span_multiplicity(self, tmp_path):
        """Hand-computed positional 5-gram multiplicities: a cyclic
        within-doc repeat counts (multiplicity, not distinct), a
        cross-doc shared prefix marks one position in EACH doc, short
        docs collapse to one full-text span that can itself be repeated."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.dedup import repeated_spans

        docs = [
            "u0 u1 u2 u3 u4 u5 u6 u7 u8 u9",   # all-unique: (6, 0)
            "c0 c1 c2 c3 c4 c0 c1 c2 c3 c4",   # cyclic self-repeat: (6, 2)
            "d0 d1 d2 d3 d4 x0 x1 x2 x3 x4",   # shares prefix with doc 3: (6, 1)
            "d0 d1 d2 d3 d4 y0 y1 y2 y3 y4",   # (6, 1)
            "s0 s1",                            # short twin of doc 5: (1, 1)
            "s0 s1",                            # (1, 1)
        ]
        d = str(tmp_path)
        pq.write_table(
            pa.table({"doc_id": pa.array(range(6), pa.int64()), "text": pa.array(docs, pa.string())}),
            f"{d}/documents.parquet",
        )
        out = repeated_spans(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
        want = pd.DataFrame(
            {
                "doc_id": list(range(6)),
                "n_pos": [6, 6, 6, 6, 1, 1],
                "n_repeated_pos": [0, 2, 1, 1, 1, 1],
            }
        )
        pd.testing.assert_frame_equal(
            out.astype("int64"), want.astype("int64"), check_dtype=False
        )

    def test_bucket_count_invariant(self):
        """Bucketing is a pure dispatch choice: 4 fat buckets and 64
        thin ones yield identical per-doc counts on the sf corpus."""
        from blockspider_ray.pipelines.dedup import repeated_spans

        def collect(b):
            return (
                repeated_spans(SF, n_buckets=b)
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )

        pd.testing.assert_frame_equal(collect(4), collect(64))

    def test_rejects_non_power_of_two(self):
        from blockspider_ray.pipelines.dedup import repeated_spans

        with pytest.raises(AssertionError, match="power of two"):
            repeated_spans(SF, n_buckets=12)


class TestCumulativeSpend:
    def test_rejects_non_power_of_two(self):
        from blockspider_ray.pipelines.windows import cumulative_spend

        with pytest.raises(AssertionError, match="power of two"):
            cumulative_spend(SF, n_buckets=12)

    def test_bucket_count_invariant(self):
        from blockspider_ray.pipelines.windows import cumulative_spend

        def collect(b):
            return (
                cumulative_spend(SF, n_buckets=b)
                .to_pandas()
                .sort_values(["o_custkey", "o_orderkey"])
                .reset_index(drop=True)
            )

        pd.testing.assert_frame_equal(collect(4), collect(64))


class TestRollingSpend:
    def test_rejects_non_power_of_two(self):
        from blockspider_ray.pipelines.windows import rolling_spend_cents

        with pytest.raises(AssertionError, match="power of two"):
            rolling_spend_cents(SF, n_buckets=12)

    def test_bucket_count_invariant(self):
        from blockspider_ray.pipelines.windows import rolling_spend_cents

        def collect(b):
            return (
                rolling_spend_cents(SF, n_buckets=b)
                .to_pandas()
                .sort_values(["o_custkey", "o_orderkey"])
                .reset_index(drop=True)
            )

        pd.testing.assert_frame_equal(collect(4), collect(64))

    def test_window_one_is_identity(self):
        # k=1 trailing sum == each order's own cents (frame = CURRENT ROW)
        from blockspider_ray.pipelines.windows import rolling_spend_cents

        got = rolling_spend_cents(SF, window=1).to_pandas()
        want = duckdb.sql(
            f"""SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
                FROM read_parquet('{SF}/orders.parquet')"""
        ).df()
        m = got.merge(want, on="o_orderkey")
        assert len(m) == len(got)
        assert (m["roll_spend_cents"] == m["cents"]).all()


class TestEventTransitions:
    def test_rejects_non_power_of_two(self):
        from blockspider_ray.pipelines.windows import event_transitions

        with pytest.raises(AssertionError, match="power of two"):
            event_transitions(SF, n_buckets=12)

    def test_total_pairs_conservation(self):
        # sum of transition counts == n_events - n_distinct_users (each
        # user contributes len(run)-1 successor pairs)
        from blockspider_ray.pipelines.windows import event_transitions

        got = event_transitions(SF)
        n, u = duckdb.sql(
            f"SELECT COUNT(*), COUNT(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
        ).fetchone()
        assert got["n"].sum() == n - u

    def test_bucket_count_invariant(self):
        from blockspider_ray.pipelines.windows import event_transitions

        a = event_transitions(SF, n_buckets=4)
        b = event_transitions(SF, n_buckets=64)
        pd.testing.assert_frame_equal(a, b)


class TestSnapshotDiff:
    def test_rejects_non_power_of_two(self):
        from blockspider_ray.pipelines.corpus import snapshot_diff

        with pytest.raises(AssertionError, match="power of two"):
            snapshot_diff(SF, n_buckets=12)

    def test_bucket_count_invariant(self):
        from blockspider_ray.pipelines.corpus import snapshot_diff

        def collect(b):
            return (
                snapshot_diff(SF, n_buckets=b)
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )

        pd.testing.assert_frame_equal(collect(4), collect(64))

    def test_statuses_partition_the_delta(self):
        from blockspider_ray.pipelines.corpus import snapshot_diff

        out = snapshot_diff(SF).to_pandas()
        n_docs, mx = duckdb.sql(
            f"SELECT COUNT(*), MAX(doc_id) FROM read_parquet('{SF}/documents.parquet')"
        ).fetchone()
        by = out.groupby("status")["doc_id"].agg(["count", "min", "max"])
        # every added id is a fresh id beyond the original range
        assert by.loc["added", "min"] > mx
        # removed = %7 == 0 ids; changed = %11 == 0 among the kept
        assert (out.loc[out["status"] == "removed", "doc_id"] % 7 == 0).all()
        ch = out.loc[out["status"] == "changed", "doc_id"]
        assert (ch % 11 == 0).all() and (ch % 7 != 0).all()
        assert out["doc_id"].is_unique


class TestBottomkSample:
    def test_exact_size_and_determinism(self):
        from blockspider_ray.pipelines.corpus import bottomk_sample

        a = bottomk_sample(SF, k=37)
        b = bottomk_sample(SF, k=37)
        assert len(a) == 37
        pd.testing.assert_frame_equal(a, b)
        # growing k extends, never reshuffles, the sample (prefix property)
        c = bottomk_sample(SF, k=60)
        pd.testing.assert_frame_equal(c.head(37), a)


class TestWeeklyRevenueWow:
    def test_prev_is_shifted_rev(self):
        from blockspider_ray.pipelines.windows import weekly_revenue_wow

        out = weekly_revenue_wow(SF)
        assert out["prev_cents"].iloc[0] == -1
        assert (out["prev_cents"].iloc[1:].to_numpy() == out["rev_cents"].iloc[:-1].to_numpy()).all()
        # weeks are Monday-aligned and strictly increasing
        assert out["week"].is_monotonic_increasing
        assert (out["week"].dt.dayofweek == 0).all()


class TestSaltedJoin:
    def _fixture(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.default_rng(11)
        n = 10_000
        # user 7 owns half the events — one key melting one bucket
        uid = rng.integers(0, 20, size=n)
        uid[: n // 2] = 7
        ev = pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "user_id": pa.array(uid.astype(np.int64), pa.int64()),
                "value": pa.array(np.round(rng.uniform(0, 100, size=n), 2), pa.float64()),
            }
        )
        cust = pa.table(
            {
                "c_custkey": pa.array(np.arange(20, dtype=np.int64), pa.int64()),
                "c_mktsegment": pa.array(
                    [["BUILDING", "MACHINERY", "HOUSEHOLD"][i % 3] for i in range(20)],
                    pa.string(),
                ),
            }
        )
        d = str(tmp_path)
        pq.write_table(ev, f"{d}/events.parquet")
        pq.write_table(cust, f"{d}/customer.parquet")
        want = (
            duckdb.sql(
                f"""SELECT c_mktsegment, ROUND(SUM(value), 2) AS sum_value,
                           COUNT(*)::BIGINT AS n_events
                    FROM read_parquet('{d}/events.parquet') e
                    JOIN read_parquet('{d}/customer.parquet') c ON e.user_id = c.c_custkey
                    GROUP BY c_mktsegment ORDER BY c_mktsegment"""
            )
            .df()
            .reset_index(drop=True)
        )
        return d, want

    def test_planted_skew_salted_equals_oracle(self, tmp_path):
        """50%-hot key: the auto census must detect it (count 5000 >>
        2x mean 1000), scatter its rows over r_salt sub-buckets, and the
        replicated small side must keep the join output exactly equal."""
        from blockspider_ray.pipelines.relational import salted_join_events

        d, want = self._fixture(tmp_path)
        got = salted_join_events(d, n_buckets=8, r_salt=4)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_no_hot_and_all_hot_paths_agree(self, tmp_path):
        """hot_min=inf (plain bucketed join) and hot_min=1 (EVERY key
        salted) are pure execution choices — byte-identical output."""
        from blockspider_ray.pipelines.relational import salted_join_events

        d, want = self._fixture(tmp_path)
        cold = salted_join_events(d, n_buckets=8, hot_min=10**9)
        all_hot = salted_join_events(d, n_buckets=8, r_salt=2, hot_min=1)
        pd.testing.assert_frame_equal(cold, want, check_dtype=False)
        pd.testing.assert_frame_equal(all_hot, want, check_dtype=False)

    def test_rejects_non_power_of_two(self):
        from blockspider_ray.pipelines.relational import salted_join_events

        with pytest.raises(AssertionError, match="power of two"):
            salted_join_events(SF, n_buckets=12)
        with pytest.raises(AssertionError, match="power of two"):
            salted_join_events(SF, r_salt=3)


class TestRetentionCohorts:
    def test_cross_batch_pair_dedup(self, tmp_path):
        """pair_partial dedups (user, week) only within its batch; the
        bucket scan must finish the dedup. Concatenate events 16x (same
        distinct pairs, >4096 rows => multiple map_batches batches, so
        duplicates of one pair are guaranteed to cross batches) — the
        retention triangle must equal the single-copy oracle's."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.windows import retention_cohorts

        ev = pq.read_table(f"{SF}/events.parquet")
        d = str(tmp_path)
        pq.write_table(pa.concat_tables([ev] * 16), f"{d}/events.parquet")
        got = retention_cohorts(d, n_buckets=8)
        want = (
            duckdb.sql(
                f"""WITH uw AS (SELECT DISTINCT user_id,
                                       epoch_us(ts) // 604800000000 AS week
                                FROM read_parquet('{SF}/events.parquet')),
                         c AS (SELECT user_id, MIN(week) AS cohort_week
                               FROM uw GROUP BY user_id)
                    SELECT cohort_week::BIGINT AS cohort_week,
                           (week - cohort_week)::BIGINT AS week_offset,
                           COUNT(*)::BIGINT AS n_users
                    FROM uw JOIN c USING (user_id)
                    GROUP BY cohort_week, week - cohort_week
                    ORDER BY cohort_week, week_offset"""
            )
            .df()
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_rejects_non_power_of_two(self):
        from blockspider_ray.pipelines.windows import retention_cohorts

        with pytest.raises(AssertionError, match="power of two"):
            retention_cohorts(SF, n_buckets=12)


class TestKMeansEmbeddings:
    def test_matches_local_lloyds(self):
        """Distributed Lloyd's == driver-local numpy Lloyd's with the
        identical deterministic init (first k by vec_id) and iteration
        count: cluster sizes exact, inertia/centroid norms to float
        tolerance (partial-sum merge order differs from numpy's single
        reduction)."""
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.similarity import kmeans_embeddings

        k, iters = 8, 5
        got = kmeans_embeddings(SF, k=k, iters=iters)

        t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
        order = np.argsort(t["vec_id"].to_numpy())
        X = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])[order]
        cent = X[:k].copy()
        for _ in range(iters):
            d = -2.0 * (X @ cent.T) + (cent * cent).sum(axis=1)[None, :]
            a = np.argmin(d, axis=1)
            x2 = (X * X).sum(axis=1)
            n = np.bincount(a, minlength=k)
            inertia = np.array([(x2[a == c] + d[a == c, c]).sum() for c in range(k)])
            new = cent.copy()
            for c in range(k):
                if n[c]:
                    new[c] = X[a == c].mean(axis=0)
            cent = new
        present = np.flatnonzero(n)
        assert got["cluster_id"].tolist() == present.tolist()
        assert got["n_vecs"].tolist() == n[present].tolist()
        np.testing.assert_allclose(got["inertia"], inertia[present], rtol=1e-6, atol=1e-3)
        np.testing.assert_allclose(
            got["centroid_norm"], np.linalg.norm(cent[present], axis=1), rtol=1e-6, atol=1e-3
        )


class TestBloomJoin:
    def test_fp_rate_independence(self):
        """Output is exact at ANY bitmap size: a 256-bit bloom (dense,
        high-FP — most probe rows survive the prefilter) and a 2^20-bit
        bloom (sparse, ~zero FP) must be byte-identical — false
        positives only waste shuffle bytes, the in-bucket join removes
        them."""
        from blockspider_ray.pipelines.relational import join_orders_lineitem_bloom

        tiny_m = join_orders_lineitem_bloom(SF, log2_m=8)
        big_m = join_orders_lineitem_bloom(SF, log2_m=20)
        pd.testing.assert_frame_equal(tiny_m, big_m)

    def test_bloom_actually_prunes(self):
        """At 2^20 bits / 4 hashes over a selective predicate
        (price > 400k keeps ~5% of orders) the joined-row count must be
        far below the lineitem total AND equal the exact SQL count —
        i.e. the prefilter prunes without dropping a single match
        (soundness + pushdown in one pin)."""
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.relational import join_orders_lineitem_bloom

        out = join_orders_lineitem_bloom(SF, price_min=400000.0, log2_m=20)
        n_joined = int(out["n_items"].sum())
        n_li = pq.read_metadata(f"{SF}/lineitem.parquet").num_rows
        want = duckdb.sql(
            f"""SELECT COUNT(*) FROM read_parquet('{SF}/lineitem.parquet') l
                JOIN read_parquet('{SF}/orders.parquet') o ON l_orderkey = o_orderkey
                WHERE o_totalprice > 400000"""
        ).fetchone()[0]
        assert n_joined == want
        assert n_joined < n_li * 0.5

    def test_rejects_non_power_of_two(self):
        from blockspider_ray.pipelines.relational import join_orders_lineitem_bloom

        with pytest.raises(AssertionError, match="power of two"):
            join_orders_lineitem_bloom(SF, n_buckets=12)


class TestPCAEmbeddings:
    def test_matches_local_pca(self):
        """Distributed moment-partial PCA == driver-local numpy PCA on
        the same table, after the same sign canonicalization (largest-
        |loading| coordinate positive). Projections to float tolerance:
        the partial X^T X merge order differs from numpy's single
        matmul."""
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.similarity import pca_embeddings

        got = pca_embeddings(SF, n_components=3).to_pandas().sort_values("vec_id").reset_index(drop=True)

        t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
        order = np.argsort(t["vec_id"].to_numpy())
        vid = t["vec_id"].to_numpy()[order]
        X = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])[order]
        mean = X.mean(axis=0)
        cov = (X.T @ X) / len(X) - np.outer(mean, mean)
        w, v = np.linalg.eigh(cov)
        comps = v[:, ::-1][:, :3].T
        for i in range(len(comps)):
            j = np.argmax(np.abs(comps[i]))
            if comps[i, j] < 0:
                comps[i] = -comps[i]
        P = (X - mean) @ comps.T
        assert got["vec_id"].tolist() == vid.tolist()
        for i in range(3):
            np.testing.assert_allclose(got[f"pc{i + 1}"], P[:, i], rtol=1e-7, atol=1e-9)

    def test_variance_ordering(self):
        """pc1 must carry at least as much sample variance as pc2."""
        from blockspider_ray.pipelines.similarity import pca_embeddings

        df = pca_embeddings(SF, n_components=2).to_pandas()
        assert df["pc1"].var() >= df["pc2"].var()


class TestValueDeciles:
    def test_constant_value_degenerates_to_one_range(self, tmp_path):
        """The documented skew bound: rows sharing one value never split
        across ranges — with a CONSTANT value column every row lands in
        ONE range task, and the output must still be the exact NTILE
        (ordered by the event_id tie-break)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.windows import value_deciles

        n = 1000
        d = str(tmp_path)
        pq.write_table(
            pa.table({"event_id": pa.array(range(n), pa.int64()),
                      "value": pa.array([7.5] * n, pa.float64())}),
            f"{d}/events.parquet",
        )
        got = value_deciles(d).to_pandas().sort_values("event_id").reset_index(drop=True)
        want = duckdb.sql(
            f"""SELECT event_id, ntile(10) OVER (ORDER BY value, event_id)::BIGINT AS decile
                FROM read_parquet('{d}/events.parquet') ORDER BY event_id"""
        ).df().reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestBpeMerges:
    """bpe_merges is iterative with a per-iteration argmax (no SQL
    oracle): pin the full merge sequence + counts against a pure-Python
    dict-based Sennrich reference with the identical tie-break
    (count desc, then (left, right) asc), on the fixture corpus and on
    a planted corpus that forces the left==right overlap path."""

    @staticmethod
    def _ref(texts, iters):
        import re
        from collections import Counter

        wf = Counter()
        for t in texts:
            for w in re.split(r"\s+", t or ""):
                if w:
                    wf[w] += 1
        vocab = {tuple(w): n for w, n in wf.items()}
        merges = []
        for rank in range(iters):
            pairs = Counter()
            for syms, n in vocab.items():
                for i in range(len(syms) - 1):
                    pairs[(syms[i], syms[i + 1])] += n
            if not pairs:
                break
            (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            merges.append((rank, a, b, c))
            newv = {}
            for syms, n in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                newv[tuple(out)] = newv.get(tuple(out), 0) + n
            vocab = newv
        return pd.DataFrame(merges, columns=["rank", "left", "right", "cnt"]).astype(
            {"rank": "int64", "cnt": "int64"}
        )

    def test_merge_sequence_matches_reference_on_fixture(self):
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.textstats import bpe_merges

        got = bpe_merges(SF, iters=6)
        texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"])["text"].to_pylist()
        want = self._ref(texts, 6)
        assert len(got) == 6
        pd.testing.assert_frame_equal(got, want)

    def test_leftmost_greedy_overlap_path(self, tmp_path):
        """'aaaa' must merge positions 0 and 2 (leftmost-greedy), never
        1 — the run-scan alternate-keep branch only reachable when
        left == right."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.textstats import bpe_merges

        texts = ["aaaa aaaa aaa baab", "aaaaa caa aaaa", "aa aab baa aaaa aaaa"]
        d = str(tmp_path)
        pq.write_table(
            pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()), "text": pa.array(texts, pa.string())}),
            f"{d}/documents.parquet",
        )
        got = bpe_merges(d, iters=4)
        want = self._ref(texts, 4)
        pd.testing.assert_frame_equal(got, want)
        assert got["left"].iloc[0] == "a" and got["right"].iloc[0] == "a"


class TestQualityClassifier:
    """quality_classifier is iterative full-batch GD (no SQL oracle):
    the final weights must equal a driver-local numpy run of the
    IDENTICAL pipeline — same standardization (population sd), zeros
    init, lr, iteration count — and the learned separator must beat the
    majority-class base rate on its own training labels."""

    def test_weights_match_local_reference(self):
        import pyarrow.parquet as pq

        from blockspider_ray.functions import text as tx
        from blockspider_ray.pipelines.textstats import _QC_FEATS, quality_classifier

        got = quality_classifier(SF, iters=30, lr=0.5)
        assert list(got["feature"]) == _QC_FEATS + ["__bias__"]

        t = pq.read_table(f"{SF}/documents.parquet", columns=["text", "lang"])
        f = tx.quality_features(t["text"].to_pylist())
        X = np.stack([f[k].astype(np.float64) for k in _QC_FEATS], axis=1)
        y = (np.asarray(t["lang"].to_pylist(), dtype=object) == "en").astype(np.float64)
        mu, sd = X.mean(0), X.std(0)
        sd[sd == 0] = 1.0
        Xs = (X - mu) / sd
        n, d = X.shape
        w = np.zeros(d + 1)
        for _ in range(30):
            z = Xs @ w[:d] + w[d]
            p = 1.0 / (1.0 + np.exp(-z))
            e = p - y
            w = w - 0.5 * np.concatenate([Xs.T @ e, [e.sum()]]) / n
        np.testing.assert_allclose(got["weight"].values, np.round(w, 9), rtol=1e-6, atol=1e-9)

        # the separator must carry signal: beat always-predict-majority
        z = Xs @ w[:d] + w[d]
        acc = float(((z > 0) == (y > 0.5)).mean())
        base = max(y.mean(), 1 - y.mean())
        assert acc > base, (acc, base)


class TestDsirSample:
    """dsir_sample's hashed-bigram importance model is float log-ratio
    scoring (no SQL oracle): pin scores + the selected set against a
    driver-local reference, and force the model to actually steer by
    planting a target-only phrase."""

    def test_matches_local_reference(self):
        import re

        import pyarrow.parquet as pq

        from blockspider_ray.functions.urls import hash64
        from blockspider_ray.pipelines.corpus import dsir_sample

        m = 4096
        got = dsir_sample(SF, k=100, m=m)
        t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang", "text"])

        def bigrams(text):
            toks = [w for w in re.split(r"\s+", text or "") if w]
            if len(toks) < 2:
                return np.empty(0, dtype=np.int64)
            h = hash64(toks)
            hb = (h[:-1] * np.uint64(0x9E3779B97F4A7C15)) ^ h[1:]
            return (hb % np.uint64(m)).astype(np.int64)

        bg = [bigrams(d) for d in t["text"].to_pylist()]
        ct = np.zeros(m, np.int64)
        cr = np.zeros(m, np.int64)
        for b, lang in zip(bg, t["lang"].to_pylist()):
            np.add.at(cr, b, 1)
            if lang == "en":
                np.add.at(ct, b, 1)
        lr = np.log((ct + 1.0) / (ct.sum() + m)) - np.log((cr + 1.0) / (cr.sum() + m))
        s = np.array([np.round(lr[b].sum(), 9) for b in bg])
        ref = (
            pd.DataFrame({"doc_id": t["doc_id"].to_numpy(), "logratio": s})
            .sort_values(["logratio", "doc_id"], ascending=[False, True])
            .head(100)
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, ref, check_dtype=False, rtol=1e-9, atol=1e-9)

    def test_planted_target_phrase_ranks_first(self, tmp_path):
        """Docs repeating a bigram that only 'en' (target) docs contain
        must outrank neutral docs — the model steers toward the target
        distribution, not just toward length."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.corpus import dsir_sample

        rows = []
        for i in range(40):
            rows.append((i, "en", "alpha beta " * 5))  # target slice: distinctive bigram
        for i in range(40, 80):
            rows.append((i, "de", "gamma delta " * 5))  # raw-only bigram
        # candidates: two docs sharing the target bigram, two the raw one
        rows += [(100, "de", "alpha beta alpha beta"), (101, "de", "alpha beta"),
                 (102, "de", "gamma delta gamma delta"), (103, "de", "gamma delta")]
        d = str(tmp_path)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "lang": pa.array([r[1] for r in rows], pa.string()),
                    "text": pa.array([r[2] for r in rows], pa.string()),
                }
            ),
            f"{d}/documents.parquet",
        )
        got = dsir_sample(d, k=84).set_index("doc_id")["logratio"]
        # target-bigram candidates outrank raw-bigram candidates pairwise
        # (same lengths), and sit on opposite sides of neutral
        assert got[100] > got[102] and got[101] > got[103]
        assert got[100] > 0 > got[102]


class TestStripRepeatedSpans:
    def test_planted_boilerplate_cut_unique_kept(self, tmp_path):
        """A 6-token boilerplate footer shared by many docs must vanish
        from every doc while each doc's unique prose survives; a doc
        with no repeated spans passes through verbatim."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.dedup import strip_repeated_spans

        boiler = "subscribe to our newsletter for daily updates"
        uniq = [f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f u{i}g" for i in range(6)]
        texts = [f"{u} {boiler}" for u in uniq[:5]] + [uniq[5]]
        d = str(tmp_path)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            f"{d}/documents.parquet",
        )
        out = (
            strip_repeated_spans(d)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        n_boiler = len(boiler.split())
        for i in range(5):
            row = out.iloc[i]
            assert row["clean_text"] == uniq[i], row["clean_text"]
            assert row["n_dropped"] == n_boiler
        assert out.iloc[5]["clean_text"] == uniq[5] and out.iloc[5]["n_dropped"] == 0

    def test_driver_cap_guard_engages(self, tmp_path):
        """The repeated-span key set must flow through
        bounded_driver_frame: a tiny planted cap raises with the spill
        escape spelled out instead of collecting."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import pytest as _pytest

        from blockspider_ray.pipelines.dedup import strip_repeated_spans

        texts = ["copy pasta boiler plate line here today"] * 12
        d = str(tmp_path)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            f"{d}/documents.parquet",
        )
        with _pytest.raises(RuntimeError, match="driver-collection cap"):
            strip_repeated_spans(d, max_broadcast_spans=1).to_pandas()


class TestBpeEncode:
    def test_counts_match_pure_python_encoder(self):
        """Corpus-wide encode with the learned merge table must equal a
        per-word pure-Python greedy encoder applying the same merges in
        rank order (the merge list itself is reference-pinned in
        TestBpeMerges)."""
        import re

        from blockspider_ray.pipelines.textstats import bpe_encode, bpe_merges

        got = bpe_encode(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
        merges = bpe_merges(SF, iters=6)
        pairs = list(zip(merges["left"], merges["right"]))

        import pyarrow.parquet as pq

        t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])

        def enc(text):
            total0 = total = 0
            for w in re.findall(r"\S+", text or ""):
                syms = list(w)
                total0 += len(syms)
                for a, b in pairs:
                    out, i = [], 0
                    while i < len(syms):
                        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                total += len(syms)
            return total0, total

        ref = pd.DataFrame(
            [(d, *enc(x)) for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())],
            columns=["doc_id", "n_chars_sym", "n_bpe"],
        )
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)
        # merges actually compress: strictly fewer symbols than chars
        assert (got["n_bpe"] < got["n_chars_sym"]).all()


class TestPhraseSearch:
    """Planted-corpus semantics for the phrase-search pair: anchor
    counting (incl. overlapping matches and repeated query tokens),
    direct-scan == indexed equality, and the path-level pruning
    contract (every non-query bucket directory deleted, result
    unchanged — the indexed path provably never opens them)."""

    DOCS = {
        0: "x a a a y",            # "a a": overlapping anchors 2 and 3
        1: "a b a b a",            # "a b a": anchors 1 and 3
        2: "b b b",                # no 'a' at all
        3: "the fast a a the",     # mixes the default phrase + "a a"
        4: "a",                    # partial only
        5: "",                     # empty doc
    }

    def _write(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(self.DOCS), pa.int64()),
                    "text": pa.array(list(self.DOCS.values()), pa.string()),
                }
            ),
            f"{tmp_path}/documents.parquet",
        )
        return str(tmp_path)

    @staticmethod
    def _brute(docs, phrase):
        toks = phrase.split()
        out = {}
        for d, text in docs.items():
            w = text.split()
            n = sum(
                1
                for i in range(len(w) - len(toks) + 1)
                if w[i : i + len(toks)] == toks
            )
            if n:
                out[d] = n
        return pd.DataFrame(
            {"doc_id": list(out), "n_hits": list(out.values())}, dtype=np.int64
        ).sort_values("doc_id").reset_index(drop=True)

    @pytest.mark.parametrize("phrase", ["a a", "a b a", "the fast", "a", "zz yy"])
    def test_scan_matches_bruteforce(self, tmp_path, phrase):
        from blockspider_ray.pipelines.textstats import phrase_search

        got = phrase_search(self._write(tmp_path), phrase)
        ref = self._brute(self.DOCS, phrase)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), ref, check_dtype=False
        )

    @pytest.mark.parametrize("phrase", ["a a", "a b a", "the fast", "zz yy"])
    def test_indexed_equals_scan_with_pruned_buckets(self, tmp_path, phrase):
        import shutil

        from blockspider_ray.functions.urls import hash64
        from blockspider_ray.pipelines.textstats import (
            phrase_search,
            phrase_search_indexed,
            postings_build_index,
        )

        d = self._write(tmp_path / "data")
        idx = str(tmp_path / "idx")
        postings_build_index(d, idx, n_buckets=8)
        # delete every bucket the query tokens do NOT hash to: if the
        # indexed path opened anything outside its pruned set, it would
        # now fail or change output
        need = {int(h & np.uint64(7)) for h in hash64(phrase.split())}
        import os

        for b in range(8):
            if b not in need:
                shutil.rmtree(os.path.join(idx, f"bucket={b}"), ignore_errors=True)
        got = phrase_search_indexed(d, phrase, index_dir=idx)
        ref = phrase_search(d, phrase)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True),
            ref.reset_index(drop=True),
            check_dtype=False,
        )


class TestTfCosinePairs:
    """Planted-corpus semantics for the sparse-tf cosine miner: a
    near-verbatim duplicate scores ~1 and is found at a real (0.6)
    threshold, unrelated docs are not paired, scores equal a
    driver-local numpy reference built from the same df-band rule, and
    n_buckets cannot change the result."""

    def _write(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        base = "alpha beta gamma delta epsilon zeta eta theta " * 6
        docs = {
            0: base + "iota",
            1: base + "kappa",                       # near-dup of 0
            2: "lorem ipsum dolor sit amet " * 10,   # unrelated pair base
            3: "lorem ipsum dolor sit amet " * 10 + "extra tokens here",
            4: "completely different words nothing shared whatsoever",
            5: "",                                   # empty doc: no rows
        }
        tmp_path.mkdir(parents=True, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values()), pa.string()),
                }
            ),
            f"{tmp_path}/documents.parquet",
        )
        return str(tmp_path), docs

    @staticmethod
    def _reference(docs, threshold, df_ceiling=256):
        from collections import Counter

        tf = {d: Counter(t.split()) for d, t in docs.items()}
        df = Counter(tok for c in tf.values() for tok in c)
        kept = {t for t, d in df.items() if 2 <= d <= df_ceiling}
        n2 = {d: sum(v * v for v in c.values()) for d, c in tf.items()}
        rows = []
        ids = sorted(docs)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                dot = sum(tf[a][t] * tf[b][t] for t in kept if t in tf[a] and t in tf[b])
                if dot == 0 or n2[a] == 0 or n2[b] == 0:
                    continue
                c = dot / np.sqrt(float(n2[a] * n2[b]))
                if c >= threshold:
                    rows.append((a, b, np.round(c, 4)))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "cosine"]).astype(
            {"doc_a": "int64", "doc_b": "int64", "cosine": "float64"}
        )

    @pytest.mark.parametrize("threshold", [0.6, 0.05])
    def test_planted_matches_reference(self, tmp_path, threshold):
        from blockspider_ray.pipelines.dedup import tf_cosine_pairs

        d, docs = self._write(tmp_path)
        got = tf_cosine_pairs(d, threshold=threshold)
        ref = self._reference(docs, threshold)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True),
            ref.sort_values(["doc_a", "doc_b"]).reset_index(drop=True),
            check_dtype=False,
        )
        if threshold == 0.6:
            # the planted near-dups pair up; the unrelated doc pairs with no one
            assert set(map(tuple, got[["doc_a", "doc_b"]].values)) == {(0, 1), (2, 3)}
            assert (got["cosine"] > 0.9).all()

    def test_bucket_count_invariance(self, tmp_path):
        from blockspider_ray.pipelines.dedup import tf_cosine_pairs

        d, _ = self._write(tmp_path)
        a = tf_cosine_pairs(d, threshold=0.05, n_buckets=2)
        b = tf_cosine_pairs(d, threshold=0.05, n_buckets=64)
        pd.testing.assert_frame_equal(a, b)


class TestEditDistancePairs:
    def test_kernel_fuzz_vs_pure_python(self):
        import random

        from blockspider_ray.pipelines.dedup import _levenshtein

        def ref(a, b):
            a, b = a.encode("utf-8"), b.encode("utf-8")  # byte semantics, like DuckDB
            dp = list(range(len(b) + 1))
            for i in range(1, len(a) + 1):
                prev, dp[0] = dp[0], i
                for j in range(1, len(b) + 1):
                    cur = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
                    prev, dp[j] = dp[j], cur
            return dp[-1]

        rnd = random.Random(7)
        for _ in range(200):
            a = "".join(rnd.choices("abcd", k=rnd.randint(0, 15)))
            b = "".join(rnd.choices("abcd", k=rnd.randint(0, 15)))
            assert _levenshtein(a, b) == ref(a, b)
        assert _levenshtein("kitten", "sitting") == 3
        assert _levenshtein("", "") == 0
        # BYTE-based on purpose: DuckDB's levenshtein counts bytes (é = 2)
        assert _levenshtein("héllo", "hello") == 2 == ref("héllo", "hello")

    def test_planted_pipeline(self, tmp_path):
        """Near-identical planted docs: the miner pairs them, the verify
        stage reports the exact character distance of the planted edit."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.dedup import edit_distance_pairs

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
        docs = {
            0: base + "tail one",
            1: base + "tail two",  # 5 char edits from doc 0 ("one" -> "two" is 3; see below)
            2: "unrelated words entirely different from everything else here now",
        }
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values()), pa.string()),
                }
            ),
            f"{tmp_path}/documents.parquet",
        )
        out = edit_distance_pairs(str(tmp_path))
        assert list(map(tuple, out[["doc_a", "doc_b"]].values)) == [(0, 1)]
        # "one" vs "two": o->t, n->w, e->o = 3 substitutions
        assert out["dist"].iloc[0] == 3
        assert out["sim"].iloc[0] > 0.98


class TestKnnMMR:
    def test_lambda_one_is_brute_topk(self):
        from blockspider_ray.pipelines.similarity import knn_cosine, knn_mmr

        mmr = knn_mmr(SF, lam=1.0)
        brute = knn_cosine(SF)
        for qid, g in mmr.groupby("qid"):
            assert set(g["vec_id"]) == set(brute[brute["qid"] == qid]["vec_id"])
            # ranks follow sim descending when diversity is off
            assert (g.sort_values("rank")["sim"].diff().dropna() <= 1e-12).all()

    def test_planted_matches_reference_mmr(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.similarity import knn_mmr

        vecs = {
            0: [1.0, 0.0, 0.0, 0.0],   # queries: 0, 1, 2
            1: [0.0, 1.0, 0.0, 0.0],
            2: [0.0, 0.0, 1.0, 0.0],
            3: [1.0, 0.0, 0.0, 0.0],   # exact dup of q0's direction
            4: [0.999, 0.04, 0.0, 0.0],  # near-dup of 3
            5: [0.7, 0.7, 0.0, 0.0],
            6: [0.0, 0.9, 0.4, 0.0],
            7: [0.1, 0.1, 0.9, 0.0],
            8: [0.0, 0.0, 0.0, 1.0],
            9: [0.5, 0.0, 0.5, 0.7],
        }
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(list(vecs), pa.int64()),
                    "embedding": pa.array(list(vecs.values()), pa.list_(pa.float32())),
                }
            ),
            f"{tmp_path}/embeddings.parquet",
        )

        # lam=0.3: diversity dominates (at 0.5 with q0 == candidate 3's
        # direction every score degenerates to 0 — sim_q(d) == sim(d, 3))
        lam, k = 0.3, 3
        got = knn_mmr(str(tmp_path), k=k, lam=lam, shortlist=7)

        # driver-local reference MMR over the same candidates
        q = np.stack([np.asarray(vecs[i], dtype=np.float32).astype(np.float64) for i in (0, 1, 2)])
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        cids = np.arange(3, 10)
        c = np.stack([np.asarray(vecs[i], dtype=np.float32).astype(np.float64) for i in cids])
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        for qi in range(3):
            s = q[qi] @ c.T
            order = np.lexsort((cids, -s))
            v_, s_, c_ = cids[order], s[order], c[order]
            chosen, max_red = [], np.full(len(v_), -np.inf)
            taken = np.zeros(len(v_), dtype=bool)
            for rank in range(k):
                score = lam * s_ - (0.0 if not chosen else (1.0 - lam) * max_red)
                score = np.where(taken, -np.inf, score)
                best = int(np.argmax(score))
                taken[best] = True
                chosen.append(best)
                max_red = np.maximum(max_red, c_ @ c_[best])
                row = got[(got["qid"] == qi) & (got["rank"] == rank)].iloc[0]
                assert row["vec_id"] == v_[best], (qi, rank, row["vec_id"], v_[best])
        # the diversity property that motivates the operator: q0's rank-1
        # pick is NOT the near-dup of its rank-0 pick
        q0 = got[got["qid"] == 0].sort_values("rank")["vec_id"].tolist()
        assert q0[0] == 3 and q0[1] != 4

    def test_deterministic(self):
        from blockspider_ray.pipelines.similarity import knn_mmr

        a = knn_mmr(SF)
        b = knn_mmr(SF)
        pd.testing.assert_frame_equal(a, b)


class TestPostingsUpdateIndex:
    """Incremental phrase-index ingest: base + shard update equals a
    full rebuild over the merged corpus; re-runs with the same tag are
    no-ops; a crashed partial ingest is swept and repaired."""

    DOCS_A = {0: "the fast dog", 1: "a slow cat", 2: "the fast the fast"}
    DOCS_B = {10: "the fast train", 11: "nothing relevant", 12: "fast the fast the"}

    @staticmethod
    def _write_docs(path, docs):
        import pyarrow as pa
        import pyarrow.parquet as pq

        path.mkdir(parents=True, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values()), pa.string()),
                }
            ),
            f"{path}/documents.parquet",
        )
        return str(path)

    def test_update_equals_rebuild(self, tmp_path):
        from blockspider_ray.pipelines.textstats import (
            phrase_search,
            phrase_search_indexed,
            postings_build_index,
            postings_update_index,
        )

        da = self._write_docs(tmp_path / "a", self.DOCS_A)
        self._write_docs(tmp_path / "b", self.DOCS_B)
        merged = self._write_docs(tmp_path / "m", {**self.DOCS_A, **self.DOCS_B})
        idx = str(tmp_path / "idx")
        postings_build_index(da, idx, n_buckets=8)

        assert postings_update_index(str(tmp_path / "b"), idx, "day2") is True
        got = phrase_search_indexed(merged, "the fast", index_dir=idx)
        ref = phrase_search(merged, "the fast")
        pd.testing.assert_frame_equal(got, ref)

        # idempotence: same tag again is a no-op, results unchanged
        assert postings_update_index(str(tmp_path / "b"), idx, "day2") is False
        pd.testing.assert_frame_equal(
            phrase_search_indexed(merged, "the fast", index_dir=idx), ref
        )

    def test_crashed_partial_ingest_is_repaired(self, tmp_path):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.textstats import (
            phrase_search,
            phrase_search_indexed,
            postings_build_index,
            postings_update_index,
        )

        da = self._write_docs(tmp_path / "a", self.DOCS_A)
        self._write_docs(tmp_path / "b", self.DOCS_B)
        merged = self._write_docs(tmp_path / "m", {**self.DOCS_A, **self.DOCS_B})
        idx = str(tmp_path / "idx")
        postings_build_index(da, idx, n_buckets=8)

        # simulate a crash: tag-prefixed junk from a partial ingest
        # landed in live buckets but the manifest was never written —
        # a FULL phantom match for doc 999 ("the"@1 in bucket 5,
        # "fast"@2 in bucket 0, the query tokens' buckets at nb=8), so
        # if the sweep failed, doc 999 would be served as a hit
        for bucket, token, pos in ((5, "the", 1), (0, "fast", 2)):
            junk_dir = os.path.join(idx, f"bucket={bucket}")
            os.makedirs(junk_dir, exist_ok=True)
            pq.write_table(
                pa.table(
                    {
                        "token": pa.array([token], pa.string()),
                        "doc_id": pa.array([999], pa.int64()),
                        "pos": pa.array([pos], pa.int64()),
                    }
                ),
                os.path.join(junk_dir, "shard-day2-junk.parquet"),
            )
        assert postings_update_index(str(tmp_path / "b"), idx, "day2") is True
        got = phrase_search_indexed(merged, "the fast", index_dir=idx)
        ref = phrase_search(merged, "the fast")
        assert 999 not in set(got["doc_id"])  # the phantom was swept
        pd.testing.assert_frame_equal(got, ref)


class TestHits:
    def test_matches_dense_reference(self):
        """Distributed HITS must equal the dense numpy iteration with
        identical weighted updates + L2 normalization per half-step."""
        from blockspider_ray import gen
        from blockspider_ray.pipelines.graph import hits, host_graph

        pages_dir, _ = gen.ensure_fixture("tiny")
        edges_df = host_graph(pages_dir).to_pandas()
        auth_ds, hub_ds = hits(host_graph(pages_dir), k=4)
        ga = auth_ds.to_pandas().sort_values("host").reset_index(drop=True)
        gh = hub_ds.to_pandas().sort_values("host").reset_index(drop=True)

        hosts = sorted(set(edges_df["src"]) | set(edges_df["dst"]))
        idx = {h: i for i, h in enumerate(hosts)}
        n = len(hosts)
        W = np.zeros((n, n))
        for s_, d_, w_ in edges_df.itertuples(index=False):
            W[idx[s_], idx[d_]] += w_
        h = np.full(n, 1.0 / np.sqrt(n))
        for _ in range(4):
            a = W.T @ h
            a /= np.linalg.norm(a) or 1.0
            h = W @ a
            h /= np.linalg.norm(h) or 1.0

        assert ga["host"].tolist() == hosts and gh["host"].tolist() == hosts
        assert np.allclose(ga["s"].to_numpy(), a, atol=1e-9)
        assert np.allclose(gh["s"].to_numpy(), h, atol=1e-9)
        assert n > 3

    def test_planted_star(self):
        """A directory page linking to m sinks: the center is the sole
        hub (hub=1), the sinks share authority equally, and roles do not
        leak (center auth = 0, sink hubs = 0)."""
        import ray.data as rd

        from blockspider_ray.pipelines.graph import hits

        m = 5
        edges = rd.from_items(
            [{"src": "center", "dst": f"sink{i}", "w": 1.0} for i in range(m)]
        )
        auth, hub = hits(edges, k=3, n_buckets=4)
        a = auth.to_pandas().set_index("host")["s"]
        h = hub.to_pandas().set_index("host")["s"]
        assert abs(h["center"] - 1.0) < 1e-12
        for i in range(m):
            assert abs(a[f"sink{i}"] - 1.0 / np.sqrt(m)) < 1e-12
            assert abs(h[f"sink{i}"]) < 1e-12
        assert abs(a["center"]) < 1e-12


class TestWeightedSampleAES:
    def test_prefix_property_and_determinism(self):
        from blockspider_ray.pipelines.corpus import weighted_sample_aes

        a = weighted_sample_aes(SF, k=40)
        b = weighted_sample_aes(SF, k=80)
        assert set(a["doc_id"]) <= set(b["doc_id"])  # bottom-k prefix
        assert len(a) == 40 and len(b) == 80
        assert b["doc_id"].is_unique  # without replacement
        pd.testing.assert_frame_equal(a, weighted_sample_aes(SF, k=40))

    def test_planted_heavy_weight_always_selected(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.corpus import weighted_sample_aes

        n = 50
        ids = list(range(n))
        chars = [100] * n
        chars[17] = 10**12  # one doc carries a million-fold weight
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(["x"] * n, pa.string()),
                    "n_chars": pa.array(chars, pa.int64()),
                }
            ),
            f"{tmp_path}/documents.parquet",
        )
        out = weighted_sample_aes(str(tmp_path), k=3)
        assert 17 in set(out["doc_id"])
        # its score is the smallest of the whole corpus by ~10 orders
        assert out.set_index("doc_id").loc[17, "score"] <= out["score"].min() + 1e-12


class TestFuzzyDedupCorpus:
    def test_planted_clusters_keep_one_canonical(self, tmp_path):
        """A transitive chain A~B, B~C (no A~C pair) must still collapse
        to one kept doc; unpaired docs all survive."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.corpus import fuzzy_dedup_corpus

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
        docs = {
            0: base + "one two three four",
            1: base + "one two three five",   # ~0
            2: base + "one two six five",     # ~1 (and transitively 0)
            7: "totally unrelated words live here in this other document",
            9: "another unpaired document with its own vocabulary set",
        }
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values()), pa.string()),
                    "n_chars": pa.array([len(t) for t in docs.values()], pa.int64()),
                }
            ),
            f"{tmp_path}/documents.parquet",
        )
        out = fuzzy_dedup_corpus(str(tmp_path)).to_pandas()
        kept = sorted(out["doc_id"])
        assert kept == [0, 7, 9]  # cluster {0,1,2} -> canonical 0 only


class TestBigramLogprob:
    def test_word_order_sensitivity(self, tmp_path):
        """The property unigram_logprob cannot have: a doc with
        corpus-typical word ORDER outscores one with the same unigrams
        scrambled into corpus-unique bigrams."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.textstats import bigram_logprob

        typical = "the quick brown fox jumps over the lazy dog"
        docs = {i: typical for i in range(20)}
        docs[50] = "dog the over lazy fox jumps brown the quick"  # scrambled
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values()), pa.string()),
                }
            ),
            f"{tmp_path}/documents.parquet",
        )
        out = bigram_logprob(str(tmp_path)).set_index("doc_id")
        assert out.loc[50, "avg_logprob"] < out.loc[0, "avg_logprob"] - 1.0
        # every bigram is in-corpus by construction: finite scores only
        assert np.isfinite(out["avg_logprob"]).all()

    def test_bucket_count_invariance(self):
        from blockspider_ray.pipelines.textstats import bigram_logprob

        a = bigram_logprob(SF, n_buckets=4)
        b = bigram_logprob(SF, n_buckets=64)
        pd.testing.assert_frame_equal(a, b)


class TestWinnowFingerprints:
    @staticmethod
    def _reference(text, k, window):
        """Naive winnowing: per frame, min hash, rightmost on ties, each
        selected occurrence once."""
        from blockspider_ray.functions import text as tx
        from blockspider_ray.functions.urls import hash64

        s = tx.shingles(text, k=k)
        if not s:
            return None
        h = [int(v) for v in hash64(s)]
        sel = set()
        if len(h) <= window:
            frames = [(0, len(h))]
        else:
            frames = [(i, i + window) for i in range(len(h) - window + 1)]
        for lo, hi in frames:
            m = min(h[lo:hi])
            pos = max(j for j in range(lo, hi) if h[j] == m)  # rightmost
            sel.add(pos)
        digest = 0
        for p in sel:
            digest ^= h[p]
        return len(h), len(sel), digest

    def test_matches_reference_on_fixture(self):
        from blockspider_ray.pipelines.textstats import winnow_fingerprints
        import pyarrow.parquet as pq

        got = (
            winnow_fingerprints(SF)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        checked = 0
        for doc_id, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
            ref = self._reference(text, 5, 4)
            if ref is None:
                assert doc_id not in got.index
                continue
            ns, nf, dg = ref
            row = got.loc[doc_id]
            assert (row["n_shingles"], row["n_fp"]) == (ns, nf), doc_id
            assert int(np.uint64(np.int64(row["fp_digest"]))) == dg, doc_id
            checked += 1
        assert checked >= 400

    def test_shared_run_guarantee(self, tmp_path):
        """Winnowing's contract: documents sharing a run of
        window + k - 1 tokens share at least one fingerprint."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.functions import text as tx
        from blockspider_ray.functions.urls import hash64
        from blockspider_ray.pipelines.textstats import winnow_fingerprints

        k, w = 5, 4
        shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = w+k-1 tokens
        docs = {
            0: "one two three " + shared + " four five six",
            1: "nine eight seven " + shared + " ten eleven twelve",
        }
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values()), pa.string()),
                }
            ),
            f"{tmp_path}/documents.parquet",
        )
        # recompute each doc's selected fingerprint SET via the reference
        sets = {}
        for d, text in docs.items():
            s = tx.shingles(text, k=k)
            h = [int(v) for v in hash64(s)]
            sel = set()
            for lo in range(len(h) - w + 1):
                m = min(h[lo : lo + w])
                sel.add(max(j for j in range(lo, lo + w) if h[j] == m))
            sets[d] = {h[p] for p in sel}
        assert sets[0] & sets[1], "winnowing guarantee violated in reference"
        out = winnow_fingerprints(str(tmp_path), k=k, window=w).to_pandas()
        assert len(out) == 2 and (out["n_fp"] > 0).all()


def test_anchor_counts_survives_huge_doc_ids():
    """The run-scan must be exact for doc ids past 2^31 (a fused
    doc<<32 key — the first implementation — overflows there)."""
    from blockspider_ray.pipelines.textstats import _anchor_counts

    big = np.int64(3 << 40)
    d = np.array([big, big, big + 1, big, big], dtype=np.int64)
    a = np.array([5, 5, 5, 9, 2], dtype=np.int64)
    docs, n = _anchor_counts(d, a, 2)  # (big,5) has 2 rows -> one hit
    assert docs.tolist() == [big] and n.tolist() == [1]


def test_postings_build_is_idempotent(tmp_path):
    """Re-building over an existing (or half-built) index must replace
    it, not append into it — duplicated posting rows would make the
    counts==k anchor exactness silently drop TRUE matches."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from blockspider_ray.pipelines.textstats import (
        phrase_search,
        phrase_search_indexed,
        postings_build_index,
    )

    docs = {0: "the fast dog", 1: "fast the fast"}
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(docs), pa.int64()),
                "text": pa.array(list(docs.values()), pa.string()),
            }
        ),
        f"{d}/documents.parquet",
    )
    idx = str(tmp_path / "idx")
    postings_build_index(str(d), idx, n_buckets=8)
    postings_build_index(str(d), idx, n_buckets=8)  # the corruption repro
    got = phrase_search_indexed(str(d), "the fast", index_dir=idx)
    ref = phrase_search(str(d), "the fast")
    pd.testing.assert_frame_equal(got, ref)
    # simulate a crashed half-build: live dir missing meta -> the
    # auto-build path must produce a CLEAN index, not append
    import shutil

    os.remove(os.path.join(idx, "meta.parquet"))
    postings_build_index(str(d), idx, n_buckets=8)
    pd.testing.assert_frame_equal(
        phrase_search_indexed(str(d), "the fast", index_dir=idx), ref
    )


class TestWinnowDedupPairs:
    def test_planted_shared_run_found_and_subset_of_true_overlap(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.functions import text as tx
        from blockspider_ray.pipelines.dedup import winnow_dedup_pairs

        k, w = 5, 4
        shared = (
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi"
        )  # 16 tokens >> w+k-1
        docs = {
            0: "intro words here " + shared + " outro one",
            1: "different opening " + shared + " different close",
            2: "no overlap with anyone at all in this entire document text",
            3: "yet another completely distinct document body right here now",
        }
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values()), pa.string()),
                }
            ),
            f"{tmp_path}/documents.parquet",
        )
        out = winnow_dedup_pairs(str(tmp_path), k=k, window=w, min_shared=2)
        got_pairs = set(map(tuple, out[["doc_a", "doc_b"]].values))
        assert (0, 1) in got_pairs  # the winnowing guarantee, via the miner
        # soundness: every reported pair truly shares >= min_shared k-shingles
        sets = {d: set(tx.shingles(t, k=k)) for d, t in docs.items()}
        for a, b in got_pairs:
            assert len(sets[a] & sets[b]) >= 2, (a, b)
        assert not any(2 in p or 3 in p for p in got_pairs)

    def test_bucket_count_invariance(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.dedup import winnow_dedup_pairs

        base = "the quick brown fox jumps over the lazy dog again and again "
        docs = {i: base + f"suffix {i % 3}" for i in range(12)}
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values()), pa.string()),
                }
            ),
            f"{tmp_path}/documents.parquet",
        )
        a = winnow_dedup_pairs(str(tmp_path), n_buckets=2)
        b = winnow_dedup_pairs(str(tmp_path), n_buckets=64)
        pd.testing.assert_frame_equal(a, b)


class TestFluencyBuckets:
    """fluency_buckets edge semantics beyond the oracle sweep: the
    integer-exact tie contract and the boundary-collect cap guard."""

    @staticmethod
    def _write(tmp_path, ids, texts, langs):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(langs, pa.string()),
                }
            ),
            f"{tmp_path}/documents.parquet",
        )
        return str(tmp_path)

    def test_constant_score_ties_break_by_doc_id(self, tmp_path):
        """Every doc identical => every score_q identical => NTILE must
        split purely on the doc_id tiebreak (the exact case a
        float-scored bucketer gets nondeterministically wrong). Doc ids
        include values past 2^31 and out-of-order."""
        from blockspider_ray.pipelines.textstats import fluency_buckets

        ids = [7, 3, 2**31 + 5, 11, 2**40, 1, 6, 9]
        d = self._write(tmp_path, ids, ["a b c"] * len(ids), ["en"] * len(ids))
        out = fluency_buckets(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert out["score_q"].nunique() == 1
        # NTILE(3) over 8 rows ordered by doc_id: sizes 3,3,2
        want = {did: (1 if r < 3 else 2 if r < 6 else 3) for r, did in enumerate(sorted(ids))}
        got = dict(zip(out["doc_id"], out["bucket"]))
        assert got == want

    def test_boundary_collect_cap_guard_trips(self, tmp_path):
        """A pathological tie cluster at a cut rank lands every row in
        one boundary bin; the collect must trip bounded_driver_frame's
        guard, not the driver heap (the loser_keys/minhash cap-test
        precedent)."""
        import pytest as _pytest

        from blockspider_ray.pipelines.textstats import fluency_buckets

        ids = list(range(100))
        d = self._write(tmp_path, ids, ["t t t"] * 100, ["en"] * 100)
        with _pytest.raises(RuntimeError, match="driver-collection cap"):
            fluency_buckets(d, max_boundary_rows=10).to_pandas()

    def test_two_langs_partition_independently(self, tmp_path):
        """Bucket cuts are per-language: a lang with 4 docs splits 2/1/1
        regardless of the other lang's distribution; scores use the
        SHARED corpus LM (counts pool across langs)."""
        from blockspider_ray.pipelines.textstats import fluency_buckets

        ids = list(range(10))
        texts = [f"common common rare{i}" for i in ids]
        langs = ["en"] * 6 + ["de"] * 4
        d = self._write(tmp_path, ids, texts, langs)
        out = fluency_buckets(d).to_pandas()
        en = out[out["lang"] == "en"]["bucket"].value_counts().to_dict()
        de = out[out["lang"] == "de"]["bucket"].value_counts().to_dict()
        assert en == {1: 2, 2: 2, 3: 2}
        assert de == {1: 2, 2: 1, 3: 1}


class TestParagraphDedup:
    """The sf fixture has one unique line per doc (paragraph_dedup is a
    no-op there), so the semantics live here: planted cross-doc and
    in-doc repeats, the empty-line exemption, winner ordering, and a
    planted-table DuckDB cross-check of the full reassembly."""

    @staticmethod
    def _write(tmp_path, docs: dict[int, str]):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values()), pa.string()),
                }
            ),
            f"{tmp_path}/documents.parquet",
        )
        return str(tmp_path)

    def test_first_occurrence_wins_and_empties_survive(self, tmp_path):
        from blockspider_ray.pipelines.dedup import paragraph_dedup

        docs = {
            # doc 1: "shared" first occurrence (lowest doc_id) + in-doc repeat of "twice"
            1: "shared\ntwice\n\ntwice\nunique1",
            # doc 2: loses its "shared" copy; keeps its empty line and unique text
            2: "unique2\n\nshared",
            # doc 5: "shared" again + its own within-doc repeated pair
            5: "shared\nshared",
        }
        d = self._write(tmp_path, docs)
        out = paragraph_dedup(d).set_index("doc_id")
        assert out.loc[1, "text_clean"] == "shared\ntwice\n\nunique1"
        assert out.loc[1, "n_removed_paras"] == 1
        assert out.loc[2, "text_clean"] == "unique2\n"
        assert out.loc[2, "n_removed_paras"] == 1
        assert out.loc[5, "text_clean"] == ""
        assert out.loc[5, "n_removed_paras"] == 2

    def test_winner_is_position_not_batch_order(self, tmp_path):
        """Within one doc the EARLIER position wins; across docs the
        LOWER doc_id wins even when it appears later in the file."""
        from blockspider_ray.pipelines.dedup import paragraph_dedup

        docs = {10: "b\na", 3: "a\nb"}  # doc 3 wins both despite file order
        d = self._write(tmp_path, docs)
        out = paragraph_dedup(d).set_index("doc_id")
        assert out.loc[3, "text_clean"] == "a\nb"
        assert out.loc[10, "text_clean"] == ""
        assert out.loc[10, "n_removed_paras"] == 2

    def test_min_chars_exempts_short_paragraphs(self, tmp_path):
        from blockspider_ray.pipelines.dedup import paragraph_dedup

        docs = {1: "aa\nbb", 2: "aa\nbb"}
        d = self._write(tmp_path, docs)
        out = paragraph_dedup(d, min_chars=3).set_index("doc_id")
        # every paragraph is under 3 chars -> all exempt, nothing removed
        assert (out["n_removed_paras"] == 0).all()
        assert out.loc[2, "text_clean"] == "aa\nbb"

    def test_planted_matches_duckdb(self, tmp_path):
        """Full oracle-SQL cross-check on a table where removal is
        actually exercised (the sf fixture's single-unique-line docs
        make the sweep entry a no-op)."""
        import __ray_entry__ as em

        rng = np.random.default_rng(5)
        paras = [f"para {i} text" for i in range(30)]
        docs = {}
        for did in range(40):
            k = rng.integers(2, 6)
            docs[did] = "\n".join(rng.choice(paras, size=k))
        # sprinkle empty lines and a doc of only empties
        docs[40] = "\n\n" + paras[0]
        docs[41] = "\n"
        d = self._write(tmp_path, docs)
        from blockspider_ray.pipelines.dedup import paragraph_dedup

        got = paragraph_dedup(d)
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
        )
        want = (
            con.sql(em.oracle_sql()["paragraph_dedup"])
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["n_removed_paras"].sum() > 0  # the plant actually removes
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestAnchorTexts:
    def test_kernel_edges(self):
        """extract_anchors HTML edge semantics: inner tags dropped,
        entities unescaped, whitespace collapsed, empty/img anchors and
        non-http schemes skipped, relative hrefs resolved."""
        from blockspider_ray.functions.extract import extract_anchors

        h = (
            b'<a href="/rel/x">Go &amp; <b>see</b>\n  this</a>'
            b'<a href="http://b.example/">  </a>'
            b'<a href="mailto:x@y">mail</a>'
            b'<a href="HTTPS://C.example/p">caps scheme</a>'
            b'<a target=_blank href="http://d.example/q">attrs before href</a>'
        )
        out = extract_anchors(h, "http://base.example/dir/page")
        assert ("http://base.example/rel/x", "Go & see this") in out
        assert all(u != "http://b.example/" for u, _ in out)  # empty text dropped
        assert all(not u.startswith("mailto") for u, _ in out)
        assert any(u.startswith("https://c.example") for u, _ in out)
        assert ("http://d.example/q", "attrs before href") in out

    def test_matches_sequential_reference(self):
        """The distributed aggregation equals a dict-based sequential
        pass over the same tiny-fixture pages (full frame equality)."""
        from collections import Counter, defaultdict

        import pyarrow.parquet as pq

        from blockspider_ray import gen
        from blockspider_ray.functions.extract import extract_anchors
        from blockspider_ray.pipelines.graph import anchor_texts

        out = anchor_texts("unused")
        pages_dir, _ = gen.ensure_fixture("tiny")
        t = pq.read_table(pages_dir, columns=["url", "html"])
        agg = defaultdict(Counter)
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            for dst, a in extract_anchors(h, u):
                agg[dst][a] += 1
        rows = []
        for dst, c in agg.items():
            top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            rows.append((dst, top[0], top[1], sum(c.values()), len(c)))
        ref = (
            pd.DataFrame(
                rows, columns=["url", "top_anchor", "top_n", "n_inlinks", "n_anchors"]
            )
            .sort_values("url")
            .reset_index(drop=True)
        )
        assert len(ref) > 1000  # the fixture exercises real fan-in
        pd.testing.assert_frame_equal(out, ref, check_dtype=False)

    def test_tie_breaks_lexicographically_and_bucket_invariant(self, tmp_path):
        """Equal-count anchors resolve to the lexicographically smallest
        label at any bucket width (pure dispatch choice)."""
        import ray.data as rd

        from blockspider_ray.pipelines.graph import anchor_agg

        pages = [
            ("http://s1.example/", b'<a href="http://t.example/">zeta</a><a href="http://t.example/">alpha</a>'),
            ("http://s2.example/", b'<a href="http://t.example/">zeta</a><a href="http://t.example/">alpha</a>'),
        ]
        ds = rd.from_items([{"url": u, "html": h} for u, h in pages])
        for B in (2, 64):
            out = anchor_agg(ds, n_buckets=B).to_pandas()
            row = out[out["url"] == "http://t.example/"].iloc[0]
            assert row["top_anchor"] == "alpha"
            assert row["top_n"] == 2
            assert row["n_inlinks"] == 4
            assert row["n_anchors"] == 2


class TestHostDegrees:
    def test_planted_mutual_oneway_selfloop(self):
        """A->B and B->A are mutual (+1 recip each); A->C one-way (no
        recip); C->C self-loop counts in degrees but never recip."""
        import ray.data as rd

        from blockspider_ray.pipelines.graph import degree_table

        edges = rd.from_items(
            [
                {"src": "a", "dst": "b", "w": 2.0},
                {"src": "b", "dst": "a", "w": 1.0},
                {"src": "a", "dst": "c", "w": 1.0},
                {"src": "c", "dst": "c", "w": 5.0},
            ]
        )
        out = degree_table(edges).to_pandas().set_index("host")
        assert out.loc["a", "out_deg"] == 2 and out.loc["a", "in_deg"] == 1
        assert out.loc["a", "n_recip"] == 1 and out.loc["b", "n_recip"] == 1
        assert out.loc["c", "n_recip"] == 0
        assert out.loc["c", "out_deg"] == 1 and out.loc["c", "in_deg"] == 2
        assert out.loc["c", "out_w"] == 5.0 and out.loc["c", "in_w"] == 6.0

    def test_matches_sequential_reference(self):
        from blockspider_ray import gen
        from blockspider_ray.pipelines.graph import host_degrees, host_graph

        out = host_degrees("unused")
        pages_dir, _ = gen.ensure_fixture("tiny")
        e = host_graph(pages_dir).to_pandas()
        hosts = sorted(set(e["src"]) | set(e["dst"]))
        ref = pd.DataFrame({"host": hosts}).set_index("host")
        ref["out_deg"] = e.groupby("src").size()
        ref["in_deg"] = e.groupby("dst").size()
        ref["out_w"] = e.groupby("src")["w"].sum()
        ref["in_w"] = e.groupby("dst")["w"].sum()
        pairs = set(zip(e["src"], e["dst"]))
        recip: dict[str, int] = {}
        for a, b in pairs:
            if a != b and a < b and (b, a) in pairs:
                recip[a] = recip.get(a, 0) + 1
                recip[b] = recip.get(b, 0) + 1
        ref["n_recip"] = pd.Series(recip)
        ref = ref.fillna(0).reset_index()
        for c in ("out_deg", "in_deg", "n_recip"):
            ref[c] = ref[c].astype("int64")
        ref = ref.sort_values("host").reset_index(drop=True)
        pd.testing.assert_frame_equal(out, ref, check_dtype=False)


class TestPolitenessAudit:
    def test_engine_log_audits_clean(self):
        """The engine's own tiny crawl must audit to zero violations at
        its configured budget, with totals that reconcile to the log."""
        import __ray_entry__ as em

        log = em.queries()["crawl_log"]("unused")
        out = em.queries()["politeness_audit"]("unused")
        assert (out["n_violations"] == 0).all()
        assert (out["max_per_round"] <= 2).all()
        assert out["n_fetched"].sum() == log.num_rows

    def test_planted_violations_counted_exactly(self):
        import pyarrow as pa

        from blockspider_ray.pipelines.windows import politeness_audit

        rows = (
            [("a", 0)] * 3      # round 0: a over budget (3 > 2)
            + [("a", 1)] * 2    # round 1: at budget
            + [("b", 0)] * 1
            + [("b", 2)] * 4    # round 2: b over budget
        )
        log = pa.table(
            {
                "host": pa.array([h for h, _ in rows], pa.string()),
                "round": pa.array([r for _, r in rows], pa.int64()),
            }
        )
        out = politeness_audit(log, budget=2).set_index("host")
        assert out.loc["a", "n_fetched"] == 5 and out.loc["a", "n_rounds"] == 2
        assert out.loc["a", "max_per_round"] == 3 and out.loc["a", "n_violations"] == 1
        assert out.loc["b", "n_fetched"] == 5 and out.loc["b", "n_rounds"] == 2
        assert out.loc["b", "max_per_round"] == 4 and out.loc["b", "n_violations"] == 1


class TestBM25Indexed:
    """bm25_topk_indexed == bm25_topk on the fixture (beyond the shared
    SQL oracle), and the path-pruning contract: with every non-query
    bucket directory deleted, the indexed answer is unchanged."""

    def test_equals_scan_multiple_queries(self, tmp_path):
        from blockspider_ray.pipelines.textstats import bm25_topk, bm25_topk_indexed

        idx = str(tmp_path / "idx")
        for q in ["hash table scan", "the fast", "zzz_absent"]:
            a = bm25_topk(SF, query=q)
            b = bm25_topk_indexed(SF, query=q, index_dir=idx)
            pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_pruned_buckets_unchanged(self, tmp_path):
        import os
        import shutil

        from blockspider_ray.functions.urls import hash64
        from blockspider_ray.pipelines.textstats import (
            bm25_build_sidecar,
            bm25_topk,
            bm25_topk_indexed,
            postings_build_index,
        )

        idx = str(tmp_path / "idx")
        q = "hash table scan"
        postings_build_index(SF, idx, n_buckets=8)
        bm25_build_sidecar(SF, idx)
        need = {int(h & np.uint64(7)) for h in hash64(sorted(set(q.split())))}
        for b in range(8):
            if b not in need:
                shutil.rmtree(os.path.join(idx, f"bucket={b}"), ignore_errors=True)
        got = bm25_topk_indexed(SF, query=q, index_dir=idx)
        ref = bm25_topk(SF, query=q)
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)


class TestSrpProject:
    def test_bit_equal_to_numpy_and_preserves_geometry(self):
        import pyarrow.parquet as pq

        from blockspider_ray.functions.urls import hash64
        from blockspider_ray.pipelines.similarity import srp_project

        t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
        V = np.stack([np.asarray(v, np.float64) for v in t["embedding"].to_pylist()])
        ids = np.array(t["vec_id"].to_pylist())
        o = np.argsort(ids)
        # the fixture's isotropic vectors have CONCENTRATED pairwise
        # distances, so rank correlation is uninformative; the JL lemma's
        # own distortion bound is the right instrument: squared-distance
        # ratios deviate from 1 by ~sqrt(2/d_out) on average
        for d_out in (16, 64):
            out = srp_project(SF, d_out=d_out).to_pandas().sort_values("vec_id")
            got = np.stack(out["proj"].to_numpy())
            idx = np.array(
                [f"{i}:{j}" for i in range(V.shape[1]) for j in range(d_out)],
                dtype=object,
            )
            S = np.where(
                (hash64(idx) & np.uint64(1)).astype(bool), 1.0, -1.0
            ).reshape(V.shape[1], d_out) / np.sqrt(float(d_out))
            Y = V[o] @ S
            assert np.array_equal(got, Y)  # bit-exact: same matmul, same matrix
            # JL sanity: norms preserved in expectation, distances correlated
            r = (got**2).sum(1) / np.maximum((V[o] ** 2).sum(1), 1e-12)
            assert 0.8 < r.mean() < 1.2
            rng = np.random.default_rng(0)
            a, b = rng.integers(0, len(V), 300), rng.integers(0, len(V), 300)
            keep = a != b
            d0 = ((V[o][a[keep]] - V[o][b[keep]]) ** 2).sum(1)
            d1 = ((got[a[keep]] - got[b[keep]]) ** 2).sum(1)
            distortion = np.abs(d1 / np.maximum(d0, 1e-12) - 1.0)
            assert distortion.mean() < 3.0 * np.sqrt(2.0 / d_out)


class TestCCNetCorpus:
    def test_planted_three_stage_pipeline(self, tmp_path):
        """Each stage visibly acts on a planted corpus: a cross-doc
        repeated paragraph survives only in its first doc, a
        boilerplate footer in >=3 docs vanishes everywhere, and the
        per-lang tercile tail (rare-token docs) is dropped; the
        composed SQL oracle agrees on the whole frame."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        import __ray_entry__ as em
        from blockspider_ray.pipelines.corpus import ccnet_corpus

        footer = "footer copyright nav"
        docs, langs = {}, {}
        # 9 fluent docs: per-doc-unique common-token bodies (so stage-2
        # paragraph dedup can't empty them) + a footer line in all 9
        # (>= min_docs: stage-1 boilerplate, removed from EVERY copy);
        # docs 0 and 1 share one paragraph (d=2 < min_docs: survives
        # stage 1, stage 2 keeps only doc 0's first occurrence)
        # the shared paragraph reuses the HIGH-count words so it cannot
        # dilute doc 0's fluency rank into the dropped tail
        shared = "common tokens common always"
        for i in range(9):
            body = f"common tokens appear everywhere always common d{i}"
            if i == 0:
                body = shared + "\n" + body
            if i == 1:
                body = body + "\n" + shared
            docs[i] = body + "\n" + footer
            langs[i] = "en"
        # 3 rare-token docs: the en tercile tail
        for i in range(9, 12):
            docs[i] = f"zzq{i} xxw{i} vvr{i} uut{i}"
            langs[i] = "en"
        d = str(tmp_path)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values()), pa.string()),
                    "lang": pa.array([langs[i] for i in docs], pa.string()),
                }
            ),
            f"{d}/documents.parquet",
        )
        out = ccnet_corpus(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
        kept = set(out["doc_id"])
        assert kept & {9, 10, 11} == set()  # tail bucket dropped
        texts = dict(zip(out["doc_id"], out["text"]))
        assert shared in texts[0]  # first occurrence survives
        assert shared not in texts.get(1, "")  # later copy deduped
        assert all(footer not in t for t in texts.values())  # boilerplate gone
        # full-frame oracle agreement on the planted table
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
        want = (
            con.sql(em.oracle_sql()["ccnet_corpus"]).df().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            out[sorted(out.columns)], want[sorted(want.columns)], check_dtype=False
        )


class TestRecrawlPriority:
    def test_reconciles_with_snapshot_diff_and_bucket_invariant(self):
        """The per-source change/removal totals must reconcile exactly
        with snapshot_diff's own output (the pipeline consumes the real
        delta, not the oracle's analytic shortcut), and the bucket
        width must be a pure dispatch choice."""
        from blockspider_ray.pipelines.corpus import recrawl_priority, snapshot_diff

        out = recrawl_priority(SF)
        diff = snapshot_diff(SF).to_pandas()
        n_changed = (diff["status"] == "changed").sum()
        n_removed = (diff["status"] == "removed").sum()
        assert out["n_changed"].sum() == n_changed
        assert out["n_removed"].sum() == n_removed
        assert (out["priority"].to_numpy() == np.arange(1, len(out) + 1)).all()
        b = recrawl_priority(SF, n_buckets=4)
        pd.testing.assert_frame_equal(out, b, check_dtype=False)
        # the operational path: a precomputed diff rolls up identically
        c = recrawl_priority(SF, diff=snapshot_diff(SF))
        pd.testing.assert_frame_equal(out, c, check_dtype=False)


class TestHostComponents:
    def test_planted_islands_and_selfloop_singleton(self):
        import ray.data as rd

        from blockspider_ray.pipelines.graph import component_table

        edges = rd.from_items(
            [
                {"src": "b", "dst": "a", "w": 1.0},   # island 1: {a, b}
                {"src": "c", "dst": "d", "w": 1.0},   # island 2: {c, d, e}
                {"src": "d", "dst": "e", "w": 1.0},
                {"src": "z", "dst": "z", "w": 9.0},   # self-loop only: singleton
            ]
        )
        out = component_table(edges).set_index("host")
        assert out.loc["a", "component"] == "a" and out.loc["b", "component"] == "a"
        assert all(out.loc[h, "component"] == "c" for h in ("c", "d", "e"))
        assert out.loc["z", "component"] == "z" and out.loc["z", "component_size"] == 1
        assert out.loc["c", "component_size"] == 3

    def test_matches_union_find_on_tiny_web(self):
        from blockspider_ray import gen
        from blockspider_ray.pipelines.graph import host_components, host_graph

        out = host_components("unused")
        pages_dir, _ = gen.ensure_fixture("tiny")
        e = host_graph(pages_dir).to_pandas()
        parent: dict[str, str] = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        hosts = sorted(set(e["src"]) | set(e["dst"]))
        for a, b in zip(e["src"], e["dst"]):
            if a != b:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
        comp: dict[str, list[str]] = {}
        for h in hosts:
            comp.setdefault(find(h), []).append(h)
        lab = {r: min(v) for r, v in comp.items()}
        ref = pd.DataFrame({"host": hosts})
        ref["component"] = [lab[find(h)] for h in hosts]
        ref["component_size"] = (
            ref.groupby("component")["host"].transform("size").astype("int64")
        )
        ref = ref.sort_values("host").reset_index(drop=True)
        pd.testing.assert_frame_equal(out, ref, check_dtype=False)


class TestKCore:
    @staticmethod
    def _peel(edge_list):
        """Exact core numbers by min-degree peeling (the textbook
        algorithm the h-index fixpoint must agree with)."""
        import heapq

        adj: dict[str, set] = {}
        for a, b in edge_list:
            if a == b:
                continue
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        deg = {v: len(ns) for v, ns in adj.items()}
        core = dict(deg)
        alive = set(adj)
        h = [(d, v) for v, d in deg.items()]
        heapq.heapify(h)
        k = 0
        while h:
            d, v = heapq.heappop(h)
            if v not in alive or d != deg[v]:
                continue
            k = max(k, d)
            core[v] = k
            alive.discard(v)
            for u in adj[v]:
                if u in alive:
                    deg[u] -= 1
                    heapq.heappush(h, (deg[u], u))
        return core

    def test_planted_k5_path_tailed_clique(self):
        import ray.data as rd

        from blockspider_ray.pipelines.graph import kcore

        edges = []
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((f"k{i}", f"k{j}"))  # K5: core 4
        edges += [("p1", "p2"), ("p2", "p3"), ("p3", "p4")]  # path: core 1
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((f"q{i}", f"q{j}"))  # K4 + tail
        edges.append(("q0", "tail"))
        ds = rd.from_items([{"src": a, "dst": b, "w": 1.0} for a, b in edges])
        out = kcore(ds).set_index("host")["core"].to_dict()
        assert out == self._peel(edges)
        assert out["k0"] == 4 and out["p2"] == 1 and out["tail"] == 1 and out["q0"] == 3

    def test_matches_peeling_on_tiny_web(self):
        from blockspider_ray import gen
        from blockspider_ray.pipelines.graph import host_graph, host_kcore

        out = host_kcore("unused")
        pages_dir, _ = gen.ensure_fixture("tiny")
        e = host_graph(pages_dir).to_pandas()
        ref = self._peel(list(zip(e["src"], e["dst"])))
        assert dict(zip(out["host"], out["core"])) == ref


class TestRobotsAudit:
    def test_engine_log_audits_clean_and_rules_present(self):
        import __ray_entry__ as em

        log = em.queries()["crawl_log"]("unused")
        out = em.queries()["robots_audit"]("unused")
        assert (out["n_violations"] == 0).all()
        assert (out["n_rules"] > 0).any()  # the fixture DOES plant rules
        assert out["n_fetched"].sum() == log.num_rows

    def test_planted_violation_counted_exactly(self):
        import pyarrow as pa

        import __ray_entry__ as em
        from blockspider_ray import gen
        from blockspider_ray.pipelines.windows import robots_audit

        pages_dir, _ = gen.ensure_fixture("tiny")
        base = em.queries()["robots_audit"]("unused")
        ruled = base[base["n_rules"] > 0]["host"].iloc[0]
        fake = pa.table(
            {
                "host": pa.array([ruled] * 3, pa.string()),
                "url": pa.array(
                    [
                        f"http://{ruled}/p/000001",  # under the Disallow: /p/00 prefix
                        f"http://{ruled}/p/007777",  # also disallowed
                        f"http://{ruled}/ok/page",   # allowed
                    ],
                    pa.string(),
                ),
            }
        )
        out = robots_audit(pages_dir, fake).set_index("host")
        assert out.loc[ruled, "n_fetched"] == 3
        assert out.loc[ruled, "n_violations"] == 2


class TestValueQuantilesExact:
    def test_negative_values_and_extremes(self, tmp_path):
        """The IEEE total-order fold must sort negatives correctly
        (the sf fixture is all-positive, so this plants a signed
        domain) and the q=0/q=1 edges must clamp to min/max."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.windows import value_quantiles_exact

        vals = [-5.25, -0.0, 0.0, 3.5, -100.0, 7.25, 0.25, -1.5]
        pq.write_table(
            pa.table({"event_id": pa.array(range(len(vals)), pa.int64()),
                      "value": pa.array(vals, pa.float64())}),
            f"{tmp_path}/events.parquet",
        )
        qs = (0.0, 0.25, 0.5, 0.75, 1.0)
        out = value_quantiles_exact(str(tmp_path), qs=qs)
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
        )
        sel = [
            con.execute(f"SELECT quantile_disc(value, {q}) FROM events").fetchone()[0]
            for q in qs
        ]
        assert out["value"].tolist() == [float(x) for x in sel]
        assert out["value"].iloc[0] == -100.0 and out["value"].iloc[-1] == 7.25

    def test_boundary_cap_guard(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import pytest as _pytest

        from blockspider_ray.pipelines.windows import value_quantiles_exact

        pq.write_table(
            pa.table({"value": pa.array([1.0] * 100, pa.float64())}),
            f"{tmp_path}/events.parquet",
        )
        with _pytest.raises(RuntimeError, match="driver-collection cap"):
            value_quantiles_exact(str(tmp_path), qs=(0.5,), max_boundary_rows=10)


class TestNearDupIncremental:
    def test_planted_lifecycle(self, tmp_path):
        """Build the index on the even-id corpus, probe odd-id shards:
        a planted near-dup and an exact dup are found at threshold 0.5,
        unrelated random docs are rejected, and after update_index a
        day-2 probe finds a day-1 document."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.dedup import (
            neardup_incremental,
            neardup_index_build,
        )

        rng = np.random.default_rng(7)
        words = [f"w{i}" for i in range(500)]
        texts = [" ".join(rng.choice(words, size=80)) for _ in range(40)]
        ids = [2 * i for i in range(40)]
        t0 = texts[0].split()
        t0v = t0[:70] + ["x1", "x2", "x3"] + t0[73:]
        new_texts = [" ".join(rng.choice(words, size=80)) for _ in range(10)]
        new_ids = [2 * i + 1 for i in range(10)]
        new_texts[0], new_ids[0] = " ".join(t0v), 101   # near-dup of 0
        new_texts[1], new_ids[1] = texts[1], 103        # exact dup of 2
        d = str(tmp_path / "data")
        (tmp_path / "data").mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids + new_ids, pa.int64()),
                    "text": pa.array(texts + new_texts, pa.string()),
                }
            ),
            f"{d}/documents.parquet",
        )
        idx = str(tmp_path / "idx")
        assert neardup_index_build(d, idx, parity=0) == 40
        out = neardup_incremental(d, index_dir=idx, parity=1, threshold=0.5)
        pairs = set(zip(out["new_doc"], out["index_doc"]))
        assert (101, 0) in pairs and (103, 2) in pairs
        assert out.set_index(["new_doc", "index_doc"]).loc[(103, 2), "est_jaccard"] == 1.0
        assert all(nd in (101, 103) for nd, _ in pairs)  # no false positives
        # ingest day 1, then probe a day-2 shard that dups a day-1 doc
        neardup_incremental(
            d, index_dir=idx, parity=1, threshold=0.5, update_index=True, shard_tag="d1"
        )
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([201], pa.int64()),
                    "text": pa.array([new_texts[2]], pa.string()),
                }
            ),
            f"{d}/documents.parquet",
        )
        out2 = neardup_incremental(d, index_dir=idx, parity=1, threshold=0.5)
        assert (201, new_ids[2]) in set(zip(out2["new_doc"], out2["index_doc"]))

    def test_update_is_exactly_once_per_tag(self, tmp_path):
        """Re-running the same shard_tag ingest must not duplicate index
        rows (a duplicated band row would double-emit candidates)."""
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from blockspider_ray.pipelines.dedup import (
            neardup_incremental,
            neardup_index_build,
        )

        d = str(tmp_path / "data")
        (tmp_path / "data").mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0, 2, 1, 3], pa.int64()),
                    "text": pa.array(
                        ["a b c d e f g", "h i j k l m n", "a b c d e f g", "zz yy xx ww vv uu tt"],
                        pa.string(),
                    ),
                }
            ),
            f"{d}/documents.parquet",
        )
        idx = str(tmp_path / "idx")
        neardup_index_build(d, idx, parity=0)
        for _ in range(2):  # second run must be a no-op
            neardup_incremental(d, index_dir=idx, parity=1, update_index=True, shard_tag="s1")
        n_band_files = sum(
            len(files)
            for _, _, files in os.walk(os.path.join(idx, "bands"))
        )
        # one build write + ONE ingest write per partition set — a
        # doubled ingest would add a third file generation
        probe = neardup_incremental(d, index_dir=idx, parity=1, threshold=0.5)
        dup_pairs = probe[probe["new_doc"] == 1]
        assert len(dup_pairs) == 1 and dup_pairs.iloc[0]["index_doc"] == 0
