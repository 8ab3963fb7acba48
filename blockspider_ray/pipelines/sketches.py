"""Mergeable-sketch operators — the approximate-aggregation family for
value/key universes too large to shuffle exactly. Three sketches, one
shape: the per-batch partial is a FIXED-SIZE summary that rides the
all-to-all instead of raw values, partials merge associatively, and the
final dispatch is bounded by the group count, not the data.

- **Cardinality**: ``hll_users_per_type`` — HyperLogLog register arrays
  (Flajolet et al. 2007), one 2^p-byte row per (event_type, batch)
  regardless of how many distinct users a batch holds; registers merge
  by elementwise max (order- and partition-insensitive). Exact
  companion ``distinct_users_per_type`` (SQL-oracled) shuffles the
  deduped pair universe — fine while it fits an all-to-all.
- **Quantiles**: ``value_quantiles_sketch`` — DDSketch-style log-binned
  histogram (Masson et al. VLDB 2019) with a guaranteed RELATIVE error,
  for real-valued columns where ``doc_len_quantiles``'s exact
  compressed-distribution trick degenerates to one row per row.
- **Heavy hitters**: ``vocab_topk_sketch`` — Misra-Gries summaries with
  a deterministic undercount interval, capping each batch's shuffle
  contribution at ``m`` rows where exact ``vocab_topk`` moves the whole
  batch vocabulary.

No SQL oracle for the sketches (approximate by construction); pytest
pins each one's error against its exact companion on the fixture and on
planted tables that force the approximation to actually engage (10x
cardinalities, heavy-tailed distinct doubles, Zipf trimming).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Sum

from .common import T, rename


def distinct_users_per_type(sf_dir: str) -> pd.DataFrame:
    """EXACT distinct users per event type. Unlike the doc-keyed text
    partials (where a doc is whole within one batch), a user's events
    span batches, so per-batch distincts are NOT globally distinct —
    the exact path must shuffle the (event_type, user_id) pair universe
    once (deduped per batch first, so each batch contributes each pair
    once), then count per type with additive partials."""
    ds = T(sf_dir, "events", columns=["event_type", "user_id"])

    def batch_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "user_id"]).aggregate([])

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate([([], "count_all")])
        return rename(g, {"count_all": "p_n"})

    out = (
        ds.map_batches(batch_distinct, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="_c"))
        .select_columns(["event_type", "user_id"])
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("p_n", alias_name="n_users"))
        .to_pandas()
    )
    return out.sort_values("event_type").reset_index(drop=True)


def distinct_users_per_window(sf_dir: str) -> pd.DataFrame:
    """EXACT distinct users per (event_type, tumbling hour) — the
    windowed-cardinality composition (``tumbling_hour``'s window key x
    ``distinct_users_per_type``'s dedup discipline): unique-visitors-
    per-hour, the canonical web-analytics exact rollup.

    Same two-shuffle shape as the per-type op: window assignment is a
    vectorized ``floor_temporal``; each batch contributes each
    (type, hour, user) triple once (in-batch dedup), one groupby
    dedups the triple universe globally, then additive partials count
    per (type, hour). The triple universe is what it is — exact
    windowed distinct cannot shrink it (that's what ``hll_users_per_
    type`` exists for); what the shape guarantees is that raw events
    never ride the all-to-all, only deduped triples."""
    ds = T(sf_dir, "events", columns=["event_type", "ts", "user_id"])

    def batch_distinct(t: pa.Table) -> pa.Table:
        t = t.append_column("hour", pc.floor_temporal(t["ts"], unit="hour"))
        return t.drop_columns("ts").group_by(["event_type", "hour", "user_id"]).aggregate([])

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "hour"]).aggregate([([], "count_all")])
        return rename(g, {"count_all": "p_n"})

    out = (
        ds.map_batches(batch_distinct, batch_format="pyarrow")
        .groupby(["event_type", "hour", "user_id"])
        .aggregate(Count(alias_name="_c"))
        .select_columns(["event_type", "hour", "user_id"])
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("p_n", alias_name="n_users"))
        .to_pandas()
    )
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)


def hll_users_per_type(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """HyperLogLog distinct-user estimate per event type.

    Per batch: splitmix64-mix each user id (the same avalanche mix the
    cluster bucketing uses — ids are sequential, raw bits are not
    uniform), take the top ``p`` bits as the register index and
    rho = leading-zero count of the remaining ``64-p`` bits + 1; emit
    one row per event type in the batch with the 2^p int8 register
    array. One groupby merges by elementwise max and applies the
    standard estimator with the small-range (linear counting)
    correction. Returns (event_type, n_users_est) as int64."""
    m = 1 << p
    ds = T(sf_dir, "events", columns=["event_type", "user_id"])

    def mix(x: np.ndarray) -> np.ndarray:
        x = x.astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # dictionary-encode the group column: the row-length array stays
        # int32 codes (no per-row python strings), only the tiny
        # distinct-type dictionary is materialized
        enc = pc.dictionary_encode(t["event_type"].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cats = enc.dictionary.to_pylist()
        h = mix(uid)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        # sentinel low bits guarantee rest != 0 and cap rho at 64-p+1
        # (the HLL max for a 64-p bit suffix)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
        # highest-set-bit position via branchless binary descent, then
        # rho = leading zeros + 1
        bitlen = np.zeros(len(rest), dtype=np.int64)
        r = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = r >= (np.uint64(1) << np.uint64(shift))
            bitlen[mask] += shift
            r[mask] >>= np.uint64(shift)
        bitlen += 1  # 1-based position of the highest set bit
        rho = (64 - bitlen + 1).astype(np.int8)  # leading zeros + 1
        out_t, out_regs = [], []
        order = np.argsort(codes, kind="stable")  # int sort, not str
        et_s, idx_s, rho_s = codes[order], idx[order], rho[order]
        starts = np.flatnonzero(
            np.concatenate(([True], et_s[1:] != et_s[:-1]))
        )
        bounds = np.append(starts, len(et_s))
        for k in range(len(starts)):
            a, b = bounds[k], bounds[k + 1]
            regs = np.zeros(m, dtype=np.int8)
            np.maximum.at(regs, idx_s[a:b], rho_s[a:b])
            out_t.append(cats[et_s[a]])
            out_regs.append(regs)
        return pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "regs": pa.array([r.tolist() for r in out_regs], pa.list_(pa.int8())),
            }
        )

    def merge_estimate(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, dtype=np.int64)
        for r in g["regs"]:
            np.maximum(regs, np.asarray(r, dtype=np.int64), out=regs)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
        zeros = int((regs == 0).sum())
        if est <= 2.5 * m and zeros:  # small-range linear counting
            est = m * np.log(m / zeros)
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]], "n_users_est": [int(round(est))]}
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge_estimate, batch_format="pandas")  # #event_types groups
        .to_pandas()
    )
    return out.sort_values("event_type").reset_index(drop=True)


def value_quantiles_sketch(
    sf_dir: str, qs: tuple = (0.5, 0.9, 0.99), rel_err: float = 0.01
) -> pd.DataFrame:
    """Approximate per-type quantiles of ``events.value`` via a
    mergeable log-binned histogram (the DDSketch construction, Masson
    et al. VLDB 2019: guaranteed RELATIVE-error quantiles from
    fixed-size additive partials).

    Why a sketch here when ``doc_len_quantiles`` is exact: that op's
    compressed-distribution trick is bounded by #distinct values, which
    works for small-int token lengths but degenerates to one partial
    row PER ROW on a real-valued column — exact quantiles over doubles
    need a full sort. The sketch bins value v into
    floor(log(v)/log(gamma)), gamma = (1+e)/(1-e), so each (type, bin,
    count) partial table is bounded by #bins (~1.4k for a 1e-9..1e9
    range at e=1%) regardless of row count or value cardinality; bins
    merge additively (one tiny groupby-Sum shuffle) and the bin's
    geometric midpoint is within ``rel_err`` of any value it holds.
    Estimates target ``quantile_disc`` (lower-value-at-position) so the
    pytest pin compares like to like. Zeros get DDSketch's dedicated
    zero bin (a sentinel that sorts below every log bin and estimates
    exactly 0.0 — relative error is undefined at 0, absolute error is
    0); NEGATIVE values would need the mirrored second ladder and the
    guard below raises rather than silently mis-binning them."""
    gamma = (1.0 + rel_err) / (1.0 - rel_err)
    log_g = np.log(gamma)
    zero_bin = np.int64(-(1 << 62))  # sorts below any reachable log bin
    ds = T(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        if len(v) and v.min() < 0:
            raise ValueError("value_quantiles_sketch: negative values need a mirrored ladder")
        with np.errstate(divide="ignore"):
            b = np.where(v > 0, np.ceil(np.log(np.maximum(v, 1e-300)) / log_g), zero_bin).astype(
                np.int64
            )
        g = (
            pa.table({"event_type": t["event_type"], "bin": pa.array(b, pa.int64())})
            .group_by(["event_type", "bin"])
            .aggregate([([], "count_all")])
        )
        return rename(g, {"count_all": "p_n"})

    def estimate(g: pd.DataFrame) -> pd.DataFrame:
        b = g["bin"].to_numpy(dtype=np.int64)
        w = g["n"].to_numpy(dtype=np.int64)
        o = np.argsort(b)
        b, w = b[o], w[o]
        cum = np.cumsum(w)
        total = cum[-1]
        row = {"event_type": g["event_type"].iloc[0]}
        for q in qs:
            # quantile_disc rank (Postgres/DuckDB convention): the
            # smallest value whose cumulative fraction >= q, i.e.
            # 0-based position ceil(q*n)-1 -> first bin whose
            # cumulative count covers it
            pos = max(int(np.ceil(q * total)) - 1, 0)
            k = b[np.searchsorted(cum, pos + 1, side="left")]
            # geometric midpoint of bin (gamma^(k-1), gamma^k]; the
            # zero bin estimates exactly 0.0
            est = 0.0 if k == zero_bin else float(2.0 * gamma**k / (gamma + 1.0))
            row[f"p{int(q * 100)}"] = round(est, 4)
        return pd.DataFrame([row])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "bin"])
        .aggregate(Sum("p_n", alias_name="n"))
        .groupby("event_type")
        .map_groups(estimate, batch_format="pandas")  # #event_types groups
        .to_pandas()
    )
    return out.sort_values("event_type").reset_index(drop=True)


def vocab_topk_sketch(sf_dir: str, k: int = 100, m: int = 4096) -> pd.DataFrame:
    """Approximate vocabulary heavy hitters — the Misra-Gries summary
    (Misra & Gries 1982; merge rule per Agarwal et al. PODS 2012) as the
    scale companion of the exact ``textstats.vocab_topk``.

    Why: the exact op's shuffle moves one row per (token, batch) — fine
    while the vocab fits the all-to-all, but a 100-TB web corpus's token
    universe (typos, URLs, hashes) is effectively unbounded. The sketch
    caps every batch's contribution at ``m`` rows with a DETERMINISTIC
    undercount bound: take the batch's exact histogram, subtract the
    (m+1)-th largest count from every token, keep the positive ones —
    the classic summary with per-batch undercount <= that pivot <=
    N_batch/(m+1). Trims ride the same shuffle as a sentinel row, so
    the merged output carries the exact global error bound B = sum of
    batch trims, and for every token: n_est <= true count <= n_est + B
    (tokens missing from the sketch have true count <= B). The final
    sort+limit runs over <= m x n_batches surviving rows instead of the
    full vocab. Returned columns: (token, n_est, err_bound); pytest pins
    the interval against the exact companion and planted Zipf batches.
    """
    from .textstats import _token_pairs

    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        g = _token_pairs(t).group_by("tok").aggregate([([], "count_all")])
        n = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = g["tok"].to_numpy(zero_copy_only=False)
        if len(n) > m:
            pivot = np.partition(n, len(n) - (m + 1))[len(n) - (m + 1)]
        else:
            pivot = np.int64(0)
        kept = n - pivot > 0
        out_tok = np.concatenate([toks[kept], np.asarray([""], dtype=object)])
        out_n = np.concatenate([(n - pivot)[kept], np.asarray([pivot], dtype=np.int64)])
        return pa.table(
            {"token": pa.array(out_tok.tolist(), pa.string()), "p_n": pa.array(out_n, pa.int64())}
        )

    # The merged sketch is bounded (<= m rows per batch survive the
    # trim), but at web scale "m x n_batches surviving tokens" is still
    # a table, not a driver frame — so the top-k stays DISTRIBUTED
    # (sort+limit, same as the exact vocab_topk) and the driver pulls
    # exactly k rows plus the single merged sentinel row. materialize()
    # here holds only the post-shuffle sketch table (vocab-bounded, a
    # tiny fraction of the input) so the two consumers below don't
    # re-run the corpus pass.
    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("p_n", alias_name="n_est"))
        .materialize()
    )

    def keep(sentinel: bool):
        def f(t: pa.Table) -> pa.Table:
            mask = pc.equal(t["token"], "") if sentinel else pc.not_equal(t["token"], "")
            return t.filter(mask)

        return f

    bound_df = merged.map_batches(keep(True), batch_format="pyarrow").to_pandas()  # <=1 row
    bound = int(bound_df["n_est"].sum())
    out = (
        merged.map_batches(keep(False), batch_format="pyarrow")
        .sort(["n_est", "token"], descending=[True, False])
        .limit(k)
        .to_pandas()
        .reset_index(drop=True)
    )
    out["err_bound"] = np.int64(bound)
    return out


# Count-Min sketch (Cormode & Muthukrishnan 2005): d independent rows of
# w counters; a token's estimate is the MIN over its d row cells, so the
# estimate NEVER undercounts and overcounts by the colliding mass of the
# lightest row (expected <= N/w per row). Four fixed odd multipliers
# derive the d row indices from one 64-bit token hash (multiply-shift).
_CM_MULT = (
    0x9E3779B97F4A7C15,
    0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9,
    0x27D4EB2F165667C5,
)


def _cm_rows(h: np.ndarray, d: int, w: int) -> np.ndarray:
    """(d, n) row-cell indices for hashes ``h`` (w must be a power of two)."""
    assert w & (w - 1) == 0, "countmin width must be a power of two"
    shift = np.uint64(64 - int(np.log2(w)))
    return np.stack(
        [((h * np.uint64(_CM_MULT[r % len(_CM_MULT)] | 1)) >> shift).astype(np.int64) for r in range(d)]
    )


def countmin_freq(
    sf_dir: str, d: int = 4, w: int = 8192, k: int = 50, n_merge: int = 64
) -> pd.DataFrame:
    """Count-Min token-frequency estimates for the corpus's exact top-k
    vocabulary — the mergeable point-frequency sketch that answers
    "how often does token X occur" without ever shuffling the token
    universe: each batch contributes ONE fixed-size row (d x w int64
    counters, ~256 KB at the defaults) regardless of its vocabulary, and
    partials merge by elementwise SUM (associative, partition- and
    order-insensitive, unlike the Misra-Gries summaries whose merge
    trims). Merge is a two-level tree: batch partials land in
    ``n_merge`` groupby buckets (bounded dispatch), bucket sums land on
    the driver (n_merge rows — never one per batch, which at 100 TB is
    10^6+ sketch rows on one heap).

    Probe set = ``vocab_topk``'s exact top-k (a separate distributed
    pass), so the returned frame pairs each heavy hitter with its
    sketched count. CM guarantees est >= exact always; pytest pins that
    plus the collision-mass ceiling on the fixture and on a planted
    narrow-width table that forces collisions. Approximate by
    construction -> no SQL oracle (rows-only driver check)."""
    from ..functions.urls import hash64
    from .textstats import _token_pairs, vocab_topk

    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = _token_pairs(t)["tok"]
        sk = np.zeros((d, w), dtype=np.int64)
        if len(toks):
            h = hash64(toks.to_pylist())
            rows = _cm_rows(h, d, w)
            for r in range(d):
                np.add.at(sk[r], rows[r], 1)
        b = int(h[0] % np.uint64(n_merge)) if len(toks) else 0
        return pa.table(
            {
                "b": pa.array([b], pa.int64()),
                "sk": pa.array([sk.reshape(-1).tolist()], pa.list_(pa.int64())),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(d * w, dtype=np.int64)
        for s in g["sk"]:
            acc += np.asarray(s, dtype=np.int64)
        return pd.DataFrame({"b": [int(g["b"].iloc[0])], "sk": [acc]})

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("b")
        .map_groups(merge, batch_format="pandas")  # <= n_merge groups
        .to_pandas()
    )
    sketch = np.zeros(d * w, dtype=np.int64)
    for s in parts["sk"]:
        sketch += np.asarray(s, dtype=np.int64)
    sketch = sketch.reshape(d, w)

    probe = vocab_topk(sf_dir, k)  # exact heavy hitters (distributed)
    h = hash64(probe["token"].tolist())
    rows = _cm_rows(h, d, w)
    est = sketch[np.arange(d)[:, None], rows].min(axis=0)
    out = pd.DataFrame({"token": probe["token"], "est_n": est.astype(np.int64)})
    return out.sort_values(["est_n", "token"], ascending=[False, True]).reset_index(drop=True)
