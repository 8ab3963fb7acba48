"""Relational pipelines over the TPC-H-ish test tables.

Each pipeline re-expresses one operator family from the reference
(SURVEY.md §2) Ray-Data-first; each has a DuckDB oracle in
``__ray_entry__.oracle_sql`` with matching column names.

Reference parity notes are cited per function.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from .common import T, rename

_CUTOFF = _dt.datetime(1998, 9, 2)


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """Grouped aggregate with partial (in-batch) pre-aggregation — the
    windowed throughput-stats analog (crawler/logger.go:16-55, A2): the
    shuffle moves one partial row per (group, batch), not 600k rows."""

    ds = T(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(_CUTOFF)))
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        t = t.append_column("disc_price", disc)
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"), ("disc_price", "sum"), ("l_quantity", "count")]
        )
        return rename(
            g,
            {
                "l_quantity_sum": "p_qty",
                "l_extendedprice_sum": "p_price",
                "disc_price_sum": "p_disc",
                "l_quantity_count": "p_n",
            },
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("p_qty", alias_name="sum_qty"),
            Sum("p_price", alias_name="sum_base_price"),
            Sum("p_disc", alias_name="sum_disc_price"),
            Sum("p_n", alias_name="count_order"),
        )
        .to_pandas()
    )
    out["avg_qty"] = (out["sum_qty"] / out["count_order"]).round(4)
    out["avg_price"] = (out["sum_base_price"] / out["count_order"]).round(4)
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        out[c] = out[c].round(2)
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def filter_project(sf_dir: str) -> rd.Dataset:
    """Vectorized predicate + projection + computed column — the per-sink
    log-filter analog (crawler/blocks.go:202-228, M5) with the envelope's
    constant columns (M7: kafka/kafka.go:16-20)."""
    ds = T(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity", "l_extendedprice", "l_discount"])

    def f(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.greater(t["l_quantity"], 30.0), pc.less(t["l_discount"], 0.05))
        t = t.filter(mask)
        # unrounded: the per-row product is bit-identical to the oracle's
        # (same IEEE double ops in the same order), unlike SUM aggregates
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        t = t.append_column("revenue", rev)
        t = t.append_column("version", pa.array(np.full(t.num_rows, 1, dtype=np.int32)))
        return t.select(["l_orderkey", "l_quantity", "revenue", "version"])

    return ds.map_batches(f, batch_format="pyarrow")


def join_customer_orders(sf_dir: str) -> pd.DataFrame:
    """Broadcast hash join (small side shipped once via ray.put, looked up
    per batch) — the per-row receipt-lookup join done batch-wise
    (common/blocks.go:44-58, J1/J5)."""
    cust = T(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    ds = T(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def join(t: pa.Table) -> pa.Table:
        seg_map = ray.get(ref)
        segs = pd.Series(t["o_custkey"].to_numpy(zero_copy_only=False)).map(seg_map).fillna("UNKNOWN")
        t = t.append_column("c_mktsegment", pa.array(segs, pa.string()))
        g = t.group_by("c_mktsegment").aggregate([("o_totalprice", "sum"), ("o_totalprice", "count")])
        return rename(g, {"o_totalprice_sum": "p_total", "o_totalprice_count": "p_n"})

    out = (
        ds.map_batches(join, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("p_total", alias_name="total_price"), Sum("p_n", alias_name="n_orders"))
        .to_pandas()
    )
    out["total_price"] = out["total_price"].round(2)
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def join_orders_lineitem(sf_dir: str, n_buckets: int = 16) -> pd.DataFrame:
    """Large-large join as an explicit partitioned hash join — the
    portable pattern: both sides get a ``bucket = key % B`` column, the
    tagged union is grouped by bucket, and each bucket joins + partially
    aggregates inside ``map_groups`` (so the second shuffle moves one
    partial row per (status, bucket), not the joined rows). One
    deliberate all-to-all, with the combiner discipline of SURVEY.md §4.
    Hot-key note: TPC-H keys are uniform; for skewed keys the bucket
    column would be salted (key %% B + salt of the hot keys)."""
    assert n_buckets & (n_buckets - 1) == 0, (
        f"n_buckets must be a power of two (bit_wise_and bucketing), got {n_buckets}"
    )
    li = T(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def tag_left(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        key = t["l_orderkey"]
        return pa.table(
            {
                "bucket": pc.cast(pc.bit_wise_and(key, n_buckets - 1), pa.int64()),
                "key": key,
                "rev": r,
                "o_orderstatus": pa.nulls(t.num_rows, pa.string()),
                "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            }
        )

    def tag_right(t: pa.Table) -> pa.Table:
        key = t["o_orderkey"]
        return pa.table(
            {
                "bucket": pc.cast(pc.bit_wise_and(key, n_buckets - 1), pa.int64()),
                "key": key,
                "rev": pa.nulls(t.num_rows, pa.float64()),
                "o_orderstatus": t["o_orderstatus"],
                "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }
        )

    left = li.map_batches(tag_left, batch_format="pyarrow")
    right = T(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"]).map_batches(
        tag_right, batch_format="pyarrow"
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0][["key", "rev"]]
        r = g[g["side"] == 1][["key", "o_orderstatus"]]
        m = l.merge(r, on="key", how="inner")
        part = m.groupby("o_orderstatus", as_index=False).agg(p_rev=("rev", "sum"), p_n=("rev", "size"))
        return part

    out = (
        left.union(right)
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
        .groupby("o_orderstatus")
        .aggregate(Sum("p_rev", alias_name="revenue"), Sum("p_n", alias_name="n_items"))
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(2)
    out["n_items"] = out["n_items"].astype("int64")
    return out.sort_values("o_orderstatus").reset_index(drop=True)


def join_orders_lineitem_bloom(
    sf_dir: str,
    price_min: float = 200000.0,
    n_buckets: int = 16,
    log2_m: int = 20,
    k_hashes: int = 4,
) -> pd.DataFrame:
    """Bloom-pushdown join: revenue per status over lineitems of
    HIGH-VALUE orders only — the selective-join shape where most probe
    rows match nothing. The filtered orders' keys are folded into a
    fixed ``2^log2_m``-bit Bloom bitmap (per-batch bitmap partials,
    OR-merged: ~1.25 B/key at 1% FP vs 8+ B/key for an exact broadcast
    set — the regime where the build side outgrows the broadcast budget
    but its BITMAP doesn't) and the bitmap prunes lineitem batches
    BEFORE the bucketed all-to-all, so non-matching probe rows never
    ride the shuffle. Bloom false positives cost only wasted shuffle
    bytes — the in-bucket hash join removes them, so the output is
    exact at ANY m (pinned: tiny-m and huge-m runs are byte-identical).
    Driver holds #batches OR-reductions of m/8 bytes; at extreme block
    counts fold them through a tree reduce instead."""
    assert n_buckets & (n_buckets - 1) == 0, (
        f"n_buckets must be a power of two (bit_wise_and bucketing), got {n_buckets}"
    )
    m = 1 << log2_m
    P1, P2 = np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F)
    shift = np.uint64(64 - log2_m)

    def _positions(keys: np.ndarray) -> np.ndarray:
        """(n, k) bit positions from a double-hash family (top bits)."""
        h1 = keys * P1
        h2 = keys * P2 | np.uint64(1)
        j = np.arange(k_hashes, dtype=np.uint64)
        return ((h1[:, None] + j[None, :] * h2[:, None]) >> shift).astype(np.int64)

    orders = T(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice"])

    def bloom_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["o_totalprice"], pa.scalar(price_min)))
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bits = np.zeros(m >> 3, dtype=np.uint8)
        if len(keys):
            pos = _positions(keys).ravel()
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.large_binary())})

    parts = orders.map_batches(bloom_partial, batch_format="pyarrow").to_pandas()
    bloom = np.zeros(m >> 3, dtype=np.uint8)
    for b in parts["bits"]:
        np.bitwise_or(bloom, np.frombuffer(b, dtype=np.uint8), out=bloom)
    bref = ray.put(bloom)

    def tag_left(t: pa.Table) -> pa.Table:
        bl = ray.get(bref)
        keys = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = _positions(keys)
        hit = ((bl[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all(axis=1)
        t = t.filter(pa.array(hit))
        r = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        key = t["l_orderkey"]
        return pa.table(
            {
                "bucket": pc.cast(pc.bit_wise_and(key, n_buckets - 1), pa.int64()),
                "key": key,
                "rev": r,
                "o_orderstatus": pa.nulls(t.num_rows, pa.string()),
                "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            }
        )

    def tag_right(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["o_totalprice"], pa.scalar(price_min)))
        key = t["o_orderkey"]
        return pa.table(
            {
                "bucket": pc.cast(pc.bit_wise_and(key, n_buckets - 1), pa.int64()),
                "key": key,
                "rev": pa.nulls(t.num_rows, pa.float64()),
                "o_orderstatus": t["o_orderstatus"],
                "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }
        )

    li = T(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
    left = li.map_batches(tag_left, batch_format="pyarrow")
    right = orders.map_batches(tag_right, batch_format="pyarrow")

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0][["key", "rev"]]
        r = g[g["side"] == 1][["key", "o_orderstatus"]]
        m2 = l.merge(r, on="key", how="inner")
        return m2.groupby("o_orderstatus", as_index=False).agg(
            p_rev=("rev", "sum"), p_n=("rev", "size")
        )

    out = (
        left.union(right)
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
        .groupby("o_orderstatus")
        .aggregate(Sum("p_rev", alias_name="revenue"), Sum("p_n", alias_name="n_items"))
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(2)
    out["n_items"] = out["n_items"].astype("int64")
    return out.sort_values("o_orderstatus").reset_index(drop=True)


def join_orders_lineitem_native(sf_dir: str) -> pd.DataFrame:
    """Same join via ``Dataset.join`` (hash-shuffle join operator) — API
    coverage for the built-in; the bucketed version above is the bench
    path (the built-in's shuffle-aggregator actor pool has a large fixed
    startup cost at small scale)."""
    li = T(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.select(["l_orderkey"]).append_column("rev", r)

    li = li.map_batches(rev, batch_format="pyarrow")
    orders = T(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])
    joined = li.join(orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",))
    out = (
        joined.groupby("o_orderstatus")
        .aggregate(Sum("rev", alias_name="revenue"), Count(alias_name="n_items"))
        .to_pandas()
    )
    out["revenue"] = out["revenue"].round(2)
    return out.sort_values("o_orderstatus").reset_index(drop=True)


def topk_orders(sf_dir: str) -> pd.DataFrame:
    """Distributed sort + limit (O1 total-order analog)."""
    ds = T(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    top = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)
    return top.to_pandas()


def distinct_segments(sf_dir: str) -> pd.DataFrame:
    """Distinct + counts (dedup-map analog, D1). In-batch partial counts
    first: the shuffle moves one row per (segment, batch) — the same
    combiner discipline as every other aggregate here
    (pipelines/common.py)."""
    ds = T(sf_dir, "customer", columns=["c_mktsegment"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("c_mktsegment").aggregate([([], "count_all")])
        return rename(g, {"count_all": "p_n"})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("p_n", alias_name="n_customers"))
        .to_pandas()
    )
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def anti_join_customers(sf_dir: str) -> rd.Dataset:
    """Broadcast anti-join: customers with no large (>300k) order — the
    seen-set anti-join that drives the frontier (J4: only unseen keys
    proceed, crawler/blocks.go:146-150)."""
    big = T(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    custkeys = big.filter(expr="o_totalprice > 300000").unique("o_custkey")
    ref = ray.put(np.asarray(custkeys, dtype=np.int64))

    ds = T(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def anti(t: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        mask = np.isin(t["c_custkey"].to_numpy(zero_copy_only=False), keys, invert=True)
        return t.filter(pa.array(mask))

    return ds.map_batches(anti, batch_format="pyarrow")


def semi_join_parts(sf_dir: str) -> rd.Dataset:
    """Broadcast semi-join: large parts that do appear in lineitem (J5)."""
    partkeys = T(sf_dir, "lineitem", columns=["l_partkey"]).unique("l_partkey")
    ref = ray.put(np.asarray(partkeys, dtype=np.int64))

    ds = T(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])

    def semi(t: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        t = t.filter(pc.greater(t["p_size"], 40))
        mask = np.isin(t["p_partkey"].to_numpy(zero_copy_only=False), keys)
        return t.filter(pa.array(mask))

    return ds.map_batches(semi, batch_format="pyarrow")


def global_max(sf_dir: str) -> pd.DataFrame:
    """Global high-water mark (A3: LatestBlockNumber analog,
    common/rpc.go:99-108). One Arrow ``pc.max`` partial per batch, tiny
    driver reduce over #blocks rows — Ray's native ``Max`` aggregate on
    a date column round-trips numpy ``datetime64[D]`` and logs a
    precision-conversion warning per worker; the partial keeps the value
    as an Arrow timestamp end-to-end."""
    ds = T(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "max_date": pa.array(
                    [pc.max(t["o_orderdate"]).cast(pa.timestamp("us"))], pa.timestamp("us")
                ),
                "max_price": pa.array([pc.max(t["o_totalprice"]).as_py()], pa.float64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()  # #blocks rows
    return pd.DataFrame(
        [
            {
                "max_date": parts["max_date"].max(),
                "max_price": round(float(parts["max_price"].max()), 2),
            }
        ]
    )


def explode_tokens(sf_dir: str) -> rd.Dataset:
    """List-flatten with positional ordinal — the log-flatten /
    parent-embed analog (M3: common/blocks.go:61-63, logs denormalized
    across transactions)."""
    ds = T(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        # all-Arrow flatten: split on whitespace runs, flatten with
        # parent indices, drop boundary empties, recompute 1-based
        # positions per parent with run arithmetic (no per-row python)
        lst = pc.split_pattern_regex(t["text"].combine_chunks(), pattern=r"\s+")
        flat = pc.list_flatten(lst)
        par = pc.list_parent_indices(lst).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        par = par[keep]
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
            }
        )
        if len(par) == 0:
            return empty
        idx = np.arange(len(par), dtype=np.int64)
        newrun = np.empty(len(par), dtype=bool)
        newrun[0] = True
        newrun[1:] = par[1:] != par[:-1]
        run_starts = idx[newrun]
        run_lens = np.diff(np.append(run_starts, len(par)))
        pos = idx - np.repeat(run_starts, run_lens) + 1
        doc_ids = pc.take(t["doc_id"].combine_chunks(), pa.array(par))
        return pa.table(
            {
                "doc_id": doc_ids,
                "pos": pa.array(pos, pa.int64()),
                "token": flat,
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def top_orders_per_segment(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Per-group top-k (window-function rank analog): the k largest
    orders of each market segment — broadcast the customer->segment map,
    per-batch partial top-k (combiner), final top-k per group."""
    cust = T(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    ds = T(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        seg_map = ray.get(ref)
        segs = pd.Series(t["o_custkey"].to_numpy(zero_copy_only=False)).map(seg_map)
        df = pd.DataFrame(
            {
                "c_mktsegment": segs,
                "o_orderkey": t["o_orderkey"].to_numpy(zero_copy_only=False),
                "o_custkey": t["o_custkey"].to_numpy(zero_copy_only=False),
                "o_totalprice": t["o_totalprice"].to_numpy(zero_copy_only=False),
            }
        )
        part = (
            df.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
            .groupby("c_mktsegment", as_index=False)
            .head(k)
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(k)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["c_mktsegment", "o_totalprice"], ascending=[True, False]).reset_index(drop=True)


def asof_join_events(sf_dir: str, n_buckets: int = 16) -> rd.Dataset:
    """Per-key as-of join: each purchase event matched to the most
    recent signup at-or-before it by the same user — the temporal-join
    operator Ray Data has no native form of, composed per the
    custom-operator recipe: tag both sides from ONE pruned read, hash-
    bucket by key, one groupby co-locates a key's rows, vectorized
    ``pd.merge_asof(by=user, on=ts, direction=backward)`` inside each
    bucket. The single all-to-all moves fixed-width (ids, ts, value)
    rows only; timestamps ride as int64 epoch-micros (Arrow
    timestamp[us] cast — hashes identically to the DuckDB oracle's
    ``epoch_us``). Signups are pre-deduped to one row per (user, ts)
    (max value) so ties are deterministic, matching the oracle.

    Partitioning assumption: one BUCKET (many keys) fits a worker;
    buckets dilute hot keys, and a pathological single key would be
    salted by time range. Inner semantics: purchases with no prior
    signup emit nothing (keeps every output column non-null — no
    int64/NaN dtype churn across the hash compare)."""
    if n_buckets < 1 or n_buckets & (n_buckets - 1):
        # the bucket key below is bit_wise_and(user, n_buckets - 1) — a
        # modulus only when n_buckets is a power of two (any other value
        # silently merges/skews buckets)
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    ev = T(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])

    def tag(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64())
        user = t["user_id"]
        is_p = pc.equal(t["event_type"], "purchase")
        is_s = pc.equal(t["event_type"], "signup")
        base = pa.table(
            {
                "bucket": pc.cast(pc.bit_wise_and(user, n_buckets - 1), pa.int64()),
                "user_id": user,
                "ts_us": ts_us,
                "event_id": t["event_id"],
                "value": t["value"],
            }
        )
        p = base.filter(is_p)
        p = p.append_column("side", pa.array(np.ones(p.num_rows, dtype=np.int8)))
        s = base.filter(is_s)
        s = s.append_column("side", pa.array(np.zeros(s.num_rows, dtype=np.int8)))
        return pa.concat_tables([p, s])

    _empty = pd.DataFrame(
        {
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "ts_us": pd.Series([], dtype="int64"),
            "signup_ts_us": pd.Series([], dtype="int64"),
            "signup_value": pd.Series([], dtype="float64"),
        }
    )

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 1][["event_id", "user_id", "ts_us"]]
        right = g[g["side"] == 0][["user_id", "ts_us", "value"]]
        if left.empty or right.empty:
            return _empty
        # one row per (user, ts): max value — deterministic tie-break,
        # mirrored in the oracle's GROUP BY
        right = (
            right.groupby(["user_id", "ts_us"], as_index=False)["value"]
            .max()
            .rename(columns={"value": "signup_value"})
        )
        right["signup_ts_us"] = right["ts_us"]
        m = pd.merge_asof(
            left.sort_values("ts_us", kind="stable"),
            right.sort_values("ts_us", kind="stable"),
            on="ts_us",
            by="user_id",
            direction="backward",
        )
        m = m.dropna(subset=["signup_ts_us"])
        if m.empty:
            return _empty
        m["signup_ts_us"] = m["signup_ts_us"].astype("int64")
        return m[["event_id", "user_id", "ts_us", "signup_ts_us", "signup_value"]]

    return (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(asof_bucket, batch_format="pandas")
    )


def rollup_revenue(sf_dir: str) -> pd.DataFrame:
    """Hierarchical aggregate — ``GROUP BY ROLLUP(returnflag,
    linestatus)``: revenue at the finest grain plus every prefix
    subtotal and the grand total in one result, the reporting shape the
    reference's per-sink stats tables compose by hand (SURVEY.md §2.6).

    Scale shape: ONE distributed pass — the same partial-combiner
    shuffle as ``q1_pricing_summary`` — lands the finest-grain table
    (cardinality = |flag|x|status|, tiny by definition); the coarser
    ROLLUP levels are pure re-aggregations of that finest table, so they
    run on the driver over a few dozen rows instead of re-scanning or
    re-shuffling the fact table. Rolled-up key columns are emitted as
    NULL exactly like the SQL."""
    ds = T(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_extendedprice", "sum"), ("l_extendedprice", "count")]
        )
        return rename(g, {"l_extendedprice_sum": "p_price", "l_extendedprice_count": "p_n"})

    finest = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("p_price", alias_name="sum_price"), Sum("p_n", alias_name="n_rows"))
        .to_pandas()
    )
    lvl1 = (
        finest.groupby("l_returnflag", as_index=False)[["sum_price", "n_rows"]]
        .sum()
        .assign(l_linestatus=None)
    )
    lvl0 = pd.DataFrame(
        {
            "l_returnflag": [None],
            "l_linestatus": [None],
            "sum_price": [finest["sum_price"].sum()],
            "n_rows": [finest["n_rows"].sum()],
        }
    )
    out = pd.concat([finest, lvl1, lvl0], ignore_index=True)[
        ["l_returnflag", "l_linestatus", "sum_price", "n_rows"]
    ]
    out["sum_price"] = out["sum_price"].round(2)
    out["n_rows"] = out["n_rows"].astype("int64")
    return out.sort_values(
        ["l_returnflag", "l_linestatus"], na_position="first"
    ).reset_index(drop=True)


def cube_revenue(sf_dir: str) -> pd.DataFrame:
    """``GROUP BY CUBE(returnflag, linestatus)`` — every grouping-set
    combination (both dims, each dim alone, grand total) in one result;
    the CUBE sibling of ``rollup_revenue``'s prefix hierarchy.

    Same scale shape: ONE distributed partial-combiner pass lands the
    finest-grain table (|flag|x|status| rows, tiny by definition) and
    every other grouping set — including the (linestatus)-only set
    ROLLUP never produces — is a driver-side re-aggregation of those
    few dozen rows. The fact table is scanned and shuffled exactly
    once no matter how many sets the cube expands to. Cubed-away key
    columns are NULL exactly like the SQL."""
    ds = T(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_extendedprice", "sum"), ("l_extendedprice", "count")]
        )
        return rename(g, {"l_extendedprice_sum": "p_price", "l_extendedprice_count": "p_n"})

    finest = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("p_price", alias_name="sum_price"), Sum("p_n", alias_name="n_rows"))
        .to_pandas()
    )
    by_flag = (
        finest.groupby("l_returnflag", as_index=False)[["sum_price", "n_rows"]]
        .sum()
        .assign(l_linestatus=None)
    )
    by_status = (
        finest.groupby("l_linestatus", as_index=False)[["sum_price", "n_rows"]]
        .sum()
        .assign(l_returnflag=None)
    )
    total = pd.DataFrame(
        {
            "l_returnflag": [None],
            "l_linestatus": [None],
            "sum_price": [finest["sum_price"].sum()],
            "n_rows": [finest["n_rows"].sum()],
        }
    )
    out = pd.concat([finest, by_flag, by_status, total], ignore_index=True)[
        ["l_returnflag", "l_linestatus", "sum_price", "n_rows"]
    ]
    out["sum_price"] = out["sum_price"].round(2)
    out["n_rows"] = out["n_rows"].astype("int64")
    return out.sort_values(
        ["l_returnflag", "l_linestatus"], na_position="first"
    ).reset_index(drop=True)


def interval_join_events(sf_dir: str, n_buckets: int = 16) -> rd.Dataset:
    """Per-key interval (band) join: each purchase matched to ALL
    signups by the same user inside the preceding 24-hour window —
    the one-to-many temporal-join sibling of ``asof_join_events``
    (which keeps only the latest match). Ray Data has no native range
    join; composition per the custom-operator recipe: tag both sides
    from one pruned read, hash-bucket by key so a key's rows co-locate,
    then inside each bucket an equi-merge on user explodes (purchase x
    signup) candidate pairs and the band predicate filters — vectorized,
    no per-row loop.

    Partitioning assumptions (documented, per the custom-operator
    recipe): (a) one BUCKET of keys fits a worker (the asof
    assumption); (b) the in-bucket equi-merge explodes purchases x
    signups PER USER before the band filter, so per-key fan-in must be
    human-scale — fine for user event streams, NOT for a bot-scale hot
    key (that corpus would need in-bucket chunked merging or
    time-range pre-bucketing, which this operator does not implement).
    The all-to-all moves fixed-width ids/ts/value rows only
    (timestamps as int64 epoch-micros, hash-identical to the oracle's
    ``epoch_us``)."""
    if n_buckets < 1 or n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    window_us = 24 * 3600 * 1_000_000
    ev = T(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])

    def tag(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"], value_set=pa.array(["purchase", "signup"]))
        t = t.filter(keep)
        return pa.table(
            {
                "bucket": pc.cast(pc.bit_wise_and(t["user_id"], n_buckets - 1), pa.int64()),
                "user_id": t["user_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "event_id": t["event_id"],
                "value": t["value"],
                "side": pc.cast(pc.equal(t["event_type"], "purchase"), pa.int8()),
            }
        )

    _empty = pd.DataFrame(
        {
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "ts_us": pd.Series([], dtype="int64"),
            "signup_event_id": pd.Series([], dtype="int64"),
            "signup_ts_us": pd.Series([], dtype="int64"),
            "signup_value": pd.Series([], dtype="float64"),
        }
    )

    def band_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 1][["event_id", "user_id", "ts_us"]]
        right = g[g["side"] == 0][["event_id", "user_id", "ts_us", "value"]].rename(
            columns={
                "event_id": "signup_event_id",
                "ts_us": "signup_ts_us",
                "value": "signup_value",
            }
        )
        if left.empty or right.empty:
            return _empty
        m = left.merge(right, on="user_id")
        m = m[(m["signup_ts_us"] <= m["ts_us"]) & (m["signup_ts_us"] > m["ts_us"] - window_us)]
        if m.empty:
            return _empty
        return m[
            ["event_id", "user_id", "ts_us", "signup_event_id", "signup_ts_us", "signup_value"]
        ]

    return (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(band_bucket, batch_format="pandas")
    )


def topk_events_per_user(
    sf_dir: str, k: int = 3, n_buckets: int | None = None
) -> rd.Dataset:
    """Grouped top-k — ``ROW_NUMBER() OVER (PARTITION BY user_id ORDER
    BY value DESC, event_id) <= k``: each user's k highest-value events
    with their rank. The per-GROUP sibling of ``topk_orders``'s total
    order, and the diversity-cap shape a training corpus runs per domain
    ("keep at most k docs per host") — same op, different key.

    Scale shape (two-level top-k, house bucket+lexsort+run-scan
    pattern): the per-batch combiner already keeps only each user's
    in-batch top-k (a user's global top-k is a subset of the union of
    its per-batch top-k, since in-batch rank <= global rank), so the
    all-to-all moves <= k rows per (user, batch) instead of every event.
    The shuffle key is ``user_id & (B-1)`` (B ~ cluster CPUs,
    ``n_shuffle_buckets``), never the raw user id — one pandas dispatch
    per BUCKET, not per user; inside a bucket one numpy lexsort orders
    (user, -value, event_id) and a vectorized run-scan assigns ranks.
    No driver-side data at any point; output rides out as a Dataset
    (<= k rows per user)."""
    from .common import n_shuffle_buckets

    B = n_buckets or n_shuffle_buckets()
    assert B & (B - 1) == 0, f"n_buckets must be a power of two, got {B}"
    ds = T(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def _rank(uid: np.ndarray, eid: np.ndarray, val: np.ndarray):
        """Positions of each user's top-k rows (by value desc, event_id
        asc) in the input arrays, plus their 1-based ranks."""
        order = np.lexsort((eid, -val, uid))
        u = uid[order]
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        idx = np.arange(len(u), dtype=np.int64)
        start = np.maximum.accumulate(np.where(new_user, idx, 0))
        rank = idx - start + 1
        keep = rank <= k
        return order[keep], rank[keep]

    def partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        val = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        pos, _ = _rank(uid, eid, val)
        return pa.table(
            {
                "bucket": pa.array(uid[pos] & (B - 1), pa.int64()),
                "user_id": pa.array(uid[pos], pa.int64()),
                "event_id": pa.array(eid[pos], pa.int64()),
                "value": pa.array(val[pos], pa.float64()),
            }
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(dtype=np.int64)
        eid = g["event_id"].to_numpy(dtype=np.int64)
        val = g["value"].to_numpy(dtype=np.float64)
        pos, rank = _rank(uid, eid, val)
        return pd.DataFrame(
            {
                "user_id": uid[pos],
                "event_id": eid[pos],
                "value": val[pos],
                "rk": rank.astype(np.int64),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(final, batch_format="pandas")
    )


def q3_shipping_priority(
    sf_dir: str, segment: str = "BUILDING", cutoff: str = "1998-06-01", k: int = 10
) -> pd.DataFrame:
    """TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem with date predicates,
    revenue per order, global top-k — the reference's multi-table
    enrichment composed from the house join primitives (J1 broadcast +
    the bucketed large-large join of ``join_orders_lineitem``).

    Scale plan: the segment's custkeys are a small side (1/5 of
    customer) shipped ONCE via ``ray.put`` and probed with ``pc.is_in``
    per batch — no customer shuffle. orders and lineitem are both
    date-pruned AT THE READ (only 3 columns each leave storage), then
    meet in ONE bucketed all-to-all keyed on ``orderkey & (B-1)``.
    Because an orderkey lives in exactly one bucket, the per-bucket
    revenue totals are FINAL — each bucket emits only its local top-k,
    and the driver merges B·k candidate rows, never the joined set."""
    from .common import n_shuffle_buckets

    B = n_shuffle_buckets()
    assert B & (B - 1) == 0, f"n_buckets must be a power of two, got {B}"
    cut = np.datetime64(cutoff, "ns").astype("datetime64[us]").astype(_dt.datetime)

    cust = T(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    seg_keys = ray.put(
        np.sort(cust.loc[cust["c_mktsegment"] == segment, "c_custkey"].to_numpy(np.int64))
    )

    def tag_orders(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.less(t["o_orderdate"], pa.scalar(cut)),
            pc.is_in(t["o_custkey"], value_set=pa.array(ray.get(seg_keys))),
        )
        t = t.filter(keep)
        key = t["o_orderkey"]
        return pa.table(
            {
                "bucket": pc.cast(pc.bit_wise_and(key, B - 1), pa.int64()),
                "key": key,
                "rev": pa.nulls(t.num_rows, pa.float64()),
                "o_orderdate": t["o_orderdate"],
                "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }
        )

    def tag_lineitem(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cut)))
        # in-batch partial: one row per (orderkey, batch), not per item
        r = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        g = (
            pa.table({"key": t["l_orderkey"], "rev": r})
            .group_by("key")
            .aggregate([("rev", "sum")])
        )
        key = g["key"]
        return pa.table(
            {
                "bucket": pc.cast(pc.bit_wise_and(key, B - 1), pa.int64()),
                "key": key,
                "rev": g["rev_sum"],
                "o_orderdate": pa.nulls(g.num_rows, pa.timestamp("us")),
                "side": pa.array(np.zeros(g.num_rows, dtype=np.int8)),
            }
        )

    orders = T(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        tag_orders, batch_format="pyarrow"
    )
    li = T(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]).map_batches(
        tag_lineitem, batch_format="pyarrow"
    )

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["side"] == 0].groupby("key", as_index=False).agg(revenue=("rev", "sum"))
        r = g[g["side"] == 1][["key", "o_orderdate"]]
        m = l.merge(r, on="key", how="inner")
        if m.empty:
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series([], dtype="int64"),
                    "revenue": pd.Series([], dtype="float64"),
                    "o_orderdate": pd.Series([], dtype="datetime64[ns]"),
                }
            )
        m = m.sort_values(["revenue", "o_orderdate", "key"], ascending=[False, True, True]).head(k)
        return m.rename(columns={"key": "o_orderkey"})[["o_orderkey", "revenue", "o_orderdate"]]

    cand = (
        li.union(orders)
        .groupby("bucket")
        .map_groups(topk_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = cand.sort_values(
        ["revenue", "o_orderdate", "o_orderkey"], ascending=[False, True, True]
    ).head(k)
    out["revenue"] = out["revenue"].round(2)
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    return out.reset_index(drop=True)


def left_join_customer_names(sf_dir: str, segment: str = "BUILDING") -> rd.Dataset:
    """LEFT OUTER broadcast join — the null-preserving enrichment the
    inner/semi/anti family doesn't cover: every order keeps its row,
    orders whose customer is outside ``segment`` get a NULL ``c_name``
    (the reference's receipt-decoration leaves unmatched receipts
    intact, common/blocks.go:44-58). Small side shipped once via
    ``ray.put`` (sorted key array + aligned name array, probed with
    ``np.searchsorted`` per batch — no shuffle, no pandas map). Output
    stays a distributed Dataset, one row per order."""
    cust = T(sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"]).to_pandas()
    cust = cust[cust["c_mktsegment"] == segment].sort_values("c_custkey")
    ref = ray.put(
        (cust["c_custkey"].to_numpy(np.int64), cust["c_name"].to_numpy(object))
    )

    ds = T(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def join(t: pa.Table) -> pa.Table:
        keys, names = ray.get(ref)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, ck)
        pos_c = np.minimum(pos, len(keys) - 1)
        hit = (len(keys) > 0) & (keys[pos_c] == ck)
        out = np.full(len(ck), None, dtype=object)
        out[hit] = names[pos_c[hit]]
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "c_name": pa.array(out, pa.string()),
            }
        )

    return ds.map_batches(join, batch_format="pyarrow")


def corr_quantity_price(sf_dir: str) -> pd.DataFrame:
    """Grouped Pearson correlation (sample) of quantity vs extended
    price per returnflag — the two-column statistics shape computed from
    ONE pass of six sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²)
    pre-aggregated in-batch; the shuffle moves one 6-float partial per
    (group, batch) and the final r is algebra on a groups-sized frame."""
    ds = T(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        x, y = t["l_quantity"], t["l_extendedprice"]
        aux = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "x": x,
                "y": y,
                "xy": pc.multiply(x, y),
                "xx": pc.multiply(x, x),
                "yy": pc.multiply(y, y),
            }
        )
        g = aux.group_by("l_returnflag").aggregate(
            [("x", "sum"), ("y", "sum"), ("xy", "sum"), ("xx", "sum"), ("yy", "sum"), ([], "count_all")]
        )
        return rename(
            g,
            {"x_sum": "sx", "y_sum": "sy", "xy_sum": "sxy", "xx_sum": "sxx", "yy_sum": "syy", "count_all": "n"},
        )

    f = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("n", alias_name="n"),
        )
        .to_pandas()
    )
    n = f["n"].to_numpy(np.float64)
    cov = f["sxy"] - f["sx"] * f["sy"] / n
    vx = f["sxx"] - f["sx"] ** 2 / n
    vy = f["syy"] - f["sy"] ** 2 / n
    out = pd.DataFrame(
        {
            "l_returnflag": f["l_returnflag"],
            "n": f["n"].astype("int64"),
            "corr_qty_price": (cov / np.sqrt(vx * vy)).round(4),
        }
    )
    return out.sort_values("l_returnflag").reset_index(drop=True)


def salted_join_events(
    sf_dir: str,
    n_buckets: int | None = None,
    r_salt: int = 8,
    hot_min: int | None = None,
    max_driver_rows: int = 50_000_000,
) -> pd.DataFrame:
    """Skew-resistant partitioned hash join — the "salt hot keys"
    discipline as a real operator instead of a docstring caveat: events
    (large, possibly key-skewed) ⋈ customer on ``user_id = c_custkey``,
    aggregated to per-segment totals.

    Phase 1 finds the hot keys DISTRIBUTEDLY: in-batch partial counts
    per key ride one groupby (1 row per (key, batch) — the count
    shuffle itself is skew-proof), keys with total count >= ``hot_min``
    are by definition few, and only THEY land on the driver
    (``bounded_driver_frame``-guarded) and broadcast. Phase 2 is the
    house tagged-union bucketed join, except hot-key big-side rows
    scatter over ``r_salt`` dedicated sub-buckets (deterministic salt =
    ``event_id & (r_salt-1)``, no RNG) and the small side replicates
    its hot rows to all ``r_salt`` sub-buckets — a hot key's probe work
    spreads over r_salt workers instead of melting one. Cold keys pay
    nothing. ``hot_min`` defaults to 2x the mean rows/key (uniform
    corpora detect ~0 hot keys and degenerate to the plain bucketed
    join — pinned by an equality test; the planted-skew test pins that
    salting splits a 50%-hot key across sub-buckets with identical
    output)."""
    from ray.data.aggregate import Sum as _Sum

    from .common import bounded_driver_frame, n_shuffle_buckets

    B = n_buckets or n_shuffle_buckets()
    assert B & (B - 1) == 0, f"n_buckets must be a power of two, got {B}"
    assert r_salt & (r_salt - 1) == 0, f"r_salt must be a power of two, got {r_salt}"

    ev = T(sf_dir, "events", columns=["event_id", "user_id", "value"])

    # --- phase 1: distributed hot-key census -----------------------------
    def count_partial(t: pa.Table) -> pa.Table:
        g = t.select(["user_id"]).group_by("user_id").aggregate([([], "count_all")])
        return rename(g, {"count_all": "p_n"})

    counts = (
        ev.map_batches(count_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(_Sum("p_n", alias_name="n"))
    )
    if hot_min is None:
        counts = counts.materialize()
        tot = counts.sum("n")
        nkeys = counts.count()
        hot_min = max(2, int(2 * tot / max(nkeys, 1)) + 1)
    hot = bounded_driver_frame(
        counts.filter(expr=f"n >= {int(hot_min)}"),
        "salted_join hot keys",
        max_driver_rows,
    )
    hot_keys = (
        np.sort(hot["user_id"].to_numpy(np.int64))
        if "user_id" in hot.columns
        else np.array([], dtype=np.int64)  # empty filter -> column-less frame
    )
    # hot key i owns sub-buckets [B + i*r_salt, B + (i+1)*r_salt)
    hot_ref = ray.put(hot_keys)

    # --- phase 2: tagged union, salted buckets ---------------------------
    def tag_events(t: pa.Table) -> pa.Table:
        hk = ray.get(hot_ref)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = uid & np.int64(B - 1)
        if len(hk):
            pos = np.searchsorted(hk, uid)
            pos_c = np.minimum(pos, len(hk) - 1)
            is_hot = hk[pos_c] == uid
            h[is_hot] = B + pos_c[is_hot] * r_salt + (eid[is_hot] & (r_salt - 1))
        return pa.table(
            {
                "bucket": pa.array(h, pa.int64()),
                "key": pa.array(uid, pa.int64()),
                "value": t["value"],
                "c_mktsegment": pa.nulls(t.num_rows, pa.string()),
                "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            }
        )

    def tag_customer(t: pa.Table) -> pa.Table:
        hk = ray.get(hot_ref)
        ck = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        seg = t["c_mktsegment"].to_numpy(zero_copy_only=False)
        h = ck & np.int64(B - 1)
        if len(hk):
            pos = np.searchsorted(hk, ck)
            pos_c = np.minimum(pos, len(hk) - 1)
            is_hot = hk[pos_c] == ck
            # replicate each hot small-side row to all r_salt sub-buckets
            cold_k, cold_b, cold_s = ck[~is_hot], h[~is_hot], seg[~is_hot]
            hk_rows, hseg = ck[is_hot], seg[is_hot]
            hpos = pos_c[is_hot]
            rep_k = np.repeat(hk_rows, r_salt)
            rep_s = np.repeat(hseg, r_salt)
            rep_b = (
                B
                + np.repeat(hpos, r_salt) * r_salt
                + np.tile(np.arange(r_salt, dtype=np.int64), len(hk_rows))
            )
            ck = np.concatenate([cold_k, rep_k])
            h = np.concatenate([cold_b, rep_b])
            seg = np.concatenate([cold_s, rep_s])
        n = len(ck)
        return pa.table(
            {
                "bucket": pa.array(h, pa.int64()),
                "key": pa.array(ck, pa.int64()),
                "value": pa.nulls(n, pa.float64()),
                "c_mktsegment": pa.array(seg, pa.string()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    events_tagged = ev.map_batches(tag_events, batch_format="pyarrow")
    cust_tagged = T(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).map_batches(
        tag_customer, batch_format="pyarrow"
    )

    def join_bucket(g: pd.DataFrame) -> pa.Table:
        l = g[g["side"] == 0][["key", "value"]]
        r = g[g["side"] == 1][["key", "c_mktsegment"]]
        m = l.merge(r, on="key", how="inner")
        part = m.groupby("c_mktsegment", as_index=False).agg(
            p_sum=("value", "sum"), p_n=("value", "size")
        )
        # arrow out: typed empty blocks (a 0-row pandas object column
        # trips Ray's block-size estimator)
        return pa.table(
            {
                "c_mktsegment": pa.array(part["c_mktsegment"], pa.string()),
                "p_sum": pa.array(part["p_sum"], pa.float64()),
                "p_n": pa.array(part["p_n"].astype("int64"), pa.int64()),
            }
        )

    out = (
        events_tagged.union(cust_tagged)
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
        .groupby("c_mktsegment")
        .aggregate(_Sum("p_sum", alias_name="sum_value"), _Sum("p_n", alias_name="n_events"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(2)
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)
