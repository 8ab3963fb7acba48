"""Event-stream pipelines: tumbling windows, sessionization, wire-format
parsing — the streaming-semantics family (SURVEY.md §2.7).

Ray Data has no event-time windows; windows are expressed as grouped
computation over a partitioned, within-group-sorted log (the guide's
streaming-shaped-workload pattern), which is exactly how the reference
treats its stream: strictly ordered per partition, stats flushed per
window (crawler/logger.go:40-55)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

from .common import T, rename


def tumbling_hour(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour window per event_type: count + sum(value).
    Window assignment is a vectorized column op; the shuffle moves
    per-batch partials (A2 windowed-stats analog)."""
    ds = T(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hour = pc.floor_temporal(t["ts"], unit="hour")
        t = t.append_column("hour", hour)
        g = t.group_by(["event_type", "hour"]).aggregate([("value", "sum"), ("value", "count")])
        return rename(g, {"value_sum": "p_sum", "value_count": "p_n"})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("p_sum", alias_name="sum_value"), Sum("p_n", alias_name="n_events"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)


def hopping_window(sf_dir: str, size_min: int = 60, hop_min: int = 15) -> pd.DataFrame:
    """Hopping (sliding) windows: ``size_min``-minute windows advancing
    every ``hop_min`` minutes — each event lands in size/hop overlapping
    windows, the streaming-aggregation shape ``tumbling_hour`` can't
    express. Window EXPANSION is a vectorized in-batch op (tile the
    int64 epoch ns, subtract k hops, k = 0..size/hop-1); the in-batch
    partial pre-aggregates per (event_type, window_start), so the
    all-to-all moves per-batch partials — the expansion factor never
    reaches the shuffle. Returns (event_type, window_start, n_events,
    sum_value) for every window an event falls in."""
    assert size_min % hop_min == 0, "window size must be a multiple of the hop"
    n_hops = size_min // hop_min
    ds = T(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        ns = (
            t["ts"].cast(pa.timestamp("ns")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        hop_ns = np.int64(hop_min) * 60 * 1_000_000_000
        base = (ns // hop_ns) * hop_ns  # floor to the hop grid
        k = np.arange(n_hops, dtype=np.int64) * hop_ns
        ws = (base[:, None] - k[None, :]).ravel()  # row-major: event i -> i*n_hops..+n_hops-1
        rep = pa.array(np.repeat(np.arange(len(ns), dtype=np.int64), n_hops))
        expanded = pa.table(
            {
                "event_type": pc.take(t["event_type"].combine_chunks(), rep),
                "window_start": pa.array(ws, pa.int64()).cast(pa.timestamp("ns")),
                "value": pa.array(
                    np.repeat(t["value"].to_numpy(zero_copy_only=False), n_hops)
                ),
            }
        )
        g = expanded.group_by(["event_type", "window_start"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )
        return rename(g, {"value_sum": "p_sum", "value_count": "p_n"})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("p_sum", alias_name="sum_value"), Sum("p_n", alias_name="n_events"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


def sessionize(sf_dir: str, n_buckets: int | None = None) -> pd.DataFrame:
    """Session windows (30-min gap) per user — dispatch-amortized with
    the house bucketed run-scan pattern (same as ``corpus.loser_keys``):
    the shuffle key is ``hash(user) % B`` (B ~ cluster CPUs), NOT the raw
    user_id, which at 10^8+ users would pay Ray's per-group pandas
    dispatch once per user. Inside each bucket one numpy lexsort orders
    (user, ts); session starts are a single vectorized comparison over
    the sorted run (gap > 30 min OR user boundary), and the per-user
    counts come from one ``np.unique`` run-length pass."""
    import numpy as np

    from .common import n_shuffle_buckets

    B = n_buckets or n_shuffle_buckets()
    assert B & (B - 1) == 0, f"n_buckets must be a power of two, got {B}"
    ds = T(sf_dir, "events", columns=["user_id", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        uid = t["user_id"]
        b = pc.cast(pc.bit_wise_and(pc.cast(uid, pa.int64()), B - 1), pa.int64())
        return pa.table({"bucket": b, "user_id": uid, "ts": t["ts"]})

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy(dtype="datetime64[ns]").view(np.int64)
        order = np.lexsort((ts, uid))
        uid_s, ts_s = uid[order], ts[order]
        new_user = np.concatenate(([True], uid_s[1:] != uid_s[:-1]))
        gap_ns = np.int64(30 * 60 * 1_000_000_000)
        new_session = new_user.copy()
        np.greater(np.diff(ts_s), gap_ns, out=new_session[1:], where=~new_user[1:])
        users, starts, counts = np.unique(uid_s, return_index=True, return_counts=True)
        n_sessions = np.add.reduceat(new_session.astype(np.int64), starts)
        return pd.DataFrame(
            {
                "user_id": users,
                "n_sessions": n_sessions,
                "n_events": counts.astype(np.int64),
            }
        )

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sessions, batch_format="pandas")
        .to_pandas()
    )
    out["n_sessions"] = out["n_sessions"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def user_event_gaps(sf_dir: str, n_buckets: int | None = None) -> rd.Dataset:
    """Per-key LAG window: for every event, the time since the SAME
    user's previous event — ``epoch_us(ts) - LAG(epoch_us(ts)) OVER
    (PARTITION BY user_id ORDER BY ts, event_id)`` — the
    inter-arrival-time feature a sessionization / abuse-detection
    pipeline derives before gap thresholding.

    Ray Data has no window functions; the shape is the house bucketed
    run-scan (``sessionize``): shuffle on ``hash(user) % B`` (never the
    raw key — at 10^8+ users per-key ``map_groups`` pays Ray's pandas
    dispatch once per user), one numpy lexsort of (user, ts, event_id)
    per bucket, then the lag is a single vectorized ``np.diff`` over
    the sorted run with user-boundary positions masked. A user's rows
    all land in one bucket, so the lag never needs cross-partition
    state. First-event rows get gap_us = -1 (sentinel, not NULL, so
    both sides hash identically). Output stays a distributed Dataset —
    one row per event, never collected."""
    import numpy as np

    from .common import n_shuffle_buckets

    B = n_buckets or n_shuffle_buckets()
    assert B & (B - 1) == 0, f"n_buckets must be a power of two, got {B}"
    ds = T(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = pc.cast(pc.bit_wise_and(pc.cast(t["user_id"], pa.int64()), B - 1), pa.int64())
        return pa.table(
            {"bucket": b, "event_id": t["event_id"], "user_id": t["user_id"], "ts": t["ts"]}
        )

    def lag(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(dtype=np.int64)
        eid = g["event_id"].to_numpy(dtype=np.int64)
        # events carry microsecond timestamps; the ns view is exactly
        # divisible, so gap_us below is integer-exact vs epoch_us()
        ts = g["ts"].to_numpy(dtype="datetime64[ns]").view(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid_s, eid_s, ts_s = uid[order], eid[order], ts[order]
        gap = np.empty(len(ts_s), dtype=np.int64)
        gap[0] = -1
        np.subtract(ts_s[1:], ts_s[:-1], out=gap[1:])
        gap[1:] //= 1000
        new_user = np.concatenate(([True], uid_s[1:] != uid_s[:-1]))
        gap[new_user] = -1
        return pd.DataFrame({"event_id": eid_s, "user_id": uid_s, "gap_us": gap})

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lag, batch_format="pandas")
    )


def enrich_props(sf_dir: str) -> pd.DataFrame:
    """Wire-format parse + aggregate — the hex-decode normalization analog
    (M1/2.3: util/util.go:53-74): extract the numeric ``k`` from the JSON
    ``props`` string, vectorized, then per-type stats."""
    ds = T(sf_dir, "events", columns=["event_type", "props"])

    def parse(t: pa.Table) -> pa.Table:
        s = pd.Series(t["props"].to_pylist())
        k = s.str.extract(r'"k": (\d+)', expand=False).astype("int64")
        t = t.append_column("k", pa.array(k, pa.int64()))
        g = t.group_by("event_type").aggregate([("k", "sum"), ("k", "count")])
        return rename(g, {"k_sum": "p_sum", "k_count": "p_n"})

    out = (
        ds.map_batches(parse, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("p_sum", alias_name="sum_k"), Sum("p_n", alias_name="n_events"))
        .to_pandas()
    )
    return out.sort_values("event_type").reset_index(drop=True)


def events_stats(sf_dir: str) -> pd.DataFrame:
    """Running per-type counters (T4 throughput-aggregator analog,
    crawler/logger.go:9-68). In-batch partials: the shuffle moves one
    row per (event_type, batch), not one per event."""
    ds = T(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate([([], "count_all"), ("value", "sum")])
        return rename(g, {"count_all": "p_n", "value_sum": "p_sum"})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("p_n", alias_name="n"), Sum("p_sum", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values("event_type").reset_index(drop=True)


def scrub_props(sf_dir: str) -> rd.Dataset:
    """Redaction / PII-scrub shape: replace every digit run in the raw
    ``props`` wire string with ``#`` — the content-scrubbing transform a
    training-data pipeline runs before publication, as a pure
    shuffle-free map_batches over Arrow's RE2 kernel
    (``replace_substring_regex`` — compiled once per kernel call,
    zero-copy in/out). The DuckDB oracle is ``regexp_replace(..., 'g')``
    over the same RE2 syntax."""
    import pyarrow.compute as pc

    ds = T(sf_dir, "events", columns=["event_id", "props"])

    def scrub(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "props_scrubbed": pc.replace_substring_regex(
                    t["props"], pattern="[0-9]+", replacement="#"
                ),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow")


def cumulative_spend(sf_dir: str, n_buckets: int | None = None) -> rd.Dataset:
    """Per-key running total — ``SUM(...) OVER (PARTITION BY o_custkey
    ORDER BY o_orderdate, o_orderkey)`` — the cumulative window function
    (lifetime-spend feature) via the house bucketed run-scan: shuffle on
    ``hash(custkey) % B`` (never the raw key), one numpy lexsort of
    (custkey, date, orderkey) per bucket, then a segmented cumsum
    (global cumsum minus the per-key offset gathered at run starts).
    Prices are fixed-point (integer cents, half-away rounding to match
    DuckDB's ROUND) so the running sum is integer-exact regardless of
    accumulation order — a float cumsum could not hash-match an oracle
    whose window aggregate sums in segment-tree order. Output stays a
    distributed Dataset, one row per order."""
    import numpy as np

    from .common import n_shuffle_buckets

    B = n_buckets or n_shuffle_buckets()
    assert B & (B - 1) == 0, f"n_buckets must be a power of two, got {B}"
    ds = T(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def add_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cents = pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0)), ndigits=0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        b = pc.cast(pc.bit_wise_and(pc.cast(t["o_custkey"], pa.int64()), B - 1), pa.int64())
        return pa.table(
            {
                "bucket": b,
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "o_orderdate": t["o_orderdate"],
                "cents": cents,
            }
        )

    def running(g: pd.DataFrame) -> pd.DataFrame:
        ck = g["o_custkey"].to_numpy(dtype=np.int64)
        ok = g["o_orderkey"].to_numpy(dtype=np.int64)
        dt = g["o_orderdate"].to_numpy(dtype="datetime64[ns]").view(np.int64)
        cents = g["cents"].to_numpy(dtype=np.int64)
        order = np.lexsort((ok, dt, ck))
        ck_s, ok_s, cents_s = ck[order], ok[order], cents[order]
        cum = np.cumsum(cents_s)
        new_key = np.concatenate(([True], ck_s[1:] != ck_s[:-1]))
        starts = np.flatnonzero(new_key)
        # offset[i] = cumulative total BEFORE row i's key-run started
        offsets = np.repeat(cum[starts] - cents_s[starts], np.diff(np.append(starts, len(cum))))
        return pd.DataFrame(
            {
                "o_orderkey": ok_s,
                "o_custkey": ck_s,
                "cum_spend_cents": cum - offsets,
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(running, batch_format="pandas")
    )


def time_decayed_spend(sf_dir: str, half_life_weeks: int = 1) -> pd.DataFrame:
    """Per-type exponentially-decayed value sum — the recency-weighted
    engagement metric (weight halves every ``half_life_weeks``), the
    time-decay aggregate a freshness-aware ranking pipeline computes
    over its event log. Two passes: (1) the global high-water timestamp
    (one scalar — the reference's head-poll shape, S2); (2) shuffle-free
    in-batch partials of ``cents * floor(1000 * 2^-age_weeks)``.

    Every term is integer-exact by construction so the sum is
    order-independent and hash-matches the SQL oracle: prices go to
    integer cents (half-away rounding = DuckDB ROUND), the decay weight
    is ``floor(1000 * 0.5**age_weeks)`` where ``0.5**k`` is a dyadic
    rational that float64 (numpy ldexp here, POWER(0.5, k) in DuckDB)
    represents EXACTLY — a float ``exp(-age/tau)`` weight could never
    hash-match across engines with different libm vectorizations."""
    import numpy as np
    import pyarrow.compute as pc

    ds = T(sf_dir, "events", columns=["ts", "event_type", "value"])
    tmax_us = pd.Timestamp(ds.max("ts")).value // 1000
    week_us = np.int64(half_life_weeks) * 7 * 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        age_weeks = (tmax_us - ts_us) // week_us
        w_milli = np.floor(np.ldexp(1000.0, -np.minimum(age_weeks, 1060))).astype(np.int64)
        cents = pc.cast(
            pc.round(pc.multiply(t["value"], pa.scalar(100.0)), ndigits=0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        g = (
            pa.table(
                {
                    "event_type": t["event_type"],
                    "units": pa.array(cents * w_milli, pa.int64()),
                }
            )
            .group_by("event_type")
            .aggregate([("units", "sum"), ([], "count_all")])
        )
        return rename(g, {"units_sum": "p_units", "count_all": "p_n"})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("p_units", alias_name="decayed_units"), Sum("p_n", alias_name="n_events"))
        .to_pandas()
    )
    out["decayed_units"] = out["decayed_units"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def funnel_conversions(sf_dir: str, window_min: int = 60, n_buckets: int | None = None) -> pd.DataFrame:
    """Funnel step-pair conversion: how many distinct users had a
    'view' event, and how many of those had a 'purchase' at-or-after
    that view within ``window_min`` minutes — the product-analytics
    funnel the SQL oracle expresses as a self-join (quadratic per user
    in SQL; linear here). Shape: filter both step types AT THE READ
    BATCH (rows that are neither step never reach the shuffle), bucket
    by ``hash(user) % B`` (users are bucket-disjoint, so distinct-user
    partials add exactly), and inside each bucket one lexsort of
    (user, ts, step) + a reversed ``minimum.accumulate`` gives every
    view its nearest following purchase INDEX in O(n): if that nearest
    purchase belongs to a different user, the view's user has no later
    purchase at all (sorted runs are contiguous), so one vectorized
    (same-user AND within-window) mask finishes the join."""
    import numpy as np

    from .common import n_shuffle_buckets

    B = n_buckets or n_shuffle_buckets()
    assert B & (B - 1) == 0, f"n_buckets must be a power of two, got {B}"
    window_us = np.int64(window_min) * 60 * 1_000_000
    ds = T(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def add_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_p = pc.equal(t["event_type"], "purchase")
        keep = pc.or_(pc.equal(t["event_type"], "view"), is_p)
        t = t.filter(keep)
        b = pc.cast(pc.bit_wise_and(pc.cast(t["user_id"], pa.int64()), B - 1), pa.int64())
        return pa.table(
            {
                "bucket": b,
                "user_id": t["user_id"],
                "ts": t["ts"],
                "is_p": pc.cast(pc.equal(t["event_type"], "purchase"), pa.int8()),
            }
        )

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy(dtype="datetime64[ns]").view(np.int64) // 1000
        is_p = g["is_p"].to_numpy(dtype=np.int8)
        # views sort BEFORE purchases at an equal timestamp so a
        # same-instant purchase counts as "at or after" the view
        order = np.lexsort((is_p, ts, uid))
        uid_s, ts_s, is_p_s = uid[order], ts[order], is_p[order]
        n = len(uid_s)
        pos = np.where(is_p_s == 1, np.arange(n, dtype=np.int64), np.int64(n))
        next_p = np.minimum.accumulate(pos[::-1])[::-1]
        is_view = is_p_s == 0
        has_next = next_p < n
        idx = np.where(has_next, next_p, 0)
        converted = (
            is_view
            & has_next
            & (uid_s[idx] == uid_s)
            & (ts_s[idx] - ts_s <= window_us)
        )
        n_viewers = len(np.unique(uid_s[is_view]))
        n_converted = len(np.unique(uid_s[converted]))
        return pd.DataFrame([{"p_viewers": n_viewers, "p_converted": n_converted}])

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(funnel, batch_format="pandas")
        .to_pandas()
    )
    return pd.DataFrame(
        [
            {
                "n_viewers": np.int64(out["p_viewers"].sum()),
                "n_converted": np.int64(out["p_converted"].sum()),
            }
        ]
    )


def retention_cohorts(sf_dir: str, n_buckets: int | None = None) -> pd.DataFrame:
    """Weekly retention matrix: users are cohorted by the epoch-week of
    their FIRST event; cell (cohort_week, week_offset) counts distinct
    users of that cohort active ``week_offset`` weeks later — the
    retention triangle a growth pipeline derives from the raw log.

    Weeks are integer epoch-microsecond divisions (``epoch_us //
    week_us``) so both engines bucket identically (no date_trunc
    week-start convention to match). Shape: (1) in-batch dedup to
    (user, week) indicator partials, then a groupby that moves one row
    per DISTINCT (user, week) pair; (2) the per-user min + offsets via
    the house bucketed run-scan — shuffle key ``hash(user) % B``, one
    lexsort per bucket, cohort = first week of each user run, emit
    per-bucket (cohort, offset) count partials (users are
    bucket-disjoint so distinct counts add); (3) a final tiny groupby
    over #cohorts x #offsets rows."""
    import numpy as np

    from .common import n_shuffle_buckets

    B = n_buckets or n_shuffle_buckets()
    assert B & (B - 1) == 0, f"n_buckets must be a power of two, got {B}"
    week_us = np.int64(7 * 86_400_000_000)
    ds = T(sf_dir, "events", columns=["user_id", "ts"])

    def pair_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        week = pc.divide(t["ts"].cast(pa.timestamp("us")).cast(pa.int64()), pa.scalar(int(week_us)))
        uid = pc.cast(t["user_id"], pa.int64())
        b = pc.bit_wise_and(uid, B - 1)
        return (
            pa.table({"bucket": b, "user_id": uid, "week": week})
            .group_by(["bucket", "user_id", "week"])
            .aggregate([])
        )

    def cohort_scan(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(dtype=np.int64)
        wk = g["week"].to_numpy(dtype=np.int64)
        order = np.lexsort((wk, uid))
        uid_s, wk_s = uid[order], wk[order]
        new_user = np.concatenate(([True], uid_s[1:] != uid_s[:-1]))
        # a user's cohort week, repeated over their (still possibly
        # duplicated across input batches) sorted run
        starts = np.flatnonzero(new_user)
        runs = np.diff(np.append(starts, len(uid_s)))
        cohort = np.repeat(wk_s[starts], runs)
        off = wk_s - cohort
        # pair-dedup survived only within each input batch; finish it
        # here so each (user, week) counts once
        key_new = new_user | (np.concatenate(([True], off[1:] != off[:-1])))
        c, o = cohort[key_new], off[key_new]
        tab = pa.table({"cohort_week": pa.array(c), "week_offset": pa.array(o)})
        g2 = tab.group_by(["cohort_week", "week_offset"]).aggregate([([], "count_all")])
        return g2.rename_columns(["cohort_week", "week_offset", "p_users"]).to_pandas()

    out = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cohort_scan, batch_format="pandas")
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("p_users", alias_name="n_users"))
        .to_pandas()
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def event_type_matrix(sf_dir: str) -> pd.DataFrame:
    """Pivot: hour-of-day rows x event-type count columns (+ total and
    value sum) — the wide-format activity matrix (SQL's ``COUNT(*)
    FILTER (WHERE ...)`` pivot) produced shuffle-light: the pivot
    happens INSIDE each batch (one 0/1 indicator column per type, then
    a 24-row-bounded in-batch groupby), so the all-to-all moves <= 24
    partial rows per batch regardless of data size."""
    import pyarrow.compute as pc

    ds = T(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cols = {"hod": pc.hour(t["ts"]), "value": t["value"]}
        for et in EVENT_TYPES:
            cols[f"n_{et}"] = pc.cast(pc.equal(t["event_type"], et), pa.int64())
        g = (
            pa.table(cols)
            .group_by("hod")
            .aggregate([(f"n_{et}", "sum") for et in EVENT_TYPES] + [("value", "sum"), ([], "count_all")])
        )
        m = {f"n_{et}_sum": f"p_{et}" for et in EVENT_TYPES}
        m.update({"value_sum": "p_value", "count_all": "p_n"})
        return rename(g, m)

    aggs = [Sum(f"p_{et}", alias_name=f"n_{et}") for et in EVENT_TYPES]
    aggs += [Sum("p_value", alias_name="sum_value"), Sum("p_n", alias_name="n_total")]
    out = ds.map_batches(partial, batch_format="pyarrow").groupby("hod").aggregate(*aggs).to_pandas()
    out["sum_value"] = out["sum_value"].round(2)
    for c in out.columns:
        if c.startswith("n_"):
            out[c] = out[c].astype("int64")
    return out.sort_values("hod").reset_index(drop=True)


def value_deciles(sf_dir: str, k: int = 10, n_ranges: int | None = None) -> rd.Dataset:
    """Distributed NTILE(k): every event's global decile under
    ``ORDER BY value, event_id`` — the quantile-bucket feature
    (spend deciles, length deciles) training pipelines attach before
    stratified policies. No global sort: pass 1 lands the COMPRESSED
    value distribution on the driver (one row per DISTINCT 2-decimal
    value — domain-bounded, cap-guarded), whose cumsum yields both the
    balanced range boundaries and each range's exact global rank
    offset; pass 2 tags rows by ``searchsorted(bounds, value)``,
    lexsorts (value, event_id) inside each range, adds the offset, and
    maps ranks through SQL NTILE's first-buckets-get-the-remainder
    formula. Output stays a distributed Dataset, one row per event.

    Partitioning assumption (documented, as with the interval join's
    hot-key bound): rows sharing one value never split across ranges
    — a single value carrying a large fraction of all rows lands in
    one range task. For heavy-hitter domains, pre-bucket the tie-break
    (event_id) range instead."""
    import numpy as np
    import pyarrow.compute as pc

    from .common import bounded_driver_frame, n_shuffle_buckets

    B = n_ranges or n_shuffle_buckets()
    ds = T(sf_dir, "events", columns=["event_id", "value"])

    def dist_partial(t: pa.Table) -> pa.Table:
        g = t.select(["value"]).group_by("value").aggregate([([], "count_all")])
        return rename(g, {"count_all": "p_n"})

    dist = bounded_driver_frame(
        ds.map_batches(dist_partial, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("p_n", alias_name="n")),
        "value_deciles distinct-value distribution",
        max_rows=2_000_000,
    ).sort_values("value")
    vals = dist["value"].to_numpy(dtype=np.float64)
    counts = dist["n"].to_numpy(dtype=np.int64)
    cum = np.cumsum(counts)
    total = int(cum[-1])
    # range boundaries at ~equal row mass: bounds[i] = first value whose
    # cumulative count crosses (i+1)/B of the total (dedup'd: skewed
    # values collapse adjacent cuts instead of splitting a value)
    cut_idx = np.unique(np.searchsorted(cum, (np.arange(1, B) * total) // B, side="left"))
    cut_idx = cut_idx[(cut_idx >= 1) & (cut_idx < len(vals) - 1)]
    bounds = vals[cut_idx]  # row -> range_id via searchsorted(side='right')
    # range j starts AT bounds[j-1] (searchsorted side='right' sends a
    # row equal to a bound into the range after it), so its global rank
    # offset is the mass STRICTLY BELOW the bound: cum[cut-1], not cum[cut]
    offsets = np.concatenate(([0], cum[cut_idx - 1]))
    q, rem = total // k, total % k
    thr = rem * (q + 1)
    import ray as _ray

    bref = _ray.put((bounds, offsets))

    def tag(t: pa.Table) -> pa.Table:
        bnds, _ = _ray.get(bref)
        v = t["value"].to_numpy(zero_copy_only=False)
        rid = np.searchsorted(bnds, v, side="right").astype(np.int64)
        return pa.table({"range_id": pa.array(rid), "event_id": t["event_id"], "value": t["value"]})

    def rank_range(g: pd.DataFrame) -> pd.DataFrame:
        _, offs = _ray.get(bref)
        rid = int(g["range_id"].iloc[0])
        v = g["value"].to_numpy(dtype=np.float64)
        eid = g["event_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((eid, v))
        r = offs[rid] + np.arange(len(v), dtype=np.int64)
        dec = np.where(r < thr, r // (q + 1), rem + (r - thr) // max(q, 1)) + 1
        return pd.DataFrame({"event_id": eid[order], "decile": dec.astype(np.int64)})

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("range_id")
        .map_groups(rank_range, batch_format="pandas")
    )


def winsorized_value_stats(sf_dir: str, q_lo: float = 0.05, q_hi: float = 0.95) -> pd.DataFrame:
    """Per-type robust (winsorized) mean: clip ``value`` at the exact
    per-group [q_lo, q_hi] quantiles, then average — the outlier-proof
    statistic a metrics pipeline prefers over a raw mean. Two passes:
    (1) exact quantiles via the compressed value distribution (in-batch
    (type, value) count partials — bounded by DISTINCT values, which for
    quantized domains like 2-decimal prices is tiny; for genuinely
    continuous columns use ``sketches.value_quantiles_sketch`` to clip
    approximately instead), interpolated per group with the same
    ``(total-1)*q`` convention DuckDB's ``quantile_cont`` uses;
    (2) broadcast the per-group (lo, hi) frame (groups-sized) and
    clip + average shuffle-free with in-batch partials."""
    import numpy as np

    ds = T(sf_dir, "events", columns=["event_type", "value"])

    def dist_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["event_type", "value"])
            .group_by(["event_type", "value"])
            .aggregate([([], "count_all")])
        )
        return rename(g, {"count_all": "p_n"})

    def interp(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy(dtype=np.float64)
        w = g["n"].to_numpy(dtype=np.int64)
        o = np.argsort(v)
        v, w = v[o], w[o]
        cum = np.cumsum(w)
        total = cum[-1]

        def q_at(q: float) -> float:
            pos = (total - 1) * q
            lo_i = np.floor(pos)
            val = v[np.searchsorted(cum, lo_i, side="right")]
            hi_val = v[np.searchsorted(cum, min(lo_i + 1, total - 1), side="right")]
            return float(val + (hi_val - val) * (pos - lo_i))

        return pd.DataFrame(
            [{"event_type": g["event_type"].iloc[0], "lo": q_at(q_lo), "hi": q_at(q_hi)}]
        )

    bounds = (
        ds.map_batches(dist_partial, batch_format="pyarrow")
        .groupby(["event_type", "value"])
        .aggregate(Sum("p_n", alias_name="n"))
        .groupby("event_type")
        .map_groups(interp, batch_format="pandas")
        .to_pandas()
    )
    lo_map = dict(zip(bounds["event_type"], bounds["lo"]))
    hi_map = dict(zip(bounds["event_type"], bounds["hi"]))
    import ray as _ray

    ref = _ray.put((lo_map, hi_map))

    def clip_partial(t: pa.Table) -> pa.Table:
        lo_m, hi_m = _ray.get(ref)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        lo = np.array([lo_m[x] for x in et])
        hi = np.array([hi_m[x] for x in et])
        clipped = np.minimum(np.maximum(v, lo), hi)
        g = (
            pa.table({"event_type": t["event_type"], "cv": pa.array(clipped, pa.float64())})
            .group_by("event_type")
            .aggregate([("cv", "sum"), ([], "count_all")])
        )
        return rename(g, {"cv_sum": "p_sum", "count_all": "p_n"})

    out = (
        ds.map_batches(clip_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("p_sum", alias_name="s"), Sum("p_n", alias_name="n"))
        .to_pandas()
    )
    res = pd.DataFrame(
        {
            "event_type": out["event_type"],
            "n": out["n"].astype("int64"),
            "clipped_mean": (out["s"] / out["n"]).round(4),
        }
    )
    return res.sort_values("event_type").reset_index(drop=True)


def event_transitions(sf_dir: str, n_buckets: int | None = None) -> pd.DataFrame:
    """Markov transition counts over each user's ordered event stream —
    ``LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts,
    event_id)`` pair-counted into a global (from_type, to_type, n)
    table, the behavioural bigram model a sequence-aware ranking /
    abuse pipeline trains on (streaming-order analog of the reference's
    per-partition strictly-ordered log, crawler/blocks.go:50-60).

    Shape: the house bucketed run-scan (``sessionize``) — shuffle on
    ``hash(user) % B`` (never the raw key), one numpy lexsort of
    (user, ts, event_id) per bucket, the successor is ``arr[1:]`` with
    user-boundary positions masked, and each bucket emits PARTIAL
    (from, to, count) rows (at most |types|^2 per bucket, via np.unique
    on fused integer codes), so the final groupby moves a tiny
    fixed-cardinality table no matter how many events flowed."""
    import numpy as np

    from .common import n_shuffle_buckets

    B = n_buckets or n_shuffle_buckets()
    assert B & (B - 1) == 0, f"n_buckets must be a power of two, got {B}"
    ds = T(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def add_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = pc.cast(pc.bit_wise_and(pc.cast(t["user_id"], pa.int64()), B - 1), pa.int64())
        return pa.table(
            {
                "bucket": b,
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_type": t["event_type"],
            }
        )

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(dtype=np.int64)
        eid = g["event_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy(dtype="datetime64[ns]").view(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid_s = uid[order]
        # dictionary-encode types once per bucket; pairs become one
        # fused int64 code so counting is a single np.unique
        codes, uniques = pd.factorize(g["event_type"].to_numpy()[order], sort=True)
        same_user = uid_s[1:] == uid_s[:-1]
        frm = codes[:-1][same_user]
        to = codes[1:][same_user]
        if len(frm) == 0:
            return pd.DataFrame({"from_type": [], "to_type": [], "p_n": []}).astype(
                {"from_type": "object", "to_type": "object", "p_n": "int64"}
            )
        fused, counts = np.unique(frm.astype(np.int64) * len(uniques) + to, return_counts=True)
        return pd.DataFrame(
            {
                "from_type": uniques[fused // len(uniques)],
                "to_type": uniques[fused % len(uniques)],
                "p_n": counts.astype(np.int64),
            }
        )

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(transitions, batch_format="pandas")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("p_n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["from_type", "to_type"]).reset_index(drop=True)


def rolling_spend_cents(sf_dir: str, window: int = 3, n_buckets: int | None = None) -> rd.Dataset:
    """Row-based rolling window — ``SUM(cents) OVER (PARTITION BY
    o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING
    AND CURRENT ROW)`` — the trailing-k-purchases feature; complements
    ``cumulative_spend`` (unbounded window) and ``hopping_window``
    (time-based) with the ROWS-frame family Ray Data lacks natively.

    Same house bucketed run-scan + segmented cumsum as
    ``cumulative_spend``; the k-row trailing sum is ``cum[i] -
    cum[back]`` where ``back = max(i - k, run_start) - 1``, fully
    vectorized (one np.maximum + one gather). Integer cents (half-away,
    matching DuckDB ROUND) keep the sums hash-exact under any
    accumulation order. Output stays a distributed Dataset."""
    import numpy as np

    from .common import n_shuffle_buckets

    B = n_buckets or n_shuffle_buckets()
    assert B & (B - 1) == 0, f"n_buckets must be a power of two, got {B}"
    ds = T(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def add_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cents = pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0)), ndigits=0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        b = pc.cast(pc.bit_wise_and(pc.cast(t["o_custkey"], pa.int64()), B - 1), pa.int64())
        return pa.table(
            {
                "bucket": b,
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "o_orderdate": t["o_orderdate"],
                "cents": cents,
            }
        )

    def trailing(g: pd.DataFrame) -> pd.DataFrame:
        ck = g["o_custkey"].to_numpy(dtype=np.int64)
        ok = g["o_orderkey"].to_numpy(dtype=np.int64)
        dt = g["o_orderdate"].to_numpy(dtype="datetime64[ns]").view(np.int64)
        cents = g["cents"].to_numpy(dtype=np.int64)
        order = np.lexsort((ok, dt, ck))
        ck_s, ok_s, cents_s = ck[order], ok[order], cents[order]
        cum = np.cumsum(cents_s)
        new_key = np.concatenate(([True], ck_s[1:] != ck_s[:-1]))
        starts = np.flatnonzero(new_key)
        run_start = np.repeat(starts, np.diff(np.append(starts, len(cum))))
        i = np.arange(len(cum), dtype=np.int64)
        back = np.maximum(i - window, run_start - 1) + 1  # first row INSIDE the frame
        # windowed sum = cum[i] - cum[back - 1]; back == 0 means frame
        # starts at the table head (no prior prefix to subtract)
        prior = np.where(back > 0, cum[np.maximum(back - 1, 0)], 0)
        return pd.DataFrame(
            {
                "o_orderkey": ok_s,
                "o_custkey": ck_s,
                "roll_spend_cents": cum - prior,
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(trailing, batch_format="pandas")
    )


def weekly_revenue_wow(sf_dir: str) -> pd.DataFrame:
    """Week-over-week revenue: weekly cents totals with each week's
    predecessor alongside (``LAG(rev) OVER (ORDER BY week)``) — the
    growth/trend table a monitoring pipeline derives from the windowed
    aggregate (T4 metrics-flush analog, crawler/logger.go:40-55).

    The heavy part is distributed (in-batch per-week cents partials →
    one small groupby: the shuffle moves one row per (week, batch));
    the LAG runs on the driver over the ~|weeks|-row result — a
    fixed-cardinality frame regardless of input scale, the documented
    small-result exception to the no-driver-loop rule. First week's
    prev_cents is the -1 sentinel (not NULL) so both sides hash
    identically. The shuffle key is int64 epoch-us, not the timestamp
    itself: midnight-aligned timestamp keys trip Ray's sort-boundary
    sampling into a numpy 'D'-precision round-trip (the global_max
    precedent) — the tiny result frame converts back at the driver."""
    ds = T(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        week_us = pc.cast(pc.floor_temporal(t["o_orderdate"], unit="week"), pa.int64())
        cents = pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], pa.scalar(100.0)), ndigits=0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        g = (
            pa.table({"week_us": week_us, "cents": cents})
            .group_by("week_us")
            .aggregate([("cents", "sum")])
        )
        return rename(g, {"cents_sum": "p_cents"})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("week_us")
        .aggregate(Sum("p_cents", alias_name="rev_cents"))
        .to_pandas()
    )
    out = out.sort_values("week_us").reset_index(drop=True)
    out["week"] = pd.to_datetime(out["week_us"], unit="us").astype("datetime64[us]")
    out["rev_cents"] = out["rev_cents"].astype("int64")
    out["prev_cents"] = out["rev_cents"].shift(1, fill_value=-1).astype("int64")
    return out[["week", "rev_cents", "prev_cents"]]


def value_percent_rank(sf_dir: str, max_distribution_rows: int = 2_000_000) -> rd.Dataset:
    """Exact ``PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY
    value)`` with ZERO shuffles — the rank-normalized-score feature
    (calibration across event types) as the broadcast-CDF member of the
    window family: where ``value_deciles`` range-partitions to attach
    exact ranks, percent_rank only needs *per-row* strict-below counts,
    which a compressed distribution answers without moving any event.

    Pass 1 lands the COMPRESSED (type, value) distribution on the
    driver (one row per distinct 2-decimal value per type —
    domain-bounded, cap-guarded by ``bounded_driver_frame``); per type
    the cumsum gives mass strictly below every distinct value. Pass 2
    broadcasts those arrays once (``ray.put``) and each batch computes
    ``below = searchsorted(vals, v, 'left')`` -> ``pr = below/(n-1)``
    vectorized per type present in the batch. Ties share a rank by
    construction; single-row partitions get 0 (SQL convention). One
    row per event, stays a distributed Dataset."""
    import numpy as np

    from .common import bounded_driver_frame

    ds = T(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def dist_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["event_type", "value"])
            .group_by(["event_type", "value"])
            .aggregate([([], "count_all")])
        )
        return rename(g, {"count_all": "p_n"})

    dist = bounded_driver_frame(
        ds.map_batches(dist_partial, batch_format="pyarrow")
        .groupby(["event_type", "value"])
        .aggregate(Sum("p_n", alias_name="n")),
        "value_percent_rank per-type distinct-value distribution",
        max_rows=max_distribution_rows,
    ).sort_values(["event_type", "value"])

    cdf: dict[str, tuple[np.ndarray, np.ndarray, int]] = {}
    for et, g in dist.groupby("event_type", sort=False):
        vals = g["value"].to_numpy(dtype=np.float64)
        counts = g["n"].to_numpy(dtype=np.int64)
        below = np.concatenate(([0], np.cumsum(counts)[:-1]))
        cdf[str(et)] = (vals, below, int(counts.sum()))

    import ray as _ray

    cref = _ray.put(cdf)

    def rank(t: pa.Table) -> pa.Table:
        table = _ray.get(cref)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        pr = np.zeros(len(v), dtype=np.float64)
        codes, uniques = pd.factorize(et)
        for j, u in enumerate(uniques):
            vals, below, n = table[str(u)]
            m = codes == j
            if n > 1:
                pr[m] = below[np.searchsorted(vals, v[m], side="left")] / (n - 1)
        return pa.table(
            {"event_id": t["event_id"], "event_type": t["event_type"], "pr": pa.array(pr)}
        )

    return ds.map_batches(rank, batch_format="pyarrow")


def politeness_audit(log, budget: int) -> pd.DataFrame:
    """Per-host audit of a crawl log against the politeness contract
    (the monitoring companion to the engine's token buckets, auditing
    the same per-round budget the reference enforces with its polling
    ticker, /root/reference/crawler/crawler.go:34-51): for every host,
    (n_fetched, n_rounds, max_per_round, n_violations) where a
    violation is a round in which the host was fetched more than
    ``budget`` times. A healthy engine log audits to zero violations —
    the point is running it over logs produced elsewhere (a resumed
    multi-session crawl, a merged multi-cluster log) where the
    invariant is a claim, not a construction.

    Scale shape: two additive-partial groupbys — in-batch (host,
    round) counts -> one groupby Sum (rows: hosts x active rounds),
    then in-batch per-host partials (sum, max, round-count,
    violation-count over the now-distinct rows) -> one groupby
    Sum/Max. Fixed-width rows on both shuffles; no per-key dispatch."""
    import numpy as np
    from ray.data.aggregate import Max

    ds = rd.from_arrow(log) if isinstance(log, pa.Table) else log

    def rr_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["host", "round"])
            .group_by(["host", "round"])
            .aggregate([([], "count_all")])
        )
        return rename(g, {"count_all": "p_n"})

    per_round = (
        ds.map_batches(rr_partial, batch_format="pyarrow")
        .groupby(["host", "round"])
        .aggregate(Sum("p_n", alias_name="n"))
    )

    def host_partial(t: pa.Table) -> pa.Table:
        host = t["host"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(host, kind="stable")
        h_s, n_s = host[order], n[order]
        first = np.concatenate(([True], h_s[1:] != h_s[:-1]))
        runs = np.flatnonzero(first)
        return pa.table(
            {
                "host": pa.array(h_s[runs].astype(str), pa.string()),
                "p_fetched": pa.array(np.add.reduceat(n_s, runs), pa.int64()),
                "p_rounds": pa.array(
                    np.diff(np.append(runs, len(h_s))).astype(np.int64), pa.int64()
                ),
                "p_max": pa.array(np.maximum.reduceat(n_s, runs), pa.int64()),
                "p_viol": pa.array(
                    np.add.reduceat((n_s > budget).astype(np.int64), runs), pa.int64()
                ),
            }
        )

    out = (
        per_round.map_batches(host_partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("p_fetched", alias_name="n_fetched"),
            Sum("p_rounds", alias_name="n_rounds"),
            Max("p_max", alias_name="max_per_round"),
            Sum("p_viol", alias_name="n_violations"),
        )
        .to_pandas()
    )
    for c in ("n_fetched", "n_rounds", "max_per_round", "n_violations"):
        out[c] = out[c].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


def robots_audit(pages_dir: str, log, n_buckets: int = 16) -> pd.DataFrame:
    """Robots-conformance audit of a crawl log against the page store's
    own robots.txt pages — the policy sibling of
    :func:`politeness_audit` (same contract: the engine constructs the
    invariant, this op CHECKS it on logs where it is only a claim —
    resumed crawls, merged multi-cluster logs, third-party logs). Per
    host: (n_fetched, n_rules, n_violations) where a violation is a
    fetched URL whose path falls under a ``Disallow:`` prefix of that
    host's ``User-agent: *`` group (the same
    ``functions.robots.parse_robots`` subset the engine enforces).

    Scale shape: rule rows (host, prefix — robots-bounded, tiny) and
    log rows (host, path — fixed-width, no text) co-locate by
    ``hash(host) % B``; inside each bucket the LOOP IS OVER RULES, not
    URLs — each rule applies one vectorized ``np.char.startswith``
    over its host's contiguous path run. robots.txt rows never leave
    the read task as text: parsing happens in the batch that read
    them."""
    import numpy as np
    import ray.data as rd_
    from ray.data.aggregate import Max, Sum

    from ..functions.robots import parse_robots
    from ..functions.urls import hash64, url_host

    B = n_buckets
    assert B & (B - 1) == 0, f"n_buckets must be a power of two, got {B}"

    def _b(hosts: np.ndarray) -> np.ndarray:
        return (hash64(hosts) % np.uint64(B)).view(np.int64)

    pages = rd_.read_parquet(pages_dir, columns=["url", "text"])

    def rule_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # cheap vectorized prefilter, then confirm the path is EXACTLY
        # /robots.txt at the host root — a mirrored copy
        # (/archive/robots.txt) or an article about robots.txt must not
        # contribute rules for its host
        rob = t.filter(pc.ends_with(t["url"], "/robots.txt"))
        hosts, prefixes = [], []
        for u, body in zip(rob["url"].to_pylist(), rob["text"].to_pylist()):
            rest = u.split("://", 1)[-1]
            if ("/" + rest.split("/", 1)[1] if "/" in rest else "/") != "/robots.txt":
                continue
            h = url_host(u)
            for p in parse_robots(body or ""):
                hosts.append(h)
                prefixes.append(p)
        ha = np.asarray(hosts, dtype=object)
        return pa.table(
            {
                "qb": pa.array(_b(ha) if len(ha) else np.array([], np.int64), pa.int64()),
                "host": pa.array(ha.astype(str) if len(ha) else [], pa.string()),
                "path": pa.array(np.asarray(prefixes, dtype=str) if prefixes else [], pa.string()),
                "is_rule": pa.array(np.ones(len(ha), np.int8)),
            }
        )

    log_ds = rd_.from_arrow(log) if isinstance(log, pa.Table) else log

    def log_rows(t: pa.Table) -> pa.Table:
        hosts = t["host"].combine_chunks().to_numpy(zero_copy_only=False)
        urls = t["url"].to_pylist()
        paths = np.asarray(
            ["/" + u.split("://", 1)[-1].split("/", 1)[1] if "/" in u.split("://", 1)[-1] else "/" for u in urls],
            dtype=str,
        )
        return pa.table(
            {
                "qb": pa.array(_b(hosts.astype(object)), pa.int64()),
                "host": pa.array(hosts.astype(str), pa.string()),
                "path": pa.array(paths, pa.string()),
                "is_rule": pa.array(np.zeros(len(hosts), np.int8)),
            }
        )

    def audit(g: pd.DataFrame) -> pd.DataFrame:
        is_rule = g["is_rule"].to_numpy() == 1
        rules = g[is_rule]
        fetched = g[~is_rule]
        host_f = fetched["host"].to_numpy(dtype=object)
        path_f = fetched["path"].to_numpy(dtype=str)
        order = np.argsort(host_f, kind="stable")
        host_s, path_s = host_f[order], path_f[order]
        first = np.concatenate(([True], host_s[1:] != host_s[:-1])) if len(host_s) else np.array([], bool)
        starts = np.flatnonzero(first)
        run_hosts = host_s[starts]
        run_ends = np.append(starts[1:], len(host_s))
        viol = np.zeros(len(host_s), dtype=bool)
        # loop over RULES (robots-bounded), vectorized over each host's run
        for h, pref in zip(rules["host"], rules["path"]):
            i = np.searchsorted(run_hosts, h)
            if i >= len(run_hosts) or run_hosts[i] != h:
                continue
            a, b = starts[i], run_ends[i]
            viol[a:b] |= np.char.startswith(path_s[a:b], pref)
        n_v = np.add.reduceat(viol.astype(np.int64), starts) if len(starts) else np.array([], np.int64)
        n_f = (run_ends - starts).astype(np.int64)
        rule_counts = rules.groupby("host").size()
        out = pd.DataFrame(
            {
                "host": run_hosts.astype(str),
                "p_fetched": n_f,
                "p_viol": n_v,
                "p_rules": rule_counts.reindex(run_hosts, fill_value=0).to_numpy(np.int64),
            }
        )
        # hosts with rules but zero fetches still report their rule count
        missing = rule_counts.index.difference(run_hosts)
        if len(missing):
            out = pd.concat(
                [
                    out,
                    pd.DataFrame(
                        {
                            "host": np.asarray(missing, dtype=str),
                            "p_fetched": 0,
                            "p_viol": 0,
                            "p_rules": rule_counts.loc[missing].to_numpy(np.int64),
                        }
                    ),
                ]
            )
        return out

    out = (
        pages.map_batches(rule_rows, batch_format="pyarrow")
        .union(log_ds.map_batches(log_rows, batch_format="pyarrow"))
        .groupby("qb")
        .map_groups(audit, batch_format="pandas")
        .groupby("host")
        .aggregate(
            Sum("p_fetched", alias_name="n_fetched"),
            Max("p_rules", alias_name="n_rules"),
            Sum("p_viol", alias_name="n_violations"),
        )
        .to_pandas()
    )
    for c in ("n_fetched", "n_rules", "n_violations"):
        out[c] = out[c].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


def value_quantiles_exact(
    sf_dir: str,
    qs: tuple = (0.01, 0.25, 0.5, 0.75, 0.99),
    bin_shift: int = 48,
    max_boundary_rows: int = 20_000_000,
) -> pd.DataFrame:
    """EXACT discrete quantiles of ``events.value`` at arbitrary q —
    the order-statistic sibling of ``value_deciles`` with its
    domain-bounded assumption removed (deciles collects one row per
    DISTINCT 2-decimal value; this works on any float64 column via the
    histogram-refinement primitive ``fluency_buckets`` introduced) and
    of ``value_quantiles_sketch`` with the approximation removed
    (DDSketch trades exactness for one pass; this is exact in two).

    Rank convention matches DuckDB ``quantile_disc``:
    ``rank = max(0, ceil(q*n) - 1)`` over ASC order.

    Scale shape: floats map to their order-preserving uint64 key
    (sign-fold of the IEEE bits), a coarse arithmetic-shift histogram
    (<= 2^(64-bin_shift) bins) locates each target rank's bin in ONE
    partial-combiner groupby, ONLY the boundary bins' rows are
    collected (expected ~n/2^16 per target, cap-guarded), and the
    exact element is read off a driver sort of that sliver. No global
    sort, nothing corpus-sized lands anywhere."""
    import math

    import numpy as np

    from .common import bounded_driver_frame

    ds = T(sf_dir, "events", columns=["value"])

    # IEEE-754 total-order fold: non-negative floats compare as their
    # int64 bits; negative floats reverse-order as ints, so XOR their
    # lower 63 bits (keeps them negative, reverses the order; -0.0
    # lands at -1, just below +0.0's 0). XOR cannot overflow.
    def key_of(v: np.ndarray) -> np.ndarray:
        b = v.astype(np.float64).view(np.int64)
        return np.where(b >= 0, b, b ^ np.int64(0x7FFFFFFFFFFFFFFF))

    def hist_partial(t: pa.Table) -> pa.Table:
        k = key_of(t["value"].combine_chunks().to_numpy(zero_copy_only=False))
        g = (
            pa.table({"bin": pa.array(k >> bin_shift, pa.int64())})
            .group_by("bin")
            .aggregate([([], "count_all")])
        )
        return rename(g, {"count_all": "p_n"})

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("p_n", alias_name="n"))
        .to_pandas()
        .sort_values("bin")
    )
    if len(hist) == 0:  # empty table: no quantiles to report
        return pd.DataFrame(
            {"q": pd.Series([], dtype="float64"), "value": pd.Series([], dtype="float64")}
        )
    bins = hist["bin"].to_numpy(dtype=np.int64)
    cum = np.cumsum(hist["n"].to_numpy(dtype=np.int64))
    n = int(cum[-1])
    ranks = [max(0, math.ceil(q * n) - 1) for q in qs]
    need_bins = sorted(
        {int(bins[int(np.searchsorted(cum, r, side="right"))]) for r in ranks}
    )
    cum_excl = np.concatenate(([0], cum[:-1]))

    need_set = set(need_bins)

    def in_boundary(t: pa.Table) -> pa.Table:
        k = key_of(t["value"].combine_chunks().to_numpy(zero_copy_only=False))
        b = k >> bin_shift
        keep = np.fromiter((int(x) in need_set for x in b), dtype=bool, count=len(b))
        return t.filter(pa.array(keep))

    bnd = bounded_driver_frame(
        ds.map_batches(in_boundary, batch_format="pyarrow"),
        "value_quantiles_exact boundary-bin rows (~n/2^16 per target)",
        max_boundary_rows,
    )
    v = bnd["value"].to_numpy(dtype=np.float64)
    k = key_of(v)
    order = np.argsort(k, kind="stable")
    v_s, k_s = v[order], k[order]
    b_s = k_s >> bin_shift

    out_q, out_v = [], []
    for q, r in zip(qs, ranks):
        b = int(bins[int(np.searchsorted(cum, r, side="right"))])
        below = int(cum_excl[int(np.searchsorted(bins, b))])
        local = np.flatnonzero(b_s == b)[r - below]
        out_q.append(float(q))
        out_v.append(float(v_s[local]))
    return pd.DataFrame({"q": out_q, "value": out_v})
