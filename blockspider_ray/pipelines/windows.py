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


def sessionize(sf_dir: str) -> pd.DataFrame:
    """Session windows (30-min gap) per user via groupby().map_groups
    over the ts-sorted group — the per-key ordered-log pattern."""
    ds = T(sf_dir, "events", columns=["user_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        gap = g["ts"].diff() > pd.Timedelta(minutes=30)
        n_sessions = int(gap.sum()) + 1
        return pd.DataFrame(
            {"user_id": [g["user_id"].iloc[0]], "n_sessions": [n_sessions], "n_events": [len(g)]}
        )

    out = ds.groupby("user_id").map_groups(sessions, batch_format="pandas").to_pandas()
    out["n_sessions"] = out["n_sessions"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


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
