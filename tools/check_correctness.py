"""Local replica of the driver's correctness gate: run every queries()
entry at a given sf_dir and compare against oracle_sql() via DuckDB —
row count, sorted-column schema, and order-insensitive value equality.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd


TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def to_df(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.tz_localize(None) if getattr(df[c].dt, "tz", None) is not None else df[c]
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64", errors="ignore")
    # list/array-valued columns are unsortable (and unhashable): drop
    # them from the SORT KEY only — values still compare positionally
    sortable = [
        c
        for c in df.columns
        if df[c].dtype != object
        or not df[c].map(lambda x: isinstance(x, (list, tuple)) or hasattr(x, "__array__")).any()
    ]
    if not sortable:  # every column list-valued: positional compare only
        return df.reset_index(drop=True)
    return df.sort_values(sortable, kind="stable").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_df(fn(sf_dir)))
        except Exception:
            print(f"FAIL {name}: query raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok   {name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            n_pass += 1
            continue
        try:
            want = canon(con.sql(sqls[name]).df())
        except Exception:
            print(f"FAIL {name}: oracle SQL raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        ok = True
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            ok = False
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            ok = False
        else:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)
            except AssertionError as e:
                print(f"FAIL {name}: values differ: {str(e)[:400]}")
                ok = False
        if ok:
            print(f"ok   {name}: match ({len(got)} rows, {dt:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
