"""Shared helpers for the data-processing pipelines.

Conventions (scale discipline, SURVEY.md §4):
  - reads always prune columns (``columns=[...]``);
  - per-batch work is Arrow/numpy-vectorized;
  - groupby aggregations pre-aggregate inside ``map_batches`` (partial
    combiners) so the all-to-all shuffle moves partials, not rows;
  - small sides are broadcast (``ray.put`` once, read per task), never
    shuffled;
  - float outputs are rounded identically in Ray and in the DuckDB
    oracle SQL so value hashes compare.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd


def T(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def rename(t: pa.Table, mapping: dict[str, str]) -> pa.Table:
    return t.rename_columns([mapping.get(c, c) for c in t.column_names])
