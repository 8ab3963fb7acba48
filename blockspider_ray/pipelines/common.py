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


def stripped_schema(path: str, columns: list[str] | None = None) -> pa.Schema:
    """The file's schema with the writer's ``b'pandas'`` metadata blob
    removed, projected to ``columns`` (in projection order, matching what
    the read emits). Footer-only read — one driver-side metadata fetch
    per table, O(KB) regardless of data size."""
    import pyarrow.parquet as pq

    sch = pq.read_schema(path).remove_metadata()
    if columns is not None:
        sch = pa.schema([sch.field(c) for c in columns])
    return sch


def T(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    """Column-pruned parquet read with the writer's ``b'pandas'`` schema
    metadata stripped AT THE DATASOURCE (explicit ``schema=``): pyarrow
    Schemas carrying the metadata dict are unhashable, so every schema
    dedup/unify — including the ReadParquet operator's own planning-time
    unify, which a post-read ``map_batches`` strip cannot reach (VERDICT
    r4 item 3) — logs a 'Failed to hash the schemas' warning, burying
    real worker errors in the bench/pytest tails. Passing the stripped
    schema means no block ever carries the metadata."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    return rd.read_parquet(path, columns=columns, schema=stripped_schema(path, columns))


def n_shuffle_buckets(floor: int = 16, per_cpu: int = 4, cap: int = 1 << 14) -> int:
    """Bucket count for dispatch-amortized candidate shuffles.

    The near-dup / dedup pipelines group their all-to-alls by
    ``key % B`` instead of the raw key: one group per DISTINCT key would
    pay Ray's per-group dispatch once per key (at corpus scale, once per
    document — the round-killer), while a fixed tiny B caps shuffle
    parallelism at B tasks and forces ~1/B of the exploded rows through
    one worker. So B tracks the cluster: ~``per_cpu`` groups per cluster
    CPU (enough groups that the shuffle saturates every core and each
    group is a small slice of the data, few enough that dispatch stays
    amortized), rounded up to a power of two (bit-mask-friendly, and the
    % of a non-negative int64 key is well defined either way). The cap
    only bounds degenerate resource reports."""
    try:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
    except Exception:
        ncpu = 0
    b = min(max(floor, per_cpu * ncpu), cap)
    return 1 << (b - 1).bit_length()


def bounded_driver_frame(ds: rd.Dataset, what: str, max_rows: int):
    """Materialize-then-guard for frames that are about to land on the
    DRIVER heap (``to_pandas``). The near-dup pipelines collect frames
    that are bounded by duplicate structure (candidate pairs, kept
    shingle keys) — small on a healthy corpus, but a boilerplate-heavy
    100-TB corpus can push them to 10^9+ rows. The materialize keeps the
    frame in the (spillable) object store; only the driver-heap pull is
    gated. Past the cap, raise with the escape hatch spelled out instead
    of OOM-ing the driver: spill the same Dataset with ``write_parquet``
    and consume it as a Dataset (or mmap the spilled files), exactly as
    ``corpus.py`` documents for ``max_broadcast_losers``."""
    mat = ds.materialize()
    n = mat.count()
    if n > max_rows:
        raise RuntimeError(
            f"{what}: {n:,} rows exceed the driver-collection cap ({max_rows:,}). "
            f"This frame is duplicate-bounded, so the corpus is duplicate-heavy; "
            f"raise the cap if the driver has heap for ~{n * 24 / 1e9:.1f}+ GB, or "
            f"spill with ds.write_parquet(...) and stream the spilled files instead "
            f"of collecting (see pipelines/common.py bounded_driver_frame)."
        )
    return mat.to_pandas()


def rename(t: pa.Table, mapping: dict[str, str]) -> pa.Table:
    return t.rename_columns([mapping.get(c, c) for c in t.column_names])


def sum_col_over_blocks(mat, col: str, where_col: str | None = None, equals=None):
    """Scalar int sum of ``col`` over an ALREADY-MATERIALIZED dataset,
    read straight off the object-store block refs with zero-cpu raw
    tasks. ``Dataset.sum()`` on the same data launches a full streaming
    executor (~1 s of planning/teardown at any scale) to add a few
    dozen per-block ints; the iterative loops (FastSV connected
    components, PageRank) paid that launch once per iteration as their
    convergence check, and at toy scale it dominated wall time. Raw
    tasks are the documented last-resort tier (SURVEY §4): this is a
    driver-side scalar over blocks the executor just produced — a
    convergence probe, not a data-plane bypass. Work per task is one
    vectorized column sum; per-block results are summed on the driver
    (#blocks scalars). With ``where_col``/``equals`` the per-block sum
    is filtered first (the PageRank dangling-mass probe)."""
    import ray

    refs = [r for b in mat.iter_internal_ref_bundles() for r in b.block_refs]
    return sum(ray.get([_block_col_sum.remote(r, col, where_col, equals) for r in refs]))


def _lazy_block_col_sum():
    import ray

    @ray.remote(num_cpus=0)
    def _sum(blk, col: str, where_col, equals):
        if isinstance(blk, pa.Table):
            import pyarrow.compute as pc

            # an EMPTY block loses its schema (repartition pads with
            # zero-row schema-less blocks); it contributes nothing
            if col not in blk.column_names:
                return 0
            if where_col is not None:
                blk = blk.filter(pc.equal(blk[where_col], equals))
            v = pc.sum(blk.column(col)).as_py()
            return v or 0
        if col not in blk.columns:
            return 0
        if where_col is not None:
            blk = blk[blk[where_col] == equals]
        s = blk[col].sum()
        return s if len(blk) else 0

    return _sum


class _LazyRemote:
    """Defer ray.remote decoration to first use so importing this
    module never touches ray state."""

    def __init__(self, factory):
        self._factory = factory
        self._fn = None

    def remote(self, *a, **kw):
        if self._fn is None:
            self._fn = self._factory()
        return self._fn.remote(*a, **kw)


_block_col_sum = _LazyRemote(_lazy_block_col_sum)
