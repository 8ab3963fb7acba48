"""Mergeable-sketch operators — the approximate-aggregation family for
cardinalities too large to shuffle exactly.

``distinct_users_per_type`` is the exact companion (one (type, user)
distinct shuffle — fine while the pair universe fits an all-to-all);
``hll_users_per_type`` is the sketch path: per-batch HyperLogLog
register arrays (Flajolet et al. 2007, the standard mergeable
cardinality sketch) ride the shuffle instead of raw ids, so the
all-to-all moves ONE 2^p-byte row per (event_type, batch) regardless of
how many distinct users a batch holds — the 100-TB shape for distinct
counts over 10^9+ key universes. Registers merge by elementwise max
(associative/commutative/idempotent: order- and partition-insensitive),
and the group count is #event_types, so the final map_groups dispatch
is bounded.

No SQL oracle for the sketch (approximate by construction); pytest pins
the relative error against the exact companion on the fixture and on a
10x planted-cardinality table (standard error ~1.04/sqrt(2^p) ≈ 1.6%
at p=12).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

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
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
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
        order = np.argsort(et.astype(str), kind="stable")
        et_s, idx_s, rho_s = et[order], idx[order], rho[order]
        starts = np.flatnonzero(
            np.concatenate(([True], et_s[1:] != et_s[:-1]))
        )
        bounds = np.append(starts, len(et_s))
        for k in range(len(starts)):
            a, b = bounds[k], bounds[k + 1]
            regs = np.zeros(m, dtype=np.int8)
            np.maximum.at(regs, idx_s[a:b], rho_s[a:b])
            out_t.append(str(et_s[a]))
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
