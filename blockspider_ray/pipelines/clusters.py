"""Near-duplicate cluster resolution — connected components over pair lists.

The pair miners (``dedup.minhash_lsh_pairs`` / ``simhash_near_dups`` /
``ngram_jaccard_pairs``, ``similarity.embedding_near_dup_pairs``) emit
verified near-duplicate PAIRS; a real fuzzy-dedup corpus pass needs one
canonical doc per duplicate CLUSTER — pair lists are rarely
transitive-closed (A~B and B~C without an A~C pair must still collapse
to one kept doc). This module closes that gap: a distributed
connected-components operator, a query-surface wrapper over each miner,
and the ``corpus_prep`` near-dup drop built on it (``corpus.py``).

Algorithm: iterative min-label propagation with pointer jumping AND
parent hooking — the Shiloach–Vishkin family as adapted for sparse
message passing by FastSV (Zhang, Azad, Buluç, "FastSV: a distributed
connected-components algorithm", 2020 — public algorithm literature):

  state: label(v) = smallest doc_id v has seen (init: v itself),
         prev(v) = label(v) at the start of the previous iteration
  per iteration, exactly TWO bucketed all-to-alls of int64 rows:
    1. gather — static edges (u->v, mirrored both directions) UNION
       dynamic label-edges (label(v) -> v: the pointer jump, v asks its
       current label for ITS label) co-located with label rows by
       hash(src) % B; each group joins labels onto edge sources and
       emits messages (dst, label(src)), partial-MIN'd per dst in-group
    2. apply — join-messages + own label rows + HOOKING messages
       (dst = prev(v), payload = label(v), for every v whose label
       improved last round) co-located by hash(node) % B;
       label'(v) = min(label(v), incoming), prev'(v) = label(v),
       plus a changed flag
  stop when no label changed (per-block changed-sums read straight
  off the materialized blocks — no extra executor launch).

The hooking messages are what make this logarithmic instead of linear:
without them, a basin's representative m (a local min: label(m) = m, so
its own pointer jump is a no-op) learns about an adjacent basin only at
one static hop per round, while its followers — who DO see the adjacent
basin's smaller label — never report back. Hooking sends each improved
label to the node's previous parent, so representatives merge directly
(SV's "hook the old root onto the new min"); combined with the pointer
jump (SV's shortcutting) the planted-chain test measures ~8 rounds on
permuted 64-node chains (diameter 63) vs 40+ for propagation alone.
Hooking payloads are labels of the node's own component, so min-label
correctness is unaffected — only the convergence rate. LSH-banded
near-dup clusters are near-cliques or stars (``dedup.py`` emits star
pairs past MAX_BUCKET), so those converge in 2–3 rounds regardless of
corpus size; the planted-chain test pins the logarithmic worst case.

Scale notes (the house rules, same as ``dedup.py`` / ``corpus.py``):
every shuffled row is fixed-width int64 — never text; both exchanges
group by ``hash(key) % B`` with B from ``n_shuffle_buckets`` (per-group
dispatch amortized); per-iteration state is repartitioned to a FIXED
block count before materializing (the pagerank block-explosion lesson,
``graph.py:119-127``). The label table holds one row per doc that
appears in >= 1 pair — duplicate-bounded, like every frame this family
lands on the driver, and the final pull goes through
``bounded_driver_frame``.

Reference parity note: the reference (iquidus/blockspider) has no
near-dup machinery at all — this is part of the training-data toolkit
the brief adds on top of §2 parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .common import bounded_driver_frame, n_shuffle_buckets, sum_col_over_blocks

_MAX_DRIVER_ROWS = 50_000_000


def _bucket_of(ids: np.ndarray, n_buckets: int) -> np.ndarray:
    """Vectorized bucket of an int64 id array: splitmix-style
    multiplicative mix so sequential doc_ids spread across buckets
    (plain ``id % B`` would put an id-range-partitioned corpus's whole
    range in one bucket per block)."""
    x = ids.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return (x % np.uint64(n_buckets)).astype(np.int64)


_EMPTY_CC = pd.DataFrame(
    {"doc_id": pd.Series([], dtype="int64"), "cluster_id": pd.Series([], dtype="int64")}
)


def _cc_local(pairs: pd.DataFrame) -> pd.DataFrame:
    """Vectorized driver-side resolution for pair frames that already
    sit on the driver (every miner's output is duplicate-bounded and
    collected through its own ``bounded_driver_frame`` before it gets
    here, so this adds NO new driver state — running a distributed
    fixed-cost-per-round loop over a frame the driver is already
    holding would pay ~2 executor launches per iteration for nothing;
    measured: the 45-pair bench graph cost ~16 s distributed vs ~1 ms
    here). Same min-label + pointer-jump semantics as the distributed
    loop; numpy throughput handles the guard-limit 5x10^7 edges in
    seconds. Dataset inputs (the spilled-pairs scale path) never come
    through here."""
    a = pairs["doc_a"].to_numpy(dtype=np.int64)
    b = pairs["doc_b"].to_numpy(dtype=np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a) :]
    lbl = np.arange(len(nodes), dtype=np.int64)
    while True:
        new = lbl.copy()
        np.minimum.at(new, ia, lbl[ib])  # edge relax (both directions:
        np.minimum.at(new, ib, lbl[ia])  # pairs are undirected)
        new = np.minimum(new, new[new])  # pointer jump (shortcut)
        if np.array_equal(new, lbl):
            break
        lbl = new
    return pd.DataFrame({"doc_id": nodes, "cluster_id": nodes[lbl]})


def connected_components(
    pairs: pd.DataFrame | rd.Dataset,
    n_buckets: int | None = None,
    max_iters: int = 64,
    max_driver_rows: int = _MAX_DRIVER_ROWS,
) -> pd.DataFrame:
    """Resolve an undirected (doc_a, doc_b) pair list into components.

    Returns (doc_id, cluster_id) — one row per doc that appears in at
    least one pair, ``cluster_id`` = the smallest doc_id in its
    component — sorted by doc_id. Accepts the miners' pandas frames
    (duplicate-bounded by contract) or a Dataset for the spilled-pairs
    scale path; either way the iteration itself is fully distributed.
    """
    if isinstance(pairs, pd.DataFrame):
        if len(pairs) == 0:
            return _EMPTY_CC.copy()
        # a pandas frame is already driver-resident (the miners collect
        # through bounded_driver_frame by contract) — resolve it locally
        # instead of paying the distributed loop's per-iteration executor
        # cost; the Dataset branch below IS the scale path for pair lists
        # too large to land (spilled pairs)
        out = _cc_local(pairs)
        return out.sort_values("doc_id", kind="stable").reset_index(drop=True)
    B = n_buckets or n_shuffle_buckets()
    if B & (B - 1):
        raise ValueError(f"n_buckets must be a power of two, got {B}")

    def mirror(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    edges = pairs.map_batches(mirror, batch_format="pyarrow").materialize()
    if n_buckets is None:
        # scale-adaptive bucket count: the CPU-derived B is sized for
        # corpus-scale pair lists; a toy/duplicate-light graph under it
        # would pay B near-empty group dispatches per all-to-all PER
        # ITERATION (measured: the dominant cost of the battery's
        # 45-pair run). Target >= ~512 mirrored rows per bucket, floor
        # 4, cap B — the count is free, edges is already materialized.
        n_rows = edges.count()
        B = min(B, 1 << max(2, int(n_rows // 512 + 1).bit_length()))
    # per-iteration fixed block count: enough blocks to spread the
    # bucket groups, few enough that a k-iteration loop stays O(k)
    n_blocks = min(B, 64)
    edges = edges.repartition(n_blocks).materialize()

    # node universe = distinct src (mirroring makes src cover both ends)
    from ray.data.aggregate import Count, Sum

    def node_rows(t: pa.Table) -> pa.Table:
        u = np.unique(t["src"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"node": pa.array(u, pa.int64())})

    def init_lbl(t: pa.Table) -> pa.Table:
        # prev == lbl at init: no hooking messages until a label improves
        return pa.table({"node": t["node"], "lbl": t["node"], "prev": t["node"]})

    labels = (
        edges.map_batches(node_rows, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["node"])
        .map_batches(init_lbl, batch_format="pyarrow")
        .repartition(n_blocks)
        .materialize()
    )

    # --- gather-side taggers (schema: bucket, key, dst, lbl, side) ----
    def tag_edge(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(src, B), pa.int64()),
                "key": t["src"],
                "dst": t["dst"],
                "lbl": pa.array(np.zeros(t.num_rows, dtype=np.int64), pa.int64()),
                "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }
        )

    def tag_label(t: pa.Table) -> pa.Table:
        """Authority rows (side 0: label(key) is known here) plus the
        pointer-jump query edges (side 1: node asks label(lbl))."""
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        lbl = t["lbl"].to_numpy(zero_copy_only=False).astype(np.int64)
        jump = lbl != node
        jl, jn = lbl[jump], node[jump]
        return pa.table(
            {
                "bucket": pa.array(
                    np.concatenate([_bucket_of(node, B), _bucket_of(jl, B)]), pa.int64()
                ),
                "key": pa.array(np.concatenate([node, jl]), pa.int64()),
                "dst": pa.array(np.concatenate([np.zeros(len(node), dtype=np.int64), jn]), pa.int64()),
                "lbl": pa.array(np.concatenate([lbl, np.zeros(len(jl), dtype=np.int64)]), pa.int64()),
                "side": pa.array(
                    np.concatenate(
                        [np.zeros(len(node), dtype=np.int8), np.ones(len(jl), dtype=np.int8)]
                    )
                ),
            }
        )

    _empty_msg = pd.DataFrame(
        {"node": pd.Series([], dtype="int64"), "lbl": pd.Series([], dtype="int64")}
    )

    def gather(g: pd.DataFrame) -> pd.DataFrame:
        """One hash bucket of sources: join labels onto edges, emit the
        per-dst partial min (numpy lexsort run-scan — no per-key
        dispatch inside the group either)."""
        side = g["side"].to_numpy()
        e = g[side == 1]
        if len(e) == 0:
            return _empty_msg
        auth = g[side == 0]
        m = e[["key", "dst"]].merge(auth[["key", "lbl"]], on="key", how="inner")
        if len(m) == 0:
            return _empty_msg
        dst = m["dst"].to_numpy(dtype=np.int64)
        lbl = m["lbl"].to_numpy(dtype=np.int64)
        order = np.lexsort((lbl, dst))
        dst, lbl = dst[order], lbl[order]
        first = np.concatenate(([True], dst[1:] != dst[:-1]))
        return pd.DataFrame({"node": dst[first], "lbl": lbl[first]})

    # --- apply-side taggers (schema: bucket, node, lbl, side) ---------
    def tag_msg(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(node, B), pa.int64()),
                "node": t["node"],
                "lbl": t["lbl"],
                "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }
        )

    def tag_own(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(node, B), pa.int64()),
                "node": t["node"],
                "lbl": t["lbl"],
                "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            }
        )

    def tag_notify(t: pa.Table) -> pa.Table:
        """SV hooking (direct messages, no join needed): every node whose
        label improved last round tells its PREVIOUS parent the new
        label, so basin representatives merge directly instead of
        waiting for static one-hop propagation."""
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        lbl = t["lbl"].to_numpy(zero_copy_only=False).astype(np.int64)
        prev = t["prev"].to_numpy(zero_copy_only=False).astype(np.int64)
        hook = (prev != lbl) & (prev != node)
        hp, hl = prev[hook], lbl[hook]
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(hp, B), pa.int64()),
                "node": pa.array(hp, pa.int64()),
                "lbl": pa.array(hl, pa.int64()),
                "side": pa.array(np.ones(len(hp), dtype=np.int8)),
            }
        )

    def apply_min(g: pd.DataFrame) -> pd.DataFrame:
        node = g["node"].to_numpy(dtype=np.int64)
        lbl = g["lbl"].to_numpy(dtype=np.int64)
        side = g["side"].to_numpy()
        order = np.lexsort((lbl, node))
        node_s, lbl_s = node[order], lbl[order]
        first = np.concatenate(([True], node_s[1:] != node_s[:-1]))
        new = pd.Series(lbl_s[first], index=node_s[first])
        own = g[side == 0]
        own_node = own["node"].to_numpy(dtype=np.int64)
        own_lbl = own["lbl"].to_numpy(dtype=np.int64)
        out_lbl = new.loc[own_node].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "node": own_node,
                "lbl": out_lbl,
                "prev": own_lbl,  # feeds next round's hooking messages
                "changed": (out_lbl != own_lbl).astype(np.int8),
            }
        )

    for _ in range(max_iters):
        msgs = (
            labels.map_batches(tag_label, batch_format="pyarrow")
            .union(edges.map_batches(tag_edge, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(gather, batch_format="pandas")
        )
        labels = (
            labels.map_batches(tag_own, batch_format="pyarrow")
            .union(msgs.map_batches(tag_msg, batch_format="pyarrow"))
            .union(labels.map_batches(tag_notify, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(apply_min, batch_format="pandas")
            .repartition(n_blocks)
            .materialize()
        )
        # convergence probe off the just-materialized blocks — a
        # Dataset.sum() here would pay a SECOND full executor launch
        # per iteration (measured ~1 s planning tax each) to add a few
        # dozen per-block ints
        if not int(sum_col_over_blocks(labels, "changed")):
            break

    out = bounded_driver_frame(
        labels.select_columns(["node", "lbl"]),
        "connected_components labels (duplicate-bounded: one row per paired doc)",
        max_driver_rows,
    )
    out = out.rename(columns={"node": "doc_id", "lbl": "cluster_id"})
    return out.sort_values("doc_id", kind="stable").reset_index(drop=True)


def near_dup_clusters(
    sf_dir: str,
    method: str = "ngram",
    n_buckets: int | None = None,
    **mine_kwargs,
) -> pd.DataFrame:
    """Cluster-resolved near-duplicates over the ``documents`` table:
    mine verified pairs with ``method`` (``ngram`` exact Jaccard —
    SQL-oracle-able, the registered query — or ``minhash`` / ``simhash``
    as the sublinear scale paths), then connected components. Returns
    (doc_id, cluster_id, is_canonical) for every doc in >= 1 pair;
    ``is_canonical`` = 1 on the kept doc (smallest doc_id) per cluster,
    int64 for oracle hash parity."""
    from . import dedup

    miners = {
        "ngram": dedup.ngram_jaccard_pairs,
        "minhash": dedup.minhash_lsh_pairs,
        "simhash": dedup.simhash_near_dups,
    }
    if method == "embedding":
        # embedding-cosine near-dups: same resolution over the vector
        # pair miner (its frame names the endpoints vec_a/vec_b)
        from . import similarity

        pairs = similarity.embedding_near_dup_pairs(sf_dir, **mine_kwargs).rename(
            columns={"vec_a": "doc_a", "vec_b": "doc_b"}
        )
    else:
        pairs = miners[method](sf_dir, n_buckets=n_buckets, **mine_kwargs)
    cc = connected_components(pairs, n_buckets=n_buckets)
    cc["is_canonical"] = (cc["doc_id"] == cc["cluster_id"]).astype("int64")
    return cc


def near_dup_clusters_dist(
    sf_dir: str,
    method: str = "ngram",
    n_buckets: int | None = None,
    **mine_kwargs,
) -> pd.DataFrame:
    """``near_dup_clusters`` forced through the DISTRIBUTED FastSV loop
    (pairs handed over as a Dataset, the spilled-pairs scale path) —
    identical result by contract; registered as its own query/bench
    entry so the distributed loop stays oracle-checked and timed now
    that frame inputs resolve driver-locally."""
    from . import dedup

    pairs = {
        "ngram": dedup.ngram_jaccard_pairs,
        "minhash": dedup.minhash_lsh_pairs,
        "simhash": dedup.simhash_near_dups,
    }[method](sf_dir, n_buckets=n_buckets, **mine_kwargs)
    if len(pairs) == 0:
        cc = _EMPTY_CC.copy()
    else:
        cc = connected_components(rd.from_pandas(pairs[["doc_a", "doc_b"]]), n_buckets=n_buckets)
    cc["is_canonical"] = (cc["doc_id"] == cc["cluster_id"]).astype("int64")
    return cc
