"""Iterative graph computation over the crawl's host graph.

PageRank as a Ray-Data-native loop — the iterative-algorithm family
(power iteration), expressed without any driver-side row loop:

  per iteration, exactly two bucketed all-to-alls over fixed-width rows:
    1. contribute: rank rows and edge rows co-located by hash(src)
       bucket -> each src's rank multiplied onto its out-edge weights
    2. apply: contribution rows and node rows co-located by hash(dst)
       bucket -> per-node sums + teleport/dangling redistribution

  the iteration state (the rank table) is materialized once per
  iteration — the natural barrier of a power method, and the ONLY
  executor launch per iteration: the dangling set is static (flagged
  on the node table once), so its mass is probed straight off the
  previous rank table's blocks instead of a mid-iteration sentinel-row
  materialize+aggregate; everything that rides a shuffle is
  (key, float) pairs, never text or html.

Scale notes: buckets dilute hot hosts (a mega-host's out-edges share
one group with many other hosts only if the bucket count is too small —
``n_buckets`` is the knob); the per-iteration dangling mass is a single
per-block probe of the previous (already materialized) rank table. The host graph itself is built from the synthetic
page store with the SAME extraction kernels the engine uses
(functions/extract.extract_links + urls.url_host), so ranks are
computed over exactly the graph the crawler walks (crawler frontier
analog: priority ~ inlink mass).

Verified in pytest against a dense numpy power iteration with identical
teleport + dangling handling (no SQL oracle: iterative, the driver
records a rows-only check).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.extract import extract_links
from ..functions.urls import hash64, url_host
from .common import sum_col_over_blocks


def host_graph(pages_dir: str) -> rd.Dataset:
    """(src, dst, w) host-level edge list from a page store: links
    extracted per page (vectorized batch kernel), collapsed to host
    pairs with multiplicity ``w`` inside each batch (in-batch partial),
    then a single groupby finishes the count."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(pages_dir, columns=["url", "html"])

    def edges(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        htmls = t["html"].to_pylist()
        srcs: list[str] = []
        dsts: list[str] = []
        for u, h in zip(urls, htmls):
            sh = url_host(u)
            for link in extract_links(h, u):
                dh = url_host(link)
                if dh:
                    srcs.append(sh)
                    dsts.append(dh)
        if not srcs:
            return pa.table(
                {
                    "src": pa.array([], pa.string()),
                    "dst": pa.array([], pa.string()),
                    "w": pa.array([], pa.float64()),
                }
            )
        df = pd.DataFrame({"src": srcs, "dst": dsts})
        g = df.groupby(["src", "dst"], as_index=False).size()
        return pa.table(
            {
                "src": pa.array(g["src"], pa.string()),
                "dst": pa.array(g["dst"], pa.string()),
                "w": pa.array(g["size"].astype("float64"), pa.float64()),
            }
        )

    return (
        ds.map_batches(edges, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Sum("w", alias_name="w"))
    )


def _bucket_col(keys: pa.ChunkedArray | pa.Array, n_buckets: int) -> pa.Array:
    # zero-copy-ish object view of the Arrow string array (no python
    # list materialization) -> vectorized siphash, the same path as
    # stages/links.py's route hot loop
    arr = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    b = hash64(arr.to_numpy(zero_copy_only=False)) % np.uint64(n_buckets)
    return pa.array(b.astype(np.int64), pa.int64())




def pagerank(
    edges: rd.Dataset, k: int = 8, d: float = 0.85, n_buckets: int = 16
) -> rd.Dataset:
    """Power-iteration PageRank over an (src, dst, w) edge Dataset.
    Returns (host, r) with sum(r) == 1."""
    from ray.data.aggregate import Sum

    edges = edges.materialize()

    # out-degree normalization inside the hash(src) groupby — all of a
    # src's edges land in one group, so w_norm needs no separate join
    def add_bucket_src(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", _bucket_col(t["src"], n_buckets))

    def normalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["w_norm"] = g["w"] / g.groupby("src")["w"].transform("sum")
        return g[["src", "dst", "w_norm"]]

    # Every per-iteration dataset is repartitioned to a FIXED block
    # count before materializing: groupby/map_groups emits one block per
    # INPUT block and union concatenates block lists, so without the cap
    # the rank table gains ~2x n_buckets blocks per iteration and the
    # per-block task overhead makes iteration k cost O(k) (measured:
    # 0.95s -> 3.4s per contribute pass by iteration 3; k=8 ran 96s on a
    # 390-edge graph). With the cap every iteration is constant-cost.
    edges_n = (
        edges.map_batches(add_bucket_src, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(normalize, batch_format="pandas")
        .repartition(n_buckets)
        .materialize()
    )

    # node universe = src ∪ dst (distinct), each node flagged with
    # whether it has ANY out-edge — the dangling set is STATIC, so the
    # per-iteration dangling mass can be probed off the previous rank
    # table's blocks instead of materializing the contribution table
    # mid-iteration just to sum sentinel rows (that was a second full
    # executor launch per iteration)
    def node_rows(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d_ = t["dst"].to_numpy(zero_copy_only=False)
        g = (
            pa.table(
                {
                    "host": pa.array(np.concatenate([s, d_]), pa.string()),
                    "out": pa.array(
                        np.concatenate(
                            [np.ones(len(s), dtype=np.int8), np.zeros(len(d_), dtype=np.int8)]
                        )
                    ),
                }
            )
            .group_by("host")
            .aggregate([("out", "max")])
        )
        return g.rename_columns(["host", "p_out"])

    from ray.data.aggregate import Max

    nodes = (
        edges.map_batches(node_rows, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Max("p_out", alias_name="has_out"))
        .repartition(n_buckets)
        .materialize()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select_columns(["host"]).map_batches(
            lambda t: t.append_column("r", pa.array([], pa.float64())),
            batch_format="pyarrow",
        )

    def init_rank(t: pa.Table) -> pa.Table:
        has_out = t["has_out"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "host": t["host"],
                "r": pa.array(np.full(t.num_rows, 1.0 / n), pa.float64()),
                "dang": pa.array((has_out == 0).astype(np.int8)),
            }
        )

    rank = nodes.map_batches(init_rank, batch_format="pyarrow").materialize()

    for _ in range(k):
        # --- contribute: co-locate each src's rank with its out-edges
        def tag_rank(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "bucket": _bucket_col(t["host"], n_buckets),
                    "key": t["host"],
                    "dst": pa.nulls(t.num_rows, pa.string()),
                    "val": t["r"],
                    "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                }
            )

        def tag_edge(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "bucket": _bucket_col(t["src"], n_buckets),
                    "key": t["src"],
                    "dst": t["dst"],
                    "val": t["w_norm"],
                    "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                }
            )

        def contribute(g: pd.DataFrame) -> pd.DataFrame:
            r = g[g["side"] == 0][["key", "val"]].rename(columns={"val": "r"})
            e = g[g["side"] == 1][["key", "dst", "val"]]
            m = e.merge(r, on="key", how="inner")
            parts = pd.DataFrame({"dst": m["dst"], "part": m["val"] * m["r"]})
            # dangling mass is handled via the static per-node flag
            # (probed off the previous rank table) — no sentinel rows
            # in-bucket partial sum: one row per distinct dst leaves
            return parts.groupby("dst", as_index=False)["part"].sum()

        # --- apply: co-locate contributions with the node table
        def tag_part(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "bucket": _bucket_col(t["dst"], n_buckets),
                    "key": t["dst"],
                    "val": t["part"],
                    "dang": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                    "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                }
            )

        def tag_node(t: pa.Table) -> pa.Table:
            has_out = t["has_out"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "bucket": _bucket_col(t["host"], n_buckets),
                    "key": t["host"],
                    "val": pa.array(np.zeros(t.num_rows), pa.float64()),
                    "dang": pa.array((has_out == 0).astype(np.int8)),
                    "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                }
            )

        # dangling-mass probe off the PREVIOUS rank table's materialized
        # blocks: the dangling set is static, so no contribution-table
        # materialize (and no second executor launch) is needed — each
        # iteration is ONE fused launch (contribute shuffle -> apply
        # shuffle -> repartition)
        dang_total = float(sum_col_over_blocks(rank, "r", where_col="dang", equals=1))
        base = (1.0 - d) / n + d * dang_total / n

        def apply_rank(g: pd.DataFrame, base=base) -> pd.DataFrame:
            nodes_g = g[g["side"] == 0][["key", "dang"]]
            sums = g[g["side"] == 1].groupby("key", as_index=False)["val"].sum()
            m = nodes_g.merge(sums, on="key", how="left").fillna({"val": 0.0})
            return pd.DataFrame(
                {"host": m["key"], "r": base + d * m["val"], "dang": m["dang"].astype(np.int8)}
            )

        parts = (
            rank.map_batches(tag_rank, batch_format="pyarrow")
            .union(edges_n.map_batches(tag_edge, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(contribute, batch_format="pandas")
        )
        rank = (
            nodes.map_batches(tag_node, batch_format="pyarrow")
            .union(parts.map_batches(tag_part, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(apply_rank, batch_format="pandas")
            .repartition(n_buckets)
            .materialize()
        )

    return rank.select_columns(["host", "r"])


def pagerank_hosts(sf_dir: str, k: int = 8) -> pd.DataFrame:
    """PageRank over the deterministic tiny fixture's host graph (the
    same store the crawl queries walk). ``sf_dir`` is unused — graph
    queries run on the synthetic web, like crawl_log/crawl_seen."""
    from blockspider_ray import gen

    pages_dir, _ = gen.ensure_fixture("tiny")
    out = pagerank(host_graph(pages_dir), k=k).to_pandas()
    out["r"] = out["r"].round(12)
    return out.sort_values("host").reset_index(drop=True)


def hits(
    edges: rd.Dataset, k: int = 4, n_buckets: int = 16
) -> tuple[rd.Dataset, rd.Dataset]:
    """HITS hubs & authorities (Kleinberg, JACM'99) over an
    (src, dst, w) edge Dataset — the link-analysis complement of
    PageRank (a host can be a great directory without being a great
    destination; HITS separates the two roles the single PageRank
    score conflates). Returns ``(auth, hub)`` Datasets of (host, s).

    Same iterative architecture as :func:`pagerank` — per HALF-step,
    exactly two bucketed all-to-alls over fixed-width (key, float)
    rows and ONE executor launch ending in a fixed-count repartition +
    materialize (the power-method barrier):

      auth update: hub scores co-located with edges by hash(src) ->
        per-dst partials -> apply vs the node table -> L2-normalize
      hub update: auth scores co-located with edges by hash(dst) ->
        per-src partials -> apply -> L2-normalize

    The L2 norm is probed off the just-materialized score table's
    blocks (each row carries s²; ``sum_col_over_blocks`` is zero-cpu
    raw tasks, no second launch) and applied as a LAZY scalar divide
    that fuses into the next half-step's launch. Weighted adjacency:
    ``w`` is the link multiplicity, matching ``host_graph``."""
    from ray.data.aggregate import Count

    assert k >= 1, "hits() needs at least one iteration (auth is undefined at k=0)"
    edges = edges.materialize()

    def node_rows(t: pa.Table) -> pa.Table:
        hosts = np.unique(
            np.concatenate(
                [
                    t["src"].to_numpy(zero_copy_only=False),
                    t["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"host": pa.array(hosts, pa.string())})

    nodes = (
        edges.map_batches(node_rows, batch_format="pyarrow")
        .groupby("host")
        .aggregate(Count(alias_name="_c"))
        .select_columns(["host"])
        .repartition(n_buckets)
        .materialize()
    )
    n = nodes.count()
    empty = nodes.map_batches(
        lambda t: pa.table(
            {"host": t["host"], "s": pa.array(np.zeros(t.num_rows), pa.float64())}
        ),
        batch_format="pyarrow",
    )
    if n == 0:
        return empty, empty

    def init_scores(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": t["host"],
                "s": pa.array(np.full(t.num_rows, 1.0 / np.sqrt(n)), pa.float64()),
            }
        )

    hub = nodes.map_batches(init_scores, batch_format="pyarrow")
    auth = None

    def half_step(scores: rd.Dataset, key_col: str, other_col: str) -> rd.Dataset:
        """One HITS half-step: sum ``w * s(key_col endpoint)`` into every
        ``other_col`` endpoint, then L2-normalize. scores: (host, s)."""

        def tag_score(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "bucket": _bucket_col(t["host"], n_buckets),
                    "key": t["host"],
                    "other": pa.nulls(t.num_rows, pa.string()),
                    "val": t["s"],
                    "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                }
            )

        def tag_edge(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "bucket": _bucket_col(t[key_col], n_buckets),
                    "key": t[key_col],
                    "other": t[other_col],
                    "val": t["w"],
                    "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                }
            )

        def contribute(g: pd.DataFrame) -> pd.DataFrame:
            s = g[g["side"] == 0][["key", "val"]].rename(columns={"val": "s"})
            e = g[g["side"] == 1][["key", "other", "val"]]
            m = e.merge(s, on="key", how="inner")
            parts = pd.DataFrame({"node": m["other"], "part": m["val"] * m["s"]})
            return parts.groupby("node", as_index=False)["part"].sum()

        def tag_part(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "bucket": _bucket_col(t["node"], n_buckets),
                    "key": t["node"],
                    "val": t["part"],
                    "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                }
            )

        def tag_node(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "bucket": _bucket_col(t["host"], n_buckets),
                    "key": t["host"],
                    "val": pa.array(np.zeros(t.num_rows), pa.float64()),
                    "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                }
            )

        def apply_s(g: pd.DataFrame) -> pd.DataFrame:
            nodes_g = g[g["side"] == 0][["key"]]
            sums = g[g["side"] == 1].groupby("key", as_index=False)["val"].sum()
            m = nodes_g.merge(sums, on="key", how="left").fillna({"val": 0.0})
            return pd.DataFrame(
                {"host": m["key"], "s": m["val"], "s2": m["val"] * m["val"]}
            )

        raw = (
            scores.map_batches(tag_score, batch_format="pyarrow")
            .union(edges.map_batches(tag_edge, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(contribute, batch_format="pandas")
            .map_batches(tag_part, batch_format="pyarrow")
            .union(nodes.map_batches(tag_node, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(apply_s, batch_format="pandas")
            .repartition(n_buckets)
            .materialize()
        )
        nrm = float(np.sqrt(sum_col_over_blocks(raw, "s2"))) or 1.0

        def div(t: pa.Table, nrm=nrm) -> pa.Table:
            return pa.table(
                {
                    "host": t["host"],
                    "s": pa.array(
                        t["s"].to_numpy(zero_copy_only=False) / nrm, pa.float64()
                    ),
                }
            )

        return raw.map_batches(div, batch_format="pyarrow")  # lazy scalar divide

    for _ in range(k):
        auth = half_step(hub, "src", "dst")
        hub = half_step(auth, "dst", "src")

    return auth, hub


def hits_hosts(sf_dir: str, k: int = 4) -> pd.DataFrame:
    """HITS over the deterministic tiny fixture's host graph (``sf_dir``
    unused, like ``pagerank_hosts``). Returns (host, auth, hub) — the
    node-bounded final merge lands driver-side; at corpus scale keep the
    two Datasets from :func:`hits` apart instead."""
    from blockspider_ray import gen

    pages_dir, _ = gen.ensure_fixture("tiny")
    auth, hub = hits(host_graph(pages_dir), k=k)
    a = auth.to_pandas().rename(columns={"s": "auth"})
    h = hub.to_pandas().rename(columns={"s": "hub"})
    out = a.merge(h, on="host", how="outer").fillna(0.0)
    out["auth"] = out["auth"].round(12)
    out["hub"] = out["hub"].round(12)
    return out.sort_values("host").reset_index(drop=True)


def triangle_count(
    edges: rd.Dataset,
    n_buckets: int = 16,
    max_node_table_rows: int = 50_000_000,
) -> pd.DataFrame:
    """Exact global triangle count over an (src, dst, *) edge Dataset —
    the clustering/community measurement of the crawled web (triangles
    per host neighborhood are the standard link-spam / community-density
    signal next to PageRank and connected components).

    Algorithm: degree-ordered edge orientation + wedge closure — the
    MapReduce-classic that bounds the wedge count by O(m^1.5) no matter
    how skewed the degree distribution (a mega-hub generates wedges only
    at its few HIGHER-degree peers, never at itself):

      1. canonicalize: hash64(host) ids, self-loops dropped, one
         distinct undirected edge per pair (groupby dedup);
      2. node table (node -> degree) via in-batch unique partials; it
         lands on the driver cap-guarded (one int per node — at
         web-host cardinality this is the same node-bounded broadcast
         pagerank's dangling table uses) and is broadcast ONCE with
         dense rank ids + orientation keys ``deg * 2^32 + rank``;
      3. orient each edge low-(deg,rank) -> high, fused int64 key
         ``a_rank * 2^32 + b_rank`` (ranks < 2^31: exact, no modular
         collision);
      4. wedges: bucket oriented edges by ``a_rank & (B-1)`` (a center's
         out-edges co-locate), one vectorized self-merge per bucket
         emits (x, y) neighbor pairs in orientation order;
      5. closure: wedge keys and edge keys co-bucketed on the fused
         key's low bits; one ``np.isin`` per bucket counts closed
         wedges. Each triangle is counted exactly once (its apex is
         its lowest-(deg,rank) vertex).

    Returns a one-row frame ``{n_triangles}``. Partitioning assumption:
    per-bucket wedge sets fit a task (holds by the O(m^1.5) bound when
    B ~ cluster CPUs; raise ``n_buckets`` for very dense graphs)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from .common import bounded_driver_frame

    assert n_buckets & (n_buckets - 1) == 0, (
        f"n_buckets must be a power of two, got {n_buckets}"
    )
    B = n_buckets

    def canon(t: pa.Table) -> pa.Table:
        u = hash64(t["src"].combine_chunks().to_numpy(zero_copy_only=False))
        v = hash64(t["dst"].combine_chunks().to_numpy(zero_copy_only=False))
        keep = u != v
        u, v = u[keep], v[keep]
        lo = np.minimum(u, v).view(np.int64)
        hi = np.maximum(u, v).view(np.int64)
        return pa.table({"lo": pa.array(lo, pa.int64()), "hi": pa.array(hi, pa.int64())})

    dedup = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["lo", "hi"])
        .aggregate(Count(alias_name="_m"))
        .select_columns(["lo", "hi"])
        .materialize()
    )

    def deg_partial(t: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                t["lo"].to_numpy(zero_copy_only=False),
                t["hi"].to_numpy(zero_copy_only=False),
            ]
        )
        nodes, counts = np.unique(both, return_counts=True)
        return pa.table(
            {"node": pa.array(nodes, pa.int64()), "p_d": pa.array(counts, pa.int64())}
        )

    deg = bounded_driver_frame(
        dedup.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("p_d", alias_name="d")),
        "triangle_count node/degree table (node-bounded)",
        max_rows=max_node_table_rows,
    ).sort_values("node")
    nodes_sorted = deg["node"].to_numpy(dtype=np.int64)
    degs = deg["d"].to_numpy(dtype=np.int64)
    okey = degs * np.int64(1 << 32) + np.arange(len(degs), dtype=np.int64)

    import ray as _ray

    nref = _ray.put((nodes_sorted, okey))

    def orient(t: pa.Table) -> pa.Table:
        ns, ok = _ray.get(nref)
        ru = np.searchsorted(ns, t["lo"].to_numpy(zero_copy_only=False))
        rv = np.searchsorted(ns, t["hi"].to_numpy(zero_copy_only=False))
        swap = ok[ru] > ok[rv]
        a = np.where(swap, rv, ru).astype(np.int64)
        b = np.where(swap, ru, rv).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(a & (B - 1), pa.int64()),
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "okb": pa.array(ok[b], pa.int64()),
            }
        )

    oriented = dedup.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        m = g[["a", "b", "okb"]].merge(g[["a", "b", "okb"]], on="a")
        m = m[m["okb_x"] < m["okb_y"]]
        wk = m["b_x"].to_numpy(dtype=np.int64) * np.int64(1 << 32) + m["b_y"].to_numpy(
            dtype=np.int64
        )
        return pd.DataFrame({"key": wk, "is_edge": np.zeros(len(wk), dtype=np.int64)})

    wedge_rows = oriented.groupby("bucket").map_groups(wedges, batch_format="pandas")

    def edge_keys(t: pa.Table) -> pa.Table:
        ek = t["a"].to_numpy(zero_copy_only=False) * np.int64(1 << 32) + t[
            "b"
        ].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(ek, pa.int64()),
                "is_edge": pa.array(np.ones(len(ek), dtype=np.int64), pa.int64()),
            }
        )

    edge_rows = oriented.map_batches(edge_keys, batch_format="pyarrow")

    def rebucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["key"], B - 1), pa.int64())
        return pa.table({"cbucket": b, "key": t["key"], "is_edge": t["is_edge"]})

    def closed(g: pd.DataFrame) -> pd.DataFrame:
        is_e = g["is_edge"].to_numpy(dtype=np.int64) == 1
        keys = g["key"].to_numpy(dtype=np.int64)
        n = int(np.isin(keys[~is_e], keys[is_e]).sum())
        return pd.DataFrame({"p_tri": [n]})

    parts = (
        wedge_rows.union(edge_rows)
        .map_batches(rebucket, batch_format="pyarrow")
        .groupby("cbucket")
        .map_groups(closed, batch_format="pandas")
        .to_pandas()
    )
    return pd.DataFrame({"n_triangles": [int(parts["p_tri"].sum())]})


def host_triangles(sf_dir: str) -> pd.DataFrame:
    """Triangle count of the synthetic web's host graph (the same store
    the crawl queries walk; ``sf_dir`` unused, like pagerank_hosts).
    Verified in pytest against a dense numpy reference (trace(A^3)/6)
    plus planted path/K5/bowtie fixtures — no SQL oracle (graph
    closure over the page store; the driver records rows-only)."""
    from blockspider_ray import gen

    pages_dir, _ = gen.ensure_fixture("tiny")
    return triangle_count(host_graph(pages_dir))


def anchor_agg(pages: rd.Dataset, n_buckets: int | None = None) -> rd.Dataset:
    """Per-target in-link anchor-text aggregation over a page store:
    (url, top_anchor, top_n, n_inlinks, n_anchors) — the signal web
    corpora attach to every page from the text its in-links use to
    name it (search labeling, title repair, alt-text mining).

    Scale shape: anchor pairs pre-collapse to (dst, anchor, count)
    inside each batch, ONE (dst, anchor) groupby sums them, and the
    per-target resolution is the house bucketed run-scan — rows
    co-locate by ``hash(dst) % B`` and one lexsort per bucket picks
    each target's winner (count DESC, anchor ASC tiebreak) and its
    distinct-anchor/in-link totals, never one dispatch per target.
    Anchor strings are short (link labels), so letting them ride the
    one shuffle keeps the output exact; at 10^10 URLs the same
    pipeline holds — the all-to-all moves (dst, anchor, count)
    partials bounded by DISTINCT labels per target, not raw link
    occurrences."""
    from ray.data.aggregate import Sum

    from ..functions.extract import extract_anchors
    from .common import n_shuffle_buckets, rename

    B = n_buckets or n_shuffle_buckets()
    assert B & (B - 1) == 0, f"n_buckets must be a power of two, got {B}"

    def pairs(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        htmls = t["html"].to_pylist()
        dsts: list[str] = []
        anchors: list[str] = []
        for u, h in zip(urls, htmls):
            for dst, a in extract_anchors(h, u):
                dsts.append(dst)
                anchors.append(a)
        if not dsts:
            return pa.table(
                {
                    "dst": pa.array([], pa.string()),
                    "anchor": pa.array([], pa.string()),
                    "p_n": pa.array([], pa.int64()),
                }
            )
        df = pd.DataFrame({"dst": dsts, "anchor": anchors})
        g = df.groupby(["dst", "anchor"], as_index=False).size()
        return pa.table(
            {
                "dst": pa.array(g["dst"], pa.string()),
                "anchor": pa.array(g["anchor"], pa.string()),
                "p_n": pa.array(g["size"].astype("int64"), pa.int64()),
            }
        )

    counts = (
        pages.map_batches(pairs, batch_format="pyarrow")
        .groupby(["dst", "anchor"])
        .aggregate(Sum("p_n", alias_name="n"))
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("qb", _bucket_col(t["dst"], B))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        dst = g["dst"].to_numpy(dtype=object)
        anchor = g["anchor"].to_numpy(dtype=object)
        n = g["n"].to_numpy(dtype=np.int64)
        # (dst ASC, count DESC, anchor ASC): winner = first row of run
        order = np.lexsort((anchor, -n, dst))
        dst_s, a_s, n_s = dst[order], anchor[order], n[order]
        first = np.concatenate(([True], dst_s[1:] != dst_s[:-1]))
        runs = np.flatnonzero(first)
        sizes = np.diff(np.append(runs, len(dst_s)))
        return pd.DataFrame(
            {
                "url": dst_s[runs].astype(str),
                "top_anchor": a_s[runs].astype(str),
                "top_n": n_s[runs],
                "n_inlinks": np.add.reduceat(n_s, runs),
                "n_anchors": sizes.astype(np.int64),
            }
        )

    return (
        counts.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("qb")
        .map_groups(resolve, batch_format="pandas")
    )


def anchor_texts(sf_dir: str) -> pd.DataFrame:
    """Anchor aggregation over the deterministic tiny fixture's page
    store (``sf_dir`` unused, like pagerank_hosts — graph queries run
    on the synthetic web). Pytest pins the result against a sequential
    dict-based reference over the same pages; the kernel's HTML edge
    semantics are pinned by handcrafted unit fixtures."""
    from blockspider_ray import gen

    pages_dir, _ = gen.ensure_fixture("tiny")
    pages = rd.read_parquet(pages_dir, columns=["url", "html"])
    out = anchor_agg(pages).to_pandas()
    return out.sort_values("url").reset_index(drop=True)


def degree_table(edges: rd.Dataset) -> rd.Dataset:
    """Per-host degree/strength/reciprocity profile of an (src, dst, w)
    host-graph Dataset: (host, out_deg, in_deg, out_w, in_w, n_recip) —
    out/in degree count DISTINCT neighbor hosts (edge rows are already
    collapsed per pair), strengths sum link multiplicities, and
    ``n_recip`` counts the host's mutually-linked partners (the
    reciprocity signal link-spam/community analyses start from;
    self-loops are excluded from it but kept in degrees).

    Scale shape: degrees are in-batch partials unioned into ONE host
    groupby; reciprocity canonicalizes each edge to its unordered pair
    (lo, hi, fwd/rev flags), collapses per batch so the all-to-all
    moves one fixed-width row per (pair, batch), resolves pair
    completion with native Max aggregates, and mutual pairs re-enter
    the same host groupby as +1 partials for both ends. Three
    all-to-alls total, all over short host strings with additive
    partials; no per-key dispatch anywhere."""
    from ray.data.aggregate import Max, Sum

    def deg_partial(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        df = pd.concat(
            [
                pd.DataFrame({"host": src, "out_deg": 1, "out_w": w, "in_deg": 0, "in_w": 0.0}),
                pd.DataFrame({"host": dst, "out_deg": 0, "out_w": 0.0, "in_deg": 1, "in_w": w}),
            ]
        )
        g = df.groupby("host", as_index=False).sum()
        g["n_recip"] = 0
        # direct pa.table construction: from_pandas would attach the
        # b'pandas' schema metadata T() exists to strip
        return pa.table(
            {
                "host": pa.array(g["host"].astype(str), pa.string()),
                "out_deg": pa.array(g["out_deg"].to_numpy(np.int64), pa.int64()),
                "in_deg": pa.array(g["in_deg"].to_numpy(np.int64), pa.int64()),
                "out_w": pa.array(g["out_w"].to_numpy(np.float64), pa.float64()),
                "in_w": pa.array(g["in_w"].to_numpy(np.float64), pa.float64()),
                "n_recip": pa.array(g["n_recip"].to_numpy(np.int64), pa.int64()),
            }
        )

    def pair_partial(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(object)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(object)
        keep = src != dst  # self-loops never reciprocate
        src, dst = src[keep], dst[keep]
        fwd = src < dst
        lo = np.where(fwd, src, dst)
        hi = np.where(fwd, dst, src)
        df = pd.DataFrame(
            {"lo": lo, "hi": hi, "fwd": fwd.astype(np.int64), "rev": (~fwd).astype(np.int64)}
        )
        g = df.groupby(["lo", "hi"], as_index=False).max()
        return pa.table(
            {
                "lo": pa.array(g["lo"].astype(str), pa.string()),
                "hi": pa.array(g["hi"].astype(str), pa.string()),
                "fwd": pa.array(g["fwd"].to_numpy(np.int64), pa.int64()),
                "rev": pa.array(g["rev"].to_numpy(np.int64), pa.int64()),
            }
        )

    mutual = (
        edges.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["lo", "hi"])
        .aggregate(Max("fwd", alias_name="f"), Max("rev", alias_name="r"))
    )

    def recip_rows(t: pa.Table) -> pa.Table:
        both = pa.compute.and_(
            pa.compute.equal(t["f"], 1), pa.compute.equal(t["r"], 1)
        )
        t = t.filter(both)
        hosts = np.concatenate(
            [
                t["lo"].to_numpy(zero_copy_only=False).astype(object),
                t["hi"].to_numpy(zero_copy_only=False).astype(object),
            ]
        )
        df = pd.DataFrame({"host": hosts})
        g = df.groupby("host", as_index=False).size()
        n = len(g)
        return pa.table(
            {
                "host": pa.array(g["host"].astype(str), pa.string()),
                "out_deg": pa.array(np.zeros(n, np.int64), pa.int64()),
                "in_deg": pa.array(np.zeros(n, np.int64), pa.int64()),
                "out_w": pa.array(np.zeros(n, np.float64), pa.float64()),
                "in_w": pa.array(np.zeros(n, np.float64), pa.float64()),
                "n_recip": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
            }
        )

    parts = edges.map_batches(deg_partial, batch_format="pyarrow").union(
        mutual.map_batches(recip_rows, batch_format="pyarrow")
    )
    return parts.groupby("host").aggregate(
        Sum("out_deg", alias_name="out_deg"),
        Sum("in_deg", alias_name="in_deg"),
        Sum("out_w", alias_name="out_w"),
        Sum("in_w", alias_name="in_w"),
        Sum("n_recip", alias_name="n_recip"),
    )


def host_degrees(sf_dir: str) -> pd.DataFrame:
    """Degree profile of the synthetic web's host graph (``sf_dir``
    unused, like pagerank_hosts). Pytest pins full-frame equality vs a
    sequential dict reference plus planted mutual/one-way/self-loop
    fixtures — no SQL oracle (graph closure over the page store)."""
    from blockspider_ray import gen

    pages_dir, _ = gen.ensure_fixture("tiny")
    out = degree_table(host_graph(pages_dir)).to_pandas()
    for c in ("out_deg", "in_deg", "n_recip"):
        out[c] = out[c].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


def component_table(edges: rd.Dataset) -> pd.DataFrame:
    """Weakly-connected components of an (src, dst, w) host-graph
    Dataset — the web-graph structure question (is the crawl one
    connected web or islands?) answered with the SAME distributed
    FastSV loop the near-dup family uses
    (``clusters.connected_components``), fed host hashes instead of
    doc ids. Self-loops are dropped (they connect nothing); hosts
    whose only edges were self-loops come back as their own singleton
    component.

    Returns (host, component, component_size) — ``component`` is the
    lexicographically smallest HOST NAME in the component (stable
    across hash choices), sorted by host. The id->host resolution and
    the final frame are node-bounded, the same driver-landing class as
    ``connected_components``'s own contract; the iteration itself is
    fully distributed."""
    from ..functions.urls import hash64
    from .clusters import connected_components

    edges = edges.materialize()

    def id_pairs(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(object)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(object)
        keep = src != dst
        a = hash64(src[keep]).view(np.int64)
        b = hash64(dst[keep]).view(np.int64)
        return pa.table(
            {"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())}
        )

    def host_rows(t: pa.Table) -> pa.Table:
        hosts = np.unique(
            np.concatenate(
                [
                    t["src"].to_numpy(zero_copy_only=False).astype(object),
                    t["dst"].to_numpy(zero_copy_only=False).astype(object),
                ]
            )
        )
        return pa.table(
            {
                "id": pa.array(hash64(hosts).view(np.int64), pa.int64()),
                "host": pa.array(hosts.astype(str), pa.string()),
            }
        )

    from ray.data.aggregate import Count

    hosts = (
        edges.map_batches(host_rows, batch_format="pyarrow")
        .groupby(["id", "host"])
        .aggregate(Count(alias_name="_c"))
        .to_pandas()[["id", "host"]]
    )
    cc = connected_components(edges.map_batches(id_pairs, batch_format="pyarrow"))
    out = hosts.merge(cc, left_on="id", right_on="doc_id", how="left")
    # resolve component label = min host name per cluster; singletons
    # (self-loop-only or isolated hosts) label themselves
    lab = (
        out.dropna(subset=["cluster_id"])
        .groupby("cluster_id")["host"]
        .min()
        .to_dict()
    )
    out["component"] = [
        lab[c] if pd.notna(c) else h for c, h in zip(out["cluster_id"], out["host"])
    ]
    sizes = out.groupby("component")["host"].transform("size").astype("int64")
    out["component_size"] = sizes
    out = out[["host", "component", "component_size"]]
    return out.sort_values("host").reset_index(drop=True)


def host_components(sf_dir: str) -> pd.DataFrame:
    """Component table of the synthetic web's host graph (``sf_dir``
    unused, like pagerank_hosts). Pytest pins union-find equality on
    the tiny web plus planted island/self-loop graphs."""
    from blockspider_ray import gen

    pages_dir, _ = gen.ensure_fixture("tiny")
    return component_table(host_graph(pages_dir))


def kcore(edges: rd.Dataset, max_iters: int = 64, n_buckets: int = 16) -> pd.DataFrame:
    """k-core decomposition of the host graph: every host's CORE NUMBER
    (the largest k such that it survives in the subgraph where every
    node keeps >= k neighbors) — the classic web-graph density/spam
    signal (link farms are high-core; genuine long-tail sites are
    low-core). Computed with the h-index fixpoint (Lu et al. 2016,
    Nature Communications: coreness = the stationary point of
    repeatedly setting c(v) <- H({c(u) : u ~ v}), starting from
    degrees) — SYNCHRONOUS updates, so the result is deterministic and
    order-free, unlike peeling's tie-order ambiguity. Undirected:
    edges are mirrored; self-loops dropped; multi-edges collapse.
    Hosts with ONLY self-loop edges have no neighbors and hence no
    core number — they are omitted from the output (note the
    divergence from ``component_table``, which reports them as
    singleton components; both match their pinned references).

    Scale shape — the pagerank/FastSV loop discipline: per iteration
    ONE fused launch with two bucketed all-to-alls over fixed-width
    (node-hash, int) rows — (1) neighbor-state gather: state rows and
    edge rows co-locate by hash(src) bucket, every edge emits
    (dst, c(src)); (2) apply: messages and own state co-locate by
    hash(dst), each node's h-index is one lexsorted run-scan
    (min(c_desc, rank) maxed per run). Convergence is probed off the
    just-materialized state blocks (zero-cpu block sums), not a second
    executor launch. Iterations needed = the graph's coreness
    'degeneracy depth' (small for web graphs); ``max_iters`` bounds
    pathological chains. Output is node-bounded: (host, core)."""
    from ray.data.aggregate import Count

    from .common import sum_col_over_blocks

    assert n_buckets & (n_buckets - 1) == 0, (
        f"n_buckets must be a power of two, got {n_buckets}"
    )
    B = n_buckets

    def mirror_distinct(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(object)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(object)
        keep = s != d
        s, d = s[keep], d[keep]
        a = hash64(np.concatenate([s, d])).view(np.int64)
        b = hash64(np.concatenate([d, s])).view(np.int64)
        return pa.table(
            {"src": pa.array(a, pa.int64()), "dst": pa.array(b, pa.int64())}
        )

    und = (
        edges.map_batches(mirror_distinct, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="_c"))
        .select_columns(["src", "dst"])
        .repartition(min(B, 16))
        .materialize()
    )

    def host_rows(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(object)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(object)
        keep = s != d
        hosts = np.unique(np.concatenate([s[keep], d[keep]]))
        return pa.table(
            {
                "node": pa.array(hash64(hosts).view(np.int64), pa.int64()),
                "host": pa.array(hosts.astype(str), pa.string()),
            }
        )

    hosts = (
        edges.map_batches(host_rows, batch_format="pyarrow")
        .groupby(["node", "host"])
        .aggregate(Count(alias_name="_c"))
        .to_pandas()[["node", "host"]]
    )

    def deg_partial(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        g = (
            pa.table({"node": pa.array(src, pa.int64())})
            .group_by("node")
            .aggregate([([], "count_all")])
        )
        return rename_cols(g, {"count_all": "p_d"})

    def rename_cols(t: pa.Table, m: dict) -> pa.Table:
        return t.rename_columns([m.get(c, c) for c in t.column_names])

    from ray.data.aggregate import Sum

    state = (
        und.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("p_d", alias_name="c"))
        .map_batches(
            lambda t: t.append_column(
                "changed", pa.array(np.ones(t.num_rows, dtype=np.int64), pa.int64())
            ),
            batch_format="pyarrow",
        )
        .repartition(min(B, 16))
        .materialize()
    )

    def _b(x: np.ndarray) -> np.ndarray:
        return (x.view(np.uint64) % np.uint64(B)).view(np.int64)

    for _ in range(max_iters):
        if sum_col_over_blocks(state, "changed") == 0:
            break

        # ---- gather: (dst, c(src)) for every edge, co-located by src
        def tag_state_src(t: pa.Table) -> pa.Table:
            node = t["node"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "bucket": pa.array(_b(node), pa.int64()),
                    "key": t["node"],
                    "dst": pa.array(np.zeros(t.num_rows, dtype=np.int64), pa.int64()),
                    "c": t["c"],
                    "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                }
            )

        def tag_edge(t: pa.Table) -> pa.Table:
            src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "bucket": pa.array(_b(src), pa.int64()),
                    "key": t["src"],
                    "dst": t["dst"],
                    "c": pa.array(np.zeros(t.num_rows, dtype=np.int64), pa.int64()),
                    "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                }
            )

        _empty_msg = pd.DataFrame(
            {"node": pd.Series([], dtype="int64"), "c": pd.Series([], dtype="int64")}
        )

        def gather(g: pd.DataFrame) -> pd.DataFrame:
            side = g["side"].to_numpy()
            e = g[side == 1]
            if len(e) == 0:
                return _empty_msg
            auth = g[side == 0]
            m = e[["key", "dst"]].merge(auth[["key", "c"]], on="key", how="inner")
            if len(m) == 0:
                return _empty_msg
            return pd.DataFrame(
                {"node": m["dst"].to_numpy(dtype=np.int64), "c": m["c"].to_numpy(dtype=np.int64)}
            )

        msgs = (
            state.map_batches(tag_state_src, batch_format="pyarrow")
            .union(und.map_batches(tag_edge, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(gather, batch_format="pandas")
        )

        # ---- apply: per-node h-index of messages, new c = min(c, h)
        def tag_msg(t: pa.Table) -> pa.Table:
            node = t["node"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "bucket": pa.array(_b(node), pa.int64()),
                    "node": t["node"],
                    "c": t["c"],
                    "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                }
            )

        def tag_own(t: pa.Table) -> pa.Table:
            node = t["node"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "bucket": pa.array(_b(node), pa.int64()),
                    "node": t["node"],
                    "c": t["c"],
                    "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                }
            )

        def apply_h(g: pd.DataFrame) -> pd.DataFrame:
            side = g["side"].to_numpy()
            own = g[side == 0]
            node_o = own["node"].to_numpy(dtype=np.int64)
            c_o = own["c"].to_numpy(dtype=np.int64)
            msg = g[side == 1]
            if len(msg):
                n_m = msg["node"].to_numpy(dtype=np.int64)
                c_m = msg["c"].to_numpy(dtype=np.int64)
                order = np.lexsort((-c_m, n_m))
                n_s, c_s = n_m[order], c_m[order]
                first = np.concatenate(([True], n_s[1:] != n_s[:-1]))
                starts = np.flatnonzero(first)
                rank = np.arange(len(n_s), dtype=np.int64) - np.repeat(
                    starts, np.diff(np.append(starts, len(n_s)))
                )
                # h-index = max over the desc-sorted run of min(value, rank+1)
                h_run = np.minimum(c_s, rank + 1)
                h = np.maximum.reduceat(h_run, starts)
                hmap_n, hmap_h = n_s[starts], h
                pos = np.searchsorted(hmap_n, node_o)
                pos = np.minimum(pos, len(hmap_n) - 1) if len(hmap_n) else pos
                have = len(hmap_n) > 0
                hit = (hmap_n[pos] == node_o) if have else np.zeros(len(node_o), bool)
                new_c = np.where(hit, np.minimum(c_o, hmap_h[pos] if have else c_o), c_o)
            else:
                new_c = c_o
            return pd.DataFrame(
                {
                    "node": node_o,
                    "c": new_c,
                    "changed": (new_c != c_o).astype(np.int64),
                }
            )

        state = (
            state.map_batches(tag_own, batch_format="pyarrow")
            .union(msgs.map_batches(tag_msg, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(apply_h, batch_format="pandas")
            .repartition(min(B, 16))
            .materialize()
        )

    final = state.select_columns(["node", "c"]).to_pandas()
    out = hosts.merge(final, on="node", how="inner")
    out = out[["host", "c"]].rename(columns={"c": "core"})
    out["core"] = out["core"].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


def host_kcore(sf_dir: str) -> pd.DataFrame:
    """Core numbers of the synthetic web's host graph (``sf_dir``
    unused, like pagerank_hosts). Pytest pins exact equality vs a
    sequential peeling reference plus planted K5/path/tailed-clique
    fixtures — no SQL oracle (iterative graph closure)."""
    from blockspider_ray import gen

    pages_dir, _ = gen.ensure_fixture("tiny")
    return kcore(host_graph(pages_dir))
