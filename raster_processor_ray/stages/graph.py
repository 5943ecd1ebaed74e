"""Link-graph analytics over a web-page corpus: degree stats, PageRank,
triangle counting (SURVEY.md §2 extension family — graph ops a crawl
corpus needs that the raster reference has no analog for; nearest
reference shape is the per-cell neighborhood aggregation of
raster_proc.py:520-700, generalized from grid cells to graph nodes).

Edge synthesis
--------------
Web pages in the driver testdata carry no outlinks, so edges are derived
deterministically from ``doc_id`` with SQL-expressible integer
arithmetic (the ``geotag_from_int`` convention, geo/hashing.py): doc
``i`` emits ``1 + (i*7919) % 7`` edges, edge ``j`` targeting
``(i*1103515245 + (j+1)*2654435761 + 97) % n_nodes``, self-loops
dropped.  The identical formula runs in DuckDB for the oracle check.
Out-degree is known LOCALLY inside the emit kernel (all of a doc's edges
materialize from its own row), so per-edge contribution weights ``w =
1/out_deg`` ship with the edges — no degree join, no extra shuffle.

PageRank (BSP, 2 bounded exchanges per iteration)
-------------------------------------------------
Rank state is a ``(node, pr)`` dataset (one row per node — the frontier,
never the edge set).  Each iteration:

1. co-group ranks with the STATIC pre-bucketed edge dataset on
   ``bucket(src)`` (one union + groupby exchange); the per-bucket kernel
   merges rank onto edges and pre-aggregates contributions by ``dst``
   (map-side combiner — output is bounded by distinct dsts per bucket,
   not edge count);
2. aggregate partials by ``bucket(dst)`` (second exchange), seeded with
   a static zero row per node so teleport-only nodes stay in the result.

The edge dataset is materialized ONCE (tagged + bucketed); iterations
re-ship but never recompute it.  On a real cluster the next step up is
an actor pool holding edge buckets resident (rank deltas alone cross the
wire) — documented, not needed at bench scale.  Buckets are plain
``id % B``: ids are dense and uniform by construction; use
``splitmix64`` bucketing for adversarial id spaces.

Triangles (id-oriented wedge join)
----------------------------------
Undirected distinct edges oriented low->high id; wedges generated per
lower endpoint inside bucket groups (bounded: out-neighborhoods under id
orientation are ~average degree for this graph; degree-ordered
orientation is the standard skew hardening for power-law graphs and
slots into the same kernel), then one hash join against the edge set
counts closures.  Each triangle (a<b<c) is counted exactly once: wedge
(b,c) centered at its minimum vertex a, closed by edge (b,c).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import pin_for_shuffle

# SQL-expressible edge-synthesis constants (mirrored in oracle SQL).
EDGE_A = 1103515245
EDGE_B = 2654435761
EDGE_C = 97
DEG_P = 7919
MAX_OUT = 7


def edges_sql(n_nodes_sql: str) -> str:
    """DuckDB SQL fragment producing the identical directed edge multiset
    (columns src, dst) from the ``documents`` view."""
    return f"""
      SELECT src, dst FROM (
        SELECT d.doc_id AS src,
               (d.doc_id * {EDGE_A} + (j.j + 1) * {EDGE_B} + {EDGE_C})
                 % ({n_nodes_sql}) AS dst
        FROM documents d, (SELECT range AS j FROM range({MAX_OUT})) j
        WHERE j.j < 1 + (d.doc_id * {DEG_P}) % {MAX_OUT}
      ) WHERE dst <> src
    """


def _emit_edges(ids: np.ndarray, n_nodes: int):
    """Vectorized edge fan-out for one batch of doc ids.

    Returns (src, dst, w) where w = 1/out_deg(src) with self-loops
    excluded from both the edge list and the degree.
    """
    i = ids.astype(np.int64)
    d = 1 + (i * DEG_P) % MAX_OUT
    src = np.repeat(i, d)
    doc_idx = np.repeat(np.arange(len(i)), d)
    # j in [0, d(i)) per emitted edge
    js = np.arange(len(src)) - np.repeat(np.cumsum(d) - d, d)
    dst = (src * EDGE_A + (js + 1) * EDGE_B + EDGE_C) % n_nodes
    keep = dst != src
    od = d - np.bincount(doc_idx[~keep], minlength=len(i))
    w = 1.0 / od[doc_idx[keep]]
    return src[keep], dst[keep], w


def synth_edges(docs, n_nodes: int, *, with_weight: bool = False):
    """documents -> directed edge dataset (src, dst[, w]).  Pure map —
    no shuffle; edges for a doc derive from its own row."""

    def emit(b: pa.Table) -> pa.Table:
        src, dst, w = _emit_edges(np.asarray(b["doc_id"]), n_nodes)
        cols = {"src": src, "dst": dst}
        if with_weight:
            cols["w"] = w
        return pa.table(cols)

    return docs.map_batches(emit, batch_format="pyarrow")


def in_degree_hist(docs, n_nodes: int, *, num_buckets: int = 32) -> pd.DataFrame:
    """In-degree histogram (in_deg, n_nodes) INCLUDING the zero bin.

    Two bounded aggregates (by dst, then by degree value); the zero bin
    is closed arithmetically (n_nodes - covered) on the tiny histogram —
    bounded by max in-degree, not node count.
    """
    from ..aggregate.relational import hash_aggregate

    edges = synth_edges(docs, n_nodes)
    per_node = hash_aggregate(edges, "dst", {"in_deg": (None, "count")},
                              num_buckets=num_buckets)
    hist = hash_aggregate(per_node, "in_deg", {"n_nodes": (None, "count")},
                          num_buckets=num_buckets).to_pandas()
    if hist.empty:   # fully empty aggregates surface with no columns
        hist = pd.DataFrame({"in_deg": pd.Series(dtype=np.int64),
                             "n_nodes": pd.Series(dtype=np.int64)})
    zero = n_nodes - int(hist["n_nodes"].sum())
    if zero > 0:
        hist = pd.concat(
            [hist, pd.DataFrame({"in_deg": [0], "n_nodes": [zero]})],
            ignore_index=True)
    hist = hist.sort_values("in_deg", ignore_index=True)
    return hist.astype({"in_deg": np.int64, "n_nodes": np.int64})


def pagerank(docs, n_nodes: int, *, iters: int = 5, damping: float = 0.85,
             num_buckets: int = 32, round_decimals: int | None = 9,
             teleport_weights=None):
    """Iterative PageRank; returns a (node, pr) dataset covering ALL
    nodes.  No dangling-mass redistribution (every synthetic node has
    out-degree >= 1 almost surely; the oracle applies the identical
    rule).  ``round_decimals`` is applied once at the end so the
    order-sensitive last float bits of the big sums never reach the
    comparison (queries.py determinism rules).

    ``teleport_weights``: optional vectorized ``ids -> float64 weights``
    for PERSONALIZED PageRank — teleport mass (1-d) distributes
    proportionally to the weights and the rank vector initializes to
    the normalized weights.  Per-node teleports ride the zero-seed rows
    (one extra float column through the existing exchange, no new
    shuffle).  Integer-valued weights keep the normalizer W an exact
    float64 sum at any partitioning; ``None`` = uniform (classic).
    """
    if n_nodes <= 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "pr": pa.array([], pa.float64())}))

    if teleport_weights is None:
        w_total = float(n_nodes)
        weights_of = (lambda ids: np.ones(len(ids)))
    else:
        weights_of = teleport_weights
        parts = docs.map_batches(
            lambda b: pa.table({"s": np.array(
                [weights_of(np.asarray(b["doc_id"],
                                       dtype=np.int64)).sum()])}),
            batch_format="pyarrow")
        w_total = float(parts.sum("s"))
        if w_total <= 0:
            raise ValueError("teleport_weights sum to zero")

    def tag_edges(b: pa.Table) -> pa.Table:
        src, dst, w = _emit_edges(np.asarray(b["doc_id"]), n_nodes)
        n = len(src)
        return pa.table({
            "node": src, "dst": dst, "w": w,
            "pr": pa.nulls(n, type=pa.float64()),
            "_b": src % num_buckets,
            "_side": np.ones(n, dtype=np.int8),
        })

    edges_tagged = docs.map_batches(tag_edges,
                                    batch_format="pyarrow").materialize()

    def zero_seed(b: pa.Table) -> pa.Table:
        node = np.asarray(b["doc_id"], dtype=np.int64)
        return pa.table({"dst": node,
                         "contrib": np.zeros(len(node)),
                         "tp": (1.0 - damping) * weights_of(node) / w_total,
                         "_b2": node % num_buckets})

    zeros = docs.map_batches(zero_seed, batch_format="pyarrow").materialize()

    def init_ranks(b: pa.Table) -> pa.Table:
        node = np.asarray(b["doc_id"], dtype=np.int64)
        return pa.table({"node": node,
                         "pr": weights_of(node) / w_total})

    ranks = docs.map_batches(init_ranks, batch_format="pyarrow").materialize()

    def tag_ranks(b: pa.Table) -> pa.Table:
        node = np.asarray(b["node"], dtype=np.int64)
        n = len(node)
        return pa.table({
            "node": node,
            "dst": pa.nulls(n, type=pa.int64()),
            "w": pa.nulls(n, type=pa.float64()),
            "pr": np.asarray(b["pr"], dtype=np.float64),
            "_b": node % num_buckets,
            "_side": np.zeros(n, dtype=np.int8),
        })

    def bucket_contribs(df: pd.DataFrame) -> pa.Table:
        r = df[df["_side"] == 0][["node", "pr"]]
        e = df[df["_side"] == 1][["node", "dst", "w"]]
        m = e.merge(r, on="node", how="inner")
        out = pd.DataFrame({"dst": m["dst"].astype(np.int64),
                            "contrib": m["w"].to_numpy() * m["pr"].to_numpy()})
        # map-side combiner: one partial row per distinct dst per bucket
        out = out.groupby("dst", as_index=False)["contrib"].sum()
        # arrow out: the union partner (zero seed) is an arrow dataset
        return pa.table({"dst": out["dst"].to_numpy(dtype=np.int64),
                         "contrib": out["contrib"].to_numpy(),
                         "tp": np.zeros(len(out)),
                         "_b2": out["dst"].to_numpy(dtype=np.int64)
                         % num_buckets})

    def finalize(df: pd.DataFrame) -> pa.Table:
        s = df.groupby("dst", as_index=False).agg(
            contrib=("contrib", "sum"), tp=("tp", "sum"))
        return pa.table({"node": s["dst"].to_numpy(dtype=np.int64),
                         "pr": s["tp"].to_numpy()
                         + damping * s["contrib"].to_numpy()})

    for _ in range(iters):
        both = ranks.map_batches(tag_ranks,
                                 batch_format="pyarrow").union(edges_tagged)
        partials = pin_for_shuffle(
            both.groupby("_b").map_groups(bucket_contribs,
                                          batch_format="pandas")).union(zeros)
        ranks = pin_for_shuffle(partials).groupby("_b2").map_groups(
            finalize, batch_format="pandas").materialize()

    if round_decimals is not None:
        def rnd(b: pa.Table) -> pa.Table:
            return pa.table({
                "node": b["node"],
                "pr": np.round(np.asarray(b["pr"]), round_decimals)})
        ranks = ranks.map_batches(rnd, batch_format="pyarrow")
    return ranks


def triangle_stats(docs, n_nodes: int, *, num_buckets: int = 32) -> pd.DataFrame:
    """Global (n_edges, n_wedges, n_triangles) over the undirected
    distinct edge set.  n_wedges counts min-centered wedges (both edges
    oriented out of the triple's smallest vertex) — the orientation that
    counts each triangle exactly once when closed."""
    from ..aggregate.relational import hash_aggregate, hash_join

    edges = synth_edges(docs, n_nodes)

    def orient(b: pa.Table) -> pa.Table:
        s = np.asarray(b["src"], dtype=np.int64)
        d = np.asarray(b["dst"], dtype=np.int64)
        return pa.table({"a": np.minimum(s, d), "b": np.maximum(s, d)})

    und = hash_aggregate(edges.map_batches(orient, batch_format="pyarrow"),
                         ["a", "b"], {"cnt": (None, "count")},
                         num_buckets=num_buckets).drop_columns(["cnt"])
    und = pin_for_shuffle(und)
    n_edges = und.count()

    def add_bucket(b: pa.Table) -> pa.Table:
        a = np.asarray(b["a"], dtype=np.int64)
        return b.append_column("_b", pa.array(a % num_buckets))

    def wedge_kernel(df: pd.DataFrame) -> pd.DataFrame:
        # all (a, *) rows for any a in this bucket are here; self-merge
        # on a emits ordered neighbor pairs (x < y by id orientation)
        e = df[["a", "b"]]
        m = e.merge(e, on="a")
        m = m[m["b_x"] < m["b_y"]]
        return pd.DataFrame({"a": m["b_x"].to_numpy(),
                             "b": m["b_y"].to_numpy()})

    wedges = (und.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("_b").map_groups(wedge_kernel, batch_format="pandas"))
    wedges = pin_for_shuffle(wedges)
    n_wedges = wedges.count()
    closed = hash_join(wedges, und.map_batches(
        lambda b: b.append_column("_hit", pa.array(
            np.ones(b.num_rows, dtype=np.int8))), batch_format="pyarrow"),
        ["a", "b"], how="inner", num_buckets=num_buckets)
    n_tri = closed.count()
    return pd.DataFrame({"n_edges": [np.int64(n_edges)],
                         "n_wedges": [np.int64(n_wedges)],
                         "n_triangles": [np.int64(n_tri)]})


def bfs_hops(docs, n_nodes: int, seed_pred, *, max_hops: int = 3,
             num_buckets: int = 32):
    """Multi-source BFS hop distance over the synthetic link graph:
    every node reachable from the seed set within ``max_hops`` gets its
    MINIMUM hop count (seeds are hop 0). The trust-propagation /
    crawl-frontier primitive; the SQL mirror is a bounded recursive CTE
    with min(hops).

    Distributed shape (textbook frontier BFS): each iteration expands
    the CURRENT frontier only — edge fan-out is a pure map (edges
    derive arithmetically from the node id, stages/graph.py:80), the
    candidate set dedups in one bucketed exchange, and an ANTI join
    against the visited set keeps first-reached nodes only, so a node's
    edges are expanded exactly once across the whole run. Per-iteration
    cost is O(frontier x out_deg), never O(V); iterations are bounded
    by ``max_hops``. Frontier/visited pin between rounds (the sets are
    node ids only).
    """
    from ..aggregate.relational import hash_join
    from .dedup import exact_dedup

    def seed_map(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"]).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids[seed_pred(ids)])})

    def add_hops(h: int):
        def f(b: pa.Table) -> pa.Table:
            return b.append_column(
                "hops", pa.array(np.full(b.num_rows, h, dtype=np.int64)))
        return f

    def expand(b: pa.Table) -> pa.Table:
        _, dst, _ = _emit_edges(np.asarray(b["doc_id"]), n_nodes)
        return pa.table({"doc_id": pa.array(np.unique(dst))})

    frontier = pin_for_shuffle(docs.map_batches(seed_map,
                                                batch_format="pyarrow"))
    visited = frontier
    levels = [frontier.map_batches(add_hops(0), batch_format="pyarrow")]
    for h in range(1, max_hops + 1):
        cand = exact_dedup(frontier.map_batches(expand,
                                                batch_format="pyarrow"),
                           "doc_id", num_buckets=num_buckets)
        new = pin_for_shuffle(hash_join(cand, visited, "doc_id",
                                        how="anti",
                                        num_buckets=num_buckets))
        if new.count() == 0:
            break
        levels.append(new.map_batches(add_hops(h), batch_format="pyarrow"))
        frontier = new
        visited = pin_for_shuffle(visited.union(new))
    res = levels[0]
    for lv in levels[1:]:
        res = res.union(lv)
    return res
