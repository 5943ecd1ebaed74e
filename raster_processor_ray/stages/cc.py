"""Distributed connected components over an edge list (SURVEY.md §2 dedup
family — the missing END of the near-dup story: pairs -> components ->
one canonical survivor per component).

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce and
Beyond", SoCC 2014 — public algorithm). Each half-round is ONE bounded
hash shuffle of the edge list: map-side bucket tag by hash(center node)
-> ``groupby(_bucket)`` -> a fully vectorized per-bucket star kernel
(lexsort + segment mins via first-of-segment, ``np.repeat`` fan-out).
No joins, no driver-side graph, no per-node Python: the driver loop
holds only per-round (count, hashsum) scalars for the fixpoint check.

Scale shape (the reason to prefer star-contraction over plain min-label
propagation): label propagation needs O(diameter) rounds EACH requiring
an edges-with-labels join; star rounds need no join, strictly shrink the
edge set toward one (child, root) star edge per non-root node, and
converge in O(log^2 n) rounds worst case — 2-4 observed on dedup graphs
(near-dup components are mostly cliques/stars plus short chains). Hot
roots concentrate rows in one group at the very END, when each row is
just 16 bytes of (child, root); the pre-convergence rounds that carry
real volume group by ORIGINAL node ids, which are uniform.

Reference parity note: the reference has no CC operator; its dedup is
file-level keep-first. This operator exists for the web-scale dedup
pipelines (MinHash/SimHash candidate pairs must be collapsed into
clusters before survivors can be chosen — transitivity matters: A~B,
B~C puts A,C in one cluster even when A!~C directly).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.hashing import splitmix64
from ..util import pin_for_shuffle


def _bucket_of(x: np.ndarray, num_buckets: int) -> np.ndarray:
    return (splitmix64(x.astype(np.uint64)) % np.uint64(num_buckets)).astype(
        np.int64)


def _dedup_sorted(u: np.ndarray, v: np.ndarray):
    """Lexsort by (u, v) and drop duplicate pairs. Returns sorted arrays."""
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    if len(u):
        keep = np.empty(len(u), dtype=bool)
        keep[0] = True
        np.logical_or(u[1:] != u[:-1], v[1:] != v[:-1], out=keep[1:])
        u, v = u[keep], v[keep]
    return u, v


def _star_kernel(df: pd.DataFrame, large: bool) -> pd.DataFrame:
    """One star half-round over one bucket's edges (all (u, *) rows for
    any u in the bucket are HERE — bucketing is by u — so the per-group
    dedup below is a global dedup of this round's input).

    large-star: for each node u over the SYMMETRIZED edge list, with
    m = min(N(u) + {u}): emit (w, m) for every neighbor w > u.
    small-star: edges oriented (u=hi, v=lo); m = min(N(u)) (all v < u):
    emit (u, m) and (w, m) for every neighbor w != m.
    """
    u = df["u"].to_numpy(dtype=np.int64, copy=False)
    v = df["v"].to_numpy(dtype=np.int64, copy=False)
    u, v = _dedup_sorted(u, v)
    if not len(u):
        return pd.DataFrame({"u": u, "v": v})
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    counts = np.diff(np.r_[starts, len(u)])
    vmin = v[starts]                       # v ascending within each u
    if large:
        m = np.minimum(u[starts], vmin)
        m_rep = np.repeat(m, counts)
        mask = v > u
        out_u, out_v = v[mask], m_rep[mask]
    else:
        m = vmin                           # oriented: every v < u
        m_rep = np.repeat(m, counts)
        mask = v != m_rep
        out_u = np.concatenate([v[mask], u[starts]])
        out_v = np.concatenate([m_rep[mask], m])
    return pd.DataFrame({"u": out_u, "v": out_v})


def _prep_arrays(eu: np.ndarray, ev: np.ndarray, large: bool):
    """Self-loop drop + symmetrize (large) / hi->lo orient (small)."""
    keep = eu != ev
    eu, ev = eu[keep], ev[keep]
    if large:
        return np.concatenate([eu, ev]), np.concatenate([ev, eu])
    return np.maximum(eu, ev), np.minimum(eu, ev)


def _local_cc(eu: np.ndarray, ev: np.ndarray, max_iters: int):
    """Single-process star-contraction fixpoint over numpy arrays — the
    tail-collapse path once the (strictly shrinking) edge set fits in one
    worker. Same kernels as the distributed rounds, no shuffles.
    Returns fixpoint (child, root) arrays."""
    prev = None
    for _ in range(max_iters):
        for large in (True, False):
            u, v = _prep_arrays(eu, ev, large)
            out = _star_kernel(pd.DataFrame({"u": u, "v": v}), large)
            eu = out["u"].to_numpy(dtype=np.int64, copy=False)
            ev = out["v"].to_numpy(dtype=np.int64, copy=False)
        cur_u, cur_v = _dedup_sorted(eu, ev)
        with np.errstate(over="ignore"):
            cur = (len(cur_u), int(np.uint64(
                splitmix64(splitmix64(cur_u.astype(np.uint64))
                           ^ cur_v.astype(np.uint64)).sum(dtype=np.uint64))))
        if cur == prev or cur[0] == 0:
            return cur_u, cur_v
        prev = cur
        eu, ev = cur_u, cur_v
    raise RuntimeError(
        f"connected_components (local tail): no fixpoint after "
        f"{max_iters} rounds")


def _star_round(edges, large: bool, num_buckets: int):
    """edges(u, v) -> one star half-round -> edges(u, v)."""

    def prep(b: pa.Table) -> pa.Table:
        eu = np.asarray(b["u"]).astype(np.int64)
        ev = np.asarray(b["v"]).astype(np.int64)
        keep = eu != ev
        eu, ev = eu[keep], ev[keep]
        if large:      # symmetrize: every node sees its full neighborhood
            eu, ev = np.concatenate([eu, ev]), np.concatenate([ev, eu])
        else:          # orient hi -> lo
            eu, ev = np.maximum(eu, ev), np.minimum(eu, ev)
        return pa.table({
            "u": pa.array(eu), "v": pa.array(ev),
            "_bucket": pa.array(_bucket_of(eu, num_buckets))})

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        return _star_kernel(df, large)

    tagged = pin_for_shuffle(edges.map_batches(prep, batch_format="pyarrow"))
    return tagged.groupby("_bucket").map_groups(kernel, batch_format="pandas")


def _edge_stats(edges) -> tuple[int, int]:
    """(row count, wraparound hashsum) of an edge multiset — the fixpoint
    check. Deterministic given the same deduped input set, so equal stats
    across consecutive small-star rounds mean the edge set is stable."""

    def h(b: pa.Table) -> pa.Table:
        eu = np.asarray(b["u"]).astype(np.uint64)
        ev = np.asarray(b["v"]).astype(np.uint64)
        with np.errstate(over="ignore"):
            hv = splitmix64(splitmix64(eu) ^ ev)
            s = np.uint64(hv.sum(dtype=np.uint64))
        return pa.table({"n": pa.array([b.num_rows], type=pa.int64()),
                         "h": pa.array([int(s)], type=pa.uint64())})

    parts = edges.map_batches(h, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    hs = 0
    for p in parts:
        hs = (hs + int(p["h"])) % (1 << 64)
    return n, hs


def connected_components(edges, *, u_col: str = "u", v_col: str = "v",
                         num_buckets: int = 64, max_iters: int = 30,
                         single_task_threshold: int = 2_000_000):
    """Edge list dataset -> (node, comp) dataset, comp = the component's
    minimum node id. Every node that appears in any edge gets a row
    (isolated nodes never enter an edge list — callers default them to
    comp = their own id, see ``attach_components``).

    Hybrid execution: distributed star rounds run only while the edge
    set exceeds ``single_task_threshold``; at or below it the remaining
    contraction runs as ONE task-local numpy fixpoint (``_local_cc``) —
    the edge set strictly shrinks toward one (child, root) pair per
    non-root node, so at 100-TB scale the first shuffle rounds do the
    volume and the tail always collapses to the local path instead of
    paying per-round shuffle latency on a tiny remainder. Set the
    threshold to 0 to force every round distributed (tests do).

    The per-round materialize is the edge set only (bounded by the input
    edge count and strictly shrinking after the first rounds), never the
    node payloads.
    """
    def to_uv(b: pa.Table) -> pa.Table:
        return pa.table({"u": b[u_col], "v": b[v_col]})

    # materialize ONCE up front: the input may be a lazy join chain, and
    # both the row-count probe and the first star round need it
    edges = pin_for_shuffle(edges.map_batches(to_uv, batch_format="pyarrow"))

    def local_tail(b: pa.Table) -> pa.Table:
        eu = np.asarray(b["u"]).astype(np.int64)
        ev = np.asarray(b["v"]).astype(np.int64)
        su, sv = _local_cc(eu, ev, max_iters)
        roots = np.unique(sv) if len(sv) else sv
        return pa.table({
            "node": pa.array(np.concatenate([su, roots])),
            "comp": pa.array(np.concatenate([sv, roots]))})

    prev = None
    n = edges.count()
    for _ in range(max_iters):
        if n <= single_task_threshold:
            return edges.repartition(1).map_batches(
                local_tail, batch_format="pyarrow", batch_size=None)
        edges = _star_round(edges, large=True, num_buckets=num_buckets)
        edges = pin_for_shuffle(
            _star_round(edges, large=False, num_buckets=num_buckets))
        cur = _edge_stats(edges)
        if cur == prev or cur[0] == 0:
            break
        prev = cur
        n = cur[0]
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iters} rounds")

    # fixpoint edges are (child, root) stars: children labeled by root,
    # each root labels itself (deduped per bucket — roots repeat once per
    # child)
    def labels(df: pd.DataFrame) -> pd.DataFrame:
        # the small-star OUTPUT may carry duplicate (child, root) rows
        # (emitted from several groups); bucketing by child puts all of a
        # child's rows here, so this drop is a global dedup
        ch = df.loc[df["_is_root"] == 0, ["u", "v"]].drop_duplicates()
        roots = df.loc[df["_is_root"] == 1, "u"].unique()
        return pd.concat([
            ch.rename(columns={"u": "node", "v": "comp"}),
            pd.DataFrame({"node": roots, "comp": roots}),
        ], ignore_index=True)

    def tag(b: pa.Table) -> pa.Table:
        eu = np.asarray(b["u"]).astype(np.int64)
        ev = np.asarray(b["v"]).astype(np.int64)
        au = np.concatenate([eu, ev])
        av = np.concatenate([ev, ev])
        flag = np.concatenate([np.zeros(len(eu), dtype=np.int8),
                               np.ones(len(ev), dtype=np.int8)])
        return pa.table({"u": pa.array(au), "v": pa.array(av),
                         "_is_root": pa.array(flag),
                         "_bucket": pa.array(_bucket_of(au, num_buckets))})

    tagged = edges.map_batches(tag, batch_format="pyarrow")
    return (pin_for_shuffle(tagged).groupby("_bucket")
            .map_groups(labels, batch_format="pandas"))


def attach_components(ds, comp_labels, *, id_col: str, num_buckets: int = 32):
    """Left-join component labels onto a dataset; nodes absent from the
    edge list (never paired with anything) become their own component.

    Id-domain note: unmatched rows make the joined ``comp`` column
    nullable, and the pandas reducer inside the join represents nullable
    int64 as float64 — exact only for ids < 2^53. Sequential document
    ids are fine up to ~9e15 (10^12-doc scale included); for full-width
    64-bit HASH ids, join on the hash but carry labels for a narrow
    surrogate id instead."""
    from ..aggregate.relational import hash_join

    def lab_cols(b: pa.Table) -> pa.Table:
        return pa.table({id_col: b["node"], "comp": b["comp"]})

    lab = comp_labels.map_batches(lab_cols, batch_format="pyarrow")
    if lab.materialize().schema() is None:   # no edges at all: every node
        def own(b: pa.Table) -> pa.Table:    # is its own component
            return b.append_column("comp", b[id_col].cast(pa.int64()))
        return ds.map_batches(own, batch_format="pyarrow")
    joined = hash_join(ds, lab, on=id_col, how="left",
                       num_buckets=num_buckets)

    def fill(b: pa.Table) -> pa.Table:
        comp = b["comp"].to_pandas().to_numpy(dtype=np.float64,
                                              na_value=np.nan)
        ids = np.asarray(b[id_col]).astype(np.float64)
        comp = np.where(np.isnan(comp), ids, comp).astype(np.int64)
        idx = b.column_names.index("comp")
        return b.set_column(idx, "comp", pa.array(comp))

    return joined.map_batches(fill, batch_format="pyarrow")


def component_survivors(ds, comp_labels, *, id_col: str,
                        num_buckets: int = 32):
    """Keep-one-per-component dedup: the row whose id IS the component
    minimum survives (deterministic, no extra shuffle beyond the label
    join — min-id-wins is the policy the component labels already encode)."""
    labeled = attach_components(ds, comp_labels, id_col=id_col,
                                num_buckets=num_buckets)
    import pyarrow.compute as pc

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["comp"], b[id_col]))

    return labeled.map_batches(keep, batch_format="pyarrow")
