"""SemDeDup-style semantic deduplication over an embedding column:
k-means clusters the corpus, then near-duplicates are pruned WITHIN each
cluster by pairwise cosine similarity (public algorithm: Abbas et al.
2023, "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication"; reference analog: none — the reference has no
embedding ops).

Scale shape:
- clustering is the engine's streamed k-means (stages/kmeans.py):
  centroids broadcast once per iteration, zero exchanges;
- the ONE exchange here is the groupby(cluster): each vector moves to
  its cluster's task exactly once — the minimum possible movement for
  within-cluster pairwise math. k is caller-chosen, so per-group size
  is corpus/k on average; a ``max_cluster_size`` guard bounds the
  worst case (oversized clusters are pruned in priority-ordered chunks
  of that size — a documented approximation, same spirit as the
  MinHash star-collapse in stages/dedup.py);
- inside a cluster the O(n^2) cosine test runs as blocked matmuls
  (block x seen-so-far), so peak memory is block_size x n floats, not
  n x n.

Pruning rule (the paper's): order points by cosine similarity to their
cluster centroid — ``keep="far"`` keeps the LOW-similarity extreme of
each duplicate group (the paper's best variant), ``keep="near"`` the
opposite — and mark a point duplicate iff its cosine similarity to any
EARLIER-ordered point exceeds ``tau``. Ties order by id, so the result
is deterministic at any partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .ann import _as_matrix, _normalize


def _prune_ordered(x: np.ndarray, tau: float, block: int = 1024) -> np.ndarray:
    """x: (n, d) L2-normalized rows in keep-priority order. Returns a
    bool keep-mask: row i is dropped iff max_{j<i} cos(i, j) > tau.
    Blocked upper-triangular scan — O(n^2 / block) matmul calls, peak
    scratch block x n."""
    n = len(x)
    dup = np.zeros(n, dtype=bool)
    for s in range(0, n, block):
        e = min(s + block, n)
        xb = x[s:e]
        if s > 0:
            dup[s:e] |= (xb @ x[:s].T).max(axis=1) > tau
        inner = xb @ xb.T
        iu = np.triu_indices(e - s, k=1)
        hit = np.zeros(e - s, dtype=bool)
        np.logical_or.at(hit, iu[1], inner[iu] > tau)
        dup[s:e] |= hit
    return ~dup


def semdedup(ds, *, k: int = 64, tau: float = 0.9, iters: int = 5,
             vec_col: str = "embedding", id_col: str = "vec_id",
             keep: str = "far", max_cluster_size: int = 4096,
             batch_size: int = 4096):
    """-> Dataset of (id_col, cluster) — the surviving (kept) rows."""
    import ray

    from .kmeans import assign_nearest, kmeans_fit

    try:
        cents, _ = kmeans_fit(ds, k, iters=iters, vec_col=vec_col,
                              id_col=id_col, batch_size=batch_size)
    except ValueError:  # empty corpus -> empty survivor set, same schema
        import ray.data as rd
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64())}))
    cents_n = _normalize(cents.astype(np.float64))
    cents_ref = ray.put(cents_n)

    def label_with_vec(b: pa.Table) -> pa.Table:
        """Assignment pass that keeps the (normalized) vector alongside
        the label — the groupby ships each vector to its cluster once.
        Stateless task fn over the broadcast centroid ref (local
        object-store read per task; see kmeans._make_assign)."""
        c = np.asarray(ray.get(cents_ref), dtype=np.float64)
        m = _normalize(_as_matrix(b[vec_col]).astype(np.float64))
        a = assign_nearest(m, c)
        csim = np.einsum("ij,ij->i", m, c[a])
        return pa.table({
            id_col: b[id_col],
            "cluster": pa.array(a),
            "_csim": pa.array(csim),
            "_nvec": pa.array(list(m.astype(np.float32))),
        })

    labeled = ds.map_batches(label_with_vec, batch_format="pyarrow",
                             batch_size=batch_size)

    asc = keep == "far"  # low centroid-similarity first -> kept first

    def prune_cluster(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_csim", id_col], kind="mergesort",
                            ascending=[asc, True])
        ids = df[id_col].to_numpy()
        x = np.stack(df._nvec.to_numpy()).astype(np.float64)
        keep_mask = np.zeros(len(df), dtype=bool)
        for s in range(0, len(df), max_cluster_size):
            e = min(s + max_cluster_size, len(df))
            keep_mask[s:e] = _prune_ordered(x[s:e], tau)
        out = pd.DataFrame({id_col: ids[keep_mask],
                            "cluster": df.cluster.to_numpy()[keep_mask]})
        return out

    from ..util import pin_for_shuffle

    return (pin_for_shuffle(labeled).groupby("cluster")
            .map_groups(prune_cluster, batch_format="pandas"))
