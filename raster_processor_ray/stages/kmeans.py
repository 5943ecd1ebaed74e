"""Distributed k-means (Lloyd) over an embedding column — the
clustering step of training-data curation (cluster-balanced sampling,
semantic dedup, domain discovery), run as k streamed dataset passes.

Per iteration (the canonical Ray Data iterative shape):

- centroids are broadcast ONCE (``ray.put``; workers read them from the
  object store, they are never re-shipped per batch);
- one ``map_batches`` pass assigns each vector to its nearest centroid
  (one (B × k) matmul per batch) and emits PARTIAL per-centroid sums —
  k rows per batch (cluster id, sum vector, count), never the vectors;
- the driver folds the k × blocks partial rows (bounded by cluster
  count, not data) and updates centroids.

The corpus is scanned ``iters`` times and exchanged zero times.
Initialization is deterministic: the k vectors with the smallest
``id_col`` values (a bounded top-k, partition-invariant), so results
are reproducible at any cluster size. Ties in assignment go to the
lowest cluster id (argmin semantics).

Reference analog: none (the reference has no clustering); public
algorithm (Lloyd 1982). Float caveat: partial sums are float64 and
their combine order follows block order, so centroid bits can differ
across partitionings by ~1 ulp; with non-degenerate clusters the
ASSIGNMENT is stable (pinned by tests/test_round3_extensions.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .ann import _as_matrix


def _seed_centroids(ds, k: int, vec_col: str, id_col: str) -> np.ndarray:
    from ..aggregate.relational import topk

    seeds = topk(ds, id_col, k, descending=False).to_pandas()
    if seeds.empty:
        raise ValueError("kmeans_fit: input dataset has no rows")
    seeds = seeds.sort_values(id_col).head(k)
    return np.stack(seeds[vec_col].to_numpy()).astype(np.float64)


def assign_nearest(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmin ||x-c||^2 = argmin (||c||^2 - 2 x.c); ties -> lowest id."""
    sq = (cents * cents).sum(axis=1)
    d = sq[None, :] - 2.0 * (m @ cents.T)
    return d.argmin(axis=1).astype(np.int64)


def _make_assign(cents_ref, vec_col: str, id_col: str, emit_labels: bool):
    """STATELESS assignment pass over a broadcast centroid ref. A plain
    task fn (not an actor pool): the only state is the ray.put centroids,
    which ``ray.get`` resolves from the LOCAL object store per task
    (zero-copy, never re-shipped), and tasks reuse warm worker processes
    — an actor pool here would pay a fresh process spawn + numpy/pyarrow
    import per pool per iteration for no state that needs keeping."""

    def assign_partial(b: pa.Table) -> pa.Table:
        import ray
        cents = np.asarray(ray.get(cents_ref), dtype=np.float64)
        m = _as_matrix(b[vec_col]).astype(np.float64)
        a = assign_nearest(m, cents)
        if emit_labels:
            return pa.table({
                id_col: b[id_col],
                "cluster": pa.array(a),
            })
        k, dim = cents.shape
        onehot_sums = np.zeros((k, dim), dtype=np.float64)
        np.add.at(onehot_sums, a, m)
        counts = np.bincount(a, minlength=k).astype(np.int64)
        return pa.table({
            "cluster": pa.array(np.arange(k, dtype=np.int64)),
            "vsum": pa.array(list(onehot_sums)),
            "n": pa.array(counts),
        })

    return assign_partial


def kmeans_fit(ds, k: int, *, iters: int = 5, vec_col: str = "embedding",
               id_col: str = "vec_id", batch_size: int = 4096):
    """-> (centroids (k, d) float64, counts (k,) int64). Empty clusters
    keep their previous centroid."""
    import ray

    cents = _seed_centroids(ds, k, vec_col, id_col)
    counts = np.zeros(k, dtype=np.int64)
    for _ in range(iters):
        ref = ray.put(cents)
        partials = ds.map_batches(
            _make_assign(ref, vec_col, id_col, False),
            batch_format="pyarrow", batch_size=batch_size).to_pandas()
        g = partials.groupby("cluster", sort=True)
        counts = g.n.sum().reindex(range(k), fill_value=0).to_numpy()
        sums = np.zeros_like(cents)
        for c, sub in g:
            sums[c] = np.sum(np.stack(sub.vsum.to_numpy()), axis=0)
        nz = counts > 0
        cents[nz] = sums[nz] / counts[nz, None]
    return cents, counts


def kmeans_assign(ds, centroids: np.ndarray, *, vec_col: str = "embedding",
                  id_col: str = "vec_id", batch_size: int = 4096):
    """Label pass: (id_col, cluster) for every vector."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))
    return ds.map_batches(
        _make_assign(ref, vec_col, id_col, True),
        batch_format="pyarrow", batch_size=batch_size)
