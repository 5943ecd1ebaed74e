"""Distributed k-means (Lloyd) over an embedding column — the
clustering step of training-data curation (cluster-balanced sampling,
semantic dedup, domain discovery), run as k streamed dataset passes.

Per iteration (the canonical Ray Data iterative shape):

- centroids are broadcast ONCE (``ray.put``; workers read them from the
  object store, they are never re-shipped per batch);
- one ``map_batches`` pass assigns each vector to its nearest centroid
  (one (B × k) matmul per batch) and emits ONE fixed-size partial blob
  per batch (k*d sums + k counts), never the vectors;
- the blobs TREE-FOLD in remote add tasks (fanin groups, the dsir
  pattern) so the driver touches O(fanin) blobs per level — not a
  frame of k × num_batches partial rows — then updates centroids.

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


def _make_assign(cents_ref, vec_col: str, id_col: str):
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
        return pa.table({
            id_col: b[id_col],
            "cluster": pa.array(a),
        })

    return assign_partial


def kmeans_fit(ds, k: int, *, iters: int = 5, vec_col: str = "embedding",
               id_col: str = "vec_id", batch_size: int = 4096,
               tree_fanin: int = 16):
    """-> (centroids (k, d) float64, counts (k,) int64). Empty clusters
    keep their previous centroid.

    Per iteration, each batch emits ONE fixed-size blob (k*d sums + k
    counts packed as float64 bytes) and the blobs TREE-FOLD in remote
    tasks (the dsir pattern, stages/dsir.py) — the driver touches
    O(fanin) blobs per fold level, never a frame of k x num_batches
    partial rows."""
    import ray

    cents = _seed_centroids(ds, k, vec_col, id_col)
    dim = cents.shape[1]
    counts = np.zeros(k, dtype=np.int64)
    blob_len = k * dim + k

    @ray.remote
    def add_blobs(*blobs):
        acc = np.zeros(blob_len, dtype=np.float64)
        for blob in blobs:
            acc += np.frombuffer(blob, dtype=np.float64)
        return acc.tobytes()

    for _ in range(iters):
        ref = ray.put(cents)

        def fold(b: pa.Table) -> pa.Table:
            cs = np.asarray(ray.get(ref), dtype=np.float64)
            m = _as_matrix(b[vec_col]).astype(np.float64)
            a = assign_nearest(m, cs)
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, a, m)
            cnt = np.bincount(a, minlength=k).astype(np.float64)
            blob = np.concatenate([sums.ravel(), cnt])
            return pa.table({"_partial": pa.array([blob.tobytes()],
                                                  type=pa.binary())})

        parts = [p["_partial"] for p in ds.map_batches(
            fold, batch_format="pyarrow", batch_size=batch_size).take_all()]
        while len(parts) > tree_fanin:
            parts = ray.get([add_blobs.remote(*parts[i:i + tree_fanin])
                             for i in range(0, len(parts), tree_fanin)])
        acc = np.zeros(blob_len, dtype=np.float64)
        for blob in parts:
            acc += np.frombuffer(blob, dtype=np.float64)
        sums = acc[:k * dim].reshape(k, dim)
        counts = acc[k * dim:].astype(np.int64)
        nz = counts > 0
        cents = cents.copy()
        cents[nz] = sums[nz] / counts[nz, None]
    return cents, counts


def kmeans_assign(ds, centroids: np.ndarray, *, vec_col: str = "embedding",
                  id_col: str = "vec_id", batch_size: int = 4096):
    """Label pass: (id_col, cluster) for every vector."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))
    return ds.map_batches(
        _make_assign(ref, vec_col, id_col),
        batch_format="pyarrow", batch_size=batch_size)
