"""kNN join: each point gets its k nearest sites by great-circle distance.

Analog of the reference's T2 stateful geolocation stage (taylor
height-constrained geolocation holds nadir-trajectory arrays per worker and
solves per point-chunk, geoloc_raster.py:90-194): here the per-worker state
is the *site index*, built ONCE per actor in ``__init__`` from a
``ray.put`` broadcast — never per batch.

Query path: brute force — unit-vector matmul over SITE CHUNKS with a
running top-k merge (exact, memory-bounded, right for site tables up to
~10^5; beyond that, shard the site table and union the per-shard top-k,
or pre-filter sites by coarse cell before the matmul).

Ordering: by descending dot product (monotone with ascending great-circle
distance); ties break deterministically by ascending ``site_id``
(FIXTURES.md F4 tie rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.cells import latlon_to_xyz

EARTH_R = 6371008.8


def _topk_rows(vals: np.ndarray, k: int) -> np.ndarray:
    """Row-wise top-k column indices by descending value.

    For small k this is a repeated-argmax loop: np.argpartition with a
    small kth on wide rows hits an introselect pathology (measured 18s
    for kth=0 on 65k x 2048 where argmax takes 0.13s)."""
    n, s = vals.shape
    k = min(k, s)
    if k == 1:
        return vals.argmax(axis=1)[:, None]  # no copy, no mutation
    if k <= 16:
        v = vals.copy()
        rows = np.arange(n)
        out = np.empty((n, k), dtype=np.int64)
        for j in range(k):
            am = v.argmax(axis=1)
            out[:, j] = am
            if j + 1 < k:
                v[rows, am] = -np.inf
        return out
    return np.argpartition(-vals, k - 1, axis=1)[:, :k]


class KnnIndex:
    """Site table -> packed unit vectors, sorted by site_id (tie-break)."""

    def __init__(self, site_ids: np.ndarray, lats: np.ndarray, lons: np.ndarray):
        order = np.argsort(site_ids, kind="stable")
        self.site_ids = np.asarray(site_ids, dtype=np.int64)[order]
        self.lats = np.asarray(lats, dtype=np.float64)[order]
        self.lons = np.asarray(lons, dtype=np.float64)[order]
        x, y, z = latlon_to_xyz(self.lats, self.lons)
        self.xyz = np.stack([x, y, z], axis=1)  # (S, 3)

    def query(self, lat: np.ndarray, lon: np.ndarray, k: int,
              site_chunk: int = 256):
        """Top-k sites per point. Returns (site_idx (N,k), dot (N,k)).

        The (N x S) dot matrix is computed in SITE CHUNKS with a running
        top-k merge: memory stays O(N x chunk) regardless of site count
        (a full 65k-row x 1k-site float64 matrix is 0.5 GiB per batch —
        measured to thrash the node when an actor pool runs many batches
        concurrently)."""
        px, py, pz = latlon_to_xyz(lat, lon)
        p = np.stack([px, py, pz], axis=1)          # (N, 3)
        n = len(p)
        s = self.xyz.shape[0]
        k = min(k, s)
        if s == 0 or k == 0:
            return (np.empty((n, 0), dtype=np.int64), np.empty((n, 0)))
        best_idx = None
        best_dot = None
        for c0 in range(0, s, site_chunk):
            chunk = self.xyz[c0:c0 + site_chunk]
            dots = p @ chunk.T                       # (N, chunk)
            cs = dots.shape[1]
            if k < cs:
                part = _topk_rows(dots, k)
            else:
                part = np.broadcast_to(np.arange(cs), (n, cs)).copy()
            pd_ = np.take_along_axis(dots, part, axis=1)
            part = part + c0
            if best_idx is None:
                best_idx, best_dot = part, pd_
            else:
                best_idx = np.concatenate([best_idx, part], axis=1)
                best_dot = np.concatenate([best_dot, pd_], axis=1)
                if best_idx.shape[1] > k:
                    sel = _topk_rows(best_dot, k)
                    best_idx = np.take_along_axis(best_idx, sel, axis=1)
                    best_dot = np.take_along_axis(best_dot, sel, axis=1)
        # final order within the k candidates: dot desc, site_id asc (ids
        # are the array order after the sorted-by-id constructor)
        ordk = np.lexsort((best_idx, -best_dot), axis=1)
        idx = np.take_along_axis(best_idx, ordk, axis=1)
        return idx[:, :k], np.take_along_axis(best_dot, ordk, axis=1)[:, :k]


class KnnJoin:
    """Actor-pool ``map_batches`` stage. Emits k output rows per input row:
    input columns + ``knn_rank`` (1-based), ``site_id``, ``dist_m``."""

    def __init__(self, index_ref, k: int = 3, lat_col: str = "lat",
                 lon_col: str = "lon"):
        import ray
        self.index: KnnIndex = (
            ray.get(index_ref) if not isinstance(index_ref, KnnIndex) else index_ref)
        self.k = k
        self.lat_col = lat_col
        self.lon_col = lon_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = np.asarray(batch[self.lat_col], dtype=np.float64)
        lon = np.asarray(batch[self.lon_col], dtype=np.float64)
        idx, dots = self.index.query(lat, lon, self.k)
        n, k = idx.shape
        take = np.repeat(np.arange(n, dtype=np.int64), k)
        out = batch.take(pa.array(take))
        out = out.append_column("knn_rank", pa.array(np.tile(np.arange(1, k + 1), n)))
        out = out.append_column("site_id", pa.array(self.index.site_ids[idx].ravel()))
        dist = EARTH_R * np.arccos(np.clip(dots, -1.0, 1.0))
        out = out.append_column("dist_m", pa.array(dist.ravel()))
        return out


def knn_join(ds, site_ids, lats, lons, k: int = 3, *, lat_col: str = "lat",
             lon_col: str = "lon", concurrency=2, batch_size: int = 8192):
    """Attach the broadcast kNN join to a Dataset."""
    import ray

    index_ref = ray.put(KnnIndex(np.asarray(site_ids), np.asarray(lats), np.asarray(lons)))
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size, num_cpus=0.5,
                  fn_constructor_args=(index_ref, k, lat_col, lon_col))
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(KnnJoin, **kwargs)


def knn_join_sharded(ds, site_ids, lats, lons, k: int = 3, *,
                     lat_col: str = "lat", lon_col: str = "lon",
                     point_id_col: str, shard_size: int = 50_000,
                     batch_size: int = 8192, num_buckets: int = 64):
    """kNN join for site tables TOO LARGE to broadcast whole.

    Sites are split into broadcastable shards; each shard's KnnIndex
    streams over the points emitting its local top-k (map-only, no
    shuffle per shard), and ONE bounded exchange per point id merges the
    per-shard candidates to the global top-k. Exact: the global k
    nearest are each nearest within their own shard. Cost is
    O(points x shards) matmul rows — the brute-force frontier; an IVF/
    cell-prefilter composition (``ann.ivf_build_index`` shape) is the
    sub-linear path when sites are spatially clusterable.

    Requires a unique ``point_id_col`` to merge candidates per point.
    Output: point columns + knn_rank / site_id / dist_m, k rows per point.
    """
    import pandas as pd
    import ray

    from ..util import pin_for_shuffle

    site_ids = np.asarray(site_ids)
    lats = np.asarray(lats)
    lons = np.asarray(lons)
    n_sites = len(site_ids)
    shard_refs = []
    for s0 in range(0, n_sites, shard_size):
        sl = slice(s0, min(s0 + shard_size, n_sites))
        shard_refs.append(ray.put(KnnIndex(site_ids[sl], lats[sl], lons[sl])))

    # stateless tasks with a per-process index cache, NOT actor pools:
    # one pool per shard would reserve shards x concurrency x num_cpus
    # CPUs up front and deadlock small sessions; tasks also fuse with
    # the upstream read
    _idx_cache: dict = {}

    def shard_fn(ref):
        def f(b: pa.Table) -> pa.Table:
            import ray

            idx = _idx_cache.get(ref)
            if idx is None:
                idx = ray.get(ref)
                _idx_cache.clear()
                _idx_cache[ref] = idx
            return KnnJoin(idx, k, lat_col, lon_col)(b)
        return f

    out = None
    for ref in shard_refs:
        part = ds.map_batches(shard_fn(ref), batch_format="pyarrow",
                              batch_size=batch_size)
        out = part if out is None else out.union(part)

    def add_bucket(b):
        import pyarrow as _pa

        pid = np.asarray(b[point_id_col]).astype(np.int64)
        return b.append_column("_bucket", _pa.array(pid % num_buckets))

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_bucket"])
        df = df.sort_values([point_id_col, "dist_m", "site_id"],
                            kind="mergesort")
        top = df.groupby(point_id_col, as_index=False, sort=False).head(k)
        top = top.copy()
        top["knn_rank"] = top.groupby(point_id_col).cumcount() + 1
        return top

    return (pin_for_shuffle(out.map_batches(add_bucket, batch_format="pyarrow"))
            .groupby("_bucket")
            .map_groups(merge_topk, batch_format="pandas"))
