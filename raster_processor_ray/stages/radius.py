"""Spatial radius (distance θ-) join: points within R meters of any site.

Reference analog: the geolocation stages look up every pixel against
nearby reference state (geoloc_raster.py's per-point raster lookup is a
"within one cell" association); generalized here to the classic
distance-threshold spatial join a tiling engine needs alongside kNN
(stages/knn.py) and point-in-polygon (stages/pip.py).

Semantics: emit one output row per (point, site) pair with
great-circle distance(point, site) <= radius_m, long form with
``site_id`` and ``dist_m`` appended. The predicate is evaluated on the
central-angle COSINE (``dot >= cos(radius_m / EARTH_R)``) — pure
sin/cos/multiply, bit-reproducible against the DuckDB oracle built from
the same formula (the arccos-based distance is only computed for
OUTPUT, rounded by the caller), matching the q_knn_top3 convention.

Scale shape: sites are broadcast ONCE (``ray.put``) and every batch does
one (batch x sites) matrix product of 3-D unit vectors — the same
broadcast-small-side regime as KnnIndex (stages/knn.py:52). Output is
bounded by the true pair count (each batch emits only matching pairs).
For site tables too big to broadcast (>~10^5), compose the
KnnGridIndex cell prefilter (stages/knn.py:107): bucket sites by coarse
cell, probe only cells intersecting the spherical cap of radius R
around each point batch — same partitioning assumption as
knn_join_bucketed. The matrix path below is exact and is the oracle'd
baseline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

EARTH_R = 6371008.8  # mean radius, meters (matches geo/crs.py, stages/knn.py)


def _unit_vectors(lat_deg: np.ndarray, lon_deg: np.ndarray) -> np.ndarray:
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    cl = np.cos(lat)
    return np.stack([cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)], axis=1)


class RadiusJoin:
    """Actor-pool stage: broadcast site index built once per actor."""

    def __init__(self, sites_ref, radius_m: float, lat_col: str = "lat",
                 lon_col: str = "lon"):
        site_ids, slat, slon = ray.get(sites_ref)
        self.site_ids = np.asarray(site_ids, dtype=np.int64)
        self.svec = _unit_vectors(slat, slon)          # (m, 3), built once
        self.min_dot = float(np.cos(radius_m / EARTH_R))
        self.lat_col, self.lon_col = lat_col, lon_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = np.asarray(batch[self.lat_col], dtype=np.float64)
        lon = np.asarray(batch[self.lon_col], dtype=np.float64)
        if len(lat) == 0:
            out = batch.take(pa.array([], type=pa.int64()))
            out = out.append_column("site_id", pa.array([], type=pa.int64()))
            return out.append_column("dist_m", pa.array([], type=pa.float64()))
        dots = _unit_vectors(lat, lon) @ self.svec.T   # (n, m)
        rows, cols = np.nonzero(dots >= self.min_dot)
        out = batch.take(pa.array(rows))
        out = out.append_column("site_id", pa.array(self.site_ids[cols]))
        dist = EARTH_R * np.arccos(np.clip(dots[rows, cols], -1.0, 1.0))
        return out.append_column("dist_m", pa.array(dist))


def radius_join(ds, site_ids, lats, lons, radius_m: float, *,
                lat_col: str = "lat", lon_col: str = "lon",
                concurrency: int = 4):
    """points -> long-form (point rows, site_id, dist_m) within radius."""
    sites_ref = ray.put((np.asarray(site_ids, dtype=np.int64),
                         np.asarray(lats, dtype=np.float64),
                         np.asarray(lons, dtype=np.float64)))
    return ds.map_batches(
        RadiusJoin, batch_format="pyarrow",
        fn_constructor_args=(sites_ref, radius_m, lat_col, lon_col),
        concurrency=concurrency)
