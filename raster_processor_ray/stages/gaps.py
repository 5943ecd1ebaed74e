"""Data-gap and inner-swath cell flags burned into the raster.

The reference's ``flag_missing_karin_data`` / ``flag_inner_swath``
(raster_proc.py:741-1023): sensor-line records are split into
EXTANT-DATA segments on time gaps larger than a threshold, each segment
becomes a swath coverage polygon (track positions offset +-cross-track
extent), and raster cells whose centers fall outside every extant
polygon are flagged MISSING_DATA; cells within the inner-swath distance
of the nadir track are flagged INNER_SWATH (suspect).

Ray-Data composition (no dense mapping loops):

1. segment the (tiny, broadcastable) track by time gap — the sessionize
   kernel's split rule applied driver-side to the track table;
2. build one swath polygon per segment with the spherical terminal-point
   offset (geo/crs.py) — reusing the PIP machinery (stages/pip.py) for
   the containment test;
3. flag cells per batch inside ``map_batches``: polygon containment for
   MISSING_DATA, nearest-track distance (broadcast KnnIndex, k=1) for
   INNER_SWATH; qual escalates exactly like the reference
   (missing -> DEGRADED, inner swath -> SUSPECT).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import actor_pool_size

from .. import config as C
from ..geo import crs
from ..geo.cells import GridSpec
from .pip import PolygonIndex, PolygonSpec

QUAL_BIT_MISSING_DATA = 1 << 12
QUAL_BIT_INNER_SWATH = 1 << 13


def track_segments(ts: np.ndarray, gap_thresh: float) -> np.ndarray:
    """Segment id per (sorted-by-ts) track record: splits where the time
    jump exceeds ``gap_thresh`` (the reference's ``_group_by_diff``)."""
    ts = np.asarray(ts, dtype=np.float64)
    if len(ts) == 0:
        return np.zeros(0, dtype=np.int64)
    return np.concatenate([[0], np.cumsum(
        np.abs(np.diff(ts)) > gap_thresh)]).astype(np.int64)


def swath_polygons_from_track(lat: np.ndarray, lon: np.ndarray,
                              ts: np.ndarray, *, gap_thresh: float,
                              cross_track_m: float) -> list[PolygonSpec]:
    """One swath polygon per extant-data segment: the track offset
    perpendicular-left concatenated with the reversed perpendicular-right
    offsets (the strip the sensor actually covered). Single-point
    segments are skipped (no along-track direction)."""
    order = np.argsort(np.asarray(ts, dtype=np.float64), kind="stable")
    lat = np.asarray(lat, dtype=np.float64)[order]
    lon = np.asarray(lon, dtype=np.float64)[order]
    ts_s = np.asarray(ts, dtype=np.float64)[order]
    seg = track_segments(ts_s, gap_thresh)
    polys: list[PolygonSpec] = []
    for s in np.unique(seg):
        m = seg == s
        if m.sum() < 2:
            continue
        la, lo = lat[m], lon[m]
        # along-track bearing per point (forward difference, last repeats)
        brg = crs.bearing(la[:-1], lo[:-1], la[1:], lo[1:])
        brg = np.concatenate([brg, brg[-1:]])
        llat, llon = crs.terminal_point_spherical(la, lo, brg - 90.0,
                                                  cross_track_m)
        rlat, rlon = crs.terminal_point_spherical(la, lo, brg + 90.0,
                                                  cross_track_m)
        ring = np.concatenate([
            np.stack([llon, llat], axis=1),
            np.stack([rlon, rlat], axis=1)[::-1],
        ])
        polys.append(PolygonSpec(int(s), f"segment_{int(s)}", ring))
    return polys


def flag_gap_cells(cells_ds, grid: GridSpec, track_lat: np.ndarray,
                   track_lon: np.ndarray, track_ts: np.ndarray, *,
                   gap_thresh: float, cross_track_m: float,
                   inner_swath_m: float | None = None):
    """Finalized cells -> cells with MISSING_DATA / INNER_SWATH flags
    burned into ``qual_bitwise`` / ``qual`` (the reference's
    flag_missing_karin_data + flag_inner_swath composition).

    The track is broadcast ONCE (``ray.put``); each batch tests its cell
    centers against the extant polygons and, when ``inner_swath_m`` is
    set, against the nearest-track-point distance.
    """
    import ray

    from .knn import EARTH_R, KnnIndex

    polys = swath_polygons_from_track(track_lat, track_lon, track_ts,
                                      gap_thresh=gap_thresh,
                                      cross_track_m=cross_track_m)
    pidx_ref = ray.put(PolygonIndex(polys) if polys else None)
    knn_ref = ray.put(KnnIndex(np.arange(len(track_lat), dtype=np.int64),
                               track_lat, track_lon))

    class FlagCells:
        def __init__(self):
            self.pidx = ray.get(pidx_ref)
            self.knn: KnnIndex = ray.get(knn_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            iy = np.asarray(b["iy"]).astype(np.int64)
            ix = np.asarray(b["ix"]).astype(np.int64)
            lat = grid.y_min + iy * grid.res
            lon = grid.x_min + ix * grid.res
            covered = (self.pidx.contains_any(lat, lon)
                       if self.pidx is not None
                       else np.zeros(len(lat), dtype=bool))
            bits = np.asarray(b["qual_bitwise"]).astype(np.int64)
            qual = np.asarray(b["qual"]).astype(np.int64)
            bits = np.where(~covered, bits | QUAL_BIT_MISSING_DATA, bits)
            qual = np.where(~covered, np.maximum(qual, C.QUAL_DEGRADED), qual)
            if inner_swath_m is not None:
                _, dots = self.knn.query(lat, lon, 1)
                dist = EARTH_R * np.arccos(np.clip(dots[:, 0], -1.0, 1.0))
                inner = dist < inner_swath_m
                bits = np.where(inner, bits | QUAL_BIT_INNER_SWATH, bits)
                qual = np.where(inner, np.maximum(qual, C.QUAL_SUSPECT), qual)
            out = b.drop_columns(["qual", "qual_bitwise"])
            out = out.append_column("qual", pa.array(qual))
            return out.append_column("qual_bitwise", pa.array(bits))

    return cells_ds.map_batches(FlagCells, batch_format="pyarrow",
                                concurrency=actor_pool_size(0.5), num_cpus=0.5)
