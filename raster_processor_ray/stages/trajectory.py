"""Trajectory analytics: per-key geodesic track statistics (SURVEY.md §2
extension — the reference's along-track geometry, geoloc_raster.py
cross/along-track frames, generalized to arbitrary keyed point streams).

Bucketed-kernel contract (sessionize/temporal): shuffle key is
``hash(key) % B``; inside a bucket ONE sort by (key, ts, tie) orders
every track, consecutive-pair geodesics evaluate vectorized across all
keys at once (`haversine_m` over shifted arrays with key-boundary
masking), and per-track sums are one hash groupby.  Track length sums
are rounded (trig libm results may differ in final ulps across
engines; segment-level absolute drift is ~1e-9 m, far below the mm
rounding).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..geo.crs import haversine_m
from ..util import pin_for_shuffle


def track_stats(ds, key: str, ts_col: str, lat_col: str, lon_col: str, *,
                tie_col: str | None = None, num_buckets: int = 64,
                round_decimals: int = 3, leg_scale: float | None = None):
    """-> (key, n_points, track_m) for every key with >= 2 points:
    point count and total great-circle path length over the
    (ts, tie_col)-ordered track.

    ``leg_scale``: quantize each LEG to ``floor(leg * leg_scale)`` int64
    BEFORE summation and emit integer ``track_q`` instead of float
    ``track_m``. Float leg sums are order-sensitive in the last ulp, so
    any engine (this one, or a threaded SQL oracle) that combines legs
    in a different order can flip a rounding boundary; integer leg sums
    are order-free exact. Use e.g. ``leg_scale=1e3`` for millimeters."""
    from ..aggregate.relational import _key_bucket

    sort_cols = [key, ts_col] + ([tie_col] if tie_col else [])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_bucket"] = _key_bucket(df, [key], num_buckets)
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_bucket"]).sort_values(
            sort_cols, kind="mergesort").reset_index(drop=True)
        n = len(df)
        out_val = "track_q" if leg_scale is not None else "track_m"
        out_dtype = np.int64 if leg_scale is not None else np.float64
        if n == 0:
            return pd.DataFrame({key: pd.Series(dtype=df[key].dtype),
                                 "n_points": pd.Series(dtype=np.int64),
                                 out_val: pd.Series(dtype=out_dtype)})
        k = df[key].to_numpy()
        lat = df[lat_col].to_numpy(dtype=np.float64)
        lon = df[lon_col].to_numpy(dtype=np.float64)
        same = np.zeros(n, dtype=bool)
        same[1:] = k[1:] == k[:-1]
        seg = np.zeros(n)
        seg[1:] = haversine_m(lat[:-1], lon[:-1], lat[1:], lon[1:])
        seg[~same] = 0.0
        if leg_scale is not None:
            seg = np.floor(seg * leg_scale)     # int-valued; order-free sum
        out = pd.DataFrame({key: k, "seg": seg,
                            "is_seg": same.astype(np.int64)})
        g = out.groupby(key, as_index=False).agg(
            n_seg=("is_seg", "sum"), track_m=("seg", "sum"))
        g = g[g["n_seg"] >= 1]
        val = (g["track_m"].to_numpy(dtype=np.int64) if leg_scale is not None
               else np.round(g["track_m"].to_numpy(), round_decimals))
        return pd.DataFrame({
            key: g[key].to_numpy(),
            "n_points": (g["n_seg"] + 1).to_numpy(dtype=np.int64),
            out_val: val})

    return (pin_for_shuffle(ds.map_batches(add_bucket, batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def _dp_keep_mask(x: np.ndarray, y: np.ndarray, eps: float) -> np.ndarray:
    """Douglas-Peucker keep mask for ONE polyline in planar coords
    (iterative stack, no recursion); endpoints always kept. The
    segment-distance evaluation inside each split is vectorized; the
    stack depth is O(log n) typical / O(n) worst."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        dx, dy = x[b] - x[a], y[b] - y[a]
        seg = np.hypot(dx, dy)
        px = x[a + 1:b]
        py = y[a + 1:b]
        if seg == 0.0:
            d = np.hypot(px - x[a], py - y[a])
        else:
            d = np.abs(dx * (py - y[a]) - dy * (px - x[a])) / seg
        i = int(np.argmax(d))
        if d[i] > eps:
            m = a + 1 + i
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return keep


def track_simplify(ds, key: str, ts_col: str, lat_col: str, lon_col: str, *,
                   eps_deg: float, tie_col: str | None = None,
                   num_buckets: int = 64):
    """Per-key Douglas-Peucker polyline simplification -> the kept
    points (key, ts[, tie], lat, lon) in track order.

    Tolerance is in degrees on the plate-carree plane (the geotag's
    native space); the per-track refinement loop is sequential BY THE
    ALGORITHM (each split depends on the previous), so the scale story
    is cross-track parallelism: tracks hash into buckets, every split's
    distance scan is vectorized, and a track's cost is O(n log n)
    typical in its own length only.
    """
    from ..aggregate.relational import _key_bucket

    sort_cols = [key, ts_col] + ([tie_col] if tie_col else [])
    out_cols = sort_cols + [lat_col, lon_col]

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_bucket"] = _key_bucket(df, [key], num_buckets)
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_bucket"]).sort_values(
            sort_cols, kind="mergesort").reset_index(drop=True)
        n = len(df)
        if n == 0:
            return df[out_cols]
        k = df[key].to_numpy()
        lat = df[lat_col].to_numpy(dtype=np.float64)
        lon = df[lon_col].to_numpy(dtype=np.float64)
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], n]
        keep = np.zeros(n, dtype=bool)
        for a, b in zip(starts, ends):
            keep[a:b] = _dp_keep_mask(lon[a:b], lat[a:b], eps_deg)
        return df.loc[keep, out_cols].reset_index(drop=True)

    return (pin_for_shuffle(ds.map_batches(add_bucket, batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas"))
