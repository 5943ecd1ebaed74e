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
                round_decimals: int = 3):
    """-> (key, n_points, track_m) for every key with >= 2 points:
    point count and total great-circle path length over the
    (ts, tie_col)-ordered track."""
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
        if n == 0:
            return pd.DataFrame({key: pd.Series(dtype=df[key].dtype),
                                 "n_points": pd.Series(dtype=np.int64),
                                 "track_m": pd.Series(dtype=np.float64)})
        k = df[key].to_numpy()
        lat = df[lat_col].to_numpy(dtype=np.float64)
        lon = df[lon_col].to_numpy(dtype=np.float64)
        same = np.zeros(n, dtype=bool)
        same[1:] = k[1:] == k[:-1]
        seg = np.zeros(n)
        seg[1:] = haversine_m(lat[:-1], lon[:-1], lat[1:], lon[1:])
        seg[~same] = 0.0
        out = pd.DataFrame({key: k, "seg": seg,
                            "is_seg": same.astype(np.int64)})
        g = out.groupby(key, as_index=False).agg(
            n_seg=("is_seg", "sum"), track_m=("seg", "sum"))
        g = g[g["n_seg"] >= 1]
        return pd.DataFrame({
            key: g[key].to_numpy(),
            "n_points": (g["n_seg"] + 1).to_numpy(dtype=np.int64),
            "track_m": np.round(g["track_m"].to_numpy(), round_decimals)})

    return (pin_for_shuffle(ds.map_batches(add_bucket, batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas"))
