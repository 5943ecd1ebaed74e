"""Trajectory stats (stages/trajectory.py): ordered-pair geodesic sums
vs brute force; single-point keys excluded; partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raster_processor_ray.geo.crs import haversine_m
from raster_processor_ray.stages.trajectory import track_stats


@pytest.fixture()
def pts(ray_session):
    rng = np.random.default_rng(6)
    n = 500
    df = pd.DataFrame({
        "k": rng.integers(0, 20, n),
        "ts": rng.permutation(n).astype(np.int64),
        "tie": np.arange(n, dtype=np.int64),
        "lat": rng.uniform(-80, 80, n),
        "lon": rng.uniform(-170, 170, n),
    })
    # key 99: single point -> must be excluded
    df.loc[0, "k"] = 99
    df = df[~((df.k == 99) & (df.index > 0))]
    return df, rd.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(6)


def test_track_stats_matches_bruteforce(pts):
    df, ds = pts
    out = track_stats(ds, "k", "ts", "lat", "lon", tie_col="tie",
                      num_buckets=4).to_pandas().set_index("k")
    assert 99 not in out.index
    for k, sub in df.groupby("k"):
        if len(sub) < 2:
            continue
        sub = sub.sort_values(["ts", "tie"])
        d = haversine_m(sub.lat.to_numpy()[:-1], sub.lon.to_numpy()[:-1],
                        sub.lat.to_numpy()[1:], sub.lon.to_numpy()[1:])
        assert out.loc[k, "n_points"] == len(sub)
        assert out.loc[k, "track_m"] == round(float(d.sum()), 3)


def test_track_stats_partition_invariant(pts):
    df, _ = pts
    a = track_stats(rd.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(2), "k", "ts", "lat", "lon",
        tie_col="tie", num_buckets=3).to_pandas()
    b = track_stats(rd.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(13), "k", "ts", "lat", "lon",
        tie_col="tie", num_buckets=8).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("k", ignore_index=True),
        b.sort_values("k", ignore_index=True))


def _dp_ref(x, y, eps):
    """Independent recursive Douglas-Peucker reference."""
    n = len(x)
    if n <= 2:
        return list(range(n))
    dx, dy = x[-1] - x[0], y[-1] - y[0]
    seg = np.hypot(dx, dy)
    if seg == 0.0:
        d = np.hypot(x[1:-1] - x[0], y[1:-1] - y[0])
    else:
        d = np.abs(dx * (y[1:-1] - y[0]) - dy * (x[1:-1] - x[0])) / seg
    i = int(np.argmax(d))
    if d[i] <= eps:
        return [0, n - 1]
    m = i + 1
    left = _dp_ref(x[:m + 1], y[:m + 1], eps)
    right = _dp_ref(x[m:], y[m:], eps)
    return left[:-1] + [m + r for r in right]


def test_track_simplify_matches_reference(pts):
    from raster_processor_ray.stages.trajectory import track_simplify
    df, ds = pts
    eps = 5.0
    out = track_simplify(ds, "k", "ts", "lat", "lon", eps_deg=eps,
                         tie_col="tie", num_buckets=4).to_pandas()
    for k, sub in df.groupby("k"):
        sub = sub.sort_values(["ts", "tie"]).reset_index(drop=True)
        idx = _dp_ref(sub.lon.to_numpy(), sub.lat.to_numpy(), eps)
        got = out[out.k == k].sort_values(["ts", "tie"])
        ref = sub.iloc[sorted(idx)]
        np.testing.assert_array_equal(got.tie.to_numpy(),
                                      ref.tie.to_numpy())
    # simplification actually drops points at this tolerance
    assert len(out) < len(df)
