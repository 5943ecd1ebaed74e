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
