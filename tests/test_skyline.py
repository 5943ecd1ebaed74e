"""grouped_skyline_2d (aggregate/relational.py) vs brute-force strict
dominance, incl. tie handling and partition invariance."""

import numpy as np
import pandas as pd
import ray

from raster_processor_ray.aggregate.relational import grouped_skyline_2d


def _brute(df):
    rows = []
    for g, sub in df.groupby("g"):
        pts = set(zip(sub["x"], sub["y"]))
        for (x, y) in pts:
            dominated = any(
                qx <= x and qy >= y and (qx < x or qy > y)
                for (qx, qy) in pts)
            if not dominated:
                rows.append((g, x, y))
    return (pd.DataFrame(rows, columns=["g", "x", "y"])
            .sort_values(["g", "x", "y"]).reset_index(drop=True))


def test_skyline_vs_brute():
    rng = np.random.default_rng(21)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=500),
        "x": rng.integers(0, 40, size=500).astype(np.int64),
        "y": rng.integers(0, 40, size=500).astype(np.int64)})
    got = (grouped_skyline_2d(ray.data.from_pandas(df).repartition(6),
                              "g", "x", "y").to_pandas()
           .sort_values(["g", "x", "y"]).reset_index(drop=True))
    want = _brute(df)
    pd.testing.assert_frame_equal(got[["g", "x", "y"]], want,
                                  check_dtype=False)


def test_skyline_duplicates_and_ties():
    # duplicate points collapse to one; same-x keeps only the max-y;
    # same-y at higher x is dominated (strict dominance)
    df = pd.DataFrame({
        "g": ["a"] * 6,
        "x": np.int64([1, 1, 1, 2, 3, 3]),
        "y": np.int64([5, 5, 7, 7, 7, 9])})
    got = (grouped_skyline_2d(ray.data.from_pandas(df), "g", "x", "y")
           .to_pandas().sort_values(["x", "y"]).reset_index(drop=True))
    assert list(zip(got["x"], got["y"])) == [(1, 7), (3, 9)]


def test_skyline_partition_invariance():
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": rng.choice(["u", "v"], size=300),
        "x": rng.integers(0, 1000, size=300).astype(np.int64),
        "y": rng.integers(0, 1000, size=300).astype(np.int64)})
    outs = []
    for parts in (1, 3, 11):
        outs.append(grouped_skyline_2d(
            ray.data.from_pandas(df).repartition(parts), "g", "x", "y"
        ).to_pandas().sort_values(["g", "x", "y"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])
