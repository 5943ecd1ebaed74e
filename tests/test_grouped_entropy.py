"""grouped_entropy (aggregate/stats.py) vs a direct numpy computation,
including the single-category (-0.0 fold) and n=1 edges."""

import numpy as np
import pandas as pd
import ray

from raster_processor_ray.aggregate.stats import grouped_entropy


def _direct(df, key, cat):
    rows = []
    for k, sub in df.groupby(key):
        c = sub.groupby(cat).size().to_numpy(dtype=np.float64)
        n = c.sum()
        h = np.round(np.log(n) - (c * np.log(c)).sum() / n, 6) + 0.0
        rows.append((k, int(n), len(c), h))
    return pd.DataFrame(rows, columns=[key, "n_rows", "n_cats", "entropy"])


def test_grouped_entropy_vs_direct():
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c", "d"], size=2000),
        "cat": rng.choice(list("xyzuvw"), size=2000,
                          p=[0.4, 0.3, 0.15, 0.1, 0.04, 0.01])})
    got = (grouped_entropy(ray.data.from_pandas(df).repartition(7),
                           "g", "cat").to_pandas()
           .sort_values("g").reset_index(drop=True))
    want = _direct(df, "g", "cat").sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_grouped_entropy_edges():
    df = pd.DataFrame({
        "g": ["mono"] * 50 + ["single"] + ["two"] * 10,
        "cat": ["only"] * 50 + ["x"] + ["a", "b"] * 5})
    got = (grouped_entropy(ray.data.from_pandas(df), "g", "cat").to_pandas()
           .set_index("g"))
    # one category -> H = 0 with POSITIVE zero sign (the -0.0 fold)
    assert got.loc["mono", "entropy"] == 0.0
    assert np.signbit(got.loc["mono", "entropy"]) == False  # noqa: E712
    assert got.loc["single", "entropy"] == 0.0
    assert got.loc["single", "n_rows"] == 1
    # uniform two-category -> ln 2
    assert got.loc["two", "entropy"] == np.round(np.log(2.0), 6)
    assert got.loc["two", "n_cats"] == 2
