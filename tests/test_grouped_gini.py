"""grouped_gini (aggregate/stats.py) vs direct numpy, with the even and
fully-concentrated extremes."""

import numpy as np
import pandas as pd
import ray

from raster_processor_ray.aggregate.stats import grouped_gini


def _direct_gini(counts):
    c = np.sort(np.asarray(counts, dtype=np.int64))
    n, s = len(c), c.sum()
    i = np.arange(1, n + 1, dtype=np.int64)
    return np.round(float(((2 * i - n - 1) * c).sum()) / (float(n) * float(s)), 6)


def test_grouped_gini_vs_direct():
    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=3000),
        "cat": rng.choice(list("pqrstu"), size=3000,
                          p=[0.5, 0.25, 0.12, 0.08, 0.04, 0.01])})
    got = (grouped_gini(ray.data.from_pandas(df).repartition(6), "g", "cat")
           .to_pandas().sort_values("g").reset_index(drop=True))
    for _, row in got.iterrows():
        sub = df[df.g == row["g"]].groupby("cat").size().to_numpy()
        assert row["gini"] == _direct_gini(sub), row["g"]
        assert row["n_rows"] == sub.sum() and row["n_cats"] == len(sub)


def test_grouped_gini_extremes():
    df = pd.DataFrame({
        "g": ["even"] * 40 + ["mono"] * 40,
        "cat": list("wxyz") * 10 + ["only"] * 40})
    got = grouped_gini(ray.data.from_pandas(df), "g", "cat").to_pandas(
        ).set_index("g")
    # perfectly even across 4 categories -> 0; single category -> 0 by
    # the discrete formula (n=1 numerator vanishes)
    assert got.loc["even", "gini"] == 0.0
    assert got.loc["mono", "gini"] == 0.0
    # one dominant category among many -> strictly positive
    df2 = pd.DataFrame({"g": "skew", "cat": ["big"] * 96 + list("abcd")})
    g2 = grouped_gini(ray.data.from_pandas(df2), "g", "cat").to_pandas()
    assert g2["gini"].iloc[0] > 0.7
