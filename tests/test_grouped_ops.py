"""grouped_topk + count_distinct (aggregate/relational.py) vs pandas."""

import numpy as np
import pandas as pd
import ray

from raster_processor_ray.aggregate.relational import (count_distinct,
                                                       grouped_topk)


def test_grouped_topk_vs_pandas():
    rng = np.random.default_rng(21)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=3000),
        "score": rng.integers(0, 500, size=3000).astype(np.int64),
        "id": np.arange(3000, dtype=np.int64)})
    got = grouped_topk(ray.data.from_pandas(df).repartition(8),
                       "g", "score", 5, tie_col="id").to_pandas()
    want = (df.sort_values(["g", "score", "id"],
                           ascending=[True, False, True], kind="mergesort")
            .groupby("g", sort=False).head(5))
    key = ["g", "score", "id"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w) == 15
    assert (g["id"].to_numpy() == w["id"].to_numpy()).all()


def test_grouped_topk_small_groups():
    df = pd.DataFrame({"g": ["x", "x", "y"],
                       "score": np.array([1, 2, 3], dtype=np.int64),
                       "id": np.array([0, 1, 2], dtype=np.int64)})
    got = grouped_topk(ray.data.from_pandas(df), "g", "score", 5,
                       tie_col="id").to_pandas()
    assert len(got) == 3  # groups smaller than k return all rows


def test_count_distinct_vs_pandas():
    rng = np.random.default_rng(22)
    df = pd.DataFrame({
        "g": rng.choice(["p", "q", "r", "s"], size=20_000),
        "u": rng.integers(0, 300, size=20_000).astype(np.int64)})
    got = count_distinct(ray.data.from_pandas(df).repartition(8),
                         "g", "u").to_pandas().set_index("g")
    want = df.groupby("g")["u"].nunique()
    for k, v in want.items():
        assert int(got.loc[k, "n_distinct"]) == int(v)
