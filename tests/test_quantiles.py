"""quantile_disc (aggregate/quantiles.py) vs a NumPy oracle."""

import numpy as np
import pandas as pd
import ray

from raster_processor_ray.aggregate.quantiles import quantile_disc


def _oracle(df, keys, vcol, q):
    out = {}
    for k, g in df.groupby(keys):
        v = np.sort(g[vcol].to_numpy())
        need = max(1, int(np.ceil(q * len(v))))
        out[k] = v[need - 1]
    return out


def test_quantiles_random_vs_oracle():
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "d"], size=5000),
        "v": rng.integers(-50, 50, size=5000).astype(np.int64)})
    got = quantile_disc(ray.data.from_pandas(df).repartition(8),
                        "k", "v", [0.5, 0.9]).to_pandas()
    got = got.set_index("k")
    for q, col in [(0.5, "q_50"), (0.9, "q_90")]:
        want = _oracle(df, "k", "v", q)
        for k, v in want.items():
            assert got.loc[k, col] == v, (q, k)


def test_quantiles_edges():
    # single-value keys, all-equal values, heavy duplication
    df = pd.DataFrame({
        "k": ["x"] * 1 + ["y"] * 100 + ["z"] * 7,
        "v": np.r_[np.array([42]), np.full(100, 5), np.arange(7)].astype(
            np.int64)})
    got = quantile_disc(ray.data.from_pandas(df), "k", "v",
                        [0.5, 1.0]).to_pandas().set_index("k")
    assert got.loc["x", "q_50"] == 42 and got.loc["x", "q_100"] == 42
    assert got.loc["y", "q_50"] == 5 and got.loc["y", "q_100"] == 5
    # z: values 0..6; median need=4 -> v=3; max -> 6
    assert got.loc["z", "q_50"] == 3 and got.loc["z", "q_100"] == 6


def test_quantile_cont_matches_numpy_linear():
    from raster_processor_ray.aggregate.quantiles import quantile_cont

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], size=4000),
        "v": rng.integers(0, 700, size=4000).astype(np.int64)})
    got = quantile_cont(ray.data.from_pandas(df).repartition(8),
                        "k", "v", [0.5, 0.9]).to_pandas().set_index("k")
    for k, g in df.groupby("k"):
        for q, col in [(0.5, "cq_50"), (0.9, "cq_90")]:
            # np.percentile 'linear' is the same q*(n-1) interpolation
            want = np.percentile(g["v"].to_numpy(), q * 100,
                                 method="linear")
            assert abs(got.loc[k, col] - want) < 1e-9, (k, q)


def test_quantile_cont_single_value():
    from raster_processor_ray.aggregate.quantiles import quantile_cont

    df = pd.DataFrame({"k": ["x"], "v": np.array([7], dtype=np.int64)})
    got = quantile_cont(ray.data.from_pandas(df), "k", "v",
                        [0.5]).to_pandas()
    assert float(got["cq_50"].iloc[0]) == 7.0


def test_quantiles_multikey():
    rng = np.random.default_rng(12)
    df = pd.DataFrame({
        "a": rng.choice(["p", "q"], size=2000),
        "b": rng.integers(0, 3, size=2000).astype(np.int64),
        "v": rng.integers(0, 1000, size=2000).astype(np.int64)})
    got = quantile_disc(ray.data.from_pandas(df).repartition(4),
                        ["a", "b"], "v", [0.5]).to_pandas()
    got = got.set_index(["a", "b"])
    want = _oracle(df, ["a", "b"], "v", 0.5)
    for k, v in want.items():
        assert got.loc[k, "q_50"] == v
