"""lag_autocorr (aggregate/stats.py) vs direct pandas/numpy, plus the
constant-series and single-pair drop rules."""

import numpy as np
import pandas as pd
import ray

from raster_processor_ray.aggregate.stats import lag_autocorr


def _direct(df):
    rows = []
    for k, sub in df.sort_values(["u", "ts", "i"]).groupby("u"):
        x = sub["v"].to_numpy(dtype=np.int64)
        if len(x) < 3:
            continue
        a, b = x[:-1].astype(np.float64), x[1:].astype(np.float64)
        n = float(len(a))
        va = n * (a * a).sum() - a.sum() ** 2
        vb = n * (b * b).sum() - b.sum() ** 2
        if va <= 0 or vb <= 0 or len(a) < 2:
            continue
        corr = (n * (a * b).sum() - a.sum() * b.sum()) / np.sqrt(va * vb)
        rows.append((k, len(a), np.round(corr, 6)))
    return pd.DataFrame(rows, columns=["u", "k", "lag1_corr"])


def test_lag_autocorr_vs_direct():
    rng = np.random.default_rng(11)
    frames = []
    for u in range(12):
        m = rng.integers(5, 60)
        # AR(1)-ish integer walk so the autocorrelation is non-trivial
        x = np.cumsum(rng.integers(-3, 4, size=m)) + 100
        frames.append(pd.DataFrame({
            "u": np.int64(u), "ts": np.arange(m, dtype=np.int64),
            "i": np.arange(m, dtype=np.int64), "v": x.astype(np.int64)}))
    df = pd.concat(frames, ignore_index=True).sample(frac=1, random_state=0)
    got = (lag_autocorr(ray.data.from_pandas(df).repartition(6),
                        "u", ["ts", "i"], "v").to_pandas()
           .sort_values("u").reset_index(drop=True))
    want = _direct(df).sort_values("u").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)


def test_lag_autocorr_drop_rules():
    df = pd.DataFrame({
        "u": [1] * 10 + [2] * 2 + [3] * 8,
        "ts": list(range(10)) + [0, 1] + list(range(8)),
        "i": list(range(10)) + [0, 1] + list(range(8)),
        # u=1 constant (zero variance -> dropped), u=2 one pair
        # (k=1 -> dropped), u=3 alternating (corr = -1)
        "v": [5] * 10 + [1, 2] + [0, 1] * 4})
    got = lag_autocorr(ray.data.from_pandas(df), "u", ["ts", "i"], "v"
                       ).to_pandas()
    assert got["u"].tolist() == [3]
    assert got["lag1_corr"].iloc[0] == -1.0
    assert got["k"].iloc[0] == 7
