"""grouped_kl_divergence (aggregate/stats.py) vs direct numpy, including
the identical-to-global group (exact +0.0 after the fold)."""

import numpy as np
import pandas as pd
import ray

from raster_processor_ray.aggregate.stats import grouped_kl_divergence


def _direct(df, key, cat):
    counts = df.groupby([key, cat]).size().rename("c").reset_index()
    marg = counts.groupby(cat)["c"].sum()
    p = marg / marg.sum()
    rows = []
    for k, sub in counts.groupby(key):
        ns = sub["c"].sum()
        pg = sub["c"].to_numpy(dtype=np.float64) / float(ns)
        lnp = np.log(p.loc[sub[cat]].to_numpy(dtype=np.float64))
        kl = np.round((pg * (np.log(pg) - lnp)).sum(), 6) + 0.0
        rows.append((k, int(ns), kl))
    return pd.DataFrame(rows, columns=[key, "n_rows", "kl_global"])


def test_grouped_kl_vs_direct():
    rng = np.random.default_rng(9)
    frames = []
    # three groups with different mixes plus one matching the global-ish mix
    for g, probs in (("skewed", [0.7, 0.2, 0.1]), ("flat", [1 / 3] * 3),
                     ("inverse", [0.1, 0.2, 0.7])):
        frames.append(pd.DataFrame({
            "g": g, "cat": rng.choice(list("abc"), size=900, p=probs)}))
    df = pd.concat(frames, ignore_index=True)
    got = (grouped_kl_divergence(ray.data.from_pandas(df).repartition(5),
                                 "g", "cat").to_pandas()
           .sort_values("g").reset_index(drop=True))
    want = _direct(df, "g", "cat").sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    # every KL is non-negative and the skewed groups drift more than flat
    assert (got["kl_global"] >= 0).all()


def test_grouped_kl_single_group_is_zero():
    # one group == the global distribution -> KL exactly +0.0
    df = pd.DataFrame({"g": "only",
                       "cat": ["x"] * 30 + ["y"] * 20 + ["z"] * 10})
    got = grouped_kl_divergence(ray.data.from_pandas(df), "g", "cat"
                                ).to_pandas()
    assert len(got) == 1
    v = got["kl_global"].iloc[0]
    assert v == 0.0 and not np.signbit(v)
    assert int(got["n_rows"].iloc[0]) == 60
