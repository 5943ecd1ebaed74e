"""mutual_information (aggregate/stats.py): independence -> +0.0,
perfect dependence -> H of the marginal, vs direct numpy."""

import numpy as np
import pandas as pd
import ray

from raster_processor_ray.aggregate.stats import mutual_information


def test_mi_independent_is_zero():
    # a ⫫ b by construction: full cartesian product with equal counts
    a = np.repeat(list("pq"), 50)
    b = np.tile(np.repeat(list("xy"), 25), 2)
    df = pd.DataFrame({"a": a, "b": b})
    got = mutual_information(ray.data.from_pandas(df).repartition(4),
                             "a", "b").to_pandas()
    v = got["mi"].iloc[0]
    assert v == 0.0 and not np.signbit(v)
    assert got["n_pairs"].iloc[0] == 4
    assert got["n_rows"].iloc[0] == 100


def test_mi_perfect_dependence_equals_entropy():
    # b is a function of a with uniform marginal over 4 values:
    # I(a;b) = H(a) = ln 4
    vals = list("abcd")
    df = pd.DataFrame({"a": np.repeat(vals, 30),
                       "b": np.repeat([v.upper() for v in vals], 30)})
    got = mutual_information(ray.data.from_pandas(df), "a", "b").to_pandas()
    assert got["mi"].iloc[0] == np.round(np.log(4.0), 6)
    assert got["n_a"].iloc[0] == got["n_b"].iloc[0] == 4


def test_mi_vs_direct():
    rng = np.random.default_rng(3)
    a = rng.choice(list("uvw"), size=1500)
    # b correlates with a
    b = np.where(rng.random(1500) < 0.6, np.char.upper(a),
                 rng.choice(list("UVW"), size=1500))
    df = pd.DataFrame({"a": a, "b": b})
    got = float(mutual_information(ray.data.from_pandas(df).repartition(7),
                                   "a", "b").to_pandas()["mi"].iloc[0])
    joint = df.groupby(["a", "b"]).size()
    n = joint.sum()
    pj = joint / n
    pa = df.groupby("a").size() / n
    pb = df.groupby("b").size() / n
    want = sum(p * (np.log(p) - np.log(pa[ka]) - np.log(pb[kb]))
               for (ka, kb), p in pj.items())
    assert abs(got - want) < 2e-6
    assert got > 0.1  # the injected correlation is detected
