"""KLL quantile sketch (aggregate/kll.py): exact-at-small-n, rank-error
bound at large n, merge equivalence, blob round-trip, and the
distributed per-key aggregate vs numpy exact quantiles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from raster_processor_ray.aggregate.kll import KLLSketch, kll_quantiles

QS = [0.1, 0.5, 0.9, 0.99]


def _rank_err(sketch, vals, qs):
    """max |est_rank - true_rank| / n over the requested quantiles."""
    est = sketch.quantiles(qs)
    sv = np.sort(vals)
    errs = []
    for q, e in zip(qs, est):
        true_rank = q * len(vals)
        est_rank = np.searchsorted(sv, e, side="right")
        errs.append(abs(est_rank - true_rank) / len(vals))
    return max(errs)


def test_exact_below_k():
    vals = np.arange(100, dtype=float)[::-1]
    s = KLLSketch(k=256).update_many(vals)
    got = s.quantiles([0.5, 0.99])
    # n <= k: everything sits in level 0 -> exact lower quantiles
    assert got[0] == np.sort(vals)[49]
    assert got[1] == np.sort(vals)[98]


def test_rank_error_bound_large_n():
    rng = np.random.default_rng(11)
    vals = rng.lognormal(size=100_000)
    s = KLLSketch(k=256).update_many(vals)
    assert _rank_err(s, vals, QS) < 0.01, "rank error >= 1% of n"


def test_merge_matches_single_stream_bound():
    rng = np.random.default_rng(4)
    vals = rng.normal(size=50_000)
    parts = np.array_split(vals, 7)
    merged = KLLSketch(k=256)
    for p in parts:
        merged.merge(KLLSketch(k=256).update_many(p))
    assert merged.n == len(vals)
    assert _rank_err(merged, vals, QS) < 0.01


def test_blob_roundtrip():
    rng = np.random.default_rng(9)
    s = KLLSketch(k=64).update_many(rng.normal(size=10_000))
    r = KLLSketch.from_bytes(s.to_bytes())
    assert r.n == s.n and r.parity == s.parity
    assert all((a == b).all() for a, b in zip(r.levels, s.levels))
    assert (r.quantiles(QS) == s.quantiles(QS)).all()


def test_distributed_per_key(ray_session):
    rng = np.random.default_rng(2)
    n = 40_000
    key = rng.integers(0, 4, size=n)
    val = rng.gamma(2.0, size=n) * (key + 1)
    t = pa.table({"k": pa.array(key), "v": pa.array(val)})
    out = kll_quantiles(rd.from_arrow(t).repartition(8), "k", "v",
                        [0.5, 0.9]).to_pandas().sort_values("k")
    assert len(out) == 4
    assert (out.approx_n.to_numpy() == np.bincount(key)).all()
    df = pd.DataFrame({"k": key, "v": val})
    for _, row in out.iterrows():
        sub = np.sort(df[df.k == row.k].v.to_numpy())
        for q, col in [(0.5, "q_0.5"), (0.9, "q_0.9")]:
            est_rank = np.searchsorted(sub, row[col], side="right")
            assert abs(est_rank - q * len(sub)) / len(sub) < 0.015
