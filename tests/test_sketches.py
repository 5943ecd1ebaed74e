"""HyperLogLog (aggregate/sketches.py): accuracy vs exact, merge
associativity across partitionings."""

import numpy as np
import pandas as pd
import ray

from raster_processor_ray.aggregate.sketches import (_hll_estimate,
                                                     _hll_idx_rank,
                                                     hll_count_distinct)


def test_estimator_accuracy_local():
    rng = np.random.default_rng(31)
    for true_n in (100, 5_000, 200_000):
        vals = rng.integers(0, 1 << 62, size=true_n).astype(np.uint64)
        idx, rank = _hll_idx_rank(vals, 12)
        regs = np.zeros(1 << 12, dtype=np.uint8)
        np.maximum.at(regs, idx, rank)
        est = _hll_estimate(regs)
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_distributed_matches_partitioning():
    rng = np.random.default_rng(32)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], size=50_000),
        "v": rng.integers(0, 3_000, size=50_000).astype(np.int64)})
    outs = []
    for parts in (1, 4, 16):
        ds = ray.data.from_pandas(df).repartition(parts)
        got = hll_count_distinct(ds, "g", "v", p=12).to_pandas()
        outs.append(got.sort_values("g").reset_index(drop=True))
    # register-max merge is associative/commutative: identical estimates
    # no matter how the input is partitioned
    for o in outs[1:]:
        assert (o["approx_distinct"].to_numpy()
                == outs[0]["approx_distinct"].to_numpy()).all()
    exact = df.groupby("g")["v"].nunique()
    got = outs[0].set_index("g")["approx_distinct"]
    for k in exact.index:
        err = abs(got[k] - exact[k]) / exact[k]
        assert err < 0.05, (k, got[k], exact[k])
