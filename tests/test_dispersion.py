"""dispersion_index (aggregate/stats.py): bursty > 1 > regular, exact
formula vs direct numpy, single-bin groups dropped."""

import numpy as np
import pandas as pd
import ray

from raster_processor_ray.aggregate.stats import dispersion_index


def _direct(counts):
    c = np.asarray(counts, dtype=np.float64)
    n = float(len(c))
    return np.round((n * (n * (c * c).sum() - c.sum() ** 2))
                    / ((n - 1.0) * n * c.sum()), 6)


def test_dispersion_vs_direct():
    # regular: every bin has ~the same count; bursty: one huge bin
    rows = []
    for b in range(20):
        rows += [("regular", b)] * 10
    for b in range(20):
        rows += [("bursty", b)] * (150 if b == 0 else 2)
    rows += [("single", 0)] * 40          # one bin -> dropped
    df = pd.DataFrame(rows, columns=["g", "bin"])
    got = (dispersion_index(ray.data.from_pandas(df).repartition(5),
                            "g", "bin").to_pandas()
           .set_index("g"))
    assert "single" not in got.index
    reg = df[df.g == "regular"].groupby("bin").size().to_numpy()
    bur = df[df.g == "bursty"].groupby("bin").size().to_numpy()
    assert got.loc["regular", "dispersion"] == _direct(reg) == 0.0
    assert got.loc["bursty", "dispersion"] == _direct(bur)
    assert got.loc["bursty", "dispersion"] > 50  # strongly over-dispersed
    assert got.loc["regular", "n_bins"] == 20
    assert got.loc["bursty", "n_events"] == 188
