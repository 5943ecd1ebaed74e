"""rolling_distinct_count (stages/windows.py) vs a direct per-day set
union, plus window-edge and duplicate-pair rules."""

import numpy as np
import pandas as pd
import ray

from raster_processor_ray.stages.windows import rolling_distinct_count


def _direct(df, window):
    days = np.sort(df["day"].unique())
    rows = []
    for d in days:
        ids = df.loc[(df["day"] >= d - window + 1) & (df["day"] <= d),
                     "id"].unique()
        rows.append((d, len(ids)))
    return pd.DataFrame(rows, columns=["day", "wau"])


def test_rolling_distinct_vs_direct():
    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "id": rng.integers(0, 40, size=600),
        # gaps on purpose: some days have no activity at all
        "day": rng.choice(np.r_[0:10, 14:25, 40:45], size=600)})
    got = (rolling_distinct_count(
        ray.data.from_pandas(df).repartition(5), "day", "id",
        window=7, out="wau").to_pandas()
        .sort_values("day").reset_index(drop=True))
    want = _direct(df, 7).sort_values("day").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rolling_distinct_window_one_is_daily_distinct():
    df = pd.DataFrame({"id": [1, 1, 2, 3, 3, 3], "day": [0, 0, 0, 1, 1, 2]})
    got = (rolling_distinct_count(ray.data.from_pandas(df), "day", "id",
                                  window=1, out="n").to_pandas()
           .sort_values("day").reset_index(drop=True))
    assert got["day"].tolist() == [0, 1, 2]
    assert got["n"].tolist() == [2, 1, 1]


def test_rolling_distinct_no_double_count_across_days():
    # one user active every day: every window counts them exactly once
    df = pd.DataFrame({"id": [7] * 10, "day": list(range(10))})
    got = rolling_distinct_count(ray.data.from_pandas(df), "day", "id",
                                 window=7, out="n").to_pandas()
    assert (got["n"] == 1).all()
    assert len(got) == 10
