"""Sliding-window aggregate (stages/windows.py) vs a pandas oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from raster_processor_ray.stages.windows import (sliding_window_aggregate,
                                                 sliding_window_expand)

HOUR = 3_600_000_000  # us


def _events(n=500, seed=7):
    rng = np.random.default_rng(seed)
    ts = (np.datetime64("2024-03-01T00:00:00", "us")
          + rng.integers(0, 72 * HOUR, size=n).astype("timedelta64[us]"))
    return pd.DataFrame({
        "ts": ts,
        "event_type": rng.choice(["a", "b", "c"], size=n),
        "v": rng.integers(0, 100, size=n).astype(np.int64),
    })


def test_expand_membership():
    df = _events(200)
    ds = ray.data.from_pandas(df)
    out = sliding_window_expand(ds, "ts", window_us=2 * HOUR,
                                slide_us=HOUR).to_pandas()
    assert len(out) == 2 * len(df)
    ts = out["ts"].astype("datetime64[us]").astype(np.int64)
    ws = out["window_start"].astype("datetime64[us]").astype(np.int64)
    # every expanded row's window contains its event
    assert ((ws <= ts) & (ts < ws + 2 * HOUR)).all()
    # window starts are slide-aligned
    assert (ws % HOUR == 0).all()


def test_indivisible_slide_raises():
    ds = ray.data.from_pandas(_events(10))
    with pytest.raises(ValueError):
        sliding_window_expand(ds, "ts", window_us=3 * HOUR,
                              slide_us=2 * HOUR)


def test_aggregate_matches_pandas_oracle():
    df = _events(500)
    ds = ray.data.from_pandas(df)
    got = sliding_window_aggregate(
        ds, "ts", ["event_type"],
        {"n": (None, "count"), "sum_v": ("v", "sum")},
        window_us=2 * HOUR, slide_us=HOUR).to_pandas()

    ts_i = df["ts"].astype("datetime64[us]").astype(np.int64)
    parts = []
    for j in range(2):
        e = df.copy()
        e["window_start"] = ((ts_i // HOUR) * HOUR - j * HOUR).astype(
            "datetime64[us]")
        parts.append(e)
    want = (pd.concat(parts)
            .groupby(["window_start", "event_type"], as_index=False)
            .agg(n=("v", "size"), sum_v=("v", "sum")))

    key = ["window_start", "event_type"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(want_s)
    assert (got_s["n"].to_numpy() == want_s["n"].to_numpy()).all()
    assert (got_s["sum_v"].to_numpy() == want_s["sum_v"].to_numpy()).all()
