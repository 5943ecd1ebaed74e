"""transition_counts and longest_streak (aggregate/stats.py) vs direct
pandas references, plus edge rules (single-row keys, duplicate days,
partition invariance, probability normalization)."""

import numpy as np
import pandas as pd
import ray

from raster_processor_ray.aggregate.stats import longest_streak, transition_counts


def _direct_transitions(df):
    pairs = []
    for _, sub in df.sort_values(["u", "ts", "i"]).groupby("u"):
        s = sub["state"].tolist()
        pairs += list(zip(s[:-1], s[1:]))
    p = pd.DataFrame(pairs, columns=["prev_state", "state"])
    c = (p.groupby(["prev_state", "state"], as_index=False)
         .size().rename(columns={"size": "n"}))
    tot = c.groupby("prev_state")["n"].transform("sum")
    c["prob"] = np.round(c["n"] / tot, 6)
    return c


def test_transitions_vs_direct():
    rng = np.random.default_rng(7)
    frames = []
    for u in range(20):
        m = int(rng.integers(1, 40))          # includes single-row keys
        frames.append(pd.DataFrame({
            "u": np.int64(u), "ts": np.arange(m, dtype=np.int64),
            "i": np.arange(m, dtype=np.int64),
            "state": rng.choice(["a", "b", "c", "d"], size=m)}))
    df = pd.concat(frames, ignore_index=True).sample(frac=1, random_state=3)
    got = (transition_counts(ray.data.from_pandas(df).repartition(5),
                             "u", ["ts", "i"], "state").to_pandas()
           .sort_values(["prev_state", "state"]).reset_index(drop=True))
    want = (_direct_transitions(df)
            .sort_values(["prev_state", "state"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["prev_state", "state", "n", "prob"]], want, check_dtype=False)
    # row-normalization: probabilities sum to 1 per prev state
    sums = got.groupby("prev_state")["prob"].sum()
    assert np.allclose(sums.to_numpy(), 1.0, atol=2e-6)


def test_transitions_no_pairs():
    # every key has exactly one row -> no adjacent pairs anywhere
    df = pd.DataFrame({"u": [1, 2, 3], "ts": [0, 0, 0], "i": [0, 0, 0],
                       "state": ["a", "b", "c"]})
    got = transition_counts(ray.data.from_pandas(df), "u", ["ts", "i"],
                            "state").to_pandas()
    assert len(got) == 0


def _direct_streaks(df):
    rows = []
    for u, sub in df.groupby("u"):
        days = np.unique(sub["day"].to_numpy(dtype=np.int64))
        runs, cur = [], 1
        for a, b in zip(days[:-1], days[1:]):
            if b - a == 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        rows.append((u, len(days), max(runs)))
    return pd.DataFrame(rows, columns=["u", "n_days", "max_streak"])


def test_streaks_vs_direct():
    rng = np.random.default_rng(5)
    frames = []
    for u in range(25):
        m = int(rng.integers(1, 50))
        # duplicate days on purpose: multiple events on the same day
        days = rng.integers(0, 30, size=m)
        frames.append(pd.DataFrame({"u": np.int64(u), "day": days}))
    df = pd.concat(frames, ignore_index=True).sample(frac=1, random_state=1)
    got = (longest_streak(ray.data.from_pandas(df).repartition(7),
                          "u", "day").to_pandas()
           .sort_values("u").reset_index(drop=True))
    want = _direct_streaks(df).sort_values("u").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["u", "n_days", "max_streak"]], want,
                                  check_dtype=False)


def test_streaks_exact_islands():
    # u=1: days {3,4,5, 9, 11,12} -> n_days=6, max_streak=3
    # u=2: one day (duplicated) -> n_days=1, max_streak=1
    df = pd.DataFrame({"u": [1] * 7 + [2] * 3,
                       "day": [3, 4, 5, 5, 9, 11, 12, 7, 7, 7]})
    got = (longest_streak(ray.data.from_pandas(df).repartition(3),
                          "u", "day").to_pandas()
           .sort_values("u").reset_index(drop=True))
    assert got["n_days"].tolist() == [6, 1]
    assert got["max_streak"].tolist() == [3, 1]


def test_streaks_partition_invariance():
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"u": rng.integers(0, 10, size=400),
                       "day": rng.integers(0, 40, size=400)})
    outs = []
    for parts in (1, 4, 13):
        outs.append(longest_streak(
            ray.data.from_pandas(df).repartition(parts), "u", "day"
        ).to_pandas().sort_values("u").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])
