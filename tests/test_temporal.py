"""Temporal analytics (stages/temporal.py): sweep-line coverage vs brute
force, funnel ordering semantics, Monday week truncation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raster_processor_ray.stages.temporal import (
    cohort_retention, funnel_counts, interval_coverage, week_start_us)


def _events_ds(df: pd.DataFrame):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_interval_coverage_matches_bruteforce(ray_session):
    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.integers(0, 12, n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 3_600_000, n), unit="us"),
        "value": np.round(rng.uniform(0.01, 2.0, n), 2),
    })
    out = interval_coverage(_events_ds(df), "user_id", "ts", "value",
                            num_buckets=4).to_pandas()
    out = out.set_index("user_id").sort_index()
    for uid, sub in df.groupby("user_id"):
        s = sub["ts"].astype("datetime64[us]").to_numpy().view("int64")
        e = s + np.round(sub["value"].to_numpy() * 1e6).astype(np.int64)
        ivs = sorted(zip(s.tolist(), e.tolist()))
        cov, islands = 0, 0
        cur_s, cur_e = None, None
        for a, b in ivs:
            if cur_e is None or a > cur_e:
                if cur_e is not None:
                    cov += cur_e - cur_s
                cur_s, cur_e = a, b
                islands += 1
            else:
                cur_e = max(cur_e, b)
        cov += cur_e - cur_s
        assert out.loc[uid, "covered_us"] == cov, uid
        assert out.loc[uid, "n_islands"] == islands, uid


def test_funnel_requires_strict_order(ray_session):
    base = pd.to_datetime("2024-01-01")
    mk = pd.to_timedelta
    df = pd.DataFrame({
        # u1 completes all 3 in order; u2 has click BEFORE view (stops
        # at view); u3 never signs up (counted nowhere)
        "user_id": [1, 1, 1, 2, 2, 2, 3, 3],
        "ts": [base + mk(s, unit="s") for s in [0, 10, 20, 0, 5, 3, 1, 2]],
        "event_type": ["signup", "view", "click",
                       "signup", "view", "click",
                       "view", "click"],
    })
    out = funnel_counts(_events_ds(df), "user_id", "ts", "event_type",
                        ["signup", "view", "click"], num_buckets=2)
    got = out.set_index("event_type")["n_users"].to_dict()
    assert got == {"signup": 2, "view": 2, "click": 1}


def test_week_start_is_monday():
    ts = pd.Series(pd.to_datetime([
        "2024-01-01 05:00",   # Monday
        "2024-01-07 23:59",   # Sunday -> same week
        "2024-01-08 00:00",   # next Monday
        "1970-01-01 12:00",   # Thursday -> week of Mon 1969-12-29
    ]))
    us = week_start_us(ts)
    got = us.astype("datetime64[us]").astype("datetime64[D]").astype(str)
    assert list(got) == ["2024-01-01", "2024-01-01", "2024-01-08",
                        "1969-12-29"]


def test_cohort_retention_counts(ray_session):
    base = pd.to_datetime("2024-01-01")  # a Monday
    wk = pd.Timedelta(days=7)
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3],
        "ts": [base, base + wk, base + 2 * wk,
               base + wk, base + 2 * wk,
               base + 2 * wk],
    })
    out = cohort_retention(_events_ds(df), "user_id", "ts",
                           num_buckets=4).to_pandas()
    out = out.set_index(["cohort_week", "week_offset"])["n_users"]
    c0 = pd.Timestamp("2024-01-01")
    c1 = pd.Timestamp("2024-01-08")
    c2 = pd.Timestamp("2024-01-15")
    assert out[(c0, 0)] == 1 and out[(c0, 1)] == 1 and out[(c0, 2)] == 1
    assert out[(c1, 0)] == 1 and out[(c1, 1)] == 1
    assert out[(c2, 0)] == 1
    assert len(out) == 6


def test_keyed_asof_tolerance_and_ties(ray_session):
    from raster_processor_ray.stages.asof import keyed_asof_join
    base = pd.to_datetime("2024-01-01")
    s = lambda x: base + pd.Timedelta(seconds=x)
    left = pd.DataFrame({          # purchases
        "event_id": [100, 101, 102, 103],
        "user_id": [1, 1, 2, 3],
        "ts": [s(50), s(400), s(60), s(10)],
    })
    right = pd.DataFrame({         # clicks
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [1, 1, 1, 2, 2],
        # user 1: clicks at 40 and a TIE pair at 45; user 2: click too old
        "ts": [s(40), s(45), s(45), s(-400), s(59)],
    })
    lds = rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False))
    rds = rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False))
    out = keyed_asof_join(lds, rds, "user_id", "ts", tolerance_us=300_000_000,
                          tie_col="event_id", payload_cols=[],
                          num_buckets=2).to_pandas()
    got = out.set_index("event_id")["event_id_r"]
    assert got[100] == 3          # tie at s(45) -> max event_id wins
    assert np.isnan(got[101])     # 400 - 45 > 300s tolerance
    assert got[102] == 5          # s(59) <= s(60), within tolerance
    assert np.isnan(got[103])     # user 3 has no clicks


def test_keyed_asof_int64_payload_precision(ray_session):
    """Payload columns keep their arrow types through the padded union:
    int64 ids above 2^53 must survive exactly (a float64 pad would
    corrupt them), and unmatched lefts get real NULLs."""
    from raster_processor_ray.stages.asof import keyed_asof_join

    BIG = 2**53 + 1
    base = pd.to_datetime("2024-01-01")
    s = lambda x: base + pd.Timedelta(seconds=x)
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([s(10), s(20), s(10)], pa.timestamp("us")),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "ts": pa.array([s(5), s(15)], pa.timestamp("us")),
        "tie": pa.array([10, 20], pa.int64()),
        "payload_id": pa.array([BIG, BIG + 2], pa.int64()),
    }))
    rows = sorted(keyed_asof_join(left, right, key="k", ts_col="ts",
                                  tie_col="tie",
                                  payload_cols=["payload_id"]).take_all(),
                  key=lambda r: (r["k"], r["ts"]))
    assert rows[0]["payload_id"] == BIG and rows[0]["tie"] == 10
    assert rows[1]["payload_id"] == BIG + 2 and rows[1]["tie"] == 20
    assert rows[2]["payload_id"] is None and rows[2]["tie"] is None
