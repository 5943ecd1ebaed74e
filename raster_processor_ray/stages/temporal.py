"""Temporal / behavioral analytics over event logs: interval-union
coverage, ordered funnel counts, weekly cohort retention (SURVEY.md §2.9
extension family — the reference's only stream-like op is gap
segmentation, raster_proc.py:744-753; these are the other standard
event-log shapes a web-scale corpus pipeline needs).

All three follow the engine's bucketed-kernel contract
(stages/sessionize.py): the shuffle key is ``hash(user) % B`` — a
BOUNDED group count — and inside a bucket everything runs vectorized
ACROSS keys (pandas C kernels: sort, groupby-cummax, cumsum), never a
Python call per key.  Determinism: interval endpoints are exact int64
microseconds (``epoch_us`` both engines; interval length
``round(value * 1e6)`` — two-decimal inputs never land on a rounding
tie), week truncation is Monday-based day arithmetic matching DuckDB's
``date_trunc('week', ...)``, and every output is integer counts /
timestamps — no float drift surface at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..util import pin_for_shuffle

_US_PER_WEEK = 7 * 86400 * 1_000_000


def _with_bucket(ds, key: str, num_buckets: int):
    from ..aggregate.relational import _key_bucket

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_bucket"] = _key_bucket(df, [key], num_buckets)
        return df

    return ds.map_batches(add_bucket, batch_format="pandas")


def _ts_us(s: pd.Series) -> np.ndarray:
    return s.astype("datetime64[us]").to_numpy().view("int64")


def interval_coverage(ds, key: str, ts_col: str, len_col: str, *,
                      num_buckets: int = 64):
    """Union length of per-row intervals ``[ts, ts + round(len*1e6) us)``
    per key -> (key, covered_us, n_islands).

    The sweep is the standard sorted-merge: per key, an interval starts a
    new island iff its start exceeds the running max end of everything
    earlier.  Running max is ``groupby(key).cummax()`` (one Cython pass
    across all keys in the bucket); islands and their extents fall out of
    one cumsum + one hash groupby.  Distinct from sessionization: the
    intervals have VARIABLE length, so island structure is not a
    fixed-gap split.
    """

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        s = _ts_us(df[ts_col])
        e = s + np.round(df[len_col].to_numpy() * 1e6).astype(np.int64)
        sub = pd.DataFrame({key: df[key].to_numpy(), "s": s, "e": e})
        sub = sub.sort_values([key, "s", "e"],
                              kind="mergesort").reset_index(drop=True)
        pm = sub.groupby(key, sort=False)["e"].cummax().shift(1)
        first = ~sub[key].eq(sub[key].shift(1)).to_numpy(dtype=bool)
        brk = first | (sub["s"].to_numpy() > pm.to_numpy())
        sub["_island"] = np.cumsum(brk)
        isl = sub.groupby([key, "_island"], sort=False).agg(
            mn=("s", "min"), mx=("e", "max"))
        isl["cov"] = isl["mx"] - isl["mn"]
        out = isl.reset_index().groupby(key, as_index=False).agg(
            covered_us=("cov", "sum"), n_islands=("cov", "count"))
        out["covered_us"] = out["covered_us"].astype(np.int64)
        out["n_islands"] = out["n_islands"].astype(np.int64)
        return out

    return (pin_for_shuffle(_with_bucket(ds, key, num_buckets))
            .groupby("_bucket")
            .map_groups(lambda df: per_bucket(df.drop(columns=["_bucket"])),
                        batch_format="pandas"))


def funnel_counts(ds, key: str, ts_col: str, type_col: str,
                  steps: list[str], *, num_buckets: int = 64) -> pd.DataFrame:
    """Ordered-funnel user counts: how many keys reach step i with a
    strictly-increasing timestamp chain step1 < step2 < ... < stepi.

    Per bucket: min-ts of step 1 per key, then for each later step a
    merge + filter (ts > previous step's ts) + min — each a vectorized
    pass over the bucket, |steps| passes total.  A key's rows co-locate
    in one bucket, so per-bucket partial counts sum exactly; the final
    fold is |steps| x buckets scalars on the driver.
    """

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        cur = (df[df[type_col] == steps[0]]
               .groupby(key)[ts_col].min().rename("_tp"))
        counts = [len(cur)]
        for st in steps[1:]:
            sub = df[df[type_col] == st].merge(
                cur, left_on=key, right_index=True)
            sub = sub[sub[ts_col] > sub["_tp"]]
            cur = sub.groupby(key)[ts_col].min().rename("_tp")
            counts.append(len(cur))
        return pd.DataFrame({"step": np.arange(1, len(steps) + 1,
                                               dtype=np.int64),
                             "event_type": steps,
                             "n_users": np.asarray(counts, dtype=np.int64)})

    parts = (pin_for_shuffle(_with_bucket(ds, key, num_buckets))
             .groupby("_bucket")
             .map_groups(lambda d: per_bucket(d.drop(columns=["_bucket"])),
                         batch_format="pandas")).to_pandas()
    if parts.empty:   # zero input blocks -> frame without columns
        return pd.DataFrame({"step": np.arange(1, len(steps) + 1,
                                               dtype=np.int64),
                             "event_type": steps,
                             "n_users": np.zeros(len(steps), dtype=np.int64)})
    out = parts.groupby(["step", "event_type"], as_index=False)["n_users"].sum()
    out = out.sort_values("step", ignore_index=True)
    return out.astype({"step": np.int64, "n_users": np.int64})


def week_start_us(ts: pd.Series) -> np.ndarray:
    """Monday-00:00 truncation as int64 microseconds — the day arithmetic
    twin of DuckDB ``date_trunc('week', ts)`` (1970-01-01 was a
    Thursday, hence the +3 day-of-week rebase)."""
    days = ts.astype("datetime64[us]").to_numpy().astype(
        "datetime64[D]").view("int64")
    dow = (days + 3) % 7
    return (days - dow) * 86400 * 1_000_000


def cohort_retention(ds, key: str, ts_col: str, *, num_buckets: int = 32):
    """Weekly cohort retention -> (cohort_week, week_offset, n_users):
    keys grouped by the Monday week of their FIRST event, counted in
    every later week they are active.

    Composition of engine primitives: min-ts per key (one bounded
    aggregate), distinct (key, week) (second bounded aggregate), one
    hash join, one final aggregate — no driver-side state beyond the
    result (bounded by cohorts x offsets, not keys).
    """
    import pyarrow as pa

    from ..aggregate.relational import hash_aggregate, hash_join

    def add_week(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({key: df[key],
                             "week_us": week_start_us(df[ts_col])})

    weekly = ds.map_batches(add_week, batch_format="pandas")
    active = hash_aggregate(weekly, [key, "week_us"],
                            {"_n": (None, "count")},
                            num_buckets=num_buckets).drop_columns(["_n"])
    first = hash_aggregate(weekly, key, {"cohort_us": ("week_us", "min")},
                           num_buckets=num_buckets)
    joined = hash_join(active, first, key, how="inner",
                       num_buckets=num_buckets)

    def to_cohort(df: pd.DataFrame) -> pd.DataFrame:
        off = (df["week_us"].to_numpy(dtype=np.int64)
               - df["cohort_us"].to_numpy(dtype=np.int64)) // _US_PER_WEEK
        return pd.DataFrame({"cohort_us": df["cohort_us"].to_numpy(np.int64),
                             "week_offset": off})

    agg = hash_aggregate(joined.map_batches(to_cohort, batch_format="pandas"),
                         ["cohort_us", "week_offset"],
                         {"n_users": (None, "count")},
                         num_buckets=num_buckets)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_week": np.asarray(b["cohort_us"]).astype(
                "datetime64[us]"),
            "week_offset": np.asarray(b["week_offset"], dtype=np.int64),
            "n_users": np.asarray(b["n_users"], dtype=np.int64)})

    return agg.map_batches(finish, batch_format="pyarrow")
