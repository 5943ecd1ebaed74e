"""Windowed aggregates over event streams (SURVEY.md §2.9 family).

Tumbling windows are a plain keyed aggregate on the truncated timestamp
(see q_hourly_windows). This module adds SLIDING (overlapping) windows:
window length W, slide S with S | W — every event belongs to exactly
W/S windows, so the stage expands each row W/S times (a bounded,
vectorized fan-out inside ``map_batches``) and feeds ONE bucketed
hash aggregate. No sort, no per-window state, no driver loops.

Scale shape: the expansion factor W/S is a small constant chosen by the
caller (2-4 in practice); shuffle bytes grow by exactly that factor and
the aggregate's map-side partials keep per-block output bounded by
distinct (window, key) pairs. Skewed hot windows are spread by the same
``hash(key) % B`` bucketing every other aggregate uses. A
watermark/stateful streaming form is intentionally NOT needed: Ray Data
pipelines are batch over bounded inputs (the reference's granule-sized
runs, SURVEY.md §1); late data re-runs the affected partition via the
resumable manifest instead of holding open-window state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def sliding_window_expand(ds, ts_col: str, *, window_us: int, slide_us: int,
                          out_col: str = "window_start"):
    """Append ``window_start`` (datetime64[us]) and expand each row to the
    W/S windows containing it. Window starts are aligned to the slide
    grid (floor(ts / S) * S - j*S for j in 0..W/S-1)."""
    if window_us % slide_us:
        raise ValueError("slide must divide window")
    k = window_us // slide_us

    def expand(b: pa.Table) -> pa.Table:
        ts = np.asarray(b[ts_col]).astype("datetime64[us]").astype(np.int64)
        n = len(ts)
        base = (ts // slide_us) * slide_us
        # j-th copy: window starting j slides earlier still contains ts
        starts = (np.repeat(base, k)
                  - np.tile(np.arange(k, dtype=np.int64) * slide_us, n))
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        out = b.take(idx)
        return out.append_column(
            out_col, pa.array(starts.astype("datetime64[us]")))

    return ds.map_batches(expand, batch_format="pyarrow")


def sliding_window_aggregate(ds, ts_col: str, keys: list[str], spec: dict,
                             *, window_us: int, slide_us: int,
                             num_buckets: int = 32):
    """Sliding-window keyed aggregate: expand (bounded W/S fan-out) ->
    one bucketed hash aggregate on (window_start, *keys)."""
    from ..aggregate.relational import hash_aggregate

    expanded = sliding_window_expand(ds, ts_col, window_us=window_us,
                                     slide_us=slide_us)
    return hash_aggregate(expanded, ["window_start"] + list(keys), spec,
                          num_buckets=num_buckets)


def keyed_lag_deltas(ds, key: str, ts_col: str, *, tie_col: str | None = None,
                     rn_col: str = "rn", delta_col: str = "delta_s",
                     num_buckets: int = 64):
    """Per-key ordered window functions: 1-based ``row_number`` and the
    lag delta to the previous event in seconds (first event per key:
    -1.0 sentinel — a sentinel, not NULL, so both engines sort/hash the
    column identically).

    SQL equivalent: ``row_number() OVER w`` and
    ``epoch(ts - lag(ts) OVER w)`` with
    ``w AS (PARTITION BY key ORDER BY ts[, tie_col])``.

    Scale shape (same as sessionize, stages/sessionize.py): shuffle on
    ``hash(key) % num_buckets`` — O(buckets) group invocations, never
    O(distinct keys) — then ONE sort + diff/cumcount vectorized across
    every key in the bucket. Ordering is only assumed within a bucket's
    sorted frame. ``tie_col`` must make (key, ts, tie) unique for a
    deterministic result (e.g. an event id).
    """
    import pandas as pd

    from ..util import pin_for_shuffle
    from .sessionize import _with_bucket

    sort_cols = [key, ts_col] + ([tie_col] if tie_col else [])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_bucket"]).sort_values(
            sort_cols, kind="mergesort").reset_index(drop=True)
        n = len(df)
        if n == 0:
            df[rn_col] = np.array([], dtype=np.int64)
            df[delta_col] = np.array([], dtype=np.float64)
            return df
        k = df[key]
        same_key = k.eq(k.shift(1)).to_numpy(dtype=bool)
        starts = np.flatnonzero(~same_key)
        counts = np.diff(np.append(starts, n))
        idx = np.arange(n, dtype=np.int64)
        df[rn_col] = idx - np.repeat(starts, counts) + 1
        ts_us = df[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        delta = np.empty(n, dtype=np.float64)
        delta[1:] = (ts_us[1:] - ts_us[:-1]) / 1_000_000.0
        delta[0] = -1.0
        delta[~same_key] = -1.0
        df[delta_col] = delta
        return df

    return (pin_for_shuffle(_with_bucket(ds, key, num_buckets))
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def keyed_cumsum(ds, key: str, order_col: str, value_col: str, *,
                 tie_col: str | None = None, out_col: str = "cum",
                 num_buckets: int = 64):
    """Per-key running total in (order_col[, tie_col]) order — SQL
    ``sum(value) OVER (PARTITION BY key ORDER BY order_col[, tie]
    ROWS UNBOUNDED PRECEDING)``. Integer value columns stay exact under
    any execution order; pre-quantize floats (the cents trick) for
    bit-reproducible totals.

    Same bounded-bucket shape as keyed_lag_deltas: one shuffle on
    ``hash(key) % B``, then one cumsum rebased at key starts,
    vectorized across every key in the bucket."""
    import pandas as pd

    from ..util import pin_for_shuffle
    from .sessionize import _with_bucket

    sort_cols = [key, order_col] + ([tie_col] if tie_col else [])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_bucket"]).sort_values(
            sort_cols, kind="mergesort").reset_index(drop=True)
        n = len(df)
        if n == 0:
            df[out_col] = np.array([], dtype=np.int64)
            return df
        kv = df[key]
        same_key = kv.eq(kv.shift(1)).to_numpy(dtype=bool)
        starts = np.flatnonzero(~same_key)
        counts = np.diff(np.append(starts, n))
        v = df[value_col].to_numpy()
        cs = np.cumsum(v)
        base = np.repeat(np.r_[cs.dtype.type(0), cs[starts[1:] - 1]], counts)
        df[out_col] = cs - base
        return df

    return (pin_for_shuffle(_with_bucket(ds, key, num_buckets))
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def keyed_ntile(ds, key: str, order_col: str, k: int, *,
                tie_col: str | None = None, out_col: str = "tile",
                num_buckets: int = 64):
    """SQL ``ntile(k) OVER (PARTITION BY key ORDER BY order_col[, tie])``:
    split each key's ordered rows into k groups as evenly as possible,
    LARGER groups first (n = q*k + r -> the first r groups get q+1 rows
    — the ANSI definition DuckDB/Postgres implement).

    Same bounded-bucket shape as :func:`keyed_lag_deltas`: every key's
    rows land in ONE bucket, so per-key totals are known locally and the
    assignment is one vectorized formula over the sorted frame.
    """
    import pandas as pd

    from ..util import pin_for_shuffle
    from .sessionize import _with_bucket

    sort_cols = [key, order_col] + ([tie_col] if tie_col else [])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_bucket"]).sort_values(
            sort_cols, kind="mergesort").reset_index(drop=True)
        n = len(df)
        if n == 0:
            df[out_col] = np.array([], dtype=np.int64)
            return df
        kv = df[key]
        same_key = kv.eq(kv.shift(1)).to_numpy(dtype=bool)
        starts = np.flatnonzero(~same_key)
        counts = np.diff(np.append(starts, n))
        rn0 = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
        tot = np.repeat(counts, counts)
        q, r = tot // k, tot % k
        big = r * (q + 1)                        # rows covered by q+1-sized tiles
        in_big = rn0 < big
        with np.errstate(divide="ignore", invalid="ignore"):
            tile = np.where(
                in_big, rn0 // np.maximum(q + 1, 1),
                r + np.where(q > 0, (rn0 - big) // np.maximum(q, 1), 0))
        df[out_col] = tile.astype(np.int64) + 1
        return df

    return (pin_for_shuffle(_with_bucket(ds, key, num_buckets))
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas"))

def keyed_rolling_sum(ds, key: str, order_col: str, value_col: str, *,
                      preceding: int, tie_col: str | None = None,
                      out_col: str = "roll", num_buckets: int = 64):
    """Per-key ROW-based moving total — SQL ``sum(value) OVER (PARTITION
    BY key ORDER BY order[, tie] ROWS BETWEEN p PRECEDING AND CURRENT
    ROW)``. Integer value columns stay exact (cents trick for floats).

    Same bounded-bucket shape as the other window kernels: one shuffle
    on ``hash(key) % B``; inside the bucket the window is one cumsum
    plus a clamped gather — ``roll[i] = cs[i] - cs[max(key_start,
    i-p) - 1]`` — vectorized across every key at once.
    """
    import pandas as pd

    from ..util import pin_for_shuffle
    from .sessionize import _with_bucket

    sort_cols = [key, order_col] + ([tie_col] if tie_col else [])
    p = int(preceding)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_bucket"]).sort_values(
            sort_cols, kind="mergesort").reset_index(drop=True)
        n = len(df)
        if n == 0:
            df[out_col] = np.array([], dtype=np.int64)
            return df
        kv = df[key]
        same_key = kv.eq(kv.shift(1)).to_numpy(dtype=bool)
        starts = np.flatnonzero(~same_key)
        counts = np.diff(np.append(starts, n))
        key_start = np.repeat(starts, counts)
        idx = np.arange(n, dtype=np.int64)
        v = df[value_col].to_numpy()
        cs = np.cumsum(v)
        lo = np.maximum(key_start, idx - p)       # first row in the window
        base = np.where(lo > 0, cs[np.maximum(lo - 1, 0)], v.dtype.type(0))
        df[out_col] = cs - base
        return df

    return (pin_for_shuffle(_with_bucket(ds, key, num_buckets))
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def keyed_rank(ds, key: str, order_col: str, *, descending: bool = False,
               num_buckets: int = 64, rank_col: str = "rnk",
               dense_col: str = "drnk", percent_col: str | None = None,
               cume_col: str | None = None):
    """SQL ``rank()`` and ``dense_rank()`` ``OVER (PARTITION BY key
    ORDER BY order_col [DESC])`` — ties share a rank; rank() leaves
    gaps after ties, dense_rank() doesn't. Optionally also emits
    ``percent_rank()`` ((rank−1)/(n−1); 0 for single-row keys) and
    ``cume_dist()`` (rows ≤ current / n) — exact double divisions of
    the same integers SQL divides, so no rounding is needed.

    One bucketed shuffle; inside the bucket every output falls out of
    the (key, value) run-length structure of the sorted frame: rank =
    run start − key start + 1; dense rank = run index − runs before
    the key's first row + 1. Vectorized across all keys in the bucket.
    """
    import pandas as pd

    from ..util import pin_for_shuffle
    from .sessionize import _with_bucket

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_bucket"]).sort_values(
            [key, order_col], ascending=[True, not descending],
            kind="mergesort").reset_index(drop=True)
        n = len(df)
        if n == 0:
            for c in (rank_col, dense_col):
                df[c] = np.array([], dtype=np.int64)
            for c in (percent_col, cume_col):
                if c:
                    df[c] = np.array([], dtype=np.float64)
            return df
        kv, ov = df[key], df[order_col]
        new_key = ~kv.eq(kv.shift(1)).to_numpy(dtype=bool)
        new_run = new_key | ~ov.eq(ov.shift(1)).to_numpy(dtype=bool)
        key_starts = np.flatnonzero(new_key)
        counts = np.diff(np.append(key_starts, n))
        key_start = np.repeat(key_starts, counts)
        run_start = np.maximum.accumulate(
            np.where(new_run, np.arange(n, dtype=np.int64), -1))
        run_id = np.cumsum(new_run) - 1           # 0-based global run index
        rank = run_start - key_start + 1
        df[rank_col] = rank
        df[dense_col] = run_id - run_id[key_start] + 1
        if percent_col or cume_col:
            key_n = np.repeat(counts, counts).astype(np.float64)
            if percent_col:
                with np.errstate(invalid="ignore"):
                    pr = (rank - 1) / (key_n - 1)
                df[percent_col] = np.where(key_n == 1, 0.0, pr)
            if cume_col:
                run_starts = np.flatnonzero(new_run)
                run_counts = np.diff(np.append(run_starts, n))
                run_end = np.repeat(run_starts + run_counts, run_counts)
                df[cume_col] = (run_end - key_start) / key_n
        return df

    return (pin_for_shuffle(_with_bucket(ds, key, num_buckets))
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def rolling_distinct_count(ds, day_col: str, id_col: str, *,
                           window: int, out: str = "n_distinct",
                           num_buckets: int = 32):
    """Rolling ``window``-day COUNT(DISTINCT id): for each OBSERVED day
    d, the number of distinct ids seen in [d-window+1, d] — the rolling
    WAU/MAU metric. A windowed DISTINCT is not decomposable into
    partial sums (the same id must not double-count across days), so
    the distributed shape is the expansion trick: each locally-distinct
    (id, day) pair fans out to the ``window`` target days it covers,
    and one exact count-distinct per target day finishes the job.

    Scale shape: batches dedup (id, day) map-side BEFORE the xW fan-out
    (the expansion factor is the window length, a small constant);
    targets outside the observed-day set are dropped map-side against a
    broadcast sorted day array (days are bounded — years of data is
    thousands of int64s); the final exchange is count_distinct's,
    bounded by distinct (day, id) pairs x W, never raw rows. Input
    ``ds`` is consumed twice (once for the tiny observed-day table,
    once for the expansion) and is pinned here so upstream work runs
    once.

    Output columns: ``<day_col>`` (int64), ``<out>`` (int64).
    """
    import pandas as pd

    from ..aggregate.relational import count_distinct, hash_aggregate
    from ..util import pin_for_shuffle

    ds = pin_for_shuffle(ds)
    days_df = hash_aggregate(ds, day_col, {"_n": (None, "count")},
                             num_buckets=4).to_pandas()
    observed = np.sort(days_df[day_col].to_numpy(dtype=np.int64))
    w = int(window)

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[id_col, day_col]].drop_duplicates()
        ids = np.repeat(df[id_col].to_numpy(), w)
        base = np.repeat(df[day_col].to_numpy(dtype=np.int64), w)
        t = base + np.tile(np.arange(w, dtype=np.int64), len(df))
        keep = np.isin(t, observed)
        return pd.DataFrame({day_col: t[keep], id_col: ids[keep]})

    expanded = ds.map_batches(expand, batch_format="pandas")
    res = count_distinct(expanded, day_col, id_col, out=out,
                         num_buckets=num_buckets)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df[day_col] = df[day_col].astype(np.int64)
        df[out] = df[out].astype(np.int64)
        return df

    return res.map_batches(fin, batch_format="pandas")
