"""Time-gap segmentation / sessionization (SURVEY.md §2.9).

The reference's only stream-like op: radar lines are grouped into
contiguous runs split where the time gap exceeds
``missing_karin_data_time_thresh`` (``_group_by_diff``,
raster_proc.py:744-753; run-groupby at 810-817).

Generalized: per-key sessionization of an event log — partition by key
(the one shuffle), sort by ts within the group, split where
``ts - prev_ts > gap``; assign ``session_id`` and/or aggregate per session.
Ordering assumption: only *within* a key's group (provided by map_groups
after the keyed shuffle), never across blocks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def sessionize_group(df: pd.DataFrame, ts_col: str, gap) -> pd.DataFrame:
    df = df.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
    ts = df[ts_col]
    new = (ts - ts.shift(1)) > gap
    df["session_seq"] = new.cumsum().astype(np.int64)
    return df


def sessionize(ds, key: str, ts_col: str, gap):
    """events -> events + ``session_seq`` (0-based per key).

    ``gap``: a numeric delta or pandas Timedelta matching ``ts_col``'s type.
    """
    from ..util import pin_for_shuffle

    return pin_for_shuffle(ds).groupby(key).map_groups(
        lambda df: sessionize_group(df, ts_col, gap), batch_format="pandas")


def session_stats(ds, key: str, ts_col: str, gap, value_col: str | None = None):
    """Per-session aggregate: n_events, start/end ts, optional value sum."""

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        df = sessionize_group(df, ts_col, gap)
        aggs = {ts_col: ["min", "max", "count"]}
        if value_col:
            aggs[value_col] = ["sum"]
        g = df.groupby("session_seq").agg(aggs)
        g.columns = ["session_start", "session_end", "n_events"] + (
            ["sum_value"] if value_col else [])
        g = g.reset_index()
        g.insert(0, key, df[key].iloc[0])
        return g

    from ..util import pin_for_shuffle

    return pin_for_shuffle(ds).groupby(key).map_groups(per_key, batch_format="pandas")
