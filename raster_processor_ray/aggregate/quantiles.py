"""Exact distributed discrete + interpolated quantiles (A-family ext).

Shape: map-side (key, value) COUNT partials (the same bounded-partial
idea as rasterize's per-cell combine) bucketed by hash(KEY) -> ONE
exchange -> per-bucket partial-merge + per-key sorted cumulative pick,
vectorized across every key in the bucket. Shuffle rows are bounded by
distinct (key, value) pairs per batch — for continuous domains callers
pre-round/bucketize the value column (e.g. cents), which keeps the
histogram bounded regardless of input row count. No global sort, no
per-key Python, no driver state.

(Earlier shape was TWO exchanges — a full hash_aggregate on
(key, value) and then a re-bucket by key for the pick. Bucketing the
partials by key from the start lets the single combine task both merge
duplicate (key, value) partials and pick the quantiles: the histogram
of one key always lands in one bucket.)

Definition (deterministic, mirrored exactly by the SQL oracle with
window functions — NOT the builtin quantile_*, whose interpolation
rules differ across engines): the q-quantile of n values is the
smallest v whose cumulative count reaches ceil(q * n), i.e.
``percentile_disc`` with lower-bound rounding; q=0.5 gives the lower
median. ``quantile_cont`` interpolates at position q*(n-1)
(percentile_cont / DuckDB quantile_cont semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _per_key_layout(df: pd.DataFrame, keys: list[str]):
    """(starts, sizes, cum, totals, grp) over a frame sorted by
    (keys, value) with a summed count column ``c``."""
    n = len(df)
    c = df["c"].to_numpy(dtype=np.int64)
    key_change = np.zeros(n, dtype=bool)
    key_change[0] = True
    for k in keys:
        kv = df[k].to_numpy()
        key_change[1:] |= kv[1:] != kv[:-1]
    starts = np.flatnonzero(key_change)
    sizes = np.diff(np.append(starts, n))
    cs = np.cumsum(c)
    base = np.repeat(np.r_[np.int64(0), cs[starts[1:] - 1]], sizes)
    cum = cs - base                      # per-key cumulative counts
    totals = cum[starts + sizes - 1]
    grp = np.repeat(np.arange(len(starts)), sizes)
    return starts, sizes, cum, totals, grp


def _first_reaching(cum, grp, need_rep, n_groups):
    """Index of the FIRST row per key whose cumulative count reaches the
    key's (repeated) requirement — cum is monotone within a key."""
    pos = np.flatnonzero(cum >= need_rep)
    g = grp[pos]
    keep = np.r_[True, g[1:] != g[:-1]]
    first_idx = np.empty(n_groups, dtype=np.int64)
    first_idx[g[keep]] = pos[keep]
    return first_idx


def _quantile_exchange(ds, keys: list[str], value_col: str, pick,
                       num_buckets: int):
    """Shared single-exchange core: map-side per-batch (key, value)
    histograms bucketed by hash(key); the combine task merges duplicate
    partials and runs ``pick`` on the per-bucket sorted histogram."""
    from ..util import pin_for_shuffle
    from .relational import _key_bucket

    def map_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(keys + [value_col], as_index=False, dropna=False,
                          observed=True).size().rename(columns={"size": "c"}))
        out["_bucket"] = _key_bucket(out, keys, num_buckets)
        return out

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        hist = (df.drop(columns=["_bucket"])
                .groupby(keys + [value_col], as_index=False, dropna=False,
                         observed=True)["c"].sum()
                .sort_values(keys + [value_col], kind="mergesort")
                .reset_index(drop=True))
        return pick(hist)

    partials = pin_for_shuffle(ds.map_batches(map_partial,
                                              batch_format="pandas"))
    return (partials.groupby("_bucket")
            .map_groups(combine, batch_format="pandas"))


def quantile_disc(ds, keys, value_col: str, qs, *, num_buckets: int = 32):
    """-> one row per key with a ``q_<quantile>`` column per requested q
    (e.g. qs=(0.5, 0.9) -> columns q_50, q_90).

    ``value_col`` must be a bounded/discretized domain (ints, rounded
    floats): the exchange carries one row per distinct (key, value).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    qs = [qs] if isinstance(qs, float) else list(qs)
    qcols = [f"q_{int(round(q * 100)):02d}" for q in qs]

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(columns=keys + qcols)
        starts, sizes, cum, totals, grp = _per_key_layout(df, keys)
        out = df.iloc[starts][keys].reset_index(drop=True)
        vals = df[value_col].to_numpy()
        for q, qc in zip(qs, qcols):
            need = np.ceil(q * totals).astype(np.int64).clip(min=1)
            out[qc] = vals[_first_reaching(cum, grp, need[grp], len(starts))]
        return out

    return _quantile_exchange(ds, keys, value_col, pick, num_buckets)


def quantile_cont(ds, keys, value_col: str, qs, *, num_buckets: int = 32):
    """INTERPOLATED quantiles (percentile_cont semantics, matching the
    DuckDB/Postgres ``quantile_cont`` definition): position
    ``q * (n - 1)`` in the 0-based sorted order, linear interpolation
    between the two bracketing values. Same bounded-histogram exchange
    as :func:`quantile_disc`; emits ``cq_<pct>`` float64 columns."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    qs = [qs] if isinstance(qs, float) else list(qs)
    qcols = [f"cq_{int(round(q * 100)):02d}" for q in qs]

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(columns=keys + qcols)
        starts, sizes, cum, totals, grp = _per_key_layout(df, keys)
        vals = df[value_col].to_numpy(dtype=np.float64)
        out = df.iloc[starts][keys].reset_index(drop=True)
        for q, qc in zip(qs, qcols):
            pos_f = q * (totals - 1).astype(np.float64)   # 0-based rank
            lo = np.floor(pos_f).astype(np.int64)
            frac = pos_f - lo
            v_lo = vals[_first_reaching(cum, grp, (lo + 1)[grp], len(starts))]
            hi = np.minimum(lo + 1, totals - 1)
            v_hi = vals[_first_reaching(cum, grp, (hi + 1)[grp], len(starts))]
            out[qc] = v_lo + frac * (v_hi - v_lo)
        return out

    return _quantile_exchange(ds, keys, value_col, pick, num_buckets)
