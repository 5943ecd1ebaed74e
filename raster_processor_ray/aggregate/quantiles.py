"""Exact distributed discrete quantiles (A-family extension).

Shape: map-side (key, value) COUNT partials (the same bounded-partial
idea as rasterize's per-cell combine) -> one bucketed exchange keyed on
hash(key) -> per-key sorted cumulative pick, vectorized across every
key in the bucket. Shuffle rows are bounded by distinct (key, value)
pairs — for continuous domains callers pre-round/bucketize the value
column (e.g. cents), which keeps the histogram bounded regardless of
input row count. No global sort, no per-key Python, no driver state.

Definition (deterministic, mirrored exactly by the SQL oracle with
window functions — NOT the builtin quantile_*, whose interpolation
rules differ across engines): the q-quantile of n values is the
smallest v whose cumulative count reaches ceil(q * n), i.e.
``percentile_disc`` with lower-bound rounding; q=0.5 gives the lower
median.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def quantile_disc(ds, keys, value_col: str, qs, *, num_buckets: int = 32):
    """-> one row per key with a ``q_<quantile>`` column per requested q
    (e.g. qs=(0.5, 0.9) -> columns q_50, q_90).

    ``value_col`` must be a bounded/discretized domain (ints, rounded
    floats): the exchange carries one row per distinct (key, value).
    """
    from ..util import pin_for_shuffle
    from .relational import _key_bucket, hash_aggregate

    keys = [keys] if isinstance(keys, str) else list(keys)
    qs = [qs] if isinstance(qs, float) else list(qs)
    qcols = [f"q_{int(round(q * 100)):02d}" for q in qs]

    counts = hash_aggregate(ds, keys + [value_col], {"c": (None, "count")},
                            num_buckets=num_buckets)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_bucket"] = _key_bucket(df, keys, num_buckets)
        return df

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized per-key quantile pick over the bucket's histogram:
        sort by (key, value), per-key cumulative counts via one cumsum
        rebased at key starts, then for each q the FIRST row whose
        cumulative count reaches ceil(q * total)."""
        df = df.drop(columns=["_bucket"]).sort_values(
            keys + [value_col], kind="mergesort").reset_index(drop=True)
        n = len(df)
        if n == 0:
            return pd.DataFrame(columns=keys + qcols)
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
        cum = cs - base                       # per-key cumulative counts
        totals = cum[starts + sizes - 1]
        out = df.iloc[starts][keys].reset_index(drop=True)
        vals = df[value_col].to_numpy()
        grp = np.repeat(np.arange(len(starts)), sizes)
        for q, qc in zip(qs, qcols):
            need = np.ceil(q * totals).astype(np.int64).clip(min=1)
            pos = np.flatnonzero(cum >= need[grp])  # monotone within key
            g = grp[pos]
            keep = np.r_[True, g[1:] != g[:-1]]     # first hit per key
            first_idx = np.empty(len(starts), dtype=np.int64)
            first_idx[g[keep]] = pos[keep]
            out[qc] = vals[first_idx]
        return out

    tagged = pin_for_shuffle(counts.map_batches(add_bucket,
                                                batch_format="pandas"))
    return tagged.groupby("_bucket").map_groups(pick, batch_format="pandas")


def quantile_cont(ds, keys, value_col: str, qs, *, num_buckets: int = 32):
    """INTERPOLATED quantiles (percentile_cont semantics, matching the
    DuckDB/Postgres ``quantile_cont`` definition): position
    ``q * (n - 1)`` in the 0-based sorted order, linear interpolation
    between the two bracketing values. Same bounded-histogram exchange
    as :func:`quantile_disc`; emits ``cq_<pct>`` float64 columns."""
    from ..util import pin_for_shuffle
    from .relational import _key_bucket, hash_aggregate

    keys = [keys] if isinstance(keys, str) else list(keys)
    qs = [qs] if isinstance(qs, float) else list(qs)
    qcols = [f"cq_{int(round(q * 100)):02d}" for q in qs]

    counts = hash_aggregate(ds, keys + [value_col], {"c": (None, "count")},
                            num_buckets=num_buckets)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_bucket"] = _key_bucket(df, keys, num_buckets)
        return df

    def _first_reaching(cum, grp, need_rep, n_groups):
        pos = np.flatnonzero(cum >= need_rep)
        g = grp[pos]
        keep = np.r_[True, g[1:] != g[:-1]]
        first_idx = np.empty(n_groups, dtype=np.int64)
        first_idx[g[keep]] = pos[keep]
        return first_idx

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_bucket"]).sort_values(
            keys + [value_col], kind="mergesort").reset_index(drop=True)
        n = len(df)
        if n == 0:
            return pd.DataFrame(columns=keys + qcols)
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
        cum = cs - base
        totals = cum[starts + sizes - 1]
        grp = np.repeat(np.arange(len(starts)), sizes)
        vals = df[value_col].to_numpy(dtype=np.float64)
        out = df.iloc[starts][keys].reset_index(drop=True)
        for q, qc in zip(qs, qcols):
            pos_f = q * (totals - 1).astype(np.float64)   # 0-based rank
            lo = np.floor(pos_f).astype(np.int64)
            frac = pos_f - lo
            v_lo = vals[_first_reaching(cum, grp, (lo + 1)[grp],
                                        len(starts))]
            hi = np.minimum(lo + 1, totals - 1)
            v_hi = vals[_first_reaching(cum, grp, (hi + 1)[grp],
                                        len(starts))]
            out[qc] = v_lo + frac * (v_hi - v_lo)
        return out

    tagged = pin_for_shuffle(counts.map_batches(add_bucket,
                                                batch_format="pandas"))
    return tagged.groupby("_bucket").map_groups(pick, batch_format="pandas")
