"""Generic scalable grouped aggregation: the canonical Ray Data shape.

``hash_aggregate(ds, keys, spec)`` implements groupby-aggregate as:

1. map-side partial aggregation per batch (vectorized pandas groupby ->
   one partial row per (key, batch): sums/counts/mins/maxs only);
2. ONE shuffle grouped by ``hash(keys) % num_buckets`` (bounded key
   cardinality per reducer; a hot key still costs one partial per batch);
3. vectorized combine + finalize per bucket (mean = sum/count etc.).

This replaces Ray's builtin ``groupby().aggregate(...)`` in every query
pipeline: the builtin pays per-group Python overhead (measured ~50x slower
at 15k groups) and shuffles raw rows instead of partials.

spec: ``{out_col: (in_col | None, fn)}`` with fn in
{'sum', 'count', 'mean', 'min', 'max'}; in_col None only for 'count'.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.hashing import fnv1a_64

_PARTIAL_FNS = {"sum": "sum", "count": "count", "mean": None, "min": "min", "max": "max"}


def _partial_spec(spec):
    """Expand user spec into partial columns (mean -> sum + count)."""
    partial = {}   # partial_col -> (in_col, partial_fn)
    final = {}     # out_col -> ('direct', partial_col) | ('div', num, den)
    for out, (col, fn) in spec.items():
        if fn not in _PARTIAL_FNS:
            raise ValueError(f"unsupported agg {fn!r}")
        if fn == "mean":
            s, c = f"__{out}_sum", f"__{out}_cnt"
            partial[s] = (col, "sum")
            partial[c] = (col, "count")
            final[out] = ("div", s, c)
        elif fn == "count":
            partial[f"__{out}"] = (col, "count")
            final[out] = ("direct", f"__{out}")
        else:
            partial[f"__{out}"] = (col, fn)
            final[out] = ("direct", f"__{out}")
    return partial, final


def _key_bucket(df: pd.DataFrame, keys: list[str], num_buckets: int) -> np.ndarray:
    rep = df[keys[0]].astype(str)
    for k in keys[1:]:
        rep = rep + "\x1f" + df[k].astype(str)
    h = fnv1a_64(pa.array(rep.to_numpy(dtype=object), type=pa.string()))
    return (h % np.uint64(num_buckets)).astype(np.int64)


def hash_aggregate(ds, keys: list[str] | str, spec: dict, *, num_buckets: int = 32):
    keys = [keys] if isinstance(keys, str) else list(keys)
    partial, final = _partial_spec(spec)

    def map_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, as_index=False, dropna=False, observed=True)
        parts = []
        for pcol, (col, fn) in partial.items():
            if fn == "count":
                agg = (g.size().rename(columns={"size": pcol}) if col is None
                       else g[col].count().rename(columns={col: pcol}))
            else:
                agg = g[col].agg(fn).rename(columns={col: pcol})
            parts.append(agg.set_index(keys))
        out = pd.concat(parts, axis=1).reset_index()
        out["_bucket"] = _key_bucket(out, keys, num_buckets)
        return out

    # combine partials: sum for sum/count partials, min/max for min/max
    combine_fns = {}
    for pcol, (_, fn) in partial.items():
        combine_fns[pcol] = "sum" if fn in ("sum", "count") else fn

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.drop(columns=["_bucket"])
               .groupby(keys, as_index=False, dropna=False, observed=True)
               .agg(combine_fns))
        for out_col, how in final.items():
            if how[0] == "direct":
                out[out_col] = out[how[1]]
            else:
                with np.errstate(invalid="ignore", divide="ignore"):
                    out[out_col] = out[how[1]] / out[how[2]].replace(0, np.nan)
        return out[keys + list(final.keys())]

    return (ds.map_batches(map_partial, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(combine, batch_format="pandas"))


def broadcast_lookup(ds, lookup: pd.DataFrame, on: str, cols: list[str]):
    """Broadcast hash join: attach ``cols`` from a small dimension table
    (the reference's T3/J3 raster-value lookup shape) — no shuffle."""
    import ray

    ref = ray.put({c: lookup.set_index(on)[c].to_dict() for c in cols})

    class Lookup:
        def __init__(self):
            self.maps = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            for c, m in self.maps.items():
                df[c] = df[on].map(m)
            return df

    return ds.map_batches(Lookup, batch_format="pandas", concurrency=2, num_cpus=0.5)


def hash_join(left, right, on: str | list[str], how: str = "inner", *,
              num_buckets: int = 32, suffix: str = "_r"):
    """Partitioned hash join for two LARGE datasets (the portable Ray Data
    pattern: add ``bucket = hash(key) % B`` to both sides, group by
    bucket, pandas-merge within each bucket — one shuffle per side, no
    driver materialization). Broadcast-join the small side instead
    (``broadcast_lookup``) when one side fits in memory.

    Rows from ``left`` and ``right`` are tagged and unioned so ONE keyed
    exchange co-locates both sides of each bucket.
    """
    on = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(how)
    lcols = list(left.schema().names)
    rcols = list(right.schema().names)
    # disambiguate right columns that CONFLICT with left ones (pandas
    # suffix semantics: non-conflicting names pass through unchanged)
    rmap = {c: (c + suffix if (c not in on and c in lcols) else c)
            for c in rcols}
    rcols_out = [rmap[c] for c in rcols]
    all_cols = lcols + [c for c in rcols_out if c not in lcols]

    def tag(side: str, rename: dict | None):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.rename(columns=rename) if rename else df.copy()
            for c in all_cols:          # align schemas for the union
                if c not in df.columns:
                    df[c] = None
            df = df[all_cols]
            df["_side"] = side
            df["_bucket"] = _key_bucket(df, on, num_buckets)
            return df
        return fn

    both = left.map_batches(tag("l", None), batch_format="pandas").union(
        right.map_batches(tag("r", rmap), batch_format="pandas"))

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # None-padding for the union leaves object dtype; restore natives
        l = df[df._side == "l"][lcols].infer_objects()
        r = df[df._side == "r"][rcols_out].infer_objects()
        if how == "semi":
            return l[l.set_index(on).index.isin(r.set_index(on).index)]
        if how == "anti":
            return l[~l.set_index(on).index.isin(r.set_index(on).index)]
        return l.merge(r, on=on, how=how)

    return both.groupby("_bucket").map_groups(join_bucket, batch_format="pandas")


def subsample_every_k(ds, k: int, index_col: str):
    """Deterministic 1-in-k subsample by an index column (the reference's
    GDEM decimation, make_raster_region_maps.py:129-133) — a filter, not a
    random sample: reproducible across runs/cluster sizes."""
    import pyarrow as _pa

    def f(b: _pa.Table) -> _pa.Table:
        idx = np.asarray(b[index_col]).astype(np.int64)
        return b.filter(_pa.array(idx % k == 0))

    return ds.map_batches(f, batch_format="pyarrow")


def topk(ds, by: str, k: int, *, descending: bool = True, tie_col: str | None = None):
    """Global top-k without a global sort: per-batch partial top-k, then a
    single tiny combine (same shape as partial aggregation)."""
    asc_main = not descending

    def local(df: pd.DataFrame) -> pd.DataFrame:
        cols = [by] + ([tie_col] if tie_col else [])
        asc = [asc_main] + ([True] if tie_col else [])
        return df.sort_values(cols, ascending=asc, kind="mergesort").head(k)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return local(df.drop(columns="_one"))

    partials = ds.map_batches(local, batch_format="pandas")
    return (partials.map_batches(lambda df: df.assign(_one=0), batch_format="pandas")
            .groupby("_one").map_groups(merge, batch_format="pandas"))
