"""Skew diagnostics before a wide operation (SURVEY.md §4 "detect skew
from per-partition counts"): measure how a key column will distribute
over a bucketed shuffle BEFORE paying for the shuffle, and get a
concrete salting recommendation.

Two bounded passes, no exchange of the input:

1. bucket histogram — one streamed pass folds per-batch
   ``hash(key) % B`` counts into a length-B vector (tree-foldable, but B
   is small so per-batch partial rows suffice);
2. exact hot keys — :func:`aggregate.frequent.heavy_hitters` (pigeonhole
   candidates + broadcast recount; the input is never shuffled).

Output is a plain dict the caller can log or act on: the standard fix
for a hot key is salting — rewrite the key to ``(key, hash(row) % S)``
for the partial aggregate, then combine on ``key`` (the flagship's
map-side partial aggregation does this implicitly; explicit salting is
for operators whose per-key state can't pre-combine).

Reference analog: none — the reference has no skew story (SURVEY §4:
hot cells "just take longer"); at 10^12 rows a single hot key is an
outage, so diagnosis is a first-class operation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


KEY_SEP = "\x1f"


def _pack_key_strings(df: pd.DataFrame, keys: list[str]) -> np.ndarray:
    """Composite key -> one string per row (unit-separator joined),
    vectorized per column. Injective as long as no component's string
    form contains the separator (true for numerics; arbitrary text
    keys would need escaping — diagnosis tolerates the collision)."""
    s = df[keys[0]].astype(str)
    for k in keys[1:]:
        s = s + KEY_SEP + df[k].astype(str)
    return s.to_numpy()


def diagnose_skew(ds, key: str | list[str], *, num_buckets: int = 64,
                  hot_k: int = 100) -> dict:
    """-> dict with total_rows, per-bucket stats (max/mean/imbalance),
    exact hot keys above support ``1/hot_k``, and a recommended salt
    factor per hot key (ceil(key_count / mean_bucket_rows))."""
    from ..aggregate.frequent import heavy_hitters
    from ..aggregate.relational import _key_bucket

    keys = [key] if isinstance(key, str) else list(key)

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        b = _key_bucket(df, keys, num_buckets)
        return pd.DataFrame(
            {"bucket": np.arange(num_buckets, dtype=np.int64),
             "n": np.bincount(b, minlength=num_buckets).astype(np.int64)})

    parts = ds.map_batches(bucket_counts, batch_format="pandas").to_pandas()
    hist = parts.groupby("bucket")["n"].sum().reindex(
        range(num_buckets), fill_value=0).to_numpy()
    total = int(hist.sum())
    mean_bucket = total / num_buckets if num_buckets else 0.0

    if len(keys) == 1:
        hot = heavy_hitters(ds, keys[0], hot_k)
        hot = hot.rename(columns={hot.columns[0]: "key"})
    else:
        # composite keys: EXACT — pack the components into one string
        # key map-side (unit-separator joined, the reverse of what a
        # first-component-only diagnosis would see: a composite key can
        # be hot while every individual component is uniform) and run
        # the same pigeonhole + broadcast recount over the packed key.
        hot = heavy_hitters(
            ds.map_batches(lambda df: pd.DataFrame(
                {"_packed_key": _pack_key_strings(df, keys)}),
                batch_format="pandas"),
            "_packed_key", hot_k)
        hot = hot.rename(columns={"_packed_key": "key"})
    hot = hot.sort_values("n", ascending=False).reset_index(drop=True)
    if mean_bucket > 0:
        hot["salt_factor"] = np.ceil(
            hot["n"].to_numpy(dtype=np.float64) / mean_bucket
        ).astype(np.int64)
    else:
        hot["salt_factor"] = np.int64(0)

    return {
        "total_rows": total,
        "num_buckets": num_buckets,
        "mean_bucket_rows": mean_bucket,
        "max_bucket_rows": int(hist.max()) if len(hist) else 0,
        "imbalance": (float(hist.max() / mean_bucket)
                      if mean_bucket else 0.0),
        "bucket_hist": hist,
        "hot_keys": hot,        # (key, n, salt_factor), < hot_k rows
    }
