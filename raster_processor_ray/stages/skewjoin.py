"""Skew-aware inner join: hot keys broadcast, cold keys shuffled.

The 100-TB join reality: key frequencies are Zipf, and a plain
partitioned hash join sends every row of the hottest key to ONE reducer
— that reducer becomes the job. This operator splits the key space by
measured frequency:

1. detect hot keys with the exact heavy-hitter pass
   (aggregate/frequent.py — two bounded scans of the left side, no
   assumption about the distribution);
2. broadcast the RIGHT-side rows of hot keys once (``ray.put``; they
   are few keys — the hot-key right side must fit in worker memory,
   the same contract as every broadcast join) and merge them into the
   hot left rows map-side, with zero shuffle;
3. the cold remainder goes through the standard partitioned hash join,
   where by construction no reducer sees more than ``count(left)/k``
   rows of any key;
4. union.

Inner-join semantics only (the split makes outer padding ambiguous
between paths). Column layout matches ``hash_join``: right columns that
collide with left ones get ``suffix``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def skew_join(left, right, on: str, *, k: int = 200, suffix: str = "_r",
              num_buckets: int = 32):
    """Inner join robust to Zipf key skew. ``k``: a key is HOT when it
    holds more than 1/k of the left side's rows."""
    import ray

    from ..aggregate.frequent import heavy_hitters
    from ..aggregate.relational import hash_join
    from ..util import pin_for_shuffle

    left = pin_for_shuffle(left)      # scanned three times below
    hot = heavy_hitters(left.select_columns([on]), on, k)
    if len(hot) == 0:
        return hash_join(left, right, on, "inner", suffix=suffix,
                         num_buckets=num_buckets)
    hot_keys = set(hot[on].tolist())
    right = pin_for_shuffle(right)

    def split(table, keep_hot: bool):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            m = df[on].isin(hot_keys)
            return df[m] if keep_hot else df[~m]
        return table.map_batches(f, batch_format="pandas")

    # broadcast the hot slice of the right side (few keys by design)
    right_hot = split(right, True).to_pandas()
    rename = {c: c + suffix for c in right_hot.columns
              if c != on and c in left.schema().names}
    right_hot = right_hot.rename(columns=rename)
    ref = ray.put(right_hot)

    def merge_hot(df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(ray.get(ref), on=on, how="inner", sort=False)

    hot_joined = split(left, True).map_batches(merge_hot,
                                               batch_format="pandas")
    cold_joined = hash_join(split(left, False), split(right, False), on,
                            "inner", suffix=suffix, num_buckets=num_buckets)
    cols = list(left.schema().names) + [
        c for c in right_hot.columns if c != on]

    def align(df: pd.DataFrame) -> pd.DataFrame:
        return df[cols]

    return hot_joined.map_batches(align, batch_format="pandas").union(
        cold_joined.map_batches(align, batch_format="pandas"))
