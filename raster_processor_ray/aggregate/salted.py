"""Diagnosis-driven hot-key salting for grouped kernels whose per-key
state can NOT pre-combine map-side (SURVEY.md §4's skew design; the
flagship's partial aggregation salts implicitly, this is the explicit
path for everything else).

A plain ``groupby(key).map_groups(fn)`` ships EVERY row of a key to one
task: at 10^12 rows a 20%-hot key is an outage, not a slow task. The
standard fix is salting — rewrite the key to ``(key, salt)`` for a
first reduction, then combine the bounded per-salt results on ``key``.
Salting is only correct when the kernel decomposes into a partial +
merge pair (top-k, count/sum/min/max, sketches, set unions); this
module makes the caller supply exactly that pair.

Reference analog: none — the reference has no skew story (SURVEY §4:
hot cells "just take longer").
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..geo.hashing import splitmix64


def auto_salt_groupby(ds, key: str, partial_fn, combine_fn, *,
                      salt_on: str, diagnosis: dict | None = None,
                      num_buckets: int = 64, hot_k: int = 100,
                      max_salt: int = 64):
    """Skew-mitigated ``groupby(key) -> map_groups`` two-stage plan.

    - ``partial_fn(group_df) -> df``: the per-group reduction, applied
      to each (key, salt) slice. Its output must be mergeable.
    - ``combine_fn(group_df) -> df``: merges one key's partial outputs
      (concatenated) into the final rows for that key. For results
      identical to the unsalted groupby the pair must satisfy
      ``combine(concat(partial(g_i))) == combine(partial(g))`` for any
      partition {g_i} of g — associative reductions with a merge step.
    - ``salt_on``: an int64 column whose per-row hash provides the
      DETERMINISTIC salt (reruns and resumes see identical groups;
      never salt on position, which shuffles differently every run).

    The salt factor per hot key comes from :func:`state.diagnose.
    diagnose_skew` (or a caller-precomputed ``diagnosis``): keys with
    ``salt_factor > 1`` — counts above the mean shuffle bucket — are
    split into ``min(salt_factor, max_salt)`` salt slices; every other
    key keeps salt 0, so cold keys pay one extra bounded exchange of
    already-reduced partials and nothing else. The hot-key map is
    broadcast once (``ray.put``), never joined.
    """
    import ray

    from ..state.diagnose import diagnose_skew
    from ..util import pin_for_shuffle

    diag = diagnosis if diagnosis is not None else diagnose_skew(
        ds, key, num_buckets=num_buckets, hot_k=hot_k)
    hk = diag["hot_keys"]
    hot = {k: int(min(s, max_salt))
           for k, s in zip(hk["key"], hk["salt_factor"]) if s > 1}
    hot_ref = ray.put(hot)

    def add_salt(df: pd.DataFrame) -> pd.DataFrame:
        hotmap = ray.get(hot_ref)
        salt = np.zeros(len(df), dtype=np.int64)
        if hotmap:
            m = df[key].isin(hotmap).to_numpy()
            if m.any():
                fac = df[key][m].map(hotmap).to_numpy(dtype=np.uint64)
                h = splitmix64(
                    df[salt_on].to_numpy(dtype=np.int64)[m].astype(np.uint64))
                salt[m] = (h % fac).astype(np.int64)
        out = df.copy(deep=False)
        out["_salt"] = salt
        return out

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        return partial_fn(g.drop(columns=["_salt"]))

    stage1 = (pin_for_shuffle(ds.map_batches(add_salt, batch_format="pandas"))
              .groupby([key, "_salt"])
              .map_groups(partial, batch_format="pandas"))
    return (pin_for_shuffle(stage1)
            .groupby(key)
            .map_groups(combine_fn, batch_format="pandas"))
