"""Hierarchical (ROLLUP) aggregates: every prefix level of the key list.

Reference analog: the raster summary roll-ups (qual bit summaries are
aggregated per-cell AND globally, raster_proc.py's aggregate_*_qual
family); generalized to SQL ``GROUP BY ROLLUP(k1, .., kn)``.

Scale shape: the INPUT is scanned exactly once — one distributed
``hash_aggregate`` at the finest level — and every coarser level is
re-aggregated from that bounded result (additive aggregates only:
count/sum/min/max; means come from sum÷count at render time). The
driver-side fold is over G rows where G = distinct finest groups (key
cardinality product, never input rows) — the same bounded-collect
contract as the grid-bounds folds (pipelines/utm_raster.py). Grouping
columns at coarser levels are filled with ``total_label`` (a sentinel,
not NULL, so sort/hash semantics match the oracle's
``coalesce(col, label)`` exactly).
"""

from __future__ import annotations

import pandas as pd

from .relational import hash_aggregate

_ADDITIVE = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}


def rollup_aggregate(ds, keys: list[str], spec: dict, *,
                     total_label: str = "ALL", level_col: str | None = None,
                     num_buckets: int = 32):
    """``spec``: {out_col: (in_col|None, agg)} with agg in
    count/sum/min/max (hash_aggregate's additive subset). Returns a
    pandas DataFrame with one block of rows per rollup level
    (finest .. grand total); grouping columns are strings at every
    level so the sentinel fits.
    """
    keys = list(keys)
    for out, (_, agg) in spec.items():
        if agg not in _ADDITIVE:
            raise ValueError(f"{out}: ROLLUP needs an additive aggregate, "
                             f"got {agg!r} (derive means from sum/count)")
    finest = hash_aggregate(ds, keys, spec, num_buckets=num_buckets).to_pandas()
    finest[keys] = finest[keys].astype(str)

    refold = {out: _ADDITIVE[spec[out][1]] for out in spec}
    levels = []
    for j in range(len(keys), -1, -1):
        if j == len(keys):
            lvl = finest.copy()
        elif j == 0:
            lvl = finest.agg(refold).to_frame().T
            for k in keys:
                lvl[k] = total_label
        else:
            lvl = (finest.groupby(keys[:j], as_index=False, sort=False)
                   .agg(refold))
            for k in keys[j:]:
                lvl[k] = total_label
        if level_col is not None:
            lvl[level_col] = j
        levels.append(lvl[keys + list(spec) +
                          ([level_col] if level_col else [])])
    out = pd.concat(levels, ignore_index=True)
    for c, (_, agg) in spec.items():
        if agg == "count":
            out[c] = out[c].astype("int64")
    return out
