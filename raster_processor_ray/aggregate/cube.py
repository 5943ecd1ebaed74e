"""CUBE grouping-set aggregates: every subset of the key list.

Same contract and scale shape as the ROLLUP sibling (rollup.py): the
input is scanned ONCE — one distributed hash_aggregate at the finest
level — and all 2^n − 1 coarser grouping sets are re-aggregated from
that bounded G-row result on the driver (additive aggregates only).
Grouping columns outside a set carry the ``total_label`` sentinel, so
the oracle is ``coalesce(col, label)`` over SQL ``GROUP BY CUBE``.

The driver fold is O(2^n · G); n is the number of grouping COLUMNS
(2–4 in practice), never data-sized.
"""

from __future__ import annotations

import pandas as pd

from .relational import hash_aggregate
from .rollup import _ADDITIVE


def grouping_sets_aggregate(ds, keys: list[str], sets: list[list[str]],
                            spec: dict, *, total_label: str = "ALL",
                            num_buckets: int = 32):
    """ANSI ``GROUP BY GROUPING SETS``: aggregate at each listed subset
    of ``keys``. The input is scanned ONCE (one distributed
    hash_aggregate at the union-finest level over all of ``keys``);
    every requested set re-aggregates from that bounded G-row result —
    additive aggregates only. Grouping columns absent from a set carry
    ``total_label`` (oracle: ``coalesce(col, label)``).

    NOTE: a set must use columns from ``keys``; the finest pass groups
    by ALL of ``keys``, which is only correct when every requested set
    is a subset of it (always true by construction here)."""
    keys = list(keys)
    for out, (_, agg) in spec.items():
        if agg not in _ADDITIVE:
            raise ValueError(f"{out}: grouping sets need an additive "
                             f"aggregate, got {agg!r} (derive means from "
                             "sum/count)")
    for st in sets:
        unknown = set(st) - set(keys)
        if unknown:
            raise ValueError(f"grouping set {st} uses non-key {unknown}")
    finest = hash_aggregate(ds, keys, spec, num_buckets=num_buckets).to_pandas()
    finest[keys] = finest[keys].astype(str)

    refold = {out: _ADDITIVE[spec[out][1]] for out in spec}
    blocks = []
    for st in sets:
        kept = [k for k in keys if k in st]     # canonical key order
        if len(kept) == len(keys):
            lvl = finest.copy()
        elif not kept:
            lvl = finest.agg(refold).to_frame().T
        else:
            lvl = (finest.groupby(kept, as_index=False, sort=False)
                   .agg(refold))
        for k in keys:
            if k not in kept:
                lvl[k] = total_label
        blocks.append(lvl[keys + list(spec)])
    out = pd.concat(blocks, ignore_index=True)
    for c, (_, agg) in spec.items():
        if agg == "count":
            out[c] = out[c].astype("int64")
    return out


def cube_aggregate(ds, keys: list[str], spec: dict, *,
                   total_label: str = "ALL", num_buckets: int = 32):
    """``spec``: {out_col: (in_col|None, agg)} with agg in
    count/sum/min/max. Returns a pandas DataFrame with one block of
    rows per grouping set (finest first, grand total last); grouping
    columns are strings at every level so the sentinel fits.

    CUBE == grouping sets over every subset of ``keys``."""
    keys = list(keys)
    sets = [[k for i, k in enumerate(keys) if mask >> i & 1]
            for mask in range((1 << len(keys)) - 1, -1, -1)]
    return grouping_sets_aggregate(ds, keys, sets, spec,
                                   total_label=total_label,
                                   num_buckets=num_buckets)
