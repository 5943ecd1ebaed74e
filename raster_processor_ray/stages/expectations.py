"""Declarative data-quality expectations over a Dataset (SURVEY.md §2
extension — the validation-harness idea of the reference's
analysis/metrics.py pass/fail bounds, generalized from raster error
metrics to schema/constraint rules over arbitrary tables, in the shape
of Deequ / Great Expectations, both public designs).

Row-level rules (not_null / range / in_set / regex) evaluate vectorized
per batch and emit per-batch PARTIAL counts — the exchange carries
``rules x blocks`` scalar rows, never data.  ``unique`` is the one rule
that genuinely needs a shuffle (duplicate detection is global); it runs
as the engine's bounded hash aggregate with violations counted as rows
belonging to keys seen more than once.  All outputs are exact int64
counts at any partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


@dataclass(frozen=True)
class Rule:
    """One expectation.  ``kind``: not_null | range | in_set | regex |
    unique.  Nulls violate only ``not_null``; other rules skip them (a
    null is a missing value, not an out-of-range one)."""
    name: str
    col: str
    kind: str
    lo: float | None = None
    hi: float | None = None
    allowed: tuple | None = None
    pattern: str | None = None


def _row_rule_violations(b: pa.Table, r: Rule) -> int:
    col = b[r.col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if r.kind == "not_null":
        return col.null_count
    valid = pc.is_valid(col)
    if r.kind == "range":
        bad = pc.or_(pc.less(col, r.lo), pc.greater(col, r.hi))
    elif r.kind == "in_set":
        bad = pc.invert(pc.is_in(col, value_set=pa.array(list(r.allowed),
                                                         type=col.type)))
    elif r.kind == "regex":
        bad = pc.invert(pc.match_substring_regex(col, r.pattern))
    else:
        raise ValueError(r.kind)
    return int(pc.sum(pc.and_(bad, valid)).as_py() or 0)


def validate_expectations(ds, rules: list[Rule], *, num_buckets: int = 32):
    """-> (rule, n_violations, n_checked) per rule, exact int64.

    One streamed pass covers every row-level rule (partials folded by a
    tiny per-rule aggregate); each ``unique`` rule adds one bounded hash
    aggregate over its key column.  n_checked is the table row count for
    every rule (uniqueness is a property of all rows).
    """
    from ..aggregate.relational import hash_aggregate

    row_rules = [r for r in rules if r.kind != "unique"]
    uniq_rules = [r for r in rules if r.kind == "unique"]

    out_frames = []
    if row_rules:
        def partials(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table({
                "rule": pa.array([r.name for r in row_rules]),
                "v": np.array([_row_rule_violations(b, r)
                               for r in row_rules], dtype=np.int64),
                "c": np.full(len(row_rules), n, dtype=np.int64)})

        agg = hash_aggregate(
            ds.map_batches(partials, batch_format="pyarrow"), "rule",
            {"n_violations": ("v", "sum"), "n_checked": ("c", "sum")},
            num_buckets=8)
        out_frames.append(agg.to_pandas())

    for r in uniq_rules:
        per_key = hash_aggregate(
            ds.map_batches(lambda b, c=r.col: b.select([c]),
                           batch_format="pyarrow"),
            r.col, {"cnt": (None, "count")}, num_buckets=num_buckets)

        def fold(b: pa.Table) -> pa.Table:
            cnt = np.asarray(b["cnt"], dtype=np.int64)
            dup = cnt[cnt > 1]
            return pa.table({"v": np.array([dup.sum()], dtype=np.int64),
                             "c": np.array([cnt.sum()], dtype=np.int64)})

        folded = per_key.map_batches(fold, batch_format="pyarrow").to_pandas()
        v = np.int64(folded["v"].sum()) if not folded.empty else np.int64(0)
        c = np.int64(folded["c"].sum()) if not folded.empty else np.int64(0)
        out_frames.append(pd.DataFrame({
            "rule": [r.name], "n_violations": [v], "n_checked": [c]}))

    out = pd.concat(out_frames, ignore_index=True)
    out = out.sort_values("rule", ignore_index=True)
    return out.astype({"n_violations": np.int64, "n_checked": np.int64})
