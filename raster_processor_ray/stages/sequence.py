"""Distributed gap detection over an integer sequence column (SURVEY.md
§2 extension — the islands-and-gaps classic; reference analog is the
missing-line detection of the gap-flag burner, SWOTRaster gap handling,
generalized from radar line numbers to any id sequence).

Design for scale: finding a value's SUCCESSOR is a global question, but
"is v+1 present" is just membership — so run boundaries fall out of two
bucketed ANTI joins over the stream (v with v+1 absent = run end; v with
v-1 absent = run start), each one bounded exchange.  Only the BOUNDARY
sets — O(#gaps), not O(rows) — leave the distributed plan; pairing
consecutive boundaries is a sort of that small set (guarded: refuse
above ``max_gaps`` rather than silently collect something huge — a
sequence with 10^9 gaps needs a different report than a row per gap).

Duplicate values are tolerated: the stream is deduped (map-side local
unique + one ``exact_dedup`` exchange) before the anti-joins, since a
duplicated boundary row would mis-pair run starts/ends while still
passing the length/endpoint assertion.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def sequence_gaps(ds, col: str, *, num_buckets: int = 32,
                  max_gaps: int = 10_000_000) -> pd.DataFrame:
    """-> (gap_start, gap_end) for every maximal run of missing values
    strictly inside [min, max] of the present values."""
    from ..aggregate.relational import hash_join
    from ..stages.dedup import exact_dedup
    from ..util import pin_for_shuffle

    # distinct values: duplicates would emit a boundary row PER COPY in
    # the anti-joins ([1,1,3] -> garbage gaps (2,0),(2,2) that still pass
    # the boundary assertion). Map-side np.unique shrinks each batch;
    # exact_dedup makes the stream globally distinct in one exchange.
    vals = pin_for_shuffle(exact_dedup(ds.map_batches(
        lambda b: pa.table(
            {"v": np.unique(np.asarray(b[col], dtype=np.int64))}),
        batch_format="pyarrow"), "v", num_buckets=num_buckets))
    if vals.count() == 0:
        return pd.DataFrame({"gap_start": pd.Series(dtype=np.int64),
                             "gap_end": pd.Series(dtype=np.int64)})
    vmin = vals.min("v")
    vmax = vals.max("v")

    def plus1(b: pa.Table) -> pa.Table:
        return pa.table({"v": np.asarray(b["v"], dtype=np.int64) + 1,
                         "orig": b["v"]})

    def minus1(b: pa.Table) -> pa.Table:
        return pa.table({"v": np.asarray(b["v"], dtype=np.int64) - 1,
                         "orig": b["v"]})

    # v+1 absent -> v ends a present-run (except the global max)
    run_ends = hash_join(vals.map_batches(plus1, batch_format="pyarrow"),
                         vals, "v", how="anti", num_buckets=num_buckets)
    # v-1 absent -> v starts a present-run (except the global min)
    run_starts = hash_join(vals.map_batches(minus1, batch_format="pyarrow"),
                           vals, "v", how="anti", num_buckets=num_buckets)

    n_ends = run_ends.count()
    if n_ends > max_gaps:
        raise ValueError(
            f"{n_ends} gaps exceed max_gaps={max_gaps}; aggregate or "
            "raise the guard explicitly")
    ends = np.sort(run_ends.to_pandas()["orig"].to_numpy(dtype=np.int64))
    starts = np.sort(run_starts.to_pandas()["orig"].to_numpy(dtype=np.int64))
    # boundary structure: starts[0] == vmin, ends[-1] == vmax; gap k sits
    # between run k's end and run k+1's start
    assert len(ends) == len(starts) and ends[-1] == vmax and starts[0] == vmin
    gap_start = ends[:-1] + 1
    gap_end = starts[1:] - 1
    return pd.DataFrame({"gap_start": gap_start, "gap_end": gap_end})
