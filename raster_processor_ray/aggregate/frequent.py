"""Exact distributed heavy hitters (frequent items above support 1/k).

Two bounded passes, no global sort, EXACT output (unlike count-min /
space-saving sketches, whose counts are approximate):

1. Candidate generation (map side): each batch keeps the values whose
   LOCAL count exceeds ``batch_rows / k``. Pigeonhole guarantee: if a
   value's global count exceeds ``N / k`` then some batch has it above
   its local threshold (if c_b <= n_b/k for every batch b, summing
   gives C <= N/k) — so the candidate union is a SUPERSET of the true
   heavy hitters, and it is bounded: fewer than k survivors per batch.
2. Exact recount: one bucketed semi join of the input against the
   (deduplicated) candidate set, one hash aggregate, and the exact
   integer threshold test ``count * k > N`` (no float division).

Scale shape: two input scans (the candidate pass fuses with the read);
shuffle rows are bounded by candidates x blocks, never input rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def heavy_hitters(ds, col: str, k: int, *, out: str = "n",
                  num_buckets: int = 8):
    """Values of ``col`` occurring MORE than ``count(ds) / k`` times,
    with their exact counts. Returns a pandas (col, n) FRAME — the
    survivor set is < k rows by the support bound, and a typed frame
    survives emptiness where a zero-row Dataset drops its schema.

    The candidate set is bounded by < k survivors per batch, so it is
    BROADCAST (one ``ray.put``, read per map task) rather than shuffled
    against the input: the recount pass filters map-side and its
    partials are bounded by |candidates| per batch — the input is never
    exchanged. Driver holds only the candidate ids (≤ k × blocks)."""
    from .relational import hash_aggregate

    n_total = ds.count()

    def local_candidates(df: pd.DataFrame) -> pd.DataFrame:
        c = df[col].value_counts()
        # strict local analog of the global test: c_b * k > n_b
        keep = c[c.to_numpy() * k > len(df)]
        return pd.DataFrame({col: keep.index.to_numpy()})

    cands = ds.map_batches(local_candidates,
                           batch_format="pandas").to_pandas()
    # an all-empty collect loses the schema -> treat as "no candidates"
    cand_vals = (pd.unique(cands[col].to_numpy())
                 if col in cands.columns else np.array([]))
    if len(cand_vals) == 0:
        # typed empty FRAME: zero-row Ray datasets lose their schema
        # through to_pandas(), so the bounded result is returned as
        # pandas in both the no-candidate and no-survivor cases
        import pyarrow as pa
        sch = ds.schema()
        ctype = dict(zip(sch.names, sch.types)).get(col, pa.int64())
        pd_type = (ctype.to_pandas_dtype()
                   if isinstance(ctype, pa.DataType) else np.int64)
        return pd.DataFrame({col: pd.Series(dtype=pd_type),
                             out: pd.Series(dtype=np.int64)})
    import ray
    ref = ray.put(set(cand_vals.tolist()))

    def filter_cands(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[col].isin(ray.get(ref))
        return df.loc[keep, [col]]

    counts = hash_aggregate(ds.map_batches(filter_cands,
                                           batch_format="pandas"),
                            col, {out: (None, "count")},
                            num_buckets=num_buckets)

    def threshold(df: pd.DataFrame) -> pd.DataFrame:
        return df[df[out].to_numpy() * k > n_total]

    res = counts.map_batches(threshold, batch_format="pandas")
    # the survivor set is < k rows by the support bound, so collecting
    # it is O(k); return the FRAME — a zero-row Ray dataset drops its
    # schema through to_pandas() (observed at sf0.1 where no part
    # passes), and the typed empty must survive to the caller
    out_df = res.to_pandas()
    if col not in out_df.columns:
        import pyarrow as pa
        sch = ds.schema()
        ctype = dict(zip(sch.names, sch.types)).get(col, pa.int64())
        pd_type = (ctype.to_pandas_dtype()
                   if isinstance(ctype, pa.DataType) else np.int64)
        out_df = pd.DataFrame({col: pd.Series(dtype=pd_type),
                               out: pd.Series(dtype=np.int64)})
    return out_df
