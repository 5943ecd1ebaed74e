"""Column profiling: one-pass data-quality stats per numeric column.

The 100-TB operational primitive: before (or after) a big run, profile
the table — row count, null count, min, max per column — in ONE scan
with a tiny bounded exchange (one partial row per column per batch).
Reference analog: the empty-product and validity checks the reference
runs before rasterizing (products.py:1223-1230 empty check; M14
validity masks), generalized to a schema-wide report.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def profile_columns(ds, cols: list[str], *, num_buckets: int = 8):
    """-> one row per column: (col_name, n, n_null, vmin, vmax), with
    min/max over non-null values as float64 (numeric columns only)."""
    from .relational import hash_aggregate

    def partial(b: pa.Table) -> pa.Table:
        names, ns, nulls, vmins, vmaxs = [], [], [], [], []
        for c in cols:
            col = b[c]
            names.append(c)
            ns.append(b.num_rows)
            nulls.append(col.null_count)
            valid = pc.drop_null(col)
            if len(valid):
                arr = np.asarray(valid, dtype=np.float64)
                vmins.append(float(arr.min()))
                vmaxs.append(float(arr.max()))
            else:
                vmins.append(np.inf)
                vmaxs.append(-np.inf)
        return pa.table({
            "col_name": pa.array(names, type=pa.string()),
            "n": pa.array(ns, type=pa.int64()),
            "n_null": pa.array(nulls, type=pa.int64()),
            "vmin": pa.array(vmins, type=pa.float64()),
            "vmax": pa.array(vmaxs, type=pa.float64()),
        })

    out = hash_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                         "col_name", {
        "n": ("n", "sum"),
        "n_null": ("n_null", "sum"),
        "vmin": ("vmin", "min"),
        "vmax": ("vmax", "max"),
    }, num_buckets=num_buckets)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        # all-null columns: report NaN bounds instead of +-inf sentinels
        df.loc[~np.isfinite(df.vmin), "vmin"] = np.nan
        df.loc[~np.isfinite(df.vmax), "vmax"] = np.nan
        return df

    return out.map_batches(fin, batch_format="pandas")
