"""Zonal statistics: per-cell mode of region labels (SURVEY.md A15).

The reference's region-map pipeline labels each pixel with a river/lake
region id and takes the per-cell mode (make_raster_region_maps.py:182-223).
Here: points already carry a label (e.g. from the PIP join); the mode is
computed with the canonical two-stage shape — count per (cell, label)
map-side, combine, then argmax per cell — never a per-cell Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def zonal_mode(ds, cell_col: str = "grid_cell", label_col: str = "label",
               *, num_buckets: int = 64):
    """-> Dataset[(cell_col, mode_label, mode_count)].

    Ties break to the lexicographically smallest label (deterministic).
    """

    def partial_counts(b: pa.Table) -> pa.Table:
        df = b.select([cell_col, label_col]).to_pandas()
        out = df.groupby([cell_col, label_col], as_index=False).size()
        out = out.rename(columns={"size": "cnt"})
        out["_bucket"] = out[cell_col].astype(np.int64) % num_buckets
        return pa.Table.from_pandas(out, preserve_index=False)

    def argmax_per_cell(df: pd.DataFrame) -> pd.DataFrame:
        df = df.groupby([cell_col, label_col], as_index=False)["cnt"].sum()
        df = df.sort_values([cell_col, "cnt", label_col],
                            ascending=[True, False, True], kind="mergesort")
        top = df.drop_duplicates(subset=[cell_col], keep="first")
        return top.rename(columns={label_col: "mode_label", "cnt": "mode_count"})

    from ..util import pin_for_shuffle

    return (
        pin_for_shuffle(ds.map_batches(partial_counts, batch_format="pyarrow"))
        .groupby("_bucket")
        .map_groups(lambda df: argmax_per_cell(df.drop(columns=["_bucket"])),
                    batch_format="pandas")
    )
