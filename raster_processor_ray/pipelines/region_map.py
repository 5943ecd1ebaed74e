"""Region-map raster writer (reference make_raster_region_maps.py:
129-254): label each point with river/lake region ids, take the per-cell
MODE of each label family, and write a DENSE labeled raster with the
reference's 999999 fill for unlabeled cells.

Ray-Data shape: ONE bounded shuffle for all label families — per-batch
(cell, family, label) counts map-side, per-bucket vectorized argmax
(ties -> smallest label, the reference's ag.simple mode rule), pivot to
one row per cell — then the dense tile scatter + resumable write
(state/densify.py machinery).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.cells import GridSpec, grid_tile_id
from ..state import lineage

REGION_FILL = 999999  # make_raster_region_maps.py:231, 239


def region_map_cells(pts_ds, label_cols: list[str], *,
                     cell_col: str = "grid_cell", num_buckets: int = 64):
    """points -> one row per occupied cell with ``<col>_mode`` per label
    family (REGION_FILL where the family has no labeled points;
    label -1 = point outside every region, excluded like the
    reference's ``region_map != -1`` mask)."""

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for fam, col in enumerate(label_cols):
            sub = df[(df[cell_col] >= 0) & (df[col] >= 0)]
            g = sub.groupby([cell_col, col], as_index=False).size()
            g.columns = ["cell", "label", "cnt"]
            g["fam"] = np.int64(fam)
            parts.append(g)
        out = pd.concat(parts, ignore_index=True)
        out["_bucket"] = out["cell"].to_numpy(np.int64) % num_buckets
        return out

    def mode_pivot(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["cell", "fam", "label"], as_index=False)["cnt"].sum()
        g = g.sort_values(["cell", "fam", "cnt", "label"],
                          ascending=[True, True, False, True],
                          kind="mergesort")
        top = g.drop_duplicates(subset=["cell", "fam"], keep="first")
        out = top.pivot(index="cell", columns="fam", values="label")
        out = out.reindex(columns=range(len(label_cols)))
        out.columns = [f"{c}_mode" for c in label_cols]
        out = out.fillna(REGION_FILL).astype(np.int64).reset_index()
        return out.rename(columns={"cell": cell_col})

    from ..util import pin_for_shuffle

    return (pin_for_shuffle(pts_ds.map_batches(partial_counts, batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(lambda df: mode_pivot(df.drop(columns=["_bucket"])),
                        batch_format="pandas"))


def densify_region_tiles(cells_ds, grid: GridSpec, label_cols: list[str], *,
                         num_buckets: int = 64):
    """Sparse per-cell modes -> dense int tiles (fill REGION_FILL),
    same bucket-vectorized scatter as state/densify.py."""
    T = grid.tile_size
    TT = T * T

    def add_tile(b: pa.Table) -> pa.Table:
        cell = np.asarray(b["grid_cell"]).astype(np.int64)
        iy = cell // grid.size_x
        ix = cell % grid.size_x
        tid = grid_tile_id(grid, iy, ix)
        b = b.append_column("iy", pa.array(iy))
        b = b.append_column("ix", pa.array(ix))
        b = b.append_column("tile_id", pa.array(tid))
        return b.append_column("_bucket", pa.array(tid % num_buckets))

    def densify_bucket(df: pd.DataFrame) -> pa.Table:
        tid = df["tile_id"].to_numpy(np.int64)
        tiles = np.unique(tid)
        tpos = np.searchsorted(tiles, tid)
        n_tiles = len(tiles)
        flat = (tpos * TT + (df["iy"].to_numpy(np.int64) % T) * T
                + (df["ix"].to_numpy(np.int64) % T))
        out: dict[str, pa.Array] = {
            "tile_id": pa.array(tiles),
            "tile_iy": pa.array((tiles // grid.tiles_x).astype(np.int32)),
            "tile_ix": pa.array((tiles % grid.tiles_x).astype(np.int32)),
            "ny": pa.array(np.full(n_tiles, T, dtype=np.int32)),
            "nx": pa.array(np.full(n_tiles, T, dtype=np.int32)),
        }
        for col in label_cols:
            dense = np.full(n_tiles * TT, REGION_FILL, dtype=np.int64)
            dense[flat] = df[f"{col}_mode"].to_numpy(np.int64)
            out[f"region_map_{col}"] = pa.FixedSizeListArray.from_arrays(
                pa.array(dense), TT)
        return pa.table(out)

    from ..util import pin_for_shuffle

    return (pin_for_shuffle(cells_ds.map_batches(add_tile, batch_format="pyarrow"))
            .groupby("_bucket")
            .map_groups(densify_bucket, batch_format="pandas"))


def write_region_map(pts_ds, grid: GridSpec, out_dir: str,
                     label_cols: list[str], *, cell_col: str = "grid_cell",
                     num_shards: int = 64,
                     input_fingerprint: str | None = None):
    """points -> per-cell label modes -> dense labeled tiles ->
    resumable sharded write. Returns the lineage manifest table."""
    cells = region_map_cells(pts_ds, label_cols, cell_col=cell_col,
                             num_buckets=num_shards)
    dense = densify_region_tiles(cells, grid, label_cols,
                                 num_buckets=num_shards)
    return lineage.write_resumable(dense, out_dir, key_col="tile_id",
                                   num_shards=num_shards,
                                   sort_cols=["tile_id"],
                                   input_fingerprint=input_fingerprint)
