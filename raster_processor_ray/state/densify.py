"""Dense tile materialization at write (SURVEY.md §1.3 "densify only at
write").

The reference's output product is a DENSE grid (RasterUTM/RasterGeo,
products.py:1109-1247: every (i, j) holds a value or fill, empty cells
carry NO_PIXELS/FEW_PIXELS qual, ``crop_to_bounds`` masks cells whose
centers fall outside the swath polygon, products.py:1425-1474). The
engine keeps cells SPARSE through every aggregation stage — densifying
mid-pipeline would ship mostly-fill blocks through the object store —
and materializes dense tiles only here, at the output boundary.

Layout: one output ROW per tile: tile coordinates + per-layer
``fixed_size_list<float64/int64>[tile_size^2]`` columns (row-major dense
arrays) + per-tile metadata (valid-cell count, time coverage min/max —
the reference's time_coverage_start/end attributes). Parquet-native, and
a reader reshapes a layer with ``np.reshape(ny, nx)``.

Scale shape: tiles are grouped by a BOUNDED bucket (tile_id % B) and the
scatter into dense arrays is vectorized across every tile in the bucket
(one numpy call per layer per bucket, never a Python loop per tile or
per cell).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import config as C
from ..geo.cells import GridSpec

# empty/outside cell fills (crop_to_bounds semantics, products.py:1444-1457)
QUAL_BIT_OUTSIDE = 1 << 11  # appended to the config bit space
EMPTY_BITS = np.int64(C.QUAL_BIT_NO_PIXELS | C.QUAL_BIT_FEW_PIXELS)
OUTSIDE_BITS = np.int64(QUAL_BIT_OUTSIDE) | EMPTY_BITS

FLOAT_LAYERS = ["mean_value", "wmean_value", "wmean_uncert", "water_area",
                "water_frac", "dark_frac", "min_ts", "max_ts"]
INT_LAYERS = {"n_pix": 0, "n_value_pix": 0, "mode_klass": -1}


def tile_cell_centers(grid: GridSpec, tile_iy: np.ndarray, tile_ix: np.ndarray):
    """(lat, lon) centers for every cell of every tile, vectorized:
    returns arrays of shape (n_tiles, T, T)."""
    T = grid.tile_size
    dy = np.arange(T)
    dx = np.arange(T)
    iy = np.broadcast_to(tile_iy[:, None, None] * T + dy[None, :, None],
                         (len(tile_iy), T, T))
    ix = np.broadcast_to(tile_ix[:, None, None] * T + dx[None, None, :],
                         (len(tile_ix), T, T))
    lat = grid.y_min + iy * grid.res
    lon = grid.x_min + ix * grid.res
    return lat, lon, iy, ix


def densify_tiles(cells_ds, grid: GridSpec, *, polygon_index=None,
                  num_buckets: int = 64):
    """Finalized sparse cells -> dense tile rows (lazy Dataset).

    ``polygon_index``: optional ``stages.pip.PolygonIndex``; cells whose
    centers fall outside every polygon are cropped (masked + OUTSIDE
    qual bits) exactly like the reference's ``crop_to_bounds``.
    """
    import ray

    T = grid.tile_size
    TT = T * T
    poly_ref = ray.put(polygon_index) if polygon_index is not None else None

    def add_bucket(b: pa.Table) -> pa.Table:
        tid = np.asarray(b["tile_id"]).astype(np.int64)
        return b.append_column("_bucket", pa.array(tid % num_buckets))

    # the polygon index is fetched from the broadcast ref once per task
    # (cached in the pickled closure state), not per group
    _poly_cache: dict = {"resolved": poly_ref is None, "poly": None}

    def _get_poly():
        if not _poly_cache["resolved"]:
            _poly_cache["poly"] = ray.get(poly_ref)
            _poly_cache["resolved"] = True
        return _poly_cache["poly"]

    def densify_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.drop(columns=["_bucket"])
        tid = df["tile_id"].to_numpy(np.int64)
        tiles = np.unique(tid)
        tpos = np.searchsorted(tiles, tid)
        n_tiles = len(tiles)
        iy = df["iy"].to_numpy(np.int64)
        ix = df["ix"].to_numpy(np.int64)
        # flat position of each sparse cell inside its tile's dense array
        flat = tpos * TT + (iy % T) * T + (ix % T)

        tiles_iy = tiles // grid.tiles_x
        tiles_ix = tiles % grid.tiles_x
        lat, lon, cell_iy, cell_ix = tile_cell_centers(grid, tiles_iy, tiles_ix)
        in_grid = (cell_iy < grid.size_y) & (cell_ix < grid.size_x)
        poly = _get_poly()
        if poly is not None and not grid.projected:
            inside = poly.contains_any(
                lat.ravel(), lon.ravel()).reshape(lat.shape)
        else:
            inside = np.ones_like(in_grid)
        covered = (in_grid & inside).reshape(n_tiles, TT)

        out: dict[str, pa.Array] = {}
        out["tile_id"] = pa.array(tiles)
        out["tile_iy"] = pa.array(tiles_iy.astype(np.int32))
        out["tile_ix"] = pa.array(tiles_ix.astype(np.int32))
        out["y0"] = pa.array(grid.y_min + tiles_iy * T * grid.res)
        out["x0"] = pa.array(grid.x_min + tiles_ix * T * grid.res)
        out["ny"] = pa.array(np.full(n_tiles, T, dtype=np.int32))
        out["nx"] = pa.array(np.full(n_tiles, T, dtype=np.int32))

        def scatter(vals: np.ndarray, fill, dtype):
            dense = np.full(n_tiles * TT, fill, dtype=dtype)
            dense[flat] = vals
            return dense

        for name in FLOAT_LAYERS:
            if name not in df.columns:
                continue
            dense = scatter(df[name].to_numpy(np.float64), np.nan, np.float64)
            dense[~covered.ravel()] = np.nan      # crop: mask values
            out[name] = pa.FixedSizeListArray.from_arrays(
                pa.array(dense), TT)
        for name, fill in INT_LAYERS.items():
            if name not in df.columns:
                continue
            dense = scatter(df[name].to_numpy(np.int64), fill, np.int64)
            dense[~covered.ravel()] = fill        # crop: counts -> 0
            out[name] = pa.FixedSizeListArray.from_arrays(
                pa.array(dense), TT)
        # qual: empty -> BAD + NO_PIXELS/FEW_PIXELS; cropped -> +OUTSIDE
        qual = scatter(df["qual"].to_numpy(np.int64), C.QUAL_BAD, np.int64)
        bits = scatter(df["qual_bitwise"].to_numpy(np.int64), EMPTY_BITS,
                       np.int64)
        cov = covered.ravel()
        qual[~cov] = C.QUAL_BAD
        bits[~cov] = OUTSIDE_BITS
        out["qual"] = pa.FixedSizeListArray.from_arrays(pa.array(qual), TT)
        out["qual_bitwise"] = pa.FixedSizeListArray.from_arrays(
            pa.array(bits), TT)

        # per-tile metadata: valid cells + time coverage over covered,
        # non-empty cells (crop_to_bounds recomputes time coverage)
        npx = scatter(df["n_pix"].to_numpy(np.int64), 0, np.int64)
        npx[~cov] = 0
        npix2d = npx.reshape(n_tiles, TT)
        out["n_valid_cells"] = pa.array((npix2d > 0).sum(axis=1))
        if "min_ts" in df.columns:
            mts = scatter(df["min_ts"].to_numpy(np.float64), np.nan,
                          np.float64)
            xts = scatter(df["max_ts"].to_numpy(np.float64), np.nan,
                          np.float64)
            mts[(npx == 0)] = np.nan
            xts[(npx == 0)] = np.nan
            with np.errstate(all="ignore"):
                out["time_coverage_start"] = pa.array(
                    np.nanmin(mts.reshape(n_tiles, TT), axis=1))
                out["time_coverage_end"] = pa.array(
                    np.nanmax(xts.reshape(n_tiles, TT), axis=1))
        return pa.table(out)

    from ..util import pin_for_shuffle

    return (pin_for_shuffle(cells_ds.map_batches(add_bucket, batch_format="pyarrow"))
            .groupby("_bucket")
            .map_groups(densify_bucket, batch_format="pandas"))


def write_dense_tiles(cells_ds, out_dir: str, grid: GridSpec, *,
                      polygon_index=None, num_shards: int = 64,
                      input_fingerprint: str | None = None):
    """Densify + resumable sharded write (one row per tile, shard =
    tile_id % num_shards). Returns the lineage manifest table."""
    from . import lineage

    dense = densify_tiles(cells_ds, grid, polygon_index=polygon_index,
                          num_buckets=num_shards)
    return lineage.write_resumable(dense, out_dir, key_col="tile_id",
                                   num_shards=num_shards,
                                   sort_cols=["tile_id"],
                                   input_fingerprint=input_fingerprint)


def read_dense_layer(tile_row: dict | pd.Series, layer: str) -> np.ndarray:
    """Reader helper: one tile row -> (ny, nx) dense array."""
    ny, nx = int(tile_row["ny"]), int(tile_row["nx"])
    return np.asarray(tile_row[layer]).reshape(ny, nx)
