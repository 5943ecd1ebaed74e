"""Geotag + cell-encode stage: the engine's first map.

Adds ``lat``, ``lon``, ``cell_id`` (S2-style level-12), ``h3ish`` and —
when a :class:`GridSpec` is given — ``grid_cell``, ``tile_id``, ``iy``,
``ix`` columns to a pages batch, carrying every input column through
untouched (the byte-identity invariant on ``text``/``html`` is preserved
because we only *append* columns to the zero-copy Arrow batch).

This is the analog of the reference's pixel-cloud geolocation +
``get_raster_mapping`` binning (reference products.py:1102-1155), but the
inverted cell->rows map never materializes: the ``grid_cell`` column *is*
the join key and the downstream ``groupby(grid_cell)`` does the rest.

Stateless — pure NumPy per batch, so it runs as elastic Ray tasks, not an
actor pool (nothing to amortize; contrast the reference's T1 transformer).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo import cells
from ..geo.cells import GridSpec
from ..sources.pages import pages_geotag

GLOBAL_GEO_GRID = GridSpec(
    x_min=-180.0, y_min=-90.0, x_max=180.0, y_max=90.0,
    res=0.01, tile_size=256, wrap_lon=True,
)
"""Default global geographic grid: 0.01-degree cells (~1.1 km at the
equator — same order as the reference's 100 m UTM / arcsec geo rasters,
reference raster_proc.py:60-64), 256x256-cell tiles."""


def geotag_and_cell_encode(batch: pa.Table, *, grid: GridSpec | None = GLOBAL_GEO_GRID,
                           url_col: str = "url", skew_frac: float = 0.05,
                           s2_level: int = 12, with_h3ish: bool = True) -> pa.Table:
    """Append geolocation + cell-key columns to a pages batch."""
    lat, lon = pages_geotag(batch[url_col], skew_frac=skew_frac)
    out = batch.append_column("lat", pa.array(lat, type=pa.float64()))
    out = out.append_column("lon", pa.array(lon, type=pa.float64()))
    out = out.append_column(
        "cell_id", pa.array(cells.s2ish_cell_id(lat, lon, s2_level), type=pa.uint64()))
    if with_h3ish:
        out = out.append_column(
            "h3ish", pa.array(cells.h3ish_cell_id(lat, lon), type=pa.uint64()))
    if grid is not None:
        iy, ix, ok = cells.bin_to_grid(grid, lon, lat)
        grid_cell = cells.grid_cell_key(grid, iy, ix)
        tile_id = cells.grid_tile_id(grid, iy, ix)
        out = out.append_column("iy", pa.array(iy, type=pa.int32()))
        out = out.append_column("ix", pa.array(ix, type=pa.int32()))
        out = out.append_column("grid_cell", pa.array(np.where(ok, grid_cell, -1), type=pa.int64()))
        out = out.append_column("tile_id", pa.array(np.where(ok, tile_id, -1), type=pa.int64()))
    return out


class GeotagCellEncode:
    """Callable-class wrapper so pipelines can choose the actor-pool form
    (not needed for state — provided for API symmetry with PIP/kNN)."""

    def __init__(self, grid: GridSpec | None = GLOBAL_GEO_GRID, *,
                 skew_frac: float = 0.05, s2_level: int = 12):
        self.grid = grid
        self.skew_frac = skew_frac
        self.s2_level = s2_level

    def __call__(self, batch: pa.Table) -> pa.Table:
        return geotag_and_cell_encode(
            batch, grid=self.grid, skew_frac=self.skew_frac, s2_level=self.s2_level)
