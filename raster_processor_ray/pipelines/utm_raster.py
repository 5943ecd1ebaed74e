"""Per-scene UTM-grid rasterization end-to-end (reference
products.py:1102-1155: scene-centroid zone/band selection + grid bounds
snapped to the resolution; raster_proc.py:567-652 grid construction;
binning in PROJECTED meters with the round-half-even rule).

Three streaming passes, all pruned to the columns they touch:

1. bounds scan (lat/lon only): per-batch min/max partials -> one tiny
   combine -> scene centroid -> UTM zone + MGRS band (with the
   reference's zone/band adjust knobs);
2. projected-bounds scan: per-batch Krüger projection of lat/lon in the
   FIXED scene zone -> easting/northing min/max partials -> grid bounds
   padded and snapped to ``res`` (products.py:1119-1133);
3. the standard one-shuffle rasterize, binning on (easting, northing)
   against the projected GridSpec (``projected=True`` -> water_frac uses
   res^2 cell area, reference raster_agg aggregate_water_area 'utm').

Two extra scans of two float columns are the price of not knowing the
scene bounds up front; the reference pays the same by materializing the
whole pixel cloud in memory first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..aggregate.rasterize import rasterize
from ..config import AggConfig, DEFAULT_AGG
from ..geo import utm
from ..geo.cells import GridSpec, bin_to_grid, grid_cell_key


def _minmax_scan(ds, cols: list[str]) -> dict[str, tuple[float, float]]:
    """Streaming min/max of ``cols``: per-batch partials, a distributed
    fold pass collapsing up to 8192 partial rows per task, then a driver
    combine over <= n_blocks/8192 rows — driver memory stays bounded even
    at 10^6 input blocks (one partial row per input block)."""

    def partial(b: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            v = np.asarray(b[c], dtype=np.float64)
            v = v[np.isfinite(v)]
            out[f"{c}_min"] = [v.min() if len(v) else np.inf]
            out[f"{c}_max"] = [v.max() if len(v) else -np.inf]
        return pa.table(out)

    def fold(b: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            out[f"{c}_min"] = [np.asarray(b[f"{c}_min"]).min()]
            out[f"{c}_max"] = [np.asarray(b[f"{c}_max"]).max()]
        return pa.table(out)

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .map_batches(fold, batch_format="pyarrow", batch_size=8192)
             .to_pandas())
    return {c: (float(parts[f"{c}_min"].min()), float(parts[f"{c}_max"].max()))
            for c in cols}


def utm_scene_grid(ds, *, res_m: float, lat_col: str = "lat",
                   lon_col: str = "lon", padding_m: float = 0.0,
                   tile_size: int = 64, utm_zone_adjust: int = 0,
                   mgrs_band_adjust: int = 0):
    """Scene-adaptive UTM grid: returns (GridSpec, zone, band).

    Zone/band come from the scene centroid (products.py:1102-1118) with
    the reference's +-1 adjust knobs; bounds are the projected data
    extents padded and SNAPPED to the resolution (products.py:1119-1133:
    x_min = round(min/res)*res etc.), so cell centers land on exact
    multiples of ``res``.
    """
    ll = _minmax_scan(ds.select_columns([lat_col, lon_col]),
                      [lat_col, lon_col])
    mid_lat = 0.5 * (ll[lat_col][0] + ll[lat_col][1])
    mid_lon = 0.5 * (ll[lon_col][0] + ll[lon_col][1])
    zone = int(utm.utm_zone(np.array([mid_lat]), np.array([mid_lon]))[0])
    zone = (zone - 1 + utm_zone_adjust) % 60 + 1
    band_i = np.clip(int((np.clip(mid_lat, -80.0, 84.0) + 80.0) // 8)
                     + mgrs_band_adjust, 0, len(utm.MGRS_BANDS) - 1)
    band = utm.MGRS_BANDS[int(band_i)]
    # ONE hemisphere per scene, from the (adjusted) band like the
    # reference's utm_crs_from_point (raster_crs.py:160-171): a scene
    # straddling the equator projects every point in the same EPSG
    # 326xx/327xx CRS — per-point false northing would split the
    # northing field by 10^7 m at the equator.
    south = utm.band_is_south(band)

    def project(b: pa.Table) -> pa.Table:
        lat = np.asarray(b[lat_col], dtype=np.float64)
        lon = np.asarray(b[lon_col], dtype=np.float64)
        e, n, _ = utm.latlon_to_utm(lat, lon, zone=np.full(len(lat), zone),
                                    south=south)
        return pa.table({"easting": pa.array(e), "northing": pa.array(n)})

    en = _minmax_scan(
        ds.select_columns([lat_col, lon_col]).map_batches(
            project, batch_format="pyarrow"),
        ["easting", "northing"])
    x_min = np.round((en["easting"][0] - padding_m) / res_m) * res_m
    x_max = np.round((en["easting"][1] + padding_m) / res_m) * res_m
    y_min = np.round((en["northing"][0] - padding_m) / res_m) * res_m
    y_max = np.round((en["northing"][1] + padding_m) / res_m) * res_m
    grid = GridSpec(x_min=x_min, y_min=y_min, x_max=x_max, y_max=y_max,
                    res=res_m, tile_size=tile_size, projected=True)
    return grid, zone, band


def rasterize_utm(ds, *, res_m: float, cfg: AggConfig = DEFAULT_AGG,
                  lat_col: str = "lat", lon_col: str = "lon",
                  padding_m: float = 0.0, tile_size: int = 64,
                  utm_zone_adjust: int = 0, mgrs_band_adjust: int = 0,
                  num_buckets: int = 64):
    """Points (lat/lon + measure columns) -> UTM raster cells.

    Returns (cells_dataset, grid, zone, band). The projection runs
    inside ``map_batches`` with the scene zone fixed (stateless Krüger
    kernel — the reference's per-chunk osr.TransformPoints pool,
    products.py:1124-1135, without the per-process transformer state).
    """
    grid, zone, band = utm_scene_grid(
        ds, res_m=res_m, lat_col=lat_col, lon_col=lon_col,
        padding_m=padding_m, tile_size=tile_size,
        utm_zone_adjust=utm_zone_adjust, mgrs_band_adjust=mgrs_band_adjust)

    # scene hemisphere from the ADJUSTED band (same rule utm_scene_grid
    # used to project the grid bounds): after latlon_to_utm(..., south=)
    # every northing — and hence the grid — carries the same false
    # northing, so the inverse must use the same flag. Deriving it from
    # the sign of the northing would always say "northern" (southern
    # northings sit near 10^7 m, never below 0).
    south = utm.band_is_south(band)

    def bin_batch(b: pa.Table) -> pa.Table:
        lat = np.asarray(b[lat_col], dtype=np.float64)
        lon = np.asarray(b[lon_col], dtype=np.float64)
        e, n, _ = utm.latlon_to_utm(lat, lon, zone=np.full(len(lat), zone),
                                    south=south)
        iy, ix, ok = bin_to_grid(grid, e, n)
        cell = np.where(ok, grid_cell_key(grid, iy, ix), -1)
        return b.append_column("grid_cell", pa.array(cell, type=pa.int64()))

    def add_cell_latlon(b: pa.Table) -> pa.Table:
        """The product's latitude/longitude layers: cell CENTERS inverse-
        projected to WGS84 (reference aggregate_px_latlon,
        raster_agg.py:97-109 — cell-center TransformPoint per cell)."""
        iy = np.asarray(b["iy"]).astype(np.float64)
        ix = np.asarray(b["ix"]).astype(np.float64)
        ce = grid.x_min + ix * grid.res
        cn = grid.y_min + iy * grid.res
        clat, clon = utm.utm_to_latlon(ce, cn, np.full(len(ce), zone),
                                       northern=not south)
        out = b.append_column("cell_lat", pa.array(clat))
        return out.append_column("cell_lon", pa.array(clon))

    cells = rasterize(ds.map_batches(bin_batch, batch_format="pyarrow"),
                      grid, cfg, num_buckets=num_buckets)
    return (cells.map_batches(add_cell_latlon, batch_format="pyarrow"),
            grid, zone, band)
