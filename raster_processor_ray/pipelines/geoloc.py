"""Height-constrained geolocation feedback pipeline — the reference's
DEFAULT CLI DAG (l2pixc_to_raster.py:112-251, geoloc_raster.py:31-194),
expressed as composable Ray Data stages:

    phase 1  COARSE rasterize: bin points on a coarse grid (fine res x
             scale_factor) and aggregate the per-cell value ('uncorrected
             height' — the lowres raster,
             l2pixc_to_raster.do_height_constrained_geolocation).
    phase 2  FEEDBACK JOIN: each point reads its coarse cell's value
             (GeolocRaster.update_heights_from_raster, whose dense
             proj_mapping triple loop becomes a broadcast cell->value
             lookup inside map_batches); cells with no raster value fall
             back to the point's own value.
    phase 3  REFINE (mode='lowres_raster'): first-order Taylor
             height-constrained geolocation — move each point so its
             height becomes the constrained height while preserving the
             range to its nadir-track point (one gradient step, the
             reference's max_iter_grad=1 in
             geoloc.pointcloud_height_geoloc_vect). The nadir record per
             point comes from a broadcast nearest as-of join on ``ts``
             (get_sensor_index, raster_proc.py:364).
    phase 4  FULL-RES rasterize of the improved (lat, lon, value).

Mode selector (reference ``height_constrained_geoloc_source``, §2.10):

- ``'none'``          improved VALUE only (the smoothed-height path,
                      l2pixc_to_raster.get_smoothed_height); positions
                      unchanged.
- ``'lowres_raster'`` improved value AND position (phases 1-3).
- ``'pixcvec'``       keep precomputed improved columns where present
                      (coalesce, l2pixc_to_raster.py:135-137).

Scale notes: the coarse raster is bounded by the coarse GRID size (not
the point count) and is broadcast once via ``ray.put``; both rasterize
phases are the standard one-shuffle partial-aggregate pipelines; the
nadir track is one record per radar-line analog — tiny, broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import actor_pool_size

from ..aggregate.rasterize import rasterize
from ..config import AggConfig, DEFAULT_AGG
from ..geo import crs
from ..geo.cells import GridSpec, bin_to_grid, grid_cell_key
from ..stages.asof import asof_join

MODES = ("none", "lowres_raster", "pixcvec")


def coarse_grid_of(fine: GridSpec, scale_factor: int) -> GridSpec:
    """The lowres grid: same bounds, res x scale_factor (the reference
    divides `raster_resolution` by `lowres_raster_scale_factor` in
    samples-per-degree terms; in res-per-cell terms that multiplies)."""
    return GridSpec(x_min=fine.x_min, y_min=fine.y_min, x_max=fine.x_max,
                    y_max=fine.y_max, res=fine.res * scale_factor,
                    tile_size=fine.tile_size, wrap_lon=fine.wrap_lon,
                    projected=fine.projected)


def add_cell_column(ds, grid: GridSpec, *, lat_col: str = "lat",
                    lon_col: str = "lon", out_col: str = "grid_cell"):
    """Append the grid cell key (-1 for out-of-grid points)."""

    def add(b: pa.Table) -> pa.Table:
        lon = np.asarray(b[lon_col], dtype=np.float64)
        lat = np.asarray(b[lat_col], dtype=np.float64)
        iy, ix, ok = bin_to_grid(grid, lon, lat)
        cell = np.where(ok, grid_cell_key(grid, iy, ix), -1)
        return b.append_column(out_col, pa.array(cell, type=pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


def coarse_cell_values(pts_ds, coarse: GridSpec, *, value_col: str = "value",
                       lat_col: str = "lat", lon_col: str = "lon",
                       num_buckets: int = 64) -> pd.DataFrame:
    """Phase 1: per-coarse-cell EXACT mean value as a small DataFrame
    (sum/count partials -> one bounded shuffle -> exact integer-free
    division; the result has one row per occupied coarse cell).

    The division of exact partial sums keeps the value bit-identical to a
    SQL ``sum(x)/count(x)`` per cell when x sums exactly (ints), which is
    what the oracle-checked query relies on.
    """
    binned = add_cell_column(pts_ds, coarse, lat_col=lat_col, lon_col=lon_col,
                             out_col="_ccell")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["_ccell"] >= 0]
        g = df.groupby("_ccell", as_index=False)[value_col].agg(["sum", "count"])
        g.columns = ["_ccell", "_sum", "_cnt"]
        g["_bucket"] = g["_ccell"].to_numpy(np.int64) % num_buckets
        return g

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("_ccell", as_index=False)[["_sum", "_cnt"]].sum()
        g["cell_value"] = g["_sum"] / g["_cnt"]
        return g[["_ccell", "cell_value"]]

    from ..util import pin_for_shuffle

    return (pin_for_shuffle(binned.map_batches(partial, batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(combine, batch_format="pandas")).to_pandas()


class CoarseFeedback:
    """Phase 2 actor: broadcast coarse-cell -> value map, applied per
    batch with a vectorized searchsorted lookup (never a dict per row).
    Appends ``improved_value``; falls back to the point's own value for
    cells with no raster value."""

    def __init__(self, lut_ref, coarse: GridSpec, value_col: str,
                 lat_col: str, lon_col: str):
        import ray

        lut: pd.DataFrame = ray.get(lut_ref)
        self.cells = lut["_ccell"].to_numpy(np.int64)
        self.vals = lut["cell_value"].to_numpy(np.float64)
        order = np.argsort(self.cells)
        self.cells, self.vals = self.cells[order], self.vals[order]
        self.coarse = coarse
        self.value_col = value_col
        self.lat_col = lat_col
        self.lon_col = lon_col

    def __call__(self, b: pa.Table) -> pa.Table:
        own = np.asarray(b[self.value_col], dtype=np.float64)
        if len(self.cells) == 0:
            # empty LUT (every point binned out of the coarse grid):
            # fall back to the points' own values. Must early-return —
            # numpy `&` does not short-circuit, so the searchsorted
            # index below would IndexError on the empty array.
            return b.append_column("improved_value", pa.array(own))
        lon = np.asarray(b[self.lon_col], dtype=np.float64)
        lat = np.asarray(b[self.lat_col], dtype=np.float64)
        iy, ix, ok = bin_to_grid(self.coarse, lon, lat)
        cell = np.where(ok, grid_cell_key(self.coarse, iy, ix), -1)
        pos = np.searchsorted(self.cells, cell)
        pos_c = np.clip(pos, 0, len(self.cells) - 1)
        hit = ok & (self.cells[pos_c] == cell)
        improved = np.where(hit, self.vals[pos_c], own)
        return b.append_column("improved_value", pa.array(improved))


def taylor_height_shift(lat, lon, h, nadir_xyz, dh):
    """First-order height-constrained position shift (vectorized):

    move each point P so its geodetic height increases by ``dh`` while
    the RANGE |P - N| to its nadir point N is preserved — the one-step
    Taylor form of the reference's iterative
    ``pointcloud_height_geoloc_vect`` (max_iter_grad=1): step along the
    component of the ellipsoid normal orthogonal to the look vector,
    scaled so the height change is exactly dh to first order.

    Returns (new_lat, new_lon, new_height_actual) from the exact
    ECEF -> LLH inverse of the shifted point.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    h = np.asarray(h, dtype=np.float64)
    dh = np.asarray(dh, dtype=np.float64)
    x, y, z = crs.llh_to_ecef(lat, lon, h)
    p = np.stack([x, y, z], axis=1)
    look = p - nadir_xyz
    look /= np.linalg.norm(look, axis=1, keepdims=True)
    latr, lonr = np.radians(lat), np.radians(lon)
    n = np.stack([np.cos(latr) * np.cos(lonr),
                  np.cos(latr) * np.sin(lonr),
                  np.sin(latr)], axis=1)          # ellipsoid normal
    ndotu = np.einsum("ij,ij->i", n, look)
    v = n - ndotu[:, None] * look                  # range-preserving dir
    vdotn = 1.0 - ndotu ** 2                       # height gain per unit v
    # near-nadir points (look ~ normal) cannot trade height for position:
    # fall back to a pure normal shift (degenerate geometry guard)
    degenerate = vdotn < 1e-6
    step = np.where(degenerate, dh, dh / np.where(degenerate, 1.0, vdotn))
    shifted = np.where(degenerate[:, None], p + dh[:, None] * n,
                       p + step[:, None] * v)
    return crs.ecef_to_llh(shifted[:, 0], shifted[:, 1], shifted[:, 2])


def height_constrained_points(pts_ds, fine: GridSpec, *, mode: str = "lowres_raster",
                              scale_factor: int = 4, value_col: str = "value",
                              lat_col: str = "lat", lon_col: str = "lon",
                              ts_col: str = "ts",
                              nadir_track: tuple[np.ndarray, dict] | None = None,
                              improved_cols: tuple[str, str, str] | None = None,
                              concurrency=None):
    """Phases 1-3: points -> points with ``improved_value`` (+ improved
    ``lat``/``lon`` in mode 'lowres_raster'). See module docstring.

    ``nadir_track``: (ts_array, {'nx': x, 'ny': y, 'nz': z}) ECEF meters —
    required for mode 'lowres_raster'. ``improved_cols``: the
    (lat, lon, value) column names holding precomputed improved geoloc
    for mode 'pixcvec'.
    """
    import ray

    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")

    if mode == "pixcvec":
        ilat, ilon, ival = improved_cols or ("improved_lat", "improved_lon",
                                             "improved_value")

        def coalesce(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            lat = pc.coalesce(b[ilat], b[lat_col]) if ilat in b.column_names else b[lat_col]
            lon = pc.coalesce(b[ilon], b[lon_col]) if ilon in b.column_names else b[lon_col]
            val = pc.coalesce(b[ival], b[value_col]) if ival in b.column_names else b[value_col]
            out = b.drop_columns([c for c in (lat_col, lon_col, "improved_value")
                                  if c in b.column_names])
            out = out.append_column(lat_col, lat)
            out = out.append_column(lon_col, lon)
            return out.append_column("improved_value", val.cast(pa.float64()))

        return pts_ds.map_batches(coalesce, batch_format="pyarrow")

    coarse = coarse_grid_of(fine, scale_factor)
    lut = coarse_cell_values(pts_ds, coarse, value_col=value_col,
                             lat_col=lat_col, lon_col=lon_col)
    lut_ref = ray.put(lut)
    fed = pts_ds.map_batches(
        CoarseFeedback, batch_format="pyarrow", concurrency=(actor_pool_size(0.5) if concurrency is None else concurrency),
        num_cpus=0.5,
        fn_constructor_args=(lut_ref, coarse, value_col, lat_col, lon_col))
    if mode == "none":
        return fed

    if nadir_track is None:
        raise ValueError("mode='lowres_raster' needs a nadir_track")
    track_ts, track_payload = nadir_track
    fed = asof_join(fed, track_ts, track_payload, on=ts_col,
                    direction="nearest", suffix="")

    def refine(b: pa.Table) -> pa.Table:
        lat = np.asarray(b[lat_col], dtype=np.float64)
        lon = np.asarray(b[lon_col], dtype=np.float64)
        own = np.asarray(b[value_col], dtype=np.float64)
        imp = np.asarray(b["improved_value"], dtype=np.float64)
        nadir = np.stack([np.asarray(b[c], dtype=np.float64)
                          for c in ("nx", "ny", "nz")], axis=1)
        new_lat, new_lon, new_h = taylor_height_shift(lat, lon, own, nadir,
                                                      imp - own)
        out = b.drop_columns([lat_col, lon_col, "improved_value",
                              "nx", "ny", "nz"])
        out = out.append_column(lat_col, pa.array(new_lat))
        out = out.append_column(lon_col, pa.array(new_lon))
        return out.append_column("improved_value", pa.array(new_h))

    return fed.map_batches(refine, batch_format="pyarrow")


def geoloc_refined_rasterize(pts_ds, fine: GridSpec, *, mode: str = "lowres_raster",
                             scale_factor: int = 4, cfg: AggConfig = DEFAULT_AGG,
                             value_col: str = "value", lat_col: str = "lat",
                             lon_col: str = "lon", ts_col: str = "ts",
                             nadir_track=None, improved_cols=None):
    """The composed two-phase DAG: phases 1-3 then the FULL-RES rasterize
    of (improved position, improved value)."""
    pts = height_constrained_points(
        pts_ds, fine, mode=mode, scale_factor=scale_factor, value_col=value_col,
        lat_col=lat_col, lon_col=lon_col, ts_col=ts_col,
        nadir_track=nadir_track, improved_cols=improved_cols)

    def to_fine(b: pa.Table) -> pa.Table:
        lon = np.asarray(b[lon_col], dtype=np.float64)
        lat = np.asarray(b[lat_col], dtype=np.float64)
        iy, ix, ok = bin_to_grid(fine, lon, lat)
        cell = np.where(ok, grid_cell_key(fine, iy, ix), -1)
        out = pa.table({
            "grid_cell": pa.array(cell, type=pa.int64()),
            "value": b["improved_value"],
        })
        if ts_col in b.column_names:
            out = out.append_column("ts", b[ts_col])
        return out

    return rasterize(pts.map_batches(to_fine, batch_format="pyarrow"), fine, cfg)


def synth_nadir_track(n: int = 512, *, alt_m: float = 890_000.0):
    """Deterministic polar-ish nadir trajectory for tests/benches (the
    TVP analog): n equally spaced samples, ts in [0, n)."""
    t = np.arange(n, dtype=np.float64)
    lat = 80.0 * np.sin(2 * np.pi * t / n)
    lon = (t * 360.0 / n - 180.0 + 25.0 * np.cos(2 * np.pi * t / n)) % 360.0 - 180.0
    x, y, z = crs.llh_to_ecef(lat, lon, alt_m)
    return t, {"nx": x, "ny": y, "nz": z}
