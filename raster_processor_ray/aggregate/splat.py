"""Kernel-weighted (Gaussian / inverse-distance) splat rasterization.

The graft north-star names "inverse-distance/Gaussian kernel
aggregation" as the tile math: each geolocated sample contributes to
the raster cells around it with a weight that decays with the distance
from the sample to each cell's center — kernel-density splatting, the
generalization of the reference's single-cell inverse-variance
aggregation (raster_agg.py height_with_uncerts; our A3 family).

Shape: a bounded (2r+1)^2 neighborhood fan-out per sample inside
``map_batches`` (the sliding-window expansion trick, stages/windows.py)
feeding ONE bucketed hash aggregate on the cell key. Shuffle bytes grow
by exactly the fan-out factor; per-cell state is two partial sums.

Determinism: kernel weights are QUANTIZED to integers
(``round(w * 2^20)``) at row level, so the cross-batch weight sums are
bit-exact under any execution order — the same integer-cents trick the
money queries use (queries.py q_pricing_summary) — and the DuckDB
oracle reproduces them exactly (libm ``exp``/``sqrt`` agree bitwise on
one host; the quantization absorbs any last-ULP drift anyway unless a
value lands exactly on a .5 boundary, which the oracle check would
surface).

Distances are planar in grid-degree space on the equirectangular grid
(dx = lon - cell_center_lon, dy = lat - cell_center_lat): the kernel is
a TILING weight, not a geodesic measurement — the reference's
rasterization likewise bins in projected/grid space (products.py
get_raster_mapping), and a geodesic kernel would make the SQL oracle
unreproducible. No longitude wrap at the +-180 seam (matches
floor_cell; wrap-aware callers pre-rotate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

W_SCALE = 1 << 20  # weight quantization (integer sums are order-exact)


def _splat_partials(lat, lon, vals, *, res_deg: float, radius_cells: int,
                    kind: str, sigma_deg: float, idw_power: float,
                    idw_eps_deg: float):
    """Fan each sample out to its (2r+1)^2 neighbor cells -> flat
    (cell, w_int, wv_int) arrays. Vectorized: one numpy pass per
    neighbor OFFSET (a small constant), never per row."""
    nx = np.int64(round(360.0 / res_deg))
    iy0 = np.floor((lat + 90.0) / res_deg).astype(np.int64)
    ix0 = np.floor((lon + 180.0) / res_deg).astype(np.int64)
    ny = np.int64(round(180.0 / res_deg))
    cells_out, w_out, wv_out = [], [], []
    offs = range(-radius_cells, radius_cells + 1)
    for dy in offs:
        for dx in offs:
            iy = iy0 + dy
            ix = ix0 + dx
            cy = (iy.astype(np.float64) + 0.5) * res_deg - 90.0
            cx = (ix.astype(np.float64) + 0.5) * res_deg - 180.0
            ddx = (lon - cx) / res_deg          # distance in cell units
            ddy = (lat - cy) / res_deg
            d2 = ddx * ddx + ddy * ddy
            if kind == "gaussian":
                s = sigma_deg / res_deg
                w = np.exp(-d2 / (2.0 * s * s))
            elif kind == "idw":
                d = np.sqrt(d2)
                w = 1.0 / np.maximum(d, idw_eps_deg / res_deg) ** idw_power
            else:
                raise ValueError(kind)
            w_int = np.round(w * W_SCALE).astype(np.int64)
            ok = (iy >= 0) & (iy < ny) & (ix >= 0) & (ix < nx) & (w_int > 0)
            cells_out.append((iy[ok] * nx + ix[ok]))
            w_out.append(w_int[ok])
            wv_out.append(w_int[ok] * vals[ok])
    return (np.concatenate(cells_out), np.concatenate(w_out),
            np.concatenate(wv_out))


def splat_rasterize(ds, value_col: str, *, res_deg: float = 1.0,
                    radius_cells: int = 1, kind: str = "gaussian",
                    sigma_deg: float = 0.5, idw_power: float = 2.0,
                    idw_eps_deg: float = 1e-3, lat_col: str = "lat",
                    lon_col: str = "lon", num_buckets: int = 32):
    """points -> per-cell kernel-weighted mean of ``value_col``:
    (cell, n_contrib, sum_w, wmean). ``value_col`` must be integral-
    valued (ints or pre-quantized floats) so the weighted sums are
    exact int64 arithmetic end to end."""
    import pandas as pd

    from .relational import hash_aggregate

    def partials(b: pa.Table) -> pa.Table:
        lat = np.asarray(b[lat_col], dtype=np.float64)
        lon = np.asarray(b[lon_col], dtype=np.float64)
        vals = np.asarray(b[value_col]).astype(np.int64)
        cells, w, wv = _splat_partials(
            lat, lon, vals, res_deg=res_deg, radius_cells=radius_cells,
            kind=kind, sigma_deg=sigma_deg, idw_power=idw_power,
            idw_eps_deg=idw_eps_deg)
        return pa.table({"cell": pa.array(cells), "w": pa.array(w),
                         "wv": pa.array(wv)})

    agg = hash_aggregate(ds.map_batches(partials, batch_format="pyarrow"),
                         "cell", {
        "n_contrib": (None, "count"),
        "sum_w": ("w", "sum"),
        "sum_wv": ("wv", "sum"),
    }, num_buckets=num_buckets)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["wmean"] = (df.sum_wv / df.sum_w).round(6)
        return df[["cell", "n_contrib", "sum_w", "wmean"]]

    return agg.map_batches(fin, batch_format="pandas")


def splat_sql(lat_expr: str, lon_expr: str, value_expr: str, *,
              res_deg: float = 1.0, radius_cells: int = 1,
              kind: str = "gaussian", sigma_deg: float = 0.5,
              idw_power: float = 2.0, idw_eps_deg: float = 1e-3,
              source: str = "documents") -> str:
    """DuckDB SQL reproducing :func:`splat_rasterize` bit-for-bit
    (same quantized integer weights, same bounds/positivity filters)."""
    nx = int(round(360.0 / res_deg))
    ny = int(round(180.0 / res_deg))
    r = radius_cells
    if kind == "gaussian":
        s = sigma_deg / res_deg
        w_expr = f"exp(-(ddx * ddx + ddy * ddy) / {2.0 * s * s})"
    elif kind == "idw":
        eps = idw_eps_deg / res_deg
        w_expr = (f"1.0 / (greatest(sqrt(ddx * ddx + ddy * ddy), {eps}) "
                  f"^ {idw_power})")
    else:
        raise ValueError(kind)
    return f"""
WITH pts AS (
  SELECT {lat_expr} AS lat, {lon_expr} AS lon,
         CAST({value_expr} AS BIGINT) AS v,
         CAST(FLOOR(({lat_expr} + 90.0) / {res_deg}) AS BIGINT) AS iy0,
         CAST(FLOOR(({lon_expr} + 180.0) / {res_deg}) AS BIGINT) AS ix0
  FROM {source}
), splat AS (
  SELECT iy0 + dy.g AS iy, ix0 + dx.g AS ix, lat, lon, v,
         (lon - ((ix0 + dx.g + 0.5) * {res_deg} - 180.0)) / {res_deg} AS ddx,
         (lat - ((iy0 + dy.g + 0.5) * {res_deg} - 90.0)) / {res_deg} AS ddy
  FROM pts, range(-{r}, {r + 1}) dy(g), range(-{r}, {r + 1}) dx(g)
), weighted AS (
  SELECT iy * {nx} + ix AS cell, v,
         CAST(round({w_expr} * {W_SCALE}) AS BIGINT) AS w
  FROM splat
  WHERE iy >= 0 AND iy < {ny} AND ix >= 0 AND ix < {nx}
), pos AS (
  SELECT cell, v, w FROM weighted WHERE w > 0
)
SELECT cell, count(*) AS n_contrib, CAST(sum(w) AS BIGINT) AS sum_w,
       round(CAST(sum(w * v) AS DOUBLE) / sum(w), 6) AS wmean
FROM pos GROUP BY 1
"""
