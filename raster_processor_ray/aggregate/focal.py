"""Neighborhood raster ops: multi-zoom tile pyramids and 3x3 focal
statistics (SURVEY.md §2.5 extension — the classic map-tiling and
focal-filter shapes; reference analog is the per-cell aggregation of
raster_agg.py generalized to cross-cell neighborhoods, plus the
low-res/full-res dual grid of the geolocation DAG,
l2pixc_to_raster.py:162-163, generalized to a whole zoom stack).

Both operate on the bounded CELL table, never the row stream: one
sample-to-cell aggregation first (the standard rasterize shuffle), then
all neighborhood math fans out/folds over cells — at the production
0.01-degree grid that is <= 648M rows total vs 10^12 samples, and each
pyramid level shrinks 4x, so the whole stack costs ~1.33x the base
aggregate.

Determinism: cell indices are non-negative ints (the +90/+180 floor
offsets), so ``// 2**k`` halving is identical floor/trunc division in
NumPy and DuckDB; counts and integer-value sums are exact at any
partitioning; focal means round(6) in both engines.  No longitude wrap:
a cell at ix=0 has no western neighbor (matches the oracle's range
join, which only ever sees existing cells); wrap-aware fan-out would
add ``% nx`` on the receiver index — documented, not wired.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def base_raster(ds, lat_col: str, lon_col: str, value_col: str, *,
                res_deg: float = 1.0, num_buckets: int = 32):
    """Sample stream -> (iy, ix, n, sum_v) cell table; ONE shuffle."""
    from .relational import hash_aggregate

    def add(b: pa.Table) -> pa.Table:
        lat = np.asarray(b[lat_col], dtype=np.float64)
        lon = np.asarray(b[lon_col], dtype=np.float64)
        return pa.table({
            "iy": np.floor((lat + 90.0) / res_deg).astype(np.int64),
            "ix": np.floor((lon + 180.0) / res_deg).astype(np.int64),
            "v": np.asarray(b[value_col]).astype(np.int64)})

    return hash_aggregate(ds.map_batches(add, batch_format="pyarrow"),
                          ["iy", "ix"],
                          {"n": (None, "count"), "sum_v": ("v", "sum")},
                          num_buckets=num_buckets)


def tile_pyramid(ds, lat_col: str, lon_col: str, value_col: str, *,
                 levels: int = 5, res_deg: float = 1.0,
                 num_buckets: int = 32):
    """Zoom stack (level, cy, cx, n, sum_v): level 0 is the base raster,
    level k folds level k-1 by halving both cell indices — each fold is
    a small bounded aggregate over the shrinking cell table, the input
    stream is scanned exactly once."""
    from ..util import pin_for_shuffle
    from .relational import hash_aggregate

    cur = pin_for_shuffle(base_raster(ds, lat_col, lon_col, value_col,
                                      res_deg=res_deg,
                                      num_buckets=num_buckets))

    def with_level(dset, k: int):
        def add(b: pa.Table) -> pa.Table:
            return pa.table({
                "level": np.full(b.num_rows, k, dtype=np.int64),
                "cy": np.asarray(b["iy"], dtype=np.int64),
                "cx": np.asarray(b["ix"], dtype=np.int64),
                "n": np.asarray(b["n"], dtype=np.int64),
                "sum_v": np.asarray(b["sum_v"], dtype=np.int64)})
        return dset.map_batches(add, batch_format="pyarrow")

    out = with_level(cur, 0)
    for k in range(1, levels):
        def halve(b: pa.Table) -> pa.Table:
            return pa.table({
                "iy": np.asarray(b["iy"], dtype=np.int64) // 2,
                "ix": np.asarray(b["ix"], dtype=np.int64) // 2,
                "n": np.asarray(b["n"], dtype=np.int64),
                "sum_v": np.asarray(b["sum_v"], dtype=np.int64)})
        cur = pin_for_shuffle(hash_aggregate(
            cur.map_batches(halve, batch_format="pyarrow"),
            ["iy", "ix"], {"n": ("n", "sum"), "sum_v": ("sum_v", "sum")},
            num_buckets=num_buckets))
        out = out.union(with_level(cur, k))
    return out


def focal_mean(ds, lat_col: str, lon_col: str, value_col: str, *,
               res_deg: float = 1.0, num_buckets: int = 32,
               round_decimals: int = 6):
    """3x3 focal mean of per-cell counts over cells WITH data ->
    (cy, cx, n_nbr, sum_nbr, focal_mean).

    Shape: cell table -> 9-way neighbor fan-out (map-side, bounded) ->
    one aggregate; receivers that are not themselves data cells are
    dropped via a max(center-flag) partial, so the result set equals the
    base raster's (= the oracle's inner range join on existing cells).
    """
    from .relational import hash_aggregate

    base = base_raster(ds, lat_col, lon_col, value_col,
                       res_deg=res_deg, num_buckets=num_buckets)

    dy = np.repeat(np.array([-1, 0, 1], dtype=np.int64), 3)
    dx = np.tile(np.array([-1, 0, 1], dtype=np.int64), 3)
    is_center = ((dy == 0) & (dx == 0)).astype(np.int64)

    def fanout(b: pa.Table) -> pa.Table:
        iy = np.asarray(b["iy"], dtype=np.int64)
        ix = np.asarray(b["ix"], dtype=np.int64)
        n = np.asarray(b["n"], dtype=np.int64)
        m = len(iy)
        return pa.table({
            "cy": (iy[:, None] + dy[None, :]).ravel(),
            "cx": (ix[:, None] + dx[None, :]).ravel(),
            "nb": np.repeat(n, 9),
            "ctr": np.tile(is_center, m)})

    agg = hash_aggregate(base.map_batches(fanout, batch_format="pyarrow"),
                         ["cy", "cx"],
                         {"n_nbr": (None, "count"), "sum_nbr": ("nb", "sum"),
                          "has_ctr": ("ctr", "max")},
                         num_buckets=num_buckets)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["has_ctr"] == 1].copy()
        df["focal_mean"] = np.round(
            df["sum_nbr"].to_numpy() / df["n_nbr"].to_numpy(),
            round_decimals)
        return df[["cy", "cx", "n_nbr", "sum_nbr", "focal_mean"]]

    return agg.map_batches(fin, batch_format="pandas")


def raster_resample_linear(ds, lat_col: str, lon_col: str, value_col: str, *,
                           res_src: float = 1.0, res_dst: float = 1.5,
                           num_buckets: int = 32, round_decimals: int = 6):
    """Resample the per-cell count raster onto a coarser/finer grid with
    a normalized tent (bilinear) kernel -> (jy, jx, value).

    Shape: one sample-to-src-cell aggregate, then each src cell fans out
    to the <= 2x2 dst stencils its center falls in (emitted as a 3x3
    candidate window filtered by weight > 0 — branch-free and identical
    in the SQL oracle), one aggregate by dst cell; value =
    sum(w*v)/sum(w), i.e. partial stencils renormalize (masked-bilinear
    convention, the reference's masked-mean spirit).

    Determinism: with res_dst/res_src a small binary-fraction ratio
    (e.g. 1.5) every weight is an exact float64 binary fraction and
    w*count products are exact, so the sums are order-free; the final
    division is rounded in both engines.
    """
    from .relational import hash_aggregate

    base = base_raster(ds, lat_col, lon_col, value_col,
                       res_deg=res_src, num_buckets=num_buckets)
    r = res_dst / res_src
    # candidate dst indices solve |iy - (r*jy + (r-1)/2)| < 1, an
    # interval of width 2/r in jy; the 3-wide window around its upper
    # floor covers it only when 2/r <= 3
    if r < 2.0 / 3.0:
        raise ValueError(
            f"res_dst/res_src = {r:.3f} < 2/3: upsampling that steep "
            "needs a wider candidate window than the 3x3 emitted here")
    # integers in an open interval of width 2/r <= 3 all lie within two
    # below the floor of its upper end
    off = np.array([-2, -1, 0], dtype=np.int64)
    ub = (3.0 - r) / 2.0   # upper bound offset: jy < (iy + ub) / r

    def fanout(b: pa.Table) -> pa.Table:
        iy = np.asarray(b["iy"], dtype=np.int64)
        ix = np.asarray(b["ix"], dtype=np.int64)
        n = np.asarray(b["n"], dtype=np.int64)
        cy = np.floor((iy + ub) / r).astype(np.int64)
        cx = np.floor((ix + ub) / r).astype(np.int64)
        # 3x3 candidate window per src cell
        jy = (cy[:, None] + off[None, :])[:, :, None]
        jx = (cx[:, None] + off[None, :])[:, None, :]
        jy = np.broadcast_to(jy, (len(iy), 3, 3)).reshape(-1)
        jx = np.broadcast_to(jx, (len(ix), 3, 3)).reshape(-1)
        iyr = np.repeat(iy, 9)
        ixr = np.repeat(ix, 9)
        nr = np.repeat(n, 9)
        dy = np.abs(iyr - (r * jy + (r - 1.0) / 2.0))
        dx = np.abs(ixr - (r * jx + (r - 1.0) / 2.0))
        keep = (dy < 1.0) & (dx < 1.0)
        w = (1.0 - dy[keep]) * (1.0 - dx[keep])
        return pa.table({"jy": jy[keep], "jx": jx[keep],
                         "wv": w * nr[keep], "w": w})

    agg = hash_aggregate(base.map_batches(fanout, batch_format="pyarrow"),
                         ["jy", "jx"],
                         {"sum_wv": ("wv", "sum"), "sum_w": ("w", "sum")},
                         num_buckets=num_buckets)

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df["value"] = np.round(df["sum_wv"] / df["sum_w"], round_decimals)
        return df[["jy", "jx", "value"]]

    return agg.map_batches(fin, batch_format="pandas")
