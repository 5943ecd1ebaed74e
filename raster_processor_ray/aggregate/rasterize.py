"""Rasterization: per-cell masked aggregation in ONE shuffle.

The scalable shape of the reference's ``RasterProcessor.call_aggregator``
loop (reference raster_proc.py:686-739, which slices per-cell row lists in
driver memory and ships them to a process pool):

1. **map-side partial aggregation** (``partial_aggregate_batch``): inside
   ``map_batches`` each Arrow batch is grouped by ``grid_cell`` with
   ``np.unique`` + ``np.bincount`` and reduced to one partial row per
   (cell, batch) — sums, counts, mins/maxs for every aggregate family.
   Only these partials cross the wire.
2. **combine shuffle**: ``ds.groupby("grid_cell").aggregate(Sum/Min/Max …)``
   over the partials — the single all-to-all exchange.
3. **final map** (``finalize_cells``): vectorized derivation of means,
   weighted means, composite areas, ratios, consensus flags, mode, and the
   qual roll-up from the combined partials. No per-cell Python loop.

Aggregator semantics implemented (SURVEY.md §2.5 — reference raster_agg.py):

- A1  simple masked mean/sum           (raster_agg.py:51-57)
- A2  pixel counts                     (raster_agg.py:85,315,385,454)
- A3  inverse-variance weighted mean   (raster_agg.py:69-78)
- A4  height + uncertainty (sigma from 1/sqrt(sum_w))  (raster_agg.py:154-179)
- A5  composite water area, per-row class-dependent contribution computed
      map-side then summed             (raster_agg.py:181-222; README eq 2)
- A6  water fraction = area / geodetic cell area (raster_agg.py:206-215;
      cell area per raster_crs.py:30-46)
- A7  dark fraction = ratio of sums, 0-guard  (raster_agg.py:245-276)
- A9  ice-flag consensus: all-equal else partial=1  (raster_agg.py:278-292)
- A10 classification mode              (raster_agg.py:516-520)
- A11 qual roll-ups: condition counts -> bit flags + summary enum max,
      empty cell -> BAD + NO_PIXELS    (raster_agg.py:304-514)
- A12 two-pass good/sus -> +degraded fallback: BOTH partial families are
      computed map-side; the final map selects per cell
      (raster_proc.py:654-684 — the one non-associative piece)
- A13 min/max time coverage            (raster_proc.py:527-550)

Null semantics: every input column may be null (the reference's masked
arrays); masked rows drop out of the sums exactly as ``np.ma`` drops them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import config as C
from ..config import AggConfig
from ..geo import crs
from ..geo.cells import GridSpec, grid_tile_id

# ---------------------------------------------------------------------------
# row-level kernels
# ---------------------------------------------------------------------------

def summary_qual_from_bits(qual_bits: np.ndarray) -> np.ndarray:
    """u32 bitmask -> {GOOD, SUSPECT, DEGRADED, BAD} summary enum
    (analog of reference get_summary_qual_flag, products.py:1787-1798,
    with suspect/degraded/bad masks per get_qual_mask, 1800-1816)."""
    q = np.zeros(qual_bits.shape, dtype=np.uint8)
    q = np.where(qual_bits & np.uint32(C.SUSPECT_MASK), C.QUAL_SUSPECT, q)
    q = np.where(qual_bits & np.uint32(C.DEGRADED_MASK), C.QUAL_DEGRADED, q)
    q = np.where(qual_bits & np.uint32(C.BAD_MASK), C.QUAL_BAD, q)
    return q.astype(np.uint8)


def _col(batch: pa.Table, name: str, fill, dtype) -> tuple[np.ndarray, np.ndarray]:
    """Column -> (values-with-fill, valid-mask) numpy pair."""
    if name not in batch.column_names:
        n = batch.num_rows
        return np.full(n, fill, dtype=dtype), np.zeros(n, dtype=bool)
    arr = batch[name]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    valid = ~np.asarray(arr.is_null())
    vals = np.asarray(arr.fill_null(fill)).astype(dtype)
    return vals, valid


# ---------------------------------------------------------------------------
# partial-column schema
# ---------------------------------------------------------------------------

def partial_sum_columns(cfg: AggConfig, input_cols: set[str] | None = None) -> list[str]:
    """Partial-column schema, ADAPTIVE to the input: aggregate families
    whose input columns are absent are dropped entirely (a pages table
    with only value/ts pays ~20 partial columns, not 53 — partial width
    is shuffle bytes, the scarce resource)."""
    has = (lambda c: True) if input_cols is None else (lambda c: c in input_cols)
    cols = ["n_all"]
    for f in ("gs", "gsd"):
        cols += [f"n_v_{f}", f"sum_v_{f}", f"sum_w_{f}", f"sum_wv_{f}"]
        if has("area"):
            cols += [f"n_area_{f}", f"area_composite_{f}", f"area_simple_{f}",
                     f"area_fracm_{f}", f"dark_area_{f}", f"sum_frac_u2_{f}"]
    if has("class_qual") or has("geo_qual"):
        cols += ["n_suspect", "n_degraded", "n_bad"]
    if has("bright_land"):
        cols += ["n_bright"]
    if has("dark_flag"):
        cols += ["n_darkflag"]
    if has("low_coh"):
        cols += ["n_low_coh"]
    if has("cross_track"):
        cols += ["n_far_range"]
    if has("value"):
        cols += ["n_out_of_range"]
    if has("ice_a"):
        cols += ["n_ice_a"]
    if has("ice_b"):
        cols += ["n_ice_b"]
    if has("klass"):
        cols += [f"cnt_k{k}" for k in cfg.klass_domain]
    return cols


PARTIAL_MIN_COLS = ["min_ts", "min_ice_a", "min_ice_b"]
PARTIAL_MAX_COLS = ["max_ts", "max_ice_a", "max_ice_b"]


def partial_minmax_columns(input_cols: set[str] | None = None):
    if input_cols is None:
        return PARTIAL_MIN_COLS, PARTIAL_MAX_COLS
    mins, maxs = [], []
    if "ts" in input_cols:
        mins.append("min_ts"); maxs.append("max_ts")
    if "ice_a" in input_cols:
        mins.append("min_ice_a"); maxs.append("max_ice_a")
    if "ice_b" in input_cols:
        mins.append("min_ice_b"); maxs.append("max_ice_b")
    return mins, maxs


def partial_aggregate_batch(batch: pa.Table, cfg: AggConfig = C.DEFAULT_AGG,
                            cell_col: str = "grid_cell") -> pa.Table:
    """One partial row per distinct cell in this batch (map-side combine)."""
    n = batch.num_rows
    cell = np.asarray(batch[cell_col]).astype(np.int64)
    keep = cell >= 0  # out-of-grid rows were keyed -1 by the binning stage
    if not keep.all():
        batch = batch.filter(pa.array(keep))
        cell = cell[keep]
        n = batch.num_rows
    present = set(batch.column_names)
    sum_cols = partial_sum_columns(cfg, present)
    min_cols, max_cols = partial_minmax_columns(present)
    if n == 0:
        names = [cell_col] + sum_cols + min_cols + max_cols
        return pa.table({nm: pa.array([], type=pa.int64() if nm == cell_col else pa.float64())
                         for nm in names})

    value, value_ok = _col(batch, "value", np.nan, np.float64)
    sigma, sigma_ok = _col(batch, "sigma", cfg.sigma_deweight_fill, np.float64)
    area, area_ok = _col(batch, "area", 0.0, np.float64)
    frac, frac_ok = _col(batch, "frac", 0.0, np.float64)
    frac_u, _ = _col(batch, "frac_uncert", 0.0, np.float64)
    klass, klass_ok = _col(batch, "klass", 255, np.int64)
    class_qual, cq_ok = _col(batch, "class_qual", 0, np.uint32)
    geo_qual, gq_ok = _col(batch, "geo_qual", 0, np.uint32)
    bright, bright_ok = _col(batch, "bright_land", False, bool)
    darkf, darkf_ok = _col(batch, "dark_flag", False, bool)
    low_coh, low_coh_ok = _col(batch, "low_coh", False, bool)
    cross_track, ct_ok = _col(batch, "cross_track", 0.0, np.float64)
    ts, ts_ok = _col(batch, "ts", np.nan, np.float64)
    ice_a, ice_a_ok = _col(batch, "ice_a", 0, np.int64)
    ice_b, ice_b_ok = _col(batch, "ice_b", 0, np.int64)

    # row summary qual = max(summary(class_qual), summary(geo_qual));
    # a null qual column means the condition is unknown -> treated GOOD
    row_qual = np.maximum(summary_qual_from_bits(class_qual * cq_ok),
                          summary_qual_from_bits(geo_qual * gq_ok))
    fam_masks = {
        "gs": row_qual <= C.QUAL_SUSPECT,
        "gsd": row_qual <= C.QUAL_DEGRADED,
    }

    interior = np.isin(klass, C.INTERIOR_CLASSES) & klass_ok
    water_edge = np.isin(klass, C.WATER_EDGE_CLASSES) & klass_ok
    dark = np.isin(klass, C.DARK_CLASSES) & klass_ok
    water_any = interior | water_edge | dark

    # composite-area per-row contribution (README eq 2 / raster_agg.py:181-222):
    # interior + dark count fully; edges count by water_frac
    contrib_composite = np.where(interior | dark, area, 0.0) + np.where(water_edge, area * frac, 0.0)
    contrib_simple = np.where(water_any, area, 0.0)
    contrib_fracm = area * frac  # water_fraction method: all classes by frac
    contrib_dark = np.where(dark, area, 0.0)

    uniq, inv = np.unique(cell, return_inverse=True)
    m = len(uniq)

    def bsum(weights=None, mask=None) -> np.ndarray:
        if mask is not None:
            if weights is None:
                return np.bincount(inv[mask], minlength=m).astype(np.float64)
            return np.bincount(inv[mask], weights=weights[mask], minlength=m)
        if weights is None:
            return np.bincount(inv, minlength=m).astype(np.float64)
        return np.bincount(inv, weights=weights, minlength=m)

    out: dict[str, np.ndarray] = {"grid_cell": uniq, "n_all": bsum()}

    w = 1.0 / np.where(sigma_ok & (sigma > 0), sigma, cfg.sigma_deweight_fill) ** 2
    for f, fm in fam_masks.items():
        vmask = fm & value_ok
        out[f"n_v_{f}"] = bsum(mask=vmask)
        out[f"sum_v_{f}"] = bsum(np.where(vmask, value, 0.0))
        out[f"sum_w_{f}"] = bsum(np.where(vmask, w, 0.0))
        out[f"sum_wv_{f}"] = bsum(np.where(vmask, w * value, 0.0))
        if f"n_area_{f}" in sum_cols:
            amask = fm & area_ok & klass_ok
            out[f"n_area_{f}"] = bsum(mask=amask)
            out[f"area_composite_{f}"] = bsum(np.where(amask, contrib_composite, 0.0))
            out[f"area_simple_{f}"] = bsum(np.where(amask, contrib_simple, 0.0))
            out[f"area_fracm_{f}"] = bsum(np.where(amask, contrib_fracm, 0.0))
            out[f"dark_area_{f}"] = bsum(np.where(amask, contrib_dark, 0.0))
            out[f"sum_frac_u2_{f}"] = bsum(np.where(amask, (area * frac_u) ** 2, 0.0))

    if "n_suspect" in sum_cols:
        out["n_suspect"] = bsum(mask=row_qual == C.QUAL_SUSPECT)
        out["n_degraded"] = bsum(mask=row_qual == C.QUAL_DEGRADED)
        out["n_bad"] = bsum(mask=row_qual == C.QUAL_BAD)
    if "n_bright" in sum_cols:
        out["n_bright"] = bsum(mask=bright & bright_ok)
    if "n_darkflag" in sum_cols:
        out["n_darkflag"] = bsum(mask=darkf & darkf_ok)
    if "n_low_coh" in sum_cols:
        out["n_low_coh"] = bsum(mask=low_coh & low_coh_ok)
    if "n_far_range" in sum_cols:
        out["n_far_range"] = bsum(mask=(np.abs(cross_track) > cfg.far_range_cross_track) & ct_ok)
    if "n_out_of_range" in sum_cols:
        out["n_out_of_range"] = bsum(
            mask=value_ok & ((value < cfg.value_valid_min) | (value > cfg.value_valid_max)))
    if "n_ice_a" in sum_cols:
        out["n_ice_a"] = bsum(mask=ice_a_ok)
    if "n_ice_b" in sum_cols:
        out["n_ice_b"] = bsum(mask=ice_b_ok)
    if "klass" in present:
        for k in cfg.klass_domain:
            out[f"cnt_k{k}"] = bsum(mask=klass_ok & (klass == k))

    # min/max partials via ufunc.at (few columns; rows per batch are bounded)
    def bmin(vals, mask, empty):
        r = np.full(m, empty, dtype=np.float64)
        if mask.any():
            np.minimum.at(r, inv[mask], vals[mask])
        return r

    def bmax(vals, mask, empty):
        r = np.full(m, empty, dtype=np.float64)
        if mask.any():
            np.maximum.at(r, inv[mask], vals[mask])
        return r

    if "min_ts" in min_cols:
        out["min_ts"] = bmin(ts, ts_ok, np.inf)
        out["max_ts"] = bmax(ts, ts_ok, -np.inf)
    if "min_ice_a" in min_cols:
        out["min_ice_a"] = bmin(ice_a.astype(np.float64), ice_a_ok, np.inf)
        out["max_ice_a"] = bmax(ice_a.astype(np.float64), ice_a_ok, -np.inf)
    if "min_ice_b" in min_cols:
        out["min_ice_b"] = bmin(ice_b.astype(np.float64), ice_b_ok, np.inf)
        out["max_ice_b"] = bmax(ice_b.astype(np.float64), ice_b_ok, -np.inf)
    return pa.table({k: pa.array(v) for k, v in out.items()})


def combine_aggs(cfg: AggConfig = C.DEFAULT_AGG):
    """Sum/Min/Max AggregateFns for the combine shuffle (kept for parity
    tests; the production path uses the bucketed vectorized combine below —
    Ray's built-in ``aggregate()`` pays per-group Python overhead, measured
    ~50x slower at 15k groups x 53 agg columns)."""
    from ray.data.aggregate import Max, Min, Sum

    aggs = [Sum(c, alias_name=c) for c in partial_sum_columns(cfg)]
    aggs += [Min(c, alias_name=c) for c in PARTIAL_MIN_COLS]
    aggs += [Max(c, alias_name=c) for c in PARTIAL_MAX_COLS]
    return aggs


def combine_partials_df(df, cfg: AggConfig = C.DEFAULT_AGG,
                        cell_col: str = "grid_cell"):
    """Vectorized pandas combine of partial rows by cell (used per bucket).
    Adaptive to whichever partial columns the map side emitted."""
    agg = {c: "sum" for c in partial_sum_columns(cfg) if c in df.columns}
    agg.update({c: "min" for c in PARTIAL_MIN_COLS if c in df.columns})
    agg.update({c: "max" for c in PARTIAL_MAX_COLS if c in df.columns})
    return df.groupby(cell_col, as_index=False).agg(agg)


def combine_partials_table(t: "pa.Table", cfg: AggConfig = C.DEFAULT_AGG,
                           cell_col: str = "grid_cell") -> "pa.Table":
    """Arrow/numpy combine of partial rows by cell — the hottest reduce
    in the engine, without the pandas round trip: one stable argsort on
    the cell column + one ``np.<op>.reduceat`` per partial column.
    Output rows are sorted ascending by cell (the same ordering contract
    the pandas groupby provided, which the fold path's searchsorted
    zonal alignment relies on). Integer columns reduce in int64 (exact);
    float columns in float64. Nulls (possible only when a permissive
    concat unified differing partial schemas) read as the op's identity
    (0 / +inf / -inf)."""
    cells = np.asarray(t[cell_col], dtype=np.int64)
    order = np.argsort(cells, kind="stable")
    cs = cells[order]
    starts = (np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
              if len(cs) else np.empty(0, dtype=np.int64))
    present = set(t.column_names)
    out = {cell_col: pa.array(cs[starts])}

    def reduced(name: str, ufunc, fill: float):
        col = t[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            v = col.to_numpy(zero_copy_only=False).astype(np.float64)
            v = np.where(np.isnan(v), fill, v)
        else:
            v = col.to_numpy(zero_copy_only=False)
        v = v[order]
        return (ufunc.reduceat(v, starts) if len(starts)
                else v[:0])

    for c in partial_sum_columns(cfg):
        if c in present:
            out[c] = pa.array(reduced(c, np.add, 0.0))
    for c in PARTIAL_MIN_COLS:
        if c in present:
            out[c] = pa.array(reduced(c, np.minimum, np.inf))
    for c in PARTIAL_MAX_COLS:
        if c in present:
            out[c] = pa.array(reduced(c, np.maximum, -np.inf))
    return pa.table(out)


# ---------------------------------------------------------------------------
# final combine
# ---------------------------------------------------------------------------

def finalize_cells(batch: pa.Table, grid: GridSpec, cfg: AggConfig = C.DEFAULT_AGG,
                   cell_col: str = "grid_cell") -> pa.Table:
    """Vectorized final map over the combined partials -> raster cell rows."""
    m = batch.num_rows
    present = set(batch.column_names)

    def g(name: str) -> np.ndarray:
        # missing partial columns (adaptive schema) read as empty-sentinel
        if name not in present:
            fill = np.inf if name.startswith("min_") else (
                -np.inf if name.startswith("max_") else 0.0)
            return np.full(m, fill)
        return np.asarray(batch[name].to_pandas().fillna(0.0), dtype=np.float64)

    cell = np.asarray(batch[cell_col]).astype(np.int64)

    iy = cell // grid.size_x
    ix = cell % grid.size_x
    tile_id = grid_tile_id(grid, iy, ix)

    # --- A12 two-pass family selection ---
    n_gs = g("n_v_gs")
    use_gs = n_gs >= cfg.num_good_sus_pix_thresh
    used_degraded = ~use_gs

    def fam(colbase: str) -> np.ndarray:
        return np.where(use_gs, g(colbase + "_gs"), g(colbase + "_gsd"))

    n_v = fam("n_v")
    sum_v, sum_w, sum_wv = fam("sum_v"), fam("sum_w"), fam("sum_wv")
    n_area = fam("n_area")

    with np.errstate(invalid="ignore", divide="ignore"):
        mean_v = np.where(n_v > 0, sum_v / n_v, np.nan)
        wmean_v = np.where(sum_w > 0, sum_wv / sum_w, np.nan)
        wmean_u = np.where(sum_w > 0, np.sqrt(1.0 / np.where(sum_w > 0, sum_w, 1.0)), np.nan)

    value_v = wmean_v if cfg.height_agg_method == "weight" else mean_v

    area_col = {"composite": "area_composite", "simple": "area_simple",
                "water_fraction": "area_fracm"}[cfg.area_agg_method]
    water_area = fam(area_col)
    dark_area = fam("dark_area")
    water_area_u = np.sqrt(fam("sum_frac_u2"))

    # cell area for the water-fraction denominator: projected (UTM-style)
    # grids use res^2 (reference raster_agg.py aggregate_water_area,
    # projection_type=='utm'); geographic grids use the geodetic WGS84
    # patch area (raster_crs.py:30-46)
    if grid.projected:
        cell_area = np.full(m, grid.res * grid.res)
    else:
        lat_lo = grid.y_min + (iy.astype(np.float64) - 0.5) * grid.res
        lat_hi = lat_lo + grid.res
        cell_area = crs.wgs84_cell_area(lat_lo, lat_hi, grid.res)
    with np.errstate(invalid="ignore", divide="ignore"):
        water_frac = np.where(n_area > 0, water_area / cell_area, np.nan)
        dark_frac = np.where(water_area > 0, dark_area / water_area, 0.0)
        dark_frac = np.where(n_area > 0, dark_frac, np.nan)

    # --- ice consensus (A9): all equal -> that value; mixed -> 1; none -> null
    def consensus(mn, mx, cnt):
        vals = np.where(mn == mx, mn, 1.0)
        return np.where(cnt > 0, vals, np.nan)

    ice_a = consensus(g("min_ice_a"), g("max_ice_a"), g("n_ice_a"))
    ice_b = consensus(g("min_ice_b"), g("max_ice_b"), g("n_ice_b"))

    # --- classification mode (A10): argmax count, ties -> smallest class
    kdom = np.array(cfg.klass_domain, dtype=np.int64)
    korder = np.sort(kdom)
    counts = np.stack([g(f"cnt_k{k}") for k in korder], axis=1) if m else np.zeros((0, len(korder)))
    any_k = counts.sum(axis=1) > 0 if m else np.zeros(0, dtype=bool)
    mode_idx = counts.argmax(axis=1) if m else np.zeros(0, dtype=np.int64)
    mode_klass = np.where(any_k, korder[mode_idx], -1)

    # --- qual roll-up (A11): bits from condition counts, summary from bits
    n_all = g("n_all")
    bits = np.zeros(m, dtype=np.uint32)
    bits |= np.where(g("n_suspect") > 0, np.uint32(C.QUAL_BIT_SUSPECT), 0).astype(np.uint32)
    bits |= np.where(g("n_degraded") > 0, np.uint32(C.QUAL_BIT_DEGRADED), 0).astype(np.uint32)
    bits |= np.where(g("n_bad") > 0, np.uint32(C.QUAL_BIT_BAD), 0).astype(np.uint32)
    bits |= np.where(g("n_bright") > 0, np.uint32(C.QUAL_BIT_BRIGHT_LAND), 0).astype(np.uint32)
    bits |= np.where(g("n_darkflag") > 0, np.uint32(C.QUAL_BIT_DARK_WATER), 0).astype(np.uint32)
    bits |= np.where(g("n_low_coh") > 0, np.uint32(C.QUAL_BIT_LOW_COHERENCE), 0).astype(np.uint32)
    bits |= np.where(g("n_far_range") > 0, np.uint32(C.QUAL_BIT_FAR_RANGE), 0).astype(np.uint32)
    bits |= np.where(g("n_out_of_range") > 0, np.uint32(C.QUAL_BIT_VALUE_OUT_OF_RANGE), 0).astype(np.uint32)
    bits |= np.where(wmean_u > cfg.large_uncert_thresh, np.uint32(C.QUAL_BIT_LARGE_UNCERT), 0).astype(np.uint32)
    bits |= np.where((n_v > 0) & (n_v < cfg.few_pix_thresh), np.uint32(C.QUAL_BIT_FEW_PIXELS), 0).astype(np.uint32)
    bits |= np.where(n_v == 0, np.uint32(C.QUAL_BIT_NO_PIXELS | C.QUAL_BIT_FEW_PIXELS), 0).astype(np.uint32)

    qual = np.full(m, C.QUAL_GOOD, dtype=np.uint8)
    qual = np.where(bits & (C.QUAL_BIT_SUSPECT | C.QUAL_BIT_BRIGHT_LAND | C.QUAL_BIT_DARK_WATER
                            | C.QUAL_BIT_LOW_COHERENCE | C.QUAL_BIT_FEW_PIXELS
                            | C.QUAL_BIT_LARGE_UNCERT), C.QUAL_SUSPECT, qual)
    qual = np.where(bits & (C.QUAL_BIT_DEGRADED | C.QUAL_BIT_FAR_RANGE), C.QUAL_DEGRADED, qual)
    qual = np.where(used_degraded, np.maximum(qual, C.QUAL_DEGRADED), qual)
    qual = np.where(bits & (C.QUAL_BIT_BAD | C.QUAL_BIT_VALUE_OUT_OF_RANGE), C.QUAL_BAD, qual)
    qual = np.where(n_v == 0, C.QUAL_BAD, qual)  # empty -> BAD (raster_agg.py:311-314)

    min_ts = g("min_ts")
    max_ts = g("max_ts")

    def nn(x):  # nan for empty sentinels
        return np.where(np.isfinite(x), x, np.nan)

    return pa.table({
        "grid_cell": pa.array(cell),
        "tile_id": pa.array(tile_id),
        "iy": pa.array(iy.astype(np.int32)),
        "ix": pa.array(ix.astype(np.int32)),
        "n_pix": pa.array(n_all.astype(np.int64)),
        "n_value_pix": pa.array(n_v.astype(np.int64)),
        "used_degraded": pa.array(used_degraded),
        "mean_value": pa.array(mean_v),
        "wmean_value": pa.array(value_v),
        "wmean_uncert": pa.array(wmean_u),
        "water_area": pa.array(water_area),
        "water_area_uncert": pa.array(water_area_u),
        "water_frac": pa.array(water_frac),
        "dark_frac": pa.array(dark_frac),
        "mode_klass": pa.array(mode_klass.astype(np.int64)),
        "ice_clim": pa.array(ice_a),
        "ice_dyn": pa.array(ice_b),
        "min_ts": pa.array(nn(min_ts)),
        "max_ts": pa.array(nn(max_ts)),
        "qual": pa.array(qual.astype(np.int64)),
        "qual_bitwise": pa.array(bits.astype(np.int64)),
    })


def rasterize(ds, grid: GridSpec, cfg: AggConfig = C.DEFAULT_AGG,
              cell_col: str = "grid_cell", *, num_buckets: int = 64):
    """points Dataset (with ``grid_cell``) -> raster cells Dataset.

    Three stages (module docstring): map-side partials, then a bucketed
    hash combine — partials get ``bucket = cell % num_buckets`` and the
    shuffle groups by *bucket*, with a vectorized pandas groupby inside
    each bucket (one Python call per bucket, not per cell) — then the
    vectorized final map.

    Skew note: hot cells cost nothing extra here — a cell's partials are
    bounded by the number of input blocks regardless of its row count
    (the map-side combine is the salting). ``num_buckets`` should be
    ~2-4x the reducer CPU count at scale.
    """
    partials = ds.map_batches(
        lambda b: partial_aggregate_batch(b, cfg, cell_col),
        batch_format="pyarrow",
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        bucket = (np.asarray(b[cell_col]).astype(np.int64) % num_buckets)
        return b.append_column("_bucket", pa.array(bucket))

    def combine_bucket(t: pa.Table) -> pa.Table:
        return combine_partials_table(t.drop_columns(["_bucket"]), cfg,
                                      cell_col)

    from ..util import pin_for_shuffle

    combined = (
        pin_for_shuffle(partials.map_batches(add_bucket, batch_format="pyarrow"))
        .groupby("_bucket")
        .map_groups(combine_bucket, batch_format="pyarrow")
    )
    return combined.map_batches(
        lambda b: finalize_cells(b, grid, cfg, cell_col),
        batch_format="pyarrow",
    )
