"""Rasterization golden tests: the Ray pipeline vs an independent
single-threaded per-cell NumPy oracle implementing the reference's
aggregation formulas (raster_agg.py semantics; see FIXTURES.md F5)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raster_processor_ray import config as C
from raster_processor_ray.aggregate.rasterize import (
    finalize_cells, partial_aggregate_batch, rasterize, summary_qual_from_bits)
from raster_processor_ray.geo import crs
from raster_processor_ray.geo.cells import GridSpec, bin_to_grid, grid_cell_key
from raster_processor_ray.sources.samples import make_samples_batch

GRID = GridSpec(x_min=-6, y_min=-6, x_max=6, y_max=6, res=0.1, tile_size=64)
CFG = C.DEFAULT_AGG
N = 8_000


def add_cell(batch: pa.Table) -> pa.Table:
    iy, ix, ok = bin_to_grid(GRID, np.asarray(batch["lon"]), np.asarray(batch["lat"]))
    cell = np.where(ok, grid_cell_key(GRID, iy, ix), -1)
    return batch.append_column("grid_cell", pa.array(cell, type=pa.int64()))


def oracle_rasterize(df: pd.DataFrame) -> pd.DataFrame:
    """Independent per-cell loop implementing the aggregation semantics."""
    out_rows = []
    df = df[df.grid_cell >= 0].copy()
    for bcol in ("bright_land", "dark_flag", "low_coh"):
        df[bcol] = df[bcol].astype("boolean").fillna(False).astype(bool)
    for cell, grp in df.groupby("grid_cell"):
        cq = grp.class_qual.fillna(0).to_numpy(dtype=np.uint32)
        gq = grp.geo_qual.fillna(0).to_numpy(dtype=np.uint32)

        def summ(bits):
            q = np.zeros(len(bits), dtype=int)
            q[(bits & C.SUSPECT_MASK) != 0] = 1
            q[(bits & C.DEGRADED_MASK) != 0] = 2
            q[(bits & C.BAD_MASK) != 0] = 3
            return q

        rq = np.maximum(summ(cq), summ(gq))
        val = grp.value.to_numpy(dtype=np.float64)
        val_ok = grp.value.notna().to_numpy()
        n_gs = int((val_ok & (rq <= 1)).sum())
        use_gs = n_gs >= CFG.num_good_sus_pix_thresh
        fam = (rq <= 1) if use_gs else (rq <= 2)

        vmask = fam & val_ok
        n_v = int(vmask.sum())
        sigma = grp.sigma.to_numpy(dtype=np.float64)
        sig_ok = grp.sigma.notna().to_numpy() & (sigma > 0)
        w = 1.0 / np.where(sig_ok, sigma, CFG.sigma_deweight_fill) ** 2
        mean_v = val[vmask].mean() if n_v else np.nan
        sw = w[vmask].sum()
        wmean = (w[vmask] * val[vmask]).sum() / sw if n_v else np.nan
        wmean_u = np.sqrt(1.0 / sw) if n_v else np.nan

        area = grp.area.to_numpy(dtype=np.float64)
        frac = grp.frac.to_numpy(dtype=np.float64)
        frac_u = grp.frac_uncert.fillna(0).to_numpy(dtype=np.float64)
        klass = grp.klass.to_numpy(dtype=np.float64)
        amask = fam & grp.area.notna().to_numpy() & grp.klass.notna().to_numpy()
        interior = np.isin(klass, C.INTERIOR_CLASSES)
        edge = np.isin(klass, C.WATER_EDGE_CLASSES)
        dark = np.isin(klass, C.DARK_CLASSES)
        frac0 = np.where(np.isnan(frac), 0.0, frac)
        contrib = np.where(interior | dark, area, 0.0) + np.where(edge, area * frac0, 0.0)
        water_area = contrib[amask].sum() if amask.any() else 0.0
        dark_area = area[amask & dark].sum() if (amask & dark).any() else 0.0
        n_area = int(amask.sum())
        water_area_u = np.sqrt(((area[amask] * frac_u[amask]) ** 2).sum()) if amask.any() else 0.0

        iy = cell // GRID.size_x
        lat_lo = GRID.y_min + (iy - 0.5) * GRID.res
        cell_area = float(crs.wgs84_cell_area(lat_lo, lat_lo + GRID.res, GRID.res))
        water_frac = water_area / cell_area if n_area else np.nan
        dark_frac = (dark_area / water_area if water_area > 0 else 0.0) if n_area else np.nan

        def consensus(vals):
            v = vals.dropna().to_numpy()
            if len(v) == 0:
                return np.nan
            return float(v[0]) if (v == v[0]).all() else 1.0

        kvalid = grp.klass.dropna().astype(int)
        if len(kvalid):
            cnt = kvalid.value_counts()
            best = cnt[cnt == cnt.max()].index.min()  # ties -> smallest class
        else:
            best = -1

        n_all = len(grp)
        bits = 0
        if (rq == 1).any():
            bits |= C.QUAL_BIT_SUSPECT
        if (rq == 2).any():
            bits |= C.QUAL_BIT_DEGRADED
        if (rq == 3).any():
            bits |= C.QUAL_BIT_BAD
        if grp.bright_land.any():
            bits |= C.QUAL_BIT_BRIGHT_LAND
        if grp.dark_flag.any():
            bits |= C.QUAL_BIT_DARK_WATER
        if grp.low_coh.any():
            bits |= C.QUAL_BIT_LOW_COHERENCE
        ct = grp.cross_track.to_numpy(dtype=np.float64)
        if ((np.abs(ct) > CFG.far_range_cross_track) & grp.cross_track.notna()).any():
            bits |= C.QUAL_BIT_FAR_RANGE
        if (val_ok & ((val < CFG.value_valid_min) | (val > CFG.value_valid_max))).any():
            bits |= C.QUAL_BIT_VALUE_OUT_OF_RANGE
        if n_v and wmean_u > CFG.large_uncert_thresh:
            bits |= C.QUAL_BIT_LARGE_UNCERT
        if 0 < n_v < CFG.few_pix_thresh:
            bits |= C.QUAL_BIT_FEW_PIXELS
        if n_v == 0:
            bits |= C.QUAL_BIT_NO_PIXELS | C.QUAL_BIT_FEW_PIXELS

        qual = 0
        if bits & (C.QUAL_BIT_SUSPECT | C.QUAL_BIT_BRIGHT_LAND | C.QUAL_BIT_DARK_WATER
                   | C.QUAL_BIT_LOW_COHERENCE | C.QUAL_BIT_FEW_PIXELS | C.QUAL_BIT_LARGE_UNCERT):
            qual = 1
        if bits & (C.QUAL_BIT_DEGRADED | C.QUAL_BIT_FAR_RANGE):
            qual = 2
        if not use_gs:
            qual = max(qual, 2)
        if bits & (C.QUAL_BIT_BAD | C.QUAL_BIT_VALUE_OUT_OF_RANGE):
            qual = 3
        if n_v == 0:
            qual = 3

        ts = grp.ts.dropna()
        out_rows.append({
            "grid_cell": cell, "n_pix": n_all, "n_value_pix": n_v,
            "used_degraded": not use_gs, "mean_value": mean_v,
            "wmean_value": wmean, "wmean_uncert": wmean_u,
            "water_area": water_area, "water_area_uncert": water_area_u,
            "water_frac": water_frac, "dark_frac": dark_frac,
            "mode_klass": best, "ice_clim": consensus(grp.ice_a),
            "ice_dyn": consensus(grp.ice_b),
            "min_ts": ts.min() if len(ts) else np.nan,
            "max_ts": ts.max() if len(ts) else np.nan,
            "qual": qual, "qual_bitwise": bits,
        })
    return pd.DataFrame(out_rows).sort_values("grid_cell").reset_index(drop=True)


@pytest.fixture(scope="module")
def samples_table():
    return add_cell(make_samples_batch(0, N))


@pytest.fixture(scope="module")
def ray_result(samples_table, ray_session):
    import ray.data as rd

    ds = rd.from_arrow(samples_table).repartition(8)
    got = rasterize(ds, GRID, CFG).to_pandas()
    return got.sort_values("grid_cell").reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_result(samples_table):
    return oracle_rasterize(samples_table.to_pandas())


class TestRasterizeGolden:
    def test_cell_set_matches(self, ray_result, oracle_result):
        np.testing.assert_array_equal(
            ray_result.grid_cell.to_numpy(), oracle_result.grid_cell.to_numpy())

    def test_counts(self, ray_result, oracle_result):
        np.testing.assert_array_equal(ray_result.n_pix, oracle_result.n_pix)
        np.testing.assert_array_equal(ray_result.n_value_pix, oracle_result.n_value_pix)

    def test_two_pass_fallback(self, ray_result, oracle_result):
        np.testing.assert_array_equal(ray_result.used_degraded, oracle_result.used_degraded)
        assert oracle_result.used_degraded.any()  # fixture exercises the branch

    @pytest.mark.parametrize("col,rtol", [
        ("mean_value", 1e-9), ("wmean_value", 1e-9), ("wmean_uncert", 1e-9),
        ("water_area", 1e-9), ("water_area_uncert", 1e-9),
        ("water_frac", 1e-9), ("dark_frac", 1e-9),
        ("min_ts", 0), ("max_ts", 0),
    ])
    def test_float_layers(self, ray_result, oracle_result, col, rtol):
        a = ray_result[col].to_numpy(dtype=np.float64)
        b = oracle_result[col].to_numpy(dtype=np.float64)
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
        m = ~np.isnan(a)
        if rtol:
            np.testing.assert_allclose(a[m], b[m], rtol=rtol)
        else:
            np.testing.assert_array_equal(a[m], b[m])

    @pytest.mark.parametrize("col", ["mode_klass", "qual", "qual_bitwise"])
    def test_int_layers(self, ray_result, oracle_result, col):
        np.testing.assert_array_equal(ray_result[col], oracle_result[col])

    @pytest.mark.parametrize("col", ["ice_clim", "ice_dyn"])
    def test_consensus(self, ray_result, oracle_result, col):
        a = ray_result[col].to_numpy(dtype=np.float64)
        b = oracle_result[col].to_numpy(dtype=np.float64)
        np.testing.assert_array_equal(np.isnan(a), np.isnan(b))
        np.testing.assert_array_equal(a[~np.isnan(a)], b[~np.isnan(b)])

    def test_tile_id_derivation(self, ray_result):
        iy = ray_result.grid_cell // GRID.size_x
        ix = ray_result.grid_cell % GRID.size_x
        np.testing.assert_array_equal(ray_result.iy, iy)
        np.testing.assert_array_equal(ray_result.ix, ix)
        tid = (iy // GRID.tile_size) * GRID.tiles_x + (ix // GRID.tile_size)
        np.testing.assert_array_equal(ray_result.tile_id, tid)

    def test_partials_decompose(self, samples_table):
        """Partial aggregation must be decomposition-invariant: any split of
        the input yields identical combined results (the resume guarantee)."""
        whole = partial_aggregate_batch(samples_table).to_pandas()
        lo = partial_aggregate_batch(samples_table.slice(0, N // 3)).to_pandas()
        hi = partial_aggregate_batch(samples_table.slice(N // 3)).to_pandas()
        from raster_processor_ray.aggregate.rasterize import combine_partials_df
        both = combine_partials_df(pd.concat([lo, hi]))
        whole_s = whole.sort_values("grid_cell").reset_index(drop=True)
        both_s = both.sort_values("grid_cell").reset_index(drop=True)[whole_s.columns]
        pd.testing.assert_frame_equal(whole_s, both_s, rtol=1e-12, atol=1e-12)

    def test_combine_table_matches_pandas(self, samples_table):
        """The Arrow/numpy reduceat combine (the production fold kernel)
        agrees with the pandas groupby combine on identical partials:
        same rows, same values, cells ascending."""
        import pyarrow as pa
        from raster_processor_ray.aggregate.rasterize import (
            combine_partials_df, combine_partials_table)
        lo = partial_aggregate_batch(samples_table.slice(0, N // 3))
        hi = partial_aggregate_batch(samples_table.slice(N // 3))
        t = pa.concat_tables([lo, hi])
        got = combine_partials_table(t).to_pandas()
        want = combine_partials_df(t.to_pandas()).sort_values(
            "grid_cell").reset_index(drop=True)[got.columns]
        assert (got.grid_cell.to_numpy()[1:]
                > got.grid_cell.to_numpy()[:-1]).all()
        pd.testing.assert_frame_equal(
            got, want, rtol=1e-12, atol=1e-12, check_dtype=False)
        # empty input -> empty output, schema intact
        empty = combine_partials_table(t.slice(0, 0))
        assert empty.num_rows == 0
        assert empty.column_names == got.columns.tolist()
