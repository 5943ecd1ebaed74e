"""Round-3 regression tests: UTM hemisphere handling, zonal list-column
alignment + pack-range guard, LangId script precedence, empty geoloc LUT."""

import numpy as np
import pandas as pd
import pytest

import pyarrow as pa
import ray.data as rd

from raster_processor_ray.geo import utm
from raster_processor_ray.pipelines.flagship import (
    ZONAL_SITE_BITS, pack_cell_site, unpack_zonal_lists)
from raster_processor_ray.pipelines.utm_raster import rasterize_utm, utm_scene_grid


def scene_df(lat0, lat1, lon0=6.0, lon1=7.0, n=3000):
    from raster_processor_ray.geo.hashing import splitmix64

    idx = np.arange(n, dtype=np.uint64)
    u = lambda s: splitmix64(idx + np.uint64(s)).astype(np.float64) / float(2**64)
    return pd.DataFrame({
        "lat": lat0 + u(1) * (lat1 - lat0),
        "lon": lon0 + u(2) * (lon1 - lon0),
        "value": u(3) * 10.0,
    })


class TestUtmHemisphere:
    def test_forward_south_flag_uniform(self):
        lat = np.array([-10.0, 10.0, -0.001, 0.001])
        lon = np.full(4, 6.5)
        zone = np.full(4, 32)
        e_n, n_n, _ = utm.latlon_to_utm(lat, lon, zone=zone, south=False)
        e_s, n_s, _ = utm.latlon_to_utm(lat, lon, zone=zone, south=True)
        # uniform convention: southern run = northern run + 10^7 everywhere
        np.testing.assert_allclose(n_s - n_n, utm.FALSE_NORTHING_SOUTH)
        np.testing.assert_allclose(e_s, e_n)
        # northern-convention northing of a southern point is negative —
        # the field is CONTINUOUS across the equator
        assert n_n[0] < 0 < n_n[1]
        assert abs(n_n[2] - n_n[3]) < 300.0

    def test_band_is_south(self):
        assert utm.band_is_south("L") and utm.band_is_south("C") \
            and utm.band_is_south("M")
        assert not utm.band_is_south("N") and not utm.band_is_south("X")

    def test_southern_scene_cell_latlon(self, ray_session):
        """A lat ~ -10 scene must report cell_lat ~ -10 (round 2 reported
        ~ +80: the inverse ran with northern=True on southern northings)."""
        df = scene_df(-10.5, -9.5)
        cells, grid, zone, band = rasterize_utm(
            rd.from_pandas(df), res_m=2000.0)
        assert utm.band_is_south(band)
        got = cells.to_pandas()
        assert got.cell_lat.between(-10.8, -9.2).all()
        assert got.cell_lon.between(5.8, 7.2).all()
        # round-trip: forward-projecting the centers in the SCENE
        # convention lands back on the center grid coordinates
        e, n, _ = utm.latlon_to_utm(got.cell_lat.to_numpy(),
                                    got.cell_lon.to_numpy(),
                                    zone=np.full(len(got), zone), south=True)
        np.testing.assert_allclose(
            e, grid.x_min + got.ix.to_numpy() * grid.res, atol=1e-3)
        np.testing.assert_allclose(
            n, grid.y_min + got.iy.to_numpy() * grid.res, atol=1e-3)

    def test_equator_straddling_scene(self, ray_session):
        """lat in [-1, 1]: one scene hemisphere -> continuous northing,
        every point binned, grid ~222 km tall (per-point false northing
        would build a ~10^7 m grid and bin the south end opposite)."""
        df = scene_df(-1.0, 1.0)
        cells, grid, zone, band = rasterize_utm(
            rd.from_pandas(df), res_m=2000.0)
        assert grid.y_max - grid.y_min < 300_000.0
        got = cells.to_pandas()
        assert int(got.n_pix.sum()) == len(df)
        assert got.cell_lat.min() < -0.8 and got.cell_lat.max() > 0.8
        # mean per cell matches a numpy oracle built in the same convention
        south = utm.band_is_south(band)
        from raster_processor_ray.geo.cells import bin_to_grid, grid_cell_key
        e, n, _ = utm.latlon_to_utm(df.lat.to_numpy(), df.lon.to_numpy(),
                                    zone=np.full(len(df), zone), south=south)
        iy, ix, ok = bin_to_grid(grid, e, n)
        assert ok.all()
        cell = grid_cell_key(grid, iy, ix)
        got_i = got.set_index("grid_cell")
        for c in np.unique(cell):
            np.testing.assert_allclose(
                got_i.loc[c, "mean_value"],
                df.value.to_numpy()[cell == c].mean(), rtol=1e-12)

    def test_scene_grid_south_projection_consistent(self, ray_session):
        """utm_scene_grid bounds are computed in the same hemisphere
        convention the binning uses (both from the adjusted band)."""
        df = scene_df(-44.9, -44.1)
        grid, zone, band = utm_scene_grid(rd.from_pandas(df), res_m=1000.0)
        assert utm.band_is_south(band)
        e, n, _ = utm.latlon_to_utm(df.lat.to_numpy(), df.lon.to_numpy(),
                                    zone=np.full(len(df), zone), south=True)
        assert grid.x_min - 500 <= e.min() and e.max() <= grid.x_max + 500
        assert grid.y_min - 500 <= n.min() and n.max() <= grid.y_max + 500


class TestZonalPack:
    def test_pack_range_guard(self):
        cells = np.array([1, 2], dtype=np.int64)
        ok = pack_cell_site(cells, np.array([0, (1 << ZONAL_SITE_BITS) - 1]))
        assert ok[0] == (1 << ZONAL_SITE_BITS)
        with pytest.raises(ValueError, match="packable range"):
            pack_cell_site(cells, np.array([0, 1 << ZONAL_SITE_BITS]))
        with pytest.raises(ValueError, match="packable range"):
            pack_cell_site(cells, np.array([-1, 0]))

    def _mk(self, offsets, values, cells):
        sids = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(values, type=pa.int64()))
        cnts = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(np.arange(100, 100 + len(values)), type=pa.int64()))
        return pa.table({"grid_cell": pa.array(cells, type=pa.int64()),
                         "site_ids": sids, "site_cnts": cnts})

    def test_unpack_with_leading_offset(self):
        """offsets[0]=2: the first two child values are skipped pairs
        (e.g. out-of-grid -1 cells) — .values would misalign them."""
        t = self._mk([2, 4, 5], [9, 9, 1, 2, 3], [10, 20])
        fc, fs, fn = unpack_zonal_lists(t)
        np.testing.assert_array_equal(fc, [10, 10, 20])
        np.testing.assert_array_equal(fs, [1, 2, 3])
        np.testing.assert_array_equal(fn, [102, 103, 104])

    def test_unpack_with_sliced_block(self):
        full = self._mk([0, 2, 4, 5], [7, 8, 1, 2, 3], [5, 10, 20])
        t = full.slice(1, 2)
        fc, fs, fn = unpack_zonal_lists(t)
        np.testing.assert_array_equal(fc, [10, 10, 20])
        np.testing.assert_array_equal(fs, [1, 2, 3])
        np.testing.assert_array_equal(fn, [102, 103, 104])


class TestLangIdPrecedence:
    def test_cjk_wins_over_arabic(self):
        from raster_processor_ray.stages.text import LangId

        mixed = "中文" * 4 + "العرب" * 2
        df = pd.DataFrame({"text": [mixed, "العرب" * 3,
                                    "中文字" * 3]})
        out = LangId()(df)
        assert list(out.lang_pred) == ["zh", "ar", "zh"]


class TestEmptyCoarseLut:
    def test_empty_lut_falls_back_to_own(self, ray_session):
        import ray

        from raster_processor_ray.geo.cells import GridSpec
        from raster_processor_ray.pipelines.geoloc import CoarseFeedback

        coarse = GridSpec(x_min=0.0, y_min=0.0, x_max=1.0, y_max=1.0,
                          res=0.5, tile_size=2)
        lut = pd.DataFrame({"_ccell": np.array([], dtype=np.int64),
                            "cell_value": np.array([], dtype=np.float64)})
        fb = CoarseFeedback(ray.put(lut), coarse, "value", "lat", "lon")
        b = pa.table({"lat": [0.25, 0.75], "lon": [0.25, 0.75],
                      "value": [1.5, 2.5]})
        out = fb(b)
        np.testing.assert_allclose(
            np.asarray(out["improved_value"]), [1.5, 2.5])
