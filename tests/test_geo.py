"""Pure-NumPy geo kernel tests (no Ray needed)."""

import numpy as np
import pyarrow as pa
import pytest

from raster_processor_ray.geo import cells, crs, hashing, utm


class TestFnv:
    def test_known_vectors(self):
        # published FNV-1a 64 test vectors
        h = hashing.fnv1a_64(["", "a", "foobar"])
        assert int(h[0]) == 0xCBF29CE484222325
        assert int(h[1]) == 0xAF63DC4C8601EC8C
        assert int(h[2]) == 0x85944171F73967E8

    def test_stability_and_range(self):
        urls = [f"https://site{i}.example/p/{i}" for i in range(1000)]
        lat, lon = hashing.geotag(urls)
        lat2, lon2 = hashing.geotag(pa.array(urls))
        np.testing.assert_array_equal(lat, lat2)
        assert ((lat >= -90) & (lat < 90)).all()
        assert ((lon >= -180) & (lon < 180)).all()
        # distinct urls overwhelmingly produce distinct tags
        assert len(np.unique(lat)) > 990

    def test_sliced_array(self):
        arr = pa.array(["aa", "bb", "cc", "dd"]).slice(1, 2)
        h = hashing.fnv1a_64(arr)
        np.testing.assert_array_equal(h, hashing.fnv1a_64(["bb", "cc"]))

    def test_int_geotag_matches_sql_formula(self):
        import duckdb
        ids = np.arange(500, dtype=np.int64)
        lat, lon = hashing.geotag_from_int(ids)
        sql_lat = hashing.GEOTAG_INT_SQL_LAT.format(id="i", salt=0)
        sql_lon = hashing.GEOTAG_INT_SQL_LON.format(id="i", salt=0)
        df = duckdb.sql(
            f"SELECT {sql_lat} AS lat, {sql_lon} AS lon FROM range(500) t(i)"
        ).df()
        np.testing.assert_array_equal(lat, df["lat"].to_numpy())
        np.testing.assert_array_equal(lon, df["lon"].to_numpy())


class TestCells:
    def setup_method(self):
        rng = np.random.default_rng(7)
        self.lat = rng.uniform(-89, 89, 5000)
        self.lon = rng.uniform(-180, 180, 5000)

    def test_parent_prefix_property(self):
        c12 = cells.s2ish_cell_id(self.lat, self.lon, 12)
        for lvl in (10, 8, 4):
            direct = cells.s2ish_cell_id(self.lat, self.lon, lvl)
            via_parent = cells.s2ish_parent(c12, lvl)
            np.testing.assert_array_equal(direct, via_parent)

    def test_locality(self):
        c = cells.s2ish_cell_id(self.lat, self.lon, 12)
        c_eps = cells.s2ish_cell_id(self.lat + 1e-9, self.lon + 1e-9, 12)
        assert np.mean(c == c_eps) > 0.999
        # a ~1000 km shift always changes the level-12 cell
        c_far = cells.s2ish_cell_id(np.clip(self.lat + 10, -90, 90), self.lon, 12)
        assert np.mean(c == c_far) < 0.001

    def test_determinism(self):
        a = cells.s2ish_cell_id(self.lat, self.lon, 12)
        b = cells.s2ish_cell_id(self.lat, self.lon, 12)
        np.testing.assert_array_equal(a, b)

    def test_hex_cells(self):
        h = cells.h3ish_cell_id(self.lat, self.lon)
        h2 = cells.h3ish_cell_id(self.lat, self.lon)
        np.testing.assert_array_equal(h, h2)
        assert len(np.unique(h)) > 4000

    def test_bin_to_grid_reference_rounding(self):
        """The binning rule must be exactly round-half-to-even, mirroring
        reference products.py:1145-1146 (np.round semantics)."""
        g = cells.GridSpec(x_min=0, y_min=0, x_max=10, y_max=10, res=1.0)
        # 0.5/1.0 = 0.5 -> rounds to 0 (half to even); 1.5 -> 2
        iy, ix, ok = cells.bin_to_grid(g, np.array([0.5, 1.5]), np.array([2.5, 3.5]))
        assert list(ix) == [0, 2]
        assert list(iy) == [2, 4]
        assert ok.all()

    def test_bin_bounds_mask(self):
        g = cells.GridSpec(x_min=0, y_min=0, x_max=10, y_max=10, res=1.0)
        iy, ix, ok = cells.bin_to_grid(g, np.array([-1.0, 5.0, 11.0]), np.array([5.0, 5.0, 5.0]))
        assert list(ok) == [False, True, False]

    def test_wrap_lon_grid(self):
        g = cells.GridSpec(x_min=170, y_min=-10, x_max=190, y_max=10, res=1.0, wrap_lon=True)
        # -175 deg wraps to 185 within the grid window (antimeridian grid)
        iy, ix, ok = cells.bin_to_grid(g, np.array([-175.0]), np.array([0.0]))
        assert ok[0] and ix[0] == 15

    def test_floor_cell_matches_duckdb(self):
        import duckdb
        lat, lon = self.lat, self.lon
        ours = cells.floor_cell(lat, lon, 1.0)
        con = duckdb.connect()
        con.register("pts", __import__("pandas").DataFrame({"lat": lat, "lon": lon}))
        expr = cells.floor_cell_sql("lat", "lon", 1.0)
        theirs = con.sql(f"SELECT {expr} AS c FROM pts").df()["c"].to_numpy()
        np.testing.assert_array_equal(ours, theirs)


class TestUtm:
    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        lat = rng.uniform(-80, 84, 2000)
        lon = rng.uniform(-180, 180, 2000)
        e, n, z = utm.latlon_to_utm(lat, lon)
        lat2, lon2 = utm.utm_to_latlon(e, n, z, lat >= 0)
        err = crs.haversine_m(lat, lon, lat2, lon2)
        assert err.max() < 1e-3  # sub-mm

    def test_known_point(self):
        """NYC (40.7128N, 74.0060W) -> zone 18N. Expected E/N verified
        against an independent Snyder-series computation with numerically
        integrated meridian arc (agreement to the mm)."""
        e, n, z = utm.latlon_to_utm(np.array([40.7128]), np.array([-74.0060]))
        assert z[0] == 18
        assert abs(e[0] - 583959.372) < 0.01
        assert abs(n[0] - 4507350.998) < 0.01

    def test_zone_exceptions(self):
        assert utm.utm_zone(np.array([60.0]), np.array([5.0]))[0] == 32  # Norway
        assert utm.utm_zone(np.array([75.0]), np.array([20.0]))[0] == 33  # Svalbard
        assert utm.utm_zone(np.array([40.0]), np.array([-74.0]))[0] == 18

    def test_bands_epsg(self):
        idx = utm.mgrs_band(np.array([40.7, -35.0]))
        assert utm.MGRS_BANDS[idx[0]] == "T"
        assert utm.MGRS_BANDS[idx[1]] == "H"
        z = utm.utm_zone(np.array([40.7]), np.array([-74.0]))
        assert utm.utm_epsg(z, np.array([40.7]))[0] == 32618
        assert utm.utm_epsg(z, np.array([-40.7]))[0] == 32718


class TestCrs:
    def test_ecef_roundtrip(self):
        rng = np.random.default_rng(5)
        lat = rng.uniform(-89.9, 89.9, 1000)
        lon = rng.uniform(-180, 180, 1000)
        h = rng.uniform(-100, 9000, 1000)
        x, y, z = crs.llh_to_ecef(lat, lon, h)
        lat2, lon2, h2 = crs.ecef_to_llh(x, y, z)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)
        np.testing.assert_allclose(crs.lon_360to180(lon2 - lon), 0, atol=1e-9)
        np.testing.assert_allclose(h2, h, atol=1e-5)

    def test_area_whole_ellipsoid(self):
        a = crs.wgs84_cell_area(-90, 90, 360)
        assert abs(a - 5.10065622e14) / 5.1e14 < 1e-3

    def test_area_additivity(self):
        whole = crs.wgs84_cell_area(10, 12, 2)
        parts = crs.wgs84_cell_area(10, 11, 2) + crs.wgs84_cell_area(11, 12, 2)
        np.testing.assert_allclose(whole, parts, rtol=1e-12)

    def test_bearing_terminal(self):
        # going due north 111 km raises latitude ~1 degree
        lat2, lon2 = crs.terminal_point_spherical(0.0, 0.0, 0.0, 111194.9)
        assert abs(lat2 - 1.0) < 1e-3 and abs(lon2) < 1e-9
        b = crs.bearing(0.0, 0.0, 1.0, 0.0)
        assert abs(b - 0.0) < 1e-9

    def test_wrap(self):
        assert crs.lon_360to180(np.array([190.0]))[0] == -170.0
        assert crs.wrap_lon(np.array([-175.0]), 170.0)[0] == 185.0
