"""Golden tests: UTM-grid rasterization end-to-end, data-gap /
inner-swath cell flags, and the region-map writer."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from raster_processor_ray import config as C
from raster_processor_ray.geo import utm
from raster_processor_ray.geo.cells import GridSpec, bin_to_grid, grid_cell_key
from raster_processor_ray.pipelines import region_map as RM
from raster_processor_ray.pipelines.utm_raster import rasterize_utm, utm_scene_grid
from raster_processor_ray.stages import gaps


def pts_df(n=4000):
    from raster_processor_ray.geo.hashing import splitmix64

    idx = np.arange(n, dtype=np.uint64)
    u = lambda s: splitmix64(idx + np.uint64(s)).astype(np.float64) / float(2**64)
    return pd.DataFrame({
        "lat": 44.0 + u(1) * 1.0,
        "lon": 6.0 + u(2) * 1.0,
        "value": u(3) * 10.0,
        "area": u(4) * 100.0,
        "frac": u(5),
        "klass": np.full(n, C.INTERIOR_CLASSES[0], dtype=np.int64),
    })


class TestUtmRaster:
    def test_scene_grid_selection(self, ray_session):
        df = pts_df()
        grid, zone, band = utm_scene_grid(rd.from_pandas(df), res_m=1000.0)
        # lon ~6.5 deg -> zone 32; lat ~44.5 -> band T
        assert zone == 32
        assert band == "T"
        assert grid.projected
        # snapped bounds: exact multiples of res
        for v in (grid.x_min, grid.x_max, grid.y_min, grid.y_max):
            assert v % 1000.0 == 0.0
        # data fits inside the grid
        e, n, _ = utm.latlon_to_utm(df.lat.to_numpy(), df.lon.to_numpy(),
                                    zone=np.full(len(df), zone))
        assert grid.x_min - 500 <= e.min() and e.max() <= grid.x_max + 500
        assert grid.y_min - 500 <= n.min() and n.max() <= grid.y_max + 500

    def test_utm_rasterize_matches_numpy_oracle(self, ray_session):
        df = pts_df()
        cells, grid, zone, _ = rasterize_utm(
            rd.from_pandas(df).repartition(4), res_m=2000.0)
        got = cells.to_pandas().set_index("grid_cell")
        # numpy oracle: project + reference rounding + masked mean
        e, n, _ = utm.latlon_to_utm(df.lat.to_numpy(), df.lon.to_numpy(),
                                    zone=np.full(len(df), zone))
        iy, ix, ok = bin_to_grid(grid, e, n)
        cell = np.where(ok, grid_cell_key(grid, iy, ix), -1)
        assert (cell >= 0).all()
        total = 0
        for c in np.unique(cell):
            m = cell == c
            np.testing.assert_allclose(got.loc[c, "mean_value"],
                                       df.value.to_numpy()[m].mean(), rtol=1e-12)
            total += int(got.loc[c, "n_pix"])
        assert total == len(df)

    def test_projected_water_frac_uses_res_squared(self, ray_session):
        """On a projected grid water_frac = water_area / res^2 (reference
        raster_agg aggregate_water_area projection_type=='utm'), never
        the degree-based geodetic patch area."""
        df = pts_df(2000)
        cells, grid, _, _ = rasterize_utm(
            rd.from_pandas(df), res_m=2000.0)
        got = cells.to_pandas()
        expect = got.water_area / (grid.res * grid.res)
        np.testing.assert_allclose(got.water_frac.to_numpy(),
                                   expect.to_numpy(), rtol=1e-12)


class TestGapFlags:
    GRID = GridSpec(x_min=0.0, y_min=40.0, x_max=2.0, y_max=42.0, res=0.05,
                    tile_size=8)

    def make_track(self):
        """Track along lon=0..2 at lat=41 with a time gap in the middle."""
        t = np.arange(40, dtype=np.float64)
        ts = np.where(t < 20, t, t + 500.0)   # gap of 500s after sample 19
        lon = t * 0.05
        lat = np.full_like(lon, 41.0)
        return lat, lon, ts

    def test_track_segments(self):
        lat, lon, ts = self.make_track()
        seg = gaps.track_segments(ts, gap_thresh=100.0)
        assert seg.max() == 1
        assert (seg[:20] == 0).all() and (seg[20:] == 1).all()

    def test_swath_polygons(self):
        lat, lon, ts = self.make_track()
        polys = gaps.swath_polygons_from_track(lat, lon, ts, gap_thresh=100.0,
                                               cross_track_m=30_000.0)
        assert len(polys) == 2

    def test_flags_burned_into_cells(self, ray_session):
        from raster_processor_ray.aggregate.rasterize import rasterize

        lat_t, lon_t, ts_t = self.make_track()
        # points spread over the full grid (so some fall in the gap zone)
        from raster_processor_ray.geo.hashing import splitmix64
        idx = np.arange(3000, dtype=np.uint64)
        u = lambda s: splitmix64(idx + np.uint64(s)).astype(np.float64) / float(2**64)
        df = pd.DataFrame({"lat": 40.0 + u(1) * 2.0, "lon": u(2) * 2.0,
                           "value": u(3)})
        iy, ix, ok = bin_to_grid(self.GRID, df.lon.to_numpy(), df.lat.to_numpy())
        df["grid_cell"] = np.where(ok, grid_cell_key(self.GRID, iy, ix), -1)
        cells = rasterize(rd.from_pandas(df), self.GRID)
        flagged = gaps.flag_gap_cells(
            cells, self.GRID, lat_t, lon_t, ts_t, gap_thresh=100.0,
            cross_track_m=60_000.0, inner_swath_m=8_000.0).to_pandas()

        from raster_processor_ray.stages.pip import PolygonIndex
        polys = gaps.swath_polygons_from_track(lat_t, lon_t, ts_t,
                                               gap_thresh=100.0,
                                               cross_track_m=60_000.0)
        pidx = PolygonIndex(polys)
        clat = self.GRID.y_min + flagged.iy.to_numpy() * self.GRID.res
        clon = self.GRID.x_min + flagged.ix.to_numpy() * self.GRID.res
        covered = pidx.contains_any(clat, clon)
        missing = (flagged.qual_bitwise.to_numpy()
                   & gaps.QUAL_BIT_MISSING_DATA) != 0
        np.testing.assert_array_equal(missing, ~covered)
        # every missing cell escalated to at least DEGRADED
        assert (flagged.qual.to_numpy()[missing] >= C.QUAL_DEGRADED).all()
        # inner-swath cells exist (track crosses the grid) and are suspect+
        inner = (flagged.qual_bitwise.to_numpy()
                 & gaps.QUAL_BIT_INNER_SWATH) != 0
        assert inner.any()
        assert (flagged.qual.to_numpy()[inner] >= C.QUAL_SUSPECT).all()
        # near-track cells are inner, far cells are not (spot geometry)
        from raster_processor_ray.geo.geodesic import vincenty_m
        dmin = np.min(np.stack([
            vincenty_m(clat, clon, np.full_like(clat, 41.0),
                       np.full_like(clon, lo)) for lo in lon_t]), axis=0)
        # inner flag uses the spherical distance; allow ellipsoid delta
        assert (dmin[inner] < 8_000.0 * 1.01).all()


class TestRegionMap:
    GRID = GridSpec(x_min=0.0, y_min=0.0, x_max=0.95, y_max=0.95, res=0.05,
                    tile_size=4)

    def test_region_map_modes_and_dense_write(self, ray_session, tmp_path):
        from raster_processor_ray.geo.hashing import splitmix64
        n = 5000
        idx = np.arange(n, dtype=np.uint64)
        u = lambda s: splitmix64(idx + np.uint64(s)).astype(np.float64) / float(2**64)
        lat = u(1) * 0.9
        lon = u(2) * 0.9
        river = np.where(u(3) < 0.3, -1, (u(4) * 5).astype(np.int64))
        lake = np.where(u(5) < 0.8, -1, (u(6) * 3).astype(np.int64))
        iy, ix, ok = bin_to_grid(self.GRID, lon, lat)
        cell = np.where(ok, grid_cell_key(self.GRID, iy, ix), -1)
        df = pd.DataFrame({"grid_cell": cell, "river": river, "lake": lake})

        got = RM.region_map_cells(rd.from_pandas(df).repartition(3),
                                  ["river", "lake"]).to_pandas() \
            .set_index("grid_cell").sort_index()
        # numpy oracle: per-cell mode, ties -> smallest label, -1 excluded
        for c in np.unique(cell[cell >= 0]):
            m = cell == c
            for col, arr in (("river_mode", river), ("lake_mode", lake)):
                vals = arr[m]
                vals = vals[vals >= 0]
                if len(vals) == 0:
                    want = RM.REGION_FILL
                else:
                    uq, cnt = np.unique(vals, return_counts=True)
                    want = int(uq[cnt.argmax()])  # unique() sorts -> ties ok
                assert got.loc[c, col] == want, (c, col)

        out = str(tmp_path / "region")
        manifest = RM.write_region_map(rd.from_pandas(df), self.GRID, out,
                                       ["river", "lake"], num_shards=4)
        assert manifest.rows.sum() > 0
        from raster_processor_ray.state import lineage
        back = lineage.read_resumable(out).to_pandas()
        T = self.GRID.tile_size
        # dense fill: unoccupied cells carry REGION_FILL
        row = back.iloc[0]
        dense = np.asarray(row["region_map_river"]).reshape(T, T)
        assert dense.dtype == np.int64
        assert ((dense == RM.REGION_FILL) | (dense >= 0)).all()


class TestCellLatlon:
    def test_cell_centers_roundtrip(self, ray_session):
        """The latitude/longitude layers are the cell centers inverse-
        projected to WGS84 (aggregate_px_latlon parity): re-projecting
        them forward lands back on the exact center grid coordinates."""
        df = pts_df(1500)
        cells, grid, zone, _ = rasterize_utm(rd.from_pandas(df), res_m=5000.0)
        got = cells.to_pandas()
        assert {"cell_lat", "cell_lon"} <= set(got.columns)
        e, n, _ = utm.latlon_to_utm(got.cell_lat.to_numpy(),
                                    got.cell_lon.to_numpy(),
                                    zone=np.full(len(got), zone))
        np.testing.assert_allclose(
            e, grid.x_min + got.ix.to_numpy() * grid.res, atol=1e-3)
        np.testing.assert_allclose(
            n, grid.y_min + got.iy.to_numpy() * grid.res, atol=1e-3)
