"""Golden tests for dense tile materialization (state/densify.py):
the densified tiles equal a direct NumPy dense-grid scatter, empty cells
carry the reference's NO_PIXELS fills, and polygon crop masks outside
cells (crop_to_bounds semantics, products.py:1425-1474)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from raster_processor_ray import config as C
from raster_processor_ray.aggregate.rasterize import rasterize
from raster_processor_ray.geo.cells import GridSpec, bin_to_grid, grid_cell_key
from raster_processor_ray.state import densify, lineage
from raster_processor_ray.stages.pip import PolygonIndex, PolygonSpec

GRID = GridSpec(x_min=0.0, y_min=0.0, x_max=3.9, y_max=3.9, res=0.1,
                tile_size=8)  # 40x40 cells -> 5x5 tiles


def points_df(n=5000):
    from raster_processor_ray.geo.hashing import splitmix64

    idx = np.arange(n, dtype=np.uint64)
    u = lambda s: splitmix64(idx + np.uint64(s)).astype(np.float64) / float(2**64)
    lat = u(1) * 3.5
    lon = u(2) * 3.5
    value = u(3) * 10.0
    ts = u(4) * 100.0
    iy, ix, ok = bin_to_grid(GRID, lon, lat)
    cell = np.where(ok, grid_cell_key(GRID, iy, ix), -1)
    return pd.DataFrame({"grid_cell": cell, "value": value, "ts": ts,
                         "lat": lat, "lon": lon})


@pytest.fixture(scope="module")
def dense(ray_session):
    df = points_df()
    cells = rasterize(rd.from_pandas(df).repartition(4), GRID)
    return (densify.densify_tiles(cells, GRID).to_pandas()
            .set_index("tile_id").sort_index()), df


class TestDensify:
    def test_dense_equals_numpy_scatter(self, dense):
        tiles, df = dense
        # NumPy oracle: full dense grids
        want_mean = np.full((GRID.size_y, GRID.size_x), np.nan)
        want_n = np.zeros((GRID.size_y, GRID.size_x), dtype=np.int64)
        cell = df.grid_cell.to_numpy()
        for c in np.unique(cell[cell >= 0]):
            m = cell == c
            iy, ix = c // GRID.size_x, c % GRID.size_x
            want_mean[iy, ix] = df.value.to_numpy()[m].mean()
            want_n[iy, ix] = m.sum()
        T = GRID.tile_size
        for tid, row in tiles.iterrows():
            tiy, tix = int(row.tile_iy), int(row.tile_ix)
            got_mean = densify.read_dense_layer(row, "mean_value")
            got_n = densify.read_dense_layer(row, "n_pix")
            sl = np.s_[tiy * T:(tiy + 1) * T, tix * T:(tix + 1) * T]
            want_m_t = np.full((T, T), np.nan)
            want_n_t = np.zeros((T, T), dtype=np.int64)
            wm = want_mean[sl]
            want_m_t[:wm.shape[0], :wm.shape[1]] = wm
            want_n_t[:wm.shape[0], :wm.shape[1]] = want_n[sl]
            np.testing.assert_allclose(got_mean, want_m_t, rtol=1e-12)
            np.testing.assert_array_equal(got_n, want_n_t)

    def test_every_occupied_tile_present_and_complete(self, dense):
        tiles, df = dense
        cell = df.grid_cell.to_numpy()
        occ = np.unique(cell[cell >= 0])
        want_tiles = np.unique(
            (occ // GRID.size_x // GRID.tile_size) * GRID.tiles_x
            + (occ % GRID.size_x) // GRID.tile_size)
        np.testing.assert_array_equal(tiles.index.to_numpy(), want_tiles)
        # total pixels conserved through densification
        total = sum(densify.read_dense_layer(r, "n_pix").sum()
                    for _, r in tiles.iterrows())
        assert total == (cell >= 0).sum()

    def test_empty_cells_carry_reference_fills(self, dense):
        tiles, _ = dense
        row = tiles.iloc[0]
        n = densify.read_dense_layer(row, "n_pix")
        qual = densify.read_dense_layer(row, "qual")
        bits = densify.read_dense_layer(row, "qual_bitwise")
        mean = densify.read_dense_layer(row, "mean_value")
        empty = n == 0
        assert empty.any()
        assert (qual[empty] == C.QUAL_BAD).all()
        assert (bits[empty] & C.QUAL_BIT_NO_PIXELS).all()
        assert np.isnan(mean[empty]).all()
        assert int(row.n_valid_cells) == (~empty).sum()

    def test_time_coverage_metadata(self, dense):
        tiles, df = dense
        row = tiles.iloc[0]
        mts = densify.read_dense_layer(row, "min_ts")
        occupied = densify.read_dense_layer(row, "n_pix") > 0
        np.testing.assert_allclose(row.time_coverage_start,
                                   np.nanmin(mts[occupied]))

    def test_polygon_crop(self, ray_session):
        """crop_to_bounds: cells outside the polygon are masked with
        OUTSIDE qual bits; inside cells are untouched."""
        df = points_df()
        cells = rasterize(rd.from_pandas(df), GRID)
        # polygon covering roughly the lower-left quadrant
        poly = PolygonIndex([PolygonSpec(1, "ll", np.array(
            [[-0.05, -0.05], [1.95123, -0.05], [1.95123, 1.95123],
             [-0.05, 1.95123]]))])
        tiles = densify.densify_tiles(cells, GRID, polygon_index=poly) \
            .to_pandas().set_index("tile_id").sort_index()
        T = GRID.tile_size
        for tid, row in tiles.iterrows():
            lat, lon, _, _ = densify.tile_cell_centers(
                GRID, np.array([int(row.tile_iy)]), np.array([int(row.tile_ix)]))
            inside = poly.contains_any(lat.ravel(), lon.ravel()).reshape(T, T)
            bits = densify.read_dense_layer(row, "qual_bitwise")
            n = densify.read_dense_layer(row, "n_pix")
            mean = densify.read_dense_layer(row, "mean_value")
            assert (bits[~inside] & densify.QUAL_BIT_OUTSIDE).all()
            assert (n[~inside] == 0).all()
            assert np.isnan(mean[~inside]).all()
            # inside cells keep their sparse values (no OUTSIDE bit)
            assert not (bits[inside] & densify.QUAL_BIT_OUTSIDE).any()

    def test_write_read_roundtrip(self, ray_session, tmp_path):
        df = points_df(2000)
        cells = rasterize(rd.from_pandas(df), GRID)
        out = str(tmp_path / "dense")
        manifest = densify.write_dense_tiles(cells, out, GRID, num_shards=4)
        assert manifest.rows.sum() > 0
        back = lineage.read_resumable(out).to_pandas()
        assert lineage.is_complete(out)
        total = sum(densify.read_dense_layer(r, "n_pix").sum()
                    for _, r in back.iterrows())
        assert total == (df.grid_cell >= 0).sum()
