"""Golden tests for the height-constrained geolocation feedback pipeline
(reference default DAG, l2pixc_to_raster.py:112-251 +
geoloc_raster.py:31-194): NumPy oracle for each phase and for the
composed two-phase result."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from raster_processor_ray.geo import crs
from raster_processor_ray.geo.cells import GridSpec, bin_to_grid, grid_cell_key
from raster_processor_ray.pipelines import geoloc as G


def synth_points(n=4000, seed_salt=7):
    from raster_processor_ray.geo.hashing import splitmix64

    idx = np.arange(n, dtype=np.uint64)
    u = lambda s: splitmix64(idx + np.uint64(s)).astype(np.float64) / float(2**64)
    lat = u(1) * 8.0 - 4.0
    lon = u(2) * 8.0 - 4.0
    value = u(3) * 50.0
    ts = u(4) * 512.0
    return pd.DataFrame({"lat": lat, "lon": lon, "value": value, "ts": ts})


FINE = GridSpec(x_min=-6, y_min=-6, x_max=6, y_max=6, res=0.25, tile_size=16)


def oracle_coarse_feedback(df, fine, scale_factor):
    """NumPy oracle for phases 1-2: coarse-cell mean -> per-point value."""
    coarse = G.coarse_grid_of(fine, scale_factor)
    iy, ix, ok = bin_to_grid(coarse, df.lon.to_numpy(), df.lat.to_numpy())
    cell = np.where(ok, grid_cell_key(coarse, iy, ix), -1)
    out = df.value.to_numpy().copy()
    for c in np.unique(cell[cell >= 0]):
        m = cell == c
        out[m] = df.value.to_numpy()[m].mean()
    return out


class TestPhases:
    def test_coarse_feedback_matches_oracle(self, ray_session):
        df = synth_points()
        pts = rd.from_pandas(df).repartition(4)
        fed = G.height_constrained_points(pts, FINE, mode="none",
                                          scale_factor=4).to_pandas()
        fed = fed.sort_values(["lat", "lon"]).reset_index(drop=True)
        want = df.assign(improved=oracle_coarse_feedback(df, FINE, 4)) \
            .sort_values(["lat", "lon"]).reset_index(drop=True)
        np.testing.assert_allclose(fed.improved_value.to_numpy(),
                                   want.improved.to_numpy(), rtol=1e-12)
        # positions unchanged in mode 'none'
        np.testing.assert_array_equal(fed.lat.to_numpy(), want.lat.to_numpy())

    def test_taylor_shift_preserves_range_and_sets_height(self):
        """The refinement invariants: |P'-N| == |P-N| to first order and
        the new geodetic height == old + dh to first order."""
        lat = np.array([0.0, 35.1234, -60.4567, 80.0])
        lon = np.array([10.0, -120.9876, 45.6789, 179.5])
        h = np.array([100.0, 50.0, -20.0, 0.0])
        dh = np.array([5.0, -8.0, 12.0, 3.0])
        # nadir well off to the side (incidence ~ tens of degrees)
        nlat = lat + 2.0
        nlon = lon - 3.0
        nx, ny, nz = crs.llh_to_ecef(nlat, nlon, 890_000.0)
        nadir = np.stack([nx, ny, nz], axis=1)

        new_lat, new_lon, new_h = G.taylor_height_shift(lat, lon, h, nadir, dh)
        # height reached to first order (curvature error ~ (dh*tan)^2 / R)
        np.testing.assert_allclose(new_h, h + dh, atol=0.05)
        # range preserved to first order
        px, py, pz = crs.llh_to_ecef(lat, lon, h)
        qx, qy, qz = crs.llh_to_ecef(new_lat, new_lon, new_h)
        r0 = np.sqrt((px - nadir[:, 0])**2 + (py - nadir[:, 1])**2
                     + (pz - nadir[:, 2])**2)
        r1 = np.sqrt((qx - nadir[:, 0])**2 + (qy - nadir[:, 1])**2
                     + (qz - nadir[:, 2])**2)
        np.testing.assert_allclose(r1, r0, rtol=1e-9)
        # the position actually moved (dh != 0 and off-nadir geometry)
        assert (np.abs(new_lat - lat) + np.abs(new_lon - lon) > 0).all()

    def test_taylor_shift_degenerate_nadir_overhead(self):
        """Nadir directly overhead: no cross-track direction exists; the
        guard falls back to a pure normal (height-only) shift."""
        lat = np.array([12.3456])
        lon = np.array([45.6789])
        h = np.array([10.0])
        nx, ny, nz = crs.llh_to_ecef(lat, lon, 890_000.0)
        new_lat, new_lon, new_h = G.taylor_height_shift(
            lat, lon, h, np.stack([nx, ny, nz], axis=1), np.array([7.0]))
        np.testing.assert_allclose(new_h, h + 7.0, atol=1e-6)
        np.testing.assert_allclose(new_lat, lat, atol=1e-9)
        np.testing.assert_allclose(new_lon, lon, atol=1e-9)

    def test_pixcvec_mode_coalesce(self, ray_session):
        df = pd.DataFrame({
            "lat": [1.0, 2.0, 3.0], "lon": [4.0, 5.0, 6.0],
            "value": [10.0, 20.0, 30.0], "ts": [0.0, 1.0, 2.0],
            "improved_lat": [1.5, None, 3.5],
            "improved_lon": [4.5, None, 6.5],
            "improved_value": [11.0, None, 31.0],
        })
        out = G.height_constrained_points(
            rd.from_pandas(df), FINE, mode="pixcvec").to_pandas() \
            .sort_values("ts").reset_index(drop=True)
        np.testing.assert_allclose(out.lat, [1.5, 2.0, 3.5])
        np.testing.assert_allclose(out.lon, [4.5, 5.0, 6.5])
        np.testing.assert_allclose(out.improved_value, [11.0, 20.0, 31.0])

    def test_bad_mode_raises(self, ray_session):
        with pytest.raises(ValueError):
            G.height_constrained_points(rd.from_items([{"a": 1}]), FINE,
                                        mode="bogus")


class TestComposedDag:
    def test_two_phase_raster_matches_numpy_oracle(self, ray_session):
        """End-to-end mode='lowres_raster': the full-res raster equals a
        direct NumPy recompute (coarse mean -> feedback -> taylor shift ->
        fine-cell masked mean)."""
        df = synth_points(3000)
        track_ts, payload = G.synth_nadir_track(128)
        pts = rd.from_pandas(df).repartition(3)
        got = G.geoloc_refined_rasterize(
            pts, FINE, mode="lowres_raster", scale_factor=4,
            nadir_track=(track_ts, payload)).to_pandas()
        got = got.set_index("grid_cell")

        # ---- NumPy oracle ----
        improved = oracle_coarse_feedback(df, FINE, 4)
        # nearest nadir record by ts
        pos_hi = np.searchsorted(track_ts, df.ts.to_numpy(), side="left")
        lo = np.clip(pos_hi - 1, 0, len(track_ts) - 1)
        hi = np.clip(pos_hi, 0, len(track_ts) - 1)
        pos = np.where(np.abs(track_ts[hi] - df.ts.to_numpy())
                       < np.abs(df.ts.to_numpy() - track_ts[lo]), hi, lo)
        nadir = np.stack([payload["nx"][pos], payload["ny"][pos],
                          payload["nz"][pos]], axis=1)
        nlat, nlon, nh = G.taylor_height_shift(
            df.lat.to_numpy(), df.lon.to_numpy(), df.value.to_numpy(),
            nadir, improved - df.value.to_numpy())
        iy, ix, ok = bin_to_grid(FINE, nlon, nlat)
        cell = np.where(ok, grid_cell_key(FINE, iy, ix), -1)
        for c in np.unique(cell[cell >= 0]):
            m = cell == c
            want_mean = nh[m].mean()
            want_n = int(m.sum())
            assert c in got.index, c
            np.testing.assert_allclose(got.loc[c, "mean_value"], want_mean,
                                       rtol=1e-9, err_msg=str(c))
            assert got.loc[c, "n_pix"] == want_n
