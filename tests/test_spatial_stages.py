"""PIP join, kNN join, as-of join, sessionize, zonal mode — golden tests
against brute-force oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from raster_processor_ray.geo import crs
from raster_processor_ray.stages.asof import asof_join
from raster_processor_ray.stages.knn import KnnIndex, knn_join
from raster_processor_ray.stages.pip import PipJoin, PolygonIndex, PolygonSpec, pip_join
from raster_processor_ray.stages.sessionize import session_stats, sessionize
from raster_processor_ray.aggregate.zonal import zonal_mode

RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def points():
    n = 5000
    return pd.DataFrame({
        "url": [f"u{i}" for i in range(n)],
        "lat": RNG.uniform(-10, 10, n),
        "lon": RNG.uniform(-10, 10, n),
    })


# vertices use non-grid-aligned coordinates so no generated point sits on
# an edge (documented tie-rule guard, FIXTURES.md F3)
SQUARE = PolygonSpec(1, "square", np.array(
    [[-5.1234, -5.2345], [5.2345, -5.2345], [5.2345, 5.1234], [-5.1234, 5.1234]]))
TRIANGLE = PolygonSpec(2, "triangle", np.array(
    [[-8.0123, -8.1234], [8.1234, -8.1234], [0.0123, 9.0123]]))
CONCAVE = PolygonSpec(3, "concave", np.array(
    [[-3.0111, -3.0222], [3.0222, -3.0111], [3.0111, 3.0222],
     [0.0111, 0.0222], [-3.0222, 3.0111]]))
HOLED = PolygonSpec(4, "holed", np.array(
    [[-9.5012, -9.5023], [9.5023, -9.5012], [9.5012, 9.5023], [-9.5023, 9.5012]]),
    holes=[np.array([[-1.0123, -1.0234], [1.0234, -1.0123], [1.0123, 1.0234],
                     [-1.0234, 1.0123]])])
ANTIMERIDIAN = PolygonSpec(5, "antimeridian", np.array(
    [[175.0123, -5.0123], [185.0234, -5.0123], [185.0234, 5.0234], [175.0123, 5.0234]]))

POLYS = [SQUARE, TRIANGLE, CONCAVE, HOLED, ANTIMERIDIAN]


def pip_oracle(lat, lon, poly: PolygonSpec) -> np.ndarray:
    """Independent scalar even-odd ray casting (classic C algorithm)."""
    def point_in_ring(x, y, ring):
        inside = False
        r = ring if np.array_equal(ring[0], ring[-1]) else np.vstack([ring, ring[:1]])
        j = len(r) - 2
        for i in range(len(r) - 1):
            xi, yi = r[i]
            xj, yj = r[j]
            if ((yi > y) != (yj > y)) and (x < (xj - xi) * (y - yi) / (yj - yi) + xi):
                inside = not inside
            j = i
        return inside

    frame = poly.exterior[:, 0].min()
    out = []
    for la, lo in zip(lat, lon):
        x = frame + ((lo - frame) % 360.0)
        r = point_in_ring(x, la, poly.exterior)
        for h in poly.holes:
            if point_in_ring(x, la, h):
                r = not r
        out.append(r)
    return np.array(out)


class TestPip:
    def test_index_vs_oracle(self, points):
        idx = PolygonIndex(POLYS)
        for k, poly in enumerate(POLYS):
            got = idx.contains(points.lat.to_numpy(), points.lon.to_numpy(), k)
            want = pip_oracle(points.lat.to_numpy(), points.lon.to_numpy(), poly)
            np.testing.assert_array_equal(got, want, err_msg=poly.label)
            if poly.label != "antimeridian":
                assert want.any()  # fixture actually covers each polygon

    def test_antimeridian(self):
        idx = PolygonIndex([ANTIMERIDIAN])
        # -178 wraps to 182, inside; 170 outside
        got = idx.contains(np.array([0.0, 0.0]), np.array([-178.0, 170.0]), 0)
        assert list(got) == [True, False]

    def test_inner_join_rows(self, points, ray_session):
        ds = rd.from_pandas(points).repartition(4)
        out = pip_join(ds, POLYS, "inner").to_pandas()
        # oracle pair set
        want = set()
        for poly in POLYS:
            m = pip_oracle(points.lat.to_numpy(), points.lon.to_numpy(), poly)
            for u in points.url.to_numpy()[m]:
                want.add((u, poly.poly_id))
        got = set(zip(out.url, out.poly_id))
        assert got == want
        # labels consistent
        lbl = {p.poly_id: p.label for p in POLYS}
        assert all(lbl[pid] == l for pid, l in zip(out.poly_id, out.label))

    def test_semi_anti_partition(self, points, ray_session):
        ds = rd.from_pandas(points).repartition(4)
        semi = pip_join(ds, POLYS, "semi").to_pandas()
        anti = pip_join(ds, POLYS, "anti").to_pandas()
        assert len(semi) + len(anti) == len(points)
        assert set(semi.url) | set(anti.url) == set(points.url)
        assert not (set(semi.url) & set(anti.url))
        # semi/anti keep columns unchanged
        assert list(semi.columns) == list(points.columns)


class TestKnn:
    def test_vs_bruteforce(self, points, ray_session):
        sites = pd.DataFrame({
            "site_id": np.arange(50, dtype=np.int64),
            "lat": RNG.uniform(-12, 12, 50),
            "lon": RNG.uniform(-12, 12, 50),
        })
        ds = rd.from_pandas(points.head(500)).repartition(3)
        out = knn_join(ds, sites.site_id.to_numpy(), sites.lat.to_numpy(),
                       sites.lon.to_numpy(), k=3).to_pandas()
        assert len(out) == 500 * 3
        # oracle: same dot-product metric, argsort with site_id tie-break
        idx = KnnIndex(sites.site_id.to_numpy(), sites.lat.to_numpy(), sites.lon.to_numpy())
        for u in points.url.head(20):
            row = points[points.url == u].iloc[0]
            px, py, pz = (np.cos(np.radians(row.lat)) * np.cos(np.radians(row.lon)),
                          np.cos(np.radians(row.lat)) * np.sin(np.radians(row.lon)),
                          np.sin(np.radians(row.lat)))
            dots = idx.xyz @ np.array([px, py, pz])
            order = np.lexsort((idx.site_ids, -dots))[:3]
            want = idx.site_ids[order]
            got = out[out.url == u].sort_values("knn_rank").site_id.to_numpy()
            np.testing.assert_array_equal(got, want)

    def test_distances_monotone(self, points, ray_session):
        sites = pd.DataFrame({"site_id": [1, 2], "lat": [0.0, 50.0], "lon": [0.0, 50.0]})
        ds = rd.from_pandas(points.head(50))
        out = knn_join(ds, sites.site_id.to_numpy(), sites.lat.to_numpy(),
                       sites.lon.to_numpy(), k=2).to_pandas()
        g = out.sort_values(["url", "knn_rank"]).groupby("url").dist_m.apply(
            lambda s: (s.diff().dropna() >= 0).all())
        assert g.all()
        # cross-check one distance against haversine
        r0 = out[(out.url == "u0")].sort_values("knn_rank").iloc[0]
        site = sites[sites.site_id == r0.site_id].iloc[0]
        p = points[points.url == "u0"].iloc[0]
        want = crs.haversine_m(p.lat, p.lon, site.lat, site.lon)
        assert abs(r0.dist_m - want) < 1.0  # same sphere, different formula path


class TestAsof:
    def test_directions(self, ray_session):
        left = pd.DataFrame({"id": np.arange(100), "t": np.sort(RNG.uniform(0, 100, 100))})
        rt = np.array([10.0, 30.0, 50.0, 90.0])
        payload = {"dim": np.array([1, 2, 3, 4])}
        ds = rd.from_pandas(left).repartition(3)
        for direction in ("backward", "forward", "nearest"):
            got = asof_join(ds, rt, payload, "t", direction).to_pandas().sort_values("id")
            mdf = pd.merge_asof(left.sort_values("t"),
                                pd.DataFrame({"t": rt, "dim_r": payload["dim"]}),
                                on="t", direction=direction)
            want = mdf.sort_values("id").dim_r.to_numpy(dtype=np.float64)
            np.testing.assert_array_equal(
                got.dim_r.to_numpy(dtype=np.float64), want, err_msg=direction)


class TestSessionize:
    def test_gap_split(self, ray_session):
        df = pd.DataFrame({
            "user": ["a"] * 5 + ["b"] * 3,
            "ts": [0.0, 1.0, 2.0, 50.0, 51.0, 5.0, 100.0, 101.0],
            "v": np.arange(8, dtype=np.float64),
        })
        ds = rd.from_pandas(df)
        got = sessionize(ds, "user", "ts", 10.0).to_pandas().sort_values(["user", "ts"])
        want_a = [0, 0, 0, 1, 1]
        want_b = [0, 1, 1]
        assert list(got[got.user == "a"].session_seq) == want_a
        assert list(got[got.user == "b"].session_seq) == want_b

        stats = session_stats(ds, "user", "ts", 10.0, "v").to_pandas()
        a1 = stats[(stats.user == "a") & (stats.session_seq == 1)].iloc[0]
        assert a1.n_events == 2 and a1.session_start == 50.0 and a1.sum_value == 7.0

    def test_many_keys_vectorized_matches_pandas_oracle(self, ray_session):
        """Per-bucket vectorized split (one cumsum across ALL keys in a
        bucket) vs a per-key pandas oracle, at a key count where a
        map_groups-per-key implementation would explode into 10^4 tasks."""
        from raster_processor_ray.geo.hashing import splitmix64

        n = 60_000
        idx = np.arange(n, dtype=np.uint64)
        u = lambda s: splitmix64(idx + np.uint64(s)).astype(np.float64) / float(2**64)
        df = pd.DataFrame({
            "user": (u(1) * 10_000).astype(np.int64),
            "ts": np.floor(u(2) * 5_000.0),
            "v": u(3),
        })
        got = sessionize(rd.from_pandas(df).repartition(7),
                         "user", "ts", 3.0).to_pandas() \
            .sort_values(["user", "ts", "v"]).reset_index(drop=True)

        def oracle(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values("ts", kind="mergesort")
            g["session_seq"] = ((g.ts - g.ts.shift(1)) > 3.0).cumsum()
            return g

        want = (df.groupby("user", group_keys=False)[df.columns.tolist()]
                .apply(oracle)
                .sort_values(["user", "ts", "v"]).reset_index(drop=True))
        np.testing.assert_array_equal(got.session_seq.to_numpy(),
                                      want.session_seq.to_numpy())
        # stats row-count parity: one row per (user, session)
        stats = session_stats(rd.from_pandas(df), "user", "ts", 3.0,
                              "v").to_pandas()
        assert len(stats) == want.groupby(["user", "session_seq"]).ngroups
        np.testing.assert_allclose(stats.sum_value.sum(), df.v.sum())


class TestZonal:
    def test_mode_with_ties(self, ray_session):
        df = pd.DataFrame({
            "grid_cell": [1, 1, 1, 2, 2, 3],
            "label": ["x", "x", "y", "y", "a", "z"],
        })
        got = zonal_mode(rd.from_pandas(df)).to_pandas().sort_values("grid_cell")
        assert list(got.mode_label) == ["x", "a", "z"]  # tie in cell 2 -> 'a'
        assert list(got.mode_count) == [2, 1, 1]


class TestKnnSharded:
    def test_sharded_equals_broadcast(self, ray_session):
        """knn_join_sharded (site table split into shards + per-point
        merge) returns exactly the broadcast knn_join result."""
        import pandas as pd
        import ray.data as rd
        from raster_processor_ray.geo.hashing import splitmix64
        from raster_processor_ray.stages.knn import knn_join, knn_join_sharded

        ns, npts = 500, 800
        sid = np.arange(ns, dtype=np.int64)
        h = splitmix64(sid.astype(np.uint64))
        slat = (h & np.uint64(0xFFFFFFFF)).astype(np.float64) / 2**32 * 160 - 80
        slon = (h >> np.uint64(32)).astype(np.float64) / 2**32 * 360 - 180
        pid = np.arange(npts, dtype=np.int64)
        hp = splitmix64(pid.astype(np.uint64) + np.uint64(99))
        plat = (hp & np.uint64(0xFFFFFFFF)).astype(np.float64) / 2**32 * 160 - 80
        plon = (hp >> np.uint64(32)).astype(np.float64) / 2**32 * 360 - 180
        pts = rd.from_pandas(pd.DataFrame(
            {"pid": pid, "lat": plat, "lon": plon})).repartition(3)

        want = knn_join(pts, sid, slat, slon, k=3).to_pandas() \
            .sort_values(["pid", "knn_rank"]).reset_index(drop=True)
        got = knn_join_sharded(pts, sid, slat, slon, k=3, point_id_col="pid",
                               shard_size=120).to_pandas() \
            .sort_values(["pid", "knn_rank"]).reset_index(drop=True)
        assert len(got) == npts * 3
        np.testing.assert_array_equal(got.pid.to_numpy(), want.pid.to_numpy())
        np.testing.assert_array_equal(got.site_id.to_numpy(),
                                      want.site_id.to_numpy())
        np.testing.assert_allclose(got.dist_m.to_numpy(),
                                   want.dist_m.to_numpy(), rtol=1e-9)

    def test_bucketed_equals_broadcast(self, ray_session):
        """knn_join_bucketed (cell-prefiltered probe + cap-bound verify
        + brute fallback) is EXACT: equals knn_join on the same data."""
        import pandas as pd
        import ray.data as rd
        from raster_processor_ray.geo.hashing import splitmix64
        from raster_processor_ray.stages.knn import knn_join, knn_join_bucketed

        ns, npts = 600, 900
        sid = np.arange(ns, dtype=np.int64)
        h = splitmix64(sid.astype(np.uint64))
        slat = (h & np.uint64(0xFFFFFFFF)).astype(np.float64) / 2**32 * 176 - 88
        slon = (h >> np.uint64(32)).astype(np.float64) / 2**32 * 360 - 180
        pid = np.arange(npts, dtype=np.int64)
        hp = splitmix64(pid.astype(np.uint64) + np.uint64(7))
        plat = (hp & np.uint64(0xFFFFFFFF)).astype(np.float64) / 2**32 * 176 - 88
        plon = (hp >> np.uint64(32)).astype(np.float64) / 2**32 * 360 - 180
        pts = rd.from_pandas(pd.DataFrame(
            {"pid": pid, "lat": plat, "lon": plon})).repartition(3)

        want = knn_join(pts, sid, slat, slon, k=3).to_pandas() \
            .sort_values(["pid", "knn_rank"]).reset_index(drop=True)
        got = knn_join_bucketed(pts, sid, slat, slon, k=3).to_pandas() \
            .sort_values(["pid", "knn_rank"]).reset_index(drop=True)
        np.testing.assert_array_equal(got.site_id.to_numpy(),
                                      want.site_id.to_numpy())
        # dists agree to ~ULP of the dot product; arccos amplifies one
        # ULP near dot=1 to sqrt(2*eps)*R ~ 0.13 m (einsum vs matmul
        # kernels round differently), hence the sub-meter atol
        np.testing.assert_allclose(got.dist_m.to_numpy(),
                                   want.dist_m.to_numpy(),
                                   rtol=1e-9, atol=0.2)

    def test_grid_index_exact_sweep(self):
        """KnnGridIndex == KnnIndex across polar, antimeridian, sparse
        and forced-bad cell-size configs (fallback path exercised)."""
        from raster_processor_ray.stages.knn import KnnIndex, KnnGridIndex

        rng = np.random.RandomState(0)
        cases = [
            (400, 1500, (-60, 60), None, 1),
            (200, 800, (-89.9, 89.9), None, 1),     # polar caps
            (300, 1200, (40, 50), None, 1),
            (3, 500, (-60, 60), None, 1),           # fewer sites than k
            (300, 800, (-30, 30), 60.0, 1),         # side >= nx wrap-dedupe
            (300, 800, (-60, 60), 0.5, 1),          # forced-sparse: all fallback
        ]
        for trial, (ns, npts, latr, cd, pr) in enumerate(cases):
            sid = np.arange(ns, dtype=np.int64)
            slat = rng.uniform(*latr, ns)
            slon = rng.uniform(-180, 180, ns)
            plat = rng.uniform(*latr, npts)
            plon = rng.uniform(-180, 180, npts)
            bi = KnnIndex(sid, slat, slon)
            gi = KnnGridIndex(sid, slat, slon, cell_deg=cd, probe_ring=pr)
            for k in (1, 3, 8):
                i1, d1 = bi.query(plat, plon, k)
                i2, d2 = gi.query(plat, plon, k)
                np.testing.assert_array_equal(
                    bi.site_ids[i1], gi.site_ids[i2],
                    err_msg=f"trial {trial} k={k}")
                np.testing.assert_allclose(d1, d2, err_msg=f"trial {trial} k={k}")
