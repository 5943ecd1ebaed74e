"""Property-based tests (hypothesis) for the geo kernels — round-trips,
hierarchy invariants, wrap idempotence (SURVEY.md §7.0: S2 ordering and
transverse-Mercator series must be property-tested)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from raster_processor_ray.geo import cells, crs, hashing, utm
from raster_processor_ray.geo.geodesic import vincenty_m

lat_s = st.floats(min_value=-80.0, max_value=84.0 - 1e-9,
                  allow_nan=False, allow_infinity=False)
lon_s = st.floats(min_value=-180.0, max_value=180.0 - 1e-9,
                  allow_nan=False, allow_infinity=False)


@settings(max_examples=200, deadline=None)
@given(lat_s, lon_s)
def test_utm_roundtrip(lat, lon):
    e, n, z = utm.latlon_to_utm(np.array([lat]), np.array([lon]))
    la2, lo2 = utm.utm_to_latlon(e, n, z, np.array([lat >= 0]))
    assert crs.haversine_m(np.array([lat]), np.array([lon]), la2, lo2)[0] < 1e-2


@settings(max_examples=200, deadline=None)
@given(lat_s, lon_s, st.floats(min_value=-1000, max_value=9000,
                               allow_nan=False))
def test_ecef_roundtrip(lat, lon, h):
    x, y, z = crs.llh_to_ecef(np.array([lat]), np.array([lon]), np.array([h]))
    la2, lo2, h2 = crs.ecef_to_llh(x, y, z)
    assert abs(la2[0] - lat) < 1e-8
    assert abs(crs.lon_360to180(np.array([lo2[0] - lon]))[0]) < 1e-8
    assert abs(h2[0] - h) < 1e-4


@settings(max_examples=200, deadline=None)
@given(lat_s, lon_s, st.integers(min_value=1, max_value=29))
def test_s2_parent_hierarchy(lat, lon, level):
    fine = cells.s2ish_cell_id(np.array([lat]), np.array([lon]), level + 1)
    coarse = cells.s2ish_cell_id(np.array([lat]), np.array([lon]), level)
    assert cells.s2ish_parent(fine, level)[0] == coarse[0]


@settings(max_examples=100, deadline=None)
@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
def test_wrap_idempotent(lon):
    w = crs.lon_360to180(np.array([lon]))[0]
    assert -180.0 <= w < 180.0
    assert abs(crs.lon_360to180(np.array([w]))[0] - w) < 1e-9


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=64))
def test_fnv_stable_and_string_sensitive(s):
    a = hashing.fnv1a_64([s])
    b = hashing.fnv1a_64([s])
    assert a[0] == b[0]
    if s:  # appending a byte changes the hash
        assert hashing.fnv1a_64([s + "x"])[0] != a[0]


@settings(max_examples=100, deadline=None)
@given(lat_s, lon_s, lat_s, lon_s)
def test_vincenty_symmetric_and_bounded(la1, lo1, la2, lo2):
    d = vincenty_m(np.array([la1]), np.array([lo1]), np.array([la2]), np.array([lo2]))[0]
    d2 = vincenty_m(np.array([la2]), np.array([lo2]), np.array([la1]), np.array([lo1]))[0]
    assert abs(d - d2) < 1e-4
    assert 0.0 <= d < 20_100_000  # under half the circumference + slack
    sph = crs.haversine_m(np.array([la1]), np.array([lo1]),
                          np.array([la2]), np.array([lo2]))[0]
    assert abs(d - sph) <= 0.006 * max(sph, 1.0) + 1.0  # flattening bound


@settings(max_examples=100, deadline=None)
@given(lat_s, lon_s)
def test_binning_center_inverse(lat, lon):
    """A cell's center bins back into the same cell (round-trip of the
    reference binning rule)."""
    g = cells.GridSpec(x_min=-180, y_min=-90, x_max=180, y_max=90, res=0.25,
                       wrap_lon=True)
    iy, ix, ok = cells.bin_to_grid(g, np.array([lon]), np.array([lat]))
    if ok[0] and ix[0] != g.size_x - 1:
        # the last column is the reference convention's duplicated
        # antimeridian fencepost (size = span/res + 1): its center is
        # exactly x_min + 360, which wraps back to column 0 — exempt it
        cx = g.x_min + ix[0] * g.res
        cy = g.y_min + iy[0] * g.res
        iy2, ix2, ok2 = cells.bin_to_grid(g, np.array([cx]), np.array([cy]))
        assert ok2[0] and iy2[0] == iy[0] and ix2[0] == ix[0]


class TestGroupPairIndices:
    """Property: the vectorized group-pair kernel emits exactly C(s,2)
    pairs for every under-cap group and (s-1) star pairs for over-cap
    groups, always with ia < ib positionally."""

    @given(st.lists(st.integers(min_value=1, max_value=40), min_size=0,
                    max_size=20),
           st.integers(min_value=2, max_value=12))
    @settings(max_examples=200, deadline=None)
    def test_pair_counts(self, sizes, cap):
        from raster_processor_ray.stages.dedup import _group_pair_indices

        sizes = np.array(sizes, dtype=np.int64)
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64) \
            if len(sizes) else np.empty(0, dtype=np.int64)
        ia, ib, ncol = _group_pair_indices(sizes, starts, cap)
        want = sum(int(s * (s - 1) // 2) for s in sizes if 2 <= s <= cap)
        want += sum(int(s - 1) for s in sizes if s > cap)
        assert len(ia) == len(ib) == want
        assert ncol == int((sizes > cap).sum())
        assert (ia < ib).all()
        # every index stays inside its own group
        total = int(sizes.sum())
        if want:
            assert ia.min() >= 0 and ib.max() < total
            ends = np.concatenate([starts, [total]])
            ga = np.searchsorted(ends, ia, side="right") - 1
            gb = np.searchsorted(ends, ib, side="right") - 1
            np.testing.assert_array_equal(ga, gb)
