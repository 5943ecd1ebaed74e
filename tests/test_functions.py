"""Scalar function library tests (SURVEY.md §2.8)."""

import numpy as np
import pyarrow as pa
import pytest

from raster_processor_ray.functions import datetime_fns as dt
from raster_processor_ray.functions import strings as st


class TestDatetime:
    def test_swot_epoch_roundtrip(self):
        secs = pa.array([0.0, 1.5, 86400.0])
        ts = dt.swot_seconds_to_timestamp(secs)
        assert ts[0].as_py().isoformat() == "2000-01-01T00:00:00"
        back = dt.timestamp_to_swot_seconds(ts)
        np.testing.assert_allclose(np.asarray(back), [0.0, 1.5, 86400.0])

    def test_format_parse(self):
        ts = dt.swot_seconds_to_timestamp(pa.array([3600.0]))
        s = dt.format_utc(ts)
        assert s[0].as_py() == "2000-01-01T01:00:00Z"
        ts2 = dt.parse_utc(s)
        assert ts2[0].as_py() == ts[0].as_py()

    def test_str_comparator(self):
        assert dt.datetime_str_comp("2020-01-01T00:00:00Z", "2020-01-02T00:00:00Z") == -1
        assert dt.datetime_str_comp("2020-01-02T00:00:00Z", "2020-01-01T00:00:00Z") == 1
        assert dt.datetime_str_comp("2020-01-01T00:00:00Z", "2020-01-01T00:00:00Z") == 0

    def test_leap_second_window(self):
        # 2017-01-01 leap boundary
        ts = pa.array([np.datetime64("2016-12-31T23:59:59.5", "us"),
                       np.datetime64("2016-06-01T00:00:00", "us")])
        m = dt.in_leap_second_window(ts)
        assert m[0].as_py() is True and m[1].as_py() is False


class TestStrings:
    def test_compose_parse_roundtrip(self):
        names = st.compose_tile_name(np.array([1, 123]), np.array([45, 7]),
                                     np.array(["L", "R"]))
        assert names.to_pylist() == ["001_045L", "123_007R"]
        d = st.parse_tile_name(names)
        np.testing.assert_array_equal(d["pass_num"], [1, 123])
        np.testing.assert_array_equal(d["tile_num"], [45, 7])
        assert list(d["side"]) == ["L", "R"]

    def test_parse_rejects_bad(self):
        with pytest.raises(ValueError):
            st.parse_tile_name(["1_2X"])

    def test_sort_key_side_then_name(self):
        """Side-then-(pass,tile) ordering — reference products.py:1713-1724."""
        names = ["002_001R", "001_002L", "001_001L"]
        keys = st.tile_sort_key(names)
        order = [names[i] for i in np.argsort(keys)]
        assert order == ["001_001L", "001_002L", "002_001R"]
