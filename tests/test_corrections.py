"""Golden tests for the named M11/M13/O2 kernels (functions/corrections)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from raster_processor_ray.functions import corrections as K


class TestWse:
    def test_apply_and_inverse_roundtrip(self):
        h = np.array([100.0, 50.5, -3.25, np.nan])
        g = np.array([30.0, -10.0, 5.0, 1.0])
        s = np.array([0.1, 0.2, -0.05, 0.0])
        l = np.array([0.01, -0.02, 0.0, 0.3])
        p = np.array([0.001, 0.0, -0.002, 0.1])
        wse = K.apply_wse_corrections(h, g, s, l, p)
        np.testing.assert_allclose(wse[:3], (h - (g + s + l + p))[:3])
        assert np.isnan(wse[3])
        back = K.uncorrected_height(wse, g, s, l, p)
        np.testing.assert_allclose(back[:3], h[:3], rtol=1e-15)

    def test_add_wse_column_nulls(self, ray_session):
        df = pd.DataFrame({
            "height": [10.0, 20.0, None],
            "geoid": [1.0, None, 1.0],
            "solid_earth_tide": [0.1, 0.1, 0.1],
            "load_tide": [0.0, 0.0, 0.0],
            "pole_tide": [0.0, 0.0, 0.0],
        })
        out = K.add_wse_column(rd.from_pandas(df)).to_pandas() \
            .sort_values("height").reset_index(drop=True)
        np.testing.assert_allclose(out.wse.iloc[0], 8.9)
        # a null in any input masks the output (np.ma semantics)
        assert out.wse.isna().sum() == 2


class TestDerived:
    def test_range_line(self, ray_session):
        df = pd.DataFrame({"range_index": [0, 1, 5],
                           "azimuth_index": [7, 8, 9]})
        out = K.add_derived_range_line(
            rd.from_pandas(df), near_range=890_000.0,
            slant_range_spacing=0.75).to_pandas() \
            .sort_values("azimuth_index").reset_index(drop=True)
        np.testing.assert_allclose(out["range"],
                                   890_000.0 + np.array([0, 1, 5]) * 0.75)
        assert list(out.line_index) == [7, 8, 9]


class TestMedianCentral:
    def test_nearest_rank_median(self):
        # 5 values: median is the 3rd smallest
        vals = [10.0, 50.0, 30.0, 20.0, 40.0]
        assert K.median_central_index(vals) == 2       # value 30
        # even count: numpy 'nearest' picks one of the middle ranks
        vals = [4.0, 1.0, 3.0, 2.0]
        idx = K.median_central_index(vals)
        assert vals[idx] in (2.0, 3.0)
        # ties -> first occurrence (list.index parity)
        assert K.median_central_index([5.0, 5.0, 5.0]) == 0

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            K.median_central_index([])
