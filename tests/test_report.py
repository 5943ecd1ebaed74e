"""Report layer (aggregate/report.py): per-group error metrics vs a
pure-NumPy oracle using the reference formulas, verdict bounds, renderer
markers, and the end-to-end raster_report file set."""
import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raster_processor_ray.aggregate.metrics import compute_metrics_from_error
from raster_processor_ray.aggregate.report import (global_error_metrics,
                                                   group_error_metrics,
                                                   render_table,
                                                   verdict_from_e68)


def _synthetic_errors(n_groups=13, n_per=200, seed=7):
    rng = np.random.RandomState(seed)
    g = np.repeat(np.arange(n_groups, dtype=np.int64), n_per)
    # group k has error scale ~ k/20: spans pass (<0.1), conditional, fail
    e = rng.normal(0, 1, len(g)) * (g / 20.0 + 0.01)
    u = rng.uniform(0.05, 0.5, len(g))
    return pd.DataFrame({"tile_id": g, "error": e, "norm_error": e / u})


class TestGroupErrorMetrics:
    def test_matches_reference_formula_oracle(self, ray_session):
        df = _synthetic_errors()
        out = group_error_metrics(rd.from_pandas(df).repartition(8),
                                  "tile_id", num_buckets=4).to_pandas() \
            .sort_values("tile_id").reset_index(drop=True)
        assert len(out) == 13
        for _, row in out.iterrows():
            sub = df[df.tile_id == row.tile_id]
            m = compute_metrics_from_error(sub.error.to_numpy())
            nm = compute_metrics_from_error(sub.norm_error.to_numpy())
            assert row.n_cells == m["n"]
            np.testing.assert_allclose(row.e_mean, m["mean"], rtol=1e-12)
            np.testing.assert_allclose(row.e_std, m["std"], rtol=1e-12)
            np.testing.assert_allclose(row.abs_e_68_pct, m["e_68_pct"],
                                       rtol=1e-12)
            np.testing.assert_allclose(row.e_50_pct, m["median"], rtol=1e-12)
            np.testing.assert_allclose(row.abs_ne_68_pct, nm["e_68_pct"],
                                       rtol=1e-12)

    def test_verdict_spans_all_three(self, ray_session):
        df = _synthetic_errors()
        out = group_error_metrics(rd.from_pandas(df), "tile_id").to_pandas()
        assert set(out.verdict) == {"pass", "conditional", "fail"}

    def test_without_norm_column(self, ray_session):
        df = _synthetic_errors().drop(columns=["norm_error"])
        out = group_error_metrics(rd.from_pandas(df), "tile_id",
                                  norm_col=None).to_pandas()
        assert "ne_mean" not in out.columns
        assert set(out.columns) == {"tile_id", "n_cells", "e_mean", "e_std",
                                    "abs_e_68_pct", "e_50_pct", "verdict"}


class TestVerdictBounds:
    def test_raw_bounds(self):
        # metrics.py:20-26: |e|_68 < 0.10 pass, < 1 conditional, else fail
        v = verdict_from_e68(np.array([0.05, 0.10, 0.99, 1.0, np.nan]))
        assert list(v) == ["pass", "conditional", "conditional", "fail",
                           "fail"]

    def test_norm_worsens_only(self):
        v = verdict_from_e68(np.array([0.05, 0.05, 0.05]),
                             np.array([0.5, 1.5, 2.5]))
        assert list(v) == ["pass", "conditional", "fail"]

    def test_missing_norm_does_not_worsen(self):
        v = verdict_from_e68(np.array([0.05]), np.array([np.nan]))
        assert list(v) == ["pass"]


class TestRenderTable:
    def test_markers_and_file(self, tmp_path):
        df = pd.DataFrame({
            "tile_id": [1, 2, 3],
            "abs_e_68_pct": [0.05, 0.5, 2.0],
            "verdict": ["pass", "conditional", "fail"],
        })
        fname = str(tmp_path / "t.txt")
        text = render_table(df, precision=3, preamble="hdr", fname=fname)
        assert text.startswith("hdr\n")
        assert "0.050\n" in text or "0.050" in text.split()   # pass: bare
        assert "0.500*" in text                                # conditional
        assert "2.000!" in text                                # fail
        assert open(fname).read() == text

    def test_global_row(self):
        df = _synthetic_errors()
        g = global_error_metrics(df)
        m = compute_metrics_from_error(df.error.to_numpy())
        np.testing.assert_allclose(g["abs_e_68_pct"], m["e_68_pct"])
        assert g["verdict"] in ("pass", "conditional", "fail")


class TestRasterReport:
    def test_end_to_end_files(self, tmp_path, ray_session):
        from raster_processor_ray.aggregate.report import raster_report
        from raster_processor_ray.geo.cells import GridSpec

        grid = GridSpec(x_min=-10, y_min=-10, x_max=10, y_max=10, res=1.0,
                        tile_size=4)
        rng = np.random.RandomState(11)
        cells = np.arange(grid.size_x * grid.size_y, dtype=np.int64)
        truth_v = rng.uniform(0, 5, len(cells))
        proc = pd.DataFrame({
            "grid_cell": cells,
            "wmean_value": truth_v + rng.normal(0, 0.05, len(cells)),
            "wmean_uncert": rng.uniform(0.02, 0.2, len(cells)),
        })
        truth = pd.DataFrame({"grid_cell": cells, "wmean_value": truth_v})
        out = raster_report(rd.from_pandas(proc), rd.from_pandas(truth),
                            grid, str(tmp_path / "report"))
        assert os.path.exists(out["paths"]["tile"])
        assert os.path.exists(out["paths"]["global"])
        # every grid tile appears; sorted worst-first by |e|_68
        tt = out["tile_table"]
        assert tt.n_cells.sum() == len(cells)
        assert (tt.abs_e_68_pct.to_numpy()[:-1]
                >= tt.abs_e_68_pct.to_numpy()[1:]).all()
        # global metrics agree with a direct NumPy computation
        err = proc.wmean_value.to_numpy() - truth_v
        m = compute_metrics_from_error(err)
        np.testing.assert_allclose(out["global"]["abs_e_68_pct"],
                                   m["e_68_pct"], rtol=1e-12)
        text = open(out["paths"]["tile"]).read()
        assert "legend:" in text and "abs_e_68_pct" in text
