"""Lineage/resume (FIXTURES.md F6), metrics harness, filters, scene ops,
hash join, config parsing, signal kernels."""

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from raster_processor_ray.aggregate import metrics as M
from raster_processor_ray.aggregate.relational import hash_join, subsample_every_k
from raster_processor_ray.functions import config_rdf, signal
from raster_processor_ray.pipelines import scene
from raster_processor_ray.pipelines.flagship import rasterize_pages
from raster_processor_ray.sources.pages import make_pages_batch
from raster_processor_ray.stages import filters
from raster_processor_ray.state import lineage

OUT = "/tmp/rpr_test_lineage"


class TestLineage:
    def setup_method(self):
        shutil.rmtree(OUT, ignore_errors=True)

    def _ds(self, n=5000):
        return rd.from_pandas(pd.DataFrame({
            "key": np.arange(n, dtype=np.int64),
            "val": np.arange(n, dtype=np.float64) * 2.0,
        })).repartition(4)

    def test_write_read_roundtrip(self, ray_session):
        m = lineage.write_resumable(self._ds(), OUT, key_col="key", num_shards=8)
        assert len(m) == 8 and m.rows.sum() == 5000
        back = lineage.read_resumable(OUT).to_pandas().sort_values("key")
        np.testing.assert_array_equal(back.key.to_numpy(), np.arange(5000))

    def test_resume_skips_finished(self, ray_session):
        lineage.write_resumable(self._ds(), OUT, key_col="key", num_shards=8)
        mt = {s: os.path.getmtime(f"{OUT}/shard={s:05d}/data.parquet")
              for s in range(8)}
        shutil.rmtree(f"{OUT}/shard=00002")
        m2 = lineage.write_resumable(self._ds(), OUT, key_col="key", num_shards=8)
        assert sorted(m2.shard) == [2]
        for s in (0, 1, 3, 4, 5, 6, 7):
            assert os.path.getmtime(f"{OUT}/shard={s:05d}/data.parquet") == mt[s]
        assert lineage.read_resumable(OUT).count() == 5000

    def test_stale_stage_version_rewrites(self, ray_session):
        lineage.write_resumable(self._ds(), OUT, key_col="key", num_shards=4)
        mpath = f"{OUT}/shard=00001/MANIFEST.json"
        mj = json.load(open(mpath))
        mj["stage_version"] = -1
        json.dump(mj, open(mpath, "w"))
        m2 = lineage.write_resumable(self._ds(), OUT, key_col="key", num_shards=4)
        assert sorted(m2.shard) == [1]

    def test_manifest_contents(self, ray_session):
        lineage.write_resumable(self._ds(100), OUT, key_col="key", num_shards=4,
                                sort_cols=["key"])
        summ = lineage.manifest_summary(OUT)
        assert set(summ.columns) >= {"shard", "rows", "key_min", "key_max", "key_hash"}
        assert summ.rows.sum() == 100

    def test_resume_mid_shuffle(self, ray_session):
        """F6: partials checkpointed before the combine; a 'killed' run
        resumes from the partial-aggregate checkpoint and matches the
        uninterrupted result exactly."""
        pages = rd.from_arrow(make_pages_batch(0, 20000, with_html=False)).repartition(4)
        ck = f"{OUT}/partials"
        full = rasterize_pages(pages).to_pandas().sort_values("grid_cell").reset_index(drop=True)
        # run 1: writes the partial checkpoint (simulate kill after by
        # simply not consuming further)
        _ = rasterize_pages(pages, checkpoint_partials_dir=ck)
        assert len(lineage.finished_shards(ck)) > 0
        # run 2: resume=True must NOT recompute partials (drop a canary
        # into the checkpoint set: resumed output == full output proves it
        # read the checkpoint; mtimes prove no rewrite)
        mt = {s: os.path.getmtime(f"{ck}/shard={s:05d}/data.parquet")
              for s in lineage.finished_shards(ck)}
        resumed = rasterize_pages(pages, checkpoint_partials_dir=ck, resume=True) \
            .to_pandas().sort_values("grid_cell").reset_index(drop=True)
        for s, t in mt.items():
            assert os.path.getmtime(f"{ck}/shard={s:05d}/data.parquet") == t
        pd.testing.assert_frame_equal(resumed, full, rtol=1e-12, atol=1e-12)


class TestMetrics:
    def test_formulas(self):
        err = np.array([0.1, -0.1, 0.2, 0.0, np.nan])
        m = M.compute_metrics_from_error(err)
        assert m["n"] == 4
        np.testing.assert_allclose(m["mean"], 0.05)
        np.testing.assert_allclose(m["median"], 0.05)
        assert 0.09 <= m["e_68_pct"] <= 0.2

    def test_passfail_bounds(self):
        assert M.get_passfail({"e_68_pct": 0.05}) == "pass"
        assert M.get_passfail({"e_68_pct": 0.5}) == "conditional"
        assert M.get_passfail({"e_68_pct": 1.5}) == "fail"
        assert M.get_passfail({"e_68_pct": 0.05}, {"e_68_pct": 1.5}) == "conditional"
        assert M.get_passfail({"e_68_pct": np.nan}) == "fail"

    def test_raster_metrics_end_to_end(self, ray_session):
        cells = np.arange(200, dtype=np.int64)
        truth = pd.DataFrame({"grid_cell": cells, "wmean_value": np.zeros(200)})
        proc = pd.DataFrame({
            "grid_cell": cells,
            "wmean_value": np.where(cells % 2 == 0, 0.05, -0.05),
            "wmean_uncert": np.full(200, 0.5),
        })
        res = M.raster_metrics(rd.from_pandas(proc), rd.from_pandas(truth))
        assert res["passfail"] == "pass"
        np.testing.assert_allclose(res["metrics"]["e_68_pct"], 0.05)
        np.testing.assert_allclose(res["norm_metrics"]["e_68_pct"], 0.1)
        # degrade errors -> fail
        proc2 = proc.assign(wmean_value=proc.wmean_value * 30)
        res2 = M.raster_metrics(rd.from_pandas(proc2), rd.from_pandas(truth))
        assert res2["passfail"] == "fail"


class TestFilters:
    def test_class_geoloc_filter(self):
        b = pa.table({
            "klass": pa.array([4, 2, 7, None, 5], type=pa.uint8()),
            "lat": pa.array([1.0, 2.0, None, 4.0, 5.0]),
            "lon": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
        })
        out = filters.class_geoloc_filter(b, (4, 7, 5))
        assert out.num_rows == 2  # rows 0 and 4 (row 2 has null lat)

    def test_summary_qual(self):
        b = pa.table({
            "class_qual": pa.array([0, 0x1, 0x10000, 0x1000000, None], type=pa.uint32()),
            "geo_qual": pa.array([0, 0, 0x2, 0, 0x20000], type=pa.uint32()),
        })
        out = filters.add_summary_qual(b)
        assert list(np.asarray(out["summary_qual"])) == [0, 1, 2, 3, 2]

    def test_validity_flag(self):
        b = pa.table({"ice": pa.array([0, 1, 2, 9], type=pa.uint8())})
        out = filters.validity_flag_filter(b, "ice", (0, 1, 2))
        col = out["ice"]
        assert col.null_count == 1 and col[3].as_py() is None

    def test_line_gather(self):
        b = pa.table({"line_index": pa.array([0, 2, 5, -1], type=pa.int64())})
        out = filters.line_gather(b, np.array([10.0, 11.0, 12.0]), "line_index", "lq")
        vals = out["lq"].to_pylist()
        assert vals[0] == 10.0 and vals[1] == 12.0
        assert vals[2] is None and vals[3] is None


class TestSceneOps:
    def test_union_and_metadata(self, ray_session):
        a = rd.from_pandas(pd.DataFrame({"url": ["a"], "ts": [10.0], "lat": [1.0], "lon": [2.0]}))
        b = rd.from_pandas(pd.DataFrame({"url": ["b"], "ts": [20.0], "lat": [-5.0], "lon": [7.0]}))
        u = scene.union_scenes([a, b])
        assert u.count() == 2
        meta = scene.merge_scene_metadata(u)
        assert meta["time_coverage_start"] == 10.0
        assert meta["time_coverage_end"] == 20.0
        assert meta["geospatial_lat_min"] == -5.0
        assert meta["num_rows"] == 2

    def test_dedup_dimension_composite(self, ray_session):
        df = pd.DataFrame({
            "time": [1.0, 1.0, 2.0, 2.0],
            "side": ["L", "L", "R", "L"],
            "v": [1, 2, 3, 4],
        })
        out = scene.dedup_dimension(rd.from_pandas(df), ["time", "side"]).to_pandas()
        assert len(out) == 3  # (1,L), (2,R), (2,L)

    def test_zip_join_coalesce(self, ray_session):
        a = rd.from_pandas(pd.DataFrame({
            "url": ["u1", "u2", "u3"], "h": [1.0, 2.0, 3.0]}))
        b = rd.from_pandas(pd.DataFrame({
            "url": ["u1", "u3"], "h": [9.0, np.nan]}))
        out = scene.zip_join(a, b, "url", coalesce_cols=["h"]).to_pandas() \
            .sort_values("url").reset_index(drop=True)
        assert list(out.h) == [9.0, 2.0, 3.0]  # u1 improved, u2/u3 original


class TestRelationalOps:
    def test_hash_join_vs_pandas(self, ray_session):
        rng = np.random.default_rng(1)
        l = pd.DataFrame({"k": rng.integers(0, 50, 300), "a": np.arange(300)})
        r = pd.DataFrame({"k": np.arange(0, 60, 2), "b": np.arange(30) * 10})
        got = hash_join(rd.from_pandas(l).repartition(3),
                        rd.from_pandas(r).repartition(2), "k").to_pandas()
        want = l.merge(r, on="k", how="inner")
        assert len(got) == len(want)
        assert got.sort_values(["k", "a"]).b.sum() == want.sort_values(["k", "a"]).b.sum()
        semi = hash_join(rd.from_pandas(l), rd.from_pandas(r), "k", "semi").to_pandas()
        anti = hash_join(rd.from_pandas(l), rd.from_pandas(r), "k", "anti").to_pandas()
        assert len(semi) + len(anti) == len(l)

    def test_subsample(self, ray_session):
        ds = rd.from_pandas(pd.DataFrame({"i": np.arange(100, dtype=np.int64)}))
        out = subsample_every_k(ds, 7, "i").to_pandas()
        np.testing.assert_array_equal(np.sort(out.i), np.arange(0, 100, 7))


class TestConfigRdf:
    def test_parse_and_route(self):
        text = """
        # raster config
        height_agg_method = 'simple'
        num_good_sus_pix_thresh = 3
        x_min = -10.0
        y_min = -10.0
        x_max = 10.0
        y_max = 10.0
        res = 0.5
        custom_knob = [1, 2, 3]
        name = bare_string
        """
        agg, grid, rest = config_rdf.load_configs(text)
        assert agg.height_agg_method == "simple"
        assert agg.num_good_sus_pix_thresh == 3
        assert grid.res == 0.5 and grid.size_x == 41
        assert rest["custom_knob"] == [1, 2, 3]
        assert rest["name"] == "bare_string"

    def test_bad_line(self):
        with pytest.raises(ValueError):
            config_rdf.parse_rdf("no equals sign here")


class TestSignal:
    def test_flatten_removes_known_phase(self):
        rng = np.random.default_rng(2)
        phase = rng.uniform(-np.pi, np.pi, 100)
        resid = rng.uniform(-0.01, 0.01, 100)
        re = np.cos(phase + resid)
        im = np.sin(phase + resid)
        rf, imf = signal.flatten_complex(re, im, phase)
        np.testing.assert_allclose(np.arctan2(imf, rf), resid, atol=1e-12)

    def test_coherence(self):
        c = signal.coherence(np.array([3.0]), np.array([4.0]),
                             np.array([25.0]), np.array([1.0]))
        np.testing.assert_allclose(c, [1.0])
        assert signal.coherence(np.array([1.0]), np.array([0.0]),
                                np.array([0.0]), np.array([1.0]))[0] == 0.0

    def test_geometric_phase_sign(self):
        # target nearer the 'minus' antenna -> r_minus < r_plus -> negative
        plus = (7000e3, 0.0, 0.0)
        minus = (7000e3, 10.0, 0.0)
        ph = signal.geometric_phase(plus, minus, np.array([0.0]), np.array([0.001]),
                                    np.array([0.0]))
        assert ph[0] < 0
        # and symmetric: swap antennas flips the sign
        ph2 = signal.geometric_phase(minus, plus, np.array([0.0]), np.array([0.001]),
                                     np.array([0.0]))
        assert ph2[0] > 0 and abs(ph2[0] + ph[0]) < 1e-9
