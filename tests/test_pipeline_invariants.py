"""Pipeline-level invariants (FIXTURES.md F5.4/F5.5, BASELINE.md gate):
byte-identical text/html per url through every row-level stage; dedup
survivor set for duplicated urls."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from raster_processor_ray.sources.pages import make_pages_batch
from raster_processor_ray.stages.dedup import exact_dedup
from raster_processor_ray.stages.geotag import geotag_and_cell_encode
from raster_processor_ray.stages.knn import knn_join
from raster_processor_ray.stages.pip import PolygonSpec, pip_join

N = 5000


def _hashes(df: pd.DataFrame) -> dict:
    out = {}
    for u, t, h in zip(df.url, df.text, df.html):
        out[u] = (hashlib.sha256(t.encode()).hexdigest(),
                  hashlib.sha256(h or b"").hexdigest())
    return out


@pytest.fixture(scope="module")
def pages():
    return make_pages_batch(0, N)


@pytest.fixture(scope="module")
def golden(pages):
    return _hashes(pages.to_pandas())


class TestByteIdentity:
    def test_through_geotag_pip_knn(self, pages, golden, ray_session):
        """text AND html bytes unchanged per url after geotag -> PIP
        inner join -> kNN join (the full row-level stage chain)."""
        ds = rd.from_arrow(pages).repartition(4)
        ds = ds.map_batches(geotag_and_cell_encode, batch_format="pyarrow")
        polys = [PolygonSpec(1, "west", np.array(
            [[-180.0, -90.0], [0.0123, -90.0], [0.0123, 90.0], [-180.0, 90.0]])),
            PolygonSpec(2, "east", np.array(
            [[0.0123, -90.0], [180.0, -90.0], [180.0, 90.0], [0.0123, 90.0]]))]
        ds = pip_join(ds, polys, "inner")
        ds = knn_join(ds, np.array([1, 2]), np.array([10.0, -10.0]),
                      np.array([10.0, -10.0]), k=1)
        out = ds.to_pandas()
        # every url survived (the two boxes cover the globe) exactly once
        # per (polygon x knn_rank) combination
        assert set(out.url) == set(golden)
        after = _hashes(out.drop_duplicates("url"))
        assert after == {u: golden[u] for u in after}

    def test_shuffle_never_touches_text(self, pages, ray_session):
        """The rasterize path projects text away before the shuffle —
        by construction the aggregate output carries no payload columns."""
        from raster_processor_ray.pipelines.flagship import rasterize_pages

        cells = rasterize_pages(rd.from_arrow(pages).repartition(4))
        cols = set(cells.schema().names)
        assert "text" not in cols and "html" not in cols and "url" not in cols


class TestDedupGolden:
    def test_duplicated_urls_keep_first_by_ts(self, ray_session):
        """F5.5: duplicated-url input -> survivor = earliest warc_ts
        (tie-break url is vacuous per-key; asserted via golden set)."""
        base = make_pages_batch(0, 200, with_html=False).to_pandas()
        dup = base.copy()
        dup["warc_ts"] = dup.warc_ts + pd.Timedelta(seconds=1)
        dup["text"] = dup.text + " [dup]"
        both = pd.concat([dup, base])  # duplicates FIRST in input order
        ds = rd.from_pandas(both).repartition(4)
        out = exact_dedup(ds, "url", "warc_ts").to_pandas()
        assert len(out) == 200
        merged = out.merge(base, on="url", suffixes=("", "_orig"))
        # survivor is the original (earlier ts), never the "[dup]" copy
        assert (merged.text == merged.text_orig).all()


class TestFlagshipFullFused:
    """run_flagship_full's single-shuffle end-game: combine+finalize+BOTH
    resumable writes in one group task (shard == tile % num_shards)."""

    @pytest.fixture(scope="class")
    def full_out(self, tmp_path_factory, ray_session):
        import pyarrow.parquet as pq

        from raster_processor_ray.pipelines.flagship import run_flagship_full
        from raster_processor_ray.sources.pages import write_pages_parquet

        root = tmp_path_factory.mktemp("flagship_full")
        in_dir, out_dir = str(root / "pages"), str(root / "out")
        write_pages_parquet(in_dir, 20_000, rows_per_file=5_000,
                            with_html=False)
        tm, zm = run_flagship_full(in_dir, out_dir, num_out_shards=8,
                                   read_blocks=4)
        return in_dir, out_dir, tm, zm

    def test_row_conservation_vs_independent_oracle(self, full_out):
        import pyarrow.parquet as pq

        from raster_processor_ray.geo import cells as C
        from raster_processor_ray.pipelines.flagship import coverage_polygons
        from raster_processor_ray.sources.pages import pages_geotag
        from raster_processor_ray.stages.geotag import GLOBAL_GEO_GRID
        from raster_processor_ray.stages.pip import PolygonIndex
        from raster_processor_ray.state.lineage import read_resumable

        in_dir, out_dir, tm, zm = full_out
        tiles = read_resumable(f"{out_dir}/tiles").to_pandas()
        zonal = read_resumable(f"{out_dir}/dominant_site").to_pandas()
        lat, lon = pages_geotag(pq.read_table(in_dir, columns=["url"])["url"])
        _, _, ok = C.bin_to_grid(GLOBAL_GEO_GRID, lon, lat)
        expected = int((PolygonIndex(coverage_polygons())
                        .contains_any(lat, lon) & ok).sum())
        assert int(tiles.n_pix.sum()) == expected
        assert len(zonal) == len(tiles)
        assert tm.rows.sum() == len(tiles) and zm.rows.sum() == len(zonal)

    def test_shard_is_tile_mod_num_shards(self, full_out):
        import os

        import pyarrow.parquet as pq

        _, out_dir, _, _ = full_out
        for sd in os.listdir(f"{out_dir}/tiles"):
            if not sd.startswith("shard="):
                continue
            s = int(sd.split("=")[1])
            t = pq.read_table(f"{out_dir}/tiles/{sd}/data.parquet")
            assert (np.asarray(t["tile_id"]) % 8 == s).all()

    def test_resume_rewrites_only_missing_shard(self, full_out):
        import os
        import shutil
        import time

        from raster_processor_ray.pipelines.flagship import run_flagship_full
        from raster_processor_ray.state.lineage import read_resumable

        in_dir, out_dir, _, _ = full_out
        before = read_resumable(f"{out_dir}/tiles").to_pandas() \
            .sort_values(["tile_id", "iy", "ix"]).reset_index(drop=True)
        shards = sorted(d for d in os.listdir(f"{out_dir}/tiles")
                        if d.startswith("shard="))
        victim = shards[1]
        mt = {d: os.path.getmtime(f"{out_dir}/tiles/{d}")
              for d in shards if d != victim}
        shutil.rmtree(f"{out_dir}/tiles/{victim}")
        shutil.rmtree(f"{out_dir}/dominant_site/{victim}")
        time.sleep(1.1)
        run_flagship_full(in_dir, out_dir, num_out_shards=8, read_blocks=4)
        for d, m in mt.items():
            assert os.path.getmtime(f"{out_dir}/tiles/{d}") == m, d
        after = read_resumable(f"{out_dir}/tiles").to_pandas() \
            .sort_values(["tile_id", "iy", "ix"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(before, after)


class TestTreeFanIn:
    """The flagship end-game's streaming tree fan-in (_TreeFold): driver
    refs stay bounded regardless of leaf block count, and a deep fold
    (fanin=2 over many read blocks) produces byte-identical output to a
    fold-free run. Replaces the driver-resident B x S ref fan-out
    (reference analog: chunks-per-worker heuristic, raster_proc.py:713-716)."""

    def test_ref_bound_is_logarithmic(self):
        from raster_processor_ray.pipelines.flagship import _TreeFold

        class StubRemote:
            def __init__(self):
                self.calls = 0

            def remote(self, shard, *parts):
                self.calls += 1
                return f"fold{self.calls}"

        stub = StubRemote()
        tf = _TreeFold(stub, shard=0, fanin=4)
        for i in range(10_000):
            tf.push(f"leaf{i}")
        # fanin * ceil(log_fanin(B)) = 4 * 7 = 28 for B=10k
        assert tf.max_refs <= 4 * 7, tf.max_refs
        assert len(tf.drain()) <= 4 * 7
        # every group of 4 leaves folded exactly once per level
        assert stub.calls >= 10_000 // 4

    def test_deep_fold_equals_flat(self, tmp_path, ray_session):
        from raster_processor_ray.pipelines.flagship import run_flagship_full
        from raster_processor_ray.sources.pages import write_pages_parquet
        from raster_processor_ray.state.lineage import read_resumable

        in_dir = str(tmp_path / "pages")
        write_pages_parquet(in_dir, 8_000, rows_per_file=1_000,
                            with_html=False)
        frames = {}
        for tag, fanin in [("deep", 2), ("flat", 10_000)]:
            out = str(tmp_path / tag)
            run_flagship_full(in_dir, out, num_out_shards=4,
                              read_blocks=16, fold_fanin=fanin)
            frames[tag] = (
                read_resumable(f"{out}/tiles").to_pandas()
                .sort_values(["tile_id", "iy", "ix"]).reset_index(drop=True),
                read_resumable(f"{out}/dominant_site").to_pandas()
                .sort_values("grid_cell").reset_index(drop=True))
        pd.testing.assert_frame_equal(frames["deep"][0], frames["flat"][0])
        pd.testing.assert_frame_equal(frames["deep"][1], frames["flat"][1])
