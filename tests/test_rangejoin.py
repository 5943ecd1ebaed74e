"""Range (interval) join: brute-force oracle parity + edge cases."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raster_processor_ray.stages.rangejoin import range_join


def _brute(p_ts, p_ids, i_s, i_e, i_ids):
    rows = []
    for t, pid in zip(p_ts, p_ids):
        for s, e, iid in zip(i_s, i_e, i_ids):
            if s <= t <= e:
                rows.append((pid, iid))
    return sorted(rows)


def _run(p_ts, p_ids, i_s, i_e, i_ids, **kw):
    points = rd.from_arrow(pa.table({
        "pid": pa.array(p_ids, pa.int64()),
        "_ts": pa.array(p_ts, pa.int64())}))
    ivs = rd.from_arrow(pa.table({
        "iid": pa.array(i_ids, pa.int64()),
        "_s": pa.array(i_s, pa.int64()),
        "_e": pa.array(i_e, pa.int64())}))
    out = range_join(points, ivs, ts_col="_ts", start_col="_s", end_col="_e",
                     point_cols=["pid"], interval_cols=["iid"], **kw).to_pandas()
    if out.empty:  # all-empty results carry no schema (see rangejoin.py)
        return []
    return sorted(zip(out["pid"].astype(np.int64), out["iid"].astype(np.int64)))


class TestRangeJoin:
    def test_random_vs_bruteforce(self, ray_session):
        rng = np.random.default_rng(7)
        p_ts = rng.integers(-1000, 1000, 400)
        p_ids = np.arange(400)
        i_s = rng.integers(-1100, 900, 60)
        i_e = i_s + rng.integers(0, 300, 60)  # overlapping, zero-length too
        i_ids = np.arange(60) + 1000
        got = _run(p_ts, p_ids, i_s, i_e, i_ids)
        assert got == _brute(p_ts, p_ids, i_s, i_e, i_ids)
        assert len(got) > 0

    def test_explicit_small_bucket_multi_span(self, ray_session):
        """Intervals spanning many buckets (replication > 2) stay exact."""
        rng = np.random.default_rng(11)
        p_ts = rng.integers(0, 5000, 300)
        p_ids = np.arange(300)
        i_s = rng.integers(0, 4500, 25)
        i_e = i_s + rng.integers(0, 2000, 25)
        i_ids = np.arange(25)
        got = _run(p_ts, p_ids, i_s, i_e, i_ids, bucket_us=100, num_shards=7)
        assert got == _brute(p_ts, p_ids, i_s, i_e, i_ids)

    def test_closed_endpoints(self, ray_session):
        got = _run([10, 20, 9, 21], [0, 1, 2, 3], [10], [20], [5])
        assert got == [(0, 5), (1, 5)]

    def test_negative_timestamps(self, ray_session):
        """floor-division bucketing is exact across zero."""
        got = _run([-5, -1, 0, 1], [0, 1, 2, 3], [-3], [0], [9],
                   bucket_us=2)
        assert got == [(1, 9), (2, 9)]

    def test_no_matches_and_empty_sides(self, ray_session):
        assert _run([1, 2], [0, 1], [100], [200], [7]) == []
        assert _run([1, 2], [0, 1], [], [], []) == []

    def test_chunked_expansion(self, ray_session, monkeypatch):
        """Force the pair-expansion chunking path; result unchanged."""
        import raster_processor_ray.stages.rangejoin as rj
        monkeypatch.setattr(rj, "_CHUNK_PAIRS", 17)
        rng = np.random.default_rng(3)
        p_ts = rng.integers(0, 200, 120)
        p_ids = np.arange(120)
        i_s = rng.integers(0, 180, 15)
        i_e = i_s + rng.integers(5, 80, 15)
        i_ids = np.arange(15)
        got = _run(p_ts, p_ids, i_s, i_e, i_ids, num_shards=3)
        assert got == _brute(p_ts, p_ids, i_s, i_e, i_ids)

    def test_payload_types_preserved(self, ray_session):
        """String + float payloads survive the null-padded union."""
        points = rd.from_arrow(pa.table({
            "pid": pa.array([1, 2], pa.int64()),
            "txt": pa.array(["a", "b"]),
            "_ts": pa.array([5, 15], pa.int64())}))
        ivs = rd.from_arrow(pa.table({
            "iid": pa.array([10], pa.int64()),
            "w": pa.array([0.5], pa.float64()),
            "_s": pa.array([0], pa.int64()),
            "_e": pa.array([10], pa.int64())}))
        out = range_join(points, ivs, ts_col="_ts", start_col="_s",
                         end_col="_e", point_cols=["pid", "txt"],
                         interval_cols=["iid", "w"]).to_pandas()
        assert len(out) == 1
        assert out.iloc[0]["txt"] == "a" and out.iloc[0]["w"] == 0.5
        assert out["pid"].dtype.kind == "i" and out["iid"].dtype.kind == "i"
