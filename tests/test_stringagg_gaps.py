"""string_agg (relational.py) and sequence_gaps (stages/sequence.py):
reference semantics, partition invariance, guards."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raster_processor_ray.aggregate.relational import string_agg
from raster_processor_ray.stages.sequence import sequence_gaps


def _ds(df, blocks=4):
    return rd.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(blocks)


def test_string_agg_matches_pandas(ray_session):
    rng = np.random.default_rng(2)
    df = pd.DataFrame({
        "k": rng.integers(0, 9, 300),
        "v": [f"w{i:03d}" for i in range(300)],
        "o": rng.permutation(300),
    })
    out = string_agg(_ds(df), "k", "v", sep="|", order_by="o",
                     out="joined").to_pandas()
    ref = (df.sort_values(["k", "o"]).groupby("k")["v"]
           .agg("|".join).rename("joined").reset_index())
    pd.testing.assert_frame_equal(
        out.sort_values("k", ignore_index=True), ref)
    # partition invariance
    out2 = string_agg(_ds(df, blocks=11), "k", "v", sep="|", order_by="o",
                      out="joined", num_buckets=5).to_pandas()
    pd.testing.assert_frame_equal(
        out2.sort_values("k", ignore_index=True), ref)


def test_sequence_gaps_planted(ray_session):
    # present: 10..99 minus {20..24, 50, 77, 78}
    missing = set(range(20, 25)) | {50, 77, 78}
    present = [v for v in range(10, 100) if v not in missing]
    ds = _ds(pd.DataFrame({"x": np.array(present, dtype=np.int64)}))
    gaps = sequence_gaps(ds, "x")
    got = list(zip(gaps.gap_start, gaps.gap_end))
    assert got == [(20, 24), (50, 50), (77, 78)]


def test_sequence_gaps_no_gaps_and_empty(ray_session):
    ds = _ds(pd.DataFrame({"x": np.arange(50, dtype=np.int64)}))
    assert len(sequence_gaps(ds, "x")) == 0
    empty = rd.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    assert len(sequence_gaps(empty, "x")) == 0


def test_sequence_gaps_guard(ray_session):
    # every other value missing -> 49 gaps; guard below that must raise
    ds = _ds(pd.DataFrame({"x": np.arange(0, 100, 2, dtype=np.int64)}))
    with pytest.raises(ValueError, match="max_gaps"):
        sequence_gaps(ds, "x", max_gaps=10)


def test_string_agg_skips_nulls_like_sql(ray_session):
    """SQL string_agg skips NULL values; a group whose values are ALL
    null aggregates to NULL (not the literal 'None' or '')."""
    df = pd.DataFrame({
        "g": [1, 1, 1, 2, 2, 3],
        "o": [1, 2, 3, 1, 2, 1],
        "v": ["a", None, "c", None, None, "z"],
    })
    out = string_agg(_ds(df), "g", "v", sep=",", order_by="o",
                     out="agg").to_pandas().set_index("g")["agg"]
    assert out[1] == "a,c"
    assert out[2] is None or pd.isna(out[2])
    assert out[3] == "z"

    import duckdb
    sql = duckdb.sql(
        "SELECT g, string_agg(v, ',' ORDER BY o) AS agg FROM df GROUP BY g"
    ).df().set_index("g")["agg"]
    for g in (1, 2, 3):
        assert (pd.isna(out[g]) and pd.isna(sql[g])) or out[g] == sql[g]


def test_sequence_gaps_tolerates_duplicates(ray_session):
    """Duplicate values used to mis-pair run boundaries ([1,1,3] ->
    gaps (2,0),(2,2)); the stream is now deduped first."""
    df = pd.DataFrame({"v": [1, 1, 3]})
    out = sequence_gaps(_ds(df, blocks=2), "v")
    assert out.values.tolist() == [[2, 2]]
    # heavier: every value duplicated 3x, same answer as distinct
    vals = np.array([v for v in range(100) if v % 7 != 0], dtype=np.int64)
    dup = pd.DataFrame({"v": np.repeat(vals, 3)})
    ref = sequence_gaps(_ds(pd.DataFrame({"v": vals})), "v")
    got = sequence_gaps(_ds(dup), "v")
    pd.testing.assert_frame_equal(got, ref)
