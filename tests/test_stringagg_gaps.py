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
