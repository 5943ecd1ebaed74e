"""Empty-input hardening for the round-3 late operators: every new
family returns an empty (or well-defined) result instead of crashing
when the input has no rows."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raster_processor_ray.aggregate.focal import focal_mean, tile_pyramid
from raster_processor_ray.stages.expectations import (Rule,
                                                      validate_expectations)
from raster_processor_ray.stages.graph import (in_degree_hist, pagerank,
                                               triangle_stats)
from raster_processor_ray.stages.temporal import (cohort_retention,
                                                  funnel_counts,
                                                  interval_coverage)


def _empty(schema: dict):
    return rd.from_arrow(pa.table({k: pa.array([], type=t)
                                   for k, t in schema.items()}))


def test_graph_empty(ray_session):
    docs = _empty({"doc_id": pa.int64()})
    assert len(pagerank(docs, 0).to_pandas()) == 0
    hist = in_degree_hist(docs, 0)
    assert len(hist) == 0
    ts = triangle_stats(docs, 0)
    assert int(ts.n_triangles.iloc[0]) == 0
    assert int(ts.n_edges.iloc[0]) == 0


def test_temporal_empty(ray_session):
    ev = _empty({"user_id": pa.int64(), "ts": pa.timestamp("us"),
                 "value": pa.float64(), "event_type": pa.string()})
    assert len(interval_coverage(ev, "user_id", "ts", "value",
                                 num_buckets=2).to_pandas()) == 0
    fun = funnel_counts(ev, "user_id", "ts", "event_type",
                        ["a", "b"], num_buckets=2)
    assert fun.n_users.tolist() == [0, 0]
    assert len(cohort_retention(ev, "user_id", "ts",
                                num_buckets=2).to_pandas()) == 0


def test_focal_empty(ray_session):
    pts = _empty({"lat": pa.float64(), "lon": pa.float64(),
                  "v": pa.int64()})
    assert len(tile_pyramid(pts, "lat", "lon", "v",
                            levels=3).to_pandas()) == 0
    assert len(focal_mean(pts, "lat", "lon", "v").to_pandas()) == 0


def test_expectations_empty(ray_session):
    ds = _empty({"x": pa.float64(), "k": pa.int64()})
    out = validate_expectations(ds, [
        Rule("x_range", "x", "range", lo=0.0, hi=1.0),
        Rule("k_unique", "k", "unique"),
    ]).set_index("rule")
    assert (out["n_violations"] == 0).all()
    assert (out["n_checked"] == 0).all()


def test_keyed_asof_empty_sides(ray_session):
    from raster_processor_ray.stages.asof import keyed_asof_join
    schema = {"event_id": pa.int64(), "user_id": pa.int64(),
              "ts": pa.timestamp("us")}
    full = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([1_000_000, 2_000_000], pa.timestamp("us"))}))
    empty = _empty(schema)
    # empty right: every left row unmatched
    out = keyed_asof_join(full, empty, "user_id", "ts", tie_col="event_id",
                          payload_cols=[], num_buckets=2).to_pandas()
    assert len(out) == 2 and out["event_id_r"].isna().all()
    # empty left: no rows out
    out2 = keyed_asof_join(empty, full, "user_id", "ts", tie_col="event_id",
                           payload_cols=[], num_buckets=2).to_pandas()
    assert len(out2) == 0
