"""value_outliers (pipelines/queries.py) edge semantics: zero-variance
and single-row event types must be excluded by BOTH engines (numpy's
inf/nan vs DuckDB's NULL-on-division-by-zero)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raster_processor_ray.pipelines.queries import (SQL_VALUE_OUTLIERS,
                                                    q_value_outliers)


@pytest.fixture()
def edge_sf(tmp_path):
    rng = np.random.default_rng(42)
    n = 400
    normal = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "event_type": "normal",
        "value": np.concatenate([rng.normal(50.0, 5.0, n - 2),
                                 [500.0, -400.0]])})  # two clear outliers
    const = pd.DataFrame({
        "event_id": np.arange(n, n + 50, dtype=np.int64),
        "event_type": "constant", "value": 7.25})      # zero variance
    single = pd.DataFrame({
        "event_id": np.array([n + 50], dtype=np.int64),
        "event_type": "lonely", "value": [123.0]})      # n = 1
    df = pd.concat([normal, const, single], ignore_index=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


def test_value_outliers_edge_types_match_oracle(edge_sf, ray_session):
    got = q_value_outliers(edge_sf).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{edge_sf}/events.parquet')")
    want = con.sql(SQL_VALUE_OUTLIERS).df()

    # constant / lonely types contribute no rows in either engine
    assert not (got["event_type"].isin(["constant", "lonely"])).any()
    assert not (want["event_type"].isin(["constant", "lonely"])).any()

    key = ["event_id"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert len(g) == len(w) > 0
    assert (g["event_id"].to_numpy() == w["event_id"].to_numpy()).all()
    np.testing.assert_allclose(g["z"].to_numpy(), w["z"].to_numpy(),
                               rtol=0, atol=0)
