"""Partition-order independence: oracle queries must produce identical
results when every input table arrives in a different block layout
(repartition(7)) — catches accidental dependence on block order or
count (the driver may read with any parallelism). A full 50-query
sweep under repartition(7) was run in round 4 (ALL EXACT); this pins a
representative subset across operator families."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# one per family: text, dedup, graph, temporal, focal, relational,
# window, sampling, spatial, quantile, join, string-agg
SUBSET = ["quality", "para_dedup", "pagerank", "cohort_retention",
          "focal_mean", "rollup_pricing", "lineitem_ranks", "group_split",
          "pip_zonal", "event_quartiles", "nation_balance_full",
          "nation_names",
          # round-5 additions: reshape, histogram, broadcast z-score
          "unpivot_metrics", "price_histogram", "value_outliers"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * "
              f"FROM read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.fixture(scope="module")
def repartitioned(ray_session):
    """Patch read_table so every input arrives as 7 blocks."""
    from raster_processor_ray.sources import tables as T
    import raster_processor_ray.pipelines.queries as Q

    orig = T.read_table

    def patched(sf_dir, name, columns=None, **kw):
        return orig(sf_dir, name, columns=columns, **kw).repartition(7)

    T.read_table = patched
    Q.read_table = patched
    yield
    T.read_table = orig
    Q.read_table = orig


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_exact_under_repartition(name, con, repartitioned):
    import __ray_entry__ as E

    res = E.queries()[name](SF)
    a = canon(res.to_pandas() if hasattr(res, "to_pandas") else res)
    b = canon(con.sql(E.oracle_sql()[name]).df())
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_float_dtype(x):
            assert np.array_equal(x.to_numpy(), y.to_numpy(),
                                  equal_nan=True), f"{name}.{c}"
        else:
            pd.testing.assert_series_equal(x, y, check_names=False,
                                           obj=f"{name}.{c}")
