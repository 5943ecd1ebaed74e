"""Replicates the driver's correctness gate: run every ``queries()`` entry
at sf0.01 and compare against its ``oracle_sql()`` via DuckDB —
row count + schema + order-insensitive values."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import sys
sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization: columns sorted by name, rows sorted."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


SQL_CHECKED = sorted(entrymod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entrymod.queries().keys()) - set(SQL_CHECKED))


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_parity(name, con, ray_session):
    ray_df = canon(to_df(entrymod.queries()[name](SF)))
    sql_df = canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns), \
        f"{name}: schema {list(ray_df.columns)} vs {list(sql_df.columns)}"
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} vs {len(sql_df)} rows"
    for c in ray_df.columns:
        a, b = ray_df[c], sql_df[c]
        if pd.api.types.is_float_dtype(a):
            np.testing.assert_allclose(a.to_numpy(), b.to_numpy(),
                                       rtol=0, atol=0, err_msg=f"{name}.{c}")
        else:
            pd.testing.assert_series_equal(a, b, check_names=False,
                                           obj=f"{name}.{c}")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(name, ray_session):
    df = to_df(entrymod.queries()[name](SF))
    assert len(df) > 0, name
    assert not df.columns.duplicated().any()


def test_entry_smoke(ray_session):
    res = entrymod.entry()
    df = to_df(res)
    assert len(df) >= 0
    assert "grid_cell" in df.columns
