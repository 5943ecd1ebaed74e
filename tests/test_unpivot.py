"""unpivot (aggregate/relational.py) vs pandas.melt — wide->long reshape."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from raster_processor_ray.aggregate.relational import unpivot


def _melt(df, ids, vals, name_col="metric", value_col="value"):
    out = df.melt(id_vars=ids, value_vars=vals,
                  var_name=name_col, value_name=value_col)
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def _canon(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_unpivot_vs_pandas_melt():
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], size=400),
        "m1": rng.integers(0, 100, size=400).astype(np.int64),
        "m2": rng.integers(0, 100, size=400).astype(np.int64),
        "m3": rng.integers(0, 100, size=400).astype(np.int64)})
    got = _canon(unpivot(ray.data.from_pandas(df).repartition(6),
                         "k", ["m1", "m2", "m3"]).to_pandas())
    want = _melt(df, ["k"], ["m1", "m2", "m3"])
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_unpivot_multi_id_and_cast():
    df = pd.DataFrame({
        "k1": ["x", "y"], "k2": np.array([1, 2], dtype=np.int64),
        "a": np.array([1, 2], dtype=np.int32),
        "b": np.array([3.5, 4.5], dtype=np.float64)})
    got = unpivot(ray.data.from_pandas(df), ["k1", "k2"], ["a", "b"],
                  name_col="m", value_col="v",
                  value_type=pa.float64()).to_pandas()
    assert got["v"].dtype == np.float64
    assert sorted(got["m"].unique()) == ["a", "b"]
    assert len(got) == 4
    want = df.astype({"a": np.float64}).melt(
        id_vars=["k1", "k2"], value_vars=["a", "b"],
        var_name="m", value_name="v")
    pd.testing.assert_frame_equal(
        _canon(got[want.columns.tolist()]), _canon(want))


def test_unpivot_null_ids_and_values():
    df = pd.DataFrame({
        "k": pd.array(["a", None, "b"], dtype="string"),
        "m1": pd.array([1, None, 3], dtype="Int64"),
        "m2": pd.array([None, 5, 6], dtype="Int64")})
    t = pa.table({"k": pa.array(["a", None, "b"]),
                  "m1": pa.array([1, None, 3], type=pa.int64()),
                  "m2": pa.array([None, 5, 6], type=pa.int64())})
    got = unpivot(ray.data.from_arrow(t), "k", ["m1", "m2"]).to_pandas()
    assert len(got) == 6
    # null ids and null values both survive the reshape
    assert got["k"].isna().sum() == 2
    assert got["value"].isna().sum() == 2


def test_unpivot_empty_input():
    t = pa.table({"k": pa.array([], type=pa.string()),
                  "m1": pa.array([], type=pa.int64()),
                  "m2": pa.array([], type=pa.int64())})
    got = unpivot(ray.data.from_arrow(t), "k", ["m1", "m2"]).to_pandas()
    # Ray drops empty blocks' schemas; the contract is "no crash, 0 rows"
    # (same convention as test_round3_empty_inputs.py)
    assert len(got) == 0
