"""Data-quality expectations (stages/expectations.py): every rule kind's
violation semantics on a hand-built frame with nulls and duplicates."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raster_processor_ray.stages.expectations import (
    Rule, validate_expectations)


@pytest.fixture()
def ds(ray_session):
    t = pa.table({
        "k": pa.array([1, 2, 2, 3, 3, 3, 4, None], type=pa.int64()),
        "x": pa.array([0.5, 1.0, 5.0, 10.0, None, -2.0, 3.0, 1.5]),
        "s": pa.array(["ok", "ok", "bad", None, "ok", "meh", "ok", "ok"]),
    })
    return rd.from_arrow(t)


def test_all_rule_kinds(ds):
    out = validate_expectations(ds, [
        Rule("k_not_null", "k", "not_null"),
        Rule("x_range", "x", "range", lo=0.0, hi=5.0),
        Rule("s_in_set", "s", "in_set", allowed=("ok", "meh")),
        Rule("s_regex", "s", "regex", pattern="^o"),
        Rule("k_unique", "k", "unique"),
    ]).set_index("rule")
    assert (out["n_checked"] == 8).all()
    assert out.loc["k_not_null", "n_violations"] == 1
    # x: 10.0 and -2.0 out of range; null skipped
    assert out.loc["x_range", "n_violations"] == 2
    # s: "bad" not allowed; null skipped
    assert out.loc["s_in_set", "n_violations"] == 1
    # s: rows not starting with 'o': "bad", "meh" (null skipped)
    assert out.loc["s_regex", "n_violations"] == 2
    # k: 2 appears twice, 3 thrice -> 5 rows in duplicated keys
    # (null key rows count toward n_checked via cnt sum? nulls group
    # separately; single null -> not duplicated)
    assert out.loc["k_unique", "n_violations"] == 5


def test_clean_table_zero_violations(ray_session):
    t = pa.table({"a": pa.array(np.arange(100, dtype=np.int64))})
    out = validate_expectations(rd.from_arrow(t), [
        Rule("a_unique", "a", "unique"),
        Rule("a_range", "a", "range", lo=0.0, hi=99.0),
    ])
    assert (out["n_violations"] == 0).all()
