"""Snapshot diff (stages/snapshot.py): exact status classification,
null/'' equivalence, determinism across runs, and churn counts."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from raster_processor_ray.stages.snapshot import (
    snapshot_diff, snapshot_diff_counts)


def _mk(rows):
    return rd.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], type=pa.string()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


def test_statuses_exact(ray_session):
    old = _mk([("u1", "same"), ("u2", "old-text"), ("u3", "gone"),
               ("u4", None)])
    new = _mk([("u1", "same"), ("u2", "new-text"), ("u5", "fresh"),
               ("u4", "")])  # u4: None -> '' compares EQUAL (documented)
    got = (snapshot_diff(old, new, num_buckets=4)
           .to_pandas().sort_values("url").reset_index(drop=True))
    exp = pd.DataFrame({"url": ["u2", "u3", "u5"],
                        "status": ["changed", "removed", "added"]})
    pd.testing.assert_frame_equal(got, exp)


def test_include_unchanged_and_counts(ray_session):
    old = _mk([(f"u{i}", f"t{i}") for i in range(100)])
    new = _mk([(f"u{i}", f"t{i}" if i % 4 else f"t{i}x")
               for i in range(10, 110)])
    full = snapshot_diff(old, new, include_unchanged=True).to_pandas()
    assert len(full) == 110  # every key classified exactly once
    counts = (snapshot_diff_counts(old, new).to_pandas()
              .set_index("status")["n"].to_dict())
    # keys 10..99 shared (90): changed where i%4==0 (12,16,...,96 -> 22)
    assert counts == {"added": 10, "removed": 10, "changed": 22,
                      "unchanged": 68}


def test_deterministic_and_dup_keys(ray_session):
    # a duplicated key inside one snapshot keeps the (key, fp)-sorted
    # first deterministically
    old = _mk([("u1", "b"), ("u1", "a")])
    new = _mk([("u1", "a")])
    r1 = snapshot_diff(old, new).to_pandas()
    r2 = snapshot_diff(old, new).to_pandas()
    pd.testing.assert_frame_equal(r1, r2)
    assert len(r1) == 0  # keep-first is fp-sorted: 'a' vs 'a' -> unchanged
