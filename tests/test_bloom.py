"""Bloom broadcast semi-join (stages/bloom.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from raster_processor_ray.stages.bloom import (_fold_bits, _probe_bits,
                                               bloom_semi_join)


def test_bloom_bits_no_false_negatives_and_low_fp():
    rng = np.random.default_rng(41)
    keys = rng.choice(1 << 40, size=20_000, replace=False).astype(np.uint64)
    words = _fold_bits(keys, 1 << 20, 5)
    assert _probe_bits(words, keys, 1 << 20, 5).all()  # no false negatives
    others = (rng.choice(1 << 40, size=50_000).astype(np.uint64)
              + np.uint64(1 << 41))  # disjoint range
    fp = _probe_bits(words, others, 1 << 20, 5).mean()
    assert fp < 0.05, fp


def test_bloom_semi_join_exact():
    rng = np.random.default_rng(42)
    big = pd.DataFrame({
        "k": rng.integers(0, 10_000, size=100_000).astype(np.int64),
        "payload": np.arange(100_000, dtype=np.int64)})
    keys = pd.DataFrame({
        "key": rng.choice(10_000, size=500, replace=False).astype(np.int64)})
    out = bloom_semi_join(
        ray.data.from_pandas(big).repartition(8),
        ray.data.from_pandas(keys), "k", key_col="key",
        num_bits_log2=16).to_pandas()
    want = big[big.k.isin(set(keys.key))]
    assert len(out) == len(want)
    assert set(out["payload"]) == set(want["payload"])
    assert sorted(out.columns) == ["k", "payload"]


def test_bloom_tree_reduce_matches_direct():
    """Many input blocks force the tree-reduce path; the OR fold is
    associative so the filter must behave identically."""
    rng = np.random.default_rng(44)
    big = pd.DataFrame({
        "k": rng.integers(0, 2000, size=30_000).astype(np.int64)})
    keys = pd.DataFrame({"k": np.arange(200, dtype=np.int64)})
    out = bloom_semi_join(
        ray.data.from_pandas(big).repartition(4),
        ray.data.from_pandas(keys).repartition(40),  # 40 partial blooms
        "k", num_bits_log2=16).to_pandas()
    want = big[big.k < 200]
    assert len(out) == len(want)


def test_bloom_inexact_mode_superset():
    rng = np.random.default_rng(43)
    big = pd.DataFrame({"k": rng.integers(0, 5000, 20_000).astype(np.int64)})
    keys = pd.DataFrame({"k": np.arange(100, dtype=np.int64)})
    cand = bloom_semi_join(ray.data.from_pandas(big),
                           ray.data.from_pandas(keys), "k",
                           num_bits_log2=16, exact=False).to_pandas()
    want = big[big.k < 100]
    # candidates are a SUPERSET of the true matches (bloom never drops)
    assert len(cand) >= len(want)
    assert set(want.k).issubset(set(cand.k))
