"""Persisted MinHash band index (stages/dedup.py): probe candidates match
the batch LSH pairs across the corpus/new split; shard pruning is lossless;
parameter mismatches fail loudly."""

import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raster_processor_ray.stages.dedup import (
    minhash_index_build, minhash_index_probe, minhash_lsh_candidates)

P = dict(num_perm=64, shingle_k=5, num_bands=16)


def _mk_docs():
    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa"]
    texts, ids = [], []
    for i in range(60):
        base = " ".join(rng.choice(words, 30))
        texts.append(base)
        ids.append(i)
    # near-dups: docs 100+i are docs i with one word changed
    for i in range(10):
        t = texts[i].split()
        t[5] = "OMEGA"
        texts.append(" ".join(t))
        ids.append(100 + i)
    return pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64),
                         "text": texts})


@pytest.fixture()
def docs(ray_session):
    df = _mk_docs()
    return df, rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def _split(ds, new: bool):
    def f(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        m = (ids >= 100) if new else (ids < 100)
        return b.filter(pa.array(m))
    return ds.map_batches(f, batch_format="pyarrow")


def test_probe_matches_batch_lsh(docs, tmp_path):
    df, ds = docs
    idx = str(tmp_path / "idx")
    minhash_index_build(_split(ds, False), idx, num_shards=8, **P)
    got = minhash_index_probe(_split(ds, True), idx).to_pandas()
    got_pairs = set(zip(got.new_id, got.old_id))
    # reference: full batch LSH over everything, restricted to cross pairs
    allp = minhash_lsh_candidates(ds, num_buckets=8, **P).to_pandas()
    ref = set()
    for a, b in zip(allp.id_a, allp.id_b):
        if (a >= 100) != (b >= 100):
            new, old = (a, b) if a >= 100 else (b, a)
            ref.add((new, old))
    assert got_pairs == ref
    assert len(got_pairs) >= 10  # every planted near-dup is found
    assert (got.n_bands >= 1).all()


def test_single_shard_index_equivalent(docs, tmp_path):
    _, ds = docs
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    minhash_index_build(_split(ds, False), a, num_shards=1, **P)
    minhash_index_build(_split(ds, False), b, num_shards=8, **P)
    ra = minhash_index_probe(_split(ds, True), a).to_pandas()
    rb = minhash_index_probe(_split(ds, True), b).to_pandas()
    key = ["new_id", "old_id"]
    pd.testing.assert_frame_equal(
        ra.sort_values(key, ignore_index=True),
        rb.sort_values(key, ignore_index=True))


def test_probe_rejects_mismatched_id_col(docs, tmp_path):
    _, ds = docs
    idx = str(tmp_path / "idx")
    minhash_index_build(_split(ds, False), idx, num_shards=4, **P)
    with pytest.raises(ValueError, match="id_col"):
        minhash_index_probe(_split(ds, True), idx, id_col="other")
