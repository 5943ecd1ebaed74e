"""DSIR importance resampling (stages/dsir.py): numpy-oracle score
parity, selection bias toward the target distribution, partition
invariance, and Gumbel-key determinism."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from raster_processor_ray.stages.dsir import (
    _doc_gram_buckets, _gumbel_from_ids, dsir_scores, dsir_select,
    log_ratio, ngram_bucket_counts)


def _corpus():
    """Two styles: 'food' docs (target-like) and 'tech' docs."""
    food = ["fresh bread and warm soup", "soup with bread and salt",
            "warm salt bread", "fresh soup and salt"]
    tech = ["kernel threads and sockets", "socket buffer kernel panic",
            "threads panic in the kernel", "buffer sockets and threads"]
    texts = food + tech
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts)})


def _np_counts(texts, m, ngrams):
    t = pa.table({"text": pa.array(texts)})
    buckets, _ = _doc_gram_buckets(t["text"].combine_chunks(), ngrams, m - 1)
    return np.bincount(buckets, minlength=m).astype(np.int64)


def test_counts_match_numpy(ray_session):
    t = _corpus()
    ds = rd.from_arrow(t).repartition(3)
    got = ngram_bucket_counts(ds, num_buckets_log2=10)
    want = _np_counts(t["text"].to_pylist(), 1 << 10, (1, 2))
    assert (got == want).all()
    # tree path: force fanin 1 < parts
    got2 = ngram_bucket_counts(ds, num_buckets_log2=10, tree_fanin=2)
    assert (got2 == want).all()


def test_scores_match_numpy(ray_session):
    t = _corpus()
    texts = t["text"].to_pylist()
    m = 1 << 10
    tgt = _np_counts(texts[:4], m, (1, 2))     # food as target
    raw = _np_counts(texts, m, (1, 2))
    lr = log_ratio(tgt, raw)
    scored = dsir_scores(rd.from_arrow(t).repartition(4), lr,
                         seed=7).to_pandas().sort_values("doc_id")
    # numpy reference
    buckets, doc_idx = _doc_gram_buckets(t["text"].combine_chunks(),
                                         (1, 2), m - 1)
    sums = np.zeros(len(texts)); np.add.at(sums, doc_idx, lr[buckets])
    cnt = np.bincount(doc_idx, minlength=len(texts))
    want_logw = sums / cnt
    assert np.allclose(scored.logw.to_numpy(), want_logw)
    want_gkey = want_logw + _gumbel_from_ids(
        np.arange(len(texts), dtype=np.int64), 7)
    assert np.allclose(scored.gkey.to_numpy(), want_gkey)
    # food docs must outweigh tech docs under a food target
    assert scored.logw.to_numpy()[:4].min() > scored.logw.to_numpy()[4:].max()


def test_select_prefers_target_and_is_partition_invariant(ray_session):
    t = _corpus()
    target = rd.from_arrow(t.slice(0, 4))  # food
    # near-zero temperature -> Gumbel noise negligible vs logw gap
    sel = dsir_select(rd.from_arrow(t).repartition(2), target, 4,
                      temperature=1e-6, seed=3).to_pandas()
    assert sorted(sel.doc_id.tolist()) == [0, 1, 2, 3]
    sel2 = dsir_select(rd.from_arrow(t).repartition(7), target, 4,
                       temperature=1e-6, seed=3).to_pandas()
    assert sorted(sel2.doc_id.tolist()) == [0, 1, 2, 3]
    # k = n returns everything
    all_sel = dsir_select(rd.from_arrow(t), target, 8).to_pandas()
    assert sorted(all_sel.doc_id.tolist()) == list(range(8))


def test_gumbel_deterministic_and_seed_sensitive():
    ids = np.arange(100, dtype=np.int64)
    a = _gumbel_from_ids(ids, 1)
    b = _gumbel_from_ids(ids, 1)
    c = _gumbel_from_ids(ids, 2)
    assert (a == b).all()
    assert (a != c).any()
    assert np.isfinite(a).all()


def test_group_split_leakage_safe(ray_session):
    """All rows of a group share a split; proportions near 80/15/5."""
    import pandas as pd
    from raster_processor_ray.stages.mixture import group_split

    n = 5000
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "g": pa.array([f"dom{i % 997}.com" for i in range(n)])})
    out = group_split(rd.from_arrow(t).repartition(6), "g").to_pandas()
    per_group = out.groupby("g").split.nunique()
    assert (per_group == 1).all(), "group straddles splits"
    frac = out.split.value_counts(normalize=True)
    assert 0.70 < frac["train"] < 0.90
    assert 0.08 < frac["val"] < 0.22
    # deterministic across partitionings
    out2 = group_split(rd.from_arrow(t).repartition(13), "g").to_pandas()
    m = out.merge(out2, on="doc_id", suffixes=("", "_b"))
    assert (m.split == m.split_b).all()
