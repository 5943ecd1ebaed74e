"""SemDeDup semantic dedup (stages/semdedup.py): exact survivor sets on
constructed clusters, keep-priority rule, blocked-scan equivalence, and
the _as_matrix sliced-ListArray regression."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from raster_processor_ray.stages.ann import _as_matrix
from raster_processor_ray.stages.semdedup import _prune_ordered, semdedup


def test_prune_ordered_exact():
    v = np.array([
        [1.0, 0.0],          # kept (first)
        [1.0, 0.0],          # dup of 0
        [0.0, 1.0],          # kept (orthogonal)
        [0.6, 0.8],          # cos to 0 = .6, to 2 = .8 -> kept at tau=.9
        [0.999, 0.0447],     # cos to 0 > .99 -> dup
    ])
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    keep = _prune_ordered(v, tau=0.9)
    assert keep.tolist() == [True, False, True, True, False]


def test_prune_blocked_matches_unblocked():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(500, 16))
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    a = _prune_ordered(x, tau=0.8, block=37)
    b = _prune_ordered(x, tau=0.8, block=10_000)
    assert (a == b).all()


def _cluster_corpus():
    """3 separated cluster directions; cluster 0 contains a near-dup
    pair and an exact-dup pair."""
    base = np.eye(3)
    rows, ids = [], []
    vid = 0

    def add(v):
        nonlocal vid
        rows.append(np.asarray(v, dtype=np.float64))
        ids.append(vid)
        vid += 1

    # cluster 0: two distinct + one near-dup of the first + exact dup
    add([1.0, 0.05, 0.0])         # id 0
    add([1.0, 0.06, 0.001])       # id 1: cos vs id0 ~ 0.9999 -> dup
    add([0.9, -0.4, 0.0])         # id 2: cos vs id0 ~ 0.87 -> kept at .95
    add([1.0, 0.05, 0.0])         # id 3: exact dup of id 0
    # cluster 1 / 2: singletons + one dup
    add(base[1]); add(base[1] * 2.0)     # ids 4,5: same direction -> dup
    add(base[2])                          # id 6
    return np.stack(rows), ids


def test_semdedup_survivors(ray_session):
    vecs, ids = _cluster_corpus()
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(list(vecs))})
    out = semdedup(rd.from_arrow(t), k=3, tau=0.95, iters=4)
    got = sorted(out.to_pandas().vec_id.tolist())
    # exactly one survivor among {0,1,3}; 2 survives; one of {4,5}; 6
    assert len(got) == 4
    assert 2 in got and 6 in got
    assert len(set(got) & {0, 1, 3}) == 1
    assert len(set(got) & {4, 5}) == 1
    # deterministic across runs
    got2 = sorted(semdedup(rd.from_arrow(t), k=3, tau=0.95,
                           iters=4).to_pandas().vec_id.tolist())
    assert got == got2


def test_as_matrix_sliced_listarray():
    a = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0], [7.0, 8.0]])
    m = _as_matrix(a.slice(1, 2))
    assert m.tolist() == [[3.0, 4.0], [5.0, 6.0]]
    ch = pa.chunked_array([a.slice(0, 1), a.slice(2, 2)])
    assert _as_matrix(ch).tolist() == [[1.0, 2.0], [5.0, 6.0], [7.0, 8.0]]
    assert _as_matrix(a.slice(0, 0)).shape == (0, 0)


def test_semdedup_empty_input(ray_session):
    empty = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32()))}))
    out = semdedup(empty, k=4, iters=2)
    assert out.count() == 0
    assert out.schema().names == ["vec_id", "cluster"]


def test_kmeans_empty_raises(ray_session):
    import pytest
    from raster_processor_ray.stages.kmeans import kmeans_fit
    empty = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32()))}))
    with pytest.raises(ValueError, match="no rows"):
        kmeans_fit(empty, 4)
