"""Connected components (stages/cc.py) vs an in-test union-find oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from raster_processor_ray.stages.cc import (attach_components,
                                            component_survivors,
                                            connected_components)


def _uf_components(edges):
    """Union-find oracle: {node: min id of its component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run_cc(edges, **kw):
    eu = np.array([e[0] for e in edges], dtype=np.int64)
    ev = np.array([e[1] for e in edges], dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"u": pa.array(eu), "v": pa.array(ev)}))
    out = connected_components(ds, **kw).to_pandas()
    return dict(zip(out["node"].astype(int), out["comp"].astype(int)))


def _check(edges, **kw):
    got = _run_cc(edges, **kw)
    want = _uf_components(edges)
    # drop self-loop-only nodes from the oracle (they carry no edge after
    # self-loop filtering; callers default isolated nodes to themselves)
    touched = {n for a, b in edges if a != b for n in (a, b)}
    want = {n: c for n, c in want.items() if n in touched}
    assert got == want


def test_single_edge():
    _check([(5, 2)])


def test_chain_long_distributed():
    # a 400-node path through the DISTRIBUTED rounds (threshold=0):
    # O(log^2 n) star rounds must close it, and the fixpoint check must
    # terminate well under max_iters
    _check([(i, i + 1) for i in range(400)], num_buckets=8,
           single_task_threshold=0)


def test_chain_local_tail():
    # same chain through the default local-tail path
    _check([(i, i + 1) for i in range(400)])


def test_mid_switch_to_local_tail():
    # threshold between the input size and the contracted size: the
    # first rounds run distributed, the remainder collapses locally
    _check([(i, i + 1) for i in range(200)], num_buckets=4,
           single_task_threshold=150)


def test_two_components_and_star():
    edges = [(10, 11), (11, 12), (3, 99), (99, 7), (50, 60)]
    _check(edges)


def test_duplicates_self_loops_both_directions():
    edges = [(1, 2), (2, 1), (2, 2), (1, 2), (2, 3), (7, 7)]
    got = _run_cc(edges)
    assert got == {1: 1, 2: 1, 3: 1}


def test_random_graphs_match_union_find():
    rng = np.random.default_rng(42)
    for trial in range(4):
        n = int(rng.integers(20, 300))
        m = int(rng.integers(n // 2, 2 * n))
        a = rng.integers(0, n, size=m)
        b = rng.integers(0, n, size=m)
        # alternate execution paths: distributed rounds / local tail
        thr = 0 if trial % 2 == 0 else 2_000_000
        _check(list(zip(a.tolist(), b.tolist())), num_buckets=8,
               single_task_threshold=thr)


def test_empty_edges():
    ds = ray.data.from_arrow(pa.table({
        "u": pa.array([], type=pa.int64()),
        "v": pa.array([], type=pa.int64())}))
    out = connected_components(ds).to_pandas()
    assert len(out) == 0


def test_attach_and_survivors():
    edges = [(1, 4), (4, 9), (2, 7)]
    eu = pa.array(np.array([e[0] for e in edges], dtype=np.int64))
    ev = pa.array(np.array([e[1] for e in edges], dtype=np.int64))
    labels = connected_components(
        ray.data.from_arrow(pa.table({"u": eu, "v": ev})))
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "text": [f"t{i}" for i in range(10)]}))
    lab = attach_components(docs, labels, id_col="doc_id").to_pandas()
    lab = dict(zip(lab["doc_id"].astype(int), lab["comp"].astype(int)))
    assert lab[1] == lab[4] == lab[9] == 1
    assert lab[2] == lab[7] == 2
    assert lab[0] == 0 and lab[3] == 3 and lab[5] == 5  # isolated: self
    surv = component_survivors(docs, labels, id_col="doc_id").to_pandas()
    assert sorted(surv["doc_id"].astype(int)) == [0, 1, 2, 3, 5, 6, 8]


def test_distributed_rounds_converge_on_large_random_graph():
    """Scale-shape evidence: 200k edges over 60k nodes forced through
    the DISTRIBUTED star rounds (threshold far below the input) must
    converge within max_iters and match union-find. Star contraction
    strictly shrinks toward one (child, root) edge per non-root node,
    so the fixpoint hashsum check terminates in O(log^2 n) rounds."""
    rng = np.random.default_rng(99)
    n_nodes, n_edges = 60_000, 200_000
    a = rng.integers(0, n_nodes, size=n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, size=n_edges).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"u": pa.array(a), "v": pa.array(b)}))
    out = connected_components(ds.repartition(8), num_buckets=16,
                               single_task_threshold=50_000).to_pandas()
    got = dict(zip(out["node"].astype(int), out["comp"].astype(int)))
    edges = list(zip(a.tolist(), b.tolist()))
    want = _uf_components(edges)
    touched = set()
    for x, y in edges:
        if x != y:
            touched.add(x)
            touched.add(y)
    want = {k: v for k, v in want.items() if k in touched}
    assert got == want


def test_renamed_columns():
    ds = ray.data.from_pandas(pd.DataFrame({
        "a": np.array([1, 2], dtype=np.int64),
        "b": np.array([2, 3], dtype=np.int64)}))
    out = connected_components(ds, u_col="a", v_col="b").to_pandas()
    got = dict(zip(out["node"].astype(int), out["comp"].astype(int)))
    assert got == {1: 1, 2: 1, 3: 1}
