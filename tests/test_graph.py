"""Link-graph analytics (stages/graph.py): edge-synthesis determinism,
PageRank vs a dense NumPy reference, triangle counts vs brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raster_processor_ray.stages.graph import (
    _emit_edges, in_degree_hist, pagerank, synth_edges, triangle_stats)

N = 120


@pytest.fixture()
def docs(ray_session):
    return rd.from_arrow(pa.table({"doc_id": np.arange(N, dtype=np.int64)}))


def _dense_edges():
    src, dst, w = _emit_edges(np.arange(N, dtype=np.int64), N)
    return src, dst, w


def test_emit_edges_deterministic_and_weighted():
    s1, d1, w1 = _dense_edges()
    s2, d2, w2 = _dense_edges()
    assert np.array_equal(s1, s2) and np.array_equal(d1, d2)
    assert np.array_equal(w1, w2)
    assert (d1 != s1).all()  # no self-loops
    # weights per src sum to exactly 1 (od * (1/od) with od <= 7)
    sums = pd.DataFrame({"s": s1, "w": w1}).groupby("s")["w"].sum()
    np.testing.assert_allclose(sums.to_numpy(), 1.0, rtol=0, atol=1e-12)
    # batch-split invariance: emitting in two halves gives the same edges
    sa, da, wa = _emit_edges(np.arange(N // 2, dtype=np.int64), N)
    sb, db, wb = _emit_edges(np.arange(N // 2, N, dtype=np.int64), N)
    assert np.array_equal(np.concatenate([sa, sb]), s1)
    assert np.array_equal(np.concatenate([da, db]), d1)


def test_pagerank_matches_dense_reference(docs):
    src, dst, w = _dense_edges()
    pr_ref = np.full(N, 1.0 / N)
    for _ in range(5):
        nxt = np.zeros(N)
        np.add.at(nxt, dst, pr_ref[src] * w)
        pr_ref = 0.15 / N + 0.85 * nxt
    out = pagerank(docs, N, iters=5, damping=0.85,
                   round_decimals=None).to_pandas()
    out = out.sort_values("node", ignore_index=True)
    assert len(out) == N
    np.testing.assert_allclose(out["pr"].to_numpy(), pr_ref,
                               rtol=1e-12, atol=0)
    # total mass <= 1 (teleport conserves; dangling nodes would leak)
    assert out["pr"].sum() <= 1.0 + 1e-9


def test_triangle_stats_matches_bruteforce(docs):
    src, dst, _ = _dense_edges()
    a = np.minimum(src, dst)
    b = np.maximum(src, dst)
    und = set(zip(a.tolist(), b.tolist()))
    adj = np.zeros((N, N), dtype=bool)
    for x, y in und:
        adj[x, y] = adj[y, x] = True
    adj_i = adj.astype(np.int64)
    tri = int(np.einsum("ij,jk,ki->", adj_i, adj_i, adj_i)) // 6
    wedges = sum(1 for (x, y) in und for (x2, y2) in und
                 if x2 == x and y < y2)
    out = triangle_stats(docs, N)
    assert int(out["n_edges"].iloc[0]) == len(und)
    assert int(out["n_wedges"].iloc[0]) == wedges
    assert int(out["n_triangles"].iloc[0]) == tri


def test_in_degree_hist_covers_all_nodes(docs):
    hist = in_degree_hist(docs, N)
    assert int(hist["n_nodes"].sum()) == N
    src, dst, _ = _dense_edges()
    counts = np.bincount(dst, minlength=N)
    ref = pd.Series(counts).value_counts().sort_index()
    got = hist.set_index("in_deg")["n_nodes"]
    assert got.to_dict() == {int(k): int(v) for k, v in ref.items()}


def test_synth_edges_dataset_matches_kernel(docs):
    df = synth_edges(docs, N).to_pandas().sort_values(
        ["src", "dst"], ignore_index=True)
    src, dst, _ = _dense_edges()
    ref = pd.DataFrame({"src": src, "dst": dst}).sort_values(
        ["src", "dst"], ignore_index=True)
    pd.testing.assert_frame_equal(df, ref)


def test_personalized_pagerank_mass_on_seeds(docs):
    # all teleport mass on nodes 0 and 60 -> dense numpy reference
    def tw(ids):
        return ((ids == 0) | (ids == 60)).astype(np.float64)

    src, dst, w = _dense_edges()
    tp = tw(np.arange(N, dtype=np.int64))
    tp = tp / tp.sum()
    pr_ref = tp.copy()
    for _ in range(5):
        nxt = np.zeros(N)
        np.add.at(nxt, dst, pr_ref[src] * w)
        pr_ref = 0.15 * tp + 0.85 * nxt
    out = pagerank(docs, N, iters=5, damping=0.85, round_decimals=None,
                   teleport_weights=tw).to_pandas().sort_values(
        "node", ignore_index=True)
    np.testing.assert_allclose(out["pr"].to_numpy(), pr_ref,
                               rtol=1e-12, atol=1e-18)
    # seeds dominate: both seeds in the top ranks
    top = out.sort_values("pr", ascending=False).head(5).node.tolist()
    assert 0 in top and 60 in top


def test_personalized_all_zero_weights_raises(docs):
    with pytest.raises(ValueError, match="zero"):
        pagerank(docs, N, teleport_weights=lambda i: np.zeros(len(i)))
