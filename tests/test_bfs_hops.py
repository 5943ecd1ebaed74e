"""bfs_hops (stages/graph.py) vs a direct in-memory BFS over the same
arithmetic edge set."""

import numpy as np
import pandas as pd
import ray

from raster_processor_ray.stages.graph import _emit_edges, bfs_hops


def _direct_bfs(n, seed_ids, max_hops):
    src, dst, _ = _emit_edges(np.arange(n, dtype=np.int64), n)
    adj = {}
    for s, d in zip(src, dst):
        adj.setdefault(int(s), set()).add(int(d))
    dist = {int(s): 0 for s in seed_ids}
    frontier = set(dist)
    for h in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h
                    nxt.add(v)
        frontier = nxt
    return pd.DataFrame(sorted(dist.items()), columns=["doc_id", "hops"])


def test_bfs_hops_vs_direct():
    n = 300
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
    ).repartition(4)

    def seeds(ids):
        return ids % 37 == 0

    got = (bfs_hops(docs, n, seeds, max_hops=3, num_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _direct_bfs(n, np.flatnonzero(np.arange(n) % 37 == 0), 3)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # seeds are hop 0; every reached node has a minimal hop count
    assert (got.loc[got.doc_id % 37 == 0, "hops"] == 0).all()


def test_bfs_hops_zero_hops_is_seed_set():
    n = 100
    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)}))
    got = bfs_hops(docs, n, lambda ids: ids < 5, max_hops=0).to_pandas()
    assert sorted(got["doc_id"].tolist()) == [0, 1, 2, 3, 4]
    assert (got["hops"] == 0).all()
