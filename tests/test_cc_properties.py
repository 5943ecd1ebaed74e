"""Hypothesis property tests for the star-contraction kernels
(stages/cc.py) — pure NumPy level, no Ray session needed.

Invariants from Kiveris et al. (SoCC'14):
- each large-star + small-star half-round PRESERVES the connected
  components of the graph (nodes may drop out once they become
  represented by their root, but surviving nodes keep their component);
- the local fixpoint labels every edge-touched node with its
  component's minimum id.
"""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from raster_processor_ray.stages.cc import (_local_cc, _prep_arrays,
                                            _star_kernel)


def _uf(edges):
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


edges_s = st.lists(
    st.tuples(st.integers(min_value=0, max_value=40),
              st.integers(min_value=0, max_value=40)),
    min_size=1, max_size=60)


def _apply_round(eu, ev):
    for large in (True, False):
        u, v = _prep_arrays(eu, ev, large)
        out = _star_kernel(pd.DataFrame({"u": u, "v": v}), large)
        eu = out["u"].to_numpy(dtype=np.int64, copy=False)
        ev = out["v"].to_numpy(dtype=np.int64, copy=False)
    return eu, ev


@settings(max_examples=200, deadline=None)
@given(edges_s)
def test_star_round_preserves_components(edges):
    eu = np.array([e[0] for e in edges], dtype=np.int64)
    ev = np.array([e[1] for e in edges], dtype=np.int64)
    before = _uf([(a, b) for a, b in edges if a != b])
    comp_before = {n: c for n, c in before.items()}
    eu2, ev2 = _apply_round(eu, ev)
    after = _uf(list(zip(eu2.tolist(), ev2.tolist())))
    # surviving nodes must map to the same component MINIMUM as before:
    # the component min never drops out, and contraction can only move
    # nodes closer to it
    for n, c in after.items():
        assert n in comp_before, n       # no new nodes appear
        assert c == comp_before[n], (n, c, comp_before[n])


@settings(max_examples=200, deadline=None)
@given(edges_s)
def test_local_fixpoint_labels_match_union_find(edges):
    eu = np.array([e[0] for e in edges], dtype=np.int64)
    ev = np.array([e[1] for e in edges], dtype=np.int64)
    su, sv = _local_cc(eu, ev, max_iters=60)
    want = _uf([(a, b) for a, b in edges if a != b])
    got = dict(zip(su.tolist(), sv.tolist()))
    # every child points at its true component minimum
    for n, c in got.items():
        assert c == want[n], (n, c, want[n])
    # and every non-root edge-touched node is present as a child
    roots = set(sv.tolist())
    touched = {n for a, b in edges if a != b for n in (a, b)}
    for n in touched:
        assert n in got or want[n] == n or n in roots
