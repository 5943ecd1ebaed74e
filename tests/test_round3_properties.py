"""Property tests (hypothesis) for the round-3 pure kernels: edge
synthesis split-invariance, Douglas-Peucker's epsilon guarantee, week
truncation, PQ encode determinism."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from raster_processor_ray.stages.graph import _emit_edges
from raster_processor_ray.stages.trajectory import _dp_keep_mask
from raster_processor_ray.stages.temporal import week_start_us


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=2, max_value=400),
       st.integers(min_value=1, max_value=399))
def test_emit_edges_split_invariant(n, cut):
    cut = min(cut, n - 1)
    ids = np.arange(n, dtype=np.int64)
    s, d, w = _emit_edges(ids, n)
    sa, da, wa = _emit_edges(ids[:cut], n)
    sb, db, wb = _emit_edges(ids[cut:], n)
    assert np.array_equal(np.concatenate([sa, sb]), s)
    assert np.array_equal(np.concatenate([da, db]), d)
    assert np.array_equal(np.concatenate([wa, wb]), w)
    assert ((d >= 0) & (d < n)).all()
    if len(s):
        sums = pd.DataFrame({"s": s, "w": w}).groupby("s")["w"].sum()
        np.testing.assert_allclose(sums.to_numpy(), 1.0, rtol=0, atol=1e-12)


def _line_dist(px, py, ax, ay, bx, by):
    # perpendicular distance to the infinite line — the metric the DP
    # kernel itself splits on (classic Douglas-Peucker; the clamped
    # segment-distance variant is a different published algorithm)
    dx, dy = bx - ax, by - ay
    seg = np.hypot(dx, dy)
    if seg == 0.0:
        return np.hypot(px - ax, py - ay)
    return abs(dx * (py - ay) - dy * (px - ax)) / seg


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=2, max_value=60),
       st.floats(min_value=0.01, max_value=10.0, allow_nan=False),
       st.integers(min_value=0, max_value=2**31 - 1))
def test_dp_epsilon_guarantee(n, eps, seed):
    rng = np.random.default_rng(seed)
    x = np.cumsum(rng.normal(0, 1, n))
    y = np.cumsum(rng.normal(0, 1, n))
    keep = _dp_keep_mask(x, y, eps)
    assert keep[0] and keep[-1]
    kept = np.flatnonzero(keep)
    # every dropped point lies within eps (line distance) of the kept
    # segment that covers it
    for i in np.flatnonzero(~keep):
        j = np.searchsorted(kept, i)
        a, b = kept[j - 1], kept[j]
        assert _line_dist(x[i], y[i], x[a], y[a], x[b], y[b]) <= eps + 1e-9
    # determinism
    assert np.array_equal(keep, _dp_keep_mask(x, y, eps))


@settings(max_examples=150, deadline=None)
@given(st.integers(min_value=0, max_value=4_000_000_000))
def test_week_start_is_monday_and_covers(sec):
    ts = pd.Series(pd.to_datetime([sec], unit="s"))
    ws = int(week_start_us(ts)[0])
    t_us = sec * 1_000_000
    assert ws <= t_us < ws + 7 * 86400 * 1_000_000
    # Monday: days since epoch ≡ 4 (mod 7) is Thursday=3 offset; check
    # via pandas weekday
    assert pd.Timestamp(ws, unit="us").weekday() == 0


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_pq_encode_deterministic_and_self_distance(seed):
    from raster_processor_ray.stages.pq import PqEncode, pq_train

    import pyarrow as pa
    import ray.data as rd  # noqa: F401  (pq_train takes a Dataset; use a stub)

    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (64, 8))

    class _FakeDs:
        def limit(self, n):
            return self

        def to_pandas(self):
            return pd.DataFrame({"embedding": list(x)})

    books = pq_train(_FakeDs(), m=2, ks=8)
    t = pa.table({"vec_id": np.arange(64, dtype=np.int64),
                  "embedding": pa.array(list(x))})
    enc1 = PqEncode(books)(t)
    enc2 = PqEncode(books)(t)
    assert enc1.equals(enc2)
    codes = np.frombuffer(b"".join(enc1["pq_code"].to_pylist()),
                          dtype=np.uint8).reshape(64, 2)
    # each code is the argmin cell -> reconstruction distance is the
    # minimum over the codebook (no better cell exists)
    for j in range(2):
        sub = x[:, j * 4:(j + 1) * 4]
        d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        chosen = d2[np.arange(64), codes[:, j]]
        assert np.allclose(chosen, d2.min(axis=1))
