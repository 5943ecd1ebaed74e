"""Skew + key-cardinality stress evidence (north-rule items: skewed hot
cells handled explicitly; no per-key task explosion at high key counts).

Sizes are chosen to finish in seconds IF the engine's shapes hold:
- sessionize over 50k distinct keys must run O(buckets) pandas calls,
  not O(keys) (a per-key map_groups at 50k keys takes minutes);
- hash_aggregate / rasterize under 90%-one-key skew must stay exact —
  map-side partials bound the hot key's shuffle rows by #blocks, so no
  reducer sees the raw row stream.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from raster_processor_ray.aggregate.relational import hash_aggregate
from raster_processor_ray.stages.sessionize import sessionize


def test_sessionize_many_keys_bucket_bounded():
    n, keys = 100_000, 50_000
    rng = np.random.default_rng(3)
    user = rng.integers(0, keys, size=n).astype(np.int64)
    ts = rng.integers(0, 10_000_000, size=n).astype(np.int64)
    df = pd.DataFrame({"user_id": user, "ts": ts})
    ds = ray.data.from_pandas(df).repartition(8)
    out = sessionize(ds, "user_id", "ts", 1000).to_pandas()
    assert len(out) == n
    # pandas oracle: per-key sorted gap splits
    w = df.sort_values(["user_id", "ts"], kind="mergesort").reset_index(drop=True)
    same = w.user_id.eq(w.user_id.shift(1)).to_numpy()
    brk = ((w.ts - w.ts.shift(1)) > 1000).to_numpy() & same
    cs = np.cumsum(brk.astype(np.int64))
    starts = np.flatnonzero(~same)
    seq = cs - np.repeat(cs[starts], np.diff(np.append(starts, n)))
    w["session_seq"] = seq
    got = out.sort_values(["user_id", "ts", "session_seq"],
                          kind="mergesort").reset_index(drop=True)
    want = w.sort_values(["user_id", "ts", "session_seq"],
                         kind="mergesort").reset_index(drop=True)
    assert (got["session_seq"].to_numpy() == want["session_seq"].to_numpy()).all()


def test_hash_aggregate_extreme_hot_key():
    n = 500_000
    rng = np.random.default_rng(4)
    key = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 1000, size=n))
    val = rng.integers(0, 100, size=n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(key.astype(np.int64)), "v": pa.array(val)}))
    out = hash_aggregate(ds.repartition(16), "k",
                         {"n": (None, "count"), "s": ("v", "sum")}).to_pandas()
    want = (pd.DataFrame({"k": key, "v": val})
            .groupby("k", as_index=False).agg(n=("v", "size"), s=("v", "sum")))
    m = out.sort_values("k").reset_index(drop=True)
    w = want.sort_values("k").reset_index(drop=True)
    assert len(m) == len(w)
    assert (m["n"].to_numpy() == w["n"].to_numpy()).all()
    assert (m["s"].to_numpy() == w["s"].to_numpy()).all()
    hot = m.loc[m.k == 7]
    assert int(hot["n"].iloc[0]) == int((key == 7).sum())


def test_rasterize_hot_cell_exact():
    from raster_processor_ray.aggregate.rasterize import rasterize
    from raster_processor_ray.config import DEFAULT_AGG
    from raster_processor_ray.geo.cells import GridSpec

    grid = GridSpec(x_min=0, y_min=0, x_max=10, y_max=10, res=1.0,
                    tile_size=4)
    n = 200_000
    rng = np.random.default_rng(5)
    # 95% of points in ONE cell, remainder spread over the 10x10 grid
    cell = np.where(rng.random(n) < 0.95, 55,
                    rng.integers(0, 100, size=n)).astype(np.int64)
    v = rng.standard_normal(n)
    ds = ray.data.from_arrow(pa.table({
        "grid_cell": pa.array(cell), "value": pa.array(v)})).repartition(16)
    out = rasterize(ds, grid, DEFAULT_AGG).to_pandas()
    hot = out.loc[out.grid_cell == 55]
    assert int(hot["n_pix"].iloc[0]) == int((cell == 55).sum())
    want_mean = v[cell == 55].mean()
    got_mean = float(hot["mean_value"].iloc[0])
    assert abs(got_mean - want_mean) < 1e-9


class TestDiagnoseSkew:
    def test_detects_planted_hot_key(self, ray_session):
        import ray.data as rd

        from raster_processor_ray.state.diagnose import diagnose_skew

        # 10k rows uniform over 1000 keys + one key with 5k extra rows
        ks = np.concatenate([np.arange(10_000, dtype=np.int64) % 1000,
                             np.full(5_000, 7, dtype=np.int64)])
        ds = rd.from_arrow(pa.table({"k": pa.array(ks)})).repartition(8)
        d = diagnose_skew(ds, "k", num_buckets=32, hot_k=50)
        assert d["total_rows"] == 15_000
        assert d["imbalance"] > 2.0           # the hot bucket stands out
        hot = d["hot_keys"]
        assert int(hot.iloc[0]["key"]) == 7
        assert int(hot.iloc[0]["n"]) == 5_010
        assert int(hot.iloc[0]["salt_factor"]) >= 10

    def test_uniform_is_balanced(self, ray_session):
        import ray.data as rd

        from raster_processor_ray.state.diagnose import diagnose_skew

        ks = np.arange(20_000, dtype=np.int64)
        ds = rd.from_arrow(pa.table({"k": pa.array(ks)})).repartition(8)
        d = diagnose_skew(ds, "k", num_buckets=32, hot_k=50)
        assert d["imbalance"] < 1.2
        assert len(d["hot_keys"]) == 0


class TestCompositeAndSalted:
    def test_composite_hot_key_exact(self, ray_session):
        """A (a, b) composite key can be hot while EVERY single component
        is uniform — the packed recount must catch it where a
        first-component-only diagnosis cannot."""
        import ray.data as rd

        from raster_processor_ray.state.diagnose import diagnose_skew

        n = 12_000
        # components a and b each uniform over 0..59 (200 rows per value)
        a = np.arange(n, dtype=np.int64) % 60
        b = (np.arange(n, dtype=np.int64) // 60) % 60
        # plant 3000 extra rows of ONE composite pair (7, 11): a is now
        # 7 for 3200/15000 rows (21%) but b==11 only pairs with a==7
        a = np.concatenate([a, np.full(3_000, 7, dtype=np.int64)])
        b = np.concatenate([b, np.full(3_000, 11, dtype=np.int64)])
        ds = rd.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(b)}))
        ds = ds.repartition(8)
        d = diagnose_skew(ds, ["a", "b"], num_buckets=32, hot_k=50)
        hot = d["hot_keys"]
        assert len(hot) >= 1
        assert hot.iloc[0]["key"] == "7\x1f11"
        # 3000 planted + the few (7, 11) pairs the uniform part produces
        assert 3_000 <= int(hot.iloc[0]["n"]) <= 3_010
        # single-component diagnosis on b would put b==11 at only
        # 200 + 3000 rows of 15000 -> the composite count is what the
        # salting decision needs
        assert int(hot.iloc[0]["salt_factor"]) >= 5

    def test_auto_salt_groupby_matches_unsalted(self, ray_session):
        """20%-hot-key top-k through the salted two-stage plan: results
        identical to a driver-side oracle, and the stage-1 groups are
        bounded (the hot key is actually split across salts)."""
        import ray.data as rd

        from raster_processor_ray.aggregate.salted import auto_salt_groupby
        from raster_processor_ray.state.diagnose import diagnose_skew

        n = 10_000
        rng = np.random.default_rng(11)
        key = np.where(rng.random(n) < 0.2, 0,
                       rng.integers(1, 200, size=n)).astype(np.int64)
        rid = np.arange(n, dtype=np.int64)
        val = rng.integers(0, 1_000_000, size=n).astype(np.int64)
        df = pd.DataFrame({"k": key, "rid": rid, "v": val})
        ds = rd.from_pandas(df).repartition(8)

        diag = diagnose_skew(ds, "k", num_buckets=32, hot_k=50)
        assert int(diag["hot_keys"].iloc[0]["key"]) == 0
        hot_salt = int(diag["hot_keys"].iloc[0]["salt_factor"])
        assert hot_salt > 1                      # the salt actually engages

        def top2(g: pd.DataFrame) -> pd.DataFrame:
            return g.sort_values(["v", "rid"],
                                 ascending=[False, True]).head(2)

        def finish(g: pd.DataFrame) -> pd.DataFrame:
            out = top2(g).reset_index(drop=True)
            out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
            return out[["k", "rid", "v", "rank"]]

        got = auto_salt_groupby(ds, "k", top2, finish, salt_on="rid",
                                diagnosis=diag).to_pandas()
        got = got.sort_values(["k", "rank"]).reset_index(drop=True)

        want = (df.sort_values(["v", "rid"], ascending=[False, True])
                .groupby("k", as_index=False).head(2))
        want = want.sort_values(["k", "v", "rid"],
                                ascending=[True, False, True])
        want["rank"] = want.groupby("k").cumcount() + 1
        want = want[["k", "rid", "v", "rank"]].reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
