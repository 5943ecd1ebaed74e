"""Round-3 extension operators: radius join, keyed lag/lead windows,
ROLLUP, term counts, z-order keys — each vs a NumPy/pandas oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from raster_processor_ray.geo.zorder import (add_zorder_column, zorder_key,
                                             zorder_sql)
from raster_processor_ray.stages.radius import EARTH_R, radius_join
from raster_processor_ray.stages.text import term_count_partials
from raster_processor_ray.stages.windows import keyed_lag_deltas


def _haversine_m(lat1, lon1, lat2, lon2):
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dphi = p2 - p1
    dlmb = np.radians(lon2) - np.radians(lon1)
    h = np.sin(dphi / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlmb / 2) ** 2
    return 2 * EARTH_R * np.arcsin(np.sqrt(np.clip(h, 0, 1)))


def test_radius_join_vs_haversine():
    rng = np.random.default_rng(31)
    n = 4000
    df = pd.DataFrame({"pid": np.arange(n, dtype=np.int64),
                       "lat": rng.uniform(-80, 80, n),
                       "lon": rng.uniform(-180, 180, n)})
    sites = pd.DataFrame({"site_id": np.array([1, 2], dtype=np.int64),
                          "lat": [10.0, -40.0], "lon": [20.0, -100.0]})
    r = 2_500_000.0
    got = radius_join(ray.data.from_pandas(df).repartition(6),
                      sites.site_id.to_numpy(), sites.lat.to_numpy(),
                      sites.lon.to_numpy(), r, concurrency=2).to_pandas()
    want_pairs = set()
    for _, s in sites.iterrows():
        d = _haversine_m(df.lat.to_numpy(), df.lon.to_numpy(), s.lat, s.lon)
        for pid in df.pid.to_numpy()[d <= r]:
            want_pairs.add((int(pid), int(s.site_id)))
    got_pairs = set(zip(got.pid.astype(int), got.site_id.astype(int)))
    assert got_pairs == want_pairs
    # distances agree with haversine to numerical tolerance
    d1 = _haversine_m(got.lat.to_numpy(), got.lon.to_numpy(),
                      sites.set_index("site_id").lat[got.site_id].to_numpy(),
                      sites.set_index("site_id").lon[got.site_id].to_numpy())
    assert np.allclose(got.dist_m.to_numpy(), d1, atol=1.0)
    assert (got.dist_m.to_numpy() <= r + 1e-6).all()


def test_radius_join_empty_batch():
    # empty-batch path of the stage itself (Ray skips UDFs on a fully
    # empty dataset, so exercise the actor class directly)
    from raster_processor_ray.stages.radius import RadiusJoin

    ref = ray.put((np.array([1], dtype=np.int64), np.array([0.0]),
                   np.array([0.0])))
    stage = RadiusJoin(ref, 1e6)
    out = stage(pa.table({"pid": pa.array([], type=pa.int64()),
                          "lat": pa.array([], type=pa.float64()),
                          "lon": pa.array([], type=pa.float64())}))
    assert out.num_rows == 0
    assert {"site_id", "dist_m"} <= set(out.column_names)


def test_keyed_lag_deltas_vs_pandas():
    rng = np.random.default_rng(32)
    n = 5000
    df = pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "uid": rng.integers(0, 300, n).astype(np.int64),
        "ts": pd.to_datetime("2024-01-01")
              + pd.to_timedelta(rng.integers(0, 10**9, n), unit="us"),
    })
    got = keyed_lag_deltas(ray.data.from_pandas(df).repartition(7),
                           "uid", "ts", tie_col="eid").to_pandas()
    want = df.sort_values(["uid", "ts", "eid"], kind="mergesort").copy()
    want["rn"] = want.groupby("uid").cumcount() + 1
    d = want.groupby("uid")["ts"].diff().dt.total_seconds()
    want["delta_s"] = d.fillna(-1.0)
    key = ["uid", "eid"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert (g.rn.to_numpy() == w.rn.to_numpy()).all()
    assert np.allclose(g.delta_s.to_numpy(), w.delta_s.to_numpy())


def test_rollup_vs_pandas():
    from raster_processor_ray.aggregate.rollup import rollup_aggregate

    rng = np.random.default_rng(33)
    df = pd.DataFrame({"a": rng.choice(["x", "y"], 2000),
                       "b": rng.choice(["p", "q", "r"], 2000),
                       "v": rng.integers(0, 50, 2000).astype(float)})
    got = rollup_aggregate(ray.data.from_pandas(df).repartition(5),
                           ["a", "b"], {"sv": ("v", "sum"),
                                        "n": (None, "count")})
    assert len(got) == 2 * 3 + 2 + 1
    fin = got[(got.a != "ALL") & (got.b != "ALL")].set_index(["a", "b"])
    want = df.groupby(["a", "b"]).agg(sv=("v", "sum"), n=("v", "size"))
    for k, row in want.iterrows():
        assert fin.loc[k, "n"] == row.n and abs(fin.loc[k, "sv"] - row.sv) < 1e-9
    tot = got[(got.a == "ALL") & (got.b == "ALL")]
    assert int(tot.n.iloc[0]) == 2000
    assert abs(float(tot.sv.iloc[0]) - df.v.sum()) < 1e-9
    mid = got[(got.a != "ALL") & (got.b == "ALL")]
    assert len(mid) == 2 and int(mid.n.sum()) == 2000


def test_rollup_rejects_non_additive():
    import pytest

    from raster_processor_ray.aggregate.rollup import rollup_aggregate

    with pytest.raises(ValueError):
        rollup_aggregate(None, ["a"], {"m": ("v", "mean")})


def test_term_count_partials():
    batch = pa.table({
        "lang": ["en", "en", "fr"],
        "text": ["The cat the Cat sat", "cat! dog?", "le chat le chat le"],
    })
    out = term_count_partials(batch).to_pandas()
    c = {(r.lang, r.tok): r.n for r in out.itertuples()}
    assert c[("en", "the")] == 2 and c[("en", "cat")] == 3
    assert c[("en", "sat")] == 1 and c[("en", "dog")] == 1
    assert c[("fr", "le")] == 3 and c[("fr", "chat")] == 2
    # unicode outside [A-Za-z0-9] never produces tokens
    out2 = term_count_partials(pa.table({"lang": ["zh"], "text": ["汉字 abc 汉"]}))
    assert out2.to_pandas().tok.tolist() == ["abc"]


def test_zorder_key_pinned_and_locality():
    # pinned: interleave of small values (Morton 1966 layout)
    assert zorder_key(np.array([0]), np.array([0]))[0] == 0
    assert zorder_key(np.array([1]), np.array([0]))[0] == 1
    assert zorder_key(np.array([0]), np.array([1]))[0] == 2
    assert zorder_key(np.array([3]), np.array([5]))[0] == 0b100111
    # any aligned 2^b x 2^b square is one contiguous key range
    ix, iy = np.meshgrid(np.arange(8, 16), np.arange(24, 32))
    z = zorder_key(ix.ravel(), iy.ravel())
    z.sort()
    assert z[-1] - z[0] == 63 and len(np.unique(z)) == 64


def test_zorder_sql_matches_kernel():
    import duckdb

    rng = np.random.default_rng(34)
    ix = rng.integers(0, 360, 500)
    iy = rng.integers(0, 180, 500)
    want = zorder_key(ix, iy)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"ix": ix, "iy": iy}))
    got = con.execute(
        f"SELECT {zorder_sql('ix', 'iy')} AS z FROM t").df().z.to_numpy()
    assert (got == want).all()


def test_heavy_hitters_exact():
    from raster_processor_ray.aggregate.frequent import heavy_hitters

    rng = np.random.default_rng(39)
    # zipf-ish: a few hot values + uniform tail
    vals = np.concatenate([
        np.repeat(np.array([7, 13, 42], dtype=np.int64), [900, 400, 180]),
        rng.integers(1000, 3000, 5000).astype(np.int64)])
    rng.shuffle(vals)
    df = pd.DataFrame({"v": vals})
    k = 20  # threshold: > len/20 = 324
    got = heavy_hitters(ray.data.from_pandas(df).repartition(7),
                        "v", k).set_index("v")
    want = df.v.value_counts()
    want = want[want.to_numpy() * k > len(df)]
    assert set(got.index) == set(want.index)
    for v, c in want.items():
        assert got.loc[v, "n"] == c


def test_heavy_hitters_none():
    from raster_processor_ray.aggregate.frequent import heavy_hitters

    df = pd.DataFrame({"v": np.arange(1000, dtype=np.int64)})  # all unique
    got = heavy_hitters(ray.data.from_pandas(df).repartition(4),
                        "v", 10)
    assert len(got) == 0


def test_keyed_cumsum_vs_pandas():
    from raster_processor_ray.stages.windows import keyed_cumsum

    rng = np.random.default_rng(40)
    n = 6000
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "g": rng.integers(0, 200, n).astype(np.int64),
                       "o": rng.integers(0, 10**6, n).astype(np.int64),
                       "v": rng.integers(-50, 50, n).astype(np.int64)})
    got = keyed_cumsum(ray.data.from_pandas(df).repartition(6),
                       "g", "o", "v", tie_col="id").to_pandas()
    want = df.sort_values(["g", "o", "id"], kind="mergesort").copy()
    want["cum"] = want.groupby("g").v.cumsum()
    m = got[["id", "cum"]].merge(want[["id", "cum"]], on="id",
                                 suffixes=("", "_w"))
    assert len(m) == n and (m.cum == m.cum_w).all()


def test_profile_columns():
    from raster_processor_ray.aggregate.profile import profile_columns

    df = pd.DataFrame({"a": [1.0, np.nan, 3.0, -2.0],
                       "b": pd.array([None, None, None, None],
                                     dtype="Int64")})
    got = profile_columns(ray.data.from_pandas(df).repartition(2),
                          ["a", "b"]).to_pandas().set_index("col_name")
    assert got.loc["a", "n"] == 4 and got.loc["a", "n_null"] == 1
    assert got.loc["a", "vmin"] == -2.0 and got.loc["a", "vmax"] == 3.0
    assert got.loc["b", "n_null"] == 4
    assert np.isnan(got.loc["b", "vmin"]) and np.isnan(got.loc["b", "vmax"])


def test_extract_int_field():
    from raster_processor_ray.functions.strings import extract_int_field

    col = pa.array(['{"k": 69}', '{"k": 0}', '{"j": 5}', None, '{"k": 12'])
    out = extract_int_field(col, r'"k": (\d+)')
    assert out.to_pylist() == [69, 0, None, None, 12]


def test_splat_rasterize_vs_row_loop():
    from raster_processor_ray.aggregate.splat import W_SCALE, splat_rasterize

    rng = np.random.default_rng(38)
    n = 2000
    df = pd.DataFrame({"lat": rng.uniform(-60, 60, n),
                       "lon": rng.uniform(-170, 170, n),
                       "v": rng.integers(1, 100, n).astype(np.int64)})
    got = splat_rasterize(ray.data.from_pandas(df).repartition(6), "v",
                          res_deg=1.0, radius_cells=1, kind="gaussian",
                          sigma_deg=0.5).to_pandas().set_index("cell")
    # row-loop reference
    acc = {}
    s = 0.5 / 1.0
    for lat, lon, v in df.itertuples(index=False):
        iy0, ix0 = int(np.floor(lat + 90)), int(np.floor(lon + 180))
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                iy, ix = iy0 + dy, ix0 + dx
                if not (0 <= iy < 180 and 0 <= ix < 360):
                    continue
                ddx = lon - (ix + 0.5 - 180.0)
                ddy = lat - (iy + 0.5 - 90.0)
                w = int(round(np.exp(-(ddx * ddx + ddy * ddy)
                                     / (2 * s * s)) * W_SCALE))
                if w <= 0:
                    continue
                c = iy * 360 + ix
                a = acc.setdefault(c, [0, 0, 0])
                a[0] += 1; a[1] += w; a[2] += w * v
    assert len(got) == len(acc)
    for c, (cnt, sw, swv) in acc.items():
        assert got.loc[c, "n_contrib"] == cnt
        assert got.loc[c, "sum_w"] == sw
        assert abs(got.loc[c, "wmean"] - round(swv / sw, 6)) < 1e-9


def test_splat_idw_center_dominates():
    from raster_processor_ray.aggregate.splat import splat_rasterize

    # one sample exactly at its cell center: IDW weight capped at eps,
    # neighbors get much less; wmean equals the sample value everywhere
    df = pd.DataFrame({"lat": [10.5 - 90.0 + 90.0], "lon": [20.5],
                       "v": np.array([77], dtype=np.int64)})
    got = splat_rasterize(ray.data.from_pandas(df), "v", res_deg=1.0,
                          radius_cells=1, kind="idw").to_pandas()
    assert len(got) == 9 and (got.wmean == 77.0).all()
    center = got.loc[got.sum_w.idxmax()]
    assert center.cell == (int(10.5 + 90) * 360 + int(20.5 + 180))


def test_keyed_ntile_vs_duckdb():
    import duckdb

    from raster_processor_ray.stages.windows import keyed_ntile

    rng = np.random.default_rng(36)
    n = 4000
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "g": rng.choice(["a", "b", "c", "d"], n),
                       "v": rng.integers(0, 1000, n).astype(np.int64)})
    got = keyed_ntile(ray.data.from_pandas(df).repartition(6),
                      "g", "v", 4, tie_col="id").to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT id, ntile(4) OVER (PARTITION BY g ORDER BY v, id) AS tile "
        "FROM t").df()
    m = got[["id", "tile"]].merge(want, on="id", suffixes=("", "_w"))
    assert len(m) == n and (m.tile == m.tile_w).all()


def test_keyed_ntile_small_groups():
    from raster_processor_ray.stages.windows import keyed_ntile

    # n < k: each row is its own tile (ANSI)
    df = pd.DataFrame({"id": np.arange(3, dtype=np.int64),
                       "g": ["x"] * 3,
                       "v": np.array([30, 10, 20], dtype=np.int64)})
    got = keyed_ntile(ray.data.from_pandas(df), "g", "v", 5,
                      tie_col="id").to_pandas().sort_values("v")
    assert got.tile.tolist() == [1, 2, 3]


def test_pivot_counts_vs_pandas():
    from raster_processor_ray.aggregate.relational import pivot_counts

    rng = np.random.default_rng(37)
    df = pd.DataFrame({"k": rng.choice(["p", "q", "r"], 5000),
                       "c": rng.choice(["x", "y", "z"], 5000)})
    got = pivot_counts(ray.data.from_pandas(df).repartition(5),
                       "k", "c", ["x", "y"]).to_pandas().set_index("k")
    want = df.pivot_table(index="k", columns="c", aggfunc="size")
    for k in ["p", "q", "r"]:
        assert got.loc[k, "n_x"] == want.loc[k, "x"]
        assert got.loc[k, "n_y"] == want.loc[k, "y"]
        assert got.loc[k, "n_total"] == want.loc[k].sum()


def _label_regions_numpy(mask: np.ndarray) -> np.ndarray:
    """4-connectivity labeling by BFS flood fill (test oracle)."""
    lab = np.full(mask.shape, -1, dtype=np.int64)
    ny, nx = mask.shape
    for sy in range(ny):
        for sx in range(nx):
            if not mask[sy, sx] or lab[sy, sx] >= 0:
                continue
            root = sy * nx + sx
            stack = [(sy, sx)]
            lab[sy, sx] = root
            while stack:
                y, x = stack.pop()
                for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < ny and 0 <= xx < nx and mask[yy, xx] \
                            and lab[yy, xx] < 0:
                        lab[yy, xx] = root
                        stack.append((yy, xx))
    return lab


def test_extract_regions_vs_flood_fill():
    from raster_processor_ray.stages.regions import extract_regions

    rng = np.random.default_rng(35)
    ny, nx = 20, 30
    mask = rng.random((ny, nx)) < 0.45
    lab = _label_regions_numpy(mask)
    iy, ix = np.nonzero(mask)
    cells = pd.DataFrame({
        "iy": iy.astype(np.int64), "ix": ix.astype(np.int64),
        "cell": (iy * nx + ix).astype(np.int64),
        "w": np.ones(len(iy), dtype=np.int64)})
    got = extract_regions(ray.data.from_pandas(cells).repartition(4),
                          nx=nx, weight_col="w").to_pandas()
    want = pd.DataFrame({"region": lab[mask]}).groupby("region").size()
    assert len(got) == len(want)
    g = got.set_index("region")["n_cells"].sort_index()
    assert (g.index.to_numpy() == want.index.to_numpy()).all()
    assert (g.to_numpy() == want.to_numpy()).all()
    assert (got.n_w == got.n_cells).all()  # unit weights
    # bbox sanity on the min-id region
    r0 = int(want.index[0])
    sel = lab == r0
    ys, xs = np.nonzero(sel)
    row = got[got.region == r0].iloc[0]
    assert (row.ix_min, row.ix_max, row.iy_min, row.iy_max) == \
        (xs.min(), xs.max(), ys.min(), ys.max())


def test_extract_regions_no_wrap():
    from raster_processor_ray.stages.regions import extract_regions

    # two cells at the row seam (ix = nx-1 and ix = 0, same iy) must NOT merge
    nx = 8
    cells = pd.DataFrame({"iy": [3, 3], "ix": [7, 0],
                          "cell": [3 * nx + 7, 3 * nx + 0],
                          "w": [1, 1]})
    got = extract_regions(ray.data.from_pandas(cells), nx=nx,
                          weight_col="w").to_pandas()
    assert len(got) == 2 and (got.n_cells == 1).all()


def test_add_zorder_column_round_trip():
    df = pd.DataFrame({"lat": [-89.5, 0.0, 45.25], "lon": [-179.5, 0.0, 120.75]})
    out = add_zorder_column(ray.data.from_pandas(df)).to_pandas()
    iy = np.floor(df.lat.to_numpy() + 90.0).astype(np.int64)
    ix = np.floor(df.lon.to_numpy() + 180.0).astype(np.int64)
    assert (out.zkey.to_numpy() == zorder_key(ix, iy)).all()

def test_keyed_rolling_sum_vs_pandas():
    from raster_processor_ray.stages.windows import keyed_rolling_sum

    rng = np.random.default_rng(41)
    n = 5000
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "g": rng.integers(0, 150, n).astype(np.int64),
                       "o": rng.integers(0, 10**6, n).astype(np.int64),
                       "v": rng.integers(-40, 40, n).astype(np.int64)})
    got = keyed_rolling_sum(ray.data.from_pandas(df).repartition(5),
                            "g", "o", "v", preceding=3,
                            tie_col="id").to_pandas()
    want = df.sort_values(["g", "o", "id"], kind="mergesort").copy()
    want["roll"] = (want.groupby("g").v
                    .rolling(4, min_periods=1).sum()
                    .reset_index(level=0, drop=True).astype(np.int64))
    m = got[["id", "roll"]].merge(want[["id", "roll"]], on="id",
                                  suffixes=("", "_w"))
    assert len(m) == n and (m.roll == m.roll_w).all()


def test_keyed_rank_vs_pandas():
    from raster_processor_ray.stages.windows import keyed_rank

    rng = np.random.default_rng(42)
    n = 4000
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "g": rng.integers(0, 80, n).astype(np.int64),
                       "v": rng.integers(0, 12, n).astype(np.int64)})
    got = keyed_rank(ray.data.from_pandas(df).repartition(4),
                     "g", "v", descending=True).to_pandas()
    want = df.copy()
    want["rnk"] = want.groupby("g").v.rank(
        method="min", ascending=False).astype(np.int64)
    want["drnk"] = want.groupby("g").v.rank(
        method="dense", ascending=False).astype(np.int64)
    m = got.merge(want, on="id", suffixes=("", "_w"))
    assert len(m) == n
    assert (m.rnk == m.rnk_w).all() and (m.drnk == m.drnk_w).all()


def test_grouped_stats_vs_numpy():
    from raster_processor_ray.aggregate.stats import grouped_stats

    rng = np.random.default_rng(43)
    n = 8000
    df = pd.DataFrame({"g": rng.integers(0, 5, n).astype(np.int64),
                       "x": rng.integers(1, 50, n).astype(np.int64)})
    df["y"] = (3 * df.x + rng.integers(-100, 100, n)).astype(np.int64)
    got = grouped_stats(ray.data.from_pandas(df).repartition(6),
                        "g", "x", "y", round_to=None) \
        .to_pandas().set_index("g").sort_index()
    for g, sub in df.groupby("g"):
        assert got.loc[g, "n"] == len(sub)
        np.testing.assert_allclose(got.loc[g, "mean_x"], sub.x.mean(),
                                   rtol=1e-12)
        np.testing.assert_allclose(got.loc[g, "std_x"], sub.x.std(ddof=1),
                                   rtol=1e-10)
        np.testing.assert_allclose(
            got.loc[g, "corr_xy"], np.corrcoef(sub.x, sub.y)[0, 1],
            rtol=1e-9)
        np.testing.assert_allclose(
            got.loc[g, "slope_yx"],
            np.polyfit(sub.x.to_numpy(dtype=float),
                       sub.y.to_numpy(dtype=float), 1)[0], rtol=1e-8)


def test_hash_join_full_outer():
    from raster_processor_ray.aggregate.relational import hash_join

    l = pd.DataFrame({"k": np.array([1, 2, 3, 5], dtype=np.int64),
                      "a": np.array([10, 20, 30, 50], dtype=np.int64)})
    r = pd.DataFrame({"k": np.array([2, 3, 4, 6], dtype=np.int64),
                      "b": np.array([200, 300, 400, 600], dtype=np.int64)})
    got = hash_join(ray.data.from_pandas(l).repartition(2),
                    ray.data.from_pandas(r).repartition(2),
                    "k", how="full").to_pandas().sort_values("k") \
        .reset_index(drop=True)
    want = l.merge(r, on="k", how="outer").sort_values("k") \
        .reset_index(drop=True)
    assert got.k.astype(np.int64).tolist() == want.k.tolist()
    assert got.a.fillna(-1).tolist() == want.a.fillna(-1).tolist()
    assert got.b.fillna(-1).tolist() == want.b.fillna(-1).tolist()

def test_vocab_encode_roundtrip():
    from raster_processor_ray.pipelines.vocab import build_vocab, encode_tokens

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["the cat sat", "the the dog", "  cat! cat?",
                 "", "zzz unseen token", "the end"],
    })
    ds = ray.data.from_pandas(docs).repartition(3)
    vocab = build_vocab(ds, size=3)
    # counts: the=4, cat=3, ... top3 by (n desc, tok asc)
    assert vocab.tok.tolist()[0] == "the" and vocab.token_id.tolist() == [0, 1, 2]
    enc = encode_tokens(ds, vocab).to_pandas()
    lut = dict(zip(vocab.tok, vocab.token_id))
    import re
    for _, d in docs.iterrows():
        toks = [t.lower() for t in re.split(r"[^A-Za-z0-9]+", d.text) if t]
        want = [(p + 1, lut[t]) for p, t in enumerate(toks) if t in lut]
        got = enc[enc.doc_id == d.doc_id].sort_values("pos")
        assert list(zip(got.pos, got.token_id)) == want

def test_keyed_rank_percent_cume():
    from raster_processor_ray.stages.windows import keyed_rank

    rng = np.random.default_rng(44)
    n = 3000
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "g": rng.integers(0, 60, n).astype(np.int64),
                       "v": rng.integers(0, 8, n).astype(np.int64)})
    # include a single-row key: percent_rank must be 0.0 there
    df.loc[n - 1, "g"] = 999
    got = keyed_rank(ray.data.from_pandas(df).repartition(4), "g", "v",
                     percent_col="pr", cume_col="cd").to_pandas()
    want = df.copy()
    grp = want.groupby("g").v
    cnt = grp.transform("size").to_numpy(dtype=np.float64)
    rnk = grp.rank(method="min").to_numpy()
    want["pr"] = np.where(cnt == 1, 0.0, (rnk - 1) / (cnt - 1))
    want["cd"] = grp.rank(method="max").to_numpy() / cnt
    m = got.merge(want, on="id", suffixes=("", "_w"))
    assert len(m) == n
    np.testing.assert_allclose(m.pr, m.pr_w, rtol=0, atol=0)
    np.testing.assert_allclose(m.cd, m.cd_w, rtol=0, atol=0)

def test_cube_aggregate_vs_pandas():
    from raster_processor_ray.aggregate.cube import cube_aggregate

    rng = np.random.default_rng(45)
    n = 4000
    df = pd.DataFrame({"a": rng.choice(["x", "y", "z"], n),
                       "b": rng.choice(["p", "q"], n),
                       "v": rng.integers(0, 100, n).astype(np.int64)})
    got = cube_aggregate(ray.data.from_pandas(df).repartition(4),
                         ["a", "b"], {"n": (None, "count"),
                                      "s": ("v", "sum")})
    assert len(got) == 3 * 2 + 3 + 2 + 1
    gi = got.set_index(["a", "b"])
    assert gi.loc[("ALL", "ALL"), "n"] == n
    assert gi.loc[("ALL", "ALL"), "s"] == df.v.sum()
    for (a, b), sub in df.groupby(["a", "b"]):
        assert gi.loc[(a, b), "n"] == len(sub)
        assert gi.loc[(a, b), "s"] == sub.v.sum()
    for a, sub in df.groupby("a"):
        assert gi.loc[(a, "ALL"), "s"] == sub.v.sum()
    for b, sub in df.groupby("b"):
        assert gi.loc[("ALL", b), "n"] == len(sub)


def test_doc_top_tfidf_small():
    from raster_processor_ray.pipelines.tfidf import doc_top_tfidf

    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["apple banana apple", "banana cherry", "apple apple apple",
                 "dog dog cherry banana"],
    })
    ds = ray.data.from_pandas(docs).repartition(2)
    got = doc_top_tfidf(ds, vocab_size=10, k=2).to_pandas()
    # independent oracle
    import math
    from collections import Counter
    toks = {i: t.split() for i, t in zip(docs.doc_id, docs.text)}
    dfreq = Counter()
    for ts in toks.values():
        for t in set(ts):
            dfreq[t] += 1
    for i, ts in toks.items():
        tf = Counter(ts)
        scored = sorted(
            ((round(c * math.log(4 / dfreq[t]), 6), t) for t, c in tf.items()
             if dfreq[t] < 4 or True),
            key=lambda x: (-x[0], x[1]))[:2]
        sub = got[got.doc_id == i].sort_values(
            ["tfidf", "tok"], ascending=[False, True])
        assert list(zip(sub.tfidf, sub.tok)) == scored

def _lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev = d[0]
        d[0] = i
        for j in range(1, n + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return d[n]


def test_edit1_self_join_exact_vs_bruteforce():
    import itertools

    from raster_processor_ray.stages.editjoin import edit1_self_join

    rng = np.random.default_rng(11)
    strs = ["".join(rng.choice(list("abcd"), rng.integers(0, 7)).tolist())
            for _ in range(150)]
    df = pd.DataFrame({"id": np.arange(150, dtype=np.int64), "s": strs})
    got = edit1_self_join(ray.data.from_pandas(df).repartition(4),
                          "id", "s").to_pandas()
    got_set = set(zip(got.id_a, got.id_b))
    want = {(i, j) for i, j in itertools.combinations(range(150), 2)
            if _lev(strs[i], strs[j]) <= 1}
    assert got_set == want


def test_edit1_verify_kernel_exhaustive():
    import itertools

    from raster_processor_ray.stages.editjoin import _verify_pairs

    # every string over {a,b} up to length 3: all pairs, exact oracle
    strs = [""] + ["".join(p) for L in (1, 2, 3)
                   for p in itertools.product("ab", repeat=L)]
    pairs = list(itertools.combinations(strs, 2)) + [(s, s) for s in strs]
    sa = np.array([a for a, _ in pairs], dtype=object)
    sb = np.array([b for _, b in pairs], dtype=object)
    got = _verify_pairs(sa.copy(), sb.copy())
    want = np.array([_lev(a, b) <= 1 for a, b in pairs])
    assert (got == want).all()

def test_kmeans_matches_local_lloyd():
    from raster_processor_ray.stages.kmeans import kmeans_assign, kmeans_fit

    rng = np.random.default_rng(46)
    k, d, per = 4, 8, 200
    centers = rng.normal(0, 10, (k, d))              # well separated
    vecs = np.concatenate([c + rng.normal(0, 0.3, (per, d))
                           for c in centers])
    ids = np.arange(k * per, dtype=np.int64)
    perm = rng.permutation(k * per)
    df = pd.DataFrame({
        "vec_id": ids[perm],
        "embedding": [v.tolist() for v in vecs[perm].astype(np.float32)],
    })
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(df.vec_id.to_numpy()),
        "embedding": pa.array(df.embedding.tolist(),
                              type=pa.list_(pa.float32())),
    })).repartition(5)
    cents, counts = kmeans_fit(ds, k, iters=4)
    # local oracle: same deterministic init (k smallest vec_ids)
    order = np.argsort(df.vec_id.to_numpy())
    m = np.stack(df.embedding.to_numpy())[order].astype(np.float64)
    c0 = m[:k].copy()
    for _ in range(4):
        dmat = (c0 * c0).sum(1)[None, :] - 2.0 * (m @ c0.T)
        a = dmat.argmin(1)
        for c in range(k):
            if (a == c).any():
                c0[c] = m[a == c].mean(0)
    np.testing.assert_allclose(np.sort(cents, axis=0),
                               np.sort(c0, axis=0), atol=1e-9)
    assert counts.sum() == k * per
    lab = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    assert len(lab) == k * per
    # labels match the local oracle's assignment under its centroids
    dmat = (c0 * c0).sum(1)[None, :] - 2.0 * (m @ c0.T)
    want = dmat.argmin(1)
    np.testing.assert_array_equal(lab.cluster.to_numpy(), want)

def test_covariance_and_pca_vs_numpy():
    from raster_processor_ray.aggregate.covariance import (
        covariance_matrix, pca_components, pca_project)

    rng = np.random.default_rng(47)
    n, d = 1200, 6
    base = rng.normal(0, 1, (n, 3)) @ rng.normal(0, 2, (3, d))
    vecs = (base + rng.normal(0, 0.05, (n, d))).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
    })).repartition(5)
    got_n, got_mean, got_cov = covariance_matrix(ds)
    m = vecs.astype(np.float64)
    assert got_n == n
    np.testing.assert_allclose(got_mean, m.mean(axis=0), atol=1e-9)
    np.testing.assert_allclose(got_cov, np.cov(m, rowvar=False), atol=1e-8)
    w, comps = pca_components(got_cov, 3)
    assert w[0] >= w[1] >= w[2] > 0
    # components orthonormal
    np.testing.assert_allclose(comps @ comps.T, np.eye(3), atol=1e-10)
    proj = pca_project(ds, got_mean, comps).to_pandas() \
        .sort_values("vec_id")
    want = (m - m.mean(axis=0)) @ comps.T
    np.testing.assert_allclose(np.stack(proj.pc.to_numpy()), want,
                               atol=1e-9)
    # top-3 PCs capture the rank-3 structure
    assert w[:3].sum() / np.trace(got_cov) > 0.99

def test_skew_join_matches_pandas_merge():
    from raster_processor_ray.stages.skewjoin import skew_join

    rng = np.random.default_rng(48)
    n = 20000
    # zipf-ish: key 0 holds ~30% of rows, long uniform tail
    keys = np.where(rng.random(n) < 0.3, 0,
                    rng.integers(1, 2000, n)).astype(np.int64)
    left = pd.DataFrame({"k": keys, "lv": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 2000, 2, dtype=np.int64)})
    right["rv"] = right.k * 10
    got = skew_join(ray.data.from_pandas(left).repartition(8),
                    ray.data.from_pandas(right).repartition(2),
                    "k", k=50).to_pandas()
    want = left.merge(right, on="k", how="inner")
    g = got.sort_values(["k", "lv"]).reset_index(drop=True)
    w = want.sort_values(["k", "lv"]).reset_index(drop=True)
    assert len(g) == len(w)
    assert (g.k.to_numpy() == w.k.to_numpy()).all()
    assert (g.lv.to_numpy() == w.lv.to_numpy()).all()
    assert (g.rv.to_numpy() == w.rv.to_numpy()).all()


def test_skew_join_no_hot_keys_falls_back():
    from raster_processor_ray.stages.skewjoin import skew_join

    left = pd.DataFrame({"k": np.arange(1000, dtype=np.int64),
                         "lv": np.arange(1000, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 1000, 3, dtype=np.int64),
                          "rv": np.arange(0, 1000, 3, dtype=np.int64)})
    got = skew_join(ray.data.from_pandas(left).repartition(4),
                    ray.data.from_pandas(right).repartition(2),
                    "k", k=10).to_pandas()
    want = left.merge(right, on="k")
    assert len(got) == len(want)
    assert set(zip(got.k, got.rv)) == set(zip(want.k, want.rv))


def _pyloop_rep_stats(texts):
    import re
    rows = []
    for t in texts:
        toks = re.findall(r"[a-z0-9]+", (t or "").lower())
        from collections import Counter
        c = Counter(toks)
        n = len(toks)
        rows.append((n, len(c), max(c.values()) if c else 0,
                     round(len(c) / n, 6) if n else 0.0,
                     round(max(c.values()) / n, 6) if c else 0.0))
    return rows


def test_repetition_stats_vs_row_loop():
    from raster_processor_ray.stages.webtext import repetition_stats_batch

    texts = ["the the the cat", "", None, "a b c a b a", "Mixed CASE case",
             "x" * 50, "one-two one_two one two", "ümlaut tökens here"]
    batch = pa.table({"doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
                      "text": pa.array(texts, type=pa.string())})
    got = repetition_stats_batch(batch).to_pandas()
    want = _pyloop_rep_stats(texts)
    for i, (nt, nd, mx, dr, tf) in enumerate(want):
        r = got.iloc[i]
        assert (r.n_tokens, r.n_distinct, r.max_tok_n) == (nt, nd, mx), i
        assert abs(r.distinct_ratio - dr) < 1e-9 and abs(r.top_tok_frac - tf) < 1e-9


def test_decontam_flags_vs_set_oracle(ray_session):
    import re
    from raster_processor_ray.stages.webtext import decontam_flags

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 15)))
             for _ in range(300)]
    ids = np.arange(300, dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    is_bench = ids % 7 == 0

    def grams(t):
        toks = re.findall(r"[a-z0-9]+", t.lower())
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    bench_set = set()
    for t in df.text[is_bench]:
        bench_set |= grams(t)
    want = {}
    for i, t in zip(ids[~is_bench], df.text[~is_bench]):
        k = len(grams(t) & bench_set)
        if k:
            want[int(i)] = k

    got = decontam_flags(
        ray.data.from_pandas(df[~is_bench]).repartition(4),
        ray.data.from_pandas(df[is_bench]).repartition(2),
        ngram=3, concurrency=2).to_pandas()
    assert dict(zip(got.doc_id.astype(int), got.n_contam.astype(int))) == want


def test_parse_url_batch():
    from raster_processor_ray.stages.webtext import parse_url_batch

    urls = ["https://a.example/d/1", "http://x.org/p?q=1#f",
            "ftp://files.net", "not a url", None,
            "https://h.example:8080/path/deep?x"]
    b = pa.table({"url": pa.array(urls, type=pa.string())})
    out = parse_url_batch(b).to_pandas()
    assert list(out.scheme) == ["https", "http", "ftp", "", "", "https"]
    assert list(out.host) == ["a.example", "x.org", "files.net", "", "",
                              "h.example:8080"]
    assert list(out.path) == ["/d/1", "/p", "", "", "", "/path/deep"]


def _ref_bpe_train(word_counts, num_merges):
    """From-first-principles BPE reference (dict/loop, no sharing with
    the engine implementation's internals beyond the algorithm)."""
    seqs = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(num_merges):
        pc_ = {}
        for w, c in word_counts.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc_[(s[i], s[i + 1])] = pc_.get((s[i], s[i + 1]), 0) + c
        if not pc_:
            break
        best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w in seqs:
            s, i = seqs[w], 0
            while i < len(s) - 1:
                if (s[i], s[i + 1]) == best:
                    s[i:i + 2] = [s[i] + s[i + 1]]
                else:
                    i += 1
    return merges


def test_bpe_train_matches_reference(ray_session):
    from raster_processor_ray.pipelines.bpe import train_bpe

    rng = np.random.default_rng(5)
    vocab = ["lower", "lowest", "newer", "newest", "wider", "low", "new"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 12)))
             for _ in range(200)]
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts})).repartition(4)
    got = train_bpe(ds, num_merges=12)

    import re
    wc = {}
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            wc[w] = wc.get(w, 0) + 1
    want = _ref_bpe_train(wc, 12)
    assert got == want


def test_bpe_encode_roundtrip_and_greedy(ray_session):
    from raster_processor_ray.pipelines.bpe import (bpe_encode, encode_word,
                                                    train_bpe)

    texts = ["the theme thermos there", "other lather the the",
             "THE Theme!", ""]
    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                       "text": texts})
    ds = ray.data.from_pandas(df).repartition(2)
    merges = train_bpe(ds, num_merges=8)
    enc = bpe_encode(ds, merges, concurrency=1).to_pandas()
    # concatenating a doc's pieces in pos order reproduces its words
    import re
    for d in range(4):
        words = re.findall(r"[a-z0-9]+", texts[d].lower())
        pieces = enc[enc.doc_id == d].sort_values("pos").piece.tolist()
        assert "".join(pieces) == "".join(words)
    # each word's piece split agrees with the canonical greedy algorithm
    ranks = {tuple(m): r for r, m in enumerate(merges)}
    got = enc[enc.doc_id == 0].sort_values("pos").piece.tolist()
    want = [p for w in re.findall(r"[a-z0-9]+", texts[0].lower())
            for p in encode_word(w, ranks)]
    assert got == want
    # merges actually fire: some piece is multi-char
    assert any(len(p) > 1 for p in enc.piece)


def test_pii_scrub_batch():
    from raster_processor_ray.stages.pii import pii_scrub_batch

    texts = [
        "mail a.b-c%d@sub.ex.com and x@y.io now",
        "server at 10.0.255.3 or 192.168.1.1, call 555-123-4567",
        "no pii here",
        None,
        "overlap 1.2.3.4 trail",
    ]
    b = pa.table({"doc_id": pa.array(np.arange(5, dtype=np.int64)),
                  "text": pa.array(texts, type=pa.string())})
    out = pii_scrub_batch(b).to_pandas()
    assert list(out.n_emails) == [2, 0, 0, 0, 0]
    assert list(out.n_ips) == [0, 2, 0, 0, 1]
    assert list(out.n_phones) == [0, 1, 0, 0, 0]
    assert out.text_scrubbed[0] == "mail <EMAIL> and <EMAIL> now"
    assert out.text_scrubbed[1] == "server at <IP> or <IP>, call <PHONE>"
    assert out.text_scrubbed[2] == "no pii here"
    assert out.text_scrubbed[3] == ""      # null -> ''
    assert out.text_scrubbed[4] == "overlap <IP> trail"
    # original text column untouched (scrub appends, never rewrites)
    assert out.text[0] == texts[0]


def test_paragraph_dedup_keep_first(ray_session):
    from raster_processor_ray.stages.paradedup import paragraph_dedup

    docs = pd.DataFrame({
        "doc_id": np.array([0, 1, 2, 3], dtype=np.int64),
        "text": ["alpha\nbeta\ngamma",   # all first occurrences
                 "beta\ndelta",          # beta dropped, delta kept
                 "alpha\nbeta",          # fully emptied
                 ""],                    # one empty para (first '' wins)
    })
    out = (paragraph_dedup(ray.data.from_pandas(docs).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out.n_paras) == [3, 2, 2, 1]
    assert list(out.n_kept) == [3, 1, 0, 1]
    assert out.text_dedup[0] == "alpha\nbeta\ngamma"
    assert out.text_dedup[1] == "delta"
    assert out.text_dedup[2] is None or pd.isna(out.text_dedup[2])
    assert out.text_dedup[3] == ""


def test_paragraph_dedup_order_within_doc(ray_session):
    """Surviving paragraphs keep their ORIGINAL in-doc order, and
    keep-first is by (doc_id, para_idx) — a later doc never steals a
    paragraph from an earlier one regardless of block layout."""
    from raster_processor_ray.stages.paradedup import paragraph_dedup

    docs = pd.DataFrame({
        "doc_id": np.array([5, 9], dtype=np.int64),
        "text": ["z\na\nz\nm", "a\nq\nz"],
    })
    # reversed block order: doc 9 arrives first physically
    ds = ray.data.from_pandas(docs.iloc[::-1].reset_index(drop=True))
    out = (paragraph_dedup(ds.repartition(2)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # doc 5: z(first), a(first), z(dup-of-own), m -> "z\na\nm"
    assert out.text_dedup[0] == "z\na\nm"
    # doc 9: a and z already taken by doc 5 -> only q survives
    assert out.text_dedup[1] == "q"
    assert list(out.n_kept) == [3, 1]


def test_bm25_matches_loop_reference(ray_session):
    """Engine BM25 vs an independent dict/loop implementation."""
    import math
    import re

    from raster_processor_ray.pipelines.bm25 import bm25_topk

    rng = np.random.default_rng(11)
    vocab = ["query", "spark", "hash", "tile", "join", "scan", "x9"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 30)))
             for _ in range(120)]
    df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                       "text": texts})
    terms = ["spark", "x9"]
    got = (bm25_topk(ray.data.from_pandas(df).repartition(5), terms, 10)
           .to_pandas().reset_index(drop=True))

    toks = [re.findall(r"[a-z0-9]+", t.lower()) for t in texts]
    dls = [len(t) for t in toks]
    n, avgdl = len(toks), sum(dls) / len(toks)
    scores = []
    for d, tk in enumerate(toks):
        s = 0.0
        for t in terms:
            tf = tk.count(t)
            if tf == 0:
                continue
            dfreq = sum(1 for o in toks if t in o)
            idf = math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dls[d] / avgdl))
        scores.append((d, s))
    want = sorted(scores, key=lambda x: (-x[1], x[0]))[:10]
    assert list(got.doc_id) == [d for d, _ in want]
    np.testing.assert_allclose(got.score, [round(s, 6) for _, s in want],
                               atol=1e-6)


def test_lm_perplexity_matches_loop_reference(ray_session):
    """Engine bigram LM vs an independent dict/loop implementation
    (same micro-nat quantization)."""
    import math
    import re

    from raster_processor_ray.pipelines.lm import (score_perplexity,
                                                   train_bigram_lm)

    rng = np.random.default_rng(3)
    vocab = ["a", "bb", "ccc", "dd", "e5"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 15)))
             for _ in range(80)]
    df = pd.DataFrame({"doc_id": np.arange(80, dtype=np.int64),
                       "text": texts})
    train_df = df[df.doc_id % 3 == 0]
    rest_df = df[df.doc_id % 3 != 0]
    model = train_bigram_lm(ray.data.from_pandas(train_df).repartition(3))
    got = (score_perplexity(ray.data.from_pandas(rest_df).repartition(4),
                            model, concurrency=1)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    tok = {int(r.doc_id): re.findall(r"[a-z0-9]+", r.text.lower())
           for r in df.itertuples()}
    c12, c1, vocab_set = {}, {}, set()
    for d in train_df.doc_id:
        ts = tok[int(d)]
        vocab_set.update(ts)
        for w1, w2 in zip(ts, ts[1:]):
            c12[(w1, w2)] = c12.get((w1, w2), 0) + 1
            c1[w1] = c1.get(w1, 0) + 1
    V = len(vocab_set)
    rows = []
    for d in rest_df.doc_id:
        ts = tok[int(d)]
        if len(ts) < 2:
            continue
        qs = [math.floor(math.log((c12.get((w1, w2), 0) + 1.0)
                                  / (c1.get(w1, 0) + V)) * 1e6 + 0.5)
              for w1, w2 in zip(ts, ts[1:])]
        x = -sum(qs) / (1e6 * len(qs))
        rows.append((int(d), len(qs), math.floor(x * 1e6 + 0.5) / 1e6))
    want = pd.DataFrame(rows, columns=["doc_id", "n_bigrams", "avg_nll"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # docs with < 2 tokens emit no row
    short = [int(d) for d in rest_df.doc_id if len(tok[int(d)]) < 2]
    assert not set(short) & set(got.doc_id)


def test_pack_sequences_matches_loop_reference(ray_session):
    """Engine packing vs a straightforward driver-side reference:
    concatenate per-doc token lists + EOS in doc order, chop, drop
    tail. Doc ids deliberately sparse (ranges mostly empty)."""
    from raster_processor_ray.pipelines.packing import pack_sequences

    rng = np.random.default_rng(7)
    doc_ids = np.sort(rng.choice(100_000, size=60, replace=False)).astype(np.int64)
    rows = []
    stream_ref = []
    for d in doc_ids:
        n = int(rng.integers(0, 9))
        toks = rng.integers(0, 50, size=n)
        for p, t in enumerate(toks, start=1):
            rows.append((d, p, int(t)))
        if n:
            stream_ref.extend(list(toks) + [99])
    enc_df = pd.DataFrame(rows, columns=["doc_id", "pos", "token_id"])
    got = (pack_sequences(ray.data.from_pandas(enc_df).repartition(5),
                          seq_len=16, eos_id=99, range_size=1000)
           .to_pandas().sort_values(["seq_id", "pos_in_seq"])
           .reset_index(drop=True))
    full = (len(stream_ref) // 16) * 16
    want = pd.DataFrame({
        "seq_id": np.arange(full, dtype=np.int64) // 16,
        "pos_in_seq": np.arange(full, dtype=np.int64) % 16,
        "token_id": np.asarray(stream_ref[:full], dtype=np.int64)})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every kept sequence is exactly seq_len long
    assert (got.groupby("seq_id").size() == 16).all()


def test_mixture_sample_deterministic(ray_session):
    from raster_processor_ray.stages.mixture import mixture_sample

    df = pd.DataFrame({
        "doc_id": np.arange(4000, dtype=np.int64),
        "lang": np.tile(["en", "de", "zz", "fr"], 1000)})
    w = {"en": 1.0, "de": 0.5, "fr": 0.0}
    a = (mixture_sample(ray.data.from_pandas(df).repartition(2), w)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (mixture_sample(ray.data.from_pandas(df).repartition(7), w)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)          # partition-invariant
    got = a.groupby("lang").size()
    assert got.get("en", 0) == 1000              # rate 1.0: all kept
    assert "fr" not in got.index                 # rate 0: none
    assert "zz" not in got.index                 # unlisted group: none
    assert 380 <= got.get("de", 0) <= 620        # rate 0.5 +- noise


def test_shuffle_shards_is_permutation(ray_session):
    from raster_processor_ray.stages.mixture import shuffle_shards

    df = pd.DataFrame({"doc_id": np.arange(999, dtype=np.int64),
                       "lang": ["en"] * 999})
    out = (shuffle_shards(ray.data.from_pandas(df).repartition(4), 8)
           .to_pandas())
    assert len(out) == 999
    assert sorted(out.doc_id) == list(range(999))      # permutation
    for s, g in out.groupby("shard"):
        assert sorted(g["ord"]) == list(range(len(g)))  # dense ordinals
    # deterministic across partitioning
    out2 = (shuffle_shards(ray.data.from_pandas(df).repartition(9), 8)
            .to_pandas())
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # the permutation actually breaks doc_id order within shards
    g0 = out[out.shard == out.shard.iloc[0]].sort_values("ord")
    assert not g0.doc_id.is_monotonic_increasing


def test_duplicate_span_stats(ray_session):
    from raster_processor_ray.stages.webtext import duplicate_span_stats

    docs = pd.DataFrame({
        "doc_id": np.array([0, 1, 2], dtype=np.int64),
        "text": ["a b c d",        # grams: abc, bcd
                 "a b c x",        # grams: abc(shared), bcx
                 "q r"],           # < 3 tokens: no grams, no row
    })
    out = (duplicate_span_stats(ray.data.from_pandas(docs).repartition(3),
                                ngram=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out.doc_id) == [0, 1]
    assert list(out.n_grams) == [2, 2]
    assert list(out.n_dup) == [1, 1]          # only 'a b c' is shared
    np.testing.assert_allclose(out.dup_frac, [0.5, 0.5])
    # a gram repeated WITHIN one doc only does not count as duplicated
    docs2 = pd.DataFrame({"doc_id": np.array([7], dtype=np.int64),
                          "text": ["a b c a b c a b"]})
    out2 = duplicate_span_stats(ray.data.from_pandas(docs2)).to_pandas()
    assert int(out2.n_dup.iloc[0]) == 0
