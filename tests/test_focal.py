"""Neighborhood raster ops (aggregate/focal.py): pyramid mass
conservation and halving, focal mean vs brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raster_processor_ray.aggregate.focal import focal_mean, tile_pyramid


@pytest.fixture()
def samples(ray_session):
    rng = np.random.default_rng(11)
    n = 2000
    df = pd.DataFrame({
        "lat": rng.uniform(-30, 30, n),
        "lon": rng.uniform(-60, 60, n),
        "v": rng.integers(1, 100, n),
    })
    return df, rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_pyramid_levels_conserve_mass(samples):
    df, ds = samples
    out = tile_pyramid(ds, "lat", "lon", "v", levels=4).to_pandas()
    for k in range(4):
        lv = out[out.level == k]
        assert lv.n.sum() == len(df), k
        assert lv.sum_v.sum() == df.v.sum(), k
    # level k+1 is exactly level k with halved indices
    for k in range(3):
        a = out[out.level == k].copy()
        a["iy"] = a.cy // 2
        a["ix"] = a.cx // 2
        folded = a.groupby(["iy", "ix"], as_index=False).agg(
            n=("n", "sum"), sum_v=("sum_v", "sum"))
        b = out[out.level == k + 1].rename(
            columns={"cy": "iy", "cx": "ix"})[["iy", "ix", "n", "sum_v"]]
        pd.testing.assert_frame_equal(
            folded.sort_values(["iy", "ix"], ignore_index=True),
            b.sort_values(["iy", "ix"], ignore_index=True))


def test_focal_mean_matches_bruteforce(samples):
    df, ds = samples
    out = focal_mean(ds, "lat", "lon", "v").to_pandas()
    base = pd.DataFrame({
        "iy": np.floor((df.lat + 90.0)).astype(np.int64),
        "ix": np.floor((df.lon + 180.0)).astype(np.int64),
    }).groupby(["iy", "ix"]).size().rename("n").reset_index()
    cells = {(r.iy, r.ix): r.n for r in base.itertuples()}
    assert len(out) == len(cells)
    got = out.set_index(["cy", "cx"])
    for (iy, ix), _ in cells.items():
        nbrs = [cells[(iy + a, ix + b)] for a in (-1, 0, 1)
                for b in (-1, 0, 1) if (iy + a, ix + b) in cells]
        row = got.loc[(iy, ix)]
        assert row.n_nbr == len(nbrs)
        assert row.sum_nbr == sum(nbrs)
        assert row.focal_mean == round(sum(nbrs) / len(nbrs), 6)


def test_resample_matches_bruteforce(samples):
    from raster_processor_ray.aggregate.focal import raster_resample_linear
    df, ds = samples
    out = raster_resample_linear(ds, "lat", "lon", "v", res_src=1.0,
                                 res_dst=1.5).to_pandas()
    # brute force: src cell counts, then tent weights at every dst cell
    iy = np.floor(df.lat + 90.0).astype(np.int64)
    ix = np.floor(df.lon + 180.0).astype(np.int64)
    base = pd.DataFrame({"iy": iy, "ix": ix}).groupby(
        ["iy", "ix"]).size().rename("n").reset_index()
    acc = {}
    for row in base.itertuples():
        for jy in range(int((row.iy - 2) // 1.5) - 1,
                        int((row.iy + 2) // 1.5) + 2):
            for jx in range(int((row.ix - 2) // 1.5) - 1,
                            int((row.ix + 2) // 1.5) + 2):
                dy = abs(row.iy - (1.5 * jy + 0.25))
                dx = abs(row.ix - (1.5 * jx + 0.25))
                if dy < 1.0 and dx < 1.0:
                    w = (1.0 - dy) * (1.0 - dx)
                    s = acc.setdefault((jy, jx), [0.0, 0.0])
                    s[0] += w * row.n
                    s[1] += w
    got = out.set_index(["jy", "jx"])["value"]
    assert len(got) == len(acc)
    for (jy, jx), (wv, w) in acc.items():
        assert got[(jy, jx)] == round(wv / w, 6), (jy, jx)


def test_resample_upsample_guard(samples):
    from raster_processor_ray.aggregate.focal import raster_resample_linear
    _, ds = samples
    import pytest as _pt
    with _pt.raises(ValueError, match="2/3"):
        raster_resample_linear(ds, "lat", "lon", "v", res_src=1.0,
                               res_dst=0.5)
