"""Deterministic synthetic ``samples`` table (FIXTURES.md F2) — the
pixel-cloud-semantics table that exercises every aggregator.

Column roles mirror ``ScenePixelCloud.VARIABLES`` (reference
products.py:2004-2059) reduced to what the aggregation kernels consume.
Every column gets ~7% seeded nulls so masked-aggregation semantics are
exercised; a slice of rows lands in one hot cell.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import config as C
from ..geo.hashing import splitmix64

_KLASSES = np.array(C.ALL_CLASSES, dtype=np.int64)


def _stream(idx: np.ndarray, salt: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return splitmix64(idx.astype(np.uint64) + np.uint64(salt) * np.uint64(0x9E3779B97F4A7C15))


def _u01(idx: np.ndarray, salt: int) -> np.ndarray:
    return _stream(idx, salt).astype(np.float64) / float(2**64)


def _null_mask(idx: np.ndarray, salt: int, frac: float = 0.07) -> np.ndarray:
    return _u01(idx, salt + 1000) < frac


def make_samples_batch(start: int, stop: int, *, hot_frac: float = 0.1,
                       null_frac: float = 0.07) -> pa.Table:
    """Rows [start, stop): deterministic samples with nulls + one hot cell."""
    idx = np.arange(start, stop, dtype=np.int64)
    n = len(idx)

    urls = np.char.add("https://s.example/d/", idx.astype(str))
    lat = _u01(idx, 1) * 10.0 - 5.0          # compact region -> dense cells
    lon = _u01(idx, 2) * 10.0 - 5.0
    hot = _u01(idx, 3) < hot_frac
    lat = np.where(hot, 1.2345, lat)
    lon = np.where(hot, 2.3456, lon)

    value = (_u01(idx, 4) * 100.0 - 20.0).astype(np.float32)
    # a sprinkle of out-of-valid-range values for the qual bit
    value = np.where(_u01(idx, 5) < 0.01, np.float32(20000.0), value)
    sigma = (0.1 + _u01(idx, 6) * 2.0).astype(np.float32)
    area = (10.0 + _u01(idx, 7) * 90.0).astype(np.float32)
    frac = (_u01(idx, 8) * 1.4 - 0.2).astype(np.float32)   # includes <0 and >1
    frac_uncert = (_u01(idx, 9) * 0.2).astype(np.float32)
    klass = _KLASSES[(_stream(idx, 10) % np.uint64(len(_KLASSES))).astype(np.int64)]

    r = _u01(idx, 11)
    class_qual = np.zeros(n, dtype=np.uint32)
    class_qual = np.where(r < 0.30, np.uint32(0x1), class_qual)       # suspect bit
    class_qual = np.where(r < 0.10, np.uint32(0x10000), class_qual)   # degraded bit
    class_qual = np.where(r < 0.02, np.uint32(0x1000000), class_qual) # bad bit
    r2 = _u01(idx, 12)
    geo_qual = np.zeros(n, dtype=np.uint32)
    geo_qual = np.where(r2 < 0.20, np.uint32(0x2), geo_qual)
    geo_qual = np.where(r2 < 0.05, np.uint32(0x20000), geo_qual)

    bright = _u01(idx, 13) < 0.05
    dark_flag = np.isin(klass, C.DARK_CLASSES)
    low_coh = _u01(idx, 14) < 0.05
    cross_track = ((_u01(idx, 15) - 0.5) * 140000.0).astype(np.float32)
    ts = 1.0e9 + _u01(idx, 16) * 3600.0
    ice_a = (_stream(idx, 17) % np.uint64(2)).astype(np.int64)
    ice_b = (_stream(idx, 18) % np.uint64(2)).astype(np.int64)

    def col(vals, salt, typ):
        mask = _null_mask(idx, salt, null_frac)
        return pa.array(np.asarray(vals), type=typ, mask=mask)

    return pa.table({
        "url": pa.array(urls.tolist(), type=pa.string()),
        "lat": pa.array(lat, type=pa.float64()),   # geoloc never null (filtered upstream)
        "lon": pa.array(lon, type=pa.float64()),
        "value": col(value, 21, pa.float32()),
        "sigma": col(sigma, 22, pa.float32()),
        "area": col(area, 23, pa.float32()),
        "frac": col(frac, 24, pa.float32()),
        "frac_uncert": col(frac_uncert, 25, pa.float32()),
        "klass": col(klass.astype(np.uint8), 26, pa.uint8()),
        "class_qual": col(class_qual, 27, pa.uint32()),
        "geo_qual": col(geo_qual, 28, pa.uint32()),
        "bright_land": col(bright, 29, pa.bool_()),
        "dark_flag": col(dark_flag, 30, pa.bool_()),
        "low_coh": col(low_coh, 31, pa.bool_()),
        "cross_track": col(cross_track, 32, pa.float32()),
        "ts": col(ts, 33, pa.float64()),
        "ice_a": col(ice_a.astype(np.uint8), 34, pa.uint8()),
        "ice_b": col(ice_b.astype(np.uint8), 35, pa.uint8()),
    })


def samples_dataset(num_rows: int, *, rows_per_block: int = 50_000):
    """The samples table as a lazy Ray Dataset (per-shard generation)."""
    import ray.data as rd

    starts = list(range(0, num_rows, rows_per_block))

    def gen(batch: pa.Table) -> pa.Table:
        s = int(batch["start"][0].as_py())
        return make_samples_batch(s, min(s + rows_per_block, num_rows))

    return (
        rd.from_items([{"start": s} for s in starts])
        .repartition(len(starts))
        .map_batches(gen, batch_format="pyarrow", batch_size=1)
    )
