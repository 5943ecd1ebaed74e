"""Scene assembly/union operators (SURVEY.md S3/S4/D2).

The reference merges tiles into scenes with ``ScenePixc.from_tiles`` /
``__add__`` (concatenate pixel clouds, rebase line indexes, dedup the TVP,
min/max-merge the scalar metadata; reference products.py:1582-1992,
2142-2157, 2216-2232). In the keyed Ray model the positional index rebase
disappears (rows join by key, not position): union = ``ds.union``, the
dimension-table dedup = keep-first by composite key, and the metadata
merge = a tiny partial-aggregate reduce.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.dedup import exact_dedup


def union_scenes(datasets: list):
    """Concatenate scene datasets (reference __add__ concatenation)."""
    if not datasets:
        raise ValueError("no datasets")
    out = datasets[0]
    for d in datasets[1:]:
        out = out.union(d)
    return out


def merge_scene_metadata(ds, *, ts_col: str = "ts", lat_col: str = "lat",
                         lon_col: str = "lon") -> dict:
    """Scene-level scalar attributes: time + geospatial coverage bounds
    (the reference's attribute min/max merge, products.py:1901-1992).
    Per-batch partials -> distributed fold (<=8192 partial rows per
    task) -> driver reduce over <= n_blocks/8192 rows; never a full
    collect, and driver memory stays bounded at any block count."""

    def part(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        def mm(col):
            if col not in b.column_names or b.num_rows == 0:
                return None, None
            return pc.min(b[col]).as_py(), pc.max(b[col]).as_py()

        t0, t1 = mm(ts_col)
        la0, la1 = mm(lat_col)
        lo0, lo1 = mm(lon_col)
        return pa.table({"t0": [t0], "t1": [t1], "lat0": [la0], "lat1": [la1],
                         "lon0": [lo0], "lon1": [lo1], "n": [b.num_rows]})

    def fold(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "t0": [pc.min(b["t0"]).as_py()], "t1": [pc.max(b["t1"]).as_py()],
            "lat0": [pc.min(b["lat0"]).as_py()],
            "lat1": [pc.max(b["lat1"]).as_py()],
            "lon0": [pc.min(b["lon0"]).as_py()],
            "lon1": [pc.max(b["lon1"]).as_py()],
            "n": [pc.sum(b["n"]).as_py()]})

    p = (ds.map_batches(part, batch_format="pyarrow")
         .map_batches(fold, batch_format="pyarrow", batch_size=8192)
         .to_pandas())
    return {
        "time_coverage_start": p.t0.min(), "time_coverage_end": p.t1.max(),
        "geospatial_lat_min": p.lat0.min(), "geospatial_lat_max": p.lat1.max(),
        "geospatial_lon_min": p.lon0.min(), "geospatial_lon_max": p.lon1.max(),
        "num_rows": int(p.n.sum()),
    }


def dedup_dimension(ds, key_cols: list[str]):
    """Composite-key keep-first dedup for small dimension tables — the
    TVP ``np.unique`` on (time, swath_side) analog (products.py:2216-2226).
    """
    if len(key_cols) == 1:
        return exact_dedup(ds, key_cols[0])

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        rep = df[key_cols[0]].astype(str)
        for k in key_cols[1:]:
            rep = rep + "\x1f" + df[k].astype(str)
        df["_ckey"] = rep
        return df

    out = exact_dedup(ds.map_batches(add_key, batch_format="pandas"), "_ckey",
                      key_cols)
    return out.map_batches(lambda df: df.drop(columns=["_ckey"]),
                           batch_format="pandas")


def zip_join(ds_a, ds_b, key: str, *, coalesce_cols: list[str] | None = None,
             suffix: str = "_b", num_buckets: int = 32):
    """Keyed replacement for the reference's POSITIONAL pixc<->pixcvec zip
    (products.py:2107-2118 relies on identical row order — forbidden at
    scale; SURVEY.md §4 'never rely on block order'). Joins by key, then
    applies the masked coalesce: for each name in ``coalesce_cols``, take
    the b-side value where non-null else the a-side (improved-geoloc
    coalesce semantics, products.py:2103-2118)."""
    from ..aggregate.relational import hash_join

    joined = hash_join(ds_a, ds_b, key, "left", num_buckets=num_buckets,
                       suffix=suffix)
    if not coalesce_cols:
        return joined

    def coalesce(df: pd.DataFrame) -> pd.DataFrame:
        for c in coalesce_cols:
            bcol = c + suffix
            if bcol in df.columns:
                df[c] = df[bcol].where(df[bcol].notna(), df[c])
                df = df.drop(columns=[bcol])
        return df

    return joined.map_batches(coalesce, batch_format="pandas")
