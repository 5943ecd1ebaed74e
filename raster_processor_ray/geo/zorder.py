"""Z-order (Morton) space-filling-curve keys for tile write locality.

Reference analog: the reference writes rasters in (line, pixel) scan
order inside one granule (products.py's dense array layout); at
engine scale the analogous property — tiles near each other in SPACE
land near each other in STORAGE — comes from clustering output blocks
by a space-filling curve of the cell coordinates. Z-order keeps any
2^b x 2^b aligned square of cells in ONE contiguous key range, so a
bounding-box read touches O(perimeter) key ranges instead of O(area)
scattered rows — the standard spatial-layout trick (public: Morton
1966; used by every cloud warehouse's spatial clustering).

``zorder_key`` is vectorized bit-interleaving (one shift/mask pass per
bit, never per row); ``zorder_sql`` emits the bit-identical DuckDB
expression so the kernel is oracle-checkable. ``cluster_by_zorder`` is
the write-side helper: ONE global sort on the key (an explicit,
caller-opted all-to-all — locality clustering IS a sort) before a
partitioned write.
"""

from __future__ import annotations

import numpy as np


def zorder_key(ix: np.ndarray, iy: np.ndarray, bits: int = 16) -> np.ndarray:
    """Interleave the low ``bits`` of (ix, iy) -> int64 Morton key
    (ix bits at even positions, iy at odd). Inputs must be
    non-negative and < 2**bits."""
    ix = np.asarray(ix, dtype=np.int64)
    iy = np.asarray(iy, dtype=np.int64)
    z = np.zeros_like(ix)
    for i in range(bits):
        z |= ((ix >> i) & 1) << (2 * i)
        z |= ((iy >> i) & 1) << (2 * i + 1)
    return z


def zorder_sql(ix_expr: str, iy_expr: str, bits: int = 16) -> str:
    """DuckDB SQL computing ``zorder_key`` bit-identically: a sum of
    shifted single-bit terms (BIGINT ops only)."""
    terms = []
    for i in range(bits):
        terms.append(f"(((({ix_expr}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({iy_expr}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def add_zorder_column(ds, lat_col: str = "lat", lon_col: str = "lon",
                      res_deg: float = 1.0, *, out_col: str = "zkey",
                      bits: int = 16):
    """Append the Morton key of the (res_deg) grid cell each row falls
    in — same floor-binning as geo.cells.floor_cell."""
    import pyarrow as pa

    def add(b: pa.Table) -> pa.Table:
        lat = np.asarray(b[lat_col], dtype=np.float64)
        lon = np.asarray(b[lon_col], dtype=np.float64)
        iy = np.floor((lat + 90.0) / res_deg).astype(np.int64)
        ix = np.floor((lon + 180.0) / res_deg).astype(np.int64)
        return b.append_column(out_col, pa.array(zorder_key(ix, iy, bits)))

    return ds.map_batches(add, batch_format="pyarrow")


def cluster_by_zorder(ds, lat_col: str = "lat", lon_col: str = "lon",
                      res_deg: float = 1.0, *, bits: int = 16):
    """Sort the dataset by the Morton key of its grid cell (an explicit
    all-to-all; use ONCE, just before the partitioned write)."""
    return add_zorder_column(ds, lat_col, lon_col, res_deg,
                             bits=bits).sort("zkey")
