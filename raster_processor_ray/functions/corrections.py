"""Named geophysical-correction and derived-coordinate kernels (SURVEY.md
M11 / M13 / O2) — the per-batch column arithmetic the reference applies
around aggregation, as vectorized numpy/Arrow helpers plus their
``map_batches`` wrappers.

- M11 ``apply_wse_corrections`` (raster_agg.py:149-152) and its inverse
  ``uncorrected_height`` (products.py:1212-1221);
- M13 derived ``range`` / ``line_index`` columns
  (products.py:2096-2099: range = near_range + range_index * spacing;
  line_index = azimuth_index within one tile);
- O2 ``median_central_index`` (products.py:1744-1748: the element whose
  value is the nearest-rank 50th percentile — the reference's
  central-tile attribute donor).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def apply_wse_corrections(height, geoid, solid_earth_tide, load_tide,
                          pole_tide):
    """wse = height - (geoid + solid_earth_tide + load_tide + pole_tide)
    (raster_agg.py:149-152). Null-safe: NaN in any correction propagates."""
    return (np.asarray(height, dtype=np.float64)
            - (np.asarray(geoid, dtype=np.float64)
               + np.asarray(solid_earth_tide, dtype=np.float64)
               + np.asarray(load_tide, dtype=np.float64)
               + np.asarray(pole_tide, dtype=np.float64)))


def uncorrected_height(wse, geoid, solid_earth_tide, load_tide, pole_tide):
    """Inverse of ``apply_wse_corrections`` (products.py:1212-1221)."""
    return (np.asarray(wse, dtype=np.float64)
            + (np.asarray(geoid, dtype=np.float64)
               + np.asarray(solid_earth_tide, dtype=np.float64)
               + np.asarray(load_tide, dtype=np.float64)
               + np.asarray(pole_tide, dtype=np.float64)))


def derived_range(near_range: float, range_index, slant_range_spacing: float):
    """range = near_range + range_index * nominal_slant_range_spacing
    (products.py:2096-2099)."""
    return near_range + (np.asarray(range_index, dtype=np.float64)
                         * slant_range_spacing)


def add_wse_column(ds, *, height_col: str = "height", geoid_col: str = "geoid",
                   set_col: str = "solid_earth_tide",
                   load_col: str = "load_tide", pole_col: str = "pole_tide",
                   out_col: str = "wse"):
    """map_batches wrapper: append the corrected WSE column (M11)."""

    def f(b: pa.Table) -> pa.Table:
        def g(c):
            col = b[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return np.asarray(col.cast(pa.float64()).fill_null(np.nan))

        wse = apply_wse_corrections(g(height_col), g(geoid_col), g(set_col),
                                    g(load_col), g(pole_col))
        return b.append_column(out_col, pa.array(wse))

    return ds.map_batches(f, batch_format="pyarrow")


def add_derived_range_line(ds, *, near_range: float,
                           slant_range_spacing: float,
                           range_index_col: str = "range_index",
                           azimuth_index_col: str = "azimuth_index"):
    """map_batches wrapper: append ``range`` + ``line_index`` (M13)."""

    def f(b: pa.Table) -> pa.Table:
        ri = np.asarray(b[range_index_col], dtype=np.float64)
        b = b.append_column(
            "range", pa.array(derived_range(near_range, ri,
                                            slant_range_spacing)))
        li = np.asarray(b[azimuth_index_col]).astype(np.int64)
        return b.append_column("line_index", pa.array(li))

    return ds.map_batches(f, batch_format="pyarrow")


def median_central_index(values) -> int:
    """Index of the element holding the nearest-rank median — the
    reference's central-tile selection (products.py:1744-1748:
    ``list.index(np.percentile(values, 50, interpolation='nearest'))``,
    i.e. the FIRST occurrence on ties)."""
    values = np.asarray(values)
    if len(values) == 0:
        raise ValueError("median_central_index of empty sequence")
    target = np.percentile(values, 50, method="nearest")
    return int(np.flatnonzero(values == target)[0])
