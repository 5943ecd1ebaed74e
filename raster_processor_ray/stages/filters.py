"""Row filters and qual-flag maps (SURVEY.md S2, M1, M2, M14).

All are vectorized pyarrow/numpy predicates inside ``map_batches`` (or
pushed into ``read_parquet(filter=...)`` when expressible) — never
``ds.filter(row_fn)`` per row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..aggregate.rasterize import summary_qual_from_bits


def class_geoloc_filter(batch: pa.Table, valid_classes, *, klass_col: str = "klass",
                        lat_col: str = "lat", lon_col: str = "lon") -> pa.Table:
    """Keep rows whose class is in ``valid_classes`` AND lat/lon non-null —
    the reference's load-time predicate (swot_pixc2raster.py:171-180) and
    ``get_mask`` (products.py:1818-1847)."""
    m = pc.is_in(batch[klass_col], value_set=pa.array(list(valid_classes),
                                                      type=batch[klass_col].type))
    m = pc.and_kleene(m, pc.is_valid(batch[lat_col]))
    m = pc.and_kleene(m, pc.is_valid(batch[lon_col]))
    return batch.filter(pc.fill_null(m, False))


def read_filter_expr(valid_classes, klass_col: str = "klass"):
    """Pushed-down parquet row filter for the same predicate."""
    import pyarrow.dataset as pads
    return pads.field(klass_col).isin(list(valid_classes)) & \
        pads.field("lat").is_valid() & pads.field("lon").is_valid()


def add_summary_qual(batch: pa.Table, qual_cols=("class_qual", "geo_qual"),
                     out_col: str = "summary_qual") -> pa.Table:
    """u32 bitmask columns -> 4-level summary enum column (max across the
    input masks) — reference get_summary_qual_flag (products.py:1787-1798)."""
    q = np.zeros(batch.num_rows, dtype=np.uint8)
    for c in qual_cols:
        col = batch[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ok = ~np.asarray(col.is_null())
        vals = np.asarray(col.fill_null(0)).astype(np.uint32)
        q = np.maximum(q, summary_qual_from_bits(vals * ok))
    return batch.append_column(out_col, pa.array(q))


def validity_flag_filter(batch: pa.Table, col: str, allowed_values) -> pa.Table:
    """Null-out values not in the allowed flag set (reference ice-flag
    validity mask, products.py:2124-2131) — values survive as nulls, rows
    are kept."""
    arr = batch[col]
    ok = pc.is_in(arr, value_set=pa.array(list(allowed_values), type=arr.type))
    masked = pc.if_else(pc.fill_null(ok, False), arr, pa.scalar(None, type=arr.type))
    return batch.set_column(batch.column_names.index(col), col, masked)


def line_gather(batch: pa.Table, line_values: np.ndarray, index_col: str,
                out_col: str) -> pa.Table:
    """Per-line -> per-point gather (reference M3: pixc_line_qual[line_index],
    products.py:1806-1807): broadcast small per-line array, ``np.take``."""
    idx = np.asarray(batch[index_col]).astype(np.int64)
    ok = (idx >= 0) & (idx < len(line_values))
    vals = np.take(line_values, np.clip(idx, 0, len(line_values) - 1))
    arr = pa.array(vals, mask=~ok) if not ok.all() else pa.array(vals)
    return batch.append_column(out_col, arr)
