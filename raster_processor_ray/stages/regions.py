"""Raster -> vector: extract connected regions from occupied grid cells.

The inverse of the region-map burn (pipelines/region_map.py writes
vector labels INTO rasters; this reads regions OUT of one): occupied
cells are linked by 4-adjacency, labeled by distributed connected
components (stages/cc.py), and summarized into per-region vector
records (cell count, weight sum, bounding box). Reference analog: the
region maps the reference consumes are produced by exactly this kind of
polygonize step upstream (make_raster_region_maps.py takes region
rasters as INPUT; the reference never builds them — this closes the
raster<->vector loop).

Scale shape: the cell table is bounded by the GRID (occupied cells),
never by input rows — the caller aggregates points to cells first. Both
adjacency probes are bucketed hash joins of the cell table against
itself on an integer neighbor key (one shuffle each, no driver
materialization), the component step is the engine's bounded
large-star/small-star CC, and the final roll-up is one hash aggregate
per region. No longitude wrap: ix = nx-1 is NOT adjacent to ix = 0
(matches the SQL oracle; wrap-aware callers can union one extra seam
join keyed on iy).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def cell_adjacency_edges(cells_ds, *, cell_col: str = "cell",
                         ix_col: str = "ix", nx: int,
                         num_buckets: int = 32):
    """Occupied-cell table -> undirected 4-adjacency edge list (u, v):
    east (cell, cell+1 — same row only) and north (cell, cell+nx)
    neighbor probes, each one bucketed self-join that keeps a pair only
    when the neighbor cell is occupied."""
    from ..aggregate.relational import hash_join

    def key_only(b: pa.Table) -> pa.Table:
        return pa.table({"v": b[cell_col]})

    def probe_east(b: pa.Table) -> pa.Table:
        c = np.asarray(b[cell_col]).astype(np.int64)
        ix = np.asarray(b[ix_col]).astype(np.int64)
        keep = ix + 1 < nx                       # no wrap across the seam
        return pa.table({"u": pa.array(c[keep]), "v": pa.array(c[keep] + 1)})

    def probe_north(b: pa.Table) -> pa.Table:
        c = np.asarray(b[cell_col]).astype(np.int64)
        return pa.table({"u": pa.array(c), "v": pa.array(c + nx)})

    occupied = cells_ds.map_batches(key_only, batch_format="pyarrow")
    east = hash_join(cells_ds.map_batches(probe_east, batch_format="pyarrow"),
                     occupied, on="v", how="semi", num_buckets=num_buckets)
    north = hash_join(cells_ds.map_batches(probe_north, batch_format="pyarrow"),
                      occupied, on="v", how="semi", num_buckets=num_buckets)
    return east.union(north)


def extract_regions(cells_ds, *, cell_col: str = "cell", ix_col: str = "ix",
                    iy_col: str = "iy", nx: int, weight_col: str | None = None,
                    num_buckets: int = 32):
    """Occupied-cell table -> one vector record per connected region:
    ``region`` (= min cell id in the component, the CC labeling policy),
    ``n_cells``, optional ``n_<weight>`` sum, and the ix/iy bounding
    box. Isolated cells become their own single-cell region."""
    from ..aggregate.relational import hash_aggregate
    from .cc import attach_components, connected_components

    edges = cell_adjacency_edges(cells_ds, cell_col=cell_col, ix_col=ix_col,
                                 nx=nx, num_buckets=num_buckets)
    labels = connected_components(edges, u_col="u", v_col="v",
                                  num_buckets=num_buckets)
    labeled = attach_components(cells_ds, labels, id_col=cell_col,
                                num_buckets=num_buckets)
    spec = {
        "n_cells": (None, "count"),
        "ix_min": (ix_col, "min"), "ix_max": (ix_col, "max"),
        "iy_min": (iy_col, "min"), "iy_max": (iy_col, "max"),
    }
    if weight_col is not None:
        spec["n_" + weight_col] = (weight_col, "sum")
    out = hash_aggregate(labeled, "comp", spec, num_buckets=num_buckets)

    def rename(b: pa.Table) -> pa.Table:
        names = ["region" if c == "comp" else c for c in b.column_names]
        b = b.rename_columns(names)
        i = b.column_names.index("region")
        return b.set_column(i, "region", b["region"].cast(pa.int64()))

    return out.map_batches(rename, batch_format="pyarrow")
