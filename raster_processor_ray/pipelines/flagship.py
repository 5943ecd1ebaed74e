"""The flagship pipeline: pages -> geotag/cell-encode -> rasterize ->
resumable partitioned tiles.

This is the engine's analog of the reference's main CLI DAG
(swot_pixc2raster.py:160-195: load tile -> filter -> scene -> rasterize ->
write), re-expressed as ONE streaming Ray Data pipeline with one shuffle:

    read_parquet(pages, columns pruned)           # S1/S2
    -> map_batches(geotag_and_cell_encode)        # M4-M8 analog, zero-copy
    -> drop html/text before the wide stage       # wide binary never shuffles
    -> rasterize(): partials -> bucketed combine -> finalize   # A1-A13
    -> write_resumable(partition by bounded shard, manifests)  # S5 + lineage

``checkpoint_partials_dir`` persists the post-map pre-combine partial
aggregates so a killed run resumes mid-shuffle (north_rule; FIXTURES.md F6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..aggregate.rasterize import (combine_partials_df, finalize_cells,
                                   partial_aggregate_batch)
from ..config import AggConfig, DEFAULT_AGG
from ..geo.cells import GridSpec
from ..stages.geotag import GLOBAL_GEO_GRID, geotag_and_cell_encode
from ..state import lineage


def rasterize_pages(pages_ds, *, grid: GridSpec = GLOBAL_GEO_GRID,
                    cfg: AggConfig = DEFAULT_AGG, num_buckets: int = 64,
                    checkpoint_partials_dir: str | None = None,
                    resume: bool = False):
    """pages Dataset -> raster cells Dataset (lazy until consumed).

    Pages have no sample-measure columns, so the rasterizer reduces to the
    count/time/mode families; ``value`` is derived as text length (a
    deterministic per-page measure) so the mean/weighted layers are
    exercised end-to-end.
    """

    def prepare(batch: pa.Table) -> pa.Table:
        out = geotag_and_cell_encode(batch, grid=grid)
        text = out["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        import pyarrow.compute as pc
        nchars = pc.utf8_length(pc.fill_null(text, "")).cast(pa.float64())
        out = out.append_column("value", nchars)
        # project away wide payloads BEFORE the shuffle; keep ts for coverage
        keep = ["grid_cell", "value"]
        if "warc_ts" in out.column_names:
            ts = pc.cast(pc.cast(out["warc_ts"], pa.int64()), pa.float64())
            out = out.append_column("ts", pc.divide(ts, 1e6))
            keep.append("ts")
        return out.select(keep)

    prepared = pages_ds.map_batches(prepare, batch_format="pyarrow")
    partials = prepared.map_batches(
        lambda b: partial_aggregate_batch(b, cfg), batch_format="pyarrow")

    if checkpoint_partials_dir:
        if resume and lineage.finished_shards(checkpoint_partials_dir):
            partials = lineage.read_resumable(checkpoint_partials_dir)
        else:
            lineage.write_resumable(partials, checkpoint_partials_dir,
                                    key_col="grid_cell", num_shards=num_buckets)
            partials = lineage.read_resumable(checkpoint_partials_dir)

    def add_bucket(b: pa.Table) -> pa.Table:
        bucket = np.asarray(b["grid_cell"]).astype(np.int64) % num_buckets
        return b.append_column("_bucket", pa.array(bucket))

    def combine_bucket(df) -> pa.Table:
        out = combine_partials_df(df.drop(columns=["_bucket"]), cfg)
        return pa.Table.from_pandas(out, preserve_index=False)

    combined = (partials.map_batches(add_bucket, batch_format="pyarrow")
                .groupby("_bucket")
                .map_groups(combine_bucket, batch_format="pandas"))
    return combined.map_batches(
        lambda b: finalize_cells(b, grid, cfg), batch_format="pyarrow")


def run_flagship(pages_path_or_ds, out_dir: str, *, grid: GridSpec = GLOBAL_GEO_GRID,
                 cfg: AggConfig = DEFAULT_AGG, num_out_shards: int = 64,
                 checkpoint_partials_dir: str | None = None, resume: bool = False):
    """End-to-end: read -> rasterize -> resumable write. Returns manifests."""
    import ray.data as rd

    ds = (rd.read_parquet(pages_path_or_ds)
          if isinstance(pages_path_or_ds, (str, list)) else pages_path_or_ds)
    cells = rasterize_pages(ds, grid=grid, cfg=cfg,
                            checkpoint_partials_dir=checkpoint_partials_dir,
                            resume=resume)
    return lineage.write_resumable(cells, out_dir, key_col="tile_id",
                                   num_shards=num_out_shards,
                                   sort_cols=["tile_id", "iy", "ix"])
