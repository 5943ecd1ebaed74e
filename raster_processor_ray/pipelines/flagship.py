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

import os

import numpy as np
import pyarrow as pa

from ..aggregate.rasterize import (combine_partials_table, finalize_cells,
                                   partial_aggregate_batch, rasterize)
from ..config import AggConfig, DEFAULT_AGG
from ..geo.cells import GridSpec, grid_tile_id
from ..stages.geotag import GLOBAL_GEO_GRID, geotag_and_cell_encode
from ..state import lineage


def rasterize_pages(pages_ds, *, grid: GridSpec = GLOBAL_GEO_GRID,
                    cfg: AggConfig = DEFAULT_AGG, num_buckets: int = 64,
                    checkpoint_partials_dir: str | None = None,
                    resume: bool = False,
                    input_fingerprint: str | None = None):
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
        # resume may skip recomputation ONLY when the run-level manifest
        # proves the checkpoint is complete AND belongs to this input;
        # otherwise write_resumable fills the missing shards (finished
        # ones are skipped) — a partially-written checkpoint never
        # silently loses the unwritten shards
        if not (resume and lineage.is_complete(
                checkpoint_partials_dir, input_fingerprint=input_fingerprint,
                num_shards=num_buckets)):
            lineage.write_resumable(partials, checkpoint_partials_dir,
                                    key_col="grid_cell", num_shards=num_buckets,
                                    input_fingerprint=input_fingerprint)
        partials = lineage.read_resumable(checkpoint_partials_dir)

    def add_bucket(b: pa.Table) -> pa.Table:
        bucket = np.asarray(b["grid_cell"]).astype(np.int64) % num_buckets
        return b.append_column("_bucket", pa.array(bucket))

    def combine_bucket(t: pa.Table) -> pa.Table:
        return combine_partials_table(t.drop_columns(["_bucket"]), cfg)

    from ..util import pin_for_shuffle

    combined = (pin_for_shuffle(partials.map_batches(add_bucket,
                                                     batch_format="pyarrow"))
                .groupby("_bucket")
                .map_groups(combine_bucket, batch_format="pyarrow"))
    return combined.map_batches(
        lambda b: finalize_cells(b, grid, cfg), batch_format="pyarrow")


def coverage_polygons():
    """The bench coverage layer: continent-scale boxes (~2/3 of the globe).
    Analog of the reference's swath-polygon mask (cells outside the swath
    polygon are flagged/dropped, raster_proc.py:916-939)."""
    from ..stages.pip import PolygonSpec

    boxes = [
        (1, "americas", -170.123, -58.456, -30.789, 72.345),
        (2, "europe_africa", -20.456, -36.789, 52.123, 71.456),
        (3, "asia", 52.345, -12.345, 150.456, 75.123),
        (4, "oceania", 110.123, -50.456, 180.0, 0.123),
        (5, "south_pacific", -180.0, -55.123, -80.456, 10.234),
    ]
    return [PolygonSpec(pid, name, np.array(
        [[x1, y1], [x2, y1], [x2, y2], [x1, y2]], dtype=np.float64))
        for pid, name, x1, y1, x2, y2 in boxes]


def bench_sites(n: int = 1000) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Deterministic site layer for the kNN stage (splitmix of site id)."""
    from ..geo.hashing import splitmix64

    ids = np.arange(n, dtype=np.int64)
    h = splitmix64(ids.astype(np.uint64))
    lat = (h & np.uint64(0xFFFFFFFF)).astype(np.float64) / 2**32 * 160.0 - 80.0
    lon = (h >> np.uint64(32)).astype(np.float64) / 2**32 * 360.0 - 180.0
    return ids, lat, lon


class EnrichPages:
    """FUSED enrichment actor — the flagship's per-page compute stage:

    - vectorized text quality features (Arrow C++ kernels: utf8 length,
      whitespace/punct counts -> quality score; no per-row Python)
    - FNV-1a geotag, S2-style cell id at LEVEL 30 (truncated to the
      output level via the hierarchical prefix property), hex cell
    - UTM zone/band + Krueger transverse-Mercator easting/northing
      (the reference's per-point UTM projection, products.py:1124-1135)
    - broadcast PIP coverage semi-join (swath-mask analog)
    - kNN: top-5 candidates by spherical dot product, refined with the
      EXACT WGS84 Vincenty geodesic distance -> nearest site + dist
      (coarse-then-iterative-refine, the reference's geoloc shape)

    Fused into one ``__call__`` because actor stages cannot fuse with
    neighbors in Ray Data: every stage boundary round-trips the whole
    dataset through the object store (writes are the scarce resource on
    this node). All kernels operate on per-batch numeric arrays (8k rows
    -> 64 KiB per column: cache-resident, write-light).
    """

    def __init__(self, grid: GridSpec, poly_ref, knn_ref, skew_frac: float = 0.05,
                 s2_level: int = 12, knn_refine: int = 5):
        import ray

        from ..stages.knn import KnnIndex
        from ..stages.pip import PolygonIndex

        self.grid = grid
        self.skew_frac = skew_frac
        self.s2_level = s2_level
        self.knn_refine = knn_refine
        self.pip: PolygonIndex = ray.get(poly_ref)
        self.knn: KnnIndex = ray.get(knn_ref)

    def _quality(self, batch: pa.Table) -> np.ndarray:
        """Arrow-kernel quality features (no Python loop over rows)."""
        import pyarrow.compute as pc

        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text, "")
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
        n_spaces = pc.count_substring(text, " ").to_numpy(zero_copy_only=False).astype(np.float64)
        n_punct = pc.count_substring_regex(text, r"[^\w\s]").to_numpy(
            zero_copy_only=False).astype(np.float64)
        n_words = n_spaces + 1.0
        mwl = np.where(n_words > 0, (n_chars - n_spaces) / n_words, 0.0)
        punct_ratio = np.where(n_chars > 0, n_punct / n_chars, 0.0)
        return (np.clip(n_words / 100.0, 0, 1) * 0.4
                + np.clip(mwl / 8.0, 0, 1) * 0.4
                + (1.0 - np.clip(punct_ratio * 4.0, 0, 1)) * 0.2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..geo import cells as C
        from ..geo import utm
        from ..geo.cells import s2ish_parent
        from ..geo.geodesic import vincenty_m
        from ..sources.pages import pages_geotag

        quality = self._quality(batch)
        lat, lon = pages_geotag(batch["url"], skew_frac=self.skew_frac)
        # S2 at max level, truncated (hierarchical prefix property)
        s2 = s2ish_parent(C.s2ish_cell_id(lat, lon, 30), self.s2_level)
        hexc = C.h3ish_cell_id(lat, lon)
        easting, northing, zone = utm.latlon_to_utm(lat, lon)
        iy, ix, ok = C.bin_to_grid(self.grid, lon, lat)
        grid_cell = np.where(ok, C.grid_cell_key(self.grid, iy, ix), -1)
        inside = self.pip.contains_any(lat, lon)          # coverage semi-join
        keep = inside & ok
        ts = pc.divide(pc.cast(pc.cast(batch["warc_ts"], pa.int64()),
                               pa.float64()), 1e6)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        out = pa.table({
            "grid_cell": pa.array(grid_cell, type=pa.int64()),
            "cell_id": pa.array(s2, type=pa.uint64()),
            "hex_cell": pa.array(hexc, type=pa.uint64()),
            "easting": pa.array(easting),
            "northing": pa.array(northing),
            "utm_zone": pa.array(zone.astype(np.int16), type=pa.int16()),
            "value": pa.array(quality),
            "ts": ts,
        })
        out = out.filter(pa.array(keep))
        la, lo = lat[keep], lon[keep]
        # candidates by spherical dot product, exact geodesic refinement
        cand, _ = self.knn.query(la, lo, self.knn_refine)
        dists = np.stack([
            vincenty_m(la, lo, self.knn.lats[cand[:, j]], self.knn.lons[cand[:, j]])
            for j in range(cand.shape[1])], axis=1)
        best = dists.argmin(axis=1)
        rows = np.arange(len(la))
        out = out.append_column(
            "site_id", pa.array(self.knn.site_ids[cand[rows, best]]))
        return out.append_column("site_dist_m", pa.array(dists[rows, best]))


_ENRICH_CACHE: dict = {}

ZONAL_SITE_BITS = 20


def pack_cell_site(cells: np.ndarray, sites: np.ndarray) -> np.ndarray:
    """Pack (grid_cell, site_id) into one int64 key: cell * 2^20 + site.

    The pack is only injective for 0 <= site_id < 2^20; a larger (or
    negative) id would silently corrupt the CELL part of neighbouring
    keys, so the range is enforced here (site tables needing wider ids
    should carry (cell, site) as two columns instead of packing)."""
    sites = np.asarray(sites, dtype=np.int64)
    if len(sites):
        smin, smax = sites.min(), sites.max()
        if smin < 0 or smax >= (1 << ZONAL_SITE_BITS):
            raise ValueError(
                f"site_id out of packable range [0, 2^{ZONAL_SITE_BITS}): "
                f"min={smin} max={smax}; widen to a two-column zonal key")
    return np.asarray(cells, dtype=np.int64) * np.int64(1 << ZONAL_SITE_BITS) + sites


def unpack_zonal_lists(t: pa.Table):
    """Flatten the packed per-row (site_ids, site_cnts) list columns into
    aligned flat (cell, site, count) arrays.

    Uses ``flatten()``, NOT ``.values``: a ListArray whose offsets start
    at k>0 (enrich emits one whenever partials skip leading pair keys,
    e.g. out-of-grid -1 cells) or a sliced group block leaves k stale
    leading elements in ``.values``, misaligning cells against sites.
    ``flatten()`` honours the array offset and offsets[0]; np.diff of the
    offsets gives per-row lengths consistent with it."""
    sids = t["site_ids"]
    if isinstance(sids, pa.ChunkedArray):
        sids = sids.combine_chunks()
    scnts = t["site_cnts"]
    if isinstance(scnts, pa.ChunkedArray):
        scnts = scnts.combine_chunks()
    row_cells = np.asarray(t["grid_cell"], dtype=np.int64)
    lens = np.diff(np.asarray(sids.offsets, dtype=np.int64))
    flat_cells = np.repeat(row_cells, lens)
    flat_sites = np.asarray(sids.flatten(), dtype=np.int64)
    flat_cnts = np.asarray(scnts.flatten(), dtype=np.int64)
    return flat_cells, flat_sites, flat_cnts


def _cached_enricher(grid: GridSpec, poly_ref, knn_ref, knn_refine: int):
    """Per-worker-process cached EnrichPages (task-fusion form).

    The actor-pool form is the canonical idiom, but an actor stage cannot
    fuse with the upstream ReadParquet operator — every decompressed
    input block then round-trips the object store, and plasma WRITES are
    the scarce resource on this node. Running enrichment as stateless
    tasks with the index state cached in a process global keeps the
    amortize-once property (ray.get of the broadcast indexes happens once
    per worker process) while letting Ray fuse read->enrich into one
    operator: input blocks never hit the store.
    """
    key = (poly_ref, knn_ref, grid, knn_refine)
    enr = _ENRICH_CACHE.get(key)
    if enr is None:
        enr = EnrichPages(grid, poly_ref, knn_ref, knn_refine=knn_refine)
        _ENRICH_CACHE.clear()
        _ENRICH_CACHE[key] = enr
    return enr


class _TreeFold:
    """Streaming multi-level tree fan-in over Ray object refs for ONE
    shard: level i buffers at most ``fanin`` refs; when full they fold
    into one ref at level i+1 via the supplied remote. Driver-held refs
    for a shard stay <= fanin * ceil(log_fanin(B)) no matter how many
    leaf parts (B) stream in — the scale fix for the old driver-resident
    B x S fan-out (reference analog: the chunks-per-worker heuristic it
    replaces, raster_proc.py:713-716)."""

    def __init__(self, fold_remote, shard: int, fanin: int):
        if fanin < 2:
            raise ValueError("fanin must be >= 2")
        self.fold = fold_remote
        self.shard = shard
        self.fanin = fanin
        self.levels: list[list] = [[]]
        self.max_refs = 0          # peak driver-held refs (for tests)

    def push(self, ref, lvl: int = 0) -> None:
        while len(self.levels) <= lvl:
            self.levels.append([])
        level = self.levels[lvl]
        level.append(ref)
        self.max_refs = max(self.max_refs,
                            sum(len(x) for x in self.levels))
        if len(level) >= self.fanin:
            folded = self.fold.remote(self.shard, *level)
            level.clear()
            self.push(folded, lvl + 1)

    def drain(self) -> list:
        """Remaining refs across all levels (<= fanin per level)."""
        return [r for level in self.levels for r in level]


def run_flagship_full(pages_path_or_ds, out_dir: str, *,
                      grid: GridSpec = GLOBAL_GEO_GRID,
                      cfg: AggConfig = DEFAULT_AGG, num_out_shards: int = 64,
                      read_blocks: int | None = None, knn_sites: int = 1000,
                      knn_refine: int = 12, enrich_concurrency: int | None = None,
                      enrich_batch_size: int | None = None,
                      enrich_chunk_rows: int = 8192, fold_fanin: int = 16):
    # NOTE on enrich_concurrency: a concurrency cap turns the enrich
    # map_batches into its own operator — Ray will NOT fuse it with
    # ReadParquet, so every decompressed input block round-trips the
    # object store. Leave it None (default) unless a stage downstream
    # genuinely starves; the streaming executor balances uncapped tasks.
    """The full spatial-join + tiling pipeline (the north-star DAG):

        read(pruned) -> fused enrich tasks (vectorized quality features,
           geotag + S2-30/hex/UTM/grid encodes, broadcast PIP coverage
           mask, kNN with exact geodesic refinement; index state cached
           once per worker process)
           ... fused with BOTH map-side partial families (rasterize
           partials + per-(cell, site) zonal counts) in the SAME pass —
           the full enriched page stream is never materialized
        -> ONE bounded exchange keyed on OUTPUT SHARD (tile % num_shards):
           split tasks launched as enrich blocks stream out (raw Ray
           tasks — the shard count is a small fixed constant, so no
           sort-based all-to-all; see the end-game comment below)
        -> per-shard combine + finalize (cells + dominant-site argmax)
           + BOTH resumable shard writes inside the same shard task —
           no post-finalize exchange or materialize barrier exists

    Returns (tiles_manifest, zonal_manifest).
    """
    import pandas as pd
    import ray
    import ray.data as rd

    from ..stages.knn import KnnIndex
    from ..stages.pip import PolygonIndex

    if isinstance(pages_path_or_ds, (str, list)):
        kw = {"override_num_blocks": read_blocks} if read_blocks else {}
        ds = rd.read_parquet(pages_path_or_ds,
                             columns=["url", "warc_ts", "text"], **kw)
    else:
        ds = pages_path_or_ds

    poly_ref = ray.put(PolygonIndex(coverage_polygons()))
    ids, slat, slon = bench_sites(knn_sites)
    knn_ref = ray.put(KnnIndex(ids, slat, slon))
    num_buckets = num_out_shards

    def enrich_partials(batch: pa.Table) -> pa.Table:
        """Enrich + BOTH partial families in one pass over the stream:
        one row per distinct cell carrying the rasterize partials PLUS
        the cell's (site, count) zonal partial packed as two LIST
        columns. Packing keeps the shuffle narrow — a row-union of the
        two families would ship full-width data buffers (mostly fill)
        for every zonal row.

        Enrichment runs over SMALL internal chunks (cache-resident
        columns for the kNN matmul) but partials are computed once over
        the LARGE outer batch: partial-row count per batch is bounded by
        the distinct cells it touches, so small partial batches would
        emit ~one row per input row — many times the shuffle bytes at
        the bench's cell density (measured)."""
        enricher = _cached_enricher(grid, poly_ref, knn_ref, knn_refine)
        parts = [enricher(batch.slice(off, enrich_chunk_rows))
                 for off in range(0, batch.num_rows, enrich_chunk_rows)]
        e = pa.concat_tables(parts) if len(parts) > 1 else parts[0]
        p = partial_aggregate_batch(e.select(["grid_cell", "value", "ts"]), cfg)
        # zonal (cell, site) counts in pure numpy: one packed-key
        # np.unique; the unique keys come back sorted by (cell, site),
        # aligned with p's np.unique-sorted cell order
        zcell = np.asarray(e["grid_cell"]).astype(np.int64)
        zsite = np.asarray(e["site_id"]).astype(np.int64)
        packed = pack_cell_site(zcell, zsite)
        uniq, cnt = np.unique(packed, return_counts=True)
        pair_cells = (uniq >> np.int64(ZONAL_SITE_BITS))
        p_cells = np.asarray(p["grid_cell"], dtype=np.int64)
        offsets = np.concatenate([
            np.searchsorted(pair_cells, p_cells, side="left"),
            [len(pair_cells)]]).astype(np.int32)
        # int32 list children: site_id < 2^20 (pack guard) and per-batch
        # counts < batch rows < 2^31 — halves the zonal bytes in the
        # one shuffle (unpack_zonal_lists widens back to int64)
        out = p.append_column("site_ids", pa.ListArray.from_arrays(
            pa.array(offsets),
            pa.array((uniq & np.int64((1 << ZONAL_SITE_BITS) - 1))
                     .astype(np.int32))))
        out = out.append_column("site_cnts", pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(cnt.astype(np.int32))))
        # shuffle key = OUTPUT SHARD (tile % num_shards): one all-to-all
        # carries the stream from partials to finished files. Tiles bound
        # cells (tile_size^2 each), so shard sizes stay balanced.
        p_tiles = grid_tile_id(grid, p_cells // grid.size_x,
                               p_cells % grid.size_x)
        out = out.append_column("_bucket", pa.array(p_tiles % num_buckets))
        if len(done_arr):
            # resume: partials for already-written shards never enter
            # the shuffle (enrichment for them still runs — the page
            # stream can't know its tile before geotag)
            out = out.filter(
                pa.array(~np.isin(p_tiles % num_buckets, done_arr)))
        return out

    # ONE all-to-all end-game: the shuffle key is tile % num_shards (not
    # raw cell % B), so each combine group IS an output shard — finalize
    # and BOTH resumable writes run inside the same task that owns the
    # group. This removes the two post-finalize write shuffles and the
    # cells materialize barrier that were a non-scaling wall-time
    # constant (they cost the same ~seconds at every CPU count). Shard
    # assignment for tiles is unchanged (tile_id % num_shards); the
    # zonal output is now sharded by TILE of the cell rather than raw
    # cell id — layout only, the data is identical.
    tiles_dir = os.path.join(out_dir, "tiles")
    zonal_dir = os.path.join(out_dir, "dominant_site")
    done = (lineage.prepare_resumable(tiles_dir, key_col="tile_id",
                                      num_shards=num_out_shards)
            & lineage.prepare_resumable(zonal_dir, key_col="grid_cell",
                                        num_shards=num_out_shards))
    done_arr = np.array(sorted(done), dtype=np.int64)

    def combine_finalize_write(shard: int, t: pa.Table) -> dict:
        raster = t.drop_columns(["_bucket", "site_ids", "site_cnts"])
        combined = combine_partials_table(raster, cfg)
        fin = finalize_cells(combined, grid, cfg).to_pandas()
        # dominant site: flatten the packed lists, re-sum per (cell, site)
        # (a cell spans many partial rows), argmax with tie -> smallest id
        flat_cells, flat_sites, flat_cnts = unpack_zonal_lists(t)
        packed = pack_cell_site(flat_cells, flat_sites)
        uniq, inv = np.unique(packed, return_inverse=True)
        sums = np.bincount(inv, weights=flat_cnts.astype(np.float64))
        ucells = uniq >> np.int64(ZONAL_SITE_BITS)
        usites = (uniq & np.int64((1 << ZONAL_SITE_BITS) - 1))
        # per cell argmax: sort by (cell, -count, site); uniq is already
        # sorted by (cell, site) so a stable lexsort on -count suffices
        order = np.lexsort((usites, -sums, ucells))
        first = np.flatnonzero(np.r_[True, ucells[order][1:] != ucells[order][:-1]])
        sel = order[first]
        top = pd.DataFrame({"grid_cell": ucells[sel],
                            "mode_label": usites[sel],
                            "mode_count": sums[sel].astype(np.int64)})
        fin = fin.merge(top, on="grid_cell", how="left", sort=False)
        tm = lineage.write_shard_table(fin, tiles_dir, shard,
                                       key_col="tile_id",
                                       sort_cols=["tile_id", "iy", "ix"])
        zm = lineage.write_shard_table(
            fin[["grid_cell", "mode_label", "mode_count"]], zonal_dir, shard,
            key_col="grid_cell", sort_cols=["grid_cell"])
        return {
            "shard": shard,
            "tiles_rows": tm["rows"], "tiles_bytes": tm["bytes"],
            "tiles_key_hash": tm["key_hash"],
            "zonal_rows": zm["rows"], "zonal_bytes": zm["bytes"],
            "zonal_key_hash": zm["key_hash"],
        }

    partials = ds.map_batches(
        enrich_partials, batch_format="pyarrow",
        batch_size=enrich_batch_size,  # None = whole block:
        # fewest partial rows per shuffle (cells repeat
        # across batches, so bigger batches combine more)
        **({"concurrency": enrich_concurrency}
           if enrich_concurrency else {}))

    # MANUAL bounded exchange (raw Ray tasks) instead of
    # groupby("_bucket").map_groups(...): the shard count is a SMALL
    # FIXED constant, so the sort-based all-to-all is semantically
    # unnecessary — and its sampling + per-block sort + range-partition
    # machinery is a measured ~5 s NON-SCALING constant (same wall cost
    # at every CPU count; it was the term capping N->4N scaling
    # efficiency — see BASELINE.md round 3). Split tasks launch as
    # enrich blocks STREAM out of the executor (the exchange overlaps
    # enrichment; no materialize barrier, and the lazy enrich chain runs
    # exactly once — the double-execution pin_for_shuffle guards against
    # only exists for sort-sampled shuffles). One combine task per shard
    # then finalizes + writes both outputs. Object count is
    # B blocks x S shards of small partial slices; at very large B
    # (>10^4 blocks per run) add a tree fan-in per shard ahead of the
    # combine — at 100-TB scale B is bounded by blocks-per-RUN, and runs
    # are already partitioned by the resumable manifest.
    nb = int(num_buckets)

    @ray.remote(num_returns=nb)
    def split_block(t):
        if not isinstance(t, pa.Table):
            # blocks skipped past the UDF keep their source format
            # (e.g. pandas for from_pandas inputs)
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_rows == 0 or "_bucket" not in t.column_names:
            # Ray passes EMPTY input blocks through map_batches without
            # calling the UDF — they arrive here with the raw page schema
            empty = t.slice(0, 0)
            return [empty] * nb if nb > 1 else empty
        b = np.asarray(t["_bucket"])
        order = np.argsort(b, kind="stable")
        ts = t.take(pa.array(order))
        bounds = np.searchsorted(b[order], np.arange(nb + 1))
        parts = [ts.slice(bounds[s], bounds[s + 1] - bounds[s])
                 for s in range(nb)]
        return parts if nb > 1 else parts[0]

    @ray.remote
    def combine_shard(shard: int, *parts):
        tabs = [p for p in parts if p.num_rows]
        if not tabs:
            return None
        return combine_finalize_write(
            shard, pa.concat_tables(tabs, promote_options="permissive"))

    @ray.remote
    def fold_parts(shard: int, *parts):
        """Tree fan-in step: CONCAT + COMBINE a group of a shard's partial
        slices into one bounded partial table. The raster partials re-sum
        per cell (associative, same columns) and the zonal (cell, site)
        list pairs re-sum per pair, so a fold's output is bounded by the
        shard's distinct cell count — it does NOT grow with how many leaf
        blocks fed it. int64 list children here (leaf lists are int32,
        bounded per-batch; fold sums have no such bound)."""
        tabs = [p for p in parts if p.num_rows]
        if not tabs:
            return parts[0].slice(0, 0)
        t = pa.concat_tables(tabs, promote_options="permissive")
        combined = combine_partials_table(
            t.drop_columns(["_bucket", "site_ids", "site_cnts"]), cfg)
        flat_cells, flat_sites, flat_cnts = unpack_zonal_lists(t)
        packed = pack_cell_site(flat_cells, flat_sites)
        uniq, inv = np.unique(packed, return_inverse=True)
        sums = np.bincount(inv, weights=flat_cnts.astype(np.float64))
        pair_cells = uniq >> np.int64(ZONAL_SITE_BITS)
        # combine_partials_table sorts cells ascending — same order as
        # np.unique, so the leaf searchsorted alignment applies unchanged
        p_cells = np.asarray(combined["grid_cell"], dtype=np.int64)
        offsets = np.concatenate([
            np.searchsorted(pair_cells, p_cells, side="left"),
            [len(pair_cells)]]).astype(np.int32)
        out = combined
        out = out.append_column("site_ids", pa.ListArray.from_arrays(
            pa.array(offsets),
            pa.array((uniq & np.int64((1 << ZONAL_SITE_BITS) - 1))
                     .astype(np.int64))))
        out = out.append_column("site_cnts", pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(sums.astype(np.int64))))
        return out.append_column(
            "_bucket", pa.array(np.full(out.num_rows, shard, dtype=np.int64)))

    # STREAMING TREE FAN-IN per shard (the "very large B" note above,
    # now implemented): leaf part refs fold in groups of ``fold_fanin``
    # as they arrive, folded refs fold again at the next level, so the
    # driver holds O(S * fanin * log_fanin(B)) refs instead of B x S,
    # and each combine task receives a capped argument list whose tables
    # are already per-cell-combined — not B raw slices.
    folds = [_TreeFold(fold_parts, s, fold_fanin) for s in range(nb)]
    for bundle in partials.iter_internal_ref_bundles():
        for block_ref in bundle.block_refs:
            refs = split_block.remote(block_ref)
            for s, r in enumerate(refs if nb > 1 else [refs]):
                folds[s].push(r)
    combine_tasks = []
    for s in range(nb):
        rest = folds[s].drain()
        if rest:
            combine_tasks.append(combine_shard.remote(s, *rest))
    rows = [r for r in ray.get(combine_tasks) if r is not None]
    written = sorted(set(int(r["shard"]) for r in rows) | set(done))
    lineage.complete_run(tiles_dir, key_col="tile_id",
                         num_shards=num_out_shards, shards=written)
    lineage.complete_run(zonal_dir, key_col="grid_cell",
                         num_shards=num_out_shards, shards=written)
    mcols = ["shard", "tiles_rows", "tiles_bytes", "tiles_key_hash",
             "zonal_rows", "zonal_bytes", "zonal_key_hash"]
    m = (pd.DataFrame(rows, columns=mcols) if rows
         else pd.DataFrame(columns=mcols))
    tiles_manifest = m[["shard", "tiles_rows", "tiles_bytes",
                        "tiles_key_hash"]].rename(columns={
        "tiles_rows": "rows", "tiles_bytes": "bytes",
        "tiles_key_hash": "key_hash"})
    zonal_manifest = m[["shard", "zonal_rows", "zonal_bytes",
                        "zonal_key_hash"]].rename(columns={
        "zonal_rows": "rows", "zonal_bytes": "bytes",
        "zonal_key_hash": "key_hash"})
    return tiles_manifest, zonal_manifest


def run_flagship(pages_path_or_ds, out_dir: str, *, grid: GridSpec = GLOBAL_GEO_GRID,
                 cfg: AggConfig = DEFAULT_AGG, num_out_shards: int = 64,
                 checkpoint_partials_dir: str | None = None, resume: bool = False,
                 read_blocks: int | None = None):
    """End-to-end: read -> rasterize -> resumable write. Returns manifests.

    ``read_blocks``: override the read parallelism. Ray's default block
    heuristic (~200 tiny blocks) makes the combine Sort ~2.5x slower than
    ~2 blocks per CPU on this workload — small blocks multiply shuffle
    metadata, and partial aggregation compresses better per large block.
    """
    import ray.data as rd

    fingerprint = None
    if isinstance(pages_path_or_ds, (str, list)):
        kw = {"override_num_blocks": read_blocks} if read_blocks else {}
        # prune at the read: the rasterization consumes only these three
        # columns — html (the widest column by far) never leaves storage
        ds = rd.read_parquet(pages_path_or_ds,
                             columns=["url", "warc_ts", "text"], **kw)
        fingerprint = lineage.input_fingerprint_from_paths(pages_path_or_ds)
    else:
        ds = pages_path_or_ds
    cells = rasterize_pages(ds, grid=grid, cfg=cfg,
                            checkpoint_partials_dir=checkpoint_partials_dir,
                            resume=resume, input_fingerprint=fingerprint)
    return lineage.write_resumable(cells, out_dir, key_col="tile_id",
                                   num_shards=num_out_shards,
                                   sort_cols=["tile_id", "iy", "ix"])
