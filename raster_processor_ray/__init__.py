"""raster_processor_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch engine with the query/data-processing capabilities of the
SWOT Raster-Processor reference (geolocated samples binned onto raster
tiles with per-cell masked aggregation), generalized to Common-Crawl-style
web-page tables at 10^12-document design scale.

Architecture: every stage is a vectorized transform over a
``ray.data.Dataset`` (zero-copy Arrow batches via ``map_batches``);
stateful stages (point-in-polygon index, kNN index) are actor pools;
the single mandatory shuffle is the ``groupby(cell_id)`` rasterization,
fed by map-side partial aggregation so only per-(batch, cell) partials
cross the wire.
"""

__version__ = "0.1.0"
