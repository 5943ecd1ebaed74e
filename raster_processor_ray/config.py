"""Pipeline configuration — the analog of the reference's ~70-knob RDF
config (reference src/bin/swot_pixc2raster.py:197-220 parses key=value RDF;
defaults at l2pixc_to_raster.py:34-110). Here: a plain dataclass consumed
by the pipeline builders; method strings stay config-selectable
(reference raster_proc.py:73-75).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# classification domains — reference src/bin/swot_pixc2raster.py:17-21
INTERIOR_CLASSES = (4, 7)
WATER_EDGE_CLASSES = (3, 6)
LAND_EDGE_CLASSES = (2,)
DARK_CLASSES = (5, 23, 24)
ALL_WATER_CLASSES = INTERIOR_CLASSES + WATER_EDGE_CLASSES + DARK_CLASSES
ALL_CLASSES = INTERIOR_CLASSES + WATER_EDGE_CLASSES + LAND_EDGE_CLASSES + DARK_CLASSES

# 4-level summary quality enum — reference products.py:30-33
QUAL_GOOD, QUAL_SUSPECT, QUAL_DEGRADED, QUAL_BAD = 0, 1, 2, 3

# summary-output bit flags (engine's own compact layout, semantics per
# reference products.py:36-56 / raster_agg.py:304-514)
QUAL_BIT_SUSPECT = 1 << 0
QUAL_BIT_DEGRADED = 1 << 1
QUAL_BIT_BAD = 1 << 2
QUAL_BIT_BRIGHT_LAND = 1 << 3
QUAL_BIT_DARK_WATER = 1 << 4
QUAL_BIT_LOW_COHERENCE = 1 << 5
QUAL_BIT_FEW_PIXELS = 1 << 6
QUAL_BIT_NO_PIXELS = 1 << 7
QUAL_BIT_LARGE_UNCERT = 1 << 8
QUAL_BIT_FAR_RANGE = 1 << 9
QUAL_BIT_VALUE_OUT_OF_RANGE = 1 << 10

# input qual-bitmask condition masks (which input bits mean suspect /
# degraded / bad — analog of reference get_qual_mask, products.py:1800-1816)
SUSPECT_MASK = 0x0000_FFFF
DEGRADED_MASK = 0x00FF_0000
BAD_MASK = 0xFF00_0000


@dataclass(frozen=True)
class AggConfig:
    """Aggregation knobs (defaults mirror the reference's semantics)."""

    height_agg_method: str = "weight"       # 'weight' | 'simple'  (raster_proc.py:73)
    area_agg_method: str = "composite"      # 'composite' | 'simple' | 'water_fraction' (raster_agg.py:189)
    num_good_sus_pix_thresh: int = 1        # two-pass fallback (raster_proc.py:654-684)
    sigma_deweight_fill: float = 1.0e5      # height_std deweight fill (raster_agg.py:59-67)
    large_uncert_thresh: float = 10.0       # qual roll-up uncertainty threshold
    far_range_cross_track: float = 60000.0  # |cross_track| qual threshold
    value_valid_min: float = -1500.0        # products.py:278-291 wse bounds
    value_valid_max: float = 15000.0
    few_pix_thresh: int = 3                 # FEW_PIXELS qual bit threshold
    klass_domain: tuple[int, ...] = field(default=ALL_CLASSES)


DEFAULT_AGG = AggConfig()
