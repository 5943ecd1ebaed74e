"""RDF-style ``key = value`` config parsing (SURVEY.md S6).

The reference parses RDF config files with per-line ``key = value`` pairs,
types values via ``ast.literal_eval``, and layers defaults
(``load_raster_configs``, reference src/bin/swot_pixc2raster.py:197-220;
defaults l2pixc_to_raster.py:34-110). Here: same parse semantics feeding
the engine's :class:`~raster_processor_ray.config.AggConfig` and
:class:`~raster_processor_ray.geo.cells.GridSpec`.
"""

from __future__ import annotations

import ast
import dataclasses

from ..config import AggConfig
from ..geo.cells import GridSpec


def parse_rdf(text: str) -> dict:
    """Parse ``key = value`` lines; values typed via literal_eval with
    string fallback; comments (#/!) and blank lines skipped."""
    out: dict = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith(("#", "!", ";")):
            continue
        if "=" not in line:
            raise ValueError(f"bad RDF line: {raw!r}")
        key, _, val = line.partition("=")
        key = key.strip()
        val = val.strip()
        try:
            out[key] = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            out[key] = val  # bare string
    return out


def load_configs(text: str, defaults: dict | None = None) -> tuple[AggConfig, GridSpec | None, dict]:
    """RDF text -> (AggConfig, optional GridSpec, leftover knobs).

    Keys matching dataclass fields are routed; unknown keys are returned
    for pipeline-specific use (the reference carries ~70 knobs the same
    way)."""
    cfg = dict(defaults or {})
    cfg.update(parse_rdf(text))
    agg_fields = {f.name for f in dataclasses.fields(AggConfig)}
    grid_fields = {f.name for f in dataclasses.fields(GridSpec)}
    agg_kwargs = {k: v for k, v in cfg.items() if k in agg_fields}
    grid_kwargs = {k: v for k, v in cfg.items() if k in grid_fields}
    leftover = {k: v for k, v in cfg.items()
                if k not in agg_fields and k not in grid_fields}
    if "klass_domain" in agg_kwargs and isinstance(agg_kwargs["klass_domain"], list):
        agg_kwargs["klass_domain"] = tuple(agg_kwargs["klass_domain"])
    grid = GridSpec(**grid_kwargs) if {"x_min", "y_min", "x_max", "y_max",
                                       "res"} <= set(grid_kwargs) else None
    return AggConfig(**agg_kwargs), grid, leftover
