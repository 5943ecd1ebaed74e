"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship pages->tiles pipeline on /root/testdata/sf0.001.
- ``queries()``: one callable per implemented operator family
  (SURVEY.md §2); each takes ``sf_dir`` and returns a Dataset /
  DataFrame / Table.
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible
  query (identical column names + value semantics; see
  raster_processor_ray/pipelines/queries.py for the determinism rules).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from raster_processor_ray.pipelines import queries as _q


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return _q.q_flagship_tiles("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
