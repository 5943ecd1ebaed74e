"""String scalar functions (SURVEY.md §2.8): tile-name compose/parse.

The reference composes/parses SWOT tile names ``PPP_TTTS`` (pass number,
tile number, swath side; products.py:133-140, 1715). Generalized tile
naming for the engine's output partitions.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa


def compose_tile_name(pass_num: np.ndarray, tile_num: np.ndarray,
                      side: np.ndarray) -> pa.Array:
    """(pass, tile, side) -> 'PPP_TTTS' strings, vectorized."""
    p = np.char.zfill(np.asarray(pass_num).astype(str), 3)
    t = np.char.zfill(np.asarray(tile_num).astype(str), 3)
    s = np.asarray(side).astype(str)
    return pa.array(np.char.add(np.char.add(np.char.add(p, "_"), t), s).tolist())


_TILE_RE = re.compile(r"^(\d{3})_(\d{3})([LR])$")


def parse_tile_name(names) -> dict[str, np.ndarray]:
    """'PPP_TTTS' -> dict of pass_num/tile_num/side arrays; raises on bad."""
    ps, ts, ss = [], [], []
    for n in (names.to_pylist() if isinstance(names, (pa.Array, pa.ChunkedArray)) else names):
        m = _TILE_RE.match(n)
        if not m:
            raise ValueError(f"bad tile name {n!r}")
        ps.append(int(m.group(1)))
        ts.append(int(m.group(2)))
        ss.append(m.group(3))
    return {"pass_num": np.array(ps), "tile_num": np.array(ts),
            "side": np.array(ss, dtype=object)}


def tile_sort_key(names) -> np.ndarray:
    """The reference's side-then-name tile ordering (products.py:1713-1724):
    sort key = (side, pass, tile)."""
    d = parse_tile_name(names)
    side_rank = np.where(d["side"] == "L", 0, 1)
    return side_rank * 10**9 + d["pass_num"] * 10**3 + d["tile_num"]


def extract_int_field(col, pattern: str) -> "pa.Array":
    """Vectorized semi-structured field extraction: pull ONE integer
    capture group out of a string column with a single RE2 pass
    (``pc.extract_regex``) — e.g. ``'"k": (\\d+)'`` over a JSON-ish
    props column. Non-matching / null rows yield null. The DuckDB-parity
    twin is ``CAST(regexp_extract(col, pattern, 1) AS BIGINT)`` (both
    engines run RE2, so match semantics agree byte-for-byte)."""
    import pyarrow.compute as pc

    if "(?P<" not in pattern:
        # extract_regex needs a NAMED group; rewrite the first group
        pattern = pattern.replace("(", "(?P<v>", 1)
    m = pc.extract_regex(col, pattern)
    vals = pc.struct_field(m, [0])
    return pc.cast(vals, pa.int64())
