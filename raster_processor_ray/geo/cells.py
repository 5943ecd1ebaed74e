"""Spatial cell indexes: S2-style quadtree cells, H3-like hex cells, and
raster tile binning with the reference's exact rounding semantics.

Three key schemes, all pure NumPy (no shapely/h3/GDAL in this environment):

1. ``s2ish_cell_id`` — 64-bit quadtree cell ids per the public S2 spec
   (lat/lon -> cube face -> quadratic (s,t) -> (i,j) -> Hilbert position).
   Hierarchical: the level-L id is a prefix of the level-30 id, so
   coarse/fine cells nest and range scans are locality-preserving.
2. ``h3ish_cell_id`` — an axial hexagonal binning at ~H3-res-7 scale on the
   equirectangular plane (H3-like API, not bit-compatible with real H3).
3. ``bin_to_grid`` — the raster tile binning that mirrors the reference's
   ``get_raster_mapping`` rule *exactly*:
   ``i = round((y - y_min)/res)``, ``j = round((x - x_min)/res)`` with NumPy
   half-to-even rounding and bounds mask (reference products.py:1143-1153
   UTM variant; products.py:1406-1421 geo variant incl. longitude wrap at
   1409-1414).

A fourth scheme, ``floor_cell``, is the SQL-expressible variant used by the
DuckDB-oracle-checked queries (DuckDB ``round()`` is half-away-from-zero,
NumPy is half-to-even; ``floor`` agrees bit-for-bit in both engines).

INTEROPERABILITY WARNING — these ids are ENGINE-INTERNAL, not exchangeable
with public S2/H3 tooling:

* ``s2ish_cell_id`` follows the public S2 *construction* (face, quadratic
  s/t projection, Hilbert curve) and its bit layout is
  ``[face:3][hilbert_pos:2L][1][trailing zeros]`` (MSB-first, level-L id =
  64-bit value with the marker bit after ``2L`` position bits), but the
  Hilbert orientation tables were re-derived from the spec and are NOT
  verified bit-for-bit against the reference S2 library. Ids are stable
  and hierarchical WITHIN this engine (prefix-nesting and range scans
  hold); do not feed them to s2geometry/BigQuery S2 functions or compare
  them with ids minted elsewhere.
* ``h3ish_cell_id`` is an axial hex binning on the equirectangular plane
  packed as ``((q + 2^20) << 21) | (r + 2^20)`` — an H3-*like* scheme at
  ~res-7 scale, with none of H3's icosahedral faces, pentagons, or id
  layout. It shares nothing with real H3 ids.

Cross-system workflows should export lat/lon (or the grid's
``iy``/``ix``) and re-encode with the target library.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MAX_LEVEL = 30
_FACE_BITS = 3
_POS_BITS = 2 * MAX_LEVEL + 1  # 61


# ---------------------------------------------------------------------------
# S2-style quadtree cells
# ---------------------------------------------------------------------------

def latlon_to_xyz(lat_deg: np.ndarray, lon_deg: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unit-sphere direction vector from geodetic lat/lon (degrees)."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lon), cos_lat * np.sin(lon), np.sin(lat)


def _xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    # negative-axis faces are face+3
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ufn, vfn) in enumerate([
        (lambda: y / x, lambda: z / x),        # face 0: +x
        (lambda: -x / y, lambda: z / y),       # face 1: +y
        (lambda: -x / z, lambda: -y / z),      # face 2: +z
        (lambda: z / x, lambda: y / x),        # face 3: -x
        (lambda: z / y, lambda: -x / y),       # face 4: -y
        (lambda: -y / z, lambda: -x / z),      # face 5: -z
    ]):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                uu, vv = ufn(), vfn()
            u[m] = uu[m]
            v[m] = vv[m]
    return face, u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2 quadratic projection: equalizes cell areas across a face."""
    with np.errstate(invalid="ignore"):
        # np.where evaluates both branches; |u| <= 1 on-face keeps both real,
        # but guard anyway for points exactly on a face boundary
        return np.where(u >= 0, 0.5 * np.sqrt(np.abs(1.0 + 3.0 * u)),
                        1.0 - 0.5 * np.sqrt(np.abs(1.0 - 3.0 * u)))


def _hilbert_xy2d(order: int, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Vectorized Hilbert curve (i, j) -> distance on a 2^order grid."""
    i = i.astype(np.int64).copy()
    j = j.astype(np.int64).copy()
    d = np.zeros_like(i)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((i & s) > 0).astype(np.int64)
        ry = ((j & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        i_f = np.where(flip, s - 1 - i, i)
        j_f = np.where(flip, s - 1 - j, j)
        i, j = np.where(swap, j_f, i_f), np.where(swap, i_f, j_f)
        s >>= 1
    return d


def s2ish_cell_id(lat_deg, lon_deg, level: int = 12) -> np.ndarray:
    """64-bit S2-style cell id at ``level`` (default 12, ~3-6 km edge).

    Layout matches S2: 3 face bits | Hilbert position | trailing 1-bit
    marking the level. Ids at coarser levels are prefixes of finer ones.
    """
    if not (0 < level <= MAX_LEVEL):
        raise ValueError(f"level must be in (0, {MAX_LEVEL}]")
    x, y, z = latlon_to_xyz(lat_deg, lon_deg)
    face, u, v = _xyz_to_face_uv(x, y, z)
    n = np.int64(1) << level
    i = np.clip((_uv_to_st(u) * n).astype(np.int64), 0, n - 1)
    j = np.clip((_uv_to_st(v) * n).astype(np.int64), 0, n - 1)
    d = _hilbert_xy2d(level, i, j)
    shift = np.uint64(2 * (MAX_LEVEL - level) + 1)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return ((face.astype(np.uint64) << np.uint64(_POS_BITS))
            | (d.astype(np.uint64) << shift) | lsb).astype(np.uint64)


def s2ish_parent(cell_id: np.ndarray, level: int) -> np.ndarray:
    """Parent cell id at a coarser level (prefix truncation, S2-style)."""
    cell_id = cell_id.astype(np.uint64)
    new_lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    with np.errstate(over="ignore"):
        return (cell_id & ~(new_lsb - np.uint64(1))) | new_lsb


# ---------------------------------------------------------------------------
# H3-like hex cells (axial grid on the equirectangular plane)
# ---------------------------------------------------------------------------

H3ISH_RES7_SIZE_DEG = 0.0125  # hex circumradius in degrees; area ~ H3 res 7


def h3ish_cell_id(lat_deg, lon_deg, size_deg: float = H3ISH_RES7_SIZE_DEG) -> np.ndarray:
    """Hexagonal cell id: pointy-top axial coords + cube rounding.

    H3-*like* (hex tiling, deterministic 64-bit ids), not bit-compatible
    with Uber H3 (which needs icosahedral projection; no h3 lib here).
    """
    x = np.asarray(lon_deg, dtype=np.float64)
    y = np.asarray(lat_deg, dtype=np.float64)
    q = (np.sqrt(3.0) / 3.0 * x - y / 3.0) / size_deg
    r = (2.0 / 3.0 * y) / size_deg
    # cube rounding
    s = -q - r
    rq, rr, rs = np.round(q), np.round(r), np.round(s)
    dq, dr, ds = np.abs(rq - q), np.abs(rr - r), np.abs(rs - s)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    rq = np.where(fix_q, -rr - rs, rq)
    rr = np.where(fix_r, -rq - rs, rr)
    qi = rq.astype(np.int64) + (1 << 20)
    ri = rr.astype(np.int64) + (1 << 20)
    return ((qi.astype(np.uint64) << np.uint64(21)) | ri.astype(np.uint64)).astype(np.uint64)


# ---------------------------------------------------------------------------
# Raster tile binning — reference-parity rule
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class GridSpec:
    """A raster grid, mirroring the reference's raster_params
    (x_min/x_max/y_min/y_max + resolution; raster_proc.py:567-652).

    ``tile_size`` groups grid cells into square tiles of that many cells
    per side; ``tile_id`` is the output-partitioning key.
    """

    x_min: float
    y_min: float
    x_max: float
    y_max: float
    res: float
    tile_size: int = 256
    wrap_lon: bool = False   # geo grids: wrap x into [x_min, x_min+360)
    projected: bool = False  # True: x/y are meters (UTM-style), cell area
    #                          is res^2; False: x/y are degrees, cell area
    #                          is the geodetic WGS84 patch area

    @property
    def size_x(self) -> int:
        return int(round((self.x_max - self.x_min) / self.res)) + 1

    @property
    def size_y(self) -> int:
        return int(round((self.y_max - self.y_min) / self.res)) + 1

    @property
    def tiles_x(self) -> int:
        return -(-self.size_x // self.tile_size)


def bin_to_grid(grid: GridSpec, x: np.ndarray, y: np.ndarray):
    """Assign points to grid cells with the reference's exact rule.

    ``i = round((y - y_min)/res)``, ``j = round((x - x_min)/res)`` using
    NumPy round (half-to-even), then bounds mask — reference
    products.py:1145-1146 (UTM) / 1406-1414 (geo, with lon wrap into the
    grid's longitude window before binning).

    Returns ``(iy, ix, valid)`` int64/int64/bool arrays. Out-of-bounds
    rows have ``valid=False`` (iy/ix are clipped, do not use them).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if grid.wrap_lon:
        # shift x into [x_min, x_min + 360) — analog of the reference's
        # wrapped-longitude handling (raster_crs.py:189-236)
        x = grid.x_min + np.mod(x - grid.x_min, 360.0)
    iy = np.round((y - grid.y_min) / grid.res).astype(np.int64)
    ix = np.round((x - grid.x_min) / grid.res).astype(np.int64)
    valid = (iy >= 0) & (iy < grid.size_y) & (ix >= 0) & (ix < grid.size_x)
    return np.clip(iy, 0, grid.size_y - 1), np.clip(ix, 0, grid.size_x - 1), valid


def grid_cell_key(grid: GridSpec, iy: np.ndarray, ix: np.ndarray) -> np.ndarray:
    """Flat int64 cell key ``iy * size_x + ix`` — the groupby-shuffle key."""
    return iy.astype(np.int64) * np.int64(grid.size_x) + ix.astype(np.int64)


def grid_tile_id(grid: GridSpec, iy: np.ndarray, ix: np.ndarray) -> np.ndarray:
    """Tile id (partitioning key): ``(iy // T) * tiles_x + (ix // T)``."""
    return (iy.astype(np.int64) // grid.tile_size) * np.int64(grid.tiles_x) + (
        ix.astype(np.int64) // grid.tile_size
    )


# ---------------------------------------------------------------------------
# Floor binning — SQL-expressible variant (DuckDB oracle parity)
# ---------------------------------------------------------------------------

def floor_cell(lat: np.ndarray, lon: np.ndarray, res_deg: float = 1.0) -> np.ndarray:
    """Global equirectangular cell: ``floor((lat+90)/res) * nx + floor((lon+180)/res)``.

    floor() is bit-identical between NumPy and DuckDB (unlike round:
    half-to-even vs half-away-from-zero), so this is the cell scheme used
    by every DuckDB-oracle-checked query. See ``floor_cell_sql``.
    """
    nx = np.int64(round(360.0 / res_deg))
    iy = np.floor((np.asarray(lat, np.float64) + 90.0) / res_deg).astype(np.int64)
    ix = np.floor((np.asarray(lon, np.float64) + 180.0) / res_deg).astype(np.int64)
    return iy * nx + ix


def floor_cell_sql(lat_expr: str, lon_expr: str, res_deg: float = 1.0) -> str:
    nx = int(round(360.0 / res_deg))
    return (
        f"(CAST(FLOOR((({lat_expr}) + 90.0) / {res_deg}) AS BIGINT) * {nx} "
        f"+ CAST(FLOOR((({lon_expr}) + 180.0) / {res_deg}) AS BIGINT))"
    )
