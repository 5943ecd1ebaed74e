"""Deterministic 64-bit hashing and the url -> (lat, lon) geotag.

The reference pipeline consumes *geolocated* samples (latitude/longitude
columns of the pixel cloud, reference products.py:2004-2059). Web pages
carry no coordinates, so the engine derives a deterministic, stable
geotag from the url via explicit FNV-1a 64-bit arithmetic — NOT Python
``hash()`` (not stable across processes) — as required for reproducible
tile assignment at any cluster size.

All kernels are vectorized over Arrow string/binary arrays: the inner
loop is over *byte position* (max url length, ~tens), not over rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)
_U32 = float(2**32)


def _string_bytes_and_offsets(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy view of a pyarrow string/binary array's data + offsets."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    buffers = arr.buffers()
    # buffers: [validity, offsets, data]
    offsets = np.frombuffer(buffers[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8)
    return data, offsets


def fnv1a_64(strings: pa.Array | pa.ChunkedArray | list[str] | np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a 64-bit hash of each string/binary element.

    Returns uint64 array. Nulls hash to the offset basis (empty-string hash
    is also the basis XOR nothing — identical; callers mask nulls upstream).
    """
    if not isinstance(strings, (pa.Array, pa.ChunkedArray)):
        strings = pa.array(strings, type=pa.string())
    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    n = len(strings)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    data, offsets = _string_bytes_and_offsets(strings)
    lengths = offsets[1:] - offsets[:-1]
    starts = offsets[:-1]
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    max_len = int(lengths.max()) if n else 0
    # Iterate over byte position: ~O(max_len) vectorized passes.
    with np.errstate(over="ignore"):
        for p in range(max_len):
            active = lengths > p
            if not active.any():
                break
            idx = starts[active] + p
            b = data[idx].astype(np.uint64)
            h[active] = (h[active] ^ b) * FNV_PRIME
    return h


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — decorrelates low/high bits of a uint64."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


def geotag_from_hash(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Map uint64 hashes to (lat, lon) float64.

    lat from the low 32 bits -> [-90, 90); lon from the high 32 bits
    -> [-180, 180). Uniform over the plate-carree rectangle (matches the
    oracle used by tests; area-weighting is NOT applied — determinism and
    parity matter, not geographic realism).
    """
    lat = (h & np.uint64(0xFFFFFFFF)).astype(np.float64) / _U32 * 180.0 - 90.0
    lon = (h >> np.uint64(32)).astype(np.float64) / _U32 * 360.0 - 180.0
    return lat, lon


def geotag(urls: pa.Array | pa.ChunkedArray | list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic url -> (lat, lon). Stable across processes/versions."""
    return geotag_from_hash(fnv1a_64(urls))


def geotag_from_int(ids: np.ndarray, salt: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """SQL-expressible integer geotag (for DuckDB-oracle-checked queries).

    Uses plain modular arithmetic (no bit mixing) so the identical formula
    can be written in ANSI SQL:

        lat = ((id * 2654435761 + salt) % 18000000) / 100000.0 - 90.0
        lon = ((id * 2246822519 + salt) % 36000000) / 100000.0 - 180.0

    Exact in float64 (numerators < 2^53) -> bit-identical to DuckDB.
    """
    ids = ids.astype(np.int64)
    lat = ((ids * 2654435761 + salt) % 18000000).astype(np.float64) / 100000.0 - 90.0
    lon = ((ids * 2246822519 + salt) % 36000000).astype(np.float64) / 100000.0 - 180.0
    return lat, lon


GEOTAG_INT_SQL_LAT = "((({id}) * 2654435761 + {salt}) % 18000000) / 100000.0 - 90.0"
GEOTAG_INT_SQL_LON = "((({id}) * 2246822519 + {salt}) % 36000000) / 100000.0 - 180.0"
