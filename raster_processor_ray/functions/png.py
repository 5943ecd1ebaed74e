"""Pure-stdlib PNG codec (zlib inflate + NumPy scanline unfilter).

No image library exists in this environment, but PNG needs none: the
container format is length-prefixed chunks, the pixel stream is zlib
(stdlib), and the five scanline filters are byte arithmetic — so the
decode step of the multimodal pipeline (stages/media.py) can be REAL
for PNG payloads instead of a stub. Public-spec implementation
(PNG is ISO/IEC 15948; filter algorithms from the spec's section 9).

Supported: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), non-interlaced. Anything else raises
:class:`PngError` (callers fall back to their non-PNG path).

The encoder exists for tests and synthetic corpora: deterministic
output (fixed zlib level, caller-chosen per-row filter) so fixtures
are byte-stable.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    """Not a decodable PNG (bad magic, unsupported depth/interlace, ...)."""


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray, *, filter_type: int = 0) -> bytes:
    """uint8 array (H, W) | (H, W, C in {1,3,4}) -> PNG bytes.

    ``filter_type`` applies the SAME filter to every scanline (0..4);
    non-zero types exist so tests can exercise every unfilter path
    against a forward-filtered stream.
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise PngError(f"unsupported array shape {arr.shape}")
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int64)
    for y in range(h):
        line = a[y].reshape(-1).astype(np.int64)
        if filter_type == 0:
            filt = line
        elif filter_type == 1:      # Sub
            left = np.concatenate([np.zeros(bpp, np.int64), line[:-bpp]])
            filt = line - left
        elif filter_type == 2:      # Up
            filt = line - prev
        elif filter_type == 3:      # Average
            left = np.concatenate([np.zeros(bpp, np.int64), line[:-bpp]])
            filt = line - (left + prev) // 2
        elif filter_type == 4:      # Paeth
            left = np.concatenate([np.zeros(bpp, np.int64), line[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]])
            filt = line - _paeth(left, prev, ul)
        else:
            raise PngError(f"bad filter_type {filter_type}")
        raw.append(filter_type)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (PNG_MAGIC + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (spec section 9.4): nearest of
    left(a)/up(b)/upper-left(c) to p = a + b - c, ties a > b > c."""
    p = a + b - c
    pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))


def _unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Filtered scanline stream -> (h, w*bpp) reconstructed bytes.

    Per-row vectorized: None/Up are whole-row ops, Sub is a per-lane
    prefix sum; Average/Paeth carry a true left-to-right dependency, so
    those rows walk pixels (W steps of bpp-wide vector ops) — the cost
    an image codec fundamentally pays without SIMD tricks."""
    stride = w * bpp + 1
    if raw.size != h * stride:
        raise PngError(f"pixel stream size {raw.size} != {h}x{stride}")
    rows = raw.reshape(h, stride)
    out = np.zeros((h, w * bpp), dtype=np.int64)
    prev = np.zeros(w * bpp, dtype=np.int64)
    for y in range(h):
        f = int(rows[y, 0])
        x = rows[y, 1:].astype(np.int64)
        if f == 0:
            rec = x
        elif f == 1:                # Sub: per-lane prefix sum
            rec = x.reshape(w, bpp).cumsum(axis=0).reshape(-1)
        elif f == 2:                # Up
            rec = x + prev
        elif f in (3, 4):           # Average / Paeth: sequential in x
            rec = np.zeros(w * bpp, dtype=np.int64)
            left = np.zeros(bpp, dtype=np.int64)
            ul = np.zeros(bpp, dtype=np.int64)
            for px in range(w):
                s = px * bpp
                up = prev[s:s + bpp]
                if f == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, ul)
                left = (x[s:s + bpp] + pred) % 256
                rec[s:s + bpp] = left
                ul = up
        else:
            raise PngError(f"bad scanline filter {f}")
        rec %= 256
        out[y] = rec
        prev = rec
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 pixel array (H, W, C); C = 1/2/3/4 per the
    color type (palette expands to RGB)."""
    if not isinstance(data, (bytes, bytearray)) or not data.startswith(PNG_MAGIC):
        raise PngError("bad PNG signature")
    pos = len(PNG_MAGIC)
    ihdr = None
    plte = None
    idat = bytearray()
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if len(payload) != length:
            raise PngError("truncated chunk")
        pos += 12 + length          # skip CRC
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise PngError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise PngError(
            f"unsupported PNG (depth={depth}, interlace={interlace})")
    if color_type not in _CHANNELS:
        raise PngError(f"unsupported color type {color_type}")
    if w == 0 or h == 0:
        raise PngError("zero-dimension image")
    bpp = _CHANNELS[color_type]
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except zlib.error as e:
        raise PngError(f"bad IDAT stream: {e}") from None
    px = _unfilter(raw, h, w, bpp).astype(np.uint8).reshape(h, w, bpp)
    if color_type == 3:
        if plte is None:
            raise PngError("palette image without PLTE")
        idxs = px[:, :, 0]
        if int(idxs.max(initial=0)) >= len(plte):
            raise PngError("palette index out of range")
        px = plte[idxs]             # (h, w, 3)
    return px
