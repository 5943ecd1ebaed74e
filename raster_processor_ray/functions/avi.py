"""Minimal uncompressed-AVI codec (pure stdlib struct + NumPy).

The video twin of functions/png.py and the WAV lane in stages/media.py:
AVI is a RIFF container; with the 'DIB ' (uncompressed 24-bit
bottom-up BGR) handler there is no codec to need — frames are raw
pixel rows, so the video modality can decode FOR REAL without
ffmpeg. Public-spec implementation (Microsoft AVI RIFF form, OpenDML
notes); compressed handlers are out of scope (callers fall back).

Encoder exists for tests/synthetic corpora: deterministic byte layout.
"""

from __future__ import annotations

import struct

import numpy as np


class AviError(ValueError):
    """Not a decodable AVI (bad magic, compressed stream, ...)."""


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def _frame_to_dib(f: np.ndarray) -> bytes:
    """(H, W, 3) RGB uint8 -> bottom-up BGR rows padded to 4 bytes."""
    h, w, _ = f.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)   # flip + BGR
    return rows.tobytes()


def encode_avi(frames: list[np.ndarray] | np.ndarray, fps: int = 10) -> bytes:
    """List/array of (H, W, 3) uint8 RGB frames -> uncompressed AVI."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames or frames[0].ndim != 3 or frames[0].shape[2] != 3:
        raise AviError("need >= 1 (H, W, 3) uint8 frame")
    h, w, _ = frames[0].shape
    if any(f.shape != (h, w, 3) for f in frames):
        raise AviError("all frames must share one shape")
    n = len(frames)
    dib_size = ((w * 3 + 3) & ~3) * h
    avih = struct.pack("<IIIIIIIIII4I",
                       1_000_000 // fps, dib_size * fps, 0, 0x10, n,
                       0, 1, dib_size, w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh",
                       b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n,
                       dib_size, 0xFFFFFFFF, 0, 0, 0, int(w), int(h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, dib_size,
                       0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi = _list(b"movi", b"".join(_chunk(b"00db", _frame_to_dib(f))
                                   for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        tag = data[pos:pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        payload_start = pos + 8
        yield tag, payload_start, length
        pos = payload_start + length + (length & 1)


def decode_avi(data: bytes) -> tuple[np.ndarray, int]:
    """AVI bytes -> ((N, H, W, 3) uint8 RGB frames, fps). Uncompressed
    24-bit DIB streams only; anything else raises :class:`AviError`."""
    if (not isinstance(data, (bytes, bytearray)) or len(data) < 12
            or data[:4] != b"RIFF" or data[8:12] != b"AVI "):
        raise AviError("bad AVI signature")
    w = h = None
    fps = 10
    bitcount = None
    frames: list[bytes] = []

    def walk(pos: int, end: int):
        nonlocal w, h, fps, bitcount
        for tag, p, ln in _iter_chunks(data, pos, end):
            if p + ln > len(data):
                raise AviError("truncated chunk")
            if tag == b"LIST":
                walk(p + 4, p + ln)
            elif tag == b"avih":
                us_pf, = struct.unpack_from("<I", data, p)
                if us_pf:
                    fps = max(1, round(1_000_000 / us_pf))
                w, h = struct.unpack_from("<II", data, p + 32)
            elif tag == b"strf" and ln >= 40:
                bitcount = struct.unpack_from("<H", data, p + 14)[0]
                comp = struct.unpack_from("<I", data, p + 16)[0]
                if comp != 0:
                    raise AviError(f"compressed video stream ({comp:#x})")
            elif tag in (b"00db", b"00dc"):
                frames.append(data[p:p + ln])

    walk(12, len(data))
    if w is None or not frames:
        raise AviError("missing avih/frames")
    if bitcount not in (None, 24):
        raise AviError(f"unsupported bit depth {bitcount}")
    stride = (w * 3 + 3) & ~3
    out = np.zeros((len(frames), h, w, 3), dtype=np.uint8)
    for i, raw in enumerate(frames):
        if len(raw) < stride * h:
            raise AviError("short frame")
        rows = np.frombuffer(raw[: stride * h], dtype=np.uint8
                             ).reshape(h, stride)
        out[i] = rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]
    return out, fps
