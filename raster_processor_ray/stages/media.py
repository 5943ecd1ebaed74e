"""Multimodal column stages: image/audio/video as opaque ``binary``
columns with typed metadata.

PNG payloads DECODE FOR REAL: a pure-stdlib codec (zlib inflate +
NumPy scanline unfilter, functions/png.py) yields actual pixels, so
width/height/features come from image content. Formats that need codec
libraries absent from this container (JPEG/video) fall back to a
deterministic byte-derived fake (or raise in strict mode) — the
Ray-side plumbing (schema, small-batch actor pools, output layout) is
identical either way. Every lane appends a per-row ``decoded_real``
bool so fake-feature rows are ALWAYS distinguishable downstream (on a
real corpus where most images are JPEG, the lane must not look
healthy while emitting majority-fake features); aggregate it for run
metrics (see ``q_media_decode``'s ``n_real``).

Scale notes encoded here: binary payloads dominate block size, so these
stages run with small ``batch_size`` and ``batch_format='pyarrow'``
(binary columns round-trip poorly through pandas object dtype).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import actor_pool_size

from ..geo.hashing import splitmix64


def _magic_mask(col: pa.Array, magic: bytes, offset: int = 0) -> np.ndarray:
    """Vectorized magic-byte prefilter: bool ndarray marking rows whose
    payload carries ``magic`` at ``offset`` (null/short payloads False).
    Only candidate rows pay the per-item Python decode loop."""
    sl = pc.binary_slice(col, offset, offset + len(magic))
    eq = pc.equal(sl, pa.scalar(magic, type=pa.binary()))
    return pc.fill_null(eq, False).to_numpy(zero_copy_only=False)


# --- decoder drop-in contract -------------------------------------------
# A REAL decoder replacing the stubs must append exactly these columns
# with these Arrow types (input columns pass through untouched). The
# stubs are pinned against this in tests/test_docs_stages.py
# (TestMedia::test_schema_contract), so a codec drop-in that drifts from
# the contract fails the suite, not production.
DECODE_IMAGE_FEATURE_DIM = 16
DECODE_IMAGE_APPENDED_SCHEMA = pa.schema([
    ("img_width", pa.int64()),
    ("img_height", pa.int64()),
    ("img_features", pa.list_(pa.float32(), DECODE_IMAGE_FEATURE_DIM)),
    ("decoded_real", pa.bool_()),
])
FRAME_SAMPLE_APPENDED_SCHEMA = pa.schema([
    ("frame_no", pa.int64()),
    ("decoded_real", pa.bool_()),
])
DECODE_AUDIO_FEATURE_DIM = 8
DECODE_AUDIO_APPENDED_SCHEMA = pa.schema([
    ("audio_sr", pa.int64()),
    ("audio_samples", pa.int64()),
    ("audio_features", pa.list_(pa.float32(), DECODE_AUDIO_FEATURE_DIM)),
    ("decoded_real", pa.bool_()),
])


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 mono PCM -> WAV bytes (stdlib ``wave``; deterministic)."""
    import io
    import wave

    s = np.asarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float64 mono samples in [-1, 1], sample_rate).
    16-bit and 8-bit PCM; multi-channel averages to mono. Raises
    ``ValueError`` for anything the stdlib reader rejects."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        nch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:                     # unsigned 8-bit per WAV spec
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
             - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if nch > 1:
        x = x[: len(x) - len(x) % nch].reshape(-1, nch).mean(axis=1)
    return x, sr


def audio_features(x: np.ndarray, sr: int) -> np.ndarray:
    """(n,) float samples -> the 8-dim feature vector of the decode
    contract: duration_s, rms, zero-crossing rate, peak, and the
    fraction of spectral energy in 4 log-ish bands (0-250, 250-1k,
    1k-4k, >=4k Hz) from one rFFT."""
    f = np.zeros(DECODE_AUDIO_FEATURE_DIM, dtype=np.float64)
    n = len(x)
    if n == 0:
        return f
    f[0] = n / sr
    f[1] = float(np.sqrt(np.mean(x * x)))
    f[2] = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
    f[3] = float(np.max(np.abs(x)))
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(n, d=1.0 / sr)
    total = spec.sum()
    if total > 0:
        for i, (lo, hi) in enumerate([(0, 250), (250, 1000),
                                      (1000, 4000), (4000, np.inf)]):
            f[4 + i] = spec[(freqs >= lo) & (freqs < hi)].sum() / total
    return f


class DecodeAudioStub:
    """Decode an audio binary column -> (sample_rate, n_samples) + a
    fixed-size feature vector. WAV payloads (RIFF magic) decode FOR REAL
    via the stdlib ``wave`` reader — features come from actual PCM.
    Compressed formats need absent codec libs (mp3/opus): strict=True
    raises for them, strict=False substitutes the deterministic
    byte-derived fake (same device as :class:`DecodeImageStub`)."""

    FEATURE_DIM = DECODE_AUDIO_FEATURE_DIM

    def __init__(self, binary_col: str = "payload", strict: bool = False):
        self.binary_col = binary_col
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.binary_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lengths = pa.compute.binary_length(col).to_numpy(zero_copy_only=False)
        lengths = np.where(np.isnan(lengths.astype(np.float64)), 0,
                           lengths).astype(np.int64)
        h = splitmix64(lengths.astype(np.uint64) + np.uint64(0xA0D10))
        sr = (np.uint64(8000) + (h % np.uint64(4)) * np.uint64(8000)).astype(np.int64)
        nsamp = ((h >> np.uint64(16)) % np.uint64(160_000)).astype(np.int64)
        feats = np.stack([
            splitmix64(h + np.uint64(i)).astype(np.float64) / 2**64
            for i in range(self.FEATURE_DIM)], axis=1)
        decoded_real = np.zeros(batch.num_rows, dtype=bool)
        cand = _magic_mask(col, b"RIFF")
        if self.strict and not cand.all():
            raise NotImplementedError(
                "non-WAV audio decode requires a codec library "
                "(libsndfile/ffmpeg), not available here")
        for i in np.flatnonzero(cand):
            try:
                x, rate = decode_wav(col[int(i)].as_py())
            except Exception:
                if self.strict:
                    raise
                continue
            sr[i], nsamp[i] = rate, len(x)
            feats[i] = audio_features(x, rate)
            decoded_real[i] = True
        out = batch.append_column("audio_sr", pa.array(sr))
        out = out.append_column("audio_samples", pa.array(nsamp))
        out = out.append_column(
            "audio_features", pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), type=pa.float32()),
                self.FEATURE_DIM))
        return out.append_column("decoded_real", pa.array(decoded_real))


def image_features(px: np.ndarray) -> np.ndarray:
    """(H, W, C) uint8 pixels -> the 16-dim feature vector of the decode
    contract: per-channel mean [0:4] and std [4:8] (missing channels 0),
    global mean/std/min/max normalized to [0,1] [8:12], 4-bin intensity
    histogram fractions of channel 0 [12:16]."""
    f = np.zeros(DECODE_IMAGE_FEATURE_DIM, dtype=np.float64)
    flat = px.reshape(-1, px.shape[2]).astype(np.float64) / 255.0
    c = px.shape[2]
    f[0:c] = flat.mean(axis=0)
    f[4:4 + c] = flat.std(axis=0)
    f[8] = flat.mean()
    f[9] = flat.std()
    f[10] = flat.min()
    f[11] = flat.max()
    hist = np.bincount(px[:, :, 0].reshape(-1) >> 6, minlength=4)
    f[12:16] = hist / hist.sum()
    return f


class DecodeImageStub:
    """Decode an image binary column -> (width, height) metadata + a
    fixed-size feature vector.

    PNG payloads decode for real via the pure-stdlib codec
    (functions/png.py): width/height/features are computed from actual
    pixels. Other formats need codec libraries absent here (libjpeg /
    ffmpeg): strict=True raises NotImplementedError for them,
    strict=False substitutes a deterministic fake derived from the
    payload bytes so downstream plumbing stays testable.
    """

    FEATURE_DIM = DECODE_IMAGE_FEATURE_DIM

    def __init__(self, binary_col: str = "payload", strict: bool = False):
        self.binary_col = binary_col
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.png import PNG_MAGIC, PngError, decode_png

        col = batch[self.binary_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # fake lane (vectorized over the whole batch): deterministic
        # byte-length-derived values; PNG rows overwrite theirs below
        lengths = pa.compute.binary_length(col).to_numpy(zero_copy_only=False)
        lengths = np.where(np.isnan(lengths.astype(np.float64)), 0, lengths).astype(np.int64)
        h = splitmix64(lengths.astype(np.uint64) + np.uint64(0x1234))
        width = (h % np.uint64(1920) + np.uint64(16)).astype(np.int64)
        height = ((h >> np.uint64(16)) % np.uint64(1080) + np.uint64(16)).astype(np.int64)
        feats = np.stack([
            splitmix64(h + np.uint64(i)).astype(np.float64) / 2**64
            for i in range(self.FEATURE_DIM)], axis=1)
        # real lane: per-payload decode (image decode is inherently
        # per-item; the batch is small by design — binary payloads
        # dominate memory, see module docstring). The magic-byte
        # prefilter is vectorized so non-candidate rows never enter
        # the Python loop.
        decoded_real = np.zeros(batch.num_rows, dtype=bool)
        cand = _magic_mask(col, PNG_MAGIC)
        if self.strict and not cand.all():
            raise NotImplementedError(
                "non-PNG image decode requires a codec library "
                "(PIL/turbojpeg), not available in this environment")
        for i in np.flatnonzero(cand):
            try:
                px = decode_png(col[int(i)].as_py())
            except PngError:
                if self.strict:
                    raise
                continue
            height[i], width[i] = px.shape[0], px.shape[1]
            feats[i] = image_features(px)
            decoded_real[i] = True
        out = batch.append_column("img_width", pa.array(width))
        out = out.append_column("img_height", pa.array(height))
        out = out.append_column(
            "img_features", pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), type=pa.float32()), self.FEATURE_DIM))
        return out.append_column("decoded_real", pa.array(decoded_real))


class FrameSampleStub:
    """Sample frames per video binary -> one output row per sampled
    frame with ``frame_no``. Uncompressed-AVI payloads (RIFF/'AVI '
    magic) sample REAL frames via the stdlib codec (functions/avi.py):
    the emitted frame numbers come from the file's actual frame count
    (every ``every_n``-th, up to ``max_frames``). Compressed video
    needs ffmpeg (absent): strict=True raises for it, strict=False
    emits the deterministic fixed fan-out."""

    def __init__(self, binary_col: str = "payload", every_n: int = 10,
                 max_frames: int = 4, strict: bool = False):
        self.binary_col = binary_col
        self.every_n = every_n
        self.max_frames = max_frames
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.avi import AviError, decode_avi

        col = batch[self.binary_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # vectorized AVI prefilter: RIFF at 0 AND 'AVI ' at 8
        cand = _magic_mask(col, b"RIFF") & _magic_mask(col, b"AVI ", 8)
        if self.strict and not cand.all():
            raise NotImplementedError(
                "compressed video frame sampling requires ffmpeg")
        real_frames: dict[int, np.ndarray] = {}
        for i in np.flatnonzero(cand):
            try:
                frames, _ = decode_avi(col[int(i)].as_py())
            except AviError:
                if self.strict:
                    raise
                continue
            real_frames[int(i)] = np.arange(0, len(frames), self.every_n,
                                            dtype=np.int64)[: self.max_frames]
        fake = np.arange(self.max_frames, dtype=np.int64) * self.every_n
        take_parts, frame_parts, real_parts = [], [], []
        for i in range(batch.num_rows):
            fr = real_frames.get(i)
            is_real = fr is not None
            if not is_real:
                fr = fake
            take_parts.append(np.full(len(fr), i, dtype=np.int64))
            frame_parts.append(fr)
            real_parts.append(np.full(len(fr), is_real, dtype=bool))
        take = (np.concatenate(take_parts) if take_parts
                else np.empty(0, np.int64))
        frame_no = (np.concatenate(frame_parts) if frame_parts
                    else np.empty(0, np.int64))
        decoded_real = (np.concatenate(real_parts) if real_parts
                        else np.empty(0, bool))
        out = batch.take(pa.array(take))
        out = out.append_column("frame_no", pa.array(frame_no))
        return out.append_column("decoded_real", pa.array(decoded_real))


def media_pipeline(ds, *, binary_col: str = "payload", concurrency=None,
                   batch_size: int = 64):
    """Reference wiring for a media stage: small batches (binary payloads
    dominate memory), actor pool, arrow batches end-to-end."""
    return ds.map_batches(
        DecodeImageStub, fn_constructor_args=(binary_col, False),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(actor_pool_size(0.5) if concurrency is None else concurrency),
        num_cpus=0.5)
