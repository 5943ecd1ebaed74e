"""Pure-stdlib PNG codec (functions/png.py) + its wiring into the media
decode stage: roundtrip over every filter/channel combination, a
hand-computed golden fixture, palette expansion, and the real-decode /
fake-fallback split in DecodeImageStub."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from raster_processor_ray.functions.png import (PNG_MAGIC, PngError, _chunk,
                                                decode_png, encode_png)
from raster_processor_ray.stages import media


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_every_filter(channels, filter_type):
    rng = np.random.default_rng(channels * 10 + filter_type)
    for shape in [(1, 1), (2, 3), (7, 5), (16, 16), (33, 9)]:
        a = rng.integers(0, 256, size=(*shape, channels), dtype=np.uint8)
        b = decode_png(encode_png(a, filter_type=filter_type))
        assert b.shape == a.shape
        assert (b == a).all()


def test_golden_pixels_and_features():
    """Hand-computed fixture: a 2x3 RGB image with known values; decode
    must reproduce the exact pixels and the stage must report
    width/height/mean from actual content."""
    px = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   [[10, 20, 30], [40, 50, 60], [70, 80, 90]]],
                  dtype=np.uint8)
    out = decode_png(encode_png(px))
    assert (out == px).all()

    t = pa.table({"payload": pa.array([encode_png(px)], type=pa.binary())})
    dec = media.DecodeImageStub()(t)
    assert dec["img_width"][0].as_py() == 3
    assert dec["img_height"][0].as_py() == 2
    feats = np.asarray(dec["img_features"][0].as_py())
    # feature[0] = mean of channel 0 / 255 (hand-computed)
    exp_r = (255 + 0 + 0 + 10 + 40 + 70) / 6 / 255.0
    assert abs(feats[0] - exp_r) < 1e-6
    assert abs(feats[10] - 0.0) < 1e-6          # global min = 0
    assert abs(feats[11] - 1.0) < 1e-6          # global max = 255/255
    # histogram over channel 0 (values 255,0,0,10,40,70; v >> 6 ->
    # 3,0,0,0,0,1): bin counts {0: 4, 1: 1, 3: 1}
    assert feats[12:16] == pytest.approx([4 / 6, 1 / 6, 0.0, 1 / 6])


def test_palette_decode():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)
    png = (PNG_MAGIC
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
           + _chunk(b"PLTE", plte)
           + _chunk(b"IDAT", zlib.compress(raw))
           + _chunk(b"IEND", b""))
    d = decode_png(png)
    assert d.shape == (2, 2, 3)
    assert d[0, 0].tolist() == [255, 0, 0]
    assert d[0, 1].tolist() == [0, 255, 0]
    assert d[1, 0].tolist() == [0, 0, 255]


def test_decode_rejects_garbage():
    for bad in (b"", b"x", PNG_MAGIC + b"junk",
                PNG_MAGIC + _chunk(b"IHDR", struct.pack(
                    ">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))):  # 16-bit depth
        with pytest.raises(PngError):
            decode_png(bad)


def test_stage_mixed_batch_real_and_fake():
    """PNG rows get content-derived metadata, non-PNG rows keep the
    deterministic byte-derived fake; strict raises only for non-PNG."""
    px = np.zeros((4, 7, 3), dtype=np.uint8)
    t = pa.table({"payload": pa.array([encode_png(px), b"not an image"],
                                      type=pa.binary())})
    dec = media.DecodeImageStub()(t)
    assert dec["img_width"][0].as_py() == 7
    assert dec["img_height"][0].as_py() == 4
    feats = np.asarray(dec["img_features"][0].as_py())
    assert feats[8] == 0.0 and feats[11] == 0.0    # all-black image
    # fake row: values exist and are deterministic
    dec2 = media.DecodeImageStub()(t)
    assert dec["img_width"][1].as_py() == dec2["img_width"][1].as_py()

    strict = media.DecodeImageStub(strict=True)
    assert strict(t.slice(0, 1))["img_width"][0].as_py() == 7  # PNG ok
    with pytest.raises(NotImplementedError):
        strict(t)                                   # non-PNG row raises


from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 12), w=st.integers(1, 12),
    c=st.sampled_from([1, 2, 3, 4]),
    f=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_property(h, w, c, f, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    assert (decode_png(encode_png(a, filter_type=f)) == a).all()


class TestAudio:
    """Real WAV decode lane (stdlib wave) + fake fallback, mirroring the
    PNG image contract."""

    def test_wav_roundtrip_and_golden_features(self):
        from raster_processor_ray.stages.media import (audio_features,
                                                       decode_wav,
                                                       encode_wav)
        sr = 8000
        t = np.arange(800) / sr
        x = (0.5 * np.sin(2 * np.pi * 200.0 * t) * 32767).astype(np.int16)
        dec, got_sr = decode_wav(encode_wav(x, sr))
        assert got_sr == sr and len(dec) == 800
        np.testing.assert_allclose(dec, x / 32768.0, atol=0)
        f = audio_features(dec, sr)
        assert f[0] == pytest.approx(0.1)            # 800 / 8000 s
        assert f[1] == pytest.approx(0.5 / np.sqrt(2), rel=2e-3)  # sine rms
        # 200 Hz sine: 2 crossings per period, 20 periods in 800 samples
        assert f[2] == pytest.approx(40 / 799, abs=2 / 799)
        assert f[4] > 0.99                           # all energy < 250 Hz
        # 8-bit + stereo path
        x8 = ((np.sin(2 * np.pi * 100.0 * t) * 127) + 128).astype(np.uint8)
        import io, wave
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(1)
            w.setframerate(sr)
            w.writeframes(np.repeat(x8, 2).tobytes())
        dec2, _ = decode_wav(buf.getvalue())
        assert len(dec2) == 800

    def test_stage_mixed_real_and_fake(self):
        from raster_processor_ray.stages import media

        sr = 16000
        x = (0.25 * np.sin(2 * np.pi * 440.0 * np.arange(1600) / sr)
             * 32767).astype(np.int16)
        t = pa.table({"payload": pa.array(
            [media.encode_wav(x, sr), b"not audio"], type=pa.binary())})
        dec = media.DecodeAudioStub()(t)
        assert dec["audio_sr"][0].as_py() == sr
        assert dec["audio_samples"][0].as_py() == 1600
        assert dec["decoded_real"].to_pylist() == [True, False]
        # appended schema contract
        appended = pa.schema([dec.schema.field(i)
                              for i in range(1, dec.num_columns)])
        assert appended.equals(media.DECODE_AUDIO_APPENDED_SCHEMA)
        # fake row deterministic; strict raises only for non-WAV
        dec2 = media.DecodeAudioStub()(t)
        assert (dec["audio_sr"][1].as_py() == dec2["audio_sr"][1].as_py())
        strict = media.DecodeAudioStub(strict=True)
        assert strict(t.slice(0, 1))["audio_sr"][0].as_py() == sr
        with pytest.raises(NotImplementedError):
            strict(t)


class TestVideo:
    """Real uncompressed-AVI frame sampling (stdlib RIFF parsing),
    mirroring the PNG/WAV contracts."""

    def test_avi_roundtrip(self):
        from raster_processor_ray.functions.avi import decode_avi, encode_avi

        rng = np.random.default_rng(3)
        frames = [rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
                  for _ in range(5)]
        dec, fps = decode_avi(encode_avi(frames, fps=25))
        assert fps == 25 and dec.shape == (5, 6, 9, 3)
        for a, b in zip(frames, dec):
            assert (a == b).all()

    def test_sampler_real_and_fake(self):
        from raster_processor_ray.functions.avi import encode_avi
        from raster_processor_ray.stages import media

        frames = [np.full((4, 4, 3), i, dtype=np.uint8) for i in range(25)]
        t = pa.table({"vid": pa.array([1, 2], pa.int64()),
                      "payload": pa.array(
                          [encode_avi(frames, fps=10), b"not a video"],
                          type=pa.binary())})
        out = media.FrameSampleStub("payload", every_n=10, max_frames=4)(t)
        got = out.to_pandas()
        # real lane: 25 frames, every 10th, capped 4 -> [0, 10, 20]
        assert got[got.vid == 1].frame_no.tolist() == [0, 10, 20]
        assert got[got.vid == 1].decoded_real.all()
        # fake lane unchanged: fixed fan-out [0, 10, 20, 30]
        assert got[got.vid == 2].frame_no.tolist() == [0, 10, 20, 30]
        assert not got[got.vid == 2].decoded_real.any()
        # strict: AVI ok, non-AVI raises
        strict = media.FrameSampleStub("payload", strict=True)
        assert strict(t.slice(0, 1)).num_rows == 3
        with pytest.raises(NotImplementedError):
            strict(t)
