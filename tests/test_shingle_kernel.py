"""Parity pins for the flattened shingle/minhash/simhash kernels.

The cache-resident concat kernel (stages/dedup.py
``_shingle_hashes_concat``) must stay byte-identical to the per-doc
reference (``np.unique`` of FNV-1a over each doc's own sliding
windows) for every input shape Ray Data can hand it: plain lists,
Arrow arrays with nulls, chunked arrays, and zero-copy slices of a
larger buffer (non-zero ``arr.offset``).
"""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from raster_processor_ray.stages import dedup as dd


def _ref_hash_windows(windows: np.ndarray) -> np.ndarray:
    h = np.full(windows.shape[0], 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for col in range(windows.shape[1]):
            h = (h ^ windows[:, col].astype(np.uint64)) * prime
    return np.unique(h)


def _ref_shingles(texts, k=5):
    out = []
    for t in texts:
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        if len(b) < k:
            out.append(np.array([0], dtype=np.uint64) if len(b) == 0
                       else _ref_hash_windows(b[None, :]))
            continue
        out.append(_ref_hash_windows(
            np.lib.stride_tricks.sliding_window_view(b, k)))
    return out


EDGE_TEXTS = ["", "a", "abcd", "abcde", "hello world hello world",
              "héllo wörld ünïcode ✓" * 3, "aaaaaaaaaaaa", "xy",
              "The quick brown fox jumps over the lazy dog",
              "\x00\x01\x02\x03\x04\x05", "  spaces   and\ttabs\n"]


class TestShingleConcatParity:
    def test_edge_texts(self):
        ref = _ref_shingles(EDGE_TEXTS)
        got = dd._char_shingle_hashes(EDGE_TEXTS)
        assert len(ref) == len(got)
        for a, b in zip(ref, got):
            assert b.dtype == np.uint64
            assert np.array_equal(a, b)

    def test_nulls_and_chunked(self):
        arr = pa.array(["abc", None, "hello hello hello", "", None],
                       type=pa.string())
        ref = _ref_shingles(["abc", "", "hello hello hello", "", ""])
        for col in (arr, pa.chunked_array([arr[:2], arr[2:]])):
            got = dd._char_shingle_hashes_arrow(col)
            for a, b in zip(ref, got):
                assert np.array_equal(a, b)

    def test_sliced_offset(self):
        # a zero-copy slice keeps the parent buffer: the kernel must
        # re-base window coordinates to the slice
        big = pa.array(EDGE_TEXTS * 4, type=pa.large_utf8())
        sl = big.slice(7, 20)
        ref = _ref_shingles([big[7 + i].as_py() for i in range(20)])
        got = dd._char_shingle_hashes_arrow(sl)
        for a, b in zip(ref, got):
            assert np.array_equal(a, b)

    def test_empty_batch(self):
        h, lengths = dd._shingle_hashes_concat(pa.array([], type=pa.string()))
        assert len(h) == 0 and len(lengths) == 0

    def test_chunk_boundary_alignment(self, monkeypatch):
        # force tiny sort chunks so doc-aligned chunking itself is hit
        monkeypatch.setattr(dd, "_SHINGLE_CHUNK", 8)
        texts = ["the cat sat on the mat", "", "ab", "banana banana band",
                 "zzzzz yyyyy zzzzz"]
        ref = _ref_shingles(texts)
        got = dd._char_shingle_hashes(texts)
        for a, b in zip(ref, got):
            assert np.array_equal(a, b)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.text(max_size=40), max_size=12),
           st.integers(min_value=2, max_value=7))
    def test_property_parity(self, texts, k):
        ref = _ref_shingles(texts, k)
        got = dd._char_shingle_hashes(texts, k)
        assert len(ref) == len(got)
        for a, b in zip(ref, got):
            assert np.array_equal(a, b)


class TestSignatureParity:
    def test_signature_definition(self):
        texts = ["the quick brown fox", "pack my box with five dozen jugs"]
        sig = dd.minhash_signatures_batch(texts, num_perm=32)
        sh = _ref_shingles(texts)
        for i in range(2):
            with np.errstate(over="ignore"):
                m = (sh[i][None, :] * dd._MH_A[:32, None]
                     + dd._MH_B[:32, None])
            assert np.array_equal(sig[i], m.min(axis=1))

    def test_simhash_definition(self):
        texts = ["the quick brown fox jumps", "lorem ipsum dolor sit amet"]
        out = dd.simhash_batch(pa.table({"text": pa.array(texts)}),
                               shingle_k=4)
        fps = out["simhash"].to_numpy().astype(np.uint64)
        for i, t in enumerate(texts):
            sh = _ref_shingles([t], k=4)[0]
            fp = np.uint64(0)
            for b in range(64):
                ones = int(((sh >> np.uint64(b)) & np.uint64(1)).sum())
                if 2 * ones - len(sh) > 0:
                    fp |= np.uint64(1) << np.uint64(b)
            assert fps[i] == fp
