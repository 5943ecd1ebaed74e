"""Text-analysis stages for the documents table: language id, quality
scoring, token counting, document fingerprinting.

Every stage is vectorized with Arrow C++ kernels (RE2 regex counts,
list-flatten + ``is_in`` token membership, cumulative-sum segment
reductions) — no per-row Python in any hot path. Stateful pieces
(stopword value-sets, precompiled patterns) are built once per actor in
``__init__``.

Tokenization parity note: Python ``re`` ``\\w`` (unicode) is expressed in
RE2 as ``[\\p{L}\\p{N}_]``; the golden tests in
tests/test_docs_stages.py pin the vectorized outputs against row-loop
reference implementations on the real testdata corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..geo.hashing import fnv1a_64

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "it"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"},
    "fr": {"le", "la", "et", "les", "des", "est", "que", "une", "dans", "pour"},
    "es": {"el", "la", "de", "que", "y", "los", "en", "un", "por", "con"},
    "pt": {"de", "que", "e", "o", "da", "em", "um", "para", "com", "uma"},
    "ru": {"и", "в", "не", "на", "что", "с", "это", "как", "по", "но"},
}

# RE2 equivalents of Python-re unicode classes (see module docstring)
_WORD_RE = r"[\p{L}\p{N}_']+"        # Python [\w']+ token
_WORD_CHAR_RE = r"[\p{L}\p{N}_']"
_PUNCT_RE = r"[^\p{L}\p{N}_\s]"      # Python [^\w\s]
_UPPER_RE = r"\p{Lu}"
_CJK_RE = r"[\x{4E00}-\x{9FFF}]"
_ARABIC_RE = r"[\x{0600}-\x{06FF}]"


def _as_string_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.fill_null(col, "")


def _segment_sums(flags: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-list sums of a flat flag array given ListArray offsets
    (handles zero-length segments, unlike reduceat)."""
    csum = np.concatenate([[0], np.cumsum(flags, dtype=np.int64)])
    return csum[offsets[1:]] - csum[offsets[:-1]]


def _token_lists(text: pa.Array):
    """(flat lowercased tokens, list offsets, n_tokens per doc) — the
    shared tokenize step: ONE RE2 split for all docs, membership tests
    run on the flat child array."""
    toks = pc.split_pattern_regex(text, r"[^\p{L}\p{N}_']+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.utf8_lower(toks.flatten())
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    n_tokens = _segment_sums(nonempty.astype(np.int64), offsets)
    return flat, offsets, nonempty, n_tokens


def _stopword_counts(flat: pa.Array, offsets: np.ndarray,
                     profiles: dict[str, pa.Array]) -> dict[str, np.ndarray]:
    """Per-doc stopword-hit counts per language via ``is_in`` on the flat
    token array (vectorized membership, one pass per language)."""
    out = {}
    for lang, value_set in profiles.items():
        hits = pc.is_in(flat, value_set=value_set).to_numpy(zero_copy_only=False)
        out[lang] = _segment_sums(hits.astype(np.int64), offsets)
    return out


class LangId:
    """Stopword/char-ngram language-ID heuristic (actor-pool stage).

    Scores each doc against the per-language stopword profiles
    (vectorized ``is_in`` membership on the flat token array); CJK/Arabic
    ranges short-circuit by script. Appends ``lang_pred:string`` and
    ``lang_score:float64``.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.langs = list(_LANG_PROFILES)
        self.profiles = {k: pa.array(sorted(v), type=pa.string())
                         for k, v in _LANG_PROFILES.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = pa.array(batch[self.text_col].fillna(""), type=pa.string())
        n = len(text)
        flat, offsets, _, n_tokens = _token_lists(text)
        counts = _stopword_counts(flat, offsets, self.profiles)
        score_mat = np.zeros((n, len(self.langs)))
        with np.errstate(invalid="ignore", divide="ignore"):
            for j, lang in enumerate(self.langs):
                score_mat[:, j] = np.where(n_tokens > 0,
                                           counts[lang] / np.maximum(n_tokens, 1), 0.0)
        best = score_mat.argmax(axis=1)      # first max wins (dict order)
        best_s = score_mat[np.arange(n), best] if n else np.zeros(0)
        preds = np.where(best_s > 0, np.asarray(self.langs)[best], "und")
        preds = np.where(n_tokens > 0, preds, "und")
        scores = np.where(n_tokens > 0, best_s, 0.0)
        # script short-circuit on the first 200 chars
        head = pc.utf8_slice_codeunits(text, 0, 200)
        cjk = pc.count_substring_regex(head, _CJK_RE).to_numpy(zero_copy_only=False)
        arab = pc.count_substring_regex(head, _ARABIC_RE).to_numpy(zero_copy_only=False)
        # Arabic override FIRST, CJK second: the row-loop original checked
        # CJK first and `continue`d, so CJK wins when a head has >5 of BOTH
        # scripts — applying CJK last preserves that precedence.
        preds = np.where(arab > 5, "ar", preds)
        scores = np.where(arab > 5, 1.0, scores)
        preds = np.where(cjk > 5, "zh", preds)
        scores = np.where(cjk > 5, 1.0, scores)
        batch = batch.copy()
        batch["lang_pred"] = preds
        batch["lang_score"] = scores.astype(np.float64)
        return batch


class QualityScore:
    """Heuristic document-quality features + score (actor-pool stage).

    Appends ``n_chars_t, n_words, mean_word_len, punct_ratio, stop_ratio,
    upper_ratio, quality`` — the length/punct/stopword-ratio family.
    All features are RE2 count kernels + one token-membership pass."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.stop = pa.array(sorted(_LANG_PROFILES["en"]), type=pa.string())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = pa.array(batch[self.text_col].fillna(""), type=pa.string())

        def cnt(pattern: str) -> np.ndarray:
            return pc.count_substring_regex(text, pattern).to_numpy(
                zero_copy_only=False).astype(np.float64)

        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
        n_words = cnt(_WORD_RE)
        word_chars = cnt(_WORD_CHAR_RE)
        punct = cnt(_PUNCT_RE) / np.maximum(1.0, n_chars)
        upper = cnt(_UPPER_RE) / np.maximum(1.0, n_chars)
        with np.errstate(invalid="ignore", divide="ignore"):
            mwl = np.where(n_words > 0, word_chars / n_words, 0.0)
        flat, offsets, _, n_tokens = _token_lists(text)
        stop_hits = _stopword_counts(flat, offsets, {"en": self.stop})["en"]
        stop = np.where(n_words > 0, stop_hits / np.maximum(n_words, 1.0), 0.0)
        quality = (
            np.clip(n_words / 100.0, 0, 1) * 0.3
            + np.clip(mwl / 8.0, 0, 1) * 0.2
            + np.clip(stop * 5.0, 0, 1) * 0.3
            + (1.0 - np.clip(punct * 4.0, 0, 1)) * 0.1
            + (1.0 - np.clip(upper * 4.0, 0, 1)) * 0.1
        )
        batch = batch.copy()
        for name, arr in [("n_chars_t", n_chars), ("n_words", n_words),
                          ("mean_word_len", mwl), ("punct_ratio", punct),
                          ("stop_ratio", stop), ("upper_ratio", upper),
                          ("quality", quality)]:
            batch[name] = arr
        return batch


class PageScorer:
    """Combined language-ID + quality scoring in ONE actor pass (the
    flagship's per-page 'model inference' stage: stopword value-sets
    built once per actor, applied per batch with Arrow kernels).

    Cost profile mirrors real training-data filters (CCNet/Gopher-style
    heuristics, fasttext-class langid): a few microseconds per page of
    vectorized CPU.

    Appends ``quality:float64`` and ``lang_pred:string`` to the batch.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.langs = list(_LANG_PROFILES)
        self.profiles = {k: pa.array(sorted(v), type=pa.string())
                         for k, v in _LANG_PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = _as_string_array(batch[self.text_col])
        n = len(text)

        def cnt(pattern: str) -> np.ndarray:
            return pc.count_substring_regex(text, pattern).to_numpy(
                zero_copy_only=False).astype(np.float64)

        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
        n_words = cnt(_WORD_RE)
        word_chars = cnt(_WORD_CHAR_RE)
        punct = cnt(_PUNCT_RE) / np.maximum(1.0, n_chars)
        upper = cnt(_UPPER_RE) / np.maximum(1.0, n_chars)
        with np.errstate(invalid="ignore", divide="ignore"):
            mwl = np.where(n_words > 0, word_chars / n_words, 0.0)
        flat, offsets, _, n_tokens = _token_lists(text)
        counts = _stopword_counts(flat, offsets, self.profiles)
        score_mat = np.zeros((n, len(self.langs)))
        for j, lang in enumerate(self.langs):
            score_mat[:, j] = np.where(n_tokens > 0,
                                       counts[lang] / np.maximum(n_tokens, 1), 0.0)
        best = score_mat.argmax(axis=1)
        best_s = score_mat[np.arange(n), best] if n else np.zeros(0)
        preds = np.where(best_s > 0, np.asarray(self.langs)[best], "und")
        preds = np.where(n_words > 0, preds, "und")
        quality = np.where(
            n_words > 0,
            np.clip(n_words / 100.0, 0, 1) * 0.3
            + np.clip(mwl / 8.0, 0, 1) * 0.2
            + np.clip(best_s * 5.0, 0, 1) * 0.3
            + (1.0 - np.clip(punct * 4.0, 0, 1)) * 0.1
            + (1.0 - np.clip(upper * 4.0, 0, 1)) * 0.1,
            0.0)
        out = batch.append_column("quality", pa.array(quality))
        return out.append_column("lang_pred", pa.array(preds.astype(object),
                                                       type=pa.string()))


def type_token_ratio_batch(batch: pa.Table,
                           text_col: str = "text") -> pa.Table:
    """Per-doc lexical diversity: whitespace token count, DISTINCT token
    count, and the type-token ratio in EXACT integer micro-units
    (``ttr_u = n_types·10⁶ // n_tokens`` — floor division, so downstream
    sums/means are order-free exact).

    SQL parity contract (the ``lang_ttr`` oracle): trim ASCII spaces at
    both ends (DuckDB ``trim()`` semantics, NOT unicode trim), split on
    RE2 ``\\s+`` (both engines are RE2), drop rows whose trimmed text is
    empty. Fully vectorized: one Arrow split kernel, flatten + parent
    indices, one dictionary encode, one np.unique for the per-doc
    distinct count — no Python loop over rows or tokens.
    """
    t0 = _as_string_array(batch[text_col])
    keep = pc.not_equal(pc.utf8_trim(t0, characters=" "), "")
    sub = batch.filter(keep)
    if sub.num_rows == 0:
        empty = pa.array([], type=pa.int64())
        out = sub.append_column("n_tokens", empty)
        out = out.append_column("n_types", empty)
        return out.append_column("ttr_u", empty)
    t = pc.utf8_trim(_as_string_array(sub[text_col]), characters=" ")
    lists = pc.split_pattern_regex(t, pattern=r"\s+")
    n_tokens = pc.list_value_length(lists).to_numpy(
        zero_copy_only=False).astype(np.int64)
    idx = pc.list_parent_indices(lists).to_numpy(
        zero_copy_only=False).astype(np.int64)
    enc = pc.dictionary_encode(pc.list_flatten(lists))
    codes = np.asarray(enc.indices, dtype=np.int64)
    k = len(enc.dictionary)
    uniq = np.unique(idx * np.int64(max(k, 1)) + codes)
    n_types = np.bincount(uniq // np.int64(max(k, 1)),
                          minlength=sub.num_rows).astype(np.int64)
    ttr_u = n_types * np.int64(1_000_000) // n_tokens
    out = sub.append_column("n_tokens", pa.array(n_tokens))
    out = out.append_column("n_types", pa.array(n_types))
    return out.append_column("ttr_u", pa.array(ttr_u))


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace + BPE-ish token counts — pure RE2 count kernels.

    ``n_ws_tokens``: whitespace-split count = count of maximal runs of
    non-whitespace (SQL-parity definition, identical to
    ``len(s.split())``). ``n_bpe_tokens``: rough BPE proxy — each word
    token of length L costs ``ceil(L/4)`` and each punctuation char
    costs 1. Greedy non-overlapping RE2 matching of ``\\w{1,4}`` chunks
    a word into exactly ``ceil(L/4)`` pieces, so the whole count is ONE
    regex-count kernel.
    """
    t = _as_string_array(batch[text_col])
    ws = pc.count_substring_regex(t, r"[^\s\p{Z}]+").to_numpy(
        zero_copy_only=False).astype(np.int64)
    bpe = pc.count_substring_regex(
        t, r"[\p{L}\p{N}_]{1,4}|[^\p{L}\p{N}_\s]").to_numpy(
        zero_copy_only=False).astype(np.int64)
    out = batch.append_column("n_ws_tokens", pa.array(ws))
    return out.append_column("n_bpe_tokens", pa.array(bpe))


def term_count_partials(batch: pa.Table, *, text_col: str = "text",
                        group_col: str = "lang") -> pa.Table:
    """Per-batch partial term frequencies: (group, tok, n) for ASCII
    alnum tokens — the map side of a document-frequency / top-terms
    pipeline (feed into ``hash_aggregate((group, tok), n=sum)``).

    Tokenization is deliberately ASCII-only (``[A-Za-z0-9]+`` then
    lower) so it is bit-identical to the DuckDB oracle's
    ``lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+')))`` —
    pure-ASCII tokens make Python/Arrow/DuckDB ``lower`` agree. One RE2
    split for ALL docs in the batch; the per-(group, tok) partial count
    is one pandas hash groupby (C kernel). Map output is bounded by
    distinct (group, tok) pairs per batch, not token occurrences.
    """
    t = _as_string_array(batch[text_col])
    toks = pc.split_pattern_regex(t, r"[^A-Za-z0-9]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.utf8_lower(toks.flatten())
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    n_per_doc = offsets[1:] - offsets[:-1]
    grp = _as_string_array(batch[group_col])
    df = pd.DataFrame({
        group_col: np.repeat(np.asarray(grp, dtype=object), n_per_doc),
        "tok": flat.to_numpy(zero_copy_only=False),
    })
    df = df[df["tok"] != ""]
    out = df.groupby([group_col, "tok"], sort=False).size().reset_index(name="n")
    return pa.Table.from_pandas(out, preserve_index=False)


def collocation_partials(batch: pa.Table, *, text_col: str = "text"):
    """Per-batch partial counts for PMI collocations: ADJACENT lowercase
    ASCII-alnum token pairs (bigrams) and unigrams in ONE text scan,
    emitted as a union-typed partial table ``(is_pair, w1, w2, n)``
    (unigrams carry w2 = ''). Tokenization is exactly
    :func:`term_count_partials`'s split (RE2 ``[A-Za-z0-9]+`` + ASCII
    lower), so the DuckDB oracle's regexp_extract_all path is
    bit-identical. Adjacency survives the empty-token drop because the
    separator split only yields empties at document ends.

    Map output is bounded by distinct (w1, w2) + distinct tokens per
    batch — the shuffle ships partials, never token occurrences."""
    t = _as_string_array(batch[text_col])
    toks = pc.split_pattern_regex(t, r"[^A-Za-z0-9]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.utf8_lower(toks.flatten()).to_numpy(zero_copy_only=False)
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    n_per_doc = offsets[1:] - offsets[:-1]
    doc_of = np.repeat(np.arange(len(n_per_doc), dtype=np.int64), n_per_doc)
    mask = flat != ""
    f_tok, f_doc = flat[mask], doc_of[mask]
    uni = pd.DataFrame({"w1": f_tok}).groupby("w1", sort=False)         .size().reset_index(name="n")
    uni["w2"] = ""
    uni["is_pair"] = np.int8(0)
    if len(f_tok) > 1:
        adj = f_doc[1:] == f_doc[:-1]
        pairs = pd.DataFrame({"w1": f_tok[:-1][adj], "w2": f_tok[1:][adj]})
        pc_ = pairs.groupby(["w1", "w2"], sort=False).size()             .reset_index(name="n")
        pc_["is_pair"] = np.int8(1)
    else:
        pc_ = uni.iloc[0:0]
    out = pd.concat([uni, pc_], ignore_index=True)
    return pa.Table.from_pandas(out[["is_pair", "w1", "w2", "n"]],
                                preserve_index=False)


def _trim_utf8_window(data: np.ndarray, start: np.ndarray,
                      stop: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized equivalent of ``bytes.decode('utf-8','ignore')`` +
    re-encode for windows sliced out of VALID utf-8: drop up to 3
    leading continuation bytes and a trailing incomplete sequence."""
    n_data = len(data)
    if n_data == 0:
        return start, stop
    safe = lambda i: data[np.clip(i, 0, n_data - 1)]
    for _ in range(3):  # a window can start mid-char: <=3 continuations
        adv = (start < stop) & ((safe(start) & 0xC0) == 0x80)
        if not adv.any():
            break
        start = start + adv
    # walk back from the last byte to the last starter (<=3 steps)
    pos = stop - 1
    for _ in range(3):
        back = (pos > start) & ((safe(pos) & 0xC0) == 0x80)
        if not back.any():
            break
        pos = pos - back
    lead = safe(pos)
    seqlen = np.where(lead < 0x80, 1,
                      np.where(lead < 0xE0, 2, np.where(lead < 0xF0, 3, 4)))
    incomplete = (pos >= start) & (pos + seqlen > stop)
    stop = np.where(incomplete, pos, stop)
    return start, np.maximum(stop, start)


def _fnv_windows(data: np.ndarray, start: np.ndarray, stop: np.ndarray,
                 max_len: int) -> np.ndarray:
    """FNV-1a over ``data[start:stop]`` per row — one vectorized pass per
    byte POSITION (<= max_len), never per row."""
    from ..geo.hashing import FNV_OFFSET, FNV_PRIME

    h = np.full(len(start), FNV_OFFSET, dtype=np.uint64)
    if len(data) == 0:
        return h
    with np.errstate(over="ignore"):
        for p in range(max_len):
            idx = start + p
            active = idx < stop
            if not active.any():
                break
            b = data[idx[active]].astype(np.uint64)
            h[active] = (h[active] ^ b) * FNV_PRIME
    return h


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit whole-document fingerprint (FNV-1a over utf-8 bytes) +
    a 16-byte sketch: FNV hashes of the first and middle 64-byte
    windows, little-endian-concatenated (the historical first/mid/last
    triple was always truncated to 16 bytes = first+mid; kept as-is).

    Fully vectorized: windows are (start, stop) index pairs into the
    Arrow string buffer, edge-trimmed to whole utf-8 sequences
    (byte-identical to the old per-row ``decode('utf-8','ignore')``
    round-trip, pinned by the golden test), hashed with one
    byte-position loop across all rows x windows.
    """
    from ..geo.hashing import _string_bytes_and_offsets

    t = batch[text_col].cast(pa.string())
    fp = fnv1a_64(t)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    data, offsets = _string_bytes_and_offsets(pc.fill_null(t, ""))
    s0, s1 = offsets[:-1], offsets[1:]
    k = s1 - s0
    # first window [0:64); mid window [k//2-32 : k//2+32), clamped
    w_start = np.concatenate([s0, s0 + np.maximum(k // 2 - 32, 0)])
    w_stop = np.concatenate([np.minimum(s0 + 64, s1),
                             np.minimum(s0 + k // 2 + 32, s1)])
    w_start, w_stop = _trim_utf8_window(data, w_start, w_stop)
    h = _fnv_windows(data, w_start, w_stop, 64)
    n = len(k)
    sketch = np.empty((n, 2), dtype="<u8")
    sketch[:, 0] = h[:n]
    sketch[:, 1] = h[n:]
    flat = sketch.view(np.uint8).reshape(-1)
    boff = np.arange(n + 1, dtype=np.int32) * 16
    sk_arr = pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(boff.tobytes()), pa.py_buffer(flat.tobytes())])
    out = batch.append_column("fingerprint", pa.array(fp.astype(np.int64)))
    return out.append_column("fp_sketch", sk_arr)
