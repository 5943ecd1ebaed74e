"""Text-analysis stages for the documents table: language id, quality
scoring, token counting, document fingerprinting.

Stateful pieces (compiled regexes, stopword tables, n-gram profiles) live
in actor ``__init__``; per-batch work is pandas/numpy vectorized.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

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


class LangId:
    """Stopword/char-ngram language-ID heuristic (actor-pool stage).

    Scores each doc against the per-language stopword profiles; CJK/Arabic
    ranges short-circuit by script. Appends ``lang_pred:string`` and
    ``lang_score:float64``.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[\w']+", re.UNICODE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].fillna("")
        preds, scores = [], []
        for t in texts:
            # script short-circuit
            cjk = sum(1 for c in t[:200] if "一" <= c <= "鿿")
            arab = sum(1 for c in t[:200] if "؀" <= c <= "ۿ")
            if cjk > 5:
                preds.append("zh"); scores.append(1.0); continue
            if arab > 5:
                preds.append("ar"); scores.append(1.0); continue
            words = [w.lower() for w in self.word_re.findall(t)]
            if not words:
                preds.append("und"); scores.append(0.0); continue
            best, best_s = "und", 0.0
            for lang, prof in _LANG_PROFILES.items():
                s = sum(1 for w in words if w in prof) / len(words)
                if s > best_s:
                    best, best_s = lang, s
            preds.append(best if best_s > 0 else "und")
            scores.append(best_s)
        batch = batch.copy()
        batch["lang_pred"] = preds
        batch["lang_score"] = np.asarray(scores, dtype=np.float64)
        return batch


class QualityScore:
    """Heuristic document-quality features + score (actor-pool stage).

    Appends ``n_chars, n_words, mean_word_len, punct_ratio, stop_ratio,
    upper_ratio, quality`` — the length/punct/stopword-ratio family."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[\w']+", re.UNICODE)
        self.punct_re = re.compile(r"[^\w\s]", re.UNICODE)
        self.stop = _LANG_PROFILES["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].fillna("")
        n = len(texts)
        n_chars = np.zeros(n); n_words = np.zeros(n); mwl = np.zeros(n)
        punct = np.zeros(n); stop = np.zeros(n); upper = np.zeros(n)
        for i, t in enumerate(texts):
            n_chars[i] = len(t)
            words = self.word_re.findall(t)
            n_words[i] = len(words)
            mwl[i] = float(np.mean([len(w) for w in words])) if words else 0.0
            punct[i] = len(self.punct_re.findall(t)) / max(1, len(t))
            stop[i] = (sum(1 for w in words if w.lower() in self.stop) / len(words)
                       if words else 0.0)
            upper[i] = sum(1 for c in t if c.isupper()) / max(1, len(t))
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
    flagship's per-page 'model inference' stage: compiled regexes +
    per-language profiles built once per actor, applied per page).

    Cost profile mirrors real training-data filters (CCNet/Gopher-style
    heuristics, fasttext-class langid): tens of microseconds per page of
    pure CPU — the compute-bound stage of the pipeline.

    Appends ``quality:float64`` and ``lang_pred:string`` to the batch.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[\w']+", re.UNICODE)
        self.punct_re = re.compile(r"[^\w\s]", re.UNICODE)
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def score_one(self, t: str) -> tuple[float, str]:
        words = self.word_re.findall(t)
        nw = len(words)
        if nw == 0:
            return 0.0, "und"
        lower = [w.lower() for w in words]
        best, best_s = "und", 0.0
        for lang, prof in self.profiles.items():
            s = sum(1 for w in lower if w in prof) / nw
            if s > best_s:
                best, best_s = lang, s
        mwl = sum(len(w) for w in words) / nw
        punct = len(self.punct_re.findall(t)) / max(1, len(t))
        upper = sum(1 for c in t if c.isupper()) / max(1, len(t))
        quality = (min(nw / 100.0, 1.0) * 0.3 + min(mwl / 8.0, 1.0) * 0.2
                   + min(best_s * 5.0, 1.0) * 0.3
                   + (1.0 - min(punct * 4.0, 1.0)) * 0.1
                   + (1.0 - min(upper * 4.0, 1.0)) * 0.1)
        return quality, best

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        qual = np.empty(len(col), dtype=np.float64)
        langs = []
        for i, t in enumerate(col.to_pylist()):
            q, l = self.score_one(t or "")
            qual[i] = q
            langs.append(l)
        out = batch.append_column("quality", pa.array(qual))
        return out.append_column("lang_pred", pa.array(langs, type=pa.string()))


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace + BPE-ish token counts, vectorized via pyarrow compute.

    ``n_ws_tokens``: whitespace-split count (SQL-parity definition:
    count of runs of non-space chars). ``n_bpe_tokens``: rough BPE proxy =
    word count + ceil(chars/4) penalty for long words, via regex findall.
    """
    import pyarrow.compute as pc

    t = pc.fill_null(batch[text_col], "")
    # count whitespace-separated runs: split on \s+ and count non-empty
    parts = pc.split_pattern_regex(t, r"\s+")
    counts = pc.list_value_length(parts)
    # empty-string artifacts from leading/trailing whitespace
    texts = t.to_pylist()
    ws = np.asarray([len(s.split()) for s in texts], dtype=np.int64)
    bpe_re = re.compile(r"\w+|[^\w\s]", re.UNICODE)
    bpe = np.asarray(
        [sum(1 + (len(tok) - 1) // 4 for tok in bpe_re.findall(s)) for s in texts],
        dtype=np.int64)
    out = batch.append_column("n_ws_tokens", pa.array(ws))
    return out.append_column("n_bpe_tokens", pa.array(bpe))


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit whole-document fingerprint (FNV-1a over utf-8 bytes) +
    a 16-byte rolling-hash sketch (first/mid/last window hashes)."""
    t = batch[text_col]
    fp = fnv1a_64(t.cast(pa.string()))
    texts = [s or "" for s in t.to_pylist()]
    windows = []
    for s in texts:
        b = s.encode("utf-8")
        k = len(b)
        parts = [b[:64], b[max(0, k // 2 - 32):k // 2 + 32], b[-64:]]
        windows.append(b"".join(
            int(fnv1a_64([p.decode("utf-8", "ignore")])[0]).to_bytes(8, "little")
            for p in parts)[:16])
    out = batch.append_column("fingerprint", pa.array(fp.astype(np.int64)))
    return out.append_column("fp_sketch", pa.array(windows, type=pa.binary()))
