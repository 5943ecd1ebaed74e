"""Byte-pair-encoding subword tokenizer: distributed training +
distributed encoding, Ray-Data-first.

The scale decomposition is the one production BPE trainers use
(HuggingFace tokenizers, SentencePiece --model_type=bpe): the corpus is
never iterated during merge learning — only the WORD-FREQUENCY table
is, and that is Zipf-bounded by distinct words, not corpus bytes.

1. ``train_bpe``: distributed word counts (per-batch distinct partials
   -> one bounded hash-aggregate exchange -> top-W words by count; the
   truncation is the standard min-frequency cut — tail words contribute
   negligible pair mass). The merge loop then runs DRIVER-SIDE over the
   W-row table: per iteration, pair counts weighted by word frequency,
   deterministic argmax (count desc, pair asc), merge applied in place.
   O(num_merges x total_symbols) on <= W words — seconds, independent
   of corpus size.
2. ``bpe_encode``: merges broadcast once (``ray.put``); an actor-pool
   stage encodes each batch. Per-actor LRU-less word->pieces cache:
   the greedy rank-merge runs once per DISTINCT word per actor
   lifetime (Zipf makes the hit rate ->1 on webtext); the per-batch
   fan-out from cached pieces is fully vectorized (np.repeat /
   concatenate). The cache is bounded by distinct words seen, the same
   bound the trainer itself relies on.

Word tokenization is the engine's shared ASCII contract
(pipelines/vocab.py _tokenize_flat): split ``[^A-Za-z0-9]+`` + lower.

No SQL oracle — iterative merge learning is not ANSI-SQL-expressible;
correctness is pinned by golden tests against a from-first-principles
reference implementation (tests/test_round3_extensions.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import actor_pool_size

import ray

from .vocab import _as_str, _tokenize_flat


def _merge_loop(words: list[str], counts: np.ndarray,
                num_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a (word, count) table. Ties break
    deterministically: highest pair count, then lexicographically
    smallest (a, b)."""
    seqs = [list(w) for w in words]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in zip(seqs, counts):
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + int(c)
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for syms in seqs:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i:i + 2] = [ab]
                else:
                    i += 1
    return merges


def train_bpe(ds, *, text_col: str = "text", num_merges: int = 50,
              max_words: int = 50_000) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ranked merge list (rank = list position). Only the top
    ``max_words`` distinct words (by count, ties token asc) feed the
    merge loop — the standard frequency cut; the corpus itself is
    touched exactly once, map-only."""
    from ..aggregate.relational import hash_aggregate, topk

    def partial(b: pa.Table) -> pa.Table:
        flat, _ = _tokenize_flat(_as_str(b[text_col]))
        s = pd.Series(flat).value_counts()
        return pa.table({"word": pa.array(s.index.to_numpy(dtype=object),
                                          type=pa.string()),
                         "n": pa.array(s.to_numpy(dtype=np.int64))})

    counts = hash_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                            "word", {"n": ("n", "sum")})
    head = topk(counts, "n", max_words, descending=True,
                tie_col="word").to_pandas()
    head = head.sort_values(["n", "word"], ascending=[False, True],
                            kind="mergesort")
    return _merge_loop(head["word"].tolist(),
                       head["n"].to_numpy(dtype=np.int64), num_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge of one word (the canonical BPE
    inference algorithm)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class _BpeEncode:
    """Actor-pool stage: per-actor word->pieces cache; cache misses run
    the greedy merge once per distinct word, hits fan out vectorized."""

    def __init__(self, merges_ref, text_col: str, id_col: str):
        merges = (ray.get(merges_ref)
                  if not isinstance(merges_ref, list) else merges_ref)
        self.ranks = {tuple(p): r for r, p in enumerate(merges)}
        self.cache: dict[str, list[str]] = {}
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, b: pa.Table) -> pa.Table:
        flat, n_per_doc = _tokenize_flat(_as_str(b[self.text_col]))
        ids = np.asarray(b[self.id_col]).astype(np.int64)
        uniq, inv = np.unique(flat, return_inverse=True)
        pieces_per_uniq = []
        for w in uniq:
            p = self.cache.get(w)
            if p is None:
                p = encode_word(w, self.ranks)
                self.cache[w] = p
            pieces_per_uniq.append(p)
        k_per_uniq = np.array([len(p) for p in pieces_per_uniq],
                              dtype=np.int64)
        k_per_tok = k_per_uniq[inv]
        doc_of_tok = np.repeat(np.arange(len(ids), dtype=np.int64), n_per_doc)
        doc_of_piece = np.repeat(doc_of_tok, k_per_tok)
        # piece ordinal within each doc (1-based, across its words)
        pieces_per_doc = np.bincount(doc_of_tok, weights=k_per_tok,
                                     minlength=len(ids)).astype(np.int64)
        starts = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(pieces_per_doc, out=starts[1:])
        total = int(k_per_tok.sum())
        pos = np.arange(total, dtype=np.int64) - starts[doc_of_piece] + 1
        # vectorized gather: every token occurrence copies its unique
        # word's piece slice out of ONE flat array (no per-token Python)
        flat_u = np.array([p for ps in pieces_per_uniq for p in ps],
                          dtype=object)
        u_starts = np.zeros(len(uniq) + 1, dtype=np.int64)
        np.cumsum(k_per_uniq, out=u_starts[1:])
        seg_starts = np.repeat(np.cumsum(k_per_tok) - k_per_tok, k_per_tok)
        within = np.arange(total, dtype=np.int64) - seg_starts
        src_idx = np.repeat(u_starts[:-1][inv], k_per_tok) + within
        flat_pieces = flat_u[src_idx] if total else np.empty(0, dtype=object)
        return pa.table({
            "doc_id": pa.array(ids[doc_of_piece]),
            "pos": pa.array(pos),
            "piece": pa.array(flat_pieces, type=pa.string()),
        })


def bpe_encode(ds, merges: list[tuple[str, str]], *,
               text_col: str = "text", id_col: str = "doc_id",
               batch_size: int = 4096, concurrency=None):
    """Encode the corpus with learned merges -> exploded
    (doc_id, pos, piece) rows. One streamed actor-pool pass."""
    mref = ray.put([tuple(m) for m in merges])
    return ds.map_batches(
        _BpeEncode, fn_constructor_args=(mref, text_col, id_col),
        batch_size=batch_size, batch_format="pyarrow",
        concurrency=(actor_pool_size(0.5) if concurrency is None else concurrency),
        num_cpus=0.5)
