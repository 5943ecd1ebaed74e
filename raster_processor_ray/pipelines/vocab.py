"""Vocabulary build + integer token encoding — the tokenize step of a
training-data pipeline, Ray-Data-first.

Two stages, each in the engine's canonical scale shape:

1. ``build_vocab``: global term frequencies via map-side partial counts
   (one row per distinct token per batch, NOT per occurrence) -> one
   bounded hash-aggregate exchange -> global top-V pick (partial top-V
   per batch of counts, one tiny combine). The vocabulary — V rows — is
   the only thing the driver ever holds.
2. ``encode_tokens``: broadcast the vocab once (``ray.put``), then one
   stateless actor-pool pass over the corpus that tokenizes, looks up,
   and emits the exploded (doc_id, pos, token_id) encoding. OOV tokens
   are dropped; ``pos`` is the 1-based ordinal among the doc's tokens,
   so decoders can detect the gaps.

Tokenization is the engine's shared ASCII contract (stages/text.py
term_count_partials): split on ``[^A-Za-z0-9]+`` + lower, bit-identical
to DuckDB ``regexp_extract_all(lower(text), '[a-z0-9]+')``.

At 100 TB: stage 1 ships distinct-(token, batch) partials (Zipf-bounded,
~vocab-sized per batch); stage 2 is embarrassingly parallel with a
V-sized read-only dict per worker process. Nothing materializes the
corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import actor_pool_size
import pyarrow.compute as pc


def _tokenize_flat(texts: pa.Array):
    """-> (flat lowered tokens as np object array, tokens-per-doc int64).
    Empty strings from leading/trailing separators are REMOVED, so the
    per-doc ordinals match ``regexp_extract_all`` extraction order."""
    toks = pc.split_pattern_regex(texts, r"[^A-Za-z0-9]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.utf8_lower(toks.flatten()).to_numpy(zero_copy_only=False)
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    n_per_doc = offsets[1:] - offsets[:-1]
    keep = flat != ""
    # recount per doc after dropping empties
    doc_idx = np.repeat(np.arange(len(n_per_doc), dtype=np.int64), n_per_doc)
    kept_per_doc = np.bincount(doc_idx[keep], minlength=len(n_per_doc))
    return flat[keep], kept_per_doc.astype(np.int64)


def build_vocab(ds, *, text_col: str = "text", size: int = 200) -> pd.DataFrame:
    """Top-``size`` tokens by global count (ties: token asc), with
    ``token_id`` = dense rank 0..size-1 in that order. Returns a small
    driver-side DataFrame (tok, n, token_id) — the broadcast side."""
    from ..aggregate.relational import hash_aggregate, topk

    def partial(b: pa.Table) -> pa.Table:
        flat, _ = _tokenize_flat(_as_str(b[text_col]))
        s = pd.Series(flat).value_counts()
        return pa.table({"tok": pa.array(s.index.to_numpy(dtype=object),
                                         type=pa.string()),
                         "n": pa.array(s.to_numpy(dtype=np.int64))})

    counts = hash_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                            "tok", {"n": ("n", "sum")})
    head = topk(counts, "n", size, descending=True, tie_col="tok").to_pandas()
    head = head.sort_values(["n", "tok"], ascending=[False, True],
                            kind="mergesort").reset_index(drop=True)
    head["token_id"] = np.arange(len(head), dtype=np.int64)
    return head


def _as_str(col):
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_string(col.type):
        return col
    return col.cast(pa.large_string())


class _Encode:
    """Actor-pool stage: vocab dict built once per worker from the
    broadcast ref; __call__ is one vectorized tokenize + hash lookup."""

    def __init__(self, vocab_ref, text_col: str, id_col: str):
        import ray
        v = ray.get(vocab_ref)
        self.lut = pd.Series(v["token_id"], index=v["tok"])
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, b: pa.Table) -> pa.Table:
        flat, n_per_doc = _tokenize_flat(_as_str(b[self.text_col]))
        ids = np.asarray(b[self.id_col]).astype(np.int64)
        doc_of_tok = np.repeat(np.arange(len(ids), dtype=np.int64), n_per_doc)
        # 1-based ordinal within each doc
        starts = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(n_per_doc, out=starts[1:])
        pos = np.arange(len(flat), dtype=np.int64) - starts[doc_of_tok] + 1
        tid = self.lut.reindex(flat).to_numpy(dtype=np.float64)
        keep = ~np.isnan(tid)
        return pa.table({
            "doc_id": pa.array(ids[doc_of_tok[keep]]),
            "pos": pa.array(pos[keep]),
            "token_id": pa.array(tid[keep].astype(np.int64)),
        })


def encode_tokens(ds, vocab: pd.DataFrame, *, text_col: str = "text",
                  id_col: str = "doc_id", batch_size: int = 4096,
                  concurrency=None):
    """Exploded integer encoding (doc_id, pos, token_id) of every
    in-vocabulary token occurrence. Vocab is ray.put ONCE and read from
    the object store by each worker process, never re-shipped per batch."""
    import ray

    ref = ray.put({"tok": vocab["tok"].to_numpy(dtype=object),
                   "token_id": vocab["token_id"].to_numpy(dtype=np.int64)})
    return ds.map_batches(_Encode, batch_format="pyarrow",
                          batch_size=batch_size,
                          concurrency=(actor_pool_size(0.5)
                                       if concurrency is None else concurrency),
                          num_cpus=0.5,
                          fn_constructor_args=(ref, text_col, id_col))
