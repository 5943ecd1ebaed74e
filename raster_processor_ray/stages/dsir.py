"""DSIR-style data selection: hashed n-gram importance resampling of a
raw corpus toward a target distribution (public algorithm: Xie et al.
2023, "Data Selection for Language Models via Importance Resampling";
reference analog: none — the reference has no text-selection ops).

Both corpora are featurized as bags of hashed word n-grams over a fixed
``m = 2^num_buckets_log2`` bucket space. Per-bucket counts give two
smoothed unigram-over-buckets models — target ``p`` and raw ``q`` —
and each raw doc scores ``logw = mean_g (log p - log q)[bucket(g)]``
over its grams (the length-normalized log importance weight). Selection
is Gumbel top-k on ``logw / temperature + Gumbel(u_doc)``, which draws
k docs WITHOUT replacement with probability proportional to
``w^(1/temperature)`` — and is fully deterministic here because the
Gumbel uniform comes from ``splitmix64(doc_id ^ seed)``, not an RNG.

Scale shape:
- each count pass streams the corpus ONCE and emits one partial
  m-vector per batch; partials tree-fold with bounded fan-in (same
  pattern as stages/bloom.py build), so driver memory is
  O(fanin x m x 8B) regardless of block count and nothing shuffles;
- the (log p - log q) vector (m floats) is broadcast once via
  ``ray.put``; the scoring pass is one stateless map over the raw
  corpus (segment-sum per doc, no Python loop over rows);
- selection reuses the streaming ``topk`` (per-block partial top-k,
  one tiny combine) — no global sort, no full materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..geo.hashing import splitmix64
from .webtext import _gram_hashes


def _doc_gram_buckets(text: pa.Array, ngrams: tuple[int, ...], mask: int):
    """All hashed-gram bucket ids for a batch, with their doc index —
    one concatenated (buckets, doc_idx) pair across the ngram orders."""
    bs, ds_ = [], []
    for n in ngrams:
        h, d = _gram_hashes(text, n)
        bs.append((h & np.uint64(mask)).astype(np.int64))
        ds_.append(d)
    return np.concatenate(bs), np.concatenate(ds_)


def _clean_text(batch: pa.Table, text_col: str) -> pa.Array:
    t = pc.fill_null(batch[text_col].cast(pa.string()), "")
    return t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t


def ngram_bucket_counts(ds, *, text_col: str = "text",
                        num_buckets_log2: int = 16,
                        ngrams: tuple[int, ...] = (1, 2),
                        tree_fanin: int = 16) -> np.ndarray:
    """One streamed pass -> (m,) int64 bucket counts (with multiplicity).
    Partial per-batch vectors tree-fold, never the corpus."""
    import ray

    m = 1 << num_buckets_log2
    mask = m - 1

    def fold(b: pa.Table) -> pa.Table:
        buckets, _ = _doc_gram_buckets(_clean_text(b, text_col), ngrams, mask)
        counts = np.bincount(buckets, minlength=m).astype(np.int64)
        return pa.table({"_counts": pa.array([counts.tobytes()],
                                             type=pa.binary())})

    @ray.remote
    def add_blobs(*blobs):
        acc = np.zeros(m, dtype=np.int64)
        for blob in blobs:
            acc += np.frombuffer(blob, dtype=np.int64)
        return acc.tobytes()

    parts = [p["_counts"] for p in
             ds.map_batches(fold, batch_format="pyarrow").take_all()]
    while len(parts) > tree_fanin:
        parts = [add_blobs.remote(*parts[i:i + tree_fanin])
                 for i in range(0, len(parts), tree_fanin)]
        parts = ray.get(parts)
    acc = np.zeros(m, dtype=np.int64)
    for blob in parts:
        acc += np.frombuffer(blob, dtype=np.int64)
    return acc


def log_ratio(target_counts: np.ndarray, raw_counts: np.ndarray,
              alpha: float = 1.0) -> np.ndarray:
    """log p_target - log q_raw with add-``alpha`` smoothing per bucket."""
    m = len(target_counts)
    lp = np.log(target_counts + alpha) - np.log(target_counts.sum() + alpha * m)
    lq = np.log(raw_counts + alpha) - np.log(raw_counts.sum() + alpha * m)
    return lp - lq


def _gumbel_from_ids(ids: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic standard-Gumbel noise per id: uniform from
    splitmix64(id ^ seed) mapped into (0, 1), then -log(-log u)."""
    h = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
    # 53 mantissa bits -> uniform in (0,1); +0.5 keeps u strictly inside
    u = ((h >> np.uint64(11)).astype(np.float64) + 0.5) / float(1 << 53)
    return -np.log(-np.log(u))


def dsir_scores(raw_ds, logratio: np.ndarray, *, text_col: str = "text",
                id_col: str = "doc_id", ngrams: tuple[int, ...] = (1, 2),
                temperature: float = 1.0, seed: int = 0):
    """-> Dataset (id_col, logw, n_grams, gkey): length-normalized log
    importance weight and its Gumbel-perturbed selection key. The
    log-ratio vector is broadcast once; scoring is one stateless pass."""
    import ray

    mask = len(logratio) - 1
    assert len(logratio) & mask == 0, "logratio length must be a power of 2"
    lr_ref = ray.put(np.asarray(logratio, dtype=np.float64))

    def score(b: pa.Table) -> pa.Table:
        lr = ray.get(lr_ref)
        text = _clean_text(b, text_col)
        buckets, doc_idx = _doc_gram_buckets(text, ngrams, mask)
        n = len(b)
        sums = np.zeros(n, dtype=np.float64)
        np.add.at(sums, doc_idx, lr[buckets])
        cnt = np.bincount(doc_idx, minlength=n)
        logw = np.where(cnt > 0, sums / np.maximum(cnt, 1), -np.inf)
        ids = np.asarray(b[id_col], dtype=np.int64)
        gkey = logw / temperature + _gumbel_from_ids(ids, seed)
        return pa.table({
            id_col: b[id_col],
            "logw": pa.array(logw),
            "n_grams": pa.array(cnt.astype(np.int64)),
            "gkey": pa.array(gkey),
        })

    return raw_ds.map_batches(score, batch_format="pyarrow")


def dsir_select(raw_ds, target_ds, k: int, *, text_col: str = "text",
                id_col: str = "doc_id", num_buckets_log2: int = 16,
                ngrams: tuple[int, ...] = (1, 2), alpha: float = 1.0,
                temperature: float = 1.0, seed: int = 0):
    """End-to-end DSIR: two count passes + one scoring pass + streaming
    top-k. -> Dataset (id_col, logw, n_grams, gkey), the k selected
    docs (Gumbel top-k == sampling w/o replacement prop. to w^(1/T))."""
    tgt = ngram_bucket_counts(target_ds, text_col=text_col,
                              num_buckets_log2=num_buckets_log2,
                              ngrams=ngrams)
    raw = ngram_bucket_counts(raw_ds, text_col=text_col,
                              num_buckets_log2=num_buckets_log2,
                              ngrams=ngrams)
    lr = log_ratio(tgt, raw, alpha=alpha)
    scored = dsir_scores(raw_ds, lr, text_col=text_col, id_col=id_col,
                         ngrams=ngrams, temperature=temperature, seed=seed)

    from ..aggregate.relational import topk

    return topk(scored, "gkey", k, descending=True, tie_col=id_col)
