"""Webtext curation stages: per-document repetition signals, n-gram
decontamination against a benchmark corpus, and URL structure parsing.

These are the Gopher/CCNet-family curation operators a training-data
pipeline runs over a Common-Crawl-style pages table (reference analog:
the per-pixel quality masks of raster_proc.py — cheap vectorized
per-record signals feeding a downstream filter):

- ``repetition_stats_batch``: distinct-token ratio and top-token
  fraction per doc (the "repetitious document" filter signals).
  One RE2 token split per batch, one pandas C-kernel groupby.
- ``decontam_flags``: flag documents sharing word n-grams with a
  (small) benchmark/eval corpus — the train/test contamination sweep.
  The benchmark's distinct gram-hash set is built with one bounded
  distributed distinct, ``ray.put`` once, and probed map-side with
  ``np.isin`` — no shuffle of the corpus. At 100-TB corpus scale the
  broadcast side stays bounded by the BENCHMARK (eval sets are MBs);
  if the gram set ever outgrew the object store, swap the exact set
  for the engine's bloom filter (stages/bloom.py) at the cost of a
  false-positive rate.
- ``parse_url_batch``: scheme/host/path extraction with ONE
  ``pc.extract_regex`` call per batch (no Python urlparse per row).

Tokenization is deliberately ASCII (``[a-z0-9]+`` after ``lower``) so
the DuckDB oracles (`regexp_extract_all(lower(text), '[a-z0-9]+')`)
agree byte-for-byte; see stages/text.py term_count_partials for the
same parity rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..geo.hashing import FNV_OFFSET, FNV_PRIME, fnv1a_64

_TOKEN_RE = r"[^a-z0-9]+"  # split pattern over lowered text


def _ascii_token_lists(text: pa.Array):
    """(flat nonempty lowered tokens, per-doc offsets) — ONE RE2 split
    for the whole batch; empty split artifacts are compacted out and
    the offsets rebuilt with a cumsum."""
    toks = pc.split_pattern_regex(pc.utf8_lower(text), _TOKEN_RE)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    offsets = np.asarray(toks.offsets, dtype=np.int64)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(nonempty))
    csum = np.concatenate([[0], np.cumsum(nonempty.astype(np.int64))])
    new_offsets = csum[offsets]  # same doc boundaries in compacted index space
    return flat, new_offsets


def repetition_stats_batch(batch: pa.Table, *, text_col: str = "text",
                           id_col: str = "doc_id") -> pa.Table:
    """Per-doc repetition signals: ``n_tokens``, ``n_distinct``,
    ``max_tok_n`` (count of the most frequent token), plus
    ``distinct_ratio`` and ``top_tok_frac`` (rounded to 6 — both engines
    round computed ratios identically). Zero-token docs report 0s."""
    text = pc.fill_null(batch[text_col].cast(pa.string()), "")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = batch.num_rows
    flat, offsets = _ascii_token_lists(text)
    counts = offsets[1:] - offsets[:-1]
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    # distinct + max counts per doc: one C-kernel groupby on (doc, tok hash)
    th = fnv1a_64(flat)
    n_tokens = counts
    n_distinct = np.zeros(n, dtype=np.int64)
    max_tok_n = np.zeros(n, dtype=np.int64)
    if len(th):
        order = np.lexsort((th, doc_idx))
        d_s, h_s = doc_idx[order], th[order]
        new = np.ones(len(d_s), dtype=bool)
        new[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
        n_distinct = np.bincount(d_s[new], minlength=n)
        # run lengths of equal (doc, tok) = occurrences of each distinct token
        starts = np.flatnonzero(new)
        run_len = np.diff(np.append(starts, len(d_s)))
        max_tok_n = np.zeros(n, dtype=np.int64)
        np.maximum.at(max_tok_n, d_s[starts], run_len)
    with np.errstate(invalid="ignore", divide="ignore"):
        dr = np.where(n_tokens > 0, n_distinct / np.maximum(n_tokens, 1), 0.0)
        tf = np.where(n_tokens > 0, max_tok_n / np.maximum(n_tokens, 1), 0.0)
    return pa.table({
        id_col: batch[id_col],
        "n_tokens": pa.array(n_tokens.astype(np.int64)),
        "n_distinct": pa.array(n_distinct.astype(np.int64)),
        "max_tok_n": pa.array(max_tok_n.astype(np.int64)),
        "distinct_ratio": pa.array(np.round(dr, 6)),
        "top_tok_frac": pa.array(np.round(tf, 6)),
    })


def _gram_hashes(text: pa.Array, ngram: int):
    """(gram hash array, doc index array) for all word ``ngram``-grams in
    the batch. Tokens are FNV-hashed once; a gram hash chains the token
    hashes word-wise (order-sensitive, boundary-safe — tokens were
    hashed individually so 'ab c' != 'a bc')."""
    flat, offsets = _ascii_token_lists(text)
    counts = offsets[1:] - offsets[:-1]
    th = fnv1a_64(flat)
    g_counts = np.maximum(counts - (ngram - 1), 0)
    total = int(g_counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), g_counts)
    seg_starts = np.repeat(np.cumsum(g_counts) - g_counts, g_counts)
    within = np.arange(total, dtype=np.int64) - seg_starts
    starts = np.repeat(offsets[:-1], g_counts) + within
    h = np.full(total, FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for w in range(ngram):
            h = (h ^ th[starts + w]) * FNV_PRIME
    return h, doc_idx


def gram_hash_batch(batch: pa.Table, *, text_col: str = "text",
                    id_col: str = "doc_id", ngram: int = 3) -> pa.Table:
    """Map stage: per-batch DISTINCT (id, gram-hash) pairs. Per-batch
    dedup bounds the map output by distinct grams, not occurrences."""
    text = pc.fill_null(batch[text_col].cast(pa.string()), "")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    h, d = _gram_hashes(text, ngram)
    if len(h):
        order = np.lexsort((h, d))
        d, h = d[order], h[order]
        keep = np.ones(len(d), dtype=bool)
        keep[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
        d, h = d[keep], h[keep]
    ids = np.asarray(batch[id_col], dtype=np.int64)
    return pa.table({id_col: pa.array(ids[d]),
                     "gram": pa.array(h.astype(np.int64))})


def benchmark_gram_set(docs_ds, *, text_col: str = "text",
                       id_col: str = "doc_id", ngram: int = 3) -> np.ndarray:
    """Distinct gram hashes of the (small, pre-filtered) benchmark
    corpus: per-batch distinct -> one bounded hash_aggregate distinct ->
    driver collect (bounded by the benchmark's distinct gram count, not
    the training corpus)."""
    from ..aggregate.relational import hash_aggregate

    grams = docs_ds.map_batches(
        lambda b: gram_hash_batch(b, text_col=text_col, id_col=id_col,
                                  ngram=ngram).select(["gram"]),
        batch_format="pyarrow")
    distinct = hash_aggregate(grams, "gram", {"n": (None, "count")},
                              num_buckets=4)
    vals = distinct.to_pandas()["gram"].to_numpy(dtype=np.int64)
    return np.sort(vals.astype(np.uint64))


class DecontamFlag:
    """Actor-pool stage: count per doc the DISTINCT word n-grams shared
    with the broadcast benchmark gram set. ``ray.put`` the sorted set
    once; each actor fetches it in ``__init__`` (zero-copy plasma read)
    and probes with ``np.isin(..., assume_unique-sorted)`` per batch.

    Emits only contaminated docs: (id_col, n_contam >= 1)."""

    def __init__(self, bench_ref, *, text_col: str = "text",
                 id_col: str = "doc_id", ngram: int = 3):
        self.bench = (ray.get(bench_ref)
                      if not isinstance(bench_ref, np.ndarray) else bench_ref)
        self.text_col, self.id_col, self.ngram = text_col, id_col, ngram

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch[self.text_col].cast(pa.string()), "")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        h, d = _gram_hashes(text, self.ngram)
        n = batch.num_rows
        n_contam = np.zeros(n, dtype=np.int64)
        if len(h):
            pos = np.searchsorted(self.bench, h)
            pos_c = np.minimum(pos, len(self.bench) - 1)
            hit = (len(self.bench) > 0) & (self.bench[pos_c] == h)
            if hit.any():
                hd, hh = d[hit], h[hit]
                order = np.lexsort((hh, hd))
                hd, hh = hd[order], hh[order]
                new = np.ones(len(hd), dtype=bool)
                new[1:] = (hd[1:] != hd[:-1]) | (hh[1:] != hh[:-1])
                n_contam = np.bincount(hd[new], minlength=n)
        ids = np.asarray(batch[self.id_col], dtype=np.int64)
        keep = n_contam > 0
        return pa.table({self.id_col: pa.array(ids[keep]),
                         "n_contam": pa.array(n_contam[keep])})


def decontam_flags(docs_ds, bench_ds, *, text_col: str = "text",
                   id_col: str = "doc_id", ngram: int = 3,
                   concurrency: int = 4):
    """Train/test decontamination sweep: benchmark grams broadcast once,
    corpus streamed through an actor pool; returns (id, n_contam) for
    contaminated docs only. One pass over the corpus, no shuffle."""
    bench = benchmark_gram_set(bench_ds, text_col=text_col,
                               id_col=id_col, ngram=ngram)
    bref = ray.put(bench)
    return docs_ds.map_batches(
        DecontamFlag, fn_constructor_kwargs=dict(
            bench_ref=bref, text_col=text_col, id_col=id_col, ngram=ngram),
        batch_format="pyarrow", concurrency=concurrency)


_URL_RE = (r"^(?P<scheme>[a-z][a-z0-9+.-]*)://"
           r"(?P<host>[^/?#]*)(?P<path>[^?#]*)")


def parse_url_batch(batch: pa.Table, *, url_col: str = "url") -> pa.Table:
    """Append ``scheme``/``host``/``path`` parsed with ONE RE2
    ``extract_regex`` over the whole batch. Non-matching urls (no
    scheme) get empty strings."""
    u = pc.fill_null(batch[url_col].cast(pa.string()), "")
    parts = pc.extract_regex(u, _URL_RE)
    # extract_regex yields null struct on no-match; split + fill per field
    out = batch
    for field in ("scheme", "host", "path"):
        col = pc.fill_null(pc.struct_field(parts, field), "")
        out = out.append_column(field, col)
    return out


def duplicate_span_stats(ds, *, text_col: str = "text",
                         id_col: str = "doc_id", ngram: int = 3,
                         num_buckets: int = 32):
    """Corpus-INTERNAL duplicate-span signal (the detection half of
    substring-level dedup, Lee et al. 2022): per doc, how many of its
    DISTINCT word n-grams also appear in at least one OTHER doc, plus
    the fraction. Feeds the usual curation filter (drop/trim docs whose
    span-duplication fraction is high).

    Scale shape: map-side per-batch distinct (doc, gram-hash) pairs
    (gram_hash_batch) -> ONE gram-bucketed exchange where each bucket
    computes, vectorized across all its grams, the per-gram distinct-doc
    count and per-doc partial tallies -> one narrow per-doc sum
    exchange. The gram table crosses the wire once; nothing is
    broadcast (unlike decontam_flags, the "reference set" here is the
    corpus itself, so a broadcast set would be O(corpus))."""
    from ..aggregate.relational import _key_bucket, hash_aggregate
    from ..util import pin_for_shuffle

    pairs = ds.map_batches(
        lambda b: gram_hash_batch(b, text_col=text_col, id_col=id_col,
                                  ngram=ngram),
        batch_format="pyarrow")

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_bucket"] = _key_bucket(df, ["gram"], num_buckets)
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df["gram"].to_numpy(dtype=np.int64)
        d = df[id_col].to_numpy(dtype=np.int64)
        order = np.lexsort((d, g))
        g, d = g[order], d[order]
        # exact distinct (gram, doc) pairs (batch-split docs can repeat)
        new = np.ones(len(g), dtype=bool)
        new[1:] = (g[1:] != g[:-1]) | (d[1:] != d[:-1])
        g, d = g[new], d[new]
        # distinct-doc count per gram via run lengths
        gnew = np.ones(len(g), dtype=bool)
        gnew[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(gnew)
        nd = np.diff(np.append(starts, len(g)))
        dup = np.repeat(nd >= 2, nd)
        out = (pd.DataFrame({id_col: d, "n_dup": dup.astype(np.int64)})
               .groupby(id_col, as_index=False)
               .agg(n_grams=("n_dup", "size"), n_dup=("n_dup", "sum")))
        return out

    withb = pin_for_shuffle(pairs.map_batches(add_bucket,
                                              batch_format="pandas"))
    partials = withb.groupby("_bucket").map_groups(per_bucket,
                                                   batch_format="pandas")
    agg = hash_aggregate(partials, id_col, {
        "n_grams": ("n_grams", "sum"), "n_dup": ("n_dup", "sum")},
        num_buckets=num_buckets)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["dup_frac"] = (df["n_dup"].to_numpy(dtype=np.float64)
                          / df["n_grams"].to_numpy(dtype=np.float64))
        return df[[id_col, "n_grams", "n_dup", "dup_frac"]]

    return agg.map_batches(finalize, batch_format="pandas")


def compression_stats_batch(batch: pa.Table, *, text_col: str = "text",
                            id_col: str = "doc_id",
                            level: int = 6) -> pa.Table:
    """Per-doc zlib compression ratio — the Gopher/RefinedWeb-style
    "too compressible = boilerplate, too incompressible = noise" quality
    signal, computable with the stdlib alone. Deterministic for a fixed
    zlib version/level, so the byte counts are exact and reproducible;
    there is no SQL gzip, hence rows-only at the driver gate with golden
    tests pinning the exact compressed sizes.

    Per-row C calls (zlib releases the GIL per call; the payload work
    dominates) inside a stateless map — the scale shape is one streamed
    pass, no exchange."""
    import zlib

    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = batch.num_rows
    n_bytes = np.zeros(n, dtype=np.int64)
    n_comp = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(col.to_pylist()):
        raw = (t or "").encode("utf-8")
        n_bytes[i] = len(raw)
        n_comp[i] = len(zlib.compress(raw, level))
    ratio = n_comp / np.maximum(n_bytes, 1)
    return pa.table({
        id_col: batch[id_col],
        "n_bytes": pa.array(n_bytes),
        "n_compressed": pa.array(n_comp),
        "compression_ratio": pa.array(ratio),
    })
