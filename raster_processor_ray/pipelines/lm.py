"""Bigram language-model perplexity scoring — the CCNet-style quality
signal: train an add-one-smoothed bigram LM on a reference slice of the
corpus, broadcast the count tables, and score every other document's
average negative log-likelihood in one streamed pass.

Reference analog: T3 broadcast-lookup state (geoloc_raster.py:42-76) —
the LM is small state shipped once and probed per batch.

Scale shape:
- training never shuffles the corpus: per-batch DISTINCT (w1, w2)
  partial counts -> one bounded hash-aggregate exchange (bounded by
  distinct train bigrams, Zipf-bounded — CCNet's reference corpus is a
  deliberately small high-quality slice, so the table is broadcastable;
  real deployments additionally prune the tail);
- head counts c1(w1) = sum_w2 c12 fold from the ALREADY-bounded bigram
  table (never the corpus), guaranteeing c1 consistency with c12;
- scoring is an actor-pool stage: the two count tables live in actor
  state (`ray.put` once), per-batch lookups are two vectorized pandas
  merges on EXACT strings (no hash-collision risk vs the SQL oracle).

Float parity: the per-bigram log-prob is quantized to integer
micro-nats ``floor(ln((c12+1)/(c1+V)) * 1e6 + 0.5)`` — int64 sums are
order-independent, so the per-doc average is identical at any
parallelism and matches the SQL oracle bit-for-bit (ln of identical
doubles, floor identical on negatives).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import actor_pool_size
import pyarrow.compute as pc

import ray

QUANT = 1_000_000.0


def _bigram_frame(batch: pa.Table, text_col: str,
                  id_col: str) -> pd.DataFrame:
    """(doc_id, w1, w2) rows for all consecutive token pairs in the
    batch — one RE2 split, vectorized gather."""
    from ..stages.webtext import _ascii_token_lists

    text = batch[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(text.cast(pa.string()), "")
    flat, offsets = _ascii_token_lists(text)
    counts = offsets[1:] - offsets[:-1]
    g_counts = np.maximum(counts - 1, 0)
    total = int(g_counts.sum())
    ids = np.asarray(batch[id_col], dtype=np.int64)
    if total == 0:
        return pd.DataFrame({id_col: np.empty(0, np.int64),
                             "w1": np.empty(0, object),
                             "w2": np.empty(0, object)})
    doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), g_counts)
    seg_starts = np.repeat(np.cumsum(g_counts) - g_counts, g_counts)
    within = np.arange(total, dtype=np.int64) - seg_starts
    starts = np.repeat(offsets[:-1], g_counts) + within
    flat_np = flat.to_numpy(zero_copy_only=False)
    return pd.DataFrame({id_col: ids[doc_of], "w1": flat_np[starts],
                         "w2": flat_np[starts + 1]})


def train_bigram_lm(train_ds, *, text_col: str = "text",
                    id_col: str = "doc_id", num_buckets: int = 16):
    """-> (c12: DataFrame[w1, w2, c12], c1: DataFrame[w1, c1], V).

    ``V`` is the distinct-token count of the training slice (the
    add-one smoothing denominator's vocabulary size)."""
    from ..aggregate.relational import hash_aggregate

    def pair_partials(b: pa.Table) -> pa.Table:
        df = _bigram_frame(b, text_col, id_col)
        g = (df.groupby(["w1", "w2"], as_index=False, observed=True)
             .size().rename(columns={"size": "c12"}))
        return pa.Table.from_pandas(g, preserve_index=False)

    c12_ds = hash_aggregate(
        train_ds.map_batches(pair_partials, batch_format="pyarrow"),
        ["w1", "w2"], {"c12": ("c12", "sum")}, num_buckets=num_buckets)
    c12 = c12_ds.to_pandas()
    c1 = (c12.groupby("w1", as_index=False)["c12"].sum()
          .rename(columns={"c12": "c1"}))

    def tok_partials(b: pa.Table) -> pa.Table:
        from ..stages.webtext import _ascii_token_lists
        text = b[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text.cast(pa.string()), "")
        flat, _ = _ascii_token_lists(text)
        u = pc.unique(flat)
        return pa.table({"tok": u})

    vocab = hash_aggregate(
        train_ds.map_batches(tok_partials, batch_format="pyarrow"),
        "tok", {"n": (None, "count")}, num_buckets=num_buckets)
    return c12, c1, int(vocab.count())


class _ScoreLM:
    """Actor-pool scorer: count tables in actor state, two vectorized
    exact-string merges per batch."""

    def __init__(self, model_ref, text_col: str, id_col: str):
        c12, c1, v = (ray.get(model_ref)
                      if not isinstance(model_ref, tuple) else model_ref)
        self.c12, self.c1, self.v = c12, c1, int(v)
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, b: pa.Table) -> pa.Table:
        idc = self.id_col
        df = _bigram_frame(b, self.text_col, idc)
        if not len(df):
            return pa.table({idc: pa.array([], type=pa.int64()),
                             "n_bigrams": pa.array([], type=pa.int64()),
                             "sum_qlp": pa.array([], type=pa.int64())})
        m = df.merge(self.c12, on=["w1", "w2"], how="left")
        m = m.merge(self.c1, on="w1", how="left")
        c12 = m["c12"].fillna(0).to_numpy(dtype=np.float64)
        c1 = m["c1"].fillna(0).to_numpy(dtype=np.float64)
        qlp = np.floor(np.log((c12 + 1.0) / (c1 + self.v)) * QUANT
                       + 0.5).astype(np.int64)
        g = (pd.DataFrame({idc: m[idc].to_numpy(), "qlp": qlp})
             .groupby(idc, as_index=False)
             .agg(n_bigrams=("qlp", "size"), sum_qlp=("qlp", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)


def score_perplexity(ds, model, *, text_col: str = "text",
                     id_col: str = "doc_id", num_buckets: int = 16,
                     concurrency=None, batch_size: int = 4096):
    """docs -> (id_col, n_bigrams, avg_nll). Docs with < 2 tokens emit
    no row (no bigrams to score). ``avg_nll`` is mean negative
    log-prob in nats, rounded to 6 (int64 micro-nat sums underneath —
    order-independent at any parallelism)."""
    from ..aggregate.relational import hash_aggregate

    mref = ray.put(model)
    partials = ds.map_batches(
        _ScoreLM, fn_constructor_args=(mref, text_col, id_col),
        batch_size=batch_size, batch_format="pyarrow",
        concurrency=(actor_pool_size(0.5) if concurrency is None else concurrency),
        num_cpus=0.5)
    # batches can split a doc across actor calls only if the reader
    # splits a block mid-doc — hash_aggregate re-combines partials per
    # doc regardless
    agg = hash_aggregate(partials, id_col, {
        "n_bigrams": ("n_bigrams", "sum"), "sum_qlp": ("sum_qlp", "sum")},
        num_buckets=num_buckets)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_bigrams": df["n_bigrams"].to_numpy(dtype=np.int64)})
        x = (-(df["sum_qlp"].to_numpy(dtype=np.float64))
             / (QUANT * out["n_bigrams"].to_numpy()))
        # explicit floor(x*1e6+0.5)/1e6, NOT np.round: half-to-even vs
        # SQL's half-away-from-zero diverges exactly at .5 ties (the
        # micro-nat quantization makes such ties common)
        out["avg_nll"] = np.floor(x * 1e6 + 0.5) / 1e6
        return out

    return agg.map_batches(finalize, batch_format="pandas")
