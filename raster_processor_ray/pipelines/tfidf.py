"""TF-IDF document keywords: the top-k most characteristic vocabulary
terms per document.

Composes the vocab machinery (pipelines/vocab.py) into the classic IR /
training-data-curation scoring:

1. vocabulary: global top-V tokens (one bounded exchange, driver holds
   V rows);
2. document frequencies: per-batch DISTINCT (doc, tok) flags restricted
   to the vocab -> one V-bounded hash aggregate; idf = ln(N / df)
   joined onto the driver-side vocab table;
3. scoring: one stateless broadcast pass — term frequencies are
   BATCH-LOCAL because each input row is a complete document (doc_id
   unique per row; documented assumption), so the per-doc top-k needs
   no shuffle at all: tfidf = tf · idf rounded to 6 decimals, ranked
   (tfidf DESC, tok ASC) inside the batch, k rows out per doc.

The corpus is scanned three times and never exchanged; all exchanges
are vocab-bounded. Ranking happens on the ROUNDED score so engine and
SQL oracle break near-ties identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import actor_pool_size

from .vocab import _as_str, _tokenize_flat, build_vocab


def doc_frequencies(ds, vocab: pd.DataFrame, *, text_col: str = "text",
                    num_buckets: int = 8) -> pd.DataFrame:
    """-> vocab with an added int64 ``df`` column (documents containing
    each token at least once; tokens appearing nowhere keep df = 0)."""
    from ..aggregate.relational import hash_aggregate

    vocab_set = set(vocab["tok"].tolist())

    def partial(b: pa.Table) -> pa.Table:
        flat, n_per_doc = _tokenize_flat(_as_str(b[text_col]))
        doc = np.repeat(np.arange(len(n_per_doc), dtype=np.int64), n_per_doc)
        df = pd.DataFrame({"doc": doc, "tok": flat})
        df = df[df.tok.isin(vocab_set)].drop_duplicates()
        out = df.groupby("tok", sort=False).size().reset_index(name="df")
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = hash_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                         "tok", {"df": ("df", "sum")},
                         num_buckets=num_buckets).to_pandas()
    out = vocab.merge(agg, on="tok", how="left")
    out["df"] = out["df"].fillna(0).astype(np.int64)
    return out


class _Score:
    """Broadcast scoring stage: idf table built once per worker."""

    def __init__(self, ref, text_col: str, id_col: str, k: int):
        import ray
        v = ray.get(ref)
        self.idf = pd.Series(v["idf"], index=v["tok"])
        self.text_col, self.id_col, self.k = text_col, id_col, k

    def __call__(self, b: pa.Table) -> pa.Table:
        flat, n_per_doc = _tokenize_flat(_as_str(b[self.text_col]))
        ids = np.asarray(b[self.id_col]).astype(np.int64)
        doc = np.repeat(ids, n_per_doc)
        tf = (pd.DataFrame({"doc_id": doc, "tok": flat})
              .groupby(["doc_id", "tok"], sort=False).size()
              .reset_index(name="tf"))
        idf = self.idf.reindex(tf.tok).to_numpy(dtype=np.float64)
        keep = ~np.isnan(idf)
        tf = tf.loc[keep].copy()
        tf["tfidf"] = np.round(tf.tf.to_numpy(dtype=np.float64)
                               * idf[keep], 6)
        tf = tf.sort_values(["doc_id", "tfidf", "tok"],
                            ascending=[True, False, True], kind="mergesort")
        out = tf.groupby("doc_id", sort=False).head(self.k)
        return pa.Table.from_pandas(
            out[["doc_id", "tok", "tfidf"]], preserve_index=False)


def doc_top_tfidf(ds, *, text_col: str = "text", id_col: str = "doc_id",
                  vocab_size: int = 200, k: int = 3,
                  batch_size: int = 4096, concurrency=None):
    """Top-``k`` (tfidf DESC, tok ASC) vocabulary terms per document.
    ASSUMES one complete document per input row (true for the documents
    table), which makes per-doc ranking batch-local."""
    import ray

    n_docs = ds.count()
    vocab = build_vocab(ds, text_col=text_col, size=vocab_size)
    vocab = doc_frequencies(ds, vocab, text_col=text_col)
    with np.errstate(divide="ignore"):
        idf = np.log(float(n_docs) / vocab["df"].to_numpy(dtype=np.float64))
    ok = np.isfinite(idf)                  # df = 0 tokens can't be scored
    ref = ray.put({"tok": vocab["tok"].to_numpy(dtype=object)[ok],
                   "idf": idf[ok]})
    return ds.map_batches(_Score, batch_format="pyarrow",
                          batch_size=batch_size,
                          concurrency=(actor_pool_size(0.5)
                                       if concurrency is None else concurrency),
                          num_cpus=0.5,
                          fn_constructor_args=(ref, text_col, id_col, k))
