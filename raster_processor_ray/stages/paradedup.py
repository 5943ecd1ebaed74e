"""Paragraph-level exact deduplication (RefinedWeb/Gopher-style): split
every document into paragraphs, keep each distinct paragraph only at
its FIRST corpus occurrence (order = (doc_id, para_idx)), and reassemble
the surviving paragraphs per document.

Reference analog: D1 (products.py:2216-2226) — exact composite-key
keep-first — applied at sub-document granularity, the standard webtext
curation step for boilerplate lines repeated across a crawl.

Scale shape:
- explode is a stateless ``map_batches`` flat-map: ONE Arrow
  ``split_pattern`` per batch, offsets → (doc_id, para_idx) fan-out,
  no per-row Python;
- keep-first is ONE bucketed exchange keyed by ``hash(para) % B``
  (paragraph text must be co-located with its duplicates, so the
  paragraph bytes cross the wire once — the same cost every exact
  paragraph-dedup implementation pays). Within a bucket the survivor
  choice is one vectorized sort + ``duplicated()`` over the exact
  STRINGS (the hash only routes; equality is exact, so hash collisions
  cannot merge distinct paragraphs);
- reassembly is a second bounded exchange keyed by ``hash(doc) % B``:
  per bucket, sort by (doc, idx) and join each doc's surviving
  paragraphs with ``pc.binary_join`` (one Arrow kernel, no per-doc
  Python);
- per-doc paragraph counts ride a separate count aggregate over the
  projected (doc_id) column (map-side pre-reduced).

Docs whose every paragraph was seen earlier keep ``text_dedup = null``
(SQL oracle parity: string_agg over zero rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_BUCKETS = 32


def explode_paragraphs(ds, *, text_col: str = "text",
                       id_col: str = "doc_id", delim: str = "\n"):
    """documents -> (id_col, para_idx [1-based], para) rows, one per
    paragraph, split on the LITERAL ``delim`` (empty paragraphs kept —
    split semantics match SQL ``string_split`` exactly)."""

    def explode(b: pa.Table) -> pa.Table:
        text = b[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text.cast(pa.string()), "")
        toks = pc.split_pattern(text, delim)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        counts = offsets[1:] - offsets[:-1]
        ids = np.asarray(b[id_col], dtype=np.int64)
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
        idx = (np.arange(int(counts.sum()), dtype=np.int64)
               - np.repeat(offsets[:-1], counts) + 1)
        return pa.table({id_col: pa.array(ids[doc_of]),
                         "para_idx": pa.array(idx),
                         "para": toks.flatten()})

    return ds.map_batches(explode, batch_format="pyarrow")


def _keep_first(exploded, id_col: str, num_buckets: int):
    """Surviving (id, para_idx, para) rows: first corpus occurrence per
    distinct paragraph, order (doc_id, para_idx).

    ARROW-NATIVE end to end: paragraph strings are the dominant bytes of
    this exchange, and a pandas round-trip would copy every byte into
    (and back out of) object arrays twice; ``sort_indices`` + a shifted
    ``not_equal`` first-occurrence mask keep them in Arrow buffers."""
    from ..aggregate.relational import _key_bucket_arrow
    from ..util import pin_for_shuffle

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column("_bucket", pa.array(
            _key_bucket_arrow(b, ["para"], num_buckets)))

    def first_per_para(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_bucket"])
        idx = pc.sort_indices(t, sort_keys=[("para", "ascending"),
                                            (id_col, "ascending"),
                                            ("para_idx", "ascending")])
        para = t["para"].take(idx)
        if isinstance(para, pa.ChunkedArray):
            para = para.combine_chunks()
        n = len(para)
        keep = np.ones(n, dtype=bool)
        if n > 1:
            keep[1:] = np.asarray(pc.not_equal(
                para.slice(1), para.slice(0, n - 1)))
        return t.take(idx.filter(pa.array(keep)))

    withb = pin_for_shuffle(exploded.map_batches(add_bucket,
                                                 batch_format="pyarrow"))
    return withb.groupby("_bucket").map_groups(first_per_para,
                                               batch_format="pyarrow")


def _reassemble(kept, id_col: str, delim: str, num_buckets: int):
    """kept rows -> (id, n_kept, text_dedup) via one doc-bucketed
    exchange; the per-doc join is a single Arrow binary_join kernel."""
    from ..aggregate.relational import _key_bucket_arrow
    from ..util import pin_for_shuffle

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column("_bucket", pa.array(
            _key_bucket_arrow(b, [id_col], num_buckets)))

    def join_docs(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_bucket"])
        idx = pc.sort_indices(t, sort_keys=[(id_col, "ascending"),
                                            ("para_idx", "ascending")])
        ts = t.take(idx)
        ids = np.asarray(ts[id_col]).astype(np.int64)
        starts = np.flatnonzero(np.concatenate(
            [[True], ids[1:] != ids[:-1]])) if len(ids) else np.empty(0, int)
        counts = np.diff(np.append(starts, len(ids)))
        offsets = pa.array(np.concatenate([[0], np.cumsum(counts)]),
                           type=pa.int32())
        paras = ts["para"]                 # stays in Arrow buffers
        if isinstance(paras, pa.ChunkedArray):
            paras = paras.combine_chunks()
        lists = pa.ListArray.from_arrays(offsets, paras)
        joined = pc.binary_join(lists, delim)
        return pa.table({
            id_col: pa.array(ids[starts] if len(ids) else
                             np.empty(0, np.int64)),
            "n_kept": pa.array(counts.astype(np.int64)),
            "text_dedup": joined})

    withb = pin_for_shuffle(kept.map_batches(add_bucket,
                                             batch_format="pyarrow"))
    return withb.groupby("_bucket").map_groups(join_docs,
                                               batch_format="pyarrow")


def paragraph_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    delim: str = "\n", num_buckets: int = DEFAULT_BUCKETS):
    """documents -> (id_col, n_paras, n_kept, text_dedup); ``n_kept=0``
    rows carry null ``text_dedup``."""
    from ..aggregate.relational import hash_aggregate, hash_join
    from ..util import pin_for_shuffle

    exploded = pin_for_shuffle(explode_paragraphs(
        ds, text_col=text_col, id_col=id_col, delim=delim))
    stats = hash_aggregate(exploded.map_batches(
        lambda b: b.select([id_col]), batch_format="pyarrow"),
        id_col, {"n_paras": (None, "count")}, num_buckets=num_buckets)
    kept = _keep_first(exploded, id_col, num_buckets)
    docs = _reassemble(kept, id_col, delim, num_buckets)
    out = hash_join(stats, docs, on=id_col, how="left",
                    num_buckets=num_buckets)

    def finalize(b: pa.Table) -> pa.Table:
        # left-join nulls on n_kept -> 0 (Arrow-native: no pandas
        # object-array round trip for the wide text_dedup column)
        nk = pc.cast(pc.fill_null(b["n_kept"], 0), pa.int64())
        return pa.table({id_col: b[id_col], "n_paras": b["n_paras"],
                         "n_kept": nk, "text_dedup": b["text_dedup"]})

    return out.map_batches(finalize, batch_format="pyarrow")
