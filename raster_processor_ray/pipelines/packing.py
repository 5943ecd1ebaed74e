"""Sequence packing for LM training shards: concatenate the corpus's
integer token stream in (doc_id, pos) order with an EOS token after
each document, chop into fixed-length sequences, drop the trailing
partial sequence — the standard GPT-style pre-training data layout.

Reference analog: the dense-tile materialization (state/densify.py) —
sparse keyed rows re-laid into fixed-size dense blocks — applied to a
1-D token stream instead of a 2-D grid.

The global stream position of a token is ``start(doc) + rank``, where
``start`` is an exclusive prefix sum of per-doc contributions
(n_tokens + 1 EOS) in doc_id order. Distributed shape (the input token
table is never globally sorted):

1. per-doc token counts: map-side partials -> one bounded exchange
   (narrow rows, one per doc);
2. per-RANGE totals (range = ``doc_id // range_size``) -> tiny driver
   cumsum gives each range's base offset (driver holds one row per
   range — at extreme doc counts raise ``range_size`` or add a second
   fold level, same tree shape as utm_raster._minmax_scan);
3. per-doc starts: range-bucketed ``map_groups`` (sort by doc_id inside
   the range, vectorized exclusive cumsum + broadcast base);
4. ONE hash-bucketed exchange co-locates each doc's token rows with its
   start row (tagged union — the hash_join pattern); per bucket the
   global positions and the EOS row per doc are emitted vectorized;
5. seq_id/pos_in_seq are pure arithmetic on the global position; the
   tail drop is a scalar threshold closed over from step 2.

Assumes integer doc ids (dense-ish: the number of OCCUPIED ranges is
what the driver holds). Ordering contract: (doc_id, pos) must be
unique, which encode_tokens guarantees.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pack_sequences(enc, *, seq_len: int = 128, eos_id: int,
                   id_col: str = "doc_id", pos_col: str = "pos",
                   tok_col: str = "token_id", range_size: int = 8192,
                   num_buckets: int = 32):
    """(doc_id, pos, token_id) -> (seq_id, pos_in_seq, token_id), full
    sequences only. Docs absent from ``enc`` (no in-vocab tokens)
    contribute nothing, not even EOS."""
    from ..aggregate.relational import _key_bucket, hash_aggregate
    from ..util import pin_for_shuffle

    enc = pin_for_shuffle(enc)

    # 1. per-doc counts
    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(id_col, as_index=False).size()
        return g.rename(columns={"size": "n_v"})

    nv = hash_aggregate(enc.map_batches(count_partial, batch_format="pandas"),
                        id_col, {"n_v": ("n_v", "sum")},
                        num_buckets=num_buckets)

    def add_range(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_range"] = df[id_col].to_numpy(dtype=np.int64) // range_size
        return df

    nv = pin_for_shuffle(nv.map_batches(add_range, batch_format="pandas"))

    # 2. per-range totals -> driver cumsum (one row per OCCUPIED range)
    totals = hash_aggregate(nv, "_range", {
        "tok_sum": ("n_v", "sum"), "n_docs": (None, "count")},
        num_buckets=8).to_pandas().sort_values("_range")
    contrib = (totals["tok_sum"] + totals["n_docs"]).to_numpy(dtype=np.int64)
    bases = np.concatenate([[0], np.cumsum(contrib)[:-1]])
    base_of = dict(zip(totals["_range"].astype(np.int64), bases))
    total_stream = int(contrib.sum())
    full_limit = (total_stream // seq_len) * seq_len

    # 3. per-doc starts within each range
    def starts_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort")
        c = (df["n_v"].to_numpy(dtype=np.int64) + 1)
        excl = np.concatenate([[0], np.cumsum(c)[:-1]])
        base = base_of[int(df["_range"].iloc[0])]
        return pd.DataFrame({id_col: df[id_col].to_numpy(dtype=np.int64),
                             "_start": base + excl})

    starts = nv.groupby("_range").map_groups(starts_group,
                                             batch_format="pandas")

    # 4. tagged union -> one bucketed exchange -> vectorized emit
    def tag_tokens(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            id_col: df[id_col].to_numpy(dtype=np.int64),
            pos_col: df[pos_col].to_numpy(dtype=np.int64),
            tok_col: df[tok_col].to_numpy(dtype=np.int64),
            "_start": np.int64(-1), "_side": np.int8(0)})
        out["_bucket"] = _key_bucket(out, [id_col], num_buckets)
        return out

    def tag_starts(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            id_col: df[id_col].to_numpy(dtype=np.int64),
            pos_col: np.int64(-1), tok_col: np.int64(-1),
            "_start": df["_start"].to_numpy(dtype=np.int64),
            "_side": np.int8(1)})
        out["_bucket"] = _key_bucket(out, [id_col], num_buckets)
        return out

    tagged = (enc.map_batches(tag_tokens, batch_format="pandas")
              .union(starts.map_batches(tag_starts, batch_format="pandas")))

    def emit_positions(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[df["_side"] == 0]
        st = df[df["_side"] == 1][[id_col, "_start"]]
        m = toks.merge(st, on=id_col, suffixes=("_x", ""))
        m = m.sort_values([id_col, pos_col], kind="mergesort")
        ids = m[id_col].to_numpy(dtype=np.int64)
        n = len(ids)
        firsts = (np.flatnonzero(np.concatenate([[True], ids[1:] != ids[:-1]]))
                  if n else np.empty(0, np.int64))
        counts = np.diff(np.append(firsts, n))
        rank = np.arange(n, dtype=np.int64) - np.repeat(firsts, counts)
        start = m["_start"].to_numpy(dtype=np.int64)
        g_tok = start + rank
        g_eos = start[firsts] + counts
        g = np.concatenate([g_tok, g_eos])
        tok = np.concatenate([m[tok_col].to_numpy(dtype=np.int64),
                              np.full(len(firsts), eos_id, dtype=np.int64)])
        keep = g < full_limit
        g, tok = g[keep], tok[keep]
        return pd.DataFrame({"seq_id": g // seq_len,
                             "pos_in_seq": g % seq_len,
                             "token_id": tok})

    withb = pin_for_shuffle(tagged)
    return withb.groupby("_bucket").map_groups(emit_positions,
                                               batch_format="pandas")
