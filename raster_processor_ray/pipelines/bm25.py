"""BM25 ranked retrieval over the documents table — the lexical
complement of the embedding ANN stack (stages/ann.py): score every
document against a small query-term set and return the global top-N.

Reference analog: the broadcast raster-value lookup T3
(geoloc_raster.py:42-76) — tiny state shipped once, probed map-side —
here the "state" is the per-term document frequencies + global length
stats.

Scale decomposition (corpus read ONCE):
1. ``bm25_features``: one streamed map pass -> a NARROW per-doc feature
   row (doc_id, dl, tf per query term). Query terms are a handful, so
   tf lives in COLUMNS (no (doc, term) explosion). Tokens come from one
   RE2 split per batch; per-term tf is one vectorized membership +
   bincount per term.
2. Global stats (N, avgdl, df per term) fold from per-batch partials of
   the feature table (bounded: one partial row per feature block, then
   a driver combine over the tiny fold output — the _minmax_scan
   shape).
3. Scoring is a stateless map over the pinned feature table with the
   scalar stats closed over; top-N via the streaming partial ``topk``
   (no global sort).

The feature table is O(docs x (terms+2)) narrow int64s — spill-friendly
and never collected on the driver.

Float parity with the SQL oracle: every input to the score is an exact
int64 (tf, dl, df, N) or a ratio of them; the formula is written with
the SAME literal shape on both sides (k1=1.2, b=0.75 via
``1.2*(0.25 + 0.75*dl/avgdl)``, Lucene idf ``ln((N-df+0.5)/(df+0.5)+1)``,
per-term contributions added left-to-right in term order), so the
doubles are bit-identical; display score rounds to 6 in both engines
while ordering uses the unrounded double.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

K1 = 1.2
B = 0.75


def bm25_features(ds, terms: list[str], *, text_col: str = "text",
                  id_col: str = "doc_id"):
    """documents -> (id_col, dl, tf_0..tf_{k-1}) one row per doc."""
    from ..stages.webtext import _ascii_token_lists

    terms = list(terms)

    def feats(b: pa.Table) -> pa.Table:
        text = b[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(text.cast(pa.string()), "")
        flat, offsets = _ascii_token_lists(text)
        counts = offsets[1:] - offsets[:-1]
        n = b.num_rows
        doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        cols = {id_col: b[id_col],
                "dl": pa.array(counts.astype(np.int64))}
        flat_np = flat.to_numpy(zero_copy_only=False)
        for j, t in enumerate(terms):
            hit = flat_np == t
            tf = (np.bincount(doc_of[hit], minlength=n).astype(np.int64)
                  if hit.any() else np.zeros(n, dtype=np.int64))
            cols[f"tf_{j}"] = pa.array(tf)
        return pa.table(cols)

    return ds.map_batches(feats, batch_format="pyarrow")


def _global_stats(feats, num_terms: int, id_col: str) -> dict:
    """(N, sum_dl, df_j) via bounded partial-fold; driver sees the tiny
    fold output only."""

    def partial(b: pa.Table) -> pa.Table:
        out = {"n": [np.int64(b.num_rows)],
               "sum_dl": [np.int64(np.asarray(b["dl"]).sum())]}
        for j in range(num_terms):
            out[f"df_{j}"] = [np.int64(
                (np.asarray(b[f"tf_{j}"]) > 0).sum())]
        return pa.table(out)

    def fold(b: pa.Table) -> pa.Table:
        return pa.table({c: [np.int64(np.asarray(b[c]).sum())]
                         for c in b.column_names})

    parts = (feats.map_batches(partial, batch_format="pyarrow")
             .map_batches(fold, batch_format="pyarrow", batch_size=8192)
             .to_pandas())
    return {c: int(parts[c].sum()) for c in parts.columns}


def bm25_topk(ds, terms: list[str], top_n: int = 20, *,
              text_col: str = "text", id_col: str = "doc_id"):
    """-> (id_col, score) for the global top ``top_n`` docs (ties:
    doc_id asc). ``score`` is rounded to 6; ordering used the unrounded
    double."""
    from ..aggregate.relational import topk
    from ..util import pin_for_shuffle

    k = len(terms)
    feats = pin_for_shuffle(bm25_features(ds, terms, text_col=text_col,
                                          id_col=id_col))
    g = _global_stats(feats, k, id_col)
    n_docs = g["n"]
    avgdl = g["sum_dl"] / n_docs if n_docs else 1.0
    dfs = [g[f"df_{j}"] for j in range(k)]

    def score(b: pa.Table) -> pa.Table:
        dl = np.asarray(b["dl"], dtype=np.float64)
        s = np.zeros(len(dl), dtype=np.float64)
        denom_base = K1 * (0.25 + 0.75 * dl / avgdl)
        for j in range(k):
            tf = np.asarray(b[f"tf_{j}"], dtype=np.float64)
            idf = np.log((n_docs - dfs[j] + 0.5) / (dfs[j] + 0.5) + 1.0)
            with np.errstate(invalid="ignore"):
                term = np.where(tf > 0.0,
                                idf * tf * 2.2 / (tf + denom_base), 0.0)
            s = s + term
        return pa.table({id_col: b[id_col], "score_raw": pa.array(s)})

    scored = feats.map_batches(score, batch_format="pyarrow")
    head = topk(scored, "score_raw", top_n, descending=True,
                tie_col=id_col)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "score": df["score_raw"].round(6)})

    return head.map_batches(finalize, batch_format="pandas")


def bm25_sql(terms: list[str], top_n: int = 20,
             table: str = "documents") -> str:
    """ANSI-SQL oracle with the identical formula shape (see module
    docstring float-parity notes)."""
    tf_cols = ",\n         ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf_{j}"
        for j, t in enumerate(terms))
    score_terms = "\n     + ".join(
        f"(CASE WHEN tf_{j} > 0 THEN ln((n - df_{j} + 0.5) / (df_{j} + 0.5) + 1.0)"
        f" * tf_{j} * 2.2 / (tf_{j} + {K1} * (0.25 + 0.75 * dl / avgdl))"
        f" ELSE 0.0 END)"
        for j in range(len(terms)))
    df_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN tf_{j} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{j}"
        for j in range(len(terms)))
    return f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS toks
  FROM {table}
), feat AS (
  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
         {tf_cols}
  FROM tok
), g AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
         {df_cols}
  FROM feat
), scored AS (
  SELECT doc_id,
         {score_terms} AS score_raw
  FROM feat, g
)
SELECT doc_id, round(score_raw, 6) AS score
FROM scored
ORDER BY score_raw DESC, doc_id
LIMIT {top_n}
"""
