"""Crawl snapshot diff (CDC): classify every key as added / removed /
changed between two snapshots of the same table.

The recurring operation on a recrawled corpus: snapshot B vs snapshot A
of the pages table, keyed by url — which pages appeared, disappeared,
or changed content. (Reference analog: the TVP keep-first reconcile of
overlapping granules, products.py:2216-2226 — "same key seen twice,
decide which content stands" — generalized to a two-snapshot compare.)

Scale shape: content columns are FINGERPRINTED map-side (FNV-1a over
the concatenated columns), so the one bucketed exchange ships only
(key, side, fp) — ~17 B/row — never the documents themselves. Inside a
bucket the compare is ONE outer pandas merge (C kernel) across all keys
in the bucket; unchanged keys are dropped before anything leaves the
task, so output is bounded by the churn, not the corpus.

Assumes the key is unique within each snapshot (the pages contract:
one row per url per crawl). Duplicate keys keep-first deterministically
after a (key, fp) sort, so reruns agree.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..geo.hashing import fnv1a_64


def _fingerprint_side(ds, key: str, compare_cols: list[str], side: int,
                      num_buckets: int):
    """(key, _side, _fp, _bucket) — the only columns that shuffle."""

    def fp(b: pa.Table) -> pa.Table:
        joined = None
        for c in compare_cols:
            s = pc.fill_null(b[c].cast(pa.string()), "")
            joined = s if joined is None else pc.binary_join_element_wise(
                joined, s, "\x1f")
        h = fnv1a_64(joined)
        kb = (fnv1a_64(b[key].cast(pa.string()))
              % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({
            key: b[key],
            "_side": pa.array(np.full(b.num_rows, side, dtype=np.int8)),
            "_fp": pa.array(h.view(np.int64)),
            "_bucket": pa.array(kb),
        })

    return ds.map_batches(fp, batch_format="pyarrow")


def snapshot_diff(old_ds, new_ds, *, key: str = "url",
                  compare_cols: list[str] | str = "text",
                  num_buckets: int = 64, include_unchanged: bool = False):
    """Diff two snapshots: one row per key whose membership or content
    changed, with ``status`` in {'added','removed','changed'} (plus
    'unchanged' when ``include_unchanged``).

    Nulls in compare columns fingerprint as empty string (documented:
    null and '' compare equal — the deterministic choice the SQL oracle
    mirrors with COALESCE).
    """
    compare_cols = ([compare_cols] if isinstance(compare_cols, str)
                    else list(compare_cols))
    a = _fingerprint_side(old_ds, key, compare_cols, 0, num_buckets)
    b = _fingerprint_side(new_ds, key, compare_cols, 1, num_buckets)

    def diff_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, "_fp"], kind="mergesort")
        olds = df[df._side == 0].drop_duplicates(subset=[key], keep="first")
        news = df[df._side == 1].drop_duplicates(subset=[key], keep="first")
        m = olds[[key, "_fp"]].merge(news[[key, "_fp"]], on=key, how="outer",
                                     suffixes=("_a", "_b"), indicator=True)
        status = np.where(
            m._merge == "right_only", "added",
            np.where(m._merge == "left_only", "removed",
                     np.where(m._fp_a != m._fp_b, "changed", "unchanged")))
        m["status"] = status
        if not include_unchanged:
            m = m[m.status != "unchanged"]
        return m[[key, "status"]]

    from ..util import pin_for_shuffle

    both = pin_for_shuffle(a.union(b))
    return (both.groupby("_bucket")
            .map_groups(diff_bucket, batch_format="pandas"))


def snapshot_diff_counts(old_ds, new_ds, *, key: str = "url",
                         compare_cols: list[str] | str = "text",
                         num_buckets: int = 64):
    """Churn summary: one row per status with its key count (includes
    'unchanged' — the full recrawl report)."""
    from ..aggregate.relational import hash_aggregate

    d = snapshot_diff(old_ds, new_ds, key=key, compare_cols=compare_cols,
                      num_buckets=num_buckets, include_unchanged=True)
    return hash_aggregate(d, ["status"], {"n": (None, "count")})
