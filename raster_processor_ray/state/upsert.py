"""Incremental maintenance of a persisted resumable corpus: apply a
changeset (upserts + deletes, e.g. a crawl-snapshot diff from
stages/snapshot.py) by rewriting ONLY the shards that contain changed
keys. Reference analog: none (the reference regenerates outputs whole);
this is the engine-native replacement for full recomputation when a
crawl refreshes a fraction of its pages.

Scale shape:
- the CHANGESET (small side) is shuffled once by the corpus's existing
  shard function (`lineage.shard_of`) — one bounded exchange of changed
  rows only;
- each affected shard's task reads ITS OWN old shard file from storage,
  merges (delete keys, replace/insert upsert rows), and rewrites that
  one shard atomically (`lineage.write_shard_table`, tmp -> rename).
  Untouched shard files are never opened, read, or rewritten — I/O is
  O(affected shards), not O(corpus);
- the run manifest's input fingerprint is advanced to
  sha256(old_fp + changeset digest), so a later `write_resumable` over
  stale inputs cannot silently reuse post-changeset shards.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from .lineage import (_shard_dir, read_run_manifest, shard_of,
                      write_shard_table, _write_run_manifest)

UPSERT = "upsert"
DELETE = "delete"


def apply_changeset(corpus_dir: str, changes_ds, *, key_col: str,
                    op_col: str = "op",
                    sort_cols: list[str] | None = None) -> pd.DataFrame:
    """Apply ``changes_ds`` (corpus schema + ``op_col`` in
    {'upsert', 'delete'}) to a COMPLETE resumable corpus in place.
    Upserts replace-by-key (or insert); deletes drop the key. Keys must
    be unique within the changeset (asserted per shard — ambiguous
    last-writer order would be nondeterministic). Returns the manifest
    rows of the rewritten shards."""
    run = read_run_manifest(corpus_dir)
    if run is None or not run.get("complete"):
        raise ValueError(f"{corpus_dir}: not a complete resumable corpus")
    if run.get("key_col") != key_col:
        raise ValueError(f"key_col {key_col!r} != corpus {run.get('key_col')!r}")
    num_shards = int(run["num_shards"])

    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy(deep=False)
        out["_shard"] = shard_of(
            df[key_col].to_numpy(dtype=np.int64), num_shards)
        return out

    def rewrite(df: pd.DataFrame) -> pd.DataFrame:
        shard = int(df["_shard"].iloc[0])
        df = df.drop(columns=["_shard"])
        keys = df[key_col].to_numpy()
        assert len(np.unique(keys)) == len(keys), \
            f"shard {shard}: duplicate keys in changeset"
        spath = os.path.join(_shard_dir(corpus_dir, shard), "data.parquet")
        old = (pq.read_table(spath).to_pandas() if os.path.exists(spath)
               else df.drop(columns=[op_col]).iloc[0:0])
        touched = set(keys.tolist())
        kept = old[~old[key_col].isin(touched)]
        ins = df[df[op_col] == UPSERT].drop(columns=[op_col])[old.columns]
        merged = pd.concat([kept, ins], ignore_index=True)
        merged = merged.sort_values(sort_cols or [key_col],
                                    kind="mergesort").reset_index(drop=True)
        m = write_shard_table(merged, corpus_dir, shard, key_col=key_col)
        return pd.DataFrame([{k: v for k, v in m.items()
                              if k in ("shard", "rows", "bytes", "key_hash")}])

    from ..util import pin_for_shuffle

    tagged = pin_for_shuffle(
        changes_ds.map_batches(add_shard, batch_format="pandas"))
    out = tagged.groupby("_shard").map_groups(
        rewrite, batch_format="pandas").to_pandas()

    # advance provenance: the corpus no longer matches its original input
    digest = hashlib.sha256()
    digest.update(str(run.get("input_fingerprint")).encode())
    for h in sorted(out["key_hash"].astype(str)):
        digest.update(h.encode())
    # a changeset can touch a shard that previously held no rows (its
    # dir is created by the rewrite) — grow the recorded shard set so
    # the scrub expects it from now on
    prev_shards = run.get("shards")
    if prev_shards is None:
        prev_shards = range(int(run["num_shards"]))
    _write_run_manifest(corpus_dir, {
        **run, "complete": True,
        "shards": sorted(set(int(s) for s in prev_shards)
                         | set(int(s) for s in out["shard"])),
        "input_fingerprint": f"chg:{digest.hexdigest()[:16]}",
    })
    return out


def reshard_corpus(src_dir: str, dst_dir: str, num_shards: int,
                   *, sort_cols: list[str] | None = None) -> pd.DataFrame:
    """Compaction / re-sharding: rewrite a resumable corpus at a
    different shard count (merge small shards after heavy deletes, or
    split hot ones). One streamed read -> one bounded exchange (the
    standard resumable write); the source is untouched, the destination
    carries the source's fingerprint tagged with the new layout so
    provenance chains across compactions."""
    from .lineage import read_resumable, write_resumable

    run = read_run_manifest(src_dir)
    if run is None or not run.get("complete"):
        raise ValueError(f"{src_dir}: not a complete resumable corpus")
    key_col = run["key_col"]
    fp = f"reshard({run.get('input_fingerprint')})->{num_shards}"
    return write_resumable(read_resumable(src_dir), dst_dir,
                           key_col=key_col, num_shards=num_shards,
                           sort_cols=sort_cols, input_fingerprint=fp)
