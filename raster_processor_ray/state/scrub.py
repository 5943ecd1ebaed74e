"""Corpus integrity scrub: audit a resumable layout against its lineage
manifests (SURVEY.md §2.7 extension — the operational close of the
checkpoint/resume story: resume guards prove a run FINISHED; the scrub
proves the bytes on disk are still what that run wrote).

Reference analog: the reference trusts its filesystem (no verification
pass anywhere in products.py); at 10^12-doc scale silent corruption and
partial deletes are routine, so a cheap audit that localizes damage to
shards — which `write_resumable` can then rewrite selectively, like
`state.upsert` does — is a first-class operation.

Scale shape: one task per batch of shard ids (bounded by the layout's
shard count, never row count); each task stats/reads only its own
shards, so a deep scrub is one embarrassingly parallel pass over the
corpus at storage bandwidth and a shallow scrub touches metadata only.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd

from . import lineage


def _check_shard(out_dir: str, shard: int, deep: bool) -> dict:
    sdir = os.path.join(out_dir, f"shard={shard:05d}")
    dpath = os.path.join(sdir, "data.parquet")
    mpath = os.path.join(sdir, "MANIFEST.json")
    row = {"shard": shard, "status": "ok", "rows": -1, "bytes": -1}
    if not os.path.exists(mpath):
        row["status"] = ("missing_shard" if not os.path.isdir(sdir)
                         else "missing_manifest")
        return row
    with open(mpath) as f:
        man = json.load(f)
    if not os.path.exists(dpath):
        row["status"] = "missing_data"
        return row
    nbytes = os.path.getsize(dpath)
    row["bytes"] = nbytes
    if nbytes != man["bytes"]:
        row["status"] = "bytes_mismatch"
        return row
    if not deep:
        row["rows"] = man["rows"]
        return row
    try:
        import pyarrow.parquet as pq
        t = pq.read_table(dpath, columns=[man["key_col"]])
    except Exception:
        row["status"] = "unreadable"
        return row
    row["rows"] = t.num_rows
    if t.num_rows != man["rows"]:
        row["status"] = "rows_mismatch"
        return row
    keys = np.sort(np.asarray(t[man["key_col"]]).astype(np.int64))
    khash = hashlib.sha256(keys.tobytes()).hexdigest()[:16]
    if khash != man["key_hash"]:
        row["status"] = "key_hash_mismatch"
    return row


def scrub_corpus(out_dir: str, *, deep: bool = True) -> pd.DataFrame:
    """Audit every expected shard -> (shard, status, rows, bytes).

    ``deep=False``: presence + byte-size check only (metadata stat
    scrub).  ``deep=True``: additionally re-read each shard's key column
    and re-hash it against the manifest (catches silent bitflips in the
    key column and row loss/duplication; payload-column corruption
    surfaces as ``unreadable`` via parquet page checksums when it breaks
    decoding).  Expected shard set comes from the run manifest when
    present (absent shard dirs are damage, not emptiness), else from the
    directories found.
    """
    import ray.data as rd

    run = lineage.read_run_manifest(out_dir)
    if run is not None:
        # prefer the recorded written-shard set: shards that received no
        # rows never got a dir, and their absence is NOT damage (old
        # manifests without the field fall back to every shard expected)
        expected = run.get("shards")
        if expected is None:
            expected = list(range(run["num_shards"]))
    else:
        expected = sorted(lineage.finished_shards(out_dir))
    if not expected:
        return pd.DataFrame(columns=["shard", "status", "rows", "bytes"])

    def check(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([_check_shard(out_dir, int(s), deep)
                             for s in batch["shard"]])

    ds = rd.from_items([{"shard": s} for s in expected])
    out = ds.map_batches(check, batch_format="pandas").to_pandas()
    return out.sort_values("shard", ignore_index=True)


def scrub_ok(report: pd.DataFrame) -> bool:
    return bool((report["status"] == "ok").all()) if len(report) else True
