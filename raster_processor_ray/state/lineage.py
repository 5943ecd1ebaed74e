"""Resumable partitioned output with per-partition lineage manifests.

The reference's only resume story is "skip the file if the output
exists" (make_raster_region_maps.py:69-71, 94-96). At 100 TB a failed run
must skip *finished partitions* and re-run only missing ones, including
mid-shuffle (north_rule): so both the final cells AND the post-map
pre-combine partial-aggregate dataset can be checkpointed.

Layout::

    out_dir/
      shard=00017/
        data.parquet          # written to *.tmp then renamed (atomic)
        MANIFEST.json         # rows, bytes, key range, content hash, stage versions

A rerun reads the manifests first and filters finished shards out of the
input — work planning is O(shards), not O(rows). The shard key has
BOUNDED cardinality (``num_shards``), unlike raw ``tile_id`` (a
partitioned write by fine tile id dies at pyarrow's 1024-partitions-per-
fragment limit and scatters millions of tiny files at scale).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

STAGE_VERSION = 1  # bump when aggregation semantics change (invalidates manifests)


def shard_of(keys: np.ndarray, num_shards: int) -> np.ndarray:
    """Deterministic bounded shard id from an int64 key column."""
    return (keys.astype(np.int64) % num_shards + num_shards) % num_shards


def add_shard_column(ds, key_col: str, num_shards: int, shard_col: str = "out_shard"):
    def add(b: pa.Table) -> pa.Table:
        return b.append_column(
            shard_col, pa.array(shard_of(np.asarray(b[key_col]), num_shards)))
    return ds.map_batches(add, batch_format="pyarrow")


def _shard_dir(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"shard={shard:05d}")


# ---------------------------------------------------------------------------
# run-level manifest: completeness + staleness
# ---------------------------------------------------------------------------
# A shard-level manifest proves that ONE shard finished; it cannot prove
# the RUN finished (an absent shard dir is indistinguishable from an empty
# shard), nor that the shards belong to the current input. The run-level
# manifest records (num_shards, input fingerprint, complete flag):
# resume logic may skip the write phase only when `is_complete` holds.

def _run_manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_RUN.json")


def read_run_manifest(out_dir: str) -> dict | None:
    p = _run_manifest_path(out_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _write_run_manifest(out_dir: str, manifest: dict) -> None:
    tmp = _run_manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _run_manifest_path(out_dir))


def input_fingerprint_from_paths(paths) -> str:
    """Cheap input-identity fingerprint: sorted (path, size, mtime_ns)."""
    if isinstance(paths, str):
        paths = [paths]
    items = []
    for p in sorted(paths):
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                for fn in sorted(files):
                    fp = os.path.join(root, fn)
                    st = os.stat(fp)
                    items.append(f"{fp}:{st.st_size}:{st.st_mtime_ns}")
        elif os.path.exists(p):
            st = os.stat(p)
            items.append(f"{p}:{st.st_size}:{st.st_mtime_ns}")
        else:
            items.append(f"{p}:absent")
    return hashlib.sha256("\n".join(items).encode()).hexdigest()[:16]


def is_complete(out_dir: str, *, input_fingerprint: str | None = None,
                num_shards: int | None = None) -> bool:
    """True iff a previous ``write_resumable`` ran to completion here,
    with matching stage version, shard count and input fingerprint —
    the ONLY condition under which a resume may skip recomputation."""
    m = read_run_manifest(out_dir)
    if not m or not m.get("complete") or m.get("stage_version") != STAGE_VERSION:
        return False
    if num_shards is not None and m.get("num_shards") != num_shards:
        return False
    if (input_fingerprint is not None
            and m.get("input_fingerprint") != input_fingerprint):
        return False
    return True


def _clear_output_dir(out_dir: str) -> None:
    import shutil
    for name in os.listdir(out_dir):
        if name.startswith("shard="):
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
    p = _run_manifest_path(out_dir)
    if os.path.exists(p):
        os.remove(p)


def finished_shards(out_dir: str) -> set[int]:
    """Shards whose manifest exists and matches the current stage version."""
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        mpath = os.path.join(out_dir, name, "MANIFEST.json")
        if name.startswith("shard=") and os.path.exists(mpath):
            with open(mpath) as f:
                m = json.load(f)
            if m.get("stage_version") == STAGE_VERSION:
                done.add(int(name.split("=")[1]))
    return done


def prepare_resumable(out_dir: str, *, key_col: str, num_shards: int,
                      input_fingerprint: str | None = None) -> set[int]:
    """Validate/initialize a resumable output dir and return the set of
    already-finished shard ids that may be SKIPPED.

    Existing shards are reused ONLY when the run manifest matches (same
    stage version, shard count, key column and input fingerprint); a
    stale or mismatched output dir is cleared first — a shard from a
    different input must never survive. Marks the run incomplete until
    :func:`complete_run`.
    """
    os.makedirs(out_dir, exist_ok=True)
    prev = read_run_manifest(out_dir)
    if prev is not None and (
            prev.get("stage_version") != STAGE_VERSION
            or prev.get("num_shards") != num_shards
            or prev.get("key_col") != key_col
            or (input_fingerprint is not None
                and prev.get("input_fingerprint") != input_fingerprint)):
        _clear_output_dir(out_dir)
        prev = None
    if prev is None and finished_shards(out_dir):
        # shard manifests with no run manifest: unknown provenance
        _clear_output_dir(out_dir)
    _write_run_manifest(out_dir, {
        "complete": False, "num_shards": num_shards, "key_col": key_col,
        "input_fingerprint": input_fingerprint, "stage_version": STAGE_VERSION,
    })
    return finished_shards(out_dir)


def complete_run(out_dir: str, *, key_col: str, num_shards: int,
                 input_fingerprint: str | None = None,
                 shards: list[int] | None = None) -> None:
    """Mark a resumable output dir complete.

    ``shards``: the shard ids that actually RECEIVED rows. A groupby
    write yields no group — hence no shard dir — for an empty shard, so
    a complete undamaged layout can legitimately lack some of
    ``range(num_shards)``; recording the written set lets the scrub
    distinguish "never existed" from "deleted". ``None`` keeps the old
    behavior (every shard expected)."""
    m = {
        "complete": True, "num_shards": num_shards, "key_col": key_col,
        "input_fingerprint": input_fingerprint, "stage_version": STAGE_VERSION,
    }
    if shards is not None:
        m["shards"] = sorted(int(s) for s in shards)
    _write_run_manifest(out_dir, m)


def write_shard_table(df: pd.DataFrame, out_dir: str, shard: int, *,
                      key_col: str, sort_cols: list[str] | None = None) -> dict:
    """Write one shard's rows + manifest (atomic tmp -> rename,
    idempotent under retries). Returns the shard manifest dict."""
    if sort_cols:
        df = df.sort_values(sort_cols, kind="mergesort")
    sdir = _shard_dir(out_dir, shard)
    os.makedirs(sdir, exist_ok=True)
    tmp = os.path.join(sdir, "data.parquet.tmp")
    table = pa.Table.from_pandas(df, preserve_index=False)
    pq.write_table(table, tmp)
    # content hash over the key column (cheap, order-independent rows check)
    keys = np.sort(df[key_col].to_numpy(dtype=np.int64))
    khash = hashlib.sha256(keys.tobytes()).hexdigest()[:16]
    manifest = {
        "shard": shard,
        "rows": int(len(df)),
        "bytes": int(os.path.getsize(tmp)),
        "key_col": key_col,
        "key_min": int(keys[0]) if len(keys) else None,
        "key_max": int(keys[-1]) if len(keys) else None,
        "key_hash": khash,
        "stage_version": STAGE_VERSION,
    }
    os.replace(tmp, os.path.join(sdir, "data.parquet"))
    mtmp = os.path.join(sdir, "MANIFEST.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
    os.replace(mtmp, os.path.join(sdir, "MANIFEST.json"))
    return manifest


def write_resumable(ds, out_dir: str, *, key_col: str, num_shards: int = 64,
                    sort_cols: list[str] | None = None,
                    shard_col: str = "out_shard",
                    input_fingerprint: str | None = None) -> pd.DataFrame:
    """Write ``ds`` partitioned by bounded shard with lineage manifests;
    skips shards already finished (resume) and records a RUN-level
    manifest marking completion. Returns the manifest table.

    Each shard is written by the task that owns its group (atomic tmp ->
    rename), so retries and reruns are idempotent; staleness/provenance
    guards are in :func:`prepare_resumable`.
    """
    done = prepare_resumable(out_dir, key_col=key_col, num_shards=num_shards,
                             input_fingerprint=input_fingerprint)
    ds = add_shard_column(ds, key_col, num_shards, shard_col)
    if done:
        done_arr = pa.array(sorted(done), type=pa.int64())

        def drop_done(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return b.filter(pc.invert(pc.is_in(b[shard_col], value_set=done_arr)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        shard = int(df[shard_col].iloc[0])
        df = df.drop(columns=[shard_col])
        if sort_cols:
            df = df.sort_values(sort_cols, kind="mergesort")
        sdir = _shard_dir(out_dir, shard)
        os.makedirs(sdir, exist_ok=True)
        tmp = os.path.join(sdir, "data.parquet.tmp")
        table = pa.Table.from_pandas(df, preserve_index=False)
        pq.write_table(table, tmp)
        # content hash over the key column (cheap, order-independent rows check)
        keys = np.sort(df[key_col].to_numpy(dtype=np.int64))
        khash = hashlib.sha256(keys.tobytes()).hexdigest()[:16]
        manifest = {
            "shard": shard,
            "rows": int(len(df)),
            "bytes": int(os.path.getsize(tmp)),
            "key_col": key_col,
            "key_min": int(keys[0]) if len(keys) else None,
            "key_max": int(keys[-1]) if len(keys) else None,
            "key_hash": khash,
            "stage_version": STAGE_VERSION,
        }
        os.replace(tmp, os.path.join(sdir, "data.parquet"))
        mtmp = os.path.join(sdir, "MANIFEST.json.tmp")
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, os.path.join(sdir, "MANIFEST.json"))
        return pd.DataFrame([{k: v for k, v in manifest.items()
                              if k in ("shard", "rows", "bytes", "key_hash")}])

    from ..util import pin_for_shuffle

    res = pin_for_shuffle(ds).groupby(shard_col).map_groups(
        write_shard, batch_format="pandas")
    out = res.to_pandas()
    # record which shards actually received rows: empty shards produce
    # no group (and no dir), and the scrub must not read their absence
    # as damage (skewed layouts — e.g. an IVF bucket with no vectors —
    # make this routine)
    written = set(int(s) for s in out["shard"]) | set(done)
    complete_run(out_dir, key_col=key_col, num_shards=num_shards,
                 input_fingerprint=input_fingerprint,
                 shards=sorted(written))
    return out


def read_resumable(out_dir: str):
    """Read back a resumable layout as one Dataset."""
    import ray.data as rd
    paths = [os.path.join(_shard_dir(out_dir, s), "data.parquet")
             for s in sorted(finished_shards(out_dir))]
    # partitioning=None: don't hive-infer a "shard" column from the
    # shard=NNNNN directory names — the shard is layout, not data
    return rd.read_parquet(paths, partitioning=None)


def clone_corpus_cow(src_dir: str, dst_dir: str) -> None:
    """Copy-on-write clone of a resumable corpus layout: hardlink every
    file into ``dst_dir`` — O(files) metadata ops, zero data copied.

    Safe because EVERY mutation path in this engine (write_shard_table,
    _write_run_manifest, upsert.apply_changeset) writes tmp ->
    ``os.replace``, which swaps the directory entry and never writes
    through an existing inode: mutating the clone rewrites only the
    clone's entries while the source's files stay byte-identical.
    Falls back to a real copy when the link crosses filesystems.

    This is how an incremental-ingest run takes a private writable view
    of a multi-TB persisted corpus without re-materializing it — the
    run pays only for the shards its changeset actually touches."""
    import shutil
    os.makedirs(dst_dir, exist_ok=True)
    for root, _dirs, files in os.walk(src_dir):
        rel = os.path.relpath(root, src_dir)
        troot = dst_dir if rel == "." else os.path.join(dst_dir, rel)
        os.makedirs(troot, exist_ok=True)
        for fn in files:
            s, t = os.path.join(root, fn), os.path.join(troot, fn)
            if os.path.exists(t):
                os.remove(t)
            try:
                os.link(s, t)
            except OSError:
                shutil.copy2(s, t)


def manifest_summary(out_dir: str) -> pd.DataFrame:
    rows = []
    for s in sorted(finished_shards(out_dir)):
        with open(os.path.join(_shard_dir(out_dir, s), "MANIFEST.json")) as f:
            rows.append(json.load(f))
    return pd.DataFrame(rows)
