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


def write_resumable(ds, out_dir: str, *, key_col: str, num_shards: int = 64,
                    sort_cols: list[str] | None = None,
                    shard_col: str = "out_shard") -> pd.DataFrame:
    """Write ``ds`` partitioned by bounded shard with lineage manifests;
    skips shards already finished (resume). Returns the manifest table.

    Each shard is written by the task that owns its group (atomic tmp ->
    rename), so retries and reruns are idempotent.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = finished_shards(out_dir)
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

    res = ds.groupby(shard_col).map_groups(write_shard, batch_format="pandas")
    return res.to_pandas()


def read_resumable(out_dir: str):
    """Read back a resumable layout as one Dataset."""
    import ray.data as rd
    paths = [os.path.join(_shard_dir(out_dir, s), "data.parquet")
             for s in sorted(finished_shards(out_dir))]
    return rd.read_parquet(paths)


def manifest_summary(out_dir: str) -> pd.DataFrame:
    rows = []
    for s in sorted(finished_shards(out_dir)):
        with open(os.path.join(_shard_dir(out_dir, s), "MANIFEST.json")) as f:
            rows.append(json.load(f))
    return pd.DataFrame(rows)
