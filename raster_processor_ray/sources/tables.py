"""Readers for the driver-generated testdata tables (TESTDATA.md) with
column pruning at the read — a read that loads all columns for a
2-column transform is wrong at 100 TB.
"""

from __future__ import annotations

import os

import ray.data as rd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Ray splits reads to ~2x CPUs blocks regardless of size; a 300 KB dim
# table then runs 64 near-empty tasks through EVERY downstream stage and
# fixed task latency dominates the query. Cap blocks by bytes instead:
# one block per _SPLIT_BYTES of compressed file (~4 MB ≈ 20-40 MB in
# memory), floor 1, per-call cap 256 (a bigger corpus arrives as many
# files, each its own read task, so the cap never starves a real read).
_SPLIT_BYTES = 4 << 20


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               **kwargs) -> rd.Dataset:
    """``ray.data.read_parquet`` with explicit column pruning and
    size-aware block sizing (see _SPLIT_BYTES note)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    path = table_path(sf_dir, name)
    if "override_num_blocks" not in kwargs:
        try:
            nbytes = os.path.getsize(path)
            kwargs["override_num_blocks"] = max(
                1, min(256, (nbytes + _SPLIT_BYTES - 1) // _SPLIT_BYTES))
        except OSError:
            pass
    return rd.read_parquet(path, columns=columns, **kwargs)


def read_pages(path: str, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    """Read a pages parquet dataset (file, dir, or list of shards)."""
    return rd.read_parquet(path, columns=columns, **kwargs)


def read_any(path: str, columns: list[str] | None = None,
             **kwargs) -> rd.Dataset:
    """Format-dispatching reader: .parquet (column-pruned at the read),
    .csv, .json/.jsonl (line-delimited) — Ray Data natives behind one
    entry point. Non-parquet formats are row-oriented text: column
    pruning can only happen AFTER parse, so ``columns`` becomes a
    post-read projection for them (prefer parquet for anything large —
    this exists for ingest interop, not the hot path)."""
    low = path.lower()
    if low.endswith((".parquet", ".pq")) or os.path.isdir(path):
        return rd.read_parquet(path, columns=columns, **kwargs)
    if low.endswith(".csv"):
        ds = rd.read_csv(path, **kwargs)
    elif low.endswith((".json", ".jsonl", ".ndjson")):
        ds = rd.read_json(path, **kwargs)
    else:
        raise ValueError(f"unsupported source format: {path}")
    if columns:
        ds = ds.select_columns(columns)
    return ds
