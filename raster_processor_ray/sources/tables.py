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


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               **kwargs) -> rd.Dataset:
    """``ray.data.read_parquet`` with explicit column pruning."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    return rd.read_parquet(table_path(sf_dir, name), columns=columns, **kwargs)


def read_pages(path: str, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    """Read a pages parquet dataset (file, dir, or list of shards)."""
    return rd.read_parquet(path, columns=columns, **kwargs)
