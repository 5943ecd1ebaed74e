"""Incremental corpus maintenance (state/upsert.py): merge correctness
against a pandas reference, untouched shards never rewritten, provenance
fingerprint advanced, changeset-key uniqueness enforced."""

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raster_processor_ray.state.lineage import (read_resumable,
                                                read_run_manifest,
                                                shard_of, write_resumable)
from raster_processor_ray.state.upsert import apply_changeset


def _build_corpus(tmp_path, n=1000, shards=8):
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": [f"t{i}" for i in range(n)],
                       "score": np.arange(n, dtype=np.float64) / 10.0})
    out = str(tmp_path / "corpus")
    write_resumable(rd.from_pandas(df), out, key_col="doc_id",
                    num_shards=shards, input_fingerprint="orig")
    return out, df


def _shard_mtimes(corpus):
    return {d: os.path.getmtime(os.path.join(corpus, d, "data.parquet"))
            for d in os.listdir(corpus) if d.startswith("shard=")}


def test_apply_changeset(tmp_path, ray_session):
    corpus, df = _build_corpus(tmp_path)
    before = _shard_mtimes(corpus)

    # deletes, replacements and inserts confined to a few keys
    chg = pd.DataFrame({
        "doc_id": np.asarray([3, 11, 500, 2000, 2001], dtype=np.int64),
        "text": ["", "", "t500-new", "t2000", "t2001"],
        "score": [0.0, 0.0, -1.0, 5.0, 6.0],
        "op": ["delete", "delete", "upsert", "upsert", "upsert"],
    })
    affected = set(shard_of(chg.doc_id.to_numpy(), 8).tolist())
    time.sleep(0.05)
    man = apply_changeset(corpus, rd.from_pandas(chg), key_col="doc_id")
    assert set(man["shard"]) == affected

    # pandas reference merge
    want = df[~df.doc_id.isin([3, 11, 500])]
    want = pd.concat([want, chg[chg.op == "upsert"].drop(columns="op")],
                     ignore_index=True).sort_values("doc_id")
    got = read_resumable(corpus).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))

    # untouched shards: bytes on disk never rewritten
    after = _shard_mtimes(corpus)
    for d, t in before.items():
        s = int(d.split("=")[1])
        if s not in affected:
            assert after[d] == t, f"{d} rewritten without changes"
        else:
            assert after[d] > t
    # provenance advanced
    assert read_run_manifest(corpus)["input_fingerprint"].startswith("chg:")


def test_changeset_guards(tmp_path, ray_session):
    corpus, _ = _build_corpus(tmp_path, n=100, shards=4)
    dup = pd.DataFrame({"doc_id": np.asarray([1, 1], dtype=np.int64),
                        "text": ["a", "b"], "score": [0.0, 0.0],
                        "op": ["upsert", "upsert"]})
    with pytest.raises(Exception, match="duplicate keys"):
        apply_changeset(corpus, rd.from_pandas(dup),
                        key_col="doc_id").to_string()
    with pytest.raises(ValueError, match="not a complete"):
        apply_changeset(str(tmp_path / "nope"), rd.from_pandas(dup),
                        key_col="doc_id")


def test_reshard_corpus(tmp_path, ray_session):
    from raster_processor_ray.state.upsert import reshard_corpus
    corpus, df = _build_corpus(tmp_path, n=500, shards=16)
    dst = str(tmp_path / "compact")
    man = reshard_corpus(corpus, dst, 4)
    assert len(man) == 4 and man.rows.sum() == 500
    got = read_resumable(dst).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  df.reset_index(drop=True))
    # source untouched, destination provenance chains
    assert read_run_manifest(corpus)["input_fingerprint"] == "orig"
    assert read_run_manifest(dst)["input_fingerprint"].startswith("reshard(")


def test_clone_corpus_cow(tmp_path, ray_session):
    """Hardlink clone: zero data copied (shared inodes), mutating the
    clone rewrites only the clone's touched shards, and the source
    corpus stays byte-identical (inode + mtime + content)."""
    from raster_processor_ray.state.lineage import clone_corpus_cow

    corpus, df = _build_corpus(tmp_path)
    clone = str(tmp_path / "clone")
    clone_corpus_cow(corpus, clone)

    def inodes(root):
        return {d: os.stat(os.path.join(root, d, "data.parquet")).st_ino
                for d in os.listdir(root) if d.startswith("shard=")}

    src_ino, cl_ino = inodes(corpus), inodes(clone)
    assert src_ino == cl_ino                       # all shards shared
    src_before = _shard_mtimes(corpus)

    chg = pd.DataFrame({
        "doc_id": np.asarray([7, 3000], dtype=np.int64),
        "text": ["t7-new", "t3000"], "score": [1.0, 2.0],
        "op": ["upsert", "upsert"]})
    affected = set(shard_of(chg.doc_id.to_numpy(), 8).tolist())
    time.sleep(0.05)
    apply_changeset(clone, rd.from_pandas(chg), key_col="doc_id")

    # source untouched: same inodes, same mtimes, same rows
    assert inodes(corpus) == src_ino
    assert _shard_mtimes(corpus) == src_before
    got_src = read_resumable(corpus).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(got_src.reset_index(drop=True),
                                  df.sort_values("doc_id")
                                  .reset_index(drop=True))
    # clone: only affected shards diverged from the source inode
    cl_after = inodes(clone)
    for d, ino in cl_ino.items():
        s = int(d.split("=")[1])
        assert (cl_after[d] != ino) == (s in affected), d
    # clone content reflects the changeset
    got = read_resumable(clone).to_pandas()
    assert got[got.doc_id == 7].text.iloc[0] == "t7-new"
    assert (got.doc_id == 3000).sum() == 1
