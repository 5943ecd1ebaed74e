"""Corpus scrub (state/scrub.py): a clean layout audits ok; each damage
class is localized to exactly the damaged shard."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from raster_processor_ray.state.lineage import write_resumable
from raster_processor_ray.state.scrub import scrub_corpus, scrub_ok


@pytest.fixture()
def layout(ray_session, tmp_path):
    out = str(tmp_path / "corpus")
    df = pd.DataFrame({"k": np.arange(500, dtype=np.int64),
                       "v": np.arange(500, dtype=np.int64) * 3})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    write_resumable(ds, out, key_col="k", num_shards=8,
                    input_fingerprint="t")
    return out


def _sdir(out, s):
    return os.path.join(out, f"shard={s:05d}")


def test_clean_layout_is_ok(layout):
    rep = scrub_corpus(layout)
    assert scrub_ok(rep)
    assert len(rep) == 8
    assert rep.rows.sum() == 500


def test_damage_classes_localized(layout):
    # shard 1: drop a row (rows + key hash change, size changes too ->
    # caught as bytes_mismatch at the cheap tier)
    d1 = os.path.join(_sdir(layout, 1), "data.parquet")
    t = pq.read_table(d1)
    pq.write_table(t.slice(1), d1)
    # shard 2: silently swap a key VALUE keeping count (deep-only catch);
    # rewrite + forge manifest bytes so the stat tier passes
    d2 = os.path.join(_sdir(layout, 2), "data.parquet")
    t2 = pq.read_table(d2).to_pandas()
    t2.loc[0, "k"] = 99_999
    pq.write_table(pa.Table.from_pandas(t2, preserve_index=False), d2)
    m2 = os.path.join(_sdir(layout, 2), "MANIFEST.json")
    man = json.load(open(m2))
    man["bytes"] = os.path.getsize(d2)
    json.dump(man, open(m2, "w"))
    # shard 3: data file deleted
    os.remove(os.path.join(_sdir(layout, 3), "data.parquet"))
    # shard 4: manifest deleted
    os.remove(os.path.join(_sdir(layout, 4), "MANIFEST.json"))

    rep = scrub_corpus(layout).set_index("shard")
    assert not scrub_ok(rep.reset_index())
    assert rep.loc[1, "status"] == "bytes_mismatch"
    assert rep.loc[2, "status"] == "key_hash_mismatch"
    assert rep.loc[3, "status"] == "missing_data"
    assert rep.loc[4, "status"] == "missing_manifest"
    for s in (0, 5, 6, 7):
        assert rep.loc[s, "status"] == "ok", s

    # shallow scrub: stat-tier damage only
    shallow = scrub_corpus(layout, deep=False).set_index("shard")
    assert shallow.loc[1, "status"] == "bytes_mismatch"
    assert shallow.loc[2, "status"] == "ok"      # needs the deep tier
    assert shallow.loc[3, "status"] == "missing_data"


def test_empty_shard_is_not_damage(ray_session, tmp_path):
    """A shard that received NO rows gets no dir from the groupby write;
    the scrub must read its absence as emptiness, not damage (regression:
    skewed layouts such as an IVF bucket with no vectors)."""
    out = str(tmp_path / "skewed")
    # keys k % 8 != 3 -> shard 3 is legitimately empty
    ks = np.array([k for k in range(200) if k % 8 != 3], dtype=np.int64)
    ds = rd.from_arrow(pa.Table.from_pandas(
        pd.DataFrame({"k": ks, "v": ks * 2}), preserve_index=False))
    write_resumable(ds, out, key_col="k", num_shards=8,
                    input_fingerprint="t")
    assert not os.path.isdir(_sdir(out, 3))
    rep = scrub_corpus(out)
    assert scrub_ok(rep), rep
    assert 3 not in set(rep["shard"])
    # deleting a NON-empty shard is still damage
    import shutil
    shutil.rmtree(_sdir(out, 4))
    rep2 = scrub_corpus(out)
    assert not scrub_ok(rep2)
    assert (rep2.loc[rep2["shard"] == 4, "status"] == "missing_shard").all()
