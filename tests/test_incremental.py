"""Composed incremental-ingest loop (q_incremental_curation): probe the
persisted band index with the new batch, drop verified near-dups,
upsert survivors — corpus invariants hold."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_incremental_curation_invariants(ray_session):
    from raster_processor_ray.pipelines.queries import q_incremental_curation

    out = q_incremental_curation(SF).to_pandas()
    ids = out.doc_id.to_numpy()
    assert len(set(ids)) == len(ids), "duplicate ids in maintained corpus"
    orig = pd.read_parquet(f"{SF}/documents.parquet")["doc_id"]
    old = set(int(i) for i in orig if i % 5 != 0)
    new = set(int(i) for i in orig if i % 5 == 0)
    got = set(int(i) for i in ids)
    assert old <= got, "existing corpus docs must survive"
    assert got <= old | new, "no ids invented"
    # idempotent: running the loop again yields the same corpus
    out2 = q_incremental_curation(SF).to_pandas()
    assert set(int(i) for i in out2.doc_id) == got
