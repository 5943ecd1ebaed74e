"""Quality-canonical dedup composition (q_canonical_docs' stage chain):
the HIGHEST-quality member of a duplicate cluster survives, not the
minimum id."""

import pyarrow as pa
import ray.data as rd

from raster_processor_ray.aggregate.relational import grouped_topk
from raster_processor_ray.stages.cc import (attach_components,
                                            connected_components)
from raster_processor_ray.stages.dedup import minhash_near_dup_verified
from raster_processor_ray.stages.text import QualityScore


def test_canonical_keeps_highest_quality(ray_session):
    # docs 0/1 near-identical, but doc 1 is longer + stopword-rich ->
    # higher heuristic quality; doc 2 unrelated singleton.
    dup_core = ("the quick brown fox jumps over the lazy dog and then "
                "the fox runs into the quiet forest near the old river "
                "while the dog sleeps in the warm sun by the red barn ")
    texts = [
        dup_core,
        dup_core + "and the birds are singing in the tall green trees "
                   "because the morning is bright and the air is clear",
        "kernel panic socket buffer overflow trace dump register state",
    ]
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(texts)})
    docs = rd.from_arrow(t)
    pairs = minhash_near_dup_verified(docs, num_perm=64, num_bands=16,
                                      threshold=0.6)
    assert sorted(map(tuple, pairs.to_pandas()[["id_a", "id_b"]]
                      .to_numpy())) == [(0, 1)]
    labels = connected_components(pairs, u_col="id_a", v_col="id_b")
    scored = docs.map_batches(QualityScore, batch_format="pandas",
                              concurrency=1, num_cpus=0.5)
    sq = scored.to_pandas().set_index("doc_id").quality
    assert sq[1] > sq[0], "fixture must make doc 1 the better copy"
    labeled = attach_components(
        scored.map_batches(lambda df: df[["doc_id", "quality"]],
                           batch_format="pandas"),
        labels, id_col="doc_id")
    best = grouped_topk(labeled, "comp", "quality", 1,
                        descending=True, tie_col="doc_id").to_pandas()
    assert sorted(best.doc_id.tolist()) == [1, 2]  # NOT min-id (0)
