"""type_token_ratio_batch (stages/text.py) vs a direct python split,
including repeated-token, empty and whitespace-only docs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from raster_processor_ray.stages.text import type_token_ratio_batch


def test_ttr_kernel_vs_python():
    texts = ["the cat sat on the mat",          # 6 tokens, 5 types
             "a a a a",                          # 4 tokens, 1 type
             "  leading and trailing  ",         # trimmed -> 3/3
             "",                                 # dropped
             "   ",                              # whitespace-only: dropped
             "one"]                              # 1/1
    b = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    out = type_token_ratio_batch(b).to_pandas()
    assert out["doc_id"].tolist() == [0, 1, 2, 5]
    want = []
    for t in texts:
        toks = t.strip(" ").split()
        if toks:
            want.append((len(toks), len(set(toks)),
                         len(set(toks)) * 1_000_000 // len(toks)))
    got = list(zip(out["n_tokens"], out["n_types"], out["ttr_u"]))
    assert got == want
    assert got[0] == (6, 5, 833333)
    assert got[1] == (4, 1, 250000)


def test_ttr_query_shape(ray_session):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em
    df = em.queries()["lang_ttr"]("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    assert set(df.columns) == {"lang", "n_docs", "mean_ttr_u"}
    assert df["mean_ttr_u"].between(0, 1_000_000).all()
