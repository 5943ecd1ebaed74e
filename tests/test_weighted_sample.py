"""weighted_sample (pipelines/queries.py): A-Res top-k sampling is
deterministic, returns exactly k rows, and is biased toward heavy
weights."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def weights_sf(tmp_path):
    n = 5000
    # half the docs are 10x heavier
    w = np.where(np.arange(n) % 2 == 0, 1000, 100).astype(np.int64)
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "lang": "en", "source": "s", "text": "x",
                       "n_chars": w})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_weighted_sample_k_bias_determinism(weights_sf, ray_session):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    q = em.queries()["weighted_sample"]
    a = q(weights_sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = q(weights_sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)          # byte-identical reruns
    assert len(a) == 100
    assert a["doc_id"].is_unique                 # without replacement
    # 10x-weight docs should dominate the sample (expected ~91%)
    heavy = (a["n_chars"] == 1000).mean()
    assert heavy > 0.75, heavy
