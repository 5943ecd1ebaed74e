"""zipf_slope query kernel vs direct numpy on a constructed corpus."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def zipf_sf(tmp_path):
    # one language, vocabulary with exactly Zipfian counts c_r = 1200//r
    rng = np.random.default_rng(2)
    words, freqs = [], []
    for r in range(1, 41):
        words.append(f"w{r:02d}")
        freqs.append(1200 // r)
    toks = np.repeat(words, freqs)
    rng.shuffle(toks)
    # split into docs of ~50 tokens
    texts = [" ".join(toks[i:i + 50]) for i in range(0, len(toks), 50)]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "lang": "en", "source": "s",
                       "n_chars": np.int64(1), "text": texts})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/documents.parquet")
    return str(tmp_path), words, freqs


def test_zipf_slope_matches_direct(zipf_sf, ray_session):
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as em

    sf, words, freqs = zipf_sf
    got = em.queries()["zipf_slope"](sf).to_pandas()
    assert len(got) == 1 and got["k_terms"].iloc[0] == 40
    # direct least squares over (ln rank, ln freq), ranks by (n desc, tok)
    order = sorted(range(len(words)), key=lambda i: (-freqs[i], words[i]))
    y = np.log(np.array([freqs[i] for i in order], dtype=np.float64))
    x = np.log(np.arange(1, len(order) + 1, dtype=np.float64))
    k = float(len(x))
    want = np.round((k * (x * y).sum() - x.sum() * y.sum())
                    / (k * (x * x).sum() - x.sum() ** 2), 6)
    assert got["zipf_slope"].iloc[0] == want
    # a 1/r law has slope near -1
    assert -1.1 < want < -0.9
