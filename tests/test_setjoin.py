"""Exact n-gram Jaccard set-similarity join: brute-force oracle parity
(prefix filtering must lose NO pair above the threshold) + kernel tests."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from raster_processor_ray.stages.setjoin import (_gram_sets,
                                                 _word_gram_hashes,
                                                 ngram_jaccard_join)


def _brute_pairs(ids, texts, n, t):
    sets = _gram_sets(texts, n)
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sets[i], sets[j]
            if len(a) == 0 or len(b) == 0:
                continue
            inter = len(np.intersect1d(a, b, assume_unique=True))
            jac = inter / (len(a) + len(b) - inter)
            if jac >= t:
                lo, hi = sorted((ids[i], ids[j]))
                out.append((lo, hi, round(jac, 9)))
    return sorted(out)


def _run(ids, texts, n, t):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string())}))
    df = ngram_jaccard_join(ds, ngram=n, threshold=t).to_pandas()
    return sorted((int(a), int(b), round(float(j), 9))
                  for a, b, j in zip(df.id_a, df.id_b, df.jaccard))


def _synth_corpus(rng, n_docs=120):
    """Docs with planted near-duplicate cliques + noise docs."""
    vocab = [f"w{i}" for i in range(50)]
    texts, ids = [], []
    base = " ".join(rng.choice(vocab, 40))
    for i in range(n_docs):
        ids.append(i)
        kind = i % 4
        if kind == 0:   # exact duplicate clique
            texts.append(base)
        elif kind == 1:  # near duplicate: perturb a few tokens
            toks = base.split(" ")
            for p in rng.integers(0, len(toks), 3):
                toks[p] = str(rng.choice(vocab))
            texts.append(" ".join(toks))
        elif kind == 2:  # random doc
            texts.append(" ".join(rng.choice(vocab, 30)))
        else:            # short doc (< n tokens) -> no grams
            texts.append("one two")
    return ids, texts


class TestWordGramKernel:
    def test_short_and_empty_docs(self):
        sets = _gram_sets(["", "a b", "a b c", "a b c d"], 3)
        assert len(sets[0]) == 0 and len(sets[1]) == 0
        assert len(sets[2]) == 1
        assert len(sets[3]) == 2

    def test_unique_within_doc(self):
        # "x y x y x y x y" has only 2 distinct 3-grams
        sets = _gram_sets(["x y x y x y x y"], 3)
        assert len(sets[0]) == 2

    def test_identical_docs_identical_sets(self):
        doc_idx, gh = _word_gram_hashes(["p q r s t", "p q r s t"], 3)
        a, b = gh[doc_idx == 0], gh[doc_idx == 1]
        assert np.array_equal(a, b) and len(a) == 3


class TestNgramJaccardJoin:
    def test_vs_bruteforce(self, ray_session):
        rng = np.random.default_rng(3)
        ids, texts = _synth_corpus(rng)
        got = _run(ids, texts, 3, 0.5)
        want = _brute_pairs(ids, texts, 3, 0.5)
        assert got == want
        assert len(got) > 100  # the planted cliques must surface

    def test_low_threshold_no_misses(self, ray_session):
        """Prefix length grows as threshold drops; still exact."""
        rng = np.random.default_rng(5)
        ids, texts = _synth_corpus(rng, n_docs=60)
        got = _run(ids, texts, 3, 0.2)
        assert got == _brute_pairs(ids, texts, 3, 0.2)

    def test_size_filter_keeps_boundary_pair(self, ray_session):
        # |A|=4 grams, |B|=2 grams sharing both: jac = 2/4 = 0.5 exactly
        texts = ["a b c d e f", "a b c d"]
        got = _run([1, 2], texts, 3, 0.5)
        assert got == _brute_pairs([1, 2], texts, 3, 0.5)
        assert len(got) == 1 and got[0][2] == 0.5
