"""Edit-distance-1 string similarity self-join (FastSS deletion
neighborhoods) — fuzzy matching as a bounded candidate-generation +
exact-verify pipeline, the same two-phase shape as the MinHash and
n-gram Jaccard joins (stages/dedup.py, stages/setjoin.py).

Candidate generation uses the deletion-neighborhood property: two
strings within Levenshtein distance 1 share at least one member of
their 1-deletion neighborhoods (the string itself plus each
single-character deletion). Each row therefore emits len+1 64-bit
variant hashes; ONE groupby over variant hash co-locates every
candidate pair. Verification is exact and fully vectorized: pairs are
grouped by (len_a, len_b) and checked as fixed-width byte matrices —
equal-length pairs need a ≤1 mismatched-position count, length-±1
pairs a single-indel prefix/suffix test. No per-pair Python.

Scale shape: shuffle volume is Σ(len+1) id+hash rows (ids only — the
strings travel once, packed per bucket); hot variants (shared prefixes)
are bounded by the same group-size cap used for MinHash buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.hashing import fnv1a_64, splitmix64


def _deletion_variant_hashes(strs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """For each string: hash of the string itself and of each
    single-deletion variant. Returns (row_idx, hash) arrays.

    Vectorized per LENGTH GROUP: all strings of length L become an
    (n, L) byte matrix; variant d (delete position d) is the matrix
    with column d removed — hashed with one FNV pass per (L, d), not
    per string."""
    out_idx, out_hash = [], []
    enc = np.array([s.encode("utf-8") for s in strs], dtype=object)
    lens = np.array([len(b) for b in enc], dtype=np.int64)
    for L in np.unique(lens):
        rows = np.flatnonzero(lens == L)
        mat = np.frombuffer(b"".join(enc[rows]), dtype=np.uint8) \
            .reshape(len(rows), L)
        variants = [mat] + [np.delete(mat, d, axis=1) for d in range(L)]
        for v in variants:
            # row-hash: FNV over the variant bytes via arrow binary array
            flat = pa.Array.from_buffers(
                pa.binary(v.shape[1]), len(rows),
                [None, pa.py_buffer(np.ascontiguousarray(v).tobytes())])
            h = fnv1a_64(flat.cast(pa.binary()))
            # salt by variant LENGTH so "abc" (self) and the deletion
            # variants of "abcX" can meet, but unrelated lengths cannot
            out_idx.append(rows)
            out_hash.append(splitmix64(h ^ np.uint64(v.shape[1])))
    return np.concatenate(out_idx), np.concatenate(out_hash)


def _verify_pairs(sa: np.ndarray, sb: np.ndarray) -> np.ndarray:
    """Exact levenshtein(a, b) <= 1 for candidate pairs, vectorized by
    (len_a, len_b) group. Returns a bool mask."""
    ea = np.array([s.encode("utf-8") for s in sa], dtype=object)
    eb = np.array([s.encode("utf-8") for s in sb], dtype=object)
    la = np.array([len(b) for b in ea], dtype=np.int64)
    lb = np.array([len(b) for b in eb], dtype=np.int64)
    ok = np.zeros(len(sa), dtype=bool)
    # make a the shorter side
    swap = la > lb
    ea[swap], eb[swap] = eb[swap], ea[swap].copy()
    la, lb = np.minimum(la, lb), np.maximum(la, lb)
    for (A, B) in set(zip(la.tolist(), lb.tolist())):
        sel = np.flatnonzero((la == A) & (lb == B))
        if B - A > 1:
            continue
        if B == 0:                      # both empty
            ok[sel] = True
            continue
        mb = np.frombuffer(b"".join(eb[sel]), dtype=np.uint8) \
            .reshape(len(sel), B)
        if A == B:
            ma = np.frombuffer(b"".join(ea[sel]), dtype=np.uint8) \
                .reshape(len(sel), A)
            ok[sel] = (ma != mb).sum(axis=1) <= 1
        else:                           # B = A + 1: single indel
            if A == 0:
                ok[sel] = True
                continue
            ma = np.frombuffer(b"".join(ea[sel]), dtype=np.uint8) \
                .reshape(len(sel), A)
            eq_pre = ma == mb[:, :A]          # prefix match per position
            eq_suf = ma == mb[:, 1:]          # suffix match per position
            # longest common prefix p; a == b with one char deleted iff
            # suffix beyond p also matches
            pre_ok = np.concatenate(
                [np.ones((len(sel), 1), dtype=bool),
                 np.cumprod(eq_pre, axis=1, dtype=bool)], axis=1)  # (n, A+1)
            suf_ok = np.concatenate(
                [np.cumprod(eq_suf[:, ::-1], axis=1, dtype=bool)[:, ::-1],
                 np.ones((len(sel), 1), dtype=bool)], axis=1)      # (n, A+1)
            ok[sel] = (pre_ok & suf_ok).any(axis=1)
    return ok


def edit1_self_join(ds, id_col: str, str_col: str, *,
                    num_buckets: int = 64, max_bucket_pairs: int = 2_000_000):
    """All pairs (id_a < id_b) whose ``str_col`` values are within
    Levenshtein distance 1 (including exact duplicates, distance 0).

    One exchange: (variant_hash % B) buckets of (hash, id, str) rows;
    per bucket, pairs are emitted per identical hash (sorted runs, the
    minhash pair kernel shape), deduplicated, then exactly verified.
    ``max_bucket_pairs`` guards hot variants (a crowd of near-identical
    strings) from quadratic blowup — raise it deliberately."""
    from ..util import pin_for_shuffle

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        s = df[str_col].to_numpy(dtype=object)
        idx, h = _deletion_variant_hashes(s)
        out = pd.DataFrame({
            "h": h.astype(np.int64),
            id_col: df[id_col].to_numpy()[idx],
            str_col: s[idx],
        })
        out["_bucket"] = (h % np.uint64(num_buckets)).astype(np.int64)
        return out

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_bucket"]).drop_duplicates(["h", id_col])
        df = df.sort_values(["h", id_col], kind="mergesort") \
            .reset_index(drop=True)
        h = df.h.to_numpy()
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        counts = np.diff(np.append(starts, len(df)))
        n_pairs = int((counts * (counts - 1) // 2).sum())
        if n_pairs == 0:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64)})
        if n_pairs > max_bucket_pairs:
            raise ValueError(
                f"edit1_self_join: {n_pairs} candidate pairs in one "
                f"bucket exceeds max_bucket_pairs={max_bucket_pairs}; "
                "the data has a hot deletion variant — raise the cap or "
                "pre-deduplicate exact duplicates")
        ids = df[id_col].to_numpy()
        ss = df[str_col].to_numpy(dtype=object)
        ai, bi = [], []
        for st, c in zip(starts, counts):      # runs, not rows: bounded by
            if c < 2:                          # distinct hashes per bucket
                continue
            grid_a, grid_b = np.triu_indices(c, k=1)
            ai.append(st + grid_a)
            bi.append(st + grid_b)
        ai = np.concatenate(ai)
        bi = np.concatenate(bi)
        a_id, b_id = ids[ai], ids[bi]
        lo = np.minimum(a_id, b_id)
        hi = np.maximum(a_id, b_id)
        cand = pd.DataFrame({"id_a": lo, "id_b": hi,
                             "_sa": ss[ai], "_sb": ss[bi]})
        cand = cand.drop_duplicates(["id_a", "id_b"])
        keep = _verify_pairs(cand._sa.to_numpy(dtype=object),
                             cand._sb.to_numpy(dtype=object))
        return cand.loc[keep, ["id_a", "id_b"]]

    expanded = ds.map_batches(expand, batch_format="pandas")
    pairs = (pin_for_shuffle(expanded).groupby("_bucket")
             .map_groups(per_bucket, batch_format="pandas"))
    # a pair can surface from several shared variants that land in
    # DIFFERENT buckets -> one bounded distinct pass over id pairs
    from ..aggregate.relational import hash_aggregate
    distinct = hash_aggregate(pairs, ["id_a", "id_b"],
                              {"_n": (None, "count")},
                              num_buckets=max(2, num_buckets // 8))
    return distinct.map_batches(lambda df: df[["id_a", "id_b"]],
                                batch_format="pandas")
