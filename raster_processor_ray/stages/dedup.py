"""Deduplication operators over document tables.

The reference's only dedup is the exact composite-key keep-first on the
TVP table (``np.unique`` on (time, swath_side) then gather, reference
products.py:2216-2226) — generalized here to web-scale document dedup:

- ``exact_dedup``       hash-partition by key -> per-group first (D1 analog)
- ``minhash_lsh_dedup`` shingle -> minhash -> band -> bucket-groupby near-dup
- ``simhash``           64-bit simhash fingerprints + hamming-bucket dedup
- ``ngram_jaccard``     exact n-gram Jaccard verification for candidate pairs

All hot paths are vectorized per batch; the only shuffles are the
key/bucket groupbys, which move keys + ids (never the document text).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.hashing import fnv1a_64, splitmix64

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds, key: str, order_by: str | list[str] | None = None, *,
                num_buckets: int = 64):
    """Keep exactly one row per ``key``: the one with the smallest
    ``order_by`` value(s) (pass a list for deterministic tie-breaks);
    without ``order_by``, the first row in (key)-sorted order wins.

    Implementation: bucket by ``hash(key) % B`` so the shuffle groups by
    bucket (vectorized pandas keep-first inside each bucket, one Python
    call per bucket — not per key).
    """

    def add_bucket(b: pa.Table) -> pa.Table:
        h = fnv1a_64(b[key].cast(pa.string()))
        return b.append_column("_bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    if order_by is None:
        order_by = []
    elif isinstance(order_by, str):
        order_by = [order_by]
    sort_cols = [key] + order_by

    def first_per_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_bucket"]).sort_values(sort_cols, kind="mergesort")
        return df.drop_duplicates(subset=[key], keep="first")

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(first_per_key, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# shingling + MinHash
# ---------------------------------------------------------------------------

def _char_shingle_hashes(texts: list[str], k: int = 5) -> list[np.ndarray]:
    """Per doc: uint64 hashes of its k-char shingles (vectorized per doc
    via stride tricks over the byte buffer)."""
    out = []
    for t in texts:
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        if len(b) < k:
            out.append(np.array([0], dtype=np.uint64) if len(b) == 0 else
                       _hash_windows(b[None, :]))
            continue
        windows = np.lib.stride_tricks.sliding_window_view(b, k)
        out.append(_hash_windows(windows))
    return out


def _hash_windows(windows: np.ndarray) -> np.ndarray:
    """FNV-1a over each row of a (n, k) uint8 matrix — vectorized over n."""
    h = np.full(windows.shape[0], 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for col in range(windows.shape[1]):
            h = (h ^ windows[:, col].astype(np.uint64)) * prime
    return np.unique(h)


_MH_A = splitmix64(np.arange(1, 257, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
_MH_B = splitmix64(np.arange(1001, 1257, dtype=np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))


def minhash_signature(shingle_hashes: np.ndarray, num_perm: int = 128) -> np.ndarray:
    """MinHash signature via universal hashing h_i(x) = a_i*x + b_i (mod 2^64)."""
    if len(shingle_hashes) == 0:
        return np.full(num_perm, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    with np.errstate(over="ignore"):
        m = shingle_hashes[None, :] * _MH_A[:num_perm, None] + _MH_B[:num_perm, None]
    return m.min(axis=1)


def minhash_signatures_batch(texts: list[str], num_perm: int = 128,
                             shingle_k: int = 5) -> np.ndarray:
    """(ndocs, num_perm) MinHash signatures, vectorized ACROSS docs:
    one concatenated shingle-hash array + ``np.minimum.reduceat`` per
    permutation (no per-doc Python in the permutation loop)."""
    shingles = _char_shingle_hashes(texts, shingle_k)
    lengths = np.array([len(s) for s in shingles], dtype=np.int64)
    starts = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    h = (np.concatenate(shingles) if len(shingles) else
         np.empty(0, dtype=np.uint64))
    sig = np.full((len(texts), num_perm), np.uint64(0xFFFFFFFFFFFFFFFF),
                  dtype=np.uint64)
    nonempty = lengths > 0
    if h.size:
        with np.errstate(over="ignore"):
            for p in range(num_perm):
                m = h * _MH_A[p] + _MH_B[p]
                mins = np.minimum.reduceat(m, starts[nonempty])
                sig[nonempty, p] = mins
    return sig


def _band_hashes(sig: np.ndarray, num_bands: int) -> np.ndarray:
    """(ndocs, num_bands) uint64 bucket keys: FNV over each band's slice,
    vectorized over docs and bands."""
    ndocs, num_perm = sig.shape
    rows_per_band = num_perm // num_bands
    bands = sig.reshape(ndocs, num_bands, rows_per_band)
    with np.errstate(over="ignore"):
        bh = np.full((ndocs, num_bands), 0xCBF29CE484222325, dtype=np.uint64)
        for c in range(rows_per_band):
            for shift in (0, 32):
                bh = (bh ^ ((bands[:, :, c] >> np.uint64(shift))
                            & np.uint64(0xFFFFFFFF))) * np.uint64(0x100000001B3)
    return bh


def minhash_batch(batch: pa.Table, *, text_col: str = "text", id_col: str = "doc_id",
                  num_perm: int = 128, shingle_k: int = 5,
                  num_bands: int = 32) -> pa.Table:
    """Per doc: minhash signature -> LSH band keys. Emits long-form
    (id, band, band_hash) rows — the groupby key for candidate buckets."""
    texts = [t or "" for t in batch[text_col].to_pylist()]
    ids = np.asarray(batch[id_col])
    sig = minhash_signatures_batch(texts, num_perm, shingle_k)
    bh = _band_hashes(sig, num_bands)
    n = len(texts)
    return pa.table({
        id_col: pa.array(np.repeat(ids, num_bands)),
        "band": pa.array(np.tile(np.arange(num_bands, dtype=np.int64), n)),
        "band_hash": pa.array(bh.ravel().astype(np.int64)),
    })


def minhash_lsh_candidates(ds, *, text_col: str = "text", id_col: str = "doc_id",
                           num_perm: int = 128, shingle_k: int = 5,
                           num_bands: int = 32):
    """documents -> candidate near-duplicate pairs (id_a < id_b).

    shingle->minhash->band per batch (map-side), then ONE shuffle on
    (band, band_hash); pairs are emitted inside each bucket group.
    """

    def to_bands(b: pa.Table) -> pa.Table:
        return minhash_batch(b, text_col=text_col, id_col=id_col,
                             num_perm=num_perm, shingle_k=shingle_k,
                             num_bands=num_bands)

    def emit_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(df[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}, dtype=np.int64)
        a, b = np.triu_indices(len(ids), 1)
        return pd.DataFrame({"id_a": ids[a], "id_b": ids[b]})

    pairs = (
        ds.map_batches(to_bands, batch_format="pyarrow")
        .groupby(["band", "band_hash"])
        .map_groups(emit_pairs, batch_format="pandas")
    )
    # distinct pairs (a pair can surface from many bands)
    def drop_dup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    return pairs.groupby("id_a").map_groups(drop_dup_pairs, batch_format="pandas")


def jaccard_verify_pairs(pairs_df: pd.DataFrame, texts_by_id: dict,
                         shingle_k: int = 5, threshold: float = 0.8) -> pd.DataFrame:
    """Exact n-gram Jaccard for candidate pairs (driver-side or per-group;
    broadcast ``texts_by_id`` for distributed use)."""
    keep, jac = [], []
    cache: dict[int, np.ndarray] = {}

    def sh(i):
        if i not in cache:
            cache[i] = _char_shingle_hashes([texts_by_id[i] or ""], shingle_k)[0]
        return cache[i]

    for a, b in zip(pairs_df["id_a"], pairs_df["id_b"]):
        sa, sb = sh(int(a)), sh(int(b))
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        j = inter / union if union else 1.0
        jac.append(j)
        keep.append(j >= threshold)
    out = pairs_df.copy()
    out["jaccard"] = jac
    return out[np.asarray(keep)] if len(out) else out.iloc[:0]


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_batch(batch: pa.Table, *, text_col: str = "text",
                  shingle_k: int = 4) -> pa.Table:
    """Append a 64-bit simhash fingerprint column (``simhash``) per doc."""
    texts = batch[text_col].to_pylist()
    fps = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        hs = _char_shingle_hashes([t or ""], shingle_k)[0]
        if len(hs) == 0:
            continue
        bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        votes = bits.sum(axis=0) * 2 - len(hs)   # +1 / -1 vote per shingle
        fp = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            fp |= np.uint64(1) << np.uint64(b)
        fps[i] = fp
    return batch.append_column("simhash", pa.array(fps.astype(np.int64)))


def hamming_distance64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a).astype(np.uint64) ^ np.asarray(b).astype(np.uint64))
    # vectorized popcount via byte-view lookup
    lut = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    return lut[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64)


def simhash_near_dup_pairs(ds, *, text_col: str = "text", id_col: str = "doc_id",
                           max_hamming: int = 3):
    """SimHash near-dup: fingerprint per batch, then bucket by each of 4
    16-bit chunks (any pair within hamming<=3 of 64 bits shares at least
    one identical 16-bit chunk — pigeonhole), verify hamming in-group."""

    def fp(b: pa.Table) -> pa.Table:
        t = simhash_batch(b, text_col=text_col)
        return t.select([id_col, "simhash"])

    def explode_chunks(b: pa.Table) -> pa.Table:
        sh = np.asarray(b["simhash"]).astype(np.uint64)
        ids = np.asarray(b[id_col])
        n = len(sh)
        chunk_no = np.tile(np.arange(4, dtype=np.int64), n)
        rep = np.repeat(np.arange(n), 4)
        chunk_val = (sh[rep] >> (np.uint64(16) * chunk_no.astype(np.uint64))) & np.uint64(0xFFFF)
        return pa.table({
            id_col: pa.array(ids[rep]),
            "simhash": pa.array(sh[rep].astype(np.int64)),
            "chunk_no": pa.array(chunk_no),
            "chunk_val": pa.array(chunk_val.astype(np.int64)),
        })

    def emit_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(subset=[id_col])
        ids = df[id_col].to_numpy()
        sh = df["simhash"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []}, dtype=np.int64)
        a, b = np.triu_indices(len(ids), 1)
        hd = hamming_distance64(sh[a], sh[b])
        m = hd <= max_hamming
        ia, ib = ids[a[m]], ids[b[m]]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "hamming": hd[m]})

    pairs = (
        ds.map_batches(fp, batch_format="pyarrow")
        .map_batches(explode_chunks, batch_format="pyarrow")
        .groupby(["chunk_no", "chunk_val"])
        .map_groups(emit_pairs, batch_format="pandas")
    )
    return pairs.groupby("id_a").map_groups(
        lambda df: df.drop_duplicates(subset=["id_a", "id_b"]), batch_format="pandas")
