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
import pyarrow.compute as pc

from ..geo.hashing import fnv1a_64, splitmix64

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds, key: str, order_by: str | list[str] | None = None, *,
                num_buckets: int = 64, pre_dedup: bool = True):
    """Keep exactly one row per ``key``: the one with the smallest
    ``order_by`` value(s) (pass a list for deterministic tie-breaks);
    without ``order_by``, the first row in (key)-sorted order wins.

    Implementation: bucket by ``hash(key) % B`` so the shuffle groups by
    bucket (vectorized pandas keep-first inside each bucket, one Python
    call per bucket — not per key). Keep-first-by-(key, order_by) is
    ASSOCIATIVE, so a map-side local pass (``pre_dedup``, Arrow
    sort_indices + first-occurrence mask, fused with the read) drops
    within-batch duplicates BEFORE the shuffle — on duplicate-heavy
    corpora the exchange ships ~unique keys per batch, not raw rows.
    """
    import pyarrow.compute as pc

    if order_by is None:
        order_by = []
    elif isinstance(order_by, str):
        order_by = [order_by]
    sort_cols = [key] + order_by

    def add_bucket(b: pa.Table) -> pa.Table:
        if pre_dedup and b.num_rows > 1:
            idx = pc.sort_indices(
                b, sort_keys=[(c, "ascending") for c in sort_cols])
            kb = b[key].take(idx).combine_chunks()
            keep = np.ones(len(kb), dtype=bool)
            # nulls compare to null -> fill True: keep all null-keyed rows
            # locally; the reduce side dedups them
            keep[1:] = np.asarray(pc.fill_null(
                pc.not_equal(kb.slice(1), kb.slice(0, len(kb) - 1)), True))
            b = b.take(idx.filter(pa.array(keep)))
        h = fnv1a_64(b[key].cast(pa.string()))
        return b.append_column("_bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    def first_per_key(t: pa.Table) -> pa.Table:
        # ARROW-NATIVE keep-first (string keys dominate this exchange;
        # a pandas round-trip would copy every key byte twice): stable
        # sort + shifted not_equal first-occurrence mask. Null keys
        # collapse to ONE surviving row (pandas drop_duplicates
        # semantics): not_equal is null for null neighbors, so fill
        # from the is-null transition instead.
        t = t.drop_columns(["_bucket"])
        idx = pc.sort_indices(
            t, sort_keys=[(c, "ascending") for c in sort_cols])
        kb = t[key].take(idx)
        if isinstance(kb, pa.ChunkedArray):
            kb = kb.combine_chunks()
        n = len(kb)
        keep = np.ones(n, dtype=bool)
        if n > 1:
            isnull = np.asarray(pc.is_null(kb))
            raw = np.asarray(pc.fill_null(pc.not_equal(
                kb.slice(1), kb.slice(0, n - 1)), False))
            keep[1:] = np.where(isnull[1:] | isnull[:-1],
                                isnull[1:] != isnull[:-1], raw)
        return t.take(idx.filter(pa.array(keep)))

    from ..util import pin_for_shuffle

    return (
        pin_for_shuffle(ds.map_batches(add_bucket, batch_format="pyarrow"))
        .groupby("_bucket")
        .map_groups(first_per_key, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# shingling + MinHash
# ---------------------------------------------------------------------------

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)

# Shingle chunk size for the cache-resident kernels below. This node (and
# any busy shared worker) throttles dirty-page allocation hard: the same
# FNV pass measured 0.29 s on a whole 1.5 MB window matrix vs 0.012 s in
# 64 Ki-row chunks with reused scratch buffers. Keep per-chunk scratch
# ~1 MB so it stays in L2 and never faults fresh pages.
_SHINGLE_CHUNK = 1 << 16


def _fnv_rows(windows: np.ndarray) -> np.ndarray:
    """FNV-1a over each row of a (n, k) uint8 matrix — vectorized over n,
    chunked so scratch stays cache-resident (see _SHINGLE_CHUNK note).
    Each column slice of a 1-byte-strided sliding window view is
    contiguous, so this is k sequential passes per chunk."""
    n = windows.shape[0]
    out = np.empty(n, dtype=np.uint64)
    tmp = np.empty(min(n, _SHINGLE_CHUNK), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for s in range(0, n, _SHINGLE_CHUNK):
            e = min(s + _SHINGLE_CHUNK, n)
            h = out[s:e]
            h[:] = _FNV_OFFSET
            t = tmp[:e - s]
            for col in range(windows.shape[1]):
                np.copyto(t, windows[s:e, col], casting="unsafe")
                h ^= t
                h *= _FNV_PRIME
    return out


def _hash_windows(windows: np.ndarray) -> np.ndarray:
    """Sorted-unique FNV-1a hashes of the rows of a (n, k) uint8 matrix."""
    return np.unique(_fnv_rows(windows))


def _cumsum0(counts: np.ndarray) -> np.ndarray:
    out = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=out[1:])
    return out


def _ragged_arange(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """``concatenate([arange(s, s+c) for s, c in zip(starts, counts)])``
    without the Python loop."""
    cs = _cumsum0(counts)
    return (np.repeat(starts.astype(np.int64), counts)
            + (np.arange(cs[-1], dtype=np.int64) - np.repeat(cs[:-1], counts)))


def _shingle_hashes_concat(arr, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """(hashes, lengths): per-doc SORTED-UNIQUE k-byte-shingle FNV-1a
    hashes concatenated in doc order — the ragged form every consumer
    (minhash ``reduceat``, simhash bit votes, Jaccard merges) wants.

    Fully vectorized ACROSS docs: utf-8 bytes are read zero-copy from
    the Arrow string buffers, every k-byte window of the WHOLE buffer is
    FNV-hashed in one pass (windows spanning a doc boundary are computed
    but never gathered), and per-doc unique is ONE global lexsort
    (seg-major, hash-minor) + adjacent-run dedup. Byte-identical to the
    per-doc ``np.unique(_fnv_rows(sliding_window_view(doc, k)))`` loop
    it replaces (measured ~6x on the bench corpus); docs shorter than k
    bytes (whole-doc hash, or 0 for empty) take a rare fallback loop.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, "").cast(pa.large_utf8())
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    bufs = arr.buffers()
    data = (np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None
            else np.empty(0, dtype=np.uint8))
    off = np.frombuffer(bufs[1], dtype=np.int64)[arr.offset: arr.offset + n + 1]
    # re-base to the slice's own byte range so window positions, the
    # validity mask and gh all share one coordinate system even when the
    # array is a zero-copy slice of a larger buffer
    data = data[off[0]:off[-1]]
    off = off - off[0]
    doclen = off[1:] - off[:-1]
    counts = np.maximum(doclen - k + 1, 0)     # full-width windows per doc

    gh = (_fnv_rows(np.lib.stride_tricks.sliding_window_view(data, k))
          if len(data) >= k else np.empty(0, dtype=np.uint64))
    has = counts > 0

    # a window starting at byte p is doc-internal unless it crosses a doc
    # boundary b (p in (b-k, b)); mark those k-1 starts per boundary
    # invalid — k-1 tiny scatters instead of a 12 MB ragged index gather
    n_win = len(gh)
    valid = np.ones(n_win, dtype=bool)
    inner = off[1:-1]
    for j in range(1, k):
        pos = inner - j
        pos = pos[(pos >= 0) & (pos < n_win)]
        valid[pos] = False
    h_all = gh[valid]

    # per-doc sorted unique: lexsort (seg-major, hash-minor) + adjacent-run
    # dedup, in doc-aligned chunks so sort scratch stays cache-resident
    bounds = _cumsum0(counts)
    lengths = np.zeros(n, dtype=np.int64)
    pieces = []
    i = 0
    while i < n:
        j = min(int(np.searchsorted(bounds, bounds[i] + 2 * _SHINGLE_CHUNK)),
                n)
        j = max(j, i + 1)
        hc = h_all[bounds[i]:bounds[j]]
        segc = np.repeat(np.arange(i, j, dtype=np.int64), counts[i:j])
        order = np.lexsort((hc, segc))
        hs, ss = hc[order], segc[order]
        keep = np.ones(len(hs), dtype=bool)
        if len(hs) > 1:
            keep[1:] = (hs[1:] != hs[:-1]) | (ss[1:] != ss[:-1])
        pieces.append(hs[keep])
        lengths[i:j] = np.bincount(ss[keep] - i, minlength=j - i)
        i = j
    h_u = (np.concatenate(pieces) if pieces else np.empty(0, dtype=np.uint64))

    short = ~has                   # len(doc) < k: one whole-doc hash (0 if empty)
    if not short.any():
        return h_u, lengths
    out_lengths = lengths.copy()
    out_lengths[short] = 1
    out_starts = _cumsum0(out_lengths)
    out = np.empty(int(out_starts[-1]), dtype=np.uint64)
    docs_long = np.nonzero(has)[0]
    out[_ragged_arange(out_starts[docs_long], lengths[docs_long])] = h_u
    for i in np.nonzero(short)[0]:
        b = data[off[i]:off[i + 1]]
        out[out_starts[i]] = (np.uint64(0) if len(b) == 0
                              else _fnv_rows(b[None, :])[0])
    return out, out_lengths


def _split_concat(h: np.ndarray, lengths: np.ndarray) -> list[np.ndarray]:
    if len(lengths) == 0:
        return []
    return np.split(h, np.cumsum(lengths)[:-1])


def _char_shingle_hashes(texts: list[str], k: int = 5) -> list[np.ndarray]:
    """Per doc: sorted-unique uint64 hashes of its k-char shingles."""
    return _split_concat(*_shingle_hashes_concat(
        pa.array(texts, type=pa.large_utf8()), k))


_MH_A = splitmix64(np.arange(1, 257, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
_MH_B = splitmix64(np.arange(1001, 1257, dtype=np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))


def _char_shingle_hashes_arrow(arr: pa.Array, k: int = 5) -> list[np.ndarray]:
    """``_char_shingle_hashes`` straight off an Arrow string column —
    zero-copy bytes, no Python str ever materialized."""
    return _split_concat(*_shingle_hashes_concat(arr, k))


def minhash_signature(shingle_hashes: np.ndarray, num_perm: int = 128) -> np.ndarray:
    """MinHash signature via universal hashing h_i(x) = a_i*x + b_i (mod 2^64)."""
    if len(shingle_hashes) == 0:
        return np.full(num_perm, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    with np.errstate(over="ignore"):
        m = shingle_hashes[None, :] * _MH_A[:num_perm, None] + _MH_B[:num_perm, None]
    return m.min(axis=1)


def minhash_signatures_concat(h: np.ndarray, lengths: np.ndarray, *,
                              num_perm: int = 128) -> np.ndarray:
    """(ndocs, num_perm) MinHash signatures from the concat ragged form:
    ``np.minimum.reduceat`` per permutation (no per-doc Python anywhere)."""
    n = len(lengths)
    starts = _cumsum0(lengths)[:-1]
    sig = np.full((n, num_perm), np.uint64(0xFFFFFFFFFFFFFFFF),
                  dtype=np.uint64)
    nonempty = lengths > 0
    if h.size:
        ne_starts = starts[nonempty]
        m = np.empty(len(h), dtype=np.uint64)   # reused: no fresh dirty
        with np.errstate(over="ignore"):        # pages per permutation
            for p in range(num_perm):
                np.multiply(h, _MH_A[p], out=m)
                m += _MH_B[p]
                sig[nonempty, p] = np.minimum.reduceat(m, ne_starts)
    return sig


def minhash_signatures_batch(texts: list[str], num_perm: int = 128,
                             shingle_k: int = 5) -> np.ndarray:
    """(ndocs, num_perm) MinHash signatures, vectorized ACROSS docs."""
    h, lengths = _shingle_hashes_concat(
        pa.array(texts, type=pa.large_utf8()), shingle_k)
    return minhash_signatures_concat(h, lengths, num_perm=num_perm)


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
    ids = np.asarray(batch[id_col])
    sig = minhash_signatures_concat(
        *_shingle_hashes_concat(batch[text_col], shingle_k),
        num_perm=num_perm)
    bh = _band_hashes(sig, num_bands)
    n = batch.num_rows
    return pa.table({
        id_col: pa.array(np.repeat(ids, num_bands)),
        "band": pa.array(np.tile(np.arange(num_bands, dtype=np.int64), n)),
        "band_hash": pa.array(bh.ravel().astype(np.int64)),
    })


def _group_pair_indices(sizes: np.ndarray, starts: np.ndarray,
                        cap: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Positional pair indices for variable-size groups, vectorized.

    Groups with ``2 <= size <= cap`` emit all C(size, 2) pairs (one
    ``triu_indices`` expansion per DISTINCT size — at most ``cap-1``
    numpy calls per bucket, never per group). Groups larger than ``cap``
    collapse to a STAR around their first member (rep, member_i): O(size)
    pairs that still connect every member to the representative — exactly
    what transitive dedup clustering needs — instead of the unbounded
    C(size, 2) explosion a boilerplate-heavy corpus would trigger.

    Returns (ia, ib, n_collapsed_groups); ia/ib index into the
    group-sorted member arrays.
    """
    ia_parts: list[np.ndarray] = []
    ib_parts: list[np.ndarray] = []
    small = (sizes >= 2) & (sizes <= cap)
    for s in np.unique(sizes[small]):
        sel = starts[sizes == s]
        iu, ju = np.triu_indices(int(s), 1)
        ia_parts.append((sel[:, None] + iu[None, :]).ravel())
        ib_parts.append((sel[:, None] + ju[None, :]).ravel())
    big = sizes > cap
    n_collapsed = int(big.sum())
    if n_collapsed:
        bstarts, bsizes = starts[big], sizes[big]
        members = np.concatenate([np.arange(st + 1, st + sz)
                                  for st, sz in zip(bstarts, bsizes)])
        ia_parts.append(np.repeat(bstarts, bsizes - 1))
        ib_parts.append(members)
    if not ia_parts:
        e = np.empty(0, dtype=np.int64)
        return e, e, 0
    return (np.concatenate(ia_parts), np.concatenate(ib_parts), n_collapsed)


def _dedup_pairs_arrays(id_a: np.ndarray, id_b: np.ndarray):
    """Vectorized distinct over (id_a, id_b) pair arrays."""
    if len(id_a) == 0:
        return id_a, id_b
    order = np.lexsort((id_b, id_a))
    a, b = id_a[order], id_b[order]
    keep = np.empty(len(a), dtype=bool)
    keep[0] = True
    keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return a[keep], b[keep]


def _distinct_pairs(pairs_ds, *, num_buckets: int = 64,
                    num_partitions: int | None = None):
    """Global distinct on (id_a, id_b): ONE bounded hash-bucket shuffle
    with a vectorized np.unique per bucket (not per pair-key).

    ``num_partitions``: coalesce the pair table first — Ray's sort-based
    groupby schedules O(blocks x partitions) tasks, so a small pair set
    spread over many blocks pays fixed task overhead, not data cost."""
    if num_partitions is not None:
        pairs_ds = pairs_ds.repartition(num_partitions)

    def add_pb(b: pa.Table) -> pa.Table:
        a = np.asarray(b["id_a"]).astype(np.uint64)
        bb = np.asarray(b["id_b"]).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = splitmix64(a ^ splitmix64(bb))
        return b.append_column(
            "_pb", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    def uniq(t: pa.Table) -> pa.Table:
        a, b = _dedup_pairs_arrays(
            np.asarray(t["id_a"], dtype=np.int64),
            np.asarray(t["id_b"], dtype=np.int64))
        return pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})

    from ..util import pin_for_shuffle

    return (pin_for_shuffle(pairs_ds.map_batches(add_pb, batch_format="pyarrow"))
            .groupby("_pb").map_groups(uniq, batch_format="pyarrow"))


def minhash_lsh_candidates(ds, *, text_col: str = "text", id_col: str = "doc_id",
                           num_perm: int = 128, shingle_k: int = 5,
                           num_bands: int = 32, num_buckets: int = 64,
                           max_bucket_size: int = 64):
    """documents -> candidate near-duplicate pairs (id_a < id_b).

    shingle->minhash->band per batch (map-side), then ONE bounded shuffle:
    each (band, band_hash) group is keyed to ``hash % num_buckets`` so the
    exchange groups by BUCKET and pair emission runs once per bucket,
    vectorized across all its LSH groups (`_group_pair_indices`) — never a
    Python call per group. Buckets larger than ``max_bucket_size`` collapse
    to a star around a representative (bounded output on duplicate-heavy
    corpora); collapses are counted and logged per task. A second bounded
    shuffle makes the pairs globally distinct.
    """
    import logging

    def to_bands(b: pa.Table) -> pa.Table:
        # one 64-bit group key for (band, band_hash) + its bounded bucket
        t = _band_gkey_batch(b, text_col=text_col, id_col=id_col,
                             num_perm=num_perm, shingle_k=shingle_k,
                             num_bands=num_bands)
        gkey = np.asarray(t["_gkey"]).astype(np.uint64)
        return t.append_column("_bucket", pa.array(
            (gkey % np.uint64(num_buckets)).astype(np.int64)))

    def emit_bucket(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col], dtype=np.int64)
        gkey = np.asarray(t["_gkey"], dtype=np.int64)
        order = np.lexsort((ids, gkey))
        ids_s, g_s = ids[order], gkey[order]
        # belt: a doc appears once per band, but drop dup (gkey, id) anyway
        if len(ids_s):
            first = np.empty(len(ids_s), dtype=bool)
            first[0] = True
            first[1:] = (g_s[1:] != g_s[:-1]) | (ids_s[1:] != ids_s[:-1])
            ids_s, g_s = ids_s[first], g_s[first]
        starts = np.flatnonzero(np.r_[True, g_s[1:] != g_s[:-1]]) if len(g_s) \
            else np.empty(0, dtype=np.int64)
        sizes = np.diff(np.r_[starts, len(g_s)])
        ia, ib, n_collapsed = _group_pair_indices(sizes, starts, max_bucket_size)
        if n_collapsed:
            logging.getLogger(__name__).warning(
                "minhash-LSH: collapsed %d buckets larger than %d to star pairs",
                n_collapsed, max_bucket_size)
        a, b = _dedup_pairs_arrays(ids_s[ia], ids_s[ib])
        return pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})

    from ..util import pin_for_shuffle

    pairs = (
        pin_for_shuffle(ds.map_batches(to_bands, batch_format="pyarrow"))
        .groupby("_bucket")
        .map_groups(emit_bucket, batch_format="pyarrow")
    )
    # distinct pairs (a pair can surface from many bands -> many buckets)
    return _distinct_pairs(pairs, num_buckets=num_buckets)


def jaccard_verify_distributed(pairs_ds, docs_ds, *, id_col: str = "doc_id",
                               text_col: str = "text", shingle_k: int = 5,
                               threshold: float = 0.8, num_buckets: int = 32,
                               broadcast_pair_limit: int = 1_000_000):
    """Distributed exact-Jaccard verification of candidate pairs.

    Texts are attached through two bucketed hash joins (pairs x docs on
    ``id_a``, then on ``id_b``) — each side shuffles once, nothing
    unbounded is collected on the driver — then per-batch shingle-set
    Jaccard. Returns (id_a, id_b, jaccard) rows with
    ``jaccard >= threshold``.

    When the candidate set is small (``<= broadcast_pair_limit`` pairs
    — the common case: LSH banding admits far fewer candidates than the
    corpus has docs), the distinct candidate ids are broadcast and the
    docs side is semi-filtered MAP-SIDE before the joins, so only the
    texts that can match are ever shuffled; the join bucket count then
    shrinks to the data actually in play. Above the limit the full
    shuffle join runs unchanged (dup-heavy corpora where candidates
    rival the corpus in size).
    """
    from ..aggregate.relational import hash_join
    from ..util import pin_for_shuffle

    pairs_ds = pin_for_shuffle(pairs_ds)       # count becomes metadata
    npairs = pairs_ds.count()
    if npairs <= broadcast_pair_limit:
        import ray as _ray
        ids = np.unique(np.concatenate([
            np.concatenate([np.asarray(b["id_a"], dtype=np.int64),
                            np.asarray(b["id_b"], dtype=np.int64)])
            for b in pairs_ds.iter_batches(batch_format="pyarrow")]
            or [np.empty(0, np.int64)]))
        ids_ref = _ray.put(pa.array(ids))
        num_buckets = max(1, min(num_buckets, 1 + npairs // 50_000))

        def semi(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b[id_col],
                                     value_set=_ray.get(ids_ref)))

        docs_ds = docs_ds.map_batches(semi, batch_format="pyarrow")

    def rename(side: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({f"id_{side}": b[id_col],
                             f"text_{side}": b[text_col]})
        return f

    docs_a = docs_ds.map_batches(rename("a"), batch_format="pyarrow")
    docs_b = docs_ds.map_batches(rename("b"), batch_format="pyarrow")
    joined = hash_join(pairs_ds, docs_a, "id_a", num_buckets=num_buckets)
    joined = hash_join(joined, docs_b, "id_b", num_buckets=num_buckets)

    def verify(b: pa.Table) -> pa.Table:
        """Exact Jaccard per pair with shingle sets computed ONCE PER
        UNIQUE TEXT in the batch (Arrow dictionary_encode): a doc in k
        candidate pairs is hashed once, not k times — measured 11x on
        the bench corpus (the per-pair merge of two presorted unique
        arrays is cheap; the shingle hashing was the cost). All-Arrow:
        the text columns never round-trip through pandas object arrays,
        and shingle bytes are read zero-copy from the string buffers. A
        fully flattened one-lexsort variant was tried and is SLOWER
        here: its (pairs x shingles) scratch arrays hit this node's
        page-dirty throttle."""
        def _one(col):
            return (col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                    else col)

        ta, tb = _one(b["text_a"]), _one(b["text_b"])
        enc = pc.dictionary_encode(
            pc.fill_null(pa.concat_arrays([ta, tb.cast(ta.type)]), ""))
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        sets = _char_shingle_hashes_arrow(enc.dictionary, shingle_k)
        n = b.num_rows
        ca, cb = codes[:n], codes[n:]
        jac = np.empty(n, dtype=np.float64)
        for i in range(n):
            a, bb = sets[ca[i]], sets[cb[i]]
            if len(a) > len(bb):
                a, bb = bb, a
            if len(bb) == 0:
                jac[i] = 1.0          # both empty -> union 0 -> defined 1
                continue
            # searchsorted membership count over the presorted unique
            # arrays (intersect1d re-sorts per call)
            pos = np.searchsorted(bb, a)
            pos[pos == len(bb)] = len(bb) - 1
            inter = int((bb[pos] == a).sum())
            union = len(a) + len(bb) - inter
            jac[i] = inter / union if union else 1.0
        m = jac >= threshold
        out = b.select(["id_a", "id_b"]).filter(pa.array(m))
        return out.append_column("jaccard", pa.array(jac[m]))

    return joined.map_batches(verify, batch_format="pyarrow")


def minhash_estimate_filter(pairs_ds, docs_ds, *, id_col: str = "doc_id",
                            text_col: str = "text", num_perm: int = 64,
                            shingle_k: int = 5, est_threshold: float = 0.45,
                            num_buckets: int = 32):
    """Signature-agreement prefilter for candidate pairs.

    The LSH band curve at small rows-per-band admits masses of
    low-similarity candidates (measured: 92k candidates -> 256 true
    pairs at threshold 0.6 on the bench corpus); exact verification pays
    a per-PAIR set intersection for each. The fraction of agreeing
    minhash permutations is an unbiased Jaccard estimator
    (std = sqrt(j(1-j)/num_perm), ~0.06 at j=0.6/64 perms), fully
    vectorized: per-doc signatures are attached through the same two
    bucketed joins as texts — but a signature is num_perm*8 bytes and
    the compare is one (n, num_perm) equality mean — and only survivors
    reach the exact kernel. Signatures are recomputed here rather than
    carried from the band stage: the band exchange ships only
    (id, band-key) rows by design, and one extra map over docs is
    cheaper at every scale than widening that shuffle.
    """
    from ..aggregate.relational import hash_join

    def sigs(side: str):
        def f(b: pa.Table) -> pa.Table:
            sig = minhash_signatures_concat(
                *_shingle_hashes_concat(b[text_col], shingle_k),
                num_perm=num_perm)
            # fixed-width BINARY (num_perm*8 bytes/doc): plain binary
            # survives the join's pandas round-trip (FixedSizeList maps
            # to Ray's tensor extension, which breaks on sliced blocks).
            # One buffer + cast, no per-row tobytes loop.
            fsb = pa.Array.from_buffers(
                pa.binary(num_perm * 8), sig.shape[0],
                [None, pa.py_buffer(np.ascontiguousarray(sig).tobytes())])
            return pa.table({
                f"id_{side}": b[id_col],
                f"sig_{side}": fsb.cast(pa.binary())})
        return f

    sa = docs_ds.map_batches(sigs("a"), batch_format="pyarrow")
    sb = docs_ds.map_batches(sigs("b"), batch_format="pyarrow")
    joined = hash_join(pairs_ds, sa, "id_a", num_buckets=num_buckets)
    joined = hash_join(joined, sb, "id_b", num_buckets=num_buckets)

    def _sig_matrix(col, n: int) -> np.ndarray:
        """(n, num_perm) uint64 matrix from the fixed-width binary column
        (bytes-join is a C-level concat; rows are equal-width by
        construction and never null after the inner joins)."""
        return np.frombuffer(b"".join(col.to_pylist()),
                             dtype=np.uint64).reshape(n, num_perm)

    def estimate(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return pa.table({"id_a": b["id_a"], "id_b": b["id_b"]})
        ma = _sig_matrix(b["sig_a"], n)
        mb = _sig_matrix(b["sig_b"], n)
        keep = pa.array((ma == mb).mean(axis=1) >= est_threshold)
        return pa.table({"id_a": b["id_a"].filter(keep),
                         "id_b": b["id_b"].filter(keep)})

    return joined.map_batches(estimate, batch_format="pyarrow")


def minhash_near_dup_verified(docs_ds, *, text_col: str = "text",
                              id_col: str = "doc_id", num_perm: int = 128,
                              shingle_k: int = 5, num_bands: int = 32,
                              threshold: float = 0.8,
                              prefilter_margin: float | None = None):
    """End-to-end near-dup detection: MinHash-LSH candidates -> exact
    n-gram Jaccard verification (vectorized across pairs), all
    distributed. ``prefilter_margin`` (e.g. 0.15) inserts the
    signature-estimate prefilter between the two — worth it only when
    texts are LONG relative to the signature (the filter pays two extra
    signature passes + two sig joins to shrink the text joins; measured
    crossover is well above the bench corpus's ~1 KB docs, so the
    default is off)."""
    from ..util import pin_for_shuffle

    pairs = minhash_lsh_candidates(docs_ds, text_col=text_col, id_col=id_col,
                                   num_perm=num_perm, shingle_k=shingle_k,
                                   num_bands=num_bands)
    if prefilter_margin is not None:
        # pin the candidate set and the filtered set: each feeds a chain
        # of joins whose pins would otherwise replay the upstream plan
        pairs = pin_for_shuffle(pairs)
        pairs = pin_for_shuffle(minhash_estimate_filter(
            pairs, docs_ds, id_col=id_col, text_col=text_col,
            num_perm=num_perm, shingle_k=shingle_k,
            est_threshold=max(0.0, threshold - prefilter_margin)))
    return jaccard_verify_distributed(pairs, docs_ds, id_col=id_col,
                                      text_col=text_col, shingle_k=shingle_k,
                                      threshold=threshold)


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
    """Append a 64-bit simhash fingerprint column (``simhash``) per doc.

    Vectorized ACROSS docs: all shingle hashes concatenate into one array
    and each of the 64 bit-votes is a single ``np.add.reduceat`` over the
    doc boundaries — no per-doc bit matrix.
    """
    n = batch.num_rows
    h, lengths = _shingle_hashes_concat(batch[text_col], shingle_k)
    starts = _cumsum0(lengths)[:-1]
    fps = np.zeros(n, dtype=np.uint64)
    nonempty = lengths > 0
    if h.size and nonempty.any():
        ne_starts = starts[nonempty]
        ne_lengths = lengths[nonempty]
        fp_ne = np.zeros(ne_starts.shape[0], dtype=np.uint64)
        t = np.empty(len(h), dtype=np.uint64)   # reused per bit: no fresh
        ones = np.empty(len(h), dtype=np.int64)  # dirty pages in the loop
        one = np.uint64(1)
        for b in range(64):
            np.right_shift(h, np.uint64(b), out=t)
            t &= one
            np.copyto(ones, t, casting="unsafe")
            votes = np.add.reduceat(ones, ne_starts) * 2 - ne_lengths
            fp_ne |= (votes > 0).astype(np.uint64) << np.uint64(b)
        fps[nonempty] = fp_ne
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

    num_buckets = 64
    max_bucket_size = 128

    def add_bucket(b: pa.Table) -> pa.Table:
        cn = np.asarray(b["chunk_no"]).astype(np.uint64)
        cv = np.asarray(b["chunk_val"]).astype(np.uint64)
        with np.errstate(over="ignore"):
            gkey = splitmix64(cv + cn * np.uint64(0x9E3779B97F4A7C15))
        return pa.table({
            id_col: b[id_col],
            "simhash": b["simhash"],
            "_gkey": pa.array(gkey.astype(np.int64)),
            "_bucket": pa.array((gkey % np.uint64(num_buckets)).astype(np.int64)),
        })

    def emit_bucket(t: pa.Table) -> pa.Table:
        """Vectorized across all (chunk_no, chunk_val) groups in the
        bucket; groups beyond ``max_bucket_size`` collapse to star
        candidates around a representative (recall on giant buckets is
        traded for bounded output — counted in the task log)."""
        import logging

        ids = np.asarray(t[id_col], dtype=np.int64)
        sh = np.asarray(t["simhash"], dtype=np.int64)
        gkey = np.asarray(t["_gkey"], dtype=np.int64)
        order = np.lexsort((ids, gkey))
        ids_s, sh_s, g_s = ids[order], sh[order], gkey[order]
        starts = np.flatnonzero(np.r_[True, g_s[1:] != g_s[:-1]]) if len(g_s) \
            else np.empty(0, dtype=np.int64)
        sizes = np.diff(np.r_[starts, len(g_s)])
        ia, ib, n_collapsed = _group_pair_indices(sizes, starts, max_bucket_size)
        if n_collapsed:
            logging.getLogger(__name__).warning(
                "simhash: collapsed %d chunk buckets larger than %d",
                n_collapsed, max_bucket_size)
        hd = hamming_distance64(sh_s[ia], sh_s[ib])
        m = hd <= max_hamming
        a, b = _dedup_pairs_arrays(ids_s[ia[m]], ids_s[ib[m]])
        return pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})

    from ..util import pin_for_shuffle

    pairs = (
        pin_for_shuffle(ds.map_batches(fp, batch_format="pyarrow")
                        .map_batches(explode_chunks, batch_format="pyarrow")
                        .map_batches(add_bucket, batch_format="pyarrow"))
        .groupby("_bucket")
        .map_groups(emit_bucket, batch_format="pyarrow")
    )
    return _distinct_pairs(pairs, num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# persisted MinHash band index: incremental near-dup detection
# ---------------------------------------------------------------------------

def _band_gkey_batch(b: pa.Table, *, text_col: str, id_col: str,
                     num_perm: int, shingle_k: int,
                     num_bands: int) -> pa.Table:
    """(id, _gkey) band rows for one batch — the shared key recipe of
    ``minhash_lsh_candidates`` (one 64-bit key per (band, band_hash))."""
    t = minhash_batch(b, text_col=text_col, id_col=id_col,
                      num_perm=num_perm, shingle_k=shingle_k,
                      num_bands=num_bands)
    band = np.asarray(t["band"]).astype(np.uint64)
    bh = np.asarray(t["band_hash"]).astype(np.uint64)
    with np.errstate(over="ignore"):
        gkey = splitmix64(bh + band * np.uint64(0x9E3779B97F4A7C15))
    return pa.table({id_col: t[id_col],
                     "_gkey": pa.array(gkey.astype(np.int64))})


def minhash_index_build(docs_ds, out_dir: str, *, text_col: str = "text",
                        id_col: str = "doc_id", num_perm: int = 128,
                        shingle_k: int = 5, num_bands: int = 32,
                        num_shards: int = 64,
                        input_fingerprint: str | None = None) -> None:
    """Persist the corpus's MinHash band rows as a SHARD-PARTITIONED
    resumable layout: shard i on disk holds exactly the rows with
    ``shard_of(_gkey) == i``, so an incremental probe reads ONLY the
    shards its own band keys land in — storage-level pruning, the text
    twin of ``ann.ivf_build_index``. Index size: num_bands rows of
    16 bytes per doc (~512 B/doc at 32 bands), independent of text
    length. Signature params are persisted next to the shards and
    validated at probe time (mixed-parameter probes find nothing, so
    they fail loudly instead)."""
    import json
    import os

    from ..state import lineage

    def to_bands(b: pa.Table) -> pa.Table:
        return _band_gkey_batch(b, text_col=text_col, id_col=id_col,
                                num_perm=num_perm, shingle_k=shingle_k,
                                num_bands=num_bands)

    bands = docs_ds.map_batches(to_bands, batch_format="pyarrow")
    lineage.write_resumable(bands, out_dir, key_col="_gkey",
                            num_shards=num_shards,
                            input_fingerprint=input_fingerprint)
    with open(os.path.join(out_dir, "MINHASH_PARAMS.json"), "w") as f:
        json.dump({"num_perm": num_perm, "shingle_k": shingle_k,
                   "num_bands": num_bands, "num_shards": num_shards,
                   "id_col": id_col}, f)


def minhash_index_probe(new_docs_ds, index_dir: str, *,
                        text_col: str = "text", id_col: str = "doc_id",
                        num_buckets: int = 32):
    """New docs -> candidate (new_id, old_id, n_bands) near-dup pairs
    against a persisted band index, WITHOUT rescanning the corpus.

    The probe batch's band keys are computed map-side; only index shards
    those keys hash into are opened (for a probe of p docs with B bands,
    expected fraction read ≈ 1 - (1 - 1/S)^(pB) — a handful of shards for
    incremental upsert batches, everything for corpus-sized probes).
    Candidates then come from ONE bucketed hash join on the band key plus
    a distinct-count exchange; verify with
    ``jaccard_verify_distributed`` over (old corpus ∪ new batch) texts.
    """
    import json
    import os

    import ray.data as rd

    from ..aggregate.relational import hash_aggregate, hash_join
    from ..state import lineage

    with open(os.path.join(index_dir, "MINHASH_PARAMS.json")) as f:
        params = json.load(f)
    if params["id_col"] != id_col:
        raise ValueError(f"index built over id_col={params['id_col']!r}")

    def to_bands(b: pa.Table) -> pa.Table:
        t = _band_gkey_batch(b, text_col=text_col, id_col=id_col,
                             num_perm=params["num_perm"],
                             shingle_k=params["shingle_k"],
                             num_bands=params["num_bands"])
        return pa.table({"new_id": t[id_col], "_gkey": t["_gkey"]})

    from ..util import pin_for_shuffle
    bands_new = pin_for_shuffle(
        new_docs_ds.map_batches(to_bands, batch_format="pyarrow"))

    num_shards = params["num_shards"]

    def shards_touched(b: pa.Table) -> pa.Table:
        s = lineage.shard_of(np.asarray(b["_gkey"]), num_shards)
        return pa.table({"s": np.unique(s)})

    touched = set(bands_new.map_batches(
        shards_touched, batch_format="pyarrow").to_pandas()["s"].unique())
    avail = lineage.finished_shards(index_dir)
    hit = sorted(touched & avail)
    paths = [os.path.join(index_dir, f"shard={s:05d}", "data.parquet")
             for s in hit]
    # size the join/aggregate exchanges to the data actually in play:
    # the probe side is materialized (count is metadata) and the index
    # side's row counts come free from the shard manifests. A small
    # incremental batch then pays 1-2 bucket tasks instead of
    # num_buckets near-empty ones; corpus-sized probes keep the cap.
    old_rows = 0
    for s in hit:
        with open(os.path.join(index_dir, f"shard={s:05d}",
                               "MANIFEST.json")) as f:
            old_rows += json.load(f).get("rows", 0)
    num_buckets = max(1, min(num_buckets,
                             1 + max(bands_new.count(), old_rows) // 100_000))
    if not paths:
        return rd.from_arrow(pa.table({
            "new_id": pa.array([], pa.int64()),
            "old_id": pa.array([], pa.int64()),
            "n_bands": pa.array([], pa.int64())}))
    old = rd.read_parquet(paths, partitioning=None).map_batches(
        lambda b: pa.table({"old_id": b[id_col], "_gkey": b["_gkey"]}),
        batch_format="pyarrow")

    cands = hash_join(bands_new, old, "_gkey", how="inner",
                      num_buckets=num_buckets)

    def strip(b: pa.Table) -> pa.Table:
        return b.select(["new_id", "old_id"])

    return hash_aggregate(cands.map_batches(strip, batch_format="pyarrow"),
                          ["new_id", "old_id"],
                          {"n_bands": (None, "count")},
                          num_buckets=num_buckets)
