"""Bloom-filter broadcast semi-join (J-family extension).

The shape for "filter a huge fact stream by a large-but-broadcastable
key set": fold the key side into a bloom bit array (per-block partial
bloom -> OR-reduce; the array is FIXED size 2^b bits regardless of key
count), ``ray.put`` it once, and probe inside fused ``map_batches``
tasks — rows that fail the filter never reach a shuffle. An optional
exact bucketed semi-join over the surviving candidates removes the
bloom's false positives, so the composed operator is EXACT (and
SQL-oracle-checkable); the bloom stage only shrinks the exchange.

Sizing: false-positive rate ~ (1 - e^(-k*n/m))^k; the default
m=2^24 bits / k=5 holds ~1% FP at n=2M keys. At 10^8+ keys raise
``num_bits_log2`` (2^30 bits = 128 MiB broadcast once per node) — the
exactness never depends on the sizing, only the pre-shuffle kill rate.

Hashing: double hashing idx_i = h1 + i*h2 (mod m) over splitmix64
streams — the standard Kirsch-Mitzenmacher construction (public).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.hashing import splitmix64

_C2 = np.uint64(0x9E3779B97F4A7C15)


def _bloom_indices(vals: np.ndarray, num_bits: int, k: int) -> np.ndarray:
    """(n, k) bit indices via double hashing."""
    v = vals.astype(np.uint64)
    with np.errstate(over="ignore"):
        h1 = splitmix64(v)
        h2 = splitmix64(v ^ _C2) | np.uint64(1)
        steps = np.arange(k, dtype=np.uint64)
        idx = (h1[:, None] + steps[None, :] * h2[:, None]) % np.uint64(num_bits)
    return idx.astype(np.int64)


def _fold_bits(vals: np.ndarray, num_bits: int, k: int) -> np.ndarray:
    words = np.zeros(num_bits // 64, dtype=np.uint64)
    idx = _bloom_indices(vals, num_bits, k).ravel()
    np.bitwise_or.at(words, idx >> 6,
                     np.uint64(1) << (idx.astype(np.uint64) & np.uint64(63)))
    return words


def _probe_bits(words: np.ndarray, vals: np.ndarray, num_bits: int,
                k: int) -> np.ndarray:
    idx = _bloom_indices(vals, num_bits, k)
    bit = np.uint64(1) << (idx.astype(np.uint64) & np.uint64(63))
    hit = (words[idx >> 6] & bit) != 0
    return hit.all(axis=1)


def build_bloom(keys_ds, col: str, *, num_bits_log2: int = 24,
                num_hashes: int = 5, tree_fanin: int = 16):
    """Key dataset -> (bloom words ObjectRef, num_bits, k).

    Per-block partial blooms OR-combine associatively. Few partials
    (< ``tree_fanin``) fold directly on the driver; beyond that a
    ``tree_fanin``-ary tree of Ray tasks reduces them, so driver memory
    and wall time stay O(fanin x 2^(b-3) bytes) regardless of block
    count — at 10^5 input blocks the driver never holds more than one
    fan-in of register arrays."""
    import ray

    num_bits = 1 << num_bits_log2
    nwords = num_bits // 64

    def fold(b: pa.Table) -> pa.Table:
        vals = np.asarray(b[col]).astype(np.uint64)
        words = _fold_bits(vals, num_bits, num_hashes)
        return pa.table({"_bloom": pa.array([words.tobytes()],
                                            type=pa.binary())})

    @ray.remote
    def or_blobs(*blobs):
        acc = np.zeros(nwords, dtype=np.uint64)
        for blob in blobs:
            acc |= np.frombuffer(blob, dtype=np.uint64)
        return acc.tobytes()

    parts = [p["_bloom"] for p in
             keys_ds.map_batches(fold, batch_format="pyarrow").take_all()]
    while len(parts) > tree_fanin:
        parts = [or_blobs.remote(*parts[i:i + tree_fanin])
                 for i in range(0, len(parts), tree_fanin)]
        parts = ray.get(parts)
    acc = np.zeros(nwords, dtype=np.uint64)
    for blob in parts:
        acc |= np.frombuffer(blob, dtype=np.uint64)
    return ray.put(acc), num_bits, num_hashes


def bloom_semi_join(big_ds, keys_ds, on: str, *, key_col: str | None = None,
                    num_bits_log2: int = 24, num_hashes: int = 5,
                    exact: bool = True, num_buckets: int = 32):
    """Semi-join ``big_ds`` against ``keys_ds`` keys: broadcast bloom
    probe first (pre-shuffle kill), then (``exact=True``) a bucketed
    semi-join of the survivors to remove false positives."""
    import ray

    from ..aggregate.relational import hash_join

    key_col = key_col or on
    bloom_ref, num_bits, k = build_bloom(keys_ds, key_col,
                                         num_bits_log2=num_bits_log2,
                                         num_hashes=num_hashes)
    cache: dict = {}

    def probe(b: pa.Table) -> pa.Table:
        words = cache.get("w")
        if words is None:
            words = cache["w"] = ray.get(bloom_ref)
        vals = np.asarray(b[on]).astype(np.uint64)
        return b.filter(pa.array(_probe_bits(words, vals, num_bits, k)))

    candidates = big_ds.map_batches(probe, batch_format="pyarrow")
    if not exact:
        return candidates

    def keys_only(b: pa.Table) -> pa.Table:
        return pa.table({on: b[key_col]})

    rhs = keys_ds.map_batches(keys_only, batch_format="pyarrow")
    return hash_join(candidates, rhs, on, how="semi",
                     num_buckets=num_buckets)
