"""Cardinality sketches: HyperLogLog (Flajolet et al. 2007, public
algorithm) as a Ray Data aggregate.

Why it exists next to the EXACT ``count_distinct``: the exact operator's
shuffle is bounded by distinct (key, value) pairs — at 10^12 urls that
bound IS the data. The HLL path ships a FIXED 2^p-byte register block
per (key, block) regardless of cardinality: map-side per-batch register
fold (vectorized ``np.maximum.at``), register-wise max merge per key in
one bucketed exchange, estimate at finalize. Standard error
1.04/sqrt(2^p) (~1.6% at p=12).

Register blocks travel as fixed-width binary columns (the same
representation the minhash estimate filter uses — plain binary survives
every block-format conversion).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..geo.hashing import splitmix64


def _hll_idx_rank(values: np.ndarray, p: int):
    """(register index, rank) per value: idx = top p bits of the hash,
    rank = leading zeros of the remaining bits + 1 (binary-reduction
    clz — float tricks are unsafe past 2^53)."""
    h = splitmix64(values.astype(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    with np.errstate(over="ignore"):
        x = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # guard low bits
        lz = np.zeros(len(h), dtype=np.int64)
        for shift in (32, 16, 8, 4, 2, 1):
            mask = x < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            x[mask] = x[mask] << np.uint64(shift)
    rank = np.minimum(lz + 1, 64 - p + 1).astype(np.uint8)
    return idx, rank


def _hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small/large-range corrections."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)       # linear counting
    return float(est)


def hll_count_distinct(ds, keys, col: str, *, p: int = 12,
                       out: str = "approx_distinct",
                       num_buckets: int = 32):
    """Approximate COUNT(DISTINCT col) per key. ``col`` must be numeric
    (hash string keys first). One bounded exchange: each batch ships ONE
    2^p-byte register block per key it saw."""
    from ..aggregate.relational import _key_bucket
    from ..util import pin_for_shuffle

    keys = [keys] if isinstance(keys, str) else list(keys)
    m = 1 << p

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        """One register block per key in the batch, VECTORIZED across
        keys: one factorize + one np.maximum.at on the flat
        (key, register) plane — no per-key Python."""
        kidx, uk = pd.factorize(
            df[keys[0]] if len(keys) == 1
            else pd.MultiIndex.from_frame(df[keys]))
        nk = len(uk)
        idx, rank = _hll_idx_rank(
            df[col].to_numpy().astype(np.uint64), p)
        flat = np.zeros(nk * m, dtype=np.uint8)
        np.maximum.at(flat, kidx * m + idx, rank)
        key_frame = (pd.DataFrame({keys[0]: uk}) if len(keys) == 1
                     else pd.DataFrame(list(uk), columns=keys))
        key_frame["_regs"] = [flat[i * m:(i + 1) * m].tobytes()
                              for i in range(nk)]
        key_frame["_bucket"] = _key_bucket(key_frame, keys, num_buckets)
        return key_frame

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        """Register-wise max across each key's blocks: factorize + one
        maximum.at over the (key, register) plane, then estimate."""
        kidx, uk = pd.factorize(
            df[keys[0]] if len(keys) == 1
            else pd.MultiIndex.from_frame(df[keys]))
        nk = len(uk)
        blocks = np.frombuffer(b"".join(df["_regs"]),
                               dtype=np.uint8).reshape(len(df), m)
        regs = np.zeros((nk, m), dtype=np.uint8)
        np.maximum.at(regs, kidx, blocks)
        res = (pd.DataFrame({keys[0]: uk}) if len(keys) == 1
               else pd.DataFrame(list(uk), columns=keys))
        res[out] = [int(round(_hll_estimate(regs[i]))) for i in range(nk)]
        return res

    tagged = pin_for_shuffle(ds.map_batches(fold, batch_format="pandas"))
    return tagged.groupby("_bucket").map_groups(merge,
                                                batch_format="pandas")
