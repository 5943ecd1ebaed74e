"""Mergeable approximate quantile sketch (KLL-style compactor cascade;
public algorithm family: Karnin-Lang-Liberty 2016 / Manku et al. 1998
deterministic variant) as a Ray Data aggregate.

Why it exists next to the EXACT ``quantile_disc``/``quantile_cont``:
the exact operators' exchange is bounded by distinct (key, value)
pairs — for continuous measures at 10^12 rows that bound IS the data.
The sketch path ships a FIXED O(k log(n/k))-float blob per (key, block)
regardless of row count: map-side per-batch sketch build, blob merge
per key in one bucketed exchange, quantile read-off at finalize.

Determinism note: compaction keeps alternating halves of each sorted
level (a per-level parity counter, no RNG), so a sketch is a pure
function of its insertion order. Insertion order follows block order,
so ESTIMATES can differ across partitionings — within the error bound;
rank error is O(levels / k) of n (empirically < 1% of n at k=256,
pinned by tests/test_kll.py). Exact results for n <= k (everything
still sits in level 0 at weight 1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


class KLLSketch:
    """Compactor cascade: level i holds values of weight 2^i, capacity
    ``k`` floats. Overflow sorts the level and promotes every other
    element (alternating start parity) to level i+1."""

    __slots__ = ("k", "levels", "parity", "n")

    def __init__(self, k: int = 256):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.parity: list[int] = [0]
        self.n = 0

    def _compact(self):
        i = 0
        while i < len(self.levels):
            lv = self.levels[i]
            if len(lv) <= self.k:
                i += 1
                continue
            lv = np.sort(lv, kind="stable")
            off = self.parity[i] & 1
            self.parity[i] += 1
            promoted = lv[off::2]
            self.levels[i] = np.empty(0, dtype=np.float64)
            if i + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
                self.parity.append(0)
            self.levels[i + 1] = np.concatenate(
                [self.levels[i + 1], promoted])
            i += 1

    def update_many(self, vals: np.ndarray):
        vals = np.asarray(vals, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if not len(vals):
            return self
        self.n += len(vals)
        # feed in k-sized slabs so level 0 never balloons past 2k
        for s in range(0, len(vals), self.k):
            self.levels[0] = np.concatenate(
                [self.levels[0], vals[s:s + self.k]])
            self._compact()
        return self

    def merge(self, other: "KLLSketch"):
        assert other.k == self.k
        for i, lv in enumerate(other.levels):
            if i == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
                self.parity.append(0)
            self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self._compact()
        return self

    def _weighted(self):
        vals = np.concatenate(self.levels) if self.levels else np.empty(0)
        wts = np.concatenate([
            np.full(len(lv), 1 << i, dtype=np.int64)
            for i, lv in enumerate(self.levels)]) if self.levels else np.empty(0, dtype=np.int64)
        order = np.argsort(vals, kind="stable")
        return vals[order], wts[order]

    def quantiles(self, qs) -> np.ndarray:
        """Weighted lower-quantile read-off (matches quantile_disc's
        first-value-reaching-rank rule on the sketch's weighted items)."""
        vals, wts = self._weighted()
        if not len(vals):
            return np.full(len(list(qs)), np.nan)
        cum = np.cumsum(wts)
        total = cum[-1]
        out = []
        for q in qs:
            need = int(np.ceil(q * total))
            out.append(vals[np.searchsorted(cum, max(need, 1))
                            if need < total else len(vals) - 1])
        return np.asarray(out)

    # --- fixed-layout binary blob (survives any block-format hop) ---

    def to_bytes(self) -> bytes:
        head = np.asarray(
            [self.k, self.n, len(self.levels)], dtype=np.int64).tobytes()
        lens = np.asarray([len(lv) for lv in self.levels],
                          dtype=np.int64).tobytes()
        pars = np.asarray(self.parity, dtype=np.int64).tobytes()
        return head + lens + pars + np.concatenate(self.levels).tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KLLSketch":
        k, n, nl = np.frombuffer(blob, dtype=np.int64, count=3)
        lens = np.frombuffer(blob, dtype=np.int64, count=int(nl), offset=24)
        pars = np.frombuffer(blob, dtype=np.int64, count=int(nl),
                             offset=24 + 8 * int(nl))
        flat = np.frombuffer(blob, dtype=np.float64,
                             offset=24 + 16 * int(nl)).copy()
        s = cls(int(k))
        s.n = int(n)
        bounds = np.concatenate([[0], np.cumsum(lens)])
        s.levels = [flat[bounds[i]:bounds[i + 1]] for i in range(int(nl))]
        s.parity = pars.astype(int).tolist()
        return s


def kll_quantiles(ds, keys, value_col: str, qs, *, k: int = 256,
                  num_buckets: int = 32):
    """Approximate per-key quantiles in ONE bounded exchange: each batch
    ships one O(k log n) blob per key it saw; blobs merge per key and
    the quantiles read off at finalize. Output columns: keys + one
    ``q_<q>`` per requested quantile + ``approx_n``."""
    from ..aggregate.relational import _key_bucket
    from ..util import pin_for_shuffle

    keys = [keys] if isinstance(keys, str) else list(keys)
    qs = list(qs)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        kidx, uk = pd.factorize(
            df[keys[0]] if len(keys) == 1
            else pd.MultiIndex.from_frame(df[keys]))
        vals = df[value_col].to_numpy(dtype=np.float64)
        order = np.argsort(kidx, kind="stable")
        kidx_s, vals_s = kidx[order], vals[order]
        bounds = np.searchsorted(kidx_s, np.arange(len(uk) + 1))
        blobs = [KLLSketch(k).update_many(
                     vals_s[bounds[i]:bounds[i + 1]]).to_bytes()
                 for i in range(len(uk))]
        key_frame = (pd.DataFrame({keys[0]: uk}) if len(keys) == 1
                     else pd.DataFrame(list(uk), columns=keys))
        key_frame["_sk"] = blobs
        key_frame["_bucket"] = _key_bucket(key_frame, keys, num_buckets)
        return key_frame

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        kidx, uk = pd.factorize(
            df[keys[0]] if len(keys) == 1
            else pd.MultiIndex.from_frame(df[keys]))
        res = (pd.DataFrame({keys[0]: uk}) if len(keys) == 1
               else pd.DataFrame(list(uk), columns=keys))
        merged = [None] * len(uk)
        for i, blob in zip(kidx, df["_sk"]):
            s = KLLSketch.from_bytes(blob)
            merged[i] = s if merged[i] is None else merged[i].merge(s)
        ests = np.stack([m.quantiles(qs) for m in merged])
        for j, q in enumerate(qs):
            res[f"q_{q}"] = ests[:, j]
        res["approx_n"] = [m.n for m in merged]
        return res

    tagged = pin_for_shuffle(ds.map_batches(fold, batch_format="pandas"))
    return tagged.groupby("_bucket").map_groups(merge, batch_format="pandas")
