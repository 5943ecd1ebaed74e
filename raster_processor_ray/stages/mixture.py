"""Training-mixture composition: deterministic weighted down-sampling
per group (the data-mixture step of every LM pre-training pipeline) and
a deterministic pseudo-random global shuffle into training shards.

Reference analog: O4's deterministic 1-in-k subsample
(make_raster_region_maps.py:129-133), generalized to per-group rates
and to a full permutation.

Determinism contract (FIXTURES.md 19's arithmetic family): the sampling
key is ``(id * 2654435761 + C) % 1000000007`` — pure int64 arithmetic
(ids must stay below ~3.4e9 so the product fits int64; same bound as
``lang_sample``), identical in NumPy and ANSI SQL, so reruns/retries
keep or drop exactly the same rows at any parallelism.

- ``mixture_sample``: stateless map, NO shuffle — each row's fate is a
  pure function of (id, group). Weights are keep-rates in [0, 1]
  (weights > 1 are epoch multipliers — repetition belongs to the
  packing/loader layer, not the sampler).
- ``shuffle_shards``: shard = hash % S is assigned map-side; ONE
  bounded exchange (S groups) orders each shard by (hash, id) — a
  deterministic permutation of the corpus that breaks source/time
  locality without any random state. Output ordinals are per-shard,
  so writers can stream each shard independently (resumable layout).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

P = np.int64(1_000_000_007)
A = np.int64(2_654_435_761)


def _skey(ids: np.ndarray, c: int) -> np.ndarray:
    return (ids * A + np.int64(c)) % P


def mixture_sample(ds, weights: dict[str, float], *,
                   group_col: str = "lang", id_col: str = "doc_id",
                   salt: int = 19, keep_cols: list[str] | None = None):
    """Keep each row of group g with probability ``weights.get(g, 0)``,
    deterministically by ``id_col``. Threshold is the exact integer
    ``floor(w * P)`` — inline the same literal in the SQL oracle."""
    thresholds = {g: np.int64(min(max(w, 0.0), 1.0) * int(P))
                  for g, w in weights.items()}

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(dtype=np.int64)
        thr = (df[group_col].map(thresholds).fillna(0)
               .to_numpy(dtype=np.int64))
        out = df[_skey(ids, salt) < thr]
        return out[keep_cols] if keep_cols else out

    return ds.map_batches(keep, batch_format="pandas")


def shuffle_shards(ds, num_shards: int, *, id_col: str = "doc_id",
                   salt: int = 23, keep_cols: list[str] | None = None):
    """-> input columns + ``shard`` (hash % num_shards) + ``ord``
    (0-based position within the shard, ordered by (hash, id)) — a
    deterministic global permutation materialized as S independent
    ordered shards."""
    from ..util import pin_for_shuffle

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        out = df[keep_cols].copy(deep=False) if keep_cols \
            else df.copy(deep=False)
        h = _skey(df[id_col].to_numpy(dtype=np.int64), salt)
        out["_h"] = h
        out["shard"] = (h % np.int64(num_shards)).astype(np.int64)
        return out

    def order(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_h", id_col], kind="mergesort")
        df = df.reset_index(drop=True)
        df["ord"] = np.arange(len(df), dtype=np.int64)
        return df.drop(columns=["_h"])

    withs = pin_for_shuffle(ds.map_batches(assign, batch_format="pandas"))
    return withs.groupby("shard").map_groups(order, batch_format="pandas")


def group_split(ds, group_col: str, *, bounds: tuple[int, ...] = (80, 95),
                names: tuple[str, ...] = ("train", "val", "test"),
                out_col: str = "split"):
    """Leakage-safe train/val/test assignment: EVERY row of a group
    (domain, source, author...) lands in the same split, so near-dup
    pages from one site can never straddle the train/eval boundary.

    The split key is ``int(md5(group)[:8hex]) % 100`` against ``bounds``
    percentile cut points — md5 so the exact assignment is reproducible
    in ANSI SQL (``('0x' || substr(md5(g),1,8))::BIGINT % 100``) and any
    other stack, not just this engine. md5 runs once per UNIQUE group
    value per batch (factorize -> hash uniques -> gather), not per row,
    so high-cardinality keys cost O(uniques) Python-side.

    Stateless map: no shuffle, no RNG, stable at any partitioning."""
    import hashlib

    assert len(names) == len(bounds) + 1

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy(deep=False)
        kidx, uk = pd.factorize(df[group_col])
        uh = np.asarray(
            [int(hashlib.md5(str(g).encode()).hexdigest()[:8], 16) % 100
             for g in uk], dtype=np.int64)
        h = uh[kidx]
        lab = np.full(len(df), names[-1], dtype=object)
        for b, nm in zip(reversed(bounds), reversed(names[:-1])):
            lab[h < b] = nm
        out[out_col] = lab
        return out

    return ds.map_batches(assign, batch_format="pandas")
