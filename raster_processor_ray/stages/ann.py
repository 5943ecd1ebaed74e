"""Similarity search over an embedding column (``list<float>``).

- ``cosine_topk``: brute-force exact top-k — numpy matmul per batch
  against a broadcast query matrix (the baseline; exact).
- ``ivf_topk``: IVF-style scale path — vectors are bucketed by nearest
  centroid (deterministic k-means-lite seeded from hashed samples); a
  query probes the ``nprobe`` nearest centroid buckets only. Approximate;
  recall grows with nprobe.

Both are actor-pool stages holding the (small) query matrix / centroid
table broadcast via ``ray.put``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import actor_pool_size


def _as_matrix(col) -> np.ndarray:
    """list<float> arrow column -> (n, d) float64 matrix (zero-copy-ish).

    Uses ``flatten()``, NOT ``.values``: a sliced ListArray (or one whose
    offsets start past 0) carries extra leading elements in ``.values``,
    which misaligns — or crashes — the reshape (same offset rule as the
    flagship zonal unpack, pipelines/flagship.py)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = np.asarray(col.flatten(), dtype=np.float64)
    return flat.reshape(len(col), -1)  # raises on ragged rows


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1.0, n)


class CosineTopK:
    """For each query vector, the k nearest dataset vectors by cosine.

    The *queries* are broadcast (small side); the dataset streams through.
    Emits per batch the local top-k per query; a final combine keeps the
    global top-k (map-side partial top-k -> tiny reduce, same shape as the
    rasterizer's partial aggregation).
    """

    def __init__(self, queries_ref, k: int = 10, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
        import ray
        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.q = _normalize(np.asarray(q, dtype=np.float64))  # (Q, d)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_as_matrix(batch[self.vec_col]))       # (n, d)
        ids = np.asarray(batch[self.id_col])
        sims = self.q @ m.T                                    # (Q, n)
        qn, n = sims.shape
        k = min(self.k, n)
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k] if k < n else \
            np.broadcast_to(np.arange(n), (qn, n)).copy()
        ps = np.take_along_axis(sims, part, axis=1)
        ordk = np.lexsort((np.take_along_axis(
            np.broadcast_to(ids, (qn, n)).copy(), part, axis=1), -ps), axis=1)
        idx = np.take_along_axis(part, ordk, axis=1)
        sv = np.take_along_axis(ps, ordk, axis=1)
        return pa.table({
            "query_id": pa.array(np.repeat(np.arange(qn, dtype=np.int64), k)),
            self.id_col: pa.array(ids[idx].ravel()),
            "cosine": pa.array(sv.ravel()),
        })


def combine_topk(df: pd.DataFrame, k: int, id_col: str = "vec_id") -> pd.DataFrame:
    """Reduce per-batch partial top-k lists to the global top-k per query."""
    df = df.sort_values(["query_id", "cosine", id_col],
                        ascending=[True, False, True], kind="mergesort")
    out = df.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


def cosine_topk(ds, queries: np.ndarray, k: int = 10, *, vec_col: str = "embedding",
                id_col: str = "vec_id", batch_size: int = 4096, concurrency=None):
    """Exact brute-force cosine top-k of ``queries`` against the dataset."""
    import ray

    qref = ray.put(np.asarray(queries, dtype=np.float64))
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size, num_cpus=0.5,
                  fn_constructor_args=(qref, k, vec_col, id_col))
    kwargs["concurrency"] = (actor_pool_size(0.5) if concurrency is None
                             else concurrency)
    from ..util import pin_for_shuffle

    partials = pin_for_shuffle(ds.map_batches(CosineTopK, **kwargs))
    # all partials for one query must meet: tiny shuffle on query_id
    return partials.groupby("query_id").map_groups(
        lambda df: combine_topk(df, k, id_col), batch_format="pandas")


def ivf_build_centroids(ds, *, vec_col: str = "embedding", num_centroids: int = 16,
                        sample_blocks: int = 4) -> np.ndarray:
    """Deterministic IVF 'training': take the first vectors of a few blocks
    as seeds, run a few Lloyd iterations driver-side on a bounded sample."""
    sample = ds.limit(num_centroids * 64).to_pandas()
    m = np.stack(sample[vec_col].to_numpy())
    m = _normalize(np.asarray(m, dtype=np.float64))
    cents = m[:num_centroids].copy()
    for _ in range(5):
        assign = (m @ cents.T).argmax(axis=1)
        for c in range(num_centroids):
            sel = m[assign == c]
            if len(sel):
                v = sel.mean(axis=0)
                cents[c] = v / (np.linalg.norm(v) or 1.0)
    return cents


class IvfAssign:
    """Append ``ivf_bucket`` = nearest centroid id (scale path: shuffle by
    bucket once, then queries probe only ``nprobe`` buckets)."""

    def __init__(self, cents_ref, vec_col: str = "embedding"):
        import ray
        c = ray.get(cents_ref) if not isinstance(cents_ref, np.ndarray) else cents_ref
        self.cents = np.asarray(c, dtype=np.float64)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_as_matrix(batch[self.vec_col]))
        bucket = (m @ self.cents.T).argmax(axis=1).astype(np.int64)
        return batch.append_column("ivf_bucket", pa.array(bucket))


def _hyperplanes(dim: int, num_bits: int) -> np.ndarray:
    """Deterministic random hyperplanes (splitmix-seeded; no RNG state)."""
    from ..geo.hashing import splitmix64

    idx = np.arange(num_bits * dim, dtype=np.uint64)
    u = splitmix64(idx).astype(np.float64) / 2**64
    # inverse-normal-ish via sum of uniforms (CLT; adequate for LSH)
    u2 = splitmix64(idx + np.uint64(1 << 40)).astype(np.float64) / 2**64
    g = (u + u2 - 1.0)
    return g.reshape(num_bits, dim)


def cosine_near_dup_pairs(ds, *, vec_col: str = "embedding", id_col: str = "vec_id",
                          threshold: float = 0.9, num_bits: int = 32,
                          num_bands: int = 4, max_bucket_size: int = 4096,
                          num_buckets: int = 64):
    """Embedding-cosine near-duplicate pairs via random-hyperplane LSH.

    Candidate stage ships ONLY (id, band-group key) through the shuffle —
    24 bytes/row/band, never the vectors (the naive form replicates every
    vector num_bands times through the exchange). Candidate id pairs are
    emitted per bounded bucket with the vectorized group-pair kernel
    (giant buckets star-collapse with a logged count), made distinct,
    then vectors are re-attached to the (small) candidate pair set by
    two bucketed hash joins and verified with an exact per-pair cosine.
    """
    import logging

    import pandas as pd
    import ray

    from ..aggregate.relational import hash_join
    from ..geo.hashing import splitmix64
    from .dedup import _dedup_pairs_arrays, _group_pair_indices

    sample = ds.limit(1).to_pandas()
    dim = len(sample[vec_col].iloc[0])
    planes_ref = ray.put(_hyperplanes(dim, num_bits))
    bits_per_band = num_bits // num_bands

    class Signature:
        def __init__(self):
            self.planes = ray.get(planes_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_as_matrix(batch[vec_col]))
            bits = (m @ self.planes.T) > 0                    # (n, num_bits)
            ids = np.asarray(batch[id_col])
            n = len(ids)
            weights = (1 << np.arange(bits_per_band, dtype=np.int64))
            gkeys = np.empty((num_bands, n), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for band in range(num_bands):
                    seg = bits[:, band * bits_per_band:(band + 1) * bits_per_band]
                    key = (seg.astype(np.int64) * weights).sum(axis=1)
                    gkeys[band] = splitmix64(
                        key.astype(np.uint64)
                        + np.uint64(band) * np.uint64(0x9E3779B97F4A7C15))
            g = gkeys.ravel()
            return pa.table({
                id_col: pa.array(np.tile(ids, num_bands)),
                "_gkey": pa.array(g.astype(np.int64)),
                "_bucket": pa.array((g % np.uint64(num_buckets)).astype(np.int64)),
            })

    def emit_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        gkey = df["_gkey"].to_numpy()
        order = np.lexsort((ids, gkey))
        ids_s, g_s = ids[order], gkey[order]
        starts = np.flatnonzero(np.r_[True, g_s[1:] != g_s[:-1]]) if len(g_s) \
            else np.empty(0, dtype=np.int64)
        sizes = np.diff(np.r_[starts, len(g_s)])
        ia, ib, n_collapsed = _group_pair_indices(sizes, starts, max_bucket_size)
        if n_collapsed:
            logging.getLogger(__name__).warning(
                "embed-LSH: collapsed %d buckets larger than %d",
                n_collapsed, max_bucket_size)
        a, b = _dedup_pairs_arrays(ids_s[ia], ids_s[ib])
        return pd.DataFrame({"id_a": a, "id_b": b})

    from ..util import pin_for_shuffle

    candidates = (pin_for_shuffle(ds.map_batches(Signature, batch_format="pyarrow",
                                                 concurrency=actor_pool_size(0.5),
                                                 num_cpus=0.5))
                  .groupby("_bucket")
                  .map_groups(emit_bucket, batch_format="pandas"))
    # vector re-attach: each side of the docs table shuffles ONCE against
    # the (small) candidate pairs, instead of once per band; cross-band
    # duplicate candidates drop out inside the first join's buckets
    # (same id_a -> same bucket), so no dedicated distinct shuffle
    def side(tag: str):
        def f(b: pa.Table) -> pa.Table:
            # pack vectors to float32 bytes: a plain binary column survives
            # every exchange (Ray's tensor-extension list columns do not
            # reconstruct from sliced group blocks) and halves the bytes
            m = _as_matrix(b[vec_col]).astype(np.float32)
            packed = [row.tobytes() for row in m]
            return pa.table({f"id_{tag}": b[id_col],
                             f"vec_{tag}": pa.array(packed, type=pa.binary())})
        return f

    joined = hash_join(candidates, ds.map_batches(side("a"), batch_format="pyarrow"),
                       "id_a", num_buckets=num_buckets, num_partitions=8,
                       left_distinct=["id_a", "id_b"])
    joined = hash_join(joined, ds.map_batches(side("b"), batch_format="pyarrow"),
                       "id_b", num_buckets=num_buckets, num_partitions=8)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        def unpack(col) -> np.ndarray:
            flat = np.frombuffer(b"".join(col), dtype=np.float32)
            return flat.reshape(len(col), -1).astype(np.float64)

        ma = _normalize(unpack(df["vec_a"].to_list()))
        mb = _normalize(unpack(df["vec_b"].to_list()))
        cos = np.einsum("ij,ij->i", ma, mb)
        out = df[["id_a", "id_b"]].copy()
        out["cosine"] = cos
        return out[cos >= threshold]

    return joined.map_batches(verify, batch_format="pandas")


def ivf_topk(ds, queries: np.ndarray, k: int = 10, *, vec_col: str = "embedding",
             id_col: str = "vec_id", num_centroids: int = 16, nprobe: int = 4):
    """Approximate top-k: probe only the nprobe nearest centroid buckets.

    This form still SCANS all blocks and filters by bucket (right when
    the index is built ad hoc in the same session); the scale path is
    ``ivf_build_index`` + ``ivf_topk_indexed``, where the probe reads
    only the probed buckets' shards from storage."""
    import ray

    cents = ivf_build_centroids(ds, vec_col=vec_col, num_centroids=num_centroids)
    cref = ray.put(cents)
    assigned = ds.map_batches(IvfAssign, fn_constructor_args=(cref, vec_col),
                              batch_format="pyarrow",
                              concurrency=actor_pool_size(0.5), num_cpus=0.5)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]       # (Q, nprobe)
    wanted = np.unique(probe)

    import pyarrow.compute as pc
    filtered = assigned.map_batches(
        lambda b: b.filter(pc.is_in(b["ivf_bucket"], value_set=pa.array(wanted))),
        batch_format="pyarrow")
    return cosine_topk(filtered, q, k, vec_col=vec_col, id_col=id_col)


def ivf_build_index(ds, out_dir: str, *, vec_col: str = "embedding",
                    id_col: str = "vec_id", num_centroids: int = 16):
    """Persist a BUCKET-PARTITIONED IVF layout: vectors are assigned to
    their nearest centroid and written through the resumable layout with
    ``num_shards == num_centroids``, so shard i on disk holds exactly
    bucket i. A probe then READS only the probed shards — storage-level
    pruning, not a scan-and-filter. Centroids are stored alongside.

    Returns the centroid matrix.
    """
    import os

    from ..state import lineage

    cents = ivf_build_centroids(ds, vec_col=vec_col,
                                num_centroids=num_centroids)
    import ray
    cref = ray.put(cents)
    assigned = ds.map_batches(IvfAssign, fn_constructor_args=(cref, vec_col),
                              batch_format="pyarrow",
                              concurrency=actor_pool_size(0.5), num_cpus=0.5)

    # pack vectors to bytes for a byte-stable parquet layout (and to halve
    # storage vs float64 lists); unpacked on read
    def pack(b: pa.Table) -> pa.Table:
        m = _as_matrix(b[vec_col]).astype(np.float32)
        return pa.table({
            id_col: b[id_col],
            "ivf_bucket": b["ivf_bucket"],
            "vec_packed": pa.array([row.tobytes() for row in m],
                                   type=pa.binary()),
        })

    lineage.write_resumable(assigned.map_batches(pack, batch_format="pyarrow"),
                            out_dir, key_col="ivf_bucket",
                            num_shards=num_centroids)
    np.save(os.path.join(out_dir, "centroids.npy"), cents)
    return cents


def ivf_topk_indexed(index_dir: str, queries: np.ndarray, k: int = 10, *,
                     id_col: str = "vec_id", nprobe: int = 4):
    """Probe a persisted IVF index: read ONLY the shards of the ``nprobe``
    nearest buckets per query (shard == bucket in the index layout), then
    exact cosine top-k over the loaded candidates."""
    import os

    import ray.data as rd

    from ..state import lineage

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]
    wanted = set(np.unique(probe).tolist())
    avail = lineage.finished_shards(index_dir)
    paths = [os.path.join(index_dir, f"shard={s:05d}", "data.parquet")
             for s in sorted(wanted & avail)]
    ds = rd.read_parquet(paths, partitioning=None)

    def unpack(b: pa.Table) -> pa.Table:
        flat = np.frombuffer(b"".join(b["vec_packed"].to_pylist()),
                             dtype=np.float32)
        m = flat.reshape(b.num_rows, -1).astype(np.float64)
        return pa.table({
            id_col: b[id_col],
            "embedding": pa.array(list(m)),
        })

    return cosine_topk(ds.map_batches(unpack, batch_format="pyarrow"), q, k,
                       vec_col="embedding", id_col=id_col)
