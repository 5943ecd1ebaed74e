"""Product quantization (PQ) for compressed ANN — the byte-code scale
path of the billion-vector index (Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — public
algorithm; composes with `ann.ivf_build_index` into the standard IVF-PQ
layout).

Shapes at 100 TB: a 64-dim float32 vector is 256 B; its PQ code at
m=8 subspaces is 8 B (32x), so a 10^12-vector corpus's codes fit in
~8 TB and a scan of one IVF shard's codes is memory-bandwidth cheap.
Training is driver-side Lloyd on a BOUNDED sample (same contract as
``ivf_build_centroids``: deterministic first-blocks sample, documented
bias); encode is a stateless broadcast-ref map over the stream; search
is asymmetric distance computation (ADC) — per query one (m, ks)
table of exact subspace distances, then each code row costs m table
lookups, vectorized with one ``take`` per subspace, never a Python
loop over rows.  Top-k mirrors ``cosine_topk``: per-batch partial
top-k, one tiny query_id reduce.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import actor_pool_size

from .ann import _as_matrix


def pq_train(ds, *, vec_col: str = "embedding", m: int = 8, ks: int = 16,
             iters: int = 8, sample_rows: int = 4096) -> np.ndarray:
    """-> codebooks (m, ks, d/m) float64. Deterministic: seeds are the
    sample's first ``ks`` vectors per subspace; empty cells keep their
    previous centroid (kmeans contract)."""
    sample = ds.limit(sample_rows).to_pandas()
    x = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.empty((m, ks, dsub))
    for j in range(m):
        sub = x[:, j * dsub:(j + 1) * dsub]
        c = sub[:ks].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for ci in range(ks):
                sel = sub[a == ci]
                if len(sel):
                    c[ci] = sel.mean(axis=0)
        books[j] = c
    return books


class PqEncode:
    """Stateless broadcast-ref encode: (id, code binary[m]) per row."""

    def __init__(self, books_ref, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
        import ray
        b = ray.get(books_ref) if not isinstance(books_ref, np.ndarray) \
            else books_ref
        self.books = np.asarray(b, dtype=np.float64)   # (m, ks, dsub)
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = _as_matrix(batch[self.vec_col]).astype(np.float64)
        m, ks, dsub = self.books.shape
        codes = np.empty((len(x), m), dtype=np.uint8)
        for j in range(m):
            sub = x[:, j * dsub:(j + 1) * dsub]
            # (n, ks) squared L2 via expansion; ks is small (<=256)
            d2 = (sub ** 2).sum(1)[:, None] \
                - 2.0 * sub @ self.books[j].T \
                + (self.books[j] ** 2).sum(1)[None, :]
            codes[:, j] = d2.argmin(axis=1)
        return pa.table({
            self.id_col: batch[self.id_col],
            "pq_code": pa.array([row.tobytes() for row in codes],
                                type=pa.binary())})


def pq_encode(ds, books: np.ndarray, *, vec_col: str = "embedding",
              id_col: str = "vec_id", batch_size: int = 4096):
    import ray
    ref = ray.put(np.asarray(books, dtype=np.float64))
    return ds.map_batches(PqEncode, fn_constructor_args=(ref, vec_col, id_col),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=actor_pool_size(0.5), num_cpus=0.5)


class PqAdcTopK:
    """Per-batch partial top-k by ADC distance over PQ codes."""

    def __init__(self, books_ref, queries_ref, k: int,
                 id_col: str = "vec_id"):
        import ray
        self.books = np.asarray(
            ray.get(books_ref) if not isinstance(books_ref, np.ndarray)
            else books_ref, dtype=np.float64)
        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) \
            else queries_ref
        q = np.asarray(q, dtype=np.float64)
        m, ks, dsub = self.books.shape
        # distance tables once per actor: (Q, m, ks) exact subspace L2^2
        qs = q.reshape(len(q), m, dsub)
        self.tables = ((qs[:, :, None, :] - self.books[None, :, :, :]) ** 2
                       ).sum(axis=3)
        self.k = k
        self.id_col = id_col
        self.m = m

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col])
        code_col = batch["pq_code"]
        if isinstance(code_col, pa.ChunkedArray):
            code_col = code_col.combine_chunks()
        flat = np.frombuffer(b"".join(code_col.to_pylist()), dtype=np.uint8)
        codes = flat.reshape(len(ids), self.m)
        qn = len(self.tables)
        n = len(ids)
        dist = np.zeros((qn, n))
        for j in range(self.m):
            # (Q, n) gather from this subspace's table column
            dist += self.tables[:, j, :][:, codes[:, j]]
        k = min(self.k, n)
        # PQ distances TIE often (points sharing a code are equidistant),
        # and argpartition picks arbitrary members of the boundary tie
        # group before any id tie-break — take every element <= the kth
        # distance, then lexsort (dist, id) inside that small candidate
        # set. The per-query loop is over the BROADCAST query set (small
        # by design); all inner ops are vectorized.
        kth = np.partition(dist, k - 1, axis=1)[:, k - 1] if k < n else \
            dist.max(axis=1)
        out_q, out_i, out_d = [], [], []
        for qi in range(qn):
            sel = np.flatnonzero(dist[qi] <= kth[qi])
            order = sel[np.lexsort((ids[sel], dist[qi][sel]))][:k]
            out_q.append(np.full(len(order), qi, dtype=np.int64))
            out_i.append(ids[order])
            out_d.append(dist[qi][order])
        return pa.table({
            "query_id": np.concatenate(out_q),
            self.id_col: np.concatenate(out_i),
            "adc_dist": np.concatenate(out_d)})


def pq_topk(codes_ds, books: np.ndarray, queries: np.ndarray, k: int = 10, *,
            id_col: str = "vec_id", batch_size: int = 8192):
    """ADC top-k of ``queries`` against an encoded dataset -> (query_id,
    id, adc_dist, rank); ascending distance, id tie-break."""
    import ray

    from ..util import pin_for_shuffle
    bref = ray.put(np.asarray(books, dtype=np.float64))
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = pin_for_shuffle(codes_ds.map_batches(
        PqAdcTopK, fn_constructor_args=(bref, qref, k, id_col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=actor_pool_size(0.5), num_cpus=0.5))

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "adc_dist", id_col],
                            kind="mergesort")
        out = df.groupby("query_id", as_index=False).head(k).reset_index(
            drop=True)
        out["rank"] = out.groupby("query_id").cumcount() + 1
        return out

    return partials.groupby("query_id").map_groups(
        combine, batch_format="pandas")


# ---------------------------------------------------------------------------
# IVF-PQ: coarse shard pruning + byte-code scan (the billion-vector layout)
# ---------------------------------------------------------------------------

class IvfPqEncode:
    """One fused pass: normalize -> coarse-assign -> PQ-encode.
    Emits (id, ivf_bucket, pq_code); vectors never leave the task."""

    def __init__(self, cents_ref, books_ref, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
        import ray
        self.cents = np.asarray(
            ray.get(cents_ref) if not isinstance(cents_ref, np.ndarray)
            else cents_ref, dtype=np.float64)
        self.books = np.asarray(
            ray.get(books_ref) if not isinstance(books_ref, np.ndarray)
            else books_ref, dtype=np.float64)
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .ann import _normalize
        x = _normalize(_as_matrix(batch[self.vec_col]).astype(np.float64))
        bucket = (x @ self.cents.T).argmax(axis=1).astype(np.int64)
        m, ks, dsub = self.books.shape
        codes = np.empty((len(x), m), dtype=np.uint8)
        for j in range(m):
            sub = x[:, j * dsub:(j + 1) * dsub]
            d2 = (sub ** 2).sum(1)[:, None] - 2.0 * sub @ self.books[j].T \
                + (self.books[j] ** 2).sum(1)[None, :]
            codes[:, j] = d2.argmin(axis=1)
        return pa.table({
            self.id_col: batch[self.id_col],
            "ivf_bucket": pa.array(bucket),
            "pq_code": pa.array([row.tobytes() for row in codes],
                                type=pa.binary())})


def ivf_pq_build_index(ds, out_dir: str, *, vec_col: str = "embedding",
                       id_col: str = "vec_id", num_centroids: int = 16,
                       m: int = 8, ks: int = 16,
                       input_fingerprint: str | None = None):
    """Persist the standard IVF-PQ layout: shard i on disk holds bucket
    i's (id, m-byte code) rows — a probe reads only ``nprobe`` shards
    AND scans only codes, so per-probed-vector cost is m bytes of I/O
    and m table lookups. Vectors are L2-normalized before both coarse
    assignment and PQ (unit-sphere L2^2 = 2 - 2*cos, so ADC ranking
    matches the engine's cosine semantics). Returns (centroids,
    codebooks), also persisted alongside the shards."""
    import os

    import ray

    from .ann import _normalize, ivf_build_centroids
    from ..state import lineage

    cents = ivf_build_centroids(ds, vec_col=vec_col,
                                num_centroids=num_centroids)

    def norm_vec(b: pa.Table) -> pa.Table:
        xs = _normalize(_as_matrix(b[vec_col]).astype(np.float64))
        return pa.table({id_col: b[id_col],
                         vec_col: pa.array(list(xs))})

    books = pq_train(ds.map_batches(norm_vec, batch_format="pyarrow"),
                     vec_col=vec_col, m=m, ks=ks)
    cref, bref = ray.put(cents), ray.put(books)
    encoded = ds.map_batches(
        IvfPqEncode, fn_constructor_args=(cref, bref, vec_col, id_col),
        batch_format="pyarrow", concurrency=actor_pool_size(0.5), num_cpus=0.5)
    lineage.write_resumable(encoded, out_dir, key_col="ivf_bucket",
                            num_shards=num_centroids,
                            input_fingerprint=input_fingerprint)
    np.save(os.path.join(out_dir, "centroids.npy"), cents)
    np.save(os.path.join(out_dir, "codebooks.npy"), books)
    return cents, books


def ivf_pq_topk(index_dir: str, queries: np.ndarray, k: int = 10, *,
                nprobe: int = 4, id_col: str = "vec_id"):
    """Probe a persisted IVF-PQ index: read only the ``nprobe`` nearest
    buckets' shards per query (union across queries, like
    ``ivf_topk_indexed``), ADC top-k over their codes."""
    import os

    import ray.data as rd

    from .ann import _normalize
    from ..state import lineage

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    books = np.load(os.path.join(index_dir, "codebooks.npy"))
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]
    wanted = set(np.unique(probe).tolist())
    avail = lineage.finished_shards(index_dir)
    paths = [os.path.join(index_dir, f"shard={s:05d}", "data.parquet")
             for s in sorted(wanted & avail)]
    codes = rd.read_parquet(paths, partitioning=None)
    return pq_topk(codes, books, q, k, id_col=id_col)
