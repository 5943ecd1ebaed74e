"""One-pass covariance matrix + PCA projection over an embedding column
— dimensionality reduction for curation (whitening, PCA-based dedup,
outlier pruning) in the engine's bounded-partial shape.

``covariance_matrix``: each batch emits ONE partial row — (n, Σx (d,),
ΣxxT (d·d, packed)) — computed as a single ``m.T @ m`` GEMM; the driver
folds blocks-many partials (d² floats each, never data-sized) into
cov = (S − s·sᵀ/n) / (n−1). Float sums combine in block order, so
entries can differ across partitionings by ~1 ulp (callers round
reported statistics; the oracle query rounds to 6).

``pca_project``: eigendecompose driver-side (d×d, tiny), broadcast the
top-c eigenvectors once, and project in one stateless map pass.
Deterministic sign convention: each component is flipped so its
largest-|coefficient| entry is positive (eigh sign is otherwise
arbitrary).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.ann import _as_matrix


def covariance_matrix(ds, *, vec_col: str = "embedding",
                      batch_size: int = 8192):
    """-> (n, mean (d,), cov (d, d)) — sample covariance (n−1)."""

    def partial(b: pa.Table) -> pa.Table:
        m = _as_matrix(b[vec_col]).astype(np.float64)
        n, d = m.shape
        return pa.table({
            "n": pa.array([n], type=pa.int64()),
            "s": pa.array([m.sum(axis=0)]),
            "ss": pa.array([(m.T @ m).reshape(-1)]),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=batch_size).to_pandas()
    n = int(parts.n.sum())
    if n < 2:
        raise ValueError("covariance needs at least 2 rows")
    s = np.sum(np.stack(parts.s.to_numpy()), axis=0)
    ss = np.sum(np.stack(parts.ss.to_numpy()), axis=0)
    d = len(s)
    S = ss.reshape(d, d)
    mean = s / n
    cov = (S - np.outer(s, s) / n) / (n - 1)
    return n, mean, cov


def pca_components(cov: np.ndarray, c: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-``c`` eigenpairs of a covariance matrix, variance-descending,
    sign-normalized (largest-|coefficient| entry positive)."""
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:c]
    comps = v[:, order].T                    # (c, d)
    flip = np.sign(comps[np.arange(len(comps)),
                         np.abs(comps).argmax(axis=1)])
    return w[order], comps * flip[:, None]


class _Project:
    def __init__(self, ref, vec_col: str, id_col: str):
        import ray
        p = ray.get(ref)
        self.mean, self.comps = p["mean"], p["comps"]
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, b: pa.Table) -> pa.Table:
        m = _as_matrix(b[self.vec_col]).astype(np.float64)
        proj = (m - self.mean) @ self.comps.T
        return pa.table({
            self.id_col: b[self.id_col],
            "pc": pa.array(list(proj)),
        })


def pca_project(ds, mean: np.ndarray, components: np.ndarray, *,
                vec_col: str = "embedding", id_col: str = "vec_id",
                batch_size: int = 8192, concurrency: int = 4):
    """(id, pc list<double>) — centered projection onto the components."""
    import ray

    ref = ray.put({"mean": np.asarray(mean, dtype=np.float64),
                   "comps": np.asarray(components, dtype=np.float64)})
    return ds.map_batches(_Project, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=0.5,
                          fn_constructor_args=(ref, vec_col, id_col))
