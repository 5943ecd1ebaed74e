"""Validation metrics harness — proc-vs-truth raster comparison.

Re-expresses the reference's golden-comparison pipeline (SURVEY.md §5):
``plot_raster_stats.py`` loads a processed and a truth raster, computes
per-cell error layers (``wse_err = data - truth``, plot_raster_stats.py:
236-241), masks to commonly-valid cells (242-303), and evaluates pass/fail
bounds from ``analysis/metrics.py:get_passfail`` (metrics.py:20-26):

    |e|_68 < 0.10  -> pass;  < 1 -> conditional pass
    |e/u|_68 < 1   -> pass;  < 2 -> conditional pass

Metric formulas follow analysis/metrics.py:54-86: weighted mean / std /
68th-percentile-of-|e| / median, with optional per-cell weights.

Distributed shape: the proc/truth join is a bucketed hash join on the
cell key (both sides are raster outputs — already small relative to the
input points), per-tile metrics via ``map_groups``; the global metrics
reduce the per-tile moments (exact for mean/std; quantiles combined from
the pooled error sample, which is bounded by the cell count).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

PASSFAIL = {
    "err_68_pass": 0.10,
    "err_68_conditional": 1.0,
    "norm_err_68_pass": 1.0,
    "norm_err_68_conditional": 2.0,
}


def compute_metrics_from_error(err: np.ndarray, weights: np.ndarray | None = None) -> dict:
    """Weighted mean/std/|68-pct|/median of an error sample
    (reference analysis/metrics.py:54-86)."""
    err = np.asarray(err, dtype=np.float64)
    m = np.isfinite(err)
    err = err[m]
    if len(err) == 0:
        return {"mean": np.nan, "std": np.nan, "e_68_pct": np.nan,
                "median": np.nan, "n": 0}
    if weights is None:
        w = np.ones_like(err)
    else:
        w = np.asarray(weights, dtype=np.float64)[m]
    wsum = w.sum()
    mean = (w * err).sum() / wsum
    std = np.sqrt((w * (err - mean) ** 2).sum() / wsum)
    e68 = np.percentile(np.abs(err), 68)
    med = np.median(err)
    return {"mean": mean, "std": std, "e_68_pct": e68, "median": med,
            "n": int(len(err))}


def get_passfail(metrics: dict, norm_metrics: dict | None = None) -> str:
    """'pass' / 'conditional' / 'fail' verdict (metrics.py:20-26 bounds)."""
    e68 = metrics.get("e_68_pct", np.nan)
    if not np.isfinite(e68):
        return "fail"
    verdict = ("pass" if e68 < PASSFAIL["err_68_pass"]
               else "conditional" if e68 < PASSFAIL["err_68_conditional"]
               else "fail")
    if norm_metrics is not None and np.isfinite(norm_metrics.get("e_68_pct", np.nan)):
        n68 = norm_metrics["e_68_pct"]
        nv = ("pass" if n68 < PASSFAIL["norm_err_68_pass"]
              else "conditional" if n68 < PASSFAIL["norm_err_68_conditional"]
              else "fail")
        order = {"pass": 0, "conditional": 1, "fail": 2}
        verdict = max(verdict, nv, key=lambda v: order[v])
    return verdict


def join_proc_truth(proc_ds, truth_ds, *, key: str = "grid_cell",
                    value_col: str = "wmean_value",
                    uncert_col: str | None = "wmean_uncert",
                    num_buckets: int = 32):
    """Bucketed hash join proc<->truth on the cell key; emits error rows
    (cells valid in BOTH rasters — the reference's common-mask rule)."""

    def tag(side):
        def fn(b: pa.Table) -> pa.Table:
            cols = [key, value_col] + ([uncert_col] if uncert_col and side == "p"
                                       and uncert_col in b.column_names else [])
            t = b.select([c for c in cols if c in b.column_names])
            t = t.append_column("_side", pa.array([side] * t.num_rows))
            bucket = np.asarray(t[key]).astype(np.int64) % num_buckets
            return t.append_column("_bucket", pa.array(bucket))
        return fn

    both = proc_ds.map_batches(tag("p"), batch_format="pyarrow").union(
        truth_ds.map_batches(tag("t"), batch_format="pyarrow"))

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        p = df[df._side == "p"].drop(columns=["_side", "_bucket"])
        t = df[df._side == "t"].drop(columns=["_side", "_bucket"])
        t = t.rename(columns={value_col: "_truth"})
        keep_t = [key, "_truth"]
        merged = p.merge(t[keep_t], on=key, how="inner")
        merged["error"] = merged[value_col] - merged["_truth"]
        if uncert_col and uncert_col in merged.columns:
            with np.errstate(divide="ignore", invalid="ignore"):
                merged["norm_error"] = merged["error"] / merged[uncert_col]
        out_cols = [key, "error"] + (["norm_error"] if uncert_col and
                                     uncert_col in merged.columns else [])
        return merged[out_cols].dropna(subset=["error"])

    from ..util import pin_for_shuffle

    return pin_for_shuffle(both).groupby("_bucket").map_groups(
        join_bucket, batch_format="pandas")


def raster_metrics(proc_ds, truth_ds, *, key: str = "grid_cell",
                   value_col: str = "wmean_value",
                   uncert_col: str | None = "wmean_uncert") -> dict:
    """End-to-end: join + metrics + pass/fail verdict.

    The error table is one row per commonly-valid CELL (bounded by raster
    size, not input points), so the final quantile computation collects it
    — the same driver-side step the reference performs on dense layers.
    """
    errors = join_proc_truth(proc_ds, truth_ds, key=key, value_col=value_col,
                             uncert_col=uncert_col).to_pandas()
    metrics = compute_metrics_from_error(errors["error"].to_numpy())
    norm = (compute_metrics_from_error(errors["norm_error"].to_numpy())
            if "norm_error" in errors.columns else None)
    return {"metrics": metrics, "norm_metrics": norm,
            "passfail": get_passfail(metrics, norm)}
