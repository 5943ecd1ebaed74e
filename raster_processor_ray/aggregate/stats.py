"""Grouped statistical moments: stddev / correlation / regression slope
in ONE pass with EXACT integer partials.

The scale shape is the same as every aggregate in this engine (partials
-> one bounded exchange -> finalize), but the numeric contract is
stronger than a naive float implementation: callers pre-quantize float
inputs to integers (the cents trick), so the six sufficient statistics
(n, Σx, Σy, Σx², Σy², Σxy) are int64-exact and therefore IDENTICAL under
any batch order, block split, or cluster size. Only the finalize step
(variance / correlation / slope formulas) touches floats, and it runs
once per group — bit-reproducible.

Reference analog: the height-std / uncertainty aggregates
(SWOTAlgorithms/Raster-Processor raster.py aggregate_height_std /
aggregate_wse_qual) generalized to the textbook two-variable moment set.

Overflow bound: Σxy ≤ n·max|x|·max|y| must stay below 2^63 ≈ 9.2e18 —
e.g. 1e9 rows of |x| ≤ 1e4, |y| ≤ 1e5 is 1e18, fine. Callers with wider
domains should rescale the quantization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def grouped_stats(ds, keys, x: str, y: str, *, num_buckets: int = 32,
                  round_to: int | None = 6):
    """Per-group (n, mean_x, std_x, corr_xy, slope_yx) over INTEGER
    columns ``x`` and ``y``.

    - ``std_x``: sample standard deviation (n-1 denominator; NaN at n=1)
    - ``corr_xy``: Pearson correlation (NaN when either variance is 0)
    - ``slope_yx``: least-squares slope of y on x (SQL regr_slope(y, x))

    Finalize uses the sums formulation — ``(n·Σxy − Σx·Σy) / …`` — with
    each int64 sum cast to float64 first; an oracle can reproduce the
    exact doubles with HUGEINT sums + the same formula (see
    SQL_PRICE_STATS in pipelines/queries.py).
    """
    from .relational import hash_aggregate

    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        xv = df[x].to_numpy(dtype=np.int64, copy=False)
        yv = df[y].to_numpy(dtype=np.int64, copy=False)
        out = pd.DataFrame({k: df[k] for k in keys})
        out["_sx"] = xv
        out["_sy"] = yv
        out["_sxx"] = xv * xv
        out["_syy"] = yv * yv
        out["_sxy"] = xv * yv
        g = out.groupby(keys, as_index=False, dropna=False, observed=True)
        agg = g.agg(n=("_sx", "size"), sx=("_sx", "sum"), sy=("_sy", "sum"),
                    sxx=("_sxx", "sum"), syy=("_syy", "sum"),
                    sxy=("_sxy", "sum"))
        return agg

    agg = hash_aggregate(
        ds.map_batches(partial, batch_format="pandas"), keys, {
            "n": ("n", "sum"), "sx": ("sx", "sum"), "sy": ("sy", "sum"),
            "sxx": ("sxx", "sum"), "syy": ("syy", "sum"),
            "sxy": ("sxy", "sum"),
        }, num_buckets=num_buckets)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        n = df.n.to_numpy(dtype=np.float64)
        sx = df.sx.to_numpy(dtype=np.float64)
        sy = df.sy.to_numpy(dtype=np.float64)
        sxx = df.sxx.to_numpy(dtype=np.float64)
        syy = df.syy.to_numpy(dtype=np.float64)
        sxy = df.sxy.to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean_x = sx / n
            varnum_x = n * sxx - sx * sx        # n² · population variance
            varnum_y = n * syy - sy * sy
            covnum = n * sxy - sx * sy
            std_x = np.sqrt(varnum_x / (n * (n - 1.0)))
            corr = covnum / np.sqrt(varnum_x * varnum_y)
            slope = covnum / varnum_x
        res = df[keys].copy()
        res["n"] = df.n.to_numpy(dtype=np.int64)
        res["mean_x"] = mean_x
        res["std_x"] = std_x
        res["corr_xy"] = corr
        res["slope_yx"] = slope
        if round_to is not None:
            for c in ("mean_x", "std_x", "corr_xy", "slope_yx"):
                res[c] = res[c].round(round_to)
        return res

    return agg.map_batches(finalize, batch_format="pandas")


def grouped_entropy(ds, keys, cat_col: str, *, num_buckets: int = 32,
                    round_to: int | None = 6):
    """Per-group Shannon entropy (nats) of a categorical column's
    distribution: ``H = ln(n) − Σ c·ln(c) / n`` over the exact integer
    category counts ``c``, with ``n_rows`` and ``n_cats`` alongside.

    Scale shape: ONE pass over the data (a (keys, cat) count — map-side
    partials, bounded exchange), then a (keys)-bucketed reduction over
    the count table, whose size is the number of DISTINCT (group,
    category) pairs — tiny at any corpus scale. The per-group float sum
    runs after an in-group sort by category, so each engine's result is
    deterministic under any partitioning/thread order; cross-engine
    float agreement uses the round-6 quantization treatment (SURVEY
    determinism audit: the tile_error_report / pagerank pattern).

    Training-data use: language/label balance per source or domain —
    the mixture-diversity diagnostic next to `mixture_sample`.
    """
    from ..util import pin_for_shuffle
    from .relational import _key_bucket, hash_aggregate

    keys = [keys] if isinstance(keys, str) else list(keys)

    counts = hash_aggregate(ds, keys + [cat_col], {"c": (None, "count")},
                            num_buckets=num_buckets)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_bucket"] = _key_bucket(df, keys, num_buckets)
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.drop(columns=["_bucket"])
              .sort_values(keys + [cat_col], kind="mergesort")
              .reset_index(drop=True))
        c = df["c"].to_numpy(dtype=np.float64)
        df["_clnc"] = c * np.log(c)
        g = df.groupby(keys, as_index=False, dropna=False, observed=True)
        agg = g.agg(n_rows=("c", "sum"), n_cats=("c", "size"),
                    s=("_clnc", "sum"))
        n = agg["n_rows"].to_numpy(dtype=np.float64)
        ent = np.log(n) - agg["s"].to_numpy(dtype=np.float64) / n
        if round_to is not None:
            ent = np.round(ent, round_to)
        out = agg[keys].copy()
        out["n_rows"] = agg["n_rows"].to_numpy(dtype=np.int64)
        out["n_cats"] = agg["n_cats"].to_numpy(dtype=np.int64)
        # + 0.0 folds the single-category case's −0.0 (from the tiny
        # negative residue of ln(n) − n·ln(n)/n) to +0.0 so value
        # hashes agree with the oracle's same-treated output
        out["entropy"] = ent + 0.0
        return out

    return (pin_for_shuffle(counts.map_batches(add_bucket,
                                               batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def grouped_kl_divergence(ds, keys, cat_col: str, *, num_buckets: int = 32,
                          round_to: int | None = 6):
    """Per-group KL divergence (nats) of the group's categorical
    distribution from the GLOBAL distribution:
    ``D(g) = Σ_c p_g(c) · (ln p_g(c) − ln p(c))`` over the group's
    categories (absent categories contribute 0). The corpus-drift
    diagnostic: which sources/shards deviate most from the corpus mix.

    Scale shape: ONE counting pass over the data ((keys, cat) partials,
    bounded exchange); the category marginal is a second aggregate over
    the count table, materialized driver-side because it is bounded by
    the number of DISTINCT categories (languages / labels / quality
    tiers — small by construction), then broadcast back via
    ``broadcast_lookup`` (ray.put once, fetched once per worker) — no
    second data pass, no shuffle join. For category spaces too large to
    hold driver-side (URL domains), swap the broadcast for
    ``hash_join`` on the count table; the data-pass cost is identical.

    Determinism: per-group terms are summed after an in-group sort by
    category; cross-engine agreement uses round-6 quantization with the
    −0.0 fold (an identical-to-global group rounds to exactly +0.0).
    """
    from ..util import pin_for_shuffle
    from .relational import _key_bucket, broadcast_lookup, hash_aggregate

    keys = [keys] if isinstance(keys, str) else list(keys)

    counts = pin_for_shuffle(
        hash_aggregate(ds, keys + [cat_col], {"c": (None, "count")},
                       num_buckets=num_buckets))

    marg = hash_aggregate(counts, cat_col, {"cg": ("c", "sum")},
                          num_buckets=2).to_pandas()
    if len(marg) == 0:  # empty input: no crash, 0 rows (repo convention)
        import ray.data as _rd
        return _rd.from_pandas(pd.DataFrame({
            **{k: pd.Series([], dtype=object) for k in keys},
            "n_rows": pd.Series([], dtype=np.int64),
            "kl_global": pd.Series([], dtype=np.float64)}))
    total = float(marg["cg"].sum())
    marg["_lnp"] = np.log(marg["cg"].to_numpy(dtype=np.float64) / total)

    with_p = broadcast_lookup(counts, marg, cat_col, ["_lnp"])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_bucket"] = _key_bucket(df, keys, num_buckets)
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.drop(columns=["_bucket"])
              .sort_values(keys + [cat_col], kind="mergesort")
              .reset_index(drop=True))
        ns = df.groupby(keys, dropna=False, observed=True)["c"].transform("sum")
        pg = df["c"].to_numpy(dtype=np.float64) / ns.to_numpy(dtype=np.float64)
        df["_term"] = pg * (np.log(pg) - df["_lnp"].to_numpy(dtype=np.float64))
        g = df.groupby(keys, as_index=False, dropna=False, observed=True)
        agg = g.agg(n_rows=("c", "sum"), kl=("_term", "sum"))
        kl = agg["kl"].to_numpy(dtype=np.float64)
        if round_to is not None:
            kl = np.round(kl, round_to)
        out = agg[keys].copy()
        out["n_rows"] = agg["n_rows"].to_numpy(dtype=np.int64)
        out["kl_global"] = kl + 0.0
        return out

    return (pin_for_shuffle(with_p.map_batches(add_bucket,
                                               batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def dispersion_index(ds, keys, bin_col: str, *, num_buckets: int = 32,
                     round_to: int | None = 6):
    """Per-group index of dispersion (variance-to-mean ratio) of the
    group's per-bin event counts: ``D = s²/mean`` over the counts c_i of
    the group's OCCUPIED bins — 1 ≈ Poisson, >1 bursty, <1 regular. The
    burstiness diagnostic for event streams (callers bin timestamps to
    hours/days first).

    Sums formulation over exact int64 counts —
    ``D = n·(n·Σc² − (Σc)²) / ((n−1)·n·Σc)`` with n = #bins — so both
    numerator and denominator are exact integers and the single final
    division is bit-identical across engines (the grouped_gini
    treatment; no float-sum-order caveat). Groups with a single bin
    are dropped (the oracle's NULL-variance groups).

    Scale shape: one counting pass ((keys, bin) partials, bounded
    exchange), then a second bounded aggregate over the count table.
    """
    from .relational import hash_aggregate

    keys = [keys] if isinstance(keys, str) else list(keys)

    counts = hash_aggregate(ds, keys + [bin_col], {"c": (None, "count")},
                            num_buckets=num_buckets)

    def square(b: pa.Table) -> pa.Table:
        c = np.asarray(b["c"], dtype=np.int64)
        out = b.select(keys + ["c"])
        return out.append_column("c2", pa.array(c * c))

    agg = hash_aggregate(
        counts.map_batches(square, batch_format="pyarrow"), keys, {
            "n_bins": (None, "count"), "sc": ("c", "sum"),
            "scc": ("c2", "sum")}, num_buckets=num_buckets)

    def finalize(b: pa.Table) -> pa.Table:
        n = np.asarray(b["n_bins"], dtype=np.int64)
        sc = np.asarray(b["sc"], dtype=np.int64)
        scc = np.asarray(b["scc"], dtype=np.int64)
        keep = n >= 2
        t = b.filter(pa.array(keep))
        n, sc, scc = n[keep], sc[keep], scc[keep]
        num = (n * (n * scc - sc * sc)).astype(np.float64)
        den = ((n - 1) * n * sc).astype(np.float64)
        d = num / den
        if round_to is not None:
            d = np.round(d, round_to)
        out = t.select(keys)
        out = out.append_column("n_bins", pa.array(np.asarray(
            t["n_bins"], dtype=np.int64)))
        out = out.append_column("n_events", pa.array(sc))
        return out.append_column("dispersion", pa.array(d))

    return agg.map_batches(finalize, batch_format="pyarrow")


def lag_autocorr(ds, key: str, order_cols, val_col: str, *,
                 num_buckets: int = 64, round_to: int | None = 6):
    """Per-key lag-1 Pearson autocorrelation of an INTEGER value series
    ordered by ``order_cols``: corr(x_t, x_{t+1}) over each key's
    consecutive pairs. The temporal-persistence diagnostic (does a
    user's metric trend or jump around?).

    Same partitioning contract as sessionize: keys hash into buckets
    and each key's full series lands in one ``map_groups`` call, where
    the adjacent-pair extraction is one vectorized shift. All six
    sufficient statistics (k, Σa, Σb, Σa², Σb², Σab) are int64-exact,
    so the output filter (k ≥ 2, both variance numerators > 0 — an
    EXACT integer comparison) and the final corr double are identical
    under any block order or cluster size; round-6 on the corr.

    Keys whose pair count is < 2 or whose either side is constant are
    dropped (the oracle's NULL-producing groups).
    """
    from ..util import pin_for_shuffle
    from .relational import _key_bucket

    order_cols = ([order_cols] if isinstance(order_cols, str)
                  else list(order_cols))
    sort_cols = [key] + order_cols

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_bucket"] = _key_bucket(df, [key], num_buckets)
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.drop(columns=["_bucket"])
              .sort_values(sort_cols, kind="mergesort")
              .reset_index(drop=True))
        out_cols = {key: pd.Series([], dtype=df[key].dtype),
                    "k": pd.Series([], dtype=np.int64),
                    "lag1_corr": pd.Series([], dtype=np.float64)}
        n = len(df)
        if n < 2:
            return pd.DataFrame(out_cols)
        kv = df[key].to_numpy()
        x = df[val_col].to_numpy(dtype=np.int64)
        same = kv[1:] == kv[:-1]                 # adjacent rows, same key
        a, b = x[:-1][same], x[1:][same]
        pair_key = kv[:-1][same]
        if len(a) == 0:
            return pd.DataFrame(out_cols)
        p = pd.DataFrame({key: pair_key, "_a": a, "_b": b,
                          "_aa": a * a, "_bb": b * b, "_ab": a * b})
        g = p.groupby(key, as_index=False, observed=True).agg(
            k=("_a", "size"), sa=("_a", "sum"), sb=("_b", "sum"),
            saa=("_aa", "sum"), sbb=("_bb", "sum"), sab=("_ab", "sum"))
        k = g["k"].to_numpy(dtype=np.int64)
        sa, sb = g["sa"].to_numpy(np.int64), g["sb"].to_numpy(np.int64)
        saa, sbb = g["saa"].to_numpy(np.int64), g["sbb"].to_numpy(np.int64)
        sab = g["sab"].to_numpy(np.int64)
        va = k * saa - sa * sa                   # exact integer variance
        vb = k * sbb - sb * sb                   # numerators
        keep = (k >= 2) & (va > 0) & (vb > 0)
        g = g[keep]
        kf = k[keep].astype(np.float64)
        corr = ((kf * sab[keep].astype(np.float64)
                 - sa[keep].astype(np.float64) * sb[keep].astype(np.float64))
                / np.sqrt((kf * saa[keep].astype(np.float64)
                           - sa[keep].astype(np.float64) ** 2)
                          * (kf * sbb[keep].astype(np.float64)
                             - sb[keep].astype(np.float64) ** 2)))
        if round_to is not None:
            corr = np.round(corr, round_to)
        return pd.DataFrame({key: g[key].to_numpy(),
                             "k": g["k"].to_numpy(dtype=np.int64),
                             "lag1_corr": corr})

    return (pin_for_shuffle(ds.map_batches(add_bucket,
                                           batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def mutual_information(ds, a_col: str, b_col: str, *,
                       num_buckets: int = 32, round_to: int | None = 6):
    """Mutual information (nats) between two categorical columns:
    ``I = Σ_{a,b} p(a,b) · (ln p(a,b) − ln p(a) − ln p(b))`` — one
    scalar row (plus the joint/marginal support sizes). The
    association-strength summary for corpus curation: how much does
    source tell you about language (0 = independent).

    Scale shape: ONE counting pass over the data ((a, b) partials,
    bounded exchange); both marginals and the final sum reduce the
    joint count table, whose size is the number of distinct (a, b)
    pairs — driver-side safe by construction for label-like columns.
    Determinism: terms are summed once, driver-side, in sorted (a, b)
    order; cross-engine agreement via round-6 quantization and the
    +0.0 fold (independent columns round to exactly +0.0).
    """
    from .relational import hash_aggregate

    import ray.data as _rd

    joint = hash_aggregate(ds, [a_col, b_col], {"c": (None, "count")},
                           num_buckets=num_buckets).to_pandas()
    if len(joint) == 0:  # empty input: no crash, 0 rows (repo convention)
        return _rd.from_pandas(pd.DataFrame({
            c: pd.Series([], dtype=np.int64)
            for c in ("n_rows", "n_pairs", "n_a", "n_b")}
            | {"mi": pd.Series([], dtype=np.float64)}))
    joint = joint.sort_values([a_col, b_col],
                              kind="mergesort").reset_index(drop=True)
    n = float(joint["c"].sum())
    ca = joint.groupby(a_col)["c"].transform("sum").to_numpy(np.float64)
    cb = joint.groupby(b_col)["c"].transform("sum").to_numpy(np.float64)
    c = joint["c"].to_numpy(dtype=np.float64)
    terms = (c / n) * (np.log(c / n) - np.log(ca / n) - np.log(cb / n))
    mi = float(terms.sum())
    if round_to is not None:
        mi = float(np.round(mi, round_to))
    out = pd.DataFrame({
        "n_rows": np.array([int(joint["c"].sum())], dtype=np.int64),
        "n_pairs": np.array([len(joint)], dtype=np.int64),
        "n_a": np.array([joint[a_col].nunique()], dtype=np.int64),
        "n_b": np.array([joint[b_col].nunique()], dtype=np.int64),
        "mi": np.array([mi + 0.0], dtype=np.float64)})
    return _rd.from_pandas(out)


def grouped_gini(ds, keys, cat_col: str, *, num_buckets: int = 32,
                 round_to: int | None = 6):
    """Per-group Gini concentration of a categorical column's count
    distribution: 0 = perfectly even across the group's categories,
    ->1 = all mass on one category. Discrete form over the exact
    integer counts sorted ascending (1-based rank i, n categories,
    S = Σc): ``G = Σ (2i − n − 1)·c_i / (n·S)``.

    Numerator and denominator are EXACT int64 (ties between equal
    counts cannot change the numerator, so the rank tie-break is
    value-irrelevant); the single final division of identical integers
    makes the double bit-identical across engines — no float-sum-order
    caveat at all, unlike the entropy/KL round-6 treatment.

    Same scale shape as :func:`grouped_entropy`: one counting pass,
    then a bucketed reduction over the distinct (group, category)
    count table.
    """
    from ..util import pin_for_shuffle
    from .relational import _key_bucket, hash_aggregate

    keys = [keys] if isinstance(keys, str) else list(keys)

    counts = hash_aggregate(ds, keys + [cat_col], {"c": (None, "count")},
                            num_buckets=num_buckets)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_bucket"] = _key_bucket(df, keys, num_buckets)
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.drop(columns=["_bucket"])
              .sort_values(keys + ["c", cat_col], kind="mergesort")
              .reset_index(drop=True))
        g0 = df.groupby(keys, dropna=False, observed=True)
        i = g0.cumcount().to_numpy(dtype=np.int64) + 1       # 1-based rank
        n = g0["c"].transform("size").to_numpy(dtype=np.int64)
        c = df["c"].to_numpy(dtype=np.int64)
        df["_num"] = (2 * i - n - 1) * c
        g = df.groupby(keys, as_index=False, dropna=False, observed=True)
        agg = g.agg(n_rows=("c", "sum"), n_cats=("c", "size"),
                    num=("_num", "sum"))
        gini = (agg["num"].to_numpy(dtype=np.float64)
                / (agg["n_cats"].to_numpy(dtype=np.float64)
                   * agg["n_rows"].to_numpy(dtype=np.float64)))
        if round_to is not None:
            gini = np.round(gini, round_to)
        out = agg[keys].copy()
        out["n_rows"] = agg["n_rows"].to_numpy(dtype=np.int64)
        out["n_cats"] = agg["n_cats"].to_numpy(dtype=np.int64)
        out["gini"] = gini
        return out

    return (pin_for_shuffle(counts.map_batches(add_bucket,
                                               batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def transition_counts(ds, key: str, order_cols, state_col: str, *,
                      num_buckets: int = 64, round_to: int | None = 6):
    """First-order Markov transition statistics of a categorical state
    stream: for each key's series ordered by ``order_cols``, count every
    adjacent (prev_state, state) pair, then emit per-pair counts and the
    row-normalized transition probability ``prob = n / Σ n over prev``.
    The sequence-mining primitive behind session-flow analysis and
    next-event models.

    Scale shape: keys hash into buckets (the sessionize contract — each
    key's full series lands in ONE ``map_groups`` call), the pair
    extraction is one vectorized shift, and the emitted rows are ONE
    (prev, state, n) partial per pair PER BUCKET — so the second
    exchange moves at most ``num_buckets x |states|^2`` rows no matter
    how large the input is. The final probability normalization runs on
    the collected pair table (bounded by ``|states|^2``) in a single
    group. Counts are exact int64 -> identical under any block order;
    the probability is round-6 of a division of exact integers.

    Output columns: ``prev_<state_col>``, ``<state_col>``, ``n``,
    ``prob``.
    """
    from ..util import pin_for_shuffle
    from .relational import _key_bucket, hash_aggregate

    order_cols = ([order_cols] if isinstance(order_cols, str)
                  else list(order_cols))
    sort_cols = [key] + order_cols
    prev_col = f"prev_{state_col}"

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_bucket"] = _key_bucket(df, [key], num_buckets)
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.drop(columns=["_bucket"])
              .sort_values(sort_cols, kind="mergesort")
              .reset_index(drop=True))
        empty = pd.DataFrame({prev_col: pd.Series([], dtype=object),
                              state_col: pd.Series([], dtype=object),
                              "n": pd.Series([], dtype=np.int64)})
        if len(df) < 2:
            return empty
        kv = df[key].to_numpy()
        sv = df[state_col].to_numpy()
        same = kv[1:] == kv[:-1]                 # adjacent rows, same key
        if not same.any():
            return empty
        p = pd.DataFrame({prev_col: sv[:-1][same], state_col: sv[1:][same]})
        return (p.groupby([prev_col, state_col], as_index=False,
                          dropna=False, observed=True)
                .size().rename(columns={"size": "n"}))

    pair_partials = (pin_for_shuffle(ds.map_batches(add_bucket,
                                                    batch_format="pandas"))
                     .groupby("_bucket")
                     .map_groups(per_bucket, batch_format="pandas"))
    counts = hash_aggregate(pair_partials, [prev_col, state_col],
                            {"n": ("n", "sum")}, num_buckets=num_buckets)

    # the pair table is bounded by |states|^2 — one group normalizes it
    def add_one(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_one"] = 0
        return df

    def normalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_one"])
        tot = df.groupby(prev_col, dropna=False,
                         observed=True)["n"].transform("sum")
        prob = (df["n"].to_numpy(dtype=np.float64)
                / tot.to_numpy(dtype=np.float64))
        if round_to is not None:
            prob = np.round(prob, round_to)
        out = df[[prev_col, state_col]].copy()
        out["n"] = df["n"].to_numpy(dtype=np.int64)
        out["prob"] = prob
        return out

    return (counts.map_batches(add_one, batch_format="pandas")
            .groupby("_one")
            .map_groups(normalize, batch_format="pandas"))


def longest_streak(ds, key: str, day_col: str, *, num_buckets: int = 64):
    """Gaps-and-islands per key: the number of distinct active days and
    the longest run of CONSECUTIVE days (``day_col`` is an integer day
    index, e.g. days since epoch). The engagement-streak kernel — SQL's
    ``day - row_number()`` island trick, distributed.

    Scale shape: same bucketed contract as sessionize (each key's days
    land in one ``map_groups`` call); inside the bucket the island
    segmentation is fully vectorized (sorted unique (key, day) rows,
    run boundaries where the key changes or the day step != 1, run
    lengths from boundary-index diffs). All outputs are exact int64 —
    no float anywhere, identical under any block order.

    Output columns: ``<key>``, ``n_days``, ``max_streak``.
    """
    from ..util import pin_for_shuffle
    from .relational import _key_bucket

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_bucket"] = _key_bucket(df, [key], num_buckets)
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.drop(columns=["_bucket"])
              .drop_duplicates([key, day_col])
              .sort_values([key, day_col], kind="mergesort")
              .reset_index(drop=True))
        if len(df) == 0:
            return pd.DataFrame({key: pd.Series([], dtype=df[key].dtype),
                                 "n_days": pd.Series([], dtype=np.int64),
                                 "max_streak": pd.Series([], dtype=np.int64)})
        kv = df[key].to_numpy()
        dv = df[day_col].to_numpy(dtype=np.int64)
        # new island at row 0, at key change, or where the day step != 1
        brk = np.ones(len(df), dtype=bool)
        brk[1:] = (kv[1:] != kv[:-1]) | (dv[1:] - dv[:-1] != 1)
        starts = np.flatnonzero(brk)
        lengths = np.diff(np.append(starts, len(df)))
        run = pd.DataFrame({key: kv[starts], "_len": lengths})
        g = run.groupby(key, as_index=False, dropna=False, observed=True)
        agg = g.agg(n_days=("_len", "sum"), max_streak=("_len", "max"))
        agg["n_days"] = agg["n_days"].astype(np.int64)
        agg["max_streak"] = agg["max_streak"].astype(np.int64)
        return agg

    return (pin_for_shuffle(ds.map_batches(add_bucket,
                                           batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas"))
