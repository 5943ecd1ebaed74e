"""Generic scalable grouped aggregation: the canonical Ray Data shape.

``hash_aggregate(ds, keys, spec)`` implements groupby-aggregate as:

1. map-side partial aggregation per batch (vectorized pandas groupby ->
   one partial row per (key, batch): sums/counts/mins/maxs only);
2. ONE shuffle grouped by ``hash(keys) % num_buckets`` (bounded key
   cardinality per reducer; a hot key still costs one partial per batch);
3. vectorized combine + finalize per bucket (mean = sum/count etc.).

This replaces Ray's builtin ``groupby().aggregate(...)`` in every query
pipeline: the builtin pays per-group Python overhead (measured ~50x slower
at 15k groups) and shuffles raw rows instead of partials.

spec: ``{out_col: (in_col | None, fn)}`` with fn in
{'sum', 'count', 'mean', 'min', 'max'}; in_col None only for 'count'.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.hashing import fnv1a_64, splitmix64

_PARTIAL_FNS = {"sum": "sum", "count": "count", "mean": None, "min": "min", "max": "max"}


def _partial_spec(spec):
    """Expand user spec into partial columns (mean -> sum + count)."""
    partial = {}   # partial_col -> (in_col, partial_fn)
    final = {}     # out_col -> ('direct', partial_col) | ('div', num, den)
    for out, (col, fn) in spec.items():
        if fn not in _PARTIAL_FNS:
            raise ValueError(f"unsupported agg {fn!r}")
        if fn == "mean":
            s, c = f"__{out}_sum", f"__{out}_cnt"
            partial[s] = (col, "sum")
            partial[c] = (col, "count")
            final[out] = ("div", s, c)
        elif fn == "count":
            partial[f"__{out}"] = (col, "count")
            final[out] = ("direct", f"__{out}")
        else:
            partial[f"__{out}"] = (col, fn)
            final[out] = ("direct", f"__{out}")
    return partial, final


def _key_bucket(df: pd.DataFrame, keys: list[str], num_buckets: int) -> np.ndarray:
    """Bucket id from key columns, CANONICALIZED by value not repr:
    numeric keys (int/float/bool, any width) hash their float64 value, so
    int64 1 and float64 1.0 land in the same bucket on both join sides
    (a str()-repr hash would split them and silently drop matches).
    Non-numeric keys hash native string bytes — no pandas str() round-trip.
    int64 keys above 2^53 may share a bucket after the float cast; bucket
    collisions are harmless (equality is decided inside the bucket)."""
    h = np.zeros(len(df), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in keys:
            col = df[k]
            if pd.api.types.is_numeric_dtype(col) or pd.api.types.is_bool_dtype(col):
                v = col.to_numpy(dtype=np.float64, na_value=np.nan, copy=True)
                v += 0.0                       # -0.0 -> 0.0
                v[np.isnan(v)] = np.nan        # canonical NaN payload
                hk = splitmix64(v.view(np.uint64))
            elif (pd.api.types.is_datetime64_dtype(col)
                  or pd.api.types.is_timedelta64_dtype(col)):
                hk = splitmix64(col.to_numpy().view(np.int64).astype(np.uint64))
            else:
                try:
                    arr = pa.Array.from_pandas(col)
                    if not (pa.types.is_string(arr.type)
                            or pa.types.is_large_string(arr.type)
                            or pa.types.is_binary(arr.type)
                            or pa.types.is_large_binary(arr.type)):
                        arr = arr.cast(pa.string())
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                        pa.ArrowTypeError):
                    # last resort for exotic object columns (tuples, mixed)
                    arr = pa.array(col.astype(str).to_numpy(dtype=object),
                                   type=pa.string())
                hk = fnv1a_64(arr)
            h = splitmix64(h ^ hk)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _key_bucket_arrow(t: pa.Table, keys: list[str],
                      num_buckets: int) -> np.ndarray:
    """Arrow-native twin of :func:`_key_bucket` — same canonical hashing
    (numerics by float64 value, strings/binary by raw bytes) without a
    pandas round-trip, for bucket-add stages that keep batches in Arrow.
    Bucket routing only; equality is always decided inside the bucket."""
    import pyarrow.compute as pc
    import pyarrow.types as pat

    h = np.zeros(t.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in keys:
            col = t[k]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            ty = col.type
            if pat.is_integer(ty) or pat.is_floating(ty) or pat.is_boolean(ty):
                v = col.cast(pa.float64()).to_numpy(zero_copy_only=False)
                v = v + 0.0                    # -0.0 -> 0.0
                v[np.isnan(v)] = np.nan        # canonical NaN payload
                hk = splitmix64(v.view(np.uint64))
            elif pat.is_timestamp(ty) or pat.is_duration(ty):
                hk = splitmix64(np.asarray(
                    pc.fill_null(col.cast(pa.int64()), 0)).astype(np.uint64))
            else:
                if not (pat.is_string(ty) or pat.is_large_string(ty)
                        or pat.is_binary(ty) or pat.is_large_binary(ty)):
                    col = col.cast(pa.string())
                hk = fnv1a_64(col)
            h = splitmix64(h ^ hk)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def hash_aggregate(ds, keys: list[str] | str, spec: dict, *, num_buckets: int = 32):
    keys = [keys] if isinstance(keys, str) else list(keys)
    partial, final = _partial_spec(spec)

    def map_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, as_index=False, dropna=False, observed=True)
        parts = []
        for pcol, (col, fn) in partial.items():
            if fn == "count":
                agg = (g.size().rename(columns={"size": pcol}) if col is None
                       else g[col].count().rename(columns={col: pcol}))
            else:
                agg = g[col].agg(fn).rename(columns={col: pcol})
            parts.append(agg.set_index(keys))
        out = pd.concat(parts, axis=1).reset_index()
        out["_bucket"] = _key_bucket(out, keys, num_buckets)
        return out

    # combine partials: sum for sum/count partials, min/max for min/max
    combine_fns = {}
    for pcol, (_, fn) in partial.items():
        combine_fns[pcol] = "sum" if fn in ("sum", "count") else fn

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.drop(columns=["_bucket"])
               .groupby(keys, as_index=False, dropna=False, observed=True)
               .agg(combine_fns))
        for out_col, how in final.items():
            if how[0] == "direct":
                out[out_col] = out[how[1]]
            else:
                with np.errstate(invalid="ignore", divide="ignore"):
                    out[out_col] = out[how[1]] / out[how[2]].replace(0, np.nan)
        return out[keys + list(final.keys())]

    from ..util import pin_for_shuffle
    partials = pin_for_shuffle(ds.map_batches(map_partial, batch_format="pandas"))
    return (partials.groupby("_bucket")
            .map_groups(combine, batch_format="pandas"))


_BCAST_CACHE: dict = {}


def broadcast_lookup(ds, lookup: pd.DataFrame, on: str, cols: list[str]):
    """Broadcast hash join: attach ``cols`` from a small dimension table
    (the reference's T3/J3 raster-value lookup shape) — no shuffle."""
    import ray

    # keep-last on duplicate keys (dict-insertion semantics)
    ref = ray.put(lookup[[on] + cols].drop_duplicates(subset=[on], keep="last"))

    def lookup_batch(df: pd.DataFrame) -> pd.DataFrame:
        # Task-fusion form (see flagship._cached_enricher): an actor-pool
        # stage cannot fuse with adjacent operators, so every block would
        # round-trip the object store just to attach a few columns.
        # Stateless tasks with the broadcast frame cached in a process
        # global keep the fetch-once-per-worker property AND fuse with the
        # upstream read / downstream partial-agg into one operator.
        table = _BCAST_CACHE.get(ref)
        if table is None:
            if len(_BCAST_CACHE) >= 4:
                _BCAST_CACHE.clear()
            table = _BCAST_CACHE[ref] = ray.get(ref)
        # vectorized left merge against the broadcast frame (no per-row
        # dict hashing); preserve the input row order
        return df.merge(table, on=on, how="left", sort=False)

    return ds.map_batches(lookup_batch, batch_format="pandas")


def hash_join(left, right, on: str | list[str], how: str = "inner", *,
              num_buckets: int = 32, suffix: str = "_r",
              num_partitions: int | None = None,
              left_distinct: list[str] | None = None):
    """Partitioned hash join for two LARGE datasets (the portable Ray Data
    pattern: add ``bucket = hash(key) % B`` to both sides, group by
    bucket, pandas-merge within each bucket — one shuffle per side, no
    driver materialization). Broadcast-join the small side instead
    (``broadcast_lookup``) when one side fits in memory.

    Rows from ``left`` and ``right`` are tagged and unioned so ONE keyed
    exchange co-locates both sides of each bucket.
    """
    on = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "semi", "anti", "full"):
        raise ValueError(how)
    # pin BOTH sides before touching .schema(): on a lazy chain schema()
    # executes the upstream plan, and the shuffle pin below would then
    # execute it a second time (measured 2.6x on the minhash->verify->CC
    # chain, whose joins each consumed an expensive lazy input twice).
    # The union all-to-all materializes these bytes regardless.
    from ..util import pin_for_shuffle

    left = pin_for_shuffle(left)
    right = pin_for_shuffle(right)
    lschema = left.schema()
    rschema = right.schema()
    # a fully EMPTY materialized dataset reports schema None; handle the
    # join forms whose result doesn't need the missing columns
    if lschema is None:
        if how == "full":
            raise ValueError(
                "hash_join: left side is empty with unknown schema; a "
                "full join needs the left-side columns — pass a typed "
                "empty dataset or guard the call")
        return left          # empty: inner/left/semi/anti of nothing is nothing
    if rschema is None:
        if how == "anti":
            return left      # nothing to subtract
        if how == "semi":
            return left.limit(0)
        raise ValueError(
            "hash_join: right side is empty with unknown schema; "
            "inner/left need the right-side columns — pass a typed "
            "empty dataset or guard the call")
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    # disambiguate right columns that CONFLICT with left ones (pandas
    # suffix semantics: non-conflicting names pass through unchanged)
    rmap = {c: (c + suffix if (c not in on and c in lcols) else c)
            for c in rcols}
    rcols_out = [rmap[c] for c in rcols]
    all_cols = lcols + [c for c in rcols_out if c not in lcols]
    # arrow type per output column (for typed-null padding + dtype restore);
    # ray schemas of non-arrow-origin datasets can report plain Python
    # types — fall back to null-type padding (unioned as untyped nulls)
    def _pa_type(t):
        return t if isinstance(t, pa.DataType) else pa.null()

    col_type = {c: _pa_type(t) for c, t in zip(lcols, lschema.types)}
    for c, t in zip(rcols, rschema.types):
        col_type.setdefault(rmap[c], _pa_type(t))

    def tag(side_flag: int, rename: dict | None):
        def fn(b: pa.Table) -> pa.Table:
            if rename:
                b = b.rename_columns([rename.get(c, c) for c in b.column_names])
            n = b.num_rows
            # TYPED null padding: absent columns union as all-null arrays
            # of the other side's arrow type — validity bitmaps only, not
            # a schema-width duplication of real values, and no object-
            # dtype round trip in the reducers
            arrays = [b[c] if c in b.column_names else pa.nulls(n, type=col_type[c])
                      for c in all_cols]
            t = pa.table(dict(zip(all_cols, arrays)))
            key_df = b.select(on).to_pandas()
            t = t.append_column("_side", pa.array(
                np.full(n, side_flag, dtype=np.int8)))
            return t.append_column("_bucket", pa.array(
                _key_bucket(key_df, on, num_buckets)))
        return fn

    both = left.map_batches(tag(0, None), batch_format="pyarrow").union(
        right.map_batches(tag(1, rmap), batch_format="pyarrow"))
    # Ray's sort-based groupby schedules O(blocks x partitions) tiny
    # tasks; for small inputs arriving in many blocks the fixed task
    # overhead dominates — let callers coalesce first
    if num_partitions is not None:
        both = both.repartition(num_partitions)
    from ..util import pin_for_shuffle
    both = pin_for_shuffle(both)

    def restore_dtypes(sub: pd.DataFrame) -> pd.DataFrame:
        # padded-null rows were dropped with the other side; bring integer
        # columns back from the float64 that pandas uses for nullable ints
        for c in sub.columns:
            t = col_type.get(c)
            if (t is not None and pa.types.is_integer(t)
                    and not pd.api.types.is_integer_dtype(sub[c])
                    and sub[c].notna().all()):
                sub[c] = sub[c].astype(t.to_pandas_dtype())
        return sub

    def fix_null_types(out: pd.DataFrame) -> pa.Table:
        # a bucket with no rows (or an all-null column) would infer
        # arrow `null` type from the pandas object column, making block
        # schemas diverge across buckets — cast those back to the known
        # column type (an all-null cast is validity-bitmap-only)
        t = pa.Table.from_pandas(out, preserve_index=False)
        fields, changed = [], False
        for f in t.schema:
            exp = col_type.get(f.name)
            if (exp is not None and pa.types.is_null(f.type)
                    and not pa.types.is_null(exp)):
                fields.append(pa.field(f.name, exp))
                changed = True
            else:
                fields.append(f)
        return t.cast(pa.schema(fields)) if changed else t

    def join_bucket(df: pd.DataFrame) -> pa.Table:
        l = restore_dtypes(df[df._side == 0][lcols])
        r = restore_dtypes(df[df._side == 1][rcols_out])
        if left_distinct is not None:
            # free distinct: duplicate left rows share the join key, so
            # they are co-located in this bucket (saves a dedicated
            # dedup shuffle upstream)
            l = l.drop_duplicates(subset=left_distinct)
        if how == "semi":
            out = l[l.set_index(on).index.isin(r.set_index(on).index)]
        elif how == "anti":
            out = l[~l.set_index(on).index.isin(r.set_index(on).index)]
        else:
            out = l.merge(r, on=on, how="outer" if how == "full" else how)
        return fix_null_types(out)

    return both.groupby("_bucket").map_groups(join_bucket, batch_format="pandas")


def subsample_every_k(ds, k: int, index_col: str):
    """Deterministic 1-in-k subsample by an index column (the reference's
    GDEM decimation, make_raster_region_maps.py:129-133) — a filter, not a
    random sample: reproducible across runs/cluster sizes."""
    import pyarrow as _pa

    def f(b: _pa.Table) -> _pa.Table:
        idx = np.asarray(b[index_col]).astype(np.int64)
        return b.filter(_pa.array(idx % k == 0))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_subsample(ds, index_col: str, group_col: str,
                         rates: dict, default_k: int):
    """Deterministic PER-STRATUM 1-in-k decimation: each group keeps
    rows where ``index % k_group == 0`` (``rates`` maps group value ->
    k; others use ``default_k``). Pure map filter — no shuffle, no RNG,
    reproducible at any cluster size/partitioning. The training-data
    shape: downsample over-represented strata (e.g. per-language) while
    keeping rare ones dense."""
    import pyarrow as _pa

    items = sorted(rates.items())

    def f(b: _pa.Table) -> _pa.Table:
        idx = np.asarray(b[index_col]).astype(np.int64)
        grp = b[group_col].to_pandas().to_numpy(dtype=object)
        k = np.full(len(idx), default_k, dtype=np.int64)
        for gval, gk in items:
            k[grp == gval] = gk
        return b.filter(_pa.array(idx % k == 0))

    return ds.map_batches(f, batch_format="pyarrow")


def grouped_topk(ds, keys, by: str, k: int, *, descending: bool = True,
                 tie_col: str | None = None, num_buckets: int = 32):
    """Top-k rows PER KEY without a global sort: per-batch per-key
    partial top-k (bounds every map output at k rows per key per batch),
    then one bucketed exchange and the same pick per key over the
    partials. Ships O(keys * k * blocks) rows, never the input."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    asc_main = not descending
    sort_cols = keys + [by] + ([tie_col] if tie_col else [])
    asc = [True] * len(keys) + [asc_main] + ([True] if tie_col else [])

    def local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, ascending=asc, kind="mergesort")
        return df.groupby(keys, sort=False, dropna=False).head(k)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_bucket"] = _key_bucket(df, keys, num_buckets)
        return df

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return local(df.drop(columns="_bucket"))

    from ..util import pin_for_shuffle

    partials = ds.map_batches(local, batch_format="pandas")
    tagged = pin_for_shuffle(partials.map_batches(add_bucket,
                                                  batch_format="pandas"))
    return tagged.groupby("_bucket").map_groups(merge,
                                                batch_format="pandas")


def count_distinct(ds, keys, col: str, *, out: str = "n_distinct",
                   num_buckets: int = 32):
    """Exact COUNT(DISTINCT col) per key: map-side dedup of (key, col)
    pairs (each batch ships its distinct pairs only), one bucketed
    exchange co-locating each key's pairs, then a vectorized per-key
    distinct count. Two bounded passes, no global sort; shuffle rows are
    bounded by distinct pairs, not input rows."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def local_dedup(df: pd.DataFrame) -> pd.DataFrame:
        df = df[keys + [col]].drop_duplicates()
        df = df.copy(deep=False)
        df["_bucket"] = _key_bucket(df, keys, num_buckets)
        return df

    def count_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.drop(columns=["_bucket"]).drop_duplicates()
             .groupby(keys, as_index=False, dropna=False, observed=True)
             .agg(**{out: (col, "size")}))
        return g

    from ..util import pin_for_shuffle

    tagged = pin_for_shuffle(ds.map_batches(local_dedup,
                                            batch_format="pandas"))
    return tagged.groupby("_bucket").map_groups(count_bucket,
                                                batch_format="pandas")


def pivot_counts(ds, key, pivot_col: str, values: list, *,
                 prefix: str = "n_", total_col: str | None = "n_total",
                 num_buckets: int = 32):
    """Crosstab / PIVOT: one row per key, one count column per pivot
    value (SQL ``count(*) FILTER (WHERE pivot = v)``), plus an optional
    total. The value list is caller-supplied (a pivot's output schema
    must be bounded and known — at scale, derive it from a distinct scan
    first). Map side appends 0/1 indicator columns (one vectorized
    ``pc.equal`` per value), then ONE hash aggregate sums them: a single
    bounded shuffle regardless of how many pivot columns."""
    def add_indicators(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        col = b[pivot_col]
        for v in values:
            b = b.append_column(f"__ind_{v}",
                                pc.equal(col, v).cast(pa.int64()))
        return b

    spec = {f"{prefix}{v}": (f"__ind_{v}", "sum") for v in values}
    if total_col:
        spec[total_col] = (None, "count")
    return hash_aggregate(ds.map_batches(add_indicators,
                                         batch_format="pyarrow"),
                          key, spec, num_buckets=num_buckets)


def topk(ds, by: str, k: int, *, descending: bool = True, tie_col: str | None = None):
    """Global top-k without a global sort: per-batch partial top-k, then a
    single tiny combine (same shape as partial aggregation)."""
    asc_main = not descending

    def local(df: pd.DataFrame) -> pd.DataFrame:
        cols = [by] + ([tie_col] if tie_col else [])
        asc = [asc_main] + ([True] if tie_col else [])
        return df.sort_values(cols, ascending=asc, kind="mergesort").head(k)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return local(df.drop(columns="_one"))

    from ..util import pin_for_shuffle

    partials = ds.map_batches(local, batch_format="pandas")
    return (pin_for_shuffle(partials.map_batches(
                lambda df: df.assign(_one=0), batch_format="pandas"))
            .groupby("_one").map_groups(merge, batch_format="pandas"))


def string_agg(ds, key, val_col: str, *, sep: str = ",",
               order_by: str | None = None, out: str = "agg",
               num_buckets: int = 32):
    """Grouped string concatenation with a deterministic ORDER BY —
    ``string_agg(val, sep ORDER BY order_by)``.

    Vectorized per bucket: one sort by (key, order_by), run offsets over
    the sorted keys, a zero-copy ListArray view of the sorted values,
    and ONE ``pc.binary_join`` arrow kernel per bucket — no per-group
    Python join. Giant hot keys concentrate their rows in one bucket
    (same caveat as every keyed concat; pre-truncate values upstream if
    a single group's concatenation must stay bounded).
    """
    import pyarrow.compute as pc

    from ..util import pin_for_shuffle

    keys = [key] if isinstance(key, str) else list(key)
    sort_cols = keys + ([order_by] if order_by else [])

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_bucket"] = _key_bucket(df, keys, num_buckets)
        return df

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        k = df[keys[0]].to_numpy() if len(keys) == 1 else \
            pd.MultiIndex.from_frame(df[keys]).to_numpy()
        n = len(df)
        if n == 0:
            return pa.table({**{c: pa.array([]) for c in keys},
                             out: pa.array([], type=pa.string())})
        same = np.zeros(n, dtype=bool)
        same[1:] = k[1:] == k[:-1]
        starts = np.flatnonzero(~same)
        # SQL string_agg SKIPS NULL values (an astype(str) would
        # concatenate the literal 'None'): drop null rows from the value
        # stream but keep their GROUPS — a group whose values are all
        # null yields NULL, exactly like the SQL aggregate
        nn = df[val_col].notna().to_numpy()
        counts = np.add.reduceat(nn.astype(np.int64), starts)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        vals = pa.array(df.loc[nn, val_col].astype(str),
                        type=pa.string())      # empty -> string, not null
        lst = pa.ListArray.from_arrays(pa.array(offsets), vals)
        cols = {c: pa.array(df[c].to_numpy()[starts]) for c in keys}
        cols[out] = pc.if_else(pa.array(counts > 0),
                               pc.binary_join(lst, sep),
                               pa.scalar(None, pa.string()))
        return pa.table(cols)

    return (pin_for_shuffle(ds.map_batches(add_bucket, batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(lambda d: per_bucket(d.drop(columns=["_bucket"])),
                        batch_format="pandas"))


def unpivot(ds, id_cols, value_cols: list[str], *, name_col: str = "metric",
            value_col: str = "value", value_type=None):
    """SQL UNPIVOT (wide -> long): one output row per (input row, value
    column), with the column's name in ``name_col`` and its value cast to
    a common type in ``value_col``.

    Stateless map-side reshape — NO shuffle, no state: each batch emits
    ``len(value_cols)`` column slices concatenated (zero-copy for the id
    columns, one vectorized ``fill_null`` per constant name column), so
    it streams at read speed and composes with a downstream
    ``hash_aggregate`` for melt-then-aggregate pipelines.

    Reference analog: the wide->long metric reshaping the reference does
    row-wise when assembling its per-tile stats reports
    (plot_raster_stats.py metric tables); here it is a first-class
    streaming operator.
    """
    import pyarrow.compute as pc

    id_cols = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    vt = value_type

    def f(b: pa.Table) -> pa.Table:
        n = b.num_rows
        out_vt = vt or b.schema.field(value_cols[0]).type
        pieces = []
        for vc in value_cols:
            cols = {c: b[c] for c in id_cols}
            cols[name_col] = pc.fill_null(pa.nulls(n, pa.string()), vc)
            cols[value_col] = pc.cast(b[vc], out_vt)
            pieces.append(pa.table(cols))
        return pa.concat_tables(pieces)

    return ds.map_batches(f, batch_format="pyarrow")


def grouped_skyline_2d(ds, keys, x_col: str, y_col: str, *,
                       num_buckets: int = 16):
    """Per-group 2-D Pareto frontier (skyline): the rows not STRICTLY
    dominated within their group, minimizing ``x_col`` and maximizing
    ``y_col`` (q dominates p iff q.x <= p.x, q.y >= p.y, and at least
    one is strict). Callers negate a column to flip its direction. The
    multi-objective shortlist operator (cheapest-vs-best tradeoffs).

    Scale shape — textbook two-phase skyline: every batch reduces to
    its LOCAL skyline first (a local skyline is a superset filter: any
    point dominated within a batch is dominated globally), then one
    bucketed exchange co-locates each group's candidates and the same
    sweep finishes. The sweep is fully vectorized (sort by group/x/y,
    per-(group, x) max-y, ascending-x running-max comparison) — no
    pairwise O(n^2) anywhere. Candidate volume after phase 1 is the
    sum of per-batch frontier sizes (small for correlated dimensions;
    worst case anti-correlated data degrades to the input size, as for
    every skyline algorithm).

    Output: ``keys + [x_col, y_col]``, distinct frontier points.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)

    def sweep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[keys + [x_col, y_col]].sort_values(
            keys + [x_col, y_col], kind="mergesort")
        # per (group, x) only the max-y point can survive
        df = df[~df.duplicated(keys + [x_col], keep="last")]
        gy = df.groupby(keys, dropna=False, observed=True)[y_col]
        cm = gy.cummax()
        prevmax = cm.groupby([df[k] for k in keys]).shift(1)
        keep = prevmax.isna() | (df[y_col] > prevmax)
        return df[keep.to_numpy()].reset_index(drop=True)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        out = sweep(df)
        out = out.copy(deep=False)
        out["_bucket"] = _key_bucket(out, keys, num_buckets)
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return sweep(df.drop(columns=["_bucket"]))

    from ..util import pin_for_shuffle

    return (pin_for_shuffle(ds.map_batches(local, batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(final, batch_format="pandas"))
