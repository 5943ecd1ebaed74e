"""Broadcast as-of join (SURVEY.md J2).

The reference maps each pixel's ``illumination_time``/line index to the
nearest sensor-trajectory (TVP) record (``get_sensor_index``,
raster_proc.py:364; gather loop geoloc_raster.py:139-158). The TVP is tiny
(one row per radar line), so the scalable form is: broadcast the sorted
small side once (``ray.put``), then ``np.searchsorted`` per batch inside
``map_batches`` — no shuffle.

Directions: 'backward' (last right row with ts <= left ts — pandas
merge_asof semantics), 'forward', 'nearest'.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import actor_pool_size


class AsofIndex:
    """Sorted small-side arrays: join timestamps + payload columns."""

    def __init__(self, ts: np.ndarray, payload: dict[str, np.ndarray]):
        order = np.argsort(ts, kind="stable")
        self.ts = np.asarray(ts)[order]
        self.payload = {k: np.asarray(v)[order] for k, v in payload.items()}


class AsofJoin:
    def __init__(self, index_ref, on: str, direction: str = "backward",
                 suffix: str = "_r"):
        import ray
        self.index: AsofIndex = (
            ray.get(index_ref) if not isinstance(index_ref, AsofIndex) else index_ref)
        self.on = on
        self.direction = direction
        self.suffix = suffix

    def __call__(self, batch: pa.Table) -> pa.Table:
        lt = np.asarray(batch[self.on]).astype(self.index.ts.dtype)
        rt = self.index.ts
        if self.direction == "backward":
            pos = np.searchsorted(rt, lt, side="right") - 1
        elif self.direction == "forward":
            pos = np.searchsorted(rt, lt, side="left")
            pos = np.where(pos >= len(rt), -1, pos)
        else:  # nearest
            hi = np.searchsorted(rt, lt, side="left")
            lo = hi - 1
            hi = np.clip(hi, 0, len(rt) - 1)
            lo = np.clip(lo, 0, len(rt) - 1)
            pos = np.where(np.abs(rt[hi] - lt) < np.abs(lt - rt[lo]), hi, lo)
        valid = pos >= 0
        pos_c = np.clip(pos, 0, len(rt) - 1)
        out = batch
        for name, vals in self.index.payload.items():
            col = vals[pos_c]
            arr = pa.array(col, mask=~valid) if not valid.all() else pa.array(col)
            out = out.append_column(name + self.suffix, arr)
        return out


def asof_join(ds, right_ts: np.ndarray, right_payload: dict[str, np.ndarray],
              on: str, direction: str = "backward", *, suffix: str = "_r",
              batch_size: int = 65536, concurrency=None):
    """Broadcast as-of join of ``ds[on]`` against a small sorted side."""
    import ray

    ref = ray.put(AsofIndex(np.asarray(right_ts), right_payload))
    return ds.map_batches(AsofJoin, batch_format="pyarrow", batch_size=batch_size,
                          concurrency=(actor_pool_size(0.5)
                                       if concurrency is None else concurrency),
                          num_cpus=0.5,
                          fn_constructor_args=(ref, on, direction, suffix))


def keyed_asof_join(left, right, key: str, ts_col: str, *,
                    tolerance_us: int | None = None,
                    tie_col: str, payload_cols: list[str],
                    suffix: str = "_r", num_buckets: int = 32):
    """As-of join where BOTH sides are large: for each left row, the
    right row of the SAME key with the greatest ``(ts, tie_col) <=
    (left ts, +inf)`` within ``tolerance_us`` (attribution pattern:
    purchase -> most recent click within the window).

    One keyed exchange co-locates both sides per bucket (hash_join
    shape); inside a bucket ONE combined sort by (key, ts, side, tie)
    with rights before lefts at equal ts, then a single global
    ``maximum.accumulate`` over right positions — per-key resets are
    unnecessary because a stale match from a previous key is detected
    by comparing the matched row's key (all vectorized, no per-key
    Python). Tie among equal-ts rights resolves to the max ``tie_col``
    in BOTH engines (the oracle orders ``ts DESC, tie DESC LIMIT 1``).
    """
    import pandas as pd

    from ..aggregate.relational import _key_bucket
    from ..util import pin_for_shuffle

    lcols = [c for c in left.schema().names]
    rcols = [key, ts_col, tie_col] + [c for c in payload_cols
                                      if c not in (key, ts_col, tie_col)]
    all_cols = lcols + [c for c in rcols if c not in lcols]

    # dtype-aware padding: the union needs one schema, but an np.nan pad
    # coerces int64/timestamp payload columns to float64/object (int64
    # ids above 2^53 would lose precision). Pad from the OWNING side's
    # arrow type instead: typed NaT for timestamps, nullable Int64 for
    # ints, NaN only for floats.
    col_types = {**dict(zip(right.schema().names, right.schema().types)),
                 **dict(zip(left.schema().names, left.schema().types))}

    def _null_pad(arrow_type, n: int) -> pd.Series:
        import pyarrow.types as pat
        if pat.is_timestamp(arrow_type):
            return pd.Series(np.full(
                n, np.datetime64("NaT"),
                dtype=f"datetime64[{arrow_type.unit}]"))
        if pat.is_integer(arrow_type):
            return pd.Series(pd.array([pd.NA] * n, dtype="Int64"))
        if pat.is_floating(arrow_type):
            return pd.Series(np.full(n, np.nan))
        if pat.is_boolean(arrow_type):
            return pd.Series(pd.array([pd.NA] * n, dtype="boolean"))
        return pd.Series([None] * n, dtype=object)

    # explicit block schema: an all-null padded column would otherwise
    # infer as arrow `null` type in some blocks, making block schemas
    # diverge across the union
    tag_schema = pa.schema([pa.field(c, col_types[c]) for c in all_cols]
                           + [pa.field("_side", pa.int8()),
                              pa.field("_bucket", pa.int64())])

    def tag(side: int, cols: list[str]):
        def f(df: pd.DataFrame) -> pa.Table:
            out = df[cols].copy()
            for c in all_cols:        # pad: union needs one schema
                if c not in out.columns:
                    out[c] = _null_pad(col_types[c], len(df))
            out = out[all_cols]
            out["_side"] = np.int8(side)
            out["_bucket"] = _key_bucket(df, [key], num_buckets)
            return pa.Table.from_pandas(out, schema=tag_schema,
                                        preserve_index=False)
        return f

    lt = left.map_batches(tag(1, lcols), batch_format="pandas")
    rt = right.map_batches(tag(0, rcols), batch_format="pandas")

    def _sort_key(col) -> np.ndarray:
        """Null-tolerant numeric sort key from an arrow column. Nulls
        appear only on the PADDED side (e.g. left rows' tie), where the
        value never affects matching — fill with 0 for lexsort."""
        import pyarrow.compute as pc
        import pyarrow.types as pat
        a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if pat.is_timestamp(a.type):
            # normalize to MICROSECONDS: the tolerance check compares
            # these int64s against tolerance_us
            return np.asarray(
                pc.fill_null(a.cast(pa.timestamp("us")), 0).cast(pa.int64()))
        if pat.is_integer(a.type):
            return np.asarray(pc.fill_null(a, 0)).astype(np.int64)
        return np.asarray(pc.fill_null(a.cast(pa.float64()), 0.0))

    # ARROW-NATIVE bucket kernel: a pandas round-trip here converts
    # int64-with-null payload columns (the padded union schema) to
    # float64, silently corrupting ids above 2^53 — gather/null-out via
    # take/if_else keeps every payload column's arrow type intact.
    def per_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.drop_columns(["_bucket"])
        n = t.num_rows
        import pyarrow.types as pat
        ka = t[key]
        if isinstance(ka, pa.ChunkedArray):
            ka = ka.combine_chunks()
        if pat.is_integer(ka.type) or pat.is_timestamp(ka.type):
            k = _sort_key(ka)
        else:                         # string keys: dense order codes
            _, k = np.unique(np.asarray(ka), return_inverse=True)
        ts = _sort_key(t[ts_col])
        side = np.asarray(t["_side"]).astype(np.int8)
        order = np.lexsort((_sort_key(t[tie_col]), side, ts, k))
        ks, tss, sides = k[order], ts[order], side[order]
        is_r = sides == 0
        rpos = np.where(is_r, np.arange(n), -1)
        last_r = np.maximum.accumulate(rpos)
        lpos = np.flatnonzero(~is_r)      # lefts, in sorted order
        match = last_r[lpos]
        ok = match >= 0
        mc = np.clip(match, 0, n - 1)
        ok &= ks[mc] == ks[lpos]
        if tolerance_us is not None:
            ok &= (tss[lpos] - tss[mc]) <= tolerance_us
        lorig = pa.array(order[lpos])     # original row ids of lefts
        morig = pa.array(order[mc])       # ... and of their matches
        out = t.select(lcols).take(lorig)
        okpa = pa.array(ok)
        for c in [tie_col] + [p for p in payload_cols
                              if p not in (key, ts_col, tie_col)]:
            vals = pc.take(t[c], morig)
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            vals = pc.if_else(okpa, vals, pa.scalar(None, type=vals.type))
            out = out.append_column(c + suffix if c in lcols else c, vals)
        return out

    both = pin_for_shuffle(lt.union(rt))
    return both.groupby("_bucket").map_groups(per_bucket,
                                              batch_format="pyarrow")
