"""Distributed range (interval) join: point.ts BETWEEN interval.[start, end].

The third temporal-join shape next to the as-of join (asof.py, J2) and
the hourly tumbling windows (queries.py hourly_windows): an INNER join of
a large point stream against an interval table on containment, closed at
both ends (SQL ``e.ts BETWEEN i.start AND i.end``). Reference analog: the
per-line time-range gather in the reference's sensor-record selection
(geoloc_raster.py:139-158 picks TVP records bracketing each line's time);
here generalized to arbitrary, possibly overlapping intervals on both a
distributed point side and a distributed interval side.

Scale shape — ONE keyed exchange, no driver materialization:

1. Bucket TIME into spans of ``bucket_us`` (default: the max interval
   length, found with one cheap distributed aggregate over the interval
   side). Each interval is replicated to every bucket it overlaps —
   <= 2 replicas at the default width; ``len/bucket_us + 1`` generally.
   Each point goes to exactly ONE bucket, so every matching pair is
   found exactly once (in the point's bucket) — no pair dedup pass.
2. Many time buckets hash onto ``num_shards`` shuffle groups, so the
   group count (and per-group Python overhead) is bounded by the shard
   count, not by the span of the data — the engine's standard bounded-
   bucket pattern (relational.py hash_aggregate).
3. Inside a shard the match is vectorized ACROSS its time buckets with
   the rank trick: intervals lexsorted by (bucket, start); a composite
   int64 key ``bucket * (n_ranks+1) + rank(start)`` makes "same bucket
   AND start <= ts" one ``searchsorted`` per point array. Candidate
   prefixes expand with the repeat/arange gather (the group-pair kernel
   shape, dedup.py) and are filtered by ``end >= ts``; expansion runs in
   bounded chunks so a hot bucket cannot blow a worker heap.

Skew note: per-shard work is bounded by points-in-bucket x intervals-
overlapping-bucket summed over the shard's buckets. A few giant
intervals widen the default bucket for everyone — pass an explicit
``bucket_us`` near the TYPICAL interval length in that case (giant
intervals then replicate more, which is the right trade).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_CHUNK_PAIRS = 1 << 22  # max candidate pairs expanded at once per shard


def _max_interval_us(intervals, start_col: str, end_col: str) -> int:
    """Distributed max interval length (one tiny row per block -> max)."""

    def span(b: pa.Table) -> pa.Table:
        s = np.asarray(b[start_col], dtype=np.int64)
        e = np.asarray(b[end_col], dtype=np.int64)
        m = int((e - s).max()) if len(s) else 0
        return pa.table({"_span": pa.array([m], type=pa.int64())})

    m = intervals.map_batches(span, batch_format="pyarrow").max("_span")
    return int(m) if m is not None else 0


def range_join(points, intervals, *, ts_col: str,
               start_col: str, end_col: str,
               point_cols: list[str], interval_cols: list[str],
               bucket_us: int | None = None, num_shards: int = 64):
    """Inner range join -> Dataset of pair rows.

    ``points``/``intervals``: Datasets. Timestamps must be int64 (same
    unit, e.g. microseconds) in ``ts_col`` / ``start_col``+``end_col``.
    Output columns: ``point_cols + interval_cols`` (caller guarantees the
    names are disjoint). Match is closed at both ends (SQL BETWEEN).

    NOTE: when NO pair matches anywhere, the result Dataset has an empty
    schema (Ray drops empty blocks; same caveat as hash_join) — callers
    needing the schema on empty results should check ``count()`` first.
    """
    from ..util import pin_for_shuffle

    if bucket_us is None:
        bucket_us = _max_interval_us(intervals, start_col, end_col)
    bucket_us = max(int(bucket_us), 1)

    pcols = list(point_cols)
    icols = list(interval_cols)
    # output schema = point payload + interval payload; sides are unioned
    # into one exchange with typed-null padding (hash_join pattern,
    # relational.py:186-200)
    def _pa_type(t):
        return t if isinstance(t, pa.DataType) else pa.null()

    ptypes = {c: _pa_type(t) for c, t in zip(points.schema().names,
                                             points.schema().types)}
    itypes = {c: _pa_type(t) for c, t in zip(intervals.schema().names,
                                             intervals.schema().types)}
    all_cols = pcols + icols
    col_type = {c: ptypes[c] for c in pcols}
    col_type.update({c: itypes[c] for c in icols})
    out_schema = pa.schema([(c, col_type[c]) for c in all_cols])

    W = np.int64(bucket_us)
    K = np.int64(2654435761)  # Knuth multiplicative hash of the time bucket
    MASK = np.int64(0x7FFFFFFF)

    def tag_points(b: pa.Table) -> pa.Table:
        ts = np.asarray(b[ts_col], dtype=np.int64)
        tb = np.floor_divide(ts, W)
        arrays = {c: b[c] for c in pcols}
        for c in icols:
            arrays[c] = pa.nulls(b.num_rows, type=col_type[c])
        t = pa.table(arrays)
        t = t.append_column("_side", pa.array(np.zeros(len(ts), np.int8)))
        t = t.append_column("_tb", pa.array(tb))
        t = t.append_column("_ts", pa.array(ts))
        t = t.append_column("_e", pa.nulls(len(ts), type=pa.int64()))
        return t.append_column("_shard", pa.array(((tb * K) & MASK) % num_shards))

    def tag_intervals(b: pa.Table) -> pa.Table:
        s = np.asarray(b[start_col], dtype=np.int64)
        e = np.asarray(b[end_col], dtype=np.int64)
        tb_lo = np.floor_divide(s, W)
        tb_hi = np.floor_divide(e, W)
        reps = (tb_hi - tb_lo + 1).astype(np.int64)  # replicas per interval
        idx = np.repeat(np.arange(len(s)), reps)
        # bucket of each replica: lo + (position within its run)
        off = np.arange(len(idx)) - np.repeat(np.cumsum(reps) - reps, reps)
        tb = tb_lo[idx] + off
        arrays = {}
        for c in pcols:
            arrays[c] = pa.nulls(len(idx), type=col_type[c])
        for c in icols:
            col = b[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            arrays[c] = col.take(pa.array(idx))
        t = pa.table(arrays)
        t = t.append_column("_side", pa.array(np.ones(len(idx), np.int8)))
        t = t.append_column("_tb", pa.array(tb))
        t = t.append_column("_ts", pa.array(s[idx]))  # interval START in _ts
        t = t.append_column("_e", pa.array(e[idx]))
        return t.append_column("_shard", pa.array(((tb * K) & MASK) % num_shards))

    both = points.map_batches(tag_points, batch_format="pyarrow").union(
        intervals.map_batches(tag_intervals, batch_format="pyarrow"))

    def _restore(name: str, arr: np.ndarray) -> np.ndarray:
        # union padding floats integer columns; every value in a matched
        # pair is real (non-null), so cast back losslessly
        t = col_type[name]
        if pa.types.is_integer(t) and arr.dtype.kind == "f":
            return arr.astype(t.to_pandas_dtype())
        return arr

    def _empty() -> pa.Table:
        # a TYPED empty table: all-empty results keep their schema (empty
        # pandas blocks would surface as a zero-column frame downstream)
        return out_schema.empty_table()

    def match_shard(df: pd.DataFrame):
        pts = df[df["_side"] == 0]
        ivs = df[df["_side"] == 1]
        if not len(pts) or not len(ivs):
            return _empty()
        i_tb = ivs["_tb"].to_numpy(np.int64)
        i_s = ivs["_ts"].to_numpy(np.int64)
        i_e = ivs["_e"].to_numpy(np.int64)
        p_tb = pts["_tb"].to_numpy(np.int64)
        p_ts = pts["_ts"].to_numpy(np.int64)
        # rank trick: one sorted composite key covers every time bucket in
        # the shard. rank(x) = #start-values <= x, so interval start <= ts
        # iff rank(start) <= rank(ts) — exact, no float comparisons.
        uniq_s = np.unique(i_s)
        n1 = np.int64(len(uniq_s) + 1)
        i_key = i_tb * n1 + np.searchsorted(uniq_s, i_s, side="right")
        order = np.argsort(i_key, kind="stable")
        i_key = i_key[order]
        i_e_sorted = i_e[order]
        p_key = p_tb * n1 + np.searchsorted(uniq_s, p_ts, side="right")
        lo = np.searchsorted(i_key, p_tb * n1, side="left")
        hi = np.searchsorted(i_key, p_key, side="right")
        cnt = hi - lo
        keep_p = np.flatnonzero(cnt > 0)
        if not len(keep_p):
            return _empty()
        lo, cnt = lo[keep_p], cnt[keep_p]
        p_ts_k = p_ts[keep_p]
        pcols_np = {c: pts[c].to_numpy() for c in pcols}
        icols_np = {c: ivs[c].to_numpy()[order] for c in icols}
        out_parts = []
        # chunk the repeat/arange expansion: bound peak pairs in memory
        csum = np.cumsum(cnt)
        bounds = [0]
        while bounds[-1] < len(cnt):
            base = csum[bounds[-1] - 1] if bounds[-1] else 0
            nxt = int(np.searchsorted(csum, base + _CHUNK_PAIRS, "left")) + 1
            bounds.append(min(max(nxt, bounds[-1] + 1), len(cnt)))
        for a, b_ in zip(bounds[:-1], bounds[1:]):
            c = cnt[a:b_]
            total = int(c.sum())
            prow = np.repeat(np.arange(a, b_), c)
            pair_iv = (np.repeat(lo[a:b_], c)
                       + np.arange(total) - np.repeat(np.cumsum(c) - c, c))
            ok = i_e_sorted[pair_iv] >= p_ts_k[prow]
            if not ok.any():
                continue
            prow, pair_iv = prow[ok], pair_iv[ok]
            part = {c_: _restore(c_, pcols_np[c_][keep_p[prow]])
                    for c_ in pcols}
            for c_ in icols:
                part[c_] = _restore(c_, icols_np[c_][pair_iv])
            out_parts.append(pd.DataFrame(part))
        if not out_parts:
            return _empty()
        return pa.Table.from_pandas(pd.concat(out_parts, ignore_index=True),
                                    schema=out_schema, preserve_index=False)

    return (pin_for_shuffle(both)
            .groupby("_shard")
            .map_groups(match_shard, batch_format="pandas"))
