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
              batch_size: int = 65536, concurrency: int = 2):
    """Broadcast as-of join of ``ds[on]`` against a small sorted side."""
    import ray

    ref = ray.put(AsofIndex(np.asarray(right_ts), right_payload))
    return ds.map_batches(AsofJoin, batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=0.5,
                          fn_constructor_args=(ref, on, direction, suffix))
