"""Broadcast point-in-polygon join — the engine's spatial semi/anti/inner
join (SURVEY.md J5).

The reference tests cell centers against swath polygons with
shapely ``prep(poly).intersects(Point)`` loops and rasterio polygon burns
(reference products.py:1170-1177, 1432-1440; raster_proc.py:916-935 with
the inside/outside semi-/anti-join forms at 936-939). Neither lib exists
here, and a per-row loop is wrong at scale anyway — so:

- polygons are packed into flat NumPy edge arrays with bounding boxes
  (an STRtree-style candidate filter: bbox test first, exact test after);
- containment is vectorized even-odd ray casting over (points x edges),
  chunked over edges to bound memory;
- the polygon layer is broadcast once via ``ray.put`` and each actor of
  the ``map_batches`` pool builds its packed index ONCE in ``__init__``
  — no per-batch rebuild, no shuffle (the canonical small-side broadcast
  join).

Tie rule (documented per FIXTURES.md F3): even-odd crossing with the
half-open edge rule ``(y1 > y) != (y2 > y)`` — a point exactly on a
horizontal boundary edge belongs to the polygon whose interior is above
it; vertices count once. Points exactly on a non-horizontal edge follow
IEEE comparison of the intersection abscissa.

Antimeridian: a polygon may be specified in a continuous longitude frame
(coordinates beyond +/-180); each point's longitude is wrapped into the
polygon's frame before testing (the reference's wrapped-longitude shift,
raster_crs.py:189-231).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..util import actor_pool_size


@dataclass
class PolygonSpec:
    """One polygon: exterior ring + optional holes (even-odd combined)."""

    poly_id: int
    label: str
    exterior: np.ndarray          # (k, 2) [lon, lat], open or closed ring
    holes: list[np.ndarray] = field(default_factory=list)


class PolygonIndex:
    """Packed edge arrays + bboxes for a polygon layer. Build once, query
    batches. Pickles cheaply (plain ndarrays) -> safe to ``ray.put``."""

    def __init__(self, polys: list[PolygonSpec]):
        self.poly_ids = np.array([p.poly_id for p in polys], dtype=np.int64)
        self.labels = np.array([p.label for p in polys], dtype=object)
        self._edges = []       # per poly: (x1, y1, x2, y2) float64 arrays
        self._bbox = np.zeros((len(polys), 4))  # lon_min, lat_min, lon_max, lat_max
        self._lon_frame = np.zeros(len(polys))
        for k, p in enumerate(polys):
            rings = [np.asarray(p.exterior, dtype=np.float64)] + [
                np.asarray(h, dtype=np.float64) for h in p.holes]
            x1s, y1s, x2s, y2s = [], [], [], []
            for ring in rings:
                if not np.array_equal(ring[0], ring[-1]):
                    ring = np.vstack([ring, ring[:1]])
                x1s.append(ring[:-1, 0]); y1s.append(ring[:-1, 1])
                x2s.append(ring[1:, 0]); y2s.append(ring[1:, 1])
            x1 = np.concatenate(x1s); y1 = np.concatenate(y1s)
            x2 = np.concatenate(x2s); y2 = np.concatenate(y2s)
            self._edges.append((x1, y1, x2, y2))
            self._bbox[k] = [min(x1.min(), x2.min()), min(y1.min(), y2.min()),
                             max(x1.max(), x2.max()), max(y1.max(), y2.max())]
            self._lon_frame[k] = self._bbox[k][0]

    def __len__(self):
        return len(self.poly_ids)

    def contains(self, lat: np.ndarray, lon: np.ndarray, poly_idx: int,
                 edge_chunk: int = 512) -> np.ndarray:
        """Vectorized even-odd test of N points against one polygon."""
        x1, y1, x2, y2 = self._edges[poly_idx]
        bb = self._bbox[poly_idx]
        # wrap point lon into the polygon's longitude frame (antimeridian)
        x = self._lon_frame[poly_idx] + np.mod(lon - self._lon_frame[poly_idx], 360.0)
        y = np.asarray(lat, dtype=np.float64)
        cand = (x >= bb[0]) & (x <= bb[2]) & (y >= bb[1]) & (y <= bb[3])
        out = np.zeros(len(y), dtype=bool)
        if not cand.any():
            return out
        xc, yc = x[cand], y[cand]
        crossings = np.zeros(len(xc), dtype=np.int64)
        for s in range(0, len(x1), edge_chunk):
            ex1 = x1[s:s + edge_chunk][None, :]
            ey1 = y1[s:s + edge_chunk][None, :]
            ex2 = x2[s:s + edge_chunk][None, :]
            ey2 = y2[s:s + edge_chunk][None, :]
            yy = yc[:, None]
            straddle = (ey1 > yy) != (ey2 > yy)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = (ex2 - ex1) * (yy - ey1) / (ey2 - ey1) + ex1
            crossings += (straddle & (xc[:, None] < xint)).sum(axis=1)
        out[cand] = (crossings % 2) == 1
        return out

    def join_pairs(self, lat: np.ndarray, lon: np.ndarray):
        """All (row_index, polygon_ordinal) containment pairs."""
        rows, polys = [], []
        for k in range(len(self)):
            m = self.contains(lat, lon, k)
            if m.any():
                idx = np.nonzero(m)[0]
                rows.append(idx)
                polys.append(np.full(len(idx), k, dtype=np.int64))
        if not rows:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(rows), np.concatenate(polys)

    def contains_any(self, lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
        m = np.zeros(len(np.asarray(lat)), dtype=bool)
        for k in range(len(self)):
            todo = ~m
            if not todo.any():
                break
            m[todo] |= self.contains(lat[todo], lon[todo], k)
        return m


class PipJoin:
    """Actor-pool ``map_batches`` stage: broadcast polygon layer, exact
    containment join per batch.

    how='inner': emit one output row per (point, containing polygon) with
        ``poly_id``/``label`` appended (points in no polygon drop out);
    how='semi':  keep points contained in >=1 polygon, columns unchanged;
    how='anti':  keep points contained in NO polygon.

    Usage::

        idx_ref = ray.put(PolygonIndex(polys))   # once, on the driver
        ds.map_batches(PipJoin, fn_constructor_args=(idx_ref, "inner"),
                       batch_format="pyarrow", concurrency=8)
    """

    def __init__(self, index_ref, how: str = "inner",
                 lat_col: str = "lat", lon_col: str = "lon"):
        import ray
        self.index: PolygonIndex = (
            ray.get(index_ref) if not isinstance(index_ref, PolygonIndex) else index_ref)
        if how not in ("inner", "semi", "anti"):
            raise ValueError(how)
        self.how = how
        self.lat_col = lat_col
        self.lon_col = lon_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = np.asarray(batch[self.lat_col], dtype=np.float64)
        lon = np.asarray(batch[self.lon_col], dtype=np.float64)
        if self.how == "semi":
            return batch.filter(pa.array(self.index.contains_any(lat, lon)))
        if self.how == "anti":
            return batch.filter(pa.array(~self.index.contains_any(lat, lon)))
        rows, polys = self.index.join_pairs(lat, lon)
        out = batch.take(pa.array(rows))
        out = out.append_column("poly_id", pa.array(self.index.poly_ids[polys]))
        out = out.append_column(
            "label", pa.array(self.index.labels[polys].tolist(), type=pa.string()))
        return out


def pip_join(ds, polygons: list[PolygonSpec] | PolygonIndex, how: str = "inner",
             *, lat_col: str = "lat", lon_col: str = "lon", concurrency=None,
             batch_size: int = 8192):
    """Attach the broadcast PIP join to a Dataset."""
    import ray

    index = polygons if isinstance(polygons, PolygonIndex) else PolygonIndex(polygons)
    index_ref = ray.put(index)
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size, num_cpus=0.5,
                  fn_constructor_args=(index_ref, how, lat_col, lon_col))
    kwargs["concurrency"] = (actor_pool_size(0.5) if concurrency is None
                             else concurrency)
    return ds.map_batches(PipJoin, **kwargs)
