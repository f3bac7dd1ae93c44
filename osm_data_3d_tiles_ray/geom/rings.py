"""Vectorized ring/polygon primitives over flat-coordinate SoA batches.

A batch of multipolygons is represented structure-of-arrays:

* ``coords``       — float64 ``(n_vertices, 2)``, all rings concatenated;
* ``ring_offsets`` — int64 ``(n_rings + 1)`` vertex start index per ring;
* ``ring_roles``   — int8 ``(n_rings,)`` 0 = outer, 1 = inner (hole);
* ``poly_offsets`` — int64 ``(n_polys + 1)`` ring start index per polygon.

Reference parity:
* signed area / winding normalization — ``/root/reference/src/utils/geometry.ts:6-30``,
  applied in ``/root/reference/src/build3dBuilding.ts:48-72`` (outer→CW, holes→CCW
  in the reference's y-down screen convention; we keep its numeric convention:
  the "CW" test is ``signed_area > 0`` with the shoelace formula below).
* closed-ring validation — ``/root/reference/src/ring/ring-helper.ts:16-21``.
* area / centroid / bbox / point-in-polygon —
  ``/root/reference/src/building/tile-3d-ring.ts:64-111``,
  ``/root/reference/src/math/utils.ts:3-45``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .fastroll import roll_m1, roll_m2


@dataclass
class RingBatch:
    """SoA view of a batch of multipolygons (see module docstring)."""

    coords: np.ndarray        # (n_vertices, 2) float64
    ring_offsets: np.ndarray  # (n_rings + 1,) int64
    ring_roles: np.ndarray    # (n_rings,) int8
    poly_offsets: np.ndarray  # (n_polys + 1,) int64

    @property
    def n_polys(self) -> int:
        return len(self.poly_offsets) - 1

    @property
    def n_rings(self) -> int:
        return len(self.ring_offsets) - 1

    def ring_slice(self, r: int) -> np.ndarray:
        return self.coords[self.ring_offsets[r] : self.ring_offsets[r + 1]]

    def poly_rings(self, p: int) -> range:
        return range(self.poly_offsets[p], self.poly_offsets[p + 1])


def ring_signed_areas(coords: np.ndarray, ring_offsets: np.ndarray) -> np.ndarray:
    """Shoelace signed area per ring, vectorized over the whole batch.

    Positive = clockwise in the reference's convention
    (``src/utils/geometry.ts:6-14`` sums ``(x2-x1)*(y2+y1)`` / 2).
    """
    x = coords[:, 0]
    y = coords[:, 1]
    nxt = np.arange(1, len(coords) + 1)
    # wrap the last vertex of each ring back to the ring's first vertex
    # (zero-length rings — dead-lettered upstream — contribute area 0)
    starts = np.asarray(ring_offsets[:-1])
    ends = np.asarray(ring_offsets[1:])
    nonempty = ends > starts
    nxt[ends[nonempty] - 1] = starts[nonempty]
    cross = (x[nxt] - x) * (y[nxt] + y)
    csum = np.concatenate([[0.0], np.cumsum(cross)])
    return (csum[ends] - csum[starts]) / 2.0


def rings_closed(coords: np.ndarray, ring_offsets: np.ndarray) -> np.ndarray:
    """Bool per ring: first vertex == last vertex (ring-helper.ts:16-21).
    Zero-length rings report False (they are dead-lettered upstream)."""
    starts = np.asarray(ring_offsets[:-1])
    ends = np.asarray(ring_offsets[1:]) - 1
    out = np.zeros(len(starts), dtype=bool)
    nonempty = ends >= starts
    if nonempty.any():
        out[nonempty] = np.all(
            coords[starts[nonempty]] == coords[ends[nonempty]], axis=1
        )
    return out


def drop_closing_vertex(batch: RingBatch) -> RingBatch:
    """Remove the duplicated closing vertex of each closed ring."""
    closed = rings_closed(batch.coords, batch.ring_offsets)
    lens = np.diff(batch.ring_offsets) - closed.astype(np.int64)
    keep = np.ones(len(batch.coords), dtype=bool)
    keep[batch.ring_offsets[1:][closed] - 1] = False
    new_offsets = np.concatenate([[0], np.cumsum(lens)])
    return RingBatch(batch.coords[keep], new_offsets, batch.ring_roles, batch.poly_offsets)


def normalize_winding(batch: RingBatch) -> RingBatch:
    """Outer rings → CW (signed area > 0), inner rings → CCW, in place-ish.

    Reference: ``src/build3dBuilding.ts:48-72`` reverses vertex order when the
    winding disagrees with the ring role.
    """
    areas = ring_signed_areas(batch.coords, batch.ring_offsets)
    is_cw = areas > 0
    want_cw = batch.ring_roles == 0
    flip = is_cw != want_cw
    if not flip.any():
        return batch
    coords = batch.coords.copy()
    for r in np.nonzero(flip)[0]:
        s, e = batch.ring_offsets[r], batch.ring_offsets[r + 1]
        coords[s:e] = coords[s:e][::-1]
    return RingBatch(coords, batch.ring_offsets, batch.ring_roles, batch.poly_offsets)


def classify_winding(coords: np.ndarray, ring_offsets: np.ndarray) -> np.ndarray:
    """int8 role per ring from winding alone: CW ⇒ 0 (outer), CCW ⇒ 1 (inner).

    Reference: ``src/ring/ring-builder.ts:12-29`` recomputes the ring type from
    winding, overriding the position-based MVT type.
    """
    return (ring_signed_areas(coords, ring_offsets) <= 0).astype(np.int8)


def _per_ring_sum(values: np.ndarray, ring_offsets: np.ndarray) -> np.ndarray:
    csum = np.concatenate([[0.0], np.cumsum(values)])
    return csum[ring_offsets[1:]] - csum[ring_offsets[:-1]]


def ring_centroids(coords: np.ndarray, ring_offsets: np.ndarray) -> np.ndarray:
    """(n_rings, 2) vertex-average centroid per ring (closing vertex excluded
    if present, to match a mean over distinct vertices)."""
    closed = rings_closed(coords, ring_offsets)
    w = np.ones(len(coords))
    w[ring_offsets[1:][closed] - 1] = 0.0
    sx = _per_ring_sum(coords[:, 0] * w, ring_offsets)
    sy = _per_ring_sum(coords[:, 1] * w, ring_offsets)
    n = _per_ring_sum(w, ring_offsets)
    return np.stack([sx / n, sy / n], axis=1)


def poly_bbox(batch: RingBatch) -> np.ndarray:
    """(n_polys, 4) [minx, miny, maxx, maxy] over ALL rings of each polygon."""
    n = batch.n_polys
    out = np.empty((n, 4), dtype=np.float64)
    vert_start = batch.ring_offsets[batch.poly_offsets[:-1]]
    vert_end = batch.ring_offsets[batch.poly_offsets[1:]]
    mins = np.minimum.reduceat(batch.coords, vert_start, axis=0)
    maxs = np.maximum.reduceat(batch.coords, vert_start, axis=0)
    # reduceat handles contiguous segments; polygons are contiguous in coords
    out[:, 0] = mins[:, 0]
    out[:, 1] = mins[:, 1]
    out[:, 2] = maxs[:, 0]
    out[:, 3] = maxs[:, 1]
    empty = vert_end <= vert_start
    if empty.any():
        out[empty] = np.nan
    return out


def poly_outer_centroid(batch: RingBatch) -> np.ndarray:
    """(n_polys, 2) vertex-average centroid of each polygon's FIRST outer ring."""
    cents = ring_centroids(batch.coords, batch.ring_offsets)
    first_ring = batch.poly_offsets[:-1]
    return cents[first_ring]


def poly_area(batch: RingBatch) -> np.ndarray:
    """|outer| − |holes| absolute area per polygon (tile3d-multipolygon getArea)."""
    areas = np.abs(ring_signed_areas(batch.coords, batch.ring_offsets))
    sign = np.where(batch.ring_roles == 0, 1.0, -1.0)
    signed = areas * sign
    csum = np.concatenate([[0.0], np.cumsum(signed)])
    return csum[batch.poly_offsets[1:]] - csum[batch.poly_offsets[:-1]]


def point_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    """Ray-cast PIP against one ring (reference: src/math/utils.ts:3-45)."""
    x = ring[:, 0]
    y = ring[:, 1]
    x2 = roll_m1(x)
    y2 = roll_m1(y)
    cond = (y > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xin = (x2 - x) * (py - y) / (y2 - y) + x
    hits = cond & (px < xin)
    return bool(np.count_nonzero(hits) & 1)


def points_in_ring(pts: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized ray-cast PIP: (m,2) points vs one (n,2) ring → (m,) bool."""
    x = ring[:, 0][:, None]
    y = ring[:, 1][:, None]
    x2 = roll_m1(ring[:, 0])[:, None]
    y2 = roll_m1(ring[:, 1])[:, None]
    px = pts[:, 0][None, :]
    py = pts[:, 1][None, :]
    cond = (y > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xin = (x2 - x) * (py - y) / (y2 - y) + x
    hits = cond & (px < xin)
    return (hits.sum(axis=0) & 1).astype(bool)
