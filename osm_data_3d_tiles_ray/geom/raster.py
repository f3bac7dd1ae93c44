"""Raster↔vector companion kernels (G18/G19).

* :func:`tiles_under_triangle` — conservative triangle→grid-cell cover via
  DDA line walks + scanline fill (reference:
  ``/root/reference/src/building/roof/utils.ts:373-476``).
* :func:`polygon_cell_cover` — exact cell cover of a polygon footprint:
  triangulate then union the per-triangle covers (basis of the engine's
  H3/S2-style covering op, SURVEY.md §7.1 step 8).
* :func:`sample_points_in_polygon` — deterministic jittered-grid interior
  points (reference: ``src/building/tile3d-multipolygon.ts:357-388``),
  seeded per record via geom.rng (no ``Math.random``).
"""

from __future__ import annotations

import numpy as np

from .earcut import triangulate_multipolygon
from .rings import points_in_ring
from .rng import keyed_uniform


_INF = float("inf")


def _cells_on_segment_list(x0, y0, x1, y1) -> list:
    """Integer grid cells visited by segment (DDA walk), incl. endpoints.

    Pure-Python floats/ints on purpose: the per-step work is a couple of
    compares and adds, where numpy scalar ops cost ~100× the arithmetic
    (same trade as the oriented-roof clip kernel)."""
    from math import floor

    cx, cy = floor(x0), floor(y0)
    cells = [(cx, cy)]
    ex, ey = floor(x1), floor(y1)
    dx = x1 - x0
    dy = y1 - y0
    step_x = 1 if dx > 0 else -1
    step_y = 1 if dy > 0 else -1
    t_max_x = _INF if dx == 0 else ((cx + (step_x > 0)) - x0) / dx
    t_max_y = _INF if dy == 0 else ((cy + (step_y > 0)) - y0) / dy
    t_dx = _INF if dx == 0 else abs(1.0 / dx)
    t_dy = _INF if dy == 0 else abs(1.0 / dy)
    guard = 0
    while (cx != ex or cy != ey) and guard < 100000:
        if t_max_x < t_max_y:
            cx += step_x
            t_max_x += t_dx
        else:
            cy += step_y
            t_max_y += t_dy
        cells.append((cx, cy))
        guard += 1
    return cells


def _cells_on_segment(x0, y0, x1, y1) -> np.ndarray:
    """Array wrapper over :func:`_cells_on_segment_list` (unit-test API)."""
    return np.asarray(_cells_on_segment_list(x0, y0, x1, y1), dtype=np.int64)


def _triangle_cells_into(tri, out: set) -> None:
    """Add the covered cells of one (3,2) triangle (edge DDA cells +
    per-row scanline fill between their extremes) into ``out``."""
    rows: dict = {}
    for a, b in ((0, 1), (1, 2), (2, 0)):
        for cx, cy in _cells_on_segment_list(
            tri[a][0], tri[a][1], tri[b][0], tri[b][1]
        ):
            lohi = rows.get(cy)
            if lohi is None:
                rows[cy] = [cx, cx]
            elif cx < lohi[0]:
                lohi[0] = cx
            elif cx > lohi[1]:
                lohi[1] = cx
    for y, (lo, hi) in rows.items():
        for x in range(lo, hi + 1):
            out.add((x, y))


def tiles_under_triangle(tri: np.ndarray) -> np.ndarray:
    """(3,2) triangle in cell units → (k,2) covered integer cells
    (conservative: edge cells + scanline fill between them)."""
    cells: set = set()
    _triangle_cells_into(tri.tolist(), cells)
    if not cells:
        return np.empty((0, 2), dtype=np.int64)
    return np.asarray(sorted(cells), dtype=np.int64)


def polygon_cell_cover(
    coords: np.ndarray,
    ring_starts: np.ndarray,
    ring_roles: np.ndarray,
    origin: tuple[float, float],
    cell_size: float,
) -> np.ndarray:
    """Exact covered-cell set of a polygon footprint (union over its
    triangulation) in grid coordinates anchored at ``origin``."""
    tris = triangulate_multipolygon(coords, ring_starts, ring_roles)
    if len(tris) == 0:
        return np.empty((0, 2), dtype=np.int64)
    pts = ((coords - np.asarray(origin)) / cell_size).tolist()
    cells: set = set()
    for t in tris:
        _triangle_cells_into((pts[t[0]], pts[t[1]], pts[t[2]]), cells)
    if not cells:
        return np.empty((0, 2), dtype=np.int64)
    return np.asarray(sorted(cells), dtype=np.int64)


def sample_points_in_polygon(
    key: int,
    outer: np.ndarray,
    holes: list[np.ndarray],
    spacing: float,
    jitter: float = 0.4,
) -> np.ndarray:
    """Deterministic jittered-grid points strictly inside the polygon."""
    minx, miny = outer.min(axis=0)
    maxx, maxy = outer.max(axis=0)
    xs = np.arange(minx + spacing / 2, maxx, spacing)
    ys = np.arange(miny + spacing / 2, maxy, spacing)
    if len(xs) == 0 or len(ys) == 0:
        return np.empty((0, 2))
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)
    idx = np.arange(len(pts), dtype=np.uint64) + np.uint64(key) * np.uint64(1_000_003)
    pts[:, 0] += (keyed_uniform(idx, 11) - 0.5) * jitter * spacing
    pts[:, 1] += (keyed_uniform(idx, 13) - 0.5) * jitter * spacing
    inside = points_in_ring(pts, outer)
    for h in holes:
        inside &= ~points_in_ring(pts, h)
    return pts[inside]
