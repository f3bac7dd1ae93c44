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


def _cells_on_segment(x0, y0, x1, y1) -> np.ndarray:
    """Integer grid cells visited by segment (DDA walk), incl. endpoints."""
    cells = [(int(np.floor(x0)), int(np.floor(y0)))]
    cx, cy = cells[0]
    ex, ey = int(np.floor(x1)), int(np.floor(y1))
    dx = x1 - x0
    dy = y1 - y0
    step_x = 1 if dx > 0 else -1
    step_y = 1 if dy > 0 else -1
    t_max_x = np.inf if dx == 0 else ((cx + (step_x > 0)) - x0) / dx
    t_max_y = np.inf if dy == 0 else ((cy + (step_y > 0)) - y0) / dy
    t_dx = np.inf if dx == 0 else abs(1.0 / dx)
    t_dy = np.inf if dy == 0 else abs(1.0 / dy)
    guard = 0
    while (cx, cy) != (ex, ey) and guard < 100000:
        if t_max_x < t_max_y:
            cx += step_x
            t_max_x += t_dx
        else:
            cy += step_y
            t_max_y += t_dy
        cells.append((cx, cy))
        guard += 1
    return np.asarray(cells, dtype=np.int64)


def tiles_under_triangle(tri: np.ndarray) -> np.ndarray:
    """(3,2) triangle in cell units → (k,2) covered integer cells
    (conservative: edge cells + scanline fill between them)."""
    edge_cells = np.concatenate(
        [
            _cells_on_segment(*tri[0], *tri[1]),
            _cells_on_segment(*tri[1], *tri[2]),
            _cells_on_segment(*tri[2], *tri[0]),
        ]
    )
    out = []
    for y in np.unique(edge_cells[:, 1]):
        xs = edge_cells[edge_cells[:, 1] == y, 0]
        out.append(
            np.stack(
                [np.arange(xs.min(), xs.max() + 1), np.full(xs.max() - xs.min() + 1, y)],
                axis=1,
            )
        )
    cells = np.concatenate(out)
    return np.unique(cells, axis=0)


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
    pts = (coords - np.asarray(origin)) / cell_size
    covers = [tiles_under_triangle(pts[t]) for t in tris]
    return np.unique(np.concatenate(covers), axis=0)


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
