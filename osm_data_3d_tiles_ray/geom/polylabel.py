"""Pole of inaccessibility (polylabel quadtree algorithm).

Reference parity: ``/root/reference/src/building/tile3d-multipolygon.ts:332-355``
(uses the mapbox polylabel algorithm).  Returns (x, y, distance) — the
interior point maximally distant from the polygon boundary.
"""

from __future__ import annotations

import heapq

import numpy as np

from .rings import point_in_ring


def _seg_dist(px: float, py: float, rings: list[np.ndarray]) -> float:
    """Signed distance: positive inside, negative outside."""
    inside = False
    min_d2 = np.inf
    for ring in rings:
        if point_in_ring(px, py, ring):
            inside = not inside
        a = ring
        b = np.roll(ring, -1, axis=0)
        dx = b[:, 0] - a[:, 0]
        dy = b[:, 1] - a[:, 1]
        l2 = dx * dx + dy * dy
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.clip(((px - a[:, 0]) * dx + (py - a[:, 1]) * dy) / l2, 0, 1)
        t = np.where(l2 == 0, 0.0, t)
        cx = a[:, 0] + t * dx
        cy = a[:, 1] + t * dy
        d2 = (px - cx) ** 2 + (py - cy) ** 2
        min_d2 = min(min_d2, float(d2.min()))
    d = np.sqrt(min_d2)
    return d if inside else -d


def pole_of_inaccessibility(
    rings: list[np.ndarray], precision: float = 1.0
) -> tuple[float, float, float]:
    """Quadtree search for the point of maximum distance to the boundary.

    ``rings``: outer + hole rings (closing duplicate optional — stripped).
    """
    rings = [r[:-1] if len(r) > 1 and (r[0] == r[-1]).all() else r for r in rings]
    outer = rings[0]
    minx, miny = outer.min(axis=0)
    maxx, maxy = outer.max(axis=0)
    width, height = maxx - minx, maxy - miny
    cell_size = min(width, height)
    if cell_size == 0:
        return float(minx), float(miny), 0.0
    h = cell_size / 2.0

    def cell(cx, cy, hh):
        d = _seg_dist(cx, cy, rings)
        return (-(d + hh * np.sqrt(2)), d, cx, cy, hh)  # heap by max potential

    heap: list = []
    tie = 0
    x = minx
    while x < maxx:
        y = miny
        while y < maxy:
            c = cell(x + h, y + h, h)
            heapq.heappush(heap, (c[0], tie, c))
            tie += 1
            y += cell_size
        x += cell_size

    # centroid seed
    cx, cy = outer.mean(axis=0)
    best = cell(float(cx), float(cy), 0.0)
    bbox_c = cell((minx + maxx) / 2, (miny + maxy) / 2, 0.0)
    if bbox_c[1] > best[1]:
        best = bbox_c

    while heap:
        _, _, c = heapq.heappop(heap)
        neg_pot, d, ccx, ccy, ch = c
        if d > best[1]:
            best = c
        if -neg_pot - best[1] <= precision:
            continue
        nh = ch / 2.0
        for ox, oy in ((-nh, -nh), (nh, -nh), (-nh, nh), (nh, nh)):
            nc = cell(ccx + ox, ccy + oy, nh)
            heapq.heappush(heap, (nc[0], tie, nc))
            tie += 1
    return float(best[2]), float(best[3]), float(best[1])
