"""Pole of inaccessibility (polylabel quadtree algorithm).

Reference parity: ``/root/reference/src/building/tile3d-multipolygon.ts:332-355``
(uses the mapbox polylabel algorithm).  Returns (x, y, distance) — the
interior point maximally distant from the polygon boundary.

Hot-path shape: the polygon's segment arrays (endpoints, deltas, squared
lengths) are precomputed ONCE, and every quadtree step evaluates its four
children in one vectorized pass — no per-cell ``np.roll`` / errstate
context (those dominated the original profile at ~90k cell evaluations
per label batch).
"""

from __future__ import annotations

import heapq

import numpy as np

from .fastroll import roll_m1, roll_m2

_SQRT2 = float(np.sqrt(2.0))


class _PolyDist:
    """Vectorized signed distance to a multipolygon boundary (+ inside)."""

    def __init__(self, rings: list[np.ndarray]):
        a_parts = []
        b_parts = []
        for ring in rings:
            a_parts.append(ring)
            b_parts.append(roll_m1(ring))
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        self.ax, self.ay = a[:, 0], a[:, 1]
        d = b - a
        self.dx, self.dy = d[:, 0], d[:, 1]
        l2 = self.dx * self.dx + self.dy * self.dy
        self.l2_safe = np.where(l2 == 0, 1.0, l2)
        self.degenerate = l2 == 0
        # crossing-test edge arrays (same segments; PIP parity over ALL
        # rings == XOR of per-ring parities)
        self.bx, self.by = b[:, 0], b[:, 1]

    def signed(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Signed distances for k query points: positive inside."""
        px = px[:, None]
        py = py[:, None]
        # min distance to any segment
        t = ((px - self.ax) * self.dx + (py - self.ay) * self.dy) / self.l2_safe
        t = np.clip(t, 0.0, 1.0)
        t[..., self.degenerate] = 0.0
        cx = self.ax + t * self.dx
        cy = self.ay + t * self.dy
        d2 = (px - cx) ** 2 + (py - cy) ** 2
        d = np.sqrt(d2.min(axis=1))
        # even-odd crossing parity over all ring edges
        cond = (self.ay > py) != (self.by > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xints = (self.bx - self.ax) * (py - self.ay) / (self.by - self.ay) + self.ax
        crossings = (cond & (px < xints)).sum(axis=1)
        inside = (crossings % 2) == 1
        return np.where(inside, d, -d)


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
    poly = _PolyDist(rings)

    heap: list = []
    tie = 0

    def push_cells(cxs, cys, hh):
        nonlocal tie
        ds = poly.signed(np.asarray(cxs, dtype=np.float64), np.asarray(cys, dtype=np.float64))
        for cx, cy, d in zip(cxs, cys, ds):
            c = (-(d + hh * _SQRT2), float(d), float(cx), float(cy), hh)
            heapq.heappush(heap, (c[0], tie, c))
            tie += 1

    seed_x = []
    seed_y = []
    x = minx
    while x < maxx:
        y = miny
        while y < maxy:
            seed_x.append(x + h)
            seed_y.append(y + h)
            y += cell_size
        x += cell_size
    push_cells(seed_x, seed_y, h)

    # centroid + bbox-center seeds
    cx, cy = outer.mean(axis=0)
    seeds = poly.signed(
        np.array([cx, (minx + maxx) / 2]), np.array([cy, (miny + maxy) / 2])
    )
    best = (0.0, float(seeds[0]), float(cx), float(cy), 0.0)
    if seeds[1] > best[1]:
        best = (0.0, float(seeds[1]), (minx + maxx) / 2, (miny + maxy) / 2, 0.0)

    while heap:
        _, _, c = heapq.heappop(heap)
        neg_pot, d, ccx, ccy, ch = c
        if d > best[1]:
            best = c
        if -neg_pot - best[1] <= precision:
            continue
        nh = ch / 2.0
        push_cells(
            [ccx - nh, ccx + nh, ccx - nh, ccx + nh],
            [ccy - nh, ccy - nh, ccy + nh, ccy + nh],
            nh,
        )
    return float(best[2]), float(best[3]), float(best[1])
