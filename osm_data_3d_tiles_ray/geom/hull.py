"""Convex hull + minimum-area oriented bounding box (rotating calipers).

Reference parity: ``/root/reference/src/math/OMBB.ts:110-147`` (gift-wrap
hull) and ``:160-290`` (rotating-calipers min-area box).  Monotone chain is
used instead of gift wrapping — same hull, O(n log n).
"""

from __future__ import annotations

import numpy as np

from .fastroll import roll_m1, roll_m2


def convex_hull(points: np.ndarray) -> np.ndarray:
    """(n,2) points → hull vertices in counter-clockwise order (y-up math
    convention), no repeated endpoint."""
    pts = np.unique(points, axis=0)
    if len(pts) <= 2:
        return pts
    # lexicographic sort (np.unique already sorts rows)
    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list[np.ndarray] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[np.ndarray] = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.asarray(lower[:-1] + upper[:-1])


def ombb(points: np.ndarray) -> tuple[np.ndarray, float]:
    """Minimum-area oriented bounding box of a point set.

    Returns (4 corners (4,2) in order, area).  Rotating calipers over hull
    edges: the optimal box is aligned with some hull edge.
    """
    hull = convex_hull(points)
    n = len(hull)
    if n == 0:
        return np.zeros((4, 2)), 0.0
    if n == 1:
        return np.tile(hull[0], (4, 1)), 0.0
    if n == 2:
        d = hull[1] - hull[0]
        return np.array([hull[0], hull[1], hull[1], hull[0]]), 0.0

    edges = roll_m1(hull) - hull
    lengths = np.linalg.norm(edges, axis=1)
    dirs = edges / lengths[:, None]
    # rotate all hull points into each edge frame: (n_edges, n_pts, 2)
    ux = dirs[:, 0][:, None]
    uy = dirs[:, 1][:, None]
    px = hull[:, 0][None, :]
    py = hull[:, 1][None, :]
    rx = ux * px + uy * py          # projection along edge
    ry = -uy * px + ux * py         # perpendicular
    w = rx.max(axis=1) - rx.min(axis=1)
    h = ry.max(axis=1) - ry.min(axis=1)
    areas = w * h
    best = int(np.argmin(areas))
    x0, x1 = rx[best].min(), rx[best].max()
    y0, y1 = ry[best].min(), ry[best].max()
    u = dirs[best]
    v = np.array([-u[1], u[0]])
    corners = np.array(
        [
            u * x0 + v * y0,
            u * x1 + v * y0,
            u * x1 + v * y1,
            u * x0 + v * y1,
        ]
    )
    return corners, float(areas[best])
