"""Douglas–Peucker polyline/ring simplification (pure numpy, iterative).

A geo-engine companion the reference does not ship (its tiles render
full-resolution footprints) but any LOD pipeline needs: drop vertices
whose perpendicular deviation from the retained chord is within ``eps``.

The kernel is an explicit-stack DP (no recursion-depth hazard) with the
inner distance computation vectorized over each segment span — per-ring
Python is bounded by the number of RETAINED vertices (the irregular-
geometry exception of the repo performance rules), while every
per-vertex distance evaluates as one numpy expression.
"""

from __future__ import annotations

import numpy as np


def simplify_ring(ring: np.ndarray, eps: float) -> np.ndarray:
    """Simplify a CLOSED ring (first vertex NOT repeated at the end).

    The ring is treated as an open polyline anchored at vertex 0 and the
    vertex with maximum distance from it (the standard closed-ring DP
    anchoring), so the result is rotation-stable and keeps ≥ 3 vertices
    for any non-degenerate input.  Returns indices into ``ring`` (sorted,
    always including the two anchors).
    """
    n = len(ring)
    if n <= 3:
        return np.arange(n, dtype=np.int64)
    # second anchor: farthest vertex from vertex 0
    d0 = np.hypot(ring[:, 0] - ring[0, 0], ring[:, 1] - ring[0, 1])
    a2 = int(np.argmax(d0))
    if a2 == 0:  # fully degenerate ring
        return np.arange(min(n, 3), dtype=np.int64)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[a2] = True
    _dp_span(ring, 0, a2, eps, keep)
    _dp_span_wrap(ring, a2, n, eps, keep)
    return np.flatnonzero(keep).astype(np.int64)


def _seg_dist(pts: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Perpendicular distance of points to segment a-b (vectorized)."""
    ab = b - a
    L2 = float(ab @ ab)
    if L2 == 0.0:
        return np.hypot(pts[:, 0] - a[0], pts[:, 1] - a[1])
    t = ((pts - a) @ ab) / L2
    t = np.clip(t, 0.0, 1.0)
    proj = a + t[:, None] * ab
    return np.hypot(pts[:, 0] - proj[:, 0], pts[:, 1] - proj[:, 1])


def _dp_span(ring: np.ndarray, i: int, j: int, eps: float, keep: np.ndarray) -> None:
    """DP over ring[i..j] (both retained), marking kept interior vertices."""
    stack = [(i, j)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        pts = ring[a + 1 : b]
        d = _seg_dist(pts, ring[a], ring[b])
        m = int(np.argmax(d))
        if d[m] > eps:
            mid = a + 1 + m
            keep[mid] = True
            stack.append((a, mid))
            stack.append((mid, b))


def _dp_span_wrap(ring: np.ndarray, a2: int, n: int, eps: float, keep: np.ndarray) -> None:
    """DP over the wrap-around span ring[a2..n-1, 0] (chord a2 → 0)."""
    if n - a2 < 2:
        return
    idx = np.arange(a2, n)
    stack = [(0, len(idx))]  # spans over idx + virtual endpoint ring[0]
    ext = np.concatenate([idx, [0]])  # closing chord back to vertex 0
    stack = [(0, len(ext) - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        pts = ring[ext[a + 1 : b]]
        d = _seg_dist(pts, ring[ext[a]], ring[ext[b]])
        m = int(np.argmax(d))
        if d[m] > eps:
            mid = a + 1 + m
            keep[ext[mid]] = True
            stack.append((a, mid))
            stack.append((mid, b))
