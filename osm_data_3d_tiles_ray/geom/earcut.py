"""Ear-clipping triangulation with hole support (pure Python/numpy).

Implements the classic ear-clipping algorithm with hole bridging (the same
family of algorithm as the mapbox `earcut` library the reference uses via
``/root/reference/src/building/tile3d-multipolygon.ts:139-196``): holes are
connected to the outer ring through a bridge found by rightmost-vertex ray
casting (David Eberly's method), then ears are clipped from a circular
doubly-linked list.  Written from the published algorithm description — no
z-order curve acceleration (footprints here are small); O(n²) worst case.

Input convention matches the engine's ring model: outer ring + holes as
(n, 2) float arrays WITHOUT the closing duplicate vertex.  Output is an
int array of vertex-index triangles into the concatenated vertex list
(outer vertices first, then hole vertices, in input order).
"""

from __future__ import annotations

import numpy as np

from .fastroll import roll_m1, roll_m2


class _Node:
    __slots__ = ("i", "x", "y", "prev", "next", "steiner")

    def __init__(self, i: int, x: float, y: float):
        self.i = i
        self.x = x
        self.y = y
        self.prev: _Node | None = None
        self.next: _Node | None = None
        self.steiner = False


def _insert(i: int, x: float, y: float, last: _Node | None) -> _Node:
    p = _Node(i, x, y)
    if last is None:
        p.prev = p
        p.next = p
    else:
        p.next = last.next
        p.prev = last
        last.next.prev = p
        last.next = p
    return p


def _remove(p: _Node) -> None:
    p.next.prev = p.prev
    p.prev.next = p.next


def _area2(a: _Node, b: _Node, c: _Node) -> float:
    """2x signed area of triangle abc (positive = counter-clockwise here)."""
    return (b.y - a.y) * (c.x - b.x) - (b.x - a.x) * (c.y - b.y)


def _signed_ring_area(pts: np.ndarray) -> float:
    x = pts[:, 0]
    y = pts[:, 1]
    return float(np.sum((roll_m1(x) - x) * (roll_m1(y) + y))) / 2.0


def _linked_list(pts: np.ndarray, base: int, clockwise: bool) -> _Node | None:
    """Build a circular list in the requested winding."""
    # _signed_ring_area uses the reference's formula, which is the NEGATION of
    # earcut.js's signedArea — the ear tests below expect earcut.js's list
    # orientation, i.e. traverse forward when our area is negative (outer).
    area = _signed_ring_area(pts)
    last = None
    idx = range(len(pts)) if (area < 0) == clockwise else range(len(pts) - 1, -1, -1)
    for i in idx:
        last = _insert(base + i, float(pts[i, 0]), float(pts[i, 1]), last)
    # drop duplicate closing point if caller passed one
    if last is not None and last.x == last.next.x and last.y == last.next.y:
        nxt = last.next
        _remove(last)
        last = nxt if nxt is not last else None
    return last


def _point_in_triangle(ax, ay, bx, by, cx, cy, px, py) -> bool:
    return (
        (cx - px) * (ay - py) - (ax - px) * (cy - py) >= 0
        and (ax - px) * (by - py) - (bx - px) * (ay - py) >= 0
        and (bx - px) * (cy - py) - (cx - px) * (by - py) >= 0
    )


def _is_ear(ear: _Node) -> bool:
    a, b, c = ear.prev, ear, ear.next
    if _area2(a, b, c) >= 0:
        return False  # reflex or degenerate (list winding is CW here)
    p = ear.next.next
    while p is not ear.prev:
        if (
            _point_in_triangle(a.x, a.y, b.x, b.y, c.x, c.y, p.x, p.y)
            and _area2(p.prev, p, p.next) >= 0
        ):
            return False
        p = p.next
    return True


def _cure_local_intersections(start: _Node, triangles: list[int]) -> _Node:
    p = start
    while True:
        a, b = p.prev, p.next.next
        if (
            not (a.x == b.x and a.y == b.y)
            and _intersects(a, p, p.next, b)
            and _locally_inside(a, b)
            and _locally_inside(b, a)
        ):
            triangles.extend((a.i, p.i, b.i))
            _remove(p)
            _remove(p.next)
            p = start = b
        p = p.next
        if p is start:
            break
    return p


def _intersects(p1, q1, p2, q2) -> bool:
    def sign(x):
        return (x > 0) - (x < 0)

    o1 = sign(_area2(p1, q1, p2))
    o2 = sign(_area2(p1, q1, q2))
    o3 = sign(_area2(p2, q2, p1))
    o4 = sign(_area2(p2, q2, q1))
    return o1 != o2 and o3 != o4


def _locally_inside(a: _Node, b: _Node) -> bool:
    if _area2(a.prev, a, a.next) < 0:
        return _area2(a, b, a.next) >= 0 and _area2(a, a.prev, b) >= 0
    return _area2(a, b, a.prev) < 0 or _area2(a, a.next, b) < 0


def _find_hole_bridge(hole: _Node, outer: _Node) -> _Node:
    """Eberly: ray-cast right from the hole's leftmost point; connect to the
    visible outer vertex."""
    p = outer
    hx, hy = hole.x, hole.y
    qx = -np.inf
    m: _Node | None = None
    while True:
        if p.y >= hy >= p.next.y and p.next.y != p.y:
            x = p.x + (hy - p.y) * (p.next.x - p.x) / (p.next.y - p.y)
            if hx >= x > qx:
                qx = x
                m = p if p.x < p.next.x else p.next
                if x == hx:
                    return m
        p = p.next
        if p is outer:
            break
    if m is None:
        return outer
    # check the candidate triangle for contained reflex vertices; choose the
    # one minimizing the angle
    stop = m
    mx, my = m.x, m.y
    tan_min = np.inf
    p = m
    while True:
        if (
            hx >= p.x >= mx
            and hx != p.x
            and _point_in_triangle(
                hx if hy < my else qx, hy, mx, my, qx if hy < my else hx, hy, p.x, p.y
            )
        ):
            tan = abs(hy - p.y) / (hx - p.x) if hx != p.x else np.inf
            if _locally_inside(p, hole) and (
                tan < tan_min
                or (tan == tan_min and (p.x > m.x or _sector_contains(m, p)))
            ):
                m = p
                tan_min = tan
        p = p.next
        if p is stop:
            break
    return m


def _sector_contains(m: _Node, p: _Node) -> bool:
    return _area2(m.prev, m, p) < 0 and _area2(p, m, m.next) < 0


def _split_bridge(a: _Node, b: _Node) -> _Node:
    """Connect a—b with two new bridge nodes, splitting the polygon."""
    a2 = _Node(a.i, a.x, a.y)
    b2 = _Node(b.i, b.x, b.y)
    an, bp = a.next, b.prev
    a.next = b
    b.prev = a
    a2.next = an
    an.prev = a2
    b2.next = a2
    a2.prev = b2
    bp.next = b2
    b2.prev = bp
    return b2


def _leftmost(ring: _Node) -> _Node:
    p = ring
    best = ring
    while True:
        if p.x < best.x or (p.x == best.x and p.y < best.y):
            best = p
        p = p.next
        if p is ring:
            break
    return best


def triangulate(outer: np.ndarray, holes: list[np.ndarray] | None = None) -> np.ndarray:
    """Triangulate a polygon with optional holes.

    ``outer``: (n,2) outer ring (any winding, no closing dup required);
    ``holes``: list of (m,2) hole rings.  Returns (t,3) int32 indices into
    the concatenation [outer, *holes].
    """
    holes = holes or []
    # outer list wound CW (matches the reference's screen convention)
    node = _linked_list(outer, 0, clockwise=True)
    if node is None or node.next is node or node.next.next is node:
        return np.empty((0, 3), dtype=np.int32)

    base = len(outer)
    queue: list[_Node] = []
    for h in holes:
        ring = _linked_list(h, base, clockwise=False)  # holes CCW
        if ring is not None:
            if ring is ring.next:
                ring.steiner = True
            queue.append(_leftmost(ring))
        base += len(h)
    queue.sort(key=lambda n: (n.x, n.y))
    for hole_node in queue:
        bridge = _find_hole_bridge(hole_node, node)
        _split_bridge(bridge, hole_node)

    triangles: list[int] = []
    _earcut_linked(node, triangles, pass_=0)
    return np.asarray(triangles, dtype=np.int32).reshape(-1, 3)


def _earcut_linked(ear: _Node, triangles: list[int], pass_: int) -> None:
    if ear is None:
        return
    stop = ear
    while ear.prev is not ear.next:
        prev, nxt = ear.prev, ear.next
        if _is_ear(ear):
            triangles.extend((prev.i, ear.i, nxt.i))
            _remove(ear)
            ear = nxt.next
            stop = nxt.next
            continue
        ear = nxt
        if ear is stop:
            if pass_ == 0:
                ear = _filter_points(ear)
                _earcut_linked(ear, triangles, 1)
            elif pass_ == 1 and ear is not None:
                ear = _cure_local_intersections(_filter_points(ear), triangles)
                _earcut_linked(ear, triangles, 2)
            return


def _filter_points(start: _Node | None) -> _Node | None:
    """Remove collinear/duplicate points."""
    if start is None:
        return None
    end = start
    p = start
    while True:
        again = False
        if (
            not p.steiner
            and ((p.x == p.next.x and p.y == p.next.y) or _area2(p.prev, p, p.next) == 0)
        ):
            _remove(p)
            p = end = p.prev
            if p is p.next:
                return None
            again = True
        else:
            p = p.next
        if not (again or p is not end):
            break
    return end


def triangulate_multipolygon(
    coords: np.ndarray,
    ring_starts: np.ndarray,
    ring_roles: np.ndarray,
    drop_closing: bool = True,
) -> np.ndarray:
    """Triangulate one multipolygon in the engine's flat SoA layout.

    ``ring_starts`` are vertex start offsets per ring (with implicit final
    end at len(coords)); consecutive (outer, its holes...) groups are
    triangulated together.  Returns (t, 3) indices into ``coords``.
    """
    n_rings = len(ring_starts)
    ends = np.concatenate([ring_starts[1:], [len(coords)]])
    tris: list[np.ndarray] = []
    i = 0
    while i < n_rings:
        if ring_roles[i] != 0:
            i += 1
            continue
        s, e = ring_starts[i], ends[i]
        outer = coords[s:e]
        if drop_closing and len(outer) > 1 and (outer[0] == outer[-1]).all():
            outer = outer[:-1]
        index_map = [np.arange(s, s + len(outer))]
        holes = []
        j = i + 1
        while j < n_rings and ring_roles[j] == 1:
            hs, he = ring_starts[j], ends[j]
            hole = coords[hs:he]
            if drop_closing and len(hole) > 1 and (hole[0] == hole[-1]).all():
                hole = hole[:-1]
            holes.append(hole)
            index_map.append(np.arange(hs, hs + len(hole)))
            j += 1
        t = triangulate(outer, holes)
        if len(t):
            remap = np.concatenate(index_map)
            tris.append(remap[t])
        i = j
    if not tris:
        return np.empty((0, 3), dtype=np.int64)
    return np.concatenate(tris, axis=0)
