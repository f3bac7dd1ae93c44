"""Straight skeleton of simple polygons (G3) — wavefront shrinking with
edge AND split events.

The reference computes straight skeletons in a WASM module
(``SkeletonBuilder.init()``, ``/root/reference/seed-b3dm.ts:19``) and also
accepts precomputed skeletons from a tag
(``/root/reference/src/building/building-params.ts:143``).  This engine
keeps the precomputed path and adds a from-scratch kernel:

* each corner moves inward along its angle bisector with the standard
  offset velocity ``(n_l + n_r) / (1 + n_l·n_r)``;
* **edge events**: an edge's two corners meet — they merge into one corner;
* **split events**: a reflex corner's track hits the moving offset line of
  a non-adjacent edge inside that edge's active span — the wavefront loop
  splits into two loops there;
* every event point is a skeleton vertex; each original edge yields one
  skeleton face (vertices ordered monotonically along the edge).

Degenerate/self-intersecting input (or an inconsistent event cascade)
returns None and callers fall back to flat — the reference's own fallback
semantics (``building-builder.ts:385-393``).
"""

from __future__ import annotations

import json
from math import sqrt

import numpy as np

from .fastroll import roll_m1, roll_m2

_EPS = 1e-9


class _Corner:
    """Wavefront corner.  Positions/velocities are PLAIN PYTHON FLOATS on
    purpose: the event loop evaluates ``at()`` tens of thousands of times
    per batch and 2-element numpy vectors cost ~100× the arithmetic;
    scalar IEEE ops in the same order are bitwise-identical (verified
    against ``np.dot``/``np.linalg.norm`` on this platform)."""

    __slots__ = ("px", "py", "vx", "vy", "t0", "left_e", "right_e", "prev", "next", "alive", "reflex")

    def __init__(self, px, py, vx, vy, t0, left_e, right_e, reflex=False):
        self.px = px
        self.py = py
        self.vx = vx
        self.vy = vy
        self.t0 = t0
        self.left_e = left_e
        self.right_e = right_e
        self.prev = None
        self.next = None
        self.alive = True
        self.reflex = reflex

    def at(self, t):
        dt = t - self.t0
        return (self.px + dt * self.vx, self.py + dt * self.vy)


def _corner_velocity(n_left: np.ndarray, n_right: np.ndarray) -> tuple[float, float] | None:
    nlx, nly = float(n_left[0]), float(n_left[1])
    nrx, nry = float(n_right[0]), float(n_right[1])
    denom = 1.0 + (nlx * nrx + nly * nry)
    if abs(denom) < _EPS:
        return None  # anti-parallel edges
    return ((nlx + nrx) / denom, (nly + nry) / denom)


def compute_straight_skeleton(
    ring_in: np.ndarray, max_events: int | None = None
) -> tuple[np.ndarray, list[list[int]]] | None:
    """Straight skeleton of a simple (convex or non-convex) polygon.

    ``ring_in``: (k, 2) ring, closing duplicate optional, any winding.
    Returns (vertices, faces): ``vertices[:k]`` are the ring vertices in
    the normalized CCW order used, the rest are skeleton vertices; one
    vertex-index face per original edge.  None on degenerate input.
    """
    ring = np.asarray(ring_in, dtype=np.float64)
    if len(ring) > 1 and (ring[0] == ring[-1]).all():
        ring = ring[:-1]
    k = len(ring)
    if k < 3:
        return None
    x, y = ring[:, 0], ring[:, 1]
    area2 = np.sum(x * roll_m1(y) - roll_m1(x) * y)
    if abs(area2) < _EPS:
        return None
    if area2 < 0:
        ring = ring[::-1]

    scale = float(np.abs(ring).max()) + 1.0
    nxt = roll_m1(ring)
    d = nxt - ring
    ln = np.linalg.norm(d, axis=1)
    if (ln < 1e-12).any():
        return None
    dirs = d / ln[:, None]
    normals = np.stack([-dirs[:, 1], dirs[:, 0]], axis=1)  # inward for CCW

    verts: list[list[float]] = [[float(p[0]), float(p[1])] for p in ring]
    faces: dict[int, list[int]] = {e: [e, (e + 1) % k] for e in range(k)}

    corners: list[_Corner] = []
    for i in range(k):
        vel = _corner_velocity(normals[i - 1], normals[i])
        if vel is None:
            return None
        # reflex: interior angle > pi ⇔ cross(prev_dir, this_dir) < 0 (CCW)
        cr = dirs[i - 1][0] * dirs[i][1] - dirs[i - 1][1] * dirs[i][0]
        corners.append(
            _Corner(
                float(ring[i, 0]), float(ring[i, 1]), vel[0], vel[1],
                0.0, (i - 1) % k, i, reflex=cr < -_EPS,
            )
        )
    for i in range(k):
        corners[i].prev = corners[i - 1]
        corners[i].next = corners[(i + 1) % k]
    active: set[_Corner] = set(corners)

    def edge_collapse_time(a: _Corner, b: _Corner) -> float | None:
        dvx = b.vx - a.vx
        dvy = b.vy - a.vy
        tref = max(a.t0, b.t0)
        ax, ay = a.at(tref)
        bx, by = b.at(tref)
        dpx = bx - ax
        dpy = by - ay
        denom = dvx * dvx + dvy * dvy
        if denom < _EPS:
            return None
        t = tref - (dpx * dvx + dpy * dvy) / denom
        if t < tref - 1e-9:
            return None
        ax, ay = a.at(t)
        bx, by = b.at(t)
        gx = ax - bx
        gy = ay - by
        if sqrt(gx * gx + gy * gy) > 1e-6 * scale:
            return None
        return t

    def split_candidates(c: _Corner):
        """(t, edge_index, u) candidates for reflex corner c."""
        out = []
        cvx, cvy = c.vx, c.vy
        cpx, cpy = c.px, c.py
        for u in active:
            e = u.right_e
            if e in (c.left_e, c.right_e) or u is c or u.next is c:
                continue
            nex = float(normals[e, 0])
            ney = float(normals[e, 1])
            n_dot_v = nex * cvx + ney * cvy
            denom = n_dot_v - 1.0
            if abs(denom) < _EPS:
                continue
            t = (
                (nex * (float(ring[e, 0]) - cpx) + ney * (float(ring[e, 1]) - cpy))
                + c.t0 * n_dot_v
            ) / denom
            if t < c.t0 - 1e-9 or t < u.t0 - 1e-9 or t < u.next.t0 - 1e-9:
                continue
            sx, sy = c.at(t)
            # span check along the edge direction at time t
            ax, ay = u.at(t)
            bx, by = u.next.at(t)
            dex = float(dirs[e, 0])
            dey = float(dirs[e, 1])
            pa = dex * ax + dey * ay
            pb = dex * bx + dey * by
            ps = dex * sx + dey * sy
            if ps < min(pa, pb) - 1e-6 * scale or ps > max(pa, pb) + 1e-6 * scale:
                continue
            out.append((t, e, u))
        return out

    def close_pair(a: _Corner, b: _Corner) -> bool:
        t = edge_collapse_time(a, b)
        if t is not None:
            ax, ay = a.at(t)
            bx, by = b.at(t)
            qi = _add_vert(((ax + bx) / 2.0, (ay + by) / 2.0))
            for e in {a.left_e, a.right_e, b.left_e, b.right_e}:
                if qi not in faces[e]:
                    faces[e].append(qi)
        else:
            tt = max(a.t0, b.t0)
            for c in (a, b):
                qi = _add_vert(c.at(tt))
                for e in (c.left_e, c.right_e):
                    if qi not in faces[e]:
                        faces[e].append(qi)
        a.alive = b.alive = False
        active.discard(a)
        active.discard(b)
        return True

    def _add_vert(q: tuple[float, float]) -> int:
        # dedup against existing skeleton vertices (tolerance)
        for j in range(k, len(verts)):
            if abs(verts[j][0] - q[0]) < 1e-7 * scale and abs(verts[j][1] - q[1]) < 1e-7 * scale:
                return j
        verts.append([float(q[0]), float(q[1])])
        return len(verts) - 1

    guard = 0
    limit = max_events if max_events is not None else 8 * k + 16
    while active and guard < limit:
        guard += 1
        # close any 2-corner loops
        closed_any = False
        for c in list(active):
            if not c.alive:
                continue
            if c.next is c.prev and c.next is not c:
                close_pair(c, c.next)
                closed_any = True
        if closed_any:
            continue
        if not active:
            break

        best_t = np.inf
        best = None  # ("edge", a) | ("split", c, e, u)
        for c in active:
            t = edge_collapse_time(c, c.next)
            if t is not None and t < best_t - 1e-12:
                best_t, best = t, ("edge", c)
        for c in active:
            if not c.reflex:
                continue
            for t, e, u in split_candidates(c):
                if t < best_t - 1e-12:
                    best_t, best = t, ("split", c, e, u)
        if best is None:
            return None

        if best[0] == "edge":
            a = best[1]
            b = a.next
            ax, ay = a.at(best_t)
            bx, by = b.at(best_t)
            q = ((ax + bx) / 2.0, (ay + by) / 2.0)
            qi = _add_vert(q)
            for e in (a.right_e, a.left_e, b.right_e):
                if qi not in faces[e]:
                    faces[e].append(qi)
            vel = _corner_velocity(normals[a.left_e], normals[b.right_e])
            if vel is None:
                vel = (0.0, 0.0)
            nd = dirs[a.left_e][0] * dirs[b.right_e][1] - dirs[a.left_e][1] * dirs[b.right_e][0]
            merged = _Corner(
                q[0], q[1], vel[0], vel[1], best_t, a.left_e, b.right_e, reflex=nd < -_EPS
            )
            merged.prev = a.prev
            merged.next = b.next
            a.prev.next = merged
            b.next.prev = merged
            a.alive = b.alive = False
            active.discard(a)
            active.discard(b)
            if merged.next is merged:  # loop fully collapsed
                pass
            else:
                active.add(merged)
        else:
            _, c, e, u = best
            # re-validate u (the event was computed against a snapshot)
            if not u.alive or u.right_e != e:
                continue
            q = c.at(best_t)
            qi = _add_vert(q)
            for ee in (e, c.left_e, c.right_e):
                if qi not in faces[ee]:
                    faces[ee].append(qi)
            v1 = _corner_velocity(normals[c.left_e], normals[e])
            v2 = _corner_velocity(normals[e], normals[c.right_e])
            # anti-parallel edge pair ⇒ the new corner sits on a ridge — it
            # stops and its neighbors converge onto it (same fallback as the
            # simultaneous-collapse edge-event case)
            if v1 is None:
                v1 = (0.0, 0.0)
            if v2 is None:
                v2 = (0.0, 0.0)
            cr1 = dirs[c.left_e][0] * dirs[e][1] - dirs[c.left_e][1] * dirs[e][0]
            cr2 = dirs[e][0] * dirs[c.right_e][1] - dirs[e][1] * dirs[c.right_e][0]
            c1 = _Corner(q[0], q[1], v1[0], v1[1], best_t, c.left_e, e, reflex=cr1 < -_EPS)
            c2 = _Corner(q[0], q[1], v2[0], v2[1], best_t, e, c.right_e, reflex=cr2 < -_EPS)
            # loop 1: ... c.prev -> c1 -> u.next ...
            c1.prev = c.prev
            c1.next = u.next
            c.prev.next = c1
            u.next.prev = c1
            # loop 2: ... u -> c2 -> c.next ...
            c2.prev = u
            c2.next = c.next
            u.next = c2
            c.next.prev = c2
            c.alive = False
            active.discard(c)
            active.add(c1)
            active.add(c2)
            # degenerate mini-loops close next iteration

    if active:
        return None  # event cascade didn't terminate cleanly

    varr = np.asarray(verts)
    out_faces: list[list[int]] = []
    for e in range(k):
        idx = faces[e]
        if len(idx) < 3:
            return None
        de = dirs[e]
        sk_idx = [j for j in idx if j >= k or j not in (e, (e + 1) % k)]
        # order: edge_start, edge_end, skeleton verts by decreasing projection
        # (faces are monotone along their edge)
        sk_sorted = sorted(sk_idx, key=lambda j: -float(de @ varr[j]))
        out_faces.append([e, (e + 1) % k] + sk_sorted)
    return varr, out_faces


def skeleton_json(ring: np.ndarray) -> str | None:
    """Straight skeleton in the engine's JSON contract, or None."""
    out = compute_straight_skeleton(ring)
    if out is None:
        return None
    verts, faces = out
    return json.dumps(
        {"vertices": [[float(a), float(b)] for a, b in verts], "polygons": faces},
        separators=(",", ":"),
    )
