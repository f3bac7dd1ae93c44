"""Straight skeleton of CONVEX polygons (G3) — wavefront shrinking.

The reference computes straight skeletons in a WASM module
(``SkeletonBuilder.init()``, ``/root/reference/seed-b3dm.ts:19``) and also
accepts precomputed skeletons from a tag
(``/root/reference/src/building/building-params.ts:143``).  This engine
keeps the precomputed path and adds a from-scratch kernel for the convex
case (edge events only — no reflex/split events, which only occur for
non-convex input):

* each vertex moves inward along its angle bisector with the standard
  offset velocity ``(n_l + n_r) / (1 + n_l·n_r)`` (unit-speed edge offset);
* the next event is the earliest edge collapse (its endpoints' linear
  trajectories meeting); the two corners merge into one with a new
  bisector;
* every collapse point is a skeleton vertex; each original edge yields one
  skeleton face.

Output matches the engine's skeleton JSON contract
(``{"vertices": [[x,y]...], "polygons": [[idx...]...]}``, ring vertices
first) so :func:`..geom.roofs.build_hipped_roof` consumes it directly.
Non-convex input returns None (callers fall back to flat — reference
fallback semantics).
"""

from __future__ import annotations

import json

import numpy as np

_EPS = 1e-9


def _inward_normals(ring: np.ndarray) -> np.ndarray:
    """Unit inward normal per edge for a CCW-area ring (math convention)."""
    nxt = np.roll(ring, -1, axis=0)
    d = nxt - ring
    ln = np.linalg.norm(d, axis=1)
    n = np.stack([-d[:, 1], d[:, 0]], axis=1) / ln[:, None]
    return n


def compute_straight_skeleton(
    ring_in: np.ndarray,
) -> tuple[np.ndarray, list[list[int]]] | None:
    """Straight skeleton of a convex polygon.

    ``ring_in``: (k, 2) ring, closing duplicate optional, any winding.
    Returns (vertices, faces): ``vertices[:k]`` are the input ring vertices
    (in the normalized CCW order actually used), the rest are skeleton
    vertices; one face (vertex-index polygon) per original edge.  None for
    non-convex/degenerate input.
    """
    ring = np.asarray(ring_in, dtype=np.float64)
    if len(ring) > 1 and (ring[0] == ring[-1]).all():
        ring = ring[:-1]
    k = len(ring)
    if k < 3:
        return None
    # normalize to CCW (positive shoelace in math convention)
    x, y = ring[:, 0], ring[:, 1]
    area2 = np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    if area2 < 0:
        ring = ring[::-1]
    # convexity check
    nxt = np.roll(ring, -1, axis=0)
    nxt2 = np.roll(ring, -2, axis=0)
    cr = (nxt[:, 0] - ring[:, 0]) * (nxt2[:, 1] - nxt[:, 1]) - (
        nxt[:, 1] - ring[:, 1]
    ) * (nxt2[:, 0] - nxt[:, 0])
    if (cr < -1e-9 * max(1.0, np.abs(cr).max())).any():
        return None

    normals = _inward_normals(ring)

    def corner_velocity(n_left: np.ndarray, n_right: np.ndarray) -> np.ndarray:
        denom = 1.0 + float(n_left @ n_right)
        if denom < _EPS:
            return None  # anti-parallel edges (degenerate)
        return (n_left + n_right) / denom

    # active corners as a circular doubly linked list (array-based)
    # corner i sits between edge left_e (incoming) and right_e (outgoing)
    verts: list[list[float]] = [[float(p[0]), float(p[1])] for p in ring]
    faces: dict[int, list[int]] = {e: [e, (e + 1) % k] for e in range(k)}

    class Corner:
        __slots__ = ("pos", "vel", "t0", "left_e", "right_e", "prev", "next", "alive")

        def __init__(self, pos, vel, t0, left_e, right_e):
            self.pos = pos
            self.vel = vel
            self.t0 = t0
            self.left_e = left_e
            self.right_e = right_e
            self.prev = None
            self.next = None
            self.alive = True

        def at(self, t):
            return self.pos + (t - self.t0) * self.vel

    corners = []
    for i in range(k):
        vel = corner_velocity(normals[i - 1], normals[i])
        if vel is None:
            return None
        corners.append(Corner(ring[i].copy(), vel, 0.0, (i - 1) % k, i))
    for i in range(k):
        corners[i].prev = corners[i - 1]
        corners[i].next = corners[(i + 1) % k]

    def collapse_time(a: Corner, b: Corner) -> float | None:
        """Earliest t ≥ max(t0) when a and b coincide (edge between them
        vanishes).  Trajectories are linear; solve along their difference."""
        dv = b.vel - a.vel
        dp = b.at(max(a.t0, b.t0)) - a.at(max(a.t0, b.t0))
        denom = float(dv @ dv)
        if denom < _EPS:
            return None
        t = max(a.t0, b.t0) - float(dp @ dv) / denom
        if t < max(a.t0, b.t0) - 1e-9:
            return None
        # verify they actually meet (convex input ⇒ they do when t is valid)
        if np.linalg.norm(a.at(t) - b.at(t)) > 1e-6 * (1 + np.linalg.norm(a.pos)):
            return None
        return t

    n_alive = k
    head = corners[0]
    guard = 0
    while n_alive > 2 and guard < 4 * k:
        guard += 1
        # earliest edge collapse among alive corners
        best_t, best_a = np.inf, None
        c = head
        for _ in range(n_alive):
            t = collapse_time(c, c.next)
            if t is not None and t < best_t:
                best_t, best_a = t, c
            c = c.next
        if best_a is None:
            return None
        a, b = best_a, best_a.next
        q = (a.at(best_t) + b.at(best_t)) / 2.0
        qi = len(verts)
        verts.append([float(q[0]), float(q[1])])
        # q closes face of the vanishing edge a.right_e and touches the faces
        # of a.left_e and b.right_e
        for e in (a.right_e, a.left_e, b.right_e):
            if qi not in faces[e]:
                faces[e].append(qi)
        vel = corner_velocity(normals[a.left_e], normals[b.right_e])
        if vel is None:
            # anti-parallel surviving edges (simultaneous collapses, e.g. a
            # square): the merged corner IS a ridge point — it stops, and the
            # remaining corners converge onto it
            vel = np.zeros(2)
        merged = Corner(q, vel, best_t, a.left_e, b.right_e)
        merged.prev = a.prev
        merged.next = b.next
        a.prev.next = merged
        b.next.prev = merged
        a.alive = b.alive = False
        if head in (a, b):
            head = merged
        n_alive -= 1

    if n_alive == 2:
        # final ridge: the two remaining corners meet (or run parallel);
        # close both remaining faces with both endpoints
        a = head
        b = head.next
        t = collapse_time(a, b)
        if t is not None:
            q = (a.at(t) + b.at(t)) / 2.0
            qi = len(verts)
            verts.append([float(q[0]), float(q[1])])
            for e in {a.left_e, a.right_e, b.left_e, b.right_e}:
                if qi not in faces[e]:
                    faces[e].append(qi)
        else:
            # parallel ridge: both corners stop where they are "now" — use
            # their positions at the later t0 (ridge segment endpoints)
            tt = max(a.t0, b.t0)
            for c in (a, b):
                q = c.at(tt)
                qi = len(verts)
                verts.append([float(q[0]), float(q[1])])
                for e in (c.left_e, c.right_e):
                    if qi not in faces[e]:
                        faces[e].append(qi)

    # order each face's vertices angularly around its centroid (faces of a
    # convex polygon's skeleton are convex)
    varr = np.asarray(verts)
    out_faces: list[list[int]] = []
    for e in range(k):
        idx = faces[e]
        pts = varr[idx]
        cen = pts.mean(axis=0)
        ang = np.arctan2(pts[:, 1] - cen[1], pts[:, 0] - cen[0])
        order = np.argsort(ang)
        ordered = [idx[j] for j in order]
        # rotate so the face starts at the original edge start vertex
        if e in ordered:
            s = ordered.index(e)
            ordered = ordered[s:] + ordered[:s]
        out_faces.append(ordered)
    return varr, out_faces


def skeleton_json(ring: np.ndarray) -> str | None:
    """Convex straight skeleton in the engine's JSON contract, or None."""
    out = compute_straight_skeleton(ring)
    if out is None:
        return None
    verts, faces = out
    return json.dumps(
        {"vertices": [[float(a), float(b)] for a, b in verts], "polygons": faces},
        separators=(",", ":"),
    )
