"""Roof geometry builders (G7–G14 subset) + dispatch with flat fallback.

Round-1 coverage (the rest of the reference's 12-builder family falls back
to flat, mirroring the reference's own fallback-to-flat on skeleton/geometry
failure, ``/root/reference/src/building/building-builder.ts:385-393``):

* flat   — footprint earcut at roof base (``flat-roof-builders.ts:9-186``;
  OMBB-aligned UV grid simplified to planar world UVs);
* hipped — precomputed straight-skeleton faces, per-vertex height
  proportional to distance-to-edge (``hipped-roof-builder.ts:12-282``);
* pyramidal — radial fan footprint→apex at the centroid
  (``pyramidal-roof-builder.ts:4-10`` via the curved-builder center);
* skillion — single slope: footprint triangulated, z lerped along the roof
  direction across the footprint's directed extent
  (``skillion-roof-builder.ts:14-215``; wall height_points returned so the
  facade follows the slope).

All builders take/return plain numpy SoA dicts — no Ray coupling; the
actor-pool stage in stages/build3d.py batches them.
"""

from __future__ import annotations

import json
import math

import numpy as np

from .earcut import triangulate_multipolygon

ROOF_TYPES_IMPLEMENTED = {"flat", "hipped", "pyramidal", "skillion"}


def _empty() -> dict[str, np.ndarray]:
    return {
        "position": np.empty((0, 3), np.float32),
        "uv": np.empty((0, 2), np.float32),
        "normal": np.empty((0, 3), np.float32),
        "texture_id": np.empty(0, np.uint8),
    }


def _face_normals(tris: np.ndarray) -> np.ndarray:
    """(t,3,3) triangle vertices → per-vertex normals (flat shading)."""
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    n = np.cross(b - a, c - a)
    ln = np.linalg.norm(n, axis=1, keepdims=True)
    ln[ln == 0] = 1.0
    n = n / ln
    return np.repeat(n, 3, axis=0)


def _pack(tri_pts: np.ndarray, texture_id: int, uv_scale: float = 0.1) -> dict[str, np.ndarray]:
    m = tri_pts.reshape(-1, 3)
    return {
        "position": m.astype(np.float32),
        "uv": (m[:, :2] * uv_scale).astype(np.float32),
        "normal": _face_normals(tri_pts).astype(np.float32),
        "texture_id": np.full(len(m), texture_id, dtype=np.uint8),
    }


def build_flat_roof(
    coords: np.ndarray,
    ring_starts: np.ndarray,
    ring_roles: np.ndarray,
    z: float,
    texture_id: int,
    flip: bool = False,
) -> dict[str, np.ndarray]:
    """Footprint triangulated at constant z (underside cap uses flip=True,
    reference G16 ``building-builder.ts:345-368``)."""
    tri_idx = triangulate_multipolygon(coords, ring_starts, ring_roles)
    if len(tri_idx) == 0:
        return _empty()
    pts = coords[tri_idx]  # (t, 3, 2)
    tri_pts = np.concatenate([pts, np.full((*pts.shape[:2], 1), z)], axis=2)
    if flip:
        tri_pts = tri_pts[:, ::-1, :]
    # ensure upward (or downward when flipped) orientation
    n = np.cross(tri_pts[:, 1] - tri_pts[:, 0], tri_pts[:, 2] - tri_pts[:, 0])
    want = -1.0 if flip else 1.0
    wrong = n[:, 2] * want < 0
    tri_pts[wrong] = tri_pts[wrong][:, ::-1, :]
    return _pack(tri_pts, texture_id)


def parse_skeleton(skeleton_json: str) -> tuple[np.ndarray, list[list[int]]] | None:
    try:
        sk = json.loads(skeleton_json)
        verts = np.asarray(sk["vertices"], dtype=np.float64)
        polys = [list(map(int, p)) for p in sk["polygons"]]
        if verts.ndim != 2 or verts.shape[1] != 2 or not polys:
            return None
        return verts, polys
    except (ValueError, KeyError, TypeError):
        return None


def _dist_to_ring_edges(pts: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Min distance of each point to the ring's edges (vectorized)."""
    a = ring
    b = np.roll(ring, -1, axis=0)
    dx = (b[:, 0] - a[:, 0])[None, :]
    dy = (b[:, 1] - a[:, 1])[None, :]
    l2 = dx * dx + dy * dy
    px = pts[:, 0][:, None] - a[:, 0][None, :]
    py = pts[:, 1][:, None] - a[:, 1][None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.clip((px * dx + py * dy) / l2, 0.0, 1.0)
    t = np.where(l2 == 0, 0.0, t)
    ex = px - t * dx
    ey = py - t * dy
    return np.sqrt((ex * ex + ey * ey).min(axis=1))


def build_hipped_roof(
    outer_ring: np.ndarray,
    skeleton_json: str,
    min_height: float,
    roof_height: float,
    texture_id: int,
) -> dict[str, np.ndarray] | None:
    """Skeleton faces lofted: vertex z = minH + dist-to-edge / maxDist × roofH.

    Returns None if the skeleton is unusable (caller falls back to flat —
    reference semantics)."""
    sk = parse_skeleton(skeleton_json)
    if sk is None:
        return None
    verts, polys = sk
    ring = outer_ring[:-1] if len(outer_ring) > 1 and (outer_ring[0] == outer_ring[-1]).all() else outer_ring
    depth = _dist_to_ring_edges(verts, ring)
    max_d = depth.max()
    if max_d <= 0:
        return None
    z = min_height + depth / max_d * roof_height
    tris: list[np.ndarray] = []
    for poly in polys:
        if len(poly) < 3 or max(poly) >= len(verts):
            return None
        # fan-triangulate each (convex) skeleton face
        for i in range(1, len(poly) - 1):
            idx = [poly[0], poly[i], poly[i + 1]]
            tri = np.column_stack([verts[idx], z[idx]])
            tris.append(tri)
    tri_pts = np.stack(tris)
    n = np.cross(tri_pts[:, 1] - tri_pts[:, 0], tri_pts[:, 2] - tri_pts[:, 0])
    wrong = n[:, 2] < 0
    tri_pts[wrong] = tri_pts[wrong][:, ::-1, :]
    return _pack(tri_pts, texture_id)


def build_pyramidal_roof(
    outer_ring: np.ndarray,
    center: np.ndarray,
    min_height: float,
    roof_height: float,
    texture_id: int,
) -> dict[str, np.ndarray]:
    """Radial fan: each footprint edge + apex at center/minH+roofH."""
    ring = outer_ring[:-1] if len(outer_ring) > 1 and (outer_ring[0] == outer_ring[-1]).all() else outer_ring
    n = len(ring)
    apex = np.array([center[0], center[1], min_height + roof_height])
    a = np.column_stack([ring, np.full(n, min_height)])
    b = np.roll(a, -1, axis=0)
    tri_pts = np.stack([a, b, np.tile(apex, (n, 1))], axis=1)
    nrm = np.cross(tri_pts[:, 1] - tri_pts[:, 0], tri_pts[:, 2] - tri_pts[:, 0])
    wrong = nrm[:, 2] < 0
    tri_pts[wrong] = tri_pts[wrong][:, ::-1, :]
    return _pack(tri_pts, texture_id)


def build_skillion_roof(
    coords: np.ndarray,
    ring_starts: np.ndarray,
    ring_roles: np.ndarray,
    direction_deg: float | None,
    min_height: float,
    roof_height: float,
    texture_id: int,
) -> tuple[dict[str, np.ndarray], np.ndarray]:
    """Single-slope plane along ``direction`` (degrees, 0 = north/+y, per
    OSM convention; None → 0).  Returns (geometry, per-outer-vertex
    height_points) so walls can follow the slope."""
    tri_idx = triangulate_multipolygon(coords, ring_starts, ring_roles)
    d = math.radians(direction_deg if direction_deg is not None else 0.0)
    # downhill direction vector (OSM roof:direction points downslope)
    ux, uy = math.sin(d), math.cos(d)
    proj = coords[:, 0] * ux + coords[:, 1] * uy
    p0, p1 = proj.min(), proj.max()
    span = (p1 - p0) or 1.0
    # z high at the uphill side (opposite the direction vector)
    zs = min_height + (p1 - proj) / span * roof_height
    if len(tri_idx) == 0:
        return _empty(), zs
    tri_pts = np.concatenate(
        [coords[tri_idx], zs[tri_idx][:, :, None]], axis=2
    )
    n = np.cross(tri_pts[:, 1] - tri_pts[:, 0], tri_pts[:, 2] - tri_pts[:, 0])
    wrong = n[:, 2] < 0
    tri_pts[wrong] = tri_pts[wrong][:, ::-1, :]
    return _pack(tri_pts, texture_id), zs
