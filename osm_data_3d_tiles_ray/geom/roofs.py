"""Roof geometry builders (G7–G14, all 12 reference families) + dispatch
with the reference's flat fallback on failure
(``/root/reference/src/building/building-builder.ts:385-393``).

* flat — footprint earcut (``flat-roof-builders.ts:9-186``); also the
  G16 underside cap via ``flip``;
* hipped / mansard / gambrel / quadrupleSaltbox — straight-skeleton faces
  lofted by distance-to-edge, with the per-variant piecewise height remaps
  (``hipped-roof-builder.ts``, ``mansard-roof-builder.ts:7-8``,
  ``gambrel-roof-builder.ts:9-10``, ``quadruple-saltbox-roof-builder.ts:5-6``);
  skeletons come from the tag or the engine's own kernel (geom/skeleton.py);
* gabled — skeleton variant with 3-vertex end-face collapse to vertical
  gables (``gabled-roof-builder.ts:14-172``); oriented profile fallback;
* round / saltbox / oriented-gambrel — profile-extruded over the OMBB
  across-axis with the reference's exact profile constants
  (``oriented-*-roof-builder.ts``);
* dome / onion / pyramidal — lathe-style radial lofts
  (``dome/onion-roof-builder.ts``, ``pyramidal-roof-builder.ts``);
* skillion — single slope with wall height points
  (``skillion-roof-builder.ts:14-215``).

All builders take/return plain numpy SoA dicts — no Ray coupling; the
actor-pool stage in stages/build3d.py batches them.
"""

from __future__ import annotations

import json
import math

import numpy as np

from .fastroll import cross3, roll_m1, roll_m2

from .earcut import triangulate as _earcut_triangulate, triangulate_multipolygon
from .hull import ombb as _ombb

ROOF_TYPES_IMPLEMENTED = {
    "flat", "hipped", "pyramidal", "skillion", "dome", "onion", "round",
    "gabled", "gambrel", "saltbox", "mansard", "quadrupleSaltbox",
}  # all 12 reference roof families


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
    n = cross3(b - a, c - a)
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
    n = cross3(tri_pts[:, 1] - tri_pts[:, 0], tri_pts[:, 2] - tri_pts[:, 0])
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


def _face_convex(face: np.ndarray) -> bool:
    nxt = roll_m1(face)
    nxt2 = roll_m2(face)
    cr = (nxt[:, 0] - face[:, 0]) * (nxt2[:, 1] - nxt[:, 1]) - (
        nxt[:, 1] - face[:, 1]
    ) * (nxt2[:, 0] - nxt[:, 0])
    return not ((cr > 1e-12).any() and (cr < -1e-12).any())


def _dist_to_ring_edges(pts: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Min distance of each point to the ring's edges (vectorized)."""
    a = ring
    b = roll_m1(ring)
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


def mansard_remap(p: np.ndarray) -> np.ndarray:
    """Mansard depth→height remap (reference: mansard-roof-builder.ts:7-8,
    79-85 — splitProgress 0.3, edgeBumpFactor 0.3, bottom/top piecewise)."""
    split, bump = 0.3, 0.3
    bottom = p + (p / split) * bump
    top = p + ((1.0 - p) / (1.0 - split)) * bump
    return np.where(p < split, bottom, top)


def quadruple_saltbox_remap(p: np.ndarray) -> np.ndarray:
    """QuadrupleSaltbox depth→height remap (quadruple-saltbox-roof-builder.ts:
    5-6, 29-36 — splitProgress 0.5, bump 0: double slope then flat plateau)."""
    return np.where(p < 0.5, 2.0 * p, 1.0)


def gambrel_remap(p: np.ndarray) -> np.ndarray:
    """Gambrel skeleton-variant remap (gambrel-roof-builder.ts:9-10)."""
    split, bump = 0.1, 0.1
    bottom = p + (p / split) * bump
    top = p + ((1.0 - p) / (1.0 - split)) * bump
    return np.where(p < split, bottom, top)


def build_hipped_roof(
    outer_ring: np.ndarray,
    skeleton_json: str,
    min_height: float,
    roof_height: float,
    texture_id: int,
    remap=None,
    skeleton_offset: tuple[float, float] = (0.0, 0.0),
) -> dict[str, np.ndarray] | None:
    """Skeleton faces lofted: vertex z = minH + dist-to-edge / maxDist × roofH
    (optionally remapped — mansard/gambrel piecewise profiles).

    ``skeleton_offset`` is SUBTRACTED from the skeleton vertices — the
    reference shifts tag-provided (world-frame) skeletons into the tile
    frame the same way (``/root/reference/src/building/builder.ts:76-80``).
    Returns None if the skeleton is unusable (caller falls back to flat —
    reference semantics)."""
    sk = parse_skeleton(skeleton_json)
    if sk is None:
        return None
    verts, polys = sk
    if skeleton_offset != (0.0, 0.0):
        verts = verts - np.asarray(skeleton_offset)
    ring = outer_ring[:-1] if len(outer_ring) > 1 and (outer_ring[0] == outer_ring[-1]).all() else outer_ring
    depth = _dist_to_ring_edges(verts, ring)
    max_d = depth.max()
    if max_d <= 0:
        return None
    frac = depth / max_d
    if remap is not None:
        frac = np.clip(remap(frac), 0.0, 1.0)
    z = min_height + frac * roof_height
    tris: list[np.ndarray] = []
    for poly in polys:
        if len(poly) < 3 or max(poly) >= len(verts):
            return None
        face2d = verts[poly]
        if len(poly) == 3 or _face_convex(face2d):
            for i in range(1, len(poly) - 1):
                idx = [poly[0], poly[i], poly[i + 1]]
                tris.append(np.column_stack([verts[idx], z[idx]]))
        else:
            # non-convex skeleton face (concave footprints) → earcut it
            t = _earcut_triangulate(face2d)
            for a, b, c in t:
                idx = [poly[a], poly[b], poly[c]]
                tris.append(np.column_stack([verts[idx], z[idx]]))
    if not tris:
        return None
    tri_pts = np.stack(tris)
    n = cross3(tri_pts[:, 1] - tri_pts[:, 0], tri_pts[:, 2] - tri_pts[:, 0])
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
    b = roll_m1(a)
    tri_pts = np.stack([a, b, np.tile(apex, (n, 1))], axis=1)
    nrm = cross3(tri_pts[:, 1] - tri_pts[:, 0], tri_pts[:, 2] - tri_pts[:, 0])
    wrong = nrm[:, 2] < 0
    tri_pts[wrong] = tri_pts[wrong][:, ::-1, :]
    return _pack(tri_pts, texture_id)


def build_gabled_skeleton_roof(
    outer_ring: np.ndarray,
    skeleton_json_str: str,
    min_height: float,
    roof_height: float,
    texture_id: int,
    skeleton_offset: tuple[float, float] = (0.0, 0.0),
) -> dict[str, np.ndarray] | None:
    """Skeleton-based gabled roof (G9): 3-vertex end faces collapse — their
    skeleton vertex moves onto the face's edge, turning the end slope into a
    vertical gable triangle (reference: gabled-roof-builder.ts:14-172,
    line-intersection collapse at :70-94 + skirt gables).

    Returns None when unusable (caller falls back — reference semantics)."""
    sk = parse_skeleton(skeleton_json_str)
    if sk is None:
        return None
    verts, polys = sk
    if skeleton_offset != (0.0, 0.0):
        verts = verts - np.asarray(skeleton_offset)
    ring = (
        outer_ring[:-1]
        if len(outer_ring) > 1 and (outer_ring[0] == outer_ring[-1]).all()
        else outer_ring
    )
    k = len(ring)
    depth = _dist_to_ring_edges(verts, ring)
    max_d = depth.max()
    if max_d <= 0:
        return None
    z = min_height + depth / max_d * roof_height

    # count triangular faces per skeleton vertex (only ring-edge faces with
    # exactly one skeleton vertex are collapsible ends)
    end_faces = []
    sk_use = {}
    for fi, poly in enumerate(polys):
        if max(poly) >= len(verts):
            return None
        sk_verts = [p for p in poly if p >= k]
        for s in sk_verts:
            sk_use[s] = sk_use.get(s, 0) + 1
        if len(poly) == 3 and len(sk_verts) == 1:
            end_faces.append((fi, sk_verts[0]))
    # a vertex collapsible only if it is the end of exactly one triangle face
    collapse = {}
    skipped = set()
    for fi, s in end_faces:
        if sum(1 for fj, sj in end_faces if sj == s) != 1:
            continue
        poly = polys[fi]
        ring_pts = [p for p in poly if p < k]
        if len(ring_pts) != 2:
            continue
        a, b = verts[ring_pts[0]], verts[ring_pts[1]]
        ab = b - a
        ll = float(ab @ ab)
        if ll < 1e-18:
            continue
        t = float((verts[s] - a) @ ab) / ll
        proj = a + np.clip(t, 0.0, 1.0) * ab
        collapse[s] = proj
        skipped.add(fi)

    if not collapse:
        return None  # nothing gabled about this skeleton — use hipped path

    verts = verts.copy()
    for s, p in collapse.items():
        verts[s] = p

    tris: list[np.ndarray] = []
    for fi, poly in enumerate(polys):
        if fi in skipped:
            # vertical gable triangle: the two ring verts at roof base + the
            # (moved) ridge endpoint at its ridge height
            ring_pts = [p for p in poly if p < k]
            s = [p for p in poly if p >= k][0]
            a, b = ring_pts
            tri = np.array(
                [
                    [verts[a][0], verts[a][1], min_height],
                    [verts[b][0], verts[b][1], min_height],
                    [verts[s][0], verts[s][1], z[s]],
                ]
            )
            tris.append(tri)
            continue
        face2d = verts[poly]
        if len(poly) == 3 or _face_convex(face2d):
            for i in range(1, len(poly) - 1):
                idx = [poly[0], poly[i], poly[i + 1]]
                tris.append(np.column_stack([verts[idx], z[idx]]))
        else:
            for a_, b_, c_ in _earcut_triangulate(face2d):
                idx = [poly[a_], poly[b_], poly[c_]]
                tris.append(np.column_stack([verts[idx], z[idx]]))
    tri_pts = np.stack(tris)
    n = cross3(tri_pts[:, 1] - tri_pts[:, 0], tri_pts[:, 2] - tri_pts[:, 0])
    ln = np.linalg.norm(n, axis=1)
    keep = ln > 1e-12
    tri_pts = tri_pts[keep]
    n = n[keep]
    # fix orientation only for non-vertical faces (gables stay as emitted)
    wrong = n[:, 2] < -1e-12
    tri_pts[wrong] = tri_pts[wrong][:, ::-1, :]
    if not len(tri_pts):
        return None
    return _pack(tri_pts, texture_id)


# profile constants — verbatim from the reference's data-driven subclasses
# (SURVEY.md §2.7: profiles are data, not code)
PROFILE_GABLED = [(0.0, 0.0), (0.5, 1.0), (1.0, 0.0)]  # oriented-gabled-roof-builder.ts:5-9
PROFILE_GAMBREL = [  # oriented-gambrel-roof-builder.ts:5-11
    (0.0, 0.0), (0.15, 0.8), (0.5, 1.0), (0.85, 0.8), (1.0, 0.0),
]
PROFILE_SALTBOX = [(0.0, 0.0), (0.7, 1.0), (1.0, 0.2)]  # oriented-saltbox-roof-builder.ts:5-9
PROFILE_ROUND = [  # oriented-round-roof-builder.ts:5-25 (19-point sine arc)
    (0.0, 0.0),
    (0.00759612349389599, 0.17364817766693041),
    (0.03015368960704584, 0.3420201433256688),
    (0.0669872981077807, 0.5000000000000001),
    (0.116977778440511, 0.6427876096865394),
    (0.17860619515673037, 0.766044443118978),
    (0.25, 0.8660254037844387),
    (0.32898992833716567, 0.9396926207859084),
    (0.41317591116653485, 0.984807753012208),
    (0.5, 1.0),
    (0.5868240888334652, 0.984807753012208),
    (0.6710100716628343, 0.9396926207859084),
    (0.75, 0.8660254037844387),
    (0.8213938048432696, 0.766044443118978),
    (0.883022221559489, 0.6427876096865394),
    (0.9330127018922193, 0.5000000000000001),
    (0.9698463103929542, 0.3420201433256688),
    (0.9924038765061041, 0.17364817766693041),
    (1.0, 0.0),
]
# curved (lathe) profiles: (radius fraction from center, height fraction)
PROFILE_DOME = [  # dome-roof-builder.ts:5-16 (quarter circle)
    (0.0, 1.0),
    (0.17364817766693033, 0.984807753012208),
    (0.3420201433256687, 0.9396926207859084),
    (0.49999999999999994, 0.8660254037844387),
    (0.6427876096865393, 0.766044443118978),
    (0.766044443118978, 0.6427876096865394),
    (0.8660254037844386, 0.5000000000000001),
    (0.9396926207859083, 0.3420201433256688),
    (0.984807753012208, 0.17364817766693041),
    (1.0, 0.0),
]
PROFILE_ONION = [  # onion-roof-builder.ts:5-16
    (0.0, 1.0),
    (0.1111111111111111, 1.1470588235294117),
    (0.2222222222222222, 1.1764705882352942),
    (0.3333333333333333, 1.1470588235294117),
    (0.4444444444444444, 1.0),
    (0.5555555555555556, 0.7647058823529411),
    (0.6666666666666666, 0.4117647058823529),
    (0.7777777777777778, 0.15882352941176472),
    (0.8888888888888888, 0.03529411764705882),
    (1.0, 0.0),
]


def _is_convex(ring: np.ndarray) -> bool:
    k = len(ring)
    if k < 3:
        return False
    nxt = roll_m1(ring)
    nxt2 = roll_m2(ring)
    cr = (nxt[:, 0] - ring[:, 0]) * (nxt2[:, 1] - nxt[:, 1]) - (
        nxt[:, 1] - ring[:, 1]
    ) * (nxt2[:, 0] - nxt[:, 0])
    return not ((cr > 1e-12).any() and (cr < -1e-12).any())


def _clip_halfplane(poly, t, tmin: float, tmax: float):
    """Sutherland–Hodgman clip of a convex polygon to the slab
    ``tmin <= t <= tmax`` where t is a per-vertex linear coordinate.

    Operates on plain Python lists of (x, y) / t floats — ~5× faster than
    numpy small-array ops at footprint sizes.  Returns (points, ts) lists
    or None."""

    def clip(pts, tv, bound, keep_leq):
        out_p = []
        out_t = []
        k = len(pts)
        for i in range(k):
            ax, ay = pts[i]
            ta = tv[i]
            j = i + 1 if i + 1 < k else 0
            bx, by = pts[j]
            tb = tv[j]
            a_in = (ta <= bound) if keep_leq else (ta >= bound)
            b_in = (tb <= bound) if keep_leq else (tb >= bound)
            if a_in:
                out_p.append((ax, ay))
                out_t.append(ta)
            if a_in != b_in and tb != ta:
                f = (bound - ta) / (tb - ta)
                out_p.append((ax + (bx - ax) * f, ay + (by - ay) * f))
                out_t.append(bound)
        if len(out_p) < 3:
            return None
        return out_p, out_t

    r = clip(poly, t, tmax, True)
    if r is None:
        return None
    return clip(r[0], r[1], tmin, False)


def build_oriented_profile_roof(
    outer_ring: np.ndarray,
    min_height: float,
    roof_height: float,
    texture_id: int,
    profile: list[tuple[float, float]],
    orientation: str | None = None,
    direction_deg: float | None = None,
    respect_direction: bool = False,
) -> tuple[dict[str, np.ndarray], np.ndarray] | None:
    """Profile-extruded roof over a CONVEX footprint (G11).

    The profile spans the footprint's across-axis (OMBB shorter extent by
    default; ``orientation='across'`` swaps; an explicit ``direction`` wins
    when ``respect_direction``).  The footprint is sliced into slabs at the
    profile's t-breaks (reference ``splitPolygon``,
    ``src/building/roof/utils.ts:112-218``); each slab is planar-lofted.

    Returns (geometry, per-outer-vertex height points for the skirt walls)
    or None for concave footprints (caller falls back to flat).
    """
    ring = (
        outer_ring[:-1]
        if len(outer_ring) > 1 and (outer_ring[0] == outer_ring[-1]).all()
        else outer_ring
    )
    if not _is_convex(ring):
        return None
    if respect_direction and direction_deg is not None:
        d = math.radians(direction_deg)
        axis = np.array([math.sin(d), math.cos(d)])
    else:
        corners, _ = _ombb(ring)
        e0 = corners[1] - corners[0]
        e1 = corners[3] - corners[0]
        l0, l1 = np.linalg.norm(e0), np.linalg.norm(e1)
        # ridge along the longer box edge ⇒ profile across the shorter
        axis = e1 / l1 if l0 >= l1 else e0 / l0
        if orientation == "across":
            axis = e0 / l0 if l0 >= l1 else e1 / l1
    proj = ring @ axis
    pmin, pmax = proj.min(), proj.max()
    span = (pmax - pmin) or 1.0
    t = (proj - pmin) / span

    ring_list = [(float(p[0]), float(p[1])) for p in ring]
    t_list = [float(v) for v in t]
    tris: list[tuple] = []
    for (t0, h0), (t1, h1) in zip(profile[:-1], profile[1:]):
        band = _clip_halfplane(ring_list, t_list, t0, t1)
        if band is None:
            continue
        poly, tv = band
        dz = (t1 - t0) or 1.0
        hscale = (h1 - h0) / dz
        p3 = [
            (x, y, min_height + (h0 + (tt - t0) * hscale) * roof_height)
            for (x, y), tt in zip(poly, tv)
        ]
        first = p3[0]
        for i in range(1, len(p3) - 1):
            tris.append((first, p3[i], p3[i + 1]))
    if not tris:
        return None
    tri_pts = np.asarray(tris, dtype=np.float64)
    n = cross3(tri_pts[:, 1] - tri_pts[:, 0], tri_pts[:, 2] - tri_pts[:, 0])
    wrong = n[:, 2] < 0
    tri_pts[wrong] = tri_pts[wrong][:, ::-1, :]

    # skirt: walls rise to the roof surface at each footprint vertex; the
    # wall builder interpolates node→node LINEARLY, but the true profile is
    # piecewise-linear with kinks at the interior t-splits — the reference
    # inserts ring∩split-line points into the skirt polyline
    # (oriented-roof-builder.ts:389-473).  Emit the missing difference
    # wedges (polyline-vs-chord, in the wall plane) per crossing segment.
    prof_t = np.array([p[0] for p in profile])
    prof_h = np.array([p[1] for p in profile])
    hp_ring = min_height + np.interp(t, prof_t, prof_h) * roof_height
    geom = _pack(tri_pts, texture_id)

    splits = prof_t[1:-1]
    if len(splits):
        k = len(ring)
        wedge_tris: list[tuple] = []
        for i in range(k):
            j = (i + 1) % k
            ta, tb = t[i], t[j]
            lo, hi = (ta, tb) if ta <= tb else (tb, ta)
            ts = splits[(splits > lo) & (splits < hi)]
            if not len(ts):
                continue
            f = (ts - ta) / (tb - ta)
            order = np.argsort(f)
            f = f[order]
            ts = ts[order]
            pa, pb = ring[i], ring[j]
            xs = pa[None, :] + f[:, None] * (pb - pa)[None, :]
            true_h = min_height + np.interp(ts, prof_t, prof_h) * roof_height
            # fan over [node_i, crossings..., node_j]; the chord closes it
            pts = np.concatenate(
                [
                    [[pa[0], pa[1], hp_ring[i]]],
                    np.column_stack([xs, true_h]),
                    [[pb[0], pb[1], hp_ring[j]]],
                ]
            )
            for m in range(1, len(pts) - 1):
                wedge_tris.append((pts[0], pts[m], pts[m + 1]))
        if wedge_tris:
            wt = np.asarray(wedge_tris, dtype=np.float64)
            wm = wt.reshape(-1, 3)
            # outward wall normal per segment triangle (ring is CCW)
            d = wt[:, 2, :2] - wt[:, 0, :2]
            nrm2 = np.column_stack([d[:, 1], -d[:, 0]])
            ln = np.linalg.norm(nrm2, axis=1)
            ln[ln == 0] = 1.0
            nrm2 /= ln[:, None]
            wn = np.repeat(
                np.column_stack([nrm2, np.zeros(len(nrm2))]), 3, axis=0
            )
            geom = {
                "position": np.concatenate([geom["position"], wm.astype(np.float32)]),
                "uv": np.concatenate(
                    [geom["uv"], (wm[:, :2] * 0.1).astype(np.float32)]
                ),
                "normal": np.concatenate([geom["normal"], wn.astype(np.float32)]),
                "texture_id": np.concatenate(
                    [
                        geom["texture_id"],
                        np.full(len(wm), texture_id, dtype=np.uint8),
                    ]
                ),
            }

    if len(outer_ring) != len(ring):  # closed input: restore the duplicate
        hp_ring = np.concatenate([hp_ring, hp_ring[:1]])
    return geom, hp_ring


def build_curved_roof(
    outer_ring: np.ndarray,
    center: np.ndarray,
    min_height: float,
    roof_height: float,
    texture_id: int,
    profile: list[tuple[float, float]],
) -> dict[str, np.ndarray]:
    """Lathe-style curved roof (G12): the footprint ring is scaled toward
    ``center`` by each profile step's radius fraction and lofted
    (dome/onion/pyramidal — reference curved-roof-builder.ts:15-315)."""
    ring = (
        outer_ring[:-1]
        if len(outer_ring) > 1 and (outer_ring[0] == outer_ring[-1]).all()
        else outer_ring
    )
    k = len(ring)
    rel = ring - center
    # profile ordered center→rim: (0, htop) ... (1, 0); loft rim-inward
    tris: list[np.ndarray] = []
    for (r0, h0), (r1, h1) in zip(profile[:-1], profile[1:]):
        ra = center + rel * r0
        rb = center + rel * r1
        za = min_height + h0 * roof_height
        zb = min_height + h1 * roof_height
        a = np.column_stack([ra, np.full(k, za)])
        b = np.column_stack([rb, np.full(k, zb)])
        a2 = roll_m1(a)
        b2 = roll_m1(b)
        if r0 == 0.0:
            tris.append(np.stack([a, b, b2], axis=1))
        else:
            tris.append(np.stack([a, b, b2], axis=1))
            tris.append(np.stack([a, b2, a2], axis=1))
    tri_pts = np.concatenate(tris, axis=0)
    # drop degenerate triangles
    n = cross3(tri_pts[:, 1] - tri_pts[:, 0], tri_pts[:, 2] - tri_pts[:, 0])
    keep = np.linalg.norm(n, axis=1) > 1e-12
    tri_pts = tri_pts[keep]
    n = n[keep]
    wrong = n[:, 2] < 0
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
    n = cross3(tri_pts[:, 1] - tri_pts[:, 0], tri_pts[:, 2] - tri_pts[:, 0])
    wrong = n[:, 2] < 0
    tri_pts[wrong] = tri_pts[wrong][:, ::-1, :]
    return _pack(tri_pts, texture_id), zs


def _clip_cell(poly: list[tuple[float, float]], iu: int, iv: int) -> list[tuple[float, float]]:
    """Sutherland–Hodgman clip of a polygon to [iu,iu+1)×[iv,iv+1)
    (reference clipRange rules: lower edges inclusive, upper strict —
    flat-roof-builders.ts:77-117)."""

    def clip_axis(pts, axis, edge, keep_greater, strict):
        out = []
        m = len(pts)
        for i in range(m):
            ax, ay = pts[i]
            bx, by = pts[(i + 1) % m]
            a = ax if axis == 0 else ay
            b = bx if axis == 0 else by
            ina = (a > edge if strict else a >= edge) if keep_greater else (
                a < edge if strict else a <= edge
            )
            inb = (b > edge if strict else b >= edge) if keep_greater else (
                b < edge if strict else b <= edge
            )
            if ina and inb:
                out.append((bx, by))
            elif ina and not inb:
                t = (edge - a) / (b - a)
                out.append(
                    (edge, ay + t * (by - ay)) if axis == 0 else (ax + t * (bx - ax), edge)
                )
            elif not ina and inb:
                t = (edge - a) / (b - a)
                out.append(
                    (edge, ay + t * (by - ay)) if axis == 0 else (ax + t * (bx - ax), edge)
                )
                out.append((bx, by))
        return out

    poly = clip_axis(poly, 0, iu, True, False)
    if len(poly) >= 3:
        poly = clip_axis(poly, 0, iu + 1, False, True)
    if len(poly) >= 3:
        poly = clip_axis(poly, 1, iv, True, False)
    if len(poly) >= 3:
        poly = clip_axis(poly, 1, iv + 1, False, True)
    return poly


def build_flat_roof_clipped(
    coords: np.ndarray,
    ring_starts: np.ndarray,
    ring_roles: np.ndarray,
    z: float,
    texture_id: int,
    scale_xy: tuple[float, float],
    flip: bool = False,
) -> dict[str, np.ndarray] | None:
    """Reference-parity flat roof (flat-roof-builders.ts:30-180): UVs are
    the footprint projected into its OMBB frame divided by the material's
    texture scale (metres per tile); the triangulation is clipped to
    integer UV cells (Sutherland–Hodgman) so every emitted triangle lives
    inside ONE texture tile with exact local [0,1] UVs — no wrap seams —
    and positions are re-derived from the clipped UVs via the inverse
    OMBB transform.

    Costs ~one tessellation per texture tile covered (the reference pays
    the same); engine default keeps the cheaper whole-batch flat path —
    enable with ``Build3D(flat_uv_clip=True)``.
    """
    ends = np.concatenate([ring_starts[1:], [len(coords)]])
    outer = coords[ring_starts[0] : ends[0]]
    ring = outer[:-1] if len(outer) > 1 and (outer[0] == outer[-1]).all() else outer
    if len(ring) < 3:
        return None
    corners, _ = _ombb(ring)
    origin = corners[1]
    v0 = corners[0] - origin
    v1 = corners[2] - origin
    l0, l1 = np.linalg.norm(v0), np.linalg.norm(v1)
    if l0 == 0 or l1 == 0:
        return None
    e0, e1 = v0 / l0, v1 / l1
    sx, sy = float(scale_xy[0]), float(scale_xy[1])
    rel = coords - origin
    uv_all = np.column_stack([rel @ e0 / sx, rel @ e1 / sy])

    tri_idx = triangulate_multipolygon(uv_all, ring_starts, ring_roles)
    if len(tri_idx) == 0:
        return None

    out_pos: list[np.ndarray] = []
    out_uv: list[np.ndarray] = []
    for tri in tri_idx:
        tuv = [tuple(uv_all[j]) for j in tri]
        us = [p[0] for p in tuv]
        vs = [p[1] for p in tuv]
        cu0, cu1 = int(np.floor(min(us))), int(np.ceil(max(us)))
        cv0, cv1 = int(np.floor(min(vs))), int(np.ceil(max(vs)))
        for iu in range(cu0, cu1):
            for iv in range(cv0, cv1):
                poly = _clip_cell(tuv, iu, iv)
                if len(poly) < 3:
                    continue
                local = np.asarray(poly) - (iu, iv)
                cell_tris = _earcut_triangulate(local)
                if len(cell_tris) == 0:
                    continue
                for ct in cell_tris:
                    lpts = local[ct]
                    # inverse OMBB: world = origin + (u*sx)·e0 + (v*sy)·e1
                    up = (lpts[:, 0] + iu) * sx
                    vp = (lpts[:, 1] + iv) * sy
                    world = origin + up[:, None] * e0 + vp[:, None] * e1
                    out_pos.append(np.column_stack([world, np.full(3, z)]))
                    out_uv.append(lpts)
    if not out_pos:
        return None
    tri_pts = np.stack(out_pos)
    uv_tris = np.stack(out_uv)
    # orientation: +z for roofs, -z for the flipped underside cap
    nrm = cross3(tri_pts[:, 1] - tri_pts[:, 0], tri_pts[:, 2] - tri_pts[:, 0])
    want = -1.0 if flip else 1.0
    wrong = nrm[:, 2] * want < 0
    tri_pts[wrong] = tri_pts[wrong][:, ::-1, :]
    uv_tris[wrong] = uv_tris[wrong][:, ::-1, :]
    m = tri_pts.reshape(-1, 3)
    normals = np.zeros((len(m), 3), np.float32)
    normals[:, 2] = want
    return {
        "position": m.astype(np.float32),
        "uv": uv_tris.reshape(-1, 2).astype(np.float32),
        "normal": normals,
        "texture_id": np.full(len(m), texture_id, dtype=np.uint8),
    }
