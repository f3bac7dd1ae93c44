"""Walls extrusion kernel (G6).

Faithful port of the reference's wall semantics
(``/root/reference/src/building/walls-builder.ts``):

* closed-ring handling: drop the first vertex when first == last (``:38-45``);
* per-vertex edge smoothness at 30° (``:8,213-235``), list rotated to start
  at the first non-smooth vertex (``:49-60``);
* window-width UV quantization per smooth wall run:
  ``windowCount = round(len / windowWidth)``, segments rescaled by the
  actual window width (``:297-340``);
* sub-segment split at integer UV boundaries (``:238-264``);
* vertical repetition: ``for iy in 0..levels`` (float ⇒ ceil(levels)
  iterations; ``levels < 1`` stretches one tile) each emitting 2 CCW
  triangles = 6 vertices (``:129-174``);
* optional per-vertex ``height_points`` (skirt walls with interpolated
  heights, ``:101-119``).

The atlas UV transform is identity here (the reference's texture-atlas
frame lookup ``getTileUVTransform`` is applied as per-actor state in
stages/build3d via tables/atlas.py; geometry semantics are unaffected).

Documented quirk decision (SURVEY.md §7.4): the reference's cut-array
construction (``:250-253``) does NOT dedup the first integer boundary, so
a wall run starting exactly on an integer UV emits a zero-width degenerate
quad; this engine dedups consecutive equal cuts (clean semantics — no
degenerate geometry), which can make vertex counts differ from a literal
reading of the reference by one quad per wall run.
"""

from __future__ import annotations

import math

import numpy as np

from ..constants import SMOOTH_NORMALS_THRESHOLD_DEG

_COS_SMOOTH = math.cos(math.radians(SMOOTH_NORMALS_THRESHOLD_DEG))


def _edge_smoothness(v: np.ndarray, is_closed: bool) -> np.ndarray:
    n = len(v)
    nxt = np.roll(v, -1, axis=0)
    prv = np.roll(v, 1, axis=0)
    seg = nxt - v
    pseg = v - prv
    with np.errstate(invalid="ignore", divide="ignore"):
        seg_n = seg / np.linalg.norm(seg, axis=1, keepdims=True)
        pseg_n = pseg / np.linalg.norm(pseg, axis=1, keepdims=True)
    dot = (seg_n * pseg_n).sum(axis=1)
    smooth = dot > _COS_SMOOTH
    if not is_closed:
        smooth[0] = False
        smooth[-1] = False
    return smooth


def build_walls(
    vertices: np.ndarray,
    min_height: float,
    height: float,
    levels: float,
    window_width: float,
    texture_id_window: int,
    texture_id_wall: int,
    height_points: np.ndarray | None = None,
) -> dict[str, np.ndarray]:
    """One ring → wall geometry SoA dict.

    Returns ``{"position": (m,3) f32, "uv": (m,2) f32, "normal": (m,3) f32,
    "texture_id": (m,) u8}`` with m = 6 × n_subsegments × ceil(levels).
    """
    v = np.asarray(vertices, dtype=np.float64)
    hp = None if height_points is None else np.asarray(height_points, dtype=np.float64)
    is_closed = False
    if len(v) > 1 and (v[0] == v[-1]).all():
        v = v[1:]
        if hp is not None:
            hp = hp[1:]
        is_closed = True
    n = len(v)
    if n < 2:
        return _empty()

    smooth = _edge_smoothness(v, is_closed)
    first_ns = int(np.argmax(~smooth)) if (~smooth).any() else 0
    if first_ns > 0:
        v = np.roll(v, -first_ns, axis=0)
        smooth = np.roll(smooth, -first_ns)
        if hp is not None:
            hp = np.roll(hp, -first_ns)

    seg_count = n if is_closed else n - 1
    nxt = np.roll(v, -1, axis=0)[:seg_count]
    seg_vec = nxt - v[:seg_count]
    seg_len = np.linalg.norm(seg_vec, axis=1)

    # --- getWalls: cumulative UV progress with resets at non-smooth verts
    uv_prog = np.empty((seg_count, 2))
    cur = 0.0
    for i in range(seg_count):
        next_smooth = smooth[i + 1] if i + 1 < n else smooth[0]
        uv_prog[i] = (cur, cur + seg_len[i])
        cur = 0.0 if not next_smooth else cur + seg_len[i]

    walls = np.empty((seg_count, 2))
    has_window = np.zeros(seg_count, dtype=bool)
    windows_progress = 0.0
    run_start = 0
    for i in range(seg_count):
        is_last = i + 1 >= seg_count or uv_prog[i + 1, 0] == 0.0
        if not is_last:
            continue
        wall_len = uv_prog[i, 1]
        window_count = math.floor(wall_len / window_width + 0.5)  # JS round
        if window_count > 0:
            actual = wall_len / window_count
            walls[run_start : i + 1] = uv_prog[run_start : i + 1] / actual
            has_window[run_start : i + 1] = True
        else:
            walls[run_start : i + 1] = uv_prog[run_start : i + 1] / window_width
        walls[run_start : i + 1] += windows_progress
        windows_progress = math.floor(windows_progress + window_count)
        run_start = i + 1

    # --- split each wall segment at integer UV boundaries
    positions: list[np.ndarray] = []
    uvs: list[np.ndarray] = []
    normals: list[np.ndarray] = []
    tex_ids: list[np.ndarray] = []

    n_levels = max(0, math.ceil(levels)) if levels > 0 else 0
    if levels > 0 and n_levels == 0:
        n_levels = 1

    for i in range(seg_count):
        u0, u1 = walls[i]
        cuts = [u0]
        b = math.ceil(u0)
        while b <= math.floor(u1):
            if b != cuts[-1]:
                cuts.append(float(b))
            b += 1
        if cuts[-1] != u1:
            cuts.append(u1)
        a2 = v[i]
        b2 = v[(i + 1) % n] if is_closed or i + 1 < n else None
        if b2 is None:
            continue
        seg_l = seg_len[i]
        if seg_l == 0:
            continue
        dirv = seg_vec[i] / seg_l
        # wall-plane normal (z-up): perpendicular to the edge, unit length
        nrm = np.array([-(b2[1] - a2[1]), (b2[0] - a2[0]), 0.0]) / seg_l

        raw0, raw1 = walls[i]
        total_u = raw1 - raw0
        uv_to_ws = seg_l / total_u if total_u != 0 else 0.0

        if hp is not None:
            z_a = hp[i] - min_height
            z_b = (hp[i + 1] if i + 1 < len(hp) else hp[0]) - min_height
        else:
            z_a = height - min_height
            z_b = height - min_height

        tex_window = texture_id_window if has_window[i] else texture_id_wall

        for k in range(len(cuts) - 1):
            su0, su1 = cuts[k], cuts[k + 1]
            off_ws = (su0 - raw0) * uv_to_ws
            width_ws = (su1 - su0) * uv_to_ws
            p0 = a2 + dirv * off_ws
            p1 = a2 + dirv * (off_ws + width_ws)
            a0 = off_ws / seg_l
            a1 = (off_ws + width_ws) / seg_l
            h0 = z_a + (z_b - z_a) * a0
            h1 = z_a + (z_b - z_a) * a1
            f0 = ((su0 % 1) + 1) % 1
            f1 = ((su1 % 1) + 1) % 1
            if f1 == 0:
                f1 = 1.0
            for iy in range(n_levels):
                v0 = iy / levels
                v1 = (iy + 1) / levels
                if levels < 1:
                    v1 = 1.0
                y0b = min_height + h0 * v0
                y1b = min_height + h1 * v0
                y0t = min_height + h0 * v1
                y1t = min_height + h1 * v1
                positions.append(
                    np.array(
                        [
                            [p1[0], p1[1], y1b],
                            [p0[0], p0[1], y0b],
                            [p0[0], p0[1], y0t],
                            [p1[0], p1[1], y1b],
                            [p0[0], p0[1], y0t],
                            [p1[0], p1[1], y1t],
                        ]
                    )
                )
                uvs.append(
                    np.array(
                        [[f1, 0.0], [f0, 0.0], [f0, 1.0], [f1, 0.0], [f0, 1.0], [f1, 1.0]]
                    )
                )
                normals.append(np.tile(nrm, (6, 1)))
                tex_ids.append(np.full(6, tex_window, dtype=np.uint8))

    if not positions:
        return _empty()
    return {
        "position": np.concatenate(positions).astype(np.float32),
        "uv": np.concatenate(uvs).astype(np.float32),
        "normal": np.concatenate(normals).astype(np.float32),
        "texture_id": np.concatenate(tex_ids),
    }


def _empty() -> dict[str, np.ndarray]:
    return {
        "position": np.empty((0, 3), np.float32),
        "uv": np.empty((0, 2), np.float32),
        "normal": np.empty((0, 3), np.float32),
        "texture_id": np.empty(0, np.uint8),
    }


def wall_vertex_count(
    vertices: np.ndarray,
    levels: float,
    window_width: float,
) -> int:
    """Closed-form count for tests: 6 × n_subsegments × ceil(levels)."""
    out = build_walls(
        vertices, 0.0, 4.0, levels, window_width, texture_id_window=1, texture_id_wall=0
    )
    return len(out["position"])
