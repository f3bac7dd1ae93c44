"""Kernel tests: earcut vs area oracle, OMBB vs brute force, polylabel,
walls vertex-count semantics vs hand-derived counts."""

import numpy as np
import pytest

from osm_data_3d_tiles_ray.geom.earcut import triangulate, triangulate_multipolygon
from osm_data_3d_tiles_ray.geom.hull import convex_hull, ombb
from osm_data_3d_tiles_ray.geom.polylabel import pole_of_inaccessibility
from osm_data_3d_tiles_ray.geom.rings import ring_signed_areas
from osm_data_3d_tiles_ray.geom.walls import build_walls


def _tri_area(pts, tris):
    a, b, c = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
    return 0.5 * np.abs(
        (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
        - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
    ).sum()


def test_earcut_preserves_area_random_polygons():
    rng = np.random.default_rng(11)
    for _ in range(100):
        k = rng.integers(4, 14)
        r = 1 + rng.random(k) * 3
        ang = -np.arange(k) / k * 2 * np.pi + rng.random() * 6
        poly = np.stack([np.cos(ang) * r, np.sin(ang) * r], 1)
        truth = abs(ring_signed_areas(poly, np.array([0, len(poly)]))[0])
        t = triangulate(poly)
        assert _tri_area(poly, t) == pytest.approx(truth, rel=1e-12)
        assert len(t) == k - 2  # simple polygon: exactly n-2 triangles


def test_earcut_with_hole():
    outer = np.array([[0, 0], [0, 4], [4, 4], [4, 0]], float)
    hole = np.array([[1, 1], [1, 3], [3, 3], [3, 1]], float)
    t = triangulate(outer, [hole])
    assert _tri_area(np.vstack([outer, hole]), t) == pytest.approx(12.0)


def test_earcut_multipolygon_layout_closed_rings():
    k = 6
    ang = -np.arange(k) / k * 2 * np.pi
    ring = np.stack([np.cos(ang) * 10, np.sin(ang) * 10], 1)
    ringc = np.vstack([ring, ring[:1]])
    inner = (ring * 0.4)[::-1]
    innerc = np.vstack([inner, inner[:1]])
    coords = np.vstack([ringc, innerc])
    tris = triangulate_multipolygon(
        coords, np.array([0, len(ringc)]), np.array([0, 1])
    )
    expect = 0.5 * k * np.sin(2 * np.pi / k) * 100 * (1 - 0.16)
    assert _tri_area(coords, tris) == pytest.approx(expect, rel=1e-12)


def test_ombb_vs_bruteforce_rotation_sweep():
    rng = np.random.default_rng(5)
    for _ in range(30):
        pts = rng.random((20, 2)) * 10
        _, area = ombb(pts)
        # brute force: sweep many angles, compute AABB area of rotated pts
        best = np.inf
        for th in np.linspace(0, np.pi / 2, 2000):
            c, s = np.cos(th), np.sin(th)
            x = pts @ np.array([c, -s])
            y = pts @ np.array([s, c])
            best = min(best, (x.max() - x.min()) * (y.max() - y.min()))
        assert area <= best + 1e-9
        assert area >= best * 0.999  # dense sweep ≈ optimum


def test_ombb_exact_for_rotated_rect():
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    rect = np.array([[0, 0], [6, 0], [6, 2], [0, 2]], float) @ R.T
    _, area = ombb(rect)
    assert area == pytest.approx(12.0, abs=1e-9)


def test_convex_hull_contains_all_points():
    rng = np.random.default_rng(9)
    pts = rng.standard_normal((50, 2))
    hull = convex_hull(pts)
    # every point inside or on hull: check via cross products (hull is CCW)
    for p in pts:
        for i in range(len(hull)):
            a, b = hull[i], hull[(i + 1) % len(hull)]
            cross = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
            assert cross >= -1e-9


def test_polylabel_square_center():
    x, y, d = pole_of_inaccessibility(
        [np.array([[0, 0], [0, 4], [4, 4], [4, 0]], float)], precision=0.01
    )
    assert (x, y) == pytest.approx((2, 2), abs=0.05)
    assert d == pytest.approx(2.0, abs=0.05)


SQ = np.array([[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]], float)  # closed unit square


@pytest.mark.parametrize(
    "levels,window_width,expect",
    [
        (2.0, 6.08, 48),   # 4 edges × 1 subseg × 2 levels × 6
        (2.5, 6.08, 72),   # ceil(2.5) = 3 level slices
        (2.0, 0.5, 96),    # windowCount=2 per edge → 2 subsegs each
        (0.0, 6.08, 0),    # no levels → no walls
    ],
)
def test_walls_vertex_counts(levels, window_width, expect):
    out = build_walls(
        SQ, min_height=0.0, height=8.0, levels=levels, window_width=window_width,
        texture_id_window=1, texture_id_wall=0,
    )
    assert len(out["position"]) == expect


def test_walls_geometry_heights():
    out = build_walls(
        SQ, min_height=2.0, height=10.0, levels=2.0, window_width=6.08,
        texture_id_window=1, texture_id_wall=0,
    )
    z = out["position"][:, 2]
    assert z.min() == pytest.approx(2.0)
    assert z.max() == pytest.approx(10.0)
    # wall normals are horizontal unit vectors
    n = out["normal"]
    assert np.allclose(n[:, 2], 0)
    assert np.allclose(np.linalg.norm(n, axis=1), 1.0)


def test_walls_smooth_run_grouping():
    # regular octagon: interior angle 135° → adjacent-edge turn 45° > 30° ⇒
    # all corners non-smooth, each edge its own UV run
    k = 8
    ang = -np.arange(k) / k * 2 * np.pi
    ring = np.stack([np.cos(ang) * 10, np.sin(ang) * 10], 1)
    ringc = np.vstack([ring, ring[:1]])
    out = build_walls(
        ringc, 0.0, 4.0, levels=1.0, window_width=1e9,
        texture_id_window=1, texture_id_wall=0,
    )
    assert len(out["position"]) == k * 6
    # 16-gon: turn 22.5° < 30° ⇒ all smooth ⇒ one run around the whole ring
    k = 16
    ang = -np.arange(k) / k * 2 * np.pi
    ring = np.stack([np.cos(ang) * 10, np.sin(ang) * 10], 1)
    ringc = np.vstack([ring, ring[:1]])
    out = build_walls(
        ringc, 0.0, 4.0, levels=1.0, window_width=3.0,
        texture_id_window=1, texture_id_wall=0,
    )
    perimeter = 16 * np.linalg.norm(ring[1] - ring[0])
    windows = round(perimeter / 3.0)
    # windowed run split at ~every integer boundary: ≥ windows subsegments
    assert len(out["position"]) >= windows * 6


def test_atlas_uv_transform_reference_math():
    from osm_data_3d_tiles_ray.tables.atlas import apply_atlas_uv, tile_uv_transform, uv_transform_table

    # exact reference constants: atlas 2580, tile 512, pad 2, 5 cols, eps 2px
    (uo, vo), (us, vs) = tile_uv_transform(0, 4 * 512)  # top-left frame
    assert uo == pytest.approx((2 + 2) / 2580)
    assert us == pytest.approx(512 / 2580 - 4 / 2580)
    (uo2, vo2), _ = tile_uv_transform(512, 4 * 512)
    assert uo2 == pytest.approx((2 + 516 + 2) / 2580)

    table = uv_transform_table()
    uv = np.array([[0.0, 0.0], [0.5, 0.5], [0.999, 1.0]])
    tid = np.array([0, 1, 2], dtype=np.uint8)
    out = apply_atlas_uv(uv, tid, table)
    # all outputs inside [0, 1] and inside their frame
    assert (out >= 0).all() and (out <= 1).all()
    for j in range(3):
        t = table[tid[j]]
        assert t[0] - 1e-9 <= out[j, 0] <= t[0] + t[2] + 1e-9
    # uv == 1.0 (top edge of every wall quad) maps to the frame's FAR edge,
    # not re-fracted onto its minimum (reference applies offset + uv*scale
    # with no re-fract, walls-builder.ts:121-136); uv == 0 stays at the
    # near edge; unbounded flat-roof UVs wrap per integer tile.
    t2 = table[2]
    assert out[2, 1] == pytest.approx(t2[1] + 1.0 * t2[3])
    assert out[0, 0] == pytest.approx(table[0][0])
    wrap = apply_atlas_uv(np.array([[2.25, 3.0]]), np.array([0]), table)
    t0 = table[0]
    assert wrap[0, 0] == pytest.approx(t0[0] + 0.25 * t0[2])
    assert wrap[0, 1] == pytest.approx(t0[1] + 1.0 * t0[3])
