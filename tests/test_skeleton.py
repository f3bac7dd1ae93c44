"""Straight-skeleton kernel tests (G3): analytic cases + area conservation,
and the tile-frame regression for tag-provided skeletons."""

import numpy as np
import pytest

from osm_data_3d_tiles_ray.geom.hull import convex_hull
from osm_data_3d_tiles_ray.geom.skeleton import compute_straight_skeleton, skeleton_json


def poly_area(pts):
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def test_square_center_point():
    sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)
    v, f = compute_straight_skeleton(sq)
    assert len(f) == 4
    sk = v[4:]
    assert np.allclose(sk, [2, 2])


def test_rectangle_ridge():
    rect = np.array([[0, 0], [10, 0], [10, 4], [0, 4]], float)
    v, f = compute_straight_skeleton(rect)
    sk = np.unique(np.round(v[4:], 6), axis=0)
    assert len(sk) == 2
    assert {tuple(p) for p in sk} == {(2.0, 2.0), (8.0, 2.0)}
    total = sum(poly_area(v[face]) for face in f)
    assert total == pytest.approx(40.0, rel=1e-9)


def test_regular_polygon_center_fan():
    k = 7
    ang = np.arange(k) / k * 2 * np.pi
    ring = np.stack([np.cos(ang) * 5, np.sin(ang) * 5], 1)
    v, f = compute_straight_skeleton(ring)
    assert np.allclose(v[k:], 0.0, atol=1e-6)


def test_degenerate_returns_none():
    collinear = np.array([[0, 0], [1, 0], [2, 0]], float)
    assert compute_straight_skeleton(collinear) is None
    assert skeleton_json(collinear) is None
    two = np.array([[0, 0], [1, 1]], float)
    assert compute_straight_skeleton(two) is None


def test_random_convex_area_conservation():
    rng = np.random.default_rng(17)
    checked = 0
    for _ in range(100):
        pts = rng.uniform(-10, 10, (rng.integers(4, 15), 2))
        h = convex_hull(pts)
        if len(h) < 3:
            continue
        out = compute_straight_skeleton(h)
        assert out is not None
        v, f = out
        total = sum(poly_area(v[face]) for face in f)
        assert total == pytest.approx(poly_area(h), rel=1e-6)
        checked += 1
    assert checked > 80


def test_cw_input_normalized():
    sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)[::-1]
    v, f = compute_straight_skeleton(sq)
    assert v is not None and len(f) == 4


def test_pipeline_roofs_stay_in_tile_frame():
    """Regression: tag-provided skeletons are world-frame and must be shifted
    (the reference shifts them, builder.ts:76-80)."""
    import warnings

    warnings.filterwarnings("ignore")
    from osm_data_3d_tiles_ray.stages.build3d import Build3DStats
    from osm_data_3d_tiles_ray.stages.parse import parse_documents
    from osm_data_3d_tiles_ray.synth.generator import generate_shard

    docs, _ = generate_shard(0, 800)
    out = Build3DStats()(parse_documents(docs, keep_spans=False))
    mx = np.array(out.column("max_x").to_pylist(), dtype=float)
    mn = np.array(out.column("min_x").to_pylist(), dtype=float)
    ok = np.isfinite(mx)
    # tile frame: everything within ~2 tile widths of the tile center
    assert np.abs(mx[ok]).max() < 1300
    assert np.abs(mn[ok]).max() < 1300


def test_l_shape_split_events():
    L = np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]], float)
    out = compute_straight_skeleton(L)
    assert out is not None
    v, f = out
    total = sum(poly_area(v[face]) for face in f)
    assert total == pytest.approx(3.0, rel=1e-9)
    sk = {tuple(np.round(p, 6)) for p in v[6:]}
    assert sk == {(0.5, 0.5), (0.5, 1.5), (1.5, 0.5)}


def _self_intersects(poly):
    def cr(o, p, q):
        return (p[0] - o[0]) * (q[1] - o[1]) - (p[1] - o[1]) * (q[0] - o[0])

    n = len(poly)
    for i in range(n):
        for j in range(i + 1, n):
            if abs(i - j) in (0, 1, n - 1):
                continue
            a, b, c, d = poly[i], poly[(i + 1) % n], poly[j], poly[(j + 1) % n]
            d1, d2, d3, d4 = cr(c, d, a), cr(c, d, b), cr(a, b, c), cr(a, b, d)
            if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
                return True
    return False


def test_random_concave_polygons_all_simple_succeed_area_exact():
    """Every SIMPLE polygon gets an area-exact skeleton; self-intersecting
    inputs (the generator around an exterior origin can produce them) are
    cleanly refused — zero wrong answers either way."""
    rng = np.random.default_rng(23)
    ok = refused = 0
    for _ in range(150):
        k = int(rng.integers(5, 12))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        r = rng.uniform(2, 10, k)
        poly = np.stack([np.cos(ang) * r, np.sin(ang) * r], 1)
        out = compute_straight_skeleton(poly)
        if out is None:
            assert _self_intersects(poly)  # only invalid input is refused
            refused += 1
            continue
        v, f = out
        total = sum(poly_area(v[face]) for face in f)
        assert total == pytest.approx(poly_area(poly), rel=1e-4)
        ok += 1
    assert ok > 130


def test_concave_hipped_roof_builds():
    import json

    from osm_data_3d_tiles_ray.geom.roofs import build_hipped_roof
    from osm_data_3d_tiles_ray.geom.skeleton import skeleton_json

    L = np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2], [0, 0]], float)
    sk = skeleton_json(L)
    assert sk is not None
    out = build_hipped_roof(L, sk, min_height=4.0, roof_height=2.0, texture_id=1)
    assert out is not None
    pos = out["position"].reshape(-1, 3, 3)
    # projected roof area == footprint area
    a, b, c = pos[:, 0], pos[:, 1], pos[:, 2]
    area = 0.5 * np.abs(
        (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
        - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
    ).sum()
    assert area == pytest.approx(3.0, rel=1e-6)
    assert out["position"][:, 2].min() == pytest.approx(4.0)
    assert out["position"][:, 2].max() == pytest.approx(6.0)
