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


def test_concave_returns_none():
    L = np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]], float)
    assert compute_straight_skeleton(L) is None
    assert skeleton_json(L) is None


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
