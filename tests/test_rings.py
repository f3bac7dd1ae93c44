"""Unit tests for ring/polygon kernels vs brute-force oracles."""

import numpy as np

from osm_data_3d_tiles_ray.geom.rings import (
    RingBatch,
    classify_winding,
    normalize_winding,
    point_in_ring,
    points_in_ring,
    poly_area,
    poly_bbox,
    ring_centroids,
    ring_signed_areas,
    rings_closed,
)


def square(cx=0.0, cy=0.0, r=1.0, cw=True, closed=True):
    pts = np.array([[-r, -r], [-r, r], [r, r], [r, -r]], dtype=float)
    if not cw:
        pts = pts[::-1]
    pts = pts + [cx, cy]
    if closed:
        pts = np.vstack([pts, pts[:1]])
    return pts


def make_batch(rings, roles, polys):
    coords = np.concatenate(rings, axis=0)
    ring_offsets = np.concatenate([[0], np.cumsum([len(r) for r in rings])])
    poly_offsets = np.concatenate([[0], np.cumsum(polys)])
    return RingBatch(coords, ring_offsets, np.asarray(roles, np.int8), poly_offsets)


def test_signed_area_convention():
    # reference convention (src/utils/geometry.ts:6-14): sum (x2-x1)*(y2+y1)/2,
    # positive for the reference's "clockwise"
    cw = square(cw=True)
    ccw = square(cw=False)
    b = make_batch([cw, ccw], [0, 0], [1, 1])
    areas = ring_signed_areas(b.coords, b.ring_offsets)
    assert areas[0] > 0 and areas[1] < 0
    assert np.allclose(np.abs(areas), 4.0)


def test_rings_closed_and_classify():
    closed = square()
    open_ring = square(closed=False)
    coords = np.concatenate([closed, open_ring])
    offs = np.array([0, 5, 9])
    assert list(rings_closed(coords, offs)) == [True, False]
    roles = classify_winding(coords, offs)
    assert roles[0] == 0  # CW → outer


def test_normalize_winding_flips_mismatched():
    outer_ccw = square(cw=False)
    hole_cw = square(r=0.5, cw=True)
    b = make_batch([outer_ccw, hole_cw], [0, 1], [2])
    nb = normalize_winding(b)
    areas = ring_signed_areas(nb.coords, nb.ring_offsets)
    assert areas[0] > 0 and areas[1] < 0


def test_poly_area_with_hole():
    outer = square(r=2.0)
    hole = square(r=1.0, cw=False)
    b = make_batch([outer, hole], [0, 1], [2])
    assert np.allclose(poly_area(b), 16.0 - 4.0)


def test_bbox_and_centroid():
    b = make_batch([square(cx=5, cy=7, r=2)], [0], [1])
    assert np.allclose(poly_bbox(b), [[3, 5, 7, 9]])
    cents = ring_centroids(b.coords, b.ring_offsets)
    assert np.allclose(cents, [[5, 7]])


def test_point_in_ring_vs_scalar():
    rng = np.random.default_rng(7)
    ring = square(r=1.5)
    pts = rng.uniform(-2, 2, size=(200, 2))
    vec = points_in_ring(pts, ring)
    scalar = np.array([point_in_ring(p[0], p[1], ring) for p in pts])
    brute = (np.abs(pts[:, 0]) < 1.5) & (np.abs(pts[:, 1]) < 1.5)
    assert (vec == scalar).all()
    assert (vec == brute).all()
