"""Douglas–Peucker invariants: anchor retention, eps-bounded deviation of
dropped vertices, determinism, and the q_simplify pipeline shape."""

import numpy as np


def _seg_dist(p, a, b):
    ab = b - a
    L2 = float(ab @ ab)
    if L2 == 0:
        return float(np.hypot(*(p - a)))
    t = np.clip(float((p - a) @ ab) / L2, 0, 1)
    return float(np.hypot(*(p - (a + t * ab))))


def _max_deviation(ring, keep, eps):
    """Every dropped vertex must lie within eps of its simplified chord."""
    keep = list(keep)
    worst = 0.0
    closed = keep + [keep[0] + len(ring)]
    ext = np.concatenate([ring, ring])
    for a, b in zip(closed, closed[1:]):
        for m in range(a + 1, b):
            worst = max(worst, _seg_dist(ext[m], ext[a], ext[b]))
    return worst


def test_dp_square_with_noise():
    from osm_data_3d_tiles_ray.geom.simplify import simplify_ring

    rng = np.random.default_rng(42)
    # square with jittered edge midpoints — DP at eps above the jitter
    # must collapse to ~the 4 corners
    base = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    ring = []
    for i in range(4):
        a, b = base[i], base[(i + 1) % 4]
        ring.append(a)
        for t in (0.25, 0.5, 0.75):
            p = a + t * (b - a)
            p = p + rng.normal(0, 0.05, 2)
            ring.append(p)
    ring = np.asarray(ring)
    keep = simplify_ring(ring, eps=0.5)
    assert len(keep) <= 6
    assert _max_deviation(ring, keep, 0.5) <= 0.5 + 1e-9
    # tight eps keeps everything
    keep_all = simplify_ring(ring, eps=1e-6)
    assert len(keep_all) == len(ring)


def test_dp_random_rings_eps_bound():
    from osm_data_3d_tiles_ray.geom.simplify import simplify_ring

    rng = np.random.default_rng(7)
    for _ in range(25):
        n = int(rng.integers(4, 40))
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(5, 15, n)
        ring = np.stack([r * np.cos(ang), r * np.sin(ang)], axis=1)
        eps = float(rng.uniform(0.1, 3.0))
        keep = simplify_ring(ring, eps)
        assert keep[0] == 0
        assert len(keep) >= 3 or len(keep) == len(ring)
        assert _max_deviation(ring, keep, eps) <= eps + 1e-9
        # deterministic
        again = simplify_ring(ring, eps)
        assert np.array_equal(keep, again)


def test_q_simplify_pipeline(ray_session):
    import pandas as pd

    from osm_data_3d_tiles_ray.pipelines.geo import q_simplify

    got = q_simplify("/root/testdata/sf0.001").to_pandas()
    assert (got.n_simplified <= got.n_vertices).all()
    assert (got.n_simplified >= 3).all()
    # simplification must not change area beyond the eps-perimeter bound
    # (loose sanity: within 20% for 2 m tolerance on building footprints)
    ratio = got.area_simplified_e4 / got.area_e4.clip(lower=1)
    assert (ratio > 0.5).all() and (ratio < 1.5).all()
    # batch-size invariance
    g2 = q_simplify("/root/testdata/sf0.001").to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("osm_id").reset_index(drop=True),
        g2.sort_values("osm_id").reset_index(drop=True),
    )
