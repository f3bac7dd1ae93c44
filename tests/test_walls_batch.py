"""Bitwise equivalence of the batch-vectorized walls kernel vs the scalar
reference implementation, across random rings and parameters."""

import numpy as np

from osm_data_3d_tiles_ray.geom.walls import build_walls
from osm_data_3d_tiles_ray.geom.walls_batch import build_walls_batch


def test_batch_walls_bitwise_equal_to_scalar():
    rng = np.random.default_rng(42)
    rings, params = [], []
    for _ in range(400):
        k = int(rng.integers(4, 14))
        r = 3 + rng.random(k) * 20
        ang = -np.arange(k) / k * 2 * np.pi + rng.random() * 6
        ring = np.stack([np.cos(ang) * r, np.sin(ang) * r], 1)
        rings.append(np.vstack([ring, ring[:1]]))
        params.append(
            {
                "min_height": float(rng.random() * 3),
                "height": float(5 + rng.random() * 30),
                "levels": float(rng.choice([0.0, 0.5, 1.0, 2.5, 5.0, 8.0])),
                "tw": int(rng.integers(0, 5)),
                "twin": int(rng.integers(100, 105)),
            }
        )
    scalar = [
        build_walls(r, p["min_height"], p["height"], p["levels"], 6.08, p["twin"], p["tw"])
        for r, p in zip(rings, params)
    ]
    verts = np.concatenate(rings)
    offs = np.concatenate([[0], np.cumsum([len(r) for r in rings])])
    out, counts = build_walls_batch(
        verts,
        offs,
        np.array([p["min_height"] for p in params]),
        np.array([p["height"] for p in params]),
        np.array([p["levels"] for p in params]),
        6.08,
        np.array([p["tw"] for p in params]),
        np.array([p["twin"] for p in params]),
    )
    splits = np.cumsum(counts)[:-1]
    for name in ["position", "uv", "normal"]:
        for i, (s, p) in enumerate(zip(scalar, np.split(out[name], splits))):
            assert s[name].shape == p.shape, (i, name)
            assert (s[name] == p).all(), (i, name)
    for i, (s, p) in enumerate(zip(scalar, np.split(out["texture_id"], splits))):
        assert (s["texture_id"] == p).all(), i


def test_batch_walls_heightpoints_nan_fallback():
    ring = np.array([[0, 0], [0, 4], [6, 4], [6, 0], [0, 0]], float)
    # NaN hp = constant height; finite hp = skirt override
    hp = np.full(5, np.nan)
    out, counts = build_walls_batch(
        ring,
        np.array([0, 5]),
        np.array([1.0]),
        np.array([9.0]),
        np.array([2.0]),
        6.08,
        np.array([0]),
        np.array([1]),
        height_points=hp,
    )
    ref = build_walls(ring, 1.0, 9.0, 2.0, 6.08, 1, 0)
    assert (out["position"] == ref["position"]).all()
