"""ECEF/region tileset variant (M18): transform matrices + region volumes."""

import numpy as np

from osm_data_3d_tiles_ray.geom.transforms import (
    enu_basis_ecef,
    lonlat_to_ecef,
    mercator_to_lonlat,
)
from osm_data_3d_tiles_ray.stages.tileset import build_tileset_tree, ecef_transform_at
import pandas as pd


def test_enu_basis_orthonormal():
    for lon, lat in [(0, 0), (4.85, 45.75), (-120, -33)]:
        b = enu_basis_ecef(np.radians(lon), np.radians(lat))
        assert np.allclose(b @ b.T, np.eye(3), atol=1e-12)
        # U points away from the ellipsoid center (same hemisphere as position)
        p = lonlat_to_ecef(np.radians(lon), np.radians(lat))
        assert (b[2] @ p) > 0


def test_ecef_matches_reference_formula():
    # reference: src/tileset/utils.ts:31-48 (WGS84)
    p = lonlat_to_ecef(np.radians(0.0), np.radians(0.0))
    assert np.allclose(p, [6378137.0, 0.0, 0.0])
    p = lonlat_to_ecef(np.radians(90.0), np.radians(0.0))
    assert np.allclose(p, [0.0, 6378137.0, 0.0], atol=1e-6)
    p = lonlat_to_ecef(np.radians(0.0), np.radians(90.0))
    # polar radius b = a(1-f)
    assert abs(p[2] - 6356752.314245179) < 1e-3


def test_ecef_tileset_tree_structure():
    stats = pd.DataFrame(
        {
            "tile_z": [16, 16, 16],
            "tile_x": [33600, 33601, 33700],
            "tile_y": [23400, 23400, 23410],
            "batch_length": [3, 1, 2],
            "max_z": [30.0, 12.0, 45.0],
        }
    )
    tree = build_tileset_tree(stats, projection="ecef")
    non_root = [n for name, n in tree.items() if name != "tileset.json"]
    assert len(non_root) == 2  # two z12 parents
    for node in non_root:
        assert "transform" in node["root"]
        m = np.array(node["root"]["transform"]).reshape(4, 4, order="F")
        assert np.allclose(m[3], [0, 0, 0, 1])
        # rotation part orthonormal
        r = m[:3, :3]
        assert np.allclose(r.T @ r, np.eye(3), atol=1e-12)
        for child in node["root"]["children"]:
            region = child["boundingVolume"]["region"]
            w, s, e, n, z0, z1 = region
            assert -np.pi <= w < e <= np.pi
            assert -np.pi / 2 <= s < n <= np.pi / 2
            assert z1 > z0
