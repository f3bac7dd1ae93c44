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


def test_ecef_child_transform_matches_numerical_jacobian():
    """parent @ child @ [dx,dy,dz,1] must land on the true ECEF position of
    the offset point (region.ts:36-79) — error ≪ 1 m across the tile."""
    from osm_data_3d_tiles_ray.constants import TILE_HEIGHT
    from osm_data_3d_tiles_ray.geom.transforms import tile_extent
    from osm_data_3d_tiles_ray.stages.tileset import (
        ecef_child_transform,
        ecef_transform_at,
    )

    px, py = 2100, 1462  # z12 parent
    pext = tile_extent(np.array([px]), np.array([py]), 12)[0]
    parent = np.array(ecef_transform_at(pext)).reshape(4, 4, order="F")
    # a z16 leaf far from the parent center
    tx, ty = (px << 4) + 15, (py << 4) + 1
    ext = tile_extent(np.array([tx]), np.array([ty]), 16)[0]
    child = np.array(ecef_child_transform(ext, ecef_transform_at(pext))).reshape(
        4, 4, order="F"
    )
    x0, y0 = (ext[0] + ext[2]) / 2.0, (ext[1] + ext[3]) / 2.0
    h0 = TILE_HEIGHT / 2.0
    for dx, dy, dz in [(0, 0, 0), (200, 0, 0), (0, 200, 0), (130, -170, 40), (-250, 250, -20)]:
        pred = parent @ child @ np.array([dx, dy, dz, 1.0])
        lon, lat = mercator_to_lonlat(x0 + dx, y0 + dy)
        true = lonlat_to_ecef(np.radians(lon), np.radians(lat), h0 + dz)
        err = np.linalg.norm(pred[:3] - true)
        assert err < 0.25, (dx, dy, dz, err)  # linearization error only


def test_lambert93_known_values_and_child_transform():
    from osm_data_3d_tiles_ray.geom.transforms import (
        lambert93_forward,
        mercator_to_lambert93,
        tile_extent,
    )
    from osm_data_3d_tiles_ray.stages.tileset import (
        lambert93_child_transform,
        lambert93_transform_at,
    )

    # projection origin maps to the false origin exactly
    x, y = lambert93_forward(3.0, 46.5)
    assert abs(x - 700000.0) < 1e-6 and abs(y - 6600000.0) < 1e-6
    # Paris (Notre-Dame) — published EPSG:2154 coords ≈ (652469, 6862035)
    x, y = lambert93_forward(2.3522, 48.8566)
    assert abs(x - 652469.02) < 1.0 and abs(y - 6862035.26) < 1.0

    px, py = 2100, 1462
    pext = tile_extent(np.array([px]), np.array([py]), 12)[0]
    parent = np.array(lambert93_transform_at(pext)).reshape(4, 4, order="F")
    assert np.allclose(parent[:3, :3], np.eye(3))  # pure translation root
    tx, ty = (px << 4) + 3, (py << 4) + 12
    ext = tile_extent(np.array([tx]), np.array([ty]), 16)[0]
    child = np.array(
        lambert93_child_transform(ext, lambert93_transform_at(pext))
    ).reshape(4, 4, order="F")
    x0, y0 = (ext[0] + ext[2]) / 2.0, (ext[1] + ext[3]) / 2.0
    for dx, dy in [(0, 0), (150, 80), (-220, 140)]:
        pred = parent @ child @ np.array([dx, dy, 0.0, 1.0])
        tx2154, ty2154 = mercator_to_lambert93(x0 + dx, y0 + dy)
        assert abs(pred[0] - tx2154) < 0.05 and abs(pred[1] - ty2154) < 0.05


def test_lambert93_tileset_tree():
    stats = pd.DataFrame(
        {
            "tile_z": [16, 16],
            "tile_x": [33600, 33601],
            "tile_y": [23400, 23400],
            "batch_length": [3, 1],
            "max_z": [30.0, 12.0],
        }
    )
    tree = build_tileset_tree(stats, projection="lambert93")
    non_root = [n for name, n in tree.items() if name != "tileset.json"]
    for node in non_root:
        assert "transform" in node["root"]
        for child in node["root"]["children"]:
            assert "transform" in child
            box = child["boundingVolume"]["box"]
            assert len(box) == 12 and box[3] > 0 and box[7] > 0
