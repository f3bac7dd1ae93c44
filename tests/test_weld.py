"""Vertex weld: reconstruction identity + real reduction on tile meshes."""

import numpy as np
import ray.data

from osm_data_3d_tiles_ray.geom.weld import weld_mesh
from osm_data_3d_tiles_ray.pipelines.buildings import built_ds
from osm_data_3d_tiles_ray.stages.accumulate import accumulate_tiles
from osm_data_3d_tiles_ray.synth.generator import generate_shard


def test_weld_reconstructs_exactly():
    rng = np.random.default_rng(3)
    base = rng.random((20, 3)).astype(np.float32)
    idx = rng.integers(0, 20, 300)
    pos = base[idx]
    nrm = (base[idx] * 2).astype(np.float32)
    uv = base[idx, :2]
    tid = (idx % 5).astype(np.uint8)
    bid = (idx % 3).astype(np.uint16)
    out = weld_mesh(pos, nrm, uv, tid, bid)
    assert len(out["position"]) <= 20
    rec = out["position"][out["index"]]
    assert (rec == pos).all()
    assert (out["normal"][out["index"]] == nrm).all()
    assert (out["texture_id"][out["index"]] == tid).all()


def test_weld_reduces_tile_meshes():
    docs, _ = generate_shard(0, 200)
    tiles = accumulate_tiles(
        built_ds(ray.data.from_arrow(docs), emit_buffers=True)
    ).to_pandas()
    total_before = 0
    total_after = 0
    for row in tiles.head(40).itertuples():
        pos = np.asarray(row.position, np.float32).reshape(-1, 3)
        out = weld_mesh(
            pos,
            np.asarray(row.normal, np.float32).reshape(-1, 3),
            np.asarray(row.uv, np.float32).reshape(-1, 2),
            np.asarray(row.texture_id, np.uint8),
            np.asarray(row.batch_id, np.uint16),
        )
        assert (out["position"][out["index"]] == pos).all()
        total_before += len(pos)
        total_after += len(out["position"])
    assert total_after < total_before * 0.75  # real reduction on extrusions


def test_smooth_normals_cube_corner():
    from osm_data_3d_tiles_ray.geom.weld import compute_smooth_normals

    # two triangles of a flat square → all normals identical +z
    sq = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 0, 0], [1, 1, 0], [0, 1, 0]],
        np.float32,
    )
    n = compute_smooth_normals(sq)
    assert np.allclose(n, [0, 0, 1], atol=1e-6)

    # a roof ridge: two slopes sharing an edge → shared verts get averaged
    slopes = np.array(
        [
            [0, 0, 0], [1, 0, 1], [0, 1, 0],   # slope A (rising +x)
            [1, 0, 1], [2, 0, 0], [2, 1, 0],   # slope B (falling +x)
        ],
        np.float32,
    )
    n = compute_smooth_normals(slopes)
    # the ridge vertex (1,0,1) appears in both triangles → averaged normal
    ridge = np.where((slopes == [1, 0, 1]).all(axis=1))[0]
    assert len(ridge) == 2
    assert np.allclose(n[ridge[0]], n[ridge[1]])
    assert np.allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-6)
