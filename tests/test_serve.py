"""Serve-path analog (S7): cache hit, on-demand recompute, 404-equivalent."""

import numpy as np
import ray.data

from osm_data_3d_tiles_ray.geom.transforms import mercator_to_tile
from osm_data_3d_tiles_ray.pipelines.serve import get_or_build_tile
from osm_data_3d_tiles_ray.stages.encode import decode_tile
from osm_data_3d_tiles_ray.stages.parse import parse_documents
from osm_data_3d_tiles_ray.synth.generator import generate_shard


def test_get_or_build_tile_and_cache(tmp_path):
    docs, bldgs = generate_shard(0, 300)
    # pick the winner tile of the first building (bbox top-left rule)
    minx = bldgs.column("minx")[0].as_py()
    maxy = bldgs.column("maxy")[0].as_py()
    tx, ty = mercator_to_tile(np.array([minx]), np.array([maxy]))
    tx, ty = int(tx[0]), int(ty[0])

    ds = ray.data.from_arrow(docs)
    payload = get_or_build_tile(ds, tx, ty, str(tmp_path))
    assert payload is not None
    dec = decode_tile(payload)
    assert dec["header"]["featureTable"]["BATCH_LENGTH"] >= 1
    assert 1 in dec["header"]["batchTable"]["osm_id"]  # osm_id of doc 0

    # cache hit: same bytes, no recompute (file mtime unchanged)
    f = tmp_path / f"16_{tx}_{ty}.bin"
    mtime = f.stat().st_mtime_ns
    payload2 = get_or_build_tile(ds, tx, ty, str(tmp_path))
    assert payload2 == payload
    assert f.stat().st_mtime_ns == mtime

    # empty tile → None (the reference 404s)
    assert get_or_build_tile(ds, 1, 1, str(tmp_path)) is None
