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


def test_serve_miss_uses_partition_index(tmp_path):
    """A miss with a committed seed output reads ONLY the tile's z12
    fragment — rows touched ≪ corpus size — and returns the same tile
    content (osm_ids / batch length; positions within quantization error)."""
    from osm_data_3d_tiles_ray.pipelines.buildings import seed_tiles
    from osm_data_3d_tiles_ray.pipelines.serve import get_or_build_tile as gob

    docs, bldgs = generate_shard(0, 300)
    seed_out = str(tmp_path / "seed")
    manifest = seed_tiles(ray.data.from_arrow(docs), seed_out)

    minx = bldgs.column("minx")[0].as_py()
    maxy = bldgs.column("maxy")[0].as_py()
    tx, ty = mercator_to_tile(np.array([minx]), np.array([maxy]))
    tx, ty = int(tx[0]), int(ty[0])

    ds = ray.data.from_arrow(docs)
    # reference result from the recompute path (separate cache dir)
    ref = gob(ds, tx, ty, str(tmp_path / "cache_ref"))
    ref_dec = decode_tile(ref)

    stats: dict = {}
    got = gob(ds, tx, ty, str(tmp_path / "cache_idx"), seed_dir=seed_out, stats=stats)
    assert stats["source"] == "seed_fragment"
    assert stats["rows_scanned"] < 300  # one z12 partition, not the corpus
    dec = decode_tile(got)
    assert dec["header"]["batchTable"]["osm_id"] == ref_dec["header"]["batchTable"]["osm_id"]
    assert dec["header"]["featureTable"]["BATCH_LENGTH"] == ref_dec["header"]["featureTable"]["BATCH_LENGTH"]
    assert len(dec["position"]) == len(ref_dec["position"])
    # positions agree within one quantization step of the tile bbox
    bbox = np.array(dec["header"]["bbox"])
    extent = np.maximum(bbox[3:] - bbox[:3], 1.0)
    assert (np.abs(dec["position"] - ref_dec["position"]) <= extent / 65535 * 2.01 + 1e-9).all()

    # empty tile inside a committed partition → authoritative 404, no scan
    stats2: dict = {}
    empty = gob(ds, 1, 1, str(tmp_path / "cache_idx"), seed_dir=seed_out, stats=stats2)
    assert empty is None
    assert stats2["rows_scanned"] == 0 and stats2["source"] == "seed_manifest"
