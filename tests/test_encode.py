"""b3dm-equivalent payload encode/decode round trip + error bounds."""

import numpy as np
import ray.data

from osm_data_3d_tiles_ray.pipelines.buildings import built_ds
from osm_data_3d_tiles_ray.stages.accumulate import accumulate_tiles
from osm_data_3d_tiles_ray.stages.encode import decode_tile, encode_tiles
from osm_data_3d_tiles_ray.synth.generator import generate_shard


def test_encode_roundtrip_error_bounds():
    docs, _ = generate_shard(0, 300)
    tiles = accumulate_tiles(
        built_ds(ray.data.from_arrow(docs), emit_buffers=True)
    )
    encoded = tiles.map_batches(encode_tiles, batch_format="pyarrow").to_pandas()
    raw = tiles.to_pandas().set_index("cell_id")
    assert (encoded["payload_bytes"] > 0).all()
    checked = 0
    for row in encoded.itertuples():
        dec = decode_tile(row.payload)
        assert dec["header"]["featureTable"]["BATCH_LENGTH"] == row.batch_length
        orig = raw.loc[row.cell_id]
        pos = np.asarray(orig["position"], dtype=np.float64).reshape(-1, 3)
        bbox = [orig[c] for c in ("min_x", "min_y", "min_z", "max_x", "max_y", "max_z")]
        extent = np.maximum(np.array(bbox[3:]) - np.array(bbox[:3]), 1.0)
        err = np.abs(dec["position"] - pos)
        assert (err <= extent / 65535 * 1.01 + 1e-6).all()
        assert (dec["batch_id"] == np.asarray(orig["batch_id"])).all()
        assert (dec["texture_id"] == np.asarray(orig["texture_id"])).all()
        checked += 1
        if checked >= 40:
            break
    assert checked > 0
