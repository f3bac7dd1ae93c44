"""Distributed z12 tileset fan-in (write_tileset_distributed) must be
byte-identical to the driver-side builder (build_tileset_tree +
write_tileset) — same node JSONs, same root — for every projection.
Reference analog: /root/reference/generate-tileset.ts:37-65."""

import os

import pandas as pd
import pytest
import ray.data

from osm_data_3d_tiles_ray.stages.tileset import (
    build_tileset_tree,
    write_tileset,
    write_tileset_distributed,
)


def _stats_df() -> pd.DataFrame:
    # 3 z12 parents, skewed child counts, finite + NaN max_z
    return pd.DataFrame(
        {
            "tile_z": [16] * 7,
            "tile_x": [33600, 33601, 33602, 33700, 33701, 34000, 33615],
            "tile_y": [23400, 23400, 23401, 23410, 23411, 23500, 23415],
            "batch_length": [3, 1, 2, 5, 1, 1, 2],
            "max_z": [30.0, 12.0, float("nan"), 45.0, 8.0, 3.0, 60.0],
        }
    )


@pytest.mark.parametrize("projection", ["mercator", "ecef", "lambert93"])
def test_distributed_byte_identical(tmp_path, projection):
    df = _stats_df()
    a = str(tmp_path / f"driver_{projection}")
    b = str(tmp_path / f"dist_{projection}")
    write_tileset(build_tileset_tree(df, projection=projection), a)
    n = write_tileset_distributed(
        ray.data.from_pandas(df).repartition(3),
        b,
        projection=projection,
        num_partitions=8,
    )
    assert n == 4  # four distinct z12 parents
    files_a = sorted(os.listdir(a))
    files_b = sorted(f for f in os.listdir(b) if not f.startswith("."))
    assert files_a == files_b
    for name in files_a:
        with open(os.path.join(a, name), "rb") as fa, open(
            os.path.join(b, name), "rb"
        ) as fb:
            assert fa.read() == fb.read(), name


def test_seed_in_task_nodes_byte_identical(tmp_path):
    """seed_tiles writes node JSONs inside write_parent and the root from
    the manifest — the whole set must be byte-identical to the driver-side
    build_tileset_tree over the same fragment stats."""
    import numpy as np
    import pyarrow.parquet as pq

    from osm_data_3d_tiles_ray.geom.transforms import cell_to_tile
    from osm_data_3d_tiles_ray.pipelines.buildings import seed_tiles
    from osm_data_3d_tiles_ray.synth.generator import generate_shard

    docs, _ = generate_shard(0, 300)
    out = str(tmp_path / "seed")
    manifest = seed_tiles(ray.data.from_arrow(docs), out)
    frames = []
    for f in manifest["fragments"]:
        t = pq.read_table(f"{out}/{f}", columns=["cell_id", "max_z"])
        z, tx, ty = cell_to_tile(
            t.column("cell_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        frames.append(
            pd.DataFrame(
                {
                    "tile_z": z,
                    "tile_x": tx,
                    "tile_y": ty,
                    "batch_length": 1,
                    "max_z": t.column("max_z").to_numpy(zero_copy_only=False),
                }
            )
        )
    stats = pd.concat(frames, ignore_index=True)
    ref = str(tmp_path / "ref")
    write_tileset(build_tileset_tree(stats), ref)
    files_ref = sorted(os.listdir(ref))
    json_out = sorted(f for f in os.listdir(out) if f.endswith(".json") and f != "_manifest.json")
    assert files_ref == json_out
    for name in files_ref:
        with open(os.path.join(ref, name), "rb") as fa, open(
            os.path.join(out, name), "rb"
        ) as fb:
            assert fa.read() == fb.read(), name


def test_distributed_empty(tmp_path):
    df = _stats_df().iloc[:0]
    out = str(tmp_path / "empty")
    n = write_tileset_distributed(
        ray.data.from_pandas(df), out, projection="mercator"
    )
    assert n == 0
    # root still written, with no children
    import json

    root = json.loads(open(os.path.join(out, "tileset.json")).read())
    assert root["root"]["children"] == []
