"""Salted-key skew path (north rule): salted two-phase tile merge must be
identical to the unsalted single groupby."""

import numpy as np
import pyarrow as pa
import ray.data

from osm_data_3d_tiles_ray.pipelines.buildings import built_ds
from osm_data_3d_tiles_ray.stages.accumulate import accumulate_tiles
from osm_data_3d_tiles_ray.synth.generator import generate_shard


def test_salted_merge_equals_unsalted():
    docs, _ = generate_shard(0, 600)
    built = built_ds(ray.data.from_arrow(docs), emit_buffers=True).materialize()
    plain = (
        accumulate_tiles(built)
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    salted = (
        accumulate_tiles(built, n_salt=4)
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    assert len(plain) == len(salted)
    assert (plain["cell_id"].values == salted["cell_id"].values).all()
    assert (plain["batch_length"].values == salted["batch_length"].values).all()
    assert (plain["vertex_count"].values == salted["vertex_count"].values).all()
    for col in ["position", "uv", "normal", "texture_id", "batch_id", "osm_ids", "vertex_offsets"]:
        for a, b in zip(plain[col], salted[col]):
            assert np.array_equal(np.asarray(a), np.asarray(b)), col
    for col in ["min_x", "min_y", "min_z", "max_x", "max_y", "max_z"]:
        assert np.allclose(plain[col].values, salted[col].values, equal_nan=True)
