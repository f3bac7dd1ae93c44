"""Quantize-before-shuffle tile merge: agreement with the raw path +
per-building decode round trip within quantization error."""

import numpy as np
import ray.data

from osm_data_3d_tiles_ray.pipelines.buildings import built_ds
from osm_data_3d_tiles_ray.stages.accumulate import (
    accumulate_tiles,
    accumulate_tiles_compact,
)
from osm_data_3d_tiles_ray.stages.accumulate import decode_building_record
from osm_data_3d_tiles_ray.synth.generator import generate_shard


def test_compact_merge_matches_raw_counts_and_decodes():
    docs, _ = generate_shard(0, 400)
    built = built_ds(ray.data.from_arrow(docs), emit_buffers=True).materialize()
    raw = (
        accumulate_tiles(built)
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    compact = (
        accumulate_tiles_compact(built)
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    assert (raw["cell_id"].values == compact["cell_id"].values).all()
    assert (raw["batch_length"].values == compact["batch_length"].values).all()
    assert (raw["vertex_count"].values == compact["vertex_count"].values).all()
    for a, b in zip(raw["osm_ids"], compact["osm_ids"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    # decode a few tiles: per-building blob positions ≈ raw positions
    checked = 0
    for i in range(min(30, len(compact))):
        row = compact.iloc[i]
        rawrow = raw.iloc[i]
        lens = np.asarray(row["blob_lengths"])
        payload = row["payload"]
        offs = np.concatenate([[0], np.cumsum(lens)])
        raw_pos = np.asarray(rawrow["position"], dtype=np.float64).reshape(-1, 3)
        raw_offsets = np.asarray(rawrow["vertex_offsets"])
        for j in range(len(lens)):
            dec = decode_building_record(payload[offs[j] : offs[j + 1]])
            v0, v1 = raw_offsets[j], raw_offsets[j + 1]
            orig = raw_pos[v0:v1]
            bbox = dec["bbox"]
            extent = np.maximum(np.array(bbox[3:]) - np.array(bbox[:3]), 1.0)
            assert dec["position"].shape == orig.shape
            assert (np.abs(dec["position"] - orig) <= extent / 65535 * 1.01 + 1e-6).all()
        checked += 1
    assert checked > 0


def test_partitioned_compact_merge_byte_equal(ray_session):
    """_merge_compact_partition (one vectorized call per hash partition)
    must emit byte-identical rows to one _merge_compact_group call per
    cell — including payload bytes, list columns, and NaN-bbox handling."""
    import pyarrow as pa

    from osm_data_3d_tiles_ray.stages.accumulate import (
        _merge_compact_group,
        _merge_compact_partition,
        compact_before_shuffle,
    )

    docs, _ = generate_shard(7, 300)
    built = built_ds(ray.data.from_arrow(docs), emit_buffers=True)
    compact = pa.concat_tables(
        [
            compact_before_shuffle(b)
            for b in built.iter_batches(batch_size=None, batch_format="pyarrow")
        ]
    ).combine_chunks()
    # scramble row order: partition fn owns its own sort
    rng = np.random.default_rng(3)
    perm = rng.permutation(len(compact))
    part_out = (
        _merge_compact_partition(compact.take(pa.array(perm)))
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    ref = compact.sort_by([("cell_id", "ascending")])
    cells = ref.column("cell_id").to_numpy(zero_copy_only=False)
    bounds = np.nonzero(np.diff(cells))[0] + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(cells)]])
    ref_out = (
        pa.concat_tables(
            [_merge_compact_group(ref.slice(s, e - s)) for s, e in zip(starts, ends)]
        )
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    assert list(part_out.columns) == list(ref_out.columns)
    assert len(part_out) == len(ref_out)
    for col in part_out.columns:
        for a, b in zip(part_out[col], ref_out[col]):
            if isinstance(a, (bytes, np.ndarray)):
                assert np.array_equal(np.asarray(a), np.asarray(b)), col
            else:
                assert a == b or (a != a and b != b), col  # NaN == NaN


def test_in_tile_order_is_ascending_osm_id(ray_session):
    """Documented deviation (A5): the reference's zIndex sort compares a
    never-assigned field (NaN comparator -> arrival order); the engine pins
    ascending osm_id so output is partitioning-independent."""
    import numpy as np
    import ray.data

    from osm_data_3d_tiles_ray.pipelines.buildings import built_ds
    from osm_data_3d_tiles_ray.stages.accumulate import accumulate_tiles
    from osm_data_3d_tiles_ray.synth.generator import generate_shard

    docs, _ = generate_shard(2, 400)
    tiles = accumulate_tiles(built_ds(ray.data.from_arrow(docs), emit_buffers=True))
    checked = 0
    for row in tiles.take_all():
        ids = np.asarray(row["osm_ids"])
        assert (np.diff(ids) > 0).all()
        checked += 1
    assert checked > 0
