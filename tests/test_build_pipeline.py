"""End-to-end geometry pipeline invariants (SURVEY.md §5.3/5.4):
dedup totals, parallelism invariance, per-tile merge consistency,
tileset tree structure, golden stability."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from osm_data_3d_tiles_ray.pipelines.buildings import built_ds, geometry_stats
from osm_data_3d_tiles_ray.stages.tileset import build_tileset_tree
from osm_data_3d_tiles_ray.synth.generator import generate_shard

N_DOCS = 800


@pytest.fixture(scope="module")
def docs_table():
    docs, _ = generate_shard(0, N_DOCS)
    return docs


def _stats_df(docs_table, **kw):
    ds = ray.data.from_arrow(docs_table)
    return (
        geometry_stats(ds, **kw)
        .to_pandas()
        .sort_values(["tile_x", "tile_y"])
        .reset_index(drop=True)
    )


def test_every_building_in_exactly_one_tile(docs_table):
    stats = _stats_df(docs_table)
    assert stats["batch_length"].sum() == N_DOCS
    assert (stats["vertex_count"] > 0).any()


def test_parallelism_invariance(docs_table):
    a = _stats_df(docs_table, batch_size=64)
    b = _stats_df(docs_table, batch_size=512, concurrency=2)
    assert a.equals(b)


def test_tile_merge_consistency(docs_table):
    ds = ray.data.from_arrow(docs_table)
    built = built_ds(ds, emit_buffers=True, batch_size=256)
    from osm_data_3d_tiles_ray.stages.accumulate import accumulate_tiles

    tiles = accumulate_tiles(built).to_pandas()
    assert tiles["batch_length"].sum() == N_DOCS
    # per-row consistency: offsets/batch_id/positions line up
    for row in tiles.head(50).itertuples():
        pos = np.asarray(row.position)
        bid = np.asarray(row.batch_id)
        offs = np.asarray(row.vertex_offsets)
        assert len(pos) == row.vertex_count * 3
        assert len(bid) == row.vertex_count
        assert offs[-1] == row.vertex_count
        assert (np.diff(offs) >= 0).all()
        # batch_id is the building index per vertex span
        expect_bid = np.repeat(np.arange(row.batch_length), np.diff(offs))
        assert (bid == expect_bid).all()
        assert np.isfinite(pos).all()


def test_stats_match_between_paths(docs_table):
    """Stats-only path and full-merge path agree on counts + bboxes."""
    ds = ray.data.from_arrow(docs_table)
    s1 = _stats_df(docs_table)
    from osm_data_3d_tiles_ray.stages.accumulate import accumulate_tiles

    tiles = (
        accumulate_tiles(built_ds(ds, emit_buffers=True))
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    s1 = s1.sort_values("cell_id").reset_index(drop=True)
    assert (s1["batch_length"].values == tiles["batch_length"].values).all()
    assert (s1["vertex_count"].values == tiles["vertex_count"].values).all()
    assert np.allclose(s1["max_z"].values, tiles["max_z"].values, equal_nan=True)


def test_tileset_tree_structure(docs_table):
    stats = _stats_df(docs_table)
    tree = build_tileset_tree(stats)
    root = tree["tileset.json"]
    assert root["root"]["refine"] == "ADD"
    assert root["root"]["geometricError"] == 512.0
    n_children_total = 0
    for name, node in tree.items():
        if name == "tileset.json":
            continue
        z, px, py = name[:-5].split("_")
        assert z == "12"
        for child in node["root"]["children"]:
            uri = child["content"]["uri"]
            _, x, y = uri[:-5].split("/")
            assert int(x) >> 4 == int(px) and int(y) >> 4 == int(py)
            n_children_total += 1
    assert n_children_total == len(stats)  # every non-empty z16 tile listed


def test_roof_dispatch_covers_types(docs_table):
    ds = ray.data.from_arrow(docs_table)
    built = built_ds(ds, emit_buffers=False).to_pandas()
    used = set(built["roof_type_used"].unique())
    assert "flat" in used
    assert "pyramidal" in used or "skillion" in used or "hipped" in used
    # skeleton-backed hipped roofs appear (synth gives skeletons to ~30%)
    assert "hipped" in used


def test_full_pipeline_with_output_dir(tmp_path, docs_table):
    import json

    from osm_data_3d_tiles_ray.pipelines.buildings import full_pipeline

    out = str(tmp_path / "fp")
    ds = ray.data.from_arrow(docs_table)
    tiles = full_pipeline(ds, out_dir=out)
    assert tiles.count() > 0
    ts = json.loads((tmp_path / "fp" / "tileset.json").read_text())
    assert ts["root"]["refine"] == "ADD"
    assert len(ts["root"]["children"]) > 0
