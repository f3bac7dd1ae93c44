"""Ownership dedup (J1) + per-tile stats vs a DuckDB oracle over the
generator's independent bbox truth columns."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from osm_data_3d_tiles_ray.stages.assign import (
    candidate_tiles,
    ownership_assignments,
    tile_code,
    tile_stats,
)
from osm_data_3d_tiles_ray.stages.parse import parse_documents
from osm_data_3d_tiles_ray.synth.generator import generate_shard

ORACLE_ASSIGN = """
SELECT osm_id,
       CAST(FLOOR((minx + 20037508.342789244) / (40075016.685578488 / 65536.0)) AS INTEGER) AS tile_x,
       CAST(FLOOR((20037508.342789244 - maxy) / (40075016.685578488 / 65536.0)) AS INTEGER) AS tile_y
FROM bldgs
ORDER BY osm_id
"""


@pytest.fixture(scope="module")
def data():
    docs, bldgs = generate_shard(0, 3000)
    return parse_documents(docs), bldgs


def test_winner_matches_duckdb_oracle(data):
    parsed, bldgs = data
    cands = candidate_tiles(parsed)
    # winner per osm_id = min tile_code
    import pandas as pd

    df = cands.to_pandas()
    win = df.groupby("osm_id")["tile_code"].min().reset_index()
    codes = win["tile_code"].to_numpy().astype(np.int64)
    win["tile_x"] = (codes >> 32).astype("int32")
    win["tile_y"] = (codes & 0xFFFFFFFF).astype("int32")
    win = win.sort_values("osm_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("bldgs", bldgs)
    oracle = con.execute(ORACLE_ASSIGN).df()
    assert (win["osm_id"].values == oracle["osm_id"].values).all()
    assert (win["tile_x"].values == oracle["tile_x"].values).all()
    assert (win["tile_y"].values == oracle["tile_y"].values).all()


def test_some_buildings_straddle_tiles(data):
    parsed, _ = data
    cands = candidate_tiles(parsed)
    n_cand = cands.num_rows
    n_bldg = parsed.num_rows
    # every 10th doc is border-snapped, so candidates must exceed buildings
    assert n_cand > n_bldg * 1.05


def test_ownership_assignments_ray(data):
    parsed, bldgs = data
    ds = ray.data.from_arrow(parsed.select(["osm_id", "minx", "miny", "maxx", "maxy"]))
    got = (
        ownership_assignments(ds)
        .to_pandas()
        .sort_values("osm_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("bldgs", bldgs)
    oracle = con.execute(ORACLE_ASSIGN).df()
    assert (got["osm_id"].values == oracle["osm_id"].values).all()
    assert (got["tile_x"].values == oracle["tile_x"].values).all()
    assert (got["tile_y"].values == oracle["tile_y"].values).all()
    assert len(got) == len(bldgs)  # exactly one tile per building


def test_tile_stats_counts(data):
    parsed, bldgs = data
    ds = ray.data.from_arrow(parsed.select(["osm_id", "minx", "miny", "maxx", "maxy"]))
    assignments = ownership_assignments(ds)
    stats = tile_stats(assignments).to_pandas()
    assert stats["batch_length"].sum() == len(bldgs)
    con = duckdb.connect()
    con.register("bldgs", bldgs)
    oracle = con.execute(
        f"SELECT tile_x, tile_y, COUNT(*) AS batch_length FROM ({ORACLE_ASSIGN}) GROUP BY 1, 2"
    ).df()
    merged = stats.merge(oracle, on=["tile_x", "tile_y"], how="outer", suffixes=("", "_o"))
    assert not merged.isna().any().any()
    assert (merged["batch_length"] == merged["batch_length_o"]).all()
