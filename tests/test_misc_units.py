"""Small-unit coverage: Lance facade, parent cells, keyed RNG determinism,
tile codes, DDA cover."""

import json
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from osm_data_3d_tiles_ray.geom.raster import polygon_cell_cover, tiles_under_triangle
from osm_data_3d_tiles_ray.geom.rng import keyed_uniform
from osm_data_3d_tiles_ray.geom.transforms import cell_id, parent_cell
from osm_data_3d_tiles_ray.stages.assign import tile_code, tile_code_decode


def test_tile_code_roundtrip():
    tx = np.array([0, 1, 65535, 12345], dtype=np.int32)
    ty = np.array([65535, 0, 1, 54321], dtype=np.int32)
    code = tile_code(tx, ty)
    tx2, ty2 = tile_code_decode(code)
    assert (tx2 == tx).all() and (ty2 == ty).all()
    # lexicographic: x dominates
    assert tile_code(np.array([2]), np.array([0]))[0] > tile_code(
        np.array([1]), np.array([65535])
    )[0]


def test_parent_cell_zoom_math():
    cid = cell_id(np.array([33601]), np.array([23410]))
    pid = parent_cell(cid, 12)
    from osm_data_3d_tiles_ray.geom.transforms import cell_to_tile

    z, tx, ty = cell_to_tile(pid)
    assert z[0] == 12 and tx[0] == 33601 >> 4 and ty[0] == 23410 >> 4


def test_keyed_rng_cross_process_deterministic():
    keys = np.array([1, 2, 3, 10**12], dtype=np.uint64)
    here = keyed_uniform(keys, 7).tolist()
    code = (
        "import numpy as np, json;"
        "from osm_data_3d_tiles_ray.geom.rng import keyed_uniform;"
        "print(json.dumps(keyed_uniform(np.array([1,2,3,10**12],dtype=np.uint64),7).tolist()))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd="/root/repo"
    )
    assert json.loads(out.stdout) == here


def test_dda_triangle_cover_contains_vertex_cells():
    tri = np.array([[0.2, 0.2], [5.8, 0.4], [3.0, 4.7]])
    cells = tiles_under_triangle(tri)
    cellset = {tuple(c) for c in cells}
    for v in tri:
        assert (int(np.floor(v[0])), int(np.floor(v[1]))) in cellset
    # interior cell covered
    assert (3, 1) in cellset


def test_polygon_cell_cover_counts_square():
    sq = np.array([[0.5, 0.5], [3.5, 0.5], [3.5, 3.5], [0.5, 3.5], [0.5, 0.5]])
    cells = polygon_cell_cover(sq, np.array([0]), np.array([0], np.int8), (0.0, 0.0), 1.0)
    assert len(cells) == 16  # cells 0..3 × 0..3


def test_lance_facade_reads_only_committed(tmp_path):
    import ray.data

    from osm_data_3d_tiles_ray.sources.lance import dataset_stats, read_dataset

    d = tmp_path / "ds"
    (d / "tiles").mkdir(parents=True)
    pq.write_table(pa.table({"a": [1, 2]}), d / "tiles" / "p1.parquet")
    pq.write_table(pa.table({"a": [3]}), d / "tiles" / "p2.parquet")
    pq.write_table(pa.table({"a": [99]}), d / "tiles" / "orphan.parquet")
    (d / "_manifest.json").write_text(
        json.dumps(
            {
                "fragments": ["tiles/p1.parquet", "tiles/p2.parquet"],
                "n_partitions": 2,
                "rows_out": 3,
                "records": [],
            }
        )
    )
    ds = read_dataset(str(d))
    vals = sorted(r["a"] for r in ds.take_all())
    assert vals == [1, 2, 3]  # the orphan (uncommitted) fragment is invisible
    assert dataset_stats(str(d))["rows_out"] == 3
