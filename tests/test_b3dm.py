"""Spec-layout b3dm/glb container: header fields, byte-length and
alignment invariants per 3D Tiles 1.0 + glTF 2.0, and a lossless
round-trip through the validating readers."""

import json
import struct

import numpy as np
import ray.data

from osm_data_3d_tiles_ray.pipelines.buildings import built_ds
from osm_data_3d_tiles_ray.stages.accumulate import accumulate_tiles
from osm_data_3d_tiles_ray.stages.b3dm import (
    build_b3dm,
    build_glb,
    encode_tiles_b3dm,
    parse_b3dm,
    parse_glb,
)
from osm_data_3d_tiles_ray.synth.generator import generate_shard


def _sample_mesh(v=12, seed=3):
    rng = np.random.default_rng(seed)
    pos = rng.normal(size=(v, 3)).astype(np.float32)
    nrm = rng.normal(size=(v, 3)).astype(np.float32)
    uv = rng.random(size=(v, 2)).astype(np.float32)
    bid = (np.arange(v) // 3).astype(np.uint16)
    return pos, nrm, uv, bid


def test_glb_layout_and_roundtrip():
    pos, nrm, uv, bid = _sample_mesh()
    glb = build_glb(pos, nrm, uv, bid)
    # header: magic, version 2, length == len(glb), 8-byte aligned
    assert glb[:4] == b"glTF"
    version, length = struct.unpack_from("<II", glb, 4)
    assert version == 2 and length == len(glb) and length % 8 == 0
    # chunk 0 is JSON padded with 0x20 to 4 bytes, chunk 1 is BIN\0
    jlen, jtype = struct.unpack_from("<I4s", glb, 12)
    assert jtype == b"JSON" and jlen % 4 == 0
    gltf = json.loads(glb[20 : 20 + jlen])
    assert gltf["asset"]["version"] == "2.0"
    blen, btype = struct.unpack_from("<I4s", glb, 20 + jlen)
    assert btype == b"BIN\x00" and blen % 4 == 0
    assert gltf["buffers"][0]["byteLength"] == blen
    # accessor min/max on POSITION (required by spec for vertex attributes)
    acc_pos = gltf["accessors"][gltf["meshes"][0]["primitives"][0]["attributes"]["POSITION"]]
    assert acc_pos["min"] == [float(x) for x in pos.min(axis=0)]
    dec = parse_glb(glb)
    assert np.array_equal(dec["position"], pos)
    assert np.array_equal(dec["normal"], nrm)
    assert np.array_equal(dec["uv"], uv)
    assert np.array_equal(dec["batch_id"], bid)


def test_b3dm_header_and_alignment():
    pos, nrm, uv, bid = _sample_mesh(v=9)
    glb = build_glb(pos, nrm, uv, bid)
    bt = {"osm_id": [1, 2, 3], "osm_url": ["u1", "u2", "u3"]}
    b3dm = build_b3dm(glb, {"BATCH_LENGTH": 3}, bt)
    assert b3dm[:4] == b"b3dm"
    version, byte_length, ftj, ftb, btj, btb = struct.unpack_from("<IIIIII", b3dm, 4)
    assert version == 1
    assert byte_length == len(b3dm) and byte_length % 8 == 0
    assert ftb == 0 and btb == 0
    # feature-table JSON ends 8-byte aligned from the tile start; batch
    # table likewise; glb starts 8-byte aligned
    assert (28 + ftj) % 8 == 0
    assert (28 + ftj + btj) % 8 == 0
    # JSON bodies are space-padded (trailing bytes are 0x20)
    ft_raw = b3dm[28 : 28 + ftj]
    assert ft_raw.rstrip(b" ") == ft_raw.strip()
    parsed = parse_b3dm(b3dm)
    assert parsed["feature_table"]["BATCH_LENGTH"] == 3
    assert parsed["batch_table"] == bt
    assert parsed["glb"] == glb


def test_encode_tiles_b3dm_stage(ray_session):
    docs, _ = generate_shard(0, 300)
    tiles = accumulate_tiles(built_ds(ray.data.from_arrow(docs), emit_buffers=True))
    raw = tiles.to_pandas().set_index("cell_id")
    enc = tiles.map_batches(encode_tiles_b3dm, batch_format="pyarrow").to_pandas()
    assert (enc["payload_bytes"] > 0).all()
    checked = 0
    for row in enc.itertuples():
        parsed = parse_b3dm(row.payload)
        assert parsed["feature_table"]["BATCH_LENGTH"] == row.batch_length
        orig = raw.loc[row.cell_id]
        assert parsed["batch_table"]["osm_id"] == [int(x) for x in orig["osm_ids"]]
        mesh = parse_glb(parsed["glb"])
        pos = np.asarray(orig["position"], dtype=np.float32).reshape(-1, 3)
        assert np.array_equal(mesh["position"], pos)  # float32 is lossless here
        assert np.array_equal(mesh["batch_id"], np.asarray(orig["batch_id"]))
        assert len(mesh["position"]) % 3 == 0  # whole triangles
        checked += 1
        if checked >= 25:
            break
    assert checked > 0


def test_export_b3dm_files_and_tileset(ray_session, tmp_path):
    import json as _json
    from pathlib import Path

    import ray.data

    from osm_data_3d_tiles_ray.pipelines.buildings import export_b3dm

    docs, _ = generate_shard(0, 200)
    out = str(tmp_path / "b3dm_out")
    n = export_b3dm(ray.data.from_arrow(docs), out)
    files = sorted(Path(out).glob("*.b3dm"))
    assert len(files) == n > 0
    # every file parses as a valid b3dm wrapping a valid glb
    total_batched = 0
    for f in files[:20]:
        parsed = parse_b3dm(f.read_bytes())
        total_batched += parsed["feature_table"]["BATCH_LENGTH"]
        mesh = parse_glb(parsed["glb"])
        assert len(mesh["position"]) % 3 == 0
    # tileset URIs reference the written files
    tree = _json.loads((Path(out) / "tileset.json").read_text())
    node_uri = tree["root"]["children"][0]["content"]["uri"]
    node = _json.loads((Path(out) / node_uri).read_text())
    child_uri = node["root"]["children"][0]["content"]["uri"]
    assert (Path(out) / child_uri).exists()


def test_recursive_tileset_reader_roundtrip(ray_session, tmp_path):
    """S3: walk tileset.json → nested node JSONs → b3dm leaves; decoded
    Dataset reproduces the exported corpus exactly."""
    import ray.data

    from osm_data_3d_tiles_ray.pipelines.buildings import export_b3dm
    from osm_data_3d_tiles_ray.sources.tileset_reader import read_tileset, walk_tileset

    docs, _ = generate_shard(1, 250)
    out = str(tmp_path / "ts_out")
    n = export_b3dm(ray.data.from_arrow(docs), out)

    leaves = walk_tileset(out)
    assert len(leaves) == n
    assert all(leaf["uri"].endswith(".b3dm") for leaf in leaves)
    assert all(leaf["depth"] >= 2 for leaf in leaves)  # root → node → leaf

    ds = read_tileset(out)
    df = ds.to_pandas()
    assert len(df) == n
    assert int(df["batch_length"].sum()) == 250  # every building in one tile
    assert (df["tile_z"] == 16).all()
    assert (df["vertex_count"] > 0).all()
    # buffers decoded and consistent
    row = df.iloc[0]
    assert len(row["position"]) == row["vertex_count"] * 3
    assert len(row["batch_id"]) == row["vertex_count"]
