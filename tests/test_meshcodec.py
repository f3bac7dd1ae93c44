"""Draco-equivalent codec: exact roundtrip vs the v1 quantized payload,
varint/zigzag property tests, real-pipeline compression ratio."""

import numpy as np
import pyarrow as pa
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_data_3d_tiles_ray.pipelines.buildings import built_ds
from osm_data_3d_tiles_ray.stages.accumulate import accumulate_tiles
from osm_data_3d_tiles_ray.stages.encode import decode_tile, encode_tiles
from osm_data_3d_tiles_ray.stages.meshcodec import (
    compress_mesh,
    decompress_mesh,
    encode_tiles_compressed,
    varint_decode,
    varint_encode,
    zigzag_decode,
    zigzag_encode,
)
from osm_data_3d_tiles_ray.synth.generator import generate_shard


@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62 - 1),
        min_size=0,
        max_size=200,
    )
)
@settings(max_examples=50, deadline=None)
def test_varint_zigzag_roundtrip(vals):
    a = np.array(vals, dtype=np.int64)
    zz = zigzag_encode(a)
    back = zigzag_decode(varint_decode(varint_encode(zz), len(zz)))
    assert np.array_equal(back, a)


def test_compressed_equals_v1_decoded_exactly():
    """The codec's only loss is the shared quantization: decompressed soup
    must be bit-identical to what decode_tile(v1) produces."""
    rng = np.random.default_rng(11)
    v = 1800
    base = rng.random((v // 3, 3)) * 40
    pos = np.repeat(base, 3, axis=0) + rng.integers(0, 2, (v, 1)) * 0.25
    nrm = np.tile(np.eye(3), (v // 3, 1))
    uv = rng.random((v, 2)) * 2
    tid = rng.integers(0, 4, v).astype(np.uint8)
    bid = np.sort(rng.integers(0, 30, v)).astype(np.uint16)
    bbox = tuple(pos.min(axis=0)) + tuple(pos.max(axis=0))
    osm_ids = np.arange(30)
    from osm_data_3d_tiles_ray.stages.encode import encode_tile_row

    comp = compress_mesh(7, osm_ids, pos, nrm, uv, tid, bid, bbox)
    dec = decompress_mesh(comp)
    ref = decode_tile(encode_tile_row(7, osm_ids, pos, nrm, uv, tid, bid, bbox))
    for k in ("position", "normal", "uv", "texture_id", "batch_id"):
        assert np.array_equal(dec[k], ref[k]), k
    # deterministic bytes
    assert comp == compress_mesh(7, osm_ids, pos, nrm, uv, tid, bid, bbox)
    # welded index expands back to the soup
    assert len(dec["index"]) == v
    assert dec["header"]["n_vertices"] <= v


def test_empty_mesh_roundtrip():
    comp = compress_mesh(
        0,
        np.empty(0, np.int64),
        np.empty((0, 3)),
        np.empty((0, 3)),
        np.empty((0, 2)),
        np.empty(0, np.uint8),
        np.empty(0, np.uint16),
        (0, 0, 0, 1, 1, 1),
    )
    dec = decompress_mesh(comp)
    assert len(dec["position"]) == 0
    assert len(dec["index"]) == 0


def test_pipeline_compression_ratio(ray_session):
    """On real extruded tiles the weld + delta + deflate stack must beat the
    flat v1 payload substantially (reference welds then Draco-compresses,
    b3dmGenerator.ts:169-195)."""
    docs, _ = generate_shard(0, 300)
    tiles = accumulate_tiles(built_ds(ray.data.from_arrow(docs), emit_buffers=True))
    v1 = tiles.map_batches(encode_tiles, batch_format="pyarrow").to_pandas()
    comp = tiles.map_batches(
        encode_tiles_compressed, batch_format="pyarrow"
    ).to_pandas()
    assert set(comp["cell_id"]) == set(v1["cell_id"])
    merged = v1.merge(comp, on="cell_id", suffixes=("_v1", "_c"))
    # exact decode parity on a sample of real tiles
    checked = 0
    for row in merged.itertuples():
        d1 = decode_tile(row.payload_v1)
        dc = decompress_mesh(row.payload_c)
        for k in ("position", "normal", "uv", "texture_id", "batch_id"):
            assert np.array_equal(dc[k], d1[k]), k
        assert (
            dc["header"]["batchTable"]["osm_id"]
            == d1["header"]["batchTable"]["osm_id"]
        )
        checked += 1
        if checked >= 25:
            break
    assert checked > 0
    # aggregate size win: welded+compressed total well under the flat bodies
    total_v1 = merged["payload_bytes_v1"].sum()
    total_c = merged["payload_bytes_c"].sum()
    assert total_c < total_v1 * 0.7, (total_c, total_v1)
    assert (merged["unique_vertices"] <= merged["vertex_count_c"]).all()


def test_batch_size_invariance(ray_session):
    """Payload bytes must not depend on how tiles are batched."""
    docs, _ = generate_shard(3, 120)
    tiles = accumulate_tiles(built_ds(ray.data.from_arrow(docs), emit_buffers=True))
    tbl = pa.concat_tables(
        [b for b in tiles.iter_batches(batch_size=None, batch_format="pyarrow")]
    )
    whole = encode_tiles_compressed(tbl).to_pandas().set_index("cell_id")
    sliced = pa.concat_tables(
        [
            encode_tiles_compressed(tbl.slice(i, 7))
            for i in range(0, len(tbl), 7)
        ]
    ).to_pandas().set_index("cell_id")
    assert set(whole.index) == set(sliced.index)
    for cid in whole.index:
        assert whole.loc[cid, "payload"] == sliced.loc[cid, "payload"]


def test_compact_batching_bitwise_invariant(ray_session):
    """The across-tile batched compact codec must emit byte-identical
    per-tile payloads regardless of how tiles are grouped into calls
    (whole batch == per-tile slices == odd-sized slices)."""
    from osm_data_3d_tiles_ray.stages.accumulate import accumulate_tiles_compact
    from osm_data_3d_tiles_ray.stages.meshcodec import (
        encode_compact_tiles_compressed,
    )

    docs, _ = generate_shard(9, 150)
    tiles = accumulate_tiles_compact(
        built_ds(ray.data.from_arrow(docs), emit_buffers=True)
    )
    tbl = pa.concat_tables(
        [b for b in tiles.iter_batches(batch_size=None, batch_format="pyarrow")]
    )
    whole = encode_compact_tiles_compressed(tbl).to_pandas().set_index("cell_id")
    for step in (1, 7):
        sliced = pa.concat_tables(
            [
                encode_compact_tiles_compressed(tbl.slice(i, step))
                for i in range(0, len(tbl), step)
            ]
        ).to_pandas().set_index("cell_id")
        assert set(whole.index) == set(sliced.index)
        for cid in whole.index:
            assert whole.loc[cid, "payload"] == sliced.loc[cid, "payload"], step


def test_compact_path_matches_record_stream(ray_session):
    """The compact-shuffle codec stage must be lossless w.r.t. the building
    record stream: decompressed normal/uv/texture streams equal the record
    integers exactly, positions equal the tile-frame requantization of the
    dequantized records, batch ids follow osm order."""
    import struct as _struct

    from osm_data_3d_tiles_ray.stages.accumulate import (
        _REC_FMT,
        _REC_HEADER_SIZE,
        accumulate_tiles_compact,
    )
    from osm_data_3d_tiles_ray.stages.meshcodec import (
        encode_compact_tiles_compressed,
    )

    docs, _ = generate_shard(5, 200)
    tiles = accumulate_tiles_compact(
        built_ds(ray.data.from_arrow(docs), emit_buffers=True)
    )
    tbl = pa.concat_tables(
        [b for b in tiles.iter_batches(batch_size=None, batch_format="pyarrow")]
    )
    out = encode_compact_tiles_compressed(tbl)
    assert out.num_rows == tbl.num_rows
    checked = 0
    for i in range(min(20, tbl.num_rows)):
        blob = tbl.column("payload")[i].as_py()
        lens = tbl.column("blob_lengths")[i].as_py()
        bbox = [tbl.column(c)[i].as_py() for c in
                ("min_x", "min_y", "min_z", "max_x", "max_y", "max_z")]
        dec = decompress_mesh(out.column("payload")[i].as_py())
        qn_all, qu_all, tid_all, qp_all, bid_all = [], [], [], [], []
        off = 0
        for b_i, ln in enumerate(lens):
            _m, _osm, v, *bb = _struct.unpack_from(_REC_FMT, blob, off)
            p = off + _REC_HEADER_SIZE
            qp = np.frombuffer(blob, np.uint16, v * 3, p).reshape(v, 3)
            p += v * 6
            qn = np.frombuffer(blob, np.int8, v * 3, p).reshape(v, 3)
            p += v * 3
            qu = np.frombuffer(blob, np.uint16, v * 2, p).reshape(v, 2)
            p += v * 4
            tid = np.frombuffer(blob, np.uint8, v, p)
            mn_b = np.array(bb[:3]); ext_b = np.maximum(np.array(bb[3:]) - mn_b, 1e-12)
            pos = mn_b + qp.astype(np.float64) / 65535 * ext_b
            mn_t = np.array(bbox[:3])
            ext_t = np.where(np.array(bbox[3:]) > mn_t, np.array(bbox[3:]) - mn_t, 1.0)
            qp_all.append(np.floor(np.clip((pos - mn_t) / ext_t, 0, 1) * 65535 + 0.5).astype(np.uint16))
            qn_all.append(qn); qu_all.append(qu); tid_all.append(tid)
            bid_all.append(np.full(v, b_i, np.uint16))
            off += ln
        idx = dec["index"]
        assert np.array_equal(dec["vertices"]["q_normal"][idx], np.concatenate(qn_all))
        assert np.array_equal(dec["vertices"]["q_uv"][idx], np.concatenate(qu_all))
        assert np.array_equal(dec["texture_id"], np.concatenate(tid_all))
        assert np.array_equal(dec["vertices"]["q_position"][idx], np.concatenate(qp_all))
        assert np.array_equal(dec["batch_id"], np.concatenate(bid_all))
        checked += 1
    assert checked > 0
    # the size win carries over to the compact path
    assert (
        out.column("payload_bytes").to_numpy().sum()
        < 11 * out.column("vertex_count").to_numpy().sum() * 0.7
    )
