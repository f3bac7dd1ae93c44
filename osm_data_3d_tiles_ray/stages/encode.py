"""b3dm-equivalent tile payload encoding (S6 + the Draco stand-in).

The reference packs each tile as b3dm: glb + feature table JSON
(``{BATCH_LENGTH: n}``) + a columnar batch table
(``/root/reference/src/b3dmGenerator.ts:197-249``), with Draco compression
(``:169-195``).  Draco is not available here, so the engine's stand-in is
**bbox-relative uint16 quantization** of positions (+ int8 normals, uint16
UVs) behind this module's interface — the payload layout is:

    [4s magic "OT3D"][u32 version][u32 json_len][json (feature+batch table)]
    [u32 n_vertices]
    [position  u16 ×3 per vertex (bbox-normalized)]
    [normal    i8  ×3]
    [uv        u16 ×2 (fract-normalized)]
    [texture_id u8]
    [batch_id  u16]

``decode_tile`` round-trips for testing; quantization error ≤ bbox_extent /
65535 per axis.
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pyarrow as pa

MAGIC = b"OT3D"
VERSION = 1


def encode_tile_row(
    cell_id: int,
    osm_ids: np.ndarray,
    positions: np.ndarray,  # (v, 3) float32
    normals: np.ndarray,
    uvs: np.ndarray,
    texture_ids: np.ndarray,
    batch_ids: np.ndarray,
    bbox: tuple[float, float, float, float, float, float],
) -> bytes:
    v = len(positions)
    mn = np.array(bbox[:3])
    mx = np.array(bbox[3:])
    extent = np.where(mx > mn, mx - mn, 1.0)
    q_pos = np.clip((positions - mn) / extent, 0, 1)
    q_pos = np.floor(q_pos * 65535 + 0.5).astype(np.uint16)
    q_nrm = np.clip(np.floor(normals * 127 + 0.5), -127, 127).astype(np.int8)
    q_uv = np.floor((uvs % 1.0) * 65535 + 0.5).astype(np.uint16)

    header = {
        "featureTable": {"BATCH_LENGTH": int(len(osm_ids))},
        "batchTable": {"osm_id": [int(x) for x in osm_ids]},
        "cell_id": int(cell_id),
        "bbox": [float(x) for x in bbox],
        "quantization": {"position": "u16/bbox", "normal": "i8", "uv": "u16-fract"},
    }
    j = json.dumps(header, separators=(",", ":")).encode()
    out = bytearray()
    out += MAGIC
    out += struct.pack("<II", VERSION, len(j))
    out += j
    out += struct.pack("<I", v)
    out += q_pos.tobytes()
    out += q_nrm.tobytes()
    out += q_uv.tobytes()
    out += texture_ids.astype(np.uint8).tobytes()
    out += batch_ids.astype(np.uint16).tobytes()
    return bytes(out)


def decode_tile(payload: bytes) -> dict:
    assert payload[:4] == MAGIC
    version, jlen = struct.unpack_from("<II", payload, 4)
    assert version == VERSION
    off = 12
    header = json.loads(payload[off : off + jlen])
    off += jlen
    (v,) = struct.unpack_from("<I", payload, off)
    off += 4
    q_pos = np.frombuffer(payload, dtype=np.uint16, count=v * 3, offset=off).reshape(v, 3)
    off += v * 6
    q_nrm = np.frombuffer(payload, dtype=np.int8, count=v * 3, offset=off).reshape(v, 3)
    off += v * 3
    q_uv = np.frombuffer(payload, dtype=np.uint16, count=v * 2, offset=off).reshape(v, 2)
    off += v * 4
    tid = np.frombuffer(payload, dtype=np.uint8, count=v, offset=off)
    off += v
    bid = np.frombuffer(payload, dtype=np.uint16, count=v, offset=off)
    bbox = header["bbox"]
    mn = np.array(bbox[:3])
    mx = np.array(bbox[3:])
    extent = np.where(mx > mn, mx - mn, 1.0)
    return {
        "header": header,
        "position": mn + q_pos.astype(np.float64) / 65535 * extent,
        "normal": q_nrm.astype(np.float64) / 127,
        "uv": q_uv.astype(np.float64) / 65535,
        "texture_id": tid,
        "batch_id": bid,
    }


def encode_tiles(batch: pa.Table) -> pa.Table:
    """map_batches stage: merged per-tile rows → binary payload column.

    List columns are flattened to (values, offsets) numpy pairs ONCE per
    batch — per-row chunked-scalar access costs ~10 ms/row on large_list
    columns, dwarfing the actual packing work."""
    from .meshcodec import _flat_list_columns

    cols = _flat_list_columns(
        batch, ("position", "normal", "uv", "texture_id", "batch_id", "osm_ids")
    )
    cell_ids = batch.column("cell_id").to_numpy(zero_copy_only=False)
    bounds = np.stack(
        [
            batch.column(c).to_numpy(zero_copy_only=False)
            for c in ("min_x", "min_y", "min_z", "max_x", "max_y", "max_z")
        ],
        axis=1,
    )
    payloads = []
    for i in range(len(batch)):

        def col(name):
            flat, off = cols[name]
            return flat[off[i] : off[i + 1]]

        pos = col("position").reshape(-1, 3)
        payloads.append(
            encode_tile_row(
                int(cell_ids[i]),
                col("osm_ids"),
                pos,
                col("normal").reshape(-1, 3),
                col("uv").reshape(-1, 2),
                col("texture_id"),
                col("batch_id"),
                tuple(bounds[i]),
            )
        )
    return pa.table(
        {
            "cell_id": batch.column("cell_id"),
            "batch_length": batch.column("batch_length"),
            "vertex_count": batch.column("vertex_count"),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "payload_bytes": pa.array(
                np.array([len(p) for p in payloads], dtype=np.int64)
            ),
        }
    )
