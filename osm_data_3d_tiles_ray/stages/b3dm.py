"""Spec-layout b3dm / glb container writer (S6 export path).

The reference wraps each tile's mesh as a Cesium 3D-Tiles ``b3dm``: a glb
(three.js GLTFExporter + Draco) plus feature-table and batch-table JSON via
``TileFormats.createB3dmTileDataFromGlb``
(``/root/reference/src/b3dmGenerator.ts:197-249``).  This module emits the
same container layout from raw byte-packing — no glTF/Draco library — so a
Cesium-family client can read the engine's tiles:

* ``build_glb``: a minimal valid glTF 2.0 binary — one buffer (BIN chunk),
  bufferViews/accessors for POSITION / NORMAL / TEXCOORD_0 / _BATCHID, one
  non-indexed triangle primitive, JSON chunk padded with 0x20 to 4 bytes,
  BIN chunk padded with 0x00, glb length a multiple of 8.
* ``build_b3dm``: 28-byte b3dm header (magic/version/byteLength + the four
  table lengths), feature-table JSON padded with spaces to 8-byte
  alignment from the start of the tile, batch-table JSON likewise, then
  the glb — total byteLength a multiple of 8 (3D Tiles 1.0 §Batched3DModel).
* ``parse_b3dm`` / ``parse_glb``: validating readers used by the tests.

Draco compression itself stays out of scope (no codec in this sandbox);
the engine's compact storage payload remains ``encode.py``'s quantized
``OT3D`` record — this module is the interoperable EXPORT container.
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pyarrow as pa

_GLB_MAGIC = b"glTF"
_B3DM_MAGIC = b"b3dm"

_F32 = 5126  # glTF componentType FLOAT
_U16 = 5123  # UNSIGNED_SHORT


def _pad_to(data: bytes, align: int, pad_byte: bytes) -> bytes:
    rem = len(data) % align
    if rem:
        data += pad_byte * (align - rem)
    return data


def build_glb(
    positions: np.ndarray,  # (v, 3) float
    normals: np.ndarray,  # (v, 3) float
    uvs: np.ndarray,  # (v, 2) float
    batch_ids: np.ndarray,  # (v,) int
) -> bytes:
    """Minimal valid glTF 2.0 binary with one non-indexed TRIANGLES
    primitive carrying POSITION / NORMAL / TEXCOORD_0 / _BATCHID."""
    v = len(positions)
    pos = np.ascontiguousarray(positions, dtype=np.float32)
    nrm = np.ascontiguousarray(normals, dtype=np.float32)
    uv = np.ascontiguousarray(uvs, dtype=np.float32)
    bid = np.ascontiguousarray(batch_ids, dtype=np.uint16)

    views = []
    accessors = []
    bin_parts: list[bytes] = []
    offset = 0

    def add_view(arr: np.ndarray, ctype: int, atype: str, normalized: bool = False):
        nonlocal offset
        raw = arr.tobytes()
        views.append(
            {"buffer": 0, "byteOffset": offset, "byteLength": len(raw), "target": 34962}
        )
        acc = {
            "bufferView": len(views) - 1,
            "componentType": ctype,
            "count": int(len(arr)),
            "type": atype,
        }
        if atype == "VEC3" and ctype == _F32 and arr is pos:
            acc["min"] = [float(x) for x in arr.min(axis=0)] if len(arr) else [0, 0, 0]
            acc["max"] = [float(x) for x in arr.max(axis=0)] if len(arr) else [0, 0, 0]
        accessors.append(acc)
        bin_parts.append(raw)
        # glTF requires accessor byteOffset % componentSize == 0; keep every
        # view 4-byte aligned
        pad = (-len(raw)) % 4
        if pad:
            bin_parts.append(b"\x00" * pad)
        offset += len(raw) + pad
        return len(accessors) - 1

    a_pos = add_view(pos, _F32, "VEC3")
    a_nrm = add_view(nrm, _F32, "VEC3")
    a_uv = add_view(uv, _F32, "VEC2")
    a_bid = add_view(bid, _U16, "SCALAR")

    bin_chunk = _pad_to(b"".join(bin_parts), 4, b"\x00")

    gltf = {
        "asset": {"version": "2.0", "generator": "osm_data_3d_tiles_ray"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [
            {
                "primitives": [
                    {
                        "attributes": {
                            "POSITION": a_pos,
                            "NORMAL": a_nrm,
                            "TEXCOORD_0": a_uv,
                            "_BATCHID": a_bid,
                        },
                        "mode": 4,
                        "material": 0,
                    }
                ]
            }
        ],
        "materials": [
            {
                "pbrMetallicRoughness": {
                    "baseColorFactor": [1.0, 1.0, 1.0, 1.0],
                    "metallicFactor": 0.0,
                    "roughnessFactor": 1.0,
                },
                "doubleSided": False,
            }
        ],
        "buffers": [{"byteLength": len(bin_chunk)}],
        "bufferViews": views,
        "accessors": accessors,
    }
    json_chunk = _pad_to(json.dumps(gltf, separators=(",", ":")).encode(), 4, b" ")

    total = 12 + 8 + len(json_chunk) + 8 + len(bin_chunk)
    # keep the whole glb 8-byte aligned (b3dm requires the glb to start AND
    # end on 8-byte boundaries) by growing the BIN chunk's zero padding
    extra = (-total) % 8
    if extra:
        bin_chunk += b"\x00" * extra
        gltf["buffers"][0]["byteLength"] = len(bin_chunk)
        json_chunk = _pad_to(json.dumps(gltf, separators=(",", ":")).encode(), 4, b" ")
        total = 12 + 8 + len(json_chunk) + 8 + len(bin_chunk)
        extra2 = (-total) % 8
        if extra2:  # JSON length change may shift alignment once more
            bin_chunk += b"\x00" * extra2
            gltf["buffers"][0]["byteLength"] = len(bin_chunk)
            json_chunk = _pad_to(
                json.dumps(gltf, separators=(",", ":")).encode(), 4, b" "
            )
            total = 12 + 8 + len(json_chunk) + 8 + len(bin_chunk)
    assert total % 8 == 0, total

    out = bytearray()
    out += _GLB_MAGIC
    out += struct.pack("<II", 2, total)
    out += struct.pack("<I", len(json_chunk)) + b"JSON" + json_chunk
    out += struct.pack("<I", len(bin_chunk)) + b"BIN\x00" + bin_chunk
    return bytes(out)


def parse_glb(data: bytes) -> dict:
    """Validating glb reader: header, chunk walk, accessor reconstruction."""
    assert data[:4] == _GLB_MAGIC, "bad glb magic"
    version, length = struct.unpack_from("<II", data, 4)
    assert version == 2 and length == len(data)
    off = 12
    chunks = {}
    while off < length:
        clen, ctype = struct.unpack_from("<I4s", data, off)
        chunks[ctype] = data[off + 8 : off + 8 + clen]
        off += 8 + clen
    gltf = json.loads(chunks[b"JSON"])
    binc = chunks.get(b"BIN\x00", b"")

    def read_accessor(idx: int) -> np.ndarray:
        acc = gltf["accessors"][idx]
        view = gltf["bufferViews"][acc["bufferView"]]
        dt = {_F32: np.float32, _U16: np.uint16}[acc["componentType"]]
        ncomp = {"SCALAR": 1, "VEC2": 2, "VEC3": 3}[acc["type"]]
        start = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
        arr = np.frombuffer(binc, dtype=dt, count=acc["count"] * ncomp, offset=start)
        return arr.reshape(-1, ncomp) if ncomp > 1 else arr

    attrs = gltf["meshes"][0]["primitives"][0]["attributes"]
    return {
        "gltf": gltf,
        "position": read_accessor(attrs["POSITION"]),
        "normal": read_accessor(attrs["NORMAL"]),
        "uv": read_accessor(attrs["TEXCOORD_0"]),
        "batch_id": read_accessor(attrs["_BATCHID"]),
    }


def build_b3dm(
    glb: bytes, feature_table: dict, batch_table: dict | None = None
) -> bytes:
    """Wrap a glb in the Batched3DModel container (3D Tiles 1.0):
    28-byte header, space-padded feature/batch table JSON (8-byte aligned
    from tile start), glb, total length a multiple of 8."""
    ft_json = json.dumps(feature_table, separators=(",", ":")).encode()
    # the END of the feature table JSON must land on an 8-byte boundary
    # from the start of the tile (header is 28 B → pad to 28+len ≡ 0 mod 8)
    rem = (28 + len(ft_json)) % 8
    if rem:
        ft_json += b" " * (8 - rem)
    bt_json = b""
    if batch_table:
        bt_json = json.dumps(batch_table, separators=(",", ":")).encode()
        rem = (28 + len(ft_json) + len(bt_json)) % 8
        if rem:
            bt_json += b" " * (8 - rem)
    body = ft_json + bt_json + glb
    total = 28 + len(body)
    pad = (-total) % 8
    body += b"\x00" * pad  # glb tail zero-padding keeps byteLength % 8 == 0
    total += pad
    header = _B3DM_MAGIC + struct.pack(
        "<IIIIII", 1, total, len(ft_json), 0, len(bt_json), 0
    )
    assert len(header) == 28
    return header + body


def parse_b3dm(data: bytes) -> dict:
    """Validating b3dm reader (header fields + byte-length invariants)."""
    assert data[:4] == _B3DM_MAGIC, "bad b3dm magic"
    (version, byte_length, ftj, ftb, btj, btb) = struct.unpack_from("<IIIIII", data, 4)
    assert version == 1
    assert byte_length == len(data), (byte_length, len(data))
    off = 28
    feature_table = json.loads(data[off : off + ftj]) if ftj else {}
    off += ftj + ftb
    batch_table = json.loads(data[off : off + btj]) if btj else {}
    off += btj + btb
    glb = data[off:byte_length]
    # strip the b3dm's trailing zero padding before glb length validation
    glb_len = struct.unpack_from("<I", glb, 8)[0] if len(glb) >= 12 else 0
    return {
        "version": version,
        "byte_length": byte_length,
        "feature_table": feature_table,
        "batch_table": batch_table,
        "glb": glb[:glb_len],
    }


_OSM_URL_TYPES = {"node": "node", "way": "way", "relation": "relation"}


def encode_tiles_b3dm(batch: pa.Table) -> pa.Table:
    """map_batches stage: merged per-tile rows → spec-layout b3dm payloads
    (the interoperable sibling of ``encode.encode_tiles``'s compact OT3D).

    Feature table: ``{"BATCH_LENGTH": n}``; batch table carries per-building
    ``osm_id`` and ``osm_url`` (b3dmGenerator.ts:227-249)."""
    from .meshcodec import _flat_list_columns

    cols = _flat_list_columns(
        batch, ("position", "normal", "uv", "batch_id", "osm_ids")
    )
    payloads = []
    for i in range(len(batch)):

        def col(name):
            flat, off = cols[name]
            return flat[off[i] : off[i + 1]]

        osm_ids = col("osm_ids")
        glb = build_glb(
            col("position").reshape(-1, 3),
            col("normal").reshape(-1, 3),
            col("uv").reshape(-1, 2),
            col("batch_id"),
        )
        payloads.append(
            build_b3dm(
                glb,
                {"BATCH_LENGTH": int(len(osm_ids))},
                {
                    "osm_id": [int(x) for x in osm_ids],
                    "osm_url": [
                        f"https://www.openstreetmap.org/way/{int(x)}" for x in osm_ids
                    ],
                },
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
