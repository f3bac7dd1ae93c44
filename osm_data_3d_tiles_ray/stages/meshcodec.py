"""Draco-equivalent mesh compression (the reference's weld + KHR_draco step).

The reference welds each tile mesh and Draco-compresses it inside the glb
(``/root/reference/src/b3dmGenerator.ts:169-195``: ``weld({tolerance:
1e-10})`` then ``KHRDracoMeshCompression`` with EDGEBREAKER and
``quantizationVolume: "scene"``).  Draco itself is not available in this
environment, so this module is a from-scratch codec built on the same
published ideas Draco uses (quantization + connectivity reuse + prediction
+ entropy coding), implemented with numpy + stdlib zlib only:

1. **Quantize** attributes exactly like the OT3D v1 payload
   (``stages/encode.py``): position u16/bbox, normal i8, uv u16-fract.
2. **Weld** on the *quantized* tuple (lossless w.r.t. the quantized
   representation, and strictly more merges than a float weld) →
   unique-vertex table in first-use order + uint32 triangle index list.
3. **Predict + pack**: every stream is delta-encoded against its
   predecessor (first-use order makes consecutive vertices spatially
   close, so deltas are small), zigzag-mapped to unsigned, and packed as
   LEB128 varints — both directions fully vectorized (no per-value Python).
4. **Entropy-code** the concatenated streams with zlib (DEFLATE).

``decompress_mesh`` is an exact inverse of steps 2–4: the decoded indexed
mesh expands to a triangle soup whose quantized values are bit-identical
to what OT3D v1 stores for the same input, so the codec's loss is exactly
the v1 quantization loss and nothing more (tests assert this).

Payload layout (magic "OT3C"):

    [4s "OT3C"][u32 version][u32 json_len][json header]
    [u32 zlib_len][zlib(deflate) of the concatenated varint streams]

The json header carries bbox and the index/vertex counts; all streams are
delta+zigzag'd then varint-packed through ONE vectorized pass (stream
boundaries are implied by the counts), so encode/decode cost is a handful
of numpy calls per tile regardless of stream count.
"""

from __future__ import annotations

import json
import struct
import zlib

import numpy as np
import pyarrow as pa

MAGIC = b"OT3C"
VERSION = 1

# stream order inside the inflated buffer (each delta+zigzag+varint packed)
_STREAMS = (
    "index",
    "pos_x",
    "pos_y",
    "pos_z",
    "nrm_x",
    "nrm_y",
    "nrm_z",
    "uv_u",
    "uv_v",
    "texture_id",
    "batch_id",
)


# ---------------------------------------------------------------- varint ---


def zigzag_encode(v: np.ndarray) -> np.ndarray:
    """int64 → uint64 zigzag (0,-1,1,-2 → 0,1,2,3)."""
    v = v.astype(np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(u & np.uint64(1)).astype(
        np.int64
    )


_VARINT_CHUNK = 1_000_000
_VARINT_SCRATCH: dict = {}


def _varint_scratch(name: str, size: int, dtype) -> "np.ndarray":
    """Per-process reusable scratch buffer (each Ray worker/actor process
    owns its copy; tasks in a worker run serially, so no aliasing)."""
    buf = _VARINT_SCRATCH.get(name)
    if buf is None or len(buf) < size:
        buf = np.empty(size, dtype)
        _VARINT_SCRATCH[name] = buf
    return buf


def _varint_encode_arr(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized LEB128 core: uint64 values → (packed uint8 array,
    per-value byte counts).  Per-value encoding is position-independent, so
    callers may concatenate outputs of independent calls freely."""
    v = vals.astype(np.uint64)
    n = len(v)
    if n == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    # bytes needed per value: 1 + floor(bit_length-1 / 7); bound the scan
    # by the actual max so small-delta streams cost 1-2 passes, not 9
    max_k = max(1, (int(v.max()).bit_length() + 6) // 7)
    if max_k == 1:
        return v.astype(np.uint8), np.ones(n, np.int64)
    # chunked scatter into per-process reusable scratch: one whole-array
    # pass first-touches O(n*k) fresh pages per call — the documented
    # page-fault killer (CLAUDE.md) that regressed tile_compression 2-4x;
    # 1M-value chunks keep temps warm across chunks AND across calls
    # (measured 4-6x over both the whole-array scatter and the (n, max_k)
    # matrix forms at 20M values, byte-identical)
    chunk = _VARINT_CHUNK
    sc = _varint_scratch("cmp", chunk, np.bool_)
    st = _varint_scratch("st", chunk, np.int64)
    nb = np.empty(n, np.int64)
    for s0 in range(0, n, chunk):
        s1 = min(n, s0 + chunk)
        vv = v[s0:s1]
        nbc = nb[s0:s1]
        nbc[:] = 1
        for k in range(1, max_k):
            np.greater_equal(
                vv, np.uint64(1) << np.uint64(7 * k), out=sc[: s1 - s0]
            )
            nbc += sc[: s1 - s0]
    out = np.empty(int(nb.sum()), np.uint8)
    pos = 0
    for s0 in range(0, n, chunk):
        s1 = min(n, s0 + chunk)
        m_ = s1 - s0
        vv = v[s0:s1]
        nbc = nb[s0:s1]
        np.cumsum(nbc, out=st[:m_])
        st[:m_] -= nbc
        sz = int(st[m_ - 1] + nbc[m_ - 1])
        oc = out[pos : pos + sz]
        oc[:] = 0
        for j in range(max_k):
            mm = nbc > j
            byte = ((vv[mm] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(
                np.uint8
            )
            cont = (nbc[mm] > j + 1).astype(np.uint8)
            oc[st[:m_][mm] + j] = byte | (cont << 7)
        pos += sz
    return out, nb


def varint_encode(vals: np.ndarray) -> bytes:
    """Vectorized LEB128: uint64 values → packed bytes (7 payload bits per
    byte, high bit = continuation)."""
    return _varint_encode_arr(vals)[0].tobytes()


def varint_decode(buf: bytes, n: int) -> np.ndarray:
    """Vectorized LEB128 decode of exactly ``n`` values."""
    if n == 0:
        return np.empty(0, np.uint64)
    b = np.frombuffer(buf, np.uint8)
    term = (b & 0x80) == 0
    # value index for each byte = terminators strictly before it
    val_id = np.cumsum(term) - term
    # byte position within its value
    starts_mask = np.empty(len(b), bool)
    starts_mask[0] = True
    starts_mask[1:] = term[:-1]
    start_pos = np.flatnonzero(starts_mask)
    pos_in_val = np.arange(len(b)) - np.repeat(
        start_pos, np.diff(np.r_[start_pos, len(b)])
    )
    vals = np.zeros(n, np.uint64)
    contrib = (b & 0x7F).astype(np.uint64) << (
        np.uint64(7) * pos_in_val.astype(np.uint64)
    )
    np.add.at(vals, val_id, contrib)
    return vals


_ENC_CHUNK = 1 << 21  # 2M values: temporaries stay ~16 MB → warm reuse


def _pack_streams(streams: list[np.ndarray]) -> bytes:
    """Delta each stream vs its predecessor, then zigzag + varint ALL
    streams through one vectorized pass per CHUNK (one numpy pass instead
    of 11 — per-call overhead dominates on per-tile-sized arrays; chunking
    keeps every temporary small enough for the allocator to reuse warm
    pages — a multi-million-vertex tile otherwise first-touches gigabytes
    of int64 temporaries and page faults dominate the codec ~10×)."""
    deltas = [
        np.diff(s.astype(np.int64), prepend=np.int64(0)) for s in streams
    ]
    allv = np.concatenate(deltas) if deltas else np.empty(0, np.int64)
    if len(allv) <= _ENC_CHUNK:
        return varint_encode(zigzag_encode(allv))
    parts = []
    for o in range(0, len(allv), _ENC_CHUNK):
        parts.append(varint_encode(zigzag_encode(allv[o : o + _ENC_CHUNK])))
    return b"".join(parts)


def _unpack_streams(buf: bytes, counts: list[int]) -> list[np.ndarray]:
    total = int(sum(counts))
    d = zigzag_decode(varint_decode(buf, total))
    out, pos = [], 0
    for n in counts:
        out.append(np.cumsum(d[pos : pos + n]))
        pos += n
    return out


# ----------------------------------------------------------- quantization ---


def _quantize(
    positions: np.ndarray,
    normals: np.ndarray,
    uvs: np.ndarray,
    bbox: tuple[float, float, float, float, float, float],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Identical quantizer to encode.encode_tile_row (u16/bbox, i8, u16)."""
    mn = np.array(bbox[:3])
    mx = np.array(bbox[3:])
    extent = np.where(mx > mn, mx - mn, 1.0)
    q_pos = np.clip((positions - mn) / extent, 0, 1)
    q_pos = np.floor(q_pos * 65535 + 0.5).astype(np.uint16)
    q_nrm = np.clip(np.floor(normals * 127 + 0.5), -127, 127).astype(np.int8)
    q_uv = np.floor((uvs % 1.0) * 65535 + 0.5).astype(np.uint16)
    return q_pos, q_nrm, q_uv


# ----------------------------------------------------------------- codec ---


def compress_mesh(
    cell_id: int,
    osm_ids: np.ndarray,
    positions: np.ndarray,  # (v, 3) float
    normals: np.ndarray,  # (v, 3) float
    uvs: np.ndarray,  # (v, 2) float
    texture_ids: np.ndarray,  # (v,) uint8
    batch_ids: np.ndarray,  # (v,) uint16
    bbox: tuple[float, float, float, float, float, float],
    zlevel: int = 6,
) -> bytes:
    q_pos, q_nrm, q_uv = _quantize(positions, normals, uvs, bbox)
    return compress_mesh_quantized(
        cell_id, osm_ids, q_pos, q_nrm, q_uv, texture_ids, batch_ids, bbox, zlevel
    )


def compress_mesh_quantized(
    cell_id: int,
    osm_ids: np.ndarray,
    q_pos: np.ndarray,  # (v, 3) uint16
    q_nrm: np.ndarray,  # (v, 3) int8
    q_uv: np.ndarray,  # (v, 2) uint16
    texture_ids: np.ndarray,  # (v,) uint8
    batch_ids: np.ndarray,  # (v,) uint16
    bbox: tuple[float, float, float, float, float, float],
    zlevel: int = 6,
) -> bytes:
    """Codec entry for ALREADY-quantized attribute streams (the compact
    shuffle records carry these directly — requantizing through floats
    would lose uv==65535 to the fract wrap)."""
    v = len(q_pos)

    # weld on the quantized tuple (11 bytes/vertex), first-use order
    rec = np.zeros(
        v,
        dtype=[
            ("p", np.uint16, 3),
            ("n", np.int8, 3),
            ("t", np.uint16, 2),
            ("x", np.uint8),
            ("b", np.uint16),
        ],
    )
    if v:
        rec["p"], rec["n"], rec["t"] = q_pos, q_nrm, q_uv
        rec["x"], rec["b"] = texture_ids, batch_ids
    # weld via 2×uint64-key lexsort: native-int sort is several× faster
    # than np.unique's void-dtype row sort on this shape (the packed
    # attribute struct is exactly 16 bytes/vertex)
    assert rec.itemsize == 16
    keys = rec.view(np.uint64).reshape(v, 2)
    if v:
        srt = np.lexsort((keys[:, 1], keys[:, 0]))  # stable → min original
        ks = keys[srt]
        new_grp = np.empty(v, bool)
        new_grp[0] = True
        new_grp[1:] = (ks[1:, 0] != ks[:-1, 0]) | (ks[1:, 1] != ks[:-1, 1])
        grp_of_sorted = np.cumsum(new_grp) - 1
        inverse = np.empty(v, np.int64)
        inverse[srt] = grp_of_sorted
        first_idx = srt[new_grp]  # first original index per sorted group
        order = np.argsort(first_idx, kind="stable")
        remap = np.empty(len(order), np.uint32)
        remap[order] = np.arange(len(order), dtype=np.uint32)
        sel = first_idx[order]
        index = remap[inverse]
    else:
        sel = np.empty(0, np.int64)
        index = np.empty(0, np.uint32)
    u = len(sel)

    streams = [
        index,
        q_pos[sel, 0],
        q_pos[sel, 1],
        q_pos[sel, 2],
        q_nrm[sel, 0],
        q_nrm[sel, 1],
        q_nrm[sel, 2],
        q_uv[sel, 0],
        q_uv[sel, 1],
        texture_ids[sel] if v else np.empty(0, np.uint8),
        batch_ids[sel] if v else np.empty(0, np.uint16),
    ]
    blob = _pack_streams(streams)
    comp = zlib.compress(blob, zlevel)
    return _wrap_payload(cell_id, osm_ids, bbox, len(index), u, comp)


def _wrap_payload(cell_id, osm_ids, bbox, n_index, n_vertices, comp) -> bytes:
    """Header + framing shared by the single-tile and batched encoders —
    parity between the two paths is by construction."""
    header = {
        "featureTable": {"BATCH_LENGTH": int(len(osm_ids))},
        "batchTable": {"osm_id": [int(x) for x in osm_ids]},
        "cell_id": int(cell_id),
        "bbox": [float(x) for x in bbox],
        "n_index": int(n_index),
        "n_vertices": int(n_vertices),
        "quantization": {"position": "u16/bbox", "normal": "i8", "uv": "u16-fract"},
    }
    j = json.dumps(header, separators=(",", ":")).encode()
    return b"".join(
        (
            MAGIC,
            struct.pack("<II", VERSION, len(j)),
            j,
            struct.pack("<I", len(comp)),
            comp,
        )
    )


def decompress_mesh(payload: bytes) -> dict:
    """Exact inverse of :func:`compress_mesh`.

    Returns the indexed mesh (``index`` + unique-vertex attribute arrays,
    quantized domain and dequantized floats) plus ``position``/``normal``/
    ``uv``/``texture_id``/``batch_id`` expanded to the original triangle
    soup — bit-identical in the quantized domain to OT3D v1."""
    assert payload[:4] == MAGIC
    version, jlen = struct.unpack_from("<II", payload, 4)
    assert version == VERSION
    off = 12
    header = json.loads(payload[off : off + jlen])
    off += jlen
    (clen,) = struct.unpack_from("<I", payload, off)
    off += 4
    blob = zlib.decompress(payload[off : off + clen])

    n_idx = header["n_index"]
    u = header["n_vertices"]
    counts = [n_idx] + [u] * (len(_STREAMS) - 1)
    vals = dict(zip(_STREAMS, _unpack_streams(blob, counts)))

    index = vals["index"].astype(np.uint32)
    q_pos = np.stack(
        [vals["pos_x"], vals["pos_y"], vals["pos_z"]], axis=1
    ).astype(np.uint16)
    q_nrm = np.stack(
        [vals["nrm_x"], vals["nrm_y"], vals["nrm_z"]], axis=1
    ).astype(np.int8)
    q_uv = np.stack([vals["uv_u"], vals["uv_v"]], axis=1).astype(np.uint16)
    tid = vals["texture_id"].astype(np.uint8)
    bid = vals["batch_id"].astype(np.uint16)

    bbox = header["bbox"]
    mn = np.array(bbox[:3])
    mx = np.array(bbox[3:])
    extent = np.where(mx > mn, mx - mn, 1.0)
    dq_pos = mn + q_pos.astype(np.float64) / 65535 * extent
    dq_nrm = q_nrm.astype(np.float64) / 127
    dq_uv = q_uv.astype(np.float64) / 65535
    return {
        "header": header,
        "index": index,
        "vertices": {
            "q_position": q_pos,
            "q_normal": q_nrm,
            "q_uv": q_uv,
            "position": dq_pos,
            "normal": dq_nrm,
            "uv": dq_uv,
            "texture_id": tid,
            "batch_id": bid,
        },
        # expanded triangle soup (original vertex order)
        "position": dq_pos[index],
        "normal": dq_nrm[index],
        "uv": dq_uv[index],
        "texture_id": tid[index],
        "batch_id": bid[index],
    }


# ------------------------------------------------------------- map stage ---


def _flat_list_columns(
    batch: pa.Table, names: tuple[str, ...]
) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """List columns → (flat numpy values, int64 row offsets), combined ONCE
    per batch.  Per-row ``combine_chunks``/scalar access is ~10 ms per call
    on chunked large_list columns — 50× the actual codec work."""
    out = {}
    for name in names:
        c = batch.column(name)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        out[name] = (
            np.asarray(c.values),
            np.asarray(c.offsets).astype(np.int64),
        )
    return out


def encode_tiles_compressed(batch: pa.Table) -> pa.Table:
    """map_batches stage: merged per-tile rows → compressed OT3C payloads.

    Same input contract as ``encode.encode_tiles``; adds the welded
    unique-vertex count and the compression ratio vs the flat 11 B/vertex
    v1 body so the size win is observable per tile."""
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
    payloads, n_unique = [], []
    for i in range(len(batch)):

        def col(name):
            flat, off = cols[name]
            return flat[off[i] : off[i + 1]]

        pos = col("position").reshape(-1, 3)
        payload = compress_mesh(
            int(cell_ids[i]),
            col("osm_ids"),
            pos,
            col("normal").reshape(-1, 3),
            col("uv").reshape(-1, 2),
            col("texture_id"),
            col("batch_id"),
            tuple(bounds[i]),
        )
        payloads.append(payload)
        _, jlen = struct.unpack_from("<II", payload, 4)
        hdr = json.loads(payload[12 : 12 + jlen])
        n_unique.append(hdr["n_vertices"])

    vcount = batch.column("vertex_count").to_numpy()
    raw_body = 11 * vcount  # OT3D v1 body bytes/vertex
    sizes = np.array([len(p) for p in payloads], dtype=np.int64)
    return pa.table(
        {
            "cell_id": batch.column("cell_id"),
            "batch_length": batch.column("batch_length"),
            "vertex_count": batch.column("vertex_count"),
            "unique_vertices": pa.array(np.asarray(n_unique, dtype=np.int64)),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "payload_bytes": pa.array(sizes),
            "compression_ratio": pa.array(
                np.where(sizes > 0, raw_body / np.maximum(sizes, 1), 0.0)
            ),
        }
    )


def encode_compact_tiles_compressed(batch: pa.Table) -> pa.Table:
    """map_batches stage over ``accumulate_tiles_compact`` rows (the 100 TB
    write path): compress each merged tile directly from its quantized
    building-record stream instead of a raw float-soup merge.

    Only positions are requantized (building frame → common tile frame,
    the same math as :func:`_quantize` on the dequantized coordinates);
    normal / uv / texture-id streams pass through as the integers the
    compact records already carry, and per-vertex batch ids derive from
    the osm_id-sorted building order — identical to the raw-path
    assignment.  The raw-path :func:`encode_tiles_compressed` remains as
    the reference-parity variant (reference compresses the float mesh,
    b3dmGenerator.ts:169-195); this stage is what a production seed run
    would execute, because the floats it would consume no longer exist
    after the compact shuffle.

    Fully batched ACROSS tiles (per-tile numpy-call overhead dominated the
    codec at ~2k verts/tile: 11 ``np.diff`` + one ``varint_encode`` + one
    lexsort PER TILE was ~4× the actual byte work).  One pass per batch:
    records of every tile decode through one seg-gather each; the weld is
    ONE global lexsort keyed (tile, vertex-key); deltas reset at each
    (tile, stream) segment boundary; one chunked zigzag+varint pass emits
    per-value byte lengths so per-tile payload slices fall out of a cumsum.
    Per-tile output bytes are bit-identical to
    :func:`compress_mesh_quantized` (tests assert equality).

    The batch is processed in tile-aligned slices of ≤ ``_V_CHUNK``
    vertices: the vectorized passes build index temporaries ~20× the
    vertex count in bytes, and unbounded slices make every concurrent
    task first-touch hundreds of MB of fresh pages — which serializes
    host-wide (measured 10× task-time blowup at 32-way concurrency).
    Bounded slices keep each task's working set inside warm allocator
    pages (same trade as ``_KnnPartial``)."""
    T = len(batch)
    if T == 0:
        return _empty_compressed_table()
    vc = batch.column("vertex_count").to_numpy(zero_copy_only=False)
    out_parts = []
    start = 0
    acc = 0
    for i in range(T):
        if acc + int(vc[i]) > _V_CHUNK and i > start:
            out_parts.append(_encode_compact_slice(batch.slice(start, i - start)))
            start, acc = i, 0
        acc += int(vc[i])
    out_parts.append(_encode_compact_slice(batch.slice(start, T - start)))
    return (
        out_parts[0] if len(out_parts) == 1 else pa.concat_tables(out_parts)
    )


_V_CHUNK = 1 << 17  # 131072 verts per internal slice (~20 MB of temporaries)


def _encode_compact_slice(batch: pa.Table) -> pa.Table:
    from .accumulate import _REC_HEADER_SIZE, _REC_MAGIC

    batch = batch.combine_chunks()
    T = len(batch)
    payload_col = batch.column("payload")
    if isinstance(payload_col, pa.ChunkedArray):
        payload_col = payload_col.combine_chunks()
    lens_col = batch.column("blob_lengths")
    if isinstance(lens_col, pa.ChunkedArray):
        lens_col = lens_col.combine_chunks()
    osm_col = batch.column("osm_ids")
    if isinstance(osm_col, pa.ChunkedArray):
        osm_col = osm_col.combine_chunks()
    cell_ids = batch.column("cell_id").to_numpy(zero_copy_only=False)
    bounds = np.stack(
        [
            batch.column(c).to_numpy(zero_copy_only=False)
            for c in ("min_x", "min_y", "min_z", "max_x", "max_y", "max_z")
        ],
        axis=1,
    )
    magic_bytes = np.frombuffer(_REC_MAGIC, np.uint8)

    # --- flatten every row's blob zero-copy: one raw byte array + offsets
    raw = np.frombuffer(payload_col.buffers()[2], np.uint8)
    row_off = np.frombuffer(payload_col.buffers()[1], np.int64)[
        payload_col.offset : payload_col.offset + T + 1
    ]
    lens_flat = np.asarray(lens_col.values).astype(np.int64)
    lens_offs = np.asarray(lens_col.offsets).astype(np.int64)
    n_rec = np.diff(lens_offs)
    R = len(lens_flat)
    w = np.cumsum(lens_flat) - lens_flat  # global prefix of record lens
    # reset the prefix at each row start → within-row record offsets
    # (clamp: a trailing zero-record row has start index == R; its repeat
    # count is 0, so the clamped value is never used)
    w_first = (
        w[np.minimum(lens_offs[:-1], R - 1)] if R else np.empty(0, np.int64)
    )
    rec_start = np.repeat(row_off[:-1], n_rec) + (w - np.repeat(w_first, n_rec))

    # --- decode records in BOUNDED chunks into preallocated outputs.
    # An all-at-once decode allocates int64 gather indices PER PAYLOAD
    # BYTE plus full-width float64 requantize temporaries — a dense-urban
    # cell (observed: one z16 cell with 20,185 buildings / 19.4M vertices
    # at sf0.4, the north rule's skew case) peaked above 20 GB of fresh
    # pages and serialized the host.  Chunked decode holds the peak near
    # the preallocated outputs (~20 B/vertex) regardless of tile size;
    # per-record/elementwise math is unchanged, so outputs stay
    # bit-identical (tests assert parity with compress_mesh_quantized).
    hdr = raw[rec_start[:, None] + np.arange(_REC_HEADER_SIZE)]
    assert (hdr[:, :4] == magic_bytes).all()
    verts = hdr[:, 12:16].copy().view(np.uint32).ravel().astype(np.int64)
    bboxes = hdr[:, 16:64].copy().view(np.float64).reshape(-1, 6)
    base = rec_start + _REC_HEADER_SIZE

    tile_of_rec = np.repeat(np.arange(T, dtype=np.int32), n_rec)
    v_counts = np.bincount(tile_of_rec, weights=verts, minlength=T).astype(np.int64)
    N = int(verts.sum())
    v_off_rec = np.concatenate([[0], np.cumsum(verts)])  # vertex offset per record

    # N-sized working arrays come from per-process reusable scratch (the
    # _KnnPartial pattern): numpy frees >128 KB blocks back to the OS, so
    # per-task np.empty would first-touch fresh pages on EVERY partition
    # task — measured as the dominant cost of the fused merge+codec stage
    # at 32-way concurrency (concurrent faulting serializes host-wide)
    qp_t = _varint_scratch("enc_qp_t", N * 3, np.uint16)[: N * 3].reshape(N, 3)
    qn = _varint_scratch("enc_qn", N * 3, np.int8)[: N * 3].reshape(N, 3)
    qu = _varint_scratch("enc_qu", N * 2, np.uint16)[: N * 2].reshape(N, 2)
    tid = _varint_scratch("enc_tid", N, np.uint8)[:N]
    bid = _varint_scratch("enc_bid", N, np.uint16)[:N]
    tile_of_v = _varint_scratch("enc_tov", N, np.int32)[:N]
    mn_t = bounds[:, :3]
    ext_t = np.where(bounds[:, 3:] > mn_t, bounds[:, 3:] - mn_t, 1.0)
    rec_first = np.concatenate([[0], np.cumsum(n_rec)[:-1]])
    rec_local = (np.arange(R) - np.repeat(rec_first, n_rec)).astype(np.uint16)

    r0 = 0
    while r0 < R:
        # grow the record window until ~_V_CHUNK vertices
        r1 = int(np.searchsorted(v_off_rec, v_off_rec[r0] + _V_CHUNK, side="left"))
        r1 = min(max(r1, r0 + 1), R)
        vc = verts[r0:r1]
        v0, v1 = int(v_off_rec[r0]), int(v_off_rec[r1])
        bc = base[r0:r1]
        # attribute gathers land DIRECTLY in the preallocated arrays
        # (uint8 views of the destination slices) — no fresh temporaries
        qp_c = _seg_gather(
            raw, bc, vc * 6,
            out=_varint_scratch("enc_qp_c", (v1 - v0) * 6, np.uint8),
        ).view(np.uint16).reshape(-1, 3)
        _seg_gather(
            raw, bc + vc * 6, vc * 3,
            out=qn[v0:v1].reshape(-1).view(np.uint8),
        )
        _seg_gather(
            raw, bc + vc * 9, vc * 4,
            out=qu[v0:v1].reshape(-1).view(np.uint8),
        )
        _seg_gather(raw, bc + vc * 13, vc, out=tid[v0:v1])
        rec_of_c = np.repeat(np.arange(r0, r1), vc)
        tv = tile_of_rec[rec_of_c]
        tile_of_v[v0:v1] = tv
        bid[v0:v1] = rec_local[rec_of_c]
        # dequantize to each building frame, requantize to its tile frame
        # (same op order as the per-tile path — bit-identical floats)
        mn_b = bboxes[:, :3][rec_of_c]
        ext_b = np.maximum(bboxes[:, 3:] - bboxes[:, :3], 1e-12)[rec_of_c]
        pos = mn_b + qp_c.astype(np.float64) / 65535 * ext_b
        qp_t[v0:v1] = np.floor(
            np.clip((pos - mn_t[tv]) / ext_t[tv], 0, 1) * 65535 + 0.5
        ).astype(np.uint16)
        r0 = r1

    # --- global weld: one lexsort keyed (tile, packed 16-byte vertex)
    _rec16_dtype = np.dtype(
        [
            ("p", np.uint16, 3),
            ("n", np.int8, 3),
            ("t", np.uint16, 2),
            ("x", np.uint8),
            ("b", np.uint16),
        ]
    )
    rec16 = (
        _varint_scratch("enc_rec16", N * 16, np.uint8)[: N * 16]
        .view(_rec16_dtype)
    )
    if N:
        # every byte of the 16-B record is covered by a field assignment,
        # so scratch reuse needs no zeroing (itemsize asserted below)
        rec16["p"], rec16["n"], rec16["t"] = qp_t, qn, qu
        rec16["x"], rec16["b"] = tid, bid
    keys = rec16.view(np.uint64).reshape(N, 2)
    if N:
        srt = np.lexsort((keys[:, 1], keys[:, 0], tile_of_v))
        ks0, ks1, ts = keys[srt, 0], keys[srt, 1], tile_of_v[srt]
        new_grp = np.empty(N, bool)
        new_grp[0] = True
        new_grp[1:] = (ts[1:] != ts[:-1]) | (ks0[1:] != ks0[:-1]) | (ks1[1:] != ks1[:-1])
        grp_of_sorted = np.cumsum(new_grp) - 1
        inverse = np.empty(N, np.int64)
        inverse[srt] = grp_of_sorted
        first_idx = srt[new_grp]  # min original index per group (stable)
        grp_tile = ts[new_grp]
    else:
        inverse = np.empty(0, np.int64)
        first_idx = np.empty(0, np.int64)
        grp_tile = np.empty(0, np.int64)
    G = len(first_idx)
    u_counts = np.bincount(grp_tile, minlength=T).astype(np.int64)
    g_off = np.concatenate([[0], np.cumsum(u_counts)])
    # first-use order: tiles own disjoint ascending row ranges, so one
    # global argsort of first_idx is tile-major first-use order
    order = np.argsort(first_idx, kind="stable")
    rank = np.empty(G, np.int64)
    rank[order] = np.arange(G)
    local = rank - g_off[grp_tile]  # first-use index WITHIN the tile
    index_all = local[inverse]  # per original vertex (tile-contiguous)
    sel = first_idx[order]  # unique verts, tile-major, first-use order

    # --- delta + zigzag + varint per STREAM (stream-major: contiguous
    # arrays, no scatter), with delta resets at each tile boundary; each
    # stream's per-value byte counts give per-(stream, tile) byte slices
    # that reassemble tile-major with 11 memoryview slices per tile
    v_off = np.concatenate([[0], np.cumsum(v_counts)])
    streams = (
        (index_all, v_off),
        (qp_t[sel, 0], g_off), (qp_t[sel, 1], g_off), (qp_t[sel, 2], g_off),
        (qn[sel, 0], g_off), (qn[sel, 1], g_off), (qn[sel, 2], g_off),
        (qu[sel, 0], g_off), (qu[sel, 1], g_off),
        (tid[sel], g_off), (bid[sel], g_off),
    )
    stream_bytes: list[memoryview] = []
    stream_boff: list[np.ndarray] = []
    for vals, off in streams:
        L = len(vals)
        # delta buffers from scratch too: 11 streams × 2 int64 arrays per
        # call would otherwise re-fault fresh pages on every task
        s64 = _varint_scratch("enc_s64", L, np.int64)[:L]
        np.copyto(s64, vals, casting="unsafe")
        d = _varint_scratch("enc_dl", L, np.int64)[:L]
        np.copyto(d, s64)
        if L:
            d[1:] -= s64[:-1]
            starts = off[:-1][off[:-1] < L]
            d[starts] = s64[starts]
        nb = _varint_scratch("enc_nb", L, np.int64)[:L]
        parts = []
        for o in range(0, L, _ENC_CHUNK):
            bts, nbc = _varint_encode_arr(zigzag_encode(d[o : o + _ENC_CHUNK]))
            parts.append(bts)
            nb[o : o + len(nbc)] = nbc
        big = np.concatenate(parts) if parts else np.empty(0, np.uint8)
        stream_bytes.append(memoryview(big.tobytes()))
        stream_boff.append(np.concatenate([[0], np.cumsum(nb)])[off])

    osm_flat = np.asarray(osm_col.values).astype(np.int64)
    osm_offs = np.asarray(osm_col.offsets).astype(np.int64)
    payloads = []
    for i in range(T):
        blob = b"".join(
            sb[int(bo[i]) : int(bo[i + 1])]
            for sb, bo in zip(stream_bytes, stream_boff)
        )
        comp = zlib.compress(blob, 6)
        payloads.append(
            _wrap_payload(
                int(cell_ids[i]),
                osm_flat[osm_offs[i] : osm_offs[i + 1]],
                tuple(bounds[i]),
                int(v_counts[i]),
                int(u_counts[i]),
                comp,
            )
        )

    vcount = batch.column("vertex_count").to_numpy(zero_copy_only=False)
    sizes = np.array([len(p) for p in payloads], dtype=np.int64)
    return pa.table(
        {
            "cell_id": batch.column("cell_id"),
            "batch_length": batch.column("batch_length"),
            "vertex_count": batch.column("vertex_count"),
            "unique_vertices": pa.array(u_counts),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "payload_bytes": pa.array(sizes),
            "compression_ratio": pa.array(
                np.where(sizes > 0, 11 * vcount / np.maximum(sizes, 1), 0.0)
            ),
        }
    )


def _seg_gather(
    raw: np.ndarray,
    starts: np.ndarray,
    nbytes: np.ndarray,
    out: np.ndarray | None = None,
) -> np.ndarray:
    """``raw[concat(arange(s, s+n) for s, n in zip(starts, nbytes))]``.

    Index construction is ONE reusable int64 scratch + an in-place
    cumsum of per-byte steps (boundary jumps scattered at segment ends)
    — the previous arange + double-repeat shape built three fresh int64
    temporaries per gathered byte, ~288 B of first-touch traffic per
    vertex across the four attribute gathers (the documented page-fault
    killer).  ``out`` gathers straight into a caller buffer (e.g. a
    preallocated attribute array viewed as uint8) instead of allocating."""
    total = int(nbytes.sum())
    if total == 0:
        return np.empty(0, np.uint8) if out is None else out[:0]
    if not (nbytes > 0).all():
        keep = nbytes > 0
        starts, nbytes = starts[keep], nbytes[keep]
    idx = _varint_scratch("gather_idx", total, np.int64)[:total]
    idx[:] = 1
    ends = np.cumsum(nbytes)
    idx[0] = starts[0]
    if len(starts) > 1:
        idx[ends[:-1]] = starts[1:] - (starts[:-1] + nbytes[:-1]) + 1
    np.cumsum(idx, out=idx)
    if out is None:
        return raw[idx]
    np.take(raw, idx, out=out[:total])
    return out[:total]


def _empty_compressed_table() -> pa.Table:
    return pa.table(
        {
            "cell_id": pa.array([], type=pa.uint64()),
            "batch_length": pa.array([], type=pa.int32()),
            "vertex_count": pa.array([], type=pa.int64()),
            "unique_vertices": pa.array([], type=pa.int64()),
            "payload": pa.array([], type=pa.large_binary()),
            "payload_bytes": pa.array([], type=pa.int64()),
            "compression_ratio": pa.array([], type=pa.float64()),
        }
    )
