"""Per-tile geometry accumulation (A2/A3) + tile payload encoding.

Reference semantics: merge each tile's per-building SoA buffers into one
buffer set with a per-vertex ``batchId`` and per-building offsets
(``/root/reference/src/build3dBuilding.ts:95-112``,
``src/building/tile3d-features-to-buffers-converter.ts:334-388``), union
bounding boxes (``:576-585``), and record ``BATCH_LENGTH``
(``src/b3dmGenerator.ts:242``).

Two paths:

* :func:`tile_geometry_stats` — scalable stats (batch_length, vertex sums,
  bbox union) via per-batch partial combine + small groupby, never moving
  the vertex payload through the shuffle;
* :func:`accumulate_tiles` — the full payload merge: a cell-keyed
  ``map_key_partitions`` hash exchange + one in-task pass per partition
  producing one b3dm-style row per tile (buffers + columnar batch-table
  equivalents) — bounded dispatch count, never one ``map_groups`` call
  per cell.  At 100 TB the key is the uint64 Morton cell; skew from
  dense urban cells is bounded by the z16 cell size, with salting
  (cell_id ⊕ salt of osm_id) available for pathological cells
  (SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..geom.transforms import cell_to_tile


def _partial_tile_geom_stats(batch: pa.Table) -> pa.Table:
    cells = batch.column("cell_id").to_numpy(zero_copy_only=False)
    verts = batch.column("vertex_count").to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(cells, return_inverse=True)
    cnt = np.bincount(inv)
    vsum = np.bincount(inv, weights=verts).astype(np.int64)
    mins = np.full((len(uniq), 3), np.inf)
    maxs = np.full((len(uniq), 3), -np.inf)
    for j, name in enumerate(["min_x", "min_y", "min_z"]):
        col = batch.column(name).to_numpy(zero_copy_only=False)
        np.minimum.at(mins[:, j], inv, np.where(np.isnan(col), np.inf, col))
    for j, name in enumerate(["max_x", "max_y", "max_z"]):
        col = batch.column(name).to_numpy(zero_copy_only=False)
        np.maximum.at(maxs[:, j], inv, np.where(np.isnan(col), -np.inf, col))
    return pa.table(
        {
            "cell_id": pa.array(uniq, type=pa.uint64()),
            "p_count": pa.array(cnt.astype(np.int64)),
            "p_verts": pa.array(vsum),
            "p_min_x": pa.array(mins[:, 0]),
            "p_min_y": pa.array(mins[:, 1]),
            "p_min_z": pa.array(mins[:, 2]),
            "p_max_x": pa.array(maxs[:, 0]),
            "p_max_y": pa.array(maxs[:, 1]),
            "p_max_z": pa.array(maxs[:, 2]),
        }
    )


def _combine_partials(batch: pa.Table) -> pa.Table:
    """Merge partial stat rows sharing a cell (associative combine)."""
    cells = batch.column("cell_id").to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(cells, return_inverse=True)
    out = {"cell_id": pa.array(uniq, type=pa.uint64())}
    for name, op in [("p_count", "sum"), ("p_verts", "sum")]:
        col = batch.column(name).to_numpy(zero_copy_only=False)
        acc = np.bincount(inv, weights=col).astype(np.int64)
        out[name] = pa.array(acc)
    for name in ["p_min_x", "p_min_y", "p_min_z"]:
        col = batch.column(name).to_numpy(zero_copy_only=False)
        acc = np.full(len(uniq), np.inf)
        np.minimum.at(acc, inv, col)
        out[name] = pa.array(acc)
    for name in ["p_max_x", "p_max_y", "p_max_z"]:
        col = batch.column(name).to_numpy(zero_copy_only=False)
        acc = np.full(len(uniq), -np.inf)
        np.maximum.at(acc, inv, col)
        out[name] = pa.array(acc)
    return pa.table(out)


def tile_geometry_stats(built: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-building geometry rows → per-tile stats.

    Combiner-before-shuffle, then a hash-partitioned final combine: the
    per-block partial rows are bounded by the number of DISTINCT z16
    cells a block touches, and the only exchange is those partial rows
    keyed by cell-id hash (pipelines/partition.py — one vectorized
    ``_combine_partials`` call per partition).  No ``repartition(1)`` /
    single-block fan-in: at 100 TB the ≤ ~67M distinct cells spread over
    the partitions instead of one final block."""
    from ..pipelines.partition import map_key_partitions

    partial = built.map_batches(_partial_tile_geom_stats, batch_format="pyarrow")
    final = map_key_partitions(partial, ["cell_id"], _combine_partials)

    def finish(batch: pa.Table) -> pa.Table:
        cells = batch.column("cell_id").to_numpy(zero_copy_only=False)
        zoom, tx, ty = cell_to_tile(cells)
        cols = {
            "cell_id": batch.column("cell_id"),
            "tile_z": pa.array(zoom),
            "tile_x": pa.array(tx),
            "tile_y": pa.array(ty),
            "batch_length": batch.column("p_count"),
            "vertex_count": batch.column("p_verts"),
            "min_x": batch.column("p_min_x"),
            "min_y": batch.column("p_min_y"),
            "min_z": batch.column("p_min_z"),
            "max_x": batch.column("p_max_x"),
            "max_y": batch.column("p_max_y"),
            "max_z": batch.column("p_max_z"),
        }
        return pa.table(cols)

    return final.map_batches(finish, batch_format="pyarrow")


def _merge_tile_group(group: pa.Table) -> pa.Table:
    """One tile's buildings → one merged-payload row (A2).

    In-tile ordering — documented decision: the reference sorts features
    by ``zIndex`` (tile3d-features-to-buffers-converter.ts:587-591), but
    ``zIndex`` is never ASSIGNED anywhere in the reference, so its
    comparator evaluates ``undefined - undefined = NaN`` and the sort is
    an engine-defined no-op over arrival order.  The engine replaces that
    accident with a deterministic ascending ``osm_id`` order (stable
    across partitionings, salted/unsalted paths byte-equal — tested)."""
    n = len(group)
    osm = group.column("osm_id").to_numpy(zero_copy_only=False)
    order = np.argsort(osm, kind="stable")  # deterministic building order
    group = group.take(pa.array(order))
    osm = osm[order]

    def merged_list(colname: str) -> tuple[np.ndarray, np.ndarray]:
        col = group.column(colname)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = np.asarray(col.values)
        lens = np.diff(np.asarray(col.offsets))
        return flat, lens

    pos_flat, pos_lens = merged_list("position")
    uv_flat, _ = merged_list("uv")
    nrm_flat, _ = merged_list("normal")
    tid_flat, tid_lens = merged_list("texture_id")

    vert_counts = (pos_lens // 3).astype(np.int64)
    # u16 batch ids: a denser-than-65535-building cell must fail loudly
    # (route such cells through the salted path), not wrap silently
    assert n < 65536, f"tile has {n} buildings; batch_id is u16 — use the salted merge"
    batch_ids = np.repeat(np.arange(n, dtype=np.uint16), vert_counts)
    offsets = np.concatenate([[0], np.cumsum(vert_counts)]).astype(np.uint32)

    cell = group.column("cell_id")[0].as_py()
    verts_total = int(vert_counts.sum())
    mins = np.array(
        [group.column(c).to_numpy(zero_copy_only=False) for c in ("min_x", "min_y", "min_z")]
    )
    maxs = np.array(
        [group.column(c).to_numpy(zero_copy_only=False) for c in ("max_x", "max_y", "max_z")]
    )
    with np.errstate(invalid="ignore"):
        bb_min = np.nanmin(mins, axis=1)
        bb_max = np.nanmax(maxs, axis=1)

    def one_list(flat: np.ndarray, typ) -> pa.LargeListArray:
        return pa.LargeListArray.from_arrays(
            pa.array([0, len(flat)], type=pa.int64()), pa.array(flat, type=typ)
        )

    return pa.table(
        {
            "cell_id": pa.array([cell], type=pa.uint64()),
            "batch_length": pa.array([n], type=pa.int32()),
            "vertex_count": pa.array([verts_total], type=pa.int64()),
            "osm_ids": pa.LargeListArray.from_arrays(
                pa.array([0, n], type=pa.int64()), pa.array(osm, type=pa.int64())
            ),
            "vertex_offsets": pa.LargeListArray.from_arrays(
                pa.array([0, n + 1], type=pa.int64()),
                pa.array(offsets, type=pa.uint32()),
            ),
            "position": one_list(pos_flat, pa.float32()),
            "uv": one_list(uv_flat, pa.float32()),
            "normal": one_list(nrm_flat, pa.float32()),
            "texture_id": one_list(tid_flat, pa.uint8()),
            "batch_id": one_list(batch_ids, pa.uint16()),
            "min_x": pa.array([bb_min[0]]),
            "min_y": pa.array([bb_min[1]]),
            "min_z": pa.array([bb_min[2]]),
            "max_x": pa.array([bb_max[0]]),
            "max_y": pa.array([bb_max[1]]),
            "max_z": pa.array([bb_max[2]]),
        }
    )


import struct

_REC_MAGIC = b"OB3D"
# Keep this a plain format STRING, not a struct.Struct instance: the
# compiled `_struct.Struct` object cannot be cloudpickled, and once
# __ray_entry__ registers this package for pickle-by-value any Dataset
# stage referencing this module would die in serialization (round-1
# driver bench crash).  stdlib struct caches compiled formats
# internally, so pack/unpack_from on the string is just as fast.
_REC_FMT = "<4sqI6d"  # magic, osm_id, n_verts, bbox
_REC_HEADER_SIZE = struct.calcsize(_REC_FMT)


def encode_building_record(
    osm_id: int,
    positions: np.ndarray,
    normals: np.ndarray,
    uvs: np.ndarray,
    texture_ids: np.ndarray,
    bbox: tuple,
) -> bytes:
    """Lean per-building quantized record: 40B header + 11B/vertex
    (u16 pos ×3, i8 normal ×3, u16 uv ×2... packed as below)."""
    mn = np.array(bbox[:3])
    extent = np.maximum(np.array(bbox[3:]) - mn, 1e-12)
    q_pos = np.floor(np.clip((positions - mn) / extent, 0, 1) * 65535 + 0.5).astype(
        np.uint16
    )
    q_nrm = np.clip(np.floor(normals * 127 + 0.5), -127, 127).astype(np.int8)
    q_uv = np.floor((uvs % 1.0) * 65535 + 0.5).astype(np.uint16)
    return (
        struct.pack(_REC_FMT, _REC_MAGIC, int(osm_id), len(positions), *bbox)
        + q_pos.tobytes()
        + q_nrm.tobytes()
        + q_uv.tobytes()
        + texture_ids.astype(np.uint8).tobytes()
    )


def decode_building_record(blob: bytes) -> dict:
    magic, osm_id, v, *bbox = struct.unpack_from(_REC_FMT, blob, 0)
    assert magic == _REC_MAGIC
    off = _REC_HEADER_SIZE
    q_pos = np.frombuffer(blob, np.uint16, v * 3, off).reshape(v, 3)
    off += v * 6
    q_nrm = np.frombuffer(blob, np.int8, v * 3, off).reshape(v, 3)
    off += v * 3
    q_uv = np.frombuffer(blob, np.uint16, v * 2, off).reshape(v, 2)
    off += v * 4
    tid = np.frombuffer(blob, np.uint8, v, off)
    mn = np.array(bbox[:3])
    extent = np.maximum(np.array(bbox[3:]) - mn, 1e-12)
    return {
        "osm_id": osm_id,
        "bbox": bbox,
        "position": mn + q_pos.astype(np.float64) / 65535 * extent,
        "normal": q_nrm.astype(np.float64) / 127,
        "uv": q_uv.astype(np.float64) / 65535,
        "texture_id": tid,
    }


def compact_before_shuffle(batch: pa.Table) -> pa.Table:
    """Quantize per-building geometry into a single binary blob BEFORE the
    per-tile shuffle (the 100 TB trick: the cell groupby then moves ~11
    bytes/vertex instead of ~35).

    Output rows: (cell_id, osm_id, vertex_count, bbox cols, geom_blob).
    """
    n = len(batch)

    def flat(name):
        c = batch.column(name)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        return np.asarray(c.values), np.asarray(c.offsets).astype(np.int64)

    pos_flat, pos_offs = flat("position")
    nrm_flat, _ = flat("normal")
    uv_flat, uv_offs = flat("uv")
    tid_flat, tid_offs = flat("texture_id")
    osm = batch.column("osm_id").to_numpy(zero_copy_only=False)
    bb = np.stack(
        [
            batch.column(c).to_numpy(zero_copy_only=False)
            for c in ("min_x", "min_y", "min_z", "max_x", "max_y", "max_z")
        ],
        axis=1,
    )
    # NaN-bbox fallback, per building (same as the scalar encoder)
    bad = ~np.isfinite(bb).all(axis=1)
    if bad.any():
        bb = bb.copy()
        bb[bad] = (0.0, 0.0, 0.0, 1.0, 1.0, 1.0)
    mn = bb[:, :3]
    extent = np.maximum(bb[:, 3:] - mn, 1e-12)

    # Whole-batch quantization (bitwise-identical to the per-building
    # encode_building_record math — same op order on the same floats);
    # per-vertex mn/extent via repeat over the building's vertex count.
    verts = ((pos_offs[1:] - pos_offs[:-1]) // 3).astype(np.int64)
    mn_v = np.repeat(mn, verts, axis=0)
    ext_v = np.repeat(extent, verts, axis=0)
    q_pos = np.floor(
        np.clip((pos_flat.reshape(-1, 3) - mn_v) / ext_v, 0, 1) * 65535 + 0.5
    ).astype(np.uint16)
    q_nrm = np.clip(np.floor(nrm_flat * 127 + 0.5), -127, 127).astype(np.int8)
    q_uv = np.floor((uv_flat % 1.0) * 65535 + 0.5).astype(np.uint16)
    tid_u8 = tid_flat.astype(np.uint8)

    # Assemble all records into ONE buffer (header + 14 B/vertex each:
    # 6 pos + 3 normal + 4 uv + 1 texture id), then wrap zero-copy as a
    # large_binary column — no 200k-element Python bytes list, no
    # per-record numpy call overhead.
    rec_lens = _REC_HEADER_SIZE + verts * 14
    rec_offs = np.concatenate([[0], np.cumsum(rec_lens)])
    buf = bytearray(int(rec_offs[-1]))
    q_pos_b = q_pos.tobytes()
    q_nrm_b = q_nrm.tobytes()
    q_uv_b = q_uv.tobytes()
    tid_b = tid_u8.tobytes()
    mv = memoryview(buf)
    pack_into = struct.pack_into
    # plain-Python scalars for the assembly loop: numpy scalar extraction
    # per row costs more than the memcpy it guards
    osm_l = osm.tolist()
    bb_l = bb.tolist()
    verts_l = verts.tolist()
    rec_offs_l = rec_offs.tolist()
    pos_offs_l = pos_offs.tolist()
    uv_offs_l = uv_offs.tolist()
    tid_offs_l = tid_offs.tolist()
    for i in range(n):
        o = rec_offs_l[i]
        v = verts_l[i]
        pack_into(_REC_FMT, buf, o, _REC_MAGIC, osm_l[i], v, *bb_l[i])
        o += _REC_HEADER_SIZE
        p0 = pos_offs_l[i] * 2  # vertex*3 floats → *2 bytes per u16
        mv[o : o + v * 6] = q_pos_b[p0 : p0 + v * 6]
        o += v * 6
        p0 = pos_offs_l[i]  # vertex*3 int8 bytes
        mv[o : o + v * 3] = q_nrm_b[p0 : p0 + v * 3]
        o += v * 3
        p0 = uv_offs_l[i] * 2
        mv[o : o + v * 4] = q_uv_b[p0 : p0 + v * 4]
        o += v * 4
        p0 = tid_offs_l[i]
        mv[o : o + v] = tid_b[p0 : p0 + v]
    blob_col = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        n,
        [None, pa.py_buffer(rec_offs), pa.py_buffer(bytes(buf))],
    )
    keep = {
        "cell_id": batch.column("cell_id"),
        "osm_id": batch.column("osm_id"),
        "vertex_count": batch.column("vertex_count"),
        "min_x": batch.column("min_x"),
        "min_y": batch.column("min_y"),
        "min_z": batch.column("min_z"),
        "max_x": batch.column("max_x"),
        "max_y": batch.column("max_y"),
        "max_z": batch.column("max_z"),
        "geom_blob": blob_col,
    }
    return pa.table(keep)


def _merge_compact_group(group: pa.Table) -> pa.Table:
    """One tile's quantized building blobs → one compact tile row."""
    osm = group.column("osm_id").to_numpy(zero_copy_only=False)
    order = np.argsort(osm, kind="stable")
    group = group.take(pa.array(order))
    blobs = group.column("geom_blob").to_numpy(zero_copy_only=False)
    vcounts = group.column("vertex_count").to_numpy(zero_copy_only=False)
    payload = b"".join(blobs)
    lens = np.array([len(b) for b in blobs], dtype=np.int64)
    with np.errstate(invalid="ignore"):
        bb = {
            c: (
                np.nanmin(group.column(c).to_numpy(zero_copy_only=False))
                if c.startswith("min")
                else np.nanmax(group.column(c).to_numpy(zero_copy_only=False))
            )
            for c in ("min_x", "min_y", "min_z", "max_x", "max_y", "max_z")
        }
    n = len(group)
    return pa.table(
        {
            "cell_id": group.column("cell_id").slice(0, 1),
            "batch_length": pa.array([n], type=pa.int32()),
            "vertex_count": pa.array([int(vcounts.sum())], type=pa.int64()),
            "osm_ids": pa.LargeListArray.from_arrays(
                pa.array([0, n], type=pa.int64()),
                pa.array(np.sort(osm), type=pa.int64()),
            ),
            "blob_lengths": pa.LargeListArray.from_arrays(
                pa.array([0, n], type=pa.int64()), pa.array(lens, type=pa.int64())
            ),
            "payload": pa.array([payload], type=pa.large_binary()),
            **{k: pa.array([v]) for k, v in bb.items()},
        }
    )


def _merge_compact_partition(part: pa.Table) -> pa.Table:
    """Vectorized multi-cell merge of one hash partition of compact rows —
    the `map_key_partitions` replacement for one `_merge_compact_group`
    dispatch per z16 cell (cell count grows linearly with data: ~16k at
    sf0.1, millions at web scale — the >10k-tiny-groups shape CLAUDE.md
    forbids).  One (cell, osm) lexsort + `take` makes every cell's blobs
    CONTIGUOUS in the taken array's data buffer, so per-cell payloads are
    zero-copy offset slices; all list columns build from the same run
    boundaries; bbox mins/maxes are `fmin/fmax.reduceat` segment passes.
    Output rows are byte-identical to `_merge_compact_group` (tests)."""
    empty = pa.table(
        {
            "cell_id": pa.array([], type=pa.uint64()),
            "batch_length": pa.array([], type=pa.int32()),
            "vertex_count": pa.array([], type=pa.int64()),
            "osm_ids": pa.array([], type=pa.large_list(pa.int64())),
            "blob_lengths": pa.array([], type=pa.large_list(pa.int64())),
            "payload": pa.array([], type=pa.large_binary()),
            "min_x": pa.array([], type=pa.float64()),
            "min_y": pa.array([], type=pa.float64()),
            "min_z": pa.array([], type=pa.float64()),
            "max_x": pa.array([], type=pa.float64()),
            "max_y": pa.array([], type=pa.float64()),
            "max_z": pa.array([], type=pa.float64()),
        }
    )
    if len(part) == 0:
        return empty
    cell = part.column("cell_id").to_numpy(zero_copy_only=False)
    osm = part.column("osm_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((osm, cell))
    part = part.take(pa.array(order)).combine_chunks()
    cell, osm = cell[order], osm[order]
    n = len(part)
    starts = np.empty(n, bool)
    starts[0] = True
    starts[1:] = cell[1:] != cell[:-1]
    start_idx = np.nonzero(starts)[0]
    run_id = np.cumsum(starts) - 1
    n_cells = len(start_idx)
    row_bounds = np.concatenate([start_idx, [n]]).astype(np.int64)

    blob_col = part.column("geom_blob")
    if isinstance(blob_col, pa.ChunkedArray):
        blob_col = blob_col.combine_chunks()
    offs = np.frombuffer(blob_col.buffers()[1], np.int64)[
        blob_col.offset : blob_col.offset + n + 1
    ]
    lens = np.diff(offs)
    # per-cell payload = contiguous byte range of the taken data buffer
    payload_col = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        n_cells,
        [None, pa.py_buffer(offs[row_bounds].copy()), blob_col.buffers()[2]],
    )
    list_offs = pa.array(row_bounds, type=pa.int64())
    vcounts = part.column("vertex_count").to_numpy(zero_copy_only=False)
    bb = {}
    for c in ("min_x", "min_y", "min_z", "max_x", "max_y", "max_z"):
        v = part.column(c).to_numpy(zero_copy_only=False)
        red = np.fmin.reduceat if c.startswith("min") else np.fmax.reduceat
        bb[c] = red(v, start_idx)  # fmin/fmax skip NaN == nanmin/nanmax
    return pa.table(
        {
            "cell_id": pa.array(cell[start_idx]),
            "batch_length": pa.array(
                np.diff(row_bounds).astype(np.int32), type=pa.int32()
            ),
            "vertex_count": pa.array(np.add.reduceat(vcounts, start_idx)),
            "osm_ids": pa.LargeListArray.from_arrays(
                list_offs, pa.array(osm, type=pa.int64())
            ),
            "blob_lengths": pa.LargeListArray.from_arrays(
                list_offs, pa.array(lens, type=pa.int64())
            ),
            "payload": payload_col,
            **{k: pa.array(v) for k, v in bb.items()},
        }
    )


def accumulate_tiles_compact(
    built: "ray.data.Dataset",
    num_partitions: int | None = None,
    finish=None,
    pre_compacted: bool = False,
) -> "ray.data.Dataset":
    """Scale-path tile merge: quantize per building → shuffle compact blobs →
    concatenate per tile (≈2.5× less shuffle volume than the raw-buffer
    path; decode with stages.encode.decode_tile per building record).

    The merge runs as one vectorized pass per HASH PARTITION
    (`_merge_compact_partition`) — bounded dispatch count, never one
    `map_groups` call per cell.  ``num_partitions`` sizes the hash exchange
    (cell_id hashing spreads dense urban key RANGES uniformly, so per-task
    vertex counts balance without a row-count repartition); ``finish``, if
    given, runs on each partition's merged tiles INSIDE the same task, so
    a payload-consuming stage (e.g. the mesh codec) never materializes the
    merged payload blocks in the object store."""
    from ..pipelines.partition import map_key_partitions

    compact = (
        built
        if pre_compacted
        else built.map_batches(compact_before_shuffle, batch_format="pyarrow")
    )
    if finish is None:
        fn = _merge_compact_partition
    else:

        def fn(part: pa.Table) -> pa.Table:
            return finish(_merge_compact_partition(part))

    kw = {} if num_partitions is None else {"num_partitions": num_partitions}
    return map_key_partitions(compact, ["cell_id"], fn, **kw)


_TILE_ROW_SCHEMA = pa.schema(
    [
        ("cell_id", pa.uint64()),
        ("batch_length", pa.int32()),
        ("vertex_count", pa.int64()),
        ("osm_ids", pa.large_list(pa.int64())),
        ("vertex_offsets", pa.large_list(pa.uint32())),
        ("position", pa.large_list(pa.float32())),
        ("uv", pa.large_list(pa.float32())),
        ("normal", pa.large_list(pa.float32())),
        ("texture_id", pa.large_list(pa.uint8())),
        ("batch_id", pa.large_list(pa.uint16())),
        ("min_x", pa.float64()),
        ("min_y", pa.float64()),
        ("min_z", pa.float64()),
        ("max_x", pa.float64()),
        ("max_y", pa.float64()),
        ("max_z", pa.float64()),
    ]
)

_PARTIAL_ROW_SCHEMA = pa.schema(
    [
        ("cell_id", pa.uint64()),
        ("p_osm_ids", pa.large_list(pa.int64())),
        ("p_vcounts", pa.large_list(pa.int64())),
        ("p_min_x", pa.large_list(pa.float64())),
        ("p_min_y", pa.large_list(pa.float64())),
        ("p_min_z", pa.large_list(pa.float64())),
        ("p_max_x", pa.large_list(pa.float64())),
        ("p_max_y", pa.large_list(pa.float64())),
        ("p_max_z", pa.large_list(pa.float64())),
        ("position", pa.large_list(pa.float32())),
        ("uv", pa.large_list(pa.float32())),
        ("normal", pa.large_list(pa.float32())),
        ("texture_id", pa.large_list(pa.uint8())),
    ]
)


def _per_key_runs(part: pa.Table, key_cols, merge_one, empty_schema) -> pa.Table:
    """One hash partition → sort by key, slice contiguous key runs, merge
    each run with ``merge_one`` — the in-task replacement for one
    ``map_groups`` DISPATCH per tiny group (~1 ms each; forbidden above
    10k groups, CLAUDE.md).  The per-run Python call remains, but inside
    one task over an already co-located partition its cost is a plain
    function call, not a Ray dispatch."""
    if len(part) == 0:
        return empty_schema.empty_table()
    part = part.sort_by([(c, "ascending") for c in key_cols])
    keys = [part.column(c).to_numpy(zero_copy_only=False) for c in key_cols]
    mask = np.zeros(len(part), dtype=bool)
    mask[0] = True
    for k in keys:
        mask[1:] |= k[1:] != k[:-1]
    bounds = np.append(np.flatnonzero(mask), len(part))
    merged = [
        merge_one(part.slice(s, e - s))
        for s, e in zip(bounds[:-1], bounds[1:])
    ]
    return pa.concat_tables(merged)


def accumulate_tiles(
    built: "ray.data.Dataset", n_salt: int = 0
) -> "ray.data.Dataset":
    """Shuffle #2 (raw-buffer path): one merged b3dm-equivalent row per
    tile.  The scale default is :func:`accumulate_tiles_compact`; this
    variant keeps the raw float32 list columns (reference-parity encode,
    serve's single-tile recompute, b3dm export).

    Exchange shape matches the compact path since round 5: a cell-keyed
    ``map_key_partitions`` hash exchange with one task per partition and
    an in-task loop over contiguous cell runs — never one ``map_groups``
    dispatch per z16 cell (cell count grows with data: millions at web
    scale, the >10k-tiny-groups shape CLAUDE.md forbids; VERDICT r4
    item 4).

    ``n_salt > 0`` enables the dense-urban-cell skew path (north rule): a
    first (cell, salt)-keyed exchange merges bounded sub-groups (salt =
    osm_id % n_salt, deterministic), then a second cell-keyed exchange
    merges the ≤ n_salt partial payloads per cell — no single reduce task
    ever sees a whole hot cell's raw rows.  Output is identical to the
    unsalted path (buildings are re-sorted by osm_id at the final merge)."""
    from ..pipelines.partition import map_key_partitions

    if n_salt <= 0:

        def merge_cells(part: pa.Table) -> pa.Table:
            return _per_key_runs(
                part, ["cell_id"], _merge_tile_group, _TILE_ROW_SCHEMA
            )

        return map_key_partitions(built, ["cell_id"], merge_cells)

    def add_salt(batch: pa.Table) -> pa.Table:
        osm = batch.column("osm_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "salt", pa.array((osm % n_salt).astype(np.int32))
        )

    def merge_partials(part: pa.Table) -> pa.Table:
        return _per_key_runs(
            part,
            ["cell_id", "salt"],
            lambda g: _merge_partial_group(g.drop_columns(["salt"])),
            _PARTIAL_ROW_SCHEMA,
        )

    def merge_salted(part: pa.Table) -> pa.Table:
        return _per_key_runs(
            part, ["cell_id"], _merge_merged_group, _TILE_ROW_SCHEMA
        )

    phase1 = map_key_partitions(
        built.map_batches(add_salt, batch_format="pyarrow"),
        ["cell_id", "salt"],
        merge_partials,
    )
    return map_key_partitions(phase1, ["cell_id"], merge_salted)


def _merge_partial_group(group: pa.Table) -> pa.Table:
    """Phase-1 salted merge: ONE row per (cell, salt) — buffers concatenated
    in osm_id order, with per-building metadata lists so phase 2 can
    re-sort across salts deterministically."""
    osm = group.column("osm_id").to_numpy(zero_copy_only=False)
    order = np.argsort(osm, kind="stable")
    group = group.take(pa.array(order))
    osm = osm[order]
    n = len(group)

    def flat(colname):
        col = group.column(colname)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return np.asarray(col.values), np.diff(np.asarray(col.offsets)).astype(np.int64)

    pos_flat, pos_lens = flat("position")
    uv_flat, _ = flat("uv")
    nrm_flat, _ = flat("normal")
    tid_flat, _ = flat("texture_id")
    vcounts = pos_lens // 3

    def one_list(vals, typ):
        return pa.LargeListArray.from_arrays(
            pa.array([0, len(vals)], type=pa.int64()), pa.array(vals, type=typ)
        )

    def scalar_list(name, typ):
        vals = group.column(name).to_numpy(zero_copy_only=False)
        return one_list(vals, typ)

    return pa.table(
        {
            "cell_id": group.column("cell_id").slice(0, 1),
            "p_osm_ids": one_list(osm, pa.int64()),
            "p_vcounts": one_list(vcounts, pa.int64()),
            "p_min_x": scalar_list("min_x", pa.float64()),
            "p_min_y": scalar_list("min_y", pa.float64()),
            "p_min_z": scalar_list("min_z", pa.float64()),
            "p_max_x": scalar_list("max_x", pa.float64()),
            "p_max_y": scalar_list("max_y", pa.float64()),
            "p_max_z": scalar_list("max_z", pa.float64()),
            "position": one_list(pos_flat, pa.float32()),
            "uv": one_list(uv_flat, pa.float32()),
            "normal": one_list(nrm_flat, pa.float32()),
            "texture_id": one_list(tid_flat, pa.uint8()),
        }
    )


def _merge_merged_group(group: pa.Table) -> pa.Table:
    """Phase-2 salted merge: ≤ n_salt partial payloads per cell → the final
    tile row, re-sorted by osm_id across salts (output identical to the
    unsalted path)."""

    def lists(name):
        col = group.column(name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return [np.asarray(col[i].values) for i in range(len(col))]

    osm_parts = lists("p_osm_ids")
    vc_parts = lists("p_vcounts")
    pos_parts = lists("position")
    uv_parts = lists("uv")
    nrm_parts = lists("normal")
    tid_parts = lists("texture_id")

    all_osm = np.concatenate(osm_parts)
    all_vc = np.concatenate(vc_parts)
    part_of = np.repeat(np.arange(len(osm_parts)), [len(o) for o in osm_parts])
    # vertex start of each building within its partial
    local_start = np.concatenate(
        [np.concatenate([[0], np.cumsum(v)[:-1]]) for v in vc_parts]
    ).astype(np.int64)
    order = np.argsort(all_osm, kind="stable")

    pos_chunks, uv_chunks, nrm_chunks, tid_chunks = [], [], [], []
    for j in order:
        p, s, c = part_of[j], local_start[j], all_vc[j]
        pos_chunks.append(pos_parts[p][s * 3 : (s + c) * 3])
        uv_chunks.append(uv_parts[p][s * 2 : (s + c) * 2])
        nrm_chunks.append(nrm_parts[p][s * 3 : (s + c) * 3])
        tid_chunks.append(tid_parts[p][s : s + c])

    n = len(all_osm)
    assert n < 65536, f"tile has {n} buildings; batch_id is u16"
    osm_sorted = all_osm[order]
    vc_sorted = all_vc[order]
    offsets = np.concatenate([[0], np.cumsum(vc_sorted)]).astype(np.uint32)
    batch_ids = np.repeat(np.arange(n, dtype=np.uint16), vc_sorted)
    bb = {}
    for name in ["min_x", "min_y", "min_z", "max_x", "max_y", "max_z"]:
        parts = np.concatenate(lists(f"p_{name}"))
        with np.errstate(invalid="ignore"):
            bb[name] = (
                np.nanmin(parts) if name.startswith("min") else np.nanmax(parts)
            )

    def one_list(vals, typ):
        return pa.LargeListArray.from_arrays(
            pa.array([0, len(vals)], type=pa.int64()), pa.array(vals, type=typ)
        )

    cell = group.column("cell_id")[0].as_py()
    return pa.table(
        {
            "cell_id": pa.array([cell], type=pa.uint64()),
            "batch_length": pa.array([n], type=pa.int32()),
            "vertex_count": pa.array([int(vc_sorted.sum())], type=pa.int64()),
            "osm_ids": one_list(osm_sorted, pa.int64()),
            "vertex_offsets": one_list(offsets, pa.uint32()),
            "position": one_list(
                np.concatenate(pos_chunks) if pos_chunks else np.empty(0, np.float32),
                pa.float32(),
            ),
            "uv": one_list(
                np.concatenate(uv_chunks) if uv_chunks else np.empty(0, np.float32),
                pa.float32(),
            ),
            "normal": one_list(
                np.concatenate(nrm_chunks) if nrm_chunks else np.empty(0, np.float32),
                pa.float32(),
            ),
            "texture_id": one_list(
                np.concatenate(tid_chunks) if tid_chunks else np.empty(0, np.uint8),
                pa.uint8(),
            ),
            "batch_id": one_list(batch_ids, pa.uint16()),
            "min_x": pa.array([bb["min_x"]]),
            "min_y": pa.array([bb["min_y"]]),
            "min_z": pa.array([bb["min_z"]]),
            "max_x": pa.array([bb["max_x"]]),
            "max_y": pa.array([bb["max_y"]]),
            "max_z": pa.array([bb["max_z"]]),
        }
    )
