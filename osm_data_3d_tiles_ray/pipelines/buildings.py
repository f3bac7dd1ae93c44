"""The flagship end-to-end pipeline: documents → parsed buildings →
per-building 3D geometry (actor pool) → per-tile merge → tileset tree.

Ray-native restatement of the reference's ``seed-b3dm`` path
(``/root/reference/seed-b3dm.ts:14-39`` — which is a sequential per-tile
loop) as a streaming Dataset job (SURVEY.md §3.4):

    read_parquet(documents)
      → map_batches(parse_documents)             # S2/M5-M7
      → map_batches(Build3D, concurrency=pool)   # M3/M4/G6-G17, actor pool
      → groupby(cell_id) merge / partial stats   # A1/A2/A3 (shuffle #2)
      → write_parquet(per-tile payloads)         # S6, deterministic layout
      + driver-side tileset JSON fan-in          # A6/S5
"""

from __future__ import annotations

import functools

import pyarrow as pa

import ray.data

from ..stages.accumulate import (
    _merge_compact_partition,
    _merge_tile_group,
    accumulate_tiles,
    compact_before_shuffle,
    tile_geometry_stats,
)
from ..stages.build3d import Build3D, Build3DCompact, Build3DStats
from ..stages.parse import parse_documents


def built_ds(
    documents: "ray.data.Dataset",
    emit_buffers: bool = True,
    concurrency=None,
    batch_size: int = 1024,
    compact: bool = False,
) -> "ray.data.Dataset":
    if concurrency is None:
        # fixed-size pool of (cluster CPUs - 1): leaves a core for the
        # read/shuffle tasks; an autoscaling pool can collapse to 1 actor
        # and a full-width pool starves the other operators
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = max(1, cpus - 1)
    parsed = documents.map_batches(
        functools.partial(parse_documents, keep_spans=False), batch_format="pyarrow"
    )
    # compact=True fuses the quantizer into the actor (Build3DCompact):
    # an actor pool cannot fuse with a downstream task pool, so a
    # separate compact_before_shuffle stage would materialize the
    # 35 B/vertex float buffers in the object store first
    cls = (
        Build3DCompact
        if compact
        else (Build3D if emit_buffers else Build3DStats)
    )
    return parsed.map_batches(
        cls,
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def geometry_stats(documents: "ray.data.Dataset", **kw) -> "ray.data.Dataset":
    """Per-tile stats without materializing vertex payloads."""
    return tile_geometry_stats(built_ds(documents, emit_buffers=False, **kw))


def tile_compression(documents: "ray.data.Dataset", **kw) -> "ray.data.Dataset":
    """Per-tile Draco-equivalent compression stats (weld → delta/zigzag/
    varint → deflate; reference welds then Draco-compresses every tile,
    b3dmGenerator.ts:169-195).  Payload bytes stay inside the encode tasks;
    only the small metadata columns return.

    Scale shape: feeds from the COMPACT tile merge (11 B/vertex quantized
    records through the cell shuffle — the seed path's format), so the fat
    float soup never moves; the codec requantizes positions to the tile
    frame and passes the integer normal/uv/texture streams through
    untouched (meshcodec.encode_compact_tiles_compressed).  The raw-path
    stage (encode_tiles_compressed over the float merge) remains as the
    reference-parity variant and is pytest-oracled for exact v1 parity."""
    from ..stages.accumulate import accumulate_tiles_compact
    from ..stages.meshcodec import encode_compact_tiles_compressed

    # merge and codec FUSED inside each hash partition: the merged payload
    # blocks never hit the object store, and cell_id hashing with 512
    # partitions levels per-task vertex counts (the previous shape — range
    # partitions + repartition(512) — rebalanced ROW counts but left 25×
    # vertex skew between codec tasks, and re-moved the full payload once
    # more; observed 2.3–32 s tasks there vs a level pool here)
    tiles = accumulate_tiles_compact(
        built_ds(documents, compact=True, **kw),
        num_partitions=512,
        finish=encode_compact_tiles_compressed,
        pre_compacted=True,
    )
    return tiles.select_columns(
        [
            "cell_id",
            "batch_length",
            "vertex_count",
            "unique_vertices",
            "payload_bytes",
            "compression_ratio",
        ]
    )


def partition_fingerprint(group: pa.Table) -> str:
    """Order-independent per-partition content hash: wrapping uint64 SUM of
    per-row hashes over the row's identity + geometry bytes.  A changed
    input with the SAME cardinality (e.g. one building's height edited)
    changes the fingerprint, so resume detects stale partitions.  Sum, not
    xor: xor cancels pairwise, so a duplicated row pair {A,A} replaced by a
    different duplicated pair {C,C} would collide under xor."""
    import numpy as np
    import polars as pl

    osm = group.column("osm_id").to_numpy(zero_copy_only=False)
    h = pl.Series(osm).hash(seed=0xA5A5A5A5).to_numpy().copy()
    if "geom_blob" in group.column_names:
        blob_col = group.column("geom_blob")
        if isinstance(blob_col, pa.ChunkedArray):
            blob_col = blob_col.combine_chunks()
        h ^= pl.Series(blob_col).hash(seed=0x5A5A5A5A).to_numpy()
    else:
        # raw path: bbox + vertex count stand in for the geometry bytes
        for c in ("vertex_count", "min_z", "max_z", "min_x", "max_y"):
            if c in group.column_names:
                v = group.column(c).to_numpy(zero_copy_only=False)
                h ^= pl.Series(np.ascontiguousarray(v)).hash(seed=1).to_numpy()
    return f"x{int(h.sum(dtype=np.uint64)):016x}-n{len(group)}"


def seed_tiles(
    documents: "ray.data.Dataset",
    out_dir: str,
    projection: str = "mercator",
    compact: bool = True,
    timings: dict | None = None,
    **kw,
) -> dict:
    """Resumable seed run (the reference's ``seed-b3dm`` path, checkpointed).

    Output partition = one z12 parent cell; each partition is one parquet
    file of merged z16 tile payloads + a lineage record (state/lineage.py).
    Re-running after a kill SKIPS completed partitions; finishes with a
    ``_manifest.json`` commit log and the tileset JSON tree.

    ``compact=True`` (default) quantizes each building's geometry into an
    11-B/vertex binary record BEFORE the parent-cell shuffle (the b3dm-like
    storage form; ~2.5× less data through the sort than raw float buffers);
    ``compact=False`` keeps raw float32 list columns.
    Returns the manifest dict.
    """
    import numpy as np

    from ..constants import LEAF_ZOOM, ROOT_ZOOM
    from ..geom.transforms import cell_to_tile
    from ..state.lineage import PartitionWriter, finalize_manifest

    shift = LEAF_ZOOM - ROOT_ZOOM
    # the compact path quantizes INSIDE the Build3D actor (Build3DCompact)
    # so the float soup never materializes between the pools
    built = built_ds(documents, emit_buffers=True, compact=compact, **kw)
    merge_one_cell = _merge_tile_group  # raw path only; compact merges whole-parent

    def add_parent(batch: pa.Table) -> pa.Table:
        if "tile_x" in batch.column_names:
            tx = batch.column("tile_x").to_numpy(zero_copy_only=False)
            ty = batch.column("tile_y").to_numpy(zero_copy_only=False)
        else:
            _, tx, ty = cell_to_tile(
                batch.column("cell_id").to_numpy(zero_copy_only=False)
            )
        parent = (
            (tx.astype(np.int64) >> shift) << np.int64(32)
        ) | (ty.astype(np.int64) >> shift)
        return batch.append_column("parent_cell", pa.array(parent))

    writer = PartitionWriter(out_dir)
    _fingerprint = partition_fingerprint

    def write_parent(group: pa.Table) -> pa.Table:
        parent = int(group.column("parent_cell")[0].as_py())
        px, py = parent >> 32, parent & 0xFFFFFFFF
        pid = f"{ROOT_ZOOM}_{px}_{py}"
        rows_in = len(group)
        fingerprint = _fingerprint(group)
        if writer.is_done(pid):
            if writer.fingerprint_matches(pid, fingerprint):
                rec = writer.record(pid, rows_in, 0, 0, "skipped", fingerprint)
                return pa.table({k: [v] for k, v in _manifest_row(rec).items()})
            writer.invalidate(pid)  # stale input → rewrite below
        if compact:
            # this task holds ALL rows of every cell in the parent, so the
            # whole parent merges in ONE vectorized pass (byte-identical
            # to the per-cell loop; rows come out cell-sorted)
            table = _merge_compact_partition(group.drop_columns(["parent_cell"]))
        else:
            # sort by cell and slice contiguous runs — O(rows log rows),
            # not O(cells × rows) filter passes
            group = group.sort_by("cell_id")
            cells = group.column("cell_id").to_numpy(zero_copy_only=False)
            bounds = np.nonzero(np.diff(cells))[0] + 1
            starts = np.concatenate([[0], bounds])
            ends = np.concatenate([bounds, [len(cells)]])
            merged = []
            for s, e in zip(starts, ends):
                merged.append(
                    merge_one_cell(
                        group.slice(s, e - s).drop_columns(["parent_cell"])
                    )
                )
            table = pa.concat_tables(merged)
        # this task holds EVERY leaf row of this z12 parent, so it writes
        # the parent's tileset node JSON here — distributed fan-in with
        # zero extra read or shuffle (reference walks the same z12 grid,
        # generate-tileset.ts:37-65).  Node before fragment commit: a
        # crash in between re-runs the partition (idempotent rewrite); a
        # committed fragment therefore always has its node on disk, so
        # resume's skip path is safe.
        import pandas as pd

        from ..stages.tileset import write_parent_node_json

        z, tx, ty = cell_to_tile(
            table.column("cell_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        leaf_df = pd.DataFrame(
            {
                "tile_z": z,
                "tile_x": tx,
                "tile_y": ty,
                "max_z": table.column("max_z").to_numpy(zero_copy_only=False),
            }
        )
        write_parent_node_json(px, py, leaf_df, out_dir, projection=projection)
        rec = writer.write(pid, table, rows_in, fingerprint)
        return pa.table({k: [v] for k, v in _manifest_row(rec).items()})

    import time as _time

    manifest_ds = (
        built.map_batches(add_parent, batch_format="pyarrow")
        .groupby("parent_cell")
        .map_groups(write_parent, batch_format="pyarrow")
    )
    t0 = _time.time()
    manifest_ds = manifest_ds.materialize()  # drive the stream
    t1 = _time.time()
    manifest = finalize_manifest(out_dir)
    t2 = _time.time()
    if timings is not None:
        timings["build_merge_write_sec"] = round(t1 - t0, 3)
        timings["manifest_commit_sec"] = round(t2 - t1, 3)
        timings["stage_wall_sec"] = _stage_wall_seconds(manifest_ds)

    # node JSONs were written in-task by write_parent; the root needs only
    # the committed parent coordinates, which the manifest already carries
    if manifest["fragments"]:
        from ..stages.tileset import write_root_from_parents

        pids = [f.rsplit(".", 1)[0] for f in manifest["fragments"]]
        coords = np.array(
            [[int(p.split("_")[1]), int(p.split("_")[2])] for p in pids],
            dtype=np.int64,
        )
        write_root_from_parents(
            coords[:, 0], coords[:, 1], out_dir, projection=projection
        )
    if timings is not None:
        timings["tileset_sec"] = round(_time.time() - t2, 3)
    return manifest


def _stage_wall_seconds(ds) -> dict[str, float]:
    """Per-operator remote wall-time totals parsed from ``ds.stats()`` —
    the coarse stage breakdown bench.py publishes so a slow seed leg can
    be attributed to a stage, not guessed at.  Best-effort: returns {} if
    the stats text shape changes."""
    import re

    out: dict[str, float] = {}
    try:
        text = ds.stats()
        op = None
        for line in text.splitlines():
            m = re.match(r"Operator \d+ (\S+):", line)
            if m:
                op = m.group(1)
                continue
            m = re.search(
                r"Remote wall time:.*?([\d.]+)(us|ms|s|m) total", line
            )
            if m and op:
                v = float(m.group(1))
                unit = m.group(2)
                sec = {"us": v / 1e6, "ms": v / 1e3, "s": v, "m": v * 60}[unit]
                out[op] = round(out.get(op, 0.0) + sec, 3)
    except Exception:
        return {}
    return out


def _add_tile_coords(batch: pa.Table) -> pa.Table:
    import numpy as np

    from ..geom.transforms import cell_to_tile

    z, tx, ty = cell_to_tile(
        batch.column("cell_id").to_numpy(zero_copy_only=False).astype(np.uint64)
    )
    return (
        batch.append_column("tile_z", pa.array(z))
        .append_column("tile_x", pa.array(tx))
        .append_column("tile_y", pa.array(ty))
    )


def _manifest_row(rec: dict) -> dict:
    return {
        "partition_id": rec["partition_id"],
        "rows_in": rec["rows_in"],
        "rows_out": rec["rows_out"],
        "status": rec["status"],
    }


def full_pipeline(
    documents: "ray.data.Dataset",
    out_dir: str | None = None,
    projection: str = "mercator",
    **kw,
) -> "ray.data.Dataset":
    """Complete run: merged per-tile payload rows; if ``out_dir`` is given,
    payloads are written as partitioned parquet (deterministic per-cell
    layout → resumable) and the tileset JSON tree is emitted."""
    tiles = accumulate_tiles(built_ds(documents, emit_buffers=True, **kw))
    if out_dir is None:
        return tiles
    tiles.write_parquet(out_dir)
    from ..stages.tileset import write_tileset_distributed

    stats = ray.data.read_parquet(
        out_dir,
        columns=["cell_id", "batch_length", "vertex_count", "max_z"],
    )
    write_tileset_distributed(
        stats.map_batches(_add_tile_coords, batch_format="pyarrow"),
        out_dir,
        projection=projection,
    )
    return tiles


def export_b3dm(
    documents: "ray.data.Dataset",
    out_dir: str,
    projection: str = "mercator",
    **kw,
) -> int:
    """Interoperable export: one spec-layout ``z_x_y.b3dm`` per non-empty
    z16 tile (reference naming, b3dmGenerator.ts:249/serve.ts:68) plus the
    tileset JSON tree pointing at them.

    Files are written INSIDE the encode map_batches tasks (tmp+rename
    atomic, distributed — no driver loop); only the small per-tile
    metadata rows return to the driver for the tileset fan-in."""
    import os

    import numpy as np

    from ..geom.transforms import cell_to_tile
    from ..stages.b3dm import encode_tiles_b3dm

    os.makedirs(out_dir, exist_ok=True)
    tiles = accumulate_tiles(built_ds(documents, emit_buffers=True, **kw))

    def write_files(batch: pa.Table) -> pa.Table:
        enc = encode_tiles_b3dm(batch)
        cells = enc.column("cell_id").to_numpy(zero_copy_only=False)
        z, tx, ty = cell_to_tile(cells)
        payloads = enc.column("payload")
        for i in range(len(enc)):
            name = f"{z[i]}_{tx[i]}_{ty[i]}.b3dm"
            tmp = os.path.join(out_dir, f".{name}.tmp-{os.getpid()}")
            with open(tmp, "wb") as f:
                f.write(payloads[i].as_py())
            os.replace(tmp, os.path.join(out_dir, name))
        return pa.table(
            {
                "cell_id": enc.column("cell_id"),
                "tile_z": pa.array(z),
                "tile_x": pa.array(tx),
                "tile_y": pa.array(ty),
                "batch_length": enc.column("batch_length"),
                "vertex_count": enc.column("vertex_count"),
                "max_z": batch.column("max_z"),
                "payload_bytes": enc.column("payload_bytes"),
            }
        )

    from ..stages.tileset import write_tileset_distributed

    # materialize holds only the small per-tile METADATA rows (payloads
    # were already written to disk inside the tasks above) — cluster
    # object store, not the driver
    meta = tiles.map_batches(write_files, batch_format="pyarrow").materialize()
    n_tiles = meta.count()
    write_tileset_distributed(
        meta, out_dir, projection=projection, uri_pattern="{z}_{x}_{y}.b3dm"
    )
    return n_tiles
