"""Tile-cell encoding + building→tile ownership dedup (J1) + per-tile stats.

Reference semantics being rebuilt (cleaned, order-independent — SURVEY.md §2.4):

* A building whose footprint touches several z16 tiles appears in each tile's
  MVT payload; exactly ONE tile renders it.  The reference claims first-wins
  via a shared SQLite table (``/root/reference/src/unique-tile-per-building.ts:29-63``,
  applied ``/root/reference/src/b3dmGenerator.ts:111-113``) which is
  request-order dependent; this engine replaces it with a **deterministic
  winner: the lexicographically smallest (tile_x, tile_y) among covered
  tiles**, computed with an explicit ``groupby(osm_id)`` shuffle.
* Candidate tiles = z16 tiles overlapped by the footprint's axis-aligned
  bbox (engine spec; the rectangle cover makes the winner SQL-checkable:
  ``(floor((minx+W)/T), floor((W-maxy)/T))``).
* Per-tile ``batch_length`` = count of owned buildings
  (``BATCH_LENGTH``, ``/root/reference/src/b3dmGenerator.ts:242``) computed
  with per-batch partial aggregation before the small groupby — the
  combiner-before-shuffle pattern for 100 TB scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..constants import LEAF_ZOOM
from ..geom.transforms import cell_id, mercator_to_tile

_TILE_CODE_SHIFT = np.int64(32)


def tile_code(tx: np.ndarray, ty: np.ndarray) -> np.ndarray:
    """Lex-orderable packed (tile_x, tile_y) int64 key."""
    return (tx.astype(np.int64) << _TILE_CODE_SHIFT) | ty.astype(np.int64)


def tile_code_decode(code: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    code = np.asarray(code, np.int64)
    return (code >> _TILE_CODE_SHIFT).astype(np.int32), (
        code & np.int64(0xFFFFFFFF)
    ).astype(np.int32)


def candidate_tiles(batch: pa.Table) -> pa.Table:
    """Parsed buildings → exploded (osm_id, tile_x, tile_y, tile_code) rows,
    one per z16 tile overlapped by the footprint bbox (rectangle cover)."""
    osm_id = batch.column("osm_id").to_numpy(zero_copy_only=False)
    minx = batch.column("minx").to_numpy(zero_copy_only=False)
    miny = batch.column("miny").to_numpy(zero_copy_only=False)
    maxx = batch.column("maxx").to_numpy(zero_copy_only=False)
    maxy = batch.column("maxy").to_numpy(zero_copy_only=False)

    # Dead-lettered rows carry NaN bboxes — NaN→int32 casts produce garbage
    # tiles (phantom cells); drop them before any tile math.
    keep = np.isfinite(minx) & np.isfinite(miny) & np.isfinite(maxx) & np.isfinite(maxy)
    if not keep.all():
        osm_id, minx, miny, maxx, maxy = (
            a[keep] for a in (osm_id, minx, miny, maxx, maxy)
        )

    tx0, ty0 = mercator_to_tile(minx, maxy)  # top-left tile (max y → min ty)
    tx1, ty1 = mercator_to_tile(maxx, miny)
    nx = (tx1 - tx0 + 1).astype(np.int64)
    ny = (ty1 - ty0 + 1).astype(np.int64)
    total = nx * ny

    row = np.repeat(np.arange(len(osm_id)), total)
    starts = np.concatenate([[0], np.cumsum(total)[:-1]])
    intra = np.arange(int(total.sum())) - np.repeat(starts, total)
    txs = tx0[row] + (intra // ny[row]).astype(np.int32)
    tys = ty0[row] + (intra % ny[row]).astype(np.int32)
    return pa.table(
        {
            "osm_id": pa.array(osm_id[row]),
            "tile_x": pa.array(txs.astype(np.int32)),
            "tile_y": pa.array(tys.astype(np.int32)),
            "tile_code": pa.array(tile_code(txs, tys)),
        }
    )


def _decode_winner(batch: pa.Table) -> pa.Table:
    code = batch.column("min(tile_code)").to_numpy(zero_copy_only=False)
    tx, ty = tile_code_decode(code)
    return pa.table(
        {
            "osm_id": batch.column("osm_id"),
            "tile_z": pa.array(np.full(len(code), LEAF_ZOOM, dtype=np.int32)),
            "tile_x": pa.array(tx),
            "tile_y": pa.array(ty),
            "cell_id": pa.array(cell_id(tx, ty), type=pa.uint64()),
        }
    )


def ownership_assignments(parsed: "ray.data.Dataset") -> "ray.data.Dataset":
    """Parsed buildings Dataset → one (osm_id, tile_z, tile_x, tile_y, cell_id)
    row per building — shuffle #1 of the pipeline (groupby on osm_id)."""
    cands = parsed.map_batches(candidate_tiles, batch_format="pyarrow")
    winners = cands.groupby("osm_id").min("tile_code")
    return winners.map_batches(_decode_winner, batch_format="pyarrow")


def _partial_tile_counts(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: count rows per (tile_x, tile_y) before the shuffle."""
    tx = batch.column("tile_x").to_numpy(zero_copy_only=False)
    ty = batch.column("tile_y").to_numpy(zero_copy_only=False)
    code = tile_code(tx, ty)
    uniq, cnt = np.unique(code, return_counts=True)
    utx, uty = tile_code_decode(uniq)
    return pa.table(
        {
            "tile_code": pa.array(uniq),
            "tile_x": pa.array(utx),
            "tile_y": pa.array(uty),
            "partial_count": pa.array(cnt.astype(np.int64)),
        }
    )


def tile_stats(assignments: "ray.data.Dataset") -> "ray.data.Dataset":
    """Assignments → per-tile batch_length (pre-aggregated, then tiny groupby)."""
    partial = assignments.map_batches(_partial_tile_counts, batch_format="pyarrow")
    summed = partial.groupby("tile_code").sum("partial_count")

    def finish(batch: pa.Table) -> pa.Table:
        code = batch.column("tile_code").to_numpy(zero_copy_only=False)
        tx, ty = tile_code_decode(code)
        return pa.table(
            {
                "tile_z": pa.array(np.full(len(code), LEAF_ZOOM, dtype=np.int32)),
                "tile_x": pa.array(tx),
                "tile_y": pa.array(ty),
                "cell_id": pa.array(cell_id(tx, ty), type=pa.uint64()),
                "batch_length": batch.column("sum(partial_count)"),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")
