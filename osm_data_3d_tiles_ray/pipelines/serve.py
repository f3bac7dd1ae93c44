"""On-demand tile generation with cache (the reference's serve path, S7).

Reference: the HTTP server returns a pre-generated b3dm if present, else
generates it on a worker and (optionally) caches it
(``/root/reference/serve.ts:68-87``).  Batch-engine restatement with a
three-level lookup:

1. **cache hit** — one file read (serve.ts:68-73);
2. **seed-fragment hit** — the committed seed output IS the partition
   index: the requested z16 cell's z12 parent names exactly one committed
   parquet fragment; a miss reads THAT fragment only (rows touched = one
   partition, ≪ corpus) and re-encodes the tile from its quantized record
   stream;
3. **recompute** — only when no seed output covers the tile: the full
   documents scan restricted to the requested cell (the cold path a real
   deployment would back with a bbox row-group predicate).

``stats`` (optional dict) reports which path served the request and how
many input rows it touched — the serve test asserts fragment-path rows
≪ corpus size.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa

import ray.data

from ..constants import LEAF_ZOOM, ROOT_ZOOM
from ..geom.transforms import cell_id as cell_id_of
from ..stages.accumulate import accumulate_tiles, decode_building_record
from ..stages.build3d import Build3D
from ..stages.encode import encode_tile_row, encode_tiles
from ..stages.parse import parse_documents


def _tile_from_seed_fragment(
    seed_dir: str, tile_x: int, tile_y: int, stats: dict
) -> bytes | None | type(NotImplemented):
    """Serve a miss from the committed seed output: read ONLY the z12
    parent partition's fragment.  Returns NotImplemented when the seed
    output does not cover the partition (caller falls back to recompute),
    None when the partition is committed but the tile owns no buildings
    (authoritative 404)."""
    shift = LEAF_ZOOM - ROOT_ZOOM
    frag = (
        Path(seed_dir)
        / "tiles"
        / f"{ROOT_ZOOM}_{tile_x >> shift}_{tile_y >> shift}.parquet"
    )
    manifest = Path(seed_dir) / "_manifest.json"
    if not frag.exists():
        if manifest.exists():
            frags = set(json.loads(manifest.read_text())["fragments"])
            if f"tiles/{frag.name}" not in frags:
                # committed manifest, partition absent → no buildings there
                stats.update(source="seed_manifest", rows_scanned=0)
                return None
        return NotImplemented
    import pyarrow.parquet as pq

    table = pq.read_table(frag)
    stats.update(source="seed_fragment", rows_scanned=table.num_rows)
    want_cell = int(cell_id_of(np.array([tile_x]), np.array([tile_y]))[0])
    cells = table.column("cell_id").to_numpy(zero_copy_only=False)
    hit = np.nonzero(cells == np.uint64(want_cell))[0]
    if len(hit) == 0:
        return None
    row = table.slice(int(hit[0]), 1)
    if "payload" not in row.column_names:
        return NotImplemented  # raw-layout fragment; recompute path handles it
    # decode the tile's quantized per-building record stream
    payload = row.column("payload")[0].as_py()
    lens = np.asarray(row.column("blob_lengths")[0].values)
    osm_ids = np.asarray(row.column("osm_ids")[0].values)
    offs = np.concatenate([[0], np.cumsum(lens)])
    pos_parts, nrm_parts, uv_parts, tid_parts, bid_parts = [], [], [], [], []
    for i in range(len(lens)):
        rec = decode_building_record(payload[offs[i] : offs[i + 1]])
        v = len(rec["position"])
        pos_parts.append(rec["position"])
        nrm_parts.append(rec["normal"])
        uv_parts.append(rec["uv"])
        tid_parts.append(rec["texture_id"])
        bid_parts.append(np.full(v, i, dtype=np.uint16))
    bbox = tuple(
        row.column(c)[0].as_py()
        for c in ("min_x", "min_y", "min_z", "max_x", "max_y", "max_z")
    )
    return encode_tile_row(
        want_cell,
        osm_ids,
        np.concatenate(pos_parts),
        np.concatenate(nrm_parts),
        np.concatenate(uv_parts),
        np.concatenate(tid_parts),
        np.concatenate(bid_parts),
        bbox,
    )


def get_or_build_tile(
    documents: "ray.data.Dataset",
    tile_x: int,
    tile_y: int,
    cache_dir: str,
    seed_dir: str | None = None,
    stats: dict | None = None,
) -> bytes | None:
    """Return the encoded payload for one z16 tile, via cache, the seed
    partition index, or recompute.

    Returns None when the tile owns no buildings (reference: 404,
    ``src/b3dmGenerator.ts:116-118``)."""
    if stats is None:
        stats = {}
    cache = Path(cache_dir)
    cache.mkdir(parents=True, exist_ok=True)
    f = cache / f"16_{tile_x}_{tile_y}.bin"
    if f.exists():  # cache hit (serve.ts:68-73)
        stats.update(source="cache", rows_scanned=0)
        return f.read_bytes()

    if seed_dir is not None:
        payload = _tile_from_seed_fragment(seed_dir, tile_x, tile_y, stats)
        if payload is not NotImplemented:
            if payload is not None:
                tmp = f.with_suffix(".tmp")
                tmp.write_bytes(payload)
                tmp.rename(f)
            return payload

    want_cell = int(cell_id_of(np.array([tile_x]), np.array([tile_y]))[0])

    def owned_only(batch: pa.Table) -> pa.Table:
        built = Build3D(emit_buffers=True)(batch)
        cells = built.column("cell_id").to_numpy(zero_copy_only=False)
        return built.filter(pa.array(cells == np.uint64(want_cell)))

    tiles = accumulate_tiles(
        documents.map_batches(parse_documents, batch_format="pyarrow").map_batches(
            owned_only, batch_format="pyarrow", batch_size=2048
        )
    )
    rows = tiles.map_batches(encode_tiles, batch_format="pyarrow").take_all()
    stats.update(source="recompute", rows_scanned=documents.count())
    if not rows:
        return None
    payload = rows[0]["payload"]
    tmp = f.with_suffix(".tmp")
    tmp.write_bytes(payload)
    tmp.rename(f)
    return payload
