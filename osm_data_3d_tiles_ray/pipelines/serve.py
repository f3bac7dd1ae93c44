"""On-demand tile generation with cache (the reference's serve path, S7).

Reference: the HTTP server returns a pre-generated b3dm if present, else
generates it on a worker and (optionally) caches it
(``/root/reference/serve.ts:68-87``).  Batch-engine restatement:
:func:`get_or_build_tile` checks the seed output layout first (cache hit =
one file read), else runs the SAME pipeline restricted to the requested
tile and writes the payload into the cache (cache-miss recompute).

At scale the miss path would push the tile's bbox as a row-group predicate
into the documents read; here it filters the parsed stream (documents
carry no bbox column — the assignments table is the index a real
deployment would consult).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa

import ray.data

from ..geom.transforms import cell_id as cell_id_of
from ..stages.accumulate import accumulate_tiles
from ..stages.build3d import Build3D
from ..stages.encode import encode_tiles
from ..stages.parse import parse_documents


def get_or_build_tile(
    documents: "ray.data.Dataset",
    tile_x: int,
    tile_y: int,
    cache_dir: str,
) -> bytes | None:
    """Return the encoded payload for one z16 tile, via cache or recompute.

    Returns None when the tile owns no buildings (reference: 404,
    ``src/b3dmGenerator.ts:116-118``)."""
    cache = Path(cache_dir)
    cache.mkdir(parents=True, exist_ok=True)
    f = cache / f"16_{tile_x}_{tile_y}.bin"
    if f.exists():  # cache hit (serve.ts:68-73)
        return f.read_bytes()

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
    if not rows:
        return None
    payload = rows[0]["payload"]
    tmp = f.with_suffix(".tmp")
    tmp.write_bytes(payload)
    tmp.rename(f)
    return payload
