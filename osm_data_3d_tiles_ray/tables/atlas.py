"""Texture-atlas frame dictionary + UV transform (S4/J3).

Reference parity:
* ``getTileUVTransform`` — exact port of the atlas cell math
  (``/root/reference/src/textures/building_textures.ts:305-340``:
  atlas 2580 px, 512-px tiles, 2-px padding, 5 columns, 2-px bleed eps);
* the frame dict the reference loads from ``diffuse.json`` per worker
  (``src/texturesLoader.ts:7-54``, ``src/textures/helper.ts:3-5``) is
  synthesized deterministically here: texture id → (x, y) pixel frame in
  row-major atlas order.  Stateful consumers (stages/build3d actors) build
  the resolved per-texture transform table ONCE per actor.
"""

from __future__ import annotations

import numpy as np

ATLAS_SIZE = 2580
TILE_SIZE = 512
PADDING = 2
COLS = 5
EPS_PX = 2


def tile_uv_transform(
    x: float,
    y: float,
    atlas_size: int = ATLAS_SIZE,
    tile_size: int = TILE_SIZE,
    padding: int = PADDING,
    cols: int = COLS,
) -> tuple[tuple[float, float], tuple[float, float]]:
    """((u_offset, v_offset), (u_scale, v_scale)) — exact reference math."""
    cell = tile_size + padding * 2
    col = int(np.floor(x / tile_size))
    row = (cols - 1) - int(np.floor(y / tile_size))
    px = padding + col * cell
    py = padding + row * cell
    u_offset = px / atlas_size
    v_offset = py / atlas_size
    u_scale = tile_size / atlas_size
    v_scale = tile_size / atlas_size
    eps = EPS_PX / atlas_size
    return (
        (u_offset + eps, v_offset + eps),
        (u_scale - 2 * eps, v_scale - 2 * eps),
    )


def synth_frame_dict(n_textures: int = 25) -> dict[int, tuple[int, int]]:
    """Deterministic frame dict: texture id → (x, y) pixel frame, row-major
    over the 5×5 atlas grid (stands in for the packed ``diffuse.json``)."""
    out = {}
    for tid in range(n_textures):
        col = tid % COLS
        row = tid // COLS
        out[tid] = (col * TILE_SIZE, (COLS - 1 - row) * TILE_SIZE)
    return out


def uv_transform_table(n_textures: int = 256) -> np.ndarray:
    """(n, 4) [u_off, v_off, u_scale, v_scale] per texture id — the
    broadcastable per-actor lookup table (ids ≥ 25 wrap onto the grid)."""
    frames = synth_frame_dict(25)
    table = np.zeros((n_textures, 4))
    for tid in range(n_textures):
        fx, fy = frames[tid % 25]
        (uo, vo), (us, vs) = tile_uv_transform(fx, fy)
        table[tid] = (uo, vo, us, vs)
    return table


def write_frame_dict_parquet(path: str, n_textures: int = 25) -> None:
    """S8 output: the packer's frame dictionary as Parquet (the reference
    packs atlases + writes ``diffuse.json`` frames,
    ``src/textures/building_textures.ts:257-302``; the engine ships the
    frame dict as a table instead of JSON)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    frames = synth_frame_dict(n_textures)
    pq.write_table(
        pa.table(
            {
                "texture_id": pa.array(list(frames), type=pa.int32()),
                "x": pa.array([f[0] for f in frames.values()], type=pa.int32()),
                "y": pa.array([f[1] for f in frames.values()], type=pa.int32()),
                "w": pa.array([TILE_SIZE] * len(frames), type=pa.int32()),
                "h": pa.array([TILE_SIZE] * len(frames), type=pa.int32()),
            }
        ),
        path,
    )


def apply_atlas_uv(uv: np.ndarray, texture_id: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Map tile-local UVs into atlas UVs via the frame table — vectorized
    over all vertices.

    Wall/roof builders emit UVs already fracted into (0, 1] with the
    reference's ``f === 0 → 1`` fixup (walls-builder.ts:121-124), and the
    reference then applies ``offset + uv * scale`` with NO re-fract
    (walls-builder.ts:125-136).  Re-fracting here with a plain ``% 1.0``
    collapsed every uv == 1.0 (the top edge of every wall quad) onto the
    frame's minimum edge.  Fract with the same ``!= 0 & frac == 0 → 1``
    fixup instead, so exact integer UVs map to the far edge of the frame
    while unbounded flat-roof UVs still wrap per texture tile."""
    t = table[texture_id]
    f = uv % 1.0
    f[(uv != 0) & (f == 0)] = 1.0
    out = np.empty_like(uv)
    out[:, 0] = t[:, 0] + f[:, 0] * t[:, 2]
    out[:, 1] = t[:, 1] + f[:, 1] * t[:, 3]
    return out
