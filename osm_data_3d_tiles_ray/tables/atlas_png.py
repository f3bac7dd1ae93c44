"""Real atlas PNG packing (S8) — pure stdlib (zlib + struct + crc32).

The reference packs 512×512 texture tiles per kind (diffuse / normal /
mask / glow) into atlases with a 2-px extrude via ``free-tex-packer-core``
(``/root/reference/src/textures/building_textures.ts:257-302``), and its
UV transform assumes the 2580-px / 512-px-tile / 2-px-pad / 5-column grid
(``:305-330``).  No image library exists in this sandbox, so the engine
writes the PNG container itself: RGBA8, filter-0 scanlines, zlib IDAT,
CRC-checked chunks — a byte-valid PNG any decoder can open.

Tile CONTENT is synthetic-deterministic (keyed-RNG checkerboard per
(texture_id, kind)) — honest stand-ins for the reference's photo assets,
which aren't shipped here; the pack GEOMETRY (placement, padding, edge
extrusion, frame dict) is exact.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32
from pathlib import Path

import numpy as np

from ..geom.rng import keyed_uniform
from .atlas import ATLAS_SIZE, COLS, PADDING, TILE_SIZE, synth_frame_dict

KINDS = ("diffuse", "normal", "mask", "glow")


def write_png(path: str, rgba: np.ndarray) -> None:
    """Minimal PNG writer: RGBA8, filter type 0, single IDAT."""
    h, w, c = rgba.shape
    assert c == 4 and rgba.dtype == np.uint8

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)  # 8-bit RGBA
    # prepend filter byte 0 to every scanline
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), rgba.reshape(h, w * 4)], axis=1
    ).tobytes()
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    out += chunk(b"IDAT", zlib.compress(raw, 6))
    out += chunk(b"IEND", b"")
    Path(path).write_bytes(out)


def read_png(path: str) -> np.ndarray:
    """Validating reader for PNGs this module writes (filter 0, RGBA8)."""
    data = Path(path).read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "bad signature"
    off = 8
    w = h = None
    idat = b""
    while off < len(data):
        (length,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4 : off + 8]
        body = data[off + 8 : off + 8 + length]
        (crc,) = struct.unpack_from(">I", data, off + 8 + length)
        assert crc == crc32(tag + body) & 0xFFFFFFFF, f"bad crc in {tag}"
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", body)
            assert depth == 8 and ctype == 6
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        off += 12 + length
    raw = zlib.decompress(idat)
    rows = np.frombuffer(raw, np.uint8).reshape(h, w * 4 + 1)
    assert (rows[:, 0] == 0).all(), "only filter 0 supported"
    return rows[:, 1:].reshape(h, w, 4).copy()


def synth_tile_rgba(texture_id: int, kind: str, size: int = TILE_SIZE) -> np.ndarray:
    """Deterministic per-(texture, kind) checkerboard tile (keyed RNG —
    bit-identical across processes)."""
    kind_idx = KINDS.index(kind)
    base = np.empty(3, np.uint8)
    for j in range(3):
        base[j] = int(
            keyed_uniform(np.array([texture_id * 16 + kind_idx * 4 + j]), tag=8)[0]
            * 255
        )
    yy, xx = np.mgrid[0:size, 0:size]
    checker = ((xx // 32) + (yy // 32)) % 2
    rgba = np.empty((size, size, 4), np.uint8)
    rgba[..., :3] = np.where(checker[..., None] == 0, base, 255 - base)
    rgba[..., 3] = 255
    return rgba


def pack_atlas(kind: str, n_textures: int = 25) -> np.ndarray:
    """Place each texture's tile at its frame-dict slot with the 2-px edge
    extrusion the reference packer applies (``extrude: 2``)."""
    atlas = np.zeros((ATLAS_SIZE, ATLAS_SIZE, 4), np.uint8)
    frames = synth_frame_dict(n_textures)
    for tid, (fx, fy) in frames.items():
        tile = synth_tile_rgba(tid, kind)
        # frame dict y is in texture space (bottom-up rows of the grid);
        # pixel placement uses the stored top-left corner directly
        col = fx // TILE_SIZE
        row_from_bottom = fy // TILE_SIZE
        row = (COLS - 1) - row_from_bottom
        x0 = PADDING + col * (TILE_SIZE + 2 * PADDING)
        y0 = PADDING + row * (TILE_SIZE + 2 * PADDING)
        atlas[y0 : y0 + TILE_SIZE, x0 : x0 + TILE_SIZE] = tile
        # extrude edges into the padding ring (prevents bleed at mip edges)
        atlas[y0 - PADDING : y0, x0 : x0 + TILE_SIZE] = tile[0]
        atlas[y0 + TILE_SIZE : y0 + TILE_SIZE + PADDING, x0 : x0 + TILE_SIZE] = tile[-1]
        atlas[y0 - PADDING : y0 + TILE_SIZE + PADDING, x0 - PADDING : x0] = atlas[
            y0 - PADDING : y0 + TILE_SIZE + PADDING, x0 : x0 + 1
        ]
        atlas[
            y0 - PADDING : y0 + TILE_SIZE + PADDING,
            x0 + TILE_SIZE : x0 + TILE_SIZE + PADDING,
        ] = atlas[
            y0 - PADDING : y0 + TILE_SIZE + PADDING,
            x0 + TILE_SIZE - 1 : x0 + TILE_SIZE,
        ]
    return atlas


def pack_textures_png(out_dir: str, n_textures: int = 25) -> dict[str, str]:
    """S8 full output: one PNG atlas per kind + the frame-dict parquet."""
    from .atlas import write_frame_dict_parquet

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    written = {}
    for kind in KINDS:
        p = str(out / f"{kind}.png")
        write_png(p, pack_atlas(kind, n_textures))
        written[kind] = p
    fd = str(out / "frames.parquet")
    write_frame_dict_parquet(fd, n_textures)
    written["frames"] = fd
    return written
