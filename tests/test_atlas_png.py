"""S8 PNG atlas packer: byte-valid PNG container, exact pack geometry,
edge extrusion, frame-dict/UV-transform agreement."""

import numpy as np

from osm_data_3d_tiles_ray.tables.atlas import (
    ATLAS_SIZE,
    COLS,
    PADDING,
    TILE_SIZE,
    synth_frame_dict,
    tile_uv_transform,
)
from osm_data_3d_tiles_ray.tables.atlas_png import (
    pack_atlas,
    pack_textures_png,
    read_png,
    synth_tile_rgba,
    write_png,
)


def test_png_roundtrip(tmp_path):
    rgba = synth_tile_rgba(3, "diffuse", size=64)
    p = str(tmp_path / "t.png")
    write_png(p, rgba)
    back = read_png(p)
    assert np.array_equal(back, rgba)
    # signature + IHDR dims literal check
    raw = open(p, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    import struct

    w, h = struct.unpack_from(">II", raw, 16)
    assert (w, h) == (64, 64)


def test_pack_atlas_geometry_and_extrusion(tmp_path):
    atlas = pack_atlas("diffuse", n_textures=25)
    assert atlas.shape == (ATLAS_SIZE, ATLAS_SIZE, 4)
    frames = synth_frame_dict(25)
    for tid in (0, 7, 24):
        fx, fy = frames[tid]
        col = fx // TILE_SIZE
        row = (COLS - 1) - fy // TILE_SIZE
        x0 = PADDING + col * (TILE_SIZE + 2 * PADDING)
        y0 = PADDING + row * (TILE_SIZE + 2 * PADDING)
        tile = synth_tile_rgba(tid, "diffuse")
        assert np.array_equal(atlas[y0 : y0 + TILE_SIZE, x0 : x0 + TILE_SIZE], tile)
        # 2-px extrusion replicates the edge rows/cols
        assert np.array_equal(atlas[y0 - 1, x0 : x0 + TILE_SIZE], tile[0])
        assert np.array_equal(atlas[y0 + TILE_SIZE, x0 : x0 + TILE_SIZE], tile[-1])
        assert np.array_equal(
            atlas[y0 : y0 + TILE_SIZE, x0 - 1], tile[:, 0]
        )
    # UV transform center maps into the tile's pixel rect
    (uo, vo), (us, vs) = tile_uv_transform(*frames[7])
    px = int((uo + us / 2) * ATLAS_SIZE)
    fx, fy = frames[7]
    col = fx // TILE_SIZE
    x0 = PADDING + col * (TILE_SIZE + 2 * PADDING)
    assert x0 <= px < x0 + TILE_SIZE


def test_pack_textures_png_writes_all_kinds(tmp_path):
    written = pack_textures_png(str(tmp_path / "atlases"), n_textures=25)
    assert set(written) == {"diffuse", "normal", "mask", "glow", "frames"}
    d = read_png(written["diffuse"])
    n = read_png(written["normal"])
    assert d.shape == n.shape == (ATLAS_SIZE, ATLAS_SIZE, 4)
    assert not np.array_equal(d, n)  # per-kind content differs
    import pyarrow.parquet as pq

    t = pq.read_table(written["frames"])
    assert t.num_rows == 25
