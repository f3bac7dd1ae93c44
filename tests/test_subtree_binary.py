"""Implicit-tiling `.subtree` binaries: format invariants, roundtrip,
resumable sink, implicit root tileset (stages/subtree.py).

The reference's tree is explicit JSON (generate-tileset.ts:18-74); the
subtree format here is the published 3D Tiles 1.1 binary layout, so the
oracles are structural: header fields, 8-byte alignment, bitstream
popcounts, encode→decode word equality, ancestor closure, and the
lineage skip-on-rerun contract shared with seed_tiles."""

import json
import struct

import numpy as np
import pytest

from osm_data_3d_tiles_ray.stages.subtree import (
    INTERNAL_BITS,
    LEAF_BITS,
    SUBTREE_LEVELS,
    TILE_BITS,
    decode_subtree,
    encode_subtree,
)

SF = "/root/testdata/sf0.001"


def _random_words(rng):
    # a valid availability row: random leaves + exact ancestor closure
    leaves = rng.random(LEAF_BITS) < 0.15
    leaf_words = [
        int(sum(1 << b for b in range(52) if w * 52 + b < LEAF_BITS and leaves[w * 52 + b]))
        for w in range(5)
    ]
    # internal bits: level-order Morton ancestors of each set leaf
    internal = set()
    for m in np.nonzero(leaves)[0]:
        for d, off in enumerate((0, 1, 5, 21)):
            internal.add(off + (int(m) >> (2 * (4 - d))))
    w0 = sum(1 << b for b in internal if b < 52)
    w1 = sum(1 << (b - 52) for b in internal if b >= 52)
    return w0, w1, leaf_words, int(leaves.sum()), internal


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(20):
        w0, w1, leaf_words, n_tiles, internal = _random_words(rng)
        data = encode_subtree(w0, w1, leaf_words, n_tiles)
        dec = decode_subtree(data)
        assert dec["int_w0"] == w0 and dec["int_w1"] == w1
        assert dec["leaf_words"] == leaf_words
        assert dec["n_tiles"] == n_tiles
        assert dec["tile_available"] == len(internal) + n_tiles
        assert dec["content_available"] == n_tiles
        assert dec["content_matches_leaves"]


def test_header_spec_invariants():
    w0, w1, leaf_words, n_tiles, _ = _random_words(np.random.default_rng(9))
    data = encode_subtree(w0, w1, leaf_words, n_tiles)
    assert data[:4] == b"subt"
    version, jlen, blen = struct.unpack_from("<IQQ", data, 4)
    assert version == 1
    assert jlen % 8 == 0 and blen % 8 == 0  # spec: 8-byte-aligned chunks
    assert len(data) == 24 + jlen + blen
    header = json.loads(data[24 : 24 + jlen])
    assert header["buffers"][0]["byteLength"] == blen
    for view in header["bufferViews"]:
        assert view["byteOffset"] % 8 == 0
        assert view["byteOffset"] + view["byteLength"] <= blen
        assert view["byteLength"] == (TILE_BITS + 7) // 8
    assert header["childSubtreeAvailability"] == {"constant": 0}
    assert TILE_BITS == INTERNAL_BITS + LEAF_BITS == 341
    assert SUBTREE_LEVELS == 5


def test_n_tiles_mismatch_rejected():
    w0, w1, leaf_words, n_tiles, _ = _random_words(np.random.default_rng(1))
    with pytest.raises(ValueError):
        encode_subtree(w0, w1, leaf_words, n_tiles + 1)


def test_write_subtrees_end_to_end(ray_session, tmp_path):
    from osm_data_3d_tiles_ray.pipelines import geo
    from osm_data_3d_tiles_ray.stages.subtree import write_subtrees

    avail = geo.q_subtree_avail(SF).to_pandas()
    out = tmp_path / "implicit"
    manifest = write_subtrees(geo.q_subtree_avail(SF), str(out))
    assert manifest["n_partitions"] == len(avail) == manifest["n_roots"]
    assert all(
        (out / f).exists() and f.endswith("/0/0/0.subtree")
        for f in manifest["fragments"]
    )

    # every file decodes back to its availability row
    for row in avail.itertuples():
        frag = out / f"subtrees/{row.root_x}_{row.root_y}/0/0/0.subtree"
        dec = decode_subtree(frag.read_bytes())
        assert dec["int_w0"] == int(row.int_w0)
        assert dec["int_w1"] == int(row.int_w1)
        assert dec["leaf_words"] == [int(getattr(row, f"leaf_w{w}")) for w in range(5)]
        assert dec["n_tiles"] == int(row.n_tiles)
        # ancestor closure: every set leaf's 4 ancestors are available
        got_int = dec["int_w0"] | (dec["int_w1"] << 52)
        leaves = 0
        for w, lw in enumerate(dec["leaf_words"]):
            leaves |= lw << (52 * w)
        for m in range(LEAF_BITS):
            if (leaves >> m) & 1:
                for d, off in enumerate((0, 1, 5, 21)):
                    assert (got_int >> (off + (m >> (2 * (4 - d))))) & 1

    # implicit root tileset: one implicitTiling child per occupied root
    ts = json.loads((out / "tileset.json").read_text())
    assert ts["asset"]["version"] == "1.1"
    kids = ts["root"]["children"]
    assert len(kids) == len(avail)
    for kid in kids:
        it = kid["implicitTiling"]
        assert it["subdivisionScheme"] == "QUADTREE"
        assert it["subtreeLevels"] == SUBTREE_LEVELS
        assert "{level}" in it["subtrees"]["uri"]
        assert "{level}" in kid["content"]["uri"]

    # resume: a second run skips every partition (same fingerprints) —
    # no data file is rewritten (inode + mtime unchanged)
    import os

    stat_before = {f: os.stat(out / f) for f in manifest["fragments"]}
    m2 = write_subtrees(geo.q_subtree_avail(SF), str(out))
    assert m2["n_partitions"] == manifest["n_partitions"]
    for f in manifest["fragments"]:
        after = os.stat(out / f)
        assert (after.st_ino, after.st_mtime_ns) == (
            stat_before[f].st_ino,
            stat_before[f].st_mtime_ns,
        )


def test_q_subtree_files_matches_avail(ray_session):
    from osm_data_3d_tiles_ray.pipelines import geo

    got = (
        geo.q_subtree_files(SF)
        .to_pandas()
        .sort_values(["root_x", "root_y"])
        .reset_index(drop=True)
    )
    avail = (
        geo.q_subtree_avail(SF)
        .to_pandas()
        .sort_values(["root_x", "root_y"])
        .reset_index(drop=True)
    )
    assert (got.root_x.to_numpy() == avail.root_x.to_numpy()).all()
    assert (got.n_tiles.to_numpy() == avail.n_tiles.to_numpy()).all()
    pop = lambda col: np.array([bin(int(v)).count("1") for v in col])
    want = pop(avail.int_w0) + pop(avail.int_w1) + avail.n_tiles.to_numpy()
    assert (got.tile_available.to_numpy() == want).all()
