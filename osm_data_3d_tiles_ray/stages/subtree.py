"""3D-Tiles-1.1 implicit-tiling subtree files + implicit root tileset.

The reference ships an EXPLICIT two-level tree: a root ``tileset.json``
listing one JSON node per z12 cell, each listing its z16 ``.b3dm``
children (``/root/reference/generate-tileset.ts:18-74``,
``src/tileset/tileset.ts:9-50``).  At planet scale that tree is hundreds
of millions of JSON nodes; 3D Tiles 1.1 replaces it with *implicit
tiling*: the root declares a quadtree subdivision plus a template URI,
and per-subtree binary ``.subtree`` files carry availability bitstreams
(which tiles exist, which have content) — the published
``3DTILES_implicit_tiling`` format (magic ``subt``, version 1, JSON
chunk + binary bitstream chunk, all 8-byte aligned).

This module turns :func:`pipelines.geo.q_subtree_avail`'s availability
dataset (one row per occupied z12 root: 85 internal bits z12–z15 +
256 leaf bits z16, packed in 52-bit words) into spec-shaped artifacts:

* :func:`encode_subtree` / :func:`decode_subtree` — one root's words
  ⇄ a ``.subtree`` binary (levels 0‥4 of the subtree = z12‥z16;
  ``tileAvailability`` = all 341 bits, ``contentAvailability`` = the
  256 z16 bits — content lives only at leaf tiles, matching the seed
  pipeline's z16 payloads — ``childSubtreeAvailability`` = constant 0:
  the quadtree ends at z16).
* :func:`write_subtrees` — Dataset sink: one atomic ``.subtree`` file
  per z12 root with a lineage record each (resumable exactly like
  ``seed_tiles``: completed roots are skipped on re-run, stale inputs
  detected by fingerprint), a ``_manifest.json`` commit log, and a root
  ``tileset.json`` whose children are implicit-root nodes (template
  content/subtree URIs) instead of per-tile nodes.

Scale shape: the input is the availability aggregate (one row per
occupied z12 root — ~10⁶ rows for the planet, NOT per-building), the
writer is an embarrassingly parallel ``map_batches`` (each row writes
its own file; no exchange), and the root JSON grows with occupied
roots only.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path

import numpy as np
import pyarrow as pa

from ..constants import GEOMETRIC_ERROR, REFINE, ROOT_ZOOM, TILE_HEIGHT

SUBTREE_LEVELS = 5  # z12 root .. z16 leaves inside one subtree
INTERNAL_BITS = 85  # 1 + 4 + 16 + 64 (levels 0..3)
LEAF_BITS = 256  # 4^4 (level 4)
TILE_BITS = INTERNAL_BITS + LEAF_BITS  # 341
_WORD = 52  # bits per int64 word (BIGINT-safe, see q_subtree_avail)
_MAGIC = b"subt"
_VERSION = 1


def _words_to_bits(words: list[int], nbits: int) -> np.ndarray:
    """Unpack ``nbits`` bits from consecutive 52-bit words (LSB-first)."""
    out = np.zeros(nbits, dtype=np.uint8)
    for w, word in enumerate(words):
        lo = w * _WORD
        take = min(_WORD, nbits - lo)
        if take <= 0:
            break
        out[lo : lo + take] = (np.int64(word) >> np.arange(take, dtype=np.int64)) & 1
    return out


def _bits_to_words(bits: np.ndarray, n_words: int) -> list[int]:
    vals = []
    for w in range(n_words):
        seg = bits[w * _WORD : (w + 1) * _WORD].astype(np.int64)
        vals.append(int((seg << np.arange(len(seg), dtype=np.int64)).sum()))
    return vals


def _pad8(n: int) -> int:
    return (n + 7) & ~7


def encode_subtree(
    int_w0: int, int_w1: int, leaf_words: list[int], n_tiles: int
) -> bytes:
    """One z12 root's availability words → a spec-shaped ``.subtree``
    binary.  Bit i of a bitstream lives at byte ``i // 8``, bit
    ``i % 8`` (the spec's little-endian bit order — ``np.packbits``
    with ``bitorder='little'``)."""
    internal = _words_to_bits([int_w0, int_w1], INTERNAL_BITS)
    leaves = _words_to_bits(leaf_words, LEAF_BITS)
    tile_bits = np.concatenate([internal, leaves])
    content_bits = np.concatenate([np.zeros(INTERNAL_BITS, dtype=np.uint8), leaves])
    if int(leaves.sum()) != int(n_tiles):
        raise ValueError(
            f"leaf popcount {int(leaves.sum())} != n_tiles {n_tiles}"
        )

    nbytes = (TILE_BITS + 7) // 8  # 43
    stride = _pad8(nbytes)  # 48: each bitstream 8-byte aligned
    binary = bytearray(stride * 2)
    binary[0:nbytes] = np.packbits(tile_bits, bitorder="little").tobytes()
    binary[stride : stride + nbytes] = np.packbits(
        content_bits, bitorder="little"
    ).tobytes()

    header = {
        "buffers": [{"byteLength": len(binary)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": nbytes},
            {"buffer": 0, "byteOffset": stride, "byteLength": nbytes},
        ],
        "tileAvailability": {
            "bitstream": 0,
            "availableCount": int(tile_bits.sum()),
        },
        "contentAvailability": [
            {"bitstream": 1, "availableCount": int(n_tiles)}
        ],
        "childSubtreeAvailability": {"constant": 0},
    }
    jbytes = json.dumps(header, separators=(",", ":")).encode()
    jbytes += b" " * (_pad8(len(jbytes)) - len(jbytes))
    return (
        _MAGIC
        + struct.pack("<IQQ", _VERSION, len(jbytes), len(binary))
        + jbytes
        + bytes(binary)
    )


def decode_subtree(data: bytes) -> dict:
    """Parse a ``.subtree`` binary back into availability words — the
    reader half of the roundtrip (used by tests and by a client walking
    the implicit tree the way ``sources/tileset_reader.py`` walks the
    explicit one)."""
    if data[:4] != _MAGIC:
        raise ValueError(f"bad magic {data[:4]!r}")
    version, jlen, blen = struct.unpack_from("<IQQ", data, 4)
    if version != _VERSION:
        raise ValueError(f"unsupported subtree version {version}")
    joff = 24
    header = json.loads(data[joff : joff + jlen])
    boff = joff + jlen
    if boff + blen > len(data):
        raise ValueError("binary chunk extends past end of file")
    binary = data[boff : boff + blen]

    def bits_of(stream_idx: int, nbits: int) -> np.ndarray:
        view = header["bufferViews"][stream_idx]
        raw = binary[view["byteOffset"] : view["byteOffset"] + view["byteLength"]]
        return np.unpackbits(
            np.frombuffer(raw, dtype=np.uint8), bitorder="little"
        )[:nbits]

    tile_bits = bits_of(header["tileAvailability"]["bitstream"], TILE_BITS)
    content_bits = bits_of(
        header["contentAvailability"][0]["bitstream"], TILE_BITS
    )
    leaves = tile_bits[INTERNAL_BITS:]
    int_words = _bits_to_words(tile_bits[:INTERNAL_BITS], 2)
    return {
        "int_w0": int_words[0],
        "int_w1": int_words[1],
        "leaf_words": _bits_to_words(leaves, 5),
        "n_tiles": int(leaves.sum()),
        "tile_available": int(header["tileAvailability"]["availableCount"]),
        "content_available": int(
            header["contentAvailability"][0]["availableCount"]
        ),
        "content_matches_leaves": bool(
            (content_bits[INTERNAL_BITS:] == leaves).all()
            and not content_bits[:INTERNAL_BITS].any()
        ),
    }


def _row_fingerprint(row: dict) -> str:
    h = 0xCBF29CE484222325
    for c in ("n_tiles", "n_buildings", "int_w0", "int_w1") + tuple(
        f"leaf_w{w}" for w in range(5)
    ):
        h = ((h ^ int(row[c])) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return f"s{h:016x}"


def _implicit_child(rx: int, ry: int) -> dict:
    """One implicit-root node for the global tileset: the z12 cell's
    bounding volume + template URIs; ``{level}/{x}/{y}`` are LOCAL to
    this implicit root (level 0 = the z12 cell itself)."""
    from ..geom.transforms import tile_extent
    from .tileset import _box_volume

    ext = tile_extent(np.array([rx]), np.array([ry]), ROOT_ZOOM)[0]
    prefix = f"{rx}_{ry}"
    return {
        "boundingVolume": {"box": _box_volume(ext, 0.0, TILE_HEIGHT)},
        "geometricError": GEOMETRIC_ERROR,
        "refine": REFINE,
        "content": {"uri": f"content/{prefix}/{{level}}/{{x}}/{{y}}.parquet"},
        "implicitTiling": {
            "subdivisionScheme": "QUADTREE",
            "subtreeLevels": SUBTREE_LEVELS,
            "availableLevels": SUBTREE_LEVELS,
            "subtrees": {"uri": f"subtrees/{prefix}/{{level}}/{{x}}/{{y}}.subtree"},
        },
    }


def write_subtrees(avail_ds: "ray.data.Dataset", out_dir: str) -> dict:
    """Sink: availability dataset → per-root ``.subtree`` files (atomic,
    lineage-tracked, resumable), ``_manifest.json``, and the implicit
    root ``tileset.json``.

    Returns the manifest dict; the per-root fragment path is
    ``subtrees/<rx>_<ry>/0/0/0.subtree`` (the implicit root's own
    subtree coordinate)."""
    from ..state.lineage import PartitionWriter, finalize_manifest

    out = Path(out_dir)
    writer = PartitionWriter(out_dir)

    def write_batch(batch: pa.Table) -> pa.Table:
        recs = []
        for row in batch.to_pylist():
            rx, ry = int(row["root_x"]), int(row["root_y"])
            pid = f"sub_{rx}_{ry}"
            frag = f"subtrees/{rx}_{ry}/0/0/0.subtree"
            fp = _row_fingerprint(row)
            payload = encode_subtree(
                int(row["int_w0"]),
                int(row["int_w1"]),
                [int(row[f"leaf_w{w}"]) for w in range(5)],
                int(row["n_tiles"]),
            )
            rec = writer.write_bytes(pid, payload, frag, int(row["n_tiles"]), fp)
            recs.append(
                {
                    "root_x": rx,
                    "root_y": ry,
                    "n_tiles": int(row["n_tiles"]),
                    "subtree_bytes": len(payload),
                    "status": rec["status"],
                }
            )
        return pa.table(
            {k: pa.array([r[k] for r in recs]) for k in recs[0]}
            if recs
            else {
                "root_x": pa.array([], type=pa.int64()),
                "root_y": pa.array([], type=pa.int64()),
                "n_tiles": pa.array([], type=pa.int64()),
                "subtree_bytes": pa.array([], type=pa.int64()),
                "status": pa.array([], type=pa.string()),
            }
        )

    written = avail_ds.map_batches(write_batch, batch_format="pyarrow").materialize()
    manifest = finalize_manifest(out_dir)

    roots = sorted(
        (int(r["root_x"]), int(r["root_y"]))
        for r in written.select_columns(["root_x", "root_y"]).take_all()
    )
    tileset = {
        "asset": {"version": "1.1"},
        "geometricError": GEOMETRIC_ERROR,
        "root": {
            "boundingVolume": _global_volume(roots),
            "geometricError": GEOMETRIC_ERROR,
            "refine": REFINE,
            "children": [_implicit_child(rx, ry) for rx, ry in roots],
        },
    }
    tmp = out / "tileset.json.tmp"
    tmp.write_text(json.dumps(tileset))
    tmp.rename(out / "tileset.json")
    manifest["n_roots"] = len(roots)
    return manifest


def _global_volume(roots: list[tuple[int, int]]) -> dict:
    from ..geom.transforms import tile_extent
    from .tileset import _box_volume

    if not roots:
        return {"box": _box_volume(np.zeros(4))}
    xs = np.array([r[0] for r in roots])
    ys = np.array([r[1] for r in roots])
    e = tile_extent(xs, ys, ROOT_ZOOM)
    ext = np.array([e[:, 0].min(), e[:, 1].min(), e[:, 2].max(), e[:, 3].max()])
    return {"box": _box_volume(ext, 0.0, TILE_HEIGHT)}
