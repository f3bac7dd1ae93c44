"""Vertex welding → indexed mesh (the reference's pre-compression weld).

Reference: the b3dm path welds the mesh before Draco compression
(``/root/reference/src/b3dmGenerator.ts:169-195``; the in-code comment
documents that welding is required for artifact-free compression).  The
engine's weld merges vertices with identical (position, normal, uv,
texture_id, batch_id) tuples into a unique-vertex table + uint32 index
buffer — typically a 2–3× vertex reduction on extruded geometry (every
wall/roof triangle repeats shared corners).
"""

from __future__ import annotations

import numpy as np

from .fastroll import cross3


def compute_smooth_normals(position: np.ndarray) -> np.ndarray:
    """Smooth vertex normals (M17): area-weighted average of face normals
    over vertices sharing a POSITION — the reference's final normal pass
    (three.js ``computeVertexNormals`` after welding,
    ``/root/reference/src/build3dBuilding.ts:114-115``,
    ``src/utils/geometry.ts:33-68``).

    ``position``: (v, 3) float32 triangle list (v divisible by 3).
    Returns (v, 3) float32 unit normals."""
    v = len(position)
    if v == 0:
        return np.empty((0, 3), np.float32)
    tris = position.reshape(-1, 3, 3).astype(np.float64)
    fn = cross3(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])  # area-weighted
    per_vertex_face_n = np.repeat(fn, 3, axis=0)  # (v, 3)
    # group by exact position
    raw = position.astype(np.float32).view(np.uint8).reshape(v, 12)
    _, inverse = np.unique(raw, axis=0, return_inverse=True)
    acc = np.zeros((inverse.max() + 1, 3))
    np.add.at(acc, inverse, per_vertex_face_n)
    out = acc[inverse]
    ln = np.linalg.norm(out, axis=1, keepdims=True)
    ln[ln == 0] = 1.0
    return (out / ln).astype(np.float32)


def weld_mesh(
    position: np.ndarray,   # (v, 3) float32
    normal: np.ndarray,     # (v, 3) float32
    uv: np.ndarray,         # (v, 2) float32
    texture_id: np.ndarray, # (v,) uint8
    batch_id: np.ndarray,   # (v,) uint16
) -> dict[str, np.ndarray]:
    """Exact weld (bitwise attribute equality) → indexed mesh.

    Returns dict with deduped ``position/normal/uv/texture_id/batch_id``
    and an ``index`` uint32 array of the original length (triangle list
    order preserved)."""
    v = len(position)
    if v == 0:
        return {
            "position": position,
            "normal": normal,
            "uv": uv,
            "texture_id": texture_id,
            "batch_id": batch_id,
            "index": np.empty(0, np.uint32),
        }
    # pack each vertex's attributes into one row of bytes for exact dedup
    rec = np.zeros(
        v,
        dtype=[
            ("p", np.float32, 3),
            ("n", np.float32, 3),
            ("t", np.float32, 2),
            ("x", np.uint8),
            ("b", np.uint16),
        ],
    )
    rec["p"] = position
    rec["n"] = normal
    rec["t"] = uv
    rec["x"] = texture_id
    rec["b"] = batch_id
    raw = rec.view(np.uint8).reshape(v, rec.itemsize)
    uniq, first_idx, inverse = np.unique(
        raw, axis=0, return_index=True, return_inverse=True
    )
    # keep first-occurrence ORDER (np.unique sorts lexicographically)
    order = np.argsort(first_idx, kind="stable")
    remap = np.empty(len(order), dtype=np.uint32)
    remap[order] = np.arange(len(order), dtype=np.uint32)
    sel = first_idx[order]
    return {
        "position": position[sel],
        "normal": normal[sel],
        "uv": uv[sel],
        "texture_id": texture_id[sel],
        "batch_id": batch_id[sel],
        "index": remap[inverse].astype(np.uint32),
    }
