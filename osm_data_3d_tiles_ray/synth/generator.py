"""Deterministic synthetic corpus generator (FIXTURES.md schemas).

Generates, fully seeded and O(1)-seekable by row index (counter-based
splitmix64 hashing — no sequential RNG state):

* ``documents``    — the mandated input table
  ``doc_id:string, spans:list<struct<kind,text,media_ref,offset>>``
  (BASELINE.json ``input_hint``): building records ride in spans
  (``tag`` / ``geom`` / ``media`` / inert ``text`` spans).
* ``buildings``    — the flat decoded ground-truth view generated from the
  SAME in-memory values *before* span encoding (so it is an independent
  oracle for the span parser), plus generator-derived ``minx/miny/maxx/maxy``
  and ``centroid_x/centroid_y`` truth columns.
* ``dem``          — regular raster grid (row, col, x0, y0, dx, dy, z).
* ``query_points`` — kNN companion inputs.

Footprints are regular N-gons (optionally anisotropically scaled and
rotated) so centroid truth is analytic; ~15% carry a hole ring; ~30% of
hole-free rows carry an analytic straight-skeleton JSON tag (center fan),
matching the reference's precomputed-skeleton path
(``/root/reference/src/building/building-params.ts:143``); ~10% are snapped
onto z16 tile borders to exercise ownership dedup
(``/root/reference/src/unique-tile-per-building.ts``).

Coordinates are formatted with ``%.17g`` so span-text → float64 parsing is
bit-exact against the flat table.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..constants import TILE_SIZE_Z16, WORLD_HALF

SEED = np.uint64(0x05F5C41C0FFEE)

# Fixture extent (EPSG:3857, Lyon-ish): 80 km x 60 km.
EXTENT = (500000.0, 5690000.0, 580000.0, 5750000.0)

HOTSPOTS = np.array(
    [[520000.0, 5712000.0], [548000.0, 5731000.0], [565000.0, 5702000.0]]
)
HOTSPOT_SIGMA = 400.0

ATLAS_REFS = np.array(
    [
        "atlas://facades/brick_wall_diffuse",
        "atlas://facades/plaster_wall_diffuse",
        "atlas://facades/wood_wall_diffuse",
        "atlas://facades/block_wall_diffuse",
        "atlas://roofs/tiles_diffuse",
        "atlas://roofs/metal_diffuse",
        "atlas://roofs/concrete_diffuse",
    ]
)

ROOF_TYPE_VALUES = np.array(
    [
        "flat", "hipped", "gabled", "gambrel", "pyramidal", "onion", "dome",
        "round", "skillion", "mansard", "quadruple_saltbox", "saltbox", "weird_shape",
    ]
)
ROOF_MATERIAL_VALUES = np.array(
    [
        "tile", "tiles", "roof_tiles", "slate", "metal", "metal_sheet", "tin",
        "copper", "zinc", "concrete", "asphalt", "eternit", "asbestos", "thatch",
        "grass", "glass", "tar_paper", "unobtainium",
    ]
)
FACADE_MATERIAL_VALUES = np.array(
    [
        "brick", "cement_block", "block", "wood", "plaster", "plastered",
        "concrete", "hard", "glass", "mirror", "adobe",
    ]
)
COLOR_VALUES = np.array(
    [
        "red", "dark_red", "light blue", "#ff0000", "#a0B1c2", "Slate-Gray",
        "white;red", "#ff0000;blue", "not a color", "yellowgreen", "#12345",
    ]
)
BUILDING_TYPE_VALUES = np.array(
    [
        "yes", "house", "apartments", "roof", "garage", "shed", "silo",
        "water_tower", "industrial", "church", "office", "barn", "container",
    ]
)
ROOF_ORIENTATION_VALUES = np.array(["along", "across", "diagonal"])

_TAG_NAMES = [
    "building_type", "color", "height", "is_part", "levels", "material",
    "min_height", "min_level", "name", "osm_id", "osm_type", "roof_color",
    "roof_direction", "roof_height", "roof_levels", "roof_material",
    "roof_orientation", "roof_type", "windows", "skeleton",
] + [f"ombb{i}{j}" for i in range(4) for j in range(2)]


# ---------------------------------------------------------------------------
# counter-based hashing


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    return x ^ (x >> np.uint64(31))


def _u01(idx: np.ndarray, tag: int) -> np.ndarray:
    """Deterministic uniform [0,1) per (row index, field tag)."""
    tag_mix = np.uint64((int(tag) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    h = _splitmix64(
        np.asarray(idx, np.uint64) * np.uint64(0x2545F4914F6CDD1D) ^ tag_mix ^ SEED
    )
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


# ---------------------------------------------------------------------------
# scalar field synthesis


def _fields(start: int, n: int) -> dict[str, np.ndarray]:
    idx = np.arange(start, start + n, dtype=np.uint64)
    f: dict[str, np.ndarray] = {"idx": idx}
    f["osm_id"] = (idx + np.uint64(1)).astype(np.int64)
    f["osm_type"] = np.where(_u01(idx, 2) < 0.9, "way", "relation").astype(object)

    # position: 30% hotspot clusters, else uniform; every 10th row snapped to
    # a z16 tile border (border-straddler path for ownership dedup).
    u_hot = _u01(idx, 10)
    hot_i = (_u01(idx, 11) * len(HOTSPOTS)).astype(np.int64)
    # Box-Muller
    r = np.sqrt(-2.0 * np.log(np.maximum(_u01(idx, 12), 1e-12))) * HOTSPOT_SIGMA
    th = 2.0 * np.pi * _u01(idx, 13)
    hx = HOTSPOTS[hot_i, 0] + r * np.cos(th)
    hy = HOTSPOTS[hot_i, 1] + r * np.sin(th)
    ux = EXTENT[0] + _u01(idx, 14) * (EXTENT[2] - EXTENT[0])
    uy = EXTENT[1] + _u01(idx, 15) * (EXTENT[3] - EXTENT[1])
    in_hot = u_hot < 0.30
    cx = np.where(in_hot, hx, ux)
    cy = np.where(in_hot, hy, uy)
    cx = np.clip(cx, EXTENT[0] + 50, EXTENT[2] - 50)
    cy = np.clip(cy, EXTENT[1] + 50, EXTENT[3] - 50)
    straddle = (idx % np.uint64(10)) == 0
    # snap x onto the nearest tile border so the footprint spans two tiles
    border = np.round((cx + WORLD_HALF) / TILE_SIZE_Z16) * TILE_SIZE_Z16 - WORLD_HALF
    cx = np.where(straddle, border, cx)
    f["cx"], f["cy"] = cx, cy

    f["radius"] = 4.0 + 26.0 * _u01(idx, 16) + np.where(straddle, 6.0, 0.0)
    f["nverts"] = 4 + (_u01(idx, 17) * 9.0).astype(np.int64)  # 4..12
    f["rotation"] = _u01(idx, 18) * 2.0 * np.pi
    f["has_hole"] = _u01(idx, 19) < 0.15
    # anisotropic scale only when no skeleton tag (skeleton fan assumes regular)
    f["has_skeleton"] = (~f["has_hole"]) & (_u01(idx, 20) < 0.30)
    f["sx"] = np.where(f["has_skeleton"], 1.0, 1.0 + _u01(idx, 21))
    f["has_ombb"] = _u01(idx, 22) < 0.30

    def pick(tag: int, values: np.ndarray, p: float) -> tuple[np.ndarray, np.ndarray]:
        present = _u01(idx, tag) < p
        choice = values[(_u01(idx, tag + 500) * len(values)).astype(np.int64)]
        return present, choice.astype(object)

    f["height_p"] = _u01(idx, 30) < 0.5
    f["height"] = 3.0 + 60.0 * _u01(idx, 31) ** 2
    f["levels_p"] = _u01(idx, 32) < 0.4
    f["levels"] = (1 + (_u01(idx, 33) * 20.0)).astype(np.int64).astype(np.float64)
    f["min_height_p"] = _u01(idx, 34) < 0.15
    f["min_height"] = _u01(idx, 35) * 4.0
    f["min_level_p"] = _u01(idx, 36) < 0.10
    f["min_level"] = (_u01(idx, 37) * 3.0).astype(np.int64).astype(np.float64)
    f["roof_height_p"] = _u01(idx, 38) < 0.20
    f["roof_height"] = _u01(idx, 39) * 5.0
    f["roof_levels_p"] = _u01(idx, 40) < 0.15
    f["roof_levels"] = (_u01(idx, 41) * 3.0).astype(np.int64).astype(np.float64)
    f["roof_direction_p"] = _u01(idx, 42) < 0.15
    f["roof_direction"] = _u01(idx, 43) * 360.0

    f["roof_type_p"], f["roof_type"] = pick(44, ROOF_TYPE_VALUES, 0.6)
    f["roof_material_p"], f["roof_material"] = pick(45, ROOF_MATERIAL_VALUES, 0.4)
    f["roof_orientation_p"], f["roof_orientation"] = pick(46, ROOF_ORIENTATION_VALUES, 0.2)
    f["roof_color_p"], f["roof_color"] = pick(47, COLOR_VALUES, 0.25)
    f["material_p"], f["material"] = pick(48, FACADE_MATERIAL_VALUES, 0.4)
    f["color_p"], f["color"] = pick(49, COLOR_VALUES, 0.3)
    f["building_type_p"], f["building_type"] = pick(50, BUILDING_TYPE_VALUES, 0.5)
    f["windows_p"] = _u01(idx, 51) < 0.10
    f["windows"] = _u01(idx, 52) < 0.5
    f["name_p"] = _u01(idx, 53) < 0.30
    f["is_part"] = _u01(idx, 54) < 0.10

    f["media1_p"] = _u01(idx, 55) < 0.6
    f["media1"] = ATLAS_REFS[(_u01(idx, 56) * len(ATLAS_REFS)).astype(np.int64)]
    f["media2_p"] = _u01(idx, 57) < 0.2
    f["media2"] = ATLAS_REFS[(_u01(idx, 58) * len(ATLAS_REFS)).astype(np.int64)]
    return f


def _build_rings(f: dict[str, np.ndarray]):
    """Vectorized ring construction.

    Returns (coords (n_total,2) float64 incl. closing vertices, per-ring
    vertex counts, per-ring roles, per-poly ring counts, per-poly truth
    bbox/centroid).
    """
    n = len(f["idx"])
    k = f["nverts"]
    rot = f["rotation"]
    rad = f["radius"]
    sx = f["sx"]
    cx, cy = f["cx"], f["cy"]

    # open outer rings, vectorized over the flat vertex space
    row = np.repeat(np.arange(n), k)
    starts = np.concatenate([[0], np.cumsum(k)[:-1]])
    intra = np.arange(len(row)) - np.repeat(starts, k)
    # clockwise in the reference's screen convention: negative angle step
    ang = rot[row] - intra / k[row] * 2.0 * np.pi
    ox = cx[row] + np.cos(ang) * rad[row] * sx[row]
    oy = cy[row] + np.sin(ang) * rad[row]
    outer_open = np.stack([ox, oy], axis=1)

    # truth: bbox over outer ring (holes are interior, don't extend bbox)
    minx = np.minimum.reduceat(ox, starts)
    maxx = np.maximum.reduceat(ox, starts)
    miny = np.minimum.reduceat(oy, starts)
    maxy = np.maximum.reduceat(oy, starts)
    # truth centroid: vertex mean of the open outer ring
    centx = np.add.reduceat(ox, starts) / k
    centy = np.add.reduceat(oy, starts) / k

    has_hole = f["has_hole"]
    coords_per_poly: list[np.ndarray] = []
    ring_counts: list[int] = []
    ring_roles: list[int] = []
    poly_ring_counts = np.where(has_hole, 2, 1).astype(np.int32)

    # assemble closed rings; per-poly python loop only for ragged concat
    for i in range(n):
        s, e = starts[i], starts[i] + k[i]
        outer = outer_open[s:e]
        closed = np.vstack([outer, outer[:1]])
        coords_per_poly.append(closed)
        ring_counts.append(len(closed))
        ring_roles.append(0)
        if has_hole[i]:
            inner = (outer - [cx[i], cy[i]]) * 0.4 + [cx[i], cy[i]]
            inner = inner[::-1]  # reversed winding for the hole
            inner = np.vstack([inner, inner[:1]])
            coords_per_poly.append(inner)
            ring_counts.append(len(inner))
            ring_roles.append(1)

    coords = np.concatenate(coords_per_poly, axis=0)
    truth = {
        "minx": minx, "miny": miny, "maxx": maxx, "maxy": maxy,
        "centroid_x": centx, "centroid_y": centy,
    }
    return (
        coords,
        np.asarray(ring_counts, np.int64),
        np.asarray(ring_roles, np.int8),
        poly_ring_counts,
        truth,
        outer_open,
        starts,
        k,
    )


_FMT = "%.17g"


def _fmt_floats(a: np.ndarray) -> np.ndarray:
    return np.char.mod(_FMT, a)


def _skeleton_json(outer_open: np.ndarray, cx: float, cy: float) -> str:
    """Analytic center-fan straight skeleton of a regular polygon."""
    k = len(outer_open)
    verts = [[float(v[0]), float(v[1])] for v in outer_open] + [[float(cx), float(cy)]]
    polys = [[i, (i + 1) % k, k] for i in range(k)]
    return json.dumps({"vertices": verts, "polygons": polys}, separators=(",", ":"))


def generate_shard(start: int, n: int) -> tuple[pa.Table, pa.Table]:
    """Generate rows [start, start+n) → (documents table, buildings table)."""
    f = _fields(start, n)
    coords, ring_counts, ring_roles, poly_ring_counts, truth, outer_open, ostarts, k = (
        _build_rings(f)
    )
    n_rows = n

    # ---- flat buildings table -------------------------------------------
    ring_start_in_poly = np.concatenate([[0], np.cumsum(poly_ring_counts)])
    vert_offsets = np.concatenate([[0], np.cumsum(ring_counts)])

    flat_coords = coords.reshape(-1)
    coords_list: list[np.ndarray] = []
    ring_off_list: list[np.ndarray] = []
    roles_list: list[np.ndarray] = []
    for i in range(n_rows):
        r0, r1 = ring_start_in_poly[i], ring_start_in_poly[i + 1]
        v0, v1 = vert_offsets[r0], vert_offsets[r1]
        coords_list.append(flat_coords[v0 * 2 : v1 * 2])
        ring_off_list.append((vert_offsets[r0:r1] - vert_offsets[r0]).astype(np.int32))
        roles_list.append(ring_roles[r0:r1])

    def opt(colname: str, present_key: str, value_key: str, typ) -> pa.Array:
        vals = f[value_key]
        mask = ~f[present_key]
        arr = np.array(vals, dtype=object)
        arr[mask] = None
        return pa.array(arr.tolist(), type=typ)

    skeletons = np.full(n_rows, None, dtype=object)
    for i in np.nonzero(f["has_skeleton"])[0]:
        s, e = ostarts[i], ostarts[i] + k[i]
        skeletons[i] = _skeleton_json(outer_open[s:e], f["cx"][i], f["cy"][i])

    # OMBB tags: rotated bounding-rectangle corners (passthrough truth data)
    ombb_cols: dict[str, np.ndarray] = {
        f"ombb{i}{j}": np.full(n_rows, np.nan) for i in range(4) for j in range(2)
    }
    rot, rad, sxs = f["rotation"], f["radius"], f["sx"]
    c, s = np.cos(rot), np.sin(rot)
    for ci, (ux, uy) in enumerate([(1, 1), (-1, 1), (-1, -1), (1, -1)]):
        lx = ux * rad * sxs
        ly = uy * rad
        wx = f["cx"] + c * lx - s * ly
        wy = f["cy"] + s * lx + c * ly
        ombb_cols[f"ombb{ci}0"] = np.where(f["has_ombb"], wx, np.nan)
        ombb_cols[f"ombb{ci}1"] = np.where(f["has_ombb"], wy, np.nan)

    names = np.array([f"Building {i}" for i in f["idx"]], dtype=object)
    names[~f["name_p"]] = None

    bt = {
        "osm_id": pa.array(f["osm_id"]),
        "osm_type": pa.array(f["osm_type"].tolist(), type=pa.string()),
        "coords": pa.array(coords_list, type=pa.list_(pa.float64())),
        "ring_offsets": pa.array(ring_off_list, type=pa.list_(pa.int32())),
        "ring_roles": pa.array([r.tolist() for r in roles_list], type=pa.list_(pa.int8())),
        "height": opt("height", "height_p", "height", pa.float64()),
        "levels": opt("levels", "levels_p", "levels", pa.float64()),
        "min_height": opt("min_height", "min_height_p", "min_height", pa.float64()),
        "min_level": opt("min_level", "min_level_p", "min_level", pa.float64()),
        "roof_height": opt("roof_height", "roof_height_p", "roof_height", pa.float64()),
        "roof_levels": opt("roof_levels", "roof_levels_p", "roof_levels", pa.float64()),
        "roof_type": opt("roof_type", "roof_type_p", "roof_type", pa.string()),
        "roof_material": opt("roof_material", "roof_material_p", "roof_material", pa.string()),
        "roof_orientation": opt(
            "roof_orientation", "roof_orientation_p", "roof_orientation", pa.string()
        ),
        "roof_direction": opt("roof_direction", "roof_direction_p", "roof_direction", pa.float64()),
        "roof_color": opt("roof_color", "roof_color_p", "roof_color", pa.string()),
        "material": opt("material", "material_p", "material", pa.string()),
        "color": opt("color", "color_p", "color", pa.string()),
        "building_type": opt("building_type", "building_type_p", "building_type", pa.string()),
        "windows": opt("windows", "windows_p", "windows", pa.bool_()),
        "name": pa.array(names.tolist(), type=pa.string()),
        "is_part": pa.array(f["is_part"]),
        "skeleton": pa.array(skeletons.tolist(), type=pa.string()),
    }
    for cname, arr in ombb_cols.items():
        bt[cname] = pa.array(arr, type=pa.float64(), from_pandas=True)
    for cname, arr in truth.items():
        bt[cname] = pa.array(arr, type=pa.float64())
    buildings = pa.table(bt)

    # ---- documents (spans) table ----------------------------------------
    doc_idx: list[np.ndarray] = []
    rank: list[np.ndarray] = []
    kinds: list[np.ndarray] = []
    texts: list[np.ndarray] = []
    media: list[np.ndarray] = []

    def add_spans(d, rk, kind, txt, med=None):
        doc_idx.append(np.asarray(d, np.int64))
        rank.append(np.asarray(rk, np.int64))
        m = len(doc_idx[-1])
        kinds.append(np.full(m, kind, dtype=object))
        texts.append(np.asarray(txt, dtype=object))
        media.append(
            np.asarray(med, dtype=object) if med is not None else np.full(m, "", dtype=object)
        )

    all_rows = np.arange(n_rows)
    add_spans(
        all_rows,
        np.zeros(n_rows),
        "text",
        np.array([f"document {i} building record" for i in f["idx"]], dtype=object),
    )

    tag_rank = {t: 10 + i for i, t in enumerate(_TAG_NAMES)}

    def tag_value_strings(key: str) -> tuple[np.ndarray, np.ndarray]:
        """(row indices, 'key=value' strings) for present rows."""
        if key == "osm_id":
            return all_rows, np.char.add("osm_id=", f["osm_id"].astype(str)).astype(object)
        if key == "osm_type":
            rowsel = all_rows
            vals = np.array([f"osm_type={v}" for v in f["osm_type"]], dtype=object)
            return rowsel, vals
        if key == "is_part":
            vals = np.where(f["is_part"], "is_part=true", "is_part=false").astype(object)
            return all_rows, vals
        if key == "windows":
            sel = np.nonzero(f["windows_p"])[0]
            vals = np.where(f["windows"][sel], "windows=true", "windows=false").astype(object)
            return sel, vals
        if key == "name":
            sel = np.nonzero(f["name_p"])[0]
            return sel, np.array([f"name={names[i]}" for i in sel], dtype=object)
        if key == "skeleton":
            sel = np.nonzero(f["has_skeleton"])[0]
            return sel, np.array([f"skeleton={skeletons[i]}" for i in sel], dtype=object)
        if key.startswith("ombb"):
            sel = np.nonzero(f["has_ombb"])[0]
            vals = np.char.add(key + "=", _fmt_floats(ombb_cols[key][sel])).astype(object)
            return sel, vals
        pk = key + "_p"
        sel = np.nonzero(f[pk])[0]
        vals = f[key][sel]
        if isinstance(vals.dtype.type(), np.floating):
            return sel, np.char.add(key + "=", _fmt_floats(vals)).astype(object)
        return sel, np.array([f"{key}={v}" for v in vals], dtype=object)

    for t in _TAG_NAMES:
        sel, vals = tag_value_strings(t)
        if len(sel):
            add_spans(sel, np.full(len(sel), tag_rank[t]), "tag", vals)

    # geom spans: one per ring, outer first then hole (rank preserves order)
    pair_strs = np.char.add(
        np.char.add(_fmt_floats(coords[:, 0]), " "), _fmt_floats(coords[:, 1])
    )
    ring_doc = np.repeat(
        np.repeat(np.arange(n_rows), poly_ring_counts), 1
    )  # one entry per ring
    ring_rank_in_poly = np.concatenate(
        [np.arange(c) for c in poly_ring_counts]
    )
    ring_texts = []
    for r in range(len(ring_counts)):
        v0, v1 = vert_offsets[r], vert_offsets[r + 1]
        ring_texts.append(";".join(pair_strs[v0:v1]))
    add_spans(
        ring_doc, 1000 + ring_rank_in_poly, "geom", np.array(ring_texts, dtype=object)
    )

    sel1 = np.nonzero(f["media1_p"])[0]
    add_spans(
        sel1, np.full(len(sel1), 2000), "media",
        np.full(len(sel1), "", dtype=object), f["media1"][sel1],
    )
    sel2 = np.nonzero(f["media2_p"])[0]
    add_spans(
        sel2, np.full(len(sel2), 2001), "media",
        np.full(len(sel2), "", dtype=object), f["media2"][sel2],
    )

    d = np.concatenate(doc_idx)
    rk = np.concatenate(rank)
    kd = np.concatenate(kinds)
    tx = np.concatenate(texts)
    md = np.concatenate(media)
    order = np.lexsort((rk, d))
    d, kd, tx, md = d[order], kd[order], tx[order], md[order]

    counts = np.bincount(d, minlength=n_rows)
    lens = np.array([len(s) for s in tx], dtype=np.int64) + np.array(
        [len(s) for s in md], dtype=np.int64
    )
    cum = np.concatenate([[0], np.cumsum(lens)[:-1]])
    row_start_span = np.concatenate([[0], np.cumsum(counts)[:-1]])
    row_start_char = cum[row_start_span]
    offsets_in_row = (cum - np.repeat(row_start_char, counts)).astype(np.int32)

    struct = pa.StructArray.from_arrays(
        [
            pa.array(kd.tolist(), type=pa.string()),
            pa.array(tx.tolist(), type=pa.string()),
            pa.array(md.tolist(), type=pa.string()),
            pa.array(offsets_in_row, type=pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    list_offsets = pa.array(
        np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    )
    spans = pa.ListArray.from_arrays(list_offsets, struct)
    doc_ids = pa.array([f"doc_{int(i) + 1:012d}" for i in f["idx"]], type=pa.string())
    documents = pa.table({"doc_id": doc_ids, "spans": spans})
    return documents, buildings


# ---------------------------------------------------------------------------
# DEM + query points


def generate_dem(grid: int = 256) -> pa.Table:
    x0, y0 = EXTENT[0], EXTENT[1]
    dx = (EXTENT[2] - EXTENT[0]) / grid
    dy = (EXTENT[3] - EXTENT[1]) / grid
    rows, cols = np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij")
    rows = rows.reshape(-1)
    cols = cols.reshape(-1)
    xs = x0 + (cols + 0.5) * dx
    ys = y0 + (rows + 0.5) * dy
    z = (
        200.0
        + 60.0 * np.sin(xs / 9000.0) * np.cos(ys / 7000.0)
        + 25.0 * np.sin(xs / 2500.0 + 1.3)
        + 15.0 * np.cos(ys / 1700.0 + 0.7)
    )
    return pa.table(
        {
            "row": pa.array(rows.astype(np.int32)),
            "col": pa.array(cols.astype(np.int32)),
            "x0": pa.array(np.full(len(rows), x0)),
            "y0": pa.array(np.full(len(rows), y0)),
            "dx": pa.array(np.full(len(rows), dx)),
            "dy": pa.array(np.full(len(rows), dy)),
            "z": pa.array(z.astype(np.float32)),
        }
    )


def generate_query_points(n: int = 1000, k: int = 10) -> pa.Table:
    idx = np.arange(n, dtype=np.uint64)
    x = EXTENT[0] + _u01(idx, 900) * (EXTENT[2] - EXTENT[0])
    y = EXTENT[1] + _u01(idx, 901) * (EXTENT[3] - EXTENT[1])
    return pa.table(
        {
            "qid": pa.array(idx.astype(np.int64)),
            "x": pa.array(x),
            "y": pa.array(y),
            "k": pa.array(np.full(n, k, dtype=np.int32)),
        }
    )


# ---------------------------------------------------------------------------
# cache on disk


def n_docs_for_sf(sf: float) -> int:
    return max(100, int(round(sf * 2_000_000)))


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf(\d+(?:\.\d+)?)", str(sf_dir))
    return float(m.group(1)) if m else 0.01


def synth_dir(sf: float) -> Path:
    return Path(os.environ.get("OSM3D_SYNTH_ROOT", "/tmp/osm3d_synth")) / f"sf{sf:g}"


def ensure_synth(sf: float, shard_rows: int = 50_000) -> Path:
    """Idempotently materialize the synthetic corpus for a scale factor.

    Documents/buildings are written as one parquet *file per shard* under
    ``documents/`` and ``buildings/`` dirs (deterministic names → resumable,
    and a multi-file read parallelizes in Ray Data); dem/query_points are
    single small files.
    """
    root = synth_dir(sf)
    done = root / "_SUCCESS"
    if done.exists():
        return root
    n = n_docs_for_sf(sf)
    root.parent.mkdir(parents=True, exist_ok=True)
    tmp = Path(tempfile.mkdtemp(prefix="osm3d_synth_", dir=root.parent.as_posix()))
    (tmp / "documents").mkdir(parents=True)
    (tmp / "buildings").mkdir(parents=True)
    for start in range(0, n, shard_rows):
        cnt = min(shard_rows, n - start)
        docs, bldgs = generate_shard(start, cnt)
        pq.write_table(docs, tmp / "documents" / f"part-{start:010d}.parquet")
        pq.write_table(bldgs, tmp / "buildings" / f"part-{start:010d}.parquet")
    pq.write_table(generate_dem(), tmp / "dem.parquet")
    pq.write_table(generate_query_points(), tmp / "query_points.parquet")
    (tmp / "_SUCCESS").touch()
    try:
        tmp.rename(root)
    except OSError:
        # lost the race with a concurrent generator — theirs is equivalent
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return root
