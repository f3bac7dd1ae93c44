"""Tileset tree construction (A6 + S5 + M18).

Reference: root tileset lists z12 cells over the extent, each z12 JSON lists
its z16 ``.b3dm`` children (``/root/reference/generate-tileset.ts:18-74``,
``src/tileset/tileset.ts:9-50``), with ``geometricError: 512``,
``refine: 'ADD'``, ``TILE_HEIGHT = 300`` (``src/tileset/utils.ts:3``) and a
Mercator box or ECEF region bounding volume per node
(``src/tileset/box.ts:7-80``, ``src/tileset/region.ts:7-95``).

Ray-native restatement: the per-tile metadata is an aggregated Dataset
(small — one row per NON-EMPTY z16 cell); the JSON fan-in happens driver
side from that aggregate (A6 is a metadata aggregate, not a data shuffle).
Only non-empty tiles get children (the reference enumerates the full grid
and 404s empty tiles; emitting only non-empty children is the batch-mode
equivalent and is documented).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pandas as pd

from ..constants import GEOMETRIC_ERROR, REFINE, ROOT_ZOOM, TILE_HEIGHT
from ..geom.transforms import (
    enu_basis_ecef,
    lonlat_to_ecef,
    mercator_to_lonlat,
    tile_extent,
)


def _box_volume(ext: np.ndarray, min_z: float = 0.0, max_z: float = TILE_HEIGHT) -> list:
    """3D Tiles oriented box [cx, cy, cz, xhalf..., yhalf..., zhalf...] in a
    Mercator-local frame (reference: src/tileset/box.ts:57-80)."""
    cx = (ext[0] + ext[2]) / 2.0
    cy = (ext[1] + ext[3]) / 2.0
    cz = (min_z + max_z) / 2.0
    hx = (ext[2] - ext[0]) / 2.0
    hy = (ext[3] - ext[1]) / 2.0
    hz = (max_z - min_z) / 2.0
    return [cx, cy, cz, hx, 0, 0, 0, hy, 0, 0, 0, hz]


def _region_volume(ext: np.ndarray, min_z: float = 0.0, max_z: float = TILE_HEIGHT) -> list:
    """3D Tiles region [west, south, east, north] in radians + heights
    (reference: src/tileset/region.ts:81-95)."""
    lon0, lat0 = mercator_to_lonlat(ext[0], ext[1])
    lon1, lat1 = mercator_to_lonlat(ext[2], ext[3])
    return [
        float(np.radians(lon0)), float(np.radians(lat0)),
        float(np.radians(lon1)), float(np.radians(lat1)),
        min_z, max_z,
    ]


def ecef_transform_at(ext: np.ndarray) -> list[float]:
    """Column-major 4x4 ENU placement matrix at the extent center
    (reference: src/tileset/region.ts:7-33 — ENU basis columns + ECEF
    origin at height TILE_HEIGHT/2)."""
    clon, clat = mercator_to_lonlat((ext[0] + ext[2]) / 2.0, (ext[1] + ext[3]) / 2.0)
    lon_r, lat_r = np.radians(clon), np.radians(clat)
    basis = enu_basis_ecef(lon_r, lat_r)  # rows E, N, U
    origin = lonlat_to_ecef(lon_r, lat_r, TILE_HEIGHT / 2.0)
    m = np.eye(4)
    m[:3, 0] = basis[0]
    m[:3, 1] = basis[1]
    m[:3, 2] = basis[2]
    m[:3, 3] = origin
    return [float(v) for v in m.reshape(16, order="F")]


def ecef_child_transform(ext: np.ndarray, parent_transform: list[float]) -> list[float]:
    """Per-leaf parent-relative transform (reference:
    src/tileset/region.ts:36-79): translation = the child center's ECEF
    delta from the parent origin expressed in the parent's ENU frame;
    rotation = the finite-difference jacobian of EPSG:3857 → child-local
    ENU at the child center (+1 m steps), z column identity."""
    x0 = (ext[0] + ext[2]) / 2.0
    y0 = (ext[1] + ext[3]) / 2.0
    h0 = TILE_HEIGHT / 2.0

    def ecef_of(mx, my):
        lon, lat = mercator_to_lonlat(mx, my)
        return lonlat_to_ecef(np.radians(lon), np.radians(lat), h0)

    c0 = ecef_of(x0, y0)
    lon0, lat0 = mercator_to_lonlat(x0, y0)
    basis0 = enu_basis_ecef(np.radians(lon0), np.radians(lat0))  # rows E,N,U
    vx = basis0 @ (ecef_of(x0 + 1.0, y0) - c0)
    vy = basis0 @ (ecef_of(x0, y0 + 1.0) - c0)

    pm = np.array(parent_transform, dtype=np.float64).reshape(4, 4, order="F")
    rot = pm[:3, :3]
    delta_local = np.linalg.inv(rot) @ (c0 - pm[:3, 3])

    m = np.eye(4)
    m[:3, 0] = vx
    m[:3, 1] = vy
    m[:3, 2] = [0.0, 0.0, 1.0]
    m[:3, 3] = delta_local
    return [float(v) for v in m.reshape(16, order="F")]


def lambert93_transform_at(ext: np.ndarray) -> list[float]:
    """customBox root transform (reference: src/tileset/customBox.ts:21-39):
    pure translation to the extent center in EPSG:2154."""
    from ..geom.transforms import mercator_to_lambert93

    x0, y0 = mercator_to_lambert93(
        np.array([ext[0], ext[2]]), np.array([ext[1], ext[3]])
    )
    m = np.eye(4)
    m[0, 3] = float((x0[0] + x0[1]) * 0.5)
    m[1, 3] = float((y0[0] + y0[1]) * 0.5)
    return [float(v) for v in m.reshape(16, order="F")]


def lambert93_child_transform(
    ext: np.ndarray, parent_transform: list[float]
) -> list[float]:
    """customBox child transform (reference: src/tileset/customBox.ts:41-81):
    translation = child center's 2154 delta from the parent origin (parent
    rotation inverted — identity here); rotation = finite-difference
    jacobian of 3857 → 2154 at the child center, z identity."""
    from ..geom.transforms import mercator_to_lambert93

    x0 = (ext[0] + ext[2]) / 2.0
    y0 = (ext[1] + ext[3]) / 2.0
    px, py = mercator_to_lambert93(
        np.array([x0, x0 + 1.0, x0]), np.array([y0, y0, y0 + 1.0])
    )
    p0 = np.array([px[0], py[0], 0.0])
    vx = np.array([px[1] - px[0], py[1] - py[0], 0.0])
    vy = np.array([px[2] - px[0], py[2] - py[0], 0.0])

    pm = np.array(parent_transform, dtype=np.float64).reshape(4, 4, order="F")
    rot = pm[:3, :3]
    delta_local = np.linalg.inv(rot) @ (p0 - pm[:3, 3])

    m = np.eye(4)
    m[:3, 0] = vx
    m[:3, 1] = vy
    m[:3, 2] = [0.0, 0.0, 1.0]
    m[:3, 3] = delta_local
    return [float(v) for v in m.reshape(16, order="F")]


def lambert93_box_volume(ext: np.ndarray, max_z: float = TILE_HEIGHT) -> list:
    """customBox bounding volume (reference: src/tileset/customBox.ts:84-107):
    extent reprojected to 2154, box spanning [0,w]×[0,h]×[0,zMax] with
    center at the half-sizes."""
    from ..geom.transforms import mercator_to_lambert93

    xs, ys = mercator_to_lambert93(
        np.array([ext[0], ext[2]]), np.array([ext[1], ext[3]])
    )
    w = float(abs(xs[1] - xs[0]))
    h = float(abs(ys[1] - ys[0]))
    return [w / 2, h / 2, max_z / 2, w / 2, 0, 0, 0, h / 2, 0, 0, 0, max_z / 2]


def _volume(
    projection: str, ext: np.ndarray, min_z: float = 0.0, max_z: float = TILE_HEIGHT
) -> dict:
    if projection == "mercator":
        return {"box": _box_volume(ext, min_z, max_z)}
    if projection == "lambert93":
        return {"box": lambert93_box_volume(ext, max_z)}
    return {"region": _region_volume(ext, min_z, max_z)}


def _parent_node(
    px: int,
    py: int,
    g: pd.DataFrame,
    projection: str,
    uri_pattern: str,
    leaf_z: int,
) -> tuple[str, dict, dict]:
    """One z12 parent's JSON node + its root-child entry, from that
    parent's z16 rows (sorted by tile_x, tile_y)."""
    pext = tile_extent(np.array([px]), np.array([py]), ROOT_ZOOM)[0]
    node_transform = None
    if projection == "ecef":
        node_transform = ecef_transform_at(pext)
    elif projection == "lambert93":
        node_transform = lambert93_transform_at(pext)
    children = []
    for row in g.itertuples():
        ext = tile_extent(np.array([row.tile_x]), np.array([row.tile_y]), leaf_z)[0]
        max_z = getattr(row, "max_z", None)
        vol_h = float(max_z) if max_z is not None and np.isfinite(max_z) else TILE_HEIGHT
        child = {
            "boundingVolume": _volume(projection, ext, 0.0, vol_h),
            "geometricError": 0,
            "refine": REFINE,
            "content": {
                "uri": uri_pattern.format(z=leaf_z, x=row.tile_x, y=row.tile_y)
            },
        }
        # per-leaf parent-relative transform (region.ts:36-79 /
        # customBox.ts:41-81): without it, leaf placement error grows
        # with distance from the parent center
        if projection == "ecef":
            child["transform"] = ecef_child_transform(ext, node_transform)
        elif projection == "lambert93":
            child["transform"] = lambert93_child_transform(ext, node_transform)
        children.append(child)
    node_name = f"{ROOT_ZOOM}_{px}_{py}.json"
    node = {
        "asset": {"version": "1.0"},
        "geometricError": GEOMETRIC_ERROR,
        "root": {
            "boundingVolume": _volume(projection, pext),
            "geometricError": GEOMETRIC_ERROR,
            "refine": REFINE,
            "children": children,
        },
    }
    if node_transform is not None:
        node["root"]["transform"] = node_transform
    root_child = {
        "boundingVolume": _volume(projection, pext),
        "geometricError": GEOMETRIC_ERROR,
        "refine": REFINE,
        "content": {"uri": node_name},
    }
    return node_name, node, root_child


def _root_node(pxs: np.ndarray, pys: np.ndarray, root_children: list[dict]) -> dict:
    all_ext = None
    if len(pxs):
        e0 = tile_extent(pxs, pys, ROOT_ZOOM)
        all_ext = np.array(
            [e0[:, 0].min(), e0[:, 1].min(), e0[:, 2].max(), e0[:, 3].max()]
        )
    return {
        "asset": {"version": "1.0"},
        "geometricError": GEOMETRIC_ERROR,
        "root": {
            "boundingVolume": (
                {"box": _box_volume(all_ext)}
                if all_ext is not None
                else {"box": _box_volume(np.zeros(4))}
            ),
            "geometricError": GEOMETRIC_ERROR,
            "refine": REFINE,
            "children": root_children,
        },
    }


def build_tileset_tree(
    tile_stats_df: pd.DataFrame,
    projection: str = "mercator",
    uri_pattern: str = "{z}/{x}/{y}.b3dm",
) -> dict[str, dict]:
    """Per-tile stats (tile_z/tile_x/tile_y/batch_length[,max_z]) → the full
    tileset JSON dict tree: ``{"tileset.json": root, "<z12 key>.json": ...}``.

    Driver-side builder for small/in-memory stats (tests, CLI); the
    pipeline-scale path is :func:`write_tileset_distributed`, which emits
    byte-identical files from tasks.
    """
    df = tile_stats_df
    leaf_z = int(df["tile_z"].iloc[0]) if len(df) else 16
    shift = leaf_z - ROOT_ZOOM
    df = df.assign(
        parent_x=df["tile_x"].to_numpy() >> shift,
        parent_y=df["tile_y"].to_numpy() >> shift,
    ).sort_values(["parent_x", "parent_y", "tile_x", "tile_y"])

    out: dict[str, dict] = {}
    root_children = []
    for (px, py), g in df.groupby(["parent_x", "parent_y"], sort=True):
        node_name, node, root_child = _parent_node(
            int(px), int(py), g, projection, uri_pattern, leaf_z
        )
        out[node_name] = node
        root_children.append(root_child)
    pxs = df["parent_x"].to_numpy() if len(df) else np.zeros(0, dtype=np.int64)
    pys = df["parent_y"].to_numpy() if len(df) else np.zeros(0, dtype=np.int64)
    out["tileset.json"] = _root_node(pxs, pys, root_children)
    return out


def write_tileset(tree: dict[str, dict], out_dir: str) -> None:
    p = Path(out_dir)
    p.mkdir(parents=True, exist_ok=True)
    for name, payload in tree.items():
        (p / name).write_text(json.dumps(payload, sort_keys=True))


def write_parent_node_json(
    px: int,
    py: int,
    leaf_df: pd.DataFrame,
    out_dir: str,
    projection: str = "mercator",
    uri_pattern: str = "{z}/{x}/{y}.b3dm",
) -> None:
    """Write ONE z12 parent's node JSON from its leaf rows (tile_z/tile_x/
    tile_y/batch_length[,max_z]) — atomic tmp+rename, byte-identical to the
    corresponding :func:`build_tileset_tree` entry.  Called from inside
    seed's ``write_parent`` task, which already holds every row of the
    parent: the node is produced where the data already lives, so the
    tileset step adds zero reads and zero shuffle."""
    import os

    df = leaf_df.sort_values(["tile_x", "tile_y"])
    leaf_z = int(df["tile_z"].iloc[0])
    name, node, _ = _parent_node(
        int(px), int(py), df, projection, uri_pattern, leaf_z
    )
    p = Path(out_dir)
    p.mkdir(parents=True, exist_ok=True)
    tmp = p / f".{name}.tmp-{os.getpid()}"
    tmp.write_text(json.dumps(node, sort_keys=True))
    os.replace(tmp, p / name)


def write_root_from_parents(
    pxs: np.ndarray,
    pys: np.ndarray,
    out_dir: str,
    projection: str = "mercator",
) -> None:
    """Assemble + write the root ``tileset.json`` from the z12 parent
    coordinates alone (a root child's volume and uri depend only on
    (px, py) — reference: ``/root/reference/generate-tileset.ts:37-65``
    lists exactly this per-node set in its root).  Byte-identical to
    :func:`build_tileset_tree`'s root entry.  Driver-side cost is bounded
    by the z12 parent count — the same set the reference's single root
    file must enumerate."""
    order = np.lexsort((pys, pxs))
    pxs = np.asarray(pxs, dtype=np.int64)[order]
    pys = np.asarray(pys, dtype=np.int64)[order]
    children = []
    for px, py in zip(pxs, pys):
        pext = tile_extent(np.array([px]), np.array([py]), ROOT_ZOOM)[0]
        children.append(
            {
                "boundingVolume": _volume(projection, pext),
                "geometricError": GEOMETRIC_ERROR,
                "refine": REFINE,
                "content": {"uri": f"{ROOT_ZOOM}_{px}_{py}.json"},
            }
        )
    root = _root_node(pxs, pys, children)
    p = Path(out_dir)
    p.mkdir(parents=True, exist_ok=True)
    (p / "tileset.json").write_text(json.dumps(root, sort_keys=True))


def write_tileset_distributed(
    stats_ds: "object",
    out_dir: str,
    projection: str = "mercator",
    uri_pattern: str = "{z}/{x}/{y}.b3dm",
    num_partitions: int = 64,
) -> int:
    """z12-keyed distributed tileset fan-in (the reference walks the z12
    grid and writes one JSON per node + a root listing them,
    ``/root/reference/generate-tileset.ts:37-65``): tasks write the
    per-parent node JSONs (atomic tmp+rename, byte-identical to
    :func:`write_tileset`); only ONE small row per z12 parent returns to
    the driver, which assembles the root — per-tile stats never
    materialize driver-side (the root file itself enumerates every z12
    child, so the per-parent fan-in is the same bounded set the reference
    puts in one file).  ``out_dir`` must be shared storage on a
    multi-node cluster.  Returns the number of parent nodes written.

    ``stats_ds``: Dataset with tile_z/tile_x/tile_y/batch_length[,max_z]
    columns (one row per non-empty leaf tile).

    (seed_tiles does not go through this exchange at all: its
    ``write_parent`` task already holds every row of one z12 parent, so
    it writes the node JSON in-task via :func:`write_parent_node_json`
    and the root comes from the manifest — zero extra read or shuffle.)
    """
    import os

    import pyarrow as pa

    from ..pipelines.partition import map_key_partitions

    os.makedirs(out_dir, exist_ok=True)

    def add_parent(batch: pa.Table) -> pa.Table:
        tx = batch.column("tile_x").to_numpy(zero_copy_only=False).astype(np.int64)
        ty = batch.column("tile_y").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(batch):
            shift = int(batch.column("tile_z")[0].as_py()) - ROOT_ZOOM
        else:
            shift = 4
        return batch.append_column(
            "parent_x", pa.array(tx >> shift)
        ).append_column("parent_y", pa.array(ty >> shift))

    def write_nodes(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "parent_x": pa.array([], type=pa.int64()),
                "parent_y": pa.array([], type=pa.int64()),
                "root_child": pa.array([], type=pa.string()),
            }
        )
        if len(tbl) == 0:
            return empty
        df = tbl.to_pandas().sort_values(
            ["parent_x", "parent_y", "tile_x", "tile_y"]
        )
        leaf_z = int(df["tile_z"].iloc[0])
        out_px, out_py, out_child = [], [], []
        for (px, py), g in df.groupby(["parent_x", "parent_y"], sort=True):
            name, node, root_child = _parent_node(
                int(px), int(py), g, projection, uri_pattern, leaf_z
            )
            tmp = Path(out_dir) / f".{name}.tmp-{os.getpid()}"
            tmp.write_text(json.dumps(node, sort_keys=True))
            os.replace(tmp, Path(out_dir) / name)
            out_px.append(int(px))
            out_py.append(int(py))
            out_child.append(json.dumps(root_child, sort_keys=True))
        return pa.table(
            {
                "parent_x": pa.array(out_px, type=pa.int64()),
                "parent_y": pa.array(out_py, type=pa.int64()),
                "root_child": pa.array(out_child, type=pa.string()),
            }
        )

    keyed = stats_ds.map_batches(add_parent, batch_format="pyarrow")
    rows = map_key_partitions(
        keyed, ["parent_x", "parent_y"], write_nodes, num_partitions
    ).take_all()
    rows.sort(key=lambda r: (r["parent_x"], r["parent_y"]))
    pxs = np.array([r["parent_x"] for r in rows], dtype=np.int64)
    pys = np.array([r["parent_y"] for r in rows], dtype=np.int64)
    children = [json.loads(r["root_child"]) for r in rows]
    root = _root_node(pxs, pys, children)
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    (Path(out_dir) / "tileset.json").write_text(json.dumps(root, sort_keys=True))
    return len(rows)
