"""Recursive tileset reader (S3): a committed 3D-Tiles directory → Dataset.

The reference emits a two-level tileset (root ``tileset.json`` → nested
z12 ``.json`` nodes → z16 ``.b3dm`` leaves,
``/root/reference/generate-tileset.ts:18-74``,
``src/tileset/tileset.ts:9-50``) and leaves reading to Cesium.  The
engine's reader walks the SAME layout: the JSON tree is traversed
driver-side (tiny — metadata only, any nesting depth), then every leaf
``.b3dm`` is decoded in parallel via ``ray.data.read_binary_files`` +
``map_batches`` — the payload bytes never pass through the driver.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa

import ray.data


def walk_tileset(root_dir: str, tileset_name: str = "tileset.json") -> list[dict]:
    """Recursively enumerate content leaves of a tileset tree.

    Returns one record per ``.b3dm`` leaf: ``{uri, path, geometric_error,
    bounding_volume, depth}``.  Nested ``.json`` contents recurse (cycle-
    and duplicate-safe)."""
    root = Path(root_dir)
    out: list[dict] = []
    seen: set[str] = set()

    def visit_node(node: dict, base: Path, depth: int) -> None:
        content = node.get("content")
        if content and "uri" in content:
            uri = content["uri"]
            target = (base / uri).resolve()
            if uri.endswith(".json"):
                if str(target) not in seen:
                    seen.add(str(target))
                    visit_file(target, depth + 1)
            else:
                out.append(
                    {
                        "uri": uri,
                        "path": str(target),
                        "geometric_error": node.get("geometricError"),
                        "bounding_volume": node.get("boundingVolume"),
                        "depth": depth,
                    }
                )
        for child in node.get("children", ()):  # pre-order, stable
            visit_node(child, base, depth + 1)

    def visit_file(path: Path, depth: int) -> None:
        doc = json.loads(path.read_text())
        visit_node(doc["root"], path.parent, depth)

    visit_file(root / tileset_name, 0)
    return out


def _decode_b3dm_batch(batch: pa.Table) -> pa.Table:
    """binary file rows → per-tile mesh metadata + buffers."""
    from ..stages.b3dm import parse_b3dm, parse_glb

    paths = batch.column("path").to_pylist()
    payloads = batch.column("bytes").to_pylist()
    rows: dict[str, list] = {
        "uri": [],
        "tile_z": [],
        "tile_x": [],
        "tile_y": [],
        "batch_length": [],
        "vertex_count": [],
        "osm_ids": [],
        "position": [],
        "normal": [],
        "uv": [],
        "batch_id": [],
    }
    for path, data in zip(paths, payloads):
        parsed = parse_b3dm(data)
        mesh = parse_glb(parsed["glb"])
        name = Path(path).stem  # reference naming: z_x_y.b3dm
        try:
            z, x, y = (int(v) for v in name.split("_"))
        except ValueError:
            z = x = y = -1
        rows["uri"].append(Path(path).name)
        rows["tile_z"].append(z)
        rows["tile_x"].append(x)
        rows["tile_y"].append(y)
        rows["batch_length"].append(parsed["feature_table"].get("BATCH_LENGTH", 0))
        rows["vertex_count"].append(len(mesh["position"]))
        rows["osm_ids"].append(
            [int(v) for v in parsed["batch_table"].get("osm_id", [])]
        )
        rows["position"].append(np.asarray(mesh["position"]).reshape(-1))
        rows["normal"].append(np.asarray(mesh["normal"]).reshape(-1))
        rows["uv"].append(np.asarray(mesh["uv"]).reshape(-1))
        rows["batch_id"].append(np.asarray(mesh["batch_id"]))
    return pa.table(
        {
            "uri": pa.array(rows["uri"], type=pa.string()),
            "tile_z": pa.array(rows["tile_z"], type=pa.int32()),
            "tile_x": pa.array(rows["tile_x"], type=pa.int32()),
            "tile_y": pa.array(rows["tile_y"], type=pa.int32()),
            "batch_length": pa.array(rows["batch_length"], type=pa.int32()),
            "vertex_count": pa.array(rows["vertex_count"], type=pa.int64()),
            "osm_ids": pa.array(rows["osm_ids"], type=pa.large_list(pa.int64())),
            "position": pa.array(rows["position"], type=pa.large_list(pa.float32())),
            "normal": pa.array(rows["normal"], type=pa.large_list(pa.float32())),
            "uv": pa.array(rows["uv"], type=pa.large_list(pa.float32())),
            "batch_id": pa.array(rows["batch_id"], type=pa.large_list(pa.uint16())),
        }
    )


def read_tileset(root_dir: str, tileset_name: str = "tileset.json") -> "ray.data.Dataset":
    """Committed 3D-Tiles output (e.g. ``export_b3dm``'s) → Dataset of
    decoded per-tile mesh rows.  JSON walk on the driver (metadata only);
    b3dm bytes read + decoded in parallel tasks."""
    leaves = walk_tileset(root_dir, tileset_name)
    paths = [leaf["path"] for leaf in leaves]
    if not paths:
        return ray.data.from_arrow(_decode_b3dm_batch(pa.table({"path": pa.array([], type=pa.string()), "bytes": pa.array([], type=pa.large_binary())})))
    files = ray.data.read_binary_files(paths, include_paths=True)
    return files.map_batches(_decode_b3dm_batch, batch_format="pyarrow")
