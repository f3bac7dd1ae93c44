"""Per-building 3D geometry build — the actor-pool stage (G6–G17, M3, M4).

The Ray restatement of the reference's ``build3dBuildings``
(``/root/reference/src/build3dBuilding.ts:17-133``) + ``BuildingBuilder``
(``/root/reference/src/building/building-builder.ts``): for each parsed
building row,

1. winner tile (deterministic ownership rule — min (tile_x, tile_y) over
   the bbox cover, see stages/assign.py) and tile-frame coordinate offset
   (M3, ``build3dBuilding.ts:30-47``);
2. ring winding normalization (M4, ``build3dBuilding.ts:48-72``);
3. roof dispatch with flat fallback (G14,
   ``building-builder.ts:145-212,385-393``) + walls (G6) per ring;
4. SoA accumulation: position/uv/normal/texture_id buffers + per-building
   stats (vertex counts, bbox union, G15 ``building-builder.ts:418-459``).

This is a CLASS for ``map_batches(..., concurrency=N)`` — the roof-builder
registry and texture tables are constructed once per actor (the reference
loads skeleton WASM + texture atlases once per worker,
``seed-b3dm.ts:18-21``).  Output buffers are float32/uint8 Arrow lists
(zero-copy into the per-tile merge); stats-only mode skips buffer
materialization for count/bbox queries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..constants import WINDOW_WIDTH
from ..geom.rings import RingBatch, normalize_winding
from ..geom.roofs import (
    build_flat_roof,
    build_hipped_roof,
    build_pyramidal_roof,
    build_skillion_roof,
)
from ..geom.transforms import cell_id as cell_id_of, mercator_to_tile, tile_center
from ..geom.walls import build_walls
from .normalize import normalize_params

# engine texture-id registry (reference: ExtrudedTextures enum,
# src/building/roof/textures.ts; ids are engine-stable, atlas-agnostic)
FACADE_TEXTURE = {"plaster": 0, "glass": 1, "brick": 2, "wood": 3, "cementBlock": 4}
ROOF_TEXTURE = {
    "default": 10, "tiles": 11, "metal": 12, "concrete": 13, "thatch": 14,
    "eternit": 15, "grass": 16, "glass": 17, "tar": 18,
}


class Build3D:
    """Actor-pool callable: parsed buildings batch → per-building geometry."""

    def __init__(self, emit_buffers: bool = True):
        self.emit_buffers = emit_buffers
        # per-actor state: dispatch registry (built once, reference S4/G3 analog)
        self.roof_registry = {
            "flat": self._roof_flat,
            "hipped": self._roof_hipped,
            "pyramidal": self._roof_pyramidal,
            "skillion": self._roof_skillion,
        }

    # --- per-roof builders (bound methods so the registry is state) -------
    def _roof_flat(self, ctx) -> tuple[dict, np.ndarray | None]:
        return (
            build_flat_roof(
                ctx["coords"], ctx["ring_starts"], ctx["ring_roles"],
                z=ctx["height"], texture_id=ctx["roof_tex"],
            ),
            None,
        )

    def _roof_hipped(self, ctx):
        if not ctx["skeleton"]:
            return None
        out = build_hipped_roof(
            ctx["outer_ring"], ctx["skeleton"],
            min_height=ctx["height"] - ctx["roof_height"],
            roof_height=ctx["roof_height"], texture_id=ctx["roof_tex"],
        )
        return None if out is None else (out, None)

    def _roof_pyramidal(self, ctx):
        ring = ctx["outer_ring"]
        open_ring = ring[:-1] if len(ring) > 1 and (ring[0] == ring[-1]).all() else ring
        center = open_ring.mean(axis=0)
        return (
            build_pyramidal_roof(
                ctx["outer_ring"], center,
                min_height=ctx["height"] - ctx["roof_height"],
                roof_height=ctx["roof_height"], texture_id=ctx["roof_tex"],
            ),
            None,
        )

    def _roof_skillion(self, ctx):
        geom, zs = build_skillion_roof(
            ctx["coords"], ctx["ring_starts"], ctx["ring_roles"],
            ctx["roof_direction"],
            min_height=ctx["height"] - ctx["roof_height"],
            roof_height=ctx["roof_height"], texture_id=ctx["roof_tex"],
        )
        return geom, zs

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        params = normalize_params(batch)

        minx = batch.column("minx").to_numpy(zero_copy_only=False)
        miny = batch.column("miny").to_numpy(zero_copy_only=False)
        maxx = batch.column("maxx").to_numpy(zero_copy_only=False)
        maxy = batch.column("maxy").to_numpy(zero_copy_only=False)
        tx, ty = mercator_to_tile(minx, maxy)  # deterministic winner tile
        cx, cy = tile_center(tx, ty)
        cells = cell_id_of(tx, ty)

        coords_col = batch.column("coords")
        if isinstance(coords_col, pa.ChunkedArray):
            coords_col = coords_col.combine_chunks()
        ring_off_col = batch.column("ring_offsets")
        if isinstance(ring_off_col, pa.ChunkedArray):
            ring_off_col = ring_off_col.combine_chunks()
        ring_role_col = batch.column("ring_roles")
        if isinstance(ring_role_col, pa.ChunkedArray):
            ring_role_col = ring_role_col.combine_chunks()

        flat_coords = np.asarray(coords_col.values)
        coord_offsets = np.asarray(coords_col.offsets) // 2
        flat_ring_starts = np.asarray(ring_off_col.values)
        ring_offsets_per_row = np.asarray(ring_off_col.offsets)
        flat_roles = np.asarray(ring_role_col.values)

        heights = params.column("building_height").to_numpy(zero_copy_only=False)
        min_heights = params.column("building_min_height").to_numpy(zero_copy_only=False)
        roof_heights = params.column("building_roof_height").to_numpy(zero_copy_only=False)
        levels = params.column("building_levels").to_numpy(zero_copy_only=False)
        roof_types = params.column("roof_type").to_numpy(zero_copy_only=False)
        roof_dirs = params.column("roof_direction").to_numpy(zero_copy_only=False)
        roof_mats = params.column("roof_material").to_numpy(zero_copy_only=False)
        fac_mats = params.column("facade_material").to_numpy(zero_copy_only=False)
        windows = params.column("windows").to_numpy(zero_copy_only=False)
        skeletons = batch.column("skeleton").to_numpy(zero_copy_only=False)
        geom_valid = batch.column("geom_valid").to_numpy(zero_copy_only=False)

        out_rows = {
            "osm_id": batch.column("osm_id"),
            "cell_id": pa.array(cells, type=pa.uint64()),
            "tile_x": pa.array(tx),
            "tile_y": pa.array(ty),
        }
        wall_counts = np.zeros(n, dtype=np.int64)
        roof_counts = np.zeros(n, dtype=np.int64)
        roof_used = np.empty(n, dtype=object)
        bboxes = np.full((n, 6), np.nan)
        positions: list[np.ndarray] = []
        uvs: list[np.ndarray] = []
        normals: list[np.ndarray] = []
        tex_ids: list[np.ndarray] = []

        for i in range(n):
            if not geom_valid[i]:
                roof_used[i] = "invalid"
                if self.emit_buffers:
                    positions.append(np.empty((0, 3), np.float32))
                    uvs.append(np.empty((0, 2), np.float32))
                    normals.append(np.empty((0, 3), np.float32))
                    tex_ids.append(np.empty(0, np.uint8))
                continue
            c0, c1 = coord_offsets[i], coord_offsets[i + 1]
            coords = flat_coords[c0 * 2 : c1 * 2].reshape(-1, 2).copy()
            # M3: offset to tile frame
            coords[:, 0] -= cx[i]
            coords[:, 1] -= cy[i]
            r0, r1 = ring_offsets_per_row[i], ring_offsets_per_row[i + 1]
            ring_starts = flat_ring_starts[r0:r1].astype(np.int64)
            roles = flat_roles[r0:r1]
            # M4: winding normalization
            rb = RingBatch(
                coords,
                np.concatenate([ring_starts, [len(coords)]]),
                roles,
                np.array([0, len(ring_starts)]),
            )
            rb = normalize_winding(rb)
            coords = rb.coords

            h = heights[i]
            mh = min_heights[i]
            rh = roof_heights[i]
            lv = levels[i]
            roof_tex = ROOF_TEXTURE.get(roof_mats[i], 13)
            wall_tex = FACADE_TEXTURE.get(fac_mats[i], 0)
            win_tex = wall_tex if not windows[i] else wall_tex + 100

            ends = np.concatenate([ring_starts[1:], [len(coords)]])
            outer_ring = coords[ring_starts[0] : ends[0]]
            ctx = {
                "coords": coords,
                "ring_starts": ring_starts,
                "ring_roles": roles,
                "outer_ring": outer_ring,
                "height": h,
                "roof_height": rh,
                "roof_direction": None if np.isnan(roof_dirs[i]) else roof_dirs[i],
                "roof_tex": roof_tex,
                "skeleton": skeletons[i],
            }
            builder = self.roof_registry.get(roof_types[i], self._roof_flat)
            result = builder(ctx)
            used = roof_types[i] if roof_types[i] in self.roof_registry else "flat"
            if result is None:  # fallback to flat (reference semantics)
                result = self._roof_flat(ctx)
                used = "flat"
            roof_geom, height_points_all = result
            roof_used[i] = used

            parts = [roof_geom]
            wall_height = h - rh
            for r in range(len(ring_starts)):
                ring = coords[ring_starts[r] : ends[r]]
                hp = None
                if height_points_all is not None:
                    hp = height_points_all[ring_starts[r] : ends[r]]
                parts.append(
                    build_walls(
                        ring,
                        min_height=mh,
                        height=wall_height if hp is None else wall_height,
                        levels=lv,
                        window_width=WINDOW_WIDTH,
                        texture_id_window=win_tex % 256,
                        texture_id_wall=wall_tex,
                        height_points=hp,
                    )
                )
            pos = np.concatenate([p["position"] for p in parts])
            uv = np.concatenate([p["uv"] for p in parts])
            nrm = np.concatenate([p["normal"] for p in parts])
            tid = np.concatenate([p["texture_id"] for p in parts])
            roof_counts[i] = len(roof_geom["position"])
            wall_counts[i] = len(pos) - roof_counts[i]
            if len(pos):
                bboxes[i, :3] = pos.min(axis=0)
                bboxes[i, 3:] = pos.max(axis=0)
            if self.emit_buffers:
                positions.append(pos)
                uvs.append(uv)
                normals.append(nrm)
                tex_ids.append(tid)

        out_rows["roof_type_used"] = pa.array(roof_used, type=pa.string())
        out_rows["wall_vertices"] = pa.array(wall_counts)
        out_rows["roof_vertices"] = pa.array(roof_counts)
        out_rows["vertex_count"] = pa.array(wall_counts + roof_counts)
        for j, name in enumerate(["min_x", "min_y", "min_z", "max_x", "max_y", "max_z"]):
            out_rows[name] = pa.array(bboxes[:, j])
        if self.emit_buffers:
            out_rows["position"] = _list_of_f32(positions, 3)
            out_rows["uv"] = _list_of_f32(uvs, 2)
            out_rows["normal"] = _list_of_f32(normals, 3)
            out_rows["texture_id"] = _list_of_u8(tex_ids)
        return pa.table(out_rows)


class Build3DStats(Build3D):
    """Stats-only variant (no buffer materialization) — separate class so the
    actor pool needs no constructor arguments (clean restarts)."""

    def __init__(self):
        super().__init__(emit_buffers=False)


def _list_of_f32(arrays: list[np.ndarray], width: int) -> pa.ListArray:
    lens = np.array([a.size for a in arrays], dtype=np.int64)
    flat = (
        np.concatenate([a.reshape(-1) for a in arrays])
        if arrays
        else np.empty(0, np.float32)
    )
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    return pa.LargeListArray.from_arrays(
        pa.array(offsets, type=pa.int64()), pa.array(flat, type=pa.float32())
    )


def _list_of_u8(arrays: list[np.ndarray]) -> pa.ListArray:
    lens = np.array([len(a) for a in arrays], dtype=np.int64)
    flat = np.concatenate(arrays) if arrays else np.empty(0, np.uint8)
    offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    return pa.LargeListArray.from_arrays(
        pa.array(offsets, type=pa.int64()), pa.array(flat, type=pa.uint8())
    )
