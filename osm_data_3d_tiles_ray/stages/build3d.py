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

Hot-path layout: the coordinate offset, winding normalization and ALL wall
geometry are whole-batch numpy (see geom/walls_batch.py); only the roof
build (earcut / skeleton loft) runs per building.  This is a CLASS for
``map_batches(..., concurrency=N)`` — the roof-builder registry is
per-actor state (the reference loads skeleton WASM + texture atlases once
per worker, ``seed-b3dm.ts:18-21``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..constants import TILE_SIZE_Z16, WINDOW_WIDTH
from ..geom.earcut import triangulate_multipolygon
from ..geom.skeleton import skeleton_json
from ..tables.atlas import apply_atlas_uv, uv_transform_table
from ..geom.roofs import (
    PROFILE_DOME,
    PROFILE_GABLED,
    PROFILE_GAMBREL,
    PROFILE_ONION,
    PROFILE_ROUND,
    PROFILE_SALTBOX,
    build_curved_roof,
    build_flat_roof,
    build_flat_roof_clipped,
    build_hipped_roof,
    build_oriented_profile_roof,
    build_pyramidal_roof,
    build_gabled_skeleton_roof,
    build_skillion_roof,
    gambrel_remap,
    mansard_remap,
    quadruple_saltbox_remap,
)
from ..geom.transforms import cell_id as cell_id_of, mercator_to_tile, tile_center
from ..geom.walls_batch import build_walls_batch
from .normalize import normalize_params

# engine texture-id registry (reference: ExtrudedTextures enum,
# src/building/roof/textures.ts; ids are engine-stable, atlas-agnostic)
FACADE_TEXTURE = {"plaster": 0, "glass": 1, "brick": 2, "wood": 3, "cementBlock": 4}
FACADE_WINDOW_OFFSET = 100
ROOF_TEXTURE = {
    "default": 10, "tiles": 11, "metal": 12, "concrete": 13, "thatch": 14,
    "eternit": 15, "grass": 16, "glass": 17, "tar": 18,
}
# metres per texture tile, per material (reference textureIdToScale +
# the 32 m generic default, src/building/builder.ts:259-280)
ROOF_TEXTURE_SCALE = {
    10: (32.0, 32.0), 11: (3.0, 3.0), 12: (4.0, 4.0), 13: (10.0, 10.0),
    14: (8.0, 8.0), 15: (5.0, 5.0), 16: (12.0, 12.0), 17: (4.0, 4.0),
    18: (4.0, 4.0),
}


class Build3D:
    """Actor-pool callable: parsed buildings batch → per-building geometry.

    ``flat_uv_clip=True`` enables reference-parity flat roofs (OMBB-frame
    UVs clipped to integer texture cells, flat-roof-builders.ts:30-180) at
    ~one tessellation per texture tile covered; the default keeps the
    cheaper whole-batch flat path (world-scaled UVs wrapped per frame) —
    a documented throughput/storage trade."""

    def __init__(self, emit_buffers: bool = True, flat_uv_clip: bool = False):
        self.emit_buffers = emit_buffers
        self.flat_uv_clip = flat_uv_clip
        # per-actor state: atlas frame → UV transform table, built once
        # (reference loads the atlas frame dict once per worker, S4/J3)
        self.uv_table = uv_transform_table()
        # dispatch mirrors building-builder.ts:145-212; quadrupleSaltbox and
        # unknown types fall back to flat (engine round-1 coverage; the
        # reference's own skeleton-failure fallback is flat too, :385-393)
        self.roof_registry = {
            "flat": self._roof_flat,
            "hipped": self._roof_hipped,
            "pyramidal": self._roof_pyramidal,
            "skillion": self._roof_skillion,
            "dome": self._roof_dome,
            "onion": self._roof_onion,
            "round": self._roof_round,
            "gabled": self._roof_gabled,
            "gambrel": self._roof_gambrel,
            "saltbox": self._roof_saltbox,
            "mansard": self._roof_mansard,
            "quadrupleSaltbox": self._roof_quadruple_saltbox,
        }

    # --- per-roof builders ------------------------------------------------
    def _roof_flat(self, ctx):
        return (
            build_flat_roof(
                ctx["coords"], ctx["ring_starts"], ctx["ring_roles"],
                z=ctx["height"], texture_id=ctx["roof_tex"],
            ),
            None,
        )

    def _skeleton_for(self, ctx) -> tuple[str | None, tuple[float, float]]:
        """Tag-provided skeleton (world frame → tile offset applied), else
        the engine's own convex straight-skeleton kernel (already in tile
        frame)."""
        if ctx["skeleton"]:
            return ctx["skeleton"], ctx["tile_center"]
        if len(ctx["ring_starts"]) == 1:  # hole-free only
            sk = skeleton_json(ctx["outer_ring"])
            if sk is not None:
                return sk, (0.0, 0.0)
        return None, (0.0, 0.0)

    def _roof_hipped(self, ctx):
        sk, off = self._skeleton_for(ctx)
        if not sk:
            return None
        out = build_hipped_roof(
            ctx["outer_ring"], sk,
            min_height=ctx["height"] - ctx["roof_height"],
            roof_height=ctx["roof_height"], texture_id=ctx["roof_tex"],
            skeleton_offset=off,
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

    def _curved(self, ctx, profile):
        ring = ctx["outer_ring"]
        open_ring = ring[:-1] if len(ring) > 1 and (ring[0] == ring[-1]).all() else ring
        if len(open_ring) < 3:
            return None
        center = open_ring.mean(axis=0)
        return (
            build_curved_roof(
                ring, center,
                min_height=ctx["height"] - ctx["roof_height"],
                roof_height=ctx["roof_height"], texture_id=ctx["roof_tex"],
                profile=profile,
            ),
            None,
        )

    def _roof_dome(self, ctx):
        return self._curved(ctx, PROFILE_DOME)

    def _roof_onion(self, ctx):
        return self._curved(ctx, PROFILE_ONION)

    def _oriented(self, ctx, profile, respect_direction=False):
        out = build_oriented_profile_roof(
            ctx["outer_ring"],
            min_height=ctx["height"] - ctx["roof_height"],
            roof_height=ctx["roof_height"],
            texture_id=ctx["roof_tex"],
            profile=profile,
            orientation=ctx.get("roof_orientation"),
            direction_deg=ctx["roof_direction"],
            respect_direction=respect_direction,
        )
        if out is None:
            return None
        geom, hp_ring = out
        # expand the outer-ring height points to the full coord span
        hps = np.full(len(ctx["coords"]), np.nan)
        s = ctx["ring_starts"][0]
        hps[s : s + len(hp_ring)] = hp_ring
        return geom, hps

    def _roof_round(self, ctx):
        return self._oriented(ctx, PROFILE_ROUND)

    def _roof_gabled(self, ctx):
        # reference primary: skeleton-based gabled (3-vertex end faces
        # collapse to vertical gables); oriented profile as the fallback
        sk, off = self._skeleton_for(ctx)
        if sk:
            out = build_gabled_skeleton_roof(
                ctx["outer_ring"], sk,
                min_height=ctx["height"] - ctx["roof_height"],
                roof_height=ctx["roof_height"], texture_id=ctx["roof_tex"],
                skeleton_offset=off,
            )
            if out is not None:
                return out, None
        return self._oriented(ctx, PROFILE_GABLED)

    def _roof_saltbox(self, ctx):
        return self._oriented(ctx, PROFILE_SALTBOX, respect_direction=True)

    def _roof_gambrel(self, ctx):
        # reference: oriented variant when an orientation tag is present,
        # else the skeleton-split variant (gambrel-roof-builder.ts)
        if ctx.get("roof_orientation") in ("along", "across"):
            return self._oriented(ctx, PROFILE_GAMBREL)
        sk, off = self._skeleton_for(ctx)
        if sk:
            out = build_hipped_roof(
                ctx["outer_ring"], sk,
                min_height=ctx["height"] - ctx["roof_height"],
                roof_height=ctx["roof_height"], texture_id=ctx["roof_tex"],
                remap=gambrel_remap,
                skeleton_offset=off,
            )
            if out is not None:
                return out, None
        return self._oriented(ctx, PROFILE_GAMBREL)

    def _roof_mansard(self, ctx):
        return self._skeleton_remap_roof(ctx, mansard_remap)

    def _roof_quadruple_saltbox(self, ctx):
        return self._skeleton_remap_roof(ctx, quadruple_saltbox_remap)

    def _skeleton_remap_roof(self, ctx, remap):
        sk, off = self._skeleton_for(ctx)
        if not sk:
            return None
        out = build_hipped_roof(
            ctx["outer_ring"], sk,
            min_height=ctx["height"] - ctx["roof_height"],
            roof_height=ctx["roof_height"], texture_id=ctx["roof_tex"],
            remap=remap,
            skeleton_offset=off,
        )
        return None if out is None else (out, None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Dead-lettered rows (geom_valid=False → NaN bbox from the parser)
        # must never reach tile assignment: mercator_to_tile(NaN) casts to
        # int32 garbage and injects phantom cells into tile stats, seed
        # partitions and the tileset tree.  Drop them here — the parser
        # already surfaced them via the geom_valid flag (M1 dead-letter).
        gv = batch.column("geom_valid").to_numpy(zero_copy_only=False)
        bbox_ok = np.isfinite(
            batch.column("minx").to_numpy(zero_copy_only=False)
        ) & np.isfinite(batch.column("maxy").to_numpy(zero_copy_only=False))
        keep = gv & bbox_ok
        if not keep.all():
            batch = batch.filter(pa.array(keep))
        n = len(batch)
        params = normalize_params(batch)

        minx = batch.column("minx").to_numpy(zero_copy_only=False)
        miny = batch.column("miny").to_numpy(zero_copy_only=False)
        maxx = batch.column("maxx").to_numpy(zero_copy_only=False)
        maxy = batch.column("maxy").to_numpy(zero_copy_only=False)
        tx, ty = mercator_to_tile(minx, maxy)  # deterministic winner tile
        cx, cy = tile_center(tx, ty)
        cells = cell_id_of(tx, ty)

        def list_col(name):
            col = batch.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return np.asarray(col.values), np.asarray(col.offsets).astype(np.int64)

        flat_coords_xy, coord_offs = list_col("coords")
        flat_ring_starts, ring_offs = list_col("ring_offsets")
        flat_roles, _ = list_col("ring_roles")
        coords = flat_coords_xy.reshape(-1, 2).copy()
        vert_offs = coord_offs // 2  # per-row vertex start
        verts_per_row = np.diff(vert_offs)
        rings_per_row = np.diff(ring_offs)

        # ---- M3: tile-frame offset, whole batch ------------------------
        coords[:, 0] -= np.repeat(cx, verts_per_row)
        coords[:, 1] -= np.repeat(cy, verts_per_row)

        # ---- global per-ring vertex offsets -----------------------------
        row_of_ring = np.repeat(np.arange(n), rings_per_row)
        g_ring_starts = flat_ring_starts + vert_offs[row_of_ring]
        total_verts = len(coords)
        g_ring_ends = np.empty_like(g_ring_starts)
        g_ring_ends[:-1] = g_ring_starts[1:]
        if len(g_ring_ends):
            g_ring_ends[-1] = total_verts
        # rows' last ring ends at the row's vertex end
        last_ring_of_row = np.cumsum(rings_per_row) - 1
        valid_rows = rings_per_row > 0
        g_ring_ends[last_ring_of_row[valid_rows]] = vert_offs[1:][valid_rows]
        ring_nverts = g_ring_ends - g_ring_starts

        # ---- M4: winding normalization, whole batch ---------------------
        areas = _ring_areas(coords, g_ring_starts, g_ring_ends)
        is_cw = areas > 0
        want_cw = flat_roles == 0
        flip = is_cw != want_cw
        if flip.any():
            intra = np.arange(total_verts) - np.repeat(g_ring_starts, ring_nverts)
            flip_v = np.repeat(flip, ring_nverts)
            nv = np.repeat(ring_nverts, ring_nverts)
            base = np.repeat(g_ring_starts, ring_nverts)
            gather = np.where(flip_v, base + nv - 1 - intra, base + intra)
            coords = coords[gather]

        heights = params.column("building_height").to_numpy(zero_copy_only=False)
        min_heights = params.column("building_min_height").to_numpy(zero_copy_only=False)
        roof_heights = params.column("building_roof_height").to_numpy(zero_copy_only=False)
        levels = params.column("building_levels").to_numpy(zero_copy_only=False)
        roof_types = params.column("roof_type").to_numpy(zero_copy_only=False)
        roof_dirs = params.column("roof_direction").to_numpy(zero_copy_only=False)
        roof_orients = params.column("roof_orientation").to_numpy(zero_copy_only=False)
        roof_mats = params.column("roof_material").to_numpy(zero_copy_only=False)
        fac_mats = params.column("facade_material").to_numpy(zero_copy_only=False)
        windows = params.column("windows").to_numpy(zero_copy_only=False)
        skeletons = batch.column("skeleton").to_numpy(zero_copy_only=False)
        geom_valid = batch.column("geom_valid").to_numpy(zero_copy_only=False)

        # ---- roofs ------------------------------------------------------
        # flat roofs (the default + every fallback) are assembled for the
        # WHOLE batch in one numpy pass; convex hole-free footprints skip
        # earcut via a fan triangulation (valid for convex polygons); only
        # hipped/pyramidal/skillion and concave/holed flats loop per row.
        roof_geoms: list[dict | None] = [None] * n
        roof_used = np.empty(n, dtype=object)
        roof_counts = np.zeros(n, dtype=np.int64)
        height_points_flat: np.ndarray | None = None

        # convexity per ring (vectorized): all cross products one sign
        convex = np.ones(len(g_ring_starts), dtype=bool)
        if total_verts:
            x = coords[:, 0]
            y = coords[:, 1]
            # cross product at each vertex of the OPEN ring with wraparound
            base_r = np.repeat(g_ring_starts, np.maximum(ring_nverts - 1, 0))
            intra_r = np.arange(len(base_r)) - np.repeat(
                np.concatenate([[0], np.cumsum(np.maximum(ring_nverts - 1, 0))[:-1]]),
                np.maximum(ring_nverts - 1, 0),
            )
            nv_r = np.repeat(np.maximum(ring_nverts - 1, 0), np.maximum(ring_nverts - 1, 0))
            i0 = base_r + intra_r
            i1 = base_r + (intra_r + 1) % nv_r
            i2 = base_r + (intra_r + 2) % nv_r
            cr = (x[i1] - x[i0]) * (y[i2] - y[i1]) - (y[i1] - y[i0]) * (x[i2] - x[i1])
            ring_of_v = np.repeat(
                np.arange(len(g_ring_starts)), np.maximum(ring_nverts - 1, 0)
            )
            pos_any = np.zeros(len(g_ring_starts), dtype=bool)
            neg_any = np.zeros(len(g_ring_starts), dtype=bool)
            np.logical_or.at(pos_any, ring_of_v, cr > 1e-12)
            np.logical_or.at(neg_any, ring_of_v, cr < -1e-12)
            convex = ~(pos_any & neg_any)

        first_ring_of_row = ring_offs[:-1]
        flat_tri_chunks: list[np.ndarray] = []
        flat_tri_counts = np.zeros(n, dtype=np.int64)
        # footprint triangulation per row (for flat roofs, the G16 underside
        # cap when the building floats, and the G17 terrain mask otherwise)
        foot_tri_chunks: list[np.ndarray] = []
        foot_tri_counts = np.zeros(n, dtype=np.int64)
        flat_z = np.empty(n)

        # convex single-ring fans for the WHOLE batch in one ragged pass
        # (the common case — most footprints are simple convex quads);
        # values identical to the per-row np.stack fan it replaces, only
        # the loop fetches a precomputed slice instead of rebuilding it
        fan_rows = np.zeros(n, dtype=bool)
        k_row = np.zeros(n, dtype=np.int64)
        if n and len(ring_nverts):
            # clamp: a trailing zero-ring row's first-ring index equals the
            # ring count; it is masked out by rings_per_row > 0 below
            gr0 = np.minimum(first_ring_of_row, len(ring_nverts) - 1)
            k_row = np.where(
                rings_per_row > 0, ring_nverts[gr0] - 1, 0
            )
            fan_rows = (rings_per_row == 1) & convex[gr0] & (k_row >= 3)
        fan_counts = np.where(fan_rows, np.maximum(k_row - 2, 0), 0)
        fan_offs = np.concatenate([[0], np.cumsum(fan_counts)])
        if fan_counts.sum():
            owner = np.repeat(np.arange(n), fan_counts)
            j = (
                np.arange(int(fan_counts.sum()), dtype=np.int64)
                - np.repeat(fan_offs[:-1], fan_counts)
                + 1
            )
            s_rep = g_ring_starts[gr0][owner]
            fan_all = np.stack([s_rep, s_rep + j, s_rep + j + 1], axis=1)
        else:
            fan_all = np.empty((0, 3), dtype=np.int64)

        def footprint_tris(i: int) -> np.ndarray:
            if fan_rows[i]:
                return fan_all[fan_offs[i] : fan_offs[i + 1]]
            r0, r1 = ring_offs[i], ring_offs[i + 1]
            local_starts = flat_ring_starts[r0:r1].astype(np.int64)
            c0, c1 = vert_offs[i], vert_offs[i + 1]
            tris = triangulate_multipolygon(
                coords[c0:c1], local_starts, flat_roles[r0:r1]
            )
            return tris + c0

        for i in range(n):
            if not geom_valid[i] or rings_per_row[i] == 0:
                roof_used[i] = "invalid"
                continue
            ftris = footprint_tris(i)
            foot_tri_chunks.append(ftris)
            foot_tri_counts[i] = len(ftris)
            rt = roof_types[i]
            builder = self.roof_registry.get(rt)
            use_flat = builder is None or builder == self._roof_flat
            result = None
            if not use_flat:
                r0, r1 = ring_offs[i], ring_offs[i + 1]
                local_starts = flat_ring_starts[r0:r1].astype(np.int64)
                c0, c1 = vert_offs[i], vert_offs[i + 1]
                bcoords = coords[c0:c1]
                ends = np.concatenate([local_starts[1:], [len(bcoords)]])
                ctx = {
                    "coords": bcoords,
                    "ring_starts": local_starts,
                    "ring_roles": flat_roles[r0:r1],
                    "outer_ring": bcoords[local_starts[0] : ends[0]],
                    "height": heights[i],
                    "roof_height": roof_heights[i],
                    "roof_direction": None if np.isnan(roof_dirs[i]) else roof_dirs[i],
                    "roof_orientation": roof_orients[i],
                    "roof_tex": ROOF_TEXTURE.get(roof_mats[i], 13),
                    "skeleton": skeletons[i],
                    "tile_center": (float(cx[i]), float(cy[i])),
                }
                result = builder(ctx)
                if result is not None:
                    geom, hps = result
                    roof_used[i] = rt
                    roof_counts[i] = len(geom["position"])
                    roof_geoms[i] = geom
                    if hps is not None:
                        if height_points_flat is None:
                            height_points_flat = np.full(total_verts, np.nan)
                        height_points_flat[c0:c1] = hps
                    continue
            # flat roof path (either chosen or fallback — reference semantics)
            roof_used[i] = "flat"
            if self.flat_uv_clip:
                r0, r1 = ring_offs[i], ring_offs[i + 1]
                c0, c1 = vert_offs[i], vert_offs[i + 1]
                tid = ROOF_TEXTURE.get(roof_mats[i], 13)
                geom = build_flat_roof_clipped(
                    coords[c0:c1],
                    flat_ring_starts[r0:r1].astype(np.int64),
                    flat_roles[r0:r1],
                    z=heights[i],
                    texture_id=tid,
                    scale_xy=ROOF_TEXTURE_SCALE.get(tid, (10.0, 10.0)),
                )
                if geom is not None:
                    roof_counts[i] = len(geom["position"])
                    roof_geoms[i] = geom
                    continue
            flat_tri_chunks.append(ftris)
            flat_tri_counts[i] = len(ftris)
            flat_z[i] = heights[i]
            roof_counts[i] = len(ftris) * 3

        # assemble all flat roofs at once
        flat_roof_pos = np.empty((0, 3), np.float32)
        flat_roof_uv = np.empty((0, 2), np.float32)
        flat_roof_nrm = np.empty((0, 3), np.float32)
        flat_roof_tid = np.empty(0, np.uint8)
        flat_spans = np.concatenate([[0], np.cumsum(flat_tri_counts * 3)])
        if flat_tri_chunks:
            tri_idx = np.concatenate(flat_tri_chunks)
            pts2 = coords[tri_idx]  # (T, 3, 2)
            zs = np.repeat(flat_z, flat_tri_counts)
            # upward orientation (flat roofs face +z)
            crz = (pts2[:, 1, 0] - pts2[:, 0, 0]) * (pts2[:, 2, 1] - pts2[:, 0, 1]) - (
                pts2[:, 1, 1] - pts2[:, 0, 1]
            ) * (pts2[:, 2, 0] - pts2[:, 0, 0])
            wrong = crz < 0
            pts2[wrong] = pts2[wrong][:, ::-1, :]
            tri_pts = np.concatenate(
                [pts2, np.broadcast_to(zs[:, None, None], (*pts2.shape[:2], 1))], axis=2
            )
            m = tri_pts.reshape(-1, 3)
            flat_roof_pos = m.astype(np.float32)
            if self.emit_buffers:  # stats mode needs only positions (bbox)
                flat_roof_uv = (m[:, :2] * 0.1).astype(np.float32)
                flat_roof_nrm = np.zeros((len(m), 3), np.float32)
                flat_roof_nrm[:, 2] = 1.0
                row_of_tri = np.repeat(np.arange(n), flat_tri_counts)
                tid_row = np.array(
                    [ROOF_TEXTURE.get(mt, 13) for mt in roof_mats], dtype=np.uint8
                )
                flat_roof_tid = np.repeat(tid_row[row_of_tri], 3)

        # ---- G16 underside cap (flipped flat at minHeight when the building
        # floats) / G17 terrain mask otherwise
        # (reference: building-builder.ts:345-383)
        cap_mask = geom_valid & (min_heights > 0) & (foot_tri_counts > 0)
        cap_counts = np.where(cap_mask, foot_tri_counts * 3, 0)
        cap_pos = np.empty((0, 3), np.float32)
        cap_uv = np.empty((0, 2), np.float32)
        cap_nrm = np.empty((0, 3), np.float32)
        cap_tid = np.empty(0, np.uint8)
        cap_spans = np.concatenate([[0], np.cumsum(cap_counts)])
        mask_counts = np.where(
            geom_valid & (min_heights <= 0), foot_tri_counts * 3, 0
        )
        mask_chunks: list[np.ndarray] = []
        if foot_tri_chunks:
            foot_tris_all = np.concatenate(foot_tri_chunks)
            row_of_foot = np.repeat(np.arange(n), foot_tri_counts)
            capped = cap_mask[row_of_foot]
            if capped.any():
                ctris = foot_tris_all[capped]
                cpts = coords[ctris][:, ::-1, :]  # flipped winding
                zs = np.repeat(min_heights, foot_tri_counts)[capped]
                crz = (cpts[:, 1, 0] - cpts[:, 0, 0]) * (cpts[:, 2, 1] - cpts[:, 0, 1]) - (
                    cpts[:, 1, 1] - cpts[:, 0, 1]
                ) * (cpts[:, 2, 0] - cpts[:, 0, 0])
                wrongc = crz > 0  # cap faces DOWN
                cpts[wrongc] = cpts[wrongc][:, ::-1, :]
                cm = np.concatenate(
                    [cpts, np.broadcast_to(zs[:, None, None], (*cpts.shape[:2], 1))],
                    axis=2,
                ).reshape(-1, 3)
                cap_pos = cm.astype(np.float32)
                if self.emit_buffers:  # stats mode needs only positions
                    cap_uv = (cm[:, :2] * 0.1).astype(np.float32)
                    cap_nrm = np.zeros((len(cm), 3), np.float32)
                    cap_nrm[:, 2] = -1.0
                    cap_tid = np.full(
                        len(cm), ROOF_TEXTURE["concrete"], dtype=np.uint8
                    )
            if self.emit_buffers:
                masked = (geom_valid & (min_heights <= 0))[row_of_foot]
                mpts = coords[foot_tris_all[masked]].reshape(-1, 2) / TILE_SIZE_Z16
                mask_flat = mpts.astype(np.float32).reshape(-1)
                mask_lens = (mask_counts * 2).astype(np.int64)
                mask_offsets = np.concatenate([[0], np.cumsum(mask_lens)])
            else:
                mask_flat = np.empty(0, np.float32)
                mask_offsets = np.zeros(n + 1, np.int64)
        else:
            mask_flat = np.empty(0, np.float32)
            mask_offsets = np.zeros(n + 1, np.int64)

        # ---- walls: one whole-batch call --------------------------------
        ring_valid = geom_valid[row_of_ring]
        # per-ring params (skip invalid rows by zeroing levels)
        r_levels = np.where(ring_valid, levels[row_of_ring], 0.0)
        r_minh = min_heights[row_of_ring]
        r_wallh = (heights - roof_heights)[row_of_ring]
        wall_tex = np.array(
            [FACADE_TEXTURE.get(m, 0) for m in fac_mats], dtype=np.int64
        )
        win_tex = np.where(windows, (wall_tex + FACADE_WINDOW_OFFSET) % 256, wall_tex)
        walls, wall_counts_per_ring = build_walls_batch(
            coords,
            np.concatenate([g_ring_starts, [total_verts]]),
            r_minh,
            r_wallh,
            r_levels,
            WINDOW_WIDTH,
            wall_tex[row_of_ring],
            win_tex[row_of_ring],
            height_points=height_points_flat,
            emit_attrs=self.emit_buffers,
        )
        wall_counts = np.zeros(n, dtype=np.int64)
        np.add.at(wall_counts, row_of_ring, wall_counts_per_ring)

        # ---- assemble per-building [roof, walls...] order ---------------
        row_wall_start = np.concatenate([[0], np.cumsum(wall_counts)])

        bboxes = np.full((n, 6), np.nan)
        out_rows = {
            "osm_id": batch.column("osm_id"),
            "cell_id": pa.array(cells, type=pa.uint64()),
            "tile_x": pa.array(tx),
            "tile_y": pa.array(ty),
            "roof_type_used": pa.array(roof_used, type=pa.string()),
            "wall_vertices": pa.array(wall_counts),
            "roof_vertices": pa.array(roof_counts),
            "cap_vertices": pa.array(cap_counts),
            "vertex_count": pa.array(wall_counts + roof_counts + cap_counts),
        }

        emit = self.emit_buffers
        pieces_pos: list[np.ndarray] = []
        pieces_uv: list[np.ndarray] = []
        pieces_nrm: list[np.ndarray] = []
        pieces_tid: list[np.ndarray] = []
        for i in range(n):
            rg = roof_geoms[i]
            w0, w1 = row_wall_start[i], row_wall_start[i + 1]
            if rg is not None and len(rg["position"]):
                pieces_pos.append(rg["position"])
                if emit:
                    pieces_uv.append(rg["uv"])
                    pieces_nrm.append(rg["normal"])
                    pieces_tid.append(rg["texture_id"])
            elif flat_spans[i + 1] > flat_spans[i]:
                f0, f1 = flat_spans[i], flat_spans[i + 1]
                pieces_pos.append(flat_roof_pos[f0:f1])
                if emit:
                    pieces_uv.append(flat_roof_uv[f0:f1])
                    pieces_nrm.append(flat_roof_nrm[f0:f1])
                    pieces_tid.append(flat_roof_tid[f0:f1])
            if w1 > w0:
                pieces_pos.append(walls["position"][w0:w1])
                if emit:
                    pieces_uv.append(walls["uv"][w0:w1])
                    pieces_nrm.append(walls["normal"][w0:w1])
                    pieces_tid.append(walls["texture_id"][w0:w1])
            if cap_spans[i + 1] > cap_spans[i]:
                k0, k1 = cap_spans[i], cap_spans[i + 1]
                pieces_pos.append(cap_pos[k0:k1])
                if emit:
                    pieces_uv.append(cap_uv[k0:k1])
                    pieces_nrm.append(cap_nrm[k0:k1])
                    pieces_tid.append(cap_tid[k0:k1])
        flat_pos = (
            np.concatenate(pieces_pos) if pieces_pos else np.empty((0, 3), np.float32)
        )
        counts_total = wall_counts + roof_counts + cap_counts
        # per-building bbox from the assembled flat positions
        bstarts = np.concatenate([[0], np.cumsum(counts_total)])
        nonempty = counts_total > 0
        if nonempty.any():
            s = bstarts[:-1][nonempty]
            e = bstarts[1:][nonempty]
            for j in range(3):
                colv = flat_pos[:, j].astype(np.float64)
                bboxes[nonempty, j] = _seg_min(colv, s, e)
                bboxes[nonempty, 3 + j] = _seg_max(colv, s, e)
        for j, name in enumerate(["min_x", "min_y", "min_z", "max_x", "max_y", "max_z"]):
            out_rows[name] = pa.array(bboxes[:, j])

        if self.emit_buffers:
            offs64 = bstarts
            out_rows["position"] = _wrap_list(flat_pos.reshape(-1), offs64 * 3, pa.float32())
            flat_uv = (
                np.concatenate(pieces_uv) if pieces_uv else np.empty((0, 2), np.float32)
            )
            flat_tid_arr = (
                np.concatenate(pieces_tid) if pieces_tid else np.empty(0, np.uint8)
            )
            # J3: tile-local UVs → atlas UVs via the per-actor frame table
            flat_uv = apply_atlas_uv(flat_uv.astype(np.float64), flat_tid_arr, self.uv_table).astype(
                np.float32
            )
            out_rows["uv"] = _wrap_list(flat_uv.reshape(-1), offs64 * 2, pa.float32())
            out_rows["normal"] = _wrap_list(
                (np.concatenate(pieces_nrm) if pieces_nrm else np.empty((0, 3), np.float32)).reshape(-1),
                offs64 * 3,
                pa.float32(),
            )
            out_rows["texture_id"] = _wrap_list(flat_tid_arr, offs64, pa.uint8())
            # G17 terrain mask: footprint XY pairs scaled by 1/tileSize for
            # ground-level buildings (tile3d-features-to-buffers-converter.ts:454-469)
            out_rows["terrain_mask"] = _wrap_list(mask_flat, mask_offsets, pa.float32())
        return pa.table(out_rows)


class Build3DStats(Build3D):
    """Stats-only variant (no buffer materialization) — separate class so the
    actor pool needs no constructor arguments (clean restarts)."""

    def __init__(self, flat_uv_clip: bool = False):
        super().__init__(emit_buffers=False, flat_uv_clip=flat_uv_clip)


class Build3DCompact(Build3D):
    """Build3D fused with the compact quantizer INSIDE the actor: emits
    11 B/vertex quantized building records directly, so the 35 B/vertex
    float soup never materializes in the object store between the actor
    pool and the (unfusable) downstream task pool — at sf0.1 that is
    ~1.3 GB written+read per run; at 100 TB it is the difference between
    shuffling the corpus once and 3×.  Byte-identical to
    ``compact_before_shuffle(Build3D()(batch))`` by construction (same
    composition, same batch boundaries)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .accumulate import compact_before_shuffle

        return compact_before_shuffle(super().__call__(batch))


def _ring_areas(coords: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Signed areas for rings given [start, end) windows (reference formula)."""
    x = coords[:, 0]
    y = coords[:, 1]
    nxt = np.arange(1, len(coords) + 1)
    nxt[ends - 1] = starts
    cross = (x[nxt] - x) * (y[nxt] + y)
    csum = np.concatenate([[0.0], np.cumsum(cross)])
    return (csum[ends] - csum[starts]) / 2.0


def _seg_min(arr: np.ndarray, s: np.ndarray, e: np.ndarray) -> np.ndarray:
    idx = np.empty(2 * len(s), dtype=np.int64)
    idx[0::2] = s
    idx[1::2] = e
    if idx[-1] >= len(arr):
        idx[-1] = len(arr) - 1
        res = np.minimum.reduceat(arr, idx)[0::2]
        res[-1] = arr[s[-1] : e[-1]].min()
        return res
    return np.minimum.reduceat(arr, idx)[0::2]


def _seg_max(arr: np.ndarray, s: np.ndarray, e: np.ndarray) -> np.ndarray:
    idx = np.empty(2 * len(s), dtype=np.int64)
    idx[0::2] = s
    idx[1::2] = e
    if idx[-1] >= len(arr):
        idx[-1] = len(arr) - 1
        res = np.maximum.reduceat(arr, idx)[0::2]
        res[-1] = arr[s[-1] : e[-1]].max()
        return res
    return np.maximum.reduceat(arr, idx)[0::2]


def _wrap_list(flat: np.ndarray, offsets: np.ndarray, typ) -> pa.LargeListArray:
    return pa.LargeListArray.from_arrays(
        pa.array(offsets.astype(np.int64), type=pa.int64()),
        pa.array(flat, type=typ),
    )
