"""Geo pipelines over the synthetic spans corpus — the `queries()` surface.

Each function takes ``sf_dir`` (a ``/root/testdata/sfX`` path — only the
scale factor is read from it; the geo corpus itself is the deterministic
synthetic one mandated by FIXTURES.md, materialized under /tmp) and returns
a Dataset whose result the driver compares against ``oracle_sql()``.

Scale notes (100 TB thinking):
* documents are read as a multi-file parquet dataset → parallel blocks;
* the DEM grid and the query-point matrix are broadcast once as actor
  constructor args (stored in the object store, shared by every pool
  actor — no per-batch reshipping, no shuffle join for the small side);
* kNN = per-batch vectorized top-k (numpy argpartition) + a single small
  ``groupby(qid)`` refine — candidate generation is embarrassingly
  parallel, the shuffle moves only ``n_queries × k`` rows per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..constants import TILE_SIZE_Z16, WORLD_HALF, tile_size
from ..geom.polylabel import pole_of_inaccessibility
from ..geom.raster import polygon_cell_cover, sample_points_in_polygon
from ..geom.rings import point_in_ring
from ..geom.rng import keyed_uniform
from ..geom.transforms import mercator_to_lonlat, mercator_to_tile
from ..stages.assign import ownership_assignments, tile_stats
from ..stages.normalize import normalize_params
from ..stages.parse import parse_documents
from ..synth.generator import ensure_synth, sf_from_dir


def _pool(cap: int = 16) -> int:
    """Fixed actor-pool size: min(cap, cluster CPUs - 1) — autoscaling pools
    can collapse to one actor; full-width pools starve the read tasks."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(1, min(cap, cpus - 1))

_PARSE_COLUMNS = [
    "doc_id", "osm_id", "osm_type", "n_rings", "n_vertices", "height",
    "levels", "roof_type", "name", "minx", "miny", "maxx", "maxy",
    "centroid_x", "centroid_y",
]


def documents_ds(sf_dir: str) -> "ray.data.Dataset":
    root = ensure_synth(sf_from_dir(sf_dir))
    return ray.data.read_parquet(str(root / "documents"))


def parsed_ds(sf_dir: str, keep_spans: bool = False) -> "ray.data.Dataset":
    import functools

    return documents_ds(sf_dir).map_batches(
        functools.partial(parse_documents, keep_spans=keep_spans),
        batch_format="pyarrow",
    )


def q_parse(sf_dir: str) -> "ray.data.Dataset":
    """Span decode: flat building attributes recovered from spans (S2/M1..M7)."""
    return parsed_ds(sf_dir).select_columns(_PARSE_COLUMNS)


def q_assignments(sf_dir: str) -> "ray.data.Dataset":
    """Ownership dedup (J1): one (osm_id → tile) row per building."""
    ds = parsed_ds(sf_dir).select_columns(["osm_id", "minx", "miny", "maxx", "maxy"])
    return ownership_assignments(ds).drop_columns(["cell_id"])



def tile_counts_ds(sf_dir: str) -> "ray.data.Dataset":
    """The A1 per-tile counts (``tile_stats(ownership_assignments(...))``)
    through a corpus-keyed parquet checkpoint (``state/checkpoint.py``):
    seven registered queries (tile_stats, smooth, local_moran, pagerank,
    skew_audit, bfs, zoom_rollup) fold this same ~occupied-tiles relation
    before diverging — in a sweep the parse + ownership exchange now runs
    once per corpus state instead of once per consumer.  Results are
    byte-stable through the parquet roundtrip (integer columns only)."""
    from ..state.checkpoint import corpus_key, parquet_checkpoint

    root = ensure_synth(sf_from_dir(sf_dir))

    def build() -> "ray.data.Dataset":
        ds = parsed_ds(sf_dir).select_columns(
            ["osm_id", "minx", "miny", "maxx", "maxy"]
        )
        return tile_stats(ownership_assignments(ds))

    return parquet_checkpoint(
        "geo_tile_counts", corpus_key([str(root / "documents")]), build
    )

def q_tile_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-tile batch_length (A1)."""
    return tile_counts_ds(sf_dir).drop_columns(["cell_id", "tile_z"])


def q_norm_params(sf_dir: str) -> "ray.data.Dataset":
    """Param normalization truth table (M8/M9/M10/M11)."""
    return parsed_ds(sf_dir).map_batches(normalize_params, batch_format="pyarrow").drop_columns(
        ["doc_id", "label"]
    )


def q_cell_cover(sf_dir: str) -> "ray.data.Dataset":
    """H3/S2-style cell covering count per footprint (bbox rectangle cover)."""

    def cover(batch: pa.Table) -> pa.Table:
        minx = batch.column("minx").to_numpy(zero_copy_only=False)
        miny = batch.column("miny").to_numpy(zero_copy_only=False)
        maxx = batch.column("maxx").to_numpy(zero_copy_only=False)
        maxy = batch.column("maxy").to_numpy(zero_copy_only=False)
        tx0, ty0 = mercator_to_tile(minx, maxy)
        tx1, ty1 = mercator_to_tile(maxx, miny)
        n_cells = ((tx1 - tx0 + 1).astype(np.int64)) * ((ty1 - ty0 + 1).astype(np.int64))
        return pa.table({"osm_id": batch.column("osm_id"), "n_cells": pa.array(n_cells)})

    return parsed_ds(sf_dir).select_columns(
        ["osm_id", "minx", "miny", "maxx", "maxy"]
    ).map_batches(cover, batch_format="pyarrow")


def q_zoom_rollup(sf_dir: str, z_top: int = 10) -> "ray.data.Dataset":
    """Multi-resolution tile pyramid: per-tile building counts at every
    zoom from the leaf grid (z16) up to ``z_top`` — the quadtree roll-up
    the tileset tree summarizes implicitly (each z-1 parent is the >>1 of
    its four children; reference walks the same parent chain when nesting
    tileset nodes, ``/root/reference/generate-tileset.ts``).

    Shape: one pass emits per-batch partial counts for ALL zoom levels at
    once (7 packed (z, x>>s, y>>s) unique/count rows per distinct leaf
    cell per batch — wire volume ≈ 7× the distinct-leaf count, never 7×
    the building count), then ONE groupby sums partials.  No per-level
    passes, no driver-side pyramid.
    Output: (tile_z, tile_x, tile_y, n_buildings)."""
    ds = parsed_ds(sf_dir).select_columns(["osm_id", "minx", "miny", "maxx", "maxy"])
    assigned = ownership_assignments(ds)
    n_levels = 16 - z_top + 1

    def partial(batch: pa.Table) -> pa.Table:
        tx = batch.column("tile_x").to_numpy(zero_copy_only=False).astype(np.int64)
        ty = batch.column("tile_y").to_numpy(zero_copy_only=False).astype(np.int64)
        zs = np.arange(16, z_top - 1, -1, dtype=np.int64)
        shift = (16 - zs)[:, None]
        px = (tx[None, :] >> shift).ravel()
        py = (ty[None, :] >> shift).ravel()
        pz = np.repeat(zs, len(tx))
        key = (pz << np.int64(42)) | (px << np.int64(21)) | py
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "zkey": pa.array(uniq),
                "p_n": pa.array(cnt.astype(np.int64)),
            }
        )

    from .partition import sum_by_key

    summed = sum_by_key(
        assigned.map_batches(partial, batch_format="pyarrow"),
        ["zkey"],
        {"p_n": "n_buildings"},
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = batch.column("zkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "tile_z": pa.array((key >> 42).astype(np.int32)),
                "tile_x": pa.array(((key >> 21) & ((1 << 21) - 1)).astype(np.int32)),
                "tile_y": pa.array((key & ((1 << 21) - 1)).astype(np.int32)),
                "n_buildings": pc.cast(batch.column("n_buildings"), pa.int64()),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")


def q_batch_table(sf_dir: str) -> "ray.data.Dataset":
    """b3dm batch-table projection (M14/M15): osm_url + boxCenter lon/lat
    (reference: ``src/b3dmGenerator.ts:223-247`` — feature midpoint
    3857→4326 + openstreetmap.org URL)."""

    def project(batch: pa.Table) -> pa.Table:
        osm_id = batch.column("osm_id").to_numpy(zero_copy_only=False)
        osm_type = batch.column("osm_type").to_numpy(zero_copy_only=False)
        minx = batch.column("minx").to_numpy(zero_copy_only=False)
        miny = batch.column("miny").to_numpy(zero_copy_only=False)
        maxx = batch.column("maxx").to_numpy(zero_copy_only=False)
        maxy = batch.column("maxy").to_numpy(zero_copy_only=False)
        lon, lat = mercator_to_lonlat((minx + maxx) / 2.0, (miny + maxy) / 2.0)
        urls = np.char.add(
            np.char.add("https://www.openstreetmap.org/", osm_type.astype(str)),
            np.char.add("/", osm_id.astype(str)),
        )
        # integer micro-degrees with floor(x+0.5): same rounding RULE as the SQL
        # oracle, and coarse enough that DuckDB-vs-numpy libm ulp differences
        # (~3e-14 deg) cannot flip the floor
        return pa.table(
            {
                "osm_id": batch.column("osm_id"),
                "osm_url": pa.array(urls.astype(object), type=pa.string()),
                "box_center_lon_micro": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
                "box_center_lat_micro": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64)),
            }
        )

    return parsed_ds(sf_dir).select_columns(
        ["osm_id", "osm_type", "minx", "miny", "maxx", "maxy"]
    ).map_batches(project, batch_format="pyarrow")


def q_labels(sf_dir: str) -> "ray.data.Dataset":
    """Label features (G21): pole-of-inaccessibility anchor, height + 5,
    priority = interior distance (reference: ``src/building/builder.ts:174-185``)."""
    def labels(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        named = batch.filter(pc.is_valid(batch.column("name")))
        params = normalize_params(named)
        coords_col = named.column("coords")
        if isinstance(coords_col, pa.ChunkedArray):
            coords_col = coords_col.combine_chunks()
        ring_off = named.column("ring_offsets")
        if isinstance(ring_off, pa.ChunkedArray):
            ring_off = ring_off.combine_chunks()
        heights = params.column("building_height").to_numpy(zero_copy_only=False)
        nn = len(named)
        # whole-batch values/offsets slicing (same pattern as build3d) —
        # only the polylabel grid search itself runs per row
        flat_all = np.asarray(coords_col.values).reshape(-1, 2)
        voffs = np.asarray(coords_col.offsets).astype(np.int64) // 2
        rs_vals = np.asarray(ring_off.values).astype(np.int64)
        rs_offs = np.asarray(ring_off.offsets).astype(np.int64)
        xs = np.empty(nn)
        ys = np.empty(nn)
        ds_ = np.empty(nn)
        for i in range(nn):
            flat = flat_all[voffs[i] : voffs[i + 1]]
            starts = rs_vals[rs_offs[i] : rs_offs[i + 1]]
            ends = np.concatenate([starts[1:], [len(flat)]])
            rings = [flat[s:e] for s, e in zip(starts, ends)]
            xs[i], ys[i], ds_[i] = pole_of_inaccessibility(rings, precision=0.5)
        return pa.table(
            {
                "osm_id": named.column("osm_id"),
                "label": named.column("name"),
                "x": pa.array(xs),
                "y": pa.array(ys),
                "z": pa.array(heights + 5.0),
                "priority": pa.array(ds_),
            }
        )

    return parsed_ds(sf_dir).map_batches(labels, batch_format="pyarrow", batch_size=2048)


def q_lod_sample(sf_dir: str) -> "ray.data.Dataset":
    """Grid-stratified LOD downsample (A4): keep a deterministic fraction per
    12×12 sub-cell of each z16 tile, ≥1 per occupied sub-cell (reference:
    ``src/building/tile3d-features-to-buffers-converter.ts:520-558`` with the
    engine's keyed RNG replacing Math.random — partition-invariant)."""
    FRACTION = 0.25
    GRID = 12

    def keyed(batch: pa.Table) -> pa.Table:
        osm_id = batch.column("osm_id").to_numpy(zero_copy_only=False)
        cx = batch.column("centroid_x").to_numpy(zero_copy_only=False)
        cy = batch.column("centroid_y").to_numpy(zero_copy_only=False)
        fx = ((cx + WORLD_HALF) / TILE_SIZE_Z16) % 1.0
        fy = ((WORLD_HALF - cy) / TILE_SIZE_Z16) % 1.0
        gx = np.minimum((fx * GRID).astype(np.int64), GRID - 1)
        gy = np.minimum((fy * GRID).astype(np.int64), GRID - 1)
        tx, ty = mercator_to_tile(cx, cy)
        subcell = (
            tx.astype(np.int64) * np.int64(1 << 20) + ty.astype(np.int64)
        ) * (GRID * GRID) + gx * GRID + gy
        u = keyed_uniform(osm_id.astype(np.uint64), 77)
        return pa.table(
            {
                "osm_id": pa.array(osm_id),
                "subcell": pa.array(subcell),
                "u": pa.array(u),
            }
        )

    def keep_part(part: pa.Table) -> pa.Table:
        # fraction keep + always the min-(u, osm_id) row per sub-cell (≥1
        # survivor), purely a function of (osm_id, subcell) —
        # partition-invariant.  One vectorized pass over the whole hash
        # partition (most sub-cells hold 1-3 buildings, so per-group
        # dispatch would be ~rows/2 dispatches — the CLAUDE.md-forbidden
        # shape): sort by (subcell, u, osm), the run start of each subcell
        # run IS its min-u row.
        if len(part) == 0:
            return pa.table(
                {
                    "osm_id": pa.array([], type=pa.int64()),
                    "subcell": pa.array([], type=pa.int64()),
                }
            )
        sub = part.column("subcell").to_numpy(zero_copy_only=False)
        u = part.column("u").to_numpy(zero_copy_only=False)
        osm = part.column("osm_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((osm, u, sub))
        sub, u, osm = sub[order], u[order], osm[order]
        keep = (u < FRACTION) | run_starts(sub)
        return pa.table(
            {"osm_id": pa.array(osm[keep]), "subcell": pa.array(sub[keep])}
        )

    from .partition import map_key_partitions, run_starts

    return map_key_partitions(
        parsed_ds(sf_dir)
        .select_columns(["osm_id", "centroid_x", "centroid_y"])
        .map_batches(keyed, batch_format="pyarrow"),
        ["subcell"],
        keep_part,
    )


def q_cell_cover_exact(sf_dir: str) -> "ray.data.Dataset":
    """Exact polygon cell cover via DDA rasterization (G18) at a fine grid:
    covered 64-m cell count per footprint (rows-only check; the bbox-cover
    variant q_cell_cover carries the SQL oracle)."""
    CELL = 64.0

    def cover(batch: pa.Table) -> pa.Table:
        coords_col = batch.column("coords")
        if isinstance(coords_col, pa.ChunkedArray):
            coords_col = coords_col.combine_chunks()
        ring_off = batch.column("ring_offsets")
        if isinstance(ring_off, pa.ChunkedArray):
            ring_off = ring_off.combine_chunks()
        roles_col = batch.column("ring_roles")
        if isinstance(roles_col, pa.ChunkedArray):
            roles_col = roles_col.combine_chunks()
        n = len(batch)
        counts = np.zeros(n, dtype=np.int64)
        flat_all = np.asarray(coords_col.values).reshape(-1, 2)
        voffs = np.asarray(coords_col.offsets).astype(np.int64) // 2
        rs_vals = np.asarray(ring_off.values).astype(np.int64)
        rs_offs = np.asarray(ring_off.offsets).astype(np.int64)
        roles_all = np.asarray(roles_col.values, dtype=np.int8)
        for i in range(n):
            flat = flat_all[voffs[i] : voffs[i + 1]]
            starts = rs_vals[rs_offs[i] : rs_offs[i + 1]]
            roles = roles_all[rs_offs[i] : rs_offs[i + 1]]
            cells = polygon_cell_cover(
                flat, starts, roles, (-WORLD_HALF, -WORLD_HALF), CELL
            )
            counts[i] = len(cells)
        return pa.table({"osm_id": batch.column("osm_id"), "n_cells_exact": pa.array(counts)})

    return parsed_ds(sf_dir).map_batches(cover, batch_format="pyarrow", batch_size=2048)


def q_sample_points(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic interior point sampling (G19 — "populate points"):
    jittered-grid points inside each footprint, seeded per building via the
    keyed RNG (partition-invariant).  Output: (osm_id, n_points)."""
    SPACING = 6.0

    def sample(batch: pa.Table) -> pa.Table:
        coords_col = batch.column("coords")
        if isinstance(coords_col, pa.ChunkedArray):
            coords_col = coords_col.combine_chunks()
        ring_off = batch.column("ring_offsets")
        if isinstance(ring_off, pa.ChunkedArray):
            ring_off = ring_off.combine_chunks()
        osm = batch.column("osm_id").to_numpy(zero_copy_only=False)
        n = len(batch)
        counts = np.zeros(n, dtype=np.int64)
        flat_all = np.asarray(coords_col.values).reshape(-1, 2)
        voffs = np.asarray(coords_col.offsets).astype(np.int64) // 2
        rs_vals = np.asarray(ring_off.values).astype(np.int64)
        rs_offs = np.asarray(ring_off.offsets).astype(np.int64)
        for i in range(n):
            flat = flat_all[voffs[i] : voffs[i + 1]]
            starts = rs_vals[rs_offs[i] : rs_offs[i + 1]]
            ends = np.concatenate([starts[1:], [len(flat)]])
            rings = [flat[s:e] for s, e in zip(starts, ends)]
            pts = sample_points_in_polygon(
                int(osm[i]), rings[0], rings[1:], spacing=SPACING
            )
            counts[i] = len(pts)
        return pa.table({"osm_id": batch.column("osm_id"), "n_points": pa.array(counts)})

    return parsed_ds(sf_dir).map_batches(sample, batch_format="pyarrow", batch_size=4096)


# ---------------------------------------------------------------------------
# kNN nearest-building (J4 companion operator)


class _KnnPartial:
    """Actor-pool stage: per-batch exact top-k against the query matrix.

    The arrays arrive as actor-constructor arguments — Ray stores them in
    the object store ONCE and every actor in the pool reads the same copy
    (broadcast, not per-batch reshipping).

    The distance matrix is computed in QUERY CHUNKS into buffers that the
    actor preallocates once and reuses (``out=`` kernels).  A full
    ``(n_q, batch)`` float64 matrix ×3 is hundreds of MB of FRESH pages
    per call; on an overcommitted host, concurrent first-touch page
    faults across the pool serialize and dominate wall time (measured
    ~15× the arithmetic cost, 58 s/task vs <1 s).  Chunk + reuse keeps
    the working set in cache and pays the fault cost once per actor."""

    Q_CHUNK = 256

    def __init__(self, qid, qx, qy, k):
        self.qx = qx
        self.qy = qy
        self.qid = qid
        self.k = int(k)
        self._dx = None  # (Q_CHUNK, max_batch) work buffers, lazily sized
        self._dy = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        cx = batch.column("centroid_x").to_numpy(zero_copy_only=False)
        cy = batch.column("centroid_y").to_numpy(zero_copy_only=False)
        osm = batch.column("osm_id").to_numpy(zero_copy_only=False)
        n_b = len(cx)
        if n_b == 0:
            return pa.table(
                {
                    "qid": pa.array([], type=pa.int64()),
                    "osm_id": pa.array([], type=pa.int64()),
                    "dist": pa.array([], type=pa.float64()),
                }
            )
        n_q = len(self.qx)
        k = min(self.k, n_b)
        if self._dx is None or self._dx.shape[1] < n_b:
            self._dx = np.empty((self.Q_CHUNK, n_b))
            self._dy = np.empty((self.Q_CHUNK, n_b))
        out_idx = np.empty((n_q, k), dtype=np.int64)
        out_d2 = np.empty((n_q, k))
        for s in range(0, n_q, self.Q_CHUNK):
            e = min(s + self.Q_CHUNK, n_q)
            m = e - s
            dx = self._dx[:m, :n_b]
            dy = self._dy[:m, :n_b]
            np.subtract(self.qx[s:e, None], cx[None, :], out=dx)
            np.subtract(self.qy[s:e, None], cy[None, :], out=dy)
            np.multiply(dx, dx, out=dx)
            np.multiply(dy, dy, out=dy)
            np.add(dx, dy, out=dx)  # dx now holds d2
            part = np.argpartition(dx, k - 1, axis=1)[:, :k]
            out_idx[s:e] = part
            out_d2[s:e] = np.take_along_axis(dx, part, axis=1)
        rows = np.repeat(self.qid, k)
        return pa.table(
            {
                "qid": pa.array(rows),
                "osm_id": pa.array(osm[out_idx.reshape(-1)]),
                "dist": pa.array(np.sqrt(out_d2.reshape(-1))),
            }
        )


def q_knn(sf_dir: str) -> "ray.data.Dataset":
    """Exact kNN of buildings (centroids) for every query point: per-batch
    brute-force top-k (numpy) + groupby(qid) global refine."""
    import pyarrow.parquet as pq

    root = ensure_synth(sf_from_dir(sf_dir))
    qp = pq.read_table(root / "query_points.parquet")
    k = int(qp.column("k")[0].as_py())

    partials = parsed_ds(sf_dir).select_columns(
        ["osm_id", "centroid_x", "centroid_y"]
    ).map_batches(
        _KnnPartial,
        fn_constructor_args=(
            qp.column("qid").to_numpy(),
            qp.column("x").to_numpy(),
            qp.column("y").to_numpy(),
            k,
        ),
        batch_format="pyarrow",
        concurrency=_pool(),
        batch_size=8192,
    )

    def refine(group: pa.Table) -> pa.Table:
        dist = group.column("dist").to_numpy(zero_copy_only=False)
        osm = group.column("osm_id").to_numpy(zero_copy_only=False)
        qid = group.column("qid").to_numpy(zero_copy_only=False)
        order = np.lexsort((osm, dist))[:k]
        return pa.table(
            {
                "qid": pa.array(qid[order]),
                "osm_id": pa.array(osm[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32)),
            }
        )

    return partials.groupby("qid").map_groups(refine, batch_format="pyarrow")


class _PipJoin:
    """Actor-pool stage for the point↔building spatial join: broadcast query
    points, per-batch bbox prefilter + exact ray-cast PIP refine."""

    def __init__(self, qid, qx, qy, exact: bool):
        self.qid = qid
        self.qx = qx
        self.qy = qy
        self.exact = exact

    def __call__(self, batch: pa.Table) -> pa.Table:
        minx = batch.column("minx").to_numpy(zero_copy_only=False)
        miny = batch.column("miny").to_numpy(zero_copy_only=False)
        maxx = batch.column("maxx").to_numpy(zero_copy_only=False)
        maxy = batch.column("maxy").to_numpy(zero_copy_only=False)
        osm = batch.column("osm_id").to_numpy(zero_copy_only=False)
        # bbox containment matrix (n_q, n_b) via broadcasting
        inx = (self.qx[:, None] >= minx[None, :]) & (self.qx[:, None] <= maxx[None, :])
        iny = (self.qy[:, None] >= miny[None, :]) & (self.qy[:, None] <= maxy[None, :])
        qi, bi = np.nonzero(inx & iny)
        if self.exact and len(qi):
            coords_col = batch.column("coords")
            if isinstance(coords_col, pa.ChunkedArray):
                coords_col = coords_col.combine_chunks()
            ring_off = batch.column("ring_offsets")
            if isinstance(ring_off, pa.ChunkedArray):
                ring_off = ring_off.combine_chunks()
            keep = np.zeros(len(qi), dtype=bool)
            for j, (q, b) in enumerate(zip(qi, bi)):
                flat = np.asarray(coords_col[b].as_py()).reshape(-1, 2)
                starts = np.asarray(ring_off[b].as_py())
                ends = np.concatenate([starts[1:], [len(flat)]])
                inside = point_in_ring(self.qx[q], self.qy[q], flat[starts[0] : ends[0]])
                for s, e in zip(starts[1:], ends[1:]):  # holes
                    if inside and point_in_ring(self.qx[q], self.qy[q], flat[s:e]):
                        inside = False
                keep[j] = inside
            qi, bi = qi[keep], bi[keep]
        return pa.table(
            {
                "qid": pa.array(self.qid[qi].astype(np.int64)),
                "osm_id": pa.array(osm[bi]),
            }
        )


def _pip_join(sf_dir: str, exact: bool) -> "ray.data.Dataset":
    import pyarrow.parquet as pq

    root = ensure_synth(sf_from_dir(sf_dir))
    qp = pq.read_table(root / "query_points.parquet")
    cols = ["osm_id", "minx", "miny", "maxx", "maxy"] + (
        ["coords", "ring_offsets"] if exact else []
    )
    return parsed_ds(sf_dir).select_columns(cols).map_batches(
        _PipJoin,
        fn_constructor_args=(
            qp.column("qid").to_numpy(),
            qp.column("x").to_numpy(),
            qp.column("y").to_numpy(),
            exact,
        ),
        batch_format="pyarrow",
        concurrency=_pool(),
        batch_size=8192,
    )


def q_point_bbox_join(sf_dir: str) -> "ray.data.Dataset":
    """Spatial range join: query points × building bboxes (SQL-oracled)."""
    return _pip_join(sf_dir, exact=False)


def q_point_in_polygon(sf_dir: str) -> "ray.data.Dataset":
    """Exact point-in-polygon join (ray-cast refine after the bbox filter —
    the reference's PIP primitive, ``src/math/utils.ts:3-45``)."""
    return _pip_join(sf_dir, exact=True)


def q_knn_bucketed(sf_dir: str, bucket_zoom: int = 13) -> "ray.data.Dataset":
    """Cell-bucketed kNN (the J4 scale path, SURVEY.md §7.3): buildings are
    bucketed by coarse cell via a groupby shuffle; each query is replicated
    to its cell + 8 neighbors; per-cell brute-force refine, then a global
    per-query top-k.  Approximate iff the true k-neighborhood exceeds the
    3×3 bucket ring (~4.9 km at z13) — recall vs the exact query is asserted
    in tests.  Unlike q_knn, the query set never broadcasts to every batch:
    both sides shuffle ONLY by bucket, so this is the shape that scales to
    10^9 queries."""
    import pyarrow.parquet as pq

    root = ensure_synth(sf_from_dir(sf_dir))
    qp = pq.read_table(root / "query_points.parquet")
    k = int(qp.column("k")[0].as_py())
    t = tile_size(bucket_zoom)

    def bucket_of(x, y):
        bx = np.floor((np.asarray(x) + WORLD_HALF) / t).astype(np.int64)
        by = np.floor((WORLD_HALF - np.asarray(y)) / t).astype(np.int64)
        return bx, by

    # replicate queries to their 3×3 bucket neighborhood (driver-side: the
    # query table is the small side)
    qx = qp.column("x").to_numpy()
    qy = qp.column("y").to_numpy()
    qids = qp.column("qid").to_numpy()
    bx, by = bucket_of(qx, qy)
    reps = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            reps.append(
                pa.table(
                    {
                        "bucket": pa.array((bx + dx) * np.int64(1 << 24) + (by + dy)),
                        "qid": pa.array(qids),
                        "qx": pa.array(qx),
                        "qy": pa.array(qy),
                        "is_query": pa.array(np.ones(len(qids), dtype=np.int8)),
                    }
                )
            )
    queries_tbl = pa.concat_tables(reps)

    def building_buckets(batch: pa.Table) -> pa.Table:
        cx = batch.column("centroid_x").to_numpy(zero_copy_only=False)
        cy = batch.column("centroid_y").to_numpy(zero_copy_only=False)
        bbx, bby = bucket_of(cx, cy)
        return pa.table(
            {
                "bucket": pa.array(bbx * np.int64(1 << 24) + bby),
                "qid": batch.column("osm_id"),  # reuse column slot: osm_id
                "qx": pa.array(cx),
                "qy": pa.array(cy),
                "is_query": pa.array(np.zeros(len(cx), dtype=np.int8)),
            }
        )

    buildings = parsed_ds(sf_dir).select_columns(
        ["osm_id", "centroid_x", "centroid_y"]
    ).map_batches(building_buckets, batch_format="pyarrow")
    both = buildings.union(ray.data.from_arrow(queries_tbl))

    def per_bucket(group: pa.Table) -> pa.Table:
        isq = group.column("is_query").to_numpy(zero_copy_only=False).astype(bool)
        if not isq.any() or isq.all():
            return pa.table(
                {
                    "qid": pa.array([], type=pa.int64()),
                    "osm_id": pa.array([], type=pa.int64()),
                    "dist": pa.array([], type=pa.float64()),
                }
            )
        ids = group.column("qid").to_numpy(zero_copy_only=False)
        xs = group.column("qx").to_numpy(zero_copy_only=False)
        ys = group.column("qy").to_numpy(zero_copy_only=False)
        q_ids, q_x, q_y = ids[isq], xs[isq], ys[isq]
        b_ids, b_x, b_y = ids[~isq], xs[~isq], ys[~isq]
        d2 = (q_x[:, None] - b_x[None, :]) ** 2 + (q_y[:, None] - b_y[None, :]) ** 2
        kk = min(k, d2.shape[1])
        part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(q_ids, kk)
        cols = part.reshape(-1)
        return pa.table(
            {
                "qid": pa.array(rows),
                "osm_id": pa.array(b_ids[cols]),
                "dist": pa.array(
                    np.sqrt(d2[np.repeat(np.arange(len(q_ids)), kk), cols])
                ),
            }
        )

    partials = both.groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")

    def refine(group: pa.Table) -> pa.Table:
        dist = group.column("dist").to_numpy(zero_copy_only=False)
        osm = group.column("osm_id").to_numpy(zero_copy_only=False)
        qid_g = group.column("qid").to_numpy(zero_copy_only=False)
        # a building can reach a query via several replicas — dedup
        _, first = np.unique(osm, return_index=True)
        dist, osm = dist[first], osm[first]
        order = np.lexsort((osm, dist))[:k]
        return pa.table(
            {
                "qid": pa.array(qid_g[first][order]),
                "osm_id": pa.array(osm[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32)),
            }
        )

    return partials.groupby("qid").map_groups(refine, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# raster DEM → vector height sampling (companion operator, north rule)


class _DemSampler:
    """Actor-pool stage holding the broadcast DEM grid; bilinear sample at
    each building centroid (reference analog: ``elevation`` tag,
    ``/root/reference/src/building/type.ts:67``)."""

    def __init__(self, grid, x0, y0, dx, dy):
        self.grid = grid               # (n, n) float64, broadcast once
        self.x0 = x0
        self.y0 = y0
        self.dx = dx
        self.dy = dy

    def __call__(self, batch: pa.Table) -> pa.Table:
        cx = batch.column("centroid_x").to_numpy(zero_copy_only=False)
        cy = batch.column("centroid_y").to_numpy(zero_copy_only=False)
        n = self.grid.shape[0]
        gx = (cx - self.x0) / self.dx - 0.5
        gy = (cy - self.y0) / self.dy - 0.5
        i0 = np.clip(np.floor(gx), 0, n - 2).astype(np.int64)
        j0 = np.clip(np.floor(gy), 0, n - 2).astype(np.int64)
        fx = np.clip(gx - i0, 0.0, 1.0)
        fy = np.clip(gy - j0, 0.0, 1.0)
        g = self.grid
        z = (
            (1.0 - fx) * (1.0 - fy) * g[j0, i0]
            + fx * (1.0 - fy) * g[j0, i0 + 1]
            + (1.0 - fx) * fy * g[j0 + 1, i0]
            + fx * fy * g[j0 + 1, i0 + 1]
        )
        return pa.table(
            {
                "osm_id": batch.column("osm_id"),
                "elevation": pa.array(np.round(z, 6)),
            }
        )


def q_dem_sample(sf_dir: str) -> "ray.data.Dataset":
    import pyarrow.parquet as pq

    root = ensure_synth(sf_from_dir(sf_dir))
    dem = pq.read_table(root / "dem.parquet")
    rows = dem.column("row").to_numpy()
    cols = dem.column("col").to_numpy()
    n = int(rows.max()) + 1
    grid = np.zeros((n, n), dtype=np.float64)
    grid[rows, cols] = dem.column("z").to_numpy().astype(np.float64)
    return parsed_ds(sf_dir).select_columns(["osm_id", "centroid_x", "centroid_y"]).map_batches(
        _DemSampler,
        fn_constructor_args=(
            grid,
            float(dem.column("x0")[0].as_py()),
            float(dem.column("y0")[0].as_py()),
            float(dem.column("dx")[0].as_py()),
            float(dem.column("dy")[0].as_py()),
        ),
        batch_format="pyarrow",
        concurrency=_pool(),
        batch_size=16384,
    )


def q_simplify(sf_dir: str, eps: float = 2.0) -> "ray.data.Dataset":
    """Douglas–Peucker footprint simplification (LOD companion op the
    reference lacks): per building, simplify the OUTER ring with an
    ``eps``-meter tolerance and report vertex + shoelace-area changes.

    Rows-only check (recursive geometry, not SQL-expressible); pytest
    asserts the DP invariants — anchors retained, every dropped vertex
    within eps of the simplified chord, determinism across batch sizes.

    Shuffle-free: one ``map_batches`` pass, per-ring stack DP with
    vectorized span distances (geom/simplify.py).  Output:
    (osm_id, n_vertices, n_simplified, area_e4, area_simplified_e4)."""
    from ..geom.simplify import simplify_ring

    def _area(ring: np.ndarray) -> float:
        x, y = ring[:, 0], ring[:, 1]
        return 0.5 * abs(
            float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
        )

    def simplify(batch: pa.Table) -> pa.Table:
        coords_col = batch.column("coords")
        if isinstance(coords_col, pa.ChunkedArray):
            coords_col = coords_col.combine_chunks()
        ring_off = batch.column("ring_offsets")
        if isinstance(ring_off, pa.ChunkedArray):
            ring_off = ring_off.combine_chunks()
        n = len(batch)
        nv = np.zeros(n, dtype=np.int64)
        ns = np.zeros(n, dtype=np.int64)
        a0 = np.zeros(n, dtype=np.int64)
        a1 = np.zeros(n, dtype=np.int64)
        flat_all = np.asarray(coords_col.values).reshape(-1, 2)
        voffs = np.asarray(coords_col.offsets).astype(np.int64) // 2
        rs_vals = np.asarray(ring_off.values).astype(np.int64)
        rs_offs = np.asarray(ring_off.offsets).astype(np.int64)
        for i in range(n):
            flat = flat_all[voffs[i] : voffs[i + 1]]
            starts = rs_vals[rs_offs[i] : rs_offs[i + 1]]
            end = starts[1] if len(starts) > 1 else len(flat)
            outer = flat[starts[0] : end]
            keep = simplify_ring(outer, eps)
            simp = outer[keep]
            nv[i] = len(outer)
            ns[i] = len(simp)
            a0[i] = np.floor(_area(outer) * 1e4 + 0.5)
            a1[i] = np.floor(_area(simp) * 1e4 + 0.5)
        return pa.table(
            {
                "osm_id": batch.column("osm_id"),
                "n_vertices": pa.array(nv),
                "n_simplified": pa.array(ns),
                "area_e4": pa.array(a0),
                "area_simplified_e4": pa.array(a1),
            }
        )

    return parsed_ds(sf_dir).map_batches(
        simplify, batch_format="pyarrow", batch_size=4096
    )


def q_dem_zonal(sf_dir: str) -> "ray.data.Dataset":
    """Zonal statistics (raster→vector): per building, count/sum/mean of
    the DEM cells whose CENTERS fall inside the footprint bbox — the
    classic zonal-mean elevation rollup.

    Exactness: cell z converts to integer micro-units BEFORE any
    summation, so the rectangle sums are int64-exact and the DuckDB
    oracle (a center-in-bbox join + SUM) hash-matches.  Cell selection
    evaluates the boundary with the IDENTICAL float expression the SQL
    uses (``x0 + (col + 0.5) * dx ⋛ minx``): the index range comes from
    arithmetic, then each edge column/row is verified-and-nudged with
    that expression, so engine and oracle can never disagree on a tie.
    z is non-negative in this corpus, so `sum // n` floor division
    matches DuckDB's truncating `//`.

    Scale shape: the raster is per-actor broadcast state (a real
    deployment holds one DEM TILE per task — bounded); per building the
    rectangle sum is O(1) via a summed-area table, the whole batch
    vectorized; no shuffle at all.

    Output: (osm_id, n_cells, sum_z_e6, mean_z_e6)."""
    import pyarrow.parquet as pq

    from ..synth.generator import ensure_synth, sf_from_dir

    root = ensure_synth(sf_from_dir(sf_dir))
    dem = pq.read_table(str(root / "dem.parquet"))
    row = dem.column("row").to_numpy()
    col = dem.column("col").to_numpy()
    z = dem.column("z").to_numpy().astype(np.float64)
    x0 = float(dem.column("x0")[0].as_py())
    y0 = float(dem.column("y0")[0].as_py())
    dx = float(dem.column("dx")[0].as_py())
    dy = float(dem.column("dy")[0].as_py())
    n = int(row.max()) + 1
    z6 = np.zeros((n, n), dtype=np.int64)
    z6[row, col] = np.floor(z * 1e6 + 0.5).astype(np.int64)
    sat = np.zeros((n + 1, n + 1), dtype=np.int64)
    sat[1:, 1:] = z6.cumsum(0).cumsum(1)

    def _range(lo_val: np.ndarray, hi_val: np.ndarray, o: float, d: float):
        """Index range [lo, hi] of cells with center in [lo_val, hi_val],
        centers at o + (i + 0.5) * d — arithmetic guess, then the exact
        boundary expression nudges each edge."""
        lo = np.ceil((lo_val - o) / d - 0.5).astype(np.int64)
        hi = np.floor((hi_val - o) / d - 0.5).astype(np.int64)
        c = lambda i: o + (i + 0.5) * d  # noqa: E731 — the shared expression
        step = (lo - 1 >= 0) & (c(lo - 1) >= lo_val)
        lo = lo - step
        step = (c(lo) < lo_val)
        lo = lo + step
        step = (hi + 1 <= n - 1) & (c(hi + 1) <= hi_val)
        hi = hi + step
        step = (c(hi) > hi_val)
        hi = hi - step
        # lo may clip to n (bbox right of grid) and hi to -1 (left of it):
        # both make the range empty and stay valid SAT indices
        return np.clip(lo, 0, n), np.clip(hi, -1, n - 1)

    def zonal(batch: pa.Table) -> pa.Table:
        minx = batch.column("minx").to_numpy(zero_copy_only=False)
        maxx = batch.column("maxx").to_numpy(zero_copy_only=False)
        miny = batch.column("miny").to_numpy(zero_copy_only=False)
        maxy = batch.column("maxy").to_numpy(zero_copy_only=False)
        lo_c, hi_c = _range(minx, maxx, x0, dx)
        lo_r, hi_r = _range(miny, maxy, y0, dy)
        w = np.maximum(hi_c - lo_c + 1, 0)
        h = np.maximum(hi_r - lo_r + 1, 0)
        n_cells = w * h
        hi_r1, hi_c1 = hi_r + 1, hi_c + 1
        s = (
            sat[hi_r1, hi_c1]
            - sat[lo_r, hi_c1]
            - sat[hi_r1, lo_c]
            + sat[lo_r, lo_c]
        )
        s = np.where(n_cells > 0, s, 0)
        mean = np.where(n_cells > 0, s // np.maximum(n_cells, 1), 0)
        return pa.table(
            {
                "osm_id": batch.column("osm_id"),
                "n_cells": pa.array(n_cells.astype(np.int64)),
                "sum_z_e6": pa.array(s.astype(np.int64)),
                "mean_z_e6": pa.array(mean.astype(np.int64)),
            }
        )

    return parsed_ds(sf_dir).map_batches(zonal, batch_format="pyarrow")


def q_tile_smooth(sf_dir: str) -> "ray.data.Dataset":
    """3x3 neighbor-smoothed per-tile building density: every occupied
    z16 tile with the summed building count of its 3x3 neighborhood —
    the hotspot/blur pass over the A1 tile-stats grid (reference analog:
    the per-tile aggregation the tileset writer feeds,
    /root/reference/generate-tileset.ts:37-65, with a spatial
    smoothing window the reference computes client-side).

    Scale shape: reuses the A1 combiner-tree stats (zero payload through
    that shuffle), then one replicate-9x exchange over the OCCUPIED-tile
    table (pipelines/partition.py:stencil_3x3) — wire volume is 9x the
    tile count, never 9x buildings.

    Output: (tile_x, tile_y, n_buildings, smooth3x3)."""
    from .partition import stencil_3x3

    cells = tile_counts_ds(sf_dir).drop_columns(["cell_id", "tile_z"])
    return stencil_3x3(cells, "tile_x", "tile_y", "batch_length").map_batches(
        lambda b: pa.table(
            {
                "tile_x": b.column("tile_x"),
                "tile_y": b.column("tile_y"),
                "n_buildings": b.column("own"),
                "smooth3x3": b.column("smooth"),
            }
        ),
        batch_format="pyarrow",
    )


def q_height_median(sf_dir: str) -> "ray.data.Dataset":
    """Grouped EXACT median: per roof type, the lower-median building
    height in decimeters — the grouped variant of the engine's
    histogram-percentile pattern (textops.quality_top_percent computes
    the global case; here every group's threshold resolves inside its
    own co-located partition, no driver reduction at all).

    Scale shape: per-batch (roof_type, decimeter) bincount partials →
    one grouped exchange over the bounded (types × height domain) cell
    table → one roof_type-keyed partition pass finds each group's
    smallest score with ``2*cum >= total``.  The height domain is
    bounded (buildings, not skyscraper-free-floats), so the cell table
    is tiny regardless of corpus size.

    Output: (roof_type, n_buildings, median_dm)."""
    from .partition import map_key_partitions

    def hist_partial(batch: pa.Table) -> pa.Table:
        h = batch.column("height").to_numpy(zero_copy_only=False)
        rt = batch.column("roof_type").to_numpy(zero_copy_only=False)
        valid = ~np.isnan(h)
        rt = np.where(
            np.asarray([v is None for v in rt], dtype=bool), "none", rt
        )[valid]
        dm = np.floor(h[valid] * 10 + 0.5).astype(np.int64)
        codes, inv = np.unique(rt.astype(str), return_inverse=True)
        key = inv.astype(np.int64) * 1_000_000 + dm
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "roof_type": pa.array(codes[(uk // 1_000_000)].astype(str)),
                "dm": pa.array(uk % 1_000_000),
                "p_n": pa.array(cnt.astype(np.int64)),
            }
        )

    cells = (
        parsed_ds(sf_dir)
        .select_columns(["roof_type", "height"])
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["roof_type", "dm"])
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n"))
    )

    def median_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "roof_type": pa.array([], type=pa.string()),
                "n_buildings": pa.array([], type=pa.int64()),
                "median_dm": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        rt = tbl.column("roof_type").to_numpy(zero_copy_only=False)
        dm = tbl.column("dm").to_numpy(zero_copy_only=False)
        import pyarrow.compute as pc

        n = pc.cast(tbl.column("n"), pa.int64()).to_numpy(zero_copy_only=False)
        codes, inv = np.unique(rt.astype(str), return_inverse=True)
        order = np.lexsort((dm, inv))
        inv_s, dm_s, n_s = inv[order], dm[order], n[order]
        starts = np.flatnonzero(
            np.concatenate([[True], inv_s[1:] != inv_s[:-1]])
        )
        run_id = np.cumsum(np.concatenate([[True], inv_s[1:] != inv_s[:-1]])) - 1
        csum = np.cumsum(n_s)
        base = (csum[starts] - n_s[starts])[run_id]
        cum = csum - base
        tot = np.zeros(len(starts), dtype=np.int64)
        np.add.at(tot, run_id, n_s)
        is_med = 2 * cum >= tot[run_id]
        # smallest qualifying dm per run: min row index where is_med
        cand = np.where(is_med, np.arange(len(is_med)), len(is_med))
        med_dm = dm_s[np.minimum.reduceat(cand, starts)]
        return pa.table(
            {
                "roof_type": pa.array(codes[inv_s[starts]].astype(str)),
                "n_buildings": pa.array(tot),
                "median_dm": pa.array(med_dm),
            }
        )

    return map_key_partitions(cells, ["roof_type"], median_part)


# sqrt(3)/3 and 2/3 as the exact doubles mirrored into the SQL oracle —
# both sides must evaluate the identical float expression tree
HEX_S3 = float(np.sqrt(3.0) / 3.0)
HEX_TT = 2.0 / 3.0


def hex_axial(x: np.ndarray, y: np.ndarray, size: float) -> tuple[np.ndarray, np.ndarray]:
    """Pointy-top hexagonal cell of each point: fractional axial coords +
    cube rounding (the standard H3-style hex-grid assignment; the engine's
    hexagonal counterpart to the square z16 grid of `mercator_to_tile`).

    Every float op (constants, op order, floor(v+0.5) rounding) is
    mirrored verbatim in the DuckDB oracle so the assignment is
    bit-reproducible across engines."""
    cx = (HEX_S3 * x - y / 3.0) / size
    cz = (y * HEX_TT) / size
    cy = -cx - cz
    rx = np.floor(cx + 0.5)
    ry = np.floor(cy + 0.5)
    rz = np.floor(cz + 0.5)
    dx = np.abs(rx - cx)
    dy = np.abs(ry - cy)
    dz = np.abs(rz - cz)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    rx = np.where(fix_x, -ry - rz, rx)
    ry = np.where(fix_y, -rx - rz, ry)
    rz = np.where(~fix_x & ~fix_y, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def q_hexbin(sf_dir: str, size: float = 1000.0) -> "ray.data.Dataset":
    """Hexagonal grid index (H3/S2 analog) over building centroids: each
    building lands in the pointy-top hex cell of side ``size`` meters
    containing its centroid (fractional axial coords + cube rounding);
    per-hex rollup of count and exact decimeter height mass.  The hex
    grid is the north-rule's named index family ("H3/S2 index") next to
    the square quadtree the tiler uses (reference grid:
    /root/reference/generate-tileset.ts:37-65).

    Scale shape: embarrassingly parallel per-batch assignment + count
    partials, then ONE bounded groupby over occupied hexes (hex count is
    bounded by geography / size², never by corpus size) — identical cost
    envelope to the A1 tile stats.

    Output: (hex_q, hex_r, n_buildings, sum_height_dm)."""

    def assign(batch: pa.Table) -> pa.Table:
        x = batch.column("centroid_x").to_numpy(zero_copy_only=False)
        y = batch.column("centroid_y").to_numpy(zero_copy_only=False)
        h = batch.column("height").to_numpy(zero_copy_only=False)
        ok = np.isfinite(x) & np.isfinite(y)
        x, y, h = x[ok], y[ok], h[ok]
        hq, hr = hex_axial(x, y, size)
        hdm = np.where(np.isfinite(h), np.floor(h * 10 + 0.5), 0.0).astype(
            np.int64
        )
        key = hq * np.int64(1 << 32) + hr  # hr >= 0 in-region; packed partial key
        uk, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "hex_q": pa.array(uk // np.int64(1 << 32)),
                "hex_r": pa.array(uk % np.int64(1 << 32)),
                "p_n": pa.array(np.bincount(inv, minlength=len(uk)).astype(np.int64)),
                "p_hdm": pa.array(
                    np.bincount(inv, weights=hdm, minlength=len(uk)).astype(np.int64)
                ),
            }
        )

    from .partition import sum_by_key

    return sum_by_key(
        parsed_ds(sf_dir)
        .select_columns(["centroid_x", "centroid_y", "height"])
        .map_batches(assign, batch_format="pyarrow"),
        ["hex_q", "hex_r"],
        {"p_n": "n_buildings", "p_hdm": "sum_height_dm"},
    )


def q_overlap_pairs(
    sf_dir: str, num_partitions: int = 64, pair_zoom: int = 18
) -> "ray.data.Dataset":
    """Spatial SELF-join: every pair of buildings whose footprint bboxes
    intersect (closed intervals — shared walls count), with the exact
    bbox-intersection area.  The partition-based spatial-merge join
    (PBSM): replicate each bbox to the z16 tiles it covers (the same
    rectangle cover as J1 ownership, stages/assign.py:candidate_tiles),
    pair WITHIN cells (z18 subcells by default — the reference-point
    rule is grid-independent, and quartering the cell edge cuts the
    per-cell k² candidate blow-up ~16× in dense urban cells at the price
    of a slightly fatter replicated cover), and deduplicate multi-cell
    pairs with the reference-point rule — a pair is emitted only by the single tile
    containing the intersection's top-left corner, so no global dedup
    shuffle is ever needed.

    Scale shape: ONE tile-keyed exchange of (osm_id, bbox) rows (16 B of
    key + 32 B of box per cover cell); in-partition pairing is the
    vectorized triangular-index cross product per tile run (wire and
    compute bounded by per-tile density², which geography bounds — the
    dense-urban skew case is the documented assumption, mitigated by the
    z16 cell size).

    Output: (osm_a, osm_b, ov_area_c) with osm_a < osm_b; area in
    floor(m² * 100 + 0.5) integer units mirroring the SQL oracle."""
    from .partition import map_key_partitions, run_starts
    from ..stages.assign import tile_code as pack_tile

    def cover(batch: pa.Table) -> pa.Table:
        osm = batch.column("osm_id").to_numpy(zero_copy_only=False)
        minx = batch.column("minx").to_numpy(zero_copy_only=False)
        miny = batch.column("miny").to_numpy(zero_copy_only=False)
        maxx = batch.column("maxx").to_numpy(zero_copy_only=False)
        maxy = batch.column("maxy").to_numpy(zero_copy_only=False)
        keep = np.isfinite(minx) & np.isfinite(miny) & np.isfinite(maxx) & np.isfinite(maxy)
        if not keep.all():
            osm, minx, miny, maxx, maxy = (
                a[keep] for a in (osm, minx, miny, maxx, maxy)
            )
        tx0, ty0 = mercator_to_tile(minx, maxy, pair_zoom)
        tx1, ty1 = mercator_to_tile(maxx, miny, pair_zoom)
        nx = (tx1 - tx0 + 1).astype(np.int64)
        ny = (ty1 - ty0 + 1).astype(np.int64)
        total = nx * ny
        row = np.repeat(np.arange(len(osm)), total)
        starts = np.concatenate([[0], np.cumsum(total)[:-1]])
        intra = np.arange(int(total.sum())) - np.repeat(starts, total)
        txs = (tx0[row] + (intra // ny[row])).astype(np.int32)
        tys = (ty0[row] + (intra % ny[row])).astype(np.int32)
        return pa.table(
            {
                "tile_code": pa.array(pack_tile(txs, tys)),
                "osm_id": pa.array(osm[row]),
                "minx": pa.array(minx[row]),
                "miny": pa.array(miny[row]),
                "maxx": pa.array(maxx[row]),
                "maxy": pa.array(maxy[row]),
            }
        )

    def pairs_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "osm_a": pa.array([], type=pa.int64()),
                "osm_b": pa.array([], type=pa.int64()),
                "ov_area_c": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        code = tbl.column("tile_code").to_numpy(zero_copy_only=False)
        osm = tbl.column("osm_id").to_numpy(zero_copy_only=False)
        minx = tbl.column("minx").to_numpy(zero_copy_only=False)
        miny = tbl.column("miny").to_numpy(zero_copy_only=False)
        maxx = tbl.column("maxx").to_numpy(zero_copy_only=False)
        maxy = tbl.column("maxy").to_numpy(zero_copy_only=False)
        order = np.lexsort((osm, code))
        code, osm = code[order], osm[order]
        minx, miny, maxx, maxy = minx[order], miny[order], maxx[order], maxy[order]
        first = np.flatnonzero(run_starts(code))
        k = np.diff(np.append(first, len(code)))
        npairs = k * (k - 1) // 2
        tot = int(npairs.sum())
        if tot == 0:
            return empty
        run_of_pair = np.repeat(np.arange(len(k)), npairs)
        pair_pos = np.arange(tot) - np.repeat(np.cumsum(npairs) - npairs, npairs)
        kk = k[run_of_pair]
        i = np.floor(
            (2 * kk - 1 - np.sqrt((2 * kk - 1) ** 2 - 8 * pair_pos)) / 2
        ).astype(np.int64)
        off_i = i * kk - i * (i + 1) // 2
        j = (pair_pos - off_i + i + 1).astype(np.int64)
        base = np.repeat(first, npairs)
        ia, ib = base + i, base + j
        # closed-interval bbox intersection
        w = np.minimum(maxx[ia], maxx[ib]) - np.maximum(minx[ia], minx[ib])
        h = np.minimum(maxy[ia], maxy[ib]) - np.maximum(miny[ia], miny[ib])
        hit = (w >= 0) & (h >= 0)
        # reference-point dedup: only the tile holding the intersection's
        # top-left corner (max minx, min maxy) emits the pair
        rx = np.maximum(minx[ia], minx[ib])
        ry = np.minimum(maxy[ia], maxy[ib])
        rtx, rty = mercator_to_tile(rx, ry, pair_zoom)
        hit &= pack_tile(rtx, rty) == code[base]
        ia, ib = ia[hit], ib[hit]
        area_c = np.floor((w[hit] * h[hit]) * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "osm_a": pa.array(osm[ia]),
                "osm_b": pa.array(osm[ib]),
                "ov_area_c": pa.array(area_c),
            }
        )

    covered = (
        parsed_ds(sf_dir)
        .select_columns(["osm_id", "minx", "miny", "maxx", "maxy"])
        .map_batches(cover, batch_format="pyarrow")
    )
    return map_key_partitions(covered, ["tile_code"], pairs_part, num_partitions)


def q_local_moran(sf_dir: str) -> "ray.data.Dataset":
    """Local spatial autocorrelation (LISA / local Moran's I) components
    over the z16 tile-count grid, queen contiguity: for every occupied
    tile, its count deviation and the summed deviation of its occupied
    3x3 neighbors — the hotspot/coldspot statistic a tiling pipeline uses
    to pick LOD budgets (high positive dev x nbr_dev_sum = urban cluster,
    negative product = isolated outlier).

    Exactness: all terms are pre-multiplied by the tile count N so every
    column is an INTEGER (dev = N*c_i - S, nbr_dev_sum = N*sum(c_j) -
    n_nbrs*S with S the global building count) — no float mean, no sum-
    association drift vs the SQL oracle; the float statistic is a trivial
    driver-side ratio of these components.

    Scale shape: the A1 combiner-tree tile stats (payload-free shuffle),
    ONE bounded (Count, Sum) aggregate over occupied tiles for (N, S),
    then the replicate-9x stencil exchange (pipelines/partition.py:
    stencil_3x3) — wire volume 9x occupied tiles, never 9x buildings.

    Output: (tile_x, tile_y, dev, nbr_dev_sum, n_nbrs)."""
    from .partition import stencil_3x3

    cells = (
        tile_counts_ds(sf_dir)
        .drop_columns(["cell_id", "tile_z"])
        .materialize()  # bounded (occupied tiles); consumed twice
    )
    glob = cells.aggregate(
        ray.data.aggregate.Count(),
        ray.data.aggregate.Sum("batch_length", alias_name="s"),
    )
    n_tiles, s_total = int(glob["count()"]), int(glob["s"])

    def finish(batch: pa.Table) -> pa.Table:
        own = batch.column("own").to_numpy(zero_copy_only=False)
        smooth = batch.column("smooth").to_numpy(zero_copy_only=False)
        nn = batch.column("n_nbrs").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "tile_x": batch.column("tile_x"),
                "tile_y": batch.column("tile_y"),
                "dev": pa.array(n_tiles * own - s_total),
                "nbr_dev_sum": pa.array(n_tiles * (smooth - own) - nn * s_total),
                "n_nbrs": pa.array(nn),
            }
        )

    return stencil_3x3(
        cells, "tile_x", "tile_y", "batch_length", emit_nnbrs=True
    ).map_batches(finish, batch_format="pyarrow")


def q_dem_slope(sf_dir: str, num_partitions: int = 64) -> "ray.data.Dataset":
    """Raster slope/aspect (terrain derivative): per interior DEM cell,
    the central-difference gradient, its integer-scaled magnitude, and
    an 8-way aspect class — the raster-side counterpart of q_dem_zonal
    (raster→vector) on the north rule's raster↔vector axis; the
    reference consumes the same kind of terrain surface for its ground
    mask (SURVEY.md G17).

    Exactness: z widens float32→float64 (exact), both engines evaluate
    the identical double expression tree, magnitudes compare as
    floor(x*1e6+0.5) integers and the aspect class is three pure
    comparisons packed into bits (no transcendentals ever cross the
    oracle boundary).

    Scale shape: a DEM at fleet scale is a tiled raster; this runs the
    stencil as replicate-5x keyed by TARGET cell (own + 4 directed
    neighbor contributions, wire = 5x cell count) → ONE hash exchange →
    per-partition sorted segment gather, so no task ever needs the whole
    raster (q_dem_zonal's broadcast would not hold there).  Border cells
    (missing any neighbor) drop, exactly as the SQL inner joins do.

    Output: (row, col, dzdx_e6, dzdy_e6, slope_e6, aspect_class)."""
    from .partition import map_key_partitions, run_starts

    root = ensure_synth(sf_from_dir(sf_dir))
    dem = ray.data.read_parquet(str(root / "dem.parquet"))

    def replicate(batch: pa.Table) -> pa.Table:
        r = batch.column("row").to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch.column("col").to_numpy(zero_copy_only=False).astype(np.int64)
        z = batch.column("z").to_numpy(zero_copy_only=False).astype(np.float64)
        dx = batch.column("dx").to_numpy(zero_copy_only=False)
        dy = batch.column("dy").to_numpy(zero_copy_only=False)
        # tags: 0=own, 1=I am my target's LEFT neighbor (target col+1), 2=right,
        # 3=up (target row+1), 4=down — each source cell contributes to 5 targets
        tr = np.concatenate([r, r, r, r + 1, r - 1])
        tc = np.concatenate([c, c + 1, c - 1, c, c])
        tag = np.repeat(np.arange(5, dtype=np.int8), len(r))
        return pa.table(
            {
                "trow": pa.array(tr),
                "tcol": pa.array(tc),
                "tag": pa.array(tag),
                "z": pa.array(np.tile(z, 5)),
                "dx": pa.array(np.tile(dx, 5)),
                "dy": pa.array(np.tile(dy, 5)),
            }
        )

    def gradient(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "row": pa.array([], type=pa.int64()),
                "col": pa.array([], type=pa.int64()),
                "dzdx_e6": pa.array([], type=pa.int64()),
                "dzdy_e6": pa.array([], type=pa.int64()),
                "slope_e6": pa.array([], type=pa.int64()),
                "aspect_class": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        tr = tbl.column("trow").to_numpy(zero_copy_only=False)
        tc = tbl.column("tcol").to_numpy(zero_copy_only=False)
        tag = tbl.column("tag").to_numpy(zero_copy_only=False)
        z = tbl.column("z").to_numpy(zero_copy_only=False)
        dx = tbl.column("dx").to_numpy(zero_copy_only=False)
        dy = tbl.column("dy").to_numpy(zero_copy_only=False)
        order = np.lexsort((tag, tc, tr))
        tr, tc, tag, z, dx, dy = (
            a[order] for a in (tr, tc, tag, z, dx, dy)
        )
        idx = np.flatnonzero(run_starts(tr, tc))
        rl = np.diff(np.append(idx, len(tr)))
        # interior cells: own row present plus all 4 neighbors = 5 rows
        # (tags are distinct within a key by construction)
        full = rl == 5
        if not full.any():
            return empty
        base = idx[full]
        # sorted by tag: 0=own, 1=left(z at col-1), 2=right, 3=up, 4=down
        zl, zr = z[base + 1], z[base + 2]
        zu, zd = z[base + 3], z[base + 4]
        dzdx = (zr - zl) / (2.0 * dx[base])
        dzdy = (zd - zu) / (2.0 * dy[base])
        slope = np.sqrt(dzdx * dzdx + dzdy * dzdy)
        aspect = (
            (np.abs(dzdx) >= np.abs(dzdy)).astype(np.int64) * 4
            + (dzdy >= 0).astype(np.int64) * 2
            + (dzdx >= 0).astype(np.int64)
        )
        return pa.table(
            {
                "row": pa.array(tr[base]),
                "col": pa.array(tc[base]),
                "dzdx_e6": pa.array(
                    np.floor(dzdx * 1000000 + 0.5).astype(np.int64)
                ),
                "dzdy_e6": pa.array(
                    np.floor(dzdy * 1000000 + 0.5).astype(np.int64)
                ),
                "slope_e6": pa.array(
                    np.floor(slope * 1000000 + 0.5).astype(np.int64)
                ),
                "aspect_class": pa.array(aspect),
            }
        )

    rep = dem.map_batches(replicate, batch_format="pyarrow")
    return map_key_partitions(rep, ["trow", "tcol"], gradient, num_partitions)


def morton32(tx: np.ndarray, ty: np.ndarray) -> np.ndarray:
    """Interleave two 16-bit tile coordinates into a 32-bit Morton (Z-order)
    code — the locality-preserving shard key for resumable tile output
    (reference tiles address by (z, x, y); Z-order is the standard
    space-filling-curve linearization of that grid, cf. the quadtree walk
    in /root/reference/generate-tileset.ts:37-65).  Pure bit math,
    vectorized; exact int64 throughout."""

    def spread(v: np.ndarray) -> np.ndarray:
        v = (v | (v << 8)) & np.int64(0x00FF00FF)
        v = (v | (v << 4)) & np.int64(0x0F0F0F0F)
        v = (v | (v << 2)) & np.int64(0x33333333)
        v = (v | (v << 1)) & np.int64(0x55555555)
        return v

    tx = tx.astype(np.int64)
    ty = ty.astype(np.int64)
    return spread(tx) | (spread(ty) << 1)


def q_zorder(sf_dir: str, shard_bits: int = 10) -> "ray.data.Dataset":
    """Z-order (Morton) index per building over the z16 tile grid, plus the
    top-``shard_bits`` shard id a range-partitioned resumable writer would
    key its output directories by.  Embarrassingly parallel: one
    vectorized map over parsed batches, no shuffle at any scale — the
    shard id IS the partitioning (adjacent shards are spatially adjacent,
    so a 256-node fleet writing by shard gets locality for free).

    Output: (osm_id, tile_x, tile_y, morton, shard)."""
    shift = np.int64(32 - shard_bits)

    def assign(batch: pa.Table) -> pa.Table:
        cx = batch.column("centroid_x").to_numpy(zero_copy_only=False)
        cy = batch.column("centroid_y").to_numpy(zero_copy_only=False)
        oid = batch.column("osm_id").to_numpy(zero_copy_only=False)
        ok = np.isfinite(cx) & np.isfinite(cy)
        cx, cy, oid = cx[ok], cy[ok], oid[ok]
        tx = np.floor((cx + WORLD_HALF) / TILE_SIZE_Z16).astype(np.int64)
        ty = np.floor((WORLD_HALF - cy) / TILE_SIZE_Z16).astype(np.int64)
        m = morton32(tx, ty)
        return pa.table(
            {
                "osm_id": pa.array(oid),
                "tile_x": pa.array(tx.astype(np.int32)),
                "tile_y": pa.array(ty.astype(np.int32)),
                "morton": pa.array(m),
                "shard": pa.array(m >> shift),
            }
        )

    return (
        parsed_ds(sf_dir)
        .select_columns(["osm_id", "centroid_x", "centroid_y"])
        .map_batches(assign, batch_format="pyarrow")
    )


def q_hilbert(sf_dir: str, shard_bits: int = 10) -> "ray.data.Dataset":
    """Hilbert-curve index per building over the z16 tile grid, plus the
    top-``shard_bits`` shard id — the locality-tighter sibling of
    q_zorder (Hilbert has no diagonal jumps, so consecutive shard ranges
    are edge-connected regions — tighter write locality for a
    range-partitioned resumable tile writer; it is also the curve the
    S2-analog cells of q_s2_cells walk, via the same
    ``geom/s2.py:hilbert_xy2d`` kernel).  Same scale shape as q_zorder:
    one vectorized map over parsed batches, no shuffle at any scale; the
    shard id IS the partitioning a 256-node fleet would write output
    directories by.

    Output: (osm_id, tile_x, tile_y, hilbert_d, shard)."""
    from ..geom.s2 import hilbert_xy2d

    shift = np.int64(32 - shard_bits)

    def assign(batch: pa.Table) -> pa.Table:
        cx = batch.column("centroid_x").to_numpy(zero_copy_only=False)
        cy = batch.column("centroid_y").to_numpy(zero_copy_only=False)
        oid = batch.column("osm_id").to_numpy(zero_copy_only=False)
        ok = np.isfinite(cx) & np.isfinite(cy)
        cx, cy, oid = cx[ok], cy[ok], oid[ok]
        tx = np.floor((cx + WORLD_HALF) / TILE_SIZE_Z16).astype(np.int64)
        ty = np.floor((WORLD_HALF - cy) / TILE_SIZE_Z16).astype(np.int64)
        h = hilbert_xy2d(16, tx, ty)
        return pa.table(
            {
                "osm_id": pa.array(oid),
                "tile_x": pa.array(tx.astype(np.int32)),
                "tile_y": pa.array(ty.astype(np.int32)),
                "hilbert_d": pa.array(h),
                "shard": pa.array(h >> shift),
            }
        )

    return (
        parsed_ds(sf_dir)
        .select_columns(["osm_id", "centroid_x", "centroid_y"])
        .map_batches(assign, batch_format="pyarrow")
    )


# 150 m neighbor-window grid for q_nn_within: cell edge in quantized
# millimeters (integer, so cell assignment is bit-exact on both engines)
# and the world-half offset that makes quantized coords non-negative
# (floor division == truncation, no sign ambiguity between numpy and SQL).
NN_CELL_MM = np.int64(150_000)
NN_OFF_MM = np.int64(20_037_508_343)


def q_nn_within(sf_dir: str, num_partitions: int = 64) -> "ray.data.Dataset":
    """Bounded-window nearest neighbor: for every building, the closest
    OTHER building centroid within its 3×3 cell neighborhood on a 150 m
    integer grid (Chebyshev window — a candidate is visible iff its cell
    is within ±1 of the home cell; ties break to the lowest neighbor
    osm_id).  This is the windowed-NN join a spatial engine runs corpus-
    wide where q_knn answers point queries: J4's kNN primitive
    (reference distance scan in /root/reference/generate-tileset.ts
    tile-selection walk) turned into a self-join over ALL buildings,
    with the window making the all-pairs problem local.

    Scale shape: candidates replicate to their 9 neighbor cells (fixed
    9× of 32-byte rows — no geometry travels), ONE cell-keyed hash
    exchange co-locates each home cell with its full candidate window,
    and in-partition pairing is a vectorized h×k rectangular cross
    product per cell run (bounded by 9·density² — the same dense-urban
    skew bound as q_overlap_pairs, on a 150 m cell).  Distances compare
    as exact int64 mm² (no sqrt crosses the oracle).

    Output: (osm_id, nn_id, nn_d2_mm2) — buildings with an empty window
    emit no row, exactly as the oracle's inner join drops them."""
    from .partition import map_key_partitions, run_starts

    PACK = np.int64(1) << 20
    offs = np.array(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], dtype=np.int64
    )

    def cover(batch: pa.Table) -> pa.Table:
        oid = batch.column("osm_id").to_numpy(zero_copy_only=False)
        cx = batch.column("centroid_x").to_numpy(zero_copy_only=False)
        cy = batch.column("centroid_y").to_numpy(zero_copy_only=False)
        qx = np.floor(cx * 1000 + 0.5).astype(np.int64) + NN_OFF_MM
        qy = np.floor(cy * 1000 + 0.5).astype(np.int64) + NN_OFF_MM
        cellx = qx // NN_CELL_MM
        celly = qy // NN_CELL_MM
        n = len(oid)
        rep = np.repeat(np.arange(n), len(offs))
        dx = np.tile(offs[:, 0], n)
        dy = np.tile(offs[:, 1], n)
        return pa.table(
            {
                "cell": pa.array(
                    (cellx[rep] + dx) * PACK + (celly[rep] + dy)
                ),
                "osm_id": pa.array(oid[rep]),
                "qx": pa.array(qx[rep]),
                "qy": pa.array(qy[rep]),
                "home": pa.array(((dx == 0) & (dy == 0)).astype(np.int8)),
            }
        )

    def nn_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "osm_id": pa.array([], type=pa.int64()),
                "nn_id": pa.array([], type=pa.int64()),
                "nn_d2_mm2": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        cell = tbl.column("cell").to_numpy(zero_copy_only=False)
        osm = tbl.column("osm_id").to_numpy(zero_copy_only=False)
        qx = tbl.column("qx").to_numpy(zero_copy_only=False)
        qy = tbl.column("qy").to_numpy(zero_copy_only=False)
        home = tbl.column("home").to_numpy(zero_copy_only=False)
        # homes first within each cell run, so pair row i < h is a home
        order = np.lexsort((osm, -home.astype(np.int64), cell))
        cell, osm, qx, qy, home = (
            a[order] for a in (cell, osm, qx, qy, home)
        )
        starts = np.flatnonzero(run_starts(cell))
        k = np.diff(np.append(starts, len(cell)))
        h = np.add.reduceat(home.astype(np.int64), starts)
        hk = h * k
        tot = int(hk.sum())
        if tot == 0:
            return empty
        run_of_pair = np.repeat(np.arange(len(k)), hk)
        pos = np.arange(tot) - np.repeat(np.cumsum(hk) - hk, hk)
        kk = k[run_of_pair]
        ia = np.repeat(starts, hk) + pos // kk
        ib = np.repeat(starts, hk) + pos % kk
        keep = osm[ia] != osm[ib]
        ia, ib = ia[keep], ib[keep]
        if len(ia) == 0:
            return empty
        d2 = (qx[ia] - qx[ib]) ** 2 + (qy[ia] - qy[ib]) ** 2
        # min per home row, tie → lowest neighbor osm_id
        o2 = np.lexsort((osm[ib], d2, ia))
        ia, ib, d2 = ia[o2], ib[o2], d2[o2]
        first = run_starts(ia)
        return pa.table(
            {
                "osm_id": pa.array(osm[ia[first]]),
                "nn_id": pa.array(osm[ib[first]]),
                "nn_d2_mm2": pa.array(d2[first]),
            }
        )

    covered = (
        parsed_ds(sf_dir)
        .select_columns(["osm_id", "centroid_x", "centroid_y"])
        .map_batches(cover, batch_format="pyarrow")
    )
    return map_key_partitions(covered, ["cell"], nn_part, num_partitions)


def q_media_density(sf_dir: str) -> "ray.data.Dataset":
    """Texture-media span density per z16 map tile — the interleaved×geo
    cross: each ``media`` span (``atlas://{family}/{name}``, the
    reference's texture atlas families at
    /root/reference/src/textures/building_textures.ts:103-209) lands in
    the tile of its document's building centroid; rollup counts spans and
    distinct textures per (tile, family).

    Scale shape: media refs and centroid come from the SAME parsed row, so
    there is no doc→building join anywhere; per-batch partials collapse to
    (occupied tiles × ≤2 families) rows before the one bounded groupby.

    Output: (tile_x, tile_y, family, n_media)."""
    import pyarrow.compute as pc

    def assign(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        cx = batch.column("centroid_x").to_numpy(zero_copy_only=False)
        cy = batch.column("centroid_y").to_numpy(zero_copy_only=False)
        refs = batch.column("media_refs")
        if isinstance(refs, pa.ChunkedArray):
            refs = refs.combine_chunks()
        counts = np.diff(np.asarray(refs.offsets))
        row = np.repeat(np.arange(len(batch)), counts)
        tx = np.floor((cx + WORLD_HALF) / TILE_SIZE_Z16).astype(np.int64)[row]
        ty = np.floor((WORLD_HALF - cy) / TILE_SIZE_Z16).astype(np.int64)[row]
        flat = refs.values
        # 'atlas://family/name' → family (slot 3 of the '/'-split, 1-based,
        # mirroring the oracle's string_split(media_ref,'/')[3])
        sliced = pc.utf8_slice_codeunits(flat, 8)
        split = pc.split_pattern(sliced, "/", max_splits=1)
        fam = split.values.take(pa.array(np.asarray(split.offsets)[:-1]))
        fam_codes = fam.dictionary_encode()
        code = np.asarray(fam_codes.indices, dtype=np.int64)
        key = (tx * np.int64(1 << 24) + ty) * np.int64(64) + code
        uk, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        ucode = (uk % 64).astype(np.int64)
        utile = uk // 64
        return pa.table(
            {
                "tile_x": pa.array((utile // (1 << 24)).astype(np.int32)),
                "tile_y": pa.array((utile % (1 << 24)).astype(np.int32)),
                "family": fam_codes.dictionary.take(pa.array(ucode)),
                "p_n": pa.array(n),
            }
        )

    from .partition import sum_by_key

    return sum_by_key(
        parsed_ds(sf_dir)
        .select_columns(["centroid_x", "centroid_y", "media_refs"])
        .map_batches(assign, batch_format="pyarrow"),
        ["tile_x", "tile_y", "family"],
        {"p_n": "n_media"},
    )


def q_ring_areas(sf_dir: str) -> "ray.data.Dataset":
    """Integer-exact shoelace area per polygon ring (G5's area kernel made
    oracle-exact): coordinates quantize to millimeters
    (``floor(c*1000+0.5)`` int64, the repo's established float rule), and
    the signed doubled area sums the differenced edge terms
    ``x_i*(y_{i+1}-y_i) - (x_{i+1}-x_i)*y_i`` — exact integers on both
    engines, so association order can't split the oracle (reference
    twice-area kernel: /root/reference/src/math/utils.ts:7-22).

    Scale shape: one vectorized map over parsed batches (global edge-term
    array + one reduceat per ring run), no shuffle, no per-ring Python.

    Output: (osm_id, ring_idx, ring_nv, area2_mm2)."""
    return (
        parsed_ds(sf_dir)
        .select_columns(["osm_id", "coords", "ring_offsets"])
        .map_batches(ring_areas_batch, batch_format="pyarrow")
    )


def ring_areas_batch(batch: pa.Table) -> pa.Table:
    """Vectorized integer-shoelace kernel for q_ring_areas (unit-tested
    directly against a scalar reference in tests/test_round4c_ops.py)."""
    batch = batch.combine_chunks()
    empty = pa.table(
        {
            "osm_id": pa.array([], type=pa.int64()),
            "ring_idx": pa.array([], type=pa.int64()),
            "ring_nv": pa.array([], type=pa.int64()),
            "area2_mm2": pa.array([], type=pa.int64()),
        }
    )
    coords = batch.column("coords")
    if isinstance(coords, pa.ChunkedArray):
        coords = coords.combine_chunks()
    roffs = batch.column("ring_offsets")
    if isinstance(roffs, pa.ChunkedArray):
        roffs = roffs.combine_chunks()
    oid = batch.column("osm_id").to_numpy(zero_copy_only=False)
    flat = np.asarray(coords.values, dtype=np.float64)
    if len(flat) == 0:
        return empty
    co = np.asarray(coords.offsets, dtype=np.int64)  # in doubles
    nv_row = (co[1:] - co[:-1]) // 2  # vertices per building
    vstart_row = co[:-1] // 2
    ro = np.asarray(roffs.offsets, dtype=np.int64)
    rings_per_row = ro[1:] - ro[:-1]
    rvals = np.asarray(roffs.values, dtype=np.int64)  # ring starts, per-bldg units
    if rvals.size == 0:
        return empty
    ring_row = np.repeat(np.arange(len(batch)), rings_per_row)
    ring_start = rvals + vstart_row[ring_row]  # global vertex index
    # ring end = next ring start within the same building, else bldg end
    ring_end = np.empty_like(ring_start)
    ring_end[:-1] = ring_start[1:]
    ring_end[-1] = vstart_row[ring_row[-1]] + nv_row[ring_row[-1]]
    last_of_row = np.flatnonzero(np.diff(ring_row, append=-1) != 0)
    ring_end[last_of_row] = (vstart_row + nv_row)[ring_row[last_of_row]]
    qx = np.floor(flat[0::2] * 1000.0 + 0.5).astype(np.int64)
    qy = np.floor(flat[1::2] * 1000.0 + 0.5).astype(np.int64)
    term = qx[:-1] * (qy[1:] - qy[:-1]) - (qx[1:] - qx[:-1]) * qy[:-1]
    # zero the phantom edge that spans a ring boundary (last vertex of
    # each ring has no outgoing edge)
    mask_end = ring_end - 1
    term_m = term.copy()
    term_m[mask_end[mask_end < len(term)]] = 0
    # reduceat over ring starts (append sentinel to avoid len-0 tails)
    starts = np.minimum(ring_start, len(term_m) - 1)
    sums = np.add.reduceat(term_m, starts) if len(term_m) else np.zeros(0, np.int64)
    # <2-vertex rings have no edge (reduceat's duplicate-start quirk would
    # otherwise leak a neighbor term); rings starting past the last edge
    # were clamped above — both are area 0 by definition
    degenerate = (ring_start >= len(term_m)) | (ring_end - ring_start < 2)
    sums = np.where(degenerate, 0, sums)
    return pa.table(
        {
            "osm_id": pa.array(np.repeat(oid, rings_per_row)),
            "ring_idx": pa.array(
                np.arange(len(ring_row), dtype=np.int64)
                - np.repeat(
                    np.concatenate(
                        [[0], np.cumsum(rings_per_row[:-1])]
                    ).astype(np.int64),
                    rings_per_row,
                )
            ),
            "ring_nv": pa.array(ring_end - ring_start),
            "area2_mm2": pa.array(sums),
        }
    )



def q_edge_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-building footprint edge statistics, integer-exact: edge count,
    Manhattan perimeter in quantized millimeters, and the squared length
    + direction class of the LONGEST edge (tie → first in (ring, vertex)
    order).  The direction class is the 3-bit code
    ``(dy<0)·4 + (dx<0)·2 + (|dy|>|dx|)`` — a deterministic 8-way
    partition of edge bearings built purely from integer comparisons, so
    both engines agree bit-for-bit (no atan2 crosses the oracle; the
    aspect-class trick of q_dem_slope applied to footprint edges).
    Squared length, not length: edge norms need sqrt, which is not
    association-free; len² in mm² is exact int64.

    Scale shape: one vectorized map over parsed batches (global edge
    arrays + bincount / reduceat per building run), no shuffle — output
    is one row per building, the same cardinality as its input block.

    Output: (osm_id, n_edges, manh_perim_mm, max_edge_len2,
    max_edge_oct)."""
    return (
        parsed_ds(sf_dir)
        .select_columns(["osm_id", "coords", "ring_offsets"])
        .map_batches(edge_stats_batch, batch_format="pyarrow")
    )


def edge_stats_batch(batch: pa.Table) -> pa.Table:
    """Whole-batch footprint edge statistics (see q_edge_stats).  If the
    batch carries centroid columns, the kept rows additionally get their
    z16 (tile_x, tile_y) — the composition hook q_tile_orientation uses."""
    with_tile = "centroid_x" in batch.schema.names
    batch = batch.combine_chunks()
    cols = {
        "osm_id": pa.array([], type=pa.int64()),
        "n_edges": pa.array([], type=pa.int64()),
        "manh_perim_mm": pa.array([], type=pa.int64()),
        "max_edge_len2": pa.array([], type=pa.int64()),
        "max_edge_oct": pa.array([], type=pa.int64()),
    }
    if with_tile:
        cols["tile_x"] = pa.array([], type=pa.int64())
        cols["tile_y"] = pa.array([], type=pa.int64())
    empty = pa.table(cols)
    coords = batch.column("coords")
    if isinstance(coords, pa.ChunkedArray):
        coords = coords.combine_chunks()
    roffs = batch.column("ring_offsets")
    if isinstance(roffs, pa.ChunkedArray):
        roffs = roffs.combine_chunks()
    oid = batch.column("osm_id").to_numpy(zero_copy_only=False)
    flat = np.asarray(coords.values, dtype=np.float64)
    if len(flat) < 4:
        return empty
    co = np.asarray(coords.offsets, dtype=np.int64)
    nv_row = (co[1:] - co[:-1]) // 2
    vstart_row = co[:-1] // 2
    ro = np.asarray(roffs.offsets, dtype=np.int64)
    rings_per_row = ro[1:] - ro[:-1]
    rvals = np.asarray(roffs.values, dtype=np.int64)
    if rvals.size == 0:
        return empty
    ring_row = np.repeat(np.arange(len(batch)), rings_per_row)
    ring_start = rvals + vstart_row[ring_row]
    ring_end = np.empty_like(ring_start)
    ring_end[:-1] = ring_start[1:]
    last_of_row = np.flatnonzero(np.diff(ring_row, append=-1) != 0)
    ring_end[last_of_row] = (vstart_row + nv_row)[ring_row[last_of_row]]
    qx = np.floor(flat[0::2] * 1000.0 + 0.5).astype(np.int64)
    qy = np.floor(flat[1::2] * 1000.0 + 0.5).astype(np.int64)
    dx = qx[1:] - qx[:-1]
    dy = qy[1:] - qy[:-1]
    n_edge = len(dx)
    real = np.ones(n_edge, dtype=bool)
    tails = ring_end - 1
    real[tails[(tails >= 0) & (tails < n_edge)]] = False
    erow = np.repeat(np.arange(len(batch)), nv_row)[:-1] if len(qx) else \
        np.empty(0, np.int64)
    # an edge whose endpoints straddle two buildings is already a
    # ring tail (last ring of a building ends at the building end)
    nb = len(batch)
    n_edges = np.bincount(erow, weights=real, minlength=nb).astype(np.int64)
    manh = np.bincount(
        erow, weights=(np.abs(dx) + np.abs(dy)) * real, minlength=nb
    ).astype(np.int64)
    len2 = np.where(real, dx * dx + dy * dy, np.int64(-1))
    estart = np.minimum(vstart_row, max(n_edge - 1, 0))
    runmax = np.maximum.reduceat(len2, estart) if n_edge else np.full(nb, -1)
    runmax = np.where(n_edges > 0, runmax, -1)
    # first edge index attaining the run max (global order = (ring, vi))
    cand = np.where(
        (len2 == runmax[erow]) & real, np.arange(n_edge), n_edge
    )
    argmax = np.minimum.reduceat(cand, estart) if n_edge else np.full(nb, 0)
    keep = n_edges > 0
    am = np.minimum(argmax[keep], n_edge - 1)
    oct_ = (
        (dy[am] < 0).astype(np.int64) * 4
        + (dx[am] < 0).astype(np.int64) * 2
        + (np.abs(dy[am]) > np.abs(dx[am])).astype(np.int64)
    )
    out = {
        "osm_id": pa.array(oid[keep]),
        "n_edges": pa.array(n_edges[keep]),
        "manh_perim_mm": pa.array(manh[keep]),
        "max_edge_len2": pa.array(runmax[keep]),
        "max_edge_oct": pa.array(oct_),
    }
    if with_tile:
        cx = batch.column("centroid_x").to_numpy(zero_copy_only=False)[keep]
        cy = batch.column("centroid_y").to_numpy(zero_copy_only=False)[keep]
        out["tile_x"] = pa.array(
            np.floor((cx + WORLD_HALF) / TILE_SIZE_Z16).astype(np.int64)
        )
        out["tile_y"] = pa.array(
            np.floor((WORLD_HALF - cy) / TILE_SIZE_Z16).astype(np.int64)
        )
    return pa.table(out)



def q_tile_height_p90(sf_dir: str) -> "ray.data.Dataset":
    """Exact per-tile 90th-percentile building height, computed as a
    DISTRIBUTED counting quantile: heights quantize to decimeters (the
    bounded domain makes the exact quantile a cumulative-count scan, no
    sort of raw values), per-batch (tile, dm) partials collapse before
    the one keyed exchange, and each tile's p90 is the smallest dm whose
    cumulative count reaches ceil(0.9·n) — pure integers end to end
    (``10·cum ≥ 9·n`` ⇔ ``cum ≥ ceil(0.9·n)``).

    The per-key quantile pattern at cell cardinality: groupby-free,
    scales with occupied tiles, never holds a tile's raw heights.

    Output: (tile_x, tile_y, n_heights, p90_dm)."""
    from .partition import map_key_partitions, run_starts, sum_by_key

    def partial(batch: pa.Table) -> pa.Table:
        cx = batch.column("centroid_x").to_numpy(zero_copy_only=False)
        cy = batch.column("centroid_y").to_numpy(zero_copy_only=False)
        h = batch.column("height").to_numpy(zero_copy_only=False)
        ok = np.isfinite(cx) & np.isfinite(cy) & np.isfinite(h)
        cx, cy, h = cx[ok], cy[ok], h[ok]
        tx = np.floor((cx + WORLD_HALF) / TILE_SIZE_Z16).astype(np.int64)
        ty = np.floor((WORLD_HALF - cy) / TILE_SIZE_Z16).astype(np.int64)
        hdm = np.floor(h * 10 + 0.5).astype(np.int64)
        key = (tx * np.int64(1 << 20) + ty) * np.int64(1 << 21) + hdm
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "tile_x": pa.array(uk // np.int64(1 << 41)),
                "tile_y": pa.array((uk >> np.int64(21)) % np.int64(1 << 20)),
                "hdm": pa.array(uk % np.int64(1 << 21)),
                "p_cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    counts = sum_by_key(
        parsed_ds(sf_dir)
        .select_columns(["centroid_x", "centroid_y", "height"])
        .map_batches(partial, batch_format="pyarrow"),
        ["tile_x", "tile_y", "hdm"],
        {"p_cnt": "cnt"},
    )

    def pick(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "tile_x": pa.array([], type=pa.int64()),
                "tile_y": pa.array([], type=pa.int64()),
                "n_heights": pa.array([], type=pa.int64()),
                "p90_dm": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        tx = tbl.column("tile_x").to_numpy(zero_copy_only=False)
        ty = tbl.column("tile_y").to_numpy(zero_copy_only=False)
        dm = tbl.column("hdm").to_numpy(zero_copy_only=False)
        c = tbl.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((dm, ty, tx))
        tx, ty, dm, c = tx[order], ty[order], dm[order], c[order]
        idx = np.flatnonzero(run_starts(tx, ty))
        run_len = np.diff(np.append(idx, len(tx)))
        run_id = np.repeat(np.arange(len(idx)), run_len)
        csum = np.cumsum(c)
        base = np.repeat(csum[idx] - c[idx], run_len)
        cum = csum - base
        n = np.repeat(np.add.reduceat(c, idx), run_len)
        hit = 10 * cum >= 9 * n
        first_hit = np.where(hit, np.arange(len(tx)), len(tx))
        sel = np.minimum.reduceat(first_hit, idx)
        return pa.table(
            {
                "tile_x": pa.array(tx[idx]),
                "tile_y": pa.array(ty[idx]),
                "n_heights": pa.array(np.add.reduceat(c, idx)),
                "p90_dm": pa.array(dm[sel]),
            }
        )

    return map_key_partitions(counts, ["tile_x", "tile_y"], pick)


def q_tile_orientation(sf_dir: str) -> "ray.data.Dataset":
    """Per-tile modal footprint orientation: the most common longest-edge
    direction class (edge_stats_batch's integer octant) among the tile's
    buildings — the building-alignment statistic cartographic
    generalization keys on (a tile whose buildings share a bearing gets
    grid-aligned simplification).  Ties break to the lowest octant.

    Scale shape: orientation octants come from the same no-shuffle edge
    kernel as q_edge_stats (composition, not recompute-from-scratch
    SQL), per-batch (tile, oct) partials collapse to ≤ 8 rows per
    occupied tile before the ONE keyed exchange, and the modal pick is a
    sorted segment scan per tile run — the q_tile_height_p90 pattern at
    a bounded (8-value) domain.

    Output: (tile_x, tile_y, n_oriented, modal_oct, modal_cnt)."""
    from .partition import map_key_partitions, run_starts, sum_by_key

    def partial(batch: pa.Table) -> pa.Table:
        tx = batch.column("tile_x").to_numpy(zero_copy_only=False)
        ty = batch.column("tile_y").to_numpy(zero_copy_only=False)
        oc = batch.column("max_edge_oct").to_numpy(zero_copy_only=False)
        key = (tx * np.int64(1 << 20) + ty) * np.int64(8) + oc
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "tile_x": pa.array(uk // np.int64(8 << 20)),
                "tile_y": pa.array((uk >> np.int64(3)) % np.int64(1 << 20)),
                "oct": pa.array(uk % np.int64(8)),
                "p_cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    counts = sum_by_key(
        parsed_ds(sf_dir)
        .select_columns(
            ["osm_id", "coords", "ring_offsets", "centroid_x", "centroid_y"]
        )
        .map_batches(edge_stats_batch, batch_format="pyarrow")
        .select_columns(["tile_x", "tile_y", "max_edge_oct"])
        .map_batches(partial, batch_format="pyarrow"),
        ["tile_x", "tile_y", "oct"],
        {"p_cnt": "cnt"},
    )

    def modal(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "tile_x": pa.array([], type=pa.int64()),
                "tile_y": pa.array([], type=pa.int64()),
                "n_oriented": pa.array([], type=pa.int64()),
                "modal_oct": pa.array([], type=pa.int64()),
                "modal_cnt": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        tx = tbl.column("tile_x").to_numpy(zero_copy_only=False)
        ty = tbl.column("tile_y").to_numpy(zero_copy_only=False)
        oc = tbl.column("oct").to_numpy(zero_copy_only=False)
        c = tbl.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        # sort each tile's octants by (-count, oct): first row of the run
        # is the mode with the lowest-octant tie rule
        order = np.lexsort((oc, -c, ty, tx))
        tx, ty, oc, c = tx[order], ty[order], oc[order], c[order]
        idx = np.flatnonzero(run_starts(tx, ty))
        n = np.add.reduceat(c, idx)
        return pa.table(
            {
                "tile_x": pa.array(tx[idx]),
                "tile_y": pa.array(ty[idx]),
                "n_oriented": pa.array(n),
                "modal_oct": pa.array(oc[idx]),
                "modal_cnt": pa.array(c[idx]),
            }
        )

    return map_key_partitions(counts, ["tile_x", "tile_y"], modal)


def q_radius_count(sf_dir: str, num_partitions: int = 64) -> "ray.data.Dataset":
    """Exact windowed density: for EVERY building, the count of other
    buildings whose centroid lies within 100 m (Euclidean, exact int64
    mm² comparison — isolated buildings emit 0, unlike q_nn_within's
    inner-join drop).  The density feature LOD budgeting and urban-core
    detection key on.

    Scale shape: identical to q_nn_within — 9× fixed-size candidate
    replication on the 150 m integer grid (one cell ring strictly
    contains the 100 m ball), ONE cell-keyed exchange, vectorized h×k
    pairing per cell run, zero-count homes recovered from the home flag
    without any second pass or join.

    Output: (osm_id, n_within_100m)."""
    from .partition import map_key_partitions, run_starts

    R2 = np.int64(100_000) ** 2  # 100 m in quantized mm, squared
    PACK = np.int64(1) << 20
    offs = np.array(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], dtype=np.int64
    )

    def cover(batch: pa.Table) -> pa.Table:
        oid = batch.column("osm_id").to_numpy(zero_copy_only=False)
        cx = batch.column("centroid_x").to_numpy(zero_copy_only=False)
        cy = batch.column("centroid_y").to_numpy(zero_copy_only=False)
        qx = np.floor(cx * 1000 + 0.5).astype(np.int64) + NN_OFF_MM
        qy = np.floor(cy * 1000 + 0.5).astype(np.int64) + NN_OFF_MM
        cellx = qx // NN_CELL_MM
        celly = qy // NN_CELL_MM
        n = len(oid)
        rep = np.repeat(np.arange(n), len(offs))
        dx = np.tile(offs[:, 0], n)
        dy = np.tile(offs[:, 1], n)
        return pa.table(
            {
                "cell": pa.array((cellx[rep] + dx) * PACK + (celly[rep] + dy)),
                "osm_id": pa.array(oid[rep]),
                "qx": pa.array(qx[rep]),
                "qy": pa.array(qy[rep]),
                "home": pa.array(((dx == 0) & (dy == 0)).astype(np.int8)),
            }
        )

    def count_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "osm_id": pa.array([], type=pa.int64()),
                "n_within_100m": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        cell = tbl.column("cell").to_numpy(zero_copy_only=False)
        osm = tbl.column("osm_id").to_numpy(zero_copy_only=False)
        qx = tbl.column("qx").to_numpy(zero_copy_only=False)
        qy = tbl.column("qy").to_numpy(zero_copy_only=False)
        home = tbl.column("home").to_numpy(zero_copy_only=False)
        order = np.lexsort((osm, -home.astype(np.int64), cell))
        cell, osm, qx, qy, home = (
            a[order] for a in (cell, osm, qx, qy, home)
        )
        starts = np.flatnonzero(run_starts(cell))
        k = np.diff(np.append(starts, len(cell)))
        h = np.add.reduceat(home.astype(np.int64), starts)
        hk = h * k
        tot = int(hk.sum())
        counts = np.zeros(len(cell), dtype=np.int64)
        if tot:
            run_of_pair = np.repeat(np.arange(len(k)), hk)
            pos = np.arange(tot) - np.repeat(np.cumsum(hk) - hk, hk)
            kk = k[run_of_pair]
            ia = np.repeat(starts, hk) + pos // kk
            ib = np.repeat(starts, hk) + pos % kk
            hit = (osm[ia] != osm[ib]) & (
                (qx[ia] - qx[ib]) ** 2 + (qy[ia] - qy[ib]) ** 2 <= R2
            )
            counts = np.bincount(
                ia[hit], minlength=len(cell)
            ).astype(np.int64)
        mine = home == 1
        return pa.table(
            {
                "osm_id": pa.array(osm[mine]),
                "n_within_100m": pa.array(counts[mine]),
            }
        )

    covered = (
        parsed_ds(sf_dir)
        .select_columns(["osm_id", "centroid_x", "centroid_y"])
        .map_batches(cover, batch_format="pyarrow")
    )
    return map_key_partitions(covered, ["cell"], count_part, num_partitions)


def q_rasterize(sf_dir: str) -> "ray.data.Dataset":
    """Vector→raster: burn every building's z16 bbox cover onto the tile
    grid and roll up per cell — count, max and total decimeter height
    (the write-side counterpart of q_dem_zonal's raster→vector read; the
    reference's per-tile feature batching is the n=1-cell special case,
    /root/reference/generate-tileset.ts:37-65).

    Scale shape: replicate rows by their bbox cover (bounded by footprint
    size / cell size, never by corpus size), collapse to per-batch cell
    partials (packed-key bincount + maximum.at), then ONE bounded groupby
    over occupied cells.

    Output: (cell_x, cell_y, n_buildings, max_height_dm, sum_height_dm)."""

    def burn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "cell_x": pa.array([], type=pa.int32()),
                    "cell_y": pa.array([], type=pa.int32()),
                    "p_n": pa.array([], type=pa.int64()),
                    "p_maxh": pa.array([], type=pa.int64()),
                    "p_sumh": pa.array([], type=pa.int64()),
                }
            )
        minx = batch.column("minx").to_numpy(zero_copy_only=False)
        miny = batch.column("miny").to_numpy(zero_copy_only=False)
        maxx = batch.column("maxx").to_numpy(zero_copy_only=False)
        maxy = batch.column("maxy").to_numpy(zero_copy_only=False)
        h = batch.column("height").to_numpy(zero_copy_only=False)
        hdm = np.where(np.isfinite(h), np.floor(h * 10 + 0.5), 0.0).astype(np.int64)
        tx0 = np.floor((minx + WORLD_HALF) / TILE_SIZE_Z16).astype(np.int64)
        ty0 = np.floor((WORLD_HALF - maxy) / TILE_SIZE_Z16).astype(np.int64)
        tx1 = np.floor((maxx + WORLD_HALF) / TILE_SIZE_Z16).astype(np.int64)
        ty1 = np.floor((WORLD_HALF - miny) / TILE_SIZE_Z16).astype(np.int64)
        w = tx1 - tx0 + 1
        reps = w * (ty1 - ty0 + 1)
        row = np.repeat(np.arange(len(reps)), reps)
        k = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(reps[:-1])]).astype(np.int64), reps
        )
        cx = tx0[row] + k % w[row]
        cy = ty0[row] + k // w[row]
        key = cx * np.int64(1 << 20) + cy
        uk, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        sh = np.bincount(inv, weights=hdm[row], minlength=len(uk)).astype(np.int64)
        mh = np.zeros(len(uk), dtype=np.int64)
        np.maximum.at(mh, inv, hdm[row])
        return pa.table(
            {
                "cell_x": pa.array((uk // (1 << 20)).astype(np.int32)),
                "cell_y": pa.array((uk % (1 << 20)).astype(np.int32)),
                "p_n": pa.array(n),
                "p_maxh": pa.array(mh),
                "p_sumh": pa.array(sh),
            }
        )

    from .partition import reduce_by_key

    return reduce_by_key(
        parsed_ds(sf_dir)
        .select_columns(["minx", "miny", "maxx", "maxy", "height"])
        .map_batches(burn, batch_format="pyarrow"),
        ["cell_x", "cell_y"],
        [
            ("p_n", "sum", "n_buildings"),
            ("p_maxh", "max", "max_height_dm"),
            ("p_sumh", "sum", "sum_height_dm"),
        ],
    )


def q_media_dispersion(sf_dir: str) -> "ray.data.Dataset":
    """Per-texture spatial dispersion (the interleaved×geo cross read the
    other way from q_media_density): for every atlas texture, how many
    spans use it, across how many distinct z16 tiles, the tile bbox of
    its usage, and the integer-exact millimeter centroid mass (texture
    inventory: /root/reference/src/textures/building_textures.ts:103-209).

    Scale shape: per-batch (ref, tile) partials → one bounded groupby
    (refs × occupied tiles) → a second tiny rollup keyed by ref alone;
    distinct-tile counting is exact because stage one already collapsed
    to one row per (ref, tile).

    Output: (media_ref, n_spans, n_tiles, min_tx, max_tx, min_ty, max_ty,
    sum_cx_mm, sum_cy_mm)."""
    import pyarrow.compute as pc

    def partials(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        cx = batch.column("centroid_x").to_numpy(zero_copy_only=False)
        cy = batch.column("centroid_y").to_numpy(zero_copy_only=False)
        refs = batch.column("media_refs")
        if isinstance(refs, pa.ChunkedArray):
            refs = refs.combine_chunks()
        counts = np.diff(np.asarray(refs.offsets))
        row = np.repeat(np.arange(len(batch)), counts)
        tx = np.floor((cx + WORLD_HALF) / TILE_SIZE_Z16).astype(np.int64)[row]
        ty = np.floor((WORLD_HALF - cy) / TILE_SIZE_Z16).astype(np.int64)[row]
        qcx = np.floor(cx * 1000.0 + 0.5).astype(np.int64)[row]
        qcy = np.floor(cy * 1000.0 + 0.5).astype(np.int64)[row]
        flat = refs.values.dictionary_encode()
        code = np.asarray(flat.indices, dtype=np.int64)
        key = (code * np.int64(1 << 20) + tx) * np.int64(1 << 20) + ty
        uk, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "media_ref": flat.dictionary.take(
                    pa.array((uk // np.int64(1 << 40)).astype(np.int64))
                ),
                "tile_x": pa.array(
                    ((uk // np.int64(1 << 20)) % np.int64(1 << 20)).astype(np.int32)
                ),
                "tile_y": pa.array((uk % np.int64(1 << 20)).astype(np.int32)),
                "p_n": pa.array(np.bincount(inv, minlength=len(uk)).astype(np.int64)),
                "p_scx": pa.array(
                    np.bincount(inv, weights=qcx, minlength=len(uk)).astype(np.int64)
                ),
                "p_scy": pa.array(
                    np.bincount(inv, weights=qcy, minlength=len(uk)).astype(np.int64)
                ),
            }
        )

    from .partition import sum_by_key

    per_tile = sum_by_key(
        parsed_ds(sf_dir)
        .select_columns(["centroid_x", "centroid_y", "media_refs"])
        .map_batches(partials, batch_format="pyarrow"),
        ["media_ref", "tile_x", "tile_y"],
        {"p_n": "n", "p_scx": "scx", "p_scy": "scy"},
    )
    rolled = per_tile.groupby("media_ref").aggregate(
        ray.data.aggregate.Sum("n", alias_name="n_spans"),
        ray.data.aggregate.Count(alias_name="n_tiles"),
        ray.data.aggregate.Min("tile_x", alias_name="min_tx"),
        ray.data.aggregate.Max("tile_x", alias_name="max_tx"),
        ray.data.aggregate.Min("tile_y", alias_name="min_ty"),
        ray.data.aggregate.Max("tile_y", alias_name="max_ty"),
        ray.data.aggregate.Sum("scx", alias_name="sum_cx_mm"),
        ray.data.aggregate.Sum("scy", alias_name="sum_cy_mm"),
    )

    def cast(t: pa.Table) -> pa.Table:
        return t.cast(
            pa.schema(
                [
                    ("media_ref", pa.string()),
                    ("n_spans", pa.int64()),
                    ("n_tiles", pa.int64()),
                    ("min_tx", pa.int32()),
                    ("max_tx", pa.int32()),
                    ("min_ty", pa.int32()),
                    ("max_ty", pa.int32()),
                    ("sum_cx_mm", pa.int64()),
                    ("sum_cy_mm", pa.int64()),
                ]
            )
        )

    return rolled.map_batches(cast, batch_format="pyarrow")


def q_hex_smooth(sf_dir: str, size: float = 1000.0) -> "ray.data.Dataset":
    """Neighborhood aggregate on the hexagonal index (q_hexbin's grid):
    per OCCUPIED hex, its own count plus the building count over the
    7-cell neighborhood (self + 6 axial neighbors) — the hex-topology
    analog of the quadtree q_tile_smooth stencil.

    Scale shape: replicate-7 over the bounded hex table (already ≤
    occupied-hex count, never corpus rows) → ONE groupby; occupied
    filtering rides the own-count aggregate, so no second pass.

    Output: (hex_q, hex_r, n_local, n_hood)."""
    import pyarrow.compute as pc

    NEIGH = np.array(
        [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)],
        dtype=np.int64,
    )

    def replicate(batch: pa.Table) -> pa.Table:
        q = batch.column("hex_q").to_numpy(zero_copy_only=False)
        r = batch.column("hex_r").to_numpy(zero_copy_only=False)
        n = batch.column("n_buildings").to_numpy(zero_copy_only=False)
        m = len(q)
        tq = (q[None, :] + NEIGH[:, 0:1]).ravel()
        tr = (r[None, :] + NEIGH[:, 1:2]).ravel()
        hood = np.tile(n, len(NEIGH))
        own = np.concatenate([n, np.zeros((len(NEIGH) - 1) * m, dtype=n.dtype)])
        return pa.table(
            {
                "hex_q": pa.array(tq),
                "hex_r": pa.array(tr),
                "p_own": pa.array(own),
                "p_hood": pa.array(hood),
            }
        )

    from .partition import sum_by_key

    smoothed = sum_by_key(
        q_hexbin(sf_dir, size=size)
        .drop_columns(["sum_height_dm"])
        .map_batches(replicate, batch_format="pyarrow"),
        ["hex_q", "hex_r"],
        {"p_own": "n_local", "p_hood": "n_hood"},
    )

    def occupied(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("n_local"), 0))

    return smoothed.map_batches(occupied, batch_format="pyarrow")


def q_text_density(sf_dir: str) -> "ray.data.Dataset":
    """Text mass per z16 map tile (the text×geo cross next to
    q_media_density's media×geo): per tile, the document count, total
    text-span characters and tag-span count of the buildings whose
    centroid lands there — the per-tile corpus weight a geo-stratified
    text sampler would draw against.

    Scale shape: spans never leave the parse task (char counts fold to
    per-doc scalars inside the batch); per-batch tile partials → ONE
    bounded groupby over occupied tiles.

    Output: (tile_x, tile_y, n_docs, text_chars, n_tags)."""
    import pyarrow.compute as pc

    def partials(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        n = len(batch)
        cx = batch.column("centroid_x").to_numpy(zero_copy_only=False)
        cy = batch.column("centroid_y").to_numpy(zero_copy_only=False)
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        values = spans.values
        counts = np.diff(np.asarray(spans.offsets))
        row = np.repeat(np.arange(n, dtype=np.int64), counts)
        kind = values.field("kind")
        is_text = pc.equal(kind, "text").to_numpy(zero_copy_only=False)
        is_tag = pc.equal(kind, "tag").to_numpy(zero_copy_only=False)
        tlen = pc.utf8_length(values.field("text")).to_numpy(zero_copy_only=False)
        chars = np.bincount(row[is_text], weights=tlen[is_text], minlength=n)
        tags = np.bincount(row[is_tag], minlength=n).astype(np.int64)
        tx = np.floor((cx + WORLD_HALF) / TILE_SIZE_Z16).astype(np.int64)
        ty = np.floor((WORLD_HALF - cy) / TILE_SIZE_Z16).astype(np.int64)
        key = tx * np.int64(1 << 20) + ty
        uk, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "tile_x": pa.array((uk // (1 << 20)).astype(np.int32)),
                "tile_y": pa.array((uk % (1 << 20)).astype(np.int32)),
                "p_docs": pa.array(np.bincount(inv, minlength=len(uk)).astype(np.int64)),
                "p_chars": pa.array(
                    np.bincount(inv, weights=chars, minlength=len(uk)).astype(np.int64)
                ),
                "p_tags": pa.array(
                    np.bincount(inv, weights=tags, minlength=len(uk)).astype(np.int64)
                ),
            }
        )

    from .partition import sum_by_key

    return sum_by_key(
        parsed_ds(sf_dir, keep_spans=True)
        .select_columns(["centroid_x", "centroid_y", "spans"])
        .map_batches(partials, batch_format="pyarrow"),
        ["tile_x", "tile_y"],
        {"p_docs": "n_docs", "p_chars": "text_chars", "p_tags": "n_tags"},
    )


def q_idw(sf_dir: str, radius_cells: int = 2) -> "ray.data.Dataset":
    """Integer-exact inverse-distance-weighted interpolation of building
    heights onto the z16 cell grid (points→raster, completing the
    raster↔vector axis next to q_dem_sample's raster→points read): every
    centroid contributes to the (2r+1)² cell block around it with weight
    ``10^13 // max(d², 10^6)`` — distances in exact quantized
    millimeters, so weights, weighted sums and the final ``//`` quotient
    are identical integers on both engines; no float ever crosses the
    oracle boundary.

    Scale shape: bounded 25× replicate per point, per-batch cell partials
    (unique + add.at on int64 — bincount's float64 weights would lose
    exactness past 2^53), ONE bounded groupby over touched cells.

    Output: (cell_x, cell_y, sum_w, sum_wh, idw_e3)."""
    r = radius_cells
    NUM = np.int64(10**13)
    DMIN = np.int64(10**6)

    def contribute(batch: pa.Table) -> pa.Table:
        cx = batch.column("centroid_x").to_numpy(zero_copy_only=False)
        cy = batch.column("centroid_y").to_numpy(zero_copy_only=False)
        h = batch.column("height").to_numpy(zero_copy_only=False)
        ok = np.isfinite(cx) & np.isfinite(cy)
        cx, cy, h = cx[ok], cy[ok], h[ok]
        hdm = np.where(np.isfinite(h), np.floor(h * 10 + 0.5), 0.0).astype(np.int64)
        tx = np.floor((cx + WORLD_HALF) / TILE_SIZE_Z16).astype(np.int64)
        ty = np.floor((WORLD_HALF - cy) / TILE_SIZE_Z16).astype(np.int64)
        qpx = np.floor(cx * 1000.0 + 0.5).astype(np.int64)
        qpy = np.floor(cy * 1000.0 + 0.5).astype(np.int64)
        offs = np.arange(-r, r + 1, dtype=np.int64)
        dx = np.repeat(offs, 2 * r + 1)  # 25 block offsets
        dy = np.tile(offs, 2 * r + 1)
        n = len(cx)
        cell_x = (tx[:, None] + dx[None, :]).ravel()
        cell_y = (ty[:, None] + dy[None, :]).ravel()
        # quantized-mm cell centers: identical double expression in SQL
        qccx = np.floor(
            ((cell_x + 0.5) * TILE_SIZE_Z16 - WORLD_HALF) * 1000.0 + 0.5
        ).astype(np.int64)
        qccy = np.floor(
            (WORLD_HALF - (cell_y + 0.5) * TILE_SIZE_Z16) * 1000.0 + 0.5
        ).astype(np.int64)
        px = np.repeat(qpx, (2 * r + 1) ** 2)
        py = np.repeat(qpy, (2 * r + 1) ** 2)
        d2 = (px - qccx) ** 2 + (py - qccy) ** 2
        w = NUM // np.maximum(d2, DMIN)
        wh = w * np.repeat(hdm, (2 * r + 1) ** 2)
        key = cell_x * np.int64(1 << 20) + cell_y
        uk, inv = np.unique(key, return_inverse=True)
        sw = np.zeros(len(uk), dtype=np.int64)
        swh = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sw, inv, w)
        np.add.at(swh, inv, wh)
        return pa.table(
            {
                "cell_x": pa.array((uk // (1 << 20)).astype(np.int32)),
                "cell_y": pa.array((uk % (1 << 20)).astype(np.int32)),
                "p_sw": pa.array(sw),
                "p_swh": pa.array(swh),
            }
        )

    def finish(t: pa.Table) -> pa.Table:
        sw = t.column("sum_w").to_numpy(zero_copy_only=False)
        swh = t.column("sum_wh").to_numpy(zero_copy_only=False)
        idw = (swh * np.int64(1000)) // np.maximum(sw, 1)
        return t.append_column("idw_e3", pa.array(idw))

    from .partition import sum_by_key

    partials = (
        parsed_ds(sf_dir)
        .select_columns(["centroid_x", "centroid_y", "height"])
        .map_batches(contribute, batch_format="pyarrow")
    )
    merged = sum_by_key(
        partials,
        ["cell_x", "cell_y"],
        {"p_sw": "sum_w", "p_swh": "sum_wh"},
    )
    return merged.map_batches(finish, batch_format="pyarrow")

def _component_nodes(b: pa.Table) -> pa.Table:
    """(tile_x, tile_y, …) → packed CC node rows (node = tx<<20 | ty)."""
    tx = b.column("tile_x").to_numpy(zero_copy_only=False).astype(np.int64)
    ty = b.column("tile_y").to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "tx": pa.array(tx),
            "ty": pa.array(ty),
            "node": pa.array(tx * np.int64(1 << 20) + ty),
        }
    )


def _edge_dedup_sorted(u: np.ndarray, v: np.ndarray):
    """Lexsort + boundary mask dedup of (u, v) pairs (NEVER pack into one
    int64 — node ids reach 2^36, a packed key overflows and collides)."""
    order = np.lexsort((v, u))
    us, vs = u[order], v[order]
    keep = np.ones(len(us), dtype=bool)
    keep[1:] = (us[1:] != us[:-1]) | (vs[1:] != vs[:-1])
    return us[keep], vs[keep]


def q_tile_components(sf_dir: str, max_rounds: int = 24) -> "ray.data.Dataset":
    """Connected components over the occupied z16 tile grid
    (4-connectivity) — raster region labeling, the spatial sibling of
    textops.dedup_clusters' affix clustering: every occupied tile gets
    the minimum packed tile-id of its contiguous urban blob.

    Algorithm: alternating LARGE-STAR / SMALL-STAR edge rewriting
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — O(log n) rounds, vs O(diameter) for plain neighbor-min
    label propagation (this corpus's largest blob spans ~8k tiles with
    diameter ~190: measured 10 star rounds vs 98 propagation rounds).
    Each half-round is ONE hash exchange keyed by the star center
    (``map_key_partitions``) + a sorted segment-min and vectorized edge
    emission per partition; per-center dedup rides the same exchange, so
    the edge multiset stays O(occupied-tile adjacency) throughout.

    Not SQL-expressible at this corpus's shape (a transitive-closure
    recursive CTE materializes ~n² reachability pairs for the giant
    blob), so the driver records a rows-only check; the exact oracle is
    a pytest BFS at sf0.001 and sf0.01 (tests/test_round4c_ops.py).

    Scale shape: the iteration state is the bounded occupied-tile edge
    list (≈2 edges/tile), never corpus rows; both star ops are
    exchange + segment passes with no per-key dispatch; convergence is
    detected from (count, checksum) of the edge multiset — monotone
    under star rewriting, so equality means fixed point.

    Output: (tile_x, tile_y, component_id) — component_id is the packed
    (tile_x << 20 | tile_y) id of the component's minimum tile."""
    from .partition import map_key_partitions, run_starts

    PACK = np.int64(1 << 20)

    nodes = (
        tile_counts_ds(sf_dir)
        .map_batches(_component_nodes, batch_format="pyarrow")
        .repartition(32)
        .materialize()
    )
    # block-count hygiene: every exchange below sorts its input, and Ray's
    # sort cost scales with input block count (196-block unions measured
    # 5x slower than 32-block for the same 13k rows) — cap blocks at each
    # materialization point

    def seed_edges(b: pa.Table) -> pa.Table:
        # candidate east/south edges keyed by the NEIGHBOR id, plus one
        # presence row per occupied node; the cull keeps a candidate only
        # when its key-run contains a presence row (neighbor occupied)
        node = b.column("node").to_numpy(zero_copy_only=False)
        tx = b.column("tx").to_numpy(zero_copy_only=False)
        ty = b.column("ty").to_numpy(zero_copy_only=False)
        east = (tx + 1) * PACK + ty
        south = tx * PACK + (ty + 1)
        n = len(node)
        return pa.table(
            {
                "k": pa.array(np.concatenate([east, south, node])),
                "u": pa.array(np.concatenate([node, node, node])),
                "v": pa.array(np.concatenate([east, south, node])),
                "real": pa.array(
                    np.concatenate(
                        [np.zeros(2 * n, dtype=np.int8), np.ones(n, dtype=np.int8)]
                    )
                ),
            }
        )

    def cull_phantoms(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {"u": pa.array([], type=pa.int64()), "v": pa.array([], type=pa.int64())}
        )
        if len(tbl) == 0:
            return empty
        k = tbl.column("k").to_numpy(zero_copy_only=False)
        u = tbl.column("u").to_numpy(zero_copy_only=False)
        v = tbl.column("v").to_numpy(zero_copy_only=False)
        real = tbl.column("real").to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks, us, vs, rs = k[order], u[order], v[order], real[order]
        starts = run_starts(ks)
        idx = np.flatnonzero(starts)
        occupied = np.maximum.reduceat(rs, idx) == 1
        run_id = np.cumsum(starts) - 1
        keep = occupied[run_id] & (rs == 0)
        return pa.table({"u": pa.array(us[keep]), "v": pa.array(vs[keep])})

    def symmetrize(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c": pa.array(np.concatenate([u, v])),
                "n": pa.array(np.concatenate([v, u])),
            }
        )

    def large_star_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {"u": pa.array([], type=pa.int64()), "v": pa.array([], type=pa.int64())}
        )
        if len(tbl) == 0:
            return empty
        c = tbl.column("c").to_numpy(zero_copy_only=False)
        n = tbl.column("n").to_numpy(zero_copy_only=False)
        cs, ns = _edge_dedup_sorted(c, n)
        starts = run_starts(cs)
        idx = np.flatnonzero(starts)
        run_id = np.cumsum(starts) - 1
        mins = np.minimum(np.minimum.reduceat(ns, idx), cs[idx])
        m = mins[run_id]
        big = ns > cs
        out_u, out_v = ns[big], m[big]
        ok = out_u != out_v
        return pa.table({"u": pa.array(out_u[ok]), "v": pa.array(out_v[ok])})

    def orient_hi(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c": pa.array(np.maximum(u, v)),
                "n": pa.array(np.minimum(u, v)),
            }
        )

    def small_star_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {"u": pa.array([], type=pa.int64()), "v": pa.array([], type=pa.int64())}
        )
        if len(tbl) == 0:
            return empty
        c = tbl.column("c").to_numpy(zero_copy_only=False)
        n = tbl.column("n").to_numpy(zero_copy_only=False)
        cs, ns = _edge_dedup_sorted(c, n)
        starts = run_starts(cs)
        idx = np.flatnonzero(starts)
        run_id = np.cumsum(starts) - 1
        mins = np.minimum(np.minimum.reduceat(ns, idx), cs[idx])
        m = mins[run_id]
        out_u = np.concatenate([ns, cs[idx]])
        out_v = np.concatenate([m, mins])
        ok = out_u != out_v
        ou, ov = _edge_dedup_sorted(out_u[ok], out_v[ok])
        return pa.table({"u": pa.array(ou), "v": pa.array(ov)})

    edges = (
        map_key_partitions(
            nodes.map_batches(seed_edges, batch_format="pyarrow"),
            ["k"],
            cull_phantoms,
        )
        .repartition(32)
        .materialize()
    )

    # ---- phase 1: block-local exact CC -----------------------------------
    # One exchange keyed by the z8 block (256×256 z16 tiles) of the edge's
    # endpoints; inside a partition every edge is block-internal, so an
    # in-memory min-propagation with full pointer compression labels the
    # local subgraphs exactly.  The giant urban blob collapses to one local
    # root per block it touches, so phase 2's quotient graph is bounded by
    # BLOCK-BOUNDARY density, not tile count.
    BLOCK = np.int64(1 << 8)

    def block_of(tx: np.ndarray, ty: np.ndarray) -> np.ndarray:
        return (tx // BLOCK) * np.int64(1 << 8) + (ty // BLOCK)

    def local_rows(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        bu = block_of(u // PACK, u % PACK)
        bv = block_of(v // PACK, v % PACK)
        internal = bu == bv
        return pa.table(
            {
                "bkey": pa.array(bu[internal]),
                "a": pa.array(u[internal]),
                "b": pa.array(v[internal]),
            }
        )

    def node_presence(b: pa.Table) -> pa.Table:
        node = b.column("node").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkey": pa.array(block_of(node // PACK, node % PACK)),
                "a": pa.array(node),
                "b": pa.array(node),
            }
        )

    def cross_rows(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        bu = block_of(u // PACK, u % PACK)
        bv = block_of(v // PACK, v % PACK)
        cross = bu != bv
        return pa.table({"u": pa.array(u[cross]), "v": pa.array(v[cross])})

    def local_cc(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "node": pa.array([], type=pa.int64()),
                "lroot": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        a = tbl.column("a").to_numpy(zero_copy_only=False)
        bb = tbl.column("b").to_numpy(zero_copy_only=False)
        ids = np.unique(np.concatenate([a, bb]))
        lab = np.arange(len(ids), dtype=np.int64)
        ui = np.searchsorted(ids, a)
        vi = np.searchsorted(ids, bb)
        # min over edges + full pointer compression each sweep: the inner
        # new[new] loop doubles pointer depth, so sweeps are O(log diam)
        while True:
            new = lab.copy()
            np.minimum.at(new, ui, lab[vi])
            np.minimum.at(new, vi, lab[ui])
            while True:
                nn = new[new]
                if np.array_equal(nn, new):
                    break
                new = nn
            if np.array_equal(new, lab):
                break
            lab = new
        return pa.table({"node": pa.array(ids), "lroot": pa.array(ids[lab])})

    internal = edges.map_batches(local_rows, batch_format="pyarrow").union(
        nodes.map_batches(node_presence, batch_format="pyarrow")
    )
    mapping = (
        map_key_partitions(internal, ["bkey"], local_cc)
        .repartition(32)
        .materialize()
    )
    cross = (
        edges.map_batches(cross_rows, batch_format="pyarrow")
        .repartition(8)
        .materialize()
    )

    # ---- phase 2: resolve crossing edges to (lroot_u, lroot_v) ----------
    # two tag-union hash joins against the bounded node→lroot mapping
    def _provider_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b.column("node"),
                "val": b.column("lroot"),
                "other": pa.array(
                    np.full(len(b), -1, dtype=np.int64)
                ),
            }
        )

    def _consumer_rows(key_col: str, other_col: str):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "key": b.column(key_col),
                    "val": pa.array(np.full(len(b), -1, dtype=np.int64)),
                    "other": b.column(other_col),
                }
            )

        return fn

    def _join_apply(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "u": pa.array([], type=pa.int64()),
                "v": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        val = tbl.column("val").to_numpy(zero_copy_only=False)
        oth = tbl.column("other").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        ks, vs, os_ = key[order], val[order], oth[order]
        starts = run_starts(ks)
        idx = np.flatnonzero(starts)
        prov = np.maximum.reduceat(vs, idx)
        run_id = np.cumsum(starts) - 1
        cons = os_ >= 0
        # (resolved root, carried other endpoint)
        return pa.table(
            {"u": pa.array(prov[run_id[cons]]), "v": pa.array(os_[cons])}
        )

    half = (
        map_key_partitions(
            mapping.map_batches(_provider_rows, batch_format="pyarrow").union(
                cross.map_batches(_consumer_rows("u", "v"), batch_format="pyarrow")
            ),
            ["key"],
            _join_apply,
        )
        .repartition(8)
        .materialize()
    )
    # half = (lroot_u, v); resolve v the same way
    quotient = (
        map_key_partitions(
            mapping.map_batches(_provider_rows, batch_format="pyarrow").union(
                half.map_batches(_consumer_rows("v", "u"), batch_format="pyarrow")
            ),
            ["key"],
            _join_apply,
        )
        .repartition(8)
        .materialize()
    )

    # ---- phase 3: star rounds on the bounded quotient graph -------------
    import ray.data.aggregate as agg

    qedges = quotient
    prev = None
    converged = qedges.count() == 0  # no crossing edges: locals are global
    for _ in range(0 if converged else max_rounds):
        qedges = map_key_partitions(
            qedges.map_batches(symmetrize, batch_format="pyarrow"),
            ["c"],
            large_star_part,
        )
        qedges = (
            map_key_partitions(
                qedges.map_batches(orient_hi, batch_format="pyarrow"),
                ["c"],
                small_star_part,
            )
            .repartition(8)
            .materialize()
        )
        sig = tuple(
            qedges.aggregate(
                agg.Count(alias_name="n"),
                agg.Sum("u", alias_name="su"),
                agg.Sum("v", alias_name="sv"),
            ).values()
        )
        if sig == prev:
            converged = True
            break
        prev = sig
    if not converged:
        raise RuntimeError(
            f"q_tile_components: star rewriting did not converge in "
            f"{max_rounds} rounds"
        )

    # ---- phase 4: node → lroot → groot ------------------------------------
    def _root_consumers(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b.column("lroot"),
                "val": pa.array(np.full(len(b), -1, dtype=np.int64)),
                "other": b.column("node"),
            }
        )

    def _star_providers(b: pa.Table) -> pa.Table:
        # star edges point member → root; a local root with no star edge is
        # its own global root, provided by the self rows below
        return pa.table(
            {
                "key": b.column("u"),
                "val": b.column("v"),
                "other": pa.array(np.full(len(b), -1, dtype=np.int64)),
            }
        )

    def _self_providers(b: pa.Table) -> pa.Table:
        lr = b.column("lroot").to_numpy(zero_copy_only=False)
        roots = np.unique(lr)
        return pa.table(
            {
                "key": pa.array(roots),
                "val": pa.array(roots),
                "other": pa.array(np.full(len(roots), -1, dtype=np.int64)),
            }
        )

    def _final_apply(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "tile_x": pa.array([], type=pa.int32()),
                "tile_y": pa.array([], type=pa.int32()),
                "component_id": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        val = tbl.column("val").to_numpy(zero_copy_only=False)
        oth = tbl.column("other").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        ks, vs, os_ = key[order], val[order], oth[order]
        starts = run_starts(ks)
        idx = np.flatnonzero(starts)
        # provider value per run: the MIN positive val (self-provider gives
        # the root id, a star edge gives the smaller global root)
        vmask = np.where(vs >= 0, vs, np.int64(1 << 62))
        prov = np.minimum.reduceat(vmask, idx)
        run_id = np.cumsum(starts) - 1
        cons = os_ >= 0
        node = os_[cons]
        groot = prov[run_id[cons]]
        return pa.table(
            {
                "tile_x": pa.array((node // PACK).astype(np.int32)),
                "tile_y": pa.array((node % PACK).astype(np.int32)),
                "component_id": pa.array(groot),
            }
        )

    final_union = (
        qedges.map_batches(_star_providers, batch_format="pyarrow")
        .union(mapping.map_batches(_self_providers, batch_format="pyarrow"))
        .union(mapping.map_batches(_root_consumers, batch_format="pyarrow"))
        .repartition(32)
    )
    return map_key_partitions(final_union, ["key"], _final_apply)


# --------------------------------------------------------------------------
# S2-analog spherical cells + implicit-tiling availability (session D)
# --------------------------------------------------------------------------

S2_CELL_LEVEL = 12
S2_COVER_LEVEL = 16


def q_s2_cells(sf_dir: str, level: int = S2_CELL_LEVEL) -> "ray.data.Dataset":
    """S2-analog cell id per building centroid: cube-face + quadratic-ST +
    Hilbert linearization (``geom/s2.py``) — the spherical companion to
    the z16 mercator grid the reference tiles by
    (``/root/reference/generate-tileset.ts:37-65``).  Unlike mercator
    tiles, these cells are near-equal-area at every latitude and the
    Hilbert id is seam-free, so a global fleet can range-partition shards
    by cell id directly.

    Zero exchange: one vectorized map over parsed batches (the Hilbert
    recurrence is ``level`` whole-array passes, no per-row Python).

    Output: (osm_id, s2_face, s2_i, s2_j, s2_cell)."""
    from ..geom.s2 import s2_cell_from_mercator

    def assign(batch: pa.Table) -> pa.Table:
        cx = batch.column("centroid_x").to_numpy(zero_copy_only=False)
        cy = batch.column("centroid_y").to_numpy(zero_copy_only=False)
        face, i, j, cell = s2_cell_from_mercator(cx, cy, level)
        return pa.table(
            {
                "osm_id": batch.column("osm_id"),
                "s2_face": pa.array(face.astype(np.int32)),
                "s2_i": pa.array(i),
                "s2_j": pa.array(j),
                "s2_cell": pa.array(cell),
            }
        )

    return (
        parsed_ds(sf_dir)
        .select_columns(["osm_id", "centroid_x", "centroid_y"])
        .map_batches(assign, batch_format="pyarrow")
    )


class _S2CoverActor:
    """Stateful S2 covering stage (the north star's "S2 covering caches"):
    per-actor memo of Hilbert positions keyed by (i, j) block — repeated
    cells across batches (dense urban areas hit the same cells over and
    over) skip the 16-pass recurrence.  Setup state lives in ``__init__``
    (once per actor), per the actor-pool rule."""

    def __init__(self, level: int):
        self.level = level
        self.cache: dict = {}
        self.hits = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..geom.s2 import hilbert_xy2d, s2_cell_from_mercator

        level = self.level
        n = len(batch)
        oid = batch.column("osm_id").to_numpy(zero_copy_only=False)
        minx = batch.column("minx").to_numpy(zero_copy_only=False)
        miny = batch.column("miny").to_numpy(zero_copy_only=False)
        maxx = batch.column("maxx").to_numpy(zero_copy_only=False)
        maxy = batch.column("maxy").to_numpy(zero_copy_only=False)
        # all four bbox corners through the same face/i/j kernel the
        # oracle mirrors; min/max over corners = the (i, j) rectangle
        # (u, v are monotone in lon/lat within a face, so the rectangle
        # is the standard superset covering)
        fs = np.empty((4, n), dtype=np.int64)
        is_ = np.empty((4, n), dtype=np.int64)
        js = np.empty((4, n), dtype=np.int64)
        for k, (cx, cy) in enumerate(
            [(minx, miny), (maxx, miny), (minx, maxy), (maxx, maxy)]
        ):
            f, i, j, _ = s2_cell_from_mercator(cx, cy, level)
            fs[k], is_[k], js[k] = f, i, j
        face = fs.min(axis=0)
        i0, i1 = is_.min(axis=0), is_.max(axis=0)
        j0, j1 = js.min(axis=0), js.max(axis=0)
        # expand rectangles: rows repeat per cover cell
        ni = (i1 - i0 + 1).astype(np.int64)
        nj = (j1 - j0 + 1).astype(np.int64)
        counts = ni * nj
        row = np.repeat(np.arange(n), counts)
        total = int(counts.sum())
        # within-row offsets 0..count-1 (per-run padded cumsum)
        offs = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts
        )
        ci = i0[row] + offs // nj[row]
        cj = j0[row] + offs % nj[row]
        # memoized Hilbert: only compute distinct new (i, j) pairs
        key = (ci << np.int64(32)) | cj
        uk, inv = np.unique(key, return_inverse=True)
        dvals = np.empty(len(uk), dtype=np.int64)
        miss_idx = [k for k, kk in enumerate(uk) if int(kk) not in self.cache]
        if miss_idx:
            mi = np.asarray(miss_idx)
            dm = hilbert_xy2d(level, uk[mi] >> np.int64(32), uk[mi] & np.int64((1 << 32) - 1))
            for k, dd in zip(mi, dm):
                self.cache[int(uk[k])] = int(dd)
        for k, kk in enumerate(uk):
            dvals[k] = self.cache[int(kk)]
        self.hits += len(key) - len(miss_idx)
        cell = face[row] * (np.int64(1) << (2 * level)) + dvals[inv]
        return pa.table(
            {
                "osm_id": pa.array(oid[row]),
                "s2_cell": pa.array(cell),
            }
        )


def q_s2_cover(sf_dir: str, level: int = S2_COVER_LEVEL) -> "ray.data.Dataset":
    """S2-analog covering of each building bbox at ``level``: one row per
    (osm_id, covering cell).  The covering is the (i, j) rectangle spanned
    by the four bbox corners — a superset covering, exactly like published
    S2 coverings are supersets of their region — and runs on an actor pool
    whose per-actor Hilbert memo is the "S2 covering cache" stage from the
    north-star operator list.

    Output: (osm_id, s2_cell)."""
    return (
        parsed_ds(sf_dir)
        .select_columns(["osm_id", "minx", "miny", "maxx", "maxy"])
        .map_batches(
            _S2CoverActor,
            fn_constructor_args=(level,),
            batch_format="pyarrow",
            concurrency=_pool(),
            batch_size=1024,
        )
    )


# implicit tiling: subtree root every 4 levels above the z16 leaf grid
SUBTREE_DEPTH = 4
_SUBTREE_WORD = 52  # bits per availability word: BIGINT-safe on both engines
_LEVEL_OFFSETS = (0, 1, 5, 21)  # (4^d - 1) / 3, level-order bit offsets


def q_subtree_avail(sf_dir: str) -> "ray.data.Dataset":
    """3D-Tiles-1.1-style implicit-tiling availability subtrees: the z16
    occupied-tile set rolled into per-z12-root subtrees of depth 4, each
    emitting its internal tile-availability bitstream (85 bits, levels
    z12..z15 in level-order Morton position) and its child-subtree
    availability (256 z16 bits) packed into 52-bit words — the compact
    index a tileset reader streams INSTEAD of a tileset.json node per tile
    (the reference writes an explicit two-level tree,
    ``/root/reference/generate-tileset.ts:67-141``; availability subtrees
    are how the same quadtree ships at planet scale).

    Shape: per-batch partials collapse buildings to distinct (root, local
    z16 tile) rows with counts, then ONE ``map_key_partitions`` exchange
    keyed by root sets ancestor/leaf bits with ``np.bitwise_or.reduceat``
    per root run — one dispatch per partition, never per subtree.

    Output: (root_x, root_y, n_tiles, n_buildings, int_w0, int_w1,
    leaf_w0..leaf_w4) — every word exact int64, bit 52+ never used."""
    from .partition import map_key_partitions, run_starts

    ds = parsed_ds(sf_dir).select_columns(["osm_id", "minx", "miny", "maxx", "maxy"])
    assigned = ownership_assignments(ds)

    def partial(batch: pa.Table) -> pa.Table:
        tx = batch.column("tile_x").to_numpy(zero_copy_only=False).astype(np.int64)
        ty = batch.column("tile_y").to_numpy(zero_copy_only=False).astype(np.int64)
        key = (tx << np.int64(21)) | ty
        uk, cnt = np.unique(key, return_counts=True)
        utx, uty = uk >> np.int64(21), uk & np.int64((1 << 21) - 1)
        return pa.table(
            {
                "root_x": pa.array((utx >> 4).astype(np.int32)),
                "root_y": pa.array((uty >> 4).astype(np.int32)),
                "local": pa.array(((utx & 15) << np.int64(4)) | (uty & 15)),
                "p_n": pa.array(cnt.astype(np.int64)),
            }
        )

    def build(part: pa.Table) -> pa.Table:
        if len(part) == 0:
            return pa.table(
                {
                    "root_x": pa.array([], type=pa.int32()),
                    "root_y": pa.array([], type=pa.int32()),
                    "n_tiles": pa.array([], type=pa.int64()),
                    "n_buildings": pa.array([], type=pa.int64()),
                    "int_w0": pa.array([], type=pa.int64()),
                    "int_w1": pa.array([], type=pa.int64()),
                    **{f"leaf_w{w}": pa.array([], type=pa.int64()) for w in range(5)},
                }
            )
        rx = part.column("root_x").to_numpy(zero_copy_only=False).astype(np.int64)
        ry = part.column("root_y").to_numpy(zero_copy_only=False).astype(np.int64)
        loc = part.column("local").to_numpy(zero_copy_only=False)
        pn = part.column("p_n").to_numpy(zero_copy_only=False)
        rkey = (rx << np.int64(21)) | ry
        order = np.lexsort((loc, rkey))
        rkey, loc, pn = rkey[order], loc[order], pn[order]
        # collapse duplicate (root, local) partials from different batches
        starts = run_starts(rkey, loc)
        idx = np.flatnonzero(starts)
        nb_tile = np.add.reduceat(pn, idx)
        rkey_t = rkey[idx]
        lx, ly = loc[idx] >> np.int64(4), loc[idx] & np.int64(15)
        # per-root scalars
        rstarts = run_starts(rkey_t)
        ridx = np.flatnonzero(rstarts)
        roots = rkey_t[ridx]
        n_tiles = np.diff(np.append(ridx, len(rkey_t)))
        n_build = np.add.reduceat(nb_tile, ridx)
        rid = np.cumsum(rstarts) - 1  # tile row -> root row
        n_roots = len(roots)
        words = np.zeros((n_roots, 7), dtype=np.int64)
        one = np.int64(1)
        for d in range(SUBTREE_DEPTH):
            m = morton32(lx >> (SUBTREE_DEPTH - d), ly >> (SUBTREE_DEPTH - d))
            bit = _LEVEL_OFFSETS[d] + m
            w = bit // _SUBTREE_WORD  # 0 or 1 (bit <= 84)
            np.bitwise_or.at(words, (rid, w), one << (bit % _SUBTREE_WORD))
        m = morton32(lx, ly)  # leaf / child-subtree availability
        np.bitwise_or.at(words, (rid, 2 + m // _SUBTREE_WORD), one << (m % _SUBTREE_WORD))
        return pa.table(
            {
                "root_x": pa.array((roots >> np.int64(21)).astype(np.int32)),
                "root_y": pa.array((roots & np.int64((1 << 21) - 1)).astype(np.int32)),
                "n_tiles": pa.array(n_tiles.astype(np.int64)),
                "n_buildings": pa.array(n_build.astype(np.int64)),
                "int_w0": pa.array(words[:, 0]),
                "int_w1": pa.array(words[:, 1]),
                **{f"leaf_w{w}": pa.array(words[:, 2 + w]) for w in range(5)},
            }
        )

    partials = assigned.map_batches(partial, batch_format="pyarrow")
    return map_key_partitions(partials, ["root_x", "root_y"], build)


def q_subtree_files(sf_dir: str) -> "ray.data.Dataset":
    """Implicit-tiling ROUND TRIP: materialize :func:`q_subtree_avail` as
    spec-shaped ``.subtree`` binaries + the implicit root tileset
    (``stages/subtree.write_subtrees`` — atomic, lineage-tracked,
    resumable), then decode every file back in a distributed map and emit
    what the BINARY says: (root_x, root_y, n_tiles, tile_available).

    The SQL oracle recomputes tile_available from the availability words
    (``bit_count(int_w0) + bit_count(int_w1) + n_tiles``), so a green row
    proves the bitstream encode→file→decode path is exact — the artifact
    is checked, not just the aggregate.  3D Tiles 1.1 implicit tiling is
    the planet-scale replacement for the reference's explicit two-level
    tree (``/root/reference/generate-tileset.ts:18-74``).
    """
    import re
    from pathlib import Path

    from ..stages.subtree import decode_subtree, write_subtrees

    out = Path("/tmp/osm3d_subtrees") / Path(sf_dir).name
    out.mkdir(parents=True, exist_ok=True)
    manifest = write_subtrees(q_subtree_avail(sf_dir), str(out))

    frag_pat = re.compile(r"subtrees/(\d+)_(\d+)/")

    def decode_batch(batch: pa.Table) -> pa.Table:
        rows = []
        for frag in batch.column("fragment").to_pylist():
            m = frag_pat.match(frag)
            dec = decode_subtree((out / frag).read_bytes())
            rows.append(
                (
                    int(m.group(1)),
                    int(m.group(2)),
                    dec["n_tiles"],
                    dec["tile_available"],
                )
            )
            if not dec["content_matches_leaves"]:
                raise ValueError(f"content bits != leaf bits in {frag}")
        cols = list(zip(*rows)) if rows else ([], [], [], [])
        return pa.table(
            {
                "root_x": pa.array(cols[0], type=pa.int32()),
                "root_y": pa.array(cols[1], type=pa.int32()),
                "n_tiles": pa.array(cols[2], type=pa.int64()),
                "tile_available": pa.array(cols[3], type=pa.int64()),
            }
        )

    frags = ray.data.from_items(
        [{"fragment": f} for f in manifest["fragments"]]
    ).repartition(max(1, min(32, len(manifest["fragments"]) // 8 or 1)))
    return frags.map_batches(decode_batch, batch_format="pyarrow")


def q_s2_neighbors(sf_dir: str, level: int = S2_COVER_LEVEL) -> "ray.data.Dataset":
    """Occupied-cell adjacency over the S2-analog grid: for every occupied
    cell (≥1 building centroid) count its valid within-face (i, j)
    8-neighbors and how many of THOSE are occupied — the spherical-grid
    neighborhood operator (hotspot dilation, coverage-gap detection) that
    pairs with the mercator-grid ``q_hex_smooth`` / ``stencil_3x3``
    family.  Cross-face adjacency is intentionally out of scope (cells on
    a face edge see < 8 neighbors); the oracle applies the same rule, so
    parity is exact.

    Scale shape: everything downstream of the parse is bounded by
    OCCUPIED CELLS (per-batch uniques → distinct), never corpus rows:
    neighbor expansion is ×8 on that bounded set, occupancy is ONE
    tag-union keyed exchange (probe rows + self rows sort together; a
    run's min tag says occupied — no broadcast of the occupied set, which
    at planet scale is 100M+ cells), and the per-center rollup is a
    second bounded exchange.

    Output: (s2_cell, n_neighbors, n_occupied)."""
    from ..geom.s2 import s2_cell_from_mercator
    from .partition import first_per_key, map_key_partitions, run_starts

    n_side = np.int64(1) << level

    def cell_partial(batch: pa.Table) -> pa.Table:
        cx = batch.column("centroid_x").to_numpy(zero_copy_only=False)
        cy = batch.column("centroid_y").to_numpy(zero_copy_only=False)
        face, i, j, cell = s2_cell_from_mercator(cx, cy, level)
        key = (face << np.int64(2 * level + 2)) | (i << np.int64(level)) | j
        _, idx = np.unique(key, return_index=True)
        return pa.table(
            {
                "s2_face": pa.array(face[idx]),
                "i": pa.array(i[idx]),
                "j": pa.array(j[idx]),
                "s2_cell": pa.array(cell[idx]),
            }
        )

    cells = first_per_key(
        parsed_ds(sf_dir)
        .select_columns(["centroid_x", "centroid_y"])
        .map_batches(cell_partial, batch_format="pyarrow"),
        ["s2_face", "i", "j"],
    )

    _OFFS = np.array(
        [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)],
        dtype=np.int64,
    )

    def expand(batch: pa.Table) -> pa.Table:
        face = batch.column("s2_face").to_numpy(zero_copy_only=False)
        i = batch.column("i").to_numpy(zero_copy_only=False)
        j = batch.column("j").to_numpy(zero_copy_only=False)
        cell = batch.column("s2_cell").to_numpy(zero_copy_only=False)
        n = len(face)
        ni = (i[:, None] + _OFFS[:, 0][None, :]).ravel()
        nj = (j[:, None] + _OFFS[:, 1][None, :]).ravel()
        pf = np.repeat(face, 8)
        pc = np.repeat(cell, 8)
        ok = (ni >= 0) & (ni < n_side) & (nj >= 0) & (nj < n_side)
        return pa.table(
            {
                "s2_face": pa.array(np.concatenate([face, pf[ok]])),
                "i": pa.array(np.concatenate([i, ni[ok]])),
                "j": pa.array(np.concatenate([j, nj[ok]])),
                "center": pa.array(np.concatenate([cell, pc[ok]])),
                "probe": pa.array(
                    np.concatenate(
                        [np.zeros(n, dtype=np.int64), np.ones(int(ok.sum()), dtype=np.int64)]
                    )
                ),
            }
        )

    tagged = cells.map_batches(expand, batch_format="pyarrow")

    def occ_fn(part: pa.Table) -> pa.Table:
        if len(part) == 0:
            return pa.table(
                {
                    "center": pa.array([], type=pa.int64()),
                    "occ": pa.array([], type=pa.int64()),
                }
            )
        face = part.column("s2_face").to_numpy(zero_copy_only=False)
        i = part.column("i").to_numpy(zero_copy_only=False)
        j = part.column("j").to_numpy(zero_copy_only=False)
        center = part.column("center").to_numpy(zero_copy_only=False)
        probe = part.column("probe").to_numpy(zero_copy_only=False)
        order = np.lexsort((probe, j, i, face))
        face, i, j = face[order], i[order], j[order]
        center, probe = center[order], probe[order]
        starts = run_starts(face, i, j)
        idx = np.flatnonzero(starts)
        # a run's FIRST row (probe sorts last) is a self row iff occupied
        occupied_run = probe[idx] == 0
        rid = np.cumsum(starts) - 1
        keep = probe == 1
        return pa.table(
            {
                "center": pa.array(center[keep]),
                "occ": pa.array(occupied_run[rid[keep]].astype(np.int64)),
            }
        )

    flags = map_key_partitions(tagged, ["s2_face", "i", "j"], occ_fn)

    def rollup(part: pa.Table) -> pa.Table:
        if len(part) == 0:
            return pa.table(
                {
                    "s2_cell": pa.array([], type=pa.int64()),
                    "n_neighbors": pa.array([], type=pa.int64()),
                    "n_occupied": pa.array([], type=pa.int64()),
                }
            )
        center = part.column("center").to_numpy(zero_copy_only=False)
        occ = part.column("occ").to_numpy(zero_copy_only=False)
        order = np.argsort(center, kind="stable")
        center, occ = center[order], occ[order]
        starts = run_starts(center)
        idx = np.flatnonzero(starts)
        return pa.table(
            {
                "s2_cell": pa.array(center[idx]),
                "n_neighbors": pa.array(np.diff(np.append(idx, len(center)))),
                "n_occupied": pa.array(np.add.reduceat(occ, idx)),
            }
        )

    return map_key_partitions(flags, ["center"], rollup)


PAGERANK_SCALE = 10**12  # per-node starting mass, integer micro-prob units
PAGERANK_BASE = 15 * PAGERANK_SCALE // 100  # (1-d) share, d = 0.85


def q_tile_pagerank(sf_dir: str, iters: int = 5) -> "ray.data.Dataset":
    """Integer-exact PageRank over the occupied-tile 8-adjacency graph —
    the iterative-graph Ray Data shape (alongside ``q_tile_components``):
    spatial centrality of the urban fabric, where dense contiguous areas
    accumulate rank and isolated tiles stay at the base share.

    Exactness contract (the oracle unrolls the same rounds in SQL):
    every node starts with ``SCALE`` units; one round is
    ``p' = BASE + (85 · Σ_{u→v} (p_u // deg_u)) // 100`` in pure int64
    (all quantities non-negative, so ``//`` is floor on both engines).
    Deviations from textbook PageRank, applied identically on both
    sides: no dangling-mass redistribution (deg-0 nodes keep BASE) and
    integer truncation of shares.  ``SCALE`` is corpus-sized — at 1e9+
    nodes pick SCALE ≈ 2^62 / N so hub sums stay inside int64 (bound
    documented: p_v ≤ N·SCALE at the fixed point).

    Scale shape: nodes = OCCUPIED tiles (an aggregate, never building
    rows); adjacency is the tag-union occupancy exchange (no broadcast);
    each PageRank round is ONE ``map_key_partitions``
    exchange of (node + contribution) rows whose state (deg, neighbor
    list) rides the self row, so the edge list is never re-joined.

    Output: (tile_x, tile_y, pr)."""
    from .partition import map_key_partitions, run_starts

    # block-count hygiene (the q_tile_components discipline): every
    # exchange below sorts its input, and Ray sort cost scales with the
    # INPUT block count, so cap once before the replicate/exchange chain
    nodes = (
        tile_counts_ds(sf_dir)
        .select_columns(["tile_x", "tile_y"])
        .repartition(8)
        .materialize()
    )

    _OFF = np.array(
        [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)],
        dtype=np.int64,
    )

    def expand(batch: pa.Table) -> pa.Table:
        tx = batch.column("tile_x").to_numpy(zero_copy_only=False).astype(np.int64)
        ty = batch.column("tile_y").to_numpy(zero_copy_only=False).astype(np.int64)
        key = (tx << np.int64(21)) | ty
        n = len(tx)
        nx = (tx[:, None] + _OFF[:, 0][None, :]).ravel()
        ny = (ty[:, None] + _OFF[:, 1][None, :]).ravel()
        ok = (nx >= 0) & (ny >= 0)  # z16 grid edge clamp
        return pa.table(
            {
                "x": pa.array(np.concatenate([tx, nx[ok]])),
                "y": pa.array(np.concatenate([ty, ny[ok]])),
                "src": pa.array(np.concatenate([key, np.repeat(key, 8)[ok]])),
                "probe": pa.array(
                    np.concatenate(
                        [np.zeros(n, dtype=np.int64), np.ones(int(ok.sum()), dtype=np.int64)]
                    )
                ),
            }
        )

    def occ_fn(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "key": pa.array([], type=pa.int64()),
                "nbr": pa.array([], type=pa.int64()),
            }
        )
        if len(part) == 0:
            return empty
        x = part.column("x").to_numpy(zero_copy_only=False)
        y = part.column("y").to_numpy(zero_copy_only=False)
        src = part.column("src").to_numpy(zero_copy_only=False)
        probe = part.column("probe").to_numpy(zero_copy_only=False)
        order = np.lexsort((probe, y, x))
        x, y, src, probe = x[order], y[order], src[order], probe[order]
        starts = run_starts(x, y)
        idx = np.flatnonzero(starts)
        occupied = probe[idx] == 0  # self row sorts first in its run
        rid = np.cumsum(starts) - 1
        keep = (probe == 1) & occupied[rid]
        # edge src → this occupied tile (the probing node gains a neighbor)
        return pa.table(
            {
                "key": pa.array(src[keep]),
                "nbr": pa.array(((x << np.int64(21)) | y)[keep]),
            }
        )

    edges = map_key_partitions(nodes.map_batches(expand, batch_format="pyarrow"), ["x", "y"], occ_fn)

    # node state: (key, deg, nbrs) — deg-0 nodes kept via the tagged union
    def node_tag(batch: pa.Table) -> pa.Table:
        tx = batch.column("tile_x").to_numpy(zero_copy_only=False).astype(np.int64)
        ty = batch.column("tile_y").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "key": pa.array((tx << np.int64(21)) | ty),
                "nbr": pa.array(np.full(len(tx), -1, dtype=np.int64)),
            }
        )

    def collect(part: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "key": pa.array([], type=pa.int64()),
                "p": pa.array([], type=pa.int64()),
                "deg": pa.array([], type=pa.int64()),
                "nbrs": pa.array([], type=pa.large_list(pa.int64())),
            }
        )
        if len(part) == 0:
            return empty
        key = part.column("key").to_numpy(zero_copy_only=False)
        nbr = part.column("nbr").to_numpy(zero_copy_only=False)
        order = np.lexsort((nbr, key))
        key, nbr = key[order], nbr[order]
        starts = run_starts(key)
        idx = np.flatnonzero(starts)
        ends = np.append(idx[1:], len(key))
        real = nbr != -1  # -1 = the presence row from node_tag
        deg = np.add.reduceat(real.astype(np.int64), idx)
        # neighbor list per node: values with the presence rows dropped
        keep_vals = nbr[real]
        offsets = np.concatenate([[0], np.cumsum(deg)])
        nbrs = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), pa.array(keep_vals, type=pa.int64())
        )
        return pa.table(
            {
                "key": pa.array(key[idx]),
                "p": pa.array(np.full(len(idx), PAGERANK_SCALE, dtype=np.int64)),
                "deg": pa.array(deg),
                "nbrs": nbrs,
            }
        )

    state = map_key_partitions(
        edges.union(nodes.map_batches(node_tag, batch_format="pyarrow")),
        ["key"],
        collect,
    ).repartition(8)

    def spread(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy(zero_copy_only=False)
        p = batch.column("p").to_numpy(zero_copy_only=False)
        deg = batch.column("deg").to_numpy(zero_copy_only=False)
        nbrs = batch.column("nbrs")
        if isinstance(nbrs, pa.ChunkedArray):
            nbrs = nbrs.combine_chunks()
        vals = nbrs.values.to_numpy(zero_copy_only=False)
        share = np.floor_divide(p, np.maximum(deg, 1))
        contrib_val = np.repeat(share, deg)
        # self rows carry the state; kind sorts them first within a key
        n = len(key)
        self_tbl = pa.table(
            {
                "key": batch.column("key"),
                "kind": pa.array(np.zeros(n, dtype=np.int64)),
                "val": pa.array(np.zeros(n, dtype=np.int64)),
                "deg": batch.column("deg"),
                "nbrs": nbrs,
            }
        )
        m = len(vals)
        empty_lists = pa.LargeListArray.from_arrays(
            pa.array(np.zeros(m + 1, dtype=np.int64)),
            pa.array([], type=pa.int64()),
        )
        contrib_tbl = pa.table(
            {
                "key": pa.array(vals),
                "kind": pa.array(np.ones(m, dtype=np.int64)),
                "val": pa.array(contrib_val),
                "deg": pa.array(np.zeros(m, dtype=np.int64)),
                "nbrs": empty_lists,
            }
        )
        return pa.concat_tables([self_tbl, contrib_tbl])

    def gather(part: pa.Table) -> pa.Table:
        if len(part) == 0:
            return pa.table(
                {
                    "key": pa.array([], type=pa.int64()),
                    "p": pa.array([], type=pa.int64()),
                    "deg": pa.array([], type=pa.int64()),
                    "nbrs": pa.array([], type=pa.large_list(pa.int64())),
                }
            )
        import pyarrow.compute as pc

        part = part.take(
            pc.sort_indices(
                part, sort_keys=[("key", "ascending"), ("kind", "ascending")]
            )
        )
        key = part.column("key").to_numpy(zero_copy_only=False)
        val = part.column("val").to_numpy(zero_copy_only=False)
        starts = run_starts(key)
        idx = np.flatnonzero(starts)
        s = np.add.reduceat(val, idx)
        p_new = PAGERANK_BASE + np.floor_divide(85 * s, 100)
        head = part.take(pa.array(idx))  # the self rows (kind 0 first)
        return pa.table(
            {
                "key": head.column("key"),
                "p": pa.array(p_new),
                "deg": head.column("deg"),
                "nbrs": head.column("nbrs"),
            }
        )

    for _ in range(iters):
        state = map_key_partitions(
            state.map_batches(spread, batch_format="pyarrow"), ["key"], gather
        ).repartition(8)

    def finish(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "tile_x": pa.array((key >> np.int64(21)).astype(np.int32)),
                "tile_y": pa.array((key & np.int64((1 << 21) - 1)).astype(np.int32)),
                "pr": batch.column("p"),
            }
        )

    return state.map_batches(finish, batch_format="pyarrow")


def q_skew_audit(sf_dir: str) -> "ray.data.Dataset":
    """Shuffle-key skew audit for the tile-assignment exchange — the
    diagnostic behind the engine's salted accumulate path
    (``stages/accumulate.py``; north rule: "salted-key skew splitting for
    dense urban cells"): how unbalanced are the per-tile loads, and what
    salt factor would the hottest cell need so no reduce task exceeds
    ~8× the mean?

    All integer-exact: mean in micro-units (floor), p99 as the exact
    order statistic at floor((n−1)·99/100) of the ascending counts,
    hot_tiles = count of tiles above 8× mean, salt_factor =
    ceil(max · n / (8 · total)).

    Scale shape: inputs are the per-tile COUNTS (an aggregate bounded by
    occupied tiles, never building rows); the single-partition final pass
    is over that bounded table only — the same boundedness argument as
    the tileset root fan-in.

    Output: one row (n_tiles, total, max_count, p99_count, mean_e6,
    hot_tiles, salt_factor)."""
    counts = tile_counts_ds(sf_dir).select_columns(["batch_length"])

    def audit(batch: pa.Table) -> pa.Table:
        c = np.sort(batch.column("batch_length").to_numpy(zero_copy_only=False))
        n = len(c)
        total = int(c.sum())
        mean_e6 = total * 1_000_000 // n
        p99 = int(c[(n - 1) * 99 // 100])
        mx = int(c[-1])
        hot = int((c * n > 8 * total).sum())  # count > 8·mean, exact
        salt = (mx * n + 8 * total - 1) // (8 * total)
        return pa.table(
            {
                "n_tiles": pa.array([n], type=pa.int64()),
                "total": pa.array([total], type=pa.int64()),
                "max_count": pa.array([mx], type=pa.int64()),
                "p99_count": pa.array([p99], type=pa.int64()),
                "mean_e6": pa.array([mean_e6], type=pa.int64()),
                "hot_tiles": pa.array([hot], type=pa.int64()),
                "salt_factor": pa.array([salt], type=pa.int64()),
            }
        )

    return counts.repartition(1).map_batches(audit, batch_format="pyarrow", batch_size=None)


# geodesic distance-band landmark: the center of the synthetic city's
# mercator extent (FIXTURES.md); lat/lon/cos-lat are precomputed ONCE in
# Python and embedded as literals in both the kernel and the oracle SQL,
# so the only per-row transcendental work is the shared expression chain.
_LANDMARK_MX = 540000.0
_LANDMARK_MY = 5725000.0
_BAND_CM = 200_000  # 2 km bands, in integer centimeters


def _landmark_lonlat() -> tuple[float, float, float]:
    import math

    lon0 = _LANDMARK_MX / WORLD_HALF * math.pi
    lat0 = 2.0 * math.atan(math.exp(_LANDMARK_MY / WORLD_HALF * math.pi)) - math.pi / 2.0
    return lon0, lat0, math.cos(lat0)


def q_distance_bands(sf_dir: str) -> "ray.data.Dataset":
    """Great-circle (haversine) distance bands from a fixed landmark: every
    building centroid → spherical lon/lat (the same Gudermannian used by
    the tileset's EPSG:4326 output, geom/transforms.py) → haversine
    distance to the landmark → 2 km band; per-band building count and
    integer-centimeter distance sum.  The geodesic-math companion to the
    planar kNN/range operators (the reference's region boundary logic is
    planar-only — generate-tileset.ts computes boxes in mercator).

    Scale shape: ZERO data exchange — one vectorized trig pass per batch,
    per-batch (band, count, sum) partials, then a tiny band-keyed groupby
    (≤ ~50 rows per block).  Distances are summed as int64 centimeters so
    the partial-combine tree is associative-exact (CLAUDE.md float rule).

    Output: (band, n_buildings, sum_dist_cm)."""
    lon0, lat0, coslat0 = _landmark_lonlat()
    R2 = 2.0 * 6371000.0

    def partial(batch: pa.Table) -> pa.Table:
        cx = batch.column("centroid_x").to_numpy(zero_copy_only=False)
        cy = batch.column("centroid_y").to_numpy(zero_copy_only=False)
        ok = np.isfinite(cx) & np.isfinite(cy)
        cx, cy = cx[ok], cy[ok]
        lon = cx / WORLD_HALF * np.pi
        lat = 2.0 * np.arctan(np.exp(cy / WORLD_HALF * np.pi)) - np.pi / 2.0
        sp = np.sin((lat - lat0) / 2.0)
        sl = np.sin((lon - lon0) / 2.0)
        a = sp * sp + coslat0 * np.cos(lat) * sl * sl
        d = R2 * np.arcsin(np.sqrt(a))
        d_cm = np.floor(d * 100.0 + 0.5).astype(np.int64)
        band = d_cm // _BAND_CM
        uniq, inv = np.unique(band, return_inverse=True)
        return pa.table(
            {
                "band": pa.array(uniq),
                "p_n": pa.array(np.bincount(inv).astype(np.int64)),
                "p_sum": pa.array(
                    np.bincount(inv, weights=d_cm).astype(np.int64)
                ),
            }
        )

    partials = (
        parsed_ds(sf_dir)
        .select_columns(["centroid_x", "centroid_y"])
        .map_batches(partial, batch_format="pyarrow")
    )
    merged = partials.groupby("band").aggregate(
        ray.data.aggregate.Sum("p_n", alias_name="n_buildings"),
        ray.data.aggregate.Sum("p_sum", alias_name="sum_dist_cm"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "band": batch.column("band"),
                "n_buildings": pc.cast(batch.column("n_buildings"), pa.int64()),
                "sum_dist_cm": pc.cast(batch.column("sum_dist_cm"), pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------------------------------
# bounded-horizon multi-source BFS over the occupied tile grid (session G)
# --------------------------------------------------------------------------


def q_tile_bfs(
    sf_dir: str, horizon: int = 12, n_landmarks: int = 16
) -> "ray.data.Dataset":
    """Hop distance (4-adjacency, ≤ ``horizon``) from the ``n_landmarks``
    densest tiles — the multi-source BFS / isochrone shape over the
    occupied z16 grid: "how far is every urban tile from the nearest
    hub".  Tiles beyond the horizon are absent from the output (the
    bounded horizon is what makes the op streamable: exactly ``horizon``
    keyed exchanges, independent of graph diameter).

    Encoding: a label is ``hops·2^42 + landmark_node`` (packed landmark
    ids < 2^40), so lexicographic (hops, landmark) minimisation is ONE
    integer ``min`` — ties at equal distance resolve to the smallest
    landmark id on both engines.

    Scale shape: nodes = the occupied-tile aggregate; landmarks are a
    distributed sort + ``limit(n)`` (bounded take, broadcast by
    closure); each BFS round is one ``reduce_by_key`` min-exchange of
    (node, label) rows with occupancy riding as a max-flag — never a
    join against building rows; per-round ``materialize()`` keeps the
    iterative lineage flat (the q_tile_components discipline).

    Output: (tile_x, tile_y, hops, landmark)."""
    from .partition import reduce_by_key

    PACK = np.int64(1 << 20)
    SH = np.int64(1 << 42)
    SENT = np.int64(horizon + 1) * SH + PACK * PACK

    stats = tile_counts_ds(sf_dir)

    def pack_nodes(b: pa.Table) -> pa.Table:
        tx = b.column("tile_x").to_numpy(zero_copy_only=False).astype(np.int64)
        ty = b.column("tile_y").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = b.column("batch_length").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(tx * PACK + ty),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    # block-count hygiene: cap the ~200 parse-inherited blocks before the
    # per-round exchanges (Ray sort cost scales with input block count)
    nodes = (
        stats.map_batches(pack_nodes, batch_format="pyarrow")
        .repartition(8)
        .materialize()
    )
    lm_rows = (
        nodes.sort(["cnt", "node"], descending=[True, False])
        .limit(n_landmarks)
        .take_all()
    )
    lm = np.array(sorted(int(r["node"]) for r in lm_rows), dtype=np.int64)

    def presence(b: pa.Table) -> pa.Table:
        node = b.column("node").to_numpy(zero_copy_only=False)
        n = len(node)
        return pa.table(
            {
                "node": pa.array(node),
                "best": pa.array(np.full(n, SENT, dtype=np.int64)),
                "occ": pa.array(np.ones(n, dtype=np.int64)),
            }
        )

    pres = nodes.map_batches(presence, batch_format="pyarrow").materialize()

    import ray.data as rd

    labels = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(lm),
                "best": pa.array(lm),  # hops 0 → label = landmark id
                "occ": pa.array(np.zeros(len(lm), dtype=np.int64)),
            }
        )
    )

    _OFF = np.array([(-1, 0), (1, 0), (0, -1), (0, 1)], dtype=np.int64)

    def emit(b: pa.Table) -> pa.Table:
        node = b.column("node").to_numpy(zero_copy_only=False)
        best = b.column("best").to_numpy(zero_copy_only=False)
        tx, ty = node // PACK, node % PACK
        nx = (tx[:, None] + _OFF[:, 0][None, :]).ravel()
        ny = (ty[:, None] + _OFF[:, 1][None, :]).ravel()
        ok = (nx >= 0) & (ny >= 0)
        nbest = (np.repeat(best, 4) + SH)[ok]
        nnode = (nx * PACK + ny)[ok]
        n_out = len(nnode) + len(node)
        return pa.table(
            {
                "node": pa.array(np.concatenate([node, nnode])),
                "best": pa.array(np.concatenate([best, nbest])),
                "occ": pa.array(np.zeros(n_out, dtype=np.int64)),
            }
        )

    for _ in range(horizon):
        emits = labels.map_batches(emit, batch_format="pyarrow")
        red = reduce_by_key(
            emits.union(pres),
            ["node"],
            [("best", "min", "best"), ("occ", "max", "occ")],
        )

        def keep(b: pa.Table) -> pa.Table:
            node = b.column("node").to_numpy(zero_copy_only=False)
            best = b.column("best").to_numpy(zero_copy_only=False)
            occ = b.column("occ").to_numpy(zero_copy_only=False)
            m = (occ == 1) & (best < SENT)
            return pa.table(
                {
                    "node": pa.array(node[m]),
                    "best": pa.array(best[m]),
                    "occ": pa.array(np.zeros(int(m.sum()), dtype=np.int64)),
                }
            )

        # per-round materialize + bounded repartition: measured faster than
        # the lazy 12-round chain (21.8 s vs 14.0 s at sf0.1 — deep lazy
        # plans re-optimize per barrier); at 100 TB rounds stay ~occupied
        # tiles, so the materialization is an aggregate, never corpus rows
        labels = (
            red.map_batches(keep, batch_format="pyarrow")
            .repartition(8)
            .materialize()
        )

    def finish(b: pa.Table) -> pa.Table:
        node = b.column("node").to_numpy(zero_copy_only=False)
        best = b.column("best").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "tile_x": pa.array((node // PACK).astype(np.int32)),
                "tile_y": pa.array((node % PACK).astype(np.int32)),
                "hops": pa.array(best // SH),
                "landmark": pa.array(best % SH),
            }
        )

    return labels.map_batches(finish, batch_format="pyarrow")


def q_span_invariant(sf_dir: str) -> "ray.data.Dataset":
    """The north rule's per-row SPAN-SEQUENCE INVARIANT as a driver-gated
    query: every document's interleaved span sequence — (kind, text,
    media_ref, offset), in order — folds to one order-sensitive mod-2^64
    hash computed from the spans AS PRESERVED THROUGH THE PARSE STAGE
    (``keep_spans=True``), while the oracle computes the same fold in SQL
    from the RAW files; equality proves the engine's batch path neither
    reorders, drops, nor mutates a span anywhere between source and
    consumer.

    Hash: span_i → poly257(kind ∥ 0x01 ∥ text ∥ 0x01 ∥ media_ref) +
    offset·GOLD; doc → Σ span_i · 257^(n−1−i)  (all mod 2^64 — the
    ``doc_fingerprint`` HUGEINT-mirror conventions).

    Output: (doc_id, n_spans, seq_hash).  Zero exchange — one vectorized
    pass per batch."""
    import pyarrow.compute as pc

    from .partition import run_starts  # noqa: F401  (convention import)
    from ..pipelines.textops import _poly257_u64

    GOLD = np.uint64(0x9E3779B97F4A7C15)

    def fold(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        st = spans.flatten()  # slice-safe (``.values`` ignores offsets)
        joined = pc.binary_join_element_wise(
            st.field("kind"), st.field("text"), st.field("media_ref"), "\x01"
        )
        sh = _poly257_u64(joined) if len(joined) else np.zeros(0, np.uint64)
        off = st.field("offset").to_numpy(zero_copy_only=False).astype(np.uint64)
        sh = sh + off * GOLD
        ns = np.asarray(pc.list_value_length(spans)).astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(ns)])
        total = int(ns.sum())
        starts = offs[:-1]
        within = np.arange(total, dtype=np.int64) - np.repeat(starts, ns)
        exp = np.repeat(ns, ns) - 1 - within
        maxn = int(ns.max()) if len(ns) else 1
        pw = np.empty(max(maxn, 1), dtype=np.uint64)
        pw[0] = 1
        for k in range(1, maxn):
            pw[k] = pw[k - 1] * np.uint64(257)
        contrib = sh * pw[exp]
        # paired reduceat: zero-span docs (none in this corpus, guarded
        # anyway) reduce over an empty range → 0
        h = np.zeros(len(ns), dtype=np.uint64)
        has = ns > 0
        if has.any():
            ext = np.append(contrib, np.uint64(0))
            bounds = np.column_stack([starts[has], offs[1:][has]]).ravel()
            h[has] = np.add.reduceat(ext, bounds)[::2]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_spans": pa.array(ns),
                "seq_hash": pa.array(h.astype(np.int64)),
            }
        )

    return parsed_ds(sf_dir, keep_spans=True).select_columns(
        ["doc_id", "spans"]
    ).map_batches(fold, batch_format="pyarrow")
