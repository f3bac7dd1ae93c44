"""S2-analog spherical cell index: cube-face projection + quadratic ST
warp + Hilbert curve linearization, fully vectorized.

The north-star operator set names "batched H3/S2 cell encoding of
building footprints" and "S2 covering caches" as first-class stages; the
reference addresses space by z16 web-mercator tiles only
(``/root/reference/generate-tileset.ts:37-65``), so this module is the
companion spherical index a multi-region deployment would key shards by:
unlike mercator tiles, S2-style cells have near-uniform area at all
latitudes and a single space-filling-curve id space with no
pole/antimeridian seams.

Design (public S2 geometry, reimplemented from the published definition,
not any library's code):

* lon/lat → unit sphere → dominant cube face (6 faces, +x +y +z -x -y -z)
  with (u, v) in [-1, 1] the gnomonic coordinates on that face;
* the quadratic ST transform ``s = 1/2·sqrt(1+3u)  (u ≥ 0)`` /
  ``1 − 1/2·sqrt(1−3u)  (u < 0)`` that equalizes cell areas;
* ``i = floor(s·2^level)`` clamped to [0, 2^level−1], same for j;
* a Hilbert curve position ``d`` over the (i, j) grid (the classic
  reflect-rotate recurrence, vectorized over whole arrays — one pass per
  level, not per row);
* cell id ``face·4^level + d`` — adjacent ids are spatially adjacent
  within a face, so range-partitioning by cell id gives shard locality
  exactly like the Morton shard key in ``pipelines/geo.q_zorder``.

Every float expression here is mirrored term-for-term by the DuckDB
oracle SQL (``__ray_entry__._s2_cells_sql``); the Hilbert recurrence is
mirrored as a recursive CTE with identical integer arithmetic (the
``mod s`` formulation, equivalent to the textbook full-width reflect
because only bits below ``s`` are ever read afterwards).
"""

from __future__ import annotations

import numpy as np

from ..constants import WORLD_HALF

__all__ = [
    "hilbert_xy2d",
    "hilbert_d2xy",
    "s2_cell_from_mercator",
    "s2_face_uv",
]


def hilbert_xy2d(level: int, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Hilbert-curve position of grid cells (i, j) on a 2^level × 2^level
    grid — vectorized: ``level`` passes over the whole array, zero
    per-row Python.  Uses the mod-s reflection (x, y are reduced mod s
    as bits are consumed), bit-identical to the oracle's recursive CTE."""
    x = np.asarray(i, dtype=np.int64).copy()
    y = np.asarray(j, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (level - 1)
    while s > 0:
        rx = (x & s) > 0
        ry = (y & s) > 0
        d += s * s * ((3 * rx.astype(np.int64)) ^ ry.astype(np.int64))
        # rotate/reflect the quadrant-local coordinates (mod-s form)
        xm = x % s
        ym = y % s
        swap = ~ry
        flip = swap & rx
        nx = np.where(swap, ym, xm)
        ny = np.where(swap, xm, ym)
        nx = np.where(flip, s - 1 - ym, nx)
        ny = np.where(flip, s - 1 - xm, ny)
        x, y = nx, ny
        s >>= 1
    return d


def hilbert_d2xy(level: int, d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`hilbert_xy2d` (bottom-up bit replay) — used by
    the tests to assert bijectivity and by neighbor expansion."""
    t = np.asarray(d, dtype=np.int64).copy()
    x = np.zeros_like(t)
    y = np.zeros_like(t)
    s = np.int64(1)
    n = np.int64(1) << level
    while s < n:
        rx = (t // 2) & 1
        ry = (t ^ rx) & 1
        # inverse rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        fx = np.where(flip, s - 1 - x, x)
        fy = np.where(flip, s - 1 - y, y)
        nx = np.where(swap, fy, fx)
        ny = np.where(swap, fx, fy)
        x = nx + s * rx
        y = ny + s * ry
        t //= 4
        s <<= 1
    return x, y


def s2_face_uv(
    lon: np.ndarray, lat: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Dominant cube face and gnomonic (u, v) for lon/lat in RADIANS.

    Face layout (the published S2 convention): 0=+x 1=+y 2=+z 3=−x
    4=−y 5=−z; ties broken x-then-y-then-z with ``>=`` — written as
    explicit comparisons (not argmax) so the SQL mirror's CASE chain
    is guaranteed the same tie order."""
    cl = np.cos(lat)
    x = cl * np.cos(lon)
    y = cl * np.sin(lon)
    z = np.sin(lat)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    cx = (ax >= ay) & (ax >= az)
    cy = ~cx & (ay >= az)
    cz = ~cx & ~cy
    face = np.where(cx, np.where(x > 0, 0, 3), 0)
    face = np.where(cy, np.where(y > 0, 1, 4), face)
    face = np.where(cz, np.where(z > 0, 2, 5), face)
    u = np.empty_like(x)
    v = np.empty_like(x)
    # per-face (u, v) — the standard S2 face frames
    for f, (ue, ve) in enumerate(
        [
            (lambda: y / x, lambda: z / x),  # 0: +x
            (lambda: -x / y, lambda: z / y),  # 1: +y
            (lambda: -x / z, lambda: -y / z),  # 2: +z
            (lambda: z / x, lambda: y / x),  # 3: -x
            (lambda: z / y, lambda: -x / y),  # 4: -y
            (lambda: -y / z, lambda: -x / z),  # 5: -z
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face.astype(np.int64), u, v


def _st(u: np.ndarray) -> np.ndarray:
    """Quadratic area-equalizing UV→ST warp (published S2 transform)."""
    # np.where evaluates both branches — clamp the radicand of the
    # UNSELECTED branch to dodge NaN warnings (selected values unchanged:
    # u >= 0 ⇒ 1+3u >= 1, u < 0 ⇒ 1−3u > 1)
    return np.where(
        u >= 0.0,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


def s2_cell_from_mercator(
    cx: np.ndarray, cy: np.ndarray, level: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """EPSG:3857 meters → (face, i, j, cell_id) at ``level``.

    The mercator→lat expression is the exact sequence the oracle SQL
    mirrors: ``lat = 2·atan(exp(y/W·π)) − π/2`` (Gudermannian), not a
    rearrangement — float parity feeds integer floor() outputs."""
    g = np.asarray(cy, dtype=np.float64) / WORLD_HALF * np.pi
    lat = 2.0 * np.arctan(np.exp(g)) - np.pi / 2.0
    lon = np.asarray(cx, dtype=np.float64) / WORLD_HALF * np.pi
    face, u, v = s2_face_uv(lon, lat)
    n = np.int64(1) << level
    i = np.clip(np.floor(_st(u) * n), 0, n - 1).astype(np.int64)
    j = np.clip(np.floor(_st(v) * n), 0, n - 1).astype(np.int64)
    d = hilbert_xy2d(level, i, j)
    cell = face * (np.int64(1) << (2 * level)) + d
    return face, i, j, cell
