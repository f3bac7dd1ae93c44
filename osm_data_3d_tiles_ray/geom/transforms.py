"""Coordinate transforms + tile/cell indexing (vectorized numpy).

Reference parity:
* 3857↔4326 and ECEF/ENU math — ``/root/reference/src/tileset/utils.ts:31-48``,
  ``/root/reference/src/tileset/region.ts:98-140``.
* XYZ tile keying (``z_x_y``) — ``/root/reference/src/b3dmGenerator.ts:95``,
  ``/root/reference/src/tileset/region.ts:74``.
* The ``cell_id`` is an interleaved-bit Z-order (Morton) key over
  ``(tile_x, tile_y)`` with the zoom in the high bits — the engine's
  H3/S2-style spatial index stand-in (SURVEY.md §1.3).
"""

from __future__ import annotations

import numpy as np

from ..constants import LEAF_ZOOM, WGS84_A, WGS84_E2, WORLD_HALF, tile_size

# ---------------------------------------------------------------------------
# EPSG:3857 <-> EPSG:4326


def mercator_to_lonlat(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(x, dtype=np.float64) / WORLD_HALF * 180.0
    lat = (
        np.degrees(2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / WORLD_HALF * np.pi)))
        - 90.0
    )
    return lon, lat


def lonlat_to_mercator(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(lon, dtype=np.float64) / 180.0 * WORLD_HALF
    rad = np.radians(np.asarray(lat, dtype=np.float64))
    y = np.log(np.tan(np.pi / 4.0 + rad / 2.0)) / np.pi * WORLD_HALF
    return x, y


# ---------------------------------------------------------------------------
# XYZ tile math


def mercator_to_tile(
    x: np.ndarray, y: np.ndarray, zoom: int = LEAF_ZOOM
) -> tuple[np.ndarray, np.ndarray]:
    """Mercator meters → integer XYZ tile coords (y grows downward from the top)."""
    t = tile_size(zoom)
    n = (1 << zoom) - 1
    tx = np.clip(np.floor((np.asarray(x, np.float64) + WORLD_HALF) / t), 0, n).astype(np.int32)
    ty = np.clip(np.floor((WORLD_HALF - np.asarray(y, np.float64)) / t), 0, n).astype(np.int32)
    return tx, ty


def tile_extent(tx: np.ndarray, ty: np.ndarray, zoom: int = LEAF_ZOOM) -> np.ndarray:
    """(n,4) [minx, miny, maxx, maxy] Mercator extent of tiles."""
    t = tile_size(zoom)
    tx = np.asarray(tx, np.float64)
    ty = np.asarray(ty, np.float64)
    minx = -WORLD_HALF + tx * t
    maxy = WORLD_HALF - ty * t
    return np.stack([minx, maxy - t, minx + t, maxy], axis=-1)


def tile_center(tx: np.ndarray, ty: np.ndarray, zoom: int = LEAF_ZOOM) -> tuple[np.ndarray, np.ndarray]:
    ext = tile_extent(tx, ty, zoom)
    return (ext[..., 0] + ext[..., 2]) / 2.0, (ext[..., 1] + ext[..., 3]) / 2.0


# ---------------------------------------------------------------------------
# Z-order (Morton) cell ids


def _part1by1_32(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of v so there is a zero bit between each."""
    v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact1by1_32(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def cell_id(tx: np.ndarray, ty: np.ndarray, zoom: int = LEAF_ZOOM) -> np.ndarray:
    """uint64 cell key: zoom in bits 58..63, Morton(x,y) in the low bits."""
    m = _part1by1_32(np.asarray(tx)) | (_part1by1_32(np.asarray(ty)) << np.uint64(1))
    return (np.uint64(zoom) << np.uint64(58)) | m


def cell_to_tile(cid: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cid = np.asarray(cid, np.uint64)
    zoom = (cid >> np.uint64(58)).astype(np.int32)
    m = cid & ((np.uint64(1) << np.uint64(58)) - np.uint64(1))
    tx = _compact1by1_32(m).astype(np.int32)
    ty = _compact1by1_32(m >> np.uint64(1)).astype(np.int32)
    return zoom, tx, ty


def parent_cell(cid: np.ndarray, parent_zoom: int) -> np.ndarray:
    zoom, tx, ty = cell_to_tile(cid)
    shift = zoom - parent_zoom
    return cell_id(tx >> shift, ty >> shift, parent_zoom)


# ---------------------------------------------------------------------------
# WGS84 ECEF / ENU (reference: src/tileset/utils.ts:18-48)


def lonlat_to_ecef(lon_rad, lat_rad, h=0.0):
    sin_lat = np.sin(lat_rad)
    cos_lat = np.cos(lat_rad)
    n = WGS84_A / np.sqrt(1.0 - WGS84_E2 * sin_lat * sin_lat)
    x = (n + h) * cos_lat * np.cos(lon_rad)
    y = (n + h) * cos_lat * np.sin(lon_rad)
    z = (n * (1.0 - WGS84_E2) + h) * sin_lat
    return np.stack([x, y, z], axis=-1)


def enu_basis_ecef(lon_rad: float, lat_rad: float) -> np.ndarray:
    """Rows E, N, U of the local tangent basis at (lon, lat)."""
    sl, cl = np.sin(lon_rad), np.cos(lon_rad)
    sp, cp = np.sin(lat_rad), np.cos(lat_rad)
    e = np.array([-sl, cl, 0.0])
    n = np.array([-sp * cl, -sp * sl, cp])
    u = np.array([cp * cl, cp * sl, sp])
    return np.stack([e, n, u])


# ---------------------------------------------------------------------------
# Lambert-93 / EPSG:2154 (reference: src/tileset/customBox.ts:10-16 —
# "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 +x_0=700000
#  +y_0=6600000 +ellps=GRS80") — Lambert Conformal Conic 2SP forward,
# Snyder, "Map Projections: A Working Manual", eqs. 15-1..15-10.

_GRS80_A = 6378137.0
_GRS80_F = 1.0 / 298.257222101
_GRS80_E2 = _GRS80_F * (2.0 - _GRS80_F)
_GRS80_E = float(np.sqrt(_GRS80_E2))

_L93_LAT0 = np.radians(46.5)
_L93_LAT1 = np.radians(49.0)
_L93_LAT2 = np.radians(44.0)
_L93_LON0 = np.radians(3.0)
_L93_X0 = 700000.0
_L93_Y0 = 6600000.0


def _lcc_m(phi):
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - _GRS80_E2 * s * s)


def _lcc_t(phi):
    s = np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - _GRS80_E * s) / (1.0 + _GRS80_E * s)
    ) ** (_GRS80_E / 2.0)


_L93_N = (np.log(_lcc_m(_L93_LAT1)) - np.log(_lcc_m(_L93_LAT2))) / (
    np.log(_lcc_t(_L93_LAT1)) - np.log(_lcc_t(_L93_LAT2))
)
_L93_FF = _lcc_m(_L93_LAT1) / (_L93_N * _lcc_t(_L93_LAT1) ** _L93_N)
_L93_RHO0 = _GRS80_A * _L93_FF * _lcc_t(_L93_LAT0) ** _L93_N


def lambert93_forward(lon_deg, lat_deg):
    """(lon°, lat°) → EPSG:2154 (x, y) metres — vectorized.

    Exact property: the projection origin (3°E, 46.5°N) maps to the false
    origin (700000, 6600000)."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    rho = _GRS80_A * _L93_FF * _lcc_t(lat) ** _L93_N
    theta = _L93_N * (lon - _L93_LON0)
    x = _L93_X0 + rho * np.sin(theta)
    y = _L93_Y0 + _L93_RHO0 - rho * np.cos(theta)
    return x, y


def mercator_to_lambert93(mx, my):
    """EPSG:3857 → EPSG:2154 (the customBox projection path)."""
    lon, lat = mercator_to_lonlat(mx, my)
    return lambert93_forward(lon, lat)
