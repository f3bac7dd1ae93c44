"""Shared numeric constants of the tiling scheme and building model.

Derived from the reference repo's observable configuration:

* Web-Mercator (EPSG:3857) XYZ tile grid, unit of work = one z16 tile
  (``/root/reference/src/b3dmGenerator.ts:40,95`` — ``createXYZ({tileSize:512})``,
  fetch ``…/16/{x}/{y}.pbf``).
* tileset fan-out z12 → z16 (``/root/reference/generate-tileset.ts:39``).
* ``LEVEL_HEIGHT = 4`` (``/root/reference/src/building/building-params.ts:6``).
* ``TILE_HEIGHT = 300``, ``geometricError = 512``, ``refine = 'ADD'``
  (``/root/reference/src/tileset/utils.ts:3``, ``generate-tileset.ts``).
"""

import numpy as np

# EPSG:3857 half-world extent: pi * WGS84 semi-major axis.
WORLD_HALF = 20037508.342789244

# Zoom levels of the two-level tile tree.
LEAF_ZOOM = 16
ROOT_ZOOM = 12

# Tile edge length in Mercator meters at a zoom level.
def tile_size(zoom: int) -> float:
    return 2.0 * WORLD_HALF / (1 << zoom)


TILE_SIZE_Z16 = tile_size(LEAF_ZOOM)  # ≈ 611.49622628 m

# Building parameter model (reference: building-params.ts).
LEVEL_HEIGHT = 4.0
FALLBACK_LEVELS = 1

# Tileset constants (reference: src/tileset/utils.ts:3, generate-tileset.ts).
TILE_HEIGHT = 300.0
GEOMETRIC_ERROR = 512.0
REFINE = "ADD"

# Facade window width: 4 * mercatorScale (reference: src/building/builder.ts:26,345).
MERCATOR_SCALE = 1.52122668
WINDOW_WIDTH = 4.0 * MERCATOR_SCALE

# Wall smooth-normal threshold in degrees (reference: src/building/walls-builder.ts:8).
SMOOTH_NORMALS_THRESHOLD_DEG = 30.0

# WGS84 ellipsoid (reference: src/tileset/utils.ts:31-48).
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)

UINT64 = np.uint64
