"""Building parameter normalization — the M8/M9/M10/M11/M12 layer.

Vectorized (numpy / pyarrow) re-expression of the reference's per-feature
scalar cascade:

* ``getBuildingParams``  — ``/root/reference/src/building/building-params.ts:41-147``
* ``getRoofParams``      — ``/root/reference/src/building/roof-params.ts:81-125``
* ``getFacadeParamsFromTags`` — ``/root/reference/src/building/facade-params.ts:19-33``
* ``ColorParser``        — ``/root/reference/src/building/color-parser.ts:157-189``
* OMBB tag gather        — ``/root/reference/src/building/ombb-params.ts:6-21``

Documented deviation (SURVEY.md §2.2 M9): the reference reads camelCase keys
(``roofType``/``roofMaterial``/…) off a snake_case property bag, so with its
declared schema the fallback (flat/concrete-ish defaults) always wins.  This
engine implements the lookup tables keyed as *intended* (snake_case tags).

JS ``Math.round(x)`` ≡ ``floor(x + 0.5)`` — used verbatim so the DuckDB
oracle (``FLOOR(x + 0.5)``) is bit-identical.

Usable directly as ``ds.map_batches(normalize_params, batch_format="pyarrow")``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..constants import FALLBACK_LEVELS, LEVEL_HEIGHT
from ..tables.lookups import (
    DEFAULT_ROOF_BUILDING_EXCEPTIONS,
    FACADE_FALLBACK,
    FACADE_MATERIALS,
    ROOF_COLOR_COPPER,
    ROOF_COLOR_DEFAULT,
    ROOF_COLOR_SLATE,
    ROOF_MATERIAL_DEFAULT_COLOR,
    ROOF_MATERIALS,
    ROOF_TYPES,
    WINDOWLESS_BUILDING_TYPES,
    parse_color,
)

_ROUND = lambda x: np.floor(x + 0.5)  # noqa: E731  — JS Math.round


def _f64(table: pa.Table, name: str, n: int) -> np.ndarray:
    """Nullable float column → float64 ndarray with NaN for nulls."""
    if name not in table.column_names:
        return np.full(n, np.nan)
    col = table.column(name)
    return col.to_numpy(zero_copy_only=False).astype(np.float64)


def _str(table: pa.Table, name: str, n: int) -> np.ndarray:
    """Nullable string column → object ndarray with None for nulls."""
    if name not in table.column_names:
        return np.full(n, None, dtype=object)
    return np.asarray(table.column(name).to_pylist(), dtype=object)


def _map_strings(values: np.ndarray, fn) -> np.ndarray:
    """Apply a scalar fn over the *unique* values only, then scatter back."""
    uniq, inverse = np.unique(values.astype(str), return_inverse=True)
    is_none = values == None  # noqa: E711  — elementwise None test
    mapped = np.array([fn(u) for u in uniq], dtype=object)
    out = mapped[inverse]
    out[is_none] = fn(None)
    return out


def normalize_params(table: pa.Table) -> pa.Table:
    """Buildings (tag columns) → normalized parameter table.

    Expects the decoded-buildings schema (FIXTURES.md §2); emits one row per
    input row with the reference's derived parameters.  Carries ``osm_id``
    (and ``doc_id`` if present) through.
    """
    n = len(table)

    height_t = _f64(table, "height", n)
    levels_t = _f64(table, "levels", n)
    min_height_t = _f64(table, "min_height", n)
    min_level_t = _f64(table, "min_level", n)
    roof_height_t = _f64(table, "roof_height", n)
    roof_levels_t = _f64(table, "roof_levels", n)
    roof_direction = _f64(table, "roof_direction", n)

    building_type = _str(table, "building_type", n)
    roof_type_t = _str(table, "roof_type", n)
    roof_material_t = _str(table, "roof_material", n)
    roof_color_t = _str(table, "roof_color", n)
    roof_orientation_t = _str(table, "roof_orientation", n)
    material_t = _str(table, "material", n)
    color_t = _str(table, "color", n)
    name_t = _str(table, "name", n)

    is_roof = building_type == "roof"

    # foundation: no level/height tag at all and not building=roof
    # (building-params.ts:72-76)
    has_foundation = (
        ~is_roof
        & np.isnan(levels_t)
        & np.isnan(min_level_t)
        & np.isnan(height_t)
        & np.isnan(min_height_t)
    )

    # --- roof params (roof-params.ts:81-125, snake_case-keyed: see module doc)
    roof_type = _map_strings(roof_type_t, lambda v: ROOF_TYPES.get(v, "flat"))
    supports_default = _map_strings(
        building_type, lambda v: v not in DEFAULT_ROOF_BUILDING_EXCEPTIONS
    ).astype(bool)
    if "default_roof" in table.column_names:
        dr = table.column("default_roof")
        dr_np = dr.to_numpy(zero_copy_only=False)
        dr_valid = ~np.asarray(dr.is_null())
        supports_default = np.where(dr_valid, dr_np.astype(object), supports_default).astype(bool)
    no_default = (~supports_default) | (roof_type != "flat")

    roof_material = _map_strings(
        roof_material_t, lambda v: ROOF_MATERIALS.get(v, "default")
    )
    roof_color_parsed = _map_strings(roof_color_t, parse_color)
    roof_color_null = roof_color_parsed == None  # noqa: E711

    promote = ((~roof_color_null) | no_default) & (roof_material == "default")
    roof_material = np.where(promote, "concrete", roof_material).astype(object)

    default_color = np.full(n, ROOF_COLOR_DEFAULT, dtype=np.int64)
    for mat, col in ROOF_MATERIAL_DEFAULT_COLOR.items():
        default_color[roof_material == mat] = col
    default_color[(roof_material == "metal") & (roof_material_t == "copper")] = ROOF_COLOR_COPPER
    default_color[(roof_material == "tiles") & (roof_material_t == "slate")] = ROOF_COLOR_SLATE
    roof_color = np.where(
        roof_color_null, default_color, roof_color_parsed
    ).astype(np.int64)

    roof_orientation = np.where(
        (roof_orientation_t == "along") | (roof_orientation_t == "across"),
        roof_orientation_t,
        None,
    ).astype(object)

    # --- the height/levels cascade (building-params.ts:80-113)
    flat = roof_type == "flat"
    roof_levels = np.where(
        roof_levels_t <= 0,  # NaN compares False, matching JS undefined<=0
        0.6,
        np.where(np.isnan(roof_levels_t), np.where(flat, 0.0, 1.0), roof_levels_t),
    )
    roof_height = np.where(np.isnan(roof_height_t), roof_levels * LEVEL_HEIGHT, roof_height_t)

    height = height_t.copy()
    levels = levels_t.copy()
    min_height = min_height_t.copy()
    min_level = min_level_t.copy()

    has_h = ~np.isnan(height)
    roof_height = np.where(
        has_h,
        np.minimum(roof_height, height - np.where(np.isnan(min_height), 0.0, min_height)),
        roof_height,
    )

    case_a = np.isnan(height) & np.isnan(levels)
    levels = np.where(
        case_a, np.where(~np.isnan(min_level), min_level, float(FALLBACK_LEVELS)), levels
    )
    height = np.where(np.isnan(height), levels * LEVEL_HEIGHT + roof_height, height)
    levels = np.where(
        np.isnan(levels),
        np.maximum(1.0, _ROUND((height - roof_height) / LEVEL_HEIGHT)),
        levels,
    )

    min_level = np.where(
        np.isnan(min_level),
        np.where(
            ~np.isnan(min_height),
            np.minimum(levels - 1.0, _ROUND(min_height / LEVEL_HEIGHT)),
            0.0,
        ),
        min_level,
    )
    min_height = np.where(
        np.isnan(min_height), np.minimum(min_level * LEVEL_HEIGHT, height), min_height
    )

    # --- facade params (facade-params.ts:19-33)
    fac = _map_strings(material_t, lambda v: FACADE_MATERIALS.get(v, FACADE_FALLBACK))
    facade_material = np.array([f[0] for f in fac], dtype=object)
    facade_default_color = np.array([f[1] for f in fac], dtype=np.int64)
    color_parsed = _map_strings(color_t, parse_color)
    facade_color = np.where(
        color_parsed == None, facade_default_color, color_parsed  # noqa: E711
    ).astype(np.int64)

    # --- windows (building-params.ts:29-37,118-121)
    if "windows" in table.column_names:
        wcol = table.column("windows")
        w_valid = ~np.asarray(wcol.is_null())
        w_val = wcol.to_numpy(zero_copy_only=False)
        w_val = np.where(w_valid, w_val, False).astype(bool)
    else:
        w_valid = np.zeros(n, dtype=bool)
        w_val = np.zeros(n, dtype=bool)
    windows_default = ~np.isin(building_type.astype(str), list(WINDOWLESS_BUILDING_TYPES))
    windows = np.where(w_valid, w_val, windows_default)
    windows = np.where(height - min_height - roof_height < 2.0, False, windows).astype(bool)

    out: dict[str, pa.Array] = {}
    if "doc_id" in table.column_names:
        out["doc_id"] = table.column("doc_id")
    out["osm_id"] = table.column("osm_id")
    out["label"] = pa.array(name_t, type=pa.string())
    out["building_levels"] = pa.array(levels - min_level, type=pa.float64())
    out["building_height"] = pa.array(height, type=pa.float64())
    out["building_min_height"] = pa.array(
        np.where(is_roof, height - roof_height, min_height), type=pa.float64()
    )
    out["building_roof_height"] = pa.array(roof_height, type=pa.float64())
    out["roof_type"] = pa.array(roof_type, type=pa.string())
    out["roof_orientation"] = pa.array(roof_orientation, type=pa.string())
    out["roof_direction"] = pa.array(roof_direction, type=pa.float64())
    out["facade_material"] = pa.array(facade_material, type=pa.string())
    out["facade_color"] = pa.array(facade_color, type=pa.int64())
    out["roof_material"] = pa.array(roof_material, type=pa.string())
    out["roof_color"] = pa.array(roof_color, type=pa.int64())
    out["windows"] = pa.array(windows, type=pa.bool_())
    out["foundation"] = pa.array(has_foundation, type=pa.bool_())
    return pa.table(out)


def gather_ombb(table: pa.Table) -> pa.Table:
    """``ombb00..ombb31`` (8 scalar tag columns) → ``ombb:fixed_size_list(8)``.

    Reference: ``/root/reference/src/building/ombb-params.ts:6-21`` — null
    unless all 8 corners are present.
    """
    n = len(table)
    cols = [f"ombb{i}{j}" for i in range(4) for j in range(2)]
    stacked = np.stack([_f64(table, c, n) for c in cols], axis=1)
    valid = ~np.isnan(stacked).any(axis=1)
    flat = pa.array(stacked.reshape(-1), type=pa.float64())
    fsl = pa.FixedSizeListArray.from_arrays(flat, 8)
    if not valid.all():
        mask = pa.array(~valid)
        fsl = pa.compute.if_else(mask, pa.nulls(n, fsl.type), fsl)
    return table.append_column("ombb", fsl)
