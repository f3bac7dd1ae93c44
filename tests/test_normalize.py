"""Param-normalization truth-table tests: the vectorized M8/M9/M10/M11 layer
vs an independent scalar port of the reference cascade
(/root/reference/src/building/building-params.ts:41-147,
 roof-params.ts:81-125, facade-params.ts:19-33)."""

import math

import numpy as np
import pytest

from osm_data_3d_tiles_ray.stages.normalize import gather_ombb, normalize_params
from osm_data_3d_tiles_ray.stages.parse import parse_documents
from osm_data_3d_tiles_ray.synth.generator import generate_shard
from osm_data_3d_tiles_ray.tables.lookups import (
    DEFAULT_ROOF_BUILDING_EXCEPTIONS,
    FACADE_FALLBACK,
    FACADE_MATERIALS,
    ROOF_MATERIALS,
    ROOF_TYPES,
    WINDOWLESS_BUILDING_TYPES,
    parse_color,
)


def norm_scalar(p: dict) -> dict:
    """Literal scalar port of getBuildingParams (independent of the
    vectorized implementation)."""
    is_roof = p.get("building_type") == "roof"
    has_foundation = (not is_roof) and all(
        p.get(k) is None for k in ("levels", "min_level", "height", "min_height")
    )

    rt = ROOF_TYPES.get(p.get("roof_type"), "flat")
    supports = p.get("building_type") not in DEFAULT_ROOF_BUILDING_EXCEPTIONS
    no_default = (not supports) or rt != "flat"
    material = ROOF_MATERIALS.get(p.get("roof_material"), "default")
    color = parse_color(p.get("roof_color"))
    if (color is not None or no_default) and material == "default":
        material = "concrete"
    if color is None:
        if material == "concrete":
            color = 0xBBBBBB
        elif material == "metal":
            color = 0xA3CABD if p.get("roof_material") == "copper" else 0xC3D2DD
        elif material == "tiles":
            color = 0x8C8C97 if p.get("roof_material") == "slate" else 0xCB7D64
        else:
            color = 0xFFFFFF

    orientation = (
        p.get("roof_orientation")
        if p.get("roof_orientation") in ("along", "across")
        else None
    )

    rl = p.get("roof_levels")
    if rl is not None and rl <= 0:
        roof_levels = 0.6
    elif rl is None:
        roof_levels = 0.0 if rt == "flat" else 1.0
    else:
        roof_levels = rl
    roof_height = (
        p["roof_height"] if p.get("roof_height") is not None else roof_levels * 4
    )

    height = p.get("height")
    levels = p.get("levels")
    min_height = p.get("min_height")
    min_level = p.get("min_level")

    if height is not None:
        roof_height = min(
            roof_height, height - (min_height if min_height is not None else 0.0)
        )
    if height is None and levels is None:
        levels = min_level if min_level is not None else 1.0
        height = levels * 4 + roof_height
    elif height is None:
        height = levels * 4 + roof_height
    elif levels is None:
        levels = max(1.0, math.floor((height - roof_height) / 4 + 0.5))
    if min_level is None:
        if min_height is not None:
            min_level = min(levels - 1.0, math.floor(min_height / 4 + 0.5))
        else:
            min_level = 0.0
    if min_height is None:
        min_height = min(min_level * 4, height)

    fmat, fcolor_default = FACADE_MATERIALS.get(p.get("material"), FACADE_FALLBACK)
    pc_ = parse_color(p.get("color"))
    fcolor = pc_ if pc_ is not None else fcolor_default

    if p.get("windows") is not None:
        windows = p["windows"]
    else:
        windows = p.get("building_type") not in WINDOWLESS_BUILDING_TYPES
    if height - min_height - roof_height < 2:
        windows = False

    return {
        "building_levels": levels - min_level,
        "building_height": height,
        "building_min_height": (height - roof_height) if is_roof else min_height,
        "building_roof_height": roof_height,
        "roof_type": rt,
        "roof_orientation": orientation,
        "facade_material": fmat,
        "facade_color": fcolor,
        "roof_material": material,
        "roof_color": color,
        "windows": bool(windows),
        "foundation": has_foundation,
    }


@pytest.fixture(scope="module")
def normalized():
    docs, bldgs = generate_shard(0, 2000)
    parsed = parse_documents(docs)
    return bldgs, normalize_params(parsed)


def test_normalize_matches_scalar_port(normalized):
    bldgs, out = normalized
    rows = bldgs.to_pylist()
    got = out.to_pylist()
    for i, (row, g) in enumerate(zip(rows, got)):
        want = norm_scalar(row)
        for k, v in want.items():
            gv = g[k]
            if isinstance(v, float):
                assert gv == pytest.approx(v, abs=1e-12), (i, k, gv, v)
            else:
                assert gv == v, (i, k, gv, v)


def test_colors_parse_reference_examples():
    assert parse_color("red") == 0xFF0000
    assert parse_color("dark_red") == 0x8B0000
    assert parse_color("light blue") == 0xADD8E6
    assert parse_color("Slate-Gray") == 0x708090
    assert parse_color("#ff0000") == 0xFF0000
    assert parse_color("#a0B1c2") == 0xA0B1C2
    assert parse_color("white;red") is None  # normalized 'white;red' not in list, ';' head '#'-less
    assert parse_color("#ff0000;blue") == 0xFF0000
    assert parse_color("not a color") is None
    assert parse_color("") is None
    assert parse_color(None) is None
    assert parse_color("#12345") is None


def test_gather_ombb(normalized):
    docs, bldgs = generate_shard(0, 500)
    parsed = parse_documents(docs)
    t = gather_ombb(parsed)
    ombb = t.column("ombb").to_pylist()
    o00 = bldgs.column("ombb00").to_pylist()
    for row, first in zip(ombb, o00):
        if first is None:
            assert row is None
        else:
            assert row is not None and len(row) == 8 and row[0] == first
