"""Span parser round trip vs the independently generated flat truth table,
plus the per-row span-sequence invariant (BASELINE.json input_hint)."""

import numpy as np
import pytest

from osm_data_3d_tiles_ray.stages.parse import parse_documents, span_signature
from osm_data_3d_tiles_ray.synth.generator import generate_shard

TAGS = [
    "osm_id", "osm_type", "height", "levels", "min_height", "min_level",
    "roof_height", "roof_levels", "roof_type", "roof_material",
    "roof_orientation", "roof_direction", "roof_color", "material", "color",
    "building_type", "windows", "is_part", "name", "skeleton",
    "ombb00", "ombb31", "minx", "miny", "maxx", "maxy",
    "centroid_x", "centroid_y",
]


@pytest.fixture(scope="module")
def shard():
    docs, bldgs = generate_shard(0, 2000)
    return docs, bldgs, parse_documents(docs)


def _eq(x, y):
    if x is None and y is None:
        return True
    if isinstance(x, float) and isinstance(y, float):
        return x == y or (np.isnan(x) and np.isnan(y))
    return x == y


@pytest.mark.parametrize("col", TAGS)
def test_tag_column_roundtrip(shard, col):
    _, bldgs, parsed = shard
    a = parsed.column(col).to_pylist()
    b = bldgs.column(col).to_pylist()
    assert all(_eq(x, y) for x, y in zip(a, b)), col


def test_geometry_roundtrip_bit_exact(shard):
    _, bldgs, parsed = shard
    assert parsed.column("coords").to_pylist() == bldgs.column("coords").to_pylist()
    assert (
        parsed.column("ring_offsets").to_pylist()
        == bldgs.column("ring_offsets").to_pylist()
    )
    assert (
        parsed.column("ring_roles").to_pylist() == bldgs.column("ring_roles").to_pylist()
    )


def test_all_rows_geom_valid(shard):
    _, _, parsed = shard
    assert all(parsed.column("geom_valid").to_pylist())


def test_span_sequence_invariant_preserved(shard):
    docs, _, parsed = shard
    sig_in = span_signature(docs).to_pylist()
    sig_out = span_signature(parsed).to_pylist()
    assert sig_in == sig_out


def test_generator_deterministic_and_seekable():
    d1, b1 = generate_shard(0, 200)
    d2, _ = generate_shard(0, 200)
    assert d1.equals(d2)
    # O(1) seek: rows [100, 200) generated standalone equal the tail slice
    d3, b3 = generate_shard(100, 100)
    assert d3.equals(d1.slice(100, 100).combine_chunks())
    assert b3.equals(b1.slice(100, 100).combine_chunks())


def test_offsets_monotonic(shard):
    docs, _, _ = shard
    for row in docs.column("spans").to_pylist()[:200]:
        offs = [s["offset"] for s in row]
        assert offs == sorted(offs)
        assert len(set(offs)) == len(offs)
