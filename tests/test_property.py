"""Property-based tests (hypothesis) for the geometry kernels and the
span invariant through a write/read materialization boundary."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_data_3d_tiles_ray.geom.earcut import triangulate
from osm_data_3d_tiles_ray.geom.hull import convex_hull, ombb
from osm_data_3d_tiles_ray.geom.rings import ring_signed_areas
from osm_data_3d_tiles_ray.geom.skeleton import compute_straight_skeleton
from osm_data_3d_tiles_ray.geom.transforms import (
    cell_id,
    cell_to_tile,
    lonlat_to_mercator,
    mercator_to_lonlat,
    mercator_to_tile,
)


def _tri_area(pts, tris):
    a, b, c = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
    return 0.5 * np.abs(
        (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
        - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
    ).sum()


@settings(max_examples=60, deadline=None)
@given(
    st.integers(4, 14),
    st.integers(0, 2**31 - 1),
)
def test_earcut_star_polygon_area(k, seed):
    rng = np.random.default_rng(seed)
    r = 1 + rng.random(k) * 4
    ang = -np.arange(k) / k * 2 * np.pi + rng.random()
    poly = np.stack([np.cos(ang) * r, np.sin(ang) * r], 1)
    truth = abs(ring_signed_areas(poly, np.array([0, len(poly)]))[0])
    tris = triangulate(poly)
    assert len(tris) == k - 2
    assert abs(_tri_area(poly, tris) - truth) < 1e-9 * max(1, truth)


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(4, 30))
def test_ombb_contains_hull(seed, n):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((n, 2)) * 5
    corners, area = ombb(pts)
    h = convex_hull(pts)
    # every hull point inside the box (within tolerance)
    u = corners[1] - corners[0]
    v = corners[3] - corners[0]
    lu, lv = np.linalg.norm(u), np.linalg.norm(v)
    if lu < 1e-12 or lv < 1e-12:
        return
    rel = h - corners[0]
    pu = rel @ (u / lu)
    pv = rel @ (v / lv)
    assert (pu > -1e-6).all() and (pu < lu + 1e-6).all()
    assert (pv > -1e-6).all() and (pv < lv + 1e-6).all()


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_skeleton_vertices_inside_polygon(seed):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-8, 8, (rng.integers(4, 12), 2))
    h = convex_hull(pts)
    if len(h) < 3:
        return
    out = compute_straight_skeleton(h)
    assert out is not None
    verts, faces = out
    sk = verts[len(h):]
    # all skeleton vertices inside (or on) the hull
    for p in sk:
        for i in range(len(h)):
            a, b = h[i], h[(i + 1) % len(h)]
            cross = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
            assert cross > -1e-6 * (1 + np.abs(h).max())


@settings(max_examples=100, deadline=None)
@given(
    st.floats(-179.9, 179.9),
    st.floats(-84.9, 84.9),
)
def test_mercator_roundtrip(lon, lat):
    x, y = lonlat_to_mercator(np.array([lon]), np.array([lat]))
    lon2, lat2 = mercator_to_lonlat(x, y)
    assert abs(lon2[0] - lon) < 1e-9
    assert abs(lat2[0] - lat) < 1e-9


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 65535), st.integers(0, 65535))
def test_cell_id_roundtrip(tx, ty):
    cid = cell_id(np.array([tx]), np.array([ty]))
    z, tx2, ty2 = cell_to_tile(cid)
    assert z[0] == 16 and tx2[0] == tx and ty2[0] == ty


def test_span_invariant_through_parquet_roundtrip(tmp_path):
    from osm_data_3d_tiles_ray.stages.parse import parse_documents, span_signature
    from osm_data_3d_tiles_ray.synth.generator import generate_shard

    docs, _ = generate_shard(0, 500)
    parsed = parse_documents(docs, keep_spans=True)
    pq.write_table(parsed, tmp_path / "parsed.parquet")
    back = pq.read_table(tmp_path / "parsed.parquet")
    assert span_signature(back).to_pylist() == span_signature(docs).to_pylist()
    # offsets preserved too (signature covers kind/text/media_ref + order)
    assert back.column("spans").to_pylist() == docs.column("spans").to_pylist()
