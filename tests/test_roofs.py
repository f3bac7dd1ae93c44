"""Roof builder geometry tests: area/height invariants per builder."""

import numpy as np
import pytest

from osm_data_3d_tiles_ray.geom.roofs import (
    PROFILE_DOME,
    PROFILE_GABLED,
    PROFILE_ONION,
    PROFILE_ROUND,
    PROFILE_SALTBOX,
    build_curved_roof,
    build_flat_roof,
    build_hipped_roof,
    build_oriented_profile_roof,
    build_pyramidal_roof,
    build_skillion_roof,
    mansard_remap,
)


def regular_ring(k=8, r=10.0, closed=True):
    ang = -np.arange(k) / k * 2 * np.pi
    ring = np.stack([np.cos(ang) * r, np.sin(ang) * r], 1)
    return np.vstack([ring, ring[:1]]) if closed else ring


def rect_ring(w=10.0, h=4.0):
    ring = np.array([[0, 0], [0, h], [w, h], [w, 0]], float)
    return np.vstack([ring, ring[:1]])


def horiz_area(pos):
    t = pos.reshape(-1, 3, 3)
    a, b, c = t[:, 0], t[:, 1], t[:, 2]
    return (
        0.5
        * np.abs(
            (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
            - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
        ).sum()
    )


def test_flat_roof_area_and_height():
    ring = rect_ring()
    out = build_flat_roof(ring, np.array([0]), np.array([0], np.int8), z=7.0, texture_id=1)
    assert horiz_area(out["position"]) == pytest.approx(40.0)
    assert (out["position"][:, 2] == 7.0).all()
    assert (out["normal"][:, 2] > 0).all()


def test_gabled_covers_footprint_and_peaks_at_ridge():
    ring = rect_ring(w=12, h=6)
    out, hp = build_oriented_profile_roof(
        ring, min_height=8.0, roof_height=4.0, texture_id=1, profile=PROFILE_GABLED
    )
    pos = out["position"]
    assert horiz_area(pos) == pytest.approx(72.0)  # projected area = footprint
    assert pos[:, 2].max() == pytest.approx(12.0)
    assert pos[:, 2].min() == pytest.approx(8.0)
    # skirt points: corners at base (t=0/1 of profile)
    assert hp.min() == pytest.approx(8.0)


def test_gabled_concave_returns_none():
    L = np.array([[0, 0], [0, 2], [1, 2], [1, 1], [2, 1], [2, 0], [0, 0]], float)
    assert (
        build_oriented_profile_roof(
            L, min_height=0, roof_height=2, texture_id=1, profile=PROFILE_GABLED
        )
        is None
    )


@pytest.mark.parametrize("profile", [PROFILE_ROUND, PROFILE_SALTBOX])
def test_oriented_profiles_projected_area(profile):
    ring = rect_ring(w=20, h=8)
    out, _ = build_oriented_profile_roof(
        ring, min_height=5.0, roof_height=3.0, texture_id=1, profile=profile
    )
    assert horiz_area(out["position"]) == pytest.approx(160.0, rel=1e-6)
    z = out["position"][:, 2]
    assert z.max() == pytest.approx(8.0)


@pytest.mark.parametrize("profile,peak", [(PROFILE_DOME, 1.0), (PROFILE_ONION, 1.1764705882352942)])
def test_curved_roofs(profile, peak):
    ring = regular_ring(k=12, r=6)
    out = build_curved_roof(
        ring, np.array([0.0, 0.0]), min_height=10.0, roof_height=5.0,
        texture_id=2, profile=profile,
    )
    pos = out["position"]
    # projected area ≈ footprint of the 12-gon
    foot = 0.5 * 12 * np.sin(2 * np.pi / 12) * 36
    assert horiz_area(pos) == pytest.approx(foot, rel=1e-6)
    assert pos[:, 2].max() == pytest.approx(10.0 + 5.0 * peak)
    assert np.isfinite(pos).all()


def test_pyramidal_fan():
    ring = regular_ring(k=6, r=4)
    out = build_pyramidal_roof(ring, np.array([0.0, 0.0]), 3.0, 2.0, 1)
    foot = 0.5 * 6 * np.sin(2 * np.pi / 6) * 16
    assert horiz_area(out["position"]) == pytest.approx(foot, rel=1e-6)
    assert out["position"][:, 2].max() == pytest.approx(5.0)


def test_hipped_with_mansard_remap_monotone():
    p = np.linspace(0, 1, 100)
    h = mansard_remap(p)
    assert (np.diff(h) > -1e-9).all()
    assert h[0] == 0.0
    assert h[-1] == pytest.approx(1.0)


def test_skillion_slope_and_heightpoints():
    ring = rect_ring(w=10, h=10)
    coords = ring
    out, zs = build_skillion_roof(
        coords, np.array([0]), np.array([0], np.int8),
        direction_deg=0.0, min_height=4.0, roof_height=3.0, texture_id=1,
    )
    assert out["position"][:, 2].max() == pytest.approx(7.0)
    assert out["position"][:, 2].min() == pytest.approx(4.0)
    assert zs.max() == pytest.approx(7.0)


def test_gabled_skeleton_rectangle():
    from osm_data_3d_tiles_ray.geom.roofs import build_gabled_skeleton_roof
    from osm_data_3d_tiles_ray.geom.skeleton import skeleton_json

    rect = rect_ring(w=10, h=4)
    sk = skeleton_json(rect)
    out = build_gabled_skeleton_roof(rect, sk, min_height=6.0, roof_height=3.0, texture_id=1)
    assert out is not None
    pos = out["position"].reshape(-1, 3, 3)
    assert horiz_area(out["position"]) == pytest.approx(40.0, rel=1e-9)
    z = pos[:, :, 2]
    assert z.min() == pytest.approx(6.0)
    assert z.max() == pytest.approx(9.0)
    n = np.cross(pos[:, 1] - pos[:, 0], pos[:, 2] - pos[:, 0])
    vertical = np.abs(n[:, 2]) < 1e-9
    assert vertical.sum() == 2  # two gable ends
    apex_x = sorted(np.round(pos[vertical][:, 2, 0], 6))
    assert apex_x == [0.0, 10.0]  # ridge endpoints moved onto the end walls


def test_oriented_skirt_wedges_fill_ridge_crossing_segments():
    """Skirt parity (oriented-roof-builder.ts:389-473): ring segments that
    cross interior profile splits get exact wedge fill between the wall
    builder's linear top edge and the true piecewise profile — for a
    gabled profile on a rectangle these are the two triangular gable ends."""
    ring = rect_ring(w=12, h=6)
    out, hp = build_oriented_profile_roof(
        ring, min_height=8.0, roof_height=4.0, texture_id=1, profile=PROFILE_GABLED
    )
    pos = out["position"].reshape(-1, 3, 3)
    nrm = out["normal"].reshape(-1, 3, 3)
    # vertical triangles = the wedges (normal z == 0)
    vertical = np.abs(nrm[:, 0, 2]) < 1e-9
    wedges = pos[vertical]
    assert len(wedges) == 2  # one per gable end
    # each wedge: area = 0.5 * short-edge * roof_height, peak at the ridge
    for w in wedges:
        e1 = w[1] - w[0]
        e2 = w[2] - w[0]
        area = 0.5 * np.linalg.norm(np.cross(e1, e2))
        assert area == pytest.approx(0.5 * 6.0 * 4.0)
        assert w[:, 2].max() == pytest.approx(12.0)
        assert w[:, 2].min() == pytest.approx(8.0)
    # outward normals: one end faces -x, the other +x (ridge along x)
    wn = nrm[vertical][:, 0, :]
    assert sorted(round(v) for v in wn[:, 0]) == [-1, 1]
    assert np.allclose(wn[:, 1], 0, atol=1e-9)


def test_oriented_skirt_wedges_round_profile_watertight_ends():
    """ROUND profile (19-point arc): every interior split crossing on the
    end segments gets a wedge vertex — the end wall follows the arc."""
    ring = rect_ring(w=20, h=8)
    out, _ = build_oriented_profile_roof(
        ring, min_height=5.0, roof_height=3.0, texture_id=1, profile=PROFILE_ROUND
    )
    pos = out["position"].reshape(-1, 3, 3)
    nrm = out["normal"].reshape(-1, 3, 3)
    vertical = np.abs(nrm[:, 0, 2]) < 1e-9
    assert vertical.sum() >= 2 * (len(PROFILE_ROUND) - 2)  # fan per end
    # wedge area per end ≈ footprint-width × mean arc height above chord
    zmax = pos[vertical][:, :, 2].max()
    assert zmax == pytest.approx(8.0, abs=1e-6)


def test_flat_roof_clipped_reference_parity():
    """flat-roof-builders.ts parity: OMBB-frame UVs / texture scale, every
    triangle inside ONE integer UV cell with local [0,1] UVs, positions
    re-derived via the inverse transform (area preserved exactly)."""
    from osm_data_3d_tiles_ray.geom.roofs import build_flat_roof_clipped

    ring = np.array([[0, 0], [25, 0], [25, 14], [0, 14], [0, 0]], float)
    g = build_flat_roof_clipped(
        ring, np.array([0]), np.array([0], np.int8),
        z=7.0, texture_id=3, scale_xy=(10.0, 10.0),
    )
    pos = g["position"].reshape(-1, 3, 3)
    uv = g["uv"].reshape(-1, 3, 2)
    # projected area preserved through clip + inverse transform
    area = 0.5 * np.abs(
        np.cross(pos[:, 1, :2] - pos[:, 0, :2], pos[:, 2, :2] - pos[:, 0, :2])
    ).sum()
    assert area == pytest.approx(25.0 * 14.0)
    assert (pos[:, :, 2] == 7.0).all()
    # every triangle's UVs inside [0,1] — no wrap, no cross-cell span
    assert uv.min() >= -1e-9 and uv.max() <= 1 + 1e-9
    # 25x14 at scale 10 covers a 3x2 cell grid -> at least 6 cells tessellated
    assert len(pos) >= 6
    # UV deltas match position deltas / scale within each triangle (the
    # projection is affine per cell)
    duv = np.linalg.norm(uv[:, 1] - uv[:, 0], axis=1)
    dpos = np.linalg.norm(pos[:, 1, :2] - pos[:, 0, :2], axis=1)
    nz = duv > 1e-12
    assert np.allclose(dpos[nz] / duv[nz], 10.0, rtol=1e-5)  # float32 buffers


def test_flat_roof_clipped_with_hole():
    from osm_data_3d_tiles_ray.geom.roofs import build_flat_roof_clipped

    coords = np.array(
        [[0, 0], [30, 0], [30, 20], [0, 20], [0, 0],
         [10, 5], [20, 5], [20, 15], [10, 15], [10, 5]], float
    )
    g = build_flat_roof_clipped(
        coords, np.array([0, 5]), np.array([0, 1], np.int8),
        z=4.0, texture_id=3, scale_xy=(10.0, 10.0),
    )
    pos = g["position"].reshape(-1, 3, 3)
    area = 0.5 * np.abs(
        np.cross(pos[:, 1, :2] - pos[:, 0, :2], pos[:, 2, :2] - pos[:, 0, :2])
    ).sum()
    assert area == pytest.approx(30 * 20 - 10 * 10)


def test_build3d_flat_uv_clip_mode(ray_session):
    """The opt-in Build3D mode produces the same building set with larger
    flat-roof tessellation and in-frame UVs."""
    from osm_data_3d_tiles_ray.stages.build3d import Build3DStats
    from osm_data_3d_tiles_ray.stages.parse import parse_documents
    from osm_data_3d_tiles_ray.synth.generator import generate_shard

    docs, _ = generate_shard(0, 300)
    parsed = parse_documents(docs, keep_spans=False)
    base = Build3DStats()(parsed)
    clip = Build3DStats(flat_uv_clip=True)(parsed)
    assert clip.num_rows == base.num_rows
    rb = dict(zip(base.column("osm_id").to_pylist(), base.column("roof_type_used").to_pylist()))
    rc = dict(zip(clip.column("osm_id").to_pylist(), clip.column("roof_type_used").to_pylist()))
    assert rb == rc  # dispatch unchanged
    vb = sum(base.column("roof_vertices").to_pylist())
    vc = sum(clip.column("roof_vertices").to_pylist())
    assert vc > vb  # per-cell tessellation multiplies flat roof triangles
