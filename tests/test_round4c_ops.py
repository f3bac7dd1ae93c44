"""Brute-force oracles for the round-4 session-C operators: the Morton
(Z-order) bit-spread, the media-density family extraction + tile
assignment, and the integer-shoelace ring-area kernel.  The DuckDB
oracles check all three end-to-end at sf0.01 through the driver; these
lock the kernels against adversarial shapes (multi-ring with holes,
degenerate 0/1-vertex rings, empty buildings, chunked columns)."""

import numpy as np
import pyarrow as pa
import pytest

from osm_data_3d_tiles_ray.pipelines.geo import morton32, ring_areas_batch


def _morton_scalar(tx: int, ty: int) -> int:
    out = 0
    for b in range(16):
        out |= ((tx >> b) & 1) << (2 * b)
        out |= ((ty >> b) & 1) << (2 * b + 1)
    return out


def test_morton32_matches_bitwise_reference():
    rng = np.random.default_rng(7)
    tx = rng.integers(0, 1 << 16, 500)
    ty = rng.integers(0, 1 << 16, 500)
    m = morton32(tx, ty)
    for i in range(len(tx)):
        assert m[i] == _morton_scalar(int(tx[i]), int(ty[i]))


def test_morton32_locality_prefix():
    # two tiles in the same 2^k-aligned square share the top 2*(16-k) bits
    tx = np.array([0x1234, 0x1237], dtype=np.int64)
    ty = np.array([0xABC0, 0xABC3], dtype=np.int64)
    m = morton32(tx, ty)
    assert (m[0] >> 8) == (m[1] >> 8)
    # corners of the grid map to the extremes
    assert morton32(np.array([0]), np.array([0]))[0] == 0
    assert morton32(np.array([0xFFFF]), np.array([0xFFFF]))[0] == (1 << 32) - 1


def _scalar_ring_areas(rows):
    out = []
    for osm_id, coords, roffs in rows:
        nv = len(coords) // 2
        q = [
            (
                int(np.floor(coords[2 * i] * 1000.0 + 0.5)),
                int(np.floor(coords[2 * i + 1] * 1000.0 + 0.5)),
            )
            for i in range(nv)
        ]
        for ri, st in enumerate(roffs):
            en = roffs[ri + 1] if ri + 1 < len(roffs) else nv
            a = 0
            for i in range(st, en - 1):
                a += q[i][0] * (q[i + 1][1] - q[i][1]) - (
                    q[i + 1][0] - q[i][0]
                ) * q[i][1]
            out.append((osm_id, ri, en - st, a))
    return sorted(out)


def _run_kernel(rows):
    tbl = pa.table(
        {
            "osm_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "coords": pa.array(
                [list(map(float, r[1])) for r in rows],
                type=pa.list_(pa.float64()),
            ),
            "ring_offsets": pa.array(
                [list(r[2]) for r in rows], type=pa.list_(pa.int32())
            ),
        }
    )
    res = ring_areas_batch(tbl)
    return sorted(
        zip(
            res.column("osm_id").to_pylist(),
            res.column("ring_idx").to_pylist(),
            res.column("ring_nv").to_pylist(),
            res.column("area2_mm2").to_pylist(),
        )
    )


def _closed_square(cx, cy, s):
    pts = [
        (cx - s, cy - s),
        (cx + s, cy - s),
        (cx + s, cy + s),
        (cx - s, cy + s),
        (cx - s, cy - s),
    ]
    return [v for p in pts for v in p]


def test_ring_areas_square_with_hole():
    outer = _closed_square(1000.0, 2000.0, 10.0)  # CCW, area (20m)^2
    h = _closed_square(1000.0, 2000.0, 2.0)
    pairs = list(zip(h[0::2], h[1::2]))[::-1]  # reverse point order
    hole = [v for p in pairs for v in p]
    rows = [(7, outer + hole, [0, 5])]
    got = _run_kernel(rows)
    assert got == _scalar_ring_areas(rows)
    # outer: doubled area = 2 * (20000 mm)^2 (CCW positive)
    assert got[0] == (7, 0, 5, 2 * (20000 * 20000))
    # hole: reversed winding → negative, 2 * (4000 mm)^2
    assert got[1] == (7, 1, 5, -2 * (4000 * 4000))


def test_ring_areas_adversarial_shapes():
    rng = np.random.default_rng(11)
    rows = []
    # empty building, 1-vertex ring, 2-vertex (degenerate edge) ring
    rows.append((1, [], []))
    rows.append((2, [5.0, 5.0], [0]))
    rows.append((3, [0.0, 0.0, 3.0, 4.0], [0]))
    # multi-ring buildings with irregular vertex counts
    for osm in range(4, 14):
        coords, roffs = [], []
        for _ in range(rng.integers(1, 4)):
            roffs.append(len(coords) // 2)
            cx, cy = rng.uniform(-1e5, 1e5, 2)
            n = int(rng.integers(3, 9))
            ang = np.sort(rng.uniform(0, 2 * np.pi, n))
            ring = []
            for a in ang:
                ring += [cx + 50 * np.cos(a), cy + 50 * np.sin(a)]
            ring += ring[:2]  # close
            coords += ring
        rows.append((osm, coords, roffs))
    # trailing 1-vertex ring at the very end of the batch (clamp path)
    rows.append((99, [1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 9.0, 9.0], [0, 3]))
    got = _run_kernel(rows)
    want = _scalar_ring_areas(rows)
    assert got == want
    # degenerate rings report area 0
    d = {(o, r): a for o, r, _, a in got}
    assert d[(1, 0)] if (1, 0) in d else True  # empty building emits no ring
    assert all((o, r) != (1, 0) for o, r, _, _ in got)
    assert d[(2, 0)] == 0 and d[(99, 1)] == 0


def test_ring_areas_batch_split_invariance():
    rng = np.random.default_rng(23)
    rows = []
    for osm in range(1, 40):
        cx, cy = rng.uniform(0, 1e6, 2)
        rows.append((osm, _closed_square(cx, cy, float(rng.uniform(1, 30))), [0]))
    whole = _run_kernel(rows)
    split = sorted(
        sum((_run_kernel(rows[i : i + 7]) for i in range(0, len(rows), 7)), [])
    )
    assert whole == split


SF = "/root/testdata/sf0.001"
_SYNTH = "/tmp/osm3d_synth/sf0.001"
_W = 20037508.342789244
_T = 40075016.685578488 / 65536.0


def _buildings():
    import glob

    import pyarrow.parquet as pq

    import pyarrow.dataset as pds

    return pds.dataset(sorted(__import__("glob").glob(f"{_SYNTH}/buildings/*.parquet"))).to_table()


def test_rasterize_brute_force(ray_session):
    from collections import defaultdict

    from osm_data_3d_tiles_ray.pipelines.geo import q_rasterize

    got = q_rasterize(SF).to_pandas()
    b = _buildings().to_pylist()
    cells = defaultdict(lambda: [0, 0, 0])
    for r in b:
        tx0 = int(np.floor((r["minx"] + _W) / _T))
        ty0 = int(np.floor((_W - r["maxy"]) / _T))
        tx1 = int(np.floor((r["maxx"] + _W) / _T))
        ty1 = int(np.floor((_W - r["miny"]) / _T))
        h = r["height"]
        hdm = int(np.floor(h * 10 + 0.5)) if h is not None and np.isfinite(h) else 0
        for cx in range(tx0, tx1 + 1):
            for cy in range(ty0, ty1 + 1):
                c = cells[(cx, cy)]
                c[0] += 1
                c[1] = max(c[1], hdm)
                c[2] += hdm
    want = sorted((k[0], k[1], v[0], v[1], v[2]) for k, v in cells.items())
    got_rows = sorted(
        zip(got.cell_x, got.cell_y, got.n_buildings, got.max_height_dm, got.sum_height_dm)
    )
    assert [tuple(map(int, r)) for r in got_rows] == want


def test_media_dispersion_brute_force(ray_session):
    from collections import defaultdict

    import glob

    import pyarrow.dataset as pds

    from osm_data_3d_tiles_ray.pipelines.geo import q_media_dispersion

    got = q_media_dispersion(SF).to_pandas().set_index("media_ref")
    docs = pds.dataset(sorted(glob.glob(f"{_SYNTH}/documents/*.parquet"))).to_table()
    b = _buildings()
    binfo = {
        o: (cx, cy)
        for o, cx, cy in zip(
            b.column("osm_id").to_pylist(),
            b.column("centroid_x").to_pylist(),
            b.column("centroid_y").to_pylist(),
        )
    }
    per_ref = defaultdict(list)
    for doc in docs.to_pylist():
        osm = None
        refs = []
        for s in doc["spans"]:
            if s["kind"] == "tag" and s["text"].startswith("osm_id="):
                osm = int(s["text"][7:])
            elif s["kind"] == "media":
                refs.append(s["media_ref"])
        if osm is None:
            continue
        cx, cy = binfo[osm]
        tx = int(np.floor((cx + _W) / _T))
        ty = int(np.floor((_W - cy) / _T))
        qcx = int(np.floor(cx * 1000 + 0.5))
        qcy = int(np.floor(cy * 1000 + 0.5))
        for ref in refs:
            per_ref[ref].append((tx, ty, qcx, qcy))
    assert set(per_ref) == set(got.index)
    for ref, uses in per_ref.items():
        row = got.loc[ref]
        assert int(row.n_spans) == len(uses)
        assert int(row.n_tiles) == len({(t[0], t[1]) for t in uses})
        assert int(row.min_tx) == min(t[0] for t in uses)
        assert int(row.max_tx) == max(t[0] for t in uses)
        assert int(row.min_ty) == min(t[1] for t in uses)
        assert int(row.max_ty) == max(t[1] for t in uses)
        assert int(row.sum_cx_mm) == sum(t[2] for t in uses)
        assert int(row.sum_cy_mm) == sum(t[3] for t in uses)


def test_hex_smooth_brute_force(ray_session):
    from collections import Counter

    from osm_data_3d_tiles_ray.pipelines.geo import hex_axial, q_hex_smooth

    got = q_hex_smooth(SF).to_pandas()
    b = _buildings()
    cx = np.asarray(b.column("centroid_x").to_pylist(), dtype=np.float64)
    cy = np.asarray(b.column("centroid_y").to_pylist(), dtype=np.float64)
    ok = np.isfinite(cx) & np.isfinite(cy)
    hq, hr = hex_axial(cx[ok], cy[ok], 1000.0)
    counts = Counter(zip(hq.tolist(), hr.tolist()))
    want = {}
    for (q, r), n in counts.items():
        hood = sum(
            counts.get((q + dq, r + dr), 0)
            for dq, dr in [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]
        )
        want[(q, r)] = (n, hood)
    got_map = {
        (int(a), int(b_)): (int(l), int(h))
        for a, b_, l, h in zip(got.hex_q, got.hex_r, got.n_local, got.n_hood)
    }
    assert got_map == want


def _bfs_components(tiles):
    truth = {}
    for t in tiles:
        tk = (t[0] << 20) + t[1]
        if tk in truth:
            continue
        seen = {t}
        q = [t]
        comp = [t]
        while q:
            x, y = q.pop()
            for nb in ((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)):
                if nb in tiles and nb not in seen:
                    seen.add(nb)
                    q.append(nb)
                    comp.append(nb)
        m = min((c[0] << 20) + c[1] for c in comp)
        for c in comp:
            truth[(c[0] << 20) + c[1]] = m
    return truth


def test_tile_components_bfs_oracle(ray_session):
    from osm_data_3d_tiles_ray.pipelines.geo import q_tile_components

    got_df = q_tile_components(SF).to_pandas()
    b = _buildings()
    tx = np.floor((np.asarray(b.column("minx")) + _W) / _T).astype(np.int64)
    ty = np.floor((_W - np.asarray(b.column("maxy"))) / _T).astype(np.int64)
    truth = _bfs_components(set(zip(tx.tolist(), ty.tolist())))
    got = {
        (int(r.tile_x) << 20) + int(r.tile_y): int(r.component_id)
        for r in got_df.itertuples()
    }
    assert got == truth
    # component ids are member minima: every id is a member of its own set
    roots = set(got.values())
    assert roots <= set(got)
    assert all(got[r] == r for r in roots)


def test_tile_components_synthetic_shapes(ray_session):
    # ring blob (hole in the middle), diagonal non-adjacency, singleton —
    # via a monkeypatched node table fed through the same star rounds
    import pyarrow as pa

    import osm_data_3d_tiles_ray.pipelines.geo as geo_mod

    tiles = (
        [(x, 10) for x in range(5, 11)]
        + [(x, 14) for x in range(5, 11)]
        + [(5, y) for y in range(10, 15)]
        + [(10, y) for y in range(10, 15)]  # rectangle ring
        + [(20, 20), (21, 21)]  # diagonal: NOT connected under 4-conn
        + [(30, 30)]  # singleton
    )
    tiles = sorted(set(tiles))
    truth = _bfs_components(set(tiles))

    real_counts = geo_mod.tile_counts_ds

    def fake_counts(_sf):
        return __import__("ray").data.from_arrow(
            pa.table(
                {
                    "tile_x": pa.array([t[0] for t in tiles], type=pa.int32()),
                    "tile_y": pa.array([t[1] for t in tiles], type=pa.int32()),
                }
            )
        )

    geo_mod.tile_counts_ds = fake_counts
    try:
        got_df = geo_mod.q_tile_components(SF).to_pandas()
    finally:
        geo_mod.tile_counts_ds = real_counts
    got = {
        (int(r.tile_x) << 20) + int(r.tile_y): int(r.component_id)
        for r in got_df.itertuples()
    }
    assert got == truth
    # ring blob + the two diagonal (non-4-connected) tiles + singleton
    assert len(set(got.values())) == 4


def test_tile_components_cross_block(ray_session):
    # shapes spanning multiple z8 blocks exercise the crossing-edge
    # resolution + quotient star rounds (sf corpora fit one block)
    import pyarrow as pa

    import osm_data_3d_tiles_ray.pipelines.geo as geo_mod

    tiles = []
    # horizontal strip crossing three block boundaries (x 200..820)
    tiles += [(x, 100) for x in range(200, 821, 1)]
    # vertical strip crossing a y-block boundary, DISJOINT from the strip
    tiles += [(40, y) for y in range(200, 400)]
    # blob straddling the 4-corner point (511/512, 511/512)
    tiles += [(x, y) for x in range(510, 514) for y in range(510, 514)]
    # singleton in a far block
    tiles += [(3000, 3000)]
    tiles = sorted(set(tiles))
    truth = _bfs_components(set(tiles))

    real_counts = geo_mod.tile_counts_ds

    def fake_counts(_sf):
        return __import__("ray").data.from_arrow(
            pa.table(
                {
                    "tile_x": pa.array([t[0] for t in tiles], type=pa.int32()),
                    "tile_y": pa.array([t[1] for t in tiles], type=pa.int32()),
                }
            )
        )

    geo_mod.tile_counts_ds = fake_counts
    try:
        got_df = geo_mod.q_tile_components(SF).to_pandas()
    finally:
        geo_mod.tile_counts_ds = real_counts
    got = {
        (int(r.tile_x) << 20) + int(r.tile_y): int(r.component_id)
        for r in got_df.itertuples()
    }
    assert got == truth
    assert len(set(got.values())) == 4
