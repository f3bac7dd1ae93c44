"""S2-analog cells, coverings, and implicit-tiling subtrees.

Kernel oracles are brute-force/scalar (Hilbert bijectivity vs the textbook
recurrence, inverse roundtrip, curve adjacency); the pipeline checks assert
the set-level invariants the DuckDB oracle can't see (centroid-cell ⊆
cover, availability popcounts vs tile counts, ancestor-closure of the
internal bitstream)."""

import numpy as np
import pyarrow as pa
import pytest

from osm_data_3d_tiles_ray.geom.s2 import (
    hilbert_d2xy,
    hilbert_xy2d,
    s2_cell_from_mercator,
    s2_face_uv,
)

SF = "/root/testdata/sf0.001"


def _xy2d_scalar(n: int, x: int, y: int) -> int:
    # textbook full-width reflect form (Wikipedia "Hilbert curve") — the
    # vectorized kernel uses the mod-s form; equality proves equivalence
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_scalar_and_bijective():
    level = 5
    n = 1 << level
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    xs, ys = xs.ravel(), ys.ravel()
    d = hilbert_xy2d(level, xs, ys)
    ref = np.array([_xy2d_scalar(n, int(a), int(b)) for a, b in zip(xs, ys)])
    assert (d == ref).all()
    assert len(np.unique(d)) == n * n  # bijection onto [0, n²)
    x2, y2 = hilbert_d2xy(level, d)
    assert (x2 == xs).all() and (y2 == ys).all()


def test_hilbert_curve_adjacency():
    # consecutive curve positions are 4-adjacent grid cells — THE property
    # that makes cell-id ranges spatially local shard keys
    level = 7
    n = 1 << level
    x, y = hilbert_d2xy(level, np.arange(n * n))
    step = np.abs(np.diff(x)) + np.abs(np.diff(y))
    assert (step == 1).all()


def test_face_partition_covers_sphere():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-np.pi, np.pi, 50000)
    lat = rng.uniform(-np.pi / 2 * 0.999, np.pi / 2 * 0.999, 50000)
    face, u, v = s2_face_uv(lon, lat)
    assert set(np.unique(face)) == set(range(6))
    assert (np.abs(u) <= 1 + 1e-12).all() and (np.abs(v) <= 1 + 1e-12).all()
    # round-trip: the face frame must reproduce the original direction
    cl = np.cos(lat)
    xyz = np.stack([cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)])
    # rebuild from (face, u, v): p = norm(face_axis + u*u_axis + v*v_axis)
    axes = {
        0: ((1, 0, 0), (0, 1, 0), (0, 0, 1)),
        1: ((0, 1, 0), (-1, 0, 0), (0, 0, 1)),
        2: ((0, 0, 1), (-1, 0, 0), (0, -1, 0)),
        3: ((-1, 0, 0), (0, 0, -1), (0, -1, 0)),
        4: ((0, -1, 0), (0, 0, -1), (1, 0, 0)),
        5: ((0, 0, -1), (0, 1, 0), (1, 0, 0)),
    }
    for f in range(6):
        m = face == f
        if not m.any():
            continue
        n_ax, u_ax, v_ax = (np.array(a, dtype=float) for a in axes[f])
        p = (
            n_ax[:, None]
            + u[m][None, :] * u_ax[:, None]
            + v[m][None, :] * v_ax[:, None]
        )
        p /= np.linalg.norm(p, axis=0, keepdims=True)
        assert np.allclose(p, xyz[:, m], atol=1e-9)


def test_s2_cell_id_packing():
    cx = np.linspace(500100.0, 579900.0, 500)
    cy = np.linspace(5690100.0, 5749900.0, 500)
    face, i, j, cell = s2_cell_from_mercator(cx, cy, 12)
    assert (cell == face * (1 << 24) + hilbert_xy2d(12, i, j)).all()
    assert (i >= 0).all() and (i < 4096).all()
    assert (j >= 0).all() and (j < 4096).all()


def test_s2_cover_contains_centroid_cell(ray_session):
    from osm_data_3d_tiles_ray.pipelines import geo

    cover = geo.q_s2_cover(SF).to_pandas()
    # centroid cell at the same level must be inside the bbox cover
    cent = (
        geo.q_s2_cells(SF, level=geo.S2_COVER_LEVEL)
        .to_pandas()[["osm_id", "s2_cell"]]
    )
    merged = cent.merge(cover, on=["osm_id", "s2_cell"], how="left", indicator=True)
    assert (merged["_merge"] == "both").all()
    # covers are small supersets: every building covers ≥1 cell, ≤ a 4x4 rect
    per = cover.groupby("osm_id").size()
    assert per.min() >= 1 and per.max() <= 16


def test_subtree_avail_invariants(ray_session):
    from osm_data_3d_tiles_ray.pipelines import geo
    from osm_data_3d_tiles_ray.pipelines.geo import morton32
    from osm_data_3d_tiles_ray.stages.assign import ownership_assignments

    sub = geo.q_subtree_avail(SF).to_pandas().sort_values(["root_x", "root_y"])

    def popcount(col):
        return np.array([bin(int(v)).count("1") for v in col])

    leaf_pop = sum(popcount(sub[f"leaf_w{w}"]) for w in range(5))
    assert (leaf_pop == sub.n_tiles.to_numpy()).all()
    # no word may touch bit 52+ (BIGINT-safety contract with the oracle)
    for c in ["int_w0", "int_w1"] + [f"leaf_w{w}" for w in range(5)]:
        assert (sub[c].to_numpy() < (1 << 52)).all()
        assert (sub[c].to_numpy() >= 0).all()

    # brute-force oracle: rebuild availability from the assignment table
    ds = geo.parsed_ds(SF).select_columns(
        ["osm_id", "minx", "miny", "maxx", "maxy"]
    )
    a = ownership_assignments(ds).to_pandas()
    tx = a.tile_x.to_numpy().astype(np.int64)
    ty = a.tile_y.to_numpy().astype(np.int64)
    key = (tx << 21) | ty
    uk, cnt = np.unique(key, return_counts=True)
    utx, uty = uk >> 21, uk & ((1 << 21) - 1)
    roots = {}
    for t_x, t_y, c in zip(utx, uty, cnt):
        rk = (int(t_x) >> 4, int(t_y) >> 4)
        st = roots.setdefault(rk, {"tiles": 0, "b": 0, "bits": set(), "leaf": set()})
        st["tiles"] += 1
        st["b"] += int(c)
        lx, ly = int(t_x) & 15, int(t_y) & 15
        for d, off in enumerate((0, 1, 5, 21)):
            m = int(morton32(np.array([lx >> (4 - d)]), np.array([ly >> (4 - d)]))[0])
            st["bits"].add(off + m)
        st["leaf"].add(int(morton32(np.array([lx]), np.array([ly]))[0]))
    assert len(roots) == len(sub)
    for row in sub.itertuples():
        st = roots[(row.root_x, row.root_y)]
        assert st["tiles"] == row.n_tiles and st["b"] == row.n_buildings
        got_int = int(row.int_w0) | (int(row.int_w1) << 52)
        want_int = 0
        for b in st["bits"]:
            want_int |= 1 << b
        assert got_int == want_int
        got_leaf = 0
        for w in range(5):
            got_leaf |= int(getattr(row, f"leaf_w{w}")) << (52 * w)
        want_leaf = 0
        for m in st["leaf"]:
            want_leaf |= 1 << m
        assert got_leaf == want_leaf


def test_s2_neighbors_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines import geo

    got = (
        geo.q_s2_neighbors(SF)
        .to_pandas()
        .sort_values("s2_cell")
        .reset_index(drop=True)
    )
    # brute force from the centroid cells
    cells = geo.q_s2_cells(SF, level=geo.S2_COVER_LEVEL).to_pandas()
    occ = set(zip(cells.s2_face, cells.s2_i, cells.s2_j))
    cell_of = {
        (f, i, j): c
        for f, i, j, c in zip(cells.s2_face, cells.s2_i, cells.s2_j, cells.s2_cell)
    }
    n = 1 << geo.S2_COVER_LEVEL
    want = {}
    for f, i, j in occ:
        nb = n_occ = 0
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == dj == 0:
                    continue
                ni, nj = i + di, j + dj
                if 0 <= ni < n and 0 <= nj < n:
                    nb += 1
                    n_occ += (f, ni, nj) in occ
        want[cell_of[(f, i, j)]] = (nb, n_occ)
    assert len(got) == len(want)
    for row in got.itertuples():
        assert want[row.s2_cell] == (row.n_neighbors, row.n_occupied)


def test_tile_pagerank_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines import geo
    from osm_data_3d_tiles_ray.pipelines.geo import PAGERANK_BASE, PAGERANK_SCALE
    from osm_data_3d_tiles_ray.stages.assign import ownership_assignments

    got = (
        geo.q_tile_pagerank(SF)
        .to_pandas()
        .sort_values(["tile_x", "tile_y"])
        .reset_index(drop=True)
    )
    ds = geo.parsed_ds(SF).select_columns(["osm_id", "minx", "miny", "maxx", "maxy"])
    a = ownership_assignments(ds).to_pandas()
    occ = sorted(set(zip(a.tile_x.astype(int), a.tile_y.astype(int))))
    occ_set = set(occ)
    nbrs = {
        t: [
            (t[0] + dx, t[1] + dy)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0) and (t[0] + dx, t[1] + dy) in occ_set
        ]
        for t in occ
    }
    p = {t: PAGERANK_SCALE for t in occ}
    for _ in range(5):
        incoming = {t: 0 for t in occ}
        for t in occ:
            if nbrs[t]:
                share = p[t] // len(nbrs[t])
                for v in nbrs[t]:
                    incoming[v] += share
        p = {t: PAGERANK_BASE + (85 * incoming[t]) // 100 for t in occ}
    assert len(got) == len(occ)
    for row in got.itertuples():
        assert p[(row.tile_x, row.tile_y)] == row.pr
    # non-degenerate: dense cores rank above the base share somewhere
    assert got.pr.max() > PAGERANK_BASE


def test_skew_audit_brute_force(ray_session):
    import numpy as np

    from osm_data_3d_tiles_ray.pipelines import geo
    from osm_data_3d_tiles_ray.stages.assign import ownership_assignments

    got = geo.q_skew_audit(SF).to_pandas()
    assert len(got) == 1
    ds = geo.parsed_ds(SF).select_columns(["osm_id", "minx", "miny", "maxx", "maxy"])
    a = ownership_assignments(ds).to_pandas()
    c = np.sort(a.groupby(["tile_x", "tile_y"]).size().to_numpy())
    n, total = len(c), int(c.sum())
    row = got.iloc[0]
    assert row.n_tiles == n and row.total == total
    assert row.max_count == c[-1]
    assert row.p99_count == c[(n - 1) * 99 // 100]
    assert row.mean_e6 == total * 1_000_000 // n
    assert row.hot_tiles == int((c * n > 8 * total).sum())
    assert row.salt_factor == (int(c[-1]) * n + 8 * total - 1) // (8 * total)
