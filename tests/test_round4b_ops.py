"""Independent brute-force oracles for the round-4 session-B operators:
hex-grid assignment (nearest-center property), the PBSM bbox self-join
(quadratic reference including multi-tile dedup), and the media caption
context (per-doc Python scan).  The DuckDB oracles check these at
sf0.01 through the driver; these tests lock the kernels against
adversarial shapes (boundary-straddling boxes, docs with no text spans)
and run at sf0.001."""

import glob

import numpy as np
import pyarrow.parquet as pq
import pytest

from osm_data_3d_tiles_ray.pipelines.geo import HEX_S3, HEX_TT, hex_axial

SF_DIR = "/root/testdata/sf0.001"


def _hex_center(q, r, size):
    # pointy-top axial → cartesian center: x = size*sqrt(3)*(q + r/2),
    # y = size*1.5*r (inverse of the fractional map in hex_axial)
    s3 = np.sqrt(3.0)
    return size * s3 * (q + r / 2.0), size * 1.5 * r


def test_hex_axial_assigns_nearest_center():
    rng = np.random.default_rng(3)
    size = 750.0
    x = rng.uniform(-5e4, 5e4, 400)
    y = rng.uniform(-5e4, 5e4, 400)
    hq, hr = hex_axial(x, y, size)
    cx, cy = _hex_center(hq.astype(float), hr.astype(float), size)
    d0 = np.hypot(x - cx, y - cy)
    # no neighbor center may be strictly closer (cube rounding = nearest)
    for dq in (-1, 0, 1):
        for dr in (-1, 0, 1):
            if dq == dr == 0:
                continue
            nx, ny = _hex_center(
                (hq + dq).astype(float), (hr + dr).astype(float), size
            )
            dn = np.hypot(x - nx, y - ny)
            assert (d0 <= dn + 1e-9).all()
    # and the assigned center is within the circumradius
    assert (d0 <= size + 1e-9).all()


def test_hex_axial_matches_scalar_reference():
    rng = np.random.default_rng(9)
    x = rng.uniform(-1e5, 1e5, 200)
    y = rng.uniform(-1e5, 1e5, 200)
    hq, hr = hex_axial(x, y, 500.0)
    for i in range(len(x)):
        cx = (HEX_S3 * x[i] - y[i] / 3.0) / 500.0
        cz = (y[i] * HEX_TT) / 500.0
        cy = -cx - cz
        rx, ry, rz = (np.floor(v + 0.5) for v in (cx, cy, cz))
        dx, dy, dz = abs(rx - cx), abs(ry - cy), abs(rz - cz)
        if dx > dy and dx > dz:
            rx = -ry - rz
        elif dy > dz:
            ry = -rx - rz
        else:
            rz = -rx - ry
        assert (hq[i], hr[i]) == (int(rx), int(rz))


@pytest.fixture(scope="module")
def synth_buildings():
    from osm_data_3d_tiles_ray.synth.generator import ensure_synth

    root = ensure_synth(0.001)
    return pq.read_table(
        sorted(glob.glob(str(root / "buildings" / "*.parquet"))),
        columns=["osm_id", "minx", "miny", "maxx", "maxy"],
    )


def test_overlap_pairs_matches_quadratic(ray_session, synth_buildings):
    from osm_data_3d_tiles_ray.pipelines.geo import q_overlap_pairs

    got = q_overlap_pairs(SF_DIR).to_pandas()
    got = got.sort_values(["osm_a", "osm_b"]).reset_index(drop=True)

    t = synth_buildings
    osm = t.column("osm_id").to_numpy()
    minx = t.column("minx").to_numpy()
    miny = t.column("miny").to_numpy()
    maxx = t.column("maxx").to_numpy()
    maxy = t.column("maxy").to_numpy()
    order = np.argsort(osm)
    osm, minx, miny, maxx, maxy = (
        a[order] for a in (osm, minx, miny, maxx, maxy)
    )
    exp = []
    for i in range(len(osm)):
        hit = (
            (minx[i] <= maxx)
            & (minx <= maxx[i])
            & (miny[i] <= maxy)
            & (miny <= maxy[i])
        )
        hit[: i + 1] = False
        for j in np.flatnonzero(hit):
            w = min(maxx[i], maxx[j]) - max(minx[i], minx[j])
            h = min(maxy[i], maxy[j]) - max(miny[i], miny[j])
            exp.append(
                (osm[i], osm[j], int(np.floor((w * h) * 100 + 0.5)))
            )
    exp.sort()
    assert len(got) == len(exp)
    assert got["osm_a"].tolist() == [e[0] for e in exp]
    assert got["osm_b"].tolist() == [e[1] for e in exp]
    assert got["ov_area_c"].tolist() == [e[2] for e in exp]


def test_media_context_matches_python_scan(ray_session):
    from osm_data_3d_tiles_ray.pipelines.corpus_stats import media_context
    from osm_data_3d_tiles_ray.synth.generator import ensure_synth

    got = media_context(SF_DIR).to_pandas()
    got = got.sort_values(["doc_id", "span_idx"]).reset_index(drop=True)

    root = ensure_synth(0.001)
    docs = pq.read_table(
        sorted(glob.glob(str(root / "documents" / "*.parquet"))),
        columns=["doc_id", "spans"],
    ).to_pylist()
    exp = []
    for d in docs:
        spans = d["spans"]
        ntok = [
            len(s["text"].split()) if s["media_ref"] == "" else None
            for s in spans
        ]
        for i, s in enumerate(spans):
            if s["media_ref"] == "":
                continue
            prev = next(
                (j for j in range(i - 1, -1, -1) if ntok[j] is not None), None
            )
            nxt = next(
                (j for j in range(i + 1, len(spans)) if ntok[j] is not None),
                None,
            )
            exp.append(
                {
                    "doc_id": d["doc_id"],
                    "span_idx": i + 1,
                    "media_ref": s["media_ref"],
                    "prev_gap": i - prev if prev is not None else -1,
                    "prev_tokens": ntok[prev] if prev is not None else -1,
                    "next_gap": nxt - i if nxt is not None else -1,
                    "next_tokens": ntok[nxt] if nxt is not None else -1,
                }
            )
    exp.sort(key=lambda e: (e["doc_id"], e["span_idx"]))
    assert len(got) == len(exp)
    for col in (
        "doc_id", "span_idx", "media_ref",
        "prev_gap", "prev_tokens", "next_gap", "next_tokens",
    ):
        assert got[col].tolist() == [e[col] for e in exp], col


def test_pack_stats_conserves_cost(ray_session):
    from osm_data_3d_tiles_ray.pipelines.corpus_stats import (
        interleaved_pack,
        pack_stats,
    )

    pack = interleaved_pack(SF_DIR).to_pandas()
    stats = pack_stats(SF_DIR).to_pandas()
    assert stats["cost_sum"].sum() == pack["cost"].sum()
    assert stats["n_spans"].sum() == len(pack)
    # every full example holds exactly `budget` cost once spill is netted:
    # sum over examples of (cost - spill + carried-in spill) telescopes, so
    # just check per-example invariants instead: spill only when the last
    # span runs past the boundary
    s = stats.sort_values("example_id")
    assert (s["spill"] >= 0).all()
    assert (s["n_docs"] >= 1).all() and (s["n_docs"] <= s["n_spans"]).all()


def test_local_moran_matches_bruteforce(ray_session):
    from osm_data_3d_tiles_ray.pipelines.geo import q_local_moran, q_tile_stats

    cells = q_tile_stats(SF_DIR).to_pandas()
    got = (
        q_local_moran(SF_DIR)
        .to_pandas()
        .sort_values(["tile_x", "tile_y"])
        .reset_index(drop=True)
    )
    c = {
        (r.tile_x, r.tile_y): r.batch_length for r in cells.itertuples()
    }
    n, s = len(c), sum(c.values())
    assert len(got) == n
    for r in got.itertuples():
        nbrs = [
            c[(r.tile_x + dx, r.tile_y + dy)]
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0) and (r.tile_x + dx, r.tile_y + dy) in c
        ]
        assert r.dev == n * c[(r.tile_x, r.tile_y)] - s
        assert r.n_nbrs == len(nbrs)
        assert r.nbr_dev_sum == n * sum(nbrs) - len(nbrs) * s


def test_dem_slope_matches_dense_grid(ray_session):
    from osm_data_3d_tiles_ray.pipelines.geo import q_dem_slope
    from osm_data_3d_tiles_ray.synth.generator import ensure_synth

    got = (
        q_dem_slope(SF_DIR)
        .to_pandas()
        .sort_values(["row", "col"])
        .reset_index(drop=True)
    )
    root = ensure_synth(0.001)
    dem = pq.read_table(str(root / "dem.parquet")).to_pandas()
    n_rows, n_cols = dem["row"].max() + 1, dem["col"].max() + 1
    z = np.zeros((n_rows, n_cols))
    z[dem["row"], dem["col"]] = dem["z"].astype(np.float64)
    dx, dy = float(dem["dx"].iloc[0]), float(dem["dy"].iloc[0])
    assert len(got) == (n_rows - 2) * (n_cols - 2)
    dzdx = (z[1:-1, 2:] - z[1:-1, :-2]) / (2.0 * dx)
    dzdy = (z[2:, 1:-1] - z[:-2, 1:-1]) / (2.0 * dy)
    slope = np.sqrt(dzdx * dzdx + dzdy * dzdy)
    g = got.set_index(["row", "col"])
    rr, cc = np.meshgrid(
        np.arange(1, n_rows - 1), np.arange(1, n_cols - 1), indexing="ij"
    )
    exp_x = np.floor(dzdx * 1e6 + 0.5).astype(np.int64).ravel()
    exp_y = np.floor(dzdy * 1e6 + 0.5).astype(np.int64).ravel()
    exp_s = np.floor(slope * 1e6 + 0.5).astype(np.int64).ravel()
    key = list(zip(rr.ravel(), cc.ravel()))
    assert (g.loc[key, "dzdx_e6"].to_numpy() == exp_x).all()
    assert (g.loc[key, "dzdy_e6"].to_numpy() == exp_y).all()
    assert (g.loc[key, "slope_e6"].to_numpy() == exp_s).all()
