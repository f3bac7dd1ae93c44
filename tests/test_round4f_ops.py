"""Brute-force oracles for the round-4 session-F operators: the
Hilbert-curve shard index over the z16 tile grid and the 150 m-windowed
nearest-neighbor self-join.  Each runs the full Ray pipeline at sf0.001
and compares against an independent single-process Python reference (the
DuckDB oracles additionally check both at sf0.01 through the driver)."""

import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def _to_pandas(ds):
    import ray.data

    if isinstance(ds, ray.data.Dataset):
        return ds.to_pandas()
    return ds


def _buildings():
    from osm_data_3d_tiles_ray.synth.generator import ensure_synth

    root = ensure_synth(0.001)
    return pd.read_parquet(
        f"{root}/buildings",
        columns=["osm_id", "centroid_x", "centroid_y"],
    )


def _hilbert_scalar(level: int, x: int, y: int) -> int:
    """Textbook per-point xy2d (Wikipedia's C form), independent of the
    vectorized mod-s kernel under test."""
    d = 0
    s = 1 << (level - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def test_hilbert_matches_scalar_reference(ray_session):
    from osm_data_3d_tiles_ray.pipelines.geo import q_hilbert

    got = (
        _to_pandas(q_hilbert(SF_DIR))
        .sort_values("osm_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(_buildings())
    # every row agrees with the scalar walk on its (tile_x, tile_y)
    for _, r in got.head(500).iterrows():
        assert r["hilbert_d"] == _hilbert_scalar(
            16, int(r["tile_x"]), int(r["tile_y"])
        )
        assert r["shard"] == r["hilbert_d"] >> 22
    # same tile -> same index; adjacent-on-curve tiles are grid-adjacent
    uniq = got.drop_duplicates(["tile_x", "tile_y"])
    assert uniq["hilbert_d"].is_unique
    u = uniq.sort_values("hilbert_d")
    consecutive = np.flatnonzero(np.diff(u["hilbert_d"].to_numpy()) == 1)
    dx = np.abs(np.diff(u["tile_x"].to_numpy()))[consecutive]
    dy = np.abs(np.diff(u["tile_y"].to_numpy()))[consecutive]
    assert len(consecutive) > 0
    assert np.all(dx + dy == 1)  # Hilbert never jumps diagonally


def test_nn_within_matches_bruteforce(ray_session):
    from osm_data_3d_tiles_ray.pipelines.geo import q_nn_within

    got = (
        _to_pandas(q_nn_within(SF_DIR))
        .sort_values("osm_id")
        .reset_index(drop=True)
    )

    b = _buildings()
    osm = b["osm_id"].to_numpy()
    qx = np.floor(b["centroid_x"].to_numpy() * 1000 + 0.5).astype(
        np.int64
    ) + 20037508343
    qy = np.floor(b["centroid_y"].to_numpy() * 1000 + 0.5).astype(
        np.int64
    ) + 20037508343
    cx = qx // 150000
    cy = qy // 150000
    rows = []
    for i in range(len(osm)):
        win = (
            (np.abs(cx - cx[i]) <= 1)
            & (np.abs(cy - cy[i]) <= 1)
            & (osm != osm[i])
        )
        idx = np.flatnonzero(win)
        if len(idx) == 0:
            continue
        d2 = (qx[idx] - qx[i]) ** 2 + (qy[idx] - qy[i]) ** 2
        best = np.lexsort((osm[idx], d2))[0]
        rows.append((osm[i], osm[idx[best]], int(d2[best])))
    exp = (
        pd.DataFrame(rows, columns=["osm_id", "nn_id", "nn_d2_mm2"])
        .sort_values("osm_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got["osm_id"].tolist() == exp["osm_id"].tolist()
    assert got["nn_id"].tolist() == exp["nn_id"].tolist()
    assert got["nn_d2_mm2"].tolist() == exp["nn_d2_mm2"].tolist()
    # symmetry sanity: the relation is not empty and distances positive
    assert (got["nn_d2_mm2"] > 0).all()


def test_radius_count_matches_bruteforce(ray_session):
    from osm_data_3d_tiles_ray.pipelines.geo import q_nn_within, q_radius_count

    got = (
        _to_pandas(q_radius_count(SF_DIR))
        .sort_values("osm_id")
        .reset_index(drop=True)
    )

    b = _buildings()
    osm = b["osm_id"].to_numpy()
    qx = np.floor(b["centroid_x"].to_numpy() * 1000 + 0.5).astype(np.int64)
    qy = np.floor(b["centroid_y"].to_numpy() * 1000 + 0.5).astype(np.int64)
    # brute force over ALL pairs: the 150 m cell ring strictly contains
    # the 100 m ball, so the window never clips a true neighbor
    d2 = (qx[:, None] - qx[None, :]) ** 2 + (qy[:, None] - qy[None, :]) ** 2
    np.fill_diagonal(d2, np.iinfo(np.int64).max)
    dup = osm[:, None] == osm[None, :]
    exp_cnt = ((d2 <= 100_000**2) & ~dup).sum(axis=1)
    exp = (
        pd.DataFrame({"osm_id": osm, "n_within_100m": exp_cnt})
        .sort_values("osm_id")
        .reset_index(drop=True)
    )
    # every building emits exactly one row, zeros included
    assert len(got) == len(exp)
    assert got["osm_id"].tolist() == exp["osm_id"].tolist()
    assert got["n_within_100m"].tolist() == exp["n_within_100m"].tolist()
    assert (got["n_within_100m"] == 0).any()
    # coherence with the NN join: a 100 m-close NN implies count >= 1
    nn = _to_pandas(q_nn_within(SF_DIR))
    close = nn[nn["nn_d2_mm2"] <= 100_000**2]
    merged = close.merge(got, on="osm_id")
    assert (merged["n_within_100m"] >= 1).all()


def test_tile_orientation_matches_bruteforce(ray_session):
    from osm_data_3d_tiles_ray.pipelines.geo import (
        q_edge_stats,
        q_tile_orientation,
    )
    from osm_data_3d_tiles_ray.constants import TILE_SIZE_Z16, WORLD_HALF

    got = (
        _to_pandas(q_tile_orientation(SF_DIR))
        .sort_values(["tile_x", "tile_y"])
        .reset_index(drop=True)
    )
    es = _to_pandas(q_edge_stats(SF_DIR))
    b = pd.read_parquet(
        f"{__import__('osm_data_3d_tiles_ray.synth.generator', fromlist=['ensure_synth']).ensure_synth(0.001)}/buildings",
        columns=["osm_id", "centroid_x", "centroid_y"],
    )
    m = es.merge(b, on="osm_id")
    m["tile_x"] = np.floor(
        (m["centroid_x"].to_numpy() + WORLD_HALF) / TILE_SIZE_Z16
    ).astype(np.int64)
    m["tile_y"] = np.floor(
        (WORLD_HALF - m["centroid_y"].to_numpy()) / TILE_SIZE_Z16
    ).astype(np.int64)
    exp_rows = []
    for (tx, ty), grp in m.groupby(["tile_x", "tile_y"]):
        counts = grp["max_edge_oct"].value_counts()
        top = counts.max()
        modal = min(o for o, c in counts.items() if c == top)
        exp_rows.append((tx, ty, len(grp), modal, top))
    exp = (
        pd.DataFrame(
            exp_rows,
            columns=["tile_x", "tile_y", "n_oriented", "modal_oct", "modal_cnt"],
        )
        .sort_values(["tile_x", "tile_y"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for col in exp.columns:
        assert got[col].tolist() == exp[col].tolist(), col
