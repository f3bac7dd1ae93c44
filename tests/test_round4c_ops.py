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
