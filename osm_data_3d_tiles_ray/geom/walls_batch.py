"""Batch-vectorized walls extrusion — semantics-identical to
:func:`..geom.walls.build_walls` but computed for ALL rings of a batch in
one pass of numpy array ops (no per-ring Python in the hot path).

The scalar kernel is kept as the readable reference implementation; the
equivalence test (tests/test_walls_batch.py) asserts bit-level agreement
on random rings.  See geom/walls.py for the reference-semantics citations.

Input: flat (V,2) vertices of R CLOSED rings (closing duplicate present),
ring offsets, per-ring scalars.  Output: SoA dict + per-ring output vertex
counts (callers regroup by building).
"""

from __future__ import annotations

import math

import numpy as np

from ..constants import SMOOTH_NORMALS_THRESHOLD_DEG

_COS_SMOOTH = math.cos(math.radians(SMOOTH_NORMALS_THRESHOLD_DEG))


def _ragged_arange(counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """counts (n,) → (flat intra-index array, owner index array)."""
    total = int(counts.sum())
    owner = np.repeat(np.arange(len(counts)), counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    intra = np.arange(total) - np.repeat(starts, counts)
    return intra, owner


def build_walls_batch(
    verts: np.ndarray,
    ring_offsets: np.ndarray,
    min_height_r: np.ndarray,
    height_r: np.ndarray,
    levels_r: np.ndarray,
    window_width: float,
    tex_wall_r: np.ndarray,
    tex_win_r: np.ndarray,
    height_points: np.ndarray | None = None,
    emit_attrs: bool = True,
) -> tuple[dict[str, np.ndarray], np.ndarray]:
    """Vectorized walls for R closed rings.

    Returns (SoA dict, per-ring output vertex counts).  Rings with
    ``levels_r <= 0`` or fewer than 3 distinct vertices produce no output.
    ``emit_attrs=False`` (the stats-only fast path) skips the uv/normal/
    texture assembly — positions and counts are unchanged; the attribute
    arrays come back empty."""
    R = len(ring_offsets) - 1
    if R == 0 or len(verts) == 0:
        return _empty(), np.zeros(0, np.int64)

    # ---- drop closing duplicate (reference slices off the FIRST vertex of a
    # closed ring, leaving [v1..vn-1, v0] — order matters for rotation)
    starts = ring_offsets[:-1].astype(np.int64)
    ends = ring_offsets[1:].astype(np.int64)
    closed = np.all(verts[starts] == verts[ends - 1], axis=1)
    # open-vertex view per ring: for closed rings take [start+1, end),
    # which equals the reference's slice(1) of [v0..vn-1, v0] = [v1..vn-1, v0]
    o_starts = starts + closed.astype(np.int64)
    o_counts = ends - o_starts
    V = int(o_counts.sum())
    intra, ring_of = _ragged_arange(o_counts)
    gidx = np.repeat(o_starts, o_counts) + intra
    v = verts[gidx]  # (V,2) open-ring vertices in reference order
    hp = height_points[gidx] if height_points is not None else None

    n_of = o_counts[ring_of]
    ring_start_flat = np.concatenate([[0], np.cumsum(o_counts)[:-1]])
    base = np.repeat(ring_start_flat, o_counts)

    def wrap(delta: np.ndarray | int) -> np.ndarray:
        return base + (intra + delta) % n_of

    # ---- edge smoothness per vertex
    nxt = v[wrap(1)]
    prv = v[wrap(-1)]
    seg = nxt - v
    pseg = v - prv
    with np.errstate(invalid="ignore", divide="ignore"):
        seg_n = seg / np.linalg.norm(seg, axis=1, keepdims=True)
        pseg_n = pseg / np.linalg.norm(pseg, axis=1, keepdims=True)
    smooth = (seg_n * pseg_n).sum(axis=1) > _COS_SMOOTH

    # ---- rotate each ring to start at its first non-smooth vertex
    ns = ~smooth
    # first non-smooth index per ring (0 when all smooth — np.argmax semantics)
    big = np.where(ns, intra, np.iinfo(np.int64).max)
    first_ns = np.full(R, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(first_ns, ring_of, big)
    first_ns[first_ns == np.iinfo(np.int64).max] = 0
    rot = first_ns[ring_of]
    perm = base + (intra + rot) % n_of
    v = v[perm]
    smooth = smooth[perm]
    if hp is not None:
        hp = hp[perm]

    # ---- segments (rings are closed: seg_count == vertex count)
    nxt = v[wrap(1)]
    seg_vec = nxt - v
    seg_len = np.linalg.norm(seg_vec, axis=1)

    # ---- uv progress with resets: segment i starts a new run iff i==0 in its
    # ring or vertex i is non-smooth (list was rotated so vertex 0 is
    # non-smooth whenever any is)
    run_break = (~smooth) | (intra == 0)
    run_id = np.cumsum(run_break) - 1  # global run ids (contiguous per ring)
    n_runs = run_id[-1] + 1 if V else 0
    run_start_flat = np.nonzero(run_break)[0]
    # per-run sequential cumsum via a padded matrix — BITWISE-identical to the
    # scalar kernel's running `cur += seg_len` (a global cumsum would leak
    # float error across rings and flip integer-boundary cut counts, breaking
    # batch-size invariance)
    intra_run = np.arange(V) - run_start_flat[run_id]
    max_run = int(intra_run.max()) + 1
    m = np.zeros((n_runs, max_run))
    m[run_id, intra_run] = seg_len
    c = np.cumsum(m, axis=1)
    u1 = c[run_id, intra_run]
    u0 = np.where(intra_run > 0, c[run_id, np.maximum(intra_run - 1, 0)], 0.0)

    # ---- per-run window scaling
    run_len = np.zeros(n_runs)
    np.maximum.at(run_len, run_id, u1)
    window_count = np.floor(run_len / window_width + 0.5)
    has_window_run = window_count > 0
    divisor = np.where(has_window_run, run_len / np.maximum(window_count, 1), window_width)
    # windowsProgress: cumsum of window_count over PREVIOUS runs within ring
    run_ring = ring_of[run_start_flat]
    wc_cum = np.cumsum(window_count) - window_count
    ring_first_run = np.full(R, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(ring_first_run, run_ring, np.arange(n_runs))
    ring_first_run[ring_first_run == np.iinfo(np.int64).max] = 0
    wp = wc_cum - wc_cum[ring_first_run][run_ring]
    u0 = u0 / divisor[run_id] + wp[run_id]
    u1 = u1 / divisor[run_id] + wp[run_id]
    has_window = has_window_run[run_id]

    # ---- subsegment cut counts (dedup'd integer boundaries, see walls.py)
    nonzero = seg_len > 0
    bs = np.ceil(u0)
    be = np.floor(u1)
    ni = np.maximum(0, (be - bs + 1)).astype(np.int64)
    first_dup = (ni > 0) & (bs == u0)
    ni2 = ni - first_dup.astype(np.int64)
    last_val = np.where(ni2 > 0, be, u0)
    tail = last_val != u1
    n_sub = np.where(nonzero, ni2 + tail.astype(np.int64), 0)

    # expand to subsegments
    sub_t, sub_seg = _ragged_arange(n_sub)
    b0 = (bs + first_dup)[sub_seg]
    su0 = np.where(sub_t == 0, u0[sub_seg], np.minimum(b0 + sub_t - 1, u1[sub_seg]))
    su1 = np.minimum(b0 + sub_t, u1[sub_seg])

    # ---- level expansion
    ring_of_sub = ring_of[sub_seg]
    lv = levels_r[ring_of_sub]
    n_lev = np.where(lv > 0, np.ceil(lv).astype(np.int64), 0)
    blk_i, blk_sub = _ragged_arange(n_lev)
    S = len(blk_sub)  # total quad blocks
    seg_i = sub_seg[blk_sub]
    ring_i = ring_of[seg_i]

    # geometry per block
    a_pt = v[seg_i]
    dirv = seg_vec[seg_i] / seg_len[seg_i][:, None]
    raw0 = u0[seg_i]  # already window-scaled
    total_u = (u1 - u0)[seg_i]
    with np.errstate(divide="ignore", invalid="ignore"):
        uv_to_ws = np.where(total_u != 0, seg_len[seg_i] / total_u, 0.0)
    off_ws = (su0[blk_sub] - raw0) * uv_to_ws
    width_ws = (su1[blk_sub] - su0[blk_sub]) * uv_to_ws
    p0 = a_pt + dirv * off_ws[:, None]
    p1 = a_pt + dirv * (off_ws + width_ws)[:, None]

    minh = min_height_r[ring_i]
    z_const = height_r[ring_i] - minh
    if hp is not None:
        # NaN height_points mean "no override for this ring" (mixed batches)
        hpa = hp[seg_i]
        hpb = hp[wrap(1)[seg_i]]
        z_a = np.where(np.isnan(hpa), z_const, hpa - minh)
        z_b = np.where(np.isnan(hpb), z_const, hpb - minh)
    else:
        z_a = z_const
        z_b = z_const
    a0 = off_ws / seg_len[seg_i]
    a1 = (off_ws + width_ws) / seg_len[seg_i]
    h0 = z_a + (z_b - z_a) * a0
    h1 = z_a + (z_b - z_a) * a1

    f0 = ((su0[blk_sub] % 1) + 1) % 1
    f1 = ((su1[blk_sub] % 1) + 1) % 1
    f1 = np.where(f1 == 0, 1.0, f1)

    lvb = lv[blk_sub]
    v0 = blk_i / lvb
    v1 = np.where(lvb < 1, 1.0, (blk_i + 1) / lvb)
    y0b = minh + h0 * v0
    y1b = minh + h1 * v0
    y0t = minh + h0 * v1
    y1t = minh + h1 * v1

    # ---- assemble 6 vertices per block (float32 directly: no f64 copy)
    pos = np.empty((S, 6, 3), dtype=np.float32)
    pos[:, 0, :2] = p1
    pos[:, 0, 2] = y1b
    pos[:, 1, :2] = p0
    pos[:, 1, 2] = y0b
    pos[:, 2, :2] = p0
    pos[:, 2, 2] = y0t
    pos[:, 3, :2] = p1
    pos[:, 3, 2] = y1b
    pos[:, 4, :2] = p0
    pos[:, 4, 2] = y0t
    pos[:, 5, :2] = p1
    pos[:, 5, 2] = y1t

    if emit_attrs:
        uv = np.empty((S, 6, 2), dtype=np.float32)
        uv[:, [1, 2, 4], 0] = f0[:, None]
        uv[:, [0, 3, 5], 0] = f1[:, None]
        uv[:, [0, 1, 3], 1] = 0.0
        uv[:, [2, 4, 5], 1] = 1.0

        nrm2 = np.stack([-(seg_vec[:, 1]), seg_vec[:, 0]], axis=1) / seg_len[:, None]
        normal = np.zeros((S, 6, 3), dtype=np.float32)
        normal[:, :, 0] = nrm2[seg_i, 0][:, None]
        normal[:, :, 1] = nrm2[seg_i, 1][:, None]

        tex = np.where(has_window[seg_i], tex_win_r[ring_i], tex_wall_r[ring_i]).astype(np.uint8)
        texture_id = np.repeat(tex, 6)
    else:
        uv = np.empty((0, 6, 2), dtype=np.float32)
        normal = np.empty((0, 6, 3), dtype=np.float32)
        texture_id = np.empty(0, np.uint8)

    # per-ring output vertex counts (6 per block)
    out_counts = np.zeros(R, dtype=np.int64)
    np.add.at(out_counts, ring_i, 6)

    return (
        {
            "position": pos.reshape(-1, 3),
            "uv": uv.reshape(-1, 2),
            "normal": normal.reshape(-1, 3),
            "texture_id": texture_id,
        },
        out_counts,
    )


def _empty() -> dict[str, np.ndarray]:
    return {
        "position": np.empty((0, 3), np.float32),
        "uv": np.empty((0, 2), np.float32),
        "normal": np.empty((0, 3), np.float32),
        "texture_id": np.empty(0, np.uint8),
    }
