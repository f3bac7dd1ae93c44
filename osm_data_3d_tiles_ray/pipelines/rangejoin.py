"""Range joins — the interval/band join family Ray Data has no native
operator for (the reference engine has no joins at all; like the as-of
join in ``pipelines/events.py`` these belong to the engine's
training-data operator set, per SURVEY.md §2 companions).

Two shapes:

* **Temporal interval join** (``event_attribution``): every left row
  defines a time window and the join aggregates right rows falling in
  it.  Implemented as the classic *prefix-sum sweep*: both sides
  project to a shared ``(key, ts, side, ...)`` shape, ONE hash shuffle
  on the join key co-locates each key's rows, and inside a partition a
  single lexsort + cumulative sum answers every window with two probe
  lookups (``F(t1) − F(t0)``).  No per-window scan, no per-key group
  dispatch, and the shuffle never carries full rows of either table.

* **Spatial band join** (``neighbor_density``): every point counts its
  neighbors within an L∞ radius.  Implemented with the grid-bucket
  trick: points land in cells of size == radius; the DATA side
  replicates each point to its 3×3 neighbor cells (constant 9× blowup
  of a 4-column fixed-width row), the QUERY side stays in its home
  cell, and one hash shuffle on the cell id co-locates every candidate
  pair.  Per partition the candidate pairs expand via grouped
  cross-product index arithmetic (no Python loop over cells) and the
  exact box predicate filters them.  Skew is bounded by the densest
  single cell; shrinking the cell (and widening the replication
  stencil) trades replication factor against per-cell quadratic cost.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def event_attribution(
    sf_dir: str, anchor_type: str = "purchase", window_hours: int = 1
) -> "ray.data.Dataset":
    """Attribution interval join: for every anchor event (type
    ``anchor_type``), count + value-sum of the SAME USER's events in the
    preceding window ``[ts - window, ts)`` (LEFT-join semantics — every
    anchor appears, zero-activity anchors report 0).

    Each anchor contributes two PROBE rows (window start / window end);
    all events contribute value rows.  After the one key shuffle, a
    partition sorts once by (user, ts, side) with probes before events
    at equal ts — so the inclusive cumulative count at a probe position
    counts events strictly before its timestamp, making the start probe
    inclusive and the end probe exclusive exactly as the predicate
    requires (the anchor itself, at the window's end timestamp, is
    excluded).  Window aggregates are differences of the two probes'
    cumulative (count, value) — exact int64 arithmetic because event
    values quantize to integer micro-units BEFORE the cumsum (repo
    float rule: differences of float cumsums are association-noisy).

    Output: (event_id, user_id, n_prior, sum_value_micro).
    """
    from .partition import map_key_partitions

    win_us = np.int64(window_hours) * np.int64(3_600_000_000)

    def anchor_probes(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("event_type"), anchor_type)
        batch = batch.filter(mask)
        ts = batch.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        t1 = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        n = len(batch)
        return pa.table(
            {
                "user_id": pa.array(np.concatenate([uid, uid]).astype(np.int64)),
                "ts_us": pa.array(np.concatenate([t1 - win_us, t1])),
                "side": pa.array(np.zeros(2 * n, dtype=np.int8)),
                "okey": pa.array(np.concatenate([eid, eid]).astype(np.int64)),
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(n, dtype=np.int8), np.ones(n, dtype=np.int8)]
                    )
                ),
                "val_e6": pa.array(np.zeros(2 * n, dtype=np.int64)),
            }
        )

    def event_rows(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        v = batch.column("value").to_numpy(zero_copy_only=False)
        n = len(batch)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts_us": ts.cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "okey": pa.array(np.zeros(n, dtype=np.int64)),
                "kind": pa.array(np.zeros(n, dtype=np.int8)),
                "val_e6": pa.array(np.floor(v * 1e6 + 0.5).astype(np.int64)),
            }
        )

    anchors = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    ).map_batches(anchor_probes, batch_format="pyarrow")
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    ).map_batches(event_rows, batch_format="pyarrow")

    def sweep_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], type=pa.int64()),
                "user_id": pa.array([], type=pa.int64()),
                "n_prior": pa.array([], type=pa.int64()),
                "sum_value_micro": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        tsv = tbl.column("ts_us").to_numpy(zero_copy_only=False)
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        okey = tbl.column("okey").to_numpy(zero_copy_only=False)
        kind = tbl.column("kind").to_numpy(zero_copy_only=False)
        val = tbl.column("val_e6").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, tsv, uid))
        uid, side = uid[order], side[order]
        okey, kind, val = okey[order], kind[order], val[order]
        cum_n = np.cumsum(side == 1, dtype=np.int64)
        cum_v = np.cumsum(val, dtype=np.int64)
        pm = side == 0
        if not pm.any():
            return empty
        pok, pkind, puid = okey[pm], kind[pm], uid[pm]
        pn, pv = cum_n[pm], cum_v[pm]
        po = np.lexsort((pkind, pok))  # per anchor: start probe then end probe
        pok, puid = pok[po], puid[po]
        pn, pv = pn[po], pv[po]
        return pa.table(
            {
                "event_id": pa.array(pok[::2]),
                "user_id": pa.array(puid[::2]),
                "n_prior": pa.array(pn[1::2] - pn[::2]),
                "sum_value_micro": pa.array(pv[1::2] - pv[::2]),
            }
        )

    return map_key_partitions(anchors.union(events), ["user_id"], sweep_part)


def neighbor_density(sf_dir: str, radius_m: float | None = None) -> "ray.data.Dataset":
    """Per building: how many OTHER buildings have their centroid within
    an L∞ box of ``radius_m`` meters (the blocking-and-verify spatial
    band join; density signal for LOD/declutter decisions over the
    synthetic corpus's buildings table — centroids per
    /root/reference/src/building/(parse semantics), bbox/centroid columns
    as in ``pipelines/geo.py``).

    Centroids quantize to integer microns (``floor(c*1e6 + 0.5)``) so
    the box predicate is exact int64 on both the engine and the DuckDB
    band-join oracle.  The per-partition kernel expands cell-grouped
    candidate pairs with repeat/arange index arithmetic — one
    vectorized pass, no loop over cells.

    Output: (osm_id, n_neighbors) for every building.

    The default radius scales inversely with the scale factor (the synth
    corpus keeps a FIXED extent, so point density grows linearly with
    sf): 500 m at sf0.01, clamped to [50 m, 2000 m].  Candidate-pair
    work per point stays bounded as sf grows — at a fixed radius it
    would grow linearly with density and the band join quadratically in
    the densest cell.  Pass ``radius_m`` to pin a radius explicitly.
    """
    from ..synth.generator import ensure_synth, sf_from_dir
    from .partition import map_key_partitions

    sf = sf_from_dir(sf_dir)
    root = ensure_synth(sf)
    if radius_m is None:
        radius_m = float(min(2000.0, max(50.0, 500.0 * (0.01 / sf))))
    r_e6 = np.int64(int(round(radius_m * 1e6)))

    def to_cells(batch: pa.Table) -> pa.Table:
        oid = batch.column("osm_id").to_numpy(zero_copy_only=False)
        cx = np.floor(
            batch.column("centroid_x").to_numpy(zero_copy_only=False) * 1e6 + 0.5
        ).astype(np.int64)
        cy = np.floor(
            batch.column("centroid_y").to_numpy(zero_copy_only=False) * 1e6 + 0.5
        ).astype(np.int64)
        gx, gy = cx // r_e6, cy // r_e6
        n = len(oid)
        # data side: 9 copies (3x3 stencil); query side: home cell only
        offs = np.array([-1, 0, 1], dtype=np.int64)
        dgx = gx[:, None] + np.tile(offs, 3)[None, :]  # x offsets cycle
        dgy = gy[:, None] + np.repeat(offs, 3)[None, :]  # y offsets repeat
        return pa.table(
            {
                "cell_x": pa.array(np.concatenate([dgx.ravel(), gx])),
                "cell_y": pa.array(np.concatenate([dgy.ravel(), gy])),
                "side": pa.array(
                    np.concatenate(
                        [np.zeros(9 * n, dtype=np.int8), np.ones(n, dtype=np.int8)]
                    )
                ),
                "osm_id": pa.array(np.concatenate([np.repeat(oid, 9), oid])),
                "cx": pa.array(np.concatenate([np.repeat(cx, 9), cx])),
                "cy": pa.array(np.concatenate([np.repeat(cy, 9), cy])),
            }
        )

    pts = ray.data.read_parquet(
        str(root / "buildings"), columns=["osm_id", "centroid_x", "centroid_y"]
    ).map_batches(to_cells, batch_format="pyarrow")

    def count_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "osm_id": pa.array([], type=pa.int64()),
                "n_neighbors": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        gx = tbl.column("cell_x").to_numpy(zero_copy_only=False)
        gy = tbl.column("cell_y").to_numpy(zero_copy_only=False)
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        oid = tbl.column("osm_id").to_numpy(zero_copy_only=False)
        cx = tbl.column("cx").to_numpy(zero_copy_only=False)
        cy = tbl.column("cy").to_numpy(zero_copy_only=False)
        # sort by cell, data rows before query rows inside a cell
        order = np.lexsort((side, gx, gy))
        gx, gy, side = gx[order], gy[order], side[order]
        oid, cx, cy = oid[order], cx[order], cy[order]
        qm = side == 1
        if not qm.any():
            return empty
        # cell run boundaries over the combined (data+query) sort
        brk = np.ones(len(gx), dtype=bool)
        brk[1:] = (gx[1:] != gx[:-1]) | (gy[1:] != gy[:-1])
        run_id = np.cumsum(brk) - 1
        run_start = np.flatnonzero(brk)
        # data rows per run (data sorts first inside each run)
        d_per_run = np.bincount(run_id[~qm], minlength=len(run_start)).astype(
            np.int64
        )
        q_idx = np.flatnonzero(qm)
        q_run = run_id[qm]
        lens = d_per_run[q_run]  # candidates per query = its cell's data rows
        total = int(lens.sum())
        nq = len(q_idx)
        if total == 0:
            return pa.table(
                {
                    "osm_id": pa.array(oid[q_idx]),
                    "n_neighbors": pa.array(np.zeros(nq, dtype=np.int64)),
                }
            )
        qrep = np.repeat(np.arange(nq, dtype=np.int64), lens)
        base = np.repeat(run_start[q_run], lens)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        didx = base + within
        hit = (
            (np.abs(cx[didx] - cx[q_idx][qrep]) <= r_e6)
            & (np.abs(cy[didx] - cy[q_idx][qrep]) <= r_e6)
            & (oid[didx] != oid[q_idx][qrep])
        )
        counts = np.bincount(qrep[hit], minlength=nq).astype(np.int64)
        return pa.table(
            {"osm_id": pa.array(oid[q_idx]), "n_neighbors": pa.array(counts)}
        )

    return map_key_partitions(pts, ["cell_x", "cell_y"], count_part)
