"""Random sampling over a spatial range join (shape from "Random
Sampling Over Spatial Range Joins", ICDE 2025 — see PAPERS.md): draw a
deterministic uniform sample of the JOIN RESULT of the building
band-join without materializing or shuffling the full pair set past the
sampling stage.

The candidate enumeration reuses the grid-bucket band join of
``pipelines/rangejoin.neighbor_density`` (3×3 stencil replication, one
cell-keyed exchange); inside the partition kernel each surviving pair
is kept with probability 1/20 by the keyed Jenkins uniform of its PAIR
key — a pure integer rule (``h · 20 < 2^32``), so the sample is
partition-invariant, rerunnable, and exactly mirrored by the DuckDB
band-join + Jenkins-chain oracle.  Only sampled pairs are ever emitted
from the kernel; the unsampled join result never exists as rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_PAIR_P = np.int64(1000003)  # pair key = a·P + b (documented id-domain bound)


def range_join_sample(
    sf_dir: str, radius_m: float | None = None, tag: int = 91
) -> "ray.data.Dataset":
    """Uniform 1-in-20 sample of building pairs whose centroids fall
    within an L∞ box of ``radius_m`` (default: the density-scaled radius
    of ``neighbor_density``).  Each unordered pair is considered exactly
    once (emitted from the smaller id's home cell).

    Output: (osm_id_a, osm_id_b, h) with osm_id_a < osm_id_b.
    """
    from ..geom.rng import jenkins_mix
    from ..synth.generator import ensure_synth, sf_from_dir
    from .partition import map_key_partitions

    sf = sf_from_dir(sf_dir)
    root = ensure_synth(sf)
    if radius_m is None:
        radius_m = float(min(2000.0, max(50.0, 500.0 * (0.01 / sf))))
    r_e6 = np.int64(int(round(radius_m * 1e6)))
    tagmix = np.uint32((tag * 2654435761) & 0xFFFFFFFF)

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
        offs = np.array([-1, 0, 1], dtype=np.int64)
        dgx = gx[:, None] + np.tile(offs, 3)[None, :]
        dgy = gy[:, None] + np.repeat(offs, 3)[None, :]
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

    def sample_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "osm_id_a": pa.array([], type=pa.int64()),
                "osm_id_b": pa.array([], type=pa.int64()),
                "h": pa.array([], type=pa.int64()),
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
        order = np.lexsort((side, gx, gy))
        gx, gy, side = gx[order], gy[order], side[order]
        oid, cx, cy = oid[order], cx[order], cy[order]
        qm = side == 1
        if not qm.any():
            return empty
        brk = np.ones(len(gx), dtype=bool)
        brk[1:] = (gx[1:] != gx[:-1]) | (gy[1:] != gy[:-1])
        run_id = np.cumsum(brk) - 1
        run_start = np.flatnonzero(brk)
        d_per_run = np.bincount(run_id[~qm], minlength=len(run_start)).astype(
            np.int64
        )
        q_idx = np.flatnonzero(qm)
        q_run = run_id[qm]
        lens = d_per_run[q_run]
        total = int(lens.sum())
        if total == 0:
            return empty
        nq = len(q_idx)
        qrep = np.repeat(np.arange(nq, dtype=np.int64), lens)
        base = np.repeat(run_start[q_run], lens)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        didx = base + within
        qg = q_idx[qrep]
        hit = (
            (np.abs(cx[didx] - cx[qg]) <= r_e6)
            & (np.abs(cy[didx] - cy[qg]) <= r_e6)
            & (oid[qg] < oid[didx])  # each unordered pair counted once
        )
        a, b = oid[qg][hit], oid[didx][hit]
        key = a * _PAIR_P + b
        h = jenkins_mix(key.astype(np.uint64).astype(np.uint32) ^ tagmix)
        h = jenkins_mix(
            h ^ (key.astype(np.uint64) >> np.uint64(32)).astype(np.uint32)
        )
        h64 = h.astype(np.int64)
        keep = h64 * np.int64(20) < np.int64(4294967296)
        return pa.table(
            {
                "osm_id_a": pa.array(a[keep].astype(np.int64)),
                "osm_id_b": pa.array(b[keep].astype(np.int64)),
                "h": pa.array(h64[keep]),
            }
        )

    return map_key_partitions(pts, ["cell_x", "cell_y"], sample_part)


def weighted_join_sample(
    sf_dir: str, anchor_type: str = "purchase", window_hours: int = 1, tag: int = 73
) -> "ray.data.Dataset":
    """Weighted sampling over a join (shape from "Streaming Weighted
    Sampling over Join Queries", EDBT 2023 — see PAPERS.md): sample
    TUPLES of the attribution interval join (per anchor, the same user's
    events in the preceding window) with probability proportional to the
    matched event's value — without materializing the unsampled join.

    Per user-keyed partition: one lexsort; each anchor's [lo, hi) window
    in the events subarray comes from the two-probe cumulative-count
    trick of ``rangejoin.event_attribution``; the pair expansion is the
    grouped cross-product arithmetic; each candidate tuple survives iff
    ``h(pair_key) · 5e8 < value_e6 · 2^32`` (probability value/500) —
    pure integers, Jenkins-mirrored in the oracle.

    Output: (event_id, prior_event_id, value_micro, h).
    """
    from ..geom.rng import jenkins_mix
    from .partition import map_key_partitions

    win_us = np.int64(window_hours) * np.int64(3_600_000_000)
    tagmix = np.uint32((tag * 2654435761) & 0xFFFFFFFF)

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
                "eid": pa.array(np.concatenate([eid, eid]).astype(np.int64)),
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
                "eid": batch.column("event_id"),
                "kind": pa.array(np.zeros(n, dtype=np.int8)),
                "val_e6": pa.array(np.floor(v * 1e6 + 0.5).astype(np.int64)),
            }
        )

    anchors = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    ).map_batches(anchor_probes, batch_format="pyarrow")
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    ).map_batches(event_rows, batch_format="pyarrow")

    def sample_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], type=pa.int64()),
                "prior_event_id": pa.array([], type=pa.int64()),
                "value_micro": pa.array([], type=pa.int64()),
                "h": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        tsv = tbl.column("ts_us").to_numpy(zero_copy_only=False)
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        eid = tbl.column("eid").to_numpy(zero_copy_only=False)
        kind = tbl.column("kind").to_numpy(zero_copy_only=False)
        val = tbl.column("val_e6").to_numpy(zero_copy_only=False)
        # probes before events at equal ts: start inclusive, end exclusive
        order = np.lexsort((side, tsv, uid))
        uid, side = uid[order], side[order]
        eid, kind, val = eid[order], kind[order], val[order]
        ev_mask = side == 1
        cum_n = np.cumsum(ev_mask, dtype=np.int64)
        ev_eid, ev_val = eid[ev_mask], val[ev_mask]
        pm = ~ev_mask
        if not pm.any() or not ev_mask.any():
            return empty
        pok, pkind = eid[pm], kind[pm]
        pn = cum_n[pm]  # events strictly before the probe = subarray index
        po = np.lexsort((pkind, pok))
        pok, pn = pok[po], pn[po]
        lo, hi = pn[::2], pn[1::2]
        aeid = pok[::2]
        lens = hi - lo
        total = int(lens.sum())
        if total == 0:
            return empty
        arep = np.repeat(np.arange(len(aeid), dtype=np.int64), lens)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        didx = np.repeat(lo, lens) + within
        a, b = aeid[arep], ev_eid[didx]
        v = ev_val[didx]
        key = a * np.int64(1000003) + b
        h = jenkins_mix(key.astype(np.uint64).astype(np.uint32) ^ tagmix)
        h = jenkins_mix(
            h ^ (key.astype(np.uint64) >> np.uint64(32)).astype(np.uint32)
        )
        h64 = h.astype(np.int64)
        keep = h64 * np.int64(500_000_000) < v * np.int64(4294967296)
        return pa.table(
            {
                "event_id": pa.array(a[keep]),
                "prior_event_id": pa.array(b[keep]),
                "value_micro": pa.array(v[keep]),
                "h": pa.array(h64[keep]),
            }
        )

    return map_key_partitions(anchors.union(events), ["user_id"], sample_part)


def reservoir_sample(sf_dir: str, k: int = 100, tag: int = 57) -> "ray.data.Dataset":
    """Deterministic distributed reservoir sample: a uniform
    without-replacement ``k``-subset of the documents table, as the ``k``
    rows with the SMALLEST keyed-Jenkins priority ``h(doc_id, tag)``
    (Vitter's reservoir semantics made rerunnable: fixed hash priorities
    instead of stateful randomness, so the sample is partition-invariant,
    resumable, and exactly SQL-mirrorable — the standard trick for
    samples that must survive retries at 100 TB).

    Scale shape: each block emits only its own top-``k`` partial (a
    ``np.argpartition`` per batch, no sort of the full block); ONE
    single-key exchange merges ``k × n_blocks`` candidate rows — KBs, not
    corpus — and the final top-``k`` is one partition kernel.  The
    documents read prunes to ``doc_id`` alone.

    Output: (doc_id, h); ties (h equal) break by doc_id, mirrored in the
    oracle's ``ORDER BY h, doc_id LIMIT k``."""
    from ..geom.rng import jenkins_mix
    from .partition import map_key_partitions

    tagmix = np.uint32((tag * 2654435761) & 0xFFFFFFFF)

    def priority(ids: np.ndarray) -> np.ndarray:
        key = ids.astype(np.uint64)
        h = jenkins_mix(key.astype(np.uint32) ^ tagmix)
        return jenkins_mix(h ^ (key >> np.uint64(32)).astype(np.uint32))

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = priority(ids).astype(np.int64)
        if len(ids) > k:
            idx = np.argpartition(h, k)[:k]
            ids, h = ids[idx], h[idx]
        return pa.table(
            {
                "one": pa.array(np.zeros(len(ids), dtype=np.int64)),
                "doc_id": pa.array(ids.astype(np.int64)),
                "h": pa.array(h),
            }
        )

    def final_topk(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "h": pa.array([], type=pa.int64()),
                }
            )
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        h = tbl.column("h").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order]),
                "h": pa.array(h[order]),
            }
        )

    import ray.data as rd

    partials = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(partial_topk, batch_format="pyarrow")
    return map_key_partitions(partials, ["one"], final_topk, num_partitions=1)
