"""Windowed aggregation over the driver's ``events`` stream table
(``event_id, ts, user_id, event_type, value, props``).

Tumbling-window aggregates use the combiner-before-shuffle pattern: the
window key + partial sums are computed per batch, then a small groupby
merges partials — the shuffle carries one row per (window, type) per
block, never per event.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _events(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/events.parquet")


def hourly_by_type(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling 1-hour window per event_type: count + sum(value)."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        hour = pc.floor_temporal(ts, unit="hour")
        t = pa.table(
            {
                "window_start": hour,
                "event_type": batch.column("event_type"),
                "value": batch.column("value"),
            }
        )
        # per-batch combine
        g = t.group_by(["window_start", "event_type"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )
        return pa.table(
            {
                "window_start": g.column("window_start"),
                "event_type": g.column("event_type"),
                "p_sum": g.column("value_sum"),
                "p_cnt": pc.cast(g.column("value_count"), pa.int64()),
            }
        )

    partials = _events(sf_dir).select_columns(["ts", "event_type", "value"]).map_batches(
        partial, batch_format="pyarrow"
    )
    merged = partials.groupby(["window_start", "event_type"]).aggregate(
        ray.data.aggregate.Sum("p_sum", alias_name="sum_value"),
        ray.data.aggregate.Sum("p_cnt", alias_name="n_events"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        # integer micro-units: float summation order differs between the
        # partial-combine tree and the oracle's single-pass sum, so compare
        # round(sum * 1e6) as int64 (robust to 1e-15 association noise)
        s = batch.column("sum_value").to_numpy(zero_copy_only=False)
        micro = np.floor(s * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "window_start": batch.column("window_start"),
                "event_type": batch.column("event_type"),
                "n_events": pc.cast(batch.column("n_events"), pa.int64()),
                "sum_value_micro": pa.array(micro),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def sessionize(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """Gap-based sessionization: per user, a new session starts after a
    >30-min silence.  Output: (user_id, session_start, n_events,
    duration_sec).

    The shuffle key is user_id, but per-user work runs per hash PARTITION
    (pipelines/partition.py): one lexsort of the whole partition by
    (user, ts, event_id), a break where the user changes OR the gap
    exceeds the threshold, then bincount/boundary segment reductions —
    no per-user Python dispatch (millions of users = millions of 1-ms
    ``map_groups`` calls otherwise)."""
    from .partition import map_key_partitions

    gap_us = np.int64(gap_minutes * 60 * 1_000_000)

    def sessions_part(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "session_start": pa.array([], type=pa.timestamp("us")),
                    "n_events": pa.array([], type=pa.int64()),
                    "duration_sec": pa.array([], type=pa.int64()),
                }
            )
        ts = tbl.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        tsv = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, tsv, uid))
        tsv, uid = tsv[order], uid[order]
        brk = np.ones(len(tsv), dtype=bool)
        brk[1:] = (uid[1:] != uid[:-1]) | (np.diff(tsv) > gap_us)
        sess = np.cumsum(brk) - 1
        counts = np.bincount(sess)
        first = np.nonzero(brk)[0]
        last = np.concatenate([first[1:] - 1, [len(tsv) - 1]])
        return pa.table(
            {
                "user_id": pa.array(uid[first]),
                "session_start": pa.array(tsv[first]).cast(pa.timestamp("us")),
                "n_events": pa.array(counts.astype(np.int64)),
                "duration_sec": pa.array((tsv[last] - tsv[first]) // 1_000_000),
            }
        )

    return map_key_partitions(
        _events(sf_dir).select_columns(["user_id", "ts", "event_id"]),
        ["user_id"],
        sessions_part,
    )


def asof_last_order(sf_dir: str) -> "ray.data.Dataset":
    """As-of join: each event ← the latest order of the same user with
    ``o_orderdate <= ts`` (the classic point-in-time join Ray Data has no
    native operator for; the reference engine has no joins at all — this
    belongs to the engine's training-data operator set).

    Composition, per SURVEY.md §7.3's one-shuffle rule: both sides are
    projected to a shared ``(user_id, ts, side, payload)`` shape and
    UNIONed, then ONE hash shuffle on the join key co-locates each user's
    rows; inside a group the order timestamps are sorted once and every
    event binary-searches its floor (``searchsorted right − 1``).  The
    shuffle never carries full rows of either table, and skew is bounded
    by the hottest single user.  Output columns are exactly the
    tie-deterministic ones (the matched ORDER DATE, not an arbitrary
    order id among same-date ties).  Oracle: DuckDB ``ASOF JOIN``."""

    def ev_rows(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts_us": ts.cast(pa.int64()),
                "side": pa.array(np.ones(len(batch), dtype=np.int8)),
                "payload": batch.column("event_id"),
            }
        )

    def order_rows(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        if isinstance(od, pa.ChunkedArray):
            od = od.combine_chunks()
        return pa.table(
            {
                "user_id": batch.column("o_custkey"),
                "ts_us": od.cast(pa.int64()),
                "side": pa.array(np.zeros(len(batch), dtype=np.int8)),
                "payload": pa.array(np.zeros(len(batch), dtype=np.int64)),
            }
        )

    ev = (
        _events(sf_dir)
        .select_columns(["user_id", "ts", "event_id"])
        .map_batches(ev_rows, batch_format="pyarrow")
    )
    od = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
        ).map_batches(order_rows, batch_format="pyarrow")
    )

    from .partition import map_key_partitions

    def merge_part(tbl: pa.Table) -> pa.Table:
        """All users of one hash partition at once: sort by (user, ts,
        side) with orders before events at equal ts (the join is
        inclusive), forward-fill the last-order row index with
        ``np.maximum.accumulate``, and invalidate fills that crossed a
        user boundary — one vectorized pass, no per-user dispatch."""
        empty = pa.table(
            {
                "event_id": pa.array([], type=pa.int64()),
                "user_id": pa.array([], type=pa.int64()),
                "last_order_date": pa.array([], type=pa.timestamp("us")),
            }
        )
        if len(tbl) == 0:
            return empty
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        tsv = tbl.column("ts_us").to_numpy(zero_copy_only=False)
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        payload = tbl.column("payload").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, tsv, uid))
        side, tsv, uid, payload = side[order], tsv[order], uid[order], payload[order]
        n = len(side)
        idx = np.where(side == 0, np.arange(n, dtype=np.int64), np.int64(-1))
        np.maximum.accumulate(idx, out=idx)
        ev_mask = side == 1
        cand = idx[ev_mask]
        cand_c = np.clip(cand, 0, n - 1)
        ev_uid = uid[ev_mask]
        valid = (cand >= 0) & (uid[cand_c] == ev_uid)
        if not valid.any():
            return empty
        return pa.table(
            {
                "event_id": pa.array(payload[ev_mask][valid]),
                "user_id": pa.array(ev_uid[valid]),
                "last_order_date": pa.array(tsv[cand_c][valid]).cast(
                    pa.timestamp("us")
                ),
            }
        )

    return map_key_partitions(od.union(ev), ["user_id"], merge_part)


def user_value_rank(sf_dir: str, top_n: int = 3) -> "ray.data.Dataset":
    """Windowed ranking (``ROW_NUMBER() OVER (PARTITION BY user ORDER BY
    value DESC, event_id)``, top-N per user): one shuffle on the hash of
    the partition key, then ONE lexsort + run-boundary rank computation
    per hash partition (no per-user dispatch).  The shuffle carries only
    (user_id, event_id, value)."""

    from .partition import map_key_partitions, run_starts

    def rank_part(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "event_id": pa.array([], type=pa.int64()),
                    "rnk": pa.array([], type=pa.int64()),
                }
            )
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        val = tbl.column("value").to_numpy(zero_copy_only=False)
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, -val, uid))
        uid, eid = uid[order], eid[order]
        starts = run_starts(uid)
        run_id = np.cumsum(starts) - 1
        first_idx = np.nonzero(starts)[0]
        rnk = np.arange(len(uid), dtype=np.int64) - first_idx[run_id] + 1
        keep = rnk <= top_n
        return pa.table(
            {
                "user_id": pa.array(uid[keep]),
                "event_id": pa.array(eid[keep]),
                "rnk": pa.array(rnk[keep]),
            }
        )

    return map_key_partitions(
        _events(sf_dir).select_columns(["user_id", "event_id", "value"]),
        ["user_id"],
        rank_part,
    )


def user_daily_activity(sf_dir: str) -> "ray.data.Dataset":
    """Per (user, day): event count + distinct event types (set-like agg)."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        day = pc.floor_temporal(ts, unit="day")
        t = pa.table(
            {
                "day": day,
                "user_id": batch.column("user_id"),
                "event_type": batch.column("event_type"),
            }
        )
        g = t.group_by(["day", "user_id", "event_type"]).aggregate([("event_type", "count")])
        return pa.table(
            {
                "day": g.column("day"),
                "user_id": g.column("user_id"),
                "event_type": g.column("event_type"),
                "p_cnt": pc.cast(g.column("event_type_count"), pa.int64()),
            }
        )

    partials = _events(sf_dir).select_columns(["ts", "user_id", "event_type"]).map_batches(
        partial, batch_format="pyarrow"
    )

    from .partition import map_key_partitions, run_starts

    def combine_part(tbl: pa.Table) -> pa.Table:
        """All (day, user) groups of one hash partition in one pass:
        lexsort by (day, user, type), then n_events = segment sum of the
        partial counts and n_types = distinct-type run starts per group."""
        if len(tbl) == 0:
            return pa.table(
                {
                    "day": pa.array([], type=tbl.schema.field("day").type),
                    "user_id": pa.array([], type=pa.int64()),
                    "n_events": pa.array([], type=pa.int64()),
                    "n_types": pa.array([], type=pa.int64()),
                }
            )
        day_type = tbl.schema.field("day").type
        day_col = tbl.column("day")
        if isinstance(day_col, pa.ChunkedArray):
            day_col = day_col.combine_chunks()
        day = day_col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        et = tbl.column("event_type").to_numpy(zero_copy_only=False)
        pcnt = tbl.column("p_cnt").to_numpy(zero_copy_only=False)
        et_code = np.unique(et, return_inverse=True)[1]
        order = np.lexsort((et_code, uid, day))
        day, uid, et_code, pcnt = (
            day[order],
            uid[order],
            et_code[order],
            pcnt[order],
        )
        g_start = run_starts(day, uid)
        g_id = np.cumsum(g_start) - 1
        n_groups = int(g_id[-1]) + 1
        n_events = np.bincount(g_id, weights=pcnt, minlength=n_groups).astype(
            np.int64
        )
        t_start = run_starts(day, uid, et_code)
        n_types = np.bincount(g_id[t_start], minlength=n_groups)
        first_idx = np.nonzero(g_start)[0]
        return pa.table(
            {
                "day": pa.array(day[first_idx]).cast(day_type),
                "user_id": pa.array(uid[first_idx]),
                "n_events": pa.array(n_events),
                "n_types": pa.array(n_types.astype(np.int64)),
            }
        )

    return map_key_partitions(partials, ["day", "user_id"], combine_part)


# ---------------------------------------------------------------------------
# mergeable sketches


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit avalanche hash (public splitmix64 constants)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def distinct_users_hll(sf_dir: str, p: int = 12) -> "pa.Table":
    """Approximate COUNT(DISTINCT user_id) via a mergeable HyperLogLog
    sketch (Flajolet et al. 2007, with the standard linear-counting
    small-range correction).

    The 100 TB shape: each batch reduces to ONE fixed 2^p-byte register
    row (``np.maximum`` over rank-of-hash per register); rows merge by
    elementwise max — associative, so the driver-side fold is over
    #blocks tiny rows, never user ids.  This is the sketch pattern every
    cardinality/heavy-hitter op at scale uses; exact distinct would
    shuffle every id."""
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        h = _splitmix64(uid.astype(np.int64))
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
        # rank = leading zeros of rest + 1 (capped at 64-p+1); vectorized
        # via float64 exponent extraction is unsafe near 2^63 — use a
        # halving cascade instead (6 steps, exact)
        rank = np.ones(len(h), dtype=np.int64)
        cur = rest
        for shift in (32, 16, 8, 4, 2, 1):
            zero_top = cur < (np.uint64(1) << np.uint64(63 - shift + 1))
            # top `shift` bits all zero → add shift, shift left
            add = np.where(cur == 0, 0, np.where(zero_top, shift, 0))
            rank += add
            cur = np.where(zero_top, cur << np.uint64(shift), cur)
        rank = np.minimum(rank, 64 - p + 1)
        rank = np.where(rest == 0, 64 - p + 1, rank)
        regs = np.zeros(m, dtype=np.int8)
        np.maximum.at(regs, idx, rank.astype(np.int8))
        return pa.table({"regs": pa.array([regs], type=pa.large_list(pa.int8()))})

    def merge_rows(batch: pa.Table) -> pa.Table:
        """Elementwise-MAX fold of ≤fan-in register rows into one —
        runs in the combiner tree (the top_terms shape), so the
        reduction is parallel in the block count, never a serial driver
        loop; max is fully associative, any fold order identical."""
        if len(batch) == 0:  # empty repartition block: keep the schema
            return batch
        col = batch.column("regs")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals = np.asarray(col.values).reshape(len(batch), -1)
        return pa.table(
            {
                "regs": pa.array(
                    [vals.max(axis=0)], type=pa.large_list(pa.int8())
                )
            }
        )

    partials = (
        _events(sf_dir)
        .select_columns(["user_id"])
        .map_batches(partial, batch_format="pyarrow")
    )
    merged = (
        partials.map_batches(merge_rows, batch_size=64, batch_format="pyarrow")
        .repartition(16)
        .map_batches(merge_rows, batch_size=None, batch_format="pyarrow")
    )
    regs = np.zeros(m, dtype=np.int8)
    for t in ray.get(merged.to_arrow_refs()):
        if t.num_rows:
            col = t.column("regs").combine_chunks()
            regs = np.maximum(
                regs,
                np.asarray(col.values).reshape(t.num_rows, -1).max(axis=0),
            )

    alpha = 0.7213 / (1.0 + 1.079 / m)
    # Z = Σ 2^-reg = S / 2^maxrank with S integer-EXACT (Python ints; the
    # float-powers sum is association-sensitive past 53 bits of spread, so
    # partial-order would leak into the estimate — and the DuckDB oracle
    # reproduces the integer S bit-for-bit)
    maxrank = 64 - p + 1
    hist = np.bincount(regs.astype(np.int64), minlength=maxrank + 1)
    s_int = sum(int(c) << (maxrank - r) for r, c in enumerate(hist) if c)
    est = alpha * m * m * float(1 << maxrank) / float(s_int)
    zeros = int(hist[0])
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting
    # floor(est + 0.5), not round(): Python/numpy round is half-even
    # while the oracle's SQL ROUND is half-away (ADVICE r4) — both sides
    # now share the explicit half-up rule
    return pa.table(
        {"n_users_hll": pa.array([int(np.floor(est + 0.5))], type=pa.int64())}
    )


def distinct_users_exact(sf_dir: str) -> "pa.Table":
    """Exact COUNT(DISTINCT user_id) — the shuffle-bounded exact path next
    to the HLL sketch above: each batch locally dedups its ids (only
    unique ids leave the scan), then one hash-partition exchange
    co-locates every occurrence of an id so per-partition unique counts
    sum exactly (pipelines/partition.py — P vectorized calls, never a
    per-id group).  At 100 TB the shuffle carries ≤ #distinct ids per
    block, and the partition count scales with the cluster."""
    from .partition import map_key_partitions

    def local_unique(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({"user_id": pa.array(np.unique(uid))})

    def count_part(part: pa.Table) -> pa.Table:
        uid = part.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([np.unique(uid).size], type=pa.int64())})

    parts = map_key_partitions(
        _events(sf_dir)
        .select_columns(["user_id"])
        .map_batches(local_unique, batch_format="pyarrow"),
        ["user_id"],
        count_part,
    )
    total = parts.sum("n") or 0
    return pa.table({"n_users": pa.array([int(total)], type=pa.int64())})


def sliding_window(sf_dir: str, hours: int = 6) -> "ray.data.Dataset":
    """Sliding-window aggregate (window = ``hours`` long, sliding by 1 h):
    every event contributes to the ``hours`` windows covering it.

    Replicate-then-combine: the replication happens INSIDE the per-batch
    partial aggregate (each batch emits at most #distinct(window, type)
    rows, already combined), so the shuffle cost is the tumbling-window
    one × window count — never #events × window count."""
    span = np.timedelta64(1, "h").astype("timedelta64[us]").astype(np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        hour = pc.floor_temporal(ts, unit="hour").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        etype = batch.column("event_type").to_numpy(zero_copy_only=False)
        value = batch.column("value").to_numpy(zero_copy_only=False)
        n = len(hour)
        # window starts: hour, hour-1h, ..., hour-(hours-1)h
        ws = (hour[:, None] - np.arange(hours, dtype=np.int64)[None, :] * span).reshape(-1)
        et = np.repeat(etype, hours)
        val = np.repeat(value, hours)
        t = pa.table(
            {
                "window_start": pa.array(ws).cast(pa.timestamp("us")),
                "event_type": pa.array(et),
                "value": pa.array(val),
            }
        )
        g = t.group_by(["window_start", "event_type"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )
        return pa.table(
            {
                "window_start": g.column("window_start"),
                "event_type": g.column("event_type"),
                "p_sum": g.column("value_sum"),
                "p_cnt": pc.cast(g.column("value_count"), pa.int64()),
            }
        )

    partials = (
        _events(sf_dir)
        .select_columns(["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
    )
    merged = partials.groupby(["window_start", "event_type"]).aggregate(
        ray.data.aggregate.Sum("p_sum", alias_name="sum_value"),
        ray.data.aggregate.Sum("p_cnt", alias_name="n_events"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        s = batch.column("sum_value").to_numpy(zero_copy_only=False)
        micro = np.floor(s * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "window_start": batch.column("window_start"),
                "event_type": batch.column("event_type"),
                "n_events": pc.cast(batch.column("n_events"), pa.int64()),
                "sum_value_micro": pa.array(micro),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def type_quantiles(sf_dir: str) -> "ray.data.Dataset":
    """Exact per-type value quantiles (p50/p95, linear interpolation —
    DuckDB ``quantile_cont`` semantics).  One shuffle on event_type; the
    group sort is the honest exact-quantile cost (a t-digest/KLL sketch is
    the skew-safe alternative at extreme group sizes — see the HLL
    operator for the mergeable-sketch pattern).  Output scaled to 1e4
    integer units: np and DuckDB interpolation differ by ~3e-14."""

    def per_type(group: pa.Table) -> pa.Table:
        v = group.column("value").to_numpy(zero_copy_only=False)
        q50, q95 = np.quantile(v, [0.5, 0.95])
        return pa.table(
            {
                "event_type": group.column("event_type").slice(0, 1),
                "q50_e4": pa.array(
                    [int(np.floor(q50 * 1e4 + 0.5))], type=pa.int64()
                ),
                "q95_e4": pa.array(
                    [int(np.floor(q95 * 1e4 + 0.5))], type=pa.int64()
                ),
            }
        )

    return (
        _events(sf_dir)
        .select_columns(["event_type", "value"])
        .groupby("event_type")
        .map_groups(per_type, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# t-digest quantile sketch (mergeable)


def _tdigest_compress(means: np.ndarray, counts: np.ndarray, delta: int):
    """Compress weighted points into a t-digest (Dunning & Ertl 2019):
    sorted by mean, greedily merged while the cluster's q-span stays
    within the k1 scale function's unit step — small clusters at the
    tails, big in the middle, ≤ ~2δ clusters total."""
    order = np.argsort(means, kind="stable")
    means, counts = means[order], counts[order]
    total = counts.sum()
    out_m: list[float] = []
    out_c: list[float] = []
    q0 = 0.0
    acc_m, acc_c = float(means[0]) * counts[0], float(counts[0])
    # clip: accumulated q can exceed 1.0 by float error, and arcsin(>1)
    # is NaN — NaN k-values silently force-close clusters at the tail
    k_of = lambda q: delta * (  # noqa: E731
        np.arcsin(np.clip(2 * q - 1, -1.0, 1.0)) / np.pi + 0.5
    )
    k0 = k_of(q0)
    for m, c in zip(means[1:], counts[1:]):
        q1 = q0 + (acc_c + c) / total
        if k_of(q1) - k0 <= 1.0:
            acc_m += float(m) * c
            acc_c += c
        else:
            out_m.append(acc_m / acc_c)
            out_c.append(acc_c)
            q0 += acc_c / total
            k0 = k_of(q0)
            acc_m, acc_c = float(m) * c, float(c)
    out_m.append(acc_m / acc_c)
    out_c.append(acc_c)
    return np.asarray(out_m), np.asarray(out_c)


def _tdigest_quantile(means: np.ndarray, counts: np.ndarray, q: float) -> float:
    """Interpolated quantile from a digest (midpoint rule)."""
    total = counts.sum()
    target = q * total
    cum = np.cumsum(counts) - counts / 2.0
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    i = np.searchsorted(cum, target) - 1
    frac = (target - cum[i]) / (cum[i + 1] - cum[i])
    return float(means[i] + frac * (means[i + 1] - means[i]))


def value_quantiles_tdigest(
    sf_dir: str, delta: int = 200
) -> "pa.Table":
    """Global value quantiles (p50/p95/p99) via a mergeable t-digest —
    the skew-safe sibling of :func:`type_quantiles`: every batch folds to
    ≤ ~2δ (mean, count) centroids, digests merge by concatenation +
    recompression, so the reduction never sees raw values and no group
    ever needs one node's memory.  Accuracy is bounded at the tails by
    the k1 scale function (tight where q → 0/1)."""
    delta_ = delta

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        m, c = _tdigest_compress(v, np.ones(len(v)), delta_)
        return pa.table(
            {
                "means": pa.array([m], type=pa.large_list(pa.float64())),
                "counts": pa.array([c], type=pa.large_list(pa.float64())),
            }
        )

    def merge_rows(batch: pa.Table) -> pa.Table:
        """Fold ≤fan-in digest rows into one (concatenate centroids,
        recompress) — the standard t-digest merge, run in the combiner
        tree so the reduction is parallel in the block count (the
        top_terms shape), never a serial driver loop.  Tree merging
        recompresses intermediates, so centroids differ slightly from a
        one-shot compress — within the digest's own accuracy bound
        (tests assert 2% of range at p50/p95/p99)."""
        if len(batch) == 0:  # empty repartition block: keep the schema
            return batch
        mc = batch.column("means")
        cc = batch.column("counts")
        if isinstance(mc, pa.ChunkedArray):
            mc = mc.combine_chunks()
        if isinstance(cc, pa.ChunkedArray):
            cc = cc.combine_chunks()
        m_, c_ = _tdigest_compress(
            np.asarray(mc.values), np.asarray(cc.values), delta_
        )
        return pa.table(
            {
                "means": pa.array([m_], type=pa.large_list(pa.float64())),
                "counts": pa.array([c_], type=pa.large_list(pa.float64())),
            }
        )

    partials = (
        _events(sf_dir)
        .select_columns(["value"])
        .map_batches(partial, batch_format="pyarrow")
    )
    merged = (
        partials.map_batches(merge_rows, batch_size=64, batch_format="pyarrow")
        .repartition(16)
        .map_batches(merge_rows, batch_size=None, batch_format="pyarrow")
    )
    all_m: list[np.ndarray] = []
    all_c: list[np.ndarray] = []
    for t in ray.get(merged.to_arrow_refs()):
        if t.num_rows:
            mc = t.column("means").combine_chunks()
            cc = t.column("counts").combine_chunks()
            all_m.append(np.asarray(mc.values))
            all_c.append(np.asarray(cc.values))
    m, c = _tdigest_compress(np.concatenate(all_m), np.concatenate(all_c), delta_)
    return pa.table(
        {
            "q": pa.array([0.5, 0.95, 0.99]),
            "value_est": pa.array(
                [_tdigest_quantile(m, c, q) for q in (0.5, 0.95, 0.99)]
            ),
        }
    )


# ---------------------------------------------------------------------------
# per-type quantile-threshold outlier filter


def value_outliers(sf_dir: str) -> "ray.data.Dataset":
    """Events whose value exceeds their type's 95th percentile — the
    threshold-filter composite over :func:`type_quantiles` (anomaly
    triage / heavy-tail pruning).

    Scale shape: the per-type threshold table is bounded by the
    event-type space → a bounded driver gather broadcast into ONE
    shuffle-free filter pass (the exact-quantile shuffle cost lives in
    ``type_quantiles`` and is paid once).

    Correctness shape: the comparison is between IDENTICAL integer units
    on both sides (``floor(value * 1e4 + 0.5) > q95_e4``), so rows at the
    threshold boundary cannot flip between the engine and the DuckDB
    oracle even though the quantile itself is float-interpolated.

    Output: (event_id, event_type, value_e4)."""
    th = type_quantiles(sf_dir).to_pandas()  # bounded: one row per type
    order = np.argsort(th["event_type"].to_numpy())
    types = th["event_type"].to_numpy()[order]
    q95 = th["q95_e4"].to_numpy()[order]

    def filt(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        ve4 = np.floor(v * 1e4 + 0.5).astype(np.int64)
        keep = ve4 > q95[np.searchsorted(types, et)]
        return pa.table(
            {
                "event_id": batch.column("event_id").filter(pa.array(keep)),
                "event_type": batch.column("event_type").filter(pa.array(keep)),
                "value_e4": pa.array(ve4[keep]),
            }
        )

    return _events(sf_dir).select_columns(
        ["event_id", "event_type", "value"]
    ).map_batches(filt, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# top-k users by total event value


def top_users(sf_dir: str, k: int = 10) -> "ray.data.Dataset":
    """Top-k users by total event value — the grouped-aggregate + global
    top-k composite (engagement leaderboard).

    Scale shape: values convert to integer e4 units PER ROW before any
    combine (``floor(value*1e4+0.5)``), so the per-batch partial sums, the
    groupby combine tree, and the single-pass SQL oracle are all exact
    integer arithmetic — association-free.  The user-key groupby is the
    one shuffle (carries one row per (batch, user)); the final top-k sorts
    the small per-user aggregate.

    Output: (user_id, total_value_e4, n_events)."""

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        ve4 = np.floor(v * 1e4 + 0.5).astype(np.int64)
        uk, inv = np.unique(uid, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, ve4)
        cnt = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uk),
                "p_sum": pa.array(sums),
                "p_cnt": pa.array(cnt),
            }
        )

    from .partition import sum_by_key

    merged = sum_by_key(
        _events(sf_dir)
        .select_columns(["user_id", "value"])
        .map_batches(partial, batch_format="pyarrow"),
        ["user_id"],
        {"p_sum": "total_value_e4", "p_cnt": "n_events"},
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "total_value_e4": pc.cast(
                    batch.column("total_value_e4"), pa.int64()
                ),
                "n_events": pc.cast(batch.column("n_events"), pa.int64()),
            }
        )

    return (
        merged.map_batches(finish, batch_format="pyarrow")
        .sort(["total_value_e4", "user_id"], descending=[True, False])
        .limit(k)
    )


# ---------------------------------------------------------------------------
# funnel analysis (greedy earliest-completion stage progression)


def funnel(
    sf_dir: str, stages: tuple[str, ...] = ("view", "click", "purchase")
) -> "ray.data.Dataset":
    """Per-user funnel progression: how many of the ordered ``stages`` the
    user completed greedily (stage k counts only if an event of type
    ``stages[k]`` happens STRICTLY after the earliest completion of stage
    k-1 — the standard product-analytics funnel).

    Scale shape: one hash shuffle on user_id (rows pre-project to
    (user_id, ts_us, stage_idx) and rows of non-funnel types are dropped
    at the read); inside each partition one lexsort + a per-stage
    ``np.minimum.reduceat`` chain — no per-user dispatch, the stage count
    is a constant factor.

    Output: (user_id, funnel_stage) for every user with ≥1 event of any
    type (stage 0 = never even saw stage 1)."""
    from .partition import map_key_partitions

    stage_of = {s: i for i, s in enumerate(stages)}
    SENT = np.iinfo(np.int64).max

    def project(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        sidx = np.full(len(et), -1, dtype=np.int8)
        for s, i in stage_of.items():
            sidx[et == s] = i
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts_us": ts.cast(pa.int64()),
                "stage_idx": pa.array(sidx),
            }
        )

    rows = _events(sf_dir).select_columns(
        ["user_id", "ts", "event_type"]
    ).map_batches(project, batch_format="pyarrow")

    def reduce_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "funnel_stage": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        tsv = tbl.column("ts_us").to_numpy(zero_copy_only=False)
        sidx = tbl.column("stage_idx").to_numpy(zero_copy_only=False)
        order = np.lexsort((tsv, uid))
        uid, tsv, sidx = uid[order], tsv[order], sidx[order]
        starts = np.flatnonzero(
            np.concatenate([[True], uid[1:] != uid[:-1]])
        )
        run_id = np.cumsum(
            np.concatenate([[True], uid[1:] != uid[:-1]])
        ) - 1
        prev_t = np.full(len(starts), np.int64(-1))  # stage-0 "completed at -inf"
        stage_cnt = np.zeros(len(starts), dtype=np.int64)
        for k in range(len(stage_of)):
            cand = np.where(
                (sidx == k) & (tsv > prev_t[run_id]), tsv, SENT
            )
            tk = np.minimum.reduceat(cand, starts)
            done = tk < SENT
            stage_cnt += done
            prev_t = np.where(done, tk, SENT)
            if not done.any():
                break
        return pa.table(
            {
                "user_id": pa.array(uid[starts]),
                "funnel_stage": pa.array(stage_cnt),
            }
        )

    return map_key_partitions(rows, ["user_id"], reduce_part)


# ---------------------------------------------------------------------------
# per-type percent-rank normalization


def value_percent_rank(sf_dir: str) -> "ray.data.Dataset":
    """Percent-rank of every event's value WITHIN its type (rank
    normalization — the feature-scaling step that makes heavy-tailed
    value distributions comparable across types).

    Exact SQL ``percent_rank()`` semantics: ``count(strictly smaller) /
    (n - 1)`` with ties sharing a rank — computed per type via one sort +
    a self-``searchsorted`` (left side), never a per-row loop.  Both the
    engine and the oracle divide the same two integers in float64, so the
    e6 integer output cannot diverge.

    One shuffle on event_type; the per-type sort is the honest exact-rank
    cost (same bounded-type-space note as :func:`type_quantiles` — the
    skew-safe alternative at extreme type cardinality is the t-digest
    approximation).  Output: (event_id, event_type, pct_e6)."""

    def per_type(group: pa.Table) -> pa.Table:
        v = group.column("value").to_numpy(zero_copy_only=False)
        n = len(v)
        sv = np.sort(v)
        smaller = np.searchsorted(sv, v, side="left")
        pct = smaller / (n - 1) if n > 1 else np.zeros(n)
        return pa.table(
            {
                "event_id": group.column("event_id"),
                "event_type": group.column("event_type"),
                "pct_e6": pa.array(
                    np.floor(pct * 1e6 + 0.5).astype(np.int64)
                ),
            }
        )

    return (
        _events(sf_dir)
        .select_columns(["event_id", "event_type", "value"])
        .groupby("event_type")
        .map_groups(per_type, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# per-user inter-event gap statistics


def user_gap_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-user inter-event time gaps: count, total, and maximum gap in
    microseconds (engagement-cadence features; users with one event have
    no gaps and are excluded, matching the SQL LAG inner aggregation).

    Scale shape: one hash shuffle on user_id; per partition one lexsort
    by (user, ts, event_id) + a masked ``np.diff`` (run-crossing deltas
    dropped by one boundary mask) + ``add/maximum.reduceat`` — all exact
    int64 microseconds, no floats anywhere.

    Output: (user_id, n_gaps, sum_gap_us, max_gap_us)."""
    from .partition import map_key_partitions

    def project(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts_us": ts.cast(pa.int64()),
                "event_id": batch.column("event_id"),
            }
        )

    rows = _events(sf_dir).select_columns(
        ["user_id", "ts", "event_id"]
    ).map_batches(project, batch_format="pyarrow")

    def gaps_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "n_gaps": pa.array([], type=pa.int64()),
                "sum_gap_us": pa.array([], type=pa.int64()),
                "max_gap_us": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        tsv = tbl.column("ts_us").to_numpy(zero_copy_only=False)
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, tsv, uid))
        uid, tsv = uid[order], tsv[order]
        same = uid[1:] == uid[:-1]  # gap rows (i-1 → i within one user)
        if not same.any():
            return empty
        gaps = (tsv[1:] - tsv[:-1])[same]
        guid = uid[1:][same]
        starts = np.flatnonzero(
            np.concatenate([[True], guid[1:] != guid[:-1]])
        )
        return pa.table(
            {
                "user_id": pa.array(guid[starts]),
                "n_gaps": pa.array(
                    np.diff(np.append(starts, len(guid))).astype(np.int64)
                ),
                "sum_gap_us": pa.array(np.add.reduceat(gaps, starts)),
                "max_gap_us": pa.array(np.maximum.reduceat(gaps, starts)),
            }
        )

    return map_key_partitions(rows, ["user_id"], gaps_part)


# ---------------------------------------------------------------------------
# per-type fixed-bin histogram


def value_histogram(sf_dir: str, bin_width: float = 10.0) -> "ray.data.Dataset":
    """Per-type fixed-width value histogram: ``bin = floor(value / w)``
    counts (distribution profiling — the exact companion to the t-digest).

    Scale shape: shuffle-free until the final bounded aggregate — each
    batch reduces to its distinct (type, bin) partial counts via one
    fused-id ``np.unique``; the groupby then carries one row per
    (batch, type, bin), bounded by the bin space, never raw events.

    Output: (event_type, bin, n)."""

    def partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        bins = np.floor(v / bin_width).astype(np.int64)
        ut, it = np.unique(et, return_inverse=True)
        # fuse (type, bin) — bins are small non-negative ints here, but
        # offset defensively so negative bins fuse correctly
        boff = bins - bins.min() if len(bins) else bins
        span = int(boff.max()) + 1 if len(boff) else 1
        fused = it.astype(np.int64) * span + boff
        _, idx, counts = np.unique(fused, return_index=True, return_counts=True)
        return pa.table(
            {
                "event_type": pa.array(et[idx]),
                "bin": pa.array(bins[idx]),
                "p_n": pa.array(counts.astype(np.int64)),
            }
        )

    merged = (
        _events(sf_dir)
        .select_columns(["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "bin"])
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "bin": pc.cast(batch.column("bin"), pa.int64()),
                "n": pc.cast(batch.column("n"), pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact distinct users per type (two-level distinct)


def distinct_users_by_type(sf_dir: str) -> "ray.data.Dataset":
    """EXACT distinct user count per event type — the grouped companion to
    the HLL sketch (:func:`distinct_users_hll` is the approximate path
    when per-key exactness isn't worth the shuffle).

    Scale shape: two-level distinct — each batch pre-distincts its
    (type, user) pairs (one fused-id ``np.unique``), the pair stream
    hash-partitions ONCE for a global distinct (sorted boundary pass),
    and the surviving one-row-per-pair stream pre-counts per batch before
    the final bounded per-type sum.  Raw events never shuffle.

    Output: (event_type, n_users)."""
    from .partition import map_key_partitions, run_starts

    def pair_partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ut, it = np.unique(et, return_inverse=True)
        # user ids are arbitrary int64 — fuse as (user * span + type_id);
        # exact because the type span is tiny and user*span stays inside int64
        span = np.int64(len(ut))
        fused = uid * span + it
        _, idx = np.unique(fused, return_index=True)
        return pa.table(
            {
                "event_type": pa.array(et[idx]),
                "user_id": pa.array(uid[idx]),
            }
        )

    pairs = (
        _events(sf_dir)
        .select_columns(["event_type", "user_id"])
        .map_batches(pair_partial, batch_format="pyarrow")
    )

    def distinct_then_count(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], type=pa.string()),
                "p_n": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        et = tbl.column("event_type").to_numpy(zero_copy_only=False)
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, et))
        et, uid = et[order], uid[order]
        firsts = run_starts(et, uid)
        et = et[firsts]
        ut, counts = np.unique(et, return_counts=True)
        return pa.table(
            {
                "event_type": pa.array(ut),
                "p_n": pa.array(counts.astype(np.int64)),
            }
        )

    parts = map_key_partitions(
        pairs, ["event_type", "user_id"], distinct_then_count
    )
    merged = parts.groupby("event_type").aggregate(
        ray.data.aggregate.Sum("p_n", alias_name="n_users")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "n_users": pc.cast(batch.column("n_users"), pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def props_k_histogram(sf_dir: str) -> "ray.data.Dataset":
    """Semi-structured extraction: pull the integer ``k`` field out of the
    JSON ``props`` string column and roll up a per-(event_type, k-decade)
    histogram with the summed event value — the "parse the JSON blob a
    producer stuffed into one column" step of every event pipeline.

    Scale shape: the extraction is one vectorized RE2 pass per batch
    (``pc.extract_regex`` — no per-row json.loads), the per-row value
    converts to integer e4 units BEFORE any summation (association-free),
    and per-batch partials pre-aggregate so the only shuffle carries the
    bounded (event_type, k_bin) key space.

    Output: (event_type, k_bin, n, sum_value_e4) with k_bin = k // 10."""

    def partial(batch: pa.Table) -> pa.Table:
        props = batch.column("props")
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        m = pc.extract_regex(props, r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        val = batch.column("value").to_numpy(zero_copy_only=False)
        e4 = np.floor(val * 1e4 + 0.5).astype(np.int64)
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "k_bin": pa.array(k // 10),
                "one": pa.array(np.ones(len(batch), dtype=np.int64)),
                "e4": pa.array(e4),
            }
        )
        g = t.group_by(["event_type", "k_bin"]).aggregate(
            [("one", "sum"), ("e4", "sum")]
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "k_bin": g.column("k_bin"),
                "p_n": pc.cast(g.column("one_sum"), pa.int64()),
                "p_e4": pc.cast(g.column("e4_sum"), pa.int64()),
            }
        )

    merged = (
        _events(sf_dir)
        .select_columns(["event_type", "props", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "k_bin"])
        .aggregate(
            ray.data.aggregate.Sum("p_n", alias_name="n"),
            ray.data.aggregate.Sum("p_e4", alias_name="sum_value_e4"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "k_bin": pc.cast(batch.column("k_bin"), pa.int64()),
                "n": pc.cast(batch.column("n"), pa.int64()),
                "sum_value_e4": pc.cast(
                    batch.column("sum_value_e4"), pa.int64()
                ),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def retention_cohorts(sf_dir: str) -> "ray.data.Dataset":
    """Cohort retention: users grouped by their first-active day, counted
    at each later day offset — the standard product-analytics retention
    triangle.

    Scale shape: stage 1 shrinks each batch to its DISTINCT (user, day)
    pairs before anything shuffles; ONE hash shuffle on user_id co-locates
    each user's days (``map_key_partitions`` — bounded partition count,
    no per-user group dispatch); inside a partition a (user, day) lexsort
    + run boundaries yield each user's cohort day and offsets vectorized,
    and the partition emits pre-aggregated (cohort_day, day_offset)
    partial counts, so the final shuffle carries only the bounded
    calendar-triangle key space.

    Output: (cohort_day, day_offset, n_users)."""
    from .partition import map_key_partitions, run_starts

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        day = pc.floor_temporal(ts, unit="day")
        t = pa.table({"user_id": batch.column("user_id"), "day": day})
        return t.group_by(["user_id", "day"]).aggregate([])

    pairs = (
        _events(sf_dir)
        .select_columns(["ts", "user_id"])
        .map_batches(distinct_pairs, batch_format="pyarrow")
    )

    US_PER_DAY = 86_400_000_000

    def per_partition(tbl: pa.Table) -> pa.Table:
        day_type = tbl.schema.field("day").type
        if len(tbl) == 0:
            return pa.table(
                {
                    "cohort_day": pa.array([], type=day_type),
                    "day_offset": pa.array([], type=pa.int64()),
                    "p_n": pa.array([], type=pa.int64()),
                }
            )
        day_col = tbl.column("day")
        if isinstance(day_col, pa.ChunkedArray):
            day_col = day_col.combine_chunks()
        day_us = day_col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = day_us // US_PER_DAY  # small day index — safe to composite
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((day, uid))
        day, uid = day[order], uid[order]
        # cross-batch duplicates of (user, day) may survive stage 1
        keep = run_starts(uid, day)
        day, uid = day[keep], uid[keep]
        starts = np.flatnonzero(run_starts(uid))
        run_len = np.diff(np.append(starts, len(uid)))
        cohort = np.repeat(day[starts], run_len)
        offset = day - cohort
        key = cohort * 100_000 + offset  # offsets ≪ 1e5 days
        ukey, counts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "cohort_day": pa.array(
                    (ukey // 100_000) * US_PER_DAY
                ).cast(day_type),
                "day_offset": pa.array(ukey % 100_000),
                "p_n": pa.array(counts.astype(np.int64)),
            }
        )

    partials = map_key_partitions(pairs, ["user_id"], per_partition)

    merged = partials.groupby(["cohort_day", "day_offset"]).aggregate(
        ray.data.aggregate.Sum("p_n", alias_name="n_users")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_day": batch.column("cohort_day"),
                "day_offset": pc.cast(batch.column("day_offset"), pa.int64()),
                "n_users": pc.cast(batch.column("n_users"), pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def hourly_anomaly(sf_dir: str, window: int = 24, z: int = 3) -> "ray.data.Dataset":
    """Trailing-window anomaly flags on the hourly event-count series: an
    (event_type, hour) bucket is anomalous when its count exceeds the
    trailing ``window``-hour mean by more than ``z`` standard deviations —
    the ops-monitoring spike detector, evaluated EXACTLY in integers.

    The z-test never touches floats: with W = trailing bucket count,
    S = Σcount, Q = Σcount², the condition
    ``n > mean + z·std  ⟺  (n·W − S) > 0  ∧  (n·W − S)² > z²·(W·Q − S²)``
    is pure int64 arithmetic (hour counts are ≪ 2^31, so no overflow),
    which is why the DuckDB oracle matches hash-exactly — no variance
    association error, no sqrt.

    Scale shape: the raw stream collapses to per-batch (type, hour)
    partials immediately (bounded key space: types × hours); the windowed
    pass runs per type over the bounded hourly series inside one hash
    partition.  Only anomalous rows are emitted.

    Output: (event_type, window_start, n_events, base_n, base_sum,
    base_sumsq)."""
    from .partition import map_key_partitions, run_starts

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        hour = pc.floor_temporal(ts, unit="hour")
        t = pa.table(
            {"event_type": batch.column("event_type"), "hour": hour}
        )
        g = t.group_by(["event_type", "hour"]).aggregate([("hour", "count")])
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "hour": g.column("hour"),
                "p_n": pc.cast(g.column("hour_count"), pa.int64()),
            }
        )

    hourly = (
        _events(sf_dir)
        .select_columns(["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n_events"))
    )

    US_PER_HOUR = 3_600_000_000

    def flag_part(tbl: pa.Table) -> pa.Table:
        hour_type = tbl.schema.field("hour").type
        empty = pa.table(
            {
                "event_type": pa.array([], type=pa.string()),
                "window_start": pa.array([], type=hour_type),
                "n_events": pa.array([], type=pa.int64()),
                "base_n": pa.array([], type=pa.int64()),
                "base_sum": pa.array([], type=pa.int64()),
                "base_sumsq": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        et = tbl.column("event_type").to_numpy(zero_copy_only=False)
        hour_col = tbl.column("hour")
        if isinstance(hour_col, pa.ChunkedArray):
            hour_col = hour_col.combine_chunks()
        # Ray's Aggregate may downcast timestamp[us] → timestamp[s];
        # normalize BEFORE the integer cast or every hour collapses to 0
        hr = (
            hour_col.cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False) // US_PER_HOUR
        )
        n = tbl.column("n_events").to_numpy(zero_copy_only=False)
        code = np.unique(et, return_inverse=True)[1]
        order = np.lexsort((hr, code))
        code, hr, n = code[order], hr[order], n[order]
        starts = run_starts(code)
        flags = np.zeros(len(n), dtype=bool)
        bn = np.zeros(len(n), dtype=np.int64)
        bs = np.zeros(len(n), dtype=np.int64)
        bq = np.zeros(len(n), dtype=np.int64)
        seg = np.flatnonzero(starts)
        for a, b in zip(seg, np.append(seg[1:], len(n))):
            # per-type series is BOUNDED (hours in the horizon) — the
            # trailing sums are a sliding two-pointer pass, not per-event
            h, c = hr[a:b], n[a:b]
            csum = np.concatenate([[0], np.cumsum(c)])
            csq = np.concatenate([[0], np.cumsum(c * c)])
            lo = np.searchsorted(h, h - window, side="left")
            hi = np.searchsorted(h, h, side="left")  # strictly before
            W = hi - lo
            S = csum[hi] - csum[lo]
            Q = csq[hi] - csq[lo]
            d = c * W - S
            ok = (W > 0) & (d > 0) & (d * d > z * z * (W * Q - S * S))
            flags[a:b] = ok
            bn[a:b], bs[a:b], bq[a:b] = W, S, Q
        sel = np.flatnonzero(flags)
        take = pa.array(order[sel])
        return pa.table(
            {
                "event_type": tbl.column("event_type").take(take),
                "window_start": tbl.column("hour").take(take),
                "n_events": tbl.column("n_events").take(take),
                "base_n": pa.array(bn[sel]),
                "base_sum": pa.array(bs[sel]),
                "base_sumsq": pa.array(bq[sel]),
            }
        )

    out = map_key_partitions(hourly, ["event_type"], flag_part)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "window_start": batch.column("window_start"),
                "n_events": pc.cast(batch.column("n_events"), pa.int64()),
                "base_n": pc.cast(batch.column("base_n"), pa.int64()),
                "base_sum": pc.cast(batch.column("base_sum"), pa.int64()),
                "base_sumsq": pc.cast(batch.column("base_sumsq"), pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def type_transitions(sf_dir: str) -> "ray.data.Dataset":
    """Markov transition counts of per-user event-type sequences: how often
    type A is immediately followed by type B in a user's timeline — the
    behavioral-model fit every recommendation/abuse pipeline starts with.

    Scale shape: ONE hash exchange on user_id (map_key_partitions, no
    per-user dispatch); inside a partition a (user, ts, event_id) lexsort
    + shifted-slice comparison yields each user's consecutive pairs
    vectorized, pre-aggregated to (prev, next) partial counts; the final
    rollup shuffles only the bounded type×type matrix.  Probabilities
    derive from exact integer counts (e6 floor division).

    Output: (prev_type, next_type, n, prob_e6) with
    prob_e6 = floor(n * 1e6 / row_total)."""
    from .partition import map_key_partitions, run_starts

    def pair_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "prev_type": pa.array([], type=pa.string()),
                "next_type": pa.array([], type=pa.string()),
                "p_n": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) < 2:
            return empty
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        ts_col = tbl.column("ts")
        if isinstance(ts_col, pa.ChunkedArray):
            ts_col = ts_col.combine_chunks()
        ts = ts_col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        et = tbl.column("event_type").to_numpy(zero_copy_only=False)
        types, code = np.unique(et, return_inverse=True)
        order = np.lexsort((eid, ts, uid))
        uid, code = uid[order], code[order]
        same_user = uid[1:] == uid[:-1]
        prev_c, next_c = code[:-1][same_user], code[1:][same_user]
        if len(prev_c) == 0:
            return empty
        k = len(types)
        pair = prev_c.astype(np.int64) * k + next_c
        upair, cnt = np.unique(pair, return_counts=True)
        return pa.table(
            {
                "prev_type": pa.array(types[upair // k]),
                "next_type": pa.array(types[upair % k]),
                "p_n": pa.array(cnt.astype(np.int64)),
            }
        )

    pairs = map_key_partitions(
        _events(sf_dir).select_columns(
            ["user_id", "ts", "event_id", "event_type"]
        ),
        ["user_id"],
        pair_part,
    )

    counts = pairs.groupby(["prev_type", "next_type"]).aggregate(
        ray.data.aggregate.Sum("p_n", alias_name="n")
    )

    # row totals: the matrix is bounded (types²) — normalize per prev_type
    # inside one partitioned pass, no driver round-trip
    def normalize(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table(
                {
                    "prev_type": pa.array([], type=pa.string()),
                    "next_type": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                    "prob_e6": pa.array([], type=pa.int64()),
                }
            )
        prev = tbl.column("prev_type").to_numpy(zero_copy_only=False)
        n = tbl.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        code = np.unique(prev, return_inverse=True)[1]
        order = np.argsort(code, kind="stable")
        code_s, n_s = code[order], n[order]
        starts = run_starts(code_s)
        gidx = np.cumsum(starts) - 1
        totals = np.zeros(int(starts.sum()), dtype=np.int64)
        np.add.at(totals, gidx, n_s)
        row_total = np.empty(len(n), dtype=np.int64)
        row_total[order] = totals[gidx]
        return pa.table(
            {
                "prev_type": tbl.column("prev_type"),
                "next_type": tbl.column("next_type"),
                "n": pa.array(n),
                "prob_e6": pa.array(n * 1_000_000 // row_total),
            }
        )

    return map_key_partitions(counts, ["prev_type"], normalize)


def value_zscore(sf_dir: str) -> "ray.data.Dataset":
    """Per-event z-score of ``value`` within its event type — the grouped
    standardization step of every feature pipeline — with an EXACT oracle
    despite the sqrt: all moments accumulate as int64 e4-unit sums
    (N, S=Σx, Q=Σx²), so the only float ops are one int64→double
    conversion, one IEEE-754 sqrt (correctly rounded — bit-identical in
    numpy and DuckDB) and one division, evaluated with the identical
    expression on both sides:

        z_e6 = floor((x·N − S) · 1e6 / sqrt(N·Q − S²) + 0.5)

    Scale shape: per-batch (type, N, S, Q) partials → bounded combine →
    broadcast threshold row per type → shuffle-free scoring scan.

    Output: (event_id, event_type, z_e6)."""

    def moments(batch: pa.Table) -> pa.Table:
        val = batch.column("value").to_numpy(zero_copy_only=False)
        e4 = np.floor(val * 1e4 + 0.5).astype(np.int64)
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "one": pa.array(np.ones(len(batch), dtype=np.int64)),
                "s": pa.array(e4),
                "q": pa.array(e4 * e4),
            }
        )
        g = t.group_by(["event_type"]).aggregate(
            [("one", "sum"), ("s", "sum"), ("q", "sum")]
        )
        return pa.table(
            {
                "event_type": g.column("event_type"),
                "p_n": pc.cast(g.column("one_sum"), pa.int64()),
                "p_s": pc.cast(g.column("s_sum"), pa.int64()),
                "p_q": pc.cast(g.column("q_sum"), pa.int64()),
            }
        )

    stats = (
        _events(sf_dir)
        .select_columns(["event_type", "value"])
        .map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            ray.data.aggregate.Sum("p_n", alias_name="n"),
            ray.data.aggregate.Sum("p_s", alias_name="s"),
            ray.data.aggregate.Sum("p_q", alias_name="q"),
        )
        .to_pandas()  # bounded: one row per event type
    )
    et = stats["event_type"].to_numpy()
    order = np.argsort(et)
    et_s = et[order]
    n_s = stats["n"].to_numpy().astype(np.int64)[order]
    s_s = stats["s"].to_numpy().astype(np.int64)[order]
    q_s = stats["q"].to_numpy().astype(np.int64)[order]
    # variance term in float64 from the start: n·q overflows int64 at even
    # moderate group sizes (numpy would WRAP silently, DuckDB errors).
    # Both sides use the identical conversion+op sequence, so the doubles
    # (and the IEEE sqrt) are bit-equal.
    nf = n_s.astype(np.float64)
    sf_ = s_s.astype(np.float64)
    qf = q_s.astype(np.float64)
    denom = np.sqrt(nf * qf - sf_ * sf_)

    def score(batch: pa.Table) -> pa.Table:
        t = batch.column("event_type").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        e4 = np.floor(val * 1e4 + 0.5).astype(np.int64)
        pos = np.searchsorted(et_s, t)
        num = (e4 * n_s[pos] - s_s[pos]) * 1_000_000
        z = np.floor(num / denom[pos] + 0.5).astype(np.int64)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "event_type": batch.column("event_type"),
                "z_e6": pa.array(z),
            }
        )

    return (
        _events(sf_dir)
        .select_columns(["event_id", "event_type", "value"])
        .map_batches(score, batch_format="pyarrow")
    )


def windowed_dedup(sf_dir: str, window_sec: int = 60) -> "ray.data.Dataset":
    """Time-window event dedup: within each (user, event_type) stream an
    event is a duplicate if it follows the PREVIOUS event of that stream
    by ``window_sec`` or less (the lag rule — debouncing repeated client
    fires without the sequential greedy scan).

    Scale shape: one user_id hash exchange (complete streams co-locate);
    per partition one lexsort by (user, type, ts, event_id) and a
    vectorized diff against run boundaries decides keep/drop for every
    event at once; only bounded (event_type, totals) partials leave the
    partition.

    Output: (event_type, n_total, n_kept)."""
    from .partition import map_key_partitions

    win_us = np.int64(window_sec) * 1_000_000

    def dedup_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], type=pa.string()),
                "p_total": pa.array([], type=pa.int64()),
                "p_kept": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        ts = tbl.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        tsv = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        ety = tbl.column("event_type").to_numpy(zero_copy_only=False)
        tcode = np.unique(ety, return_inverse=True)[1]
        order = np.lexsort((eid, tsv, tcode, uid))
        tsv, uid, tcode = tsv[order], uid[order], tcode[order]
        keep = np.ones(len(tsv), dtype=bool)
        same = (uid[1:] == uid[:-1]) & (tcode[1:] == tcode[:-1])
        keep[1:] = ~same | (np.diff(tsv) > win_us)
        n_types = int(tcode.max()) + 1
        total = np.bincount(tcode, minlength=n_types)
        kept = np.bincount(tcode[keep], minlength=n_types)
        present = total > 0
        names = np.unique(ety)  # unique() sorted order == code order
        return pa.table(
            {
                "event_type": pa.array(names[present[: len(names)]].astype(str)),
                "p_total": pa.array(total[present].astype(np.int64)),
                "p_kept": pa.array(kept[present].astype(np.int64)),
            }
        )

    partials = map_key_partitions(
        _events(sf_dir).select_columns(
            ["user_id", "event_type", "ts", "event_id"]
        ),
        ["user_id"],
        dedup_part,
    )
    merged = partials.groupby("event_type").aggregate(
        ray.data.aggregate.Sum("p_total", alias_name="n_total"),
        ray.data.aggregate.Sum("p_kept", alias_name="n_kept"),
    )
    return merged.map_batches(
        lambda b: pa.table(
            {
                "event_type": b.column("event_type"),
                "n_total": pc.cast(b.column("n_total"), pa.int64()),
                "n_kept": pc.cast(b.column("n_kept"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def grid_smooth(sf_dir: str, nx: int = 32) -> "ray.data.Dataset":
    """Distributed 3x3 stencil over a 2-D event grid: events bin to cells
    (user_id % nx, hour-of-day), and every OCCUPIED cell reports its own
    count plus the summed counts of its 3x3 neighborhood — the
    neighbor-aggregation pattern (spatial smoothing / heatmap blur)
    expressed as replicate-and-regroup.

    Scale shape: per-batch partial counts → ONE grouped exchange builds
    the bounded cell table; each cell row then replicates 9x keyed by the
    TARGET cell (dx, dy ∈ {-1,0,1}) carrying (contribution, is_origin
    flag, own count); a second bounded exchange segment-sums each target
    key and keeps only keys whose origin row is present.  Volume through
    the wire is 9x the OCCUPIED-cell count — never 9x the event count.

    Output: (gx, gy, n_events, smooth3x3)."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        tsv = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        gx = uid % nx
        gy = (tsv // 3_600_000_000) % 24
        code = gx * 24 + gy
        uk, cnt = np.unique(code, return_counts=True)
        return pa.table(
            {
                "gx": pa.array(uk // 24),
                "gy": pa.array(uk % 24),
                "p_c": pa.array(cnt.astype(np.int64)),
            }
        )

    cells = (
        _events(sf_dir)
        .select_columns(["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["gx", "gy"])
        .aggregate(ray.data.aggregate.Sum("p_c", alias_name="c"))
    )

    from .partition import stencil_3x3

    return stencil_3x3(cells, "gx", "gy", "c").map_batches(
        lambda b: pa.table(
            {
                "gx": b.column("gx"),
                "gy": b.column("gy"),
                "n_events": b.column("own"),
                "smooth3x3": b.column("smooth"),
            }
        ),
        batch_format="pyarrow",
    )


def value_median_exact(sf_dir: str) -> "ray.data.Dataset":
    """EXACT global median of the event value (lower median, e6-scaled
    integers) over the full stream — the general-domain order statistic
    via two bounded histogram-refinement passes
    (:mod:`..pipelines.selection`): no sort, no sketch, driver state
    bounded by the high-bits bucket table.  The stream is scanned twice
    — the honest trade against a distributed sort; compare
    :func:`value_quantiles_tdigest` for the one-pass mergeable-sketch
    approximation.

    Output: one row (n_events, median_e6)."""
    from .selection import exact_value_ranks

    def to_e6(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {"v_e6": pa.array(np.floor(v * 1e6 + 0.5).astype(np.int64))}
        )

    vals = (
        _events(sf_dir)
        .select_columns(["value"])
        .map_batches(to_e6, batch_format="pyarrow")
    )
    n = vals.count()
    rank = (n + 1) // 2
    thr = exact_value_ranks(vals, "v_e6", [rank])
    return ray.data.from_arrow(
        pa.table(
            {
                "n_events": pa.array([n], type=pa.int64()),
                "median_e6": pa.array([thr[rank]], type=pa.int64()),
            }
        )
    )


def type_p90_exact(sf_dir: str) -> "ray.data.Dataset":
    """Per event-type EXACT 90th percentile of the value stream (e6
    ints) — the grouped general-domain order statistic via the two-pass
    bucket refinement (:func:`..pipelines.selection.exact_group_quantiles`);
    driver state is one bucket row per (type, occupied bucket), never a
    value table.

    Output: (event_type, n_events, p90_e6)."""
    from .selection import exact_group_quantiles

    def to_e6(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "v_e6": pa.array(np.floor(v * 1e6 + 0.5).astype(np.int64)),
            }
        )

    vals = (
        _events(sf_dir)
        .select_columns(["event_type", "value"])
        .map_batches(to_e6, batch_format="pyarrow")
    )
    res = exact_group_quantiles(vals, "event_type", "v_e6", q_e2=90)
    types = sorted(res)
    return ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array(types, type=pa.string()),
                "n_events": pa.array(
                    [res[t][0] for t in types], type=pa.int64()
                ),
                "p90_e6": pa.array(
                    [res[t][1] for t in types], type=pa.int64()
                ),
            }
        )
    )


def session_ids(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """Per-EVENT session index: every event annotated with its user's
    0-based session ordinal (the row-level companion to
    :func:`sessionize`, which emits per-session aggregates) — the
    enrichment pass a feature pipeline joins back onto the stream.

    Scale shape: one user hash exchange; per partition one lexsort by
    (user, ts, event_id), break flags where the user changes or the gap
    exceeds the threshold, and the per-user ordinal via the engine's
    padded-cumsum pattern (batch-size invariant, no per-user dispatch).

    Output: (event_id, user_id, session_idx)."""
    from .partition import map_key_partitions

    gap_us = np.int64(gap_minutes * 60 * 1_000_000)

    def ids_part(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "user_id": pa.array([], type=pa.int64()),
                    "session_idx": pa.array([], type=pa.int64()),
                }
            )
        ts = tbl.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        tsv = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, tsv, uid))
        tsv, uid, eid = tsv[order], uid[order], eid[order]
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        brk = new_user.copy()
        brk[1:] |= np.diff(tsv) > gap_us
        sess = np.cumsum(brk)
        base = sess[np.flatnonzero(new_user)][
            np.cumsum(new_user) - 1
        ]  # per-user padded cumsum: subtract the run-start prefix
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(uid),
                "session_idx": pa.array(sess - base),
            }
        )

    return map_key_partitions(
        _events(sf_dir).select_columns(["user_id", "ts", "event_id"]),
        ["user_id"],
        ids_part,
    )


def decayed_user_score(
    sf_dir: str, tau_days: float = 7.0, anchor: str = "2024-02-01"
) -> "ray.data.Dataset":
    """Exponentially time-decayed engagement score per user — the
    feature-engineering staple (recent activity outweighs old):
    ``score = Σ value · exp(−Δt/τ)`` with Δt measured from a FIXED
    anchor timestamp (determinism: never "now").

    Per-event contributions floor to integer micro-units BEFORE the sum
    (repo float rule: exp is transcendental, so the only cross-engine
    drift is the documented ~3e-14 libm class at the floor boundary;
    the sum itself is exact int64), and the combine is one bounded
    user-keyed groupby over per-batch partials.

    Output: (user_id, n_events, decayed_value_e6).
    """
    anchor_us = np.int64(
        int(np.datetime64(anchor, "us").astype("datetime64[us]").astype(np.int64))
    )
    tau = float(tau_days)

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        tsv = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        dt_days = (anchor_us - tsv) / 86400000000.0
        w = np.floor(v * np.exp(-(dt_days) / tau) * 1e6 + 0.5).astype(np.int64)
        u, inv = np.unique(uid, return_inverse=True)
        return pa.table(
            {
                "user_id": pa.array(u.astype(np.int64)),
                "p_n": pa.array(np.bincount(inv).astype(np.int64)),
                "p_w": pa.array(np.bincount(inv, weights=w).astype(np.int64)),
            }
        )

    from .partition import sum_by_key

    merged = sum_by_key(
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
        ).map_batches(partial, batch_format="pyarrow"),
        ["user_id"],
        {"p_n": "n_events", "p_w": "decayed_value_e6"},
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "n_events": pc.cast(batch.column("n_events"), pa.int64()),
                "decayed_value_e6": pc.cast(
                    batch.column("decayed_value_e6"), pa.int64()
                ),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def type_winsorized(sf_dir: str, lo_e2: int = 1, hi_e2: int = 99) -> "ray.data.Dataset":
    """Winsorized per-type aggregate — the robust-statistics staple:
    clip each event's value at the type's exact p01/p99 before summing,
    so a handful of outliers cannot dominate the mean.

    Thresholds come from the exact grouped two-pass order statistics
    (``pipelines/selection.py``); the clip pass is shuffle-free with the
    bounded per-type thresholds broadcast, and clipped values sum as
    exact int64 micro-units.

    Output: (event_type, n, lo_e6, hi_e6, winsorized_sum_e6).
    """
    from .selection import exact_group_quantiles

    def to_e6(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "v_e6": pa.array(np.floor(v * 1e6 + 0.5).astype(np.int64)),
            }
        )

    vals = (
        _events(sf_dir)
        .select_columns(["event_type", "value"])
        .map_batches(to_e6, batch_format="pyarrow")
        .materialize()  # scanned by two threshold passes + the clip pass
    )
    lo = exact_group_quantiles(vals, "event_type", "v_e6", lo_e2)
    hi = exact_group_quantiles(vals, "event_type", "v_e6", hi_e2)
    keys = np.array(sorted(lo))
    lo_arr = np.array([lo[k][1] for k in keys], dtype=np.int64)
    hi_arr = np.array([hi[k][1] for k in keys], dtype=np.int64)

    def clip_partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False).astype(str)
        v = batch.column("v_e6").to_numpy(zero_copy_only=False)
        gi = np.searchsorted(keys, et)
        w = np.minimum(np.maximum(v, lo_arr[gi]), hi_arr[gi])
        codes, inv = np.unique(et, return_inverse=True)
        return pa.table(
            {
                "event_type": pa.array(codes),
                "p_n": pa.array(np.bincount(inv).astype(np.int64)),
                "p_sum": pa.array(np.bincount(inv, weights=w).astype(np.int64)),
            }
        )

    merged = (
        vals.map_batches(clip_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            ray.data.aggregate.Sum("p_n", alias_name="n"),
            ray.data.aggregate.Sum("p_sum", alias_name="winsorized_sum_e6"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False).astype(str)
        gi = np.searchsorted(keys, et)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "n": pc.cast(batch.column("n"), pa.int64()),
                "lo_e6": pa.array(lo_arr[gi]),
                "hi_e6": pa.array(hi_arr[gi]),
                "winsorized_sum_e6": pc.cast(
                    batch.column("winsorized_sum_e6"), pa.int64()
                ),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def daily_cusum(sf_dir: str) -> "pa.Table":
    """CUSUM change-point scan over the daily event-count series — the
    classic drift detector for ingest monitoring.  To stay exact the
    cumulative deviation is kept as the SCALED integer
    ``Σ_{i<=k} (x_i·D − T)`` (D = number of days, T = total events —
    multiplying the usual x−T/D by D clears the fraction), and the
    change-point is the earliest day attaining the maximum |CUSUM|.

    Shape: the per-day counts are a combiner-before-shuffle groupby
    (bounded by the covered day range); the scan itself runs on that
    bounded series.

    Output: (day, n_events, cusum_scaled, is_changepoint).
    """

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        day = pc.floor_temporal(ts, unit="day")
        t = pa.table({"day": day})
        g = t.group_by(["day"]).aggregate([("day", "count")])
        return pa.table(
            {
                "day": g.column("day"),
                "p_n": pc.cast(g.column("day_count"), pa.int64()),
            }
        )

    daily = (
        _events(sf_dir)
        .select_columns(["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n_events"))
        .to_pandas()  # bounded: one row per covered day
        .sort_values("day")
    )
    x = daily["n_events"].to_numpy().astype(np.int64)
    d = np.int64(len(x))
    t = np.int64(x.sum())
    cusum = np.cumsum(x * d - t)
    peak = int(np.argmax(np.abs(cusum)))  # earliest day at max |CUSUM|
    flag = np.zeros(len(x), dtype=np.int64)
    flag[peak] = 1
    return pa.table(
        {
            "day": pa.array(
                daily["day"].astype("datetime64[us]").to_numpy()
            ).cast(pa.timestamp("us")),
            "n_events": pa.array(x),
            "cusum_scaled": pa.array(cusum.astype(np.int64)),
            "is_changepoint": pa.array(flag),
        }
    )


def hourly_uniformity(sf_dir: str) -> "ray.data.Dataset":
    """Chi-square uniformity statistic of the hour-of-day histogram per
    event type — "is this event type's traffic flat across the day?"
    Kept exact by scaling: Σ_h (24·x_h − T)² is the χ² numerator times
    24·T (a pure integer), so engine and oracle compare identical int64
    values with zero float arithmetic.

    Shape: one combiner-before-shuffle groupby to the bounded
    (type, hour) cell table; the statistic folds per type.

    Output: (event_type, n, chi2_scaled).
    """

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        hour = (
            ts.cast(pa.int64()).to_numpy(zero_copy_only=False) // 3_600_000_000
        ) % 24
        et = batch.column("event_type").to_numpy(zero_copy_only=False).astype(str)
        codes, inv = np.unique(et, return_inverse=True)
        key = inv.astype(np.int64) * 24 + hour
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "event_type": pa.array(
                    codes[uk // 24].astype(object), type=pa.string()
                ),
                "hour": pa.array((uk % 24).astype(np.int64)),
                "p_n": pa.array(cnt.astype(np.int64)),
            }
        )

    cells = (
        _events(sf_dir)
        .select_columns(["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n"))
        .to_pandas()  # bounded: types x 24 cells
    )
    rows = []
    for et, sub in cells.groupby("event_type", sort=True):
        x = np.zeros(24, dtype=np.int64)
        x[sub["hour"].to_numpy()] = sub["n"].to_numpy()
        t = int(x.sum())
        rows.append((et, t, int(((24 * x - t) ** 2).sum())))
    return ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], type=pa.string()),
                "n": pa.array([r[1] for r in rows], type=pa.int64()),
                "chi2_scaled": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )
    )


def daily_trend(sf_dir: str) -> "pa.Table":
    """Ordinary-least-squares trend of the daily event-count series —
    the companion to :func:`daily_cusum` (is traffic growing?).  The
    slope is kept as the EXACT rational num/den with
    num = D·Σxy − Σx·Σy and den = D·Σx² − (Σx)² over day indices
    x = 0..D−1, plus the floored micro-slope (sign-correct floor on
    both engine and oracle — DuckDB ``//`` truncates toward zero for
    negatives, so the oracle spells out the negative branch).

    Output one row: (n_days, total_events, slope_num, slope_den,
    slope_e6).
    """

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        day = pc.floor_temporal(ts, unit="day")
        t = pa.table({"day": day})
        g = t.group_by(["day"]).aggregate([("day", "count")])
        return pa.table(
            {
                "day": g.column("day"),
                "p_n": pc.cast(g.column("day_count"), pa.int64()),
            }
        )

    daily = (
        _events(sf_dir)
        .select_columns(["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n_events"))
        .to_pandas()  # bounded: one row per covered day
        .sort_values("day")
    )
    y = daily["n_events"].to_numpy().astype(np.int64)
    d = np.int64(len(y))
    x = np.arange(d, dtype=np.int64)
    num = int(d * (x * y).sum() - x.sum() * y.sum())
    den = int(d * (x * x).sum() - x.sum() ** 2)
    slope_e6 = (num * 1_000_000) // den  # numpy/python floor division
    return pa.table(
        {
            "n_days": pa.array([int(d)], type=pa.int64()),
            "total_events": pa.array([int(y.sum())], type=pa.int64()),
            "slope_num": pa.array([num], type=pa.int64()),
            "slope_den": pa.array([den], type=pa.int64()),
            "slope_e6": pa.array([slope_e6], type=pa.int64()),
        }
    )


def type_top_values(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Top-``k`` DISTINCT values per event type with their occurrence
    counts — DENSE_RANK semantics (the window flavor ROW_NUMBER /
    NTILE / PERCENT_RANK queries don't cover: ties share a rank slot
    and every occurrence of a ranked value is reported).

    Two bounded passes: (1) per-type top-k distinct values via the
    associative per-batch pre-prune (each batch keeps at most k distinct
    values per type, so the exchange carries ≤ k·types rows per batch);
    (2) a shuffle-free count pass filtered to the broadcast winners.

    Output: (event_type, value_micro, n, dense_rank).
    """

    def prune(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False).astype(str)
        v = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 1e6 + 0.5
        ).astype(np.int64)
        codes, inv = np.unique(et, return_inverse=True)
        key = inv.astype(np.int64) * (1 << 40) + ((1 << 39) - v)  # desc order
        uk = np.unique(key)
        gi = uk >> 40
        starts = np.concatenate([[True], gi[1:] != gi[:-1]])
        run_id = np.cumsum(starts) - 1
        pos = np.arange(len(uk)) - np.flatnonzero(starts)[run_id]
        keep = pos < k
        return pa.table(
            {
                "event_type": pa.array(
                    codes[gi[keep]].astype(object), type=pa.string()
                ),
                "v_e6": pa.array(((1 << 39) - (uk[keep] & ((1 << 40) - 1)))),
            }
        )

    winners = (
        _events(sf_dir)
        .select_columns(["event_type", "value"])
        .map_batches(prune, batch_format="pyarrow")
        .groupby(["event_type", "v_e6"])
        .count()
        .to_pandas()  # bounded: <= k * types survivors per batch, deduped
    )
    top: dict[str, np.ndarray] = {}
    for et, sub in winners.groupby("event_type", sort=True):
        vals = np.sort(sub["v_e6"].to_numpy().astype(np.int64))[::-1][:k]
        top[str(et)] = np.sort(vals)  # ascending for searchsorted
    keys = np.array(sorted(top))
    flat = np.concatenate([top[s] for s in keys]) if len(keys) else np.array([], dtype=np.int64)
    offs = np.cumsum([0] + [len(top[s]) for s in keys])

    def count_partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False).astype(str)
        v = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 1e6 + 0.5
        ).astype(np.int64)
        gi = np.searchsorted(keys, et)
        hit = np.zeros(len(v), dtype=bool)
        for i in range(len(keys)):  # bounded loop: one per type
            m = gi == i
            hit[m] = np.isin(v[m], flat[offs[i]:offs[i + 1]])
        if not hit.any():  # np.char.partition breaks on empty input
            return pa.table(
                {
                    "event_type": pa.array([], type=pa.string()),
                    "v_e6": pa.array([], type=pa.int64()),
                    "p_n": pa.array([], type=pa.int64()),
                }
            )
        et, v = et[hit], v[hit]
        codes, inv = np.unique(
            np.char.add(np.char.add(et, "\x1f"), v.astype("U20")),
            return_inverse=True,
        )
        cnt = np.bincount(inv).astype(np.int64)
        sp = np.char.partition(codes, "\x1f")
        return pa.table(
            {
                "event_type": pa.array(sp[:, 0].astype(object), type=pa.string()),
                "v_e6": pa.array(sp[:, 2].astype(np.int64)),
                "p_n": pa.array(cnt),
            }
        )

    merged = (
        _events(sf_dir)
        .select_columns(["event_type", "value"])
        .map_batches(count_partial, batch_format="pyarrow")
    )
    from .partition import sum_by_key

    merged = sum_by_key(merged, ["event_type", "v_e6"], {"p_n": "n"})

    def finish(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False).astype(str)
        v = batch.column("v_e6").to_numpy(zero_copy_only=False)
        gi = np.searchsorted(keys, et)
        # dense rank within the broadcast winner lists (desc): rank 1 = max
        rank = np.empty(len(v), dtype=np.int64)
        for i in range(len(keys)):  # bounded loop: one per type
            m = gi == i
            vals = flat[offs[i]:offs[i + 1]]  # ascending
            rank[m] = len(vals) - np.searchsorted(vals, v[m])
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "value_micro": pa.array(v),
                "n": pc.cast(batch.column("n"), pa.int64()),
                "dense_rank": pa.array(rank),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def watermark_late_counts(
    sf_dir: str,
    delay_minutes: int = 10,
    jitter_minutes: int = 30,
    num_buckets: int = 256,
) -> "ray.data.Dataset":
    """Streaming watermark accounting: events arrive in deterministic
    jittered-timestamp order (arrival = event time plus a keyed 0..30 min
    transport delay — the events table itself is perfectly time-sorted,
    so raw order would make lateness structurally impossible); the
    watermark is the max event-time seen so far minus a fixed
    ``delay_minutes`` allowance, and an event is LATE when its timestamp
    falls behind that watermark — per hourly window, how many events were
    on time vs late (23%% late at the defaults on the sf0.01 table).
    The reference has no streaming semantics at all (SURVEY §2 "not
    present"); this is the batch-exact restatement a backfill job runs
    to validate a streaming pipeline's window outputs.

    Scale shape — the classic two-phase distributed prefix scan, no
    sequential pass over the stream:

    1. arrival order ranges into ``num_buckets`` ordered buckets
       (``event_id`` quantile math, no sort); per-batch partials reduce
       each bucket's max event-time; the ≤``num_buckets``-row bucket-max
       relation is the ONLY thing the driver touches (prefix-max over it
       = the carry into each bucket — the broadcast small side);
    2. one bucket-keyed exchange: inside each bucket, events sort by
       arrival and a shifted ``np.maximum.accumulate`` seeded with the
       bucket's carry yields every event's exact watermark; per-batch
       (window, late) partial counts feed one tiny groupby.

    Output: (window_us, is_late, n_events)."""
    from .partition import map_key_partitions

    delay_us = np.int64(delay_minutes) * 60_000_000
    jitter_us = np.int64(jitter_minutes) * 60_000_000
    hour_us = np.int64(3_600_000_000)
    ev = _events(sf_dir).select_columns(["event_id", "ts"])
    import pandas as pd

    lo = np.int64(pd.Timestamp(ev.min("ts")).value)  # Timestamp.value is ns
    hi = np.int64(pd.Timestamp(ev.max("ts")).value)
    lo, hi = lo // 1000, hi // 1000 + int(jitter_us)  # arrival-key range, us
    span = int(hi - lo + 1)

    def tag(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").to_numpy(zero_copy_only=False).view(np.int64)
        # deterministic transport delay: Knuth multiplicative hash of the
        # event id, 0..jitter — the same integer expression the SQL
        # oracle evaluates
        arr = ts + (eid * np.int64(2654435761)) % np.int64(4294967296) % jitter_us
        b = np.clip(((arr - lo) * num_buckets) // span, 0, num_buckets - 1)
        return pa.table(
            {
                "bucket": pa.array(b),
                "event_id": pa.array(eid),
                "arr": pa.array(arr),
                "ts_us": pa.array(ts),
            }
        )

    tagged = ev.map_batches(tag, batch_format="pyarrow")

    def bucket_max_partial(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        ts = batch.column("ts_us").to_numpy(zero_copy_only=False)
        order = np.argsort(b, kind="stable")
        bs, tss = b[order], ts[order]
        starts = np.empty(len(bs), bool)
        if len(bs):
            starts[0] = True
            starts[1:] = bs[1:] != bs[:-1]
            mx = np.maximum.reduceat(tss, np.nonzero(starts)[0])
        else:
            mx = tss
        return pa.table(
            {"bucket": pa.array(bs[starts] if len(bs) else bs), "p_max": pa.array(mx)}
        )

    bmax = (
        tagged.map_batches(bucket_max_partial, batch_format="pyarrow")
        .groupby("bucket")
        .max("p_max")
    )
    rows = bmax.to_pandas()  # <= num_buckets rows — the broadcast small side
    carry = np.full(num_buckets, np.iinfo(np.int64).min, dtype=np.int64)
    if len(rows):
        carry[rows["bucket"].to_numpy()] = rows["max(p_max)"].to_numpy()
    # prefix max of STRICTLY EARLIER buckets
    prefix = np.concatenate(
        [[np.iinfo(np.int64).min], np.maximum.accumulate(carry)[:-1]]
    )

    def scan_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "window_us": pa.array([], type=pa.int64()),
                "is_late": pa.array([], type=pa.int64()),
                "p_n": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        b = tbl.column("bucket").to_numpy(zero_copy_only=False)
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        arr = tbl.column("arr").to_numpy(zero_copy_only=False)
        ts = tbl.column("ts_us").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, arr, b))
        b, ts = b[order], ts[order]
        starts = np.empty(len(b), bool)
        starts[0] = True
        starts[1:] = b[1:] != b[:-1]
        first = np.nonzero(starts)[0]
        # wm[i] = max(carry into this bucket, ts of earlier rows in the
        # bucket): seed each bucket run with its prefix carry, replace
        # every other position with the PREVIOUS row's ts, then running-
        # max each run (≤ num_buckets runs per partition — the
        # accumulate-per-run loop is bounded by the bucket count, never
        # by event count)
        prev = np.empty(len(ts), np.int64)
        prev[0] = np.iinfo(np.int64).min
        prev[1:] = ts[:-1]
        seeded = np.where(starts, prefix[b], prev)
        wm = np.concatenate(
            [
                np.maximum.accumulate(seeded[s:e])
                for s, e in zip(first, np.append(first[1:], len(seeded)))
            ]
        )
        late = (ts < wm - delay_us) & (wm != np.iinfo(np.int64).min)
        window = (ts // hour_us) * hour_us
        key = window * 2 + late.astype(np.int64)
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "window_us": pa.array(uniq // 2),
                "is_late": pa.array(uniq % 2),
                "p_n": pa.array(cnt.astype(np.int64)),
            }
        )

    cells = map_key_partitions(tagged, ["bucket"], scan_bucket)
    out = cells.groupby(["window_us", "is_late"]).aggregate(
        ray.data.aggregate.Sum("p_n", alias_name="n_events")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_us": batch.column("window_us"),
                "is_late": batch.column("is_late"),
                "n_events": pc.cast(batch.column("n_events"), pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def session_paths(
    sf_dir: str, gap_minutes: int = 30, max_steps: int = 8
) -> "ray.data.Dataset":
    """Session path analysis: the event-type sequence of each gap-based
    session (same 30-min rule as :func:`sessionize`), truncated to the
    first ``max_steps`` events, counted corpus-wide — the "what do users
    do, in what order" summary a product-analytics pipeline derives from
    a clickstream (no reference analog; companion operator family).

    Scale shape: ONE user-keyed exchange (the sessionize shuffle); inside
    each hash partition the path strings are assembled by a single
    vectorized polars group-join (no per-session Python), and only
    (path, count) partials — bounded by distinct paths, not sessions —
    leave the partition.  A tiny path-keyed groupby merges partials.
    Path cardinality is bounded by |event_type|^max_steps observed, in
    practice thousands; at web scale cap ``max_steps`` (8 here) and the
    alphabet, exactly as production funnel tools do.

    Output: (path, n_sessions); ties inside a session break by
    (ts, event_id) — the same deterministic order the oracle's
    ``string_agg(... ORDER BY ts, event_id)`` uses."""
    import polars as pl

    from .partition import map_key_partitions

    gap_us = np.int64(gap_minutes * 60 * 1_000_000)

    def paths_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "path": pa.array([], type=pa.string()),
                "p_n": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        ts = tbl.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        tsv = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        et = tbl.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        order = np.lexsort((eid, tsv, uid))
        tsv, uid = tsv[order], uid[order]
        brk = np.ones(len(tsv), dtype=bool)
        brk[1:] = (uid[1:] != uid[:-1]) | (np.diff(tsv) > gap_us)
        sess = np.cumsum(brk) - 1
        first = np.flatnonzero(brk)
        pos = np.arange(len(tsv), dtype=np.int64) - np.repeat(
            first, np.diff(np.append(first, len(tsv)))
        )
        keep = pos < max_steps
        types = et.take(pa.array(order[keep]))
        df = pl.DataFrame(
            {"sess": sess[keep], "t": pl.from_arrow(types)}
        )
        # one vectorized join per session, then a partition-local count
        paths = (
            df.group_by("sess", maintain_order=True)
            .agg(pl.col("t").str.join(">"))
            .group_by("t")
            .len()
        )
        return pa.table(
            {
                "path": paths.get_column("t").to_arrow().cast(pa.string()),
                "p_n": pa.array(
                    paths.get_column("len").to_numpy().astype(np.int64)
                ),
            }
        )

    partials = map_key_partitions(
        _events(sf_dir).select_columns(["user_id", "ts", "event_id", "event_type"]),
        ["user_id"],
        paths_part,
    )
    from .partition import sum_by_key

    merged = sum_by_key(partials, ["path"], {"p_n": "n_sessions"})

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "path": batch.column("path"),
                "n_sessions": pc.cast(batch.column("n_sessions"), pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# tumbling event-time windows with allowed lateness (session G)


def tumbling_lateness(
    sf_dir: str,
    delay_minutes: int = 10,
    lateness_minutes: int = 5,
    jitter_minutes: int = 30,
    num_buckets: int = 256,
) -> "ray.data.Dataset":
    """Tumbling 1-hour event-time windows under a watermark with ALLOWED
    LATENESS (the Flink window-lifecycle semantics, batch-exact): an
    event whose watermark-at-arrival has not yet passed its window end
    is ON TIME; past the end but within the lateness allowance it is a
    LATE UPDATE (the window re-fires); past end + allowance it is
    DROPPED.  Arrival order is the deterministic keyed-jitter replay of
    :func:`watermark_late_counts` (the raw table is time-sorted, so raw
    order would make lateness structurally impossible).

    Output per window: (window_us, n_on_time, n_late_accepted,
    n_dropped, accepted_sum_micro) — accepted = on-time + late updates,
    the value a correct streaming job would finally emit.

    Scale shape: the same two-phase distributed prefix-max scan as
    watermark_late_counts (arrival-range buckets → bounded bucket-max
    relation → one bucket-keyed exchange with a seeded running max);
    classification is vectorized inside the scan and only per-window
    partial counters leave it."""
    from .partition import map_key_partitions

    delay_us = np.int64(delay_minutes) * 60_000_000
    late_us = np.int64(lateness_minutes) * 60_000_000
    jitter_us = np.int64(jitter_minutes) * 60_000_000
    hour_us = np.int64(3_600_000_000)
    ev = _events(sf_dir).select_columns(["event_id", "ts", "value"])
    import pandas as pd

    lo = np.int64(pd.Timestamp(ev.min("ts")).value)
    hi = np.int64(pd.Timestamp(ev.max("ts")).value)
    lo, hi = lo // 1000, hi // 1000 + int(jitter_us)
    span = int(hi - lo + 1)

    def tag(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").to_numpy(zero_copy_only=False).view(np.int64)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        arr = ts + (eid * np.int64(2654435761)) % np.int64(4294967296) % jitter_us
        b = np.clip(((arr - lo) * num_buckets) // span, 0, num_buckets - 1)
        return pa.table(
            {
                "bucket": pa.array(b),
                "event_id": pa.array(eid),
                "arr": pa.array(arr),
                "ts_us": pa.array(ts),
                "v_e6": pa.array(np.floor(val * 1e6 + 0.5).astype(np.int64)),
            }
        )

    tagged = ev.map_batches(tag, batch_format="pyarrow")

    def bucket_max_partial(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        ts = batch.column("ts_us").to_numpy(zero_copy_only=False)
        order = np.argsort(b, kind="stable")
        bs, tss = b[order], ts[order]
        starts = np.empty(len(bs), bool)
        if len(bs):
            starts[0] = True
            starts[1:] = bs[1:] != bs[:-1]
            mx = np.maximum.reduceat(tss, np.nonzero(starts)[0])
        else:
            mx = tss
        return pa.table(
            {"bucket": pa.array(bs[starts] if len(bs) else bs), "p_max": pa.array(mx)}
        )

    bmax = (
        tagged.map_batches(bucket_max_partial, batch_format="pyarrow")
        .groupby("bucket")
        .max("p_max")
    )
    rows = bmax.to_pandas()  # <= num_buckets rows, the broadcast small side
    carry = np.full(num_buckets, np.iinfo(np.int64).min, dtype=np.int64)
    if len(rows):
        carry[rows["bucket"].to_numpy()] = rows["max(p_max)"].to_numpy()
    prefix = np.concatenate(
        [[np.iinfo(np.int64).min], np.maximum.accumulate(carry)[:-1]]
    )

    def scan_bucket(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "window_us": pa.array([], type=pa.int64()),
                "p_on": pa.array([], type=pa.int64()),
                "p_late": pa.array([], type=pa.int64()),
                "p_drop": pa.array([], type=pa.int64()),
                "p_vsum": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        b = tbl.column("bucket").to_numpy(zero_copy_only=False)
        eid = tbl.column("event_id").to_numpy(zero_copy_only=False)
        arr = tbl.column("arr").to_numpy(zero_copy_only=False)
        ts = tbl.column("ts_us").to_numpy(zero_copy_only=False)
        v = tbl.column("v_e6").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, arr, b))
        b, ts, v = b[order], ts[order], v[order]
        starts = np.empty(len(b), bool)
        starts[0] = True
        starts[1:] = b[1:] != b[:-1]
        first = np.nonzero(starts)[0]
        prev = np.empty(len(ts), np.int64)
        prev[0] = np.iinfo(np.int64).min
        prev[1:] = ts[:-1]
        seeded = np.where(starts, prefix[b], prev)
        wm_max = np.concatenate(
            [
                np.maximum.accumulate(seeded[s:e])
                for s, e in zip(first, np.append(first[1:], len(seeded)))
            ]
        )
        sent = wm_max == np.iinfo(np.int64).min
        wm = wm_max - delay_us  # the watermark at this event's arrival
        window = (ts // hour_us) * hour_us
        w_end = window + hour_us
        on_time = sent | (wm < w_end)
        dropped = (~sent) & (wm >= w_end + late_us)
        late_acc = ~on_time & ~dropped
        acc = on_time | late_acc
        uniq = np.unique(window)
        pos = np.searchsorted(uniq, window)
        n = len(uniq)
        # int64-exact accumulation (bincount weights sum in float64, which
        # loses exactness past 2^53 at scale)
        vsum = np.zeros(n, dtype=np.int64)
        np.add.at(vsum, pos, np.where(acc, v, 0))
        return pa.table(
            {
                "window_us": pa.array(uniq),
                "p_on": pa.array(np.bincount(pos[on_time], minlength=n).astype(np.int64)),
                "p_late": pa.array(np.bincount(pos[late_acc], minlength=n).astype(np.int64)),
                "p_drop": pa.array(np.bincount(pos[dropped], minlength=n).astype(np.int64)),
                "p_vsum": pa.array(vsum),
            }
        )

    partials = map_key_partitions(tagged, ["bucket"], scan_bucket)

    agg = (
        partials.groupby("window_us")
        .sum(["p_on", "p_late", "p_drop", "p_vsum"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_us": batch.column("window_us"),
                "n_on_time": pc.cast(batch.column("sum(p_on)"), pa.int64()),
                "n_late_accepted": pc.cast(batch.column("sum(p_late)"), pa.int64()),
                "n_dropped": pc.cast(batch.column("sum(p_drop)"), pa.int64()),
                "accepted_sum_micro": pc.cast(batch.column("sum(p_vsum)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
