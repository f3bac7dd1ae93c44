"""Relational demonstrations over the driver's TPC-H-ish tables — the
engine's generic aggregate/join machinery exercised outside the geo domain
(same patterns as the geo pipelines: partial combine before the shuffle,
broadcast small-side joins instead of shuffle joins).

Float sums are reported in integer centi-units (coarse enough that the
combine tree's float association error on ~1e9-scale sums stays below one
unit).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q1-shaped: per (returnflag, linestatus) counts and sums with
    per-batch partial aggregation."""

    def partial(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": batch.column("l_quantity"),
                "base": batch.column("l_extendedprice"),
                "disc": disc_price,
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base", "sum"), ("disc", "sum"), ("qty", "count")]
        )
        return pa.table(
            {
                "l_returnflag": g.column("l_returnflag"),
                "l_linestatus": g.column("l_linestatus"),
                "p_qty": g.column("qty_sum"),
                "p_base": g.column("base_sum"),
                "p_disc": g.column("disc_sum"),
                "p_cnt": pc.cast(g.column("qty_count"), pa.int64()),
            }
        )

    partials = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount",
            ],
        )
        .map_batches(partial, batch_format="pyarrow")
    )
    merged = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        ray.data.aggregate.Sum("p_qty", alias_name="s_qty"),
        ray.data.aggregate.Sum("p_base", alias_name="s_base"),
        ray.data.aggregate.Sum("p_disc", alias_name="s_disc"),
        ray.data.aggregate.Sum("p_cnt", alias_name="n_rows"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        def micro(name):
            v = batch.column(name).to_numpy(zero_copy_only=False)
            return pa.array(np.floor(v * 100 + 0.5).astype(np.int64))

        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "sum_qty_cent": micro("s_qty"),
                "sum_base_cent": micro("s_base"),
                "sum_disc_cent": micro("s_disc"),
                "n_rows": pc.cast(batch.column("n_rows"), pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def orders_by_segment(sf_dir: str) -> "ray.data.Dataset":
    """orders ⋈ customer via BROADCAST small-side lookup (no shuffle join):
    per market segment, order count + total price."""
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    keys = cust.column("c_custkey").to_numpy()
    segs = np.asarray(cust.column("c_mktsegment").to_pylist(), dtype=object)
    order = np.argsort(keys)
    keys, segs = keys[order], segs[order]

    def join_partial(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, ck)
        pos = np.clip(pos, 0, len(keys) - 1)
        seg = np.where(keys[pos] == ck, segs[pos], None)
        t = pa.table(
            {
                "c_mktsegment": pa.array(seg.tolist(), type=pa.string()),
                "price": batch.column("o_totalprice"),
            }
        )
        g = t.group_by(["c_mktsegment"]).aggregate([("price", "sum"), ("price", "count")])
        return pa.table(
            {
                "c_mktsegment": g.column("c_mktsegment"),
                "p_sum": g.column("price_sum"),
                "p_cnt": pc.cast(g.column("price_count"), pa.int64()),
            }
        )

    partials = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(join_partial, batch_format="pyarrow")
    merged = partials.groupby("c_mktsegment").aggregate(
        ray.data.aggregate.Sum("p_sum", alias_name="s"),
        ray.data.aggregate.Sum("p_cnt", alias_name="n_orders"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        s = batch.column("s").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c_mktsegment": batch.column("c_mktsegment"),
                "total_price_cent": pa.array(np.floor(s * 100 + 0.5).astype(np.int64)),
                "n_orders": pc.cast(batch.column("n_orders"), pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def top_suppliers(sf_dir: str, k: int = 5) -> "ray.data.Dataset":
    """Top-k suppliers by shipped quantity: partial sums → groupby → sort →
    limit (the only global sort in the engine, over a tiny aggregate)."""

    def partial(batch: pa.Table) -> pa.Table:
        g = pa.table(
            {
                "l_suppkey": batch.column("l_suppkey"),
                "qty": batch.column("l_quantity"),
            }
        ).group_by(["l_suppkey"]).aggregate([("qty", "sum")])
        return pa.table(
            {"l_suppkey": g.column("l_suppkey"), "p_qty": g.column("qty_sum")}
        )

    merged = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_quantity"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(ray.data.aggregate.Sum("p_qty", alias_name="s_qty"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        v = batch.column("s_qty").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_suppkey": batch.column("l_suppkey"),
                "total_qty_cent": pa.array(np.floor(v * 100 + 0.5).astype(np.int64)),
            }
        )

    return (
        merged.map_batches(finish, batch_format="pyarrow")
        .sort(["total_qty_cent", "l_suppkey"], descending=[True, False])
        .limit(k)
    )

def customers_no_orders(sf_dir: str, since: str = "1997-01-01") -> "ray.data.Dataset":
    """Distributed ANTI-join: customers with no order since ``since``
    (churn candidates).

    Scale shape: neither side broadcasts (both tables are unbounded at
    100 TB).  Both sides project to a shared ``(key, side, name,
    acctbal_cent)`` row shape and UNION; ONE hash shuffle on the key
    co-locates each custkey's rows (the asof/tf_idf tag-union pattern,
    SURVEY.md §7.3); inside a partition a sorted boundary pass marks keys
    that have at least one probe-side row.  The probe side pre-shrinks to
    its per-batch DISTINCT keys before the shuffle, so the exchange
    carries at most one probe row per (batch, custkey).

    Output: (c_custkey, c_name, acctbal_cent)."""
    from .partition import map_key_partitions

    def cust_rows(batch: pa.Table) -> pa.Table:
        bal = batch.column("c_acctbal").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": batch.column("c_custkey"),
                "side": pa.array(np.zeros(len(batch), dtype=np.int8)),
                "name": batch.column("c_name"),
                "acctbal_cent": pa.array(
                    np.floor(bal * 100 + 0.5).astype(np.int64)
                ),
            }
        )

    since_us = (
        np.datetime64(since).astype("datetime64[us]").astype(np.int64)
    )

    def order_rows(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        if isinstance(od, pa.ChunkedArray):
            od = od.combine_chunks()
        recent = od.cast(pa.int64()).to_numpy(zero_copy_only=False) >= since_us
        keys = np.unique(
            batch.column("o_custkey").to_numpy(zero_copy_only=False)[recent]
        )
        return pa.table(
            {
                "key": pa.array(keys),
                "side": pa.array(np.ones(len(keys), dtype=np.int8)),
                "name": pa.array([None] * len(keys), type=pa.string()),
                "acctbal_cent": pa.array(np.zeros(len(keys), dtype=np.int64)),
            }
        )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal"],
    ).map_batches(cust_rows, batch_format="pyarrow")
    ords = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(order_rows, batch_format="pyarrow")

    def anti(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "c_custkey": pa.array([], type=pa.int64()),
                "c_name": pa.array([], type=pa.string()),
                "acctbal_cent": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        # keys with ANY probe-side row: sort keys of probe rows once and
        # membership-test the build side (both arrays partition-local)
        probe = np.unique(key[side == 1])
        build = side == 0
        keep = build & ~np.isin(key, probe)
        if not keep.any():
            return empty
        out = tbl.filter(pa.array(keep))
        return pa.table(
            {
                "c_custkey": out.column("key"),
                "c_name": out.column("name"),
                "acctbal_cent": out.column("acctbal_cent"),
            }
        )

    return map_key_partitions(cust.union(ords), ["key"], anti)


def shipping_priority(
    sf_dir: str, k: int = 10, use_bloom: bool = False
) -> "ray.data.Dataset":
    """TPC-H Q3-shaped shipping priority: top-k open orders of BUILDING
    customers by outstanding lineitem revenue.

    Scale shape — TWO chained hash-partition joins, no broadcast of any
    unbounded side:

    1. custkey exchange: BUILDING customers (key rows) union orders
       filtered to ``o_orderdate < CUTOFF`` → semi-join keeps qualifying
       orders (one sorted membership pass per partition).
    2. orderkey exchange: qualifying orders union per-batch PARTIAL
       lineitem revenue (lineitem pre-aggregates ``sum(cents)`` per
       orderkey inside ``map_batches``, so the shuffle carries one row
       per (batch, orderkey), never raw lineitems) → inner join +
       segment-sum per orderkey.

    Revenue is exact integer cents from the per-row expression
    ``floor(l_extendedprice*(1-l_discount)*100 + 0.5)`` summed as int64 —
    associativity-free, so the combine tree matches single-pass SQL
    exactly.  Final top-k is a distributed sort over the small aggregate.

    ``use_bloom=True`` adds the classic exchange-volume optimization:
    the qualifying-order keys build a DISTRIBUTED Bloom filter
    (state/bloom.py — fixed-size bit-array partials OR-reduced on the
    driver) that pre-filters the lineitem scan, so only lines whose
    orderkey *possibly* qualifies enter the per-batch aggregation and
    the second exchange.  False positives just ride along and fail the
    join — results are bit-identical, verified by the SAME oracle.

    Output: (o_orderkey, o_orderdate, revenue_cent)."""
    from .partition import map_key_partitions

    CUTOFF = np.datetime64("1995-03-15")
    cutoff_us = CUTOFF.astype("datetime64[us]").astype(np.int64)

    def cust_rows(batch: pa.Table) -> pa.Table:
        seg = batch.column("c_mktsegment").to_numpy(zero_copy_only=False)
        keys = batch.column("c_custkey").to_numpy(zero_copy_only=False)
        keys = keys[seg == "BUILDING"]
        return pa.table(
            {
                "key": pa.array(keys),
                "side": pa.array(np.zeros(len(keys), dtype=np.int8)),
                "orderkey": pa.array(np.zeros(len(keys), dtype=np.int64)),
                "odate_us": pa.array(np.zeros(len(keys), dtype=np.int64)),
            }
        )

    def order_rows(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        if isinstance(od, pa.ChunkedArray):
            od = od.combine_chunks()
        od_us = od.cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = od_us < cutoff_us
        return pa.table(
            {
                "key": batch.column("o_custkey").filter(pa.array(keep)),
                "side": pa.array(np.ones(int(keep.sum()), dtype=np.int8)),
                "orderkey": batch.column("o_orderkey").filter(pa.array(keep)),
                "odate_us": pa.array(od_us[keep]),
            }
        )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(cust_rows, batch_format="pyarrow")
    ords = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(order_rows, batch_format="pyarrow")

    def semi(tbl: pa.Table) -> pa.Table:
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        build = np.unique(key[side == 0])
        keep = (side == 1) & np.isin(key, build)
        out = tbl.filter(pa.array(keep))
        return pa.table(
            {
                "key": out.column("orderkey"),  # re-key for the 2nd exchange
                "side": pa.array(np.zeros(len(out), dtype=np.int8)),
                "odate_us": out.column("odate_us"),
                "rev_cent": pa.array(np.zeros(len(out), dtype=np.int64)),
            }
        )

    qual_orders = map_key_partitions(cust.union(ords), ["key"], semi)

    bloom_words = None
    if use_bloom:
        from ..state.bloom import bloom_build

        # survivors reused twice (filter build + join) — spill-backed
        qual_orders = qual_orders.materialize()
        bloom_words = bloom_build(qual_orders, "key")

    def line_partial(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate")
        if isinstance(sd, pa.ChunkedArray):
            sd = sd.combine_chunks()
        sd_us = sd.cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = sd_us > cutoff_us
        if bloom_words is not None:
            from ..state.bloom import bloom_probe

            ok_all = batch.column("l_orderkey").to_numpy(
                zero_copy_only=False
            )
            keep &= bloom_probe(bloom_words, ok_all)
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)[keep]
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        cents = np.floor(price * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        # per-batch partial: one row per orderkey in this batch
        uk, inv = np.unique(ok, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, cents)
        return pa.table(
            {
                "key": pa.array(uk),
                "side": pa.array(np.ones(len(uk), dtype=np.int8)),
                "odate_us": pa.array(np.zeros(len(uk), dtype=np.int64)),
                "rev_cent": pa.array(sums),
            }
        )

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(line_partial, batch_format="pyarrow")

    def join_sum(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_orderkey": pa.array([], type=pa.int64()),
                "o_orderdate": pa.array([], type=pa.timestamp("us")),
                "revenue_cent": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        odate = tbl.column("odate_us").to_numpy(zero_copy_only=False)
        rev = tbl.column("rev_cent").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, key))  # order row (side 0) first per key
        key, side, odate, rev = key[order], side[order], odate[order], rev[order]
        starts = np.flatnonzero(
            np.concatenate([[True], key[1:] != key[:-1]])
        )
        # a key qualifies iff its first row is the order side
        ok = side[starts] == 0
        seg_sum = np.add.reduceat(rev, starts)
        n_rows = np.diff(np.append(starts, len(key)))
        keep = ok & (n_rows > 1)  # must also have lineitem revenue rows
        if not keep.any():
            return empty
        return pa.table(
            {
                "o_orderkey": pa.array(key[starts][keep]),
                "o_orderdate": pa.array(odate[starts][keep]).cast(
                    pa.timestamp("us")
                ),
                "revenue_cent": pa.array(seg_sum[keep]),
            }
        )

    joined = map_key_partitions(qual_orders.union(lines), ["key"], join_sum)
    return joined.sort(
        ["revenue_cent", "o_orderkey"], descending=[True, False]
    ).limit(k)


def late_shipment_priority(sf_dir: str, grace_days: int = 90) -> "ray.data.Dataset":
    """TPC-H Q4-shaped EXISTS semi-join: per order priority, how many
    orders had at least one LATE shipment (a lineitem shipped more than
    ``grace_days`` after the order date; the schema here has no
    commit/receipt dates, so lateness is ship-vs-order-date).

    Scale shape: the EXISTS collapses to a per-orderkey MAX — lineitem
    pre-reduces each batch to one (orderkey, max_shipdate) row, so the
    orderkey exchange carries one row per (batch, orderkey) from the fat
    side; the per-partition join is one sorted boundary pass; the final
    priority rollup is a bounded groupby.

    Output: (o_orderpriority, n_late_orders)."""
    from .partition import map_key_partitions

    DAY_US = np.int64(86_400_000_000)

    def order_rows(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        if isinstance(od, pa.ChunkedArray):
            od = od.combine_chunks()
        return pa.table(
            {
                "key": batch.column("o_orderkey"),
                "side": pa.array(np.zeros(len(batch), dtype=np.int8)),
                "ts_us": od.cast(pa.int64()),
                "priority": batch.column("o_orderpriority"),
            }
        )

    def line_partial(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate")
        if isinstance(sd, pa.ChunkedArray):
            sd = sd.combine_chunks()
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        sd_us = sd.cast(pa.int64()).to_numpy(zero_copy_only=False)
        uk, inv = np.unique(ok, return_inverse=True)
        mx = np.full(len(uk), np.iinfo(np.int64).min)
        np.maximum.at(mx, inv, sd_us)
        return pa.table(
            {
                "key": pa.array(uk),
                "side": pa.array(np.ones(len(uk), dtype=np.int8)),
                "ts_us": pa.array(mx),
                "priority": pa.array([""] * len(uk), type=pa.string()),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(order_rows, batch_format="pyarrow")
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(line_partial, batch_format="pyarrow")

    def exists_late(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_orderpriority": pa.array([], type=pa.string()),
                "n_part": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        ts = tbl.column("ts_us").to_numpy(zero_copy_only=False)
        prio = tbl.column("priority").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, key))  # order row first per key
        key, side, ts, prio = key[order], side[order], ts[order], prio[order]
        starts = np.flatnonzero(np.concatenate([[True], key[1:] != key[:-1]]))
        run_id = np.cumsum(np.concatenate([[True], key[1:] != key[:-1]])) - 1
        has_order = side[starts] == 0
        odate = ts[starts]  # valid only where has_order
        # per-key max shipdate over the lineitem rows
        mx = np.full(len(starts), np.iinfo(np.int64).min)
        lmask = side == 1
        np.maximum.at(mx, run_id[lmask], ts[lmask])
        late = has_order & (mx > odate + np.int64(grace_days) * DAY_US)
        if not late.any():
            return empty
        p = prio[starts][late]
        up, cnt = np.unique(p, return_counts=True)
        return pa.table(
            {
                "o_orderpriority": pa.array(up),
                "n_part": pa.array(cnt.astype(np.int64)),
            }
        )

    parts = map_key_partitions(orders.union(lines), ["key"], exists_late)
    merged = parts.groupby("o_orderpriority").aggregate(
        ray.data.aggregate.Sum("n_part", alias_name="n_late_orders")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": batch.column("o_orderpriority"),
                "n_late_orders": pc.cast(
                    batch.column("n_late_orders"), pa.int64()
                ),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def running_customer_totals(sf_dir: str) -> "ray.data.Dataset":
    """Windowed running total: each order annotated with its customer's
    cumulative spend so far (the classic ``SUM() OVER (PARTITION BY
    customer ORDER BY date)`` — lifetime-value feature).

    Scale shape: one hash shuffle on custkey; inside each partition one
    lexsort by (custkey, orderdate, orderkey) + a per-run padded cumsum
    (the engine's batch-size-invariant cumulative pattern — subtract the
    run-start prefix instead of segment loops).  Totals accumulate in
    integer cents from the per-row expression, so the running values are
    association-free and match single-pass SQL exactly.

    Output: (o_orderkey, o_custkey, running_total_cent)."""
    from .partition import map_key_partitions

    def project(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        if isinstance(od, pa.ChunkedArray):
            od = od.combine_chunks()
        price = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_custkey": batch.column("o_custkey"),
                "o_orderkey": batch.column("o_orderkey"),
                "odate_us": od.cast(pa.int64()),
                "cent": pa.array(
                    np.floor(price * 100 + 0.5).astype(np.int64)
                ),
            }
        )

    rows = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(project, batch_format="pyarrow")

    def cum_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_orderkey": pa.array([], type=pa.int64()),
                "o_custkey": pa.array([], type=pa.int64()),
                "running_total_cent": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        ck = tbl.column("o_custkey").to_numpy(zero_copy_only=False)
        ok = tbl.column("o_orderkey").to_numpy(zero_copy_only=False)
        od = tbl.column("odate_us").to_numpy(zero_copy_only=False)
        cent = tbl.column("cent").to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, od, ck))
        ck, ok, cent = ck[order], ok[order], cent[order]
        csum = np.cumsum(cent)
        starts = np.flatnonzero(np.concatenate([[True], ck[1:] != ck[:-1]]))
        run_id = np.cumsum(np.concatenate([[True], ck[1:] != ck[:-1]])) - 1
        base = (csum[starts] - cent[starts])[run_id]
        return pa.table(
            {
                "o_orderkey": pa.array(ok),
                "o_custkey": pa.array(ck),
                "running_total_cent": pa.array(csum - base),
            }
        )

    return map_key_partitions(rows, ["o_custkey"], cum_part)


def revenue_by_nation(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q5-flavored rollup: lineitem revenue by the SUPPLIER's nation
    and region — a chained dimension-broadcast join (supplier → nation →
    region are all bounded dimension tables, so the star join needs NO
    shuffle at all: the fact table maps once with a composed lookup and
    only the per-(nation, region) partials aggregate).

    The three dimension tables pre-compose driver-side into ONE sorted
    suppkey → (nation, region) array (bounded by supplier count), stored
    in the object store once via the map task's closure capture.

    Output: (n_name, r_name, revenue_cent)."""
    import pyarrow.parquet as pq

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    reg = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    nkey = nat.column("n_nationkey").to_numpy()
    nname = np.asarray(nat.column("n_name").to_pylist(), dtype=object)
    nreg = nat.column("n_regionkey").to_numpy()
    rkey = reg.column("r_regionkey").to_numpy()
    rname = np.asarray(reg.column("r_name").to_pylist(), dtype=object)
    r_of = dict(zip(rkey.tolist(), rname.tolist()))
    n_order = np.argsort(nkey)
    skey = sup.column("s_suppkey").to_numpy()
    snat = sup.column("s_nationkey").to_numpy()
    s_order = np.argsort(skey)
    skey = skey[s_order]
    pos = np.searchsorted(nkey[n_order], snat[s_order])
    s_nname = nname[n_order][pos]
    s_rname = np.asarray(
        [r_of[int(k)] for k in nreg[n_order][pos]], dtype=object
    )

    def partial(batch: pa.Table) -> pa.Table:
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        p = np.searchsorted(skey, sk)
        p = np.clip(p, 0, len(skey) - 1)
        ok = skey[p] == sk
        nn, rn = s_nname[p[ok]], s_rname[p[ok]]
        c = cents[ok]
        un, inv = np.unique(nn.astype(str), return_inverse=True)
        sums = np.zeros(len(un), dtype=np.int64)
        np.add.at(sums, inv, c)
        # region follows the nation 1:1
        first = np.zeros(len(un), dtype=np.int64)
        first[inv[::-1]] = np.arange(len(inv))[::-1]
        return pa.table(
            {
                "n_name": pa.array(un),
                "r_name": pa.array(rn[first].astype(str)),
                "p_cent": pa.array(sums),
            }
        )

    merged = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["n_name", "r_name"])
        .aggregate(ray.data.aggregate.Sum("p_cent", alias_name="revenue_cent"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": batch.column("n_name"),
                "r_name": batch.column("r_name"),
                "revenue_cent": pc.cast(
                    batch.column("revenue_cent"), pa.int64()
                ),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def forecast_revenue(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q6-shaped: revenue uplift from discount changes — a pure
    filter + scalar aggregate with NO shuffle at all.

    Scale shape: columns pruned at the read (4 of 11), the predicate and
    the per-row integer-cent revenue both evaluate vectorized per batch,
    and only ONE (p_cent, p_cnt) partial row per batch leaves the map
    stage; the global combine sums a handful of tiny rows.  Per-row
    ``floor(price*disc*100+0.5)`` BEFORE any summation keeps the total
    association-free (exact vs single-pass SQL).

    Output: one row (revenue_cent, n_rows)."""

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate")
        if isinstance(sd, pa.ChunkedArray):
            sd = sd.combine_chunks()
        ts = sd.cast(pa.int64()).to_numpy(zero_copy_only=False)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        lo = np.datetime64("1996-01-01", "us").astype(np.int64)
        hi = np.datetime64("1997-01-01", "us").astype(np.int64)
        keep = (
            (ts >= lo) & (ts < hi)
            & (disc >= 0.03) & (disc <= 0.07)
            & (qty < 24.0)
        )
        cents = np.floor(price[keep] * disc[keep] * 100.0 + 0.5).astype(
            np.int64
        )
        return pa.table(
            {
                "k": pa.array([0], type=pa.int64()),
                "p_cent": pa.array([int(cents.sum())], type=pa.int64()),
                "p_cnt": pa.array([int(keep.sum())], type=pa.int64()),
            }
        )

    merged = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_shipdate", "l_quantity", "l_discount", "l_extendedprice",
            ],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(
            ray.data.aggregate.Sum("p_cent", alias_name="revenue_cent"),
            ray.data.aggregate.Sum("p_cnt", alias_name="n_rows"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "revenue_cent": pc.cast(
                    batch.column("revenue_cent"), pa.int64()
                ),
                "n_rows": pc.cast(batch.column("n_rows"), pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def promo_revenue(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q14-shaped: share of revenue from PROMO-type parts — a
    fact-side scan with a BROADCAST dimension lookup, so the only
    exchange is the single-row partial combine.  The broadcast is the
    (partkey, is_promo-bit) projection only; when the part dimension is
    itself unbounded, swap this for the keyed tag-union exchange
    demonstrated by :func:`parts_supplier_count` — the broadcast variant
    is kept as the canonical small-dim pattern.

    The promo flag attaches via a sorted-partkey searchsorted probe; both
    the promo and total revenues accumulate per-row in integer cents, and
    the e4 promo share derives from the two exact integers, so the oracle
    match is exact.

    Output: one row (promo_cent, total_cent, promo_share_e4)."""
    import pyarrow.parquet as pq

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )
    pkey = part.column("p_partkey").to_numpy()
    promo = pc.equal(part.column("p_type"), pa.scalar("PROMO")).to_numpy(
        zero_copy_only=False
    )
    order = np.argsort(pkey)
    pkey, promo = pkey[order], promo[order]

    def partial(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        pos = np.clip(np.searchsorted(pkey, pk), 0, len(pkey) - 1)
        is_promo = (pkey[pos] == pk) & promo[pos]
        return pa.table(
            {
                "k": pa.array([0], type=pa.int64()),
                "p_promo": pa.array(
                    [int(cents[is_promo].sum())], type=pa.int64()
                ),
                "p_total": pa.array([int(cents.sum())], type=pa.int64()),
            }
        )

    merged = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(
            ray.data.aggregate.Sum("p_promo", alias_name="promo_cent"),
            ray.data.aggregate.Sum("p_total", alias_name="total_cent"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        pr = batch.column("promo_cent").to_numpy(zero_copy_only=False)
        tot = batch.column("total_cent").to_numpy(zero_copy_only=False)
        share = (pr.astype(np.int64) * 10000) // np.maximum(tot, 1)
        return pa.table(
            {
                "promo_cent": pa.array(pr.astype(np.int64)),
                "total_cent": pa.array(tot.astype(np.int64)),
                "promo_share_e4": pa.array(share.astype(np.int64)),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def large_orders(sf_dir: str, min_qty: float = 300.0) -> "ray.data.Dataset":
    """TPC-H Q18-shaped: orders whose total lineitem quantity exceeds a
    threshold, annotated with the order row and the customer name.

    Scale shape: stage 1 pre-aggregates quantity per orderkey inside each
    batch, so the ONLY shuffle carries (orderkey, partial_qty) pairs —
    never lineitem rows.  The HAVING filter makes the winner set small by
    construction (that is the query's point), so every later step works
    with BOUNDED broadcasts only: the winner orderkeys probe a
    shuffle-free orders scan (collecting exactly |winners| rows), and the
    winners' custkeys then probe a shuffle-free customer scan — no
    unbounded table is ever pulled to the driver or closure-shipped.

    Output: (c_name, o_orderkey, odate_us, total_price_cent, total_qty)."""

    def lpartial(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        keys, inv = np.unique(ok, return_inverse=True)
        sums = np.zeros(len(keys), dtype=np.float64)
        np.add.at(sums, inv, qty)
        return pa.table(
            {"l_orderkey": pa.array(keys), "p_qty": pa.array(sums)}
        )

    qty_tbl = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_quantity"],
        )
        .map_batches(lpartial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(ray.data.aggregate.Sum("p_qty", alias_name="total_qty"))
        .map_batches(
            lambda b: b.filter(pc.greater(b.column("total_qty"), min_qty)),
            batch_format="pyarrow",
        )
    )
    winners = qty_tbl.to_pandas()  # bounded: HAVING-filtered winner set
    if len(winners) == 0:
        wkey = np.empty(0, dtype=np.int64)
        wqty = np.empty(0, dtype=np.float64)
    else:
        wkey = winners["l_orderkey"].to_numpy()
        wqty = winners["total_qty"].to_numpy()
        order = np.argsort(wkey)
        wkey, wqty = wkey[order], wqty[order]

    empty = pa.table(
        {
            "c_name": pa.array([], type=pa.string()),
            "o_orderkey": pa.array([], type=pa.int64()),
            "odate_us": pa.array([], type=pa.int64()),
            "total_price_cent": pa.array([], type=pa.int64()),
            "total_qty": pa.array([], type=pa.float64()),
        }
    )
    if len(wkey) == 0:
        return ray.data.from_arrow(empty)

    def order_probe(batch: pa.Table) -> pa.Table:
        ok = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        if len(ok) == 0:
            return batch.slice(0, 0)
        pos = np.clip(np.searchsorted(wkey, ok), 0, len(wkey) - 1)
        return batch.filter(pa.array(wkey[pos] == ok))

    # exactly |winners| rows survive the probe — a bounded collect
    worders = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(order_probe, batch_format="pyarrow")
        .to_pandas()
    )
    wck = np.unique(worders["o_custkey"].to_numpy())

    def cust_probe(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").to_numpy(zero_copy_only=False)
        if len(ck) == 0:
            return batch.slice(0, 0)
        pos = np.clip(np.searchsorted(wck, ck), 0, len(wck) - 1)
        return batch.filter(pa.array(wck[pos] == ck))

    names = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
        )
        .map_batches(cust_probe, batch_format="pyarrow")
        .to_pandas()
    )  # bounded: one row per winner customer
    name_of = dict(zip(names["c_custkey"], names["c_name"]))
    qty_of = dict(zip(wkey.tolist(), wqty.tolist()))
    ok = worders["o_orderkey"].to_numpy()
    price = worders["o_totalprice"].to_numpy()
    out = pa.table(
        {
            "c_name": pa.array(
                [name_of.get(int(c)) for c in worders["o_custkey"]],
                type=pa.string(),
            ),
            "o_orderkey": pa.array(ok.astype(np.int64)),
            "odate_us": pa.array(
                worders["o_orderdate"].astype("int64").to_numpy()
            ),  # datetime64[us] → µs (pandas 2 preserves the unit)
            "total_price_cent": pa.array(
                np.floor(price * 100 + 0.5).astype(np.int64)
            ),
            "total_qty": pa.array(
                np.array([qty_of[int(o)] for o in ok], dtype=np.float64)
            ),
        }
    )
    return ray.data.from_arrow(out if len(out) else empty)


def returned_customers(sf_dir: str, k: int = 20) -> "ray.data.Dataset":
    """TPC-H Q10-shaped: top-k customers by revenue of RETURNED items in
    one quarter — the churn-triage query.

    Scale shape: lineitem filters to returnflag='R' and pre-aggregates
    integer cents per orderkey inside each batch; orders filter to the
    quarter; ONE orderkey hash exchange joins them (tag-union, sorted
    segment pass) and re-emits (custkey, cents) partials; the custkey
    rollup is a second grouped exchange over small rows; the global top-k
    sorts only the per-customer aggregate.  Customer names attach LAST —
    only the k winner keys probe the customer scan, so no unbounded side
    ever broadcasts.

    Output: (c_custkey, c_name, revenue_cent)."""
    from .partition import map_key_partitions

    lo = np.datetime64("1996-07-01", "us").astype(np.int64)
    hi = np.datetime64("1996-10-01", "us").astype(np.int64)

    def order_rows(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        if isinstance(od, pa.ChunkedArray):
            od = od.combine_chunks()
        od_us = od.cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (od_us >= lo) & (od_us < hi)
        return pa.table(
            {
                "key": batch.column("o_orderkey").filter(pa.array(keep)),
                "side": pa.array(np.zeros(int(keep.sum()), dtype=np.int8)),
                "custkey": batch.column("o_custkey").filter(pa.array(keep)),
                "rev_cent": pa.array(np.zeros(int(keep.sum()), dtype=np.int64)),
            }
        )

    def line_partial(batch: pa.Table) -> pa.Table:
        flag = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
        keep = flag == "R"
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)[keep]
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        cents = np.floor(price * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        uk, inv = np.unique(ok, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, cents)
        return pa.table(
            {
                "key": pa.array(uk),
                "side": pa.array(np.ones(len(uk), dtype=np.int8)),
                "custkey": pa.array(np.zeros(len(uk), dtype=np.int64)),
                "rev_cent": pa.array(sums),
            }
        )

    ords = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(order_rows, batch_format="pyarrow")
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(line_partial, batch_format="pyarrow")

    def join_to_cust(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "custkey": pa.array([], type=pa.int64()),
                "p_cent": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        ck = tbl.column("custkey").to_numpy(zero_copy_only=False)
        rev = tbl.column("rev_cent").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, key))  # order row first within each key
        key, side, ck, rev = key[order], side[order], ck[order], rev[order]
        starts = np.flatnonzero(
            np.concatenate([[True], key[1:] != key[:-1]])
        )
        qualifies = side[starts] == 0  # key has its order row present
        seg_rev = np.add.reduceat(rev, starts)  # order rows contribute 0
        seg_ck = ck[starts]
        keep = qualifies & (seg_rev != 0)
        seg_ck, seg_rev = seg_ck[keep], seg_rev[keep]
        # pre-aggregate per custkey inside the partition
        uk, inv = np.unique(seg_ck, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, seg_rev)
        return pa.table({"custkey": pa.array(uk), "p_cent": pa.array(sums)})

    per_cust = (
        map_key_partitions(ords.union(lines), ["key"], join_to_cust)
        .groupby("custkey")
        .aggregate(ray.data.aggregate.Sum("p_cent", alias_name="revenue_cent"))
        .map_batches(
            lambda b: pa.table(
                {
                    "c_custkey": b.column("custkey"),
                    "revenue_cent": pc.cast(
                        b.column("revenue_cent"), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .sort(["revenue_cent", "c_custkey"], descending=[True, False])
        .limit(k)
    )

    winners = per_cust.to_pandas()  # bounded: exactly k rows
    wkey = winners["c_custkey"].to_numpy()
    wrev = winners["revenue_cent"].to_numpy()
    order = np.argsort(wkey)
    wkey_s, wrev_s = wkey[order], wrev[order]

    def attach(batch: pa.Table) -> pa.Table:
        ck = batch.column("c_custkey").to_numpy(zero_copy_only=False)
        if len(wkey_s) == 0 or len(ck) == 0:
            hit = np.zeros(len(ck), dtype=bool)
        else:
            pos = np.clip(np.searchsorted(wkey_s, ck), 0, len(wkey_s) - 1)
            hit = wkey_s[pos] == ck
        sub = batch.filter(pa.array(hit))
        if len(sub) == 0:
            return pa.table(
                {
                    "c_custkey": pa.array([], type=pa.int64()),
                    "c_name": pa.array([], type=pa.string()),
                    "revenue_cent": pa.array([], type=pa.int64()),
                }
            )
        pos = np.searchsorted(wkey_s, sub.column("c_custkey").to_numpy())
        return pa.table(
            {
                "c_custkey": sub.column("c_custkey"),
                "c_name": sub.column("c_name"),
                "revenue_cent": pa.array(wrev_s[pos]),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(attach, batch_format="pyarrow")


def parts_supplier_count(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q16-shaped: per (brand, type, size) the number of DISTINCT
    suppliers that shipped such parts — grouped COUNT(DISTINCT) across a
    fact→dimension join.

    Scale shape: neither side broadcasts.  Stage 1 shrinks lineitem
    batches to their distinct (partkey, suppkey) pairs; exchange 1 hash-
    partitions on partkey and tag-union joins the part attribute rows,
    emitting partition-deduped (brand, type, size, suppkey) rows; exchange
    2 hash-partitions on the group attributes, where a sorted run-boundary
    pass performs the global distinct-suppkey count (each group's rows are
    fully co-located, so the count is final — no per-group dispatch).

    Output: (p_brand, p_type, p_size, supplier_cnt)."""
    from .partition import map_key_partitions, run_starts

    def pair_rows(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        # distinct pairs without bit-packing (either key may exceed any
        # fixed bit budget at scale): lexsort + run boundaries
        order = np.lexsort((sk, pk))
        pk, sk = pk[order], sk[order]
        from .partition import run_starts

        keep = run_starts(pk, sk) if len(pk) else np.zeros(0, dtype=bool)
        upk, usk = pk[keep], sk[keep]
        n = len(upk)
        return pa.table(
            {
                "key": pa.array(upk),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "suppkey": pa.array(usk),
                "p_brand": pa.array([""] * n, type=pa.string()),
                "p_type": pa.array([""] * n, type=pa.string()),
                "p_size": pa.array(np.zeros(n, dtype=np.int32)),
            }
        )

    def part_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "key": batch.column("p_partkey"),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "suppkey": pa.array(np.zeros(n, dtype=np.int64)),
                "p_brand": batch.column("p_brand"),
                "p_type": batch.column("p_type"),
                "p_size": batch.column("p_size"),
            }
        )

    pairs = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).map_batches(pair_rows, batch_format="pyarrow")
    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    ).map_batches(part_rows, batch_format="pyarrow")

    def attach_attrs(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "p_brand": pa.array([], type=pa.string()),
                "p_type": pa.array([], type=pa.string()),
                "p_size": pa.array([], type=pa.int32()),
                "suppkey": pa.array([], type=pa.int64()),
            }
        )
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        is_dim = side == 0
        if is_dim.all() or not is_dim.any():
            return empty
        dims = tbl.filter(pa.array(is_dim)).sort_by("key")
        facts = tbl.filter(pa.array(~is_dim))
        dkeys = dims.column("key").to_numpy(zero_copy_only=False)
        fkeys = facts.column("key").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dkeys, fkeys), 0, len(dkeys) - 1)
        hit = dkeys[pos] == fkeys
        facts = facts.filter(pa.array(hit))
        pos = pos[hit]
        out = pa.table(
            {
                "p_brand": dims.column("p_brand").take(pa.array(pos)),
                "p_type": dims.column("p_type").take(pa.array(pos)),
                "p_size": dims.column("p_size").take(pa.array(pos)),
                "suppkey": facts.column("suppkey"),
            }
        )
        # partition-level dedup: cross-batch (partkey, suppkey) repeats
        # collapse here; cross-PARTKEY repeats of (group, suppkey) remain
        # and fall to exchange 2's global distinct.
        return out.group_by(
            ["p_brand", "p_type", "p_size", "suppkey"]
        ).aggregate([])

    group_rows = map_key_partitions(pairs.union(parts), ["key"], attach_attrs)

    def count_distinct(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table(
                {
                    "p_brand": pa.array([], type=pa.string()),
                    "p_type": pa.array([], type=pa.string()),
                    "p_size": pa.array([], type=pa.int32()),
                    "supplier_cnt": pa.array([], type=pa.int64()),
                }
            )
        brand = tbl.column("p_brand").to_numpy(zero_copy_only=False)
        ptype = tbl.column("p_type").to_numpy(zero_copy_only=False)
        size = tbl.column("p_size").to_numpy(zero_copy_only=False)
        sk = tbl.column("suppkey").to_numpy(zero_copy_only=False)
        bcode = np.unique(brand, return_inverse=True)[1]
        tcode = np.unique(ptype, return_inverse=True)[1]
        order = np.lexsort((sk, size, tcode, bcode))
        b, t, s, k_ = bcode[order], tcode[order], size[order], sk[order]
        grp_start = run_starts(b, t, s)
        distinct = run_starts(b, t, s, k_)
        gidx = np.cumsum(grp_start) - 1
        cnt = np.zeros(int(grp_start.sum()), dtype=np.int64)
        np.add.at(cnt, gidx[distinct], 1)
        sel = np.flatnonzero(grp_start)
        take = pa.array(order[sel])
        return pa.table(
            {
                "p_brand": tbl.column("p_brand").take(take),
                "p_type": tbl.column("p_type").take(take),
                "p_size": tbl.column("p_size").take(take),
                "supplier_cnt": pa.array(cnt),
            }
        )

    return map_key_partitions(
        group_rows, ["p_brand", "p_type", "p_size"], count_distinct
    )


def linestatus_priority(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q12-shaped: per lineitem linestatus, how many line items
    belong to high-priority orders (1-URGENT / 2-HIGH) vs all others,
    within a ship-date year — the CASE-bucketed join rollup.

    Scale shape: ONE orderkey tag-union hash exchange (the Q3/Q10
    pattern); the orders side ships a single int8 priority flag, the
    lineitem side ships (orderkey, linestatus) for rows passing the
    pushed-down date filter, and each partition emits bounded
    (linestatus, hi/lo) partial counts.

    Output: (l_linestatus, high_line_count, low_line_count)."""
    from .partition import map_key_partitions

    lo_us = np.datetime64("1996-01-01", "us").astype(np.int64)
    hi_us = np.datetime64("1997-01-01", "us").astype(np.int64)

    def order_rows(batch: pa.Table) -> pa.Table:
        pr = batch.column("o_orderpriority").to_numpy(zero_copy_only=False)
        high = (pr == "1-URGENT") | (pr == "2-HIGH")
        return pa.table(
            {
                "key": batch.column("o_orderkey"),
                "side": pa.array(np.zeros(len(batch), dtype=np.int8)),
                "flag": pa.array(high.astype(np.int8)),
                "l_linestatus": pa.array([""] * len(batch), type=pa.string()),
            }
        )

    def line_rows(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate")
        if isinstance(sd, pa.ChunkedArray):
            sd = sd.combine_chunks()
        sd_us = sd.cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (sd_us >= lo_us) & (sd_us < hi_us)
        n = int(keep.sum())
        return pa.table(
            {
                "key": batch.column("l_orderkey").filter(pa.array(keep)),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "flag": pa.array(np.zeros(n, dtype=np.int8)),
                "l_linestatus": batch.column("l_linestatus").filter(
                    pa.array(keep)
                ),
            }
        )

    ords = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(order_rows, batch_format="pyarrow")
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linestatus", "l_shipdate"],
    ).map_batches(line_rows, batch_format="pyarrow")

    def join_count(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "l_linestatus": pa.array([], type=pa.string()),
                "p_high": pa.array([], type=pa.int64()),
                "p_low": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        flag = tbl.column("flag").to_numpy(zero_copy_only=False)
        ls = tbl.column("l_linestatus").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, key))  # order row first per key
        key, side, flag, ls = key[order], side[order], flag[order], ls[order]
        starts = np.flatnonzero(
            np.concatenate([[True], key[1:] != key[:-1]])
        )
        # forward-fill each key's order flag onto its lineitem rows
        gidx = np.cumsum(
            np.concatenate([[True], key[1:] != key[:-1]])
        ) - 1
        has_order = side[starts] == 0
        key_flag = np.where(has_order, flag[starts], 0).astype(np.int64)
        is_line = side == 1
        line_ok = is_line & has_order[gidx]
        ls_l = ls[line_ok]
        hi_l = key_flag[gidx[line_ok]]
        codes, inv = np.unique(ls_l, return_inverse=True)
        p_high = np.zeros(len(codes), dtype=np.int64)
        p_low = np.zeros(len(codes), dtype=np.int64)
        np.add.at(p_high, inv, hi_l)
        np.add.at(p_low, inv, 1 - hi_l)
        return pa.table(
            {
                "l_linestatus": pa.array(codes),
                "p_high": pa.array(p_high),
                "p_low": pa.array(p_low),
            }
        )

    merged = (
        map_key_partitions(ords.union(lines), ["key"], join_count)
        .groupby("l_linestatus")
        .aggregate(
            ray.data.aggregate.Sum("p_high", alias_name="high_line_count"),
            ray.data.aggregate.Sum("p_low", alias_name="low_line_count"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_linestatus": batch.column("l_linestatus"),
                "high_line_count": pc.cast(
                    batch.column("high_line_count"), pa.int64()
                ),
                "low_line_count": pc.cast(
                    batch.column("low_line_count"), pa.int64()
                ),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def customer_order_counts(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q13-shaped: the distribution of customers by how many orders
    they placed — INCLUDING the zero-order customers a LEFT JOIN keeps.

    Scale shape: orders pre-aggregate per-batch custkey counts, ONE
    grouped exchange produces per-customer order counts, and a second
    bounded exchange histograms them.  The zero bucket needs |customer| −
    |customers with ≥1 order|: both are scalar aggregates (a count and
    the first rollup's cardinality), so no customer row ever joins —
    the LEFT JOIN collapses to counting.

    Output: (c_count, custdist) sorted nowhere (hash compare)."""

    def opartial(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        keys, cnt = np.unique(ck, return_counts=True)
        return pa.table(
            {"custkey": pa.array(keys), "p_n": pa.array(cnt.astype(np.int64))}
        )

    per_cust = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey"]
        )
        .map_batches(opartial, batch_format="pyarrow")
        .groupby("custkey")
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n_orders"))
        .materialize()  # consumed twice (histogram + the zero-bucket
        # cardinality) — one narrow row per ordering customer
    )

    def hpartial(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("n_orders"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        keys, cnt = np.unique(n, return_counts=True)
        return pa.table(
            {
                "c_count": pa.array(keys),
                "p_d": pa.array(cnt.astype(np.int64)),
            }
        )

    hist = (
        per_cust.map_batches(hpartial, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(ray.data.aggregate.Sum("p_d", alias_name="custdist"))
    )

    # zero-order bucket: |customer| − |custkeys with orders| (two scalars)
    import pyarrow.parquet as pq

    n_cust = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    n_with = per_cust.count()
    zero = n_cust - n_with

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_count": pc.cast(batch.column("c_count"), pa.int64()),
                "custdist": pc.cast(batch.column("custdist"), pa.int64()),
            }
        )

    out = hist.map_batches(finish, batch_format="pyarrow")
    if zero > 0:
        out = out.union(
            ray.data.from_arrow(
                pa.table(
                    {
                        "c_count": pa.array([0], type=pa.int64()),
                        "custdist": pa.array([int(zero)], type=pa.int64()),
                    }
                )
            )
        )
    return out


def monthly_revenue_growth(sf_dir: str) -> "ray.data.Dataset":
    """Month-over-month revenue trend: per order month, exact total cents
    plus the growth rate vs the previous month — the LAG window pattern
    over a time rollup.

    Scale shape: per-batch (month, cents) partials → one bounded exchange
    (months in the horizon) → the lag computes inside a single partition
    pass over the sorted bounded series.  Growth in exact integer e4
    (``(rev − prev) * 1e4 // prev``; first month NULL-free with 0).

    Output: (month_us, revenue_cent, growth_e4)."""
    from .partition import map_key_partitions

    def partial(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        if isinstance(od, pa.ChunkedArray):
            od = od.combine_chunks()
        m = pc.floor_temporal(od.cast(pa.timestamp("us")), unit="month")
        price = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.floor(price * 100 + 0.5).astype(np.int64)
        t = pa.table({"month": m, "cent": pa.array(cents)})
        g = t.group_by(["month"]).aggregate([("cent", "sum")])
        return pa.table(
            {
                "month": g.column("month"),
                "p_cent": pc.cast(g.column("cent_sum"), pa.int64()),
            }
        )

    monthly = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderdate", "o_totalprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("month")
        .aggregate(ray.data.aggregate.Sum("p_cent", alias_name="revenue_cent"))
    )

    def lag_part(tbl: pa.Table) -> pa.Table:
        m_col = tbl.column("month")
        if isinstance(m_col, pa.ChunkedArray):
            m_col = m_col.combine_chunks()
        if len(tbl) == 0:
            return pa.table(
                {
                    "month_us": pa.array([], type=pa.int64()),
                    "revenue_cent": pa.array([], type=pa.int64()),
                    "growth_e4": pa.array([], type=pa.int64()),
                }
            )
        mus = m_col.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        rev = pc.cast(tbl.column("revenue_cent"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        order = np.argsort(mus)
        mus, rev = mus[order], rev[order]
        growth = np.zeros(len(rev), dtype=np.int64)
        if len(rev) > 1:
            prev = np.maximum(rev[:-1], 1)
            d = (rev[1:] - rev[:-1]) * 10_000
            # TRUNCATING division (matches DuckDB //; numpy // floors)
            growth[1:] = np.sign(d) * (np.abs(d) // prev)
        return pa.table(
            {
                "month_us": pa.array(mus),
                "revenue_cent": pa.array(rev),
                "growth_e4": pa.array(growth),
            }
        )

    # the month series is bounded — ONE partition holds it all so the lag
    # is a single sorted pass (constant key ⇒ one group)
    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "k", pa.array(np.zeros(len(batch), dtype=np.int64))
        )

    return map_key_partitions(
        monthly.map_batches(tag, batch_format="pyarrow"), ["k"], lag_part, 1
    )


def min_balance_supplier(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q2-flavored distributed ARGMIN join: for every part, the
    supplier (among those that shipped it) with the minimum account
    balance — ties break to the lowest suppkey.

    Scale shape: two keyed tag-union exchanges, no broadcast of either
    unbounded side.  Exchange 1 (suppkey) attaches the balance to the
    per-batch-distinct (partkey, suppkey) pairs; exchange 2 (partkey)
    reduces each part's run to its argmin row via one lexsort — the
    grouped-argmin pattern SQL expresses as MIN-filter-MIN.

    Output: (p_partkey, s_suppkey, acctbal_cent)."""
    from .partition import map_key_partitions, run_starts

    def pair_rows(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, pk))
        pk, sk = pk[order], sk[order]
        keep = run_starts(pk, sk) if len(pk) else np.zeros(0, dtype=bool)
        pk, sk = pk[keep], sk[keep]
        n = len(pk)
        return pa.table(
            {
                "key": pa.array(sk),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "partkey": pa.array(pk),
                "bal": pa.array(np.zeros(n, dtype=np.float64)),
            }
        )

    def supp_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "key": batch.column("s_suppkey"),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "partkey": pa.array(np.zeros(n, dtype=np.int64)),
                "bal": pc.cast(batch.column("s_acctbal"), pa.float64()),
            }
        )

    pairs = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).map_batches(pair_rows, batch_format="pyarrow")
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
    ).map_batches(supp_rows, batch_format="pyarrow")

    def attach_bal(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "partkey": pa.array([], type=pa.int64()),
                "suppkey": pa.array([], type=pa.int64()),
                "bal": pa.array([], type=pa.float64()),
            }
        )
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        if (side == 0).sum() == 0 or (side == 1).sum() == 0:
            return empty
        sup = tbl.filter(pa.array(side == 1)).sort_by("key")
        prs = tbl.filter(pa.array(side == 0))
        skey = sup.column("key").to_numpy(zero_copy_only=False)
        sbal = sup.column("bal").to_numpy(zero_copy_only=False)
        pkey = prs.column("key").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(skey, pkey), 0, len(skey) - 1)
        hit = skey[pos] == pkey
        prs = prs.filter(pa.array(hit))
        return pa.table(
            {
                "partkey": prs.column("partkey"),
                "suppkey": prs.column("key"),
                "bal": pa.array(sbal[pos[hit]]),
            }
        )

    with_bal = map_key_partitions(pairs.union(supp), ["key"], attach_bal)

    def argmin_part(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table(
                {
                    "p_partkey": pa.array([], type=pa.int64()),
                    "s_suppkey": pa.array([], type=pa.int64()),
                    "acctbal_cent": pa.array([], type=pa.int64()),
                }
            )
        pk = tbl.column("partkey").to_numpy(zero_copy_only=False)
        sk = tbl.column("suppkey").to_numpy(zero_copy_only=False)
        bal = tbl.column("bal").to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, bal, pk))
        pk, sk, bal = pk[order], sk[order], bal[order]
        first = run_starts(pk)
        return pa.table(
            {
                "p_partkey": pa.array(pk[first]),
                "s_suppkey": pa.array(sk[first]),
                "acctbal_cent": pa.array(
                    np.floor(bal[first] * 100 + 0.5).astype(np.int64)
                ),
            }
        )

    return map_key_partitions(with_bal, ["partkey"], argmin_part)


def volume_shipping(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q7-shaped nation-pair trade volume: lineitem revenue shipped
    in a two-year window, grouped by (supplier nation, customer nation,
    ship year) for cross-nation pairs.

    Scale shape — the supplier→nation attribute composes driver-side into
    one bounded sorted array (the Q5 small-dim pattern; swap for a keyed
    tag-union exchange when the supplier dimension itself is unbounded),
    while the two genuinely unbounded joins run as chained hash
    exchanges: (1) orderkey co-locates the date-filtered lineitem
    partials with their order row to pick up the custkey, (2) custkey
    co-locates those rows with the customer's nationkey.  Nation NAMES
    attach last through the 25-row nation table, so both exchanges carry
    int32 nation codes, an int16 year and int64 cents only.

    Output: (supp_nation, cust_nation, l_year, revenue_cent)."""
    import pyarrow.parquet as pq

    from .partition import map_key_partitions

    lo_us = np.datetime64("1995-01-01", "us").astype(np.int64)
    hi_us = np.datetime64("1997-01-01", "us").astype(np.int64)

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    skey = sup.column("s_suppkey").to_numpy()
    snat = sup.column("s_nationkey").to_numpy()
    s_order = np.argsort(skey)
    skey, snat = skey[s_order], snat[s_order]

    def line_rows(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate")
        if isinstance(sd, pa.ChunkedArray):
            sd = sd.combine_chunks()
        sd_us = sd.cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (sd_us >= lo_us) & (sd_us < hi_us)
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)[keep]
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)[keep]
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        cents = np.floor(price * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        year = (
            sd_us[keep]
            .astype("datetime64[us]")
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        pos = np.clip(np.searchsorted(skey, sk), 0, max(len(skey) - 1, 0))
        nat = np.where(skey[pos] == sk, snat[pos], -1).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(ok),
                "side": pa.array(np.ones(len(ok), dtype=np.int8)),
                "nat": pa.array(nat),
                "year": pa.array(year.astype(np.int16)),
                "cent": pa.array(cents),
            }
        )

    def order_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "key": batch.column("o_orderkey"),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "nat": batch.column("o_custkey"),  # custkey rides the
                # nat slot on the dim side (int64 — custkeys exceed int32
                # long before 100 TB)
                "year": pa.array(np.zeros(n, dtype=np.int16)),
                "cent": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey", "l_suppkey", "l_shipdate",
            "l_extendedprice", "l_discount",
        ],
    ).map_batches(line_rows, batch_format="pyarrow")
    ords = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(order_rows, batch_format="pyarrow")

    def pick_custkey(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "key": pa.array([], type=pa.int64()),
                "side": pa.array([], type=pa.int8()),
                "nat": pa.array([], type=pa.int64()),
                "year": pa.array([], type=pa.int16()),
                "cent": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        nat = tbl.column("nat").to_numpy(zero_copy_only=False)
        year = tbl.column("year").to_numpy(zero_copy_only=False)
        cent = tbl.column("cent").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, key))  # order row (side 0) first per key
        key, side, nat, year, cent = (
            key[order], side[order], nat[order], year[order], cent[order]
        )
        starts = np.flatnonzero(np.concatenate([[True], key[1:] != key[:-1]]))
        run_id = np.cumsum(np.concatenate([[True], key[1:] != key[:-1]])) - 1
        has_order = side[starts] == 0
        custkey = nat[starts].astype(np.int64)  # valid where has_order
        fact = (side == 1) & has_order[run_id]
        return pa.table(
            {
                "key": pa.array(custkey[run_id[fact]]),
                "side": pa.array(np.ones(int(fact.sum()), dtype=np.int8)),
                "nat": pa.array(nat[fact]),
                "year": pa.array(year[fact]),
                "cent": pa.array(cent[fact]),
            }
        )

    with_cust = map_key_partitions(lines.union(ords), ["key"], pick_custkey)

    def cust_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "key": batch.column("c_custkey"),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "nat": pc.cast(batch.column("c_nationkey"), pa.int64()),
                "year": pa.array(np.zeros(n, dtype=np.int16)),
                "cent": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(cust_rows, batch_format="pyarrow")

    def pair_partial(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "snat": pa.array([], type=pa.int32()),
                "cnat": pa.array([], type=pa.int32()),
                "l_year": pa.array([], type=pa.int64()),
                "p_cent": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        nat = tbl.column("nat").to_numpy(zero_copy_only=False)
        year = tbl.column("year").to_numpy(zero_copy_only=False)
        cent = tbl.column("cent").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, key))
        key, side, nat, year, cent = (
            key[order], side[order], nat[order], year[order], cent[order]
        )
        starts = np.flatnonzero(np.concatenate([[True], key[1:] != key[:-1]]))
        run_id = np.cumsum(np.concatenate([[True], key[1:] != key[:-1]])) - 1
        has_cust = side[starts] == 0
        cnat = nat[starts]  # valid where has_cust
        fact = (side == 1) & has_cust[run_id]
        snat_f = nat[fact]
        cnat_f = cnat[run_id[fact]]
        cross = snat_f != cnat_f
        snat_f, cnat_f = snat_f[cross], cnat_f[cross]
        year_f = year[fact][cross].astype(np.int64)
        cent_f = cent[fact][cross]
        if len(snat_f) == 0:
            return empty
        # partial per (snat, cnat, year) inside the partition
        code = (
            snat_f.astype(np.int64) * 32 * 4096
            + cnat_f.astype(np.int64) * 4096
            + (year_f - 1970)
        )
        uk, inv = np.unique(code, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, cent_f)
        return pa.table(
            {
                "snat": pa.array((uk // (32 * 4096)).astype(np.int32)),
                "cnat": pa.array(((uk // 4096) % 32).astype(np.int32)),
                "l_year": pa.array(uk % 4096 + 1970),
                "p_cent": pa.array(sums),
            }
        )

    partials = map_key_partitions(with_cust.union(cust), ["key"], pair_partial)
    # block-count hygiene (the q_tile_pagerank discipline): the exchange
    # leaves ~100 tiny partial blocks and Ray's sort-based Aggregate cost
    # scales with INPUT block count (measured 18.6 core-s over ~1.2k
    # groups here; 1.4 after the cap) — cap blocks before the aggregate
    merged = partials.repartition(8).groupby(["snat", "cnat", "l_year"]).aggregate(
        ray.data.aggregate.Sum("p_cent", alias_name="revenue_cent")
    )

    nat_tbl = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nkey = nat_tbl.column("n_nationkey").to_numpy()
    nname = np.asarray(nat_tbl.column("n_name").to_pylist(), dtype=object)
    n_order = np.argsort(nkey)
    nkey, nname = nkey[n_order], nname[n_order]

    def finish(batch: pa.Table) -> pa.Table:
        sn = batch.column("snat").to_numpy(zero_copy_only=False)
        cn = batch.column("cnat").to_numpy(zero_copy_only=False)
        sp = np.searchsorted(nkey, sn)
        cp = np.searchsorted(nkey, cn)
        return pa.table(
            {
                "supp_nation": pa.array(nname[sp].astype(str)),
                "cust_nation": pa.array(nname[cp].astype(str)),
                "l_year": pc.cast(batch.column("l_year"), pa.int64()),
                "revenue_cent": pc.cast(
                    batch.column("revenue_cent"), pa.int64()
                ),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def small_qty_revenue(sf_dir: str, brand: str = "Brand#11") -> "ray.data.Dataset":
    """TPC-H Q17-shaped: revenue from lineitems of one brand's parts whose
    quantity is below 20% of that part's average lineitem quantity — the
    correlated-subquery-per-part pattern.

    Scale shape: the brand's partkeys broadcast as one sorted array (the
    Q14 small-dim projection; selectivity 1/|brands|), the brand-filtered
    lineitem rows make ONE partkey hash exchange, and each partition
    computes its complete per-part (count, sum-qty) stats with a sorted
    ``reduceat`` pass before the per-row threshold filter — no second
    lineitem scan, no per-part dispatch.

    Exactness: quantities are integral doubles, so the predicate
    ``qty < 0.2 * avg`` is evaluated in pure int64 as
    ``5*qty*cnt < sum_qty`` — association-free and identical in SQL.

    Output: one row (revenue_cent, n_rows)."""
    import pyarrow.parquet as pq

    from .partition import map_key_partitions

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    sel = pc.equal(part.column("p_brand"), pa.scalar(brand)).to_numpy(
        zero_copy_only=False
    )
    bkeys = np.sort(part.column("p_partkey").to_numpy()[sel])

    def line_rows(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        if len(bkeys):
            pos = np.clip(np.searchsorted(bkeys, pk), 0, len(bkeys) - 1)
            keep = bkeys[pos] == pk
        else:
            keep = np.zeros(len(pk), dtype=bool)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)[keep]
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "partkey": pa.array(pk[keep]),
                "qty": pa.array(qty.astype(np.int64)),
                "cent": pa.array(
                    np.floor(price * 100 + 0.5).astype(np.int64)
                ),
            }
        )

    rows = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).map_batches(line_rows, batch_format="pyarrow")

    def threshold_partial(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.array([], type=pa.int64()),
                "p_cent": pa.array([], type=pa.int64()),
                "p_cnt": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        pk = tbl.column("partkey").to_numpy(zero_copy_only=False)
        qty = tbl.column("qty").to_numpy(zero_copy_only=False)
        cent = tbl.column("cent").to_numpy(zero_copy_only=False)
        order = np.argsort(pk, kind="stable")
        pk, qty, cent = pk[order], qty[order], cent[order]
        starts = np.flatnonzero(np.concatenate([[True], pk[1:] != pk[:-1]]))
        run_id = np.cumsum(np.concatenate([[True], pk[1:] != pk[:-1]])) - 1
        cnt = np.diff(np.append(starts, len(pk)))
        sq = np.add.reduceat(qty, starts)
        keep = 5 * qty * cnt[run_id] < sq[run_id]
        return pa.table(
            {
                "k": pa.array([0], type=pa.int64()),
                "p_cent": pa.array([int(cent[keep].sum())], type=pa.int64()),
                "p_cnt": pa.array([int(keep.sum())], type=pa.int64()),
            }
        )

    merged = (
        map_key_partitions(rows, ["partkey"], threshold_partial)
        .groupby("k")
        .aggregate(
            ray.data.aggregate.Sum("p_cent", alias_name="revenue_cent"),
            ray.data.aggregate.Sum("p_cnt", alias_name="n_rows"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "revenue_cent": pc.cast(batch.column("revenue_cent"), pa.int64()),
                "n_rows": pc.cast(batch.column("n_rows"), pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def important_parts(sf_dir: str, share_e4: int = 1) -> "ray.data.Dataset":
    """TPC-H Q11-shaped: parts whose lineitem value exceeds a fraction of
    the GLOBAL total — the aggregate-vs-global-scalar HAVING pattern.

    Scale shape: per-batch partkey partials → one grouped exchange gives
    the per-part value table (bounded by part count, ≪ lineitem count);
    the small aggregate materializes ONCE so the global total (a single
    scalar reduced by Ray's combine tree over int64 partials) and the
    filter pass both read it without re-scanning lineitem.  The filter
    compares ``value*10000 > share_e4*total`` in exact int64 — no float
    share ever computed.

    Output: (l_partkey, value_cent)."""

    def partial(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        uk, inv = np.unique(pk, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, cents)
        return pa.table({"l_partkey": pa.array(uk), "p_cent": pa.array(sums)})

    per_part = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(ray.data.aggregate.Sum("p_cent", alias_name="value_cent"))
        .map_batches(
            lambda b: pa.table(
                {
                    "l_partkey": b.column("l_partkey"),
                    "value_cent": pc.cast(b.column("value_cent"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()  # bounded: one row per part — read twice below
    )
    total = per_part.sum("value_cent")
    thresh = int(share_e4) * int(total)

    def keep(batch: pa.Table) -> pa.Table:
        v = batch.column("value_cent").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(v * 10000 > thresh))

    return per_part.map_batches(keep, batch_format="pyarrow")


def market_share(
    sf_dir: str, region: str = "ASIA", p_type: str = "STANDARD"
) -> "ray.data.Dataset":
    """TPC-H Q8-shaped market share: for STANDARD-type parts delivered to
    ASIA customers, each supplier nation's share of every order-year's
    revenue — the windowed share-of-total over a multi-join rollup.

    Scale shape: the part-type bit and the supplier→nation code broadcast
    as bounded sorted projections (Q14/Q5 patterns); the two unbounded
    joins (orders for the year+custkey, customer for the region) run as
    chained hash exchanges carrying int codes and cents only; the final
    share divides inside the BOUNDED (year × nation) aggregate in exact
    int64 e4 units.

    Output: (l_year, supp_nation, revenue_cent, share_e4)."""
    import pyarrow.parquet as pq

    from .partition import map_key_partitions

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    )
    pkey = part.column("p_partkey").to_numpy()
    is_t = pc.equal(part.column("p_type"), pa.scalar(p_type)).to_numpy(
        zero_copy_only=False
    )
    p_order = np.argsort(pkey)
    pkey, is_t = pkey[p_order], is_t[p_order]

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    skey = sup.column("s_suppkey").to_numpy()
    snat = sup.column("s_nationkey").to_numpy()
    s_order = np.argsort(skey)
    skey, snat = skey[s_order], snat[s_order]

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    reg = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    )
    rkey = reg.column("r_regionkey").to_numpy()
    rname = np.asarray(reg.column("r_name").to_pylist(), dtype=object)
    region_keys = set(rkey[rname == region].tolist())
    nkey = nat.column("n_nationkey").to_numpy()
    nname = np.asarray(nat.column("n_name").to_pylist(), dtype=object)
    nreg = nat.column("n_regionkey").to_numpy()
    n_order = np.argsort(nkey)
    nkey, nname, nreg = nkey[n_order], nname[n_order], nreg[n_order]
    in_region = np.isin(nreg, list(region_keys))

    def line_rows(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(pkey, pk), 0, max(len(pkey) - 1, 0))
        keep = (pkey[pos] == pk) & is_t[pos]
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)[keep]
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)[keep]
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        cents = np.floor(price * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        sp = np.clip(np.searchsorted(skey, sk), 0, max(len(skey) - 1, 0))
        nat_code = np.where(skey[sp] == sk, snat[sp], -1).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(ok),
                "side": pa.array(np.ones(len(ok), dtype=np.int8)),
                "a": pa.array(nat_code),
                "b": pa.array(np.zeros(len(ok), dtype=np.int64)),
                "cent": pa.array(cents),
            }
        )

    def order_rows(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        if isinstance(od, pa.ChunkedArray):
            od = od.combine_chunks()
        od_us = od.cast(pa.int64()).to_numpy(zero_copy_only=False)
        year = (
            od_us.astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64)
            + 1970
        )
        n = len(batch)
        return pa.table(
            {
                "key": batch.column("o_orderkey"),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "a": batch.column("o_custkey"),
                "b": pa.array(year),
                "cent": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_extendedprice", "l_discount",
        ],
    ).map_batches(line_rows, batch_format="pyarrow")
    ords = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(order_rows, batch_format="pyarrow")

    def join_orders(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "key": pa.array([], type=pa.int64()),
                "side": pa.array([], type=pa.int8()),
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
                "cent": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        a = tbl.column("a").to_numpy(zero_copy_only=False)
        b = tbl.column("b").to_numpy(zero_copy_only=False)
        cent = tbl.column("cent").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, key))
        key, side, a, b, cent = (
            key[order], side[order], a[order], b[order], cent[order]
        )
        starts = np.flatnonzero(np.concatenate([[True], key[1:] != key[:-1]]))
        run_id = np.cumsum(np.concatenate([[True], key[1:] != key[:-1]])) - 1
        has_ord = side[starts] == 0
        custkey = a[starts]
        year = b[starts]
        fact = (side == 1) & has_ord[run_id]
        # re-key by custkey; a carries supplier nation, b the year
        return pa.table(
            {
                "key": pa.array(custkey[run_id[fact]]),
                "side": pa.array(np.ones(int(fact.sum()), dtype=np.int8)),
                "a": pa.array(a[fact]),
                "b": pa.array(year[run_id[fact]]),
                "cent": pa.array(cent[fact]),
            }
        )

    with_year = map_key_partitions(lines.union(ords), ["key"], join_orders)

    def cust_rows(batch: pa.Table) -> pa.Table:
        cn = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(nkey, cn)
        keep = in_region[pos]
        n = int(keep.sum())
        return pa.table(
            {
                "key": batch.column("c_custkey").filter(pa.array(keep)),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "a": pa.array(np.zeros(n, dtype=np.int64)),
                "b": pa.array(np.zeros(n, dtype=np.int64)),
                "cent": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(cust_rows, batch_format="pyarrow")

    def region_partial(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "l_year": pa.array([], type=pa.int64()),
                "snat": pa.array([], type=pa.int64()),
                "p_cent": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        a = tbl.column("a").to_numpy(zero_copy_only=False)
        b = tbl.column("b").to_numpy(zero_copy_only=False)
        cent = tbl.column("cent").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, key))
        key, side, a, b, cent = (
            key[order], side[order], a[order], b[order], cent[order]
        )
        starts = np.flatnonzero(np.concatenate([[True], key[1:] != key[:-1]]))
        run_id = np.cumsum(np.concatenate([[True], key[1:] != key[:-1]])) - 1
        in_reg = side[starts] == 0  # the customer row exists ⇒ in region
        fact = (side == 1) & in_reg[run_id]
        if not fact.any():
            return empty
        code = b[fact] * 64 + a[fact]  # (year, nation) pack
        uk, inv = np.unique(code, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, cent[fact])
        return pa.table(
            {
                "l_year": pa.array(uk // 64),
                "snat": pa.array(uk % 64),
                "p_cent": pa.array(sums),
            }
        )

    merged = (
        map_key_partitions(with_year.union(cust), ["key"], region_partial)
        .groupby(["l_year", "snat"])
        .aggregate(ray.data.aggregate.Sum("p_cent", alias_name="revenue_cent"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        # bounded: |years| × |nations| rows — the share divides in-batch
        # only when the whole aggregate is one block; repartition(1)
        # guarantees that below.
        yr = batch.column("l_year").to_numpy(zero_copy_only=False)
        sn = batch.column("snat").to_numpy(zero_copy_only=False)
        cent = pc.cast(batch.column("revenue_cent"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        uy, inv = np.unique(yr, return_inverse=True)
        tot = np.zeros(len(uy), dtype=np.int64)
        np.add.at(tot, inv, cent)
        share = cent * 10000 // tot[inv]
        pos = np.searchsorted(nkey, sn)
        return pa.table(
            {
                "l_year": pa.array(yr),
                "supp_nation": pa.array(nname[pos].astype(str)),
                "revenue_cent": pa.array(cent),
                "share_e4": pa.array(share),
            }
        )

    return merged.repartition(1).map_batches(finish, batch_format="pyarrow")


def sales_opportunity(
    sf_dir: str, cutoff: str = "2000-06-01"
) -> "ray.data.Dataset":
    """TPC-H Q22-shaped: per nation, the count and total balance of
    above-average-balance customers with NO recent order — the
    anti-join-plus-global-scalar prospect list.

    Scale shape: the positive-balance average reduces to TWO int64
    scalars (sum of cents, count) through per-batch partials — the
    predicate ``bal > avg`` evaluates as ``bal_cent * n > sum_cent`` in
    exact integer math, no float division anywhere.  The anti-join is the
    one-custkey-exchange pattern of :func:`customers_no_orders` (orders
    pre-shrink to per-batch distinct recent custkeys).  Nation names
    attach from the bounded 25-row table.

    Output: (cust_nation, n_cust, sum_bal_cent)."""
    import pyarrow.parquet as pq

    from .partition import map_key_partitions

    cut_us = np.datetime64(cutoff, "us").astype(np.int64)

    def bal_partial(batch: pa.Table) -> pa.Table:
        bal = batch.column("c_acctbal").to_numpy(zero_copy_only=False)
        cents = np.floor(bal * 100 + 0.5).astype(np.int64)
        pos = cents > 0
        return pa.table(
            {
                "k": pa.array([0], type=pa.int64()),
                "p_s": pa.array([int(cents[pos].sum())], type=pa.int64()),
                "p_n": pa.array([int(pos.sum())], type=pa.int64()),
            }
        )

    scal = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_acctbal"]
        )
        .map_batches(bal_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(
            ray.data.aggregate.Sum("p_s", alias_name="s"),
            ray.data.aggregate.Sum("p_n", alias_name="n"),
        )
        .take_all()  # exactly one row of two int64 scalars
    )
    sum_cent = int(scal[0]["s"]) if scal else 0
    n_pos = int(scal[0]["n"]) if scal else 0

    def cust_rows(batch: pa.Table) -> pa.Table:
        bal = batch.column("c_acctbal").to_numpy(zero_copy_only=False)
        cents = np.floor(bal * 100 + 0.5).astype(np.int64)
        keep = cents * n_pos > sum_cent
        n = int(keep.sum())
        return pa.table(
            {
                "key": batch.column("c_custkey").filter(pa.array(keep)),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "nat": pa.array(
                    pc.cast(
                        batch.column("c_nationkey").filter(pa.array(keep)),
                        pa.int64(),
                    )
                ),
                "bal_cent": pa.array(cents[keep]),
            }
        )

    def order_rows(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        if isinstance(od, pa.ChunkedArray):
            od = od.combine_chunks()
        od_us = od.cast(pa.int64()).to_numpy(zero_copy_only=False)
        keys = np.unique(
            batch.column("o_custkey").to_numpy(zero_copy_only=False)[
                od_us >= cut_us
            ]
        )
        return pa.table(
            {
                "key": pa.array(keys),
                "side": pa.array(np.ones(len(keys), dtype=np.int8)),
                "nat": pa.array(np.zeros(len(keys), dtype=np.int64)),
                "bal_cent": pa.array(np.zeros(len(keys), dtype=np.int64)),
            }
        )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    ).map_batches(cust_rows, batch_format="pyarrow")
    ords = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(order_rows, batch_format="pyarrow")

    def anti_partial(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "nat": pa.array([], type=pa.int64()),
                "p_n": pa.array([], type=pa.int64()),
                "p_bal": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        nat = tbl.column("nat").to_numpy(zero_copy_only=False)
        bal = tbl.column("bal_cent").to_numpy(zero_copy_only=False)
        probe = np.unique(key[side == 1])
        keep = (side == 0) & ~np.isin(key, probe)
        if not keep.any():
            return empty
        un, inv = np.unique(nat[keep], return_inverse=True)
        cnt = np.bincount(inv)
        sums = np.zeros(len(un), dtype=np.int64)
        np.add.at(sums, inv, bal[keep])
        return pa.table(
            {
                "nat": pa.array(un),
                "p_n": pa.array(cnt.astype(np.int64)),
                "p_bal": pa.array(sums),
            }
        )

    merged = (
        map_key_partitions(cust.union(ords), ["key"], anti_partial)
        .groupby("nat")
        .aggregate(
            ray.data.aggregate.Sum("p_n", alias_name="n_cust"),
            ray.data.aggregate.Sum("p_bal", alias_name="sum_bal_cent"),
        )
    )

    nat_tbl = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nkey = nat_tbl.column("n_nationkey").to_numpy()
    nname = np.asarray(nat_tbl.column("n_name").to_pylist(), dtype=object)
    n_order = np.argsort(nkey)
    nkey, nname = nkey[n_order], nname[n_order]

    def finish(batch: pa.Table) -> pa.Table:
        nt = batch.column("nat").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(nkey, nt)
        return pa.table(
            {
                "cust_nation": pa.array(nname[pos].astype(str)),
                "n_cust": pc.cast(batch.column("n_cust"), pa.int64()),
                "sum_bal_cent": pc.cast(
                    batch.column("sum_bal_cent"), pa.int64()
                ),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def nation_trade_balance(sf_dir: str) -> "ray.data.Dataset":
    """Nation trade balance derived from the Q7 volume aggregate: every
    nation's exports (revenue it supplied cross-nation) minus imports
    (revenue its customers bought cross-nation) — operator COMPOSITION
    over :func:`volume_shipping`'s bounded output, the pattern for
    dashboard metrics layered on a shared rollup.

    Scale shape: the input is already the bounded (nation² × years)
    aggregate; each row splits into a +export and a −import contribution
    and ONE tiny grouped exchange nets them per nation.

    Output: (nation, export_cent, import_cent, balance_cent)."""

    def flip(batch: pa.Table) -> pa.Table:
        cent = batch.column("revenue_cent").to_numpy(zero_copy_only=False)
        zero = np.zeros(len(batch), dtype=np.int64)
        exp_rows = pa.table(
            {
                "nation": batch.column("supp_nation"),
                "p_exp": pa.array(cent),
                "p_imp": pa.array(zero),
            }
        )
        imp_rows = pa.table(
            {
                "nation": batch.column("cust_nation"),
                "p_exp": pa.array(zero),
                "p_imp": pa.array(cent),
            }
        )
        return pa.concat_tables([exp_rows, imp_rows])

    merged = (
        volume_shipping(sf_dir)
        .map_batches(flip, batch_format="pyarrow")
        .groupby("nation")
        .aggregate(
            ray.data.aggregate.Sum("p_exp", alias_name="export_cent"),
            ray.data.aggregate.Sum("p_imp", alias_name="import_cent"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        e = pc.cast(batch.column("export_cent"), pa.int64())
        i = pc.cast(batch.column("import_cent"), pa.int64())
        return pa.table(
            {
                "nation": batch.column("nation"),
                "export_cent": e,
                "import_cent": i,
                "balance_cent": pc.subtract(e, i),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def blame_supplier(
    sf_dir: str, grace_days: int = 90, k: int = 10
) -> "ray.data.Dataset":
    """TPC-H Q21-shaped: suppliers most often responsible for an order's
    LATEST (and late) shipment — for every late order, the supplier whose
    line shipped last (ties → smallest suppkey) takes the blame; top-k
    suppliers by blame count.

    Scale shape: the per-order argmax reduces ASSOCIATIVELY — each
    lineitem batch pre-reduces to one (orderkey, max shipdate, argmin
    suppkey at that max) row, so the ONE orderkey exchange carries a row
    per (batch, orderkey); the partition pass finishes the argmax with a
    lexsort + run-boundary pick, joins the order date, applies the
    lateness predicate, and emits bounded per-supplier partials.  Top-k
    sorts the per-supplier aggregate only.

    Output: (s_suppkey, n_blamed)."""
    from .partition import map_key_partitions

    DAY_US = np.int64(86_400_000_000)

    def order_rows(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        if isinstance(od, pa.ChunkedArray):
            od = od.combine_chunks()
        n = len(batch)
        return pa.table(
            {
                "key": batch.column("o_orderkey"),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "ts_us": od.cast(pa.int64()),
                "suppkey": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    def line_partial(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate")
        if isinstance(sd, pa.ChunkedArray):
            sd = sd.combine_chunks()
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        ts = sd.cast(pa.int64()).to_numpy(zero_copy_only=False)
        # per-batch argmax: sort by (orderkey, -shipdate, suppkey), keep
        # the first row of each orderkey run — the associative partial
        order = np.lexsort((sk, -ts, ok))
        ok, sk, ts = ok[order], sk[order], ts[order]
        first = np.concatenate([[True], ok[1:] != ok[:-1]])
        return pa.table(
            {
                "key": pa.array(ok[first]),
                "side": pa.array(np.ones(int(first.sum()), dtype=np.int8)),
                "ts_us": pa.array(ts[first]),
                "suppkey": pa.array(sk[first]),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(order_rows, batch_format="pyarrow")
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).map_batches(line_partial, batch_format="pyarrow")

    def blame_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "s_suppkey": pa.array([], type=pa.int64()),
                "p_n": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        ts = tbl.column("ts_us").to_numpy(zero_copy_only=False)
        sk = tbl.column("suppkey").to_numpy(zero_copy_only=False)
        # order row (side 0) first, then line partials by (-ts, suppkey):
        # row AFTER the order row is the order's global argmax line
        order = np.lexsort((sk, -ts, side, key))
        key, side, ts, sk = key[order], side[order], ts[order], sk[order]
        starts = np.flatnonzero(np.concatenate([[True], key[1:] != key[:-1]]))
        n_rows = np.diff(np.append(starts, len(key)))
        has_both = (side[starts] == 0) & (n_rows > 1)
        odate = ts[starts]
        win_ts = ts[np.minimum(starts + 1, len(key) - 1)]
        win_sk = sk[np.minimum(starts + 1, len(key) - 1)]
        late = has_both & (win_ts > odate + np.int64(grace_days) * DAY_US)
        if not late.any():
            return empty
        uk, inv = np.unique(win_sk[late], return_inverse=True)
        cnt = np.bincount(inv)
        return pa.table(
            {
                "s_suppkey": pa.array(uk),
                "p_n": pa.array(cnt.astype(np.int64)),
            }
        )

    merged = (
        map_key_partitions(orders.union(lines), ["key"], blame_part)
        .groupby("s_suppkey")
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n_blamed"))
        .map_batches(
            lambda b: pa.table(
                {
                    "s_suppkey": b.column("s_suppkey"),
                    "n_blamed": pc.cast(b.column("n_blamed"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    return merged.sort(["n_blamed", "s_suppkey"], descending=[True, False]).limit(k)


def spend_deciles(sf_dir: str) -> "ray.data.Dataset":
    """Customer-lifetime-value decile thresholds: the EXACT spend values
    splitting customers into ten equal ranks — the general-domain order
    statistic (per-customer cents have ~1e8 distinct values, far past
    the direct-histogram trick), computed by the two-pass bucket
    refinement in :mod:`..pipelines.selection` with bounded driver
    state and no sort.

    Output: (decile, rank, threshold_cent) for deciles 1..9."""
    from .selection import exact_value_ranks

    def partial(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        price = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.floor(price * 100 + 0.5).astype(np.int64)
        uk, inv = np.unique(ck, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, cents)
        return pa.table({"custkey": pa.array(uk), "p_c": pa.array(sums)})

    per_cust = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("custkey")
        .aggregate(ray.data.aggregate.Sum("p_c", alias_name="s"))
        .map_batches(
            lambda b: pa.table({"spend": pc.cast(b.column("s"), pa.int64())}),
            batch_format="pyarrow",
        )
        .materialize()  # bounded: one row per customer WITH orders —
        # scanned twice by the two selection passes
    )
    n = per_cust.count()
    ranks = {d: (d * n + 9) // 10 for d in range(1, 10)}
    thr = exact_value_ranks(per_cust, "spend", list(ranks.values()))
    return ray.data.from_arrow(
        pa.table(
            {
                "decile": pa.array(list(range(1, 10)), type=pa.int64()),
                "rank": pa.array(
                    [ranks[d] for d in range(1, 10)], type=pa.int64()
                ),
                "threshold_cent": pa.array(
                    [thr[ranks[d]] for d in range(1, 10)], type=pa.int64()
                ),
            }
        )
    )


def order_gap_histogram(sf_dir: str) -> "ray.data.Dataset":
    """Distribution of days between a customer's consecutive orders —
    the re-engagement-cadence histogram (LAG window → bounded rollup).

    Scale shape: one custkey hash exchange; per partition one lexsort by
    (custkey, orderdate, orderkey) and a vectorized diff at run
    boundaries; only bounded (gap_days, count) partials leave the
    partition (the gap domain is bounded by the time horizon).

    Output: (gap_days, n_pairs)."""
    from .partition import map_key_partitions

    DAY_US = np.int64(86_400_000_000)

    def project(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        if isinstance(od, pa.ChunkedArray):
            od = od.combine_chunks()
        return pa.table(
            {
                "o_custkey": batch.column("o_custkey"),
                "odate_us": od.cast(pa.int64()),
                "o_orderkey": batch.column("o_orderkey"),
            }
        )

    rows = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"],
    ).map_batches(project, batch_format="pyarrow")

    def gaps_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "gap_days": pa.array([], type=pa.int64()),
                "p_n": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        ck = tbl.column("o_custkey").to_numpy(zero_copy_only=False)
        od = tbl.column("odate_us").to_numpy(zero_copy_only=False)
        ok = tbl.column("o_orderkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, od, ck))
        ck, od = ck[order], od[order]
        same = ck[1:] == ck[:-1]
        gaps = (od[1:] - od[:-1])[same] // DAY_US
        if len(gaps) == 0:
            return empty
        uk, cnt = np.unique(gaps, return_counts=True)
        return pa.table(
            {
                "gap_days": pa.array(uk),
                "p_n": pa.array(cnt.astype(np.int64)),
            }
        )

    merged = (
        map_key_partitions(rows, ["o_custkey"], gaps_part)
        .groupby("gap_days")
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n_pairs"))
    )
    return merged.map_batches(
        lambda b: pa.table(
            {
                "gap_days": b.column("gap_days"),
                "n_pairs": pc.cast(b.column("n_pairs"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def yearly_top_supplier(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q15-shaped: each ship-year's top supplier by revenue (ties →
    smallest suppkey) — argmax over a grouped rollup.

    Scale shape: per-batch (year, suppkey) integer-cent partials → one
    grouped exchange builds the (years × shipping suppliers) aggregate →
    a year-keyed partition pass picks each year's argmax with one
    lexsort (years are bounded, and a year's group holds one ROW per
    supplier — aggregate rows, never lineitems, so the hot-key group is
    16 B × suppliers at worst).

    Output: (l_year, s_suppkey, revenue_cent)."""
    from .partition import map_key_partitions

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate")
        if isinstance(sd, pa.ChunkedArray):
            sd = sd.combine_chunks()
        sd_us = sd.cast(pa.int64()).to_numpy(zero_copy_only=False)
        year = (
            sd_us.astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64)
            + 1970
        )
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        code = year * 1_000_000_000 + sk  # suppkey < 1e9 at every test sf;
        # the general-scale pack is (year, suppkey) as two groupby keys —
        # used below for the exchange, the pack is batch-local only
        uk, inv = np.unique(code, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, cents)
        return pa.table(
            {
                "l_year": pa.array(uk // 1_000_000_000),
                "s_suppkey": pa.array(uk % 1_000_000_000),
                "p_cent": pa.array(sums),
            }
        )

    per_ys = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_shipdate", "l_suppkey", "l_extendedprice", "l_discount",
            ],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_year", "s_suppkey"])
        .aggregate(ray.data.aggregate.Sum("p_cent", alias_name="revenue_cent"))
    )

    def argmax_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "l_year": pa.array([], type=pa.int64()),
                "s_suppkey": pa.array([], type=pa.int64()),
                "revenue_cent": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        yr = tbl.column("l_year").to_numpy(zero_copy_only=False)
        sk = tbl.column("s_suppkey").to_numpy(zero_copy_only=False)
        rev = pc.cast(tbl.column("revenue_cent"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((sk, -rev, yr))
        yr, sk, rev = yr[order], sk[order], rev[order]
        first = np.concatenate([[True], yr[1:] != yr[:-1]])
        return pa.table(
            {
                "l_year": pa.array(yr[first]),
                "s_suppkey": pa.array(sk[first]),
                "revenue_cent": pa.array(rev[first]),
            }
        )

    return map_key_partitions(per_ys, ["l_year"], argmax_part)


def discounted_revenue(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q19-shaped: revenue from three OR-ed (brand, size-range,
    quantity-range) predicate groups — the disjunctive-pushdown scan.

    Scale shape: the part attributes needed by the predicate (brand
    code, size) broadcast as ONE sorted bounded projection; each
    lineitem batch evaluates all three predicate groups vectorized and
    emits a single (cents, count) partial row — no shuffle at all beyond
    the one-row combine (the Q6 family with a dimension probe).

    Output: one row (revenue_cent, n_rows)."""
    import pyarrow.parquet as pq

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    pkey = part.column("p_partkey").to_numpy()
    brands = np.asarray(part.column("p_brand").to_pylist(), dtype=object)
    sizes = part.column("p_size").to_numpy()
    order = np.argsort(pkey)
    pkey, brands, sizes = pkey[order], brands[order], sizes[order]
    b12 = brands == "Brand#12"
    b23 = brands == "Brand#23"
    b34 = brands == "Brand#34"

    def partial(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(pkey, pk), 0, max(len(pkey) - 1, 0))
        hit = pkey[pos] == pk
        sz = sizes[pos]
        g1 = hit & b12[pos] & (sz >= 1) & (sz <= 5) & (qty >= 1) & (qty <= 11)
        g2 = hit & b23[pos] & (sz >= 1) & (sz <= 10) & (qty >= 10) & (qty <= 20)
        g3 = hit & b34[pos] & (sz >= 1) & (sz <= 15) & (qty >= 20) & (qty <= 30)
        keep = g1 | g2 | g3
        cents = np.floor(
            price[keep] * (1.0 - disc[keep]) * 100 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "k": pa.array([0], type=pa.int64()),
                "p_cent": pa.array([int(cents.sum())], type=pa.int64()),
                "p_cnt": pa.array([int(keep.sum())], type=pa.int64()),
            }
        )

    merged = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_partkey", "l_quantity", "l_extendedprice", "l_discount",
            ],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(
            ray.data.aggregate.Sum("p_cent", alias_name="revenue_cent"),
            ray.data.aggregate.Sum("p_cnt", alias_name="n_rows"),
        )
    )
    return merged.map_batches(
        lambda b: pa.table(
            {
                "revenue_cent": pc.cast(b.column("revenue_cent"), pa.int64()),
                "n_rows": pc.cast(b.column("n_rows"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def revenue_rollup(sf_dir: str) -> "ray.data.Dataset":
    """GROUPING-SETS rollup in ONE pass: supplier-nation × ship-year
    revenue at all four grouping levels — (nation, year), (nation),
    (year) and grand total — the OLAP cube pattern without four scans.

    Scale shape: each batch's (nation, year) partials EXPAND to the four
    level-tagged rows before the exchange (4× a bounded aggregate, not
    4× lineitems), so one grouped exchange finishes every level
    simultaneously.  ALL markers use sentinel codes (-1) rather than
    NULL keys — Ray's hash groupby and the oracle's GROUPING SETS then
    agree exactly after the same COALESCE.

    Output: (n_name, l_year, revenue_cent) with 'ALL' / -1 markers."""
    import pyarrow.parquet as pq

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    skey = sup.column("s_suppkey").to_numpy()
    snat = sup.column("s_nationkey").to_numpy()
    s_order = np.argsort(skey)
    skey, snat = skey[s_order], snat[s_order]

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate")
        if isinstance(sd, pa.ChunkedArray):
            sd = sd.combine_chunks()
        sd_us = sd.cast(pa.int64()).to_numpy(zero_copy_only=False)
        year = (
            sd_us.astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64)
            + 1970
        )
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        pos = np.clip(np.searchsorted(skey, sk), 0, max(len(skey) - 1, 0))
        nat = np.where(skey[pos] == sk, snat[pos], -2).astype(np.int64)
        code = nat * 4096 + (year - 1970)
        uk, inv = np.unique(code, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, cents)
        n0, y0 = uk // 4096, uk % 4096 + 1970
        # expand to the four grouping levels before the exchange
        nat4 = np.concatenate([n0, n0, np.full(len(uk), -1), [-1]])
        yr4 = np.concatenate([y0, np.full(len(uk), -1), y0, [-1]])
        s4 = np.concatenate([sums, sums, sums, [sums.sum()]])
        # collapse the batch-local duplicates the expansion introduced
        code4 = (nat4 + 2) * 8192 + (yr4 + 2)
        uk4, inv4 = np.unique(code4, return_inverse=True)
        out = np.zeros(len(uk4), dtype=np.int64)
        np.add.at(out, inv4, s4)
        return pa.table(
            {
                "nat": pa.array(uk4 // 8192 - 2),
                "l_year": pa.array(uk4 % 8192 - 2),
                "p_cent": pa.array(out),
            }
        )

    merged = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_shipdate", "l_suppkey", "l_extendedprice", "l_discount",
            ],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["nat", "l_year"])
        .aggregate(ray.data.aggregate.Sum("p_cent", alias_name="revenue_cent"))
    )

    nat_tbl = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nkey = nat_tbl.column("n_nationkey").to_numpy()
    nname = np.asarray(nat_tbl.column("n_name").to_pylist(), dtype=object)
    n_order = np.argsort(nkey)
    nkey, nname = nkey[n_order], nname[n_order]

    def finish(batch: pa.Table) -> pa.Table:
        nt = batch.column("nat").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(nkey, nt), 0, len(nkey) - 1)
        names = np.where(nt == -1, "ALL", nname[pos].astype(str))
        return pa.table(
            {
                "n_name": pa.array(names.astype(str)),
                "l_year": pc.cast(batch.column("l_year"), pa.int64()),
                "revenue_cent": pc.cast(
                    batch.column("revenue_cent"), pa.int64()
                ),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def cohort_retention(sf_dir: str) -> "ray.data.Dataset":
    """Customer cohort retention matrix: customers grouped by their FIRST
    order month (the cohort), counted in every subsequent month they stay
    active — the (cohort, months-since) triangle behind retention curves.

    Scale shape: ONE customer-keyed exchange does everything — per-batch
    distinct (custkey, order-month) partials shrink the wire to at most
    one row per active customer-month; inside each hash partition the
    cohort month is the head of each customer's sorted run, and the
    (cohort, months_since) cells reduce to packed-key unique/count
    partials; one tiny cell-level groupby sums them.  A customer appears
    at most once per (cohort, months_since) cell by construction, so the
    partial counts ARE distinct-customer counts — no COUNT DISTINCT
    exchange.  Output: (cohort_ym, months_since, n_customers); cohort_ym
    = year*12 + month."""
    from .partition import map_key_partitions, run_starts

    def partial(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        if isinstance(od, pa.ChunkedArray):
            od = od.combine_chunks()
        y = pc.year(od).to_numpy(zero_copy_only=False).astype(np.int64)
        m = pc.month(od).to_numpy(zero_copy_only=False).astype(np.int64)
        ym = y * 12 + m
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((ym, ck))
        ck, ym = ck[order], ym[order]
        keep = run_starts(ck, ym)
        return pa.table({"ck": pa.array(ck[keep]), "ym": pa.array(ym[keep])})

    def per_customer(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {"cell": pa.array([], type=pa.int64()),
             "p_n": pa.array([], type=pa.int64())}
        )
        if len(tbl) == 0:
            return empty
        ck = tbl.column("ck").to_numpy(zero_copy_only=False)
        ym = tbl.column("ym").to_numpy(zero_copy_only=False)
        order = np.lexsort((ym, ck))
        ck, ym = ck[order], ym[order]
        starts = run_starts(ck, ym)
        ck, ym = ck[starts], ym[starts]
        cstart = run_starts(ck)
        first = np.nonzero(cstart)[0]
        runs = np.diff(np.append(first, len(ck)))
        fym = np.repeat(ym[cstart], runs)  # cohort month per row
        ms = ym - fym
        cell = fym * np.int64(1024) + ms  # months_since < 1024 by horizon
        uniq, cnt = np.unique(cell, return_counts=True)
        return pa.table(
            {"cell": pa.array(uniq), "p_n": pa.array(cnt.astype(np.int64))}
        )

    rows = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
        )
        .map_batches(partial, batch_format="pyarrow")
    )
    cells = map_key_partitions(rows, ["ck"], per_customer)
    summed = cells.groupby("cell").aggregate(
        ray.data.aggregate.Sum("p_n", alias_name="n_customers")
    )

    def finish(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cohort_ym": pa.array(cell // 1024),
                "months_since": pa.array(cell % 1024),
                "n_customers": pc.cast(batch.column("n_customers"), pa.int64()),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")


def product_profit(sf_dir: str, part_like: str = "red") -> "ray.data.Dataset":
    """TPC-H Q9-shaped product-type profit: for lineitems of parts whose
    name contains ``part_like``, profit = revenue − (part retail price ×
    quantity), rolled up by the SUPPLIER's nation and the ORDER year.
    (The reference TPC-H Q9 prices cost from ``partsupp.ps_supplycost``;
    the driver's corpus has no partsupp table, so the part's retail price
    stands in as the unit cost — the join/rollup shape is Q9's.)

    Scale shape: the part filter + unit cost and the supplier→nation
    attribute are bounded dimensions composed driver-side into sorted
    lookup arrays (the Q5 pattern); the one genuinely unbounded join —
    lineitem ⋈ orders for the order YEAR — runs as a single keyed
    tag-union exchange on orderkey, carrying only (nat:int64, year:int16,
    profit_cent:int64) per fact row, with per-(nation, year) partials
    reduced inside each partition before the final 25×N_years groupby.

    Integer-exact: profit_cent = floor(price·(1−disc)·100 + .5)
    − floor(retail·100 + .5)·floor(qty + .5), summed in int64.

    Output: (nation, o_year, profit_cent)."""
    import pyarrow.parquet as pq

    from .partition import map_key_partitions

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_retailprice"]
    )
    m = pc.match_substring(part.column("p_name"), part_like)
    part = part.filter(m)
    pkey = part.column("p_partkey").to_numpy()
    p_order = np.argsort(pkey)
    pkey = pkey[p_order]
    pcost = np.floor(
        part.column("p_retailprice").to_numpy()[p_order] * 100 + 0.5
    ).astype(np.int64)

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    skey = sup.column("s_suppkey").to_numpy()
    snat = sup.column("s_nationkey").to_numpy()
    s_order = np.argsort(skey)
    skey, snat = skey[s_order], snat[s_order]

    def line_rows(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(pkey, pk), 0, max(len(pkey) - 1, 0))
        keep = len(pkey) > 0 and pkey[pos] == pk
        if np.ndim(keep) == 0:  # len(pkey) == 0
            keep = np.zeros(len(batch), dtype=bool)
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)[keep]
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)[keep]
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)[keep]
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)[keep]
        rev = np.floor(price * (1.0 - disc) * 100 + 0.5).astype(np.int64)
        cost = pcost[pos[keep]] * np.floor(qty + 0.5).astype(np.int64)
        sp = np.clip(np.searchsorted(skey, sk), 0, max(len(skey) - 1, 0))
        nat = np.where(skey[sp] == sk, snat[sp], -1).astype(np.int64)
        m = nat >= 0  # inner-join semantics: unmatched supplier drops the row
        return pa.table(
            {
                "key": pa.array(ok[m]),
                "side": pa.array(np.ones(int(m.sum()), dtype=np.int8)),
                "nat": pa.array(nat[m]),
                "year": pa.array(np.zeros(int(m.sum()), dtype=np.int16)),
                "cent": pa.array((rev - cost)[m]),
            }
        )

    def order_rows(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        if isinstance(od, pa.ChunkedArray):
            od = od.combine_chunks()
        year = (
            od.cast(pa.int64()).to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64)
            + 1970
        )
        n = len(batch)
        return pa.table(
            {
                "key": batch.column("o_orderkey"),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "nat": pa.array(np.zeros(n, dtype=np.int64)),
                "year": pa.array(year.astype(np.int16)),
                "cent": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice", "l_discount",
        ],
    ).map_batches(line_rows, batch_format="pyarrow")
    ords = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(order_rows, batch_format="pyarrow")

    def year_partial(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "nat": pa.array([], type=pa.int64()),
                "o_year": pa.array([], type=pa.int64()),
                "p_cent": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        nat = tbl.column("nat").to_numpy(zero_copy_only=False)
        year = tbl.column("year").to_numpy(zero_copy_only=False)
        cent = tbl.column("cent").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, key))  # order row (side 0) first per key
        key, side, nat, year, cent = (
            key[order], side[order], nat[order], year[order], cent[order]
        )
        new = np.concatenate([[True], key[1:] != key[:-1]])
        starts = np.flatnonzero(new)
        run_id = np.cumsum(new) - 1
        has_order = side[starts] == 0
        o_year = year[starts].astype(np.int64)  # valid where has_order
        fact = (side == 1) & has_order[run_id]
        if not fact.any():
            return empty
        code = nat[fact] * 4096 + (o_year[run_id[fact]] - 1970)
        uk, inv = np.unique(code, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, cent[fact])
        return pa.table(
            {
                "nat": pa.array(uk // 4096),
                "o_year": pa.array(uk % 4096 + 1970),
                "p_cent": pa.array(sums),
            }
        )

    partials = map_key_partitions(lines.union(ords), ["key"], year_partial)
    merged = partials.groupby(["nat", "o_year"]).aggregate(
        ray.data.aggregate.Sum("p_cent", alias_name="profit_cent")
    )

    nat_tbl = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nkey = nat_tbl.column("n_nationkey").to_numpy()
    nname = np.asarray(nat_tbl.column("n_name").to_pylist(), dtype=object)
    n_order = np.argsort(nkey)
    nkey, nname = nkey[n_order], nname[n_order]

    def finish(batch: pa.Table) -> pa.Table:
        nt = batch.column("nat").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(nkey, nt), 0, max(len(nkey) - 1, 0))
        return pa.table(
            {
                "nation": pa.array(nname[pos].astype(str)),
                "o_year": pc.cast(batch.column("o_year"), pa.int64()),
                "profit_cent": pc.cast(batch.column("profit_cent"), pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def promo_suppliers(sf_dir: str, part_like: str = "small") -> "ray.data.Dataset":
    """TPC-H Q20-shaped potential-promotion suppliers: suppliers who, for
    at least one part whose name starts with ``part_like``, shipped MORE
    quantity inside 1995 than in all other years combined (2·qty_1995 >
    qty_total — the reference Q20 compares ``ps_availqty`` against half
    the window's shipped quantity; with no partsupp table in the corpus,
    the all-time shipped quantity stands in for stock on hand, keeping
    the correlated-threshold + semi-join shape).

    Scale shape: the part-name filter broadcasts as a sorted partkey
    array; per-batch partials pre-sum (qty_1995, qty_total) per
    (partkey, suppkey) so the one groupby exchange carries two int64s
    per distinct pair; qualifying pairs reduce to DISTINCT suppkeys via a
    second (tiny, supplier-bounded) groupby; names attach from the
    bounded supplier/nation dimensions.

    Integer-exact throughout (quantities floor(q+.5), doubled compare).

    Output: (s_name, n_name) — one row per qualifying supplier."""
    import pyarrow.parquet as pq

    lo_us = np.datetime64("1995-01-01", "us").astype(np.int64)
    hi_us = np.datetime64("1996-01-01", "us").astype(np.int64)

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])
    part = part.filter(pc.starts_with(part.column("p_name"), part_like))
    pkey = np.sort(part.column("p_partkey").to_numpy())

    def pair_partial(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(pkey, pk), 0, max(len(pkey) - 1, 0))
        keep = (pkey[pos] == pk) if len(pkey) else np.zeros(len(batch), bool)
        if not keep.any():
            return pa.table(
                {
                    "pk": pa.array([], type=pa.int64()),
                    "sk": pa.array([], type=pa.int64()),
                    "q95": pa.array([], type=pa.int64()),
                    "qall": pa.array([], type=pa.int64()),
                }
            )
        pk = pk[keep]
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)[keep]
        qty = np.floor(
            batch.column("l_quantity").to_numpy(zero_copy_only=False)[keep] + 0.5
        ).astype(np.int64)
        sd = batch.column("l_shipdate")
        if isinstance(sd, pa.ChunkedArray):
            sd = sd.combine_chunks()
        sd_us = sd.cast(pa.int64()).to_numpy(zero_copy_only=False)[keep]
        in95 = ((sd_us >= lo_us) & (sd_us < hi_us)).astype(np.int64)
        order = np.lexsort((sk, pk))
        pk, sk, qty, in95 = pk[order], sk[order], qty[order], in95[order]
        new = np.concatenate(
            [[True], (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])]
        )
        idx = np.flatnonzero(new)
        return pa.table(
            {
                "pk": pa.array(pk[idx]),
                "sk": pa.array(sk[idx]),
                "q95": pa.array(np.add.reduceat(qty * in95, idx)),
                "qall": pa.array(np.add.reduceat(qty, idx)),
            }
        )

    pairs = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        )
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["pk", "sk"])
        .aggregate(
            ray.data.aggregate.Sum("q95", alias_name="s95"),
            ray.data.aggregate.Sum("qall", alias_name="sall"),
        )
    )

    def qualifying(batch: pa.Table) -> pa.Table:
        s95 = pc.cast(batch.column("s95"), pa.int64()).to_numpy(zero_copy_only=False)
        sall = pc.cast(batch.column("sall"), pa.int64()).to_numpy(zero_copy_only=False)
        sk = batch.column("sk").to_numpy(zero_copy_only=False)
        return pa.table({"sk": pa.array(np.unique(sk[2 * s95 > sall]))})

    distinct = (
        pairs.map_batches(qualifying, batch_format="pyarrow")
        .groupby("sk")
        .aggregate(ray.data.aggregate.Count(alias_name="n"))
    )

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name", "s_nationkey"]
    )
    skey = sup.column("s_suppkey").to_numpy()
    s_order = np.argsort(skey)
    skey = skey[s_order]
    sname = np.asarray(sup.column("s_name").to_pylist(), dtype=object)[s_order]
    snat = sup.column("s_nationkey").to_numpy()[s_order]
    nat_tbl = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nkey = nat_tbl.column("n_nationkey").to_numpy()
    nname = np.asarray(nat_tbl.column("n_name").to_pylist(), dtype=object)
    n_order = np.argsort(nkey)
    nkey, nname = nkey[n_order], nname[n_order]

    def finish(batch: pa.Table) -> pa.Table:
        sk = batch.column("sk").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(skey, sk), 0, max(len(skey) - 1, 0))
        ok = skey[pos] == sk
        pos = pos[ok]
        np_ = np.clip(np.searchsorted(nkey, snat[pos]), 0, max(len(nkey) - 1, 0))
        return pa.table(
            {
                "s_name": pa.array(sname[pos].astype(str)),
                "n_name": pa.array(nname[np_].astype(str)),
            }
        )

    return distinct.map_batches(finish, batch_format="pyarrow")
