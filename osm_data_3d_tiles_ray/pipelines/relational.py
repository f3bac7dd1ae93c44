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
