"""Analytical mining operators over the relational tables: 2-D skyline
(pareto front) and market-basket pair mining (no reference analog — the
reference engine has no relational operators; these extend the engine's
TPC-H-shaped suite with the classic non-SQL-native shapes).

* ``skyline_orders`` — the maximal vector / pareto-front operator: keep
  every order not dominated in (totalprice, orderdate).  Skylines are
  CLOSED under union (skyline(A ∪ B) = skyline(skyline(A) ∪
  skyline(B))), so each block reduces to its local skyline in one
  vectorized sweep and only the tiny candidate set moves — the classic
  distributed-skyline partial-combine.  Candidates of random data are
  O(log²·) per block; a final single-partition sweep finishes them
  (bounded fan-in, same class as the tileset stats combine).

* ``basket_pairs`` — frequent co-purchased part pairs: distinct
  (order, part) → one hash shuffle keyed by order → per-partition pair
  expansion with grouped cross-product index arithmetic (no per-order
  dispatch; pair count per order is k(k−1)/2 by construction) → pair
  count groupby with per-block top-k partials, so the final take is
  bounded by blocks × k, never the distinct-pair count.

Dominance and counts are exact integers (price in cents, timestamps in
microseconds), so the DuckDB oracles match bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .partition import sum_by_key


def _local_skyline(price: np.ndarray, date: np.ndarray):
    """Indices of the 2-D skyline (maximize both): p survives iff no q
    has (q.price >= p.price, q.date >= p.date) strict in one.
    Equivalent test on the price-descending sort: p.date must be its own
    price-group's max AND strictly exceed the max date of all strictly
    higher prices."""
    order = np.lexsort((-date, -price))
    pr, dt = price[order], date[order]
    grp_start = np.ones(len(pr), dtype=bool)
    grp_start[1:] = pr[1:] != pr[:-1]
    starts = np.flatnonzero(grp_start)
    gmax = np.maximum.reduceat(dt, starts)  # per price-group max date
    run_max = np.maximum.accumulate(gmax)
    gid = np.cumsum(grp_start) - 1
    # max date over STRICTLY higher prices = running max of previous groups
    pmax = np.empty(len(gmax), dtype=dt.dtype)
    pmax[0] = np.iinfo(np.int64).min
    pmax[1:] = run_max[:-1]
    keep = (dt == gmax[gid]) & (dt > pmax[gid])
    return order[keep]


def skyline_orders(sf_dir: str) -> "ray.data.Dataset":
    """Pareto-optimal orders in (o_totalprice, o_orderdate) — "no other
    order is both at least as expensive and at least as recent, and
    strictly better in one".  Price quantizes to integer cents BEFORE
    the dominance test so engine and oracle compare identical integers.

    Output: (o_orderkey, price_cent, o_orderdate).
    """

    def local(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        if isinstance(od, pa.ChunkedArray):
            od = od.combine_chunks()
        date = od.cast(pa.int64()).to_numpy(zero_copy_only=False)
        price = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        okey = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        keep = _local_skyline(price, date)
        return pa.table(
            {
                "o_orderkey": pa.array(okey[keep].astype(np.int64)),
                "price_cent": pa.array(price[keep]),
                "o_orderdate": pa.array(date[keep]).cast(pa.timestamp("us")),
            }
        )

    candidates = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderdate"],
    ).map_batches(local, batch_format="pyarrow")

    def final(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], type=pa.int64()),
                    "price_cent": pa.array([], type=pa.int64()),
                    "o_orderdate": pa.array([], type=pa.timestamp("us")),
                }
            )
        od = batch.column("o_orderdate")
        if isinstance(od, pa.ChunkedArray):
            od = od.combine_chunks()
        date = od.cast(pa.int64()).to_numpy(zero_copy_only=False)
        price = batch.column("price_cent").to_numpy(zero_copy_only=False)
        keep = _local_skyline(price, date)
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey").take(pa.array(keep)),
                "price_cent": batch.column("price_cent").take(pa.array(keep)),
                "o_orderdate": od.take(pa.array(keep)),
            }
        )

    # candidate set is bounded (per-block skylines), so the one-partition
    # finish is a bounded fan-in, not a full-data materialization
    return candidates.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )


def basket_pairs(sf_dir: str, k: int = 20) -> "pa.Table":
    """Top-``k`` part pairs co-occurring in the most orders (market-basket
    pair mining).  Deterministic order: count desc, then (part_a, part_b).

    Output: (part_a, part_b, n_orders, rank).
    """
    from .partition import map_key_partitions

    def distinct_pairs(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "part_a": pa.array([], type=pa.int64()),
                "part_b": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        ok = tbl.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = tbl.column("l_partkey").to_numpy(zero_copy_only=False)
        # distinct (order, part), sorted by (order, part)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        first = np.ones(len(ok), dtype=bool)
        first[1:] = (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])
        ok, pk = ok[first], pk[first]
        # per-order runs; element at local position t pairs (as the LATER
        # part) with its t predecessors — grouped cross-product arithmetic
        brk = np.ones(len(ok), dtype=bool)
        brk[1:] = ok[1:] != ok[:-1]
        run_start_idx = np.flatnonzero(brk)
        local_pos = np.arange(len(ok)) - np.repeat(
            run_start_idx, np.diff(np.append(run_start_idx, len(ok)))
        )
        total = int(local_pos.sum())
        if total == 0:
            return empty
        second = np.repeat(np.arange(len(ok)), local_pos)
        offset = np.arange(total) - np.repeat(
            np.cumsum(local_pos) - local_pos, local_pos
        )
        first_idx = np.repeat(np.arange(len(ok)) - local_pos, local_pos) + offset
        pa_, pb_ = pk[first_idx], pk[second]
        # per-partition pre-combine of pair counts; pack the pair into one
        # int64 (np.unique on a packed key is ~10x unique(axis=0)'s
        # structured sort).  Rank-encode part_b first so the pack never
        # overflows whatever the raw part-key domain is.
        ub, bcode = np.unique(pb_, return_inverse=True)
        packed = pa_.astype(np.int64) * np.int64(len(ub)) + bcode
        u, inv = np.unique(packed, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "part_a": pa.array((u // len(ub)).astype(np.int64)),
                "part_b": pa.array(ub[(u % len(ub))].astype(np.int64)),
                "cnt": pa.array(cnt),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    pair_partials = map_key_partitions(li, ["l_orderkey"], distinct_pairs)
    # pair-keyed rollup via sum_by_key: pair cardinality grows with the
    # part domain squared, far past Ray's per-key hash-aggregate sweet spot
    counts = sum_by_key(
        pair_partials, ["part_a", "part_b"], {"cnt": "n_orders"}
    )

    def topk_partial(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("n_orders"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        a = batch.column("part_a").to_numpy(zero_copy_only=False)
        b = batch.column("part_b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a, -n))[:k]
        return pa.table(
            {
                "part_a": pa.array(a[order].astype(np.int64)),
                "part_b": pa.array(b[order].astype(np.int64)),
                "n_orders": pa.array(n[order]),
            }
        )

    cand = counts.map_batches(topk_partial, batch_format="pyarrow").take_all()
    a = np.array([r["part_a"] for r in cand], dtype=np.int64)
    b = np.array([r["part_b"] for r in cand], dtype=np.int64)
    n = np.array([r["n_orders"] for r in cand], dtype=np.int64)
    order = np.lexsort((b, a, -n))[:k]
    return pa.table(
        {
            "part_a": pa.array(a[order]),
            "part_b": pa.array(b[order]),
            "n_orders": pa.array(n[order]),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        }
    )


def rfm_segments(sf_dir: str) -> "ray.data.Dataset":
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic mining composition: per-customer order aggregates, exact
    corpus-wide tercile thresholds per metric (two-pass bucket-refinement
    order statistics, ``pipelines/selection.py`` — never a sort of the
    customer table), then a broadcast-threshold bucketing pass.

    Buckets per metric: value <= t33 → 1, <= t67 → 2, else 3 (3 = most
    recent / most frequent / highest spend).  Monetary quantizes to
    integer cents and recency to integer microseconds BEFORE any
    comparison, so thresholds and buckets match the SQL oracle exactly.

    Output: (c_custkey, recency_us, frequency, monetary_cent,
    r_bucket, f_bucket, m_bucket, rfm_code = r·100 + f·10 + m).
    """
    from .selection import exact_value_ranks

    def partial(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        if isinstance(od, pa.ChunkedArray):
            od = od.combine_chunks()
        t = od.cast(pa.int64()).to_numpy(zero_copy_only=False)
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100
            + 0.5
        ).astype(np.int64)
        u, inv = np.unique(ck, return_inverse=True)
        rec = np.full(len(u), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(rec, inv, t)
        return pa.table(
            {
                "c_custkey": pa.array(u.astype(np.int64)),
                "p_rec": pa.array(rec),
                "p_freq": pa.array(np.bincount(inv).astype(np.int64)),
                "p_cent": pa.array(np.bincount(inv, weights=cents).astype(np.int64)),
            }
        )

    per_user = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
    )
    from .partition import reduce_by_key

    per_user = reduce_by_key(
        per_user,
        ["c_custkey"],
        [
            ("p_rec", "max", "recency_us"),
            ("p_freq", "sum", "frequency"),
            ("p_cent", "sum", "monetary_cent"),
        ],
    ).materialize()  # scanned twice per metric by the threshold passes
    n = per_user.count()
    r33, r67 = -(-33 * n // 100), -(-67 * n // 100)
    th = {}
    for col in ("recency_us", "frequency", "monetary_cent"):
        ranks = exact_value_ranks(per_user, col, [r33, r67])
        th[col] = (ranks[r33], ranks[r67])

    def bucketize(batch: pa.Table) -> pa.Table:
        out = {
            "c_custkey": batch.column("c_custkey"),
            "recency_us": pc.cast(batch.column("recency_us"), pa.int64()),
            "frequency": pc.cast(batch.column("frequency"), pa.int64()),
            "monetary_cent": pc.cast(batch.column("monetary_cent"), pa.int64()),
        }
        bks = {}
        for col, key in (
            ("recency_us", "r_bucket"),
            ("frequency", "f_bucket"),
            ("monetary_cent", "m_bucket"),
        ):
            v = out[col].to_numpy(zero_copy_only=False)
            t33, t67 = th[col]
            bks[key] = np.where(v <= t33, 1, np.where(v <= t67, 2, 3)).astype(
                np.int64
            )
            out[key] = pa.array(bks[key])
        out["rfm_code"] = pa.array(
            bks["r_bucket"] * 100 + bks["f_bucket"] * 10 + bks["m_bucket"]
        )
        return pa.table(out)

    return per_user.map_batches(bucketize, batch_format="pyarrow")


def revenue_concentration(sf_dir: str) -> "pa.Table":
    """Revenue concentration (the 80/20 diagnostic): what share of total
    order revenue comes from the top decile of customers by spend.

    The decile threshold is the exact rank-(n−⌈n/10⌉+1) spend via the
    two-pass order statistics; "top" = every customer at or above it
    (ties included — deterministic on both engine and oracle).  All
    money in integer cents.

    Output one row: (n_customers, threshold_cent, top_customers,
    top_cent, total_cent, share_e6).
    """
    from .selection import exact_value_ranks

    def partial(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100
            + 0.5
        ).astype(np.int64)
        u, inv = np.unique(ck, return_inverse=True)
        return pa.table(
            {
                "c_custkey": pa.array(u.astype(np.int64)),
                "p_cent": pa.array(np.bincount(inv, weights=cents).astype(np.int64)),
            }
        )

    spend = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
    )
    spend = sum_by_key(
        spend, ["c_custkey"], {"p_cent": "cent"}
    ).materialize()  # scanned twice: threshold + rollup
    n = spend.count()
    k = -(-n // 10)  # ceil(n/10) top-decile size
    thr = exact_value_ranks(spend, "cent", [n - k + 1])[n - k + 1]

    def rollup(batch: pa.Table) -> pa.Table:
        c = pc.cast(batch.column("cent"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        top = c >= thr
        return pa.table(
            {
                "p_top_n": pa.array([int(top.sum())], type=pa.int64()),
                "p_top_cent": pa.array([int(c[top].sum())], type=pa.int64()),
                "p_total": pa.array([int(c.sum())], type=pa.int64()),
            }
        )

    parts = spend.map_batches(rollup, batch_format="pyarrow").take_all()
    top_n = sum(p["p_top_n"] for p in parts)  # bounded: one row per block
    top_cent = sum(p["p_top_cent"] for p in parts)
    total = sum(p["p_total"] for p in parts)
    return pa.table(
        {
            "n_customers": pa.array([n], type=pa.int64()),
            "threshold_cent": pa.array([int(thr)], type=pa.int64()),
            "top_customers": pa.array([top_n], type=pa.int64()),
            "top_cent": pa.array([top_cent], type=pa.int64()),
            "total_cent": pa.array([total], type=pa.int64()),
            "share_e6": pa.array([top_cent * 1_000_000 // total], type=pa.int64()),
        }
    )


def spend_gini(sf_dir: str, bucket_bits: int = 16) -> "pa.Table":
    """Gini coefficient of per-customer spend — the inequality metric as
    an EXACT rational: G = (2·S − (n+1)·T) / (n·T) with
    S = Σ rank·spend over the spend-ascending order (tie-agnostic: equal
    values contribute the same S under any tie order) and T = Σ spend.

    The rank-weighted sum is computed WITHOUT a global sort: spend
    values bucket by their high bits (order-preserving shift), bucket
    totals (count + sum) reduce to the driver (bounded by occupied
    buckets), prefix bases broadcast back, and each bucket resolves its
    local rank contributions from one in-partition sort — the same
    two-pass scan discipline as ``selection.exact_value_ranks``.

    Output one row: (n_customers, total_cent, rank_weighted_cent,
    gini_e6 = (2S − (n+1)T)·1e6 // (nT)) — integer division, zero
    floats anywhere.
    """
    from .partition import map_key_partitions

    def partial(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100
            + 0.5
        ).astype(np.int64)
        u, inv = np.unique(ck, return_inverse=True)
        return pa.table(
            {
                "c_custkey": pa.array(u.astype(np.int64)),
                "p_cent": pa.array(np.bincount(inv, weights=cents).astype(np.int64)),
            }
        )

    spend = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
    )
    spend = sum_by_key(
        spend, ["c_custkey"], {"p_cent": "cent"}
    ).materialize()  # scanned twice: bucket totals + rank resolve

    def bucket_totals(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch.column("cent"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        b = v >> bucket_bits
        uk, inv = np.unique(b, return_inverse=True)
        return pa.table(
            {
                "bucket": pa.array(uk),
                "p_n": pa.array(np.bincount(inv).astype(np.int64)),
                "p_sum": pa.array(np.bincount(inv, weights=v).astype(np.int64)),
            }
        )

    hist = (
        spend.map_batches(bucket_totals, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            ray.data.aggregate.Sum("p_n", alias_name="n"),
            ray.data.aggregate.Sum("p_sum", alias_name="s"),
        )
        .to_pandas()  # bounded: one row per occupied high-bits bucket
        .sort_values("bucket")
    )
    buckets = hist["bucket"].to_numpy().astype(np.int64)
    counts = hist["n"].to_numpy().astype(np.int64)
    n = int(counts.sum())
    total = int(hist["s"].sum())
    base_rank = np.concatenate([[0], np.cumsum(counts)[:-1]])
    base_of = dict(zip(buckets.tolist(), base_rank.tolist()))

    def add_bucket(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch.column("cent"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {"bucket": pa.array(v >> bucket_bits), "cent": pa.array(v)}
        )

    def rank_part(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table({"p_s": pa.array([], type=pa.int64())})
        b = tbl.column("bucket").to_numpy(zero_copy_only=False)
        v = tbl.column("cent").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, b))
        b, v = b[order], v[order]
        brk = np.ones(len(b), dtype=bool)
        brk[1:] = b[1:] != b[:-1]
        run_start = np.flatnonzero(brk)
        local = np.arange(len(b)) - np.repeat(
            run_start, np.diff(np.append(run_start, len(b)))
        )
        bases = np.array([base_of[int(x)] for x in b[run_start]], dtype=np.int64)
        rank = np.repeat(bases, np.diff(np.append(run_start, len(b)))) + local + 1
        return pa.table(
            {"p_s": pa.array([int((rank * v).sum())], type=pa.int64())}
        )

    parts = map_key_partitions(
        spend.map_batches(add_bucket, batch_format="pyarrow"), ["bucket"], rank_part
    ).take_all()
    s = sum(p["p_s"] for p in parts)
    gini_e6 = (2 * s - (n + 1) * total) * 1_000_000 // (n * total)
    return pa.table(
        {
            "n_customers": pa.array([n], type=pa.int64()),
            "total_cent": pa.array([total], type=pa.int64()),
            "rank_weighted_cent": pa.array([s], type=pa.int64()),
            "gini_e6": pa.array([gini_e6], type=pa.int64()),
        }
    )


def nation_spend_gini(sf_dir: str, bucket_bits: int = 16) -> "ray.data.Dataset":
    """Per-NATION Gini of customer spend — the grouped generalization of
    :func:`spend_gini`: the high-bit value buckets gain the nation as a
    composite key, so per-(nation, bucket) totals stay bounded, prefix
    bases resolve per nation on the driver, and each partition finishes
    its buckets' rank-weighted sums locally.  A giant nation never
    serializes on one partition the way a per-nation sort would.

    Output: (n_name, n_customers, total_cent, gini_e6) — the Gini is
    the exact integer rational (2S − (n+1)T) // (nT).
    """
    from .partition import map_key_partitions

    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).take_all()
    nkey = np.array([r["n_nationkey"] for r in nation], dtype=np.int64)
    nname = np.array([r["n_name"] for r in nation])
    order = np.argsort(nkey)
    nkey, nname = nkey[order], nname[order]

    def cust_partial(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch.column("o_totalprice").to_numpy(zero_copy_only=False) * 100
            + 0.5
        ).astype(np.int64)
        u, inv = np.unique(ck, return_inverse=True)
        return pa.table(
            {
                "c_custkey": pa.array(u.astype(np.int64)),
                "p_cent": pa.array(np.bincount(inv, weights=cents).astype(np.int64)),
            }
        )

    spend = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(cust_partial, batch_format="pyarrow")
    )
    spend = sum_by_key(spend, ["c_custkey"], {"p_cent": "cent"})

    # nation attach: one custkey-keyed tag-union exchange (customer is the
    # small side per partition; no broadcast of the customer table)
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )

    def cust_side(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "c_custkey": pc.cast(batch.column("c_custkey"), pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "nk": pc.cast(batch.column("c_nationkey"), pa.int64()),
                "cent": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    def spend_side(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "c_custkey": pc.cast(batch.column("c_custkey"), pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "nk": pa.array(np.zeros(n, dtype=np.int64)),
                "cent": pc.cast(batch.column("cent"), pa.int64()),
            }
        )

    from .partition import map_key_partitions as mkp

    def attach(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "nk": pa.array([], type=pa.int64()),
                "cent": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        ck = tbl.column("c_custkey").to_numpy(zero_copy_only=False)
        cm, sm = side == 0, side == 1
        if not sm.any():
            return empty
        cck = ck[cm]
        co = np.argsort(cck, kind="stable")
        cck = cck[co]
        nk = tbl.column("nk").to_numpy(zero_copy_only=False)[cm][co]
        pos = np.searchsorted(cck, ck[sm])  # every spender is a customer
        return pa.table(
            {
                "nk": pa.array(nk[pos]),
                "cent": tbl.column("cent").filter(pa.array(sm)),
            }
        )

    tagged = cust.map_batches(cust_side, batch_format="pyarrow").union(
        spend.map_batches(spend_side, batch_format="pyarrow")
    )
    nspend = mkp(tagged, ["c_custkey"], attach).materialize()

    def bucket_totals(batch: pa.Table) -> pa.Table:
        nk = batch.column("nk").to_numpy(zero_copy_only=False)
        v = batch.column("cent").to_numpy(zero_copy_only=False)
        b = v >> bucket_bits
        key = nk * (1 << 40) + b
        uk, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "nk": pa.array((uk >> 40).astype(np.int64)),
                "bucket": pa.array((uk & ((1 << 40) - 1)).astype(np.int64)),
                "p_n": pa.array(np.bincount(inv).astype(np.int64)),
                "p_sum": pa.array(np.bincount(inv, weights=v).astype(np.int64)),
            }
        )

    hist = (
        nspend.map_batches(bucket_totals, batch_format="pyarrow")
        .groupby(["nk", "bucket"])
        .aggregate(
            ray.data.aggregate.Sum("p_n", alias_name="n"),
            ray.data.aggregate.Sum("p_sum", alias_name="s"),
        )
        .to_pandas()  # bounded: nations x occupied buckets
        .sort_values(["nk", "bucket"])
    )
    base_of: dict[tuple, int] = {}
    n_of: dict[int, int] = {}
    t_of: dict[int, int] = {}
    for nk_val, sub in hist.groupby("nk", sort=True):
        cnt = sub["n"].to_numpy().astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        for b, c0 in zip(sub["bucket"].to_numpy().astype(np.int64), cum):
            base_of[(int(nk_val), int(b))] = int(c0)
        n_of[int(nk_val)] = int(cnt.sum())
        t_of[int(nk_val)] = int(sub["s"].sum())

    def add_bucket(batch: pa.Table) -> pa.Table:
        v = batch.column("cent").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "nk": batch.column("nk"),
                "bucket": pa.array((v >> bucket_bits).astype(np.int64)),
                "cent": pa.array(v),
            }
        )

    def rank_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "nk": pa.array([], type=pa.int64()),
                "p_s": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        nk = tbl.column("nk").to_numpy(zero_copy_only=False)
        b = tbl.column("bucket").to_numpy(zero_copy_only=False)
        v = tbl.column("cent").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, b, nk))
        nk, b, v = nk[order], b[order], v[order]
        brk = np.ones(len(nk), dtype=bool)
        brk[1:] = (nk[1:] != nk[:-1]) | (b[1:] != b[:-1])
        run_start = np.flatnonzero(brk)
        local = np.arange(len(nk)) - np.repeat(
            run_start, np.diff(np.append(run_start, len(nk)))
        )
        bases = np.array(
            [base_of[(int(nk[i]), int(b[i]))] for i in run_start], dtype=np.int64
        )
        rank = np.repeat(bases, np.diff(np.append(run_start, len(nk)))) + local + 1
        unk, inv = np.unique(nk, return_inverse=True)
        return pa.table(
            {
                "nk": pa.array(unk),
                "p_s": pa.array(
                    np.bincount(inv, weights=rank * v).astype(np.int64)
                ),
            }
        )

    parts = (
        map_key_partitions(
            nspend.map_batches(add_bucket, batch_format="pyarrow"),
            ["nk", "bucket"],
            rank_part,
        )
        .groupby("nk")
        .aggregate(ray.data.aggregate.Sum("p_s", alias_name="s"))
        .take_all()  # bounded: one row per nation
    )
    rows = []
    for r in sorted(parts, key=lambda r: r["nk"]):
        nk_val, s = int(r["nk"]), int(r["s"])
        n, t = n_of[nk_val], t_of[nk_val]
        gini = (2 * s - (n + 1) * t) * 1_000_000 // (n * t)
        name = str(nname[np.searchsorted(nkey, nk_val)])
        rows.append((name, n, t, gini))
    rows.sort()
    return ray.data.from_arrow(
        pa.table(
            {
                "n_name": pa.array([r[0] for r in rows], type=pa.string()),
                "n_customers": pa.array([r[1] for r in rows], type=pa.int64()),
                "total_cent": pa.array([r[2] for r in rows], type=pa.int64()),
                "gini_e6": pa.array([r[3] for r in rows], type=pa.int64()),
            }
        )
    )
