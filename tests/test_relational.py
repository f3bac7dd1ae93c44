"""Brute-force (pandas) oracles for the relational join/top-k operators
and the grouped exact heavy-hitter ops added in round 3."""

import collections

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_customers_no_orders_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import customers_no_orders

    # sf0.01 has a non-empty result; sf0.001 exercises the empty path
    for sf in (SF01, SF):
        got = customers_no_orders(sf)
        cust = pd.read_parquet(f"{sf}/customer.parquet")
        orders = pd.read_parquet(f"{sf}/orders.parquet")
        recent = orders[orders.o_orderdate >= pd.Timestamp("1997-01-01")]
        want = cust[~cust.c_custkey.isin(set(recent.o_custkey))]
        assert got.schema().names == ["c_custkey", "c_name", "acctbal_cent"]
        got_df = got.to_pandas()
        if len(want) == 0:
            assert got.count() == 0
            continue
        got_df = got_df.sort_values("c_custkey").reset_index(drop=True)
        want = want.sort_values("c_custkey").reset_index(drop=True)
        assert got_df.c_custkey.tolist() == want.c_custkey.tolist()
        assert got_df.c_name.tolist() == want.c_name.tolist()
        assert got_df.acctbal_cent.tolist() == [
            int(np.floor(b * 100 + 0.5)) for b in want.c_acctbal
        ]


def test_shipping_priority_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import shipping_priority

    got = shipping_priority(SF).to_pandas()
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    cutoff = pd.Timestamp("1995-03-15")
    bld = set(cust[cust.c_mktsegment == "BUILDING"].c_custkey)
    o = orders[(orders.o_orderdate < cutoff) & orders.o_custkey.isin(bld)]
    l = li[li.l_shipdate > cutoff].copy()
    l["cent"] = np.floor(
        l.l_extendedprice.to_numpy() * (1 - l.l_discount.to_numpy()) * 100 + 0.5
    ).astype(np.int64)
    j = l.merge(o[["o_orderkey", "o_orderdate"]], left_on="l_orderkey",
                right_on="o_orderkey")
    want = (
        j.groupby(["o_orderkey", "o_orderdate"], as_index=False)["cent"].sum()
        .sort_values(["cent", "o_orderkey"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    assert got.o_orderkey.tolist() == want.o_orderkey.tolist()
    assert got.revenue_cent.tolist() == want.cent.tolist()
    assert list(got.o_orderdate) == list(want.o_orderdate)


def test_top_users_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.events import top_users

    got = top_users(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["e4"] = np.floor(ev.value.to_numpy() * 1e4 + 0.5).astype(np.int64)
    agg = ev.groupby("user_id", as_index=False).agg(
        total_value_e4=("e4", "sum"), n_events=("e4", "size")
    )
    want = agg.sort_values(
        ["total_value_e4", "user_id"], ascending=[False, True]
    ).head(10).reset_index(drop=True)
    assert got.user_id.tolist() == want.user_id.tolist()
    assert got.total_value_e4.tolist() == want.total_value_e4.tolist()
    assert got.n_events.tolist() == want.n_events.tolist()


def test_top_terms_by_lang_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.textops import top_terms_by_lang

    got = top_terms_by_lang(SF, k=5).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    counts: dict[str, collections.Counter] = {}
    for lang, text in zip(docs.lang, docs.text):
        c = counts.setdefault(lang, collections.Counter())
        c.update(w for w in text.split(" ") if w)
    want_rows = []
    for lang in sorted(counts):
        ranked = sorted(counts[lang].items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        for r, (term, n) in enumerate(ranked, 1):
            want_rows.append((lang, term, n, r))
    got_rows = sorted(
        zip(got.lang, got.term, got.n, got["rank"]),
        key=lambda t: (t[0], t[3]),
    )
    assert [tuple(r) for r in got_rows] == want_rows


def test_late_shipment_priority_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import late_shipment_priority

    got = late_shipment_priority(SF).to_pandas().set_index("o_orderpriority")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    mx = li.groupby("l_orderkey").l_shipdate.max()
    j = orders.join(mx, on="o_orderkey")
    late = j[j.l_shipdate > j.o_orderdate + pd.Timedelta(days=90)]
    want = late.groupby("o_orderpriority").size()
    assert dict(got.n_late_orders) == dict(want)


def test_running_totals_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import running_customer_totals

    got = running_customer_totals(SF).to_pandas().set_index("o_orderkey")
    orders = pd.read_parquet(f"{SF}/orders.parquet").copy()
    orders["cent"] = np.floor(orders.o_totalprice.to_numpy() * 100 + 0.5).astype(np.int64)
    orders = orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    orders["run"] = orders.groupby("o_custkey").cent.cumsum()
    want = dict(zip(orders.o_orderkey, orders.run))
    assert dict(got.running_total_cent) == want


def test_user_gap_stats_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.events import user_gap_stats

    got = user_gap_stats(SF).to_pandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    want = {}
    for uid, g in ev.groupby("user_id"):
        # datetime64[us] → int64 is already microseconds
        ts = g.sort_values(["ts", "event_id"]).ts.astype("int64").to_numpy()
        if len(ts) < 2:
            continue
        gaps = np.diff(ts)
        want[uid] = (len(gaps), int(gaps.sum()), int(gaps.max()))
    got_d = {
        u: (int(r.n_gaps), int(r.sum_gap_us), int(r.max_gap_us))
        for u, r in got.iterrows()
    }
    assert got_d == want


def test_revenue_by_nation_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import revenue_by_nation

    got = revenue_by_nation(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    sup = pd.read_parquet(f"{SF}/supplier.parquet")
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    reg = pd.read_parquet(f"{SF}/region.parquet")
    li = li.copy()
    li["cent"] = np.floor(
        li.l_extendedprice.to_numpy() * (1 - li.l_discount.to_numpy()) * 100 + 0.5
    ).astype(np.int64)
    j = (
        li.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
        .merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    )
    want = j.groupby(["n_name", "r_name"]).cent.sum().to_dict()
    assert {(r.n_name, r.r_name): r.revenue_cent for r in got.itertuples()} == want


def test_forecast_revenue_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import forecast_revenue

    got = forecast_revenue(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    keep = (
        (li.l_shipdate >= pd.Timestamp("1996-01-01"))
        & (li.l_shipdate < pd.Timestamp("1997-01-01"))
        & (li.l_discount >= 0.03)
        & (li.l_discount <= 0.07)
        & (li.l_quantity < 24)
    )
    sub = li[keep]
    cents = np.floor(
        sub.l_extendedprice.to_numpy() * sub.l_discount.to_numpy() * 100 + 0.5
    ).astype(np.int64)
    assert len(got) == 1
    assert int(got.revenue_cent.iloc[0]) == int(cents.sum())
    assert int(got.n_rows.iloc[0]) == int(keep.sum())


def test_promo_revenue_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import promo_revenue

    got = promo_revenue(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")
    promo = set(part[part.p_type == "PROMO"].p_partkey)
    cents = np.floor(
        li.l_extendedprice.to_numpy() * (1 - li.l_discount.to_numpy()) * 100
        + 0.5
    ).astype(np.int64)
    is_promo = li.l_partkey.isin(promo).to_numpy()
    pr, tot = int(cents[is_promo].sum()), int(cents.sum())
    assert len(got) == 1
    assert int(got.promo_cent.iloc[0]) == pr
    assert int(got.total_cent.iloc[0]) == tot
    assert int(got.promo_share_e4.iloc[0]) == (pr * 10000) // max(tot, 1)


def test_large_orders_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import large_orders

    # low threshold so sf0.001 has winners; also exercise the empty path
    got = large_orders(SF, min_qty=120.0).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    qty = li.groupby("l_orderkey").l_quantity.sum()
    winners = qty[qty > 120.0]
    assert len(winners) > 0, "fixture should produce winners at 120"
    j = orders[orders.o_orderkey.isin(winners.index)].merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )
    want = {
        int(r.o_orderkey): (
            r.c_name,
            int(np.floor(r.o_totalprice * 100 + 0.5)),
            float(winners[r.o_orderkey]),
        )
        for r in j.itertuples()
    }
    got_d = {
        int(r.o_orderkey): (
            r.c_name,
            int(r.total_price_cent),
            float(r.total_qty),
        )
        for r in got.itertuples()
    }
    assert got_d == want
    # odate_us is microseconds since epoch of o_orderdate
    od = dict(zip(orders.o_orderkey, orders.o_orderdate.astype("int64")))
    for r in got.itertuples():
        assert int(r.odate_us) == od[int(r.o_orderkey)]

    empty = large_orders(SF, min_qty=1e12)
    assert empty.count() == 0


def test_volume_shipping_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import volume_shipping

    got = (
        volume_shipping(SF)
        .to_pandas()
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    sup = pd.read_parquet(f"{SF}/supplier.parquet")
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    l = li[(li.l_shipdate >= pd.Timestamp("1995-01-01"))
           & (li.l_shipdate < pd.Timestamp("1997-01-01"))].copy()
    l["cent"] = np.floor(
        l.l_extendedprice.to_numpy() * (1 - l.l_discount.to_numpy()) * 100 + 0.5
    ).astype(np.int64)
    l["l_year"] = l.l_shipdate.dt.year.astype(np.int64)
    j = (
        l.merge(orders[["o_orderkey", "o_custkey"]],
                left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust[["c_custkey", "c_nationkey"]],
               left_on="o_custkey", right_on="c_custkey")
        .merge(sup[["s_suppkey", "s_nationkey"]],
               left_on="l_suppkey", right_on="s_suppkey")
    )
    j = j[j.s_nationkey != j.c_nationkey]
    name = dict(zip(nat.n_nationkey, nat.n_name))
    j["supp_nation"] = j.s_nationkey.map(name)
    j["cust_nation"] = j.c_nationkey.map(name)
    want = (
        j.groupby(["supp_nation", "cust_nation", "l_year"], as_index=False)["cent"]
        .sum()
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )
    assert got.supp_nation.tolist() == want.supp_nation.tolist()
    assert got.cust_nation.tolist() == want.cust_nation.tolist()
    assert got.l_year.tolist() == want.l_year.tolist()
    assert got.revenue_cent.tolist() == want.cent.tolist()


def test_small_qty_revenue_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import small_qty_revenue

    got = small_qty_revenue(SF01).to_pandas()
    li = pd.read_parquet(f"{SF01}/lineitem.parquet")
    part = pd.read_parquet(f"{SF01}/part.parquet")
    bkeys = set(part[part.p_brand == "Brand#11"].p_partkey)
    l = li[li.l_partkey.isin(bkeys)].copy()
    stats = l.groupby("l_partkey").l_quantity.agg(["count", "sum"])
    cnt = l.l_partkey.map(stats["count"]).to_numpy()
    sq = l.l_partkey.map(stats["sum"]).to_numpy().astype(np.int64)
    keep = 5 * l.l_quantity.to_numpy().astype(np.int64) * cnt < sq
    want_cent = int(
        np.floor(l.l_extendedprice.to_numpy()[keep] * 100 + 0.5)
        .astype(np.int64)
        .sum()
    )
    assert got.revenue_cent.iloc[0] == want_cent
    assert got.n_rows.iloc[0] == int(keep.sum())


def test_important_parts_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import important_parts

    got = (
        important_parts(SF)
        .to_pandas()
        .sort_values("l_partkey")
        .reset_index(drop=True)
    )
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    cent = np.floor(
        li.l_extendedprice.to_numpy() * (1 - li.l_discount.to_numpy()) * 100 + 0.5
    ).astype(np.int64)
    pp = pd.DataFrame({"pk": li.l_partkey, "cent": cent}).groupby(
        "pk", as_index=False
    ).cent.sum()
    total = int(pp.cent.sum())
    want = pp[pp.cent * 10000 > total].sort_values("pk").reset_index(drop=True)
    assert got.l_partkey.tolist() == want.pk.tolist()
    assert got.value_cent.tolist() == want.cent.tolist()


def test_market_share_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import market_share

    got = (
        market_share(SF)
        .to_pandas()
        .sort_values(["l_year", "supp_nation"])
        .reset_index(drop=True)
    )
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    sup = pd.read_parquet(f"{SF}/supplier.parquet")
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    reg = pd.read_parquet(f"{SF}/region.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")
    asia = set(reg[reg.r_name == "ASIA"].r_regionkey)
    asia_nat = set(nat[nat.n_regionkey.isin(asia)].n_nationkey)
    std = set(part[part.p_type == "STANDARD"].p_partkey)
    l = li[li.l_partkey.isin(std)].copy()
    l["cent"] = np.floor(
        l.l_extendedprice.to_numpy() * (1 - l.l_discount.to_numpy()) * 100 + 0.5
    ).astype(np.int64)
    j = (
        l.merge(orders[["o_orderkey", "o_custkey", "o_orderdate"]],
                left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust[["c_custkey", "c_nationkey"]],
               left_on="o_custkey", right_on="c_custkey")
        .merge(sup[["s_suppkey", "s_nationkey"]],
               left_on="l_suppkey", right_on="s_suppkey")
    )
    j = j[j.c_nationkey.isin(asia_nat)]
    j["l_year"] = j.o_orderdate.dt.year.astype(np.int64)
    name = dict(zip(nat.n_nationkey, nat.n_name))
    per = j.groupby(["l_year", "s_nationkey"], as_index=False).cent.sum()
    per["supp_nation"] = per.s_nationkey.map(name)
    tot = per.groupby("l_year").cent.transform("sum")
    per["share_e4"] = per.cent * 10000 // tot
    want = per.sort_values(["l_year", "supp_nation"]).reset_index(drop=True)
    assert got.l_year.tolist() == want.l_year.tolist()
    assert got.supp_nation.tolist() == want.supp_nation.tolist()
    assert got.revenue_cent.tolist() == want.cent.tolist()
    assert got.share_e4.tolist() == want.share_e4.tolist()


def test_sales_opportunity_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import sales_opportunity

    got = (
        sales_opportunity(SF01)
        .to_pandas()
        .sort_values("cust_nation")
        .reset_index(drop=True)
    )
    cust = pd.read_parquet(f"{SF01}/customer.parquet")
    orders = pd.read_parquet(f"{SF01}/orders.parquet")
    nat = pd.read_parquet(f"{SF01}/nation.parquet")
    cents = np.floor(cust.c_acctbal.to_numpy() * 100 + 0.5).astype(np.int64)
    pos = cents > 0
    s, n = int(cents[pos].sum()), int(pos.sum())
    recent = set(
        orders[orders.o_orderdate >= pd.Timestamp("2000-06-01")].o_custkey
    )
    keep = (cents * n > s) & ~cust.c_custkey.isin(recent).to_numpy()
    name = dict(zip(nat.n_nationkey, nat.n_name))
    want = (
        pd.DataFrame(
            {
                "cust_nation": cust.c_nationkey[keep].map(name),
                "bal": cents[keep],
            }
        )
        .groupby("cust_nation")
        .agg(n_cust=("bal", "size"), sum_bal_cent=("bal", "sum"))
        .reset_index()
        .sort_values("cust_nation")
        .reset_index(drop=True)
    )
    assert got.cust_nation.tolist() == want.cust_nation.tolist()
    assert got.n_cust.tolist() == want.n_cust.tolist()
    assert got.sum_bal_cent.tolist() == want.sum_bal_cent.tolist()


def test_nation_trade_balance_consistency(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import (
        nation_trade_balance,
        volume_shipping,
    )

    vol = volume_shipping(SF).to_pandas()
    got = (
        nation_trade_balance(SF)
        .to_pandas()
        .sort_values("nation")
        .reset_index(drop=True)
    )
    exp = vol.groupby("supp_nation").revenue_cent.sum()
    imp = vol.groupby("cust_nation").revenue_cent.sum()
    nations = sorted(set(exp.index) | set(imp.index))
    assert got.nation.tolist() == nations
    for _, r in got.iterrows():
        assert r.export_cent == exp.get(r.nation, 0)
        assert r.import_cent == imp.get(r.nation, 0)
        assert r.balance_cent == r.export_cent - r.import_cent
    # global conservation: every export is someone's import
    assert got.balance_cent.sum() == 0


def test_blame_supplier_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import blame_supplier

    got = blame_supplier(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    w = li.sort_values(
        ["l_orderkey", "l_shipdate", "l_suppkey"],
        ascending=[True, False, True],
    ).drop_duplicates("l_orderkey")
    j = w.merge(
        orders[["o_orderkey", "o_orderdate"]],
        left_on="l_orderkey", right_on="o_orderkey",
    )
    late = j[j.l_shipdate > j.o_orderdate + pd.Timedelta(days=90)]
    want = (
        late.groupby("l_suppkey").size().rename("n")
        .reset_index()
        .sort_values(["n", "l_suppkey"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    assert got.s_suppkey.tolist() == want.l_suppkey.tolist()
    assert got.n_blamed.tolist() == want.n.tolist()


def test_order_gap_histogram_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import order_gap_histogram

    got = (
        order_gap_histogram(SF)
        .to_pandas()
        .sort_values("gap_days")
        .reset_index(drop=True)
    )
    orders = pd.read_parquet(f"{SF}/orders.parquet").sort_values(
        ["o_custkey", "o_orderdate", "o_orderkey"]
    )
    prev = orders.groupby("o_custkey").o_orderdate.shift()
    gaps = (orders.o_orderdate - prev).dt.days.dropna().astype(np.int64)
    want = gaps.value_counts().sort_index()
    assert got.gap_days.tolist() == list(want.index)
    assert got.n_pairs.tolist() == want.tolist()
    # conservation: one pair per non-first order
    n_cust = orders.o_custkey.nunique()
    assert got.n_pairs.sum() == len(orders) - n_cust


def test_bloom_filter_unit(ray_session):
    import pyarrow as pa
    import ray.data

    from osm_data_3d_tiles_ray.state.bloom import bloom_build, bloom_probe

    rng = np.random.default_rng(5)
    members = np.unique(rng.integers(0, 10**12, 5000).astype(np.int64))
    ds = ray.data.from_arrow(pa.table({"key": members})).repartition(6)
    words = bloom_build(ds, "key")
    # zero false negatives
    assert bloom_probe(words, members).all()
    # false-positive rate near the theoretical (m=2^20, k=4, n=5000 → ~1e-9;
    # assert a generous bound)
    probes = rng.integers(10**12, 2 * 10**12, 20000).astype(np.int64)
    fp = bloom_probe(words, probes).mean()
    assert fp < 0.01, fp


def test_shipping_priority_bloom_identical(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import shipping_priority

    plain = shipping_priority(SF).to_pandas()
    bloom = shipping_priority(SF, use_bloom=True).to_pandas()
    pd.testing.assert_frame_equal(plain, bloom)


def test_yearly_top_supplier_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import yearly_top_supplier

    got = (
        yearly_top_supplier(SF)
        .to_pandas()
        .sort_values("l_year")
        .reset_index(drop=True)
    )
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    cent = np.floor(
        li.l_extendedprice.to_numpy() * (1 - li.l_discount.to_numpy()) * 100
        + 0.5
    ).astype(np.int64)
    df = pd.DataFrame(
        {"y": li.l_shipdate.dt.year, "s": li.l_suppkey, "c": cent}
    ).groupby(["y", "s"], as_index=False).c.sum()
    want = (
        df.sort_values(["y", "c", "s"], ascending=[True, False, True])
        .drop_duplicates("y")
        .reset_index(drop=True)
    )
    assert got.l_year.tolist() == want.y.tolist()
    assert got.s_suppkey.tolist() == want.s.tolist()
    assert got.revenue_cent.tolist() == want.c.tolist()


def test_discounted_revenue_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import discounted_revenue

    got = discounted_revenue(SF01).to_pandas()
    li = pd.read_parquet(f"{SF01}/lineitem.parquet")
    part = pd.read_parquet(f"{SF01}/part.parquet")
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    g1 = (j.p_brand == "Brand#12") & j.p_size.between(1, 5) & j.l_quantity.between(1, 11)
    g2 = (j.p_brand == "Brand#23") & j.p_size.between(1, 10) & j.l_quantity.between(10, 20)
    g3 = (j.p_brand == "Brand#34") & j.p_size.between(1, 15) & j.l_quantity.between(20, 30)
    keep = g1 | g2 | g3
    cents = np.floor(
        j.l_extendedprice.to_numpy()[keep]
        * (1 - j.l_discount.to_numpy()[keep]) * 100 + 0.5
    ).astype(np.int64)
    assert got.revenue_cent.iloc[0] == int(cents.sum())
    assert got.n_rows.iloc[0] == int(keep.sum())
    assert got.n_rows.iloc[0] > 0  # predicate groups actually select rows


def test_revenue_rollup_consistency(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import revenue_rollup

    got = revenue_rollup(SF).to_pandas()
    fine = got[(got.n_name != "ALL") & (got.l_year != -1)]
    by_nat = got[(got.n_name != "ALL") & (got.l_year == -1)]
    by_year = got[(got.n_name == "ALL") & (got.l_year != -1)]
    grand = got[(got.n_name == "ALL") & (got.l_year == -1)]
    # every level must reconcile with the finest one
    assert len(grand) == 1
    assert grand.revenue_cent.iloc[0] == fine.revenue_cent.sum()
    a = fine.groupby("n_name").revenue_cent.sum().sort_index()
    b = by_nat.set_index("n_name").revenue_cent.sort_index()
    assert a.tolist() == b.tolist()
    c = fine.groupby("l_year").revenue_cent.sum().sort_index()
    d = by_year.set_index("l_year").revenue_cent.sort_index()
    assert c.tolist() == d.tolist()
