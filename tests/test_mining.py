"""Brute-force oracles for the mining operators (skyline, basket pairs)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osm_data_3d_tiles_ray.pipelines import mining

SF = "/root/testdata/sf0.001"


def test_skyline_matches_bruteforce():
    got = (
        mining.skyline_orders(SF)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    price = np.floor(o["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    date = o["o_orderdate"].astype("int64").to_numpy()
    dominated = np.zeros(len(o), dtype=bool)
    for i in range(len(o)):
        dom = (
            (price >= price[i])
            & (date >= date[i])
            & ((price > price[i]) | (date > date[i]))
        )
        dominated[i] = dom.any()
    exp = (
        pd.DataFrame(
            {
                "o_orderkey": o["o_orderkey"].to_numpy()[~dominated],
                "price_cent": price[~dominated],
                "o_orderdate": o["o_orderdate"].to_numpy()[~dominated],
            }
        )
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    assert 1 <= len(got) < len(o)


def test_skyline_union_closure():
    """skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B)) — the partial-
    combine law the distributed reduction relies on (randomized)."""
    rng = np.random.default_rng(7)
    for _ in range(20):
        pr = rng.integers(0, 50, size=200).astype(np.int64)
        dt = rng.integers(0, 50, size=200).astype(np.int64)
        full = set(map(tuple, np.stack([pr, dt], axis=1)[
            mining._local_skyline(pr, dt)]))
        ka = mining._local_skyline(pr[:100], dt[:100])
        kb = mining._local_skyline(pr[100:], dt[100:])
        cpr = np.concatenate([pr[:100][ka], pr[100:][kb]])
        cdt = np.concatenate([dt[:100][ka], dt[100:][kb]])
        two = set(map(tuple, np.stack([cpr, cdt], axis=1)[
            mining._local_skyline(cpr, cdt)]))
        assert full == two


def test_basket_pairs_matches_bruteforce():
    got = mining.basket_pairs(SF).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    from collections import Counter
    from itertools import combinations

    c: Counter = Counter()
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(set(grp["l_partkey"]))
        for a, b in combinations(parts, 2):
            c[(a, b)] += 1
    rows = sorted(c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:20]
    exp = pd.DataFrame(
        {
            "part_a": [a for (a, _), _ in rows],
            "part_b": [b for (_, b), _ in rows],
            "n_orders": [n for _, n in rows],
            "rank": np.arange(1, len(rows) + 1),
        }
    )
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))
    assert got["n_orders"].iloc[0] >= 2


def test_rfm_segments_properties():
    got = mining.rfm_segments(SF).to_pandas()
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    assert len(got) == o["o_custkey"].nunique()
    assert got["frequency"].sum() == len(o)
    for col in ("r_bucket", "f_bucket", "m_bucket"):
        assert set(got[col]) <= {1, 2, 3}
        # tercile balance: bucket 1 holds >= ceil(33n/100) - slack for ties
        n = len(got)
        assert (got[col] == 1).sum() >= (33 * n + 99) // 100 - n // 10
    # monotone: bucket 3 of monetary strictly richer than bucket 1
    assert (
        got[got["m_bucket"] == 3]["monetary_cent"].min()
        > got[got["m_bucket"] == 1]["monetary_cent"].max()
    )


def test_source_token_entropy_bruteforce():
    from collections import Counter

    from osm_data_3d_tiles_ray.pipelines import textops

    got = (
        textops.source_token_entropy(SF)
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    rows = []
    for src, sub in docs.groupby("source"):
        c = Counter(w for t in sub["text"] for w in t.split(" ") if w)
        t = sum(c.values())
        s = sum(
            cnt * int(np.floor(np.log(cnt) * 1e6 + 0.5)) for cnt in c.values()
        )
        rows.append((src, t, len(c), s, int(np.floor(np.log(t) * 1e6 + 0.5))))
    exp = (
        pd.DataFrame(
            rows,
            columns=["source", "n_tok", "n_vocab", "sum_c_lnc_e6", "ln_total_e6"],
        )
        .sort_values("source")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    # entropy H = ln T - S/(T 1e6) must land in (0, ln V]
    H = got["ln_total_e6"] / 1e6 - got["sum_c_lnc_e6"] / (got["n_tok"] * 1e6)
    assert ((H > 0) & (H <= np.log(got["n_vocab"]) + 1e-6)).all()


def test_weighted_join_sample_is_subset_weighted():
    from osm_data_3d_tiles_ray.geom.rng import jenkins_mix
    from osm_data_3d_tiles_ray.pipelines import sampling

    got = sampling.weighted_join_sample(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ts = ev["ts"].astype("int64").to_numpy()
    uid = ev["user_id"].to_numpy()
    eid = ev["event_id"].to_numpy()
    val = np.floor(ev["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    win = np.int64(3_600_000_000)
    pairs = []
    for i in np.flatnonzero(ev["event_type"].to_numpy() == "purchase"):
        m = (uid == uid[i]) & (ts >= ts[i] - win) & (ts < ts[i])
        for j in np.flatnonzero(m):
            pairs.append((eid[i], eid[j], val[j]))
    tagmix = np.uint32((73 * 2654435761) & 0xFFFFFFFF)
    exp_rows = []
    for a, b, v in pairs:
        key = np.int64(a) * np.int64(1000003) + np.int64(b)
        h = jenkins_mix(np.array([key], np.uint64).astype(np.uint32) ^ tagmix)
        h = jenkins_mix(
            h ^ (np.array([key], np.uint64) >> np.uint64(32)).astype(np.uint32)
        )
        h64 = int(h.astype(np.int64)[0])
        if h64 * 500_000_000 < int(v) * 4294967296:
            exp_rows.append((a, b, int(v), h64))
    exp = (
        pd.DataFrame(
            exp_rows, columns=["event_id", "prior_event_id", "value_micro", "h"]
        )
        .sort_values(["event_id", "prior_event_id"])
        .reset_index(drop=True)
    )
    got = got.sort_values(["event_id", "prior_event_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_revenue_concentration_bruteforce():
    got = mining.revenue_concentration(SF).to_pandas().iloc[0]
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    cents = np.floor(o["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    spend = (
        pd.DataFrame({"c": o["o_custkey"], "v": cents}).groupby("c")["v"].sum()
    )
    n = len(spend)
    k = -(-n // 10)
    thr = np.sort(spend.to_numpy())[n - k]  # rank n-k+1 smallest
    top = spend[spend >= thr]
    assert got["n_customers"] == n
    assert got["threshold_cent"] == thr
    assert got["top_customers"] == len(top)
    assert got["top_cent"] == top.sum()
    assert got["total_cent"] == spend.sum()
    assert got["share_e6"] == top.sum() * 1_000_000 // spend.sum()
    # concentration sanity: top decile holds more than a decile of revenue
    assert got["share_e6"] > 100_000


def test_type_winsorized_bruteforce():
    from osm_data_3d_tiles_ray.pipelines import events as ev_mod

    got = (
        ev_mod.type_winsorized(SF)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    e6 = np.floor(ev["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    rows = []
    for et, idx in ev.groupby("event_type").groups.items():
        v = np.sort(e6[idx])
        n = len(v)
        lo = v[(1 * n + 99) // 100 - 1]
        hi = v[(99 * n + 99) // 100 - 1]
        rows.append((et, n, lo, hi, int(np.clip(e6[idx], lo, hi).sum())))
    exp = (
        pd.DataFrame(
            rows,
            columns=["event_type", "n", "lo_e6", "hi_e6", "winsorized_sum_e6"],
        )
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    # clipping can only reduce the absolute extremes
    assert (got["lo_e6"] <= got["hi_e6"]).all()


def test_nation_spend_gini_bruteforce():
    got = (
        mining.nation_spend_gini(SF)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    c = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    nat = pq.read_table(f"{SF}/nation.parquet").to_pandas()
    cents = np.floor(o["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    spend = (
        pd.DataFrame({"c_custkey": o["o_custkey"], "v": cents})
        .groupby("c_custkey")["v"]
        .sum()
        .reset_index()
        .merge(c[["c_custkey", "c_nationkey"]], on="c_custkey")
        .merge(nat[["n_nationkey", "n_name"]],
               left_on="c_nationkey", right_on="n_nationkey")
    )
    rows = []
    for name, sub in spend.groupby("n_name"):
        x = np.sort(sub["v"].to_numpy())
        n, t = len(x), int(x.sum())
        s = int((np.arange(1, n + 1) * x).sum())
        rows.append((name, n, t, (2 * s - (n + 1) * t) * 1_000_000 // (n * t)))
    exp = (
        pd.DataFrame(rows, columns=["n_name", "n_customers", "total_cent", "gini_e6"])
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    num = ["n_customers", "total_cent", "gini_e6"]
    pd.testing.assert_frame_equal(
        got.astype({k: "int64" for k in num}), exp.astype({k: "int64" for k in num})
    )
    assert ((got["gini_e6"] >= 0) & (got["gini_e6"] < 1_000_000)).all()


def test_hourly_uniformity_bruteforce():
    from osm_data_3d_tiles_ray.pipelines import events as ev_mod

    got = (
        ev_mod.hourly_uniformity(SF)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    hour = (ev["ts"].astype("int64").to_numpy() // 3_600_000_000) % 24
    rows = []
    for et, idx in ev.groupby("event_type").groups.items():
        x = np.bincount(hour[idx], minlength=24).astype(np.int64)
        t = int(x.sum())
        rows.append((et, t, int(((24 * x - t) ** 2).sum())))
    exp = (
        pd.DataFrame(rows, columns=["event_type", "n", "chi2_scaled"])
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    assert (got["chi2_scaled"] >= 0).all()
