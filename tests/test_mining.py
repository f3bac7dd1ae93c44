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
