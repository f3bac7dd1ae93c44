"""Oracles for the diagnostics operators (PPS sample, correlation, PMI)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osm_data_3d_tiles_ray.geom.rng import keyed_uniform
from osm_data_3d_tiles_ray.pipelines import diagnostics

SF = "/root/testdata/sf0.001"


def test_pps_sample_matches_keyed_uniform():
    got = (
        diagnostics.pps_sample(SF)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    eid = ev["event_id"].to_numpy()
    v_e6 = np.floor(ev["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    u = keyed_uniform(eid, 41)  # independent path to the same hash stream
    keep = u < v_e6 / 500_000_000.0
    assert got["event_id"].tolist() == sorted(eid[keep].tolist())
    # inclusion probability proportional to value: kept mean value must
    # exceed the population mean (size-biased sampling)
    assert got["value_micro"].mean() > v_e6.mean()


def test_pps_sample_partition_invariant():
    a = diagnostics.pps_sample(SF).to_pandas().sort_values("event_id")
    b = diagnostics.pps_sample(SF).to_pandas().sort_values("event_id")
    assert a["event_id"].tolist() == b["event_id"].tolist()


def test_type_value_corr_matches_bruteforce():
    got = (
        diagnostics.type_value_corr(SF)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    x = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    y = (ev["ts"].astype("int64").to_numpy() // 3_600_000_000) % 24
    rows = []
    for et, idx in ev.groupby("event_type").groups.items():
        xi, yi = x[idx], y[idx]
        n = len(xi)
        cov = float(n * (xi * yi).sum() - xi.sum() * yi.sum())
        vx = float(n * (xi * xi).sum() - xi.sum() ** 2)
        vy = float(n * (yi * yi).sum() - yi.sum() ** 2)
        corr = cov / (np.sqrt(vx) * np.sqrt(vy)) if vx > 0 and vy > 0 else 0.0
        rows.append((et, n, int(np.floor(corr * 1e6 + 0.5))))
    exp = pd.DataFrame(rows, columns=["event_type", "n", "corr_e6"]).sort_values(
        "event_type"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    assert (got["corr_e6"].abs() <= 1_000_000).all()


def test_source_lang_pmi_properties():
    got = diagnostics.source_lang_pmi(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    assert got["n"].sum() == len(docs)
    # expectation of exp(pmi)-weighted joint equals 1 only abstractly;
    # concrete invariant: sum over cells of n must reproduce marginals
    for s, sub in got.groupby("source"):
        assert sub["n"].sum() == (docs["source"] == s).sum()
    # PMI of an independent-ish uniform grid stays near zero, and extreme
    # |pmi| beyond ln(max(N)) is impossible by construction
    assert got["pmi_e6"].abs().max() <= int(np.log(len(docs)) * 1e6)


def test_decayed_user_score_bruteforce():
    from osm_data_3d_tiles_ray.pipelines import events as ev_mod

    got = (
        ev_mod.decayed_user_score(SF)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    anchor = np.int64(np.datetime64("2024-02-01", "us").astype(np.int64))
    tsv = ev["ts"].astype("int64").to_numpy()
    w = np.floor(
        ev["value"].to_numpy()
        * np.exp(-((anchor - tsv) / 86400000000.0) / 7.0)
        * 1e6
        + 0.5
    ).astype(np.int64)
    exp = (
        pd.DataFrame({"user_id": ev["user_id"], "w": w})
        .groupby("user_id")
        .agg(n_events=("w", "size"), decayed_value_e6=("w", "sum"))
        .reset_index()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))
    # decay sanity: decayed total strictly below the raw total
    raw = np.floor(ev["value"].to_numpy() * 1e6 + 0.5).astype(np.int64).sum()
    assert got["decayed_value_e6"].sum() < raw


def test_curation_matrix_composition_laws():
    from osm_data_3d_tiles_ray.pipelines import dsir as dsir_mod
    from osm_data_3d_tiles_ray.pipelines import textops

    got = dsir_mod.curation_matrix(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    assert len(got) == len(docs)  # every doc present
    for col in ("q_keep", "dedup_keeper", "contaminated", "dsir_kept", "selected"):
        assert set(got[col].unique()) <= {0, 1}
    # selected == AND of the four stage verdicts
    assert (
        got["selected"]
        == got["q_keep"]
        * got["dedup_keeper"]
        * (1 - got["contaminated"])
        * got["dsir_kept"]
    ).all()
    # stage flags agree with the standalone operators
    keepers = set(textops.dedup_exact(SF).to_pandas()["doc_id"])
    assert set(got[got["dedup_keeper"] == 1].index) == keepers
    contaminated = set(textops.decontaminate(SF).to_pandas()["doc_id"])
    assert set(got[got["contaminated"] == 1].index) == contaminated


def test_spend_gini_bruteforce():
    from osm_data_3d_tiles_ray.pipelines import mining

    got = mining.spend_gini(SF).to_pandas().iloc[0]
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    cents = np.floor(o["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64)
    spend = np.sort(
        pd.DataFrame({"c": o["o_custkey"], "v": cents})
        .groupby("c")["v"]
        .sum()
        .to_numpy()
    )
    n = len(spend)
    s = int((np.arange(1, n + 1) * spend).sum())
    t = int(spend.sum())
    assert got["n_customers"] == n
    assert got["total_cent"] == t
    assert got["rank_weighted_cent"] == s
    assert got["gini_e6"] == (2 * s - (n + 1) * t) * 1_000_000 // (n * t)
    assert 0 <= got["gini_e6"] < 1_000_000


def test_lang_length_drift_bruteforce():
    got = (
        diagnostics.lang_length_drift(SF)
        .to_pandas()
        .sort_values(["lang_a", "lang_b"])
        .reset_index(drop=True)
    )
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    langs = sorted(docs["lang"].unique())
    support = np.sort(docs["n_chars"].unique())
    rows = []
    for i, a in enumerate(langs):
        va = np.sort(docs[docs["lang"] == a]["n_chars"].to_numpy())
        for b in langs[i + 1 :]:
            vb = np.sort(docs[docs["lang"] == b]["n_chars"].to_numpy())
            ca = np.searchsorted(va, support, side="right").astype(np.int64)
            cb = np.searchsorted(vb, support, side="right").astype(np.int64)
            num = int(np.abs(ca * len(vb) - cb * len(va)).max())
            rows.append(
                (a, b, len(va), len(vb),
                 num * 1_000_000 // (len(va) * len(vb)))
            )
    exp = pd.DataFrame(
        rows, columns=["lang_a", "lang_b", "n_a", "n_b", "ks_e6"]
    )
    num_cols = ["n_a", "n_b", "ks_e6"]
    pd.testing.assert_frame_equal(
        got.astype({c: "int64" for c in num_cols}),
        exp.astype({c: "int64" for c in num_cols}),
    )
    assert (got["ks_e6"] <= 1_000_000).all()


def test_daily_cusum_bruteforce():
    from osm_data_3d_tiles_ray.pipelines import events as ev_mod

    got = (
        ev_mod.daily_cusum(SF).to_pandas().sort_values("day").reset_index(drop=True)
    )
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    daily = (
        ev.assign(day=ev["ts"].dt.floor("D"))
        .groupby("day")
        .size()
        .sort_index()
    )
    x = daily.to_numpy().astype(np.int64)
    d, t = len(x), x.sum()
    cusum = np.cumsum(x * d - t)
    assert got["n_events"].tolist() == x.tolist()
    assert got["cusum_scaled"].tolist() == cusum.tolist()
    assert got["cusum_scaled"].iloc[-1] == 0  # CUSUM closes at zero
    assert got["is_changepoint"].sum() == 1
    peak = int(np.argmax(np.abs(cusum)))
    assert got.index[got["is_changepoint"] == 1][0] == peak


def test_daily_trend_bruteforce():
    from osm_data_3d_tiles_ray.pipelines import events as ev_mod

    got = ev_mod.daily_trend(SF).to_pandas().iloc[0]
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    y = (
        ev.assign(day=ev["ts"].dt.floor("D"))
        .groupby("day")
        .size()
        .sort_index()
        .to_numpy()
        .astype(np.int64)
    )
    d = len(y)
    x = np.arange(d, dtype=np.int64)
    num = int(d * (x * y).sum() - x.sum() * y.sum())
    den = int(d * (x * x).sum() - x.sum() ** 2)
    assert got["n_days"] == d
    assert got["total_events"] == y.sum()
    assert got["slope_num"] == num
    assert got["slope_den"] == den
    assert got["slope_e6"] == (num * 1_000_000) // den  # python floor div


def test_curation_funnel_matches_matrix():
    from osm_data_3d_tiles_ray.pipelines import dsir as dsir_mod

    funnel = dsir_mod.curation_funnel(SF).to_pandas().iloc[0]
    m = dsir_mod.curation_matrix(SF).to_pandas()
    assert funnel["n_docs"] == len(m)
    assert funnel["n_quality"] == m["q_keep"].sum()
    assert funnel["n_keeper"] == m["dedup_keeper"].sum()
    assert funnel["n_contaminated"] == m["contaminated"].sum()
    assert funnel["n_dsir"] == m["dsir_kept"].sum()
    assert funnel["n_selected"] == m["selected"].sum()
    assert funnel["n_selected"] <= min(
        funnel["n_quality"], funnel["n_keeper"], funnel["n_dsir"]
    )


def test_priority_segment_independence_bruteforce():
    got = (
        diagnostics.priority_segment_independence(SF)
        .to_pandas()
        .reset_index(drop=True)
    )
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    c = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    cells = (
        j.groupby(["o_orderpriority", "c_mktsegment"]).size().reset_index(name="n")
    )
    total = int(cells["n"].sum())
    r = cells.groupby("o_orderpriority")["n"].sum()
    cc = cells.groupby("c_mktsegment")["n"].sum()
    rows = []
    for _, row in cells.iterrows():
        en = int(r[row["o_orderpriority"]]) * int(cc[row["c_mktsegment"]])
        diff = total * int(row["n"]) - en
        rows.append(
            (row["o_orderpriority"], row["c_mktsegment"], int(row["n"]), en,
             diff * diff * 1_000_000 // (total * en))
        )
    exp = (
        pd.DataFrame(
            rows,
            columns=["o_orderpriority", "c_mktsegment", "n", "expected_num",
                     "chi_term_e6"],
        )
        .sort_values(["o_orderpriority", "c_mktsegment"])
        .reset_index(drop=True)
    )
    num = ["n", "expected_num", "chi_term_e6"]
    pd.testing.assert_frame_equal(
        got.astype({k: "int64" for k in num}),
        exp.astype({k: "int64" for k in num}),
    )
    assert got["n"].sum() == len(o)  # every order lands in one cell


def test_type_top_values_bruteforce():
    from osm_data_3d_tiles_ray.pipelines import events as ev_mod

    got = (
        ev_mod.type_top_values(SF)
        .to_pandas()
        .sort_values(["event_type", "dense_rank"])
        .reset_index(drop=True)
    )
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    e6 = np.floor(ev["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    rows = []
    for et, idx in ev.groupby("event_type").groups.items():
        vals, counts = np.unique(e6[idx], return_counts=True)
        for r in range(1, min(3, len(vals)) + 1):
            v = vals[-r]
            rows.append((et, int(v), int(counts[-r]), r))
    exp = (
        pd.DataFrame(rows, columns=["event_type", "value_micro", "n", "dense_rank"])
        .sort_values(["event_type", "dense_rank"])
        .reset_index(drop=True)
    )
    num = ["value_micro", "n", "dense_rank"]
    pd.testing.assert_frame_equal(
        got.astype({k: "int64" for k in num}), exp.astype({k: "int64" for k in num})
    )
    # dense-rank law: within a type, rank r value strictly exceeds rank r+1
    for _, sub in got.groupby("event_type"):
        v = sub.sort_values("dense_rank")["value_micro"].to_numpy()
        assert (np.diff(v) < 0).all()
