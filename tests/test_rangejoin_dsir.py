"""Oracles for the range-join family and the DSIR/CCNet selection ops.

Each test re-derives the expected result with an INDEPENDENT brute-force
numpy/pandas implementation (never the engine's own kernels) at sf0.001.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from osm_data_3d_tiles_ray.pipelines import dsir, rangejoin

SF = "/root/testdata/sf0.001"


def _events_df() -> pd.DataFrame:
    return pq.read_table(f"{SF}/events.parquet").to_pandas()


def test_event_attribution_matches_bruteforce():
    got = (
        rangejoin.event_attribution(SF)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ev = _events_df()
    ts = ev["ts"].astype("int64").to_numpy()
    uid = ev["user_id"].to_numpy()
    val = np.floor(ev["value"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    win = np.int64(3_600_000_000)
    rows = []
    anchors = ev["event_type"].to_numpy() == "purchase"
    for i in np.flatnonzero(anchors):
        t1 = ts[i]  # microseconds (same cast as the ts array)
        m = (uid == uid[i]) & (ts >= t1 - win) & (ts < t1)
        rows.append(
            (ev["event_id"].iat[i], uid[i], int(m.sum()), int(val[m].sum()))
        )
    exp = (
        pd.DataFrame(
            rows, columns=["event_id", "user_id", "n_prior", "sum_value_micro"]
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))
    assert (got["n_prior"] > 0).any()  # window actually matches something


def test_event_attribution_partition_invariant():
    a = rangejoin.event_attribution(SF).to_pandas()
    b = rangejoin.event_attribution(SF).to_pandas()
    key = ["event_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_neighbor_density_matches_bruteforce():
    from osm_data_3d_tiles_ray.synth.generator import ensure_synth, sf_from_dir

    got = (
        rangejoin.neighbor_density(SF, radius_m=500.0)
        .to_pandas()
        .sort_values("osm_id")
        .reset_index(drop=True)
    )
    root = ensure_synth(sf_from_dir(SF))
    import glob

    b = pd.concat(
        [pq.read_table(f).to_pandas() for f in sorted(glob.glob(f"{root}/buildings/*.parquet"))]
    )
    cx = np.floor(b["centroid_x"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    cy = np.floor(b["centroid_y"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    oid = b["osm_id"].to_numpy()
    r = np.int64(500_000_000)
    # O(n^2) box count (2k points at sf0.001 — fine)
    hit = (
        (np.abs(cx[:, None] - cx[None, :]) <= r)
        & (np.abs(cy[:, None] - cy[None, :]) <= r)
        & (oid[:, None] != oid[None, :])
    )
    exp = (
        pd.DataFrame({"osm_id": oid, "n_neighbors": hit.sum(axis=1).astype(np.int64)})
        .sort_values("osm_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))
    assert got["n_neighbors"].max() > 0


def test_dsir_score_matches_bruteforce():
    got = (
        dsir.dsir_score(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    from collections import Counter

    ct: Counter = Counter()
    c_all: Counter = Counter()
    toks = {}
    for _, d in docs.iterrows():
        ws = [w for w in d["text"].split(" ") if w]
        toks[d["doc_id"]] = ws
        c_all.update(ws)
        if d["source"] == "src0":
            ct.update(ws)
    v = len(c_all)
    tt = sum(ct.values())
    tr = sum(c_all.values()) - tt
    rows = []
    for did, ws in toks.items():
        if not ws:
            continue
        s = 0
        for w in ws:
            s += int(np.floor(np.log((ct[w] + 1) / (tt + v)) * 1e6 + 0.5)) - int(
                np.floor(np.log((c_all[w] - ct[w] + 1) / (tr + v)) * 1e6 + 0.5)
            )
        rows.append((did, len(ws), s, int(s > 0)))
    exp = (
        pd.DataFrame(rows, columns=["doc_id", "n_tok", "dsir_e6", "kept"])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))
    # target-source docs should score high: most kept docs include src0's
    kept = set(got[got["kept"] == 1]["doc_id"])
    src0 = set(docs[docs["source"] == "src0"]["doc_id"])
    assert len(kept & src0) >= len(src0) // 2


def test_ccnet_buckets_properties():
    got = dsir.ccnet_buckets(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    # every doc with >= 2 tokens is scored and bucketed
    n_scorable = sum(
        1 for t in docs["text"] if len([w for w in t.split(" ") if w]) >= 2
    )
    assert len(got) == n_scorable
    assert set(got["bucket"]) <= {"head", "middle", "tail"}
    for lang, sub in got.groupby("lang"):
        h = sub[sub["bucket"] == "head"]["logprob_e6"]
        m = sub[sub["bucket"] == "middle"]["logprob_e6"]
        t = sub[sub["bucket"] == "tail"]["logprob_e6"]
        # buckets are ordered by log-probability (head = most fluent)
        if len(h) and len(m):
            assert h.min() > m.max()
        if len(m) and len(t):
            assert m.min() > t.max()
        # tercile sizes: each bucket holds >= ceil(n/3) - a tie-margin
        n = len(sub)
        assert len(t) >= (33 * n + 99) // 100 - 1 or n < 3


def test_dup_span_coverage_bruteforce():
    from collections import Counter

    from osm_data_3d_tiles_ray.pipelines import textops

    got = (
        textops.dup_span_coverage(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    grams = {}
    tot: Counter = Counter()
    for _, d in docs.iterrows():
        ws = [w for w in d["text"].split(" ") if w]
        gs = [tuple(ws[i : i + 3]) for i in range(len(ws) - 2)]
        grams[d["doc_id"]] = gs
        tot.update(gs)
    rows = []
    for did, gs in grams.items():
        if not gs:
            continue
        nd = sum(1 for g in gs if tot[g] >= 2)
        rows.append((did, len(gs), nd, (nd * 1_000_000) // len(gs)))
    exp = (
        pd.DataFrame(
            rows,
            columns=["doc_id", "n_windows", "n_dup_windows", "dup_frac_e6"],
        )
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))
    assert got["n_dup_windows"].sum() > 0


def test_curriculum_rank_is_permutation():
    from osm_data_3d_tiles_ray.pipelines import textops

    got = textops.curriculum_rank(SF).to_pandas().sort_values("rank")
    n = len(got)
    assert got["rank"].tolist() == list(range(1, n + 1))  # exact permutation
    # ordering law: rank ascending == (n_chars desc, doc_id asc)
    key = list(zip(-got["n_chars"].to_numpy(), got["doc_id"].to_numpy()))
    assert key == sorted(key)
