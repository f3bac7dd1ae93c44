"""Brute-force oracles for the round-3 session operators: doc chunking,
JSON props extraction, cohort retention (and later additions)."""

import json

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_doc_chunks_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.textops import doc_chunks

    got = doc_chunks(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = []
    for doc_id, text in zip(docs.doc_id, docs.text):
        n = len([w for w in text.split() if w])
        if n == 0:
            continue
        k = -(-max(n - 32, 1) // 96)
        for c in range(k):
            want.append((doc_id, c, c * 96, min(128, n - c * 96)))
    got_rows = sorted(
        zip(got.doc_id, got.chunk_id, got.tok_start, got.n_tokens)
    )
    assert [tuple(map(int, r)) for r in got_rows] == sorted(want)
    # invariants: full coverage, exact overlap between consecutive chunks
    for doc_id, c, start, ntok in want:
        assert ntok >= 1
        if c > 0:
            prev_end = (c - 1) * 96 + 128
            assert start < prev_end  # overlap


def test_doc_chunks_edge_lengths(ray_session):
    # boundary arithmetic: n = stride, chunk, chunk+1 land correctly
    from osm_data_3d_tiles_ray.pipelines.textops import doc_chunks  # noqa: F401

    def n_chunks(n, chunk=128, overlap=32):
        stride = chunk - overlap
        return 0 if n == 0 else -(-max(n - overlap, 1) // stride)

    assert n_chunks(0) == 0
    assert n_chunks(1) == 1
    assert n_chunks(96) == 1
    assert n_chunks(128) == 1
    assert n_chunks(129) == 2
    assert n_chunks(224) == 2
    assert n_chunks(225) == 3


def test_props_k_histogram_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.events import props_k_histogram

    got = props_k_histogram(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["k_bin"] = [json.loads(p)["k"] // 10 for p in ev.props]
    ev["e4"] = np.floor(ev.value.to_numpy() * 1e4 + 0.5).astype(np.int64)
    want = ev.groupby(["event_type", "k_bin"]).agg(
        n=("e4", "size"), sum_value_e4=("e4", "sum")
    )
    got_d = {
        (r.event_type, int(r.k_bin)): (int(r.n), int(r.sum_value_e4))
        for r in got.itertuples()
    }
    want_d = {
        (et, int(kb)): (int(r.n), int(r.sum_value_e4))
        for (et, kb), r in want.iterrows()
    }
    assert got_d == want_d


def test_retention_cohorts_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.events import retention_cohorts

    got = retention_cohorts(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["day"] = ev.ts.dt.floor("D")
    ud = ev[["user_id", "day"]].drop_duplicates()
    first = ud.groupby("user_id").day.min().rename("cohort")
    j = ud.join(first, on="user_id")
    j["off"] = (j.day - j.cohort).dt.days
    want = j.groupby(["cohort", "off"]).size()
    got_d = {
        (r.cohort_day, int(r.day_offset)): int(r.n_users)
        for r in got.itertuples()
    }
    want_d = {(c, int(o)): int(n) for (c, o), n in want.items()}
    assert got_d == want_d
    # cohort sizes: offset-0 row equals the number of users first seen that day
    day0 = {c: n for (c, o), n in want_d.items() if o == 0}
    sizes = first.value_counts().to_dict()
    assert day0 == {c: int(n) for c, n in sizes.items()}


def test_returned_customers_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import returned_customers

    got = returned_customers(SF, k=10).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    o = orders[
        (orders.o_orderdate >= pd.Timestamp("1996-07-01"))
        & (orders.o_orderdate < pd.Timestamp("1996-10-01"))
    ]
    l = li[li.l_returnflag == "R"].copy()
    l["cent"] = np.floor(
        l.l_extendedprice.to_numpy() * (1 - l.l_discount.to_numpy()) * 100
        + 0.5
    ).astype(np.int64)
    j = l.merge(o[["o_orderkey", "o_custkey"]], left_on="l_orderkey",
                right_on="o_orderkey")
    rev = j.groupby("o_custkey").cent.sum().reset_index()
    rev = rev.sort_values(["cent", "o_custkey"], ascending=[False, True])
    top = rev.head(10)
    names = dict(zip(cust.c_custkey, cust.c_name))
    want = {
        int(r.o_custkey): (names[int(r.o_custkey)], int(r.cent))
        for r in top.itertuples()
    }
    got_d = {
        int(r.c_custkey): (r.c_name, int(r.revenue_cent))
        for r in got.itertuples()
    }
    assert got_d == want
    assert len(want) > 0, "fixture should have returned items in window"


def test_parts_supplier_count_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import parts_supplier_count

    got = parts_supplier_count(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")
    j = li[["l_partkey", "l_suppkey"]].merge(
        part[["p_partkey", "p_brand", "p_type", "p_size"]],
        left_on="l_partkey", right_on="p_partkey",
    )
    want = (
        j.groupby(["p_brand", "p_type", "p_size"]).l_suppkey.nunique()
    ).to_dict()
    got_d = {
        (r.p_brand, r.p_type, int(r.p_size)): int(r.supplier_cnt)
        for r in got.itertuples()
    }
    assert got_d == {(b, t, int(s)): int(n) for (b, t, s), n in want.items()}


def test_bigram_lm_score_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.textops import bigram_lm_score

    got = bigram_lm_score(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    from collections import Counter

    bc, uc = Counter(), Counter()
    doc_bigrams = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        toks = [w for w in text.split(" ") if w]
        bgs = list(zip(toks[:-1], toks[1:]))
        if bgs:
            doc_bigrams[doc_id] = bgs
        bc.update(bgs)
        uc.update(w1 for w1, _ in bgs)
    V = len(uc)
    want = {}
    for doc_id, bgs in doc_bigrams.items():
        lp = sum(
            int(np.floor(np.log((bc[b] + 1.0) / (uc[b[0]] + V)) * 1e6 + 0.5))
            for b in bgs
        )
        want[doc_id] = (len(bgs), lp)
    got_d = {
        int(r.doc_id): (int(r.n_bigrams), int(r.logprob_e6))
        for r in got.itertuples()
    }
    assert got_d == want


def test_type_transitions_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.events import type_transitions

    got = type_transitions(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    from collections import Counter

    cnt = Counter()
    for _, g in ev.groupby("user_id"):
        types = g.event_type.tolist()
        cnt.update(zip(types[:-1], types[1:]))
    tot = Counter()
    for (p, _), n in cnt.items():
        tot[p] += n
    want = {
        (p, nx): (n, n * 1_000_000 // tot[p]) for (p, nx), n in cnt.items()
    }
    got_d = {
        (r.prev_type, r.next_type): (int(r.n), int(r.prob_e6))
        for r in got.itertuples()
    }
    assert got_d == want
    # each prev row's probabilities sum to ~1 (floor division undershoot)
    by_prev = {}
    for (p, _), (_, pe6) in got_d.items():
        by_prev[p] = by_prev.get(p, 0) + pe6
    for p, s in by_prev.items():
        assert 1_000_000 - len([1 for k in got_d if k[0] == p]) <= s <= 1_000_000


def test_hourly_anomaly_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.events import hourly_anomaly

    got = hourly_anomaly(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["hour"] = ev.ts.dt.floor("h")
    h = ev.groupby(["event_type", "hour"]).size().rename("n").reset_index()
    want = {}
    for et, g in h.groupby("event_type"):
        g = g.sort_values("hour")
        hrs = (g.hour.astype("int64").to_numpy() // 3_600_000_000)
        c = g.n.to_numpy().astype(np.int64)
        for i in range(len(c)):
            mask = (hrs >= hrs[i] - 24) & (hrs < hrs[i])
            W = int(mask.sum())
            S = int(c[mask].sum())
            Q = int((c[mask] ** 2).sum())
            d = int(c[i]) * W - S
            if W > 0 and d > 0 and d * d > 9 * (W * Q - S * S):
                want[(et, g.hour.iloc[i])] = (int(c[i]), W, S, Q)
    got_d = {
        (r.event_type, pd.Timestamp(r.window_start)): (
            int(r.n_events), int(r.base_n), int(r.base_sum),
            int(r.base_sumsq),
        )
        for r in got.itertuples()
    }
    assert got_d == want


def test_random_projection_brute_force_and_jl(ray_session):
    from osm_data_3d_tiles_ray.geom.rng import jenkins_mix
    from osm_data_3d_tiles_ray.pipelines.ann import random_projection

    got = random_projection(SF).to_pandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    dims = len(emb.embedding.iloc[0])
    k = 16
    seeds = (
        np.arange(dims, dtype=np.uint32)[:, None] * np.uint32(k)
        + np.arange(k, dtype=np.uint32)[None, :]
    )
    signs = 1.0 - 2.0 * (jenkins_mix(seeds.ravel()) & np.uint32(1)).astype(
        np.float64
    ).reshape(dims, k)
    m = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    y = (m @ signs) / np.sqrt(k)
    want_e6 = np.floor(y * 1e6 + 0.5).astype(np.int64)
    got_piv = got.pivot(index="vec_id", columns="j", values="y_e6")
    got_mat = got_piv.loc[emb.vec_id].to_numpy()
    assert (got_mat == want_e6).all()
    # JL property: projected pairwise sq-distances concentrate around the
    # originals (loose bound — sanity, not a proof)
    rng = np.random.default_rng(7)
    idx = rng.choice(len(m), size=(50, 2))
    idx = idx[idx[:, 0] != idx[:, 1]]
    d_orig = np.sum((m[idx[:, 0]] - m[idx[:, 1]]) ** 2, axis=1)
    d_proj = np.sum((y[idx[:, 0]] - y[idx[:, 1]]) ** 2, axis=1)
    ratio = d_proj / d_orig
    assert 0.3 < np.median(ratio) < 1.7


def test_linestatus_priority_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import linestatus_priority

    got = linestatus_priority(SF).to_pandas().set_index("l_linestatus")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    l = li[
        (li.l_shipdate >= pd.Timestamp("1996-01-01"))
        & (li.l_shipdate < pd.Timestamp("1997-01-01"))
    ]
    j = l.merge(
        orders[["o_orderkey", "o_orderpriority"]],
        left_on="l_orderkey", right_on="o_orderkey",
    )
    j["high"] = j.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    want = j.groupby("l_linestatus").high.agg(["sum", "count"])
    for ls, r in want.iterrows():
        assert int(got.loc[ls].high_line_count) == int(r["sum"])
        assert int(got.loc[ls].low_line_count) == int(r["count"] - r["sum"])
    assert set(got.index) == set(want.index)


def test_corpus_prep_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.textops import corpus_prep

    got = corpus_prep(SF).to_pandas().sort_values("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    surv = []
    seen_texts = {}
    for doc_id, text in sorted(zip(docs.doc_id, docs.text)):
        words = text.split(" ")
        n_words = len(words)
        from collections import Counter

        top = max(Counter(words).values()) if words else 0
        n_chars = len(text)
        n_alpha = sum(ch.isascii() and ch.isalpha() for ch in text)
        if n_words < 12 or 4 * top > n_words or 10 * n_alpha < 7 * n_chars:
            continue
        if text in seen_texts:
            continue
        seen_texts[text] = doc_id
        surv.append((doc_id, len([w for w in text.split() if w])))
    prefix = 0
    want = []
    for doc_id, ntok in surv:
        want.append((doc_id, prefix // 512, prefix % 512))
        prefix += ntok
    got_rows = [
        (int(r.doc_id), int(r.example_id), int(r.tok_offset))
        for r in got.itertuples()
    ]
    assert got_rows == want
    assert len(want) > 0


def test_source_contamination_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.textops import source_contamination

    got = source_contamination(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    per_src = {}
    for src, text in zip(docs.source, docs.text):
        a = text.split(" ")
        chunks = {
            " ".join(a[j * 8:(j + 1) * 8]) for j in range(len(a) // 8)
        }
        per_src.setdefault(src, set()).update(chunks)
    srcs = sorted(per_src)
    want = {}
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            n = len(per_src[sa] & per_src[sb])
            if n:
                want[(sa, sb)] = n
    got_d = {
        (r.src_a, r.src_b): int(r.n_shared_chunks) for r in got.itertuples()
    }
    assert got_d == want


def test_bpe_merge_candidates_brute_force(ray_session):
    from collections import Counter

    from osm_data_3d_tiles_ray.pipelines.textops import bpe_merge_candidates

    got = bpe_merge_candidates(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    cnt = Counter()
    for text in docs.text:
        for w in text.split(" "):
            if not w:
                continue
            for i in range(len(w) - 1):
                cnt[w[i:i + 2]] += 1
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    want = [(p, n, r) for r, (p, n) in enumerate(ranked, 1)]
    got_rows = sorted(
        [(r.pair, int(r.n), int(r["rank"])) for _, r in got.iterrows()],
        key=lambda t: t[2],
    )
    assert got_rows == want


def test_dem_zonal_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.geo import q_dem_zonal
    from osm_data_3d_tiles_ray.synth.generator import ensure_synth

    got = q_dem_zonal(SF).to_pandas().set_index("osm_id")
    root = ensure_synth(0.001)
    dem = pd.read_parquet(str(root / "dem.parquet"))
    b = pd.read_parquet(str(root / "buildings"))
    x0, y0 = dem.x0.iloc[0], dem.y0.iloc[0]
    dx, dy = dem.dx.iloc[0], dem.dy.iloc[0]
    cx = x0 + (dem.col.to_numpy() + 0.5) * dx
    cy = y0 + (dem.row.to_numpy() + 0.5) * dy
    z6 = np.floor(dem.z.to_numpy().astype(np.float64) * 1e6 + 0.5).astype(
        np.int64
    )
    rng = np.random.default_rng(3)
    for i in rng.choice(len(b), size=200, replace=False):
        r = b.iloc[i]
        m = (cx >= r.minx) & (cx <= r.maxx) & (cy >= r.miny) & (cy <= r.maxy)
        gr = got.loc[r.osm_id]
        assert int(gr.n_cells) == int(m.sum())
        assert int(gr.sum_z_e6) == int(z6[m].sum())
        if m.sum():
            assert int(gr.mean_z_e6) == int(z6[m].sum()) // int(m.sum())


def test_winnow_fingerprints_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.textops import winnow_fingerprints

    k, w = 3, 4
    got = winnow_fingerprints(SF, k=k, w=w).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = set()
    coverage_ok = True
    for doc_id, text in zip(docs.doc_id, docs.text):
        toks = [x for x in text.split(" ") if x]
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        if not grams:
            continue
        sel = set()
        n = len(grams)
        starts = range(max(n - w + 1, 1))
        for q in starts:
            win = grams[q:q + w]
            mg = min(win)
            p = q + max(i for i, g in enumerate(win) if g == mg)
            sel.add(p)
        for p in sel:
            want.add((doc_id, p, grams[p]))
        # winnowing guarantee: every window has a selection inside it
        for q in starts:
            assert any(q <= p <= q + w - 1 for p in sel)
    got_set = {
        (int(r.doc_id), int(r.pos), r.gram) for r in got.itertuples()
    }
    assert got_set == want


def test_jaccard_word_pairs_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.textops import jaccard_word_pairs

    got = jaccard_word_pairs(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    k, max_df, tau = 3, 50, 5000
    from collections import Counter

    sets = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        toks = [x for x in text.split(" ") if x]
        sets[doc_id] = {
            " ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)
        }
    df = Counter()
    for s in sets.values():
        df.update(s)
    sets = {
        d: {g for g in s if df[g] <= max_df} for d, s in sets.items()
    }
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            union = len(sets[a] | sets[b])
            if inter * 10000 >= tau * union:
                want[(a, b)] = (inter, inter * 10000 // max(union, 1))
    got_d = {
        (int(r.doc_a), int(r.doc_b)): (int(r.inter), int(r.jaccard_e4))
        for r in got.itertuples()
    }
    assert got_d == want
    assert len(want) > 0


def test_customer_order_counts_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import customer_order_counts

    got = customer_order_counts(SF).to_pandas()
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    per = orders.groupby("o_custkey").size()
    counts = cust.c_custkey.map(per).fillna(0).astype(int)
    want = counts.value_counts().to_dict()
    got_d = {int(r.c_count): int(r.custdist) for r in got.itertuples()}
    assert got_d == {int(k): int(v) for k, v in want.items()}
    assert got_d.get(0, 0) == int((counts == 0).sum())


def test_monthly_growth_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import monthly_revenue_growth

    got = monthly_revenue_growth(SF).to_pandas().sort_values("month_us")
    orders = pd.read_parquet(f"{SF}/orders.parquet").copy()
    orders["month"] = orders.o_orderdate.dt.to_period("M").dt.to_timestamp()
    orders["cent"] = np.floor(
        orders.o_totalprice.to_numpy() * 100 + 0.5
    ).astype(np.int64)
    m = orders.groupby("month").cent.sum().sort_index()
    rev = m.to_numpy()
    months = m.index.astype("int64").to_numpy()  # datetime64[ns] → ns
    assert got.month_us.tolist() == (months // 1000).tolist()
    assert got.revenue_cent.tolist() == rev.tolist()
    want_growth = [0]
    for i in range(1, len(rev)):
        d = int(rev[i] - rev[i - 1]) * 10_000
        p = max(int(rev[i - 1]), 1)
        q = abs(d) // p
        want_growth.append(q if d >= 0 else -q)
    assert got.growth_e4.tolist() == want_growth


def test_min_balance_supplier_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import min_balance_supplier

    got = min_balance_supplier(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    sup = pd.read_parquet(f"{SF}/supplier.parquet")
    bal = dict(zip(sup.s_suppkey, sup.s_acctbal))
    pairs = li[["l_partkey", "l_suppkey"]].drop_duplicates()
    want = {}
    for pk, g in pairs.groupby("l_partkey"):
        best = min(
            (bal[s], s) for s in g.l_suppkey if s in bal
        )
        want[int(pk)] = (int(best[1]), int(np.floor(best[0] * 100 + 0.5)))
    got_d = {
        int(r.p_partkey): (int(r.s_suppkey), int(r.acctbal_cent))
        for r in got.itertuples()
    }
    assert got_d == want


def test_class_cohesion_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.ann import class_cohesion

    got = class_cohesion(SF).to_pandas().set_index("label")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    m = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    u = m / np.linalg.norm(m, axis=1, keepdims=True)
    for lab in sorted(emb.label.unique()):
        ui = u[(emb.label == lab).to_numpy()]
        n = len(ui)
        sims = ui @ ui.T
        mean_pair = (sims.sum() - n) / max(n * (n - 1), 1)
        r = got.loc[int(lab)]
        assert int(r.n_vectors) == n
        assert abs(int(r.cohesion_e6) - mean_pair * 1e6) <= 1.01


def test_token_budget_mix_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.textops import token_budget_mix

    got = token_budget_mix(SF, budget=500).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet").sort_values("doc_id")
    want = {}
    acc = {}
    for doc_id, src, text in zip(docs.doc_id, docs.source, docs.text):
        n = len([w for w in text.split() if w])
        pre = acc.get(src, 0)
        want[int(doc_id)] = (src, pre, 1 if pre < 500 else 0)
        acc[src] = pre + n
    got_d = {
        int(r.doc_id): (r.source, int(r.tok_prefix), int(r.keep))
        for r in got.itertuples()
    }
    assert got_d == want
    # budget rule actually trims something and keeps something per source
    kept = got[got.keep == 1].groupby("source").size()
    assert (kept >= 1).all()
    assert (got.keep == 0).any()


def test_text_embedding_fusion_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.ann import text_embedding_fusion

    got = text_embedding_fusion(SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet").set_index("vec_id")
    from collections import Counter

    joined = 0
    for doc_id, text in zip(docs.doc_id, docs.text):
        if doc_id not in emb.index:
            continue
        joined += 1
        r = got.loc[int(doc_id)]
        words = text.split(" ")
        top = max(Counter(words).values()) if words else 0
        n_alpha = sum(ch.isascii() and ch.isalpha() for ch in text)
        keep = int(
            not (
                len(words) < 12
                or 4 * top > len(words)
                or 10 * n_alpha < 7 * len(text)
            )
        )
        assert int(r.keep) == keep
        assert int(r.n_tokens) == len([w for w in text.split() if w])
        e = emb.loc[doc_id]
        assert int(r.label) == int(e.label)
        norm = float(np.sqrt((np.asarray(e.embedding, dtype=np.float64) ** 2).sum()))
        assert int(r.norm_e6) == int(np.floor(norm * 1e6 + 0.5))
    assert joined == len(got)


def test_value_zscore_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.events import value_zscore

    got = value_zscore(SF).to_pandas().set_index("event_id")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    x = np.floor(ev.value.to_numpy() * 1e4 + 0.5).astype(np.int64)
    for et in ev.event_type.unique():
        m = (ev.event_type == et).to_numpy()
        n = int(m.sum())
        s = int(x[m].sum())
        q = int((x[m].astype(object) ** 2).sum())  # exact Python ints
        denom = np.sqrt(float(n) * float(q) - float(s) * float(s))
        want = np.floor((x[m] * n - s) * 1_000_000 / denom + 0.5).astype(np.int64)
        sub = got.loc[ev.event_id.to_numpy()[m]]
        assert (sub.z_e6.to_numpy() == want).all()
        # standardization sanity: per-type mean(z) ~ 0, std(z) ~ 1
        z = sub.z_e6.to_numpy() / 1e6
        assert abs(z.mean()) < 1e-3
        assert abs(z.std() - np.sqrt((n - 1) / n)) < 1e-2


def test_write_corpus_prep_resume(ray_session, tmp_path):
    import hashlib
    import json
    import os

    from osm_data_3d_tiles_ray.pipelines.textops import (
        corpus_prep,
        write_corpus_prep,
    )

    out = str(tmp_path / "prep_out")
    m1 = write_corpus_prep(SF, out)
    assert m1["n_partitions"] >= 1 if "n_partitions" in m1 else True

    def snapshot():
        files = {}
        for root, _, names in os.walk(os.path.join(out, "tiles")):
            for n in sorted(names):
                p = os.path.join(root, n)
                files[n] = hashlib.sha256(open(p, "rb").read()).hexdigest()
        return files

    snap1 = snapshot()
    assert len(snap1) >= 2
    # written rows == the streaming pipeline's rows
    got = pd.concat(
        [
            pd.read_parquet(os.path.join(out, "tiles", n))
            for n in sorted(snap1)
        ]
    ).sort_values("doc_id").reset_index(drop=True)
    want = corpus_prep(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

    # resume on an untouched output: every partition skips, bytes identical
    write_corpus_prep(SF, out)
    statuses = [
        json.loads(open(os.path.join(out, "lineage", f)).read())["status"]
        for f in sorted(os.listdir(os.path.join(out, "lineage")))
    ]
    assert snapshot() == snap1
    # original lineage stays "written" (skip does not rewrite records)
    assert all(s == "written" for s in statuses)

    # kill-half simulation: drop one partition file → only it is rewritten
    victim = sorted(snap1)[0]
    os.unlink(os.path.join(out, "tiles", victim))
    write_corpus_prep(SF, out)
    snap3 = snapshot()
    assert snap3 == snap1  # byte-identical reconstruction

    # stale input: corrupt one lineage fingerprint → rewrite, not skip
    lfile = os.path.join(
        out, "lineage", victim.replace(".parquet", ".json")
    )
    rec = json.loads(open(lfile).read())
    rec["input_fingerprint"] = "deadbeef"
    open(lfile, "w").write(json.dumps(rec))
    write_corpus_prep(SF, out)
    assert snapshot() == snap1
    rec2 = json.loads(open(lfile).read())
    assert rec2["input_fingerprint"] != "deadbeef"


def test_term_scrub_brute_force(ray_session):
    import re

    from osm_data_3d_tiles_ray.pipelines.textops import term_scrub

    got = (
        term_scrub(SF).to_pandas().sort_values("source").reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    pat = re.compile(r"\b(the|a|customer)\b")
    docs = docs.assign(
        hits=docs.text.map(lambda t: len(pat.findall(t))),
        left=docs.text.map(lambda t: len(pat.sub("", t))),
    )
    want = (
        docs.groupby("source")
        .agg(n_docs=("hits", "size"), n_hits=("hits", "sum"),
             scrubbed_chars=("left", "sum"))
        .reset_index()
    )
    assert got.source.tolist() == want.source.tolist()
    assert got.n_hits.tolist() == want.n_hits.tolist()
    assert got.scrubbed_chars.tolist() == want.scrubbed_chars.tolist()
    assert got.n_docs.tolist() == want.n_docs.tolist()


def test_quality_top_percent_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.textops import quality_top_percent

    got = (
        quality_top_percent(SF)
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    tok = docs.text.str.split().map(len).to_numpy()
    total = len(tok)
    rank = -(-90 * total // 100)
    srt = np.sort(tok)
    thresh = srt[rank - 1]
    # smallest t with count(<= t) >= rank == the rank-th order statistic
    keep = tok > thresh
    want = (
        pd.DataFrame({"lang": docs.lang[keep], "tok": tok[keep]})
        .groupby("lang")
        .agg(n_docs=("tok", "size"), sum_tokens=("tok", "sum"))
        .reset_index()
    )
    assert got.lang.tolist() == want.lang.tolist()
    assert got.n_docs.tolist() == want.n_docs.tolist()
    assert got.sum_tokens.tolist() == want.sum_tokens.tolist()
    # the kept fraction is at most 100-pct percent
    assert got.n_docs.sum() <= total - rank + 1


def test_tile_smooth_brute_force(ray_session):
    import collections

    from osm_data_3d_tiles_ray.pipelines.geo import q_tile_smooth, q_tile_stats

    got = (
        q_tile_smooth(SF)
        .to_pandas()
        .sort_values(["tile_x", "tile_y"])
        .reset_index(drop=True)
    )
    cells = q_tile_stats(SF).to_pandas()
    grid = dict(
        zip(zip(cells.tile_x, cells.tile_y), cells.batch_length)
    )
    rows = []
    for (x, y), c in sorted(grid.items()):
        s = sum(
            grid.get((x + dx, y + dy), 0)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        rows.append((x, y, c, s))
    want = pd.DataFrame(
        rows, columns=["tile_x", "tile_y", "n_buildings", "smooth3x3"]
    )
    for col in want.columns:
        assert got[col].astype("int64").tolist() == want[col].astype(
            "int64"
        ).tolist()
    # smoothing conserves mass up to multiplicity: every cell contributes
    # to at most 9 neighborhoods
    assert got.smooth3x3.sum() <= 9 * got.n_buildings.sum()


def test_lang_confusion_brute_force(ray_session):
    import re

    from osm_data_3d_tiles_ray.pipelines.textops import lang_confusion

    got = (
        lang_confusion(SF)
        .to_pandas()
        .sort_values(["lang", "lang_pred"])
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    markers = {
        "en": r"\b(the|and|of|is|for|with)\b",
        "fr": r"\b(le|la|les|et|des|une)\b",
        "de": r"\b(der|die|das|und|ist|mit)\b",
        "es": r"\b(el|los|las|es|una|para)\b",
    }
    langs = list(markers)

    def pred(t):
        c = [len(re.findall(markers[la], t.lower())) for la in langs]
        return "und" if max(c) == 0 else langs[c.index(max(c))]

    docs = docs.assign(lang_pred=docs.text.map(pred))
    want = (
        docs.groupby(["lang", "lang_pred"])
        .size()
        .rename("n_docs")
        .reset_index()
        .sort_values(["lang", "lang_pred"])
        .reset_index(drop=True)
    )
    assert got.lang.tolist() == want.lang.tolist()
    assert got.lang_pred.tolist() == want.lang_pred.tolist()
    assert got.n_docs.tolist() == want.n_docs.tolist()
    assert got.n_docs.sum() == len(docs)


def test_height_median_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.geo import parsed_ds, q_height_median

    got = (
        q_height_median(SF)
        .to_pandas()
        .sort_values("roof_type")
        .reset_index(drop=True)
    )
    src = parsed_ds(SF).select_columns(["roof_type", "height"]).to_pandas()
    src = src[src.height.notna()].copy()
    src["roof_type"] = src.roof_type.fillna("none")
    src["dm"] = np.floor(src.height.to_numpy() * 10 + 0.5).astype(np.int64)
    rows = []
    for rt, g in src.groupby("roof_type"):
        v = np.sort(g.dm.to_numpy())
        # lower median: smallest x with 2*count(<= x) >= n
        med = v[(len(v) - 1) // 2]
        rows.append((rt, len(v), med))
    want = pd.DataFrame(rows, columns=["roof_type", "n_buildings", "median_dm"])
    assert got.roof_type.tolist() == want.roof_type.tolist()
    assert got.n_buildings.tolist() == want.n_buildings.tolist()
    assert got.median_dm.tolist() == want.median_dm.tolist()


def test_stencil_partition_invariance(ray_session):
    """stencil_3x3 output is independent of the exchange partition count
    (the hash partitioning must not change the math)."""
    import ray.data

    import pyarrow as pa

    from osm_data_3d_tiles_ray.pipelines.partition import stencil_3x3

    rng = np.random.default_rng(7)
    n = 300
    tbl = pa.table(
        {
            "x": pa.array(rng.integers(0, 40, n).astype(np.int64)),
            "y": pa.array(rng.integers(0, 25, n).astype(np.int64)),
        }
    )
    # collapse to occupied cells with counts
    df = tbl.to_pandas().groupby(["x", "y"]).size().rename("c").reset_index()
    cells = ray.data.from_pandas(df)
    outs = []
    for parts in (3, 64):
        got = (
            stencil_3x3(cells, "x", "y", "c", num_partitions=parts)
            .to_pandas()
            .sort_values(["x", "y"])
            .reset_index(drop=True)
        )
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # own counts must reproduce the input cells exactly
    merged = outs[0].merge(df, on=["x", "y"], how="outer")
    assert len(merged) == len(df)
    assert (merged.own == merged.c).all()


def test_windowed_dedup_partition_invariance(ray_session):
    from osm_data_3d_tiles_ray.pipelines.events import windowed_dedup

    a = (
        windowed_dedup(SF, window_sec=60)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    b = (
        windowed_dedup(SF, window_sec=0)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    # window=0 only drops exact-timestamp duplicates → keeps at least as
    # many as any positive window
    assert (b.n_kept >= a.n_kept).all()
    assert (a.n_total == b.n_total).all()
    assert (a.n_kept <= a.n_total).all()


def test_exact_value_ranks_brute_force(ray_session):
    """Randomized oracle for the two-pass selection, including negatives,
    duplicates, and a tiny bucket width that forces multi-bucket paths."""
    import ray.data

    from osm_data_3d_tiles_ray.pipelines.selection import exact_value_ranks

    rng = np.random.default_rng(11)
    for trial in range(3):
        vals = np.concatenate(
            [
                rng.integers(-(10**7), 10**7, 4000),
                rng.integers(-50, 50, 1000),  # heavy duplicates near 0
            ]
        ).astype(np.int64)
        ds = ray.data.from_arrow(
            __import__("pyarrow").table({"v": vals})
        ).repartition(7)
        n = len(vals)
        ranks = [1, n // 4, n // 2, (3 * n) // 4, n]
        got = exact_value_ranks(ds, "v", ranks, bucket_bits=12)
        srt = np.sort(vals)
        for r in ranks:
            assert got[r] == srt[r - 1], (trial, r)


def test_spend_deciles_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.relational import spend_deciles

    got = spend_deciles(SF).to_pandas()
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cents = np.floor(orders.o_totalprice.to_numpy() * 100 + 0.5).astype(
        np.int64
    )
    spend = (
        pd.DataFrame({"c": orders.o_custkey, "s": cents})
        .groupby("c")
        .s.sum()
        .to_numpy()
    )
    srt = np.sort(spend)
    n = len(srt)
    for _, row in got.iterrows():
        r = (row.decile * n + 9) // 10
        assert row["rank"] == r
        assert row.threshold_cent == srt[r - 1]


def test_value_median_exact_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.events import value_median_exact

    got = value_median_exact(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    e6 = np.floor(ev.value.to_numpy() * 1e6 + 0.5).astype(np.int64)
    srt = np.sort(e6)
    rank = (len(srt) + 1) // 2
    assert got.n_events.iloc[0] == len(srt)
    assert got.median_e6.iloc[0] == srt[rank - 1]


def test_class_balanced_sample_brute_force(ray_session):
    from osm_data_3d_tiles_ray.geom.rng import jenkins_mix
    from osm_data_3d_tiles_ray.pipelines.textops import class_balanced_sample

    got = (
        class_balanced_sample(SF, cap=50)
        .to_pandas()
        .sort_values(["lang", "h", "doc_id"])
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    did = docs.doc_id.to_numpy()
    tagmix = np.uint32((123 * 2654435761) & 0xFFFFFFFF)
    h = jenkins_mix(did.astype(np.uint64).astype(np.uint32) ^ tagmix)
    h = jenkins_mix(h ^ (did.astype(np.uint64) >> np.uint64(32)).astype(np.uint32))
    df = pd.DataFrame({"doc_id": did, "lang": docs.lang, "h": h.astype(np.int64)})
    want = (
        df.sort_values(["lang", "h", "doc_id"])
        .groupby("lang")
        .head(50)
        .sort_values(["lang", "h", "doc_id"])
        .reset_index(drop=True)
    )
    assert got.doc_id.tolist() == want.doc_id.tolist()
    assert got.h.tolist() == want.h.tolist()
    # balance: every language contributes exactly min(cap, |lang|)
    sizes = docs.groupby("lang").size()
    kept = got.groupby("lang").size()
    for lang, n in sizes.items():
        assert kept.get(lang, 0) == min(50, n)
    # determinism across partitionings: a second run is identical
    again = (
        class_balanced_sample(SF, cap=50)
        .to_pandas()
        .sort_values(["lang", "h", "doc_id"])
        .reset_index(drop=True)
    )
    assert again.doc_id.tolist() == got.doc_id.tolist()


def test_type_p90_exact_brute_force(ray_session):
    from osm_data_3d_tiles_ray.pipelines.events import type_p90_exact

    got = (
        type_p90_exact(SF)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{SF}/events.parquet")
    e6 = np.floor(ev.value.to_numpy() * 1e6 + 0.5).astype(np.int64)
    df = pd.DataFrame({"t": ev.event_type, "v": e6})
    for _, row in got.iterrows():
        v = np.sort(df[df.t == row.event_type].v.to_numpy())
        assert row.n_events == len(v)
        rank = -(-90 * len(v) // 100)
        assert row.p90_e6 == v[rank - 1]
    assert got.n_events.sum() == len(ev)


def test_exact_group_quantiles_sparse_groups(ray_session):
    """Groups whose target bucket differs and a group absent from most
    batches both resolve correctly."""
    import pyarrow as pa
    import ray.data

    from osm_data_3d_tiles_ray.pipelines.selection import exact_group_quantiles

    rng = np.random.default_rng(3)
    g = np.array(["a"] * 5000 + ["b"] * 50 + ["c"] * 3)
    v = np.concatenate(
        [
            rng.integers(-(10**9), 10**9, 5000),
            rng.integers(0, 100, 50),
            np.array([7, -9, 10**12]),
        ]
    ).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"g": g, "v": v})).repartition(9)
    res = exact_group_quantiles(ds, "g", "v", q_e2=50)
    for grp in ("a", "b", "c"):
        vals = np.sort(v[g == grp])
        rank = -(-50 * len(vals) // 100)
        assert res[grp] == (len(vals), int(vals[rank - 1])), grp
