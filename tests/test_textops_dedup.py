"""Dedup / jaccard 100-TB-shape regressions: the hashed dedup path must
equal a GROUP BY text exactly, and the distributed jaccard must reproduce
the known candidate verification."""

import duckdb
import numpy as np

from osm_data_3d_tiles_ray.pipelines.textops import (
    dedup_exact,
    dedup_exact_hashed,
    jaccard_ngram_pairs,
)

SF = "/root/testdata/sf0.001"


def test_dedup_hashed_equals_text_groupby(ray_session):
    got = (
        dedup_exact_hashed(SF)
        .to_pandas()
        .sort_values(["doc_id"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""SELECT min(doc_id) AS doc_id, count(*) AS n_dups
            FROM read_parquet('{SF}/documents.parquet')
            GROUP BY text ORDER BY doc_id"""
    ).df()
    assert len(got) == len(want)
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert (got["n_dups"].to_numpy() == want["n_dups"].to_numpy()).all()


def test_dedup_exact_is_the_hashed_path():
    # the engine path IS the hash-key shuffle (no full-text groupby key)
    assert dedup_exact.__doc__ and "hashed" in dedup_exact.__doc__


def test_jaccard_pairs_thresholded(ray_session):
    got = jaccard_ngram_pairs(SF).to_pandas()
    # every surviving pair meets the threshold, ids are ordered, pct sane
    assert (got["jaccard_pct"] >= 50).all()
    assert (got["doc_id"] > got["dup_of"]).all()
    assert (got["jaccard_pct"] <= 100).all()
    # pairs unique
    keys = set(zip(got["doc_id"], got["dup_of"]))
    assert len(keys) == len(got)
    # cross-check one pair against a direct shingle-set computation
    if len(got):
        a, b, pct = got.iloc[0][["doc_id", "dup_of", "jaccard_pct"]]
        texts = duckdb.sql(
            f"""SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')
                WHERE doc_id IN ({int(a)}, {int(b)})"""
        ).df()
        tmap = dict(zip(texts["doc_id"], texts["text"]))

        def sh(t):
            bb = t.encode("utf-8")
            return {bb[i : i + 4] for i in range(max(1, len(bb) - 3))}

        sa, sb = sh(tmap[int(a)]), sh(tmap[int(b)])
        j = len(sa & sb) / max(1, len(sa | sb))
        assert int(round(j * 100)) == int(pct)


def test_short_text_shingles_distinct():
    """Sub-4-byte texts must get DISTINCT shingle sets (a shared {0}
    sentinel made any two short docs verify as jaccard 100)."""
    import numpy as np

    from osm_data_3d_tiles_ray.pipelines.textops import _shingle_set_u32

    sets = _shingle_set_u32(np.array(["ab", "cd", "ab", "", "abcd"], dtype=object))
    assert not np.array_equal(sets[0], sets[1])
    assert np.array_equal(sets[0], sets[2])
    assert not np.array_equal(sets[0], sets[3])


def test_tdigest_compress_no_nan_at_tail():
    """Accumulated q can exceed 1.0 by float error; arcsin must be clamped
    (NaN k-values silently degrade tail compression)."""
    import numpy as np

    from osm_data_3d_tiles_ray.pipelines.events import _tdigest_compress

    rng = np.random.default_rng(7)
    v = np.concatenate([rng.standard_normal(5000), np.full(5000, 3.0)])
    with np.errstate(invalid="raise"):
        m, c = _tdigest_compress(v, np.ones(len(v)), 200)
    assert np.isfinite(m).all() and np.isfinite(c).all()
    assert c.sum() == len(v)


def test_dedup_clusters_matches_union_find(ray_session):
    """Connected components over prefix/suffix-equality edge union must
    equal an exact union-find on the same relations (min-reachable ids)."""
    import collections

    from osm_data_3d_tiles_ray.pipelines.textops import dedup_clusters

    got = dict(
        zip(
            *(lambda d: (d["doc_id"], d["cluster_id"]))(
                dedup_clusters(SF).to_pandas()
            )
        )
    )
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).df()
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for key_fn in (lambda t: t[:64], lambda t: t[::-1][:64]):
        groups = collections.defaultdict(list)
        for d, t in zip(docs["doc_id"], docs["text"]):
            groups[key_fn(t)].append(d)
        for g in groups.values():
            m = min(g)
            for d in g:
                union(d, m)

    want = {d: find(d) for d in docs["doc_id"]}
    assert got == want


def test_token_count_bpe_nonneg(ray_session):
    from osm_data_3d_tiles_ray.pipelines.textops import token_count_bpe

    df = token_count_bpe(SF).to_pandas()
    assert (df["n_bpe_tokens"] >= 0).all() and df["n_bpe_tokens"].sum() > 0


def test_tf_idf_hand_values(tmp_path, ray_session):
    """3-doc corpus: tfidf = tf * ln(N/df) against hand computation."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_data_3d_tiles_ray.pipelines.textops import tf_idf

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(["a a b", "a c", "c  c"]),  # double space → empty tok dropped
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([5, 3, 4], type=pa.int64()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    got = {
        (r.doc_id, r.term): r.tfidf_micro
        for r in tf_idf(str(tmp_path)).to_pandas().itertuples()
    }
    ln = np.log
    expect = {
        (0, "a"): int(np.floor(2 * ln(3 / 2) * 1e6 + 0.5)),
        (0, "b"): int(np.floor(1 * ln(3 / 1) * 1e6 + 0.5)),
        (1, "a"): int(np.floor(1 * ln(3 / 2) * 1e6 + 0.5)),
        (1, "c"): int(np.floor(1 * ln(3 / 2) * 1e6 + 0.5)),
        (2, "c"): int(np.floor(2 * ln(3 / 2) * 1e6 + 0.5)),
    }
    assert got == expect


def test_seq_pack_prefix_semantics(tmp_path, ray_session):
    """4 docs with known token counts pack exactly as concat-then-chunk."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_data_3d_tiles_ray.pipelines.textops import seq_pack

    texts = ["a b c", "d e", "f g h i", "j"]  # 3, 2, 4, 1 tokens
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    df = seq_pack(str(tmp_path), budget=4, n_ranges=2).to_pandas().sort_values("doc_id")
    # prefixes: 0, 3, 5, 9 → examples 0,0,1,2 at offsets 0,3,1,1
    assert df["example_id"].tolist() == [0, 0, 1, 2]
    assert df["tok_offset"].tolist() == [0, 3, 1, 1]


def test_top_terms_exact_when_vocab_fits(ray_session):
    """sf0.01 corpus vocabulary fits MG capacity → counts exact vs DuckDB."""
    import duckdb

    from osm_data_3d_tiles_ray.pipelines.textops import top_terms

    got = top_terms("/root/testdata/sf0.01", capacity=256, k=5)
    exact = duckdb.sql("""
        WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term
                     FROM read_parquet('/root/testdata/sf0.01/documents.parquet'))
        SELECT term, COUNT(*) c FROM tok WHERE term <> ''
        GROUP BY 1 ORDER BY c DESC, term LIMIT 5
    """).fetchall()
    assert [
        (t.as_py(), c.as_py())
        for t, c in zip(got.column("term"), got.column("est_count"))
    ] == [(t, c) for t, c in exact]


def test_top_terms_heavy_hitter_survives_truncation(tmp_path, ray_session):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_data_3d_tiles_ray.pipelines.textops import top_terms

    # 500 rare terms (1×) + one heavy term (200×), capacity 16
    rng = np.random.default_rng(3)
    texts = [f"rare{i}" for i in range(500)] + ["heavy"] * 200
    rng.shuffle(texts)
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    got = top_terms(str(tmp_path), capacity=16, k=1)
    assert got.column("term")[0].as_py() == "heavy"
    assert got.column("est_count")[0].as_py() >= 200 - (700 // 16)


def test_decontaminate_hand_case(tmp_path, ray_session):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_data_3d_tiles_ray.pipelines.textops import decontaminate

    texts = [
        "a b c d e",      # train 0: shares trigram "b c d" with eval
        "x y z w v",      # train 1: clean
        "q b c d r",      # train 2: shares "b c d"
        "m b c q d",      # train 3: has b c but not "b c d" — clean
        "k b c d n",      # eval doc
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(5, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 5),
            "source": pa.array(["train", "train", "train", "train", "evalset"]),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    got = sorted(
        decontaminate(str(tmp_path), eval_source="evalset", n=3)
        .to_pandas()["doc_id"]
        .tolist()
    )
    assert got == [0, 2]


def test_leakage_safe_split_keeps_clusters_together(ray_session):
    import pandas as pd

    from osm_data_3d_tiles_ray.pipelines.textops import dedup_clusters, leakage_safe_split

    clusters = dedup_clusters("/root/testdata/sf0.01").to_pandas()
    split = leakage_safe_split("/root/testdata/sf0.01").to_pandas()
    merged = clusters.merge(split, on="doc_id")
    # THE property: one split per cluster, no near-dup straddles
    per_cluster = merged.groupby("cluster_id")["split"].nunique()
    assert (per_cluster == 1).all()
    # and all three splits are populated at this scale
    assert set(merged["split"]) == {"train", "val", "test"}


def test_cms_never_undercounts_and_is_tight_here(ray_session):
    """CMS one-sided error: estimate >= true count always; equal here
    (width 1024 >> vocab, negligible collisions)."""
    import duckdb

    from osm_data_3d_tiles_ray.pipelines.textops import term_counts_cms

    got = term_counts_cms("/root/testdata/sf0.01", probe_terms=8)
    exact = dict(
        duckdb.sql("""
            WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term
                         FROM read_parquet('/root/testdata/sf0.01/documents.parquet'))
            SELECT term, COUNT(*) FROM tok WHERE term <> '' GROUP BY 1
        """).fetchall()
    )
    for t, c in zip(got.column("term"), got.column("est_count")):
        t, c = t.as_py(), c.as_py()
        assert c >= exact[t], (t, c, exact[t])
        assert c <= exact[t] * 1.02 + 5, (t, c, exact[t])


def test_source_mixture_rates(ray_session):
    """Even sources halved, odd kept, deterministic across runs."""
    from osm_data_3d_tiles_ray.pipelines.textops import source_mixture

    df = source_mixture("/root/testdata/sf0.01").to_pandas()
    df2 = source_mixture("/root/testdata/sf0.01").to_pandas()
    assert sorted(df["doc_id"]) == sorted(df2["doc_id"])  # reproducible
    counts = df.groupby("source")["doc_id"].count()
    # 25 docs per source in this corpus; even sources keep ~half
    assert counts["src1"] == 25  # odd sources keep everything
    evens = [f"src{i}" for i in range(0, 20, 2)]
    kept_even = sum(int(counts.get(s, 0)) for s in evens)
    assert 90 < kept_even < 160  # ~half of the 250 even-source docs


def test_seq_pack_randomized_vs_bruteforce(tmp_path, ray_session):
    """3 seeded random corpora with varied token counts: distributed scan
    must equal the serial prefix computation exactly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_data_3d_tiles_ray.pipelines.textops import seq_pack

    for seed in range(3):
        rng = np.random.default_rng(100 + seed)
        n = 200
        texts = [" ".join(["w"] * int(k)) for k in rng.integers(0, 40, n)]
        d = tmp_path / f"s{seed}"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                    "text": pa.array(texts),
                    "lang": pa.array(["en"] * n),
                    "source": pa.array(["s"] * n),
                    "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
                }
            ),
            d / "documents.parquet",
        )
        got = (
            seq_pack(str(d), budget=64, n_ranges=7)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ntok = np.array([len(t.split()) if t else 0 for t in texts], dtype=np.int64)
        prefix = np.concatenate([[0], np.cumsum(ntok)[:-1]])
        assert got["example_id"].tolist() == (prefix // 64).tolist(), f"seed {seed}"
        assert got["tok_offset"].tolist() == (prefix % 64).tolist(), f"seed {seed}"


def test_doc_repetition_brute_force(ray_session):
    """Engine repetition signals equal a per-doc Python Counter oracle."""
    import collections

    import pandas as pd

    from osm_data_3d_tiles_ray.pipelines.textops import doc_repetition

    out = doc_repetition(SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    assert len(out) == len(docs)
    for _, r in docs.iterrows():
        words = r.text.split(" ")
        wc = collections.Counter(words)
        bc = collections.Counter(zip(words, words[1:]))
        row = out.loc[r.doc_id]
        assert row.n_words == len(words)
        assert row.n_unique_words == len(wc)
        assert row.top_word_count == max(wc.values())
        assert row.n_bigrams == max(len(words) - 1, 0)
        assert row.top_bigram_count == (max(bc.values()) if bc else 0)


def test_stratified_sample_exact_quota(ray_session):
    """Tree-combined stratified sample equals the global hash-rank oracle."""
    import pandas as pd

    from osm_data_3d_tiles_ray.pipelines.textops import stratified_sample

    quota = 7
    out = stratified_sample(SF, quota=quota).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "source"]]
    docs["h"] = (
        docs.doc_id.to_numpy().astype(np.uint64) * np.uint64(2654435761)
    ) % np.uint64(2**32)
    expect = (
        docs.sort_values(["source", "h", "doc_id"]).groupby("source").head(quota)
    )
    assert set(zip(out.doc_id, out.source)) == set(
        zip(expect.doc_id, expect.source)
    )
    sizes = out.groupby("source").size()
    full = docs.groupby("source").size()
    for src, n_avail in full.items():
        assert sizes.get(src, 0) == min(quota, n_avail)


def test_quality_filter_brute_force(ray_session, tmp_path):
    import collections

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_data_3d_tiles_ray.pipelines.textops import quality_filter

    out = quality_filter(SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    for _, r in docs.iterrows():
        words = r.text.split(" ")
        top = max(collections.Counter(words).values())
        n_alpha = sum(ch.isascii() and ch.isalpha() for ch in r.text)
        if len(words) < 12:
            want = "short"
        elif 4 * top > len(words):
            want = "repetitive"
        elif 10 * n_alpha < 7 * len(r.text):
            want = "low_alpha"
        else:
            want = "ok"
        row = out.loc[r.doc_id]
        assert row.reason == want, r.doc_id
        assert row.keep == int(want == "ok")

    # the sf corpus never triggers low_alpha — exercise that branch too
    texts = [
        "1 2 3 4 5 6 7 8 9 10 11 12 13 14",
        "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike nov",
    ]
    d = tmp_path / "la"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en", "en"]),
                "source": pa.array(["s", "s"]),
                "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    got = quality_filter(str(d)).to_pandas().set_index("doc_id")
    assert got.loc[0].reason == "low_alpha" and got.loc[0].keep == 0
    assert got.loc[1].reason == "ok" and got.loc[1].keep == 1


def test_chunk_dedup_brute_force(ray_session):
    import collections

    import pandas as pd

    from osm_data_3d_tiles_ray.pipelines.textops import chunk_dedup

    K = 8
    out = chunk_dedup(SF, k=K).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    corpus = collections.Counter()
    per_doc = {}
    for _, r in docs.iterrows():
        words = r.text.split(" ")
        chunks = [
            tuple(words[j * K : (j + 1) * K]) for j in range(len(words) // K)
        ]
        per_doc[r.doc_id] = chunks
        corpus.update(chunks)
    assert len(out) == len(docs)
    for doc_id, chunks in per_doc.items():
        row = out.loc[doc_id]
        assert row.n_chunks == len(chunks)
        assert row.n_dup_chunks == sum(corpus[c] >= 2 for c in chunks)


def test_embedding_centroid_sim_brute_force(ray_session):
    import pandas as pd

    from osm_data_3d_tiles_ray.pipelines.ann import embedding_centroid_sim

    out = embedding_centroid_sim(SF).to_pandas().set_index("vec_id")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    m = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    lab = emb.label.to_numpy()
    for l in np.unique(lab):
        c = m[lab == l].mean(axis=0)
        sims = (m[lab == l] @ c) / (
            np.linalg.norm(m[lab == l], axis=1) * np.linalg.norm(c)
        )
        want = np.floor(sims * 1e6 + 0.5).astype(np.int64)
        got = out.loc[emb.vec_id[lab == l]].centroid_sim_e6.to_numpy()
        assert (np.abs(got - want) <= 1).all()


def test_bm25_topk_brute_force(ray_session):
    import collections

    import pandas as pd

    from osm_data_3d_tiles_ray.pipelines.textops import bm25_topk

    k1, b, K = 1.2, 0.75, 10
    out = (
        bm25_topk(SF)
        .to_pandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    toks = {r.doc_id: [w for w in r.text.split(" ") if w] for _, r in docs.iterrows()}
    n_docs = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    df = collections.Counter()
    for t in toks.values():
        df.update(set(t))
    rows = []
    for qid in range(5):
        qset = set(toks[qid])
        scores = []
        for did, t in toks.items():
            if did == qid:
                continue
            tf = collections.Counter(t)
            s = 0.0
            for term in qset & set(t):
                idf = np.log((n_docs - df[term] + 0.5) / (df[term] + 0.5) + 1.0)
                s += idf * tf[term] * (k1 + 1) / (
                    tf[term] + k1 * (1 - b + b * len(t) / avgdl)
                )
            if s > 0:
                scores.append((int(np.floor(s * 1e6 + 0.5)), did))
        scores.sort(key=lambda x: (-x[0], x[1]))
        for rank, (se6, did) in enumerate(scores[:K], 1):
            rows.append((qid, did, se6, rank))
    want = pd.DataFrame(rows, columns=["qid", "doc_id", "score_e6", "rank"])
    assert out[["qid", "doc_id", "rank"]].values.tolist() == want[
        ["qid", "doc_id", "rank"]
    ].values.tolist()
    assert (np.abs(out.score_e6.to_numpy() - want.score_e6.to_numpy()) <= 1).all()
