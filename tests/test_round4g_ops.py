"""Round-4 session-G operators: CDC chunk dedup, tile BFS."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _cdc_chunks_bruteforce(text: str, K: int = 8, mod: int = 64) -> list[str]:
    """Per-doc reference: scalar rolling-hash cuts (independent reimpl)."""
    b = text.encode("utf-8")
    L = len(b)
    if L == 0:
        return []  # empty doc -> zero chunks (engine/oracle convention)
    cuts = []
    for i in range(1, L - K + 1):
        h = 0
        for k in range(K):
            h = (h * 257 + b[i + k]) % (1 << 64)
        if h % mod == 0:
            cuts.append(i)
    bounds = [0] + cuts + [L]
    return [b[s:e].decode("utf-8") for s, e in zip(bounds[:-1], bounds[1:])]


def test_cdc_chunk_dedup_bruteforce(ray_session):
    from osm_data_3d_tiles_ray.pipelines.textops import cdc_chunk_dedup

    sf = "/root/testdata/sf0.001"
    got = (
        cdc_chunk_dedup(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    # brute force over the whole corpus
    from collections import Counter, defaultdict

    chunk_docs: dict[str, set] = defaultdict(set)
    per_doc: dict[int, list[str]] = {}
    for did, text in docs.items():
        ch = _cdc_chunks_bruteforce(text)
        per_doc[did] = ch
        for c in ch:
            chunk_docs[c].add(did)
    exp = {}
    for did, ch in per_doc.items():
        shared = [c for c in ch if len(chunk_docs[c]) >= 2]
        exp[did] = (len(ch), len(shared), sum(len(c) for c in shared))
    assert len(got) == len(exp)
    for row in got.itertuples():
        e = exp[row.doc_id]
        assert (row.n_chunks, row.n_shared_chunks, row.shared_chars) == e, row.doc_id

    # CDC property: inserting a prefix far from a chunk must not re-cut it —
    # chunks strictly after the edit window are preserved verbatim
    some = next(iter(docs.values()))
    edited = "XYZZY " + some
    a = _cdc_chunks_bruteforce(some)
    b = _cdc_chunks_bruteforce(edited)
    if len(a) >= 3:
        # the tail chunks (content-addressed) reappear
        assert a[-1] in b


def test_cdc_batch_invariance(ray_session):
    """Chunk stats must not depend on batch boundaries."""
    import ray.data

    from osm_data_3d_tiles_ray.pipelines import textops

    sf = "/root/testdata/sf0.001"
    a = textops.cdc_chunk_dedup(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)

    orig = textops._docs

    def small_batches(sf_dir):
        return orig(sf_dir).repartition(13)

    textops._docs = small_batches
    try:
        b = (
            textops.cdc_chunk_dedup(sf)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    finally:
        textops._docs = orig
    assert a.equals(b)


def test_tile_bfs_bruteforce(ray_session):
    """Engine BFS vs an independent heap-free BFS over the same grid."""
    from collections import deque

    import duckdb

    from osm_data_3d_tiles_ray.pipelines.geo import q_tile_bfs
    import __ray_entry__ as entry

    got = (
        q_tile_bfs("/root/testdata/sf0.01", horizon=6, n_landmarks=4)
        .to_pandas()
        .sort_values(["tile_x", "tile_y"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    occ = con.execute(
        f"SELECT tile_x, tile_y, COUNT(*) AS cnt FROM ({entry._TILE_SQL}) GROUP BY 1,2"
    ).df()
    PACK = 1 << 20
    nodes = {
        int(r.tile_x) * PACK + int(r.tile_y): int(r.cnt) for r in occ.itertuples()
    }
    lms = sorted(nodes, key=lambda n: (-nodes[n], n))[:4]
    # multi-source BFS with (hops, landmark) lexicographic labels
    best = {n: (0, n) for n in lms}
    frontier = deque(lms)
    while frontier:
        cur = frontier.popleft()
        h, lmk = best[cur]
        if h >= 6:
            continue
        tx, ty = cur // PACK, cur % PACK
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = (tx + dx) * PACK + (ty + dy)
            if nb not in nodes:
                continue
            cand = (h + 1, lmk)
            if nb not in best or cand < best[nb]:
                best[nb] = cand
                frontier.append(nb)
    # NOTE: plain BFS can settle a node with a lexicographically larger
    # landmark at equal hops; fix up with Bellman passes to the fixpoint
    changed = True
    while changed:
        changed = False
        for n in list(best):
            h, lmk = best[n]
            if h >= 6:
                continue
            tx, ty = n // PACK, n % PACK
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                nb = (tx + dx) * PACK + (ty + dy)
                if nb not in nodes:
                    continue
                cand = (h + 1, lmk)
                if cand < best.get(nb, (99, 0)):
                    best[nb] = cand
                    changed = True
    assert len(got) == len(best)
    for row in got.itertuples():
        n = int(row.tile_x) * PACK + int(row.tile_y)
        assert best[n] == (row.hops, row.landmark), (n, best[n], row)


def _patched_docs(textops, tbl):
    """Context helper: route textops._docs to an in-memory table."""
    import contextlib

    import ray.data

    @contextlib.contextmanager
    def cm():
        orig = textops._docs
        textops._docs = lambda sf: ray.data.from_arrow(tbl)
        try:
            yield
        finally:
            textops._docs = orig

    return cm()


def test_normalized_dedup_catches_case_and_punct(ray_session):
    from osm_data_3d_tiles_ray.pipelines import textops

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            "text": pa.array(
                [
                    "Hello, World!  foo",
                    "hello world foo",       # same after normalization
                    "HELLO;  world FOO",     # same after normalization
                    "a different document",
                    "a  different document", # same after whitespace collapse
                ]
            ),
        }
    )
    with _patched_docs(textops, tbl):
        df = (
            textops.normalized_dedup("ignored")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    classes = dict(zip(df.doc_id, df.n_dups))
    assert classes == {1: 3, 4: 2}
    # '!' is not in the strip set, so doc 1's class normalizes with it...
    # verify the exact normalized length of the doc-4 class
    n4 = df[df.doc_id == 4].norm_chars.iloc[0]
    assert n4 == len("a different document")


def test_delta_dedup_kinds(ray_session):
    from osm_data_3d_tiles_ray.pipelines import textops

    base_text = "the quick brown fox jumps over the lazy dog " * 8
    near_text = base_text[:-20] + "and then it stopped."
    tbl = pa.table(
        {
            # 80% split of 10 docs → base = ids 1..8, new = 9,10
            "doc_id": pa.array(list(range(1, 11)), type=pa.int64()),
            "text": pa.array(
                ["filler document %d with its own words" % i for i in range(1, 8)]
                + [base_text, base_text, near_text]
            ),
        }
    )
    with _patched_docs(textops, tbl):
        df = (
            textops.delta_dedup("ignored")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    kinds = dict(zip(df.doc_id, df.dup_kind))
    assert kinds[9] == 1          # exact copy of base doc 8
    assert kinds.get(10) == 2     # near-dup of base doc 8 (shares bands)
    assert set(kinds) == {9, 10}  # base docs never flagged


def test_embedding_near_dup_finds_planted_pairs(ray_session):
    """Plant three near-identical vectors; the Jenkins-plane LSH bucket +
    cosine verify must pair them (and only them) above threshold."""
    import ray.data

    from osm_data_3d_tiles_ray.pipelines import ann

    rngless = np.linspace(-1.0, 1.0, 16)
    base = rngless / np.linalg.norm(rngless)
    near1 = base + 1e-3
    near2 = base - 1e-3
    # orthogonal-ish fillers
    others = [np.roll(base, k) * (1 + 0.1 * k) for k in range(3, 8)]
    vecs = [base, near1, near2] + others
    tbl = pa.table(
        {
            "vec_id": pa.array(list(range(len(vecs))), type=pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  type=pa.list_(pa.float32())),
        }
    )
    import tempfile

    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as td:
        pq.write_table(tbl, f"{td}/embeddings.parquet")
        df = ann.embedding_near_dup(td).to_pandas()
    pairs = {(int(a), int(b)) for a, b in zip(df.vec_id, df.dup_of)}
    assert {(1, 0), (2, 0), (2, 1)} <= pairs
    assert (df.sim_pct >= 92).all()
    # planted trio must be ~100% similar
    assert set(df[df.dup_of == 0].sim_pct) == {100}


def test_tumbling_lateness_partitions_every_event(ray_session):
    """on_time + late_accepted + dropped must exactly partition each
    window's events, and the lateness band must be non-trivial on the
    jittered replay (both late updates AND drops occur)."""
    import duckdb

    from osm_data_3d_tiles_ray.pipelines.events import tumbling_lateness

    sf = "/root/testdata/sf0.01"
    df = tumbling_lateness(sf).to_pandas()
    total = int((df.n_on_time + df.n_late_accepted + df.n_dropped).sum())
    n_events = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{sf}/events.parquet')"
    ).fetchone()[0]
    assert total == n_events
    assert df.n_late_accepted.sum() > 0
    assert df.n_dropped.sum() > 0
    # a window's accepted sum never exceeds its full-window sum
    full = duckdb.sql(f"""
        SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS w,
               SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS s
        FROM read_parquet('{sf}/events.parquet') GROUP BY 1
    """).df().set_index("w")["s"]
    for row in df.itertuples():
        assert row.accepted_sum_micro <= full[row.window_us]


def test_cdc_empty_doc_convention(ray_session, tmp_path):
    """An empty-text document has ZERO chunks and still appears as
    (0, 0, 0) — aligned across engine, SQL oracle and brute force
    (ADVICE r4: the three previously disagreed, masked only because the
    driver corpus has no empty docs)."""
    import duckdb

    from osm_data_3d_tiles_ray.pipelines.textops import cdc_chunk_dedup

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": [
                "",
                "alpha beta gamma delta epsilon zeta eta theta " * 4,
                "",
            ],
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = (
        cdc_chunk_dedup(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [1, 2, 3]
    assert got.loc[0, ["n_chunks", "n_shared_chunks", "shared_chars"]].tolist() == [0, 0, 0]
    assert got.loc[2, ["n_chunks", "n_shared_chunks", "shared_chars"]].tolist() == [0, 0, 0]
    assert got.loc[1, "n_chunks"] >= 1
    # brute force agrees
    assert _cdc_chunks_bruteforce("") == []
    # oracle agrees row-for-row
    import __ray_entry__ as e

    sql = e.oracle_sql()["cdc_chunk_dedup"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    ora = con.execute(sql).df().sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "n_chunks", "n_shared_chunks", "shared_chars"):
        assert got[c].tolist() == ora[c].tolist(), c
