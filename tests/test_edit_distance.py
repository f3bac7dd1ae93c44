"""Edit-distance near-dup (round 5): kernel parity + operator contract."""

import numpy as np
import pyarrow as pa
import pytest


def test_levenshtein_kernel_matches_duckdb():
    """The vectorized row-DP must equal DuckDB's unit-cost levenshtein on
    random ASCII strings (including empty / equal / disjoint cases)."""
    import duckdb

    from osm_data_3d_tiles_ray.pipelines.textops import _levenshtein_bytes

    rng = np.random.default_rng(7)
    con = duckdb.connect()
    cases = [("", ""), ("", "abc"), ("abc", "abc"), ("kitten", "sitting")]
    for _ in range(60):
        la, lb = rng.integers(0, 40, 2)
        a = "".join(chr(c) for c in rng.integers(97, 102, la))  # a-e: dense
        b = "".join(chr(c) for c in rng.integers(97, 102, lb))
        cases.append((a, b))
    for a, b in cases:
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        got = _levenshtein_bytes(a.encode(), b.encode())
        assert got == want, (a, b, got, want)


def test_edit_distance_near_dup_subset_of_simhash(ray_session):
    """Every emitted pair is a SimHash candidate, the relative-distance
    contract holds row-by-row, and near-identical docs survive while the
    coincidental-band pairs are filtered."""
    from osm_data_3d_tiles_ray.pipelines.textops import (
        edit_distance_near_dup,
        simhash_near_dup,
    )

    sf = "/root/testdata/sf0.01"
    got = edit_distance_near_dup(sf).to_pandas()
    cand = simhash_near_dup(sf).to_pandas()
    ck = set(map(tuple, cand[["doc_id", "dup_of"]].to_numpy()))
    assert len(got) > 0
    for r in got.itertuples():
        assert (r.doc_id, r.dup_of) in ck
        assert r.lev_dist * 1000 <= 200 * max(r.len_a, r.len_b, 1)
    assert len(got) < len(cand)  # the verify actually filters


def test_edit_distance_near_dup_empty_candidates(ray_session, tmp_path):
    """Zero candidates → a typed empty result (schema intact)."""
    import pyarrow.parquet as pq

    from osm_data_3d_tiles_ray.pipelines.textops import edit_distance_near_dup

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": ["alpha beta gamma delta", "zz yy xx ww vv uu tt"],
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    ds = edit_distance_near_dup(str(tmp_path))
    assert ds.count() == 0
    assert set(ds.schema().names) == {
        "doc_id",
        "dup_of",
        "lev_dist",
        "len_a",
        "len_b",
    }


def test_mmr_select_contract(ray_session):
    """MMR picks are distinct, rank-1 is the max-relevance vector, every
    later pick's reported maxsim matches a recomputed max over the
    selected prefix, and the integer score order is respected."""
    import pyarrow.parquet as pq

    from osm_data_3d_tiles_ray.pipelines.ann import mmr_select

    sf = "/root/testdata/sf0.01"
    got = mmr_select(sf).to_pandas().sort_values("rank").reset_index(drop=True)
    assert got["rank"].tolist() == list(range(1, 9))
    assert got["vec_id"].is_unique
    assert int(got.loc[0, "maxsim_e6"]) == 0

    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = t.column("vec_id").to_numpy()
    emb = t.column("embedding").combine_chunks()
    d = len(emb[0])
    m = np.asarray(
        emb.values.to_numpy(zero_copy_only=False), dtype=np.float64
    ).reshape(-1, d)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qsel = vid < 10
    anchor = mn[qsel][np.argsort(vid[qsel])].sum(axis=0)
    anchor /= np.linalg.norm(anchor)
    rel = np.floor(mn @ anchor * 1e6 + 0.5).astype(np.int64)
    # rank 1 = global argmax relevance (ties to smallest id)
    best = np.lexsort((vid, -rel))[0]
    assert int(got.loc[0, "vec_id"]) == int(vid[best])
    # maxsim of each pick matches a recompute over the selected prefix
    pos = {int(v): i for i, v in enumerate(vid)}
    for r in range(1, len(got)):
        pick = mn[pos[int(got.loc[r, "vec_id"])]]
        prefix = np.stack([mn[pos[int(v)]] for v in got.loc[: r - 1, "vec_id"]])
        ms = int(np.floor(prefix @ pick * 1e6 + 0.5).max())
        assert ms == int(got.loc[r, "maxsim_e6"]), r


def test_kcenter_select_contract(ray_session):
    """k-center picks are distinct, the seed is the min vec_id, each
    later pick's maxsim matches a recompute over the prefix, and the
    greedy min-max property holds (no unpicked vector was strictly
    farther at pick time)."""
    import pyarrow.parquet as pq

    from osm_data_3d_tiles_ray.pipelines.ann import kcenter_select

    sf = "/root/testdata/sf0.01"
    got = kcenter_select(sf).to_pandas().sort_values("rank").reset_index(drop=True)
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = t.column("vec_id").to_numpy()
    emb = t.column("embedding").combine_chunks()
    d = len(emb[0])
    m = np.asarray(
        emb.values.to_numpy(zero_copy_only=False), dtype=np.float64
    ).reshape(-1, d)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    assert got["vec_id"].is_unique
    assert int(got.loc[0, "vec_id"]) == int(vid.min())
    pos = {int(v): i for i, v in enumerate(vid)}
    for r in range(1, len(got)):
        prefix = np.stack([mn[pos[int(v)]] for v in got.loc[: r - 1, "vec_id"]])
        allsim = np.floor(mn @ prefix.T * 1e6 + 0.5).astype(np.int64).max(axis=1)
        picked_before = {int(v) for v in got.loc[: r - 1, "vec_id"]}
        mask = np.array([int(v) not in picked_before for v in vid])
        # engine's reported maxsim matches, and is the global candidate min
        assert int(got.loc[r, "maxsim_e6"]) == int(
            allsim[pos[int(got.loc[r, "vec_id"])]]
        )
        assert int(got.loc[r, "maxsim_e6"]) == int(allsim[mask].min())
