"""IVF ANN: distributed spherical k-means quantizer + nprobe search."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from osm_data_3d_tiles_ray.pipelines.ann import ann_ivf_topk, ann_topk, kmeans_centroids


@pytest.fixture(scope="module")
def clustered_dir(tmp_path_factory, ray_session):
    """Synthetic clustered embeddings: 8 well-separated directions, 64 dims,
    120 vectors per cluster + the 10 query vectors drawn from clusters."""
    rng = np.random.default_rng(42)
    dims, n_clusters, per = 64, 8, 120
    dirs = rng.standard_normal((n_clusters, dims))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    vecs = []
    for c in range(n_clusters):
        pts = dirs[c] + 0.03 * rng.standard_normal((per, dims))
        vecs.append(pts)
    m = np.concatenate(vecs)
    order = rng.permutation(len(m))
    m = m[order]
    out = tmp_path_factory.mktemp("ivf")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
                "embedding": pa.array(list(m.astype(np.float64))),
                "label": pa.array(np.zeros(len(m), dtype=np.int32)),
            }
        ),
        out / "embeddings.parquet",
    )
    return str(out)


def test_kmeans_centroids_converge_to_cluster_dirs(clustered_dir):
    cents = kmeans_centroids(clustered_dir, n_clusters=8, iters=10)
    assert cents.shape == (8, 64)
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)
    # every data point should be very close to SOME centroid
    t = pq.read_table(f"{clustered_dir}/embeddings.parquet")
    m = np.asarray(
        t.column("embedding").combine_chunks().values.to_numpy(zero_copy_only=False)
    ).reshape(-1, 64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    best = (mn @ cents.T).max(axis=1)
    assert best.mean() > 0.85  # init can merge two tight clusters


def test_ivf_recall_on_clustered_data(clustered_dir):
    exact = ann_topk(clustered_dir).to_pandas()
    ivf = ann_ivf_topk(clustered_dir, n_clusters=8, nprobe=2).to_pandas()
    e = set(zip(exact["qid"], exact["vec_id"]))
    i = set(zip(ivf["qid"], ivf["vec_id"]))
    recall = len(e & i) / len(e)
    assert recall >= 0.9, recall
    # ranks well-formed
    assert set(ivf["rank"]) <= {1, 2, 3, 4, 5}


def test_distributed_kmeans_matches_sample_quality(clustered_dir):
    from osm_data_3d_tiles_ray.pipelines.ann import kmeans_centroids_distributed

    cents = kmeans_centroids_distributed(clustered_dir, n_clusters=8, iters=6)
    assert cents.shape == (8, 64)
    t = pq.read_table(f"{clustered_dir}/embeddings.parquet")
    m = np.asarray(
        t.column("embedding").combine_chunks().values.to_numpy(zero_copy_only=False)
    ).reshape(-1, 64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    best = (mn @ cents.T).max(axis=1)
    assert best.mean() > 0.85


def test_range_search_brute_force(ray_session):
    import numpy as np
    import pandas as pd

    from osm_data_3d_tiles_ray.pipelines.ann import range_search

    sf = "/root/testdata/sf0.001"
    got = range_search(sf).to_pandas()
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    vid = emb.vec_id.to_numpy()
    qsel = vid < 10
    sims = mat[qsel] @ mat.T
    qi, bi = np.nonzero(sims >= 0.35)
    keep = vid[qsel][qi] != vid[bi]
    want = {
        (int(vid[qsel][q]), int(vid[b]), int(np.floor(sims[q, b] * 1e6 + 0.5)))
        for q, b in zip(qi[keep], bi[keep])
    }
    assert set(zip(got.qid, got.vec_id, got.sim_e6)) == want
    assert len(got) == len(want) > 0


def test_semantic_dedup_consistent_with_pairs(ray_session):
    """The keep/drop decision must equal the greedy keep-lowest-id rule
    applied to the operator's own pair stream, and kept+dropped must
    partition the full id space."""
    import numpy as np
    import pandas as pd

    from osm_data_3d_tiles_ray.pipelines.ann import (
        embedding_near_dup,
        semantic_dedup,
    )

    sf = "/root/testdata/sf0.001"
    pairs = embedding_near_dup(sf, threshold=0.35).to_pandas()
    got = semantic_dedup(sf, threshold=0.35).to_pandas().set_index("vec_id")
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    assert set(got.index) == set(emb.vec_id)
    want_drop = {}
    for r in pairs.itertuples():
        cur = want_drop.get(r.vec_id)
        want_drop[r.vec_id] = min(cur, r.dup_of) if cur is not None else r.dup_of
    dropped = got[got.keep == 0]
    assert dict(dropped.dup_of) == want_drop
    assert (got[got.keep == 1].dup_of == -1).all()
    assert len(dropped) > 0  # threshold chosen so the corpus has dups

    # no-dup edge: an unreachable threshold keeps everything
    none = semantic_dedup(sf, threshold=0.999999).to_pandas()
    assert (none.keep == 1).all() and (none.dup_of == -1).all()
    assert len(none) == len(emb)


def test_product_quantize(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from osm_data_3d_tiles_ray.pipelines.ann import (
        _euclid_lloyd,
        _sample_embeddings,
        product_quantize,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        product_quantize(sf)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    t = pq.read_table(f"{sf}/embeddings.parquet")
    n = t.num_rows
    assert len(got) == n
    # codes are m_sub packed nibbles-in-bytes, each < n_codes
    codes = got.code.to_numpy()
    for j in range(4):
        assert ((codes >> (8 * j)) & 0xFF).max() < 16
    # brute-force recomputation: same deterministic training, same argmin
    sample = _sample_embeddings(sf, 8192)
    d = sample.shape[1]
    d_sub = d // 4
    cbs = [
        _euclid_lloyd(sample[:, j * d_sub:(j + 1) * d_sub], 16, 8)
        for j in range(4)
    ]
    dims = d
    x = np.asarray(
        t.column("embedding").combine_chunks().values.to_numpy(
            zero_copy_only=False
        )
    ).reshape(n, dims)
    vid = t.column("vec_id").to_numpy()
    order = np.argsort(vid)
    x = x[order] / np.linalg.norm(x[order], axis=1, keepdims=True)
    err = np.zeros(n)
    packed = np.zeros(n, dtype=np.int64)
    for j, cb in enumerate(cbs):
        xj = x[:, j * d_sub:(j + 1) * d_sub]
        d2 = (
            (xj ** 2).sum(axis=1)[:, None]
            - 2.0 * (xj @ cb.T)
            + (cb ** 2).sum(axis=1)[None, :]
        )
        c = np.argmin(d2, axis=1)
        packed |= c.astype(np.int64) << (8 * j)
        err += np.maximum(d2[np.arange(n), c], 0.0)
    assert got.code.tolist() == packed.tolist()
    assert got.err_e9.tolist() == np.floor(err * 1e9 + 0.5).astype(
        np.int64
    ).tolist()
    # a finer codebook strictly beats the 1-code-per-subspace baseline
    coarse = product_quantize(sf, n_codes=1).to_pandas()
    assert got.err_e9.sum() < coarse.err_e9.sum()


def test_ipc_source_roundtrip(ray_session):
    import os
    import shutil

    import pyarrow.parquet as pq

    from osm_data_3d_tiles_ray.sources.text_formats import (
        read_ipc_documents,
        write_ipc_shards,
    )

    sf = "/root/testdata/sf0.001"
    tbl = pq.read_table(f"{sf}/documents.parquet")
    out = "/tmp/ipc_docs_test"
    shutil.rmtree(out, ignore_errors=True)
    paths = write_ipc_shards(tbl, out, n_shards=3)
    assert len(paths) == 3 and all(os.path.exists(p) for p in paths)
    got = (
        read_ipc_documents(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = tbl.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got.doc_id.tolist() == want.doc_id.tolist()
    assert got.text.tolist() == want.text.tolist()
    assert got.source.tolist() == want.source.tolist()
    assert got.n_chars.tolist() == want.n_chars.tolist()
    # schema-normalization path: a bare text-only table gains defaults
    bare = pa.table({"text": tbl.column("text").slice(0, 10)})
    shutil.rmtree(out, ignore_errors=True)
    write_ipc_shards(bare, out, n_shards=1)
    norm = read_ipc_documents(out, source="bare").to_pandas()
    assert set(norm.columns) == {"doc_id", "text", "lang", "source", "n_chars"}
    assert (norm.source == "bare").all() and (norm.lang == "und").all()


def test_kmeans_exact_matches_local_lloyd(ray_session):
    """Distributed integer Lloyd == single-process integer Lloyd, bit for
    bit (partial-combine order must not matter: all sums are int64)."""
    import numpy as np
    import pyarrow.parquet as pq

    from osm_data_3d_tiles_ray.pipelines.ann import (
        KMEANS_EXACT_SCALE,
        kmeans_exact,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        kmeans_exact(sf)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = t.column("vec_id").to_numpy()
    dims = len(t.column("embedding")[0])
    m = np.asarray(
        t.column("embedding").combine_chunks().values.to_numpy(zero_copy_only=False),
        dtype=np.float64,
    ).reshape(-1, dims)
    q = np.floor(m * KMEANS_EXACT_SCALE).astype(np.int64)
    order = np.argsort(vid)
    vid, q = vid[order], q[order]
    k, iters = 4, 3
    cent = q[:k].copy()

    def assign(qm, c):
        d = np.stack([((qm - cc[None, :]) ** 2).sum(axis=1) for cc in c], axis=1)
        return np.argmin(d, axis=1)

    for _ in range(iters):
        a = assign(q, cent)
        for c in range(k):
            mask = a == c
            if mask.any():
                cent[c] = np.floor_divide(q[mask].sum(axis=0), mask.sum())
    final = assign(q, cent)
    assert (got.vec_id.to_numpy() == vid).all()
    assert (got.cluster.to_numpy() == final).all()
    assert len(np.unique(final)) >= 2  # the corpus isn't degenerate
