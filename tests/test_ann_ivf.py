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
