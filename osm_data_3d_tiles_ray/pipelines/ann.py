"""Similarity search over the ``embeddings`` table
(``vec_id:int64, embedding:list<float>, label:int32``).

Brute-force cosine top-k is the exact baseline (per-batch numpy matmul
against a broadcast query matrix + a small groupby refine); an LSH-bucketed
variant (:func:`ann_lsh_topk`) is the scale path: random-hyperplane
signatures bucket the vectors so only same-bucket candidates are scored —
the shuffle key is a small int, never the embedding payload.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

N_QUERIES = 10  # queries = the first N vectors (vec_id < N) of the table
TOP_K = 5


def _pool(cap: int = 8) -> int:
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(1, min(cap, cpus - 1))


def _embeddings(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _load_queries(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = t.column("vec_id").to_numpy()
    sel = vid < N_QUERIES
    emb = t.column("embedding").combine_chunks()
    dims = len(emb[0])
    mat = np.asarray(emb.values.to_numpy(zero_copy_only=False), dtype=np.float64).reshape(-1, dims)
    return vid[sel], mat[sel]


class _CosinePartial:
    """Constructor args are stored in the object store once and shared by
    every actor in the pool (broadcast semantics)."""

    def __init__(self, qid, qmat):
        self.qid = qid
        self.qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        if len(vid) == 0:
            return pa.table(
                {
                    "qid": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.float64()),
                }
            )
        dims = self.qn.shape[1]
        m = np.asarray(emb.values.to_numpy(zero_copy_only=False), dtype=np.float64).reshape(
            -1, dims
        )
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = self.qn @ mn.T  # (n_q, n_b)
        k = min(TOP_K + 1, sims.shape[1])  # +1: a query matches itself
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows = np.repeat(self.qid, k)
        cols = part.reshape(-1)
        return pa.table(
            {
                "qid": pa.array(rows.astype(np.int64)),
                "vec_id": pa.array(vid[cols].astype(np.int64)),
                "sim": pa.array(sims[np.repeat(np.arange(len(self.qid)), k), cols]),
            }
        )


def ann_topk(sf_dir: str) -> "ray.data.Dataset":
    """Exact cosine top-k neighbors (excluding self) for the first
    ``N_QUERIES`` vectors.  Output: (qid, vec_id, rank)."""
    qid, qmat = _load_queries(sf_dir)
    partials = _embeddings(sf_dir).select_columns(["vec_id", "embedding"]).map_batches(
        _CosinePartial,
        fn_constructor_args=(qid, qmat),
        batch_format="pyarrow",
        concurrency=_pool(),
        batch_size=4096,
    )

    def refine(group: pa.Table) -> pa.Table:
        qid_g = group.column("qid").to_numpy(zero_copy_only=False)
        vid = group.column("vec_id").to_numpy(zero_copy_only=False)
        sim = group.column("sim").to_numpy(zero_copy_only=False)
        mask = vid != qid_g[0]  # exclude self-match
        vid, sim = vid[mask], sim[mask]
        order = np.lexsort((vid, -sim))[:TOP_K]
        return pa.table(
            {
                "qid": pa.array(np.full(len(order), qid_g[0], dtype=np.int64)),
                "vec_id": pa.array(vid[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32)),
            }
        )

    return partials.groupby("qid").map_groups(refine, batch_format="pyarrow")


def embedding_near_dup(sf_dir: str, threshold: float = 0.92, n_planes: int = 8) -> "ray.data.Dataset":
    """Embedding-cosine near-duplicate pairs via random-hyperplane LSH
    buckets + exact within-bucket verification (the scale path: the
    all-pairs matrix never materializes; the shuffle key is the bucket id).
    Output: (vec_id, dup_of, sim_pct:int) with vec_id > dup_of."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    dims = len(t.column("embedding")[0])
    # ±1 Jenkins sign planes (SimHash family) — deterministic and
    # SQL-mirrorable like ann_lsh_topk's; tag decorrelates the matrix
    from ..geom.rng import jenkins_mix

    seeds = (
        np.arange(n_planes, dtype=np.uint32)[:, None] * np.uint32(dims)
        + np.arange(dims, dtype=np.uint32)[None, :]
        + np.uint32(0xE4B000)
    )
    planes = (
        1.0
        - 2.0 * (jenkins_mix(seeds.ravel()) & np.uint32(1)).astype(np.float64)
    ).reshape(n_planes, dims)

    def bucketize(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        m = np.asarray(emb.values.to_numpy(zero_copy_only=False), dtype=np.float64).reshape(
            -1, dims
        )
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        # sign via the e6-quantized dot (floor(dp*1e6+0.5) > 0) so the
        # oracle's sequential SUM and numpy's BLAS pairwise sum land in
        # the same bucket even when a dot sits within ~1e-13 of zero
        # (ADVICE r4: a hard dp > 0 compare can flip between engines)
        sig = (np.floor((mn @ planes.T) * 1e6 + 0.5) > 0) @ (
            1 << np.arange(n_planes)
        )
        flat = pa.array(mn.reshape(-1), type=pa.float64())
        return pa.table(
            {
                "bucket": pa.array(sig.astype(np.int64)),
                "vec_id": pa.array(vid),
                "nemb": pa.FixedSizeListArray.from_arrays(flat, dims),
            }
        )

    from .partition import first_per_key, map_key_partitions, run_starts

    def verify_part(tbl: pa.Table) -> pa.Table:
        """All buckets of one hash partition: sort by bucket, pairwise
        cosine per bucket RUN (in-process numpy slices, no per-bucket
        ``map_groups`` dispatch)."""
        empty = pa.table(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "dup_of": pa.array([], type=pa.int64()),
                "sim_pct": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) < 2:
            return empty
        bucket = tbl.column("bucket").to_numpy(zero_copy_only=False)
        vid = tbl.column("vec_id").to_numpy(zero_copy_only=False)
        emb = tbl.column("nemb")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        m = np.asarray(emb.values.to_numpy(zero_copy_only=False)).reshape(-1, dims)
        order = np.lexsort((vid, bucket))
        bucket, vid, m = bucket[order], vid[order], m[order]
        starts = np.nonzero(run_starts(bucket))[0]
        ends = np.concatenate([starts[1:], [len(vid)]])
        out_a, out_b, out_s = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            mb, vb = m[s:e], vid[s:e]
            sims = mb @ mb.T
            # threshold + report on the e6/e2-quantized grid (floor(x*k
            # + 0.5), the repo's oracle float rule): np.round is
            # half-even while SQL ROUND is half-away, and a BLAS sum vs
            # a sequential SQL sum can straddle a hard >= threshold
            sim_e6 = np.floor(sims * 1e6 + 0.5)
            a, b = np.nonzero(
                (sim_e6 >= round(threshold * 1e6))
                & (vb[:, None] > vb[None, :])
            )
            out_a.append(vb[a])
            out_b.append(vb[b])
            out_s.append(np.floor(sims[a, b] * 100 + 0.5).astype(np.int64))
        if not out_a:
            return empty
        return pa.table(
            {
                "vec_id": pa.array(np.concatenate(out_a)),
                "dup_of": pa.array(np.concatenate(out_b)),
                "sim_pct": pa.array(np.concatenate(out_s)),
            }
        )

    pairs = map_key_partitions(
        _embeddings(sf_dir)
        .select_columns(["vec_id", "embedding"])
        .map_batches(bucketize, batch_format="pyarrow"),
        ["bucket"],
        verify_part,
    )
    out = first_per_key(pairs, ["vec_id", "dup_of"])
    # Ray Data drops the schema of a fully-empty dataset; the pair set is
    # the (small) RESULT, so materializing to check is safe — hand back a
    # typed empty table when no pair clears the threshold (the ground
    # truth on the driver corpus).
    out = out.materialize()
    if out.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "dup_of": pa.array([], type=pa.int64()),
                    "sim_pct": pa.array([], type=pa.int64()),
                }
            )
        )
    return out


def ann_lsh_topk(sf_dir: str, n_planes: int = 12) -> "ray.data.Dataset":
    """LSH-bucketed approximate variant (scale path): random-hyperplane
    signature per vector, exact scoring only within the query's bucket
    neighborhood (bucket + Hamming-1 probes)."""
    qid, qmat = _load_queries(sf_dir)
    dims = qmat.shape[1]
    # ±1 sign planes from one keyed Jenkins round (geom/rng.py) — the same
    # derivation the random-projection op uses, so the DuckDB oracle
    # reproduces the identical plane matrix bit-for-bit (sign-LSH with
    # Rademacher planes is a standard SimHash family); tag 0x51A000
    # decorrelates these planes from the projection op's matrix
    from ..geom.rng import jenkins_mix

    seeds = (
        np.arange(n_planes, dtype=np.uint32)[:, None] * np.uint32(dims)
        + np.arange(dims, dtype=np.uint32)[None, :]
        + np.uint32(0x51A000)
    )
    planes = (
        1.0
        - 2.0 * (jenkins_mix(seeds.ravel()) & np.uint32(1)).astype(np.float64)
    ).reshape(n_planes, dims)

    def signature(m: np.ndarray) -> np.ndarray:
        # e6-quantized sign (floor(dp*1e6+0.5) > 0) so numpy's BLAS
        # pairwise sum and the oracle's sequential SUM agree even when a
        # dot sits within ~1e-13 of zero (the embedding_near_dup rule)
        bits = np.floor((m @ planes.T) * 1e6 + 0.5) > 0
        return (bits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)

    q_sig = signature(qmat)
    # multiprobe: query bucket + all Hamming-1 neighbors
    probe = {int(s) for s in q_sig}
    for s in q_sig:
        for b in range(n_planes):
            probe.add(int(s) ^ (1 << b))
    probe_arr = np.array(sorted(probe), dtype=np.int64)

    class Partial(_CosinePartial):
        def __init__(self, qid, qmat, probe):
            super().__init__(qid, qmat)
            self.probe = probe

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = batch.column("embedding")
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
            dims_ = self.qn.shape[1]
            m = np.asarray(emb.values.to_numpy(zero_copy_only=False), dtype=np.float64).reshape(
                -1, dims_
            )
            sig = signature(m)
            keep = np.isin(sig, self.probe)
            sub = pa.table(
                {
                    "vec_id": pa.array(vid[keep]),
                    "embedding": emb.take(pa.array(np.nonzero(keep)[0])),
                }
            )
            return super().__call__(sub)

    partials = _embeddings(sf_dir).select_columns(["vec_id", "embedding"]).map_batches(
        Partial,
        fn_constructor_args=(qid, qmat, probe_arr),
        batch_format="pyarrow",
        concurrency=_pool(),
        batch_size=4096,
    )

    def refine(group: pa.Table) -> pa.Table:
        qid_g = group.column("qid").to_numpy(zero_copy_only=False)
        vid = group.column("vec_id").to_numpy(zero_copy_only=False)
        sim = group.column("sim").to_numpy(zero_copy_only=False)
        mask = vid != qid_g[0]
        vid, sim = vid[mask], sim[mask]
        order = np.lexsort((vid, -sim))[:TOP_K]
        return pa.table(
            {
                "qid": pa.array(np.full(len(order), qid_g[0], dtype=np.int64)),
                "vec_id": pa.array(vid[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32)),
            }
        )

    return partials.groupby("qid").map_groups(refine, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF: distributed spherical k-means coarse quantizer + nprobe search


def _sample_embeddings(sf_dir: str, sample_size: int) -> np.ndarray:
    """First ``sample_size`` vectors in vec_id order, L2-normalized —
    bounded, deterministic training sample (never the whole table)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    got, n = [], 0
    for rb in pf.iter_batches(columns=["vec_id", "embedding"], batch_size=8192):
        got.append(pa.Table.from_batches([rb]))
        n += rb.num_rows
        if n >= sample_size:
            break
    t0 = pa.concat_tables(got)
    dims = len(t0.column("embedding")[0])
    vid = t0.column("vec_id").to_numpy()
    m = np.asarray(
        t0.column("embedding").combine_chunks().values.to_numpy(zero_copy_only=False)
    ).reshape(-1, dims)
    m = m[np.argsort(vid)][:sample_size]
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _farthest_point_init(sample: np.ndarray, n_clusters: int) -> np.ndarray:
    """Deterministic greedy max-min (kmeans++-style) seed centroids; naive
    first-k init routinely merges clusters."""
    chosen = [0]
    max_sim = sample @ sample[0]
    for _ in range(1, min(n_clusters, len(sample))):
        nxt = int(np.argmin(max_sim))
        chosen.append(nxt)
        max_sim = np.maximum(max_sim, sample @ sample[nxt])
    centroids = sample[chosen]
    if len(centroids) < n_clusters:  # tiny tables: pad with repeats
        reps = np.resize(np.arange(len(centroids)), n_clusters - len(centroids))
        centroids = np.concatenate([centroids, centroids[reps]])
    return centroids


def kmeans_centroids(
    sf_dir: str, n_clusters: int = 16, iters: int = 8, sample_size: int = 65536
) -> np.ndarray:
    """Spherical k-means quantizer trained on a BOUNDED deterministic
    sample (the FAISS-style IVF recipe: the coarse quantizer never needs
    the whole table — training cost stays constant as the corpus grows;
    only assignment/search are corpus-sized, and those stay distributed).
    Local Lloyd over ≤ ``sample_size`` vectors, farthest-point init."""
    sample = _sample_embeddings(sf_dir, sample_size)
    centroids = _farthest_point_init(sample, n_clusters)
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        sums = np.zeros((n_clusters, sample.shape[1]))
        np.add.at(sums, assign, sample)
        counts = np.bincount(assign, minlength=n_clusters)
        nonempty = counts > 0
        new = centroids.copy()
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        centroids = new / norms
    return centroids


def kmeans_centroids_distributed(
    sf_dir: str, n_clusters: int = 16, iters: int = 8
) -> np.ndarray:
    """Distributed spherical k-means (Lloyd) over the FULL embeddings table
    — the classic Ray-Data shape for iterative ML, kept for corpora whose
    distribution a bounded sample can't represent: each iteration is ONE
    ``map_batches`` pass emitting per-batch partial (cluster-sum, count)
    rows — k rows per batch, the small side — which the driver combines
    and renormalizes into the next centroid matrix (broadcast back via
    closure capture; centroids are k×d ≪ data)."""
    sample = _sample_embeddings(sf_dir, max(1024, n_clusters))
    dims = sample.shape[1]
    centroids = _farthest_point_init(sample, n_clusters)

    ds = _embeddings(sf_dir).select_columns(["embedding"])
    for _ in range(iters):
        c = centroids  # captured by value per iteration

        def partial(batch: pa.Table, c=c) -> pa.Table:
            emb = batch.column("embedding")
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            m = np.asarray(emb.values.to_numpy(zero_copy_only=False)).reshape(-1, dims)
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            assign = np.argmax(mn @ c.T, axis=1)
            sums = np.zeros((n_clusters, dims))
            np.add.at(sums, assign, mn)
            counts = np.bincount(assign, minlength=n_clusters)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(n_clusters, dtype=np.int64)),
                    "count": pa.array(counts.astype(np.int64)),
                    "vsum": pa.array(
                        list(sums), type=pa.large_list(pa.float64())
                    ),
                }
            )

        rows = ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        import ray as _ray

        sums = np.zeros((n_clusters, dims))
        counts = np.zeros(n_clusters, dtype=np.int64)
        for ref in rows:
            t = _ray.get(ref)
            cl = t.column("cluster").to_numpy(zero_copy_only=False)
            cn = t.column("count").to_numpy(zero_copy_only=False)
            vs = np.asarray(
                t.column("vsum").combine_chunks().values.to_numpy(zero_copy_only=False)
            ).reshape(len(cl), dims)
            np.add.at(sums, cl, vs * 1.0)
            np.add.at(counts, cl, cn)
        nonempty = counts > 0
        new = centroids.copy()
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        centroids = new / norms
    return centroids


def ann_ivf_topk(
    sf_dir: str, n_clusters: int = 16, nprobe: int = 4, iters: int = 8
) -> "ray.data.Dataset":
    """IVF approximate top-k (the k-means sibling of :func:`ann_lsh_topk`):
    a spherical-k-means coarse quantizer assigns every vector to a list;
    each query scores exactly ONLY the vectors in its ``nprobe`` nearest
    lists.  The probed-list set broadcasts as a small int array; embedding
    payloads never shuffle.  Output: (qid, vec_id, rank)."""
    qid, qmat = _load_queries(sf_dir)
    centroids = kmeans_centroids(sf_dir, n_clusters=n_clusters, iters=iters)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    probe_lists = np.unique(
        np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe].reshape(-1)
    )

    class Partial(_CosinePartial):
        def __init__(self, qid, qmat, centroids, probe):
            super().__init__(qid, qmat)
            self.centroids = centroids
            self.probe = probe

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = batch.column("embedding")
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
            dims_ = self.qn.shape[1]
            m = np.asarray(
                emb.values.to_numpy(zero_copy_only=False)
            ).reshape(-1, dims_)
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            lists = np.argmax(mn @ self.centroids.T, axis=1)
            keep = np.isin(lists, self.probe)
            sub = pa.table(
                {
                    "vec_id": pa.array(vid[keep]),
                    "embedding": emb.take(pa.array(np.nonzero(keep)[0])),
                }
            )
            return super().__call__(sub)

    partials = _embeddings(sf_dir).select_columns(["vec_id", "embedding"]).map_batches(
        Partial,
        fn_constructor_args=(qid, qmat, centroids, probe_lists),
        batch_format="pyarrow",
        concurrency=_pool(),
        batch_size=4096,
    )

    def refine(group: pa.Table) -> pa.Table:
        qid_g = group.column("qid").to_numpy(zero_copy_only=False)
        vid = group.column("vec_id").to_numpy(zero_copy_only=False)
        sim = group.column("sim").to_numpy(zero_copy_only=False)
        mask = vid != qid_g[0]
        vid, sim = vid[mask], sim[mask]
        order = np.lexsort((vid, -sim))[:TOP_K]
        return pa.table(
            {
                "qid": pa.array(np.full(len(order), qid_g[0], dtype=np.int64)),
                "vec_id": pa.array(vid[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int32)),
            }
        )

    return partials.groupby("qid").map_groups(refine, batch_format="pyarrow")


def ann_ivf_topk_validated(
    sf_dir: str,
    recall_floor: float = 0.7,
    max_exact_rows: int = 100_000,
) -> "pa.Table":
    """Self-validating registered-query wrapper for :func:`ann_ivf_topk`
    (VERDICT r4 item 6, the ``geo_knn_bucketed`` precedent): the IVF
    result is rows-only for the driver (float k-means is not
    SQL-mirrorable), so the wrapper asserts its OWN quality contract —
    recall@{TOP_K} against the exact brute-force top-k must be ≥
    ``recall_floor`` (documented bound: nprobe=4 of 16 lists measures
    0.94 at sf0.01 AND sf0.1; the floor leaves margin for corpus
    regeneration).  The exact pass runs only while the embedding table
    is small enough to make it cheap (``max_exact_rows``; the driver's
    correctness corpora are ≤2k vectors) — above that the result
    returns unvalidated rather than paying a brute-force scan at
    production scale."""
    import pyarrow.parquet as pq

    approx = pa.concat_tables(
        ray.get(ann_ivf_topk(sf_dir).to_arrow_refs())
    ).select(["qid", "vec_id", "rank"])
    n_vecs = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    if n_vecs <= max_exact_rows:
        exact = pa.concat_tables(ray.get(ann_topk(sf_dir).to_arrow_refs()))
        ek = set(
            zip(
                exact.column("qid").to_pylist(),
                exact.column("vec_id").to_pylist(),
            )
        )
        ak = set(
            zip(
                approx.column("qid").to_pylist(),
                approx.column("vec_id").to_pylist(),
            )
        )
        recall = len(ek & ak) / max(len(ek), 1)
        if recall < recall_floor:
            raise AssertionError(
                f"ann_ivf_topk recall {recall:.3f} < documented floor "
                f"{recall_floor} vs exact top-k on {n_vecs} vectors — "
                "the IVF quantizer degraded (pipelines/ann.py)"
            )
    return approx


def mmr_select(
    sf_dir: str, k: int = 8, lam_pm: int = 500
) -> "pa.Table":
    """Maximal-Marginal-Relevance subset selection (Carbonell & Goldstein
    1998) over the embedding table — the diversity-aware data-curation
    pick: greedily select ``k`` vectors maximizing
    ``lam·relevance − (1−lam)·max-sim-to-selected``, the filter that
    keeps an instruction-tuning subset from collapsing onto one dense
    mode.  Relevance is cosine to the normalized MEAN of the query set
    (vec_id < N_QUERIES); every similarity quantizes to
    ``floor(sim·1e6 + 0.5)`` BEFORE the max/argmax, and the score is the
    pure-integer ``lam_pm·rel_e6 − (1000−lam_pm)·maxsim_e6`` with ties
    to the smallest vec_id — so the greedy argmax is bit-reproducible
    and the DuckDB oracle unrolls the same ``k`` rounds exactly (the
    ``kmeans_exact`` discipline).

    Scale shape: each round is ONE shuffle-free ``map_batches`` pass
    emitting a single per-block champion row (vec_id, score) — the
    selected set (≤ k normalized vectors) broadcasts via closure, the
    gather is bounded by the block count, and the chosen vector's
    embedding is pushdown-read by id.  k passes total; embeddings never
    shuffle, nothing all-pairs.

    Output: (rank 1..k, vec_id, rel_e6, maxsim_e6) — maxsim_e6 is 0 for
    the first pick (empty selected set, by convention on both sides)."""
    import pyarrow.parquet as pq

    qid, qmat = _load_queries(sf_dir)
    # anchor = normalized MEAN of the query set (not a member vector: a
    # member anchor makes every round-2 score degenerate to 0, since
    # maxsim-to-selected == relevance once the anchor itself is picked)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    anchor = qn[np.argsort(qid)].sum(axis=0)
    anchor = anchor / np.linalg.norm(anchor)
    lam = int(lam_pm)

    sel_ids: list[int] = []
    sel_vecs: list[np.ndarray] = []
    out_rows: list[tuple[int, int, int, int]] = []

    for rank in range(1, k + 1):
        S = np.stack(sel_vecs) if sel_vecs else None
        sel_arr = np.asarray(sorted(sel_ids), dtype=np.int64)

        def champion(batch: pa.Table, S=S, sel_arr=sel_arr) -> pa.Table:
            empty = pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.int64()),
                    "rel_e6": pa.array([], type=pa.int64()),
                    "maxsim_e6": pa.array([], type=pa.int64()),
                }
            )
            emb = batch.column("embedding")
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
            if len(vid) == 0:
                return empty
            dims = len(emb[0])
            m = np.asarray(
                emb.values.to_numpy(zero_copy_only=False), dtype=np.float64
            ).reshape(-1, dims)
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            rel_e6 = np.floor(mn @ anchor * 1e6 + 0.5).astype(np.int64)
            if S is None:
                maxsim_e6 = np.zeros(len(vid), dtype=np.int64)
            else:
                sims_e6 = np.floor(mn @ S.T * 1e6 + 0.5).astype(np.int64)
                maxsim_e6 = sims_e6.max(axis=1)
            score = lam * rel_e6 - (1000 - lam) * maxsim_e6
            if len(sel_arr):
                # exclusion sentinel must survive negation in the lexsort
                # below: -int64.min overflows to itself and would sort
                # the excluded row FIRST — use min//2
                score[np.isin(vid, sel_arr)] = np.iinfo(np.int64).min // 2
            # block champion: max score, ties to smallest vec_id — a
            # TOTAL order, so the two-level reduce is partition-blind
            order = np.lexsort((vid, -score))
            b = order[0]
            return pa.table(
                {
                    "vec_id": pa.array([int(vid[b])], type=pa.int64()),
                    "score": pa.array([int(score[b])], type=pa.int64()),
                    "rel_e6": pa.array([int(rel_e6[b])], type=pa.int64()),
                    "maxsim_e6": pa.array(
                        [int(maxsim_e6[b])], type=pa.int64()
                    ),
                }
            )

        parts = (
            _embeddings(sf_dir)
            .select_columns(["vec_id", "embedding"])
            .map_batches(champion, batch_format="pyarrow")
            .to_pandas()
        )
        parts = parts.sort_values(
            ["score", "vec_id"], ascending=[False, True]
        ).reset_index(drop=True)
        pick = parts.iloc[0]
        pid = int(pick["vec_id"])
        out_rows.append(
            (rank, pid, int(pick["rel_e6"]), int(pick["maxsim_e6"]))
        )
        sel_ids.append(pid)
        vec = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "=", pid)],
        ).column("embedding")[0].values.to_numpy(zero_copy_only=False)
        v = np.asarray(vec, dtype=np.float64)
        sel_vecs.append(v / np.linalg.norm(v))

    c = list(zip(*out_rows))
    return pa.table(
        {
            "rank": pa.array(c[0], type=pa.int64()),
            "vec_id": pa.array(c[1], type=pa.int64()),
            "rel_e6": pa.array(c[2], type=pa.int64()),
            "maxsim_e6": pa.array(c[3], type=pa.int64()),
        }
    )


def kcenter_select(sf_dir: str, k: int = 8) -> "pa.Table":
    """Greedy k-center (Gonzalez 1985) coreset selection over the
    embedding table — the geometric-coverage data-pruning pick (active
    learning / dataset distillation): seed with the smallest vec_id,
    then repeatedly take the vector FARTHEST from the selected set
    (cosine distance ⇒ argmin over candidates of max-sim-to-selected),
    ties to the smallest vec_id.  Guarantees a 2-approximation of the
    optimal k-center cover.  Similarities quantize to ``floor(sim·1e6 +
    0.5)`` before the min/argmin, so the greedy trace is
    bit-reproducible and the DuckDB oracle unrolls the identical rounds
    (the ``mmr_select`` discipline).

    Scale shape: one shuffle-free per-round ``map_batches`` champion
    pass; the ≤k selected vectors broadcast by closure; embeddings never
    shuffle.  Output: (rank 1..k, vec_id, maxsim_e6) — maxsim_e6 is
    1e6 for the seed by convention (distance 0 to itself)."""
    import pyarrow.parquet as pq

    t0 = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    )
    seed_id = int(t0.column("vec_id").to_numpy().min())

    def read_vec(pid: int) -> np.ndarray:
        v = (
            pq.read_table(
                f"{sf_dir}/embeddings.parquet",
                columns=["vec_id", "embedding"],
                filters=[("vec_id", "=", pid)],
            )
            .column("embedding")[0]
            .values.to_numpy(zero_copy_only=False)
        )
        v = np.asarray(v, dtype=np.float64)
        return v / np.linalg.norm(v)

    sel_ids = [seed_id]
    sel_vecs = [read_vec(seed_id)]
    out_rows = [(1, seed_id, 1_000_000)]

    for rank in range(2, k + 1):
        S = np.stack(sel_vecs)
        sel_arr = np.asarray(sorted(sel_ids), dtype=np.int64)

        def champion(batch: pa.Table, S=S, sel_arr=sel_arr) -> pa.Table:
            empty = pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "maxsim_e6": pa.array([], type=pa.int64()),
                }
            )
            emb = batch.column("embedding")
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
            if len(vid) == 0:
                return empty
            dims = len(emb[0])
            m = np.asarray(
                emb.values.to_numpy(zero_copy_only=False), dtype=np.float64
            ).reshape(-1, dims)
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            maxsim = (
                np.floor(mn @ S.T * 1e6 + 0.5).astype(np.int64).max(axis=1)
            )
            # exclusion sentinel must survive lexsort (no negation here,
            # but keep selected rows from ever winning the argmin)
            maxsim_m = maxsim.copy()
            maxsim_m[np.isin(vid, sel_arr)] = np.iinfo(np.int64).max // 2
            b = np.lexsort((vid, maxsim_m))[0]  # min maxsim, ties min id
            return pa.table(
                {
                    "vec_id": pa.array([int(vid[b])], type=pa.int64()),
                    "maxsim_e6": pa.array(
                        [int(maxsim[b])], type=pa.int64()
                    ),
                }
            )

        parts = (
            _embeddings(sf_dir)
            .select_columns(["vec_id", "embedding"])
            .map_batches(champion, batch_format="pyarrow")
            .to_pandas()
        )
        parts = parts.sort_values(
            ["maxsim_e6", "vec_id"], ascending=[True, True]
        ).reset_index(drop=True)
        pid = int(parts.iloc[0]["vec_id"])
        out_rows.append((rank, pid, int(parts.iloc[0]["maxsim_e6"])))
        sel_ids.append(pid)
        sel_vecs.append(read_vec(pid))

    c = list(zip(*out_rows))
    return pa.table(
        {
            "rank": pa.array(c[0], type=pa.int64()),
            "vec_id": pa.array(c[1], type=pa.int64()),
            "maxsim_e6": pa.array(c[2], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# per-label centroid similarity (embedding outlier scoring)


def embedding_centroid_sim(sf_dir: str) -> "ray.data.Dataset":
    """Per-vector cosine similarity to its own label centroid — the
    embedding outlier / label-noise score used to prune off-cluster or
    mislabeled examples before training.

    Scale shape: stage 1 partial-combines per-(label, dim) sums INSIDE
    ``map_batches`` (each block emits ``labels x dims`` fixed-width rows —
    embeddings themselves never shuffle); the groupby over those partials
    is tiny because the label space is bounded (a classification space),
    so the resulting centroid matrix is a bounded driver gather (same
    contract as :func:`ann_topk`'s query broadcast and ``seq_pack``'s
    range totals).  Stage 2 is a shuffle-free pass computing each vector's
    cosine against the broadcast centroid row.

    Output: (vec_id, label, centroid_sim_e6) in integer 1e-6 units
    (oracle float rule: scale <= 1e6 for results that mix float
    association orders)."""
    def partial_sums(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        dims = len(emb[0]) if len(emb) else 0
        m = np.asarray(
            emb.values.to_numpy(zero_copy_only=False), dtype=np.float64
        ).reshape(-1, dims)
        lab = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        ulab, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(ulab), dims), dtype=np.float64)
        np.add.at(sums, inv, m)
        cnt = np.bincount(inv, minlength=len(ulab)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(ulab, dims)),
                "dim": pa.array(np.tile(np.arange(dims, dtype=np.int64), len(ulab))),
                "s": pa.array(sums.reshape(-1)),
                "c": pa.array(np.repeat(cnt, dims)),
            }
        )

    partials = _embeddings(sf_dir).map_batches(partial_sums, batch_format="pyarrow")
    agg = (
        partials.groupby(["label", "dim"])
        .aggregate(
            ray.data.aggregate.Sum("s", alias_name="s"),
            ray.data.aggregate.Sum("c", alias_name="c"),
        )
        .to_pandas()  # bounded: labels x dims rows
        .sort_values(["label", "dim"])
    )
    labels = np.sort(agg["label"].unique())
    dims = int(agg["dim"].max()) + 1
    cmat = (
        agg["s"].to_numpy().reshape(len(labels), dims)
        / agg["c"].to_numpy().reshape(len(labels), dims)
    )
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))

    def score(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        m = np.asarray(
            emb.values.to_numpy(zero_copy_only=False), dtype=np.float64
        ).reshape(-1, dims)
        lab = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(labels, lab)
        dot = (m * cmat[pos]).sum(axis=1)
        sim = dot / (np.sqrt((m * m).sum(axis=1)) * cnorm[pos])
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "label": pa.array(lab),
                "centroid_sim_e6": pa.array(
                    np.floor(sim * 1e6 + 0.5).astype(np.int64)
                ),
            }
        )

    return _embeddings(sf_dir).map_batches(score, batch_format="pyarrow")


def range_search(
    sf_dir: str, threshold: float = 0.35
) -> "ray.data.Dataset":
    """Cosine RANGE search: every (query, vector) pair with similarity
    ≥ ``threshold`` (radius query — the dedup/retrieval primitive when the
    match count per query is unknown, unlike top-k).

    Scale shape: entirely shuffle-free — the bounded query matrix
    broadcasts once via the actor pool constructor (object-store shared),
    each batch does one normalized matmul and emits only the pairs above
    the threshold.  No groupby/refine stage at all: thresholding is local,
    so the output streams straight out of the map stage.

    Correctness shape: similarities are emitted as integer e6 units
    (``floor(sim*1e6+0.5)``, CLAUDE.md float-oracle rule); the ≥ test uses
    the raw float64 cosine on both the engine and the DuckDB side.

    Output: (qid, vec_id, sim_e6)."""
    qid, qmat = _load_queries(sf_dir)

    class _RangePartial:
        def __init__(self, qid, qmat, threshold):
            self.qid = qid
            self.qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
            self.threshold = threshold

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = batch.column("embedding")
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
            empty = pa.table(
                {
                    "qid": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "sim_e6": pa.array([], type=pa.int64()),
                }
            )
            if len(vid) == 0:
                return empty
            dims = self.qn.shape[1]
            m = np.asarray(
                emb.values.to_numpy(zero_copy_only=False), dtype=np.float64
            ).reshape(-1, dims)
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = self.qn @ mn.T  # (n_q, n_batch)
            qi, bi = np.nonzero(sims >= self.threshold)
            keep = self.qid[qi] != vid[bi]  # exclude self-match
            qi, bi = qi[keep], bi[keep]
            if len(qi) == 0:
                return empty
            return pa.table(
                {
                    "qid": pa.array(self.qid[qi].astype(np.int64)),
                    "vec_id": pa.array(vid[bi].astype(np.int64)),
                    "sim_e6": pa.array(
                        np.floor(sims[qi, bi] * 1e6 + 0.5).astype(np.int64)
                    ),
                }
            )

    return _embeddings(sf_dir).select_columns(["vec_id", "embedding"]).map_batches(
        _RangePartial,
        fn_constructor_args=(qid, qmat, threshold),
        batch_format="pyarrow",
        concurrency=_pool(),
        batch_size=4096,
    )


def semantic_dedup(
    sf_dir: str, threshold: float = 0.35, n_planes: int = 8
) -> "ray.data.Dataset":
    """SemDeDup-style keep/drop decision over the embedding near-dup
    relation (Abbas et al. 2023): a vector is DROPPED iff some vector with
    a smaller id is cosine-similar above ``threshold`` — the greedy
    keep-lowest-id rule applied to :func:`embedding_near_dup`'s pair
    stream (which already emits ``vec_id > dup_of``).

    Scale shape: the pair stream is a tiny fraction of the corpus; one
    bounded groupby-min gives each dropped id its smallest similar
    partner, and the keep flag attaches to the full embedding table with
    a broadcast of ONLY the dropped-id array (bounded by the dup count,
    the quantity a dedup run wants small) — embeddings never shuffle.

    Output: (vec_id, keep:int64 0/1, dup_of — smallest similar smaller
    id, or -1 for kept rows)."""
    from .partition import reduce_by_key

    pairs = embedding_near_dup(sf_dir, threshold=threshold, n_planes=n_planes)
    agg = reduce_by_key(
        pairs, ["vec_id"], [("dup_of", "min", "dup_of_min")]
    )
    drop_tbl = agg.to_pandas()  # bounded: one row per DROPPED vector
    if len(drop_tbl) == 0:  # to_pandas drops columns on empty datasets
        drop_ids = np.empty(0, dtype=np.int64)
        drop_of = np.empty(0, dtype=np.int64)
    else:
        drop_ids = drop_tbl["vec_id"].to_numpy()
        drop_of = drop_tbl["dup_of_min"].to_numpy()
        order = np.argsort(drop_ids)
        drop_ids, drop_of = drop_ids[order], drop_of[order]

    def flag(batch: pa.Table) -> pa.Table:
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(drop_ids, vid)
        pos_c = np.clip(pos, 0, max(len(drop_ids) - 1, 0))
        hit = (
            (drop_ids[pos_c] == vid)
            if len(drop_ids)
            else np.zeros(len(vid), dtype=bool)
        )
        dup = np.where(hit, drop_of[pos_c] if len(drop_ids) else -1, -1)
        return pa.table(
            {
                "vec_id": pa.array(vid),
                "keep": pa.array((~hit).astype(np.int64)),
                "dup_of": pa.array(dup.astype(np.int64)),
            }
        )

    return _embeddings(sf_dir).select_columns(["vec_id"]).map_batches(
        flag, batch_format="pyarrow"
    )


def random_projection(sf_dir: str, out_dims: int = 16) -> "ray.data.Dataset":
    """Johnson–Lindenstrauss dimensionality reduction with a DETERMINISTIC
    ±1 sign matrix: y_j = (1/√k) Σ_d v_d · sign(d, j), where the sign is
    bit 0 of the engine's keyed Jenkins hash of ``d·k + j`` — the matrix
    is pure code, identically derivable anywhere (including inside the
    DuckDB oracle via the SQL Jenkins mirror), so even this vector op is
    hash-oracled.

    Scale shape: entirely shuffle-free — the sign matrix (dims × k,
    a few KB) builds once per task closure and each batch is ONE float64
    matmul; outputs floor to e6 integers per element (sums of ≤dims
    in-order terms, association noise ≪ the e6 grid).

    Output: (vec_id, j, y_e6) — one row per (vector, output dim)."""
    import pyarrow.parquet as pq

    from ..geom.rng import jenkins_mix

    meta = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    ).slice(0, 1)
    dims = len(meta.column("embedding")[0])
    seeds = (
        np.arange(dims, dtype=np.uint32)[:, None] * np.uint32(out_dims)
        + np.arange(out_dims, dtype=np.uint32)[None, :]
    )
    signs = 1.0 - 2.0 * (jenkins_mix(seeds.ravel()) & np.uint32(1)).astype(
        np.float64
    ).reshape(dims, out_dims)
    scale = 1.0 / np.sqrt(float(out_dims))

    def project(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        m = np.asarray(
            emb.values.to_numpy(zero_copy_only=False), dtype=np.float64
        ).reshape(-1, dims)
        y = (m @ signs) * scale
        e6 = np.floor(y * 1e6 + 0.5).astype(np.int64)
        n = len(vid)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(vid, out_dims)),
                "j": pa.array(np.tile(np.arange(out_dims, dtype=np.int64), n)),
                "y_e6": pa.array(e6.reshape(-1)),
            }
        )

    return (
        _embeddings(sf_dir)
        .select_columns(["vec_id", "embedding"])
        .map_batches(project, batch_format="pyarrow")
    )


def class_cohesion(sf_dir: str) -> "ray.data.Dataset":
    """Per-label embedding cohesion: the MEAN PAIRWISE COSINE similarity
    of all vector pairs sharing a label — the cluster-quality diagnostic —
    computed WITHOUT materializing any pair: for unit vectors,
    Σ_{i≠j} cos(u_i, u_j) = |Σ u|² − N, so one pass of per-label partial
    sums suffices.

    Scale shape: shuffle-free per-batch partials (each batch normalizes
    its vectors and emits one (label, Σu, N) row — the (labels × dims)
    partial space is bounded); one tiny grouped combine; the final
    cohesion is pure arithmetic on the combined sums.  Output floors at
    e6 like the other transcendental-free float results (the only float
    ops are the per-vector normalization and one |Σu|², both identically
    associated in the oracle's per-label SUM... comparison is at e6 where
    the ~1e-12 association noise cannot flip the floor).

    Output: (label, n_vectors, cohesion_e6)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    meta = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    ).slice(0, 1)
    dims = len(meta.column("embedding")[0])

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        lab = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.asarray(
            emb.values.to_numpy(zero_copy_only=False), dtype=np.float64
        ).reshape(-1, dims)
        u = m / np.linalg.norm(m, axis=1, keepdims=True)
        labs, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(labs), dims), dtype=np.float64)
        np.add.at(sums, inv, u)
        cnt = np.bincount(inv).astype(np.int64)
        out = {"label": pa.array(labs), "p_n": pa.array(cnt)}
        for d in range(dims):
            out[f"s{d}"] = pa.array(sums[:, d])
        return pa.table(out)

    aggs = [ray.data.aggregate.Sum("p_n", alias_name="n_vectors")] + [
        ray.data.aggregate.Sum(f"s{d}", alias_name=f"t{d}")
        for d in range(dims)
    ]
    merged = (
        _embeddings(sf_dir)
        .select_columns(["embedding", "label"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .aggregate(*aggs)
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("n_vectors"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        s = np.stack(
            [
                batch.column(f"t{d}").to_numpy(zero_copy_only=False)
                for d in range(dims)
            ],
            axis=1,
        )
        norm2 = (s * s).sum(axis=1)
        denom = np.maximum(n * (n - 1), 1)
        coh = (norm2 - n) / denom
        return pa.table(
            {
                "label": pc.cast(batch.column("label"), pa.int64()),
                "n_vectors": pa.array(n),
                "cohesion_e6": pa.array(
                    np.floor(coh * 1e6 + 0.5).astype(np.int64)
                ),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def text_embedding_fusion(sf_dir: str) -> "ray.data.Dataset":
    """Cross-modal fusion: join each document's TEXT signals (token count,
    quality keep bit) with its EMBEDDING features (label, L2 norm) on the
    shared id — the multimodal feature-assembly step that precedes any
    quality-vs-geometry analysis over an interleaved corpus.

    Scale shape: both modalities reduce to fixed-width feature rows
    inside their own scans (text and vectors never co-shuffle raw); ONE
    id-keyed tag-union exchange joins them with a sorted probe per
    partition.  Output only for ids present in both tables (inner).

    Output: (doc_id, n_tokens, keep, label, norm_e6)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from .partition import map_key_partitions

    meta = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    ).slice(0, 1)
    dims = len(meta.column("embedding")[0])

    def doc_side(batch: pa.Table) -> pa.Table:
        from .textops import _run_top_and_unique, _word_codes

        n = len(batch)
        codes, row, counts, _ = _word_codes(batch)
        top_word, _ = _run_top_and_unique(row, codes, n)
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_chars = np.asarray(pc.utf8_length(text), dtype=np.int64)
        n_alpha = np.asarray(
            pc.count_substring_regex(text, "[A-Za-z]"), dtype=np.int64
        )
        keep = ~(
            (counts < 12) | (4 * top_word > counts) | (10 * n_alpha < 7 * n_chars)
        )
        n_tok = np.asarray(
            pc.count_substring_regex(text, r"\S+"), dtype=np.int64
        )
        return pa.table(
            {
                "key": batch.column("doc_id"),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "n_tokens": pa.array(n_tok),
                "keep": pa.array(keep.astype(np.int64)),
                "label": pa.array(np.zeros(n, dtype=np.int64)),
                "norm_e6": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    def emb_side(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        m = np.asarray(
            emb.values.to_numpy(zero_copy_only=False), dtype=np.float64
        ).reshape(-1, dims)
        norm = np.sqrt((m * m).sum(axis=1))
        n = len(batch)
        return pa.table(
            {
                "key": batch.column("vec_id"),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "n_tokens": pa.array(np.zeros(n, dtype=np.int64)),
                "keep": pa.array(np.zeros(n, dtype=np.int64)),
                "label": pc.cast(batch.column("label"), pa.int64()),
                "norm_e6": pa.array(
                    np.floor(norm * 1e6 + 0.5).astype(np.int64)
                ),
            }
        )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(doc_side, batch_format="pyarrow")
    embs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    ).map_batches(emb_side, batch_format="pyarrow")

    def join_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "keep": pa.array([], type=pa.int64()),
                "label": pa.array([], type=pa.int64()),
                "norm_e6": pa.array([], type=pa.int64()),
            }
        )
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        if (side == 0).sum() == 0 or (side == 1).sum() == 0:
            return empty
        d = tbl.filter(pa.array(side == 0)).sort_by("key")
        e = tbl.filter(pa.array(side == 1))
        dk = d.column("key").to_numpy(zero_copy_only=False)
        ek = e.column("key").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(dk, ek), 0, len(dk) - 1)
        hit = dk[pos] == ek
        e = e.filter(pa.array(hit))
        pos = pos[hit]
        take = pa.array(pos)
        return pa.table(
            {
                "doc_id": e.column("key"),
                "n_tokens": d.column("n_tokens").take(take),
                "keep": d.column("keep").take(take),
                "label": e.column("label"),
                "norm_e6": e.column("norm_e6"),
            }
        )

    return map_key_partitions(docs.union(embs), ["key"], join_part)


def _euclid_lloyd(
    sample: np.ndarray, n_codes: int, iters: int = 8
) -> np.ndarray:
    """Plain (Euclidean) Lloyd over a bounded sample with deterministic
    greedy max-min init — the per-subspace trainer for product
    quantization (spherical k-means is wrong here: subvectors are not
    unit-norm)."""
    n = len(sample)
    chosen = [0]
    d2 = ((sample - sample[0]) ** 2).sum(axis=1)
    for _ in range(1, min(n_codes, n)):
        nxt = int(np.argmax(d2))
        chosen.append(nxt)
        d2 = np.minimum(d2, ((sample - sample[nxt]) ** 2).sum(axis=1))
    cb = sample[chosen]
    if len(cb) < n_codes:
        reps = np.resize(np.arange(len(cb)), n_codes - len(cb))
        cb = np.concatenate([cb, cb[reps]])
    x2 = (sample**2).sum(axis=1)
    for _ in range(iters):
        d2 = x2[:, None] - 2.0 * (sample @ cb.T) + (cb**2).sum(axis=1)[None, :]
        assign = np.argmin(d2, axis=1)
        sums = np.zeros_like(cb)
        np.add.at(sums, assign, sample)
        counts = np.bincount(assign, minlength=n_codes)
        nonempty = counts > 0
        cb = cb.copy()
        cb[nonempty] = sums[nonempty] / counts[nonempty, None]
    return cb


class _PQEncode:
    """Actor-pool PQ encoder: codebooks built ONCE per actor (ctor arg,
    object-store broadcast), per-batch work is m_sub small matmuls +
    argmins — no Python over rows."""

    def __init__(self, codebooks: np.ndarray):
        self.cb = codebooks  # (m_sub, n_codes, d_sub)
        self.cb_sq = (codebooks**2).sum(axis=2)  # (m_sub, n_codes)

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        m_sub, n_codes, d_sub = self.cb.shape
        x = np.asarray(emb.values.to_numpy(zero_copy_only=False)).reshape(
            len(batch), m_sub * d_sub
        )
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        packed = np.zeros(len(batch), dtype=np.int64)
        err = np.zeros(len(batch), dtype=np.float64)
        for j in range(m_sub):
            xj = x[:, j * d_sub : (j + 1) * d_sub]
            d2 = (
                (xj**2).sum(axis=1)[:, None]
                - 2.0 * (xj @ self.cb[j].T)
                + self.cb_sq[j][None, :]
            )
            code = np.argmin(d2, axis=1)
            packed |= code.astype(np.int64) << (8 * j)
            err += np.maximum(d2[np.arange(len(code)), code], 0.0)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "label": pc.cast(batch.column("label"), pa.int64()),
                "code": pa.array(packed),
                "err_e9": pa.array(
                    np.floor(err * 1e9 + 0.5).astype(np.int64)
                ),
            }
        )


def product_quantize(
    sf_dir: str,
    m_sub: int = 4,
    n_codes: int = 16,
    iters: int = 8,
    sample_size: int = 8192,
) -> "ray.data.Dataset":
    """Product quantization (PQ) encode of the embedding table: split the
    dimension into ``m_sub`` subspaces, train a ``n_codes``-way Euclidean
    codebook per subspace on a BOUNDED deterministic sample (the FAISS
    recipe — training cost constant in corpus size), then encode every
    vector to ``m_sub`` bytes with its exact squared reconstruction
    error.  The memory story at 100 TB: 4 bytes/vector instead of 256,
    the codebooks (m_sub x n_codes x d_sub floats) broadcast once into
    every pool actor.

    Output: (vec_id, label, code, err_e9) — rows-only oracle (argmin over
    float distances is not SQL-hashable); pytest asserts code ranges,
    brute-force-equal errors, and that finer codebooks strictly reduce
    total error."""
    codebooks, _ = _pq_codebooks(sf_dir, m_sub, n_codes, iters, sample_size)
    return _embeddings(sf_dir).map_batches(
        _PQEncode,
        fn_constructor_args=(codebooks,),
        concurrency=_pool(),
        batch_size=4096,
        batch_format="pyarrow",
    )


def _pq_codebooks(
    sf_dir: str, m_sub: int, n_codes: int, iters: int, sample_size: int
) -> tuple[np.ndarray, np.ndarray]:
    """Train the per-subspace PQ codebooks on the bounded deterministic
    sample; returns (codebooks (m_sub, n_codes, d_sub), sample)."""
    sample = _sample_embeddings(sf_dir, sample_size)
    d = sample.shape[1]
    if d % m_sub:
        raise ValueError(f"m_sub={m_sub} must divide dim={d}")
    d_sub = d // m_sub
    codebooks = np.stack(
        [
            _euclid_lloyd(
                sample[:, j * d_sub : (j + 1) * d_sub], n_codes, iters
            )
            for j in range(m_sub)
        ]
    )
    return codebooks, sample


def product_quantize_validated(
    sf_dir: str,
    m_sub: int = 4,
    n_codes: int = 16,
    iters: int = 8,
    sample_size: int = 8192,
    explained_floor: float = 0.15,
) -> "ray.data.Dataset":
    """Self-validating registered-query wrapper for
    :func:`product_quantize` (VERDICT r4 item 6): PQ is rows-only for
    the driver (float Lloyd argmin is not SQL-mirrorable), so the
    wrapper asserts its OWN quality contract on the bounded training
    sample before launching the distributed encode — the fraction of
    sample variance the codebooks explain (1 − Σ min-code err / Σ
    mean-centered variance) must be ≥ ``explained_floor``.  Documented
    bound: 16-bit PQ over these 64-dim embeddings measures 0.29 (sf0.01)
    and 0.24 (sf0.1) explained; the 0.15 floor catches codebook collapse
    (degenerate training → explained ≈ 0) with margin for corpus
    regeneration.  A top-k recall floor would be meaningless here: at 2
    bits/dim on near-isotropic vectors, ADC recall@10 is ~0.1–0.2 by
    construction, so reconstruction quality IS the testable contract.
    Validation cost is sample-bounded (≤ ``sample_size`` × d), constant
    in corpus size."""
    codebooks, sample = _pq_codebooks(sf_dir, m_sub, n_codes, iters, sample_size)
    d_sub = sample.shape[1] // m_sub
    err = 0.0
    for j in range(m_sub):
        sub = sample[:, j * d_sub : (j + 1) * d_sub]
        dist = ((sub[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(axis=2)
        err += float(dist.min(axis=1).sum())
    var = float(((sample - sample.mean(axis=0)[None, :]) ** 2).sum())
    explained = 1.0 - err / max(var, 1e-30)
    if explained < explained_floor:
        raise AssertionError(
            f"product_quantize explained variance {explained:.3f} < "
            f"documented floor {explained_floor} on the {len(sample)}-row "
            "training sample — codebook training degenerated "
            "(pipelines/ann.py)"
        )
    return _embeddings(sf_dir).map_batches(
        _PQEncode,
        fn_constructor_args=(codebooks,),
        concurrency=_pool(),
        batch_size=4096,
        batch_format="pyarrow",
    )


KMEANS_EXACT_SCALE = 1_000_000  # micro-units: floor(x * 1e6) per dimension


def _quantize_embeddings(batch: pa.Table, dims: int) -> tuple[np.ndarray, np.ndarray]:
    emb = batch.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    m = np.asarray(
        emb.values.to_numpy(zero_copy_only=False), dtype=np.float64
    ).reshape(-1, dims)
    q = np.floor(m * KMEANS_EXACT_SCALE).astype(np.int64)
    return batch.column("vec_id").to_numpy(zero_copy_only=False), q


def _kmeans_assign_int(q: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """argmin_c Σ_d (q_d − μ_cd)² in pure int64 (ties → lowest cluster,
    numpy argmin semantics — mirrored by the oracle's ORDER BY dist,
    cluster).  |q| ≤ ~2e6 ⇒ per-dim square ≤ 1.6e13, ×64 dims ≤ 1e15:
    comfortably inside int64."""
    n, k = len(q), len(cent)
    dist = np.empty((n, k), dtype=np.int64)
    for c in range(k):
        diff = q - cent[c][None, :]
        np.square(diff, out=diff)
        dist[:, c] = diff.sum(axis=1)
    return np.argmin(dist, axis=1)


def kmeans_exact(
    sf_dir: str, n_clusters: int = 4, iters: int = 3
) -> "ray.data.Dataset":
    """INTEGER-EXACT distributed Lloyd k-means over the full embeddings
    table — the iterative-ML Ray Data shape (per-iteration ``map_batches``
    partials + driver-side k×d combine + closure-broadcast centroids,
    same plan as :func:`kmeans_centroids_distributed`) made bit-exactly
    reproducible and SQL-checkable:

    * coordinates quantized once to micro-units (``floor(x·1e6)`` in
      float64 — float32→float64 is exact, so both engines quantize
      identically);
    * init = the quantized vectors of ``vec_id 0..k−1`` (deterministic);
    * assignment distances, cluster sums, and the centroid update
      ``μ = floordiv(Σq, n)`` are all int64 ops (floor division spelled
      with an explicit floormod so the oracle's truncating ``//`` agrees
      on negatives);
    * empty clusters keep their previous centroid.

    The oracle unrolls the same ``iters`` Lloyd rounds as SQL CTE blocks
    over ``unnest(embedding) WITH ORDINALITY`` — per-row-per-cluster
    distance aggregation, ROW_NUMBER argmin, LEFT-JOIN centroid update —
    so the query's final assignment is checked value-exact, not just in
    aggregate.  Scale shape: the data never leaves ``map_batches`` (each
    iteration ships k×d+k integers per block); centroids are broadcast by
    closure (k×d ≪ data); no exchange anywhere.

    Output: (vec_id, cluster) after ``iters`` iterations."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    dims = None
    head = []
    got = 0
    for rb in pf.iter_batches(columns=["vec_id", "embedding"], batch_size=4096):
        t = pa.Table.from_batches([rb])
        if dims is None:
            dims = len(t.column("embedding")[0])
        head.append(t)
        got += len(t)
        if got >= n_clusters:
            break
    h = pa.concat_tables(head)
    hv, hq = _quantize_embeddings(h, dims)
    order = np.argsort(hv)
    cent = hq[order[:n_clusters]].copy()

    ds = _embeddings(sf_dir).select_columns(["vec_id", "embedding"])

    for _ in range(iters):
        c = cent  # captured by value this iteration

        def partial(batch: pa.Table, c=c) -> pa.Table:
            _, q = _quantize_embeddings(batch, dims)
            assign = _kmeans_assign_int(q, c)
            sums = np.zeros((n_clusters, dims), dtype=np.int64)
            np.add.at(sums, assign, q)
            counts = np.bincount(assign, minlength=n_clusters).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(n_clusters, dtype=np.int64)),
                    "count": pa.array(counts),
                    "vsum": pa.array(list(sums), type=pa.large_list(pa.int64())),
                }
            )

        sums = np.zeros((n_clusters, dims), dtype=np.int64)
        counts = np.zeros(n_clusters, dtype=np.int64)
        for t in ray.get(
            ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        ):
            cl = t.column("cluster").to_numpy(zero_copy_only=False)
            cn = t.column("count").to_numpy(zero_copy_only=False)
            vs = np.asarray(
                t.column("vsum").combine_chunks().values.to_numpy(
                    zero_copy_only=False
                )
            ).reshape(len(cl), dims)
            np.add.at(sums, cl, vs)
            np.add.at(counts, cl, cn)
        new = cent.copy()
        nonempty = counts > 0
        # exact floor division (numpy // floors; spelled identically in SQL)
        new[nonempty] = np.floor_divide(sums[nonempty], counts[nonempty, None])
        cent = new

    cfinal = cent

    def final_assign(batch: pa.Table) -> pa.Table:
        vid, q = _quantize_embeddings(batch, dims)
        return pa.table(
            {
                "vec_id": pa.array(vid),
                "cluster": pa.array(
                    _kmeans_assign_int(q, cfinal).astype(np.int64)
                ),
            }
        )

    return ds.map_batches(final_assign, batch_format="pyarrow")
