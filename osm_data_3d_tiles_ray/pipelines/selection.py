"""Exact distributed order statistics in two bounded passes.

``quality_top_percent`` (textops) computes an exact percentile when the
score DOMAIN is small enough to histogram directly; this module handles
the general int64 domain (per-customer cents, e6-scaled floats) with the
classic bucket-refinement selection:

1. pass 1 histograms the value's HIGH BITS (``value >> bucket_bits``) —
   a bounded bucket table regardless of value cardinality;
2. the driver reduces that tiny table to, per requested rank, the bucket
   containing it plus the count of everything below the bucket;
3. pass 2 re-scans with a filter to ONLY the target buckets and builds
   the exact per-value histogram inside them — bounded by
   ``2^bucket_bits × len(ranks)`` rows by construction;
4. the driver finishes each rank with a cumulative inside its bucket.

No sort of the data, no sketch approximation, driver state bounded by
bucket count.  The input is scanned twice — the honest trade against a
full distributed sort; pass a ``materialize()``d dataset when the input
is itself a bounded aggregate.

Negative values work: ``>>`` is an arithmetic shift, so bucket ids and
in-bucket values both order consistently with the signed values.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def exact_value_ranks(
    ds: "ray.data.Dataset",
    col: str,
    ranks: list[int],
    bucket_bits: int = 16,
) -> dict[int, int]:
    """For each 1-based rank r in ``ranks``, the exact r-th smallest value
    of int64 column ``col`` (i.e. the smallest v with count(<= v) >= r)."""

    def bucket_partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(v >> bucket_bits, return_counts=True)
        return pa.table(
            {"bucket": pa.array(uk), "p_n": pa.array(cnt.astype(np.int64))}
        )

    hist = (
        ds.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n"))
        .to_pandas()  # bounded: one row per occupied bucket
        .sort_values("bucket")
    )
    buckets = hist["bucket"].to_numpy().astype(np.int64)
    counts = hist["n"].to_numpy().astype(np.int64)
    cum = np.cumsum(counts)
    total = int(cum[-1]) if len(cum) else 0
    out: dict[int, int] = {}
    targets: dict[int, tuple[int, int]] = {}  # rank -> (bucket, base)
    for r in ranks:
        if not (1 <= r <= total):
            raise ValueError(f"rank {r} outside [1, {total}]")
        i = int(np.searchsorted(cum, r))
        targets[r] = (int(buckets[i]), int(cum[i] - counts[i]))
    want = np.array(sorted({b for b, _ in targets.values()}), dtype=np.int64)

    def value_partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        keep = np.isin(v >> bucket_bits, want)
        uk, cnt = np.unique(v[keep], return_counts=True)
        return pa.table(
            {"value": pa.array(uk), "p_n": pa.array(cnt.astype(np.int64))}
        )

    vh = (
        ds.map_batches(value_partial, batch_format="pyarrow")
        .groupby("value")
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n"))
        .to_pandas()  # bounded: <= 2^bucket_bits x len(target buckets)
        .sort_values("value")
    )
    vals = vh["value"].to_numpy().astype(np.int64)
    vcnt = vh["n"].to_numpy().astype(np.int64)
    vbucket = vals >> bucket_bits
    for r, (b, base) in targets.items():
        m = vbucket == b
        c = base + np.cumsum(vcnt[m])
        out[r] = int(vals[m][np.searchsorted(c, r)])
    return out


def exact_group_quantiles(
    ds: "ray.data.Dataset",
    group_col: str,
    col: str,
    q_e2: int,
    bucket_bits: int = 16,
) -> dict[str, tuple[int, int]]:
    """Per-GROUP exact quantile (smallest v in the group with
    ``count(<= v) >= ceil(q_e2/100 * n_group)``) for every group value —
    the grouped generalization of :func:`exact_value_ranks`.  Group
    cardinality must be bounded (types, langs, classes — driver state is
    one bucket row per (group, occupied bucket)).

    Returns ``{group: (n_group, threshold)}``."""

    def bucket_partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_numpy(zero_copy_only=False).astype(str)
        v = batch.column(col).to_numpy(zero_copy_only=False)
        codes, inv = np.unique(g, return_inverse=True)
        b = v >> bucket_bits
        # pack (group code, bucket) — bucket may be negative, offset it
        key = inv.astype(np.int64) * (1 << 48) + (b + (1 << 47))
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                group_col: pa.array(codes[(uk >> 48)].astype(str)),
                "bucket": pa.array((uk & ((1 << 48) - 1)) - (1 << 47)),
                "p_n": pa.array(cnt.astype(np.int64)),
            }
        )

    hist = (
        ds.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby([group_col, "bucket"])
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n"))
        .to_pandas()  # bounded: groups x occupied buckets
        .sort_values([group_col, "bucket"])
    )
    targets: dict[str, tuple[int, int, int]] = {}  # g -> (rank, bucket, base)
    for g, sub in hist.groupby(group_col, sort=True):
        cnt = sub["n"].to_numpy().astype(np.int64)
        buckets = sub["bucket"].to_numpy().astype(np.int64)
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        rank = -(-q_e2 * n // 100)
        i = int(np.searchsorted(cum, rank))
        targets[str(g)] = (rank, int(buckets[i]), int(cum[i] - cnt[i]))
    want_pairs = {(g, b) for g, (_, b, _) in targets.items()}

    def value_partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_numpy(zero_copy_only=False).astype(str)
        v = batch.column(col).to_numpy(zero_copy_only=False)
        b = v >> bucket_bits
        keep = np.zeros(len(v), dtype=bool)
        for gg, bb in want_pairs:  # bounded loop: one entry per group
            keep |= (g == gg) & (b == bb)
        gk, vk = g[keep], v[keep]
        if len(gk) == 0:
            return pa.table(
                {
                    group_col: pa.array([], type=pa.string()),
                    "value": pa.array([], type=pa.int64()),
                    "p_n": pa.array([], type=pa.int64()),
                }
            )
        # per-(group, value) counts without packing overflow: lexsort
        order = np.lexsort((vk, gk))
        gk, vk = gk[order], vk[order]
        first = np.concatenate(
            [[True], (gk[1:] != gk[:-1]) | (vk[1:] != vk[:-1])]
        )
        idx = np.flatnonzero(first)
        cnt = np.diff(np.append(idx, len(gk)))
        return pa.table(
            {
                group_col: pa.array(gk[first].astype(str)),
                "value": pa.array(vk[first]),
                "p_n": pa.array(cnt.astype(np.int64)),
            }
        )

    vh = (
        ds.map_batches(value_partial, batch_format="pyarrow")
        .groupby([group_col, "value"])
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n"))
        .to_pandas()  # bounded: <= groups x 2^bucket_bits
        .sort_values([group_col, "value"])
    )
    out: dict[str, tuple[int, int]] = {}
    for g, (rank, b, base) in targets.items():
        sub = vh[vh[group_col] == g]
        vals = sub["value"].to_numpy().astype(np.int64)
        m = (vals >> bucket_bits) == b
        c = base + np.cumsum(sub["n"].to_numpy().astype(np.int64)[m])
        tot = int(hist[hist[group_col] == g]["n"].sum())  # pass-1 total
        out[g] = (tot, int(vals[m][np.searchsorted(c, rank)]))
    return out
