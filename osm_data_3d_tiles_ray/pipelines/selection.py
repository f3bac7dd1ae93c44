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
