"""Columnar-storage diagnostics: run-length statistics under column
permutation (shape from "Column Partition and Permutation for Run
Length Encoding in Columnar Databases", SIGMOD 2020 — see PAPERS.md).

``rle_run_stats`` measures how many RLE runs a categorical column needs
under the table's storage order vs under a value-clustered permutation
— the payoff estimate a layout optimizer computes before rewriting a
100 TB table.

The interesting half is the ORDERED run count without a global sort:
osm_id ranges are order-preserving under a bit shift, so each row maps
to a range bucket (``osm_id >> k``), every bucket's rows co-locate via
one hash exchange, and the partition kernel counts in-bucket value
transitions plus reports each bucket's (first, last) boundary values —
a BOUNDED per-bucket summary the driver stitches for the cross-bucket
transitions.  The value-clustered run count is simply the distinct
value count (runs under ORDER BY (value, id) == n_distinct).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def rle_run_stats(
    sf_dir: str, column: str = "roof_type", bucket_bits: int = 8
) -> "pa.Table":
    """RLE run counts of a buildings column: storage order (osm_id) vs
    value-clustered order.  Output one row:
    (column_name, n_rows, runs_storage_order, runs_value_order,
    permute_gain_e6 = runs_storage·1e6 // runs_value).
    """
    from ..synth.generator import ensure_synth, sf_from_dir
    from .partition import map_key_partitions

    root = ensure_synth(sf_from_dir(sf_dir))

    import pyarrow.compute as pc

    def add_bucket(batch: pa.Table) -> pa.Table:
        oid = batch.column("osm_id").to_numpy(zero_copy_only=False)
        # NULL is its own run category (sentinel, mirrored by the oracle's
        # COALESCE) — numpy string casts would otherwise decide this
        return pa.table(
            {
                "bucket": pa.array((oid >> bucket_bits).astype(np.int64)),
                "osm_id": batch.column("osm_id"),
                "val": pc.fill_null(batch.column(column), "\x01"),
            }
        )

    pts = ray.data.read_parquet(
        str(root / "buildings"), columns=["osm_id", column]
    ).map_batches(add_bucket, batch_format="pyarrow")

    def bucket_summary(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bucket": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "transitions": pa.array([], type=pa.int64()),
                "first_val": pa.array([], type=pa.string()),
                "last_val": pa.array([], type=pa.string()),
            }
        )
        if len(tbl) == 0:
            return empty
        bkt = tbl.column("bucket").to_numpy(zero_copy_only=False)
        oid = tbl.column("osm_id").to_numpy(zero_copy_only=False)
        val = tbl.column("val").to_numpy(zero_copy_only=False).astype(str)
        order = np.lexsort((oid, bkt))
        bkt, val = bkt[order], val[order]
        brk = np.ones(len(bkt), dtype=bool)
        brk[1:] = bkt[1:] != bkt[:-1]
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(bkt)) - 1
        # value transitions WITHIN a bucket (row i vs i-1, same bucket)
        ch = np.zeros(len(bkt), dtype=np.int64)
        ch[1:] = (val[1:] != val[:-1]) & ~brk[1:]
        gid = np.cumsum(brk) - 1
        trans = np.bincount(gid, weights=ch).astype(np.int64)
        n = np.bincount(gid).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bkt[starts]),
                "n": pa.array(n),
                "transitions": pa.array(trans),
                "first_val": pa.array(val[starts].astype(object), type=pa.string()),
                "last_val": pa.array(val[ends].astype(object), type=pa.string()),
            }
        )

    summaries = (
        map_key_partitions(pts, ["bucket"], bucket_summary)
        .to_pandas()  # bounded: one row per occupied id-range bucket
        .sort_values("bucket")
    )
    n_rows = int(summaries["n"].sum())
    in_bucket = int(summaries["transitions"].sum())
    firsts = summaries["first_val"].to_numpy().astype(str)
    lasts = summaries["last_val"].to_numpy().astype(str)
    cross = int((lasts[:-1] != firsts[1:]).sum()) if len(firsts) > 1 else 0
    runs_storage = 1 + in_bucket + cross if n_rows else 0

    def distinct_partial(batch: pa.Table) -> pa.Table:
        u = np.unique(batch.column("val").to_numpy(zero_copy_only=False).astype(str))
        return pa.table({"val": pa.array(u.astype(object), type=pa.string())})

    runs_value = (
        pts.select_columns(["val"])
        .map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("val")
        .count()
        .count()  # bounded: distinct categorical values
    )
    return pa.table(
        {
            "column_name": pa.array([column]),
            "n_rows": pa.array([n_rows], type=pa.int64()),
            "runs_storage_order": pa.array([runs_storage], type=pa.int64()),
            "runs_value_order": pa.array([int(runs_value)], type=pa.int64()),
            "permute_gain_e6": pa.array(
                [runs_storage * 1_000_000 // max(1, int(runs_value))],
                type=pa.int64(),
            ),
        }
    )
