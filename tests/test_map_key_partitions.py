"""Invariant tests for the hash-partitioned exchange (pipelines/partition.py).

`map_key_partitions` promises each `fn` call sees COMPLETE key groups and
every group exactly once — the co-location guarantee 76 call sites build
segment logic on.  Since the round-4 rewrite the exchange is
``sort(full-64-bit-hash)`` + one call per sorted block, which relies on
Ray's range partitioner never splitting equal sort keys across blocks;
these tests pin that invariant under the adversarial shapes (one hot key
holding most rows, many singleton keys, empty input).
"""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from osm_data_3d_tiles_ray.pipelines.partition import (
    first_per_key,
    map_key_partitions,
)


def _make_group_audit_fn():
    """Per fn call: one output row per key run with its full count — if a
    key were split across calls, the final per-key call count exceeds 1.
    Built by a factory so the closure pickles BY VALUE (a test-module
    top-level function is unimportable inside Ray workers)."""

    def audit(part: pa.Table) -> pa.Table:
        if len(part) == 0:
            return pa.table(
                {"k": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64()),
                 "calls": pa.array([], type=pa.int64())}
            )
        k = np.sort(part.column("k").to_numpy(zero_copy_only=False))
        starts = np.empty(len(k), bool)
        starts[0] = True
        starts[1:] = k[1:] != k[:-1]
        idx = np.nonzero(starts)[0]
        cnt = np.diff(np.append(idx, len(k)))
        return pa.table(
            {"k": pa.array(k[idx]), "n": pa.array(cnt.astype(np.int64)),
             "calls": pa.array(np.ones(len(idx), np.int64))}
        )

    return audit


def test_hot_key_and_singletons_complete_groups(ray_session):
    rng = np.random.default_rng(0)
    n = 200_000
    keys = rng.integers(1_000_000, 2_000_000, n)  # mostly singletons
    keys[: n // 2] = 42  # one key owns half the rows
    ds = ray.data.from_arrow(pa.table({"k": keys})).repartition(32)
    out = pa.concat_tables(
        map_key_partitions(ds, ["k"], _make_group_audit_fn()).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ).to_pandas()
    per_key = out.groupby("k").agg({"n": "sum", "calls": "sum"})
    # every key processed in exactly ONE fn call, with its full group
    assert int(per_key["calls"].max()) == 1
    assert int(per_key.loc[42, "n"]) == n // 2
    import collections

    truth = collections.Counter(keys.tolist())
    assert len(per_key) == len(truth)
    assert int(per_key["n"].sum()) == n


def test_first_per_key_distinct(ray_session):
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 500, 20_000)
    vals = rng.integers(0, 10**9, 20_000)
    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals})).repartition(8)
    out = pa.concat_tables(
        first_per_key(ds, ["k"]).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ).to_pandas()
    assert len(out) == len(np.unique(keys))
    # deterministic representative: minimal (k, v) row per key
    import pandas as pd

    truth = (
        pd.DataFrame({"k": keys, "v": vals})
        .sort_values(["k", "v"])
        .groupby("k", as_index=False)
        .first()
    )
    got = out.sort_values("k").reset_index(drop=True)
    assert (got["k"].to_numpy() == truth["k"].to_numpy()).all()
    assert (got["v"].to_numpy() == truth["v"].to_numpy()).all()


def test_empty_input(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array([], type=pa.int64())})
    )
    out = map_key_partitions(ds, ["k"], _make_group_audit_fn())
    assert out.count() == 0
