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


def test_exchange_canary_fires_on_synthetic_split():
    """The guard's verifier must reject any result where a key group was
    processed in more than one call (the split the Ray invariant
    forbids), where rows went missing, or where the hot key lost rows."""
    from osm_data_3d_tiles_ray.pipelines.partition import (
        _verify_canary_result,
    )

    ok = pa.table(
        {"k": [1, 42], "n": [4, 6], "calls": [1, 1]}
    )
    _verify_canary_result(ok, n_rows=10, hot_key=42, hot_n=6)  # no raise
    # hot key split across two calls (3 + 3 rows)
    split = pa.table(
        {"k": [1, 42, 42], "n": [4, 3, 3], "calls": [1, 1, 1]}
    )
    with pytest.raises(RuntimeError, match="canary FAILED"):
        _verify_canary_result(split, n_rows=10, hot_key=42, hot_n=6)
    # rows silently dropped
    dropped = pa.table({"k": [1, 42], "n": [4, 5], "calls": [1, 1]})
    with pytest.raises(RuntimeError, match="canary FAILED"):
        _verify_canary_result(dropped, n_rows=10, hot_key=42, hot_n=6)


def test_exchange_canary_runs_once_per_session(ray_session):
    """The real canary passes on this Ray version, is invoked by the
    first map_key_partitions of the session, and is cached per job (no
    per-exchange overhead afterwards)."""
    import os

    from osm_data_3d_tiles_ray.pipelines import partition

    assert os.environ.get("OSM3D_MKP_GUARD", "1") != "0"
    ds = ray.data.from_arrow(
        pa.table({"k": np.arange(1000, dtype=np.int64) % 7})
    ).repartition(4)
    out = map_key_partitions(ds, ["k"], _make_group_audit_fn())
    assert int(out.to_pandas()["n"].sum()) == 1000
    job = ray.get_runtime_context().get_job_id()
    assert partition._CANARY_STATE["job"] == job  # armed + cached
