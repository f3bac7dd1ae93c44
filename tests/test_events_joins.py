"""As-of join + windowed rank over the events table (pipelines/events.py).

Both run against a tiny handwritten corpus with a brute-force oracle, so
the semantics (floor match, inner-join drop, tie-breaks) are pinned
independently of the DuckDB driver comparison.
"""

import collections

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from osm_data_3d_tiles_ray.pipelines.events import asof_last_order, user_value_rank

US = 1_000_000


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory, ray_session):
    out = tmp_path_factory.mktemp("events_joins")
    # user 1: orders at t=100, 200 (and a duplicate 200); events straddling
    # user 2: event BEFORE any order (dropped); user 3: no orders at all
    ev = pa.table(
        {
            "event_id": pa.array([10, 11, 12, 20, 30], type=pa.int64()),
            "ts": pa.array(
                np.array([150, 200, 250, 50, 500], dtype=np.int64) * US
            ).cast(pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1, 2, 3], type=pa.int64()),
            "event_type": pa.array(["a"] * 5),
            "value": pa.array([5.0, 1.0, 5.0, 2.0, 3.0]),
            "props": pa.array(["{}"] * 5),
        }
    )
    orders = pa.table(
        {
            "o_custkey": pa.array([1, 1, 1, 2], type=pa.int64()),
            "o_orderdate": pa.array(
                np.array([100, 200, 200, 100], dtype=np.int64) * US
            ).cast(pa.timestamp("us")),
        }
    )
    pq.write_table(ev, out / "events.parquet")
    pq.write_table(orders, out / "orders.parquet")
    return str(out)


def test_asof_floor_semantics(tiny_dir):
    df = asof_last_order(tiny_dir).to_pandas().sort_values("event_id")
    # user 2's event (ts=50 < first order 100) and user 3 (no orders) drop
    assert df["event_id"].tolist() == [10, 11, 12]
    got = {r.event_id: r.last_order_date for r in df.itertuples()}
    assert got[10] == pd.Timestamp(100 * US, unit="us")   # strict floor
    assert got[11] == pd.Timestamp(200 * US, unit="us")   # ts == orderdate matches
    assert got[12] == pd.Timestamp(200 * US, unit="us")   # latest of several
    assert (df["user_id"] == 1).all()


def test_user_value_rank_ties_break_on_event_id(tiny_dir):
    df = user_value_rank(tiny_dir).to_pandas()
    u1 = df[df.user_id == 1].sort_values("rnk")
    # values 5,1,5 → event 10 (value 5, lower id) ranks before event 12
    assert u1["event_id"].tolist() == [10, 12, 11]
    assert u1["rnk"].tolist() == [1, 2, 3]
    assert set(df[df.user_id == 2]["rnk"]) == {1}
    assert set(df[df.user_id == 3]["rnk"]) == {1}


def test_hll_distinct_users_accuracy(ray_session):
    """HLL estimate within 3% of the exact distinct count at sf0.01
    (150 true users → linear-counting regime, near-exact) and within 5%
    on a 40k-id synthetic (estimator regime)."""
    import duckdb

    from osm_data_3d_tiles_ray.pipelines.events import distinct_users_hll

    t = distinct_users_hll("/root/testdata/sf0.01")
    est = t.column("n_users_hll")[0].as_py()
    exact = duckdb.sql(
        "SELECT COUNT(DISTINCT user_id) FROM read_parquet('/root/testdata/sf0.01/events.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.03, (est, exact)


def test_hll_large_cardinality(tmp_path, ray_session):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_data_3d_tiles_ray.pipelines.events import distinct_users_hll

    rng = np.random.default_rng(7)
    ids = rng.choice(2_000_000, size=40_000, replace=False).astype(np.int64)
    uid = np.repeat(ids, 2)  # every id twice → distinct = 40k, rows = 80k
    n = len(uid)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(np.arange(n, dtype=np.int64) * 1_000_000).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array(uid),
            "event_type": pa.array(["x"] * n),
            "value": pa.array(np.zeros(n)),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    est = distinct_users_hll(str(tmp_path)).column("n_users_hll")[0].as_py()
    assert abs(est - 40_000) / 40_000 < 0.05, est


def test_type_quantiles_match_numpy(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from osm_data_3d_tiles_ray.pipelines.events import type_quantiles

    got = {
        r.event_type: (r.q50_e4, r.q95_e4)
        for r in type_quantiles("/root/testdata/sf0.01").to_pandas().itertuples()
    }
    t = pq.read_table("/root/testdata/sf0.01/events.parquet", columns=["event_type", "value"])
    et = t.column("event_type").to_numpy(zero_copy_only=False)
    v = t.column("value").to_numpy()
    for name in np.unique(et):
        vals = v[et == name]
        q50, q95 = np.quantile(vals, [0.5, 0.95])
        assert got[name] == (
            int(np.floor(q50 * 1e4 + 0.5)),
            int(np.floor(q95 * 1e4 + 0.5)),
        )


def test_asof_randomized_vs_bruteforce(tmp_path, ray_session):
    """5 seeded random corpora: the distributed as-of join must equal the
    per-event brute-force floor scan exactly (incl. boundary ts == date)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osm_data_3d_tiles_ray.pipelines.events import asof_last_order

    for seed in range(5):
        rng = np.random.default_rng(seed)
        n_ev, n_ord, n_users = 60, 40, 7
        d = tmp_path / f"s{seed}"
        d.mkdir()
        ev_ts = rng.integers(0, 1000, n_ev) * 1_000_000
        ev_uid = rng.integers(0, n_users, n_ev)
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
                    "ts": pa.array(ev_ts.astype(np.int64)).cast(pa.timestamp("us")),
                    "user_id": pa.array(ev_uid.astype(np.int64)),
                    "event_type": pa.array(["x"] * n_ev),
                    "value": pa.array(np.zeros(n_ev)),
                    "props": pa.array(["{}"] * n_ev),
                }
            ),
            d / "events.parquet",
        )
        od_ts = rng.integers(0, 1000, n_ord) * 1_000_000
        od_uid = rng.integers(0, n_users, n_ord)
        pq.write_table(
            pa.table(
                {
                    "o_custkey": pa.array(od_uid.astype(np.int64)),
                    "o_orderdate": pa.array(od_ts.astype(np.int64)).cast(
                        pa.timestamp("us")
                    ),
                }
            ),
            d / "orders.parquet",
        )
        got = {
            r.event_id: r.last_order_date.value
            for r in asof_last_order(str(d)).to_pandas().itertuples()
        }
        # brute force floor per event
        want = {}
        for i in range(n_ev):
            mine = od_ts[od_uid == ev_uid[i]]
            mine = mine[mine <= ev_ts[i]]
            if len(mine):
                want[i] = int(mine.max()) * 1000  # us → ns (pandas .value)
        assert got == want, f"seed {seed}"


def test_tdigest_quantiles_accuracy(ray_session):
    """Digest p50/p95/p99 within 2% relative of exact on the events table."""
    import numpy as np
    import pyarrow.parquet as pq

    from osm_data_3d_tiles_ray.pipelines.events import value_quantiles_tdigest

    got = value_quantiles_tdigest("/root/testdata/sf0.01")
    v = pq.read_table("/root/testdata/sf0.01/events.parquet", columns=["value"]).column(
        "value"
    ).to_numpy()
    exact = np.quantile(v, [0.5, 0.95, 0.99])
    est = np.asarray(got.column("value_est"))
    span = v.max() - v.min()
    assert (np.abs(est - exact) / span < 0.02).all(), (est, exact)


def test_tdigest_merge_invariance(ray_session):
    """Digest of digests ≈ digest of all data (mergeability), heavy skew."""
    import numpy as np

    from osm_data_3d_tiles_ray.pipelines.events import (
        _tdigest_compress,
        _tdigest_quantile,
    )

    rng = np.random.default_rng(11)
    data = np.concatenate([rng.lognormal(0, 2, 100_000), [1e6] * 10])
    parts = np.array_split(data, 37)
    ms, cs = [], []
    for part in parts:
        m, c = _tdigest_compress(part, np.ones(len(part)), 200)
        ms.append(m)
        cs.append(c)
    m, c = _tdigest_compress(np.concatenate(ms), np.concatenate(cs), 200)
    for q in (0.5, 0.95, 0.99):
        exact = np.quantile(data, q)
        est = _tdigest_quantile(m, c, q)
        assert abs(est - exact) / max(1e-9, exact) < 0.05, (q, est, exact)


def test_sliding_window_vs_bruteforce(tiny_dir, ray_session):
    """Every (window, type) bucket equals the brute-force replicate count
    on the handwritten corpus."""
    import numpy as np

    from osm_data_3d_tiles_ray.pipelines.events import sliding_window

    got = sliding_window(tiny_dir, hours=6).to_pandas()
    # brute force: event hours from the fixture (ts = 150,200,250,50,500 sec
    # → all hour 0); each event lands in windows h, h-1h, ..., h-5h
    us_h = 3_600_000_000
    ev_hours = [0, 0, 0, 0, 0]
    want = {}
    for h in ev_hours:
        for i in range(6):
            key = (h - i) * us_h
            want[key] = want.get(key, 0) + 1
    got_counts = {
        int(r.window_start.value // 1000): r.n_events for r in got.itertuples()
    }
    assert got_counts == want


def test_value_outliers_brute_force(ray_session):
    import numpy as np
    import pandas as pd

    from osm_data_3d_tiles_ray.pipelines.events import value_outliers

    sf = "/root/testdata/sf0.001"
    out = value_outliers(sf).to_pandas()
    ev = pd.read_parquet(f"{sf}/events.parquet")[["event_id", "event_type", "value"]]
    want_ids = set()
    for et, g in ev.groupby("event_type"):
        q95 = int(np.floor(np.quantile(g.value.to_numpy(), 0.95) * 1e4 + 0.5))
        ve4 = np.floor(g.value.to_numpy() * 1e4 + 0.5).astype(np.int64)
        want_ids |= set(g.event_id.to_numpy()[ve4 > q95])
    assert set(out.event_id) == want_ids
    assert (out.value_e4 == np.floor(
        ev.set_index("event_id").loc[out.event_id, "value"].to_numpy() * 1e4 + 0.5
    ).astype(np.int64)).all()


def test_funnel_brute_force(ray_session):
    import numpy as np
    import pandas as pd

    from osm_data_3d_tiles_ray.pipelines.events import funnel

    sf = "/root/testdata/sf0.001"
    got = funnel(sf).to_pandas().set_index("user_id").funnel_stage
    ev = pd.read_parquet(f"{sf}/events.parquet")
    want = {}
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values("ts")
        prev = pd.Timestamp.min
        stage = 0
        for s in ("view", "click", "purchase"):
            cand = g[(g.event_type == s) & (g.ts > prev)]
            if len(cand) == 0:
                break
            prev = cand.ts.iloc[0]
            stage += 1
        want[uid] = stage
    assert dict(got) == want


def test_funnel_stage_variety(ray_session, tmp_path):
    """Greedy-order semantics on a hand-built corpus covering every stage:
    u0 never views; u1 views only; u2 view→click; u3 completes; u4 has
    purchase BEFORE click (stage 2, the order matters); u5's click ties
    the view timestamp exactly (strict >, so the click does not count)."""
    import numpy as np
    import pandas as pd

    from osm_data_3d_tiles_ray.pipelines.events import funnel

    t0 = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    rows = [
        (0, t0, "error"),
        (1, t0, "view"),
        (2, t0, "view"), (2, t0 + s, "click"),
        (3, t0, "view"), (3, t0 + s, "click"), (3, t0 + 2 * s, "purchase"),
        (4, t0, "view"), (4, t0 + s, "purchase"), (4, t0 + 2 * s, "click"),
        (5, t0, "view"), (5, t0, "click"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["event_id"] = np.arange(len(df))
    df["value"] = 1.0
    df["props"] = ""
    df.to_parquet(tmp_path / "events.parquet")
    got = funnel(str(tmp_path)).to_pandas().set_index("user_id").funnel_stage
    assert dict(got) == {0: 0, 1: 1, 2: 2, 3: 3, 4: 2, 5: 1}


def test_percent_rank_brute_force_with_ties(ray_session, tmp_path):
    import numpy as np
    import pandas as pd

    from osm_data_3d_tiles_ray.pipelines.events import value_percent_rank

    # hand-built corpus with heavy ties + a single-row type (n==1 edge)
    rows = []
    vals = [1.0, 1.0, 2.0, 2.0, 2.0, 3.0]
    for i, v in enumerate(vals):
        rows.append((i, pd.Timestamp("2024-01-01"), i, "a", v, ""))
    rows.append((99, pd.Timestamp("2024-01-01"), 99, "b", 7.0, ""))
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.to_parquet(tmp_path / "events.parquet")
    got = value_percent_rank(str(tmp_path)).to_pandas().set_index("event_id")
    # percent_rank: count(strictly smaller)/(n-1)
    want = {0: 0, 1: 0, 2: int(np.floor(2 / 5 * 1e6 + 0.5)),
            3: int(np.floor(2 / 5 * 1e6 + 0.5)), 4: int(np.floor(2 / 5 * 1e6 + 0.5)),
            5: 1_000_000, 99: 0}
    assert dict(got.pct_e6) == want


def test_value_histogram_brute_force(ray_session):
    import numpy as np
    import pandas as pd

    from osm_data_3d_tiles_ray.pipelines.events import value_histogram

    sf = "/root/testdata/sf0.001"
    got = value_histogram(sf).to_pandas()
    ev = pd.read_parquet(f"{sf}/events.parquet")
    ev["bin"] = np.floor(ev.value.to_numpy() / 10.0).astype(np.int64)
    want = ev.groupby(["event_type", "bin"]).size().to_dict()
    assert {(r.event_type, r.bin): r.n for r in got.itertuples()} == want


def test_distinct_users_by_type_brute_force(ray_session):
    import pandas as pd

    from osm_data_3d_tiles_ray.pipelines.events import distinct_users_by_type

    sf = "/root/testdata/sf0.001"
    got = distinct_users_by_type(sf).to_pandas().set_index("event_type")
    ev = pd.read_parquet(f"{sf}/events.parquet")
    want = ev.groupby("event_type").user_id.nunique().to_dict()
    assert dict(got.n_users) == want


def test_windowed_dedup_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    from osm_data_3d_tiles_ray.pipelines.events import windowed_dedup

    sf = "/root/testdata/sf0.001"
    got = (
        windowed_dedup(sf)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{sf}/events.parquet").sort_values(
        ["user_id", "event_type", "ts", "event_id"]
    )
    prev = ev.groupby(["user_id", "event_type"]).ts.shift()
    gap_us = (ev.ts - prev).dt.total_seconds() * 1e6
    kept = prev.isna() | (gap_us > 60_000_000)
    want = pd.DataFrame(
        {"event_type": ev.event_type, "kept": kept.astype(int)}
    ).groupby("event_type").agg(n_total=("kept", "size"), n_kept=("kept", "sum"))
    assert got.event_type.tolist() == list(want.index)
    assert got.n_total.tolist() == want.n_total.tolist()
    assert got.n_kept.tolist() == want.n_kept.tolist()


def test_grid_smooth_brute_force(ray_session):
    import numpy as np
    import pandas as pd
    from osm_data_3d_tiles_ray.pipelines.events import grid_smooth

    sf = "/root/testdata/sf0.001"
    got = (
        grid_smooth(sf)
        .to_pandas()
        .sort_values(["gx", "gy"])
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{sf}/events.parquet")
    gx = (ev.user_id % 32).to_numpy()
    gy = ev.ts.dt.hour.to_numpy().astype(np.int64)
    grid = collections.Counter(zip(gx.tolist(), gy.tolist()))
    rows = []
    for (x, y), c in sorted(grid.items()):
        s = sum(
            grid.get((x + dx, y + dy), 0)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        rows.append((x, y, c, s))
    want = pd.DataFrame(rows, columns=["gx", "gy", "n_events", "smooth3x3"])
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_session_ids_consistency(ray_session):
    """Per-event session ids reconcile exactly with the sessionize
    aggregates: same session count and sizes per user."""
    from osm_data_3d_tiles_ray.pipelines.events import session_ids, sessionize

    sf = "/root/testdata/sf0.001"
    ids = session_ids(sf).to_pandas()
    sess = sessionize(sf).to_pandas()
    per_user_ids = ids.groupby("user_id").session_idx.max() + 1
    per_user_sess = sess.groupby("user_id").size()
    assert per_user_ids.sort_index().tolist() == per_user_sess.sort_index().tolist()
    sizes_a = (
        ids.groupby(["user_id", "session_idx"]).size().sort_index().tolist()
    )
    ev = pd.read_parquet(f"{sf}/events.parquet")
    assert sum(sizes_a) == len(ev)
    sizes_b = (
        sess.sort_values(["user_id", "session_start"])
        .groupby("user_id")
        .n_events.apply(list)
        .explode()
        .astype(int)
        .tolist()
    )
    assert sorted(sizes_a) == sorted(sizes_b)
