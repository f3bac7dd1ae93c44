"""Randomized property tests for the fourth-session kernels: the
prefix-sum interval join tie rules, skyline tie handling, the grouped
cross-product expansion, and global-rank determinism under duplicate
keys.  These exercise adversarial shapes (ties, empty windows, all-equal
points) the parquet fixtures don't contain."""

import numpy as np
import pyarrow as pa

from osm_data_3d_tiles_ray.pipelines.mining import _local_skyline


def test_skyline_all_equal_points_all_survive():
    pr = np.full(64, 7, dtype=np.int64)
    dt = np.full(64, 3, dtype=np.int64)
    keep = _local_skyline(pr, dt)
    assert len(keep) == 64  # ties dominate nobody


def test_skyline_matches_quadratic_bruteforce_randomized():
    rng = np.random.default_rng(11)
    for _ in range(30):
        n = int(rng.integers(1, 120))
        pr = rng.integers(0, 12, size=n).astype(np.int64)  # heavy ties
        dt = rng.integers(0, 12, size=n).astype(np.int64)
        keep = np.zeros(n, dtype=bool)
        keep[_local_skyline(pr, dt)] = True
        for i in range(n):
            dominated = bool(
                (
                    (pr >= pr[i])
                    & (dt >= dt[i])
                    & ((pr > pr[i]) | (dt > dt[i]))
                ).any()
            )
            assert keep[i] == (not dominated)


def _sweep_reference(uid, tsv, side, okey, kind, val):
    """Quadratic reference for the probe/prefix-sum interval-join kernel."""
    out = {}
    for i in np.flatnonzero((side == 0) & (kind == 0)):
        j = np.flatnonzero((side == 0) & (kind == 1) & (okey == okey[i]))[0]
        t0, t1, u = tsv[i], tsv[j], uid[i]
        m = (side == 1) & (uid == u) & (tsv >= t0) & (tsv < t1)
        out[int(okey[i])] = (int(m.sum()), int(val[m].sum()))
    return out


def test_interval_join_kernel_randomized():
    """The in-partition sweep (sort + cumsum + probe gather) must equal
    the quadratic scan, including equal-timestamp ties on both bounds."""
    from osm_data_3d_tiles_ray.pipelines.rangejoin import event_attribution  # noqa: F401

    rng = np.random.default_rng(5)
    for _ in range(40):
        n_ev = int(rng.integers(1, 60))
        n_an = int(rng.integers(1, 12))
        ev_uid = rng.integers(0, 4, size=n_ev).astype(np.int64)
        ev_ts = rng.integers(0, 30, size=n_ev).astype(np.int64)  # many ties
        ev_val = rng.integers(-5, 9, size=n_ev).astype(np.int64)
        an_uid = rng.integers(0, 4, size=n_an).astype(np.int64)
        an_t1 = rng.integers(0, 30, size=n_an).astype(np.int64)
        win = np.int64(int(rng.integers(1, 10)))
        uid = np.concatenate([an_uid, an_uid, ev_uid])
        tsv = np.concatenate([an_t1 - win, an_t1, ev_ts])
        side = np.concatenate(
            [np.zeros(2 * n_an, dtype=np.int8), np.ones(n_ev, dtype=np.int8)]
        )
        okey = np.concatenate(
            [np.arange(n_an), np.arange(n_an), np.zeros(n_ev)]
        ).astype(np.int64)
        kind = np.concatenate(
            [np.zeros(n_an), np.ones(n_an), np.zeros(n_ev)]
        ).astype(np.int8)
        val = np.concatenate([np.zeros(2 * n_an, dtype=np.int64), ev_val])
        # kernel (same ops as rangejoin.sweep_part, array-level)
        order = np.lexsort((side, tsv, uid))
        uid_s, side_s = uid[order], side[order]
        okey_s, kind_s, val_s = okey[order], kind[order], val[order]
        cum_n = np.cumsum(side_s == 1, dtype=np.int64)
        cum_v = np.cumsum(val_s, dtype=np.int64)
        pm = side_s == 0
        po = np.lexsort((kind_s[pm], okey_s[pm]))
        pok = okey_s[pm][po]
        pn, pv = cum_n[pm][po], cum_v[pm][po]
        got = {
            int(k): (int(c), int(s))
            for k, c, s in zip(pok[::2], pn[1::2] - pn[::2], pv[1::2] - pv[::2])
        }
        exp = _sweep_reference(uid, tsv, side, okey, kind, val)
        assert got == exp


def test_grouped_cross_product_expansion_law():
    """The repeat/arange-minus-cumsum expansion enumerates exactly the
    i<j pairs of every run."""
    rng = np.random.default_rng(3)
    for _ in range(25):
        n_runs = int(rng.integers(1, 10))
        lens = rng.integers(1, 7, size=n_runs)
        vals = np.concatenate(
            [rng.integers(0, 100, size=l) for l in lens]
        ).astype(np.int64)
        run_of = np.repeat(np.arange(n_runs), lens)
        # expansion under test (basket_pairs formulation)
        run_start = np.concatenate([[0], np.cumsum(lens)[:-1]])
        local_pos = np.arange(len(vals)) - run_start[run_of]
        total = int(local_pos.sum())
        second = np.repeat(np.arange(len(vals)), local_pos)
        offset = np.arange(total) - np.repeat(
            np.cumsum(local_pos) - local_pos, local_pos
        )
        first = np.repeat(np.arange(len(vals)) - local_pos, local_pos) + offset
        got = sorted(zip(first.tolist(), second.tolist()))
        exp = []
        for r in range(n_runs):
            idx = np.flatnonzero(run_of == r)
            for x in range(len(idx)):
                for y in range(x + 1, len(idx)):
                    exp.append((int(idx[x]), int(idx[y])))
        assert got == sorted(exp)
        # every pair stays inside its run
        assert (run_of[first] == run_of[second]).all()


def test_curriculum_rank_base_offsets_with_ties():
    """Distinct-length histogram + per-length offsets == global
    row_number, under heavy duplicate lengths."""
    rng = np.random.default_rng(9)
    for _ in range(20):
        n = int(rng.integers(1, 200))
        nc = rng.integers(0, 6, size=n).astype(np.int64)  # few lengths
        did = rng.permutation(n).astype(np.int64)
        # reference
        order = np.lexsort((did, -nc))
        ref_rank = np.empty(n, dtype=np.int64)
        ref_rank[order] = np.arange(1, n + 1)
        # kernel formulation: per-length base + in-length offset
        lengths, counts = np.unique(nc, return_counts=True)
        desc = np.argsort(-lengths)
        base_desc = np.concatenate([[0], np.cumsum(counts[desc])[:-1]])
        base_of_len = {int(lengths[desc][i]): int(base_desc[i]) for i in range(len(lengths))}
        got_rank = np.empty(n, dtype=np.int64)
        for length in lengths:
            members = np.flatnonzero(nc == length)
            sub = members[np.argsort(did[members])]
            got_rank[sub] = base_of_len[int(length)] + np.arange(1, len(sub) + 1)
        assert (got_rank == ref_rank).all()
