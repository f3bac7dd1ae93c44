"""Dataset-diagnostics operators: weighted sampling, association and
correlation statistics (no reference analog — these extend the engine's
training-data toolkit with the measurement ops a corpus curator runs
before committing a mixture).

All three follow the repo's exact-oracle discipline:

* ``pps_sample`` keeps an event with probability proportional to its
  value using the deterministic keyed Jenkins hash (geom/rng.py) — the
  keep rule is pure integer arithmetic (``h · CAP_e6 < value_e6 · 2^32``),
  so the DuckDB mirror (``_jenkins_round_sql``) reproduces the exact
  sample.  No RNG state, partition-invariant, resumable.

* ``type_value_corr`` computes per-group Pearson correlation from the
  six integer component sums (n, Σx, Σy, Σxy, Σx², Σy²) accumulated as
  exact int64 per batch and combined by one bounded groupby.  The final
  ``corr_e6`` uses only IEEE-exact float ops (divide, sqrt) on the same
  integers — bit-identical between numpy and DuckDB (the repo float
  rule's sqrt exception: correctly-rounded, not libm-approximated).

* ``source_lang_pmi`` emits the pointwise-mutual-information table
  between the source and language columns: one bounded (source, lang)
  count groupby plus marginals derived from the SAME cell table (cells
  are bounded by |sources| × |langs|, so the finish is driver-side by
  construction).  Per-cell PMI floors to integer micro-nats.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_VALUE_CAP_E6 = np.int64(500_000_000)  # events.value < 500 by construction
_TWO32 = np.int64(4294967296)


def pps_sample(sf_dir: str, tag: int = 41) -> "ray.data.Dataset":
    """Probability-proportional-to-size event sample: keep an event with
    probability ``value / 500`` — deterministically, via the keyed
    Jenkins uniform (keep iff ``h·CAP_e6 < value_e6·2^32``; both products
    stay under 2^62, exact in int64 on both engine and oracle).

    Output: (event_id, user_id, value_micro, h).
    """
    from ..geom.rng import jenkins_mix

    tagmix = np.uint32((tag * 2654435761) & 0xFFFFFFFF)

    def partial(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        v = batch.column("value").to_numpy(zero_copy_only=False)
        v_e6 = np.floor(v * 1e6 + 0.5).astype(np.int64)
        h = jenkins_mix(eid.astype(np.uint64).astype(np.uint32) ^ tagmix)
        h = jenkins_mix(
            h ^ (eid.astype(np.uint64) >> np.uint64(32)).astype(np.uint32)
        )
        h64 = h.astype(np.int64)
        keep = h64 * _VALUE_CAP_E6 < v_e6 * _TWO32
        return pa.table(
            {
                "event_id": pa.array(eid[keep].astype(np.int64)),
                "user_id": batch.column("user_id").filter(pa.array(keep)),
                "value_micro": pa.array(v_e6[keep]),
                "h": pa.array(h64[keep]),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    ).map_batches(partial, batch_format="pyarrow")


def type_value_corr(sf_dir: str) -> "ray.data.Dataset":
    """Per event_type Pearson correlation between value (in cents) and
    hour-of-day.  Component sums are exact int64 (value ≤ 500 ⇒ Σx²
    overflows int64 only past ~10^12 rows per type; document horizon),
    and the final corr uses only IEEE-exact float ops.

    Output: (event_type, n, corr_e6).
    """

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        tsv = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = (tsv // 3_600_000_000) % 24
        x = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        et = batch.column("event_type").to_numpy(zero_copy_only=False).astype(str)
        codes, inv = np.unique(et, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "event_type": pa.array(codes),
                "p_n": pa.array(n),
                "p_sx": pa.array(np.bincount(inv, weights=x).astype(np.int64)),
                "p_sy": pa.array(np.bincount(inv, weights=hour).astype(np.int64)),
                "p_sxy": pa.array(
                    np.bincount(inv, weights=x * hour).astype(np.int64)
                ),
                "p_sxx": pa.array(np.bincount(inv, weights=x * x).astype(np.int64)),
                "p_syy": pa.array(
                    np.bincount(inv, weights=hour * hour).astype(np.int64)
                ),
            }
        )

    merged = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            ray.data.aggregate.Sum("p_n", alias_name="n"),
            ray.data.aggregate.Sum("p_sx", alias_name="sx"),
            ray.data.aggregate.Sum("p_sy", alias_name="sy"),
            ray.data.aggregate.Sum("p_sxy", alias_name="sxy"),
            ray.data.aggregate.Sum("p_sxx", alias_name="sxx"),
            ray.data.aggregate.Sum("p_syy", alias_name="syy"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("n"), pa.int64()).to_numpy(zero_copy_only=False)
        sx = pc.cast(batch.column("sx"), pa.int64()).to_numpy(zero_copy_only=False)
        sy = pc.cast(batch.column("sy"), pa.int64()).to_numpy(zero_copy_only=False)
        sxy = pc.cast(batch.column("sxy"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        sxx = pc.cast(batch.column("sxx"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        syy = pc.cast(batch.column("syy"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        cov = (n * sxy - sx * sy).astype(np.float64)
        vx = (n * sxx - sx * sx).astype(np.float64)
        vy = (n * syy - sy * sy).astype(np.float64)
        denom = np.sqrt(vx) * np.sqrt(vy)
        corr = np.where(denom > 0, cov / np.where(denom > 0, denom, 1.0), 0.0)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "n": pa.array(n),
                "corr_e6": pa.array(
                    np.floor(corr * 1e6 + 0.5).astype(np.int64)
                ),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def source_lang_pmi(sf_dir: str) -> "pa.Table":
    """Pointwise mutual information between document source and language:
    per (source, lang) cell, ``pmi_e6 = floor(ln(c_sl·N / (c_s·c_l))·1e6
    + .5)`` — positive cells mark source/language affinity (the mixture
    curator's association diagnostic).

    Scale shape: ONE bounded groupby (cells ≤ |sources| × |langs|);
    marginals and PMI derive from the cell table on the driver.

    Output: (source, lang, n, pmi_e6).
    """

    def partial(batch: pa.Table) -> pa.Table:
        src = batch.column("source").to_numpy(zero_copy_only=False).astype(str)
        lang = batch.column("lang").to_numpy(zero_copy_only=False).astype(str)
        key = np.char.add(np.char.add(src, "\x1f"), lang)
        codes, cnt = np.unique(key, return_counts=True)
        sp = np.char.partition(codes, "\x1f")
        return pa.table(
            {
                "source": pa.array(sp[:, 0]),
                "lang": pa.array(sp[:, 2]),
                "p_n": pa.array(cnt.astype(np.int64)),
            }
        )

    cells = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "lang"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n"))
        .to_pandas()  # bounded: |sources| x |langs| cells
    )
    src = cells["source"].to_numpy().astype(str)
    lang = cells["lang"].to_numpy().astype(str)
    n = cells["n"].to_numpy().astype(np.int64)
    total = int(n.sum())
    s_keys, s_inv = np.unique(src, return_inverse=True)
    l_keys, l_inv = np.unique(lang, return_inverse=True)
    c_s = np.bincount(s_inv, weights=n).astype(np.int64)
    c_l = np.bincount(l_inv, weights=n).astype(np.int64)
    pmi = np.floor(
        np.log(
            (n * total).astype(np.float64) / (c_s[s_inv] * c_l[l_inv])
        )
        * 1e6
        + 0.5
    ).astype(np.int64)
    order = np.lexsort((lang, src))
    return pa.table(
        {
            "source": pa.array(src[order]),
            "lang": pa.array(lang[order]),
            "n": pa.array(n[order]),
            "pmi_e6": pa.array(pmi[order]),
        }
    )


def lang_length_drift(sf_dir: str) -> "pa.Table":
    """Pairwise Kolmogorov–Smirnov distance between the document-LENGTH
    distributions of every language pair — the distribution-drift
    detector a curator runs when a language's scrape pipeline changes.

    Exactness: the KS statistic over integer supports is itself a
    rational — ``max_v |cumA(v)·nB − cumB(v)·nA| / (nA·nB)`` — so the
    whole computation is integer arithmetic.  One bounded groupby
    ((lang, n_chars) cells — bounded by langs × distinct lengths, i.e.
    max document length, not corpus size); the driver finishes pairwise
    on the cell table.

    Output per pair (lang_a < lang_b): (lang_a, lang_b, n_a, n_b,
    ks_e6).
    """

    def partial(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang").to_numpy(zero_copy_only=False).astype(str)
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False)
        codes, inv = np.unique(lang, return_inverse=True)
        key = inv.astype(np.int64) * (1 << 40) + nc
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "lang": pa.array(
                    codes[(uk >> 40)].astype(object), type=pa.string()
                ),
                "v": pa.array((uk & ((1 << 40) - 1)).astype(np.int64)),
                "p_n": pa.array(cnt.astype(np.int64)),
            }
        )

    cells = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "v"])
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n"))
        .to_pandas()  # bounded: langs x distinct lengths
    )
    langs = sorted(cells["lang"].unique())
    support = np.sort(cells["v"].unique().astype(np.int64))
    cdf, tot = {}, {}
    for lang in langs:
        sub = cells[cells["lang"] == lang].sort_values("v")
        vals = sub["v"].to_numpy().astype(np.int64)
        cnt = sub["n"].to_numpy().astype(np.int64)
        cum = np.cumsum(cnt)
        idx = np.searchsorted(vals, support, side="right")
        cdf[lang] = np.concatenate([[0], cum])[idx]
        tot[lang] = int(cum[-1])
    rows = []
    for i, a in enumerate(langs):
        for b in langs[i + 1 :]:
            num = int(np.abs(cdf[a] * tot[b] - cdf[b] * tot[a]).max())
            rows.append((a, b, tot[a], tot[b], num * 1_000_000 // (tot[a] * tot[b])))
    return pa.table(
        {
            "lang_a": pa.array([r[0] for r in rows], type=pa.string()),
            "lang_b": pa.array([r[1] for r in rows], type=pa.string()),
            "n_a": pa.array([r[2] for r in rows], type=pa.int64()),
            "n_b": pa.array([r[3] for r in rows], type=pa.int64()),
            "ks_e6": pa.array([r[4] for r in rows], type=pa.int64()),
        }
    )


def priority_segment_independence(sf_dir: str) -> "pa.Table":
    """Two-way chi-square independence scan between order priority and
    customer market segment — "does priority mix differ by segment?".
    Exact scaling again: the statistic reported is
    ``Σ_ij (N·x_ij − r_i·c_j)²·1e6 // (N·r_i·c_j)`` summed as integers
    (each cell's term is an integer floor, so engine and oracle agree
    bit-for-bit with zero float arithmetic).

    Shape: ONE custkey-keyed tag-union exchange attaches the segment to
    each order (no broadcast of the customer table), then one bounded
    (priority, segment) cell groupby; the driver folds the ≤ p×s cells.

    Output per cell: (o_orderpriority, c_mktsegment, n, expected_num =
    r_i·c_j, chi_term_e6) plus the fold is derivable by the consumer.
    """
    from .partition import map_key_partitions

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )

    def cust_side(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "k": pc.cast(batch.column("c_custkey"), pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "seg": batch.column("c_mktsegment"),
                "pri": pa.array([""] * n, type=pa.string()),
            }
        )

    def order_side(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "k": pc.cast(batch.column("o_custkey"), pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "seg": pa.array([""] * n, type=pa.string()),
                "pri": batch.column("o_orderpriority"),
            }
        )

    def attach(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "pri": pa.array([], type=pa.string()),
                "seg": pa.array([], type=pa.string()),
                "p_n": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        k = tbl.column("k").to_numpy(zero_copy_only=False)
        cm, om = side == 0, side == 1
        if not om.any():
            return empty
        ck = k[cm]
        co = np.argsort(ck, kind="stable")
        ck = ck[co]
        seg = tbl.column("seg").to_numpy(zero_copy_only=False)[cm][co]
        pos = np.searchsorted(ck, k[om])  # every order has a customer
        pri = tbl.column("pri").to_numpy(zero_copy_only=False)[om].astype(str)
        cell = np.char.add(np.char.add(pri, "\x1f"), seg[pos].astype(str))
        codes, cnt = np.unique(cell, return_counts=True)
        sp = np.char.partition(codes, "\x1f")
        return pa.table(
            {
                "pri": pa.array(sp[:, 0].astype(object), type=pa.string()),
                "seg": pa.array(sp[:, 2].astype(object), type=pa.string()),
                "p_n": pa.array(cnt.astype(np.int64)),
            }
        )

    cells = (
        map_key_partitions(
            cust.map_batches(cust_side, batch_format="pyarrow").union(
                orders.map_batches(order_side, batch_format="pyarrow")
            ),
            ["k"],
            attach,
        )
        .groupby(["pri", "seg"])
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n"))
        .to_pandas()  # bounded: priorities x segments cells
    )
    pri = cells["pri"].to_numpy().astype(str)
    seg = cells["seg"].to_numpy().astype(str)
    n = cells["n"].to_numpy().astype(np.int64)
    total = int(n.sum())
    pk, pinv = np.unique(pri, return_inverse=True)
    sk, sinv = np.unique(seg, return_inverse=True)
    r = np.bincount(pinv, weights=n).astype(np.int64)
    c = np.bincount(sinv, weights=n).astype(np.int64)
    exp_num = r[pinv] * c[sinv]  # N * expected = r_i * c_j
    diff = total * n - exp_num
    chi_term = (diff * diff * 1_000_000) // (total * exp_num)
    order = np.lexsort((seg, pri))
    return pa.table(
        {
            "o_orderpriority": pa.array(pri[order].astype(object), type=pa.string()),
            "c_mktsegment": pa.array(seg[order].astype(object), type=pa.string()),
            "n": pa.array(n[order]),
            "expected_num": pa.array(exp_num[order]),
            "chi_term_e6": pa.array(chi_term[order]),
        }
    )
