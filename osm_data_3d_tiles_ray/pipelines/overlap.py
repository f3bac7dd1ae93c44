"""Joinable-search overlap/coverage between sources (shape from
"Joinable Search Over Multi-Source Spatial Datasets: Overlap, Coverage,
and Efficiency", ICDE 2025 — see PAPERS.md): for every pair of document
sources, the vocabulary overlap, containment and Jaccard — the
"which datasets join well with mine" ranking signal, computed without
ever materializing a vocabulary on the driver.

Shape: one explode pass to DISTINCT (term_hash, source) rows (per-batch
pre-combine, then one groupby dedupe); per-term source sets co-locate
via a hash exchange keyed by the term (set size is bounded by the
source count, so the per-term pair expansion is the basket-pairs
grouped cross-product); pair co-occurrence counts finish in a bounded
groupby (≤ |sources|² rows).  Per-source vocabulary sizes are a bounded
aggregate broadcast into the finish.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def source_vocab_overlap(sf_dir: str) -> "pa.Table":
    """Pairwise source vocabulary overlap.

    Output per unordered source pair (source_a < source_b):
    (source_a, source_b, n_common, n_a, n_b, containment_a_e6,
    jaccard_e6) — all integer-exact.
    """
    import polars as pl

    from .partition import map_key_partitions

    def distinct_rows(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ")
        flat = toks.flatten()
        src = batch.column("source").to_numpy(zero_copy_only=False).astype(str)
        offs = np.asarray(toks.offsets)
        row = np.repeat(np.arange(len(batch)), np.diff(offs))
        words = flat.to_numpy(zero_copy_only=False)
        keep = words != ""
        words, row = words[keep], row[keep]
        empty = pa.table(
            {
                "h": pa.array([], type=pa.int64()),
                "source": pa.array([], type=pa.string()),
            }
        )
        if len(words) == 0:
            return empty
        vocab, code = np.unique(words, return_inverse=True)
        vh = (
            pl.Series(vocab.astype(object)).hash(seed=0x7F1D).to_numpy()
            .view(np.int64)
        )
        scode, sinv = np.unique(src[row], return_inverse=True)
        pair = np.unique(code.astype(np.int64) * len(scode) + sinv)
        return pa.table(
            {
                "h": pa.array(vh[pair // len(scode)]),
                "source": pa.array(
                    scode[pair % len(scode)].astype(object), type=pa.string()
                ),
            }
        )

    distinct = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "text"]
        )
        .map_batches(distinct_rows, batch_format="pyarrow")
        .groupby(["h", "source"])
        .count()  # global dedupe of (term, source)
        .select_columns(["h", "source"])
        .materialize()  # consumed twice: sizes + pair expansion
    )

    sizes = {
        r["source"]: int(r["count()"])
        for r in distinct.groupby("source").count().take_all()
    }  # bounded: one row per source

    def pair_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source_a": pa.array([], type=pa.string()),
                "source_b": pa.array([], type=pa.string()),
                "p_n": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        h = tbl.column("h").to_numpy(zero_copy_only=False)
        src = tbl.column("source").to_numpy(zero_copy_only=False).astype(str)
        scode, sinv = np.unique(src, return_inverse=True)
        order = np.lexsort((sinv, h))
        h, sinv = h[order], sinv[order]
        brk = np.ones(len(h), dtype=bool)
        brk[1:] = h[1:] != h[:-1]
        run_start = np.flatnonzero(brk)
        local_pos = np.arange(len(h)) - np.repeat(
            run_start, np.diff(np.append(run_start, len(h)))
        )
        total = int(local_pos.sum())
        if total == 0:
            return empty
        second = np.repeat(np.arange(len(h)), local_pos)
        offset = np.arange(total) - np.repeat(
            np.cumsum(local_pos) - local_pos, local_pos
        )
        first_idx = np.repeat(np.arange(len(h)) - local_pos, local_pos) + offset
        a, b = sinv[first_idx], sinv[second]  # a < b (sources sorted in run)
        packed = a.astype(np.int64) * len(scode) + b
        u, cnt = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "source_a": pa.array(
                    scode[u // len(scode)].astype(object), type=pa.string()
                ),
                "source_b": pa.array(
                    scode[u % len(scode)].astype(object), type=pa.string()
                ),
                "p_n": pa.array(cnt.astype(np.int64)),
            }
        )

    pairs = (
        map_key_partitions(distinct, ["h"], pair_part)
        .groupby(["source_a", "source_b"])
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n_common"))
        .to_pandas()  # bounded: <= |sources|^2 pairs
        .sort_values(["source_a", "source_b"])
    )
    sa = pairs["source_a"].to_numpy().astype(str)
    sb = pairs["source_b"].to_numpy().astype(str)
    c = pairs["n_common"].to_numpy().astype(np.int64)
    na = np.array([sizes[s] for s in sa], dtype=np.int64)
    nb = np.array([sizes[s] for s in sb], dtype=np.int64)
    return pa.table(
        {
            "source_a": pa.array(sa.astype(object), type=pa.string()),
            "source_b": pa.array(sb.astype(object), type=pa.string()),
            "n_common": pa.array(c),
            "n_a": pa.array(na),
            "n_b": pa.array(nb),
            "containment_a_e6": pa.array(c * 1_000_000 // na),
            "jaccard_e6": pa.array(c * 1_000_000 // (na + nb - c)),
        }
    )
