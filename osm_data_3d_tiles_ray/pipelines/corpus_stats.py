"""Corpus-level vocabulary/novelty statistics over the documents table —
pretraining-data diagnostics that need corpus-global first-occurrence or
heavy-hitter state, expressed as bounded shuffles over term/gram hashes.

All three operators keep the 100 TB shape rules: per-batch partial
aggregation before every shuffle, shuffle keys are fixed-width hashes (the
term STRING only travels when it is part of the result), per-key work runs
as vectorized segment passes inside hash partitions (pipelines/partition.py),
and nothing materializes a corpus-sized relation on the driver.

No reference analog (the reference repo has no text pipeline); these follow
the standard corpus-curation recipes (Heaps-law vocabulary growth, per-source
heavy hitters, n-gram novelty scoring à la ExactSubstr/decontamination).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .textops import _docs, _hashed_ngrams


def _term_rows(batch: pa.Table) -> tuple:
    """Tokenize one batch: (words, row_of_word) with empties dropped."""
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text, " ")
    flat = toks.flatten()
    offs = np.asarray(toks.offsets)
    row = np.repeat(np.arange(len(batch), dtype=np.int64), np.diff(offs))
    words = flat.to_numpy(zero_copy_only=False)
    keep = words != ""
    return words[keep], row[keep]


def span_mix(sf_dir: str) -> "ray.data.Dataset":
    """Per-document span-sequence profile over the north-rule interleaved
    table (doc_id, spans:list<struct<kind,text,media_ref,offset>>): span
    counts by kind, media-ref count, total text bytes, and whether the
    offset sequence is strictly non-decreasing (the per-row span-sequence
    invariant the engine preserves end-to-end — BASELINE.json input_hint).

    One vectorized pass per batch over the flattened struct children (no
    per-row Python): kind counts via a (row, kind-code) bincount, the
    monotonicity flag via a segment-reset diff.
    Output: (doc_id, n_spans, n_text, n_tag, n_media, text_chars,
    offsets_monotone)."""
    from .geo import documents_ds

    def profile(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        offs = np.asarray(spans.offsets).astype(np.int64)
        n_spans = np.diff(offs)
        st = spans.values
        kind = st.field("kind")
        text_len = pc.utf8_length(st.field("text")).to_numpy(zero_copy_only=False)
        media = st.field("media_ref").to_numpy(zero_copy_only=False)
        off32 = st.field("offset").to_numpy(zero_copy_only=False).astype(np.int64)
        nb = len(batch)
        row = np.repeat(np.arange(nb, dtype=np.int64), n_spans)
        is_text = pc.equal(kind, "text").to_numpy(zero_copy_only=False)
        is_tag = pc.equal(kind, "tag").to_numpy(zero_copy_only=False)
        has_media = media != ""
        n_text = np.bincount(row, weights=is_text, minlength=nb).astype(np.int64)
        n_tag = np.bincount(row, weights=is_tag, minlength=nb).astype(np.int64)
        n_media = np.bincount(row, weights=has_media, minlength=nb).astype(np.int64)
        chars = np.bincount(row, weights=text_len, minlength=nb).astype(np.int64)
        # per-doc monotone offsets: diff >= 0 everywhere except doc starts
        ok = np.ones(len(off32), bool)
        if len(off32):
            ok[1:] = np.diff(off32) >= 0
            ok[offs[:-1][offs[:-1] < len(off32)]] = True
        bad = np.zeros(nb, bool)
        np.logical_or.at(bad, row, ~ok)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_spans": pa.array(n_spans),
                "n_text": pa.array(n_text),
                "n_tag": pa.array(n_tag),
                "n_media": pa.array(n_media),
                "text_chars": pa.array(chars),
                "offsets_monotone": pa.array((~bad).astype(np.int64)),
            }
        )

    return documents_ds(sf_dir).map_batches(profile, batch_format="pyarrow")


def vocab_growth(
    sf_dir: str, n_buckets: int = 10, n: int = 3
) -> "ray.data.Dataset":
    """Heaps-law vocabulary growth: how many NEW distinct word ``n``-grams
    first appear in each doc_id-range bucket of the corpus, plus the
    cumulative vocabulary size (trigrams by default — the synthetic
    corpus's unigram vocabulary saturates in the first bucket).

    Shape: per-batch (gram_hash, min doc_id) partials → ONE vocab-sized
    ``groupby(gram_hash).min`` → per-batch bucket histogram partials → one
    tiny bucket aggregate.  The cumulative sum runs over ``n_buckets``
    rows in the finish.  Output: (bucket, new_terms, cum_vocab)."""
    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    # bucket bounds come from the doc_id range — one cheap aggregate
    lo = docs.min("doc_id")
    hi = docs.max("doc_id")
    span = hi - lo + 1

    def partial_min(batch: pa.Table) -> pa.Table:
        g, row, _ = _hashed_ngrams(batch.column("text"), n)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        hs, ds = g[order], ids[row[order]]
        starts = np.empty(len(hs), bool)
        if len(hs):
            starts[0] = True
            starts[1:] = hs[1:] != hs[:-1]
            mins = np.minimum.reduceat(ds, np.nonzero(starts)[0])
        else:
            mins = np.empty(0, np.int64)
        return pa.table(
            {"term_hash": pa.array(hs[starts] if len(hs) else hs),
             "p_min": pa.array(mins)}
        )

    from .partition import reduce_by_key

    first = reduce_by_key(
        docs.map_batches(partial_min, batch_format="pyarrow"),
        ["term_hash"],
        [("p_min", "min", "first_doc")],
    )

    def bucket_partial(batch: pa.Table) -> pa.Table:
        fd = batch.column("first_doc").to_numpy(zero_copy_only=False)
        b = np.minimum(
            ((fd - lo) * n_buckets) // span, n_buckets - 1
        ).astype(np.int64)
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(ub), "p_new": pa.array(cnt.astype(np.int64))})

    buckets = (
        first.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(ray.data.aggregate.Sum("p_new", alias_name="new_terms"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        n = pc.cast(batch.column("new_terms"), pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(b)
        return pa.table(
            {
                "bucket": pa.array(b[order]),
                "new_terms": pa.array(n[order]),
                "cum_vocab": pa.array(np.cumsum(n[order])),
            }
        )

    # n_buckets rows total — the finish is a driver-scale pass
    return buckets.repartition(1).map_batches(finish, batch_format="pyarrow")


def source_top_terms(sf_dir: str, k: int = 10) -> "ray.data.Dataset":
    """Per-source heavy hitters: the k most frequent terms of every source
    with ROW_NUMBER semantics (count DESC, term ASC tiebreak).

    Shape: per-batch (source, term) partial counts → one vocab×sources
    groupby → per-source top-k as ONE sort + run-boundary rank pass per
    hash partition (never a per-source ``map_groups``).  The term string
    is part of the RESULT, so it legitimately travels through the shuffle.
    Output: (source, term, n, rank)."""
    from .partition import map_key_partitions, run_starts

    docs = _docs(sf_dir).select_columns(["source", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        words, row = _term_rows(batch)
        src = batch.column("source").to_numpy(zero_copy_only=False)[row]
        t = pa.table(
            {"source": pa.array(src, type=pa.string()),
             "term": pa.array(words, type=pa.string())}
        )
        g = t.group_by(["source", "term"]).aggregate([("term", "count")])
        return pa.table(
            {
                "source": g.column("source"),
                "term": g.column("term"),
                "p_n": pc.cast(g.column("term_count"), pa.int64()),
            }
        )

    counts = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "term"])
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n"))
    )

    def topk_part(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table(
                {
                    "source": pa.array([], type=pa.string()),
                    "term": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                }
            )
        src = tbl.column("source").to_numpy(zero_copy_only=False)
        term = tbl.column("term").to_numpy(zero_copy_only=False)
        n = pc.cast(tbl.column("n"), pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((term, -n, src))
        src, term, n = src[order], term[order], n[order]
        starts = run_starts(src)
        run_id = np.cumsum(starts) - 1
        first = np.nonzero(starts)[0]
        rank = np.arange(len(src)) - first[run_id] + 1
        keep = rank <= k
        return pa.table(
            {
                "source": pa.array(src[keep]),
                "term": pa.array(term[keep]),
                "n": pa.array(n[keep]),
                "rank": pa.array(rank[keep]),
            }
        )

    return map_key_partitions(counts, ["source"], topk_part)


def ngram_novelty(sf_dir: str, n: int = 3) -> "ray.data.Dataset":
    """Per-document n-gram novelty: of the document's DISTINCT word
    n-grams, how many first appear (by min doc_id) in this document — the
    corpus-order novelty score behind dedup/curriculum recipes.

    Shape: per-batch distinct (gram_hash, doc_id) rows → one hash-partition
    pass per gram computes the global min doc and emits (doc_id, novel)
    flags → one doc-keyed aggregate; a zero-row base relation keeps docs
    with fewer than ``n`` words in the output.  Gram identity is the
    shared 64-bit rolling hash (textops._hashed_ngrams — same identity the
    decontaminate oracle validates hash-to-string).
    Output: (doc_id, n_grams, n_novel)."""
    from .partition import map_key_partitions, run_starts

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])

    def gram_rows(batch: pa.Table) -> pa.Table:
        g, row, _ = _hashed_ngrams(batch.column("text"), n)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        d = ids[row]
        pair = np.stack([g, d], axis=1)
        uniq = np.unique(pair, axis=0)
        return pa.table(
            {
                "gram": pa.array(uniq[:, 0]),
                "doc_id": pa.array(uniq[:, 1]),
                "is_gram": pa.array(np.ones(len(uniq), bool)),
            }
        )

    def base_rows(batch: pa.Table) -> pa.Table:
        nb = len(batch)
        return pa.table(
            {
                "gram": pa.array(np.zeros(nb, np.int64)),
                "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
                "is_gram": pa.array(np.zeros(nb, bool)),
            }
        )

    grams = docs.map_batches(gram_rows, batch_format="pyarrow")

    def novel_part(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "p_grams": pa.array([], type=pa.int64()),
                    "p_novel": pa.array([], type=pa.int64()),
                }
            )
        g = tbl.column("gram").to_numpy(zero_copy_only=False)
        d = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, g))
        gs, ds = g[order], d[order]
        starts = run_starts(gs)
        run_id = np.cumsum(starts) - 1
        first = np.nonzero(starts)[0]
        novel = ds == ds[first[run_id]]  # min doc per gram = run start (d-sorted)
        ud, inv = np.unique(ds, return_inverse=True)
        n_grams = np.bincount(inv)
        n_novel = np.bincount(inv, weights=novel).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ud),
                "p_grams": pa.array(n_grams.astype(np.int64)),
                "p_novel": pa.array(n_novel),
            }
        )

    per_part = map_key_partitions(grams.drop_columns(["is_gram"]), ["gram"], novel_part)
    base = docs.map_batches(
        lambda b: pa.table(
            {
                "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
                "p_grams": pa.array(np.zeros(len(b), np.int64)),
                "p_novel": pa.array(np.zeros(len(b), np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    from .partition import sum_by_key

    merged = sum_by_key(
        base.union(per_part),
        ["doc_id"],
        {"p_grams": "n_grams", "p_novel": "n_novel"},
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_grams": pc.cast(batch.column("n_grams"), pa.int64()),
                "n_novel": pc.cast(batch.column("n_novel"), pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


# ------------------------------------------------- interleaved span ops ---
#
# Operators over the north-rule interleaved table itself
# (doc_id, spans:list<struct<kind,text,media_ref,offset>>) — the payload
# axis: cross-document media usage, span-kind sequencing, and byte-layout
# integrity.  All three run one vectorized pass per batch over the
# flattened struct children (offsets + repeat index math, no per-row
# Python), emit bounded partials, and finish in a small exchange.


def _flat_spans(batch: pa.Table):
    """(spans struct array, per-doc list offsets, row-of-span) for one
    batch — the shared flatten used by every span operator."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    offs = np.asarray(spans.offsets).astype(np.int64)
    row = np.repeat(np.arange(len(batch), dtype=np.int64), np.diff(offs))
    return spans.values, offs, row


def media_usage(sf_dir: str) -> "ray.data.Dataset":
    """Cross-document media deduplication index: for every distinct
    media_ref, the number of documents referencing it, total span
    occurrences, and the first referencing doc_id — the usage table a
    media-dedup / asset-pipeline stage keys on (decode each asset once,
    not once per document).

    Shape: per-batch (media_ref, doc) distinct partials (so the exchange
    carries at most one row per (ref, doc-in-batch), never one per span),
    then per-ref totals as one segment pass per hash partition.  The ref
    string is the result key, so it legitimately travels.
    Output: (media_ref, n_docs, n_spans, first_doc)."""
    from .geo import documents_ds
    from .partition import map_key_partitions, run_starts

    def partial(batch: pa.Table) -> pa.Table:
        st, _, row = _flat_spans(batch)
        media = st.field("media_ref").to_numpy(zero_copy_only=False)
        keep = media != ""
        refs, rows = media[keep], row[keep]
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)[rows]
        # distinct (ref, doc) with occurrence counts, one lexsort
        order = np.lexsort((ids, refs))
        refs, ids = refs[order], ids[order]
        starts = run_starts(refs, ids)
        cnt = np.diff(np.append(np.nonzero(starts)[0], len(refs)))
        return pa.table(
            {
                "media_ref": pa.array(refs[starts], type=pa.string()),
                "doc_id": pa.array(ids[starts], type=pa.string()),
                "p_n": pa.array(cnt.astype(np.int64)),
            }
        )

    def per_ref(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "media_ref": pa.array([], type=pa.string()),
                "n_docs": pa.array([], type=pa.int64()),
                "n_spans": pa.array([], type=pa.int64()),
                "first_doc": pa.array([], type=pa.string()),
            }
        )
        if len(tbl) == 0:
            return empty
        refs = tbl.column("media_ref").to_numpy(zero_copy_only=False)
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        n = tbl.column("p_n").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, refs))
        refs, ids, n = refs[order], ids[order], n[order]
        rstart = run_starts(refs)
        first = np.nonzero(rstart)[0]
        bounds = np.append(first, len(refs))
        # (ref, doc) rows may repeat across batch partials — count DISTINCT
        # docs per ref via run boundaries over (ref, doc)
        dstart = run_starts(refs, ids)
        n_docs = np.add.reduceat(dstart.astype(np.int64), first)
        return pa.table(
            {
                "media_ref": pa.array(refs[rstart]),
                "n_docs": pa.array(n_docs),
                "n_spans": pa.array(np.add.reduceat(n, first)),
                # ids sorted within each ref run → run head is the min
                "first_doc": pa.array(ids[rstart]),
            }
        )

    parts = documents_ds(sf_dir).map_batches(partial, batch_format="pyarrow")
    return map_key_partitions(parts, ["media_ref"], per_ref)


def span_transitions(sf_dir: str) -> "ray.data.Dataset":
    """Corpus-wide span-kind transition matrix: counts of consecutive
    (kind→kind) pairs inside each document's span sequence, in stored
    span order (the order the per-row invariant preserves).

    Shape: kinds dictionary-encode per batch; pairs form with one shifted
    compare masked at doc boundaries; a K²-cell bincount partial per
    batch feeds one tiny groupby.  Output: (kind_from, kind_to, n)."""
    from .geo import documents_ds

    def partial(batch: pa.Table) -> pa.Table:
        st, _, row = _flat_spans(batch)
        kind = st.field("kind").dictionary_encode()
        codes = np.asarray(kind.indices).astype(np.int64)
        cats = kind.dictionary.to_numpy(zero_copy_only=False)
        K = len(cats)
        if len(codes) < 2 or K == 0:
            return pa.table(
                {
                    "kind_from": pa.array([], type=pa.string()),
                    "kind_to": pa.array([], type=pa.string()),
                    "p_n": pa.array([], type=pa.int64()),
                }
            )
        same_doc = row[1:] == row[:-1]
        cell = codes[:-1][same_doc] * K + codes[1:][same_doc]
        cnt = np.bincount(cell, minlength=K * K)
        nz = np.nonzero(cnt)[0]
        return pa.table(
            {
                "kind_from": pa.array(cats[nz // K], type=pa.string()),
                "kind_to": pa.array(cats[nz % K], type=pa.string()),
                "p_n": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    return (
        documents_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["kind_from", "kind_to"])
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n"))
    )


def span_gap_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-document byte-layout integrity over the span sequence: for each
    consecutive span pair, the gap between the previous span's end
    (offset + text length) and the next span's offset — overlap count,
    total positive gap bytes, and total span text bytes.  The layout
    audit a reconstruction / alignment stage runs before trusting offsets.

    One vectorized pass per batch (shifted arrays masked at doc starts);
    no exchange at all — output is one row per input document.
    Output: (doc_id, n_gaps, n_overlaps, gap_total, span_bytes)."""
    from .geo import documents_ds

    def profile(batch: pa.Table) -> pa.Table:
        st, offs, row = _flat_spans(batch)
        nb = len(batch)
        off = st.field("offset").to_numpy(zero_copy_only=False).astype(np.int64)
        ln = pc.utf8_length(st.field("text")).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(off)
        valid = np.zeros(max(n - 1, 0), bool)
        if n > 1:
            valid = row[1:] == row[:-1]
        gap = off[1:] - (off[:-1] + ln[:-1]) if n > 1 else np.empty(0, np.int64)
        pair_row = row[1:][valid] if n > 1 else np.empty(0, np.int64)
        gap = gap[valid]
        n_gaps = np.bincount(pair_row, minlength=nb).astype(np.int64)
        n_overlaps = np.bincount(
            pair_row, weights=(gap < 0), minlength=nb
        ).astype(np.int64)
        gap_total = np.bincount(
            pair_row, weights=np.maximum(gap, 0), minlength=nb
        ).astype(np.int64)
        span_bytes = np.bincount(row, weights=ln, minlength=nb).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_gaps": pa.array(n_gaps),
                "n_overlaps": pa.array(n_overlaps),
                "gap_total": pa.array(gap_total),
                "span_bytes": pa.array(span_bytes),
            }
        )

    return documents_ds(sf_dir).map_batches(profile, batch_format="pyarrow")


def media_cooccurrence(sf_dir: str) -> "ray.data.Dataset":
    """Asset co-use graph over the interleaved table: for every unordered
    pair of DISTINCT media_refs referenced by the same document, the
    number of documents where they co-occur — the edge list a texture /
    asset-bundling stage clusters on.

    Shape: per batch, each doc's distinct sorted refs expand to pairs with
    the grouped cross-product kernel (repeat/arange minus run offsets —
    wire volume = Σ k·(k−1)/2 over per-doc distinct refs k, bounded by the
    small per-doc media fan-out, never by span count); per-pair counts
    aggregate in one groupby.  Output: (ref_a, ref_b, n_docs), ref_a <
    ref_b."""
    from .geo import documents_ds
    from .partition import run_starts

    def pairs(batch: pa.Table) -> pa.Table:
        st, _, row = _flat_spans(batch)
        media = st.field("media_ref").to_numpy(zero_copy_only=False)
        keep = media != ""
        refs, rows = media[keep], row[keep]
        # distinct (doc, ref), ref-sorted within doc
        order = np.lexsort((refs, rows))
        refs, rows = refs[order], rows[order]
        starts = run_starts(rows, refs)
        refs, rows = refs[starts], rows[starts]
        # per-doc run lengths → cross-product expansion (i<j pairs)
        dstart = run_starts(rows)
        first = np.nonzero(dstart)[0]
        k = np.diff(np.append(first, len(rows)))
        npairs = k * (k - 1) // 2
        tot = int(npairs.sum())
        if tot == 0:
            return pa.table(
                {
                    "ref_a": pa.array([], type=pa.string()),
                    "ref_b": pa.array([], type=pa.string()),
                    "p_n": pa.array([], type=pa.int64()),
                }
            )
        # for each doc run of length k: pairs (i, j) with i<j, both local
        doc_of_pair = np.repeat(np.arange(len(k)), npairs)
        pair_pos = np.arange(tot) - np.repeat(np.cumsum(npairs) - npairs, npairs)
        # decode (i, j) from the triangular index: i = row of the pair in
        # the triangle, j = i + 1 + remainder
        kk = k[doc_of_pair]
        # i is the largest t with t*kk - t(t+1)/2 <= pair_pos
        i = (
            np.floor(
                (2 * kk - 1 - np.sqrt((2 * kk - 1) ** 2 - 8 * pair_pos)) / 2
            )
        ).astype(np.int64)
        off_i = i * kk - i * (i + 1) // 2
        j = (pair_pos - off_i + i + 1).astype(np.int64)
        base = np.repeat(first, npairs)
        a, b = refs[base + i], refs[base + j]
        t = pa.table(
            {"ref_a": pa.array(a, type=pa.string()),
             "ref_b": pa.array(b, type=pa.string())}
        )
        g = t.group_by(["ref_a", "ref_b"]).aggregate([("ref_a", "count")])
        return pa.table(
            {
                "ref_a": g.column("ref_a"),
                "ref_b": g.column("ref_b"),
                "p_n": pc.cast(g.column("ref_a_count"), pa.int64()),
            }
        )

    from .partition import sum_by_key

    return sum_by_key(
        documents_ds(sf_dir).map_batches(pairs, batch_format="pyarrow"),
        ["ref_a", "ref_b"],
        {"p_n": "n_docs"},
    )


def interleaved_pack(
    sf_dir: str, budget: int = 256, media_cost: int = 64, n_ranges: int = 64
) -> "ray.data.Dataset":
    """Pack the interleaved span stream into fixed-budget training
    examples — the span-level generalization of :func:`textops.seq_pack`
    for the north-rule table (BASELINE.json input_hint): walking spans in
    (doc_id, span order), a text/tag span costs its whitespace token
    count and a media span a fixed ``media_cost`` slot (the
    image-token-budget convention of interleaved VLM training); a span
    starts at the global running cost prefix and lands in example
    ``prefix // budget`` at slot ``prefix % budget``.

    Scale shape — the seq_pack two-phase distributed prefix scan, span
    granularity: stage 1 flattens each batch to fixed-width
    (doc_num, span_idx, cost, range_id) rows (text never shuffles; the
    zero-padded doc_id digits give a sort-aligned numeric range key); a
    combiner aggregate yields per-range totals (``n_ranges`` rows →
    driver cumsum = per-range base offsets); ONE range-keyed exchange
    then scans each range locally with a segment-reset cumsum.

    Output: (doc_id, span_idx 1-based, cost, example_id, slot_offset).
    Oracle: SUM(cost) OVER (ORDER BY doc_id, span_idx ROWS UNBOUNDED
    PRECEDING EXCLUDE CURRENT)."""
    from .geo import documents_ds
    from .partition import map_key_partitions, run_starts

    def stage1(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        offs = np.asarray(spans.offsets).astype(np.int64)
        n_spans = np.diff(offs)
        st = spans.values
        is_media = pc.not_equal(st.field("media_ref"), "").to_numpy(
            zero_copy_only=False
        )
        n_tok = pc.count_substring_regex(st.field("text"), r"\S+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        cost = np.where(is_media, np.int64(media_cost), n_tok)
        doc_num = (
            pc.cast(
                pc.utf8_slice_codeunits(batch.column("doc_id"), 4),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
        )
        row = np.repeat(np.arange(len(batch), dtype=np.int64), n_spans)
        starts = np.repeat(offs[:-1], n_spans)
        span_idx = np.arange(len(st), dtype=np.int64) - starts + 1
        return pa.table(
            {
                "doc_num": pa.array(doc_num[row]),
                "span_idx": pa.array(span_idx),
                "cost": pa.array(cost),
            }
        )

    rows = (
        documents_ds(sf_dir)
        .select_columns(["doc_id", "spans"])
        .map_batches(stage1, batch_format="pyarrow")
        .materialize()  # fixed-width rows consumed twice (totals + scan)
    )

    # range key aligned with the global (doc_num, span_idx) order —
    # min and max in ONE pass over the materialized narrow rows
    ext = rows.aggregate(
        ray.data.aggregate.Min("doc_num"), ray.data.aggregate.Max("doc_num")
    )
    lo, hi = int(ext["min(doc_num)"]), int(ext["max(doc_num)"])
    span_per_range = max(1, -(-(hi - lo + 1) // n_ranges))

    def add_range(batch: pa.Table) -> pa.Table:
        dn = batch.column("doc_num").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "range_id", pa.array((dn - int(lo)) // span_per_range)
        )
    ranged = rows.map_batches(add_range, batch_format="pyarrow")

    totals = ranged.groupby("range_id").sum("cost").take_all()
    rid = np.array([r["range_id"] for r in totals], dtype=np.int64)
    tot = np.array([r["sum(cost)"] for r in totals], dtype=np.int64)
    order = np.argsort(rid)
    rid, tot = rid[order], tot[order]
    bases = np.concatenate([[0], np.cumsum(tot)[:-1]])
    base_of = dict(zip(rid.tolist(), bases.tolist()))

    def scan(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.string()),
                "span_idx": pa.array([], type=pa.int64()),
                "cost": pa.array([], type=pa.int64()),
                "example_id": pa.array([], type=pa.int64()),
                "slot_offset": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        rg = tbl.column("range_id").to_numpy(zero_copy_only=False)
        dn = tbl.column("doc_num").to_numpy(zero_copy_only=False)
        si = tbl.column("span_idx").to_numpy(zero_copy_only=False)
        ct = tbl.column("cost").to_numpy(zero_copy_only=False)
        order = np.lexsort((si, dn, rg))
        rg, dn, si, ct = rg[order], dn[order], si[order], ct[order]
        # exclusive cumsum with a reset + broadcast base at each range run
        csum = np.cumsum(ct) - ct
        idx = np.flatnonzero(run_starts(rg))
        base = np.array([base_of[int(r)] for r in rg[idx]], dtype=np.int64)
        run_len = np.diff(np.append(idx, len(rg)))
        prefix = csum - np.repeat(csum[idx], run_len) + np.repeat(base, run_len)
        doc_id = np.char.add(
            "doc_", np.char.zfill(dn.astype(np.int64).astype(str), 12)
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_id.astype(object), type=pa.string()),
                "span_idx": pa.array(si),
                "cost": pa.array(ct),
                "example_id": pa.array(prefix // budget),
                "slot_offset": pa.array(prefix % budget),
            }
        )

    return map_key_partitions(ranged, ["range_id"], scan, n_ranges)


def span_dedup(sf_dir: str, num_partitions: int = 64) -> "ray.data.Dataset":
    """Span-level exact deduplication audit over the interleaved table:
    a textual span (``media_ref == ''``) is a DUPLICATE when its exact
    text occurs in at least two distinct documents; every document
    reports how much of it is boilerplate shared with the rest of the
    corpus — the span-granularity analog of document exact-dedup, the
    signal for stripping repeated headers/footers from interleaved docs.

    Scale shape: stage 1 flattens each batch to fixed-width
    (h1, h2, doc_num, n, chars) rows COLLAPSED per (text, doc) — the span
    TEXT never shuffles, only its 128-bit hash, and within-doc repeats of
    one text ride as a count; each doc's span total rides the same
    exchange as ONE side-0 row (keyed by its own doc hash — base rows
    need no co-location, they only need to reach the final rollup), so
    the source streams exactly once.  The text-hash exchange co-locates
    each distinct text's rows, a segment pass counts distinct docs per
    run (rows sort (h, doc), so distinct docs = run-boundary count) and
    emits per-doc partials ONLY for runs touching >= 2 docs — the final
    doc-keyed groupby therefore aggregates one base row per doc plus the
    (sparse) duplicate partials, not one row per span: the second
    all-to-all shrinks from O(spans) to O(docs + dup partials).

    Output: (doc_id, n_text_spans, n_dup_spans, dup_chars)."""
    import polars as pl

    from .geo import documents_ds
    from .partition import map_key_partitions, run_starts

    def stage1(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        offs = np.asarray(spans.offsets).astype(np.int64)
        n_spans = np.diff(offs)
        st = spans.values
        textual = pc.equal(st.field("media_ref"), "")
        keep = textual.to_numpy(zero_copy_only=False)
        txt = st.field("text").filter(textual)
        chars = pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        s = pl.from_arrow(txt)
        h1 = s.hash(seed=0x51AB).to_numpy().view(np.int64)
        h2 = s.hash(seed=0xDEC0DE).to_numpy().view(np.int64)
        doc_num = (
            pc.cast(
                pc.utf8_slice_codeunits(batch.column("doc_id"), 4),
                pa.int64(),
            )
            .to_numpy(zero_copy_only=False)
        )
        row = np.repeat(np.arange(len(batch), dtype=np.int64), n_spans)[keep]
        dn = doc_num[row]
        # collapse per (text, doc): within-doc repeats become a count
        order = np.lexsort((dn, h2, h1))
        h1, h2, dn, ch = h1[order], h2[order], dn[order], chars[order]
        starts = run_starts(h1, h2, dn)
        idx = np.flatnonzero(starts)
        n = np.diff(np.append(idx, len(h1)))
        ch_sum = np.add.reduceat(ch, idx) if len(idx) else ch[:0]
        # one side-0 base row per doc carries its textual-span total;
        # its hash slot is the doc hash (any value — base rows are
        # reduced per doc, never per text run)
        n_text = np.bincount(row, minlength=len(batch)).astype(np.int64)
        has_text = n_text > 0  # the rollup keys on textual spans only
        n_text = n_text[has_text]
        all_docs = doc_num[has_text]
        return pa.table(
            {
                "h1": pa.array(np.concatenate([h1[idx], all_docs])),
                "h2": pa.array(
                    np.concatenate([h2[idx], np.zeros(len(all_docs), np.int64)])
                ),
                "doc_num": pa.array(np.concatenate([dn[idx], all_docs])),
                "n": pa.array(np.concatenate([n, n_text])),
                "chars": pa.array(np.concatenate([ch_sum, np.zeros(len(all_docs), np.int64)])),
                "side": pa.array(
                    np.concatenate(
                        [
                            np.ones(len(idx), dtype=np.int8),
                            np.zeros(len(all_docs), dtype=np.int8),
                        ]
                    )
                ),
            }
        )

    def flag_dups(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_num": pa.array([], type=pa.int64()),
                "p_spans": pa.array([], type=pa.int64()),
                "p_dup": pa.array([], type=pa.int64()),
                "p_chars": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        dn_all = tbl.column("doc_num").to_numpy(zero_copy_only=False)
        n_all = tbl.column("n").to_numpy(zero_copy_only=False)
        is_text = side == 1
        base = pa.table(
            {
                "doc_num": pa.array(dn_all[~is_text]),
                "p_spans": pa.array(n_all[~is_text]),
                "p_dup": pa.array(np.zeros(int((~is_text).sum()), np.int64)),
                "p_chars": pa.array(np.zeros(int((~is_text).sum()), np.int64)),
            }
        )
        if not is_text.any():
            return base
        h1 = tbl.column("h1").to_numpy(zero_copy_only=False)[is_text]
        h2 = tbl.column("h2").to_numpy(zero_copy_only=False)[is_text]
        dn = dn_all[is_text]
        n = n_all[is_text]
        ch = tbl.column("chars").to_numpy(zero_copy_only=False)[is_text]
        order = np.lexsort((dn, h2, h1))
        h1, h2, dn, n, ch = h1[order], h2[order], dn[order], n[order], ch[order]
        # rows are already distinct (text, doc) pairs, so a text run's
        # length IS its distinct-doc count
        text_start = run_starts(h1, h2)
        idx = np.flatnonzero(text_start)
        run_len = np.diff(np.append(idx, len(h1)))
        is_dup = np.repeat(run_len >= 2, run_len)
        if not is_dup.any():
            return base
        dnd, nd, chd = dn[is_dup], n[is_dup], ch[is_dup]
        ud, inv = np.unique(dnd, return_inverse=True)
        p_dup = np.bincount(inv, weights=nd, minlength=len(ud)).astype(
            np.int64
        )
        p_chars = np.bincount(
            inv, weights=chd, minlength=len(ud)
        ).astype(np.int64)
        dup = pa.table(
            {
                "doc_num": pa.array(ud),
                "p_spans": pa.array(np.zeros(len(ud), np.int64)),
                "p_dup": pa.array(p_dup),
                "p_chars": pa.array(p_chars),
            }
        )
        return pa.concat_tables([base, dup])

    rows = (
        documents_ds(sf_dir)
        .select_columns(["doc_id", "spans"])
        .map_batches(stage1, batch_format="pyarrow")
    )
    from .partition import sum_by_key

    partials = map_key_partitions(rows, ["h1", "h2"], flag_dups, num_partitions)
    # second exchange: sum_by_key, not groupby().aggregate() — Ray's hash
    # aggregate measured ~5× the exchange cost at this key cardinality
    merged = sum_by_key(
        partials,
        ["doc_num"],
        {
            "p_spans": "n_text_spans",
            "p_dup": "n_dup_spans",
            "p_chars": "dup_chars",
        },
    )

    def finish(batch: pa.Table) -> pa.Table:
        dn = batch.column("doc_num").to_numpy(zero_copy_only=False)
        doc_id = np.char.add(
            "doc_", np.char.zfill(dn.astype(np.int64).astype(str), 12)
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_id.astype(object), type=pa.string()),
                "n_text_spans": pc.cast(
                    batch.column("n_text_spans"), pa.int64()
                ),
                "n_dup_spans": pc.cast(batch.column("n_dup_spans"), pa.int64()),
                "dup_chars": pc.cast(batch.column("dup_chars"), pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def media_context(sf_dir: str) -> "ray.data.Dataset":
    """Caption-candidate context for every media span in the interleaved
    table: the token count of, and span-index distance to, the nearest
    TEXTUAL span before and after each media span within its document —
    the signal an interleaved-VLM curation pass uses to decide whether an
    image has a usable caption nearby (and which side it is on).

    Scale shape: pure per-batch vectorized pass, ZERO exchange — the
    nearest-text lookup is a forward/backward extremum-accumulate over
    the flattened span stream with per-doc validity masks (an index that
    crosses a doc boundary is rejected by comparing against the doc's
    start/end offsets, so no segment reset is ever materialized).

    Output: (doc_id, span_idx 1-based, media_ref, prev_gap, prev_tokens,
    next_gap, next_tokens); -1 where no textual span exists on that side."""
    from .geo import documents_ds

    def ctx(batch: pa.Table) -> pa.Table:
        st, offs, row = _flat_spans(batch)
        n = len(st)
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.string()),
                "span_idx": pa.array([], type=pa.int64()),
                "media_ref": pa.array([], type=pa.string()),
                "prev_gap": pa.array([], type=pa.int64()),
                "prev_tokens": pa.array([], type=pa.int64()),
                "next_gap": pa.array([], type=pa.int64()),
                "next_tokens": pa.array([], type=pa.int64()),
            }
        )
        if n == 0:
            return empty
        media = st.field("media_ref").to_numpy(zero_copy_only=False)
        is_media = media != ""
        ntok = (
            pc.count_substring_regex(st.field("text"), r"\S+")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        g = np.arange(n, dtype=np.int64)
        start = np.repeat(offs[:-1], np.diff(offs))
        end = np.repeat(offs[1:], np.diff(offs))  # exclusive
        # nearest text index before/after, computed WITHOUT doc resets;
        # validity = the filled index still inside this doc's [start, end)
        pf = np.maximum.accumulate(np.where(~is_media, g, -1))
        nf = -np.maximum.accumulate(np.where(~is_media, -g, -(n + 1))[::-1])[::-1]
        p_ok = pf >= start
        n_ok = nf < end
        prev_gap = np.where(p_ok, g - pf, -1)
        prev_tok = np.where(p_ok, ntok[np.maximum(pf, 0)], -1)
        next_gap = np.where(n_ok, nf - g, -1)
        next_tok = np.where(n_ok, ntok[np.minimum(nf, n - 1)], -1)
        m = is_media
        if not m.any():
            return empty
        doc_id = batch.column("doc_id")
        if isinstance(doc_id, pa.ChunkedArray):
            doc_id = doc_id.combine_chunks()
        return pa.table(
            {
                "doc_id": doc_id.take(pa.array(row[m])),
                "span_idx": pa.array(g[m] - start[m] + 1),
                "media_ref": pa.array(media[m].astype(object), type=pa.string()),
                "prev_gap": pa.array(prev_gap[m]),
                "prev_tokens": pa.array(prev_tok[m]),
                "next_gap": pa.array(next_gap[m]),
                "next_tokens": pa.array(next_tok[m]),
            }
        )

    return (
        documents_ds(sf_dir)
        .select_columns(["doc_id", "spans"])
        .map_batches(ctx, batch_format="pyarrow")
    )


def interleaved_pack_checkpointed(
    sf_dir: str, budget: int = 256, media_cost: int = 64, n_ranges: int = 64
) -> "ray.data.Dataset":
    """:func:`interleaved_pack` through the corpus-keyed checkpoint
    (``state/checkpoint.py``): the pack is the shared input of the
    ``interleaved_pack`` AND ``pack_stats`` queries (the
    curation_matrix/funnel shape — VERDICT r4 item 3); the two-phase
    prefix scan runs once per corpus state and parameter set."""
    from ..state.checkpoint import corpus_key, parquet_checkpoint
    from ..synth.generator import ensure_synth, sf_from_dir

    root = ensure_synth(sf_from_dir(sf_dir))
    return parquet_checkpoint(
        f"interleaved_pack_b{budget}_m{media_cost}_r{n_ranges}",
        corpus_key([str(root / "documents")]),
        lambda: interleaved_pack(
            sf_dir, budget=budget, media_cost=media_cost, n_ranges=n_ranges
        ),
    )


def pack_stats(
    sf_dir: str, budget: int = 256, media_cost: int = 64, n_ranges: int = 64
) -> "ray.data.Dataset":
    """Packing-efficiency audit of :func:`interleaved_pack`: per training
    example, how many spans START in it, how many distinct documents they
    come from, their total cost, and the overflow cost that spills past
    the example boundary (slot_offset + cost - budget when positive) —
    the fill/fragmentation report a fixed-budget packer is tuned against.

    Scale shape: per-batch combiner reduces the pack rows to distinct
    (example_id, doc_num) partials (a doc's spans are contiguous in pack
    order, so the reduction is large), then ONE example-keyed exchange +
    segment pass; the exchange carries only fixed-width int rows.

    Output: (example_id, n_spans, n_docs, cost_sum, spill)."""
    from .partition import map_key_partitions, run_starts

    pack = interleaved_pack_checkpointed(
        sf_dir, budget=budget, media_cost=media_cost, n_ranges=n_ranges
    )

    def partial(batch: pa.Table) -> pa.Table:
        ex = batch.column("example_id").to_numpy(zero_copy_only=False)
        dn = (
            pc.cast(
                pc.utf8_slice_codeunits(batch.column("doc_id"), 4), pa.int64()
            )
            .to_numpy(zero_copy_only=False)
        )
        ct = batch.column("cost").to_numpy(zero_copy_only=False)
        so = batch.column("slot_offset").to_numpy(zero_copy_only=False)
        spill = np.maximum(so + ct - budget, 0)
        order = np.lexsort((dn, ex))
        ex, dn, ct, spill = ex[order], dn[order], ct[order], spill[order]
        idx = np.flatnonzero(run_starts(ex, dn))
        return pa.table(
            {
                "example_id": pa.array(ex[idx]),
                "doc_num": pa.array(dn[idx]),
                "p_spans": pa.array(
                    np.diff(np.append(idx, len(ex))).astype(np.int64)
                ),
                "p_cost": pa.array(np.add.reduceat(ct, idx)),
                "p_spill": pa.array(np.add.reduceat(spill, idx)),
            }
        )

    def per_example(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "example_id": pa.array([], type=pa.int64()),
                "n_spans": pa.array([], type=pa.int64()),
                "n_docs": pa.array([], type=pa.int64()),
                "cost_sum": pa.array([], type=pa.int64()),
                "spill": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        ex = tbl.column("example_id").to_numpy(zero_copy_only=False)
        dn = tbl.column("doc_num").to_numpy(zero_copy_only=False)
        ps = tbl.column("p_spans").to_numpy(zero_copy_only=False)
        pc_ = tbl.column("p_cost").to_numpy(zero_copy_only=False)
        pp = tbl.column("p_spill").to_numpy(zero_copy_only=False)
        order = np.lexsort((dn, ex))
        ex, dn, ps, pc_, pp = ex[order], dn[order], ps[order], pc_[order], pp[order]
        es = run_starts(ex)
        ds_ = run_starts(ex, dn)
        idx = np.flatnonzero(es)
        return pa.table(
            {
                "example_id": pa.array(ex[idx]),
                "n_spans": pa.array(np.add.reduceat(ps, idx)),
                "n_docs": pa.array(
                    np.add.reduceat(ds_.astype(np.int64), idx)
                ),
                "cost_sum": pa.array(np.add.reduceat(pc_, idx)),
                "spill": pa.array(np.add.reduceat(pp, idx)),
            }
        )

    partials = pack.map_batches(partial, batch_format="pyarrow")
    return map_key_partitions(partials, ["example_id"], per_example)


# taxonomy: (topic, word-boundary keywords), priority order = list order;
# a doc's topic is the one with the MOST keyword hits, first-listed wins ties,
# 'other' when no keyword occurs at all — the rule-based domain classifier a
# mixture-weighting pass (DoReMi-style static recipe) consumes.
_DOMAIN_TAXONOMY: list[tuple[str, list[str]]] = [
    ("storage", ["scan", "row", "column", "table"]),
    ("compute", ["join", "agg", "sort", "merge", "hash"]),
    ("streaming", ["stream", "window", "batch"]),
    ("query", ["query", "filter", "group", "order"]),
]


def domain_mix(sf_dir: str) -> "ray.data.Dataset":
    """Rule-based domain classification + mixing-weight inputs: each
    document is assigned the taxonomy topic with the most word-boundary
    keyword hits (ties → taxonomy order, zero hits → ``other``), then the
    corpus reports per (source, topic) document and token counts — the
    table a data-mixing recipe turns into sampling weights.

    Scale shape: ZERO data exchange — per batch, one compiled-regex count
    per keyword (bounded by taxonomy size) via ``pc.count_substring_regex``,
    an (n_docs × n_topics) argmax, and a (source, topic) partial count;
    the only shuffle is the tiny partial groupby (|sources| × |topics|
    rows per block).

    Output: (source, topic, n_docs, n_tokens)."""
    from .textops import _docs

    topics = [t for t, _ in _DOMAIN_TAXONOMY]

    def classify(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = len(batch)
        hits = np.zeros((n, len(_DOMAIN_TAXONOMY)), dtype=np.int64)
        for j, (_, kws) in enumerate(_DOMAIN_TAXONOMY):
            for kw in kws:
                c = pc.count_substring_regex(text, rf"\b{kw}\b")
                hits[:, j] += c.to_numpy(zero_copy_only=False).astype(np.int64)
        # argmax with first-listed tie-break; 'other' when all zero
        best = np.argmax(hits, axis=1)
        none = hits.max(axis=1) == 0
        topic = np.array(topics, dtype=object)[best]
        topic[none] = "other"
        tokens = (
            pc.count_substring_regex(text, r"\S+")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        t = pa.table(
            {
                "source": batch.column("source"),
                "topic": pa.array(topic, type=pa.string()),
                "tokens": pa.array(tokens),
            }
        )
        g = t.group_by(["source", "topic"]).aggregate(
            [("tokens", "sum"), ("tokens", "count")]
        )
        return pa.table(
            {
                "source": g.column("source"),
                "topic": g.column("topic"),
                "p_tok": g.column("tokens_sum"),
                "p_doc": pc.cast(g.column("tokens_count"), pa.int64()),
            }
        )

    partials = (
        _docs(sf_dir)
        .select_columns(["text", "source"])
        .map_batches(classify, batch_format="pyarrow")
    )
    merged = partials.groupby(["source", "topic"]).aggregate(
        ray.data.aggregate.Sum("p_doc", alias_name="n_docs"),
        ray.data.aggregate.Sum("p_tok", alias_name="n_tokens"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": batch.column("source"),
                "topic": batch.column("topic"),
                "n_docs": pc.cast(batch.column("n_docs"), pa.int64()),
                "n_tokens": pc.cast(batch.column("n_tokens"), pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")
