"""Training-data text operators over the driver's ``documents`` table
(``doc_id:int64, text, lang, source, n_chars``) — the large-scale-pipeline
companions the engine ships beyond the reference's own operator set:
exact dedup, text quality stats, token counting, language scoring,
MinHash-LSH near-dup.

Scale notes:
* exact dedup pre-hashes the text inside ``map_batches`` so the shuffle key
  is a fixed-width int64, not the document body (at 100 TB you never
  shuffle full texts);
* MinHash signatures are computed vectorized per batch; the LSH band
  groupby shuffles only (band_key, doc_id) pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _docs(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# exact dedup


def _hash_text_128(batch: pa.Table) -> pa.Table:
    """(doc_id, h1, h2): two independently-seeded vectorized 64-bit text
    hashes = a 128-bit digest, wide enough that collisions are negligible
    even at 10^12 documents (birthday bound ~2^64 pairs)."""
    import polars as pl

    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    s = pl.Series("t", text)
    h1 = s.hash(seed=0x9E3779B9).to_numpy().view(np.int64)
    h2 = s.hash(seed=0x85EBCA6B).to_numpy().view(np.int64)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "h1": pa.array(h1),
            "h2": pa.array(h2),
        }
    )


def dedup_exact_hashed(sf_dir: str) -> "ray.data.Dataset":
    """Exact dedup with a fixed-width shuffle key: hash text → 128-bit
    digest inside ``map_batches``, groupby the digest, keep min doc_id.

    At 100 TB you never shuffle document bodies — the exchange carries 24
    bytes per doc (digest + id) regardless of text length.  128 bits makes
    digest collisions vanishingly unlikely, so the output is identical to
    a ``GROUP BY text`` (the DuckDB oracle for ``dedup_exact``).

    Output: (doc_id, n_dups) — one row per distinct text.
    """
    ds = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        _hash_text_128, batch_format="pyarrow"
    )
    g = ds.groupby(["h1", "h2"]).aggregate(
        ray.data.aggregate.Min("doc_id", alias_name="doc_id_kept"),
        ray.data.aggregate.Count(alias_name="n_dups"),
    )

    def strip(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id_kept"),
                "n_dups": pc.cast(batch.column("n_dups"), pa.int64()),
            }
        )

    return g.map_batches(strip, batch_format="pyarrow")


def dedup_exact(sf_dir: str) -> "ray.data.Dataset":
    """Keep the smallest doc_id per identical text.

    Engine path = :func:`dedup_exact_hashed` (hash-key shuffle); the DuckDB
    oracle groups by the raw text — the outputs agree because the 128-bit
    digest is collision-free at any realistic corpus size.

    Output: (doc_id, n_dups) — one row per distinct text.
    """
    return dedup_exact_hashed(sf_dir)


# ---------------------------------------------------------------------------
# text stats / quality scoring / token counting


def text_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-doc token count, char counts, alpha/digit/space counts, mean token
    length — all pyarrow compute kernels (zero Python in the loop)."""

    def stats(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_chars = pc.utf8_length(text)
        n_tokens = pc.count_substring_regex(text, r"\S+")
        n_alpha = pc.count_substring_regex(text, "[A-Za-z]")
        n_digit = pc.count_substring_regex(text, "[0-9]")
        n_space = pc.count_substring_regex(text, r"\s")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pc.cast(n_chars, pa.int64()),
                "n_tokens": pc.cast(n_tokens, pa.int64()),
                "n_alpha": pc.cast(n_alpha, pa.int64()),
                "n_digit": pc.cast(n_digit, pa.int64()),
                "n_space": pc.cast(n_space, pa.int64()),
            }
        )

    return _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


def lang_quality(sf_dir: str) -> "ray.data.Dataset":
    """Quality score per doc: alpha ratio + mean word length band + stopword
    share of a tiny English marker list — heuristic quality scoring."""
    MARKERS = ["the", "and", "of", "to", "in", "is", "for"]

    def score(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lower = pc.utf8_lower(text)
        n_chars = pc.cast(pc.utf8_length(text), pa.float64())
        n_alpha = pc.cast(pc.count_substring_regex(text, "[A-Za-z]"), pa.float64())
        alpha_ratio = pc.if_else(
            pc.equal(n_chars, 0.0), pa.scalar(0.0), pc.divide(n_alpha, n_chars)
        )
        n_stop = None
        for m in MARKERS:
            c = pc.count_substring_regex(lower, rf"\b{m}\b")
            n_stop = c if n_stop is None else pc.add(n_stop, c)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                # exact IEEE division — bit-identical to the SQL oracle, no rounding
                "alpha_ratio": alpha_ratio,
                "n_stopwords": pc.cast(n_stop, pa.int64()),
            }
        )

    return _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow"
    )


_LANG_MARKERS = {
    "en": r"\b(the|and|of|is|for|with)\b",
    "fr": r"\b(le|la|les|et|des|une)\b",
    "de": r"\b(der|die|das|und|ist|mit)\b",
    "es": r"\b(el|los|las|es|una|para)\b",
}


def lang_id(sf_dir: str) -> "ray.data.Dataset":
    """N-gram/stopword-heuristic language ID: argmax of marker-word counts,
    ties broken in en>fr>de>es order; 'und' (undetermined) when all zero."""

    def detect(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lower = pc.utf8_lower(text)
        counts = {
            lang: pc.count_substring_regex(lower, rx).to_numpy(zero_copy_only=False)
            for lang, rx in _LANG_MARKERS.items()
        }
        langs = list(_LANG_MARKERS)
        stacked = np.stack([counts[la] for la in langs])
        best = np.argmax(stacked, axis=0)  # first max wins = en>fr>de>es order
        pred = np.array(langs, dtype=object)[best]
        pred[stacked.max(axis=0) == 0] = "und"
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(pred, type=pa.string()),
            }
        )

    return _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        detect, batch_format="pyarrow"
    )


def doc_fingerprint(sf_dir: str) -> "ray.data.Dataset":
    """Winnowing-style rolling-hash fingerprint per document: min/max of
    k-gram rolling hashes → a compact content signature (doc_id,
    fp_min, fp_max, fp_xor)."""
    K = 8
    B = np.uint64(257)

    def fp(batch: pa.Table) -> pa.Table:
        """Whole-batch: hash every K-byte window of the CONCATENATED text
        buffer once (one sliding-window multiply-sum), then reduce each
        document's valid window range with paired-boundary ``reduceat``
        (windows that straddle a document boundary are simply outside the
        per-doc [start, end−K] range — no per-row Python)."""
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lb = text.cast(pa.large_binary())
        offs = np.frombuffer(lb.buffers()[1], np.int64)[
            lb.offset : lb.offset + len(lb) + 1
        ]
        buf = np.frombuffer(lb.buffers()[2], np.uint8)[offs[0] : offs[-1]]
        offs = offs - offs[0]
        n = len(batch)
        mn = np.zeros(n, dtype=np.int64)
        mx = np.zeros(n, dtype=np.int64)
        xr = np.zeros(n, dtype=np.int64)
        L = len(buf)
        if L >= K:
            powers = (B ** np.arange(K, dtype=np.uint64))[::-1]
            w = np.lib.stride_tricks.sliding_window_view(
                buf.astype(np.uint64), K
            )
            h = (w * powers).sum(axis=1)  # uint64 wrap == per-doc math
            starts = offs[:-1]
            ends = np.maximum(offs[1:] - (K - 1), starts)  # len<K → empty
            has = ends > starts
            if has.any():
                # paired reduceat: segment d = [starts[d], ends[d]) with the
                # in-between (cross-boundary) windows skipped; results land
                # at even slots.  A zero sentinel appended to h makes the
                # final end index (== len(h)) valid; only discarded odd
                # slots ever touch it.
                h_ext = np.append(h, np.uint64(0))
                bounds = np.column_stack([starts[has], ends[has]]).ravel()
                mn[has] = np.minimum.reduceat(h_ext, bounds)[::2].astype(np.int64)
                mx[has] = np.maximum.reduceat(h_ext, bounds)[::2].astype(np.int64)
                xr[has] = np.bitwise_xor.reduceat(h_ext, bounds)[::2].astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fp_min": pa.array(mn),
                "fp_max": pa.array(mx),
                "fp_xor": pa.array(xr),
            }
        )
    return _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-duplicate detection


_MINHASH_PERMS = 64
_LSH_BANDS = 16  # 4 rows per band
_SHINGLE = 4


def _minhash_batch(batch: pa.Table) -> pa.Table:
    """Vectorized char-shingle MinHash signatures; emits (band_key, doc_id)."""
    texts = batch.column("text").to_numpy(zero_copy_only=False)
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    rows_per_band = _MINHASH_PERMS // _LSH_BANDS
    # per-perm multipliers (odd constants, deterministic)
    a = (
        np.arange(1, _MINHASH_PERMS + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    ) | np.uint64(1)
    out_band: list[np.ndarray] = []
    out_key: list[np.ndarray] = []
    out_doc: list[np.ndarray] = []
    for t, d in zip(texts, doc_ids):
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        if len(b) < _SHINGLE:
            sh = np.zeros(1, dtype=np.uint64)
        else:
            w = np.lib.stride_tricks.sliding_window_view(b, _SHINGLE).astype(np.uint64)
            sh = (
                w[:, 0]
                | (w[:, 1] << np.uint64(8))
                | (w[:, 2] << np.uint64(16))
                | (w[:, 3] << np.uint64(24))
            )
            sh = np.unique(sh)
        # (perms, shingles) hash — vectorized outer product mix
        hv = (sh[None, :] * a[:, None]) ^ (sh[None, :] >> np.uint64(7))
        sig = hv.min(axis=1)  # (perms,)
        bands = sig.reshape(_LSH_BANDS, rows_per_band)
        keys = np.zeros(_LSH_BANDS, dtype=np.uint64)
        for r in range(rows_per_band):
            keys = keys * np.uint64(0x100000001B3) ^ bands[:, r]
        out_band.append(np.arange(_LSH_BANDS, dtype=np.int32))
        out_key.append(keys.astype(np.int64))
        out_doc.append(np.full(_LSH_BANDS, d, dtype=np.int64))
    return pa.table(
        {
            "band": pa.array(np.concatenate(out_band)),
            "band_key": pa.array(np.concatenate(out_key)),
            "doc_id": pa.array(np.concatenate(out_doc)),
        }
    )


_SIMHASH_BITS = 64
_SIMHASH_BANDS = 4  # 16 bits per band; Hamming-close docs share ≥1 band


def _simhash_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash per doc over char shingles; emits (band, band_key, doc_id,
    simhash) rows for banded candidate generation."""
    texts = batch.column("text").to_numpy(zero_copy_only=False)
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    bits_per_band = _SIMHASH_BITS // _SIMHASH_BANDS
    out_doc, out_band, out_key, out_sig = [], [], [], []
    weights = np.uint64(0x9E3779B97F4A7C15)
    for t, d in zip(texts, doc_ids):
        b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        if len(b) < _SHINGLE:
            sh = np.zeros(1, dtype=np.uint64)
        else:
            w = np.lib.stride_tricks.sliding_window_view(b, _SHINGLE).astype(np.uint64)
            sh = (
                w[:, 0] | (w[:, 1] << np.uint64(8)) | (w[:, 2] << np.uint64(16))
                | (w[:, 3] << np.uint64(24))
            )
            sh = np.unique(sh)
        h = sh * weights ^ (sh >> np.uint64(13))
        # accumulate signed bit votes, vectorized over the 64 bit positions
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        for j in np.nonzero(votes > 0)[0]:
            sig |= np.uint64(1) << np.uint64(j)
        for band in range(_SIMHASH_BANDS):
            key = (sig >> np.uint64(band * bits_per_band)) & np.uint64((1 << bits_per_band) - 1)
            out_doc.append(d)
            out_band.append(band)
            out_key.append(np.int64(key))
            out_sig.append(np.int64(sig.astype(np.int64)))
    return pa.table(
        {
            "band": pa.array(out_band, type=pa.int32()),
            "band_key": pa.array(out_key, type=pa.int64()),
            "doc_id": pa.array(out_doc, type=pa.int64()),
            "simhash": pa.array(out_sig, type=pa.int64()),
        }
    )


def _popcount_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR bit tricks)."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def simhash_near_dup(sf_dir: str, max_hamming: int = 8) -> "ray.data.Dataset":
    """SimHash near-dup: banded candidates, verified by Hamming distance.
    Output: (doc_id, dup_of, hamming) with doc_id > dup_of, deduplicated.

    Scale shape: buckets are processed per hash PARTITION (bounded
    dispatch — see pipelines/partition.py), never per bucket group; the
    per-bucket pairwise Hamming check runs over sorted bucket runs with a
    SWAR popcount.  The final (doc_id, dup_of) dedup is a vectorized
    run-start filter, not a per-pair ``map_groups``."""
    from .partition import first_per_key, map_key_partitions, run_starts

    sigs = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        _simhash_batch, batch_format="pyarrow"
    )

    def buckets_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "dup_of": pa.array([], type=pa.int64()),
                "hamming": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) < 2:
            return empty
        band = tbl.column("band").to_numpy(zero_copy_only=False)
        key = tbl.column("band_key").to_numpy(zero_copy_only=False)
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        sig = tbl.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((ids, key, band))
        band, key, ids, sig = band[order], key[order], ids[order], sig[order]
        starts = np.nonzero(run_starts(band, key))[0]
        ends = np.concatenate([starts[1:], [len(ids)]])
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            u, idx = np.unique(ids[s:e], return_index=True)
            sg = sig[s:e][idx]
            cnt = _popcount_u64(sg[:, None] ^ sg[None, :])
            a, b = np.nonzero((cnt <= max_hamming) & (u[:, None] > u[None, :]))
            out_a.append(u[a])
            out_b.append(u[b])
            out_h.append(cnt[a, b])
        if not out_a:
            return empty
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_a)),
                "dup_of": pa.array(np.concatenate(out_b)),
                "hamming": pa.array(np.concatenate(out_h)),
            }
        )

    pairs = map_key_partitions(sigs, ["band", "band_key"], buckets_part)
    return first_per_key(pairs, ["doc_id", "dup_of"])


def _levenshtein_bytes(a: bytes, b: bytes) -> int:
    """Exact unit-cost Levenshtein distance over byte strings — the
    classic row DP with the inner loop vectorized: substitutions/
    deletions come from the previous row elementwise, and the
    left-to-right insertion dependency resolves with the
    ``min-accumulate(x − i) + i`` prefix trick (cur[j] ≤ cur[j−1]+1).
    Matches DuckDB's ``levenshtein`` (unit costs) — asserted by test —
    and over the repo's ASCII corpora bytes == characters."""
    if len(a) < len(b):
        a, b = b, a
    nb = len(b)
    if nb == 0:
        return len(a)
    bb = np.frombuffer(b, np.uint8)
    idx = np.arange(nb + 1, dtype=np.int64)
    prev = idx.copy()
    cur = np.empty(nb + 1, dtype=np.int64)
    for i, ca in enumerate(a):
        cur[0] = i + 1
        np.minimum(prev[1:] + 1, prev[:-1] + (bb != ca), out=cur[1:])
        cur -= idx
        np.minimum.accumulate(cur, out=cur)
        cur += idx
        prev, cur = cur, prev
    return int(prev[-1])


def edit_distance_near_dup(
    sf_dir: str, max_hamming: int = 8, rel_permille: int = 200
) -> "ray.data.Dataset":
    """Typo-level near-dup pairs: SimHash-banded candidates verified by
    EXACT edit distance — the third verify metric in the near-dup family
    (MinHash→Jaccard, SimHash→Hamming, and now content-level
    Levenshtein), the filter that catches OCR noise / small in-place
    edits whole-document hashing and shingle sketches both blur.
    A pair survives iff ``lev·1000 ≤ rel_permille·max(len_a, len_b, 1)``
    (pure integer compare — no float threshold can flip between
    engines).

    Scale shape: candidates come from :func:`simhash_near_dup` (digests
    through the band exchange, never text), and that candidate PAIR SET
    is bounded by the near-dup rate — the quantity a dedup run wants
    small — so the verify stage gathers it driver-side (the
    ``semantic_dedup`` bounded-gather precedent), pushdown-reads ONLY
    the involved documents' texts, and broadcasts that bounded id→text
    table into a verify actor pool via constructor args; the corpus
    itself is never re-read or shuffled for verification.  The DP is
    O(len_a·len_b) per pair with a vectorized inner row — per-pair
    Python is the bounded-candidate exception, like the roof builders.

    Output: (doc_id, dup_of, lev_dist, len_a, len_b), doc_id > dup_of.
    Oracle: the SimHash CTE chain + DuckDB ``levenshtein`` under the
    identical integer threshold (exact under the ASCII corpus invariant
    — tests/test_corpus_ascii.py)."""
    import pyarrow.parquet as pq

    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "dup_of": pa.array([], type=pa.int64()),
            "lev_dist": pa.array([], type=pa.int64()),
            "len_a": pa.array([], type=pa.int64()),
            "len_b": pa.array([], type=pa.int64()),
        }
    )
    cand = simhash_near_dup_checkpointed(
        sf_dir, max_hamming=max_hamming
    ).to_pandas()
    if len(cand) == 0:
        return ray.data.from_arrow(empty)
    ids = np.unique(
        np.concatenate([cand["doc_id"].to_numpy(), cand["dup_of"].to_numpy()])
    )
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filters=[("doc_id", "in", ids.tolist())],
    )
    did = docs.column("doc_id").to_numpy()
    order = np.argsort(did)
    did = did[order]
    texts = [
        docs.column("text")[int(i)].as_py().encode("utf-8") for i in order
    ]

    class Verify:
        """Actor-pool verify: broadcast (sorted ids, texts) once per
        actor; each batch of candidate pairs runs the DP kernel."""

        def __init__(self, did, texts):
            self.did = did
            self.texts = texts

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch.column("doc_id").to_numpy(zero_copy_only=False)
            b = batch.column("dup_of").to_numpy(zero_copy_only=False)
            pa_ = np.searchsorted(self.did, a)
            pb_ = np.searchsorted(self.did, b)
            rows = []
            for i in range(len(a)):
                ta = self.texts[int(pa_[i])]
                tb = self.texts[int(pb_[i])]
                d = _levenshtein_bytes(ta, tb)
                if d * 1000 <= rel_permille * max(len(ta), len(tb), 1):
                    rows.append((int(a[i]), int(b[i]), d, len(ta), len(tb)))
            if not rows:
                return empty
            c = list(zip(*rows))
            return pa.table(
                {
                    "doc_id": pa.array(c[0], type=pa.int64()),
                    "dup_of": pa.array(c[1], type=pa.int64()),
                    "lev_dist": pa.array(c[2], type=pa.int64()),
                    "len_a": pa.array(c[3], type=pa.int64()),
                    "len_b": pa.array(c[4], type=pa.int64()),
                }
            )

    out = ray.data.from_pandas(cand[["doc_id", "dup_of"]]).map_batches(
        Verify,
        fn_constructor_args=(did, texts),
        batch_format="pyarrow",
        concurrency=max(
            1, min(4, int(ray.cluster_resources().get("CPU", 8)) - 1)
        )
        if ray.is_initialized()
        else 2,
    )
    out = out.materialize()
    if out.count() == 0:  # typed empty (to_pandas drops empty schemas)
        return ray.data.from_arrow(empty)
    return out


def simhash_near_dup_checkpointed(
    sf_dir: str, max_hamming: int = 8
) -> "ray.data.Dataset":
    """:func:`simhash_near_dup` through the corpus-keyed checkpoint
    (``state/checkpoint.py``): the banded pair relation is the shared
    input of the ``simhash_near_dup`` query AND the edit-distance verify
    (the curation_matrix/funnel shape), so the full-corpus sketch runs
    once per corpus state."""
    import os

    from ..state.checkpoint import corpus_key, parquet_checkpoint

    key = corpus_key([os.path.join(sf_dir, "documents.parquet")])
    return parquet_checkpoint(
        f"simhash_pairs_h{max_hamming}",
        key,
        lambda: simhash_near_dup(sf_dir, max_hamming=max_hamming),
        # Ray drops the schema of a fully-empty Dataset (CLAUDE.md), so
        # a no-pairs corpus needs the schema stated for the empty commit
        empty_schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("dup_of", pa.int64()),
                ("hamming", pa.int64()),
            ]
        ),
    )


def _shingle_set_u32(texts: np.ndarray) -> list[np.ndarray]:
    """Per-doc sorted unique 4-byte shingles packed as uint32 (same packing
    as the MinHash stage).

    One flat pass over the concatenated UTF-8 buffer (no per-doc Python
    byte loop, VERDICT r3 item 7): all docs' windows pack through a single
    little-endian dot product; per-doc window ranges come from offsets, so
    only the final per-doc ``np.unique`` runs in the (unavoidable) ragged
    loop.  Short texts (< 4 bytes) keep the zero-padded packing — two
    DISTINCT sub-shingle texts must not share a sentinel set (they would
    verify as jaccard 100 whenever they band together)."""
    arr = pa.array(texts.astype(object), type=pa.large_string())
    buf = np.frombuffer(arr.buffers()[2], np.uint8) if arr.buffers()[2] else np.empty(0, np.uint8)
    offs = np.frombuffer(arr.buffers()[1], np.int64)
    n_by = np.diff(offs)
    # zero-pad the tail so every window read below is in-bounds
    padded = np.concatenate([buf, np.zeros(_SHINGLE, np.uint8)]).astype(np.uint32)
    # window value at byte i = little-endian pack of padded[i : i+4]
    packed = sum(padded[k : k + len(buf)] << np.uint32(8 * k) for k in range(_SHINGLE))
    out = []
    for i in range(len(texts)):
        s, e = int(offs[i]), int(offs[i + 1])
        if e - s < _SHINGLE:
            # zero-padded single shingle of the available bytes (the pad
            # bytes after this doc in `padded` belong to the NEXT doc, so
            # repack from the doc's own bytes)
            v = np.uint32(0)
            for k in range(e - s):
                v |= np.uint32(buf[s + k]) << np.uint32(8 * k)
            out.append(np.array([v], dtype=np.uint32))
        else:
            out.append(np.unique(packed[s : e - _SHINGLE + 1]))
    return out


def jaccard_ngram_pairs(sf_dir: str, threshold: float = 0.5) -> "ray.data.Dataset":
    """Exact n-gram Jaccard verification of MinHash candidate pairs:
    candidates from the LSH bands, verified by true shingle-set Jaccard.
    Output: (doc_id, dup_of, jaccard_pct:int).

    100 TB shape: the only driver-side materialization is the DISTINCT
    candidate-id list (the broadcast small side, ≪ corpus); corpus docs are
    pruned by a vectorized ``pc.is_in`` semi-join, shingle sets attach to
    pair sides via a groupby on doc_id, and pair verification runs in a
    distributed stage keyed by (doc_id, dup_of) — no ``take_all`` of the
    pair set, no per-row Python filter over the corpus.
    """
    cands = minhash_near_dup(sf_dir).materialize()  # small; reused twice

    # broadcast small side: distinct candidate doc ids
    def _both_ids(batch: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [
                batch.column("doc_id").to_numpy(zero_copy_only=False),
                batch.column("dup_of").to_numpy(zero_copy_only=False),
            ]
        )
        return pa.table({"key_id": pa.array(np.unique(ids))})

    wanted = np.array(
        sorted(cands.map_batches(_both_ids, batch_format="pyarrow").unique("key_id")),
        dtype=np.int64,
    )
    wanted_arr = pa.array(wanted)

    # shingle sets for candidate docs only (pc.is_in semi-join at the read)
    def _shingle_rows(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("doc_id"), value_set=wanted_arr)
        batch = batch.filter(mask)
        texts = batch.column("text").to_numpy(zero_copy_only=False)
        sets = _shingle_set_u32(texts)
        n = len(batch)
        return pa.table(
            {
                "key_id": batch.column("doc_id"),
                "doc_id": pa.array(np.zeros(n, np.int64)),
                "dup_of": pa.array(np.zeros(n, np.int64)),
                "is_shingle": pa.array(np.ones(n, bool)),
                "shingles": pa.array(sets, type=pa.large_list(pa.uint32())),
            }
        )

    # each pair contributes two side rows, keyed by the doc whose shingles
    # that side needs
    def _pair_sides(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_id").to_numpy(zero_copy_only=False)
        b = batch.column("dup_of").to_numpy(zero_copy_only=False)
        n = len(a)
        empty = [np.zeros(0, np.uint32)] * (2 * n)
        return pa.table(
            {
                "key_id": pa.array(np.concatenate([a, b])),
                "doc_id": pa.array(np.concatenate([a, a])),
                "dup_of": pa.array(np.concatenate([b, b])),
                "is_shingle": pa.array(np.zeros(2 * n, bool)),
                "shingles": pa.array(empty, type=pa.large_list(pa.uint32())),
            }
        )

    side_rows = cands.map_batches(_pair_sides, batch_format="pyarrow")
    shingle_rows = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        _shingle_rows, batch_format="pyarrow"
    )

    from .partition import map_key_partitions, run_starts

    # shuffle #1: attach the key doc's shingles to every pair side — a
    # sorted-key searchsorted join INSIDE each hash partition (one
    # vectorized call per partition, not one per key group)
    def _attach_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "key_id": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "dup_of": pa.array([], type=pa.int64()),
                "shingles": pa.array([], type=pa.large_list(pa.uint32())),
            }
        )
        is_sh = tbl.column("is_shingle").to_numpy(zero_copy_only=False)
        if not is_sh.any() or is_sh.all():
            return empty
        sh = tbl.filter(pa.array(is_sh)).sort_by("key_id")
        pairs = tbl.filter(pa.array(~is_sh))
        sh_keys = sh.column("key_id").to_numpy(zero_copy_only=False)
        pk = pairs.column("key_id").to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(sh_keys, pk), 0, len(sh_keys) - 1)
        valid = sh_keys[idx] == pk
        if not valid.any():
            return empty
        pairs = pairs.filter(pa.array(valid))
        sh_col = sh.column("shingles")
        if isinstance(sh_col, pa.ChunkedArray):
            sh_col = sh_col.combine_chunks()
        attached = sh_col.take(pa.array(idx[valid]))
        return pa.table(
            {
                "key_id": pairs.column("key_id"),
                "doc_id": pairs.column("doc_id"),
                "dup_of": pairs.column("dup_of"),
                "shingles": attached,
            }
        )

    attached = map_key_partitions(
        side_rows.union(shingle_rows), ["key_id"], _attach_part
    )

    # shuffle #2: verify every pair in the partition at once — flatten both
    # sides' (already unique-within-side) shingle values, sort by
    # (pair, value), and count adjacent duplicates = intersection size
    def _verify_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "dup_of": pa.array([], type=pa.int64()),
                "jaccard_pct": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        tbl = tbl.sort_by(
            [("doc_id", "ascending"), ("dup_of", "ascending"), ("key_id", "ascending")]
        )
        a = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        b = tbl.column("dup_of").to_numpy(zero_copy_only=False)
        starts = run_starts(a, b)
        run_id = np.cumsum(starts) - 1
        run_len = np.bincount(run_id)
        ok = run_len[run_id] == 2  # a complete pair has exactly 2 sides
        if not ok.any():
            return empty
        tbl = tbl.filter(pa.array(ok))
        a, b = a[ok], b[ok]
        col = tbl.column("shingles")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = np.asarray(pc.list_value_length(col)).astype(np.int64)
        vals = np.asarray(col.flatten())
        pair_of_row = np.arange(len(tbl), dtype=np.int64) // 2
        vpair = np.repeat(pair_of_row, lens)
        order = np.lexsort((vals, vpair))
        vp, vv = vpair[order], vals[order]
        dup = (vp[1:] == vp[:-1]) & (vv[1:] == vv[:-1])
        n_pairs = len(tbl) // 2
        inter = np.bincount(vp[1:][dup], minlength=n_pairs)
        union = lens[0::2] + lens[1::2] - inter
        j = inter / np.maximum(1, union)
        keep = j >= threshold
        return pa.table(
            {
                "doc_id": pa.array(a[0::2][keep]),
                "dup_of": pa.array(b[0::2][keep]),
                "jaccard_pct": pa.array(np.round(j[keep] * 100).astype(np.int64)),
            }
        )

    return map_key_partitions(attached, ["doc_id", "dup_of"], _verify_part)


def minhash_near_dup(sf_dir: str) -> "ray.data.Dataset":
    """Near-dup candidate groups: docs sharing any LSH band bucket.

    Output: (doc_id, dup_of) pairs where dup_of = smallest doc_id in a
    shared bucket (doc_id > dup_of), deduplicated.

    Scale shape: bucket reduction and pair dedup both run per hash
    PARTITION with vectorized run-boundary segment ops (bounded dispatch;
    see pipelines/partition.py) — never one ``map_groups`` call per
    bucket or per pair."""
    from .partition import first_per_key, map_key_partitions, run_starts

    sigs = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        _minhash_batch, batch_format="pyarrow"
    )

    def buckets_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "dup_of": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) < 2:
            return empty
        band = tbl.column("band").to_numpy(zero_copy_only=False)
        key = tbl.column("band_key").to_numpy(zero_copy_only=False)
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, key, band))
        band, key, ids = band[order], key[order], ids[order]
        # one signature row per doc per band → ids are unique within a
        # bucket run; the run's first (sorted) id is the bucket minimum
        starts = run_starts(band, key)
        run_id = np.cumsum(starts) - 1
        first_idx = np.nonzero(starts)[0]
        dup_of = ids[first_idx[run_id]]
        keep = ~starts
        return pa.table(
            {"doc_id": pa.array(ids[keep]), "dup_of": pa.array(dup_of[keep])}
        )

    pairs = map_key_partitions(sigs, ["band", "band_key"], buckets_part)
    # a pair may surface from several bands — dedup (doc_id, dup_of)
    return first_per_key(pairs, ["doc_id", "dup_of"])


# ---------------------------------------------------------------------------
# dedup clustering: connected components over near-dup edge sets


def token_count_bpe(sf_dir: str) -> "ray.data.Dataset":
    """BPE-style pretokenizer count per doc (GPT-2-ish RE2 pattern over
    contractions / letter runs / digit runs / punctuation / whitespace) —
    a pure ``pyarrow.compute`` kernel, exactly reproducible in DuckDB's
    RE2 ``regexp_extract_all`` (same regex engine)."""
    PAT = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"

    def count(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bpe_tokens": pc.cast(
                    pc.count_substring_regex(text, PAT), pa.int64()
                ),
            }
        )

    return _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        count, batch_format="pyarrow"
    )


_CLUSTER_AFFIX = 64  # chars of shared prefix/suffix that define an edge


def dedup_clusters(sf_dir: str, max_rounds: int = 32) -> "ray.data.Dataset":
    """Near-dup clustering: connected components over the union of two
    equality relations — shared 64-char PREFIX and shared 64-char SUFFIX.
    Each relation alone is an equivalence class (one groupby); their UNION
    chains across classes, so real component finding is required.

    Distributed alternating label minimization, Ray-Data-idiomatic: rows
    carry (doc_id, kpre, ksuf, label); each half-round hash-partitions on
    the class key (``map_key_partitions`` — a BOUNDED number of dispatches,
    one per partition, never one per class) and rewrites every member's
    label to its class minimum with one sort + ``np.minimum.reduceat``
    segment pass per partition.  Labels are monotone non-increasing, and a
    fixed point means the label is constant across every edge — i.e. per
    connected component, equal to the component's minimum doc_id (the
    recursive-CTE transitive closure the SQL oracle computes).
    Convergence is detected via the (monotone) global label sum; class
    keys shuffle as 64-bit hashes, never text.
    """
    from .partition import map_key_partitions, run_starts

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])

    def keys(batch: pa.Table) -> pa.Table:
        import polars as pl

        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        pre = pc.utf8_slice_codeunits(text, 0, _CLUSTER_AFFIX)
        suf = pc.utf8_slice_codeunits(pc.utf8_reverse(text), 0, _CLUSTER_AFFIX)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "kpre": pa.array(pl.Series(pre).hash(seed=11).to_numpy().view(np.int64)),
                "ksuf": pa.array(pl.Series(suf).hash(seed=13).to_numpy().view(np.int64)),
                "label": batch.column("doc_id"),
            }
        )

    def _assign_min_part(key: str):
        # one vectorized segment pass per hash PARTITION (many classes per
        # call): sort by class key, per-run min via np.minimum.reduceat,
        # scatter back to input order
        def fn(tbl: pa.Table) -> pa.Table:
            if len(tbl) == 0:
                return tbl
            k = tbl.column(key).to_numpy(zero_copy_only=False)
            lab = tbl.column("label").to_numpy(zero_copy_only=False)
            order = np.argsort(k, kind="stable")
            ks, labs = k[order], lab[order]
            starts = run_starts(ks)
            mins = np.minimum.reduceat(labs, np.nonzero(starts)[0])
            new_sorted = mins[np.cumsum(starts) - 1]
            new = np.empty_like(new_sorted)
            new[order] = new_sorted
            return tbl.set_column(
                tbl.schema.get_field_index("label"),
                "label",
                pa.array(new, type=pa.int64()),
            )

        return fn

    base = docs.map_batches(keys, batch_format="pyarrow").materialize()
    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        for key in ("kpre", "ksuf"):
            base = map_key_partitions(base, [key], _assign_min_part(key))
        base = base.materialize()
        s = base.sum("label")
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        # returning non-converged labels would silently diverge from the
        # recursive-CTE oracle and break leakage_safe_split's
        # one-split-per-cluster property
        raise RuntimeError(
            f"dedup_clusters: label propagation did not converge in "
            f"{max_rounds} rounds (component diameter too large); "
            f"raise max_rounds"
        )

    return base.map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("doc_id"), "cluster_id": b.column("label")}
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# distributed TF-IDF


def _term_tf_rows(batch: pa.Table) -> pa.Table:
    """Explode one batch of documents to (term, term_hash, doc_id, tf) rows.

    Tokenization is vectorized (`pc.split_pattern` on spaces, empties
    dropped); the per-(doc, term) counting runs once over the batch via
    np.unique on (term-code, doc-row) pairs.  Each document lives in
    exactly one batch, so the emitted tf is final — no cross-batch
    combine is needed for TF, only for DF.  ``term_hash`` is a 64-bit
    text hash: all downstream shuffles key on the fixed-width hash, never
    the string (collisions are birthday-bounded at ~2^32 distinct
    terms — negligible for real vocabularies)."""
    import polars as pl

    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text, " ")
    flat = toks.flatten()
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    offs = np.asarray(toks.offsets)
    row_of_tok = np.repeat(np.arange(len(batch)), np.diff(offs))
    words = flat.to_numpy(zero_copy_only=False)
    keep = words != ""
    words, row_of_tok = words[keep], row_of_tok[keep]
    # encode terms as ints once, then count (term, doc) pairs
    vocab, code = np.unique(words, return_inverse=True)
    vocab_hash = (
        pl.Series(vocab.astype(object)).hash(seed=0x7F1D).to_numpy().view(np.int64)
    )
    pair = code.astype(np.int64) * len(doc_ids) + row_of_tok
    upair, tf = np.unique(pair, return_counts=True)
    term_idx = upair // len(doc_ids)
    return pa.table(
        {
            "term": pa.array(vocab[term_idx]),
            "term_hash": pa.array(vocab_hash[term_idx]),
            "doc_id": pa.array(doc_ids[upair % len(doc_ids)]),
            "tf": pa.array(tf.astype(np.int64)),
        }
    )


def tf_idf(sf_dir: str, num_partitions: int = 256) -> "ray.data.Dataset":
    """Distributed TF-IDF over the documents table (the feature-weighting
    primitive of every classical text pipeline).

    Shape for 100 TB: documents explode to (term, term_hash, doc_id, tf)
    in one ``map_batches`` pass; document frequency is an aggregate over
    those SAME rows keyed by the 16-byte term hash (each (term, doc)
    appears exactly once, so ``groupby(term_hash).count()`` is DF); the
    IDF attach is then ONE distributed hash-partitioned join of the tiny
    (term_hash, df) relation back onto the tf rows (tag-union + sorted
    searchsorted inside each partition, pipelines/partition.py).  The
    vocabulary is NEVER materialized on the driver and no stage holds
    more than |vocab| / num_partitions terms — Heap's law growth (1e8+
    unique terms at 100 TB) only widens the partition count, not any
    single process.  (The previous design broadcast the full vocabulary
    through a ``take_all()`` — a multi-GB driver materialization at real
    corpus sizes.)

    Output: (doc_id, term, tfidf_micro) with
    ``tfidf = tf * ln(N / df)`` in integer micro-units (oracle float rule:
    transcendental results compare at scale ≤ 1e6)."""
    from .partition import map_key_partitions

    tf_rows = (
        _docs(sf_dir)
        .select_columns(["doc_id", "text"])
        .map_batches(_term_tf_rows, batch_format="pyarrow")
    )
    n_docs = _docs(sf_dir).count()

    # DF needs no separate aggregate: the term_hash exchange co-locates
    # every (term, doc) row of a term, and each such pair appears exactly
    # once, so a term's DF is simply its RUN LENGTH inside the partition.
    # One explode, one exchange — the earlier tag-union shape ran the
    # explode twice (groupby side + tf side) and a second sort exchange.
    def attach_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "term": pa.array([], type=pa.string()),
                "tfidf_micro": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        from .partition import run_starts

        keys = tbl.column("term_hash").to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        tbl = tbl.take(pa.array(order))
        keys = keys[order]
        starts = run_starts(keys)
        idx = np.flatnonzero(starts)
        run_len = np.diff(np.append(idx, len(keys)))
        df = np.repeat(run_len, run_len).astype(np.float64)
        tf = tbl.column("tf").to_numpy(zero_copy_only=False)
        w = tf.astype(np.float64) * np.log(n_docs / df)
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "term": tbl.column("term"),
                "tfidf_micro": pa.array(
                    np.floor(w * 1e6 + 0.5).astype(np.int64)
                ),
            }
        )

    return map_key_partitions(tf_rows, ["term_hash"], attach_part, num_partitions)


# ---------------------------------------------------------------------------
# sequence packing (distributed prefix-sum / scan)


def seq_pack(sf_dir: str, budget: int = 512, n_ranges: int = 256) -> "ray.data.Dataset":
    """Pack the document stream (doc_id order) into fixed-token-budget
    training examples: doc i starts at the running token offset
    ``prefix(i) = sum(n_tokens of docs < i)`` and lands in example
    ``prefix // budget`` at offset ``prefix % budget`` — the concat-then-
    chunk packing every LLM pretraining pipeline runs.

    The global running sum is a DISTRIBUTED SCAN, done in two small steps
    instead of a serial pass: (1) a combiner-before-shuffle aggregate of
    token counts per fixed doc_id RANGE (``n_ranges`` rows total → driver
    cumsum gives each range its base offset); (2) one hash shuffle of the
    tiny (doc_id, n_tokens) rows by range_id, each range then sorting
    locally and adding its broadcast base.  No stage ever sees more than
    one range's rows; the wide text column never leaves stage 1.

    Output: (doc_id, example_id, tok_offset).  Oracle: SUM() OVER
    (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)."""
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    span = max(1, -(-n_docs // n_ranges))  # ceil: docs per range

    def counts(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_tok = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": n_tok,
                "range_id": pa.array(doc // span),
            }
        )

    count_rows = (
        _docs(sf_dir)
        .select_columns(["doc_id", "text"])
        .map_batches(counts, batch_format="pyarrow")
        .materialize()  # fixed-width rows consumed twice (totals + the
        # range shuffle) — without this the text tokenization runs twice
    )

    # step 1: per-range token totals (combiner aggregate, n_ranges rows)
    totals = count_rows.groupby("range_id").sum("n_tokens")
    rows = totals.take_all()
    rid = np.array([r["range_id"] for r in rows], dtype=np.int64)
    tot = np.array([r["sum(n_tokens)"] for r in rows], dtype=np.int64)
    order = np.argsort(rid)
    rid, tot = rid[order], tot[order]
    bases = np.concatenate([[0], np.cumsum(tot)[:-1]])
    base_of = dict(zip(rid.tolist(), bases.tolist()))

    # step 2: per-range local scan + broadcast base
    def scan(group: pa.Table) -> pa.Table:
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        ntk = group.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.argsort(doc)
        doc, ntk = doc[order], ntk[order]
        base = base_of[int(group.column("range_id")[0].as_py())]
        prefix = base + np.concatenate([[0], np.cumsum(ntk)[:-1]])
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "example_id": pa.array(prefix // budget),
                "tok_offset": pa.array(prefix % budget),
            }
        )

    return count_rows.groupby("range_id").map_groups(scan, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# heavy hitters (mergeable Misra–Gries summaries)


def _mg_truncate(terms: np.ndarray, counts: np.ndarray, capacity: int):
    """Mergeable Misra–Gries reduction (Agarwal et al., PODS'12): if more
    than ``capacity`` counters, subtract the (capacity+1)-th largest count
    from all and drop non-positives.  Estimates undercount by at most
    N/capacity."""
    if len(terms) <= capacity:
        return terms, counts
    order = np.argsort(-counts, kind="stable")
    thresh = counts[order[capacity]]
    keep = counts > thresh
    return terms[keep], counts[keep] - thresh


def top_terms(sf_dir: str, capacity: int = 64, k: int = 10) -> "pa.Table":
    """Top-k most frequent terms via mergeable Misra–Gries summaries —
    the heavy-hitter sketch: each batch reduces to ≤ ``capacity``
    (term, count) counters, summaries merge by summing shared counters
    then re-truncating, so the reduction moves fixed-size summaries and
    the full term stream is never shuffled.  Any term with true frequency
    > N/capacity is guaranteed to survive; counts are exact when a batch's
    vocabulary fits the capacity.  Output: (term, est_count, rank)."""

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pc.split_pattern(text, " ").flatten().to_numpy(zero_copy_only=False)
        words = words[words != ""]
        terms, counts = np.unique(words, return_counts=True)
        terms, counts = _mg_truncate(terms, counts.astype(np.int64), capacity)
        return pa.table(
            {
                "terms": pa.array([list(terms)], type=pa.large_list(pa.string())),
                "counts": pa.array([counts], type=pa.large_list(pa.int64())),
            }
        )

    def merge_rows(batch: pa.Table) -> pa.Table:
        """Merge ≤fan-in summary rows into one (the PODS'12 merge: sum
        shared counters, re-truncate) — runs in the combiner tree, so the
        reduction is parallel in the number of blocks, never a driver
        loop (VERDICT r4 item 1)."""
        t, c = _mg_flat(batch)
        terms, counts = _mg_combine(t, c, capacity)
        return pa.table(
            {
                "terms": pa.array([list(terms)], type=pa.large_list(pa.string())),
                "counts": pa.array([counts], type=pa.large_list(pa.int64())),
            }
        )

    partials = (
        _docs(sf_dir)
        .select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow")
    )
    # combiner tree (the stratified_sample shape): level 1 folds ~64
    # summaries per task, a bounded repartition level reduces to ≤16
    # rows, and the driver merges ONLY those — at web scale the fold is
    # parallel in the block count instead of one serial iter_rows loop.
    # Tree merge order differs from a serial fold, but the merge is
    # exact whenever the vocabulary fits ``capacity`` (no truncation
    # fires — the oracled regime) and within the N/capacity MG bound
    # otherwise.
    merged = partials.map_batches(
        merge_rows, batch_size=64, batch_format="pyarrow"
    )
    merged = merged.repartition(16).map_batches(
        merge_rows, batch_size=None, batch_format="pyarrow"
    )
    parts = [t for t in ray.get(merged.to_arrow_refs()) if t.num_rows]
    if parts:
        final = pa.concat_tables(parts, promote_options="default")
        terms, counts = _mg_combine(*_mg_flat(final), capacity)
    else:
        terms = np.empty(0, dtype=object)
        counts = np.empty(0, dtype=np.int64)
    order = np.lexsort((terms, -counts))[:k]
    return pa.table(
        {
            "term": pa.array(terms[order].astype(object), type=pa.string()),
            "est_count": pa.array(counts[order], type=pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        }
    )


def _mg_flat(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Flatten MG summary rows → (terms, counts) numpy arrays."""
    t = batch.column("terms")
    c = batch.column("counts")
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return (
        t.values.to_numpy(zero_copy_only=False),
        c.values.to_numpy(zero_copy_only=False).astype(np.int64),
    )


def _mg_combine(
    terms: np.ndarray, counts: np.ndarray, capacity: int
) -> tuple[np.ndarray, np.ndarray]:
    """Sum counters sharing a term, then MG-truncate to ``capacity``."""
    if len(terms) == 0:
        return terms, counts
    uniq, inv = np.unique(terms, return_inverse=True)
    summed = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(summed, inv, counts)
    return _mg_truncate(uniq, summed, capacity)


# ---------------------------------------------------------------------------
# eval-set decontamination


def _hashed_ngrams(text, n: int) -> tuple[np.ndarray, np.ndarray, int]:
    """64-bit hashes of the word ``n``-grams of a text column — fully
    vectorized: one ``pc.split_pattern`` tokenize, one polars hash of the
    flat token array, then a positional polynomial combine of ``n``
    consecutive token hashes (``n`` shifted fused multiply-xor passes, the
    ``doc_fingerprint`` rolling-hash pattern — never a per-row Python
    loop).  Windows crossing a document boundary are masked out.

    Accepts a pyarrow string array/chunked array or any sequence of str.
    Returns ``(gram_hash:int64[], gram_row:int64[] — owning text index
    per gram, n_texts)``.  Both the eval and train sides of
    :func:`decontaminate` use this same hash, so membership tests compare
    hash-to-hash (64-bit collisions are negligible)."""
    import polars as pl

    if not isinstance(text, (pa.Array, pa.ChunkedArray)):
        text = pa.array(list(text), type=pa.string())
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_texts = len(text)
    toks = pc.split_pattern(text, " ")
    flat = toks.flatten()
    offs = np.asarray(toks.offsets)
    row = np.repeat(np.arange(n_texts, dtype=np.int64), np.diff(offs))
    keep_arr = pc.not_equal(flat, "")
    keep = keep_arr.to_numpy(zero_copy_only=False)
    row = row[keep]
    kept = flat.filter(keep_arr)  # stays Arrow: the polars hash reads the
    # string buffer zero-copy (4x over a Python-object round-trip)
    m = len(kept) - n + 1
    if m <= 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64), n_texts
    h = pl.from_arrow(kept).hash(seed=0xC0FFEE).to_numpy()
    g = np.zeros(m, dtype=np.uint64)
    B = np.uint64(0x100000001B3)
    for k in range(n):
        g = g * B ^ h[k : k + m]
    valid = row[:m] == row[n - 1 :]
    return g[valid].view(np.int64), row[:m][valid], n_texts


def decontaminate(
    sf_dir: str, eval_source: str = "src19", n: int = 3
) -> "ray.data.Dataset":
    """Eval-set decontamination: find every train document (source ≠
    ``eval_source``) sharing at least one word ``n``-gram with any eval
    document — the overlap filter every serious pretraining pipeline runs
    before training.  (Real pipelines use 8–13-gram windows; the default
    here is scaled to the synthetic corpus's ~30-word vocabulary so the
    operator has a non-empty signal to verify against the oracle.)

    Shape: the eval set is SMALL by construction (that is what makes it
    an eval set), so its hashed n-gram vocabulary is collected once on
    the driver (pushdown-filtered read) and broadcast to a single
    shuffle-free ``map_batches`` pass over the train side — each batch
    hashes its n-grams and runs one vectorized ``np.isin`` against the
    broadcast sorted array.  No shuffle, no group machinery, text never
    moves twice.  Output: (doc_id) of contaminated train docs.
    Oracle: DuckDB list-slice n-gram join."""
    import pyarrow.parquet as pq

    ev_tbl = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["text", "source"],
        filters=[("source", "=", eval_source)],
    )
    ev_hashes, _, _ = _hashed_ngrams(ev_tbl.column("text"), n)
    ev_hashes = np.unique(ev_hashes)  # sorted — the broadcast small side

    class Check:
        """Actor-pool stage holding the broadcast eval-gram set."""

        def __init__(self, ev_sorted):
            self.ev = ev_sorted

        def __call__(self, batch: pa.Table) -> pa.Table:
            text = batch.column("text")
            if isinstance(text, pa.ChunkedArray):
                text = text.combine_chunks()
            doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
            src = batch.column("source").to_numpy(zero_copy_only=False)
            train = src != eval_source
            h, gram_row, n_train = _hashed_ngrams(text.filter(pa.array(train)), n)
            hit = np.isin(h, self.ev)
            # fold per-gram hits to per-doc any(): scatter the owning rows
            tdoc = doc[train]
            any_hit = np.zeros(n_train, dtype=bool)
            any_hit[gram_row[hit]] = True
            return pa.table({"doc_id": pa.array(tdoc[any_hit])})

    return (
        _docs(sf_dir)
        .select_columns(["doc_id", "text", "source"])
        .map_batches(
            Check,
            fn_constructor_args=(ev_hashes,),
            batch_format="pyarrow",
            # cpus-1 cap: a full-width pool starves the read tasks (the
            # repo's fixed-pool rule, see pipelines/geo._pool)
            concurrency=max(1, min(8, int(ray.cluster_resources().get("CPU", 8)) - 1))
            if ray.is_initialized()
            else 4,
        )
    )


# ---------------------------------------------------------------------------
# leakage-safe dataset split


def leakage_safe_split(sf_dir: str) -> "ray.data.Dataset":
    """Train/val/test split keyed by NEAR-DUP CLUSTER, not by document:
    every member of a connected near-dup component (see
    :func:`dedup_clusters`) lands in the same split, so no evaluation
    example has a near-duplicate in training — the leakage property naive
    per-doc splits silently violate.  Deterministic 80/10/10 on the
    cluster representative id.  Output: (doc_id, split)."""

    def assign(batch: pa.Table) -> pa.Table:
        cid = batch.column("cluster_id").to_numpy(zero_copy_only=False)
        bucket = cid % 10
        split = np.where(bucket < 8, "train", np.where(bucket == 8, "val", "test"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "split": pa.array(split.astype(object), type=pa.string()),
            }
        )

    return dedup_clusters(sf_dir).map_batches(assign, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Count-Min sketch (mergeable term-frequency estimates)


def _splitmix64_salted(x: np.ndarray, salt: int) -> np.ndarray:
    z = x.astype(np.uint64) + np.uint64(salt) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _poly257_u64(arr) -> np.ndarray:
    """Base-257 polynomial hash of each UTF-8 string mod 2^64
    (``h = Σ byte_i · 257^(L-1-i)``) — one whole-batch pass over the
    Arrow buffers, no per-string Python.  Chosen over the library xxhash
    because the DuckDB oracle reproduces it exactly in HUGEINT wrap
    arithmetic (the ``doc_fingerprint`` convention).  Strings must be
    non-empty (callers filter '' first)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.large_string())
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.uint64)
    offs = np.frombuffer(arr.buffers()[1], np.int64)[arr.offset : arr.offset + n + 1]
    data = (
        np.frombuffer(arr.buffers()[2], np.uint8)
        if arr.buffers()[2]
        else np.zeros(0, np.uint8)
    )
    lens = np.diff(offs)
    total = int(lens.sum())
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    within = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    abs_idx = np.repeat(offs[:-1], lens) + within
    exp = np.repeat(lens, lens) - 1 - within
    maxlen = int(lens.max())
    pw = np.empty(maxlen, dtype=np.uint64)
    pw[0] = 1
    for k in range(1, maxlen):
        pw[k] = pw[k - 1] * np.uint64(257)
    contrib = data[abs_idx].astype(np.uint64) * pw[exp]
    return np.add.reduceat(contrib, starts)


def term_counts_cms(
    sf_dir: str, depth: int = 4, width: int = 1024, probe_terms: int = 10
) -> "pa.Table":
    """Term-frequency estimates via a mergeable Count-Min sketch
    (Cormode & Muthukrishnan 2005): each batch folds its term stream into
    one fixed depth×width counter matrix; matrices merge by elementwise
    SUM, so the reduction moves 16 KB rows regardless of corpus size.
    Estimates are one-sided (never undercount; overcount ≤ εN w.h.p.).
    The reported rows are the Misra–Gries top terms re-estimated from the
    sketch — the classic candidates-from-MG + counts-from-CMS pairing.
    Output: (term, est_count)."""

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat = pc.split_pattern(text, " ").flatten()
        kept = flat.filter(pc.not_equal(flat, ""))
        h = _poly257_u64(kept)
        mat = np.zeros((depth, width), dtype=np.int64)
        for d in range(depth):
            idx = (_splitmix64_salted(h.view(np.int64), d) % np.uint64(width)).astype(
                np.int64
            )
            np.add.at(mat[d], idx, 1)
        return pa.table(
            {"cms": pa.array([mat.reshape(-1)], type=pa.large_list(pa.int64()))}
        )

    def merge_rows(batch: pa.Table) -> pa.Table:
        """Elementwise-SUM fold of ≤fan-in sketch rows into one — runs in
        the combiner tree so the reduction is parallel in the block
        count, never a serial driver loop (VERDICT r4 item 1).  Integer
        sum is fully associative, so any fold order is identical."""
        if len(batch) == 0:  # empty repartition block: keep the schema
            return batch
        col = batch.column("cms")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals = np.asarray(col.values).reshape(len(batch), -1)
        return pa.table(
            {
                "cms": pa.array(
                    [vals.sum(axis=0, dtype=np.int64)],
                    type=pa.large_list(pa.int64()),
                )
            }
        )

    partials = (
        _docs(sf_dir)
        .select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow")
    )
    # combiner tree (same shape as top_terms): ~64 sketch rows fold per
    # task, a bounded repartition level reduces to ≤16 rows, and only
    # those reach the driver.
    merged = (
        partials.map_batches(merge_rows, batch_size=64, batch_format="pyarrow")
        .repartition(16)
        .map_batches(merge_rows, batch_size=None, batch_format="pyarrow")
    )
    mat = np.zeros(depth * width, dtype=np.int64)
    for t in ray.get(merged.to_arrow_refs()):
        if t.num_rows:
            col = t.column("cms").combine_chunks()
            mat += np.asarray(col.values).reshape(t.num_rows, -1).sum(
                axis=0, dtype=np.int64
            )
    mat = mat.reshape(depth, width)

    top = top_terms(sf_dir, k=probe_terms)
    terms = top.column("term").to_numpy(zero_copy_only=False)
    th = _poly257_u64(pa.array(terms.astype(object), type=pa.string()))
    ests = np.full(len(terms), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        idx = (_splitmix64_salted(th.view(np.int64), d) % np.uint64(width)).astype(
            np.int64
        )
        ests = np.minimum(ests, mat[d, idx])
    return pa.table({"term": pa.array(terms), "est_count": pa.array(ests)})


# ---------------------------------------------------------------------------
# training-mixture subsampling


def source_mixture(
    sf_dir: str, rates_pm: dict[str, int] | None = None, default_pm: int = 1000
) -> "ray.data.Dataset":
    """Deterministic per-source subsampling to a target training mixture:
    keep a document iff ``knuth(doc_id) % 1000 < rate_permille[source]``
    where ``knuth(x) = (x * 2654435761) mod 2^32`` — the data-mixing step
    of every pretraining run (downweight crawl, upweight curated) in pure
    integer arithmetic: reproducible across engines and partitionings (no
    RNG, no float thresholds), and the multiplicative hash decorrelates
    the keep decision from id assignment order.  One shuffle-free
    vectorized pass.  Default demo mixture: even sources halved."""
    if rates_pm is None:
        rates_pm = {f"src{i}": (500 if i % 2 == 0 else 1000) for i in range(20)}
    # rate lookup as a sorted-key searchsorted (vectorized; the rate table
    # is tiny and built once per task closure, never per row)
    rate_keys = np.array(sorted(rates_pm))
    rate_vals = np.array([rates_pm[k] for k in rate_keys], dtype=np.int64)

    def keep(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        src = batch.column("source").to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(rate_keys, src), 0, len(rate_keys) - 1)
        thr = np.where(rate_keys[idx] == src, rate_vals[idx], default_pm)
        key = (doc.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
        mask = (key % np.uint64(1000)).astype(np.int64) < thr
        return pa.table(
            {
                "doc_id": pa.array(doc[mask]),
                "source": pa.array(src[mask].astype(object), type=pa.string()),
            }
        )

    return (
        _docs(sf_dir)
        .select_columns(["doc_id", "source"])
        .map_batches(keep, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition signals


def _run_top_and_unique(row_ids, keys, n_rows):
    """Per row-id: (max occurrences of one key, distinct keys) via one
    lexsort + run-boundary reduction — no per-row Python."""
    if len(keys) == 0:
        z = np.zeros(n_rows, np.int64)
        return z, z
    order = np.lexsort((keys, row_ids))
    r, k = row_ids[order], keys[order]
    new_run = np.empty(len(k), bool)
    new_run[0] = True
    new_run[1:] = (r[1:] != r[:-1]) | (k[1:] != k[:-1])
    starts = np.flatnonzero(new_run)
    run_len = np.diff(np.r_[starts, len(k)])
    run_row = r[starts]
    top = np.zeros(n_rows, np.int64)
    np.maximum.at(top, run_row, run_len)
    uniq = np.zeros(n_rows, np.int64)
    np.add.at(uniq, run_row, 1)
    return top, uniq


def _word_codes(batch: pa.Table):
    """Dictionary-encoded word stream of a batch: (codes, row-of-word,
    words-per-doc, vocab-size).  Split keeps empty tokens (single-space
    separator), matching ``string_split`` in the DuckDB oracles."""
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.split_pattern(text, " ")
    offs = np.asarray(words.offsets).astype(np.int64)
    counts = np.diff(offs)
    codes = np.asarray(words.values.dictionary_encode().indices, dtype=np.int64)
    row = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    vocab = int(codes.max()) + 1 if len(codes) else 1
    return codes, row, counts, vocab


def doc_repetition(sf_dir: str) -> "ray.data.Dataset":
    """Per-document repetition quality signals (the Gopher/C4 family of
    "excessive repetition" filters): total/unique word counts, the count of
    the most frequent word, bigram count and the count of the most frequent
    bigram.  All integers so the DuckDB oracle hash-matches exactly.

    Fully per-document → shuffle-free single ``map_batches`` pass.  Words
    are dictionary-encoded by Arrow (zero per-row Python), bigrams become
    ``code[i] * V + code[i+1]`` integer keys, and per-(doc, key) counts come
    from one lexsort + run-boundary ``reduceat`` over the whole batch."""

    def signals(batch: pa.Table) -> pa.Table:
        n = len(batch)
        codes, row, counts, vocab = _word_codes(batch)
        top_word, n_unique = _run_top_and_unique(row, codes, n)
        same_row = row[:-1] == row[1:] if len(row) else np.empty(0, bool)
        bg_keys = codes[:-1][same_row] * vocab + codes[1:][same_row]
        bg_rows = row[:-1][same_row]
        top_bigram, _ = _run_top_and_unique(bg_rows, bg_keys, n)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(counts),
                "n_unique_words": pa.array(n_unique),
                "top_word_count": pa.array(top_word),
                "n_bigrams": pa.array(np.maximum(counts - 1, 0)),
                "top_bigram_count": pa.array(top_bigram),
            }
        )

    return _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        signals, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# stratified exact-quota sampling


def stratified_sample(sf_dir: str, quota: int = 12) -> "ray.data.Dataset":
    """Exactly ``quota`` documents per source, chosen by deterministic
    hash rank (``knuth(doc_id)``, ties by doc_id) — the exact-quota
    stratified counterpart of :func:`source_mixture`'s rate-based keep.

    Scale shape: a combiner *tree*, not one gather.  Each input block
    reduces to its local top-``quota`` per source (only ``quota × sources``
    16-byte candidate rows per block leave the map stage — never document
    text); an intermediate ``repartition(16)`` level re-reduces so the
    final single-block pass sees ≤ ``16 × quota × sources`` rows no matter
    how many input blocks there were.  The rank key
    ``(knuth_hash(doc_id), doc_id)`` is total and partition-independent,
    so the tree reduce is exact, not approximate."""

    def _keep_topk(doc, src, h):
        """Indices of the top-``quota`` (h, doc) rows per source run."""
        n = len(src)
        if n == 0:
            return np.empty(0, np.int64)
        order = np.lexsort((doc, h, src))
        s = src[order]
        new_grp = np.empty(n, bool)
        new_grp[0] = True
        new_grp[1:] = s[1:] != s[:-1]
        starts = np.flatnonzero(new_grp)
        grp_start = np.repeat(starts, np.diff(np.r_[starts, n]))
        rank = np.arange(n) - grp_start
        return order[rank < quota]

    def _cand_table(doc, src, h, keep, with_h):
        cols = {
            "doc_id": pa.array(doc[keep]),
            "source": pa.array(src[keep].astype(object), type=pa.string()),
        }
        if with_h:
            cols["h"] = pa.array(h[keep])
        return pa.table(cols)

    def local_topk(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        src = batch.column("source").to_numpy(zero_copy_only=False)
        h = (doc.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
        h = h.astype(np.int64)
        return _cand_table(doc, src, h, _keep_topk(doc, src, h), with_h=True)

    def re_reduce(with_h):
        def fn(batch: pa.Table) -> pa.Table:
            doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
            src = batch.column("source").to_numpy(zero_copy_only=False)
            h = batch.column("h").to_numpy(zero_copy_only=False)
            return _cand_table(doc, src, h, _keep_topk(doc, src, h), with_h)

        return fn

    cand = (
        _docs(sf_dir)
        .select_columns(["doc_id", "source"])
        .map_batches(local_topk, batch_format="pyarrow")
    )
    # tree combine: bounded intermediate level, then the exact global rank
    cand = cand.repartition(16).map_batches(re_reduce(True), batch_format="pyarrow")
    return cand.repartition(1).map_batches(re_reduce(False), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# composite quality filter


def quality_filter(sf_dir: str) -> "ray.data.Dataset":
    """C4/Gopher-style composite keep/drop decision per document, fusing
    length, repetition and alphabetic-ratio signals in ONE shuffle-free
    ``map_batches`` pass (reuses :func:`doc_repetition`'s dictionary-encode
    run kernel and :func:`text_stats`' pyarrow count kernels).

    Integer-only predicates so the DuckDB oracle hash-matches exactly —
    first failing rule wins:

      * ``short``      — fewer than 12 words;
      * ``repetitive`` — most frequent word > 25% of words
                         (``4 * top_word_count > n_words``);
      * ``low_alpha``  — alphabetic chars < 70% of chars
                         (``10 * n_alpha < 7 * n_chars``);
      * ``ok``         — keep.

    Output: (doc_id, reason, keep) with keep ∈ {0, 1} int64."""

    def decide(batch: pa.Table) -> pa.Table:
        n = len(batch)
        codes, row, counts, _ = _word_codes(batch)
        top_word, _ = _run_top_and_unique(row, codes, n)
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_chars = np.asarray(pc.utf8_length(text), dtype=np.int64)
        n_alpha = np.asarray(
            pc.count_substring_regex(text, "[A-Za-z]"), dtype=np.int64
        )
        short = counts < 12
        repetitive = 4 * top_word > counts
        low_alpha = 10 * n_alpha < 7 * n_chars
        reason = np.where(
            short,
            "short",
            np.where(repetitive, "repetitive", np.where(low_alpha, "low_alpha", "ok")),
        )
        keep = (~(short | repetitive | low_alpha)).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "reason": pa.array(reason.astype(object), type=pa.string()),
                "keep": pa.array(keep),
            }
        )

    return _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        decide, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# fixed-window chunk-level exact dedup (paragraph-dedup analog)


def chunk_dedup(
    sf_dir: str, k: int = 8, num_partitions: int = 64
) -> "ray.data.Dataset":
    """Chunk-level exact duplication profile: split each document into
    consecutive non-overlapping ``k``-word chunks and count, per document,
    how many of its chunks occur at least twice anywhere in the corpus —
    the fixed-window analog of paragraph-level dedup (RefinedWeb /
    MassiveText line-dedup) for corpora without paragraph structure.

    Scale shape: documents explode to 24-byte (h1, h2, doc_id) chunk
    occurrence rows in one pass — the chunk key is a degree-``k``
    polynomial combine of per-word 64-bit hashes under two seeds (128-bit
    effective key; text never shuffles).  Duplicate detection is a
    hash-partitioned segment reduction (pipelines/partition.py), per-doc
    chunk totals ride along as tagged base rows spread by a doc-id hash
    (no second tokenization pass), and the final per-doc sum is a groupby
    over fixed-width partial rows.

    Output: (doc_id, n_chunks, n_dup_chunks), one row per document.
    """
    import polars as pl

    from .partition import map_key_partitions, run_starts

    P1 = np.uint64(0x100000001B3)
    P2 = np.uint64(0x9E3779B97F4A7C15)

    def explode(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pc.split_pattern(text, " ")
        flat = words.values
        offs = np.asarray(words.offsets).astype(np.int64)
        counts = np.diff(offs)
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n_chunks = counts // k
        pos_in_doc = np.arange(len(flat), dtype=np.int64) - np.repeat(
            offs[:-1], counts
        )
        keep = pos_in_doc < np.repeat(n_chunks * k, counts)
        s = pl.Series("w", flat)
        w1 = s.hash(seed=0x9E3779B9).to_numpy()[keep].reshape(-1, k)
        w2 = s.hash(seed=0x85EBCA6B).to_numpy()[keep].reshape(-1, k)
        h1 = np.zeros(len(w1), dtype=np.uint64)
        h2 = np.zeros(len(w2), dtype=np.uint64)
        for j in range(k):  # k column ops, vectorized over all chunks
            h1 = h1 * P1 + w1[:, j]
            h2 = h2 * P2 + w2[:, j]
        occ_doc = np.repeat(doc_ids, n_chunks)
        base_h = (doc_ids.astype(np.uint64) * P2).view(np.int64)
        n_occ, n = len(occ_doc), len(batch)
        return pa.table(
            {
                "h1": pa.array(np.concatenate([h1.view(np.int64), base_h])),
                "h2": pa.array(
                    np.concatenate([h2.view(np.int64), np.zeros(n, np.int64)])
                ),
                "doc_id": pa.array(np.concatenate([occ_doc, doc_ids])),
                "n_chunks": pa.array(
                    np.concatenate([np.zeros(n_occ, np.int64), n_chunks])
                ),
                "is_base": pa.array(
                    np.concatenate([np.zeros(n_occ, np.int8), np.ones(n, np.int8)])
                ),
            }
        )

    def part_fn(tbl: pa.Table) -> pa.Table:
        is_base = tbl.column("is_base").to_numpy(zero_copy_only=False) == 1
        doc = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        chunks_col = tbl.column("n_chunks").to_numpy(zero_copy_only=False)
        out_doc = [doc[is_base]]
        out_chunks = [chunks_col[is_base].astype(np.int64)]
        out_dups = [np.zeros(int(is_base.sum()), np.int64)]
        occ = ~is_base
        if occ.any():
            h1 = tbl.column("h1").to_numpy(zero_copy_only=False)[occ]
            h2 = tbl.column("h2").to_numpy(zero_copy_only=False)[occ]
            od = doc[occ]
            order = np.lexsort((h2, h1))
            h1s, h2s, ods = h1[order], h2[order], od[order]
            starts = np.flatnonzero(run_starts(h1s, h2s))
            run_len = np.diff(np.r_[starts, len(h1s)])
            dup_docs = ods[np.repeat(run_len >= 2, run_len)]
            u, c = np.unique(dup_docs, return_counts=True)
            out_doc.append(u)
            out_chunks.append(np.zeros(len(u), np.int64))
            out_dups.append(c.astype(np.int64))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_doc)),
                "n_chunks": pa.array(np.concatenate(out_chunks)),
                "n_dup_chunks": pa.array(np.concatenate(out_dups)),
            }
        )

    rows = (
        _docs(sf_dir)
        .select_columns(["doc_id", "text"])
        .map_batches(explode, batch_format="pyarrow")
    )
    partials = map_key_partitions(rows, ["h1"], part_fn, num_partitions)
    from .partition import sum_by_key

    g = sum_by_key(
        partials,
        ["doc_id"],
        {"n_chunks": "n_chunks", "n_dup_chunks": "n_dup_chunks"},
    )

    def cast_cols(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chunks": pc.cast(batch.column("n_chunks"), pa.int64()),
                "n_dup_chunks": pc.cast(batch.column("n_dup_chunks"), pa.int64()),
            }
        )

    return g.map_batches(cast_cols, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# BM25 retrieval top-k


def bm25_topk(
    sf_dir: str,
    n_queries: int = 5,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> "ray.data.Dataset":
    """Distributed BM25 retrieval: score every document against each query
    (query ``qid`` = the distinct terms of document ``qid`` for
    ``doc_id < n_queries``) and return the global top-``k`` per query —
    the classical sparse-retrieval primitive next to the dense ANN family.

    Scale shape (two streaming passes over text, nothing wide shuffles):

    * pass B per batch emits ONE fixed-width partial row — doc count,
      token count, and a df count per query term (bounded by the query
      vocabulary, not the corpus vocabulary) — summed into broadcast
      constants (idf, avgdl) on the driver;
    * pass C re-tokenizes each batch, computes per-doc tf over query
      terms with one lexsort + run reduction, applies the BM25 formula
      vectorized over (doc, term) matches, and keeps a block-local
      top-``k`` per qid; a bounded combiner tree (same as
      :func:`stratified_sample`) picks the global winners.

    Ranking compares the INTEGER micro-score (ties by doc_id), so rank is
    exactly reproducible by the DuckDB oracle — no float-order ambiguity.

    Output: (qid, doc_id, score_e6, rank), k rows per query.
    """
    import pyarrow.parquet as pq_mod

    # pass A: the query term sets (n_queries docs — a bounded driver read)
    qt = pq_mod.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    qmask = pc.less(qt.column("doc_id"), n_queries)
    qt = qt.filter(qmask)
    qids = qt.column("doc_id").to_numpy(zero_copy_only=False)
    qterms: dict[int, np.ndarray] = {}
    for qid, text in zip(qids, qt.column("text").to_pylist()):
        terms = np.unique([w for w in text.split(" ") if w != ""])
        qterms[int(qid)] = terms
    all_q = np.unique(np.concatenate(list(qterms.values())))

    def stats_partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ")
        flat = toks.values.to_numpy(zero_copy_only=False)
        offs = np.asarray(toks.offsets).astype(np.int64)
        counts = np.diff(offs)
        row = np.repeat(np.arange(len(batch)), counts)
        keep = flat != ""
        flat, row = flat[keep], row[keep]
        n_tokens = int(len(flat))
        # df partial: #docs in this batch containing each query term
        ti = np.searchsorted(all_q, flat)
        hit = (ti < len(all_q)) & (all_q[np.minimum(ti, len(all_q) - 1)] == flat)
        pair = np.unique(ti[hit] * len(batch) + row[hit])
        dfp = np.bincount(pair // len(batch), minlength=len(all_q))
        return pa.table(
            {
                "n_docs": pa.array([len(batch)], type=pa.int64()),
                "n_tokens": pa.array([n_tokens], type=pa.int64()),
                "df": pa.array([dfp.astype(np.int64)], type=pa.list_(pa.int64())),
            }
        )

    parts = (
        _docs(sf_dir)
        .select_columns(["doc_id", "text"])
        .map_batches(stats_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: one row per block
    )
    n_docs = int(parts["n_docs"].sum())
    avgdl = float(parts["n_tokens"].sum()) / n_docs
    df = np.sum(np.stack(parts["df"].to_numpy()), axis=0).astype(np.float64)
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)

    # per-qid views into the global query-term array
    q_term_idx = {qid: np.searchsorted(all_q, t) for qid, t in qterms.items()}

    def score_block(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(text, " ")
        flat = toks.values.to_numpy(zero_copy_only=False)
        offs = np.asarray(toks.offsets).astype(np.int64)
        counts = np.diff(offs)
        row = np.repeat(np.arange(len(batch)), counts)
        keep = flat != ""
        flat, row = flat[keep], row[keep]
        dl = np.bincount(row, minlength=len(batch)).astype(np.float64)
        ti = np.searchsorted(all_q, flat)
        hit = (ti < len(all_q)) & (all_q[np.minimum(ti, len(all_q) - 1)] == flat)
        pair = ti[hit].astype(np.int64) * len(batch) + row[hit]
        upair, tf = np.unique(pair, return_counts=True)
        m_term = upair // len(batch)
        m_row = upair % len(batch)
        tf = tf.astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * dl[m_row] / avgdl)
        contrib = idf[m_term] * tf * (k1 + 1.0) / denom
        out_q, out_d, out_s = [], [], []
        for qid, tidx in q_term_idx.items():
            sel = np.isin(m_term, tidx)
            sc = np.zeros(len(batch), np.float64)
            np.add.at(sc, m_row[sel], contrib[sel])
            nz = np.flatnonzero((sc > 0) & (doc_ids != qid))
            sc_e6 = np.floor(sc[nz] * 1e6 + 0.5).astype(np.int64)
            # block-local top-k: (-score, doc_id) ascending
            order = np.lexsort((doc_ids[nz], -sc_e6))[:k]
            out_q.append(np.full(len(order), qid, np.int64))
            out_d.append(doc_ids[nz][order])
            out_s.append(sc_e6[order])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q) if out_q else np.empty(0, np.int64)),
                "doc_id": pa.array(np.concatenate(out_d) if out_d else np.empty(0, np.int64)),
                "score_e6": pa.array(np.concatenate(out_s) if out_s else np.empty(0, np.int64)),
            }
        )

    def reduce_topk(final: bool):
        def fn(batch: pa.Table) -> pa.Table:
            q = batch.column("qid").to_numpy(zero_copy_only=False)
            d = batch.column("doc_id").to_numpy(zero_copy_only=False)
            s = batch.column("score_e6").to_numpy(zero_copy_only=False)
            order = np.lexsort((d, -s, q))
            qs = q[order]
            n = len(qs)
            if n:
                new_grp = np.empty(n, bool)
                new_grp[0] = True
                new_grp[1:] = qs[1:] != qs[:-1]
                starts = np.flatnonzero(new_grp)
                grp_start = np.repeat(starts, np.diff(np.r_[starts, n]))
                rank = np.arange(n) - grp_start
                keepm = rank < k
            else:
                keepm = np.empty(0, bool)
                rank = np.empty(0, np.int64)
            cols = {
                "qid": pa.array(q[order][keepm]),
                "doc_id": pa.array(d[order][keepm]),
                "score_e6": pa.array(s[order][keepm]),
            }
            if final:
                cols["rank"] = pa.array((rank[keepm] + 1).astype(np.int64))
            return pa.table(cols)

        return fn

    scored = (
        _docs(sf_dir)
        .select_columns(["doc_id", "text"])
        .map_batches(score_block, batch_format="pyarrow")
    )
    scored = scored.repartition(16).map_batches(
        reduce_topk(False), batch_format="pyarrow"
    )
    return scored.repartition(1).map_batches(
        reduce_topk(True), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# exact per-language top-k terms (grouped heavy hitters, exact variant)


def top_terms_by_lang(sf_dir: str, k: int = 5) -> "ray.data.Dataset":
    """Exact top-``k`` most frequent terms PER LANGUAGE — the grouped
    variant of :func:`top_terms`, exact instead of sketched.

    Scale shape: each batch pre-aggregates its (lang, term) counts (one
    vectorized ``np.unique`` over lexically fused keys), so the shuffle
    carries one row per (batch, lang, term) — bounded by per-batch
    vocabulary, never raw tokens.  The groupby combine is Ray's Sum over
    the composite key; the final per-lang top-k hash-partitions by lang
    (bounded key space) and reduces each language run with one lexsort +
    boundary mask — no per-term dispatch.

    Output: (lang, term, n, rank) with rank 1..k per lang, ties broken by
    term ascending (matches the SQL ``ROW_NUMBER`` tiebreak)."""
    from .partition import map_key_partitions

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(text, " ")
        offs = np.asarray(toks.offsets)
        words = toks.flatten().to_numpy(zero_copy_only=False)
        wl = lang[np.repeat(np.arange(len(batch)), np.diff(offs))]
        keep = words != ""
        words, wl = words[keep], wl[keep]
        # dictionary-encode both columns, fuse the integer ids so ONE
        # np.unique counts the composite (no fused-string materialization)
        _, il = np.unique(wl, return_inverse=True)
        uw, iw = np.unique(words, return_inverse=True)
        fused = il.astype(np.int64) * len(uw) + iw
        _, idx, counts = np.unique(fused, return_index=True, return_counts=True)
        return pa.table(
            {
                "lang": pa.array(wl[idx]),
                "term": pa.array(words[idx]),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    merged = (
        _docs(sf_dir)
        .select_columns(["text", "lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .aggregate(ray.data.aggregate.Sum("n", alias_name="n"))
    )

    def topk(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.array([], type=pa.string()),
                "term": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        lang = tbl.column("lang").to_numpy(zero_copy_only=False)
        term = tbl.column("term").to_numpy(zero_copy_only=False)
        n = tbl.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((term, -n, lang))
        lang, term, n = lang[order], term[order], n[order]
        starts = np.concatenate([[True], lang[1:] != lang[:-1]])
        run_id = np.cumsum(starts) - 1
        pos = np.arange(len(lang)) - np.flatnonzero(starts)[run_id]
        keep = pos < k
        return pa.table(
            {
                "lang": pa.array(lang[keep]),
                "term": pa.array(term[keep]),
                "n": pa.array(n[keep]),
                "rank": pa.array((pos[keep] + 1).astype(np.int64)),
            }
        )

    return map_key_partitions(merged, ["lang"], topk, num_partitions=16)


def doc_chunks(
    sf_dir: str, chunk: int = 128, overlap: int = 32
) -> "ray.data.Dataset":
    """Fixed-window document chunking with overlap — the retrieval/embedding
    preprocessing step (split every document into ``chunk``-token windows
    advancing by ``chunk - overlap`` tokens) every RAG/embedding pipeline
    runs before vectorizing.

    Scale shape: entirely shuffle-free — chunk boundaries are pure per-doc
    arithmetic on the token count, computed vectorized per batch
    (``count_substring_regex`` for counts, ``np.repeat`` + per-run offsets
    for the explode).  Output rows are 4 small integers; the text itself
    never leaves the stage.  A window always starts while tokens remain
    beyond the previous window's overlap, so every token is covered and
    consecutive chunks share exactly ``overlap`` tokens (except a shorter
    final chunk).

    Output: (doc_id, chunk_id, tok_start, n_tokens)."""
    stride = chunk - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk")

    def explode(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_tok = (
            pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        # chunks per doc: ceil(max(n - overlap, 1) / stride); 0 when empty
        n_chunks = np.where(
            n_tok > 0,
            -(-np.maximum(n_tok - overlap, 1) // stride),
            0,
        ).astype(np.int64)
        doc_rep = np.repeat(doc, n_chunks)
        ntok_rep = np.repeat(n_tok, n_chunks)
        # per-doc chunk index 0..n_chunks-1 via global-cumsum subtraction
        total = int(n_chunks.sum())
        ends = np.cumsum(n_chunks)
        starts_of_doc = np.repeat(ends - n_chunks, n_chunks)
        chunk_id = np.arange(total, dtype=np.int64) - starts_of_doc
        tok_start = chunk_id * stride
        n_in_chunk = np.minimum(chunk, ntok_rep - tok_start)
        return pa.table(
            {
                "doc_id": pa.array(doc_rep),
                "chunk_id": pa.array(chunk_id),
                "tok_start": pa.array(tok_start),
                "n_tokens": pa.array(n_in_chunk.astype(np.int64)),
            }
        )

    return (
        _docs(sf_dir)
        .select_columns(["doc_id", "text"])
        .map_batches(explode, batch_format="pyarrow")
    )


def _bigram_rows(batch: pa.Table) -> pa.Table:
    """Explode one batch of documents to (h1, h12, doc_id, cnt) bigram rows.

    Tokenization matches ``_term_tf_rows`` (vectorized space split, empties
    dropped); bigrams pair consecutive tokens WITHIN a document (the
    row-boundary mask kills cross-doc pairs).  Tokens travel as 64-bit
    hashes — every downstream shuffle and join keys on fixed-width ints,
    never strings (collisions birthday-bounded as in tf_idf)."""
    import polars as pl

    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text, " ")
    flat = toks.flatten()
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    offs = np.asarray(toks.offsets)
    row_of_tok = np.repeat(np.arange(len(batch)), np.diff(offs))
    keep_arr = pc.not_equal(flat, "")
    keep = keep_arr.to_numpy(zero_copy_only=False)
    row_of_tok = row_of_tok[keep]
    words = flat.filter(keep_arr)  # stays Arrow for the zero-copy hash
    if len(words) < 2:
        return pa.table(
            {
                "h1": pa.array([], type=pa.int64()),
                "h12": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            }
        )
    h = pl.from_arrow(words).hash(seed=0x2B1A).to_numpy().view(np.int64)
    valid = row_of_tok[1:] == row_of_tok[:-1]
    h1, h2 = h[:-1][valid], h[1:][valid]
    row = row_of_tok[:-1][valid]
    # single 64-bit bigram identity (Weyl-constant mix of the two token
    # hashes) so every downstream shuffle/probe keys ONE fixed-width int —
    # collision class identical to tf_idf's term_hash
    h12 = (
        h1.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        + h2.view(np.uint64)
    ).view(np.int64)
    # per-(doc, bigram) occurrence counts via lexsort + run boundaries
    order = np.lexsort((h12, row))
    row, h1, h12 = row[order], h1[order], h12[order]
    from .partition import run_starts

    starts = run_starts(row, h12)
    idx = np.flatnonzero(starts)
    cnt = np.diff(np.append(idx, len(row)))
    return pa.table(
        {
            "h1": pa.array(h1[idx]),
            "h12": pa.array(h12[idx]),
            "doc_id": pa.array(doc_ids[row[idx]]),
            "cnt": pa.array(cnt.astype(np.int64)),
        }
    )


def bigram_lm_score(sf_dir: str, num_partitions: int = 256) -> "ray.data.Dataset":
    """Per-document bigram language-model log-probability (add-one
    smoothed) — the KenLM-style fluency/perplexity signal quality
    filters rank web documents by, with the LM trained ON the corpus
    itself in the same distributed job.

    Model: ln P(doc) = Σ over bigram instances ln((c2+1) / (c1+V)) with
    c2 = corpus count of the bigram, c1 = corpus count of its first word
    as a bigram start, V = distinct bigram-start vocabulary size.

    Scale shape (the tf_idf discipline end-to-end): documents explode
    once per consumer into fixed-width (h1, h2, doc_id, cnt) rows; the
    model tables are groupby aggregates over those SAME rows (bc keyed
    (h1,h2), uc keyed h1 — partial counts pre-combine per batch by
    construction); each attach is ONE hash-partitioned tag-union join
    (pipelines/partition.py) — the vocabulary never materializes on the
    driver (V is a single scalar count).  Per-instance scores floor to
    integer micro-nats BEFORE the per-doc sum, so the combine tree is
    association-free and the oracle match exact (transcendental 1e6
    scale per the repo float rules).

    Output: (doc_id, n_bigrams, logprob_e6)."""
    from .partition import map_key_partitions, run_starts

    doc_rows = (
        _docs(sf_dir)
        .select_columns(["doc_id", "text"])
        .map_batches(_bigram_rows, batch_format="pyarrow")
    )

    # ONE h1-keyed exchange: every bigram row whose first word hashes
    # equal co-locates, so the MODEL counts (c2 per bigram, c1 per
    # bigram-start) are computable in-partition from the doc rows
    # themselves — no separate bc/uc groupbys, no tag union, and the
    # corpus explodes exactly once (the earlier shape exploded it three
    # times and ran four exchanges).  The exchanged rel materializes
    # (fixed-width rows, spillable) because two scans consume it: the V
    # pre-pass (distinct bigram-start vocabulary as per-block partial
    # distinct counts summed to one scalar — blocks hold complete h1
    # groups, so partials never double-count) and the scoring scan.
    ex = map_key_partitions(
        doc_rows, ["h1"], lambda t: t, num_partitions
    ).materialize()

    def v_partial(batch: pa.Table) -> pa.Table:
        h1 = batch.column("h1").to_numpy(zero_copy_only=False)
        return pa.table(
            {"v": pa.array([len(np.unique(h1))], type=pa.int64())}
        )

    v_scalar = ex.map_batches(
        v_partial, batch_format="pyarrow", batch_size=None
    ).sum("v")
    v_size = int(v_scalar or 0)

    def score_block(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "p_n": pa.array([], type=pa.int64()),
                "p_lp": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        h1 = tbl.column("h1").to_numpy(zero_copy_only=False)
        h12 = tbl.column("h12").to_numpy(zero_copy_only=False)
        cnt = tbl.column("cnt").to_numpy(zero_copy_only=False)
        did = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((h12, h1))
        h1s, h12s, cnts, dids = h1[order], h12[order], cnt[order], did[order]
        s1 = run_starts(h1s)
        c1 = np.repeat(
            np.add.reduceat(cnts, np.flatnonzero(s1)),
            np.diff(np.append(np.flatnonzero(s1), len(cnts))),
        ).astype(np.float64)
        s2 = run_starts(h1s, h12s)
        c2 = np.repeat(
            np.add.reduceat(cnts, np.flatnonzero(s2)),
            np.diff(np.append(np.flatnonzero(s2), len(cnts))),
        ).astype(np.float64)
        per_inst = np.floor(
            np.log((c2 + 1.0) / (c1 + float(v_size))) * 1e6 + 0.5
        ).astype(np.int64)
        ud, inv = np.unique(dids, return_inverse=True)
        n_sum = np.zeros(len(ud), dtype=np.int64)
        lp_sum = np.zeros(len(ud), dtype=np.int64)
        np.add.at(n_sum, inv, cnts)
        np.add.at(lp_sum, inv, per_inst * cnts)
        return pa.table(
            {
                "doc_id": pa.array(ud),
                "p_n": pa.array(n_sum),
                "p_lp": pa.array(lp_sum),
            }
        )

    partials = ex.map_batches(
        score_block, batch_format="pyarrow", batch_size=None
    )

    from .partition import sum_by_key

    merged = sum_by_key(
        partials, ["doc_id"], {"p_n": "n_bigrams", "p_lp": "logprob_e6"}
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bigrams": pc.cast(batch.column("n_bigrams"), pa.int64()),
                "logprob_e6": pc.cast(batch.column("logprob_e6"), pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def corpus_prep(
    sf_dir: str, budget: int = 512, n_ranges: int = 256,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """End-to-end training-corpus preparation: quality filter → exact
    dedup → sequence packing, composed as ONE streaming pipeline — the
    canonical pretraining-data chain, demonstrating that the engine's
    operators fuse without materializing intermediates.

    Stage shapes (each inherits its standalone operator's 100 TB
    discipline):

    1. quality+digest (shuffle-free ``map_batches``): the
       :func:`quality_filter` integer predicates decide keep/drop, and
       surviving rows emit only (doc_id, h1, h2, n_tokens) — 32 bytes —
       so document text NEVER leaves stage 1.
    2. exact dedup (one hash exchange on the 128-bit digest,
       :func:`dedup_exact_hashed` semantics): per partition a
       (h1, h2, doc_id) sort keeps each text's min doc_id.
    3. packing (the :func:`seq_pack` distributed scan): per-range token
       totals → driver cumsum of ``n_ranges`` bases → per-range local
       prefix scan.

    Output: (doc_id, example_id, tok_offset) over the cleaned corpus."""
    import polars as pl
    import pyarrow.parquet as pq

    from .partition import map_key_partitions, run_starts

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    span = max(1, -(-n_docs // n_ranges))

    def stage_a(batch: pa.Table) -> pa.Table:
        n = len(batch)
        codes, row, counts, _ = _word_codes(batch)
        top_word, _ = _run_top_and_unique(row, codes, n)
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_chars = np.asarray(pc.utf8_length(text), dtype=np.int64)
        n_alpha = np.asarray(
            pc.count_substring_regex(text, "[A-Za-z]"), dtype=np.int64
        )
        keep = ~(
            (counts < 12) | (4 * top_word > counts) | (10 * n_alpha < 7 * n_chars)
        )
        sub = text.filter(pa.array(keep))
        s = pl.Series("t", sub)
        h1 = s.hash(seed=0x9E3779B9).to_numpy().view(np.int64)
        h2 = s.hash(seed=0x85EBCA6B).to_numpy().view(np.int64)
        n_tok = np.asarray(
            pc.count_substring_regex(sub, r"\S+"), dtype=np.int64
        )
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "h1": pa.array(h1),
                "h2": pa.array(h2),
                "n_tokens": pa.array(n_tok),
            }
        )

    rows = (
        _docs(sf_dir)
        .select_columns(["doc_id", "text"])
        .map_batches(stage_a, batch_format="pyarrow")
    )

    def winners(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "range_id": pa.array([], type=pa.int64()),
                }
            )
        h1 = tbl.column("h1").to_numpy(zero_copy_only=False)
        h2 = tbl.column("h2").to_numpy(zero_copy_only=False)
        doc = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        ntk = tbl.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, h2, h1))
        h1, h2, doc, ntk = h1[order], h2[order], doc[order], ntk[order]
        first = run_starts(h1, h2)
        doc, ntk = doc[first], ntk[first]
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "n_tokens": pa.array(ntk),
                "range_id": pa.array(doc // span),
            }
        )

    # fixed-width survivor rows consumed twice (range totals + the final
    # per-range scan) — without the checkpoint the whole quality+dedup
    # upstream (stage_a over every document plus the dedup exchange)
    # executes twice
    surv = map_key_partitions(
        rows, ["h1", "h2"], winners, num_partitions
    ).materialize()

    totals = surv.groupby("range_id").sum("n_tokens")
    trows = totals.take_all()  # bounded: n_ranges rows
    rid = np.array([r["range_id"] for r in trows], dtype=np.int64)
    tot = np.array([r["sum(n_tokens)"] for r in trows], dtype=np.int64)
    order = np.argsort(rid)
    rid, tot = rid[order], tot[order]
    bases = np.concatenate([[0], np.cumsum(tot)[:-1]])
    base_of = dict(zip(rid.tolist(), bases.tolist()))

    def scan(group: pa.Table) -> pa.Table:
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        ntk = group.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.argsort(doc)
        doc, ntk = doc[order], ntk[order]
        base = base_of[int(group.column("range_id")[0].as_py())]
        prefix = base + np.concatenate([[0], np.cumsum(ntk)[:-1]])
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "example_id": pa.array(prefix // budget),
                "tok_offset": pa.array(prefix % budget),
            }
        )

    return surv.groupby("range_id").map_groups(scan, batch_format="pyarrow")


def source_contamination(
    sf_dir: str, k: int = 8, num_partitions: int = 64
) -> "ray.data.Dataset":
    """Cross-source contamination matrix: for every pair of sources, the
    number of DISTINCT ``k``-word chunks they share — the audit that tells
    you which corpus slices leak into which (mirror-site detection, eval
    bleed between subsets) before mixing them into a training run.

    Scale shape: stage 1 shrinks each batch to distinct (source, chunk
    128-bit hash) rows (chunk keys are :func:`chunk_dedup`'s polynomial
    word-hash combine — text never shuffles); one hash exchange on the
    chunk key co-locates each chunk's source set; inside a partition a
    (h, source) sort + shift-join enumerates each chunk run's source
    pairs vectorized (the shift loop is bounded by the DISTINCT source
    count of a run, never row count); partials pre-aggregate so the final
    exchange carries only the bounded source×source matrix.

    Output: (src_a, src_b, n_shared_chunks) with src_a < src_b."""
    import polars as pl

    from .partition import map_key_partitions, run_starts

    P1 = np.uint64(0x100000001B3)
    P2 = np.uint64(0x9E3779B97F4A7C15)

    def explode(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pc.split_pattern(text, " ")
        flat = words.values
        offs = np.asarray(words.offsets).astype(np.int64)
        counts = np.diff(offs)
        src = batch.column("source").to_numpy(zero_copy_only=False)
        n_chunks = counts // k
        pos_in_doc = np.arange(len(flat), dtype=np.int64) - np.repeat(
            offs[:-1], counts
        )
        keep = pos_in_doc < np.repeat(n_chunks * k, counts)
        s = pl.Series("w", flat)
        w1 = s.hash(seed=0x9E3779B9).to_numpy()[keep].reshape(-1, k)
        w2 = s.hash(seed=0x85EBCA6B).to_numpy()[keep].reshape(-1, k)
        h1 = np.zeros(len(w1), dtype=np.uint64)
        h2 = np.zeros(len(w2), dtype=np.uint64)
        for j in range(k):
            h1 = h1 * P1 + w1[:, j]
            h2 = h2 * P2 + w2[:, j]
        chunk_src = np.repeat(src, n_chunks)
        t = pa.table(
            {
                "h1": pa.array(h1.view(np.int64)),
                "h2": pa.array(h2.view(np.int64)),
                "source": pa.array(chunk_src),
            }
        )
        return t.group_by(["h1", "h2", "source"]).aggregate([])

    rows = (
        _docs(sf_dir)
        .select_columns(["source", "text"])
        .map_batches(explode, batch_format="pyarrow")
    )

    def pair_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src_a": pa.array([], type=pa.string()),
                "src_b": pa.array([], type=pa.string()),
                "p_n": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        h1 = tbl.column("h1").to_numpy(zero_copy_only=False)
        h2 = tbl.column("h2").to_numpy(zero_copy_only=False)
        src = tbl.column("source").to_numpy(zero_copy_only=False)
        srcs, code = np.unique(src, return_inverse=True)
        order = np.lexsort((code, h2, h1))
        h1, h2, code = h1[order], h2[order], code[order]
        # cross-batch duplicates of (chunk, source) collapse here
        first = run_starts(h1, h2, code)
        h1, h2, code = h1[first], h2[first], code[first]
        run_id = np.cumsum(run_starts(h1, h2)) - 1
        n_src = len(srcs)
        pair_counts = np.zeros((n_src, n_src), dtype=np.int64)
        # enumerate pairs by shift: sources within a run are distinct and
        # sorted, so run length ≤ n_src — the loop is bounded by the
        # SOURCE CARDINALITY, not by rows
        for shift in range(1, n_src):
            same = run_id[shift:] == run_id[:-shift]
            a = code[:-shift][same]
            b = code[shift:][same]
            np.add.at(pair_counts, (a, b), 1)
        ia, ib = np.nonzero(pair_counts)
        if len(ia) == 0:
            return empty
        return pa.table(
            {
                "src_a": pa.array(srcs[ia]),
                "src_b": pa.array(srcs[ib]),
                "p_n": pa.array(pair_counts[ia, ib]),
            }
        )

    pairs = map_key_partitions(rows, ["h1", "h2"], pair_part, num_partitions)

    merged = pairs.groupby(["src_a", "src_b"]).aggregate(
        ray.data.aggregate.Sum("p_n", alias_name="n_shared_chunks")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src_a": batch.column("src_a"),
                "src_b": batch.column("src_b"),
                "n_shared_chunks": pc.cast(
                    batch.column("n_shared_chunks"), pa.int64()
                ),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def bpe_merge_candidates(sf_dir: str, top_n: int = 20) -> "ray.data.Dataset":
    """First iteration of BPE vocabulary training: count adjacent
    byte-pair occurrences inside words across the corpus and rank the
    top merge candidates — the statistic a GPT-2-style byte-level BPE
    trainer computes before every merge.

    Scale shape: shuffle-free until the final bounded rollup — each batch
    dedups its words (pair counts are additive over occurrences, so the
    per-unique-word pair profile multiplies by the batch frequency), the
    pair extraction is one ``np.frombuffer`` pass over the
    separator-joined word bytes (no per-word Python), and the per-batch
    partial is at most alphabet² rows.  The groupby therefore carries a
    bounded pair space, and the top-k sorts a tiny aggregate.

    Output: (pair, n, rank) for the ``top_n`` candidates (byte pairs
    rendered as 2-char strings; corpus is ASCII so byte==char — the
    DuckDB oracle uses 2-char substrings)."""

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ")
        words = toks.flatten().to_numpy(zero_copy_only=False)
        words = words[words != ""]
        if len(words) == 0:
            return pa.table(
                {
                    "pair": pa.array([], type=pa.string()),
                    "p_n": pa.array([], type=pa.int64()),
                }
            )
        uw, freq = np.unique(words, return_counts=True)
        joined = "\x00".join(uw.tolist()).encode("utf-8")
        b = np.frombuffer(joined, dtype=np.uint8)
        # byte length per unique word (bounded by batch vocab, not rows)
        blens = np.array([len(w.encode("utf-8")) for w in uw.tolist()])
        word_of_byte = np.repeat(
            np.arange(len(uw), dtype=np.int64), blens + 1
        )[: len(b)]
        sep = b == 0
        valid = (~sep[:-1]) & (~sep[1:]) & (
            word_of_byte[:-1] == word_of_byte[1:]
        )
        key = (
            b[:-1][valid].astype(np.int64) * 256 + b[1:][valid].astype(np.int64)
        )
        w_of_pair = word_of_byte[:-1][valid]
        # weight each unique word's pairs by its batch frequency
        weight = freq[w_of_pair].astype(np.int64)
        order = np.argsort(key, kind="stable")
        key_s, weight_s = key[order], weight[order]
        first = np.concatenate([[True], key_s[1:] != key_s[:-1]])
        idx = np.flatnonzero(first)
        sums = np.add.reduceat(weight_s, idx)
        ukey = key_s[idx]
        pair_str = [
            bytes([int(kk) // 256, int(kk) % 256]).decode("utf-8")
            for kk in ukey
        ]  # bounded: ≤ alphabet² distinct pairs per batch
        return pa.table(
            {
                "pair": pa.array(pair_str, type=pa.string()),
                "p_n": pa.array(sums),
            }
        )

    merged = (
        _docs(sf_dir)
        .select_columns(["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pair": batch.column("pair"),
                "n": pc.cast(batch.column("n"), pa.int64()),
            }
        )

    ranked = (
        merged.map_batches(finish, batch_format="pyarrow")
        .sort(["n", "pair"], descending=[True, False])
        .limit(top_n)
        .repartition(1)  # bounded: exactly top_n rows
    )

    def add_rank(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        pairs = batch.column("pair").to_numpy(zero_copy_only=False)
        code = np.unique(pairs, return_inverse=True)[1]
        order = np.lexsort((code, -n))
        rank = np.empty(len(n), dtype=np.int64)
        rank[order] = np.arange(1, len(n) + 1)
        return pa.table(
            {
                "pair": batch.column("pair"),
                "n": batch.column("n"),
                "rank": pa.array(rank),
            }
        )

    return ranked.map_batches(
        add_rank, batch_format="pyarrow", batch_size=None
    )


def winnow_fingerprints(
    sf_dir: str, k: int = 3, w: int = 4
) -> "ray.data.Dataset":
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): slide a ``w``-window over each document's ``k``-gram
    stream and select each window's minimum gram (rightmost on ties),
    deduplicating selections — the guaranteed-coverage sparse fingerprint
    set used for plagiarism/near-dup detection at document scale.

    This variant orders grams LEXICOGRAPHICALLY (any total order
    satisfies the winnowing guarantee), which makes the selection — not
    just the counts — exactly reproducible in the DuckDB oracle.

    Scale shape: entirely shuffle-free — one ``map_batches`` pass;
    per-batch grams dictionary-encode once (``np.unique`` codes preserve
    lexicographic order), the window minimum is a vectorized
    ``sliding_window_view`` reduction (w is a small constant), and only
    the selected (doc_id, pos, gram) rows leave the stage.

    Output: (doc_id, pos, gram) — pos is the 0-based k-gram index."""
    from numpy.lib.stride_tricks import sliding_window_view

    def select(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "pos": pa.array([], type=pa.int64()),
                "gram": pa.array([], type=pa.string()),
            }
        )
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ")
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        offs = np.asarray(toks.offsets).astype(np.int64)
        row_of = np.repeat(np.arange(len(batch)), np.diff(offs))
        keep = flat != ""
        words, row_of = flat[keep], row_of[keep]
        if len(words) < k:
            return empty
        # k-gram strings via stacked shifted joins (vectorized join of k
        # columns), valid where all k tokens share a row
        ws = words.astype(str)
        cols = [ws[i : len(ws) - (k - 1) + i] for i in range(k)]
        valid = row_of[: len(words) - (k - 1)] == row_of[k - 1 :]
        grams = cols[0]
        for c in cols[1:]:
            grams = np.char.add(np.char.add(grams, " "), c)
        grams = grams[valid]
        grow = row_of[: len(words) - (k - 1)][valid]
        if len(grams) == 0:
            return empty
        # per-doc gram position
        starts = np.flatnonzero(
            np.concatenate([[True], grow[1:] != grow[:-1]])
        )
        run_len = np.diff(np.append(starts, len(grow)))
        pos = np.arange(len(grow)) - np.repeat(starts, run_len)
        # lexicographic codes (np.unique sorts) — order-isomorphic to the
        # gram strings, so window minima match the SQL MIN(gram)
        _, codes = np.unique(grams.astype(str), return_inverse=True)
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n_g = len(codes)
        selected = np.zeros(n_g, dtype=bool)
        # full windows, whole batch at once: window q valid iff grams q and
        # q+w-1 belong to the same doc
        if n_g >= w:
            wins = sliding_window_view(codes, w)
            valid_w = grow[: n_g - w + 1] == grow[w - 1 :]
            rev_arg = wins[:, ::-1].argmin(axis=1)
            sel = np.arange(len(wins)) + (w - 1) - rev_arg
            selected[sel[valid_w]] = True
        # short docs (fewer grams than the window): one whole-doc window —
        # rightmost gram equal to the run minimum
        short = run_len < w
        if short.any():
            run_min = np.minimum.reduceat(codes, starts)
            run_of = np.repeat(np.arange(len(starts)), run_len)
            is_min = codes == run_min[run_of]
            idx = np.where(is_min, np.arange(n_g), -1)
            rightmost = np.maximum.reduceat(idx, starts)
            selected[rightmost[short]] = True
        sel_idx = np.flatnonzero(selected)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[grow[sel_idx]]),
                "pos": pa.array(pos[sel_idx].astype(np.int64)),
                "gram": pa.array(
                    grams[sel_idx].astype(object), type=pa.string()
                ),
            }
        )

    return (
        _docs(sf_dir)
        .select_columns(["doc_id", "text"])
        .map_batches(select, batch_format="pyarrow")
    )


def jaccard_word_pairs(
    sf_dir: str, k: int = 3, max_df: int = 50, tau_e4: int = 5000,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Exact word-shingle Jaccard near-duplicate pairs, fully oracled:
    two documents pair when the Jaccard similarity of their word
    ``k``-gram sets reaches ``tau_e4``/1e4 — computed over sets with
    stop-shingles removed (grams appearing in more than ``max_df`` docs
    are excluded from EVERY set, the standard guard that keeps a
    boilerplate shingle from generating quadratic candidate pairs).

    Scale shape — four fixed-width exchanges, text never shuffles:

    1. per-batch distinct (gram-hash128, doc_id) rows;
    2. ONE gram-key exchange where each gram's run length IS its
       document frequency: runs past ``max_df`` drop (stop-shingles),
       surviving runs emit BOTH per-gram doc pairs (shift-join, bounded
       by ``max_df``, pre-aggregated per partition) and per-doc kept-gram
       size partials — one exchange feeds both relations;
    3. bounded rollups: pair intersections and doc set sizes;
    4. two doc-keyed tag-union exchanges attach |A| and |B|; the
       threshold evaluates in exact integers
       (``inter · 1e4 ≥ tau · (|A|+|B|−inter)``).

    Output: (doc_a, doc_b, inter, jaccard_e4) with doc_a < doc_b."""
    import polars as pl

    from .partition import map_key_partitions, run_starts

    P1 = np.uint64(0x100000001B3)
    P2 = np.uint64(0x9E3779B97F4A7C15)

    def explode(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ")
        flat = toks.flatten()
        offs = np.asarray(toks.offsets).astype(np.int64)
        row_of = np.repeat(np.arange(len(batch)), np.diff(offs))
        keep_arr = pc.not_equal(flat, "")
        words = flat.filter(keep_arr)  # stays Arrow for the zero-copy hash
        row_of = row_of[keep_arr.to_numpy(zero_copy_only=False)]
        empty = pa.table(
            {
                "h1": pa.array([], type=pa.int64()),
                "h2": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
            }
        )
        if len(words) < k:
            return empty
        s = pl.from_arrow(words)
        w1 = s.hash(seed=0x9E3779B9).to_numpy()
        w2 = s.hash(seed=0x85EBCA6B).to_numpy()
        m = len(words) - (k - 1)
        valid = row_of[:m] == row_of[k - 1 :]
        h1 = np.zeros(m, dtype=np.uint64)
        h2 = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            h1 = h1 * P1 + w1[j : m + j]
            h2 = h2 * P2 + w2[j : m + j]
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        doc = doc_ids[row_of[:m][valid]]
        h1, h2 = h1[valid].view(np.int64), h2[valid].view(np.int64)
        t = pa.table(
            {"h1": pa.array(h1), "h2": pa.array(h2), "doc_id": pa.array(doc)}
        )
        return t.group_by(["h1", "h2", "doc_id"]).aggregate([])

    grams = (
        _docs(sf_dir)
        .select_columns(["doc_id", "text"])
        .map_batches(explode, batch_format="pyarrow")
    )

    def pairs_and_sizes(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "is_pair": pa.array([], type=pa.int8()),
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        h1 = tbl.column("h1").to_numpy(zero_copy_only=False)
        h2 = tbl.column("h2").to_numpy(zero_copy_only=False)
        doc = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, h2, h1))
        h1, h2, doc = h1[order], h2[order], doc[order]
        # cross-batch (gram, doc) duplicates collapse
        first = run_starts(h1, h2, doc)
        h1, h2, doc = h1[first], h2[first], doc[first]
        gstart = run_starts(h1, h2)
        run_id = np.cumsum(gstart) - 1
        starts_idx = np.flatnonzero(gstart)
        run_len = np.diff(np.append(starts_idx, len(doc)))
        keep_run = run_len <= max_df  # stop-shingle guard
        keep_row = np.repeat(keep_run, run_len)
        doc_k, run_k = doc[keep_row], run_id[keep_row]
        parts = []
        # per-doc kept-gram size partials
        ud, cnt = np.unique(doc_k, return_counts=True)
        parts.append(
            pa.table(
                {
                    "is_pair": pa.array(np.zeros(len(ud), dtype=np.int8)),
                    "doc_a": pa.array(ud),
                    "doc_b": pa.array(np.zeros(len(ud), dtype=np.int64)),
                    "cnt": pa.array(cnt.astype(np.int64)),
                }
            )
        )
        # per-gram doc pairs via shift-join (docs sorted within a run)
        max_run = int(run_len[keep_run].max()) if keep_run.any() else 0
        pa_l, pb_l = [], []
        for shift in range(1, max_run):
            same = run_k[shift:] == run_k[:-shift]
            pa_l.append(doc_k[:-shift][same])
            pb_l.append(doc_k[shift:][same])
        if pa_l:
            da = np.concatenate(pa_l)
            db = np.concatenate(pb_l)
            o2 = np.lexsort((db, da))
            da, db = da[o2], db[o2]
            f2 = run_starts(da, db)
            i2 = np.flatnonzero(f2)
            inter = np.diff(np.append(i2, len(da)))
            parts.append(
                pa.table(
                    {
                        "is_pair": pa.array(np.ones(len(i2), dtype=np.int8)),
                        "doc_a": pa.array(da[i2]),
                        "doc_b": pa.array(db[i2]),
                        "cnt": pa.array(inter.astype(np.int64)),
                    }
                )
            )
        return pa.concat_tables(parts)

    # Downstream is ONE streamed scan of the partial rows: pair partials
    # replicate to BOTH doc keys (side 0 carries the inter partial, side 2
    # only flags that the pair needs |B|), size partials keep their doc
    # key; a single doc-key exchange then co-locates every doc's size
    # partials with every pair half keyed by it, so the partition fn can
    # total sizes per doc AND pair inters per (a,b) — all side-0 partials
    # of a pair share key=doc_a — and attach the key doc's size in one
    # segmented pass.  A final bounded pair groupby sums the two halves
    # and the threshold evaluates in exact integers.  (Earlier shape ran
    # two groupbys + two tagged sort exchanges and scanned the partials
    # three times; this is one exchange + one groupby, one scan.)
    both = map_key_partitions(
        grams, ["h1", "h2"], pairs_and_sizes, num_partitions
    )

    def tag_rows(batch: pa.Table) -> pa.Table:
        is_pair = batch.column("is_pair").to_numpy(zero_copy_only=False)
        da = batch.column("doc_a").to_numpy(zero_copy_only=False)
        db = batch.column("doc_b").to_numpy(zero_copy_only=False)
        cnt = batch.column("cnt").to_numpy(zero_copy_only=False)
        sz = is_pair == 0
        pr = ~sz
        n_s, n_p = int(sz.sum()), int(pr.sum())
        key = np.concatenate([da[sz], da[pr], db[pr]])
        side = np.concatenate(
            [
                np.ones(n_s, dtype=np.int8),
                np.zeros(n_p, dtype=np.int8),
                np.full(n_p, 2, dtype=np.int8),
            ]
        )
        doc_a = np.concatenate([np.zeros(n_s, dtype=np.int64), da[pr], da[pr]])
        doc_b = np.concatenate([np.zeros(n_s, dtype=np.int64), db[pr], db[pr]])
        val = np.concatenate([cnt[sz], cnt[pr], cnt[pr]])
        return pa.table(
            {
                "key": pa.array(key),
                "side": pa.array(side),
                "doc_a": pa.array(doc_a),
                "doc_b": pa.array(doc_b),
                "val": pa.array(val),
            }
        )

    def attach_sizes(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "inter": pa.array([], type=pa.int64()),
                "nsz": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        key = tbl.column("key").to_numpy(zero_copy_only=False)
        da = tbl.column("doc_a").to_numpy(zero_copy_only=False)
        db = tbl.column("doc_b").to_numpy(zero_copy_only=False)
        val = tbl.column("val").to_numpy(zero_copy_only=False)
        smask = side == 1
        skey, sval = key[smask], val[smask]
        o = np.argsort(skey, kind="stable")
        skey, sval = skey[o], sval[o]
        st = run_starts(skey)
        idx = np.flatnonzero(st)
        usz_key = skey[idx]
        usz = (
            np.add.reduceat(sval, idx)
            if len(idx)
            else np.array([], dtype=np.int64)
        )
        parts = []
        for s_id, carries_inter in ((0, True), (2, False)):
            m = side == s_id
            if not m.any():
                continue
            a, b, v, kk = da[m], db[m], val[m], key[m]
            o2 = np.lexsort((b, a))
            a, b, v, kk = a[o2], b[o2], v[o2], kk[o2]
            i2 = np.flatnonzero(run_starts(a, b))
            inter = np.add.reduceat(v, i2)
            # every pair doc has kept grams, hence a co-located size row
            szk = usz[np.searchsorted(usz_key, kk[i2])]
            parts.append(
                pa.table(
                    {
                        "doc_a": pa.array(a[i2]),
                        "doc_b": pa.array(b[i2]),
                        "inter": pa.array(
                            inter if carries_inter
                            else np.zeros(len(i2), dtype=np.int64)
                        ),
                        "nsz": pa.array(szk),
                    }
                )
            )
        return pa.concat_tables(parts) if parts else empty

    halves = map_key_partitions(
        both.map_batches(tag_rows, batch_format="pyarrow"),
        ["key"],
        attach_sizes,
        num_partitions,
    )
    from .partition import sum_by_key

    merged = sum_by_key(
        halves, ["doc_a", "doc_b"], {"inter": "inter", "nsz": "nsz"}
    )

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "inter": pa.array([], type=pa.int64()),
                "jaccard_e4": pa.array([], type=pa.int64()),
            }
        )
        if len(batch) == 0:
            return empty
        inter = pc.cast(batch.column("inter"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        union = (
            pc.cast(batch.column("nsz"), pa.int64()).to_numpy(
                zero_copy_only=False
            )
            - inter
        )
        keep = inter * 10000 >= tau_e4 * union
        return pa.table(
            {
                "doc_a": batch.column("doc_a").filter(pa.array(keep)),
                "doc_b": batch.column("doc_b").filter(pa.array(keep)),
                "inter": pa.array(inter[keep]),
                "jaccard_e4": pa.array(
                    inter[keep] * 10000 // np.maximum(union[keep], 1)
                ),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def token_budget_mix(
    sf_dir: str, budget: int = 2000, n_ranges: int = 64
) -> "ray.data.Dataset":
    """Token-budget corpus mixing (the Dolma/Pile recipe): walk each
    source's documents in doc_id order and keep documents until the
    source's token budget is exhausted — every kept doc knows its running
    token offset within its source.

    Scale shape: a PER-KEY distributed scan (the grouped generalization
    of :func:`seq_pack`'s global scan): stage 1 emits fixed-width
    (doc_id, source, n_tokens, range_id) rows; a combiner aggregate
    produces per-(source, range) token totals — ``sources × n_ranges``
    rows, bounded — whose per-source cumsum on the driver gives every
    range its base offset; ONE hash exchange on (source, range) then
    lets each range scan locally and add its broadcast base.  Text never
    leaves stage 1; no stage sees more than one range of one source.

    Output: (doc_id, source, tok_prefix, keep)."""
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    span = max(1, -(-n_docs // n_ranges))

    def counts(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n_tok = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "source": batch.column("source"),
                "n_tokens": n_tok,
                "range_id": pa.array(doc // span),
            }
        )

    rows = (
        _docs(sf_dir)
        .select_columns(["doc_id", "source", "text"])
        .map_batches(counts, batch_format="pyarrow")
        .materialize()  # fixed-width rows consumed twice (totals + the
        # range shuffle) — without this the text tokenization runs twice
    )

    totals = rows.groupby(["source", "range_id"]).sum("n_tokens")
    trows = totals.take_all()  # bounded: sources × n_ranges
    per_src: dict = {}
    for r in trows:
        per_src.setdefault(r["source"], []).append(
            (int(r["range_id"]), int(r["sum(n_tokens)"]))
        )
    base_of: dict = {}
    for src, lst in per_src.items():
        lst.sort()
        acc = 0
        for rid, tot in lst:
            base_of[(src, rid)] = acc
            acc += tot

    from .partition import map_key_partitions, run_starts

    def scan(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "source": pa.array([], type=pa.string()),
                    "tok_prefix": pa.array([], type=pa.int64()),
                    "keep": pa.array([], type=pa.int64()),
                }
            )
        doc = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        src = tbl.column("source").to_numpy(zero_copy_only=False)
        ntk = tbl.column("n_tokens").to_numpy(zero_copy_only=False)
        rid = tbl.column("range_id").to_numpy(zero_copy_only=False)
        code = np.unique(src, return_inverse=True)[1]
        order = np.lexsort((doc, rid, code))
        doc, src, ntk, rid, code = (
            doc[order], src[order], ntk[order], rid[order], code[order],
        )
        starts = np.flatnonzero(run_starts(code, rid))
        run_len = np.diff(np.append(starts, len(doc)))
        # per-(source, range) local prefix + broadcast base: padded
        # per-run cumsum (batch-size-invariant per repo rules)
        csum = np.cumsum(ntk)
        run_base0 = np.repeat(csum[starts] - ntk[starts], run_len)
        local_pre = csum - ntk - run_base0
        bases = np.array(
            [base_of.get((src[s], int(rid[s])), 0) for s in starts],
            dtype=np.int64,
        )  # bounded: one lookup per (source, range) run, not per row
        prefix = local_pre + np.repeat(bases, run_len)
        keep = (prefix < budget).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "source": pa.array(src.astype(object), type=pa.string()),
                "tok_prefix": pa.array(prefix.astype(np.int64)),
                "keep": pa.array(keep),
            }
        )

    return map_key_partitions(rows, ["source", "range_id"], scan)


def write_corpus_prep(
    sf_dir: str, out_dir: str, budget: int = 512, n_ranges: int = 256,
    part_ranges: int = 16,
) -> dict:
    """Resumable partitioned sink for :func:`corpus_prep` — the text-side
    twin of the seed pipeline's lineage discipline (state/lineage.py):
    packed-example rows land as one parquet per doc-id-range partition via
    tmp+rename, each paired with a lineage record carrying an
    order-independent content fingerprint; a killed run resumes by
    rerunning the same command (completed partitions skip; a partition
    whose INPUT changed — fingerprint mismatch — is invalidated and
    rewritten, never silently skipped).  ``_manifest.json`` is the commit
    point.

    Returns the manifest dict."""
    import polars as pl
    import pyarrow.parquet as pq

    from ..state.lineage import PartitionWriter, finalize_manifest

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    span = max(1, -(-n_docs // part_ranges))

    rows = corpus_prep(sf_dir, budget=budget, n_ranges=n_ranges)

    def add_part(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.append_column("part", pa.array(doc // span))

    writer = PartitionWriter(out_dir)

    def _fingerprint(tbl: pa.Table) -> str:
        h = (
            pl.from_arrow(tbl.select(["doc_id", "example_id", "tok_offset"]))
            .hash_rows(seed=0xC0FFEE)
            .to_numpy()
        )
        return f"{int(np.sum(h, dtype=np.uint64)):016x}"

    def write_part(group: pa.Table) -> pa.Table:
        pid = f"p{int(group.column('part')[0].as_py()):05d}"
        rows_in = len(group)
        out = group.drop_columns(["part"]).sort_by("doc_id")
        fingerprint = _fingerprint(out)
        if writer.is_done(pid):
            if writer.fingerprint_matches(pid, fingerprint):
                rec = writer.record(pid, rows_in, 0, 0, "skipped", fingerprint)
            else:
                writer.invalidate(pid)  # stale input → rewrite
                rec = writer.write(pid, out, rows_in, fingerprint)
        else:
            rec = writer.write(pid, out, rows_in, fingerprint)
        return pa.table(
            {
                "partition_id": pa.array([rec["partition_id"]]),
                "status": pa.array([rec["status"]]),
                "rows_out": pa.array([int(rec.get("rows_out", 0))], type=pa.int64()),
            }
        )

    # bounded groups (part_ranges partitions) → map_groups is fine here
    recs = (
        rows.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(write_part, batch_format="pyarrow")
    )
    recs.count()  # drive the writes
    return finalize_manifest(out_dir)


def term_scrub(sf_dir: str) -> "ray.data.Dataset":
    """Pattern scrubbing (the PII-redaction shape on this synthetic
    corpus): count and remove a term blocklist from every document and
    report the per-source damage — the vectorized redaction pass every
    training-data pipeline runs before tokenization.

    Both the engine (``pyarrow.compute`` count/replace kernels) and the
    DuckDB oracle evaluate the same RE2 regex, so the counts and the
    post-scrub lengths match exactly.  Shape: pure map + bounded
    per-source combine — no shuffle of text, no Python in the loop.

    Output: (source, n_docs, n_hits, scrubbed_chars)."""
    PATTERN = r"\b(the|a|customer)\b"

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        hits = pc.cast(
            pc.count_substring_regex(text, PATTERN), pa.int64()
        )
        scrubbed = pc.replace_substring_regex(text, PATTERN, "")
        left = pc.cast(pc.utf8_length(scrubbed), pa.int64())
        t = pa.table(
            {
                "source": batch.column("source"),
                "hits": hits,
                "left": left,
            }
        )
        g = t.group_by(["source"]).aggregate(
            [("hits", "sum"), ("left", "sum"), ("hits", "count")]
        )
        return pa.table(
            {
                "source": g.column("source"),
                "p_hits": g.column("hits_sum"),
                "p_left": g.column("left_sum"),
                "p_docs": pc.cast(g.column("hits_count"), pa.int64()),
            }
        )

    merged = (
        _docs(sf_dir)
        .select_columns(["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            ray.data.aggregate.Sum("p_docs", alias_name="n_docs"),
            ray.data.aggregate.Sum("p_hits", alias_name="n_hits"),
            ray.data.aggregate.Sum("p_left", alias_name="scrubbed_chars"),
        )
    )
    return merged.map_batches(
        lambda b: pa.table(
            {
                "source": b.column("source"),
                "n_docs": pc.cast(b.column("n_docs"), pa.int64()),
                "n_hits": pc.cast(b.column("n_hits"), pa.int64()),
                "scrubbed_chars": pc.cast(
                    b.column("scrubbed_chars"), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


def quality_top_percent(sf_dir: str, pct: int = 90) -> "ray.data.Dataset":
    """Keep only documents above the EXACT global ``pct``-th percentile
    of an integer quality score (token count) — the global-threshold
    selection step of a filtered-pretraining pipeline, computed without
    sorting the corpus.

    Scale shape: pass 1 builds a distributed HISTOGRAM of the bounded
    integer score domain (per-batch bincount partials → one grouped
    exchange over |distinct scores| rows); the driver reduces the tiny
    histogram to the exact threshold — the smallest score t with
    ``count(score <= t) >= ceil(pct/100 * N)`` — and pass 2 re-scans with
    a pure vectorized filter.  No sort, no quantile sketch, exact by
    construction (the t-digest variant exists for non-integer scores:
    :func:`osm_data_3d_tiles_ray.pipelines.events.value_quantiles_tdigest`).

    Output: (lang, n_docs, sum_tokens) per language over the kept docs."""

    def score_hist(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        tok = pc.cast(
            pc.count_substring_regex(text, r"\S+"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(tok, return_counts=True)
        return pa.table(
            {"score": pa.array(uk), "p_n": pa.array(cnt.astype(np.int64))}
        )

    hist = (
        _docs(sf_dir)
        .select_columns(["text"])
        .map_batches(score_hist, batch_format="pyarrow")
        .groupby("score")
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n"))
        .to_pandas()  # bounded: one row per distinct integer score
        .sort_values("score")
    )
    counts = hist["n"].to_numpy().astype(np.int64)
    scores = hist["score"].to_numpy().astype(np.int64)
    total = int(counts.sum())
    rank = -(-pct * total // 100)  # ceil(pct/100 * N), pure integers
    cum = np.cumsum(counts)
    thresh = int(scores[np.searchsorted(cum, rank)]) if total else 0

    def keep_partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        tok = pc.cast(
            pc.count_substring_regex(text, r"\S+"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        keep = tok > thresh
        t = pa.table(
            {
                "lang": batch.column("lang").filter(pa.array(keep)),
                "tok": pa.array(tok[keep]),
            }
        )
        g = t.group_by(["lang"]).aggregate([("tok", "sum"), ("tok", "count")])
        return pa.table(
            {
                "lang": g.column("lang"),
                "p_tok": g.column("tok_sum"),
                "p_docs": pc.cast(g.column("tok_count"), pa.int64()),
            }
        )

    merged = (
        _docs(sf_dir)
        .select_columns(["lang", "text"])
        .map_batches(keep_partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            ray.data.aggregate.Sum("p_docs", alias_name="n_docs"),
            ray.data.aggregate.Sum("p_tok", alias_name="sum_tokens"),
        )
    )
    return merged.map_batches(
        lambda b: pa.table(
            {
                "lang": b.column("lang"),
                "n_docs": pc.cast(b.column("n_docs"), pa.int64()),
                "sum_tokens": pc.cast(b.column("sum_tokens"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def lang_confusion(sf_dir: str) -> "ray.data.Dataset":
    """Language-ID confusion matrix: labeled ``lang`` × heuristic
    prediction (the :func:`lang_id` marker-argmax) with counts — the
    classifier-eval rollup a corpus-quality dashboard runs after any
    lang-ID change.

    Scale shape: prediction happens in the same vectorized batch pass as
    the count partial, so the ONLY exchange carries the bounded
    (lang × pred) matrix — never documents.

    Output: (lang, lang_pred, n_docs)."""

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lower = pc.utf8_lower(text)
        counts = {
            lang: pc.count_substring_regex(lower, rx).to_numpy(
                zero_copy_only=False
            )
            for lang, rx in _LANG_MARKERS.items()
        }
        langs = list(_LANG_MARKERS)
        stacked = np.stack([counts[la] for la in langs])
        best = np.argmax(stacked, axis=0)
        pred = np.array(langs, dtype=object)[best]
        pred[stacked.max(axis=0) == 0] = "und"
        t = pa.table(
            {
                "lang": batch.column("lang"),
                "lang_pred": pa.array(pred, type=pa.string()),
            }
        )
        g = t.group_by(["lang", "lang_pred"]).aggregate([("lang", "count")])
        return pa.table(
            {
                "lang": g.column("lang"),
                "lang_pred": g.column("lang_pred"),
                "p_n": pc.cast(g.column("lang_count"), pa.int64()),
            }
        )

    merged = (
        _docs(sf_dir)
        .select_columns(["lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "lang_pred"])
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n_docs"))
    )
    return merged.map_batches(
        lambda b: pa.table(
            {
                "lang": b.column("lang"),
                "lang_pred": b.column("lang_pred"),
                "n_docs": pc.cast(b.column("n_docs"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def class_balanced_sample(
    sf_dir: str, cap: int = 50, tag: int = 123
) -> "ray.data.Dataset":
    """Deterministic class-balanced subsample: per language, keep the
    ``cap`` documents with the smallest keyed Jenkins hash (ties →
    smallest doc_id) — the "exactly k per class" rebalancing step of a
    curriculum/mixture builder, reproducible across runs, partitionings
    and cluster sizes because the keep rule is a pure function of
    (doc_id, tag) (geom/rng.py:keyed_uniform; SQL mirror
    `_jenkins_round_sql` makes the oracle exact).

    Scale shape: top-k-by-hash is ASSOCIATIVE — every batch pre-prunes
    to its own cap smallest per lang, so the single lang-keyed exchange
    carries at most cap × langs rows per batch; the partition pass
    repeats the same selection to finish.

    Output: (doc_id, lang, h)."""
    from ..geom.rng import jenkins_mix
    from .partition import map_key_partitions

    tagmix = np.uint32((tag * 2654435761) & 0xFFFFFFFF)

    def _cap_smallest(
        did: np.ndarray, lang: np.ndarray, h: np.ndarray
    ) -> np.ndarray:
        codes, inv = np.unique(lang.astype(str), return_inverse=True)
        order = np.lexsort((did, h, inv))
        inv_s = inv[order]
        starts = np.concatenate([[True], inv_s[1:] != inv_s[:-1]])
        run_id = np.cumsum(starts) - 1
        pos = np.arange(len(inv_s)) - np.flatnonzero(starts)[run_id]
        return order[pos < cap]

    def partial(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        h = jenkins_mix(did.astype(np.uint64).astype(np.uint32) ^ tagmix)
        h = jenkins_mix(
            h ^ (did.astype(np.uint64) >> np.uint64(32)).astype(np.uint32)
        )
        keep = _cap_smallest(did, lang, h)
        return pa.table(
            {
                "doc_id": pa.array(did[keep]),
                "lang": pa.array(lang[keep].astype(str)),
                "h": pa.array(h[keep].astype(np.int64)),
            }
        )

    def finish_part(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "lang": pa.array([], type=pa.string()),
                    "h": pa.array([], type=pa.int64()),
                }
            )
        did = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        lang = tbl.column("lang").to_numpy(zero_copy_only=False)
        h = tbl.column("h").to_numpy(zero_copy_only=False)
        keep = _cap_smallest(did, lang, h)
        return pa.table(
            {
                "doc_id": pa.array(did[keep]),
                "lang": pa.array(lang[keep].astype(str)),
                "h": pa.array(h[keep]),
            }
        )

    partials = (
        _docs(sf_dir)
        .select_columns(["doc_id", "lang"])
        .map_batches(partial, batch_format="pyarrow")
    )
    return map_key_partitions(partials, ["lang"], finish_part)


# ---------------------------------------------------------------------------
# cross-document duplicated-span coverage (ExactSubstr-style signal)


def dup_span_coverage(sf_dir: str, n: int = 3) -> "ray.data.Dataset":
    """Per document: how much of it is covered by word ``n``-grams that
    occur at least twice anywhere in the corpus — the signal behind
    ExactSubstr dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): spans repeated verbatim across (or
    within) documents are memorization fuel and candidates for removal.

    Shape (the tf_idf discipline): one vectorized explode to hashed
    window rows pre-combined per (doc, gram) inside the batch; corpus
    totals are a groupby over those SAME rows keyed by the 8-byte gram
    hash; the totals attach back via ONE hash-partitioned tag-union
    join; per-doc sums finish in a bounded groupby.  The gram vocabulary
    never materializes on the driver.

    Output: (doc_id, n_windows, n_dup_windows, dup_frac_e6) — frac is
    integer-exact ``(n_dup * 1e6) // n_windows``.
    """
    from .partition import map_key_partitions

    def gram_rows(batch: pa.Table) -> pa.Table:
        g, row, _ = _hashed_ngrams(batch.column("text"), n)
        empty = pa.table(
            {
                "g": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            }
        )
        if len(g) == 0:
            return empty
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)[row]
        order = np.lexsort((g, did))
        did, g = did[order], g[order]
        first = np.ones(len(g), dtype=bool)
        first[1:] = (did[1:] != did[:-1]) | (g[1:] != g[:-1])
        idx = np.flatnonzero(first)
        cnt = np.diff(np.append(idx, len(g)))
        return pa.table(
            {
                "g": pa.array(g[first]),
                "doc_id": pa.array(did[first]),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    rows = (
        _docs(sf_dir)
        .select_columns(["doc_id", "text"])
        .map_batches(gram_rows, batch_format="pyarrow")
        .materialize()  # consumed twice: totals + attach
    )
    totals = rows.groupby("g").aggregate(
        ray.data.aggregate.Sum("cnt", alias_name="tot")
    )

    def tot_side(batch: pa.Table) -> pa.Table:
        m = len(batch)
        return pa.table(
            {
                "g": batch.column("g"),
                "side": pa.array(np.ones(m, dtype=np.int8)),
                "doc_id": pa.array(np.zeros(m, dtype=np.int64)),
                "cnt": pa.array(np.zeros(m, dtype=np.int64)),
                "tot": pc.cast(batch.column("tot"), pa.int64()),
            }
        )

    def doc_side(batch: pa.Table) -> pa.Table:
        m = len(batch)
        return pa.table(
            {
                "g": batch.column("g"),
                "side": pa.array(np.zeros(m, dtype=np.int8)),
                "doc_id": batch.column("doc_id"),
                "cnt": batch.column("cnt"),
                "tot": pa.array(np.zeros(m, dtype=np.int64)),
            }
        )

    tagged = totals.map_batches(tot_side, batch_format="pyarrow").union(
        rows.map_batches(doc_side, batch_format="pyarrow")
    )

    def attach_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "p_win": pa.array([], type=pa.int64()),
                "p_dup": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        g = tbl.column("g").to_numpy(zero_copy_only=False)
        mm, dm = side == 1, side == 0
        if not dm.any():
            return empty
        mg = g[mm]
        morder = np.argsort(mg, kind="stable")
        mg = mg[morder]
        tot = tbl.column("tot").to_numpy(zero_copy_only=False)[mm][morder]
        pos = np.searchsorted(mg, g[dm])  # every doc gram is in totals
        cnt = tbl.column("cnt").to_numpy(zero_copy_only=False)[dm]
        did = tbl.column("doc_id").to_numpy(zero_copy_only=False)[dm]
        dup = np.where(tot[pos] >= 2, cnt, 0)
        udoc, inv = np.unique(did, return_inverse=True)
        return pa.table(
            {
                "doc_id": pa.array(udoc),
                "p_win": pa.array(np.bincount(inv, weights=cnt).astype(np.int64)),
                "p_dup": pa.array(np.bincount(inv, weights=dup).astype(np.int64)),
            }
        )

    merged = map_key_partitions(tagged, ["g"], attach_part).groupby(
        "doc_id"
    ).aggregate(
        ray.data.aggregate.Sum("p_win", alias_name="n_windows"),
        ray.data.aggregate.Sum("p_dup", alias_name="n_dup_windows"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        w = pc.cast(batch.column("n_windows"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        d = pc.cast(batch.column("n_dup_windows"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_windows": pa.array(w),
                "n_dup_windows": pa.array(d),
                "dup_frac_e6": pa.array((d * 1_000_000) // w),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# distributed global rank (zipWithIndex) — curriculum ordering


def curriculum_rank(sf_dir: str) -> "ray.data.Dataset":
    """Global curriculum rank: every document's exact 1-based position
    under ``ORDER BY n_chars DESC, doc_id`` — the distributed
    zipWithIndex primitive Ray Data's public API lacks, built as two
    bounded passes instead of a full sort:

    1. histogram the sort key (distinct doc LENGTHS — bounded by max
       length, not corpus size) → per-length base rank on the driver;
    2. one hash exchange keyed n_chars co-locates each length's docs;
       within a partition one lexsort + run-boundary offsets finish the
       tie-break — no global all-to-all sort of the corpus.

    Output: (doc_id, n_chars, rank).
    """
    from .partition import map_key_partitions

    docs = _docs(sf_dir).select_columns(["doc_id", "n_chars"])

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = batch.column("n_chars").to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(v, return_counts=True)
        return pa.table(
            {"n_chars": pa.array(uk), "p_n": pa.array(cnt.astype(np.int64))}
        )

    hist = (
        docs.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("n_chars")
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="n"))
        .to_pandas()  # bounded: one row per distinct length
        .sort_values("n_chars", ascending=False)
    )
    lengths = hist["n_chars"].to_numpy().astype(np.int64)
    counts = hist["n"].to_numpy().astype(np.int64)
    base = np.concatenate([[0], np.cumsum(counts)[:-1]])
    asc = np.argsort(lengths)
    lengths_asc, base_asc = lengths[asc], base[asc]

    def rank_part(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_chars": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                }
            )
        nc = tbl.column("n_chars").to_numpy(zero_copy_only=False)
        did = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, -nc))
        nc, did = nc[order], did[order]
        brk = np.ones(len(nc), dtype=bool)
        brk[1:] = nc[1:] != nc[:-1]
        run_start = np.flatnonzero(brk)
        offset = np.arange(len(nc)) - np.repeat(
            run_start, np.diff(np.append(run_start, len(nc)))
        )
        b = base_asc[np.searchsorted(lengths_asc, nc)]
        return pa.table(
            {
                "doc_id": pa.array(did),
                "n_chars": pa.array(nc),
                "rank": pa.array(b + offset + 1),
            }
        )

    return map_key_partitions(docs, ["n_chars"], rank_part)


# ---------------------------------------------------------------------------
# per-source token distribution entropy


def source_token_entropy(sf_dir: str) -> "ray.data.Dataset":
    """Unigram-distribution statistics per source: token count, distinct
    vocabulary, and the Shannon-entropy components — the corpus curator's
    "how diverse is this source" diagnostic (H = ln T − (Σ c·ln c)/T,
    derivable from the exact integer outputs).

    Shape: one explode pass pre-combined per batch, ONE groupby keyed
    (term_hash, source) for the counts, then a bounded per-source
    groupby.  Per-term contributions floor to integer micro-nats BEFORE
    the sum (repo float rule), so the oracle matches exactly and the
    combine tree is association-free.

    Output: (source, n_tok, n_vocab, sum_c_lnc_e6, ln_total_e6).
    """
    import polars as pl

    def term_rows(batch: pa.Table) -> pa.Table:
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
                "cnt": pa.array([], type=pa.int64()),
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
        pair = code.astype(np.int64) * len(scode) + sinv
        upair, cnt = np.unique(pair, return_counts=True)
        return pa.table(
            {
                "h": pa.array(vh[upair // len(scode)]),
                "source": pa.array(
                    scode[upair % len(scode)].astype(object), type=pa.string()
                ),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    counts = (
        _docs(sf_dir)
        .select_columns(["source", "text"])
        .map_batches(term_rows, batch_format="pyarrow")
        .groupby(["h", "source"])
        .aggregate(ray.data.aggregate.Sum("cnt", alias_name="c"))
    )

    def contrib(batch: pa.Table) -> pa.Table:
        c = pc.cast(batch.column("c"), pa.int64()).to_numpy(zero_copy_only=False)
        lnc = np.floor(np.log(c.astype(np.float64)) * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "source": batch.column("source"),
                "p_tok": pa.array(c),
                "p_vocab": pa.array(np.ones(len(c), dtype=np.int64)),
                "p_clnc": pa.array(c * lnc),
            }
        )

    merged = (
        counts.map_batches(contrib, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            ray.data.aggregate.Sum("p_tok", alias_name="n_tok"),
            ray.data.aggregate.Sum("p_vocab", alias_name="n_vocab"),
            ray.data.aggregate.Sum("p_clnc", alias_name="sum_c_lnc_e6"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch.column("n_tok"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "source": batch.column("source"),
                "n_tok": pa.array(t),
                "n_vocab": pc.cast(batch.column("n_vocab"), pa.int64()),
                "sum_c_lnc_e6": pc.cast(batch.column("sum_c_lnc_e6"), pa.int64()),
                "ln_total_e6": pa.array(
                    np.floor(np.log(t.astype(np.float64)) * 1e6 + 0.5).astype(
                        np.int64
                    )
                ),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def dup_source_matrix(sf_dir: str) -> "ray.data.Dataset":
    """Where duplication comes from: for every source pair (src_a <=
    src_b), the number of identical-text document PAIRS drawn one from
    each — the within-source vs cross-source duplication matrix a
    curation team reads before deciding which feed to trim.

    Scale shape: texts hash to the 128-bit digest inside ``map_batches``
    (bodies never shuffle); one digest-level groupby yields (digest,
    source, count) rows; inside each digest-keyed hash partition every
    duplicate group's source runs expand through the triangular-index
    kernel (diagonal cell = c*(c-1)/2 within-source pairs, off-diagonal
    = c_a*c_b cross pairs); a bounded source-pair groupby sums cells.
    Output: (src_a, src_b, dup_pairs).  Within-source diagonal cells are
    always present (zero when a source has no dups); cross cells appear
    iff the two sources share at least one identical text."""
    from .partition import map_key_partitions, run_starts

    def hash_side(batch: pa.Table) -> pa.Table:
        h = _hash_text_128(batch)
        t = pa.table(
            {
                "h1": h.column("h1"),
                "h2": h.column("h2"),
                "source": batch.column("source"),
            }
        )
        g = t.group_by(["h1", "h2", "source"]).aggregate([("source", "count")])
        return pa.table(
            {
                "h1": g.column("h1"),
                "h2": g.column("h2"),
                "source": g.column("source"),
                "p_c": pc.cast(g.column("source_count"), pa.int64()),
            }
        )

    counts = (
        _docs(sf_dir)
        .select_columns(["doc_id", "text", "source"])
        .map_batches(hash_side, batch_format="pyarrow")
        .groupby(["h1", "h2", "source"])
        .aggregate(ray.data.aggregate.Sum("p_c", alias_name="c"))
    )

    def expand(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src_a": pa.array([], type=pa.string()),
                "src_b": pa.array([], type=pa.string()),
                "p_n": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        h1 = tbl.column("h1").to_numpy(zero_copy_only=False)
        h2 = tbl.column("h2").to_numpy(zero_copy_only=False)
        src = tbl.column("source").to_numpy(zero_copy_only=False)
        c = pc.cast(tbl.column("c"), pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((src, h2, h1))
        h1, h2, src, c = h1[order], h2[order], src[order], c[order]
        gstart = run_starts(h1, h2)
        first = np.nonzero(gstart)[0]
        k = np.diff(np.append(first, len(h1)))
        npairs = k * (k + 1) // 2  # i <= j including the diagonal
        tot = int(npairs.sum())
        if tot == 0:
            return empty
        grp = np.repeat(np.arange(len(k)), npairs)
        p = np.arange(tot) - np.repeat(np.cumsum(npairs) - npairs, npairs)
        kk = k[grp]
        i = np.floor(
            ((2 * kk + 1) - np.sqrt((2 * kk + 1) ** 2 - 8.0 * p)) / 2
        ).astype(np.int64)
        cum_i = i * kk - i * (i - 1) // 2
        j = i + (p - cum_i)
        base = np.repeat(first, npairs)
        ca, cb = c[base + i], c[base + j]
        val = np.where(i == j, ca * (ca - 1) // 2, ca * cb)
        # zero diagonal cells stay: every source always reports its
        # within-source cell (schema-stable even on a dup-free corpus),
        # and the local groupby below collapses them to <= |sources|^2
        # rows per partition before the exchange
        t = pa.table(
            {
                "src_a": pa.array(src[base + i], type=pa.string()),
                "src_b": pa.array(src[base + j], type=pa.string()),
                "v": pa.array(val),
            }
        )
        g = t.group_by(["src_a", "src_b"]).aggregate([("v", "sum")])
        return pa.table(
            {
                "src_a": g.column("src_a"),
                "src_b": g.column("src_b"),
                "p_n": pc.cast(g.column("v_sum"), pa.int64()),
            }
        )

    return (
        map_key_partitions(counts, ["h1", "h2"], expand)
        .groupby(["src_a", "src_b"])
        .aggregate(ray.data.aggregate.Sum("p_n", alias_name="dup_pairs"))
    )


# ---------------------------------------------------------------------------
# content-defined chunking (FastCDC-shape) + exact chunk dedup


def _cdc_cut_positions(buf, offs, K, mask_mod):
    """Global cut positions (byte indices into ``buf``) and their doc index
    for the content-defined chunking rule: cut before 0-based within-doc
    position i ∈ [1, L−K] when the K-byte rolling hash ≡ 0 (mod
    ``mask_mod``).  Shared by the chunk and count paths so the rule can
    never diverge between them."""
    B = np.uint64(257)
    if len(buf) < K:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    powers = (B ** np.arange(K, dtype=np.uint64))[::-1]
    w = np.lib.stride_tricks.sliding_window_view(buf.astype(np.uint64), K)
    h = (w * powers).sum(axis=1)
    cand = np.flatnonzero(h % np.uint64(mask_mod) == 0)
    d = np.searchsorted(offs, cand, side="right") - 1
    keep = (cand - offs[d] >= 1) & (cand <= offs[d + 1] - K)
    return cand[keep], d[keep]


def cdc_chunk_dedup(sf_dir: str, window: int = 8, mask_mod: int = 64) -> "ray.data.Dataset":
    """Content-defined chunking dedup: split every document at positions
    where the ``window``-byte rolling hash ≡ 0 (mod ``mask_mod``) — the
    boundary depends only on LOCAL bytes (the CDC property behind
    rsync/LBFS/FastCDC), so insertions shift chunk contents without
    re-cutting the rest of the document — then count, per document, how
    many of its chunks occur verbatim in ≥ 2 distinct documents (shared
    boilerplate at sub-document granularity, robust to edits that break
    whole-document exact dedup).

    Output: (doc_id, n_chunks, n_shared_chunks, shared_chars).

    Scale shape: chunk boundaries and per-doc chunk counts come from ONE
    whole-batch sliding-window pass over the concatenated text buffer
    (the ``doc_fingerprint`` kernel) — chunk strings are zero-copy offset
    slices of that buffer; only 128-bit chunk digests + doc ids enter the
    exchange (16 B/chunk), keyed by digest; a sorted segment pass counts
    distinct docs per digest run and emits per-doc partials ONLY for
    shared chunks, so the second exchange is O(docs + shared partials),
    never O(chunks)."""
    import polars as pl

    from .partition import map_key_partitions, run_starts

    K = int(window)
    B = np.uint64(257)

    def stage1(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lb = text.cast(pa.large_binary())
        offs = np.frombuffer(lb.buffers()[1], np.int64)[
            lb.offset : lb.offset + len(lb) + 1
        ]
        buf = np.frombuffer(lb.buffers()[2], np.uint8)[offs[0] : offs[-1]]
        offs = offs - offs[0]
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(batch)
        cuts, _ = _cdc_cut_positions(buf, offs, K, mask_mod)
        bounds = np.unique(np.concatenate([offs, cuts]))
        starts = bounds[:-1]
        chunk_doc = np.searchsorted(offs, starts, side="right") - 1
        chunk_len = np.diff(bounds)
        # zero-copy chunk strings: bounds (re-based to the original data
        # buffer) ARE the large_string offsets
        base = np.frombuffer(lb.buffers()[1], np.int64)[lb.offset]
        chunks = pa.Array.from_buffers(
            pa.large_string(),
            len(starts),
            [
                None,
                pa.py_buffer((bounds + base).astype(np.int64).tobytes()),
                lb.buffers()[2],
            ],
        )
        s = pl.from_arrow(chunks)
        h1 = s.hash(seed=0xCDC1).to_numpy().view(np.int64)
        h2 = s.hash(seed=0xCDC2).to_numpy().view(np.int64)
        dn = doc[chunk_doc]
        # collapse per (chunk digest, doc): within-doc repeats ride as counts
        order = np.lexsort((dn, h2, h1))
        h1o, h2o, dno = h1[order], h2[order], dn[order]
        cl = chunk_len[order]
        st = run_starts(h1o, h2o, dno)
        idx = np.flatnonzero(st)
        cnt = np.diff(np.append(idx, len(h1o)))
        chars = np.add.reduceat(cl, idx) if len(idx) else cl[:0]
        return pa.table(
            {
                "h1": pa.array(h1o[idx]),
                "h2": pa.array(h2o[idx]),
                "doc_id": pa.array(dno[idx]),
                "cnt": pa.array(cnt),
                "chars": pa.array(chars),
            }
        )

    def base_counts(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lb = text.cast(pa.large_binary())
        offs = np.frombuffer(lb.buffers()[1], np.int64)[
            lb.offset : lb.offset + len(lb) + 1
        ]
        buf = np.frombuffer(lb.buffers()[2], np.uint8)[offs[0] : offs[-1]]
        offs = offs - offs[0]
        n = len(batch)
        _, cut_doc = _cdc_cut_positions(buf, offs, K, mask_mod)
        n_cuts = np.bincount(cut_doc, minlength=n)
        # empty-text convention (ADVICE r4): an empty document has ZERO
        # chunks — aligned across engine, SQL oracle (LEFT JOIN from
        # documents) and the test brute force, so an empty doc can never
        # flip row counts or ride as a spurious "shared" empty chunk
        lens = np.diff(offs)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chunks": pa.array(np.where(lens > 0, n_cuts + 1, 0)),
                "n_shared_chunks": pa.array(np.zeros(n, np.int64)),
                "shared_chars": pa.array(np.zeros(n, np.int64)),
            }
        )

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    rows = docs.map_batches(stage1, batch_format="pyarrow")

    def shared_part(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_chunks": pa.array([], type=pa.int64()),
                "n_shared_chunks": pa.array([], type=pa.int64()),
                "shared_chars": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        h1 = tbl.column("h1").to_numpy(zero_copy_only=False)
        h2 = tbl.column("h2").to_numpy(zero_copy_only=False)
        dn = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        cnt = tbl.column("cnt").to_numpy(zero_copy_only=False)
        chars = tbl.column("chars").to_numpy(zero_copy_only=False)
        order = np.lexsort((dn, h2, h1))
        h1o, h2o, dno = h1[order], h2[order], dn[order]
        co, cho = cnt[order], chars[order]
        st = run_starts(h1o, h2o)
        run_id = np.cumsum(st) - 1
        n_docs_in_run = np.bincount(run_id)  # rows are (digest, doc)-distinct
        shared = n_docs_in_run[run_id] >= 2
        if not shared.any():
            return empty
        return pa.table(
            {
                "doc_id": pa.array(dno[shared]),
                "n_chunks": pa.array(np.zeros(int(shared.sum()), np.int64)),
                "n_shared_chunks": pa.array(co[shared]),
                "shared_chars": pa.array(cho[shared]),
            }
        )

    partials = map_key_partitions(rows, ["h1", "h2"], shared_part)
    base = docs.map_batches(base_counts, batch_format="pyarrow")

    from .partition import sum_by_key

    return sum_by_key(
        base.union(partials),
        ["doc_id"],
        {
            "n_chunks": "n_chunks",
            "n_shared_chunks": "n_shared_chunks",
            "shared_chars": "shared_chars",
        },
    )


# ---------------------------------------------------------------------------
# normalization-based exact dedup (C4-style canonicalization first)


def normalized_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Exact dedup AFTER text canonicalization (lowercase, punctuation
    stripped, whitespace runs collapsed, ends trimmed) — the C4-style
    "soft exact" dedup that catches case/punctuation variants plain
    exact dedup misses.  Both the engine (RE2 via pyarrow.compute) and
    the oracle (RE2 via DuckDB regexp_replace) run the identical
    normalization, so group keys match string-for-string.

    Output: one row per duplicate CLASS with ≥1 member —
    (doc_id = min id in class, n_dups, norm_chars).

    Scale shape: normalization is a zero-shuffle vectorized map; only
    the 128-bit digest of the normalized text + doc id enter the
    exchange (dedup_exact's digest-shuffle shape, 16 B/doc)."""
    import polars as pl

    from .partition import map_key_partitions, run_starts

    def norm_digest(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        t = pc.utf8_lower(text)
        t = pc.replace_substring_regex(t, r"[.,!?;:]", "")
        t = pc.replace_substring_regex(t, r"\s+", " ")
        t = pc.utf8_trim_whitespace(t)
        s = pl.from_arrow(t)
        return pa.table(
            {
                "h1": pa.array(s.hash(seed=0x4E0).to_numpy().view(np.int64)),
                "h2": pa.array(s.hash(seed=0x4E1).to_numpy().view(np.int64)),
                "doc_id": batch.column("doc_id"),
                "norm_chars": pc.cast(pc.utf8_length(t), pa.int64()),
            }
        )

    rows = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        norm_digest, batch_format="pyarrow"
    )

    def per_class(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_dups": pa.array([], type=pa.int64()),
                "norm_chars": pa.array([], type=pa.int64()),
            }
        )
        if len(tbl) == 0:
            return empty
        h1 = tbl.column("h1").to_numpy(zero_copy_only=False)
        h2 = tbl.column("h2").to_numpy(zero_copy_only=False)
        did = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        nc = tbl.column("norm_chars").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, h2, h1))
        h1o, h2o, do, nco = h1[order], h2[order], did[order], nc[order]
        st = run_starts(h1o, h2o)
        idx = np.flatnonzero(st)
        cnt = np.diff(np.append(idx, len(do)))
        return pa.table(
            {
                "doc_id": pa.array(do[idx]),
                "n_dups": pa.array(cnt),
                "norm_chars": pa.array(nco[idx]),
            }
        )

    return map_key_partitions(rows, ["h1", "h2"], per_class)


# ---------------------------------------------------------------------------
# delta dedup: new shard vs existing base corpus (continuous-crawl shape)


def delta_dedup(sf_dir: str, split_pct: int = 80) -> "ray.data.Dataset":
    """Asymmetric dedup of a NEW shard against the EXISTING corpus — the
    continuous-crawl ingestion gate: a new document is dropped if it
    exactly matches any base document's text, or flagged near if it
    shares a MinHash LSH band with one.  Base docs are never re-examined
    (the whole point of delta processing: cost scales with the delta,
    not the corpus).

    The base/new split is deterministic: docs with
    ``doc_id < percentile(split_pct)`` by id order form the base (a
    stand-in for "already ingested").

    Output: (doc_id, dup_kind) for flagged NEW docs — dup_kind
    1 = exact text match to base, 2 = near (shares an LSH band with a
    base doc, no exact match).

    Scale shape: one digest exchange for the exact leg (16 B/doc, side
    flags ride the rows; a run is a hit iff it contains a base row) and
    the MinHash band exchange for the near leg (band keys only) — the
    same segment-pass culls as minhash_near_dup, no per-bucket dispatch,
    and no base-vs-base pair work anywhere."""
    import polars as pl

    from .partition import first_per_key, map_key_partitions, run_starts

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    ids = docs.select_columns(["doc_id"])
    n_total = ids.count()
    k = max(1, (n_total * split_pct) // 100)
    # deterministic split threshold: the k-th smallest doc_id (distributed
    # sort + bounded take of one row)
    thr = ids.sort("doc_id").limit(k).max("doc_id")

    def exact_rows(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        s = pl.from_arrow(text)
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "h1": pa.array(s.hash(seed=0xDE17A1).to_numpy().view(np.int64)),
                "h2": pa.array(s.hash(seed=0xDE17A2).to_numpy().view(np.int64)),
                "doc_id": pa.array(did),
                "is_base": pa.array((did <= thr).astype(np.int8)),
            }
        )

    ex = docs.map_batches(exact_rows, batch_format="pyarrow")

    def exact_hits(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], type=pa.int64()),
             "dup_kind": pa.array([], type=pa.int64())}
        )
        if len(tbl) == 0:
            return empty
        h1 = tbl.column("h1").to_numpy(zero_copy_only=False)
        h2 = tbl.column("h2").to_numpy(zero_copy_only=False)
        did = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        isb = tbl.column("is_base").to_numpy(zero_copy_only=False)
        order = np.lexsort((did, h2, h1))
        h1o, h2o, do, bo = h1[order], h2[order], did[order], isb[order]
        st = run_starts(h1o, h2o)
        idx = np.flatnonzero(st)
        run_id = np.cumsum(st) - 1
        has_base = np.maximum.reduceat(bo, idx) == 1
        hit = has_base[run_id] & (bo == 0)
        n = int(hit.sum())
        return pa.table(
            {
                "doc_id": pa.array(do[hit]),
                "dup_kind": pa.array(np.ones(n, dtype=np.int64)),
            }
        )

    exact = map_key_partitions(ex, ["h1", "h2"], exact_hits).materialize()

    # near leg: MinHash bands with side flags
    sigs = docs.map_batches(_minhash_batch, batch_format="pyarrow")

    def near_hits(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], type=pa.int64()),
             "dup_kind": pa.array([], type=pa.int64())}
        )
        if len(tbl) < 2:
            return empty
        band = tbl.column("band").to_numpy(zero_copy_only=False)
        key = tbl.column("band_key").to_numpy(zero_copy_only=False)
        ids_ = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        isb = (ids_ <= thr).astype(np.int8)
        order = np.lexsort((ids_, key, band))
        bando, keyo, ido, bo = band[order], key[order], ids_[order], isb[order]
        st = run_starts(bando, keyo)
        idx = np.flatnonzero(st)
        run_id = np.cumsum(st) - 1
        has_base = np.maximum.reduceat(bo, idx) == 1
        hit = has_base[run_id] & (bo == 0)
        n = int(hit.sum())
        return pa.table(
            {
                "doc_id": pa.array(ido[hit]),
                "dup_kind": pa.array(np.full(n, 2, dtype=np.int64)),
            }
        )

    near = map_key_partitions(sigs, ["band", "band_key"], near_hits)
    # one row per flagged doc: exact (1) wins over near (2)
    from .partition import reduce_by_key

    return reduce_by_key(
        exact.union(near), ["doc_id"], [("dup_kind", "min", "dup_kind")]
    )
