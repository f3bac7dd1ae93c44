"""Span parser: ``documents`` (interleaved spans) → decoded buildings view.

The Ray-Data analog of the reference's MVT decode
(``/root/reference/src/b3dmGenerator.ts:102-107``) + VectorArea assembly
(``/root/reference/src/ring/ring-builder.ts:51-94``):

* ``tag`` spans (``key=value``) → nullable tag columns
  (mirrors ``BuildingProperties``, ``/root/reference/src/building/type.ts:29-71``);
* ``geom`` spans (one per ring, ``"x y;x y;..."``, outer first then holes —
  the ring-order invariant of ``ring-builder.ts:83-88``) → flat coords +
  ring offsets + winding-derived ring roles (``ring-builder.ts:12-29``);
* closed-ring validation (``/root/reference/src/ring/ring-helper.ts:16-21``)
  → ``geom_valid`` dead-letter flag instead of a throw;
* ``media`` spans → ``media_refs:list<string>``;
* the input ``spans`` column is carried through **unmodified** (per-row
  span-sequence invariant, BASELINE.json ``input_hint``) unless
  ``keep_spans=False``.

Stateless — use as ``ds.map_batches(parse_documents, batch_format="pyarrow")``.
All hot paths are Arrow/numpy kernels; no per-row Python in the tag or
coordinate decode.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from ..geom.rings import classify_winding, rings_closed

_FLOAT_TAGS = [
    "height", "levels", "min_height", "min_level", "roof_height", "roof_levels",
    "roof_direction", "elevation",
] + [f"ombb{i}{j}" for i in range(4) for j in range(2)]
_STRING_TAGS = [
    "osm_type", "roof_type", "roof_material", "roof_orientation", "roof_color",
    "material", "color", "building_type", "name", "skeleton",
]
_BOOL_TAGS = ["windows", "is_part"]
_INT_TAGS = ["osm_id"]


def _parse_coord_blob(ring_texts: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All ring texts → (flat xy float64, per-ring vertex counts, per-ring ok).

    Fully vectorized and per-ring isolated: Arrow splits every ring's
    token stream (so one garbage ring can never desynchronize its
    neighbors), polars casts all tokens to float64 at once with
    ``strict=False`` (non-numeric → null), and a segmented null-count
    dead-letters exactly the malformed rings (count 0, ok False).  No
    ``np.fromstring`` (text mode is removed in numpy ≥ 2.0)."""
    if len(ring_texts) == 0:
        e = np.empty(0, np.int64)
        return np.empty((0, 2)), e, np.empty(0, bool)
    nverts = (
        pc.add(pc.count_substring(ring_texts, ";"), 1)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    toks = pc.split_pattern(pc.replace_substring(ring_texts, ";", " "), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = np.asarray(toks.offsets).astype(np.int64)
    tok_counts = np.diff(offs)
    vals_s = pl.Series(toks.values).cast(pl.Float64, strict=False)
    vals = vals_s.to_numpy()  # NaN where null
    bad_tok = vals_s.is_null().to_numpy()
    # ring ok ⇔ token count matches 2×nverts AND no unparseable token.
    # (a literal "nan" token parses to non-null NaN and stays valid,
    # matching the old np.fromstring behavior)
    # every ring splits to ≥1 token, so offs[:-1] are valid reduceat starts
    bad_per_ring = (
        np.add.reduceat(bad_tok.astype(np.int64), offs[:-1])
        if len(bad_tok)
        else np.zeros(len(nverts), np.int64)
    )
    ok = (tok_counts == 2 * nverts) & (bad_per_ring == 0) & (tok_counts > 0)
    counts = np.where(ok, nverts, 0)
    if ok.all():
        return vals.reshape(-1, 2), counts, ok
    keep = np.repeat(ok, tok_counts)
    flat = vals[keep]
    return flat.reshape(-1, 2), counts, ok


def parse_documents(batch: pa.Table, keep_spans: bool = True) -> pa.Table:
    """Decode one Arrow batch of documents into building columns."""
    batch = batch.combine_chunks()
    n = len(batch)
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    values = spans.values
    list_offsets = np.asarray(spans.offsets)
    counts = np.diff(list_offsets)
    span_row = np.repeat(np.arange(n, dtype=np.int64), counts)

    kind = values.field("kind")
    text = values.field("text")
    media_ref = values.field("media_ref")

    # ---- tag spans ------------------------------------------------------
    tag_mask = pc.equal(kind, "tag").to_numpy(zero_copy_only=False)
    tag_rows = span_row[tag_mask]
    tag_texts = text.filter(pa.array(tag_mask))
    split = pc.split_pattern(tag_texts, "=", max_splits=1)
    split_off = np.asarray(split.offsets)
    split_flat = split.values
    keys = split_flat.take(pa.array(split_off[:-1]))
    # second element of each 2-list; lists of length 1 (no '=') yield key only
    has_val = np.diff(split_off) == 2
    val_idx = split_off[:-1] + 1
    vals_all = split_flat.take(pa.array(np.where(has_val, val_idx, split_off[:-1])))

    keys_np = keys.to_numpy(zero_copy_only=False)
    out: dict[str, pa.Array | pa.ChunkedArray] = {"doc_id": batch.column("doc_id")}
    if keep_spans:
        out["spans"] = spans

    # ---- vectorized typed scatters (no object ndarrays, no tolist) ------
    # numeric parse of ALL tag values at once (strict=False → null for
    # non-numeric values: dead-letter the VALUE, never crash the batch)
    n_tagvals = len(vals_all)
    if n_tagvals:
        _num = pl.Series(vals_all).cast(pl.Float64, strict=False)
        num_vals = _num.to_numpy()  # NaN where null/garbage
        num_ok = ~_num.is_null().to_numpy()
    else:
        num_vals = np.empty(0, np.float64)
        num_ok = np.empty(0, bool)

    def _scatter_numeric(tag: str, as_int: bool) -> pa.Array:
        sel = (keys_np == tag) & has_val
        col = np.full(n, np.nan)
        present = np.zeros(n, dtype=bool)
        rows = tag_rows[sel]
        col[rows] = num_vals[sel]  # duplicate tags in a row: last wins
        present[rows] = num_ok[sel]
        if as_int:
            # int(float(s)) semantics: truncate toward zero, dead-letter
            # NaN/inf/out-of-bounds values
            ok = present & np.isfinite(col) & (np.abs(col) < 2**62)
            icol = np.zeros(n, np.int64)
            icol[ok] = col[ok].astype(np.int64)
            return pa.array(icol, mask=~ok)
        return pa.array(col, mask=~present)

    def _scatter_string(tag: str) -> pa.Array:
        sel = (keys_np == tag) & has_val
        idx = np.full(n, -1, dtype=np.int64)
        idx[tag_rows[sel]] = np.nonzero(sel)[0]
        # Arrow take with null indices → null output rows (zero-copy values)
        return vals_all.take(pa.array(idx, mask=idx < 0))

    def _scatter_bool(tag: str) -> pa.Array:
        sel = (keys_np == tag) & has_val
        col = np.zeros(n, dtype=bool)
        present = np.zeros(n, dtype=bool)
        rows = tag_rows[sel]
        col[rows] = vals_np[sel] == "true"
        present[rows] = True
        return pa.array(col, mask=~present)

    vals_np = vals_all.to_numpy(zero_copy_only=False)
    for t in _INT_TAGS:
        out[t] = _scatter_numeric(t, as_int=True)
    for t in _FLOAT_TAGS:
        out[t] = _scatter_numeric(t, as_int=False)
    for t in _STRING_TAGS:
        out[t] = _scatter_string(t)
    for t in _BOOL_TAGS:
        out[t] = _scatter_bool(t)

    # ---- geom spans -----------------------------------------------------
    geom_mask = pc.equal(kind, "geom").to_numpy(zero_copy_only=False)
    ring_rows = span_row[geom_mask]
    ring_texts = text.filter(pa.array(geom_mask))
    coords, ring_nverts, ring_ok = _parse_coord_blob(ring_texts)
    ring_offsets = np.concatenate([[0], np.cumsum(ring_nverts)])
    roles = classify_winding(coords, ring_offsets)
    closed = rings_closed(coords, ring_offsets)

    rings_per_row = np.bincount(ring_rows, minlength=n)
    verts_per_row = np.zeros(n, dtype=np.int64)
    np.add.at(verts_per_row, ring_rows, ring_nverts)

    row_vert_offsets = np.concatenate([[0], np.cumsum(verts_per_row)])
    out["coords"] = pa.ListArray.from_arrays(
        pa.array(row_vert_offsets * 2, type=pa.int32()),
        pa.array(coords.reshape(-1), type=pa.float64()),
    )
    # per-row ring start indices (vertex units), relative to the row
    row_of_ring_start = np.repeat(row_vert_offsets[:-1], rings_per_row)
    rel_ring_starts = (ring_offsets[:-1] - row_of_ring_start).astype(np.int32)
    row_ring_offsets = np.concatenate([[0], np.cumsum(rings_per_row)])
    out["ring_offsets"] = pa.ListArray.from_arrays(
        pa.array(row_ring_offsets, type=pa.int32()),
        pa.array(rel_ring_starts, type=pa.int32()),
    )
    out["ring_roles"] = pa.ListArray.from_arrays(
        pa.array(row_ring_offsets, type=pa.int32()),
        pa.array(roles, type=pa.int8()),
    )
    out["n_rings"] = pa.array(rings_per_row.astype(np.int32))
    out["n_vertices"] = pa.array(verts_per_row)

    valid = np.ones(n, dtype=bool)
    # a row is invalid if any ring is malformed, unclosed or has < 4
    # vertices (3 + closing duplicate)
    bad = (~closed) | (ring_nverts < 4) | (~ring_ok)
    if bad.any():
        np.logical_and.at(valid, ring_rows, ~bad)
    valid &= rings_per_row > 0
    out["geom_valid"] = pa.array(valid)

    # ---- geometry summaries (bit-exact vs generator truth) --------------
    minx = np.full(n, np.nan)
    miny = np.full(n, np.nan)
    maxx = np.full(n, np.nan)
    maxy = np.full(n, np.nan)
    centx = np.full(n, np.nan)
    centy = np.full(n, np.nan)
    has_geom = rings_per_row > 0
    if len(ring_nverts):
        # a malformed (dead-lettered) or degenerate first ring contributes no
        # open vertices — exclude such rows from the summaries so the
        # segmented reduce stays well-defined
        open_len = ring_nverts - closed.astype(np.int64)
        first_ring_all = np.minimum(row_ring_offsets[:-1], len(ring_nverts) - 1)
        has_geom &= open_len[first_ring_all] > 0
    else:
        has_geom[:] = False
    if has_geom.any():
        # outer ring of each row = its FIRST ring (ring-order invariant)
        first_ring = row_ring_offsets[:-1][has_geom]
        fr_start = ring_offsets[first_ring]
        fr_len_open = ring_nverts[first_ring] - closed[first_ring].astype(np.int64)
        ends = fr_start + fr_len_open
        # segmented reduce over open outer ring (same op order as generator)
        ox = coords[:, 0]
        oy = coords[:, 1]
        minx[has_geom] = _seg_reduce(np.minimum, ox, fr_start, ends)
        maxx[has_geom] = _seg_reduce(np.maximum, ox, fr_start, ends)
        miny[has_geom] = _seg_reduce(np.minimum, oy, fr_start, ends)
        maxy[has_geom] = _seg_reduce(np.maximum, oy, fr_start, ends)
        centx[has_geom] = _seg_reduce(np.add, ox, fr_start, ends) / fr_len_open
        centy[has_geom] = _seg_reduce(np.add, oy, fr_start, ends) / fr_len_open
    out["minx"] = pa.array(minx)
    out["miny"] = pa.array(miny)
    out["maxx"] = pa.array(maxx)
    out["maxy"] = pa.array(maxy)
    out["centroid_x"] = pa.array(centx)
    out["centroid_y"] = pa.array(centy)

    # ---- media spans ----------------------------------------------------
    media_mask = pc.equal(kind, "media").to_numpy(zero_copy_only=False)
    media_rows = span_row[media_mask]
    refs = media_ref.filter(pa.array(media_mask))
    media_per_row = np.bincount(media_rows, minlength=n)
    media_offsets = np.concatenate([[0], np.cumsum(media_per_row)])
    out["media_refs"] = pa.ListArray.from_arrays(
        pa.array(media_offsets, type=pa.int32()), refs
    )
    return pa.table(out)


def _seg_reduce(ufunc, arr: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Segmented ufunc.reduceat over [start, end) windows (non-tiling segments).

    ``np.ufunc.reduceat`` with interleaved (start, end) index pairs evaluates
    every window plus junk windows in between; take every other slot.
    """
    if len(starts) == 0:
        return np.empty(0, dtype=arr.dtype)
    idx = np.empty(2 * len(starts), dtype=np.int64)
    idx[0::2] = starts
    idx[1::2] = ends
    # reduceat requires indices < len(arr); an end index == len(arr) is allowed
    # only as the implicit final bound, so clamp and fix up the tail.
    last_end = idx[-1]
    if last_end >= len(arr):
        idx[-1] = len(arr) - 1
        res = ufunc.reduceat(arr, idx)[0::2]
        # recompute the final window exactly
        res[-1] = ufunc.reduce(arr[starts[-1] : ends[-1]])
        return res
    return ufunc.reduceat(arr, idx)[0::2]


def span_signature(table: pa.Table) -> pa.Array:
    """Per-row canonical signature of the span sequence (kind, text,
    media_ref, order) — the invariant-checking helper used by tests at every
    materialization boundary (SURVEY.md §5.4)."""
    spans = table.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    values = spans.values
    sig_parts = pc.binary_join_element_wise(
        values.field("kind"), values.field("text"), values.field("media_ref"), "\x1f"
    )
    joined = pc.binary_join(
        pa.ListArray.from_arrays(spans.offsets, sig_parts), "\x1e"
    )
    return joined
