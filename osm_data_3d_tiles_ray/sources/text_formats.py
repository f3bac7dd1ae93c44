"""JSONL / CSV document sources → the canonical ``documents`` schema.

Training corpora rarely arrive as parquet; the common interchange shapes
are JSON-lines (one doc per line) and CSV.  These readers normalize
either into the engine's documents schema (``doc_id:int64, text, lang,
source, n_chars:int64``) so every text operator (dedup, TF-IDF,
seq_pack, decontaminate, …) runs unchanged downstream.

Both build on Ray Data's native parallel readers (`read_json` /
`read_csv` — block-per-file-chunk, streaming) and add only a vectorized
normalization `map_batches`: missing optional columns are synthesized,
`n_chars` is recomputed if absent, and `doc_id` falls back to a
deterministic 64-bit hash of the text when the file carries no id —
stable across runs and partitionings, so resume and dedup semantics
hold (collision odds are the 128-bit-dedup argument halved; acceptable
for ingest ids).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

DOC_FIELDS = ("doc_id", "text", "lang", "source", "n_chars")


def _normalize(batch: pa.Table, default_source: str) -> pa.Table:
    names = set(batch.column_names)
    if "text" not in names:
        raise ValueError(f"document source lacks a 'text' column: {sorted(names)}")
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.cast(text, pa.string())
    if "doc_id" in names:
        doc_id = pc.cast(batch.column("doc_id"), pa.int64())
    else:
        import polars as pl

        doc_id = pa.array(
            pl.Series(text).hash(seed=0x0D0C1D).to_numpy().view(np.int64)
        )
    lang = (
        pc.cast(batch.column("lang"), pa.string())
        if "lang" in names
        else pa.array(["und"] * len(batch))
    )
    source = (
        pc.cast(batch.column("source"), pa.string())
        if "source" in names
        else pa.array([default_source] * len(batch))
    )
    n_chars = (
        pc.cast(batch.column("n_chars"), pa.int64())
        if "n_chars" in names
        else pc.cast(pc.utf8_length(text), pa.int64())
    )
    return pa.table(
        {
            "doc_id": doc_id,
            "text": text,
            "lang": lang,
            "source": source,
            "n_chars": n_chars,
        }
    )


def read_jsonl_documents(path: str, source: str = "jsonl") -> "ray.data.Dataset":
    """Parallel JSON-lines → documents Dataset (normalized schema)."""
    import functools

    return ray.data.read_json(path).map_batches(
        functools.partial(_normalize, default_source=source),
        batch_format="pyarrow",
    )


def read_csv_documents(path: str, source: str = "csv") -> "ray.data.Dataset":
    """Parallel CSV → documents Dataset (normalized schema)."""
    import functools

    return ray.data.read_csv(path).map_batches(
        functools.partial(_normalize, default_source=source),
        batch_format="pyarrow",
    )


def read_ipc_documents(path: str, source: str = "ipc") -> "ray.data.Dataset":
    """Arrow IPC (Feather V2) files → documents Dataset.

    Ray Data ships no native IPC reader, so this composes
    ``read_binary_files`` (parallel, one block per file — the shard
    layout IS the parallelism, as with the parquet corpus) with a
    per-FILE decode inside ``map_batches`` (Python touches files, never
    records) and the shared schema normalization.  Files must be
    individually task-sized — the standard sharded-corpus contract."""
    import functools

    ds = ray.data.read_binary_files(path)

    def decode(batch: pa.Table) -> pa.Table:
        tables = []
        for buf in batch.column("bytes"):
            reader = pa.ipc.open_file(pa.BufferReader(buf.as_py()))
            tables.append(reader.read_all())
        if not tables:
            return pa.table({"text": pa.array([], type=pa.string())})
        merged = pa.concat_tables(tables, promote_options="default")
        return _normalize(merged, default_source=source)

    return ds.map_batches(decode, batch_format="pyarrow")


def write_ipc_shards(
    tbl: pa.Table, out_dir: str, n_shards: int = 4
) -> list[str]:
    """Split a table into ``n_shards`` Feather-V2 files (test/interchange
    helper — the inverse of :func:`read_ipc_documents`)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    per = -(-len(tbl) // max(n_shards, 1))
    for i in range(n_shards):
        part = tbl.slice(i * per, per)
        if len(part) == 0:
            break
        p = os.path.join(out_dir, f"shard-{i:04d}.arrow")
        with pa.ipc.new_file(p, part.schema) as w:
            w.write_table(part)
        paths.append(p)
    return paths
