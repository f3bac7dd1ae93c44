"""Lance-style dataset facade over Parquet (S1/S6 + north-rule "Lance").

The real ``lance`` package is unavailable in this sandbox (SURVEY.md env
facts), so the engine emulates the pieces of the Lance table model it
relies on, behind this interface so the real library can be dropped in:

* a dataset = directory of immutable **fragments** (parquet files) plus a
  **commit log** (``_manifest.json``, written atomically last — readers
  only ever see committed fragments);
* fragment-level metadata (row counts, per-partition lineage) for
  resumable writes (state/lineage.py);
* reads map to ``ray.data.read_parquet`` over the committed fragment list
  (parallel blocks, column pruning pushed down).
"""

from __future__ import annotations

import json
from pathlib import Path

import ray.data


def read_dataset(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Read a committed Lance-style dataset (manifest-listed fragments only).

    Falls back to reading ``*.parquet`` under the path when no manifest
    exists (plain parquet directory)."""
    p = Path(path)
    manifest = p / "_manifest.json"
    if manifest.exists():
        frags = json.loads(manifest.read_text())["fragments"]
        paths = [str(p / f) for f in frags]
    else:
        paths = str(p)
    return ray.data.read_parquet(paths, columns=columns)


def dataset_stats(path: str) -> dict:
    """Commit-log counters (rows, vertices, partitions)."""
    manifest = Path(path) / "_manifest.json"
    m = json.loads(manifest.read_text())
    return {
        "n_partitions": m["n_partitions"],
        "rows_out": m["rows_out"],
        "vertices": m.get("vertices", 0),
    }
