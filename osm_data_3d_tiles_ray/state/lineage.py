"""Per-partition lineage records + resumable commit log (north rule).

Every output partition (a z12 parent cell in the seed pipeline) is written
as ``<out>/tiles/<partition>.parquet`` via tmp+rename (atomic), paired with
a lineage record ``{partition_id, input_fingerprint, rows_in, rows_out,
vertices, wall_ms, status}`` in ``<out>/lineage/<partition>.json``.  A
partition whose data file already exists is SKIPPED on re-run — a killed
job resumes by rerunning the same command; completed partitions cost one
``os.path.exists`` (reference analog: pre-generated b3dm files acting as a
cache, ``/root/reference/serve.ts:68-73``).

``finalize_manifest`` folds the per-partition records into a single
``_manifest.json`` commit log (counters + fragment list) — the engine's
Lance-style commit point.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path


class PartitionWriter:
    """Write one partition's table atomically + its lineage record."""

    def __init__(self, out_dir: str):
        self.out = Path(out_dir)
        (self.out / "tiles").mkdir(parents=True, exist_ok=True)
        (self.out / "lineage").mkdir(parents=True, exist_ok=True)

    def is_done(self, partition_id: str) -> bool:
        return (self.out / "tiles" / f"{partition_id}.parquet").exists()

    def fingerprint_matches(self, partition_id: str, fingerprint: str) -> bool:
        """True iff the committed lineage record carries the SAME input
        fingerprint — a same-cardinality-but-different input must NOT be
        silently skipped on resume."""
        lpath = self.out / "lineage" / f"{partition_id}.json"
        if not lpath.exists():
            return False  # data without lineage: treat as stale, rewrite
        try:
            rec = json.loads(lpath.read_text())
        except (OSError, ValueError):
            return False
        return rec.get("input_fingerprint") == fingerprint

    def invalidate(self, partition_id: str) -> None:
        """Drop a stale partition (data + lineage) so write() rewrites it."""
        for sub, suffix in (("tiles", ".parquet"), ("lineage", ".json")):
            p = self.out / sub / f"{partition_id}{suffix}"
            if p.exists():
                p.unlink()

    def write(self, partition_id: str, table, rows_in: int, fingerprint: str) -> dict:
        import pyarrow.parquet as pq

        t0 = time.time()
        final = self.out / "tiles" / f"{partition_id}.parquet"
        if final.exists():
            return self.record(partition_id, rows_in, len(table), 0, "skipped", fingerprint)
        tmp = final.with_suffix(f".tmp-{os.getpid()}")
        pq.write_table(table, tmp)
        tmp.rename(final)
        wall_ms = int((time.time() - t0) * 1000)
        vertices = (
            int(sum(table.column("vertex_count").to_pylist()))
            if "vertex_count" in table.column_names
            else 0
        )
        rec = self.record(
            partition_id, rows_in, len(table), wall_ms, "written", fingerprint, vertices
        )
        lpath = self.out / "lineage" / f"{partition_id}.json"
        ltmp = lpath.with_suffix(f".tmp-{os.getpid()}")
        ltmp.write_text(json.dumps(rec))
        ltmp.rename(lpath)
        return rec

    def write_bytes(
        self, partition_id: str, payload: bytes, fragment: str, rows_in: int, fingerprint: str
    ) -> dict:
        """Atomic binary-fragment variant of :meth:`write` (e.g. one
        ``.subtree`` file per partition, ``stages/subtree.py``): same
        tmp+rename commit, same skip-if-done resume, but the data file
        lives at ``<out>/<fragment>`` and the lineage record carries the
        fragment path so ``finalize_manifest`` lists it verbatim."""
        t0 = time.time()
        final = self.out / fragment
        lpath = self.out / "lineage" / f"{partition_id}.json"
        if final.exists() and self.fingerprint_matches(partition_id, fingerprint):
            rec = self.record(partition_id, rows_in, rows_in, 0, "skipped", fingerprint)
            rec["fragment"] = fragment
            return rec
        final.parent.mkdir(parents=True, exist_ok=True)
        tmp = final.with_suffix(f".tmp-{os.getpid()}")
        tmp.write_bytes(payload)
        tmp.rename(final)
        rec = self.record(
            partition_id,
            rows_in,
            rows_in,
            int((time.time() - t0) * 1000),
            "written",
            fingerprint,
        )
        rec["fragment"] = fragment
        ltmp = lpath.with_suffix(f".tmp-{os.getpid()}")
        ltmp.write_text(json.dumps(rec))
        ltmp.rename(lpath)
        return rec

    @staticmethod
    def record(
        partition_id: str,
        rows_in: int,
        rows_out: int,
        wall_ms: int,
        status: str,
        fingerprint: str,
        vertices: int = 0,
    ) -> dict:
        return {
            "partition_id": partition_id,
            "input_fingerprint": fingerprint,
            "rows_in": rows_in,
            "rows_out": rows_out,
            "vertices": vertices,
            "wall_ms": wall_ms,
            "status": status,
        }


def finalize_manifest(out_dir: str) -> dict:
    """Fold lineage records into the commit log ``_manifest.json``."""
    out = Path(out_dir)
    records = []
    for f in sorted((out / "lineage").glob("*.json")):
        records.append(json.loads(f.read_text()))
    manifest = {
        "fragments": [
            r.get("fragment", f"tiles/{r['partition_id']}.parquet") for r in records
        ],
        "n_partitions": len(records),
        "rows_out": sum(r["rows_out"] for r in records),
        "vertices": sum(r.get("vertices", 0) for r in records),
        "records": records,
    }
    tmp = out / "_manifest.json.tmp"
    tmp.write_text(json.dumps(manifest))
    tmp.rename(out / "_manifest.json")
    return manifest
