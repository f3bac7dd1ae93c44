"""Corpus-keyed parquet checkpoints for shared intermediates.

Several registered queries fold the same upstream relation (the per-tile
counts; the curation decision matrix) before diverging — recomputing it
per query multiplies the sweep cost by the consumer count.  A checkpoint
here is an on-disk materialized view keyed by the CORPUS STATE (resolved
paths + mtime_ns + size of the source files), so a regenerated corpus
invalidates automatically and a warm sweep builds each shared relation
once.

Disk, not object store: the rows must not pin cluster memory at 10^12
documents, the commit is atomic (tmp dir rename + ``_DONE`` marker), and
the checkpoint doubles as a resume point — the repo's lineage
discipline (``state/lineage.py``)."""

from __future__ import annotations

import hashlib
import os

import ray.data

CKPT_ROOT = "/tmp/osm3d_ckpt"


def corpus_key(paths: list[str]) -> str:
    """Deterministic key for the state of a set of source files (or
    directories of parquet fragments)."""
    parts = []
    for p in sorted(paths):
        rp = os.path.realpath(p)
        if os.path.isdir(rp):
            for f in sorted(os.listdir(rp)):
                st = os.stat(os.path.join(rp, f))
                parts.append(f"{rp}/{f}|{st.st_mtime_ns}|{st.st_size}")
        else:
            st = os.stat(rp)
            parts.append(f"{rp}|{st.st_mtime_ns}|{st.st_size}")
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()[:24]


def parquet_checkpoint(
    name: str, key: str, build, empty_schema=None
) -> "ray.data.Dataset":
    """Return the checkpointed Dataset for ``(name, key)``, building it
    with ``build()`` (→ Dataset) on first use.  Atomic commit; readers
    always see either nothing or a complete checkpoint.  A legitimately
    EMPTY relation still commits (one zero-row parquet file —
    ``write_parquet`` of an empty Dataset writes nothing at all), using
    ``empty_schema`` when given, else the Dataset's own schema."""
    out = os.path.join(CKPT_ROOT, name, key)
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        import shutil

        # per-process tmp name: two processes may race to build the same
        # checkpoint; each writes its own tmp and the first rename wins
        # (both produce identical content — the key pins the input state)
        tmp = out + f".tmp-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        if os.path.exists(out):
            # a dir without _DONE is an unverified leftover (crash between
            # rename and marker) — rebuild rather than trust it
            shutil.rmtree(out, ignore_errors=True)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        ds = build()
        ds.write_parquet(tmp)
        if not os.path.isdir(tmp) or not any(
            f.endswith(".parquet") for f in os.listdir(tmp)
        ):
            import pyarrow as pa
            import pyarrow.parquet as pq

            schema = empty_schema
            if schema is None:
                s = ds.schema(fetch_if_missing=True)
                schema = pa.schema(
                    list(zip(s.names, s.types))
                ) if s is not None else None
            if schema is None:
                raise ValueError(
                    f"checkpoint {name}/{key}: empty relation with no "
                    "recoverable schema — pass empty_schema"
                )
            os.makedirs(tmp, exist_ok=True)
            pq.write_table(
                schema.empty_table(), os.path.join(tmp, "empty.parquet")
            )
        try:
            os.replace(tmp, out)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.exists(done):
                raise  # a half-written dir is in the way — surface it
        else:
            with open(done, "w") as f:
                f.write("ok")
    return ray.data.read_parquet(out)
