"""Multimodal (media) columns: opaque binary payloads + typed metadata,
processed by actor-pool stages.

The reference's media concern is its texture atlas (PNG atlases + frame
dict loaded once per worker, ``/root/reference/src/texturesLoader.ts:7-54``,
shipped to workers via ``workerData``).  Generalized here to the
training-data-pipeline shape: a ``media`` table

    media_ref:string, media_type:string, payload:binary,
    width:int32, height:int32

with decode / resize / feature-extract as ``map_batches`` actor stages.

The actual image/audio codecs are NOT in this container, so ``_decode`` is
a DETERMINISTIC FAKE (payload bytes → pseudo-pixel array, clearly marked);
the Ray-side plumbing — schema, batch sizing for large binaries, actor
state, output layout — is real and tested.  Swap ``_decode`` for a real
codec (PIL/ffmpeg) to productionize.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

FEATURE_DIM = 64
_THUMB = 8  # thumbnail side length (stub resize target)


def synth_media_table(refs: list[str]) -> pa.Table:
    """Deterministic fake media store: payload bytes derived from the ref
    (stands in for the reference's atlas PNGs)."""
    payloads = []
    types = []
    widths = []
    heights = []
    for r in refs:
        seed = np.frombuffer(r.encode() + b"\0" * 8, dtype=np.uint8)[:8].copy()
        rng = np.random.default_rng(int.from_bytes(seed.tobytes(), "little"))
        w = int(rng.integers(16, 64))
        h = int(rng.integers(16, 64))
        payloads.append(rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes())
        types.append("image/fake" if "facade" in r or "roof" in r else "binary")
        widths.append(w)
        heights.append(h)
    return pa.table(
        {
            "media_ref": pa.array(refs, type=pa.string()),
            "media_type": pa.array(types, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
        }
    )


def _decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """DETERMINISTIC FAKE decode: bytes → (h, w) uint8 "pixels".

    A real build replaces this with an image codec; everything downstream
    (resize, features) operates on the returned array only."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) < width * height:
        arr = np.pad(arr, (0, width * height - len(arr)))
    return arr[: width * height].reshape(height, width)


class MediaFeatureExtractor:
    """Actor-pool stage: decode → resize (stub) → feature vector.

    Constructor builds the (deterministic) projection matrix ONCE per actor
    — the model-load analog.  Use small ``batch_size`` for large payloads
    (binary column × batch must fit the worker heap)."""

    def __init__(self, dim: int = FEATURE_DIM):
        rng = np.random.default_rng(0x7E47)
        self.proj = rng.standard_normal((_THUMB * _THUMB, dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_numpy(zero_copy_only=False)
        widths = batch.column("width").to_numpy(zero_copy_only=False)
        heights = batch.column("height").to_numpy(zero_copy_only=False)
        feats = np.empty((len(refs), self.proj.shape[1]), dtype=np.float32)
        thumbs = []
        for i, (p, w, h) in enumerate(zip(payloads, widths, heights)):
            img = _decode(p, int(w), int(h))
            # stub "resize": strided subsample to _THUMB × _THUMB
            ys = np.linspace(0, h - 1, _THUMB).astype(int)
            xs = np.linspace(0, w - 1, _THUMB).astype(int)
            thumb = img[np.ix_(ys, xs)]
            thumbs.append(thumb.tobytes())
            feats[i] = (thumb.reshape(-1).astype(np.float32) / 255.0) @ self.proj
        flat = pa.array(feats.reshape(-1), type=pa.float32())
        return pa.table(
            {
                "media_ref": batch.column("media_ref"),
                "media_type": batch.column("media_type"),
                "feature": pa.FixedSizeListArray.from_arrays(flat, self.proj.shape[1]),
                "thumb": pa.array(thumbs, type=pa.binary()),
            }
        )


def media_features(sf_dir: str) -> "ray.data.Dataset":
    """Pipeline: distinct media refs from documents → fake media store →
    actor-pool feature extraction."""
    from ..pipelines.geo import parsed_ds

    # distinct refs via the built-in aggregate (NOT one map_groups call
    # per ref); the distinct set is the small broadcast side
    refs = (
        parsed_ds(sf_dir)
        .select_columns(["media_refs"])
        .map_batches(_explode_refs, batch_format="pyarrow")
        .unique("media_ref")
    )
    media = synth_media_table(sorted(refs))
    return ray.data.from_arrow(media).map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        concurrency=2,
        batch_size=64,  # large binary payloads → small batches
    )


def _explode_refs(batch: pa.Table) -> pa.Table:
    col = batch.column("media_refs")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pa.table({"media_ref": col.flatten()})
