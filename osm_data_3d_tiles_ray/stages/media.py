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


# ---------------------------------------------------------------------------
# video-style frame sampling (plumbing real, codec a deterministic fake)

_FRAME_W = 16
_FRAME_H = 12


def synth_video_table(refs: list[str]) -> pa.Table:
    """Deterministic fake video store: payload = n_frames × h × w bytes."""
    payloads, n_frames = [], []
    for r in refs:
        seed = np.frombuffer(r.encode() + b"\0" * 8, dtype=np.uint8)[:8].copy()
        rng = np.random.default_rng(int.from_bytes(seed.tobytes(), "little") ^ 0xF1)
        nf = int(rng.integers(8, 33))
        payloads.append(
            rng.integers(
                0, 256, size=nf * _FRAME_W * _FRAME_H, dtype=np.uint8
            ).tobytes()
        )
        n_frames.append(nf)
    return pa.table(
        {
            "media_ref": pa.array(refs, type=pa.string()),
            "media_type": pa.array(["video/fake"] * len(refs), type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "n_frames": pa.array(n_frames, type=pa.int32()),
            "fps": pa.array([10] * len(refs), type=pa.int32()),
        }
    )


class FrameSampler:
    """Actor-pool stage: decode (fake) → sample every ``stride``-th frame →
    per-frame row with timestamp + mean intensity.

    The EXPLODE shape matters at scale: one input row (a whole video
    payload) becomes many small output rows, so ``batch_size`` must stay
    small (payload bytes × batch must fit the worker heap) while the
    output rows are tiny and re-block downstream.  Constructor state
    (stride) is per-actor; a real build swaps the fake decode for
    ffmpeg-style demux inside ``__call__`` only."""

    def __init__(self, stride: int = 4):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_numpy(zero_copy_only=False)
        nfs = batch.column("n_frames").to_numpy(zero_copy_only=False)
        fps = batch.column("fps").to_numpy(zero_copy_only=False)
        out_ref, out_idx, out_ts, out_mean = [], [], [], []
        for r, p, nf, f in zip(refs, payloads, nfs, fps):
            # DETERMINISTIC FAKE decode: bytes → (nf, h, w); real builds
            # demux only the sampled frames (keyframe seek), not the stream
            frames = np.frombuffer(p, dtype=np.uint8).reshape(
                int(nf), _FRAME_H, _FRAME_W
            )
            idx = np.arange(0, int(nf), self.stride)
            sampled = frames[idx]
            means = sampled.reshape(len(idx), -1).mean(axis=1)
            out_ref.append(np.full(len(idx), r, dtype=object))
            out_idx.append(idx.astype(np.int64))
            out_ts.append((idx * 1000 // int(f)).astype(np.int64))
            out_mean.append(np.floor(means * 1e4 + 0.5).astype(np.int64))
        if not out_ref:
            return pa.table(
                {
                    "media_ref": pa.array([], type=pa.string()),
                    "frame_idx": pa.array([], type=pa.int64()),
                    "ts_ms": pa.array([], type=pa.int64()),
                    "mean_intensity_e4": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "media_ref": pa.array(
                    np.concatenate(out_ref), type=pa.string()
                ),
                "frame_idx": pa.array(np.concatenate(out_idx)),
                "ts_ms": pa.array(np.concatenate(out_ts)),
                "mean_intensity_e4": pa.array(np.concatenate(out_mean)),
            }
        )


def media_frame_sample(sf_dir: str, stride: int = 4) -> "ray.data.Dataset":
    """Pipeline: distinct media refs → fake video store → actor-pool frame
    sampling (one row per sampled frame).  Rows-only check; pytest
    brute-forces the sampled indices, timestamps and intensities."""
    from ..pipelines.geo import parsed_ds

    refs = (
        parsed_ds(sf_dir)
        .select_columns(["media_refs"])
        .map_batches(_explode_refs, batch_format="pyarrow")
        .unique("media_ref")
    )
    videos = synth_video_table(sorted(refs))
    return ray.data.from_arrow(videos).map_batches(
        FrameSampler,
        fn_constructor_args=(stride,),
        batch_format="pyarrow",
        concurrency=2,
        batch_size=16,  # whole-video payloads → very small batches
    )


# ---------------------------------------------------------------------------
# audio-style sliding-window analysis (plumbing real, codec a fake)

_WIN = 256
_HOP = 128
_RATE = 8000


def synth_audio_table(refs: list[str]) -> pa.Table:
    """Deterministic fake audio store: payload = n_samples uint8 "PCM"."""
    payloads, n_samples = [], []
    for r in refs:
        seed = np.frombuffer(r.encode() + b"\0" * 8, dtype=np.uint8)[:8].copy()
        rng = np.random.default_rng(int.from_bytes(seed.tobytes(), "little") ^ 0xA0D10)
        n = int(rng.integers(_WIN, 4 * _RATE))
        payloads.append(rng.integers(0, 256, size=n, dtype=np.uint8).tobytes())
        n_samples.append(n)
    return pa.table(
        {
            "media_ref": pa.array(refs, type=pa.string()),
            "media_type": pa.array(["audio/fake"] * len(refs), type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "n_samples": pa.array(n_samples, type=pa.int32()),
            "sample_rate": pa.array([_RATE] * len(refs), type=pa.int32()),
        }
    )


class AudioWindowAnalyzer:
    """Actor-pool stage: decode (fake PCM) → sliding windows (length
    ``_WIN``, hop ``_HOP``) → one row per window with INTEGER features
    (energy = Σ sample², zero crossings) so results are bit-deterministic
    without float reductions.

    Same explode discipline as :class:`FrameSampler`: whole payloads in,
    many tiny rows out — small input ``batch_size``, vectorized window
    math via ``sliding_window_view`` (no per-sample Python)."""

    def __init__(self, win: int = _WIN, hop: int = _HOP):
        self.win = win
        self.hop = hop

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_numpy(zero_copy_only=False)
        rates = batch.column("sample_rate").to_numpy(zero_copy_only=False)
        out_ref, out_idx, out_ms, out_energy, out_zc = [], [], [], [], []
        for r, p, rate in zip(refs, payloads, rates):
            s = np.frombuffer(p, dtype=np.uint8).astype(np.int64) - 128
            if len(s) < self.win:
                continue
            w = np.lib.stride_tricks.sliding_window_view(s, self.win)[
                :: self.hop
            ]
            energy = (w * w).sum(axis=1)
            sign = w >= 0
            zc = (sign[:, 1:] != sign[:, :-1]).sum(axis=1)
            n = len(w)
            out_ref.append(np.repeat(r, n))
            out_idx.append(np.arange(n, dtype=np.int64))
            out_ms.append(
                (np.arange(n, dtype=np.int64) * self.hop * 1000) // int(rate)
            )
            out_energy.append(energy.astype(np.int64))
            out_zc.append(zc.astype(np.int64))
        if not out_ref:
            return pa.table(
                {
                    "media_ref": pa.array([], type=pa.string()),
                    "win_idx": pa.array([], type=pa.int64()),
                    "start_ms": pa.array([], type=pa.int64()),
                    "energy": pa.array([], type=pa.int64()),
                    "zero_crossings": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "media_ref": pa.array(np.concatenate(out_ref).astype(str)),
                "win_idx": pa.array(np.concatenate(out_idx)),
                "start_ms": pa.array(np.concatenate(out_ms)),
                "energy": pa.array(np.concatenate(out_energy)),
                "zero_crossings": pa.array(np.concatenate(out_zc)),
            }
        )


def media_audio_windows(sf_dir: str) -> "ray.data.Dataset":
    """Pipeline: distinct media refs → fake audio store → actor-pool
    sliding-window analysis (explode shape, per-window rows)."""
    from ..pipelines.geo import parsed_ds

    refs = (
        parsed_ds(sf_dir)
        .select_columns(["media_refs"])
        .map_batches(_explode_refs, batch_format="pyarrow")
        .unique("media_ref")
    )
    audio = synth_audio_table(sorted(refs))
    return ray.data.from_arrow(audio).map_batches(
        AudioWindowAnalyzer,
        batch_format="pyarrow",
        concurrency=2,
        batch_size=32,  # fat binary payloads in, tiny rows out
    )
