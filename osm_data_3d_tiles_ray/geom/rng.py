"""Deterministic per-record RNG (G20) — Jenkins-style 32-bit integer mix.

Reference: ``/root/reference/src/building/building-builder.ts:57-74`` seeds
per-building window UV offsets with a Jenkins hash so results are
reproducible per building.  The engine generalizes this: every "random"
choice (window jitter, point sampling, LOD keep) is a pure function of
(record key, stream tag) — partition-invariant by construction
(SURVEY.md §7.4 determinism-under-parallelism requirement).
"""

from __future__ import annotations

import numpy as np

_M = np.uint32(0xFFFFFFFF)


def jenkins_mix(seed: np.ndarray) -> np.ndarray:
    """Vectorized Jenkins 32-bit integer hash (one full avalanche round)."""
    a = np.asarray(seed, dtype=np.uint32)
    a = (a + np.uint32(0x7ED55D16)) + (a << np.uint32(12))
    a = (a ^ np.uint32(0xC761C23C)) ^ (a >> np.uint32(19))
    a = (a + np.uint32(0x165667B1)) + (a << np.uint32(5))
    a = (a + np.uint32(0xD3A2646C)) ^ (a << np.uint32(9))
    a = (a + np.uint32(0xFD7046C5)) + (a << np.uint32(3))
    a = (a ^ np.uint32(0xB55A4F09)) ^ (a >> np.uint32(16))
    return a


def keyed_uniform(key: np.ndarray, tag: int) -> np.ndarray:
    """Uniform [0,1) per (key, tag) — the engine's Math.random replacement."""
    h = jenkins_mix(np.asarray(key, np.uint64).astype(np.uint32) ^ np.uint32(tag * 2654435761 & 0xFFFFFFFF))
    h = jenkins_mix(h ^ (np.asarray(key, np.uint64) >> np.uint64(32)).astype(np.uint32))
    return h.astype(np.float64) / 4294967296.0
