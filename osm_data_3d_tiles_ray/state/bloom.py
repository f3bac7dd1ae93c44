"""Distributed Bloom filter build + vectorized membership probe.

The classic exchange-volume optimization for keyed joins: when one side
of a key exchange is known to keep only a small fraction of the other
side's rows, build a Bloom filter of the keep-keys DISTRIBUTED (each
block reduces to one fixed-size bit-array partial; the driver ORs the
bounded partials) and broadcast the ~hundred-KB filter into the fat
side's scan.  False positives only mean a few extra rows ride the
exchange — results are IDENTICAL to the unfiltered plan, so the same
oracle verifies both.

Hashes: k independent Jenkins mixes (geom/rng.py) over the key's low
and high 32-bit halves — pure functions, identical on every node.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..geom.rng import jenkins_mix


def _bloom_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) array of bit positions for int64 keys."""
    lo = keys.astype(np.uint64).astype(np.uint32)
    hi = (keys.astype(np.uint64) >> np.uint64(32)).astype(np.uint32)
    out = np.empty((k, len(keys)), dtype=np.int64)
    for j in range(k):
        tag = np.uint32((j * 2654435761 + 0x9E3779B9) & 0xFFFFFFFF)
        h = jenkins_mix(lo ^ tag)
        h = jenkins_mix(h ^ hi)
        out[j] = (
            h.astype(np.uint64) % np.uint64(m_bits)
        ).astype(np.int64)
    return out


def bloom_build(
    ds: "ray.data.Dataset", col: str, m_bits: int = 1 << 20, k: int = 4
) -> np.ndarray:
    """Build the filter distributed: one fixed-size uint64 word-array
    partial per block, OR-reduced on the driver (bounded: blocks ×
    m_bits/8 bytes; m_bits is a constant, not data-sized)."""
    n_words = m_bits // 64

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(col).to_numpy(zero_copy_only=False)
        words = np.zeros(n_words, dtype=np.uint64)
        pos = _bloom_positions(keys, m_bits, k).ravel()
        np.bitwise_or.at(
            words, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64)
        )
        return pa.table({"words": pa.array([words.tobytes()])})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc = np.zeros(n_words, dtype=np.uint64)
    for r in rows:
        acc |= np.frombuffer(r["words"], dtype=np.uint64)
    return acc


def bloom_probe(
    words: np.ndarray, keys: np.ndarray, m_bits: int = 1 << 20, k: int = 4
) -> np.ndarray:
    """Vectorized membership mask (True = possibly present)."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(keys, m_bits, k)
    hit = np.ones(len(keys), dtype=bool)
    for j in range(k):
        p = pos[j]
        hit &= (
            (words[p >> 6] >> (p & 63).astype(np.uint64))
            & np.uint64(1)
        ).astype(bool)
    return hit
