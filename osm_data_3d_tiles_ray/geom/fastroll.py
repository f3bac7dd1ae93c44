"""Cheap exact replacements for the hot ``np.roll(a, k, axis=0)`` calls.

``np.roll`` spends most of its time in axis normalization and index
bookkeeping (~10 µs/call); the geometry builders call it per building /
per face, tens of thousands of times per batch.  A two-slice concatenate
is the same result for axis-0 shifts at ~⅓ the cost.  Identical output
for every length (n == 0, 1, shift ≥ n all degenerate to the same
concatenation np.roll would produce for these fixed shifts).
"""

from __future__ import annotations

import numpy as np


def roll_m1(a: np.ndarray) -> np.ndarray:
    """np.roll(a, -1, axis=0)"""
    return np.concatenate((a[1:], a[:1]))


def roll_m2(a: np.ndarray) -> np.ndarray:
    """np.roll(a, -2, axis=0)"""
    if len(a) < 2:
        return np.roll(a, -2, axis=0)
    return np.concatenate((a[2:], a[:2]))


def roll_p1(a: np.ndarray) -> np.ndarray:
    """np.roll(a, 1, axis=0)"""
    return np.concatenate((a[-1:], a[:-1]))


def cross3(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """np.cross for 3-component vectors (same component expressions in the
    same order → bitwise-identical), skipping np.cross's moveaxis/axis-
    normalization machinery (~60 µs/call on small inputs)."""
    ux, uy, uz = u[..., 0], u[..., 1], u[..., 2]
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    shape = np.broadcast_shapes(u.shape, v.shape)
    out = np.empty(shape, dtype=np.result_type(u, v))
    out[..., 0] = uy * vz - uz * vy
    out[..., 1] = uz * vx - ux * vz
    out[..., 2] = ux * vy - uy * vx
    return out
