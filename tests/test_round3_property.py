"""Hypothesis property tests for the round-3 pure kernels (no Ray)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(n=st.integers(0, 2000))
def test_chunk_count_covers_all_tokens(n):
    chunk, overlap = 128, 32
    stride = chunk - overlap
    k = 0 if n == 0 else -(-max(n - overlap, 1) // stride)
    if n == 0:
        assert k == 0
        return
    # coverage: last chunk reaches the last token
    last_start = (k - 1) * stride
    assert last_start < n
    assert last_start + chunk >= n
    # no useless chunk: every chunk contains at least one NEW token
    if k > 1:
        assert (k - 2) * stride + chunk < n or k - 1 == 1


@settings(max_examples=100, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=3), min_size=0,
        max_size=60,
    ),
    w=st.integers(2, 6),
)
def test_winnowing_guarantee_property(words, w):
    """Every w-window of the k-gram stream contains a selected position,
    and selections are window minima (rightmost tie)."""
    k = 3
    grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    if not grams:
        return
    n = len(grams)
    sel = set()
    for q in range(max(n - w + 1, 1)):
        win = grams[q:q + w]
        mg = min(win)
        sel.add(q + max(i for i, g in enumerate(win) if g == mg))
    for q in range(max(n - w + 1, 1)):
        assert any(q <= p <= q + w - 1 for p in sel)
    for p in sel:
        assert any(
            grams[p] == min(grams[q:q + w])
            for q in range(max(0, p - w + 1), min(p, max(n - w, 0)) + 1)
        )


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(4, 60),
    eps=st.floats(0.05, 5.0),
)
def test_simplify_ring_property(seed, n, eps):
    from osm_data_3d_tiles_ray.geom.simplify import simplify_ring

    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n))
    r = rng.uniform(2, 20, n)
    ring = np.stack([r * np.cos(ang), r * np.sin(ang)], axis=1)
    keep = simplify_ring(ring, eps)
    # anchors, monotone indices, determinism
    assert keep[0] == 0
    assert np.all(np.diff(keep) > 0)
    assert np.array_equal(keep, simplify_ring(ring, eps))
    # every dropped vertex within eps of its simplified chord
    kept = list(keep)
    closed = kept + [kept[0] + n]
    ext = np.concatenate([ring, ring])
    for a, b in zip(closed, closed[1:]):
        for m in range(a + 1, b):
            p, A, B = ext[m], ext[a], ext[b]
            ab = B - A
            L2 = float(ab @ ab)
            t = 0.0 if L2 == 0 else float(np.clip((p - A) @ ab / L2, 0, 1))
            d = float(np.hypot(*(p - (A + t * ab))))
            assert d <= eps + 1e-9
