"""Tests for on-device onset-window extraction (ops/windows.py)."""

import jax.numpy as jnp
import numpy as np

from onset_fingerprinting_tpu.ops.windows import (
    gather_block_windows,
    top_hit_blocks,
)


def _reference_windows(x, starts, cps, window, pre):
    t, c = x.shape
    s, k = starts.shape
    out = np.zeros((s, k, cps, window), np.float32)
    for i in range(s):
        for j in range(k):
            st = min(max(starts[i, j] - pre, 0), t - window) // 8 * 8
            out[i, j] = x[st : st + window, i * cps : (i + 1) * cps].T
    return out


def test_slab_path_matches_reference():
    """Wide (lane-multiple) channel counts use the slab+mask path."""
    rng = np.random.default_rng(0)
    t, s, cps, w, k = 4096, 64, 4, 256, 5  # C=256: two lane tiles
    x = rng.normal(size=(t, s * cps)).astype(np.float32)
    starts = rng.integers(0, t, (s, k)).astype(np.int32)
    got = np.asarray(
        gather_block_windows(jnp.asarray(x), jnp.asarray(starts), cps, w,
                             pre=64)
    )
    np.testing.assert_array_equal(
        got, _reference_windows(x, starts, cps, w, 64)
    )


def test_pallas_gather_matches_reference():
    """DMA gather kernel (interpret mode) == slab/mask == numpy."""
    rng = np.random.default_rng(3)
    t, s, cps, w, k = 2048, 64, 4, 256, 3
    x = rng.normal(size=(t, s * cps)).astype(np.float32)
    starts = rng.integers(0, t, (s, k)).astype(np.int32)
    got = np.asarray(
        gather_block_windows(
            jnp.asarray(x), jnp.asarray(starts), cps, w, 64,
            "pallas", True,
        )
    )
    np.testing.assert_array_equal(
        got, _reference_windows(x, starts, cps, w, 64)
    )


def test_fallback_path_matches_reference():
    """Narrow channel counts fall back to take_along_axis — same values."""
    rng = np.random.default_rng(1)
    t, s, cps, w, k = 2048, 3, 4, 128, 4  # C=12: not a lane multiple
    x = rng.normal(size=(t, s * cps)).astype(np.float32)
    starts = rng.integers(0, t, (s, k)).astype(np.int32)
    got = np.asarray(
        gather_block_windows(jnp.asarray(x), jnp.asarray(starts), cps, w)
    )
    np.testing.assert_array_equal(
        got, _reference_windows(x, starts, cps, w, 0)
    )


def test_clipping_at_edges():
    rng = np.random.default_rng(2)
    t, s, cps, w = 1024, 32, 4, 256
    x = rng.normal(size=(t, s * cps)).astype(np.float32)
    starts = np.array([[0, t - 1]] * s, np.int32)
    got = np.asarray(
        gather_block_windows(jnp.asarray(x), jnp.asarray(starts), cps, w,
                             pre=64)
    )
    np.testing.assert_array_equal(
        got, _reference_windows(x, starts, cps, w, 64)
    )


def test_top_hit_blocks():
    nb, s, cps, k = 40, 3, 2, 4
    on = np.zeros((nb, s * cps), bool)
    # stream 0: 2 hits; stream 1: none; stream 2: 6 hits (capacity 4)
    on[3, 0] = True
    on[10, 1] = True
    for b in range(5, 35, 5):
        on[b, 4] = True
    starts, valid = top_hit_blocks(jnp.asarray(on), 128, s, k)
    starts, valid = np.asarray(starts), np.asarray(valid)
    assert valid.tolist() == [
        [True, True, False, False],
        [False, False, False, False],
        [True, True, True, True],
    ]
    assert starts[0, :2].tolist() == [3 * 128, 10 * 128]
    assert starts[2].tolist() == [5 * 128, 10 * 128, 15 * 128, 20 * 128]
