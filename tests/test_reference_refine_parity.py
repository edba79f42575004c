"""Onset-refinement parity against the reference run LIVE (D9-D13).

Drives the reference's actual ``cross_correlation_lag`` /
``adjust_onset(_rel)`` / ``filter_data`` / ``fix_onsets`` /
``detect_onset_region`` (reference: detection.py:195-484, loaded via
tests/ref_harness) and our `detect.refine` / `ops.xcorr` hosts on
identical inputs.  These are exact host-parity shims, so outputs must be
EQUAL (integer onsets/lags) or allclose (float arrays).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ref_harness import load_detection, reference_available, skip_reason


@pytest.fixture(scope="module")
def ref_det(tmp_path_factory):
    if not reference_available():
        pytest.skip(skip_reason())
    return load_detection(tmp_path_factory.mktemp("refdet"))


def _burst_pair(n=512, lag=23, seed=0):
    """Two channels carrying the same decaying burst at a known lag."""
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 0.01, n).astype(np.float64)
    y = rng.normal(0, 0.01, n).astype(np.float64)
    tt = np.arange(160)
    burst = np.sin(2 * np.pi * 0.11 * tt) * np.exp(-tt / 40)
    ox, oy = n // 2 - 40, n // 2 - 40 + lag
    x[ox : ox + 160] += burst
    y[oy : oy + 160] += burst
    return x, y, ox, oy


@pytest.mark.parametrize("d,take_abs", [(0, False), (1, True), (2, False)])
def test_cross_correlation_lag_matches(ref_det, d, take_abs):
    from onset_fingerprinting_tpu.ops.xcorr import cross_correlation_lag

    for seed, lag in [(0, 23), (1, -17), (2, 4)]:
        x, y, ox, oy = _burst_pair(lag=lag, seed=seed)
        # jittered prior onsets: the CC must recover the true lag
        onsets = (ox + 7, oy - 5)
        ref = ref_det.cross_correlation_lag(
            x, y, onsets, d=d, take_abs=take_abs, onset_tolerance=40
        )
        ours = cross_correlation_lag(
            x, y, onsets, d=d, take_abs=take_abs, onset_tolerance=40
        )
        assert ours == ref

        # explicit legal window form
        ref = ref_det.cross_correlation_lag(
            x, y, legal_lags=(lag - 30, lag + 30), d=d, take_abs=take_abs
        )
        ours = cross_correlation_lag(
            x, y, legal_lags=(lag - 30, lag + 30), d=d, take_abs=take_abs
        )
        assert ours == ref


def test_adjust_onset_matches(ref_det):
    from onset_fingerprinting_tpu.detect.refine import (
        adjust_onset,
        adjust_onset_rel,
    )

    for seed, lag, new_lag in [(0, 23, 18), (1, -17, -9), (2, 4, 12)]:
        x, y, ox, oy = _burst_pair(lag=lag, seed=seed)
        onsets = [ox, oy]
        assert adjust_onset(onsets, x, y, new_lag) == ref_det.adjust_onset(
            onsets, x, y, new_lag
        )
        relx, rely = np.abs(x), np.abs(y)
        assert adjust_onset_rel(
            onsets, relx, rely, new_lag
        ) == ref_det.adjust_onset_rel(onsets, relx, rely, new_lag)


def test_filter_data_matches(ref_det):
    from onset_fingerprinting_tpu.detect.refine import filter_data

    rng = np.random.default_rng(5)
    for direction in ("up", "down"):
        x = rng.normal(0, 1, (128, 3))
        # both mutate in place — hand each its own copy
        ours = filter_data(x.copy(), direction)
        ref = ref_det.filter_data(x.copy(), direction)
        np.testing.assert_array_equal(ours, ref)


def test_fix_onsets_matches(ref_det):
    from onset_fingerprinting_tpu.detect.refine import fix_onsets

    rng = np.random.default_rng(6)
    n, c = 8192, 3
    audio = rng.normal(0, 0.01, (n, c))
    tt = np.arange(200)
    burst = np.sin(2 * np.pi * 0.13 * tt) * np.exp(-tt / 50)
    true = []
    for base in (1500, 3500, 6000):
        lags = rng.integers(0, 25, c)
        for ch in range(c):
            audio[base + lags[ch] : base + lags[ch] + 200, ch] += burst
        true.append(base + lags)
    # detected onsets carry a few samples of per-channel jitter
    onsets = np.array(true) + rng.integers(-4, 5, (3, c))

    for kwargs in (
        dict(),
        dict(d=1, take_abs=True),
        dict(onset_direction="up", shift_onsets=2),
        dict(zero_left=True),
    ):
        ref = ref_det.fix_onsets(audio.copy(), onsets.copy(), **kwargs)
        ours = fix_onsets(audio.copy(), onsets.copy(), **kwargs)
        np.testing.assert_array_equal(ours, ref)


def test_detect_onset_region_matches(ref_det):
    from onset_fingerprinting_tpu.detect.refine import detect_onset_region

    rng = np.random.default_rng(7)
    x = rng.normal(0, 0.005, 4096)
    tt = np.arange(300)
    x[2000:2300] += np.sin(2 * np.pi * 0.09 * tt) * np.exp(-tt / 80)
    for onset in (1990, 2010, 2080):
        assert detect_onset_region(x, onset) == ref_det.detect_onset_region(
            x, onset
        )
