"""Frame-extractor parity against the reference run LIVE (T4, T5's batch_cc).

Loads the reference's actual ``data.py`` (tests/ref_harness) and compares
our gather-based extractors (`data/frames.py`) against its
``sliding_window_view``/``unfold`` implementations on identical audio and
onsets.  Deterministic paths (``max_shift=0``) must be EXACTLY equal;
randomized paths differ only in RNG plumbing (the reference uses the
global np/torch RNGs, ours explicit generators) and are covered by the
window-validity checks in test_data.py.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ref_harness import load_data, reference_available, skip_reason


@pytest.fixture(scope="module")
def ref_data(tmp_path_factory):
    if not reference_available():
        pytest.skip(skip_reason())
    pytest.importorskip("torch")
    return load_data(tmp_path_factory.mktemp("refdata"))


def _fixture(seed=0, n=4096, c=3, n_onsets=6):
    rng = np.random.default_rng(seed)
    audio = rng.normal(0, 1, (n, c)).astype(np.float32)
    base = rng.integers(400, n - 600, n_onsets)
    onsets = base[:, None] + rng.integers(0, 30, (n_onsets, c))
    return audio, np.sort(onsets, axis=0)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(frame_length=256, pre_samples=32),
        dict(frame_length=128, pre_samples=64, add_pre_samples=True),
        dict(frame_length=256, pre_samples=32, use_min_onset=False),
    ],
    ids=["min-onset", "add-pre", "per-channel"],
)
def test_frame_extractor_matches(ref_data, kwargs):
    from onset_fingerprinting_tpu.data.frames import FrameExtractor

    audio, onsets = _fixture()
    ref = ref_data.FrameExtractor(**kwargs)(audio, onsets)
    ours = FrameExtractor(**kwargs)(audio, onsets)
    # both layouts are [O, C, frame]: the reference's min-onset path
    # slides over axis 0 (sliding_window_view appends the window axis
    # last) and its per-channel path stacks per-channel windows — the
    # layout commit 7378fa7 made ours match exactly
    np.testing.assert_array_equal(ours, np.asarray(ref))


def test_frame_extractor_1d_matches(ref_data):
    from onset_fingerprinting_tpu.data.frames import FrameExtractor

    audio, onsets = _fixture()
    ref = ref_data.FrameExtractor(256, 32)(audio[:, 0], onsets[:, 0])
    ours = FrameExtractor(256, 32)(audio[:, 0], onsets[:, 0])
    np.testing.assert_array_equal(ours, np.asarray(ref))


def test_fast_frame_extractor_matches(ref_data):
    from onset_fingerprinting_tpu.data.frames import FastFrameExtractor

    audio, onsets = _fixture(seed=1)
    ref = ref_data.FastFrameExtractor(
        audio, onsets, frame_length=200, pre_samples=40
    )()
    ours = FastFrameExtractor(
        audio, onsets, frame_length=200, pre_samples=40
    )()
    np.testing.assert_array_equal(np.asarray(ours), ref.numpy())


def test_batch_cc_matches(ref_data):
    import torch

    from onset_fingerprinting_tpu.ops.xcorr import batch_full_correlate

    rng = np.random.default_rng(2)
    a = rng.normal(0, 1, (5, 64)).astype(np.float32)
    b = rng.normal(0, 1, (5, 64)).astype(np.float32)
    ref = ref_data.batch_cc(
        torch.from_numpy(a), torch.from_numpy(b)
    ).numpy()
    ours = np.asarray(batch_full_correlate(a, b))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
