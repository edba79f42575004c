"""End-to-end parity against the reference's ACTUAL Python detector.

``test_reference_binary_parity`` checks the three C kernels one by one;
this module runs the reference's full ``AmplitudeOnsetDetector``
(reference: detection.py:595-841 — threshold logic, cooldown, coupled
off-gate, Python backtracking walk, scipy Butterworth front-end) against
our detector on identical audio and compares the DETECTED EVENT STREAMS.
This is the BASELINE.md parity target ("onset sample indices match
reference CPU goldens") verified against the reference itself, not a
re-derived model.

Harness mechanics (nothing from the reference enters this repo):

- the reference package dir is copied to a pytest tmpdir and its
  ``envelope_follower.c`` compiled there (the reference loads the .so
  from next to its own file, and /root/reference is read-only);
- ``detection.py`` is loaded standalone via importlib (skipping the
  package ``__init__`` and its heavier dependency chain);
- ``librosa`` (unused on the amplitude path) is stubbed empty, and
  ``loopmate.circular_array.CircularArray`` is satisfied by OUR host
  ``core.ring_buffer.CircularArray`` — which doubles as an API-parity
  test of that class.

Skips cleanly when the reference checkout or a C compiler is missing.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ref_harness import load_detection, reference_available, skip_reason

SR = 96000
BLOCK = 128


@pytest.fixture(scope="module")
def ref_detection(tmp_path_factory):
    if not reference_available():
        pytest.skip(skip_reason())
    return load_detection(tmp_path_factory.mktemp("refpkg"))


def _hit_audio(n_channels: int, seconds: float = 1.0, seed: int = 0):
    """Quiet noise floor + decisive exponential-decay bursts at known
    spots, staggered across channels (margins far from the thresholds so
    both f32 implementations make identical on/off decisions)."""
    rng = np.random.default_rng(seed)
    t = int(SR * seconds) // BLOCK * BLOCK
    x = rng.normal(0.0, 1e-4, (t, n_channels)).astype(np.float32)
    tt = np.arange(800)
    burst = (
        np.sin(2 * np.pi * 5000 / SR * tt) * np.exp(-tt / 150) * 0.6
    ).astype(np.float32)
    onsets = []
    for k, base in enumerate(range(SR // 5, t - 1000, SR // 4)):
        ch = k % n_channels
        x[base : base + 800, ch] += burst
        onsets.append((ch, base))
    return x, onsets


def _stream(od, x):
    """Drive a detector block-by-block, collecting absolute onset indices
    per channel (the reference's documented usage, detection.py:614-627)."""
    events = []
    for i in range(len(x) // BLOCK):
        block = np.ascontiguousarray(x[i * BLOCK : (i + 1) * BLOCK])
        out = od(block)
        channels, deltas = out[0], out[1]
        for c, d in zip(channels, deltas):
            events.append((int(c), i * BLOCK + int(d)))
    return events


@pytest.mark.parametrize("backtrack", [False, True])
def test_detector_event_stream_matches_reference(ref_detection, backtrack):
    from onset_fingerprinting_tpu.core.config import DetectorConfig
    from onset_fingerprinting_tpu.detect.amplitude import (
        AmplitudeOnsetDetector,
    )

    n_channels = 2
    x, injected = _hit_audio(n_channels)

    od_ref = ref_detection.AmplitudeOnsetDetector(
        n_channels,
        block_size=BLOCK,
        sr=SR,
        backtrack=backtrack,
        backtrack_buffer_size=BLOCK,
    )
    od_tpu = AmplitudeOnsetDetector(
        cfg=DetectorConfig(
            n_channels=n_channels,
            block_size=BLOCK,
            sr=SR,
            backtrack=backtrack,
            backtrack_buffer_size=BLOCK,
        )
    )

    ev_ref = _stream(od_ref, x)
    ev_tpu = _stream(od_tpu, x)

    assert len(ev_ref) >= len(injected) // 2, (
        f"reference found only {len(ev_ref)} events — fixture too timid"
    )
    assert ev_tpu == ev_ref


def test_detector_after_warmup_matches_reference(ref_detection):
    """init_minmax_tracker (detection.py:827-841) warm-up parity: warm both
    detectors on the same lead-in, then the subsequent streamed event
    streams must still be identical (the warm-up advances the filters,
    envelopes and min/max tracker consistently)."""
    from onset_fingerprinting_tpu.core.config import DetectorConfig
    from onset_fingerprinting_tpu.detect.amplitude import (
        AmplitudeOnsetDetector,
    )

    n_channels = 2
    x, injected = _hit_audio(n_channels, seconds=1.5, seed=3)
    warm, live = x[: SR // 2], x[SR // 2 :]

    od_ref = ref_detection.AmplitudeOnsetDetector(
        n_channels, block_size=BLOCK, sr=SR
    )
    od_tpu = AmplitudeOnsetDetector(
        cfg=DetectorConfig(
            n_channels=n_channels, block_size=BLOCK, sr=SR
        )
    )
    od_ref.init_minmax_tracker(warm)
    od_tpu.init_minmax_tracker(warm)

    ev_ref = _stream(od_ref, live)
    ev_tpu = _stream(od_tpu, live)
    assert len(ev_ref) >= 3, "fixture produced too few post-warmup events"
    assert ev_tpu == ev_ref
