"""Eval-utils parity against the reference run LIVE (U4).

Compares `utils/eval.py` against the reference's actual ``utils.py``
(loaded via tests/ref_harness) on identical inputs: clipping detection,
kNN evaluation metrics, the Butterworth high-pass pair, and the membrane
physics helpers (wave_speed, drum_frequency).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ref_harness import load_utils, reference_available, skip_reason


@pytest.fixture(scope="module")
def ref_utils(tmp_path_factory):
    if not reference_available():
        pytest.skip(skip_reason())
    pytest.importorskip("sklearn")
    return load_utils(tmp_path_factory.mktemp("refutils"))


def test_clipping_audio_matches(ref_utils):
    import pandas as pd

    from onset_fingerprinting_tpu.utils.eval import clipping_audio

    rng = np.random.default_rng(0)
    x = rng.uniform(-0.8, 0.8, 4000).astype(np.float32)
    x[350:353] = 1.0   # inside example 1
    x[2810] = -1.0     # inside example 9
    starts = np.arange(0, 4000, 300)
    labels = pd.DataFrame({"start": starts, "end": starts + 299})
    assert clipping_audio(x, labels) == ref_utils.clipping_audio(x, labels)
    assert clipping_audio(x, labels) == {1, 9}


def test_knn_metrics_matches(ref_utils):
    from sklearn.neighbors import KNeighborsClassifier

    from onset_fingerprinting_tpu.utils.eval import knn_metrics

    rng = np.random.default_rng(1)
    X_train = rng.normal(0, 1, (60, 5))
    y_train = rng.integers(0, 3, 60)
    X_test = rng.normal(0, 1, (24, 5))
    y_test = rng.integers(0, 3, 24)
    knn = KNeighborsClassifier(n_neighbors=5).fit(X_train, y_train)

    ours = knn_metrics(X_test, y_train, y_test, knn)
    ref = ref_utils.knn_metrics(X_test, y_train, y_test, knn)
    assert set(ours) == set(ref)
    for c in ref:
        np.testing.assert_allclose(ours[c][0], ref[c][0])
        np.testing.assert_allclose(ours[c][1], ref[c][1])


def test_butter_highpass_matches(ref_utils):
    from onset_fingerprinting_tpu.utils.eval import (
        butter_highpass,
        butter_highpass_filter,
    )

    b_ours, a_ours = butter_highpass(2000, 96000, order=4)
    b_ref, a_ref = ref_utils.butter_highpass(2000, 96000, order=4)
    np.testing.assert_allclose(b_ours, b_ref)
    np.testing.assert_allclose(a_ours, a_ref)

    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, 2048)
    np.testing.assert_allclose(
        butter_highpass_filter(x, 2000, 96000),
        ref_utils.butter_highpass_filter(x, 2000, 96000),
    )


def test_membrane_physics_matches(ref_utils):
    from onset_fingerprinting_tpu.utils.eval import (
        drum_frequency,
        wave_speed,
    )

    for T0, rho0 in [(1000.0, 0.26), (2500.0, 0.31)]:
        assert wave_speed(T0, rho0) == pytest.approx(
            ref_utils.wave_speed(T0, rho0), rel=1e-12
        )
        for m, n in [(0, 1), (1, 1), (2, 3)]:
            assert drum_frequency(0.3556, T0, rho0, m, n) == pytest.approx(
                ref_utils.drum_frequency(0.3556, T0, rho0, m, n), rel=1e-9
            )
