"""Spectral (STFT-flux) onset detection.

Native equivalent of the reference's librosa-based offline detector
(reference: detection.py:89-128): A-weighted magnitude STFT → positive
spectral flux → percentile normalization → peak picking.  The STFT + flux run
on device (XLA FFT); peak picking is a cheap host pass over the 1D flux.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from onset_fingerprinting_tpu.ops.stft import a_weighting, spectral_flux, stft


def peak_pick(
    x: np.ndarray,
    pre_max: int,
    post_max: int,
    pre_avg: int,
    post_avg: int,
    delta: float,
    wait: int,
) -> np.ndarray:
    """librosa.util.peak_pick-compatible greedy peak selection.

    ``x[n]`` is a peak iff it is nonzero, equals
    ``max(x[n-pre_max : n+post_max])``, is at least
    ``mean(x[n-pre_avg : n+post_avg]) + delta``, and follows the last
    reported peak by more than ``wait`` samples.  The nonzero condition is
    librosa's: its candidate mask is ``x * (x == mov_max)`` read through
    ``np.nonzero``, so a zero-valued sample can never report as a peak (and
    in particular silence at the array edges neither reports nor advances
    the ``wait`` suppression chain).
    """
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    pre_max, post_max = int(pre_max), int(post_max)
    pre_avg, post_avg = int(pre_avg), int(post_avg)
    peaks = []
    last = -1 - wait
    for i in range(n):
        if x[i] == 0.0 or i <= last + wait:
            continue
        lo = max(0, i - pre_max)
        hi = min(n, i + post_max)
        if hi <= lo or x[i] < np.max(x[lo:hi]):
            continue
        lo = max(0, i - pre_avg)
        hi = min(n, i + post_avg)
        if x[i] < np.mean(x[lo:hi]) + delta:
            continue
        peaks.append(i)
        last = i
    return np.asarray(peaks, dtype=np.int64)


def detect_onsets_spectral(
    x: np.ndarray,
    n_fft: int = 256,
    hop: int = 32,
    sr: int = 96000,
    return_oe: bool = False,
):
    """A-weighted spectral-flux onset detector (detection.py:89-128).

    Returns onset sample indices (peak frame × hop); with ``return_oe`` also
    the normalized flux envelope.
    """
    D = jnp.abs(stft(jnp.asarray(x, jnp.float32), n_fft=n_fft, hop_length=hop))
    freq = np.fft.rfftfreq(n_fft, 1.0 / sr)
    aw = a_weighting(freq)[:, None]
    D = D * jnp.asarray((aw - aw.min()) / np.abs(aw.min()), jnp.float32)
    oe = spectral_flux(D)
    oe = np.asarray(oe, dtype=np.float64)
    oe /= np.percentile(oe, 99.9)
    peaks = peak_pick(
        oe,
        pre_max=0.12 * sr // hop,
        post_max=0.01 * sr // hop,
        pre_avg=0.12 * sr // hop,
        post_avg=0.01 * sr // hop + 1,
        delta=0.1,
        wait=sr * 0.07 // hop,
    )
    peaks = peaks * hop
    return (peaks, oe) if return_oe else peaks
