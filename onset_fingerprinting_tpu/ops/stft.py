"""Spectral ops: STFT, mel/MFCC features, A-weighting, spectral flux.

Native (jnp, XLA-FFT) replacements for the librosa calls the reference makes
(reference: detection.py:89-128 spectral detector; data.py:562-681
onset-anchored STFT + MFCC).  Mel filterbank uses the Slaney formulation and
the DCT-II/ortho MFCC convention so outputs are librosa-compatible.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def hann(n: int, fftbins: bool = True) -> jnp.ndarray:
    """Periodic (fftbins) or symmetric Hann window."""
    if fftbins:
        return 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(n) / n)
    return 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(n) / (n - 1))


def frame(x: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """[..., N] → [..., n_frames, frame_length] sliding frames."""
    n = x.shape[-1]
    n_frames = 1 + (n - frame_length) // hop_length
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length
        + jnp.arange(frame_length)[None, :]
    )
    return x[..., idx]


def _pad_center(x: jnp.ndarray, size: int) -> jnp.ndarray:
    n = x.shape[-1]
    l = (size - n) // 2
    pad = [(0, 0)] * (x.ndim - 1) + [(l, size - n - l)]
    return jnp.pad(x, pad)


def stft(
    x: jnp.ndarray,
    n_fft: int = 256,
    hop_length: int = 32,
    center: bool = True,
    window: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Librosa-style magnitude-complex STFT: [..., N] → [..., bins, frames]."""
    if window is None:
        window = hann(n_fft)
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode="reflect")
    frames = frame(x, n_fft, hop_length)
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    return jnp.moveaxis(spec, -2, -1)


def onset_stft(
    audio: jnp.ndarray,
    onset: int,
    frame_length: int = 256,
    hop_length: int = 64,
    n_fft: int = 512,
    hop_edge_padding: bool = False,
    method: str = "zerozero",
) -> jnp.ndarray:
    """Onset-anchored STFT with three padding policies (data.py:593-654).

    ``method``:
      - 'zerozero': zero-pad both sides of the onset window,
      - 'prezero': real preceding audio in front, zeros behind,
      - 'pre':     real preceding audio in front, no back padding.
    """
    y = audio[..., onset : onset + frame_length]
    pad_length = (
        frame_length - hop_length if hop_edge_padding else frame_length // 2
    )
    window = hann(frame_length)
    if n_fft > frame_length:
        window = _pad_center(window, n_fft)
    zeros = jnp.zeros(y.shape[:-1] + (pad_length,), dtype=y.dtype)
    pre = audio[..., max(onset - pad_length, 0) : onset]
    if method == "zerozero":
        y = jnp.concatenate([zeros, y, zeros], axis=-1)
    elif method == "prezero":
        y = jnp.concatenate([pre, y, zeros], axis=-1)
    elif method == "pre":
        y = jnp.concatenate([pre, y], axis=-1)
    else:
        raise ValueError(f"unknown padding method {method}")
    frames = frame(y, frame_length, hop_length)
    if n_fft > frame_length:
        frames = _pad_center(frames, n_fft)
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    return jnp.moveaxis(spec, -2, -1)


def window_contribution_weights(
    window: np.ndarray, hop_length: int, hop_edge_padding: bool = False
) -> np.ndarray:
    """Per-frame weights ∝ how much of the signal of interest contributed to
    each STFT frame given windowing (data.py:562-578)."""
    w = []
    start_idx = len(window) // 2 if not hop_edge_padding else hop_length
    for i in range(start_idx, len(window) + hop_length, hop_length):
        w.append(np.trapezoid(window[:i]))
    w += w[-2::-1]
    return np.array(w) / max(w)


# ---------------------------------------------------------------------------
# Mel / MFCC (librosa-compatible: Slaney mel scale + norm, DCT-II ortho)
# ---------------------------------------------------------------------------

def hz_to_mel(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels
    )


def mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int = 40, fmin: float = 0.0, fmax=None
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank ``[n_mels, 1 + n_fft//2]``."""
    if fmax is None:
        fmax = sr / 2
    fftfreqs = np.fft.rfftfreq(n_fft, 1.0 / sr)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


def power_to_db(S: jnp.ndarray, ref: float = 1.0, amin: float = 1e-10, top_db: float = 80.0) -> jnp.ndarray:
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, S))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec


def dct_ii_ortho(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II matrix ``[n_out, n_in]``."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    basis = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in))
    basis *= np.sqrt(2.0 / n_in)
    basis[0] *= 1.0 / np.sqrt(2.0)
    return basis.astype(np.float32)


def cspec_to_mfcc(
    S: jnp.ndarray,
    sr: int,
    fmin: float = 0.0,
    fmax=None,
    n_mels: int = 40,
    n_mfcc: int = 14,
) -> jnp.ndarray:
    """Complex spectrogram ``[..., bins, frames]`` → MFCCs
    ``[..., n_mfcc, frames]`` (data.py:657-680)."""
    n_fft = 2 * (S.shape[-2] - 1)
    mel_fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    power = jnp.abs(S) ** 2
    mels = jnp.einsum("mf,...ft->...mt", mel_fb, power)
    db = power_to_db(mels)
    dct = jnp.asarray(dct_ii_ortho(n_mfcc, n_mels))
    return jnp.einsum("km,...mt->...kt", dct, db)


def a_weighting(frequencies: np.ndarray, min_db: float = -80.0) -> np.ndarray:
    """IEC 61672 A-weighting in dB (librosa.A_weighting equivalent, used by
    the spectral detector at detection.py:105)."""
    f = np.asarray(frequencies, dtype=np.float64)
    f_sq = f**2
    const = np.array([12194.217, 20.598997, 107.65265, 737.86223]) ** 2
    num = const[0] * f_sq**2
    den = (
        (f_sq + const[0])
        * (f_sq + const[1])
        * np.sqrt((f_sq + const[2]) * (f_sq + const[3]))
    )
    weights = 2.0 + 20.0 * (
        np.log10(np.maximum(num, 1e-30)) - np.log10(np.maximum(den, 1e-30))
    )
    if min_db is not None:
        weights = np.maximum(min_db, weights)
    return weights


def spectral_flux(mag: jnp.ndarray) -> jnp.ndarray:
    """Positive first-difference flux over frames: [..., bins, frames] →
    [..., frames-1] mean across bins (detection.py:108-110)."""
    d = mag[..., :, 1:] - mag[..., :, :-1]
    return jnp.maximum(0.0, d).mean(axis=-2)
