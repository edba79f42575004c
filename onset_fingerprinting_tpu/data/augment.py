"""jax-native audio augmentations.

Replaces the reference's audiomentations pipeline (reference: data.py:18-28,
408: AddGaussianNoise, AirAbsorption, SevenBandParametricEQ, TanhDistortion,
combined with ``SomeOf((0, 3))``).  Each augmentation is a pure function
``(key, audio [.., N], sr) -> audio`` so whole batches augment on device
under jit/vmap — augmentation throughput was the reference's stated training
bottleneck (data.py:360-366).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_noise(
    key: jax.Array,
    audio: jnp.ndarray,
    sr: int = 96000,
    min_amplitude: float = 0.001,
    max_amplitude: float = 0.015,
) -> jnp.ndarray:
    """Additive white noise with a random amplitude (audiomentations
    AddGaussianNoise defaults)."""
    k1, k2 = jax.random.split(key)
    amp = jax.random.uniform(k1, (), minval=min_amplitude, maxval=max_amplitude)
    return audio + amp * jax.random.normal(k2, audio.shape, audio.dtype)


def _biquad_peak_coeffs(f0, gain_db, q, sr):
    """RBJ peaking-EQ biquad coefficients (vectorizable in jnp)."""
    a = 10.0 ** (gain_db / 40.0)
    w0 = 2 * jnp.pi * f0 / sr
    alpha = jnp.sin(w0) / (2 * q)
    cosw = jnp.cos(w0)
    b0 = 1 + alpha * a
    b1 = -2 * cosw
    b2 = 1 - alpha * a
    a0 = 1 + alpha / a
    a1 = -2 * cosw
    a2 = 1 - alpha / a
    return (
        jnp.stack([b0, b1, b2]) / a0,
        jnp.stack([jnp.ones_like(a0), a1 / a0, a2 / a0]),
    )


def _biquad_apply(b, a, x):
    """Apply one biquad along the last axis via DF2T scan."""

    def step(z, xt):
        y = b[0] * xt + z[0]
        z0 = b[1] * xt + z[1] - a[1] * y
        z1 = b[2] * xt - a[2] * y
        return jnp.stack([z0, z1]), y

    z0 = jnp.zeros((2,) + x.shape[:-1], x.dtype)
    _, y = jax.lax.scan(step, z0, jnp.moveaxis(x, -1, 0))
    return jnp.moveaxis(y, 0, -1)


_EQ_BANDS = np.array([50.0, 150.0, 400.0, 1000.0, 2500.0, 6300.0, 16000.0])


def seven_band_eq(
    key: jax.Array,
    audio: jnp.ndarray,
    sr: int = 96000,
    min_gain_db: float = -10.0,
    max_gain_db: float = 10.0,
) -> jnp.ndarray:
    """Seven-band parametric EQ with random per-band gains
    (audiomentations SevenBandParametricEQ equivalent)."""
    gains = jax.random.uniform(
        key, (7,), minval=min_gain_db, maxval=max_gain_db
    )
    y = audio
    for i, f0 in enumerate(_EQ_BANDS):
        if f0 >= sr / 2:
            continue
        b, a = _biquad_peak_coeffs(jnp.float32(f0), gains[i], 1.0, sr)
        y = _biquad_apply(b, a, y)
    return y


def air_absorption(
    key: jax.Array,
    audio: jnp.ndarray,
    sr: int = 96000,
    min_distance: float = 10.0,
    max_distance: float = 50.0,
) -> jnp.ndarray:
    """Distance-dependent high-frequency damping (audiomentations
    AirAbsorption equivalent): first-order lowpass whose cutoff falls with
    simulated distance."""
    dist = jax.random.uniform(key, (), minval=min_distance, maxval=max_distance)
    # empirical: ~20 kHz at 10 m shrinking toward ~3 kHz at 100 m
    cutoff = 20000.0 * jnp.exp(-dist / 50.0) + 2000.0
    alpha = 1.0 - jnp.exp(-2 * jnp.pi * cutoff / sr)

    def step(y, xt):
        y = y + alpha * (xt - y)
        return y, y

    z0 = jnp.zeros(audio.shape[:-1], audio.dtype)
    _, y = jax.lax.scan(step, z0, jnp.moveaxis(audio, -1, 0))
    return jnp.moveaxis(y, 0, -1)


def tanh_distortion(
    key: jax.Array,
    audio: jnp.ndarray,
    sr: int = 96000,
    min_distortion: float = 0.005,
    max_distortion: float = 0.1,
) -> jnp.ndarray:
    """Soft-clipping distortion with random drive, RMS-matched like
    audiomentations TanhDistortion."""
    k1 = key
    d = jax.random.uniform(k1, (), minval=min_distortion, maxval=max_distortion)
    # map distortion amount to drive gain
    gain = 1.0 + 30.0 * d
    rms_in = jnp.sqrt(jnp.mean(audio**2) + 1e-12)
    y = jnp.tanh(gain * audio)
    rms_out = jnp.sqrt(jnp.mean(y**2) + 1e-12)
    return y * (rms_in / rms_out)


AUGMENTATIONS: Sequence[Callable] = (
    gaussian_noise,
    air_absorption,
    seven_band_eq,
    tanh_distortion,
)


def some_of(
    key: jax.Array,
    audio: jnp.ndarray,
    sr: int = 96000,
    augmentations: Sequence[Callable] = AUGMENTATIONS,
    max_k: int = 3,
) -> jnp.ndarray:
    """Apply a random subset of up to ``max_k`` augmentations
    (audiomentations ``SomeOf((0, 3))``, data.py:408).

    Jit/vmap-friendly: every augmentation is computed and blended by a
    boolean mask (cheap relative to gather/training cost).
    """
    n = len(augmentations)
    k_key, sel_key, *aug_keys = jax.random.split(key, 2 + n)
    k = jax.random.randint(k_key, (), 0, max_k + 1)
    order = jax.random.permutation(sel_key, n)
    chosen = jnp.zeros((n,), bool).at[order[:max_k]].set(
        jnp.arange(max_k) < k
    )
    y = audio
    for i, fn in enumerate(augmentations):
        out = fn(aug_keys[i], y, sr)
        y = jnp.where(chosen[i], out, y)
    return y
