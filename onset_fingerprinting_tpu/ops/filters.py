"""Stateful IIR filters and small sliding-window ops.

The reference applies a multi-channel Butterworth high-pass via
``scipy.signal.lfilter`` with carried ``zi`` (reference: detection.py:487-501)
and leans on scipy.ndimage median/maximum filters for onset refinement
(detection.py:9,421,875).  Here: filter *design* stays on host (scipy), the
filter *application* is a jittable direct-form-II-transposed ``lax.scan`` that
matches ``lfilter`` exactly, and the sliding-window ops are pure jnp.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as _sig


class IIRState(NamedTuple):
    b: jnp.ndarray  # [order + 1] numerator
    a: jnp.ndarray  # [order + 1] denominator (a[0] == 1)
    zi: jnp.ndarray  # [order, C] carried filter state


def butterworth(
    cutoff: float,
    n_channels: int,
    order: int = 2,
    sr: int = 44100,
    btype: str = "high",
) -> IIRState:
    """Design a Butterworth filter (host-side), zero initial state.

    Matches ButterworthFilter.__init__ (detection.py:492-497) incl. float32
    coefficient casting.
    """
    b, a = _sig.butter(order, cutoff, btype=btype, analog=False, output="ba", fs=sr)
    return IIRState(
        jnp.asarray(np.float32(b)),
        jnp.asarray(np.float32(a)),
        jnp.zeros((order, n_channels), dtype=jnp.float32),
    )


def iir_apply(
    state: IIRState, x: jnp.ndarray
) -> tuple[jnp.ndarray, IIRState]:
    """Apply the IIR filter along axis 0 of ``x [T, C]``, carrying state.

    Direct-form II transposed, identical to ``scipy.signal.lfilter(b, a, x,
    axis=0, zi=zi)``:

        y[t]   = b0 x[t] + z0[t-1]
        z_i[t] = b_{i+1} x[t] + z_{i+1}[t-1] - a_{i+1} y[t]
    """
    b, a, zi = state
    order = zi.shape[0]

    def step(z, xt):
        y = b[0] * xt + z[0]
        znew = [
            b[i + 1] * xt + (z[i + 1] if i + 1 < order else 0.0) - a[i + 1] * y
            for i in range(order)
        ]
        return jnp.stack(znew), y

    z, y = jax.lax.scan(step, zi, x.astype(jnp.float32))
    return y, IIRState(b, a, z)


def ema_smooth(x: jnp.ndarray, alpha: float, y0: jnp.ndarray) -> jnp.ndarray:
    """Exponential moving average along axis 0 (used by onset backtracking,
    detection.py:722-724)."""
    alpha = jnp.float32(alpha)

    def step(y, xt):
        y = alpha * xt + (1 - alpha) * y
        return y, y

    _, ys = jax.lax.scan(step, y0.astype(jnp.float32), x.astype(jnp.float32))
    return ys


def _sliding_windows(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """[T, ...] → [T, size, ...] edge-replicated windows centred per scipy
    'reflect' is not needed; callers choose padding."""
    pad_l = size // 2
    pad_r = size - 1 - pad_l
    xp = jnp.concatenate([
        jnp.repeat(x[:1], pad_l, axis=0), x, jnp.repeat(x[-1:], pad_r, axis=0)
    ])
    idx = jnp.arange(x.shape[0])[:, None] + jnp.arange(size)[None, :]
    return xp[idx]


def median_filter_1d(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Median filter along axis 0 (edge-replicated, matching
    scipy.ndimage.median_filter mode='nearest' used at detection.py:421)."""
    w = _sliding_windows(x, size)
    return jnp.median(w, axis=1)


def sliding_max(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Centered sliding maximum along axis 0 (maximum_filter1d equivalent,
    detection.py:875)."""
    w = _sliding_windows(x, size)
    return jnp.max(w, axis=1)


def sliding_mean(x: jnp.ndarray, size: int) -> jnp.ndarray:
    w = _sliding_windows(x, size)
    return jnp.mean(w, axis=1)


def binary_opening_1d(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """1D binary opening (erosion then dilation) with an all-ones structure,
    matching scipy.ndimage.binary_opening at detection.py:482."""
    xb = x.astype(bool)
    pad = size // 2
    # scipy pads with False at borders for erosion
    xe = jnp.pad(xb, (pad, size - 1 - pad), constant_values=False)
    idx = jnp.arange(x.shape[0])[:, None] + jnp.arange(size)[None, :]
    eroded = jnp.all(xe[idx], axis=1)
    ed = jnp.pad(eroded, (pad, size - 1 - pad), constant_values=False)
    dilated = jnp.any(ed[idx], axis=1)
    return dilated
