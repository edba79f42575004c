"""Attack/release envelope followers and EMA min/max trackers.

TPU-native (``lax.scan``) equivalents of the reference's C kernels
(reference: onset_fingerprinting/envelope_follower.c:6-57; ctypes wrappers
detection.py:504-592).  Semantics are matched bit-for-bit in float32:

- AR envelope: one-pole smoother whose coefficient switches between
  ``attack`` and ``release`` depending on the sign of ``x - y + 1e-10``
  (envelope_follower.c:17-22).  Coefficients here are the *reciprocals*
  (e.g. a nominal attack of 3 → coefficient 1/3), exactly as the reference
  wrapper passes them (detection.py:513-514).
- Min/max tracker: running min/max that decays exponentially toward the
  signal, with a hard floor ``minmin`` on the minimum
  (envelope_follower.c:40-52).

All functions operate on ``[T, C]`` blocks with carried ``[C]`` state so they
vmap over batches of streams and scan over unbounded audio.  The hot fused
path (filter → dB → both envelopes → min/max → hysteresis) lives in
``detect.amplitude``; a Pallas kernel version is in ``ops.pallas_kernels``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def ar_envelope(
    x: jnp.ndarray,
    y0: jnp.ndarray,
    attack: float,
    release: float,
) -> jnp.ndarray:
    """Run the AR envelope over ``x [T, C]`` starting from state ``y0 [C]``.

    Returns the full envelope ``[T, C]``; carry the last row as the next
    block's ``y0``.
    """
    attack = jnp.float32(attack)
    release = jnp.float32(release)

    def step(y, xt):
        diff = xt - y + jnp.float32(1e-10)
        y = y + jnp.where(diff > 0, attack, release) * diff
        return y, y

    _, ys = jax.lax.scan(step, y0.astype(jnp.float32), x.astype(jnp.float32))
    return ys


def ar_envelope_block(
    x: jnp.ndarray, y_prev: jnp.ndarray, attack: float, release: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Block-streaming form: returns ``(envelope [T, C], new_state [C])``."""
    ys = ar_envelope(x, y_prev, attack, release)
    return ys, ys[-1]


class MinMaxState(NamedTuple):
    """Per-channel running min/max (envelope_follower.c:27-57)."""

    min_val: jnp.ndarray  # [C]
    max_val: jnp.ndarray  # [C]


def minmax_init(n_channels: int, min0: float = 0.0, max0: float = 10.0) -> MinMaxState:
    """Initial tracker state; defaults match detection.py:703-708."""
    return MinMaxState(
        jnp.full((n_channels,), min0, dtype=jnp.float32),
        jnp.full((n_channels,), max0, dtype=jnp.float32),
    )


def minmax_envelope(
    x: jnp.ndarray,
    state: MinMaxState,
    alpha_min: float = 1e-4,
    alpha_max: float = 1e-5,
    minmin: float = 0.0,
) -> MinMaxState:
    """Update the min/max tracker over a ``[T, C]`` block, returning the
    post-block state (the reference kernel only exposes final values)."""
    am = jnp.float32(alpha_min)
    ax = jnp.float32(alpha_max)
    iam = jnp.float32(1.0) - am
    iax = jnp.float32(1.0) - ax
    mm = jnp.float32(minmin)

    def step(carry, xt):
        mn, mx = carry
        mn = jnp.where(
            xt < mm, mm, jnp.where(xt < mn, xt, mn * iam + xt * am)
        )
        mx = jnp.where(xt > mx, xt, mx * iax + xt * ax)
        return (mn, mx), None

    (mn, mx), _ = jax.lax.scan(
        step, (state.min_val, state.max_val), x.astype(jnp.float32)
    )
    return MinMaxState(mn, mx)
