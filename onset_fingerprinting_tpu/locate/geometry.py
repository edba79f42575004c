"""Lag maps: expected TDOA (in samples) between sensor pairs over a grid of
candidate strike locations on the drumhead.

jnp re-implementations of the reference's map precompute (reference:
multilateration.py:902-1101).  Grids are cm- (scale=1) or mm- (scale=10)
resolution squares over the drum, NaN outside the (tolerance-padded) circle.
These are pure arrays: legality checks and argmax-matching over them are
vectorized jnp ops that fuse into the serve path.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from onset_fingerprinting_tpu.core.coords import (
    DIAMETER,
    MEDIUM,
    speed_of_sound,
)


def lag_map_2d(
    mic_a,
    mic_b,
    d: float = DIAMETER,
    sr: int = 96000,
    scale: float = 1,
    medium: str = MEDIUM,
    tol: float = 1,
    c: float | None = None,
) -> jnp.ndarray:
    """Expected sample-lag map for a 2D sensor pair
    (multilateration.py:902-942).

    Grid point (i, j) holds ``round((‖p - a‖ - ‖p - b‖) / c * sr)``; NaN
    outside the drum + ``tol`` cm.
    """
    if c is None:
        c = speed_of_sound(100 * scale, medium=medium)
    r = int(np.round(d * scale / 2))
    i, j = jnp.meshgrid(jnp.arange(-r, r + 1), jnp.arange(-r, r + 1))
    outside = i**2 + j**2 > (r + tol * scale) ** 2
    lag_a = jnp.sqrt((i - mic_a[0]) ** 2 + (j - mic_a[1]) ** 2) / c
    lag_b = jnp.sqrt((i - mic_b[0]) ** 2 + (j - mic_b[1]) ** 2) / c
    lag_map = jnp.round((lag_a - lag_b) * sr).astype(jnp.float32)
    return jnp.where(outside, jnp.nan, lag_map)


def lag_map_3d(
    mic_a,
    mic_b,
    d: float = DIAMETER,
    sr: int = 96000,
    scale: float = 1,
    medium: str = MEDIUM,
    tol: float = 1,
    c: float | None = None,
) -> jnp.ndarray:
    """Expected sample-lag map for 3D sensors over the z=0 playing surface
    (multilateration.py:945-1001)."""
    if c is None:
        c = speed_of_sound(100 * scale, medium=medium)
    n = int(np.round(d, 1) * scale)
    r = n // 2
    i, j = jnp.meshgrid(jnp.arange(-r, r + 1), jnp.arange(-r, r + 1))
    outside = i**2 + j**2 > (r + tol * scale) ** 2
    lag_a = (
        jnp.sqrt(
            (i - mic_a[0]) ** 2 + (j - mic_a[1]) ** 2 + mic_a[2] ** 2
        )
        / c
    )
    lag_b = (
        jnp.sqrt(
            (i - mic_b[0]) ** 2 + (j - mic_b[1]) ** 2 + mic_b[2] ** 2
        )
        / c
    )
    lag_map = jnp.round((lag_a - lag_b) * sr).astype(jnp.float32)
    return jnp.where(outside, jnp.nan, lag_map)


def attenuate_intensity(source_loc, mic_loc, reflectivity, intensity_at_source):
    """Angle-dependent intensity attenuation from a surface source to a mic
    (multilateration.py:1018-1040)."""
    dx = mic_loc[0] - jnp.reshape(source_loc[0], (-1,))
    dy = mic_loc[1] - jnp.reshape(source_loc[1], (-1,))
    dz = jnp.full_like(dx, mic_loc[2] - source_loc[2])
    # keep f64 only when x64 is actually enabled (asking for f64 under the
    # default f32 config emits a truncation warning and silently downcasts)
    import jax

    use_f64 = dx.dtype == jnp.float64 and jax.config.jax_enable_x64
    vec = jnp.stack([dx, dy, dz], axis=-1).astype(
        jnp.float64 if use_f64 else jnp.float32
    )
    distance = jnp.linalg.norm(vec, axis=-1)
    unit = vec / jnp.linalg.norm(vec, axis=-1, keepdims=True)
    thetas = jnp.arccos(unit @ jnp.array([0.0, 0.0, 1.0]))
    amp = (
        intensity_at_source
        * (1 + reflectivity * (1 - jnp.abs(jnp.cos(thetas))))
        / distance
    )
    return amp, jnp.degrees(thetas)


def lag_intensity_map(
    mic_a,
    mic_b,
    reflectivity: float = 0.5,
    d: float = DIAMETER,
    sr: int = 96000,
    scale: float = 1,
    medium: str = MEDIUM,
):
    """Lag + per-mic dB intensity maps (multilateration.py:1043-1101)."""
    n = int(np.round(d, 1) * scale)
    r = n // 2
    i, j = jnp.meshgrid(jnp.arange(-r, r + 1), jnp.arange(-r, r + 1))
    c = speed_of_sound(100 * scale, medium=medium)

    def mic_db(mic):
        amp, _ = attenuate_intensity((i, j, 0.0), jnp.asarray(mic), reflectivity, 1.0)
        return 10 * jnp.log10(amp.reshape(i.shape))

    lag_a = jnp.sqrt((i - mic_a[0]) ** 2 + (j - mic_a[1]) ** 2 + mic_a[2] ** 2) / c
    lag_b = jnp.sqrt((i - mic_b[0]) ** 2 + (j - mic_b[1]) ** 2 + mic_b[2] ** 2) / c
    lag_difference = jnp.round((lag_a - lag_b) * sr)
    return (
        lag_difference.astype(jnp.float32),
        mic_db(mic_a).astype(jnp.float32),
        mic_db(mic_b).astype(jnp.float32),
    )
