"""Onset refinement: CC-based lag alignment across channels.

Host-side equivalents of the reference's onset consistency pass
(reference: detection.py:271-484): given per-hit onset groups, align each
channel's onset to the earliest channel via contribution-normalized
cross-correlation (``ops.xcorr.cross_correlation_lag``) and energy-weighted
onset adjustment.  Used in dataset mining; the CC itself can run on device
via the batched jax variant.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import median_filter

from onset_fingerprinting_tpu.ops.xcorr import (
    cross_correlation_lag,
    cross_correlation_lag_jax,
)


def _cc_section(window, pos0, lookaround):
    """The reference's section prep (multilateration.py:465-474): trim
    before the seed, median filter, keep only downward motion, rectify."""
    from onset_fingerprinting_tpu.ops.filters import median_filter_1d

    w = window.shape[0]
    row = jnp.arange(w)[:, None]
    x = jnp.where(row >= pos0 - lookaround, window.astype(jnp.float32), 0.0)
    x = median_filter_1d(x, 5)
    d = jnp.diff(x, axis=0)
    return jnp.abs(jnp.where(d >= 0, 0.0, d))


@partial(jax.jit, static_argnames=(
    "lookaround", "onset_tolerance", "normalization_cutoff"
))
def cc_refine_lag_jax(
    window: jnp.ndarray,
    pos0: jnp.ndarray,
    pos1: jnp.ndarray,
    lookaround: int = 60,
    onset_tolerance: int = 50,
    normalization_cutoff: int = 10,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Jittable onset-pair lag refinement over a fixed live-audio window —
    the device twin of the locator's CC refinement (reference:
    multilateration.py:457-501).

    :param window: ``[W, 2]`` raw audio (chronological) containing both
        onsets; audio before ``pos0 - lookaround`` is zeroed to reproduce the
        reference's section trimming.
    :param pos0: window-relative position of the (earlier) seed onset
    :param pos1: window-relative position of the new onset
    :returns: ``(refined lag pos1' - pos0, valid)``
    """
    d = _cc_section(window, pos0, lookaround)
    lag, cc_valid = cross_correlation_lag_jax(
        d[:, 0],
        d[:, 1],
        jnp.stack([pos0, pos1]),
        onset_tolerance=onset_tolerance,
        normalization_cutoff=normalization_cutoff,
    )
    in_bounds = (
        (pos0 >= lookaround)
        & (pos1 > pos0)
        & (pos1 < window.shape[0] - 1)
    )
    return lag, cc_valid & in_bounds


@partial(jax.jit, static_argnames=(
    "lookaround", "onset_tolerance", "normalization_cutoff"
))
def cc_refine_adjust_jax(
    window: jnp.ndarray,
    pos0: jnp.ndarray,
    pos1: jnp.ndarray,
    lookaround: int = 60,
    onset_tolerance: int = 50,
    normalization_cutoff: int = 10,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """CC refinement + the reference's energy heuristic (adjust_onset,
    detection.py:299-352): decide which onset of the pair to move toward the
    CC lag by comparing exponentially-weighted rectified energy between each
    onset's old and CC-implied position.

    Fixed-shape device twin of :func:`adjust_onset` over the same prepared
    section used for the CC itself (multilateration.py:491-499).  The shift
    magnitude is bounded by ``onset_tolerance`` (the CC search window), so
    the weight vector has static length.

    :returns: ``(c_seed, c_new, valid)`` — corrections to add to the seed
        (pos0) and new (pos1) onsets; exactly one is nonzero.
    """
    d = _cc_section(window, pos0, lookaround)
    x, y = d[:, 0], d[:, 1]
    lag, cc_valid = cross_correlation_lag_jax(
        x, y,
        jnp.stack([pos0, pos1]),
        onset_tolerance=onset_tolerance,
        normalization_cutoff=normalization_cutoff,
    )
    in_bounds = (
        (pos0 >= lookaround) & (pos1 > pos0) & (pos1 < window.shape[0] - 1)
    )
    ld = (pos1 - pos0) - lag  # |ld| <= onset_tolerance by CC construction
    k = jnp.arange(onset_tolerance + 1)
    n = jnp.abs(ld)
    act = (k < n).astype(jnp.float32)
    denom = jnp.maximum(n - 1, 1).astype(jnp.float32)
    # host adjust_onset: x window weighted exp(linspace(0,-e,n)) descending
    # from its start; y window the same weights reversed (ascending to 1 at
    # its end)
    w_desc = jnp.exp(-jnp.e * k / denom) * act
    w_asc = jnp.exp(-jnp.e * (n - 1 - k) / denom) * act
    sx = jnp.minimum(pos0, pos0 + ld)
    sy = jnp.minimum(pos1, pos1 - ld)
    xa = jnp.take(x, sx + k, mode="clip")
    ya = jnp.take(y, sy + k, mode="clip")
    da = jnp.sum(xa * w_desc) / jnp.maximum(jnp.max(x), 1e-20)
    db = jnp.sum(ya * w_asc) / jnp.maximum(jnp.max(y), 1e-20)
    move_seed = (da > db) & (pos0 + ld >= 0)
    c_seed = jnp.where(move_seed, ld, 0).astype(jnp.int32)
    c_new = jnp.where(move_seed, 0, -ld).astype(jnp.int32)
    return c_seed, c_new, cc_valid & in_bounds


def adjust_onset_rel(
    onsets: list[int], relx: np.ndarray, rely: np.ndarray, new_lag: int
) -> tuple[int, int]:
    """Move whichever onset of a pair gains more relative-envelope height at
    the CC-suggested lag (detection.py:271-296). Returns the new onsets."""
    oa, ob = onsets[0], onsets[1]
    lag_diff = (ob - oa) - new_lag
    da = relx[oa + lag_diff] - relx[oa]
    db = rely[ob - lag_diff] - rely[ob]
    if da > db:
        oa += lag_diff
    else:
        ob -= lag_diff
    return oa, ob


def adjust_onset(
    onsets: list[int], x: np.ndarray, y: np.ndarray, new_lag: int
) -> tuple[int, int]:
    """Decide which onset of a pair to move toward a CC-suggested lag using
    exponentially-weighted signal energy between the old and new positions
    (detection.py:299-352).

    Returns *corrections* ``(ca, cb)`` to be added to the two onsets.
    """
    oa, ob = onsets[0], onsets[1]
    lag_diff = (ob - oa) - new_lag
    exp = np.exp(np.linspace(0, -np.e, abs(lag_diff)))
    n = len(x)
    if lag_diff < 0:
        x_start, x_end = max(oa + lag_diff, 0), min(oa, n)
        y_start, y_end = min(ob, n), min(ob - lag_diff, n)
    else:
        x_start, x_end = oa, min(oa + lag_diff, n)
        y_start, y_end = max(ob - lag_diff, 0), min(ob, n)
    da = np.sum(x[x_start:x_end] * exp[-(x_end - x_start):]) / x.max()
    if y_end == y_start:
        db = 0.0
    else:
        db = (
            np.sum(y[y_start:y_end] * exp[-(y_end - y_start):][::-1]) / y.max()
        )
    if da > db:
        if oa + lag_diff < 0:
            return 0, -lag_diff
        return lag_diff, 0
    return 0, -lag_diff


def filter_data(x: np.ndarray, direction: str) -> np.ndarray:
    """Null samples moving against the expected transient direction
    (detection.py:355-370)."""
    diff = np.diff(x, 1, axis=0, prepend=x[:1])
    if direction == "up":
        x[diff < 0] = 0
    elif direction == "down":
        x[diff > 0] = 0
    else:
        raise ValueError(f"Unknown onset direction {direction!r}")
    return x


def fix_onsets(
    audio: np.ndarray,
    onsets: np.ndarray,
    filter_size: int = 5,
    d: int = 0,
    onset_direction: Optional[str] = None,
    take_abs: bool = False,
    zero_left: bool = False,
    normalization_cutoff: int = 10,
    onset_tolerance: int = 30,
    shift_onsets: int = 0,
) -> np.ndarray:
    """Make per-hit onsets consistent across channels (detection.py:373-451).

    For each onset group: median-filter + optionally direction-null/abs a
    window around the group, then CC-align every channel against the earliest
    channel, moving whichever onset the energy heuristic prefers.
    """
    lookaround = normalization_cutoff + onset_tolerance
    onsets = onsets.copy() + shift_onsets
    for og in onsets:
        idx = np.argsort(og)
        a, b = og[idx[0]], og[idx[-1]]
        section = audio[a - lookaround : b + lookaround]
        section = np.diff(median_filter(section, filter_size, axes=0), d, axis=0)
        if onset_direction == "up":
            section[section < 0] = 0
        elif onset_direction == "down":
            section[section > 0] = 0
        if take_abs:
            section = np.abs(section)
        local = og - (a - lookaround)

        for i in idx[1:]:
            pair = [local[idx[0]], local[i]]
            x = section[:, idx[0]]
            y = section[:, i]
            if zero_left:
                x[: pair[0]] = 0.0
                y[: pair[1]] = 0.0
            new_lag = cross_correlation_lag(
                x,
                y,
                pair,
                normalization_cutoff=normalization_cutoff,
                onset_tolerance=onset_tolerance,
            )
            if new_lag is not None:
                ca, cb = adjust_onset(pair, x, y, new_lag)
                og[idx[0]] += ca
                og[i] += cb
                local[idx[0]] += ca
                local[i] += cb
    return onsets


def detect_onset_region(
    audio: np.ndarray,
    detected_onset: int,
    n: int = 256,
    median_filter_size: int = 5,
    threshold_factor: float = 0.5,
) -> int:
    """Find the start of the loud region around an onset
    (detection.py:454-484)."""
    from scipy.ndimage import binary_opening
    from scipy.signal import medfilt

    start_idx = max(detected_onset - n // 2, 0)
    end_idx = min(detected_onset + n // 2, len(audio))
    region = np.abs(audio[start_idx:end_idx])
    filtered = medfilt(region, kernel_size=median_filter_size)
    mask = filtered > threshold_factor * np.max(filtered)
    mask = binary_opening(mask, structure=np.ones(5))
    return start_idx + int(np.argmax(mask))
