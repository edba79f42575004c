"""Cross-correlation ops: full/batched CC, lag picking, streaming CC.

Replaces, TPU-natively, three reference components:

- ``np.correlate``-based lag finding (reference: multilateration.py:878-899).
- The contribution-normalized legal-lag CC picker
  ``cross_correlation_lag`` (reference: detection.py:195-268).
- The C streaming cross-correlation extension ``online_cc.CrossCorrelation``
  (reference: c/cross_corr.c:106-323).  The C kernel maintains incremental
  per-lag ring-buffer sums with Kahan compensation and a rotating exact
  recompute to bound FP drift; on TPU the right idiom is simply to recompute
  the full CC of the two ring windows each block with one fused
  (FFT or MXU conv) op — O(n log n) per block, *zero* drift by construction,
  and trivially batchable over sensor pairs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Full cross-correlation
# ---------------------------------------------------------------------------

def full_correlate(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``np.correlate(a, b, mode='full')`` for equal-length 1D inputs.

    Index ``n-1`` is lag 0; index ``n-1+l`` is ``sum_m a[m+l] * b[m]``.
    Computed via rFFT (fp32-exact to ~1e-4 abs) — on TPU this is one fused
    FFT·conj·iFFT program; direct convs at 'highest' precision compile and
    run far worse on both CPU and TPU.
    """
    return batch_full_correlate(a, b)


def _fft_len(n: int) -> int:
    l = 1
    while l < 2 * n - 1:
        l *= 2
    return l


def batch_full_correlate(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched full CC over the last axis via rFFT: ``[..., n] × [..., n] →
    [..., 2n-1]``.  fp32-exact to ~1e-5 relative; use for large batches where
    the FFT beats direct conv."""
    n = a.shape[-1]
    L = _fft_len(n)
    fa = jnp.fft.rfft(a, n=L)
    fb = jnp.fft.rfft(b, n=L)
    r = jnp.fft.irfft(fa * jnp.conj(fb), n=L)
    # r[l mod L] = sum_m a[m+l] b[m]; negative lags live at the tail.
    return jnp.concatenate([r[..., L - (n - 1):], r[..., :n]], axis=-1)


def _dft_matrices(n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Constant matrices for self-correlation as two MXU matmuls.

    ``L`` need not be a power of two (unlike the FFT path) — just ≥ 2n-1
    and a lane-friendly multiple of 16.  The forward matrices carry only
    the first ``n`` rows (a zero-padded signal reads no others — skipping
    the pad saves a full [..., L] intermediate write), and the inverse
    matrix's columns are pre-permuted to emit lags in
    ``np.correlate(mode='full')`` order directly (index ``n-1`` = lag 0),
    so no output concatenate is needed.
    """
    L = ((2 * n - 1 + 15) // 16) * 16
    f = L // 2 + 1
    ang = 2.0 * np.pi * np.outer(np.arange(n), np.arange(f)) / L
    dft_re = np.cos(ang).astype(np.float32)        # [n, F]
    dft_im = (-np.sin(ang)).astype(np.float32)
    # inverse transform of a real (hermitian-symmetric) power spectrum:
    # cc_circ[j] = 1/L * (p0 + 2·Σ_mid p_f cos(2πfj/L) [+ (-1)^j p_nyq]);
    # column j of the output holds circular index (L-(n-1)+j) mod L
    w = np.full(f, 2.0, np.float32)
    w[0] = 1.0
    if L % 2 == 0:
        w[-1] = 1.0
    j = (np.arange(2 * n - 1) + L - (n - 1)) % L
    inv = (
        np.cos(2.0 * np.pi * np.outer(np.arange(f), j) / L)
        * w[:, None]
        / L
    ).astype(np.float32)                            # [F, 2n-1]
    return dft_re, dft_im, inv


def _dft_inv_sin(n: int) -> np.ndarray:
    """Sine inverse matrix for CROSS-correlation DFT (see
    ``batch_cross_correlate_dft``): the cross spectrum of two distinct real
    signals is complex, so the inverse needs the imaginary part too:
    ``cc[j] = 1/L Σ_f w_f (Re_f cos(2πfj/L) − Im_f sin(2πfj/L))``.
    Columns are pre-permuted to full-CC lag order like ``_dft_matrices``'s
    cosine inverse."""
    L = ((2 * n - 1 + 15) // 16) * 16
    f = L // 2 + 1
    w = np.full(f, 2.0, np.float32)
    w[0] = 1.0
    if L % 2 == 0:
        w[-1] = 1.0
    j = (np.arange(2 * n - 1) + L - (n - 1)) % L
    return (
        -np.sin(2.0 * np.pi * np.outer(np.arange(f), j) / L)
        * w[:, None]
        / L
    ).astype(np.float32)                            # [F, 2n-1]


def batch_cross_correlate_dft(
    a: jnp.ndarray,
    b: jnp.ndarray,
    precision=None,
    sum_axis: int | None = None,
) -> jnp.ndarray:
    """Batched CROSS-correlation ``batch_full_correlate(a, b)`` as MXU
    matmuls (the cross twin of ``batch_self_correlate_dft``).

    The cross spectrum ``F(a)·conj(F(b))`` is complex (unlike the real-even
    self power spectrum), so the inverse takes two matmuls — one cosine on
    the real part, one sine on the imaginary part — after four forward
    matmuls.  Same precision semantics and ``sum_axis``
    (sum-before-inverse, linearity) as the self path.  Index ``n-1+l``
    holds ``Σ_m a[m+l]·b[m]`` — ``np.correlate(mode='full')`` order.
    """
    n = a.shape[-1]
    dft_re, dft_im, inv_cos = _dft_matrices(n)
    inv_sin = _dft_inv_sin(n)
    hi = jax.lax.Precision.HIGHEST if precision is None else precision
    a_re = jnp.matmul(a, jnp.asarray(dft_re), precision=hi)
    a_im = jnp.matmul(a, jnp.asarray(dft_im), precision=hi)
    b_re = jnp.matmul(b, jnp.asarray(dft_re), precision=hi)
    b_im = jnp.matmul(b, jnp.asarray(dft_im), precision=hi)
    # F(a)·conj(F(b))
    cross_re = a_re * b_re + a_im * b_im
    cross_im = a_im * b_re - a_re * b_im
    if sum_axis is not None:
        cross_re = cross_re.sum(axis=sum_axis)
        cross_im = cross_im.sum(axis=sum_axis)
    return jnp.matmul(
        cross_re, jnp.asarray(inv_cos), precision=hi
    ) + jnp.matmul(cross_im, jnp.asarray(inv_sin), precision=hi)


def self_and_pair_correlate_dft(
    feats: jnp.ndarray,
    pi: jnp.ndarray,
    pj: jnp.ndarray,
    precision=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel self-CC plus channel-pair cross-CC, sharing ONE set of
    forward DFT matmuls (the CCCNN ``cc_pairs`` serving path).

    :param feats: ``[B, C, K, V]`` per-channel feature maps
    :param pi, pj: ``[P]`` channel indices of each pair
    :returns: ``(self_cc [B, C, 2V-1], pair_cc [B, P, 2V-1])`` — both
        summed over the K maps (on the spectrum, before the inverse).
    """
    n = feats.shape[-1]
    dft_re, dft_im, inv_cos = _dft_matrices(n)
    inv_sin = _dft_inv_sin(n)
    hi = jax.lax.Precision.HIGHEST if precision is None else precision
    re = jnp.matmul(feats, jnp.asarray(dft_re), precision=hi)  # [B,C,K,F]
    im = jnp.matmul(feats, jnp.asarray(dft_im), precision=hi)
    power = (re * re + im * im).sum(axis=2)  # [B, C, F]
    self_cc = jnp.matmul(power, jnp.asarray(inv_cos), precision=hi)
    re_i, im_i = re[:, pi], im[:, pi]  # [B, P, K, F]
    re_j, im_j = re[:, pj], im[:, pj]
    cross_re = (re_i * re_j + im_i * im_j).sum(axis=2)  # [B, P, F]
    cross_im = (im_i * re_j - re_i * im_j).sum(axis=2)
    pair_cc = jnp.matmul(
        cross_re, jnp.asarray(inv_cos), precision=hi
    ) + jnp.matmul(cross_im, jnp.asarray(inv_sin), precision=hi)
    return self_cc, pair_cc


def batch_self_correlate_dft(
    a: jnp.ndarray, precision=None, sum_axis: int | None = None
) -> jnp.ndarray:
    """Self-correlation ``batch_full_correlate(a, a)`` as two plain matmuls.

    XLA's TPU FFT is slow for huge batches of short signals (measured
    ~150 ms for 655k × len-133 signals where this path takes a few ms);
    a DFT is just a matmul, which is exactly what the MXU is for.  The
    power spectrum of a real signal is real and even, so the inverse
    transform is one cosine matmul.  f32-exact to ~1e-4 abs like the FFT
    path — which requires HIGHEST matmul precision (the default,
    ``precision=None``): the TPU default precision is a single bf16 pass
    (~4e-3 relative).  HIGHEST costs ~6 bf16 passes; at fleet-serving
    batch (655k signals) that is ~27 ms vs ~5 ms, so throughput callers
    whose features are bf16 anyway (CCCNN ``dtype=bfloat16``) pass
    ``precision=jax.lax.Precision.DEFAULT`` explicitly.

    ``sum_axis`` sums the result over that (batch) axis — equal to
    ``batch_self_correlate_dft(a).sum(axis=sum_axis)`` but the sum is
    applied to the power spectrum BEFORE the inverse matmul (the
    transform is linear), cutting the inverse work and the output
    traffic by the summed-axis length (the CCCNN sums over its K feature
    maps; measured several ms at fleet-serving batch).
    """
    n = a.shape[-1]
    dft_re, dft_im, inv = _dft_matrices(n)
    hi = jax.lax.Precision.HIGHEST if precision is None else precision
    re = jnp.matmul(a, jnp.asarray(dft_re), precision=hi)
    im = jnp.matmul(a, jnp.asarray(dft_im), precision=hi)
    power = re * re + im * im
    if sum_axis is not None:
        power = power.sum(axis=sum_axis)
    # [..., 2n-1] self-CC, lag order matching np.correlate(mode='full')
    return jnp.matmul(power, jnp.asarray(inv), precision=hi)


def find_lag(a, b) -> int:
    """argmax-lag between two signals (multilateration.py:878-887)."""
    cc = full_correlate(jnp.asarray(a), jnp.asarray(b))
    return int(jnp.argmax(cc)) - (len(a) - 1)


def find_lag_jax(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Jittable scalar lag (device int32)."""
    cc = batch_full_correlate(a, b)
    return jnp.argmax(cc, axis=-1).astype(jnp.int32) - (a.shape[-1] - 1)


def find_lag_multi(a, b, top_n: int = 3):
    """Top-n CC peak lags and squared peak heights
    (multilateration.py:890-899)."""
    from scipy.signal import find_peaks

    cc = np.asarray(full_correlate(jnp.asarray(a), jnp.asarray(b)))
    peaks, _ = find_peaks(cc)
    peaks = peaks[np.argsort(-cc[peaks])][:top_n]
    return peaks - len(a) + 1, cc[peaks] ** 2


# ---------------------------------------------------------------------------
# Contribution-normalized legal-lag CC (the onset refinement primitive)
# ---------------------------------------------------------------------------

def _contribution_normalizer(n: int, cutoff: int) -> np.ndarray:
    norm = np.arange(n) + 1.0
    norm[:cutoff] = cutoff
    return norm


def cross_correlation_lag(
    x: np.ndarray,
    y: np.ndarray,
    onsets: Optional[tuple[int, int]] = None,
    legal_lags: Optional[tuple[int, int]] = None,
    d: int = 0,
    normalization_cutoff: int = 10,
    onset_tolerance: int = 50,
    take_abs: bool = False,
) -> Optional[int]:
    """Host-side refined-lag picker; semantics of detection.py:195-268.

    Normalizes each CC lag by its number of contributing elements (so short
    overlaps can win), then restricts to lags that are legal given either
    prior ``onsets`` ± ``onset_tolerance`` or an explicit ``legal_lags``
    window, and returns the (negated, re-centered) argmax lag — or ``None``
    when the legal window is empty.
    """
    x = np.diff(np.asarray(x, dtype=np.float64), d)
    y = np.diff(np.asarray(y, dtype=np.float64), d)
    if take_abs:
        x, y = np.abs(x), np.abs(y)
    n = len(x)
    cc = np.correlate(x, y, "full")
    norm = _contribution_normalizer(n, normalization_cutoff)
    cc[:n] /= norm
    cc[n:] /= norm[n - 2 :: -1]
    if legal_lags is not None:
        cc = cc[n - legal_lags[1] : n - legal_lags[0]]
        max_adjust = legal_lags[1]
    elif onsets is not None:
        current_lag = onsets[1] - onsets[0]
        center = n - current_lag
        cc = cc[center - onset_tolerance : center + onset_tolerance]
        max_adjust = current_lag + onset_tolerance
    else:
        max_adjust = n - 1
    if len(cc) == 0:
        return None
    return -(int(np.argmax(cc)) - max_adjust)


def cross_correlation_lag_jax(
    x: jnp.ndarray,
    y: jnp.ndarray,
    onsets: jnp.ndarray,
    d: int = 0,
    normalization_cutoff: int = 10,
    onset_tolerance: int = 50,
    take_abs: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Jittable masked variant for device-side refinement.

    ``onsets`` is an int array ``[2]``.  Returns ``(lag, valid)`` where
    ``valid`` is False when the tolerance window falls outside the CC support
    (the host version would have returned None/empty).
    """
    if d > 0:
        x = jnp.diff(x, d)
        y = jnp.diff(y, d)
    if take_abs:
        x, y = jnp.abs(x), jnp.abs(y)
    n = x.shape[-1]
    cc = batch_full_correlate(x, y)
    norm = jnp.asarray(_contribution_normalizer(n, normalization_cutoff))
    full_norm = jnp.concatenate([norm, norm[n - 2 :: -1]])
    cc = cc / full_norm
    current_lag = onsets[1] - onsets[0]
    center = n - current_lag
    idx = jnp.arange(2 * n - 1)
    window = (idx >= center - onset_tolerance) & (idx < center + onset_tolerance)
    valid = (center - onset_tolerance >= 0) & (center + onset_tolerance <= 2 * n - 1)
    masked = jnp.where(window, cc, -jnp.inf)
    arg = jnp.argmax(masked)
    lag = -(arg - (center - onset_tolerance) - (current_lag + onset_tolerance))
    return lag.astype(jnp.int32), valid


# ---------------------------------------------------------------------------
# Streaming cross-correlation (pytree state; batchable over pairs)
# ---------------------------------------------------------------------------

class StreamingCC(NamedTuple):
    """State for block-streaming full cross-correlation of ``P`` pairs over
    the last ``n`` samples of two streams (``P`` leading batch dims allowed).
    """

    buf_a: jnp.ndarray  # [..., n]
    buf_b: jnp.ndarray  # [..., n]


def streaming_cc_init(n: int, batch_shape: tuple = ()) -> StreamingCC:
    z = jnp.zeros(batch_shape + (n,), dtype=jnp.float32)
    return StreamingCC(z, z)


def streaming_cc_update(
    state: StreamingCC, block_a: jnp.ndarray, block_b: jnp.ndarray
) -> tuple[StreamingCC, jnp.ndarray]:
    """Shift in a ``[..., block]`` of new samples and return the full CC
    ``[..., 2n-1]`` over the current windows.

    Output matches ``online_cc.CrossCorrelation(n, block).update(a, b)``
    (c/cross_corr.c:257-273) without its accumulated-drift caveats: every
    block is an exact recompute, fused by XLA into FFT + elementwise +
    iFFT on device.
    """
    b = block_a.shape[-1]
    buf_a = jnp.concatenate([state.buf_a[..., b:], block_a.astype(jnp.float32)], axis=-1)
    buf_b = jnp.concatenate([state.buf_b[..., b:], block_b.astype(jnp.float32)], axis=-1)
    cc = batch_full_correlate(buf_a, buf_b)
    return StreamingCC(buf_a, buf_b), cc


@jax.jit
def streaming_cc_scan(
    state: StreamingCC, blocks_a: jnp.ndarray, blocks_b: jnp.ndarray
) -> tuple[StreamingCC, jnp.ndarray]:
    """Run many streaming-CC updates in ONE device program.

    ``blocks_*`` have shape ``[nb, ..., block]`` (leading scan axis);
    returns ``(state, ccs [nb, ..., 2n-1])`` — per-block full CCs, i.e. the
    whole offline sweep the reference harness loops over (c/test.py:36-38)
    fused into a single dispatch.
    """

    def step(st, ab):
        st, cc = streaming_cc_update(st, ab[0], ab[1])
        return st, cc

    return jax.lax.scan(step, state, (blocks_a, blocks_b))
