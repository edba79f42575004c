"""Multi-channel streaming amplitude onset detector.

TPU-native re-design of the reference's ``AmplitudeOnsetDetector``
(reference: onset_fingerprinting/detection.py:595-888) and its C kernels
(envelope_follower.c:6-85).  Same algorithm — FluCoMa-AmpSlice-style fast
minus slow AR envelope on rectified floor-clipped dB with adaptive min/max
thresholds, per-channel hysteresis, cooldown debounce, and optional
backtracking — but expressed as one fused, fully jittable per-block step:

    (state, block [B, C]) -> (state, (on [C], deltas [C], rel [B, C]))

The per-sample recurrences (4th-order IIR high-pass, both AR envelopes, EMA
min/max) are fused into a *single* ``lax.scan`` over samples so the whole
block stays in registers/VMEM; the block-level hysteresis logic is plain
vectorized jnp.  Offline processing scans this step over all blocks and vmaps
over batches of recordings; multi-chip throughput shards the batch via
``parallel.sharding``.

Float32 everywhere for exact parity with the reference numerics.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# dB conversions via the VPU-native exp2/log2 transcendentals, with the SAME
# constants as ops.pallas_detector so the scan and Pallas paths agree to
# float32-fusion tolerance (XLA forms FMAs differently per program, so
# bitwise equality is NOT guaranteed; the backtracking walk compares
# smoothed floats against a tolerance and may stop one EMA step apart on
# knife-edge sites — see tests/test_pallas.py).
_LOG2_10_OVER_20 = math.log2(10.0) / 20.0
_20_OVER_LOG2_10 = 20.0 / math.log2(10.0)

from onset_fingerprinting_tpu.core.config import DetectorConfig
from onset_fingerprinting_tpu.ops.filters import butterworth


class DetectorState(NamedTuple):
    """Carried streaming state (all float32/int32/bool, shape [.., C])."""

    zi: jnp.ndarray          # [order, C] high-pass filter state
    fast: jnp.ndarray        # [C] fast AR envelope
    slow: jnp.ndarray        # [C] slow AR envelope
    min_val: jnp.ndarray     # [C] EMA minimum of relative envelope
    max_val: jnp.ndarray     # [C] EMA maximum of relative envelope
    gate: jnp.ndarray        # [C] bool hysteresis state ("above on-threshold")
    prev_rel: jnp.ndarray    # [C] last rel sample of the previous block
    debounce: jnp.ndarray    # [C] int32 cooldown countdown
    bt_buffer: jnp.ndarray   # [Nb, C] rel ring for backtracking (Nb may be 0)
    bt_pos: jnp.ndarray      # scalar int32 ring cursor


@dataclass(frozen=True)
class _Static:
    """Hashable static parameters baked into the jitted step."""

    n_channels: int
    block_size: int
    floor: float
    fast_attack: float
    fast_release: float
    slow_attack: float
    slow_release: float
    cooldown: int
    manual: bool
    use_hipass: bool
    backtrack: bool
    bt_size: int
    bt_alpha: float
    bt_tol: float
    alpha_min: float
    alpha_max: float
    minmin: float
    #: reference quirk (detection.py:790): the off-threshold check ignores
    #: rows before the block's *global* (cross-channel) first-onset index.
    #: True = exact reference parity for one multi-sensor recording.
    #: False = per-channel gating — required when batching independent
    #: streams as extra channels, so streams don't couple.
    coupled_off: bool = True


class DetectorParams(NamedTuple):
    """Trace-time parameters (thresholds may be per-channel arrays)."""

    on_threshold: jnp.ndarray
    off_threshold: jnp.ndarray
    b: jnp.ndarray  # IIR numerator (unused when use_hipass=False)
    a: jnp.ndarray  # IIR denominator


def _make_static(cfg: DetectorConfig) -> _Static:
    if cfg.backtrack and cfg.backtrack_buffer_size < cfg.block_size:
        # the reference asserts this too (detection.py:716-718)
        # — a smaller ring double-writes slots within one block and the
        # backward walk reads fresh samples as history: garbage deltas
        raise ValueError(
            f"backtrack_buffer_size ({cfg.backtrack_buffer_size}) must be "
            f">= block_size ({cfg.block_size}) when backtrack=True"
        )
    bt_alpha = np.float32(2.0 / (cfg.backtrack_smooth_size + 1))
    return _Static(
        n_channels=cfg.n_channels,
        block_size=cfg.block_size,
        floor=float(cfg.floor),
        fast_attack=float(np.float32(1.0 / cfg.fast_attack)),
        fast_release=float(np.float32(1.0 / cfg.fast_release)),
        slow_attack=float(np.float32(1.0 / cfg.slow_attack)),
        slow_release=float(np.float32(1.0 / cfg.slow_release)),
        cooldown=int(cfg.cooldown),
        manual=bool(np.max(cfg.on_threshold) > 1),
        use_hipass=cfg.hipass_freq != 0,
        backtrack=cfg.backtrack,
        bt_size=int(cfg.backtrack_buffer_size) if cfg.backtrack else 0,
        bt_alpha=float(bt_alpha),
        bt_tol=float(np.float32((1 - bt_alpha) ** cfg.backtrack_buffer_size)),
        alpha_min=float(cfg.minmax_alpha_min),
        alpha_max=float(cfg.minmax_alpha_max),
        minmin=float(cfg.minmax_floor),
        coupled_off=cfg.coupled_off_gate,
    )


def detector_init(
    cfg: DetectorConfig,
) -> tuple[_Static, DetectorParams, DetectorState]:
    """Build (static config, params, initial state) for a detector.

    Initial values mirror detection.py:697-711: envelopes start at ``floor``,
    min/max tracker at (0, 10).
    """
    static = _make_static(cfg)
    c = cfg.n_channels
    if static.use_hipass:
        iir = butterworth(cfg.hipass_freq, c, order=4, sr=cfg.sr, btype="high")
        b, a, zi = iir.b, iir.a, iir.zi
    else:
        b = jnp.array([1.0], dtype=jnp.float32)
        a = jnp.array([1.0], dtype=jnp.float32)
        zi = jnp.zeros((0, c), dtype=jnp.float32)
    params = DetectorParams(
        on_threshold=jnp.broadcast_to(
            jnp.asarray(cfg.on_threshold, dtype=jnp.float32), (c,)
        ),
        off_threshold=jnp.broadcast_to(
            jnp.asarray(cfg.off_threshold, dtype=jnp.float32), (c,)
        ),
        b=b,
        a=a,
    )
    state = DetectorState(
        zi=zi,
        fast=jnp.full((c,), cfg.floor, dtype=jnp.float32),
        slow=jnp.full((c,), cfg.floor, dtype=jnp.float32),
        min_val=jnp.zeros((c,), dtype=jnp.float32),
        max_val=jnp.full((c,), 10.0, dtype=jnp.float32),
        gate=jnp.zeros((c,), dtype=bool),
        prev_rel=jnp.zeros((c,), dtype=jnp.float32),
        debounce=jnp.zeros((c,), dtype=jnp.int32),
        bt_buffer=jnp.zeros((static.bt_size, c), dtype=jnp.float32),
        bt_pos=jnp.zeros((), dtype=jnp.int32),
    )
    return static, params, state


def _fused_sample_scan(
    static: _Static, params: DetectorParams, state: DetectorState, x: jnp.ndarray
):
    """One fused scan over the B samples of a block.

    Per sample: IIR high-pass → rectified floor-clipped dB → fast & slow AR
    envelope → relative envelope (back to linear amplitude) → EMA min/max.
    Returns (new scan carry, rel [B, C]).
    """
    fa, fr = jnp.float32(static.fast_attack), jnp.float32(static.fast_release)
    sa, sr_ = jnp.float32(static.slow_attack), jnp.float32(static.slow_release)
    floor = jnp.float32(static.floor)
    am, ax = jnp.float32(static.alpha_min), jnp.float32(static.alpha_max)
    iam, iax = 1 - am, 1 - ax
    mm = jnp.float32(static.minmin)
    b, a = params.b, params.a
    order = state.zi.shape[0]
    eps = jnp.float32(1e-10)

    def step(carry, xt):
        zi, yf, ys, mn, mx = carry
        if static.use_hipass:
            y = b[0] * xt + zi[0]
            znew = [
                b[i + 1] * xt
                + (zi[i + 1] if i + 1 < order else 0.0)
                - a[i + 1] * y
                for i in range(order)
            ]
            zi = jnp.stack(znew)
        else:
            y = xt
        xdb = jnp.float32(_20_OVER_LOG2_10) * jnp.log2(jnp.abs(y + eps))
        xdb = jnp.maximum(xdb, floor)
        df = xdb - yf + eps
        yf = yf + jnp.where(df > 0, fa, fr) * df
        ds = xdb - ys + eps
        ys = ys + jnp.where(ds > 0, sa, sr_) * ds
        rel = jnp.exp2((yf - ys) * jnp.float32(_LOG2_10_OVER_20)) - eps
        rel = jnp.clip(rel, 0.0, -floor)
        if not static.manual:
            mn = jnp.where(
                rel < mm, mm, jnp.where(rel < mn, rel, mn * iam + rel * am)
            )
            mx = jnp.where(rel > mx, rel, mx * iax + rel * ax)
        return (zi, yf, ys, mn, mx), rel

    carry0 = (state.zi, state.fast, state.slow, state.min_val, state.max_val)
    carry, rel = jax.lax.scan(step, carry0, x.astype(jnp.float32))
    return carry, rel


def _backtrack(
    static: _Static, buffer_lin: jnp.ndarray, deltas: jnp.ndarray
) -> jnp.ndarray:
    """Vectorized onset backtracking over all channels.

    Walks each onset backwards through the EMA-smoothed ring while the
    envelope keeps decreasing (within tolerance) — semantics of
    envelope_follower.c:59-85 / detection.py:800-825, run for every channel
    in parallel (callers select the channels that actually fired).
    """
    n = static.bt_size
    alpha = jnp.float32(static.bt_alpha)
    omba = 1 - alpha
    tol = jnp.float32(static.bt_tol)
    c = buffer_lin.shape[1]
    chans = jnp.arange(c)

    i0 = static.block_size - deltas
    cur0 = buffer_lin[n - i0, chans]
    i1 = i0 + 1
    prev0 = buffer_lin[n - i1, chans]
    prevs0 = alpha * prev0 + omba * cur0

    def body(_, carry):
        i, cur, prev, prevs, d, active = carry
        go = active & (cur > prevs) & (jnp.abs(prevs - prev) > tol) & (i + 1 < n)
        d = jnp.where(go, d - 1, d)
        i = jnp.where(go, i + 1, i)
        cur = jnp.where(go, prevs, cur)
        new_prev = buffer_lin[jnp.clip(n - i, 0, n - 1), chans]
        prev = jnp.where(go, new_prev, prev)
        prevs = jnp.where(go, alpha * prev + omba * cur, prevs)
        return i, cur, prev, prevs, d, go

    init = (i1, cur0, prev0, prevs0, deltas, jnp.ones((c,), dtype=bool))
    out = jax.lax.fori_loop(0, n, body, init)
    return out[4]


@partial(jax.jit, static_argnums=0)
def detect_block(
    static: _Static,
    params: DetectorParams,
    state: DetectorState,
    x: jnp.ndarray,
) -> tuple[DetectorState, tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Process one ``[B, C]`` block.

    Returns ``(state, (on [C] bool, deltas [C] int32, rel [B, C]))`` — the
    dense equivalent of the reference's (channels, deltas) lists
    (detection.py:727-798): channel c fired iff ``on[c]``, at block-relative
    sample ``deltas[c]``.
    """
    bsz = static.block_size
    (zi, yf, ys, mn, mx), rel = _fused_sample_scan(static, params, state, x)

    # Backtracking ring update (functional).
    if static.backtrack:
        nb = static.bt_size
        idx = jnp.mod(state.bt_pos + jnp.arange(bsz), nb)
        bt_buffer = state.bt_buffer.at[idx].set(rel)
        bt_pos = jnp.mod(state.bt_pos + bsz, nb)
    else:
        bt_buffer, bt_pos = state.bt_buffer, state.bt_pos

    if static.manual:
        on_th = params.on_threshold
        off_th = params.off_threshold
    else:
        on_th = mx * params.on_threshold + mn
        off_th = mx * params.off_threshold + mn

    crossed_on = (rel > on_th) & ~state.gate & (state.debounce < 1)
    prev_rel_full = jnp.concatenate([state.prev_rel[None], rel[:-1]], axis=0)
    crossed_on &= prev_rel_full < on_th

    on_idx = jnp.argmax(crossed_on, axis=0).astype(jnp.int32)
    on = (on_idx > 0) | crossed_on[0]

    gate = state.gate | on
    debounce = jnp.where(on, jnp.int32(static.cooldown), state.debounce)
    debounce = jnp.where(debounce > 0, debounce - bsz, debounce)

    crossed_off = rel < off_th
    row = jnp.arange(bsz)[:, None]
    if static.coupled_off:
        # Reference quirk kept: rows before the *global* max on-index are
        # ignored for the off-crossing check (detection.py:790).
        crossed_off &= row >= jnp.max(on_idx)
    else:
        crossed_off &= row >= on_idx[None, :]
    gate = jnp.where(jnp.any(crossed_off, axis=0), False, gate)

    deltas = on_idx
    if static.backtrack:
        lin_idx = jnp.mod(bt_pos + jnp.arange(static.bt_size), static.bt_size)
        buffer_lin = bt_buffer[lin_idx]
        bt_deltas = _backtrack(static, buffer_lin, deltas)
        deltas = jnp.where(on, bt_deltas, deltas)

    new_state = DetectorState(
        zi=zi,
        fast=yf,
        slow=ys,
        min_val=mn,
        max_val=mx,
        gate=gate,
        prev_rel=rel[-1],
        debounce=debounce,
        bt_buffer=bt_buffer,
        bt_pos=bt_pos,
    )
    return new_state, (on, deltas, rel)


@partial(jax.jit, static_argnums=0)
def warmup_minmax(
    static: _Static, params: DetectorParams, state: DetectorState, x: jnp.ndarray
) -> DetectorState:
    """Warm up envelopes and min/max tracker on ``x [T, C]`` without
    detecting (detection.py:827-840).  T must be a multiple of block size
    (callers truncate)."""
    blocks = x.reshape(-1, static.block_size, x.shape[-1])

    def step(st, blk):
        (zi, yf, ys, mn, mx), _ = _fused_sample_scan(static, params, st, blk)
        return st._replace(zi=zi, fast=yf, slow=ys, min_val=mn, max_val=mx), None

    state, _ = jax.lax.scan(step, state, blocks)
    return state


@partial(jax.jit, static_argnums=0)
def detect_offline(
    static: _Static,
    params: DetectorParams,
    state: DetectorState,
    x: jnp.ndarray,
) -> tuple[DetectorState, tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Scan the block detector over a whole recording ``[T, C]`` (T a
    multiple of block size).

    Returns dense per-block results ``(on [nb, C], deltas [nb, C],
    rel [T, C])`` — the scan-over-blocks equivalent of the reference's
    offline driver loop (detection.py:73-82).
    """
    bsz = static.block_size
    blocks = x.reshape(-1, bsz, x.shape[-1])

    def step(st, blk):
        st, (on, deltas, rel) = detect_block(static, params, st, blk)
        return st, (on, deltas, rel)

    state, (on, deltas, rel) = jax.lax.scan(step, state, blocks)
    return state, (on, deltas, rel.reshape(-1, x.shape[-1]))


def detect_offline_chunked(
    static: _Static,
    params: DetectorParams,
    state: DetectorState,
    x,
    chunk_blocks: int = 4096,
    backend: str = "scan",
    emit_rel: bool = True,
    interpret: bool = False,
) -> tuple[DetectorState, tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]]:
    """Constant-HBM offline detection over arbitrarily long recordings.

    The streaming detector carries all its state across block boundaries,
    so running it chunk-by-chunk is EXACT — bit-identical to one
    whole-recording dispatch (the reference's own constant-memory block
    loop, detection.py:73-82).  Each chunk of ``chunk_blocks`` detector
    blocks is pushed to the device, scanned, and its dense results pulled
    back to host, so peak HBM is one chunk regardless of recording length
    or channel width — this lifts the 1-second ceiling at C=16384 that a
    single-dispatch f32 recording hits.

    :param x: host or device audio ``[T, C]`` (trailing partial block
        dropped, like the offline drivers)
    :param chunk_blocks: detector blocks per device dispatch
    :param backend: 'scan' (XLA) or 'pallas' (fused kernel)
    :param emit_rel: also assemble the full relative envelope on host
        (skipping it halves device residency and host transfer)
    :returns: ``(final_state, (on [nb, C], deltas [nb, C], rel [T, C] or
        None))`` as host arrays
    """
    if not isinstance(x, jax.Array):
        # host audio; device arrays stay resident — np.asarray here would
        # pull the whole recording through the (slow) device transport and
        # push it back chunk by chunk.  Device slices below run on-device.
        x = np.asarray(x)
    bsz = static.block_size
    t = (x.shape[0] // bsz) * bsz
    x = x[:t]
    if backend == "pallas":
        from onset_fingerprinting_tpu.ops.pallas_detector import (
            pallas_detect_offline,
            pallas_static,
        )

        pstatic = pallas_static(static, params)

        def run(st, xc):
            return pallas_detect_offline(
                pstatic, params, st, xc, interpret, emit_rel=emit_rel
            )
    else:

        def run(st, xc):
            st, (on, d, rel) = detect_offline(static, params, st, xc)
            return st, (on, d, rel if emit_rel else None)

    step = chunk_blocks * bsz
    ons, deltas, rels = [], [], []
    for start in range(0, t, step):
        xc = jnp.asarray(x[start : start + step])
        state, (on, d, rel) = run(state, xc)
        ons.append(np.asarray(on))
        deltas.append(np.asarray(d))
        if emit_rel and rel is not None:
            rels.append(np.asarray(rel))
    on = np.concatenate(ons) if ons else np.zeros((0, x.shape[1]), bool)
    d = np.concatenate(deltas) if deltas else np.zeros(
        (0, x.shape[1]), np.int32
    )
    rel = np.concatenate(rels) if rels else None
    return state, (on, d, rel if emit_rel else None)


class AmplitudeOnsetDetector:
    """Stateful host-facing wrapper with the reference's call contract
    (detection.py:727-798): ``od(x[B, C]) -> (channels, deltas, rel)``.

    Internally a thin shell over the functional jitted core; use the
    functional API directly inside larger jitted pipelines.
    """

    def __init__(self, n_signals: Optional[int] = None, block_size: int = 32,
                 cfg: Optional[DetectorConfig] = None, **kwargs):
        if cfg is None:
            cfg = DetectorConfig(
                n_channels=n_signals, block_size=block_size, **kwargs
            )
        self.cfg = cfg
        self.static, self.params, self.state = detector_init(cfg)

    def __call__(self, x: np.ndarray):
        self.state, (on, deltas, rel) = detect_block(
            self.static, self.params, self.state, jnp.asarray(x)
        )
        on = np.asarray(on)
        deltas = np.asarray(deltas)
        channels = np.nonzero(on)[0]
        return list(channels), list(deltas[channels]), np.asarray(rel)

    def init_minmax_tracker(self, x: np.ndarray) -> None:
        t = (len(x) // self.cfg.block_size) * self.cfg.block_size
        if t:
            self.state = warmup_minmax(
                self.static, self.params, self.state, jnp.asarray(x[:t])
            )

    def init(self, x: np.ndarray, verbose: bool = True) -> np.ndarray:
        """Bulk threshold calibration from representative audio
        (detection.py:842-888): warm the envelopes on the first half-second
        (assumed quiet), derive absolute on/off thresholds from the relative
        envelope's median (noise floor) and max (performance peak), report
        the approximate relative noise threshold per channel, and re-warm
        the filters for continuity.

        Switches the detector to manual (absolute) thresholds — the
        reference leaves ``manual`` False after init, so its freshly computed
        absolute thresholds get re-scaled by the min/max tracker on the next
        call (a latent defect); here init implies manual mode.

        Returns the per-channel relative noise thresholds.
        """
        from onset_fingerprinting_tpu.ops.filters import sliding_max

        bsz = self.cfg.block_size
        sr = self.cfg.sr
        t = (len(x) // bsz) * bsz
        xj = jnp.asarray(x[:t])

        # warm envelopes on 0.1-0.5 s (assumed silent), like the reference
        lo = (int(0.1 * sr) // bsz) * bsz
        hi = (int(0.5 * sr) // bsz) * bsz
        self.state = warmup_minmax(
            self.static, self.params, self.state, xj[lo:hi]
        )
        # full-pass relative envelope
        _, (_, _, rel) = detect_offline(
            self.static, self.params, self.state, xj
        )
        first_sec = rel[: min(sr, t)]
        mins = jnp.median(first_sec, axis=0)
        maxs = jnp.max(rel, axis=0)
        on_abs = maxs * self.cfg.on_threshold + mins
        off_abs = maxs * self.cfg.off_threshold + mins
        noise_max = jnp.median(
            sliding_max(rel, int(sr * 0.01)), axis=0
        )
        noise_thresh = np.asarray((noise_max - mins) / maxs)
        if verbose:
            print(
                "Approx. relative noise thresholds at "
                f"{[float(np.round(v, 3)) for v in noise_thresh]}!"
            )
        # switch to manual absolute thresholds
        import dataclasses

        self.static = dataclasses.replace(self.static, manual=True)
        self.params = self.params._replace(
            on_threshold=jnp.asarray(on_abs, jnp.float32),
            off_threshold=jnp.asarray(off_abs, jnp.float32),
        )
        return noise_thresh


def detect_onsets_amplitude(
    x: np.ndarray,
    block_size: int = 128,
    floor: float = -70.0,
    hipass_freq: float = 2000.0,
    fast_ar: tuple[float, float] = (3.0, 383.0),
    slow_ar: tuple[float, float] = (2205.0, 2205.0),
    on_threshold: float = 0.5,
    off_threshold: float = 0.1,
    cooldown: int = 1323,
    backtrack: bool = False,
    backtrack_buffer_size: int = 128,
    backtrack_smooth_size: int = 5,
    sr: int = 96000,
    backend: str = "scan",
):
    """Offline amplitude detection over a full recording ``[N, C]``.

    Same contract as the reference driver (detection.py:19-86): warms the
    min/max tracker on the first 0.5 s, then processes every full block;
    returns (channels, onsets, rel) with onsets as absolute sample indices.
    ``backend``: 'scan' (portable lax.scan program) or 'pallas' (fused TPU
    kernel, ops.pallas_detector — fastest for wide channel counts; supports
    the full detector contract including backtracking).
    """
    cfg = DetectorConfig(
        n_channels=x.shape[1],
        block_size=block_size,
        floor=floor,
        hipass_freq=hipass_freq,
        fast_attack=fast_ar[0],
        fast_release=fast_ar[1],
        slow_attack=slow_ar[0],
        slow_release=slow_ar[1],
        on_threshold=np.max(on_threshold)
        if np.ndim(on_threshold)
        else on_threshold,
        off_threshold=np.max(off_threshold)
        if np.ndim(off_threshold)
        else off_threshold,
        cooldown=cooldown,
        backtrack=backtrack,
        backtrack_buffer_size=backtrack_buffer_size,
        backtrack_smooth_size=backtrack_smooth_size,
        sr=sr,
    )
    static, params, state = detector_init(cfg)
    params = params._replace(
        on_threshold=jnp.broadcast_to(
            jnp.asarray(on_threshold, jnp.float32), (cfg.n_channels,)
        ),
        off_threshold=jnp.broadcast_to(
            jnp.asarray(off_threshold, jnp.float32), (cfg.n_channels,)
        ),
    )
    warm = (min(int(0.5 * sr), len(x)) // block_size) * block_size
    if warm:
        state = warmup_minmax(static, params, state, jnp.asarray(x[:warm]))
    t = (len(x) // block_size) * block_size
    if backend == "pallas":
        from onset_fingerprinting_tpu.ops.pallas_detector import (
            pallas_detect_offline,
            pallas_static,
        )

        _, (on, deltas, rel) = pallas_detect_offline(
            pallas_static(static, params), params, state, jnp.asarray(x[:t])
        )
    else:
        _, (on, deltas, rel) = detect_offline(
            static, params, state, jnp.asarray(x[:t])
        )
    on = np.asarray(on)
    deltas = np.asarray(deltas)
    blocks, chans = np.nonzero(on)
    order = np.argsort(blocks, kind="stable")
    channels = list(chans[order])
    onsets = list(
        blocks[order] * block_size + deltas[blocks[order], chans[order]]
    )
    return channels, onsets, np.asarray(rel)
