"""Pallas TPU kernel: the fused streaming amplitude onset detector.

This is the speed-of-light version of the hot path the reference implements
in C (reference: envelope_follower.c:6-57 + detection.py:727-798): per
sample, 4th-order IIR high-pass → rectified floor-clipped dB → fast & slow
attack/release envelopes → relative envelope → EMA min/max tracking; per
block, adaptive-threshold hysteresis with cooldown.

Why a kernel: the recurrences are sequential over time, and an XLA
``lax.scan`` pays ~µs of loop overhead per sample step on this TPU backend
(measured ~0.4-0.5 s per second of audio regardless of channel width).  Here
the whole time loop runs *inside* one Pallas program: state lives in VMEM
scratch that persists across the (sequential) grid steps, each grid step
processes one detector block with a register-resident ``fori_loop``, and the
block-level threshold logic is evaluated vectorized on the block's
VMEM-resident relative envelope.

Channels are tiled ``[C/128, 128]`` so per-sample vector ops fill VPU lanes;
batch = more channel tiles (the detector is channel-independent, so a batch
of B 4-channel streams is one ``4·B``-channel detector — no vmap, no
recompilation).  dB conversions use exp2/log2 (the VPU-native
transcendentals): 20·log10|x| ≡ (20/log2 10)·log2|x|.

Numerics match ``detect.amplitude.detect_offline`` to float32 tolerance;
golden-tested against it (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from onset_fingerprinting_tpu.core.config import DetectorConfig
from onset_fingerprinting_tpu.detect.amplitude import (
    DetectorParams,
    DetectorState,
    detector_init,
)

LANE = 128
ORDER = 4
#: max channel tiles per pallas_call: S=32 ([bsz,32,128] f32 block in/out
#: double-buffered + scratch) comfortably fits VMEM; S=64 spills (the
#: measured C=8192 cliff).  Wider inputs split into ≤32-tile kernel calls —
#: legal whenever channels are independent (coupled_off=False).
MAX_TILES_PER_CALL = 32
_LOG2_10_OVER_20 = math.log2(10.0) / 20.0
_20_OVER_LOG2_10 = 20.0 / math.log2(10.0)
#: on-threshold pad value: padded channels must never fire
_PAD_THRESHOLD = 1e9


class PallasDetectorStatic(NamedTuple):
    block_size: int
    floor: float
    fast_attack: float
    fast_release: float
    slow_attack: float
    slow_release: float
    cooldown: int
    manual: bool
    alpha_min: float
    alpha_max: float
    minmin: float
    iir_b: tuple  # 5 floats; identity filter when hipass is off
    iir_a: tuple
    coupled_off: bool = True
    backtrack: bool = False
    bt_size: int = 0
    bt_alpha: float = 0.0
    bt_tol: float = 0.0


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _detector_kernel(static: PallasDetectorStatic, emit_rel: bool, *refs):
    """Kernel body.  ``refs`` layout:

    inputs:  x [B,S,128] (grid-sliced), on_th, off_th [S,128],
             zi0 [ORDER,S,128], yf0, ys0, mn0, mx0, gate0, prev0, deb0,
             (bt0 [Nbt,S,128] chronological rel history — only if backtrack)
    outputs: on, delta [1,S,128] i32 (grid-sliced),
             (rel_out [B,S,128] f32 — only when emit_rel),
             zi/yf/ys/mn/mx/gate/prev/deb finals,
             (bt final [Nbt,S,128] — only if backtrack)
    scratch: rel_buf [B,S,128] (block-local), zi_s [ORDER,S,128],
             yf/ys/mn/mx/gate/prev/deb_s [S,128] (persist across grid steps),
             (bt_s [Nbt,S,128] + btd_s [S,128] i32 — only if backtrack)

    ``emit_rel=False`` keeps the relative envelope in scratch only — the
    full-T rel output block otherwise double-buffers in VMEM and caps the
    channel width (S=64 OOMs by <1 MB with it, fits comfortably without).
    """
    (
        x_ref, on_th_ref, off_th_ref, zi0_ref,
        yf0_ref, ys0_ref, mn0_ref, mx0_ref, gate0_ref, prev0_ref, deb0_ref,
    ) = refs[:11]
    n_in = 12 if static.backtrack else 11
    bt0_ref = refs[11] if static.backtrack else None
    n_out = 10 + int(emit_rel) + int(static.backtrack)
    outs = list(refs[n_in : n_in + n_out])
    on_ref, delta_ref = outs[0], outs[1]
    k = 2
    rel_out = outs[k] if emit_rel else None
    k += int(emit_rel)
    (zi_out, yf_out, ys_out, mn_out, mx_out, gate_out, prev_out,
     deb_out) = outs[k : k + 8]
    bt_out = outs[k + 8] if static.backtrack else None
    scratch = refs[n_in + n_out :]
    (rel_ref, zi_s, yf_s, ys_s, mn_s, mx_s, gate_s, prev_s, deb_s) = scratch[
        :9
    ]
    bt_s, btd_s = (scratch[9], scratch[10]) if static.backtrack else (None, None)
    i = pl.program_id(0)
    bsz = static.block_size
    eps = jnp.float32(1e-10)
    floor = jnp.float32(static.floor)
    fa = jnp.float32(static.fast_attack)
    fr = jnp.float32(static.fast_release)
    sa = jnp.float32(static.slow_attack)
    sr_ = jnp.float32(static.slow_release)
    am, ax = jnp.float32(static.alpha_min), jnp.float32(static.alpha_max)
    iam, iax = 1 - am, 1 - ax
    mm = jnp.float32(static.minmin)
    b = [jnp.float32(v) for v in static.iir_b]
    a = [jnp.float32(v) for v in static.iir_a]

    @pl.when(i == 0)
    def _init():
        zi_s[:] = zi0_ref[:]
        yf_s[:] = yf0_ref[:]
        ys_s[:] = ys0_ref[:]
        mn_s[:] = mn0_ref[:]
        mx_s[:] = mx0_ref[:]
        gate_s[:] = gate0_ref[:]
        prev_s[:] = prev0_ref[:]
        deb_s[:] = deb0_ref[:]
        if static.backtrack:
            bt_s[:] = bt0_ref[:]
            btd_s[:] = jnp.zeros(btd_s.shape, jnp.int32)

    # ---- pass 1: per-sample recurrences --------------------------------
    # Three short dependent loops instead of one long chain: the IIR, the
    # dB-domain envelopes, and the EMA min/max tracker each carry only their
    # own recurrence, while the transcendentals (log2 of the filtered
    # signal, exp2 back to linear amplitude) run block-vectorized in
    # CHUNK-row slices where they pipeline across samples instead of
    # stalling the per-sample dependency chain.  Values are bit-identical to
    # the single-loop form (per-sample elementwise op order is unchanged).
    # Tuning notes from the single-loop version still apply: carries >4
    # arrays, manual in-body unrolling, and Mosaic full unroll all multiply
    # compile time to minutes for no runtime win.
    P1CHUNK = 8 if bsz % 8 == 0 else 1
    identity_iir = static.iir_b == (1.0, 0.0, 0.0, 0.0, 0.0) and (
        static.iir_a == (1.0, 0.0, 0.0, 0.0, 0.0)
    )

    if not identity_iir:
        # loop A: 4th-order IIR (DF2T), delay line in the 4-array carry
        def iir_step(t, zi):
            z0, z1, z2, z3 = zi
            xt = x_ref[t]
            y = b[0] * xt + z0
            rel_ref[t] = y
            return (
                b[1] * xt + z1 - a[1] * y,
                b[2] * xt + z2 - a[2] * y,
                b[3] * xt + z3 - a[3] * y,
                b[4] * xt - a[4] * y,
            )

        z = jax.lax.fori_loop(
            0, bsz, iir_step, (zi_s[0], zi_s[1], zi_s[2], zi_s[3])
        )
        zi_s[0], zi_s[1], zi_s[2], zi_s[3] = z

    # block-vectorized: rectified floor-clipped dB of the filtered signal
    xdb_src = x_ref if identity_iir else rel_ref

    def db_chunk(k, _):
        y = xdb_src[pl.ds(k * P1CHUNK, P1CHUNK)]
        xdb = jnp.float32(_20_OVER_LOG2_10) * jnp.log2(jnp.abs(y + eps))
        rel_ref[pl.ds(k * P1CHUNK, P1CHUNK)] = jnp.maximum(xdb, floor)
        return 0

    jax.lax.fori_loop(0, bsz // P1CHUNK, db_chunk, 0)

    # loop B: fast & slow AR envelopes in dB domain (2-array carry); the
    # relative envelope is kept as the dB difference for now
    def env_step(t, carry):
        yf, ys = carry
        xdb = rel_ref[t]
        df = xdb - yf + eps
        yf = yf + jnp.where(df > 0, fa, fr) * df
        ds = xdb - ys + eps
        ys = ys + jnp.where(ds > 0, sa, sr_) * ds
        rel_ref[t] = yf - ys
        return yf, ys

    yf, ys = jax.lax.fori_loop(0, bsz, env_step, (yf_s[:], ys_s[:]))
    yf_s[:] = yf
    ys_s[:] = ys

    # block-vectorized: dB difference → clipped linear relative envelope
    def rel_chunk(k, _):
        d = rel_ref[pl.ds(k * P1CHUNK, P1CHUNK)]
        rel = jnp.exp2(d * jnp.float32(_LOG2_10_OVER_20)) - eps
        rel_ref[pl.ds(k * P1CHUNK, P1CHUNK)] = jnp.clip(rel, 0.0, -floor)
        return 0

    jax.lax.fori_loop(0, bsz // P1CHUNK, rel_chunk, 0)

    # loop C: EMA min/max tracker (2-array carry; skipped in manual mode)
    if static.manual:
        mn, mx = mn_s[:], mx_s[:]
    else:

        def mm_step(t, carry):
            mn, mx = carry
            rel = rel_ref[t]
            mn = jnp.where(
                rel < mm, mm, jnp.where(rel < mn, rel, mn * iam + rel * am)
            )
            mx = jnp.where(rel > mx, rel, mx * iax + rel * ax)
            return mn, mx

        mn, mx = jax.lax.fori_loop(0, bsz, mm_step, (mn_s[:], mx_s[:]))
        mn_s[:] = mn
        mx_s[:] = mx

    # Backtrack history: keep the last Nbt rel samples in chronological
    # order (oldest first).  A shift+append (one block copy) replaces the
    # scan path's ring+linearize (detect_block) — same values, and the
    # walk below then reads plain ascending rows at scalar indices.
    if static.backtrack:
        nbt = static.bt_size
        if nbt > bsz:
            kept = bt_s[pl.ds(bsz, nbt - bsz)]
            bt_s[pl.ds(0, nbt - bsz)] = kept
            bt_s[pl.ds(nbt - bsz, bsz)] = rel_ref[:]
        elif nbt == bsz:
            bt_s[:] = rel_ref[:]
        else:
            bt_s[:] = rel_ref[pl.ds(bsz - nbt, nbt)]

    # ---- pass 2: block-level hysteresis ---------------------------------
    # Boolean logic is expressed with f32 0/1 masks: this Mosaic target
    # rejects i1 vector materialization (trunci i8→i1).  The block is
    # processed in CHUNK-row slices: full-block [B, S, 128] intermediates
    # would each cost B·S·128·4 bytes of VMEM stack (4 MB at S=64) and OOM
    # wide-channel configurations.
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    CHUNK = 8

    def mask(cond):
        return jnp.where(cond, one, zero)

    if static.manual:
        on_th = on_th_ref[:]
        off_th = off_th_ref[:]
    else:
        on_th = mx * on_th_ref[:] + mn
        off_th = mx * off_th_ref[:] + mn
    gate = gate_s[:]  # f32 0/1
    deb = deb_s[:]

    # chunk loop 1: first on-crossing index per channel
    def on_chunk(k, carry):
        first, prev_last = carry
        rel_c = rel_ref[pl.ds(k * CHUNK, CHUNK)]
        prev_full = jnp.concatenate([prev_last[None], rel_c[:-1]], axis=0)
        crossed = (
            mask(rel_c > on_th[None])
            * (one - gate[None])
            * mask(deb[None] < 1)
            * mask(prev_full < on_th[None])
        )
        row = k * CHUNK + jax.lax.broadcasted_iota(
            jnp.int32, rel_c.shape, 0
        )
        first = jnp.minimum(
            first, jnp.min(jnp.where(crossed > 0, row, jnp.int32(bsz)), axis=0)
        )
        return first, rel_c[CHUNK - 1]

    first0 = jnp.full((rel_ref.shape[1], rel_ref.shape[2]), bsz, jnp.int32)
    first, _ = jax.lax.fori_loop(
        0, bsz // CHUNK, on_chunk, (first0, prev_s[:])
    )
    on_f = mask(first < bsz)
    on_idx = jnp.where(first < bsz, first, jnp.int32(0))

    gate = jnp.maximum(gate, on_f)
    deb = jnp.where(on_f > 0, jnp.float32(static.cooldown), deb)
    deb = jnp.where(deb > 0, deb - bsz, deb)

    if static.coupled_off:
        # cross-channel quirk (detection.py:790) for exact reference parity
        off_from = jnp.broadcast_to(jnp.max(on_idx), on_idx.shape)
    else:
        off_from = on_idx

    # chunk loop 2: any off-crossing at/after the first-onset row
    def off_chunk(k, off_any):
        rel_c = rel_ref[pl.ds(k * CHUNK, CHUNK)]
        row = k * CHUNK + jax.lax.broadcasted_iota(
            jnp.int32, rel_c.shape, 0
        )
        off_mask = mask(rel_c < off_th[None]) * mask(row >= off_from[None])
        return jnp.maximum(off_any, jnp.max(off_mask, axis=0))

    off_any = jax.lax.fori_loop(
        0, bsz // CHUNK, off_chunk,
        jnp.zeros((rel_ref.shape[1], rel_ref.shape[2]), jnp.float32),
    )
    gate = gate * (one - off_any)

    gate_s[:] = gate
    deb_s[:] = deb
    prev_s[:] = rel_ref[bsz - 1]

    on_ref[0] = on_f.astype(jnp.int32)

    if static.backtrack:
        # Bounded reverse walk per fired channel (envelope_follower.c:59-85 /
        # detection.py:800-825), as a descending row sweep over the
        # chronological history so every VMEM read is a full-lane row at a
        # scalar index.  Channel c starts its walk when the sweep reaches its
        # onset row r0 = Nbt-1-(bsz-delta); each sweep row it is active, it
        # takes one walk step (cur→EMA-smoothed, delta -= 1) while the
        # envelope keeps decreasing beyond tolerance.  Once the go-condition
        # fails the carried state stops changing, so go stays false — no
        # separate "active" flag needed, keeping the loop carry at 4 arrays
        # (a Mosaic compile-time cliff starts above that).  Unstarted
        # channels carry cur=-1 < prevs=0, so they never step.
        nbt = static.bt_size
        alpha = jnp.float32(static.bt_alpha)
        omba = 1 - alpha
        tol = jnp.float32(static.bt_tol)
        r0 = on_idx + jnp.int32(nbt - 1 - bsz)

        @pl.when(jnp.max(on_f) > 0)
        def _walk():
            def walk_step(j, carry):
                cur, prev, prevs, d = carry
                r = nbt - 2 - j
                rowp = bt_s[r]
                go = mask(cur > prevs) * mask(jnp.abs(prevs - prev) > tol)
                d = d - go.astype(jnp.int32)
                cur = jnp.where(go > 0, prevs, cur)
                prev = jnp.where(go > 0, rowp, prev)
                prevs = jnp.where(go > 0, alpha * rowp + omba * cur, prevs)
                start = mask(r0 == r)
                rowc = bt_s[r + 1]
                cur = jnp.where(start > 0, rowc, cur)
                prev = jnp.where(start > 0, rowp, prev)
                prevs = jnp.where(
                    start > 0, alpha * rowp + omba * rowc, prevs
                )
                return cur, prev, prevs, d

            shape = on_idx.shape
            carry0 = (
                jnp.full(shape, -1.0, jnp.float32),
                jnp.zeros(shape, jnp.float32),
                jnp.zeros(shape, jnp.float32),
                on_idx,
            )
            _, _, _, d = jax.lax.fori_loop(0, nbt - 2, walk_step, carry0)
            btd_s[:] = d

        delta_ref[0] = jnp.where(on_f > 0, btd_s[:], on_idx)
    else:
        delta_ref[0] = on_idx
    if emit_rel:
        rel_out[:] = rel_ref[:]

    # ---- stream state out (last write wins) -----------------------------
    zi_out[:] = zi_s[:]
    yf_out[:] = yf_s[:]
    ys_out[:] = ys_s[:]
    mn_out[:] = mn_s[:]
    mx_out[:] = mx_s[:]
    gate_out[:] = gate_s[:]
    prev_out[:] = prev_s[:]
    deb_out[:] = deb_s[:]
    if static.backtrack:
        bt_out[:] = bt_s[:]


def pallas_static(static, params: DetectorParams) -> PallasDetectorStatic:
    """Bake a detector config + designed IIR into kernel constants."""
    if static.use_hipass:
        iir_b = tuple(float(v) for v in np.asarray(params.b))
        iir_a = tuple(float(v) for v in np.asarray(params.a))
    else:
        iir_b = (1.0, 0.0, 0.0, 0.0, 0.0)  # identity filter
        iir_a = (1.0, 0.0, 0.0, 0.0, 0.0)
    return PallasDetectorStatic(
        block_size=static.block_size,
        floor=static.floor,
        fast_attack=static.fast_attack,
        fast_release=static.fast_release,
        slow_attack=static.slow_attack,
        slow_release=static.slow_release,
        cooldown=static.cooldown,
        manual=static.manual,
        alpha_min=static.alpha_min,
        alpha_max=static.alpha_max,
        minmin=static.minmin,
        iir_b=iir_b,
        iir_a=iir_a,
        coupled_off=static.coupled_off,
        backtrack=static.backtrack,
        bt_size=static.bt_size,
        bt_alpha=static.bt_alpha,
        bt_tol=static.bt_tol,
    )


def _tile(arr: jnp.ndarray, c_pad: int, pad_value: float = 0.0) -> jnp.ndarray:
    """[.., C] → [.., C_pad/128, 128] lane tiling."""
    pad = c_pad - arr.shape[-1]
    if pad:
        arr = jnp.pad(
            arr,
            [(0, 0)] * (arr.ndim - 1) + [(0, pad)],
            constant_values=pad_value,
        )
    return arr.reshape(arr.shape[:-1] + (c_pad // LANE, LANE))


def _untile(arr: jnp.ndarray, c: int) -> jnp.ndarray:
    return arr.reshape(arr.shape[:-2] + (-1,))[..., :c]


@partial(jax.jit, static_argnums=(0, 4, 5))
def pallas_detect_offline(
    pstatic: PallasDetectorStatic,
    params: DetectorParams,
    state: DetectorState,
    x: jnp.ndarray,
    interpret: bool = False,
    emit_rel: bool = True,
):
    """Fused-kernel detector over ``x [T, C]`` (T a multiple of block size).

    Returns ``(new_state, (on [nb, C] bool, deltas [nb, C] i32,
    rel [T, C] f32 or None))`` — the same contract as
    ``detect.amplitude.detect_offline``.  ``emit_rel=False`` skips the full
    relative-envelope output (events only): it halves VMEM block residency,
    allowing channel widths up to C=8192 per call.
    """
    t, c = x.shape
    bsz = pstatic.block_size
    nb = t // bsz
    c_pad = _round_up(max(c, LANE), LANE)
    s = c_pad // LANE

    xt = _tile(x.astype(jnp.float32), c_pad)  # [T, S, 128]
    on_th = _tile(params.on_threshold, c_pad, pad_value=_PAD_THRESHOLD)
    off_th = _tile(params.off_threshold, c_pad)
    if state.zi.shape[0] == ORDER:
        zi0 = _tile(state.zi.astype(jnp.float32), c_pad)
    else:
        zi0 = jnp.zeros((ORDER, s, LANE), jnp.float32)
    tl = lambda v: _tile(v.astype(jnp.float32), c_pad)
    sv = [
        tl(state.fast), tl(state.slow), tl(state.min_val), tl(state.max_val),
        tl(state.gate), tl(state.prev_rel), tl(state.debounce),
    ]
    if pstatic.backtrack:
        nbt = pstatic.bt_size
        lin_idx = jnp.mod(state.bt_pos + jnp.arange(nbt), nbt)
        bt0 = _tile(state.bt_buffer[lin_idx].astype(jnp.float32), c_pad)
    else:
        bt0 = None

    def call_kernel(xt, on_th, off_th, zi0, sv, bt0):
        """One pallas_call over a ≤MAX_TILES_PER_CALL-wide tile group."""
        sl = xt.shape[-2:]
        const2 = pl.BlockSpec(sl, lambda i: (0, 0), memory_space=pltpu.VMEM)
        const3 = pl.BlockSpec(
            (ORDER, *sl), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
        per_block_1 = pl.BlockSpec(
            (1, *sl), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        per_block_b = pl.BlockSpec(
            (bsz, *sl), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        rel_out_specs = [per_block_b] if emit_rel else []
        rel_out_shapes = (
            [jax.ShapeDtypeStruct((t, *sl), jnp.float32)] if emit_rel else []
        )
        if pstatic.backtrack:
            const_bt = pl.BlockSpec(
                (nbt, *sl), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            )
            bt_in, bt_in_specs = [bt0], [const_bt]
            bt_out_specs = [const_bt]
            bt_out_shapes = [jax.ShapeDtypeStruct((nbt, *sl), jnp.float32)]
            bt_scratch = [
                pltpu.VMEM((nbt, *sl), jnp.float32),
                pltpu.VMEM(sl, jnp.int32),
            ]
        else:
            bt_in, bt_in_specs = [], []
            bt_out_specs, bt_out_shapes, bt_scratch = [], [], []
        return pl.pallas_call(
            partial(_detector_kernel, pstatic, emit_rel),
            grid=(nb,),
            in_specs=[per_block_b, const2, const2, const3]
            + [const2] * 7
            + bt_in_specs,
            out_specs=(
                per_block_1,            # on
                per_block_1,            # deltas
                *rel_out_specs,         # rel (optional)
                const3,                 # zi final
                *([const2] * 7),        # state finals
                *bt_out_specs,          # bt history final (optional)
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nb, *sl), jnp.int32),
                jax.ShapeDtypeStruct((nb, *sl), jnp.int32),
                *rel_out_shapes,
                jax.ShapeDtypeStruct((ORDER, *sl), jnp.float32),
                *[jax.ShapeDtypeStruct(sl, jnp.float32) for _ in range(7)],
                *bt_out_shapes,
            ),
            scratch_shapes=[
                pltpu.VMEM((bsz, *sl), jnp.float32),   # block-local rel
                pltpu.VMEM((ORDER, *sl), jnp.float32),
            ]
            + [pltpu.VMEM(sl, jnp.float32) for _ in range(7)]
            + bt_scratch,
            interpret=interpret,
        )(xt, on_th, off_th, zi0, *sv, *bt_in)

    if s <= MAX_TILES_PER_CALL or pstatic.coupled_off:
        # coupled_off couples every channel through the block's global
        # first-onset index (reference quirk) — it cannot be tile-split.
        # Reference-parity setups are ≤ a few channels, far below the cap.
        outs = call_kernel(xt, on_th, off_th, zi0, sv, bt0)
    else:
        parts = []
        for lo in range(0, s, MAX_TILES_PER_CALL):
            hi = min(lo + MAX_TILES_PER_CALL, s)
            cut = lambda arr: arr[..., lo:hi, :]
            parts.append(
                call_kernel(
                    cut(xt), cut(on_th), cut(off_th), cut(zi0),
                    [cut(v) for v in sv],
                    cut(bt0) if bt0 is not None else None,
                )
            )
        outs = tuple(
            jnp.concatenate([p[j] for p in parts], axis=-2)
            for j in range(len(parts[0]))
        )

    if emit_rel:
        on, deltas, rel, *finals = outs
    else:
        on, deltas, *finals = outs
        rel = None
    zi_f, yf_f, ys_f, mn_f, mx_f, gate_f, prev_f, deb_f = finals[:8]
    if pstatic.backtrack:
        # history is returned chronological (oldest first) == ring @ pos 0
        bt_buffer = _untile(finals[8], c)
        bt_pos = jnp.zeros((), jnp.int32)
    else:
        bt_buffer, bt_pos = state.bt_buffer, state.bt_pos
    new_state = DetectorState(
        zi=_untile(zi_f, c)[: state.zi.shape[0]],
        fast=_untile(yf_f, c),
        slow=_untile(ys_f, c),
        min_val=_untile(mn_f, c),
        max_val=_untile(mx_f, c),
        gate=_untile(gate_f, c) > 0,
        prev_rel=_untile(prev_f, c),
        debounce=_untile(deb_f, c).astype(jnp.int32),
        bt_buffer=bt_buffer,
        bt_pos=bt_pos,
    )
    return new_state, (
        _untile(on, c) > 0,
        _untile(deltas, c),
        _untile(rel, c) if emit_rel else None,
    )


def make_pallas_detector(
    cfg: DetectorConfig, interpret: bool = False, emit_rel: bool = True
):
    """(static, params, state, run) with the kernel bound; ``run(state, x)``
    mirrors ``detect_offline``."""
    static, params, state = detector_init(cfg)
    pstatic = pallas_static(static, params)

    def run(state: DetectorState, x: jnp.ndarray):
        return pallas_detect_offline(
            pstatic, params, state, x, interpret, emit_rel
        )

    return static, params, state, run
