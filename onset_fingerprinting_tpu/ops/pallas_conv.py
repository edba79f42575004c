"""Fused few-feature conv stack as banded MXU matmuls (batch-on-lanes).

The flagship CCCNN conv stack (reference: model.py:443-533 feature
extractor, train.py:79-90 widths) is a chain of stride-1 Conv1d layers
with TINY feature counts (1 -> 5 -> ... -> 5).  XLA's TPU conv algorithm
leaves the MXU ~96% idle at such widths — the output features occupy 5 of
128 lanes — measured 23.3 ms for the 7-layer stack at the 131k-window
serving batch, ~10x the stack's compute floor.

TPU-native formulation used here (ONE Pallas kernel for the whole stack):

1. **batch on lanes**: activations live in VMEM as per-feature ``[time,
   batch]`` tiles — the batch dimension fills all 128 lanes; features and
   time sit on sublanes, where width 5 costs nothing.
2. **conv as banded matmul**: each block of ``TB`` output positions is one
   MXU matmul ``band [O*TB, I*S] @ window [I*S, B]``.  ``band`` unrolls
   the kernel taps along a Toeplitz band (zeros outside), ``window`` is a
   sublane-ALIGNED slice of the input activations (every activation buffer
   carries 16 leading zero rows so the conv padding offset never
   misaligns a slice).  Full lane utilization at ~1.3-2x FLOP inflation —
   vs the ~25x lane waste of a 5-feature XLA conv.
3. **whole stack fused**: every layer's activations stay resident in
   VMEM; HBM traffic is one read of the input and one write of the final
   feature maps.  Intermediate layers never touch HBM.

Differentiable via a custom VJP: the backward pass computes exact
gradients of the mathematically-identical XLA conv chain, so
``CCCNN(conv_impl='pallas')`` trains (gradients match ``conv_impl='conv'``
to ~1e-7).  The param tree is identical to ``nn.Conv``, so checkpoints
swap freely between implementations.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

LANE = 128
#: block-loop unroll factor for body='looped'.  Mosaic's fori_loop
#: lowering supports only unroll=1 or full, so >1 is a MANUAL unroll —
#: measured on v5e at the serving shape: unroll=1 compiles in ~54 s cold,
#: unroll=2 re-explodes Mosaic compile to ~600 s (dynamic-offset access
#: scheduling, not op count, is the cliff).  Keep 1.
_UNROLL = int(_os.environ.get("OFPTPU_CONV_UNROLL", "1"))
#: default kernel body (see conv_stack_fused's ``body`` param and the
#: measured table in _stack_kernel's docstring): 'unrolled' is the serving
#: choice — fastest steady state, with the cold-compile cost owned by the
#: persistent compile cache and the bench's self-warming pass
_DEFAULT_BODY = _os.environ.get("OFPTPU_CONV_BODY", "unrolled")
#: leading zero rows in every activation buffer.  Must be >= the conv
#: padding and a multiple of the bf16 sublane tile (16) so every
#: time-block slice ``[t0 : t0 + S]`` starts tile-aligned regardless of
#: the padding offset.
_Z = 16
_ALIGN = 16

# the shared activation registry (models/fcnn.py) plus identity, so every
# name valid for conv_impl='conv'/'mxu' stays valid here — a second
# hand-maintained dict would drift
from onset_fingerprinting_tpu.models.fcnn import ACTIVATIONS as _FCNN_ACTS

_ACTIVATIONS = dict(_FCNN_ACTS, linear=lambda x: x)


def _rnd(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass(frozen=True)
class _Layer:
    kernel: int
    in_feat: int
    out_feat: int
    pad: int
    t_in: int
    t_out: int
    #: output positions per matmul block (the band's M = out_feat * tb)
    tb: int
    n_blk: int
    #: sublane rows per input feature fed to each block's matmul
    s_pad: int
    #: rows of this layer's OUTPUT activation buffer (16 leading zeros +
    #: n_blk*tb written rows + zero tail long enough for the next layer's
    #: aligned slices)
    buf_len: int


def _plan(
    length: int,
    shapes: list[tuple[int, int, int]],
    padding: int,
    block_positions: int | None = None,
) -> tuple[list[_Layer], int]:
    """Static schedule: per-layer block sizes, band widths, buffer sizes.

    ``shapes`` is ``[(K, I, O), ...]`` per layer.  Returns the layer plans
    and the input buffer length.
    """
    if padding > _Z:
        raise ValueError(f"padding {padding} > {_Z} unsupported")
    layers = []
    t_in = length
    for k, i_feat, o_feat in shapes:
        t_out = t_in + 2 * padding - k + 1
        if t_out <= 0:
            raise ValueError(f"kernel {k} longer than padded input {t_in}")
        # block size heuristic: keep the band's FLOP inflation
        # (_Z + tb + k - 1 - p) / k below ~2 for the big kernels while
        # M = O*tb stays a few sublane tiles
        tb = block_positions or (32 if k > 48 else 16)
        if tb % _ALIGN:
            raise ValueError(
                f"block_positions must be a multiple of {_ALIGN}, got {tb}"
            )
        n_blk = -(-t_out // tb)
        s_pad = _rnd(_Z + tb + k - 1 - padding, _ALIGN)
        layers.append(
            _Layer(k, i_feat, o_feat, padding, t_in, t_out, tb, n_blk,
                   s_pad, 0)
        )
        t_in = t_out
    # buffer lengths: writes end at _Z + n_blk*tb; the CONSUMER's slices
    # end at (n_blk' - 1)*tb' + s_pad'
    planned = []
    for idx, lp in enumerate(layers):
        write_end = _Z + lp.n_blk * lp.tb
        if idx + 1 < len(layers):
            nxt = layers[idx + 1]
            read_end = (nxt.n_blk - 1) * nxt.tb + nxt.s_pad
        else:
            read_end = _Z + lp.t_out
        planned.append(
            _Layer(lp.kernel, lp.in_feat, lp.out_feat, lp.pad, lp.t_in,
                   lp.t_out, lp.tb, lp.n_blk, lp.s_pad,
                   _rnd(max(write_end, read_end), _ALIGN))
        )
    first = planned[0]
    in_buf = _rnd(
        max(_Z + length, (first.n_blk - 1) * first.tb + first.s_pad),
        _ALIGN,
    )
    return planned, in_buf


def _pack_band(w: jnp.ndarray, lp: _Layer, dtype) -> jnp.ndarray:
    """Unroll conv kernel ``w [K, I, O]`` into the block band matrix.

    ``band[o*TB + tau, i*S + s] = w[k, i, o]`` with ``k = s - _Z - tau +
    pad`` (zero outside ``[0, K)``): output position ``t0 + tau`` reads
    input position ``t0 + tau + k - pad``, which lives at slice row
    ``tau + k - pad + _Z`` of the aligned ``[t0 : t0 + S]`` window.
    """
    m = lp.out_feat * lp.tb
    c = lp.in_feat * lp.s_pad
    rows = np.arange(m)[:, None]
    cols = np.arange(c)[None, :]
    o = rows // lp.tb
    tau = rows % lp.tb
    i = cols // lp.s_pad
    s = cols % lp.s_pad
    k = s - _Z - tau + lp.pad
    valid = (k >= 0) & (k < lp.kernel)
    flat = (np.clip(k, 0, lp.kernel - 1) * lp.in_feat + i) * lp.out_feat + o
    band = jnp.where(
        jnp.asarray(valid),
        jnp.take(w.reshape(-1), jnp.asarray(flat.astype(np.int32))),
        0,
    )
    return band.astype(dtype)


# Fully-unrolled kernel body: every banded matmul is a separate static op
# and all activations live as SSA values (vector registers / Mosaic-managed
# VMEM) — the FASTEST steady-state form (no dynamic-offset loads/stores),
# but Mosaic compile time grows superlinearly with the block count: the
# flagship stack at tb=16/32 is ~75 blocks -> 350-540 s first-ever compile.
# Larger tb (block_positions) trades band-FLOP inflation for fewer blocks
# and a far smaller program.  Selected via body='unrolled'.
def _stack_kernel_unrolled(layers, in_buf, act, store_dtype, precision, *refs):
    x_ref = refs[0]
    out_ref = refs[-1]
    bt = x_ref.shape[1]
    t0_len = x_ref.shape[0]

    def zeros(n):
        return jnp.zeros((n, bt), store_dtype)

    acts = [
        jnp.concatenate(
            [zeros(_Z), x_ref[:].astype(store_dtype),
             zeros(in_buf - _Z - t0_len)],
            axis=0,
        )
    ]
    for li, lp in enumerate(layers):
        band = refs[1 + 2 * li][:]  # [O*TB, I*S]
        bias = refs[2 + 2 * li][:]  # [O*TB, 1] f32
        blocks: list[list[jnp.ndarray]] = [[] for _ in range(lp.out_feat)]
        for b in range(lp.n_blk):
            t0 = b * lp.tb
            rhs = jnp.concatenate(
                [acts[i][t0 : t0 + lp.s_pad, :] for i in range(lp.in_feat)],
                axis=0,
            )
            # TPU matmuls default to ONE bf16 pass even for f32 inputs;
            # f32 storage (golden-test mode) needs the 3-pass HIGHEST to
            # actually be float32-accurate.  bf16 storage carries bf16
            # error anyway — one pass.
            o = jax.lax.dot_general(
                band, rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            o = act(o + bias)
            if t0 + lp.tb > lp.t_out:
                # partial last block: rows beyond t_out would write
                # act(bias) garbage into the next layer's zero tail
                tau = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (lp.out_feat * lp.tb, 1), 0
                    )
                    % lp.tb
                )
                o = jnp.where(t0 + tau < lp.t_out, o, 0.0)
            o = o.astype(store_dtype)
            for f in range(lp.out_feat):
                blocks[f].append(o[f * lp.tb : (f + 1) * lp.tb, :])
        tail = lp.buf_len - _Z - lp.n_blk * lp.tb
        acts = [
            jnp.concatenate(
                [zeros(_Z)] + blocks[f] + ([zeros(tail)] if tail else []),
                axis=0,
            )
            for f in range(lp.out_feat)
        ]
    last = layers[-1]
    for f in range(last.out_feat):
        out_ref[f] = acts[f][_Z : _Z + last.t_out, :].astype(out_ref.dtype)


def _stack_kernel(layers, in_buf, act, store_dtype, precision, *refs):
    """Whole-stack kernel body: two ping-pong VMEM activation scratch
    buffers, one ``lax.fori_loop`` over the banded matmul blocks per layer.

    This is the FAST-COMPILE body ('looped'): the Mosaic program holds one
    matmul per layer, so the first-ever compile is ~1 min at the serving
    configuration vs 350-540 s for the fully-unrolled body.  Measured
    tradeoffs on v5e at the 131k-signal serving batch (r5 sweep):

    ==========================  ============  ===========
    body                        cold compile  steady state
    ==========================  ============  ===========
    'unrolled' (tb=16/32 mix)   350-540 s     7.3 ms
    'unrolled' tb=32            >1200 s       (n/a)
    'looped' unroll=1 (this)    ~54 s         ~30 ms
    'looped' manual unroll 2-8  ~470-600 s    ~27-30 ms
    'looped', tiled 4D scratch  ~556 s        ~30 ms
    ==========================  ============  ===========

    The pathology is Mosaic's scheduling of dynamic-offset VMEM access:
    ANY second dynamic store per loop body (manual unroll=2) or a 4-D
    tile-dim relayout re-explodes compile; and the rolled loop's
    per-iteration load/store round trips keep the MXU ~12% busy vs the
    unrolled body's register-resident activations at ~50%.  Serving uses
    'unrolled' behind a persistent compile cache; this body exists for
    cold-cache-sensitive contexts (value-identical, golden-tested).
    """
    n_layers = len(layers)
    x_ref = refs[0]
    out_ref = refs[1 + 2 * n_layers]
    scratch = (refs[2 + 2 * n_layers], refs[3 + 2 * n_layers])
    bt = x_ref.shape[1]
    t0_len = x_ref.shape[0]

    # zero both scratch buffers ONCE (head rows [0, _Z) are never written
    # again; stale inter-layer tails are re-zeroed per layer below)
    @pl.when(pl.program_id(0) == 0)
    def _init():
        scratch[0][...] = jnp.zeros_like(scratch[0])
        scratch[1][...] = jnp.zeros_like(scratch[1])

    # input activations: feature 0 of buffer 0, offset by the _Z zero head
    scratch[0][0, _Z : _Z + t0_len, :] = x_ref[:].astype(store_dtype)
    if in_buf > _Z + t0_len:
        # the first layer's aligned slices may read past the input's end;
        # buffer 0 is reused by even layers whose writes can reach into
        # that tail (padding-growing stacks), so re-zero it every step
        scratch[0][0, _Z + t0_len : in_buf, :] = jnp.zeros(
            (in_buf - _Z - t0_len, bt), store_dtype
        )

    for li, lp in enumerate(layers):
        prev = scratch[li % 2]
        nxt = scratch[(li + 1) % 2]
        band = refs[1 + 2 * li][:]  # [O*TB, I*S]
        bias = refs[2 + 2 * li][:]  # [O*TB, 1] f32
        # rows the consumer may read beyond this layer's writes must be
        # zero; the buffer is reused layer-to-layer (and holds the raw
        # input on its first reuse), so re-zero the tail each time
        write_end = _Z + lp.n_blk * lp.tb
        if lp.buf_len > write_end:
            nxt[:, write_end : lp.buf_len, :] = jnp.zeros(
                (nxt.shape[0], lp.buf_len - write_end, bt), store_dtype
            )
        tau = (
            jax.lax.broadcasted_iota(
                jnp.int32, (lp.out_feat * lp.tb, 1), 0
            )
            % lp.tb
        )

        def block(b, lp=lp, prev=prev, nxt=nxt, band=band, bias=bias,
                  tau=tau):
            t0 = b * lp.tb
            rhs = jnp.concatenate(
                [
                    prev[i, pl.ds(t0, lp.s_pad), :]
                    for i in range(lp.in_feat)
                ],
                axis=0,
            )
            # TPU matmuls default to ONE bf16 pass even for f32 inputs;
            # f32 storage (golden-test mode) needs the 3-pass HIGHEST to
            # actually be float32-accurate.  bf16 storage carries bf16
            # error anyway — one pass.
            o = jax.lax.dot_general(
                band, rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            o = act(o + bias)
            # partial last block: rows beyond t_out would write act(bias)
            # garbage into the next layer's zero tail
            o = jnp.where(t0 + tau < lp.t_out, o, 0.0)
            o = o.astype(store_dtype)
            for f in range(lp.out_feat):
                nxt[f, pl.ds(_Z + t0, lp.tb), :] = (
                    o[f * lp.tb : (f + 1) * lp.tb, :]
                )

        # MANUAL partial unroll (Mosaic's fori_loop lowering supports only
        # unroll=1 or full): measured on v5e, any unroll > 1 re-explodes
        # Mosaic compile to ~500-600 s for ~10% steady-state gain — the
        # default stays 1; remainder blocks run as an unrolled epilogue
        u = max(min(_UNROLL, lp.n_blk), 1)
        n_main = lp.n_blk // u

        def body(i, carry, u=u, block=block):
            for j in range(u):
                block(i * u + j)
            return carry

        if n_main:
            jax.lax.fori_loop(0, n_main, body, 0)
        for b in range(n_main * u, lp.n_blk):
            block(b)
    last = layers[-1]
    final = scratch[n_layers % 2]
    for f in range(last.out_feat):
        out_ref[f] = final[f, _Z : _Z + last.t_out, :].astype(out_ref.dtype)


def _stack_reference(x, weights, biases, padding, activation, compute_dtype):
    """Pure-XLA forward of the same stack (conv chain) — the backward
    pass differentiates THIS, so training through the fused kernel gets
    exact gradients of the mathematically-identical XLA formulation."""
    act = _ACTIVATIONS[activation]
    y = x[..., None].astype(compute_dtype)
    for w, b in zip(weights, biases):
        y = jax.lax.conv_general_dilated(
            y,
            w.astype(compute_dtype),
            window_strides=(1,),
            padding=[(padding, padding)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        y = act(y + b.astype(compute_dtype))
    return y.astype(jnp.float32)


def conv_stack_fused(
    x: jnp.ndarray,
    weights: tuple[jnp.ndarray, ...],
    biases: tuple[jnp.ndarray, ...],
    padding: int = 1,
    activation: str = "silu",
    compute_dtype=jnp.bfloat16,
    block_lanes: int = 512,
    block_positions: int | None = None,
    matmul_precision: jax.lax.Precision | None = None,
    interpret: bool | None = None,
    body: str | None = None,
) -> jnp.ndarray:
    """Run a whole stride-1 conv stack as one fused Pallas kernel.

    :param x: ``[B, L]`` single-feature input signals
    :param weights: per-layer ``nn.Conv`` kernels ``[K, I, O]`` (layer
        ``l``'s ``I`` must equal layer ``l-1``'s ``O``; the first must
        have ``I == 1``)
    :param biases: per-layer biases ``[O]``
    :param padding: symmetric zero padding applied by EVERY layer (the
        reference stack's constant ``padding=1``); must be <= 16
    :param activation: applied after every layer (incl. the last), one of
        ``_ACTIVATIONS``
    :param compute_dtype: activation storage + MXU input dtype.  bf16 is
        the serving configuration; float32 runs the band matmuls with a
        float32-accurate pass for golden tests.
    :param block_lanes: batch columns per grid step (multiple of 128)
    :param block_positions: override the per-layer output-positions-per-
        matmul heuristic (values are identical for any setting; this is a
        pure performance knob)
    :param matmul_precision: override the band-matmul MXU precision
        (default: HIGHEST for float32 storage, DEFAULT for bf16)
    :param interpret: force Pallas interpret mode; ``None`` = interpret
        off TPU (the hermetic-CPU test configuration)
    :param body: kernel body structure — 'looped' (fori_loop over blocks,
        VMEM scratch ping-pong: compiles in seconds) or 'unrolled' (every
        block a static op, activations in registers: fastest steady state,
        Mosaic compile grows superlinearly with block count).  ``None`` =
        ``OFPTPU_CONV_BODY`` env or the measured default (module docs)
    :returns: ``[B, T_out, O_last]`` float32 feature maps, identical (to
        dtype tolerance) to chaining ``nn.Conv`` + activation per layer

    Differentiable: the backward pass computes exact gradients of the
    mathematically-identical XLA conv chain (``jax.vjp`` of
    :func:`_stack_reference` — the standard custom-VJP route for a
    forward-optimized kernel), so ``CCCNN(conv_impl='pallas')`` trains.
    """
    shapes = [tuple(w.shape) for w in weights]
    if shapes[0][1] != 1:
        raise ValueError("first layer must take a single input feature")
    for (_, i_f, _), (_, _, o_prev) in zip(shapes[1:], shapes[:-1]):
        if i_f != o_prev:
            raise ValueError("layer feature widths do not chain")
    # validate the plan eagerly (padding bound, kernel-vs-length) so the
    # error surfaces at the public boundary, not inside the vjp wrapper
    _plan(x.shape[1], shapes, padding, block_positions)
    if body is None:
        body = _DEFAULT_BODY
    if body not in ("looped", "unrolled"):
        raise ValueError(f"body must be 'looped' or 'unrolled', got {body!r}")
    return _fused(
        x, tuple(weights), tuple(biases), padding, activation,
        compute_dtype, block_lanes, block_positions, matmul_precision,
        interpret, body,
    )


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def _fused(
    x, weights, biases, padding, activation, compute_dtype, block_lanes,
    block_positions, matmul_precision, interpret, body="looped",
):
    b_n, length = x.shape
    shapes = [tuple(w.shape) for w in weights]
    layers, in_buf = _plan(length, shapes, padding, block_positions)
    act = _ACTIVATIONS[activation]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bt = block_lanes
    n_pad = _rnd(b_n, bt)
    xt = x.T
    if n_pad != b_n:
        xt = jnp.pad(xt, ((0, 0), (0, n_pad - b_n)))
    # f32 storage needs HIGHEST-precision bands for exactness; bf16 casts
    # the weights like nn.Conv(dtype=bf16) does
    band_dtype = compute_dtype
    ins = [xt]
    in_specs = [
        pl.BlockSpec((xt.shape[0], bt), lambda j: (0, j),
                     memory_space=pltpu.VMEM)
    ]
    for lp, w, b in zip(layers, weights, biases):
        ins.append(_pack_band(w, lp, band_dtype))
        ins.append(
            jnp.repeat(b.astype(jnp.float32), lp.tb)[:, None]
        )
        in_specs.append(
            pl.BlockSpec(
                (lp.out_feat * lp.tb, lp.in_feat * lp.s_pad),
                lambda j: (0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        in_specs.append(
            pl.BlockSpec(
                (lp.out_feat * lp.tb, 1), lambda j: (0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    last = layers[-1]
    if matmul_precision is None:
        # TPU matmuls default to ONE bf16 pass even for f32 inputs; f32
        # storage (golden-test mode) needs the 3-pass HIGHEST to actually
        # be float32-accurate.  bf16 storage carries bf16 error anyway.
        matmul_precision = (
            jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
    if body == "unrolled":
        kern = _stack_kernel_unrolled
        scratch = []
    else:
        kern = _stack_kernel
        max_feat = max(max(lp.out_feat, lp.in_feat) for lp in layers)
        max_buf = max(in_buf, max(lp.buf_len for lp in layers))
        scratch = [
            # ping-pong activation buffers — every layer's input and
            # output stay VMEM-resident; HBM sees one read of x and one
            # write of the final feature maps
            pltpu.VMEM((max_feat, max_buf, bt), compute_dtype),
            pltpu.VMEM((max_feat, max_buf, bt), compute_dtype),
        ]
    out = pl.pallas_call(
        partial(
            kern, layers, in_buf, act, compute_dtype,
            matmul_precision,
        ),
        grid=(n_pad // bt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (last.out_feat, last.t_out, bt), lambda j: (0, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (last.out_feat, last.t_out, n_pad), jnp.float32
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*ins)
    # [O, T, B] -> [B, T, O]; XLA fuses this transpose into the consumer
    return jnp.transpose(out[:, :, :b_n], (2, 1, 0))


def _fused_fwd(
    x, weights, biases, padding, activation, compute_dtype, block_lanes,
    block_positions, matmul_precision, interpret, body="looped",
):
    out = _fused(
        x, weights, biases, padding, activation, compute_dtype,
        block_lanes, block_positions, matmul_precision, interpret, body,
    )
    return out, (x, weights, biases)


def _fused_bwd(
    padding, activation, compute_dtype, block_lanes, block_positions,
    matmul_precision, interpret, body, residuals, g,
):
    x, weights, biases = residuals
    _, vjp = jax.vjp(
        lambda xx, ww, bb: _stack_reference(
            xx, ww, bb, padding, activation, compute_dtype
        ),
        x, weights, biases,
    )
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)
