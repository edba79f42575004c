"""On-device onset-window extraction from wide multichannel audio.

The serving/bench pipeline needs, for every detected onset, a fixed-length
multichannel window around it — the device-side analogue of the reference's
frame extractors (reference: data.py:55-192) feeding its fingerprint models
(model.py:443-629).  For B batched streams stored channel-interleaved as
``x [T, S·cps]`` the naive formulation (per-stream transpose or per-sample
``take_along_axis``) is hostile to TPU: a ``[S, cps, T]`` transpose
materializes a laneway-padded multi-GB intermediate, and per-element row
gathers run at scalar-load speed (measured ~15× slower than the entire
fused detection pass).

TPU-native formulation used here:

1. window rows come from one perfectly-tiled ``[W, 128]``-lane
   ``dynamic_slice``/DMA per hit starting at an 8-row-aligned floor
   (DMA-friendly slab gather);
2. SAMPLE ANCHORING (``anchored=True``, the serving default): the slab
   reads ``W + 8`` rows and the 0..7 residual between the exact onset
   start and its 8-floor shifts in-kernel behind the next hit's DMA — the
   onset sits at index ``pre`` exactly, matching the reference's
   extraction (data.py:55-120).  The legacy block-aligned mode leaves the
   onset at ``pre + delta`` (jitter < one detector block — the same
   within-frame shift the reference's extractors inject deliberately as
   augmentation, data.py:95-99,180-186);
3. each stream keeps its own ``cps``-lane group via a one-hot mask
   reduction on the VPU — no scalar gathers anywhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_SUB = 8  # sublane tile: kernel output rows padded cps -> 8


def _gather_kernel(window: int, n: int, n_buf: int, precision, *refs):
    """Per-hit slab DMA + lane-group selection.

    Grid ``(n,)``; hit ``i`` copies ``x[start[i] : start[i]+W,
    col[i] : col[i]+128]`` HBM→VMEM through an ``n_buf``-slot ring (the
    copies for hits ``i+1 .. i+n_buf-1`` are in flight while hit ``i``
    computes — a 2-slot double buffer leaves the kernel DMA-latency
    bound well above the bandwidth floor), then
    compacts the stream's ``cps`` lanes to output rows with one tiny MXU
    matmul ``sel [8,128] @ slab[W,128]^T -> [8, W]`` — no scalar
    gathers, no full-slab materialization in HBM.
    """
    starts_ref, cols_ref, sel_ref, x_ref, out_ref, slab, sem = refs
    i = pl.program_id(0)

    def copy(slot, hit):
        # starts/cols are prefetched in 8-row / 128-lane tile units so
        # Mosaic can prove the HBM slice is tile-aligned
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(starts_ref[hit] * 8, window),
                     pl.ds(cols_ref[hit] * LANE, LANE)],
            slab.at[slot],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _warmup():
        # prime hits 0 .. n_buf-2 (slots h); steady state keeps
        # n_buf-1 copies in flight
        for h in range(min(n_buf - 1, n)):
            copy(h, h).start()

    @pl.when(i + n_buf - 1 < n)
    def _prefetch():
        copy((i + n_buf - 1) % n_buf, i + n_buf - 1).start()

    copy(i % n_buf, i).wait()
    # HIGHEST precision (3x bf16 passes = the full f32 mantissa) makes the
    # one-hot selection bit-exact; DEFAULT is one bf16 pass — free when the
    # consumer casts to bf16 anyway (the serving model)
    out_ref[0] = jax.lax.dot_general(
        sel_ref[0],
        slab[i % n_buf],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _gather_kernel_mh(
    window: int, n_steps: int, h: int, precision, *refs
):
    """Multi-hit gather step: ``h`` hits per grid step.

    Same slab-DMA + lane-select scheme as :func:`_gather_kernel`, but
    each grid step waits/computes a GROUP of ``h`` hits while the next
    group's ``h`` copies are in flight (2h slab slots).  The per-step
    fixed cost (grid bookkeeping, scalar indexing) — measured ~280 ns of
    the ~440 ns/hit single-hit steady state — is amortized ``h``-fold.
    """
    starts_ref, cols_ref, sel_ref, x_ref, out_ref, slab, sem = refs
    i = pl.program_id(0)

    def copy(slot, hit):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(starts_ref[hit] * 8, window),
                     pl.ds(cols_ref[hit] * LANE, LANE)],
            slab.at[slot],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _warmup():
        for j in range(h):
            copy(j, j).start()

    @pl.when(i + 1 < n_steps)
    def _prefetch():
        for j in range(h):
            copy(((i + 1) % 2) * h + j, (i + 1) * h + j).start()

    base = (i % 2) * h
    for j in range(h):
        copy(base + j, i * h + j).wait()
        out_ref[0, j] = jax.lax.dot_general(
            sel_ref[0, j],
            slab[base + j],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )


def _gather_kernel_mh_anchored(
    window: int, n_steps: int, h: int, precision, *refs
):
    """Multi-hit gather step with per-hit SAMPLE anchoring.

    Same slab-DMA + lane-select scheme as :func:`_gather_kernel_mh`, but
    each hit's window starts at an EXACT sample: the DMA reads
    ``window + 8`` rows from the 8-row-floored start (same tile-alignment
    proof as the block-aligned kernel), and the 0..7 residual is applied
    after the select matmul as an 8-way masked shift — ~8·8·W VPU ops per
    hit, hidden behind the next group's DMA (the reference's extractors
    anchor exactly at the labelled onset, data.py:55-120)."""
    starts_ref, res_ref, cols_ref, sel_ref, x_ref, out_ref, slab, sem = refs
    i = pl.program_id(0)
    w2 = window + 8

    def copy(slot, hit):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(starts_ref[hit] * 8, w2),
                     pl.ds(cols_ref[hit] * LANE, LANE)],
            slab.at[slot],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _warmup():
        for j in range(h):
            copy(j, j).start()

    @pl.when(i + 1 < n_steps)
    def _prefetch():
        for j in range(h):
            copy(((i + 1) % 2) * h + j, (i + 1) * h + j).start()

    base = (i % 2) * h
    for j in range(h):
        copy(base + j, i * h + j).wait()
        tmp = jax.lax.dot_general(
            sel_ref[0, j],
            slab[base + j],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # [8, window + 8]
        r = res_ref[i * h + j]
        acc = jnp.where(r == 0, tmp[:, 0:window], 0.0)
        for u in range(1, 8):
            acc = acc + jnp.where(r == u, tmp[:, u : u + window], 0.0)
        out_ref[0, j] = acc


def _gather_kernel_roll(window: int, n: int, *refs):
    """Per-hit slab DMA + dynamic lane roll (matmul-free selection).

    Same DMA scheme as :func:`_gather_kernel`, but the stream's ``cps``
    lanes are brought to lane 0 with one dynamic lane rotation
    (``pltpu.roll`` — a VPU permutation, ~W/8 cycles) instead of the
    one-hot select matmul (~W MXU cycles per pass per hit).  Output is
    window-major ``[W, 8]`` (lanes cps..7 carry neighbouring streams'
    samples — callers slice ``[:cps]`` after transposing); values are
    BIT-EXACT f32 (a pure permutation, no matmul rounding).
    """
    starts_ref, cols_ref, shifts_ref, x_ref, out_ref, slab, sem = refs
    i = pl.program_id(0)

    def copy(slot, hit):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(starts_ref[hit] * 8, window),
                     pl.ds(cols_ref[hit] * LANE, LANE)],
            slab.at[slot],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _warmup():
        copy(0, 0).start()

    @pl.when(i + 1 < n)
    def _prefetch():
        copy((i + 1) % 2, i + 1).start()

    copy(i % 2, i).wait()
    rolled = pltpu.roll(slab[i % 2], shift=shifts_ref[i], axis=1)
    out_ref[0] = rolled[:, :_SUB]


def _gather_pallas_roll(
    x: jnp.ndarray,
    row_start: jnp.ndarray,
    stream_ids: jnp.ndarray,
    cps: int,
    window: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """[N, W, 8] window-major windows via the roll gather kernel.

    Lane c < cps of output row w is ``x[row_start[i]+w, stream*cps+c]``;
    lanes cps..7 are neighbouring streams' lanes (slice them off).
    """
    n = row_start.shape[0]
    rows8 = row_start // 8
    cols = stream_ids // (LANE // cps)
    # roll lanes so the stream's group lands at lane 0: out[l] = in[l+g*cps]
    shifts = (-(stream_ids % (LANE // cps)) * cps) % LANE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # x stays in HBM
        out_specs=pl.BlockSpec(
            (1, window, _SUB), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, window, LANE), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        partial(_gather_kernel_roll, window, n),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, window, _SUB), jnp.float32),
        interpret=interpret,
    )(rows8, cols, shifts, x)


def _gather_pallas(
    x: jnp.ndarray,
    row_start: jnp.ndarray,
    stream_ids: jnp.ndarray,
    cps: int,
    window: int,
    interpret: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    n_buf: int = 8,
    hits_per_step: int = 1,
    residuals: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[N, 8, W] windows via the DMA gather kernel (rows cps..7 zero).

    ``row_start``/``stream_ids`` are flat per-hit arrays — each hit reads
    stream ``stream_ids[i]``'s ``cps`` lanes starting at row
    ``row_start[i]``.  ``n_buf`` slab slots keep ``n_buf - 1`` DMAs in
    flight (VMEM cost ``n_buf * W * 128 * 4`` bytes).  ``hits_per_step``
    > 1 switches to the grouped kernel (:func:`_gather_kernel_mh`):
    ``hits_per_step`` hits per grid step with ``2*hits_per_step`` slots,
    amortizing the per-step fixed cost.  ``residuals`` (int32 [N] in
    [0, 8)) switches to the sample-anchored kernel: hit ``i``'s window
    starts at row ``row_start[i] + residuals[i]`` exactly (``row_start``
    must be 8-aligned; the slab reads ``window + 8`` rows).
    """
    groups = LANE // cps
    n = row_start.shape[0]
    h = hits_per_step if hits_per_step > 1 or residuals is not None else 1
    h = max(h, 1)
    n_pad = -(-n // h) * h if h > 1 else n
    if n_pad != n:
        # pad with repeats of hit 0 (any in-range hit works; the extra
        # windows are sliced off below)
        pad = n_pad - n
        row_start = jnp.concatenate(
            [row_start, jnp.broadcast_to(row_start[:1], (pad,))]
        )
        stream_ids = jnp.concatenate(
            [stream_ids, jnp.broadcast_to(stream_ids[:1], (pad,))]
        )
        if residuals is not None:
            residuals = jnp.concatenate(
                [residuals, jnp.broadcast_to(residuals[:1], (pad,))]
            )
    # tile-unit indices (see copy() in the kernel): rows floored to the
    # 8-row sublane tile — callers pass block-aligned starts, which are
    # 8-aligned for every power-of-two block size ≥ 8
    rows8 = row_start // 8
    cols = stream_ids // groups
    g = stream_ids % groups
    # per-hit lane-selection matrix [N, 8, LANE]: row c one-hot at lane
    # g*cps + c for c < cps
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n_pad, _SUB, LANE), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (n_pad, _SUB, LANE), 2)
    sel = jnp.where(
        (row_iota < cps)
        & (lane_iota == g[:, None, None] * cps + row_iota),
        jnp.float32(1.0),
        jnp.float32(0.0),
    )
    if residuals is not None:
        n_steps = n_pad // h
        w2 = window + 8
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(
                    (1, h, _SUB, LANE), lambda i, *_: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            ],
            out_specs=pl.BlockSpec(
                (1, h, _SUB, window), lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2 * h, w2, LANE), x.dtype),
                pltpu.SemaphoreType.DMA((2 * h,)),
            ],
        )
        out = pl.pallas_call(
            partial(_gather_kernel_mh_anchored, window, n_steps, h,
                    precision),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (n_steps, h, _SUB, window), jnp.float32
            ),
            interpret=interpret,
        )(rows8, residuals.astype(jnp.int32),
          cols, sel.reshape(n_steps, h, _SUB, LANE), x)
        return out.reshape(n_pad, _SUB, window)[:n]
    if h > 1:
        n_steps = n_pad // h
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(
                    (1, h, _SUB, LANE), lambda i, *_: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            ],
            out_specs=pl.BlockSpec(
                (1, h, _SUB, window), lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2 * h, window, LANE), x.dtype),
                pltpu.SemaphoreType.DMA((2 * h,)),
            ],
        )
        out = pl.pallas_call(
            partial(_gather_kernel_mh, window, n_steps, h, precision),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (n_steps, h, _SUB, window), jnp.float32
            ),
            interpret=interpret,
        )(rows8, cols, sel.reshape(n_steps, h, _SUB, LANE), x)
        return out.reshape(n_pad, _SUB, window)[:n]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(
                (1, _SUB, LANE), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, _SUB, window), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((n_buf, window, LANE), x.dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
    )
    return pl.pallas_call(
        partial(_gather_kernel, window, n, n_buf, precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, _SUB, window), jnp.float32),
        interpret=interpret,
    )(rows8, cols, sel, x)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def gather_block_windows(
    x: jnp.ndarray,
    block_starts: jnp.ndarray,
    channels_per_stream: int,
    window: int,
    pre: int = 0,
    backend: str = "auto",
    interpret: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    hits_per_step: int = 8,
    anchored: bool = False,
) -> jnp.ndarray:
    """Extract per-stream onset windows at block-aligned starts.

    :param x: ``[T, S*cps]`` audio, channel-interleaved (stream-major)
    :param block_starts: ``[S, K]`` int32 start samples (block-aligned by
        the caller, e.g. ``hit_block * block_size``); clipped to valid range
    :param channels_per_stream: channels per stream (``cps``)
    :param window: window length W in samples
    :param pre: samples of lead-in before each start
    :param backend: 'pallas' (DMA gather kernel — fastest on TPU, measured
        292 → ~20 ms for 32k hits over C=8192), 'xla' (slab
        dynamic-slice + mask reduce), or 'auto' (pallas on TPU)
    :param precision: MXU precision of the lane-selection matmul.  HIGHEST
        (default) reproduces f32 bit-exactly; DEFAULT is one bf16 pass —
        use it when the consumer casts to bf16 anyway (the serving model)
    :param hits_per_step: hits per kernel grid step (amortizes the
        per-step fixed cost — measured 15.3 → 9.6 ms at 32k hits going
        1 → 8; values are identical)
    :param anchored: sample-anchored windows (no 8-sample flooring) — see
        :func:`gather_hit_windows`.
    :returns: ``[S, K, cps, W]`` float32 windows.  Row starts are floored
        to 8-sample (sublane) alignment: ``windows[s, k, c, w] ==
        x[((starts[s, k] - pre) // 8) * 8 + w, s*cps + c]`` — block-aligned
        ``starts`` with 8-aligned ``pre`` (the serving path) are read
        exactly; other callers see up to 7 samples of extra lead-in.  With
        ``anchored=True`` the read is exact: ``x[starts[s, k] - pre + w]``
        (clipped to ``[0, T - window - 8]``).
    """
    t, c = x.shape
    cps = channels_per_stream
    n_streams = c // cps
    k = block_starts.shape[1]
    stream_ids = jnp.repeat(jnp.arange(n_streams, dtype=jnp.int32), k)
    if anchored:
        out = gather_hit_windows(
            x, block_starts.reshape(-1), stream_ids, cps, window, pre,
            backend, interpret, precision, hits_per_step, True,
        )
        return out.reshape(n_streams, k, cps, window)
    # starts floored to the 8-row sublane tile (uniform across backends;
    # lets the DMA kernel prove HBM-slice alignment).  Block-aligned starts
    # with 8-aligned pre are unaffected.
    row_start = (
        jnp.clip(block_starts - pre, 0, t - window).reshape(-1) // 8 * 8
    )
    wide = c % LANE == 0 and LANE % cps == 0
    if backend == "auto":
        backend = (
            "pallas" if wide and jax.default_backend() == "tpu" else "xla"
        )
    if backend == "pallas" and not wide:
        # an explicit 'pallas' request must not silently run the ~15x
        # slower narrow scalar-gather fallback on the serving hot path
        raise ValueError(
            f"backend='pallas' needs the wide layout (C={c} divisible by "
            f"{LANE} with cps={cps} dividing {LANE}) — pad streams to a "
            "lane multiple or pass backend='xla'/'auto'"
        )
    if backend == "pallas":
        out = _gather_pallas(
            x, row_start, stream_ids, cps, window, interpret, precision,
            hits_per_step=hits_per_step,
        )
        return out[:, :cps].reshape(n_streams, k, cps, window)
    if wide:
        groups = LANE // cps
        col_base = (stream_ids // groups) * LANE

        def cut(st, cb):
            return jax.lax.dynamic_slice(x, (st, cb), (window, LANE))

        slab = jax.vmap(cut)(row_start, col_base)  # [S*K, W, 128]
        slab = slab.reshape(n_streams, k, window, groups, cps)
        mask = jax.nn.one_hot(
            jnp.arange(n_streams, dtype=jnp.int32) % groups,
            groups,
            dtype=slab.dtype,
        )
        # honor the precision contract on the XLA path too: the default
        # TPU einsum is one bf16 pass, which would silently quantize f32
        # audio while the pallas path stays bit-exact
        windows = jnp.einsum("skwgc,sg->skwc", slab, mask,
                             precision=precision)
    else:
        # narrow fallback: per-channel row indices via take_along_axis
        starts_ch = jnp.repeat(
            row_start.reshape(n_streams, k), cps, axis=0
        )  # [C, K]
        rows = (
            starts_ch.T[:, None, :]
            + jnp.arange(window, dtype=jnp.int32)[None, :, None]
        )  # [K, W, C]
        flat = jnp.take_along_axis(
            x, rows.reshape(k * window, -1), axis=0
        )
        windows = flat.reshape(k, window, n_streams, cps).transpose(
            2, 0, 3, 1
        )
        return windows
    return windows.transpose(0, 1, 3, 2)  # [S, K, cps, W]


@partial(jax.jit, static_argnums=(2, 3))
def top_hit_blocks(
    on: jnp.ndarray,
    block_size: int,
    n_streams: int,
    capacity: int,
    deltas: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-capacity per-stream hit list from dense detector events.

    :param on: ``[nb, S*cps]`` bool per-block fire flags
    :param block_size: detector block size
    :param deltas: optional ``[nb, S*cps]`` int32 within-block onset
        offsets (the detector's second output).  When given, returned
        starts are SAMPLE-ANCHORED onsets ``block*block_size + delta`` —
        per hit block, the EARLIEST firing channel's onset (the arrival
        that seeds the hit) — for :func:`gather_hit_windows`'s
        ``anchored=True`` exact extraction (reference anchoring:
        data.py:55-120).  Without it, starts are block-aligned.
    :returns: ``(starts [S, K] int32 start samples, valid [S, K]
        bool)`` — the first ``capacity`` hit blocks per stream, in time
        order, selected by hit-count prefix sum (slot ``j`` holds the
        unique block whose running hit count equals ``j+1``).
    """
    nb = on.shape[0]
    cps = on.shape[1] // n_streams
    onc = on.reshape(nb, n_streams, cps)
    hit = jnp.any(onc, axis=-1)  # [nb, S]
    # sort-free: the j-th hit block of a stream is the unique row where the
    # hit-count prefix sum equals j+1 (lax.top_k lowers to a full sort on
    # TPU — measured 33 ms at [2048, 750]).  Exactly one row matches each
    # (stream, rank) pair, so "argmax" is just a weighted sum with the
    # block index — ONE masked reduction for all K slots (K separate
    # argmax passes measured 5.3 ms vs 3.8 at the serving shape).
    rank = jnp.cumsum(hit.astype(jnp.int32), axis=0)  # [nb, S]
    j = jnp.arange(1, capacity + 1, dtype=jnp.int32)
    m = hit[:, :, None] & (rank[:, :, None] == j)  # [nb, S, K]
    idx = jnp.arange(nb, dtype=jnp.int32)[:, None, None]
    blk = jnp.sum(m * idx, axis=0, dtype=jnp.int32)  # [S, K]
    valid = jnp.any(m, axis=0)
    starts = blk * block_size
    if deltas is not None:
        # earliest firing channel's within-block offset, selected by the
        # same one-matching-row masked reduction
        dmin = jnp.min(
            jnp.where(onc, deltas.reshape(nb, n_streams, cps),
                      jnp.int32(2**30)),
            axis=-1,
        )  # [nb, S]
        dsel = jnp.sum(m * dmin[:, :, None], axis=0, dtype=jnp.int32)
        starts = starts + jnp.where(valid, dsel, 0)
    return starts.astype(jnp.int32), valid


@partial(jax.jit, static_argnums=(1, 2, 3))
def compact_hits(
    on: jnp.ndarray, block_size: int, n_streams: int, capacity: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """GLOBAL fixed-capacity hit list, compacted across all streams.

    Where :func:`top_hit_blocks` reserves ``capacity`` slots per stream —
    so a fleet whose streams average ~1 hit per chunk still pads (and
    fingerprints, and DMA-gathers) ``S*capacity`` windows —
    this returns the first ``capacity`` hit blocks of the WHOLE batch in
    time order, each tagged with its stream.  Downstream cost (window
    gather + model) then scales with actual hit count, not with the
    per-stream worst case.  The saving is the ratio of padded slots to the
    real hit budget — at the shipped bench operating point (C=32768,
    chunks=3) that is 49152 padded slots vs a 32768 global budget for
    24576 real hits/chunk (1.5x); sparser fleets save proportionally more.
    Size ``capacity`` from the expected hit rate WITH headroom — overflow
    is counted, and the bench fails on it.

    :param on: ``[nb, S*cps]`` bool per-block fire flags
    :param block_size: detector block size in samples
    :param capacity: total hit budget G across all streams
    :returns: ``(starts [G] int32 block-start samples, stream_ids [G]
        int32, valid [G] bool, n_dropped int32 scalar)`` — hits beyond
        ``capacity`` are dropped and COUNTED (never silently; callers
        should surface ``n_dropped``, the bench treats >0 as a failed
        run).  Invalid slots have starts/stream_ids 0.
    """
    nb = on.shape[0]
    cps = on.shape[1] // n_streams
    hit = jnp.any(on.reshape(nb, n_streams, cps), axis=-1)  # [nb, S]
    flat = hit.reshape(-1)  # time-major: global time order
    sentinel = nb * n_streams
    (idx,) = jnp.nonzero(flat, size=capacity, fill_value=sentinel)
    valid = idx < sentinel
    idx = jnp.where(valid, idx, 0)
    blk = (idx // n_streams).astype(jnp.int32)
    stream_ids = jnp.where(valid, idx % n_streams, 0).astype(jnp.int32)
    total = jnp.sum(flat.astype(jnp.int32))
    n_dropped = jnp.maximum(total - capacity, 0)
    starts = jnp.where(valid, blk * block_size, 0).astype(jnp.int32)
    return starts, stream_ids, valid, n_dropped


@partial(jax.jit, static_argnums=(2, 3))
def compact_hit_list(
    starts: jnp.ndarray,
    valid: jnp.ndarray,
    capacity: int,
    return_indices: bool = False,
):
    """Compact a padded per-stream hit list ``[S, K]`` to a flat ``[G]``.

    The cheap two-level route to a global hit list: per-stream capacity K
    bounds the worst-case stream (``top_hit_blocks``, ~0.2 ms), then this
    compacts the S*K padded slots down to the global budget G — the
    static-size ``nonzero`` here sorts S*K elements, ~40x cheaper than
    compacting the dense [nb, S] event map directly (:func:`compact_hits`
    sorts nb*S; measured 16 ms vs <1 ms at the bench shape).

    :param starts: ``[S, K]`` int32 start samples (from
        :func:`top_hit_blocks`)
    :param valid: ``[S, K]`` bool slot validity
    :param capacity: global hit budget G
    :returns: ``(starts [G] int32, stream_ids [G] int32, valid_out [G]
        bool, n_dropped int32)`` — valid hits in stream-major order;
        overflow beyond G is dropped and counted, never silent.  With
        ``return_indices=True``, a fifth element ``idx [G] int32`` — each
        kept hit's flat slot index into the padded ``[S*K]`` layout
        (zeroed where invalid) for scattering results back.
    """
    s, k = starts.shape
    flat = valid.reshape(-1)
    sentinel = s * k
    (idx,) = jnp.nonzero(flat, size=capacity, fill_value=sentinel)
    valid_out = idx < sentinel
    idx = jnp.where(valid_out, idx, 0)
    stream_ids = (idx // k).astype(jnp.int32)
    out_starts = jnp.where(
        valid_out, starts.reshape(-1)[idx], 0
    ).astype(jnp.int32)
    total = jnp.sum(flat.astype(jnp.int32))
    n_dropped = jnp.maximum(total - capacity, 0)
    out = (
        out_starts,
        jnp.where(valid_out, stream_ids, 0).astype(jnp.int32),
        valid_out,
        n_dropped,
    )
    return out + (idx.astype(jnp.int32),) if return_indices else out


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def gather_hit_windows(
    x: jnp.ndarray,
    starts: jnp.ndarray,
    stream_ids: jnp.ndarray,
    channels_per_stream: int,
    window: int,
    pre: int = 0,
    backend: str = "auto",
    interpret: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    hits_per_step: int = 8,
    anchored: bool = False,
) -> jnp.ndarray:
    """Extract windows for a FLAT per-hit ``(stream, start)`` list.

    The compacted-form twin of :func:`gather_block_windows` (same slab-DMA
    kernel, same 8-sample row flooring contract): hit ``i`` reads stream
    ``stream_ids[i]``'s ``cps`` channels at rows ``((starts[i] - pre) //
    8) * 8 + [0, W)``.  Feed it :func:`compact_hits` output so gather DMA
    and model batch scale with real hits (reference analogue: the frame
    extractors gather exactly one window per labelled onset,
    data.py:55-120 — never a padded per-stream capacity).

    :param x: ``[T, S*cps]`` audio, channel-interleaved (stream-major)
    :param starts: ``[N]`` int32 start samples (block-aligned, or exact
        onset samples with ``anchored=True``)
    :param stream_ids: ``[N]`` int32 stream of each hit
    :param precision: MXU precision of the lane-selection matmul (see
        :func:`gather_block_windows`)
    :param hits_per_step: hits per kernel grid step (see
        :func:`gather_block_windows`)
    :param anchored: sample-anchored windows — ``windows[i, c, w] ==
        x[starts[i] - pre + w, ...]`` EXACTLY (no 8-sample flooring): the
        DMA still reads from the 8-floored row (``window + 8`` rows) and
        the 0..7 residual shifts in-kernel behind the next hit's DMA.
        Anchors are clipped to ``[0, T - window - 8]``.  This removes the
        sub-block serving jitter of block-aligned starts (the reference
        anchors exactly at the labelled onset, data.py:55-120).
    :returns: ``[N, cps, W]`` float32 windows.
    """
    t, c = x.shape
    cps = channels_per_stream
    if anchored:
        exact = jnp.clip(starts - pre, 0, t - window - 8)
        row_start = exact // 8 * 8
        res = (exact - row_start).astype(jnp.int32)
    else:
        row_start = jnp.clip(starts - pre, 0, t - window) // 8 * 8
        res = None
    wide = c % LANE == 0 and LANE % cps == 0
    if backend == "auto":
        backend = (
            "pallas" if wide and jax.default_backend() == "tpu" else "xla"
        )
    if backend == "pallas" and not wide:
        raise ValueError(
            f"backend='pallas' needs the wide layout (C={c} divisible by "
            f"{LANE} with cps={cps} dividing {LANE}) — pad streams to a "
            "lane multiple or pass backend='xla'/'auto'"
        )
    if backend == "pallas":
        out = _gather_pallas(
            x, row_start, stream_ids, cps, window, interpret, precision,
            hits_per_step=hits_per_step, residuals=res,
        )
        return out[:, :cps]
    if wide:
        groups = LANE // cps
        col_base = ((stream_ids // groups) * LANE).astype(jnp.int32)
        w2 = window + 8 if anchored else window

        def cut(st, cb):
            return jax.lax.dynamic_slice(x, (st, cb), (w2, LANE))

        slab = jax.vmap(cut)(row_start, col_base)  # [N, w2, 128]
        slab = slab.reshape(-1, w2, groups, cps)
        mask = jax.nn.one_hot(
            stream_ids % groups, groups, dtype=slab.dtype
        )  # [N, groups]
        # same precision contract as the pallas path (bit-exact at HIGHEST)
        windows = jnp.einsum("nwgc,ng->nwc", slab, mask,
                             precision=precision)
        if anchored:
            windows = jax.vmap(
                lambda s, r: jax.lax.dynamic_slice(s, (r, 0), (window, cps))
            )(windows, res)
        return windows.transpose(0, 2, 1)
    # narrow fallback: direct row/col gather (host/CPU paths)
    if anchored:
        row_start = row_start + res
    rows = row_start[:, None] + jnp.arange(window, dtype=jnp.int32)
    cols = stream_ids[:, None] * cps + jnp.arange(cps, dtype=jnp.int32)
    windows = x[rows[:, :, None], cols[:, None, :]]  # [N, W, cps]
    return windows.transpose(0, 2, 1)
