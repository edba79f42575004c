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

1. windows start at block-aligned rows (the onset sits ``pre + delta``
   samples into the window, jitter < one detector block — the same
   within-frame shift the reference's extractors inject deliberately as
   augmentation, data.py:95-99,180-186);
2. one perfectly-tiled ``[W, 128]``-lane ``dynamic_slice`` per hit
   (DMA-friendly slab gather);
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


def _gather_kernel(window: int, n: int, precision, *refs):
    """Per-hit slab DMA + lane-group selection.

    Grid ``(n,)``; hit ``i`` copies ``x[start[i] : start[i]+W,
    col[i] : col[i]+128]`` HBM→VMEM (double-buffered: the copy for hit
    ``i+1`` is in flight while hit ``i`` computes), then compacts the
    stream's ``cps`` lanes to output rows with one tiny MXU matmul
    ``sel [8,128] @ slab[W,128]^T -> [8, W]`` — no scalar gathers, no
    full-slab materialization in HBM.
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
        copy(0, 0).start()

    @pl.when(i + 1 < n)
    def _prefetch():
        copy((i + 1) % 2, i + 1).start()

    copy(i % 2, i).wait()
    # HIGHEST precision (3x bf16 passes = the full f32 mantissa) makes the
    # one-hot selection bit-exact; DEFAULT is one bf16 pass — free when the
    # consumer casts to bf16 anyway (the serving model)
    out_ref[0] = jax.lax.dot_general(
        sel_ref[0],
        slab[i % 2],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _gather_pallas(
    x: jnp.ndarray,
    row_start: jnp.ndarray,
    stream_ids: jnp.ndarray,
    cps: int,
    window: int,
    interpret: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """[N, 8, W] windows via the DMA gather kernel (rows cps..7 zero).

    ``row_start``/``stream_ids`` are flat per-hit arrays — each hit reads
    stream ``stream_ids[i]``'s ``cps`` lanes starting at row
    ``row_start[i]``.
    """
    groups = LANE // cps
    n = row_start.shape[0]
    # tile-unit indices (see copy() in the kernel): rows floored to the
    # 8-row sublane tile — callers pass block-aligned starts, which are
    # 8-aligned for every power-of-two block size ≥ 8
    rows8 = row_start // 8
    cols = stream_ids // groups
    g = stream_ids % groups
    # per-hit lane-selection matrix [N, 8, LANE]: row c one-hot at lane
    # g*cps + c for c < cps
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (n, _SUB, LANE), 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (n, _SUB, LANE), 2)
    sel = jnp.where(
        (row_iota < cps)
        & (lane_iota == g[:, None, None] * cps + row_iota),
        jnp.float32(1.0),
        jnp.float32(0.0),
    )
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
            pltpu.VMEM((2, window, LANE), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        partial(_gather_kernel, window, n, precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, _SUB, window), jnp.float32),
        interpret=interpret,
    )(rows8, cols, sel, x)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def gather_block_windows(
    x: jnp.ndarray,
    block_starts: jnp.ndarray,
    channels_per_stream: int,
    window: int,
    pre: int = 0,
    backend: str = "auto",
    interpret: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
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
    :returns: ``[S, K, cps, W]`` float32 windows.  Row starts are floored
        to 8-sample (sublane) alignment: ``windows[s, k, c, w] ==
        x[((starts[s, k] - pre) // 8) * 8 + w, s*cps + c]`` — block-aligned
        ``starts`` with 8-aligned ``pre`` (the serving path) are read
        exactly; other callers see up to 7 samples of extra lead-in.
    """
    t, c = x.shape
    cps = channels_per_stream
    n_streams = c // cps
    k = block_starts.shape[1]
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
    if backend == "pallas" and wide:
        stream_ids = jnp.repeat(jnp.arange(n_streams, dtype=jnp.int32), k)
        out = _gather_pallas(
            x, row_start, stream_ids, cps, window, interpret, precision
        )
        return out[:, :cps].reshape(n_streams, k, cps, window)
    if wide:
        groups = LANE // cps
        stream_ids = jnp.repeat(jnp.arange(n_streams, dtype=jnp.int32), k)
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
        windows = jnp.einsum("skwgc,sg->skwc", slab, mask)
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
    on: jnp.ndarray, block_size: int, n_streams: int, capacity: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-capacity per-stream hit list from dense detector events.

    :param on: ``[nb, S*cps]`` bool per-block fire flags
    :param block_size: detector block size
    :returns: ``(starts [S, K] int32 block-start samples, valid [S, K]
        bool)`` — the first ``capacity`` hit blocks per stream, in time
        order, selected by hit-count prefix sum (slot ``j`` holds the
        unique block whose running hit count equals ``j+1``).
    """
    nb = on.shape[0]
    cps = on.shape[1] // n_streams
    hit = jnp.any(on.reshape(nb, n_streams, cps), axis=-1)  # [nb, S]
    # sort-free: the j-th hit block of a stream is the unique row where the
    # hit-count prefix sum equals j+1 (lax.top_k lowers to a full sort on
    # TPU — measured 33 ms at [2048, 750]; this is a cumsum + K argmax
    # passes, ~1 ms)
    rank = jnp.cumsum(hit.astype(jnp.int32), axis=0)  # [nb, S]
    slots = []
    valids = []
    for j in range(capacity):
        m = hit & (rank == j + 1)
        slots.append(jnp.argmax(m, axis=0).astype(jnp.int32))  # [S]
        valids.append(jnp.any(m, axis=0))
    blk = jnp.stack(slots, axis=1)  # [S, K]
    valid = jnp.stack(valids, axis=1)
    return (blk * block_size).astype(jnp.int32), valid


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
    per-stream worst case (measured 3x on the bench operating point:
    49152 padded slots -> 16384 for ~8192 real hits/chunk).

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


@partial(jax.jit, static_argnums=(2,))
def compact_hit_list(
    starts: jnp.ndarray, valid: jnp.ndarray, capacity: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
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
        overflow beyond G is dropped and counted, never silent.
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
    return (
        out_starts,
        jnp.where(valid_out, stream_ids, 0).astype(jnp.int32),
        valid_out,
        n_dropped,
    )


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
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
    :param starts: ``[N]`` int32 start samples (block-aligned)
    :param stream_ids: ``[N]`` int32 stream of each hit
    :param precision: MXU precision of the lane-selection matmul (see
        :func:`gather_block_windows`)
    :returns: ``[N, cps, W]`` float32 windows.
    """
    t, c = x.shape
    cps = channels_per_stream
    row_start = jnp.clip(starts - pre, 0, t - window) // 8 * 8
    wide = c % LANE == 0 and LANE % cps == 0
    if backend == "auto":
        backend = (
            "pallas" if wide and jax.default_backend() == "tpu" else "xla"
        )
    if backend == "pallas" and wide:
        out = _gather_pallas(
            x, row_start, stream_ids, cps, window, interpret, precision
        )
        return out[:, :cps]
    if wide:
        groups = LANE // cps
        col_base = ((stream_ids // groups) * LANE).astype(jnp.int32)

        def cut(st, cb):
            return jax.lax.dynamic_slice(x, (st, cb), (window, LANE))

        slab = jax.vmap(cut)(row_start, col_base)  # [N, W, 128]
        slab = slab.reshape(-1, window, groups, cps)
        mask = jax.nn.one_hot(
            stream_ids % groups, groups, dtype=slab.dtype
        )  # [N, groups]
        windows = jnp.einsum("nwgc,ng->nwc", slab, mask)
        return windows.transpose(0, 2, 1)
    # narrow fallback: direct row/col gather (host/CPU paths)
    rows = row_start[:, None] + jnp.arange(window, dtype=jnp.int32)
    cols = stream_ids[:, None] * cps + jnp.arange(cps, dtype=jnp.int32)
    windows = x[rows[:, :, None], cols[:, None, :]]  # [N, W, cps]
    return windows.transpose(0, 2, 1)
