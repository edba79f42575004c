"""Sharded offline processing: data-parallel and halo time-sharding.

The reference's "long-sequence" technology is constant-memory host
streaming (SURVEY.md §5.7: blockwise detectors detection.py:727-798, C ring
buffers).  The TPU equivalents here:

- :func:`detect_offline_sharded` — shard a *batch* of recordings over the
  ``data`` mesh axis (fleet-scale mining: every device runs the fused
  detector scan on its shard; no collectives needed until aggregation).
- :func:`detect_offline_time_sharded` — shard ONE long recording over
  devices *by time* with a warm-up halo: each device re-runs the detector
  over ``halo`` samples of its left neighbor's segment before its own, then
  discards the halo outputs.  The detector's carried state (IIR + AR
  envelopes + EMA min/max) forgets exponentially, so a halo of a few slow-AR
  time constants reproduces the sequential result away from segment heads —
  the honest context-parallel analogue for streaming DSP.
"""

from __future__ import annotations

import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from onset_fingerprinting_tpu.detect.amplitude import (
    DetectorParams,
    DetectorState,
    detect_offline,
)


def shard_batch(mesh: Mesh, x: jnp.ndarray, axis: str = "data") -> jnp.ndarray:
    """Place ``x`` sharded over its leading axis."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def _halo_segments(
    static, x: jnp.ndarray, n_dev: int, halo: Optional[int]
) -> tuple[jnp.ndarray, int, int, int]:
    """Build per-device time segments of ``x`` ``[T, C]`` with left warm-up
    halos (halo of segment 0 is zeros — it warms up from the initial state
    like the sequential run).

    ``x`` is zero-padded UP to a whole number of blocks per device (never
    floor-truncated: flooring would silently drop up to
    ``n_dev*block_size - 1`` trailing samples — and any end-of-recording
    onsets in them).  The sequential driver processes ``T // block_size``
    whole blocks, so callers must discard output blocks at global index
    ``>= nb_orig``; those cover only padding.

    Returns ``(segs [D, halo+seg, C], halo, seg, nb_orig)``.
    """
    bsz = static.block_size
    t, c = x.shape
    if halo is None:
        halo = int(3 * max(static.cooldown, 2205))
    halo = ((halo + bsz - 1) // bsz) * bsz
    nb_orig = t // bsz  # whole blocks the sequential run would process
    seg = ((t + n_dev * bsz - 1) // (n_dev * bsz)) * bsz
    t_used = seg * n_dev
    if t_used > t:
        x = jnp.concatenate([x, jnp.zeros((t_used - t, c), x.dtype)])
    segs = []
    for d in range(n_dev):
        start = d * seg - halo
        if start < 0:
            pad = jnp.zeros((-start, c), x.dtype)
            segs.append(jnp.concatenate([pad, x[: d * seg + seg]]))
        else:
            segs.append(x[start : d * seg + seg])
    return jnp.stack(segs), halo, seg, nb_orig


def _tile_streams(static, params, state, per_dev: int, c: int):
    """Widen a per-stream detector config to ``per_dev`` batched streams:
    tile the caller's exact static config / params / state across the
    stream axis (the detector is channel-independent)."""
    import dataclasses

    static_l = dataclasses.replace(
        static, n_channels=per_dev * c, coupled_off=False
    )
    params_l = DetectorParams(
        on_threshold=jnp.tile(params.on_threshold, per_dev),
        off_threshold=jnp.tile(params.off_threshold, per_dev),
        b=params.b,
        a=params.a,
    )
    state_l = DetectorState(
        zi=jnp.tile(state.zi, (1, per_dev)) if state.zi.size else state.zi,
        fast=jnp.tile(state.fast, per_dev),
        slow=jnp.tile(state.slow, per_dev),
        min_val=jnp.tile(state.min_val, per_dev),
        max_val=jnp.tile(state.max_val, per_dev),
        gate=jnp.tile(state.gate, per_dev),
        prev_rel=jnp.tile(state.prev_rel, per_dev),
        debounce=jnp.tile(state.debounce, per_dev),
        bt_buffer=jnp.tile(state.bt_buffer, (1, per_dev))
        if state.bt_buffer.size
        else state.bt_buffer,
        bt_pos=state.bt_pos,
    )
    return static_l, params_l, state_l


def detect_offline_sharded(
    static,
    params: DetectorParams,
    state: DetectorState,
    x: jnp.ndarray,
    mesh: Mesh,
    backend: str = "scan",
    interpret: bool = False,
):
    """Run the fused offline detector over a sharded batch ``[S, T, C]``.

    The batch folds into the channel axis (the detector is
    channel-independent — SURVEY §2.7's vectorized multi-channel parallelism
    taken to fleet scale): each device runs ONE wide-channel detector over
    its shard of streams via ``shard_map`` — no vmap (which recompiles the
    scan per batch width and compiles poorly), no collectives.  Use
    ``coupled_off_gate=False`` in the detector config so independent streams
    don't couple through the reference's cross-channel off-gate quirk.

    ``backend='pallas'`` runs the fused kernel per device.
    Returns per-stream results ``(on [S, nb, C], deltas [S, nb, C],
    rel [S, T, C])``; the detector state is not carried out — use
    :func:`detect_offline_chunked` when streaming continuation matters.
    """
    from jax import shard_map

    n_streams, t, c = x.shape
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    assert n_streams % n_dev == 0, "streams must divide the mesh axis"
    per_dev = n_streams // n_dev

    static_l, params_l, state_l = _tile_streams(
        static, params, state, per_dev, c
    )

    if backend == "pallas":
        from onset_fingerprinting_tpu.ops.pallas_detector import (
            pallas_detect_offline,
            pallas_static,
        )

        pstatic = pallas_static(static_l, params_l)

        def per_shard(xb):  # [S_local, T, C]
            wide = jnp.moveaxis(xb, 0, 1).reshape(t, per_dev * c)
            _, (on, deltas, rel) = pallas_detect_offline(
                pstatic, params_l, state_l, wide, interpret
            )
            nb = t // static.block_size
            unfold = lambda a, d0: jnp.moveaxis(
                a.reshape(d0, per_dev, c), 1, 0
            )
            return (
                unfold(on, nb),
                unfold(deltas, nb),
                unfold(rel, t),
            )
    else:

        def per_shard(xb):
            wide = jnp.moveaxis(xb, 0, 1).reshape(t, per_dev * c)
            _, (on, deltas, rel) = detect_offline(
                static_l, params_l, state_l, wide
            )
            nb = t // static.block_size
            unfold = lambda a, d0: jnp.moveaxis(
                a.reshape(d0, per_dev, c), 1, 0
            )
            return unfold(on, nb), unfold(deltas, nb), unfold(rel, t)

    run = jax.jit(
        shard_map(
            per_shard,
            mesh=mesh,
            in_specs=P(axis),
            out_specs=P(axis),
            check_vma=False,
        )
    )
    return run(jax.device_put(x, NamedSharding(mesh, P(axis))))


def detect_offline_time_sharded(
    static,
    params: DetectorParams,
    state: DetectorState,
    x: jnp.ndarray,
    mesh: Mesh,
    halo: Optional[int] = None,
    axis: str = "data",
    backend: str = "scan",
    interpret: bool = False,
):
    """Detect over ONE long recording ``[T, C]`` sharded by time with a
    warm-up halo.  Returns dense per-block (on, deltas) covering the same
    ``T // block_size`` whole blocks the sequential driver processes (halo
    region outputs discarded per shard; the tail is zero-padded up to a
    whole number of blocks per device and the padding blocks dropped —
    never real samples).

    ``halo`` defaults to ~3 slow-envelope time constants (rounded up to the
    block size) — enough for the detector's exponential state to forget the
    segment boundary.
    """
    n_dev = mesh.shape[axis]
    bsz = static.block_size
    t, c = x.shape
    xs, halo, seg, nb_orig = _halo_segments(static, x, n_dev, halo)
    xs = jax.device_put(xs, NamedSharding(mesh, P(axis)))
    bstate = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (n_dev,) + a.shape), state
    )

    if backend == "pallas":
        # shard_map: each device runs the fused kernel on its local segment
        from jax import shard_map

        from onset_fingerprinting_tpu.ops.pallas_detector import (
            pallas_detect_offline,
            pallas_static,
        )

        pstatic = pallas_static(static, params)

        def per_shard(xb):  # [1, halo+seg, C] local slice
            _, (on, deltas, rel) = pallas_detect_offline(
                pstatic, params, state, xb[0], interpret
            )
            skip = halo // bsz
            return on[None, skip:], deltas[None, skip:], rel[None, halo:]

        run = jax.jit(
            shard_map(
                per_shard,
                mesh=mesh,
                in_specs=P(axis),
                out_specs=P(axis),
                # pallas_call out_shapes carry no varying-mesh-axis info
                check_vma=False,
            )
        )
        on, deltas, rel = run(xs)
    else:

        @jax.jit
        def run(bs, xb):
            _, (on, deltas, rel) = jax.vmap(
                lambda st, xi: detect_offline(static, params, st, xi)
            )(bs, xb)
            skip = halo // bsz
            return on[:, skip:], deltas[:, skip:], rel[:, halo:]

        on, deltas, rel = run(bstate, xs)
    # stitch shards back to the global timeline, discarding the trailing
    # zero-padding blocks (>= nb_orig) so outputs match the sequential run
    on = on.reshape(-1, c)[:nb_orig]
    deltas = deltas.reshape(-1, c)[:nb_orig]
    rel = rel.reshape(-1, c)[: nb_orig * bsz]
    return on, deltas, rel


def events_from_dense(
    on: np.ndarray, deltas: np.ndarray, block_size: int
) -> tuple[list[int], list[int]]:
    """Dense per-block (on, deltas) → (channels, absolute onset samples)."""
    on = np.asarray(on)
    deltas = np.asarray(deltas)
    blocks, chans = np.nonzero(on)
    onsets = blocks * block_size + deltas[blocks, chans]
    return list(chans), list(onsets)


# Sentinel for empty event slots.  Kept as a plain Python int: a
# module-level ``jnp.int32(...)`` would execute an eager
# ``convert_element_type`` on the default device at import time — before
# any caller (e.g. ``dryrun_multichip``) can pin computation to CPU —
# which breaks imports on hosts whose accelerator plugin is unhealthy.
_BIG = 2**30


def detect_events_time_sharded(
    static,
    params: DetectorParams,
    state: DetectorState,
    x: jnp.ndarray,
    mesh: Mesh,
    halo: Optional[int] = None,
    axis: str = "data",
    capacity: int = 64,
    backend: str = "scan",
    interpret: bool = False,
    return_dropped: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Detect over one long recording ``[T, C]`` time-sharded across the
    mesh, with ON-DEVICE cross-device event aggregation.

    Each device runs the detector over its halo-warmed time segment, reduces
    its dense per-block outputs to a fixed-capacity event queue
    ``(onset_abs, channel)``, and ``all_gather``s the queues over the mesh
    axis — the ICI-collective replacement of the reference's shared-memory
    event visibility across processes (recording.py:133-145).  Every device
    ends up holding the GLOBAL event set, so downstream device stages
    (grouping, locate) need no host round-trip.

    Returns host ``(channels [N], onsets [N])`` sorted by onset time.
    ``capacity`` bounds events per device segment; overflow drops the
    LATEST events of that segment, and is never silent: per-segment raw
    event counts ride the same ``all_gather``, a :class:`UserWarning` is
    emitted naming the per-segment drop counts, and
    ``return_dropped=True`` additionally returns the ``[D]`` array of
    dropped-event counts (the reference's SHM path, recording.py:133-145,
    is lossless — callers mining unknown hit densities must be able to
    see when this bounded queue is not).
    """
    from jax import shard_map

    n_dev = mesh.shape[axis]
    bsz = static.block_size
    t, c = x.shape
    if t + n_dev * bsz >= _BIG:
        # onset_abs keys share the int32 lane with the _BIG empty-slot
        # sentinel; past it real events would sort as padding and vanish.
        raise ValueError(
            f"recording of {t} samples exceeds the {_BIG}-sample "
            "(~3.1 h @ 96 kHz) limit of the int32 event keys — chunk the "
            "recording (detect_offline_chunked) and offset the results"
        )
    xs, halo, seg, nb_orig = _halo_segments(static, x, n_dev, halo)
    xs = jax.device_put(xs, NamedSharding(mesh, P(axis)))  # [D, halo+seg, C]

    if backend == "pallas":
        from onset_fingerprinting_tpu.ops.pallas_detector import (
            pallas_detect_offline,
            pallas_static,
        )

        pstatic = pallas_static(static, params)

        def detect_local(xi):
            _, (on, deltas, _) = pallas_detect_offline(
                pstatic, params, state, xi, interpret, emit_rel=False
            )
            return on, deltas
    else:

        def detect_local(xi):
            _, (on, deltas, _) = detect_offline(static, params, state, xi)
            return on, deltas

    def per_shard(xb):  # [1, halo+seg, C] local slice
        d = jax.lax.axis_index(axis)
        on, deltas, = detect_local(xb[0])
        skip = halo // bsz
        on = on[skip:]
        deltas = deltas[skip:]
        nb_local = on.shape[0]
        # dense → fixed-capacity event queue, ordered by onset time
        blk = jax.lax.broadcasted_iota(jnp.int32, on.shape, 0)
        # mask blocks past the sequential run's whole-block count: they
        # cover only the zero padding _halo_segments appended
        gblk = d.astype(jnp.int32) * nb_local + blk
        on = jnp.logical_and(on, gblk < nb_orig)
        onset_abs = d.astype(jnp.int32) * seg + blk * bsz + deltas
        key = jnp.where(on, onset_abs, _BIG).reshape(-1)
        chan = jax.lax.broadcasted_iota(jnp.int32, on.shape, 1).reshape(-1)
        order = jnp.argsort(key)[:capacity]
        ev_onsets = key[order]           # _BIG = empty slot
        ev_chans = chan[order]
        # the collective: every device receives every segment's queue
        g_onsets = jax.lax.all_gather(ev_onsets, axis)   # [D, K]
        g_chans = jax.lax.all_gather(ev_chans, axis)
        # raw (pre-capacity) event count rides the same collective so the
        # host can report overflow drops instead of losing them silently
        n_raw = jnp.sum(on.astype(jnp.int32))
        g_counts = jax.lax.all_gather(n_raw, axis)       # [D]
        return g_onsets, g_chans, g_counts

    run = jax.jit(
        shard_map(
            per_shard,
            mesh=mesh,
            in_specs=P(axis),
            # replicated outputs (all_gather makes every shard identical)
            out_specs=P(),
            check_vma=False,
        )
    )
    g_onsets, g_chans, g_counts = run(xs)
    g_onsets = np.asarray(g_onsets).reshape(-1)
    g_chans = np.asarray(g_chans).reshape(-1)
    dropped = np.maximum(np.asarray(g_counts) - capacity, 0)
    if dropped.any():
        warnings.warn(
            f"detect_events_time_sharded: event-queue overflow — dropped "
            f"{int(dropped.sum())} event(s) beyond capacity={capacity} "
            f"(per-segment drops: {dropped.tolist()}); raise `capacity`",
            UserWarning,
            stacklevel=2,
        )
    valid = g_onsets < _BIG
    onsets = g_onsets[valid]
    chans = g_chans[valid]
    order = np.argsort(onsets, kind="stable")
    if return_dropped:
        return chans[order], onsets[order], dropped
    return chans[order], onsets[order]


def make_detect_fingerprint_sharded(
    static,
    params: DetectorParams,
    state: DetectorState,
    shape: tuple,
    mesh: Mesh,
    model,
    window: int = 256,
    pre: int = 64,
    capacity: int = 16,
    backend: str = "scan",
    interpret: bool = False,
    layout: str = "stream",
    channels_per_stream: int | None = None,
    compact_capacity: int | None = None,
    gather_precision=None,
):
    """Build the reusable sharded serving pipeline: fused detection →
    fixed-capacity hit lists → DMA window gather → fingerprint model, all
    inside ONE ``shard_map`` program (the multi-chip form of ``bench.py``'s
    fused dispatch; reference serving path model.py:443-629).

    Returns ``run(x, model_params) -> (preds, starts, valid, n_dropped)``
    — a jitted callable to REUSE across calls (rebuilding it per call
    would retrace the whole pipeline each time).  ``n_dropped`` is an
    ``[n_devices] int32`` per-device count of hits beyond the compaction
    budget (all zeros when compaction is off — no silent caps).

    ``compact_capacity`` (per device) switches the gather+model stage to
    the globally compacted hit list (``ops/windows.py::compact_hit_list``
    route): the window gather and the model run over ``compact_capacity``
    real hits instead of ``per_dev*capacity`` padded slots — measured
    1.4x faster fingerprinting at the single-chip bench operating point —
    and predictions are scattered back into the padded ``[S, capacity]``
    output layout, so the rest of the return contract is IDENTICAL.  Hits
    beyond the budget are dropped zero-masked, flagged invalid, and
    counted in ``n_dropped`` (size the budget generously; the per-stream
    ``capacity`` already bounds the worst-case stream).

    :param shape: the input shape ``x.shape`` the callable will serve —
        ``layout='stream'``: ``[S, T, C]`` sharded over the first axis
        (convenient, but the in-program transpose to wide channels
        materializes a lane-padded intermediate — measured ~1 s for
        64×96k×4 on v5e); ``layout='wide'``: ``[T, S*C]``
        channel-interleaved, stream-major, sharded over columns
        (zero-copy — the serving-speed layout).
    :param model: flax module mapping ``[B, C, window] → [B, out]``
    :param gather_precision: MXU precision of the window gather's
        lane-select matmul (default HIGHEST = bit-exact f32).  Pass
        ``jax.lax.Precision.DEFAULT`` (one bf16 pass) when ``model``
        computes in bf16 anyway — the serving configuration.
    """
    from jax import shard_map

    from onset_fingerprinting_tpu.ops.windows import (
        compact_hit_list,
        gather_block_windows,
        gather_hit_windows,
        top_hit_blocks,
    )

    if layout == "wide":
        t, c_total = shape
        c = channels_per_stream
        n_streams = c_total // c
    else:
        n_streams, t, c = shape
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    assert n_streams % n_dev == 0, "streams must divide the mesh axis"
    per_dev = n_streams // n_dev
    bsz = static.block_size

    static_l, params_l, state_l = _tile_streams(
        static, params, state, per_dev, c
    )

    if backend == "pallas":
        from onset_fingerprinting_tpu.ops.pallas_detector import (
            pallas_detect_offline,
            pallas_static,
        )

        pstatic = pallas_static(static_l, params_l)

        def detect_wide(wide):
            _, (on, deltas, _) = pallas_detect_offline(
                pstatic, params_l, state_l, wide, interpret, emit_rel=False
            )
            return on, deltas
    else:

        def detect_wide(wide):
            _, (on, deltas, _) = detect_offline(
                static_l, params_l, state_l, wide
            )
            return on, deltas

    gather_backend = "xla" if interpret else "auto"
    gather_prec = (
        jax.lax.Precision.HIGHEST
        if gather_precision is None
        else gather_precision
    )

    def body(wide, mp):  # [T, per_dev*c] local wide channels
        on, deltas = detect_wide(wide)
        starts, valid = top_hit_blocks(on, bsz, per_dev, capacity)
        if compact_capacity is not None:
            # compacted route: gather + model over real hits only
            # (ops/windows.py::compact_hit_list — the single source of the
            # compaction contract), then scatter predictions back into the
            # padded [S, K] layout.  Overflow beyond the budget is COUNTED
            # and returned, never silent.
            n_slots = per_dev * capacity
            sts, sids, ok, n_dropped, idx = compact_hit_list(
                starts, valid, compact_capacity, return_indices=True
            )
            windows = gather_hit_windows(
                wide, sts, sids, c, window, pre, gather_backend,
                False, gather_prec,
            )  # [G, c, W]
            p = model.apply(mp, windows)
            p = jnp.where(ok[:, None], p, 0.0)
            scatter = jnp.where(ok, idx, n_slots)
            preds = jnp.zeros(
                (n_slots, p.shape[-1]), p.dtype
            ).at[scatter].set(p, mode="drop")
            preds = preds.reshape(per_dev, capacity, -1)
            # slots beyond the compact budget stay zero AND are reported
            # invalid, so overflow is visible to the caller
            kept = jnp.zeros((n_slots,), bool).at[scatter].set(
                True, mode="drop"
            )
            valid = valid & kept.reshape(per_dev, capacity)
            return preds, starts, valid, n_dropped[None]
        windows = gather_block_windows(
            wide, starts, c, window, pre, gather_backend,
            False, gather_prec,
        )
        preds = model.apply(
            mp, windows.reshape(per_dev * capacity, c, window)
        )
        preds = preds.reshape(per_dev, capacity, -1)
        preds = jnp.where(valid[..., None], preds, 0.0)
        return preds, starts, valid, jnp.zeros((1,), jnp.int32)

    if layout == "wide":

        def per_shard(xb, mp):  # [T, per_dev*c]
            return body(xb, mp)

        in_spec = P(None, axis)
    else:

        def per_shard(xb, mp):  # [S_local, T, C]
            return body(jnp.moveaxis(xb, 0, 1).reshape(t, per_dev * c), mp)

        in_spec = P(axis)

    jitted = jax.jit(
        shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(in_spec, P()),
            # preds/starts/valid stack over the axis; the per-shard [1]
            # drop counts concatenate to [n_devices]
            out_specs=(P(axis), P(axis), P(axis), P(axis)),
            check_vma=False,
        )
    )

    def run(x, model_params):
        return jitted(
            jax.device_put(x, NamedSharding(mesh, in_spec)), model_params
        )

    return run


def make_detect_locate_sharded(
    static,
    params: DetectorParams,
    state: DetectorState,
    shape: tuple,
    mesh: Mesh,
    locator,
    model=None,
    event_capacity: int = 32,
    locator_capacity: int = 8,
    window: int = 256,
    pre: int = 64,
    axis: str = "data",
):
    """Full sharded serve datapath — detect → jittable locate →
    (optionally) classify — as ONE ``shard_map`` program.

    The multi-chip form of the realtime engine's fused per-block step
    (``realtime/engine.py::build_step``; reference datapath
    multilateration.py:428-575 inside the audio callback): a batch of
    independent drum streams ``[S, T, C]`` is sharded over the mesh axis,
    each device detects onsets on its streams, feeds them in onset order
    through the fixed-capacity jittable locator (a ``lax.scan`` — a
    stream's event sequence is inherently sequential, so streams are the
    parallel axis), and classifies a window around each located hit with
    ``model``.  No collectives are needed until the caller aggregates:
    streams are independent, which is exactly why this stage scales
    linearly over ICI.

    :param locator: host :class:`~..locate.multilaterate.Multilaterate3D`
        whose lag tables are baked into the jitted update.
    :param model: optional flax module ``[B, C, window] → [B, out]``
        applied to every event slot's window (zero-masked where not
        located).
    :returns: ``run(x, model_params) -> (points [S, E, 2] cm,
        onsets [S, E] int32, emits [S, E] bool, preds [S, E, out])`` with
        ``E = event_capacity``; slots beyond a stream's real event count
        have ``emits`` False.  Detected events beyond ``event_capacity``
        per stream are dropped oldest-last (fixed-capacity contract — size
        it to the serve horizon).
    """
    from jax import shard_map

    from onset_fingerprinting_tpu.locate.multilaterate import (
        locator_init,
        make_locate_update,
    )

    n_streams, t, c = shape
    n_dev = mesh.shape[axis]
    assert n_streams % n_dev == 0, "streams must divide the mesh axis"
    bsz = static.block_size
    locate_update = make_locate_update(locator, capacity=locator_capacity)
    e = event_capacity

    def one_stream(xs, mp):  # [T, C]
        _, (on, deltas, _) = detect_offline(static, params, state, xs)
        blk = jax.lax.broadcasted_iota(jnp.int32, on.shape, 0)
        onset_abs = blk * bsz + deltas
        key = jnp.where(on, onset_abs, _BIG).reshape(-1)
        ch = jax.lax.broadcasted_iota(jnp.int32, on.shape, 1).reshape(-1)
        order = jnp.argsort(key)[:e]
        ev_on = key[order]
        ev_ch = ch[order]

        def step(lstate, ev):
            onset, sensor = ev
            valid = onset < _BIG
            new, point, emit = locate_update(lstate, sensor, onset)
            lstate = jax.tree.map(
                lambda n_, o_: jnp.where(valid, n_, o_), new, lstate
            )
            return lstate, (point, valid & emit)

        _, (points, emits) = jax.lax.scan(
            step, locator_init(locator_capacity), (ev_on, ev_ch)
        )
        if model is None:
            return points, ev_on, emits, jnp.zeros((e, 0), jnp.float32)
        starts = jnp.clip(
            jnp.where(ev_on < _BIG, ev_on, 0) - pre, 0, t - window
        )
        idx = starts[:, None] + jnp.arange(window)[None, :]
        wins = jnp.take(xs, idx, axis=0)  # [E, window, C]
        preds = model.apply(mp, wins.transpose(0, 2, 1))
        return points, ev_on, emits, jnp.where(emits[:, None], preds, 0.0)

    def per_shard(xb, mp):  # [S_local, T, C]
        return jax.vmap(one_stream, in_axes=(0, None))(xb, mp)

    jitted = jax.jit(
        shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(axis), P()),
            out_specs=(P(axis), P(axis), P(axis), P(axis)),
            check_vma=False,
        )
    )

    def run(x, model_params=None):
        return jitted(
            jax.device_put(x, NamedSharding(mesh, P(axis))), model_params
        )

    return run


def detect_fingerprint_sharded(
    static,
    params: DetectorParams,
    state: DetectorState,
    x: jnp.ndarray,
    mesh: Mesh,
    model,
    model_params,
    **kwargs,
):
    """One-shot convenience wrapper over
    :func:`make_detect_fingerprint_sharded` (which see).  For repeated
    serving calls, build the pipeline once and reuse it.

    :returns: ``(preds [S, capacity, out], starts [S, capacity] int32,
        valid [S, capacity] bool, n_dropped [n_devices] int32)`` —
        zero-masked predictions per detected hit; ``n_dropped`` counts
        compaction-budget overflow per device (zeros unless
        ``compact_capacity`` is set and exceeded).
    """
    run = make_detect_fingerprint_sharded(
        static, params, state, tuple(x.shape), mesh, model, **kwargs
    )
    return run(x, model_params)
