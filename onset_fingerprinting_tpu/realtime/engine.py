"""Fused realtime engine: one jitted program per audio block.

Replaces the reference's Python-per-event serve loop (reference:
realtime/audio.py:62-122: detector call → per-onset ``Multilaterate3D.locate``
→ fsolve/torch inference, all in the 1.33 ms PortAudio callback budget) with
ONE device program per block:

    (EngineState, block [B, C]) -> (EngineState, BlockEvents)

containing the fused detector scan, the fixed-capacity jittable locator
update for every fired channel (in onset order), and trilateration — so the
host shim only moves a raw audio block in and a small event struct out.
Dispatch latency dominates the budget; everything else stays in HBM/VMEM.

The host wrapper :class:`RealtimeEngine` mirrors PlayRec's responsibilities:
ring-buffer recording, event→Location conversion, Actions and FX chain
application, wall-time↔sample-counter mapping (audio.py:135-146), and an
optional sounddevice stream when PortAudio is present (gated import).
"""

from __future__ import annotations

import time
import warnings
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from onset_fingerprinting_tpu.core.config import DetectorConfig
from onset_fingerprinting_tpu.core.ring_buffer import (
    CircularArray,
    RingBuffer,
    ring_init,
    ring_write,
)
from onset_fingerprinting_tpu.detect.amplitude import (
    DetectorParams,
    DetectorState,
    detect_block,
    detector_init,
)
from onset_fingerprinting_tpu.locate.multilaterate import (
    LocatorState,
    Multilaterate3D,
    locator_init,
    make_locate_update,
)
from onset_fingerprinting_tpu.realtime.actions import Actions, Location


@jax.jit
def _pack_events(ev_count, ev_points, ev_onsets, ev_emits):
    """Flatten (count, points, onsets, emit indices) into one int32 vector
    so harvest costs a single device→host transfer.

    The vector is INT-typed with the f32 points bitcast into it — not the
    other way around: small int32 values bitcast to f32 are denormals, and
    TPU float datapaths flush denormals to zero (observed: counts/onsets
    read back as 0 through the packed transfer while the normal-valued
    points survived).  Integer lanes carry all 32 bit patterns faithfully.
    """
    return jnp.concatenate(
        [
            # bit-preserving: a plain f32 cast loses integer exactness past
            # 2^24 cumulative hits (and int32 onsets past ~175 s at 96 kHz)
            ev_count[None],
            jax.lax.bitcast_convert_type(ev_points.reshape(-1), jnp.int32),
            ev_onsets,
            ev_emits,
        ]
    )


class EngineState(NamedTuple):
    detector: DetectorState
    locator: LocatorState
    ring: RingBuffer
    sample_count: jnp.ndarray  # int32 absolute sample counter
    # device-side located-hit queue: lets the host harvest events every N
    # blocks with ONE readback instead of a synchronous transfer per block
    # (host readbacks dominate latency on remote/tunneled TPUs)
    ev_points: jnp.ndarray     # [E, 2] float32 ring of located hits
    ev_onsets: jnp.ndarray     # [E] int32 absolute onset sample of each hit
    # block-start sample of the block whose processing EMITTED the hit (the
    # completing arrival's block) — the per-hit latency anchor: latency is
    # measured from that block's audio entering the pipeline, the same span
    # the reference's synchronous callback bounds by one 1.333 ms block
    # (audio.py:81-120, config.py:33-36)
    ev_emits: jnp.ndarray      # [E] int32 emitting block's start sample
    ev_count: jnp.ndarray      # scalar int32 cumulative hit counter


class BlockEvents(NamedTuple):
    """Fixed-capacity per-block outputs (at most one onset and one completed
    hit per channel per block by construction)."""

    on: jnp.ndarray       # [C] bool — channel fired this block
    onsets: jnp.ndarray   # [C] int32 absolute onset sample (valid where on)
    points: jnp.ndarray   # [C, 2] float32 located hits (valid where emits)
    emits: jnp.ndarray    # [C] bool — a hit completed at this event


def make_classify_fn(
    model,
    model_params,
    window: int = 256,
    pre: int = 64,
    capacity: int = 16,
):
    """Jitted on-device hit classifier over the engine's audio ring.

    Completes the serve datapath SURVEY §7 sketches (detect→locate→
    *classify* fused on device): for up to ``capacity`` located hits, the
    onset windows are gathered straight from the device-resident audio
    ring (no host round-trip of audio) and pushed through the fingerprint
    model in one dispatch.  Runs OFF the audio thread (harvest cadence),
    so the classify cost never touches the 1.333 ms block budget.

    Returns ``classify(ring, onsets [capacity] i32 absolute, valid
    [capacity] bool) -> (preds [capacity, out], fresh [capacity] bool)``.
    ``preds`` is zero-masked where not valid OR not fresh; ``fresh`` is
    False where the hit's window start has already been overwritten in
    the ring (the harvest→classify path stalled longer than the ring's
    history).  A stale hit must never be silently classified from the
    wrong audio — the caller counts and flags these.

    Requires ``window <= ring.capacity`` (checked at trace time — with a
    ring shorter than the window the history clamp below would invert and
    read unwritten frames).  An onset within ``window - pre`` samples of
    the write head has its window shifted back so it ends at the head
    (the onset then sits later than offset ``pre``) rather than dropped.
    """

    @jax.jit
    def classify(ring: RingBuffer, onsets: jnp.ndarray, valid: jnp.ndarray):
        cap = ring.capacity
        if window > cap:
            raise ValueError(
                f"classify window ({window}) exceeds ring capacity "
                f"({cap}); allocate a longer ring"
            )
        start = onsets - pre
        # clamp into the ring's live history (never read past the write
        # head or before the oldest retained frame)
        lo = jnp.maximum(ring.counter - cap, 0)
        hi = jnp.maximum(ring.counter - window, 0)
        # stale: the window start was already overwritten — the clamp
        # below would gather the wrong (newer) audio, so flag instead of
        # silently classifying it.  Compared against the UNCLAMPED
        # retention bound: an early-stream onset (start < 0, clamped to
        # the ring head) has nothing overwritten and stays fresh.
        fresh = valid & (start >= ring.counter - cap)
        start = jnp.clip(start, lo, hi)
        idx = jnp.mod(
            start[:, None] + jnp.arange(window, dtype=jnp.int32)[None, :],
            cap,
        )  # [K, W]
        wins = ring.data[idx]  # [K, W, C]
        wins = jnp.swapaxes(wins, 1, 2)  # [K, C, W]
        preds = model.apply(model_params, wins)
        return jnp.where(fresh[:, None], preds, 0.0), fresh

    return classify


def make_engine_step(
    cfg: DetectorConfig,
    locator: Multilaterate3D,
    ring_seconds: float = 2.0,
    capacity: int = 8,
    use_pallas: bool | None = None,
    event_queue: int = 64,
    cc_refine: bool = False,
    model=None,
    model_input: str = "arrival",
):
    """Build (initial EngineState, jitted step fn).

    The locator's lag maps and geometry are baked in as device constants.
    ``use_pallas`` swaps the per-block detector for the fused Pallas kernel
    (~4x faster block step); default (None) auto-selects it on TPU and the
    portable XLA-scan path elsewhere.  ``model`` (an
    ``FCNNBundle``) swaps the Newton trilateration for the learned lags→xy
    model *inside* the fused program — the reference instead round-trips to
    a torch FCNN on host per hit (multilateration.py:555-557).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    static, params, dstate = detector_init(cfg)
    if use_pallas:
        from onset_fingerprinting_tpu.ops.pallas_detector import (
            pallas_detect_offline,
            pallas_static,
        )

        pstatic = pallas_static(static, params)

        def detect_fn(params_, st, block):
            st, (on, deltas, rel) = pallas_detect_offline(
                pstatic, params_, st, block
            )
            return st, (on[0], deltas[0], rel)
    else:

        def detect_fn(params_, st, block):
            return detect_block(static, params_, st, block)
    locate_update = make_locate_update(
        locator, capacity=capacity, cc_refine=cc_refine, model=model,
        model_input=model_input,
    )
    win_len = getattr(locate_update, "window_len", 0)
    c = cfg.n_channels
    ring = ring_init(
        int(ring_seconds * cfg.sr), (c,), dtype=jnp.float32
    )
    state0 = EngineState(
        detector=dstate,
        locator=locator_init(capacity),
        ring=ring,
        sample_count=jnp.zeros((), jnp.int32),
        ev_points=jnp.zeros((event_queue, 2), jnp.float32),
        ev_onsets=jnp.zeros((event_queue,), jnp.int32),
        ev_emits=jnp.zeros((event_queue,), jnp.int32),
        ev_count=jnp.zeros((), jnp.int32),
    )

    big = jnp.int32(10**9)

    @jax.jit
    def step(
        state: EngineState, block: jnp.ndarray, params_: DetectorParams
    ) -> tuple[EngineState, BlockEvents]:
        dstate, (on, deltas, rel) = detect_fn(params_, state.detector, block)
        ring = ring_write(state.ring, block)
        onsets_abs = state.sample_count + deltas
        if cc_refine:
            # fixed-length live-audio window ending 'now' for onset-lag
            # refinement inside the locator (multilateration.py:457-501)
            from onset_fingerprinting_tpu.core.ring_buffer import (
                ring_read_last,
            )

            window = ring_read_last(ring, win_len)
            win_start = state.sample_count + block.shape[0] - win_len

        # feed fired channels to the locator in onset order
        order = jnp.argsort(jnp.where(on, deltas, big))
        points0 = jnp.zeros((c, 2), jnp.float32)
        emits0 = jnp.zeros((c,), bool)

        def body(i, carry):
            lstate, points, emits = carry
            ch = order[i]
            valid = on[ch]
            if cc_refine:
                new_lstate, point, emit = locate_update(
                    lstate, ch, onsets_abs[ch], window, win_start
                )
            else:
                new_lstate, point, emit = locate_update(
                    lstate, ch, onsets_abs[ch]
                )
            lstate = jax.tree.map(
                lambda new, old: jnp.where(valid, new, old),
                new_lstate,
                lstate,
            )
            points = points.at[ch].set(jnp.where(valid & emit, point, 0.0))
            emits = emits.at[ch].set(valid & emit)
            return lstate, points, emits

        # statically unrolled over the (small, static) channel count: a
        # lax.fori_loop here is a dynamic device loop whose per-iteration
        # thunk overhead dominates this launch-bound per-block program
        carry = (state.locator, points0, emits0)
        for i in range(c):
            carry = body(i, carry)
        lstate, points, emits = carry

        # append completed hits to the device-side event queue
        eq = state.ev_points.shape[0]

        def push(i, carry):
            ev_points, ev_onsets, ev_emits, ev_count = carry
            slot = jnp.mod(ev_count, eq)
            hit = emits[i]
            ev_points = jnp.where(
                hit, ev_points.at[slot].set(points[i]), ev_points
            )
            ev_onsets = jnp.where(
                hit, ev_onsets.at[slot].set(onsets_abs[i]), ev_onsets
            )
            ev_emits = jnp.where(
                hit, ev_emits.at[slot].set(state.sample_count), ev_emits
            )
            ev_count = ev_count + hit.astype(jnp.int32)
            return ev_points, ev_onsets, ev_emits, ev_count

        # unrolled for the same launch-overhead reason as the locate loop
        carry = (state.ev_points, state.ev_onsets, state.ev_emits,
                 state.ev_count)
        for i in range(c):
            carry = push(i, carry)
        ev_points, ev_onsets, ev_emits, ev_count = carry

        new_state = EngineState(
            detector=dstate,
            locator=lstate,
            ring=ring,
            sample_count=state.sample_count + block.shape[0],
            ev_points=ev_points,
            ev_onsets=ev_onsets,
            ev_emits=ev_emits,
            ev_count=ev_count,
        )
        return new_state, BlockEvents(on, onsets_abs, points, emits)

    return state0, params, step


class RealtimeEngine:
    """Host shim around the fused per-block device program.

    Usage (pull model, like the PortAudio callback):

        eng = RealtimeEngine(cfg, locator, actions=Actions(), fx=[...])
        out = eng.process(block)   # every block_size samples

    Events are returned as :class:`Location` objects (cm, drum-centric) and
    also dispatched to the actions scheduler + FX chain in place, mirroring
    the reference callback (audio.py:81-121).
    """

    def __init__(
        self,
        cfg: DetectorConfig,
        locator: Multilaterate3D,
        actions: Optional[Actions] = None,
        fx: list = (),
        ring_seconds: float = 2.0,
        monitor_channels: int = 2,
        host_ring: Optional[CircularArray] = None,
        use_pallas: bool | None = None,
        metrics=None,
        model=None,
        model_input: str = "arrival",
        event_queue: int = 64,
    ):
        self.cfg = cfg
        self.locator = locator
        self.actions = actions or Actions()
        self.fx = list(fx)
        self.monitor_channels = monitor_channels
        self.state, self.params, self._step = make_engine_step(
            cfg, locator, ring_seconds, use_pallas=use_pallas, model=model,
            model_input=model_input, event_queue=event_queue,
        )
        self.host_ring = host_ring
        self.current_index = 0
        self.callback_time: Optional[tuple[float, int]] = None
        #: optional utils.metrics.Metrics — records per-block device latency
        #: ('engine.step' ms) and hit counters
        self.metrics = metrics
        self._harvested = 0  # events already drained from the device queue
        #: events overwritten in the device queue before a harvest saw them
        self.harvest_drops = 0
        #: hits whose ring audio was overwritten before classify_hits ran
        #: (predictions zeroed, never silently classified)
        self.classify_stale = 0
        #: bool mask from the last classify_hits call (True = fresh audio)
        self.last_classify_fresh = np.zeros((0,), bool)
        # per-block enqueue stamps for the onset→host latency histogram:
        # slot (block_start // block_size) % N holds (block_start, monotonic
        # enqueue time); written on the audio thread (process_pipelined),
        # read at harvest.  N = ~11 s of blocks at 96 kHz/128.
        self._stamp_n = 8192
        self._stamp_t = np.zeros(self._stamp_n, np.float64)
        self._stamp_idx = np.full(self._stamp_n, -1, np.int64)
        self._enq_index = 0
        #: per-hit onset→host latencies (ms), appended at harvest for every
        #: event whose emitting block has an enqueue stamp
        self.hit_latencies_ms: list[float] = []
        #: analysis side-channel (attach_analysis); None until attached
        self.analysis = None
        self.recording_active = False
        #: completed recordings: (start, end, bpm) tuples
        self.recordings: list[tuple[int, int, Optional[float]]] = []

    def attach_analysis(self, rt_cfg=None):
        """Create the online analysis side-channel over the host audio ring
        (the reference's RecAnalysis/AnalysisOnDemand processes,
        recording.py:121-604 — here a local object fed by the same blocks the
        engine processes).  Creates ``host_ring`` if absent; per-block writes
        into it already happen in :meth:`process`/:meth:`process_nosync`.

        Pace it by calling ``engine.analysis.poll()`` (deterministic) or via
        :class:`realtime.analysis.AnalysisWorker` (thread).
        """
        from onset_fingerprinting_tpu.core.config import RealtimeConfig
        from onset_fingerprinting_tpu.realtime.analysis import OnlineAnalysis

        if rt_cfg is None:
            rt_cfg = RealtimeConfig(
                sr=self.cfg.sr,
                blocksize=self.cfg.block_size,
                hop_length=self.cfg.block_size,
            )
        if self.host_ring is None:
            self.host_ring = CircularArray(
                np.zeros((rt_cfg.rec_n, self.cfg.n_channels), np.float32)
            )
        self.analysis = OnlineAnalysis(rt_cfg, self.host_ring)
        return self.analysis

    def attach_classifier(
        self, model, model_params, window: int = 256, pre: int = 64,
        capacity: int = 16,
    ) -> None:
        """Attach an on-device fingerprint/zone classifier: harvested hits
        can then be classified from the device audio ring in one batched
        dispatch via :meth:`classify_hits` — the serve-side fingerprinting
        stage (windows never leave the device)."""
        self._classify = make_classify_fn(
            model, model_params, window=window, pre=pre, capacity=capacity
        )
        self._classify_capacity = capacity

    def classify_hits(self, events) -> np.ndarray:
        """Classify harvested hits ``[(onset, Location), ...]`` from the
        device ring.  Returns ``[len(events), out]`` predictions.  Call
        soon after :meth:`harvest` (the ring holds ``ring_seconds`` of
        audio).  Runs off the audio thread.

        Hits whose audio has already been overwritten in the ring (the
        harvest→classify path stalled longer than ``ring_seconds``) are
        NEVER silently classified from the wrong window: their rows are
        zeroed, counted in :attr:`classify_stale`, flagged in
        :attr:`last_classify_fresh` (bool mask aligned with ``events``),
        and warned about — size the ring to the transport's stall
        horizon."""
        if not hasattr(self, "_classify"):
            raise RuntimeError("attach_classifier() first")
        if not events:
            self.last_classify_fresh = np.zeros((0,), bool)
            return np.zeros((0, 0), np.float32)
        cap = self._classify_capacity
        out, fresh_out = [], []
        for base in range(0, len(events), cap):
            chunk = events[base : base + cap]
            onsets = np.zeros((cap,), np.int32)
            valid = np.zeros((cap,), bool)
            for i, (onset, _) in enumerate(chunk):
                onsets[i] = onset
                valid[i] = True
            preds, fresh = self._classify(
                self.state.ring, jnp.asarray(onsets), jnp.asarray(valid)
            )
            out.append(np.asarray(preds)[: len(chunk)])
            fresh_out.append(np.asarray(fresh)[: len(chunk)])
        fresh = np.concatenate(fresh_out, axis=0)
        self.last_classify_fresh = fresh
        n_stale = int((~fresh).sum())
        if n_stale:
            self.classify_stale += n_stale
            if self.metrics is not None:
                self.metrics.count("engine.classify.stale", float(n_stale))
            warnings.warn(
                f"classify_hits: {n_stale} hit(s) fell out of the audio "
                f"ring before classification (predictions zeroed, counted "
                f"in classify_stale) — raise ring_seconds to cover the "
                "harvest→classify stall horizon",
                UserWarning,
                stacklevel=2,
            )
        return np.concatenate(out, axis=0)

    # -- recording commands (reference analysis_action protocol,
    #    recording.py:379-395: 1=quantize_start, 2=quantize_end) -----------

    def start_recording(self) -> int:
        """Mark a recording start at 'now' and snap it to a nearby strong
        onset (recording.py:495-529).  Returns the quantized start sample."""
        if self.analysis is None:
            raise RuntimeError("attach_analysis() first")
        self.analysis.poll()
        self.analysis.recording_start = self.current_index
        self.analysis.quantize_start()
        self.recording_active = True
        return self.analysis.recording_start

    def stop_recording(self) -> tuple[int, int, Optional[float]]:
        """Mark the recording end at 'now', extrapolate it to a whole number
        of beats from the BPM estimate (recording.py:531-569), and return
        ``(start, end, bpm)``."""
        if self.analysis is None:
            raise RuntimeError("attach_analysis() first")
        self.analysis.poll()
        self.analysis.recording_end = self.current_index
        end = self.analysis.quantize_end()
        self.recording_active = False
        rec = (self.analysis.recording_start, end, self.analysis.last_bpm)
        self.recordings.append(rec)
        return rec

    def bpm(self, seconds: float = 4.0) -> float:
        """Current BPM estimate over the last ``seconds`` of audio."""
        if self.analysis is None:
            raise RuntimeError("attach_analysis() first")
        self.analysis.poll()
        frames = int(seconds * self.cfg.sr / self.analysis.cfg.hop_length)
        return self.analysis.bpm(-frames)

    def warmup(self, audio: np.ndarray) -> None:
        """Prime detector envelopes/thresholds on calibration audio."""
        from onset_fingerprinting_tpu.detect.amplitude import warmup_minmax

        static, _, _ = detector_init(self.cfg)
        t = (len(audio) // self.cfg.block_size) * self.cfg.block_size
        if t:
            det = warmup_minmax(
                static, self.params, self.state.detector,
                jnp.asarray(audio[:t]),
            )
            self.state = self.state._replace(detector=det)

    def process(self, block: np.ndarray) -> tuple[np.ndarray, list[Location]]:
        """Process one [B, C] block; returns (output audio, located hits)."""
        self.callback_time = (time.monotonic(), self.current_index)
        if self.host_ring is not None:
            self.host_ring.write(block)
        t0 = time.perf_counter()
        self.state, events = self._step(
            self.state, jnp.asarray(block, jnp.float32), self.params
        )
        emits = np.asarray(events.emits)
        if self.metrics is not None:
            self.metrics.observe(
                "engine.step", (time.perf_counter() - t0) * 1e3
            )
            self.metrics.count("engine.blocks")
            self.metrics.count("engine.hits", float(emits.sum()))
        locations: list[Location] = []
        if emits.any():
            pts = np.asarray(events.points)
            for ch in np.nonzero(emits)[0]:
                locations.append(
                    Location(
                        x=float(pts[ch, 0]),
                        y=float(pts[ch, 1]),
                        radius=self.locator.radius,
                    )
                )
        out = np.asarray(block[:, : self.monitor_channels], dtype=np.float32)
        out = out * 2.0  # passthrough monitor mix (audio.py:109)
        for loc in locations:
            self.actions.run(out, loc)
        for fx in self.fx:
            out = fx(out, self.cfg.sr, len(out), reset=False)
        self.current_index += len(block)
        return out, locations

    def process_nosync(self, block: np.ndarray) -> None:
        """Run the per-block device program WITHOUT any host readback.

        Pair with :meth:`harvest` every N blocks: located hits accumulate in
        the device-side event queue, so the audio thread never blocks on a
        device→host transfer (which dominates latency on remote/tunneled
        TPUs; ~tens of ms RTT vs ~1.5 ms for the program itself).
        """
        self.callback_time = (time.monotonic(), self.current_index)
        if self.host_ring is not None:
            self.host_ring.write(block)
        t0 = time.perf_counter()
        self.state, _ = self._step(
            self.state, jnp.asarray(block, jnp.float32), self.params
        )
        if self.metrics is not None:
            self.metrics.observe_deadline(
                "engine.step",
                (time.perf_counter() - t0) * 1e3,
                self.budget_ms,
            )
            self.metrics.count("engine.blocks")
        self.current_index += len(block)

    # -- pipelined dispatch: keep tunnel RTT jitter out of the audio thread

    @property
    def budget_ms(self) -> float:
        """Hard per-block realtime budget (reference config.py:33-36)."""
        return self.cfg.block_size / self.cfg.sr * 1e3

    def start_pipeline(self, depth: int = 16, batch_blocks: int = 1) -> None:
        """Start the dispatcher thread for :meth:`process_pipelined`.

        The audio thread then only copies the block into a bounded queue
        (microseconds, deterministic); the dispatcher thread runs the device
        step, absorbing dispatch-latency jitter (tunnel RTT spikes) that
        would otherwise surface as audio deadline misses.  Device work must
        still sustain one block per budget ON AVERAGE — watch the
        ``engine.dispatch`` latency and ``engine.pipeline.drops`` metrics.

        ``batch_blocks > 1`` micro-batches dispatch: the dispatcher
        collects that many blocks and runs them as ONE scanned device
        program (identical state trajectory — the scan chains the same
        per-block step).  Use on high-RTT transports where the
        per-dispatch cost exceeds the block budget (a tunneled dev chip
        sustains ~3 ms per single-block dispatch vs the 1.33 ms budget;
        batching 4 amortizes it to <1 ms/block at <=4 blocks of added
        buffering).  Locally-attached chips should keep 1 — batching only
        adds latency there.
        """
        import queue as _queue
        import threading

        if getattr(self, "_pipe_q", None) is not None:
            # a previous stop_pipeline timed out with the dispatcher wedged:
            # only recover once that thread has actually exited — two
            # dispatchers would race the non-atomic self.state update.
            # Warn rather than silently no-op: the caller would otherwise
            # believe a dispatcher is draining its blocks when the wedged
            # one is about to exit on the stale stop sentinel.
            if self._pipe_thread.is_alive():
                warnings.warn(
                    "start_pipeline: previous dispatcher is still wedged "
                    "(stop_pipeline timed out) — not starting a second "
                    "one; retry once it exits",
                    UserWarning,
                    stacklevel=2,
                )
                return
            self._pipe_q = None
        self._pipe_q = q = _queue.Queue(maxsize=depth)
        self.pipeline_drops = 0
        self._drops_lock = threading.Lock()
        # sync the enqueue-side sample counter with the engine's processed
        # counter (blocks run before the pipeline, e.g. compile warmup,
        # advanced it) so enqueue stamps key on the same block-start values
        # the device's ev_emits records
        self._enq_index = self.current_index
        if batch_blocks > 1:
            step_fn, params = self._step, self.params

            @jax.jit
            def step_multi(state, blocks):  # [n, B, C]
                def f(st, b):
                    st, _ = step_fn(st, b, params)
                    return st, None

                st, _ = jax.lax.scan(f, state, blocks)
                return st

            self._step_multi = step_multi

        def process_batch(buf):
            blocks = np.stack(buf)
            if self.host_ring is not None:
                self.host_ring.write(blocks.reshape(-1, blocks.shape[-1]))
            t0 = time.perf_counter()
            self.state = self._step_multi(
                self.state, jnp.asarray(blocks, jnp.float32)
            )
            if self.metrics is not None:
                self.metrics.observe(
                    "engine.dispatch", (time.perf_counter() - t0) * 1e3
                )
            self.current_index += blocks.shape[0] * blocks.shape[1]

        def loop():
            buf = []
            # bind the queue: self._pipe_q may be swapped by stop/start
            while True:
                item = q.get()
                if item is None:
                    # flush partial micro-batch through the single-block
                    # path before exiting (same state trajectory)
                    for b in buf:
                        self.process_nosync(b)
                    buf = []
                    # blocks enqueued BEHIND the stop sentinel (a caller
                    # racing stop_pipeline, or feeding a queue whose
                    # dispatcher was wedged at stop time) will never be
                    # processed — count them as drops, never lose them
                    # silently.  Drain with get_nowait and count actual
                    # items (a qsize() snapshot would miss blocks enqueued
                    # concurrently after the sentinel was dequeued, and
                    # would count stale stop sentinels as blocks).
                    leftover = 0
                    while True:
                        try:
                            if q.get_nowait() is not None:
                                leftover += 1
                        except _queue.Empty:
                            break
                    if leftover:
                        with self._drops_lock:
                            self.pipeline_drops += leftover
                        if self.metrics is not None:
                            self.metrics.count(
                                "engine.pipeline.drops", float(leftover)
                            )
                    return
                if batch_blocks > 1:
                    buf.append(item)
                    if len(buf) >= batch_blocks:
                        process_batch(buf)
                        buf = []
                    continue
                t0 = time.perf_counter()
                self.process_nosync(item)
                if self.metrics is not None:
                    self.metrics.observe(
                        "engine.dispatch", (time.perf_counter() - t0) * 1e3
                    )

        self._pipe_thread = threading.Thread(target=loop, daemon=True)
        self._pipe_thread.start()

    def process_pipelined(self, block: np.ndarray) -> None:
        """Audio-thread side of the pipelined dispatch: enqueue a copy of the
        block (the caller's buffer may be reused) and return immediately.
        When the queue is full (device persistently slower than realtime)
        the block is DROPPED and counted, never blocked on."""
        import queue as _queue

        t0 = time.perf_counter()
        # stamp the block's arrival for the onset→host latency histogram
        slot = (self._enq_index // self.cfg.block_size) % self._stamp_n
        self._stamp_t[slot] = time.monotonic()
        self._stamp_idx[slot] = self._enq_index
        self._enq_index += len(block)
        try:
            self._pipe_q.put_nowait(np.array(block, np.float32, copy=True))
        except _queue.Full:
            # the dispatcher thread also mutates pipeline_drops (sentinel
            # drain) — the lock keeps the read-modify-write lossless; it is
            # uncontended in steady state (dispatcher only takes it at stop)
            with self._drops_lock:
                self.pipeline_drops += 1
            if self.metrics is not None:
                self.metrics.count("engine.pipeline.drops")
        if self.metrics is not None:
            self.metrics.observe_deadline(
                "engine.enqueue",
                (time.perf_counter() - t0) * 1e3,
                self.budget_ms,
            )

    def stop_pipeline(self, timeout: float = 30.0) -> None:
        """Drain the queue and join the dispatcher thread.

        If the thread does not exit within ``timeout`` (a wedged device
        dispatch can block for minutes) the queue stays bound and a
        warning is emitted: ``start_pipeline`` will refuse to spawn a
        second dispatcher until the stuck one exits — two dispatchers
        would race the non-atomic ``self.state`` read-modify-write.
        """
        if getattr(self, "_pipe_q", None) is None:
            return
        self._pipe_q.put(None)
        self._pipe_thread.join(timeout=timeout)
        if self._pipe_thread.is_alive():
            warnings.warn(
                f"stop_pipeline: dispatcher still alive after {timeout}s "
                "(wedged device dispatch?) — start_pipeline stays a no-op "
                "until it exits",
                UserWarning,
                stacklevel=2,
            )
            return
        self._pipe_q = None

    @property
    def pipeline_backlog(self) -> int:
        q = getattr(self, "_pipe_q", None)
        return q.qsize() if q is not None else 0

    def harvest(self) -> list[tuple[int, Location]]:
        """Drain newly located hits from the device event queue.

        Returns ``[(absolute onset sample, Location), ...]``; the caller
        dispatches them (e.g. ``engine.actions.run`` against the next output
        buffer).  One packed device→host transfer per call — transfers are
        the expensive primitive on remote TPUs.
        """
        st = self.state  # snapshot: the dispatcher thread may swap self.state
        packed = np.asarray(
            _pack_events(st.ev_count, st.ev_points, st.ev_onsets,
                         st.ev_emits)
        )
        t_host = time.monotonic()  # events are on host as of now
        count = int(packed[0])
        new = count - self._harvested
        if new <= 0:
            return []
        eq = st.ev_points.shape[0]
        if new > eq:  # queue overflow: oldest events were overwritten
            lost = new - eq
            self.harvest_drops += lost
            if self.metrics is not None:
                self.metrics.count("engine.harvest.drops", float(lost))
            warnings.warn(
                f"harvest: device event queue overflowed — {lost} event(s) "
                f"overwritten since the last harvest (capacity {eq}); "
                "harvest more often or raise event_queue",
                UserWarning,
                stacklevel=2,
            )
            self._harvested = count - eq
            new = eq
        points = packed[1 : 1 + 2 * eq].view(np.float32).reshape(eq, 2)
        onsets = packed[1 + 2 * eq : 1 + 3 * eq]
        emit_idx = packed[1 + 3 * eq :]
        out = []
        for k in range(self._harvested, count):
            slot = k % eq
            loc = Location(
                x=float(points[slot, 0]),
                y=float(points[slot, 1]),
                radius=self.locator.radius,
            )
            out.append((int(onsets[slot]), loc))
            # onset→host latency: from the EMITTING block's enqueue stamp
            # (ev_emits — the completing arrival's block, the span the
            # reference bounds by one block in its synchronous callback)
            sslot = (int(emit_idx[slot]) // self.cfg.block_size) \
                % self._stamp_n
            if self._stamp_idx[sslot] == int(emit_idx[slot]):
                lat_ms = (t_host - self._stamp_t[sslot]) * 1e3
                self.hit_latencies_ms.append(lat_ms)
                if self.metrics is not None:
                    self.metrics.observe("engine.hit_latency", lat_ms)
            else:
                # no enqueue stamp (block ran outside the pipelined path):
                # keep 1:1 alignment between hit_latencies_ms and harvested
                # events so callers can zip them
                self.hit_latencies_ms.append(float("nan"))
        self._harvested = count
        if self.metrics is not None:
            self.metrics.count("engine.hits", float(new))
        return out

    # -- continuous harvester: event-driven hit delivery off the audio path

    def start_harvester(self, sink, period: float = 0.0) -> None:
        """Poll :meth:`harvest` continuously on a dedicated thread and feed
        each ``(onset, Location)`` to ``sink``.

        The harvest readback is the latency-critical hop of the serve loop:
        polled from the producer loop it adds the poll period to every
        hit's latency; here it runs back-to-back (``period=0``) so a hit
        reaches the host one readback after its block's device step — on a
        locally-attached chip that is sub-ms; through a tunneled dev chip
        each readback costs the transport RTT (measure it and subtract to
        estimate deployment latency, as the demo does).  Runs on its own
        thread so a slow readback never blocks dispatch.
        """
        import threading

        if getattr(self, "_harvester", None) is not None:
            raise RuntimeError("harvester already running")
        self._harvest_stop = threading.Event()

        def loop():
            while not self._harvest_stop.is_set():
                for ev in self.harvest():
                    sink(ev)
                if period > 0:
                    self._harvest_stop.wait(period)

        self._harvester = threading.Thread(target=loop, daemon=True)
        self._harvester.start()

    def stop_harvester(self, timeout: float = 10.0) -> None:
        if getattr(self, "_harvester", None) is None:
            return
        self._harvest_stop.set()
        self._harvester.join(timeout=timeout)
        self._harvester = None

    def event_counter(self) -> tuple[int, int]:
        """(absolute sample counter, samples since block start) for 'now' —
        the wall-time → buffer-index mapping (audio.py:135-146).  Before the
        first processed block there is no time reference yet: returns
        ``(0, 0)``."""
        if self.callback_time is None:
            return 0, 0
        t0, idx = self.callback_time
        since = round((time.monotonic() - t0) * self.cfg.sr)
        return idx + since, since

    # -- optional PortAudio stream (host audio I/O not available on TPU pods)
    def stream(self, device=None, latency: float = 0.001):
        try:
            import sounddevice as sd
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "sounddevice/PortAudio not available in this environment"
            ) from e

        def callback(indata, outdata, frames, tinfo, status):
            out, _ = self.process(indata.copy())
            outdata[:] = out[:, : outdata.shape[1]]

        return sd.Stream(
            samplerate=self.cfg.sr,
            device=device,
            channels=(self.cfg.n_channels, self.monitor_channels),
            callback=callback,
            latency=latency,
            blocksize=self.cfg.block_size,
        )
