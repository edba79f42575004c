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
def _pack_events(ev_count, ev_points, ev_onsets):
    """Flatten (count, points, onsets) into one f32 vector so harvest costs
    a single device→host transfer."""
    return jnp.concatenate(
        [
            # bit-preserving: a plain f32 cast loses integer exactness past
            # 2^24 cumulative hits (and int32 onsets past ~175 s at 96 kHz)
            jax.lax.bitcast_convert_type(ev_count[None], jnp.float32),
            ev_points.reshape(-1),
            jax.lax.bitcast_convert_type(ev_onsets, jnp.float32),
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
    [capacity] bool) -> preds [capacity, out]`` (zero-masked).

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
        start = jnp.clip(start, lo, hi)
        idx = jnp.mod(
            start[:, None] + jnp.arange(window, dtype=jnp.int32)[None, :],
            cap,
        )  # [K, W]
        wins = ring.data[idx]  # [K, W, C]
        wins = jnp.swapaxes(wins, 1, 2)  # [K, C, W]
        preds = model.apply(model_params, wins)
        return jnp.where(valid[:, None], preds, 0.0)

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

        lstate, points, emits = jax.lax.fori_loop(
            0, c, body, (state.locator, points0, emits0)
        )

        # append completed hits to the device-side event queue
        eq = state.ev_points.shape[0]

        def push(i, carry):
            ev_points, ev_onsets, ev_count = carry
            slot = jnp.mod(ev_count, eq)
            hit = emits[i]
            ev_points = jnp.where(
                hit, ev_points.at[slot].set(points[i]), ev_points
            )
            ev_onsets = jnp.where(
                hit, ev_onsets.at[slot].set(onsets_abs[i]), ev_onsets
            )
            ev_count = ev_count + hit.astype(jnp.int32)
            return ev_points, ev_onsets, ev_count

        ev_points, ev_onsets, ev_count = jax.lax.fori_loop(
            0, c, push, (state.ev_points, state.ev_onsets, state.ev_count)
        )

        new_state = EngineState(
            detector=dstate,
            locator=lstate,
            ring=ring,
            sample_count=state.sample_count + block.shape[0],
            ev_points=ev_points,
            ev_onsets=ev_onsets,
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
    ):
        self.cfg = cfg
        self.locator = locator
        self.actions = actions or Actions()
        self.fx = list(fx)
        self.monitor_channels = monitor_channels
        self.state, self.params, self._step = make_engine_step(
            cfg, locator, ring_seconds, use_pallas=use_pallas, model=model,
            model_input=model_input,
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
        audio).  Runs off the audio thread."""
        if not hasattr(self, "_classify"):
            raise RuntimeError("attach_classifier() first")
        if not events:
            return np.zeros((0, 0), np.float32)
        cap = self._classify_capacity
        out = []
        for base in range(0, len(events), cap):
            chunk = events[base : base + cap]
            onsets = np.zeros((cap,), np.int32)
            valid = np.zeros((cap,), bool)
            for i, (onset, _) in enumerate(chunk):
                onsets[i] = onset
                valid[i] = True
            preds = np.asarray(
                self._classify(
                    self.state.ring, jnp.asarray(onsets), jnp.asarray(valid)
                )
            )
            out.append(preds[: len(chunk)])
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

    def start_pipeline(self, depth: int = 16) -> None:
        """Start the dispatcher thread for :meth:`process_pipelined`.

        The audio thread then only copies the block into a bounded queue
        (microseconds, deterministic); the dispatcher thread runs the device
        step, absorbing dispatch-latency jitter (tunnel RTT spikes) that
        would otherwise surface as audio deadline misses.  Device work must
        still sustain one block per budget ON AVERAGE — watch the
        ``engine.dispatch`` latency and ``engine.pipeline.drops`` metrics.
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

        def loop():
            # bind the queue: self._pipe_q may be swapped by stop/start
            while True:
                item = q.get()
                if item is None:
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
            _pack_events(st.ev_count, st.ev_points, st.ev_onsets)
        )
        count = int(packed[:1].view(np.int32)[0])
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
        points = packed[1 : 1 + 2 * eq].reshape(eq, 2)
        onsets = packed[1 + 2 * eq :].view(np.int32)
        out = []
        for k in range(self._harvested, count):
            slot = k % eq
            loc = Location(
                x=float(points[slot, 0]),
                y=float(points[slot, 1]),
                radius=self.locator.radius,
            )
            out.append((int(onsets[slot]), loc))
        self._harvested = count
        if self.metrics is not None:
            self.metrics.count("engine.hits", float(new))
        return out

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
