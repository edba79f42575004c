"""Simulated realtime serve loop: native ring → executor → fused engine.

Drives the full serving stack without an audio interface: a producer thread
writes a synthetic 3-sensor drum stream into the native C++ SPSC ring
(csrc/ofrt.cpp) at TRUE realtime pacing, the native block executor pulls
128-sample blocks on its own thread and invokes the fused TPU engine
(detect→locate in one device program per block) through the pipelined
dispatcher, a dedicated harvester thread drains located hits continuously,
and a classifier thread zone-classifies every hit from the device audio
ring (windows never leave the device).  Located hits trigger a
ParameterChange action.

Measured and GATED (reference budget realtime/config.py:33-36; north star
BASELINE.md "<1 ms p50 per-hit localize+classify"):

- audio-thread p99 < 1.333 ms (TPU runs; the CPU backend computes on the
  same host cores, so the budget is unenforceable there), zero dropped
  blocks, zero harvest overflows;
- >= 95% of synthesized hits located, median error <= 1 cm;
- classifier zone accuracy over served hits >= 0.8;
- per-hit latency, two measurements: (a) the END-TO-END histogram from the
  COMPLETING block's audio entering the pipeline to the host holding the
  located event (via the device event queue's emit stamps) — gated as a
  backlog bound (p50 within 8x the measured readback floor + 16 ms),
  because on this dev setup the span is transport-bound: through the axon
  tunnel every readback pays the ~26 ms RTT, and continuous readbacks
  serialize against the dispatch stream (harvest cadence auto-paces to
  ~2 RTT to keep the backlog bounded); (b) the NORTH-STAR gate
  (BASELINE.md "<1 ms p50 per-hit localize"): the measured device
  per-block cost + ~0.2 ms local readback — the per-hit span on the
  deployment transport (locally-attached chip) — must be < 1 ms.

Run: python examples/realtime_sim_demo.py [--seconds 60]
"""

from __future__ import annotations

import argparse
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

from onset_fingerprinting_tpu.core.config import DetectorConfig, TrainConfig
from onset_fingerprinting_tpu.core.coords import (
    speed_of_sound,
    spherical_to_cartesian,
)
from onset_fingerprinting_tpu.locate import Multilaterate3D
from onset_fingerprinting_tpu.realtime import (
    Actions,
    Bounds,
    ParameterChange,
    ParameterMapper,
    RealtimeEngine,
)
from onset_fingerprinting_tpu.realtime.actions import FxParams
from onset_fingerprinting_tpu.runtime_native import NativeExecutor, NativeRing

SR = 96000
DIAM = 14 * 2.54
N_ZONES = 3  # angular sectors
CLS_WINDOW = 512  # classify window: must cover the full inter-sensor lag
# anchored at the COMPLETING arrival: earlier channels' bursts start up to
# ~350 samples (max inter-sensor lag) before the anchor
CLS_PRE = 384


def zone_of(x: float, y: float) -> int:
    return int(np.degrees(np.arctan2(y, x)) % 360.0 // (360 // N_ZONES))


def _geometry():
    radius = DIAM / 2
    polar = [(0.9, 0.0, 0.0), (0.9, 120.0, 0.0), (0.9, 240.0, 0.0)]
    xyz = [
        tuple(float(v) for v in spherical_to_cartesian(r * radius, phi, th))
        for (r, phi, th) in polar
    ]
    c = speed_of_sound(100, medium="drumhead")
    return radius, polar, xyz, c


def _burst(rng=None, amp: float = 0.6):
    t = np.arange(600)
    return (np.sin(2 * np.pi * 5000 / SR * t) * np.exp(-t / 150) * amp
            ).astype(np.float32)


def synth_stream(seconds: float, seed: int = 0):
    radius, polar, xyz, c = _geometry()
    rng = np.random.default_rng(seed)
    n = int(seconds * SR)
    audio = rng.normal(0, 1e-4, (n, 3)).astype(np.float32)
    burst = _burst()
    hits = []
    for base in range(SR // 4, n - 6000, SR // 4):
        r = np.sqrt(rng.uniform(0.04, 0.55)) * radius  # r in [0.2, 0.74]r
        ang = rng.uniform(0, 2 * np.pi)
        x, y = r * np.cos(ang), r * np.sin(ang)
        for ch, (sx, sy, _) in enumerate(xyz):
            d = np.hypot(x - sx, y - sy)
            s = base + int(round(d / c * SR))
            audio[s : s + 600, ch] += burst
        hits.append((base, x, y, zone_of(x, y)))
    return audio, polar, hits


def train_zone_classifier(seed: int = 1, n_per_zone: int = 120):
    """Quick zone classifier on synthetic windows shaped like what
    classify_hits gathers: [3, CLS_WINDOW] anchored near the earliest
    arrival (±8-sample jitter covers detector timing error).  The zone
    signal is the inter-channel delay pattern."""
    import jax
    import jax.numpy as jnp

    from onset_fingerprinting_tpu.models.cnn import CNN
    from onset_fingerprinting_tpu.models.train import Trainer

    radius, _, xyz, c = _geometry()
    rng = np.random.default_rng(seed)
    burst = _burst()
    xs, ys = [], []
    for _ in range(n_per_zone * N_ZONES):
        r = np.sqrt(rng.uniform(0.04, 0.55)) * radius
        ang = rng.uniform(0, 2 * np.pi)
        x, y = r * np.cos(ang), r * np.sin(ang)
        d = [np.hypot(x - sx, y - sy) for (sx, sy, _) in xyz]
        lags = np.array([int(round(di / c * SR)) for di in d])
        # the engine's harvested onset is the COMPLETING (last) arrival's
        # onset (the hit emits when the 3rd sensor fires), so classify
        # windows anchor there: the other channels' bursts start EARLIER
        lags -= lags.max()
        w = rng.normal(0, 1e-4, (CLS_WINDOW, 3)).astype(np.float32)
        anchor = CLS_PRE + int(rng.integers(-8, 9))
        for ch in range(3):
            s = anchor + lags[ch]
            m = min(600, CLS_WINDOW - s)
            if m > 0 and s >= 0:
                w[s : s + m, ch] += burst[:m] * rng.uniform(0.8, 1.2)
        xs.append(w.T)
        ys.append(zone_of(x, y))
    xs = np.stack(xs)
    ys = np.array(ys, np.int32)
    model = CNN(output_size=N_ZONES, layer_sizes=(8, 16), kernel_size=7,
                pool=True, dropout_rate=0.0)
    cfg = TrainConfig(lr=2e-3, num_epochs=250, min_epochs=0, patience=250,
                      loss="xent", seed=0, optimizer="adam")
    trainer = Trainer(model, cfg)
    state = trainer.fit((xs, ys), epochs_per_step=50)
    acc = float(
        np.mean(
            np.argmax(
                np.asarray(
                    model.apply(
                        {"params": state.params,
                         **({"batch_stats": state.batch_stats}
                            if getattr(state, "batch_stats", None) else {})},
                        jnp.asarray(xs), train=False,
                    )
                ),
                axis=1,
            )
            == ys
        )
    )
    variables = {"params": state.params}
    if getattr(state, "batch_stats", None):
        variables["batch_stats"] = state.batch_stats
    print(f"zone classifier trained: {acc:.2f} train accuracy", flush=True)
    return model, variables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--fast", action="store_true",
                    help="feed 4x realtime (smoke mode; latency not gated)")
    args = ap.parse_args()

    from onset_fingerprinting_tpu.core.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    audio, polar, hits = synth_stream(args.seconds)
    cfg = DetectorConfig(
        n_channels=3, block_size=128, hipass_freq=0.0, sr=SR
    )
    # feasibility cascade (1 -> 2 cm): the reference's single 1 cm tier
    # grid-aliases near sensors and silently drops ~1% of genuine strikes
    # (see _LagMapsMixin._feasible_cell); the 2 cm fallback tier recovers
    # them with no precision cost (Newton refines from the coarser cell)
    locator = Multilaterate3D(polar, drum_diameter=DIAM, medium="drumhead",
                              sr=SR, feasibility_tols=(1.0, 2.0))
    fx = FxParams(["cutoff"])
    b = Bounds(phi=[0, 360])
    actions = Actions()
    actions.append(
        ParameterChange(
            [b], fx, [ParameterMapper.from_bounds_fx(b, fx, "phi", ["cutoff"])]
        )
    )
    from onset_fingerprinting_tpu.utils.metrics import Metrics

    model, variables = train_zone_classifier()

    # Pallas per-block detector on TPU (~4x faster block step than the
    # XLA-scan path); scan path on CPU (kernels need interpret mode there).
    # Capacity is sized to the TRANSPORT'S stall horizon: the tunnel shows
    # multi-second hiccups (measured p99 harvest stall ~8.5 s), so the
    # audio ring must retain >8.5 s for late classification to read the
    # hit's real window (16 s, ~18 MB HBM), and the device event queue
    # must absorb the backlog (512 slots >> 4 hits/s × stall).  With the
    # 2 s / 64-slot defaults a single 8.5 s stall silently misclassified
    # ~50 hits from overwritten ring audio and overflowed the queue.
    engine = RealtimeEngine(
        cfg, locator, actions=actions, use_pallas=not args.cpu,
        metrics=Metrics(), ring_seconds=16.0, event_queue=512,
    )
    engine.attach_classifier(model, variables, window=CLS_WINDOW,
                             pre=CLS_PRE, capacity=16)
    engine.warmup(audio[: SR // 4])
    # force compiles before the stream starts (cold-compile would eat blocks)
    engine.process_nosync(np.zeros((128, 3), np.float32))
    engine.harvest()
    engine.classify_hits([(0, None)])

    # transport readback floor: the cost of ONE synchronous device→host
    # event-queue read (the harvest hop).  ~0 on a locally-attached chip;
    # the tunnel RTT on a remote dev chip.  Median of 20.
    floor_samples = []
    for _ in range(20):
        t0 = time.monotonic()
        engine.harvest()
        floor_samples.append(time.monotonic() - t0)
    floor_ms = 1e3 * float(np.median(floor_samples))

    # device execution time per block, measured WITHOUT per-dispatch
    # transport cost: scan K chained steps inside ONE dispatch (one upload,
    # one sync) — (t - floor)/K is the fused program's true per-block
    # execution time.  On a locally-attached chip the per-hit latency is
    # this (the completing block's step emits the event) plus one local
    # readback (~0.1-0.2 ms): the north-star span.  The per-dispatch
    # tunnel cost that dominates the streamed run is measured separately
    # by the pipeline stats below.
    import jax
    import jax.numpy as jnp

    # event-struct readback, MEASURED (VERDICT r4 #5: no assumed constant).
    # What a locally-attached chip pays per harvest beyond its own
    # (sub-0.1 ms) round trip is (a) the device execution of the
    # event-pack program and (b) moving the packed payload.  (a) is
    # measured transport-free exactly like step_ms below: queue k async
    # pack dispatches, one sync, subtract the single-dispatch floor,
    # divide by k.  (b) is bounded by the payload size printed with it —
    # a few hundred bytes, microseconds on any local link.  (Subtracting
    # a no-op sync from the harvest hop does NOT work on this transport:
    # the tunnel's per-call jitter, ~4 ms std, swamps the sub-ms marginal
    # — measured paired/interleaved it gives a NEGATIVE median.)
    from onset_fingerprinting_tpu.realtime.engine import _pack_events

    st_m = engine.state
    pack = jax.jit(_pack_events)
    packed = pack(st_m.ev_count, st_m.ev_points, st_m.ev_onsets,
                  st_m.ev_emits)
    packed.block_until_ready()
    payload_bytes = packed.size * packed.dtype.itemsize
    # scan N pack executions inside ONE dispatch (the step_ms methodology
    # below): async-queueing k separate dispatches measures the host's
    # tunnel enqueue rate, not device execution, whenever the tunnel is
    # loaded (observed 0.08-0.50 ms run-to-run for this same sub-0.1 ms
    # program).  Per-iteration onsets vary so the pack can't be hoisted.
    npk = 200
    on_seq = (st_m.ev_onsets[None, :]
              + jnp.arange(npk, dtype=st_m.ev_onsets.dtype)[:, None])

    @jax.jit
    def pack_multi(count, points, on_seq, emits):
        def f(acc, ons):
            return acc + jnp.sum(_pack_events(count, points, ons, emits)),\
                None
        acc, _ = jax.lax.scan(f, jnp.zeros((), packed.dtype), on_seq)
        return acc

    int(pack_multi(st_m.ev_count, st_m.ev_points, on_seq, st_m.ev_emits))
    t0 = time.monotonic()
    int(pack_multi(st_m.ev_count, st_m.ev_points, on_seq, st_m.ev_emits))
    readback_ms = max(
        ((time.monotonic() - t0) * 1e3 - floor_ms) / npk, 0.0
    )
    rb_str = (f"{readback_ms:.3f} ms"
              if readback_ms >= 1e-3 else
              "<0.001 ms (below the floor-subtraction resolution)")
    print(f"event-struct readback (measured, transport-free, {npk} "
          f"scanned packs in one dispatch): {rb_str} pack "
          f"execution per harvest + {payload_bytes} B payload "
          f"(~us on a local link)", flush=True)

    # classify execution, MEASURED the same way: the north star
    # (BASELINE.md) prices localize + CLASSIFY.  The classify program
    # (device-ring window gather + zone CNN) is a fixed-capacity batch —
    # its execution cost is shape-fixed, so one measurement covers both
    # the lone-hit worst case (whole cost on one hit) and the loaded
    # amortized case (cost / capacity per hit).  Runs off the audio
    # thread at harvest cadence.
    cls_cap = engine._classify_capacity
    cfn = engine._classify
    cls_on = jnp.zeros((cls_cap,), jnp.int32)
    cls_va = jnp.ones((cls_cap,), bool)
    # scan N classify executions inside ONE dispatch (the step_ms
    # methodology below) — async-queueing k separate dispatches measures
    # the host's tunnel enqueue rate, not device execution, once the
    # program is sub-ms (observed 0.1-0.6 ms run-to-run on the same
    # program).  Per-iteration onsets vary so the gather can't be hoisted
    # loop-invariant.
    ncls = 100
    ons_seq = (cls_on[None, :]
               + jnp.arange(ncls, dtype=jnp.int32)[:, None] * 8)

    @jax.jit
    def cls_multi(ring, seq, va):
        def f(acc, ons):
            preds, _fresh = cfn(ring, ons, va)
            return acc + jnp.sum(preds), None
        acc, _ = jax.lax.scan(f, jnp.float32(0), seq)
        return acc

    float(cls_multi(engine.state.ring, ons_seq, cls_va))  # compile
    t0 = time.monotonic()
    float(cls_multi(engine.state.ring, ons_seq, cls_va))
    classify_ms = max(
        ((time.monotonic() - t0) * 1e3 - floor_ms) / ncls, 0.0
    )
    print(f"classify execution (measured, transport-free, {ncls} scanned "
          f"batches in one dispatch): {classify_ms:.3f} ms per batch of "
          f"<= {cls_cap} hits ({classify_ms / cls_cap:.3f} ms/hit "
          f"amortized at capacity)", flush=True)

    K = 768  # ~1 s of blocks
    blocks = jnp.asarray(
        np.tile(audio[: K * 128].reshape(K, 128, 3), (1, 1, 1))
    )
    step_fn, params = engine._step, engine.params

    @jax.jit
    def multi(state, blocks):
        def f(st, b):
            st, ev = step_fn(st, b, params)
            return st, ev.emits
        st, em = jax.lax.scan(f, state, blocks)
        return st, jnp.sum(em)

    st2, n_em = multi(engine.state, blocks)  # compile
    _ = int(n_em)
    t0 = time.monotonic()
    st2, n_em = multi(engine.state, blocks)
    _ = int(n_em)
    step_ms = ((time.monotonic() - t0) - floor_ms / 1e3) * 1e3 / K
    print(f"device exec per block (scanned, transport-free): "
          f"{step_ms:.3f} ms (realtime budget {128 / SR * 1e3:.3f} ms); "
          f"locally-attached per-hit estimate ≈ {step_ms:.3f} + "
          f"{readback_ms:.3f} ms measured event readback", flush=True)

    located = []  # (onset, Location, t_harvest)
    located_lock = threading.Lock()

    def sink(ev):
        with located_lock:
            located.append((ev[0], ev[1], time.monotonic()))

    # classifier thread: drains newly located hits, classifies them from
    # the device ring in batches, stamps prediction arrival
    cls_results = []  # (onset, zone_pred, t_classified)
    cls_stop = threading.Event()

    def classify_loop():
        done = 0
        while not cls_stop.is_set() or done < len(located):
            with located_lock:
                pending = located[done:]
            if not pending:
                time.sleep(0.005)
                continue
            preds = engine.classify_hits([(o, l) for o, l, _ in pending])
            t_done = time.monotonic()
            # stale rows (audio overwritten before classification — see
            # engine.classify_stale) carry zeroed predictions; skip them
            # rather than score garbage
            for (onset, _, _), p, fr in zip(
                pending, preds, engine.last_classify_fresh
            ):
                if fr:
                    cls_results.append((onset, int(np.argmax(p)), t_done))
            done += len(pending)

    # pipelined dispatch: the audio thread only enqueues (µs, deterministic);
    # the dispatcher thread runs the device step, so tunnel RTT jitter can't
    # surface as audio deadline misses; the harvester drains continuously
    # Micro-batch dispatch on high-RTT transports: the tunnel sustains
    # ~3 ms per single-block dispatch (> the 1.33 ms budget — realtime
    # would be impossible); batching 8 blocks per scanned dispatch
    # amortizes the fixed upload+dispatch cost to ~0.3 ms/block at
    # <=10.7 ms added buffering, leaving the tunnel's serialized command
    # stream >2x headroom for the harvest/classify readbacks riding it
    # (a 60 s soak at batch=4 + 2-RTT harvest cadence slowly starved the
    # stream: 0.7% drops and creeping latency).  Locally attached
    # (floor < 1 ms): keep per-block dispatch for lowest latency.
    # Micro-batch whenever per-dispatch overhead rivals the block budget:
    # through the tunnel that's the RTT (floor_ms); on the CPU backend it's
    # the jit dispatch overhead itself (~1.2 ms p50 measured on a 1-core
    # host, where the "device" also shares the core with these threads).
    # A locally-attached TPU (floor < 1 ms, real accelerator) keeps
    # per-block dispatch for lowest latency.
    batch_blocks = 8 if (floor_ms > 1.0 or args.cpu) else 1
    # depth = stall absorption, not steady-state latency: the queue is
    # normally near-empty (device per-block cost 0.5 ms < 1.33 budget, so
    # backlogs drain), but a transient transport/GIL stall fills it at one
    # block per 1.33 ms — 512 blocks rides out ~680 ms hiccups (a 64-deep
    # queue dropped blocks on a single ~100 ms tunnel stall in a 60 s soak).
    # On --cpu the "device" shares the host's core(s) with every other
    # thread (and, in the suite smoke, with the test runner), so a
    # multi-second scheduler stall is possible and queue latency is not a
    # gated property there — size the queue to absorb any stall.
    engine.start_pipeline(depth=16384 if args.cpu else 512,
                          batch_blocks=batch_blocks)
    if batch_blocks > 1:
        # compile the scanned multi-block program before the stream starts
        # (current_index advances once the dispatcher's jit call returns)
        idx0 = engine.current_index
        for _ in range(batch_blocks):
            engine.process_pipelined(np.zeros((128, 3), np.float32))
        t_wait = time.monotonic() + 600
        while (engine.current_index < idx0 + batch_blocks * 128
               and time.monotonic() < t_wait):
            time.sleep(0.1)
    # Harvest cadence adapts to the transport: locally-attached (sub-ms
    # readback) harvests back-to-back with a tiny GIL-yield; through a
    # tunneled chip each readback serializes against the dispatch stream
    # for a full RTT, so continuous harvesting builds an unbounded device
    # backlog (measured: seconds of hit latency) — pace it at ~4 RTT.
    # (on --cpu a near-spinning harvester eats the single core the
    # "device" computes on — pace it at 20 ms, still far under the bound)
    harvest_period = max(4.0 * floor_ms / 1e3, 0.02 if args.cpu else 0.001)
    engine.start_harvester(sink, period=harvest_period)
    cls_thread = threading.Thread(target=classify_loop, daemon=True)
    cls_thread.start()

    def on_block(block, idx):
        engine.process_pipelined(block)

    ring = NativeRing(SR * 4, 3)
    ex = NativeExecutor(ring, 128, on_block, sample_rate=float(SR))
    ex.start()
    # producer: feed at TRUE realtime pacing against a wall-clock schedule
    # (per-chunk sleep would drift); --fast feeds 4x for smoke runs
    chunk = 1024
    pace = 0.25 if args.fast else 1.0
    t_start = time.monotonic()
    for i in range(0, len(audio) - chunk + 1, chunk):
        ring.write(audio[i : i + chunk])
        target = t_start + (i + chunk) / SR * pace
        delay = target - time.monotonic()
        if delay > 0:
            time.sleep(delay)
    deadline = time.time() + 15
    want = (len(audio) // 128) - 1
    while ex.blocks_processed < want and time.time() < deadline:
        time.sleep(0.05)
    ex.stop()
    engine.stop_pipeline()
    engine.stop_harvester()
    for ev in engine.harvest():
        sink(ev)
    cls_stop.set()
    cls_thread.join(timeout=30)
    with located_lock:
        events = list(located)
    for _, loc, _ in events:
        out_buf = np.zeros((128, 2), np.float32)
        actions.run(out_buf, loc)

    print(f"device ev_count {int(engine.state.ev_count)}, "
          f"harvested {engine._harvested}", flush=True)
    stats = ex.latency_stats()
    budget_ms = engine.budget_ms
    summ = engine.metrics.summary()["latency"]
    disp = summ.get("engine.dispatch", {})
    audio_p99_ms = stats["p99_us"] / 1000
    print(f"blocks: {ex.blocks_processed}, audio-thread deadline misses "
          f"(>{budget_ms:.3f}ms): {ex.deadline_misses}, "
          f"drops: {engine.pipeline_drops}, "
          f"harvest overflows: {engine.harvest_drops}")
    print(f"audio-thread latency: p50 {stats['p50_us']/1000:.3f} ms, "
          f"p99 {audio_p99_ms:.3f} ms, max {stats['max_us']/1000:.3f} ms")
    if disp:
        print(f"device dispatch: p50 {disp['p50_ms']:.3f} ms, "
              f"p99 {disp['p99_ms']:.3f} ms (sustained realtime needs "
              f"mean < {budget_ms:.3f} ms)")

    # -- per-hit latency histogram (the north-star span) --------------------
    lats = np.array([v for v in engine.hit_latencies_ms if np.isfinite(v)])
    local_transport = floor_ms < 1.0
    ok = True
    if len(lats):
        p50, p99 = float(np.percentile(lats, 50)), float(
            np.percentile(lats, 99))
        print(f"hit latency (completing block → located on host): "
              f"p50 {p50:.3f} ms, p99 {p99:.3f} ms over {len(lats)} hits; "
              f"transport readback floor {floor_ms:.3f} ms")
        # classified latency: harvest latency + classify turnaround
        if cls_results and not args.fast:
            n = min(len(cls_results), len(lats), len(events))
            cls_lat = [
                lats[i] + (cls_results[i][2] - events[i][2]) * 1e3
                for i in range(n)
            ]
            c50 = float(np.percentile(cls_lat, 50))
            print(f"hit latency incl. classify: p50 {c50:.3f} ms "
                  f"(one more readback per batch)")
        if not args.fast and not args.cpu:
            # end-to-end sanity bound: no device backlog — every hit's
            # event reaches the host within harvest cadence + readback
            # slack of its completing block (seconds-scale p50 = the
            # dispatch stream is outrunning the device or the readbacks
            # are starving it).  Not gated on --cpu: there the "device"
            # computes on the same host cores as the producer/harvester/
            # classifier threads, so backlog is scheduler contention, not
            # a pipeline property (measured 7-400 ms run to run on an
            # oversubscribed host).
            bound = 8.0 * max(floor_ms, 1.0) + 16.0
            if p50 >= bound:
                print(f"FAIL: hit-latency p50 {p50:.3f} ms >= "
                      f"{bound:.0f} ms (device backlog)")
                ok = False
            if not local_transport:
                print(f"remote transport (readback floor {floor_ms:.1f} "
                      f"ms): end-to-end p50 is transport-bound; the "
                      f"north-star gate uses the measured device "
                      f"per-block cost below")

    # north star (BASELINE.md): <1 ms p50 per-hit localize on the
    # DEPLOYMENT transport (locally-attached chip).  The per-hit span
    # there = the completing block's fused step + one event-struct
    # readback — the readback term is MEASURED above (the event-pack
    # program's device execution, transport-free), not assumed.  Skipped
    # on --cpu (the CPU backend shares host cores with the audio threads
    # — not the deployment target).
    if not args.cpu and not args.fast:
        est = step_ms + readback_ms
        # the full BASELINE claim is localize + CLASSIFY; classify_ms is
        # the whole fixed-shape batch program, so charging it entirely to
        # ONE hit is the worst case (amortized: /capacity per hit)
        est_cls = est + classify_ms
        print(f"north-star estimate (locally-attached): "
              f"{est:.3f} ms per-hit localize "
              f"({step_ms:.3f} step + {readback_ms:.3f} measured "
              f"readback); + classify = {est_cls:.3f} ms worst-case "
              f"lone hit ({est + classify_ms / cls_cap:.3f} ms/hit at "
              f"batch capacity)")
        if est_cls >= 1.0:
            print(f"FAIL: locally-attached per-hit localize+classify "
                  f"{est_cls:.3f} ms >= 1 ms (device per-block cost "
                  f"{step_ms:.3f} ms, classify batch {classify_ms:.3f} "
                  f"ms)")
            ok = False

    # -- localization + classification acceptance ---------------------------
    print(f"located {len(events)} hits of {len(hits)} synthesized")
    errs, zone_hits, zone_total = [], 0, 0
    cls_by_onset = {o: z for o, z, _ in cls_results}
    for (base, x, y, zone) in hits:
        best, best_e = None, np.inf
        for onset, loc, _ in events:
            if abs(onset - base) < 2400:
                e = np.hypot(loc.x - x, loc.y - y)
                if e < best_e:
                    best, best_e = onset, e
        if best is None:
            continue
        errs.append(best_e)
        if best in cls_by_onset:
            zone_total += 1
            zone_hits += cls_by_onset[best] == zone
    for (base, x, y, zone) in hits:
        if not any(abs(onset - base) < 2400 for onset, _, _ in events):
            print(f"  missed hit: base={base} ({base / SR:.2f}s) "
                  f"at ({x:.1f}, {y:.1f})")
    med = float(np.median(errs)) if errs else float("nan")
    zone_acc = zone_hits / max(zone_total, 1)
    print(f"matched {len(errs)}/{len(hits)} hits, median err {med:.2f} cm")
    print(f"zone classifier: {zone_hits}/{zone_total} correct "
          f"({zone_acc:.2f}); {engine.classify_stale} stale "
          f"(ring-overwritten) classification(s)")
    print(f"fx cutoff now {fx.parameters['cutoff'].raw_value:.3f}")

    # accuracy gates sit NEAR measured ability (VERDICT r4 #6): on TPU the
    # soak measures 239/239 located at 0.03 cm median, so gate ≥99% /
    # ≤0.2 cm — a locator regression to even 0.3 cm now fails loudly.  The
    # CPU smoke keeps looser bounds: its "device" shares host cores with
    # the producer/harvester threads, so scheduler stalls can clip bursts
    # mid-window and cost both hits and precision.
    min_frac, med_cm = (0.95, 1.0) if args.cpu else (0.99, 0.2)
    if len(errs) < min_frac * len(hits):
        print(f"FAIL: located {len(errs)}/{len(hits)} < {min_frac:.0%}")
        ok = False
    if not (med <= med_cm):
        print(f"FAIL: median error {med:.2f} cm > {med_cm} cm")
        ok = False
    if zone_total and zone_acc < 0.8:
        print(f"FAIL: zone accuracy {zone_acc:.2f} < 0.8")
        ok = False
    if audio_p99_ms >= budget_ms and not args.cpu:
        # on the CPU backend the "device" computes on the same host cores
        # as the audio thread, so the budget cannot be enforced there
        print(f"FAIL: audio-thread p99 {audio_p99_ms:.3f} ms >= "
              f"budget {budget_ms:.3f} ms")
        ok = False
    if engine.pipeline_drops:
        print(f"FAIL: {engine.pipeline_drops} dropped blocks")
        ok = False
    if engine.harvest_drops:
        print(f"FAIL: {engine.harvest_drops} harvest overflows")
        ok = False
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
