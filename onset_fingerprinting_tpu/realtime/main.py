"""Serve-loop application entry.

Equivalent of the reference's realtime app (reference: realtime/main.py:
20-105): load the saved setup (sensor geometry + location model), build the
fused engine, arm a whole-surface ParameterChange mapping phi → an FX
parameter, and run — against a live PortAudio stream when sounddevice is
available, otherwise against a WAV file streamed through the native C++
executor (the hermetic TPU-host path).

Run:
    python -m onset_fingerprinting_tpu.realtime.main <setup_dir> [--wav f.wav]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

from onset_fingerprinting_tpu.core.config import DetectorConfig
from onset_fingerprinting_tpu.locate import Multilaterate3D
from onset_fingerprinting_tpu.realtime.actions import (
    Actions,
    BackCaptureTrigger,
    Bounds,
    FxParams,
    ParameterChange,
    ParameterMapper,
    RecordTrigger,
)
from onset_fingerprinting_tpu.realtime.engine import RealtimeEngine
from onset_fingerprinting_tpu.realtime.setup_io import load_setup


def build_engine(
    setup_dir: str | Path,
    sr: int = 96000,
    blocksize: int = 128,
    fx=None,
    rt_cfg=None,
) -> RealtimeEngine:
    """Wire setup → locator → engine → actions (realtime/main.py:66-98)."""
    conf, model = load_setup(Path(setup_dir))
    model_input = conf.get("model_input", "arrival")
    locator_kw = {}
    if conf.get("drum_diameter"):  # persisted head size (cm): legality
        locator_kw["drum_diameter"] = float(conf["drum_diameter"])
    if conf.get("feasibility_tols"):
        # completion-feasibility cascade (cm tiers): the reference's
        # single 1 cm tier grid-aliases near sensors and drops ~1% of
        # genuine strikes (_LagMapsMixin._feasible_cell); setups can opt
        # into e.g. [1, 2] to recover them (default: reference parity)
        locator_kw["feasibility_tols"] = tuple(
            float(t) for t in conf["feasibility_tols"]
        )
    locator = Multilaterate3D(
        sensor_locations=conf["sensor_locations"],
        sr=sr,
        medium=conf["medium"],
        c=conf["c"],
        model=model,
        model_input=model_input,
        **locator_kw,
    )
    n_channels = len(conf["sensor_locations"])
    cfg = DetectorConfig(
        n_channels=n_channels,
        block_size=blocksize,
        hipass_freq=0.0,
        fast_attack=0.3,
        fast_release=800.0,
        slow_attack=8000.0,
        slow_release=8000.0,
        on_threshold=0.45,
        off_threshold=0.45,
        cooldown=1323,
        sr=sr,
    )
    if fx is None:
        fx = FxParams(["svf_cutoff_hz"])
    actions = Actions()
    b = Bounds(phi=[0, 360])
    pm = ParameterMapper.from_bounds_fx(b, fx, "phi", ["svf_cutoff_hz"])
    actions.append(ParameterChange([b], fx, [pm]))
    # the saved FCNN runs *inside* the fused device step (learned
    # trilateration bypass) — no per-hit host round-trip
    engine = RealtimeEngine(
        cfg, locator, actions=actions, fx=[fx], model=model,
        model_input=model_input,
    )
    # analysis side-channel (quantize/BPM/record; the reference's
    # AnalysisOnDemand process, realtime/main.py:72-76)
    engine.attach_analysis(rt_cfg)
    return engine


def drain_plans(engine: RealtimeEngine, capture_dir=None) -> bool:
    """Handle pending plan-queue triggers — the reference's plan_callback
    thread (realtime/main.py:20-41), as a synchronous drain the serve loop
    calls between blocks (nothing to contend with the audio thread).

    RecordTrigger toggles recording (start quantizes the marker to a strong
    onset; stop extrapolates the end to whole beats and records BPM);
    BackCaptureTrigger dumps the audio ring to ``capture_dir``.  Triggers
    with ``at_sample`` in the future are deferred.  Returns False once a
    quit sentinel (``None``/bool) was seen.
    """
    import queue as _queue

    alive = True
    deferred = []
    while True:
        try:
            trig = engine.actions.plans.get_nowait()
        except _queue.Empty:
            break
        if trig is None or isinstance(trig, bool):
            alive = False
            continue
        at = getattr(trig, "at_sample", None)
        if at is not None and engine.current_index < at:
            deferred.append(trig)
            continue
        if isinstance(trig, RecordTrigger):
            if not engine.recording_active:
                start = engine.start_recording()
                print(f"recording started @ sample {start}")
            else:
                start, end, bpm = engine.stop_recording()
                print(
                    f"recording [{start}:{end}] "
                    f"({(end - start) / engine.cfg.sr:.2f} s) bpm={bpm:.1f}"
                )
        elif isinstance(trig, BackCaptureTrigger) and capture_dir is not None:
            out = engine.analysis.save_audio_rotating(capture_dir)
            print(f"captured ring -> {out}")
    for trig in deferred:
        engine.actions.plans.put_nowait(trig)
    return alive


def run_wav(
    engine: RealtimeEngine, wav: str | Path, capture_dir=None
) -> None:
    """Stream a WAV through the native executor at audio rate.

    Async serve shape: the audio thread runs the fused device program with
    NO host readback (``process_nosync``); located hits accumulate in the
    device-side event queue and are drained by the producer thread
    (``harvest`` — one packed transfer), which dispatches actions.  On a
    tunneled TPU this keeps the block step ~1.2 ms vs ~30 ms for a
    sync readback per block.

    The producer thread also paces the analysis side-channel
    (``analysis.poll()`` — per-hop STFT/onset strength/tempogram) and drains
    the plan queue (record/quantize/BPM/capture triggers,
    reference realtime/main.py:20-41,72-104).
    """
    from onset_fingerprinting_tpu.core.audio_io import read_wav
    from onset_fingerprinting_tpu.runtime_native import (
        NativeExecutor,
        NativeRing,
    )

    audio, sr = read_wav(wav)
    if audio.ndim == 1:
        audio = audio[:, None]
    c = engine.cfg.n_channels
    bsz = engine.cfg.block_size
    audio = audio[:, :c]
    # force compile before the stream starts
    engine.process_nosync(np.zeros((bsz, c), np.float32))
    engine.harvest()
    # pipelined dispatch: audio thread enqueues only; the dispatcher thread
    # runs the device step so tunnel RTT jitter can't cause deadline misses
    engine.start_pipeline(depth=32)

    def on_block(block, idx):
        engine.process_pipelined(block)

    out_buf = np.zeros((bsz, engine.monitor_channels), np.float32)

    def drain():
        for onset, loc in engine.harvest():
            print(f"hit @ sample {onset}: {loc}")
            engine.actions.run(out_buf, loc)
        if engine.analysis is not None:
            engine.analysis.poll()
        drain_plans(engine, capture_dir)

    ring = NativeRing(sr * 4, c)
    ex = NativeExecutor(ring, bsz, on_block, sample_rate=float(sr))
    ex.start()
    chunk = 4096
    for i in range(0, len(audio) - chunk + 1, chunk):
        ring.write(audio[i : i + chunk])
        time.sleep(chunk / sr)
        drain()
    while ring.readable >= bsz:
        time.sleep(0.05)
        drain()
    ex.stop()
    engine.stop_pipeline()
    drain()
    stats = ex.latency_stats()
    print(
        f"{ex.blocks_processed} blocks, {ex.deadline_misses} deadline misses, "
        f"{engine.pipeline_drops} drops, "
        f"p50 {stats['p50_us']/1000:.3f} ms p99 {stats['p99_us']/1000:.3f} ms"
    )


def main():  # pragma: no cover - CLI
    ap = argparse.ArgumentParser()
    ap.add_argument("setup_dir")
    ap.add_argument("--wav", default=None, help="stream a wav instead of live audio")
    ap.add_argument("--sr", type=int, default=96000)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from onset_fingerprinting_tpu.core.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()  # warm serve restarts skip Mosaic compiles
    engine = build_engine(args.setup_dir, sr=args.sr)
    if args.wav:
        run_wav(engine, args.wav)
        return
    try:
        stream = engine.stream()
    except RuntimeError as e:
        print(f"{e}; use --wav for file streaming", file=sys.stderr)
        sys.exit(2)
    with stream:
        print("serving — ctrl-c to stop")
        from onset_fingerprinting_tpu.realtime.analysis import AnalysisWorker

        worker = (
            AnalysisWorker(engine.analysis).start() if engine.analysis else None
        )
        out_buf = np.zeros(
            (engine.cfg.block_size, engine.monitor_channels), np.float32
        )
        try:
            # plan drain loop (the reference's plan_callback thread)
            while drain_plans(engine):
                for onset, loc in engine.harvest():
                    engine.actions.run(out_buf, loc)
                time.sleep(0.05)
        finally:
            if worker is not None:
                worker.stop()


if __name__ == "__main__":  # pragma: no cover
    main()
