"""Benchmark: multichannel onset detect → fingerprint throughput on TPU.

Headline metric (north star, BASELINE.md): ×-realtime multichannel
detect-AND-fingerprint throughput per chip — target ≥1000× realtime.  The
workload batches many 4-channel 96 kHz streams as one wide-channel fused
detector (Pallas kernel; XLA-scan fallback), then fingerprints every
detected onset: gathers the onset windows on device and runs the flagship
CCCNN (the reference's LCCCNN architecture, train.py:79-90 /
model.py:443-629) to map each window to hit coordinates.  Steady-state
wall-clock per second of audio, median of N iterations with dispersion.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Diagnostics (per-stage breakdown, dispersion, optional width sweep) go to
stderr.

Env knobs:
    OFPTPU_BENCH_STREAMS  number of 4-ch streams (default 8192 → C=32768)
    OFPTPU_BENCH_CHUNKS   carried-state time chunks per second (default 3)
    OFPTPU_BENCH_SWEEP    "1" → also sweep C=1024..16384 (stderr table)
    OFPTPU_BENCH_COMPACT  "0" → padded per-stream hit slots instead of the
                          globally compacted hit list (default "1")
    OFPTPU_BENCH_CONV     CCCNN conv-stack impl: "pallas" (fused whole-stack
                          kernel) or "conv" (XLA conv).  Unset → pallas when
                          the cache's warm sentinel exists, else conv (the
                          cold-cache guard: first-ever Mosaic compile of the
                          fused stack is 350-540 s) FOLLOWED by an in-process
                          self-warm: the conv-fallback measurement is banked
                          as a safety artifact, the fused stack is compiled
                          once (affordable once per cache lifetime), and the
                          headline is re-measured fused — so a cold cache
                          delays the result but never degrades it
    OFPTPU_BENCH_SELF_WARM "0" → keep the conv fallback as the headline on a
                          cold cache instead of paying the one-time fused
                          compile in-process (the r4 behavior)
    OFPTPU_BENCH_ANCHORED "0" → legacy block-aligned fingerprint windows
                          (default "1": sample-anchored, onset at index PRE)
    OFPTPU_COMPILE_CACHE  persistent compile cache dir (default .jax_cache)
    OFPTPU_CLOCK_HZ / OFPTPU_PEAK_FLOPS  roofline constants (v5e defaults)
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

SR = 96000
CHANNELS_PER_STREAM = 4
WINDOW = 256  # reference flagship window (train.py:27 w=256)
PRE = 64  # samples before the onset in the fingerprint window
MAX_HITS = 16  # fixed per-stream hit capacity per second of audio

# Injected hit grid — the SINGLE source of truth shared by make_audio, the
# capacity sizing, the correctness gate, and examples/fingerprint_anatomy.py.
# Onsets at HIT_FIRST + k*HIT_PERIOD; a burst is injected only if it fully
# fits (onset + BURST_LEN + BURST_MARGIN <= t).
HIT_FIRST = 5000
HIT_PERIOD = 9600  # one hit every 100 ms @ 96 kHz
BURST_LEN = 600
BURST_MARGIN = 100


def n_injected(t: int) -> int:
    """Number of injected onsets per stream in ``t`` samples."""
    return max((t - HIT_FIRST - BURST_LEN - BURST_MARGIN) // HIT_PERIOD + 1, 0)


# -- roofline constants (v5e; env-overridable for other parts) ---------------
# TensorCore clock used by the cycles/sample accounting (the same 940 MHz
# the pallas_detector.py speed-of-light analysis assumes).
CLOCK_HZ = float(os.environ.get("OFPTPU_CLOCK_HZ", 940e6))
# bf16 MXU peak per chip (v5e public spec: 197 TFLOPs bf16).
PEAK_BF16_FLOPS = float(os.environ.get("OFPTPU_PEAK_FLOPS", 197e12))
# Algorithmic floor of the fused detector: ~176 vector-op issues per sample
# row per 32-lane-tile call (the issue count of the three recurrence loops +
# hoisted transcendental stages — derivation in ops/pallas_detector.py's
# speed-of-light note).  pct_sol = floor / measured.
DETECT_ALGO_ISSUES = 176.0
# Lane width of one detector kernel unit: 32 lane tiles x 128 lanes.
DETECT_TILE_CHANNELS = 32 * 128


def flagship_flops_per_window(
    window: int = WINDOW,
    cps: int = CHANNELS_PER_STREAM,
    feats: int = 5,
    kernels: tuple = (1, 33, 64, 15, 15, 15, 1),
) -> float:
    """Algorithmic FLOPs of one fingerprint window through the flagship
    CCCNN (conv stack + DFT self-CC + dense head + the gather's lane-select
    matmul) — the useful work, independent of conv_impl/precision passes.

    conv ('same' padding, per channel): 2*W*sum_l(k_l * in_l * out_l);
    DFT self-CC (ops/xcorr.py::batch_self_correlate_dft): two forward
    matmuls [K, W] @ [W, W] (cos + sin) per channel, inverse after the
    K-sum [1, W] @ [W, 2W-1] per channel; dense head 2*(cps*(2W-1)+cps)*2;
    gather select: 2*8*128*(W+8).
    """
    conv = 2.0 * window * sum(
        k * (1 if i == 0 else feats) * feats for i, k in enumerate(kernels)
    ) * cps
    dft_fwd = 2 * (2.0 * feats * window * window) * cps
    dft_inv = 2.0 * window * (2 * window - 1) * cps
    head = 2.0 * (cps * (2 * window - 1) + cps) * 2
    gather = 2.0 * 8 * 128 * (window + 8)
    return conv + dft_fwd + dft_inv + head + gather


class HitCapacityError(RuntimeError):
    """The compacted hit list truncated real hits — a capacity-sizing bug.

    Deliberately NOT caught by main()'s HBM/tunnel safety net: falling back
    to a smaller operating point would convert a designed hard-fail
    ("counted and failed on, never silent") into a green run."""


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def make_audio(t: int, c: int, seed: int = 0):
    """Synthesize the bench workload ON DEVICE (a [1 s, C=8192] f32 array
    pushed through the axon tunnel takes minutes; jax.random on chip takes
    milliseconds).  Hits every HIT_PERIOD samples so detection +
    fingerprinting do real work.

    Jitted with static (t, c): run eagerly, the RNG draw and the burst add
    each materialize a full [t, c] HBM buffer (2x peak) — that, not
    detection, was the C=65536 wall (VERDICT r3 #10).  Fused, synthesis
    peaks at ~one output buffer and the width probe moves to the real
    detector/fingerprint ceiling."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=(1, 2))
    def synth(key, t, c):
        x = jax.random.normal(key, (t, c), jnp.float32) * 1e-3
        tt = jnp.arange(BURST_LEN)
        burst = (
            jnp.sin(2 * jnp.pi * 5000 / SR * tt) * jnp.exp(-tt / 150) * 0.5
        )
        pattern = jnp.concatenate([burst, jnp.zeros(HIT_PERIOD - BURST_LEN)])
        idx = jnp.arange(t) - HIT_FIRST
        phase = jnp.mod(idx, HIT_PERIOD)
        # bursts at HIT_FIRST + k*HIT_PERIOD for k in [0, n_injected(t));
        # idx - phase is the burst's start relative to HIT_FIRST
        fit = t - (HIT_FIRST + BURST_LEN + BURST_MARGIN)
        profile = jnp.where(
            (idx >= 0) & (idx - phase <= fit), pattern[phase], 0.0
        )
        return x + profile[:, None]

    return synth(jax.random.PRNGKey(seed), t, c)


def _conv_warm_sentinel() -> Path:
    """Marker recording that conv_stack_fused has compiled successfully
    into THIS persistent cache at the serving configuration.  The first-ever
    Mosaic compile of the fused conv stack is 350-540 s (STATUS r3); on a
    cold cache the bench must not stall 9 minutes before its first
    measurement, so absence of this marker (and of an explicit
    OFPTPU_BENCH_CONV) falls the process back to conv_impl='conv'."""
    cache = Path(os.environ.get("OFPTPU_COMPILE_CACHE", ".jax_cache"))
    sig = f"w{WINDOW}_cps{CHANNELS_PER_STREAM}_k1-33-64-15-15-15-1_f5"
    return cache / f"ofptpu_conv_stack_warm_{sig}"


_conv_impl_choice: str | None = None


def pick_conv_impl() -> str:
    """Serving conv-stack implementation with the cold-cache guard.

    Explicit ``OFPTPU_BENCH_CONV`` always wins.  Otherwise 'pallas' only
    when the warm sentinel says this cache has already compiled the fused
    stack; a cold cache gets 'conv' (XLA conv, ~3x slower fingerprint
    stage but compiles in seconds) with a warning telling the operator how
    to warm the kernel once.  Memoized per process (one decision, one
    warning)."""
    global _conv_impl_choice
    if _conv_impl_choice is not None:
        return _conv_impl_choice
    env = os.environ.get("OFPTPU_BENCH_CONV")
    if env:
        _conv_impl_choice = env
    elif _conv_warm_sentinel().exists():
        _conv_impl_choice = "pallas"
    else:
        log(
            "cold compile cache: the fused Pallas conv stack's first-ever "
            "Mosaic compile costs 350-540 s — using conv_impl='conv' for "
            "this process so the bench starts measuring in seconds.  Warm "
            "the kernel once with OFPTPU_BENCH_CONV=pallas to restore the "
            "fused-stack headline on subsequent runs."
        )
        _conv_impl_choice = "conv"
    return _conv_impl_choice


def mark_conv_stack_warm() -> None:
    """Record a successful fused-conv-stack compile in the cache dir."""
    try:
        s = _conv_warm_sentinel()
        s.parent.mkdir(parents=True, exist_ok=True)
        s.touch()
    except OSError:
        pass


def make_fingerprinter(n_streams: int, block_size: int,
                       max_hits: int = MAX_HITS,
                       global_capacity: int | None = None,
                       conv_impl: str | None = None):
    """Jitted detect-output → coordinates stage.

    Converts the detector's dense per-block events into onset sample
    indices, gathers [4, WINDOW] onset windows from the raw audio, and
    runs the flagship CCCNN over all of them in one batch (bf16 convs on
    the MXU, DFT self-CC, dense head) — the reference's
    detect→fingerprint serving path (model.py:443-629).

    With ``global_capacity`` set, the hit list is COMPACTED across all
    streams (ops/windows.py::compact_hits) so gather DMA and model batch
    scale with actual hit count instead of the per-stream worst case
    ``n_streams * max_hits`` — measured 1.5x less fingerprint work at the
    headline operating point (49152 padded slots → 32768 for 24576 real
    hits/chunk).  ``None`` keeps the padded per-stream formulation.
    """
    import jax
    import jax.numpy as jnp

    from onset_fingerprinting_tpu.models.cccnn import CCCNN
    from onset_fingerprinting_tpu.ops.windows import (
        compact_hit_list,
        gather_block_windows,
        gather_hit_windows,
        top_hit_blocks,
    )

    cps = CHANNELS_PER_STREAM
    model = CCCNN(
        output_size=2,
        channels=cps,
        layer_sizes=(5,) * 7,
        kernel_sizes=(1, 33, 64, 15, 15, 15, 1),
        dropout_rate=0.0,
        dtype=jnp.bfloat16,
        # DFT-as-matmul self-CC: XLA's TPU FFT costs ~150 ms at this batch
        # (655k short signals); the MXU DFT is ~1e-4-identical and ~30x
        # faster (ops/xcorr.py::batch_self_correlate_dft)
        cc_impl="dft",
        # the capability-proven serving head (models/cccnn.py::cc_norm)
        cc_norm=True,
        # fused whole-stack Pallas conv (ops/pallas_conv.py): measured
        # 23.3 -> ~7 ms at the serving batch vs XLA's few-feature conv;
        # pick_conv_impl falls back to XLA conv on a cold compile cache
        # (main() then self-warms the kernel and re-measures fused)
        conv_impl=conv_impl or pick_conv_impl(),
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cps, WINDOW), jnp.float32)
    )

    # Sample-anchored serving windows (default): the onset sits at index
    # PRE of every window EXACTLY — top_hit_blocks folds the detector's
    # within-block deltas into the starts and the gather applies the 0..7
    # residual in-kernel behind the DMA (ops/windows.py anchored contract;
    # the reference's extractors anchor exactly, data.py:55-120).  The old
    # block-aligned mode (onset at PRE+delta, < one block of jitter) costs
    # ~6x accuracy unmitigated (examples/serving_window_accuracy.py);
    # OFPTPU_BENCH_ANCHORED=0 reverts to it for comparison.
    anchored = os.environ.get("OFPTPU_BENCH_ANCHORED", "1") == "1"

    @jax.jit
    def fingerprint(params, x, on, deltas):
        d = deltas if anchored else None
        if global_capacity is not None:
            st_pad, v_pad = top_hit_blocks(
                on, block_size, n_streams, max_hits, d
            )
            starts, sids, valid, dropped = compact_hit_list(
                st_pad, v_pad, global_capacity
            )
            # DEFAULT precision (one MXU pass) in the gather's lane-select
            # matmul: the model casts windows to bf16 anyway, so the
            # HIGHEST-precision (3-pass) bit-exactness buys nothing here
            windows = gather_hit_windows(
                x, starts, sids, cps, WINDOW, pre=PRE,
                precision=jax.lax.Precision.DEFAULT,
                anchored=anchored,
            )  # [G, cps, W]
            preds = model.apply(params, windows)
            preds = jnp.where(valid[:, None], preds, 0.0)
            return preds, jnp.sum(valid), dropped
        starts, valid = top_hit_blocks(
            on, block_size, n_streams, max_hits, d
        )
        windows = gather_block_windows(
            x, starts, cps, WINDOW, pre=PRE,
            precision=jax.lax.Precision.DEFAULT,
            anchored=anchored,
        )
        preds = model.apply(
            params, windows.reshape(n_streams * max_hits, cps, WINDOW)
        )
        preds = preds.reshape(n_streams, max_hits, -1)
        preds = jnp.where(valid[..., None], preds, 0.0)
        return preds, jnp.sum(valid), jnp.int32(0)

    return params, fingerprint


def bench_width(n_streams: int, n_iter: int = 10, chunks: int = 1,
                conv_impl: str | None = None):
    """Measure detect→fingerprint at one channel width.  Returns a dict of
    timings (seconds per 1 s of audio per stage, median over n_iter).

    ``chunks > 1`` streams each second of audio through the pipeline in
    ``chunks`` sequential dispatches of ``SR/chunks`` samples (carried-state
    chunking, detect_offline_chunked's scheme) — this bounds peak HBM and
    lifts the C=16384 1-second allocation ceiling; all ``chunks`` dispatches
    are timed together (they queue asynchronously, one sync at the end)."""
    import jax
    import jax.numpy as jnp

    from onset_fingerprinting_tpu.core.config import DetectorConfig

    c = n_streams * CHANNELS_PER_STREAM
    t = SR // chunks
    assert t % 128 == 0, f"SR/chunks={t} must be a block multiple"
    cfg = DetectorConfig(
        n_channels=c, block_size=128, hipass_freq=2000.0, sr=SR,
        # independent streams must not couple through the reference's
        # cross-channel off-gate quirk
        coupled_off_gate=False,
    )

    def build_detector(which: str):
        if which == "pallas":
            from onset_fingerprinting_tpu.ops.pallas_detector import (
                make_pallas_detector,
            )

            return make_pallas_detector(cfg, emit_rel=False)
        from onset_fingerprinting_tpu.detect.amplitude import (
            detect_offline,
            detector_init,
        )

        static, params_d, state = detector_init(cfg)

        def run(st, xd):
            st, (on, d, _) = detect_offline(static, params_d, st, xd)
            return st, (on, d, None)

        return static, params_d, state, run

    log(f"[{time.strftime('%H:%M:%S')}] building detector C={c}")
    path = "pallas"
    try:
        static, params_d, state, run = build_detector(path)
    except Exception as e:  # pragma: no cover - kernel toolchain fallback
        log(f"pallas kernel unavailable ({type(e).__name__}: {e}); "
            "falling back to XLA scan")
        path = "xla_scan"
        static, params_d, state, run = build_detector(path)

    from onset_fingerprinting_tpu.detect.amplitude import warmup_minmax
    from onset_fingerprinting_tpu.ops.windows import top_hit_blocks

    log(f"[{time.strftime('%H:%M:%S')}] building fingerprinter")
    # per-chunk hit capacity scales with chunk duration (same 1.6x headroom
    # over the injected 10 hits/s) — constant capacity would make chunked
    # mode fingerprint `chunks`x more padded windows per second
    max_hits = max(-(-MAX_HITS // chunks), 4)
    # global compacted hit budget: 1.33x headroom over the injected rate,
    # rounded up to a lane multiple (overflow is counted and failed on)
    exp_per_stream = n_injected(SR // chunks)
    global_capacity = -(-(n_streams * exp_per_stream * 4 // 3) // 128) * 128
    if os.environ.get("OFPTPU_BENCH_COMPACT", "1") != "1":
        global_capacity = None
    conv_impl = conv_impl or pick_conv_impl()
    fp_params, fingerprint = make_fingerprinter(
        n_streams, cfg.block_size, max_hits, global_capacity, conv_impl
    )
    if global_capacity is not None:
        log(
            f"compacted hit list: global capacity {global_capacity} vs "
            f"{n_streams * max_hits} padded per-stream slots"
        )
    log(f"[{time.strftime('%H:%M:%S')}] synthesizing audio on device")
    xd = make_audio(t, c)  # synthesized on device
    log(f"[{time.strftime('%H:%M:%S')}] warming detector state")
    # warm the adaptive min/max tracker on the pre-burst lead-in, like the
    # reference's offline driver (detection.py:70) — cold thresholds fire
    # spuriously on ~15% of channels in the first blocks
    state = warmup_minmax(static, params_d, state, xd[: 38 * 128])

    @jax.jit
    def correctness(on):
        """Detection precision/recall against the injected hit grid
        (the reference's harness checks correctness AND speed together,
        c/test.py:24-46).  Injected onsets: HIT_FIRST + HIT_PERIOD*k.
        A detected hit block is a true positive iff it lies within ``tol``
        of the grid (same-burst adjacent-block fires count as duplicates,
        not spurious); recall counts DISTINCT injected onsets matched."""
        period, first, tol = HIT_PERIOD, HIT_FIRST, 512
        n_exp = n_injected(t)
        starts, valid = top_hit_blocks(
            on, cfg.block_size, n_streams, max_hits
        )
        rel = jnp.mod(starts - first, period)
        dist = jnp.minimum(rel, period - rel)
        tp = valid & (dist <= tol)
        spurious = valid & ~tp
        k_idx = jnp.round((starts - first) / period).astype(jnp.int32)
        k_ok = tp & (k_idx >= 0) & (k_idx < n_exp)
        onehot = jax.nn.one_hot(
            jnp.where(k_ok, k_idx, -1), n_exp, dtype=jnp.int32
        )  # [S, K, n_exp]; -1 rows are all-zero
        matched = jnp.sum(jnp.any(onehot > 0, axis=1))
        return jnp.sum(tp), jnp.sum(spurious), matched

    # sync each stage by pulling a scalar reduction — through the axon
    # tunnel block_until_ready alone under-reports device time
    t0 = time.perf_counter()
    try:
        _, (on, d, _) = run(state, xd)
        _ = int(jnp.sum(on)) + int(jnp.sum(d))
    except Exception as e:  # pragma: no cover - lowering-time fallback
        # Pallas failures can surface at first compile/run, not at build
        # (e.g. a CPU backend rejects non-interpret pallas_call at
        # lowering) — fall back to the XLA scan path here too
        if path != "pallas":
            raise
        log(f"pallas kernel failed at compile/run ({type(e).__name__}: "
            f"{e}); falling back to XLA scan")
        path = "xla_scan"
        static, params_d, state, run = build_detector(path)
        state = warmup_minmax(static, params_d, state, xd[: 38 * 128])
        t0 = time.perf_counter()
        _, (on, d, _) = run(state, xd)
        _ = int(jnp.sum(on)) + int(jnp.sum(d))
    t_detect_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    preds, n_hits, n_dropped = fingerprint(fp_params, xd, on, d)
    _ = float(jnp.sum(preds))
    t_fp_compile = time.perf_counter() - t0
    if conv_impl == "pallas":
        # the fused stack compiled into this cache — subsequent cold-cache
        # guard decisions can safely pick it
        mark_conv_stack_warm()
    if int(n_dropped) > 0:
        # the compacted budget must never truncate the workload silently
        raise HitCapacityError(
            f"compacted hit list dropped {int(n_dropped)} hits "
            f"(capacity {global_capacity})"
        )
    n_tp, n_spur, n_matched = (int(v) for v in correctness(on))
    n_expected = n_streams * n_injected(t)
    precision = n_tp / max(n_tp + n_spur, 1)
    recall = n_matched / n_expected
    log(
        f"C={c}: compile+first detect {t_detect_compile:.1f}s, "
        f"fingerprint {t_fp_compile:.1f}s; "
        f"hits fingerprinted: {int(n_hits)}/{n_expected}"
    )
    log(
        f"C={c} correctness: {n_matched}/{n_expected} injected onsets "
        f"matched (recall {recall:.4f}), precision {precision:.4f} "
        f"({n_spur} spurious), {n_tp - n_matched} same-burst duplicate "
        f"block-fires (counted once for recall)"
    )

    # per-stage breakdown (each stage pays one tunnel-dispatch sync);
    # with chunking, one iteration = `chunks` dispatches = 1 s of audio.
    # Detector state is CARRIED chunk-to-chunk (and across iterations —
    # endless-stream steady state): chunk j+1 consumes chunk j's state,
    # the real streaming dependency chain, not `chunks` independent
    # re-detections of the first chunk.
    det_times, fp_times = [], []
    st = state
    for _ in range(n_iter):
        t0 = time.perf_counter()
        for _j in range(chunks):
            st, (on, d, _) = run(st, xd)
        _ = int(jnp.sum(on)) + int(jnp.sum(d))
        t1 = time.perf_counter()
        for _j in range(chunks):
            preds, n_hits, _dropped = fingerprint(fp_params, xd, on, d)
        _ = float(jnp.sum(preds))
        t2 = time.perf_counter()
        det_times.append(t1 - t0)
        fp_times.append(t2 - t1)
    # re-gate correctness at carried-state steady state: the warm-up gate
    # above saw the first chunk only; this sees events detected AFTER many
    # carried chunks (adaptive thresholds at their fixed point)
    n_tp2, n_spur2, n_matched2 = (int(v) for v in correctness(on))
    if (n_matched2, n_spur2) != (n_matched, n_spur):
        log(
            f"C={c} carried-state correctness: matched {n_matched2} "
            f"(warm-up {n_matched}), spurious {n_spur2} ({n_spur})"
        )
    # the reported gate is the steady-state one
    n_tp, n_spur, n_matched = n_tp2, n_spur2, n_matched2
    precision = n_tp / max(n_tp + n_spur, 1)
    recall = n_matched / n_expected

    # headline: ONE fused dispatch for the whole detect→fingerprint
    # pipeline (the serving shape — a single device program per second of
    # audio, one host sync)
    @jax.jit
    def pipeline(state, xd):
        state, (on, d, _) = run(state, xd)
        preds, n_hits, _dropped = fingerprint(fp_params, xd, on, d)
        return state, jnp.sum(preds), n_hits

    tot_times = []
    stp = state
    stp, s, n_hits = pipeline(stp, xd)  # compile
    _ = float(s)
    for _ in range(n_iter):
        t0 = time.perf_counter()
        for _j in range(chunks):
            # carried state: each chunk's detection consumes the previous
            # chunk's detector state (true streaming), still queued async
            stp, s, n_hits = pipeline(stp, xd)
        _ = float(s)  # chunk dispatches queue async; one sync per second
        tot_times.append(time.perf_counter() - t0)

    # dispatch+sync floor: a no-op jit call through the same transport —
    # on a tunneled dev chip this is ~28 ms and is INCLUDED in the headline
    # (a locally-attached chip would not pay it)
    noop = jax.jit(lambda v: v + 1.0)
    _ = float(noop(jnp.float32(0.0)))
    floor_times = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        _ = float(noop(jnp.float32(0.0)))
        floor_times.append(time.perf_counter() - t0)
    floor_ms = 1e3 * float(np.median(floor_times))

    # -- roofline evidence (VERDICT r3 #6: computed, machine-readable) ------
    # detector: cycles per sample row per 32-lane-tile kernel unit, against
    # the ~176-issue algorithmic floor of the kernel's loop structure
    det_dev_ms = max(1e3 * float(np.median(det_times)) - floor_ms, 1e-6)
    tile_units = c / DETECT_TILE_CHANNELS
    detect_cycles_per_sample = (
        det_dev_ms * 1e-3 * CLOCK_HZ / SR / max(tile_units, 1e-9)
    )
    detect_pct_sol = 100.0 * DETECT_ALGO_ISSUES / detect_cycles_per_sample
    # fingerprint: MXU utilization = algorithmic model FLOPs actually
    # dispatched (every gathered window computes, valid or padded) over the
    # stage's device time x bf16 peak
    fp_dev_ms = max(1e3 * float(np.median(fp_times)) - floor_ms, 1e-6)
    windows_per_s = (
        global_capacity if global_capacity is not None
        else n_streams * max_hits
    ) * chunks
    fp_flops = windows_per_s * flagship_flops_per_window()
    fingerprint_mxu_util = fp_flops / (fp_dev_ms * 1e-3) / PEAK_BF16_FLOPS
    log(
        f"roofline: detect {detect_cycles_per_sample:.0f} cyc/sample/"
        f"32-tile-unit ({detect_pct_sol:.0f}% of the {DETECT_ALGO_ISSUES:.0f}"
        f"-issue floor); fingerprint {fp_flops / 1e12:.2f} TFLOP/s-audio "
        f"over {fp_dev_ms:.1f} ms -> {100 * fingerprint_mxu_util:.1f}% MXU"
    )
    return {
        "path": path,
        "conv_impl": conv_impl,
        "n_streams": n_streams,
        "c": c,
        "chunks": chunks,
        "detect_ms": 1e3 * float(np.median(det_times)),
        "fingerprint_ms": 1e3 * float(np.median(fp_times)),
        "total_ms_median": 1e3 * float(np.median(tot_times)),
        "total_ms_min": 1e3 * float(np.min(tot_times)),
        "total_ms_max": 1e3 * float(np.max(tot_times)),
        "total_ms_std": 1e3 * float(np.std(tot_times)),
        "dispatch_floor_ms": floor_ms,
        "n_hits": int(n_hits),
        "n_expected": n_expected,
        "precision": precision,
        "recall": recall,
        "n_spurious": n_spur,
        "n_duplicates": n_tp - n_matched,
        "detect_cycles_per_sample": round(detect_cycles_per_sample, 1),
        "detect_pct_sol": round(detect_pct_sol, 1),
        "fingerprint_mxu_util": round(fingerprint_mxu_util, 4),
    }


def main() -> int:
    # refuse to hang on a wedged accelerator transport: probe backend init
    # in throwaway subprocesses under a hard timeout, retrying up to the
    # wait budget (core/backend_probe.py — shared with __graft_entry__.py)
    from onset_fingerprinting_tpu.core.backend_probe import (
        await_healthy_backend,
    )

    probe_wait = float(os.environ.get("OFPTPU_BENCH_PROBE_WAIT", "1800"))
    if probe_wait > 0 and not await_healthy_backend(probe_wait, log=log):
        log(
            "FATAL: no healthy jax backend within "
            f"{probe_wait:.0f}s — refusing to hang; rerun when the "
            "accelerator transport recovers (OFPTPU_BENCH_PROBE_WAIT=0 "
            "skips this guard)"
        )
        return 2

    import jax

    from onset_fingerprinting_tpu.core.compile_cache import (
        enable_compilation_cache,
    )

    cache_dir = enable_compilation_cache()
    dev = jax.devices()[0]
    log(f"device: {dev}; compile cache: {cache_dir}")

    # Headline operating point: 8192 4-ch streams = C=32768 detector
    # channels, streamed as 3 carried-state time chunks per second (bounds
    # peak HBM at 1/3 s; one host sync per second of audio).  Round-3 sweep
    # (v5e, combined detect→fingerprint, correctness-gated): C=8192
    # (chunks=1) → 19476x, C=16384 (chunks=2) → 22444x, C=32768 (chunks=3)
    # → 23080x.  Round-4 probe (jitted synthesis): C=65536 (chunks=6)
    # runs clean — 35565x combined / 52953x detect-only at recall 1.0 —
    # but fingerprint work scales with real hits, so combined gains
    # flatten past C=32768 (floor amortization ~done); that stays the
    # default.
    n_streams = int(os.environ.get("OFPTPU_BENCH_STREAMS", "8192"))
    chunks = int(os.environ.get("OFPTPU_BENCH_CHUNKS", "3"))

    if os.environ.get("OFPTPU_BENCH_SWEEP") == "1":
        # C=16384 (4096 streams) exceeds HBM as ONE 1-second dispatch;
        # carried-state time-chunking (chunks=2) bounds peak HBM at half a
        # second and extends the sweep past the old ceiling.  (Loop vars
        # deliberately distinct from the headline's n_streams/chunks — a
        # shadow here once silently demoted the headline run to chunks=2.)
        for s_str, s_chk in ((256, 1), (512, 1), (1024, 1), (2048, 1),
                             (4096, 2)):
            r = bench_width(s_str, n_iter=5, chunks=s_chk)
            rt = s_str / (r["total_ms_median"] / 1e3)
            log(
                f"sweep C={r['c']} (chunks={s_chk}): "
                f"detect {r['detect_ms']:.1f} ms + "
                f"fingerprint {r['fingerprint_ms']:.1f} ms per s-audio "
                f"→ {rt:.0f}x realtime"
            )

    try:
        r = bench_width(n_streams, chunks=chunks)
    except HitCapacityError:
        # capacity truncation is a sizing BUG, not an environment failure —
        # fail the run rather than masking it with a smaller shape
        raise
    except Exception as e:  # pragma: no cover - HBM/tunnel safety net
        # never leave the driver without an artifact: fall back to the
        # conservative round-2 operating point (C=8192, one dispatch)
        log(
            f"bench at C={n_streams * CHANNELS_PER_STREAM} failed "
            f"({type(e).__name__}: {e}); falling back to C=8192 chunks=1"
        )
        n_streams, chunks = 2048, 1
        r = bench_width(n_streams, chunks=chunks)

    # -- cold-cache self-warm (VERDICT r4 #1) --------------------------------
    # A cold cache picked conv_impl='conv' above so a measurement exists
    # within seconds (banked below as the crash-safety number).  Now pay the
    # fused stack's one-time Mosaic compile IN-PROCESS — ~1-9 min depending
    # on body (see ops/pallas_conv.py's measured table), once per cache
    # lifetime — and re-measure so the artifact of record carries the fused
    # headline, not the ~3x-slower fingerprint fallback.  No operator action
    # required; OFPTPU_BENCH_SELF_WARM=0 restores the r4 fallback-only run.
    fallback = None
    if (
        r.get("conv_impl") == "conv"
        and not os.environ.get("OFPTPU_BENCH_CONV")
        and os.environ.get("OFPTPU_BENCH_SELF_WARM", "1") == "1"
    ):
        fb_rt = n_streams / (r["total_ms_median"] / 1e3)
        log(
            f"conv-fallback measurement banked ({fb_rt:.0f}x realtime); "
            "self-warming the fused Pallas conv stack (one-time Mosaic "
            "compile, 350-540 s first-ever) and re-measuring fused..."
        )
        try:
            t0 = time.perf_counter()
            r_fused = bench_width(n_streams, chunks=chunks,
                                  conv_impl="pallas")
            log(
                f"self-warm complete in {time.perf_counter() - t0:.0f} s "
                "(compile + re-measure); fused stack is now in the "
                "persistent cache — future runs skip this step"
            )
            fallback = {
                "conv_fallback_realtime_factor": round(fb_rt, 1),
                "conv_fallback_fingerprint_ms": round(
                    r["fingerprint_ms"], 2
                ),
            }
            r = r_fused
        except Exception as e:  # pragma: no cover - keep the banked number
            log(
                f"self-warm failed ({type(e).__name__}: {e}); keeping the "
                "banked conv-fallback measurement as the headline"
            )

    rt_factor = n_streams / (r["total_ms_median"] / 1e3)
    rt_detect = n_streams / (r["detect_ms"] / 1e3)
    log(
        f"{r['path']} C={r['c']}: detect {r['detect_ms']:.2f} ms + "
        f"fingerprint {r['fingerprint_ms']:.2f} ms per 1s × {n_streams} "
        f"4-ch streams → {rt_factor:.0f}x realtime combined "
        f"(detect-only {rt_detect:.0f}x); dispersion over 10 iters: "
        f"median {r['total_ms_median']:.1f} / min {r['total_ms_min']:.1f} / "
        f"max {r['total_ms_max']:.1f} / std {r['total_ms_std']:.1f} ms"
    )
    floor = r["dispatch_floor_ms"]
    dev_ms = max(r["total_ms_median"] - floor, 1e-6)
    log(
        f"dispatch+sync floor {floor:.1f} ms is included in the headline; "
        f"device-only estimate {dev_ms:.1f} ms "
        f"→ {n_streams / (dev_ms / 1e3):.0f}x on a locally-attached chip"
    )
    # correctness gate: the headline is only valid if the detector actually
    # found the injected hits (c/test.py checks correctness + speed in one
    # harness); duplicates are same-burst adjacent-block fires, not misses
    correctness_ok = r["recall"] >= 0.99 and r["precision"] >= 0.99
    if not correctness_ok:
        log(
            f"CORRECTNESS GATE FAILED: recall {r['recall']:.4f} / "
            f"precision {r['precision']:.4f} (both must be >= 0.99)"
        )
    print(
        json.dumps(
            {
                "metric": "detect_fingerprint_realtime_factor_per_chip",
                "value": round(rt_factor, 1),
                "unit": "x_realtime_4ch_96kHz",
                "vs_baseline": round(rt_factor / 1000.0, 3),
                "recall": round(r["recall"], 4),
                "precision": round(r["precision"], 4),
                "n_duplicates": r["n_duplicates"],
                "correctness_ok": correctness_ok,
                "detect_cycles_per_sample": r["detect_cycles_per_sample"],
                "detect_pct_sol": r["detect_pct_sol"],
                "fingerprint_mxu_util": r["fingerprint_mxu_util"],
                "conv_impl": r.get("conv_impl", "conv"),
                **(fallback or {}),
            }
        )
    )
    return 0 if correctness_ok else 1


if __name__ == "__main__":
    sys.exit(main())
