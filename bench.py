"""Benchmark: offline multichannel onset detection throughput on TPU.

Headline metric (north star, BASELINE.md): ×-realtime multichannel
detect-and-fingerprint throughput per chip — target ≥1000× realtime.  The
workload batches many 4-channel 96 kHz streams as one wide-channel fused
detector (Pallas kernel; XLA-scan fallback) and measures steady-state
wall-clock per second of audio.

Prints ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from onset_fingerprinting_tpu.core.config import DetectorConfig
    from onset_fingerprinting_tpu.ops.pallas_detector import (
        make_pallas_detector,
    )

    dev = jax.devices()[0]
    log(f"device: {dev}")

    sr = 96000
    seconds = 1
    channels_per_stream = 4
    # 1024 4-ch streams = 4096 detector channels (32 lane-tiles) is the
    # throughput sweet spot: ~164 ms/s-audio (~6300x realtime), flat from
    # C=512 up (latency-bound chain, width rides free).  C=8192 falls off a
    # VMEM cliff (2.17 s/s-audio, ~940x — spills); C=16384 VMEM-OOMs.
    # Override via OFPTPU_BENCH_STREAMS.
    import os

    n_streams = int(os.environ.get("OFPTPU_BENCH_STREAMS", "1024"))
    c = n_streams * channels_per_stream
    t = sr * seconds

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1e-3, (t, c)).astype(np.float32)
    # sprinkle synthetic hits so the detector does real work
    burst = (
        np.sin(2 * np.pi * 5000 / sr * np.arange(600))
        * np.exp(-np.arange(600) / 150)
        * 0.5
    ).astype(np.float32)
    for base in range(5000, t - 700, 9600):
        x[base : base + 600] += burst[:, None]

    cfg = DetectorConfig(
        n_channels=c, block_size=128, hipass_freq=2000.0, sr=sr,
        # independent streams must not couple through the reference's
        # cross-channel off-gate quirk
        coupled_off_gate=False,
    )

    def run_pallas():
        # events-only mode: skip the full rel-envelope output (bench measures
        # the detection workload; rel is a debug/analysis output). Compile
        # ~30-60 s at this width; measured 6299x realtime (C=4096).
        _, _, state, run = make_pallas_detector(cfg, emit_rel=False)
        xd = jnp.asarray(x)
        t0 = time.perf_counter()
        _, (on, d, rel) = run(state, xd)
        _ = float(jnp.sum(on))
        log(f"pallas compile+first: {time.perf_counter() - t0:.1f}s")
        n_iter = 5
        t0 = time.perf_counter()
        for _ in range(n_iter):
            _, (on, d, rel) = run(state, xd)
            _ = float(jnp.sum(on)) + float(jnp.sum(d))
        return (time.perf_counter() - t0) / n_iter

    def run_scan():
        from onset_fingerprinting_tpu.detect.amplitude import (
            detect_offline,
            detector_init,
        )

        static, params, state = detector_init(cfg)
        xd = jnp.asarray(x)
        t0 = time.perf_counter()
        out = detect_offline(static, params, state, xd)
        _ = float(jnp.sum(out[1][2]))
        log(f"scan compile+first: {time.perf_counter() - t0:.1f}s")
        n_iter = 3
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = detect_offline(static, params, state, xd)
            _ = float(jnp.sum(out[1][2]))
        return (time.perf_counter() - t0) / n_iter

    path = "pallas"
    try:
        elapsed = run_pallas()
    except Exception as e:  # pragma: no cover - kernel toolchain fallback
        log(f"pallas kernel failed ({type(e).__name__}: {e}); "
            "falling back to XLA scan")
        path = "xla_scan"
        elapsed = run_scan()

    audio_seconds = n_streams * seconds
    rt_factor = audio_seconds / elapsed
    log(
        f"{path}: {elapsed * 1e3:.2f} ms per {seconds}s × {n_streams} "
        f"4-ch streams → {rt_factor:.0f}x realtime"
    )
    print(
        json.dumps(
            {
                "metric": "offline_detect_realtime_factor_per_chip",
                "value": round(rt_factor, 1),
                "unit": "x_realtime_4ch_96kHz",
                "vs_baseline": round(rt_factor / 1000.0, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
