"""End-to-end serve-loop demo: synthetic drum → detect → group → locate.

Simulates a 3-sensor drumhead, generates hits at known polar locations with
physically consistent per-sensor arrival delays, runs the amplitude onset
detector, clusters onsets into per-hit groups, and feeds them through the
online Multilaterate3D locator.  Reports localization error in cm.

Run: python examples/e2e_locate_demo.py [--hits N] [--seed S]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from onset_fingerprinting_tpu.core.coords import (
    polar_to_cartesian,
    speed_of_sound,
)
from onset_fingerprinting_tpu.detect import (
    detect_onsets_amplitude,
    find_onset_groups,
)
from onset_fingerprinting_tpu.locate import Multilaterate3D


def synth_drum(
    n_hits: int = 8,
    sr: int = 96000,
    diameter_cm: float = 14 * 2.54,
    seed: int = 0,
):
    """Synthesize a multi-sensor drum recording with hits at known spots."""
    rng = np.random.default_rng(seed)
    radius = diameter_cm / 2
    # three drumhead sensors near the rim (relative polar + elevation 0)
    sensor_polar = [(0.9, 0.0, 0.0), (0.9, 120.0, 0.0), (0.9, 240.0, 0.0)]
    c = speed_of_sound(100, medium="drumhead")  # cm/s
    sensors_xy = [
        polar_to_cartesian(r * radius, phi) for (r, phi, _) in sensor_polar
    ]
    spacing = int(0.25 * sr)  # 250 ms between hits
    n = spacing * (n_hits + 2)
    audio = rng.normal(0, 1e-4, size=(n, 3)).astype(np.float32)

    truths = []
    burst_len = 600
    t = np.arange(burst_len)
    for h in range(n_hits):
        r = rng.uniform(0.1, 0.85) * radius
        phi = rng.uniform(0, 360)
        x, y = polar_to_cartesian(r, phi)
        base = spacing * (h + 1)
        burst = (
            np.sin(2 * np.pi * 4000 / sr * t)
            * np.exp(-t / 150.0)
            * rng.uniform(0.4, 0.9)
        )
        for ch, (sx, sy) in enumerate(sensors_xy):
            dist = np.hypot(x - float(sx), y - float(sy))
            delay = int(round(dist / c * sr))
            audio[base + delay : base + delay + burst_len, ch] += burst
        truths.append((base, float(x), float(y)))
    return audio, sensor_polar, truths, sr, diameter_cm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hits", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    audio, sensor_polar, truths, sr, diameter = synth_drum(
        args.hits, seed=args.seed
    )
    print(f"synth: {audio.shape[0]/sr:.1f}s, {audio.shape[1]} sensors, "
          f"{len(truths)} hits")

    channels, onsets, rel = detect_onsets_amplitude(
        audio, sr=sr, hipass_freq=0.0, floor=-70.0,
        fast_ar=(3.0, 383.0), slow_ar=(2205.0, 2205.0),
    )
    print(f"detected {len(onsets)} onsets on {len(set(channels))} channels")

    groups = find_onset_groups(onsets, channels, max_distance=200,
                               min_channels=3)
    if groups is None:
        print("FAIL: no onset groups found", file=sys.stderr)
        sys.exit(1)
    print(f"grouped into {len(groups)} hits (expected {len(truths)})")

    locator = Multilaterate3D(
        sensor_locations=sensor_polar, drum_diameter=diameter,
        medium="drumhead", sr=sr,
    )
    # feed events in time order, as the realtime engine would
    events = sorted(zip(onsets, channels))
    results = []
    for onset, ch in events:
        res = locator.locate(ch, onset)
        if res is not None:
            results.append((onset, res))

    print(f"located {len(results)} hits")
    errs = []
    for (base, tx, ty) in truths:
        best = None
        for onset, (px, py) in results:
            if abs(onset - base) < 2000:
                best = (px, py)
        if best is None:
            continue
        errs.append(float(np.hypot(best[0] - tx, best[1] - ty)))
    if not errs:
        print("FAIL: no located hit matched ground truth", file=sys.stderr)
        sys.exit(1)
    errs = np.array(errs)
    print(
        f"matched {len(errs)}/{len(truths)} hits | "
        f"localization error: mean {errs.mean():.2f} cm, "
        f"median {np.median(errs):.2f} cm, max {errs.max():.2f} cm"
    )
    ok = len(errs) >= 0.75 * len(truths) and np.median(errs) < 3.0
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
