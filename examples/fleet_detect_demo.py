"""Fleet-scale offline dataset mining: sharded detection → locate → POSD.

The multi-device version of the reference's dataset-mining pipeline
(SURVEY §3.2: detect → group → fix → label): a batch of multi-sensor
recordings is sharded over the device mesh (8 virtual CPU devices here; the
same code spans a TPU pod), the fused detector runs data-parallel, and each
stream's onset events are grouped, located and written out as POSD sessions.

Run: python examples/fleet_detect_demo.py [--streams 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from onset_fingerprinting_tpu.core import posd
from onset_fingerprinting_tpu.core.config import DetectorConfig
from onset_fingerprinting_tpu.core.coords import (
    cartesian_to_polar,
    speed_of_sound,
    spherical_to_cartesian,
)
from onset_fingerprinting_tpu.detect import find_onset_groups
from onset_fingerprinting_tpu.detect.amplitude import detector_init
from onset_fingerprinting_tpu.locate import Multilaterate3D
from onset_fingerprinting_tpu.parallel import (
    detect_offline_sharded,
    make_mesh,
)
from onset_fingerprinting_tpu.parallel.sharding import events_from_dense

SR = 96000
DIAM = 14 * 2.54


def synth_fleet(n_streams, seconds=1.0, seed=0):
    radius = DIAM / 2
    polar = [(0.9, 0.0, 0.0), (0.9, 120.0, 0.0), (0.9, 240.0, 0.0)]
    xyz = [
        tuple(float(v) for v in spherical_to_cartesian(r * radius, p, t))
        for (r, p, t) in polar
    ]
    c = speed_of_sound(100, medium="drumhead")
    rng = np.random.default_rng(seed)
    n = int(seconds * SR) // 128 * 128
    t = np.arange(600)
    burst = (np.sin(2 * np.pi * 5000 / SR * t) * np.exp(-t / 150) * 0.6)
    streams = np.empty((n_streams, n, 3), np.float32)
    truths = []
    for s in range(n_streams):
        audio = rng.normal(0, 1e-4, (n, 3)).astype(np.float32)
        hits = []
        for base in range(SR // 4, n - 2000, SR // 4):
            x, y = rng.uniform(-radius * 0.7, radius * 0.7, 2)
            for ch, (sx, sy, _) in enumerate(xyz):
                d = np.hypot(x - sx, y - sy)
                at = base + int(round(d / c * SR))
                audio[at : at + 600, ch] += burst.astype(np.float32)
            hits.append((base, x, y))
        streams[s] = audio
        truths.append(hits)
    return streams, polar, truths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    mesh = make_mesh((min(len(jax.devices()), args.streams),), ("data",))
    print(f"mesh: {mesh.shape} over {jax.devices()[0].platform}")

    streams, polar, truths = synth_fleet(args.streams)
    cfg = DetectorConfig(
        n_channels=3, block_size=128, hipass_freq=0.0, sr=SR
    )
    static, params, state = detector_init(cfg)
    on, deltas, rel = detect_offline_sharded(
        static, params, state, jnp.asarray(streams), mesh
    )
    on, deltas = np.asarray(on), np.asarray(deltas)
    print(f"detected {int(on.sum())} onsets across {args.streams} streams")

    locator = Multilaterate3D(polar, drum_diameter=DIAM, medium="drumhead",
                              sr=SR)
    total_matched = total_hits = 0
    with tempfile.TemporaryDirectory() as td:
        for s in range(args.streams):
            channels, onsets = events_from_dense(on[s], deltas[s], 128)
            locator.ongoing = []
            hits = []
            for onset, ch in sorted(zip(onsets, channels)):
                res = locator.locate(int(ch), int(onset))
                if res is not None:
                    r, phi = cartesian_to_polar(res[0], res[1],
                                                locator.radius)
                    hits.append((int(onset), float(res[0]), float(res[1]),
                                 float(r), float(phi)))
            # write a POSD session per stream
            posd.save_session(
                Path(td), f"stream{s}", streams[s], SR,
                posd.make_hits(
                    np.asarray([h[0] for h in hits], dtype=np.int64),
                    locations=np.asarray([[h[3], h[4]] for h in hits],
                                         np.float32),
                ),
            )
            matched = 0
            for (base, x, y) in truths[s]:
                if any(np.hypot(h[1] - x, h[2] - y) < 2.0 for h in hits):
                    matched += 1
            total_matched += matched
            total_hits += len(truths[s])
        sessions = posd.find_sessions(td)
        print(f"wrote {len(sessions)} POSD sessions")
    print(f"located {total_matched}/{total_hits} hits within 2 cm")
    ok = total_matched >= 0.75 * total_hits
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
