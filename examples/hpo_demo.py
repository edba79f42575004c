"""Location-model HPO end-to-end on TPU over a synthetic MCPOSD session.

Equivalent of running the reference's training entry with its optuna study
(reference: train.py:22-145) — here `models.experiment.run_location_hpo`
drives `models.hpo.Study` (TPE sampler + median pruning) over CCCNN
configs, with every training step jitted on the TPU.

Two fixtures (``--fixture``):

- ``modal`` (default): the modal-drum synthesizer (`data.synth`) — per-
  sensor waveform content varies with hit position (membrane mode shapes,
  distance-dependent dispersion/attenuation), so raw onset windows carry
  genuinely learnable regression signal.  This is the fixture the
  capability proof (examples/fingerprint_capability_demo.py) reaches
  sub-cm on; HPO here should land in the same regime.
- ``airlag``: the round-2 pure-TDOA fixture (identical burst per channel,
  shifted by air-speed delays).  KEPT AS A NEGATIVE CONTROL: the CCCNN's
  per-channel self-correlation features are shift-invariant, so this
  fixture contains no signal for the architecture and HPO plateaus at the
  predict-the-mean floor (~5.5-6.7 cm) — the round-2 result, root-caused.

Run: python examples/hpo_demo.py [--cpu] [--trials 2] [--fixture modal]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

from onset_fingerprinting_tpu.core import posd
from onset_fingerprinting_tpu.core.coords import (
    polar_to_cartesian,
    speed_of_sound,
    spherical_to_cartesian,
)
from onset_fingerprinting_tpu.models.experiment import run_location_hpo

SR = 96000
DIAM = 14 * 2.54


def synth_session(folder: Path, n_hits: int = 48, seed: int = 0) -> None:
    radius = DIAM / 2
    polar = [(0.9, 0.0, 0.0), (0.9, 90.0, 0.0), (0.9, 180.0, 0.0),
             (0.9, 270.0, 0.0)]
    xyz = [
        tuple(float(v) for v in spherical_to_cartesian(r * radius, phi, th))
        for (r, phi, th) in polar
    ]
    # air-speed TDOA: the full inter-sensor lag spread (~84 samples across
    # the drum) fits inside the 256-sample extraction frame, so the CCCNN
    # sees every channel's burst (drumhead wave speed would put far
    # channels ~770 samples out — beyond the frame)
    c = speed_of_sound(100, medium="air")  # cm/s
    rng = np.random.default_rng(seed)
    n = 4000 * n_hits + 8000
    audio = rng.normal(0, 1e-4, (n, 4)).astype(np.float32)
    t = np.arange(500)
    burst = (np.sin(2 * np.pi * 5000 / SR * t) * np.exp(-t / 130)
             * 0.6).astype(np.float32)
    onsets, locs = [], []
    for i in range(n_hits):
        base = 4000 + i * 4000
        r = rng.uniform(0.1, 0.9)
        phi = rng.uniform(0, 360)
        x, y = polar_to_cartesian(r * radius, phi)
        delays = []
        for ch, (sx, sy, _) in enumerate(xyz):
            d = np.hypot(float(x) - sx, float(y) - sy)
            delay = int(round(d / c * SR))
            delays.append(delay)
            audio[base + delay: base + delay + 500, ch] += burst
        onsets.append(base + min(delays))
        # cartesian cm targets (continuous — no phi wraparound seam)
        locs.append([float(x), float(y)])
    posd.save_session(
        folder, "combined0", audio, SR,
        posd.make_hits(np.asarray(onsets),
                       locations=np.asarray(locs, np.float32)),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=300)
    # reference budget: min 1000 epochs, patience 500 (train.py:92-105)
    ap.add_argument("--min-epochs", type=int, default=0)
    ap.add_argument("--patience", type=int, default=0,
                    help="early-stop patience; 0 = no early stop")
    ap.add_argument("--hits", type=int, default=48)
    ap.add_argument("--fixture", choices=("modal", "airlag"),
                    default="modal")
    ap.add_argument("--sampler", choices=("tpe", "random"), default="tpe",
                    help="study sampler (reference: optuna TPESampler, "
                    "train.py:130-145)")
    ap.add_argument("--search-pairs", action="store_true",
                    help="include the cross-channel pair-CC head "
                    "(cc_pairs in {None, adjacent, all}) in the search "
                    "space")
    ap.add_argument("--subsample", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as td:
        folder = Path(td)
        if args.fixture == "modal":
            from onset_fingerprinting_tpu.data.synth import (
                synth_location_session,
            )

            synth_location_session(folder, n_hits=args.hits, sr=SR, seed=0)
        else:
            synth_session(folder, n_hits=args.hits)
        t0 = time.perf_counter()
        study = run_location_hpo(
            folder, "combined0", w=256, channels=4, pre_samples=8,
            n_trials=args.trials, num_epochs=args.epochs,
            min_epochs=args.min_epochs,
            patience=args.patience or args.epochs,
            subsample=args.subsample,
            sampler=args.sampler, search_pairs=args.search_pairs,
        )
        el = time.perf_counter() - t0
    print(f"{args.trials} trials x {args.epochs} epochs in {el:.1f}s")
    note = (
        "predict-mean floor ~6.8 cm; sub-cm reachable on this fixture "
        "(capability demo, hit-level split: pair-CC 0.652 cm at 768 "
        "hits / 2000 epochs; self-CC flagship 1.881 cm)"
        if args.fixture == "modal"
        else "negative control: no learnable waveform signal — expect the "
        "predict-mean floor (~5.5-6.7 cm)"
    )
    # selection on VAL; the test number reported belongs to the selected
    # trial (never min-over-trials of the test metric)
    for t in study.results:
        v = "-" if t.value is None else f"{t.value:.3f}"
        tl = t.user_attrs.get("test_l1")
        tl = "-" if tl is None else f"{tl:.3f}"
        print(f"  trial {t.number}: {t.state:<9} val {v:>7} test {tl:>7} "
              f"params {t.params}")
    test_l1 = study.best_trial.user_attrs.get("test_l1", float("nan"))
    print(f"best val L1: {study.best_value:.3f} cm ({note})")
    print(f"test L1 of the selected trial: {test_l1:.3f} cm")
    print(f"best params: {study.best_params}")
    states = [t.state for t in study.results]
    print(f"trial states: {states}")
    # the demo validates the PIPELINE (study, pruning, scanned fit on TPU)
    ok = any(s == "complete" for s in states) and np.isfinite(
        study.best_value
    )
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
