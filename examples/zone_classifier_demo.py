"""Zone classification end-to-end: POSD + MFCC transform + CNN classifier.

Exercises the reference's classification pillar (SURVEY §2.4: POSD
data.py:330 with the MFCC transform hook data.py:338,593-680, CNN
model.py:52): synthesize two drum zones with different spectra, build a POSD
dataset with on-device augmentation and an onset-anchored MFCC transform,
train a CNN zone classifier with cross-entropy, report held-out accuracy.

Run: python examples/zone_classifier_demo.py [--cpu]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from onset_fingerprinting_tpu.core.config import TrainConfig
from onset_fingerprinting_tpu.data import POSD
from onset_fingerprinting_tpu.models import CNN, Trainer
from onset_fingerprinting_tpu.ops.stft import cspec_to_mfcc, onset_stft

SR = 96000


def synth_zone(rng, n_hits, f0, n=None):
    """Audio with n_hits bursts of fundamental f0 (+noise)."""
    spacing = 6000
    n = n or spacing * (n_hits + 1)
    audio = rng.normal(0, 1e-3, n).astype(np.float32)
    onsets = []
    t = np.arange(700)
    for i in range(n_hits):
        base = spacing // 2 + i * spacing
        partials = sum(
            np.sin(2 * np.pi * f0 * k / SR * t) / k for k in (1, 2, 3)
        )
        burst = partials * np.exp(-t / 250) * rng.uniform(0.3, 0.6)
        audio[base : base + 700] += burst.astype(np.float32)
        onsets.append(base)
    return audio, onsets


def mfcc_transform(audio: np.ndarray, posd: POSD) -> np.ndarray:
    """POSD transform hook: onset-anchored MFCCs (data.py:338 example)."""
    spec = onset_stft(
        jnp.asarray(audio), posd.pre_samples, frame_length=256,
        hop_length=64, n_fft=512, method="zerozero",
    )
    return np.asarray(cspec_to_mfcc(spec, sr=SR))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--hits", type=int, default=24)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    a0, o0 = synth_zone(rng, args.hits, 180.0)   # "center": low fundamental
    a1, o1 = synth_zone(rng, args.hits, 900.0)   # "edge": high fundamental

    ds = POSD.from_audio_onsets(
        [a0, a1], [o0, o1], sr=SR, frame_length=512, pre_samples=64,
        zone_names=["center", "edge"], n_rounds_aug=2,
        transform=mfcc_transform,
    )
    x = ds.audio.astype(np.float32)  # [N, n_mfcc, frames]
    y = (ds.labels["zone"] == "edge").to_numpy().astype(np.int64)
    print(f"dataset: {x.shape[0]} examples of shape {x.shape[1:]} "
          f"(MFCC features)")

    idx = rng.permutation(len(x))
    x, y = x[idx], y[idx]
    split = int(0.75 * len(x))

    trainer = Trainer(
        CNN(output_size=2, layer_sizes=[16, 16], kernel_size=3,
            dropout_rate=0.1),
        TrainConfig(lr=2e-3, num_epochs=200, patience=200, loss="xent",
                    batch_size=32),
    )
    state = trainer.fit((x[:split], y[:split]))
    acc = trainer.accuracy(state, (x[split:], y[split:]))
    print(f"held-out accuracy: {acc:.3f} over {len(x) - split} examples")
    print("PASS" if acc > 0.9 else "FAIL")
    sys.exit(0 if acc > 0.9 else 1)


if __name__ == "__main__":
    main()
