"""Measure the accuracy of the serving window extractions.

The reference extracts exact onset-anchored windows for its models
(data.py:55-120).  The TPU serving path now does too: the SAMPLE-ANCHORED
gather (``top_hit_blocks(deltas)`` + ``gather_hit_windows(anchored=True)``,
the bench default) pins the onset to index ``pre`` exactly — the DMA reads
from the 8-floored row and the 0..7 residual shifts in-kernel.  The legacy
block-aligned mode leaves the onset at ``PRE + (onset mod block)`` — up to
127 samples of jitter at block=128.  This experiment quantifies both, plus
the training-time mitigation for the legacy mode:

- model A: trained with exact anchoring (pre=8, ±16 shift augmentation),
  evaluated (a) exactly, (b) through the ANCHORED serving gather at the
  detector's onsets (the real serving path — residual error is detector
  timing, a few samples), and (c) through the legacy block-aligned gather;
- model B: trained with SERVING-MATCHED anchoring (pre=128, ±64 shift — the
  same offset distribution the block-aligned gather produces), evaluated
  through the block-aligned gather.

Held-out hits are split into VAL (checkpoint selection; each model
validates on its own deployment extraction) and TEST (reported metrics)
halves, so no reported number is selected on the test set.

PASS = A's ANCHORED serving error within 1.1x of A's exact error (no
serve-matched augmentation needed), plus the legacy gates (B within 2x of
exact and 4x below the predict-mean floor).  Measured under THIS protocol
(TPU, 512 hits, 1500 epochs): A exact 0.801 cm; A through the ANCHORED
serving gather **0.854 cm** (1.066x — the jitter gap is closed); A through
the block-aligned gather 4.669 cm (~6x unmitigated); B (matched aug)
through the block-aligned gather 1.219 cm.  Conclusion: serve anchored;
the augmentation mitigation is only needed for the legacy block-aligned
mode.

Run: python examples/serving_window_accuracy.py [--cpu] [--hits N]
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

from onset_fingerprinting_tpu.core.compile_cache import (
    enable_compilation_cache,
)
from onset_fingerprinting_tpu.core.config import TrainConfig
from onset_fingerprinting_tpu.data.datasets import MCPOSD
from onset_fingerprinting_tpu.data.synth import synth_location_session
from onset_fingerprinting_tpu.models.experiment import build_cccnn
from onset_fingerprinting_tpu.models.train import Trainer, make_optimizer

SR = 96000
W = 256
BLOCK = 128
PRE_SERVE = 64  # bench.py PRE: lead-in before the block-aligned start


def serving_windows(audio: np.ndarray, onsets: np.ndarray) -> np.ndarray:
    """Block-aligned extraction exactly like the serving path: window row0
    = (onset // BLOCK) * BLOCK - PRE_SERVE, so the onset sits at offset
    PRE_SERVE + (onset % BLOCK) — jitter in [PRE_SERVE, PRE_SERVE+127]."""
    rows = (onsets // BLOCK) * BLOCK - PRE_SERVE
    rows = np.clip(rows, 0, audio.shape[0] - W)
    idx = rows[:, None] + np.arange(W)[None, :]
    return np.transpose(audio[idx], (0, 2, 1)).astype(np.float32)


def anchored_serving_windows(
    audio: np.ndarray, hit_onsets: np.ndarray, pre: int
) -> tuple[np.ndarray, int]:
    """The REAL sample-anchored serving extraction: run the detector on the
    session audio, anchor each hit at its EARLIEST detected arrival (what
    ``top_hit_blocks(deltas)`` does in the serving pipeline), and extract
    through ``gather_hit_windows(anchored=True)`` — the exact code path the
    bench/serve uses.  Residual anchor error vs the labelled onset is the
    detector's timing error (a few samples), not block jitter.

    Returns (windows [N, C, W], n_missed) — hits with no detected onset
    within ±256 samples fall back to the labelled onset and are counted.
    """
    import jax.numpy as jnp

    from onset_fingerprinting_tpu.detect import detect_onsets_amplitude
    from onset_fingerprinting_tpu.ops.windows import gather_hit_windows

    _, onsets_det, _ = detect_onsets_amplitude(audio, sr=SR)
    onsets_det = np.sort(np.asarray(onsets_det))
    anchors = np.empty(len(hit_onsets), np.int64)
    missed = 0
    for i, o in enumerate(hit_onsets):
        cand = onsets_det[(onsets_det >= o - 256) & (onsets_det <= o + 256)]
        if len(cand):
            anchors[i] = cand.min()  # earliest arrival anchors the hit
        else:
            anchors[i] = o
            missed += 1
    wins = gather_hit_windows(
        jnp.asarray(audio),
        jnp.asarray(anchors.astype(np.int32)),
        jnp.zeros(len(anchors), jnp.int32),
        audio.shape[1], W, pre, anchored=True,
    )
    return np.asarray(wins), missed


def train_cccnn(x, y, val, epochs, lr):
    model = build_cccnn(None, channels=4)
    cfg = TrainConfig(
        lr=lr, num_epochs=epochs, min_epochs=0, patience=epochs,
        loss="l1", seed=0, optimizer="adam",
    )
    trainer = Trainer(
        model, cfg,
        optimizer=make_optimizer(
            "adam", lr, schedule="cosine", schedule_period=100,
        ),
    )
    state = trainer.fit(
        (x, y), val, epochs_per_step=max(epochs // 10, 1)
    )
    return trainer, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--hits", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=1500)
    ap.add_argument("--lr", type=float, default=3e-3)
    args = ap.parse_args()

    enable_compilation_cache()
    t0 = time.perf_counter()
    with tempfile.TemporaryDirectory() as td:
        folder = Path(td)
        onsets, locs = synth_location_session(
            folder, n_hits=args.hits, sr=SR, seed=0
        )
        # exact-anchored training set (the reference's extraction)
        ds_a = MCPOSD.from_file(folder, "combined0", W, 8, 16, 4)
        # serving-matched training set: onset offset ~ U[64, 192]
        ds_b = MCPOSD.from_file(folder, "combined0", W, 128, 64, 4)
        exact = MCPOSD.from_file(folder, "combined0", W, 8, 0, 1)
        from onset_fingerprinting_tpu.core.audio_io import read_wav

        audio, _ = read_wav(folder / "combined0.wav")

    # hit-level holdout, split into VAL (checkpoint selection) and TEST
    # (final metrics) halves — best_state is picked by val loss inside
    # Trainer.fit, so validating on the test hits would select checkpoints
    # on the test set and bias every reported number low
    n = args.hits
    rng = np.random.default_rng(1)
    held = rng.permutation(n)[: n // 4]
    val_idx, test_idx = held[: len(held) // 2], held[len(held) // 2 :]
    val_mask = np.zeros(n, bool)
    val_mask[val_idx] = True
    test_mask = np.zeros(n, bool)
    test_mask[test_idx] = True

    xa, ya = (np.asarray(v) for v in ds_a[0])
    xb, yb = (np.asarray(v) for v in ds_b[0])
    keep = np.tile(~(val_mask | test_mask), 4)  # 4 extraction rounds
    # each model validates on ITS deployment extraction (A: exact, B: the
    # serving block-aligned gather) — symmetric checkpoint selection
    val_a = (np.asarray(exact.x)[val_mask], np.asarray(exact.y)[val_mask])
    val_b = (serving_windows(audio, onsets[val_mask]), locs[val_mask])
    y_test = locs[test_mask]
    x_serv = serving_windows(audio, onsets[test_mask])
    x_exact = np.asarray(exact.x)[test_mask]

    print(
        f"fixture {n} hits; train {keep.sum()} x4-aug, "
        f"val {val_mask.sum()}, test {test_mask.sum()}"
        f" ({time.perf_counter()-t0:.0f}s)", flush=True,
    )

    # the ANCHORED serving path (ops/windows.py anchored gather at the
    # detector's earliest-arrival onsets): same anchor convention as model
    # A's training extraction (pre=8), so A deploys with NO serve-matched
    # augmentation
    x_anch, n_missed = anchored_serving_windows(
        audio, onsets[test_mask], pre=8
    )
    if n_missed:
        print(f"anchored extraction: {n_missed} test hits undetected "
              f"(fell back to labelled onsets)", flush=True)

    tr_a, st_a = train_cccnn(
        xa[keep], ya[keep], val_a, args.epochs, args.lr
    )
    a_exact = tr_a.test(st_a, (x_exact, y_test))
    a_serv = tr_a.test(st_a, (x_serv, y_test))
    a_anch = tr_a.test(st_a, (x_anch, y_test))
    print(f"model A (exact-trained): exact {a_exact:.3f} cm, "
          f"block-aligned {a_serv:.3f} cm, anchored {a_anch:.3f} cm",
          flush=True)

    tr_b, st_b = train_cccnn(
        xb[keep], yb[keep], val_b, args.epochs, args.lr
    )
    b_serv = tr_b.test(st_b, (x_serv, y_test))
    b_exact = tr_b.test(st_b, (x_exact, y_test))
    print(f"model B (serving-matched aug): serving-gather {b_serv:.3f} cm, "
          f"exact {b_exact:.3f} cm", flush=True)

    print()
    print(f"{'path':<42}{'test L1 (cm)':>14}")
    print(f"{'A: exact train  -> exact eval':<42}{a_exact:>14.3f}")
    print(f"{'A: exact train  -> ANCHORED serving eval':<42}{a_anch:>14.3f}")
    print(f"{'A: exact train  -> block-aligned eval':<42}{a_serv:>14.3f}")
    print(f"{'B: matched aug  -> block-aligned eval':<42}{b_serv:>14.3f}")
    print(f"total {time.perf_counter()-t0:.0f}s")

    # predict-mean floor, same convention as the trainer's L1 (train-set
    # mean evaluated on the test hits)
    keep_hits = ~(val_mask | test_mask)
    mean_pred = locs[keep_hits].mean(axis=0)
    mean_floor = float(np.mean(np.abs(mean_pred[None] - y_test)))
    # the anchored serving gather must close the jitter gap: within 1.1x
    # of the exact-extraction error, with no serve-matched augmentation
    anch_ok = a_anch < 1.1 * a_exact
    legacy_ok = (b_serv < 2.0 * a_exact) and (b_serv < mean_floor / 4.0)
    ok = anch_ok and legacy_ok
    print(f"(predict-mean floor {mean_floor:.2f} cm)")
    if not anch_ok:
        print(f"anchored gate FAILED: {a_anch:.3f} >= 1.1 x {a_exact:.3f}")
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
