"""Fingerprinting capability proof: CCCNN location regression must beat
predict-the-mean by a wide margin on a physically learnable fixture.

The reference's flagship result is a learned model reaching ~mm location
error on real 4-sensor drum recordings (refresh.org:1687-1726; CCCNN family
model.py:443-629).  A pure-TDOA synthetic fixture (identical burst per
channel, shifted) contains NO signal for the CCCNN — its features are
per-channel *self*-correlations, which are shift-invariant — so this demo
uses the modal-drum synthesizer (`data.synth`): per-sensor waveform content
varies continuously with hit position through membrane mode shapes,
distance-dependent dispersion/attenuation, and arrival delays.

Three models on the SAME fixture, same split:

1. predict-the-mean baseline (the floor any model must clear),
2. lag-FCNN: CC argmax lags per sensor pair → FCNN → (x, y)
   (calibration.py:685-754 path),
3. raw-window CCCNN (flagship, reference train.py:79-90 architecture).

Run: python examples/fingerprint_capability_demo.py [--cpu] [--hits N]
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

import jax
import jax.numpy as jnp

from onset_fingerprinting_tpu.core.compile_cache import (
    enable_compilation_cache,
)
from onset_fingerprinting_tpu.core.config import TrainConfig
from onset_fingerprinting_tpu.data.datasets import MCPOSD
from onset_fingerprinting_tpu.data.synth import synth_location_session
from onset_fingerprinting_tpu.locate.calibration import train_location_model
from onset_fingerprinting_tpu.models.experiment import build_cccnn
from onset_fingerprinting_tpu.models.train import Trainer, make_optimizer
from onset_fingerprinting_tpu.ops.xcorr import batch_full_correlate

SR = 96000
W = 256


def pair_lags(x: np.ndarray) -> np.ndarray:
    """CC argmax lag of every unordered channel pair (all C(c,2) pairs).

    :param x: ``[N, C, W]`` onset windows
    :returns: ``[N, P]`` float lags in samples
    """
    xj = jnp.asarray(x)
    c = x.shape[1]
    feats = []
    for i in range(c):
        for j in range(i + 1, c):
            cc = batch_full_correlate(xj[:, i], xj[:, j])
            feats.append(jnp.argmax(cc, axis=-1) - (x.shape[-1] - 1))
    return np.asarray(jnp.stack(feats, axis=-1), np.float32)


def l1_cm(pred: np.ndarray, y: np.ndarray) -> float:
    return float(np.mean(np.abs(np.asarray(pred) - np.asarray(y))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--hits", type=int, default=768)
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=3e-3)
    args = ap.parse_args()

    enable_compilation_cache()
    t0 = time.perf_counter()
    with tempfile.TemporaryDirectory() as td:
        folder = Path(td)
        synth_location_session(folder, n_hits=args.hits, sr=SR, seed=0)
        # HIT-LEVEL holdout (MCPOSD.split_hits): a held-out hit
        # contributes NO window (in any augmentation round) to training —
        # a window split would leak every test hit into training via its
        # shifted copies and measure memorization, not generalization.
        # Train: shift augmentation, 4 extraction rounds (data.py:273);
        # eval: exact single extraction of the held-out hits.
        full_ds = MCPOSD.from_file(folder, "combined0", W, 8, 16, 4)
        train_ds, eval_ds = full_ds.split_hits(0.75, seed=1)
        xt, yt = train_ds[0]
        val_ds, test_ds = eval_ds.split(0.5, seed=1)
        x_train = np.asarray(xt)
        y_train = np.asarray(yt)
        val = (np.asarray(val_ds.x), np.asarray(val_ds.y))
        test = (np.asarray(test_ds.x), np.asarray(test_ds.y))
    print(
        f"fixture: {args.hits} hits -> train {x_train.shape} "
        f"val {val[0].shape} test {test[0].shape} "
        f"({time.perf_counter()-t0:.1f}s synth)",
        flush=True,
    )

    # 1. predict-the-mean floor
    mean_pred = y_train.mean(axis=0)
    base = l1_cm(np.broadcast_to(mean_pred, test[1].shape), test[1])

    # 2. lag-FCNN (CC lags -> FCNN, the calibration-pillar model)
    lags_train = pair_lags(x_train)
    lags_test = pair_lags(test[0])
    bundle, _ = train_location_model(
        lags_train, y_train, lr=1e-2, num_epochs=2000, patience=2000,
        epochs_per_step=100, hidden_layers=[64, 64],
    )
    fcnn_err = l1_cm(bundle(lags_test), test[1])
    print(f"lag-FCNN done ({time.perf_counter()-t0:.1f}s)", flush=True)

    # 3. raw-window CCCNN, the flagship (train.py:79-90 skeleton with the
    # normalized-CC head + adam — see models/experiment.build_cccnn)
    model = build_cccnn(None, channels=4)
    cfg = TrainConfig(
        lr=args.lr, num_epochs=args.epochs, min_epochs=0,
        patience=args.epochs, loss="l1", seed=0, optimizer="adam",
    )
    trainer = Trainer(
        model,
        cfg,
        optimizer=make_optimizer(
            "adam", args.lr, schedule="cosine", schedule_period=100,
        ),
    )
    state = trainer.fit(
        (x_train, y_train), val, epochs_per_step=max(args.epochs // 10, 1)
    )
    cccnn_err = trainer.test(state, test)
    print(f"self-CC CCCNN done ({time.perf_counter()-t0:.1f}s)", flush=True)

    # 4. paired-CC CCCNN (beyond the reference): cross-channel pair CC
    # features carry the TDOA cue the self-CC features are blind to (see
    # CCCNN.cc_pairs).  ±112 lags cover the fixture's physical delay range
    # (35.6 cm head / 343 m/s ≈ 98 samples at 96 kHz) within the conv
    # output length (V=133).
    pmodel = build_cccnn(None, channels=4, cc_pairs="all", cc_pair_lags=112)
    ptrainer = Trainer(
        pmodel,
        cfg,
        optimizer=make_optimizer(
            "adam", args.lr, schedule="cosine", schedule_period=100,
        ),
    )
    pstate = ptrainer.fit(
        (x_train, y_train), val, epochs_per_step=max(args.epochs // 10, 1)
    )
    paired_err = ptrainer.test(pstate, test)

    print()
    print(f"{'model':<22}{'test L1 (cm)':>14}")
    print(f"{'predict-mean':<22}{base:>14.3f}")
    print(f"{'lag-FCNN':<22}{fcnn_err:>14.3f}")
    print(f"{'raw-window CCCNN':<22}{cccnn_err:>14.3f}")
    print(f"{'paired-CC CCCNN':<22}{paired_err:>14.3f}")
    print(f"total {time.perf_counter()-t0:.1f}s")

    # capability bar: CCCNN must CRUSH the mean floor, not shave it; the
    # paired head must at least match the self-CC flagship (it sees a
    # strict superset of its features)
    ok = (
        cccnn_err < 0.35 * base
        and fcnn_err < 0.6 * base
        and paired_err < 1.15 * cccnn_err
    )
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
