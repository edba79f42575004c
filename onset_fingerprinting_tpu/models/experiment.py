"""Location-model training entry with hyperparameter search.

Equivalent of the reference's training script (reference: train.py:22-145):
load an MCPOSD session, full-batch train CCCNN location regressors under a
random-search study with median pruning, report the best ``hp_metric``
(test L1).  Data and training steps run jitted on the TPU; optionally
data-parallel over a mesh.

Run: python -m onset_fingerprinting_tpu.models.experiment <folder> <name>
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Optional

import numpy as np

from onset_fingerprinting_tpu.core.config import TrainConfig
from onset_fingerprinting_tpu.data.datasets import MCPOSD
from onset_fingerprinting_tpu.models.cccnn import CCCNN
from onset_fingerprinting_tpu.models.hpo import Study, Trial, TrialPruned
from onset_fingerprinting_tpu.models.train import Trainer, make_optimizer


#: the flagship conv schedule (reference train.py:79-90)
FLAGSHIP_KERNELS = (1, 33, 64, 15, 15, 15, 1)
FLAGSHIP_PADDING = 1


def flagship_conv_output_length(w: int) -> int:
    """Conv-stack output length V for a window of ``w`` samples: each
    stride-1 layer maps ``t -> t + 2*padding - k + 1``.  V=133 at w=256."""
    v = w
    for k in FLAGSHIP_KERNELS:
        # XLA clamps a too-short conv to a 0-length output (flax nn.Conv
        # semantics) rather than erroring — mirror that here
        v = max(v + 2 * FLAGSHIP_PADDING - k + 1, 0)
    return v


def build_cccnn(
    trial: Optional[Trial] = None,
    channels: int = 4,
    cc_pairs: Optional[str] = None,
    cc_pair_lags: Optional[int] = None,
    search_pairs: bool = False,
    w: int = 256,
) -> CCCNN:
    """The reference's HPO-winning architecture skeleton (train.py:79-90):
    7 conv layers of width 5 with kernel schedule [1,33,64,15,15,15,1];
    dropout searched when a trial is given.

    Uses the normalized-CC head (``cc_norm=True``): the reference's raw-CC
    softmax head saturates one-hot for self-correlations and cannot train
    (see CCCNN.cc_norm); with it, the same conv skeleton reaches sub-cm on
    the modal-drum fixture (examples/fingerprint_capability_demo.py).

    ``cc_pairs``/``cc_pair_lags`` additionally feed cross-channel pair-CC
    features to the head (see CCCNN.cc_pairs — the TDOA cue self-CC
    features cannot carry).  ``search_pairs=True`` lets the trial choose
    the pair mode itself (categorical over None/'adjacent'/'all').
    """
    dropout = trial.suggest_float("dropout", 0.0, 0.1) if trial else 0.0
    if search_pairs and trial is not None:
        cc_pairs = trial.suggest_categorical(
            "cc_pairs", [None, "adjacent", "all"]
        )
    if cc_pairs is not None:
        v = flagship_conv_output_length(w)
        if v < 2:
            # the window is too short for the flagship stack to emit any
            # feature positions — pair CC has nothing to correlate; fall
            # back to the self-CC head instead of crashing the study
            cc_pairs = None
            cc_pair_lags = None
        elif cc_pair_lags is None:
            # cover the physical TDOA range (drum diameter / c · sr ≈ 112
            # lags at 96 kHz), clamped inside the conv output length for
            # the configured window — CCCNN requires cc_pair_lags < V
            cc_pair_lags = min(112, v - 1)
    return CCCNN(
        output_size=2,
        channels=channels,
        layer_sizes=[5] * 7,
        kernel_sizes=list(FLAGSHIP_KERNELS),
        dropout_rate=dropout,
        batch_norm=True,
        group=False,
        cc_norm=True,
        cc_pairs=cc_pairs,
        cc_pair_lags=cc_pair_lags,
    )


def run_location_hpo(
    folder: str | Path,
    name: str,
    w: int = 256,
    channels: int = 4,
    pre_samples: int = 8,
    n_trials: int = 3,
    num_epochs: int = 1000,
    min_epochs: int = 100,
    patience: int = 500,
    subsample: int = 8,
    seed: int = 0,
    mesh=None,
    sampler: str = "tpe",
    search_pairs: bool = False,
) -> Study:
    """Full pipeline: MCPOSD load → hit-level train / val / test split →
    HPO study over CCCNN configs → best hp_metric (train.py:22-145).

    The split is at HIT level (``MCPOSD.split_hits``): a held-out hit
    contributes NO window (in any shift-augmentation round) to training —
    splitting windows would leak every evaluation hit into training via
    its shifted copies and report memorization, not generalization.
    """
    dataset = MCPOSD.from_file(folder, name, w, pre_samples, 16, 4)
    train_ds, eval_ds = dataset.split_hits(0.8, seed=seed)
    x, y = train_ds[0]
    train = (np.asarray(x)[::subsample], np.asarray(y)[::subsample])
    # eval_ds extracts held-out hits exactly once → its window split IS a
    # hit split
    val_ds, test_ds = eval_ds.split(0.5, seed=seed)
    val = (np.asarray(val_ds.x), np.asarray(val_ds.y))
    test = (np.asarray(test_ds.x), np.asarray(test_ds.y))

    study = Study(seed=seed, sampler=sampler)

    def objective(trial: Trial) -> float:
        model = build_cccnn(
            trial, channels, search_pairs=search_pairs, w=w
        )
        # adam: the head's dense gradients and the conv stack's differ by
        # ~2 orders of magnitude; uniform-LR SGD (the reference's LCCCNN
        # recipe, model.py:606-614) plateaus orders of magnitude higher
        lr = trial.suggest_float("lr", 3e-4, 1e-2, log=True)
        cfg = TrainConfig(
            lr=lr,
            num_epochs=num_epochs,
            min_epochs=min_epochs,
            patience=patience,
            loss="l1",
            seed=seed + trial.number,
            optimizer="adam",
        )
        trainer = Trainer(
            model,
            cfg,
            optimizer=make_optimizer(
                "adam", lr, schedule="cosine", schedule_period=100,
            ),
            mesh=mesh,
        )
        # pruning checkpoints every 10% of the budget; training CONTINUES
        # across chunks (state threaded through), and each chunk runs as
        # one scanned device dispatch — per-epoch host syncs would dominate
        # on a remote TPU
        chunk = max(num_epochs // 10, 1)
        state = None
        for step in range(10):
            state = trainer.fit(
                train, val, num_epochs=chunk, state=state,
                epochs_per_step=chunk,
            )
            monitor = trainer.history["val_loss"][-1]
            trial.report(monitor, step)
            if trial.should_prune():
                raise TrialPruned()
        # hyperparameter selection must never see the test set: the
        # objective (what Study minimizes / best_params selects on) is the
        # VAL metric; the TEST metric rides along as a user attr and is
        # reported for the selected trial only
        trial.set_user_attr("test_l1", trainer.test(state, test))
        return trainer.test(state, val)

    study.optimize(objective, n_trials=n_trials, catch=(RuntimeError,))
    return study


if __name__ == "__main__":  # pragma: no cover - CLI
    folder, name = sys.argv[1], sys.argv[2]
    study = run_location_hpo(folder, name)
    print("best val L1:", study.best_value)
    print("test L1 of selected trial:",
          study.best_trial.user_attrs.get("test_l1"))
    print("best params:", study.best_params)
