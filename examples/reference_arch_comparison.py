"""VERDICT r3 #8: reference-architecture CCCNN vs the native head on the
SAME modal-drum fixture — is ~0.6 cm the architecture's ceiling?

`examples/fingerprint_capability_demo.py` measures the native `cc_norm`
CCCNN at ~0.63 cm while the lag-FCNN reaches ~0.14 cm on the same 768
hits.  This script answers whether the REFERENCE's own torch CCCNN
(model.py:443-538, the raw-CC softmax head, trained with LCCCNN's exact
recipe: SGD lr*100 momentum 0.8 wd 1e-3 + CosineAnnealingLR(100),
model.py:606-629) would do better on the identical fixture — "run it both
ways" with the importer:

1. the reference's torch CCCNN is loaded LIVE from /root/reference (same
   oracle loader the parity suite uses — never vendored), trained with its
   own recipe on the fixture's train split, and evaluated on the test
   split in torch;
2. its trained state_dict is converted to flax
   (models/torch_import.py::cccnn_variables_from_state_dict) and the
   native eval must match torch to ~1e-4 — the migration claim, proven on
   a TRAINED artifact, not just random weights;
3. the native CCCNN with the reference head (cc_norm=False,
   batch_norm=True — bit-for-bit the same architecture) trains with the
   same recipe on the accelerator;
4. the native `cc_norm` head (the redesigned serving head) trains with
   the capability demo's recipe.

Also records the torch model's per-parameter-group gradient magnitudes at
initialization: the round-3 analysis found the raw-CC softmax saturates
one-hot (lag 0 sits ~V·K above every other lag), starving the conv stack
of gradient — this prints the same diagnosis from the reference's own
autograd.

Run: python examples/reference_arch_comparison.py [--hits 768]
     [--epochs-torch 600] [--epochs 2000]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np

if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

SR = 96000
W = 256


def l1_cm(pred, y) -> float:
    return float(np.mean(np.abs(np.asarray(pred) - np.asarray(y))))


def make_fixture(n_hits: int):
    """The capability demo's exact fixture and split protocol."""
    from onset_fingerprinting_tpu.data.datasets import MCPOSD
    from onset_fingerprinting_tpu.data.synth import synth_location_session

    with tempfile.TemporaryDirectory() as td:
        folder = Path(td)
        synth_location_session(folder, n_hits=n_hits, sr=SR, seed=0)
        full_ds = MCPOSD.from_file(folder, "combined0", W, 8, 16, 4)
        train_ds, eval_ds = full_ds.split_hits(0.75, seed=1)
        xt, yt = train_ds[0]
        val_ds, test_ds = eval_ds.split(0.5, seed=1)
        return (
            np.asarray(xt), np.asarray(yt),
            (np.asarray(val_ds.x), np.asarray(val_ds.y)),
            (np.asarray(test_ds.x), np.asarray(test_ds.y)),
        )


REF_ARGS = dict(  # train.py:79-90, the reference's flagship configuration
    output_size=2,
    channels=4,
    layer_sizes=[5] * 7,
    kernel_sizes=[1, 33, 64, 15, 15, 15, 1],
    dropout_rate=0.0,
    batch_norm=True,
    group=False,
)


def train_reference_torch(x_train, y_train, val, test, epochs: int):
    """The reference's own torch CCCNN + LCCCNN recipe, run live."""
    import torch
    import torch.nn.functional as F

    import ref_harness

    with tempfile.TemporaryDirectory() as td:
        ref_model = ref_harness.load_model(Path(td))
    torch.manual_seed(0)
    m = ref_model.CCCNN(W, **REF_ARGS)
    xt = torch.from_numpy(x_train.astype(np.float32))
    yt = torch.from_numpy(y_train.astype(np.float32))
    xv = torch.from_numpy(val[0].astype(np.float32))
    yv = torch.from_numpy(val[1].astype(np.float32))

    # gradient anatomy at init: conv stack vs fc head (the degenerate-head
    # evidence, from the reference's own autograd)
    loss = F.l1_loss(m(xt[:256]), yt[:256])
    loss.backward()
    conv_g = max(
        p.grad.abs().max().item()
        for n, p in m.named_parameters()
        if n.startswith("conv_layers.conv") and p.grad is not None
    )
    fc_g = m.fc.weight.grad.abs().max().item()
    print(f"torch grad anatomy at init: max|conv grad| {conv_g:.3e}, "
          f"max|fc grad| {fc_g:.3e} (ratio {conv_g / fc_g:.2e})",
          flush=True)
    m.zero_grad()

    # LCCCNN.configure_optimizers (model.py:606-629): lr arg 0.001 -> SGD
    # lr 0.1, momentum 0.8, weight_decay 1e-3, CosineAnnealingLR(100)
    opt = torch.optim.SGD(
        m.parameters(), lr=0.1, momentum=0.8, weight_decay=1e-3
    )
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, 100)
    best_val, best_state = np.inf, None
    t0 = time.perf_counter()
    for ep in range(epochs):
        m.train()
        opt.zero_grad()
        loss = F.l1_loss(m(xt), yt)
        loss.backward()
        opt.step()
        sched.step()
        if ep % 10 == 0 or ep == epochs - 1:
            m.eval()
            with torch.no_grad():
                vl = F.l1_loss(m(xv), yv).item()
            if vl < best_val:
                best_val = vl
                best_state = {
                    k: v.detach().clone() for k, v in m.state_dict().items()
                }
        if ep % 100 == 0:
            print(f"  torch epoch {ep}: train {loss.item():.4f} "
                  f"val {best_val:.4f} ({time.perf_counter() - t0:.0f}s)",
                  flush=True)
    m.load_state_dict(best_state)
    m.eval()
    with torch.no_grad():
        test_pred = m(torch.from_numpy(test[0].astype(np.float32))).numpy()
    return m, best_state, l1_cm(test_pred, test[1]), test_pred


def imported_native_eval(state_dict, test):
    """Trained torch checkpoint -> flax, eval on the same test split."""
    import jax.numpy as jnp

    from onset_fingerprinting_tpu.models.torch_import import (
        cccnn_from_model_args,
        cccnn_variables_from_state_dict,
    )

    sd = {k: v.numpy() for k, v in state_dict.items()}
    model = cccnn_from_model_args(dict(input_size=W, **REF_ARGS))
    variables = cccnn_variables_from_state_dict(sd, model)
    pred = np.asarray(
        model.apply(variables, jnp.asarray(test[0], jnp.float32),
                    train=False)
    )
    return l1_cm(pred, test[1]), pred


def train_native(x_train, y_train, val, test, epochs: int,
                 reference_head: bool):
    """Native CCCNN — reference head + reference recipe, or the cc_norm
    head + the capability demo's recipe."""
    from onset_fingerprinting_tpu.core.config import TrainConfig
    from onset_fingerprinting_tpu.models.cccnn import CCCNN
    from onset_fingerprinting_tpu.models.train import Trainer, make_optimizer

    if reference_head:
        model = CCCNN(activation="silu", **{
            k: (tuple(v) if isinstance(v, list) else v)
            for k, v in dict(input_size=None, **REF_ARGS).items()
            if k != "input_size"
        })
        opt = make_optimizer("sgd", 0.1, schedule="cosine",
                             schedule_period=100, weight_decay=1e-3,
                             momentum=0.8)
        lr = 0.1
    else:
        from onset_fingerprinting_tpu.models.experiment import build_cccnn

        model = build_cccnn(None, channels=4)
        lr = 3e-3
        opt = make_optimizer("adam", lr, schedule="cosine",
                             schedule_period=100)
    cfg = TrainConfig(lr=lr, num_epochs=epochs, min_epochs=0,
                      patience=epochs, loss="l1", seed=0)
    trainer = Trainer(model, cfg, optimizer=opt)
    state = trainer.fit((x_train, y_train), val,
                        epochs_per_step=max(epochs // 10, 1))
    return trainer.test(state, test)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--hits", type=int, default=768)
    ap.add_argument("--epochs-torch", type=int, default=600,
                    help="torch runs on host CPU — budget accordingly")
    ap.add_argument("--epochs", type=int, default=2000)
    args = ap.parse_args()

    from onset_fingerprinting_tpu.core.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    t0 = time.perf_counter()
    x_train, y_train, val, test = make_fixture(args.hits)
    mean_err = l1_cm(np.broadcast_to(y_train.mean(0), test[1].shape),
                     test[1])
    print(f"fixture: train {x_train.shape} val {val[0].shape} "
          f"test {test[0].shape} ({time.perf_counter() - t0:.0f}s); "
          f"predict-mean floor {mean_err:.3f} cm", flush=True)

    _, sd, torch_err, torch_pred = train_reference_torch(
        x_train, y_train, val, test, args.epochs_torch
    )
    print(f"reference torch CCCNN (own recipe, {args.epochs_torch} ep): "
          f"{torch_err:.3f} cm ({time.perf_counter() - t0:.0f}s)",
          flush=True)

    import_err, import_pred = imported_native_eval(sd, test)
    parity = float(np.max(np.abs(import_pred - torch_pred)))
    print(f"imported into flax: {import_err:.3f} cm "
          f"(max |native - torch| prediction gap {parity:.2e})", flush=True)

    ref_head_err = train_native(x_train, y_train, val, test, args.epochs,
                                reference_head=True)
    print(f"native reference-head CCCNN (same arch+recipe, {args.epochs} "
          f"ep): {ref_head_err:.3f} cm ({time.perf_counter() - t0:.0f}s)",
          flush=True)

    cc_norm_err = train_native(x_train, y_train, val, test, args.epochs,
                               reference_head=False)
    print(f"native cc_norm CCCNN (redesigned head): {cc_norm_err:.3f} cm "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)

    print()
    print(f"{'model':<44}{'test L1 (cm)':>14}")
    print(f"{'predict-mean floor':<44}{mean_err:>14.3f}")
    print(f"{'reference torch CCCNN (own recipe)':<44}{torch_err:>14.3f}")
    print(f"{'  -> imported to flax (migration check)':<44}"
          f"{import_err:>14.3f}")
    print(f"{'native CCCNN, reference head + recipe':<44}"
          f"{ref_head_err:>14.3f}")
    print(f"{'native CCCNN, cc_norm head':<44}{cc_norm_err:>14.3f}")
    print(f"total {time.perf_counter() - t0:.0f}s")

    # gates: the migration parity must hold on the TRAINED artifact, and
    # the comparison must be meaningful (native cc_norm clears the floor).
    ok = parity < 1e-3 and cc_norm_err < 0.5 * mean_err
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
