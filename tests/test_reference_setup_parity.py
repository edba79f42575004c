"""Serve-setup migration parity: the REFERENCE writes the setup dir.

The torch-import tests (tests/test_torch_import.py) prove checkpoint
conversion against state_dicts assembled to the reference's layout; this
module closes the remaining file-level gap by having the reference's own
``realtime/config.py::save_setup`` (loaded live, tests/ref_harness) write
the artifact — ``ml_conf.json`` + ``torch.save(model.state_dict())`` —
and requiring that our ``realtime.setup_io.load_setup``:

- reads the directory transparently (the migration contract in
  docs/MIGRATION.md), and
- serves the SAME predictions as the reference's own ``load_setup``
  round-trip of the same directory (eval parity ≤ 1e-5), across the
  activation variants the reference's loader special-cases
  (config.py:96-105) and batch-norm running stats.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ref_harness import load_rt_config, reference_available, skip_reason


@pytest.fixture(scope="module")
def ref_rt(tmp_path_factory):
    if not reference_available():
        pytest.skip(skip_reason())
    pytest.importorskip("torch")
    return load_rt_config(tmp_path_factory.mktemp("refrt"))


SENSORS = [[0.9, 0.0], [0.9, 120.0], [0.9, 240.0]]


def _reference_saved_dir(ref_rt, path, model_args):
    """Have the reference build + save a setup exactly as its notebooks do
    (construct FCNN with the torch activation class, persist with the
    STRING in model_args — the convention its own load_setup decodes)."""
    import torch

    targs = dict(model_args)
    targs["activation"] = {
        "relu": torch.nn.ReLU,
        "silu": torch.nn.SiLU,
        "leakyrelu": torch.nn.LeakyReLU,
        "elu": torch.nn.ELU,
    }[targs["activation"]]
    tmodel = ref_rt.FCNN(**targs)
    # drift the batch-norm running stats away from init so eval parity
    # actually exercises them
    tmodel.train()
    with torch.no_grad():
        for _ in range(3):
            tmodel(torch.randn(32, model_args["input_size"]))
    tmodel.eval()
    ref_rt.save_setup(SENSORS, "drumhead", 82.0, tmodel, model_args, path)


@pytest.mark.parametrize(
    "model_args",
    [
        dict(
            input_size=2, output_size=2, hidden_layers=[12, 8],
            activation="silu", batch_norm=True,
        ),
        dict(
            input_size=2, output_size=2, hidden_layers=[10],
            activation="leakyrelu", batch_norm=False, bias=False,
        ),
    ],
    ids=["silu-bn", "leakyrelu-nobias"],
)
def test_reference_saved_setup_serves_identically(
    ref_rt, tmp_path, model_args
):
    import torch

    from onset_fingerprinting_tpu.realtime.setup_io import load_setup

    _reference_saved_dir(ref_rt, tmp_path, model_args)

    conf_ref, model_ref = ref_rt.load_setup(tmp_path)
    conf_ours, bundle = load_setup(tmp_path)

    np.testing.assert_allclose(
        conf_ours["sensor_locations"], conf_ref["sensor_locations"]
    )
    assert conf_ours["medium"] == "drumhead"
    assert conf_ours["c"] == 82.0
    assert bundle is not None

    lags = np.random.default_rng(0).normal(0, 1.0, (16, 2)).astype(
        np.float32
    )
    with torch.no_grad():
        ref_pred = model_ref(torch.from_numpy(lags)).numpy()
    ours_pred = np.asarray(bundle(lags))
    np.testing.assert_allclose(ours_pred, ref_pred, atol=1e-5, rtol=1e-4)
    # the per-hit serve entry point too (reference call_np contract,
    # calibration.py:552-560)
    np.testing.assert_allclose(
        bundle.call_np(lags[0]), ref_pred[0], atol=1e-5, rtol=1e-4
    )


def test_c_override_matches_reference(ref_rt, tmp_path):
    """Both loaders honor the ``c=`` override (config.py:90-92)."""
    from onset_fingerprinting_tpu.realtime.setup_io import load_setup

    model_args = dict(
        input_size=2, output_size=2, hidden_layers=[6], activation="relu",
        batch_norm=False,
    )
    _reference_saved_dir(ref_rt, tmp_path, model_args)
    conf_ref, _ = ref_rt.load_setup(tmp_path, c=343.0)
    conf_ours, _ = load_setup(tmp_path, c=343.0)
    assert conf_ours["c"] == conf_ref["c"] == 343.0
