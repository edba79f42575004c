"""Reference torch-checkpoint import (models/torch_import.py).

Builds a torch MLP with the reference FCNN's exact layout (Linear →
BatchNorm1d → act → Dropout per hidden layer, final Linear — reference
calibration.py:493-519), saves it the way the reference's ``save_setup``
does (realtime/config.py:63-84: ml_conf.json + model.pt state_dict), and
checks the imported flax FCNN reproduces the torch eval-mode outputs.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from onset_fingerprinting_tpu.models.fcnn import FCNN
from onset_fingerprinting_tpu.models.torch_import import (
    fcnn_from_model_args,
    fcnn_variables_from_state_dict,
    load_reference_setup,
)
from onset_fingerprinting_tpu.realtime.setup_io import load_setup

ACTS = {
    "relu": torch.nn.ReLU,
    "silu": torch.nn.SiLU,
    "leakyrelu": torch.nn.LeakyReLU,
    "elu": torch.nn.ELU,
}


class TorchMLP(torch.nn.Module):
    """Reference-layout MLP (same Sequential composition + key names)."""

    def __init__(
        self,
        input_size,
        output_size,
        hidden_layers,
        activation="relu",
        dropout=0.0,
        batch_norm=True,
        bias=True,
    ):
        super().__init__()
        layers = []
        sizes = [input_size] + list(hidden_layers)
        for i in range(len(sizes) - 1):
            layers.append(torch.nn.Linear(sizes[i], sizes[i + 1], bias=bias))
            if batch_norm:
                layers.append(torch.nn.BatchNorm1d(sizes[i + 1]))
            layers.append(ACTS[activation]())
            if dropout > 0:
                layers.append(torch.nn.Dropout(p=dropout))
        layers.append(torch.nn.Linear(sizes[-1], output_size, bias=bias))
        self.network = torch.nn.Sequential(*layers)

    def forward(self, x):
        return self.network(x)


def _trained_torch(model, input_size, steps=3):
    """Run train-mode forwards so BatchNorm running stats are nontrivial."""
    g = torch.Generator().manual_seed(0)
    model.train()
    for _ in range(steps):
        model(torch.randn(32, input_size, generator=g) * 3.0 + 1.0)
    model.eval()
    return model


@pytest.mark.parametrize("activation", ["relu", "silu", "elu", "leakyrelu"])
def test_state_dict_roundtrip_batchnorm(activation):
    input_size, hidden = 6, [10, 8]
    tm = _trained_torch(
        TorchMLP(input_size, 2, hidden, activation=activation, dropout=0.1),
        input_size,
    )
    fcnn = FCNN(
        output_size=2, hidden_layers=tuple(hidden), activation=activation,
        dropout=0.1, batch_norm=True,
    )
    variables = fcnn_variables_from_state_dict(tm.state_dict(), fcnn)
    x = np.random.default_rng(1).normal(size=(5, input_size)).astype(
        np.float32
    )
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(fcnn.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_state_dict_roundtrip_no_bn_no_bias():
    input_size, hidden = 4, [12]
    tm = _trained_torch(
        TorchMLP(input_size, 3, hidden, batch_norm=False, bias=False),
        input_size,
    )
    fcnn = FCNN(
        output_size=3, hidden_layers=tuple(hidden), batch_norm=False,
        bias=False,
    )
    variables = fcnn_variables_from_state_dict(tm.state_dict(), fcnn)
    x = np.random.default_rng(2).normal(size=(7, input_size)).astype(
        np.float32
    )
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(fcnn.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_architecture_mismatch_raises():
    tm = TorchMLP(4, 2, [10, 10])
    fcnn = FCNN(output_size=2, hidden_layers=(10,), batch_norm=True)
    with pytest.raises(ValueError, match="Linear"):
        fcnn_variables_from_state_dict(tm.state_dict(), fcnn)


def test_load_reference_setup_dir(tmp_path: Path):
    """A directory saved the reference way loads through BOTH entry points
    (load_reference_setup and the transparent setup_io.load_setup
    fallback) and predicts identically to the torch model."""
    input_size, hidden = 3, [10, 10]
    tm = _trained_torch(
        TorchMLP(input_size, 2, hidden, activation="silu"), input_size
    )
    model_args = {
        "input_size": input_size,
        "output_size": 2,
        "hidden_layers": hidden,
        "activation": "silu",
        "dropout": 0.0,
        "batch_norm": True,
    }
    conf = {
        "sensor_locations": [[1.0, 0.0, 0.1], [0.0, 1.0, 0.1],
                             [-1.0, 0.0, 0.1], [0.0, -1.0, 0.1]],
        "medium": "drumhead",
        "c": 82.0,
        "model_args": model_args,
    }
    (tmp_path / "ml_conf.json").write_text(json.dumps(conf))
    torch.save(tm.state_dict(), tmp_path / "model.pt")

    for loader in (load_reference_setup, load_setup):
        got_conf, bundle = loader(tmp_path)
        assert got_conf["medium"] == "drumhead"
        assert got_conf["sensor_locations"].shape == (4, 3)
        lags = [1.5, -2.0, 0.25]
        with torch.no_grad():
            want = tm(torch.tensor([lags], dtype=torch.float32)).numpy()[0]
        np.testing.assert_allclose(bundle.call_np(lags), want, atol=1e-5)

    # c override, reference parity (config.py:90-92)
    got_conf, _ = load_reference_setup(tmp_path, c=110.0)
    assert got_conf["c"] == 110.0


def test_model_args_activation_class_tolerated():
    """fcnn_from_model_args accepts a conf that went through the
    reference's own load_setup (activation mutated to the class)."""
    fcnn = fcnn_from_model_args(
        {"input_size": 4, "output_size": 2, "hidden_layers": [5],
         "activation": torch.nn.SiLU}
    )
    assert fcnn.activation == "silu"


def test_model_args_activation_case_insensitive_and_validated():
    """Hand-authored capitalizations load; unknown names fail at load
    time, not with a KeyError at first inference inside the serve loop."""
    fcnn = fcnn_from_model_args({"activation": "SiLU"})
    assert fcnn.activation == "silu"
    with pytest.raises(ValueError, match="unsupported activation"):
        fcnn_from_model_args({"activation": "gelu-ish"})


def test_model_args_unknown_key_raises():
    """A typo'd model_args key must raise (reference FCNN(**args) parity),
    not silently build a default architecture."""
    with pytest.raises(TypeError):
        fcnn_from_model_args({"hidden_layer": [5, 5]})


def test_bias_presence_mismatch_raises():
    """Checkpoint trained with bias=True + model_args bias=False must fail
    loudly — flax would otherwise ignore the trained biases and serve
    wrong coordinates (torch's strict load_state_dict raises here)."""
    tm = TorchMLP(4, 2, [10], bias=True)
    fcnn = FCNN(output_size=2, hidden_layers=(10,), bias=False)
    with pytest.raises(ValueError, match="bias"):
        fcnn_variables_from_state_dict(tm.state_dict(), fcnn)
    tm = TorchMLP(4, 2, [10], bias=False)
    fcnn = FCNN(output_size=2, hidden_layers=(10,), bias=True)
    with pytest.raises(ValueError, match="bias"):
        fcnn_variables_from_state_dict(tm.state_dict(), fcnn)


def test_missing_model_pt_raises(tmp_path: Path):
    """model_args present but model.pt missing must not silently return
    model=None (the serve app would degrade to trilateration with no
    indication the calibrated model was dropped)."""
    conf = {
        "sensor_locations": [[1.0, 0.0], [0.0, 1.0]],
        "medium": "drumhead",
        "c": 82.0,
        "model_args": {"output_size": 2, "hidden_layers": [5]},
    }
    (tmp_path / "ml_conf.json").write_text(json.dumps(conf))
    with pytest.raises(FileNotFoundError, match="model_args"):
        load_reference_setup(tmp_path)
    # without model_args the same directory is a model-less setup: fine
    conf["model_args"] = None
    (tmp_path / "ml_conf.json").write_text(json.dumps(conf))
    got_conf, bundle = load_reference_setup(tmp_path)
    assert bundle is None and got_conf["c"] == 82.0


def test_load_setup_missing_any_checkpoint_raises(tmp_path: Path):
    """load_setup (the serve entry point) must ALSO fail loudly when
    model_args is set but neither model_ckpt/ nor model.pt exists —
    the raise in load_reference_setup alone was unreachable from here."""
    conf = {
        "sensor_locations": [[0.9, 0.0], [0.9, 120.0], [0.9, 240.0]],
        "medium": "air",
        "c": None,
        "model_args": {"output_size": 2, "hidden_layers": [5]},
    }
    (tmp_path / "ml_conf.json").write_text(json.dumps(conf))
    with pytest.raises(FileNotFoundError, match="model_args"):
        load_setup(tmp_path)


def test_load_setup_orbax_path_validates_activation(tmp_path: Path):
    """The orbax branch shares fcnn_from_model_args, so a bad activation
    string in ml_conf.json fails at load time (not with a KeyError at
    first inference inside the jitted serve step)."""
    conf = {
        "sensor_locations": [[0.9, 0.0], [0.9, 120.0], [0.9, 240.0]],
        "medium": "air",
        "c": None,
        "model_args": {"output_size": 2, "hidden_layers": [5],
                        "activation": "gelu-ish"},
    }
    (tmp_path / "ml_conf.json").write_text(json.dumps(conf))
    (tmp_path / "model_ckpt").mkdir()  # presence check passes
    with pytest.raises(ValueError, match="unsupported activation"):
        load_setup(tmp_path)
