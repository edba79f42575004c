"""CCCNN checkpoint migration: reference torch weights → flax, eval parity.

The reference's training pipeline (train.py) produces CCCNN/LCCCNN torch
checkpoints (model.py:443-629).  ``models/torch_import.py`` converts their
state_dicts onto our flax CCCNN so migrating users keep trained
fingerprint models.  These tests build the reference's ACTUAL torch CCCNN
(tests/ref_harness loads model.py live), convert its weights, and require
eval-output parity on identical inputs — which simultaneously closes the
BASELINE.md "class logits match reference CPU goldens" target for the
flagship model family.

torch (CPU) is baked into the image; tests skip without the reference
checkout.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ref_harness import load_model, reference_available, skip_reason


@pytest.fixture(scope="module")
def ref_model(tmp_path_factory):
    if not reference_available():
        pytest.skip(skip_reason())
    pytest.importorskip("torch")
    return load_model(tmp_path_factory.mktemp("refmodel"))


CONFIGS = [
    # (model_args, label)
    (dict(layer_sizes=[4, 6], kernel_sizes=3), "plain"),
    (dict(layer_sizes=[4, 6], kernel_sizes=[3, 5], batch_norm=True),
     "groupnorm"),
    (dict(layer_sizes=[4], kernel_sizes=7, pool=True, padding=2), "pool"),
    (dict(layer_sizes=[3, 4], kernel_sizes=3, strides=[1, 2]), "strided"),
    # grouped formulation: independent per-channel conv weights
    # (model.py:487-494)
    (dict(layer_sizes=[4, 6], kernel_sizes=3, group=True), "grouped"),
    # the round-3 refusal case, now convertible: the reference's ONE
    # GroupNorm spans all C*K grouped features jointly (model.py:502) and
    # the flax group path normalizes the same joint set
    (dict(layer_sizes=[4, 6], kernel_sizes=3, group=True, batch_norm=True),
     "grouped_joint_norm"),
]


@pytest.mark.parametrize(
    "extra_args", [c[0] for c in CONFIGS], ids=[c[1] for c in CONFIGS]
)
def test_cccnn_import_eval_parity(ref_model, extra_args):
    import jax.numpy as jnp
    import torch

    from onset_fingerprinting_tpu.models.torch_import import (
        cccnn_from_model_args,
        cccnn_variables_from_state_dict,
    )

    w, c = 64, 3
    model_args = dict(
        input_size=w, output_size=2, channels=c, dropout_rate=0.0,
        **extra_args,
    )
    torch.manual_seed(0)
    tm = ref_model.CCCNN(**model_args)
    tm.eval()

    flax_model = cccnn_from_model_args(
        {**model_args, "activation": "silu"}
    )
    variables = cccnn_variables_from_state_dict(tm.state_dict(), flax_model)

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (4, c, w)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(
        flax_model.apply(variables, jnp.asarray(x), train=False)
    )
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


def test_cccnn_import_lccnn_prefix(ref_model):
    """Lightning-wrapper state_dicts (``model.``-prefixed keys) convert
    identically."""
    import jax.numpy as jnp
    import torch

    from onset_fingerprinting_tpu.models.torch_import import (
        cccnn_from_model_args,
        cccnn_variables_from_state_dict,
    )

    w, c = 64, 3
    model_args = dict(
        input_size=w, output_size=2, channels=c, dropout_rate=0.0,
        layer_sizes=[4, 6], kernel_sizes=3,
    )
    torch.manual_seed(1)
    tm = ref_model.CCCNN(**model_args)
    tm.eval()
    wrapped = {f"model.{k}": v for k, v in tm.state_dict().items()}

    flax_model = cccnn_from_model_args(
        {**model_args, "activation": "silu"}
    )
    variables = cccnn_variables_from_state_dict(wrapped, flax_model)

    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (2, c, w)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(
        flax_model.apply(variables, jnp.asarray(x), train=False)
    )
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


def test_cccnn_import_rejects_mismatches(ref_model):
    import torch

    from onset_fingerprinting_tpu.models.cccnn import CCCNN
    from onset_fingerprinting_tpu.models.torch_import import (
        cccnn_variables_from_state_dict,
    )

    torch.manual_seed(2)
    tm = ref_model.CCCNN(
        input_size=64, output_size=2, channels=3, layer_sizes=[4, 6],
        kernel_sizes=3, dropout_rate=0.0,
    )
    sd = tm.state_dict()

    # wrong depth
    with pytest.raises(ValueError, match="conv"):
        cccnn_variables_from_state_dict(
            sd, CCCNN(output_size=2, channels=3, layer_sizes=(4,),
                      kernel_sizes=3)
        )
    # wrong width
    with pytest.raises(ValueError, match="output features"):
        cccnn_variables_from_state_dict(
            sd, CCCNN(output_size=2, channels=3, layer_sizes=(4, 8),
                      kernel_sizes=3)
        )
    # batch_norm flag mismatch
    with pytest.raises(ValueError, match="norm"):
        cccnn_variables_from_state_dict(
            sd, CCCNN(output_size=2, channels=3, layer_sizes=(4, 6),
                      kernel_sizes=3, batch_norm=True)
        )
    # a group=False checkpoint cannot land on a group=True model: grouped
    # convs are channels-times wider (out = layer_size * channels)
    with pytest.raises(ValueError, match="grouped channels"):
        cccnn_variables_from_state_dict(
            sd, CCCNN(output_size=2, channels=3, layer_sizes=(4, 6),
                      kernel_sizes=3, group=True)
        )
    # the redesigned head cannot host a reference checkpoint
    with pytest.raises(ValueError, match="cc_norm"):
        cccnn_variables_from_state_dict(
            sd, CCCNN(output_size=2, channels=3, layer_sizes=(4, 6),
                      kernel_sizes=3, cc_norm=True)
        )
    # garbage keys fail loudly
    with pytest.raises(ValueError, match="unrecognized"):
        cccnn_variables_from_state_dict(
            {**sd, "banana.weight": np.zeros(3)},
            CCCNN(output_size=2, channels=3, layer_sizes=(4, 6),
                  kernel_sizes=3),
        )
