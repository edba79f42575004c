"""CNN checkpoint migration + T6 paired_xcorr parity vs the reference.

Builds the reference's ACTUAL torch CNN (model.py:52-165, loaded live via
tests/ref_harness), converts its state_dict with
``models/torch_import.cnn_variables_from_state_dict``, and requires
eval-output parity — including the fc-head layout permutation between
torch's channel-major flatten and flax's position-major flatten.

Also pins ``models/cccnn.paired_xcorr`` (T6) against the reference's
grouped-conv implementation (model.py:12-45) on identical feature maps.
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
    return load_model(tmp_path_factory.mktemp("refmodel_cnn"))


CONFIGS = [
    (dict(layer_sizes=[6, 8], kernel_size=3), "plain"),
    (dict(layer_sizes=[6, 8], kernel_size=3, batch_norm=True), "batchnorm"),
    (dict(layer_sizes=[6, 8], kernel_size=5, pool=True, padding=2), "pool"),
    (dict(layer_sizes=[6, 8], kernel_size=3, dilation=2, padding=2),
     "dilated"),
    (dict(layer_sizes=[6, 8], kernel_size=3, groups=2), "grouped"),
]


@pytest.mark.parametrize(
    "extra_args", [c[0] for c in CONFIGS], ids=[c[1] for c in CONFIGS]
)
def test_cnn_import_eval_parity(ref_model, extra_args):
    import jax.numpy as jnp
    import torch

    from onset_fingerprinting_tpu.models.torch_import import (
        cnn_from_model_args,
        cnn_variables_from_state_dict,
    )

    w, c = 48, 4
    model_args = dict(
        input_size=w, output_size=3, channels=c, dropout_rate=0.0,
        **extra_args,
    )
    torch.manual_seed(0)
    tm = ref_model.CNN(**model_args)
    tm.eval()
    # exercise non-trivial BatchNorm running stats, not the 0/1 init
    if extra_args.get("batch_norm"):
        tm.train()
        with torch.no_grad():
            tm(torch.randn(32, c, w))
        tm.eval()

    flax_model = cnn_from_model_args({**model_args, "activation": "silu"})
    variables = cnn_variables_from_state_dict(
        tm.state_dict(), flax_model, input_size=w, channels=c
    )

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (5, c, w)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(
        flax_model.apply(variables, jnp.asarray(x), train=False)
    )
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


def test_cnn_import_rejects_fc_shape_mismatch(ref_model):
    import torch

    from onset_fingerprinting_tpu.models.torch_import import (
        cnn_from_model_args,
        cnn_variables_from_state_dict,
    )

    model_args = dict(
        input_size=48, output_size=3, channels=4, dropout_rate=0.0,
        layer_sizes=[6, 8], kernel_size=3,
    )
    torch.manual_seed(1)
    tm = ref_model.CNN(**model_args)
    flax_model = cnn_from_model_args({**model_args, "activation": "silu"})
    with pytest.raises(ValueError, match="conv arithmetic"):
        cnn_variables_from_state_dict(
            tm.state_dict(), flax_model, input_size=64, channels=4
        )


def test_paired_xcorr_matches_reference(ref_model):
    import jax.numpy as jnp
    import torch

    from onset_fingerprinting_tpu.models.cccnn import paired_xcorr

    rng = np.random.default_rng(2)
    b, c, k, v = 3, 4, 5, 33
    x = rng.normal(0, 1, (b, c * k, v)).astype(np.float32)
    ref = ref_model.paired_xcorr(torch.from_numpy(x), c, k).numpy()
    ours = np.asarray(paired_xcorr(jnp.asarray(x), c, k))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
