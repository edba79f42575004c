"""RNN checkpoint migration: reference torch weights → flax, eval parity.

Builds the reference's ACTUAL torch RNN (model.py:168-307, loaded live via
tests/ref_harness), converts its state_dict with
``models/torch_import.rnn_variables_from_state_dict`` (fused GRU/LSTM/RNN
gate splitting, two-bias folding, attention q/k/v head reshaping), and
requires eval-output parity on identical inputs.
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
    return load_model(tmp_path_factory.mktemp("refmodel_rnn"))


CONFIGS = [
    (dict(rnn_type="GRU"), "gru"),
    (dict(rnn_type="LSTM"), "lstm"),
    (dict(rnn_type="RNN"), "tanh-rnn"),
    (dict(rnn_type="GRU", bidirectional=True), "bigru"),
    (dict(rnn_type="GRU", num_layers=1, bias=False), "no-bias"),
    (dict(rnn_type="GRU", share_input_weights=True), "shared-pairs"),
]


@pytest.mark.parametrize(
    "extra_args", [c[0] for c in CONFIGS], ids=[c[1] for c in CONFIGS]
)
def test_rnn_import_eval_parity(ref_model, extra_args):
    import jax.numpy as jnp
    import torch

    from onset_fingerprinting_tpu.models.torch_import import (
        rnn_from_model_args,
        rnn_variables_from_state_dict,
    )

    w, c = 24, 3
    model_args = {
        **dict(
            input_size=w, output_size=2, channels=c, hidden_size=8,
            num_layers=2, num_heads=2, dropout_rate=0.0,
        ),
        **extra_args,
    }
    torch.manual_seed(0)
    tm = ref_model.RNN(**model_args)
    tm.eval()

    flax_model = rnn_from_model_args(model_args)
    variables = rnn_variables_from_state_dict(tm.state_dict(), flax_model)

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (4, c, w)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(
        flax_model.apply(variables, jnp.asarray(x), train=False)
    )
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-4)


def test_rnn_import_rejects_layer_mismatch(ref_model):
    import torch

    from onset_fingerprinting_tpu.models.rnn import RNN
    from onset_fingerprinting_tpu.models.torch_import import (
        rnn_variables_from_state_dict,
    )

    torch.manual_seed(1)
    tm = ref_model.RNN(
        input_size=24, output_size=2, channels=3, hidden_size=8,
        num_layers=2, num_heads=2, dropout_rate=0.0,
    )
    with pytest.raises(ValueError, match="num_layers"):
        rnn_variables_from_state_dict(
            tm.state_dict(),
            RNN(output_size=2, hidden_size=8, num_layers=3, num_heads=2),
        )
    with pytest.raises(ValueError, match="unconsumed"):
        rnn_variables_from_state_dict(
            tm.state_dict(),
            RNN(output_size=2, hidden_size=8, num_layers=1, num_heads=2),
        )


CNNRNN_CONFIGS = [
    (dict(), "plain"),
    (dict(batch_norm=True), "batchnorm"),
    (dict(pool=True, n_rnn_layers=2), "pool-2rnn"),
]


@pytest.mark.parametrize(
    "extra_args",
    [c[0] for c in CNNRNN_CONFIGS],
    ids=[c[1] for c in CNNRNN_CONFIGS],
)
def test_cnnrnn_import_eval_parity(ref_model, extra_args):
    import jax.numpy as jnp
    import torch

    from onset_fingerprinting_tpu.models.torch_import import (
        cnnrnn_from_model_args,
        cnnrnn_variables_from_state_dict,
    )

    w, c = 32, 3
    model_args = {
        **dict(
            input_size=w, output_size=2, channels=c, layer_sizes=[4, 6],
            kernel_size=3, n_hidden=8, dropout_rate=0.0,
        ),
        **extra_args,
    }
    torch.manual_seed(3)
    tm = ref_model.CNNRNN(**model_args)
    tm.eval()
    if extra_args.get("batch_norm"):
        tm.train()
        with torch.no_grad():
            tm(torch.randn(32, c, w))
        tm.eval()

    flax_model = cnnrnn_from_model_args({**model_args, "activation": "silu"})
    variables = cnnrnn_variables_from_state_dict(tm.state_dict(), flax_model)

    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (4, c, w)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x)).numpy()
    ours = np.asarray(
        flax_model.apply(variables, jnp.asarray(x), train=False)
    )
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-4)
