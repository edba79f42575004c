"""FCNN: configurable MLP mapping lag vectors → hit coordinates.

flax.linen re-design of the reference's torch FCNN (reference:
calibration.py:463-560): hidden sizes, activation, optional batch-norm /
dropout, near-identity ("eye") initialization, L2 penalty helper, and a
``call_np`` single-example inference path used by the realtime locator
(multilateration.py:555-557).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

ACTIVATIONS: dict[str, Callable] = {
    "relu": nn.relu,
    "silu": nn.silu,
    "leakyrelu": nn.leaky_relu,
    "elu": nn.elu,
    "tanh": jnp.tanh,
    "sigmoid": nn.sigmoid,
}


def _eye_init(noise_floor: float):
    def init(key, shape, dtype=jnp.float32):
        eye = jnp.eye(shape[0], shape[1], dtype=dtype)
        return eye + noise_floor * jax.random.normal(key, shape, dtype)

    return init


class FCNN(nn.Module):
    """MLP with per-layer (Dense → BatchNorm → act → Dropout) blocks."""

    output_size: int = 2
    hidden_layers: Sequence[int] = (10, 10, 10)
    activation: str = "relu"
    dropout: float = 0.0
    batch_norm: bool = True
    l2_reg: float = 0.0
    eye_init: bool = False
    eye_noise_floor: float = 0.01
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = ACTIVATIONS[self.activation]
        kinit = (
            _eye_init(self.eye_noise_floor)
            if self.eye_init
            else nn.initializers.lecun_normal()
        )
        for width in self.hidden_layers:
            x = nn.Dense(width, use_bias=self.bias, kernel_init=kinit)(x)
            if self.batch_norm:
                x = nn.BatchNorm(use_running_average=not train)(x)
            x = act(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.output_size, use_bias=self.bias, kernel_init=kinit)(x)

    def l2_loss(self, params) -> jnp.ndarray:
        """L2 penalty over all parameters (calibration.py:529-542)."""
        if self.l2_reg == 0.0:
            return jnp.zeros(())
        sq = jax.tree.map(lambda p: jnp.sum(p**2), params)
        return self.l2_reg * jax.tree.reduce(jnp.add, sq)


class FCNNBundle:
    """Model + variables with a jitted single/batch inference path.

    Provides ``call_np`` with the reference's contract
    (calibration.py:552-560): a tuple/array of lags in, a numpy coordinate
    prediction out — used inside the serve loop's trilateration bypass.
    """

    def __init__(self, model: FCNN, variables: dict):
        self.model = model
        self.variables = variables
        self._apply = jax.jit(
            lambda v, x: model.apply(v, x, train=False)
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._apply(self.variables, x)

    def call_np(self, lags) -> np.ndarray:
        x = jnp.asarray([lags], dtype=jnp.float32)
        return np.asarray(self._apply(self.variables, x))[0]
