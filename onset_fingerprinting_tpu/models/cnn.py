"""CNN regression/classification model for onset windows.

flax.linen re-design of the reference's Lightning CNN (reference:
model.py:52-165): configurable Conv1d stack (+activation, optional
batch-norm, optional max-pool) → dropout → flat dense head.  Inputs follow
the reference layout ``[B, C, L]`` (channels = sensors).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from onset_fingerprinting_tpu.models.fcnn import ACTIVATIONS


class CNN(nn.Module):
    output_size: int = 2
    layer_sizes: Sequence[int] = (8, 16)
    kernel_size: int = 3
    dropout_rate: float = 0.5
    batch_norm: bool = False
    pool: bool = False
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    activation: str = "silu"
    #: compute dtype for conv/dense (params stay f32); bfloat16 targets the
    #: MXU on TPU
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = ACTIVATIONS[self.activation]
        x = jnp.swapaxes(x, 1, 2)  # [B, L, C] for flax convs
        for width in self.layer_sizes:
            x = nn.Conv(
                features=width,
                kernel_size=(self.kernel_size,),
                padding=self.padding,
                kernel_dilation=(self.dilation,),
                feature_group_count=self.groups,
                dtype=self.dtype,
            )(x)
            x = act(x)
            if self.batch_norm:
                x = nn.BatchNorm(use_running_average=not train)(x)
            if self.pool:
                x = nn.max_pool(x, window_shape=(2,), strides=(2,))
        x = x.reshape(x.shape[0], -1)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        out = nn.Dense(self.output_size, dtype=self.dtype)(x)
        return out.astype(jnp.float32)
