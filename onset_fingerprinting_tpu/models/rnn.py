"""Recurrent models: RNN (GRU/LSTM + attention) and CNNRNN hybrid.

flax.linen re-designs of the reference's Lightning RNN/CNNRNN (reference:
model.py:168-440): recurrent stack → LayerNorm → multi-head self-attention →
mean-pool → dense head, with the optional shared-weight adjacent-channel-pair
mode (model.py:255-261).  Recurrences run as ``nn.RNN`` (lax.scan under jit);
attention and dense layers land on the MXU.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from onset_fingerprinting_tpu.models.fcnn import ACTIVATIONS

_CELLS = {"GRU": nn.GRUCell, "LSTM": nn.OptimizedLSTMCell, "RNN": nn.SimpleCell}


class RNN(nn.Module):
    output_size: int = 2
    hidden_size: int = 64
    num_layers: int = 2
    dropout_rate: float = 0.5
    rnn_type: str = "GRU"
    bidirectional: bool = False
    num_heads: int = 2
    share_input_weights: bool = False
    permute_input: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.permute_input:
            x = jnp.swapaxes(x, 1, 2)  # [B, L, C]

        # build the recurrent stack once so the shared-weights mode reuses
        # the same module instances for every channel pair
        cell = _CELLS[self.rnn_type]
        layers = []
        for i in range(self.num_layers):
            fwd = nn.RNN(cell(features=self.hidden_size), name=f"rnn_l{i}")
            bwd = (
                nn.RNN(
                    cell(features=self.hidden_size),
                    reverse=True,
                    keep_order=True,
                    name=f"rnn_l{i}_rev",
                )
                if self.bidirectional
                else None
            )
            layers.append((fwd, bwd))

        def run_stack(inp):
            h = inp
            for i, (fwd, bwd) in enumerate(layers):
                out = fwd(h)
                if bwd is not None:
                    out = jnp.concatenate([out, bwd(h)], axis=-1)
                if i + 1 < self.num_layers and self.dropout_rate > 0:
                    out = nn.Dropout(
                        self.dropout_rate, deterministic=not train
                    )(out)
                h = out
            return h

        if not self.share_input_weights:
            out = run_stack(x)
        else:
            channels = x.shape[-1]
            outs = [
                run_stack(x[..., i : i + 2]) for i in range(channels - 1)
            ]
            out = jnp.concatenate(outs, axis=-1)
        # torch-parity eps (nn.LayerNorm default 1e-5; flax's 1e-6 shifts
        # low-variance post-RNN activations by ~1e-3 — matters for
        # reference checkpoint imports, models/torch_import.py)
        out = nn.LayerNorm(epsilon=1e-5)(out)
        out = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout_rate,
            deterministic=not train,
        )(out, out)
        return nn.Dense(self.output_size)(out.mean(axis=1))


class CNNRNN(nn.Module):
    """Conv stack → GRU over feature maps → attention → dense
    (model.py:310-440).  As in the reference, the GRU treats conv *channels*
    as the sequence axis with the conv length as features."""

    output_size: int = 2
    layer_sizes: Sequence[int] = (8, 16)
    kernel_size: int = 3
    dropout_rate: float = 0.5
    n_hidden: int = 64
    batch_norm: bool = False
    pool: bool = False
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    activation: str = "silu"
    num_heads: int = 2
    #: stacked GRU layers over the feature-map sequence (model.py:373-379)
    n_rnn_layers: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = ACTIVATIONS[self.activation]
        h = jnp.swapaxes(x, 1, 2)  # [B, L, C]
        for width in self.layer_sizes:
            h = nn.Conv(
                features=width,
                kernel_size=(self.kernel_size,),
                padding=self.padding,
                kernel_dilation=(self.dilation,),
                feature_group_count=self.groups,
            )(h)
            h = act(h)
            if self.batch_norm:
                h = nn.BatchNorm(use_running_average=not train)(h)
            if self.pool:
                h = nn.max_pool(h, window_shape=(2,), strides=(2,))
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        # [B, L', K] → sequence over feature maps K, features = conv length L'
        h = jnp.swapaxes(h, 1, 2)
        for i in range(self.n_rnn_layers):
            h = nn.RNN(nn.GRUCell(features=self.n_hidden))(h)
            # torch nn.GRU applies dropout between stacked layers only
            if i + 1 < self.n_rnn_layers and self.dropout_rate > 0:
                h = nn.Dropout(
                    self.dropout_rate, deterministic=not train
                )(h)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout_rate,
            deterministic=not train,
        )(h, h)
        return nn.Dense(self.output_size)(h.mean(axis=1))
