"""CCCNN: learned-cross-correlation network — the flagship model family.

Re-design of the reference's CCCNN/LCCCNN (reference: model.py:443-629) and
``paired_xcorr`` op (model.py:12-45).  The reference computes per-channel
conv feature maps (vmapped or grouped), then the *self* cross-correlation of
every map through one giant grouped ``conv1d`` with B·C·K groups — an op GPUs
tolerate and TPUs hate.  Here the self-/pair-CC is a batched rFFT
correlation (``ops.xcorr.batch_full_correlate``): power-spectrum products
batched over (B, C, K), fused by XLA, no grouped-conv shape gymnastics.

Softmax over lags then produces a per-channel pseudo-TDOA distribution which
the dense head maps to hit coordinates — the learned analogue of the
lag-map locator.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from onset_fingerprinting_tpu.models.fcnn import ACTIVATIONS
from onset_fingerprinting_tpu.ops.xcorr import (
    batch_full_correlate,
    batch_self_correlate_dft,
)


def paired_xcorr(x: jnp.ndarray, C: int, K: int) -> jnp.ndarray:
    """Cross-correlate every adjacent channel pair of each feature map.

    :param x: ``[B, C*K, V]`` feature maps
    :returns: ``[B, C-1, 2V-1]`` — full CC per adjacent pair, mean over the K
        maps (reference model.py:12-45, grouped-conv trick → batched FFT).
    """
    b, ck, v = x.shape
    assert ck == C * K
    x = x.reshape(b, C, K, v)
    cc = batch_full_correlate(x[:, :-1], x[:, 1:])
    return cc.mean(axis=2)


class _ConvStack(nn.Module):
    """Shared conv feature extractor applied per channel.

    ``group=True`` mimics the reference's grouped conv (independent weights
    per channel); ``group=False`` shares one stack across channels (the
    reference's ``torch.func.vmap`` path, model.py:519).
    """

    layer_sizes: Sequence[int]
    kernel_sizes: Sequence[int]
    strides: Sequence[int]
    padding: int
    dilation: int
    batch_norm: bool
    pool: bool
    activation: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = ACTIVATIONS[self.activation]
        # x: [B', L, 1]
        for width, ks, stride in zip(
            self.layer_sizes, self.kernel_sizes, self.strides
        ):
            x = nn.Conv(
                features=width,
                kernel_size=(ks,),
                strides=(stride,),
                padding=self.padding,
                kernel_dilation=(self.dilation,),
                dtype=self.dtype,
            )(x)
            x = act(x)
            if self.batch_norm:
                # reference uses GroupNorm(1, ·) here (model.py:502)
                x = nn.GroupNorm(num_groups=1)(x)
            if self.pool:
                x = nn.max_pool(x, window_shape=(2,), strides=(2,))
        return x


class CCCNN(nn.Module):
    output_size: int = 2
    channels: int = 3
    layer_sizes: Sequence[int] = (8, 16)
    kernel_sizes: Sequence[int] | int = 3
    strides: Sequence[int] | int = 1
    dropout_rate: float = 0.5
    batch_norm: bool = False
    pool: bool = False
    padding: int = 1
    dilation: int = 1
    group: bool = False
    activation: str = "silu"
    #: compute dtype for convs/dense (params stay f32); bf16 targets the MXU
    dtype: Any = jnp.float32
    #: self-CC implementation: 'fft' (XLA FFT) or 'dft' (DFT-as-matmul on
    #: the MXU — same values to ~1e-4, ~30x faster for short signals at
    #: serving batch sizes)
    cc_impl: str = "fft"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: ``[B, C, L]`` onset windows → ``[B, output_size]``."""
        if self.cc_impl not in ("fft", "dft"):
            # a typo ('DFT', 'matmul') must not silently fall back to the
            # ~30x slower FFT path in a serving setup tuned for 'dft'
            raise ValueError(
                f"cc_impl must be 'fft' or 'dft', got {self.cc_impl!r}"
            )
        b, c, length = x.shape
        ks = (
            [self.kernel_sizes] * len(self.layer_sizes)
            if isinstance(self.kernel_sizes, int)
            else list(self.kernel_sizes)
        )
        st = (
            [self.strides] * len(self.layer_sizes)
            if isinstance(self.strides, int)
            else list(self.strides)
        )
        stack = _ConvStack(
            layer_sizes=self.layer_sizes,
            kernel_sizes=ks,
            strides=st,
            padding=self.padding,
            dilation=self.dilation,
            batch_norm=self.batch_norm,
            pool=self.pool,
            activation=self.activation,
            dtype=self.dtype,
        )
        if self.group:
            # independent weights per channel: vmap the stack over channels
            feats = nn.vmap(
                lambda mdl, xc: mdl(xc, train=train),
                in_axes=1,
                out_axes=1,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True, "dropout": True},
            )(stack, x[..., None])  # [B, C, V, K]
        else:
            # shared weights: fold channels into the batch
            flat = x.reshape(b * c, length, 1)
            feats = stack(flat, train=train)  # [B*C, V, K]
            feats = feats.reshape(b, c, *feats.shape[1:])
        feats = jnp.swapaxes(feats, 2, 3)  # [B, C, K, V]

        # self cross-correlation of every feature map, summed over maps —
        # one batched FFT/DFT instead of a B*C*K-group conv
        # (model.py:527-533).  CC runs in f32 regardless of compute dtype.
        feats = feats.astype(jnp.float32)
        if self.cc_impl == "dft":
            cc = batch_self_correlate_dft(feats).sum(axis=2)
        else:
            cc = batch_full_correlate(feats, feats).sum(axis=2)  # [B,C,2V-1]
        probs = nn.softmax(cc, axis=-1)
        probs = probs.reshape(b, -1)
        probs = nn.Dropout(self.dropout_rate, deterministic=not train)(probs)
        return nn.Dense(self.output_size)(probs)
