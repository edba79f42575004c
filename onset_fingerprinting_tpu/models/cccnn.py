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

import jax
import jax.numpy as jnp
from flax import linen as nn

from onset_fingerprinting_tpu.models.fcnn import ACTIVATIONS
from onset_fingerprinting_tpu.ops.xcorr import (
    batch_full_correlate,
    batch_self_correlate_dft,
    self_and_pair_correlate_dft,
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


class Conv1dMXU(nn.Module):
    """Stride-1 Conv1d computed as Toeplitz-form matmuls.

    XLA's TPU conv algorithm collapses at tiny feature counts (the flagship
    stack is 1→5→…→5 channels): the MXU wants contraction dims in the
    hundreds, and a [B, V, 5] conv leaves it ~99% idle (output features =
    5 of 128 lanes) — measured 25-40 ms of the serving fingerprint stage.
    Materializing the banded weight matrix ``T[(u, c), (v, o)] =
    w[u-v, c, o]`` turns the whole layer into ``x.reshape(B, U*C) @ T`` —
    MXU-shaped, but at ~V/K× the conv FLOPs (the band is mostly zeros).

    ``u_block`` enables the BLOCKED banded form: split the output length
    into chunks of ``u_block`` positions and contract each chunk's
    ``(u_block + K - 1, C)`` input slab against the shared band slice
    ``[(u_block+K-1)*C, u_block*F]`` — one matmul with N ≈ 128+ lanes and
    only ``(u_block+K-1)/K``× FLOP inflation (e.g. 1.8× at K=33,
    u_block=26, vs 8× dense).  ``kernel_size == 1`` short-circuits to the
    exact pointwise matmul.

    Param tree is identical to ``nn.Conv`` (``kernel [K, C, F]``, ``bias
    [F]``), so checkpoints swap freely between impls (pass ``name=`` to pin
    the collection path).
    """

    features: int
    kernel_size: int
    padding: int
    dtype: Any = jnp.float32
    #: output positions per matmul block (None = one dense band).  Pick
    #: so ``u_block * features`` ≈ 128-256 (full MXU lane tiles).
    u_block: int | None = None
    #: flat I/O: input is PACKED ``[B, in_length*C]`` and the output is
    #: packed ``[B, vout*features]``.  TPU tiled layouts pad the minor
    #: dim to 128 lanes, so materializing [B, V, 5] activations costs
    #: 25x the memory (measured: OOM at the 131k-window serving batch);
    #: the packed form keeps every intermediate dense.
    in_length: int | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, V, C]
        if self.in_length is not None:
            b = x.shape[0]
            v = self.in_length
            c = x.shape[-1] // v
        else:
            b, v, c = x.shape
        k = self.kernel_size
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, c, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        p = self.padding
        f = self.features
        flat = self.in_length is not None
        # all branches work on the PACKED (v, c) flattening [B, V*C]
        xf = x if flat else x.reshape(b, v * c)
        u = v + 2 * p
        vout = u - k + 1

        def out(yf, length):  # yf: [B, length*F] packed
            if flat:
                return yf
            return yf.reshape(b, length, f)

        if k == 1:
            # pointwise conv IS a matmul — no band needed
            xp = jnp.pad(xf, ((0, 0), (p * c, p * c)))
            y = (
                xp.reshape(b * u, c).astype(self.dtype)
                @ w[0].astype(self.dtype)
                + bias.astype(self.dtype)
            )
            return out(y.reshape(b, u * f), u)
        if self.u_block is not None:
            ub = self.u_block
            n_blocks = -(-vout // ub)
            s = ub + k - 1
            # pad so every block has a full (ub + k - 1)-row input slab
            xp = jnp.pad(
                xf, ((0, 0), (p * c, (p + n_blocks * ub + k - 1 - u) * c))
            )
            # overlapping input slabs, sliced from the packed flattening
            # (rows j*ub .. j*ub+s are contiguous there) — a [B, n, s, C]
            # stack would tile-pad the C=5 minor dim to 128 lanes, 25x
            # the memory (measured: a 0.8 GB slab stack allocated 22.5 GB)
            slabs = jnp.stack(
                [
                    xp[:, j * ub * c : (j * ub + s) * c]
                    for j in range(n_blocks)
                ],
                axis=1,
            )  # [B, n_blocks, s*C] — packed minor dim
            si = jnp.arange(s)[:, None]
            ui = jnp.arange(ub)[None, :]
            kk = si - ui  # slab row s feeds block output u iff 0<=s-u<k
            mask = (kk >= 0) & (kk < k)
            t = jnp.where(
                mask[..., None, None], w[jnp.clip(kk, 0, k - 1)], 0.0
            )  # [s, ub, C, F] -> [(s, C), (ub, F)]
            t = t.transpose(0, 2, 1, 3).reshape(s * c, ub * f)
            y = (
                slabs.reshape(b * n_blocks, s * c).astype(self.dtype)
                @ t.astype(self.dtype)
                + jnp.tile(bias, ub).astype(self.dtype)
            )
            y = y.reshape(b, n_blocks * ub * f)[:, : vout * f]
            return out(y, vout)
        xp = jnp.pad(xf, ((0, 0), (p * c, p * c)))
        ui = jnp.arange(u)[:, None]
        vi = jnp.arange(vout)[None, :]
        kk = ui - vi  # y[v] reads xp[v + k'] → row u feeds col v iff
        mask = (kk >= 0) & (kk < k)  # 0 <= u - v < K
        t = jnp.where(
            mask[..., None, None], w[jnp.clip(kk, 0, k - 1)], 0.0
        )  # [U, Vout, C, F]
        t = t.transpose(0, 2, 1, 3).reshape(u * c, vout * f)
        y = xp.astype(self.dtype) @ t.astype(self.dtype) + jnp.tile(
            bias, vout
        ).astype(self.dtype)
        return out(y, vout)


class _ConvParams(nn.Module):
    """Parameter-only conv module: declares an ``nn.Conv``-compatible
    ``kernel [K, I, O]`` + ``bias [O]`` pair (same init, same tree path)
    and returns them for an external fused kernel to consume."""

    features: int
    kernel_size: int
    in_features: int

    @nn.compact
    def __call__(self):
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.in_features, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return w, b


class _ConvStack(nn.Module):
    """Conv feature extractor.

    ``groups == 1``: one shared stack applied per channel (callers fold
    channels into the batch — the reference's ``torch.func.vmap`` path,
    model.py:519).  ``groups > 1``: the reference's grouped formulation
    (model.py:487-498) — input ``[B, L, groups]``, every layer a grouped
    conv with INDEPENDENT weights per channel (``feature_group_count``),
    and ``batch_norm`` one GroupNorm(1, ·) spanning ALL ``groups * width``
    features JOINTLY per sample (model.py:502) — the normalization set
    that makes reference ``group=True`` checkpoints convertible.
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
    #: 'conv' = XLA conv; 'mxu' = Toeplitz-matmul form (Conv1dMXU; same
    #: params, requires stride=1 and dilation=1)
    conv_impl: str = "conv"
    #: blocked-band width for conv_impl='mxu' (see Conv1dMXU.u_block);
    #: None = dense band
    conv_u_block: int | None = None
    #: channel groups (the reference's ``groups=channels`` grouped conv);
    #: requires conv_impl='conv'
    groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = ACTIVATIONS[self.activation]
        if self.conv_impl == "pallas":
            # fused whole-stack Pallas kernel (ops/pallas_conv.py):
            # batch-on-lanes banded MXU matmuls, all layers resident in
            # VMEM.  Same param tree as nn.Conv; trains too (custom VJP
            # differentiates the identical XLA conv chain).
            if self.dilation != 1 or any(s != 1 for s in self.strides):
                raise ValueError(
                    "conv_impl='pallas' supports stride=1, dilation=1 only"
                )
            if self.batch_norm or self.pool:
                raise ValueError(
                    "conv_impl='pallas' does not support batch_norm/pool"
                )
            if x.shape[-1] != 1:
                raise ValueError(
                    "conv_impl='pallas' expects single-feature input"
                )
            from onset_fingerprinting_tpu.ops.pallas_conv import (
                conv_stack_fused,
            )

            ws, bs = [], []
            cin = 1
            for i, (width, ks) in enumerate(
                zip(self.layer_sizes, self.kernel_sizes)
            ):
                w, b = _ConvParams(
                    features=width,
                    kernel_size=ks,
                    in_features=cin,
                    name=f"Conv_{i}",  # checkpoint-compatible w/ nn.Conv
                )()
                ws.append(w)
                bs.append(b)
                cin = width
            return conv_stack_fused(
                x[..., 0],
                tuple(ws),
                tuple(bs),
                padding=self.padding,
                activation=self.activation,
                compute_dtype=self.dtype,
            )
        use_mxu = self.conv_impl == "mxu"
        if use_mxu and (
            self.dilation != 1 or any(s != 1 for s in self.strides)
        ):
            raise ValueError(
                "conv_impl='mxu' supports stride=1, dilation=1 only"
            )
        flat = use_mxu and not self.batch_norm and not self.pool
        if flat:
            # packed-flat pipeline: the whole stack runs on [B, V*C]
            # arrays (activations are elementwise so they apply to the
            # flat form directly).  Materializing [B, V, 5] between
            # layers tile-pads the 5-wide minor dim to 128 lanes — 25x
            # the memory, an OOM at the 131k-window serving batch.
            b, v, c = x.shape
            xf = x.reshape(b, v * c)
            for i, (width, ks) in enumerate(
                zip(self.layer_sizes, self.kernel_sizes)
            ):
                xf = Conv1dMXU(
                    features=width,
                    kernel_size=ks,
                    padding=self.padding,
                    dtype=self.dtype,
                    u_block=self.conv_u_block,
                    in_length=v,
                    name=f"Conv_{i}",  # checkpoint-compatible w/ nn.Conv
                )(xf)
                v = v + 2 * self.padding - ks + 1
                c = width
                xf = act(xf)
            return xf.reshape(b, v, c)
        if self.groups > 1 and self.conv_impl != "conv":
            raise ValueError("groups > 1 requires conv_impl='conv'")
        # x: [B', L, 1] (groups == 1) or [B, L, groups]
        for i, (width, ks, stride) in enumerate(
            zip(self.layer_sizes, self.kernel_sizes, self.strides)
        ):
            if use_mxu:
                x = Conv1dMXU(
                    features=width,
                    kernel_size=ks,
                    padding=self.padding,
                    dtype=self.dtype,
                    u_block=self.conv_u_block,
                    name=f"Conv_{i}",  # checkpoint-compatible with nn.Conv
                )(x)
            else:
                x = nn.Conv(
                    features=width * self.groups,
                    kernel_size=(ks,),
                    strides=(stride,),
                    padding=self.padding,
                    kernel_dilation=(self.dilation,),
                    feature_group_count=self.groups,
                    dtype=self.dtype,
                    name=f"Conv_{i}",
                )(x)
            x = act(x)
            if self.batch_norm:
                # reference uses GroupNorm(1, ·) here (model.py:502) — ONE
                # group over the full feature axis, so in grouped mode all
                # channels normalize jointly, exactly like torch's
                # GroupNorm(1, C*K) over [B, C*K, V].  eps matches torch.
                x = nn.GroupNorm(num_groups=1, epsilon=1e-5)(x)
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
    #: head redesign: feed the dense layer NORMALIZED self-correlation
    #: (cc / lag0, bounded in [-1, 1]) concatenated with per-channel
    #: log-energy (log lag0), instead of the reference's softmax over raw
    #: correlations (model.py:534).  The raw-CC softmax is degenerate for
    #: self-CC: with unit-variance features the lag-0 peak is ~V*K,
    #: hundreds above every other lag, so the softmax saturates one-hot,
    #: gradients through it vanish, and training freezes at
    #: predict-the-mean (measured; conv-stack grad norms ~1e-9).  The
    #: normalized-CC head keeps the waveform-shape signal well-conditioned
    #: AND retains the inter-channel energy ratios the normalization would
    #: otherwise discard — on the modal-drum fixture those two cues carry
    #: the position signal.  Default False preserves reference parity.
    cc_norm: bool = False
    #: cross-channel PAIR correlation features (beyond the reference): the
    #: self-CC features are per-channel shift-invariant, so they carry NO
    #: inter-channel TDOA signal — the very cue the lag-map locator and
    #: lag-FCNN exploit (0.14 cm vs self-CC CCCNN's 0.63 cm on the modal
    #: fixture).  Cross-correlating PAIRS of channel feature maps encodes
    #: the inter-channel delay differentiably (the learned analogue of
    #: find_lag_multi, detection.py:195-268; the reference computes paired
    #: CC only as a data-prep transform, model.py:12-45 — never as model
    #: features).  None = reference behavior; 'adjacent' = C-1 pairs
    #: (paired_xcorr's convention); 'all' = C·(C-1)/2 pairs.  Pair CC is
    #: normalized by the geometric mean of the pair's lag-0 energies
    #: (bounded in [-1, 1] like cc_norm's self features).
    cc_pairs: str | None = None
    #: lags kept per pair: center ± cc_pair_lags (None = all 2V-1).  The
    #: physical TDOA range is bounded by sensor geometry (diameter/c · sr),
    #: so cropping discards only padding-born lags and shrinks the head.
    cc_pair_lags: int | None = None
    #: conv-stack implementation: 'conv' (XLA conv), 'mxu'
    #: (Toeplitz-matmul, see Conv1dMXU — fast cold compile), or 'pallas'
    #: (fused whole-stack kernel, ops/pallas_conv.py — the fast serving
    #: path for the few-feature flagship stack; trains via a custom VJP
    #: over the identical XLA conv chain; same params as nn.Conv so
    #: checkpoints swap freely)
    conv_impl: str = "conv"
    #: blocked-band width for conv_impl='mxu' (Conv1dMXU.u_block); pick so
    #: u_block * layer width ≈ 128-256 lanes.  None = dense band.
    conv_u_block: int | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: ``[B, C, L]`` onset windows → ``[B, output_size]``."""
        if self.cc_impl not in ("fft", "dft"):
            # a typo ('DFT', 'matmul') must not silently fall back to the
            # ~30x slower FFT path in a serving setup tuned for 'dft'
            raise ValueError(
                f"cc_impl must be 'fft' or 'dft', got {self.cc_impl!r}"
            )
        if self.conv_impl not in ("conv", "mxu", "pallas"):
            raise ValueError(
                "conv_impl must be 'conv', 'mxu' or 'pallas', "
                f"got {self.conv_impl!r}"
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
        if self.group and self.conv_impl != "conv":
            raise ValueError(
                f"conv_impl={self.conv_impl!r} requires group=False (the "
                "flagship shared-weights configuration); grouped convs use "
                "conv_impl='conv'"
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
            conv_impl=self.conv_impl,
            conv_u_block=self.conv_u_block,
            groups=c if self.group else 1,
        )
        if self.group:
            # the reference's grouped formulation (model.py:487-519):
            # independent weights per channel via grouped convs, one JOINT
            # GroupNorm across all channels' features when batch_norm.
            # Torch's grouped output channel order is [channel-major, then
            # feature] — channel ch's K maps live at [ch*K, (ch+1)*K).
            feats = stack(jnp.swapaxes(x, 1, 2), train=train)  # [B, V, C*K]
            v = feats.shape[1]
            feats = feats.reshape(b, v, c, -1)  # [B, V, C, K]
            feats = feats.transpose(0, 2, 1, 3)  # [B, C, V, K]
        else:
            # shared weights: fold channels into the batch
            flat = x.reshape(b * c, length, 1)
            feats = stack(flat, train=train)  # [B*C, V, K]
            feats = feats.reshape(b, c, *feats.shape[1:])
        feats = jnp.swapaxes(feats, 2, 3)  # [B, C, K, V]

        # self cross-correlation of every feature map, summed over maps —
        # one batched FFT/DFT instead of a B*C*K-group conv
        # (model.py:527-533).  CC accumulates in f32 regardless of compute
        # dtype; with bf16 features the DFT matmuls run at DEFAULT
        # precision (one MXU pass — the features carry bf16 error already,
        # HIGHEST would cost ~6x for nothing), f32 features get HIGHEST.
        if self.cc_pairs == "adjacent":
            pairs = [(i, i + 1) for i in range(c - 1)]
        elif self.cc_pairs == "all":
            pairs = [(i, j) for i in range(c) for j in range(i + 1, c)]
        elif self.cc_pairs is None:
            pairs = None
        else:
            raise ValueError(
                "cc_pairs must be None, 'adjacent' or 'all', "
                f"got {self.cc_pairs!r}"
            )
        feats = feats.astype(jnp.float32)
        pcc = None
        if self.cc_impl == "dft":
            prec = (
                jax.lax.Precision.DEFAULT
                if self.dtype == jnp.bfloat16
                else None
            )
            # sum over the K maps on the power spectrum (linear transform
            # — identical values, K-fold less inverse-matmul work)
            if pairs is not None:
                # pair CC shares the self-CC's forward DFT matmuls
                pi = jnp.array([i for i, _ in pairs])
                pj = jnp.array([j for _, j in pairs])
                cc, pcc = self_and_pair_correlate_dft(
                    feats, pi, pj, precision=prec
                )
            else:
                cc = batch_self_correlate_dft(
                    feats, precision=prec, sum_axis=2
                )
        else:
            cc = batch_full_correlate(feats, feats).sum(axis=2)  # [B,C,2V-1]
        v = feats.shape[-1]
        if self.cc_norm:
            # lag-0 (the center column) is sum over maps of ||f||^2
            lag0 = cc[..., v - 1 : v] + 1e-6
            probs = jnp.concatenate(
                [
                    (cc / lag0).reshape(b, -1),
                    jnp.log(lag0).reshape(b, -1),
                ],
                axis=-1,
            )
        else:
            probs = nn.softmax(cc, axis=-1).reshape(b, -1)
        if pairs is not None:
            pi = jnp.array([i for i, _ in pairs])
            pj = jnp.array([j for _, j in pairs])
            if pcc is None:
                # [B, P, K, 2V-1] summed over maps → [B, P, 2V-1]; lag
                # index v-1-d peaks when channel pi leads pj by d samples
                # (the np.correlate 'full' convention)
                pcc = batch_full_correlate(feats[:, pi], feats[:, pj]).sum(
                    axis=2
                )
            if self.cc_pair_lags is not None:
                if self.cc_pair_lags >= v:
                    raise ValueError(
                        f"cc_pair_lags={self.cc_pair_lags} exceeds the "
                        f"feature-map length {v} - 1"
                    )
                lo = v - 1 - self.cc_pair_lags
                pcc = pcc[..., lo : lo + 2 * self.cc_pair_lags + 1]
            # normalize by the pair's geometric-mean energy: bounded,
            # scale-free, keeps gradients conditioned (raw pair CC has the
            # same magnitude degeneracy as the raw self-CC softmax)
            lag0c = cc[..., v - 1] + 1e-6  # [B, C] per-channel energy
            norm = jnp.sqrt(lag0c[:, pi] * lag0c[:, pj])[..., None]
            probs = jnp.concatenate(
                [probs, (pcc / norm).reshape(b, -1)], axis=-1
            )
        probs = nn.Dropout(self.dropout_rate, deterministic=not train)(probs)
        return nn.Dense(self.output_size)(probs)
