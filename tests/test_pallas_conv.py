"""Fused conv-stack kernel golden tests (interpret mode on CPU; the
compiled path is exercised by bench.py / fingerprint_anatomy.py on TPU).

The kernel (ops/pallas_conv.py) computes the reference CCCNN feature
extractor — a chain of stride-1 few-feature Conv1d + activation layers
(reference: model.py:443-533) — as banded MXU matmuls with batch on the
lane dimension.  Golden is the plain XLA conv chain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onset_fingerprinting_tpu.models.cccnn import CCCNN
from onset_fingerprinting_tpu.ops.pallas_conv import conv_stack_fused

FLAGSHIP_KS = (1, 33, 64, 15, 15, 15, 1)


def make_stack(kernel_sizes, layer_sizes, seed=0, scale=0.3):
    rng = np.random.default_rng(seed)
    ws, bs = [], []
    cin = 1
    for o, k in zip(layer_sizes, kernel_sizes):
        ws.append(
            jnp.asarray(rng.normal(size=(k, cin, o)).astype(np.float32))
            * scale
        )
        bs.append(
            jnp.asarray(rng.normal(size=(o,)).astype(np.float32)) * 0.1
        )
        cin = o
    return tuple(ws), tuple(bs)


def golden_stack(x, ws, bs, padding, activation):
    act = {"silu": jax.nn.silu, "relu": jax.nn.relu, "tanh": jnp.tanh}[
        activation
    ]
    y = x[..., None]
    for w, b in zip(ws, bs):
        y = jax.lax.conv_general_dilated(
            y,
            w,
            window_strides=(1,),
            padding=[(padding, padding)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        y = act(y + b)
    return y


@pytest.mark.parametrize(
    "kernel_sizes,layer_sizes,length,padding,activation",
    [
        (FLAGSHIP_KS, (5,) * 7, 256, 1, "silu"),  # the serving stack
        ((3, 3), (8, 16), 64, 1, "relu"),  # CCCNN defaults
        ((7, 4), (3, 5), 96, 0, "tanh"),  # even kernel, no padding
        ((1,), (6,), 40, 2, "silu"),  # pointwise only
        ((33,), (5,), 256, 16, "silu"),  # padding at the _Z limit
    ],
)
def test_matches_xla_conv_chain(
    kernel_sizes, layer_sizes, length, padding, activation
):
    ws, bs = make_stack(kernel_sizes, layer_sizes)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(19, length)).astype(np.float32))
    g = golden_stack(x, ws, bs, padding, activation)
    out = conv_stack_fused(
        x,
        ws,
        bs,
        padding=padding,
        activation=activation,
        compute_dtype=jnp.float32,
        block_lanes=128,
        interpret=True,
    )
    assert out.shape == g.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(g), atol=5e-4, rtol=1e-4
    )


@pytest.mark.parametrize("body", ["unrolled", "looped"])
def test_body_knob_is_value_neutral(body):
    """Both kernel bodies — 'unrolled' (register-resident, serving) and
    'looped' (fori_loop + VMEM scratch ping-pong, ~1 min cold compile vs
    350-540 s) — compute the identical stack (r5 compile-cliff work)."""
    ws, bs = make_stack(FLAGSHIP_KS, (5,) * 7)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(9, 256)).astype(np.float32))
    g = golden_stack(x, ws, bs, 1, "silu")
    out = conv_stack_fused(
        x, ws, bs, padding=1, compute_dtype=jnp.float32,
        block_lanes=128, body=body, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(g), atol=5e-4, rtol=1e-4
    )


def test_body_validation():
    ws, bs = make_stack((3,), (4,))
    with pytest.raises(ValueError, match="body"):
        conv_stack_fused(jnp.zeros((8, 32)), ws, bs, body="rolled",
                         interpret=True)


@pytest.mark.parametrize("tb", [16, 32, 64])
def test_block_positions_knob_is_value_neutral(tb):
    ws, bs = make_stack(FLAGSHIP_KS, (5,) * 7)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(9, 256)).astype(np.float32))
    g = golden_stack(x, ws, bs, 1, "silu")
    out = conv_stack_fused(
        x, ws, bs, padding=1, compute_dtype=jnp.float32,
        block_lanes=128, block_positions=tb, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(g), atol=5e-4, rtol=1e-4
    )


def test_batch_not_multiple_of_lanes():
    ws, bs = make_stack((9, 5), (4, 4))
    rng = np.random.default_rng(3)
    # 200 signals through 128-lane blocks: pads to 256, slices back
    x = jnp.asarray(rng.normal(size=(200, 48)).astype(np.float32))
    g = golden_stack(x, ws, bs, 1, "silu")
    out = conv_stack_fused(
        x, ws, bs, padding=1, compute_dtype=jnp.float32,
        block_lanes=128, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(g), atol=5e-4, rtol=1e-4
    )


def test_bf16_storage_close_to_f32():
    ws, bs = make_stack(FLAGSHIP_KS, (5,) * 7)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(16, 256)).astype(np.float32))
    g = golden_stack(x, ws, bs, 1, "silu")
    out = conv_stack_fused(
        x, ws, bs, padding=1, compute_dtype=jnp.bfloat16,
        block_lanes=128, interpret=True,
    )
    # bf16 storage between layers: ~1e-2 absolute on O(1) activations
    assert float(jnp.max(jnp.abs(out - g))) < 5e-2


def test_validation_errors():
    ws, bs = make_stack((3, 3), (4, 4))
    x = jnp.zeros((8, 32))
    with pytest.raises(ValueError, match="padding"):
        conv_stack_fused(x, ws, bs, padding=17, interpret=True)
    bad_w = (ws[0], jnp.zeros((3, 9, 4)))  # widths do not chain
    with pytest.raises(ValueError, match="chain"):
        conv_stack_fused(x, bad_w, bs, interpret=True)
    with pytest.raises(ValueError, match="single input feature"):
        conv_stack_fused(x, (jnp.zeros((3, 2, 4)),), bs[:1], interpret=True)


class TestCCCNNPallasImpl:
    KW = dict(
        output_size=2,
        channels=4,
        layer_sizes=(5,) * 7,
        kernel_sizes=FLAGSHIP_KS,
        dropout_rate=0.0,
        cc_impl="dft",
        cc_norm=True,
    )

    def test_matches_conv_impl_with_shared_params(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(6, 4, 256)).astype(np.float32))
        m_conv = CCCNN(conv_impl="conv", **self.KW)
        m_pal = CCCNN(conv_impl="pallas", **self.KW)
        params = m_conv.init(jax.random.PRNGKey(0), x)
        a = m_conv.apply(params, x)
        b = m_pal.apply(params, x)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3
        )

    def test_param_tree_identical(self):
        import jax.tree_util as jtu

        x = jnp.zeros((2, 4, 256))
        p_conv = CCCNN(conv_impl="conv", **self.KW).init(
            jax.random.PRNGKey(0), x
        )
        p_pal = CCCNN(conv_impl="pallas", **self.KW).init(
            jax.random.PRNGKey(0), x
        )
        paths = lambda p: {
            jtu.keystr(k): v.shape
            for k, v in jtu.tree_leaves_with_path(p)
        }
        assert paths(p_conv) == paths(p_pal)

    def test_gradients_match_conv_impl(self):
        # custom VJP: backward differentiates the XLA conv chain, so
        # training through the fused kernel gets exact reference grads
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(4, 4, 256)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(4, 2)).astype(np.float32))
        m_conv = CCCNN(conv_impl="conv", **self.KW)
        m_pal = CCCNN(conv_impl="pallas", **self.KW)
        params = m_conv.init(jax.random.PRNGKey(0), x)

        def loss(m):
            return lambda p: jnp.mean(jnp.abs(m.apply(p, x) - y))

        g1 = jax.grad(loss(m_conv))(params)
        g2 = jax.grad(loss(m_pal))(params)
        import jax.tree_util as jtu

        for a, b in zip(jtu.tree_leaves(g1), jtu.tree_leaves(g2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
            )

    def test_rejects_unsupported_configs(self):
        x = jnp.zeros((2, 4, 256))
        with pytest.raises(ValueError, match="group=False"):
            CCCNN(conv_impl="pallas", group=True, **self.KW).init(
                jax.random.PRNGKey(0), x
            )
        with pytest.raises(ValueError, match="conv_impl"):
            CCCNN(conv_impl="mxU", **self.KW).init(
                jax.random.PRNGKey(0), x
            )
