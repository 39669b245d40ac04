"""Fused FFN Pallas kernel (ops/pallas/ffn_kernel.py): numerics pinned in
interpret mode vs the f32 reference chain, custom-VJP grads vs autodiff of
the XLA chain, and the ops.layers.ffn_apply dispatch (incl. row padding and
ineligibility fallbacks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechmix_tpu.ops import layers
from speechmix_tpu.ops.pallas import ffn_kernel as fk

H, F = 128, 256


def _mats(seed=0, rows=512, h=H, f=F, bias=True):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(rows, h).astype(np.float32) * 0.5)
    w1 = jnp.asarray(rng.randn(h, f).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(f, h).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(f).astype(np.float32) * 0.1) if bias else None
    b2 = jnp.asarray(rng.randn(h).astype(np.float32) * 0.1) if bias else None
    return x, w1, b1, w2, b2


def _ref(x, w1, b1, w2, b2, act):
    h = jnp.dot(x.astype(jnp.float32), w1)
    if b1 is not None:
        h = h + b1
    h = layers.activation(act)(h)
    y = jnp.dot(h, w2)
    if b2 is not None:
        y = y + b2
    return y


@pytest.mark.parametrize("act", ["gelu", "gelu_new", "relu", "silu"])
def test_ffn_fused_matches_reference_f32(act):
    x, w1, b1, w2, b2 = _mats()
    y = fk.ffn_fused(x, w1, b1, w2, b2, act=act, block_rows=256,
                     block_f=128, interpret=True)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(_ref(x, w1, b1, w2, b2, act)),
                               rtol=2e-5, atol=2e-5)


def test_ffn_fused_bf16_and_no_bias():
    x, w1, b1, w2, b2 = _mats(bias=False)
    xb = x.astype(jnp.bfloat16)
    y = fk.ffn_fused(xb, w1, None, w2, None, act="gelu", block_rows=256,
                     block_f=256, interpret=True)
    assert y.dtype == jnp.bfloat16
    ref = _ref(x, w1, None, w2, None, "gelu")
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


def test_ffn_fused_multi_chunk_accumulation():
    """block_f < F exercises the K-loop grid with output revisits."""
    x, w1, b1, w2, b2 = _mats(rows=256, f=512)
    y1 = fk.ffn_fused(x, w1, b1, w2, b2, act="gelu", block_rows=256,
                      block_f=128, interpret=True)
    y2 = fk.ffn_fused(x, w1, b1, w2, b2, act="gelu", block_rows=256,
                      block_f=512, interpret=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5,
                               atol=1e-5)


def test_ffn_fused_trainable_grads_match_xla_chain():
    x, w1, b1, w2, b2 = _mats(rows=256)

    def loss_k(args):
        x_, w1_, b1_, w2_, b2_ = args
        y = fk.ffn_fused_trainable(x_, w1_, b1_, w2_, b2_, "gelu", 256,
                                   128, True)
        return jnp.sum(jnp.square(y))

    def loss_r(args):
        x_, w1_, b1_, w2_, b2_ = args
        return jnp.sum(jnp.square(_ref(x_, w1_, b1_, w2_, b2_, "gelu")))

    gk = jax.grad(loss_k)((x, w1, b1, w2, b2))
    gr = jax.grad(loss_r)((x, w1, b1, w2, b2))
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-4)


def test_ffn_apply_dispatch_and_row_padding():
    """ffn_apply with the kernel forced on (CPU -> interpret) equals the XLA
    fallback, including non-multiple-of-block_rows row counts (B, T, H)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 700, H).astype(np.float32) * 0.5)
    p1 = {"kernel": jnp.asarray(rng.randn(H, F).astype(np.float32) * 0.1),
          "bias": jnp.asarray(rng.randn(F).astype(np.float32) * 0.1)}
    p2 = {"kernel": jnp.asarray(rng.randn(F, H).astype(np.float32) * 0.1),
          "bias": jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)}
    layers.set_ffn_fused(True)
    try:
        y_k = layers.ffn_apply(p1, p2, x, "gelu", jnp.float32)
    finally:
        layers.set_ffn_fused(False)
    y_x = layers.ffn_apply(p1, p2, x, "gelu", jnp.float32)
    assert y_k.shape == y_x.shape == (2, 700, H)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_x), rtol=2e-5,
                               atol=2e-5)
    layers.set_ffn_fused(None)  # restore auto


def test_ffn_apply_ineligible_paths_fall_back():
    """Small rows, unaligned dims, live activation-dropout rng, and int8
    weights must all take the XLA path even when forced on."""
    rng = np.random.RandomState(4)
    p1 = {"kernel": jnp.asarray(rng.randn(H, F).astype(np.float32))}
    p2 = {"kernel": jnp.asarray(rng.randn(F, H).astype(np.float32))}
    x_small = jnp.asarray(rng.randn(4, H).astype(np.float32))
    assert not layers._ffn_fused_eligible(p1, p2, x_small, "gelu", None, 0.0)
    x_big = jnp.asarray(rng.randn(2048, H).astype(np.float32))
    layers.set_ffn_fused(True)
    try:
        assert layers._ffn_fused_eligible(p1, p2, x_big, "gelu", None, 0.0)
        # live activation-dropout rng -> XLA
        assert not layers._ffn_fused_eligible(
            p1, p2, x_big, "gelu", jax.random.PRNGKey(0), 0.1)
        # rate 0 with an rng is still eligible (dropout is identity)
        assert layers._ffn_fused_eligible(
            p1, p2, x_big, "gelu", jax.random.PRNGKey(0), 0.0)
        # unaligned hidden dim -> XLA
        p1_odd = {"kernel": jnp.zeros((96, F))}
        assert not layers._ffn_fused_eligible(
            p1_odd, p2, jnp.zeros((2048, 96)), "gelu", None, 0.0)
        # int8-quantized weights -> XLA
        p1_q = {"kernel_q": jnp.zeros((H, F), jnp.int8),
                "kernel_scale": jnp.ones((F,))}
        assert not layers._ffn_fused_eligible(
            p1_q, p2, x_big, "gelu", None, 0.0)
    finally:
        layers.set_ffn_fused(None)
