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
        # live activation-dropout rng stays fused (in-kernel PRNG dropout,
        # round 4) unless the dropout-fusion toggle is off
        assert layers._ffn_fused_eligible(
            p1, p2, x_big, "gelu", jax.random.PRNGKey(0), 0.1)
        layers.set_ffn_dropout_fused(False)
        assert not layers._ffn_fused_eligible(
            p1, p2, x_big, "gelu", jax.random.PRNGKey(0), 0.1)
        layers.set_ffn_dropout_fused(True)
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


def test_ffn_fused_disabled_under_tp_and_seq_contexts():
    """GSPMD can't partition the Pallas custom call over the sharded ffn
    (TP) or time (SP) dim; inside tp_sharding / seq_sharding traces the
    eligibility gate must route to the XLA chain even when forced on."""
    from speechmix_tpu.parallel import mesh as mesh_lib
    rng = np.random.RandomState(5)
    p1 = {"kernel": jnp.asarray(rng.randn(H, F).astype(np.float32))}
    p2 = {"kernel": jnp.asarray(rng.randn(F, H).astype(np.float32))}
    x_big = jnp.asarray(rng.randn(2048, H).astype(np.float32))
    layers.set_ffn_fused(True)
    try:
        assert layers._ffn_fused_eligible(p1, p2, x_big, "gelu", None, 0.0)
        tp_mesh = mesh_lib.make_mesh(n_data=4, n_model=2)
        with mesh_lib.tp_sharding(tp_mesh):
            assert mesh_lib.active_tp_mesh() is tp_mesh
            assert not layers._ffn_fused_eligible(
                p1, p2, x_big, "gelu", None, 0.0)
        # model axis of size 1 is not tensor-parallel: kernel stays on
        dp_mesh = mesh_lib.make_mesh(n_data=8, n_model=1)
        with mesh_lib.tp_sharding(dp_mesh):
            assert mesh_lib.active_tp_mesh() is None
            assert layers._ffn_fused_eligible(
                p1, p2, x_big, "gelu", None, 0.0)
        with mesh_lib.seq_sharding(mesh_lib.make_mesh(n_data=2, n_seq=4)):
            assert not layers._ffn_fused_eligible(
                p1, p2, x_big, "gelu", None, 0.0)
        # contexts restore cleanly
        assert mesh_lib.active_tp_mesh() is None
        assert layers._ffn_fused_eligible(p1, p2, x_big, "gelu", None, 0.0)
    finally:
        layers.set_ffn_fused(None)


# ---------------------------------------------------------------------------
# residual + LayerNorm epilogue (post-LN blocks: BART, wav2vec2-base)
# ---------------------------------------------------------------------------


def _ref_res_ln(x, w1, b1, w2, b2, g, beta, act, eps=1e-5):
    y = x.astype(jnp.float32) + _ref(x, w1, b1, w2, b2, act)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    d = y - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    return d * jax.lax.rsqrt(var + eps) * g + beta


def _ln_params(seed=7, h=H):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(1.0 + 0.1 * rng.randn(h).astype(np.float32)),
            jnp.asarray(0.1 * rng.randn(h).astype(np.float32)))


@pytest.mark.parametrize("act", ["gelu", "relu"])
def test_ffn_res_ln_matches_reference_f32(act):
    x, w1, b1, w2, b2 = _mats()
    g, beta = _ln_params()
    y = fk.ffn_fused_res_ln(x, w1, b1, w2, b2, x, g, beta, act=act,
                            block_rows=256, block_f=128, interpret=True)
    ref = _ref_res_ln(x, w1, b1, w2, b2, g, beta, act)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_ffn_res_ln_bf16():
    x, w1, b1, w2, b2 = _mats(seed=1)
    g, beta = _ln_params()
    y = fk.ffn_fused_res_ln(x.astype(jnp.bfloat16), w1, b1, w2, b2,
                            x.astype(jnp.bfloat16), g, beta, act="gelu",
                            block_rows=256, block_f=256, interpret=True)
    assert y.dtype == jnp.bfloat16
    ref = _ref_res_ln(x, w1, b1, w2, b2, g, beta, "gelu")
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ref),
                               rtol=4e-2, atol=4e-2)


def test_ffn_res_ln_trainable_grads_match_xla_chain():
    x, w1, b1, w2, b2 = _mats(rows=256)
    g, beta = _ln_params()

    def loss_k(args):
        x_, w1_, b1_, w2_, b2_, g_, beta_ = args
        y = fk.ffn_res_ln_trainable(x_, w1_, b1_, w2_, b2_, x_, g_, beta_,
                                    "gelu", 1e-5, 256, 128, True)
        return jnp.sum(jnp.square(y))

    def loss_r(args):
        x_, w1_, b1_, w2_, b2_, g_, beta_ = args
        return jnp.sum(jnp.square(
            _ref_res_ln(x_, w1_, b1_, w2_, b2_, g_, beta_, "gelu")))

    gk = jax.grad(loss_k)((x, w1, b1, w2, b2, g, beta))
    gr = jax.grad(loss_r)((x, w1, b1, w2, b2, g, beta))
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-4)


def test_ffn_residual_ln_apply_dispatch_and_padding():
    """The full post-LN block helper: kernel forced on (CPU -> interpret)
    equals the XLA fallback chain, including row padding, and the epilogue
    toggle splits the fusion without changing numerics."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 700, H).astype(np.float32) * 0.5)
    p1 = {"kernel": jnp.asarray(rng.randn(H, F).astype(np.float32) * 0.1),
          "bias": jnp.asarray(rng.randn(F).astype(np.float32) * 0.1)}
    p2 = {"kernel": jnp.asarray(rng.randn(F, H).astype(np.float32) * 0.1),
          "bias": jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)}
    p_ln = dict(zip(("scale", "bias"), _ln_params()))
    args = (p1, p2, p_ln, x, "gelu", jnp.float32)
    layers.set_ffn_fused(True)
    try:
        y_k = layers.ffn_residual_ln_apply(*args)
        layers.set_ffn_fused_epilogue(False)  # FFN fused, LN epilogue XLA
        y_e = layers.ffn_residual_ln_apply(*args)
    finally:
        layers.set_ffn_fused(False)
        layers.set_ffn_fused_epilogue(True)
    y_x = layers.ffn_residual_ln_apply(*args)
    layers.set_ffn_fused(None)
    assert y_k.shape == y_x.shape == (2, 700, H)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_x), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(y_e), np.asarray(y_x), rtol=2e-5,
                               atol=2e-5)


def test_ffn_residual_ln_apply_post_dropout_falls_back():
    """With in-kernel dropout toggled OFF, a live post-FFN dropout rng must
    keep the XLA epilogue (dropout sits between fc2 and the LN) while still
    applying dropout.  (The default fused-dropout path is covered by
    tests/test_ffn_dropout.py.)"""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(4, 512, H).astype(np.float32) * 0.5)
    p1 = {"kernel": jnp.asarray(rng.randn(H, F).astype(np.float32) * 0.1),
          "bias": jnp.zeros((F,), jnp.float32)}
    p2 = {"kernel": jnp.asarray(rng.randn(F, H).astype(np.float32) * 0.1),
          "bias": jnp.zeros((H,), jnp.float32)}
    p_ln = dict(zip(("scale", "bias"), _ln_params()))
    key = jax.random.PRNGKey(0)
    layers.set_ffn_fused(True)
    layers.set_ffn_dropout_fused(False)
    try:
        y_drop = layers.ffn_residual_ln_apply(
            p1, p2, p_ln, x, "gelu", jnp.float32,
            out_rng=key, out_dropout=0.5)
    finally:
        layers.set_ffn_fused(False)
        layers.set_ffn_dropout_fused(True)
    # reference: explicit chain with the same key
    f = layers.ffn_apply(p1, p2, x, "gelu", jnp.float32)
    f = layers.dropout(f, 0.5, key)
    ref = layers.layer_norm(p_ln, x + f, 1e-5)
    layers.set_ffn_fused(None)
    np.testing.assert_allclose(np.asarray(y_drop), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# dense + residual + LayerNorm (attention out-projection epilogue)
# ---------------------------------------------------------------------------


def _ref_dense_res_ln(x, w, b, res, g, beta, eps=1e-5):
    y = jnp.dot(x.astype(jnp.float32), w)
    if b is not None:
        y = y + b
    y = y + res.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    d = y - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    return d * jax.lax.rsqrt(var + eps) * g + beta


def test_dense_res_ln_matches_reference_f32():
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(512, H).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.randn(H, H).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    res = jnp.asarray(rng.randn(512, H).astype(np.float32) * 0.5)
    g, beta = _ln_params()
    y = fk.dense_res_ln(x, w, b, res, g, beta, block_rows=256,
                        interpret=True)
    ref = _ref_dense_res_ln(x, w, b, res, g, beta)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_dense_res_ln_bf16():
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(256, H).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.randn(H, H).astype(np.float32) * 0.1)
    res = jnp.asarray(rng.randn(256, H).astype(np.float32) * 0.5)
    g, beta = _ln_params()
    b = jnp.zeros((H,), jnp.float32)
    y = fk.dense_res_ln(x.astype(jnp.bfloat16), w, b,
                        res.astype(jnp.bfloat16), g, beta, block_rows=256,
                        interpret=True)
    assert y.dtype == jnp.bfloat16
    ref = _ref_dense_res_ln(x, w, b, res, g, beta)
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ref),
                               rtol=4e-2, atol=4e-2)


def test_dense_res_ln_trainable_grads_match_xla_chain():
    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.randn(256, H).astype(np.float32) * 0.5)
    w = jnp.asarray(rng.randn(H, H).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    res = jnp.asarray(rng.randn(256, H).astype(np.float32) * 0.5)
    g, beta = _ln_params()

    def loss_k(args):
        y = fk.dense_res_ln_trainable(*args, 1e-5, 256, True)
        return jnp.sum(jnp.square(y))

    def loss_r(args):
        return jnp.sum(jnp.square(_ref_dense_res_ln(*args)))

    gk = jax.grad(loss_k)((x, w, b, res, g, beta))
    gr = jax.grad(loss_r)((x, w, b, res, g, beta))
    for a, b_ in zip(jax.tree_util.tree_leaves(gk),
                     jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4,
                                   atol=1e-4)


def test_dense_residual_ln_apply_dispatch_and_padding():
    """The attention-epilogue helper: kernel forced on (CPU -> interpret)
    equals the XLA chain, incl. non-multiple-of-block_rows (B, T, H) rows,
    and the independent toggle turns only this fusion off."""
    rng = np.random.RandomState(14)
    x = jnp.asarray(rng.randn(2, 700, H).astype(np.float32) * 0.5)
    res = jnp.asarray(rng.randn(2, 700, H).astype(np.float32) * 0.5)
    p = {"kernel": jnp.asarray(rng.randn(H, H).astype(np.float32) * 0.1),
         "bias": jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)}
    p_ln = dict(zip(("scale", "bias"), _ln_params()))
    layers.set_ffn_fused(True)
    try:
        y_k = layers.dense_residual_ln_apply(p, p_ln, x, res, jnp.float32)
        layers.set_attn_fused_epilogue(False)
        y_off = layers.dense_residual_ln_apply(p, p_ln, x, res, jnp.float32)
    finally:
        layers.set_ffn_fused(None)
        layers.set_attn_fused_epilogue(True)
    y_x = layers.dense_residual_ln_apply(p, p_ln, x, res, jnp.float32)
    assert y_k.shape == y_x.shape == (2, 700, H)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_x), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(y_off), np.asarray(y_x),
                               rtol=1e-7, atol=1e-7)


def test_dense_residual_ln_apply_dropout_falls_back():
    """With in-kernel dropout toggled OFF, a live post-attention dropout rng
    keeps the XLA chain (dropout sits between the out-proj and the residual)
    while still applying dropout."""
    rng = np.random.RandomState(15)
    x = jnp.asarray(rng.randn(4, 512, H).astype(np.float32) * 0.5)
    res = jnp.asarray(rng.randn(4, 512, H).astype(np.float32) * 0.5)
    p = {"kernel": jnp.asarray(rng.randn(H, H).astype(np.float32) * 0.1)}
    p_ln = dict(zip(("scale", "bias"), _ln_params()))
    key = jax.random.PRNGKey(1)
    layers.set_ffn_fused(True)
    layers.set_ffn_dropout_fused(False)
    try:
        y = layers.dense_residual_ln_apply(p, p_ln, x, res, jnp.float32,
                                           out_rng=key, out_dropout=0.5)
    finally:
        layers.set_ffn_fused(None)
        layers.set_ffn_dropout_fused(True)
    a = layers.dropout(layers.dense(p, x, jnp.float32), 0.5, key)
    ref = layers.layer_norm(p_ln, res + a, 1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_post_ln_encoder_fused_epilogues_in_situ():
    """Full post-LN speech-encoder forward with BOTH fused epilogues forced
    on (CPU -> interpret) vs all-XLA: the in-model wiring
    (attention(out_proj=False) + dense_residual_ln_apply +
    ffn_residual_ln_apply) must be numerically equivalent.  128-dim config
    so the kernels' alignment gates open; B*T >= 1024 rows."""
    from speechmix_tpu.config import SpeechEncoderConfig
    from speechmix_tpu.models import speech_encoder as se
    cfg = SpeechEncoderConfig(
        name="t128", conv_dims=(32, 32), conv_kernels=(10, 3),
        conv_strides=(5, 4), hidden_size=128, num_layers=2, num_heads=4,
        ffn_dim=256, pos_conv_kernel=16, pos_conv_groups=4,
        apply_spec_augment=False, layerdrop=0.0)
    assert not cfg.do_stable_layer_norm  # post-LN family
    params = se.init_speech_encoder(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(20)
    wav = jnp.asarray(rng.randn(2, 16000 * 2).astype(np.float32) * 0.1)
    lengths = jnp.asarray([32000, 29000])

    layers.set_ffn_fused(True)
    try:
        y_k = se.speech_encoder_apply(params, cfg, wav,
                                      lengths)["last_hidden_state"]
    finally:
        layers.set_ffn_fused(False)
    y_x = se.speech_encoder_apply(params, cfg, wav,
                                  lengths)["last_hidden_state"]
    layers.set_ffn_fused(None)
    assert y_k.shape[0] * y_k.shape[1] >= 1024  # kernels actually engaged
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_x), rtol=2e-4,
                               atol=2e-4)


@pytest.mark.parametrize("act", ["gelu", "gelu_new", "relu", "silu"])
def test_ffn_fused_bwd_kernels_match_autodiff(act):
    """Round-5 Pallas dgrad/wgrad kernels (ffn_fused_bwd): every gradient
    equals autodiff of the f32 reference chain (interpret mode)."""
    x, w1, b1, w2, b2 = _mats(rows=512, f=512)
    g = jnp.asarray(
        np.random.RandomState(9).randn(512, H).astype(np.float32))

    def loss(x, w1, b1, w2, b2):
        return jnp.sum(_ref(x, w1, b1, w2, b2, act) * g)

    ref_grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    dx, dw1, db1, dw2, db2 = fk.ffn_fused_bwd(
        x, g, w1, b1, w2, act=act, block_rows=256, block_f=128,
        interpret=True)
    for got, want, name in ((dx, ref_grads[0], "dx"),
                            (dw1, ref_grads[1], "dw1"),
                            (db1, ref_grads[2], "db1"),
                            (dw2, ref_grads[3], "dw2"),
                            (db2, ref_grads[4], "db2")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


def test_ffn_fused_bwd_multi_tile_grid():
    """block_f < F and block_rows < N together: the wgrad accumulators must
    span all row tiles and the dgrad accumulator all f chunks."""
    x, w1, b1, w2, b2 = _mats(rows=1024, f=512)
    g = jnp.asarray(
        np.random.RandomState(3).randn(1024, H).astype(np.float32))
    fine = fk.ffn_fused_bwd(x, g, w1, b1, w2, act="gelu", block_rows=256,
                            block_f=128, interpret=True)
    coarse = fk.ffn_fused_bwd(x, g, w1, b1, w2, act="gelu", block_rows=1024,
                              block_f=512, interpret=True)
    for a, b_ in zip(fine, coarse):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_ffn_trainable_pallas_bwd_toggle_matches_xla_bwd():
    """set_ffn_bwd_fused(True) switches the trainable VJP to the Pallas
    kernels; grads must match the default XLA-recompute backward."""
    x, w1, b1, w2, b2 = _mats(rows=512, f=512)

    def loss(x, w1, b1, w2, b2):
        y = fk.ffn_fused_trainable(x, w1, b1, w2, b2, "gelu", 256, 128,
                                   True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    grads_xla = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    layers.set_ffn_bwd_fused(True)
    try:
        grads_pl = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2,
                                                           b2)
    finally:
        layers.set_ffn_bwd_fused(False)
    for a, b_ in zip(grads_pl, grads_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=3e-4, atol=3e-4)


def test_ffn_res_ln_pallas_bwd_toggle_matches_xla_bwd():
    """The res+LN trainable backward switched to Pallas (fused-recompute +
    XLA LN-bwd + dgrad/wgrad kernels) matches the XLA-chain backward for
    every input's gradient."""
    x, w1, b1, w2, b2 = _mats(rows=512, f=512)
    rng = np.random.RandomState(11)
    res = jnp.asarray(rng.randn(512, H).astype(np.float32) * 0.5)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(H).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.randn(H).astype(np.float32))

    def loss(x, w1, b1, w2, b2, res, g, beta):
        y = fk.ffn_res_ln_trainable(x, w1, b1, w2, b2, res, g, beta,
                                    "gelu", 1e-5, 256, 128, True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    args = (x, w1, b1, w2, b2, res, g, beta)
    grads_xla = jax.grad(loss, argnums=tuple(range(8)))(*args)
    layers.set_ffn_bwd_fused(True)
    try:
        grads_pl = jax.grad(loss, argnums=tuple(range(8)))(*args)
    finally:
        layers.set_ffn_bwd_fused(False)
    names = ("dx", "dw1", "db1", "dw2", "db2", "dres", "dgamma", "dbeta")
    for a, b_, n in zip(grads_pl, grads_xla, names):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-4, err_msg=n)
