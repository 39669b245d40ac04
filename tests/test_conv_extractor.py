"""Fused Pallas conv-extractor kernel (ops/pallas/conv_extractor.py).

The reference runs the wav2vec2 feature extractor through torch's Conv1d
(HF Wav2Vec2FeatureEncoder); the XLA lowering here is correct but sits at
~36% MFU (PERF.md extractor analysis) because the strided unfold can't stay
on-chip.  The fused kernel keeps the unfold in VMEM — these tests pin its
numerics (interpret mode on CPU) against the exact XLA conv at every
geometry the wav2vec2 presets use: k in {2, 3}, stride 2, LayerNorm on/off
(feat_extract_norm "layer" vs "group" configs), odd lengths, bf16."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speechmix_tpu.ops.pallas.conv_extractor import (HALO, fused_conv_layer,
                                                     fused_conv_stack,
                                                     plan_stack)

BT = 32  # small block for CPU-interpret speed; TPU default is 512


def _xla_ref(x, w, b, stride, ln=None, eps=1e-5):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (stride,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32) + b
    if ln is not None:
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
        y = (y - mu) * jax.lax.rsqrt(var + eps) * ln["scale"] + ln["bias"]
    return jax.nn.gelu(y, approximate=False)


def _layer_inputs(rng, k, t_in=151, b=2, c=64):
    x = jnp.asarray(rng.randn(b, t_in, c).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.randn(k, c, c).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    return x, w, bias


@pytest.mark.parametrize("k", [2, 3])
@pytest.mark.parametrize("mode", ["reshape", "slice"])
def test_layer_matches_xla(rng, k, mode):
    x, w, bias = _layer_inputs(rng, k)
    t_out = (x.shape[1] - k) // 2 + 1
    wb = -(-t_out // BT)
    xp = jnp.pad(x, ((0, 0), (0, 2 * BT * wb + HALO - x.shape[1]), (0, 0)))
    out = fused_conv_layer(xp, w, bias, w_blocks=wb, t_valid=t_out, bt=BT,
                           block_b=1, deinterleave=mode, interpret=True)
    np.testing.assert_allclose(np.asarray(out[:, :t_out]),
                               np.asarray(_xla_ref(x, w, bias, 2)),
                               rtol=1e-5, atol=1e-5)


def test_layer_layernorm_epilogue(rng):
    """feat_extract_norm == "layer" configs (wav2vec2-large) put a LayerNorm
    between conv and GELU in every layer."""
    x, w, bias = _layer_inputs(rng, 3)
    ln = {"scale": jnp.asarray(rng.randn(64).astype(np.float32) * 0.2 + 1.0),
          "bias": jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)}
    t_out = (x.shape[1] - 3) // 2 + 1
    wb = -(-t_out // BT)
    xp = jnp.pad(x, ((0, 0), (0, 2 * BT * wb + HALO - x.shape[1]), (0, 0)))
    out = fused_conv_layer(xp, w, bias, w_blocks=wb, t_valid=t_out, bt=BT,
                           block_b=1, ln_params=ln, interpret=True)
    np.testing.assert_allclose(np.asarray(out[:, :t_out]),
                               np.asarray(_xla_ref(x, w, bias, 2, ln=ln)),
                               rtol=1e-4, atol=1e-4)


def _stack_params(rng, kernels, c=64, ln=False):
    layers = []
    for k in kernels:
        lp = {"conv": {
            "kernel": jnp.asarray(rng.randn(k, c, c).astype(np.float32) * .1),
            "bias": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)}}
        if ln:
            lp["norm"] = {
                "scale": jnp.asarray(
                    rng.randn(c).astype(np.float32) * 0.2 + 1.0),
                "bias": jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)}
        layers.append(lp)
    return layers


@pytest.mark.parametrize("ln", [False, True])
def test_stack_matches_xla_chain(rng, ln):
    """wav2vec2 layer-1..6 geometry (4x k=3 + 2x k=2, all stride 2), chained
    through the physical-padding plan; trailing garbage blocks must never
    contaminate logical rows."""
    kernels, strides = (3, 3, 3, 3, 2, 2), (2,) * 6
    layers = _stack_params(rng, kernels, ln=ln)
    x = jnp.asarray(rng.randn(2, 3001, 64).astype(np.float32) * 0.3)
    ref = x
    for lp, k in zip(layers, kernels):
        ref = _xla_ref(ref, lp["conv"]["kernel"], lp["conv"]["bias"], 2,
                       ln=lp.get("norm") if ln else None)
    out = fused_conv_stack(x, layers, kernels, strides, bt=BT,
                           ln_layers=ln, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_stack_bf16(rng):
    """bf16 activations (the serving dtype): f32 accumulation inside the
    kernel keeps the error at single-rounding scale."""
    kernels, strides = (3, 2), (2, 2)
    layers = _stack_params(rng, kernels)
    x = jnp.asarray(rng.randn(2, 301, 64).astype(np.float32) * 0.3)
    ref = x
    for lp, k in zip(layers, kernels):
        ref = _xla_ref(ref, lp["conv"]["kernel"], lp["conv"]["bias"], 2)
    out = fused_conv_stack(x.astype(jnp.bfloat16), layers, kernels, strides,
                           bt=BT, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), rtol=0.05, atol=0.05)


def test_plan_slack_does_not_compound():
    """The non-compounding guarantee: every layer writes at most ~2 blocks
    beyond its logical length (the index-map clamp absorbs the rest)."""
    kernels, strides = (3, 3, 3, 3, 2, 2), (2,) * 6
    _, plan = plan_stack(51199, kernels, strides, bt=512)
    for t, w in plan:
        assert w - (-(-t // 512)) <= 2, plan


def test_stack_trainable_grads_match_xla(rng):
    """fused_conv_stack_trainable's custom VJP (XLA-chain recompute) must
    equal autodiff of the XLA chain — so jax.grad through
    extractor_impl='fused' is total and correct even when the extractor is
    NOT frozen (reference recipes usually freeze it)."""
    from speechmix_tpu.ops.pallas.conv_extractor import (
        fused_conv_stack_trainable, _xla_stack)

    kernels, strides = (3, 2), (2, 2)
    layers = _stack_params(rng, kernels)
    x = jnp.asarray(rng.randn(2, 301, 64).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.randn(2, 75, 64).astype(np.float32) * 0.1)

    def loss_fused(x, layers):
        out = fused_conv_stack_trainable(x, layers, kernels, strides,
                                         False, 1e-5, True)
        return jnp.sum(out * w)

    def loss_xla(x, layers):
        return jnp.sum(_xla_stack(x, layers, kernels, strides,
                                  False, 1e-5) * w)

    g_f = jax.grad(loss_fused, argnums=(0, 1))(x, layers)
    g_x = jax.grad(loss_xla, argnums=(0, 1))(x, layers)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), g_f, g_x)


@pytest.mark.parametrize("norm_mode", ["group", "layer"])
def test_extract_features_fused_matches_conv(rng, tiny_cfg, norm_mode):
    """End-to-end extractor: extractor_impl='fused' must equal the XLA path
    for both norm families — 'group' (wav2vec2-base: group norm after
    conv0 only) and 'layer' (wav2vec2-large: LayerNorm in every conv
    layer, handled by the kernel's LN epilogue)."""
    import dataclasses
    from speechmix_tpu.models import speech_encoder as se

    cfg = dataclasses.replace(tiny_cfg.encoder, feat_extract_norm=norm_mode,
                              conv_bias=(norm_mode == "layer"))
    params = se.init_speech_encoder(jax.random.PRNGKey(0), cfg)
    wav = jnp.asarray(rng.randn(2, 8000).astype(np.float32) * 0.1)
    lengths = jnp.asarray([8000, 5000], jnp.int32)
    ref = se.extract_features(params, cfg, wav, lengths)
    cfg_f = dataclasses.replace(cfg, extractor_impl="fused")
    out = se.extract_features(params, cfg_f, wav, lengths)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
