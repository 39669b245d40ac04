"""int8 weight-only quantization + rematerialization tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from speechmix_tpu.config import (SEQ2SEQ_PRESETS, SPEECH_ENCODER_PRESETS,
                                  SpeechMixConfig)
from speechmix_tpu.models import speechmix as smx
from speechmix_tpu.ops import layers
from speechmix_tpu.utils.quantize import quantize_weights, \
    quantization_report
from speechmix_tpu import generation as gen_lib

ENC = SPEECH_ENCODER_PRESETS["tiny-speech"]
DEC = SEQ2SEQ_PRESETS["tiny-bart-bytes"]


def test_dense_int8_accuracy():
    p = {"proj": layers.init_dense(jax.random.PRNGKey(0), 256, 512)}
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 256))
    y_fp = layers.dense(p["proj"], x)
    qp = quantize_weights(p)
    assert "kernel_q" in qp["proj"]
    y_q = layers.dense(qp["proj"], x)
    rel = float(jnp.abs(y_fp - y_q).max() / jnp.abs(y_fp).max())
    assert rel < 0.02


def test_quantized_generate_runs():
    cfg = SpeechMixConfig(encoder=ENC, decoder=DEC, down_scale=4)
    params = smx.init_speechmix(jax.random.PRNGKey(0), cfg)
    qparams = quantize_weights(params, min_size=2048)
    nq, nt = quantization_report(qparams)
    assert nq > 0.3 * nt  # most big weights quantized
    wav = jnp.asarray(
        np.random.RandomState(0).randn(1, 16000).astype(np.float32) * 0.1)
    t_q, _ = gen_lib.generate(qparams, cfg, wav, max_length=6)
    assert t_q.shape == (1, 6)


def test_remat_matches_no_remat():
    """remat must not change values, only the backward memory profile."""
    cfg = SpeechMixConfig(encoder=ENC, decoder=DEC, down_scale=4)
    cfg_r = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(ENC, remat=True),
        decoder=dataclasses.replace(DEC, remat=True))
    params = smx.init_speechmix(jax.random.PRNGKey(0), cfg)
    wav = jnp.asarray(
        np.random.RandomState(0).randn(2, 16000).astype(np.float32) * 0.1)
    labels = jnp.array([[130, 140, DEC.eos_token_id]] * 2)

    def loss(cfg_use):
        def f(p):
            return smx.speechmix_forward(p, cfg_use, wav,
                                         labels=labels)["loss"]
        return jax.value_and_grad(f)(params)

    l0, g0 = loss(cfg)
    l1, g1 = loss(cfg_r)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    leaves0 = jax.tree_util.tree_leaves(g0)
    leaves1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_save_from_pretrained_roundtrip(tmp_path):
    import speechmix_tpu
    spm = speechmix_tpu.HFSpeechMixEED("tiny-speech", "tiny-bart-bytes",
                                       down_scale=4, weighted_sum=True)
    spm.save_pretrained(str(tmp_path / "model"))
    spm2 = speechmix_tpu.HFSpeechMixEED.from_pretrained(
        str(tmp_path / "model"))
    assert spm2.config == spm.config
    a = jax.tree_util.tree_leaves(spm.params)
    b = jax.tree_util.tree_leaves(spm2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_tied_lm_head_quantized():
    """shared.embedding is the largest decode weight (V x H); it must be
    int8 after quantization (round-1 gap: the tied head stayed fp32) and the
    fused logits must stay close to full precision."""
    cfg = SpeechMixConfig(encoder=ENC, decoder=DEC, down_scale=4)
    params = smx.init_speechmix(jax.random.PRNGKey(0), cfg)
    qparams = quantize_weights(params, min_size=2048)
    assert "embedding_q" in qparams["nlp"]["shared"]
    assert qparams["nlp"]["shared"]["embedding_q"].dtype == jnp.int8

    wav = jnp.asarray(
        np.random.RandomState(0).randn(1, 16000).astype(np.float32) * 0.1)
    labels = jnp.array([[130, 140, DEC.eos_token_id]])
    out_fp = smx.speechmix_forward(params, cfg, wav, labels=labels)
    out_q = smx.speechmix_forward(qparams, cfg, wav, labels=labels)
    err = float(jnp.abs(out_fp["logits"] - out_q["logits"]).max())
    ref = float(jnp.abs(out_fp["logits"]).max())
    assert err < 0.05 * ref, (err, ref)


def test_t5_stacked_kernels_quantized():
    """T5 stacks carry no biases; name-based detection must quantize them
    (round-1: bias-shape detection made quantize a silent no-op for T5)."""
    cfg = SpeechMixConfig(encoder=ENC,
                          decoder=SEQ2SEQ_PRESETS["tiny-t5-bytes"],
                          down_scale=4)
    params = smx.init_speechmix(jax.random.PRNGKey(0), cfg)
    qparams = quantize_weights(params, min_size=2048)
    enc_layers = qparams["nlp"]["encoder"]["layers"]
    assert "kernel_q" in enc_layers["self_attn"]["q_proj"]
    assert enc_layers["self_attn"]["q_proj"]["kernel_q"].dtype == jnp.int8
    # conv kernels stay full precision
    fe = qparams["speech_encoder"]["feature_extractor"]["layers"]
    assert "kernel" in fe[0]["conv"]


def test_int8_dense_compute_accuracy():
    """int8 x int8 MXU compute path (activations quantized per token):
    matches the fp32 matmul within combined quantization error, and the
    switch restores exactly."""
    from speechmix_tpu.ops import layers
    rng = jax.random.PRNGKey(0)
    p = layers.init_dense(rng, 64, 96)
    from speechmix_tpu.utils.quantize import quantize_weights
    pq = quantize_weights({"d": p}, min_size=1)["d"]
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 10, 64)) * 1.5
    ref = layers.dense(p, x)
    try:
        layers.set_int8_dense_compute(True)
        out = layers.dense(pq, x)
    finally:
        layers.set_int8_dense_compute(False)
    err = float(jnp.abs(out - ref).max())
    scale = float(jnp.abs(ref).max())
    assert err < 0.03 * scale, (err, scale)
    # weight-only path still active when the switch is off
    out_wo = layers.dense(pq, x)
    err_wo = float(jnp.abs(out_wo - ref).max())
    assert err_wo < 0.02 * scale


def test_int8_compute_encoder_forward_error():
    """Whole fused forward with the speech-encoder subtree in int8 compute:
    logits error bounded (serving-mode accuracy guard)."""
    from speechmix_tpu.ops import layers
    cfg = SpeechMixConfig(encoder=ENC, decoder=DEC, down_scale=4)
    params = smx.init_speechmix(jax.random.PRNGKey(0), cfg)
    qparams = dict(params)
    qparams["speech_encoder"] = quantize_weights(
        {"e": params["speech_encoder"]}, min_size=2048)["e"]
    wav = jnp.asarray(
        np.random.RandomState(0).randn(2, 16000).astype(np.float32) * 0.1)
    labels = jnp.asarray(np.array([[130, 140, 1], [150, 160, 1]]))
    out_fp = smx.speechmix_forward(params, cfg, wav, labels=labels)
    try:
        layers.set_int8_dense_compute(True)
        out_q = smx.speechmix_forward(qparams, cfg, wav, labels=labels)
    finally:
        layers.set_int8_dense_compute(False)
    err = float(jnp.abs(out_fp["logits"] - out_q["logits"]).max())
    ref = float(jnp.abs(out_fp["logits"]).max())
    assert err < 0.08 * ref, (err, ref)
