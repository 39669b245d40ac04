"""Fusion-model tests mirroring the reference assertion families
(test/test_model.py / test_hf_model.py): structural invariants
(share_layer_ratio depths), op behavior (weighted-sum size, down-scale
ratio), and smoke forward+loss for every variant."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechmix_tpu.config import (SEQ2SEQ_PRESETS, SPEECH_ENCODER_PRESETS,
                                  SpeechMixConfig)
from speechmix_tpu.models import speechmix as smx

ENC = SPEECH_ENCODER_PRESETS["tiny-speech"]  # 4 transformer layers
DEC = SEQ2SEQ_PRESETS["tiny-bart-bytes"]


def make_cfg(**kw):
    return SpeechMixConfig(encoder=ENC, decoder=DEC, **kw)


def test_share_layer_ratio_depths():
    # reference pins (1->0, 0.5->L/2, 0->L) (test_model.py:19-25)
    for ratio, expect in [(1.0, 0), (0.5, 2), (0.0, 4)]:
        cfg = make_cfg(share_layer_ratio=ratio, down_scale=8)
        assert cfg.num_speech_encoder_layers == expect
        params = smx.init_speechmix(jax.random.PRNGKey(0), cfg)
        n = jax.tree_util.tree_leaves(
            params["speech_encoder"]["layers"])[0].shape[0]
        assert n == expect


def test_weighted_sum_conventions():
    # HF convention: L+1 weights (embedding output included,
    # test_hf_model.py:43); s3prl convention: L (test_model.py:35)
    cfg_hf = make_cfg(weighted_sum=True, weighted_sum_convention="hf")
    cfg_s3 = make_cfg(weighted_sum=True, weighted_sum_convention="s3prl")
    assert cfg_hf.num_weighted_sum == ENC.num_layers + 1
    assert cfg_s3.num_weighted_sum == ENC.num_layers
    p = smx.init_speechmix(jax.random.PRNGKey(0), cfg_hf)
    assert p["weights_sum"].shape == (ENC.num_layers + 1,)

    wav = jnp.zeros((1, 16000))
    out = smx.speechmix_forward(
        p, cfg_hf, wav, labels=jnp.array([[130, 140, DEC.eos_token_id]]),
        return_model_detail=True)
    assert out["weighted_sum"].shape == (ENC.num_layers + 1,)
    np.testing.assert_allclose(float(out["weighted_sum"].sum()), 1.0,
                               rtol=1e-5)


@pytest.mark.parametrize("down_scale", [1, 2, 4, 8])
def test_downscale_ratio(down_scale):
    # achieved temporal ratio ~ requested (test_model.py:37-53)
    cfg = make_cfg(share_layer_ratio=0.5, down_scale=down_scale)
    params = smx.init_speechmix(jax.random.PRNGKey(0), cfg)
    wav = jnp.zeros((1, 32000))
    out = smx.speechmix_forward(
        params, cfg, wav, labels=jnp.array([[130, DEC.eos_token_id]]),
        return_model_detail=True)
    before = out["shape_before_length_adapter"][1]
    after = out["shape_before_enc_dec_projector"][1]
    assert round(before / after) == down_scale


@pytest.mark.parametrize("variant", ["eed", "fixed", "adapter", "self", "gan"])
def test_variant_forward_loss(variant):
    cfg = make_cfg(variant=variant, share_layer_ratio=0.5, down_scale=8)
    params = smx.init_speechmix(jax.random.PRNGKey(42), cfg)
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 16000) * 0.05,
                      jnp.float32)
    labels = jnp.array([[130, 140, 150, DEC.eos_token_id],
                        [135, 145, DEC.eos_token_id, -100]])
    text_ids = jnp.where(labels == -100, DEC.pad_token_id, labels)
    out = smx.speechmix_forward(
        params, cfg, wav, lengths=jnp.array([16000, 9000]), labels=labels,
        text_input_ids=text_ids)
    assert np.isfinite(float(out["loss"]))
    # real distributions, not argmax (fixes reference quirk §2.5.6)
    assert out["logits"].shape[-1] == DEC.vocab_size
    if variant == "self":
        for k in ("ce_loss", "kld_loss", "mse_loss"):
            assert np.isfinite(float(out[k]))
    if variant == "gan":
        for k in ("voice_enc_loss", "voice_dec_loss", "nlp_enc_loss",
                  "nlp_dec_loss"):
            assert np.isfinite(float(out[k]))


def test_prompt_concat():
    cfg = make_cfg(down_scale=8)
    params = smx.init_speechmix(jax.random.PRNGKey(0), cfg)
    wav = jnp.zeros((2, 16000))
    prompt = jnp.array([130, 131, 132])
    embeds, mask, _ = smx.encode_speech(params, cfg, wav, prompt_ids=prompt)
    embeds_np, mask_np, _ = smx.encode_speech(params, cfg, wav)
    assert embeds.shape[1] == embeds_np.shape[1] + 3
    assert bool(mask[:, :3].all())


def test_t5_decoder_family():
    cfg = SpeechMixConfig(encoder=ENC,
                          decoder=SEQ2SEQ_PRESETS["tiny-t5-bytes"],
                          down_scale=4)
    params = smx.init_speechmix(jax.random.PRNGKey(0), cfg)
    wav = jnp.zeros((1, 16000))
    labels = jnp.array([[130, 140, cfg.decoder.eos_token_id]])
    out = smx.speechmix_forward(params, cfg, wav, labels=labels)
    assert np.isfinite(float(out["loss"]))


def test_gan_decoder_mask_keeps_position_zero():
    """Position 0 holds decoder_start_token_id — for T5/ByT5 it EQUALS
    pad_token_id (0), and the GAN Gram must keep it (the reference Grams
    over all positions)."""
    ids = jnp.asarray([[0, 5, 6, 0], [0, 7, 0, 0]])  # t5: start == pad == 0
    mask = np.asarray(smx.gan_decoder_mask(ids, pad_token_id=0))
    np.testing.assert_array_equal(
        mask, [[True, True, True, False], [True, True, False, False]])
