"""Freezing/masking tests: fixed_except policy, variant masks, gradual
unfreeze schedule, GAN alternation (reference: model.py:104-127,
module/utility.py:6-34)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechmix_tpu.config import (SEQ2SEQ_PRESETS, SPEECH_ENCODER_PRESETS,
                                  SpeechMixConfig)
from speechmix_tpu.models import speechmix as smx
from speechmix_tpu.training import freezing

ENC = SPEECH_ENCODER_PRESETS["tiny-speech"]
DEC = SEQ2SEQ_PRESETS["tiny-bart-bytes"]


def make(variant="eed", **kw):
    cfg = SpeechMixConfig(encoder=ENC, decoder=DEC, variant=variant, **kw)
    return cfg, smx.init_speechmix(jax.random.PRNGKey(0), cfg)


def test_default_all_trainable():
    # reference default: everything trainable, list_no_grad empty
    # (test_model.py:16)
    cfg, params = make("eed")
    mask = freezing.variant_trainable_mask(params, cfg)
    grad, no_grad = freezing.count_trainable(params, mask)
    assert len(no_grad) == 0


def test_fixed_parameters_policy():
    cfg, params = make("eed", fixed_parameters=True)
    mask = freezing.variant_trainable_mask(params, cfg)
    grad, no_grad = freezing.count_trainable(params, mask)
    # bridge params always trainable
    assert any("enc_to_dec_proj" in p for p in grad)
    assert any("length_adapter" in p for p in grad)
    # nlp FFN kernels (fc1/fc2) match no fixed_except substring except
    # 'encoder' for the encoder stack; decoder fc must be frozen
    assert any(p.startswith("nlp/decoder") and "fc1" in p for p in no_grad)


def test_fixed_variant():
    cfg, params = make("fixed")
    mask = freezing.variant_trainable_mask(params, cfg, fixed_speech=False,
                                           fixed_nlp=True)
    grad, no_grad = freezing.count_trainable(params, mask)
    assert all(not p.startswith("nlp") for p in grad)
    assert any(p.startswith("speech_encoder") for p in grad)


def test_adapter_variant_masks():
    cfg, params = make("adapter")
    mask = freezing.variant_trainable_mask(params, cfg)
    grad, no_grad = freezing.count_trainable(params, mask)
    assert any(p.startswith("adapters") for p in grad)
    assert all(not (p.startswith("nlp/encoder/layers") or
                    p.startswith("nlp/decoder/layers")) for p in grad)


def test_self_gan_freeze_nlp():
    for variant in ("self", "gan"):
        cfg, params = make(variant)
        mask = freezing.variant_trainable_mask(params, cfg)
        grad, _ = freezing.count_trainable(params, mask)
        assert all(not p.startswith("nlp") for p in grad)
    assert any(p.startswith("discriminator") for p in grad)  # gan last


def test_gradual_unfreeze_schedule():
    cfg, params = make("eed")
    L = ENC.num_layers
    # progress 0: nothing in the encoder trains
    m0 = freezing.gradual_unfreeze_scale(params, jnp.float32(0.0))
    layer_mask0 = np.asarray(jax.tree_util.tree_leaves(
        m0["speech_encoder"]["layers"])[0]).reshape(L)
    assert layer_mask0.sum() == 0
    # progress just above 1/(L+1): top layer released first
    m_top = freezing.gradual_unfreeze_scale(params, jnp.float32(1.2 / (L + 1)))
    layer_mask = np.asarray(jax.tree_util.tree_leaves(
        m_top["speech_encoder"]["layers"])[0]).reshape(L)
    assert layer_mask[-1] == 1.0 and layer_mask[0] == 0.0
    # progress 1: everything released, including conv extractor
    m1 = freezing.gradual_unfreeze_scale(params, jnp.float32(1.0))
    assert all(float(np.max(l)) == 1.0
               for l in jax.tree_util.tree_leaves(m1))
    # non-encoder params always 1.0
    assert float(jax.tree_util.tree_leaves(m0["nlp"])[0]) == 1.0


def test_gan_alternating_masks():
    cfg, params = make("gan")
    every = cfg.gan_discriminator_update_every
    m_gen = freezing.gan_alternating_masks(params, jnp.int32(0), every)
    m_disc = freezing.gan_alternating_masks(params, jnp.int32(every), every)
    disc_leaf = jax.tree_util.tree_leaves(m_gen["discriminator"])[0]
    assert float(disc_leaf) == 0.0
    disc_leaf2 = jax.tree_util.tree_leaves(m_disc["discriminator"])[0]
    assert float(disc_leaf2) == 1.0
    nlp_gen = jax.tree_util.tree_leaves(m_gen["speech_encoder"])[0]
    assert float(np.max(nlp_gen)) == 1.0
    nlp_disc = jax.tree_util.tree_leaves(m_disc["speech_encoder"])[0]
    assert float(np.max(nlp_disc)) == 0.0


def test_ed_variant_freezes_feature_extractor():
    """The reference ED constructor calls model.freeze_feature_encoder()
    (model.py:37, hf_model.py:112): the conv feature extractor is frozen,
    everything else trains."""
    cfg, params = make("ed")
    mask = freezing.variant_trainable_mask(params, cfg)
    import jax
    leaves = jax.tree_util.tree_flatten_with_path(mask)[0]
    for keypath, v in leaves:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in keypath)
        expect = 0.0 if path.startswith(
            "speech_encoder/feature_extractor") else 1.0
        assert float(v if not hasattr(v, "item") else v.item()) == expect, \
            path
