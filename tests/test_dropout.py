"""Training-mode dropout: stochastic across rng keys, deterministic at eval.

The reference trains with the backbones' default ~0.1 dropout everywhere
(configs loaded at /root/reference/speechmix/hf_model.py:216-219, train mode
set by HF Trainer); this framework threads an explicit dropout_rng through
speechmix_forward -> seq2seq/speech-encoder layers (HF placements)."""

import jax
import jax.numpy as jnp
import numpy as np

from speechmix_tpu.config import (SEQ2SEQ_PRESETS, SPEECH_ENCODER_PRESETS,
                                  SpeechMixConfig)
from speechmix_tpu.models import speechmix as smx
from speechmix_tpu.training import trainer as trainer_lib
from speechmix_tpu.training.trainer import TrainConfig

ENC = SPEECH_ENCODER_PRESETS["tiny-speech"]
CFG = SpeechMixConfig(encoder=ENC, decoder=SEQ2SEQ_PRESETS["tiny-bart-bytes"],
                      down_scale=4)
CFG_T5 = SpeechMixConfig(encoder=ENC,
                         decoder=SEQ2SEQ_PRESETS["tiny-t5-bytes"],
                         down_scale=4)


def _batch(seed=0, b=2, t=8000, label_len=6, eos=1):
    rng = np.random.RandomState(seed)
    labels = rng.randint(130, 200, size=(b, label_len)).astype(np.int64)
    labels[:, -1] = eos
    return (jnp.asarray(rng.randn(b, t).astype(np.float32) * 0.1),
            jnp.asarray(labels))


def _loss(cfg, params, wav, labels, rng):
    out = smx.speechmix_forward(params, cfg, wav, labels=labels,
                                dropout_rng=rng)
    return float(out["loss"])


def test_dropout_stochastic_train_deterministic_eval():
    params = smx.init_speechmix(jax.random.PRNGKey(0), CFG)
    wav, labels = _batch()

    l_eval1 = _loss(CFG, params, wav, labels, None)
    l_eval2 = _loss(CFG, params, wav, labels, None)
    assert l_eval1 == l_eval2  # eval: no rng, bitwise deterministic

    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    l_k1 = _loss(CFG, params, wav, labels, k1)
    l_k1_again = _loss(CFG, params, wav, labels, k1)
    l_k2 = _loss(CFG, params, wav, labels, k2)
    assert l_k1 == l_k1_again  # same key -> same masks
    assert l_k1 != l_k2        # different key -> different masks
    assert l_k1 != l_eval1     # dropout actually perturbs the loss


def test_dropout_t5_path():
    params = smx.init_speechmix(jax.random.PRNGKey(0), CFG_T5)
    wav, labels = _batch(eos=CFG_T5.decoder.eos_token_id)
    l_eval = _loss(CFG_T5, params, wav, labels, None)
    l_k1 = _loss(CFG_T5, params, wav, labels, jax.random.PRNGKey(1))
    l_k2 = _loss(CFG_T5, params, wav, labels, jax.random.PRNGKey(2))
    assert l_k1 != l_k2 and l_k1 != l_eval


def test_zero_rate_config_is_identity():
    """dropout rates 0 + an rng: output must equal the no-rng forward (the
    rng threading itself must not perturb anything)."""
    import dataclasses
    enc0 = dataclasses.replace(ENC, dropout=0.0, attention_dropout=0.0,
                               activation_dropout=0.0, feat_proj_dropout=0.0)
    dec0 = dataclasses.replace(SEQ2SEQ_PRESETS["tiny-bart-bytes"],
                               dropout=0.0, attention_dropout=0.0,
                               activation_dropout=0.0)
    cfg0 = SpeechMixConfig(encoder=enc0, decoder=dec0, down_scale=4)
    params = smx.init_speechmix(jax.random.PRNGKey(0), cfg0)
    wav, labels = _batch()
    l_rng = _loss(cfg0, params, wav, labels, jax.random.PRNGKey(7))
    l_none = _loss(cfg0, params, wav, labels, None)
    assert l_rng == l_none


def test_train_step_dropout_deterministic_per_step():
    """The train step's dropout chain is keyed on (seed, step): re-running
    the same step from the same state reproduces the loss exactly (resume
    replays identical masks)."""
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=0, grad_accum=2,
                     output_dir="", dropout=True)
    state = trainer_lib.create_train_state(jax.random.PRNGKey(0), CFG, tc)
    step_fn = trainer_lib.make_train_step(CFG, tc, state.params)
    wav, labels = _batch(b=4)
    batch = {"input_values": wav,
             "lengths": jnp.full((4,), wav.shape[1], jnp.int32),
             "labels": labels}
    _, m1 = step_fn(state, batch, jnp.float32(1.0))
    state2 = trainer_lib.create_train_state(jax.random.PRNGKey(0), CFG, tc)
    _, m2 = step_fn(state2, batch, jnp.float32(1.0))
    assert float(m1["loss"]) == float(m2["loss"])

    # and dropout=False differs from dropout=True on the same state/batch
    tc_nd = TrainConfig(learning_rate=1e-3, warmup_steps=0, grad_accum=2,
                        output_dir="", dropout=False)
    state3 = trainer_lib.create_train_state(jax.random.PRNGKey(0), CFG, tc_nd)
    step_nd = trainer_lib.make_train_step(CFG, tc_nd, state3.params)
    _, m3 = step_nd(state3, batch, jnp.float32(1.0))
    assert float(m3["loss"]) != float(m1["loss"])


def test_self_variant_text_mask_defaulted():
    """self/gan second pass: padded text positions must not contribute —
    two batches identical except for extra PAD tokens on the text input give
    the same loss (guards the masking invariant, speechmix.py)."""
    import dataclasses
    cfg = dataclasses.replace(CFG, variant="self")
    params = smx.init_speechmix(jax.random.PRNGKey(0), cfg)
    wav, labels = _batch()
    pad = cfg.decoder.pad_token_id
    text = np.array([[140, 141, 142, 1], [150, 151, 1, pad]], np.int64)
    text_padded = np.concatenate(
        [text, np.full((2, 3), pad, np.int64)], axis=1)
    l1 = float(smx.speechmix_forward(
        params, cfg, wav, labels=labels,
        text_input_ids=jnp.asarray(text))["loss"])
    l2 = float(smx.speechmix_forward(
        params, cfg, wav, labels=labels,
        text_input_ids=jnp.asarray(text_padded))["loss"])
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
