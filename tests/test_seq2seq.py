"""Seq2seq LM tests: BART and T5 graph variants, shift_tokens_right
semantics, cached-vs-uncached decode equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechmix_tpu.config import SEQ2SEQ_PRESETS
from speechmix_tpu.models import seq2seq as s2s

BART = SEQ2SEQ_PRESETS["tiny-bart-bytes"]
T5 = SEQ2SEQ_PRESETS["tiny-t5-bytes"]


@pytest.fixture(scope="module", params=["bart", "t5"])
def cfg(request):
    return BART if request.param == "bart" else T5


@pytest.fixture(scope="module")
def params(cfg):
    return s2s.init_seq2seq(jax.random.PRNGKey(0), cfg)


def test_shift_tokens_right():
    labels = jnp.array([[5, 6, 7, -100], [8, 9, -100, -100]])
    out = s2s.shift_tokens_right(labels, pad_token_id=1,
                                 decoder_start_token_id=2)
    np.testing.assert_array_equal(
        np.asarray(out), [[2, 5, 6, 7], [2, 8, 9, 1]])


def test_forward_loss(cfg, params):
    ids = jnp.array([[130, 140, 150, cfg.eos_token_id]])
    labels = jnp.array([[130, 140, 150, cfg.eos_token_id]])
    out = s2s.seq2seq_apply(params, cfg, input_ids=ids, labels=labels)
    assert out["logits"].shape == (1, 4, cfg.vocab_size)
    assert np.isfinite(float(out["loss"]))


def test_padding_invariance(cfg, params):
    """Encoder mask works: adding padded tokens must not change the loss."""
    ids = jnp.array([[130, 140, 150, cfg.eos_token_id]])
    labels = jnp.array([[130, 140, cfg.eos_token_id]])
    out_a = s2s.seq2seq_apply(params, cfg, input_ids=ids, labels=labels)

    ids_padded = jnp.concatenate(
        [ids, jnp.full((1, 3), cfg.pad_token_id)], axis=1)
    mask = jnp.array([[True] * 4 + [False] * 3])
    out_b = s2s.seq2seq_apply(params, cfg, input_ids=ids_padded,
                              attention_mask=mask, labels=labels)
    np.testing.assert_allclose(float(out_a["loss"]), float(out_b["loss"]),
                               rtol=1e-5)


def test_cached_decode_matches_full(cfg, params):
    """Incremental KV-cache decode must produce the same logits as the full
    teacher-forcing pass (validates the functional cache that replaces the
    reference's mutable self.decoder_outputs, hf_model.py:354-376)."""
    enc_ids = jnp.array([[130, 140, 150, cfg.eos_token_id]])
    enc_out = s2s.encode(params, cfg, input_ids=enc_ids)
    dec_ids = jnp.array([[cfg.decoder_start_token_id, 130, 140, 150]])

    full = s2s.decode(params, cfg, dec_ids,
                      enc_hidden=enc_out["last_hidden_state"],
                      encoder_mask=enc_out["mask"])

    cache = s2s.init_decoder_cache(params, cfg,
                                   enc_out["last_hidden_state"], 1, 8)
    step_logits = []
    for t in range(dec_ids.shape[1]):
        out = s2s.decode(params, cfg, dec_ids[:, t:t + 1],
                         encoder_mask=enc_out["mask"], cache=cache)
        cache = out["cache"]
        step_logits.append(np.asarray(out["logits"][:, 0]))
    step_logits = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(step_logits, np.asarray(full["logits"]),
                               rtol=2e-4, atol=2e-4)


def test_t5_relative_bucket_symmetry():
    r = jnp.arange(-10, 10).reshape(1, -1) - jnp.zeros((1, 1), jnp.int32)
    b_bi = s2s._t5_relative_bucket(r, True, 32, 128)
    assert int(b_bi.min()) >= 0 and int(b_bi.max()) < 32
    b_causal = s2s._t5_relative_bucket(r, False, 32, 128)
    assert int(b_causal.min()) >= 0 and int(b_causal.max()) < 32
