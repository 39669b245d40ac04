"""Generation tests: greedy/beam static-shape decode, EOS handling, prompt
support, greedy==manual-loop equivalence (reference eval.ipynb confirms
forward-only greedy decode matches generate())."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechmix_tpu import generation as gen_lib
from speechmix_tpu.config import (SEQ2SEQ_PRESETS, SPEECH_ENCODER_PRESETS,
                                  SpeechMixConfig)
from speechmix_tpu.models import seq2seq as s2s
from speechmix_tpu.models import speechmix as smx

ENC = SPEECH_ENCODER_PRESETS["tiny-speech"]
DEC = SEQ2SEQ_PRESETS["tiny-bart-bytes"]
CFG = SpeechMixConfig(encoder=ENC, decoder=DEC, down_scale=4)


@pytest.fixture(scope="module")
def params():
    return smx.init_speechmix(jax.random.PRNGKey(7), CFG)


def test_greedy_matches_manual_loop(params):
    """Greedy scan decode == step-by-step argmax via teacher forcing."""
    wav = jnp.asarray(
        np.random.RandomState(0).randn(1, 16000).astype(np.float32) * 0.1)
    max_len = 8
    tokens, lengths = gen_lib.generate(params, CFG, wav, max_length=max_len)
    tokens = np.asarray(tokens)

    # manual greedy via full (uncached) forward each step
    embeds, mask, _ = smx.encode_speech(params, CFG, wav)
    enc_out = s2s.encode(params["nlp"], DEC, inputs_embeds=embeds,
                         attention_mask=mask)
    dec = [DEC.decoder_start_token_id]
    for _ in range(max_len):
        out = s2s.decode(params["nlp"], DEC, jnp.asarray([dec]),
                         enc_hidden=enc_out["last_hidden_state"],
                         encoder_mask=enc_out["mask"])
        nxt = int(jnp.argmax(out["logits"][0, -1]))
        dec.append(nxt)
        if nxt == DEC.eos_token_id:
            break
    manual = dec[1:]
    got = tokens[0][: len(manual)].tolist()
    assert got == manual


def test_eos_padding(params):
    wav = jnp.zeros((2, 16000))
    tokens, lengths = gen_lib.generate(params, CFG, wav, max_length=12)
    tokens = np.asarray(tokens)
    for b in range(2):
        if DEC.eos_token_id in tokens[b]:
            eos_at = int(np.argmax(tokens[b] == DEC.eos_token_id))
            assert (tokens[b][eos_at + 1:] == DEC.pad_token_id).all()


def test_beam_search_runs_and_scores(params):
    wav = jnp.asarray(
        np.random.RandomState(1).randn(2, 16000).astype(np.float32) * 0.1)
    tokens_g, _ = gen_lib.generate(params, CFG, wav, max_length=8,
                                   num_beams=1)
    tokens_b, _ = gen_lib.generate(params, CFG, wav, max_length=8,
                                   num_beams=3)
    assert tokens_b.shape == tokens_g.shape

    def seq_logprob(tok_row):
        """Score a decoded row under the model (teacher forcing)."""
        embeds, mask, _ = smx.encode_speech(params, CFG, wav[:1])
        enc_out = s2s.encode(params["nlp"], DEC, inputs_embeds=embeds,
                             attention_mask=mask)
        ids = [DEC.decoder_start_token_id] + [t for t in tok_row
                                              if t != DEC.pad_token_id]
        out = s2s.decode(params["nlp"], DEC, jnp.asarray([ids[:-1]]),
                         enc_hidden=enc_out["last_hidden_state"],
                         encoder_mask=enc_out["mask"])
        lp = jax.nn.log_softmax(out["logits"][0].astype(jnp.float32), -1)
        return float(sum(lp[i, t] for i, t in enumerate(ids[1:])))

    row_g = np.asarray(tokens_g)[0].tolist()
    row_b = np.asarray(tokens_b)[0].tolist()
    if row_g != row_b:  # beam must not score worse than greedy
        assert seq_logprob(row_b) >= seq_logprob(row_g) - 1e-4


def test_prompt_changes_output(params):
    wav = jnp.asarray(
        np.random.RandomState(2).randn(1, 16000).astype(np.float32) * 0.1)
    t_plain, _ = gen_lib.generate(params, CFG, wav, max_length=8)
    prompt = jnp.asarray([140, 141, 142], jnp.int32)
    t_prompt, _ = gen_lib.generate(params, CFG, wav, prompt_ids=prompt,
                                   max_length=8)
    assert t_plain.shape == t_prompt.shape  # static shapes regardless


def test_kv_int8_decode_matches(params):
    """int8 cross-KV (per-token/head scales, seq2seq.DecoderCache) decodes
    the same tokens as full-precision cross-KV on the tiny model, for both
    greedy and beam, and the quantized cross-attention logits stay close."""
    wav = jnp.asarray(
        np.random.RandomState(3).randn(2, 16000).astype(np.float32) * 0.1)
    for beams in (1, 2):
        ref, _ = gen_lib.generate(params, CFG, wav, max_length=10,
                                  num_beams=beams)
        q8, _ = gen_lib.generate(params, CFG, wav, max_length=10,
                                 num_beams=beams, kv_int8=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(q8))

    # logits-level agreement on one cached step
    embeds, mask, _ = smx.encode_speech(params, CFG, wav)
    enc_out = s2s.encode(params["nlp"], DEC, inputs_embeds=embeds,
                         attention_mask=mask)
    tok = jnp.full((2, 1), DEC.decoder_start_token_id, jnp.int32)
    outs = {}
    for int8 in (False, True):
        cache = s2s.init_decoder_cache(params["nlp"], DEC,
                                       enc_out["last_hidden_state"], 2, 4,
                                       kv_int8=int8)
        outs[int8] = np.asarray(
            s2s.decode(params["nlp"], DEC, tok, encoder_mask=mask,
                       cache=cache)["logits"])
    err = np.max(np.abs(outs[True] - outs[False]))
    scale = np.max(np.abs(outs[False])) + 1e-9
    assert err / scale < 0.02, f"relative logits error {err / scale}"


def test_sample_filter_logits_semantics():
    """top_k keeps the k best; top_p keeps the smallest set reaching the
    cumulative mass (first token always kept) — HF filter semantics."""
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    k2 = np.asarray(gen_lib.sample_filter_logits(logits, top_k=2))
    assert np.isfinite(k2[0, :2]).all() and np.isinf(k2[0, 2:]).all()
    p6 = np.asarray(gen_lib.sample_filter_logits(logits, top_p=0.6))
    # 0.5 alone < 0.6 -> needs 0.3 too; 0.5+0.3 >= 0.6 stops
    assert np.isfinite(p6[0, :2]).all() and np.isinf(p6[0, 2:]).all()
    p4 = np.asarray(gen_lib.sample_filter_logits(logits, top_p=0.4))
    assert np.isfinite(p4[0, 0]) and np.isinf(p4[0, 1:]).all()


def test_sampling_decode(params):
    """do_sample surface: top_k=1 == greedy; near-zero temperature == greedy;
    seeded reproducibility; different seeds can differ."""
    wav = jnp.asarray(
        np.random.RandomState(5).randn(2, 16000).astype(np.float32) * 0.1)
    greedy, _ = gen_lib.generate(params, CFG, wav, max_length=10)
    k1, _ = gen_lib.generate(params, CFG, wav, max_length=10,
                             do_sample=True, top_k=1,
                             rng=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(k1))
    cold, _ = gen_lib.generate(params, CFG, wav, max_length=10,
                               do_sample=True, temperature=1e-4,
                               rng=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(cold))
    a, _ = gen_lib.generate(params, CFG, wav, max_length=10, do_sample=True,
                            temperature=5.0, rng=jax.random.PRNGKey(3))
    b, _ = gen_lib.generate(params, CFG, wav, max_length=10, do_sample=True,
                            temperature=5.0, rng=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c, _ = gen_lib.generate(params, CFG, wav, max_length=10, do_sample=True,
                            temperature=5.0, rng=jax.random.PRNGKey(4))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_min_length_blocks_early_eos(params):
    """min_length masks EOS until that many tokens are generated (HF
    MinLengthLogitsProcessor semantics)."""
    wav = jnp.asarray(
        np.random.RandomState(6).randn(2, 16000).astype(np.float32) * 0.1)
    base, base_len = gen_lib.generate(params, CFG, wav, max_length=12)
    toks, lengths = gen_lib.generate(params, CFG, wav, max_length=12,
                                     min_length=9)
    eos = CFG.decoder.eos_token_id
    first9 = np.asarray(toks)[:, :8]
    assert (first9 != eos).all()
    assert (np.asarray(lengths) >= 9).all() or (
        np.asarray(lengths) == 12).all()


def test_min_length_beam_and_beam_sample(params):
    """min_length applies to beam search too; beam-sample (do_sample with
    num_beams > 1, HF beam_sample semantics) is seeded-deterministic and
    seed-sensitive."""
    wav = jnp.asarray(
        np.random.RandomState(7).randn(2, 16000).astype(np.float32) * 0.1)
    toks, lengths = gen_lib.generate(params, CFG, wav, max_length=12,
                                     num_beams=2, min_length=6)
    eos = CFG.decoder.eos_token_id
    assert (np.asarray(toks)[:, :5] != eos).all()

    a, _ = gen_lib.generate(params, CFG, wav, max_length=8, num_beams=2,
                            do_sample=True, temperature=3.0,
                            rng=jax.random.PRNGKey(5))
    b, _ = gen_lib.generate(params, CFG, wav, max_length=8, num_beams=2,
                            do_sample=True, temperature=3.0,
                            rng=jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c, _ = gen_lib.generate(params, CFG, wav, max_length=8, num_beams=2,
                            do_sample=True, temperature=3.0,
                            rng=jax.random.PRNGKey(6))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_sample_filter_clamps_degenerate_knobs():
    """HF warper edge semantics: top_k > vocab clamps to vocab
    (TopKLogitsWarper); top_p=0.0 still keeps the best token
    (min_tokens_to_keep=1) instead of producing an all--inf row."""
    logits = jnp.asarray(np.random.RandomState(0).randn(3, 7), jnp.float32)
    out = gen_lib.sample_filter_logits(logits, top_k=100000)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(logits))

    out = gen_lib.sample_filter_logits(logits, top_p=0.0)
    out = np.asarray(out)
    best = np.asarray(logits).argmax(-1)
    for row in range(3):
        kept = np.isfinite(out[row])
        assert kept.sum() == 1 and kept[best[row]]


def test_num_beam_groups_requires_enough_beams(params):
    """HF generate raises when num_beam_groups > num_beams; the greedy path
    must NOT silently swallow group-beam kwargs (review round 4)."""
    wav = jnp.asarray(np.zeros((1, 8000), np.float32))
    with pytest.raises(ValueError, match="num_beam_groups"):
        gen_lib.generate(params, CFG, wav, max_length=4,
                            num_beams=1, num_beam_groups=2,
                            diversity_penalty=0.5)


def test_beam_shared_cross_kv_matches_tiled(params):
    """Shared cross-KV beam decode (one cross projection per input row,
    beams folded into the einsum q axis — round-5 serving lever) is a pure
    layout change: beam / group-beam / constrained results equal the tiled
    path token-for-token and score-for-score."""
    wav = jnp.asarray(
        np.random.RandomState(3).randn(2, 16000).astype(np.float32) * 0.1)
    embeds, mask, _ = smx.encode_speech(params, CFG, wav)
    enc_out = s2s.encode(params["nlp"], DEC, inputs_embeds=embeds,
                         attention_mask=mask)
    h, m = enc_out["last_hidden_state"], enc_out["mask"]

    def run_all():
        b = gen_lib.beam_search(params["nlp"], DEC, h, m, 8, num_beams=3,
                                output_scores=True)
        g = gen_lib.group_beam_search(params["nlp"], DEC, h, m, 8,
                                      num_beams=4, num_beam_groups=2,
                                      diversity_penalty=0.7)
        c = gen_lib.constrained_beam_search(params["nlp"], DEC, h, m, 8,
                                            [[70, 71]], num_beams=3,
                                            output_scores=True)
        return [np.asarray(x) for grp in (b, g, c) for x in grp]

    gen_lib.set_beam_shared_cross_kv(True)
    shared = run_all()
    try:
        gen_lib.set_beam_shared_cross_kv(False)
        tiled = run_all()
    finally:
        gen_lib.set_beam_shared_cross_kv(True)
    for a, b_ in zip(shared, tiled):
        np.testing.assert_allclose(a, b_, rtol=0, atol=0)


def test_beam_shared_cross_kv_matches_tiled_int8(params):
    """Shared cross-KV composed with the int8-quantized cross cache: the
    per-(token, head) scale broadcast must land on the beam-folded q axis
    identically to the tiled layout."""
    wav = jnp.asarray(
        np.random.RandomState(5).randn(2, 16000).astype(np.float32) * 0.1)
    embeds, mask, _ = smx.encode_speech(params, CFG, wav)
    enc_out = s2s.encode(params["nlp"], DEC, inputs_embeds=embeds,
                         attention_mask=mask)
    h, m = enc_out["last_hidden_state"], enc_out["mask"]

    def run():
        return gen_lib.beam_search(params["nlp"], DEC, h, m, 8, num_beams=3,
                                   kv_int8=True, output_scores=True)

    gen_lib.set_beam_shared_cross_kv(True)
    shared = [np.asarray(x) for x in run()]
    try:
        gen_lib.set_beam_shared_cross_kv(False)
        tiled = [np.asarray(x) for x in run()]
    finally:
        gen_lib.set_beam_shared_cross_kv(True)
    for a, b_ in zip(shared, tiled):
        np.testing.assert_allclose(a, b_, rtol=0, atol=0)
