"""Static-shape generation: jitted greedy and beam decode.

Replaces the reference's dynamic HF `generate()` path (hf_model.py:304-338 +
eval.py:12-14) with a TPU-native design:

  * speech encoder runs ONCE; the text encoder over the fused embeddings runs
    ONCE; cross-attention K/V are precomputed per layer (the reference re-runs
    the weighted-sum/length-adapter/projection every decode step and caches
    the text-encoder output in mutable instance state — SURVEY.md §3.3, §2.5.5)
  * the decode loop is a lax.scan over a fixed max_length with EOS masking and
    a functional DecoderCache carry — one compile per (batch, max_length)
    bucket
  * beam search flattens (batch, beam) into the batch axis so every step stays
    a single batched matmul set on the MXU; cache rows are gathered with
    jnp.take along the flat axis (the functional analogue of HF's
    _reorder_cache, hf_model.py:337-338)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .config import SpeechMixConfig
from .models import seq2seq
from .models import speechmix as smx


# ----------------------------------------------------------------------------
# greedy
# ----------------------------------------------------------------------------

def greedy_decode(params, dcfg, enc_hidden, enc_mask, max_length,
                  dtype=jnp.float32, adapters=None, early_stop=False,
                  use_flash=False):
    """Greedy decode against a computed text-encoder output.

    Returns (tokens (B, max_length) padded with pad_token_id after EOS,
    lengths (B,)).  The EOS token itself is included in the output.

    early_stop=True uses lax.while_loop and exits as soon as every row has
    emitted EOS (output identical; saves up to ~half the decode time on real
    speech where transcripts end well before max_length).  The default scan
    always runs max_length steps — predictable cost, donation-friendly.
    """
    b = enc_hidden.shape[0]
    cache = seq2seq.init_decoder_cache(params, dcfg, enc_hidden, b,
                                       max_length, dtype)
    start = jnp.full((b, 1), dcfg.decoder_start_token_id, jnp.int32)

    def one_step(tok, cache, finished):
        out = seq2seq.decode(params, dcfg, tok, encoder_mask=enc_mask,
                             cache=cache, adapters=adapters, dtype=dtype,
                             use_flash=use_flash)
        next_tok = jnp.argmax(out["logits"][:, -1, :],
                              axis=-1).astype(jnp.int32)
        next_tok = jnp.where(finished, dcfg.pad_token_id, next_tok)
        new_finished = finished | (next_tok == dcfg.eos_token_id)
        return next_tok, out["cache"], new_finished

    if early_stop:
        tokens_buf = jnp.full((b, max_length), dcfg.pad_token_id, jnp.int32)

        def cond(carry):
            _, _, finished, _, t = carry
            return (t < max_length) & ~jnp.all(finished)

        def body(carry):
            tok, cache, finished, buf, t = carry
            next_tok, cache, finished = one_step(tok, cache, finished)
            buf = jax.lax.dynamic_update_slice(buf, next_tok[:, None],
                                               (0, t))
            return (next_tok[:, None], cache, finished, buf, t + 1)

        (_, _, finished, tokens, _) = jax.lax.while_loop(
            cond, body,
            (start, cache, jnp.zeros((b,), bool), tokens_buf,
             jnp.int32(0)))
    else:
        def step(carry, _):
            tok, cache, finished = carry
            next_tok, cache, finished = one_step(tok, cache, finished)
            return (next_tok[:, None], cache, finished), next_tok

        (_, _, finished), tokens = jax.lax.scan(
            step, (start, cache, jnp.zeros((b,), bool)), None,
            length=max_length)
        tokens = tokens.T  # (B, max_length)
    lengths = jnp.sum((tokens != dcfg.pad_token_id).astype(jnp.int32), axis=1)
    return tokens, lengths


# ----------------------------------------------------------------------------
# beam search
# ----------------------------------------------------------------------------

def _gather_beams(tree, idx, batch, beams):
    """Gather along the flattened (batch*beam) leading axis."""
    def g(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        xr = x.reshape(batch, beams, *x.shape[1:])
        return jnp.take_along_axis(
            xr, idx.reshape(batch, beams, *([1] * (x.ndim - 1))), axis=1
        ).reshape(batch * beams, *x.shape[1:])
    return jax.tree_util.tree_map(g, tree)


def _gather_cache(cache: seq2seq.DecoderCache, idx, batch, beams):
    """Cache leaves have a leading layer axis; gather on the batch axis."""
    def g(x):
        if not hasattr(x, "ndim") or x.ndim <= 1:
            return x
        # (L, B*K, ...) -> gather axis 1
        l = x.shape[0]
        xr = x.reshape(l, batch, beams, *x.shape[2:])
        take = idx.reshape(1, batch, beams, *([1] * (x.ndim - 2)))
        return jnp.take_along_axis(xr, take, axis=2).reshape(x.shape)
    return seq2seq.DecoderCache(
        self_kv=jax.tree_util.tree_map(g, cache.self_kv),
        cross_k=g(cache.cross_k), cross_v=g(cache.cross_v))


def beam_search(params, dcfg, enc_hidden, enc_mask, max_length, num_beams=4,
                length_penalty=1.0, dtype=jnp.float32, adapters=None,
                use_flash=False):
    """Batched beam search.  Returns (tokens (B, max_length), lengths (B,))
    for the best finished beam (falls back to the best live beam)."""
    b = enc_hidden.shape[0]
    k = num_beams
    neg = jnp.float32(-1e9)

    # tile encoder state to (B*K, ...)
    rep = lambda x: jnp.repeat(x, k, axis=0)
    enc_hidden_t, enc_mask_t = rep(enc_hidden), rep(enc_mask)
    cache = seq2seq.init_decoder_cache(params, dcfg, enc_hidden_t, b * k,
                                       max_length, dtype)
    tok = jnp.full((b * k, 1), dcfg.decoder_start_token_id, jnp.int32)
    # only beam 0 is live at step 0
    scores = jnp.tile(jnp.array([0.0] + [float(-1e9)] * (k - 1),
                                jnp.float32), (b,))  # (B*K,)
    tokens_buf = jnp.full((b * k, max_length), dcfg.pad_token_id, jnp.int32)
    finished = jnp.zeros((b * k,), bool)

    def step(carry, t):
        tok, cache, scores, tokens_buf, finished = carry
        out = seq2seq.decode(params, dcfg, tok, encoder_mask=enc_mask_t,
                             cache=cache, adapters=adapters, dtype=dtype,
                             use_flash=use_flash)
        logprobs = jax.nn.log_softmax(
            out["logits"][:, -1, :].astype(jnp.float32), axis=-1)  # (B*K, V)
        vocab = logprobs.shape[-1]
        # finished beams can only extend with pad at no cost
        pad_only = jnp.full((vocab,), neg).at[dcfg.pad_token_id].set(0.0)
        logprobs = jnp.where(finished[:, None], pad_only[None, :], logprobs)

        cand = scores[:, None] + logprobs  # (B*K, V)
        cand = cand.reshape(b, k * vocab)
        top_scores, top_idx = jax.lax.top_k(cand, k)  # (B, K)
        beam_idx = top_idx // vocab  # which source beam
        tok_idx = (top_idx % vocab).astype(jnp.int32)

        # reorder carry state by chosen beams
        new_cache = _gather_cache(out["cache"], beam_idx, b, k)
        tokens_buf = _gather_beams(tokens_buf, beam_idx, b, k)
        finished = _gather_beams(finished, beam_idx, b, k)

        flat_tok = tok_idx.reshape(b * k)
        tokens_buf = tokens_buf.at[:, t].set(
            jnp.where(finished, dcfg.pad_token_id, flat_tok))
        finished = finished | (flat_tok == dcfg.eos_token_id)
        scores = top_scores.reshape(b * k)
        return (flat_tok[:, None], new_cache, scores, tokens_buf, finished), None

    init = (tok, cache, scores, tokens_buf, finished)
    (tok, cache, scores, tokens_buf, finished), _ = jax.lax.scan(
        step, init, jnp.arange(max_length))

    # pick best beam per batch element with length penalty over finished beams
    lengths = jnp.sum((tokens_buf != dcfg.pad_token_id).astype(jnp.int32),
                      axis=1)
    norm = jnp.power(jnp.maximum(lengths, 1).astype(jnp.float32),
                     length_penalty)
    final = scores / norm
    final = jnp.where(finished, final, final - 1e4)  # prefer finished beams
    best = jnp.argmax(final.reshape(b, k), axis=1)  # (B,)
    flat_best = jnp.arange(b) * k + best
    return tokens_buf[flat_best], lengths[flat_best]


# ----------------------------------------------------------------------------
# top-level speechmix generate
# ----------------------------------------------------------------------------

def generate(params, cfg: SpeechMixConfig, input_values, lengths=None,
             prompt_ids=None, max_length=None, num_beams=1,
             length_penalty=1.0, use_flash=False, dtype=jnp.float32,
             early_stop=False):
    """Full pipeline: waveform -> fused embeds -> text encoder (once) ->
    cached decode loop.  Equivalent of HFSpeechMixEED.generate
    (hf_model.py:304-338 + eval.py:12-14), including decoder_text_prompt via
    `prompt_ids`."""
    max_length = max_length or cfg.decoder.max_length
    inputs_embeds, enc_mask, _ = smx.encode_speech(
        params, cfg, input_values, lengths, prompt_ids,
        use_flash=use_flash, dtype=dtype)
    adapters = params.get("adapters") if cfg.variant == "adapter" else None
    if cfg.variant == "ed":
        # cross-attention fusion: the decoder attends the projected speech
        # states directly (no text-encoder pass)
        enc_hidden = inputs_embeds
    else:
        enc_out = seq2seq.encode(
            params["nlp"], cfg.decoder, inputs_embeds=inputs_embeds,
            attention_mask=enc_mask, use_flash=use_flash, adapters=adapters,
            dtype=dtype)
        enc_hidden = enc_out["last_hidden_state"]
    if num_beams <= 1:
        return greedy_decode(params["nlp"], cfg.decoder, enc_hidden,
                             enc_mask, max_length, dtype, adapters,
                             early_stop=early_stop, use_flash=use_flash)
    return beam_search(params["nlp"], cfg.decoder, enc_hidden, enc_mask,
                       max_length, num_beams, length_penalty, dtype, adapters,
                       use_flash=use_flash)


def jit_generate(cfg: SpeechMixConfig, max_length=None, num_beams=1,
                 use_flash=False, dtype=jnp.float32):
    """Compile-once wrapper keyed on static decode settings."""
    @partial(jax.jit, static_argnames=())
    def fn(params, input_values, lengths):
        return generate(params, cfg, input_values, lengths,
                        max_length=max_length, num_beams=num_beams,
                        use_flash=use_flash, dtype=dtype)
    return fn
