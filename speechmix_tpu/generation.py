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

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import SpeechMixConfig
from .models import seq2seq
from .models import speechmix as smx


# Shared cross-KV beam decode (round 5): beam/group/constrained search keep
# ONE cross-attention K/V projection per input row instead of tiling it
# num_beams times; seq2seq._cross_attention folds the beams into the einsum
# q axis.  Identical math (pinned token-exact in tests/test_generation.py);
# toggle kept for paired A/B measurement only.
_BEAM_SHARED_CROSS_KV = True


def set_beam_shared_cross_kv(on: bool):
    global _BEAM_SHARED_CROSS_KV
    _BEAM_SHARED_CROSS_KV = bool(on)


# ----------------------------------------------------------------------------
# HF LogitsProcessor stack
# ----------------------------------------------------------------------------

def _needs_history(repetition_penalty=1.0, no_repeat_ngram_size=0,
                   bad_words_ids=None, encoder_no_repeat_ngram_size=0,
                   prefix_allowed_tokens_fn=None, **_):
    """Whether the processor stack needs the sequence-so-far in the carry."""
    multi = any(len(w) > 1 for w in (bad_words_ids or ()))
    return (repetition_penalty != 1.0 or no_repeat_ngram_size > 0 or multi
            or encoder_no_repeat_ngram_size > 0
            or prefix_allowed_tokens_fn is not None)


def _process_logits_hf(logits, dcfg, step_idx, max_length, fullbuf=None,
                       repetition_penalty=1.0, no_repeat_ngram_size=0,
                       min_length=0, forced_bos_token_id=None,
                       forced_eos_token_id=None, bad_words_ids=None,
                       suppress_tokens=None, begin_suppress_tokens=None,
                       encoder_no_repeat_ngram_size=0, encoder_input_ids=None,
                       prefix_allowed_tokens_fn=None, prefix_beams=1):
    """The HF `generate()` LogitsProcessor stack on (N, V) scores, applied in
    transformers' order: RepetitionPenalty -> NoRepeatNGram ->
    EncoderNoRepeatNGram -> NoBadWords -> MinLength -> PrefixConstrained ->
    ForcedBOS -> ForcedEOS -> SuppressTokens -> SuppressTokensAtBegin (the
    reference inherits all of these through PreTrainedModel.generate,
    hf_model.py:304-338).

    step_idx: number of tokens generated so far (the token being chosen is
    generated token #step_idx; the current sequence INCLUDING the decoder
    start token has length step_idx+1 — HF's cur_len).
    fullbuf: (N, S) current sequence = [decoder_start] + generated tokens,
    pad-filled past step_idx+1; required only by the history-dependent
    processors (repetition penalty, no-repeat-ngram, encoder-no-repeat-ngram,
    prefix_allowed_tokens_fn).
    encoder_input_ids: (N, S_enc) int32, already tiled to the row count —
    the token sequence whose ngrams EncoderNoRepeatNGram bans (HF builds the
    ngram table over the full row, padding included).
    prefix_allowed_tokens_fn(batch_id, seq) -> iterable of allowed token ids
    runs on HOST via jax.pure_callback each step (one device sync per decode
    step — the same per-step host cost HF pays; seq is a 1-D numpy array of
    the current sequence including the decoder start).  prefix_beams is HF's
    PrefixConstrainedLogitsProcessor num_beams divisor for deriving batch_id
    from the row index (num_beams // num_beam_groups in HF's constructor).
    """
    neg = jnp.float32(-jnp.inf)
    n, v = logits.shape
    rows = jnp.arange(n)[:, None]
    seq_len = step_idx + 1  # HF cur_len

    if repetition_penalty != 1.0:
        valid = jnp.arange(fullbuf.shape[1])[None, :] < seq_len
        seen = jnp.zeros((n, v), jnp.int32).at[rows, fullbuf].add(
            valid.astype(jnp.int32)) > 0
        p = jnp.float32(repetition_penalty)
        logits = jnp.where(
            seen, jnp.where(logits > 0, logits / p, logits * p), logits)

    if no_repeat_ngram_size > 0:
        nsz = no_repeat_ngram_size
        s = fullbuf.shape[1]
        w = s - (nsz - 1)
        # the last nsz-1 tokens of the current sequence
        start = jnp.clip(seq_len - (nsz - 1), 0, s - (nsz - 1))
        prev = jax.lax.dynamic_slice_in_dim(fullbuf, start, nsz - 1, axis=1)
        match = jnp.ones((n, w), bool)
        for i in range(nsz - 1):
            match &= fullbuf[:, i: i + w] == prev[:, i][:, None]
        targets = fullbuf[:, nsz - 1: nsz - 1 + w]
        # window j is a complete existing ngram iff its last index < seq_len
        valid_j = (jnp.arange(w)[None, :] + nsz - 1) < seq_len
        banned = jnp.zeros((n, v), jnp.int32).at[rows, targets].add(
            (match & valid_j).astype(jnp.int32)) > 0
        logits = jnp.where(banned, neg, logits)

    if encoder_no_repeat_ngram_size > 0 and encoder_input_ids is not None:
        # HF EncoderNoRepeatNGramLogitsProcessor: ban token t when the last
        # nsz-1 DECODER tokens followed by t form an ngram of the encoder
        # input row (ngram table over the full row, pads included).  No ban
        # until the decoder history holds nsz-1 tokens (HF's short-slice
        # tuple misses the (nsz-1)-keyed dict).
        nsz = encoder_no_repeat_ngram_size
        m = nsz - 1
        s_enc = encoder_input_ids.shape[1]
        start = jnp.clip(seq_len - m, 0, fullbuf.shape[1] - m)
        prev = jax.lax.dynamic_slice_in_dim(fullbuf, start, m, axis=1)
        w = s_enc - m
        if w > 0:
            match = jnp.ones((n, w), bool)
            for i in range(m):
                match &= encoder_input_ids[:, i: i + w] == prev[:, i][:, None]
            targets = encoder_input_ids[:, m: m + w]
            banned = jnp.zeros((n, v), jnp.int32).at[rows, targets].add(
                match.astype(jnp.int32)) > 0
            banned &= seq_len >= m
            logits = jnp.where(banned, neg, logits)

    if bad_words_ids:
        # HF NoBadWordsLogitsProcessor: ban word[-1] whenever the last
        # len(word)-1 tokens of the current sequence equal word[:-1];
        # single-token words are banned at every step.  The word list is
        # static, so this unrolls to a handful of compares.  HF drops a
        # bad word equal to [eos_token_id] (generate passes eos to the
        # processor, which filters it) — mirrored.
        ban = jnp.zeros((n, v), bool)
        for word in bad_words_ids:
            word = [int(t) for t in word]
            if word == [dcfg.eos_token_id]:
                continue
            if len(word) == 1:
                ban = ban.at[:, word[0]].set(True)
                continue
            m = len(word) - 1
            start = jnp.clip(seq_len - m, 0, fullbuf.shape[1] - m)
            prev = jax.lax.dynamic_slice_in_dim(fullbuf, start, m, axis=1)
            match = jnp.all(
                prev == jnp.asarray(word[:-1], jnp.int32)[None, :], axis=1)
            match = match & (seq_len >= m)
            ban = ban.at[:, word[-1]].set(ban[:, word[-1]] | match)
        logits = jnp.where(ban, neg, logits)

    if min_length > 0:
        # EOS unreachable until the sequence can reach min_length GENERATED
        # tokens (EOS included) = HF's min_length - 1 (HF counts the start)
        too_short = step_idx < min_length - 1
        logits = logits.at[:, dcfg.eos_token_id].set(
            jnp.where(too_short, neg, logits[:, dcfg.eos_token_id]))

    if prefix_allowed_tokens_fn is not None:
        # HF PrefixConstrainedLogitsProcessor: mask everything the
        # user-supplied fn(batch_id, sent) does not allow.  The fn is
        # arbitrary host Python, so it runs via pure_callback on the padded
        # sequence buffer + the traced step (sliced to the live prefix on
        # host).  batch_id = row // prefix_beams, as in HF.
        def _host_mask(fb, t):
            fb = np.asarray(fb)
            cur = int(t) + 1
            mask = np.full((fb.shape[0], v), -np.inf, np.float32)
            for i in range(fb.shape[0]):
                allowed = prefix_allowed_tokens_fn(i // prefix_beams,
                                                   fb[i, :cur])
                allowed = list(allowed)
                if len(allowed) == 0:
                    raise ValueError(
                        "`prefix_allowed_tokens_fn` returned an empty list "
                        "as allowed tokens (HF generate contract)")
                mask[i, allowed] = 0.0
            return mask

        mask = jax.pure_callback(
            _host_mask, jax.ShapeDtypeStruct((n, v), jnp.float32),
            fullbuf, step_idx, vmap_method="sequential")
        logits = logits + mask

    if forced_bos_token_id is not None:
        forced = jnp.full_like(logits, neg) \
            .at[:, forced_bos_token_id].set(0.0)
        logits = jnp.where(step_idx == 0, forced, logits)

    if forced_eos_token_id is not None:
        forced = jnp.full_like(logits, neg) \
            .at[:, forced_eos_token_id].set(0.0)
        logits = jnp.where(step_idx == max_length - 1, forced, logits)

    if suppress_tokens:
        logits = logits.at[:, list(suppress_tokens)].set(neg)

    if begin_suppress_tokens:
        # HF SuppressTokensAtBeginLogitsProcessor fires at cur_len ==
        # begin_index (= the 1-token decoder start here) -> first generated
        # token only
        sup = logits.at[:, list(begin_suppress_tokens)].set(neg)
        logits = jnp.where(step_idx == 0, sup, logits)

    return logits


# ----------------------------------------------------------------------------
# greedy
# ----------------------------------------------------------------------------

def sample_filter_logits(logits, top_k=0, top_p=1.0, typical_p=1.0):
    """HF sampling-filter semantics on (B, V) f32 logits: keep the top_k
    highest-logit tokens (0 = off), then the smallest set whose cumulative
    probability reaches top_p (1.0 = off; the highest-probability token is
    always kept), then typical decoding's mass-typical_p set (1.0 = off) —
    HF's warper order (temperature -> top_k -> top_p -> typical_p in
    GenerationMixin._get_logits_processor).  Filtered positions become -inf.

    Tie caveat (documented divergence): filtering is by VALUE threshold, so
    exact ties at the k-th logit / the top_p boundary all survive — possibly
    more than top_k tokens or top_p mass, where HF's index-based cut keeps
    an arbitrary tie-broken subset.  Measure-zero for float logits from a
    real model; an index-based scatter-mask would restore exact HF behavior
    in degenerate distributions."""
    neg = jnp.float32(-jnp.inf)
    if top_k and top_k > 0:
        # HF TopKLogitsWarper clamps: top_k = min(top_k, vocab)
        k = min(int(top_k), logits.shape[-1])
        kth = jnp.sort(logits, axis=-1)[:, -k][:, None]
        logits = jnp.where(logits < kth, neg, logits)
    if top_p < 1.0:
        sorted_desc = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_desc, axis=-1)
        cum_excl = jnp.cumsum(probs, axis=-1) - probs
        keep = cum_excl < top_p
        # HF min_tokens_to_keep=1: the best token survives even top_p=0.0
        keep = keep.at[:, 0].set(True)
        kth = jnp.min(jnp.where(keep, sorted_desc, jnp.inf), axis=-1,
                      keepdims=True)
        logits = jnp.where(logits < kth, neg, logits)
    if typical_p < 1.0:
        # HF TypicalLogitsWarper: keep tokens whose "shifted score"
        # |(-log p) - H(p)| is below the pivot = the shifted score of the
        # last token inside the cumulative-probability mass, sorted by
        # typicality ascending (Meister et al. 2022).  -inf logits (already
        # filtered by top_k/top_p) contribute 0*log0 = 0 to the entropy
        # (torch nansum semantics).
        norm = jax.nn.log_softmax(logits, axis=-1)
        p = jnp.exp(norm)
        ent = -jnp.sum(jnp.where(p > 0, norm * p, 0.0), axis=-1,
                       keepdims=True)
        shifted = jnp.abs(-norm - ent)                 # -inf logit -> +inf
        sorted_shifted = jnp.sort(shifted, axis=-1)    # ascending
        order = jnp.argsort(shifted, axis=-1)
        sorted_probs = jnp.take_along_axis(p, order, axis=-1)
        cum = jnp.cumsum(sorted_probs, axis=-1)
        last_ind = jnp.sum((cum < typical_p).astype(jnp.int32), axis=-1)
        last_ind = jnp.clip(last_ind, 0, shifted.shape[-1] - 1)
        pivot = jnp.take_along_axis(sorted_shifted, last_ind[:, None],
                                    axis=-1)
        # HF removes shifted > pivot; min_tokens_to_keep=1 is automatic
        # (position 0 has the minimal shifted score <= pivot)
        logits = jnp.where(shifted > pivot, neg, logits)
    return logits


def greedy_decode(params, dcfg, enc_hidden, enc_mask, max_length,
                  dtype=jnp.float32, adapters=None, early_stop=False,
                  use_flash=False, kv_int8=False, do_sample=False,
                  temperature=1.0, top_k=0, top_p=1.0, typical_p=1.0,
                  rng=None, min_length=0, repetition_penalty=1.0,
                  no_repeat_ngram_size=0, forced_bos_token_id=None,
                  forced_eos_token_id=None, bad_words_ids=None,
                  suppress_tokens=None, begin_suppress_tokens=None,
                  output_scores=False, encoder_no_repeat_ngram_size=0,
                  encoder_input_ids=None, prefix_allowed_tokens_fn=None):
    """Greedy (or, with do_sample=True, ancestral-sampling) decode against a
    computed text-encoder output — the HF generate() surface: the
    LogitsProcessor stack (_process_logits_hf) then, when sampling, the
    temperature -> top_k -> top_p warper chain seeded by `rng`.

    Returns (tokens (B, max_length) padded with pad_token_id after EOS,
    lengths (B,)).  The EOS token itself is included in the output.

    early_stop=True uses lax.while_loop and exits as soon as every row has
    emitted EOS (output identical; saves up to ~half the decode time on real
    speech where transcripts end well before max_length).  The default scan
    always runs max_length steps — predictable cost, donation-friendly.

    output_scores=True additionally returns the per-step processed scores
    (max_length, B, V) f32 — HF generate(output_scores=True)'s `scores`
    tuple stacked (post-processors; post-warp when sampling).  Forces the
    scan path (the early-exit loop has no score buffer).
    """
    b = enc_hidden.shape[0]
    cache = seq2seq.init_decoder_cache(params, dcfg, enc_hidden, b,
                                       max_length, dtype, kv_int8=kv_int8)
    start = jnp.full((b, 1), dcfg.decoder_start_token_id, jnp.int32)
    if do_sample and rng is None:
        rng = jax.random.PRNGKey(0)
    if encoder_input_ids is not None:
        encoder_input_ids = jnp.asarray(encoder_input_ids, jnp.int32)
    # the history-dependent processors need the sequence so far in the carry
    needs_history = _needs_history(
        repetition_penalty, no_repeat_ngram_size, bad_words_ids,
        encoder_no_repeat_ngram_size
        if encoder_input_ids is not None else 0,
        prefix_allowed_tokens_fn)
    if output_scores:
        early_stop = False

    def one_step(tok, cache, finished, fullbuf, t):
        out = seq2seq.decode(params, dcfg, tok, encoder_mask=enc_mask,
                             cache=cache, adapters=adapters, dtype=dtype,
                             use_flash=use_flash)
        logits = out["logits"][:, -1, :]
        logits = _process_logits_hf(
            logits, dcfg, t, max_length, fullbuf=fullbuf,
            repetition_penalty=repetition_penalty,
            no_repeat_ngram_size=no_repeat_ngram_size, min_length=min_length,
            forced_bos_token_id=forced_bos_token_id,
            forced_eos_token_id=forced_eos_token_id,
            bad_words_ids=bad_words_ids, suppress_tokens=suppress_tokens,
            begin_suppress_tokens=begin_suppress_tokens,
            encoder_no_repeat_ngram_size=encoder_no_repeat_ngram_size,
            encoder_input_ids=encoder_input_ids,
            prefix_allowed_tokens_fn=prefix_allowed_tokens_fn,
            prefix_beams=1)
        if do_sample:
            logits = sample_filter_logits(
                logits / jnp.maximum(jnp.float32(temperature), 1e-6),
                top_k, top_p, typical_p)
            step_rng = jax.random.fold_in(rng, t)
            next_tok = jax.random.categorical(step_rng,
                                              logits).astype(jnp.int32)
        else:
            next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        next_tok = jnp.where(finished, dcfg.pad_token_id, next_tok)
        new_finished = finished | (next_tok == dcfg.eos_token_id)
        if fullbuf is not None:
            fullbuf = jax.lax.dynamic_update_slice(
                fullbuf, next_tok[:, None], (0, t + 1))
        return next_tok, out["cache"], new_finished, fullbuf, logits

    fullbuf0 = None
    if needs_history:
        fullbuf0 = jnp.full((b, max_length + 1), dcfg.pad_token_id,
                            jnp.int32).at[:, 0].set(
                                dcfg.decoder_start_token_id)

    if early_stop:
        tokens_buf = jnp.full((b, max_length), dcfg.pad_token_id, jnp.int32)

        def cond(carry):
            _, _, finished, _, _, t = carry
            return (t < max_length) & ~jnp.all(finished)

        def body(carry):
            tok, cache, finished, buf, fullbuf, t = carry
            next_tok, cache, finished, fullbuf, _ = one_step(
                tok, cache, finished, fullbuf, t)
            buf = jax.lax.dynamic_update_slice(buf, next_tok[:, None],
                                               (0, t))
            return (next_tok[:, None], cache, finished, buf, fullbuf, t + 1)

        (_, _, finished, tokens, _, _) = jax.lax.while_loop(
            cond, body,
            (start, cache, jnp.zeros((b,), bool), tokens_buf, fullbuf0,
             jnp.int32(0)))
        scores = None
    else:
        def step(carry, _):
            tok, cache, finished, fullbuf, t = carry
            next_tok, cache, finished, fullbuf, logits = one_step(
                tok, cache, finished, fullbuf, t)
            y = (next_tok, logits.astype(jnp.float32)) if output_scores \
                else next_tok
            return (next_tok[:, None], cache, finished, fullbuf,
                    t + 1), y

        (_, _, finished, _, _), ys = jax.lax.scan(
            step, (start, cache, jnp.zeros((b,), bool), fullbuf0,
                   jnp.int32(0)), None,
            length=max_length)
        if output_scores:
            tokens, scores = ys[0].T, ys[1]
        else:
            tokens, scores = ys.T, None  # (B, max_length)
    lengths = jnp.sum((tokens != dcfg.pad_token_id).astype(jnp.int32), axis=1)
    if output_scores:
        return tokens, lengths, scores
    return tokens, lengths


# ----------------------------------------------------------------------------
# beam search
# ----------------------------------------------------------------------------

# Self-KV reorder implementation: "auto" routes to the Pallas
# dynamic-block-index copy kernel on TPU when the layout supports it and
# falls back to the one-hot einsum; "einsum"/"pallas" force one path
# (the in-situ A/B in experiments/beam_serving.py flips this).
GATHER_CACHE_IMPL = "auto"


def _gather_cache(cache: seq2seq.DecoderCache, idx, batch, beams):
    """Cache leaves have a leading layer axis; reorder on the beam axis.

    Two exact formulations of the same row permutation:
    - Pallas dynamic-block-index copy (ops/pallas/beam_gather.py): the
      flat source-row array is scalar-prefetched and drives the input
      BlockSpec index_map, so the reorder lowers to straight per-row
      DMAs — the copy floor XLA's gather formulations can't reach
      (experiments/reorder_probe.py).  Default on TPU.
    - K x K one-hot einsum over the (L, B, Kin, R) view: the best XLA
      formulation (take_along_axis lowers to a slow general-gather,
      ~6.6 ms/step at beam-4 flagship shapes — the single biggest
      beam-step cost, measured by the no-reorder probe in
      experiments/beam_serving.py).  Fallback everywhere else."""
    from .ops.pallas import beam_gather as _bg

    sk = cache.self_kv
    supported = (hasattr(sk, "key")
                 and _bg.beam_gather_supported(sk.key, sk.value))
    if GATHER_CACHE_IMPL == "pallas" and not supported:
        raise ValueError("GATHER_CACHE_IMPL='pallas' forced but the self-KV "
                         "layout is unsupported (row bytes not lane-aligned)")
    use_pallas = GATHER_CACHE_IMPL == "pallas" or (
        GATHER_CACHE_IMPL == "auto"
        and jax.default_backend() == "tpu"
        and supported)
    if use_pallas:
        flat_src = (jnp.arange(batch, dtype=jnp.int32)[:, None] * beams
                    + idx.astype(jnp.int32)).reshape(-1)     # (B*Kout,)
        new_k, new_v = _bg.beam_gather(sk.key, sk.value, flat_src)
        new_self = seq2seq.KVCache(key=new_k, value=new_v, index=sk.index)
    else:
        onehot = jax.nn.one_hot(idx, beams, axis=-1)         # (B, Kout, Kin)

        def g(x):
            if not hasattr(x, "ndim") or x.ndim <= 1:
                return x
            l = x.shape[0]
            xr = x.reshape(l, batch, beams, -1)              # (L, B, Kin, R)
            out = jnp.einsum("boi,lbir->lbor", onehot.astype(x.dtype), xr,
                             preferred_element_type=x.dtype)
            return out.reshape(x.shape)
        new_self = jax.tree_util.tree_map(g, sk)
    # cross K/V (and scales) are invariant under beam reorder: every beam of
    # a batch row carries the identical tiled encoder projection, so
    # gathering them would be a full-size identity copy each step — skip it
    return seq2seq.DecoderCache(
        self_kv=new_self,
        cross_k=cache.cross_k, cross_v=cache.cross_v,
        cross_k_scale=cache.cross_k_scale,
        cross_v_scale=cache.cross_v_scale)



def _topk_over_beams(scores3, k2):
    """jax.lax.top_k over the flattened (K, V) axes of scores3 (B, K, V),
    computed as a per-beam top-k2 prepass + a (B, K*k2) merge.  Exact:
    same values, same flat indices, same tie ORDER (per-beam candidates
    stay in flat-index order, so equal values resolve to the lowest flat
    index exactly as the one-shot top_k does).  Why: XLA TPU TopK cost
    grows with the column count — at beam-4 flagship shapes the one-shot
    top_k over K*V = 201k columns dominates the beam step
    (experiments/topk_probe.py), while V-column top_ks amortize across
    the B*K rows."""
    b, k, v = scores3.shape
    if k == 1 or k2 > v:
        return jax.lax.top_k(scores3.reshape(b, k * v), k2)
    vals, idx = jax.lax.top_k(scores3.reshape(b * k, v), k2)
    flat = (idx.reshape(b, k, k2) +
            (jnp.arange(k, dtype=idx.dtype) * v)[None, :, None])
    top_v, pos = jax.lax.top_k(vals.reshape(b, k * k2), k2)
    top_i = jnp.take_along_axis(flat.reshape(b, k * k2), pos, axis=1)
    return top_v, top_i


def beam_search(params, dcfg, enc_hidden, enc_mask, max_length, num_beams=4,
                length_penalty=1.0, dtype=jnp.float32, adapters=None,
                use_flash=False, early_stopping=False, kv_int8=False,
                min_length=0, repetition_penalty=1.0,
                no_repeat_ngram_size=0, forced_bos_token_id=None,
                forced_eos_token_id=None, do_sample=False, temperature=1.0,
                top_k=0, top_p=1.0, typical_p=1.0, rng=None,
                num_return_sequences=1,
                output_scores=False, bad_words_ids=None,
                suppress_tokens=None, begin_suppress_tokens=None,
                encoder_no_repeat_ngram_size=0, encoder_input_ids=None,
                prefix_allowed_tokens_fn=None):
    """Batched beam search with HuggingFace `generate()` semantics — the
    surface the reference exposes (hf_model.py:304-338 delegates to HF
    PreTrainedModel.generate).  Re-derived for a lax.while_loop from the
    algorithm transformers' vectorized `_beam_search` implements:

      * 2*num_beams candidate continuations per step, so at least num_beams
        non-EOS beams always survive
      * hypotheses finishing on EOS (or at max length) move to a finished
        set scored sum_logprobs / num_generated**length_penalty; running
        beams keep raw cumulative log-probs
      * early-stop heuristic (early_stopping False | True | "never"):
        stop when the best possible running score can no longer beat the
        worst finished score
      * `max_length` counts GENERATED tokens (HF counts the decoder start
        too, so this equals HF max_length - 1)
      * the LogitsProcessor stack (_process_logits_hf) applies to the
        per-beam log-probs, as in HF's beam path
      * do_sample=True is HF beam-SAMPLE: the warper chain
        (temperature/top-k/top-p) applies to the accumulated scores, then
        2*num_beams candidates are drawn WITHOUT replacement from
        softmax over (num_beams*vocab) — implemented with the Gumbel
        top-k trick (jax RNG, so token-level HF parity is by construction
        impossible; semantics and score bookkeeping match HF beam_sample)

    Returns (tokens (B*num_return_sequences, max_length) — the top finished
    beams per row in score order, pad after EOS — and lengths).  With
    output_scores=True additionally returns `sequences_scores`
    (B*num_return_sequences,) — the length-penalized final beam scores, HF
    generate(output_scores=True, return_dict_in_generate=True)
    .sequences_scores.  Token-exact vs HF generate: tests/test_beam_hf.py.
    """
    b = enc_hidden.shape[0]
    k = num_beams
    k2 = 2 * k
    s_max = max_length
    neg = jnp.float32(-1e9)
    pad, eos = dcfg.pad_token_id, dcfg.eos_token_id
    nret = num_return_sequences
    if nret > k:
        raise ValueError(
            f"num_return_sequences ({nret}) must be <= num_beams ({k})")
    if do_sample and rng is None:
        rng = jax.random.PRNGKey(0)
    needs_history = _needs_history(
        repetition_penalty, no_repeat_ngram_size, bad_words_ids,
        encoder_no_repeat_ngram_size
        if encoder_input_ids is not None else 0,
        prefix_allowed_tokens_fn)

    rep = lambda x: jnp.repeat(x, k, axis=0)
    enc_ids_t = None
    if encoder_input_ids is not None:
        enc_ids_t = rep(jnp.asarray(encoder_input_ids, jnp.int32))
    if _BEAM_SHARED_CROSS_KV:
        # ONE cross projection per input row: decode folds the beams into
        # the einsum q axis (seq2seq._cross_attention shared-KV path) —
        # 1/k the cross-KV HBM stream per step (the decode bandwidth
        # floor) and 1/k the prefill projection FLOPs/memory.  A/B toggle:
        # set_beam_shared_cross_kv (experiments/beam_serving.py).
        cache0 = seq2seq.init_decoder_cache(params, dcfg, enc_hidden, b * k,
                                            s_max, dtype, kv_int8=kv_int8)
        dec_enc_mask = enc_mask
    else:
        cache0 = seq2seq.init_decoder_cache(params, dcfg, rep(enc_hidden),
                                            b * k, s_max, dtype,
                                            kv_int8=kv_int8)
        dec_enc_mask = rep(enc_mask)

    def gather(x, idx):
        """(B, N, ...) gathered to (B, idx.shape[1], ...)"""
        return jnp.take_along_axis(
            x, idx.reshape(b, idx.shape[1], *([1] * (x.ndim - 2))), axis=1)

    init = dict(
        s=jnp.int32(0),
        last_tok=jnp.full((b * k, 1), dcfg.decoder_start_token_id, jnp.int32),
        cache=cache0,
        running_seqs=jnp.full((b, k, s_max), pad, jnp.int32),
        # only beam 0 live at step 0 (prevents k copies of the same prefix)
        running_scores=jnp.broadcast_to(
            jnp.array([0.0] + [float(-1e9)] * (k - 1), jnp.float32), (b, k)),
        finished_seqs=jnp.full((b, k, s_max), pad, jnp.int32),
        finished_scores=jnp.full((b, k), float(-1e9), jnp.float32),
        is_finished=jnp.zeros((b, k), bool),
        # per-batch latch: can any running beam still improve the finished set
        unsat=jnp.ones((b, 1), bool),
        valid_cont=jnp.ones((), bool),
    )

    def cond(c):
        improvement_possible = jnp.any(c["unsat"])
        ok = (c["s"] < s_max) & improvement_possible & c["valid_cont"]
        if early_stopping is True:
            ok = ok & ~jnp.all(c["is_finished"])
        return ok

    def body(c):
        out = seq2seq.decode(params, dcfg, c["last_tok"],
                             encoder_mask=dec_enc_mask, cache=c["cache"],
                             adapters=adapters, dtype=dtype,
                             use_flash=use_flash)
        logp = jax.nn.log_softmax(
            out["logits"][:, -1, :].astype(jnp.float32), axis=-1)  # (B*K, V)
        fullbuf = None
        if needs_history:
            # per-beam sequence so far: [decoder_start] + running tokens
            fullbuf = jnp.concatenate(
                [jnp.full((b, k, 1), dcfg.decoder_start_token_id, jnp.int32),
                 c["running_seqs"]], axis=2).reshape(b * k, s_max + 1)
        logp = _process_logits_hf(
            logp, dcfg, c["s"], s_max, fullbuf=fullbuf,
            repetition_penalty=repetition_penalty,
            no_repeat_ngram_size=no_repeat_ngram_size, min_length=min_length,
            forced_bos_token_id=forced_bos_token_id,
            forced_eos_token_id=forced_eos_token_id,
            bad_words_ids=bad_words_ids, suppress_tokens=suppress_tokens,
            begin_suppress_tokens=begin_suppress_tokens,
            encoder_no_repeat_ngram_size=encoder_no_repeat_ngram_size,
            encoder_input_ids=enc_ids_t,
            prefix_allowed_tokens_fn=prefix_allowed_tokens_fn,
            prefix_beams=k)
        vocab = logp.shape[-1]
        acc = logp.reshape(b, k, vocab) + c["running_scores"][:, :, None]
        if do_sample:
            # HF beam_sample: warp the ACCUMULATED scores, then draw 2K
            # candidates without replacement from softmax over (K*V) —
            # Gumbel top-k is exactly that sampling scheme
            warped = sample_filter_logits(
                acc.reshape(b * k, vocab) /
                jnp.maximum(jnp.float32(temperature), 1e-6), top_k, top_p,
                typical_p)
            flat = warped.reshape(b, k * vocab)
            g = -jnp.log(-jnp.log(jax.random.uniform(
                jax.random.fold_in(rng, c["s"]), flat.shape,
                minval=1e-20, maxval=1.0) + 1e-20))
            _, topk_idx = _topk_over_beams(
                (flat + g).reshape(b, k, vocab), k2)
            topk_scores = jnp.take_along_axis(flat, topk_idx, axis=1)
            # HF sorts the sampled candidates by score descending
            order = jnp.argsort(-topk_scores, axis=1)
            topk_scores = jnp.take_along_axis(topk_scores, order, axis=1)
            topk_idx = jnp.take_along_axis(topk_idx, order, axis=1)
        else:
            topk_scores, topk_idx = _topk_over_beams(acc, k2)  # (B, 2K)
        src_beam = topk_idx // vocab
        tok = (topk_idx % vocab).astype(jnp.int32)
        topk_seqs = gather(c["running_seqs"], src_beam)      # (B, 2K, S)
        topk_seqs = jax.lax.dynamic_update_slice(
            topk_seqs, tok[:, :, None], (0, 0, c["s"]))
        hits = (tok == eos) | (c["s"] + 1 >= s_max)          # (B, 2K)

        # running beams for the next iteration: best k non-finished
        run_masked = topk_scores + jnp.where(hits, neg, 0.0)
        new_running_scores, run_sel = jax.lax.top_k(run_masked, k)
        new_running_seqs = gather(topk_seqs, run_sel)
        run_src = jnp.take_along_axis(src_beam, run_sel, axis=1)  # (B, K)
        new_last = jnp.take_along_axis(tok, run_sel, axis=1) \
            .reshape(b * k, 1)
        new_cache = _gather_cache(out["cache"], run_src, b, k)

        # finished set: only the top num_beams candidates may finalize
        did_finish = hits & (jnp.arange(k2) < k)[None, :]
        pen = topk_scores / (jnp.float32(c["s"] + 1) ** length_penalty)
        if early_stopping is True:
            pen = pen + jnp.where(
                jnp.all(c["is_finished"], axis=1, keepdims=True), neg, 0.0)
        pen = pen + jnp.where(c["unsat"], 0.0, neg)   # heuristic latch
        pen = pen + jnp.where(did_finish, 0.0, neg)
        merged_scores = jnp.concatenate([c["finished_scores"], pen], axis=1)
        merged_seqs = jnp.concatenate([c["finished_seqs"], topk_seqs], axis=1)
        merged_fin = jnp.concatenate([c["is_finished"], did_finish], axis=1)
        fin_scores, fin_sel = jax.lax.top_k(merged_scores, k)
        fin_seqs = gather(merged_seqs, fin_sel)
        is_fin = jnp.take_along_axis(merged_fin, fin_sel, axis=1)

        s_new = c["s"] + 1
        # early-stop heuristic (HF: False -> estimate with current length;
        # "never" + penalty>0 -> max length; latches once satisfied)
        if early_stopping == "never" and length_penalty > 0.0:
            best_len = jnp.float32(s_max)
        else:
            best_len = s_new.astype(jnp.float32)
        # HF is_done gets next_scores.max() — best of the FULL 2K candidate
        # pool (EOS candidates included), not the best surviving running beam
        best_possible = topk_scores[:, :1] / \
            (best_len ** length_penalty)                     # (B, 1)
        worst_fin = jnp.where(is_fin,
                              jnp.min(fin_scores, axis=1, keepdims=True),
                              neg)                           # (B, K)
        unsat = c["unsat"] & jnp.any(best_possible > worst_fin, axis=-1,
                                     keepdims=True)

        return dict(s=s_new, last_tok=new_last, cache=new_cache,
                    running_seqs=new_running_seqs,
                    running_scores=new_running_scores,
                    finished_seqs=fin_seqs, finished_scores=fin_scores,
                    is_finished=is_fin, unsat=unsat,
                    valid_cont=~jnp.all(hits))

    final = jax.lax.while_loop(cond, body, init)
    # top_k output is score-sorted: rows 0..nret-1 are the return set
    # (HF: num_return_sequences flattened into the batch axis)
    best_seqs = final["finished_seqs"][:, :nret, :].reshape(b * nret, s_max)
    lengths = jnp.sum((best_seqs != pad).astype(jnp.int32), axis=1)
    if output_scores:
        seq_scores = final["finished_scores"][:, :nret].reshape(b * nret)
        return best_seqs, lengths, seq_scores
    return best_seqs, lengths


def group_beam_search(params, dcfg, enc_hidden, enc_mask, max_length,
                      num_beams=4, num_beam_groups=2, diversity_penalty=0.0,
                      length_penalty=1.0, dtype=jnp.float32, adapters=None,
                      use_flash=False, early_stopping=False, kv_int8=False,
                      min_length=0, repetition_penalty=1.0,
                      no_repeat_ngram_size=0, forced_bos_token_id=None,
                      forced_eos_token_id=None, bad_words_ids=None,
                      suppress_tokens=None, begin_suppress_tokens=None,
                      num_return_sequences=1, output_scores=False,
                      encoder_no_repeat_ngram_size=0, encoder_input_ids=None,
                      prefix_allowed_tokens_fn=None):
    """Diverse (group) beam search with HF `generate(num_beam_groups=G,
    diversity_penalty=p)` semantics (transformers _group_beam_search;
    Vijayakumar et al. 2016) — the last sliver of the generate surface the
    reference inherits via PreTrainedModel.generate (hf_model.py:304-338).

    One model step decodes ALL num_beams rows; groups of
    group_size = num_beams // G are then processed SEQUENTIALLY within the
    step: group g's log-probs are penalized by
    ``diversity_penalty * count(token among groups < g's picks this step)``
    (HammingDiversityLogitsProcessor — applied FIRST, before the standard
    processor stack, matching HF's processor order), and each group runs
    its own 2*group_size-candidate beam bookkeeping with beam 0 of EVERY
    group live at step 0 (HF beam_scores[:, ::group_size] = 0).  Finalize
    pools all groups' finished hypotheses and returns the
    num_return_sequences best per batch row, HF row order.

    Token-exact vs HF generate: tests/test_beam_hf.py::test_group_beam*.
    """
    b = enc_hidden.shape[0]
    k, g_n = num_beams, num_beam_groups
    if k % g_n:
        raise ValueError(f"num_beams ({k}) must be divisible by "
                         f"num_beam_groups ({g_n})")
    kg = k // g_n
    k2g = 2 * kg
    s_max = max_length
    neg = jnp.float32(-1e9)
    pad, eos = dcfg.pad_token_id, dcfg.eos_token_id
    nret = num_return_sequences
    if nret > k:
        raise ValueError(
            f"num_return_sequences ({nret}) must be <= num_beams ({k})")
    needs_history = _needs_history(
        repetition_penalty, no_repeat_ngram_size, bad_words_ids,
        encoder_no_repeat_ngram_size
        if encoder_input_ids is not None else 0,
        prefix_allowed_tokens_fn)

    rep = lambda x: jnp.repeat(x, k, axis=0)
    enc_ids_g = None
    if encoder_input_ids is not None:
        # per-group processor rows are (B*kg): tile by the group size
        enc_ids_g = jnp.repeat(jnp.asarray(encoder_input_ids, jnp.int32),
                               kg, axis=0)
    if _BEAM_SHARED_CROSS_KV:
        # shared cross-KV across ALL k beams (see beam_search)
        cache0 = seq2seq.init_decoder_cache(params, dcfg, enc_hidden, b * k,
                                            s_max, dtype, kv_int8=kv_int8)
        dec_enc_mask = enc_mask
    else:
        cache0 = seq2seq.init_decoder_cache(params, dcfg, rep(enc_hidden),
                                            b * k, s_max, dtype,
                                            kv_int8=kv_int8)
        dec_enc_mask = rep(enc_mask)

    # beam 0 of each group live at step 0
    scores0 = jnp.where(jnp.arange(kg) == 0, 0.0, float(-1e9))
    init = dict(
        s=jnp.int32(0),
        last_tok=jnp.full((b * k, 1), dcfg.decoder_start_token_id,
                          jnp.int32),
        cache=cache0,
        running_seqs=jnp.full((b, g_n, kg, s_max), pad, jnp.int32),
        running_scores=jnp.broadcast_to(scores0.astype(jnp.float32),
                                        (b, g_n, kg)),
        finished_seqs=jnp.full((b, g_n, kg, s_max), pad, jnp.int32),
        finished_scores=jnp.full((b, g_n, kg), float(-1e9), jnp.float32),
        is_finished=jnp.zeros((b, g_n, kg), bool),
        unsat=jnp.ones((b, g_n), bool),
        valid_cont=jnp.ones((), bool),
    )

    def cond(c):
        ok = (c["s"] < s_max) & jnp.any(c["unsat"]) & c["valid_cont"]
        if early_stopping is True:
            ok = ok & ~jnp.all(c["is_finished"])
        return ok

    def body(c):
        out = seq2seq.decode(params, dcfg, c["last_tok"],
                             encoder_mask=dec_enc_mask, cache=c["cache"],
                             adapters=adapters, dtype=dtype,
                             use_flash=use_flash)
        logp_all = jax.nn.log_softmax(
            out["logits"][:, -1, :].astype(jnp.float32), axis=-1)
        vocab = logp_all.shape[-1]
        logp_all = logp_all.reshape(b, g_n, kg, vocab)

        counts = jnp.zeros((b, vocab), jnp.float32)  # picks by prior groups
        new = {key: [] for key in ("running_seqs", "running_scores",
                                   "finished_seqs", "finished_scores",
                                   "is_finished", "unsat", "last",
                                   "src_global", "hits_all")}
        for g in range(g_n):  # static unroll: groups are sequential by
            # construction (each sees the previous groups' picks this step)
            logp = logp_all[:, g].reshape(b * kg, vocab)
            if diversity_penalty > 0.0 and g > 0:
                logp = (logp.reshape(b, kg, vocab) -
                        diversity_penalty * counts[:, None, :]) \
                    .reshape(b * kg, vocab)
            fullbuf = None
            if needs_history:
                fullbuf = jnp.concatenate(
                    [jnp.full((b, kg, 1), dcfg.decoder_start_token_id,
                              jnp.int32), c["running_seqs"][:, g]],
                    axis=2).reshape(b * kg, s_max + 1)
            logp = _process_logits_hf(
                logp, dcfg, c["s"], s_max, fullbuf=fullbuf,
                repetition_penalty=repetition_penalty,
                no_repeat_ngram_size=no_repeat_ngram_size,
                min_length=min_length,
                forced_bos_token_id=forced_bos_token_id,
                forced_eos_token_id=forced_eos_token_id,
                bad_words_ids=bad_words_ids, suppress_tokens=suppress_tokens,
                begin_suppress_tokens=begin_suppress_tokens,
                encoder_no_repeat_ngram_size=encoder_no_repeat_ngram_size,
                encoder_input_ids=enc_ids_g,
                prefix_allowed_tokens_fn=prefix_allowed_tokens_fn,
                prefix_beams=kg)
            acc = logp.reshape(b, kg, vocab) + \
                c["running_scores"][:, g][:, :, None]
            topk_scores, topk_idx = _topk_over_beams(acc, k2g)  # (B, 2kg)
            src_beam = topk_idx // vocab
            tok = (topk_idx % vocab).astype(jnp.int32)
            topk_seqs = jnp.take_along_axis(
                c["running_seqs"][:, g],
                src_beam[:, :, None], axis=1)                # (B, 2kg, S)
            topk_seqs = jax.lax.dynamic_update_slice(
                topk_seqs, tok[:, :, None], (0, 0, c["s"]))
            hits = (tok == eos) | (c["s"] + 1 >= s_max)

            run_masked = topk_scores + jnp.where(hits, neg, 0.0)
            new_rs, run_sel = jax.lax.top_k(run_masked, kg)
            new_seqs = jnp.take_along_axis(topk_seqs,
                                           run_sel[:, :, None], axis=1)
            run_src = jnp.take_along_axis(src_beam, run_sel, axis=1)
            new_last = jnp.take_along_axis(tok, run_sel, axis=1)  # (B, kg)

            did_finish = hits & (jnp.arange(k2g) < kg)[None, :]
            pen = topk_scores / (jnp.float32(c["s"] + 1) ** length_penalty)
            if early_stopping is True:
                pen = pen + jnp.where(
                    jnp.all(c["is_finished"][:, g], axis=1, keepdims=True),
                    neg, 0.0)
            pen = pen + jnp.where(c["unsat"][:, g][:, None], 0.0, neg)
            pen = pen + jnp.where(did_finish, 0.0, neg)
            m_scores = jnp.concatenate([c["finished_scores"][:, g], pen],
                                       axis=1)
            m_seqs = jnp.concatenate([c["finished_seqs"][:, g], topk_seqs],
                                     axis=1)
            m_fin = jnp.concatenate([c["is_finished"][:, g], did_finish],
                                    axis=1)
            fin_scores, fin_sel = jax.lax.top_k(m_scores, kg)
            fin_seqs = jnp.take_along_axis(m_seqs, fin_sel[:, :, None],
                                           axis=1)
            is_fin = jnp.take_along_axis(m_fin, fin_sel, axis=1)

            if early_stopping == "never" and length_penalty > 0.0:
                best_len = jnp.float32(s_max)
            else:
                best_len = (c["s"] + 1).astype(jnp.float32)
            # HF is_done uses next_scores.max() — the best of the FULL 2kg
            # candidate pool (EOS candidates included), not the best
            # surviving running beam (beam_search.py process():93-94)
            best_possible = topk_scores[:, :1] / (best_len ** length_penalty)
            worst_fin = jnp.where(
                is_fin, jnp.min(fin_scores, axis=1, keepdims=True), neg)
            unsat_g = c["unsat"][:, g] & jnp.any(
                best_possible > worst_fin, axis=-1)

            # done groups emit pad tokens in HF process(); those pads are
            # what the Hamming diversity processor counts for later groups
            picks = jnp.where(c["unsat"][:, g][:, None], new_last, pad)
            counts = counts + jnp.sum(
                jax.nn.one_hot(picks, vocab, dtype=jnp.float32), axis=1)
            new["running_seqs"].append(new_seqs)
            new["running_scores"].append(new_rs)
            new["finished_seqs"].append(fin_seqs)
            new["finished_scores"].append(fin_scores)
            new["is_finished"].append(is_fin)
            new["unsat"].append(unsat_g)
            new["last"].append(new_last)
            new["src_global"].append(g * kg + run_src)
            new["hits_all"].append(hits)

        stack = lambda key: jnp.stack(new[key], axis=1)
        src_global = stack("src_global").reshape(b, k)
        return dict(
            s=c["s"] + 1,
            last_tok=stack("last").reshape(b * k, 1),
            cache=_gather_cache(out["cache"], src_global, b, k),
            running_seqs=stack("running_seqs"),
            running_scores=stack("running_scores"),
            finished_seqs=stack("finished_seqs"),
            finished_scores=stack("finished_scores"),
            is_finished=stack("is_finished"),
            unsat=stack("unsat"),
            valid_cont=~jnp.all(stack("hits_all")),
        )

    final = jax.lax.while_loop(cond, body, init)
    # finalize: pool every group's hypotheses, best nret per batch row
    pool_scores = final["finished_scores"].reshape(b, k)
    pool_seqs = final["finished_seqs"].reshape(b, k, s_max)
    best_scores, best_sel = jax.lax.top_k(pool_scores, nret)
    best_seqs = jnp.take_along_axis(pool_seqs, best_sel[:, :, None],
                                    axis=1).reshape(b * nret, s_max)
    lengths = jnp.sum((best_seqs != pad).astype(jnp.int32), axis=1)
    if output_scores:
        return best_seqs, lengths, best_scores.reshape(b * nret)
    return best_seqs, lengths


# ----------------------------------------------------------------------------
# constrained beam search (force_words_ids)
# ----------------------------------------------------------------------------
#
# HF's `generate(force_words_ids=...)` dispatches to constrained beam search
# (ConstrainedBeamSearchScorer + PhrasalConstraint/DisjunctiveConstraint —
# transformers/generation/beam_search.py; inherited by the reference through
# PreTrainedModel.generate, hf_model.py:304-338).  Re-derived here for a
# static-shape lax.while_loop:
#
#   * every constraint compiles to a token TRIE (a phrasal word is a chain;
#     a disjunctive word-set shares prefixes), concatenated into static
#     edge tables — the whole ConstraintListState becomes three arrays per
#     beam: completed (C,) bool, inprogress constraint id, trie node
#   * each step runs the vanilla 2K-candidate advancement, then adds
#     "forced-advance" candidates (each running beam + each token that
#     advances its constraints, scored from the full-vocab cumulative
#     scores), dedups them against the selected set by sequence equality,
#     and re-ranks the union by HF's bank round-robin (sort by
#     bank*100+score desc, then stable-argsort of within-bank rank)
#   * EOS candidates only finalize when the source beam's constraint state
#     is complete; at max length, incomplete beams are admitted only as the
#     fallback when fewer than num_return_sequences complete beams exist

class _ConstraintTables(NamedTuple):
    """Static trie tables for a constraint list (one trie per constraint,
    nodes globally numbered; edge slots padded with token -1)."""
    edges_tok: jnp.ndarray    # (N_nodes, E) int32 edge tokens, -1 = empty
    edges_next: jnp.ndarray   # (N_nodes, E) int32 target node
    edges_leaf: jnp.ndarray   # (N_nodes, E) bool: target completes the word
    roots: jnp.ndarray        # (C,) int32 root node per constraint
    c_seqlen: jnp.ndarray     # (C,) int32 constraint seqlen (max word len)
    node_depth: jnp.ndarray   # (N_nodes,) int32 tokens consumed at node
    max_seqlen: int           # max over constraints (HF bank unit)
    n_constraints: int
    adv_width: int            # advance-candidate slots per beam (C * E)


def _build_constraint_tables(force_words_ids) -> _ConstraintTables:
    """Compile force_words_ids into static trie tables.  Accepts HF's two
    shapes: a constraint entry that is a list of ints (PhrasalConstraint)
    or a list of lists of ints (DisjunctiveConstraint), with HF's
    validation (positive ints, no word a prefix/subset of a sibling)."""
    if not isinstance(force_words_ids, (list, tuple)) or \
            len(force_words_ids) == 0:
        raise ValueError(
            f"`force_words_ids` has to be a non-empty list, but is "
            f"{force_words_ids}")
    nodes = []          # edge dict per node: token -> node id
    depth = []
    roots, seqlens = [], []
    for entry in force_words_ids:
        if not isinstance(entry, (list, tuple)) or len(entry) == 0:
            raise ValueError(
                f"constraint entries must be non-empty lists, got {entry}")
        if isinstance(entry[0], (list, tuple)):
            words = [list(map(int, w)) for w in entry]
        else:
            words = [list(map(int, entry))]
        for w in words:
            if len(w) == 0 or any(t < 0 for t in w):
                raise ValueError(
                    f"each word has to be a non-empty list of positive "
                    f"integers, but got {w} in {entry}")
        root = len(nodes)
        nodes.append({})
        depth.append(0)
        roots.append(root)
        seqlens.append(max(len(w) for w in words))
        for w in words:
            cur = root
            for t in w:
                if t not in nodes[cur]:
                    nodes.append({})
                    depth.append(depth[cur] + 1)
                    nodes[cur][t] = len(nodes) - 1
                cur = nodes[cur][t]
        # HF DisjunctiveTrie(no_subsets=True): #leaves must equal #words
        def _leaves(n):
            kids = nodes[n].values()
            return 1 if not kids else sum(_leaves(c) for c in kids)
        if _leaves(root) != len(words):
            raise ValueError(
                f"Each list in `force_words_ids` can't be a complete "
                f"subset of another list, but is {entry}")
    n_nodes = len(nodes)
    e_max = max(1, max(len(d) for d in nodes))
    et = np.full((n_nodes, e_max), -1, np.int32)
    en = np.zeros((n_nodes, e_max), np.int32)
    el = np.zeros((n_nodes, e_max), bool)
    for n, d in enumerate(nodes):
        for j, (t, nn) in enumerate(d.items()):
            et[n, j] = t
            en[n, j] = nn
            el[n, j] = len(nodes[nn]) == 0
    c = len(roots)
    return _ConstraintTables(
        edges_tok=jnp.asarray(et), edges_next=jnp.asarray(en),
        edges_leaf=jnp.asarray(el), roots=jnp.asarray(roots, jnp.int32),
        c_seqlen=jnp.asarray(seqlens, jnp.int32),
        node_depth=jnp.asarray(depth, jnp.int32),
        max_seqlen=int(max(seqlens)), n_constraints=c,
        adv_width=c * e_max)


def _ct_add_token(ct: _ConstraintTables, state, tok):
    """HF ConstraintListState.add(token), elementwise over leading dims.

    state: dict with completed (..., C) bool, inprog (...,) int32 (-1 =
    none), node (...,) int32 (trie node of the inprogress constraint),
    stamp (..., C) int32 (pending-list arrival order — HF appends a RESET
    constraint at the END of pending_constraints, so list order mutates),
    ctr (...,) int32 (next stamp).  tok (...,) int32.

    Semantics (beam_constraints.py):
      * all complete: no-op
      * a constraint in progress: token matching one of its trie edges
        advances it (completing on a leaf edge); a mismatch drops it back
        to pending with ALL progress lost (stamped to the back of the
        list), and the token is NOT retried against other constraints in
        the same add
      * otherwise: the FIRST pending constraint (pending-list order, i.e.
        lowest stamp) whose root has a matching edge starts progressing
    """
    completed, inprog, node = state["completed"], state["inprog"], \
        state["node"]
    stamp, ctr = state["stamp"], state["ctr"]
    c = ct.n_constraints
    all_done = completed.all(-1)
    # --- in-progress path: match tok against the current node's edges
    e_tok = ct.edges_tok[node]                      # (..., E)
    m = (e_tok == tok[..., None]) & (e_tok >= 0)
    any_m = m.any(-1)
    sel = jnp.argmax(m, -1)
    nxt = jnp.take_along_axis(ct.edges_next[node], sel[..., None],
                              -1)[..., 0]
    leaf = jnp.take_along_axis(ct.edges_leaf[node], sel[..., None],
                               -1)[..., 0]
    onehot_ip = jax.nn.one_hot(inprog, c, dtype=bool)
    comp_ip = completed | (onehot_ip & (any_m & leaf)[..., None])
    inprog_ip = jnp.where(any_m & ~leaf, inprog, -1)
    node_ip = jnp.where(any_m & ~leaf, nxt, 0)
    # a mismatch re-appends the constraint at the END of pending
    reset_ip = ~any_m
    stamp_ip = jnp.where((onehot_ip & reset_ip[..., None]),
                         ctr[..., None], stamp)
    ctr_ip = ctr + reset_ip.astype(jnp.int32)
    # --- pending-scan path: first pending (lowest stamp) constraint whose
    # root edges match tok
    root_tok = ct.edges_tok[ct.roots]               # (C, E)
    shape = tok.shape
    rmatch = (jnp.broadcast_to(root_tok, shape + root_tok.shape)
              == tok[..., None, None]) & (root_tok >= 0)
    rany = rmatch.any(-1) & ~completed              # (..., C)
    has_c = rany.any(-1)
    big = jnp.int32(1 << 30)
    first = jnp.argmin(jnp.where(rany, stamp, big), -1)      # (...,)
    rnode = ct.roots[first]
    re_tok = ct.edges_tok[rnode]
    m2 = (re_tok == tok[..., None]) & (re_tok >= 0)
    sel2 = jnp.argmax(m2, -1)
    nxt2 = jnp.take_along_axis(ct.edges_next[rnode], sel2[..., None],
                               -1)[..., 0]
    leaf2 = jnp.take_along_axis(ct.edges_leaf[rnode], sel2[..., None],
                                -1)[..., 0]
    comp_p = completed | (jax.nn.one_hot(first, c, dtype=bool)
                          & (has_c & leaf2)[..., None])
    inprog_p = jnp.where(has_c & ~leaf2, first, -1)
    node_p = jnp.where(has_c & ~leaf2, nxt2, 0)
    # --- combine
    has_ip = inprog >= 0
    sel_ip = lambda a, b_: jnp.where(has_ip, a, b_)
    sel_ipC = lambda a, b_: jnp.where(has_ip[..., None], a, b_)
    keep = lambda new, old: jnp.where(all_done, old, new)
    keepC = lambda new, old: jnp.where(all_done[..., None], old, new)
    return dict(
        completed=keepC(sel_ipC(comp_ip, comp_p), completed),
        inprog=keep(sel_ip(inprog_ip, inprog_p), inprog),
        node=keep(sel_ip(node_ip, node_p), node),
        stamp=keepC(sel_ipC(stamp_ip, stamp), stamp),
        ctr=keep(sel_ip(ctr_ip, ctr), ctr))


def _ct_init_state(ct: _ConstraintTables, shape):
    c = ct.n_constraints
    return dict(
        completed=jnp.zeros(shape + (c,), bool),
        inprog=jnp.full(shape, -1, jnp.int32),
        node=jnp.zeros(shape, jnp.int32),
        stamp=jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32),
                               shape + (c,)),
        ctr=jnp.full(shape, c, jnp.int32))


def _ct_bank(ct: _ConstraintTables, state):
    """HF ConstraintListState.get_bank(): completed constraints count
    max_seqlen each; an in-progress constraint adds
    max_seqlen - remaining = max_seqlen - (its seqlen - trie depth)."""
    inprog, node = state["inprog"], state["node"]
    ncomp = state["completed"].sum(-1).astype(jnp.int32)
    has_ip = inprog >= 0
    rem = ct.c_seqlen[jnp.maximum(inprog, 0)] - ct.node_depth[node]
    add = jnp.where(has_ip, ct.max_seqlen - rem, 0)
    return ncomp * ct.max_seqlen + add


def _ct_advance_tokens(ct: _ConstraintTables, state):
    """HF ConstraintListState.advance(): the in-progress constraint's next
    trie edges, or every pending constraint's root edges.  Returns
    (..., adv_width) int32 with -1 padding (duplicates possible, exactly
    as HF's list — downstream dedup removes them).  Divergence from HF:
    the pending constraints emit their root tokens in constraint-index
    order, not mutated-pending-list order — this can only permute equal-
    score candidates, which the stable rank sort then orders identically
    unless scores tie exactly."""
    c = ct.n_constraints
    e = ct.edges_tok.shape[1]
    completed, inprog, node = state["completed"], state["inprog"], \
        state["node"]
    ip_adv = ct.edges_tok[node]                     # (..., E)
    pad = jnp.full(ip_adv.shape[:-1] + ((c - 1) * e,), -1, jnp.int32)
    ip_full = jnp.concatenate([ip_adv, pad], -1) if c > 1 else ip_adv
    pend = jnp.where(completed[..., None], -1,
                     ct.edges_tok[ct.roots])        # (..., C, E)
    pend_full = pend.reshape(pend.shape[:-2] + (c * e,))
    return jnp.where((inprog >= 0)[..., None], ip_full, pend_full)


def constrained_beam_search(params, dcfg, enc_hidden, enc_mask, max_length,
                            force_words_ids, num_beams=4, length_penalty=1.0,
                            dtype=jnp.float32, adapters=None, use_flash=False,
                            early_stopping=False, kv_int8=False,
                            min_length=0, repetition_penalty=1.0,
                            no_repeat_ngram_size=0, forced_bos_token_id=None,
                            forced_eos_token_id=None, bad_words_ids=None,
                            suppress_tokens=None, begin_suppress_tokens=None,
                            encoder_no_repeat_ngram_size=0,
                            encoder_input_ids=None,
                            prefix_allowed_tokens_fn=None,
                            num_return_sequences=1, output_scores=False):
    """HF `generate(force_words_ids=...)` — constrained beam search, token-
    exact vs HF's ConstrainedBeamSearchScorer execution
    (tests/test_constrained_beam.py).  See the block comment above for the
    static-shape re-derivation.  max_length counts GENERATED tokens (HF
    max_length - 1), as everywhere in this module."""
    b = enc_hidden.shape[0]
    k = num_beams
    if k <= 1:
        raise ValueError(
            f"`num_beams` has to be an integer strictly greater than 1 for "
            f"constrained beam search, but is {k}")
    k2 = 2 * k
    s_max = max_length
    neg = jnp.float32(-1e9)
    pad, eos = dcfg.pad_token_id, dcfg.eos_token_id
    nret = num_return_sequences
    if nret > k:
        raise ValueError(
            f"num_return_sequences ({nret}) must be <= num_beams ({k})")
    ct = _build_constraint_tables(force_words_ids)
    c_n = ct.n_constraints
    a_w = ct.adv_width
    n_cand = k + k * a_w    # selected + forced-advance candidates
    needs_history = _needs_history(
        repetition_penalty, no_repeat_ngram_size, bad_words_ids,
        encoder_no_repeat_ngram_size
        if encoder_input_ids is not None else 0,
        prefix_allowed_tokens_fn)

    rep = lambda x: jnp.repeat(x, k, axis=0)
    enc_ids_t = None
    if encoder_input_ids is not None:
        enc_ids_t = rep(jnp.asarray(encoder_input_ids, jnp.int32))
    if _BEAM_SHARED_CROSS_KV:
        # ONE cross projection per input row: decode folds the beams into
        # the einsum q axis (seq2seq._cross_attention shared-KV path) —
        # 1/k the cross-KV HBM stream per step (the decode bandwidth
        # floor) and 1/k the prefill projection FLOPs/memory.  A/B toggle:
        # set_beam_shared_cross_kv (experiments/beam_serving.py).
        cache0 = seq2seq.init_decoder_cache(params, dcfg, enc_hidden, b * k,
                                            s_max, dtype, kv_int8=kv_int8)
        dec_enc_mask = enc_mask
    else:
        cache0 = seq2seq.init_decoder_cache(params, dcfg, rep(enc_hidden),
                                            b * k, s_max, dtype,
                                            kv_int8=kv_int8)
        dec_enc_mask = rep(enc_mask)

    def gather(x, idx):
        return jnp.take_along_axis(
            x, idx.reshape(b, idx.shape[1], *([1] * (x.ndim - 2))), axis=1)

    # constraint state of every beam starts from HF's replay of the initial
    # input_ids — which contain the decoder start token
    st0 = _ct_add_token(
        ct, _ct_init_state(ct, (b, k)),
        jnp.full((b, k), dcfg.decoder_start_token_id, jnp.int32))

    init = dict(
        s=jnp.int32(0),
        last_tok=jnp.full((b * k, 1), dcfg.decoder_start_token_id, jnp.int32),
        cache=cache0,
        running_seqs=jnp.full((b, k, s_max), pad, jnp.int32),
        running_scores=jnp.broadcast_to(
            jnp.array([0.0] + [float(-1e9)] * (k - 1), jnp.float32), (b, k)),
        st=st0,
        finished_seqs=jnp.full((b, k, s_max), pad, jnp.int32),
        finished_scores=jnp.full((b, k), float(-1e9), jnp.float32),
        is_finished=jnp.zeros((b, k), bool),
        unsat=jnp.ones((b, 1), bool),
        valid_cont=jnp.ones((), bool),
    )

    def cond(c):
        ok = (c["s"] < s_max) & jnp.any(c["unsat"]) & c["valid_cont"]
        if early_stopping is True:
            ok = ok & ~jnp.all(c["is_finished"])
        return ok

    def body(c):
        out = seq2seq.decode(params, dcfg, c["last_tok"],
                             encoder_mask=dec_enc_mask, cache=c["cache"],
                             adapters=adapters, dtype=dtype,
                             use_flash=use_flash)
        logp = jax.nn.log_softmax(
            out["logits"][:, -1, :].astype(jnp.float32), axis=-1)
        fullbuf = None
        if needs_history:
            fullbuf = jnp.concatenate(
                [jnp.full((b, k, 1), dcfg.decoder_start_token_id, jnp.int32),
                 c["running_seqs"]], axis=2).reshape(b * k, s_max + 1)
        logp = _process_logits_hf(
            logp, dcfg, c["s"], s_max, fullbuf=fullbuf,
            repetition_penalty=repetition_penalty,
            no_repeat_ngram_size=no_repeat_ngram_size, min_length=min_length,
            forced_bos_token_id=forced_bos_token_id,
            forced_eos_token_id=forced_eos_token_id,
            bad_words_ids=bad_words_ids, suppress_tokens=suppress_tokens,
            begin_suppress_tokens=begin_suppress_tokens,
            encoder_no_repeat_ngram_size=encoder_no_repeat_ngram_size,
            encoder_input_ids=enc_ids_t,
            prefix_allowed_tokens_fn=prefix_allowed_tokens_fn,
            prefix_beams=k)
        vocab = logp.shape[-1]
        acc = logp.reshape(b, k, vocab) + c["running_scores"][:, :, None]
        # ------- vanilla 2K advancement -------
        topk_scores, topk_idx = _topk_over_beams(acc, k2)
        src_beam = topk_idx // vocab                         # (B, 2K)
        tok = (topk_idx % vocab).astype(jnp.int32)
        hits = tok == eos                                    # EOS only;
        # max-length finalization runs AFTER the loop with the constraint
        # fallback (HF ConstrainedBeamSearchScorer.finalize)

        # the 2K candidates' SOURCE-beam constraint completion (scorer
        # checks input_ids WITHOUT the EOS token)
        src_complete_all = gather(c["st"]["completed"],
                                  src_beam).all(-1)          # (B, 2K)

        topk_seqs = gather(c["running_seqs"], src_beam)
        topk_seqs = jax.lax.dynamic_update_slice(
            topk_seqs, tok[:, :, None], (0, 0, c["s"]))

        # finished set: EOS candidates from the top-K ranks whose SOURCE
        # beam satisfies every constraint (scorer.process:
        # check_completes_constraints on input_ids WITHOUT the EOS)
        did_finish = hits & (jnp.arange(k2) < k)[None, :] & src_complete_all
        pen = topk_scores / (jnp.float32(c["s"] + 1) ** length_penalty)
        if early_stopping is True:
            pen = pen + jnp.where(
                jnp.all(c["is_finished"], axis=1, keepdims=True), neg, 0.0)
        pen = pen + jnp.where(c["unsat"], 0.0, neg)
        pen = pen + jnp.where(did_finish, 0.0, neg)
        merged_scores = jnp.concatenate([c["finished_scores"], pen], axis=1)
        merged_seqs = jnp.concatenate([c["finished_seqs"], topk_seqs], axis=1)
        merged_fin = jnp.concatenate([c["is_finished"], did_finish], axis=1)
        fin_scores, fin_sel = jax.lax.top_k(merged_scores, k)
        fin_seqs = gather(merged_seqs, fin_sel)
        is_fin = jnp.take_along_axis(merged_fin, fin_sel, axis=1)

        # running candidates: best K non-EOS, in score order (the scorer's
        # sent_beam_* before step_sentence_constraint)
        run_masked = topk_scores + jnp.where(hits, neg, 0.0)
        sel_scores, run_sel = jax.lax.top_k(run_masked, k)   # (B, K)
        sel_tok = jnp.take_along_axis(tok, run_sel, axis=1)
        sel_src = jnp.take_along_axis(src_beam, run_sel, axis=1)

        # ------- forced-advance candidates (step_sentence_constraint) ----
        adv_tok = _ct_advance_tokens(ct, c["st"])            # (B, K, A)
        adv_valid = adv_tok >= 0
        adv_scores = jnp.take_along_axis(
            acc, jnp.maximum(adv_tok, 0), axis=-1)           # (B, K, A)
        adv_src = jnp.broadcast_to(jnp.arange(k)[None, :, None],
                                   (b, k, a_w))

        # ------- candidate union: K selected then K*A advance ------------
        cand_tok = jnp.concatenate(
            [sel_tok, adv_tok.reshape(b, k * a_w)], axis=1)  # (B, Nc)
        cand_src = jnp.concatenate(
            [sel_src, adv_src.reshape(b, k * a_w)], axis=1)
        cand_scores = jnp.concatenate(
            [sel_scores, adv_scores.reshape(b, k * a_w)], axis=1)
        cand_valid = jnp.concatenate(
            [jnp.ones((b, k), bool), adv_valid.reshape(b, k * a_w)], axis=1)

        # states after adding each candidate's token
        def gc(x):
            if x.ndim == 2:        # (B, K) scalar-per-beam leaf
                return gather(x[..., None], cand_src)[..., 0]
            return gather(x, cand_src)
        cand_st = _ct_add_token(
            ct, jax.tree_util.tree_map(gc, c["st"]), cand_tok)
        banks = _ct_bank(ct, cand_st)                        # (B, Nc)

        # dedup (HF: `advance_seq not in track_new["new_seqs"]`): an advance
        # candidate equal — as a token sequence — to a selected candidate or
        # an earlier advance candidate is dropped.  Sequences are equal iff
        # their source beams carry identical buffers and the tokens match.
        rs = c["running_seqs"]
        seq_eq = jnp.all(rs[:, :, None, :] == rs[:, None, :, :],
                         axis=-1)                            # (B, K, K)
        pair_src_eq = seq_eq[jnp.arange(b)[:, None, None],
                             cand_src[:, :, None], cand_src[:, None, :]]
        pair_eq = pair_src_eq & (cand_tok[:, :, None]
                                 == cand_tok[:, None, :]) \
            & cand_valid[:, :, None] & cand_valid[:, None, :]
        earlier = jnp.tril(jnp.ones((n_cand, n_cand), bool), -1)[None]
        is_dup = jnp.any(pair_eq & earlier, axis=2)
        is_dup = is_dup.at[:, :k].set(False)                 # selected stay
        cand_valid = cand_valid & ~is_dup

        any_new = jnp.any(cand_valid[:, k:], axis=1)         # (B,)

        # ------- bank round-robin re-rank (HF step_sentence_constraint) --
        zipped = banks.astype(jnp.float32) * 100.0 + cand_scores
        zipped = jnp.where(cand_valid, zipped, -jnp.float32(1e30))
        order = jnp.argsort(-zipped, axis=1)                 # (B, Nc) desc
        banks_sorted = jnp.take_along_axis(
            jnp.where(cand_valid, banks, -1), order, axis=1)
        valid_sorted = jnp.take_along_axis(cand_valid, order, axis=1)
        lower = jnp.tril(jnp.ones((n_cand, n_cand), bool), -1)[None]
        same_before = jnp.sum(
            (banks_sorted[:, None, :] == banks_sorted[:, :, None]) & lower,
            axis=2)                                          # (B, Nc)
        increments = jnp.where(valid_sorted, same_before,
                               n_cand + jnp.arange(n_cand)[None, :])
        rearr = jnp.argsort(increments, axis=1)              # stable
        merged_idx = jnp.take_along_axis(order, rearr, axis=1)[:, :k]

        # HF only re-ranks when at least one new candidate was added;
        # otherwise the selected K keep their score order
        plain_idx = jnp.broadcast_to(jnp.arange(k)[None], (b, k))
        final_idx = jnp.where(any_new[:, None], merged_idx, plain_idx)

        def pick(x):
            return jnp.take_along_axis(x, final_idx, axis=1)

        new_running_scores = pick(cand_scores)
        new_tok = pick(cand_tok)
        new_src = pick(cand_src)
        new_running_seqs = gather(c["running_seqs"], new_src)
        new_running_seqs = jax.lax.dynamic_update_slice(
            new_running_seqs, new_tok[:, :, None], (0, 0, c["s"]))

        def pick_st(x):
            if x.ndim == 2:
                return jnp.take_along_axis(x, final_idx, axis=1)
            return jnp.take_along_axis(x, final_idx[:, :, None], axis=1)
        new_st = jax.tree_util.tree_map(pick_st, cand_st)
        new_cache = _gather_cache(out["cache"], new_src, b, k)
        new_last = new_tok.reshape(b * k, 1)

        s_new = c["s"] + 1
        if early_stopping == "never" and length_penalty > 0.0:
            best_len = jnp.float32(s_max)
        else:
            best_len = s_new.astype(jnp.float32)
        # HF is_done gets next_scores.max() — the best of the vanilla 2K
        # pool (advance candidates are NOT consulted)
        best_possible = topk_scores[:, :1] / (best_len ** length_penalty)
        worst_fin = jnp.where(is_fin,
                              jnp.min(fin_scores, axis=1, keepdims=True),
                              neg)
        unsat = c["unsat"] & jnp.any(best_possible > worst_fin, axis=-1,
                                     keepdims=True)

        return dict(s=s_new, last_tok=new_last, cache=new_cache,
                    running_seqs=new_running_seqs,
                    running_scores=new_running_scores,
                    st=new_st,
                    finished_seqs=fin_seqs, finished_scores=fin_scores,
                    is_finished=is_fin, unsat=unsat,
                    valid_cont=~jnp.all(hits))

    final = jax.lax.while_loop(cond, body, init)

    # ------- finalize (ConstrainedBeamSearchScorer.finalize) -------------
    # rows not done: add running beams that complete every constraint; if
    # fewer than num_return_sequences of them do, admit incomplete beams in
    # beam order as the fallback
    complete = final["st"]["completed"].all(-1)              # (B, K)
    n_complete = complete.sum(-1, keepdims=True)             # (B, 1)
    inc_rank = jnp.cumsum((~complete).astype(jnp.int32), axis=1) - 1
    fallback = ~complete & (inc_rank
                            < jnp.maximum(nret - n_complete, 0))
    gen_len = jnp.maximum(final["s"], 1).astype(jnp.float32)
    run_pen = final["running_scores"] / (gen_len ** length_penalty)
    addable = (complete | fallback) & final["unsat"]         # done rows skip
    run_pen = run_pen + jnp.where(addable, 0.0, neg)
    all_scores = jnp.concatenate([final["finished_scores"], run_pen], axis=1)
    all_seqs = jnp.concatenate([final["finished_seqs"],
                                final["running_seqs"]], axis=1)
    best_scores, best_sel = jax.lax.top_k(all_scores, nret)
    best_seqs = jnp.take_along_axis(all_seqs, best_sel[:, :, None],
                                    axis=1).reshape(b * nret, s_max)
    lengths = jnp.sum((best_seqs != pad).astype(jnp.int32), axis=1)
    if output_scores:
        return best_seqs, lengths, best_scores.reshape(b * nret)
    return best_seqs, lengths


# ----------------------------------------------------------------------------
# top-level speechmix generate
# ----------------------------------------------------------------------------

def generate(params, cfg: SpeechMixConfig, input_values, lengths=None,
             prompt_ids=None, max_length=None, num_beams=1,
             length_penalty=1.0, use_flash=False, dtype=jnp.float32,
             early_stop=False, early_stopping=False, kv_int8=False,
             do_sample=False, temperature=1.0, top_k=0, top_p=1.0,
             typical_p=1.0, rng=None, min_length=0, repetition_penalty=1.0,
             no_repeat_ngram_size=0, forced_bos_token_id=None,
             forced_eos_token_id=None, bad_words_ids=None,
             suppress_tokens=None, begin_suppress_tokens=None,
             num_return_sequences=1, output_scores=False,
             num_beam_groups=1, diversity_penalty=0.0,
             max_new_tokens=None, encoder_no_repeat_ngram_size=0,
             encoder_input_ids=None, prefix_allowed_tokens_fn=None,
             force_words_ids=None):
    """Full pipeline: waveform -> fused embeds -> text encoder (once) ->
    cached decode loop.  Equivalent of HFSpeechMixEED.generate
    (hf_model.py:304-338 + eval.py:12-14), including decoder_text_prompt via
    `prompt_ids`.  do_sample with num_beams > 1 is HF beam-sample.

    num_return_sequences > 1 follows HF: beam search returns the top-n beams
    per input; sampling tiles each input n times (independent draws); plain
    greedy raises (HF ValueError).  Outputs are flattened to
    (B*num_return_sequences, max_length) in HF's row order.
    output_scores=True returns a third value: per-step processed scores for
    greedy/sample, length-penalized sequences_scores for beam.

    max_new_tokens follows HF: the number of NEW tokens to generate; since
    this module's max_length already counts generated tokens (HF max_length
    minus the decoder start), max_new_tokens simply takes precedence over
    max_length when both are set (HF emits the same precedence).

    encoder_no_repeat_ngram_size: accepted for surface parity.  The
    reference's encoder input is a float waveform, so HF builds its ngram
    table over float tuples that can never match int decoder lookups — in
    the reference's actual execution this kwarg is a silent no-op.  Mirrored:
    without explicit `encoder_input_ids` (token ids, e.g. from a text
    prompt) a UserWarning is emitted and the kwarg has no effect; with
    explicit ids the ban is functional and HF-pinned
    (tests/test_logits_processors.py).

    prefix_allowed_tokens_fn(batch_id, seq) -> allowed token ids runs on
    host each step via jax.pure_callback (`seq` is a numpy array; HF passes
    a torch tensor).

    force_words_ids (a list of words — token-id lists — or of disjunctive
    word-sets) routes to constrained beam search with HF's
    ConstrainedBeamSearchScorer semantics; requires num_beams > 1 and
    excludes sampling/group beam, as in HF."""
    if max_new_tokens is not None:
        max_length = max_new_tokens
    max_length = max_length or cfg.decoder.max_length
    if force_words_ids is not None:
        if do_sample:
            raise ValueError("`force_words_ids` is incompatible with "
                             "sampling (HF generate contract)")
        if num_beam_groups > 1:
            raise ValueError("`force_words_ids` is incompatible with group "
                             "beam search (HF generate contract)")
    if encoder_no_repeat_ngram_size > 0 and encoder_input_ids is None:
        import warnings
        warnings.warn(
            "encoder_no_repeat_ngram_size with a waveform encoder input is "
            "a no-op (the reference's HF generate builds float ngrams that "
            "never match token lookups); pass encoder_input_ids for a "
            "functional ban", UserWarning, stacklevel=2)
    if num_beam_groups > 1 and num_beam_groups > num_beams:
        raise ValueError(
            f"num_beam_groups ({num_beam_groups}) has to be smaller or "
            f"equal to num_beams ({num_beams}) (HF generate contract)")
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
    if force_words_ids is not None:
        return constrained_beam_search(
            params["nlp"], cfg.decoder, enc_hidden, enc_mask, max_length,
            force_words_ids, num_beams=num_beams,
            length_penalty=length_penalty, dtype=dtype, adapters=adapters,
            use_flash=use_flash, early_stopping=early_stopping,
            kv_int8=kv_int8, min_length=min_length,
            repetition_penalty=repetition_penalty,
            no_repeat_ngram_size=no_repeat_ngram_size,
            forced_bos_token_id=forced_bos_token_id,
            forced_eos_token_id=forced_eos_token_id,
            bad_words_ids=bad_words_ids, suppress_tokens=suppress_tokens,
            begin_suppress_tokens=begin_suppress_tokens,
            encoder_no_repeat_ngram_size=encoder_no_repeat_ngram_size,
            encoder_input_ids=encoder_input_ids,
            prefix_allowed_tokens_fn=prefix_allowed_tokens_fn,
            num_return_sequences=num_return_sequences,
            output_scores=output_scores)
    if num_beams <= 1:
        if num_return_sequences > 1:
            if not do_sample:
                raise ValueError(
                    "num_return_sequences > 1 requires do_sample=True or "
                    "num_beams > 1 (HF greedy contract)")
            # HF expands each input num_return_sequences times; each tiled
            # row draws independently (jax categorical noise is per-row)
            enc_hidden = jnp.repeat(enc_hidden, num_return_sequences, axis=0)
            enc_mask = jnp.repeat(enc_mask, num_return_sequences, axis=0)
            if encoder_input_ids is not None:
                encoder_input_ids = jnp.repeat(
                    jnp.asarray(encoder_input_ids, jnp.int32),
                    num_return_sequences, axis=0)
        return greedy_decode(params["nlp"], cfg.decoder, enc_hidden,
                             enc_mask, max_length, dtype, adapters,
                             early_stop=early_stop, use_flash=use_flash,
                             kv_int8=kv_int8, do_sample=do_sample,
                             temperature=temperature, top_k=top_k,
                             top_p=top_p, typical_p=typical_p, rng=rng,
                             min_length=min_length,
                             repetition_penalty=repetition_penalty,
                             no_repeat_ngram_size=no_repeat_ngram_size,
                             forced_bos_token_id=forced_bos_token_id,
                             forced_eos_token_id=forced_eos_token_id,
                             bad_words_ids=bad_words_ids,
                             suppress_tokens=suppress_tokens,
                             begin_suppress_tokens=begin_suppress_tokens,
                             output_scores=output_scores,
                             encoder_no_repeat_ngram_size=(
                                 encoder_no_repeat_ngram_size),
                             encoder_input_ids=encoder_input_ids,
                             prefix_allowed_tokens_fn=(
                                 prefix_allowed_tokens_fn))
    if num_beam_groups > 1:
        if do_sample:
            raise ValueError("diverse beam search (num_beam_groups > 1) "
                             "does not support sampling (HF constraint)")
        return group_beam_search(
            params["nlp"], cfg.decoder, enc_hidden, enc_mask, max_length,
            num_beams=num_beams, num_beam_groups=num_beam_groups,
            diversity_penalty=diversity_penalty,
            length_penalty=length_penalty, dtype=dtype, adapters=adapters,
            use_flash=use_flash, early_stopping=early_stopping,
            kv_int8=kv_int8, min_length=min_length,
            repetition_penalty=repetition_penalty,
            no_repeat_ngram_size=no_repeat_ngram_size,
            forced_bos_token_id=forced_bos_token_id,
            forced_eos_token_id=forced_eos_token_id,
            bad_words_ids=bad_words_ids, suppress_tokens=suppress_tokens,
            begin_suppress_tokens=begin_suppress_tokens,
            num_return_sequences=num_return_sequences,
            output_scores=output_scores,
            encoder_no_repeat_ngram_size=encoder_no_repeat_ngram_size,
            encoder_input_ids=encoder_input_ids,
            prefix_allowed_tokens_fn=prefix_allowed_tokens_fn)
    return beam_search(params["nlp"], cfg.decoder, enc_hidden, enc_mask,
                       max_length, num_beams, length_penalty, dtype, adapters,
                       use_flash=use_flash, early_stopping=early_stopping,
                       kv_int8=kv_int8, min_length=min_length,
                       repetition_penalty=repetition_penalty,
                       no_repeat_ngram_size=no_repeat_ngram_size,
                       forced_bos_token_id=forced_bos_token_id,
                       forced_eos_token_id=forced_eos_token_id,
                       do_sample=do_sample, temperature=temperature,
                       top_k=top_k, top_p=top_p, typical_p=typical_p,
                       rng=rng,
                       bad_words_ids=bad_words_ids,
                       suppress_tokens=suppress_tokens,
                       begin_suppress_tokens=begin_suppress_tokens,
                       num_return_sequences=num_return_sequences,
                       output_scores=output_scores,
                       encoder_no_repeat_ngram_size=(
                           encoder_no_repeat_ngram_size),
                       encoder_input_ids=encoder_input_ids,
                       prefix_allowed_tokens_fn=prefix_allowed_tokens_fn)
