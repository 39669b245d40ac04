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

from .config import SpeechMixConfig
from .models import seq2seq
from .models import speechmix as smx


# ----------------------------------------------------------------------------
# HF LogitsProcessor stack
# ----------------------------------------------------------------------------

def _needs_history(repetition_penalty=1.0, no_repeat_ngram_size=0,
                   bad_words_ids=None, **_):
    """Whether the processor stack needs the sequence-so-far in the carry."""
    multi = any(len(w) > 1 for w in (bad_words_ids or ()))
    return repetition_penalty != 1.0 or no_repeat_ngram_size > 0 or multi


def _process_logits_hf(logits, dcfg, step_idx, max_length, fullbuf=None,
                       repetition_penalty=1.0, no_repeat_ngram_size=0,
                       min_length=0, forced_bos_token_id=None,
                       forced_eos_token_id=None, bad_words_ids=None,
                       suppress_tokens=None, begin_suppress_tokens=None):
    """The HF `generate()` LogitsProcessor stack on (N, V) scores, applied in
    transformers' order: RepetitionPenalty -> NoRepeatNGram -> NoBadWords ->
    MinLength -> ForcedBOS -> ForcedEOS -> SuppressTokens ->
    SuppressTokensAtBegin (the reference inherits all of these through
    PreTrainedModel.generate, hf_model.py:304-338).

    step_idx: number of tokens generated so far (the token being chosen is
    generated token #step_idx; the current sequence INCLUDING the decoder
    start token has length step_idx+1 — HF's cur_len).
    fullbuf: (N, S) current sequence = [decoder_start] + generated tokens,
    pad-filled past step_idx+1; required only by the history-dependent
    processors (repetition penalty, no-repeat-ngram).
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

def sample_filter_logits(logits, top_k=0, top_p=1.0):
    """HF sampling-filter semantics on (B, V) f32 logits: keep the top_k
    highest-logit tokens (0 = off), then the smallest set whose cumulative
    probability reaches top_p (1.0 = off; the highest-probability token is
    always kept).  Filtered positions become -inf.

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
    return logits


def greedy_decode(params, dcfg, enc_hidden, enc_mask, max_length,
                  dtype=jnp.float32, adapters=None, early_stop=False,
                  use_flash=False, kv_int8=False, do_sample=False,
                  temperature=1.0, top_k=0, top_p=1.0, rng=None,
                  min_length=0, repetition_penalty=1.0,
                  no_repeat_ngram_size=0, forced_bos_token_id=None,
                  forced_eos_token_id=None, bad_words_ids=None,
                  suppress_tokens=None, begin_suppress_tokens=None,
                  output_scores=False):
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
    # the history-dependent processors need the sequence so far in the carry
    needs_history = _needs_history(repetition_penalty, no_repeat_ngram_size,
                                   bad_words_ids)
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
            begin_suppress_tokens=begin_suppress_tokens)
        if do_sample:
            logits = sample_filter_logits(
                logits / jnp.maximum(jnp.float32(temperature), 1e-6),
                top_k, top_p)
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
    # cross K/V (and scales) are invariant under beam reorder: every beam of
    # a batch row carries the identical tiled encoder projection, so
    # gathering them would be a full-size identity copy each step — skip it
    return seq2seq.DecoderCache(
        self_kv=jax.tree_util.tree_map(g, cache.self_kv),
        cross_k=cache.cross_k, cross_v=cache.cross_v,
        cross_k_scale=cache.cross_k_scale,
        cross_v_scale=cache.cross_v_scale)


def beam_search(params, dcfg, enc_hidden, enc_mask, max_length, num_beams=4,
                length_penalty=1.0, dtype=jnp.float32, adapters=None,
                use_flash=False, early_stopping=False, kv_int8=False,
                min_length=0, repetition_penalty=1.0,
                no_repeat_ngram_size=0, forced_bos_token_id=None,
                forced_eos_token_id=None, do_sample=False, temperature=1.0,
                top_k=0, top_p=1.0, rng=None, num_return_sequences=1,
                output_scores=False, bad_words_ids=None,
                suppress_tokens=None, begin_suppress_tokens=None):
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
    needs_history = _needs_history(repetition_penalty, no_repeat_ngram_size,
                                   bad_words_ids)

    rep = lambda x: jnp.repeat(x, k, axis=0)
    enc_hidden_t, enc_mask_t = rep(enc_hidden), rep(enc_mask)
    cache0 = seq2seq.init_decoder_cache(params, dcfg, enc_hidden_t, b * k,
                                        s_max, dtype, kv_int8=kv_int8)

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
                             encoder_mask=enc_mask_t, cache=c["cache"],
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
            begin_suppress_tokens=begin_suppress_tokens)
        vocab = logp.shape[-1]
        acc = logp.reshape(b, k, vocab) + c["running_scores"][:, :, None]
        if do_sample:
            # HF beam_sample: warp the ACCUMULATED scores, then draw 2K
            # candidates without replacement from softmax over (K*V) —
            # Gumbel top-k is exactly that sampling scheme
            warped = sample_filter_logits(
                acc.reshape(b * k, vocab) /
                jnp.maximum(jnp.float32(temperature), 1e-6), top_k, top_p)
            flat = warped.reshape(b, k * vocab)
            g = -jnp.log(-jnp.log(jax.random.uniform(
                jax.random.fold_in(rng, c["s"]), flat.shape,
                minval=1e-20, maxval=1.0) + 1e-20))
            _, topk_idx = jax.lax.top_k(flat + g, k2)
            topk_scores = jnp.take_along_axis(flat, topk_idx, axis=1)
            # HF sorts the sampled candidates by score descending
            order = jnp.argsort(-topk_scores, axis=1)
            topk_scores = jnp.take_along_axis(topk_scores, order, axis=1)
            topk_idx = jnp.take_along_axis(topk_idx, order, axis=1)
        else:
            topk_scores, topk_idx = jax.lax.top_k(
                acc.reshape(b, k * vocab), k2)               # (B, 2K)
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
                      num_return_sequences=1, output_scores=False):
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
    needs_history = _needs_history(repetition_penalty, no_repeat_ngram_size,
                                   bad_words_ids)

    rep = lambda x: jnp.repeat(x, k, axis=0)
    enc_hidden_t, enc_mask_t = rep(enc_hidden), rep(enc_mask)
    cache0 = seq2seq.init_decoder_cache(params, dcfg, enc_hidden_t, b * k,
                                        s_max, dtype, kv_int8=kv_int8)

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
                             encoder_mask=enc_mask_t, cache=c["cache"],
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
                begin_suppress_tokens=begin_suppress_tokens)
            acc = logp.reshape(b, kg, vocab) + \
                c["running_scores"][:, g][:, :, None]
            topk_scores, topk_idx = jax.lax.top_k(
                acc.reshape(b, kg * vocab), k2g)             # (B, 2kg)
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
# top-level speechmix generate
# ----------------------------------------------------------------------------

def generate(params, cfg: SpeechMixConfig, input_values, lengths=None,
             prompt_ids=None, max_length=None, num_beams=1,
             length_penalty=1.0, use_flash=False, dtype=jnp.float32,
             early_stop=False, early_stopping=False, kv_int8=False,
             do_sample=False, temperature=1.0, top_k=0, top_p=1.0,
             rng=None, min_length=0, repetition_penalty=1.0,
             no_repeat_ngram_size=0, forced_bos_token_id=None,
             forced_eos_token_id=None, bad_words_ids=None,
             suppress_tokens=None, begin_suppress_tokens=None,
             num_return_sequences=1, output_scores=False,
             num_beam_groups=1, diversity_penalty=0.0):
    """Full pipeline: waveform -> fused embeds -> text encoder (once) ->
    cached decode loop.  Equivalent of HFSpeechMixEED.generate
    (hf_model.py:304-338 + eval.py:12-14), including decoder_text_prompt via
    `prompt_ids`.  do_sample with num_beams > 1 is HF beam-sample.

    num_return_sequences > 1 follows HF: beam search returns the top-n beams
    per input; sampling tiles each input n times (independent draws); plain
    greedy raises (HF ValueError).  Outputs are flattened to
    (B*num_return_sequences, max_length) in HF's row order.
    output_scores=True returns a third value: per-step processed scores for
    greedy/sample, length-penalized sequences_scores for beam."""
    max_length = max_length or cfg.decoder.max_length
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
        return greedy_decode(params["nlp"], cfg.decoder, enc_hidden,
                             enc_mask, max_length, dtype, adapters,
                             early_stop=early_stop, use_flash=use_flash,
                             kv_int8=kv_int8, do_sample=do_sample,
                             temperature=temperature, top_k=top_k,
                             top_p=top_p, rng=rng, min_length=min_length,
                             repetition_penalty=repetition_penalty,
                             no_repeat_ngram_size=no_repeat_ngram_size,
                             forced_bos_token_id=forced_bos_token_id,
                             forced_eos_token_id=forced_eos_token_id,
                             bad_words_ids=bad_words_ids,
                             suppress_tokens=suppress_tokens,
                             begin_suppress_tokens=begin_suppress_tokens,
                             output_scores=output_scores)
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
            output_scores=output_scores)
    return beam_search(params["nlp"], cfg.decoder, enc_hidden, enc_mask,
                       max_length, num_beams, length_penalty, dtype, adapters,
                       use_flash=use_flash, early_stopping=early_stopping,
                       kv_int8=kv_int8, min_length=min_length,
                       repetition_penalty=repetition_penalty,
                       no_repeat_ngram_size=no_repeat_ngram_size,
                       forced_bos_token_id=forced_bos_token_id,
                       forced_eos_token_id=forced_eos_token_id,
                       do_sample=do_sample, temperature=temperature,
                       top_k=top_k, top_p=top_p, rng=rng,
                       bad_words_ids=bad_words_ids,
                       suppress_tokens=suppress_tokens,
                       begin_suppress_tokens=begin_suppress_tokens,
                       num_return_sequences=num_return_sequences,
                       output_scores=output_scores)
