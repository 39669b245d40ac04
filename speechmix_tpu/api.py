"""Reference-compatible high-level API.

Mirrors the constructor/forward/generate surface of the reference's twelve
model classes (speechmix/model.py + speechmix/hf_model.py) so a SpeechMix
user can switch with minimal changes:

    from speechmix_tpu import SpeechMixEED
    spm = SpeechMixEED('wav2vec2', 'facebook/bart-base',
                       share_layer_ratio=0.5, down_scale=4)
    out = spm([waveform], labels=labels)           # {'logits', 'loss', ...}
    tokens = spm.generate([waveform], max_length=100)

Differences from the reference (all documented fixes, SURVEY.md §2.5):
  * `forward` returns REAL logits under 'logits' plus argmax ids under
    'predictions' (the reference argmaxes logits in forward, §2.5.6)
  * audio is zero-padded with explicit masks (§2.5.2)
  * the s3prl/HF family split collapses: `SpeechMixEED` and `HFSpeechMixEED`
    are the same class with different weighted-sum conventions (L vs L+1,
    test_model.py:35 / test_hf_model.py:43)

Parameters live in `self.params` (a pytree); `self.config` is the composite
SpeechMixConfig.  Forward/generate are jit-compiled per input bucket.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import generation as gen_lib
from .config import (Seq2SeqConfig, SpeechEncoderConfig, SpeechMixConfig,
                     seq2seq_config, speech_encoder_config)
from .data.tokenizer import load_tokenizer
from .models import speechmix as smx
from .training import freezing
from .utils.platform import jnp_dtype, resolve_use_flash

_DEFAULT_FIXED_EXCEPT = ("layer_norm", "encoder_attn", "enc_to_dec_proj",
                         "length_adapter", "layernorm_embedding", "attention",
                         "encoder")


def _prepare_audio(input_values, max_len=None, bucket_samples=16000,
                   encoder_cfg=None):
    """Accept a list of 1-D arrays (reference convention,
    test_model.py:29-31) or a 2-D array; returns (batch, lengths).  Batch
    length is rounded up to a 1-second bucket so repeated calls with similar
    audio hit the same jit compilation, then frame-aligned when encoder_cfg
    is given (odd frame counts cost ~6% encoder time, PERF.md)."""
    def align(t):
        return (encoder_cfg.aligned_samples(t) if encoder_cfg is not None
                else t)
    if isinstance(input_values, (list, tuple)):
        arrays = [np.asarray(x, np.float32).reshape(-1) for x in input_values]
        lengths = np.array([len(a) for a in arrays], np.int32)
        t = max_len or int(lengths.max())
        t = max(bucket_samples,
                int(np.ceil(t / bucket_samples) * bucket_samples))
        t_pad = align(t)
        batch = np.zeros((len(arrays), t_pad), np.float32)
        for i, a in enumerate(arrays):
            batch[i, : min(len(a), t)] = a[:t]
        return jnp.asarray(batch), jnp.asarray(np.minimum(lengths, t))
    arr = np.asarray(input_values, np.float32)
    if arr.ndim == 1:
        arr = arr[None]
    lengths = jnp.full((arr.shape[0],), arr.shape[1], jnp.int32)
    t_pad = align(arr.shape[1])
    if t_pad != arr.shape[1]:
        arr = np.pad(arr, ((0, 0), (0, t_pad - arr.shape[1])))
    return jnp.asarray(arr), lengths


class _SpeechMixBase:
    """Shared machinery for all variants."""

    variant = "eed"
    weighted_sum_convention = "hf"

    def __init__(self, speech_model_config, nlp_model_config,
                 share_layer_ratio=0, down_scale=8, weighted_sum=False,
                 fixed_parameters=False, fixed_except=_DEFAULT_FIXED_EXCEPT,
                 seed=0, dtype="float32", **kwargs):
        enc_cfg = speech_encoder_config(speech_model_config)
        dec_cfg = seq2seq_config(nlp_model_config)
        self.config = SpeechMixConfig(
            encoder=enc_cfg, decoder=dec_cfg, variant=self.variant,
            share_layer_ratio=share_layer_ratio, down_scale=down_scale,
            weighted_sum=weighted_sum,
            weighted_sum_convention=self.weighted_sum_convention,
            fixed_parameters=fixed_parameters,
            fixed_except=tuple(fixed_except), dtype=dtype)
        self.tokenizer = load_tokenizer(
            nlp_model_config if isinstance(nlp_model_config, str)
            else dec_cfg.name, decoder_config=dec_cfg)
        self.params = smx.init_speechmix(jax.random.PRNGKey(seed),
                                         self.config)
        self._variant_kwargs = kwargs
        self._refresh_grad_lists(**{
            k: v for k, v in kwargs.items()
            if k in ("fixed_speech", "fixed_nlp")})
        self._jit_forward_cache = {}
        self._jit_generate_cache = {}

    # -- bookkeeping parity (model.py:115-127) ------------------------------
    def _refresh_grad_lists(self, fixed_speech=False, fixed_nlp=True):
        mask = freezing.variant_trainable_mask(
            self.params, self.config, fixed_speech=fixed_speech,
            fixed_nlp=fixed_nlp)
        self.trainable_mask = mask
        self.list_grad, self.list_no_grad = freezing.count_trainable(
            self.params, mask)

    @property
    def speech_encoder_layer(self) -> int:
        return self.config.num_speech_encoder_layers

    @property
    def nlp_encoder_layer(self) -> int:
        return self.config.decoder.encoder_layers

    @property
    def weights_sum(self):
        return self.params.get("weights_sum")

    # -- forward ------------------------------------------------------------
    @property
    def _dtype(self):
        return jnp_dtype(self.config.dtype)

    def forward(self, input_values, labels=None, decoder_input_ids=None,
                text_input_ids=None, input_text_prompt=None,
                decoder_text_prompt=None, return_model_detail=False,
                use_flash=None):
        use_flash = resolve_use_flash(use_flash)
        batch, lengths = _prepare_audio(input_values,
                                        encoder_cfg=self.config.encoder)
        prompt = input_text_prompt or decoder_text_prompt
        prompt_ids = None
        if prompt is not None:
            prompt_ids = jnp.asarray(
                self.tokenizer.encode(prompt, add_special_tokens=False),
                jnp.int32)

        def to_arr(x):
            return None if x is None else jnp.asarray(np.asarray(x))

        labels, decoder_input_ids, text_input_ids = map(
            to_arr, (labels, decoder_input_ids, text_input_ids))

        # jit cache keyed on input shapes + which optionals are present
        key = ("fwd", batch.shape,
               None if labels is None else labels.shape,
               None if decoder_input_ids is None else decoder_input_ids.shape,
               None if text_input_ids is None else text_input_ids.shape,
               None if prompt_ids is None else prompt_ids.shape,
               return_model_detail, use_flash)
        fn = self._jit_forward_cache.get(key)
        if fn is None:
            def raw(params, batch, lengths, labels, decoder_input_ids,
                    text_input_ids, prompt_ids):
                out = smx.speechmix_forward(
                    params, self.config, batch, lengths=lengths,
                    labels=labels, decoder_input_ids=decoder_input_ids,
                    text_input_ids=text_input_ids, prompt_ids=prompt_ids,
                    return_model_detail=return_model_detail,
                    use_flash=use_flash, dtype=self._dtype)
                out["predictions"] = jnp.argmax(out["logits"], -1)
                return out
            fn = jax.jit(raw)
            self._jit_forward_cache[key] = fn
        return fn(self.params, batch, lengths, labels, decoder_input_ids,
                  text_input_ids, prompt_ids)

    __call__ = forward

    # -- generation ---------------------------------------------------------
    def generate(self, input_values, decoder_text_prompt=None,
                 max_length=None, num_beams=1, length_penalty=1.0,
                 early_stopping=False, use_flash=None, kv_int8=False,
                 do_sample=False, temperature=1.0, top_k=0, top_p=1.0,
                 seed=0, min_length=0, repetition_penalty=1.0,
                 no_repeat_ngram_size=0, forced_bos_token_id=None,
                 forced_eos_token_id=None, bad_words_ids=None,
                 suppress_tokens=None, begin_suppress_tokens=None,
                 num_return_sequences=1, output_scores=False,
                 return_dict_in_generate=False, num_beam_groups=1,
                 diversity_penalty=0.0, max_new_tokens=None, typical_p=1.0,
                 encoder_no_repeat_ngram_size=0, encoder_input_ids=None,
                 prefix_allowed_tokens_fn=None, force_words_ids=None):
        """use_flash=None auto-enables the single-pass Pallas attention
        kernel on TPU (measured faster in situ at speech shapes — PERF.md);
        pass False/True to override.  kv_int8 quantizes the precomputed
        cross-attention K/V to int8 (per-token/head scales) — halves the
        dominant decode-loop HBM read; accuracy pinned by
        tests/test_generation.py::test_kv_int8_decode_matches.

        bad_words_ids / suppress_tokens / begin_suppress_tokens /
        num_return_sequences / output_scores / max_new_tokens / typical_p /
        encoder_no_repeat_ngram_size / prefix_allowed_tokens_fn /
        force_words_ids (constrained beam search; token-id word lists or
        disjunctive word-sets, num_beams > 1) follow HF generate()
        (hf_model.py:304-338 inherits them from PreTrainedModel).  With output_scores or
        return_dict_in_generate the return is a dict: {"sequences",
        "scores"} (greedy/sample per-step scores) or {"sequences",
        "sequences_scores"} (beam).

        Documented shape divergences from HF's return dict (same numbers,
        different container): greedy/sample "scores" is one stacked
        (max_length, B, V) array covering every scan step, where HF returns
        a per-step TUPLE truncated at the step all rows finished; beam modes
        return "sequences_scores" only — HF additionally carries per-step
        beam "scores", which the static while_loop does not buffer.

        prefix_allowed_tokens_fn runs on host each decode step via
        jax.pure_callback (seq arrives as a numpy array, not a torch
        tensor); the jit cache keys it by identity, so reuse the same
        function object across calls to avoid recompiles."""
        use_flash = resolve_use_flash(use_flash)
        if max_new_tokens is not None:
            max_length = max_new_tokens  # ours counts generated tokens

        batch, lengths = _prepare_audio(input_values,
                                        encoder_cfg=self.config.encoder)
        prompt_ids = None
        if decoder_text_prompt is not None:
            prompt_ids = jnp.asarray(
                self.tokenizer.encode(decoder_text_prompt,
                                      add_special_tokens=False), jnp.int32)
        # static word/token lists must be hashable for the jit cache key
        bad_words_ids = None if not bad_words_ids else tuple(
            tuple(int(t) for t in w) for w in bad_words_ids)
        force_words_ids = None if not force_words_ids else tuple(
            tuple(tuple(int(t) for t in w) for w in entry)
            if entry and isinstance(entry[0], (list, tuple))
            else tuple(int(t) for t in entry)
            for entry in force_words_ids)
        suppress_tokens = None if not suppress_tokens else tuple(
            int(t) for t in suppress_tokens)
        begin_suppress_tokens = None if not begin_suppress_tokens else tuple(
            int(t) for t in begin_suppress_tokens)
        enc_ids = None
        if encoder_input_ids is not None:
            enc_ids = jnp.asarray(np.asarray(encoder_input_ids), jnp.int32)
            if enc_ids.ndim == 1:
                enc_ids = enc_ids[None]
        # seed is NOT part of the key: the rng is a runtime argument, so
        # drawing many sampled transcripts compiles once
        key = ("gen", batch.shape,
               None if prompt_ids is None else prompt_ids.shape,
               max_length, num_beams, length_penalty, early_stopping,
               use_flash, kv_int8,
               do_sample, temperature, top_k, top_p, typical_p, min_length,
               repetition_penalty, no_repeat_ngram_size,
               forced_bos_token_id, forced_eos_token_id, bad_words_ids,
               suppress_tokens, begin_suppress_tokens,
               num_return_sequences, output_scores,
               num_beam_groups, diversity_penalty,
               encoder_no_repeat_ngram_size,
               None if enc_ids is None else enc_ids.shape,
               None if prefix_allowed_tokens_fn is None
               else id(prefix_allowed_tokens_fn), force_words_ids)
        fn = self._jit_generate_cache.get(key)
        if fn is None:
            def raw(params, batch, lengths, prompt_ids, rng, enc_ids):
                return gen_lib.generate(
                    params, self.config, batch, lengths,
                    prompt_ids=prompt_ids, max_length=max_length,
                    num_beams=num_beams, length_penalty=length_penalty,
                    early_stopping=early_stopping,
                    use_flash=use_flash, dtype=self._dtype,
                    kv_int8=kv_int8, do_sample=do_sample,
                    temperature=temperature, top_k=top_k, top_p=top_p,
                    typical_p=typical_p, rng=rng, min_length=min_length,
                    repetition_penalty=repetition_penalty,
                    no_repeat_ngram_size=no_repeat_ngram_size,
                    forced_bos_token_id=forced_bos_token_id,
                    forced_eos_token_id=forced_eos_token_id,
                    bad_words_ids=bad_words_ids,
                    suppress_tokens=suppress_tokens,
                    begin_suppress_tokens=begin_suppress_tokens,
                    num_return_sequences=num_return_sequences,
                    output_scores=output_scores,
                    num_beam_groups=num_beam_groups,
                    diversity_penalty=diversity_penalty,
                    encoder_no_repeat_ngram_size=(
                        encoder_no_repeat_ngram_size),
                    encoder_input_ids=enc_ids,
                    prefix_allowed_tokens_fn=prefix_allowed_tokens_fn,
                    force_words_ids=force_words_ids)
            fn = jax.jit(raw)
            self._jit_generate_cache[key] = fn
        rng = jax.random.PRNGKey(seed) if do_sample else None
        out = fn(self.params, batch, lengths, prompt_ids, rng, enc_ids)
        if output_scores or return_dict_in_generate:
            tokens = out[0]
            d = {"sequences": tokens}
            if output_scores:  # decoders return (tokens, lengths, scores)
                d["sequences_scores" if num_beams > 1 else "scores"] = out[2]
            return d
        return out[0]

    # -- persistence --------------------------------------------------------
    def save_weights(self, path: str):
        from .training.checkpoint import save_pytree_npz
        save_pytree_npz(path, self.params)

    def load_weights(self, path: str):
        from .training.checkpoint import load_pytree_npz
        self.params = load_pytree_npz(path, self.params)

    def save_pretrained(self, directory: str):
        """Write config.json + weights.npz (+ model_kwargs.json when the
        variant was constructed with extra kwargs, e.g. fixed_speech /
        fixed_nlp — they shape the trainable mask and must round-trip)."""
        import json
        import os
        os.makedirs(directory, exist_ok=True)
        with open(os.path.join(directory, "config.json"), "w") as f:
            f.write(self.config.to_json())
        if self._variant_kwargs:
            with open(os.path.join(directory, "model_kwargs.json"),
                      "w") as f:
                json.dump(self._variant_kwargs, f)
        self.save_weights(os.path.join(directory, "weights.npz"))

    @classmethod
    def from_pretrained(cls, directory: str):
        """Rebuild a model saved with save_pretrained (incl. the variant
        kwargs, so e.g. a SpeechMixFixed(fixed_speech=True, fixed_nlp=False)
        round-trips with the SAME trainable mask, not the defaults)."""
        import json
        import os
        from .config import SpeechMixConfig
        with open(os.path.join(directory, "config.json")) as f:
            cfg = SpeechMixConfig.from_json(f.read())
        kwargs = {}
        kw_path = os.path.join(directory, "model_kwargs.json")
        if os.path.exists(kw_path):
            with open(kw_path) as f:
                kwargs = json.load(f)
        self = cls.__new__(cls)
        self.config = cfg
        self.tokenizer = load_tokenizer(cfg.decoder.name,
                                        decoder_config=cfg.decoder)
        self.params = smx.init_speechmix(jax.random.PRNGKey(0), cfg)
        self._variant_kwargs = kwargs
        self._refresh_grad_lists(**{
            k: v for k, v in kwargs.items()
            if k in ("fixed_speech", "fixed_nlp")})
        self._jit_forward_cache = {}
        self._jit_generate_cache = {}
        self.load_weights(os.path.join(directory, "weights.npz"))
        return self

    @classmethod
    def from_reference_checkpoint(cls, checkpoint_dir: str,
                                  share_layer_ratio=0, down_scale=8,
                                  weighted_sum=False, tokenizer_path=None,
                                  **kwargs):
        """Build a model from a reference FUSED checkpoint directory (the
        `voidful/speechmix_eed_fixed` layout: composite SpeechMixConfig
        config.json, hf_model.py:37-79, beside pytorch_model.bin /
        model.safetensors).  The architecture is derived from config.json
        (convert.config_from_hf); the fusion hyperparameters are not stored
        by the reference, so pass the recipe's share_layer_ratio/down_scale
        (the published eed_fixed checkpoint used 0.4 / 8).  The tokenizer
        loads from tokenizer_path or the checkpoint dir itself.

        This is the real-checkpoint turnkey path:
            spm = HFSpeechMixEED.from_reference_checkpoint(
                '/mnt/speechmix_eed_fixed', share_layer_ratio=0.4)
            pipe = TranscriptionPipeline(spm); pipe(waveforms)
        """
        import os
        from . import convert
        derived = convert.config_from_hf(checkpoint_dir)
        if not isinstance(derived, tuple):
            raise ValueError(
                f"{checkpoint_dir} holds a single-model config "
                f"({type(derived).__name__}); from_reference_checkpoint "
                f"needs the fused composite layout — use "
                f"load_hf_checkpoint for separate backbone checkpoints")
        enc_cfg, dec_cfg = derived
        self = cls(enc_cfg, dec_cfg, share_layer_ratio=share_layer_ratio,
                   down_scale=down_scale, weighted_sum=weighted_sum,
                   **kwargs)
        tok_src = tokenizer_path or checkpoint_dir
        if os.path.exists(os.path.join(str(tok_src), "tokenizer.json")) or \
                os.path.exists(os.path.join(str(tok_src),
                                            "tokenizer_config.json")):
            self.tokenizer = load_tokenizer(str(tok_src),
                                            decoder_config=dec_cfg)
        self.params = convert.load_speechmix(checkpoint_dir, self.config)
        self._refresh_grad_lists()
        return self

    def export_reference_state_dict(self, path: str = None):
        """Export the fused params as a reference-format torch state dict
        (convert.export_speechmix) — loadable by the reference
        HFSpeechMixEED via load_state_dict, so a model trained here goes
        back to the reference / HF torch ecosystem.  With `path`, saves a
        pytorch_model.bin via torch (falls back to `path + '.npz'` with a
        warning if torch is missing — never writes npz bytes under a
        torch-named path); always returns the dict of numpy arrays."""
        from . import convert
        sd = convert.export_speechmix(self.params, self.config)
        if path:
            try:
                import torch
                torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)
            except ImportError:
                import warnings
                npz_path = path + ".npz"
                warnings.warn(
                    f"torch is not installed: saving numpy archive to "
                    f"{npz_path!r} instead of torch state dict {path!r}")
                with open(npz_path, "wb") as f:
                    np.savez(f, **sd)
        return sd

    def load_hf_checkpoint(self, speech_path=None, nlp_path=None):
        """Import pretrained weights from local HF checkpoints (torch
        state_dicts); see speechmix_tpu.convert."""
        from . import convert
        if speech_path:
            self.params["speech_encoder"] = convert.load_speech_encoder(
                speech_path, self.config.encoder,
                num_layers=self.config.num_speech_encoder_layers)
        if nlp_path:
            self.params["nlp"] = convert.load_seq2seq(nlp_path,
                                                      self.config.decoder)


class SpeechMixEED(_SpeechMixBase):
    """Core embed-fusion model (reference model.py:57-177).  s3prl-family
    weighted-sum convention (L weights, test_model.py:35)."""
    variant = "eed"
    weighted_sum_convention = "s3prl"


class HFSpeechMixEED(_SpeechMixBase):
    """Embed-fusion, HF-family weighted-sum convention (L+1 weights including
    the embedding output, hf_model.py:269-270, test_hf_model.py:43)."""
    variant = "eed"
    weighted_sum_convention = "hf"


class SpeechMixED(_SpeechMixBase):
    """Cross-attention fusion (reference model.py:26-54): decoder attends
    projected speech states directly; no text-encoder pass.  The reference
    wraps SpeechEncoderDecoderModel and does not down-scale; pass
    down_scale=1 for exact parity."""
    variant = "ed"
    weighted_sum_convention = "s3prl"

    def __init__(self, speech_model_config, nlp_model_config,
                 fixed_parameters=False, fixed_except=_DEFAULT_FIXED_EXCEPT,
                 **kwargs):
        kwargs.setdefault("down_scale", 1)
        super().__init__(speech_model_config, nlp_model_config,
                         fixed_parameters=fixed_parameters,
                         fixed_except=fixed_except, **kwargs)


class HFSpeechMixED(SpeechMixED):
    weighted_sum_convention = "hf"


class SpeechMixFixed(_SpeechMixBase):
    """Frozen speech and/or NLP backbones (model.py:180-193); accepts
    fixed_speech / fixed_nlp kwargs like the reference custom_modules."""
    variant = "fixed"
    weighted_sum_convention = "s3prl"


class HFSpeechMixFixed(SpeechMixFixed):
    weighted_sum_convention = "hf"


class SpeechMixAdapter(_SpeechMixBase):
    """Frozen NLP layer stacks + per-layer bottleneck adapters
    (model.py:196-222)."""
    variant = "adapter"
    weighted_sum_convention = "s3prl"


class HFSpeechMixAdapter(SpeechMixAdapter):
    weighted_sum_convention = "hf"


class SpeechMixSelf(_SpeechMixBase):
    """Self-distillation: CE + KLD + MSE vs the frozen NLP model run on
    ground-truth text (model.py:225-266)."""
    variant = "self"
    weighted_sum_convention = "s3prl"


class HFSpeechMixSelf(SpeechMixSelf):
    weighted_sum_convention = "hf"


class SpeechMixGAN(_SpeechMixBase):
    """Adversarial feature matching on hidden-state Gram matrices with
    alternating generator/discriminator updates (model.py:269-349)."""
    variant = "gan"
    weighted_sum_convention = "s3prl"


class HFSpeechMixGAN(SpeechMixGAN):
    weighted_sum_convention = "hf"
