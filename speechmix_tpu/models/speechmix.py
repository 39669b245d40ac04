"""SpeechMix fusion model — the heart of the framework.

Functional re-design of the reference's core architecture
(SpeechMixEED, model.py:57-177 / HFSpeechMixEED, hf_model.py:185-447):

  speech encoder -> [optional learned softmax weighted-sum over layer states]
                 -> stride-2 conv length adapters (log2(down_scale) of them)
                 -> Linear enc->dec projection
                 -> [optional text prompt prefix]
                 -> fed as inputs_embeds into the seq2seq LM's text encoder
                 -> decoder CE loss / generation

The reference's six subclasses become ONE param pytree + per-variant loss
functions + trainable-parameter masks (see speechmix_tpu.training.freezing):

  eed     - plain CE fine-tune (model.py:57-177)
  fixed   - same graph, speech/NLP subtrees frozen (model.py:180-193)
  adapter - NLP layers frozen + bottleneck adapters (model.py:196-222)
  self    - CE + KLD(speech||text logits) + MSE(attention-projected speech
            hidden, text hidden), frozen NLP (model.py:225-266)
  gan     - BCE discriminator on hidden-state Gram matrices, alternating
            generator/discriminator updates (model.py:269-349)
  ed      - cross-attention fusion via SpeechEncoderDecoder-style wiring
            (model.py:26-54); the "ed" branch in speechmix_forward below

All ops are static-shape with explicit masks (the reference attends padding;
SURVEY.md §2.5.2).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import SpeechMixConfig
from ..ops import layers
from ..ops.masking import downscale_lengths, length_mask
from . import seq2seq
from . import speech_encoder as se
from ..parallel import mesh as mesh_lib


# ----------------------------------------------------------------------------
# init
# ----------------------------------------------------------------------------

def init_speechmix(key, cfg: SpeechMixConfig):
    keys = jax.random.split(key, 6)
    enc_params = se.init_speech_encoder(keys[0], cfg.encoder)
    enc_params = se.truncate_layers(enc_params, cfg.num_speech_encoder_layers)

    params = {
        "speech_encoder": enc_params,
        "nlp": seq2seq.init_seq2seq(keys[1], cfg.decoder),
        "enc_to_dec_proj": layers.init_dense(
            keys[2], cfg.encoder.hidden_size, cfg.decoder.hidden_size),
    }
    # length adapter chain: log2(down_scale) stride-2 convs over the speech
    # encoder hidden dim (model.py:88-98 uses final_proj.in_features == hidden)
    lk = jax.random.split(keys[3], max(cfg.downloop, 1))
    params["length_adapter"] = [
        layers.init_conv1d(lk[i], cfg.encoder.hidden_size,
                           cfg.encoder.hidden_size, 2)
        for i in range(cfg.downloop)
    ]
    if cfg.weighted_sum:
        params["weights_sum"] = jnp.zeros((cfg.num_weighted_sum,), jnp.float32)
    if cfg.variant == "adapter":
        params["adapters"] = seq2seq.init_seq2seq_adapters(
            keys[4], cfg.decoder, cfg.adapter_bottleneck_ratio)
    if cfg.variant == "gan":
        params["discriminator"] = layers.init_dense(
            keys[5], cfg.decoder.hidden_size ** 2, 1)
    return params


# ----------------------------------------------------------------------------
# speech -> NLP-embedding-space bridge
# ----------------------------------------------------------------------------

def encode_speech(params, cfg: SpeechMixConfig, input_values, lengths=None,
                  prompt_ids=None, return_model_detail=False, use_flash=False,
                  dtype=jnp.float32, dropout_rng=None):
    """Waveform -> fused inputs_embeds for the NLP text encoder.

    input_values: (B, T_samples) zero-padded waveform
    lengths: (B,) valid sample counts
    prompt_ids: optional (P,) or (B, P) token ids embedded with the NLP input
      embedding and concatenated BEFORE the speech embeddings
      (model.py:168-171 / hf_model.py:433-436)
    Returns (inputs_embeds (B, P+T', H_nlp), mask (B, P+T'), details dict).
    """
    details = {}
    enc_out = se.speech_encoder_apply(
        params["speech_encoder"], cfg.encoder, input_values, lengths,
        output_hidden_states=cfg.weighted_sum, use_flash=use_flash,
        dtype=dtype, dropout_rng=dropout_rng)
    h = enc_out["last_hidden_state"]

    if cfg.weighted_sum:
        stacked = enc_out["hidden_states"]  # (L+1, B, T, H)
        if cfg.weighted_sum_convention == "s3prl":
            stacked = stacked[1:]  # s3prl family omits the embedding output
        norm_w = jax.nn.softmax(params["weights_sum"].astype(jnp.float32))
        if return_model_detail:
            details["weighted_sum"] = norm_w
        h = jnp.einsum("l,lbth->bth", norm_w.astype(h.dtype), stacked)

    if return_model_detail:
        details["shape_before_length_adapter"] = h.shape

    for conv in params["length_adapter"]:
        h = layers.conv1d(conv, h, stride=2, dtype=dtype)

    if return_model_detail:
        details["shape_before_enc_dec_projector"] = h.shape

    h = layers.dense(params["enc_to_dec_proj"], h, dtype)
    if return_model_detail:
        details["shape_after_enc_dec_projector"] = h.shape

    frame_lengths = downscale_lengths(enc_out["frame_lengths"], cfg.downloop)
    mask = length_mask(frame_lengths, h.shape[1])
    h = h * mask[..., None].astype(h.dtype)
    # sequence-parallel annotation (identity unless tracing under
    # parallel.mesh.seq_sharding): the fused embeds stay time-sharded into
    # the NLP text encoder
    h = mesh_lib.constrain_time_sharded(h)

    if prompt_ids is not None:
        if prompt_ids.ndim == 1:
            prompt_ids = jnp.broadcast_to(prompt_ids[None],
                                          (h.shape[0], prompt_ids.shape[0]))
        prompt_embeds = seq2seq.embed_tokens(params["nlp"], cfg.decoder,
                                             prompt_ids, dtype)
        h = jnp.concatenate([prompt_embeds, h], axis=1)
        mask = jnp.concatenate(
            [jnp.ones(prompt_ids.shape, bool), mask], axis=1)

    return h, mask, details


# ----------------------------------------------------------------------------
# variant losses
# ----------------------------------------------------------------------------

def gan_decoder_mask(decoder_input_ids, pad_token_id):
    """Valid-position mask for the GAN Gram features.  Position 0 holds
    decoder_start_token_id, which EQUALS pad_token_id for T5/ByT5 (both 0)
    — it is a real position and must stay in the Gram (the reference
    builds its Gram over all positions, model.py:316-319)."""
    return (decoder_input_ids != pad_token_id).at[:, 0].set(True)


def _masked_gram(h, mask, hidden):
    """(B, T, H) -> flattened Gram matrix (B, H*H) over valid positions —
    the static-shape discriminator feature the reference builds via
    bmm(h.view(B,H,-1), h.view(B,-1,H)) (model.py:316-319)."""
    hm = h * mask[..., None].astype(h.dtype)
    g = jnp.einsum("bth,btk->bhk", hm, hm, preferred_element_type=jnp.float32)
    return g.reshape(h.shape[0], hidden * hidden)


def speechmix_forward(params, cfg: SpeechMixConfig, input_values,
                      lengths=None, labels=None, decoder_input_ids=None,
                      text_input_ids=None, text_mask=None, prompt_ids=None,
                      return_model_detail=False, use_flash=False,
                      dtype=jnp.float32, dropout_rng=None):
    """Training/eval forward for all embed-fusion variants.

    labels: (B, L) with -100 padding; decoder inputs derived by
      shift_tokens_right when not given (model.py:144-146).
    text_input_ids: tokenized ground-truth text, needed by the self/gan
      variants' second (text) pass; padded text positions are masked via
      text_mask, derived from pad_token_id when not given.
    dropout_rng: training-mode dropout key (None = deterministic eval).
    Returns dict: loss, logits (real distributions, NOT argmax — fixes
    reference quirk SURVEY.md §2.5.6), plus per-variant extras.
    """
    from ..ops.layers import split_or_none
    dcfg = cfg.decoder
    k_speech, k_nlp, k_text = split_or_none(dropout_rng, 3)
    if decoder_input_ids is None and labels is not None:
        decoder_input_ids = seq2seq.shift_tokens_right(
            labels, dcfg.pad_token_id, dcfg.decoder_start_token_id)
    elif decoder_input_ids is None:
        b = input_values.shape[0]
        decoder_input_ids = jnp.full((b, 1), dcfg.decoder_start_token_id,
                                     jnp.int32)
    if text_mask is None and text_input_ids is not None:
        # the self/gan second pass must not attend padded text (the
        # framework's masking invariant; the reference attends padding,
        # SURVEY.md §2.5.2)
        text_mask = text_input_ids != dcfg.pad_token_id

    inputs_embeds, enc_mask, details = encode_speech(
        params, cfg, input_values, lengths, prompt_ids,
        return_model_detail, use_flash, dtype, dropout_rng=k_speech)

    adapters = params.get("adapters") if cfg.variant == "adapter" else None
    need_hidden = cfg.variant in ("self", "gan")

    if cfg.variant == "ed":
        # cross-attention fusion (SpeechMixED, model.py:26-54): the decoder
        # cross-attends the projected speech states directly — no text
        # encoder pass (the reference wraps SpeechEncoderDecoderModel, whose
        # decoder consumes encoder states through cross-attention)
        dec_out = seq2seq.decode(
            params["nlp"], dcfg, decoder_input_ids,
            enc_hidden=inputs_embeds, encoder_mask=enc_mask,
            use_flash=use_flash, dtype=dtype, dropout_rng=k_nlp)
        out = {"logits": dec_out["logits"],
               "encoder_last_hidden_state": inputs_embeds,
               "encoder_mask": enc_mask}
        if labels is not None:
            from ..ops.layers import cross_entropy_with_ignore
            out["loss"] = cross_entropy_with_ignore(dec_out["logits"], labels)
    else:
        out = seq2seq.seq2seq_apply(
            params["nlp"], dcfg, inputs_embeds=inputs_embeds,
            attention_mask=enc_mask, decoder_input_ids=decoder_input_ids,
            labels=labels if cfg.variant != "gan" else None,
            output_hidden_states=need_hidden, use_flash=use_flash,
            adapters=adapters, dtype=dtype, dropout_rng=k_nlp)

    result = dict(details)
    result["logits"] = out["logits"]

    if labels is None:
        return result

    if cfg.variant in ("eed", "fixed", "adapter", "ed"):
        result["loss"] = out["loss"]

    elif cfg.variant == "self":
        # second pass: frozen NLP model on ground-truth text
        # (model.py:243-245)
        nlp_out = seq2seq.seq2seq_apply(
            params["nlp"], dcfg, input_ids=text_input_ids,
            attention_mask=text_mask, decoder_input_ids=decoder_input_ids,
            labels=labels, output_hidden_states=True, use_flash=use_flash,
            dtype=dtype, dropout_rng=k_text)
        nlp_hidden = nlp_out["encoder_hidden_states"][-1]      # (B, Tt, H)
        speech_hidden = out["encoder_hidden_states"][-1]       # (B, Ts, H)
        # attention-project speech hidden onto text positions
        # (model.py:249-253; implemented as intended — the reference's
        # .view-based transpose is a memory-layout accident)
        scale = 1.0 / jnp.sqrt(jnp.float32(dcfg.hidden_size))
        attn = jnp.einsum("bth,bsh->bts", nlp_hidden, speech_hidden,
                          preferred_element_type=jnp.float32) * scale
        sp_mask = out["encoder_mask"]
        attn = jnp.where(sp_mask[:, None, :], attn, -1e9)
        attn = jax.nn.softmax(attn, axis=-1)
        projected = jnp.einsum("bts,bsh->bth", attn.astype(speech_hidden.dtype),
                               speech_hidden, preferred_element_type=jnp.float32)
        # MSE over VALID text positions only — padded nlp_hidden rows must
        # not pull the speech projection toward pad embeddings
        sq = jnp.square(projected - nlp_hidden.astype(jnp.float32))
        valid = nlp_out["encoder_mask"].astype(jnp.float32)    # (B, Tt)
        mse = (jnp.sum(sq * valid[..., None]) /
               jnp.maximum(jnp.sum(valid) * sq.shape[-1], 1.0))
        kld = layers.kld_batchmean(out["logits"], nlp_out["logits"])
        ce = out["loss"]
        result["loss"] = (cfg.self_kld_weight * kld +
                          cfg.self_ce_weight * ce +
                          cfg.self_mse_weight * mse)
        result["ce_loss"], result["kld_loss"], result["mse_loss"] = ce, kld, mse

    elif cfg.variant == "gan":
        # text pass conditioned on labels-as-encoder-input (model.py:308;
        # -100s mapped to pad so embedding lookup is safe — reference relies
        # on collator behavior here, SURVEY.md §2.5.10)
        text_ids = text_input_ids if text_input_ids is not None else \
            jnp.where(labels == -100, dcfg.pad_token_id, labels)
        gan_text_mask = (text_mask if text_mask is not None
                         else text_ids != dcfg.pad_token_id)
        nlp_out = seq2seq.seq2seq_apply(
            params["nlp"], dcfg, input_ids=text_ids,
            attention_mask=gan_text_mask,
            decoder_input_ids=decoder_input_ids,
            output_hidden_states=True, use_flash=use_flash, dtype=dtype,
            dropout_rng=k_text)

        h = dcfg.hidden_size
        dec_mask = gan_decoder_mask(decoder_input_ids, dcfg.pad_token_id)
        feats = {
            # speech path: fused embeds + decoder hidden -> label 1
            "voice_enc": (_masked_gram(inputs_embeds, enc_mask, h), 1.0),
            "voice_dec": (_masked_gram(out["decoder_hidden_states"][-1],
                                       dec_mask, h), 1.0),
            # text path: encoder + decoder hidden -> label 0
            "nlp_enc": (_masked_gram(nlp_out["encoder_hidden_states"][-1],
                                     nlp_out["encoder_mask"], h), 0.0),
            "nlp_dec": (_masked_gram(nlp_out["decoder_hidden_states"][-1],
                                     dec_mask, h), 0.0),
        }
        gan_loss = 0.0
        for name, (g, target) in feats.items():
            logit = layers.dense(params["discriminator"],
                                 g.astype(dtype)).squeeze(-1)
            loss_term = layers.bce_with_logits(
                logit, jnp.full(logit.shape, target, jnp.float32))
            result[f"{name}_loss"] = loss_term
            gan_loss = gan_loss + loss_term
        result["loss"] = gan_loss

    return result
