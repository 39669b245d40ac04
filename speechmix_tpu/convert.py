"""HF checkpoint -> speechmix_tpu param pytree conversion.

The reference loads pretrained torch weights from the HF hub at construction
(model.py:65-66, hf_model.py:216-219).  This environment is offline, so
conversion runs against LOCAL checkpoint directories (pytorch_model.bin or
model.safetensors) and maps torch tensors into this framework's pytrees:

  load_speech_encoder(path, cfg)  - wav2vec2 / hubert / unispeech-sat
  load_seq2seq(path, cfg)         - bart / t5 family

Conventions converted:
  * torch Linear weight (out, in)  -> kernel (in, out)
  * torch Conv1d weight (out, in/groups, K) -> kernel (K, in/groups, out)
  * wav2vec2 pos-conv weight-norm (dim=2) is materialized:
    weight = g * v / ||v||_{dims (0,1)}  (handles both weight_g/weight_v and
    parametrizations.weight.original0/1 layouts)
  * per-layer torch tensors are stacked along a leading layer axis to match
    the lax.scan layer layout
"""

from __future__ import annotations

import os
import warnings
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from .config import Seq2SeqConfig, SpeechEncoderConfig


# ----------------------------------------------------------------------------
# state dict loading
# ----------------------------------------------------------------------------

def load_state_dict(path: str,
                    allow_pickle: bool = True) -> Dict[str, np.ndarray]:
    """Load a torch/safetensors state dict from a file or checkpoint dir.

    ``allow_pickle`` gates the unrestricted ``torch.load`` fallback needed
    for fairseq/s3prl checkpoints, which pickle an args Namespace beside the
    weights (same trust model as the reference's ``torch.load`` at
    eval.py:10 — a local file the user chose to load). The fallback fires
    only on the specific weights-only rejection, never on genuine I/O or
    corruption errors, and warns with the file name when it does.
    """
    if os.path.isdir(path):
        for name in ("model.safetensors", "pytorch_model.bin"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return {k: np.asarray(v) for k, v in load_file(path).items()}
    import pickle
    import torch
    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except pickle.UnpicklingError:
        # torch raises _pickle.UnpicklingError when weights_only rejects a
        # non-tensor global (fairseq's Namespace).  Any other exception
        # (missing file, truncated zip, corrupt data) propagates.
        if not allow_pickle:
            raise
        warnings.warn(
            f"{path}: weights-only load rejected (non-tensor pickled "
            "objects, typical of fairseq/s3prl checkpoints); retrying with "
            "weights_only=False. Pass allow_pickle=False to forbid this "
            "for untrusted files.", stacklevel=2)
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and not any(
            hasattr(v, "detach") for v in sd.values()):
        # fairseq layout: {"args"/"cfg": ..., "model": OrderedDict}
        for key in ("model", "state_dict"):
            if key in sd and isinstance(sd[key], dict):
                sd = sd[key]
                break
    return {k: v.detach().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def _strip_prefix(sd, prefixes=("model.", "wav2vec2.", "hubert.",
                                "unispeech_sat.")):
    """Normalize key prefixes across checkpoint flavors."""
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
                break
        out[k] = v
    return out


def _lin(sd, name):
    p = {"kernel": jnp.asarray(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{name}.bias"])
    return p


def _ln(sd, name):
    return {"scale": jnp.asarray(sd[f"{name}.weight"]),
            "bias": jnp.asarray(sd[f"{name}.bias"])}


def _rms(sd, name):
    return {"scale": jnp.asarray(sd[f"{name}.weight"])}


def _conv(sd, name):
    p = {"kernel": jnp.asarray(sd[f"{name}.weight"].transpose(2, 1, 0))}
    if f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{name}.bias"])
    return p


def _stack(trees):
    import jax
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


# ----------------------------------------------------------------------------
# speech encoder
# ----------------------------------------------------------------------------

def _materialize_weight_norm(sd, base):
    """wav2vec2 pos_conv weight-norm: weight = g * v / ||v|| with dim=2
    (per kernel position)."""
    candidates = [
        (f"{base}.weight_g", f"{base}.weight_v"),
        (f"{base}.parametrizations.weight.original0",
         f"{base}.parametrizations.weight.original1"),
    ]
    for g_key, v_key in candidates:
        if g_key in sd:
            g = sd[g_key]  # (1, 1, K)
            v = sd[v_key]  # (out, in/groups, K)
            norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
            return v * (g / np.maximum(norm, 1e-12))
    return sd[f"{base}.weight"]


def load_speech_encoder(path: str, cfg: SpeechEncoderConfig,
                        num_layers: Optional[int] = None):
    """Convert a wav2vec2-family checkpoint; `num_layers` truncates to the
    bottom N transformer layers (share_layer_ratio semantics).  Handles both
    the HF `transformers` key layout and the fairseq/s3prl hub layout the
    reference's s3prl family loads (model.py:65) — auto-detected."""
    sd = _strip_prefix(load_state_dict(path))
    if _is_fairseq_layout(sd):
        return speech_encoder_from_fairseq_state_dict(sd, cfg, num_layers)
    return speech_encoder_from_state_dict(sd, cfg, num_layers)


def _is_fairseq_layout(sd) -> bool:
    """fairseq Wav2Vec2Model fingerprints: Sequential-index conv keys,
    post_extract_proj, self_attn block names — checked under the bare
    layout AND the w2v prefixes fine-tuned fairseq CTC checkpoints nest
    the encoder under (which speech_encoder_from_fairseq_state_dict
    strips)."""
    for p in ("", "w2v_encoder.w2v_model.", "w2v_model.", "w2v_encoder."):
        if (f"{p}post_extract_proj.weight" in sd
                or f"{p}feature_extractor.conv_layers.0.0.weight" in sd
                or any(k.startswith(f"{p}encoder.layers.0.self_attn.")
                       for k in sd)):
            return True
    return False


def speech_encoder_from_fairseq_state_dict(sd, cfg: SpeechEncoderConfig,
                                           num_layers: Optional[int] = None):
    """Convert a fairseq-layout wav2vec2 state dict (the s3prl hub format —
    the one reference loading path with no HF equivalent, model.py:65) to
    the same params pytree as speech_encoder_from_state_dict.

    fairseq ConvFeatureExtractionModel packs each conv block as a
    Sequential: conv at index 0; group-norm (base family, block 0) at index
    2; per-layer LN (large family) nested at index 2.1.  The projection is
    `post_extract_proj`, its LN is the top-level `layer_norm`, the
    positional conv is the weight-normed `encoder.pos_conv.0`, transformer
    blocks use self_attn/fc1/fc2 names, and SpecAugment's embedding is
    `mask_emb`."""
    # fine-tuned fairseq CTC models nest the encoder under w2v prefixes
    sd = _strip_prefix(sd, prefixes=("w2v_encoder.w2v_model.",
                                     "w2v_model.", "w2v_encoder."))
    n_layers = num_layers if num_layers is not None else cfg.num_layers

    conv_layers = []
    for i in range(len(cfg.conv_dims)):
        base = f"feature_extractor.conv_layers.{i}"
        layer = {"conv": _conv(sd, f"{base}.0")}
        if f"{base}.2.weight" in sd:        # Fp32GroupNorm (base, block 0)
            layer["norm"] = _ln(sd, f"{base}.2")
        elif f"{base}.2.1.weight" in sd:    # Fp32LayerNorm (large family)
            layer["norm"] = _ln(sd, f"{base}.2.1")
        conv_layers.append(layer)

    pos_w = _materialize_weight_norm(sd, "encoder.pos_conv.0")
    pos_conv = {"kernel": jnp.asarray(pos_w.transpose(2, 1, 0)),
                "bias": jnp.asarray(sd["encoder.pos_conv.0.bias"])}

    def block(i):
        b = f"encoder.layers.{i}"
        return {
            "attention": {
                "q_proj": _lin(sd, f"{b}.self_attn.q_proj"),
                "k_proj": _lin(sd, f"{b}.self_attn.k_proj"),
                "v_proj": _lin(sd, f"{b}.self_attn.v_proj"),
                "out_proj": _lin(sd, f"{b}.self_attn.out_proj"),
            },
            "attention_layer_norm": _ln(sd, f"{b}.self_attn_layer_norm"),
            "ffn_in": _lin(sd, f"{b}.fc1"),
            "ffn_out": _lin(sd, f"{b}.fc2"),
            "final_layer_norm": _ln(sd, f"{b}.final_layer_norm"),
        }

    params = {
        "feature_extractor": {"layers": conv_layers},
        "feature_projection": {
            "layer_norm": _ln(sd, "layer_norm"),
            "projection": _lin(sd, "post_extract_proj"),
        },
        "pos_conv": pos_conv,
        "encoder_layer_norm": _ln(sd, "encoder.layer_norm"),
        "layers": _stack([block(i) for i in range(n_layers)]),
    }
    if "mask_emb" in sd:
        params["masked_spec_embed"] = jnp.asarray(sd["mask_emb"])
    return params


def speech_encoder_from_state_dict(sd, cfg: SpeechEncoderConfig,
                                   num_layers: Optional[int] = None):
    """Convert an already-loaded (prefix-stripped) wav2vec2-family state
    dict.  Split out of load_speech_encoder so the fused-model converter
    (load_speechmix) can reuse it on a sub-dict."""
    n_layers = num_layers if num_layers is not None else cfg.num_layers

    conv_layers = []
    for i in range(len(cfg.conv_dims)):
        base = f"feature_extractor.conv_layers.{i}"
        layer = {"conv": _conv(sd, f"{base}.conv")}
        if f"{base}.layer_norm.weight" in sd:
            layer["norm"] = _ln(sd, f"{base}.layer_norm")
        conv_layers.append(layer)

    pos_w = _materialize_weight_norm(sd, "encoder.pos_conv_embed.conv")
    pos_conv = {"kernel": jnp.asarray(pos_w.transpose(2, 1, 0)),
                "bias": jnp.asarray(sd["encoder.pos_conv_embed.conv.bias"])}

    def block(i):
        b = f"encoder.layers.{i}"
        return {
            "attention": {
                "q_proj": _lin(sd, f"{b}.attention.q_proj"),
                "k_proj": _lin(sd, f"{b}.attention.k_proj"),
                "v_proj": _lin(sd, f"{b}.attention.v_proj"),
                "out_proj": _lin(sd, f"{b}.attention.out_proj"),
            },
            "attention_layer_norm": _ln(sd, f"{b}.layer_norm"),
            "ffn_in": _lin(sd, f"{b}.feed_forward.intermediate_dense"),
            "ffn_out": _lin(sd, f"{b}.feed_forward.output_dense"),
            "final_layer_norm": _ln(sd, f"{b}.final_layer_norm"),
        }

    params = {
        "feature_extractor": {"layers": conv_layers},
        "feature_projection": {
            "layer_norm": _ln(sd, "feature_projection.layer_norm"),
            "projection": _lin(sd, "feature_projection.projection"),
        },
        "pos_conv": pos_conv,
        "encoder_layer_norm": _ln(sd, "encoder.layer_norm"),
        "layers": _stack([block(i) for i in range(n_layers)]),
    }
    if "masked_spec_embed" in sd:
        # SpecAugment replacement embedding: used by the training forward
        # when cfg.apply_spec_augment (speech_encoder.compute_time_mask),
        # and carried through exports so a converted checkpoint loads back
        # into the reference strictly
        params["masked_spec_embed"] = jnp.asarray(sd["masked_spec_embed"])
    return params


# ----------------------------------------------------------------------------
# seq2seq
# ----------------------------------------------------------------------------

def _bart_block(sd, b, is_decoder):
    p = {
        "self_attn": {
            "q_proj": _lin(sd, f"{b}.self_attn.q_proj"),
            "k_proj": _lin(sd, f"{b}.self_attn.k_proj"),
            "v_proj": _lin(sd, f"{b}.self_attn.v_proj"),
            "out_proj": _lin(sd, f"{b}.self_attn.out_proj"),
        },
        "self_attn_layer_norm": _ln(sd, f"{b}.self_attn_layer_norm"),
        "fc1": _lin(sd, f"{b}.fc1"),
        "fc2": _lin(sd, f"{b}.fc2"),
        "final_layer_norm": _ln(sd, f"{b}.final_layer_norm"),
    }
    if is_decoder:
        p["encoder_attn"] = {
            "q_proj": _lin(sd, f"{b}.encoder_attn.q_proj"),
            "k_proj": _lin(sd, f"{b}.encoder_attn.k_proj"),
            "v_proj": _lin(sd, f"{b}.encoder_attn.v_proj"),
            "out_proj": _lin(sd, f"{b}.encoder_attn.out_proj"),
        }
        p["encoder_attn_layer_norm"] = _ln(sd,
                                           f"{b}.encoder_attn_layer_norm")
    return p


def _t5_attn(sd, b):
    return {
        "q_proj": _lin(sd, f"{b}.q"),
        "k_proj": _lin(sd, f"{b}.k"),
        "v_proj": _lin(sd, f"{b}.v"),
        "out_proj": _lin(sd, f"{b}.o"),
    }


def _t5_block(sd, b, is_decoder, gated):
    ff_idx = 2 if is_decoder else 1
    ff = f"{b}.layer.{ff_idx}.DenseReluDense"
    p = {
        "self_attn": _t5_attn(sd, f"{b}.layer.0.SelfAttention"),
        "self_attn_layer_norm": _rms(sd, f"{b}.layer.0.layer_norm"),
        "final_layer_norm": _rms(sd, f"{b}.layer.{ff_idx}.layer_norm"),
        "fc2": _lin(sd, f"{ff}.wo"),
    }
    if gated:
        p["fc_gate"] = _lin(sd, f"{ff}.wi_0")
        p["fc1"] = _lin(sd, f"{ff}.wi_1")
    else:
        p["fc1"] = _lin(sd, f"{ff}.wi")
    if is_decoder:
        p["encoder_attn"] = _t5_attn(sd, f"{b}.layer.1.EncDecAttention")
        p["encoder_attn_layer_norm"] = _rms(sd, f"{b}.layer.1.layer_norm")
    return p


def load_seq2seq(path: str, cfg: Seq2SeqConfig):
    return seq2seq_from_state_dict(_strip_prefix(load_state_dict(path)), cfg)


def seq2seq_from_state_dict(sd, cfg: Seq2SeqConfig):
    """Convert an already-loaded (prefix-stripped) BART/T5 state dict."""
    params = {"shared": {"embedding": jnp.asarray(sd["shared.weight"])}}
    if cfg.arch == "bart":
        enc = {
            "embed_positions": {"embedding": jnp.asarray(
                sd["encoder.embed_positions.weight"])},
            "layernorm_embedding": _ln(sd, "encoder.layernorm_embedding"),
            "layers": _stack([_bart_block(sd, f"encoder.layers.{i}", False)
                              for i in range(cfg.encoder_layers)]),
        }
        dec = {
            "embed_positions": {"embedding": jnp.asarray(
                sd["decoder.embed_positions.weight"])},
            "layernorm_embedding": _ln(sd, "decoder.layernorm_embedding"),
            "layers": _stack([_bart_block(sd, f"decoder.layers.{i}", True)
                              for i in range(cfg.decoder_layers)]),
        }
        flb = sd.get("final_logits_bias",
                     np.zeros((1, cfg.vocab_size), np.float32))
        params["final_logits_bias"] = jnp.asarray(flb).reshape(-1)
    else:
        gated = cfg.activation == "gelu_gated"
        enc = {
            "rel_bias": {"embedding": jnp.asarray(
                sd["encoder.block.0.layer.0.SelfAttention"
                   ".relative_attention_bias.weight"])},
            "final_layer_norm": _rms(sd, "encoder.final_layer_norm"),
            "layers": _stack([_t5_block(sd, f"encoder.block.{i}", False,
                                        gated)
                              for i in range(cfg.encoder_layers)]),
        }
        dec = {
            "rel_bias": {"embedding": jnp.asarray(
                sd["decoder.block.0.layer.0.SelfAttention"
                   ".relative_attention_bias.weight"])},
            "final_layer_norm": _rms(sd, "decoder.final_layer_norm"),
            "layers": _stack([_t5_block(sd, f"decoder.block.{i}", True,
                                        gated)
                              for i in range(cfg.decoder_layers)]),
        }
    params["encoder"] = enc
    params["decoder"] = dec
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = {"kernel": jnp.asarray(sd["lm_head.weight"].T)}
    return params


# ----------------------------------------------------------------------------
# fused SpeechMix model
# ----------------------------------------------------------------------------

def load_speechmix(sd_or_path, cfg):
    """Convert a FULL reference HFSpeechMixEED-family state dict
    (reference: speechmix/hf_model.py:185-447) into this framework's fused
    param pytree.

    Accepts a path (file/dir) or an in-memory state dict (torch tensors or
    numpy arrays).  Maps:
      encoder_model.*        -> params["speech_encoder"]
      decoder_model.*        -> params["nlp"]
      length_adapters.{i}.*  -> params["length_adapter"][i]
      enc_to_dec_proj.*      -> params["enc_to_dec_proj"]
      weights_sum            -> params["weights_sum"]
    (nlp_emb.weight is the tied input embedding, already covered by
    decoder_model shared weights; discriminator/adapter keys are converted
    when the variant config asks for them.)

    `cfg` is a speechmix_tpu.config.SpeechMixConfig; the speech encoder
    sub-dict is converted at cfg.num_speech_encoder_layers depth (the
    reference physically removes truncated layers before saving,
    hf_model.py:235-240, so the state dict holds exactly that many).
    """
    if isinstance(sd_or_path, dict):
        sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach")
                  else np.asarray(v))
              for k, v in sd_or_path.items()}
    else:
        sd = load_state_dict(sd_or_path)

    def sub(prefix):
        n = len(prefix)
        return _strip_prefix({k[n:]: v for k, v in sd.items()
                              if k.startswith(prefix)})

    params = {
        "speech_encoder": speech_encoder_from_state_dict(
            sub("encoder_model."), cfg.encoder,
            cfg.num_speech_encoder_layers),
        "nlp": seq2seq_from_state_dict(sub("decoder_model."), cfg.decoder),
        "enc_to_dec_proj": _lin(sd, "enc_to_dec_proj"),
        "length_adapter": [_conv(sd, f"length_adapters.{i}")
                           for i in range(cfg.downloop)],
    }
    if cfg.weighted_sum:
        params["weights_sum"] = (
            jnp.asarray(sd["weights_sum"]) if "weights_sum" in sd
            else jnp.zeros((cfg.num_weighted_sum,), jnp.float32))
    if cfg.variant == "gan" and "discriminator.weight" in sd:
        params["discriminator"] = _lin(sd, "discriminator")
    if "adapters.0.0.weight" in sd:
        # reference HFSpeechMixAdapter: one LN->down->ReLU->up Sequential per
        # NLP layer, encoder layers first then decoder (hf_model.py:470-497);
        # torch Sequential key indices 0/1/3
        def _adapter(i):
            return {"layer_norm": _ln(sd, f"adapters.{i}.0"),
                    "down": _lin(sd, f"adapters.{i}.1"),
                    "up": _lin(sd, f"adapters.{i}.3")}
        enc_n = cfg.decoder.encoder_layers
        dec_n = cfg.decoder.decoder_layers
        params["adapters"] = {
            "encoder": _stack([_adapter(i) for i in range(enc_n)]),
            "decoder": _stack([_adapter(enc_n + i) for i in range(dec_n)]),
        }
    return params


# ----------------------------------------------------------------------------
# export: fused params -> reference-format state dict (the inverse direction:
# take a model trained here back to the reference / HF torch ecosystem)
# ----------------------------------------------------------------------------

def _exp_lin(out, p, name):
    out[f"{name}.weight"] = np.asarray(p["kernel"]).T
    if "bias" in p:
        out[f"{name}.bias"] = np.asarray(p["bias"])


def _exp_ln(out, p, name):
    out[f"{name}.weight"] = np.asarray(p["scale"])
    out[f"{name}.bias"] = np.asarray(p["bias"])


def _exp_rms(out, p, name):
    out[f"{name}.weight"] = np.asarray(p["scale"])


def _exp_conv(out, p, name):
    out[f"{name}.weight"] = np.asarray(p["kernel"]).transpose(2, 1, 0)
    if "bias" in p:
        out[f"{name}.bias"] = np.asarray(p["bias"])


def _unstack(stacked):
    import jax
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    return [jax.tree_util.tree_map(lambda x: x[i], stacked)
            for i in range(n)]


def _export_speech_encoder(out, params, prefix):
    if "masked_spec_embed" in params:
        out[f"{prefix}masked_spec_embed"] = np.asarray(
            params["masked_spec_embed"])
    else:
        # models initialized here have no SpecAugment embedding; export a
        # zeros vector so the reference's strict load_state_dict succeeds
        # (the reference only reads it when apply_spec_augment masks during
        # training)
        hidden = np.asarray(
            params["feature_projection"]["projection"]["kernel"]).shape[1]
        out[f"{prefix}masked_spec_embed"] = np.zeros((hidden,), np.float32)
    for i, layer in enumerate(params["feature_extractor"]["layers"]):
        base = f"{prefix}feature_extractor.conv_layers.{i}"
        _exp_conv(out, layer["conv"], f"{base}.conv")
        if "norm" in layer:
            _exp_ln(out, layer["norm"], f"{base}.layer_norm")
    fp = params["feature_projection"]
    _exp_ln(out, fp["layer_norm"], f"{prefix}feature_projection.layer_norm")
    _exp_lin(out, fp["projection"], f"{prefix}feature_projection.projection")
    # pos-conv weight-norm decomposition: v = w, g = ||w|| over (out, in)
    # per kernel position — _materialize_weight_norm reconstructs w exactly
    w = np.asarray(params["pos_conv"]["kernel"]).transpose(2, 1, 0)
    g = np.sqrt((w ** 2).sum(axis=(0, 1), keepdims=True))
    base = f"{prefix}encoder.pos_conv_embed.conv"
    out[f"{base}.weight_g"] = g
    out[f"{base}.weight_v"] = w
    out[f"{base}.bias"] = np.asarray(params["pos_conv"]["bias"])
    _exp_ln(out, params["encoder_layer_norm"], f"{prefix}encoder.layer_norm")
    for i, blk in enumerate(_unstack(params["layers"])):
        b = f"{prefix}encoder.layers.{i}"
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _exp_lin(out, blk["attention"][nm], f"{b}.attention.{nm}")
        _exp_ln(out, blk["attention_layer_norm"], f"{b}.layer_norm")
        _exp_lin(out, blk["ffn_in"],
                 f"{b}.feed_forward.intermediate_dense")
        _exp_lin(out, blk["ffn_out"], f"{b}.feed_forward.output_dense")
        _exp_ln(out, blk["final_layer_norm"], f"{b}.final_layer_norm")


def _export_bart_block(out, blk, b, is_decoder):
    for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
        _exp_lin(out, blk["self_attn"][nm], f"{b}.self_attn.{nm}")
    _exp_ln(out, blk["self_attn_layer_norm"], f"{b}.self_attn_layer_norm")
    _exp_lin(out, blk["fc1"], f"{b}.fc1")
    _exp_lin(out, blk["fc2"], f"{b}.fc2")
    _exp_ln(out, blk["final_layer_norm"], f"{b}.final_layer_norm")
    if is_decoder:
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _exp_lin(out, blk["encoder_attn"][nm], f"{b}.encoder_attn.{nm}")
        _exp_ln(out, blk["encoder_attn_layer_norm"],
                f"{b}.encoder_attn_layer_norm")


def _export_t5_block(out, blk, b, is_decoder, gated):
    for ours, theirs in (("q_proj", "q"), ("k_proj", "k"), ("v_proj", "v"),
                         ("out_proj", "o")):
        _exp_lin(out, blk["self_attn"][ours],
                 f"{b}.layer.0.SelfAttention.{theirs}")
    _exp_rms(out, blk["self_attn_layer_norm"], f"{b}.layer.0.layer_norm")
    ff_idx = 2 if is_decoder else 1
    ff = f"{b}.layer.{ff_idx}.DenseReluDense"
    if gated:
        _exp_lin(out, blk["fc_gate"], f"{ff}.wi_0")
        _exp_lin(out, blk["fc1"], f"{ff}.wi_1")
    else:
        _exp_lin(out, blk["fc1"], f"{ff}.wi")
    _exp_lin(out, blk["fc2"], f"{ff}.wo")
    _exp_rms(out, blk["final_layer_norm"], f"{b}.layer.{ff_idx}.layer_norm")
    if is_decoder:
        for ours, theirs in (("q_proj", "q"), ("k_proj", "k"),
                             ("v_proj", "v"), ("out_proj", "o")):
            _exp_lin(out, blk["encoder_attn"][ours],
                     f"{b}.layer.1.EncDecAttention.{theirs}")
        _exp_rms(out, blk["encoder_attn_layer_norm"],
                 f"{b}.layer.1.layer_norm")


def _export_seq2seq(out, params, cfg: Seq2SeqConfig, prefix):
    shared = np.asarray(params["shared"]["embedding"])
    if cfg.arch == "bart":
        m = f"{prefix}model."
        out[f"{m}shared.weight"] = shared
        # tied aliases torch's state_dict() also carries
        out[f"{m}encoder.embed_tokens.weight"] = shared
        out[f"{m}decoder.embed_tokens.weight"] = shared
        for side in ("encoder", "decoder"):
            p = params[side]
            out[f"{m}{side}.embed_positions.weight"] = np.asarray(
                p["embed_positions"]["embedding"])
            _exp_ln(out, p["layernorm_embedding"],
                    f"{m}{side}.layernorm_embedding")
            for i, blk in enumerate(_unstack(p["layers"])):
                _export_bart_block(out, blk, f"{m}{side}.layers.{i}",
                                   side == "decoder")
        out[f"{prefix}final_logits_bias"] = np.asarray(
            params["final_logits_bias"]).reshape(1, -1)
    else:
        out[f"{prefix}shared.weight"] = shared
        out[f"{prefix}encoder.embed_tokens.weight"] = shared
        out[f"{prefix}decoder.embed_tokens.weight"] = shared
        gated = cfg.activation == "gelu_gated"
        for side in ("encoder", "decoder"):
            p = params[side]
            out[f"{prefix}{side}.block.0.layer.0.SelfAttention"
                f".relative_attention_bias.weight"] = np.asarray(
                    p["rel_bias"]["embedding"])
            _exp_rms(out, p["final_layer_norm"],
                     f"{prefix}{side}.final_layer_norm")
            for i, blk in enumerate(_unstack(p["layers"])):
                _export_t5_block(out, blk, f"{prefix}{side}.block.{i}",
                                 side == "decoder", gated)
    if cfg.tie_word_embeddings:
        out[f"{prefix}lm_head.weight"] = shared
    elif "lm_head" in params:
        out[f"{prefix}lm_head.weight"] = np.asarray(
            params["lm_head"]["kernel"]).T


def export_speechmix(params, cfg) -> Dict[str, np.ndarray]:
    """Inverse of load_speechmix: fused param pytree -> a reference-format
    HFSpeechMixEED state dict (numpy arrays, torch key names), loadable by
    the reference model (speechmix/hf_model.py:185-447) and round-trippable
    through load_speechmix.  Lets a model trained on TPU go back to the
    reference / HF torch ecosystem."""
    out: Dict[str, np.ndarray] = {}
    _export_speech_encoder(out, params["speech_encoder"], "encoder_model.")
    _export_seq2seq(out, params["nlp"], cfg.decoder, "decoder_model.")
    # the reference registers the tied NLP input embedding as nlp_emb
    out["nlp_emb.weight"] = np.asarray(params["nlp"]["shared"]["embedding"])
    _exp_lin(out, params["enc_to_dec_proj"], "enc_to_dec_proj")
    for i, conv in enumerate(params["length_adapter"]):
        _exp_conv(out, conv, f"length_adapters.{i}")
    if "weights_sum" in params:
        out["weights_sum"] = np.asarray(params["weights_sum"])
    if "discriminator" in params:
        _exp_lin(out, params["discriminator"], "discriminator")
    if "adapters" in params:
        ads = (_unstack(params["adapters"]["encoder"]) +
               _unstack(params["adapters"]["decoder"]))
        for i, ad in enumerate(ads):
            _exp_ln(out, ad["layer_norm"], f"adapters.{i}.0")
            _exp_lin(out, ad["down"], f"adapters.{i}.1")
            _exp_lin(out, ad["up"], f"adapters.{i}.3")
    return {k: np.asarray(v, np.float32) for k, v in out.items()}


# ----------------------------------------------------------------------------
# config derivation from HF config.json (real-checkpoint turnkey path)
# ----------------------------------------------------------------------------

_SPEECH_MODEL_TYPES = ("wav2vec2", "hubert", "unispeech-sat", "unispeech_sat")
_SEQ2SEQ_MODEL_TYPES = ("bart", "mbart", "t5", "mt5", "byt5")


def _encoder_config_from_dict(d: dict) -> SpeechEncoderConfig:
    """HF Wav2Vec2Config/HubertConfig/UniSpeechSatConfig dict ->
    SpeechEncoderConfig (field names per transformers' config docs)."""
    return SpeechEncoderConfig(
        name=d.get("_name_or_path") or d.get("model_type", "wav2vec2"),
        conv_dims=tuple(d.get("conv_dim", (512,) * 7)),
        conv_kernels=tuple(d.get("conv_kernel", (10, 3, 3, 3, 3, 2, 2))),
        conv_strides=tuple(d.get("conv_stride", (5, 2, 2, 2, 2, 2, 2))),
        conv_bias=bool(d.get("conv_bias", False)),
        feat_extract_norm=d.get("feat_extract_norm", "group"),
        hidden_size=int(d.get("hidden_size", 768)),
        num_layers=int(d.get("num_hidden_layers", 12)),
        num_heads=int(d.get("num_attention_heads", 12)),
        ffn_dim=int(d.get("intermediate_size", 3072)),
        activation=d.get("hidden_act", "gelu"),
        layer_norm_eps=float(d.get("layer_norm_eps", 1e-5)),
        do_stable_layer_norm=bool(d.get("do_stable_layer_norm", False)),
        pos_conv_kernel=int(d.get("num_conv_pos_embeddings", 128)),
        pos_conv_groups=int(d.get("num_conv_pos_embedding_groups", 16)),
        dropout=float(d.get("hidden_dropout", 0.1)),
        attention_dropout=float(d.get("attention_dropout", 0.1)),
        activation_dropout=float(d.get("activation_dropout", 0.1)),
        feat_proj_dropout=float(d.get("feat_proj_dropout", 0.1)),
        apply_spec_augment=bool(d.get("apply_spec_augment", True)),
        mask_time_prob=float(d.get("mask_time_prob", 0.05)),
        mask_time_length=int(d.get("mask_time_length", 10)),
        mask_time_min_masks=int(d.get("mask_time_min_masks", 2)),
        mask_feature_prob=float(d.get("mask_feature_prob", 0.0)),
        mask_feature_length=int(d.get("mask_feature_length", 10)),
        mask_feature_min_masks=int(d.get("mask_feature_min_masks", 0)),
        layerdrop=float(d.get("layerdrop", 0.1)),
    )


def _id_or(d: dict, key: str, default):
    """Null-safe token-id read: HF serializes unset ids as explicit JSON
    null (d[key] is None even though the key exists), and 0 is a VALID id,
    so neither dict.get's default nor `or` alone is safe."""
    v = d.get(key)
    return int(default if v is None else v)


def _seq2seq_config_from_dict(d: dict) -> Seq2SeqConfig:
    """HF BartConfig / T5Config dict -> Seq2SeqConfig."""
    mt = d.get("model_type", "bart")
    name = d.get("_name_or_path") or mt
    if mt in ("t5", "mt5", "byt5"):
        ff_proj = d.get("feed_forward_proj", "relu")
        gated = ff_proj.startswith("gated-")
        act = ff_proj[len("gated-"):] if gated else ff_proj
        if gated:
            act = act + "_gated"
        return Seq2SeqConfig(
            name=name, arch="t5",
            vocab_size=int(d.get("vocab_size", 32128)),
            hidden_size=int(d.get("d_model", 512)),
            encoder_layers=int(d.get("num_layers", 6)),
            decoder_layers=int(d.get("num_decoder_layers",
                                     d.get("num_layers", 6))),
            num_heads=int(d.get("num_heads", 8)),
            head_dim=int(d.get("d_kv", 64)),
            ffn_dim=int(d.get("d_ff", 2048)),
            activation=act,
            layer_norm_eps=float(d.get("layer_norm_epsilon", 1e-6)),
            dropout=float(d.get("dropout_rate", 0.1)),
            attention_dropout=float(d.get("dropout_rate", 0.1)),
            activation_dropout=float(d.get("dropout_rate", 0.1)),
            scale_embedding=False,
            tie_word_embeddings=bool(d.get("tie_word_embeddings", True)),
            pad_token_id=_id_or(d, "pad_token_id", 0),
            bos_token_id=_id_or(d, "bos_token_id", 0),
            eos_token_id=_id_or(d, "eos_token_id", 1),
            decoder_start_token_id=_id_or(
                d, "decoder_start_token_id", _id_or(d, "pad_token_id", 0)),
            relative_attention_num_buckets=int(
                d.get("relative_attention_num_buckets", 32)),
            relative_attention_max_distance=int(
                d.get("relative_attention_max_distance", 128)),
            max_length=int(d.get("max_length") or 128),
        )
    enc_heads = int(d.get("encoder_attention_heads", 12))
    dec_heads = int(d.get("decoder_attention_heads", enc_heads))
    enc_ffn = int(d.get("encoder_ffn_dim", 3072))
    dec_ffn = int(d.get("decoder_ffn_dim", enc_ffn))
    if dec_heads != enc_heads or dec_ffn != enc_ffn:
        # Seq2SeqConfig carries ONE num_heads/ffn_dim for both stacks;
        # deriving the encoder's values for an asymmetric checkpoint would
        # silently mis-split decoder heads.  Fail loudly instead.
        raise ValueError(
            f"asymmetric BART checkpoint not representable: encoder "
            f"heads/ffn {enc_heads}/{enc_ffn} vs decoder "
            f"{dec_heads}/{dec_ffn}")
    return Seq2SeqConfig(
        name=name, arch="bart",
        vocab_size=int(d.get("vocab_size", 50265)),
        hidden_size=int(d.get("d_model", 768)),
        encoder_layers=int(d.get("encoder_layers", 6)),
        decoder_layers=int(d.get("decoder_layers", 6)),
        num_heads=enc_heads,
        ffn_dim=enc_ffn,
        activation=d.get("activation_function", "gelu"),
        max_positions=int(d.get("max_position_embeddings", 1024)),
        dropout=float(d.get("dropout", 0.1)),
        attention_dropout=float(d.get("attention_dropout", 0.1)),
        activation_dropout=float(d.get("activation_dropout", 0.1)),
        scale_embedding=bool(d.get("scale_embedding", False)),
        tie_word_embeddings=bool(d.get("tie_word_embeddings", True)),
        pad_token_id=_id_or(d, "pad_token_id", 1),
        bos_token_id=_id_or(d, "bos_token_id", 0),
        eos_token_id=_id_or(d, "eos_token_id", 2),
        decoder_start_token_id=_id_or(d, "decoder_start_token_id", 2),
        max_length=int(d.get("max_length") or 128),
    )


def config_from_hf(path_or_dict):
    """Derive this framework's config from an HF checkpoint's config.json.

    Accepts a checkpoint directory, a config.json path, or an
    already-parsed dict.  Returns:
      * SpeechEncoderConfig  for wav2vec2 / hubert / unispeech-sat configs
      * Seq2SeqConfig        for bart / t5 family configs
      * (SpeechEncoderConfig, Seq2SeqConfig) for the reference's composite
        SpeechMixConfig ("model_type": "speechmix", hf_model.py:37-79) —
        the fused `voidful/speechmix_eed_fixed`-style checkpoint layout.
        Fusion hyperparameters (share_layer_ratio, down_scale, ...) are NOT
        stored in the reference config; pass them to the model constructor
        as usual.

    A sibling generation_config.json's max_length (HF moves generation
    defaults there in recent versions) overrides the config value.

    This is the real-checkpoint turnkey path: point
    `HFSpeechMixEED(hf_checkpoint_config_dir, ...)` or `eval.py
    --hf_checkpoint_dir` at a mounted checkpoint and the architecture is
    derived instead of hand-matched to a preset."""
    import json
    gen_cfg = None
    if isinstance(path_or_dict, dict):
        d = path_or_dict
    else:
        p = str(path_or_dict)
        if os.path.isdir(p):
            gen_p = os.path.join(p, "generation_config.json")
            if os.path.exists(gen_p):
                with open(gen_p) as f:
                    gen_cfg = json.load(f)
            p = os.path.join(p, "config.json")
        with open(p) as f:
            d = json.load(f)

    def _gen_max_length(cfg):
        # modern transformers moves generation defaults out of config.json
        # into a sibling generation_config.json — honor it on every branch
        if gen_cfg and gen_cfg.get("max_length"):
            import dataclasses as _dc
            return _dc.replace(cfg, max_length=int(gen_cfg["max_length"]))
        return cfg

    mt = d.get("model_type", "")
    if mt == "speechmix" or ("encoder" in d and "decoder" in d and
                             isinstance(d.get("encoder"), dict)):
        enc = _encoder_config_from_dict(d["encoder"])
        dec = _gen_max_length(_seq2seq_config_from_dict(d["decoder"]))
        return enc, dec
    if mt in _SPEECH_MODEL_TYPES or "conv_dim" in d:
        return _encoder_config_from_dict(d)
    if mt in _SEQ2SEQ_MODEL_TYPES or "d_model" in d:
        return _gen_max_length(_seq2seq_config_from_dict(d))
    raise ValueError(f"unrecognized HF config (model_type={mt!r})")


def load_speechmix_ed(sd_or_path, cfg):
    """Convert a reference HFSpeechMixED state dict (the
    SpeechEncoderDecoderModel wrapper, hf_model.py:82-124: keys
    model.encoder.* = Wav2Vec2Model, model.decoder.* = BartForCausalLM,
    optional model.enc_to_dec_proj.*) into this framework's variant='ed'
    param pytree.

    The ED fusion has no length adapters / weighted sum (cfg should carry
    down_scale=1, weighted_sum=False); when the checkpoint has no
    enc_to_dec_proj (equal hidden sizes — SpeechEncoderDecoderModel only
    inserts one on mismatch), an identity projection is used so our always-
    projected graph computes the same function.  The BartForCausalLM
    decoder's embed_tokens/lm_head become the shared embedding (they are
    freshly initialized by HF on ED construction; converting the actual
    state dict keeps whatever values the checkpoint holds).  The NLP text
    encoder subtree is unused by the ed forward and is zero-filled."""
    if isinstance(sd_or_path, dict):
        sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach")
                  else np.asarray(v))
              for k, v in sd_or_path.items()}
    else:
        sd = load_state_dict(sd_or_path)
    # normalize: HFSpeechMixED registers the composite as self.model
    if any(k.startswith("model.encoder.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.")}

    enc_sd = _strip_prefix({k[len("encoder."):]: v for k, v in sd.items()
                            if k.startswith("encoder.")})
    speech = speech_encoder_from_state_dict(enc_sd, cfg.encoder,
                                            cfg.num_speech_encoder_layers)

    # BartForCausalLM nests the decoder under decoder.model.decoder.*
    dsd = {}
    for k, v in sd.items():
        if k.startswith("decoder.model.decoder."):
            dsd["decoder." + k[len("decoder.model.decoder."):]] = v
        elif k == "decoder.lm_head.weight":
            dsd["lm_head.weight"] = v
    dec_cfg = cfg.decoder
    nlp = {
        "shared": {"embedding": jnp.asarray(
            dsd["decoder.embed_tokens.weight"])},
        "final_logits_bias": jnp.zeros((dec_cfg.vocab_size,), jnp.float32),
        "decoder": {
            "embed_positions": {"embedding": jnp.asarray(
                dsd["decoder.embed_positions.weight"])},
            "layernorm_embedding": _ln(dsd, "decoder.layernorm_embedding"),
            "layers": _stack([_bart_block(dsd, f"decoder.layers.{i}", True)
                              for i in range(dec_cfg.decoder_layers)]),
        },
        # text-encoder subtree: unused by the ed forward (cross-attention
        # fusion goes straight to the decoder); zero-filled placeholders
        "encoder": {
            "embed_positions": {"embedding": jnp.zeros(
                (dec_cfg.max_positions + 2, dec_cfg.hidden_size),
                jnp.float32)},
            "layernorm_embedding": {
                "scale": jnp.ones((dec_cfg.hidden_size,), jnp.float32),
                "bias": jnp.zeros((dec_cfg.hidden_size,), jnp.float32)},
            "layers": _stack([_bart_block_zeros(dec_cfg)
                              for _ in range(dec_cfg.encoder_layers)]),
        },
    }
    if not dec_cfg.tie_word_embeddings and "lm_head.weight" in dsd:
        nlp["lm_head"] = {"kernel": jnp.asarray(dsd["lm_head.weight"].T)}

    if "enc_to_dec_proj.weight" in sd:
        proj = _lin(sd, "enc_to_dec_proj")
    else:
        assert cfg.encoder.hidden_size == dec_cfg.hidden_size, (
            "checkpoint has no enc_to_dec_proj but hidden sizes differ")
        proj = {"kernel": jnp.eye(dec_cfg.hidden_size, dtype=jnp.float32),
                "bias": jnp.zeros((dec_cfg.hidden_size,), jnp.float32)}

    return {"speech_encoder": speech, "nlp": nlp,
            "enc_to_dec_proj": proj, "length_adapter": []}


def _bart_block_zeros(dec_cfg):
    h, f = dec_cfg.hidden_size, dec_cfg.ffn_dim

    def lin(i, o):
        return {"kernel": jnp.zeros((i, o), jnp.float32),
                "bias": jnp.zeros((o,), jnp.float32)}

    def ln():
        return {"scale": jnp.ones((h,), jnp.float32),
                "bias": jnp.zeros((h,), jnp.float32)}

    return {
        "self_attn": {"q_proj": lin(h, h), "k_proj": lin(h, h),
                      "v_proj": lin(h, h), "out_proj": lin(h, h)},
        "self_attn_layer_norm": ln(),
        "fc1": lin(h, f), "fc2": lin(f, h), "final_layer_norm": ln(),
    }
