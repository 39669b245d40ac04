"""BART/T5-family seq2seq LM, TPU-native.

The reference loads `AutoModelForSeq2SeqLM` (model.py:66, hf_model.py:218) and
supports BART and T5 checkpoints (tests use voidful/bart-base-chinese,
valhalla/t5-small-qg-hl, facebook/bart-base; eval.py uses voidful/phoneme_byt5).
Here both architectures share one functional implementation, switched by
`cfg.arch`:

  bart: learned positions (offset +2), layernorm_embedding, post-LN blocks,
        scaled-dot attention, tied LM head + final_logits_bias
  t5:   relative position buckets (layer-0 bias shared across the stack),
        RMSNorm pre-LN blocks, unscaled attention (scale=1), no biases,
        tied LM head scaled by d_model**-0.5

The decoder is written for static-shape incremental decoding: per-layer
functional KV caches (ops.attention.KVCache) + precomputed cross-attention
K/V, replacing the reference's mutable `self.decoder_outputs` caching
(hf_model.py:302,354-376) and HF past_key_values.

Key entry points:
  init_seq2seq(key, cfg)            -> params
  encode(params, cfg, ...)          -> encoder hidden states
  decode(params, cfg, ...)          -> logits (+ updated caches)
  seq2seq_apply(params, cfg, ...)   -> {loss, logits, ...} (training forward)
  shift_tokens_right(labels, ...)   -> decoder inputs (model.py:15-23 semantics)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import Seq2SeqConfig
from ..ops import layers
from ..ops.attention import KVCache, attention, init_attention, \
    cache_position_bias
from ..ops.masking import NEG_INF, combine_masks_to_bias, length_mask
from ..parallel import mesh as mesh_lib


# ----------------------------------------------------------------------------
# shared helpers (reference: model.py:11-23, hf_model.py:20-34)
# ----------------------------------------------------------------------------

def shift_tokens_right(input_ids, pad_token_id, decoder_start_token_id):
    """labels -> decoder_input_ids: shift right, prepend start token, map any
    -100 to pad (model.py:15-23)."""
    shifted = jnp.zeros_like(input_ids)
    shifted = shifted.at[:, 1:].set(input_ids[:, :-1])
    shifted = shifted.at[:, 0].set(decoder_start_token_id)
    return jnp.where(shifted == -100, pad_token_id, shifted)


# ----------------------------------------------------------------------------
# init
# ----------------------------------------------------------------------------

def _init_block(key, cfg: Seq2SeqConfig, is_decoder: bool):
    k = jax.random.split(key, 6)
    h = cfg.hidden_size
    d = cfg.per_head_dim
    use_bias = cfg.arch == "bart"
    norm_init = (layers.init_layer_norm if cfg.arch == "bart"
                 else layers.init_rms_norm)
    p = {
        "self_attn": init_attention(k[0], h, h, cfg.num_heads, d,
                                    use_bias=use_bias),
        "self_attn_layer_norm": norm_init(h),
        "final_layer_norm": norm_init(h),
    }
    if is_decoder:
        p["encoder_attn"] = init_attention(k[1], h, h, cfg.num_heads, d,
                                           use_bias=use_bias)
        p["encoder_attn_layer_norm"] = norm_init(h)
    if cfg.activation == "gelu_gated":
        p["fc_gate"] = layers.init_dense(k[2], h, cfg.ffn_dim, use_bias)
    p["fc1"] = layers.init_dense(k[3], h, cfg.ffn_dim, use_bias)
    p["fc2"] = layers.init_dense(k[4], cfg.ffn_dim, h, use_bias)
    return p


def _stack_blocks(blocks):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def init_seq2seq(key, cfg: Seq2SeqConfig):
    keys = jax.random.split(key, 10)
    params = {"shared": layers.init_embedding(keys[0], cfg.vocab_size,
                                              cfg.hidden_size)}
    enc = {}
    dec = {}
    if cfg.arch == "bart":
        # learned positions with the BART +2 offset (table holds max+2 rows)
        enc["embed_positions"] = layers.init_embedding(
            keys[1], cfg.max_positions + 2, cfg.hidden_size)
        dec["embed_positions"] = layers.init_embedding(
            keys[2], cfg.max_positions + 2, cfg.hidden_size)
        enc["layernorm_embedding"] = layers.init_layer_norm(cfg.hidden_size)
        dec["layernorm_embedding"] = layers.init_layer_norm(cfg.hidden_size)
        params["final_logits_bias"] = jnp.zeros((cfg.vocab_size,), jnp.float32)
    else:  # t5
        enc["rel_bias"] = layers.init_embedding(
            keys[1], cfg.relative_attention_num_buckets, cfg.num_heads,
            stddev=0.1)
        dec["rel_bias"] = layers.init_embedding(
            keys[2], cfg.relative_attention_num_buckets, cfg.num_heads,
            stddev=0.1)
        enc["final_layer_norm"] = layers.init_rms_norm(cfg.hidden_size)
        dec["final_layer_norm"] = layers.init_rms_norm(cfg.hidden_size)

    ek = jax.random.split(keys[3], cfg.encoder_layers)
    dk = jax.random.split(keys[4], cfg.decoder_layers)
    enc["layers"] = _stack_blocks([_init_block(k, cfg, False) for k in ek])
    dec["layers"] = _stack_blocks([_init_block(k, cfg, True) for k in dk])
    params["encoder"] = enc
    params["decoder"] = dec
    if not cfg.tie_word_embeddings:
        params["lm_head"] = layers.init_dense(keys[5], cfg.hidden_size,
                                              cfg.vocab_size, use_bias=False)
    return params


# ----------------------------------------------------------------------------
# T5 relative position bias
# ----------------------------------------------------------------------------

def _t5_relative_bucket(rel_pos, bidirectional, num_buckets, max_distance):
    ret = jnp.zeros_like(rel_pos)
    n = -rel_pos
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / jnp.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


def t5_position_bias(rel_bias_params, q_len, kv_len, bidirectional, cfg,
                     q_offset=0, dtype=jnp.float32):
    """(1, H, q_len, kv_len) additive bias from the layer-0 relative-attention
    embedding, shared across the stack (T5 convention)."""
    ctx = jnp.arange(q_len)[:, None] + q_offset
    mem = jnp.arange(kv_len)[None, :]
    rel = mem - ctx
    buckets = _t5_relative_bucket(
        rel, bidirectional, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance)
    vals = rel_bias_params["embedding"].astype(dtype)[buckets]  # (q, kv, H)
    return vals.transpose(2, 0, 1)[None]


# ----------------------------------------------------------------------------
# transformer blocks
# ----------------------------------------------------------------------------

def _norm(cfg, p, x):
    if cfg.arch == "bart":
        return layers.layer_norm(p, x, cfg.layer_norm_eps)
    return layers.rms_norm(p, x, cfg.layer_norm_eps)


def _ffn(block, cfg, x, dtype, act_rng=None):
    if cfg.activation == "gelu_gated":
        g = jax.nn.gelu(layers.dense(block["fc_gate"], x, dtype),
                        approximate=True)
        h = g * layers.dense(block["fc1"], x, dtype)
        h = layers.dropout(h, cfg.activation_dropout, act_rng)
        return layers.dense(block["fc2"], h, dtype)
    # fc1 -> act -> fc2 fused into one Pallas VMEM pass when eligible
    # (ops/layers.ffn_apply); cached decode steps (rows == B) stay on XLA
    return layers.ffn_apply(block["fc1"], block["fc2"], x, cfg.activation,
                            dtype, act_rng, cfg.activation_dropout)


def _attn_scale(cfg):
    # t5 uses unscaled attention (the 1/sqrt(d) is folded into init)
    return 1.0 if cfg.arch == "t5" else None


def _encoder_block(block, cfg, x, bias, kv_mask, use_flash, dtype,
                   dropout_rng=None):
    scale = _attn_scale(cfg)
    # HF placements: attention probs, post-attention output, post-activation
    # (inside _ffn), post-FFN output
    k_attn, k_h1, k_act, k_h2 = layers.split_or_none(dropout_rng, 4)
    if cfg.arch == "bart":  # post-LN
        a, _ = attention(block["self_attn"], x, bias=bias, kv_mask=kv_mask,
                         num_heads=cfg.num_heads, head_dim=cfg.per_head_dim,
                         scale=scale, use_flash=use_flash, dtype=dtype,
                         dropout_rate=cfg.attention_dropout,
                         dropout_rng=k_attn, out_proj=False)
        # out-projection + residual + LN in one VMEM pass when eligible
        x = layers.dense_residual_ln_apply(
            block["self_attn"]["out_proj"], block["self_attn_layer_norm"],
            a, x, dtype, k_h1, cfg.dropout, cfg.layer_norm_eps)
        if cfg.activation == "gelu_gated":
            f = layers.dropout(_ffn(block, cfg, x, dtype, k_act),
                               cfg.dropout, k_h2)
            x = _norm(cfg, block["final_layer_norm"],
                      x + layers.ffn_ln_barrier(f))
        else:
            # residual + final LN fused into the FFN kernel flush when
            # eligible (post-LN LayerNorm)
            x = layers.ffn_residual_ln_apply(
                block["fc1"], block["fc2"], block["final_layer_norm"], x,
                cfg.activation, dtype, k_act, cfg.activation_dropout, k_h2,
                cfg.dropout, cfg.layer_norm_eps)
    else:  # t5 pre-LN
        h = _norm(cfg, block["self_attn_layer_norm"], x)
        a, _ = attention(block["self_attn"], h, bias=bias, kv_mask=kv_mask,
                         num_heads=cfg.num_heads, head_dim=cfg.per_head_dim,
                         scale=scale, use_flash=use_flash, dtype=dtype,
                         dropout_rate=cfg.attention_dropout,
                         dropout_rng=k_attn)
        x = x + layers.dropout(a, cfg.dropout, k_h1)
        h = _norm(cfg, block["final_layer_norm"], x)
        x = x + layers.ffn_ln_barrier(
            layers.dropout(_ffn(block, cfg, h, dtype, k_act),
                           cfg.dropout, k_h2))
    return x


# Unroll factor for the cached single-token decode layer scan.  True fully
# unrolls: XLA fuses across layer boundaries, cutting the per-step fusion
# fences the scan imposes (the PERF.md decode-overhead lever).  Identical
# numerics (lax.scan unroll is a scheduling knob); trace-time switch.
# Measured on v5e (flagship greedy, 16 s, 64 steps): unroll wins at large
# batch (+3.9% RTFx B=32, +1.2% B=128) but LOSES ~10% at B<=8 (the unrolled
# step's bigger program schedules worse when each matmul is tiny), so "auto"
# unrolls only when the trace-time batch is >= _UNROLL_MIN_BATCH.
DECODE_LAYER_UNROLL = "auto"
_UNROLL_MIN_BATCH = 16


def set_decode_layer_unroll(unroll):
    """Trace-time switch for the cached decode layer-scan unroll ("auto" /
    True / False / int factor).  Call before the first generate() compile."""
    global DECODE_LAYER_UNROLL
    DECODE_LAYER_UNROLL = unroll


def _resolve_decode_unroll(batch):
    if DECODE_LAYER_UNROLL == "auto":
        return True if batch >= _UNROLL_MIN_BATCH else 1
    return DECODE_LAYER_UNROLL if DECODE_LAYER_UNROLL is not False else 1


class DecoderCache(NamedTuple):
    """Stacked per-layer caches for incremental decoding.

    With kv_int8 (init_decoder_cache), cross_k/cross_v hold int8 codes and
    cross_*_scale the per-(layer, batch, token, head) f32 scales — halves
    the dominant per-step HBM read of the decode loop (PERF.md stage
    breakdown: cross-KV re-read is the decode bandwidth floor).  The
    rescaling in _cross_attention is exact given the quantized codes.

    Layout: cross K/V (both dtypes) is stored batch-minor
    (L, T_enc, H, D, B) so the in-jit-produced cache gets a physical layout
    the per-step dots stream fast from (2.6x int8, 1.7x bf16 — see
    precompute_cross_kv)."""
    self_kv: KVCache          # leaves have leading layer axis
    cross_k: jnp.ndarray      # (L, T_enc, H, D, B) dtype or int8 codes
    cross_v: jnp.ndarray
    cross_k_scale: Optional[jnp.ndarray] = None   # (L, B, T_enc, H) f32
    cross_v_scale: Optional[jnp.ndarray] = None


def _decoder_block(block, cfg, x, self_bias, cross_bias, enc_hidden,
                   self_cache, cross_kv, use_flash, dtype,
                   self_kv_mask=None, self_causal=False, cross_kv_mask=None,
                   dropout_rng=None):
    """One decoder block.  self_cache: Optional[KVCache] (single layer).
    cross_kv: Optional[(k, v)] precomputed cross K/V."""
    scale = _attn_scale(cfg)
    new_cache = None
    k_sattn, k_h1, k_cattn, k_h2, k_act, k_h3 = layers.split_or_none(
        dropout_rng, 6)
    if cfg.arch == "bart":
        a, new_cache = attention(block["self_attn"], x, bias=self_bias,
                                 kv_mask=self_kv_mask, causal=self_causal,
                                 num_heads=cfg.num_heads,
                                 head_dim=cfg.per_head_dim, scale=scale,
                                 cache=self_cache, use_flash=use_flash,
                                 dtype=dtype,
                                 dropout_rate=cfg.attention_dropout,
                                 dropout_rng=k_sattn, out_proj=False)
        # out-projection + residual + LN fused when eligible (prefill /
        # training widths; cached single-token steps stay on the XLA chain)
        x = layers.dense_residual_ln_apply(
            block["self_attn"]["out_proj"], block["self_attn_layer_norm"],
            a, x, dtype, k_h1, cfg.dropout, cfg.layer_norm_eps)
        a = _cross_attention(block["encoder_attn"], cfg, x, enc_hidden,
                             cross_bias, cross_kv, scale, dtype,
                             kv_mask=cross_kv_mask, use_flash=use_flash,
                             dropout_rng=k_cattn, out_proj=False)
        x = layers.dense_residual_ln_apply(
            block["encoder_attn"]["out_proj"],
            block["encoder_attn_layer_norm"], a, x, dtype, k_h2,
            cfg.dropout, cfg.layer_norm_eps)
        if cfg.activation == "gelu_gated":
            f = layers.dropout(_ffn(block, cfg, x, dtype, k_act),
                               cfg.dropout, k_h3)
            x = _norm(cfg, block["final_layer_norm"], x + f)
        else:
            # eligible only at prefill widths; cached single-token decode
            # steps (rows == B) stay on the XLA chain
            x = layers.ffn_residual_ln_apply(
                block["fc1"], block["fc2"], block["final_layer_norm"], x,
                cfg.activation, dtype, k_act, cfg.activation_dropout, k_h3,
                cfg.dropout, cfg.layer_norm_eps)
    else:
        h = _norm(cfg, block["self_attn_layer_norm"], x)
        a, new_cache = attention(block["self_attn"], h, bias=self_bias,
                                 kv_mask=self_kv_mask, causal=self_causal,
                                 num_heads=cfg.num_heads,
                                 head_dim=cfg.per_head_dim, scale=scale,
                                 cache=self_cache, use_flash=use_flash,
                                 dtype=dtype,
                                 dropout_rate=cfg.attention_dropout,
                                 dropout_rng=k_sattn)
        x = x + layers.dropout(a, cfg.dropout, k_h1)
        h = _norm(cfg, block["encoder_attn_layer_norm"], x)
        a = _cross_attention(block["encoder_attn"], cfg, h, enc_hidden,
                             cross_bias, cross_kv, scale, dtype,
                             kv_mask=cross_kv_mask, use_flash=use_flash,
                             dropout_rng=k_cattn)
        x = x + layers.dropout(a, cfg.dropout, k_h2)
        h = _norm(cfg, block["final_layer_norm"], x)
        x = x + layers.dropout(_ffn(block, cfg, h, dtype, k_act),
                               cfg.dropout, k_h3)
    return x, new_cache


def _cross_attention(attn_params, cfg, x_q, enc_hidden, bias, cross_kv,
                     scale, dtype, kv_mask=None, use_flash=False,
                     dropout_rng=None, out_proj=True):
    """Cross-attention; uses precomputed K/V when given (decode hot path —
    the reference recomputes these every step through HF, SURVEY.md §3.3).
    With use_flash + q_len==1 + a structured kv_mask, runs the fused Pallas
    decode-attention kernel (ops/pallas/decode_attention.py).
    dropout_rng applies attention-prob dropout on the training (cross_kv is
    None) path only; the precomputed-K/V path is inference-only.
    out_proj=False returns the concatenated heads output — the caller owns
    the out-projection (fused post-LN epilogue)."""
    if cross_kv is None:
        out, _ = attention(attn_params, x_q, x_kv=enc_hidden, bias=bias,
                           num_heads=cfg.num_heads, head_dim=cfg.per_head_dim,
                           scale=scale, dtype=dtype,
                           dropout_rate=cfg.attention_dropout,
                           dropout_rng=dropout_rng, out_proj=out_proj)
        return out
    import math as _math
    k, v = cross_kv[0], cross_kv[1]
    k_scale, v_scale = (cross_kv[2], cross_kv[3]) if len(cross_kv) == 4 \
        else (None, None)
    d = cfg.per_head_dim
    s = scale if scale is not None else 1.0 / _math.sqrt(d)
    q = layers.dense(attn_params["q_proj"], x_q, dtype)
    q = q.reshape(*q.shape[:2], cfg.num_heads, d)
    # Shared cross-KV beam decode: when the query batch is a multiple of
    # the cache batch (beam search keeps ONE cross projection per input
    # row instead of tiling it num_beams times), fold the beams into the
    # q_len axis of the einsum — same math, 1/num_beams the K/V bytes
    # streamed per step, which is the decode bandwidth floor (PERF.md
    # stage breakdown).  Beams are contiguous per input row (jnp.repeat
    # tiling in generation.py), so the reshape is layout-only.
    kb = 1
    if q.shape[0] != k.shape[-1]:
        bkv = k.shape[-1]
        if q.shape[0] % bkv or q.shape[1] != 1:
            raise ValueError(
                f"cross-KV batch {bkv} incompatible with query batch "
                f"{q.shape[0]} x q_len {q.shape[1]}")
        kb = q.shape[0] // bkv
        q = q.reshape(bkv, kb, cfg.num_heads, d)
        for m, what in ((bias, "cross bias"), (kv_mask, "encoder mask")):
            if m is not None and m.shape[0] not in (1, bkv):
                raise ValueError(
                    f"{what} batch {m.shape[0]} != KV batch {bkv}; pass "
                    f"the UNTILED encoder mask with a shared-KV cache")
    # cross K/V arrives batch-minor (T, H, D, B) — see precompute_cross_kv
    if bias is None and kb == 1:
        from ..ops.attention import maybe_decode_kernel
        # the opt-in Pallas kernel wants (B, T, H, D); the transpose is
        # loop-invariant and hoisted, but it costs a full-cache copy —
        # acceptable only because the kernel is a non-default opt-in
        k_in = jnp.transpose(k, (3, 0, 1, 2))
        v_in = jnp.transpose(v, (3, 0, 1, 2))
        if k_scale is None:
            k_in, v_in = k_in.astype(dtype), v_in.astype(dtype)
        out = maybe_decode_kernel(q, k_in, v_in, kv_mask, s, cfg.num_heads,
                                  use_flash, k_scale=k_scale,
                                  v_scale=v_scale)
        if out is not None:
            out = out.reshape(*out.shape[:2], cfg.num_heads * d)
            return (layers.dense(attn_params["out_proj"], out, dtype)
                    if out_proj else out)
    if bias is None and kv_mask is not None:
        bias = combine_masks_to_bias(kv_mask=kv_mask)
    # int8-KV path: scores/values computed on the int8 codes (convert fuses
    # into the dot, so HBM reads stay int8); per-(token, head) scales applied
    # on the small (B, H, q, T) tensors — exact given the codes
    logits = jnp.einsum("bqhd,khdb->bhqk", q, k.astype(dtype),
                        preferred_element_type=jnp.float32) * s
    if k_scale is not None:
        logits = logits * k_scale.transpose(0, 2, 1)[:, :, None, :]
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    if v_scale is not None:
        probs = probs * v_scale.transpose(0, 2, 1)[:, :, None, :]
    probs = probs.astype(dtype)
    out = jnp.einsum("bhqk,khdb->bqhd", probs, v.astype(dtype),
                     preferred_element_type=dtype)
    out = out.reshape(*out.shape[:2], cfg.num_heads * d)
    if kb > 1:
        out = out.reshape(out.shape[0] * kb, 1, cfg.num_heads * d)
    return (layers.dense(attn_params["out_proj"], out, dtype)
            if out_proj else out)


# ----------------------------------------------------------------------------
# encoder / decoder / full apply
# ----------------------------------------------------------------------------

def init_adapter(key, dim, bottleneck):
    """Bottleneck adapter: LN -> Linear(d->b) -> ReLU -> Linear(b->d).
    The reference's Adapter variant builds these per NLP enc/dec layer and
    splices them in with forward hooks (model.py:213-222); here they are an
    explicit, flag-gated call after each block.  NOTE: the reference hook
    REPLACES the layer output with adapter(output) (no residual); we keep that
    semantic."""
    k1, k2 = jax.random.split(key)
    return {
        "layer_norm": layers.init_layer_norm(dim),
        "down": layers.init_dense(k1, dim, bottleneck),
        "up": layers.init_dense(k2, bottleneck, dim),
    }


def apply_adapter(adapter, x, dtype=jnp.float32):
    h = layers.layer_norm(adapter["layer_norm"], x)
    h = jax.nn.relu(layers.dense(adapter["down"], h, dtype))
    return layers.dense(adapter["up"], h, dtype)


def init_seq2seq_adapters(key, cfg: Seq2SeqConfig, bottleneck_ratio=0.5):
    """Stacked adapters for every text-encoder and decoder layer."""
    bottleneck = int(cfg.hidden_size * bottleneck_ratio)
    ek = jax.random.split(jax.random.fold_in(key, 0), cfg.encoder_layers)
    dk = jax.random.split(jax.random.fold_in(key, 1), cfg.decoder_layers)
    return {
        "encoder": _stack_blocks(
            [init_adapter(k, cfg.hidden_size, bottleneck) for k in ek]),
        "decoder": _stack_blocks(
            [init_adapter(k, cfg.hidden_size, bottleneck) for k in dk]),
    }


def embed_tokens(params, cfg: Seq2SeqConfig, input_ids, dtype=jnp.float32):
    scale = cfg.hidden_size ** 0.5 if cfg.scale_embedding else 1.0
    return layers.embed(params["shared"], input_ids, dtype) * scale


def encode(params, cfg: Seq2SeqConfig, input_ids=None, inputs_embeds=None,
           attention_mask=None, output_hidden_states=False, use_flash=False,
           adapters=None, dtype=jnp.float32, dropout_rng=None):
    """Text encoder.  Accepts token ids OR precomputed embeddings — the
    SpeechMix fusion feeds speech-derived `inputs_embeds` here
    (model.py:132-137).  Returns dict(last_hidden_state, mask[, hidden_states]).
    dropout_rng enables training-mode dropout at the HF placements."""
    enc = params["encoder"]
    if inputs_embeds is None:
        inputs_embeds = embed_tokens(params, cfg, input_ids, dtype)
    b, t, _ = inputs_embeds.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, t), bool)

    k_emb, k_layers, k_final = layers.split_or_none(dropout_rng, 3)
    x = inputs_embeds
    if cfg.arch == "bart":
        pos = layers.embed(enc["embed_positions"], jnp.arange(t) + 2, dtype)
        x = x + pos[None]
        x = layers.layer_norm(enc["layernorm_embedding"], x,
                              cfg.layer_norm_eps)
    x = layers.dropout(x, cfg.dropout, k_emb)
    embed_state = x  # HF hidden_states[0] (post pos+LN+dropout)
    bias = None
    if cfg.arch == "t5":
        bias = t5_position_bias(enc["rel_bias"], t, t, True, cfg,
                                dtype=jnp.float32)

    enc_block = _encoder_block
    if cfg.remat:
        enc_block = jax.checkpoint(_encoder_block,
                                   static_argnums=(1, 5, 6))

    n_layers = jax.tree_util.tree_leaves(enc["layers"])[0].shape[0]
    xs = [enc["layers"]]
    if adapters is not None:
        xs.append(adapters["encoder"])
    if k_layers is not None:
        xs.append(jax.random.split(k_layers, n_layers))

    def scan_body(h, scan_xs):
        block = scan_xs[0]
        adapter = scan_xs[1] if adapters is not None else None
        rng = scan_xs[-1] if k_layers is not None else None
        y = enc_block(block, cfg, h, bias, attention_mask,
                      use_flash, dtype, rng)
        if adapter is not None:
            y = apply_adapter(adapter, y, dtype)
        y = mesh_lib.constrain_time_sharded(y)
        return y, (y if output_hidden_states else 0)

    x, per_layer = jax.lax.scan(scan_body, x, tuple(xs))
    if cfg.arch == "t5":
        x = layers.rms_norm(enc["final_layer_norm"], x, cfg.layer_norm_eps)
        x = layers.dropout(x, cfg.dropout, k_final)

    out = {"last_hidden_state": x, "mask": attention_mask}
    if output_hidden_states:
        # HF hidden_states conventions (BartEncoder / T5Stack): entry 0 is
        # the POST pos+LN+dropout embedding state, and for T5 the last
        # entry is the POST final_layer_norm+dropout state
        stacked = jnp.concatenate([embed_state[None], per_layer], axis=0)
        if cfg.arch == "t5":
            stacked = stacked.at[-1].set(x.astype(stacked.dtype))
        out["hidden_states"] = stacked
    return out


def _quantize_kv(x):
    """Per-(batch, token, head) symmetric int8 over the head dim.
    x: (B, T, H, D) -> (codes int8, scale f32 (B, T, H))."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    codes = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127)
    return codes.astype(jnp.int8), scale


def precompute_cross_kv(params, cfg: Seq2SeqConfig, enc_hidden,
                        dtype=jnp.float32, kv_int8=False):
    """Project encoder output to per-layer cross K/V once per sequence
    (decode-time win over the reference's per-step recompute).
    kv_int8: store int8 codes + per-(token, head) scales (see DecoderCache);
    returns (k, v) or (k, v, k_scale, v_scale)."""
    def proj(block):
        k = layers.dense(block["encoder_attn"]["k_proj"], enc_hidden, dtype)
        v = layers.dense(block["encoder_attn"]["v_proj"], enc_hidden, dtype)
        b, t, _ = k.shape
        k = k.reshape(b, t, cfg.num_heads, cfg.per_head_dim)
        v = v.reshape(b, t, cfg.num_heads, cfg.per_head_dim)
        # store K/V batch-minor (T, H, D, B): when the (B, T, H, D) arrays
        # are produced inside the decode jit, XLA assigns the intermediate a
        # batch-minor physical layout and then lowers the per-step attention
        # dots as VPU loops at a penalized stream rate (int8 codes: 128 vs
        # 333 GB/s; bf16: 281 vs ~490 GB/s measured in situ).  Making
        # batch-minor the NATURAL layout of the stored array restores the
        # fast emitters — PERF.md round-3 "layout fix".
        if kv_int8:
            kq, ks = _quantize_kv(k)
            vq, vs = _quantize_kv(v)
            return (jnp.transpose(kq, (1, 2, 3, 0)),
                    jnp.transpose(vq, (1, 2, 3, 0)), ks, vs)
        return jnp.transpose(k, (1, 2, 3, 0)), jnp.transpose(v, (1, 2, 3, 0))

    return _map_blocks(proj, params["decoder"]["layers"])


def _map_blocks(fn, stacked_blocks):
    """Apply fn to each layer of a stacked block pytree; returns stacked
    results (uses lax.map to keep one compiled body)."""
    def body(block):
        return fn(block)
    return jax.lax.map(body, stacked_blocks)


def init_decoder_cache(params, cfg: Seq2SeqConfig, enc_hidden, batch,
                       capacity, dtype=jnp.float32,
                       kv_int8=False) -> DecoderCache:
    out = precompute_cross_kv(params, cfg, enc_hidden, dtype,
                              kv_int8=kv_int8)
    cross_k, cross_v = out[0], out[1]
    scales = (out[2], out[3]) if kv_int8 else (None, None)
    self_kv = KVCache(
        key=jnp.zeros((cfg.decoder_layers, batch, capacity, cfg.num_heads,
                       cfg.per_head_dim), dtype),
        value=jnp.zeros((cfg.decoder_layers, batch, capacity, cfg.num_heads,
                         cfg.per_head_dim), dtype),
        index=jnp.zeros((), jnp.int32),
    )
    return DecoderCache(self_kv=self_kv, cross_k=cross_k, cross_v=cross_v,
                        cross_k_scale=scales[0], cross_v_scale=scales[1])


def decode(params, cfg: Seq2SeqConfig, decoder_input_ids, enc_hidden=None,
           encoder_mask=None, decoder_mask=None, cache: Optional[DecoderCache]
           = None, output_hidden_states=False, use_flash=False, adapters=None,
           dtype=jnp.float32, dropout_rng=None):
    """Decoder forward.

    Without cache: full teacher-forcing pass (causal bias over q_len).
    With cache: incremental decoding — decoder_input_ids is the next chunk
    (usually length 1); positions continue at cache.self_kv.index.
    dropout_rng: training-mode dropout; supported on the uncached
    (teacher-forcing) path only — cached decoding is inference.
    Returns dict(logits[, hidden_states], cache=new_cache_or_None).
    """
    dec = params["decoder"]
    b, q_len = decoder_input_ids.shape
    offset = cache.self_kv.index if cache is not None else 0
    if cache is not None:
        dropout_rng = None
    k_emb, k_layers, k_final = layers.split_or_none(dropout_rng, 3)

    x = embed_tokens(params, cfg, decoder_input_ids, dtype)
    if cfg.arch == "bart":
        pos = layers.embed(dec["embed_positions"],
                           offset + jnp.arange(q_len) + 2, dtype)
        x = x + pos[None]
        x = layers.layer_norm(dec["layernorm_embedding"], x,
                              cfg.layer_norm_eps)
    x = layers.dropout(x, cfg.dropout, k_emb)
    inputs_embeds = x

    # self-attention masking: cached path uses an explicit bias over the
    # cache capacity; uncached path passes structured kv_mask+causal so the
    # flash kernel stays reachable
    self_kv_mask, self_causal = None, False
    if cache is not None:
        capacity = cache.self_kv.key.shape[2]
        if q_len == 1 and cfg.arch != "t5":
            # single-token step: validity is just "slot filled" (the new
            # token occupies slot `offset`) — a structured kv_mask instead
            # of an additive bias keeps the fused Pallas decode-attention
            # kernel reachable (ops/pallas/decode_attention.py)
            self_bias = None
            self_kv_mask = jnp.broadcast_to(
                jnp.arange(capacity)[None, :] <= offset, (b, capacity))
        else:
            self_bias = cache_position_bias(capacity, offset, q_len)
        kv_len = capacity
    else:
        self_bias = None
        self_kv_mask = (decoder_mask if decoder_mask is not None
                        else jnp.ones((b, q_len), bool))
        self_causal = True
        kv_len = q_len
    if cfg.arch == "t5":
        t5_bias = t5_position_bias(dec["rel_bias"], q_len, kv_len, False,
                                   cfg, q_offset=offset)
        self_bias = t5_bias if self_bias is None else self_bias + t5_bias

    cross_bias = None
    if encoder_mask is not None and not (cache is not None and q_len == 1):
        # cached single-token steps pass the raw mask instead, keeping the
        # fused decode-attention kernel reachable; _cross_attention's XLA
        # fallback builds the identical bias from it
        cross_bias = combine_masks_to_bias(kv_mask=encoder_mask)

    dec_adapters = adapters["decoder"] if adapters is not None else None
    if cache is not None:
        # scan over layers, threading per-layer self caches + cross K/V.
        # The cached path is the decode hot loop: unrolling the layer scan
        # lets XLA fuse across layer boundaries (fewer fusion fences per
        # step — PERF.md decode-overhead lever)
        has_kv_scale = cache.cross_k_scale is not None

        def scan_body(h, xs):
            block, self_k, self_v, ck, cv = xs[:5]
            rest = xs[5:]
            if has_kv_scale:
                ksc, vsc, rest = rest[0], rest[1], rest[2:]
                cross = (ck, cv, ksc, vsc)
            else:
                cross = (ck, cv)
            adapter = rest[0] if rest else None
            layer_cache = KVCache(key=self_k, value=self_v,
                                  index=cache.self_kv.index)
            y, new_c = _decoder_block(
                block, cfg, h, self_bias, cross_bias, None, layer_cache,
                cross, use_flash, dtype,
                self_kv_mask=self_kv_mask, cross_kv_mask=encoder_mask)
            if adapter is not None:
                y = apply_adapter(adapter, y, dtype)
            return y, (new_c.key, new_c.value,
                       y if output_hidden_states else 0)

        xs = (dec["layers"], cache.self_kv.key, cache.self_kv.value,
              cache.cross_k, cache.cross_v)
        if has_kv_scale:
            xs = xs + (cache.cross_k_scale, cache.cross_v_scale)
        if dec_adapters is not None:
            xs = xs + (dec_adapters,)
        unroll = _resolve_decode_unroll(b) if q_len == 1 else 1
        x, (new_k, new_v, per_layer) = jax.lax.scan(scan_body, x, xs,
                                                    unroll=unroll)
        new_cache = DecoderCache(
            self_kv=KVCache(key=new_k, value=new_v,
                            index=cache.self_kv.index + q_len),
            cross_k=cache.cross_k, cross_v=cache.cross_v,
            cross_k_scale=cache.cross_k_scale,
            cross_v_scale=cache.cross_v_scale)
    else:
        def block_fn(block, h, self_bias, cross_bias, enc_hidden,
                     self_kv_mask, rng):
            y, _ = _decoder_block(block, cfg, h, self_bias, cross_bias,
                                  enc_hidden, None, None, use_flash, dtype,
                                  self_kv_mask=self_kv_mask,
                                  self_causal=self_causal,
                                  dropout_rng=rng)
            return y

        if cfg.remat:
            block_fn = jax.checkpoint(block_fn)

        n_layers = jax.tree_util.tree_leaves(dec["layers"])[0].shape[0]
        xs = [dec["layers"]]
        if dec_adapters is not None:
            xs.append(dec_adapters)
        if k_layers is not None:
            xs.append(jax.random.split(k_layers, n_layers))

        def scan_body(h, scan_xs):
            block = scan_xs[0]
            adapter = scan_xs[1] if dec_adapters is not None else None
            rng = scan_xs[-1] if k_layers is not None else None
            y = block_fn(block, h, self_bias, cross_bias, enc_hidden,
                         self_kv_mask, rng)
            if adapter is not None:
                y = apply_adapter(adapter, y, dtype)
            return y, (y if output_hidden_states else 0)

        x, per_layer = jax.lax.scan(scan_body, x, tuple(xs))
        new_cache = None

    if cfg.arch == "t5":
        x = layers.rms_norm(dec["final_layer_norm"], x, cfg.layer_norm_eps)
        x = layers.dropout(x, cfg.dropout, k_final)

    # LM head
    if cfg.tie_word_embeddings:
        shared = params["shared"]
        h = x * (cfg.hidden_size ** -0.5) if cfg.arch == "t5" else x
        if "embedding_q" in shared:
            # int8 tied head (utils/quantize.py): the (V, H) table is the
            # dominant decode-step weight read; matmul on int8-cast weights,
            # per-row (= per output logit) scales applied in the epilogue
            logits = jnp.dot(h, shared["embedding_q"].T.astype(dtype),
                             preferred_element_type=jnp.float32)
            logits = logits * shared["embedding_scale"].astype(jnp.float32)
        else:
            w = shared["embedding"].astype(dtype)
            logits = jnp.dot(h, w.T, preferred_element_type=jnp.float32)
    else:
        logits = layers.dense(params["lm_head"], x, dtype).astype(jnp.float32)
    if cfg.arch == "bart":
        logits = logits + params["final_logits_bias"].astype(jnp.float32)

    out = {"logits": logits, "cache": new_cache}
    if output_hidden_states:
        # HF T5Stack's last hidden_states entry is POST
        # final_layer_norm+dropout (the BART path has no final norm, so
        # the last scan output already matches)
        stacked = jnp.concatenate([inputs_embeds[None], per_layer], axis=0)
        if cfg.arch == "t5":
            stacked = stacked.at[-1].set(x.astype(stacked.dtype))
        out["hidden_states"] = stacked
    return out


def seq2seq_apply(params, cfg: Seq2SeqConfig, input_ids=None,
                  inputs_embeds=None, attention_mask=None,
                  decoder_input_ids=None, decoder_mask=None, labels=None,
                  encoder_outputs=None, output_hidden_states=False,
                  use_flash=False, adapters=None, dtype=jnp.float32,
                  dropout_rng=None):
    """Full training/eval forward, mirroring the HF seq2seq forward the
    reference calls in cal_loss (model.py:132-137).

    Returns dict(loss?, logits, encoder_last_hidden_state,
    encoder_hidden_states?, decoder_hidden_states?).
    """
    k_enc, k_dec = layers.split_or_none(dropout_rng, 2)
    if decoder_input_ids is None and labels is not None:
        decoder_input_ids = shift_tokens_right(
            labels, cfg.pad_token_id, cfg.decoder_start_token_id)
    if encoder_outputs is None:
        encoder_outputs = encode(
            params, cfg, input_ids=input_ids, inputs_embeds=inputs_embeds,
            attention_mask=attention_mask,
            output_hidden_states=output_hidden_states, use_flash=use_flash,
            adapters=adapters, dtype=dtype, dropout_rng=k_enc)
    dec_out = decode(
        params, cfg, decoder_input_ids,
        enc_hidden=encoder_outputs["last_hidden_state"],
        encoder_mask=encoder_outputs["mask"], decoder_mask=decoder_mask,
        output_hidden_states=output_hidden_states, use_flash=use_flash,
        adapters=adapters, dtype=dtype, dropout_rng=k_dec)
    out = {
        "logits": dec_out["logits"],
        "encoder_last_hidden_state": encoder_outputs["last_hidden_state"],
        "encoder_mask": encoder_outputs["mask"],
    }
    if output_hidden_states:
        out["encoder_hidden_states"] = encoder_outputs["hidden_states"]
        out["decoder_hidden_states"] = dec_out["hidden_states"]
    if labels is not None:
        out["loss"] = layers.cross_entropy_with_ignore(dec_out["logits"],
                                                       labels)
    return out
