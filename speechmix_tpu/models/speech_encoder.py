"""wav2vec2-family speech encoder, TPU-native.

One graph covers all three reference encoder families — Wav2Vec2Model,
HubertModel, UniSpeechSatModel (picked by name substring at
hf_model.py:210-215) — since they share: a strided conv feature extractor
(16 kHz waveform -> ~50 Hz frames), feature projection, additive positional
conv embedding, and a transformer encoder.  Config switches
(`feat_extract_norm`, `do_stable_layer_norm`) capture the base/large variants.

TPU-first choices:
  * conv extractor runs in the compute dtype through lax.conv (XLA lowers the
    large-stride first layer to an im2col matmul on the MXU)
  * per-layer hidden states are stacked with lax.scan over layer params, so
    share_layer_ratio truncation (model.py:77-81) is a static slice of the
    stacked param pytree — one compiled layer body regardless of depth
  * explicit length masks everywhere (the reference attends padding —
    SURVEY.md §2.5.2)

Reference parity anchors: layer counts after truncation (test_model.py:18-25),
weighted-sum sizes L vs L+1 (test_model.py:35 / test_hf_model.py:43), frame
rates 16 kHz -> 50 Hz -> 50/down_scale Hz.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import SpeechEncoderConfig
from ..ops import layers
from ..ops.attention import attention, init_attention
from ..ops.masking import length_mask
from ..parallel import mesh as mesh_lib

# experiment toggle re-export (the barrier lives in ops.layers so the
# seq2seq blocks share it; experiments/ffn_ab.py flips it)
set_ffn_ln_barrier = layers.set_ffn_ln_barrier


# ----------------------------------------------------------------------------
# init
# ----------------------------------------------------------------------------

def init_speech_encoder(key, cfg: SpeechEncoderConfig):
    keys = jax.random.split(key, 8)
    params = {}

    # conv feature extractor
    conv_layers = []
    in_ch = 1
    ck = jax.random.split(keys[0], len(cfg.conv_dims))
    for i, (dim, kern) in enumerate(zip(cfg.conv_dims, cfg.conv_kernels)):
        layer = {"conv": layers.init_conv1d(ck[i], in_ch, dim, kern,
                                            use_bias=cfg.conv_bias)}
        if cfg.feat_extract_norm == "group" and i == 0:
            layer["norm"] = layers.init_group_norm(dim)
        elif cfg.feat_extract_norm == "layer":
            layer["norm"] = layers.init_layer_norm(dim)
        conv_layers.append(layer)
        in_ch = dim
    params["feature_extractor"] = {"layers": conv_layers}

    # feature projection: LN(feat) -> Linear(feat -> hidden)
    params["feature_projection"] = {
        "layer_norm": layers.init_layer_norm(cfg.feature_dim),
        "projection": layers.init_dense(keys[1], cfg.feature_dim,
                                        cfg.hidden_size),
    }

    # positional conv embedding (grouped conv over hidden)
    params["pos_conv"] = layers.init_conv1d(
        keys[2], cfg.hidden_size // cfg.pos_conv_groups, cfg.hidden_size,
        cfg.pos_conv_kernel, use_bias=True)

    params["encoder_layer_norm"] = layers.init_layer_norm(cfg.hidden_size)

    # SpecAugment replacement vector (HF Wav2Vec2Model.masked_spec_embed:
    # FloatTensor(hidden).uniform_()); used only when a dropout_rng is
    # threaded (training) and cfg.apply_spec_augment
    params["masked_spec_embed"] = jax.random.uniform(keys[4],
                                                     (cfg.hidden_size,))

    # transformer layers: stacked pytree for lax.scan
    def init_layer(k):
        k1, k2, k3 = jax.random.split(k, 3)
        h, d = cfg.hidden_size, cfg.hidden_size // cfg.num_heads
        return {
            "attention": init_attention(k1, h, h, cfg.num_heads, d),
            "attention_layer_norm": layers.init_layer_norm(h),
            "ffn_in": layers.init_dense(k2, h, cfg.ffn_dim),
            "ffn_out": layers.init_dense(k3, cfg.ffn_dim, h),
            "final_layer_norm": layers.init_layer_norm(h),
        }

    lkeys = jax.random.split(keys[3], cfg.num_layers)
    params["layers"] = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[init_layer(k) for k in lkeys])
    return params


def truncate_layers(params, num_keep: int):
    """share_layer_ratio: keep only the BOTTOM num_keep transformer layers
    (reference removes the top int(L*ratio), model.py:77-81).  Static slice of
    the stacked layer pytree."""
    out = dict(params)
    out["layers"] = jax.tree_util.tree_map(lambda x: x[:num_keep],
                                           params["layers"])
    return out


# ----------------------------------------------------------------------------
# apply
# ----------------------------------------------------------------------------

def extract_features(params, cfg: SpeechEncoderConfig, waveform,
                     lengths=None, dtype=jnp.float32):
    """(B, T_samples) -> (B, T_frames, feature_dim).

    `lengths` (valid sample counts) gates normalization statistics so a
    zero-padded batch computes exactly what the per-example forward would at
    every VALID position (the reference/HF leaks group-norm statistics across
    padding — SURVEY.md §2.5.2).

    No intermediate padding-zeroing is needed: VALID convolutions only read
    input positions < the valid input length when producing output positions
    < the valid output length (that is exactly the conv length formula), so
    padded-region garbage never contaminates valid frames.  Only (a) the
    group-norm statistics and (b) the caller's final frame mask must know the
    lengths — this keeps the extractor free of O(B*T*C) mask traffic."""
    # Extractor lowering, measured on TPU v5e (B=32, 16 s, bf16):
    #   "conv"    XLA NWC conv            62.6 ms
    #   "patches" strided unfold + concat 227.5 ms (HBM-bound; OOMs at B=128)
    #   "pairs"   row-merge reshapes + dense matmuls (layers._conv1d_pairs)
    #   "fused"   Pallas VMEM-unfold kernel for the stride-2 512ch layers
    #             (ops/pallas/conv_extractor.py); conv0 (+norm) stays XLA
    # "pairs" avoids the strided gathers that sank "patches" — see PERF.md.
    impl = cfg.extractor_impl
    if impl == "auto":
        impl = "conv"
    if impl == "fused" and not _fused_extractor_ok(cfg):
        impl = "conv"
    x = waveform.astype(dtype)[..., None]  # (B, T, 1)
    l = lengths
    t_expect = None
    if impl == "pairs":
        # the pairs formulation needs T >= s*(t+1) slack at every k>s layer;
        # pad the raw waveform once (cheap: (B, T, 1)) and slice the final
        # frames back to the unpadded count.  Padded samples only ever feed
        # output frames >= the unpadded frame count (VALID conv), so valid
        # frames are untouched; group-norm statistics are gated by `l`.
        t_expect = _conv_out_len(x.shape[1], cfg.conv_kernels,
                                 cfg.conv_strides)
        pad = _pairs_slack_pad(x.shape[1], cfg.conv_kernels, cfg.conv_strides)
        if pad:
            if l is None:
                l = jnp.full((x.shape[0],), x.shape[1], jnp.int32)
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    conv_layers = params["feature_extractor"]["layers"]
    xla_layers = (1 if impl == "fused" else len(conv_layers))
    for i, layer in enumerate(conv_layers[:xla_layers]):
        x = layers.conv1d(layer["conv"], x, cfg.conv_strides[i], dtype,
                          impl="conv" if impl == "fused" else impl)
        mask = None
        if l is not None:
            l = (l - cfg.conv_kernels[i]) // cfg.conv_strides[i] + 1
            if "norm" in layer and cfg.feat_extract_norm == "group" and i == 0:
                mask = length_mask(l, x.shape[1])
        if "norm" in layer:
            if cfg.feat_extract_norm == "group" and i == 0:
                x = layers.group_norm_per_channel(layer["norm"], x,
                                                  cfg.layer_norm_eps,
                                                  mask=mask)
            else:
                x = layers.layer_norm(layer["norm"], x, cfg.layer_norm_eps)
        x = jax.nn.gelu(x, approximate=False)
    if impl == "fused":
        from ..ops.pallas import conv_extractor as _fx
        if l is not None:
            for k, s in zip(cfg.conv_kernels[1:], cfg.conv_strides[1:]):
                l = (l - k) // s + 1
        x = _fx.fused_conv_stack_trainable(
            x, list(conv_layers[1:]),
            tuple(cfg.conv_kernels[1:]), tuple(cfg.conv_strides[1:]),
            cfg.feat_extract_norm == "layer", cfg.layer_norm_eps,
            jax.default_backend() != "tpu")
    if t_expect is not None and x.shape[1] != t_expect:
        x = x[:, :t_expect]
    return x


def _fused_extractor_ok(cfg: SpeechEncoderConfig) -> bool:
    """Geometry gate for the fused Pallas extractor: layers 1.. must be
    stride-2, k in {2, 3}, constant channel width (true of every wav2vec2
    preset; anything else falls back to the XLA conv)."""
    return (len(cfg.conv_dims) >= 2
            and all(s == 2 for s in cfg.conv_strides[1:])
            and all(k in (2, 3) for k in cfg.conv_kernels[1:])
            and len(set(cfg.conv_dims)) == 1)


def _conv_out_len(t, kernels, strides):
    for k, s in zip(kernels, strides):
        t = (t - k) // s + 1
    return t


@functools.lru_cache(maxsize=None)
def _pairs_slack_pad(t_samples, kernels, strides):
    """Smallest waveform pad giving every k>s layer the T >= s*(t+1) slack
    the pairs reshape needs (layers._conv1d_pairs)."""
    bound = 2 * math.prod(strides) + 1
    for pad in range(bound):
        t = t_samples + pad
        ok = True
        for k, s in zip(kernels, strides):
            t_out = (t - k) // s + 1
            if k > s and t < s * (t_out + 1):
                ok = False
                break
            t = t_out
        if ok:
            return pad
    raise ValueError("no pairs-compatible pad found")  # pragma: no cover


def compute_mask_spans(rng, batch, size, lengths, prob, mask_len, min_masks):
    """Jittable SpecAugment span sampler — exact HF semantics
    (modeling_wav2vec2._compute_mask_indices, distribution-pinned in
    tests/test_hf_parity.py):

      * ONE shared rounding epsilon ~ U(0,1) per call (HF draws
        np.random.rand(1) once for the whole batch)
      * per row with valid length L:
        num = floor(prob * L / mask_len + eps), then max(num, min_masks),
        then capped at size // mask_len and at max(L - (mask_len-1), 0)
        (HF's cap order)
      * span starts sampled uniformly WITHOUT replacement from
        [0, L - mask_len] — HF's np.random.choice(replace=False), realized
        statically as order statistics: the top-num positions of an i.i.d.
        uniform draw restricted to the valid range are exactly a uniform
        without-replacement sample

    HF's dummy-index padding quirk (a row whose num == 0 while another
    row's num > 0 marks frame size-1) is dropped: it can only hit padding
    frames, which are zeroed immediately after masking both here and in
    HF's encoder, so the model never sees the difference.

    Returns (B, size) bool, True = masked."""
    r_eps, r_starts = jax.random.split(rng)
    lengths = lengths.astype(jnp.int32)
    eps = jax.random.uniform(r_eps, ())
    num = jnp.floor(prob * lengths.astype(jnp.float32) / mask_len
                    + eps).astype(jnp.int32)
    num = jnp.maximum(num, min_masks)
    num = jnp.where(num * mask_len > size, size // mask_len, num)
    room = jnp.maximum(lengths - (mask_len - 1), 0)            # (B,)
    num = jnp.minimum(num, room)
    # static upper bound on spans per row (worst case: full-length row,
    # eps -> 1), with HF's caps applied at L = size
    s_max = max(int(prob * size / mask_len) + 1, min_masks)
    s_max = min(s_max, size // mask_len, max(size - (mask_len - 1), 0))
    if s_max <= 0:
        return jnp.zeros((batch, size), bool)
    u = jax.random.uniform(r_starts, (batch, size))
    valid = jnp.arange(size)[None, :] < room[:, None]          # starts
    _, starts = jax.lax.top_k(jnp.where(valid, u, -1.0), s_max)
    active = jnp.arange(s_max)[None, :] < num[:, None]         # (B, S)
    t = jnp.arange(size)[None, None, :]                        # (1, 1, T)
    span = ((t >= starts[..., None]) & (t < (starts + mask_len)[..., None])
            & active[..., None])                               # (B, S, T)
    return jnp.any(span, axis=1)


def compute_time_mask(rng, batch, t_frames, lengths, prob, mask_len,
                      min_masks):
    """SpecAugment time mask (True = replace with masked_spec_embed)."""
    return compute_mask_spans(rng, batch, t_frames, lengths, prob, mask_len,
                              min_masks)


def _encoder_layer(layer_params, x, kv_mask, cfg, use_flash, dtype,
                   dropout_rng=None):
    # dropout placements mirror HF Wav2Vec2EncoderLayer: attention probs
    # (attention_dropout), post-attention output (dropout), post-activation
    # (activation_dropout), post-FFN output (dropout)
    k_attn, k_h1, k_act, k_h2 = layers.split_or_none(dropout_rng, 4)
    # sequence-parallel: when tracing under seq_sharding (time axis sharded
    # over `seq`), self-attention runs as ring attention (ops/ring_attention)
    ring_mesh = mesh_lib.active_seq_mesh()

    def ffn(h):
        # fc1 -> act -> fc2, fused into one Pallas VMEM pass when eligible
        # (ops/layers.ffn_apply; the (B, T, ffn_dim) intermediate never
        # round-trips HBM)
        h = layers.ffn_apply(layer_params["ffn_in"], layer_params["ffn_out"],
                             h, cfg.activation, dtype, k_act,
                             cfg.activation_dropout)
        h = layers.dropout(h, cfg.dropout, k_h2)
        return layers.ffn_ln_barrier(h)

    if cfg.do_stable_layer_norm:
        # pre-LN (wav2vec2-large)
        h = layers.layer_norm(layer_params["attention_layer_norm"], x,
                              cfg.layer_norm_eps)
        attn, _ = attention(layer_params["attention"], h, kv_mask=kv_mask,
                            num_heads=cfg.num_heads, use_flash=use_flash,
                            dtype=dtype, dropout_rate=cfg.attention_dropout,
                            dropout_rng=k_attn, ring_mesh=ring_mesh)
        x = x + layers.dropout(attn, cfg.dropout, k_h1)
        h = layers.layer_norm(layer_params["final_layer_norm"], x,
                              cfg.layer_norm_eps)
        x = x + ffn(h)
    else:
        # post-LN (wav2vec2-base); out-projection + residual + LN fused into
        # one VMEM pass when eligible (layers.dense_residual_ln_apply)
        attn, _ = attention(layer_params["attention"], x, kv_mask=kv_mask,
                            num_heads=cfg.num_heads, use_flash=use_flash,
                            dtype=dtype, dropout_rate=cfg.attention_dropout,
                            dropout_rng=k_attn, ring_mesh=ring_mesh,
                            out_proj=False)
        x = layers.dense_residual_ln_apply(
            layer_params["attention"]["out_proj"],
            layer_params["attention_layer_norm"], attn, x, dtype,
            k_h1, cfg.dropout, cfg.layer_norm_eps)
        # residual + final LN fused into the FFN kernel flush when eligible
        x = layers.ffn_residual_ln_apply(
            layer_params["ffn_in"], layer_params["ffn_out"],
            layer_params["final_layer_norm"], x, cfg.activation, dtype,
            k_act, cfg.activation_dropout, k_h2, cfg.dropout,
            cfg.layer_norm_eps)
    return x


def speech_encoder_apply(params, cfg: SpeechEncoderConfig, waveform,
                         lengths=None, output_hidden_states=False,
                         use_flash=False, dtype=jnp.float32,
                         dropout_rng=None):
    """Run the speech encoder.

    waveform: (B, T_samples) float (zero-padded).
    lengths: (B,) int sample counts; None means full length.
    dropout_rng: training-mode dropout key (HF placements: feature-projection,
      post-positional-embedding, and per-layer sites); None = deterministic.
    Returns dict with:
      last_hidden_state: (B, T_frames, H)
      hidden_states: (L+1, B, T_frames, H) if requested (embedding output
        first — the HF convention hf_model.py:413-417)
      frame_lengths: (B,) valid frame counts
      frame_mask: (B, T_frames) bool
    """
    b, t_samples = waveform.shape
    if lengths is None:
        lengths = jnp.full((b,), t_samples, jnp.int32)

    feats = extract_features(params, cfg, waveform, lengths, dtype)
    frame_lengths = cfg.feature_lengths(lengths)
    t_frames = feats.shape[1]
    frame_mask = length_mask(frame_lengths, t_frames)

    # sequence-parallel annotation point: frames shard their time axis here
    # (identity unless tracing under parallel.mesh.seq_sharding)
    feats = mesh_lib.constrain_time_sharded(feats)
    frame_mask = mesh_lib.constrain_time_sharded(frame_mask)

    k_proj, k_pos, k_layers, k_spec = layers.split_or_none(dropout_rng, 4)

    # feature projection
    fp = params["feature_projection"]
    h = layers.layer_norm(fp["layer_norm"], feats, cfg.layer_norm_eps)
    h = layers.dense(fp["projection"], h, dtype)
    h = layers.dropout(h, cfg.feat_proj_dropout, k_proj)

    # SpecAugment time masking (training only — HF applies it between the
    # feature projection and the positional conv, Wav2Vec2Model
    # _mask_hidden_states; reference checkpoints train with
    # apply_spec_augment=True).  Older checkpoints may lack
    # masked_spec_embed; skip silently then (inference is never affected).
    if k_spec is not None and cfg.apply_spec_augment:
        k_time, k_feat = jax.random.split(k_spec)
        if cfg.mask_time_prob > 0 and "masked_spec_embed" in params:
            tmask = compute_time_mask(k_time, b, t_frames, frame_lengths,
                                      cfg.mask_time_prob,
                                      cfg.mask_time_length,
                                      cfg.mask_time_min_masks)
            h = jnp.where(tmask[..., None],
                          params["masked_spec_embed"].astype(h.dtype), h)
        if cfg.mask_feature_prob > 0:
            # HF feature masking: sample spans over the CHANNEL axis (no
            # attention mask — every row uses the full hidden size), zero
            # the masked channels across all frames
            hdim = h.shape[-1]
            fmask = compute_mask_spans(
                k_feat, b, hdim, jnp.full((b,), hdim, jnp.int32),
                cfg.mask_feature_prob, cfg.mask_feature_length,
                cfg.mask_feature_min_masks)
            h = jnp.where(fmask[:, None, :], jnp.zeros((), h.dtype), h)

    # zero out padded frames before the pos-conv so padding can't leak in
    h = h * frame_mask[..., None].astype(h.dtype)

    # positional conv embedding
    pos = layers.conv1d_same_grouped(params["pos_conv"], h,
                                     cfg.pos_conv_groups, dtype)
    pos = jax.nn.gelu(pos, approximate=False)
    h = h + pos
    if not cfg.do_stable_layer_norm:
        h = layers.layer_norm(params["encoder_layer_norm"], h,
                              cfg.layer_norm_eps)
    h = layers.dropout(h, cfg.dropout, k_pos)

    embed_output = h

    layer_fn = _encoder_layer
    if cfg.remat:
        layer_fn = jax.checkpoint(_encoder_layer,
                                  static_argnums=(3, 4, 5))

    n_layers = jax.tree_util.tree_leaves(params["layers"])[0].shape[0]
    if k_layers is not None:
        k_layers, k_drop = jax.random.split(k_layers)
        layer_rngs = jax.random.split(k_layers, n_layers)
        # LayerDrop (HF Wav2Vec2Encoder: skip_the_layer = training and
        # rand() < layerdrop).  A select keeps the graph static; the
        # skipped layer's output is discarded, matching HF's semantics of
        # passing hidden_states through unchanged.
        drop_u = jax.random.uniform(k_drop, (n_layers,))

        def scan_body(x, xs):
            layer_params, rng, u = xs
            y = layer_fn(layer_params, x, frame_mask, cfg, use_flash, dtype,
                         rng)
            if cfg.layerdrop > 0:
                y = jnp.where(u < cfg.layerdrop, x, y)
            y = mesh_lib.constrain_time_sharded(y)
            return y, (y if output_hidden_states else 0)

        h, per_layer = jax.lax.scan(scan_body, h,
                                    (params["layers"], layer_rngs, drop_u))
    else:
        def scan_body(x, layer_params):
            y = layer_fn(layer_params, x, frame_mask, cfg, use_flash, dtype)
            y = mesh_lib.constrain_time_sharded(y)
            return y, (y if output_hidden_states else 0)

        h, per_layer = jax.lax.scan(scan_body, h, params["layers"])

    if cfg.do_stable_layer_norm:
        h = layers.layer_norm(params["encoder_layer_norm"], h,
                              cfg.layer_norm_eps)

    out = {
        "last_hidden_state": h,
        "frame_lengths": frame_lengths,
        "frame_mask": frame_mask,
    }
    if output_hidden_states:
        stacked = jnp.concatenate(
            [embed_output[None], per_layer], axis=0)  # (L+1, B, T, H)
        if cfg.do_stable_layer_norm:
            # HF Wav2Vec2EncoderStableLayerNorm appends the POST-final-LN
            # state as the last hidden_states entry (modeling_wav2vec2,
            # `hidden_states = self.layer_norm(...)` before the append) —
            # the weighted-sum path must see the same convention
            stacked = stacked.at[-1].set(h.astype(stacked.dtype))
        out["hidden_states"] = stacked
    return out
