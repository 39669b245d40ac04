"""Core neural-net ops, pure functional (params = nested dicts of jnp arrays).

Design notes (TPU-first):
  * Every matmul keeps a (..., features) layout and is expressed with
    jnp.einsum / jnp.dot so XLA tiles it onto the MXU.
  * Compute dtype is a caller choice (bf16 on TPU); params stay fp32 and are
    cast at use sites.  Softmax/normalization statistics are computed in fp32.
  * No module objects: `init_*` returns a param dict, `*_apply`-style functions
    are pure.  This keeps pjit/shard_map trivial (params are just a pytree).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


# ----------------------------------------------------------------------------
# initializers
# ----------------------------------------------------------------------------

def normal_init(key, shape, stddev=0.02, dtype=jnp.float32):
    return (jax.random.normal(key, shape) * stddev).astype(dtype)


# ----------------------------------------------------------------------------
# dense / embedding
# ----------------------------------------------------------------------------

def init_dense(key, in_dim, out_dim, use_bias=True, stddev=0.02):
    kw, _ = jax.random.split(key)
    p = {"kernel": normal_init(kw, (in_dim, out_dim), stddev)}
    if use_bias:
        p["bias"] = jnp.zeros((out_dim,), jnp.float32)
    return p


# Trace-time switch: with int8 weights present, ALSO quantize activations
# per-token and run the matmul int8 x int8 -> int32 on the MXU (2x the bf16
# MAC rate) instead of dequantize-then-bf16.  Serving-only knob (adds
# activation rounding error ~1e-2 relative; see test_int8_dense_compute).
INT8_DENSE_COMPUTE = False


def set_int8_dense_compute(enabled: bool):
    """TRACE-TIME switch — set before the first jit of the serving fns."""
    global INT8_DENSE_COMPUTE
    INT8_DENSE_COMPUTE = bool(enabled)


def dense(params, x, dtype=None):
    dtype = dtype or x.dtype
    if "kernel_q" in params:
        wq, sw = params["kernel_q"], params["kernel_scale"]
        if INT8_DENSE_COMPUTE and wq.ndim == 2:
            # dynamic per-token activation scales; int8 x int8 -> int32 MXU
            # matmul; exact rescale in the epilogue
            xf = x.astype(jnp.float32)
            sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                             1e-8) / 127.0
            xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = (acc.astype(jnp.float32) * sx *
                 sw.astype(jnp.float32)).astype(dtype)
            if "bias" in params:
                y = y + params["bias"].astype(dtype)
            return y
        # int8 weight-only quantization (utils/quantize.py): dequantize
        # per-output-channel on the fly; XLA fuses the scale multiply into
        # the matmul epilogue, and weight HBM traffic drops 4x vs fp32 —
        # the win for memory-bound decode steps
        w = wq.astype(dtype) * params["kernel_scale"].astype(dtype)
    else:
        w = params["kernel"].astype(dtype)
    y = jnp.dot(x, w, preferred_element_type=dtype)
    if "bias" in params:
        y = y + params["bias"].astype(dtype)
    return y


def init_embedding(key, vocab, dim, stddev=0.02):
    return {"embedding": normal_init(key, (vocab, dim), stddev)}


def embed(params, ids, dtype=jnp.float32):
    if "embedding_q" in params:
        # int8 tied-embedding table (utils/quantize.py): gather rows then
        # dequantize per row — only the looked-up rows leave HBM
        rows = params["embedding_q"][ids].astype(dtype)
        return rows * params["embedding_scale"][ids].astype(dtype)[..., None]
    return params["embedding"].astype(dtype)[ids]


# ----------------------------------------------------------------------------
# normalization (statistics in fp32 for stability)
# ----------------------------------------------------------------------------

def init_layer_norm(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(params, x, eps=1e-5):
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.square(xf - mean).mean(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * params["scale"] + params["bias"]).astype(dtype)


def init_rms_norm(dim):
    return {"scale": jnp.ones((dim,), jnp.float32)}


def rms_norm(params, x, eps=1e-6):
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.square(xf).mean(-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * params["scale"]).astype(dtype)


def init_group_norm(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def group_norm_per_channel(params, x, eps=1e-5, mask=None):
    """GroupNorm with num_groups == num_channels (instance norm per channel),
    as used after wav2vec2-base's first conv layer.  x: (B, T, C) — normalize
    over T per (batch, channel).

    mask: optional (B, T) bool; statistics are computed over valid frames
    only.  HF wav2vec2 computes group-norm stats over padded frames too, which
    is why upstream disables attention masks for group-norm checkpoints; the
    masked statistics make padded batches exactly consistent.

    HBM-friendly: statistics use fp32 sum-reductions over the (large) bf16
    input without materializing an fp32 copy; var = E[x^2] - E[x]^2 (fine for
    O(1)-scale conv features)."""
    dtype = x.dtype
    if mask is None:
        n = jnp.float32(x.shape[1])
        s1 = jnp.sum(x, axis=1, keepdims=True, dtype=jnp.float32)
        s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=1,
                     keepdims=True)
    else:
        m = mask[..., None]
        n = jnp.maximum(
            jnp.sum(m, axis=1, keepdims=True, dtype=jnp.float32), 1.0)
        xm = jnp.where(m, x, 0)
        s1 = jnp.sum(xm, axis=1, keepdims=True, dtype=jnp.float32)
        s2 = jnp.sum(jnp.square(xm.astype(jnp.float32)), axis=1,
                     keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    scale = (jax.lax.rsqrt(var + eps) *
             params["scale"].astype(jnp.float32))
    shift = params["bias"].astype(jnp.float32) - mean * scale
    return (x.astype(jnp.float32) * scale + shift).astype(dtype)


# ----------------------------------------------------------------------------
# activations
# ----------------------------------------------------------------------------

ACTIVATIONS = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
}


def activation(name: str):
    return ACTIVATIONS[name]


def dropout(x, rate, rng):
    """Inverted dropout at the HF placements (the reference trains with the
    backbones' default ~0.1 rates, hf_model.py:216-219 config load).
    Identity when rng is None (eval / deterministic) or rate == 0."""
    if rng is None or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


# experiment toggle (experiments/ffn_ab.py): barrier between a transformer
# block's FFN output and the residual+LayerNorm so XLA can't fuse the LN
# epilogue into the fc2 gemm (profiled at ~112 TFLOP/s vs ~192 for bare
# gemms — PERF.md round-3 encoder roofline).  Numerics-identical; default
# off pending TPU A/B.
_FFN_LN_BARRIER = False


def set_ffn_ln_barrier(on: bool):
    global _FFN_LN_BARRIER
    _FFN_LN_BARRIER = bool(on)


def ffn_ln_barrier(h):
    """Identity, or an optimization barrier when the experiment toggle is
    on (keeps the residual+LN epilogue out of the fc2 gemm fusion)."""
    return jax.lax.optimization_barrier(h) if _FFN_LN_BARRIER else h


def split_or_none(rng, n):
    """jax.random.split that passes None through (no-dropout path)."""
    if rng is None:
        return (None,) * n
    return jax.random.split(rng, n)


# ----------------------------------------------------------------------------
# fused FFN (fc1 -> activation -> fc2) dispatch
# ----------------------------------------------------------------------------

# None = auto (Pallas kernel on TPU when eligible), False = always XLA,
# True = kernel wherever eligible (incl. CPU interpret in tests).
_FFN_FUSED = None
_FFN_FUSED_MIN_ROWS = 1024  # cached decode steps (rows == B) stay on XLA


def set_ffn_fused(mode):
    """TRACE-TIME switch for the fused FFN kernel (None/auto, True, False)."""
    global _FFN_FUSED
    _FFN_FUSED = mode


# in-kernel PRNG dropout for the fused FFN/epilogue kernels (round 4) —
# independent toggle so it can be A/B'd against the XLA dropout chain
# (experiments/ffn_dropout_ab.py)
_FFN_DROPOUT_FUSED = True


def set_ffn_dropout_fused(on: bool):
    global _FFN_DROPOUT_FUSED
    _FFN_DROPOUT_FUSED = bool(on)


def set_ffn_bwd_fused(on: bool):
    """Switch the fused-FFN trainable backward between the hand-derived
    XLA recompute formulas (default, round 5) and the Pallas dgrad/wgrad
    kernels (ffn_kernel.ffn_fused_bwd) — A/B toggle for
    experiments/ffn_bwd_ab.py.  The round-4 jax.vjp backward stays
    reachable via ffn_kernel.set_ffn_bwd_impl("vjp")."""
    from .pallas import ffn_kernel as fk
    fk.set_ffn_bwd_impl("pallas" if on else "hand")


def _dropout_seed(rng):
    """Derive the kernels' int32 stream seed from a site rng key (same
    scheme as the flash-attention dropout dispatch, ops/attention.py)."""
    return jax.random.randint(rng, (), 0, 2**31 - 1)


def _ffn_fused_eligible(p1, p2, x, act_name, act_rng, act_dropout):
    if _FFN_FUSED is False:
        return False
    if _FFN_FUSED is None and jax.default_backend() != "tpu":
        return False
    if act_rng is not None and act_dropout > 0.0 and not _FFN_DROPOUT_FUSED:
        return False  # in-kernel dropout disabled (A/B toggle); XLA path
    if "kernel" not in p1 or "kernel" not in p2:
        return False  # int8-quantized weights keep the XLA dequant fusion
    if act_name not in ("gelu", "gelu_new", "relu", "silu"):
        return False
    h, f = p1["kernel"].shape
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    if rows < _FFN_FUSED_MIN_ROWS or h % 128 or f % 128:
        return False
    # XLA cannot partition a pallas_call over a sharded time axis; under
    # sequence parallelism the XLA chain stays (same rule as flash
    # attention -> ring attention, ops/attention.py).  Same for tensor
    # parallelism: fc1/fc2 are sharded over the ffn (contracted) dim
    # (mesh._param_spec_for), which GSPMD cannot partition through the
    # custom call — the XLA chain keeps the TP split.
    from ..parallel import mesh as mesh_lib
    if mesh_lib.active_seq_mesh() is not None or \
            mesh_lib.active_tp_mesh() is not None:
        return False
    return True


def _ffn_block_f(f):
    """Largest 128-multiple divisor of f that is <= 1536 (VMEM budget for
    the (H, bf) + (bf, H) weight chunks plus the (rows, bf) intermediate)."""
    for bf in range(min(f, 1536), 0, -128):
        if f % bf == 0:
            return bf
    return f


_FFN_BLOCK_ROWS = 256  # measured optimum (PERF.md FFN kernel table)


def _ffn_fused_call(kernel_fn, p1, p2, x, dtype, extra_args=()):
    """Shared fused-FFN call plumbing: flatten lead dims, pad rows to the
    block size, default absent biases to inline zeros (the trainable VJPs
    differentiate every operand; a grad w.r.t. a constant is dropped), run
    the kernel, un-pad and restore the lead dims.  `extra_args` is appended
    after (x2, w1, b1, w2, b2) — the res/LN operands of the epilogue
    kernel receive x2 via a callable."""
    lead = x.shape[:-1]
    h = x.shape[-1]
    rows = 1
    for d in lead:
        rows *= d
    f_dim, h_out = p1["kernel"].shape[1], p2["kernel"].shape[1]
    b1 = p1.get("bias")
    b1 = jnp.zeros((f_dim,), jnp.float32) if b1 is None else b1
    b2 = p2.get("bias")
    b2 = jnp.zeros((h_out,), jnp.float32) if b2 is None else b2
    pad = (-rows) % _FFN_BLOCK_ROWS
    x2 = x.astype(dtype).reshape(rows, h)
    if pad:
        x2 = jnp.concatenate([x2, jnp.zeros((pad, h), x2.dtype)], axis=0)
    extras = tuple(a(x2) if callable(a) else a for a in extra_args)
    y = kernel_fn(x2, p1["kernel"], b1, p2["kernel"], b2, *extras,
                  _FFN_BLOCK_ROWS, _ffn_block_f(f_dim),
                  jax.default_backend() != "tpu")  # interpret off-TPU
    if pad:
        y = y[:rows]
    return y.reshape(*lead, h_out)


def ffn_apply(p1, p2, x, act_name, dtype, act_rng=None, act_dropout=0.0):
    """Transformer FFN block: act(x @ W1 + b1) @ W2 + b2 with dropout after
    the activation.  Dispatches to the fused Pallas kernel
    (ops/pallas/ffn_kernel.py: both gemms + activation in one VMEM pass, the
    (rows, ffn_dim) intermediate never reaches HBM) when eligible; the XLA
    chain is the fallback and the numerics reference."""
    if _ffn_fused_eligible(p1, p2, x, act_name, act_rng, act_dropout):
        if act_rng is not None and act_dropout > 0.0:
            # in-kernel PRNG activation dropout (TPU; XLA-mask fallback
            # inside the op elsewhere) — the fidelity recipe keeps the
            # fused kernel (ops/pallas/ffn_kernel.py round-4 section)
            from .pallas.ffn_kernel import ffn_dropout_trainable
            seed = _dropout_seed(act_rng)
            return _ffn_fused_call(
                lambda x2, w1, b1, w2, b2, br, bf, interp:
                    ffn_dropout_trainable(x2, w1, b1, w2, b2, seed,
                                          act_name, float(act_dropout),
                                          br, bf),
                p1, p2, x, dtype)
        from .pallas.ffn_kernel import ffn_fused_trainable
        return _ffn_fused_call(
            lambda x2, w1, b1, w2, b2, br, bf, interp: ffn_fused_trainable(
                x2, w1, b1, w2, b2, act_name, br, bf, interp),
            p1, p2, x, dtype)
    h = activation(act_name)(dense(p1, x, dtype))
    h = dropout(h, act_dropout, act_rng)
    return dense(p2, h, dtype)


# post-LN epilogue fusion toggle (independent of _FFN_FUSED so the two can
# be A/B'd separately: experiments/ffn_fused_ab.py --epilogue)
_FFN_FUSED_EPILOGUE = True


def set_ffn_fused_epilogue(on: bool):
    global _FFN_FUSED_EPILOGUE
    _FFN_FUSED_EPILOGUE = bool(on)


def ffn_residual_ln_apply(p1, p2, p_ln, x, act_name, dtype, act_rng=None,
                          act_dropout=0.0, out_rng=None, out_dropout=0.0,
                          eps=1e-5):
    """Post-LN transformer FFN block:
    ``LayerNorm(x + dropout(act(x @ W1 + b1) @ W2 + b2))`` — BART
    encoder/decoder blocks and the wav2vec2-base encoder layer.  Fuses the
    residual add + LayerNorm into the FFN kernel's flush (the measured
    ~112 TFLOP/s fc2+LN seam; the optimization-barrier A/B proved
    rescheduling XLA can't close it) when eligible; with a live post-FFN
    dropout rng, or when the kernel is ineligible, falls back to
    ffn_apply + the XLA residual+LN chain (the numerics reference)."""
    act_live = act_rng is not None and act_dropout > 0.0
    out_live = out_rng is not None and out_dropout > 0.0
    if (_FFN_FUSED_EPILOGUE and
            (not out_live or _FFN_DROPOUT_FUSED) and
            _ffn_fused_eligible(p1, p2, x, act_name, act_rng, act_dropout)):
        if act_live or out_live:
            # both HF dropout sites in-kernel (PRNG mask; round-4 section
            # of ops/pallas/ffn_kernel.py) — one seed, per-site streams
            from .pallas.ffn_kernel import ffn_dropout_res_ln_trainable
            seed = _dropout_seed(act_rng if act_live else out_rng)
            return _ffn_fused_call(
                lambda x2, w1, b1, w2, b2, res, br, bf, interp:
                    ffn_dropout_res_ln_trainable(
                        x2, w1, b1, w2, b2, res, p_ln["scale"],
                        p_ln["bias"], seed, act_name,
                        float(act_dropout) if act_live else 0.0,
                        float(out_dropout) if out_live else 0.0,
                        eps, br, bf),
                p1, p2, x, dtype,
                extra_args=(lambda x2: x2,))
        from .pallas.ffn_kernel import ffn_res_ln_trainable
        return _ffn_fused_call(
            lambda x2, w1, b1, w2, b2, res, br, bf, interp:
                ffn_res_ln_trainable(x2, w1, b1, w2, b2, res,
                                     p_ln["scale"], p_ln["bias"], act_name,
                                     eps, br, bf, interp),
            p1, p2, x, dtype,
            extra_args=(lambda x2: x2,))  # residual = the padded FFN input
    f = ffn_apply(p1, p2, x, act_name, dtype, act_rng, act_dropout)
    f = dropout(f, out_dropout, out_rng)
    return layer_norm(p_ln, x + ffn_ln_barrier(f), eps)


# attention-epilogue fusion toggle, independent of the FFN toggles so it can
# be A/B'd alone (experiments/attn_epilogue_ab.py)
_ATTN_FUSED_EPILOGUE = True


def set_attn_fused_epilogue(on: bool):
    global _ATTN_FUSED_EPILOGUE
    _ATTN_FUSED_EPILOGUE = bool(on)


def _dense_fused_eligible(p, x):
    """Eligibility for the single-gemm epilogue kernel (attention out-proj):
    same gates as the FFN kernel minus the activation — TPU (or forced),
    unquantized weight, 128-aligned dims, >= min rows, no SP/TP trace."""
    if _FFN_FUSED is False:
        return False
    if _FFN_FUSED is None and jax.default_backend() != "tpu":
        return False
    if "kernel" not in p:
        return False
    din, h = p["kernel"].shape
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    if rows < _FFN_FUSED_MIN_ROWS or din % 128 or h % 128:
        return False
    from ..parallel import mesh as mesh_lib
    if mesh_lib.active_seq_mesh() is not None or \
            mesh_lib.active_tp_mesh() is not None:
        return False
    return True


def dense_residual_ln_apply(p, p_ln, x, res, dtype, out_rng=None,
                            out_dropout=0.0, eps=1e-5):
    """Post-LN attention epilogue: ``LayerNorm(res + dropout(x @ W + b))``
    where x is the concatenated attention-heads output and W the
    out-projection.  Fuses gemm + residual + LayerNorm into one VMEM pass
    (ops/pallas/ffn_kernel.dense_res_ln) when eligible — the same
    deoptimized fc+LN gemm seam the FFN epilogue kernel closes (PERF.md
    round-4 table).  With a live dropout rng, or when ineligible (cached
    decode steps: rows == B), the XLA chain is the numerics reference."""
    out_live = out_rng is not None and out_dropout > 0.0
    if (_ATTN_FUSED_EPILOGUE and (not out_live or _FFN_DROPOUT_FUSED)
            and _dense_fused_eligible(p, x)):
        from .pallas.ffn_kernel import (dense_dropout_res_ln_trainable,
                                        dense_res_ln_trainable)
        lead = x.shape[:-1]
        din = x.shape[-1]
        h = p["kernel"].shape[1]
        rows = 1
        for d in lead:
            rows *= d
        b = p.get("bias")
        b = jnp.zeros((h,), jnp.float32) if b is None else b
        pad = (-rows) % _FFN_BLOCK_ROWS
        x2 = x.astype(dtype).reshape(rows, din)
        r2 = res.astype(dtype).reshape(rows, h)
        if pad:
            x2 = jnp.concatenate([x2, jnp.zeros((pad, din), x2.dtype)],
                                 axis=0)
            r2 = jnp.concatenate([r2, jnp.zeros((pad, h), r2.dtype)],
                                 axis=0)
        if out_live:
            # out-projection dropout in-kernel (PRNG mask; round-4 section
            # of ops/pallas/ffn_kernel.py)
            y = dense_dropout_res_ln_trainable(
                x2, p["kernel"], b, r2, p_ln["scale"], p_ln["bias"],
                _dropout_seed(out_rng), float(out_dropout), eps,
                _FFN_BLOCK_ROWS)
        else:
            y = dense_res_ln_trainable(x2, p["kernel"], b, r2, p_ln["scale"],
                                       p_ln["bias"], eps, _FFN_BLOCK_ROWS,
                                       jax.default_backend() != "tpu")
        if pad:
            y = y[:rows]
        return y.reshape(*lead, h)
    a = dropout(dense(p, x, dtype), out_dropout, out_rng)
    return layer_norm(p_ln, res + a, eps)


# ----------------------------------------------------------------------------
# strided conv1d as patch-matmul (MXU-friendly)
# ----------------------------------------------------------------------------

def init_conv1d(key, in_ch, out_ch, kernel, use_bias=True):
    # kernel layout: (kernel, in_ch, out_ch) — flattened to a
    # (kernel*in_ch, out_ch) matmul at apply time.
    std = math.sqrt(1.0 / (in_ch * kernel))  # torch Conv1d default U(-s,s) std-ish
    p = {"kernel": normal_init(key, (kernel, in_ch, out_ch), std)}
    if use_bias:
        p["bias"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def conv1d(params, x, stride, dtype=None, impl="conv"):
    """x: (B, T, C_in) -> (B, T_out, C_out), VALID padding.

    impl="conv": lax.conv_general_dilated in (B, T, C) layout (the default:
      measured 3.6x faster than "patches" on TPU v5e at extractor shapes,
      PERF.md).
    impl="patches": explicit strided-slice unfold + one (k*Cin, Cout) matmul.
      Wider MXU contraction, but materializing the k strided slices + concat
      is HBM-bandwidth-bound and loses at wav2vec2 shapes; opt-in only.
    impl="pairs": row-merging-reshape formulation for k <= 2*stride (true of
      every wav2vec2 extractor layer).  (B, s*t, C) -> (B, t, s*C) merges
      adjacent rows WITHOUT the strided gathers of "patches" (row-major
      layout-compatible), so the conv becomes at most two dense matmuls with
      contraction s*C: taps [0, s) against W[:s], taps [s, 2s) against W[s:]
      zero-padded.  Needs input slack: T >= s*(t+1) when k > s (the caller
      pads the waveform once; see speech_encoder.extract_features).
    """
    dtype = dtype or x.dtype
    kernel = params["kernel"].astype(dtype)  # (K, Cin, Cout)
    if impl == "patches":
        y = _conv1d_patches(kernel, x.astype(dtype), stride, dtype)
    elif impl == "pairs":
        y = _conv1d_pairs(kernel, x.astype(dtype), stride, dtype)
    elif impl == "taps":
        y = _conv1d_taps(kernel, x.astype(dtype), stride, dtype)
    else:
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel,
            window_strides=(stride,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=dtype,
        )
    if "bias" in params:
        y = y + params["bias"].astype(dtype)
    return y


def _conv1d_taps(kernel, x, stride, dtype):
    """VALID strided conv as k accumulated gemms over per-tap strided-slice
    views: y = sum_j x[:, j::stride, :][:t] @ W[j].

    Unlike "patches" there is NO concat (the k unfold copies were the HBM
    killer) and unlike "pairs" there is NO row-merge reshape (the relayout
    copies were its loss) — each tap is one (B*t, Cin)x(Cin, Cout) gemm at
    the MXU's preferred contraction width, and XLA fuses the adds into the
    gemm epilogues.  Exact conv FLOP count."""
    k, cin, cout = kernel.shape
    b, t_in, _ = x.shape
    t = (t_in - k) // stride + 1
    y = None
    for j in range(k):
        xs = jax.lax.slice(x, (0, j, 0), (b, j + (t - 1) * stride + 1, cin),
                           (1, stride, 1))
        yj = jnp.dot(xs, kernel[j], preferred_element_type=dtype)
        y = yj if y is None else y + yj
    return y


def _conv1d_pairs(kernel, x, stride, dtype):
    """VALID strided conv via row-merging reshapes; requires k <= 2*stride.

    Output row t covers input rows [s*t, s*t+k).  Split the window at the
    row-group boundary: rows [s*t, s*t+s) hit weights W[:s], rows
    [s*t+s, s*t+2s) hit W[s:] (zero-padded to s taps).  Each group is a
    contiguous reshape (B, s*t', C) -> (B, t', s*C) — layout-preserving in
    row-major, no gather/concat traffic — followed by one dense matmul.
    """
    k, cin, cout = kernel.shape
    s = stride
    if k > 2 * s:
        raise ValueError(f"pairs impl needs k<=2*stride, got k={k} s={s}")
    b, t_in, _ = x.shape
    t = (t_in - k) // s + 1
    ka = min(k, s)
    wa = kernel[:ka].reshape(ka * cin, cout)
    if ka < s:  # k < s: pad the head weights to a full row group
        wa = jnp.concatenate(
            [wa, jnp.zeros(((s - ka) * cin, cout), dtype)], axis=0)
    r0 = x[:, :s * t].reshape(b, t, s * cin)
    y = jnp.dot(r0, wa, preferred_element_type=dtype)
    if k > s:
        if t_in < s * (t + 1):
            raise ValueError(
                f"pairs impl needs input slack T>=s*(t+1) when k>s "
                f"(T={t_in}, s={s}, t={t}); pad the input first")
        wb = kernel[s:].reshape((k - s) * cin, cout)
        if k < 2 * s:
            wb = jnp.concatenate(
                [wb, jnp.zeros(((2 * s - k) * cin, cout), dtype)], axis=0)
        r1 = x[:, s:s * (t + 1)].reshape(b, t, s * cin)
        y = y + jnp.dot(r1, wb, preferred_element_type=dtype)
    return y


def _conv1d_patches(kernel, x, stride, dtype):
    """VALID strided conv as unfold + matmul.  kernel: (K, Cin, Cout)."""
    k, cin, cout = kernel.shape
    b, t, _ = x.shape
    t_out = (t - k) // stride + 1
    cols = []
    for j in range(k):
        limit = j + (t_out - 1) * stride + 1
        cols.append(jax.lax.slice(x, (0, j, 0), (b, limit, cin),
                                  (1, stride, 1)))
    patches = jnp.concatenate(cols, axis=-1)  # (B, t_out, K*Cin)
    # kernel (K, Cin, Cout) -> (K*Cin, Cout), matching concat-over-j order
    w = kernel.reshape(k * cin, cout)
    return jnp.dot(patches, w, preferred_element_type=dtype)


def conv1d_same_grouped(params, x, groups, dtype=None):
    """Grouped SAME-ish conv used by the wav2vec2 positional conv embedding.
    x: (B, T, C). HF pads both sides with kernel//2 then removes one trailing
    element when kernel is even."""
    dtype = dtype or x.dtype
    kernel = params["kernel"].astype(dtype)  # (K, Cin/groups, Cout)
    k = kernel.shape[0]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel,
        window_strides=(1,), padding=((pad, pad),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=dtype,
    )
    if "bias" in params:
        y = y + params["bias"].astype(dtype)
    if k % 2 == 0:
        y = y[:, :-1, :]
    return y


# ----------------------------------------------------------------------------
# losses
# ----------------------------------------------------------------------------

def cross_entropy_with_ignore(logits, labels, ignore_index=-100):
    """Mean token CE over positions where labels != ignore_index, matching
    torch.nn.CrossEntropyLoss(ignore_index=-100) semantics the reference's
    decoder loss uses.  logits: (..., V), labels: (...) int."""
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logits_f = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits_f, axis=-1)
    gold = jnp.take_along_axis(logits_f, safe_labels[..., None],
                               axis=-1).squeeze(-1)
    nll = (logz - gold) * valid.astype(jnp.float32)
    return nll.sum() / jnp.maximum(valid.sum().astype(jnp.float32), 1.0)


def kld_batchmean(student_logits, teacher_logits):
    """KLDivLoss(reduction='batchmean')(log_softmax(student), softmax(teacher))
    — reference Self variant, model.py:257-259.  Sum over all non-batch dims /
    batch size."""
    s = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=-1)
    t = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
    # torch KLDiv: sum t * (log t - s); zero where t == 0
    log_t = jnp.where(t > 0, jnp.log(jnp.maximum(t, 1e-30)), 0.0)
    kl = t * (log_t - s)
    batch = student_logits.shape[0]
    return kl.sum() / batch


def bce_with_logits(logits, targets):
    """BCEWithLogitsLoss (mean), reference GAN variant model.py:315."""
    logits = logits.astype(jnp.float32)
    return jnp.mean(jnp.maximum(logits, 0) - logits * targets +
                    jnp.log1p(jnp.exp(-jnp.abs(logits))))
