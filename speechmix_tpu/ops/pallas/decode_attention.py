"""Fused single-query decode attention (flash-decode style) for TPU.

The generation hot loop (generation.greedy_decode / beam) runs attention
with q_len == 1 twice per decoder layer per step: causal self-attention
over the KV cache and cross-attention over the precomputed encoder K/V
(seq2seq._decoder_block).  XLA lowers these to M=1 batched GEMMs plus
separate softmax/mask kernels — heavily padding-bound on the MXU and
several HBM round-trips per step.  This kernel fuses
mask -> scores -> softmax -> weighted-sum into ONE VMEM-resident pass per
batch row, reading K/V exactly once.

Layout: heads stay folded in the lane dimension (T, H*D) — 768 lanes for
bart-base, no padding — and per-head score reduction happens via an
in-register (T, H, D) reshape.  All compute is VPU; there is no matmul to
pad.  Reference for the op being replaced: hf_model.py:343-376 decode step
(the reference recomputed even the cross K/V per step, SURVEY.md §3.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..masking import NEG_INF


def _kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, num_heads, scale, rows):
    """One program handles `rows` batch rows (static unroll): amortizes the
    per-grid-step DMA/pipeline overhead that dominates at q_len==1 sizes."""
    hd = k_ref.shape[2]
    d = hd // num_heads
    # per-head segment sums/broadcasts as one-hot matmuls — Mosaic rejects
    # lane-splitting reshapes like (T, H*D)->(T, H, D), and these land on
    # the MXU instead
    lane = jax.lax.broadcasted_iota(jnp.int32, (hd, num_heads), 0) // d
    head = jax.lax.broadcasted_iota(jnp.int32, (hd, num_heads), 1)
    seg = (lane == head).astype(jnp.float32)      # (H*D, H) one-hot

    for g in range(rows):
        q = q_ref[g]                  # (1, H*D)
        k = k_ref[g]                  # (T, H*D)
        v = v_ref[g]                  # (T, H*D)
        m = m_ref[g]                  # (T, 1) float: 1 valid, 0 masked

        # elementwise stays in the input dtype (bf16); f32 enters at the MXU
        # accumulate — the standard flash-attention numerics
        prod = k * q                                          # (T, H*D)
        scores = jnp.dot(prod, seg.astype(prod.dtype),
                         preferred_element_type=jnp.float32)  # (T, H)
        scores = scores * scale + jnp.where(m > 0, 0.0, NEG_INF)  # (T,1) bc
        smax = jnp.max(scores, axis=0, keepdims=True)         # (1, H)
        p = jnp.exp(scores - smax)
        p = p / jnp.sum(p, axis=0, keepdims=True)             # (T, H)
        pbig = jnp.dot(p.astype(v.dtype), seg.T.astype(v.dtype),
                       preferred_element_type=jnp.float32
                       ).astype(v.dtype)                      # (T, H*D)
        ones_row = jnp.ones((1, pbig.shape[0]), v.dtype)
        o_ref[g] = jnp.dot(ones_row, pbig * v,                # MXU T-reduce
                           preferred_element_type=jnp.float32
                           ).astype(v.dtype)                  # (1, H*D)


def _kernel_q8(q_ref, k_ref, v_ref, m_ref, ks_ref, vs_ref, o_ref, *,
               num_heads, scale, rows):
    """int8-KV variant: k/v refs hold int8 codes (HBM reads at half the bf16
    traffic — the decode loop's dominant cost, PERF.md), ks/vs the
    per-(token, head) f32 scales.  Dequantization is exact: k-scales multiply
    the (T, H) scores, v-scales fold into the probabilities."""
    hd = k_ref.shape[2]
    d = hd // num_heads
    lane = jax.lax.broadcasted_iota(jnp.int32, (hd, num_heads), 0) // d
    head = jax.lax.broadcasted_iota(jnp.int32, (hd, num_heads), 1)
    seg = (lane == head).astype(jnp.float32)      # (H*D, H) one-hot

    for g in range(rows):
        q = q_ref[g]                              # (1, H*D) bf16/f32
        k = k_ref[g].astype(q.dtype)              # int8 load -> in-register
        v = v_ref[g].astype(q.dtype)              # convert (no HBM copy)
        m = m_ref[g]                              # (T, 1)
        ks = ks_ref[g]                            # (T, H) f32
        vs = vs_ref[g]

        prod = k * q                                          # (T, H*D)
        scores = jnp.dot(prod, seg.astype(prod.dtype),
                         preferred_element_type=jnp.float32)  # (T, H)
        scores = scores * ks * scale + jnp.where(m > 0, 0.0, NEG_INF)
        smax = jnp.max(scores, axis=0, keepdims=True)
        p = jnp.exp(scores - smax)
        p = p / jnp.sum(p, axis=0, keepdims=True)             # (T, H)
        p = p * vs                                            # fold v scales
        pbig = jnp.dot(p.astype(v.dtype), seg.T.astype(v.dtype),
                       preferred_element_type=jnp.float32
                       ).astype(v.dtype)                      # (T, H*D)
        ones_row = jnp.ones((1, pbig.shape[0]), v.dtype)
        o_ref[g] = jnp.dot(ones_row, pbig * v,
                           preferred_element_type=jnp.float32
                           ).astype(v.dtype)


def _reference(q, k, v, mask, scale, num_heads, k_scale=None, v_scale=None):
    """XLA fallback with identical semantics (also the CPU/test oracle).
    q: (B, 1, H, D); k/v: (B, T, H, D); mask: (B, T) bool.
    k_scale/v_scale: optional (B, T, H) int8-KV dequant scales."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k.astype(q.dtype),
                        preferred_element_type=jnp.float32) * scale
    if k_scale is not None:
        logits = logits * k_scale.transpose(0, 2, 1)[:, :, None, :]
    bias = jnp.where(mask[:, None, None, :], 0.0, NEG_INF)
    probs = jax.nn.softmax(logits + bias, axis=-1)
    if v_scale is not None:
        probs = probs * v_scale.transpose(0, 2, 1)[:, :, None, :]
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype),
                      v.astype(q.dtype), preferred_element_type=q.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "num_heads",
                                             "force_pallas"))
def decode_attention(q, k, v, mask, *, scale, num_heads, force_pallas=False,
                     k_scale=None, v_scale=None):
    """Single-query attention: q (B, 1, H, D), k/v (B, T, H, D),
    mask (B, T) bool (True = attend).  Returns (B, 1, H, D).
    k_scale/v_scale: optional (B, T, H) f32 scales for int8 k/v codes
    (seq2seq.DecoderCache kv_int8) — dequantized in-register.

    Uses the fused Pallas kernel on TPU; XLA reference elsewhere."""
    int8_kv = k_scale is not None
    if jax.default_backend() != "tpu" and not force_pallas:
        return _reference(q, k, v, mask, scale, num_heads, k_scale, v_scale)
    b, t, h, d = k.shape
    hd = h * d
    # rows per program: amortize grid overhead, stay under ~4 MB of K/V
    # block per buffer so pipelining has headroom
    rows = 1
    itemsize = jnp.dtype(k.dtype).itemsize
    # per-row VMEM bytes: k + v blocks, plus (int8 path) two f32 scale
    # blocks whose h-lane dim pads to 128
    row_bytes = 2 * t * hd * itemsize
    if int8_kv:
        row_bytes += 2 * t * max(h, 128) * 4
    for cand in (8, 4, 2):
        # double-buffered by the pipeline: 2 copies of each block in flight
        if b % cand == 0 and 2 * cand * row_bytes <= 12 * 1024 * 1024:
            rows = cand
            break
    qf = q.reshape(b, 1, hd)
    kf = k.reshape(b, t, hd)
    vf = v.reshape(b, t, hd)
    mf = mask.astype(jnp.float32).reshape(b, t, 1)
    row_spec = lambda shape: pl.BlockSpec((rows,) + shape,
                                          lambda i: (i,) + (0,) * len(shape),
                                          memory_space=pltpu.VMEM)
    in_specs = [row_spec((1, hd)), row_spec((t, hd)), row_spec((t, hd)),
                row_spec((t, 1))]
    operands = [qf, kf, vf, mf]
    if int8_kv:
        kernel = functools.partial(_kernel_q8, num_heads=num_heads,
                                   scale=scale, rows=rows)
        in_specs += [row_spec((t, h)), row_spec((t, h))]
        operands += [k_scale, v_scale]
        out_dtype = q.dtype
    else:
        kernel = functools.partial(_kernel, num_heads=num_heads, scale=scale,
                                   rows=rows)
        out_dtype = v.dtype
    out = pl.pallas_call(
        kernel,
        grid=(b // rows,),
        in_specs=in_specs,
        out_specs=row_spec((1, hd)),
        out_shape=jax.ShapeDtypeStruct((b, 1, hd), out_dtype),
        interpret=(jax.default_backend() != "tpu"),
    )(*operands)
    return out.reshape(b, 1, h, d)
