"""Fused flash attention Pallas kernel for TPU.

Online-softmax tiled attention: one pass over K/V blocks with running
(max, denominator, accumulator) carried in VMEM scratch — O(Tq*D) memory
instead of materializing the (Tq, Tk) probability matrix in HBM.  This is
the hot op of the framework: the speech encoder runs 12-24 such layers over
up to ~1000 frames per utterance (SURVEY.md §3.2).

Supports:
  * key-padding mask (B, Tk) float {0,1}
  * causal masking (decoder training self-attention)
  * fp32 softmax statistics regardless of input dtype (bf16-safe)

Grid: (B*H, nQ, nK); TPU executes the last grid dim sequentially, so the
kernel accumulates across k-blocks in scratch and finalizes on the last one.
Shapes are padded to block multiples in the wrapper; padded KV columns are
masked, padded Q rows sliced off after.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref,
                  m_scr, l_scr, acc_scr, *, scale, causal, block_q, block_k):
    k_idx = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)          # (BQ, D)
    k = k_ref[0].astype(jnp.float32)          # (BK, D)
    v = v_ref[0].astype(jnp.float32)          # (BK, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (BQ, BK)

    # key padding mask: (1, 1, BK) -> bias row broadcast over queries
    kv_valid = mask_ref[0, 0].astype(jnp.float32)  # (BK,)
    s = s + (kv_valid - 1.0)[None, :] * (-NEG_INF)  # 0 where valid, -inf pad

    if causal:
        q_idx = pl.program_id(1)
        q_pos = q_idx * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        k_pos = k_idx * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)

    m_prev = m_scr[:, 0]                       # (BQ,)
    m_cur = jnp.max(s, axis=-1)                # (BQ,)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)            # (BQ,)
    p = jnp.exp(s - m_new[:, None])            # (BQ, BK)

    l_prev = l_scr[:, 0]
    l_new = alpha * l_prev + jnp.sum(p, axis=-1)

    acc = acc_scr[:] * alpha[:, None] + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    m_scr[:] = jnp.broadcast_to(m_new[:, None], m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new[:, None], l_scr.shape)
    acc_scr[:] = acc

    @pl.when(k_idx == n_k - 1)
    def _():
        denom = jnp.maximum(l_scr[:, 0], 1e-30)
        o_ref[0] = (acc_scr[:] / denom[:, None]).astype(o_ref.dtype)


def _attn_single_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale,
                        causal):
    """Single-pass attention for speech-scale T: the full (Tq, Tk) score
    matrix lives in VMEM registers (never HBM) and each grid step handles a
    whole (batch, head) — ~B*H large programs instead of B*H*nQ*nK tiny
    ones.  Matmuls take bf16 inputs with f32 accumulation (MXU fast path);
    the tiled online-softmax kernel upcast everything to f32 first."""
    q = q_ref[0]                               # (Tq, D) input dtype
    k = k_ref[0]                               # (Tk, D)
    v = v_ref[0]                               # (Tk, D)
    kv_valid = mask_ref[0, 0].astype(jnp.float32)  # (Tk,)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # (Tq, Tk) f32
    s = s + (kv_valid - 1.0)[None, :] * (-NEG_INF)
    if causal:
        tq, tk = s.shape
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


# largest padded T for the single-pass path: (T, T) f32 scores + blocks must
# fit VMEM (1024^2 f32 = 4 MB) — covers every speech-encoder shape (<= ~1000
# frames, SURVEY.md §5 long-context note)
_SINGLE_PASS_MAX_T = 1024


def _pad_axis(x, multiple, axis):
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad)


@functools.partial(jax.jit,
                   static_argnames=("causal", "scale", "block_q", "block_k"))
def flash_attention_masked(q, k, v, kv_mask=None, causal=False, scale=None,
                           block_q=128, block_k=128):
    """q: (B, Tq, H, D); k/v: (B, Tk, H, D); kv_mask: (B, Tk) bool/float.
    Returns (B, Tq, H, D) in q.dtype."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    if max(tq, tk) <= _SINGLE_PASS_MAX_T and h > 1:
        # native-layout head-grouped kernel: (B, T, H*D) lane slabs, no
        # head transposes (those cost 3.56 ms/layer at encoder shapes —
        # PERF.md round 3).  The (B,T,H,D)->(B,T,H*D) reshape is free.
        out = flash_attention_fused_layout(
            q.reshape(b, tq, h * d), k.reshape(b, tk, h * d),
            v.reshape(b, tk, h * d), kv_mask, heads=h, scale=scale,
            causal=causal)
        if out is not None:
            return out.reshape(b, tq, h, d)
        # head-grouped grid: H-fold fewer programs; per-program
        # pipeline/DMA overhead was the single-pass kernel's cost
        # driver (measured +10% at encoder shapes — PERF.md round 3)
        return flash_attention_multihead(q, k, v, kv_mask=kv_mask,
                                         causal=causal, scale=scale)

    # (B*H, T, D) layout for the transposed kernels below
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, tq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, tk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, tk, d)
    if kv_mask is None:
        kv_mask = jnp.ones((b, tk), jnp.float32)
    # (B, 1, Tk): keeps the block's second-to-last dim == full dim (TPU
    # lowering requires last-two block dims divisible by (8, 128) or equal
    # to the array dims)
    mask = kv_mask.astype(jnp.float32)[:, None, :]

    if max(tq, tk) <= _SINGLE_PASS_MAX_T:
        qt = _pad_axis(qt, 8, 1)
        kt = _pad_axis(kt, 8, 1)
        vt = _pad_axis(vt, 8, 1)
        mask = _pad_axis(mask, 8, 2)  # pads with 0 = invalid
        tq_p, tk_p = qt.shape[1], kt.shape[1]
        out = pl.pallas_call(
            functools.partial(_attn_single_kernel, scale=scale,
                              causal=causal),
            grid=(b * h,),
            in_specs=[
                pl.BlockSpec((1, tq_p, d), lambda bh: (bh, 0, 0)),
                pl.BlockSpec((1, tk_p, d), lambda bh: (bh, 0, 0)),
                pl.BlockSpec((1, tk_p, d), lambda bh: (bh, 0, 0)),
                pl.BlockSpec((1, 1, tk_p), lambda bh, h=h: (bh // h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, tq_p, d), lambda bh: (bh, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, tq_p, d), q.dtype),
        )(qt, kt, vt, mask)
        return out[:, :tq].reshape(b, h, tq, d).transpose(0, 2, 1, 3)

    block_q = min(block_q, max(tq, 8))
    block_k = min(block_k, max(tk, 8))
    qt = _pad_axis(qt, block_q, 1)
    kt = _pad_axis(kt, block_k, 1)
    vt = _pad_axis(vt, block_k, 1)
    mask = _pad_axis(mask, block_k, 2)  # pads with 0 = invalid
    tq_p, tk_p = qt.shape[1], kt.shape[1]
    n_q, n_k = tq_p // block_q, tk_p // block_k

    kernel = functools.partial(_flash_kernel, scale=scale, causal=causal,
                               block_q=block_q, block_k=block_k)

    out = pl.pallas_call(
        kernel,
        grid=(b * h, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
            pl.BlockSpec((1, 1, block_k),
                         lambda bh, qi, ki, h=h: (bh // h, 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda bh, qi, ki: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )(qt, kt, vt, mask)

    out = out[:, :tq].reshape(b, h, tq, d).transpose(0, 2, 1, 3)
    return out


# ----------------------------------------------------------------------------
# differentiable wrapper (training): custom VJP with a single-pass backward
# kernel — XLA attention keeps the (B, H, T, T) probabilities alive as a
# backward residual (22.7 G HBM for the flagship at B=16, PERF.md); here the
# backward RECOMPUTES scores/probs in VMEM per (batch, head), so activations
# stay O(T·D).
# ----------------------------------------------------------------------------

def _attn_ref_fwd(q, k, v, kv_mask, scale, causal):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, NEG_INF)
    if causal:
        tq, tk = q.shape[1], k.shape[1]
        cm = (jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
              <= jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0))
        logits = jnp.where(cm[None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                      preferred_element_type=q.dtype)


def _attn_ref_bwd(q, k, v, kv_mask, scale, causal, g):
    """Recompute-based attention backward (the formulas the kernel fuses)."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, NEG_INF)
    if causal:
        tq, tk = q.shape[1], k.shape[1]
        cm = (jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
              <= jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0))
        logits = jnp.where(cm[None, None], logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)                       # f32
    dv = jnp.einsum("bhqk,bqhd->bkhd", p.astype(g.dtype), g,
                    preferred_element_type=jnp.float32)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g, v,
                    preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = ds.astype(g.dtype)
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k,
                    preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q,
                    preferred_element_type=jnp.float32) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref,
                     dq_ref, dk_ref, dv_ref, *, scale, causal):
    q = q_ref[0]                               # (Tq, D)
    k = k_ref[0]                               # (Tk, D)
    v = v_ref[0]
    g = g_ref[0]                               # (Tq, D)
    kv_valid = mask_ref[0, 0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = s + (kv_valid - 1.0)[None, :] * (-NEG_INF)
    if causal:
        tq, tk = s.shape
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)                # (Tq, Tk) f32

    pb = p.astype(v.dtype)
    dv_ref[0] = jax.lax.dot_general(                          # p^T @ g
        pb, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(                                 # g @ v^T
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsb = ds.astype(q.dtype)
    dq_ref[0] = (jax.lax.dot_general(
        dsb, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
    dk_ref[0] = (jax.lax.dot_general(                         # ds^T @ q
        dsb, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)


def _attn_bwd_fused_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref,
                           dq_ref, dk_ref, dv_ref, *, scale, causal, hb, d):
    """Native-layout recompute backward: (T, hb*d) lane slabs, heads as
    64-lane columns — the backward twin of _attn_single_fused_kernel (no
    head transposes around the kernel)."""
    kv_valid = mask_ref[0, 0].astype(jnp.float32)
    qa = q_ref[0]
    ka = k_ref[0]
    va = v_ref[0]
    ga = g_ref[0]
    dqs, dks, dvs = [], [], []
    for i in range(hb):
        sl = slice(i * d, (i + 1) * d)
        q = qa[:, sl]
        k = ka[:, sl]
        v = va[:, sl]
        g = ga[:, sl]
        s = _slab_scores(qa, ka, sl, kv_valid, scale, causal)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)          # (Tq, Tk) f32
        pb = p.astype(v.dtype)
        dvs.append(jax.lax.dot_general(                     # p^T @ g
            pb, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype))
        dp = jax.lax.dot_general(                           # g @ v^T
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = ds.astype(q.dtype)
        dqs.append((jax.lax.dot_general(
            dsb, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype))
        dks.append((jax.lax.dot_general(                    # ds^T @ q
            dsb, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype))
    dq_ref[0] = jnp.concatenate(dqs, axis=1)
    dk_ref[0] = jnp.concatenate(dks, axis=1)
    dv_ref[0] = jnp.concatenate(dvs, axis=1)


def _bwd_fused_hb(q, k):
    """hb chooser for the backward fused kernels: 3 Tq-shaped + 4 Tk-shaped
    double-buffered slabs (q/g/dq, k/v/dk/dv) + ~4 live (Tq, Tk) f32 temps
    (p, dp, ds and a compiler temp).  None when not applicable."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if h <= 1:
        return None
    return _fused_heads_per_block(h, d, -(-tq // 8) * 8, -(-tk // 8) * 8,
                                  jnp.dtype(q.dtype).itemsize,
                                  n_q_slabs=3, n_k_slabs=4, n_score_temps=4)


def _flash_bwd_fused_layout(q, k, v, kv_mask, g, *, scale, causal):
    """Backward pass on native (B, T, H*D) layout; returns (dq, dk, dv) in
    the (B, T, H, D) convention of the VJP, or None if constraints fail."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    hb = _bwd_fused_hb(q, k)
    if hb is None:
        return None
    (qt, gt), (kt, vt), mask, tq_p, tk_p, qspec, kspec, mspec = \
        _lane_slab_prep(hb, d, [q.reshape(b, tq, h * d),
                                g.reshape(b, tq, h * d)],
                        [k.reshape(b, tk, h * d), v.reshape(b, tk, h * d)],
                        kv_mask, b, tk)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_fused_kernel, scale=scale, causal=causal,
                          hb=hb, d=d),
        grid=(b, h // hb),
        in_specs=[qspec, kspec, kspec, mspec, qspec],
        out_specs=[qspec, kspec, kspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, tq_p, h * d), q.dtype),
            jax.ShapeDtypeStruct((b, tk_p, h * d), k.dtype),
            jax.ShapeDtypeStruct((b, tk_p, h * d), v.dtype),
        ],
    )(qt, kt, vt, mask, gt)
    return (dq[:, :tq].reshape(b, tq, h, d),
            dk[:, :tk].reshape(b, tk, h, d),
            dv[:, :tk].reshape(b, tk, h, d))


def _single_pass_ok(tq, tk):
    return (max(tq, tk) <= _SINGLE_PASS_MAX_T
            and jax.default_backend() == "tpu")


# the backward kernel holds several (T, T) f32 intermediates live at once
# (p, dp, ds) — cap it tighter than the forward so VMEM allocation is safe
_BWD_MAX_T = 1024  # validated on v5e below; lower if Mosaic VMEM-fails


def _bwd_kernel_ok(tq, tk):
    return (max(tq, tk) <= _BWD_MAX_T
            and jax.default_backend() == "tpu")


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention_trainable(q, k, v, kv_mask, scale, causal):
    """Differentiable attention: q (B, Tq, H, D), k/v (B, Tk, H, D),
    kv_mask (B, Tk) bool or None.

    Forward on TPU always runs a Pallas kernel: single-pass for padded
    T <= 1024, the tiled online-softmax kernel (O(T·D) memory) beyond.
    Backward: single-pass recompute kernel for T <= _BWD_MAX_T, XLA
    reference formulas elsewhere (long-T TRAINING materializes the score
    matrix; long-T INFERENCE never does)."""
    if jax.default_backend() == "tpu":
        return flash_attention_masked(q, k, v, kv_mask=kv_mask,
                                      causal=causal, scale=scale)
    return _attn_ref_fwd(q, k, v, kv_mask, scale, causal)


def _trainable_fwd(q, k, v, kv_mask, scale, causal):
    return (flash_attention_trainable(q, k, v, kv_mask, scale, causal),
            (q, k, v, kv_mask))


def _trainable_bwd(scale, causal, res, g):
    q, k, v, kv_mask = res
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if not _bwd_kernel_ok(tq, tk):
        dq, dk, dv = _attn_ref_bwd(q, k, v, kv_mask, scale, causal, g)
        return dq, dk, dv, None

    fused = _flash_bwd_fused_layout(q, k, v, kv_mask, g, scale=scale,
                                    causal=causal)
    if fused is not None:
        return fused + (None,)

    qt = _pad_axis(q.transpose(0, 2, 1, 3).reshape(b * h, tq, d), 8, 1)
    kt = _pad_axis(k.transpose(0, 2, 1, 3).reshape(b * h, tk, d), 8, 1)
    vt = _pad_axis(v.transpose(0, 2, 1, 3).reshape(b * h, tk, d), 8, 1)
    gt = _pad_axis(g.transpose(0, 2, 1, 3).reshape(b * h, tq, d), 8, 1)
    if kv_mask is None:
        kv_mask = jnp.ones((b, tk), jnp.float32)
    mask = _pad_axis(kv_mask.astype(jnp.float32)[:, None, :], 8, 2)
    tq_p, tk_p = qt.shape[1], kt.shape[1]

    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, causal=causal),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, tq_p, d), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, tk_p, d), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, tk_p, d), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, 1, tk_p), lambda bh, h=h: (bh // h, 0, 0)),
            pl.BlockSpec((1, tq_p, d), lambda bh: (bh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tq_p, d), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, tk_p, d), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, tk_p, d), lambda bh: (bh, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, tq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, tk_p, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, tk_p, d), v.dtype),
        ],
    )(qt, kt, vt, mask, gt)

    def unflat(x, t):
        return x[:, :t].reshape(b, h, t, d).transpose(0, 2, 1, 3)
    return unflat(dq, tq), unflat(dk, tk), unflat(dv, tk), None


flash_attention_trainable.defvjp(_trainable_fwd, _trainable_bwd)


# ----------------------------------------------------------------------------
# dropout-capable trainable attention: attention-probability dropout INSIDE
# the kernel via the TPU PRNG (pltpu.prng_seed / prng_random_bits), so the
# reference-fidelity recipe (HF backbone-default dropout, hf_model.py:216-219
# loads checkpoints with ~0.1 rates) can use the flash VJP path — previously
# dropout forced XLA attention, which keeps the (B, H, T, T) probabilities
# alive as backward residuals (the B=16 OOM driver, PERF.md).
#
# The mask is NOT materialized in HBM: forward and backward regenerate the
# same bits from (seed, program_id).  On CPU (tests) and for padded
# T > _SINGLE_PASS_MAX_T the function falls back to XLA formulas with a
# seed-derived jax.random mask — deterministic per backend, same semantics,
# different stream than the TPU kernel (dropout is stochastic; only
# seeded determinism within a backend is contractual).
# ----------------------------------------------------------------------------


def _dropout_scale_from_bits(bits, rate):
    """Random bits -> {0, 1/(1-rate)} f32 multiplier.  prng_random_bits
    yields SIGNED int32 on TPU — bitcast to uint32 before the threshold
    compare or half the range lands below any positive threshold."""
    bits = jax.lax.bitcast_convert_type(bits, jnp.uint32)
    threshold = jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
    keep = (bits >= threshold).astype(jnp.float32)
    return keep * (1.0 / (1.0 - rate))


def _attn_single_dropout_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref,
                                o_ref, *, scale, causal, rate):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    kv_valid = mask_ref[0, 0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = s + (kv_valid - 1.0)[None, :] * (-NEG_INF)
    if causal:
        tq, tk = s.shape
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    d = _dropout_scale_from_bits(pltpu.prng_random_bits(p.shape), rate)
    p = p * d

    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attn_bwd_dropout_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, g_ref,
                             dq_ref, dk_ref, dv_ref, *, scale, causal, rate):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    kv_valid = mask_ref[0, 0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = s + (kv_valid - 1.0)[None, :] * (-NEG_INF)
    if causal:
        tq, tk = s.shape
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)          # (Tq, Tk) f32

    # regenerate the EXACT forward mask: same seed, same program_id, same
    # shape -> identical bit stream
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    d = _dropout_scale_from_bits(pltpu.prng_random_bits(p.shape), rate)
    pd = p * d                                          # p-tilde

    pdb = pd.astype(v.dtype)
    dv_ref[0] = jax.lax.dot_general(                    # p-tilde^T @ g
        pdb, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dpd = jax.lax.dot_general(                          # g @ v^T = dL/dp~
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = dpd * d                                        # chain through mask
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsb = ds.astype(q.dtype)
    dq_ref[0] = (jax.lax.dot_general(
        dsb, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
    dk_ref[0] = (jax.lax.dot_general(
        dsb, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)


def _attn_dropout_fused_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref,
                               o_ref, *, scale, causal, rate, hb, d):
    """Native-layout dropout forward: heads as 64-lane columns, PRNG seeded
    per (batch, head-group) program; the head loop draws hb masks in order —
    the backward twin regenerates the identical stream because both use the
    SAME hb (shared chooser _bwd_fused_hb / _lane_slab_prep)."""
    kv_valid = mask_ref[0, 0].astype(jnp.float32)
    pltpu.prng_seed(
        seed_ref[0],
        # fold (batch, head-group) into ONE stream index: libtpu
        # rejects prng_set_seed_32 with >2 values (observed on the
        # round-4 v5e; round-3's chip accepted 3).  fwd and bwd use
        # this same fold, so mask regeneration is unaffected.
        pl.program_id(0) * pl.num_programs(1) + pl.program_id(1))
    qa = q_ref[0]
    ka = k_ref[0]
    va = v_ref[0]
    outs = []
    for i in range(hb):
        sl = slice(i * d, (i + 1) * d)
        s = _slab_scores(qa, ka, sl, kv_valid, scale, causal)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        dmask = _dropout_scale_from_bits(pltpu.prng_random_bits(e.shape),
                                         rate)
        o = jax.lax.dot_general(
            (e * dmask).astype(va.dtype), va[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append((o / denom).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=1)


def _attn_bwd_dropout_fused_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref,
                                   g_ref, dq_ref, dk_ref, dv_ref, *, scale,
                                   causal, rate, hb, d):
    kv_valid = mask_ref[0, 0].astype(jnp.float32)
    pltpu.prng_seed(
        seed_ref[0],
        # fold (batch, head-group) into ONE stream index: libtpu
        # rejects prng_set_seed_32 with >2 values (observed on the
        # round-4 v5e; round-3's chip accepted 3).  fwd and bwd use
        # this same fold, so mask regeneration is unaffected.
        pl.program_id(0) * pl.num_programs(1) + pl.program_id(1))
    qa = q_ref[0]
    ka = k_ref[0]
    va = v_ref[0]
    ga = g_ref[0]
    dqs, dks, dvs = [], [], []
    for i in range(hb):
        sl = slice(i * d, (i + 1) * d)
        q = qa[:, sl]
        k = ka[:, sl]
        v = va[:, sl]
        g = ga[:, sl]
        s = _slab_scores(qa, ka, sl, kv_valid, scale, causal)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        dmask = _dropout_scale_from_bits(pltpu.prng_random_bits(p.shape),
                                         rate)
        pd = p * dmask
        pdb = pd.astype(v.dtype)
        dvs.append(jax.lax.dot_general(
            pdb, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype))
        dpd = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = dpd * dmask
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = ds.astype(q.dtype)
        dqs.append((jax.lax.dot_general(
            dsb, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype))
        dks.append((jax.lax.dot_general(
            dsb, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype))
    dq_ref[0] = jnp.concatenate(dqs, axis=1)
    dk_ref[0] = jnp.concatenate(dks, axis=1)
    dv_ref[0] = jnp.concatenate(dvs, axis=1)


def _dropout_fused_hb(q, k):
    """Shared fwd/bwd head grouping for the dropout kernels: both sides must
    draw the identical PRNG stream, so both use the (tighter) backward VMEM
    model.  Returns None when the fused layout is not applicable."""
    return _bwd_fused_hb(q, k)


def _xla_dropout_mask(seed, shape, rate):
    """Backend-portable fallback mask: {0, 1/(1-rate)} from a seed-derived
    jax.random stream (regenerated identically in fwd and bwd)."""
    key = jax.random.PRNGKey(0)
    key = jax.random.fold_in(key, seed)
    keep = jax.random.uniform(key, shape) >= rate
    return keep.astype(jnp.float32) * (1.0 / (1.0 - rate))


def _dropout_ref_fwd(q, k, v, kv_mask, seed, scale, causal, rate):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, NEG_INF)
    if causal:
        tq, tk = q.shape[1], k.shape[1]
        cm = (jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
              <= jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0))
        logits = jnp.where(cm[None, None], logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    p = p * _xla_dropout_mask(seed, p.shape, rate)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v,
                      preferred_element_type=q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_attention_dropout(q, k, v, kv_mask, seed, scale, causal, rate):
    """Differentiable attention WITH attention-prob dropout.

    q (B, Tq, H, D), k/v (B, Tk, H, D), kv_mask (B, Tk) bool or None,
    seed: int32 scalar (traced) — deterministic per (seed, backend).
    rate: static python float in (0, 1).

    TPU, padded T <= _SINGLE_PASS_MAX_T: single-pass Pallas kernels, mask
    regenerated in-kernel (never materialized in HBM).  Elsewhere: XLA
    formulas with a seed-derived mask (recompute-based backward, so the
    probability matrix is still not a residual)."""
    if _single_pass_ok(q.shape[1], k.shape[1]):
        return _flash_dropout_fwd_tpu(q, k, v, kv_mask, seed, scale, causal,
                                      rate)
    return _dropout_ref_fwd(q, k, v, kv_mask, seed, scale, causal, rate)


def _flash_dropout_fwd_tpu(q, k, v, kv_mask, seed, scale, causal, rate):
    b, tq, h, d = q.shape
    tk = k.shape[1]
    hb = _dropout_fused_hb(q, k)
    if hb is not None:
        (qt,), (kt, vt), mask, tq_p, tk_p, qspec, kspec, mspec = \
            _lane_slab_prep(hb, d, [q.reshape(b, tq, h * d)],
                            [k.reshape(b, tk, h * d),
                             v.reshape(b, tk, h * d)], kv_mask, b, tk)
        seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
        out = pl.pallas_call(
            functools.partial(_attn_dropout_fused_kernel, scale=scale,
                              causal=causal, rate=rate, hb=hb, d=d),
            grid=(b, h // hb),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      qspec, kspec, kspec, mspec],
            out_specs=qspec,
            out_shape=jax.ShapeDtypeStruct((b, tq_p, h * d), q.dtype),
        )(seed_arr, qt, kt, vt, mask)
        return out[:, :tq].reshape(b, tq, h, d)
    qt = _pad_axis(q.transpose(0, 2, 1, 3).reshape(b * h, tq, d), 8, 1)
    kt = _pad_axis(k.transpose(0, 2, 1, 3).reshape(b * h, tk, d), 8, 1)
    vt = _pad_axis(v.transpose(0, 2, 1, 3).reshape(b * h, tk, d), 8, 1)
    if kv_mask is None:
        kv_mask = jnp.ones((b, tk), jnp.float32)
    mask = _pad_axis(kv_mask.astype(jnp.float32)[:, None, :], 8, 2)
    tq_p, tk_p = qt.shape[1], kt.shape[1]
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    out = pl.pallas_call(
        functools.partial(_attn_single_dropout_kernel, scale=scale,
                          causal=causal, rate=rate),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tq_p, d), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, tk_p, d), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, tk_p, d), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, 1, tk_p), lambda bh, h=h: (bh // h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq_p, d), lambda bh: (bh, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_p, d), q.dtype),
    )(seed_arr, qt, kt, vt, mask)
    return out[:, :tq].reshape(b, h, tq, d).transpose(0, 2, 1, 3)


def _dropout_fwd(q, k, v, kv_mask, seed, scale, causal, rate):
    return (flash_attention_dropout(q, k, v, kv_mask, seed, scale, causal,
                                    rate),
            (q, k, v, kv_mask, seed))


def _dropout_ref_bwd(q, k, v, kv_mask, seed, scale, causal, rate, g):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, NEG_INF)
    if causal:
        tq, tk = q.shape[1], k.shape[1]
        cm = (jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
              <= jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0))
        logits = jnp.where(cm[None, None], logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    dmask = _xla_dropout_mask(seed, p.shape, rate)
    pd = p * dmask
    dv = jnp.einsum("bhqk,bqhd->bkhd", pd.astype(g.dtype), g,
                    preferred_element_type=jnp.float32)
    dpd = jnp.einsum("bqhd,bkhd->bhqk", g, v,
                     preferred_element_type=jnp.float32)
    dp = dpd * dmask
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = ds.astype(g.dtype)
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k,
                    preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q,
                    preferred_element_type=jnp.float32) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _dropout_bwd(scale, causal, rate, res, g):
    q, k, v, kv_mask, seed = res
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if not _single_pass_ok(tq, tk):
        dq, dk, dv = _dropout_ref_bwd(q, k, v, kv_mask, seed, scale, causal,
                                      rate, g)
        return dq, dk, dv, None, None

    hb = _dropout_fused_hb(q, k)
    if hb is not None:
        # native-layout twin of _flash_dropout_fwd_tpu's fused branch: same
        # hb (shared chooser), same grid, same _lane_slab_prep blocks -> the
        # regenerated PRNG stream matches the forward mask by construction
        (qt, gt), (kt, vt), mask, tq_p, tk_p, qspec, kspec, mspec = \
            _lane_slab_prep(hb, d, [q.reshape(b, tq, h * d),
                                    g.reshape(b, tq, h * d)],
                            [k.reshape(b, tk, h * d),
                             v.reshape(b, tk, h * d)], kv_mask, b, tk)
        seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
        dq, dk, dv = pl.pallas_call(
            functools.partial(_attn_bwd_dropout_fused_kernel, scale=scale,
                              causal=causal, rate=rate, hb=hb, d=d),
            grid=(b, h // hb),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      qspec, kspec, kspec, mspec, qspec],
            out_specs=[qspec, kspec, kspec],
            out_shape=[
                jax.ShapeDtypeStruct((b, tq_p, h * d), q.dtype),
                jax.ShapeDtypeStruct((b, tk_p, h * d), k.dtype),
                jax.ShapeDtypeStruct((b, tk_p, h * d), v.dtype),
            ],
        )(seed_arr, qt, kt, vt, mask, gt)
        return (dq[:, :tq].reshape(b, tq, h, d),
                dk[:, :tk].reshape(b, tk, h, d),
                dv[:, :tk].reshape(b, tk, h, d), None, None)

    qt = _pad_axis(q.transpose(0, 2, 1, 3).reshape(b * h, tq, d), 8, 1)
    kt = _pad_axis(k.transpose(0, 2, 1, 3).reshape(b * h, tk, d), 8, 1)
    vt = _pad_axis(v.transpose(0, 2, 1, 3).reshape(b * h, tk, d), 8, 1)
    gt = _pad_axis(g.transpose(0, 2, 1, 3).reshape(b * h, tq, d), 8, 1)
    if kv_mask is None:
        kv_mask = jnp.ones((b, tk), jnp.float32)
    mask = _pad_axis(kv_mask.astype(jnp.float32)[:, None, :], 8, 2)
    tq_p, tk_p = qt.shape[1], kt.shape[1]
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_dropout_kernel, scale=scale,
                          causal=causal, rate=rate),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tq_p, d), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, tk_p, d), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, tk_p, d), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, 1, tk_p), lambda bh, h=h: (bh // h, 0, 0)),
            pl.BlockSpec((1, tq_p, d), lambda bh: (bh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tq_p, d), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, tk_p, d), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, tk_p, d), lambda bh: (bh, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, tq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, tk_p, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, tk_p, d), v.dtype),
        ],
    )(seed_arr, qt, kt, vt, mask, gt)

    def unflat(x, t):
        return x[:, :t].reshape(b, h, t, d).transpose(0, 2, 1, 3)
    return unflat(dq, tq), unflat(dk, tk), unflat(dv, tk), None, None


flash_attention_dropout.defvjp(_dropout_fwd, _dropout_bwd)


# ----------------------------------------------------------------------------
# multi-head single-pass kernel: one program per BATCH row (all heads inside)
# instead of one per (batch, head).  The (B*H,)-grid kernel spends ~9.5 us
# of per-program pipeline/DMA overhead on ~3 us of work at speech shapes
# (measured: 12-layer encoder attention ~13 ms/layer at B=128 while the
# gemms run at ~peak MFU); folding the head loop inside cuts programs H-fold
# and lets the per-head dots pipeline against one block fetch.
# ----------------------------------------------------------------------------


def _slab_scores(qa, ka, sl, kv_valid, scale, causal):
    """Masked (Tq, Tk) f32 scores for one 64-lane head column `sl` of the
    (T, hb*d) lane slabs — the shared front half of every fused-layout
    kernel body (fwd, bwd, dropout fwd, dropout bwd)."""
    s = jax.lax.dot_general(
        qa[:, sl], ka[:, sl], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = s + (kv_valid - 1.0)[None, :] * (-NEG_INF)
    if causal:
        tq, tk = s.shape
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
    return s


def _lane_slab_prep(hb, d, q_like, k_like, kv_mask, b, tk):
    """Shared pad + BlockSpec builder for every fused-layout pallas_call.
    q_like: list of (B, Tq, H*D) arrays (q, and g for backward); k_like:
    list of (B, Tk, H*D) arrays (k, v).  Returns (q_list, k_list, mask,
    tq_p, tk_p, qspec, kspec, mspec).  The dropout fwd and bwd kernels
    MUST issue identical grids/blocks so their in-kernel PRNG streams
    match — routing both through this one builder makes that hold by
    construction."""
    q_like = [_pad_axis(a, 8, 1) for a in q_like]
    k_like = [_pad_axis(a, 8, 1) for a in k_like]
    if kv_mask is None:
        kv_mask = jnp.ones((b, tk), jnp.float32)
    mask = _pad_axis(kv_mask.astype(jnp.float32)[:, None, :], 8, 2)
    tq_p, tk_p = q_like[0].shape[1], k_like[0].shape[1]
    qspec = pl.BlockSpec((1, tq_p, hb * d), lambda i, j: (i, 0, j))
    kspec = pl.BlockSpec((1, tk_p, hb * d), lambda i, j: (i, 0, j))
    mspec = pl.BlockSpec((1, 1, tk_p), lambda i, j: (i, 0, 0))
    return q_like, k_like, mask, tq_p, tk_p, qspec, kspec, mspec


def _attn_single_fused_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                              scale, causal, hb, d):
    """Head-grouped single-pass attention on the NATIVE activation layout:
    q/k/v blocks are (Tq|Tk, hb*d) lane-slabs of the (B, T, H*D) projection
    outputs, heads sliced as 64-lane columns in-kernel.  Avoids the
    (B,T,H,D)<->(B,H,T,D) relayouts of the transposed wrappers — measured
    3.56 ms/layer of pure copies at encoder shapes (PERF.md round 3)."""
    kv_valid = mask_ref[0, 0].astype(jnp.float32)      # (Tk,)
    qa = q_ref[0]                                      # (Tq, hb*d)
    ka = k_ref[0]
    va = v_ref[0]
    outs = []
    for i in range(hb):
        sl = slice(i * d, (i + 1) * d)
        s = _slab_scores(qa, ka, sl, kv_valid, scale, causal)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)          # (Tq, 1)
        o = jax.lax.dot_general(
            p.astype(va.dtype), va[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append((o / denom).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=1)


def _fused_heads_per_block(h, d, tq_p, tk_p, itemsize, n_q_slabs=2,
                           n_k_slabs=2, n_score_temps=3):
    """Largest divisor of h whose lane-slab blocks satisfy the TPU lane
    constraint ((hb*d) % 128 == 0, or the full row) and fit the conservative
    VMEM model: double-buffered lane slabs (n_q_slabs Tq-shaped +
    n_k_slabs Tk-shaped) + n_score_temps live (Tq, Tk) f32 score temps,
    11 MB budget (see flash_attention_multihead for the temp-count
    calibration).  Forward: q/o + k/v with ~3 temps; backward: q/g/dq +
    k/v/dk/dv with ~4 temps."""
    budget = 11 * 2**20
    scores = n_score_temps * tq_p * tk_p * 4
    for cand in range(h, 0, -1):
        if h % cand:
            continue
        if (cand * d) % 128 and cand != h:
            continue
        blocks = 2 * cand * d * (n_q_slabs * tq_p
                                 + n_k_slabs * tk_p) * itemsize
        if blocks + scores <= budget:
            return cand
    return None


def flash_attention_fused_layout(q2, k2, v2, kv_mask, *, heads, scale,
                                 causal=False):
    """Single-pass attention on (B, T, H*D) activations (the dense-projection
    output layout) — no head transposes in or out.  q2: (B, Tq, H*D);
    k2/v2: (B, Tk, H*D); kv_mask: (B, Tk) float/bool or None.
    Returns (B, Tq, H*D) in q2.dtype, or None if no head grouping satisfies
    the lane/VMEM constraints (caller falls back to the transposed kernels).
    """
    b, tq, hd = q2.shape
    tk = k2.shape[1]
    d = hd // heads
    hb = _fused_heads_per_block(heads, d, -(-tq // 8) * 8, -(-tk // 8) * 8,
                                jnp.dtype(q2.dtype).itemsize)
    if hb is None:
        return None
    (qt,), (kt, vt), mask, tq_p, tk_p, qspec, kspec, mspec = \
        _lane_slab_prep(hb, d, [q2], [k2, v2], kv_mask, b, tk)
    out = pl.pallas_call(
        functools.partial(_attn_single_fused_kernel, scale=scale,
                          causal=causal, hb=hb, d=d),
        grid=(b, heads // hb),
        in_specs=[qspec, kspec, kspec, mspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, tq_p, hd), q2.dtype),
    )(qt, kt, vt, mask)
    return out[:, :tq]


def _attn_single_mh_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale,
                           causal, heads_per_block):
    kv_valid = mask_ref[0, 0].astype(jnp.float32)      # (Tk,)
    for h in range(heads_per_block):
        q = q_ref[0, h]                                # (Tq, D)
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + (kv_valid - 1.0)[None, :] * (-NEG_INF)
        if causal:
            tq, tk = s.shape
            q_pos = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
            k_pos = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, h] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def flash_attention_multihead(q, k, v, kv_mask=None, causal=False,
                              scale=None, heads_per_block=None):
    """Single-pass attention, one grid program per (batch row, head group)
    with heads_per_block heads looped in-kernel.  Same numerics as the
    (B*H,)-grid single-pass kernel with H-fold fewer programs.
    q: (B, Tq, H, D); k/v: (B, Tk, H, D); kv_mask: (B, Tk).
    heads_per_block: None = largest divisor of H whose blocks fit the
    ~16 MB VMEM budget (q/k/v/o blocks double-buffered + (Tq, Tk) f32
    scores)."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    qt = _pad_axis(q.transpose(0, 2, 1, 3), 8, 2)      # (B, H, Tq_p, D)
    kt = _pad_axis(k.transpose(0, 2, 1, 3), 8, 2)
    vt = _pad_axis(v.transpose(0, 2, 1, 3), 8, 2)
    if kv_mask is None:
        kv_mask = jnp.ones((b, tk), jnp.float32)
    mask = _pad_axis(kv_mask.astype(jnp.float32)[:, None, :], 8, 2)
    tq_p, tk_p = qt.shape[2], kt.shape[2]
    if heads_per_block is None:
        itemsize = jnp.dtype(q.dtype).itemsize
        # conservative VMEM model: double-buffered q/k/v/o blocks plus ~3
        # live (Tq, Tk) f32 score intermediates (s, p, and a compiler temp
        # — the in-situ compile reported 18.75M for hb=6 at T=800 where a
        # 1-temp model predicted 7.5M), under an 11 MB budget so other live
        # buffers in the surrounding program still fit the 16 MB scope
        budget = 11 * 2**20
        scores = 3 * tq_p * tk_p * 4
        heads_per_block = 1
        for cand in range(h, 0, -1):
            if h % cand:
                continue
            blocks = 2 * cand * (2 * tq_p + 2 * tk_p) * d * itemsize
            if blocks + scores <= budget:
                heads_per_block = cand
                break
    hb = heads_per_block
    n_hb = h // hb
    out = pl.pallas_call(
        functools.partial(_attn_single_mh_kernel, scale=scale,
                          causal=causal, heads_per_block=hb),
        grid=(b, n_hb),
        in_specs=[
            pl.BlockSpec((1, hb, tq_p, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, hb, tk_p, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, hb, tk_p, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, tk_p), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb, tq_p, d), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, tq_p, d), q.dtype),
    )(qt, kt, vt, mask)
    return out[:, :, :tq].transpose(0, 2, 1, 3)
