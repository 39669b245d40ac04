"""Fused transformer-FFN Pallas kernel: fc1 -> activation -> fc2 in one
VMEM pass.

Why: the round-3 encoder roofline (PERF.md) showed the FFN block as the
remaining per-layer headroom — the fc2 gemm with its residual+LN epilogue
fusion ran at ~112 TFLOP/s vs ~192 for the bare q/k/v gemms, and the
(B, T, ffn_dim) intermediate (630 MB at flagship shapes) makes an HBM round
trip between fc1 and fc2.  The optimization_barrier experiment
(experiments/ffn_ab.py, measured on v5e 2026-08-19: barrier 0.986x) proved
re-scheduling XLA doesn't close it.  This kernel keeps the intermediate in
VMEM entirely:

  * grid (row-tiles, ffn-chunks): program (i, j) computes
      h_j   = act(x_i @ W1[:, j] + b1_j)          (bm, fk) in f32
      acc  += h_j @ W2[j]                          (bm, H)  in f32
    and writes acc + b2 on the last chunk — the (bm, fk) intermediate
    never leaves VMEM, both gemms hit the MXU at full tile sizes.
  * weights stream chunk-wise ((H, fk) + (fk, H) per program), so the
    kernel fits wav2vec2-large/bart-large (H=1024, F=4096) in VMEM.
  * f32 accumulation end to end; one bf16 output write.  This is *more*
    precise than the XLA bf16 path (which materializes h in bf16).

The reference gets this op from torch/HF (wav2vec2 FeedForward,
hf_model.py:210-215 encoder load; BART EncoderLayer fc1/fc2) and leans on
cuDNN/cuBLAS fusion; here the fusion is explicit and TPU-shaped.

Activation: exact-erf GELU (same rational approximation XLA lowers erf.f32
to — see conv_extractor._erf_f32), tanh GELU, relu, or silu.  Dropout
between fc1 and fc2 (activation_dropout) is NOT supported in-kernel; the
dispatch (ops.layers.ffn_apply) falls back to the XLA path when an
activation-dropout rng is live.

Backward: `ffn_fused_trainable` wraps the kernel in a custom VJP whose
backward recomputes through the XLA chain — flash-style: the (B, T, F)
intermediate is never stored as a residual, trading one extra fc1 gemm in
the backward for the biggest activation buffer in the block (the same
trade jax.checkpoint would make, but keeping the fused forward).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv_extractor import _erf_f32


def _act_f32(name, x):
    if name == "gelu":
        return x * 0.5 * (1.0 + _erf_f32(x * (1.0 / math.sqrt(2.0))))
    if name == "gelu_new":
        c = math.sqrt(2.0 / math.pi)
        return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))
    if name == "relu":
        return jnp.maximum(x, 0.0)
    if name == "silu":
        return x * jax.nn.sigmoid(x)
    raise ValueError(f"unsupported activation {name!r}")


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc_ref, *,
            act, nj):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    h = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = _act_f32(act, h + b1_ref[...].astype(jnp.float32))
    acc_ref[...] += jax.lax.dot_general(
        h.astype(x.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _flush():
        o_ref[...] = (acc_ref[...] +
                      b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def ffn_fused(x, w1, b1, w2, b2, *, act="gelu", block_rows=256,
              block_f=1536, interpret=False):
    """x: (N, H) -> (N, H) = act(x @ w1 + b1) @ w2 + b2.

    Requirements (checked): H % 128 == 0, F % block_f == 0 with
    block_f % 128 == 0, N % block_rows == 0 (callers pad rows; the op is
    row-independent so garbage rows stay garbage).
    """
    n, hdim = x.shape
    fdim = w1.shape[1]
    if w1.shape != (hdim, fdim) or w2.shape != (fdim, hdim):
        raise ValueError(f"shape mismatch: x {x.shape} w1 {w1.shape} "
                         f"w2 {w2.shape}")
    block_f = min(block_f, fdim)
    if hdim % 128 or fdim % block_f or block_f % 128:
        raise ValueError(f"unsupported dims H={hdim} F={fdim} "
                         f"block_f={block_f}")
    if n % block_rows:
        raise ValueError(f"rows {n} not a multiple of block_rows "
                         f"{block_rows}")
    nj = fdim // block_f
    dtype = x.dtype
    b1 = (b1 if b1 is not None else jnp.zeros((fdim,))).reshape(1, fdim)
    b2 = (b2 if b2 is not None else jnp.zeros((hdim,))).reshape(1, hdim)
    fn = pl.pallas_call(
        functools.partial(_kernel, act=act, nj=nj),
        grid=(n // block_rows, nj),
        in_specs=[
            pl.BlockSpec((block_rows, hdim), lambda i, j: (i, 0)),
            pl.BlockSpec((hdim, block_f), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_f), lambda i, j: (0, j)),
            pl.BlockSpec((block_f, hdim), lambda i, j: (j, 0)),
            pl.BlockSpec((1, hdim), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, hdim), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hdim), dtype),
        scratch_shapes=[pltpu.VMEM((block_rows, hdim), jnp.float32)],
        interpret=interpret,
    )
    return fn(x, w1.astype(dtype), b1.astype(jnp.float32),
              w2.astype(dtype), b2.astype(jnp.float32))


def _kernel_res_ln(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, res_ref, g_ref,
                   beta_ref, o_ref, acc_ref, *, act, nj, eps):
    """ffn kernel + post-LN epilogue: o = LN(res + ffn(x)).  The residual
    add, mean/var, and affine all happen on the f32 accumulator while it is
    still in VMEM — the (rows, H) FFN output never round-trips HBM before
    the LayerNorm (the ~112 TFLOP/s fc2+LN seam, PERF.md round-3
    roofline)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    h = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = _act_f32(act, h + b1_ref[...].astype(jnp.float32))
    acc_ref[...] += jax.lax.dot_general(
        h.astype(x.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _flush():
        y = (acc_ref[...] + b2_ref[...].astype(jnp.float32) +
             res_ref[...].astype(jnp.float32))
        mu = jnp.mean(y, axis=1, keepdims=True)
        d = y - mu
        var = jnp.mean(d * d, axis=1, keepdims=True)
        o_ref[...] = (d * jax.lax.rsqrt(var + eps) *
                      g_ref[...].astype(jnp.float32) +
                      beta_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def ffn_fused_res_ln(x, w1, b1, w2, b2, res, g, beta, *, act="gelu",
                     eps=1e-5, block_rows=256, block_f=1536,
                     interpret=False):
    """o = LayerNorm(res + act(x @ w1 + b1) @ w2 + b2; scale=g, bias=beta).

    The post-LN transformer FFN epilogue (BART encoder/decoder blocks,
    wav2vec2-base _encoder_layer) in one VMEM pass.  Same alignment
    requirements as ffn_fused; res: (N, H) — the block's residual input
    (which for post-LN IS the FFN input)."""
    n, hdim = x.shape
    fdim = w1.shape[1]
    if w1.shape != (hdim, fdim) or w2.shape != (fdim, hdim) or \
            res.shape != (n, hdim):
        raise ValueError(f"shape mismatch: x {x.shape} w1 {w1.shape} "
                         f"w2 {w2.shape} res {res.shape}")
    block_f = min(block_f, fdim)
    if hdim % 128 or fdim % block_f or block_f % 128 or n % block_rows:
        raise ValueError(f"unsupported dims N={n} H={hdim} F={fdim} "
                         f"block_f={block_f} block_rows={block_rows}")
    nj = fdim // block_f
    dtype = x.dtype
    b1 = (b1 if b1 is not None else jnp.zeros((fdim,))).reshape(1, fdim)
    b2 = (b2 if b2 is not None else jnp.zeros((hdim,))).reshape(1, hdim)
    fn = pl.pallas_call(
        functools.partial(_kernel_res_ln, act=act, nj=nj, eps=eps),
        grid=(n // block_rows, nj),
        in_specs=[
            pl.BlockSpec((block_rows, hdim), lambda i, j: (i, 0)),
            pl.BlockSpec((hdim, block_f), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_f), lambda i, j: (0, j)),
            pl.BlockSpec((block_f, hdim), lambda i, j: (j, 0)),
            pl.BlockSpec((1, hdim), lambda i, j: (0, 0)),
            pl.BlockSpec((block_rows, hdim), lambda i, j: (i, 0)),
            pl.BlockSpec((1, hdim), lambda i, j: (0, 0)),
            pl.BlockSpec((1, hdim), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, hdim), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hdim), dtype),
        scratch_shapes=[pltpu.VMEM((block_rows, hdim), jnp.float32)],
        interpret=interpret,
    )
    return fn(x, w1.astype(dtype), b1.astype(jnp.float32),
              w2.astype(dtype), b2.astype(jnp.float32), res.astype(dtype),
              g.reshape(1, hdim).astype(jnp.float32),
              beta.reshape(1, hdim).astype(jnp.float32))


def _xla_ffn_res_ln(x, w1, b1, w2, b2, res, g, beta, act, eps):
    y = (res.astype(jnp.float32) +
         _xla_ffn(x, w1, b1, w2, b2, act).astype(jnp.float32))
    mu = jnp.mean(y, axis=-1, keepdims=True)
    d = y - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    return (d * jax.lax.rsqrt(var + eps) * g.astype(jnp.float32) +
            beta.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def ffn_res_ln_trainable(x, w1, b1, w2, b2, res, g, beta, act="gelu",
                         eps=1e-5, block_rows=256, block_f=1536,
                         interpret=False):
    """ffn_fused_res_ln with a total VJP: backward recomputes the whole
    chain (both gemms + LN) through XLA — no (N, F) or pre-LN (N, H)
    residuals stored."""
    return ffn_fused_res_ln(x, w1, b1, w2, b2, res, g, beta, act=act,
                            eps=eps, block_rows=block_rows, block_f=block_f,
                            interpret=interpret)


def _frl_fwd(x, w1, b1, w2, b2, res, g, beta, act, eps, block_rows, block_f,
             interpret):
    out = ffn_fused_res_ln(x, w1, b1, w2, b2, res, g, beta, act=act,
                           eps=eps, block_rows=block_rows, block_f=block_f,
                           interpret=interpret)
    return out, (x, w1, b1, w2, b2, res, g, beta)


def _frl_bwd(act, eps, block_rows, block_f, interpret, resids, grad):
    x, w1, b1, w2, b2, res, g, beta = resids
    _, vjp = jax.vjp(
        lambda *a: _xla_ffn_res_ln(*a, act, eps),
        x, w1, b1, w2, b2, res, g, beta)
    return vjp(grad.astype(x.dtype))


ffn_res_ln_trainable.defvjp(_frl_fwd, _frl_bwd)


def _kernel_dense_res_ln(x_ref, w_ref, b_ref, res_ref, g_ref, beta_ref,
                         o_ref, *, eps):
    """Single gemm + post-LN epilogue: o = LN(res + x @ w + b).  The
    attention out-projection's residual+LayerNorm seam — same ~112 TFLOP/s
    deoptimized-gemm fusion the FFN epilogue kernel closes (PERF.md), one
    matmul instead of two so no ffn-chunk grid axis is needed."""
    y = jax.lax.dot_general(x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = (y + b_ref[...].astype(jnp.float32) +
         res_ref[...].astype(jnp.float32))
    mu = jnp.mean(y, axis=1, keepdims=True)
    d = y - mu
    var = jnp.mean(d * d, axis=1, keepdims=True)
    o_ref[...] = (d * jax.lax.rsqrt(var + eps) *
                  g_ref[...].astype(jnp.float32) +
                  beta_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def dense_res_ln(x, w, b, res, g, beta, *, eps=1e-5, block_rows=256,
                 interpret=False):
    """o = LayerNorm(res + x @ w + b; scale=g, bias=beta).

    The post-LN attention epilogue (BART blocks, wav2vec2-base encoder
    layer): out-projection gemm, residual add, mean/var and affine in one
    VMEM pass.  x: (N, Din), w: (Din, H), res: (N, H).  Requirements
    (checked): Din % 128 == 0, H % 128 == 0, N % block_rows == 0.  The full
    (Din, H) weight is one VMEM block (<= 2 MB bf16 at H = 1024)."""
    n, din = x.shape
    hdim = w.shape[1]
    if w.shape != (din, hdim) or res.shape != (n, hdim):
        raise ValueError(f"shape mismatch: x {x.shape} w {w.shape} "
                         f"res {res.shape}")
    if din % 128 or hdim % 128 or n % block_rows:
        raise ValueError(f"unsupported dims N={n} Din={din} H={hdim} "
                         f"block_rows={block_rows}")
    dtype = x.dtype
    b = (b if b is not None else jnp.zeros((hdim,))).reshape(1, hdim)
    fn = pl.pallas_call(
        functools.partial(_kernel_dense_res_ln, eps=eps),
        grid=(n // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, din), lambda i: (i, 0)),
            pl.BlockSpec((din, hdim), lambda i: (0, 0)),
            pl.BlockSpec((1, hdim), lambda i: (0, 0)),
            pl.BlockSpec((block_rows, hdim), lambda i: (i, 0)),
            pl.BlockSpec((1, hdim), lambda i: (0, 0)),
            pl.BlockSpec((1, hdim), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, hdim), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hdim), dtype),
        interpret=interpret,
    )
    return fn(x, w.astype(dtype), b.astype(jnp.float32), res.astype(dtype),
              g.reshape(1, hdim).astype(jnp.float32),
              beta.reshape(1, hdim).astype(jnp.float32))


def _xla_dense_res_ln(x, w, b, res, g, beta, eps):
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    y = res.astype(jnp.float32) + y.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    d = y - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    return (d * jax.lax.rsqrt(var + eps) * g.astype(jnp.float32) +
            beta.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def dense_res_ln_trainable(x, w, b, res, g, beta, eps=1e-5, block_rows=256,
                           interpret=False):
    """dense_res_ln with a total VJP: backward recomputes gemm + LN through
    XLA (pallas_call has no autodiff rule); no pre-LN (N, H) residual
    stored."""
    return dense_res_ln(x, w, b, res, g, beta, eps=eps,
                        block_rows=block_rows, interpret=interpret)


def _drl_fwd(x, w, b, res, g, beta, eps, block_rows, interpret):
    out = dense_res_ln(x, w, b, res, g, beta, eps=eps,
                       block_rows=block_rows, interpret=interpret)
    return out, (x, w, b, res, g, beta)


def _drl_bwd(eps, block_rows, interpret, resids, grad):
    x, w, b, res, g, beta = resids
    _, vjp = jax.vjp(lambda *a: _xla_dense_res_ln(*a, eps),
                     x, w, b, res, g, beta)
    return vjp(grad.astype(x.dtype))


dense_res_ln_trainable.defvjp(_drl_fwd, _drl_bwd)


def _xla_ffn(x, w1, b1, w2, b2, act):
    h = jnp.dot(x, w1.astype(x.dtype), preferred_element_type=x.dtype)
    if b1 is not None:
        h = h + b1.astype(x.dtype)
    h = _act_f32(act, h.astype(jnp.float32)).astype(x.dtype)
    y = jnp.dot(h, w2.astype(x.dtype), preferred_element_type=x.dtype)
    if b2 is not None:
        y = y + b2.astype(x.dtype)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def ffn_fused_trainable(x, w1, b1, w2, b2, act="gelu", block_rows=256,
                        block_f=1536, interpret=False):
    """ffn_fused with a total VJP: backward recomputes h through the XLA
    chain (pallas_call has no autodiff rule), so the (N, F) intermediate is
    never stored as a residual — the jax.checkpoint trade with a fused
    forward."""
    return ffn_fused(x, w1, b1, w2, b2, act=act, block_rows=block_rows,
                     block_f=block_f, interpret=interpret)


def _fft_fwd(x, w1, b1, w2, b2, act, block_rows, block_f, interpret):
    out = ffn_fused(x, w1, b1, w2, b2, act=act, block_rows=block_rows,
                    block_f=block_f, interpret=interpret)
    return out, (x, w1, b1, w2, b2)


def _fft_bwd(act, block_rows, block_f, interpret, res, g):
    x, w1, b1, w2, b2 = res
    diff = (x, w1, b1, w2, b2)
    _, vjp = jax.vjp(
        lambda x_, w1_, b1_, w2_, b2_: _xla_ffn(x_, w1_, b1_, w2_, b2_, act),
        *diff)
    return vjp(g.astype(x.dtype))


ffn_fused_trainable.defvjp(_fft_fwd, _fft_bwd)
