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
to — see conv_extractor._erf_f32), tanh GELU, relu, or silu.

Dropout (round 4): the training-fidelity recipe keeps the HF backbone
dropout rates live (hf_model.py:216-219 config load), which used to force
the whole FFN block back onto the XLA chain.  `ffn_dropout_trainable` /
`ffn_dropout_res_ln_trainable` / `dense_dropout_res_ln_trainable` apply
activation- and output-dropout IN-KERNEL via the TPU PRNG (the same
(seed, program_id) regeneration scheme as the flash-attention dropout
kernels): masks are never materialized in HBM on the forward, and the
backward regenerates the exact bits with a tiny mask kernel
(`dropout_mask`) before recomputing through the XLA chain — so neither
the (N, F) intermediate nor its mask is a residual.  Off-TPU the same
functions fall back to XLA formulas with a seed-derived jax.random mask
(deterministic per backend; only within-backend determinism is
contractual, as with flash dropout).

Backward (round 5): every trainable wrapper recomputes — flash-style, the
(B, T, F) intermediate is never stored as a residual (the jax.checkpoint
trade with a fused forward) — through one of three implementations
switched by `_BWD_IMPL` / `set_ffn_bwd_impl`:
  "hand" (default): hand-derived XLA formulas (analytic activation
      derivatives, f32 weight-grad accumulation) — measured 149 vs 120
      TFLOP/s against jax.vjp of the same chain (PERF.md round-5);
  "vjp": jax.vjp through the XLA chain (the round-4 behavior);
  "pallas": the dgrad/wgrad kernels (`ffn_fused_bwd`) — fastest
      standalone, but 7-vs-5 gemm units and scoped-VMEM-bound in situ.
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


def _ln_bwd(grad, y_pre, g, eps):
    """Backward of LN(y_pre)*g+beta given d(out)=grad: returns
    (dy_pre, dgamma, dbeta).  All f32 row-local math."""
    grad = grad.astype(jnp.float32)
    y = y_pre.astype(jnp.float32)
    hdim = y.shape[-1]
    mu = jnp.mean(y, axis=-1, keepdims=True)
    d = y - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = d * inv
    dgamma = jnp.sum(grad * xhat, axis=0)
    dbeta = jnp.sum(grad, axis=0)
    gg = grad * g.astype(jnp.float32)
    dy = inv * (gg - jnp.mean(gg, axis=-1, keepdims=True) -
                xhat * jnp.mean(gg * xhat, axis=-1, keepdims=True))
    return dy, dgamma, dbeta


def _frl_bwd_pallas(act, eps, block_rows, block_f, interpret, resids, grad):
    """Pallas backward for the FFN+residual+LN block: recompute the pre-LN
    sum with the FUSED forward kernel (VMEM-resident intermediate), do the
    row-local LN backward in XLA (bandwidth ops), then run the dgrad/wgrad
    kernels on dy.  2 + 7 gemm-units vs the XLA chain's ~6 — the A/B
    (experiments/ffn_bwd_ab.py) decides whether the seam removal pays."""
    x, w1, b1, w2, b2, res, g, beta = resids
    interp = interpret or not _on_tpu()
    y_pre = ffn_fused(x, w1, b1, w2, b2, act=act, block_rows=block_rows,
                      block_f=block_f,
                      interpret=interp).astype(jnp.float32) + \
        res.astype(jnp.float32)
    dy, dgamma, dbeta = _ln_bwd(grad, y_pre, g, eps)
    dy = dy.astype(x.dtype)
    dx, dw1, db1, dw2, db2 = ffn_fused_bwd(
        x, dy, w1, b1, w2, act=act, block_rows=block_rows, interpret=interp)
    return (dx, dw1.astype(w1.dtype),
            None if b1 is None else db1.astype(b1.dtype),
            dw2.astype(w2.dtype),
            None if b2 is None else db2.astype(b2.dtype),
            dy.astype(res.dtype), dgamma.astype(g.dtype),
            dbeta.astype(beta.dtype))


def _frl_bwd_hand(act, eps, block_rows, block_f, interpret, resids, grad,
                  amask=None, omask=None):
    """Hand-derived backward of LN(res + drop_o(ffn_drop(x)) ) — shared by
    the no-dropout and dropout res+LN variants (the dropout ones pass the
    regenerated masks)."""
    x, w1, b1, w2, b2, res, g, beta = resids
    y = _xla_ffn_drop(x, w1, b1, w2, b2, amask, act).astype(jnp.float32) \
        if (amask is not None or omask is not None) else \
        _xla_ffn(x, w1, b1, w2, b2, act).astype(jnp.float32)
    if omask is not None:
        y = y * omask
    y_pre = res.astype(jnp.float32) + y
    dy, dgamma, dbeta = _ln_bwd(grad, y_pre, g, eps)
    g_out = dy * omask if omask is not None else dy
    dx, dw1, db1, dw2, db2 = _ffn_bwd_hand(x, w1, b1, w2, g_out, act,
                                           amask=amask)
    return (dx, dw1, db1, dw2,
            None if b2 is None else db2.astype(b2.dtype),
            dy.astype(res.dtype), dgamma.astype(g.dtype),
            dbeta.astype(beta.dtype))


def _frl_bwd_dispatch(act, eps, block_rows, block_f, interpret, resids,
                      grad):
    if _BWD_IMPL == "pallas":
        return _frl_bwd_pallas(act, eps, block_rows, block_f, interpret,
                               resids, grad)
    if _BWD_IMPL == "hand":
        return _frl_bwd_hand(act, eps, block_rows, block_f, interpret,
                             resids, grad)
    return _frl_bwd(act, eps, block_rows, block_f, interpret, resids, grad)


ffn_res_ln_trainable.defvjp(_frl_fwd, _frl_bwd_dispatch)


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


def _dense_bwd_hand(x, w, b, res, g, beta, eps, grad, omask=None):
    """Hand-derived backward of LN(res + drop(x @ w + b)); shared by the
    no-dropout and dropout dense epilogue variants (vjp of the same chain
    measured 63 vs 104 TFLOP/s — bwd_roofline.py round-5)."""
    f32 = jnp.float32
    xd = x.dtype
    y = jnp.dot(x, w.astype(xd), preferred_element_type=f32)
    if b is not None:
        y = y + b.astype(f32)
    if omask is not None:
        y = y * omask
    y_pre = res.astype(f32) + y
    dy, dgamma, dbeta = _ln_bwd(grad, y_pre, g, eps)
    g_out = dy * omask if omask is not None else dy
    g16 = g_out.astype(xd)
    dx = jax.lax.dot_general(g16, w.astype(xd), (((1,), (1,)), ((), ())),
                             preferred_element_type=xd)
    dw = jax.lax.dot_general(x, g16, (((0,), (0,)), ((), ())),
                             preferred_element_type=f32).astype(w.dtype)
    db = None if b is None else \
        jnp.sum(g_out.astype(f32), axis=0).astype(b.dtype)
    return (dx, dw, db, dy.astype(res.dtype), dgamma.astype(g.dtype),
            dbeta.astype(beta.dtype))


def _drl_bwd_dispatch(eps, block_rows, interpret, resids, grad):
    if _BWD_IMPL in ("hand", "pallas"):
        # no Pallas variant for the single-gemm epilogue: there is no
        # (N, F) intermediate to keep in VMEM — the hand formulas are the
        # whole win here
        x, w, b, res, g, beta = resids
        return _dense_bwd_hand(x, w, b, res, g, beta, eps, grad)
    return _drl_bwd(eps, block_rows, interpret, resids, grad)


dense_res_ln_trainable.defvjp(_drl_fwd, _drl_bwd_dispatch)


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


# (defvjp bound below, after _fft_bwd_dispatch — the backward is
# implementation-switched between the XLA recompute chain and the round-5
# Pallas dgrad/wgrad kernels)


# ----------------------------------------------------------------------------
# Fused FFN BACKWARD kernels (round 5, VERDICT r4 #3): Pallas dgrad + wgrad
# with the (rows, F) intermediate recomputed chunk-wise in VMEM — the same
# no-residual trade as the recompute VJP, but neither the intermediate nor
# its gradient ever touches HBM.  Two kernels because the two weight-grad
# accumulations need opposite grid orders:
#   dgrad  grid (row-tiles, f-chunks):  dx_i   += da_ij @ W1[:,j]^T
#   wgrad  grid (f-chunks, row-tiles):  dW[j]  += reductions over rows i
# FLOP trade vs the XLA-chain recompute backward (_fft_bwd): 7 gemm-units
# (dgrad recomputes fc1; wgrad recomputes fc1 + dh again) vs 5 — the win
# hypothesis is purely HBM traffic + fusion-seam removal; decided by
# measurement (experiments/bwd_roofline.py / ffn_bwd_ab.py).
# ----------------------------------------------------------------------------

def _dact_f32(name, a):
    """d/da activation(a), f32, matching _act_f32's definitions."""
    if name == "gelu":
        pdf = jnp.exp(-0.5 * a * a) * float(1.0 / math.sqrt(2 * math.pi))
        return 0.5 * (1.0 + _erf_f32(a * (1.0 / math.sqrt(2.0)))) + a * pdf
    if name == "gelu_new":
        c = math.sqrt(2.0 / math.pi)
        u = c * (a + 0.044715 * a * a * a)
        t = jnp.tanh(u)
        return 0.5 * (1.0 + t) + 0.5 * a * (1.0 - t * t) * c * \
            (1.0 + 3 * 0.044715 * a * a)
    if name == "relu":
        return (a > 0).astype(jnp.float32)
    if name == "silu":
        s = jax.nn.sigmoid(a)
        return s * (1.0 + a * (1.0 - s))
    raise ValueError(f"unsupported activation {name!r}")


def _kernel_bwd_dx(x_ref, g_ref, w1_ref, b1_ref, w2_ref, o_ref, acc_ref, *,
                   act, nj):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    a = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    a = a + b1_ref[...].astype(jnp.float32)
    dh = jax.lax.dot_general(g_ref[...], w2_ref[...],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    da = (dh * _dact_f32(act, a)).astype(x.dtype)
    acc_ref[...] += jax.lax.dot_general(
        da, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _flush():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _kernel_bwd_dw(x_ref, g_ref, w1_ref, b1_ref, w2_ref, dw1_ref, dw2_ref,
                   db1_ref, acc1_ref, acc2_ref, accb_ref, *, act, ni):
    i = pl.program_id(1)  # rows INNER so the per-chunk accs span all rows

    @pl.when(i == 0)
    def _init():
        acc1_ref[...] = jnp.zeros_like(acc1_ref)
        acc2_ref[...] = jnp.zeros_like(acc2_ref)
        accb_ref[...] = jnp.zeros_like(accb_ref)

    x = x_ref[...]
    g = g_ref[...]
    a = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    a = a + b1_ref[...].astype(jnp.float32)
    h = _act_f32(act, a).astype(x.dtype)
    dh = jax.lax.dot_general(g, w2_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    da = (dh * _dact_f32(act, a)).astype(x.dtype)
    acc1_ref[...] += jax.lax.dot_general(
        x, da, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc2_ref[...] += jax.lax.dot_general(
        h, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    accb_ref[...] += jnp.sum(da.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(i == ni - 1)
    def _flush():
        dw1_ref[...] = acc1_ref[...].astype(dw1_ref.dtype)
        dw2_ref[...] = acc2_ref[...].astype(dw2_ref.dtype)
        db1_ref[...] = accb_ref[...].astype(db1_ref.dtype)


def ffn_fused_bwd(x, g, w1, b1, w2, *, act="gelu", block_rows=256,
                  block_f=768, interpret=False):
    """Backward of y = act(x @ w1 + b1) @ w2 + b2 given dL/dy = g.
    Returns (dx, dw1, db1, dw2, db2) in f32 (weight grads) / x.dtype (dx),
    with the (rows, F) intermediate and its gradient VMEM-resident
    throughout.  block_f defaults smaller than the forward's (the wgrad
    kernel holds two (H x block_f) f32 accumulators in VMEM)."""
    n, hdim = x.shape
    fdim = w1.shape[1]
    if w1.shape != (hdim, fdim) or w2.shape != (fdim, hdim) or \
            g.shape != (n, hdim):
        raise ValueError(f"shape mismatch: x {x.shape} g {g.shape} "
                         f"w1 {w1.shape} w2 {w2.shape}")
    block_f = min(block_f, fdim)
    if hdim % 128 or fdim % block_f or block_f % 128 or n % block_rows:
        raise ValueError(f"unsupported dims N={n} H={hdim} F={fdim} "
                         f"block_f={block_f} block_rows={block_rows}")
    nj = fdim // block_f
    ni = n // block_rows
    dtype = x.dtype
    b1r = (b1 if b1 is not None else jnp.zeros((fdim,))).reshape(1, fdim)
    g = g.astype(dtype)

    dx = pl.pallas_call(
        functools.partial(_kernel_bwd_dx, act=act, nj=nj),
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((block_rows, hdim), lambda i, j: (i, 0)),
            pl.BlockSpec((block_rows, hdim), lambda i, j: (i, 0)),
            pl.BlockSpec((hdim, block_f), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_f), lambda i, j: (0, j)),
            pl.BlockSpec((block_f, hdim), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, hdim), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hdim), dtype),
        scratch_shapes=[pltpu.VMEM((block_rows, hdim), jnp.float32)],
        interpret=interpret,
    )(x, g, w1.astype(dtype), b1r.astype(jnp.float32), w2.astype(dtype))

    dw1, dw2, db1 = pl.pallas_call(
        functools.partial(_kernel_bwd_dw, act=act, ni=ni),
        grid=(nj, ni),
        in_specs=[
            pl.BlockSpec((block_rows, hdim), lambda j, i: (i, 0)),
            pl.BlockSpec((block_rows, hdim), lambda j, i: (i, 0)),
            pl.BlockSpec((hdim, block_f), lambda j, i: (0, j)),
            pl.BlockSpec((1, block_f), lambda j, i: (0, j)),
            pl.BlockSpec((block_f, hdim), lambda j, i: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((hdim, block_f), lambda j, i: (0, j)),
            pl.BlockSpec((block_f, hdim), lambda j, i: (j, 0)),
            pl.BlockSpec((1, block_f), lambda j, i: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((hdim, fdim), jnp.float32),
            jax.ShapeDtypeStruct((fdim, hdim), jnp.float32),
            jax.ShapeDtypeStruct((1, fdim), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hdim, block_f), jnp.float32),
            pltpu.VMEM((block_f, hdim), jnp.float32),
            pltpu.VMEM((1, block_f), jnp.float32),
        ],
        interpret=interpret,
    )(x, g, w1.astype(dtype), b1r.astype(jnp.float32), w2.astype(dtype))

    db2 = jnp.sum(g.astype(jnp.float32), axis=0)
    return dx, dw1, db1.reshape(fdim), dw2, db2


# module toggle: the trainable wrappers' backward implementation.
# "hand" (default) = hand-derived recompute formulas in XLA — measured 24%
#   faster than autodiff of the same chain on v5e
#   (experiments/bwd_roofline.py round-5: 2.026 vs 2.517 ms/layer-FFN at
#   flagship encoder shapes; the vjp chain re-materializes the activation
#   and derives gelu' through erf's vjp, where the hand version computes
#   dact analytically in one fused elementwise pass);
# "vjp" = jax.vjp through the XLA chain (round-4 behavior, kept for A/B);
# "pallas" = the dgrad/wgrad kernels above (TPU; interpret off-TPU in
#   tests) — 7 gemm-units vs hand's 5, kept for the measured close.
# Switched by ops.layers.set_ffn_bwd_fused / set_ffn_bwd_impl for A/B.
_BWD_IMPL = "hand"


def set_ffn_bwd_impl(impl: str):
    global _BWD_IMPL
    if impl not in ("hand", "vjp", "pallas"):
        raise ValueError(impl)
    _BWD_IMPL = impl


def _ffn_bwd_hand(x, w1, b1, w2, g_out, act, amask=None):
    """Hand-derived backward of y = drop_a(act(x @ w1 + b1)) @ w2 + b2
    given dL/dy = g_out (f32 or x.dtype).  Returns
    (dx, dw1, db1_or_None, dw2, db2) with weight grads f32-accumulated and
    cast to the primal dtypes.  amask: the {0, 1/(1-r)} activation-dropout
    mask (None = no dropout)."""
    f32 = jnp.float32
    xd = x.dtype
    a = jnp.dot(x, w1.astype(xd), preferred_element_type=f32)
    if b1 is not None:
        a = a + b1.astype(f32)
    h = _act_f32(act, a)
    dact = _dact_f32(act, a)
    if amask is not None:
        h = h * amask
        dact = dact * amask
    h = h.astype(xd)
    g16 = g_out.astype(xd)
    dh = jax.lax.dot_general(g16, w2.astype(xd), (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    da = (dh * dact).astype(xd)
    dx = jax.lax.dot_general(da, w1.astype(xd), (((1,), (1,)), ((), ())),
                             preferred_element_type=xd)
    dw1 = jax.lax.dot_general(x, da, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    dw2 = jax.lax.dot_general(h, g16, (((0,), (0,)), ((), ())),
                              preferred_element_type=f32)
    db1 = None if b1 is None else \
        jnp.sum(da.astype(f32), axis=0).astype(b1.dtype)
    db2 = jnp.sum(g_out.astype(f32), axis=0)
    return (dx, dw1.astype(w1.dtype), db1, dw2.astype(w2.dtype), db2)


def _fft_bwd_hand(act, block_rows, block_f, interpret, res, g):
    x, w1, b1, w2, b2 = res
    dx, dw1, db1, dw2, db2 = _ffn_bwd_hand(x, w1, b1, w2, g, act)
    return (dx, dw1, db1,
            dw2, None if b2 is None else db2.astype(b2.dtype))


def _fft_bwd_dispatch(act, block_rows, block_f, interpret, res, g):
    x, w1, b1, w2, b2 = res
    if _BWD_IMPL == "pallas":
        dx, dw1, db1, dw2, db2 = ffn_fused_bwd(
            x, g, w1, b1, w2, act=act, block_rows=block_rows,
            interpret=interpret or not _on_tpu())
        return (dx,
                dw1.astype(w1.dtype),
                None if b1 is None else db1.astype(b1.dtype),
                dw2.astype(w2.dtype),
                None if b2 is None else db2.astype(b2.dtype))
    if _BWD_IMPL == "hand":
        return _fft_bwd_hand(act, block_rows, block_f, interpret, res, g)
    return _fft_bwd(act, block_rows, block_f, interpret, res, g)


ffn_fused_trainable.defvjp(_fft_fwd, _fft_bwd_dispatch)


# ----------------------------------------------------------------------------
# In-kernel dropout variants (round 4): activation-/output-dropout via the
# TPU PRNG so the fused FFN + epilogue kernels engage under the
# reference-fidelity training recipe (dropout ON).  Stream layout per kernel
# call (one int32 seed, derived from the site's rng key by the dispatch):
#   act mask  at grid (i, j): stream id i * nj + j            (ids [0, ni*nj))
#   out mask  at row tile i:  stream id ni * nj + i           (ids [ni*nj, +ni))
# The backward regenerates the identical bits with `dropout_mask` (same
# grid carve-up, same seeding) and recomputes through the XLA chain.
# ----------------------------------------------------------------------------

from .flash_attention_kernel import (_dropout_scale_from_bits,
                                     _xla_dropout_mask)


def _on_tpu():
    return jax.default_backend() == "tpu"


def _seed_arr(seed):
    return jnp.asarray(seed, jnp.int32).reshape(1)


def _mask_kernel(seed_ref, o_ref, *, rate, nj, offset):
    pid = offset + pl.program_id(0) * nj + pl.program_id(1)
    pltpu.prng_seed(seed_ref[0], pid)
    o_ref[...] = _dropout_scale_from_bits(
        pltpu.prng_random_bits(o_ref.shape), rate)


def dropout_mask(seed, n, cols, rate, block_rows, block_cols, offset=0):
    """Regenerate a fused-kernel dropout mask as an (n, cols) f32 array of
    {0, 1/(1-rate)} — the exact bits the forward kernels draw, for the
    backward's XLA-chain recompute.  TPU only (callers branch per backend).
    """
    nj = cols // block_cols
    fn = pl.pallas_call(
        functools.partial(_mask_kernel, rate=rate, nj=nj, offset=offset),
        grid=(n // block_rows, nj),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((block_rows, block_cols), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n, cols), jnp.float32),
    )
    return fn(_seed_arr(seed))


def _kernel_dropout(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                    acc_ref, *, act, nj, act_rate):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    h = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = _act_f32(act, h + b1_ref[...].astype(jnp.float32))
    if act_rate > 0.0:
        pltpu.prng_seed(seed_ref[0], i * nj + j)
        h = h * _dropout_scale_from_bits(pltpu.prng_random_bits(h.shape),
                                         act_rate)
    acc_ref[...] += jax.lax.dot_general(
        h.astype(x.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _flush():
        o_ref[...] = (acc_ref[...] +
                      b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _kernel_dropout_res_ln(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                           res_ref, g_ref, beta_ref, o_ref, acc_ref, *,
                           act, ni, nj, act_rate, out_rate, eps):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    h = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = _act_f32(act, h + b1_ref[...].astype(jnp.float32))
    if act_rate > 0.0:
        pltpu.prng_seed(seed_ref[0], i * nj + j)
        h = h * _dropout_scale_from_bits(pltpu.prng_random_bits(h.shape),
                                         act_rate)
    acc_ref[...] += jax.lax.dot_general(
        h.astype(x.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _flush():
        y = acc_ref[...] + b2_ref[...].astype(jnp.float32)
        if out_rate > 0.0:
            pltpu.prng_seed(seed_ref[0], ni * nj + i)
            y = y * _dropout_scale_from_bits(
                pltpu.prng_random_bits(y.shape), out_rate)
        y = y + res_ref[...].astype(jnp.float32)
        mu = jnp.mean(y, axis=1, keepdims=True)
        d = y - mu
        var = jnp.mean(d * d, axis=1, keepdims=True)
        o_ref[...] = (d * jax.lax.rsqrt(var + eps) *
                      g_ref[...].astype(jnp.float32) +
                      beta_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _kernel_dense_dropout_res_ln(seed_ref, x_ref, w_ref, b_ref, res_ref,
                                 g_ref, beta_ref, o_ref, *, rate, eps):
    y = jax.lax.dot_general(x_ref[...], w_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b_ref[...].astype(jnp.float32)
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    y = y * _dropout_scale_from_bits(pltpu.prng_random_bits(y.shape), rate)
    y = y + res_ref[...].astype(jnp.float32)
    mu = jnp.mean(y, axis=1, keepdims=True)
    d = y - mu
    var = jnp.mean(d * d, axis=1, keepdims=True)
    o_ref[...] = (d * jax.lax.rsqrt(var + eps) *
                  g_ref[...].astype(jnp.float32) +
                  beta_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


# --- XLA twins (masked chains): the backward's recompute target AND the
# --- off-TPU forward.  Mask multiplies happen in f32 exactly where the
# --- kernels apply them.

def _xla_ffn_drop(x, w1, b1, w2, b2, amask, act):
    h = jnp.dot(x, w1.astype(x.dtype), preferred_element_type=x.dtype)
    h = h + b1.astype(x.dtype)
    h = _act_f32(act, h.astype(jnp.float32))
    if amask is not None:
        h = h * amask
    h = h.astype(x.dtype)
    y = jnp.dot(h, w2.astype(x.dtype), preferred_element_type=x.dtype)
    return y + b2.astype(x.dtype)


def _xla_ffn_drop_res_ln(x, w1, b1, w2, b2, res, g, beta, amask, omask,
                         act, eps):
    y = _xla_ffn_drop(x, w1, b1, w2, b2, amask, act).astype(jnp.float32)
    if omask is not None:
        y = y * omask
    y = res.astype(jnp.float32) + y
    mu = jnp.mean(y, axis=-1, keepdims=True)
    d = y - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    return (d * jax.lax.rsqrt(var + eps) * g.astype(jnp.float32) +
            beta.astype(jnp.float32)).astype(x.dtype)


def _xla_dense_drop_res_ln(x, w, b, res, g, beta, omask, eps):
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=x.dtype)
    y = (y + b.astype(x.dtype)).astype(jnp.float32)
    y = y * omask
    y = res.astype(jnp.float32) + y
    mu = jnp.mean(y, axis=-1, keepdims=True)
    d = y - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    return (d * jax.lax.rsqrt(var + eps) * g.astype(jnp.float32) +
            beta.astype(jnp.float32)).astype(x.dtype)


# --- public trainable ops -----------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def ffn_dropout_trainable(x, w1, b1, w2, b2, seed, act, act_rate,
                          block_rows, block_f):
    """act(x @ w1 + b1) -> inverted dropout(act_rate) -> @ w2 + b2, with the
    mask drawn in-kernel (TPU) or from a seed-derived jax.random stream
    (elsewhere).  Total VJP: backward regenerates the mask and recomputes
    through the XLA chain — no (N, F) intermediate or mask residual."""
    n, hdim = x.shape
    fdim = w1.shape[1]
    if not _on_tpu():
        return _xla_ffn_drop(x, w1, b1, w2, b2,
                             _xla_dropout_mask(seed, (n, fdim), act_rate),
                             act)
    block_f = min(block_f, fdim)
    nj = fdim // block_f
    fn = pl.pallas_call(
        functools.partial(_kernel_dropout, act=act, nj=nj,
                          act_rate=act_rate),
        grid=(n // block_rows, nj),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, hdim), lambda i, j: (i, 0)),
            pl.BlockSpec((hdim, block_f), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_f), lambda i, j: (0, j)),
            pl.BlockSpec((block_f, hdim), lambda i, j: (j, 0)),
            pl.BlockSpec((1, hdim), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, hdim), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hdim), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_rows, hdim), jnp.float32)],
    )
    dtype = x.dtype
    return fn(_seed_arr(seed), x, w1.astype(dtype),
              b1.reshape(1, fdim).astype(jnp.float32), w2.astype(dtype),
              b2.reshape(1, hdim).astype(jnp.float32))


def _fdt_fwd(x, w1, b1, w2, b2, seed, act, act_rate, block_rows, block_f):
    out = ffn_dropout_trainable(x, w1, b1, w2, b2, seed, act, act_rate,
                                block_rows, block_f)
    return out, (x, w1, b1, w2, b2, seed)


def _fdt_bwd(act, act_rate, block_rows, block_f, resids, grad):
    x, w1, b1, w2, b2, seed = resids
    n = x.shape[0]
    fdim = w1.shape[1]
    if _on_tpu():
        amask = dropout_mask(seed, n, fdim, act_rate, block_rows,
                             min(block_f, fdim))
    else:
        amask = _xla_dropout_mask(seed, (n, fdim), act_rate)
    if _BWD_IMPL != "vjp":
        dx, dw1, db1, dw2, db2 = _ffn_bwd_hand(x, w1, b1, w2, grad, act,
                                               amask=amask)
        return (dx, dw1, db1, dw2, db2.astype(b2.dtype), None)
    _, vjp = jax.vjp(
        lambda x_, w1_, b1_, w2_, b2_:
            _xla_ffn_drop(x_, w1_, b1_, w2_, b2_, amask, act),
        x, w1, b1, w2, b2)
    return (*vjp(grad.astype(x.dtype)), None)


ffn_dropout_trainable.defvjp(_fdt_fwd, _fdt_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def ffn_dropout_res_ln_trainable(x, w1, b1, w2, b2, res, g, beta, seed,
                                 act, act_rate, out_rate, eps, block_rows,
                                 block_f):
    """Post-LN FFN block with BOTH HF dropout sites in-kernel:
    LN(res + drop_out(drop_act(act(x@w1+b1)) @ w2 + b2)).  Either rate may
    be 0.0 (statically skipped).  Total VJP via mask regeneration + XLA
    recompute."""
    n, hdim = x.shape
    fdim = w1.shape[1]
    if not _on_tpu():
        amask = (_xla_dropout_mask(seed, (n, fdim), act_rate)
                 if act_rate > 0.0 else None)
        omask = (_xla_dropout_mask(seed + 1, (n, hdim), out_rate)
                 if out_rate > 0.0 else None)
        return _xla_ffn_drop_res_ln(x, w1, b1, w2, b2, res, g, beta,
                                    amask, omask, act, eps)
    block_f = min(block_f, fdim)
    nj = fdim // block_f
    ni = n // block_rows
    fn = pl.pallas_call(
        functools.partial(_kernel_dropout_res_ln, act=act, ni=ni, nj=nj,
                          act_rate=act_rate, out_rate=out_rate, eps=eps),
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
        out_shape=jax.ShapeDtypeStruct((n, hdim), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_rows, hdim), jnp.float32)],
    )
    dtype = x.dtype
    return fn(_seed_arr(seed), x, w1.astype(dtype),
              b1.reshape(1, fdim).astype(jnp.float32), w2.astype(dtype),
              b2.reshape(1, hdim).astype(jnp.float32), res.astype(dtype),
              g.reshape(1, hdim).astype(jnp.float32),
              beta.reshape(1, hdim).astype(jnp.float32))


def _fdrl_fwd(x, w1, b1, w2, b2, res, g, beta, seed, act, act_rate,
              out_rate, eps, block_rows, block_f):
    out = ffn_dropout_res_ln_trainable(x, w1, b1, w2, b2, res, g, beta,
                                       seed, act, act_rate, out_rate, eps,
                                       block_rows, block_f)
    return out, (x, w1, b1, w2, b2, res, g, beta, seed)


def _fdrl_bwd(act, act_rate, out_rate, eps, block_rows, block_f, resids,
              grad):
    x, w1, b1, w2, b2, res, g, beta, seed = resids
    n, hdim = x.shape
    fdim = w1.shape[1]
    if _on_tpu():
        bf = min(block_f, fdim)
        nj = fdim // bf
        ni = n // block_rows
        amask = (dropout_mask(seed, n, fdim, act_rate, block_rows, bf)
                 if act_rate > 0.0 else None)
        omask = (dropout_mask(seed, n, hdim, out_rate, block_rows, hdim,
                              offset=ni * nj)
                 if out_rate > 0.0 else None)
    else:
        amask = (_xla_dropout_mask(seed, (n, fdim), act_rate)
                 if act_rate > 0.0 else None)
        omask = (_xla_dropout_mask(seed + 1, (n, hdim), out_rate)
                 if out_rate > 0.0 else None)
    if _BWD_IMPL != "vjp":
        return (*_frl_bwd_hand(act, eps, block_rows, block_f, False,
                               (x, w1, b1, w2, b2, res, g, beta), grad,
                               amask=amask, omask=omask), None)
    _, vjp = jax.vjp(
        lambda x_, w1_, b1_, w2_, b2_, res_, g_, beta_:
            _xla_ffn_drop_res_ln(x_, w1_, b1_, w2_, b2_, res_, g_, beta_,
                                 amask, omask, act, eps),
        x, w1, b1, w2, b2, res, g, beta)
    return (*vjp(grad.astype(x.dtype)), None)


ffn_dropout_res_ln_trainable.defvjp(_fdrl_fwd, _fdrl_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def dense_dropout_res_ln_trainable(x, w, b, res, g, beta, seed, rate, eps,
                                   block_rows):
    """Post-LN attention epilogue with the out-projection dropout in-kernel:
    LN(res + drop(x @ w + b)).  Total VJP via mask regeneration + XLA
    recompute."""
    n, din = x.shape
    hdim = w.shape[1]
    if not _on_tpu():
        return _xla_dense_drop_res_ln(
            x, w, b, res, g, beta,
            _xla_dropout_mask(seed, (n, hdim), rate), eps)
    fn = pl.pallas_call(
        functools.partial(_kernel_dense_dropout_res_ln, rate=rate, eps=eps),
        grid=(n // block_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, din), lambda i: (i, 0)),
            pl.BlockSpec((din, hdim), lambda i: (0, 0)),
            pl.BlockSpec((1, hdim), lambda i: (0, 0)),
            pl.BlockSpec((block_rows, hdim), lambda i: (i, 0)),
            pl.BlockSpec((1, hdim), lambda i: (0, 0)),
            pl.BlockSpec((1, hdim), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, hdim), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hdim), x.dtype),
    )
    dtype = x.dtype
    return fn(_seed_arr(seed), x, w.astype(dtype),
              b.reshape(1, hdim).astype(jnp.float32), res.astype(dtype),
              g.reshape(1, hdim).astype(jnp.float32),
              beta.reshape(1, hdim).astype(jnp.float32))


def _ddrl_fwd(x, w, b, res, g, beta, seed, rate, eps, block_rows):
    out = dense_dropout_res_ln_trainable(x, w, b, res, g, beta, seed, rate,
                                         eps, block_rows)
    return out, (x, w, b, res, g, beta, seed)


def _ddrl_bwd(rate, eps, block_rows, resids, grad):
    x, w, b, res, g, beta, seed = resids
    n = x.shape[0]
    hdim = w.shape[1]
    if _on_tpu():
        omask = dropout_mask(seed, n, hdim, rate, block_rows, hdim)
    else:
        omask = _xla_dropout_mask(seed, (n, hdim), rate)
    if _BWD_IMPL != "vjp":
        return (*_dense_bwd_hand(x, w, b, res, g, beta, eps, grad,
                                 omask=omask), None)
    _, vjp = jax.vjp(
        lambda x_, w_, b_, res_, g_, beta_:
            _xla_dense_drop_res_ln(x_, w_, b_, res_, g_, beta_, omask, eps),
        x, w, b, res, g, beta)
    return (*vjp(grad.astype(x.dtype)), None)


dense_dropout_res_ln_trainable.defvjp(_ddrl_fwd, _ddrl_bwd)
