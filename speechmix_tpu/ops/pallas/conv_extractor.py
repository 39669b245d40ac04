"""Fused Pallas conv kernel for the wav2vec2 feature-extractor stack.

Targets the stride-2 conv layers (k in {2, 3}, Cin == Cout == 512) that
dominate extractor time — layers 1..6 of every wav2vec2 preset (reference
model.py delegates to HF Wav2Vec2FeatureEncoder; conv geometry in
config.py presets).  Measured on v5e (PERF.md): the XLA lowering runs the
stack at ~71 TFLOP/s (36% MFU) because the strided unfold can't fuse; the
two XLA-level re-formulations ("patches", "pairs") lose on HBM relayout
traffic.  This kernel keeps the unfold entirely in VMEM:

  * input tile (2*bt + halo, C) rows stream in via the standard blocked
    pipeline (the halo is a second, tiny blocked operand shifted one block
    — no manual DMA, so grid steps double-buffer automatically);
  * the stride-2 deinterleave is a VMEM reshape (2t, C) -> (t, 2C) merging
    adjacent rows into lane-concatenated pairs ("reshape" mode; "slice"
    mode uses two stride-2 sublane slices instead, kept as a Mosaic
    fallback);
  * the conv is then <= 2 MXU matmuls at the exact conv FLOP count:
      y[t] = (x[2t] ++ x[2t+1]) @ (W0; W1)  (+ x[2t+2] @ W2 when k == 3)
  * bias, optional per-layer LayerNorm (feat_extract_norm == "layer"
    configs), and exact-erf GELU run as the epilogue, f32 accumulation,
    one bf16 output write — input read once, output written once.

Physical-shape contract (static, computed in plan_stack): layer i writes
W_i * bt rows with W_i = max(ceil(t_i/bt), ceil((2*bt*ceil(t_{i+1}/bt)
+ HALO)/bt)) — i.e. at most ~2 blocks of slack beyond the logical
length, enough that the NEXT layer's blocks containing any valid output
read genuinely-written rows.  Fully-garbage trailing blocks clamp their
input block index instead (index-map min), so slack does NOT compound
2x per layer down the chain.  Garbage frames stay finite (zero-padded
chain input -> finite everywhere by induction) and are masked by the
caller's frame mask exactly like the XLA path's conv-over-padding
garbage (models/speech_encoder.extract_features).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 16  # halo block rows (bf16 sublane tile); only the first row is used

# process-wide defaults for the in-model path (extract_features doesn't
# thread kernel tuning knobs); experiments/extractor_ab.py sweeps these
_DEFAULTS = {"bt": 512, "block_b": None, "deinterleave": "reshape"}


def set_fused_conv_defaults(**kw):
    """Override kernel tuning defaults (bt, block_b, deinterleave) for
    calls that don't pass them explicitly (the extract_features path)."""
    for k, v in kw.items():
        if k not in _DEFAULTS:
            raise KeyError(k)
        _DEFAULTS[k] = v


def _erf_f32(x):
    """erf for f32, as XLA's own rational approximation (clamped |x| <= 4).

    ``jax.lax.erf`` has no Mosaic/Pallas-TPU lowering (NotImplementedError:
    "Unimplemented primitive ... erf", measured on-device 2026-08-19), so the
    kernel evaluates the same degree-(6,4) polynomial pair XLA lowers erf.f32
    to outside Pallas — agreement with lax.erf is ~1e-7 relative, far inside
    the bf16 output rounding."""
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    alpha = (-2.72614225801306e-10, 2.77068142495902e-08,
             -2.10102402082508e-06, -5.69250639462346e-05,
             -7.34990630326855e-04, -2.95459980854025e-03,
             -1.60960333262415e-02)
    beta = (-1.45660718464996e-05, -2.13374055278905e-04,
            -1.68282697438203e-03, -7.37332916720468e-03,
            -1.42647390514189e-02)
    p = jnp.float32(alpha[0])
    for c in alpha[1:]:
        p = p * x2 + jnp.float32(c)
    q = jnp.float32(beta[0])
    for c in beta[1:]:
        q = q * x2 + jnp.float32(c)
    return x * p / q


def _kernel(xa_ref, xb_ref, wa_ref, w2_ref, b_ref, g_ref, be_ref, o_ref, *,
            k, bt, cin, ln, ln_eps, deinterleave):
    """One (batch-row, time-block) program.

    xa: (Bb, 2*bt, C) input rows; xb: (Bb, HALO, C) next-block halo;
    wa: (2C, Cout) stacked taps 0..1; w2: (C, Cout) tap 2 (k == 3);
    b: (1, Cout) bias; g/be: (1, Cout) LayerNorm scale/bias (ln only);
    o: (Bb, bt, Cout).
    """
    wa = wa_ref[...]
    w2 = w2_ref[...] if k == 3 else None
    bias = b_ref[...].astype(jnp.float32)           # (1, Cout)
    bb = o_ref.shape[0]
    for b in range(bb):                               # static unroll
        xa = xa_ref[b]                                # (2bt, C)
        if deinterleave == "reshape":
            za = xa.reshape(bt, 2 * cin)              # (bt, 2C) row pairs
            acc = jax.lax.dot_general(
                za, wa, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if k == 3:
                # x[2t+2]: even rows shifted one pair; last comes from halo
                xe_s = jnp.concatenate(
                    [za[1:, :cin], xb_ref[b, :1]], axis=0)  # (bt, C)
                acc += jax.lax.dot_general(
                    xe_s, w2, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        else:                                         # "slice": stride-2 rows
            xe = jax.lax.slice(xa, (0, 0), (2 * bt, cin), (2, 1))
            xo = jax.lax.slice(xa, (1, 0), (2 * bt, cin), (2, 1))
            acc = jax.lax.dot_general(
                xe, wa[:cin], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(
                xo, wa[cin:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if k == 3:
                xe_s = jnp.concatenate([xe[1:], xb_ref[b, :1]], axis=0)
                acc += jax.lax.dot_general(
                    xe_s, w2, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        acc += bias
        if ln:
            mu = jnp.mean(acc, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(acc - mu), axis=-1, keepdims=True)
            acc = (acc - mu) * jax.lax.rsqrt(var + ln_eps)
            acc = acc * g_ref[...].astype(jnp.float32) \
                + be_ref[...].astype(jnp.float32)
        # exact-erf GELU (HF feat_extract_activation="gelu")
        y = acc * 0.5 * (1.0 + _erf_f32(acc * (1.0 / math.sqrt(2.0))))
        o_ref[b] = y.astype(o_ref.dtype)


def fused_conv_layer(x, kernel, bias, *, stride=2, w_blocks, t_valid,
                     bt=512, block_b=1, ln_params=None, ln_eps=1e-5,
                     deinterleave="reshape", interpret=False):
    """One fused conv(+LN)+GELU layer on physically padded activations.

    x: (B, P_in, C) with P_in >= 2*bt*ceil(t_valid/bt) + HALO (the valid
    blocks' read region; trailing garbage blocks clamp their reads).
    kernel: (k, C, Cout), k in {2, 3}, stride must be 2.  Returns
    (B, w_blocks*bt, Cout); rows past t_valid are garbage-but-finite.
    """
    if stride != 2:
        raise ValueError(f"fused extractor kernel is stride-2 only, "
                         f"got {stride}")
    k, cin, cout = kernel.shape
    if k not in (2, 3):
        raise ValueError(f"k must be 2 or 3, got {k}")
    b_sz, p_in, _ = x.shape
    valid_blocks = -(-t_valid // bt)
    if w_blocks < valid_blocks:
        raise ValueError(f"w_blocks {w_blocks} < ceil(t_valid/bt) "
                         f"{valid_blocks}")
    if p_in < 2 * bt * valid_blocks + HALO:
        raise ValueError(f"input physical rows {p_in} < "
                         f"{2 * bt * valid_blocks + HALO} required")
    if b_sz % block_b:
        raise ValueError(f"batch {b_sz} not a multiple of block_b {block_b}")
    dtype = x.dtype
    wa = kernel[:2].reshape(2 * cin, cout).astype(dtype)
    w2 = (kernel[2] if k == 3 else jnp.zeros((cin, cout))).astype(dtype)
    bvec = bias.reshape(1, cout).astype(jnp.float32)
    ln = ln_params is not None
    g = (ln_params["scale"] if ln else jnp.ones((cout,))) \
        .reshape(1, cout).astype(jnp.float32)
    be = (ln_params["bias"] if ln else jnp.zeros((cout,))) \
        .reshape(1, cout).astype(jnp.float32)

    grid = (b_sz // block_b, w_blocks)
    halo_blk = 2 * bt // HALO  # xb block-index stride per time block
    # trailing fully-garbage blocks (it >= valid_blocks) clamp their input
    # block index so their reads stay inside p_in without requiring the
    # previous layer to have written them (plan_stack contract)
    xa_cap = p_in // (2 * bt) - 1
    xb_cap = p_in // HALO - 1
    fn = pl.pallas_call(
        functools.partial(_kernel, k=k, bt=bt, cin=cin, ln=ln,
                          ln_eps=ln_eps, deinterleave=deinterleave),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, 2 * bt, cin),
                         lambda ib, it: (ib, jnp.minimum(it, xa_cap), 0)),
            pl.BlockSpec((block_b, HALO, cin),
                         lambda ib, it: (ib, jnp.minimum(
                             (it + 1) * halo_blk, xb_cap), 0)),
            pl.BlockSpec((2 * cin, cout), lambda ib, it: (0, 0)),
            pl.BlockSpec((cin, cout), lambda ib, it: (0, 0)),
            pl.BlockSpec((1, cout), lambda ib, it: (0, 0)),
            pl.BlockSpec((1, cout), lambda ib, it: (0, 0)),
            pl.BlockSpec((1, cout), lambda ib, it: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, bt, cout),
                               lambda ib, it: (ib, it, 0)),
        out_shape=jax.ShapeDtypeStruct((b_sz, w_blocks * bt, cout), dtype),
        interpret=interpret,
    )
    return fn(x, x, wa, w2, bvec, g, be)


def plan_stack(t_in: int, kernels, strides, bt: int = 512):
    """Static physical-shape plan for a chain of stride-2 fused layers.

    Returns (pad_in, [(t_out_i, w_blocks_i)]).  Layer i's VALID output
    blocks (those containing rows < t_i) must read genuinely-existing
    input rows: 2*bt*ceil(t_i/bt) + HALO of them.  So the chain input is
    padded to exactly that for layer 0, and each layer writes
    W_i = max(ceil(t_i/bt), ceil((2*bt*ceil(t_{i+1}/bt) + HALO)/bt))
    blocks — at most ~2 blocks of slack, non-compounding, because
    fully-garbage trailing blocks CLAMP their reads (fused_conv_layer)
    instead of propagating the requirement backward."""
    ts = []
    t = t_in
    for k, s in zip(kernels, strides):
        t = (t - k) // s + 1
        ts.append(t)
    ws = [0] * len(ts)
    ws[-1] = -(-ts[-1] // bt)
    for i in range(len(ts) - 2, -1, -1):
        need_next = 2 * bt * (-(-ts[i + 1] // bt)) + HALO
        ws[i] = max(-(-ts[i] // bt), -(-need_next // bt))
    pad_to = 2 * bt * (-(-ts[0] // bt)) + HALO
    return pad_to, list(zip(ts, ws))


def fused_conv_stack(x, layers, kernels, strides, *, bt=None, block_b=None,
                     ln_layers=False, ln_eps=1e-5, deinterleave=None,
                     interpret=False):
    """Run a chain of stride-2 conv(+LN)+GELU layers through the fused
    kernel.  x: (B, T_in, C); layers: list of param dicts with "conv"
    {kernel, bias} (+ "norm" {scale, bias} when ln_layers).  Returns
    (B, t_out_logical, C)."""
    bt = _DEFAULTS["bt"] if bt is None else bt
    deinterleave = (_DEFAULTS["deinterleave"] if deinterleave is None
                    else deinterleave)
    if block_b is None:
        block_b = _DEFAULTS["block_b"]
    if block_b is None:  # 2 batch rows/program amortizes grid overhead and
        block_b = 2 if x.shape[0] % 2 == 0 else 1  # stays within VMEM
    pad_to, plan = plan_stack(x.shape[1], kernels, strides, bt)
    if x.shape[1] < pad_to:
        x = jnp.pad(x, ((0, 0), (0, pad_to - x.shape[1]), (0, 0)))
    for layer, (t_out, w), k, s in zip(layers, plan, kernels, strides):
        ln = layer.get("norm") if ln_layers else None
        x = fused_conv_layer(
            x, layer["conv"]["kernel"].astype(x.dtype),
            layer["conv"].get("bias", jnp.zeros(x.shape[-1])),
            stride=s, w_blocks=w, t_valid=t_out, bt=bt, block_b=block_b,
            ln_params=ln, ln_eps=ln_eps, deinterleave=deinterleave,
            interpret=interpret)
    return x[:, :plan[-1][0]]


def _xla_stack(x, layers, kernels, strides, ln_layers, ln_eps):
    """Pure-XLA chain with identical logical semantics to fused_conv_stack
    (the backward-pass recompute reference)."""
    for lp, k, s in zip(layers, kernels, strides):
        y = jax.lax.conv_general_dilated(
            x, lp["conv"]["kernel"].astype(x.dtype), (s,), "VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32)
        if "bias" in lp["conv"]:
            y = y + lp["conv"]["bias"]
        if ln_layers and "norm" in lp:
            mu = jnp.mean(y, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
            y = (y - mu) * jax.lax.rsqrt(var + ln_eps)
            y = y * lp["norm"]["scale"] + lp["norm"]["bias"]
        x = jax.nn.gelu(y, approximate=False).astype(x.dtype)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def fused_conv_stack_trainable(x, layers, kernels, strides, ln_layers,
                               ln_eps, interpret):
    """fused_conv_stack with a total VJP: pallas_call has no autodiff rule,
    so the backward recomputes through the XLA chain (the extractor is
    frozen in most reference recipes — HF freeze_feature_encoder — so this
    path is rarely hot; it exists so jax.grad never errors)."""
    return fused_conv_stack(x, layers, kernels, strides,
                            ln_layers=ln_layers, ln_eps=ln_eps,
                            interpret=interpret)


def _fcst_fwd(x, layers, kernels, strides, ln_layers, ln_eps, interpret):
    out = fused_conv_stack(x, layers, kernels, strides, ln_layers=ln_layers,
                           ln_eps=ln_eps, interpret=interpret)
    return out, (x, layers)


def _fcst_bwd(kernels, strides, ln_layers, ln_eps, interpret, res, g):
    x, layers = res
    _, vjp = jax.vjp(
        lambda x_, layers_: _xla_stack(x_, layers_, kernels, strides,
                                       ln_layers, ln_eps), x, layers)
    return vjp(g.astype(x.dtype))


fused_conv_stack_trainable.defvjp(_fcst_fwd, _fcst_bwd)
