"""Multi-head attention, TPU-first.

One attention implementation serves the speech encoder (self), the text
encoder (self), and the decoder (causal self w/ KV cache + cross).  The
reference delegated all attention to HF/torch modules; here it is a pure
function over a param dict, with:

  * fp32 softmax statistics, bf16-friendly matmuls (`preferred_element_type`)
  * additive-bias masking (built by ops.masking) — padding is never attended
    (fixes reference quirk SURVEY.md §2.5.2)
  * a functional KV cache carry for incremental decoding, replacing the
    reference's mutable `self.decoder_outputs` / HF `past_key_values`
    (hf_model.py:302,354-376)
  * fused Pallas attention paths (ops/pallas/flash_attention_kernel.py,
    ops/pallas/decode_attention.py) selected with `use_flash=True` when
    shapes qualify; XLA path otherwise (and always for extra additive bias).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import layers
from .ring_attention import ring_attention, ring_attention_eligible


class KVCache(NamedTuple):
    """Functional KV cache: fixed-capacity buffers + fill index."""
    key: jnp.ndarray    # (B, capacity, H, D)
    value: jnp.ndarray  # (B, capacity, H, D)
    index: jnp.ndarray  # scalar int32, number of filled positions

    @classmethod
    def create(cls, batch, capacity, num_heads, head_dim, dtype=jnp.float32):
        z = jnp.zeros((batch, capacity, num_heads, head_dim), dtype)
        return cls(key=z, value=z, index=jnp.zeros((), jnp.int32))


def init_attention(key, q_dim, kv_dim, num_heads, head_dim, out_dim=None,
                   use_bias=True, out_features=None):
    """Projection params. q/k/v: (in, H*D); out: (H*D, out)."""
    out_dim = out_dim or q_dim
    inner = num_heads * head_dim
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q_proj": layers.init_dense(kq, q_dim, inner, use_bias),
        "k_proj": layers.init_dense(kk, kv_dim, inner, use_bias),
        "v_proj": layers.init_dense(kv, kv_dim, inner, use_bias),
        "out_proj": layers.init_dense(ko, inner, out_dim, use_bias),
    }


def _split_heads(x, num_heads):
    b, t, inner = x.shape
    return x.reshape(b, t, num_heads, inner // num_heads)


def _attend(q, k, v, bias, scale, dropout_rate=0.0, dropout_rng=None):
    """q: (B,Tq,H,D), k/v: (B,Tk,H,D), bias: (B|1, 1|H, Tq, Tk) or None.
    XLA path — arbitrary additive bias (T5 rel-pos, cache positions); the
    structured-mask fused kernels live in ops/pallas/flash_attention_kernel
    and are dispatched by attention() before reaching here."""
    dtype = q.dtype
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    probs = layers.dropout(probs, dropout_rate, dropout_rng)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                      preferred_element_type=dtype)


# The single-query decode kernel measured FASTER in isolation but SLOWER
# inside the real decode loop at speech-scale T_kv (PERF.md) — it needs its
# own opt-in (set_decode_kernel(True)) so use_flash can enable the winning
# encoder kernel without dragging this one in.
DECODE_KERNEL_ENABLED = False

# Self-attention q/k/v as ONE (Din, 3*H*D) matmul via TRACE-TIME weight
# concat.  Measured at B=128 full encoder: 479 ms fused vs 463 ms separate
# (paired, same process) — the per-call concat materializes a new weight
# tensor, DOUBLING q/k/v weight HBM traffic, which outweighs the wider
# gemm.  Default OFF; the winning form is the PRE-CONCATENATED param
# transform (utils.quantize.fuse_qkv_params -> "qkv_proj" entry below),
# which adds no traffic.




def set_decode_kernel(enabled: bool):
    """Opt into the single-query decode kernel.  TRACE-TIME switch: call it
    BEFORE the first generate()/pipeline call — jit caches (api, pipeline,
    trainer.predict) are not keyed on it, so flipping it later has no effect
    on already-compiled executables."""
    global DECODE_KERNEL_ENABLED
    DECODE_KERNEL_ENABLED = bool(enabled)


def maybe_decode_kernel(q, k, v, kv_mask, scale, num_heads, use_flash,
                        k_scale=None, v_scale=None):
    """Dispatch the fused single-query decode-attention kernel
    (ops/pallas/decode_attention.py) when eligible; None otherwise.  Shared
    by attention() (cached self-attn) and seq2seq._cross_attention
    (precomputed-K/V cross-attn) so the gating stays in one place.
    k_scale/v_scale: int8-KV dequant scales (kv_int8 path) — the kernel
    reads the int8 codes directly and dequantizes in-register."""
    if (DECODE_KERNEL_ENABLED and use_flash and q.shape[1] == 1
            and kv_mask is not None
            and jax.default_backend() == "tpu"):
        from .pallas.decode_attention import decode_attention
        return decode_attention(q, k, v, kv_mask, scale=scale,
                                num_heads=num_heads, k_scale=k_scale,
                                v_scale=v_scale)
    return None


def attention(params, x_q, x_kv=None, bias=None, kv_mask=None, causal=False,
              num_heads=None, head_dim=None, scale=None,
              cache: Optional[KVCache] = None, use_flash=False, dtype=None,
              dropout_rate=0.0, dropout_rng=None, ring_mesh=None,
              out_proj=True):
    """General MHA.

    x_q: (B, Tq, Dq).  x_kv: (B, Tk, Dk) or None for self-attention.
    Masking, two forms (combinable):
      kv_mask: (B, Tk) bool key-padding mask + `causal` flag — structured,
        lets the fused Pallas flash path run without materializing bias.
      bias: extra additive attention bias (T5 position bias, cache bias);
        forces the XLA path.
    cache: if given, new keys/values are written at cache.index and attention
      runs over the full cache capacity (bias must mask unfilled slots).
    dropout_rate/dropout_rng: attention-probability dropout (HF placement);
      works on BOTH paths — the flash path regenerates the mask in-kernel
      from a seed derived from dropout_rng (pltpu PRNG), the XLA path uses
      layers.dropout.  The two paths draw different (seeded-deterministic)
      streams; dropout is stochastic, so only per-backend determinism is
      contractual.
    ring_mesh: sequence-parallel dispatch — when the caller's activations
      have their time axis sharded over the mesh's `seq` axis
      (parallel.mesh.seq_sharding trace), non-causal self-attention runs as
      ring attention over the `seq` ring (ops/ring_attention.py) instead of
      letting XLA all-gather K/V around the contraction.
    Returns (out, new_cache).
    """
    has_dropout = dropout_rng is not None and dropout_rate > 0.0
    dtype = dtype or x_q.dtype
    x_kv = x_q if x_kv is None else x_kv
    if "qkv_proj" in params:
        fp = params["qkv_proj"]
        inner = (fp["kernel"] if "kernel" in fp
                 else fp["kernel_q"]).shape[-1] // 3
    else:
        qp = params["q_proj"]
        inner = (qp["kernel"] if "kernel" in qp
                 else qp["kernel_q"]).shape[-1]
    if num_heads is None and head_dim is None:
        # the projection width alone cannot recover the head split — a
        # silent 1-head fallback would run numerically wrong attention
        raise ValueError("attention() needs num_heads or head_dim; the "
                         "inner projection width alone is ambiguous")
    num_heads = num_heads or inner // head_dim
    head_dim = head_dim or inner // num_heads
    scale = scale if scale is not None else 1.0 / math.sqrt(head_dim)

    if "qkv_proj" in params:
        # pre-concatenated (Din, 3*H*D) kernel (quantize.fuse_qkv_params,
        # self-attention subtrees only so x_kv is x_q holds): one MXU op +
        # one activation read, no extra weight traffic.  Column-blockwise
        # identical numerics to the three separate matmuls.
        qkv = layers.dense(params["qkv_proj"], x_q, dtype)
        q, k, v = (_split_heads(part, num_heads)
                   for part in jnp.split(qkv, 3, axis=-1))
    else:
        q = _split_heads(layers.dense(params["q_proj"], x_q, dtype),
                         num_heads)
        k = _split_heads(layers.dense(params["k_proj"], x_kv, dtype),
                         num_heads)
        v = _split_heads(layers.dense(params["v_proj"], x_kv, dtype),
                         num_heads)

    new_cache = None
    if cache is not None:
        k = jax.lax.dynamic_update_slice(
            cache.key, k.astype(cache.key.dtype), (0, cache.index, 0, 0))
        v = jax.lax.dynamic_update_slice(
            cache.value, v.astype(cache.value.dtype), (0, cache.index, 0, 0))
        new_cache = KVCache(key=k, value=v,
                            index=cache.index + x_q.shape[1])
        k = k.astype(dtype)
        v = v.astype(dtype)

    # fused single-query decode path: cached incremental decoding with a
    # structured validity mask
    decode_out = None
    if bias is None and cache is not None and not causal:
        decode_out = maybe_decode_kernel(q, k, v, kv_mask, scale, num_heads,
                                         use_flash)
    if decode_out is not None:
        out = decode_out
    # sequence-parallel ring path: the time axis is sharded over the mesh's
    # `seq` axis, so K/V blocks rotate around the ring (ppermute) instead of
    # being all-gathered per layer.  Differentiable (scan + ppermute), with
    # blockwise attention-prob dropout.
    elif ring_attention_eligible(ring_mesh, num_heads, causal,
                                 bias is not None, cache is not None):
        seed = (jax.random.randint(dropout_rng, (), 0, 2**31 - 1)
                if has_dropout else None)
        out = ring_attention(
            q, k, v, kv_mask, scale=scale, mesh=ring_mesh,
            dropout_rate=float(dropout_rate) if has_dropout else 0.0,
            dropout_seed=seed)
    # fused flash path: structured masks only, no extra bias, no cache.
    # Both variants carry custom VJPs (single-pass recompute backward
    # kernels) so this path is safe under jax.grad for training.  With
    # attention dropout active, flash_attention_dropout regenerates the
    # dropout mask IN-KERNEL from a seed (pltpu PRNG) — the mask never
    # touches HBM, so the reference-fidelity dropout-on recipe gets the
    # same O(T·D)-residual memory/throughput win as the deterministic path.
    elif (use_flash and bias is None and cache is None
            and jax.default_backend() == "tpu"):
        if has_dropout:
            from .pallas.flash_attention_kernel import \
                flash_attention_dropout
            seed = jax.random.randint(dropout_rng, (), 0, 2**31 - 1)
            out = flash_attention_dropout(q, k, v, kv_mask, seed, scale,
                                          causal, float(dropout_rate))
        else:
            from .pallas.flash_attention_kernel import \
                flash_attention_trainable
            out = flash_attention_trainable(q, k, v, kv_mask, scale, causal)
    else:
        from .masking import combine_masks_to_bias
        total_bias = bias
        if kv_mask is not None or causal:
            b_sz, q_len = x_q.shape[0], x_q.shape[1]
            struct = combine_masks_to_bias(
                q_mask=jnp.ones((b_sz, q_len), bool),
                kv_mask=(kv_mask if kv_mask is not None
                         else jnp.ones((b_sz, k.shape[1]), bool)),
                causal=causal)
            total_bias = struct if total_bias is None else total_bias + struct
        out = _attend(q, k, v, total_bias, scale,
                      dropout_rate if has_dropout else 0.0, dropout_rng)
    out = out.reshape(out.shape[0], out.shape[1], num_heads * head_dim)
    if out_proj:
        out = layers.dense(params["out_proj"], out, dtype)
    # out_proj=False: the caller owns the out-projection (post-LN blocks
    # fuse it with the residual+LN epilogue — layers.dense_residual_ln_apply)
    return out, new_cache


def cache_position_bias(cache_capacity, index, q_len, dtype=jnp.float32):
    """Additive bias for cached causal decoding: query i (absolute position
    index+i) may attend cache slots <= index+i; unfilled slots are masked.
    (Causal bias over the cache capacity with the query offset — one shared
    implementation in ops/masking.py.)"""
    from .masking import causal_attention_bias
    return causal_attention_bias(q_len, cache_capacity, dtype, offset=index)
