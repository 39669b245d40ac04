"""Weight-only int8 quantization for serving.

Post-parity serving optimization (no reference equivalent): 2-D dense
kernels are stored as int8 with per-output-channel fp32 scales and
dequantized on the fly inside `ops.layers.dense`.  Weight HBM traffic drops
4x vs fp32 (2x vs bf16), which is the bottleneck of small-batch incremental
decoding.

    q_params = quantize_weights(params)          # whole pytree
    tokens = generate(q_params, cfg, ...)        # same entry points

Covered:
  * 2-D dense kernels (>= min_size elements)
  * stacked per-layer dense kernels (leading layer axis) — identified by the
    parameter NAME (q_proj/fc1/...), so bias-free T5 stacks quantize too
  * the tied LM head: shared.embedding is the largest decode-time weight
    (V x H; 50k x 768 for BART) — stored int8 with per-row scales, dequantized
    per-channel in the logits matmul and per-row at embedding lookups

Norms, biases, convs, position tables, and small kernels stay full precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# parameter names whose 3-D kernels are stacked per-layer dense weights
# (NOT convs — conv kernels live under "conv"/"pos_conv"/length_adapter
# entries and keep the (K, in, out) layout)
_STACKED_DENSE_NAMES = frozenset({
    "q_proj", "k_proj", "v_proj", "out_proj",
    "fc1", "fc2", "fc_gate", "ffn_in", "ffn_out",
    "down", "up",
})


def _quantize_kernel(w):
    """(in, out) fp kernel -> int8 kernel + (out,) scales."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=0) / 127.0  # per output channel
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def _quantize_rows(w):
    """(V, H) embedding/LM-head table -> int8 + (V,) per-row scales.
    Rows are the LM-head output channels (logits = h @ W.T)."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=1) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(wf / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_weights(params, min_size: int = 4096,
                     quantize_tied_head: bool = True):
    """Replace dense kernels with int8 + per-channel scales.

    {"kernel": W} dicts: 2-D kernels >= min_size quantize per output channel;
    3-D kernels quantize per (layer, out-channel) when the parameter name is
    a known stacked dense (see _STACKED_DENSE_NAMES — name-based, so T5's
    bias-free stacks are covered).  quantize_tied_head additionally rewrites
    {"shared": {"embedding": ...}} to int8 with per-row scales (the dominant
    small-batch decode weight; ops.layers.embed and the seq2seq LM head
    consume the quantized form)."""

    def walk(node, name=None):
        if isinstance(node, dict):
            if quantize_tied_head and name == "shared" and \
                    "embedding" in node and \
                    getattr(node["embedding"], "ndim", 0) == 2 and \
                    node["embedding"].size >= min_size:
                q, s = _quantize_rows(node["embedding"])
                out = {k: walk(v, k) for k, v in node.items()
                       if k != "embedding"}
                out["embedding_q"], out["embedding_scale"] = q, s
                return out
            if "kernel" in node and hasattr(node["kernel"], "ndim"):
                w = node["kernel"]
                quantizable = (
                    (w.ndim == 2 and w.size >= min_size) or
                    (w.ndim == 3 and w.size >= min_size and
                     name in _STACKED_DENSE_NAMES))
                if quantizable:
                    qfn = (_quantize_kernel if w.ndim == 2
                           else jax.vmap(_quantize_kernel))
                    q, s = qfn(w)
                    out = {k: walk(v, k) for k, v in node.items()
                           if k != "kernel"}
                    out["kernel_q"], out["kernel_scale"] = q, s
                    return out
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, name) for v in node]
        return node

    return walk(params)


def quantization_report(params):
    """(n_quantized_elements, n_total_elements) over the pytree."""
    n_q = n_t = 0
    for leaf in jax.tree_util.tree_leaves(params):
        if hasattr(leaf, "size"):
            n_t += leaf.size
            if leaf.dtype == jnp.int8:
                n_q += leaf.size
    return n_q, n_t


def fuse_qkv_params(params):
    """Serving-time transform: rewrite every SELF-attention subtree's
    q/k/v projections into one pre-concatenated (Din, 3*H*D) "qkv_proj"
    entry (consumed by ops.attention.attention) — one MXU matmul + one
    activation read per attention instead of three, with NO extra weight
    traffic (a trace-time concat was measured 3.5% SLOWER at B=128 because
    it re-materializes the fused weight every pass — PERF.md round 3).

    Applies to dicts named "attention" (speech encoder) and "self_attn"
    (BART/T5 stacks) — cross-attention ("encoder_attn") keeps separate
    projections because its k/v are precomputed once over the encoder
    output.  Works on stacked (L, in, out) kernels (concat on the last
    axis).  Quantized subtrees (kernel_q + per-channel scales) fuse too.
    Inverse-free: intended for inference params only (export/training use
    the unfused tree)."""

    def fuse(attn):
        names = ("q_proj", "k_proj", "v_proj")
        if not all(n in attn for n in names):
            return attn
        ps = [attn[n] for n in names]
        fused = {}
        if all("kernel" in p for p in ps):
            fused["kernel"] = jnp.concatenate(
                [p["kernel"] for p in ps], axis=-1)
        elif all("kernel_q" in p for p in ps):
            fused["kernel_q"] = jnp.concatenate(
                [p["kernel_q"] for p in ps], axis=-1)
            fused["kernel_scale"] = jnp.concatenate(
                [p["kernel_scale"] for p in ps], axis=-1)
        else:
            return attn
        if all("bias" in p for p in ps):
            fused["bias"] = jnp.concatenate([p["bias"] for p in ps],
                                            axis=-1)
        out = {k: v for k, v in attn.items() if k not in names}
        out["qkv_proj"] = fused
        return out

    def walk(node, name=None):
        if isinstance(node, dict):
            if name in ("attention", "self_attn"):
                node = fuse(node)
            return {k: (walk(v, k) if k != "qkv_proj" else v)
                    for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, name) for v in node]
        return node

    return walk(params)
