"""Mask and length utilities.

The reference never builds attention masks for the speech encoder or the fused
embeddings (model.py:148,172-173; hf_model.py:397,437-445) and pads audio with
-100 (train.py:102-103) — documented as latent bugs in SURVEY.md §2.5.2.
This framework pads with zeros and threads explicit boolean masks through every
stage, which is also what TPU static-shape execution requires.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9  # large-negative for masked attention logits (safe in bf16)


def length_mask(lengths, max_len):
    """(B,) int lengths -> (B, max_len) bool mask, True at valid positions."""
    pos = jnp.arange(max_len)[None, :]
    return pos < lengths[:, None]


def downscale_lengths(lengths, downloop):
    """Lengths through `downloop` stride-2 kernel-2 convs:
    L -> floor(L/2) each time (matches Conv1d(k=2, s=2): floor((L-2)/2)+1)."""
    l = lengths
    for _ in range(downloop):
        l = l // 2
    return l


def attention_bias_from_mask(kv_mask, dtype=jnp.float32):
    """(B, S_kv) bool -> (B, 1, 1, S_kv) additive bias."""
    bias = jnp.where(kv_mask[:, None, None, :], 0.0, NEG_INF)
    return bias.astype(dtype)


def causal_attention_bias(q_len, kv_len=None, dtype=jnp.float32, offset=0):
    """(1, 1, q_len, kv_len) additive causal bias. `offset` shifts query
    positions forward (used for incremental decoding: query at absolute
    position offset+i may attend keys <= offset+i)."""
    kv_len = kv_len if kv_len is not None else q_len
    q_pos = jnp.arange(q_len)[:, None] + offset
    k_pos = jnp.arange(kv_len)[None, :]
    allowed = k_pos <= q_pos
    return jnp.where(allowed, 0.0, NEG_INF).astype(dtype)[None, None, :, :]


def combine_masks_to_bias(q_mask=None, kv_mask=None, causal=False,
                          dtype=jnp.float32):
    """Build a (B, 1, q, kv) additive attention bias from boolean masks."""
    bias = None
    if kv_mask is not None:
        bias = attention_bias_from_mask(kv_mask, dtype)
        if causal:
            bias = bias + causal_attention_bias(
                q_mask.shape[-1] if q_mask is not None else kv_mask.shape[-1],
                kv_mask.shape[-1], dtype)
    elif causal:
        if q_mask is None:
            # no mask carries a length, so the requested causal constraint
            # cannot be built — dropping it silently would run the caller's
            # attention fully bidirectional
            raise ValueError("combine_masks_to_bias(causal=True) needs "
                             "q_mask or kv_mask to size the causal bias")
        bias = causal_attention_bias(q_mask.shape[-1], dtype=dtype)
    return bias


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = -1,
                    value=0.0) -> np.ndarray:
    """Host-side: pad numpy array along axis to the next multiple."""
    size = x.shape[axis]
    target = int(np.ceil(size / multiple) * multiple) if size else multiple
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return np.pad(x, pad, constant_values=value)
