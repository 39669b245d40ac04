"""Dropout-capable flash attention (flash_attention_dropout).

The mask is regenerated from a seed in fwd AND bwd (in-kernel pltpu PRNG on
TPU; a seed-derived jax.random stream in the XLA fallback).  These tests are
backend-agnostic: the dropout mask is RECOVERED exactly via an identity-v
probe (v = I makes the output equal the dropped-and-scaled probability
matrix), then value and gradients are pinned against an explicit-mask
reference — so the same assertions validate the Pallas kernels when run on
TPU and the XLA fallback on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechmix_tpu.ops.pallas.flash_attention_kernel import (
    NEG_INF, flash_attention_dropout)

B, TQ, TK, H = 2, 16, 128, 1
D = TK  # identity-v probe needs D == Tk
RATE = 0.3
SCALE = 0.125


def _inputs(seed=0, masked=False):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, TQ, H, D).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(B, TK, H, D).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, TK, H, D).astype(np.float32) * 0.3)
    kv_mask = None
    if masked:
        m = np.ones((B, TK), bool)
        m[0, 100:] = False
        m[1, 90:] = False
        kv_mask = jnp.asarray(m)
    return q, k, v, kv_mask


def _probs_ref(q, k, kv_mask):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * SCALE
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, NEG_INF)
    return jax.nn.softmax(logits, axis=-1)


def _recover_dmask(q, k, kv_mask, seed):
    """v = I makes out == p * dmask; dmask entries are exactly 0 or
    1/(1-rate), so dmask = (out != 0) / (1 - rate)."""
    v_eye = jnp.broadcast_to(jnp.eye(D, dtype=jnp.float32)[None, :, None, :],
                             (B, TK, H, D))
    pd = flash_attention_dropout(q, k, v_eye, kv_mask, seed, SCALE, False,
                                 RATE)
    pd = pd.transpose(0, 2, 1, 3)  # (B, H, Tq, Tk)
    return (np.asarray(pd) != 0).astype(np.float32) / (1.0 - RATE), pd


@pytest.mark.parametrize("masked", [False, True])
def test_dropout_mask_semantics(masked):
    """Recovered mask is binary {0, 1/(1-r)}, drops ~rate of the valid
    entries, and the dropped output equals p * mask exactly."""
    q, k, v, kv_mask = _inputs(0, masked)
    dmask, pd = _recover_dmask(q, k, kv_mask, seed=7)
    p = np.asarray(_probs_ref(q, k, kv_mask))
    np.testing.assert_allclose(np.asarray(pd), p * dmask, rtol=2e-5,
                               atol=2e-6)
    # keep fraction over VALID columns only (masked columns have p == 0, so
    # their recovered mask is indistinguishable from dropped)
    valid = np.ones((B, 1, 1, TK), bool) if kv_mask is None else \
        np.asarray(kv_mask)[:, None, None, :]
    valid = np.broadcast_to(valid, dmask.shape)
    keep_frac = (dmask[valid] > 0).mean()
    assert 0.6 < keep_frac < 0.8, keep_frac  # 1-rate = 0.7 +- tolerance


def test_dropout_deterministic_and_seed_sensitive():
    q, k, v, kv_mask = _inputs(1)
    a = flash_attention_dropout(q, k, v, kv_mask, 3, SCALE, False, RATE)
    b = flash_attention_dropout(q, k, v, kv_mask, 3, SCALE, False, RATE)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = flash_attention_dropout(q, k, v, kv_mask, 4, SCALE, False, RATE)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_dropout_forward_matches_explicit_mask():
    """General-v output == (p * recovered_mask) @ v — fwd is exactly
    'dropout on the probabilities' with the seed's mask."""
    q, k, v, kv_mask = _inputs(2, masked=True)
    dmask, _ = _recover_dmask(q, k, kv_mask, seed=11)
    out = flash_attention_dropout(q, k, v, kv_mask, 11, SCALE, False, RATE)
    p = np.asarray(_probs_ref(q, k, kv_mask))
    ref = jnp.einsum("bhqk,bkhd->bqhd", jnp.asarray(p * dmask), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-5)


def test_dropout_grads_match_explicit_mask():
    """jax.grad through the custom VJP == grads of the explicit-mask
    reference (same recovered mask) for q, k, and v."""
    q, k, v, kv_mask = _inputs(3, masked=True)
    seed = 13
    dmask, _ = _recover_dmask(q, k, kv_mask, seed=seed)
    dmask = jnp.asarray(dmask)
    w = jnp.asarray(np.random.RandomState(9).randn(B, TQ, H, D)
                    .astype(np.float32))

    def loss_kernel(q, k, v):
        out = flash_attention_dropout(q, k, v, kv_mask, seed, SCALE, False,
                                      RATE)
        return jnp.sum(out * w)

    def loss_ref(q, k, v):
        p = _probs_ref(q, k, kv_mask) * dmask
        out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v)
        return jnp.sum(out * w)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5, err_msg=f"grad d{name}")


def test_dropout_mean_over_seeds_approaches_no_dropout():
    """Inverted scaling: averaging outputs over many seeds converges to the
    deterministic attention output."""
    q, k, v, kv_mask = _inputs(4)
    p = _probs_ref(q, k, kv_mask)
    ref = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v)
    acc = np.zeros_like(np.asarray(ref))
    n = 64
    for s in range(n):
        acc += np.asarray(flash_attention_dropout(
            q, k, v, kv_mask, 1000 + s, SCALE, False, RATE))
    err = np.abs(acc / n - np.asarray(ref)).mean() / \
        (np.abs(np.asarray(ref)).mean() + 1e-9)
    assert err < 0.15, err
