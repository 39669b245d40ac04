"""Flash attention kernel tests.

On CPU the Pallas TPU kernel can't run compiled; these tests exercise the
kernel in Pallas interpreter mode (semantics) so CI-on-CPU still covers the
math.  TPU runs execute the real fused kernel (see bench.py / attention's
use_flash dispatch, which is TPU-gated)."""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _reference(q, k, v, mask, causal, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, -1e9)
    if causal:
        tq, tk = q.shape[1], k.shape[1]
        cm = np.arange(tk)[None, :] <= np.arange(tq)[:, None]
        logits = jnp.where(jnp.asarray(cm)[None, None], logits, -1e9)
    return jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(logits, -1), v)


@pytest.mark.parametrize("case", [
    dict(b=1, tq=128, tk=128, h=2, d=64, causal=False),
    dict(b=2, tq=256, tk=192, h=2, d=64, causal=False),
    dict(b=1, tq=128, tk=128, h=2, d=64, causal=True),
    # force the tiled online-softmax path (long-T regime)
    dict(b=2, tq=256, tk=192, h=2, d=64, causal=False, tiled=True),
    dict(b=1, tq=128, tk=128, h=2, d=64, causal=True, tiled=True),
])
def test_flash_interpret_matches_reference(case, monkeypatch):
    from speechmix_tpu.ops.pallas import flash_attention_kernel as fak
    # run the pallas_call in interpreter mode on CPU
    orig = fak.pl.pallas_call
    monkeypatch.setattr(fak.pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    if case.get("tiled"):
        monkeypatch.setattr(fak, "_SINGLE_PASS_MAX_T", 0)

    rng = np.random.RandomState(0)
    b, tq, tk, h, d = (case["b"], case["tq"], case["tk"], case["h"],
                       case["d"])
    q = jnp.asarray(rng.randn(b, tq, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, tk, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, tk, h, d).astype(np.float32))
    mask = jnp.asarray(
        np.arange(tk)[None, :] < np.linspace(tk // 2, tk, b,
                                             dtype=int)[:, None])
    out = fak.flash_attention_masked.__wrapped__(
        q, k, v, mask, causal=case["causal"], scale=1 / math.sqrt(d))
    ref = _reference(q, k, v, mask, case["causal"], 1 / math.sqrt(d))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_trainable_grad_matches_reference(causal, monkeypatch):
    """Custom-VJP backward kernel (recompute in VMEM) == autodiff through
    the reference math, for dq/dk/dv under a padding mask."""
    from speechmix_tpu.ops.pallas import flash_attention_kernel as fak
    orig = fak.pl.pallas_call
    monkeypatch.setattr(fak.pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    # force the kernel path on CPU
    monkeypatch.setattr(fak, "_single_pass_ok", lambda tq, tk: True)

    b, tq, tk, h, d = 2, 40, 40, 2, 32
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, tq, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, tk, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, tk, h, d).astype(np.float32))
    mask = jnp.asarray(np.arange(tk)[None, :] < np.array([[tk], [tk - 9]]))
    scale = 1.0 / math.sqrt(d)
    w = jnp.asarray(rng.randn(b, tq, h, d).astype(np.float32))  # loss weights

    def loss_kernel(q, k, v):
        out = fak.flash_attention_trainable(q, k, v, mask, scale, causal)
        return jnp.sum(out * w)

    def loss_ref(q, k, v):
        out = fak._attn_ref_fwd(q, k, v, mask, scale, causal)
        return jnp.sum(out * w)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_fused_layout_kernels_match_reference(causal, monkeypatch):
    """Native-layout (B, T, H*D) forward and backward kernels (heads as
    64-lane columns in-kernel, no head transposes) == reference math."""
    from speechmix_tpu.ops.pallas import flash_attention_kernel as fak
    orig = fak.pl.pallas_call
    monkeypatch.setattr(fak.pl, "pallas_call",
                        functools.partial(orig, interpret=True))

    b, tq, tk, h, d = 2, 40, 40, 4, 64   # hb*d % 128 == 0 reachable
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, tq, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, tk, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, tk, h, d).astype(np.float32))
    mask = jnp.asarray(np.arange(tk)[None, :] < np.array([[tk], [tk - 9]]))
    scale = 1.0 / math.sqrt(d)

    # forward
    out = fak.flash_attention_fused_layout(
        q.reshape(b, tq, h * d), k.reshape(b, tk, h * d),
        v.reshape(b, tk, h * d), mask, heads=h, scale=scale, causal=causal)
    assert out is not None
    ref = _reference(q, k, v, mask, causal, scale)
    np.testing.assert_allclose(np.asarray(out).reshape(b, tq, h, d),
                               np.asarray(ref), rtol=2e-4, atol=2e-4)

    # backward
    g = jnp.asarray(rng.randn(b, tq, h, d).astype(np.float32))
    fused = fak._flash_bwd_fused_layout(q, k, v, mask, g, scale=scale,
                                        causal=causal)
    assert fused is not None
    refg = fak._attn_ref_bwd(q, k, v, mask, scale, causal, g)
    for a, b_ in zip(fused, refg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)
