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


@pytest.mark.parametrize("causal", [False, True])
def test_fused_layout_multigroup_and_padding(causal, monkeypatch):
    """Force hb < h (multiple head-group grid steps) and a non-multiple-of-8
    T so the group BlockSpec indexing and the pad/unpad paths are exercised
    — the single-group case cannot catch a wrong group index_map."""
    from speechmix_tpu.ops.pallas import flash_attention_kernel as fak
    orig = fak.pl.pallas_call
    monkeypatch.setattr(fak.pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    monkeypatch.setattr(fak, "_fused_heads_per_block",
                        lambda *a, **k: 2)      # h=4 -> n_g=2

    b, tq, tk, h, d = 2, 44, 52, 4, 64          # T % 8 != 0
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(b, tq, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, tk, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, tk, h, d).astype(np.float32))
    mask = jnp.asarray(np.arange(tk)[None, :] < np.array([[tk], [tk - 7]]))
    scale = 1.0 / math.sqrt(d)

    out = fak.flash_attention_fused_layout(
        q.reshape(b, tq, h * d), k.reshape(b, tk, h * d),
        v.reshape(b, tk, h * d), mask, heads=h, scale=scale, causal=causal)
    assert out is not None
    ref = _reference(q, k, v, mask, causal, scale)
    np.testing.assert_allclose(np.asarray(out).reshape(b, tq, h, d),
                               np.asarray(ref), rtol=2e-4, atol=2e-4)

    g = jnp.asarray(rng.randn(b, tq, h, d).astype(np.float32))
    fused = fak._flash_bwd_fused_layout(q, k, v, mask, g, scale=scale,
                                        causal=causal)
    assert fused is not None
    refg = fak._attn_ref_bwd(q, k, v, mask, scale, causal, g)
    for a, b_ in zip(fused, refg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pltpu.prng_* has no CPU interpret lowering; "
                           "the TPU run of this suite covers it (and the "
                           "identity-v probe is re-run on hardware each "
                           "round — PERF.md)")
def test_fused_dropout_fwd_bwd_mask_consistency(monkeypatch):
    """TPU check that the fused-layout dropout forward and backward
    regenerate the SAME PRNG mask (h>1, multi-group grid): recover the
    forward mask via an identity-v probe, then pin the custom-VJP grads
    against an explicit-mask reference built from the recovered mask."""
    from speechmix_tpu.ops.pallas import flash_attention_kernel as fak
    monkeypatch.setattr(fak, "_fused_heads_per_block", lambda *a, **k: 2)

    b, tq, h = 2, 16, 4
    tk = d = 128                                 # identity-v needs D == Tk
    rate, scale, seed = 0.3, 0.125, 11
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(b, tq, h, d).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(b, tk, h, d).astype(np.float32) * 0.3)
    v_eye = jnp.broadcast_to(
        jnp.eye(d, dtype=jnp.float32)[None, :, None, :], (b, tk, h, d))

    pd = fak._flash_dropout_fwd_tpu(q, k, v_eye, None, seed, scale, False,
                                    rate)
    pd = np.asarray(pd).transpose(0, 2, 1, 3)     # (B, H, Tq, Tk)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    p_ref = np.asarray(jax.nn.softmax(logits, -1))
    dmask = (pd != 0).astype(np.float32) / (1.0 - rate)
    # mask semantics: output is exactly p * dmask
    np.testing.assert_allclose(pd, p_ref * dmask, rtol=2e-4, atol=2e-5)
    keep = (pd != 0).mean()
    assert 0.6 < keep < 0.8                       # ~1 - rate

    # grads via the bwd kernel == explicit-mask autodiff reference
    v = jnp.asarray(rng.randn(b, tk, h, d).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.randn(b, tq, h, d).astype(np.float32) * 0.1)
    dmask_j = jnp.asarray(dmask)

    def loss_kernel(q, k, v):
        out = fak.flash_attention_dropout(q, k, v, None, seed, scale, False,
                                          rate)
        return jnp.sum(out * w)

    def loss_expl(q, k, v):
        p = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale, -1) * dmask_j
        return jnp.sum(jnp.einsum("bhqk,bkhd->bqhd", p, v) * w)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_expl, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)
