"""Fused single-query decode attention: kernel (interpret mode on CPU) must
match the XLA reference bit-for-tolerance, including padding masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechmix_tpu.ops.pallas import decode_attention as da


@pytest.mark.parametrize("t,heads,d", [(64, 12, 64), (400, 12, 64),
                                       (37, 4, 32)])
def test_kernel_matches_reference(t, heads, d):
    b = 4
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, 1, heads, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, t, heads, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, t, heads, d).astype(np.float32))
    valid = np.array([t, max(1, t // 2), max(1, t // 3), 1])
    mask = jnp.asarray(np.arange(t)[None, :] < valid[:, None])
    scale = 1.0 / np.sqrt(d)

    ref = da._reference(q, k, v, mask, scale, heads)
    got = da.decode_attention(q, k, v, mask, scale=scale, num_heads=heads,
                              force_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_kernel_bf16():
    b, t, heads, d = 2, 100, 12, 64
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(b, 1, heads, d)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, t, heads, d)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, t, heads, d)).astype(jnp.bfloat16)
    mask = jnp.ones((b, t), bool)
    scale = 1.0 / np.sqrt(d)
    ref = da._reference(q, k, v, mask, scale, heads)
    got = da.decode_attention(q, k, v, mask, scale=scale, num_heads=heads,
                              force_pallas=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_kernel_int8_kv_matches_reference():
    """int8-KV kernel variant (codes + per-(token, head) scales dequantized
    in-register) must match the XLA reference computing on the same codes —
    the rescaling is exact, so tolerance is only bf16 arithmetic."""
    b, t, heads, d = 4, 96, 12, 64
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(b, 1, heads, d).astype(np.float32))
    kf = rng.randn(b, t, heads, d).astype(np.float32)
    vf = rng.randn(b, t, heads, d).astype(np.float32)

    def quant(x):
        amax = np.abs(x).max(axis=-1)
        scale = np.maximum(amax, 1e-8) / 127.0
        codes = np.clip(np.round(x / scale[..., None]), -127, 127)
        return (jnp.asarray(codes.astype(np.int8)),
                jnp.asarray(scale.astype(np.float32)))

    k, ks = quant(kf)
    v, vs = quant(vf)
    valid = np.array([t, t // 2, t // 3, 1])
    mask = jnp.asarray(np.arange(t)[None, :] < valid[:, None])
    scale = 1.0 / np.sqrt(d)

    ref = da._reference(q, k, v, mask, scale, heads, k_scale=ks, v_scale=vs)
    got = da.decode_attention(q, k, v, mask, scale=scale, num_heads=heads,
                              force_pallas=True, k_scale=ks, v_scale=vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
