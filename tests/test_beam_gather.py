"""Pallas beam-cache reorder kernel (ops/pallas/beam_gather.py).

The beam self-KV reorder — the analogue of the reference's
`_reorder_cache` (/root/reference/speechmix/hf_model.py:337-338) — has two
implementations in `generation._gather_cache`: the one-hot einsum (XLA
fallback) and the Pallas dynamic-block-index copy (TPU default).  These
tests pin the kernel (interpreter mode on CPU) against the plain gather,
the supported-shape predicate, and full beam_search equality between the
two implementations.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speechmix_tpu.ops.pallas.beam_gather import (beam_gather,
                                                  beam_gather_supported)

pytestmark = pytest.mark.quick


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(2, 8, 5, 2, 64), (3, 4, 2, 128),
                                   (1, 6, 384)])
def test_beam_gather_matches_plain_gather(shape, dtype):
    rng = np.random.RandomState(0)
    key = jnp.asarray(rng.randn(*shape), dtype)
    value = jnp.asarray(rng.randn(*shape), dtype)
    n = shape[1]
    src = jnp.asarray(rng.randint(0, n, size=(n,)), jnp.int32)
    assert beam_gather_supported(key, value)
    k_out, v_out = jax.jit(lambda k, v, s: beam_gather(k, v, s,
                                                       interpret=True))(
        key, value, src)
    np.testing.assert_array_equal(np.asarray(k_out),
                                  np.asarray(key)[:, np.asarray(src)])
    np.testing.assert_array_equal(np.asarray(v_out),
                                  np.asarray(value)[:, np.asarray(src)])


def test_beam_gather_single_tensor_mode():
    rng = np.random.RandomState(1)
    key = jnp.asarray(rng.randn(2, 4, 256), jnp.float32)
    src = jnp.asarray([3, 3, 0, 1], jnp.int32)
    out = beam_gather(key, None, src, interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(key)[:, [3, 3, 0, 1]])


def test_beam_gather_supported_predicate():
    k = jnp.zeros((2, 4, 3, 2, 64), jnp.bfloat16)     # R = 384: aligned
    assert beam_gather_supported(k, k)
    k_odd = jnp.zeros((2, 4, 3, 2, 50), jnp.bfloat16)  # R = 300: not
    assert not beam_gather_supported(k_odd, k_odd)
    assert not beam_gather_supported(k, jnp.zeros_like(k, jnp.float32))
    assert not beam_gather_supported(
        jnp.zeros((2, 4, 384), jnp.int8), jnp.zeros((2, 4, 384), jnp.int8))


def test_gather_cache_impls_agree_in_beam_search():
    """beam_search output must be identical under the einsum and pallas
    reorder implementations (interpret mode stands in for the TPU).
    max_length=8 keeps the self-KV row lane-aligned (8 * 64 = 512) so the
    forced-pallas path engages on the tiny preset."""
    from speechmix_tpu import generation as gen_lib
    from speechmix_tpu.config import SEQ2SEQ_PRESETS
    from speechmix_tpu.models import seq2seq as s2s

    dec = SEQ2SEQ_PRESETS["tiny-bart-bytes"]
    params = s2s.init_seq2seq(jax.random.PRNGKey(0), dec)
    rng = np.random.RandomState(2)
    h = jnp.asarray(rng.randn(2, 6, dec.hidden_size), jnp.float32)
    m = jnp.ones((2, 6), jnp.int32)

    def run():
        toks, lengths, scores = gen_lib.beam_search(
            params, dec, h, m, 8, num_beams=3, output_scores=True)
        return np.asarray(toks), np.asarray(scores)

    saved = gen_lib.GATHER_CACHE_IMPL
    try:
        gen_lib.GATHER_CACHE_IMPL = "einsum"
        toks_e, scores_e = run()
        gen_lib.GATHER_CACHE_IMPL = "pallas"   # interpret on CPU
        toks_p, scores_p = run()
    finally:
        gen_lib.GATHER_CACHE_IMPL = saved
    np.testing.assert_array_equal(toks_e, toks_p)
    np.testing.assert_allclose(scores_e, scores_p, rtol=1e-6)
