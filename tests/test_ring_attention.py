"""Ring attention (sequence-parallel flash, ops/ring_attention.py).

The reference has no sequence-parallel story at all (its long-input answer
was filtering, SURVEY.md §5); ring attention is this framework's TPU-native
mechanism for time-axis sharding: K/V blocks rotate around the `seq` mesh
ring (ppermute) with online-softmax block merging — mathematically the flash
recurrence lifted from K tiles to mesh blocks, so it must be EXACT vs plain
attention (not approximately equal)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speechmix_tpu.parallel import mesh as mesh_lib
from speechmix_tpu.ops.ring_attention import (ring_attention,
                                              ring_attention_eligible)
from speechmix_tpu.ops.pallas.flash_attention_kernel import _attn_ref_fwd


def _inputs(rng, B=4, T=64, H=4, D=8):
    q = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.randn(B, T, H, D).astype(np.float32) * 0.5)
    # row 2: only 10 valid keys -> ring blocks 1..3 fully masked for it
    lengths = np.array([T, 40, 10, 33][:B])
    kv_mask = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])
    return q, k, v, kv_mask


def test_ring_forward_matches_reference(rng):
    mesh = mesh_lib.make_mesh(n_data=2, n_model=1, n_seq=4)
    q, k, v, kv_mask = _inputs(rng)
    out = ring_attention(q, k, v, kv_mask, scale=0.3, mesh=mesh)
    ref = _attn_ref_fwd(q, k, v, kv_mask, 0.3, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_ring_forward_uneven_time(rng):
    """T not divisible by n_seq: ring_attention pads T to a seq multiple
    (masked keys, sliced-off query rows) — result must still be exact."""
    mesh = mesh_lib.make_mesh(n_data=2, n_model=1, n_seq=4)
    q, k, v, kv_mask = _inputs(rng, T=50)
    out = ring_attention(q, k, v, kv_mask, scale=0.3, mesh=mesh)
    assert out.shape == q.shape
    ref = _attn_ref_fwd(q, k, v, kv_mask, 0.3, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_ring_forward_no_mask(rng):
    mesh = mesh_lib.make_mesh(n_data=2, n_model=1, n_seq=4)
    q, k, v, _ = _inputs(rng)
    out = ring_attention(q, k, v, None, scale=0.3, mesh=mesh)
    ref = _attn_ref_fwd(q, k, v, None, 0.3, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_ring_grads_match_reference(rng):
    """Differentiable end-to-end: gradients flow through scan + ppermute
    (ppermute's transpose is the inverse permutation)."""
    mesh = mesh_lib.make_mesh(n_data=2, n_model=1, n_seq=4)
    q, k, v, kv_mask = _inputs(rng)
    w = jnp.asarray(rng.randn(*q.shape).astype(np.float32) * 0.1)

    g_ring = jax.grad(lambda q, k, v: jnp.sum(
        ring_attention(q, k, v, kv_mask, scale=0.3, mesh=mesh) * w),
        argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(
        _attn_ref_fwd(q, k, v, kv_mask, 0.3, False) * w),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_ring_model_parallel_heads(rng):
    """2×2×2 mesh: heads shard over `model`, time over `seq` — same math."""
    mesh = mesh_lib.make_mesh(n_data=2, n_model=2, n_seq=2)
    q, k, v, kv_mask = _inputs(rng)
    out = ring_attention(q, k, v, kv_mask, scale=0.3, mesh=mesh)
    ref = _attn_ref_fwd(q, k, v, kv_mask, 0.3, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_ring_dropout_semantics(rng):
    """Blockwise dropout == masking the NORMALIZED prob matrix: rows of the
    effective probability matrix keep ~ (1-rate) mass in expectation, kept
    entries are scaled by 1/(1-rate), and seeded runs are deterministic."""
    mesh = mesh_lib.make_mesh(n_data=2, n_model=1, n_seq=4)
    B, T, H = 4, 64, 4       # v = I probe needs D == T
    rng2 = np.random.RandomState(1)
    q = jnp.asarray(rng2.randn(B, T, H, 64).astype(np.float32) * 0.5)
    k = jnp.asarray(rng2.randn(B, T, H, 64).astype(np.float32) * 0.5)
    v_eye = jnp.broadcast_to(jnp.eye(64, dtype=jnp.float32)[None, :, None, :],
                             (B, T, H, 64))
    rate = 0.4
    out = ring_attention(q, k, v_eye, None, scale=0.125, mesh=mesh,
                         dropout_rate=rate, dropout_seed=jnp.int32(7))
    out2 = ring_attention(q, k, v_eye, None, scale=0.125, mesh=mesh,
                          dropout_rate=rate, dropout_seed=jnp.int32(7))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # with v = I, out rows are the dropped normalized prob rows (T == D)
    p_drop = np.asarray(out)                      # (B, Tq, H, Tk=D)
    p_ref = np.asarray(jax.nn.softmax(jnp.einsum(
        "bqhd,bkhd->bqhk", q, k) * 0.125, axis=-1))
    keep = p_drop != 0
    keep_frac = keep.mean()
    assert abs(keep_frac - (1 - rate)) < 0.02
    np.testing.assert_allclose(p_drop[keep], (p_ref / (1 - rate))[keep],
                               rtol=1e-5)


def test_ring_eligibility_gate():
    mesh = mesh_lib.make_mesh(n_data=2, n_model=1, n_seq=4)
    flat = mesh_lib.make_mesh(n_data=8, n_model=1, n_seq=1)
    assert ring_attention_eligible(mesh, 4, False, False, False)
    assert not ring_attention_eligible(None, 4, False, False, False)
    assert not ring_attention_eligible(flat, 4, False, False, False)
    assert not ring_attention_eligible(mesh, 4, True, False, False)  # causal
    assert not ring_attention_eligible(mesh, 4, False, True, False)  # bias
    assert not ring_attention_eligible(mesh, 4, False, False, True)  # cache
    mesh_mp = mesh_lib.make_mesh(n_data=1, n_model=2, n_seq=4)
    assert not ring_attention_eligible(mesh_mp, 3, False, False, False)


def test_ring_train_step_remat_grad_accum(rng):
    """Ring attention composes with jax.checkpoint (encoder remat) and the
    grad-accum lax.scan: SP train step with remat + accum=2 must match the
    single-device step (ppermute's transpose under rematerialization)."""
    import dataclasses
    from speechmix_tpu.config import (SpeechMixConfig,
                                      SPEECH_ENCODER_PRESETS,
                                      SEQ2SEQ_PRESETS)
    from speechmix_tpu.training import trainer as trainer_lib
    from speechmix_tpu.training.trainer import TrainConfig, TrainState

    cfg = SpeechMixConfig(
        encoder=dataclasses.replace(SPEECH_ENCODER_PRESETS["tiny-speech"],
                                    remat=True),
        decoder=SEQ2SEQ_PRESETS["tiny-bart-bytes"], down_scale=4)
    labels = rng.randint(130, 200, size=(4, 6)).astype(np.int64)
    batch = {
        "input_values": jnp.asarray(
            rng.randn(4, 16000).astype(np.float32) * 0.1),
        "lengths": jnp.asarray(np.full((4,), 16000, np.int32)),
        "labels": jnp.asarray(labels),
    }
    base = dict(learning_rate=1e-3, warmup_steps=0, grad_accum=2,
                output_dir="")

    tc0 = TrainConfig(**base)
    s0 = trainer_lib.create_train_state(jax.random.PRNGKey(0), cfg, tc0)
    f0 = trainer_lib.make_train_step(cfg, tc0, s0.params)
    _, m0 = f0(s0, batch, jnp.float32(1.0))

    mesh = mesh_lib.make_mesh(n_data=2, n_model=1, n_seq=4)
    tc1 = TrainConfig(sequence_parallel=4, use_flash=True, **base)
    s1 = trainer_lib.create_train_state(jax.random.PRNGKey(0), cfg, tc1)
    s1 = TrainState(params=mesh_lib.shard_params(mesh, s1.params),
                    opt_state=s1.opt_state, step=s1.step)
    f1 = trainer_lib.make_train_step(cfg, tc1, s1.params, mesh=mesh)
    _, m1 = f1(s1, mesh_lib.shard_batch(mesh, batch), jnp.float32(1.0))
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                               rtol=1e-4)


def test_encoder_ring_matches_unsharded(rng, tiny_cfg):
    """Full speech encoder under seq_sharding: ring attention output must
    match the unsharded encoder bit-for-bit-ish (f32 highest precision)."""
    from speechmix_tpu.models import speech_encoder as se

    mesh = mesh_lib.make_mesh(n_data=2, n_model=1, n_seq=4)
    cfg = tiny_cfg.encoder
    params = se.init_speech_encoder(jax.random.PRNGKey(0), cfg)
    wav = jnp.asarray(rng.randn(4, 16000).astype(np.float32) * 0.1)
    lengths = jnp.asarray([16000, 12000, 8000, 4000], jnp.int32)

    ref = se.speech_encoder_apply(params, cfg, wav, lengths)

    @jax.jit
    def sharded(params, wav, lengths):
        with mesh_lib.seq_sharding(mesh):
            return se.speech_encoder_apply(params, cfg, wav, lengths)

    out = sharded(mesh_lib.shard_params(mesh, params),
                  jax.device_put(wav, mesh_lib.batch_sharding(mesh)),
                  jax.device_put(lengths, mesh_lib.batch_sharding(mesh)))
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]),
        np.asarray(ref["last_hidden_state"]), rtol=2e-5, atol=2e-5)
