"""A/B the native-layout backward flash kernels in the real train step.

The fwd fused-layout kernel win is live (PERF.md round-3: headline RTFx
3375); the bwd + dropout twins (commit e33cfc3) are CPU-pinned but were
never TPU-validated — this script runs the reference-fidelity training
recipe (flagship, B=16, dropout ON, bf16, no remat) and compares:

  A. default dispatch (fused-layout bwd when constraints allow)
  B. transposed bwd forced (monkeypatched _flash_bwd_fused_layout -> None)
  C. XLA attention (use_flash=False) for the ledger's baseline column

Run on the TPU, alone:

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/train_step_ab.py

Loss between A and B must agree (same fwd kernel, same dropout streams);
the step-time delta is the bwd-kernel win.  20-step steady state, min
reported, paired in one process.
"""

import sys
import time

import numpy as np

import _smoke


def run_variant(name, tc, cfg, batch, force_transposed=False, steps=None):
    steps = _smoke.pick(20, 1) if steps is None else steps
    import jax
    import jax.numpy as jnp
    from speechmix_tpu.ops.pallas import flash_attention_kernel as fk
    from speechmix_tpu.training import trainer as trainer_lib

    saved = fk._flash_bwd_fused_layout
    if force_transposed:
        fk._flash_bwd_fused_layout = \
            lambda *a, **kw: None  # force the (B*H, T, D) transposed kernel
    try:
        state = trainer_lib.create_train_state(jax.random.PRNGKey(0), cfg, tc)
        step = trainer_lib.make_train_step(cfg, tc, state.params)
        state, m = step(state, batch, jnp.float32(1.0))  # compile+warm
        loss0 = float(jax.device_get(m["loss"]))
        for _ in range(2):
            state, m = step(state, batch, jnp.float32(1.0))
        jax.device_get(m["loss"])
        times = []
        for _ in range(steps):
            t0 = time.perf_counter()
            state, m = step(state, batch, jnp.float32(1.0))
            jax.device_get(m["loss"])
            times.append(time.perf_counter() - t0)
        t = min(times)
        print(f"{name:28s}: {t*1e3:8.1f} ms/step  first_loss={loss0:.6f}",
              flush=True)
        return t, loss0
    finally:
        fk._flash_bwd_fused_layout = saved


def main():
    _smoke.init()
    import jax
    import jax.numpy as jnp

    from speechmix_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache("/root/repo/.jax_cache_tpu")

    from speechmix_tpu.config import (SPEECH_ENCODER_PRESETS,
                                      SEQ2SEQ_PRESETS, SpeechMixConfig)
    from speechmix_tpu.training.trainer import TrainConfig

    B = int(sys.argv[1]) if len(sys.argv) > 1 else _smoke.pick(16, 2)
    cfg = SpeechMixConfig(
        encoder=SPEECH_ENCODER_PRESETS[_smoke.enc_preset()],
        decoder=SEQ2SEQ_PRESETS[_smoke.dec_preset()], down_scale=2)
    sec = _smoke.pick(16, 0.5)
    t_samples = cfg.encoder.aligned_samples(int(sec * 16000))
    rng = np.random.RandomState(0)
    labels = rng.randint(100, _smoke.pick(5000, 200),
                         size=(B, 48)).astype(np.int64)
    batch = {
        "input_values": jnp.asarray(
            rng.randn(B, t_samples).astype(np.float32) * 0.1),
        "lengths": jnp.asarray(np.full((B,), int(sec * 16000), np.int32)),
        "labels": jnp.asarray(labels),
    }
    base = dict(learning_rate=1e-4, warmup_steps=0, grad_accum=1,
                bf16=True, output_dir="")

    t_a, l_a = run_variant("A fused-layout bwd (default)",
                           TrainConfig(use_flash=True, **base), cfg, batch)
    t_b, l_b = run_variant("B transposed bwd (forced)",
                           TrainConfig(use_flash=True, **base), cfg, batch,
                           force_transposed=True)
    rel = abs(l_a - l_b) / max(abs(l_a), 1e-9)
    print(f"loss agreement A vs B: rel={rel:.2e} "
          f"({'OK' if rel < 1e-3 else 'MISMATCH'})", flush=True)
    print(f"bwd-kernel win: {t_b/t_a:0.3f}x "
          f"({(t_b-t_a)*1e3:+.1f} ms/step)", flush=True)
    try:
        run_variant("C XLA attention", TrainConfig(use_flash=False, **base),
                    cfg, batch)
    except Exception as e:
        print(f"C XLA attention: FAILED {type(e).__name__}: "
              f"{str(e)[:160]} (expected OOM at B=16 no-remat)", flush=True)


if __name__ == "__main__":
    main()
