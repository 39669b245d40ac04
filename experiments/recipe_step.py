"""Reference-recipe training step timing on TPU.

The reference README trains SpeechMixEED (wav2vec2-base + bart-base,
down_scale 2) at per-device batch 3 x grad_accum 20 (README.md:32-49,
train.py:293-295) — knobs sized for its unspecified GPU.  This measures
that exact recipe's optimizer-step cost on one v5e (our grad-accum scan,
dropout ON, bf16, flash) against the batch the chip actually wants, so
RECIPES.md's "use bigger micro-batches on TPU" advice carries a number.

Arms (fresh compile each, ~5-8 min tunnel latency apiece — keep it tight):
  A. micro B=3  x GA=20  (reference recipe, 60 examples/step)
  B. micro B=32 x GA=1   (TPU-recommended flagship)
  C. micro B=30 x GA=2   (same 60 examples/step as A, chip-sized micros)

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/recipe_step.py
"""

import sys
import time

import numpy as np

import _smoke


def run_arm(name, micro_b, accum, cfg, tc_kwargs, steps=None):
    steps = _smoke.pick(12, 1) if steps is None else steps
    import jax
    import jax.numpy as jnp
    from speechmix_tpu.training import trainer as trainer_lib
    from speechmix_tpu.training.trainer import TrainConfig

    tc = TrainConfig(grad_accum=accum, **tc_kwargs)
    rows = micro_b * accum
    sec = _smoke.pick(16, 0.5)
    t_samples = cfg.encoder.aligned_samples(int(sec * 16000))
    rng = np.random.RandomState(0)
    batch = {
        "input_values": jnp.asarray(
            rng.randn(rows, t_samples).astype(np.float32) * 0.1),
        "lengths": jnp.asarray(np.full((rows,), int(sec * 16000), np.int32)),
        "labels": jnp.asarray(
            rng.randint(100, _smoke.pick(5000, 200),
                        size=(rows, 48)).astype(np.int64)),
    }
    try:
        state = trainer_lib.create_train_state(jax.random.PRNGKey(0), cfg, tc)
        step = trainer_lib.make_train_step(cfg, tc, state.params)
        state, m = step(state, batch, jnp.float32(1.0))
        float(jax.device_get(m["loss"]))
        times = []
        for _ in range(steps):
            t0 = time.perf_counter()
            state, m = step(state, batch, jnp.float32(1.0))
            float(jax.device_get(m["loss"]))
            times.append(time.perf_counter() - t0)
        t = min(times)
        print(f"{name:34s}: {t*1e3:8.1f} ms/opt-step  "
              f"{rows*sec/t:7.1f} audio-sec/s/chip", flush=True)
    except Exception as e:
        print(f"{name:34s}: FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)


def main():
    _smoke.init()
    from speechmix_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache("/root/repo/.jax_cache_tpu")

    from speechmix_tpu.config import (SPEECH_ENCODER_PRESETS,
                                      SEQ2SEQ_PRESETS, SpeechMixConfig)

    cfg = SpeechMixConfig(
        encoder=SPEECH_ENCODER_PRESETS[_smoke.enc_preset()],
        decoder=SEQ2SEQ_PRESETS[_smoke.dec_preset()], down_scale=2)
    base = dict(learning_rate=4e-5, warmup_steps=0, bf16=True,
                use_flash=True, output_dir="")

    only = sys.argv[1] if len(sys.argv) > 1 else None
    arms = _smoke.pick([
        ("A reference recipe B=3 x GA=20", 3, 20),
        ("B TPU flagship    B=32 x GA=1", 32, 1),
        ("C same tokens     B=30 x GA=2", 30, 2),
    ], [
        ("A reference recipe B=1 x GA=2", 1, 2),
        ("B TPU flagship    B=2 x GA=1", 2, 1),
    ])
    for name, b, ga in arms:
        if only and only.upper() not in name[:1]:
            continue
        run_arm(name, b, ga, cfg, base)


if __name__ == "__main__":
    main()
