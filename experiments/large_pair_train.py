"""Large-pair training credibility run: wav2vec2-large + bart-large (725 M
params) full fine-tune on ONE v5e chip — the scale point where the
reference's recipe knobs (train.py:293-295 batch/grad-accum) meet HBM.

Measures ms/step and audio-sec/s/chip for a small config matrix
(reference-fidelity recipe: adafactor, dropout ON, bf16 compute, flash
attention auto-on; remat per arm), catching OOM as a result rather than a
crash.  Paired in one process; 20-step steady state, min reported.

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/large_pair_train.py

Publishes the PERF.md "large pair" table (ZeRO-1 section's missing measured
row).  Reference surface: README.md:32-49 recipe at large scale.
"""

import dataclasses
import sys
import time

import numpy as np

import _smoke


def run_arm(name, cfg, tc, batch, steps=None):
    steps = _smoke.pick(20, 1) if steps is None else steps
    import jax
    import jax.numpy as jnp
    from speechmix_tpu.training import trainer as trainer_lib

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
        b = batch["input_values"].shape[0]
        sec = _smoke.pick(16.0, 0.5)
        print(f"{name:32s}: {t*1e3:8.1f} ms/step  "
              f"{b*sec/t:7.1f} audio-sec/s/chip  first_loss={loss0:.4f}",
              flush=True)
        return t
    except Exception as e:
        print(f"{name:32s}: FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)
        return None


def main():
    _smoke.init()
    import jax
    import jax.numpy as jnp

    from speechmix_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache("/root/repo/.jax_cache_tpu")

    from speechmix_tpu.config import (SPEECH_ENCODER_PRESETS,
                                      SEQ2SEQ_PRESETS, SpeechMixConfig)
    from speechmix_tpu.training.trainer import TrainConfig

    enc = SPEECH_ENCODER_PRESETS[_smoke.enc_preset("wav2vec2-large")]
    dec = SEQ2SEQ_PRESETS[_smoke.dec_preset("bart-large")]
    rng = np.random.RandomState(0)
    tc = TrainConfig(learning_rate=4e-5, warmup_steps=0, grad_accum=1,
                     bf16=True, output_dir="")
    sec = _smoke.pick(16, 0.5)

    def make_batch(b):
        t_samples = enc.aligned_samples(int(sec * 16000))
        labels = rng.randint(100, _smoke.pick(5000, 200),
                             size=(b, 48)).astype(np.int64)
        return {
            "input_values": jnp.asarray(
                rng.randn(b, t_samples).astype(np.float32) * 0.1),
            "lengths": jnp.asarray(np.full((b,), int(sec * 16000), np.int32)),
            "labels": jnp.asarray(labels),
        }

    # (name, batch, remat) — each fresh shape costs ~4-8 min tunnel compile,
    # keep the matrix tight; argv picks a single arm for retry runs
    arms = _smoke.pick([
        ("B=8  no-remat", 8, False),
        ("B=8  remat", 8, True),
        ("B=16 remat", 16, True),
        ("B=32 remat", 32, True),
    ], [
        ("B=2  no-remat", 2, False),
        ("B=2  remat", 2, True),
    ])
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for name, b, remat in arms:
        if only and only not in name.replace(" ", ""):
            continue
        cfg = SpeechMixConfig(
            encoder=dataclasses.replace(enc, remat=remat),
            decoder=dataclasses.replace(dec, remat=remat),
            down_scale=2)
        run_arm(f"large {name}", cfg, tc, make_batch(b))


if __name__ == "__main__":
    main()
