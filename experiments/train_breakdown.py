"""Train-step cost breakdown: fwd / bwd / optimizer split on the flagship.

Sizes the next training-path lever after in-kernel dropout landed
(PERF.md round-4): measures, paired in one process on the flagship
recipe (B=16, dropout ON, bf16, flash, no remat),

  1. loss forward only (jit of the train loss fn)
  2. value_and_grad of the same
  3. the full train step (grad + adafactor update)

so bwd ~= (2) - (1) and optimizer+bookkeeping ~= (3) - (2).  Also times
the forward with dropout OFF (rates zeroed) for the dropout tax, and the
encoder alone, to locate where bwd time lives.

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/train_breakdown.py
"""

import sys
import time

import numpy as np

import _smoke


def bench(fn, *args, n=None):
    n = _smoke.pick(12, 1) if n is None else n
    import jax

    def ready(o):
        for leaf in jax.tree_util.tree_leaves(o):
            leaf.block_until_ready()
        return o

    ready(fn(*args))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    _smoke.init()
    import jax
    import jax.numpy as jnp

    from speechmix_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache("/root/repo/.jax_cache_tpu")

    from speechmix_tpu.config import (SPEECH_ENCODER_PRESETS,
                                      SEQ2SEQ_PRESETS, SpeechMixConfig)
    from speechmix_tpu.models import speechmix as smx
    from speechmix_tpu.models.speech_encoder import speech_encoder_apply
    from speechmix_tpu.training import trainer as trainer_lib
    from speechmix_tpu.training.trainer import TrainConfig

    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    B = int(pos[0]) if pos else _smoke.pick(16, 2)
    step_only = "--step-only" in sys.argv  # skip fwd/vg/enc compiles
    cfg = SpeechMixConfig(
        encoder=SPEECH_ENCODER_PRESETS[_smoke.enc_preset()],
        decoder=SEQ2SEQ_PRESETS[_smoke.dec_preset()], down_scale=2)
    tc = TrainConfig(learning_rate=1e-4, warmup_steps=0, grad_accum=1,
                     bf16=True, use_flash=True, output_dir="")
    sec = _smoke.pick(16, 0.5)
    t_samples = cfg.encoder.aligned_samples(int(sec * 16000))
    rng = np.random.RandomState(0)
    batch = {
        "input_values": jnp.asarray(
            rng.randn(B, t_samples).astype(np.float32) * 0.1),
        "lengths": jnp.asarray(np.full((B,), int(sec * 16000), np.int32)),
        "labels": jnp.asarray(
            rng.randint(100, _smoke.pick(5000, 200),
                        size=(B, 48)).astype(np.int64)),
    }

    state = trainer_lib.create_train_state(jax.random.PRNGKey(0), cfg, tc)
    params = state.params

    def loss_fn(params, dkey):
        out = smx.speechmix_forward(
            params, cfg, batch["input_values"], lengths=batch["lengths"],
            labels=batch["labels"], dtype=jnp.bfloat16, use_flash=True,
            dropout_rng=dkey)
        return out["loss"]

    key = jax.random.PRNGKey(7)
    t_fwd = t_vg = float("nan")
    if step_only:
        import optax  # noqa: F401  (parity with the full path)
        step = trainer_lib.make_train_step(cfg, tc, params)
        st = state
        st, m = step(st, batch, jnp.float32(1.0))
        float(jax.device_get(m["loss"]))
        times = []
        for _ in range(_smoke.pick(12, 1)):
            t0 = time.perf_counter()
            st, m = step(st, batch, jnp.float32(1.0))
            float(jax.device_get(m["loss"]))
            times.append(time.perf_counter() - t0)
        t_step = min(times)
        print(f"full train step (B={B})       : {t_step*1e3:8.1f} ms "
              f"({B*sec/t_step:7.1f} audio-sec/s/chip)", flush=True)
        return

    t_fwd = bench(jax.jit(loss_fn), params, key)
    print(f"fwd (train mode, dropout ON) : {t_fwd*1e3:8.1f} ms", flush=True)

    def loss_eval(params):
        out = smx.speechmix_forward(
            params, cfg, batch["input_values"], lengths=batch["lengths"],
            labels=batch["labels"], dtype=jnp.bfloat16, use_flash=True)
        return out["loss"]

    t_fwd_nd = bench(jax.jit(loss_eval), params)
    print(f"fwd (eval mode, dropout OFF) : {t_fwd_nd*1e3:8.1f} ms", flush=True)

    import optax

    # reduce grads to two scalars IN-graph: per-leaf block_until_ready on
    # the ~300-leaf grad pytree costs ~7 ms/leaf of tunnel round trips and
    # swamps the measurement (first attempt measured 2167 ms)
    @jax.jit
    def vg_scalar(params, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        return loss, optax.global_norm(grads)

    t_vg = bench(vg_scalar, params, key)
    print(f"value_and_grad               : {t_vg*1e3:8.1f} ms "
          f"(bwd ~ {(t_vg-t_fwd)*1e3:.1f} ms, {(t_vg-t_fwd)/t_fwd:.2f}x fwd)",
          flush=True)

    # encoder-alone BEFORE the step loop: the jitted step donates the state,
    # and `params` aliases state.params — deleted after the first step call
    # params as an ARG, not a closure: closed-over f32 params embed ~1 GB
    # of constants in the program and the tunnel compiler rejects the
    # upload (HTTP 413)
    @jax.jit
    def enc(enc_params, wav, lengths):
        return speech_encoder_apply(enc_params, cfg.encoder,
                                    wav, lengths, use_flash=True,
                                    dtype=jnp.bfloat16)["last_hidden_state"]

    t_enc = bench(enc, params["speech_encoder"], batch["input_values"],
                  batch["lengths"])
    print(f"encoder fwd alone (eval)     : {t_enc*1e3:8.1f} ms", flush=True)

    # the jitted step donates the state, so carry it (reusing one donated
    # arg crashes with INVALID_ARGUMENT on reuse of deleted buffers)
    step = trainer_lib.make_train_step(cfg, tc, params)
    st = state
    st, m = step(st, batch, jnp.float32(1.0))
    float(jax.device_get(m["loss"]))
    times = []
    for _ in range(_smoke.pick(12, 1)):
        t0 = time.perf_counter()
        st, m = step(st, batch, jnp.float32(1.0))
        float(jax.device_get(m["loss"]))
        times.append(time.perf_counter() - t0)
    t_step = min(times)
    print(f"full train step              : {t_step*1e3:8.1f} ms "
          f"(opt+bookkeeping ~ {(t_step-t_vg)*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
