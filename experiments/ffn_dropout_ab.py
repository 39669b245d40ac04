"""A/B the in-kernel-PRNG dropout FFN/epilogue kernels in the real train step.

Round 4's dropout variants (ops/pallas/ffn_kernel.py "In-kernel dropout"
section) keep the fused FFN + residual-LN + attention-epilogue kernels
engaged under the reference-fidelity recipe (HF backbone dropout rates ON,
/root/reference/speechmix/model.py:42-47 config load) — previously a live
dropout rng forced those sites back to the XLA chain.  This script runs the
flagship training recipe (B=16, dropout ON, bf16, flash, no remat) and
compares:

  A. in-kernel dropout (default: layers.set_ffn_dropout_fused(True))
  B. dropout-fusion off (round-3 behavior: XLA chain at dropout-live sites)

plus a tier-1 standalone value_and_grad of the dropout FFN at flagship
shapes.  Losses between arms are NOT bit-equal (different mask streams by
construction); fidelity is pinned by tests/test_ffn_dropout.py — here the
step-time delta is the result.  20-step steady state, min reported, paired
in one process.

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/ffn_dropout_ab.py
"""

import sys
import time

import numpy as np

import _smoke


def run_converge(name, tc, cfg, batches, dropout_fused, steps=None):
    steps = _smoke.pick(1200, 3) if steps is None else steps
    """Memorization run over a fixed batch cycle: if the backward's mask
    regeneration mismatched the forward's in-kernel bits, the gradient
    would be wrong exactly at the dropped coordinates and this curve
    would stall/diverge vs the XLA arm."""
    import jax
    import jax.numpy as jnp
    from speechmix_tpu.ops import layers
    from speechmix_tpu.training import trainer as trainer_lib

    layers.set_ffn_dropout_fused(dropout_fused)
    try:
        state = trainer_lib.create_train_state(jax.random.PRNGKey(0), cfg, tc)
        step = trainer_lib.make_train_step(cfg, tc, state.params)
        losses = []
        for i in range(steps):
            state, m = step(state, batches[i % len(batches)],
                            jnp.float32(1.0))
            if (i + 1) % 200 == 0 or i == 0:
                losses.append(float(jax.device_get(m["loss"])))
                print(f"{name}: step {i+1:5d} loss {losses[-1]:.4f}",
                      flush=True)
        return losses
    finally:
        layers.set_ffn_dropout_fused(True)


def run_variant(name, tc, cfg, batch, dropout_fused, steps=None):
    steps = _smoke.pick(20, 1) if steps is None else steps
    import jax
    import jax.numpy as jnp
    from speechmix_tpu.ops import layers
    from speechmix_tpu.training import trainer as trainer_lib

    layers.set_ffn_dropout_fused(dropout_fused)
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
        print(f"{name:36s}: {t*1e3:8.1f} ms/step  first_loss={loss0:.6f}",
              flush=True)
        return t, loss0
    finally:
        layers.set_ffn_dropout_fused(True)


def tier1(B=128):
    """Standalone dropout-FFN value_and_grad at flagship encoder shapes."""
    import jax
    import jax.numpy as jnp
    from speechmix_tpu.ops import layers

    h, f, rows = _smoke.pick((768, 3072, B * 800), (256, 512, 256))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(rows, h).astype(np.float32) * 0.5, jnp.bfloat16)
    p1 = {"kernel": jnp.asarray(rng.randn(h, f).astype(np.float32) * 0.02),
          "bias": jnp.zeros((f,), jnp.float32)}
    p2 = {"kernel": jnp.asarray(rng.randn(f, h).astype(np.float32) * 0.02),
          "bias": jnp.zeros((h,), jnp.float32)}
    key = jax.random.PRNGKey(3)

    def loss(p1, p2, x, fused):
        layers.set_ffn_dropout_fused(fused)
        try:
            y = layers.ffn_apply(p1, p2, x, "gelu", jnp.bfloat16,
                                 act_rng=key, act_dropout=0.1)
        finally:
            layers.set_ffn_dropout_fused(True)
        return jnp.sum(y.astype(jnp.float32) ** 2) / rows

    for fused, tag in ((True, "in-kernel dropout"), (False, "XLA chain")):
        g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)),
                    static_argnames=("fused",))

        def run():
            out = g(p1, p2, x, fused=fused)
            for leaf in jax.tree_util.tree_leaves(out):
                leaf.block_until_ready()
            return out

        run()
        times = []
        for _ in range(_smoke.pick(8, 1)):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        t = min(times)
        flops = 3 * 2 * 2 * rows * h * f  # fwd + bwd(dx, dw) gemms
        print(f"[tier1] {tag:20s}: {t*1e3:8.2f} ms v+g  "
              f"{flops/t/1e12:6.1f} TFLOP/s", flush=True)


def main():
    _smoke.init()
    import jax
    import jax.numpy as jnp

    from speechmix_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache("/root/repo/.jax_cache_tpu")

    from speechmix_tpu.config import (SPEECH_ENCODER_PRESETS,
                                      SEQ2SEQ_PRESETS, SpeechMixConfig)
    from speechmix_tpu.training.trainer import TrainConfig

    if "--converge" not in sys.argv:
        tier1()

    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    B = int(pos[0]) if pos else _smoke.pick(16, 2)
    cfg = SpeechMixConfig(
        encoder=SPEECH_ENCODER_PRESETS[_smoke.enc_preset()],
        decoder=SEQ2SEQ_PRESETS[_smoke.dec_preset()], down_scale=2)
    sec = _smoke.pick(16, 0.5)
    t_samples = cfg.encoder.aligned_samples(int(sec * 16000))
    rng = np.random.RandomState(0)
    vmax = _smoke.pick(5000, 200)
    labels = rng.randint(100, vmax, size=(B, 48)).astype(np.int64)
    batch = {
        "input_values": jnp.asarray(
            rng.randn(B, t_samples).astype(np.float32) * 0.1),
        "lengths": jnp.asarray(np.full((B,), int(sec * 16000), np.int32)),
        "labels": jnp.asarray(labels),
    }
    base = dict(learning_rate=1e-4, warmup_steps=0, grad_accum=1,
                bf16=True, use_flash=True, output_dir="")

    if "--converge" in sys.argv:
        # flagship-scale memorization A/B (8 fixed batches, lr 3e-4): the
        # two arms draw DIFFERENT masks by construction, so curves track
        # within dropout noise rather than matching bitwise
        batches = []
        for k in range(8):
            r = np.random.RandomState(100 + k)
            batches.append({
                "input_values": jnp.asarray(
                    r.randn(B, t_samples).astype(np.float32) * 0.1),
                "lengths": batch["lengths"],
                "labels": jnp.asarray(
                    r.randint(100, vmax, size=(B, 48)).astype(np.int64)),
            })
        cbase = dict(base, learning_rate=3e-4)
        la = run_converge("A fused", TrainConfig(**cbase), cfg, batches,
                          True)
        lb = run_converge("B xla  ", TrainConfig(**cbase), cfg, batches,
                          False)
        print("A curve:", [round(x, 4) for x in la], flush=True)
        print("B curve:", [round(x, 4) for x in lb], flush=True)
        return

    t_a, _ = run_variant("A in-kernel dropout (default)",
                         TrainConfig(**base), cfg, batch, dropout_fused=True)
    t_b, _ = run_variant("B dropout-fusion off (round-3)",
                         TrainConfig(**base), cfg, batch, dropout_fused=False)
    print(f"in-kernel dropout win: {t_b/t_a:0.3f}x "
          f"({(t_b-t_a)*1e3:+.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
