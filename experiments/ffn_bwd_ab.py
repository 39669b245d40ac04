"""A/B the round-5 Pallas FFN backward kernels (VERDICT r4 #3).

ffn_kernel.ffn_fused_bwd keeps the (rows, F) intermediate AND its gradient
VMEM-resident through the whole backward (dgrad kernel: fc1-recompute + dh
+ dx in one pass; wgrad kernel: recompute + dw1/dw2/db1 accumulated across
row tiles).  FLOP trade: 7 gemm-units vs the XLA recompute chain's ~5 (the
XLA autodiff DCEs the unused fc2 forward) — so the kernels only pay if the
XLA backward runs its gemms at <= 5/7 of the kernels' rate (the round-3
forward story: the gemm+LN seams ran at 112 vs 192 TFLOP/s).

Tiers (paired, one process):
  1. standalone value_and_grad of sum(ffn(x)^2) at flagship encoder shapes
     (12800 x 768 x 3072 bf16), lax.scan x 64 inside one jit (clean
     marginal time, bwd_roofline.py methodology), XLA bwd vs Pallas bwd;
     same for the res+LN epilogue variant (_frl_bwd_pallas: fused-recompute
     + XLA LN-bwd + dgrad/wgrad).
  2. in-situ flagship train step (B=16, bf16, flash, dropout OFF so the
     non-dropout trainables engage — the dropout twins keep the XLA bwd
     until this A/B decides), toggled via layers.set_ffn_bwd_fused; losses
     must agree to bf16 tolerance (grads pinned exactly in
     tests/test_ffn_kernel.py).

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/ffn_bwd_ab.py
"""

import sys
import time

import numpy as np

import _smoke


def scan_time(body, carry0, iters, label, flops=None):
    import jax

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(lambda c, _: (body(c), None), c, None,
                            length=iters)
        return c

    out = run(carry0)
    jax.tree_util.tree_map(lambda l: l.block_until_ready(), out)
    times = []
    for _ in range(_smoke.pick(5, 1)):
        t0 = time.perf_counter()
        out = run(carry0)
        jax.tree_util.tree_map(lambda l: l.block_until_ready(), out)
        times.append(time.perf_counter() - t0)
    t = min(times) / iters
    msg = f"{label:40s}: {t*1e3:8.3f} ms/iter"
    if flops:
        msg += f"  {flops/t/1e12:6.1f} TFLOP/s"
    print(msg, flush=True)
    return t


def main():
    _smoke.init()
    import jax
    import jax.numpy as jnp

    from speechmix_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache("/root/repo/.jax_cache_tpu")

    from speechmix_tpu.ops import layers
    from speechmix_tpu.ops.pallas import ffn_kernel as fk

    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    B = int(pos[0]) if pos else _smoke.pick(16, 2)
    rows, H, F = _smoke.pick((B * 800, 768, 3072), (256, 128, 256))
    it = _smoke.pick(64, 2)
    interp = _smoke.ON
    rng = np.random.RandomState(0)
    bf = jnp.bfloat16

    x0 = jnp.asarray(rng.randn(rows, H).astype(np.float32) * 0.5, bf)
    w1 = jnp.asarray(rng.randn(H, F).astype(np.float32) * 0.02)
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = jnp.asarray(rng.randn(F, H).astype(np.float32) * 0.02)
    b2 = jnp.zeros((H,), jnp.float32)
    res0 = jnp.asarray(rng.randn(rows, H).astype(np.float32) * 0.5, bf)
    gam = jnp.ones((H,), jnp.float32)
    bet = jnp.zeros((H,), jnp.float32)
    unit = 2 * rows * H * F
    bm, bfc = _smoke.pick((256, 1536), (128, 128))

    print(f"shapes: rows={rows} H={H} F={F} bf16; iters={it}", flush=True)

    # ---- tier 1: standalone v&g --------------------------------------
    def loss_ffn(x):
        y = fk.ffn_fused_trainable(x, w1, b1, w2, b2, "gelu", bm, bfc,
                                   interp)
        return jnp.sum(y.astype(jnp.float32) ** 2) / rows

    def loss_frl(x):
        y = fk.ffn_res_ln_trainable(x, w1, b1, w2, b2, res0, gam, bet,
                                    "gelu", 1e-5, bm, bfc, interp)
        return jnp.sum(y.astype(jnp.float32) ** 2) / rows

    def vg_body(loss):
        def body(x):
            v, dx = jax.value_and_grad(loss)(x)
            return (dx + x.astype(jnp.float32) * 1e-12).astype(x.dtype)
        return body

    # fwd 2 gemms (kernel) + bwd 5 (hand/vjp recompute) or 7 (pallas)
    for name, impl, flops in (("ffn v&g, hand bwd (default)", "hand",
                               7 * unit),
                              ("ffn v&g, jax.vjp bwd (round-4)", "vjp",
                               7 * unit),
                              ("ffn v&g, Pallas bwd", "pallas", 9 * unit)):
        fk.set_ffn_bwd_impl(impl)
        try:
            scan_time(vg_body(loss_ffn), x0, it, name, flops)
        finally:
            fk.set_ffn_bwd_impl("hand")
    for name, impl, flops in (("ffn+res+LN v&g, hand bwd", "hand",
                               8 * unit),
                              ("ffn+res+LN v&g, jax.vjp bwd", "vjp",
                               8 * unit),
                              ("ffn+res+LN v&g, Pallas bwd", "pallas",
                               11 * unit)):
        fk.set_ffn_bwd_impl(impl)
        try:
            scan_time(vg_body(loss_frl), x0, it, name, flops)
        finally:
            fk.set_ffn_bwd_impl("hand")

    # ---- tier 2: in-situ train step (dropout OFF) ---------------------
    if "--standalone-only" in sys.argv:
        return

    from speechmix_tpu.config import (SPEECH_ENCODER_PRESETS,
                                      SEQ2SEQ_PRESETS, SpeechMixConfig)
    from speechmix_tpu.training import trainer as trainer_lib
    from speechmix_tpu.training.trainer import TrainConfig

    cfg = SpeechMixConfig(
        encoder=SPEECH_ENCODER_PRESETS[_smoke.enc_preset()],
        decoder=SEQ2SEQ_PRESETS[_smoke.dec_preset()], down_scale=2)
    sec = _smoke.pick(16, 0.5)
    t_samples = cfg.encoder.aligned_samples(int(sec * 16000))
    batch = {
        "input_values": jnp.asarray(
            rng.randn(B, t_samples).astype(np.float32) * 0.1),
        "lengths": jnp.asarray(np.full((B,), int(sec * 16000), np.int32)),
        "labels": jnp.asarray(
            rng.randint(100, _smoke.pick(5000, 200),
                        size=(B, 48)).astype(np.int64)),
    }
    def run_step(name, impl, dropout):
        fk.set_ffn_bwd_impl(impl)
        tc = TrainConfig(learning_rate=1e-4, warmup_steps=0, grad_accum=1,
                         bf16=True, use_flash=True, dropout=dropout,
                         output_dir="")
        try:
            state = trainer_lib.create_train_state(jax.random.PRNGKey(0),
                                                   cfg, tc)
            step = trainer_lib.make_train_step(cfg, tc, state.params)
            state, m = step(state, batch, jnp.float32(1.0))
            loss0 = float(jax.device_get(m["loss"]))
            for _ in range(2):
                state, m = step(state, batch, jnp.float32(1.0))
            jax.device_get(m["loss"])
            times = []
            for _ in range(_smoke.pick(15, 1)):
                t0 = time.perf_counter()
                state, m = step(state, batch, jnp.float32(1.0))
                jax.device_get(m["loss"])
                times.append(time.perf_counter() - t0)
            print(f"{name:40s}: {min(times)*1e3:8.1f} ms/step  "
                  f"first_loss={loss0:.6f}", flush=True)
        finally:
            fk.set_ffn_bwd_impl("hand")

    # dropout ON is the reference-fidelity recipe (the round-4 242.9 ms
    # flagship number) — the dropout-variant hand backwards are what
    # training actually pays; dropout OFF isolates the plain trainables.
    # The Pallas dgrad/wgrad arm only binds dropout-OFF (the dropout
    # variants route to hand for any non-vjp impl).
    run_step("A step dropout-ON, hand bwd (default)", "hand", True)
    run_step("B step dropout-ON, jax.vjp bwd (r4)", "vjp", True)
    run_step("C step dropout-OFF, hand bwd", "hand", False)
    run_step("D step dropout-OFF, jax.vjp bwd", "vjp", False)
    run_step("E step dropout-OFF, Pallas bwd", "pallas", False)


if __name__ == "__main__":
    main()
