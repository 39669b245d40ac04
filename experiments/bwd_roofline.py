"""Training-backward roofline + A/B (VERDICT r4 #3).

Round 4 accounted the flagship train step (242.9 ms, B=16, dropout ON) and
found bwd ~= 172 ms = 1.95x fwd — but never decomposed WHERE bwd time goes
or whether the two ~112 TFLOP/s gemm+LN seams the forward kernels fixed
(PERF.md round-3 roofline) also exist in the backward.  This harness
answers that with three tiers, paired in one process:

  tier 0/1 — standalone decomposition at flagship encoder-FFN shapes
    (rows = B*800 = 12800, H = 768, F = 3072, bf16).  Each gemm species of
    the FFN backward is timed as a lax.scan of 8 chained iterations inside
    ONE jit — the per-call tunnel overhead (~29 ms round-3 measured) is
    paid once and the per-iteration marginal time is clean.  Species:
      fc1      a  = x @ w1            (the recompute gemm)
      dh       dh = g @ w2^T          (dgrad, transposed-B)
      dx       dx = da @ w1^T         (dgrad, transposed-B)
      dw2      dw2 = h^T @ g          (wgrad, rows-contracted)
      dw1      dw1 = x^T @ da         (wgrad, rows-contracted)
    plus composites: the hand-written recompute backward (5 gemms — what
    _fft_bwd effectively runs), jax.vjp of the XLA FFN chain, and the
    saved-residual backward (4 gemms — the recompute-free alternative).

  tier 2 — the LN seams: jax.vjp through _xla_ffn_res_ln (FFN+residual+LN)
    and _xla_dense_res_ln (out-proj+residual+LN) vs their LN-free
    counterparts — does the LN backward deoptimize the adjacent gemms the
    way the LN forward did (round-3: 112 vs 192 TFLOP/s)?

  tier 3 — in-situ value_and_grad of the flagship loss (B=16, dropout ON,
    bf16, flash, no remat), paired:
      A. default dispatch (fused fwd kernels + recompute VJPs)
      B. XLA everything (set_ffn_fused(False), both epilogues off) — XLA
         autodiff stores residuals instead of recomputing, so A vs B (after
         subtracting the fwd difference) bounds what the custom-VJP
         recompute structure costs in the backward.
    fwd-only is timed per arm so bwd = v&g - fwd is comparable.

Reference surface: the training step the reference outsources to torch
autograd (/root/reference/train.py:315-330).

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/bwd_roofline.py
"""

import sys
import time

import numpy as np

import _smoke


def scan_time(body, carry0, iters=8, label="", flops_per_iter=None):
    """Time jit(scan(body, carry0, length=iters)) end-to-end and report
    t_total/iters.  iters must be LARGE (64 in the default run): the
    tunnel's fixed per-call overhead (~29 ms round-3 measured, ~2.5-3.5 ms
    observed on this path) is amortized 1/iters — the first run of this
    harness at iters=8 put ~3.5 ms on every row, the same order as the
    gemms under measurement, and was discarded."""
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
    msg = f"{label:34s}: {t*1e3:8.3f} ms/iter"
    if flops_per_iter:
        msg += f"  {flops_per_iter/t/1e12:6.1f} TFLOP/s"
    print(msg, flush=True)
    return t


def main():
    _smoke.init()
    import jax
    import jax.numpy as jnp

    from speechmix_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache("/root/repo/.jax_cache_tpu")

    from speechmix_tpu.ops.pallas import ffn_kernel as fk

    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    B = int(pos[0]) if pos else _smoke.pick(16, 2)
    rows, H, F = _smoke.pick((B * 800, 768, 3072), (256, 128, 256))
    it = _smoke.pick(64, 2)
    rng = np.random.RandomState(0)
    bf = jnp.bfloat16

    def arr(*s, scale=0.05):
        return jnp.asarray(rng.randn(*s).astype(np.float32) * scale, bf)

    x0 = arr(rows, H)
    g0 = arr(rows, H)
    w1 = arr(H, F, scale=0.02)
    b1 = jnp.zeros((F,), jnp.float32)
    w2 = arr(F, H, scale=0.02)
    b2 = jnp.zeros((H,), jnp.float32)
    da0 = arr(rows, F)
    h0 = arr(rows, F)
    unit = 2 * rows * H * F  # FLOPs of one (rows,H)x(H,F) gemm

    def feed(x, *outs):
        """Keep every output live via a scalar that perturbs the carry."""
        s = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
        return (x.astype(jnp.float32) * (1.0 + 1e-12 * s)).astype(x.dtype)

    print(f"shapes: rows={rows} H={H} F={F} bf16; gemm unit "
          f"{unit/1e9:.1f} GFLOP; iters={it}", flush=True)

    # ---- tier 0/1: gemm species --------------------------------------
    scan_time(lambda x: feed(x, jnp.dot(x, w1, preferred_element_type=bf)),
              x0, it, "fc1  x@w1 (recompute gemm)", unit)
    scan_time(lambda x: feed(x, jax.lax.dot_general(
        x, w2, (((1,), (1,)), ((), ())), preferred_element_type=bf)),
        g0, it, "dh   g@w2^T (dgrad)", unit)
    scan_time(lambda x: feed(x, jax.lax.dot_general(
        (da0.astype(jnp.float32) * (1 + 1e-12 * jnp.sum(
            x.astype(jnp.float32)))).astype(bf), w1,
        (((1,), (1,)), ((), ())), preferred_element_type=bf)),
        x0, it, "dx   da@w1^T (dgrad)", unit)
    scan_time(lambda x: feed(x, jax.lax.dot_general(
        (h0.astype(jnp.float32) * (1 + 1e-12 * jnp.sum(
            x.astype(jnp.float32)))).astype(bf), g0,
        (((0,), (0,)), ((), ())), preferred_element_type=bf)),
        x0, it, "dw2  h^T@g (wgrad)", unit)
    scan_time(lambda x: feed(x, jax.lax.dot_general(
        x, da0, (((0,), (0,)), ((), ())), preferred_element_type=bf)),
        x0, it, "dw1  x^T@da (wgrad)", unit)

    # composites
    def bwd_recompute(x, g):
        a = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
        h = fk._act_f32("gelu", a).astype(bf)
        dh = jax.lax.dot_general(g, w2, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # d/da gelu(a) (exact erf form)
        pdf = jnp.exp(-0.5 * a * a) * (1.0 / np.sqrt(2 * np.pi))
        dact = 0.5 * (1.0 + fk._erf_f32(a * (1.0 / np.sqrt(2.0)))) + a * pdf
        da = (dh * dact).astype(bf)
        dx = jax.lax.dot_general(da, w1, (((1,), (1,)), ((), ())),
                                 preferred_element_type=bf)
        dw2 = jax.lax.dot_general(h, g, (((0,), (0,)), ((), ())),
                                  preferred_element_type=bf)
        dw1 = jax.lax.dot_general(x, da, (((0,), (0,)), ((), ())),
                                  preferred_element_type=bf)
        return dx, dw1, dw2

    scan_time(lambda x: feed(x, *bwd_recompute(x, g0)), x0, it,
              "bwd recompute (5 gemms, hand)", 5 * unit)

    def bwd_saved(x, g):
        a = (da0.astype(jnp.float32) * 20.0)  # stand-in saved pre-act
        h = h0
        dh = jax.lax.dot_general(g, w2, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        pdf = jnp.exp(-0.5 * a * a) * (1.0 / np.sqrt(2 * np.pi))
        dact = 0.5 * (1.0 + fk._erf_f32(a * (1.0 / np.sqrt(2.0)))) + a * pdf
        da = (dh * dact).astype(bf)
        dx = jax.lax.dot_general(da, w1, (((1,), (1,)), ((), ())),
                                 preferred_element_type=bf)
        dw2 = jax.lax.dot_general(h, g, (((0,), (0,)), ((), ())),
                                  preferred_element_type=bf)
        dw1 = jax.lax.dot_general(x, da, (((0,), (0,)), ((), ())),
                                  preferred_element_type=bf)
        return dx, dw1, dw2

    scan_time(lambda x: feed(x, *bwd_saved(x, g0)), x0, it,
              "bwd saved-resid (4 gemms, hand)", 4 * unit)

    def vjp_ffn(x, g):
        _, vjp = jax.vjp(
            lambda x_, w1_, w2_: fk._xla_ffn(x_, w1_, b1, w2_, b2, "gelu"),
            x, w1, w2)
        return vjp(g)

    scan_time(lambda x: feed(x, *vjp_ffn(x, g0)), x0, it,
              "jax.vjp XLA ffn (prod bwd path)", 5 * unit)

    # ---- tier 2: the LN-backward seams -------------------------------
    res0 = arr(rows, H)
    gam = jnp.ones((H,), jnp.float32)
    bet = jnp.zeros((H,), jnp.float32)

    def vjp_ffn_ln(x, g):
        _, vjp = jax.vjp(
            lambda x_, w1_, w2_: fk._xla_ffn_res_ln(
                x_, w1_, b1, w2_, b2, res0, gam, bet, "gelu", 1e-5),
            x, w1, w2)
        return vjp(g)

    scan_time(lambda x: feed(x, *vjp_ffn_ln(x, g0)), x0, it,
              "jax.vjp XLA ffn+res+LN", 5 * unit)

    wo = arr(H, H, scale=0.02)
    bo = jnp.zeros((H,), jnp.float32)
    unit_hh = 2 * rows * H * H

    def vjp_dense(x, g):
        _, vjp = jax.vjp(
            lambda x_, w_: jnp.dot(x_, w_, preferred_element_type=bf) +
            bo.astype(bf), x, wo)
        return vjp(g)

    scan_time(lambda x: feed(x, *vjp_dense(x, g0)), x0, it,
              "jax.vjp dense (3 HxH gemms)", 3 * unit_hh)

    def vjp_dense_ln(x, g):
        _, vjp = jax.vjp(
            lambda x_, w_: fk._xla_dense_res_ln(
                x_, w_, bo, res0, gam, bet, 1e-5), x, wo)
        return vjp(g)

    scan_time(lambda x: feed(x, *vjp_dense_ln(x, g0)), x0, it,
              "jax.vjp dense+res+LN", 3 * unit_hh)

    # ---- tier 3: in-situ flagship v&g, kernels vs XLA-everything ------
    if "--standalone-only" in sys.argv:
        return

    from speechmix_tpu.config import (SPEECH_ENCODER_PRESETS,
                                      SEQ2SEQ_PRESETS, SpeechMixConfig)
    from speechmix_tpu.models import speechmix as smx
    from speechmix_tpu.ops import layers
    import optax

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
    params = smx.init_speechmix(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(7)

    def loss_fn(params, dkey):
        out = smx.speechmix_forward(
            params, cfg, batch["input_values"], lengths=batch["lengths"],
            labels=batch["labels"], dtype=jnp.bfloat16, use_flash=True,
            dropout_rng=dkey)
        return out["loss"]

    def timed(f, *args, n=None):
        n = _smoke.pick(10, 1) if n is None else n
        out = f(*args)
        jax.tree_util.tree_map(lambda l: l.block_until_ready(), out)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = f(*args)
            jax.tree_util.tree_map(lambda l: l.block_until_ready(), out)
            ts.append(time.perf_counter() - t0)
        return min(ts), out

    for name, fused in (("A kernels+recompute-VJP (default)", None),
                        ("B XLA everything", False)):
        layers.set_ffn_fused(fused)
        layers.set_attn_fused_epilogue(fused is not False)
        layers.set_ffn_fused_epilogue(fused is not False)
        try:
            t_f, l_f = timed(jax.jit(loss_fn), params, key)
            print(f"{name:34s}: fwd {t_f*1e3:8.1f} ms  "
                  f"loss={float(l_f):.5f}", flush=True)

            @jax.jit
            def vg(params, key):
                loss, grads = jax.value_and_grad(loss_fn)(params, key)
                return loss, optax.global_norm(grads)

            t_vg, (l_vg, gn) = timed(vg, params, key)
            print(f"{name:34s}: v&g {t_vg*1e3:8.1f} ms  "
                  f"bwd ~ {(t_vg-t_f)*1e3:8.1f} ms  "
                  f"gnorm={float(gn):.5f}", flush=True)
        finally:
            layers.set_ffn_fused(None)
            layers.set_attn_fused_epilogue(True)
            layers.set_ffn_fused_epilogue(True)


if __name__ == "__main__":
    main()
