"""Paired A/B for the fused FFN Pallas kernel (ops/pallas/ffn_kernel.py).

Three tiers, one process (paired per PERF.md hygiene):

  1. standalone: a single wav2vec2-base encoder-layer FFN at flagship
     shapes ((128*800, 768) x 3072, bf16), XLA chain vs kernel across
     (block_rows, block_f), plus the bart ffn shape;
  2. in-situ encoder: full speech_encoder forward, kernel on vs off;
  3. in-situ headline: full generate() (B=128, 16 s, 64 steps, bf16 and
     kv_int8), kernel on vs off, token agreement checked.

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/ffn_fused_ab.py
"""

import sys
import time

import numpy as np

import _smoke


def bench(fn, *args, n=None):
    n = _smoke.pick(8, 1) if n is None else n
    """block_until_ready, NOT device_get: the tunnel transport makes host
    pulls of big outputs (157 MB for a (102400, 768) bf16 tier-1 output)
    cost seconds, swamping the compute difference under measurement."""
    import jax

    def ready(o):
        for leaf in jax.tree_util.tree_leaves(o):
            leaf.block_until_ready()
        return o

    out = ready(fn(*args))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times), out


def main():
    _smoke.init()
    import jax
    import jax.numpy as jnp

    from speechmix_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache("/root/repo/.jax_cache_tpu")

    from speechmix_tpu.config import (SEQ2SEQ_PRESETS,
                                      SPEECH_ENCODER_PRESETS,
                                      SpeechMixConfig)
    from speechmix_tpu.models import speechmix as smx
    from speechmix_tpu.models.speech_encoder import speech_encoder_apply
    from speechmix_tpu.ops import layers
    from speechmix_tpu.ops.pallas import ffn_kernel as fk
    from speechmix_tpu import generation as gen_lib

    B = int(sys.argv[1]) if len(sys.argv) > 1 else _smoke.pick(128, 2)
    rng = np.random.RandomState(0)

    # ---- tier 1: standalone FFN ----
    # (one shape; the tunnel costs ~4-8 min per fresh compile, so the sweep
    # is deliberately small — PERF.md compile-latency note)
    for tag, h, f, rows in _smoke.pick((("w2v2", 768, 3072, B * 800),),
                                       (("tiny", 256, 512, 256),)):
        x = jnp.asarray(rng.randn(rows, h).astype(np.float32) * 0.5,
                        jnp.bfloat16)
        w1 = jnp.asarray(rng.randn(h, f).astype(np.float32) * 0.02)
        b1 = jnp.zeros((f,), jnp.float32)
        w2 = jnp.asarray(rng.randn(f, h).astype(np.float32) * 0.02)
        b2 = jnp.zeros((h,), jnp.float32)

        @jax.jit
        def xla_ffn(x):
            hh = jnp.dot(x, w1.astype(x.dtype),
                         preferred_element_type=x.dtype) + b1.astype(x.dtype)
            hh = jax.nn.gelu(hh, approximate=False)
            return jnp.dot(hh, w2.astype(x.dtype),
                           preferred_element_type=x.dtype) + b2.astype(x.dtype)

        t_x, y_x = bench(xla_ffn, x)
        flops = 2 * 2 * rows * h * f
        print(f"[{tag}] XLA chain : {t_x*1e3:8.2f} ms  "
              f"{flops/t_x/1e12:6.1f} TFLOP/s", flush=True)
        for br, bf in _smoke.pick(
                ((256, 1536), (256, 3072), (512, 1536), (128, 1536)),
                ((128, 128),)):
            if rows % br or f % bf:
                continue

            @jax.jit
            def kern(x, br=br, bf=bf):
                return fk.ffn_fused(x, w1, b1, w2, b2, act="gelu",
                                    block_rows=br, block_f=bf,
                                    interpret=_smoke.ON)

            try:
                t_k, y_k = bench(kern, x)
            except Exception as e:
                print(f"[{tag}] kernel br={br:4d} bf={bf:5d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            rel = float(jnp.max(jnp.abs(
                y_k.astype(jnp.float32) - y_x.astype(jnp.float32))) /
                (jnp.max(jnp.abs(y_x.astype(jnp.float32))) + 1e-9))
            print(f"[{tag}] kernel br={br:4d} bf={bf:5d}: "
                  f"{t_k*1e3:8.2f} ms  {flops/t_k/1e12:6.1f} TFLOP/s  "
                  f"({t_x/t_k:5.2f}x)  rel={rel:.1e}", flush=True)

    # ---- tiers 2+3: in-situ ----
    cfg = SpeechMixConfig(encoder=SPEECH_ENCODER_PRESETS[_smoke.enc_preset()],
                          decoder=SEQ2SEQ_PRESETS[_smoke.dec_preset()],
                          down_scale=2)
    params = smx.init_speechmix(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 and x.ndim >= 2 else x, params)
    seconds, max_len = _smoke.pick(16.0, 0.5), _smoke.pick(64, 4)
    t_samples = int(seconds * 16000)
    t_padded = cfg.encoder.aligned_samples(t_samples)
    wav = np.zeros((B, t_padded), np.float32)
    wav[:, :t_samples] = rng.randn(B, t_samples).astype(np.float32) * 0.1
    wav = jnp.asarray(wav)
    lengths = jnp.full((B,), t_samples, jnp.int32)

    # --epi: A/B the residual+LN epilogue with the base kernel ON both arms
    # (kernel vs XLA was measured 2026-08-19: 620.9 -> 606.9 ms generate)
    epi_mode = "--epi" in sys.argv
    if epi_mode:
        arms = ((None, False), (None, True))   # (set_ffn_fused, epilogue)
    else:
        arms = ((False, True), (None, True))   # None = auto (on, on TPU)

    for fused, epi in arms:
        layers.set_ffn_fused(fused)
        layers.set_ffn_fused_epilogue(epi)

        @jax.jit
        def enc(wav, lengths):
            return speech_encoder_apply(params["speech_encoder"], cfg.encoder,
                                        wav, lengths, use_flash=True,
                                        dtype=jnp.bfloat16)["last_hidden_state"]

        t_e, _ = bench(enc, wav, lengths)
        print(f"encoder fused={fused} epi={epi}: {t_e*1e3:8.1f} ms",
              flush=True)

    ref_tokens = None
    for fused, epi in arms:
        layers.set_ffn_fused(fused)
        layers.set_ffn_fused_epilogue(epi)
        for kv in ((False,) if "--kv" not in sys.argv else (False, True)):
            @jax.jit
            def decode(params, wav, lengths, kv=kv):
                return gen_lib.generate(params, cfg, wav, lengths,
                                        max_length=max_len, use_flash=True,
                                        dtype=jnp.bfloat16, kv_int8=kv)

            t_g, (tokens, _) = bench(decode, params, wav, lengths)
            tokens = jax.device_get(tokens)
            if ref_tokens is None:
                ref_tokens = tokens
            agree = float((tokens == ref_tokens).all(axis=-1).mean())
            print(f"generate fused={fused} epi={epi} kv_int8={int(kv)}: "
                  f"{t_g*1e3:8.1f} ms  RTFx {B*seconds/t_g:7.1f}  "
                  f"rows_token_exact={agree:.3f}", flush=True)
    layers.set_ffn_fused(None)
    layers.set_ffn_fused_epilogue(True)


if __name__ == "__main__":
    main()
