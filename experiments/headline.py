"""Paired headline sweep: full flagship generate() across the live knobs.

Runs, in ONE process (paired per PERF.md hygiene), B=128 x 16 s x 64-step
greedy decode over {extractor conv|fused} x {bf16|kv_int8}, printing
time + RTFx per cell plus token agreement vs the baseline cell.  This is
the number bench.py reports (bf16/conv is the current BENCH headline
configuration; fused/kv_int8 is the serving candidate).

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/headline.py
"""

import dataclasses
import sys
import time

import numpy as np

import _smoke


def main():
    _smoke.init()
    import jax
    import jax.numpy as jnp

    from speechmix_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache("/root/repo/.jax_cache_tpu")

    from speechmix_tpu.config import (SPEECH_ENCODER_PRESETS,
                                      SEQ2SEQ_PRESETS, SpeechMixConfig)
    from speechmix_tpu.models import speechmix as smx
    from speechmix_tpu import generation as gen_lib

    B = int(sys.argv[1]) if len(sys.argv) > 1 else _smoke.pick(128, 2)
    seconds, max_len = _smoke.pick(16.0, 0.5), _smoke.pick(64, 4)
    base_cfg = SpeechMixConfig(
        encoder=SPEECH_ENCODER_PRESETS[_smoke.enc_preset()],
        decoder=SEQ2SEQ_PRESETS[_smoke.dec_preset()], down_scale=2)
    params = smx.init_speechmix(jax.random.PRNGKey(0), base_cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 and x.ndim >= 2 else x, params)

    t_samples = int(seconds * 16000)
    t_padded = base_cfg.encoder.aligned_samples(t_samples)
    rng = np.random.RandomState(0)
    wav = np.zeros((B, t_padded), np.float32)
    wav[:, :t_samples] = rng.randn(B, t_samples).astype(np.float32) * 0.1
    wav = jnp.asarray(wav)
    lengths = jnp.full((B,), t_samples, jnp.int32)

    ref_tokens = None
    for impl in ("conv", "fused"):
        cfg = dataclasses.replace(
            base_cfg,
            encoder=dataclasses.replace(base_cfg.encoder,
                                        extractor_impl=impl))
        for kv_int8 in (False, True):
            @jax.jit
            def decode(params, wav, lengths, cfg=cfg, kv=kv_int8):
                return gen_lib.generate(params, cfg, wav, lengths,
                                        max_length=max_len, use_flash=True,
                                        dtype=jnp.bfloat16, kv_int8=kv)

            try:
                tokens, _ = decode(params, wav, lengths)
                tokens = jax.device_get(tokens)
            except Exception as e:
                print(f"{impl:5s} kv_int8={kv_int8}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
                continue
            if ref_tokens is None:
                ref_tokens = tokens
            agree = float((tokens == ref_tokens).all(axis=-1).mean())
            times = []
            for _ in range(_smoke.pick(8, 1)):
                t0 = time.perf_counter()
                t_, _ = decode(params, wav, lengths)
                jax.device_get(t_)
                times.append(time.perf_counter() - t0)
            dt = min(times)
            rtfx = B * seconds / dt
            print(f"{impl:5s} kv_int8={int(kv_int8)}: {dt*1e3:8.1f} ms  "
                  f"RTFx {rtfx:7.1f}  rows_token_exact={agree:0.3f}",
                  flush=True)


if __name__ == "__main__":
    main()
