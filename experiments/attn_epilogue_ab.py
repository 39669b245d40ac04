"""Paired A/B for the fused attention-epilogue kernel
(ops/pallas/ffn_kernel.dense_res_ln: out-projection gemm + residual + LN in
one VMEM pass; dispatch layers.dense_residual_ln_apply).

Two tiers, one process (paired per PERF.md hygiene); FFN fusion is left at
its default (auto = ON on TPU) in BOTH arms so this measures the attention
epilogue alone:

  1. in-situ encoder: full speech_encoder forward, attention epilogue
     on vs off;
  2. in-situ headline: full generate() (B=128, 16 s, 64 steps, bf16 and
     --kv adds kv_int8), epilogue on vs off, token agreement checked.

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/attn_epilogue_ab.py
"""

import sys
import time

import numpy as np

import _smoke


def bench(fn, *args, n=None):
    n = _smoke.pick(8, 1) if n is None else n
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
    from speechmix_tpu import generation as gen_lib

    B = next((int(a) for a in sys.argv[1:] if a.isdigit()),
             _smoke.pick(128, 2))
    rng = np.random.RandomState(0)

    cfg = SpeechMixConfig(
        encoder=SPEECH_ENCODER_PRESETS[_smoke.enc_preset()],
        decoder=SEQ2SEQ_PRESETS[_smoke.dec_preset()], down_scale=2)
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

    arms = (False, True)  # attention epilogue off, on

    for attn_epi in arms:
        layers.set_attn_fused_epilogue(attn_epi)

        @jax.jit
        def enc(wav, lengths):
            return speech_encoder_apply(params["speech_encoder"], cfg.encoder,
                                        wav, lengths, use_flash=True,
                                        dtype=jnp.bfloat16)["last_hidden_state"]

        t_e, _ = bench(enc, wav, lengths)
        print(f"encoder attn_epi={attn_epi}: {t_e*1e3:8.1f} ms", flush=True)

    ref_tokens = None
    for attn_epi in arms:
        layers.set_attn_fused_epilogue(attn_epi)
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
            print(f"generate attn_epi={attn_epi} kv_int8={int(kv)}: "
                  f"{t_g*1e3:8.1f} ms  RTFx {B*seconds/t_g:7.1f}  "
                  f"rows_token_exact={agree:.3f}", flush=True)
    layers.set_attn_fused_epilogue(True)


if __name__ == "__main__":
    main()
