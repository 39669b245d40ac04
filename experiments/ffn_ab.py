"""In-situ A/B: does the LayerNorm epilogue deoptimize the encoder fc2 gemm?

PERF.md round-3 encoder roofline: the fc2-gemm+residual+LN fusion
(`convert_reduce_fusion.8` in the profile) sustains ~112 TFLOP/s while the
bare q/k/v gemm fusions hit ~192 — ~45 ms of headroom across 12 layers at
B=128 IF the fusion is the cause.  Microbenches are unreliable here (XLA
DCEs/slices through the chain), so this A/Bs the FULL encoder with
models.speech_encoder.set_ffn_ln_barrier() flipping an
optimization_barrier between the FFN output and the residual+LN.

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/ffn_ab.py
"""

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

    from speechmix_tpu.config import SPEECH_ENCODER_PRESETS
    from speechmix_tpu.models import speech_encoder as se

    B = int(sys.argv[1]) if len(sys.argv) > 1 else _smoke.pick(128, 2)
    enc = SPEECH_ENCODER_PRESETS[_smoke.enc_preset()]
    seconds = _smoke.pick(16, 0.5)
    t_samples = enc.aligned_samples(int(seconds * 16000))
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(B, t_samples).astype(np.float32) * 0.1)
    lengths = jnp.full((B,), int(seconds * 16000), jnp.int32)
    params = se.init_speech_encoder(jax.random.PRNGKey(0), enc)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 and x.ndim >= 2 else x, params)

    from speechmix_tpu.ops import layers as L

    results = {}
    for barrier in (False, True, False):  # repeat baseline to bound drift
        L.set_ffn_ln_barrier(barrier)

        @jax.jit
        def full(params, wav, lengths, _b=barrier):
            out = se.speech_encoder_apply(params, enc, wav, lengths,
                                          dtype=jnp.bfloat16, use_flash=True)
            return jnp.sum(out["last_hidden_state"].astype(jnp.float32))

        v = full(params, wav, lengths)
        jax.device_get(v)
        times = []
        for _ in range(_smoke.pick(8, 1)):
            t0 = time.perf_counter()
            jax.device_get(full(params, wav, lengths))
            times.append(time.perf_counter() - t0)
        t = min(times)
        results.setdefault(barrier, []).append((t, float(v)))
        print(f"barrier={barrier}: {t*1e3:8.2f} ms  checksum={float(v):.4f}",
              flush=True)
    L.set_ffn_ln_barrier(False)
    t_off = min(t for t, _ in results[False])
    t_on = min(t for t, _ in results[True])
    v_off, v_on = results[False][0][1], results[True][0][1]
    print(f"\nbarrier win: {t_off/t_on:0.3f}x ({(t_off-t_on)*1e3:+.1f} ms); "
          f"checksum match: {abs(v_off-v_on)/max(abs(v_off),1e-9):.2e}",
          flush=True)

    # full-generate A/B (also exercises the BART text-encoder prefill —
    # the seq2seq encoder blocks share the barrier)
    from speechmix_tpu.config import SEQ2SEQ_PRESETS, SpeechMixConfig
    from speechmix_tpu.models import speechmix as smx
    from speechmix_tpu import generation as gen_lib

    cfg = SpeechMixConfig(encoder=enc,
                          decoder=SEQ2SEQ_PRESETS[_smoke.dec_preset()],
                          down_scale=2)
    fparams = smx.init_speechmix(jax.random.PRNGKey(0), cfg)
    fparams = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 and x.ndim >= 2 else x, fparams)
    for barrier in (False, True):
        L.set_ffn_ln_barrier(barrier)

        @jax.jit
        def decode(params, wav, lengths, _b=barrier):
            return gen_lib.generate(params, cfg, wav, lengths,
                                    max_length=_smoke.pick(64, 4),
                                    use_flash=True, dtype=jnp.bfloat16)

        tok, _ = decode(fparams, wav, lengths)
        jax.device_get(tok)
        times = []
        for _ in range(_smoke.pick(8, 1)):
            t0 = time.perf_counter()
            tok, _ = decode(fparams, wav, lengths)
            jax.device_get(tok)
            times.append(time.perf_counter() - t0)
        print(f"generate barrier={barrier}: {min(times)*1e3:8.1f} ms "
              f"(RTFx {B*seconds/min(times):7.1f})", flush=True)
    L.set_ffn_ln_barrier(False)


if __name__ == "__main__":
    main()
