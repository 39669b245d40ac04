"""A/B the fused Pallas conv-extractor kernel against the XLA conv lowering.

Run on the TPU (serialize — never alongside another TPU process):

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/extractor_ab.py

Measures, paired in ONE process (PERF.md measurement hygiene):
  1. isolated extractor-chain sweep: XLA conv chain vs fused kernel over
     (deinterleave mode) x (bt) x (block_b), wav2vec2-base layers 1..6
     geometry at B=128, 16 s audio, bf16, scalar-checksum outputs;
  2. end-to-end extract_features: extractor_impl="conv" vs "fused" with the
     winning knobs;
  3. full generate() headline with extractor_impl flipped, vs the unflipped
     baseline (the number PERF.md's ledger tracks).

Prints one line per configuration; Mosaic rejections are caught and
reported per-config so a failing mode doesn't kill the sweep.
"""

import dataclasses
import functools
import sys
import time

import numpy as np

import _smoke


def bench(fn, *args, iters=None):
    iters = _smoke.pick(8, 1) if iters is None else iters
    import jax
    out = fn(*args)
    jax.device_get(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(out)
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
    from speechmix_tpu.models import speech_encoder as se
    from speechmix_tpu.ops.pallas import conv_extractor as fx

    B = int(sys.argv[1]) if len(sys.argv) > 1 else _smoke.pick(128, 2)
    # argv[2]: encoder preset (wav2vec2-large exercises the LN-epilogue
    # kernel family — feat_extract_norm == "layer")
    enc = SPEECH_ENCODER_PRESETS[
        sys.argv[2] if len(sys.argv) > 2 else _smoke.enc_preset()]
    seconds = _smoke.pick(16, 0.5)
    t_samples = enc.aligned_samples(int(seconds * 16000))
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(B, t_samples).astype(np.float32) * 0.1)
    lengths = jnp.full((B,), int(seconds * 16000), jnp.int32)
    params = se.init_speech_encoder(jax.random.PRNGKey(0), enc)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 and x.ndim >= 2 else x, params)
    layers = params["feature_extractor"]["layers"]

    # ---- stage 1: isolated chain sweep on the conv0 output ----
    @jax.jit
    def conv0_out(params, wav):
        x = wav.astype(jnp.bfloat16)[..., None]
        from speechmix_tpu.ops import layers as L
        x = L.conv1d(layers[0]["conv"], x, enc.conv_strides[0], jnp.bfloat16)
        return x  # norm+gelu excluded: both chains see the same input

    x0 = jax.device_get(conv0_out(params, wav))
    x0 = jax.device_put(jnp.asarray(x0))
    print(f"conv0 out: {x0.shape} {x0.dtype}", flush=True)
    ks, ss = enc.conv_kernels[1:], enc.conv_strides[1:]
    ln = enc.feat_extract_norm == "layer"  # large family: LN epilogue live

    @jax.jit
    def xla_chain(x):
        return jnp.sum(fx._xla_stack(
            x, layers[1:], ks, ss, ln, enc.layer_norm_eps)
            .astype(jnp.float32))

    t_xla = bench(xla_chain, x0)
    print(f"XLA conv chain: {t_xla*1e3:8.2f} ms  (baseline)", flush=True)

    interp = jax.default_backend() != "tpu"  # CPU smoke runs interpret
    results = []
    for mode in ("reshape", "slice"):
        for bt in _smoke.pick((256, 512, 1024), (64,)):
            for bb in _smoke.pick((1, 2, 4), (1,)):
                try:
                    f = jax.jit(functools.partial(
                        lambda x, m, b, b2: jnp.sum(fx.fused_conv_stack(
                            x, layers[1:], ks, ss, bt=b, block_b=b2,
                            deinterleave=m, ln_layers=ln,
                            ln_eps=enc.layer_norm_eps,
                            interpret=interp).astype(jnp.float32)),
                        m=mode, b=bt, b2=bb))
                    # numerics guard vs XLA on the first iter
                    v = float(jax.device_get(f(x0)))
                    ref = float(jax.device_get(xla_chain(x0)))
                    rel = abs(v - ref) / max(abs(ref), 1e-9)
                    t = bench(f, x0)
                    results.append((t, mode, bt, bb, rel))
                    print(f"fused {mode:7s} bt={bt:4d} bb={bb}: "
                          f"{t*1e3:8.2f} ms  ({t_xla/t:0.2f}x)  "
                          f"checksum_rel={rel:.2e}", flush=True)
                except Exception as e:
                    print(f"fused {mode:7s} bt={bt:4d} bb={bb}: FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    if not results:
        print("no fused config compiled; stopping")
        return
    best = min(results)
    print(f"\nbest: {best[1]} bt={best[2]} bb={best[3]} "
          f"{best[0]*1e3:.2f} ms vs XLA {t_xla*1e3:.2f} "
          f"({t_xla/best[0]:0.2f}x)", flush=True)
    fx.set_fused_conv_defaults(bt=best[2], block_b=best[3],
                               deinterleave=best[1])

    # ---- stage 2: end-to-end extract_features ----
    for impl in ("conv", "fused"):
        cfg_i = dataclasses.replace(enc, extractor_impl=impl)

        @jax.jit
        def feats(params, wav, lengths, cfg_i=cfg_i):
            return jnp.sum(se.extract_features(
                params, cfg_i, wav, lengths,
                dtype=jnp.bfloat16).astype(jnp.float32))

        t = bench(feats, params, wav, lengths)
        print(f"extract_features[{impl:5s}]: {t*1e3:8.2f} ms", flush=True)

    # ---- stage 3: full encoder ----
    for impl in ("conv", "fused"):
        cfg_i = dataclasses.replace(enc, extractor_impl=impl)

        @jax.jit
        def full(params, wav, lengths, cfg_i=cfg_i):
            out = se.speech_encoder_apply(params, cfg_i, wav, lengths,
                                          dtype=jnp.bfloat16, use_flash=True)
            return jnp.sum(out["last_hidden_state"].astype(jnp.float32))

        t = bench(full, params, wav, lengths)
        print(f"speech_encoder[{impl:5s}]: {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
