"""A/B the per-tap strided-slice gemm extractor lowering ("taps") against
the XLA conv chain on the TPU.

Motivation (PERF.md round-4): the fused Pallas extractor kernel is dead on
this chip's Mosaic (stride-2 sublane slices rejected, sublane->lane shape
cast crashes the compile helper), so the remaining candidates are XLA-level
lowerings.  "taps" = k accumulated (B*t, Cin)x(Cin, Cout) gemms over per-tap
strided-slice views — no concat (what sank "patches"), no row-merge reshape
(what sank "pairs").

Run serialized on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python experiments/extractor_taps_ab.py [B]

Stages (paired, one process):
  1. isolated layers-1..6 chain on the conv0 output (conv vs taps vs pairs)
  2. end-to-end extract_features
  3. full speech encoder
  4. full generate() headline, both impls, token-agreement checked
"""

import dataclasses
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

    from speechmix_tpu.config import SPEECH_ENCODER_PRESETS
    from speechmix_tpu.models import speech_encoder as se
    from speechmix_tpu.ops import layers as L

    B = int(sys.argv[1]) if len(sys.argv) > 1 else _smoke.pick(128, 2)
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

    # ---- stage 1: isolated layers-1..6 chain (raw convs, no norm/gelu,
    # identical math both sides so the lowering is the only variable) ----
    @jax.jit
    def conv0_out(params, wav):
        x = wav.astype(jnp.bfloat16)[..., None]
        return L.conv1d(layers[0]["conv"], x, enc.conv_strides[0],
                        jnp.bfloat16)

    x0 = jax.device_get(conv0_out(params, wav))
    x0 = jax.device_put(jnp.asarray(x0))
    print(f"conv0 out: {x0.shape} {x0.dtype}", flush=True)
    ks, ss = enc.conv_kernels[1:], enc.conv_strides[1:]

    def chain(x, impl):
        for i, layer in enumerate(layers[1:]):
            x = L.conv1d(layer["conv"], x, ss[i], jnp.bfloat16, impl=impl)
            x = jax.nn.gelu(x, approximate=False)
        return jnp.sum(x.astype(jnp.float32))

    ref = None
    # smoke: the pairs lowering needs input slack T >= s*(t+1) that the
    # tiny-speech aligned length can't provide; taps covers the logic
    for impl in _smoke.pick(("conv", "taps", "pairs", "conv"),
                            ("conv", "taps", "conv")):
        f = jax.jit(lambda x, impl=impl: chain(x, impl))
        v = float(jax.device_get(f(x0)))
        if ref is None:
            ref = v
        t = bench(f, x0)
        rel = abs(v - ref) / max(abs(ref), 1e-9)
        print(f"chain[{impl:5s}]: {t*1e3:8.2f} ms  checksum_rel={rel:.2e}",
              flush=True)

    # ---- stage 2 + 3: end-to-end extractor and full encoder ----
    for impl in ("conv", "taps", "conv"):
        cfg_i = dataclasses.replace(enc, extractor_impl=impl)

        @jax.jit
        def feats(params, wav, lengths, cfg_i=cfg_i):
            return jnp.sum(se.extract_features(
                params, cfg_i, wav, lengths,
                dtype=jnp.bfloat16).astype(jnp.float32))

        t = bench(feats, params, wav, lengths)
        print(f"extract_features[{impl:5s}]: {t*1e3:8.2f} ms", flush=True)

    for impl in ("conv", "taps"):
        cfg_i = dataclasses.replace(enc, extractor_impl=impl)

        @jax.jit
        def full(params, wav, lengths, cfg_i=cfg_i):
            out = se.speech_encoder_apply(params, cfg_i, wav, lengths,
                                          dtype=jnp.bfloat16, use_flash=True)
            return jnp.sum(out["last_hidden_state"].astype(jnp.float32))

        t = bench(full, params, wav, lengths)
        print(f"speech_encoder[{impl:5s}]: {t*1e3:8.2f} ms", flush=True)

    # ---- stage 4: in-situ flagship generate() headline ----
    from speechmix_tpu.config import SEQ2SEQ_PRESETS, SpeechMixConfig
    from speechmix_tpu import generation as gen_lib
    from speechmix_tpu.models import speechmix as smx

    dec = SEQ2SEQ_PRESETS[_smoke.dec_preset()]
    audio_sec = B * seconds
    toks_ref = None
    for impl in ("conv", "taps", "conv"):
        cfg = SpeechMixConfig(
            encoder=dataclasses.replace(enc, extractor_impl=impl),
            decoder=dec, down_scale=2)
        mp = smx.init_speechmix(jax.random.PRNGKey(0), cfg)
        mp = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 and x.ndim >= 2 else x, mp)

        @jax.jit
        def g(mp, wav, lengths, cfg=cfg):
            return gen_lib.generate(mp, cfg, wav, lengths,
                                    max_length=_smoke.pick(64, 4),
                                    use_flash=True, dtype=jnp.bfloat16)

        toks, _ = g(mp, wav, lengths)
        toks = np.asarray(jax.device_get(toks))
        if toks_ref is None:
            toks_ref = toks
        agree = float((toks == toks_ref).mean())
        t = bench(g, mp, wav, lengths)
        print(f"generate[{impl:5s}]: {t*1e3:8.1f} ms (RTFx {audio_sec/t:7.1f})"
              f"  token_agreement={agree:.4f}", flush=True)


if __name__ == "__main__":
    main()
