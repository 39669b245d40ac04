"""Beam-search serving pass (VERDICT r4 #4).

Beam search last saw a perf number in round 2 (beam-4 B=32 = 868 ms, RTFx
590) — before three rounds of layout/kernel wins took greedy from 2350 to
3750 RTFx.  This harness re-measures the full beam surface post those wins
and A/Bs the round-5 lever: SHARED cross-KV beam decode
(generation.set_beam_shared_cross_kv) — one cross projection per input row,
beams folded into the einsum q axis — vs the tiled layout, which streamed
num_beams identical copies of the cross cache every step (the decode
bandwidth floor, PERF.md stage breakdown).

Arms (flagship wav2vec2-base + bart-base, 16 s audio, 64 decode steps,
bf16, flash, paired one process):

  greedy B=32                  (anchor: the per-row cost beam multiplies)
  beam-4 B=32   tiled / shared x bf16 / kv_int8
  group-beam (k=4, G=2, d=1.0) shared
  beam-4 B=128  shared bf16 + kv_int8   (serving scale)

Token agreement between tiled and shared arms must be exact (also pinned at
f32 in tests/test_generation.py::test_beam_shared_cross_kv_matches_tiled).
Reference surface: beam via HF generate + _reorder_cache
(/root/reference/speechmix/hf_model.py:304-338).

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/beam_serving.py
"""

import sys
import time

import numpy as np

import _smoke


def bench(fn, *args, n=None):
    """Distinct-input, device_get-synced timing.  The first run of this
    harness timed REPEATED identical calls with block_until_ready and read
    a 0.07 ms greedy B=32 (impossible) — so every timed call here gets a
    DISTINCT traced epsilon (fn's last arg; perturbs the input on-device,
    no host transfer, no recompile) and syncs by pulling the small token
    outputs (headline.py's barrier).  The eps=0 warmup result is returned
    for token-agreement checks."""
    import jax
    import jax.numpy as jnp

    out = jax.device_get(fn(*args, jnp.float32(0.0)))
    times = []
    for i in range(_smoke.pick(6, 1) if n is None else n):
        t0 = time.perf_counter()
        jax.device_get(fn(*args, jnp.float32(1e-9 * (i + 1))))
        times.append(time.perf_counter() - t0)
    return min(times), out


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

    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    B = int(pos[0]) if pos else _smoke.pick(32, 2)
    B_big = _smoke.pick(128, 2)
    seconds, max_len = _smoke.pick(16.0, 0.5), _smoke.pick(64, 4)
    cfg = SpeechMixConfig(
        encoder=SPEECH_ENCODER_PRESETS[_smoke.enc_preset()],
        decoder=SEQ2SEQ_PRESETS[_smoke.dec_preset()], down_scale=2)
    params = smx.init_speechmix(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 and x.ndim >= 2 else x, params)

    rng = np.random.RandomState(0)
    t_samples = int(seconds * 16000)
    t_padded = cfg.encoder.aligned_samples(t_samples)

    def make_wav(b):
        wav = np.zeros((b, t_padded), np.float32)
        wav[:, :t_samples] = rng.randn(b, t_samples).astype(np.float32) * 0.1
        return jnp.asarray(wav), jnp.full((b,), t_samples, jnp.int32)

    wav, lengths = make_wav(B)

    def run(name, b, wav, lengths, num_beams, shared, kv=False, groups=1,
            div=0.0):
        gen_lib.set_beam_shared_cross_kv(shared)
        try:
            @jax.jit
            def decode(params, wav, lengths, eps):
                return gen_lib.generate(
                    params, cfg, wav * (1.0 + eps), lengths,
                    max_length=max_len,
                    num_beams=num_beams, use_flash=True, dtype=jnp.bfloat16,
                    kv_int8=kv, num_beam_groups=groups,
                    diversity_penalty=div)

            t, (tokens, _) = bench(decode, params, wav, lengths)
            rtfx = b * seconds / t
            print(f"{name:42s}: {t*1e3:8.1f} ms  RTFx {rtfx:7.1f}",
                  flush=True)
            return np.asarray(jax.device_get(tokens))
        finally:
            gen_lib.set_beam_shared_cross_kv(True)

    run(f"greedy B={B}", B, wav, lengths, 1, True)
    tok_tiled = run(f"beam-4 B={B} tiled bf16", B, wav, lengths, 4, False)
    tok_shared = run(f"beam-4 B={B} shared bf16", B, wav, lengths, 4, True)
    agree = float((tok_tiled == tok_shared).all(axis=-1).mean())
    print(f"    tiled vs shared rows_token_exact = {agree:.3f}", flush=True)
    run(f"beam-4 B={B} tiled kv_int8", B, wav, lengths, 4, False, kv=True)
    run(f"beam-4 B={B} shared kv_int8", B, wav, lengths, 4, True, kv=True)
    run(f"group-beam k=4 G=2 d=1.0 B={B} shared", B, wav, lengths, 4, True,
        groups=2, div=1.0)

    if "--full-surface" in sys.argv or _smoke.ON:
        # the remaining decode surfaces: beam-sample and constrained beam
        gen_lib.set_beam_shared_cross_kv(True)

        @jax.jit
        def bs(params, wav, lengths, eps):
            return gen_lib.generate(params, cfg, wav * (1.0 + eps), lengths,
                                    max_length=max_len, num_beams=4,
                                    do_sample=True, top_k=50,
                                    use_flash=True, dtype=jnp.bfloat16,
                                    rng=jax.random.PRNGKey(0))

        t, _ = bench(bs, params, wav, lengths)
        print(f"{'beam-sample k=4 top_k=50 B=' + str(B):42s}: "
              f"{t*1e3:8.1f} ms  RTFx {B*seconds/t:7.1f}", flush=True)

        @jax.jit
        def cb(params, wav, lengths, eps):
            return gen_lib.generate(params, cfg, wav * (1.0 + eps), lengths,
                                    max_length=max_len, num_beams=4,
                                    force_words_ids=[[318, 262]],
                                    use_flash=True, dtype=jnp.bfloat16)

        t, _ = bench(cb, params, wav, lengths)
        print(f"{'constrained k=4 (1 bigram) B=' + str(B):42s}: "
              f"{t*1e3:8.1f} ms  RTFx {B*seconds/t:7.1f}", flush=True)

    if "--big" in sys.argv or _smoke.ON:
        wav_b, len_b = make_wav(B_big)
        # greedy at B_big has the same decode-row count as beam-4 at
        # B_big/4 — the anchor that isolates beam bookkeeping overhead
        run(f"greedy B={B_big} (beam-row anchor)", B_big, wav_b, len_b, 1,
            True)
        run(f"beam-4 B={B_big} shared bf16", B_big, wav_b, len_b, 4, True)
        run(f"beam-4 B={B_big} shared kv_int8", B_big, wav_b, len_b, 4, True,
            kv=True)

    if "--reorder-ab" in sys.argv or _smoke.ON:
        # round-5 close-out lever: self-KV reorder einsum vs the Pallas
        # dynamic-block-index copy (ops/pallas/beam_gather.py) in-situ.
        toks = {}
        for impl in ("einsum", "pallas"):
            gen_lib.GATHER_CACHE_IMPL = impl
            try:
                toks[impl] = run(f"beam-4 B={B} shared reorder={impl}", B,
                                 wav, lengths, 4, True)
            finally:
                gen_lib.GATHER_CACHE_IMPL = "auto"
        same = float((toks["einsum"] == toks["pallas"]).all(axis=-1).mean())
        print(f"    einsum vs pallas rows_token_exact = {same:.3f}",
              flush=True)

    if "--probe" in sys.argv or _smoke.ON:
        # timing probe: beam step with the self-KV cache reorder stubbed to
        # identity (WRONG outputs — isolates the per-step gather cost)
        saved = gen_lib._gather_cache
        gen_lib._gather_cache = lambda cache, idx, b_, k_: cache
        try:
            run(f"beam-4 B={B} shared, no cache-reorder (probe)", B, wav,
                lengths, 4, True)
        finally:
            gen_lib._gather_cache = saved


if __name__ == "__main__":
    main()
