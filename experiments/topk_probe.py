"""Beam-step selection-block probe (round 5, beam serving pass).

beam-4 B=32 measured ~2x slower than greedy B=128 at the SAME decode-row
count — ~14 ms/step of beam bookkeeping.  Prime suspect: the candidate
selection `lax.top_k(acc.reshape(B, K*V), 2K)` over K*V = 201k columns
(XLA TPU TopK cost grows with the column count), vs greedy's argmax over V.
This probe scan-times each selection strategy at flagship beam shapes:

  argmax      over (B*K, V)          — the greedy anchor
  top_k flat  over (B, K*V) -> 2K    — the current beam selection
  top_k 2stage: per-beam top-2K over V, then merge K*2K -> 2K (exact same
              result incl. tie order: candidates stay in flat-index order)
  approx_max_k flat                   — TPU-native approximate top-k
  log_softmax over (B*K, V)           — the other per-step block

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/topk_probe.py
"""

import sys
import time

import numpy as np

import _smoke


def scan_time(body, carry0, iters, label):
    import jax

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(lambda c, _: (body(c), None), c, None,
                            length=iters)
        # scalar checksum: device_get of the FULL carry over the tunnel
        # (~40 MB/s) once measured as the entire "result" — a 157 MB pull
        # spread over 32 iters read as 121 ms/iter of fake compute
        return jnp.sum(c.astype(jnp.float32))

    import jax.numpy as jnp
    out = jax.device_get(run(carry0))
    times = []
    for _ in range(_smoke.pick(5, 1)):
        t0 = time.perf_counter()
        out = jax.device_get(run(carry0))
        times.append(time.perf_counter() - t0)
    del out
    t = min(times) / iters
    print(f"{label:44s}: {t*1e3:8.3f} ms/iter", flush=True)
    return t


def main():
    _smoke.init()
    import jax
    import jax.numpy as jnp

    from speechmix_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache("/root/repo/.jax_cache_tpu")

    b, k = _smoke.pick((32, 4), (2, 2))
    v = _smoke.pick(50265, 384)
    k2 = 2 * k
    it = _smoke.pick(64, 2)
    rng = np.random.RandomState(0)
    acc0 = jnp.asarray(rng.randn(b, k, v).astype(np.float32))
    print(f"B={b} K={k} V={v} 2K={k2} iters={it}", flush=True)

    def perturb(c):
        # distinct values each iteration, negligible cost
        return c * 1.000001 + 1e-7

    def keep(c, *outs):
        s = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
        return perturb(c) * (1.0 + 0.0 * s)

    scan_time(lambda c: keep(c, jnp.argmax(c.reshape(b * k, v), axis=-1)),
              acc0, it, "argmax (B*K, V)  [greedy anchor]")
    scan_time(lambda c: keep(c, *jax.lax.top_k(c.reshape(b, k * v), k2)),
              acc0, it, "top_k flat (B, K*V) -> 2K  [current]")

    def two_stage(c):
        vals, idx = jax.lax.top_k(c.reshape(b * k, v), k2)
        flat = (idx.reshape(b, k, k2) +
                jnp.arange(k, dtype=jnp.int32)[None, :, None] * v)
        cand_v = vals.reshape(b, k * k2)
        cand_i = flat.reshape(b, k * k2)
        top_v, pos = jax.lax.top_k(cand_v, k2)
        top_i = jnp.take_along_axis(cand_i, pos, axis=1)
        return top_v, top_i

    scan_time(lambda c: keep(c, *two_stage(c)), acc0, it,
              "top_k 2-stage (per-beam 2K, merge)")
    scan_time(lambda c: keep(c, *jax.lax.approx_max_k(
        c.reshape(b, k * v), k2)), acc0, it, "approx_max_k flat")
    scan_time(lambda c: keep(c, jax.nn.log_softmax(
        c.reshape(b * k, v), axis=-1)), acc0, it, "log_softmax (B*K, V)")

    # exactness: two-stage == flat top_k (values and indices)
    fv, fi = jax.lax.top_k(acc0.reshape(b, k * v), k2)
    tv, ti = two_stage(acc0)
    assert np.array_equal(np.asarray(fv), np.asarray(tv))
    assert np.array_equal(np.asarray(fi), np.asarray(ti))
    print("two-stage == flat top_k: exact", flush=True)


if __name__ == "__main__":
    main()
