"""Beam self-KV cache reorder formulations (round 5, beam residual).

The one-hot einsum reorder (landed: 6.6 -> ~3.7 ms/step) still runs at ~5%
of HBM bandwidth on the (L, B*K, T, H, D) cache.  This probes every
reorder formulation on the exact flagship beam cache shape
(6 x 128 x 64 x 12 x 64 bf16 x2 tensors = 150 MB per step):

  a. take_along_axis on the 6-D view      (round-4 behavior)
  b. flat row gather: (L, BK, R) + idx (1, BK, 1)
  c. one-hot einsum                       (current)
  d. jnp.take on the fused (L*BK, R) rows
  e. memcpy anchor: x + 0 elementwise     (the bandwidth floor)
  f. Pallas dynamic-block-index copy      (ops/pallas/beam_gather.py:
     scalar-prefetched source rows drive the input BlockSpec index_map,
     so the reorder lowers to straight per-row DMAs; K+V in one call —
     timed here on ONE tensor for comparability with rows a-e)

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/reorder_probe.py
"""

import time

import numpy as np

import _smoke


def scan_time(body, carry0, iters, label):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(lambda c, _: (body(c), None), c, None,
                            length=iters)
        return jnp.sum(c[0].astype(jnp.float32))  # scalar pull only

    out = jax.device_get(run(carry0))
    times = []
    for _ in range(_smoke.pick(5, 1)):
        t0 = time.perf_counter()
        out = jax.device_get(run(carry0))
        times.append(time.perf_counter() - t0)
    del out
    t = min(times) / iters
    print(f"{label:46s}: {t*1e3:8.3f} ms/iter", flush=True)
    return t


def main():
    _smoke.init()
    import jax
    import jax.numpy as jnp

    from speechmix_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache("/root/repo/.jax_cache_tpu")

    L, B, K, T, H, D = _smoke.pick((6, 32, 4, 64, 12, 64),
                                   (2, 2, 2, 4, 2, 8))
    it = _smoke.pick(32, 2)
    rng = np.random.RandomState(0)
    kv0 = jnp.asarray(rng.randn(L, B * K, T, H, D).astype(np.float32),
                      jnp.bfloat16)
    # a fixed non-identity permutation (worst case: every row moves)
    idx = jnp.asarray(rng.randint(0, K, size=(B, K)), jnp.int32)
    print(f"cache (L={L}, BK={B*K}, T={T}, H={H}, D={D}) bf16 = "
          f"{kv0.size * 2 / 1e6:.0f} MB; iters={it}", flush=True)

    def perturb(x):
        return (x, )  # scan carry is a 1-tuple so c[0] works in run()

    def mk(body):
        return lambda c: perturb(body(c[0]) * 1.000001)

    def f_6d(x):
        xr = x.reshape(L, B, K, T, H, D)
        take = idx.reshape(1, B, K, 1, 1, 1)
        return jnp.take_along_axis(xr, take, axis=2).reshape(x.shape)

    def f_flat(x):
        xr = x.reshape(L, B * K, T * H * D)
        flat_idx = (jnp.arange(B, dtype=jnp.int32)[:, None] * K
                    + idx).reshape(1, B * K, 1)
        return jnp.take_along_axis(xr, flat_idx, axis=1).reshape(x.shape)

    def f_onehot(x):
        onehot = jax.nn.one_hot(idx, K, axis=-1)
        xr = x.reshape(L, B, K, -1)
        return jnp.einsum("boi,lbir->lbor", onehot.astype(x.dtype), xr,
                          preferred_element_type=x.dtype).reshape(x.shape)

    def f_take(x):
        xr = x.reshape(L * B * K, T * H * D)
        rows = (jnp.arange(L, dtype=jnp.int32)[:, None, None] * (B * K)
                + jnp.arange(B, dtype=jnp.int32)[None, :, None] * K
                + idx[None]).reshape(-1)
        return jnp.take(xr, rows, axis=0).reshape(x.shape)

    def f_copy(x):
        return x + jnp.bfloat16(0)

    from speechmix_tpu.ops.pallas.beam_gather import (beam_gather,
                                                      beam_gather_supported)
    flat_src = (jnp.arange(B, dtype=jnp.int32)[:, None] * K + idx).reshape(-1)
    pallas_ok = beam_gather_supported(kv0, kv0)
    if not pallas_ok:
        # smoke shapes have R % 128 != 0; row f needs lane-aligned rows
        print("f. pallas dyn-block-index copy: skipped (row not lane-aligned)",
              flush=True)

    def f_pallas(x):
        return beam_gather(x, None, flat_src)

    t_a = scan_time(mk(f_6d), (kv0,), it, "a. take_along_axis 6-D (round-4)")
    t_b = scan_time(mk(f_flat), (kv0,), it, "b. flat row gather (L, BK, R)")
    t_c = scan_time(mk(f_onehot), (kv0,), it, "c. one-hot einsum (current)")
    t_d = scan_time(mk(f_take), (kv0,), it, "d. jnp.take fused rows")
    t_e = scan_time(mk(f_copy), (kv0,), it, "e. elementwise copy anchor")
    if pallas_ok:
        t_f = scan_time(mk(f_pallas), (kv0,), it,
                        "f. pallas dyn-block-index copy")

    # correctness: all reorders equal
    ra = f_6d(kv0)
    checks = [(f_flat, "flat"), (f_onehot, "onehot"), (f_take, "take")]
    if pallas_ok:
        checks.append((f_pallas, "pallas"))
    for f, n in checks:
        assert np.array_equal(np.asarray(ra), np.asarray(f(kv0))), n
    print("all formulations identical", flush=True)


if __name__ == "__main__":
    main()
