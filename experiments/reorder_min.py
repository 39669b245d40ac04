"""Minimal reorder A/B: one-hot einsum (landed) vs Pallas dynamic-block-
index copy vs the elementwise-copy floor, on the flagship beam cache shape.
Split out of reorder_probe.py because the full 6-row probe's
take_along_axis rows compile for many minutes on this tunnel; this trims
the compile surface to the three rows the round-5 close needs.

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/reorder_min.py
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
    print(f"{label:42s}: {t*1e3:8.3f} ms/iter", flush=True)
    return t


def main():
    _smoke.init()
    import jax
    import jax.numpy as jnp

    from speechmix_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache("/root/repo/.jax_cache_tpu")
    from speechmix_tpu.ops.pallas.beam_gather import (beam_gather,
                                                      beam_gather_supported)

    L, B, K, T, H, D = _smoke.pick((6, 32, 4, 64, 12, 64),
                                   (2, 2, 2, 4, 2, 8))
    it = _smoke.pick(32, 2)
    rng = np.random.RandomState(0)
    kv0 = jnp.asarray(rng.randn(L, B * K, T, H, D).astype(np.float32),
                      jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, K, size=(B, K)), jnp.int32)
    flat_src = (jnp.arange(B, dtype=jnp.int32)[:, None] * K
                + idx).reshape(-1)
    print(f"cache (L={L}, BK={B*K}, T={T}, H={H}, D={D}) bf16 = "
          f"{kv0.size * 2 / 1e6:.0f} MB; iters={it}", flush=True)

    def mk(body):
        return lambda c: (body(c[0]) * 1.000001,)

    def f_onehot(x):
        onehot = jax.nn.one_hot(idx, K, axis=-1)
        xr = x.reshape(L, B, K, -1)
        return jnp.einsum("boi,lbir->lbor", onehot.astype(x.dtype), xr,
                          preferred_element_type=x.dtype).reshape(x.shape)

    def f_copy(x):
        return x + jnp.bfloat16(0)

    def f_pallas(x):
        return beam_gather(x, None, flat_src)

    pallas_ok = beam_gather_supported(kv0, kv0)
    scan_time(mk(f_onehot), (kv0,), it, "c. one-hot einsum (landed)")
    scan_time(mk(f_copy), (kv0,), it, "e. elementwise copy anchor")
    if pallas_ok:
        scan_time(mk(f_pallas), (kv0,), it, "f. pallas dyn-block-index copy")
        assert np.array_equal(np.asarray(f_onehot(kv0)),
                              np.asarray(f_pallas(kv0)))
        print("onehot == pallas", flush=True)
    else:
        print("f. pallas: skipped (row not lane-aligned)", flush=True)


if __name__ == "__main__":
    main()
