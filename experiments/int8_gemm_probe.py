"""w8a8 serving-mode feasibility probe (round 5).

The round-4 lever list left one unexplored single-chip encoder lever: an
int8 (weights+activations) path — the MXU's int8 rate is 2x bf16, and the
encoder gemms (~92 ms of the 548 ms B=128 headline) are already at ~190
TFLOP/s bf16, so only a rate change moves them.  Before building any
serving mode, measure whether XLA actually delivers the int8 MXU rate:

  gemm bf16            (the known ~190 TF/s anchor — validates the probe)
  gemm int8 -> int32   (pre-quantized operands: the ceiling)
  w8a8 chain           (per-row dynamic activation quant + int8 gemm +
                        f32 rescale — what a serving mode would really run)

Encoder-FFN fc1 shapes at B=128 (102400 x 768 x 3072), scan x 32.

    PYTHONPATH=/root/repo:/root/.axon_site python experiments/int8_gemm_probe.py
"""

import sys
import time

import numpy as np

import _smoke


def scan_time(body, carry0, iters, label, flops=None):
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
    msg = f"{label:44s}: {t*1e3:8.3f} ms/iter"
    if flops:
        msg += f"  {flops/t/1e12:6.1f} TFLOP/s"
    print(msg, flush=True)
    return t


def main():
    _smoke.init()
    import jax
    import jax.numpy as jnp

    from speechmix_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache("/root/repo/.jax_cache_tpu")

    rows, H, F = _smoke.pick((102400, 768, 3072), (256, 128, 256))
    it = _smoke.pick(32, 2)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(rows, H).astype(np.float32) * 0.5,
                     jnp.bfloat16)
    w = jnp.asarray(rng.randn(H, F).astype(np.float32) * 0.02, jnp.bfloat16)
    wq = jnp.asarray(
        np.clip(np.round(rng.randn(H, F) * 40), -127, 127), jnp.int8)
    ws = jnp.asarray(np.abs(rng.randn(F)).astype(np.float32) * 1e-3)
    xq0 = jnp.asarray(
        np.clip(np.round(rng.randn(rows, H) * 40), -127, 127), jnp.int8)
    unit = 2 * rows * H * F
    print(f"rows={rows} H={H} F={F} iters={it}", flush=True)

    def keep16(c, y):
        # y: (rows, F); keep it live through a cheap column slice sum
        s = jnp.sum(y[:, :128].astype(jnp.float32))
        return (c.astype(jnp.float32) * (1.0 + 1e-12 * s)).astype(c.dtype)

    scan_time(lambda c: keep16(c, jnp.dot(c, w,
                                          preferred_element_type=jnp.bfloat16)),
              x0, it, "gemm bf16 (anchor)", unit)

    def keep8(c, y):
        s = jnp.sum(y[:, :128].astype(jnp.float32))
        return jnp.clip(c.astype(jnp.int32) +
                        (s * 0).astype(jnp.int32), -127, 127).astype(jnp.int8)

    scan_time(lambda c: keep8(c, jax.lax.dot_general(
        c, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)),
        xq0, it, "gemm int8 -> int32 (pre-quantized)", unit)

    def w8a8(c):
        # per-row dynamic quant of the bf16 activation, int8 gemm, rescale
        cf = c.astype(jnp.float32)
        amax = jnp.max(jnp.abs(cf), axis=1, keepdims=True)
        scale = jnp.maximum(amax, 1e-6) / 127.0
        cq = jnp.clip(jnp.round(cf / scale), -127, 127).astype(jnp.int8)
        y32 = jax.lax.dot_general(cq, wq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = y32.astype(jnp.float32) * scale * ws[None, :]
        return keep16(c, y.astype(jnp.bfloat16))

    scan_time(w8a8, x0, it, "w8a8 chain (dyn act quant + rescale)", unit)


if __name__ == "__main__":
    main()
