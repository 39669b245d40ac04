"""Beam cache reorder as a Pallas dynamic-block-index copy.

The beam-search self-KV reorder (the analogue of the reference's
`_reorder_cache`, /root/reference/speechmix/hf_model.py:337-338) is a pure
row permutation of the (L, B*K, T, H, D) cache: output beam row `o` of
batch `b` is input row `idx[b, o]` of the same batch.  XLA's best
formulation — the K x K one-hot einsum landed in round 5 — still runs at
~2.3x the elementwise-copy floor on the flagship cache
(experiments/reorder_probe.py: 1.706 ms vs 0.748 ms per 75 MB tensor),
because the contraction reads K rows to produce each output row and the
MXU pass is not a straight-line DMA.

A gather IS a straight-line DMA when the row index is known at block
scheduling time — which Pallas TPU exposes via scalar prefetch: the
(B*K,) source-row array is prefetched to SMEM before the grid runs, and
each grid step's input BlockSpec index_map reads it to pick the source
block.  The kernel body is a copy; the data plane never touches the
indices.  K and V ride one pallas_call so the per-step custom-call
overhead is paid once.

Constraints (checked by `beam_gather_supported`): the flattened row
R = T*H*D must be lane-aligned (multiple of 128) so a (1, 1, R) block is
a legal VMEM tile — true for every transformer decoder config here
(H*D = d_model, a multiple of 128).  Falls back to the one-hot einsum in
`generation._gather_cache` otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_DMA_DEPTH = 8  # outstanding row-copy batches (semaphore ring slots)


def _copy_kernel(src_ref, *refs):
    # src_ref is the scalar-prefetch operand.  Operands live in ANY
    # (HBM) — each grid step issues direct HBM->HBM row DMAs routed by the
    # prefetched source index, skipping the VMEM round trip a blocked
    # BlockSpec copy would pay (measured: blocked-copy 1.27 ms vs 0.82 ms
    # elementwise floor on the flagship 75 MB cache).  Copies are
    # pipelined _DMA_DEPTH deep over a semaphore ring: step n starts its
    # copies and waits for step n - _DMA_DEPTH's (start-and-wait in the
    # same step serializes on DMA latency and measured no better than the
    # blocked copy); the last step drains the ring.
    m = (len(refs) - 1) // 2
    ins, outs, sems = refs[:m], refs[m:2 * m], refs[2 * m]
    n = pl.program_id(0)
    num = pl.num_programs(0)

    def copies_for(step):
        s = src_ref[step]
        slot = step % _DMA_DEPTH
        return [pltpu.make_async_copy(i.at[:, s], o.at[:, step],
                                      sems.at[slot, j])
                for j, (i, o) in enumerate(zip(ins, outs))]

    @pl.when(n >= _DMA_DEPTH)
    def _():
        # free this step's semaphore slot before reusing it
        for c in copies_for(n - _DMA_DEPTH):
            c.wait()

    for c in copies_for(n):
        c.start()

    @pl.when(n == num - 1)
    def _():
        # drain: wait every batch still in flight (the last
        # min(_DMA_DEPTH, num) steps, this one included)
        first = jnp.maximum(num - _DMA_DEPTH, 0)
        for k in range(_DMA_DEPTH):
            @pl.when(first + k < num)
            def _():
                for c in copies_for(first + k):
                    c.wait()


def beam_gather_supported(key, value) -> bool:
    """True iff the (L, N, ...) K/V pair can ride the Pallas copy kernel."""
    if key.ndim < 3 or key.shape != value.shape or key.dtype != value.dtype:
        return False
    rest = 1
    for s in key.shape[2:]:
        rest *= s
    # (1, 1, R) blocks need lane-aligned R; bf16/f32 both tile fine.
    return rest % 128 == 0 and key.dtype in (jnp.bfloat16, jnp.float32)


def beam_gather(key, value, src_rows, *, interpret=None):
    """Reorder beam rows of `key`/`value` (shape (L, N, *rest)) so output
    row n comes from input row `src_rows[n]` (same layer), as one
    dynamic-block-index DMA pass.

    src_rows: (N,) int32 flat source-row indices (caller folds the
    batch offset in: b*K + idx[b, o]).  Returns (key', value'), or key'
    alone when value is None (single-tensor mode, used by the probe).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L, N = key.shape[:2]
    R = 1
    for s in key.shape[2:]:
        R *= s
    # A (L, N, R/128, 128) view keeps the per-(layer, row) slab a legal
    # VMEM tile shape for the DMA descriptors; the layer axis rides inside
    # each copy (every layer of beam row n has the same source row), so
    # the grid is N steps of one strided L x (R/128, 128) HBM->HBM DMA
    # per tensor.
    ops = [key] if value is None else [key, value]
    ops = [x.reshape(L, N, R // 128, 128) for x in ops]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY) for _ in ops],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY) for _ in ops],
        scratch_shapes=[pltpu.SemaphoreType.DMA((_DMA_DEPTH, len(ops)))],
    )
    outs = pl.pallas_call(
        _copy_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype) for x in ops],
        interpret=interpret,
    )(src_rows.astype(jnp.int32), *ops)
    if value is None:
        return outs[0].reshape(key.shape)
    return outs[0].reshape(key.shape), outs[1].reshape(value.shape)
