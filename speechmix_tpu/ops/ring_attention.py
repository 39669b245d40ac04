"""Ring attention: sequence-parallel flash attention over the `seq` mesh axis.

Implements the roadmap in PERF.md "Sequence-parallel x flash attention":
with `sequence_parallel > 1` the encoder's time axis is sharded over `seq`,
and XLA cannot partition a Pallas custom call over a contraction dimension —
so the trainer used to force the XLA attention path (which all-gathers K/V
around EVERY layer's attention).  Ring attention removes both problems:

  * the computation runs under `jax.shard_map`, so each device owns a
    (B_l, T/n, H, D) block and the kernel sees only local shapes;
  * instead of an all-gather, K/V blocks rotate around the `seq` ring
    (`jax.lax.ppermute`, n-1 hops), each hop combining a local
    block-attention result into running online-softmax state (max m,
    denominator l, unnormalized accumulator acc) — the same recurrence the
    flash kernel uses across K tiles (flash_attention_kernel._flash_kernel),
    lifted one level up to mesh blocks;
  * per-device peak memory for scores is (T/n, T/n) per hop instead of
    (T/n, T) — the quadratic term scales with 1/n².

The per-hop block op is XLA einsums (differentiable end-to-end: gradients
flow through `lax.scan` and `ppermute`, whose transpose is the inverse
permutation — no custom VJP needed).  Under `cfg.remat` the enclosing
encoder layer is rematerialized, so the scan's per-hop residuals are
recomputed rather than held across the whole backward.

Attention-probability dropout (HF placement, reference hf_model.py:216-219
fine-tunes with backbone-default rates) composes blockwise: the mask applies
to each hop's unnormalized contribution to `acc` but never to `l`, which is
algebraically identical to masking the normalized probability matrix.  Each
(seq-block, hop) pair draws an independent stream from a folded seed, so the
mask for a given (q, k) pair is consistent (each pair is visited exactly
once per forward).

Non-causal self-attention only (the speech encoder — the only seq-sharded
module; decoder/text attention is never time-sharded, trainer.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _block_attn(q, k, v, kv_valid, scale, dropout_rate=0.0, seed=None,
                hop=None):
    """One attention block: local q against one rotated K/V block.

    q: (B, Tq, H, D); k/v: (B, Tk, H, D); kv_valid: (B, Tk) float {0,1}.
    Returns unnormalized online-softmax partials:
      acc: (B, Tq, H, D) f32 = sum_k exp(s - m) * [dropout] * v
      m:   (B, H, Tq) f32 local row max (NEG_INF where block fully masked)
      l:   (B, H, Tq) f32 local sum exp(s - m) (0 where fully masked)
    """
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    valid = kv_valid[:, None, None, :]                      # (B,1,1,Tk)
    s = jnp.where(valid > 0, s, NEG_INF)
    m = jnp.max(s, axis=-1)                                 # (B,H,Tq)
    # rows with no valid key in this block: exp(NEG_INF - NEG_INF) would be
    # 1 — zero them through the valid mask instead
    p = jnp.exp(s - m[..., None]) * valid                   # (B,H,Tq,Tk) f32
    l = jnp.sum(p, axis=-1)                                 # (B,H,Tq)
    if dropout_rate > 0.0 and seed is not None:
        # independent stream per (data shard, head shard, seq block, hop):
        # each (q, k) pair is visited exactly once per forward, so the mask
        # over the *global* probability matrix is consistent and i.i.d.
        key = jax.random.PRNGKey(seed)
        for ax in ("data", "model", "seq"):
            key = jax.random.fold_in(key, jax.lax.axis_index(ax))
        key = jax.random.fold_in(key, hop)
        keep = jax.random.bernoulli(key, 1.0 - dropout_rate, p.shape)
        # mask the CONTRIBUTION only — the denominator keeps the full sum,
        # so this equals dropout on the normalized probability matrix
        p_acc = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    else:
        p_acc = p
    acc = jnp.einsum("bhqk,bkhd->bqhd", p_acc.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return acc, m, l


def _combine(m_run, l_run, acc_run, m_new, l_new, acc_new):
    """Online-softmax merge of two partial results (flash recurrence)."""
    m_out = jnp.maximum(m_run, m_new)
    alpha = jnp.exp(m_run - m_out)        # 1 where both NEG_INF (l stays 0)
    beta = jnp.exp(m_new - m_out)
    l_out = alpha * l_run + beta * l_new
    acc_out = (alpha.transpose(0, 2, 1)[..., None] * acc_run
               + beta.transpose(0, 2, 1)[..., None] * acc_new)
    return m_out, l_out, acc_out


def _ring_body(q, k, v, kv_valid, *, scale, n_seq, dropout_rate, seed):
    """Per-device program (inside shard_map): local q block attends to all
    n_seq K/V blocks as they rotate around the `seq` ring.

    Comm/compute overlap: each hop STARTS the ppermute for block j+1
    before computing on block j (the compute consumes the carried block,
    not the permuted one), so there is no data dependence between the
    collective and the block attention — XLA's latency-hiding scheduler
    can run the ICI transfer under the (T/n)² attention math.  The last
    hop's compute needs no further permute."""
    perm = [(i, (i + 1) % n_seq) for i in range(n_seq)]

    def hop(carry, j):
        k, v, kv_valid, m, l, acc = carry
        k_nxt = jax.lax.ppermute(k, "seq", perm)
        v_nxt = jax.lax.ppermute(v, "seq", perm)
        valid_nxt = jax.lax.ppermute(kv_valid, "seq", perm)
        a2, m2, l2 = _block_attn(q, k, v, kv_valid, scale, dropout_rate,
                                 seed, hop=j)
        m, l, acc = _combine(m, l, acc, m2, l2, a2)
        return (k_nxt, v_nxt, valid_nxt, m, l, acc), None

    b, tq, h, d = q.shape
    m0 = jnp.full((b, h, tq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, tq), jnp.float32)
    acc0 = jnp.zeros((b, tq, h, d), jnp.float32)
    if n_seq > 1:
        (k, v, kv_valid, m, l, acc), _ = jax.lax.scan(
            hop, (k, v, kv_valid, m0, l0, acc0),
            jnp.arange(0, n_seq - 1, dtype=jnp.int32))
    else:
        m, l, acc = m0, l0, acc0
    a2, m2, l2 = _block_attn(q, k, v, kv_valid, scale, dropout_rate, seed,
                             hop=jnp.int32(n_seq - 1))
    m, l, acc = _combine(m, l, acc, m2, l2, a2)
    denom = jnp.maximum(l, 1e-30).transpose(0, 2, 1)[..., None]
    return (acc / denom).astype(q.dtype)


def ring_attention_eligible(mesh: Mesh, num_heads: int, causal: bool,
                            has_bias: bool, has_cache: bool) -> bool:
    """Ring dispatch predicate (kept in one place for attention())."""
    if mesh is None or causal or has_bias or has_cache:
        return False
    n_seq = mesh.shape.get("seq", 1)
    if n_seq <= 1:
        return False
    n_model = mesh.shape.get("model", 1)
    return num_heads % n_model == 0


@functools.partial(jax.jit, static_argnames=("scale", "mesh", "dropout_rate"))
def ring_attention(q, k, v, kv_mask, *, scale, mesh: Mesh,
                   dropout_rate: float = 0.0, dropout_seed=None):
    """Sequence-parallel non-causal attention over mesh axes
    ("data", "model", "seq").

    q/k/v: (B, T, H, D) global arrays with T sharded over `seq` (the
    trainer's constrain_time_sharded layout); kv_mask: (B, T) bool/float
    key-padding mask or None.  Heads shard over `model` when present;
    batch over `data`.  Returns (B, T, H, D) with the same layout.
    """
    b, t, h, d = q.shape
    n_seq = mesh.shape.get("seq", 1)
    n_model = mesh.shape.get("model", 1)
    assert h % n_model == 0, f"heads={h} not divisible by model={n_model}"
    if kv_mask is None:
        kv_mask = jnp.ones((b, t), jnp.float32)
    kv_mask = kv_mask.astype(jnp.float32)
    # pad T to a `seq` multiple so every device owns an equal block; padded
    # keys are masked out, padded query rows sliced off after
    t_pad = -(-t // n_seq) * n_seq
    if t_pad != t:
        pad = [(0, 0), (0, t_pad - t), (0, 0), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
        kv_mask = jnp.pad(kv_mask, [(0, 0), (0, t_pad - t)])
    seed = (jnp.int32(0) if dropout_seed is None
            else jnp.asarray(dropout_seed).astype(jnp.int32))

    qkv_spec = P("data", "seq", "model" if n_model > 1 else None, None)
    body = functools.partial(_ring_body, scale=scale, n_seq=n_seq,
                             dropout_rate=float(dropout_rate),
                             seed=None if dropout_rate <= 0.0 else seed)
    if dropout_rate > 0.0:
        def body(q, k, v, kv_valid, seed):
            return _ring_body(q, k, v, kv_valid, scale=scale, n_seq=n_seq,
                              dropout_rate=float(dropout_rate), seed=seed)
        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec, P("data", "seq"), P()),
            out_specs=qkv_spec, check_vma=False)
        return fn(q, k, v, kv_mask, seed)[:, :t]
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, P("data", "seq")),
        out_specs=qkv_spec, check_vma=False)
    return fn(q, k, v, kv_mask)[:, :t]
