"""In-kernel dropout FFN/epilogue kernels (ops/pallas/ffn_kernel.py round-4
section) and their ops.layers dispatch.

The dropout mask is regenerated from a seed in fwd AND bwd (in-kernel pltpu
PRNG on TPU; a seed-derived jax.random stream in the XLA fallback).  These
tests are backend-agnostic: the reference mask is obtained from the SAME
regeneration the backward uses (`dropout_mask` on TPU, `_xla_dropout_mask`
elsewhere), so the assertions validate fwd/bwd mask consistency — the
invariant that makes the custom VJP correct — on both the Pallas kernels
(TPU) and the XLA fallback (this CPU suite).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechmix_tpu.ops import layers
from speechmix_tpu.ops.pallas import ffn_kernel as fk
from speechmix_tpu.ops.pallas.flash_attention_kernel import _xla_dropout_mask

H, F = 128, 256
N = 512
BR, BF = 256, 128
EPS = 1e-5


def _mats(seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(N, H).astype(np.float32) * 0.5)
    w1 = jnp.asarray(rng.randn(H, F).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(F, H).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(F).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)
    g = jnp.asarray(1.0 + 0.1 * rng.randn(H).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.randn(H).astype(np.float32))
    return x, w1, b1, w2, b2, g, beta


def _regen(seed, n, cols, rate, block_cols, offset=0):
    """The backward's mask regeneration, backend-switched exactly as
    _fdt_bwd/_fdrl_bwd/_ddrl_bwd do."""
    if jax.default_backend() == "tpu":
        return fk.dropout_mask(seed, n, cols, rate, BR, block_cols,
                               offset=offset)
    # off-TPU the out-mask stream is seed+1 when offset > 0 (res_ln variant)
    return _xla_dropout_mask(seed + (1 if offset else 0), (n, cols), rate)


def test_mask_semantics():
    """Regenerated mask is binary {0, 1/(1-r)} and keeps ~1-rate."""
    m = np.asarray(_regen(7, N, F, 0.3, BF))
    vals = np.unique(m)
    assert all(abs(v) < 1e-6 or abs(v - 1 / 0.7) < 1e-4 for v in vals), vals
    keep = (m > 0).mean()
    assert 0.6 < keep < 0.8, keep


def test_ffn_dropout_fwd_matches_regenerated_mask_chain():
    x, w1, b1, w2, b2, _, _ = _mats()
    y = fk.ffn_dropout_trainable(x, w1, b1, w2, b2, 7, "gelu", 0.3, BR, BF)
    amask = _regen(7, N, F, 0.3, BF)
    ref = fk._xla_ffn_drop(x, w1, b1, w2, b2, amask, "gelu")
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_ffn_dropout_grads_match_explicit_mask_chain():
    x, w1, b1, w2, b2, _, _ = _mats(1)
    amask = _regen(13, N, F, 0.3, BF)

    def lk(args):
        return jnp.sum(jnp.square(fk.ffn_dropout_trainable(
            *args, 13, "gelu", 0.3, BR, BF)))

    def lr(args):
        return jnp.sum(jnp.square(fk._xla_ffn_drop(*args, amask, "gelu")))

    gk = jax.grad(lk)((x, w1, b1, w2, b2))
    gr = jax.grad(lr)((x, w1, b1, w2, b2))
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-4)


@pytest.mark.parametrize("act_rate,out_rate", [(0.2, 0.1), (0.2, 0.0),
                                               (0.0, 0.1)])
def test_ffn_dropout_res_ln_fwd_and_grads(act_rate, out_rate):
    """Both HF dropout sites, each statically skippable, against the
    regenerated-mask XLA chain — value and all eight grads."""
    x, w1, b1, w2, b2, g, beta = _mats(2)
    ni, nj = N // BR, F // BF
    amask = _regen(9, N, F, act_rate, BF) if act_rate > 0.0 else None
    omask = (_regen(9, N, H, out_rate, H, offset=ni * nj)
             if out_rate > 0.0 else None)

    y = fk.ffn_dropout_res_ln_trainable(x, w1, b1, w2, b2, x, g, beta, 9,
                                        "gelu", act_rate, out_rate, EPS,
                                        BR, BF)
    ref = fk._xla_ffn_drop_res_ln(x, w1, b1, w2, b2, x, g, beta, amask,
                                  omask, "gelu", EPS)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)

    def lk(args):
        return jnp.sum(jnp.square(fk.ffn_dropout_res_ln_trainable(
            *args, 9, "gelu", act_rate, out_rate, EPS, BR, BF)))

    def lr(args):
        return jnp.sum(jnp.square(fk._xla_ffn_drop_res_ln(
            *args, amask, omask, "gelu", EPS)))

    gk = jax.grad(lk)((x, w1, b1, w2, b2, x, g, beta))
    gr = jax.grad(lr)((x, w1, b1, w2, b2, x, g, beta))
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-4)


def test_dense_dropout_res_ln_fwd_and_grads():
    x, _, _, _, b2, g, beta = _mats(3)
    w = jnp.asarray(np.random.RandomState(4).randn(H, H)
                    .astype(np.float32) * 0.1)
    omask = _regen(11, N, H, 0.1, H)
    y = fk.dense_dropout_res_ln_trainable(x, w, b2, x, g, beta, 11, 0.1,
                                          EPS, BR)
    ref = fk._xla_dense_drop_res_ln(x, w, b2, x, g, beta, omask, EPS)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)

    def lk(args):
        return jnp.sum(jnp.square(fk.dense_dropout_res_ln_trainable(
            *args, 11, 0.1, EPS, BR)))

    def lr(args):
        return jnp.sum(jnp.square(fk._xla_dense_drop_res_ln(
            *args, omask, EPS)))

    gk = jax.grad(lk)((x, w, b2, x, g, beta))
    gr = jax.grad(lr)((x, w, b2, x, g, beta))
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-4)


def test_deterministic_and_seed_sensitive():
    x, w1, b1, w2, b2, _, _ = _mats(5)
    a = fk.ffn_dropout_trainable(x, w1, b1, w2, b2, 3, "gelu", 0.3, BR, BF)
    b = fk.ffn_dropout_trainable(x, w1, b1, w2, b2, 3, "gelu", 0.3, BR, BF)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = fk.ffn_dropout_trainable(x, w1, b1, w2, b2, 4, "gelu", 0.3, BR, BF)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_act_and_out_streams_are_independent():
    """The act mask (streams [0, ni*nj)) and out mask (streams [ni*nj, +ni))
    of one seed must be distinct draws — a collision would correlate the
    two HF dropout sites."""
    ni, nj = N // BR, F // BF
    m_act = np.asarray(_regen(21, N, H, 0.5, H))  # stream 0 tile row 0
    m_out = np.asarray(_regen(21, N, H, 0.5, H, offset=ni * nj))
    assert not np.array_equal(m_act, m_out)


def test_mean_over_seeds_approaches_no_dropout():
    """Inverted scaling: averaging kernel outputs over seeds converges to
    the no-dropout FFN output."""
    x, w1, b1, w2, b2, _, _ = _mats(6)
    ref = fk._xla_ffn_drop(x, w1, b1, w2, b2, None, "gelu")
    acc = np.zeros_like(np.asarray(ref))
    n = 48
    for s in range(n):
        acc += np.asarray(fk.ffn_dropout_trainable(
            x, w1, b1, w2, b2, 1000 + s, "gelu", 0.3, BR, BF))
    err = (np.abs(acc / n - np.asarray(ref)).mean()
           / (np.abs(np.asarray(ref)).mean() + 1e-9))
    assert err < 0.2, err


# ---------------------------------------------------------------------------
# dispatch (ops.layers): live dropout now keeps the fused path by default
# ---------------------------------------------------------------------------


def _params(seed=8):
    rng = np.random.RandomState(seed)
    p1 = {"kernel": jnp.asarray(rng.randn(H, F).astype(np.float32) * 0.1),
          "bias": jnp.asarray(rng.randn(F).astype(np.float32) * 0.1)}
    p2 = {"kernel": jnp.asarray(rng.randn(F, H).astype(np.float32) * 0.1),
          "bias": jnp.asarray(rng.randn(H).astype(np.float32) * 0.1)}
    p_ln = {"scale": jnp.asarray(1.0 + 0.1 * rng.randn(H)
                                 .astype(np.float32)),
            "bias": jnp.asarray(0.1 * rng.randn(H).astype(np.float32))}
    x = jnp.asarray(rng.randn(2, 256, H).astype(np.float32) * 0.5)
    return p1, p2, p_ln, x


def test_dispatch_live_dropout_keeps_fused_path():
    """ffn_apply / ffn_residual_ln_apply / dense_residual_ln_apply with live
    rngs route to the dropout kernels when forced on: output is
    deterministic given the rng key, differs from the no-dropout output,
    and seed-averages back to it."""
    p1, p2, p_ln, x = _params()
    key = jax.random.PRNGKey(0)
    layers.set_ffn_fused(True)
    try:
        y0 = layers.ffn_apply(p1, p2, x, "gelu", jnp.float32)
        ya = layers.ffn_apply(p1, p2, x, "gelu", jnp.float32,
                              act_rng=key, act_dropout=0.3)
        yb = layers.ffn_apply(p1, p2, x, "gelu", jnp.float32,
                              act_rng=key, act_dropout=0.3)
        yc = layers.ffn_apply(p1, p2, x, "gelu", jnp.float32,
                              act_rng=jax.random.PRNGKey(1), act_dropout=0.3)
    finally:
        layers.set_ffn_fused(None)
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))
    assert not np.array_equal(np.asarray(ya), np.asarray(yc))
    assert not np.array_equal(np.asarray(ya), np.asarray(y0))
    acc = np.zeros_like(np.asarray(y0))
    n = 32
    layers.set_ffn_fused(True)
    try:
        for s in range(n):
            acc += np.asarray(layers.ffn_apply(
                p1, p2, x, "gelu", jnp.float32,
                act_rng=jax.random.PRNGKey(100 + s), act_dropout=0.3))
    finally:
        layers.set_ffn_fused(None)
    err = (np.abs(acc / n - np.asarray(y0)).mean()
           / (np.abs(np.asarray(y0)).mean() + 1e-9))
    assert err < 0.35, err


def test_dispatch_res_ln_live_dropout_fused_and_toggle():
    """The post-LN block with both rngs live: fused path engages (differs
    from eval), and set_ffn_dropout_fused(False) restores the XLA fallback
    with layers.dropout semantics exactly."""
    p1, p2, p_ln, x = _params(9)
    ka, ko = jax.random.split(jax.random.PRNGKey(2))
    kwargs = dict(act_rng=ka, act_dropout=0.2, out_rng=ko, out_dropout=0.1)
    layers.set_ffn_fused(True)
    try:
        y_fused = layers.ffn_residual_ln_apply(
            p1, p2, p_ln, x, "gelu", jnp.float32, **kwargs)
        y_eval = layers.ffn_residual_ln_apply(
            p1, p2, p_ln, x, "gelu", jnp.float32)
        layers.set_ffn_dropout_fused(False)
        y_off = layers.ffn_residual_ln_apply(
            p1, p2, p_ln, x, "gelu", jnp.float32, **kwargs)
    finally:
        layers.set_ffn_fused(None)
        layers.set_ffn_dropout_fused(True)
    assert not np.array_equal(np.asarray(y_fused), np.asarray(y_eval))
    # the toggled-off path is the legacy XLA chain, bit-matched to the
    # explicit formula with the same keys
    f = layers.ffn_apply(p1, p2, x, "gelu", jnp.float32, ka, 0.2)
    f = layers.dropout(f, 0.1, ko)
    ref = layers.layer_norm(p_ln, x + layers.ffn_ln_barrier(f), 1e-5)
    np.testing.assert_allclose(np.asarray(y_off), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_dispatch_dense_res_ln_live_dropout_fused_and_toggle():
    p1, _, p_ln, x = _params(10)
    rng = np.random.RandomState(11)
    p = {"kernel": jnp.asarray(rng.randn(H, H).astype(np.float32) * 0.1)}
    res = jnp.asarray(rng.randn(2, 256, H).astype(np.float32) * 0.5)
    key = jax.random.PRNGKey(3)
    layers.set_ffn_fused(True)
    try:
        y_fused = layers.dense_residual_ln_apply(
            p, p_ln, x, res, jnp.float32, out_rng=key, out_dropout=0.5)
        y_eval = layers.dense_residual_ln_apply(p, p_ln, x, res,
                                                jnp.float32)
        layers.set_ffn_dropout_fused(False)
        y_off = layers.dense_residual_ln_apply(
            p, p_ln, x, res, jnp.float32, out_rng=key, out_dropout=0.5)
    finally:
        layers.set_ffn_fused(None)
        layers.set_ffn_dropout_fused(True)
    assert not np.array_equal(np.asarray(y_fused), np.asarray(y_eval))
    a = layers.dropout(layers.dense(p, x, jnp.float32), 0.5, key)
    ref = layers.layer_norm(p_ln, res + a, 1e-5)
    np.testing.assert_allclose(np.asarray(y_off), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_dispatch_grad_through_jit():
    """Trainer-shaped usage: jit(grad) through the dispatched dropout path
    produces finite grads of the right shape."""
    p1, p2, p_ln, x = _params(12)

    def loss(w1k, xx):
        return jnp.sum(jnp.square(layers.ffn_residual_ln_apply(
            {"kernel": w1k, "bias": p1["bias"]}, p2, p_ln, xx, "gelu",
            jnp.float32, act_rng=jax.random.PRNGKey(5), act_dropout=0.1,
            out_rng=jax.random.PRNGKey(6), out_dropout=0.1)))

    layers.set_ffn_fused(True)
    try:
        gv = jax.jit(jax.grad(loss))(p1["kernel"], x)
    finally:
        layers.set_ffn_fused(None)
    assert gv.shape == (H, F)
    assert bool(jnp.all(jnp.isfinite(gv)))
    assert float(jnp.abs(gv).max()) > 0.0


def test_mask_distribution_uniform_across_program_ids():
    """Distribution assertion for the PRNG dropout stream (VERDICT r4 #8):
    the (seed, program_id) regeneration scheme must behave like an i.i.d.
    Bernoulli(1-rate) field — uniform across grid blocks (no program_id
    bias), across rows and columns (no lane/sublane structure), and with
    distinct bits per block (no stream reuse between program_ids)."""
    rate = 0.25
    n, cols, bc = 2048, 256, 128
    m = np.asarray(_regen(11, n, cols, rate, bc)) > 0   # keep indicator

    # global keep rate: 4-sigma Bernoulli bound on n*cols draws
    p = 1 - rate
    sigma = np.sqrt(p * (1 - p) / (n * cols))
    assert abs(m.mean() - p) < 4 * sigma, m.mean()

    # per-block keep rates (the program_id axis): every (BR x bc) block
    # within 5 sigma of p — a biased pid stream would blow this
    blocks = m.reshape(n // BR, BR, cols // bc, bc)
    bm = blocks.mean(axis=(1, 3))
    bsig = np.sqrt(p * (1 - p) / (BR * bc))
    assert np.abs(bm - p).max() < 5 * bsig, bm

    # rows and columns: max deviation over cols tests of sqrt(n) scale
    rsig = np.sqrt(p * (1 - p) / cols)
    assert np.abs(m.mean(axis=1) - p).max() < 6 * rsig
    csig = np.sqrt(p * (1 - p) / n)
    assert np.abs(m.mean(axis=0) - p).max() < 6 * csig

    # blocks draw DISTINCT streams: no two grid blocks share their bits
    flat = blocks.transpose(0, 2, 1, 3).reshape(-1, BR * bc)
    for i in range(flat.shape[0]):
        for j in range(i + 1, flat.shape[0]):
            assert not np.array_equal(flat[i], flat[j]), (i, j)

    # adjacent-cell independence probe: P(keep | left neighbor kept) ~ p
    both = (m[:, 1:] & m[:, :-1]).mean()
    cond = both / max(m[:, :-1].mean(), 1e-9)
    assert abs(cond - p) < 6 * rsig, cond
