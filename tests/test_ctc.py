"""CTC model tests (reference module/model.py Wav2Vec2ForCTC equivalent)."""

import jax
import jax.numpy as jnp
import numpy as np

from speechmix_tpu.config import SPEECH_ENCODER_PRESETS
from speechmix_tpu.models import ctc

CFG = SPEECH_ENCODER_PRESETS["tiny-speech"]
VOCAB = 32


def test_ctc_forward_and_loss():
    params = ctc.init_ctc_model(jax.random.PRNGKey(0), CFG, VOCAB)
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(2, 16000).astype(np.float32) * 0.1)
    labels = jnp.asarray([[5, 6, 7, 0], [8, 9, 0, 0]])
    out = ctc.ctc_apply(params, CFG, wav,
                        lengths=jnp.array([16000, 12000]), labels=labels,
                        label_lengths=jnp.array([3, 2]))
    assert out["logits"].shape[-1] == VOCAB
    assert np.isfinite(float(out["loss"]))


def test_ctc_greedy_decode_collapses():
    logits = jnp.full((1, 6, 4), -10.0)
    # frames: a a blank b b blank  -> decode "a b"
    path = [1, 1, 0, 2, 2, 0]
    logits = logits.at[0, jnp.arange(6), jnp.asarray(path)].set(10.0)
    seqs = ctc.ctc_greedy_decode(logits, jnp.ones((1, 6), bool), blank_id=0)
    assert seqs == [[1, 2]]


def test_ctc_loss_decreases():
    import optax
    params = ctc.init_ctc_model(jax.random.PRNGKey(0), CFG, VOCAB)
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(2, 8000).astype(np.float32) * 0.1)
    labels = jnp.asarray([[5, 6, 7, 5], [8, 9, 8, 9]])

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return ctc.ctc_apply(p, CFG, wav, labels=labels,
                                 label_lengths=jnp.array([4, 4]))["loss"]
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
