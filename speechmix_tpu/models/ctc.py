"""CTC head over the speech encoder (reference: speechmix/module/model.py's
Wav2Vec2ForCTC copy, 9-91 — vestigial there, first-class here).

SpeechEncoderForCTC = speech encoder -> dropout -> Linear(hidden, vocab),
trained with CTC loss (optax.ctc_loss, computed in fp32 like the reference's
cudnn-disabled fp32 CTC at module/model.py:77-86).  Useful both for CTC-only
ASR and as a diagnostic head when pretraining/validating encoder ports.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..config import SpeechEncoderConfig
from ..ops import layers
from . import speech_encoder as se


def init_ctc_model(key, cfg: SpeechEncoderConfig, vocab_size: int):
    k1, k2 = jax.random.split(key)
    return {
        "encoder": se.init_speech_encoder(k1, cfg),
        "lm_head": layers.init_dense(k2, cfg.hidden_size, vocab_size),
    }


def ctc_apply(params, cfg: SpeechEncoderConfig, input_values, lengths=None,
              labels=None, label_lengths=None, blank_id: int = 0,
              use_flash=False, dtype=jnp.float32):
    """Forward + optional CTC loss.

    labels: (B, L) padded with blank_id beyond label_lengths.
    Returns dict(logits (B, T, V), frame_lengths[, loss]).
    """
    enc = se.speech_encoder_apply(params["encoder"], cfg, input_values,
                                  lengths, use_flash=use_flash, dtype=dtype)
    logits = layers.dense(params["lm_head"], enc["last_hidden_state"],
                          dtype).astype(jnp.float32)
    out = {"logits": logits, "frame_lengths": enc["frame_lengths"],
           "frame_mask": enc["frame_mask"]}
    if labels is not None:
        b, t = logits.shape[:2]
        logit_pad = 1.0 - enc["frame_mask"].astype(jnp.float32)
        if label_lengths is None:
            label_lengths = jnp.sum((labels != blank_id).astype(jnp.int32),
                                    axis=-1)
        label_pad = (jnp.arange(labels.shape[1])[None, :] >=
                     label_lengths[:, None]).astype(jnp.float32)
        per_seq = optax.ctc_loss(logits, logit_pad, labels, label_pad,
                                 blank_id=blank_id)
        out["loss"] = per_seq.mean()
    return out


def ctc_greedy_decode(logits, frame_mask, blank_id: int = 0):
    """Best-path decode: argmax per frame, collapse repeats, drop blanks.
    Returns a list of python int lists (host-side)."""
    import numpy as np
    ids = np.asarray(jnp.argmax(logits, axis=-1))
    mask = np.asarray(frame_mask)
    outs = []
    for row, m in zip(ids, mask):
        row = row[: int(m.sum())]
        prev = -1
        seq = []
        for t in row:
            if t != prev and t != blank_id:
                seq.append(int(t))
            prev = t
        outs.append(seq)
    return outs
