"""Teacher-target generation: batched, jitted greedy decode.

The reference's `create_self_decoder_input` (train.py:18-34) generates the
training labels by letting the frozen NLP model greedily decode the
ground-truth transcript — one decoder forward PER TOKEN PER EXAMPLE inside a
datasets.map worker (SURVEY.md §3.4 flags this as a dominant preprocessing
cost).  Here the same semantics run as ONE jitted batched decode:

  labels = teacher's greedy output on the tokenized text, truncated at EOS,
  then EOS appended (train.py:54,73)

`make_teacher_fn` compiles per (batch, text_len, max_len) bucket.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Seq2SeqConfig
from ..generation import greedy_decode
from ..models import seq2seq


def _text_bucket(n: int, floor: int = 16) -> int:
    """Smallest power-of-two >= n (min `floor`) — the text-length compile
    grid for teacher decoding."""
    b = floor
    while b < n:
        b *= 2
    return b


@lru_cache(maxsize=None)
def make_teacher_fn(dcfg: Seq2SeqConfig, max_length: int):
    """Returns jitted fn(params, text_ids, text_mask) -> (tokens, lengths):
    greedy decode of the teacher conditioned on the text input.  Memoized
    (configs are frozen dataclasses) so the train and eval prep passes —
    and repeated build_datasets calls — share one jit cache instead of
    re-tracing the full teacher decode per invocation."""

    @jax.jit
    def fn(params, text_ids, text_mask):
        enc_out = seq2seq.encode(params, dcfg, input_ids=text_ids,
                                 attention_mask=text_mask)
        return greedy_decode(params, dcfg, enc_out["last_hidden_state"],
                             enc_out["mask"], max_length)

    return fn


def create_self_decoder_inputs_batched(
        params, dcfg: Seq2SeqConfig, tokenizer, sentences: Sequence[str],
        max_length=None, batch_size: int = 32,
) -> List[Tuple[List[int], List[int]]]:
    """Batched equivalent of the reference per-example loop (train.py:18-34).

    Returns [(text_input_ids, labels_with_eos), ...] per sentence, where
    labels are the teacher's greedy predictions (EOS-terminated, EOS appended
    as the reference does at train.py:54,73).
    """
    max_length = max_length or dcfg.max_length
    encoded = [tokenizer.encode(s, add_special_tokens=True)
               for s in sentences]
    out = []
    fn = make_teacher_fn(dcfg, max_length)

    for start in range(0, len(encoded), batch_size):
        chunk = encoded[start: start + batch_size]
        real = len(chunk)
        # pad the chunk to full batch for a single compiled shape
        while len(chunk) < batch_size:
            chunk.append(chunk[-1])
        # text length snaps to a power-of-two grid so compilation count is
        # O(log max_len), not one per distinct chunk max (the docstring's
        # per-bucket promise)
        t_len = _text_bucket(max(len(c) for c in chunk))
        ids = np.full((batch_size, t_len), dcfg.pad_token_id, np.int32)
        mask = np.zeros((batch_size, t_len), bool)
        for i, c in enumerate(chunk):
            ids[i, : len(c)] = c
            mask[i, : len(c)] = True
        tokens, lengths = fn(params, jnp.asarray(ids), jnp.asarray(mask))
        tokens = np.asarray(tokens)
        lengths = np.asarray(lengths)
        for i in range(real):
            toks = tokens[i][: lengths[i]].tolist()
            # greedy_decode includes EOS when emitted; reference stops
            # BEFORE appending EOS then appends tokenizer.eos explicitly —
            # normalize: strip trailing EOS, then append one
            if toks and toks[-1] == dcfg.eos_token_id:
                toks = toks[:-1]
            toks.append(tokenizer.eos_token_id)
            out.append((encoded[start + i], toks))
    return out
