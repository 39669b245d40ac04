"""Manual greedy-decode demo (the reference's eval.ipynb as a script).

The reference notebook repeatedly calls forward with a growing
decoder_input_ids, argmaxing the last position until EOS — proving
forward-only greedy decode matches generate().  Same demo here, against the
jitted generate() path, on a synthetic utterance (offline).

    python examples/manual_greedy_decode.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax.numpy as jnp
import numpy as np

from speechmix_tpu import HFSpeechMixEED
from speechmix_tpu.data.datasets import synthetic_corpus
from speechmix_tpu.models import seq2seq, speechmix as smx


def main():
    spm = HFSpeechMixEED("tiny-speech", "tiny-bart-bytes",
                         share_layer_ratio=0.4, down_scale=8)
    ex = synthetic_corpus(1, seed=0)[0]
    wav = ex["audio"]
    print("reference text:", ex["text"])

    # path 1: jitted static-shape generate()
    tokens = spm.generate([wav], max_length=16)
    print("generate():", spm.tokenizer.decode(np.asarray(tokens[0])) or
          "<empty>", list(np.asarray(tokens[0])))

    # path 2: manual greedy loop through forward (eval.ipynb style)
    dcfg = spm.config.decoder
    batch = jnp.asarray(wav, jnp.float32)[None]
    embeds, mask, _ = smx.encode_speech(spm.params, spm.config, batch)
    enc_out = seq2seq.encode(spm.params["nlp"], dcfg, inputs_embeds=embeds,
                             attention_mask=mask)
    dec = [dcfg.decoder_start_token_id]
    for _ in range(16):
        out = seq2seq.decode(spm.params["nlp"], dcfg, jnp.asarray([dec]),
                             enc_hidden=enc_out["last_hidden_state"],
                             encoder_mask=enc_out["mask"])
        nxt = int(jnp.argmax(out["logits"][0, -1]))
        dec.append(nxt)
        if nxt == dcfg.eos_token_id:
            break
    print("manual loop:", dec[1:])
    got = [t for t in np.asarray(tokens[0]).tolist()
           if t != dcfg.pad_token_id]
    assert got == dec[1:], (got, dec[1:])
    print("manual greedy == generate(): OK")


if __name__ == "__main__":
    main()
