"""Beam search pinned token-exact against HuggingFace generate().

The reference's generation surface IS HF generate (hf_model.py:304-338
delegates to PreTrainedModel.generate); our static lax.while_loop beam
search must reproduce its selection/finalization semantics — length penalty
applied as hypotheses finish, 2*num_beams candidate pool, early-stop
heuristic — not just "some beam search".  Pinned on a tiny offline BART
(text-to-text: identical decoder semantics, no audio dependency)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from speechmix_tpu import convert, generation  # noqa: E402
from speechmix_tpu.config import Seq2SeqConfig  # noqa: E402
from speechmix_tpu.models import seq2seq as s2s  # noqa: E402

VOCAB, HID = 64, 32


@pytest.fixture(scope="module")
def bart_pair():
    torch.manual_seed(3)
    hf_cfg = transformers.BartConfig(
        vocab_size=VOCAB, d_model=HID, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=64,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
        decoder_start_token_id=2, scale_embedding=False,
        activation_function="gelu", forced_eos_token_id=None,
        forced_bos_token_id=None)
    hf = transformers.BartForConditionalGeneration(hf_cfg).eval()

    cfg = Seq2SeqConfig(
        name="beam-bart", arch="bart", vocab_size=VOCAB, hidden_size=HID,
        encoder_layers=2, decoder_layers=2, num_heads=2, ffn_dim=64,
        max_positions=64, pad_token_id=1, bos_token_id=0, eos_token_id=2,
        decoder_start_token_id=2)

    import os
    import tempfile
    sd_path = tempfile.mktemp(suffix=".bin")
    torch.save(hf.state_dict(), sd_path)
    params = convert.load_seq2seq(sd_path, cfg)
    os.remove(sd_path)
    return hf, params, cfg


def _ours(params, cfg, ids, max_new, num_beams, length_penalty,
          early_stopping=False):
    enc = s2s.encode(params, cfg, input_ids=jnp.asarray(ids))
    toks, lengths = generation.beam_search(
        params, cfg, enc["last_hidden_state"], enc["mask"], max_new,
        num_beams=num_beams, length_penalty=length_penalty,
        early_stopping=early_stopping)
    return np.asarray(toks), np.asarray(lengths)


def _hf(hf, ids, max_new, num_beams, length_penalty, early_stopping=False):
    with torch.no_grad():
        out = hf.generate(
            torch.tensor(ids), num_beams=num_beams, max_length=max_new + 1,
            length_penalty=length_penalty, early_stopping=early_stopping,
            do_sample=False)
    return out.numpy()


IDS = [
    np.array([[5, 9, 13, 2], [7, 11, 3, 2]]),
    np.array([[20, 21, 22, 23, 2]]),
    np.array([[30, 31, 2], [32, 33, 2], [34, 35, 2]]),
]


@pytest.mark.parametrize("length_penalty", [1.0, 0.6, 2.0])
@pytest.mark.parametrize("ids_i", [0, 1])
def test_beam_matches_hf(bart_pair, length_penalty, ids_i):
    hf, params, cfg = bart_pair
    ids = IDS[ids_i]
    max_new = 12
    ref = _hf(hf, ids, max_new, 4, length_penalty)
    toks, lengths = _ours(params, cfg, ids, max_new, 4, length_penalty)
    for b in range(ids.shape[0]):
        ref_row = ref[b, 1:]  # strip decoder_start
        # HF crops to the longest finished hypothesis; compare the valid
        # region and require pad after
        n = int(lengths[b])
        ref_valid = ref_row[:n]
        np.testing.assert_array_equal(toks[b, :n], ref_valid)
        assert (toks[b, n:] == cfg.pad_token_id).all()
        assert (ref_row[n:] == cfg.pad_token_id).all()


@pytest.mark.parametrize("early_stopping", [True, "never"])
def test_beam_matches_hf_early_stopping_modes(bart_pair, early_stopping):
    hf, params, cfg = bart_pair
    ids = IDS[2]
    max_new = 10
    ref = _hf(hf, ids, max_new, 3, 1.0, early_stopping)
    toks, lengths = _ours(params, cfg, ids, max_new, 3, 1.0, early_stopping)
    for b in range(ids.shape[0]):
        n = int(lengths[b])
        np.testing.assert_array_equal(toks[b, :n], ref[b, 1:1 + n])
