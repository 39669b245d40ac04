"""Constrained beam search (force_words_ids) pinned against HuggingFace.

The reference inherits `generate(force_words_ids=...)` through
PreTrainedModel.generate (hf_model.py:304-338), which dispatches to
constrained beam search.  transformers 4.57 moved the constrained DRIVER
LOOP behind trust_remote_code + a hub download (unreachable offline), but
the entire constrained selection machinery — ConstrainedBeamSearchScorer
(process/finalize, bank round-robin, forced-advance candidates, dedup,
constraint fallback) and PhrasalConstraint/DisjunctiveConstraint — still
ships in the installed package.  Verification strategy (mirrors the group
beam strategy in test_beam_hf.py):

  1. drive HF's ACTUAL ConstrainedBeamSearchScorer with the thin removed
     loop (forward -> log_softmax -> +beam_scores -> topk(2K) ->
     scorer.process -> reorder; scorer.finalize at the end — the loop
     itself contains no constrained logic), and pin
     generation.constrained_beam_search token-exact against it;
  2. property tests: every returned sequence contains every forced word;
  3. HF's generate-contract validation errors.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402
from transformers.generation.beam_constraints import (  # noqa: E402
    DisjunctiveConstraint, PhrasalConstraint)
from transformers.generation.beam_search import (  # noqa: E402
    ConstrainedBeamSearchScorer)

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
        name="cbeam-bart", arch="bart", vocab_size=VOCAB, hidden_size=HID,
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


def _constraints(force_words_ids):
    """force_words_ids -> Constraint objects, exactly as the removed
    GenerationMixin code built them (nested list = disjunctive)."""
    out = []
    for entry in force_words_ids:
        if isinstance(entry[0], (list, tuple)):
            out.append(DisjunctiveConstraint([list(w) for w in entry]))
        else:
            out.append(PhrasalConstraint(list(entry)))
    return out


def _hf_constrained(hf, ids, max_new, force_words_ids, num_beams=4,
                    length_penalty=1.0, early_stopping=False, nret=1):
    """The removed `_constrained_beam_search` driver loop around HF's
    installed ConstrainedBeamSearchScorer — every constrained decision
    (forced-advance candidates, bank round-robin, EOS completion gating,
    fallback finalize) is HF's executed code."""
    b = ids.shape[0]
    k = num_beams
    vocab = hf.config.vocab_size
    max_length = max_new + 1          # HF counts the decoder start
    scorer = ConstrainedBeamSearchScorer(
        batch_size=b, num_beams=k,
        constraints=_constraints(force_words_ids),
        device=torch.device("cpu"), length_penalty=length_penalty,
        do_early_stopping=early_stopping, num_beam_hyps_to_keep=nret,
        max_length=max_length)
    enc_ids = torch.tensor(np.repeat(ids, k, axis=0))
    dec = torch.full((b * k, 1), hf.config.decoder_start_token_id,
                     dtype=torch.long)
    beam_scores = torch.zeros((b, k))
    beam_scores[:, 1:] = -1e9
    beam_scores = beam_scores.view(b * k)
    cur_len = 1
    with torch.no_grad():
        while cur_len < max_length and not scorer.is_done:
            logits = hf(input_ids=enc_ids,
                        decoder_input_ids=dec).logits[:, -1, :]
            scores = torch.log_softmax(logits, dim=-1)
            scores = scores + beam_scores[:, None]
            scores_for_all_vocab = scores.clone()
            flat = scores.view(b, k * vocab)
            topk_scores, topk_idx = torch.topk(flat, 2 * k, dim=1,
                                               largest=True, sorted=True)
            next_indices = torch.div(topk_idx, vocab,
                                     rounding_mode="floor")
            next_tokens = topk_idx % vocab
            out = scorer.process(
                dec, topk_scores, next_tokens, next_indices,
                scores_for_all_vocab,
                pad_token_id=hf.config.pad_token_id,
                eos_token_id=hf.config.eos_token_id,
                decoder_prompt_len=1)
            beam_scores = out["next_beam_scores"]
            beam_idx = out["next_beam_indices"]
            dec = torch.cat([dec[beam_idx, :],
                             out["next_beam_tokens"].unsqueeze(-1)], dim=-1)
            cur_len += 1
        final = scorer.finalize(
            dec, beam_scores, None, None,
            pad_token_id=hf.config.pad_token_id,
            eos_token_id=hf.config.eos_token_id, max_length=max_length,
            decoder_prompt_len=1)
    return final["sequences"].numpy(), \
        final["sequence_scores"].numpy()


def _ours(params, cfg, ids, max_new, force_words_ids, num_beams=4,
          length_penalty=1.0, early_stopping=False, nret=1):
    enc = s2s.encode(params, cfg, input_ids=jnp.asarray(ids))
    toks, lengths, scores = generation.constrained_beam_search(
        params, cfg, enc["last_hidden_state"], enc["mask"], max_new,
        force_words_ids, num_beams=num_beams, length_penalty=length_penalty,
        early_stopping=early_stopping, num_return_sequences=nret,
        output_scores=True)
    return np.asarray(toks), np.asarray(lengths), np.asarray(scores)


IDS = [
    np.array([[5, 9, 13, 2], [7, 11, 3, 2]]),
    np.array([[20, 21, 22, 23, 2]]),
    np.array([[30, 31, 2], [32, 33, 2], [34, 35, 2]]),
]


def _assert_rows_match(toks, lengths, ref, pad):
    for b in range(ref.shape[0]):
        ref_row = ref[b, 1:]  # strip decoder_start
        n = int(lengths[b])
        np.testing.assert_array_equal(toks[b, :n], ref_row[:n])
        assert (toks[b, n:] == pad).all()
        assert (ref_row[n:] == pad).all()


@pytest.mark.parametrize("length_penalty", [1.0, 0.6])
@pytest.mark.parametrize("force", [
    [[10, 12]],                    # one phrasal bigram
    [[37]],                        # single forced token
    [[10, 12], [40]],              # two constraints
])
def test_constrained_beam_matches_hf_scorer(bart_pair, length_penalty,
                                            force):
    hf, params, cfg = bart_pair
    ids, max_new = IDS[0], 12
    ref, ref_scores = _hf_constrained(hf, ids, max_new, force,
                                      length_penalty=length_penalty)
    toks, lengths, scores = _ours(params, cfg, ids, max_new, force,
                                  length_penalty=length_penalty)
    _assert_rows_match(toks, lengths, ref, cfg.pad_token_id)
    np.testing.assert_allclose(scores, ref_scores, rtol=1e-4, atol=1e-5)


def test_constrained_beam_disjunctive_matches_hf_scorer(bart_pair):
    hf, params, cfg = bart_pair
    ids, max_new = IDS[1], 12
    force = [[[10, 12], [11]]]     # disjunctive: either word satisfies
    ref, _ = _hf_constrained(hf, ids, max_new, force)
    toks, lengths, _ = _ours(params, cfg, ids, max_new, force)
    _assert_rows_match(toks, lengths, ref, cfg.pad_token_id)


def test_constrained_beam_nret_matches_hf_scorer(bart_pair):
    hf, params, cfg = bart_pair
    ids, max_new = IDS[2], 10
    force = [[25]]
    ref, _ = _hf_constrained(hf, ids, max_new, force, num_beams=4, nret=2)
    toks, lengths, _ = _ours(params, cfg, ids, max_new, force,
                             num_beams=4, nret=2)
    _assert_rows_match(toks, lengths, ref, cfg.pad_token_id)


def test_constrained_beam_early_stopping_matches_hf_scorer(bart_pair):
    hf, params, cfg = bart_pair
    ids, max_new = IDS[0], 12
    force = [[10, 12]]
    ref, _ = _hf_constrained(hf, ids, max_new, force, early_stopping=True)
    toks, lengths, _ = _ours(params, cfg, ids, max_new, force,
                             early_stopping=True)
    _assert_rows_match(toks, lengths, ref, cfg.pad_token_id)


def _contains(seq, word):
    seq = list(seq)
    w = list(word)
    return any(seq[i:i + len(w)] == w for i in range(len(seq) - len(w) + 1))


@pytest.mark.parametrize("force", [[[10, 12]], [[37]], [[10, 12], [40]]])
def test_forced_words_present(bart_pair, force):
    hf, params, cfg = bart_pair
    toks, lengths, _ = _ours(params, cfg, IDS[0], 12, force)
    for b in range(toks.shape[0]):
        row = toks[b, : int(lengths[b])].tolist()
        for word in force:
            assert _contains(row, word), (row, word)


def test_forced_disjunctive_present(bart_pair):
    hf, params, cfg = bart_pair
    force = [[[10, 12], [11]]]
    toks, lengths, _ = _ours(params, cfg, IDS[1], 12, force)
    for b in range(toks.shape[0]):
        row = toks[b, : int(lengths[b])].tolist()
        assert _contains(row, [10, 12]) or _contains(row, [11]), row


def test_generate_contract_errors(bart_pair):
    hf, params, cfg = bart_pair
    enc = s2s.encode(params, cfg, input_ids=jnp.asarray(IDS[1]))
    h, m = enc["last_hidden_state"], enc["mask"]
    with pytest.raises(ValueError, match="non-empty list"):
        generation.constrained_beam_search(params, cfg, h, m, 8, [])
    with pytest.raises(ValueError, match="positive integers"):
        generation.constrained_beam_search(params, cfg, h, m, 8, [[-3]])
    with pytest.raises(ValueError, match="subset"):
        generation.constrained_beam_search(
            params, cfg, h, m, 8, [[[10, 12], [10]]])
    with pytest.raises(ValueError, match="strictly greater than 1"):
        generation.constrained_beam_search(params, cfg, h, m, 8, [[10]],
                                           num_beams=1)


def test_generate_dispatch_contract_errors():
    from speechmix_tpu import generation as g
    import inspect
    sig = inspect.signature(g.generate)
    assert "force_words_ids" in sig.parameters
