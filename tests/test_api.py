"""Reference-compatible API surface tests (mirrors the usage patterns of
test/test_model.py + test/test_hf_model.py against speechmix_tpu.api)."""

import numpy as np
import pytest

import speechmix_tpu


def make(cls_name, **kw):
    cls = getattr(speechmix_tpu, cls_name)
    kw.setdefault("speech_model_config", "tiny-speech")
    kw.setdefault("nlp_model_config", "tiny-bart-bytes")
    return cls(**kw)


def test_constructor_surface_and_bookkeeping():
    spm = make("SpeechMixEED", share_layer_ratio=0, down_scale=8,
               weighted_sum=False, fixed_parameters=False)
    assert spm.speech_encoder_layer == 4
    assert spm.nlp_encoder_layer == 2
    assert len(spm.list_no_grad) == 0  # all trainable by default


def test_share_layer_pairs():
    for ratio, expect in [(1, 0), (0.5, 2), (0, 4)]:
        spm = make("SpeechMixEED", share_layer_ratio=ratio, down_scale=8)
        assert spm.speech_encoder_layer == expect
        assert len(spm.list_no_grad) == 0


def test_weighted_sum_conventions():
    s3 = make("SpeechMixEED", weighted_sum=True)
    hf = make("HFSpeechMixEED", weighted_sum=True)
    assert s3.weights_sum.shape[0] == 4       # L  (test_model.py:35)
    assert hf.weights_sum.shape[0] == 5       # L+1 (test_hf_model.py:43)


def test_forward_and_generate():
    spm = make("HFSpeechMixEED", share_layer_ratio=0.5, down_scale=4)
    rng = np.random.RandomState(0)
    wav = rng.randn(16000).astype(np.float32) * 0.1
    labels = np.array([spm.tokenizer.encode("hello")])
    out = spm([wav], labels=labels, return_model_detail=True)
    assert np.isfinite(float(out["loss"]))
    assert out["logits"].shape[-1] == spm.config.decoder.vocab_size
    before = out["shape_before_length_adapter"][1]
    after = out["shape_before_enc_dec_projector"][1]
    assert round(before / after) == 4

    tokens = spm.generate([wav], max_length=8)
    decoded = spm.tokenizer.decode(np.asarray(tokens[0]),
                                   skip_special_tokens=True)
    assert isinstance(decoded, str)


def test_fixed_variant_freezes_nlp():
    spm = make("SpeechMixFixed", fixed_nlp=True, fixed_speech=False)
    assert any(p.startswith("nlp") for p in spm.list_no_grad)
    assert all(not p.startswith("nlp") for p in spm.list_grad)


def test_ed_variant_forward():
    spm = make("SpeechMixED")
    assert spm.config.down_scale == 1  # ED default: no down-scaling
    rng = np.random.RandomState(0)
    wav = rng.randn(8000).astype(np.float32) * 0.1
    labels = np.array([spm.tokenizer.encode("hi")])
    out = spm([wav], labels=labels)
    assert np.isfinite(float(out["loss"]))


def test_save_load_weights(tmp_path):
    spm = make("SpeechMixEED", down_scale=4)
    path = str(tmp_path / "w.npz")
    spm.save_weights(path)
    spm2 = make("SpeechMixEED", down_scale=4, seed=99)
    l_before = np.asarray(
        spm2.params["enc_to_dec_proj"]["kernel"]).copy()
    spm2.load_weights(path)
    l_after = np.asarray(spm2.params["enc_to_dec_proj"]["kernel"])
    assert not np.allclose(l_before, l_after)
    np.testing.assert_array_equal(
        l_after, np.asarray(spm.params["enc_to_dec_proj"]["kernel"]))


def test_ed_variant_generate():
    """M8 parity: the ED (cross-attention fusion) family exposes the full
    generation surface too (ref hf_model.py:82-182 is a PreTrainedModel)."""
    spm = make("SpeechMixED", down_scale=4)
    wav = np.random.RandomState(0).randn(2, 8000).astype(np.float32) * 0.1
    toks = spm.generate(wav, max_length=8)
    assert np.asarray(toks).shape == (2, 8)
    text = spm.tokenizer.decode(np.asarray(toks[0]), skip_special_tokens=True)
    assert isinstance(text, str)


def test_generate_early_stop_matches_full_scan():
    """early_stop=True (lax.while_loop exit once all rows emit EOS) must be
    output-identical to the fixed-length scan."""
    import jax.numpy as jnp
    from speechmix_tpu import generation as gen_lib

    spm = make("SpeechMixEED", down_scale=4)
    rng = np.random.RandomState(1)
    wav = jnp.asarray(rng.randn(2, 8000).astype(np.float32) * 0.1)
    lengths = jnp.asarray([8000, 6000], np.int32)
    a, la = gen_lib.generate(spm.params, spm.config, wav, lengths,
                             max_length=12, early_stop=False)
    b, lb = gen_lib.generate(spm.params, spm.config, wav, lengths,
                             max_length=12, early_stop=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_generate_min_length_reachable_from_api():
    """min_length is exposed through the user-facing generate() (advisor
    round-2 finding: it existed only in generation.py)."""
    spm = make("HFSpeechMixEED", down_scale=8)
    rng = np.random.RandomState(11)
    wav = rng.randn(16000).astype(np.float32) * 0.1
    toks = np.asarray(spm.generate([wav], max_length=10, min_length=8))
    eos = spm.config.decoder.eos_token_id
    assert (toks[0, :7] != eos).all()


def test_generate_early_stopping_kwarg():
    """early_stopping reaches beam search through the api surface (the HF
    generate(num_beams=..., early_stopping=True) idiom)."""
    spm = make("SpeechMixEED", down_scale=8)
    rng = np.random.RandomState(17)
    wav = (rng.randn(8000) * 0.1).astype(np.float32)
    a = np.asarray(spm.generate([wav], max_length=8, num_beams=2,
                                early_stopping=True))
    b = np.asarray(spm.generate([wav], max_length=8, num_beams=2,
                                early_stopping="never"))
    assert a.shape == b.shape  # both modes compile and run


def test_from_pretrained_roundtrips_freezing_kwargs(tmp_path):
    """SpeechMixFixed(fixed_speech=True, fixed_nlp=False) must round-trip
    through save_pretrained/from_pretrained with the SAME trainable mask
    (the kwargs were silently reset to defaults before)."""
    spm = make("SpeechMixFixed", fixed_speech=True, fixed_nlp=False)
    d = str(tmp_path / "fixed")
    spm.save_pretrained(d)
    spm2 = speechmix_tpu.SpeechMixFixed.from_pretrained(d)
    assert spm2._variant_kwargs == spm._variant_kwargs
    assert sorted(spm2.list_grad) == sorted(spm.list_grad)
    assert sorted(spm2.list_no_grad) == sorted(spm.list_no_grad)
    # and a default-kwargs model still round-trips without the sidecar
    base = make("SpeechMixEED", down_scale=8)
    d2 = str(tmp_path / "eed")
    base.save_pretrained(d2)
    import os
    assert not os.path.exists(os.path.join(d2, "model_kwargs.json"))
    base2 = speechmix_tpu.SpeechMixEED.from_pretrained(d2)
    assert sorted(base2.list_grad) == sorted(base.list_grad)


def test_load_state_dict_pickle_gate(tmp_path):
    """The unrestricted torch.load fallback (fairseq/s3prl checkpoints that
    pickle an args Namespace beside the weights) fires only on the specific
    weights-only rejection, warns with the file name, and is refusable via
    allow_pickle=False (advisor round-4 medium finding; convert.py)."""
    import argparse
    import warnings as warnings_mod

    import pytest as pt
    torch = pt.importorskip("torch")
    from speechmix_tpu import convert

    # plain tensor checkpoint: loads with no warning
    clean = str(tmp_path / "clean.bin")
    torch.save({"w": torch.zeros(2)}, clean)
    with warnings_mod.catch_warnings():
        warnings_mod.simplefilter("error")
        sd = convert.load_state_dict(clean)
    assert sd["w"].shape == (2,)

    # fairseq-style: non-tensor Namespace -> warns + falls back
    dirty = str(tmp_path / "fairseq.pt")
    torch.save({"args": argparse.Namespace(arch="wav2vec2"),
                "model": {"w": torch.ones(3)}}, dirty)
    with pt.warns(UserWarning, match="fairseq.pt"):
        sd = convert.load_state_dict(dirty)
    assert "model" in sd or any("w" in k for k in sd)

    # allow_pickle=False forbids the fallback
    with pt.raises(Exception):
        convert.load_state_dict(dirty, allow_pickle=False)

    # a genuinely missing file propagates its real error, not a retry
    with pt.raises((FileNotFoundError, OSError, RuntimeError)):
        convert.load_state_dict(str(tmp_path / "missing.bin"))
