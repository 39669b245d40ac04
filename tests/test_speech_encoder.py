"""Speech encoder structural + op tests (mirrors reference
test/test_model.py:18-53 assertion families)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechmix_tpu.config import SPEECH_ENCODER_PRESETS, SpeechEncoderConfig
from speechmix_tpu.models import speech_encoder as se


CFG = SPEECH_ENCODER_PRESETS["tiny-speech"]


@pytest.fixture(scope="module")
def params():
    return se.init_speech_encoder(jax.random.PRNGKey(0), CFG)


def test_feature_lengths_formula():
    # conv stack (k=10,s=5),(3,2),(3,2): 16000 samples -> 799 frames
    l = CFG.feature_lengths(np.array([16000]))
    expect = 16000
    for k, s in zip(CFG.conv_kernels, CFG.conv_strides):
        expect = (expect - k) // s + 1
    assert l[0] == expect


def test_forward_shapes(params):
    wav = jnp.zeros((2, 16000))
    out = se.speech_encoder_apply(params, CFG, wav,
                                  output_hidden_states=True)
    t = CFG.feature_lengths(np.array([16000]))[0]
    assert out["last_hidden_state"].shape == (2, t, CFG.hidden_size)
    # hidden_states: embedding output + one per layer (HF L+1 convention)
    assert out["hidden_states"].shape[0] == CFG.num_layers + 1


def test_truncate_layers(params):
    # share_layer_ratio semantics: keep bottom num_keep layers
    for keep in [0, 2, 4]:
        p = se.truncate_layers(params, keep)
        n = jax.tree_util.tree_leaves(p["layers"])[0].shape[0]
        assert n == keep


def test_masking_padded_equals_unpadded(params):
    """Padded-batch forward == per-example forward on valid region — proves
    masks actually stop padding leakage (the reference has no masks)."""
    rng = np.random.RandomState(1)
    short = rng.randn(8000).astype(np.float32) * 0.1
    padded = np.zeros(16000, np.float32)
    padded[:8000] = short

    out_padded = se.speech_encoder_apply(
        params, CFG, jnp.asarray(padded)[None],
        lengths=jnp.array([8000]))
    out_exact = se.speech_encoder_apply(params, CFG, jnp.asarray(short)[None])

    n = int(out_exact["frame_lengths"][0])
    # pos-conv has a wide receptive field crossing the boundary; interior
    # frames (outside the kernel half-width) must match closely
    margin = CFG.pos_conv_kernel
    a = np.asarray(out_padded["last_hidden_state"])[0, margin:n - margin]
    b = np.asarray(out_exact["last_hidden_state"])[0, margin:n - margin]
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


def test_large_variant_graph():
    cfg = SpeechEncoderConfig(
        name="tiny-large", conv_dims=(16, 16), conv_kernels=(10, 3),
        conv_strides=(5, 2), conv_bias=True, feat_extract_norm="layer",
        hidden_size=32, num_layers=2, num_heads=2, ffn_dim=64,
        do_stable_layer_norm=True, pos_conv_kernel=8, pos_conv_groups=2)
    p = se.init_speech_encoder(jax.random.PRNGKey(0), cfg)
    out = se.speech_encoder_apply(p, cfg, jnp.zeros((1, 8000)))
    assert out["last_hidden_state"].shape[-1] == 32
    assert np.all(np.isfinite(np.asarray(out["last_hidden_state"])))


@pytest.mark.parametrize("preset", ["tiny-speech", "wav2vec2-base"])
@pytest.mark.parametrize("t_samples", [16000, 16001, 12345])
def test_extractor_pairs_matches_conv(preset, t_samples):
    """The row-merge "pairs" lowering (layers._conv1d_pairs) is numerically
    the conv it replaces, for every wav2vec2 layer shape (k<=2s) and for
    awkward input lengths that need slack padding."""
    import dataclasses
    cfg = SPEECH_ENCODER_PRESETS[preset]
    params = se.init_speech_encoder(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(0)
    b = 2
    wav = jnp.asarray(rng.randn(b, t_samples).astype(np.float32) * 0.1)
    lengths = jnp.asarray([t_samples, t_samples - 2111], jnp.int32)

    cfg_conv = dataclasses.replace(cfg, extractor_impl="conv")
    cfg_pairs = dataclasses.replace(cfg, extractor_impl="pairs")
    ref = se.extract_features(params, cfg_conv, wav, lengths)
    got = se.extract_features(params, cfg_pairs, wav, lengths)
    assert got.shape == ref.shape
    valid = np.asarray(cfg.feature_lengths(np.asarray(lengths)))
    for i in range(b):
        np.testing.assert_allclose(np.asarray(got[i, :valid[i]]),
                                   np.asarray(ref[i, :valid[i]]),
                                   atol=2e-5, rtol=2e-5)


def test_extractor_pairs_no_lengths():
    """lengths=None: pairs padding must not leak into group-norm stats."""
    import dataclasses
    cfg = SPEECH_ENCODER_PRESETS["tiny-speech"]
    params = se.init_speech_encoder(jax.random.PRNGKey(2), cfg)
    rng = np.random.RandomState(3)
    wav = jnp.asarray(rng.randn(1, 8000).astype(np.float32) * 0.1)
    ref = se.extract_features(params, dataclasses.replace(
        cfg, extractor_impl="conv"), wav, None)
    got = se.extract_features(params, dataclasses.replace(
        cfg, extractor_impl="pairs"), wav, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_aligned_samples():
    """aligned_samples returns the smallest padded sample count whose frame
    count is a multiple of 8 (odd frame counts measured ~6% slower per
    encoder pass — PERF.md)."""
    from speechmix_tpu.config import SPEECH_ENCODER_PRESETS
    cfg = SPEECH_ENCODER_PRESETS["wav2vec2-base"]
    for n in [256000, 256080, 64000, 12345]:
        a = cfg.aligned_samples(n)
        assert a >= n
        assert int(cfg.feature_lengths(a)) % 8 == 0
        # already-aligned inputs are unchanged
        assert cfg.aligned_samples(a) == a
    assert int(cfg.feature_lengths(cfg.aligned_samples(256000))) == 800


def test_spec_augment_time_mask_semantics():
    """compute_time_mask: spans of mask_time_length inside the valid
    region, span count within [min_masks, L // mask_len], deterministic
    per rng."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from speechmix_tpu.models import speech_encoder as se

    b, t, mlen, prob, min_masks = 8, 200, 10, 0.2, 2
    lengths = jnp.asarray(np.linspace(60, 200, b, dtype=np.int32))
    rng = jax.random.PRNGKey(3)
    m = np.asarray(se.compute_time_mask(rng, b, t, lengths, prob, mlen,
                                        min_masks))
    m2 = np.asarray(se.compute_time_mask(rng, b, t, lengths, prob, mlen,
                                         min_masks))
    np.testing.assert_array_equal(m, m2)  # deterministic per rng
    L = np.asarray(lengths)
    for i in range(b):
        # nothing masked beyond the valid region
        assert not m[i, L[i]:].any()
        # masked frames between min_masks*mlen*(could overlap: >= mlen) and
        # the cap; at least one span exists
        n_masked = m[i].sum()
        assert mlen <= n_masked <= (L[i] // mlen) * mlen
        # every masked run is at most ... spans can merge; check each
        # maximal run length is a multiple-of-nothing but >= 1; instead
        # check total spans estimate: runs boundaries
        runs = np.diff(np.concatenate([[0], m[i].astype(int), [0]]))
        starts = (runs == 1).sum()
        assert starts >= 1


def test_spec_augment_applies_only_in_training():
    """Training forward (dropout_rng given) with apply_spec_augment differs
    from inference; inference output is unchanged by the flag."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from speechmix_tpu.config import SPEECH_ENCODER_PRESETS
    from speechmix_tpu.models import speech_encoder as se

    base = SPEECH_ENCODER_PRESETS["tiny-speech"]
    cfg = dataclasses.replace(
        base, apply_spec_augment=True, mask_time_prob=0.5,
        # disable dropout so the only stochastic difference is SpecAugment
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0)
    params = se.init_speech_encoder(jax.random.PRNGKey(0), cfg)
    assert "masked_spec_embed" in params
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 3200)
                      .astype(np.float32))

    infer = se.speech_encoder_apply(params, cfg, wav)["last_hidden_state"]
    train = se.speech_encoder_apply(
        params, cfg, wav, dropout_rng=jax.random.PRNGKey(5)
    )["last_hidden_state"]
    assert not np.allclose(np.asarray(infer), np.asarray(train))

    off = dataclasses.replace(cfg, apply_spec_augment=False)
    train_off = se.speech_encoder_apply(
        params, off, wav, dropout_rng=jax.random.PRNGKey(5)
    )["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(infer), np.asarray(train_off),
                               rtol=1e-5, atol=1e-6)


def test_layerdrop_semantics():
    """LayerDrop: layerdrop=1.0 in training passes hidden states through
    every layer unchanged (output == the pre-layer embedding output);
    inference is unaffected by the setting."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from speechmix_tpu.config import SPEECH_ENCODER_PRESETS
    from speechmix_tpu.models import speech_encoder as se

    base = SPEECH_ENCODER_PRESETS["tiny-speech"]
    cfg = dataclasses.replace(
        base, layerdrop=1.0, apply_spec_augment=False,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0)
    params = se.init_speech_encoder(jax.random.PRNGKey(0), cfg)
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 3200)
                      .astype(np.float32))

    out = se.speech_encoder_apply(params, cfg, wav,
                                  dropout_rng=jax.random.PRNGKey(7),
                                  output_hidden_states=True)
    hs = np.asarray(out["hidden_states"])  # (L+1, B, T, H)
    # every layer skipped: all per-layer states equal the embedding output
    for i in range(1, hs.shape[0]):
        np.testing.assert_allclose(hs[i], hs[0], rtol=1e-6, atol=1e-7)

    # inference (no rng): layerdrop must not engage
    infer_hi = se.speech_encoder_apply(params, cfg, wav)["last_hidden_state"]
    infer_off = se.speech_encoder_apply(
        params, dataclasses.replace(cfg, layerdrop=0.0), wav
    )["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(infer_hi), np.asarray(infer_off),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("preset", ["tiny-speech", "wav2vec2-base"])
@pytest.mark.parametrize("t_samples", [16000, 12345])
def test_extractor_taps_matches_conv(preset, t_samples):
    """The per-tap strided-slice gemm lowering (layers._conv1d_taps) is
    numerically the conv it replaces (no concat, no row-merge reshape —
    the round-4 candidate for the extractor's MFU gap, PERF.md)."""
    import dataclasses
    cfg = SPEECH_ENCODER_PRESETS[preset]
    params = se.init_speech_encoder(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(0)
    b = 2
    wav = jnp.asarray(rng.randn(b, t_samples).astype(np.float32) * 0.1)
    lengths = jnp.asarray([t_samples, t_samples - 2111], jnp.int32)

    cfg_conv = dataclasses.replace(cfg, extractor_impl="conv")
    cfg_taps = dataclasses.replace(cfg, extractor_impl="taps")
    ref = se.extract_features(params, cfg_conv, wav, lengths)
    got = se.extract_features(params, cfg_taps, wav, lengths)
    assert got.shape == ref.shape
    valid = np.asarray(cfg.feature_lengths(np.asarray(lengths)))
    for i in range(b):
        np.testing.assert_allclose(np.asarray(got[i, :valid[i]]),
                                   np.asarray(ref[i, :valid[i]]),
                                   atol=2e-5, rtol=2e-5)
