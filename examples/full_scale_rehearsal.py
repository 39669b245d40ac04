"""Full-scale offline converter rehearsal (real checkpoint turnkey, dry).

Builds FULL-SIZE random-weight HF checkpoints with the real architectures
(wav2vec2-base ~95M params via transformers.Wav2Vec2Config defaults;
facebook/bart-base dims via BartConfig), constructs the reference
HFSpeechMixEED from them with the published eed_fixed recipe
(share_layer_ratio=0.4, down_scale=8 — /root/reference/eval.ipynb), saves
the fused checkpoint in the voidful/speechmix_eed_fixed layout (composite
config.json + pytorch_model.bin), and then drives this framework's turnkey
path end to end at real scale:

  HFSpeechMixEED.from_reference_checkpoint(dir)   (config derived, weights
                                                   converted)
  -> forward-logits parity vs the reference torch model (rtol 2e-3)
  -> TranscriptionPipeline batch decode
  -> export_reference_state_dict -> reference load_state_dict(strict=True)

This retires the converter/tokenizer-plumbing risk for the day real
pretrained weights + LibriSpeech are mounted (then: eval.py
--hf_checkpoint_dir ... --librispeech_dir ... produces the BASELINE.md WER
anchor).  Pure CPU, no network.  Runtime: a few minutes.

    python examples/full_scale_rehearsal.py [workdir]
"""

import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")


def main():
    t0 = time.time()
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="smx_rehearsal_")
    os.makedirs(work, exist_ok=True)
    import json

    import numpy as np
    import torch
    import transformers

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    # -- 1. full-size random backbones, saved as local HF checkpoints -------
    torch.manual_seed(0)
    sp_dir, nlp_dir = os.path.join(work, "w2v2-base"), \
        os.path.join(work, "bart-base")
    w2v_cfg = transformers.Wav2Vec2Config(  # defaults == wav2vec2-base arch
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0)
    transformers.Wav2Vec2Model(w2v_cfg).save_pretrained(sp_dir)
    bart_cfg = transformers.BartConfig(  # facebook/bart-base dims
        vocab_size=50265, d_model=768, encoder_layers=6, decoder_layers=6,
        encoder_attention_heads=12, decoder_attention_heads=12,
        encoder_ffn_dim=3072, decoder_ffn_dim=3072,
        max_position_embeddings=1024, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, activation_function="gelu",
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
        decoder_start_token_id=2, forced_eos_token_id=None)
    transformers.BartForConditionalGeneration(bart_cfg).save_pretrained(
        nlp_dir)
    print(f"[{time.time()-t0:6.1f}s] backbones saved ({sp_dir}, {nlp_dir})")

    # -- 2. reference fused model + eed_fixed-layout checkpoint dir ---------
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "reference_hf_model", "/root/reference/speechmix/hf_model.py")
    REF = importlib.util.module_from_spec(spec)
    sys.modules["reference_hf_model"] = REF
    spec.loader.exec_module(REF)

    # the reference tokenizer load needs tokenizer files; reuse BART's
    # pretrained tokenizer files is impossible offline, so hand a minimal
    # slow-tokenizer vocab (prompt tokenization is not exercised here)
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "<mask>": 4}
    for i in range(5, 300):
        vocab[f"[w{i}]"] = i
    with open(os.path.join(nlp_dir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(nlp_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    transformers.BartTokenizer(
        os.path.join(nlp_dir, "vocab.json"),
        os.path.join(nlp_dir, "merges.txt")).save_pretrained(nlp_dir)

    ref = REF.HFSpeechMixEED(sp_dir, nlp_dir, share_layer_ratio=0.4,
                             down_scale=8).eval()
    ckpt_dir = os.path.join(work, "speechmix_eed_fixed")
    os.makedirs(ckpt_dir, exist_ok=True)
    torch.save(ref.state_dict(), os.path.join(ckpt_dir, "pytorch_model.bin"))
    with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
        json.dump(ref.config.to_dict(), f, default=str)
    print(f"[{time.time()-t0:6.1f}s] reference fused checkpoint saved "
          f"({sum(p.numel() for p in ref.parameters())/1e6:.0f}M params)")

    # -- 3. turnkey load: config derived from config.json, weights converted
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from speechmix_tpu import HFSpeechMixEED
    from speechmix_tpu.pipeline import TranscriptionPipeline

    spm = HFSpeechMixEED.from_reference_checkpoint(
        ckpt_dir, share_layer_ratio=0.4, down_scale=8)
    assert spm.config.encoder.hidden_size == 768
    assert spm.config.encoder.num_layers == 12  # pre-truncation depth
    assert spm.config.num_speech_encoder_layers == 8  # 12 - int(12*0.4)
    assert spm.config.decoder.vocab_size == 50265
    print(f"[{time.time()-t0:6.1f}s] from_reference_checkpoint ok "
          f"(derived config + converted weights)")

    # -- 4. forward parity at real scale ------------------------------------
    wav = np.random.RandomState(0).randn(1, 32000).astype(np.float32) * 0.1
    labels = np.array([[10, 11, 12, 2]], np.int64)
    captured = {}
    h = ref.decoder_model.register_forward_hook(
        lambda m, i, o: captured.update(logits=o.logits.detach().numpy()))
    with torch.no_grad():
        ref_out = ref(input_values=torch.tensor(wav),
                      labels=torch.tensor(labels))
    h.remove()
    out = spm([wav[0]], labels=labels)
    np.testing.assert_allclose(np.asarray(out["logits"]), captured["logits"],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(float(out["loss"]), ref_out["loss"].item(),
                               rtol=2e-3, atol=2e-3)
    print(f"[{time.time()-t0:6.1f}s] forward logits+loss parity ok at "
          f"real scale (rtol 2e-3)")

    # -- 5. serving pipeline --------------------------------------------------
    pipe = TranscriptionPipeline(spm, batch_size=2, max_length=6,
                                 buckets_sec=(2.0,))
    texts = pipe([wav[0], wav[0, :24000]])
    assert len(texts) == 2 and all(isinstance(t, str) for t in texts)
    print(f"[{time.time()-t0:6.1f}s] TranscriptionPipeline ok ({texts!r})")

    # -- 6. export back -> reference strict load ------------------------------
    sd = spm.export_reference_state_dict()
    missing, unexpected = ref.load_state_dict(
        {k: torch.tensor(v) for k, v in sd.items()}, strict=True)
    assert not missing and not unexpected
    print(f"[{time.time()-t0:6.1f}s] export -> reference "
          f"load_state_dict(strict=True) ok")
    print("REHEARSAL OK")


if __name__ == "__main__":
    main()
