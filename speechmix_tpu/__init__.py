"""speechmix_tpu — TPU-native speech-to-text fusion framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of voidful/SpeechMix:
fuse a pretrained speech encoder (wav2vec2/HuBERT/UniSpeechSAT family) with a
pretrained seq2seq LM (BART/T5 family) and train for ASR / speech translation
under full-finetune, frozen, adapter, self-distillation, and adversarial
regimes, with static-shape generation, data-parallel sharding over a device
mesh, and step-indexed npz checkpointing with best-step retention.
"""

from .config import (
    SpeechEncoderConfig,
    Seq2SeqConfig,
    SpeechMixConfig,
    speech_encoder_config,
    seq2seq_config,
)

__version__ = "0.1.0"

# High-level reference-compatible API (SpeechMixEED & friends) lives in
# speechmix_tpu.api; imported lazily to keep `import speechmix_tpu` light.


def __getattr__(name):
    _api_names = {
        "SpeechMixED", "SpeechMixEED", "SpeechMixFixed", "SpeechMixAdapter",
        "SpeechMixSelf", "SpeechMixGAN", "HFSpeechMixED", "HFSpeechMixEED",
        "HFSpeechMixFixed", "HFSpeechMixAdapter", "HFSpeechMixSelf",
        "HFSpeechMixGAN",
    }
    if name in _api_names:
        from . import api
        return getattr(api, name)
    raise AttributeError(f"module 'speechmix_tpu' has no attribute {name!r}")
