"""Trainer.predict (free-running generate + WER/CER) smoke test."""

import numpy as np

import speechmix_tpu
from speechmix_tpu.training.trainer import TrainConfig, Trainer


def test_predict_smoke():
    spm = speechmix_tpu.SpeechMixEED("tiny-speech", "tiny-bart-bytes",
                                     down_scale=8)
    tc = TrainConfig(output_dir="")
    tr = Trainer(spm.config, tc, tokenizer=spm.tokenizer)

    rng = np.random.RandomState(0)

    def eval_batches():
        for _ in range(2):
            labels = np.full((2, 8), -100, np.int64)
            labels[:, :3] = [[200, 201, 1], [202, 203, 1]]
            yield {
                "input_values": rng.randn(2, 16000).astype(np.float32) * 0.1,
                "lengths": np.array([16000, 12000], np.int32),
                "labels": labels,
                "example_mask": np.array([True, True]),
            }

    m = tr.predict(spm.params, eval_batches, max_length=6)
    assert m["n_examples"] == 4
    assert 0.0 <= m["predict_wer"]
    assert 0.0 <= m["predict_cer"]


def test_predict_with_beams():
    """predict(num_beams>1) routes through the HF-semantics beam search
    (CLI: --predict_with_generate --num_beams N)."""
    spm = speechmix_tpu.SpeechMixEED("tiny-speech", "tiny-bart-bytes",
                                     down_scale=8)
    tc = TrainConfig(output_dir="", num_beams=2)
    tr = Trainer(spm.config, tc, tokenizer=spm.tokenizer)
    rng = np.random.RandomState(0)

    def eval_batches():
        labels = np.full((2, 8), -100, np.int64)
        labels[:, :3] = [[200, 201, 2], [202, 203, 2]]
        yield {
            "input_values": rng.randn(2, 16000).astype(np.float32) * 0.1,
            "lengths": np.array([16000, 12000], np.int32),
            "labels": labels,
            "example_mask": np.array([True, True]),
        }

    m = tr.predict(spm.params, eval_batches, max_length=6,
                   num_beams=tc.num_beams)
    assert m["n_examples"] == 2
    assert 0.0 <= m["predict_wer"]
