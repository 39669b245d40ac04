"""Batch transcription with TranscriptionPipeline — the serving-side demo.

Runs fully offline: builds a tiny model (optionally loading trained weights
from the RECIPES.md offline demo) and transcribes a handful of synthetic
utterances through the bucketed, compile-cached pipeline.

    python examples/transcribe.py [--weights ./out_demo/final_weights.npz]
    python examples/transcribe.py --audio a.wav b.wav   # real files

Equivalent reference surface: eval.py + the generate() path
(/root/reference/eval.py:1-16); the pipeline adds what the reference lacks —
length bucketing (one XLA compile per bucket), batching, early-exit decode.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--speech_model_config", default="tiny-speech")
    p.add_argument("--nlp_model_config", default="tiny-bart-bytes")
    p.add_argument("--down_scale", default=4, type=int)
    p.add_argument("--weights", default=None)
    p.add_argument("--audio", nargs="*", default=None, help="wav/flac files")
    p.add_argument("--num_beams", default=1, type=int)
    p.add_argument("--max_length", default=48, type=int)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--data_parallel", action="store_true",
                   help="serve over a device mesh (batch sharded over the "
                   "data axis; linear RTFx scaling across chips)")
    p.add_argument("--kv_int8", action="store_true",
                   help="int8 cross-attention KV in the decode loop")
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from speechmix_tpu import SpeechMixEED
    from speechmix_tpu.pipeline import TranscriptionPipeline

    spm = SpeechMixEED(args.speech_model_config, args.nlp_model_config,
                       down_scale=args.down_scale)
    if args.weights:
        spm.load_weights(args.weights)

    if args.audio:
        from speechmix_tpu.data import audio as audio_lib
        from speechmix_tpu.data.datasets import _read_audio
        waveforms, refs = [], [None] * len(args.audio)
        for path in args.audio:
            wav, sr = _read_audio(path)
            waveforms.append(audio_lib.resample(audio_lib.to_mono(wav), sr))
    else:
        from speechmix_tpu.data.datasets import synthetic_corpus
        exs = synthetic_corpus(6, seed=11)
        waveforms = [e["audio"] for e in exs]
        refs = [e["text"] for e in exs]

    mesh = None
    batch_size = 8
    if args.data_parallel:
        from speechmix_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.make_mesh()
        n_data = mesh.shape[mesh_lib.DATA_AXIS]
        batch_size = max(batch_size, -(-batch_size // n_data) * n_data)
    pipe = TranscriptionPipeline(spm, batch_size=batch_size,
                                 max_length=args.max_length,
                                 num_beams=args.num_beams,
                                 kv_int8=args.kv_int8, mesh=mesh)
    for ref, hyp in zip(refs, pipe(waveforms)):
        if ref is not None:
            print(f"REF: {ref}")
        print(f"HYP: {hyp}")
        print()


if __name__ == "__main__":
    main()
