"""Dataset construction: HF datasets, custom CSV, or synthetic (offline).

Functional equivalent of the reference's L3 data pipeline (train.py:37-74,
229-289) with the quirks fixed:
  * one seeded train_test_split for --custom_set (reference splits twice
    unseeded -> leakage, SURVEY.md §2.5.3)
  * map results cached to disk keyed on dataset/model/field/split
    (train.py:256-274 semantics)
  * 1s..max_input_length_in_sec length filter (train.py:276-286)
  * teacher targets generated with ONE batched jitted decode
    (data/teacher.py) instead of a per-token loop
  * `--synthetic` path: deterministic pseudo-speech + byte-tokenized
    transcripts, so end-to-end training runs with zero network access
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Callable, Iterable, List, Optional, Tuple

import numpy as np

from . import audio as audio_lib
from .collator import BucketBatcher, CollatorConfig
from .teacher import create_self_decoder_inputs_batched


# ----------------------------------------------------------------------------
# synthetic corpus (offline tests / smoke training)
# ----------------------------------------------------------------------------

_WORDS = ("the quick brown fox jumps over a lazy dog while seven wizards "
          "toast bright vivid morning coffee near azure hills").split()


def synthetic_corpus(n: int, seed: int = 0, min_sec=1.2, max_sec=6.0,
                     min_words=2, max_words=5, vocab_size=10):
    """Deterministic pseudo-speech + transcripts.  Each vocabulary word maps
    to a fixed two-tone signature (cross-process deterministic — python's
    salted hash() must NOT be used here, or train and eval processes would
    generate different audio for the same text).  Difficulty knobs:
    words-per-utterance range and vocabulary size."""
    rng = np.random.RandomState(seed)
    sr = 16000
    vocab = min(vocab_size, len(_WORDS))
    out = []
    for i in range(n):
        k = rng.randint(min_words, max_words + 1)
        idxs = rng.randint(vocab, size=k)
        words = [_WORDS[j] for j in idxs]
        text = " ".join(words)
        dur = float(np.clip(0.5 + 0.35 * k, min_sec, max_sec))
        t = np.arange(int(dur * sr)) / sr
        sig = np.zeros_like(t, np.float32)
        seg = len(t) // max(k, 1)
        for j, widx in enumerate(idxs):
            f1 = 150.0 + 90.0 * widx          # word-indexed fundamentals
            f2 = 2000.0 + 130.0 * widx
            sl = slice(j * seg, (j + 1) * seg)
            tt = t[sl]
            sig[sl] = (0.25 * np.sin(2 * np.pi * f1 * tt) +
                       0.15 * np.sin(2 * np.pi * f2 * tt)).astype(np.float32)
        sig += 0.01 * rng.randn(len(t)).astype(np.float32)
        out.append({"audio": sig, "text": text})
    return out


# ----------------------------------------------------------------------------
# example preparation (reference prepare_dataset, train.py:57-74)
# ----------------------------------------------------------------------------

def prepare_examples(raw: List[dict], model, input_text_prompt: str = "",
                     use_teacher_targets: bool = True,
                     teacher_batch: int = 16, workers: int = 1) -> List[dict]:
    """raw: [{'audio': 1-D float32 @16k, 'text': str}] ->
    [{'input_values', 'lengths', 'text_input_ids', 'labels'}].

    Labels are the frozen NLP teacher's greedy output on the transcript
    (create_self_decoder_input semantics, train.py:18-34) + EOS; with
    use_teacher_targets=False, labels are the tokenized transcript + EOS.

    workers > 1 tokenizes on a thread pool (--worker; the reference's
    num_proc role, train.py:239,268 — fast HF tokenizers release the GIL).
    The teacher path is already one batched on-device decode.
    """
    tok = model.tokenizer
    texts = [input_text_prompt + ex["text"].lower() for ex in raw]
    if use_teacher_targets:
        pairs = create_self_decoder_inputs_batched(
            model.params["nlp"], model.config.decoder, tok, texts,
            batch_size=teacher_batch)
    else:
        def tokenize_one(t):
            ids = tok.encode(t, add_special_tokens=True)
            labels = list(ids)
            if not labels or labels[-1] != tok.eos_token_id:
                labels.append(tok.eos_token_id)
            return ids, labels

        if workers > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=workers) as pool:
                pairs = list(pool.map(tokenize_one, texts))
        else:
            pairs = [tokenize_one(t) for t in texts]

    out = []
    for ex, (text_ids, labels) in zip(raw, pairs):
        wav = np.asarray(ex["audio"], np.float32)
        out.append({
            "input_values": wav,
            "lengths": len(wav),
            "input_text_prompt": input_text_prompt,
            "text_input_ids": text_ids,
            "labels": labels,
        })
    return out


def length_filter(examples: List[dict], max_sec: float, min_sec: float = 1.0,
                  sr: int = 16000) -> List[dict]:
    """Keep 1s < len < max_sec (train.py:276-286)."""
    return [ex for ex in examples
            if min_sec * sr < ex["lengths"] < max_sec * sr]


# ----------------------------------------------------------------------------
# caching (reference train.py:256-274)
# ----------------------------------------------------------------------------

def _cache_key(parts) -> str:
    return hashlib.sha1("|".join(str(p) for p in parts).encode()).hexdigest()[:16]


def save_examples(path: str, examples: List[dict]):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(
        path,
        audio=np.array([ex["input_values"] for ex in examples],
                       dtype=object),
        meta=json.dumps([{k: v for k, v in ex.items()
                          if k != "input_values"} for ex in examples]))


def load_examples(path: str) -> List[dict]:
    data = np.load(path, allow_pickle=True)
    metas = json.loads(str(data["meta"]))
    auds = data["audio"]
    out = []
    for meta, aud in zip(metas, auds):
        ex = dict(meta)
        ex["input_values"] = np.asarray(aud, np.float32)
        out.append(ex)
    return out


# ----------------------------------------------------------------------------
# top-level builders
# ----------------------------------------------------------------------------

def _batch_iter_factory(examples: List[dict], model, batch_size: int,
                        shuffle_seed: Optional[int] = None,
                        group_by_length: bool = True):
    ccfg = CollatorConfig(
        pad_token_id=model.config.decoder.pad_token_id,
        bos_token_id=model.tokenizer.bos_token_id,
        eos_token_id=model.config.decoder.eos_token_id,
        max_label_length=model.config.decoder.max_length,
        max_text_length=model.config.decoder.max_length,
        align_samples=model.config.encoder.aligned_samples)
    batcher = BucketBatcher(ccfg, batch_size, shuffle_seed=shuffle_seed,
                            group_by_length=group_by_length)

    def factory():
        return batcher(examples)

    return factory


def build_datasets(input_args, model) -> Tuple[Callable, Callable]:
    """Returns (train_batches, eval_batches) zero-arg iterator factories."""
    batch_size = int(input_args.batch) * int(input_args.grad_accum)
    prompt = input_args.prompt or ""
    use_teacher = True

    if getattr(input_args, "synthetic", False) or not (
            input_args.dataset or input_args.custom_set):
        train_raw = synthetic_corpus(256, seed=input_args.seed)
        eval_raw = synthetic_corpus(32, seed=input_args.seed + 1)
        # teacher-generated targets presume a pretrained NLP model
        # (train.py:18-34); with a fresh decoder the synthetic smoke path
        # trains on ground-truth transcripts
        use_teacher = False
    elif input_args.custom_set:
        train_raw, eval_raw = _load_custom_csv(
            input_args.custom_set, seed=input_args.seed,
            workers=int(getattr(input_args, "worker", 1) or 1))
    else:
        train_raw = _load_hf_dataset(input_args.dataset, input_args.field,
                                     input_args.train_split)
        eval_raw = _load_hf_dataset(input_args.dataset, input_args.field,
                                    input_args.test_split)

    def prep(raw, split):
        cache_path = None
        if getattr(input_args, "cache", False):
            key = _cache_key([input_args.dataset or input_args.custom_set
                              or "synthetic",
                              model.config.encoder.name,
                              model.config.decoder.name,
                              input_args.field, split, prompt,
                              # everything that changes the example set must
                              # key the cache (stale reuse is silent)
                              input_args.seed,
                              input_args.max_input_length_in_sec])
            cache_path = f"./.data_cache/{key}.npz"
            if os.path.exists(cache_path):
                return load_examples(cache_path)
        ex = prepare_examples(
            raw, model, prompt, use_teacher,
            workers=int(getattr(input_args, "worker", 1) or 1))
        ex = length_filter(ex, input_args.max_input_length_in_sec)
        if cache_path:
            save_examples(cache_path, ex)
        return ex

    train_ex = prep(train_raw, input_args.train_split or "train")
    eval_ex = prep(eval_raw, input_args.test_split or "eval")
    gbl = bool(getattr(input_args, "group_by_length", True))
    n_proc = 1
    if getattr(input_args, "multihost", False):
        import jax
        n_proc = max(int(jax.process_count()), 1)
    # Multi-host (SURVEY.md §2.4): every host batches the FULL example list
    # with the SAME seed — identical shuffle, bucket schedule, and batch
    # count on every process (independent per-host batcher streams would
    # emit mismatched bucket shapes/counts and desync the lockstep SPMD
    # program) — and then keeps only its per_host_batch_slice rows of each
    # GLOBAL batch; mesh.shard_batch reassembles the global array.
    # train: per-epoch seeded shuffle (reference Trainer sampler semantics);
    # eval: deterministic order
    train_fac = _batch_iter_factory(train_ex, model, batch_size * n_proc,
                                    shuffle_seed=int(input_args.seed),
                                    group_by_length=gbl)
    eval_fac = _batch_iter_factory(eval_ex, model, batch_size * n_proc,
                                   group_by_length=gbl)
    if n_proc > 1:
        train_fac = _per_host_slice_factory(train_fac)
        eval_fac = _per_host_slice_factory(eval_fac)
    return train_fac, eval_fac


def _per_host_slice_factory(factory):
    """Wrap a global-batch iterator factory so each host yields only its
    rows (mesh.per_host_batch_slice) of every batch — the process-local
    slices make_array_from_process_local_data assembles."""
    from ..parallel.mesh import per_host_batch_slice

    def wrapped():
        for batch in factory():
            rows = len(next(iter(batch.values())))
            sl = per_host_batch_slice(rows)
            yield {k: v[sl] for k, v in batch.items()}

    return wrapped


def _load_custom_csv(path: str, seed: int = 0, test_size: float = 0.1,
                     workers: int = 1):
    """CSV with `path` and `text` columns (reference prepare_dataset_custom,
    train.py:38-55).  ONE seeded split (fixes §2.5.3).  workers > 1 loads +
    resamples audio on a thread pool (--worker; file I/O and the numpy
    resampler both release the GIL)."""
    import csv
    rows = []
    with open(path) as f:
        for row in csv.DictReader(f):
            rows.append(row)
    rng = np.random.RandomState(seed)
    idx = rng.permutation(len(rows))
    n_test = max(1, int(len(rows) * test_size))
    test_idx = set(idx[:n_test].tolist())

    def load_row(row):
        wav, sr = _read_audio(row["path"])
        wav = audio_lib.resample(audio_lib.to_mono(wav), sr)
        return {"audio": wav, "text": row["text"]}

    if workers > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=workers) as pool:
            loaded = list(pool.map(load_row, rows))
    else:
        loaded = [load_row(r) for r in rows]
    train = [ex for i, ex in enumerate(loaded) if i not in test_idx]
    test = [ex for i, ex in enumerate(loaded) if i in test_idx]
    return train, test


def _read_audio(path: str):
    """Minimal WAV/FLAC reader: soundfile if present, else stdlib wave."""
    try:
        import soundfile as sf
        wav, sr = sf.read(path, dtype="float32")
        return wav.T if wav.ndim == 2 else wav, sr
    except ImportError:
        import wave
        with wave.open(path, "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            raw = w.readframes(n)
            width = w.getsampwidth()
            if width == 1:
                # WAV 8-bit PCM is UNSIGNED, biased at 128 (int8 would turn
                # silence 0x80 into full-scale DC)
                data = (np.frombuffer(raw, np.uint8).astype(np.float32)
                        - 128.0) / 128.0
            elif width == 3:
                # 24-bit little-endian: widen to int32 via a zero byte
                b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
                b = np.concatenate(
                    [np.zeros((len(b), 1), np.uint8), b], axis=1)
                data = (b.view(np.int32).reshape(-1) >> 8).astype(
                    np.float32) / float(2 ** 23 - 1)
            else:
                dtype = {2: np.int16, 4: np.int32}[width]
                data = np.frombuffer(raw, dtype=dtype).astype(np.float32)
                data /= float(np.iinfo(dtype).max)
            if w.getnchannels() > 1:
                data = data.reshape(-1, w.getnchannels()).mean(axis=1)
        return data, sr


def _load_hf_dataset(name, field, split):
    """HF datasets path (requires local cache; this environment has no
    egress).  Audio is cast to 16 kHz (train.py:265-266)."""
    from datasets import load_dataset, Audio
    ds = load_dataset(name, field, split=split)
    ds = ds.cast_column("audio", Audio(sampling_rate=16000))
    out = []
    for ex in ds:
        text = ex.get("text", ex.get("sentence", ""))
        out.append({"audio": np.asarray(ex["audio"]["array"], np.float32),
                    "text": text})
    return out


def load_librispeech_dir(root: str, max_utts: Optional[int] = None,
                         workers: int = 8) -> List[dict]:
    """Walk an on-disk LibriSpeech split (e.g. .../LibriSpeech/test-clean):
    <spk>/<chapter>/<spk>-<chapter>-<utt>.flac beside
    <spk>-<chapter>.trans.txt lines "<utt_id> TRANSCRIPT".  Returns
    [{'audio': 1-D float32 @16k, 'text': str}] sorted by utterance id —
    the real-WER anchor corpus for eval.py --librispeech_dir
    (reference recipe: README.md:32-49 + eval.ipynb)."""
    pairs = []  # (utt_id, flac_path, text)
    for dirpath, _, files in sorted(os.walk(root)):
        for fname in sorted(files):
            if not fname.endswith(".trans.txt"):
                continue
            with open(os.path.join(dirpath, fname)) as f:
                for line in f:
                    utt_id, _, text = line.strip().partition(" ")
                    flac = os.path.join(dirpath, utt_id + ".flac")
                    if text and os.path.exists(flac):
                        pairs.append((utt_id, flac, text))
    pairs.sort()
    if max_utts:
        pairs = pairs[:max_utts]

    def load_one(item):
        _, flac, text = item
        wav, sr = _read_audio(flac)
        return {"audio": audio_lib.resample(audio_lib.to_mono(wav), sr),
                "text": text}

    if workers > 1 and len(pairs) > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=workers) as pool:
            return list(pool.map(load_one, pairs))
    return [load_one(p) for p in pairs]
