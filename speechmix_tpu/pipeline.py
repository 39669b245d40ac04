"""Batched transcription pipeline — the production inference surface.

The reference's inference story is one utterance at a time through HF
`generate()` (eval.py).  This pipeline feeds arbitrary audio through
static-shape buckets so XLA compiles once per (bucket, batch) and the MXU
stays fed:

    pipe = TranscriptionPipeline(model, batch_size=32)
    texts = pipe(list_of_waveforms)          # order-preserving

Buckets: audio length rounded up to the bucket grid; partial batches padded
by repetition.  Per-bucket compiled generate functions are cached.
"""

from __future__ import annotations

from collections import defaultdict
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import generation as gen_lib
from .data import audio as audio_lib
from .parallel import mesh as mesh_lib
from .utils.platform import jnp_dtype, resolve_use_flash


class TranscriptionPipeline:
    def __init__(self, model, batch_size: int = 16, max_length: int = None,
                 num_beams: int = 1, buckets_sec: Sequence[float] =
                 audio_lib.DEFAULT_BUCKETS, sample_rate: int = 16000,
                 use_flash: bool = None, early_stop: bool = True,
                 kv_int8: bool = False, long_audio: str = "chunk",
                 long_audio_search_sec: float = 2.0, mesh=None,
                 transfer_dtype: str = "float32", min_length: int = 0,
                 fuse_qkv: bool = False, generate_kwargs: dict = None):
        # use_flash=None: auto — the single-pass Pallas attention kernel on
        # TPU (measured faster in situ, PERF.md); False/True to override.
        # early_stop: exit the decode loop once every row has emitted EOS
        # (output-identical to the full scan — pinned by
        # test_generate_early_stop_matches_full_scan; real speech stops at
        # 30-60 tokens, saving up to ~half the decode time).  GREEDY ONLY:
        # beam search (num_beams > 1) always runs the full max_length scan.
        # kv_int8: quantize the precomputed cross-attention K/V to int8
        # (halves the dominant decode HBM read; near-exact — see
        # test_kv_int8_decode_matches).
        # long_audio: audio longer than the largest bucket is "chunk"ed at
        # the lowest-energy point within the last `long_audio_search_sec` of
        # each max-bucket window (avoids cutting mid-word) and the chunk
        # transcripts are space-joined; "truncate" keeps the legacy behavior
        # (drop everything past the largest bucket).
        # transfer_dtype: "int16" ships the waveform batch to the device
        # as 16-bit PCM (the source fidelity of wav audio) and converts to
        # float on-device — halves host->device traffic; "float32" default.
        # mesh: a jax.sharding.Mesh (parallel.mesh.make_mesh) for
        # multi-chip serving — the batch axis shards over `data` (linear
        # RTFx scaling) and params follow the tensor-parallel layout rules
        # over `model` when that axis is >1.  batch_size must be a multiple
        # of the data-axis size.
        if transfer_dtype not in ("float32", "int16"):
            raise ValueError(f"transfer_dtype must be 'float32' or 'int16', "
                             f"got {transfer_dtype!r}")
        if long_audio not in ("chunk", "truncate"):
            raise ValueError(f"long_audio must be 'chunk' or 'truncate', "
                             f"got {long_audio!r}")
        if mesh is not None:
            n_data = mesh.shape[mesh_lib.DATA_AXIS]
            if batch_size % n_data != 0:
                raise ValueError(
                    f"batch_size {batch_size} must be a multiple of the "
                    f"mesh data-axis size {n_data}")
        # generate_kwargs: extra HF LogitsProcessor knobs forwarded to every
        # decode (bad_words_ids, suppress_tokens, begin_suppress_tokens,
        # repetition_penalty, no_repeat_ngram_size, forced_bos/eos_token_id,
        # length_penalty, early_stopping) — the tail of the generate()
        # surface the reference inherits (hf_model.py:304-338).  Sequence-
        # multiplying / score-returning kwargs are rejected: a transcription
        # pipeline returns exactly one transcript per input.
        allowed = {"bad_words_ids", "suppress_tokens",
                   "begin_suppress_tokens", "repetition_penalty",
                   "no_repeat_ngram_size", "forced_bos_token_id",
                   "forced_eos_token_id", "length_penalty", "early_stopping",
                   "num_beam_groups", "diversity_penalty",
                   "encoder_no_repeat_ngram_size",
                   "prefix_allowed_tokens_fn", "force_words_ids"}
        generate_kwargs = dict(generate_kwargs or {})
        bad = set(generate_kwargs) - allowed
        if bad:
            raise ValueError(
                f"generate_kwargs {sorted(bad)} not supported by the "
                f"pipeline; allowed: {sorted(allowed)}")
        if "bad_words_ids" in generate_kwargs and \
                generate_kwargs["bad_words_ids"]:
            generate_kwargs["bad_words_ids"] = tuple(
                tuple(int(t) for t in w)
                for w in generate_kwargs["bad_words_ids"])
        for k in ("suppress_tokens", "begin_suppress_tokens"):
            if generate_kwargs.get(k):
                generate_kwargs[k] = tuple(int(t)
                                           for t in generate_kwargs[k])
        if generate_kwargs.get("force_words_ids"):
            # constrained transcription (force domain terms); needs beams
            if num_beams <= 1:
                raise ValueError(
                    "force_words_ids requires num_beams > 1 "
                    "(constrained beam search)")
            generate_kwargs["force_words_ids"] = tuple(
                tuple(tuple(int(t) for t in w) for w in entry)
                if entry and isinstance(entry[0], (list, tuple))
                else tuple(int(t) for t in entry)
                for entry in generate_kwargs["force_words_ids"])
        self.generate_kwargs = generate_kwargs
        self.long_audio = long_audio
        self.long_audio_search_sec = long_audio_search_sec
        self.model = model
        self.batch_size = batch_size
        self.max_length = max_length or model.config.decoder.max_length
        self.num_beams = num_beams
        self.min_length = min_length
        use_flash = resolve_use_flash(use_flash)
        self.use_flash = use_flash
        self.early_stop = early_stop
        self.kv_int8 = kv_int8
        self.transfer_dtype = transfer_dtype
        # bucket assignment picks the first bucket that fits and long-audio
        # chunking caps at the LAST bucket — both assume ascending order, so
        # normalize (sort + dedupe) rather than silently mis-bucketing
        if not buckets_sec or any(b <= 0 for b in buckets_sec):
            raise ValueError(f"buckets_sec must be positive and non-empty, "
                             f"got {buckets_sec!r}")
        self.buckets_sec = tuple(sorted(set(float(b) for b in buckets_sec)))
        self.sample_rate = sample_rate
        self.mesh = mesh
        # smallest sample count that yields >= 1 conv frame: shorter (or
        # empty) inputs would produce an all-masked encoder (NaN softmax) —
        # they get an empty transcript without touching the device
        ecfg = model.config.encoder
        need = 1
        for k, s in zip(reversed(ecfg.conv_kernels),
                        reversed(ecfg.conv_strides)):
            need = (need - 1) * s + k
        self._min_samples = need
        # pre-concatenated self-attention q/k/v kernels (token-exact —
        # quantize.fuse_qkv_params).  Default OFF on measurement: the fused
        # (B, T, 3HD) output must be re-sliced into contiguous q/k/v for
        # the attention kernel, and those relayout copies cost more than
        # the saved gemm launches (paired A/B: encoder 265->282 ms at
        # B=128; full generate -2% int8 / -6% bf16 — PERF.md round 3).
        # Kept as an opt-in for shapes where projections dominate.
        # Also disabled over a tensor-parallel mesh: the fused output dim
        # would split across `model` shards at the wrong boundaries.
        if mesh is not None and mesh.shape[mesh_lib.MODEL_AXIS] > 1:
            fuse_qkv = False
        self.fuse_qkv = fuse_qkv
        self._fused_params = None
        self._fused_src = None
        self._sharded_params = None
        self._sharded_src = None
        self._fns = {}

    def _fn_for(self, t_samples: int):
        fn = self._fns.get(t_samples)
        if fn is None:
            cfg = self.model.config
            num_beams, max_length = self.num_beams, self.max_length
            use_flash, early_stop = self.use_flash, self.early_stop
            kv_int8, min_length = self.kv_int8, self.min_length
            int16_in = self.transfer_dtype == "int16"
            gen_kwargs = self.generate_kwargs

            mesh = self.mesh

            def raw(params, batch, lengths, scale):
                if int16_in:
                    # scale: per-ROW peak (host-computed, shape (B,)) so a
                    # quiet utterance batched with a loud one keeps its full
                    # 16-bit resolution instead of inheriting the batch max
                    # (advisor round-2 finding), and normalized audio with
                    # |x| > 1 is never clipped
                    batch = batch.astype(jnp.float32) * \
                        (scale[:, None] / 32767.0)
                with mesh_lib.tp_sharding(mesh):
                    return gen_lib.generate(
                        params, cfg, batch, lengths, max_length=max_length,
                        num_beams=num_beams, use_flash=use_flash,
                        early_stop=early_stop, kv_int8=kv_int8,
                        min_length=min_length, dtype=jnp_dtype(cfg.dtype),
                        **gen_kwargs)

            fn = jax.jit(raw)
            self._fns[t_samples] = fn
        return fn

    def _base_params(self):
        if not self.fuse_qkv:
            return self.model.params
        if self._fused_params is None or \
                self._fused_src is not self.model.params:
            from .utils.quantize import fuse_qkv_params
            self._fused_params = fuse_qkv_params(self.model.params)
            self._fused_src = self.model.params
        return self._fused_params

    def _run_params(self):
        """Model params placed for execution: qkv-fused (serving layout),
        then mesh-sharded (replicated over `data`, tensor-parallel over
        `model`) when serving over a mesh."""
        base = self._base_params()
        if self.mesh is None:
            return base
        if self._sharded_params is None or self._sharded_src is not base:
            self._sharded_params = mesh_lib.shard_params(self.mesh, base)
            self._sharded_src = base
        return self._sharded_params

    def _place_batch(self, batch, lengths):
        if self.mesh is None:
            return jnp.asarray(batch), jnp.asarray(lengths)
        placed = mesh_lib.shard_batch(self.mesh,
                                      {"b": batch, "l": lengths})
        return placed["b"], placed["l"]

    def warmup(self):
        """Precompile every length bucket before serving traffic (first
        compiles take seconds to minutes; without warmup the first request
        of each bucket pays that latency).  Uses AOT lower+compile — no
        decode is executed; the first real call per bucket re-traces but
        hits the populated XLA compilation cache."""
        host_dtype = (np.int16 if self.transfer_dtype == "int16"
                      else np.float32)
        for sec in self.buckets_sec:
            cap = self.model.config.encoder.aligned_samples(
                int(sec * self.sample_rate))
            fn = self._fn_for(cap)
            batch, lengths = self._place_batch(
                np.zeros((self.batch_size, cap), host_dtype),
                np.full((self.batch_size,), cap, np.int32))
            # scale must match the runtime call's (B,) float32 signature
            # (line below `drain`), or this compile is wasted and the first
            # real request per bucket re-traces anyway
            fn.lower(self._run_params(), batch, lengths,
                     jnp.ones((self.batch_size,), jnp.float32)).compile()
        return self

    def split_long(self, wav: np.ndarray) -> List[np.ndarray]:
        """Split a waveform longer than the largest bucket into
        max-bucket-sized chunks, cutting each at the lowest-energy sample
        (25 ms RMS window) within the final `long_audio_search_sec` of the
        window.  Segments are non-overlapping and reconstruct the input."""
        sr = self.sample_rate
        max_cap = int(self.buckets_sec[-1] * sr)
        search = max(1, min(int(self.long_audio_search_sec * sr),
                            max_cap // 2))
        win = max(1, int(0.025 * sr))
        chunks, pos = [], 0
        while len(wav) - pos > max_cap:
            lo = pos + max_cap - search
            seg = wav[lo: pos + max_cap].astype(np.float64)
            energy = np.convolve(seg * seg, np.ones(win), mode="valid")
            cut = lo + int(np.argmin(energy)) + win // 2
            cut = max(pos + 1, min(cut, pos + max_cap))
            chunks.append(wav[pos:cut])
            pos = cut
        chunks.append(wav[pos:])
        return chunks

    def __call__(self, waveforms: List[np.ndarray],
                 sample_rates: Optional[List[int]] = None) -> List[str]:
        n = len(waveforms)
        prepped = []
        for i, wav in enumerate(waveforms):
            wav = np.asarray(wav, np.float32).reshape(-1)
            if sample_rates and sample_rates[i] != self.sample_rate:
                wav = audio_lib.resample(wav, sample_rates[i],
                                         self.sample_rate)
            prepped.append(wav)

        # bucket by padded length; long audio becomes several segments that
        # share the source index (their transcripts are space-joined below)
        max_cap = int(self.buckets_sec[-1] * self.sample_rate)
        pools = defaultdict(list)    # cap -> [(orig_idx, seg_idx, wav)]
        too_short = []               # [(orig_idx, seg_idx)] -> ""
        seg_counts = [1] * n
        for i, wav in enumerate(prepped):
            if len(wav) > max_cap and self.long_audio == "chunk":
                segs = self.split_long(wav)
            else:
                segs = [wav[:max_cap]]
            seg_counts[i] = len(segs)
            for si, seg in enumerate(segs):
                if len(seg) < self._min_samples:
                    too_short.append((i, si))
                    continue
                cap = audio_lib.bucket_length(len(seg), self.buckets_sec,
                                              self.sample_rate) or max_cap
                # frame-align the padded length: odd frame counts cost ~6%
                # encoder time (sublane padding in every layer op — PERF.md)
                cap = self.model.config.encoder.aligned_samples(cap)
                pools[cap].append((i, si, seg))

        # submit batches ahead of collection (jax dispatch is async —
        # host-side collation of batch k+1 overlaps device compute of batch
        # k) with a bounded in-flight window so queued device inputs can't
        # accumulate into an OOM on long request lists
        MAX_IN_FLIGHT = 4
        seg_results = {}  # (orig_idx, seg_idx) -> text
        for idx_si in too_short:
            seg_results[idx_si] = ""

        def drain(entry):
            chunk, real, tokens = entry
            tokens = np.asarray(tokens)
            for j in range(real):
                idx, si, _ = chunk[j]
                seg_results[(idx, si)] = self.model.tokenizer.decode(
                    tokens[j], skip_special_tokens=True)

        in_flight = []  # (chunk, real, device_tokens)
        for cap, items in pools.items():
            fn = self._fn_for(cap)
            for start in range(0, len(items), self.batch_size):
                chunk = items[start: start + self.batch_size]
                real = len(chunk)
                while len(chunk) < self.batch_size:
                    chunk.append(chunk[-1])
                batch = np.zeros((self.batch_size, cap), np.float32)
                lengths = np.zeros((self.batch_size,), np.int32)
                for j, (_, _, wav) in enumerate(chunk):
                    batch[j, : len(wav)] = wav
                    lengths[j] = len(wav)
                scale = np.ones((self.batch_size,), np.float32)
                if self.transfer_dtype == "int16":
                    scale = np.maximum(
                        np.abs(batch).max(axis=1), 1e-9).astype(np.float32)
                    batch = np.clip(
                        np.round(batch * (32767.0 / scale[:, None])),
                        -32767, 32767).astype(np.int16)
                b_dev, l_dev = self._place_batch(batch, lengths)
                tokens, _ = fn(self._run_params(), b_dev, l_dev,
                               jnp.asarray(scale))
                in_flight.append((chunk, real, tokens))
                if len(in_flight) >= MAX_IN_FLIGHT:
                    drain(in_flight.pop(0))

        for entry in in_flight:
            drain(entry)

        results: List[str] = []
        for i in range(n):
            parts = [seg_results[(i, si)] for si in range(seg_counts[i])]
            results.append(" ".join(p for p in parts if p).strip()
                           if len(parts) > 1 else parts[0])
        return results
