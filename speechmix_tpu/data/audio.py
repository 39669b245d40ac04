"""Host-side audio preprocessing: resample to 16 kHz mono, normalize, and
static-shape length bucketing.

The reference resampled with torchaudio (train.py:40-42) or relied on HF
datasets Audio casting (train.py:265-266), padded dynamically per batch with
padding_value=-100 (train.py:102-103 — a label ignore-index used as a
waveform pad, SURVEY.md §2.5.2), and *filtered* long audio instead of
bucketing (train.py:276-286).  Here:

  * polyphase resampling in numpy (no torchaudio dependency); a C++
    implementation of the same kernel lives in runtime/ and is used when the
    built shared library is present
  * zero padding + explicit lengths
  * bucket boundaries in seconds -> a handful of static shapes, so XLA
    compiles once per bucket instead of once per batch shape
"""

from __future__ import annotations

import math
from fractions import Fraction
from typing import List, Optional, Sequence, Tuple

import numpy as np

TARGET_SR = 16000
# default bucket grid (seconds); reference filters to 1..20 s
DEFAULT_BUCKETS = (4.0, 8.0, 12.0, 16.0, 20.0)


def _sinc_kernel(cutoff: float, half_width: int, stride: int) -> np.ndarray:
    """Windowed-sinc low-pass for polyphase resampling."""
    n = np.arange(-half_width, half_width + 1, dtype=np.float64)
    taps = np.sinc(2 * cutoff * n)
    window = np.hamming(len(n))
    taps = taps * window
    taps /= taps.sum()
    return taps.astype(np.float32)


def resample(waveform: np.ndarray, orig_sr: int,
             target_sr: int = TARGET_SR) -> np.ndarray:
    """Rational-ratio polyphase resample (mono float32)."""
    if orig_sr == target_sr:
        return waveform.astype(np.float32)
    try:
        from ..runtime import native
        if native.available():
            return native.resample(waveform.astype(np.float32), orig_sr,
                                   target_sr)
    except Exception:
        pass
    frac = Fraction(target_sr, orig_sr).limit_denominator(1000)
    up, down = frac.numerator, frac.denominator
    x = np.asarray(waveform, np.float64)
    # upsample by zero-stuffing, filter, downsample
    n_up = len(x) * up
    up_sig = np.zeros(n_up, np.float64)
    up_sig[::up] = x * up
    cutoff = 0.5 / max(up, down)
    half = 10 * max(up, down)
    taps = _sinc_kernel(cutoff, half, 1).astype(np.float64)
    filtered = np.convolve(up_sig, taps, mode="same")
    out = filtered[::down]
    return out.astype(np.float32)


def to_mono(waveform: np.ndarray) -> np.ndarray:
    if waveform.ndim == 2:
        return waveform.mean(axis=0 if waveform.shape[0] < waveform.shape[1]
                             else 1)
    return waveform


def normalize(waveform: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """Zero-mean unit-variance (wav2vec2's do_normalize preprocessing)."""
    w = waveform.astype(np.float32)
    return (w - w.mean()) / math.sqrt(float(w.var()) + eps)


def bucket_length(num_samples: int, buckets: Sequence[float] = DEFAULT_BUCKETS,
                  sr: int = TARGET_SR) -> Optional[int]:
    """Smallest bucket (in samples) that fits; None if too long."""
    for sec in buckets:
        cap = int(sec * sr)
        if num_samples <= cap:
            return cap
    return None


def pad_to(waveform: np.ndarray, target: int) -> np.ndarray:
    out = np.zeros(target, np.float32)
    out[: len(waveform)] = waveform
    return out
