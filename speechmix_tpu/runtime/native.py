"""ctypes bindings for the native runtime (runtime/native.cpp).

Builds the shared library on demand with g++ (cached next to the source);
every entry point has a numpy fallback in data/audio.py / metrics.py, so the
framework works without a C++ toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native.cpp")
_LIB = os.path.join(_HERE, "libsmxruntime.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
           "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB) or
                    os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.smx_resample.restype = ctypes.c_int64
            lib.smx_resample.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
            lib.smx_resample_out_len.restype = ctypes.c_int64
            lib.smx_resample_out_len.argtypes = [ctypes.c_int64,
                                                 ctypes.c_int64,
                                                 ctypes.c_int64]
            lib.smx_normalize.restype = None
            lib.smx_normalize.argtypes = [ctypes.POINTER(ctypes.c_float),
                                          ctypes.c_int64, ctypes.c_float]
            lib.smx_edit_distance.restype = ctypes.c_int64
            lib.smx_edit_distance.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def resample(waveform: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    wav = np.ascontiguousarray(waveform, np.float32)
    max_out = int(lib.smx_resample_out_len(len(wav), sr_in, sr_out)) + 8
    out = np.empty(max_out, np.float32)
    n = lib.smx_resample(
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wav),
        sr_in, sr_out,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_out)
    return out[:n]


def normalize(waveform: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    wav = np.ascontiguousarray(waveform, np.float32).copy()
    lib.smx_normalize(wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                      len(wav), eps)
    return wav


def edit_distance(ref, hyp) -> int:
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    r = np.ascontiguousarray(ref, np.int32)
    h = np.ascontiguousarray(hyp, np.int32)
    return int(lib.smx_edit_distance(
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(r),
        h.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(h)))
