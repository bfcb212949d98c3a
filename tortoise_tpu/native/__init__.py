"""ctypes bindings for the native host-side runtime (libaudioio.so).

Auto-builds with make on first import when a compiler is available; every
entry point has a pure-Python/scipy fallback, so the native library is an
accelerator, never a hard dependency.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libaudioio.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.resample_f32.restype = ctypes.c_int64
        lib.resample_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.align_dp.restype = None
        lib.align_dp.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_char]
        lib.crossfade_f32.restype = None
        lib.crossfade_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64]
        _lib = lib
    except OSError:
        _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def resample(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray | None:
    """Native polyphase resample of a 1-D float32 array; None if unavailable."""
    lib = _load()
    if not lib:
        return None
    x = np.ascontiguousarray(audio, dtype=np.float32).reshape(-1)
    n_out = lib.resample_f32(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                             len(x), sr_in, sr_out, None, 0)
    out = np.empty(n_out, np.float32)
    lib.resample_f32(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
                     sr_in, sr_out,
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out)
    return out


def align_dp(s1: str, s2: str, skip: str = "~") -> str | None:
    lib = _load()
    if not lib:
        return None
    b1, b2 = s1.encode("utf-8"), s2.encode("utf-8")
    if len(b1) != len(s1) or len(b2) != len(s2):
        return None  # non-ascii: fall back to Python (byte != char indexing)
    out = ctypes.create_string_buffer(len(b1) + 1)
    lib.align_dp(b1, len(b1), b2, len(b2), out, skip.encode()[0])
    return out.value.decode("utf-8")


def crossfade(chunk: np.ndarray, overlap: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if not lib:
        return None
    c = np.ascontiguousarray(chunk, dtype=np.float32).copy()
    o = np.ascontiguousarray(overlap, dtype=np.float32)
    n = min(len(c), len(o))
    lib.crossfade_f32(c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                      o.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
    return c
