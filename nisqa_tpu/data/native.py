"""ctypes bindings for the native C++ batch WAV loader (native/wavloader.cpp).

Builds lazily with ``make`` on first use; everything degrades gracefully to
the pure-numpy path (`nisqa_tpu/audio/wav.py`) when the toolchain or the
library is unavailable, or per-file when a WAV is not plain PCM16 mono.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwavloader.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("NISQA_TPU_NO_NATIVE"):
        return None
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.fill_batch_i16.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.scan_wavs.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _paths_array(paths):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def fill_batch_i16(paths, buf: np.ndarray, pad: int, n_threads: int = 4):
    """Fill rows of ``buf`` (B, buf_len) int16 with reflect-padded PCM16.

    Returns (n_samples (B,) int32, sample_rates (B,) int32, status (B,)
    int32) — status != 0 means the row was not filled (caller falls back).
    Rows beyond len(paths) are untouched.
    """
    lib = _load()
    assert lib is not None
    assert buf.dtype == np.int16 and buf.flags.c_contiguous
    n = len(paths)
    n_out = np.zeros(n, np.int32)
    sr_out = np.zeros(n, np.int32)
    status = np.zeros(n, np.int32)
    lib.fill_batch_i16(
        _paths_array(paths), n,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        ctypes.c_int64(buf.shape[1]), ctypes.c_int64(pad),
        n_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        sr_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    return n_out, sr_out, status


def scan_wavs(paths, n_threads: int = 4):
    """Header-only scan -> (n_samples, sample_rates, status) int32 arrays."""
    lib = _load()
    assert lib is not None
    n = len(paths)
    n_out = np.zeros(n, np.int32)
    sr_out = np.zeros(n, np.int32)
    status = np.zeros(n, np.int32)
    lib.scan_wavs(
        _paths_array(paths), n,
        n_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        sr_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    return n_out, sr_out, status
