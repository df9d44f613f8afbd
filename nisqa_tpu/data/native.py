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
        src = os.path.join(_NATIVE_DIR, "wavloader.cpp")
        stale = (not os.path.exists(_LIB_PATH)
                 or (os.path.exists(src)
                     and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)))
        if stale:
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
            except Exception:
                # no toolchain / read-only tree: an existing prebuilt .so is
                # still good — only a MISSING library disables the fast path
                if not os.path.exists(_LIB_PATH):
                    raise
        lib = ctypes.CDLL(_LIB_PATH)
        lib.fill_batch_i16.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.fill_batch_f32.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.scan_wavs.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.scan_audio.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
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


def fill_batch_f32(paths, buf: np.ndarray, pad: int, channel=None, n_threads: int = 4):
    """Fill rows of ``buf`` (B, buf_len) float32 with reflect-padded samples
    from any natively-decodable WAV (8/16/24/32-bit PCM, IEEE float 32/64,
    multi-channel) or 16-bit mono FLAC. ``channel=None`` takes the float32
    channel mean (librosa mono semantics); an int selects that channel with
    numpy indexing (negative counts from the end, mono ignores it) —
    matching nisqa_tpu/audio/wav.py::read_wav bit-for-bit.

    Returns (n_samples, sample_rates, status) int32 arrays; status != 0 rows
    were not filled (caller decodes those in Python).
    """
    lib = _load()
    assert lib is not None
    assert buf.dtype == np.float32 and buf.flags.c_contiguous
    n = len(paths)
    n_out = np.zeros(n, np.int32)
    sr_out = np.zeros(n, np.int32)
    status = np.zeros(n, np.int32)
    lib.fill_batch_f32(
        _paths_array(paths), n,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(buf.shape[1]), ctypes.c_int64(pad),
        # mean-sentinel is INT32_MIN, NOT -1: negative channel indices are
        # reference-legal (numpy x[channel] counts from the end)
        ctypes.c_int(-(2**31) if channel is None else int(channel)),
        n_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        sr_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    return n_out, sr_out, status


def scan_audio(paths, n_threads: int = 4):
    """Header-only scan -> (n_samples, sample_rates, kind, status) int32.

    kind 0 = raw-int16 transport eligible (PCM16-mono WAV / 16-bit mono
    FLAC), 1 = natively float32-decodable WAV, -1 = Python fallback.
    """
    lib = _load()
    assert lib is not None
    n = len(paths)
    n_out = np.zeros(n, np.int32)
    sr_out = np.zeros(n, np.int32)
    kind = np.zeros(n, np.int32)
    status = np.zeros(n, np.int32)
    lib.scan_audio(
        _paths_array(paths), n,
        n_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        sr_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        kind.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    return n_out, sr_out, kind, status


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
