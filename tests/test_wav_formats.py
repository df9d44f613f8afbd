"""WAV decoder robustness: 24-bit, 32-bit int, IEEE float, 8-bit,
WAVE_FORMAT_EXTENSIBLE headers — the formats librosa/soundfile accept."""

import io
import struct

import numpy as np
import pytest

from nisqa_tpu.audio import wav as wavio


def _wav_bytes(samples_bytes, fmt, channels, sr, bits, extensible=False):
    if extensible:
        # 40-byte fmt chunk with the real format tag in the sub-format GUID
        fmt_chunk = struct.pack(
            "<HHIIHHH", 0xFFFE, channels, sr, sr * channels * bits // 8,
            channels * bits // 8, bits, 22,
        ) + struct.pack("<HI", bits, (1 << channels) - 1) + struct.pack("<H", fmt) + b"\x00" * 14
    else:
        fmt_chunk = struct.pack(
            "<HHIIHH", fmt, channels, sr, sr * channels * bits // 8,
            channels * bits // 8, bits,
        )
    b = io.BytesIO()
    b.write(b"RIFF")
    b.write(struct.pack("<I", 4 + 8 + len(fmt_chunk) + 8 + len(samples_bytes)))
    b.write(b"WAVE")
    b.write(b"fmt ")
    b.write(struct.pack("<I", len(fmt_chunk)))
    b.write(fmt_chunk)
    b.write(b"data")
    b.write(struct.pack("<I", len(samples_bytes)))
    b.write(samples_bytes)
    return b.getvalue()


def _write(tmp_path, name, payload):
    p = tmp_path / name
    p.write_bytes(payload)
    return str(p)


def test_24bit_pcm(tmp_path):
    vals = np.array([0, 1, -1, (1 << 23) - 1, -(1 << 23)], dtype=np.int64)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    p = _write(tmp_path, "a.wav", _wav_bytes(raw, 1, 1, 16000, 24))
    y, sr = wavio.read_wav(p)
    assert sr == 16000
    expect = vals.astype(np.float64) / (1 << 23)
    assert np.allclose(y, expect, atol=1e-7)


def test_32bit_int_pcm(tmp_path):
    vals = np.array([0, 1 << 30, -(1 << 31), (1 << 31) - 1], dtype=np.int64)
    raw = np.array(vals, dtype="<i4").tobytes()
    p = _write(tmp_path, "b.wav", _wav_bytes(raw, 1, 1, 8000, 32))
    y, _ = wavio.read_wav(p)
    assert np.allclose(y, vals / (1 << 31), atol=1e-6)


def test_float32_and_float64(tmp_path):
    vals = np.array([0.0, 0.25, -0.5, 0.999], dtype=np.float32)
    p = _write(tmp_path, "c.wav", _wav_bytes(vals.tobytes(), 3, 1, 44100, 32))
    y, _ = wavio.read_wav(p)
    assert np.allclose(y, vals, atol=1e-7)
    p = _write(tmp_path, "d.wav", _wav_bytes(vals.astype("<f8").tobytes(), 3, 1, 44100, 64))
    y, _ = wavio.read_wav(p)
    assert np.allclose(y, vals, atol=1e-7)


def test_8bit_unsigned(tmp_path):
    vals = np.array([0, 128, 255], dtype=np.uint8)
    p = _write(tmp_path, "e.wav", _wav_bytes(vals.tobytes(), 1, 1, 8000, 8))
    y, _ = wavio.read_wav(p)
    assert np.allclose(y, (vals.astype(np.float32) - 128) / 128, atol=1e-7)


def test_extensible_pcm16_stereo(tmp_path):
    left = np.array([1000, -1000, 500], dtype="<i2")
    right = np.array([2000, -2000, 1500], dtype="<i2")
    inter = np.empty(6, dtype="<i2")
    inter[0::2] = left
    inter[1::2] = right
    p = _write(tmp_path, "f.wav", _wav_bytes(inter.tobytes(), 1, 2, 48000, 16, extensible=True))
    mix, sr = wavio.read_wav(p)
    assert sr == 48000
    assert np.allclose(mix, (left / 32768 + right / 32768) / 2, atol=1e-6)
    ch1, _ = wavio.read_wav(p, channel=1)
    assert np.allclose(ch1, right / 32768, atol=1e-6)
    # the PCM16 fast path must reject stereo (fall back to full decoder)
    assert wavio.read_wav_pcm16_mono(p) is None


def test_garbage_raises(tmp_path):
    p = _write(tmp_path, "g.wav", b"not a wav at all" * 10)
    with pytest.raises(wavio.WavFormatError):
        wavio.read_wav(p)


def test_native_scan_rejects_nonpcm16(tmp_path):
    from nisqa_tpu.data import native

    if not native.available():
        pytest.skip("native loader unavailable")
    vals = np.array([0.0, 0.25], dtype=np.float32)
    p = _write(tmp_path, "h.wav", _wav_bytes(vals.tobytes(), 3, 1, 44100, 32))
    n, sr, status = native.scan_wavs([p])
    assert status[0] != 0  # python fallback required
