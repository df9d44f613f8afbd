"""Cross-validation of the from-spec decoders against FFmpeg.

Rounds 1-2 established our WAV/FLAC decoders "from first principles"
(no independent decoder existed in the environment). With the FFmpeg
libraries now bound (native/codecdecode.cpp), every format both sides
decode is cross-checked BIT-FOR-BIT: our numpy RIFF/FLAC decoders vs
libavcodec on the same files, covering every FLAC encode mode our writer
can produce (subframe types, stereo decorrelation, residual layouts).
A disagreement on any sample fails — this converts the "by construction"
confidence of audio/wav.py and audio/flac.py into measured equivalence
against an independent implementation.
"""

import numpy as np
import pytest

from nisqa_tpu.audio import codec
from nisqa_tpu.audio.flac import write_flac
from nisqa_tpu.audio.wav import read_wav, write_wav

needs_codec = pytest.mark.skipif(
    not codec.available(), reason="system FFmpeg libraries unavailable")


def _signal(n, seed, channels=1):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000
    base = [
        0.5 * np.sin(2 * np.pi * (180 + 90 * c) * t)
        + 0.2 * np.sin(2 * np.pi * (1111 + 37 * c) * t)
        + 0.12 * rng.standard_normal(n)
        for c in range(channels)
    ]
    x = np.stack(base, axis=-1) if channels > 1 else base[0]
    return np.clip(x, -0.999, 0.999).astype(np.float32)


def _ffmpeg_full(path):
    """FFmpeg decode keeping the (C, N)/(N,) layout read_wav uses."""
    x, sr = codec.decode(path)
    return x, sr


@needs_codec
@pytest.mark.parametrize("mode", ["indep", "left-side", "right-side", "mid-side"])
@pytest.mark.parametrize("predictor", ["fixed", "lpc", "verbatim"])
def test_flac_decoder_bit_exact_vs_ffmpeg_stereo(tmp_path, mode, predictor):
    x = _signal(9001, seed=hash((mode, predictor)) % 2**31, channels=2)
    p = str(tmp_path / f"{mode}-{predictor}.flac")
    write_flac(p, x, 16000, mode=mode, predictor=predictor)

    ours, sr1 = read_wav(p, mono=False)
    ff, sr2 = _ffmpeg_full(p)
    assert sr1 == sr2 == 16000
    np.testing.assert_array_equal(ours, ff)


@needs_codec
@pytest.mark.parametrize("partition_order,escape", [(0, False), (2, False), (3, True)])
def test_flac_decoder_bit_exact_vs_ffmpeg_partitions(tmp_path, partition_order, escape):
    x = _signal(16384, seed=7)
    p = str(tmp_path / f"po{partition_order}-{escape}.flac")
    write_flac(p, x, 16000, partition_order=partition_order, escape=escape)

    ours, sr1 = read_wav(p)
    ff, sr2 = _ffmpeg_full(p)
    assert sr1 == sr2 == 16000
    np.testing.assert_array_equal(ours, ff)


@needs_codec
def test_wav_pcm16_bit_exact_vs_ffmpeg(tmp_path):
    x = _signal(12000, seed=11)
    p = str(tmp_path / "x.wav")
    write_wav(p, x, 16000)

    ours, sr1 = read_wav(p)
    ff, sr2 = _ffmpeg_full(p)
    assert sr1 == sr2 == 16000
    np.testing.assert_array_equal(ours, ff)


@needs_codec
@pytest.mark.parametrize("bits", [24, 32])
def test_wav_deep_pcm_bit_exact_vs_ffmpeg(tmp_path, bits):
    """24/32-bit PCM: FFmpeg widens s24 into s32<<8, so v/2^23 == (v<<8)/2^31
    exactly — both sides must produce the identical float32."""
    import struct

    rng = np.random.default_rng(13)
    n = 4096
    if bits == 24:
        vals = rng.integers(-(1 << 23), 1 << 23, n, dtype=np.int32)
        raw = b"".join(struct.pack("<i", int(v))[:3] for v in vals)
    else:
        vals = rng.integers(-(1 << 31), 1 << 31, n, dtype=np.int64).astype(np.int32)
        raw = vals.astype("<i4").tobytes()
    p = str(tmp_path / f"pcm{bits}.wav")
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000,
                                   16000 * bits // 8, bits // 8, bits)
           + b"data" + struct.pack("<I", len(raw)))
    with open(p, "wb") as f:
        f.write(hdr + raw)

    ours, sr1 = read_wav(p)
    ff, sr2 = _ffmpeg_full(p)
    assert sr1 == sr2 == 16000
    np.testing.assert_array_equal(ours, ff)


@needs_codec
def test_wav_float32_bit_exact_vs_ffmpeg(tmp_path):
    import struct

    x = _signal(8000, seed=17)
    raw = x.astype("<f4").tobytes()
    p = str(tmp_path / "f32.wav")
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000,
                                   16000 * 4, 4, 32)
           + b"data" + struct.pack("<I", len(raw)))
    with open(p, "wb") as f:
        f.write(hdr + raw)

    ours, sr1 = read_wav(p)
    ff, sr2 = _ffmpeg_full(p)
    assert sr1 == sr2 == 16000
    np.testing.assert_array_equal(ours, ff)
