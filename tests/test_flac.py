"""FLAC decoding: round trips, dispatch, transport parity, engine e2e.

The reference scores anything librosa/soundfile decodes — for speech corpora
that is WAV + FLAC (`/root/reference/nisqa/NISQA_lib.py:2298-2306`). These
tests pin: exact 16-bit PCM recovery through every stereo decorrelation
mode, bit-identical i16 transport vs the same audio as WAV, identical MOS
through the inference engine, and actionable errors for mp3/ogg."""

import os

import numpy as np
import pytest

from nisqa_tpu.audio import codec
from nisqa_tpu.audio import wav as wavio
from nisqa_tpu.audio.flac import (
    FlacFormatError,
    decode_flac,
    read_flac,
    read_flac_pcm16_mono,
    write_flac,
)


def _signal(n, sr=16000, seed=0, stereo=False):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    y = 0.4 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(n)
    if stereo:
        y2 = 0.3 * np.sin(2 * np.pi * 330 * t) + 0.05 * rng.standard_normal(n)
        return np.stack([y, y2], axis=1).astype(np.float32)
    return y.astype(np.float32)


def _as_pcm16(x):
    return np.clip(np.round(np.asarray(x) * 32767.0), -32768, 32767).astype(np.int64)


def test_roundtrip_mono_exact(tmp_path):
    y = _signal(20000)
    p = str(tmp_path / "m.flac")
    write_flac(p, y, 16000)
    pcm, sr, bits = decode_flac(open(p, "rb").read())
    assert sr == 16000 and bits == 16 and pcm.shape == (20000, 1)
    np.testing.assert_array_equal(pcm[:, 0], _as_pcm16(y))


@pytest.mark.parametrize("mode", ["indep", "left-side", "right-side", "mid-side"])
def test_roundtrip_stereo_modes_exact(tmp_path, mode):
    y = _signal(12345, stereo=True)  # non-multiple of blocksize: ragged tail
    p = str(tmp_path / f"s_{mode}.flac")
    write_flac(p, y, 44100, mode=mode)
    pcm, sr, bits = decode_flac(open(p, "rb").read())
    assert sr == 44100 and pcm.shape == (12345, 2)
    np.testing.assert_array_equal(pcm, _as_pcm16(y))


@pytest.mark.parametrize(
    "kw",
    [
        {"predictor": "lpc"},
        {"predictor": "verbatim"},
        {"partition_order": 3},
        {"escape": True},
        {"predictor": "lpc", "partition_order": 2, "escape": True},
    ],
    ids=["lpc", "verbatim", "partitions", "escape", "lpc-part-escape"],
)
def test_roundtrip_subframe_variants_exact(tmp_path, kw):
    """LPC subframes, raw-escape residuals, multi-partition rice."""
    y = _signal(10000, seed=3)
    p = str(tmp_path / "v.flac")
    write_flac(p, y, 16000, **kw)
    pcm, _, _ = decode_flac(open(p, "rb").read())
    np.testing.assert_array_equal(pcm[:, 0], _as_pcm16(y))


def test_roundtrip_wasted_bits_exact(tmp_path):
    """Samples with shared zero LSBs trigger the wasted-bits path."""
    y = _signal(6000, seed=4)
    pcm16 = (_as_pcm16(y) >> 3) << 3  # 3 wasted bits
    p = str(tmp_path / "w.flac")
    write_flac(p, pcm16.astype(np.float64) / 32767.0, 16000)
    got, _, _ = decode_flac(open(p, "rb").read())
    np.testing.assert_array_equal(got[:, 0], pcm16)


def test_read_wav_dispatches_flac_and_matches_wav(tmp_path):
    y = _signal(16000, stereo=True)
    pw, pf = str(tmp_path / "a.wav"), str(tmp_path / "a.flac")
    wavio.write_wav(pw, y.T, 48000)  # write_wav takes (C, N)
    write_flac(pf, y, 48000, mode="mid-side")
    xw, srw = wavio.read_wav(pw)
    xf, srf = wavio.read_wav(pf)
    assert srw == srf == 48000
    # both decode the same int PCM, so the float samples are identical
    np.testing.assert_array_equal(xw, xf)
    # channel select parity too
    np.testing.assert_array_equal(
        wavio.read_wav(pw, channel=1)[0], wavio.read_wav(pf, channel=1)[0]
    )


def test_pcm16_mono_transport_bit_exact(tmp_path):
    y = _signal(9000)
    pw, pf = str(tmp_path / "t.wav"), str(tmp_path / "t.flac")
    wavio.write_wav(pw, y, 16000)
    write_flac(pf, y, 16000)
    raw_w = wavio.read_wav_pcm16_mono(pw)
    raw_f = wavio.read_wav_pcm16_mono(pf)
    assert raw_w is not None and raw_f is not None
    np.testing.assert_array_equal(raw_w[0], raw_f[0])
    assert raw_w[1] == raw_f[1] == 16000
    # stereo flac does not qualify for the mono fast path
    ps = str(tmp_path / "s.flac")
    write_flac(ps, _signal(4000, stereo=True), 16000)
    assert read_flac_pcm16_mono(ps) is None


def test_unsupported_formats_raise_actionable_errors(tmp_path):
    cases = {
        "x.mp3": b"ID3\x04\x00\x00\x00\x00\x00\x00" + b"\x00" * 64,
        "x.ogg": b"OggS\x00\x02" + b"\x00" * 64,
        "x.m4a": b"\x00\x00\x00 ftypM4A " + b"\x00" * 64,
    }
    for name, blob in cases.items():
        p = str(tmp_path / name)
        with open(p, "wb") as f:
            f.write(blob)
        # undecodable garbage: even with the system-codec shim bound, the
        # error stays actionable (file + format named)
        with pytest.raises(wavio.WavFormatError) as ei:
            wavio.read_wav(p)
        msg = str(ei.value)
        assert name in msg and ("format" in msg)
        if codec.available():
            # fast path defers to the full decode instead of raising
            assert wavio.read_wav_pcm16_mono(p) is None
        else:
            with pytest.raises(wavio.WavFormatError):
                wavio.read_wav_pcm16_mono(p)


def test_unknown_total_samples_stream(tmp_path):
    """STREAMINFO with total_samples=0 (streamed encodes) must decode all
    frames and stop cleanly at end of data."""
    y = _signal(10000, seed=6)
    p = str(tmp_path / "u.flac")
    write_flac(p, y, 16000)
    blob = bytearray(open(p, "rb").read())
    # zero the 36-bit total-samples field (STREAMINFO body bytes 13..17)
    blob[8 + 13] &= 0xF0
    for i in range(14, 18):
        blob[8 + i] = 0
    pcm, sr, bits = decode_flac(bytes(blob))
    np.testing.assert_array_equal(pcm[:, 0], _as_pcm16(y))


def test_truncated_flac_raises(tmp_path):
    p = str(tmp_path / "trunc.flac")
    y = _signal(8000)
    write_flac(p, y, 16000)
    blob = open(p, "rb").read()
    with open(p, "wb") as f:
        f.write(blob[: len(blob) // 2])
    with pytest.raises(FlacFormatError):
        read_flac(p)


@pytest.mark.parametrize("kw", [{}, {"predictor": "lpc"}, {"partition_order": 2},
                                {"escape": True}],
                         ids=["fixed", "lpc", "partitions", "escape"])
def test_native_flac_decode_matches_python(tmp_path, kw):
    """The C++ loader's FLAC path (scan + batch fill) must reproduce the
    Python decoder bit-for-bit, including the reflect padding layout."""
    from nisqa_tpu.data import native

    if not native.available():
        pytest.skip("native loader unavailable")

    sr, n = 16000, 50000
    y = _signal(n, sr=sr, seed=8)
    p = str(tmp_path / "n.flac")
    write_flac(p, y, sr, **kw)

    ns, srs, status = native.scan_wavs([p], n_threads=1)
    assert status[0] == 0 and ns[0] == n and srs[0] == sr

    pad = 2048
    buf = np.zeros((1, pad + n + pad), np.int16)
    ns2, srs2, status2 = native.fill_batch_i16([p], buf, pad, n_threads=1)
    assert status2[0] == 0 and ns2[0] == n and srs2[0] == sr

    pcm = read_flac_pcm16_mono(p)[0]
    np.testing.assert_array_equal(buf[0, pad : pad + n], pcm)
    # reflect pads
    np.testing.assert_array_equal(buf[0, :pad], pcm[pad:0:-1])
    np.testing.assert_array_equal(buf[0, pad + n :], pcm[n - 2 : n - 2 - pad : -1])


def test_native_scan_rejects_stereo_flac(tmp_path):
    from nisqa_tpu.data import native

    if not native.available():
        pytest.skip("native loader unavailable")
    p = str(tmp_path / "st.flac")
    write_flac(p, _signal(8000, stereo=True), 16000, mode="mid-side")
    ns, srs, status = native.scan_wavs([p], n_threads=1)
    assert status[0] != 0  # falls back to the Python float path


def test_engine_predicts_flac_same_as_wav(tmp_path):
    """Full pipeline: predict a small corpus stored as FLAC and as WAV with
    released nisqa.tar weights — identical outputs (i16 transport both)."""
    from nisqa_tpu.compat.torch_ckpt import load_model_from_tar
    from nisqa_tpu.data.pipeline import InferenceEngine, MsConfig

    rng = np.random.default_rng(5)
    wav_paths, flac_paths = [], []
    for i in range(3):
        y = _signal(48000 * 2 + i * 1111, sr=48000, seed=i)
        pw = str(tmp_path / f"c{i}.wav")
        pf = str(tmp_path / f"c{i}.flac")
        wavio.write_wav(pw, y, 48000)
        write_flac(pf, y, 48000)
        wav_paths.append(pw)
        flac_paths.append(pf)

    model, params, state, args = load_model_from_tar("/root/reference/weights/nisqa.tar")
    engine = InferenceEngine(model, params, state, MsConfig(args), batch_size=4,
                             num_workers=2)
    y_wav = engine.predict_paths(wav_paths)
    y_flac = engine.predict_paths(flac_paths)
    np.testing.assert_array_equal(y_wav, y_flac)
