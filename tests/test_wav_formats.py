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
    assert status[0] != 0  # python fallback required (legacy i16-only scan)


def _format_fixtures(tmp_path, n=120, sr=16000):
    """One file per supported non-PCM16 WAV flavor + a PCM16 mono control."""
    rng = np.random.default_rng(0)
    y = (0.5 * np.sin(2 * np.pi * 200 * np.arange(n) / sr)
         + 0.05 * rng.standard_normal(n)).astype(np.float64)
    files = []
    i24 = np.clip(np.round(y * (1 << 23)), -(1 << 23), (1 << 23) - 1).astype(np.int64)
    files.append(_write(tmp_path, "p24.wav", _wav_bytes(
        b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in i24), 1, 1, sr, 24)))
    i32 = np.clip(np.round(y * (1 << 31)), -(1 << 31), (1 << 31) - 1).astype("<i4")
    files.append(_write(tmp_path, "p32.wav", _wav_bytes(i32.tobytes(), 1, 1, sr, 32)))
    files.append(_write(tmp_path, "f32.wav", _wav_bytes(
        y.astype("<f4").tobytes(), 3, 1, sr, 32)))
    files.append(_write(tmp_path, "f64.wav", _wav_bytes(
        y.astype("<f8").tobytes(), 3, 1, sr, 64)))
    u8 = np.clip(np.round(y * 128) + 128, 0, 255).astype(np.uint8)
    files.append(_write(tmp_path, "p8.wav", _wav_bytes(u8.tobytes(), 1, 1, sr, 8)))
    st = np.empty(2 * n, dtype="<i2")
    st[0::2] = np.clip(np.round(y * 32767), -32768, 32767).astype("<i2")
    st[1::2] = np.clip(np.round(-0.5 * y * 32767), -32768, 32767).astype("<i2")
    files.append(_write(tmp_path, "st16.wav", _wav_bytes(st.tobytes(), 1, 2, sr, 16, extensible=True)))
    m16 = np.clip(np.round(y * 32767), -32768, 32767).astype("<i2")
    files.append(_write(tmp_path, "m16.wav", _wav_bytes(m16.tobytes(), 1, 1, sr, 16)))
    return files


def test_native_f32_fill_matches_python(tmp_path):
    """C++ f32 batch fill must be bit-identical to the numpy decoder +
    reflect pad for every supported WAV flavor."""
    from nisqa_tpu.audio.melspec import pad_audio_for_batch
    from nisqa_tpu.data import native

    if not native.available():
        pytest.skip("native loader unavailable")
    files = _format_fixtures(tmp_path)
    n_fft, buf_len = 16, 160
    buf = np.zeros((len(files), buf_len), np.float32)
    ns, srs, status = native.fill_batch_f32(files, buf, n_fft // 2)
    assert (status == 0).all(), status
    for j, p in enumerate(files):
        y, sr = wavio.read_wav(p)
        assert srs[j] == sr and ns[j] == len(y)
        expect = pad_audio_for_batch(y, n_fft, buf_len)
        # tail past the clamped right reflect is never consumed downstream
        w = n_fft // 2 + len(y) + min(n_fft // 2, buf_len - (n_fft // 2 + len(y)))
        np.testing.assert_array_equal(buf[j, :w], expect[:w], err_msg=p)


def test_native_f32_channel_select(tmp_path):
    """channel= semantics match the reference: 0-based select on
    multi-channel files, silently ignored on mono (NISQA_lib.py:2299-2303)."""
    from nisqa_tpu.audio.melspec import pad_audio_for_batch
    from nisqa_tpu.data import native

    if not native.available():
        pytest.skip("native loader unavailable")
    files = _format_fixtures(tmp_path)
    stereo, mono = files[-2], files[-1]
    n_fft, buf_len = 16, 160
    for ch in (0, 1):
        buf = np.zeros((2, buf_len), np.float32)
        ns, srs, status = native.fill_batch_f32([stereo, mono], buf, n_fft // 2,
                                                channel=ch)
        assert (status == 0).all()
        for j, p in enumerate((stereo, mono)):
            y, _ = wavio.read_wav(p, channel=ch)
            expect = pad_audio_for_batch(y, n_fft, buf_len)
            w = n_fft // 2 + len(y) + min(n_fft // 2, buf_len - (n_fft // 2 + len(y)))
            np.testing.assert_array_equal(buf[j, :w], expect[:w], err_msg=f"{p} ch{ch}")
    # negative index counts from the end (numpy semantics): -1 == channel 1
    buf_neg = np.zeros((1, buf_len), np.float32)
    buf_pos = np.zeros((1, buf_len), np.float32)
    _, _, st_n = native.fill_batch_f32([stereo], buf_neg, n_fft // 2, channel=-1)
    _, _, st_p = native.fill_batch_f32([stereo], buf_pos, n_fft // 2, channel=1)
    assert st_n[0] == 0 and st_p[0] == 0
    np.testing.assert_array_equal(buf_neg, buf_pos)
    # out-of-range channel on a true multi-channel file must fail over
    buf = np.zeros((1, buf_len), np.float32)
    _, _, st = native.fill_batch_f32([stereo], buf, n_fft // 2, channel=5)
    assert st[0] != 0


def test_truncated_file_raises_in_engine(tmp_path):
    """A file truncated below one segment window AFTER the header scan must
    surface the reference's 'Sample too short' error naming the file — not
    a silent NaN prediction (all-masked pooling)."""
    from tests.test_e2e import TINY_ARGS, _make_ckpt
    from nisqa_tpu.model import NisqaTPU

    sr = 8000
    files = _format_fixtures(tmp_path, n=int(sr * 0.8), sr=sr)
    target = files[2]  # f32.wav: rides the native_f32 transport
    ckpt = _make_ckpt(tmp_path)
    (tmp_path / "out").mkdir()
    args = {
        **TINY_ARGS,
        "mode": "predict_dir",
        "pretrained_model": ckpt,
        "data_dir": str(tmp_path),
        "output_dir": str(tmp_path / "out"),
        "tr_bs_val": 4,
        "tr_num_workers": 2,
    }
    runner = NisqaTPU(args)
    # truncate AFTER dataset/scan setup so the declared length still gates
    data = open(target, "rb").read()
    open(target, "wb").write(data[: 44 + 4 * 10])  # 10 samples
    with pytest.raises(ValueError, match="[Ss]ample too short|Error loading"):
        runner.predict()


def test_scan_audio_kinds(tmp_path):
    from nisqa_tpu.data import native

    if not native.available():
        pytest.skip("native loader unavailable")
    files = _format_fixtures(tmp_path)
    ns, srs, kind, status = native.scan_audio(files)
    assert (status == 0).all()
    assert kind[-1] == 0  # PCM16 mono control: raw-i16 transport
    assert (kind[:-1] == 1).all()  # everything else: native f32 decode
    garbage = _write(tmp_path, "bad.wav", b"junk" * 30)
    _, _, kind2, status2 = native.scan_audio([garbage])
    assert status2[0] != 0 and kind2[0] == -1


def test_native_f32_truncated_file(tmp_path):
    """Truncated payloads decode the available samples (Python-decoder
    semantics: the data-size field is clamped to the file); only files left
    shorter than the reflect pad fail over to the Python path."""
    from nisqa_tpu.data import native

    if not native.available():
        pytest.skip("native loader unavailable")
    y = np.linspace(-0.5, 0.5, 400, dtype=np.float32)
    p = _write(tmp_path, "t.wav", _wav_bytes(y.tobytes(), 3, 1, 8000, 32))
    ns, srs, kind, status = native.scan_audio([p])
    assert status[0] == 0 and kind[0] == 1
    data = open(p, "rb").read()
    open(p, "wb").write(data[: len(data) - 1500])  # 25 samples remain
    buf = np.zeros((1, 600), np.float32)
    n2, _, st2 = native.fill_batch_f32([p], buf, 8)
    assert st2[0] == 0 and n2[0] == 25
    y_py, _ = wavio.read_wav(p)
    assert len(y_py) == 25
    np.testing.assert_array_equal(buf[0, 8 : 8 + 25], y_py)
    # shrink below pad+2 samples: native refuses, engine falls back
    open(p, "wb").write(data[: 44 + 4 * 4])  # 4 samples < pad+2
    _, _, st3 = native.fill_batch_f32([p], buf, 8)
    assert st3[0] != 0


def test_scan_audio_fuzz_never_crashes(tmp_path):
    """Random/mutated headers: the C++ scanner must return a status, never
    crash, and must never claim kind 0/1 for something the Python decoder
    rejects outright."""
    from nisqa_tpu.data import native

    if not native.available():
        pytest.skip("native loader unavailable")
    rng = np.random.default_rng(42)
    paths = []
    # pure garbage of assorted sizes
    for k, size in enumerate([0, 1, 3, 11, 44, 100, 4096]):
        paths.append(_write(tmp_path, f"g{k}.bin", rng.bytes(size)))
    # a valid wav with bytes randomly flipped
    good = _wav_bytes(np.zeros(64, "<i2").tobytes(), 1, 1, 8000, 16)
    for k in range(20):
        mutated = bytearray(good)
        for _ in range(rng.integers(1, 6)):
            mutated[rng.integers(0, len(mutated))] = rng.integers(0, 256)
        paths.append(_write(tmp_path, f"m{k}.wav", bytes(mutated)))
    ns, srs, kind, status = native.scan_audio(paths)
    for i, p in enumerate(paths):
        if status[i] == 0:
            # anything the scanner accepts, the Python decoder must parse too
            try:
                y, sr = wavio.read_wav(p)
            except wavio.WavFormatError:
                # acceptable only if the fill also refuses it (engine falls
                # back per-file and surfaces the Python error)
                buf = np.zeros((1, max(16, int(ns[i]) + 16)), np.float32)
                _, _, st = native.fill_batch_f32([p], buf, 4)
                assert st[0] != 0, f"{p}: scanner+fill accepted, python rejects"


def test_engine_mixed_format_dir_native(tmp_path):
    """predict over a directory mixing every WAV flavor rides the native
    scan + f32 fill and matches per-file Python-decoded predictions."""
    import jax

    from tests.test_e2e import TINY_ARGS, _make_ckpt
    from nisqa_tpu.model import NisqaTPU

    sr = 8000
    files = _format_fixtures(tmp_path, n=int(sr * 0.8), sr=sr)
    ckpt = _make_ckpt(tmp_path)
    (tmp_path / "out").mkdir()
    args = {
        **TINY_ARGS,
        "mode": "predict_dir",
        "pretrained_model": ckpt,
        "data_dir": str(tmp_path),
        "output_dir": str(tmp_path / "out"),
        "tr_bs_val": 4,
        "tr_num_workers": 2,
    }
    runner = NisqaTPU(args)
    df = runner.predict()
    assert len(df) == len(files)
    assert np.isfinite(df["mos_pred"].to_numpy()).all()
    # the engine must have used native entries for every fixture
    eng = runner._engine()
    entries = eng._scan_transport(sorted(files))
    kinds = {e[0] for e in entries}
    assert kinds <= {"native", "native_f32"} and "native_f32" in kinds
