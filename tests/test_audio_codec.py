"""Compressed-format input (mp3/ogg/m4a/opus) via the system-codec shim.

The reference accepts these exactly as far as the host's system codecs do
(librosa -> audioread, `/root/reference/nisqa/NISQA_lib.py:2298-2306`);
nisqa_tpu binds the host's FFmpeg libraries through native/codecdecode.cpp.
Test vectors are generated with the same shim's encoder (no external
encoder exists in this environment).
"""

import numpy as np
import pytest

from nisqa_tpu.audio import codec
from nisqa_tpu.audio.wav import WavFormatError, read_wav, read_wav_pcm16_mono, write_wav
from tests.test_e2e import TINY_ARGS, _make_ckpt, _write_corpus

needs_codec = pytest.mark.skipif(
    not codec.available(), reason="system FFmpeg libraries unavailable")

FORMATS = ["mp3", "ogg", "m4a", "opus", "aiff"]


def _sine(sr, dur, freq, amp=0.3):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _peak_hz(y, sr):
    y = y - y.mean()
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    return np.argmax(spec) * sr / len(y)


@needs_codec
@pytest.mark.parametrize("ext", FORMATS)
def test_roundtrip_through_front_door(tmp_path, ext):
    """encode -> read_wav: native sample rate kept, duration within codec
    padding slack, the tone survives at the right frequency and level."""
    sr, freq = 48000, 440.0
    x = _sine(sr, 2.0, freq)
    p = str(tmp_path / f"tone.{ext}")
    codec.encode(p, x, sr)

    y, sr2 = read_wav(p)
    assert sr2 == sr
    assert y.dtype == np.float32 and y.ndim == 1
    # gapless trim is codec-dependent: mp3/ogg/opus come back exact, aac
    # may keep up to one frame of padding
    assert abs(len(y) - len(x)) <= 2048
    assert abs(_peak_hz(y, sr2) - freq) < 2.0
    rms = float(np.sqrt((y ** 2).mean()))
    assert abs(rms - 0.3 / np.sqrt(2)) < 0.03


@needs_codec
def test_stereo_mono_mean_and_channel_select(tmp_path):
    """Multi-channel semantics match the WAV path: float-mean to mono by
    default, `channel` selects one (negative counts from the end) — the
    reference's ms_channel handling (`NISQA_lib.py:2299-2303`)."""
    sr = 48000
    left = _sine(sr, 1.0, 440.0)
    right = _sine(sr, 1.0, 220.0)
    p = str(tmp_path / "st.ogg")
    codec.encode(p, np.stack([left, right]), sr)

    y_mono, _ = read_wav(p)
    y0, _ = read_wav(p, channel=0)
    y1, _ = read_wav(p, channel=1)
    y_last, _ = read_wav(p, channel=-1)
    assert abs(_peak_hz(y0, sr) - 440.0) < 2.0
    assert abs(_peak_hz(y1, sr) - 220.0) < 2.0
    np.testing.assert_array_equal(y1, y_last)
    # the mono mean carries both tones at ~half amplitude
    spec = np.abs(np.fft.rfft(y_mono * np.hanning(len(y_mono))))
    hz = np.fft.rfftfreq(len(y_mono), 1 / sr)
    for f in (220.0, 440.0):
        assert spec[np.argmin(np.abs(hz - f))] > 0.25 * spec.max()


@needs_codec
def test_pcm16_fast_path_defers_to_codec(tmp_path):
    """read_wav_pcm16_mono returns None for codec formats (caller falls
    back to the full decode) instead of raising."""
    p = str(tmp_path / "t.mp3")
    codec.encode(p, _sine(48000, 0.5, 300.0), 48000)
    assert read_wav_pcm16_mono(p) is None


def test_unavailable_codec_keeps_actionable_error(tmp_path, monkeypatch):
    """Codec-less hosts behave like round 2: the format error names the
    file and detected format."""
    p = str(tmp_path / "fake.mp3")
    with open(p, "wb") as f:
        f.write(b"ID3" + b"\x00" * 64)
    monkeypatch.setattr(codec, "_lib", None)
    monkeypatch.setattr(codec, "_tried", True)
    with pytest.raises(WavFormatError, match="fake.mp3.*mp3"):
        read_wav(p)
    with pytest.raises(WavFormatError, match="fake.mp3.*mp3"):
        read_wav_pcm16_mono(p)


def test_corrupt_codec_file_error_names_file(tmp_path):
    """A file that sniffs as mp3 but fails to decode raises the actionable
    error with the codec detail appended (not a bare C error)."""
    if not codec.available():
        pytest.skip("system FFmpeg libraries unavailable")
    p = str(tmp_path / "broken.mp3")
    with open(p, "wb") as f:
        f.write(b"ID3" + bytes(range(256)) * 4)
    with pytest.raises(WavFormatError, match="broken.mp3"):
        read_wav(p)


@needs_codec
def test_engine_mixed_corpus_mos_close_to_wav(tmp_path):
    """The InferenceEngine serves wav and lossy encodes of the same audio
    side by side (codec files ride the Python-fallback f32 transport) and
    the lossy MOS stays within codec-noise of the wav MOS."""
    from nisqa_tpu.compat.torch_ckpt import load_model_from_tar
    from nisqa_tpu.data.pipeline import InferenceEngine, MsConfig

    sr = 8000
    rng = np.random.default_rng(3)
    wav_paths, lossy_paths = [], []
    for i in range(3):
        t = np.arange(int(sr * (0.6 + 0.3 * i))) / sr
        x = (0.4 * np.sin(2 * np.pi * (210 + 50 * i) * t)
             + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
        wp = str(tmp_path / f"x{i}.wav")
        write_wav(wp, x, sr)
        ext = "mp3" if i % 2 else "ogg"
        lp = str(tmp_path / f"x{i}.{ext}")
        # 8 kHz constrains both coders: mp3 is MPEG-2.5 (<= 64k), libvorbis
        # mono accepts only ~8-42k at this rate
        codec.encode(lp, x, sr, bitrate=48000 if ext == "mp3" else 24000)
        wav_paths.append(wp)
        lossy_paths.append(lp)

    ckpt = _make_ckpt(tmp_path)
    model, params, state, args = load_model_from_tar(ckpt)
    eng = InferenceEngine(model, params, state, MsConfig(args),
                          batch_size=4, num_workers=2)
    y = eng.predict_paths(wav_paths + lossy_paths)
    assert np.isfinite(y).all()
    wav_mos, lossy_mos = y[:3, 0], y[3:, 0]
    assert np.abs(wav_mos - lossy_mos).max() < 0.35


@needs_codec
def test_predict_dir_picks_up_codec_files(tmp_path):
    """--mode predict_dir globs compressed extensions when the codec shim
    is available (reference globs *.wav only, `NISQA_model.py:745-777`)."""
    from nisqa_tpu.model import NisqaTPU

    names = _write_corpus(tmp_path, n=2)
    codec.encode(str(tmp_path / "extra.mp3"), _sine(8000, 0.7, 250.0), 8000,
                 bitrate=48000)
    ckpt = _make_ckpt(tmp_path)
    df = NisqaTPU({
        "mode": "predict_dir", "pretrained_model": ckpt,
        "data_dir": str(tmp_path), "output_dir": None,
        "tr_bs_val": 4, "tr_num_workers": 2, "name": "tiny",
    }).predict()
    assert set(df.deg) == set(names) | {"extra.mp3"}
    assert np.isfinite(df.mos_pred.to_numpy()).all()


@needs_codec
def test_engine_resamples_codec_input(tmp_path):
    """ms_sr set: compressed files decode in Python and resample to ms_sr —
    the reference's `lb.load(path, sr=ms_sr)` behavior for such inputs
    (`NISQA_lib.py:2298-2304`)."""
    from nisqa_tpu.compat.torch_ckpt import load_model_from_tar
    from nisqa_tpu.data.pipeline import InferenceEngine, MsConfig

    p = str(tmp_path / "hi.ogg")
    codec.encode(p, _sine(16000, 0.8, 300.0), 16000, bitrate=24000)
    ckpt = _make_ckpt(tmp_path)
    model, params, state, args = load_model_from_tar(ckpt)
    eng = InferenceEngine(model, params, state,
                          MsConfig({**args, "ms_sr": 8000}),
                          batch_size=2, num_workers=1)
    y = eng.predict_paths([p])
    assert y.shape[0] == 1 and np.isfinite(y).all()


@needs_codec
def test_truncated_compressed_file_decodes_or_errors_cleanly(tmp_path):
    """A file cut mid-stream either decodes the intact prefix or raises the
    actionable WavFormatError — never crashes or returns garbage lengths."""
    p = str(tmp_path / "t.mp3")
    codec.encode(p, _sine(48000, 2.0, 330.0), 48000)
    blob = open(p, "rb").read()
    pt = str(tmp_path / "trunc.mp3")
    with open(pt, "wb") as f:
        f.write(blob[: len(blob) // 3])
    try:
        y, sr = read_wav(pt)
        assert sr == 48000 and 0 < len(y) < 2 * 48000
        assert np.isfinite(y).all()
    except WavFormatError as e:
        assert "trunc.mp3" in str(e)


@needs_codec
def test_training_over_corpus_with_codec_files(tmp_path):
    """A training CSV may reference compressed files (the reference trains
    on whatever librosa loads). Both the host-fill and device-resident
    corpus paths must handle them."""
    import pandas as pd

    from nisqa_tpu.model import NisqaTPU

    sr = 8000
    rng = np.random.default_rng(9)
    names = []
    for i in range(6):
        t = np.arange(int(sr * (0.5 + 0.15 * i))) / sr
        x = (0.35 * np.sin(2 * np.pi * (220 + 30 * i) * t)
             + 0.04 * rng.standard_normal(len(t))).astype(np.float32)
        if i == 2:
            name = f"c{i}.mp3"
            codec.encode(str(tmp_path / name), x, sr, bitrate=48000)
        elif i == 4:
            name = f"c{i}.ogg"
            codec.encode(str(tmp_path / name), x, sr, bitrate=24000)
        else:
            name = f"c{i}.wav"
            write_wav(str(tmp_path / name), x, sr)
        names.append(name)
    df = pd.DataFrame({"filename": names, "db": ["T"] * 4 + ["V"] * 2,
                       "mos": rng.uniform(1, 5, 6).round(2)})
    df.to_csv(tmp_path / "c.csv", index=False)
    base = {
        **TINY_ARGS, "mode": "main", "pretrained_model": False,
        "data_dir": str(tmp_path), "output_dir": str(tmp_path / "out"),
        "csv_file": "c.csv", "csv_deg": "filename",
        "csv_mos_train": "mos", "csv_mos_val": "mos",
        "csv_db_train": ["T"], "csv_db_val": ["V"], "csv_con": None,
        "tr_epochs": 1, "tr_early_stop": 50, "tr_bs": 3, "tr_bs_val": 2,
        "tr_lr": 1e-3, "tr_lr_patience": 15, "tr_num_workers": 0,
        "tr_parallel": False, "tr_checkpoint": "best_only", "tr_verbose": 0,
        "tr_bias_mapping": None, "tr_bias_min_r": None,
        "tr_bias_anchor_db": None, "seed": 0,
    }
    for to_mem in (False, True):
        NisqaTPU({**base, "tr_ds_to_memory": to_mem,
                  "name": f"mix{to_mem}"}).train()
