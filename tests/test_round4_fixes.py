"""Round-4 regressions.

Bucket-tail overflow (found by the CNN-LSTM-avg shipped-config training
test): under ``seg_hop`` subsampling, ``bucket_for(n_wins)`` maps n_wins
back to frames lossily — a file whose frame count sits in the ceil-division
remainder has up to ``seg_hop-1`` trailing frames (≈ seg_hop*hop samples)
beyond the bucket's STFT read span. Those samples are never read by any
frame, but the i16 host fill wrote the FULL file into the batch buffer
(ValueError: broadcast shape mismatch) and the native C++ fills rejected
the file outright (status -1 → the crashing Python fallback). All fill
paths now clamp the copy like the f32 fill always did, reporting the TRUE
sample count so device-side masks match the scan-time plan.
"""

import numpy as np
import pytest

from tests.test_e2e import TINY_ARGS, _make_ckpt


def _overflow_wav(tmp_path, name="tail.wav", sr=8000, n=2079):
    """Crafted length: TINY geometry (n_fft 512, hop 80, seg 7, seg_hop 2)
    -> n_frames 26, n_wins 10 (bucket 10 holds 25 frames), so
    pad + n = 256 + 2079 = 2335 > buf_len 2320."""
    from nisqa_tpu.audio.wav import write_wav

    t = np.arange(n) / sr
    y = 0.4 * np.sin(2 * np.pi * 317.0 * t) + 0.01 * np.sin(2 * np.pi * 1150.0 * t)
    p = str(tmp_path / name)
    write_wav(p, y.astype(np.float32), sr)
    return p


def _engine(tmp_path, **kw):
    from nisqa_tpu.compat.torch_ckpt import load_model_from_tar
    from nisqa_tpu.data.pipeline import InferenceEngine, MsConfig

    ckpt = str(tmp_path / "tiny.tar")
    model, params, state, args = load_model_from_tar(ckpt)
    return InferenceEngine(model, params, state, MsConfig(args),
                           num_workers=2, **kw), (model, params, state, args)


def test_bucket_tail_overflow_clamps_not_crashes(tmp_path, monkeypatch):
    import jax

    from nisqa_tpu.audio.melspec import melspec_np
    from nisqa_tpu.audio.wav import read_wav
    from nisqa_tpu.data import native
    from nisqa_tpu.data.pipeline import _front_end

    _make_ckpt(tmp_path)
    p = _overflow_wav(tmp_path)
    eng, (model, params, state, a) = _engine(tmp_path, batch_size=2, cache_mb=0)

    # prove the crafted file actually overflows the bucket's buffer
    sr, n = 8000, 2079
    nw = eng.ms.n_wins(eng.ms.n_frames(n, sr))
    bucket = eng.ms.bucket_for(nw)
    _, buf_len = _front_end(eng.ms, sr, bucket)
    pad = eng.ms.n_fft // 2
    assert pad + n > buf_len, "fixture no longer exercises the overflow"

    y_native = eng.predict_paths([p])  # native C++ fill path
    assert np.isfinite(y_native).all()

    # python i16 transport path (used to raise the broadcast ValueError)
    monkeypatch.setattr(native, "available", lambda: False)
    eng2, _ = _engine(tmp_path, batch_size=2, cache_mb=0)
    y_py = eng2.predict_paths([p])
    np.testing.assert_array_equal(y_native, y_py)

    # host-side numpy reference on the full (untruncated) audio: the
    # truncated tail must not matter (it is outside every segment window)
    x, sr_r = read_wav(p)
    spec = melspec_np(x, sr_r, n_fft=a["ms_n_fft"], hop_s=a["ms_hop_length"],
                      win_s=a["ms_win_length"], n_mels=a["ms_n_mels"],
                      fmax=a["ms_fmax"])
    from nisqa_tpu.features.segments import segment_np

    segs, n_wins = segment_np(spec, a["ms_seg_length"], a["ms_seg_hop_length"],
                              a["ms_max_segments"])
    with jax.default_matmul_precision("highest"):
        ref, _ = model.apply(params, state, segs[None], np.array([n_wins]))
    assert abs(float(y_native[0, 0]) - float(ref[0, 0])) < 5e-3


def test_bucket_tail_overflow_f32_and_flac_transports(tmp_path, monkeypatch):
    """The same crafted length through the f32 native fill (stereo WAV) and
    the FLAC fill: both must clamp, not reject."""
    from nisqa_tpu.audio.flac import write_flac
    from nisqa_tpu.audio.wav import write_wav

    _make_ckpt(tmp_path)
    sr, n = 8000, 2079
    t = np.arange(n) / sr
    y = (0.4 * np.sin(2 * np.pi * 317.0 * t)).astype(np.float32)

    pw = str(tmp_path / "st.wav")
    write_wav(pw, np.stack([y, y]), sr)  # stereo -> f32 transport
    pf = str(tmp_path / "m.flac")
    write_flac(pf, y.astype(np.float64), sr)

    eng, _ = _engine(tmp_path, batch_size=2, cache_mb=0)
    out = eng.predict_paths([pw, pf])
    assert np.isfinite(out).all()
    # mono flac == mono wav content; stereo mean of identical channels too
    assert abs(out[0, 0] - out[1, 0]) < 1e-4


def test_partial_cache_advisory_on_stderr(tmp_path, capfd):
    """Storing a PARTIAL cache entry prints a one-line sizing advisory to
    stderr (stdout is the results/JSON channel); full residency stays
    silent."""
    from tests.test_e2e import _write_corpus

    names = _write_corpus(tmp_path, n=6)
    paths = [str(tmp_path / n) for n in names]
    _make_ckpt(tmp_path)

    full, _ = _engine(tmp_path, batch_size=2, cache_mb=256)
    full.predict_paths(paths)
    out, err = capfd.readouterr()
    assert "serving_cache_mb" not in err
    sizes = [sum(a.nbytes for a in args) for _, _, args in
             next(iter(full._corpus_cache.values()))["batches"]]

    eng, _ = _engine(tmp_path, batch_size=2,
                     cache_mb=(sizes[0] + 1) / (1 << 20))
    eng.predict_paths(paths)
    out, err = capfd.readouterr()
    assert "exceed the serving cache cap" in err
    assert "serving_cache_mb >=" in err
    assert out == ""  # stdout untouched (bench.py JSON contract)
