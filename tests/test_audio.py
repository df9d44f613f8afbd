"""Front-end tests: WAV IO, mel filterbank constants, mel-spec parity."""

import numpy as np
import pytest

from nisqa_tpu.audio import wav as wavio
from nisqa_tpu.audio.filters import hann_periodic, hz_to_mel_slaney, mel_filterbank, mel_to_hz_slaney
from nisqa_tpu.audio.melspec import melspec_np, n_frames_for, pad_audio_for_batch
from nisqa_tpu.features.segments import n_wins_for, segment_np


def _tone(sr, dur=1.0, f=440.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * dur)) / sr
    y = 0.5 * np.sin(2 * np.pi * f * t) + 0.01 * rng.standard_normal(len(t))
    return y.astype(np.float32)


class TestWav:
    def test_roundtrip_mono(self, tmp_path):
        sr = 48000
        y = _tone(sr)
        p = str(tmp_path / "t.wav")
        wavio.write_wav(p, y, sr)
        y2, sr2 = wavio.read_wav(p)
        assert sr2 == sr
        assert y2.dtype == np.float32
        assert np.max(np.abs(y2 - y)) < 2.0 / 32768

    def test_stereo_mono_mix_and_channel(self, tmp_path):
        sr = 16000
        y = np.stack([_tone(sr, f=300), _tone(sr, f=500)])
        p = str(tmp_path / "s.wav")
        wavio.write_wav(p, y, sr)
        mix, _ = wavio.read_wav(p)
        ch1, _ = wavio.read_wav(p, channel=1)
        q = np.round(np.clip(y * 32767, -32768, 32767)) / 32768.0
        assert np.allclose(mix, q.mean(axis=0), atol=1e-6)
        assert np.allclose(ch1, q[1], atol=1e-6)

    def test_wav_info(self, tmp_path):
        sr = 24000
        y = _tone(sr, dur=0.5)
        p = str(tmp_path / "i.wav")
        wavio.write_wav(p, y, sr)
        info = wavio.wav_info(p)
        assert info.sample_rate == sr
        assert info.n_frames == len(y)
        assert info.n_channels == 1
        assert info.bits_per_sample == 16


class TestFilters:
    def test_slaney_scale_roundtrip(self):
        f = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 20000.0])
        assert np.allclose(mel_to_hz_slaney(hz_to_mel_slaney(f)), f, rtol=1e-10)

    def test_slaney_known_points(self):
        # linear region: mel = hz / (200/3)
        assert np.isclose(hz_to_mel_slaney(1000.0), 15.0)
        assert np.isclose(hz_to_mel_slaney(200.0), 3.0)
        # log region: 6400 Hz is 27 mel above 1000 Hz on the slaney scale
        assert np.isclose(hz_to_mel_slaney(6400.0), 42.0)

    def test_filterbank_shape_and_area(self):
        fb = mel_filterbank(48000, 4096, 48, 0.0, 20000.0)
        assert fb.shape == (48, 2049)
        assert fb.dtype == np.float32
        # every filter has positive weights and a single peak region
        assert (fb.sum(axis=1) > 0).all()
        # slaney normalisation: peak * width/2 ~ area -> sum * df ≈ 1
        df = 48000 / 2 / 2048
        areas = fb.sum(axis=1) * df
        assert np.all(np.abs(areas - 1.0) < 0.06)

    def test_hann_periodic(self):
        w = hann_periodic(8)
        expect = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(8) / 8)
        assert np.allclose(w, expect, atol=1e-7)
        assert w[0] == 0.0


def _engine_mel(y, sr):
    """Run the ENGINE's (one and only) JAX front-end — `pipeline._front_end`
    in exact (f32) mode, the same traced mel_fn every serving/train program
    uses — on one file. Returns (db (n_frames_max, M), nf)."""
    import jax

    from nisqa_tpu.data.pipeline import MsConfig, _front_end, front_end_consts

    ms = MsConfig({})
    nf = n_frames_for(len(y), int(sr * ms.hop_s))
    bucket = ms.bucket_for(ms.n_wins(nf))
    fe, buf_len = _front_end(ms, sr, bucket)
    consts = front_end_consts(ms, sr, "f32")
    buf = np.zeros((1, buf_len), np.float32)
    padded = pad_audio_for_batch(y, ms.n_fft, len(y) + ms.n_fft)
    w = min(len(padded), buf_len)  # pad tail past the last STFT read is unused
    buf[0, :w] = padded[:w]
    db = np.asarray(jax.jit(fe.mel_fn)(consts, buf,
                                       np.array([len(y)], np.int32)))[0]
    return db, nf


class TestMelspec:
    @pytest.mark.parametrize("sr", [48000, 16000])
    def test_engine_front_end_matches_numpy(self, sr):
        y = _tone(sr, dur=1.3)
        ref = melspec_np(y, sr)  # (M, W)
        nf = n_frames_for(len(y), int(sr * 0.01))
        assert ref.shape == (48, nf)
        out, nf2 = _engine_mel(y, sr)
        assert nf2 == nf
        assert np.max(np.abs(out[:nf].T - ref)) < 2e-3  # dB units

    def test_top_db_clip_uses_valid_frames_only(self):
        sr = 48000
        y = _tone(sr, dur=0.5)
        out, nf = _engine_mel(y, sr)
        ref = melspec_np(y, sr)
        # clip floor must equal the valid-frame max minus 80, not be dragged
        # down by garbage/pad frames beyond nf
        assert abs(out[:nf].max() - ref.max()) < 2e-3
        assert abs(out[:nf].min() - ref.min()) < 2e-3


class TestSegments:
    def test_np_matches_reference_semantics(self):
        rng = np.random.default_rng(1)
        spec = rng.standard_normal((48, 100)).astype(np.float32)
        segs, n_wins = segment_np(spec, 15, 4, 40)
        assert n_wins == int(np.ceil((100 - 14) / 4))
        assert segs.shape == (40, 48, 15)
        assert np.allclose(segs[0], spec[:, 0:15])
        assert np.allclose(segs[1], spec[:, 4:19])
        assert np.allclose(segs[n_wins - 1], spec[:, (n_wins - 1) * 4 : (n_wins - 1) * 4 + 15])
        assert np.all(segs[n_wins:] == 0)

    def test_engine_seg_fn_matches_np(self):
        """The ENGINE's segment windowing (`pipeline._front_end.seg_fn`,
        the rows-trick im2col every serving/train program uses) against the
        numpy oracle."""
        from nisqa_tpu.data.pipeline import MsConfig, _front_end

        rng = np.random.default_rng(2)
        W, sr = 120, 8000
        hop = int(sr * 0.01)  # 80
        spec = rng.standard_normal((2, W, 48)).astype(np.float32)
        n_frames = np.array([100, 57], dtype=np.int32)
        ms = MsConfig({"ms_seg_length": 15, "ms_seg_hop_length": 4,
                       "ms_max_segments": 160})
        fe, _ = _front_end(ms, sr, 40)  # t_bucket = 40 == old max_length
        n_samples = ((n_frames - 1) * hop).astype(np.int32)  # nf = 1 + n//hop
        segs, n_wins = fe.seg_fn(spec, n_samples)
        segs = np.asarray(segs)
        for b in range(2):
            ref_segs, ref_n = segment_np(spec[b, : n_frames[b]].T, 15, 4, 40)
            assert int(n_wins[b]) == ref_n
            assert np.allclose(segs[b], ref_segs, atol=1e-6)

    def test_seg_hop_one(self):
        assert n_wins_for(100, 15, 1) == 86

    def test_too_short_raises(self):
        with pytest.raises(ValueError):
            n_wins_for(10, 15, 1)

    def test_even_seg_length_raises(self):
        with pytest.raises(ValueError):
            segment_np(np.zeros((48, 30), np.float32), 14, 1, 20)
