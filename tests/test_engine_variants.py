"""Engine coverage for remaining geometry variants: seg_hop=1 (the TTS
configuration) and ms_sr resampling."""

import numpy as np
import pandas as pd
import pytest

from tests.test_e2e import TINY_ARGS, _write_corpus


def _mk_engine(tmp_path, over):
    import jax

    from nisqa_tpu.compat.model_args import model_args_from_ckpt_args
    from nisqa_tpu.compat.torch_ckpt import save_torch_checkpoint
    from nisqa_tpu.models.nisqa import build_model

    args = {**TINY_ARGS, **over}
    margs = model_args_from_ckpt_args(args)
    model = build_model(args["model"], margs)
    params, state = model.init(jax.random.PRNGKey(7))
    ckpt = str(tmp_path / "variant.tar")
    save_torch_checkpoint(ckpt, model, params, state, args)
    return ckpt


def test_seg_hop_one_matches_host_reference(tmp_path):
    """seg_hop=1 (TTS geometry: every frame starts a window) through the
    engine must equal the host-side numpy front-end + direct model apply."""
    import jax

    from nisqa_tpu.audio.melspec import melspec_np
    from nisqa_tpu.audio.wav import read_wav
    from nisqa_tpu.compat.torch_ckpt import load_model_from_tar
    from nisqa_tpu.data.pipeline import InferenceEngine, MsConfig
    from nisqa_tpu.features.segments import segment_np
    from nisqa_tpu.model import NisqaTPU

    names = _write_corpus(tmp_path, n=3)
    ckpt = _mk_engine(tmp_path, {"ms_seg_hop_length": 1, "ms_max_segments": 128})

    args = {
        "mode": "predict_dir",
        "pretrained_model": ckpt,
        "data_dir": str(tmp_path),
        "output_dir": None,
        "tr_bs_val": 3,
        "tr_num_workers": 0,
        "name": "hop1",
    }
    df = NisqaTPU(args).predict()
    preds = df.mos_pred.to_numpy()
    assert np.isfinite(preds).all()

    # host-side reference computation for file 0
    model, params, state, a = load_model_from_tar(ckpt)
    y, sr = read_wav(str(tmp_path / names[0]))
    spec = melspec_np(y, sr, n_fft=a["ms_n_fft"], hop_s=a["ms_hop_length"],
                      win_s=a["ms_win_length"], n_mels=a["ms_n_mels"], fmax=a["ms_fmax"])
    segs, n_wins = segment_np(spec, a["ms_seg_length"], 1, a["ms_max_segments"])
    with jax.default_matmul_precision("highest"):
        ref, _ = model.apply(params, state, segs[None], np.array([n_wins]))
    row = df[df.deg == names[0]].mos_pred.iloc[0]
    assert abs(row - float(ref[0, 0])) < 5e-3


def test_ms_sr_resampling(tmp_path):
    """ms_sr set: all files resample to the target rate before the front-end
    (reference `lb.load(sr=ms_sr)` path)."""
    from nisqa_tpu.model import NisqaTPU
    from nisqa_tpu.audio.wav import write_wav

    rng = np.random.default_rng(0)
    for i, sr in enumerate([8000, 16000]):
        t = np.arange(int(sr * 0.8)) / sr
        y = 0.4 * np.sin(2 * np.pi * 240 * t) + 0.03 * rng.standard_normal(len(t))
        write_wav(str(tmp_path / f"r{i}.wav"), y.astype(np.float32), sr)

    ckpt = _mk_engine(tmp_path, {"ms_sr": 8000})
    args = {
        "mode": "predict_dir",
        "pretrained_model": ckpt,
        "data_dir": str(tmp_path),
        "output_dir": None,
        "tr_bs_val": 2,
        "tr_num_workers": 0,
        "name": "resample",
    }
    df = NisqaTPU(args).predict()
    assert np.isfinite(df.mos_pred.to_numpy()).all()
    # both files ran through one sr group (the resample target)
    runner = NisqaTPU(args)
    engine = runner._engine()
    entries = engine._scan_transport(runner.ds_val.paths())
    assert all(e[2] == 8000 for e in entries)


def test_fuse_pass_matches_unfused(tmp_path):
    """fuse_pass=True (alias of the default since round 4: mel-fused cached
    passes) must be output-identical to the default engine."""
    from nisqa_tpu.compat.torch_ckpt import load_model_from_tar
    from nisqa_tpu.data.pipeline import InferenceEngine, MsConfig

    names = _write_corpus(tmp_path, n=8)
    from tests.test_e2e import _make_ckpt

    ckpt = _make_ckpt(tmp_path)
    model, params, state, args = load_model_from_tar(ckpt)
    paths = [str(tmp_path / n) for n in names]
    e1 = InferenceEngine(model, params, state, MsConfig(args), batch_size=3, num_workers=2)
    e2 = InferenceEngine(model, params, state, MsConfig(args), batch_size=3,
                         num_workers=2, fuse_pass=True)
    e2.warmup(paths)
    y1 = e1.predict_paths(paths)
    y2 = e2.predict_paths(paths)
    assert np.abs(y1 - y2).max() < 1e-6


def test_engine_args_passthrough(tmp_path):
    """Runtime engine-tuning args (fe_precision, serving_cache_mb) reach the
    engine through the orchestrator's args dict."""
    from nisqa_tpu.model import NisqaTPU
    from tests.test_e2e import TINY_ARGS, _make_ckpt, _write_corpus

    names = _write_corpus(tmp_path, n=2)
    ckpt = _make_ckpt(tmp_path)
    args = {
        **TINY_ARGS,
        "mode": "predict_dir",
        "pretrained_model": ckpt,
        "data_dir": str(tmp_path),
        "output_dir": None,
        "tr_bs_val": 2,
        "tr_num_workers": 0,
        "fe_precision": "fast",
        "serving_cache_mb": 64,
    }
    runner = NisqaTPU(args)
    engine = runner._engine()
    assert engine.fe_precision == "fast"
    assert engine.cache_mb == 64
    df = runner.predict()
    assert np.isfinite(df.mos_pred.to_numpy()).all()
