"""End-to-end coverage for the double-ended model and the evaluate() flow."""

import os

import numpy as np
import pandas as pd
import pytest

from tests.test_e2e import TINY_ARGS, _write_corpus


def _make_de_ckpt(tmp_path):
    import jax

    from nisqa_tpu.compat.model_args import model_args_from_ckpt_args
    from nisqa_tpu.compat.torch_ckpt import save_torch_checkpoint
    from nisqa_tpu.models.nisqa import build_model

    args = {
        **TINY_ARGS,
        "model": "NISQA_DE",
        "td_2": "self_att",
        "td_2_sa_d_model": 16,
        "td_2_sa_nhead": 1,
        "td_2_sa_pos_enc": False,
        "td_2_sa_num_layers": 1,
        "td_2_sa_h": 16,
        "td_2_sa_dropout": 0.1,
        "de_align": "cosine",
        "de_align_apply": "hard",
        "de_fuse": "x/y/-",
        "de_fuse_dim": None,
    }
    margs = model_args_from_ckpt_args(args)
    model = build_model("NISQA_DE", margs)
    params, state = model.init(jax.random.PRNGKey(2))
    path = str(tmp_path / "tiny_de.tar")
    save_torch_checkpoint(path, model, params, state, args)
    return path


def test_predict_csv_double_ended(tmp_path):
    from nisqa_tpu.model import NisqaTPU

    names = _write_corpus(tmp_path, n=6)
    ckpt = _make_de_ckpt(tmp_path)
    # pair each degraded file with a reference file
    pd.DataFrame({"deg": names[:3], "ref": names[3:]}).to_csv(tmp_path / "pairs.csv", index=False)
    args = {
        "mode": "predict_csv",
        "pretrained_model": ckpt,
        "data_dir": str(tmp_path),
        "csv_file": "pairs.csv",
        "csv_deg": "deg",
        "csv_ref": "ref",
        "output_dir": str(tmp_path),
        "tr_bs_val": 2,
        "tr_num_workers": 0,
        "name": "tiny_de",
    }
    df = NisqaTPU(args).predict()
    assert len(df) == 3
    assert np.isfinite(df.mos_pred.to_numpy()).all()
    # self-reference should not error and deg==ref is a valid pair
    out = pd.read_csv(tmp_path / "NISQA_results.csv")
    assert "mos_pred" in out.columns


def test_predict_csv_and_evaluate_with_con(tmp_path):
    """predict_csv on a labeled corpus + evaluate(first_order) with a
    per-condition CSV — the reference's conformance flow
    (`run_evaluate.py:15-37`)."""
    import jax

    from nisqa_tpu.compat.model_args import model_args_from_ckpt_args
    from nisqa_tpu.compat.torch_ckpt import save_torch_checkpoint
    from nisqa_tpu.models.nisqa import build_model
    from nisqa_tpu.model import NisqaTPU

    names = _write_corpus(tmp_path, n=8)
    margs = model_args_from_ckpt_args(TINY_ARGS)
    model = build_model("NISQA", margs)
    params, state = model.init(jax.random.PRNGKey(3))
    ckpt = str(tmp_path / "tiny.tar")
    save_torch_checkpoint(ckpt, model, params, state, TINY_ARGS)

    rng = np.random.default_rng(4)
    cons = [i // 2 for i in range(len(names))]
    df = pd.DataFrame({
        "filename": names,
        "db": [0] * 4 + [1] * 4,  # numeric: pandas 3 groupby-mean limitation
        "con": cons,
        "mos": rng.uniform(1, 5, len(names)).round(2),
    })
    df.to_csv(tmp_path / "corpus.csv", index=False)
    dcon = df.groupby(["db", "con"], as_index=False)["mos"].mean()
    dcon["mos_ci"] = 0.1
    dcon.to_csv(tmp_path / "corpus_con.csv", index=False)

    args = {
        "mode": "predict_csv",
        "pretrained_model": ckpt,
        "data_dir": str(tmp_path),
        "csv_file": "corpus.csv",
        "csv_con": "corpus_con.csv",
        "csv_deg": "filename",
        "csv_mos_val": "mos",
        "output_dir": str(tmp_path),
        "tr_bs_val": 4,
        "tr_num_workers": 0,
        "name": "tiny",
    }
    runner = NisqaTPU(args)
    runner.predict()
    runner.evaluate(mapping="first_order", do_print=False, do_plot=True)
    assert "r_p_mean_con" in runner.r
    assert np.isfinite(runner.r["rmse_map_mean_con"])
    # correlation plots written
    plots = [f for f in os.listdir(tmp_path) if f.startswith("corr_")]
    assert plots


def test_mixed_sample_rates(tmp_path):
    """Files at different native rates batch into separate sr groups
    (reference semantics: hop/win follow each file's rate)."""
    import jax

    from nisqa_tpu.compat.model_args import model_args_from_ckpt_args
    from nisqa_tpu.compat.torch_ckpt import save_torch_checkpoint
    from nisqa_tpu.models.nisqa import build_model
    from nisqa_tpu.model import NisqaTPU
    from nisqa_tpu.audio.wav import write_wav

    rng = np.random.default_rng(0)
    names = []
    for i, sr in enumerate([8000, 16000, 8000]):
        t = np.arange(int(sr * 0.7)) / sr
        y = 0.4 * np.sin(2 * np.pi * 250 * t) + 0.05 * rng.standard_normal(len(t))
        name = f"m{i}.wav"
        write_wav(str(tmp_path / name), y.astype(np.float32), sr)
        names.append(name)

    margs = model_args_from_ckpt_args(TINY_ARGS)
    model = build_model("NISQA", margs)
    params, state = model.init(jax.random.PRNGKey(5))
    ckpt = str(tmp_path / "tiny.tar")
    save_torch_checkpoint(ckpt, model, params, state, TINY_ARGS)

    args = {
        "mode": "predict_dir",
        "pretrained_model": ckpt,
        "data_dir": str(tmp_path),
        "output_dir": None,
        "tr_bs_val": 2,
        "tr_num_workers": 0,
        "name": "tiny",
    }
    df = NisqaTPU(args).predict()
    assert np.isfinite(df.mos_pred.to_numpy()).all()
