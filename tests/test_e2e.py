"""End-to-end integration tests on a tiny synthetic corpus (CPU).

Exercises the full user surface the reference offers (SURVEY.md §4
integration tests): predict_file / predict_dir / predict_csv with a
checkpoint, 2-epoch training from YAML-style args with results CSV +
checkpoint artifacts, checkpoint round-trip (native resume state and
reference-format .tar reload).
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

# tiny geometry so CPU compiles stay fast
TINY_ARGS = {
    "model": "NISQA",
    "name": "tiny",
    "ms_sr": None,
    "ms_fmax": 4000.0,
    "ms_n_fft": 512,
    "ms_hop_length": 0.01,
    "ms_win_length": 0.02,
    "ms_n_mels": 24,
    "ms_seg_length": 7,
    "ms_seg_hop_length": 2,
    "ms_max_segments": 64,
    "ms_channel": None,
    "cnn_model": "adapt",
    "cnn_c_out_1": 4,
    "cnn_c_out_2": 8,
    "cnn_c_out_3": 8,
    "cnn_kernel_size": 3,
    "cnn_dropout": 0.2,
    "cnn_pool_1": [12, 5],
    "cnn_pool_2": [6, 3],
    "cnn_pool_3": [4, 2],
    "cnn_fc_out_h": None,
    "td": "self_att",
    "td_sa_d_model": 16,
    "td_sa_nhead": 1,
    "td_sa_pos_enc": None,
    "td_sa_num_layers": 1,
    "td_sa_h": 16,
    "td_sa_dropout": 0.1,
    "td_lstm_h": None,
    "td_lstm_num_layers": None,
    "td_lstm_dropout": None,
    "td_lstm_bidirectional": None,
    "td_2": "skip",
    "pool": "att",
    "pool_att_h": 8,
    "pool_att_dropout": 0.1,
    "tr_bs_val": 4,
    "tr_num_workers": 2,
}


def _write_corpus(tmp_path, n=6, sr=8000):
    from nisqa_tpu.audio.wav import write_wav

    rng = np.random.default_rng(0)
    names = []
    for i in range(n):
        dur = rng.uniform(0.4, 1.2)
        t = np.arange(int(sr * dur)) / sr
        y = 0.4 * np.sin(2 * np.pi * (200 + 60 * i) * t) + 0.05 * rng.standard_normal(len(t))
        name = f"s{i}.wav"
        write_wav(str(tmp_path / name), y.astype(np.float32), sr)
        names.append(name)
    return names


def _make_ckpt(tmp_path):
    import jax

    from nisqa_tpu.compat.torch_ckpt import save_torch_checkpoint
    from nisqa_tpu.models.nisqa import build_model
    from nisqa_tpu.compat.model_args import model_args_from_ckpt_args

    margs = model_args_from_ckpt_args(TINY_ARGS)
    model = build_model("NISQA", margs)
    params, state = model.init(jax.random.PRNGKey(1))
    path = str(tmp_path / "tiny.tar")
    save_torch_checkpoint(path, model, params, state, TINY_ARGS)
    return path


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("corpus")
    names = _write_corpus(tmp)
    ckpt = _make_ckpt(tmp)
    return tmp, names, ckpt


def test_predict_file(corpus):
    from nisqa_tpu.model import NisqaTPU

    tmp, names, ckpt = corpus
    args = {
        "mode": "predict_file",
        "pretrained_model": ckpt,
        "deg": str(tmp / names[0]),
        "output_dir": str(tmp),
        "tr_bs_val": 1,
        "tr_num_workers": 0,
        "name": "tiny",
    }
    df = NisqaTPU(args).predict()
    assert "mos_pred" in df.columns
    assert len(df) == 1
    assert np.isfinite(df.mos_pred.iloc[0])
    assert os.path.exists(tmp / "NISQA_results.csv")


def test_predict_dir_matches_file(corpus):
    from nisqa_tpu.model import NisqaTPU

    tmp, names, ckpt = corpus
    args = {
        "mode": "predict_dir",
        "pretrained_model": ckpt,
        "data_dir": str(tmp),
        "output_dir": None,
        "tr_bs_val": 4,
        "tr_num_workers": 2,
        "name": "tiny",
    }
    df = NisqaTPU(args).predict()
    assert len(df) == len(names)
    assert np.isfinite(df.mos_pred.to_numpy()).all()

    args_f = dict(args, mode="predict_file", deg=str(tmp / names[2]))
    args_f.pop("data_dir")
    df_f = NisqaTPU(args_f).predict()
    row = df[df.deg == names[2]].mos_pred.iloc[0]
    assert abs(row - df_f.mos_pred.iloc[0]) < 1e-4


def test_predict_csv(corpus):
    from nisqa_tpu.model import NisqaTPU

    tmp, names, ckpt = corpus
    pd.DataFrame({"filename": names}).to_csv(tmp / "files.csv", index=False)
    args = {
        "mode": "predict_csv",
        "pretrained_model": ckpt,
        "data_dir": str(tmp),
        "csv_file": "files.csv",
        "csv_deg": "filename",
        "output_dir": str(tmp),
        "tr_bs_val": 3,
        "tr_num_workers": 0,
        "name": "tiny",
    }
    df = NisqaTPU(args).predict()
    assert len(df) == len(names)
    out = pd.read_csv(tmp / "NISQA_results.csv")
    assert "mos_pred" in out.columns and "model" in out.columns


def test_train_two_epochs(corpus, tmp_path):
    from nisqa_tpu.model import NisqaTPU

    tmp, names, ckpt = corpus
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "filename": names,
            "db": ["TRAIN_SIM"] * 4 + ["VAL_SIM"] * 2,
            "mos": rng.uniform(1, 5, len(names)).round(2),
        }
    )
    df.to_csv(tmp / "corpus.csv", index=False)

    args = {
        **TINY_ARGS,
        "mode": "main",
        "pretrained_model": False,
        "data_dir": str(tmp),
        "output_dir": str(tmp_path),
        "csv_file": "corpus.csv",
        "csv_deg": "filename",
        "csv_mos_train": "mos",
        "csv_mos_val": "mos",
        "csv_db_train": ["TRAIN_SIM"],
        "csv_db_val": ["VAL_SIM"],
        "csv_con": None,
        "tr_epochs": 2,
        "tr_early_stop": 5,
        "tr_bs": 3,
        "tr_bs_val": 2,
        "tr_lr": 1e-3,
        "tr_lr_patience": 15,
        "tr_num_workers": 0,
        "tr_parallel": False,
        "tr_checkpoint": "every_epoch",
        "tr_verbose": 0,
        "tr_bias_mapping": None,
        "tr_bias_min_r": None,
        "tr_bias_anchor_db": None,
        "seed": 0,
    }
    runner = NisqaTPU(args)
    runner.train()

    run_dirs = [d for d in os.listdir(tmp_path) if d.startswith("tiny_")]
    assert len(run_dirs) == 1
    run_dir = tmp_path / run_dirs[0]
    results = pd.read_csv(run_dir / f"{run_dirs[0]}__results.csv")
    assert len(results) == 2
    assert "r_p_mean_file" in results.columns

    # reference-format checkpoint written and reloadable by this framework
    tars = sorted(str(p) for p in run_dir.glob("*.tar"))
    assert len(tars) == 2
    from nisqa_tpu.compat.torch_ckpt import load_model_from_tar

    model2, params2, state2, args2 = load_model_from_tar(tars[-1])
    assert model2.name == "NISQA"

    # native resume state restores
    from nisqa_tpu.train.checkpoint import load_train_state
    from nisqa_tpu.train.loop import TrainEngine

    engine = TrainEngine(runner)
    template = {
        "params": runner.params,
        "bn_state": runner.state,
        "opt_state": engine.opt_state,
        "bias_b": np.zeros((4, 4), np.float32),
    }
    restored = load_train_state(tars[-1][:-4], template)
    assert restored["meta"]["epoch"] == 2


@pytest.mark.parametrize("to_memory", [False, True])
def test_train_dim_smoke(corpus, tmp_path, to_memory):
    # to_memory=True additionally exercises the 5-target gather train step
    # over the mel-resident device corpus
    from nisqa_tpu.model import NisqaTPU

    tmp, names, ckpt = corpus
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"filename": names, "db": ["A"] * 4 + ["B"] * 2})
    for c in ("mos", "noi", "dis", "col", "loud"):
        df[c] = rng.uniform(1, 5, len(names)).round(2)
    df.to_csv(tmp / "corpus_dim.csv", index=False)

    args = {
        **TINY_ARGS,
        "model": "NISQA_DIM",
        "mode": "main",
        "pretrained_model": False,
        "data_dir": str(tmp),
        "output_dir": str(tmp_path),
        "csv_file": "corpus_dim.csv",
        "csv_deg": "filename",
        "csv_db_train": ["A"],
        "csv_db_val": ["B"],
        "csv_con": None,
        "tr_epochs": 1,
        "tr_early_stop": 5,
        "tr_bs": 4,
        "tr_bs_val": 2,
        "tr_lr": 1e-3,
        "tr_lr_patience": 15,
        "tr_num_workers": 0,
        "tr_parallel": False,
        "tr_checkpoint": "best_only",
        "tr_verbose": 0,
        "tr_bias_mapping": "first_order",
        "tr_bias_min_r": 0.0,  # activate the bias-loss path immediately
        "tr_bias_anchor_db": None,
        "tr_ds_to_memory": to_memory,
        "seed": 0,
    }
    runner = NisqaTPU(args)
    runner.train()
    run_dirs = [d for d in os.listdir(tmp_path) if d.startswith("tiny_")]
    assert run_dirs


def test_load_predictor_api(corpus):
    """The one-call public API: nisqa_tpu.load_predictor."""
    import nisqa_tpu

    tmp, names, ckpt = corpus
    predict = nisqa_tpu.load_predictor(ckpt, batch_size=3, num_workers=0)
    paths = [str(tmp / n) for n in names[:4]]
    y1 = predict(paths)
    assert y1.shape == (4, 1) and np.isfinite(y1).all()
    # serving reuse: second call hits compiled pipelines, same results
    y2 = predict(paths)
    assert np.allclose(y1, y2, atol=1e-6)
    assert predict.model_name == "NISQA"
