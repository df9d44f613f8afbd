"""Data-parallel paths on the virtual 8-device CPU mesh (SURVEY.md §2.5:
the TPU-native replacement for nn.DataParallel)."""

import numpy as np
import pandas as pd
import pytest

from tests.test_e2e import TINY_ARGS, _make_ckpt, _write_corpus


def test_predict_data_parallel_matches_single(tmp_path):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from nisqa_tpu.model import NisqaTPU

    names = _write_corpus(tmp_path, n=8)
    ckpt = _make_ckpt(tmp_path)
    base = {
        "mode": "predict_dir",
        "pretrained_model": ckpt,
        "data_dir": str(tmp_path),
        "output_dir": None,
        "tr_bs_val": 8,
        "tr_num_workers": 0,
        "name": "tiny",
    }
    df_par = NisqaTPU({**base, "tr_parallel": True}).predict()
    df_single = NisqaTPU({**base, "tr_parallel": False}).predict()
    assert np.allclose(
        df_par.mos_pred.to_numpy(), df_single.mos_pred.to_numpy(), atol=1e-5
    )


def test_train_data_parallel(tmp_path):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from nisqa_tpu.model import NisqaTPU

    names = _write_corpus(tmp_path, n=6)
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {"filename": names, "db": ["T"] * 4 + ["V"] * 2,
         "mos": rng.uniform(1, 5, len(names)).round(2)}
    )
    df.to_csv(tmp_path / "corpus.csv", index=False)
    args = {
        **TINY_ARGS,
        "mode": "main",
        "pretrained_model": False,
        "data_dir": str(tmp_path),
        "output_dir": str(tmp_path / "out"),
        "csv_file": "corpus.csv",
        "csv_deg": "filename",
        "csv_mos_train": "mos",
        "csv_mos_val": "mos",
        "csv_db_train": ["T"],
        "csv_db_val": ["V"],
        "csv_con": None,
        "tr_epochs": 1,
        "tr_early_stop": 5,
        "tr_bs": 3,  # ragged: pads to 8 across the mesh
        "tr_bs_val": 2,
        "tr_lr": 1e-3,
        "tr_lr_patience": 15,
        "tr_num_workers": 0,
        "tr_parallel": True,
        "tr_checkpoint": "best_only",
        "tr_verbose": 0,
        "tr_bias_mapping": None,
        "tr_bias_min_r": None,
        "tr_bias_anchor_db": None,
        "seed": 0,
    }
    runner = NisqaTPU(args)
    runner.train()  # must run through; NaN-padded rows drop out of the loss


def test_finetune_warm_start(tmp_path):
    """pretrained_model + mode=main: checkpoint args are the base config and
    training continues from its weights (`NISQA_model.py:940-942`)."""
    from nisqa_tpu.model import NisqaTPU

    names = _write_corpus(tmp_path, n=6)
    ckpt = _make_ckpt(tmp_path)
    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {"filename": names, "db": ["T"] * 4 + ["V"] * 2,
         "mos": rng.uniform(1, 5, len(names)).round(2)}
    )
    df.to_csv(tmp_path / "corpus.csv", index=False)
    args = {
        "mode": "main",
        "name": "finetune",
        "pretrained_model": ckpt,
        "data_dir": str(tmp_path),
        "output_dir": str(tmp_path / "out"),
        "csv_file": "corpus.csv",
        "csv_deg": "filename",
        "csv_mos_train": "mos",
        "csv_mos_val": "mos",
        "csv_db_train": ["T"],
        "csv_db_val": ["V"],
        "csv_con": None,
        "tr_epochs": 1,
        "tr_early_stop": 5,
        "tr_bs": 3,
        "tr_bs_val": 2,
        "tr_lr": 1e-4,
        "tr_lr_patience": 15,
        "tr_num_workers": 0,
        "tr_parallel": False,
        "tr_checkpoint": "best_only",
        "tr_verbose": 0,
        "tr_bias_mapping": None,
        "tr_bias_min_r": None,
        "tr_bias_anchor_db": None,
        "seed": 0,
    }
    runner = NisqaTPU(args)
    # architecture hyperparams came from the checkpoint, not defaults
    assert runner.model_args["td_sa_d_model"] == TINY_ARGS["td_sa_d_model"]
    runner.train()
