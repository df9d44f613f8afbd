"""Training resume from native checkpoints + RAM audio cache."""

import os

import numpy as np
import pandas as pd

from tests.test_e2e import TINY_ARGS, _write_corpus


def _train_args(tmp, tmp_out, names, epochs=2, **over):
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {"filename": names, "db": ["T"] * 4 + ["V"] * 2,
         "mos": rng.uniform(1, 5, len(names)).round(2)}
    )
    df.to_csv(tmp / "corpus.csv", index=False)
    return {
        **TINY_ARGS,
        "mode": "main",
        "pretrained_model": False,
        "data_dir": str(tmp),
        "output_dir": str(tmp_out),
        "csv_file": "corpus.csv",
        "csv_deg": "filename",
        "csv_mos_train": "mos",
        "csv_mos_val": "mos",
        "csv_db_train": ["T"],
        "csv_db_val": ["V"],
        "csv_con": None,
        "tr_epochs": epochs,
        "tr_early_stop": 50,
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
        **over,
    }


def test_resume_continues_from_checkpoint(tmp_path):
    from nisqa_tpu.model import NisqaTPU

    names = _write_corpus(tmp_path, n=6)
    out1 = tmp_path / "run1"
    runner = NisqaTPU(_train_args(tmp_path, out1, names, epochs=2))
    runner.train()
    run_dir = out1 / os.listdir(out1)[0]
    ckpts = sorted(str(p) for p in run_dir.glob("*__ep_*.tar"))
    assert len(ckpts) == 2

    # resume from epoch 2 and train to epoch 3: exactly one more epoch runs
    out2 = tmp_path / "run2"
    runner2 = NisqaTPU(
        _train_args(tmp_path, out2, names, epochs=3, tr_resume=ckpts[-1][:-4],
                    tr_ds_to_memory=True)
    )
    runner2.train()
    run_dir2 = out2 / os.listdir(out2)[0]
    results = pd.read_csv(run_dir2 / (os.listdir(out2)[0] + "__results.csv"))
    assert len(results) == 1
    assert int(results.epoch.iloc[0]) == 3
    ckpts2 = sorted(str(p) for p in run_dir2.glob("*__ep_*.tar"))
    assert ckpts2 and ckpts2[0].endswith("ep_003.tar")
