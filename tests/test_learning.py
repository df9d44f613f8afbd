"""Convergence sanity: the training loop must actually learn.

Synthetic corpus where MOS is a deterministic function of signal loudness —
a few epochs of the tiny model must drive train-set Pearson r well above
chance. Catches gradient/masking/BN-update bugs that smoke tests miss.
"""

import numpy as np
import pandas as pd

from tests.test_e2e import TINY_ARGS


def _corpus(tmp_path, n=24, sr=8000):
    from nisqa_tpu.audio.wav import write_wav

    rng = np.random.default_rng(0)
    names, mos = [], []
    for i in range(n):
        dur = 0.6
        t = np.arange(int(sr * dur)) / sr
        # loudness encodes the target: amplitude in [0.02, 0.6]
        amp = rng.uniform(0.02, 0.6)
        y = amp * np.sin(2 * np.pi * 300 * t) + 0.01 * rng.standard_normal(len(t))
        name = f"l{i}.wav"
        write_wav(str(tmp_path / name), y.astype(np.float32), sr)
        names.append(name)
        mos.append(1.0 + 4.0 * (amp - 0.02) / 0.58)  # map amp -> [1, 5]
    return names, np.array(mos)


def test_training_learns_loudness(tmp_path):
    from nisqa_tpu.model import NisqaTPU
    from nisqa_tpu.train.loop import TrainEngine
    from scipy.stats import pearsonr
    import jax

    names, mos = _corpus(tmp_path)
    df = pd.DataFrame({"filename": names, "db": ["T"] * len(names), "mos": mos})
    # val set = first 6 train files (we only check train-set learning)
    df.loc[:5, "db"] = "V"
    df.to_csv(tmp_path / "corpus.csv", index=False)

    args = {
        **TINY_ARGS,
        # dropout off: with 8 CNN channels, Dropout2d noise swamps the
        # train-mode predictions this test scores
        "cnn_dropout": 0.0,
        "td_sa_dropout": 0.0,
        "pool_att_dropout": 0.0,
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
        "tr_early_stop": 100,
        "tr_bs": 6,
        "tr_bs_val": 6,
        "tr_lr": 1e-3,
        "tr_lr_patience": 100,
        "tr_num_workers": 0,
        "tr_parallel": False,
        "tr_checkpoint": "best_only",
        "tr_verbose": 0,
        "tr_bias_mapping": None,
        "tr_bias_min_r": None,
        "tr_bias_anchor_db": None,
        "tr_ds_to_memory": True,
        "seed": 0,
    }
    runner = NisqaTPU(args)
    engine = TrainEngine(runner)
    from nisqa_tpu.train.bias_loss import BiasLoss

    bl = [BiasLoss(runner.ds_train.df.db, mapping=None, min_r=None, do_print=False)]
    rng = jax.random.PRNGKey(0)

    y_true = runner.ds_train.targets()[:, 0]
    rs, losses = [], []
    for epoch in range(20):
        rng, rng_ep = jax.random.split(rng)
        loss, y_hat = engine.run_epoch(runner.ds_train, bl, 1e-3, rng_ep, 6)
        losses.append(loss)
        ok = np.isfinite(y_hat[:, 0])
        rs.append(pearsonr(y_true[ok], y_hat[ok, 0])[0] if ok.sum() > 2 else 0.0)
    # learned a monotone loudness->MOS mapping and the loss collapsed
    assert max(rs[-4:]) > 0.8, f"train r_p trajectory: {np.round(rs, 2)}"
    assert losses[-1] < 0.3 * losses[0], f"loss trajectory: {np.round(losses, 3)}"
