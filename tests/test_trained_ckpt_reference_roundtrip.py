"""The strongest checkpoint-compat guarantee: a `.tar` written DURING
TRAINING by this framework must strict-load into the actual reference
PyTorch model (`/root/reference/nisqa/NISQA_lib.py`) and produce the same
forward outputs — i.e. a user can train here and deploy with the upstream
code unchanged (CLAUDE.md invariant: "every save writes a
reference-loadable .tar")."""

import os
import sys
import types

import jax
import numpy as np
import pandas as pd
import pytest

from tests.test_e2e import TINY_ARGS, _write_corpus


def test_trained_tar_loads_and_matches_reference(tmp_path):
    import torch

    sys.modules.setdefault("librosa", types.ModuleType("librosa"))
    sys.path.insert(0, "/root/reference")
    from nisqa import NISQA_lib as NL

    from nisqa_tpu.compat.model_args import model_args_from_ckpt_args
    from nisqa_tpu.compat.torch_ckpt import load_model_from_tar
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
    }
    NisqaTPU(args).train()

    out = tmp_path / "out"
    run_dir = out / os.listdir(out)[0]
    tars = sorted(str(p) for p in run_dir.glob("*.tar"))
    assert tars, "training must write a reference-format .tar"

    # --- load the trained .tar with plain torch + the reference model ------
    ckpt = torch.load(tars[-1], map_location="cpu", weights_only=False)
    margs = model_args_from_ckpt_args(ckpt["args"])
    kwargs = dict(margs)
    if isinstance(kwargs.get("cnn_kernel_size"), list):
        kwargs["cnn_kernel_size"] = tuple(kwargs["cnn_kernel_size"])
    ref = NL.NISQA(**kwargs)
    ref.load_state_dict(ckpt["model_state_dict"], strict=True)
    ref.eval()

    # --- same weights through our model, same input, outputs must agree ---
    model, params, state, _ = load_model_from_tar(tars[-1])
    B, T = 3, 12
    rng = np.random.default_rng(0)
    segs = rng.uniform(-80.0, 0.0, size=(B, T, TINY_ARGS["ms_n_mels"],
                                         TINY_ARGS["ms_seg_length"])).astype(np.float32)
    n_wins = np.array([T, 7, 4], dtype=np.int32)

    with jax.default_matmul_precision("highest"):
        ours, _ = jax.jit(model.apply)(params, state, segs, n_wins)

    x_t = torch.from_numpy(segs[:, :, None, :, :])  # (B, T, 1, H, W)
    with torch.no_grad():
        theirs = ref(x_t, torch.from_numpy(n_wins)).numpy()

    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5,
                               err_msg="trained .tar diverges between frameworks")
