"""CLI entry points driven as subprocesses (the actual user surface)."""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from tests.test_e2e import TINY_ARGS, _make_ckpt, _write_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {
    **os.environ,
    "JAX_PLATFORMS": "",  # let the subprocess pick; conftest forcing is per-process
    "NISQA_TPU_FORCE_CPU": "1",
}


def _run(args, cwd=REPO):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    # force CPU inside the subprocess the same way conftest does
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        f"import runpy, sys; sys.argv = {args!r}; "
        f"runpy.run_path({os.path.join(REPO, args[0])!r}, run_name='__main__')"
    )
    return subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, env=env, cwd=cwd, timeout=500)


def test_run_predict_cli(tmp_path):
    names = _write_corpus(tmp_path, n=3)
    ckpt = _make_ckpt(tmp_path)
    r = _run([
        "run_predict.py", "--mode", "predict_dir", "--pretrained_model", ckpt,
        "--data_dir", str(tmp_path), "--output_dir", str(tmp_path), "--bs", "2",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    out = pd.read_csv(tmp_path / "NISQA_results.csv")
    assert len(out) == 3 and np.isfinite(out.mos_pred).all()


def test_run_train_cli_yaml(tmp_path):
    import yaml

    names = _write_corpus(tmp_path, n=6)
    rng = np.random.default_rng(0)
    pd.DataFrame(
        {"filename": names, "db": ["T"] * 4 + ["V"] * 2,
         "mos": rng.uniform(1, 5, 6).round(2)}
    ).to_csv(tmp_path / "corpus.csv", index=False)

    cfg = {
        **TINY_ARGS,
        "name": "cli_run",
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
        "tr_early_stop": 3,
        "tr_bs": 3,
        "tr_bs_val": 2,
        "tr_lr": 1e-3,
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
    with open(tmp_path / "cfg.yaml", "w") as f:
        yaml.dump(cfg, f)
    r = _run(["run_train.py", "--yaml", str(tmp_path / "cfg.yaml")])
    assert r.returncode == 0, r.stderr[-2000:]
    run_dirs = os.listdir(tmp_path / "out")
    assert any(d.startswith("cli_run_") for d in run_dirs)
