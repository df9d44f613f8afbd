"""Every shipped training YAML trains end-to-end through ``run_train.py``.

SURVEY.md §4 sets the bar: "train-for-2-epochs for each of the 5
BASELINE.json configs". Each test here drives the REAL user path
(`run_train.py --yaml`, mirroring `/root/reference/run_train.py:12-25`) with
the shipped config — real ``cnn_model``/``td``/``pool``/``de_*`` choices and
full-size layer dims — overriding only corpus paths, epochs/batch sizes, and
``ms_max_segments`` (so CPU compiles stay fast). Asserts per config:

  * the run completes and writes the per-epoch results CSV (2 rows),
  * it LEARNS: epoch-2 train loss < epoch-1 train loss,
  * the final ``.tar`` strict-loads into the actual PyTorch reference model
    class (`/root/reference/nisqa/NISQA_lib.py:29-424`) — train here,
    deploy upstream, per config family (AdaptCNN+SA, StandardCNN+biLSTM,
    double-ended, and the two finetune configs warm-started from the
    released weights).
"""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_DIR = os.path.join(REPO, "nisqa_tpu", "config")
REF_WEIGHTS = "/root/reference/weights"

CONFIGS = [
    # (yaml name, pretrained tar or None, reference model class name)
    ("train_nisqa_cnn_sa_ap.yaml", None, "NISQA"),
    ("train_nisqa_cnn_lstm_avg.yaml", None, "NISQA"),
    ("train_nisqa_double_ended.yaml", None, "NISQA_DE"),
    ("finetune_nisqa.yaml", "nisqa_mos_only.tar", "NISQA"),
    ("finetune_nisqa_multidimensional.yaml", "nisqa.tar", "NISQA_DIM"),
]


def _write_corpus_48k(tmp_path, n=12, seed=0):
    """48 kHz clips (native-rate geometry the shipped configs assume:
    fmax 20 kHz needs sr >= 40 kHz for non-degenerate upper mel filters)."""
    from nisqa_tpu.audio.wav import write_wav

    rng = np.random.default_rng(seed)
    names = []
    sr = 48000
    for i in range(n):
        dur = rng.uniform(0.35, 0.8)
        t = np.arange(int(sr * dur)) / sr
        y = 0.4 * np.sin(2 * np.pi * (180 + 70 * i) * t) \
            + 0.05 * rng.standard_normal(len(t))
        name = f"c{i}.wav"
        write_wav(str(tmp_path / name), y.astype(np.float32), sr)
        names.append(name)
    return names


@pytest.fixture(scope="module")
def corpus48(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("corpus48")
    names = _write_corpus_48k(tmp)
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "filename": names,
        # refs for the double-ended config: pair each clip with another
        "ref": [names[(i + 1) % len(names)] for i in range(len(names))],
        "db": ["T"] * 8 + ["V"] * 4,
    })
    for c in ("mos", "noi", "dis", "col", "loud"):
        df[c] = rng.uniform(1.0, 5.0, len(names)).round(2)
    df.to_csv(tmp / "corpus.csv", index=False)
    return tmp


def _overrides(corpus_dir, out_dir, run_name):
    return {
        "name": run_name,
        "data_dir": str(corpus_dir),
        "output_dir": str(out_dir),
        "csv_file": "corpus.csv",
        "csv_deg": "filename",
        "csv_ref": "ref",
        "csv_mos_train": "mos",
        "csv_mos_val": "mos",
        "csv_db_train": ["T"],
        "csv_db_val": ["V"],
        "csv_con": None,
        "tr_epochs": 2,
        "tr_early_stop": 10,
        "tr_bs": 4,
        "tr_bs_val": 4,
        "tr_lr": 1e-3,
        "tr_lr_patience": 15,
        "tr_num_workers": 0,
        "tr_parallel": False,
        "tr_ds_to_memory": False,
        "tr_checkpoint": "every_epoch",
        "tr_verbose": 0,
        # small T grid keeps the CPU compiles fast; every other ms_*/arch
        # key (48 mels, seg 15, n_fft 4096, real cnn/td/pool dims) is the
        # shipped value
        "ms_max_segments": 64,
        "seed": 0,
    }


def _run_train(cfg_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        f"import runpy, sys; sys.argv = ['run_train.py', '--yaml', {str(cfg_path)!r}]; "
        f"runpy.run_path({os.path.join(REPO, 'run_train.py')!r}, run_name='__main__')"
    )
    return subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, env=env, cwd=REPO, timeout=1200)


@pytest.mark.parametrize("cfg_name,pretrained,ref_cls", CONFIGS,
                         ids=[c[0].replace(".yaml", "") for c in CONFIGS])
def test_shipped_yaml_trains_and_roundtrips(corpus48, tmp_path, cfg_name,
                                            pretrained, ref_cls):
    with open(os.path.join(CONFIG_DIR, cfg_name)) as f:
        cfg = yaml.load(f, Loader=yaml.FullLoader)
    run_name = "cfg_" + cfg_name.replace(".yaml", "")
    cfg.update(_overrides(corpus48, tmp_path, run_name))
    cfg["pretrained_model"] = (
        os.path.join(REF_WEIGHTS, pretrained) if pretrained else False
    )
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)

    r = _run_train(cfg_path)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-3000:])

    run_dirs = [d for d in os.listdir(tmp_path) if d.startswith(run_name + "_")]
    assert len(run_dirs) == 1
    run_dir = tmp_path / run_dirs[0]
    results = pd.read_csv(run_dir / f"{run_dirs[0]}__results.csv")
    assert len(results) == 2
    losses = results["loss"].to_numpy(float)
    assert np.isfinite(losses).all()
    assert losses[1] < losses[0], f"{cfg_name}: loss did not fall: {losses}"

    # the final training .tar strict-loads into the UPSTREAM reference model
    tars = sorted(run_dir.glob("*.tar"))
    assert len(tars) == 2  # every_epoch
    import types

    sys.modules.setdefault("librosa", types.ModuleType("librosa"))
    sys.path.insert(0, "/root/reference")
    import torch
    from nisqa import NISQA_lib as NL

    from nisqa_tpu.compat.model_args import model_args_from_ckpt_args

    ckpt = torch.load(str(tars[-1]), map_location="cpu", weights_only=False)
    margs = model_args_from_ckpt_args(ckpt["args"])
    kwargs = dict(margs)
    if isinstance(kwargs.get("cnn_kernel_size"), list):
        kwargs["cnn_kernel_size"] = tuple(kwargs["cnn_kernel_size"])
    ref = getattr(NL, ref_cls)(**kwargs)
    ref.load_state_dict(ckpt["model_state_dict"], strict=True)

    # and the native .msgpack resume state sits next to it
    assert (run_dir / (tars[-1].stem + ".msgpack")).exists()
