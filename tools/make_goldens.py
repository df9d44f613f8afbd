"""Generate golden parity targets by running the PyTorch reference.

Produces tests/goldens/*.npz with, per config: the model args (json), the
(possibly freshly initialised) torch state_dict, deterministic synthetic
segment inputs, and the reference eval-mode outputs (final + CNN/TD taps).
The JAX implementation must reproduce these (tests/test_model_parity.py).

Covers the five BASELINE.json configs:
  1. nisqa_mos_only.tar   NISQA      (AdaptCNN - SA - PoolAttFF)
  2. nisqa.tar            NISQA_DIM  (5 heads)
  3. nisqa_tts.tar        NISQA      (StandardCNN+fc20 - biLSTM - last_step_bi)
  4. cnn_lstm_avg         NISQA      (StandardCNN+fc20 - biLSTM - avg) fresh init
  5. double_ended         NISQA_DE   (cosine/hard, fuse x/y/-, td2 SA) fresh init
plus extra fresh-init variants exercising remaining module options
(dff, skip, PoolAtt, max, last_step, each alignment scorer, soft apply,
fusion modes).

Run: python tools/make_goldens.py
"""

import json
import os
import sys
import types

import numpy as np

# the reference imports librosa at module scope; only the front-end needs it
sys.modules.setdefault("librosa", types.ModuleType("librosa"))
sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

from nisqa import NISQA_lib as NL  # noqa: E402  (reference library)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nisqa_tpu.compat.model_args import model_args_from_ckpt_args  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens")
WEIGHTS = "/root/reference/weights"


def build_reference_model(name, margs):
    cls = {"NISQA": NL.NISQA, "NISQA_DIM": NL.NISQA_DIM, "NISQA_DE": NL.NISQA_DE}[name]
    kwargs = dict(margs)
    if isinstance(kwargs.get("cnn_kernel_size"), list):
        kwargs["cnn_kernel_size"] = tuple(kwargs["cnn_kernel_size"])
    return cls(**kwargs)


def synth_inputs(seed, B, T, double_ended=False, n_mels=48, seg_len=15):
    rng = np.random.default_rng(seed)
    C = 2 if double_ended else 1
    x = rng.uniform(-80.0, 0.0, size=(B, T, C, n_mels, seg_len)).astype(np.float32)
    n_wins = np.sort(rng.integers(low=max(2, T // 4), high=T + 1, size=(B, C)))[:, ::-1]
    n_wins[0] = T  # at least one full-length sample
    # zero padded segments like the reference dataset does
    for b in range(B):
        for c in range(C):
            x[b, n_wins[b, c] :, c] = 0.0
    if not double_ended:
        return x, n_wins[:, 0].copy()
    return x, n_wins.astype(np.int64)


def run_reference(model, x, n_wins):
    model.eval()
    taps = {}

    def hook(name):
        def fn(mod, inp, out):
            t = out[0] if isinstance(out, tuple) else out
            taps[name] = t.detach().numpy().copy()
        return fn

    h1 = model.cnn.register_forward_hook(hook("cnn_out"))
    h2 = model.time_dependency.register_forward_hook(hook("td_out"))
    with torch.no_grad():
        y = model(torch.from_numpy(x), torch.from_numpy(np.asarray(n_wins)))
    h1.remove()
    h2.remove()
    return y.numpy(), taps


def save_golden(fname, name, margs, state_dict, x, n_wins, y, taps):
    sd_np = {f"sd::{k}": v.detach().numpy() for k, v in state_dict.items()}
    np.savez_compressed(
        os.path.join(OUT_DIR, fname),
        meta=json.dumps({"model": name, "model_args": margs}),
        x=x,
        n_wins=np.asarray(n_wins),
        y=y,
        **{f"tap::{k}": v for k, v in taps.items()},
        **sd_np,
    )
    print(f"{fname}: y={y.shape} first={y.reshape(-1)[:3]}")


def golden_from_tar(tar, fname, seed, T=60, B=3):
    ckpt = torch.load(os.path.join(WEIGHTS, tar), map_location="cpu", weights_only=False)
    args = dict(ckpt["args"])
    args["model"] = {"nisqa.tar": "NISQA_DIM", "nisqa_mos_only.tar": "NISQA", "nisqa_tts.tar": "NISQA"}[tar]
    margs = model_args_from_ckpt_args(args)
    model = build_reference_model(args["model"], margs)
    model.load_state_dict(ckpt["model_state_dict"], strict=True)
    x, n_wins = synth_inputs(seed, B, T)
    y, taps = run_reference(model, x, n_wins)
    save_golden(fname, args["model"], margs, ckpt["model_state_dict"], x, n_wins, y, taps)


def golden_fresh(name, overrides, fname, seed, T=40, B=3):
    torch.manual_seed(seed)
    args = {"model": name, **overrides}
    margs = model_args_from_ckpt_args(args)
    model = build_reference_model(name, margs)
    x, n_wins = synth_inputs(seed + 1, B, T, double_ended=(name == "NISQA_DE"))
    y, taps = run_reference(model, x, n_wins)
    save_golden(fname, name, margs, model.state_dict(), x, n_wins, y, taps)


def main():
    os.makedirs(OUT_DIR, exist_ok=True)

    # --- released checkpoints (BASELINE configs 1-3) ---
    golden_from_tar("nisqa_mos_only.tar", "g1_mos_only.npz", seed=11)
    golden_from_tar("nisqa.tar", "g2_dim.npz", seed=22)
    golden_from_tar("nisqa_tts.tar", "g3_tts.npz", seed=33, T=50)

    # --- BASELINE config 4: CNN-LSTM-avg (train_nisqa_cnn_lstm_avg.yaml arch) ---
    golden_fresh(
        "NISQA",
        dict(cnn_model="standard", cnn_fc_out_h=20, cnn_pool_1=None, cnn_pool_2=None,
             cnn_pool_3=None, td="lstm", td_lstm_h=128, td_lstm_num_layers=1,
             td_lstm_dropout=0, td_lstm_bidirectional=True, td_2="skip", pool="avg"),
        "g4_cnn_lstm_avg.npz", seed=44,
    )

    # --- BASELINE config 5: double-ended (train_nisqa_double_ended.yaml arch) ---
    de_td2 = dict(td_2="self_att", td_2_sa_d_model=64, td_2_sa_nhead=1,
                  td_2_sa_pos_enc=False, td_2_sa_num_layers=2, td_2_sa_h=64,
                  td_2_sa_dropout=0.1)
    golden_fresh(
        "NISQA_DE",
        dict(de_align="cosine", de_align_apply="hard", de_fuse="x/y/-", de_fuse_dim=None, **de_td2),
        "g5_double_ended.npz", seed=55, T=30,
    )

    # --- coverage of remaining module options ---
    golden_fresh("NISQA", dict(cnn_model="dff", cnn_fc_out_h=256, pool="att", pool_att_h=None),
                 "g6_dff_poolatt.npz", seed=66, T=25)
    golden_fresh("NISQA", dict(cnn_model="skip", cnn_fc_out_h=None, td="self_att", pool="max"),
                 "g7_skip_max.npz", seed=77, T=25)
    golden_fresh("NISQA", dict(td="lstm", td_lstm_h=64, td_lstm_num_layers=2,
                               td_lstm_dropout=0, td_lstm_bidirectional=False, pool="last_step"),
                 "g8_lstm2_laststep.npz", seed=88, T=25)
    for i, (al, ap, fu) in enumerate(
        [("dot", "soft", "x/y"), ("luong", "hard", "+/-"), ("bahd", "soft", "x/y/-"),
         ("distance", "hard", "x/y")]
    ):
        golden_fresh("NISQA_DE",
                     dict(de_align=al, de_align_apply=ap, de_fuse=fu, de_fuse_dim=(32 if i == 1 else None), **de_td2),
                     f"g9_de_{al}_{ap}.npz", seed=100 + i, T=20)
    # positional encoding on
    golden_fresh("NISQA", dict(td_sa_pos_enc=True), "g10_posenc.npz", seed=110, T=25)

    print("done")


if __name__ == "__main__":
    main()
