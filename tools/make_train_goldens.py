"""Generate TRAINING parity goldens by running the PyTorch reference.

Produces (tests/goldens/):
  g_train_bn.npz         one train-mode forward of the default AdaptCNN
                         trunk with ALL dropout probabilities set to 0
                         (identity even in train mode), so the post-forward
                         running statistics of every one of the six
                         BatchNorm layers are deterministic and can be
                         pinned tightly (reference packed-BN semantics:
                         `/root/reference/nisqa/NISQA_lib.py:489-501`).
  g_train_step_lstm.npz  one float64 train step (loss, grads, Adam update)
                         of the CNN-LSTM-avg architecture
                         (`/root/reference/config/train_nisqa_cnn_lstm_avg.yaml`:
                         StandardCNN+fc20 -> biLSTM(128) -> avg pooling,
                         LSTM path `NISQA_lib.py:897-943`, StandardCNN
                         `:712-836`).
  g_train_step_de.npz    one float64 train step of the double-ended model
                         (`/root/reference/config/train_nisqa_double_ended.yaml`:
                         cosine/hard alignment, x/y/- fusion, SA td_2;
                         `NISQA_lib.py:272-424`).

Format matches tests/goldens/g_train_step.npz (which pins the AdaptCNN+SA
architecture): sd0:: = state_dict before the forward, g:: = parameter
gradients, sd1:: = state_dict after the Adam step (includes the BN running
stats the train-mode forward updated), x/n_wins/y/loss, and meta (json with
model name + model_args) so the JAX test can rebuild the same architecture.

All dropout probabilities are zeroed in the generated configs: torch
dropout draws from its global RNG and cannot be replayed in JAX, so parity
goldens must be dropout-free. BatchNorm stays in train mode — masked batch
statistics are exactly what these goldens pin.

Run: python tools/make_train_goldens.py
"""

import copy
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

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens"
)

NO_DROPOUT = {
    "cnn_dropout": 0.0,
    "td_sa_dropout": 0.0,
    "td_2_sa_dropout": 0.0,
    "td_lstm_dropout": 0.0,
    "pool_att_dropout": 0.0,
}


def build_reference_model(name, margs):
    cls = {"NISQA": NL.NISQA, "NISQA_DIM": NL.NISQA_DIM, "NISQA_DE": NL.NISQA_DE}[name]
    kwargs = dict(margs)
    if isinstance(kwargs.get("cnn_kernel_size"), list):
        kwargs["cnn_kernel_size"] = tuple(kwargs["cnn_kernel_size"])
    return cls(**kwargs)


def synth_inputs(seed, B, T, double_ended=False, n_targets=1):
    rng = np.random.default_rng(seed)
    C = 2 if double_ended else 1
    x = rng.uniform(-80.0, 0.0, size=(B, T, C, 48, 15)).astype(np.float64)
    n_wins = np.sort(rng.integers(low=max(2, T // 4), high=T + 1, size=(B, C)))[:, ::-1]
    n_wins[0] = T
    for b in range(B):
        for c in range(C):
            x[b, n_wins[b, c]:, c] = 0.0
    y = rng.uniform(1.0, 5.0, size=(B, n_targets))
    if not double_ended:
        return x, n_wins[:, 0].copy(), y
    return x, np.ascontiguousarray(n_wins.astype(np.int64)), y


def make_bn_golden():
    """Dropout-free float64 train-mode forward: pin all six packed-BN
    layers' post-forward running statistics to near machine precision."""
    torch.manual_seed(7)
    args = {"model": "NISQA", **NO_DROPOUT}
    margs = model_args_from_ckpt_args(args)
    model = build_reference_model("NISQA", margs).double().train()
    sd0 = copy.deepcopy(model.state_dict())
    x, n_wins, y = synth_inputs(1234, B=4, T=24)
    with torch.no_grad():
        out = model(torch.from_numpy(x), torch.from_numpy(np.asarray(n_wins)))
    post = {f"post::{k}": v.detach().numpy() for k, v in model.state_dict().items()
            if "running_" in k}
    np.savez_compressed(
        os.path.join(OUT_DIR, "g_train_bn.npz"),
        meta=json.dumps({"model": "NISQA", "model_args": margs}),
        x=x, n_wins=np.asarray(n_wins), y=out.detach().numpy(),
        **{f"sd::{k}": v.detach().numpy() for k, v in sd0.items()},
        **post,
    )
    print(f"g_train_bn.npz: {len(post)} post-stats, y={out.shape}")


def make_train_step_golden(fname, name, overrides, seed, B, T):
    """One float64 reference train step: forward (train mode, BN updates),
    MSE loss, backward, Adam(lr=1e-3) step."""
    torch.manual_seed(seed)
    args = {"model": name, **NO_DROPOUT, **overrides}
    margs = model_args_from_ckpt_args(args)
    model = build_reference_model(name, margs).double().train()
    sd0 = copy.deepcopy(model.state_dict())

    n_targets = 5 if name == "NISQA_DIM" else 1
    x, n_wins, y = synth_inputs(seed + 1, B, T,
                                double_ended=(name == "NISQA_DE"),
                                n_targets=n_targets)
    # the reference dataset ships (B, T, C, H, S); Framewise consumes it
    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y)

    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    y_hat = model(xt, torch.from_numpy(np.asarray(n_wins)))
    # MOS: plain MSE; DIM: the reference sums the 5 per-target losses
    # (`NISQA_model.py:341-347`)
    loss = sum(torch.mean((y_hat[:, k] - yt[:, k]) ** 2)
               for k in range(n_targets))
    loss.backward()
    grads = {k: p.grad.detach().numpy().copy()
             for k, p in model.named_parameters()}
    opt.step()
    sd1 = model.state_dict()

    np.savez_compressed(
        os.path.join(OUT_DIR, fname),
        meta=json.dumps({"model": name, "model_args": margs}),
        x=x, n_wins=np.asarray(n_wins), y=y, loss=float(loss),
        **{f"sd0::{k}": v.detach().numpy() for k, v in sd0.items()},
        **{f"g::{k}": v for k, v in grads.items()},
        **{f"sd1::{k}": v.detach().numpy() for k, v in sd1.items()},
    )
    print(f"{fname}: loss={float(loss):.6f} grads={len(grads)}")


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    make_bn_golden()

    # CNN-LSTM-avg (BASELINE config 4 architecture, full size): LSTM backward
    # through packed sequences + StandardCNN train-mode BN after the padded
    # max-pool, neither covered by g_train_step.npz (AdaptCNN+SA).
    make_train_step_golden(
        "g_train_step_lstm.npz", "NISQA",
        dict(cnn_model="standard", cnn_fc_out_h=20, cnn_pool_1=None,
             cnn_pool_2=None, cnn_pool_3=None, cnn_kernel_size=(3, 3),
             td="lstm", td_lstm_h=128, td_lstm_num_layers=1,
             td_lstm_bidirectional=True, td_2="skip", pool="avg"),
        seed=211, B=3, T=22,
    )

    # NISQA_DIM (nisqa.tar architecture): 5 deep-copied pooling heads, the
    # summed 5-target loss of `_train_dim` (`NISQA_model.py:341-347`).
    make_train_step_golden("g_train_step_dim.npz", "NISQA_DIM", {},
                           seed=411, B=3, T=20)

    # Double-ended (BASELINE config 5 architecture): Siamese trunk with the
    # serial shared-BN update, hard-attention argmax gather gradient, fusion.
    make_train_step_golden(
        "g_train_step_de.npz", "NISQA_DE",
        dict(de_align="cosine", de_align_apply="hard", de_fuse="x/y/-",
             de_fuse_dim=None, td_2="self_att", td_2_sa_d_model=64,
             td_2_sa_nhead=1, td_2_sa_pos_enc=False, td_2_sa_num_layers=2,
             td_2_sa_h=64),
        seed=311, B=3, T=18,
    )
    print("done")


if __name__ == "__main__":
    main()
