"""Golden parity: JAX models must reproduce the PyTorch reference outputs.

Goldens are generated once by tools/make_goldens.py (runs the reference with
torch-cpu) and cover all five BASELINE.json configs plus every remaining
framewise/TD/pooling/alignment/fusion option. Weights travel through the
checkpoint converter, so these tests validate the converter too.
"""

import glob
import json
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
# forward-parity goldens are g<N>_*.npz (other goldens have their own tests)
GOLDENS = sorted(glob.glob(os.path.join(GOLDEN_DIR, "g[0-9]*.npz")))


def _load(path):
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    sd = {k[4:]: z[k] for k in z.files if k.startswith("sd::")}
    taps = {k[5:]: z[k] for k in z.files if k.startswith("tap::")}
    return meta, sd, z["x"], z["n_wins"], z["y"], taps


@pytest.mark.skipif(not GOLDENS, reason="run tools/make_goldens.py first")
@pytest.mark.parametrize("path", GOLDENS, ids=[os.path.basename(p) for p in GOLDENS])
def test_forward_parity(path):
    import jax

    from nisqa_tpu.compat.torch_ckpt import params_from_torch
    from nisqa_tpu.models.nisqa import build_model

    meta, sd, x, n_wins, y_ref, taps = _load(path)
    model = build_model(meta["model"], meta["model_args"])
    params, state = params_from_torch(sd, model)

    # torch NCHW (B, T, C, H, S) -> ours (B, T, H, S) / (B, T, 2, H, S)
    if model.double_ended:
        xx = x  # (B, T, 2, H, S) already matches
    else:
        xx = x[:, :, 0]

    with jax.default_matmul_precision("highest"):
        y, _ = jax.jit(lambda p, s, a, n: model.apply(p, s, a, n))(params, state, xx, n_wins)
    y = np.asarray(y)

    assert y.shape == y_ref.shape
    err = np.max(np.abs(y - y_ref))
    assert err < 2e-4, f"{os.path.basename(path)}: max abs err {err}"


@pytest.mark.skipif(not GOLDENS, reason="run tools/make_goldens.py first")
def test_cnn_tap_parity():
    """Layer-localised check on the flagship DIM model: CNN features on valid
    frames must match the packed-sequence reference (pad frames differ by
    design: reference zeroes them, we mask downstream; SURVEY Appendix A.4)."""
    import jax

    from nisqa_tpu.compat.torch_ckpt import params_from_torch
    from nisqa_tpu.models.framewise import framewise_apply
    from nisqa_tpu.models.nisqa import build_model

    meta, sd, x, n_wins, y_ref, taps = _load(os.path.join(GOLDEN_DIR, "g2_dim.npz"))
    model = build_model(meta["model"], meta["model_args"])
    params, state = params_from_torch(sd, model)

    with jax.default_matmul_precision("highest"):
        feats, _ = framewise_apply(params["cnn"], state["cnn"], model.cfg, x[:, :, 0], n_wins)
    feats = np.asarray(feats)
    ref = taps["cnn_out"]  # (B, T_ref, D) zero-padded to n_wins.max()
    for b in range(feats.shape[0]):
        nw = int(n_wins[b])
        err = np.max(np.abs(feats[b, :nw] - ref[b, :nw]))
        assert err < 1e-4, f"sample {b}: cnn feature err {err}"
