"""One-train-step parity in float64: identical weights + batch must produce
the same loss, gradients, and Adam-updated parameters as the PyTorch
reference, to near machine precision.

This is the strongest training-correctness check available: it validates the
backward pass end to end. float64 removes f32 summation-order noise (the
multi-million-term conv-weight reductions differ by ~3e-3 rel between
XLA-CPU and torch in f32 while agreeing to ~1e-15 in f64 — verified during
development), so tolerances here are tight.

Three goldens, one per trainable architecture family (tools/make_train_goldens.py):
  g_train_step.npz       AdaptCNN -> self-attention -> PoolAttFF
                         (`/root/reference/nisqa/NISQA_lib.py:586-710,945-1040`)
  g_train_step_lstm.npz  StandardCNN+fc20 -> biLSTM -> avg pooling — the
                         CNN-LSTM-avg training config: LSTM backward through
                         the masked lax.scan and StandardCNN train-mode
                         masked BN after the padded max-pool
                         (`NISQA_lib.py:712-836,897-943`)
  g_train_step_de.npz    NISQA_DE cosine/hard + x/y/- fusion + SA td_2:
                         Siamese shared-trunk serial BN update and the
                         hard-attention argmax-gather gradient
                         (`NISQA_lib.py:272-424,1359-1368`)

Runs in subprocesses because jax_enable_x64 is process-global.
"""

import os
import subprocess
import sys

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import json
import numpy as np
import jax.numpy as jnp
import optax
import sys
sys.path.insert(0, %(repo)r)
from nisqa_tpu.compat.model_args import model_args_from_ckpt_args
from nisqa_tpu.compat.torch_ckpt import params_from_torch, params_to_torch
from nisqa_tpu.models.nisqa import build_model
from nisqa_tpu.train.loop import nan_mse

z = np.load(%(golden)r)
sd0 = {k[5:]: z[k] for k in z.files if k.startswith("sd0::")}
sd1 = {k[5:]: z[k] for k in z.files if k.startswith("sd1::")}
ref_grads = {k[3:]: z[k] for k in z.files if k.startswith("g::")}
x, n_wins, y = z["x"].astype(np.float64), z["n_wins"], z["y"].astype(np.float64)

if "meta" in z.files:
    meta = json.loads(str(z["meta"]))
    name, margs = meta["model"], dict(meta["model_args"])
else:  # the original AdaptCNN+SA golden predates the meta field
    name = "NISQA"
    margs = model_args_from_ckpt_args({"model": "NISQA"})
for k in ("cnn_dropout", "td_sa_dropout", "td_2_sa_dropout", "pool_att_dropout"):
    if k in margs:
        margs[k] = 0.0
model = build_model(name, margs)
params, state = params_from_torch(sd0, model)
to64 = lambda t: jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), t)
params, state = to64(params), to64(state)

xb = x if model.double_ended else x[:, :, 0]
nb = jnp.asarray(n_wins)
K = y.shape[1]  # 5 for NISQA_DIM: the summed per-target loss of _train_dim

def loss_fn(p):
    y_hat, new_bn = model.apply(p, state, xb, nb, train=True, rng=None)
    yj = jnp.asarray(y)
    return sum(nan_mse(y_hat[:, k], yj[:, k]) for k in range(K)), new_bn

(loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
assert abs(float(loss) - float(z["loss"])) < 1e-9, ("loss", float(loss), float(z["loss"]))

our_grads = params_to_torch(model, grads, new_bn)
for k, gv in ref_grads.items():
    d = float(np.max(np.abs(our_grads[k] - gv)))
    tol = 1e-9 * max(1.0, float(np.max(np.abs(gv))))
    assert d < tol, (k, "grad diff", d)

# Adam first step (float64 torch Adam in the golden)
opt = optax.scale_by_adam()
upd, _ = opt.update(grads, opt.init(grads))
new_params = jax.tree_util.tree_map(lambda p, u: p - 1e-3 * u, params, upd)
ours = params_to_torch(model, new_params, new_bn)
for k, ref_v in sd1.items():
    if "num_batches_tracked" in k:
        continue
    d = float(np.max(np.abs(ours[k] - ref_v)))
    tol = 1e-7 * max(1.0, float(np.max(np.abs(ref_v))))  # running_var is O(1e2)
    assert d < tol, (k, "param diff", d, "tol", tol)
print("TRAIN_STEP_PARITY_OK")
"""


@pytest.mark.parametrize(
    "golden",
    ["g_train_step.npz", "g_train_step_lstm.npz", "g_train_step_dim.npz",
     "g_train_step_de.npz"],
)
def test_one_train_step_matches_reference(golden):
    path = os.path.join(GOLDEN_DIR, golden)
    if not os.path.exists(path):
        pytest.skip("golden missing")
    code = _SCRIPT % {"repo": REPO, "golden": path}
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["NISQA_TPU_NO_CACHE"] = "1"
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, cwd=REPO, timeout=500)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "TRAIN_STEP_PARITY_OK" in r.stdout
