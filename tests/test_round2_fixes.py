"""Round-2 correctness fixes.

Covers:
  * model_args defaults: every family constructs + forwards from a minimal
    args dict (VERDICT round 1, `compat/model_args.py` hardening).
  * pos_enc checkpoint export: the reference's strict load requires the
    `pos_encoder.pe` buffer key (`/root/reference/nisqa/NISQA_lib.py:1042-1062`).
  * scheduler/early-stopper state survives the native checkpoint round trip
    (exact-resume invariant).
  * NISQA_DE shared-trunk BN running stats compose serially (deg then ref),
    matching torch's sequential `cnn(deg); cnn(ref)` updates.
"""

import json
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest


# ---------------------------------------------------------------------------
# model_args minimal construction
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["NISQA", "NISQA_DIM", "NISQA_DE"])
def test_minimal_model_args_build_and_forward(name):
    from nisqa_tpu.compat.model_args import model_args_from_ckpt_args
    from nisqa_tpu.models.nisqa import build_model

    margs = model_args_from_ckpt_args({"model": name})
    model = build_model(name, margs)
    params, state = model.init(jax.random.PRNGKey(0))
    B, T = 2, 20
    if name == "NISQA_DE":
        x = jnp.zeros((B, T, 2, 48, 15), jnp.float32)
        n_wins = jnp.array([[T, T - 3], [T - 5, T]], jnp.int32)
    else:
        x = jnp.zeros((B, T, 48, 15), jnp.float32)
        n_wins = jnp.array([T, T - 3], jnp.int32)
    y, _ = model.apply(params, state, x, n_wins)
    assert y.shape == (B, 5 if name == "NISQA_DIM" else 1)
    assert np.isfinite(np.asarray(y)).all()


def test_minimal_model_args_td2_self_att():
    from nisqa_tpu.compat.model_args import model_args_from_ckpt_args
    from nisqa_tpu.models.nisqa import build_model

    margs = model_args_from_ckpt_args({"model": "NISQA", "td_2": "self_att"})
    model = build_model("NISQA", margs)
    params, state = model.init(jax.random.PRNGKey(0))
    y, _ = model.apply(params, state, jnp.zeros((1, 10, 48, 15)), jnp.array([10], jnp.int32))
    assert y.shape == (1, 1)


# ---------------------------------------------------------------------------
# pos_enc export -> reference strict load
# ---------------------------------------------------------------------------


def test_pos_enc_export_loads_strict_in_reference(tmp_path):
    import torch

    sys.modules.setdefault("librosa", types.ModuleType("librosa"))
    sys.path.insert(0, "/root/reference")
    from nisqa import NISQA_lib as NL

    from nisqa_tpu.compat.model_args import model_args_from_ckpt_args
    from nisqa_tpu.compat.torch_ckpt import params_to_torch
    from nisqa_tpu.models.nisqa import build_model

    margs = model_args_from_ckpt_args({"model": "NISQA", "td_sa_pos_enc": True})
    model = build_model("NISQA", margs)
    params, state = model.init(jax.random.PRNGKey(1))
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in params_to_torch(model, params, state).items()}

    kwargs = dict(margs)
    if isinstance(kwargs.get("cnn_kernel_size"), list):
        kwargs["cnn_kernel_size"] = tuple(kwargs["cnn_kernel_size"])
    ref = NL.NISQA(**kwargs)
    ref.load_state_dict(sd, strict=True)  # raises on missing/unexpected keys
    pe = dict(ref.named_buffers())["time_dependency.model.pos_encoder.pe"]
    assert pe.shape[1] == 1 and pe.shape[2] == margs["td_sa_d_model"]


# ---------------------------------------------------------------------------
# scheduler / stopper state round trip
# ---------------------------------------------------------------------------


def test_loop_state_checkpoint_roundtrip(tmp_path):
    from nisqa_tpu.compat.model_args import model_args_from_ckpt_args
    from nisqa_tpu.models.nisqa import build_model
    from nisqa_tpu.train.checkpoint import load_train_state, save_train_state
    from nisqa_tpu.train.early_stop import EarlyStopper, EarlyStopperDim
    from nisqa_tpu.train.plateau import ReduceLROnPlateau

    sched = ReduceLROnPlateau(1e-3, patience=0)
    sched.step(1.0)
    sched.step(2.0)  # no improvement -> decay
    assert sched.lr < 1e-3
    stopper = EarlyStopper(20)
    stopper.step({"r_p_mean_file": 0.5, "rmse_map_mean_file": 0.8})
    stopper.step({"r_p_mean_file": 0.4, "rmse_map_mean_file": 0.9})
    assert stopper.cnt == 1

    margs = model_args_from_ckpt_args({"model": "NISQA"})
    model = build_model("NISQA", margs)
    params, state = model.init(jax.random.PRNGKey(0))
    import optax

    opt_state = optax.scale_by_adam().init(params)
    base = str(tmp_path / "ck")
    save_train_state(
        base, model, params, state, opt_state, {"model": "NISQA"}, epoch=4,
        loop_state={"sched": sched.state_dict(), "stopper": stopper.state_dict()},
    )

    restored = load_train_state(base, {
        "params": params, "bn_state": state, "opt_state": opt_state,
        "bias_b": np.zeros((0, 4), np.float32),
    })
    ls = restored["meta"]["loop_state"]
    sched2 = ReduceLROnPlateau(1e-3, patience=0)
    sched2.load_state_dict(ls["sched"])
    assert sched2.lr == sched.lr and sched2.best == sched.best and sched2.num_bad == sched.num_bad
    stopper2 = EarlyStopper(20)
    stopper2.load_state_dict(ls["stopper"])
    assert stopper2.best_rmse == stopper.best_rmse
    assert stopper2.best_r_p == stopper.best_r_p
    assert stopper2.cnt == stopper.cnt

    # dim stopper serializes its 10 tracked stats
    sd = EarlyStopperDim(5)
    sd.step({f"r_p_mean_file{s}": 0.1 for s in sd._SUFFIXES}
            | {f"rmse_map_mean_file{s}": 0.7 for s in sd._SUFFIXES})
    sd2 = EarlyStopperDim(5)
    sd2.load_state_dict(json.loads(json.dumps(sd.state_dict())))
    assert sd2.best_rmse == sd.best_rmse and sd2.cnt == sd.cnt


def test_train_checkpoint_contains_loop_state(tmp_path):
    """End-to-end: checkpoints written by train_mos carry scheduler/stopper
    state in meta.json (used by _maybe_resume)."""
    from tests.test_resume_and_cache import _train_args
    from tests.test_e2e import _write_corpus
    from nisqa_tpu.model import NisqaTPU
    import os

    names = _write_corpus(tmp_path, n=6)
    out = tmp_path / "run"
    NisqaTPU(_train_args(tmp_path, out, names, epochs=1)).train()
    run_dir = out / os.listdir(out)[0]
    metas = sorted(run_dir.glob("*.meta.json"))
    assert metas
    with open(metas[-1]) as f:
        meta = json.load(f)
    ls = meta["loop_state"]
    assert set(ls["sched"]) == {"lr", "best", "num_bad"}
    assert set(ls["stopper"]) == {"best_rmse", "best_r_p", "cnt"}


# ---------------------------------------------------------------------------
# DE serial BN running-stat composition
# ---------------------------------------------------------------------------


def test_de_bn_running_stats_serial():
    from nisqa_tpu.compat.model_args import model_args_from_ckpt_args
    from nisqa_tpu.models import framewise as F
    from nisqa_tpu.models.nisqa import build_model

    margs = model_args_from_ckpt_args({"model": "NISQA_DE"})
    model = build_model("NISQA_DE", margs)
    params, state = model.init(jax.random.PRNGKey(2))

    rng = np.random.default_rng(0)
    B, T = 3, 12
    x = jnp.asarray(rng.standard_normal((B, T, 2, 48, 15)), jnp.float32)
    n_wins = jnp.array([[T, T], [T - 4, T - 2], [T - 1, T]], jnp.int32)

    # rng=None: dropout off, BN still updates in train mode
    _, new_state = model.apply(params, state, x, n_wins, train=True, rng=None)

    # expected: torch order — cnn(deg) updates running stats, cnn(ref) updates
    # them again on top (`NISQA_lib.py:410-411`)
    _, s1 = F.framewise_apply(params["cnn"], state["cnn"], model.cfg,
                              x[:, :, 0], n_wins[:, 0], train=True, rng=None)
    _, s2 = F.framewise_apply(params["cnn"], s1, model.cfg,
                              x[:, :, 1], n_wins[:, 1], train=True, rng=None)

    flat_got = jax.tree_util.tree_leaves(new_state["cnn"])
    flat_exp = jax.tree_util.tree_leaves(s2)
    for g, e in zip(flat_got, flat_exp):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e), rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# model-review fixes (round 2, second pass)
# ---------------------------------------------------------------------------


def test_cosine_scores_match_torch_on_small_norms():
    """Pin the EXACT torch nn.CosineSimilarity semantics the reference uses
    (`NISQA_lib.py:1304`): torch's ATen kernel clamps each norm separately
    at eps (the docstring's max(||a||*||b||, eps) formula is stale since
    torch 1.9) — near-silent frames are the distinguishing input."""
    import torch

    from nisqa_tpu.models.align import _scores

    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, 5, 8)).astype(np.float32)
    y = rng.standard_normal((2, 7, 8)).astype(np.float32)
    q[0, 0] *= 1e-5  # near-silent frames
    y[0, 3] *= 1e-6
    y[1, 2] = 0.0
    ours = np.asarray(_scores("cosine", {}, jnp.asarray(q), jnp.asarray(y)))
    cos = torch.nn.CosineSimilarity(dim=3, eps=1e-8)
    ref = cos(torch.from_numpy(q)[:, :, None, :], torch.from_numpy(y)[:, None, :, :]).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_pos_enc_buffer_frozen_in_training():
    """The sinusoidal pe table is a frozen buffer in the reference; a train
    step must leave it bit-identical (and off the Adam moments)."""
    from nisqa_tpu.compat.model_args import model_args_from_ckpt_args
    from nisqa_tpu.models.nisqa import build_model
    from nisqa_tpu.models.td import positional_encoding_table

    class _Runner:
        pass

    margs = model_args_from_ckpt_args({"model": "NISQA", "td_sa_pos_enc": True})
    model = build_model("NISQA", margs)
    params, state = model.init(jax.random.PRNGKey(0))
    assert "pe" in params["td"]

    from nisqa_tpu.data.pipeline import MsConfig
    from nisqa_tpu.train.loop import TrainEngine

    runner = _Runner()
    runner.model = model
    runner.params = params
    runner.state = state
    runner.ms = MsConfig(margs)
    runner.args = {"tr_precision": None}
    runner.mesh = None
    engine = TrainEngine(runner)
    step_fn, buf_len = engine._step(1, 8000, runner.ms.buckets()[0], "f32", False)

    rng = np.random.default_rng(0)
    B = 2
    n = int(8000 * 0.7)
    buf = np.zeros((B, buf_len), np.float32)
    buf[:, : n + 256] = rng.standard_normal((B, n + 256)).astype(np.float32) * 0.1
    ns = np.full((B,), n, np.int32)
    y = rng.uniform(1, 5, (B, 1)).astype(np.float32)
    bias_b = np.zeros((B, 1, 4), np.float32)
    bias_b[..., 1] = 1.0
    pe_before = np.asarray(runner.params["td"]["pe"]).copy()
    new_params, _, _, loss, _ = step_fn(
        runner.params, engine.opt_state, runner.state,
        jnp.asarray(y), jnp.asarray(bias_b),
        jnp.asarray(np.ones(B, bool)), jnp.float32(1e-3),
        jax.random.PRNGKey(1), jnp.asarray(buf), jnp.asarray(ns),
    )
    assert np.isfinite(float(loss))
    np.testing.assert_array_equal(np.asarray(new_params["td"]["pe"]), pe_before)
    np.testing.assert_array_equal(pe_before, positional_encoding_table(
        margs["td_sa_d_model"]))


def test_dff_requires_fc_out_h():
    from nisqa_tpu.compat.model_args import model_args_from_ckpt_args
    from nisqa_tpu.models.nisqa import build_model

    margs = model_args_from_ckpt_args({"model": "NISQA", "cnn_model": "dff",
                                       "cnn_fc_out_h": None})
    with pytest.raises(ValueError, match="cnn_fc_out_h"):
        build_model("NISQA", margs)
