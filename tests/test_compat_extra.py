"""Extra compatibility guarantees: random-geometry adaptive-pool fuzz vs
torch, and the reference repo's own config YAMLs loading unchanged."""

import glob
import os

import numpy as np
import pytest


def test_adaptive_pool_fuzz_vs_torch():
    import torch
    import torch.nn.functional as F

    from nisqa_tpu.models.modules import adaptive_max_pool2d

    rng = np.random.default_rng(0)
    for _ in range(25):
        h = int(rng.integers(2, 50))
        w = int(rng.integers(2, 20))
        oh = int(rng.integers(1, h + 1))
        ow = int(rng.integers(1, w + 1))
        x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
        ours = np.asarray(adaptive_max_pool2d(x, (oh, ow)))
        ref = F.adaptive_max_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), (oh, ow)
        ).numpy().transpose(0, 2, 3, 1)
        assert np.array_equal(ours, ref), f"mismatch at {(h, w, oh, ow)}"

    # EXPANDING bins (n_out > n_in): torch repeats input positions — the
    # seg_length=1 geometry the reference supports ("kernel_size[1]=1 can
    # be used for seg_length=1") pools width 1 up to pool widths 7/5/3
    for _ in range(15):
        h = int(rng.integers(1, 8))
        w = int(rng.integers(1, 4))
        oh = int(rng.integers(h, 3 * h + 1))
        ow = int(rng.integers(w, 3 * w + 1))
        x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
        ours = np.asarray(adaptive_max_pool2d(x, (oh, ow)))
        ref = F.adaptive_max_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), (oh, ow)
        ).numpy().transpose(0, 2, 3, 1)
        assert np.array_equal(ours, ref), f"expand mismatch at {(h, w, oh, ow)}"


REF_CONFIGS = sorted(glob.glob("/root/reference/config/*.yaml"))


@pytest.mark.skipif(not REF_CONFIGS, reason="reference configs not mounted")
@pytest.mark.parametrize("path", REF_CONFIGS, ids=[os.path.basename(p) for p in REF_CONFIGS])
def test_reference_config_yaml_builds(path):
    """A user must be able to point run_train.py at the reference's own
    config YAMLs (incl. the `!!python/tuple` kernel-size tag)."""
    import jax
    import yaml

    from nisqa_tpu.compat.model_args import model_args_from_ckpt_args
    from nisqa_tpu.data.pipeline import MsConfig
    from nisqa_tpu.models.nisqa import build_model

    with open(path) as f:
        args = yaml.load(f, Loader=yaml.FullLoader)

    if not args.get("model"):
        # finetune configs take the architecture from the checkpoint; use
        # the mos-only arch as the checkpoint would supply it
        args["model"] = "NISQA"
    margs = model_args_from_ckpt_args(args)
    for k, v in list(margs.items()):
        if v is None and k in ("ms_seg_length", "ms_n_mels"):
            margs[k] = {"ms_seg_length": 15, "ms_n_mels": 48}[k]
    model = build_model(args["model"], margs)
    params, state = model.init(jax.random.PRNGKey(0))
    assert params
    if args.get("ms_n_fft"):
        MsConfig(args)
