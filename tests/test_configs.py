"""The shipped YAML configs must parse and build their models."""

import glob
import os

import pytest
import yaml

CFG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "nisqa_tpu", "config")
CONFIGS = sorted(glob.glob(os.path.join(CFG_DIR, "*.yaml")))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds_model(path):
    import jax

    from nisqa_tpu.compat.model_args import model_args_from_ckpt_args
    from nisqa_tpu.data.pipeline import MsConfig
    from nisqa_tpu.models.nisqa import build_model

    with open(path) as f:
        args = yaml.load(f, Loader=yaml.FullLoader)

    # the full ~70-key surface the reference documents must be present
    for key in ("tr_bs", "tr_lr", "ms_n_fft", "ms_seg_length", "model",
                "cnn_model", "td", "pool", "tr_checkpoint"):
        assert key in args, f"{os.path.basename(path)} missing {key}"

    margs = model_args_from_ckpt_args(args)
    model = build_model(args["model"], margs)
    params, state = model.init(jax.random.PRNGKey(0))
    assert params and state
    MsConfig(args)  # geometry must validate (odd seg_length etc.)


def test_reference_yaml_tuple_tag_loads(tmp_path):
    """Users may bring reference configs with `!!python/tuple` kernel sizes;
    run_train.py uses FullLoader which must accept them."""
    p = tmp_path / "cfg.yaml"
    p.write_text("cnn_kernel_size: !!python/tuple [3, 3]\n")
    with open(p) as f:
        args = yaml.load(f, Loader=yaml.FullLoader)
    assert args["cnn_kernel_size"] == (3, 3)
