"""Data-parallel paths on the virtual 8-device CPU mesh (SURVEY.md §2.5:
the TPU-native replacement for nn.DataParallel)."""

import numpy as np
import pandas as pd
import pytest

from tests.test_e2e import TINY_ARGS, _make_ckpt, _write_corpus


def test_predict_data_parallel_matches_single(tmp_path):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from nisqa_tpu.model import NisqaTPU

    names = _write_corpus(tmp_path, n=8)
    ckpt = _make_ckpt(tmp_path)
    base = {
        "mode": "predict_dir",
        "pretrained_model": ckpt,
        "data_dir": str(tmp_path),
        "output_dir": None,
        "tr_bs_val": 8,
        "tr_num_workers": 0,
        "name": "tiny",
    }
    df_par = NisqaTPU({**base, "tr_parallel": True}).predict()
    df_single = NisqaTPU({**base, "tr_parallel": False}).predict()
    assert np.allclose(
        df_par.mos_pred.to_numpy(), df_single.mos_pred.to_numpy(), atol=1e-5
    )


def test_train_data_parallel(tmp_path):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from nisqa_tpu.model import NisqaTPU

    names = _write_corpus(tmp_path, n=6)
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {"filename": names, "db": ["T"] * 4 + ["V"] * 2,
         "mos": rng.uniform(1, 5, len(names)).round(2)}
    )
    df.to_csv(tmp_path / "corpus.csv", index=False)
    args = {
        **TINY_ARGS,
        "mode": "main",
        "pretrained_model": False,
        "data_dir": str(tmp_path),
        "output_dir": str(tmp_path / "out"),
        "csv_file": "corpus.csv",
        "csv_deg": "filename",
        "csv_mos_train": "mos",
        "csv_mos_val": "mos",
        "csv_db_train": ["T"],
        "csv_db_val": ["V"],
        "csv_con": None,
        "tr_epochs": 1,
        "tr_early_stop": 5,
        "tr_bs": 3,  # ragged: pads to 8 across the mesh
        "tr_bs_val": 2,
        "tr_lr": 1e-3,
        "tr_lr_patience": 15,
        "tr_num_workers": 0,
        "tr_parallel": True,
        "tr_checkpoint": "best_only",
        "tr_verbose": 0,
        "tr_bias_mapping": None,
        "tr_bias_min_r": None,
        "tr_bias_anchor_db": None,
        "seed": 0,
    }
    runner = NisqaTPU(args)
    runner.train()  # must run through; NaN-padded rows drop out of the loss


def test_finetune_warm_start(tmp_path):
    """pretrained_model + mode=main: checkpoint args are the base config and
    training continues from its weights (`NISQA_model.py:940-942`)."""
    from nisqa_tpu.model import NisqaTPU

    names = _write_corpus(tmp_path, n=6)
    ckpt = _make_ckpt(tmp_path)
    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {"filename": names, "db": ["T"] * 4 + ["V"] * 2,
         "mos": rng.uniform(1, 5, len(names)).round(2)}
    )
    df.to_csv(tmp_path / "corpus.csv", index=False)
    args = {
        "mode": "main",
        "name": "finetune",
        "pretrained_model": ckpt,
        "data_dir": str(tmp_path),
        "output_dir": str(tmp_path / "out"),
        "csv_file": "corpus.csv",
        "csv_deg": "filename",
        "csv_mos_train": "mos",
        "csv_mos_val": "mos",
        "csv_db_train": ["T"],
        "csv_db_val": ["V"],
        "csv_con": None,
        "tr_epochs": 1,
        "tr_early_stop": 5,
        "tr_bs": 3,
        "tr_bs_val": 2,
        "tr_lr": 1e-4,
        "tr_lr_patience": 15,
        "tr_num_workers": 0,
        "tr_parallel": False,
        "tr_checkpoint": "best_only",
        "tr_verbose": 0,
        "tr_bias_mapping": None,
        "tr_bias_min_r": None,
        "tr_bias_anchor_db": None,
        "seed": 0,
    }
    runner = NisqaTPU(args)
    # architecture hyperparams came from the checkpoint, not defaults
    assert runner.model_args["td_sa_d_model"] == TINY_ARGS["td_sa_d_model"]
    runner.train()


def test_async_fetch_under_mesh_matches_single(tmp_path):
    """fetch="async" on a mesh-sharded engine: deferred handles resolve to
    the same outputs as an unsharded sync pass (gather of the sharded
    result happens inside the handle)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from nisqa_tpu.compat.torch_ckpt import load_model_from_tar
    from nisqa_tpu.data.pipeline import InferenceEngine, MsConfig
    from nisqa_tpu.parallel.mesh import make_mesh

    names = _write_corpus(tmp_path, n=8)
    paths = [str(tmp_path / n) for n in names]
    ckpt = _make_ckpt(tmp_path)
    model, params, state, args = load_model_from_tar(ckpt)
    y_ref = InferenceEngine(model, params, state, MsConfig(args),
                            batch_size=8, num_workers=0).predict_paths(paths)
    eng = InferenceEngine(model, params, state, MsConfig(args),
                          batch_size=8, num_workers=0, mesh=make_mesh())
    h_cold = eng.predict_paths(paths, fetch="async")
    y_cold = h_cold()
    h1 = eng.predict_paths(paths, fetch="async")
    h2 = eng.predict_paths(paths, fetch="async")  # dispatch before resolve
    np.testing.assert_allclose(y_cold, y_ref, atol=1e-5)
    np.testing.assert_allclose(h1(), y_ref, atol=1e-5)
    np.testing.assert_allclose(h2(), y_ref, atol=1e-5)


def test_partial_cache_under_mesh_matches_single(tmp_path):
    """PARTIAL cache regime on a mesh-sharded engine (corpus > cache_mb):
    resident batches serve from sharded mel blocks, the cold tail re-fills
    with sharded device_put — outputs must match the unsharded engine and
    stay bit-stable across passes."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from nisqa_tpu.compat.torch_ckpt import load_model_from_tar
    from nisqa_tpu.data.pipeline import InferenceEngine, MsConfig
    from nisqa_tpu.parallel.mesh import make_mesh

    names = _write_corpus(tmp_path, n=12)
    paths = [str(tmp_path / n) for n in names]
    ckpt = _make_ckpt(tmp_path)
    model, params, state, args = load_model_from_tar(ckpt)
    y_ref = InferenceEngine(model, params, state, MsConfig(args),
                            batch_size=4, num_workers=0).predict_paths(paths)

    # size the cap off an uncapped mesh engine's resident entry so exactly
    # one batch block fits (same trick as test_engine_cache partial tests)
    probe = InferenceEngine(model, params, state, MsConfig(args),
                            batch_size=4, num_workers=0, mesh=make_mesh(),
                            cache_mb=256)
    probe.predict_paths(paths)
    sizes = [sum(a.nbytes for a in a_args) for _, _, a_args in
             next(iter(probe._corpus_cache.values()))["batches"]]
    # the mesh rounds batch_size up to a device multiple (4 -> 8): 2 blocks
    assert len(sizes) == 2  # ceil(12/8)

    eng = InferenceEngine(model, params, state, MsConfig(args),
                          batch_size=4, num_workers=0, mesh=make_mesh(),
                          cache_mb=(sizes[0] + 1) / (1 << 20))
    y1 = eng.predict_paths(paths)
    entry = next(iter(eng._corpus_cache.values()))
    assert entry["batches"] and entry["cold"]
    y2 = eng.predict_paths(paths)
    assert eng.stats["last"]["mode"] == "cached_partial"
    y3 = eng.predict_paths(paths)
    np.testing.assert_allclose(y1, y_ref, atol=1e-5)
    np.testing.assert_allclose(y2, y_ref, atol=1e-5)
    np.testing.assert_array_equal(y2, y3)
