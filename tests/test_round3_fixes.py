"""Round-3 hygiene regressions (VERDICT.md round 2, 'What's weak' #6).

- `tr_ds_to_memory_workers` (reference `NISQA_model.py:886` -> Pool size of
  `_to_memory`, `NISQA_lib.py:2109-2127`) is honored as the corpus-preload
  thread count instead of being silently ignored.
- `_front_end` no longer carries dead parameters.
"""

import inspect
from types import SimpleNamespace

from nisqa_tpu.data.pipeline import _front_end
from nisqa_tpu.train.loop import TrainEngine


def _engine_with_args(args):
    eng = object.__new__(TrainEngine)
    eng.runner = SimpleNamespace(args=args)
    return eng


def test_preload_threads_honors_ds_to_memory_workers():
    eng = _engine_with_args({"tr_ds_to_memory_workers": 3, "tr_num_workers": 7})
    assert eng._preload_threads() == 3


def test_preload_threads_falls_back_to_num_workers():
    # reference configs ship tr_ds_to_memory_workers: 0 -> fall back
    eng = _engine_with_args({"tr_ds_to_memory_workers": 0, "tr_num_workers": 7})
    assert eng._preload_threads() == 7
    eng = _engine_with_args({})
    assert eng._preload_threads() == 4


def test_front_end_has_no_dead_params():
    params = set(inspect.signature(_front_end).parameters)
    assert params == {"ms", "sr", "t_bucket", "pallas_mel", "fe_fast", "mesh"}


def test_fe_precision_auto_follows_engine_precision(tmp_path):
    """Round-3 default: fe_precision=None resolves to 'fast' at default
    engine precision and 'exact' under precision='highest' (measured
    rationale in BASELINE.md round 3); explicit values always win."""
    from tests.test_e2e import _make_ckpt
    from nisqa_tpu.compat.torch_ckpt import load_model_from_tar
    from nisqa_tpu.data.pipeline import InferenceEngine, MsConfig

    model, params, state, args = load_model_from_tar(_make_ckpt(tmp_path))
    ms = MsConfig(args)

    def eng(**kw):
        return InferenceEngine(model, params, state, ms, num_workers=1, **kw)

    assert eng().fe_precision == "fast"
    assert eng(precision="highest").fe_precision == "exact"
    assert eng(precision="highest", fe_precision="fast").fe_precision == "fast"
    assert eng(fe_precision="exact").fe_precision == "exact"


def test_pass_stage_timings_and_prime_fetch(tmp_path):
    """The pipelined pass records its per-stage decomposition (round-3
    serving observability) and prime_fetch warmup performs the first
    readback up front; fetch=False drains without returning output."""
    import numpy as np

    from tests.test_e2e import _make_ckpt, _write_corpus
    from nisqa_tpu.compat.torch_ckpt import load_model_from_tar
    from nisqa_tpu.data.pipeline import InferenceEngine, MsConfig

    names = _write_corpus(tmp_path, n=5)
    model, params, state, args = load_model_from_tar(_make_ckpt(tmp_path))
    eng = InferenceEngine(model, params, state, MsConfig(args), batch_size=2,
                          num_workers=1)
    paths = [str(tmp_path / n) for n in names]
    eng.warmup(paths, prime_fetch=True)

    assert eng.predict_paths(paths, fetch=False) is None
    assert eng.stats["last"]["mode"] == "interleaved"
    assert eng.predict_paths(paths, fetch=False) is None
    assert eng.stats["last"]["mode"] == "cached"  # drain populated the cache
    # cold-pass stage decomposition keys (skip the cached fast path)
    eng2 = InferenceEngine(model, params, state, MsConfig(args), batch_size=2,
                           num_workers=1, cache_mb=0)
    y = eng2.predict_paths(paths)
    assert np.isfinite(y).all()
    last = eng2.stats["last"]
    assert last["mode"] == "interleaved"
    for k in ("scan_plan_s", "fill_s", "wait_s", "dispatch_s", "block_s",
              "fetch_s", "wall_s"):
        assert k in last and last[k] >= 0.0, (k, last)


def test_profile_dir_captures_trace(tmp_path):
    """SURVEY §5 tracing: args['profile_dir'] wraps predict AND train in a
    jax.profiler trace that writes a device trace to disk (the reference
    has no tracing at all)."""
    import os

    import numpy as np
    import pandas as pd

    from tests.test_e2e import TINY_ARGS, _make_ckpt, _write_corpus
    from nisqa_tpu.model import NisqaTPU

    names = _write_corpus(tmp_path, n=6)
    ckpt = _make_ckpt(tmp_path)

    def trace_files(d):
        return [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]

    prof = tmp_path / "prof"
    args = {
        "mode": "predict_file",
        "pretrained_model": ckpt,
        "deg": str(tmp_path / names[0]),
        "output_dir": None,
        "tr_bs_val": 1,
        "tr_num_workers": 0,
        "name": "tiny",
        "profile_dir": str(prof),
    }
    NisqaTPU(args).predict()
    assert trace_files(prof), "predict under profile_dir wrote no trace"

    # training runs must trace too
    rng = np.random.default_rng(3)
    pd.DataFrame({
        "filename": names, "db": ["T"] * 4 + ["V"] * 2,
        "mos": rng.uniform(1, 5, len(names)).round(2),
    }).to_csv(tmp_path / "corpus.csv", index=False)
    prof_tr = tmp_path / "prof_train"
    targs = {
        **TINY_ARGS,
        "mode": "main", "pretrained_model": False,
        "data_dir": str(tmp_path), "output_dir": str(tmp_path / "out"),
        "csv_file": "corpus.csv", "csv_deg": "filename",
        "csv_mos_train": "mos", "csv_mos_val": "mos",
        "csv_db_train": ["T"], "csv_db_val": ["V"], "csv_con": None,
        "tr_epochs": 1, "tr_early_stop": 5, "tr_bs": 3, "tr_bs_val": 2,
        "tr_lr": 1e-3, "tr_lr_patience": 15, "tr_num_workers": 0,
        "tr_parallel": False, "tr_checkpoint": "best_only", "tr_verbose": 0,
        "tr_bias_mapping": None, "tr_bias_min_r": None,
        "tr_bias_anchor_db": None, "seed": 0,
        "profile_dir": str(prof_tr),
    }
    NisqaTPU(targs).train()
    assert trace_files(prof_tr), "train under profile_dir wrote no trace"


def test_too_long_file_raises_actionable_error_on_every_path(tmp_path):
    """Over-max-length files raise the reference's actionable
    ms_max_segments error (`NISQA_lib.py:2274-2280`) from BOTH training
    paths (host-fill and device-resident) and from serving — previously the
    host-fill path died with a bare StopIteration from bucket selection."""
    import numpy as np
    import pandas as pd
    import pytest

    from nisqa_tpu.audio.wav import write_wav
    from nisqa_tpu.data.pipeline import MsConfig
    from tests.test_e2e import TINY_ARGS

    # TINY_ARGS: max_segments=64, seg 7/hop 2, 10 ms frames -> a 2 s clip at
    # 8 kHz has ~98 windows, over the cap
    sr = 8000
    t = np.arange(2 * sr) / sr
    write_wav(str(tmp_path / "long.wav"), (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32), sr)

    ms = MsConfig(TINY_ARGS)
    with pytest.raises(ValueError, match="ms_max_segments"):
        ms.bucket_for(98)

    df = pd.DataFrame({"filename": ["long.wav"] * 4, "db": ["T", "T", "T", "V"],
                       "mos": [3.0, 3.5, 4.0, 3.2]})
    df.to_csv(tmp_path / "c.csv", index=False)
    base = {
        **TINY_ARGS, "mode": "main", "pretrained_model": False,
        "data_dir": str(tmp_path), "output_dir": str(tmp_path / "out"),
        "csv_file": "c.csv", "csv_deg": "filename",
        "csv_mos_train": "mos", "csv_mos_val": "mos",
        "csv_db_train": ["T"], "csv_db_val": ["V"], "csv_con": None,
        "tr_epochs": 1, "tr_early_stop": 50, "tr_bs": 2, "tr_bs_val": 2,
        "tr_lr": 1e-3, "tr_lr_patience": 15, "tr_num_workers": 0,
        "tr_parallel": False, "tr_checkpoint": "best_only", "tr_verbose": 0,
        "tr_bias_mapping": None, "tr_bias_min_r": None,
        "tr_bias_anchor_db": None, "seed": 0,
    }
    from nisqa_tpu.model import NisqaTPU

    for to_mem in (False, True):
        with pytest.raises(ValueError, match="ms_max_segments"):
            NisqaTPU({**base, "tr_ds_to_memory": to_mem}).train()
