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
