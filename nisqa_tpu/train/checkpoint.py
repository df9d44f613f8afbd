"""Checkpointing: native full-train-state + reference-format export.

The reference stores torch pickle ``.tar`` dicts and, on load, restores only
model weights — optimizer state is saved but never restored
(`/root/reference/nisqa/NISQA_model.py:1096-1106`, `:1023`; SURVEY.md §5).
Here every save produces:
  * ``<name>.tar``   — reference-format torch checkpoint (drop-in loadable by
                       the PyTorch NISQA *and* by this framework), and
  * ``<name>.msgpack`` — native full train state (params, BN state, optimizer
                       state, epoch, bias-loss coefficients) enabling exact
                       resume, which the reference cannot do.
"""

from __future__ import annotations

import json
import os

import numpy as np


def _to_state_dict(tree):
    from flax import serialization

    return serialization.to_bytes(tree)


def save_train_state(path_base: str, model, params, bn_state, opt_state, args: dict,
                     epoch: int, bias_b=None, results=None, loop_state=None):
    from flax import serialization

    from ..compat.torch_ckpt import save_torch_checkpoint

    extra = {"epoch": epoch + 1}
    if results is not None:
        extra["results"] = {k: str(v) for k, v in results.items()}
    clean_args = {k: v for k, v in args.items() if k != "now"}
    save_torch_checkpoint(path_base + ".tar", model, params, bn_state, clean_args, extra)

    native = {
        "params": params,
        "bn_state": bn_state,
        "opt_state": opt_state,
        "bias_b": np.asarray(bias_b) if bias_b is not None else np.zeros((0, 4), np.float32),
    }
    with open(path_base + ".msgpack", "wb") as f:
        f.write(serialization.to_bytes(native))
    meta = {"epoch": epoch + 1, "model": model.name}
    if loop_state:
        # LR-plateau scheduler + early-stopper state: without these a resume
        # silently jumps the LR back to tr_lr and resets stop tracking
        meta["loop_state"] = loop_state
    with open(path_base + ".meta.json", "w") as f:
        json.dump(meta, f, default=str)


def load_train_state(path_base: str, template: dict) -> dict:
    """Restore a native checkpoint into ``template``-shaped pytrees."""
    from flax import serialization

    with open(path_base + ".msgpack", "rb") as f:
        data = f.read()
    restored = serialization.from_bytes(template, data)
    meta = {}
    meta_path = path_base + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    restored["meta"] = meta
    return restored
