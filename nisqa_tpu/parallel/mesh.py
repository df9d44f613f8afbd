"""Device mesh + sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel``
(`/root/reference/nisqa/NISQA_model.py:56-57,88-89,239-240`). The TPU-native
equivalent is a 1-D data mesh: batches shard over the 'data' axis (ICI),
parameters replicate, and XLA inserts the gradient psum — no custom comm
backend (SURVEY.md §2.5). The model is ~253k params, so tensor/pipeline
parallelism would be pure overhead; the mesh abstraction still permits
multi-host growth by reshaping the axis.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    s = data_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]
