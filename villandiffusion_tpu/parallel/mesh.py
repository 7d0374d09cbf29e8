"""Device mesh + sharding helpers (the distributed backbone).

The reference's only parallelism is single-process torch DataParallel +
Accelerate DDP (SURVEY.md §2 parallelism table, §5.8).  TPU-native
replacement: ONE `jax.sharding.Mesh` with a ``data`` axis across all chips;
the train step is jitted with the batch sharded on ``data`` and params
replicated, so XLA emits gradient all-reduces over ICI.  Sampling/measure
fan out embarrassingly parallel over the same axis.  Multi-host: works
unchanged after `jax.distributed.initialize()` (DCN handled by the runtime).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]):
    """Place a host batch dict on the mesh, sharded along the data axis."""
    sh = data_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.device_put(tree, sh)
