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


def fsdp_spec(x, mesh: Mesh, min_size: int = 2**16) -> P:
    """ZeRO-3/FSDP-style PartitionSpec for one param leaf: shard the largest
    axis divisible by the mesh's data-axis size; small leaves replicate.

    For SD-512-scale models a v5e chip is memory-tight with Adam state in
    fp32 (SURVEY.md §2 parallelism table: 'optional FSDP for SD-512 if
    memory-bound'); sharding params+opt state over the data axis trades an
    all-gather per layer (over ICI) for 1/N memory."""
    n = mesh.shape[DATA_AXIS]
    if x.size < min_size:
        return P()
    dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
    for d in dims:
        if x.shape[d] % n == 0:
            spec = [None] * x.ndim
            spec[d] = DATA_AXIS
            return P(*spec)
    return P()


def fsdp_sharding(mesh: Mesh, tree, min_size: int = 2**16):
    """NamedSharding tree for params/opt-state leaves under FSDP."""
    return jax.tree.map(
        lambda x: NamedSharding(mesh, fsdp_spec(x, mesh, min_size)), tree
    )
