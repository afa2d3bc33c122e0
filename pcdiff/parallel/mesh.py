"""Device mesh construction and sharding helpers.

The reference's only distribution strategy is data parallelism over NCCL/DDP
(``/root/reference/train.py:84-132,243-247``; SURVEY.md section 2.5). The
TPU-native equivalent: a 1-D ``jax.sharding.Mesh`` over all chips, batch
sharded on the ``data`` axis, params/optimizer state replicated; gradient
all-reduce is inserted by XLA under SPMD jit and rides ICI. The mesh shape is
expressed ``(data, model)`` so tensor-parallel axes can be introduced without
changing call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "local_batch_slice",
    "fold_in_process",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data_parallel: Optional[int] = None,
    model_parallel: int = 1,
) -> Mesh:
    """A (data, model) mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel is None:
        assert n % model_parallel == 0
        data_parallel = n // model_parallel
    assert data_parallel * model_parallel == n, (data_parallel, model_parallel, n)
    grid = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the data axis; rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put every array in a batch pytree with the batch axis sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated over the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def local_batch_slice(global_batch: int) -> slice:
    """This host's slice of a globally indexed batch (the
    ``DistributedSampler`` equivalent: shard by ``jax.process_index()``)."""
    n_proc = jax.process_count()
    assert global_batch % n_proc == 0
    per = global_batch // n_proc
    idx = jax.process_index()
    return slice(idx * per, (idx + 1) * per)


def fold_in_process(key: jax.Array) -> jax.Array:
    """Per-host RNG stream (the reference's seed+rank offset, train.py:119)."""
    return jax.random.fold_in(key, jax.process_index())
