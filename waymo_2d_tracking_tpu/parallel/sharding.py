"""Device mesh and sharding helpers (component C28).

The reference's distributed story is NCCL via torch.distributed for DP
training (SURVEY.md §2.3 [INFERRED]) and embarrassingly-parallel per-segment
inference. TPU-native replacement: one ``jax.sharding.Mesh`` over the slice;
XLA inserts the collectives (grad psum over ICI) from sharding annotations —
no custom comm backend (scaling-book recipe: pick a mesh, annotate
shardings, let XLA do the rest).

Axes: 'data' is the only active axis at v5e-8 scale (batch for training,
segments/cameras for inference). A 'model' axis is reserved in the mesh
constructor so tensor parallelism is a config change, not a rewrite
(SURVEY.md §2.2 — not needed for ResNet-50-scale models).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh of shape (data, model). model_parallel=1 => pure DP."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """device_put a host pytree with its leading axis sharded over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params, opt state) across the mesh."""
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
