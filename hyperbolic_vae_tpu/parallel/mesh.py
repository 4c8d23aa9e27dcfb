"""Device mesh + sharding helpers.

The reference is strictly single-device (`pl.Trainer(devices=1)`
everywhere — SURVEY section 5.8); this module is where the TPU rebuild
legitimately goes beyond it: a 1-D or 2-D `jax.sharding.Mesh`
('data' [, 'model']) over ICI, with batch-sharded inputs and replicated
(or model-sharded) params. Gradient reductions are XLA-inserted psums —
no hand-written collectives at this scale.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEED_AXIS = "seed"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D data mesh by default; (data, model) 2-D when n_model > 1."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devices = devices[: n_data * n_model]
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def make_seed_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D mesh over the ENSEMBLE SEED axis (train/ensemble.py).

    Seed lanes are embarrassingly parallel — no cross-seed collectives
    exist in the vmapped chunk program — so sharding the stacked
    (S, ...) state over 'seed' partitions the whole multi-seed sweep
    across chips with zero communication: each device trains S/N full
    models. The scale-out story for the reference's real workloads
    (the _7 grid, the _9 replication study, the 8-seed parity protocol),
    which it runs strictly sequentially on one device.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (SEED_AXIS,))


def seed_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (seed/lane) axis over 'seed'."""
    return NamedSharding(mesh, P(SEED_AXIS, *([None] * (ndim - 1))))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch/sample) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    return jax.device_put(batch, data_sharding(mesh, batch.ndim))
