"""Device-mesh utilities: data-parallel training over ICI.

The reference has no distributed backend (SURVEY §2.17) — its only
parallelism is a joblib process pool over independent runs. Here data
parallelism is first-class: a 1-D ``Mesh`` over the 'data' axis, batch
tensors sharded along it, parameters replicated; XLA inserts the gradient
all-reduce (psum) over ICI automatically from the jitted loss.

Multi-host: call :func:`initialize_distributed` once per process before
creating the mesh; the same code then spans slices over DCN."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs):
    """Multi-host initialization (no-op on a single host)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        pass  # already initialized or single-process


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_params(params, mesh: Mesh):
    """Replicate a parameter pytree across the mesh."""
    return jax.device_put(params, replicated(mesh))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Shard a GridBatch along the batch dimension.

    GridBatch layout is time-major: per-step arrays shard on axis 1
    (``obs [K, B]``, ``X/M [K, B, D]``), per-row arrays on axis 0
    (``start_X [B, D]``, ``n_obs_ot [B]``); the shared grid
    (``times/dt [K]``) is replicated.
    """
    s_row = NamedSharding(mesh, P(axis))
    s_col1 = NamedSharding(mesh, P(None, axis))
    s_rep = NamedSharding(mesh, P())
    return batch._replace(
        times=jax.device_put(batch.times, s_rep),
        dt=jax.device_put(batch.dt, s_rep),
        obs=jax.device_put(batch.obs, s_col1),
        X=jax.device_put(batch.X, s_col1),
        M=jax.device_put(batch.M, s_col1),
        start_X=jax.device_put(batch.start_X, s_row),
        n_obs_ot=jax.device_put(batch.n_obs_ot, s_row),
    )
