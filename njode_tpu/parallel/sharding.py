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


def make_mesh_2d(n_devices: Optional[int] = None, model_parallel: int = 1,
                 axes=("data", "model")) -> Mesh:
    """2-D (data x model) mesh for combined DP + TP."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axes)


def ffnn_tp_specs(layer_list, axis: str = "model", axis_size: int = 1):
    """Megatron-style tensor-parallel PartitionSpecs for an MLP layer list.

    Alternating column-/row-parallel Linears: even layers shard the output
    dim (bias sharded with it), odd layers shard the input dim (bias
    replicated) — XLA GSPMD inserts the all-reduces. The reference has no
    TP (largest net is a 400-wide MLP, SURVEY §2.16); these are the
    sharding-rule hooks that let wide nets shard naturally under pjit.
    Dimensions not divisible by the axis size stay replicated (e.g. the
    1-wide readout output).
    """
    specs = []
    for i, layer in enumerate(layer_list):
        w = layer["w"].shape
        if i % 2 == 0 and w[1] % axis_size == 0:
            s = {"w": P(None, axis)}
            if "b" in layer:
                s["b"] = P(axis)
        elif i % 2 == 1 and w[0] % axis_size == 0:
            s = {"w": P(axis, None)}
            if "b" in layer:
                s["b"] = P()
        else:
            s = {"w": P()}
            if "b" in layer:
                s["b"] = P()
        specs.append(s)
    return specs


def njode_tp_sharding(params, mesh: Mesh, axis: str = "model"):
    """NamedSharding pytree for NJODE params: MLP stacks tensor-parallel,
    everything else (jump GRU) replicated."""
    axis_size = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    specs = {}
    for name in ("ode_f", "encoder", "readout"):
        specs[name] = ffnn_tp_specs(params[name], axis, axis_size)
    if "gru" in params:
        specs["gru"] = jax.tree.map(lambda _: P(), params["gru"])
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def constrain_batch(batch, mesh: Mesh, axis: str = "data"):
    """``with_sharding_constraint`` counterpart of :func:`shard_batch` for
    use INSIDE jit: pins a (possibly just-densified) GridBatch to the
    data-parallel layout so GSPMD partitions the scan over the batch axis
    and inserts the gradient all-reduce. This is how the real-data trainers
    go data-parallel — the compact SparseBatch events ship replicated
    (they are ~100x smaller than the dense tensors), the on-device
    densification output is constrained here."""
    c = jax.lax.with_sharding_constraint
    s_row = NamedSharding(mesh, P(axis))
    s_col1 = NamedSharding(mesh, P(None, axis))
    s_rep = NamedSharding(mesh, P())
    return batch._replace(
        times=c(batch.times, s_rep),
        dt=c(batch.dt, s_rep),
        obs=c(batch.obs, s_col1),
        X=c(batch.X, s_col1),
        M=c(batch.M, s_col1),
        start_X=c(batch.start_X, s_row),
        n_obs_ot=c(batch.n_obs_ot, s_row),
    )


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
