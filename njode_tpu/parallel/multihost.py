"""Multi-host coordination for the filesystem registry and metrics sinks.

The reference's cross-process artifacts are CSVs on a shared filesystem
written by joblib workers — an unguarded race surface it sidesteps by
pre-assigning ids before forking (SURVEY §5/§2.17). In a multi-host TPU job
every process runs the same program, so registry and metric writes must be
(a) performed once and (b) agreed on by all hosts. This module provides
that: process 0 performs the host-side effect, the result is broadcast over
the JAX distributed runtime (``jax.experimental.multihost_utils``), and a
barrier keeps hosts in step. Everything degrades to plain local execution
in a single-process run, so the trainers can call these unconditionally.
"""

from __future__ import annotations

import jax
import numpy as np


def process_index() -> int:
    return jax.process_index()


def is_coordinator() -> bool:
    """True on the process that owns filesystem side effects."""
    return jax.process_index() == 0


def barrier(name: str = "njode_barrier"):
    """Block until all hosts arrive (no-op single-process)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def broadcast_from_coordinator(value):
    """Broadcast a (pytree of) host value(s) from process 0 to all hosts."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(value)


def coordinator_only(fn, *args, **kwargs):
    """Run a side-effecting ``fn`` (registry/metric/file writes) on process
    0 only, then synchronize. The return value is coordinator-local (None on
    other hosts) — to agree on a VALUE across hosts use
    :func:`broadcast_from_coordinator` with an explicit placeholder, or
    :func:`resolve_model_id_synced`."""
    result = fn(*args, **kwargs) if is_coordinator() else None
    barrier("coordinator_only")
    return result


def resolve_model_id_synced(saved_models_path, model_id, desc):
    """Multi-host-safe version of ``registry.resolve_model_id``: process 0
    touches ``model_overview.csv``; every host gets the same
    (model_id, resume) decision. The (potentially long) description is
    re-read from the registry locally after the barrier rather than
    broadcast."""
    from njode_tpu.training import registry

    if jax.process_count() == 1:
        return registry.resolve_model_id(saved_models_path, model_id, desc)

    if is_coordinator():
        mid, _, _, resume = registry.resolve_model_id(
            saved_models_path, model_id, desc)
        payload = np.asarray([int(mid), int(resume)], np.int64)
    else:
        payload = np.zeros(2, np.int64)
    payload = broadcast_from_coordinator(payload)
    barrier("resolve_model_id")
    mid, resume = int(payload[0]), bool(payload[1])
    # shared filesystem: every host can now read the registered description
    df = registry.load_overview(saved_models_path)
    saved_desc = (df["description"].loc[df["id"] == mid]).values[0]
    import json
    return (mid, saved_desc, json.loads(saved_desc) if resume else None,
            resume)
