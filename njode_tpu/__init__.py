"""njode_tpu — a TPU-native JAX framework for Neural Jump ODEs.

Re-implements the capabilities of the NJODE reference codebase
(Herrera, Krach & Teichmann, ICLR 2021) as a TPU-first design:

- irregular observation streams are encoded as *dense masked tensors on a
  union time grid* instead of ragged ``(times, time_ptr, X, obs_idx)`` event
  lists (reference: ``NJODE/data_utils.py:278-316``),
- the sequential per-observation Python loop of the reference model
  (``NJODE/models.py:379-518``) becomes a single ``jax.lax.scan``,
- SDE path simulation (``NJODE/stock_model.py``) is vectorized with
  ``lax.scan`` over steps and batched over paths on device,
- training runs as a jitted, data-parallel step over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

from njode_tpu.data import sde, grid, oracle, datasets  # noqa: F401
from njode_tpu.models import njode  # noqa: F401

# Subpackage map (imported lazily by users to keep import time low):
#   njode_tpu.models.gru_ode_bayes   baseline model family
#   njode_tpu.data.climate/.physionet  real-data pipelines
#   njode_tpu.training.trainer/.climate_trainer/.physionet_trainer
#   njode_tpu.training.sweeps        hyperparameter-sweep orchestration
#   njode_tpu.training.checkpoints   msgpack + orbax(async) backends
#   njode_tpu.training.torch_compat  reference-checkpoint importer
#   njode_tpu.experiments.configs    canonical paper-experiment grids
#   njode_tpu.analysis.extras        overview/CV/convergence/plot tooling
#   njode_tpu.ops.fused_scan         fused Pallas training kernel
#   njode_tpu.ops.odeint             ODE-solver library (incl. dopri5)
#   njode_tpu.parallel.sharding/.multihost  mesh + multi-host utilities
#   njode_tpu.native                 C++ collation kernels (ctypes)
