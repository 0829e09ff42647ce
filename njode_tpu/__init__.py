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

from njode_tpu.data import sde, grid, oracle  # noqa: F401
from njode_tpu.models import njode  # noqa: F401
