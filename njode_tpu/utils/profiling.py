"""Tracing / profiling and numerical-anomaly subsystems (SURVEY §5).

The reference's observability is wall-clock timing columns plus a
``torch.autograd.set_detect_anomaly`` switch (``train.py:75,201-205,489-527``).
TPU-native equivalents:

- :func:`trace`: a ``jax.profiler`` trace capture around any code block —
  the trainers accept ``profile_dir=<path>`` and trace their first epoch,
- :class:`StepTimer`: steps/sec and paths/sec with device synchronization
  (``block_until_ready``) so timings measure compute, not dispatch,
- :func:`enable_anomaly_detection`: ``jax_debug_nans``/``jax_debug_infs`` —
  the functional-purity replacement for autograd anomaly mode (the in-place
  mutation hazards the reference guards against cannot exist here).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir=None):
    """Capture a jax.profiler trace into ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(str(log_dir)):
        yield


def enable_anomaly_detection(nans: bool = True, infs: bool = False,
                             deterministic_seed=None):
    """Reference ``ANOMALY_DETECTION`` switch (``train.py:201-205``):
    fail fast on non-finite values; optionally fix global seeds."""
    import jax
    jax.config.update("jax_debug_nans", bool(nans))
    jax.config.update("jax_debug_infs", bool(infs))
    if deterministic_seed is not None:
        import numpy as np
        np.random.seed(int(deterministic_seed))


class StepTimer:
    """Synchronized throughput tracking: paths/sec and steps/sec."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = None
        self.steps = 0
        self.items = 0

    def start(self):
        self._t0 = time.perf_counter()

    def step(self, n_items: int = 0):
        self.steps += 1
        self.items += n_items

    def stop(self, sync_on=None):
        """:param sync_on: optional array to ``block_until_ready`` on."""
        if self._t0 is None:
            raise RuntimeError("StepTimer.stop() before start()")
        if sync_on is not None:
            import jax
            jax.block_until_ready(sync_on)
        elapsed = time.perf_counter() - self._t0
        return {
            "elapsed_s": elapsed,
            "steps_per_sec": self.steps / elapsed if elapsed > 0 else 0.0,
            "items_per_sec": self.items / elapsed if elapsed > 0 else 0.0,
        }
