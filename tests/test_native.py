"""Native (C++) collation kernel tests: the ctypes-backed fast path must be
bit-identical to the pure-Python implementation in data/grid.py."""

import numpy as np
import pytest

import conftest  # noqa: F401

from njode_tpu import native
from njode_tpu.data import grid

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _python_union_grid(obs_times, delta_t, T, max_steps):
    """The pure-Python reference path (bypasses the native fast path)."""
    obs_times = np.asarray(obs_times, dtype=np.float64)
    tol = 1e-10 * delta_t
    times, dts = [], []
    obs_idx = np.full(len(obs_times), -1, dtype=np.int64)
    current = 0.0
    for i, ot in enumerate(obs_times):
        if ot > T + 1e-10:
            break
        while current < ot - tol:
            d = delta_t if current < ot - delta_t else ot - current
            current = current + d
            times.append(current)
            dts.append(d)
        obs_idx[i] = len(times) - 1
    while current < T - tol:
        d = delta_t if current < T - delta_t else T - current
        current = current + d
        times.append(current)
        dts.append(d)
    times = np.asarray(times, np.float64)
    dts = np.asarray(dts, np.float64)
    pad = max_steps - len(times)
    assert pad >= 0
    return (np.concatenate([times, np.full(pad, T)]),
            np.concatenate([dts, np.zeros(pad)]), obs_idx)


@pytest.mark.parametrize("case", [
    # grid-aligned
    dict(times=[0.1, 0.3, 0.5, 1.0], dt=0.1, T=1.0, ms=10),
    # off-grid with fractional steps and offset resumption
    dict(times=[0.013, 0.25, 0.254, 0.777, 1.0], dt=0.1, T=1.0, ms=30),
    # observation beyond T gets dropped
    dict(times=[0.2, 0.9, 1.5], dt=0.25, T=1.0, ms=20),
])
def test_union_grid_matches_python(case):
    nat = native.build_union_grid(case["times"], case["dt"], case["T"],
                                  case["ms"])
    assert nat is not None
    n_times, n_dts, n_idx, k = nat
    p_times, p_dts, p_idx = _python_union_grid(case["times"], case["dt"],
                                               case["T"], case["ms"])
    assert np.array_equal(n_times, p_times)
    assert np.array_equal(n_dts, p_dts)
    assert np.array_equal(n_idx, p_idx)
    assert k == int((p_dts > 0).sum())


def test_union_grid_overflow_returns_none():
    assert native.build_union_grid([0.013, 0.5], 0.1, 1.0, 3) is None


@pytest.mark.parametrize("with_M", [False, True])
def test_batch_from_events_native_matches_python(with_M, monkeypatch):
    rs = np.random.RandomState(0)
    B, D, steps = 7, 3, 25
    dt = 1.0 / steps
    paths = rs.lognormal(0, 0.3, (B, D, steps + 1))
    observed = (rs.random((B, steps + 1)) < 0.3).astype(np.int64)
    observed[0, steps] = 1
    ev = grid.events_from_paths(paths, observed, dt)
    M = (rs.randint(0, 2, ev["X"].shape).astype(np.float32)
         if with_M else None)

    b_nat = grid.batch_from_events(ev["times"], ev["time_ptr"], ev["X"],
                                   ev["obs_idx"], dt, 1.0, ev["start_X"],
                                   M=M, max_steps=steps + 5)
    # force the python path
    monkeypatch.setattr(native, "densify_events", lambda *a, **k: None)
    monkeypatch.setattr(native, "build_union_grid", lambda *a, **k: None)
    b_py = grid.batch_from_events(ev["times"], ev["time_ptr"], ev["X"],
                                  ev["obs_idx"], dt, 1.0, ev["start_X"],
                                  M=M, max_steps=steps + 5)
    for name in grid.GridBatch._fields:
        a, b = getattr(b_nat, name), getattr(b_py, name)
        assert np.allclose(a, b), name


def test_batch_from_paths_native_matches_python(monkeypatch):
    rs = np.random.RandomState(3)
    B, D, steps = 9, 2, 30
    paths = rs.lognormal(0, 0.3, (B, D, steps + 1))
    observed = (rs.random((B, steps + 1)) < 0.25).astype(np.int64)
    b_nat = grid.batch_from_paths(paths, observed, 1.0 / steps)
    monkeypatch.setattr(native, "densify_paths", lambda *a, **k: None)
    b_py = grid.batch_from_paths(paths, observed, 1.0 / steps)
    for name in grid.GridBatch._fields:
        assert np.allclose(getattr(b_nat, name), getattr(b_py, name)), name


def test_t0_observation_leading_zero_step():
    """Observations at t=0 create a leading dt=0 step (jump before any
    propagation, as the reference event loop does) — native and python."""
    for builder in (native.build_union_grid, None):
        if builder is not None:
            res = builder([0.0, 0.3, 1.0], 0.1, 1.0, 20)
            assert res is not None
            times, dts, obs_step, k = res
        else:
            times, dts, obs_step = grid.build_union_grid(
                [0.0, 0.3, 1.0], 0.1, 1.0)
            k = int((np.asarray(dts) > 0).sum()) + 1
        assert times[0] == 0.0 and dts[0] == 0.0
        assert obs_step[0] == 0
        assert dts[1] > 0
    # end-to-end: the t=0 event lands in the dense batch
    ev = {
        "times": np.array([0.0, 0.5]),
        "time_ptr": np.array([0, 1, 2]),
        "X": np.array([[1.0], [2.0]], np.float32),
        "M": None,
        "obs_idx": np.array([0, 0]),
    }
    b = grid.batch_from_events(ev["times"], ev["time_ptr"], ev["X"],
                               ev["obs_idx"], 0.5, 1.0,
                               np.zeros((1, 1), np.float32))
    b = grid.recompute_n_obs(b)
    assert b.n_obs_ot[0] == 2
    assert b.obs[0, 0] == 1 and float(b.X[0, 0, 0]) == 1.0
    assert grid.validate_batch(b) == []


def test_sparse_densify_matches_dense_bridge():
    """SparseBatch + on-device densify must equal the host dense bridge."""
    import jax
    import jax.numpy as jnp
    rs = np.random.RandomState(2)
    B, D, steps = 6, 3, 18
    dt = 1.0 / steps
    paths = rs.lognormal(0, 0.3, (B, D, steps + 1))
    observed = (rs.random((B, steps + 1)) < 0.3).astype(np.int64)
    observed[0, steps] = 1
    ev = grid.events_from_paths(paths, observed, dt)
    ev = {**ev, "M": rs.randint(0, 2, ev["X"].shape).astype(np.float32),
          "batch_size": B}
    max_steps = steps + 4
    dense = grid.batch_from_events(
        ev["times"], ev["time_ptr"], ev["X"], ev["obs_idx"], dt, 1.0,
        np.zeros((B, D), np.float32), M=ev["M"], max_steps=max_steps)
    dense = grid.recompute_n_obs(dense)
    sb = grid.sparse_from_events(ev, dt, 1.0, max_steps,
                                 max_events=len(ev["obs_idx"]) + 5)
    out = jax.jit(lambda s: grid.densify_sparse(s, B))(
        jax.tree.map(jnp.asarray, sb))
    for name in grid.GridBatch._fields:
        assert np.allclose(np.asarray(getattr(out, name)),
                           getattr(dense, name)), name
