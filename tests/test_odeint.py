"""ODE-solver library tests: accuracy on closed-form problems, convergence
order, adaptive tolerances, and the GRU-ODE-Bayes dopri5 path."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from njode_tpu.ops import odeint


def test_exponential_decay_all_methods():
    """dy/dt = -y, y(0)=1 -> y(t)=exp(-t)."""
    ts = jnp.linspace(0.0, 2.0, 21)
    y0 = jnp.ones((3,))
    exact = np.exp(-np.asarray(ts))[:, None] * np.ones(3)
    tols = {"euler": 1e-1, "midpoint": 5e-3, "heun": 5e-3, "rk4": 1e-5,
            "dopri5_fixed": 1e-6, "dopri5": 1e-5}
    for method, tol in tols.items():
        ys = odeint.odeint(lambda t, y: -y, y0, ts, method=method)
        err = np.abs(np.asarray(ys) - exact).max()
        assert err < tol, (method, err)


def test_harmonic_oscillator_dopri5():
    """y'' = -y as a 2-d system; adaptive dopri5 stays accurate over many
    periods."""
    def f(t, y):
        return jnp.stack([y[1], -y[0]])

    ts = jnp.linspace(0.0, 4 * np.pi, 9)
    ys = odeint.odeint(f, jnp.array([1.0, 0.0]), ts, method="dopri5",
                       rtol=1e-6, atol=1e-8)
    exact = np.stack([np.cos(np.asarray(ts)), -np.sin(np.asarray(ts))],
                     axis=1)
    assert np.abs(np.asarray(ys) - exact).max() < 1e-4


def test_fixed_grid_convergence_order():
    """Halving the step size cuts euler error ~2x and rk4 error ~16x."""
    def f(t, y):
        return -y * t  # y(t) = exp(-t^2/2)

    y0 = jnp.ones(())
    exact = float(np.exp(-0.5))
    errs = {}
    for method in ("euler", "rk4"):
        e = []
        for sub in (4, 8):
            ys = odeint.odeint(f, y0, jnp.array([0.0, 1.0]), method=method,
                               substeps=sub)
            e.append(abs(float(ys[-1]) - exact))
        errs[method] = e[0] / max(e[1], 1e-16)
    assert 1.7 < errs["euler"] < 2.4
    assert errs["rk4"] > 6.0  # f32 floor limits the observable order


def test_adaptive_tolerance_effect():
    def f(t, y):
        return jnp.sin(10.0 * t) * y

    ts = jnp.array([0.0, 3.0])
    loose = odeint.odeint(f, jnp.ones(()), ts, method="dopri5", rtol=1e-2,
                          atol=1e-3)
    tight = odeint.odeint(f, jnp.ones(()), ts, method="dopri5", rtol=1e-6,
                          atol=1e-8)
    exact = float(np.exp((1 - np.cos(30.0)) / 10.0))
    assert abs(float(tight[-1]) - exact) <= abs(float(loose[-1]) - exact) \
        + 1e-12
    assert abs(float(tight[-1]) - exact) < 1e-4


def test_unknown_method():
    with pytest.raises(ValueError):
        odeint.odeint(lambda t, y: -y, jnp.ones(3),
                      jnp.array([0.0, 1.0]), method="bogacki")


def test_gob_dopri5_runs_and_beats_euler():
    """GOB solver='dopri5': finite eval loss (adaptive integrator),
    differentiable TRAIN path (fixed RK45 step — adaptivity uses a
    while_loop, which reverse-mode AD cannot cross, so it is eval-only)."""
    from njode_tpu.data import grid
    from njode_tpu.models import gru_ode_bayes as gob

    rs = np.random.RandomState(0)
    B, D, steps = 6, 1, 12
    dt = 1.0 / steps
    paths = rs.lognormal(0, 0.3, (B, D, steps + 1))
    observed = (rs.random((B, steps + 1)) < 0.3).astype(np.int64)
    observed[0, steps] = 1
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    bj = jax.tree.map(jnp.asarray, b)

    losses = {}
    for solver in ("euler", "dopri5"):
        cfg = gob.GOBConfig(input_size=1, hidden_size=8, p_hidden=8,
                            prep_hidden=4, cov_size=1, cov_hidden=8,
                            impute=False, full_gru_ode=True, solver=solver)
        params = gob.init_params(jax.random.PRNGKey(1), cfg)
        _, loss = gob.forward(params, cfg, bj, train=False, get_loss=True)
        losses[solver] = float(loss)
        # gradients flow through the training integrator (fixed-grid)
        g = jax.grad(lambda p: gob.forward(
            p, cfg, bj, train=True, rng=jax.random.PRNGKey(0),
            get_loss=True)[1])(params)
        assert np.isfinite(
            float(jax.flatten_util.ravel_pytree(g)[0].sum()))
    assert np.isfinite(losses["dopri5"])
    assert abs(losses["dopri5"] - losses["euler"]) > 0  # different scheme


import jax.flatten_util  # noqa: E402


def test_extended_solver_registry_accuracy():
    """tsit5/adams/explicit_adams/fixed_adams on dy/dt=-y: high-order
    methods beat euler by orders of magnitude."""
    from njode_tpu.ops import odeint as oi

    f = lambda t, y: -y  # noqa: E731
    ts = np.linspace(0, 1, 9)
    y0 = jnp.ones((3,))
    errs = {}
    for m in ("euler", "tsit5_fixed", "tsit5", "adams", "explicit_adams",
              "fixed_adams"):
        ys = oi.odeint(f, y0, ts, method=m, substeps=4)
        errs[m] = abs(float(ys[-1, 0]) - np.exp(-1))
    for m in ("tsit5_fixed", "tsit5", "adams", "explicit_adams",
              "fixed_adams"):
        assert errs[m] < errs["euler"] / 100, (m, errs)


def test_adjoint_gradients_match_direct():
    """odeint_adjoint (continuous adjoint, torchdiffeq _impl/adjoint.py
    counterpart): gradients wrt y0 AND params match direct autodiff."""
    import jax.flatten_util
    from njode_tpu.ops import odeint as oi

    def func(t, y, p):
        return jnp.tanh(y @ p["A"]) + p["b"] * jnp.sin(t)

    rs = np.random.RandomState(0)
    p = {"A": jnp.asarray(rs.normal(0, 0.5, (3, 3)), jnp.float32),
         "b": jnp.asarray(0.3, jnp.float32)}
    y0 = jnp.asarray(rs.normal(0, 1, (3,)), jnp.float32)
    ts = np.linspace(0, 1, 11)

    def loss_adj(y0, p):
        ys = oi.odeint_adjoint(func, y0, ts, p, method="rk4", substeps=8)
        return jnp.sum(ys ** 2) + jnp.sum(ys[3] * 0.7)

    def loss_direct(y0, p):
        ys = oi.odeint(lambda t, y: func(t, y, p), y0, ts, method="rk4",
                       substeps=8)
        return jnp.sum(ys ** 2) + jnp.sum(ys[3] * 0.7)

    la, (ga, gpa) = jax.value_and_grad(loss_adj, argnums=(0, 1))(y0, p)
    ld, (gd, gpd) = jax.value_and_grad(loss_direct, argnums=(0, 1))(y0, p)
    assert np.allclose(float(la), float(ld), rtol=1e-6)
    assert np.allclose(np.asarray(ga), np.asarray(gd), rtol=1e-4, atol=1e-6)
    fa = jax.flatten_util.ravel_pytree(gpa)[0]
    fd = jax.flatten_util.ravel_pytree(gpd)[0]
    assert np.allclose(np.asarray(fa), np.asarray(fd), rtol=1e-3, atol=1e-5)


def test_adjoint_rejects_adaptive_methods():
    from njode_tpu.ops import odeint as oi
    with pytest.raises(ValueError, match="fixed-grid"):
        oi.odeint_adjoint(lambda t, y, p: -y, jnp.ones(2), [0.0, 1.0], {},
                          method="dopri5")
