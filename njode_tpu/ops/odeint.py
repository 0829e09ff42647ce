"""ODE solvers as compiler-friendly JAX primitives.

Capability counterpart of the reference's vendored torchdiffeq
(``/root/reference/GRU_ODE_Bayes/torchdiffeq/``, SURVEY §2.12): solver
registry {euler, midpoint, heun, rk4, dopri5}, fixed-grid steppers, and an
adaptive Dormand-Prince(4)5 integrator with PI step-size control. The
reference's copy is runtime-dead (its only import site is commented out);
here the module is live: :func:`dopri5_step` backs the GRU-ODE-Bayes
``solver='dopri5'`` configuration (one high-order step per grid interval —
differentiable, static-shape) and :func:`odeint` provides the standalone
integration API.

TPU-first design notes: fixed-grid methods are ``lax.scan`` over segments;
the adaptive path is a ``lax.while_loop`` per segment (bounded by
``max_steps``) — use it for evaluation/simulation; for training prefer the
fixed-grid methods (reverse-mode AD through ``while_loop`` is undefined).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Dormand-Prince 5(4) Butcher tableau
_DP_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DP_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DP_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DP_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
          187 / 2100, 1 / 40)


def euler_step(func, t, y, dt):
    return y + dt * func(t, y)


def midpoint_step(func, t, y, dt):
    k = func(t, y)
    return y + dt * func(t + dt / 2.0, y + dt / 2.0 * k)


def heun_step(func, t, y, dt):
    k1 = func(t, y)
    k2 = func(t + dt, y + dt * k1)
    return y + dt / 2.0 * (k1 + k2)


def rk4_step(func, t, y, dt):
    k1 = func(t, y)
    k2 = func(t + dt / 2.0, y + dt / 2.0 * k1)
    k3 = func(t + dt / 2.0, y + dt / 2.0 * k2)
    k4 = func(t + dt, y + dt * k3)
    return y + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)


def dopri5_step(func, t, y, dt):
    """One Dormand-Prince 5(4) step; returns (y5, error_estimate)."""
    ks = []
    for i in range(7):
        yi = y
        for a, k in zip(_DP_A[i], ks):
            yi = yi + dt * a * k
        ks.append(func(t + _DP_C[i] * dt, yi))
    y5 = y
    y4 = y
    for b5, b4, k in zip(_DP_B5, _DP_B4, ks):
        y5 = y5 + dt * b5 * k
        y4 = y4 + dt * b4 * k
    return y5, y5 - y4


FIXED_STEPPERS = {
    "euler": euler_step,
    "midpoint": midpoint_step,
    "heun": heun_step,
    "rk4": rk4_step,
    "dopri5_fixed": lambda f, t, y, dt: dopri5_step(f, t, y, dt)[0],
}

SOLVERS = tuple(FIXED_STEPPERS) + ("dopri5",)


def _error_ratio(err, y0, y1, rtol, atol):
    tol = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    r = err / tol
    return jnp.sqrt(jnp.mean(r * r))


def _integrate_segment_adaptive(func, y0, t0, t1, dt0, rtol, atol,
                                max_steps):
    """Adaptive dopri5 over one [t0, t1] segment (lax.while_loop with a
    static iteration bound); returns (y(t1), last accepted dt)."""
    safety, min_fac, max_fac, order = 0.9, 0.2, 5.0, 5.0

    def cond(state):
        t, y, dt, n = state
        return jnp.logical_and(t < t1 - 1e-12, n < max_steps)

    # floor on dt: below it steps are force-accepted so an unattainable
    # tolerance (e.g. rtol < f32 precision) degrades gracefully instead of
    # stalling the while_loop into the iteration bound
    min_dt = 1e-6 * jnp.maximum(t1 - t0, 1e-30)

    def body(state):
        t, y, dt, n = state
        dt_c = jnp.minimum(dt, t1 - t)
        y_new, err = dopri5_step(func, t, y, dt_c)
        ratio = _error_ratio(err, y, y_new, rtol, atol)
        accept = jnp.logical_or(ratio <= 1.0, dt_c <= min_dt)
        t = jnp.where(accept, t + dt_c, t)
        y = jax.tree.map(lambda a, b: jnp.where(accept, b, a), y, y_new)
        fac = safety * jnp.power(jnp.maximum(ratio, 1e-10), -1.0 / order)
        dt = dt_c * jnp.clip(fac, min_fac, max_fac)
        return (t, y, dt, n + 1)

    # a zero/negative carried dt (e.g. after a duplicate time point) would
    # stall the loop forever: re-seed it from the segment length
    dt0 = jnp.where(jnp.asarray(dt0, jnp.float32) > 0.0,
                    jnp.asarray(dt0, jnp.float32),
                    jnp.maximum(t1 - t0, jnp.float32(1e-6)))
    t, y, dt, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(t0, jnp.float32), y0, dt0, 0))
    return y, dt


@partial(jax.jit, static_argnums=(0, 3, 6))
def odeint(func, y0, ts, method: str = "dopri5", rtol=1e-6, atol=1e-8,
           substeps: int = 1):
    """Integrate ``dy/dt = func(t, y)`` through the time points ``ts``.

    torchdiffeq-style API (``torchdiffeq/_impl/odeint.py``): returns ``ys``
    with ``ys[i] = y(ts[i])`` (``ys[0] = y0``).

    :param method: one of :data:`SOLVERS`; fixed-grid methods take
        ``substeps`` equal steps per ``ts`` interval, 'dopri5' adapts
        (bounded by 1000 attempts per segment).
    """
    ts = jnp.asarray(ts, jnp.float32)

    if method == "dopri5":
        def seg(carry, t_pair):
            y, dt = carry
            t0, t1 = t_pair
            y, dt = _integrate_segment_adaptive(func, y, t0, t1, dt, rtol,
                                                atol, 1000)
            return (y, dt), y

        dt0 = (ts[1] - ts[0]) if ts.shape[0] > 1 else jnp.float32(1.0)
        (_, _), ys = jax.lax.scan(seg, (y0, dt0),
                                  (ts[:-1], ts[1:]))
    elif method in FIXED_STEPPERS:
        stepper = FIXED_STEPPERS[method]

        def seg(y, t_pair):
            t0, t1 = t_pair
            h = (t1 - t0) / substeps

            def sub(i, y):
                return stepper(func, t0 + i * h, y, h)

            y = jax.lax.fori_loop(0, substeps, sub, y)
            return y, y

        _, ys = jax.lax.scan(seg, y0, (ts[:-1], ts[1:]))
    else:
        raise ValueError(f"unknown method '{method}' (one of {SOLVERS})")

    return jnp.concatenate([y0[None], ys], axis=0)
