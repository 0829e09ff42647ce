"""Vectorized JAX samplers for the synthetic SDE stock models.

Capability parity with the reference simulators in
``/root/reference/NJODE/stock_model.py`` (BlackScholes :339-375,
OrnsteinUhlenbeck :378-418, Heston :161-221, HestonWOFeller :250-335,
Combined chaining via ``create_combined_dataset``), re-designed TPU-first:
instead of the reference's per-path per-step Python double loop, every model
is a single ``lax.scan`` over time steps carrying the full ``[paths, dim]``
state, so the simulation is one XLA program.

Conventions preserved from the reference:
- drift terms evaluate the periodic (sine) coefficient at the *previous*
  step time ``(k-1)*dt`` (``stock_model.py:372, :415, :216``),
- the Heston spot diffusion uses the *current*-step variance
  (``stock_model.py:214-219``) — a quirk deliberately preserved,
- returned paths have shape ``[nb_paths, dimension, nb_steps+1]``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def periodic_coeff(sine_coeff: Optional[float]) -> Callable:
    """Time-periodic drift multiplier, ``stock_model.py:29-32``."""
    if sine_coeff is None:
        return lambda t: jnp.ones_like(t) if hasattr(t, "shape") else 1.0
    return lambda t: 1.0 + jnp.sin(sine_coeff * t)


@dataclasses.dataclass(frozen=True)
class SDEModel:
    """Base for synthetic models: simulation + closed-form conditional exp.

    ``generate_paths`` mirrors ``StockModel.generate_paths``;
    ``next_cond_exp(y, dt, t_prev)`` mirrors the per-model conditional
    expectation step (``stock_model.py:42-48`` and per-model overrides) and is
    a pure jnp function usable inside ``lax.scan`` (see data/oracle.py).
    """

    drift: Optional[float] = None
    volatility: Optional[float] = None
    mean: Optional[float] = None
    speed: Optional[float] = None
    correlation: Optional[float] = None
    nb_paths: int = 10_000
    nb_steps: int = 100
    S0: float = 1.0
    maturity: float = 1.0
    dimension: int = 1
    sine_coeff: Optional[float] = None

    @property
    def dt(self) -> float:
        return self.maturity / self.nb_steps

    def next_cond_exp(self, y, dt, t_prev):
        raise NotImplementedError

    def generate_paths(self, key, start_X=None):
        raise NotImplementedError

    def _init_state(self, start_X):
        """Simulation dimensionality follows ``np.size(S0)`` like the
        reference (``stock_model.py:28``) — the 'dimension' hyperparameter
        is dataset metadata (e.g. HestonWOFeller return_vol datasets carry
        dimension=2 for spot+variance while simulating a 1-D spot)."""
        if start_X is None:
            s0 = np.asarray(self.S0, dtype=np.float32).reshape(-1)
            return jnp.broadcast_to(
                s0, (self.nb_paths, s0.size)).astype(jnp.float32)
        return jnp.asarray(start_X, dtype=jnp.float32)


def _scan_paths(x0, step_fn, keys):
    """Scan ``step_fn`` over per-step rng keys; returns [P, D, K+1]."""
    def body(carry, inp):
        k, key = inp
        nxt = step_fn(carry, k, key)
        return nxt, nxt
    steps = jnp.arange(1, keys.shape[0] + 1)
    _, path = jax.lax.scan(body, x0, (steps, keys))
    # path: [K, P, D] -> [P, D, K+1] with x0 prepended (reference layout)
    full = jnp.concatenate([x0[None], path], axis=0)
    return jnp.transpose(full, (1, 2, 0))


@dataclasses.dataclass(frozen=True)
class BlackScholes(SDEModel):
    """GBM: dS = mu*pc(t)*S dt + sigma*S dW (``stock_model.py:339-375``)."""

    def next_cond_exp(self, y, dt, t_prev):
        pc = periodic_coeff(self.sine_coeff)(t_prev)
        return y * jnp.exp(self.drift * pc * dt)

    def generate_paths(self, key, start_X=None):
        dt = self.dt
        pc = periodic_coeff(self.sine_coeff)
        x0 = self._init_state(start_X)
        keys = jax.random.split(key, self.nb_steps)

        def step(x, k, stepkey):
            dW = jax.random.normal(stepkey, x.shape) * np.sqrt(dt)
            t_prev = (k - 1) * dt
            return x + self.drift * pc(t_prev) * x * dt + self.volatility * x * dW

        return _scan_paths(x0, step, keys), dt


@dataclasses.dataclass(frozen=True)
class OrnsteinUhlenbeck(SDEModel):
    """OU: dX = -speed*pc(t)*(X-mean) dt + vol dW (``stock_model.py:378-418``)."""

    def next_cond_exp(self, y, dt, t_prev):
        pc = periodic_coeff(self.sine_coeff)(t_prev)
        exp_delta = jnp.exp(-self.speed * pc * dt)
        return y * exp_delta + self.mean * (1.0 - exp_delta)

    def generate_paths(self, key, start_X=None):
        dt = self.dt
        pc = periodic_coeff(self.sine_coeff)
        x0 = self._init_state(start_X)
        keys = jax.random.split(key, self.nb_steps)

        def step(x, k, stepkey):
            dW = jax.random.normal(stepkey, x.shape) * np.sqrt(dt)
            t_prev = (k - 1) * dt
            return x - self.speed * pc(t_prev) * (x - self.mean) * dt \
                + self.volatility * dW

        return _scan_paths(x0, step, keys), dt


@dataclasses.dataclass(frozen=True)
class Heston(SDEModel):
    """Heston stochastic-volatility model (``stock_model.py:161-221``).

    Spot diffusion uses the current-step variance (reference quirk,
    ``stock_model.py:214-219``). Conditional expectation of the spot is the
    same exponential-drift formula as Black-Scholes (``stock_model.py:178-179``).
    """

    def next_cond_exp(self, y, dt, t_prev):
        pc = periodic_coeff(self.sine_coeff)(t_prev)
        return y * jnp.exp(self.drift * pc * dt)

    def generate_paths(self, key, start_X=None):
        dt = self.dt
        pc = periodic_coeff(self.sine_coeff)
        s0 = self._init_state(start_X)
        v0 = jnp.full_like(s0, self.mean)
        keys = jax.random.split(key, self.nb_steps)

        def body(carry, inp):
            s, v = carry
            k, stepkey = inp
            k1, k2 = jax.random.split(stepkey)
            n1 = jax.random.normal(k1, s.shape)
            n2 = jax.random.normal(k2, s.shape)
            dW = n1 * np.sqrt(dt)
            dZ = (self.correlation * n1
                  + np.sqrt(1.0 - self.correlation ** 2) * n2) * np.sqrt(dt)
            v_new = v - self.speed * (v - self.mean) * dt \
                + self.volatility * jnp.sqrt(v) * dZ
            t_prev = (k - 1) * dt
            # current-step variance in the spot diffusion, as in the reference
            s_new = s + self.drift * pc(t_prev) * s * dt + jnp.sqrt(v_new) * s * dW
            return (s_new, v_new), s_new

        steps = jnp.arange(1, self.nb_steps + 1)
        _, spath = jax.lax.scan(body, (s0, v0), (steps, keys))
        full = jnp.concatenate([s0[None], spath], axis=0)
        return jnp.transpose(full, (1, 2, 0)), dt


@dataclasses.dataclass(frozen=True)
class HestonWOFeller(SDEModel):
    """Heston via log-Euler, valid without the Feller condition
    (``stock_model.py:250-335``). ``return_vol`` appends the variance as
    extra observable dimensions with OU-style conditional expectation.
    """

    scheme: str = "euler"
    return_vol: bool = False
    v0: Optional[float] = None

    @property
    def _v0(self):
        return self.mean if self.v0 is None else self.v0

    def next_cond_exp(self, y, dt, t_prev):
        pc = periodic_coeff(self.sine_coeff)(t_prev)
        if self.return_vol:
            s, v = jnp.split(y, 2, axis=-1)
            s = s * jnp.exp(self.drift * pc * dt)
            exp_delta = jnp.exp(-self.speed * dt)
            v = v * exp_delta + self.mean * (1.0 - exp_delta)
            return jnp.concatenate([s, v], axis=-1)
        return y * jnp.exp(self.drift * pc * dt)

    def generate_paths(self, key, start_X=None):
        if self.scheme != "euler":
            raise ValueError("unknown sampling scheme")
        dt = self.dt
        pc = periodic_coeff(self.sine_coeff)
        s0 = self._init_state(start_X)
        v0 = jnp.full_like(s0, self._v0)
        keys = jax.random.split(key, self.nb_steps)

        def body(carry, inp):
            logs, v = carry
            k, stepkey = inp
            k1, k2 = jax.random.split(stepkey)
            n1 = jax.random.normal(k1, logs.shape)
            n2 = jax.random.normal(k2, logs.shape)
            dW = n1 * np.sqrt(dt)
            dZ = (self.correlation * n1
                  + np.sqrt(1.0 - self.correlation ** 2) * n2) * np.sqrt(dt)
            vp = jnp.maximum(v, 0.0)
            t_prev = (k - 1) * dt
            logs_new = logs + (self.drift * pc(t_prev) - 0.5 * vp) * dt \
                + jnp.sqrt(vp) * dW
            v_new = v - self.speed * (vp - self.mean) * dt \
                + self.volatility * jnp.sqrt(vp) * dZ
            return (logs_new, v_new), (logs_new, v_new)

        steps = jnp.arange(1, self.nb_steps + 1)
        _, (logpath, vpath) = jax.lax.scan(body, (jnp.log(s0), v0), (steps, keys))
        spot = jnp.exp(jnp.concatenate([jnp.log(s0)[None], logpath], axis=0))
        var = jnp.concatenate([v0[None], vpath], axis=0)
        spot = jnp.transpose(spot, (1, 2, 0))
        var = jnp.transpose(var, (1, 2, 0))
        if self.return_vol:
            return jnp.concatenate([spot, var], axis=1), dt
        return spot, dt


@dataclasses.dataclass(frozen=True)
class Combined:
    """Regime-switching model chaining several SDE models in time
    (``stock_model.py:421-466``, ``data_utils.py:111-195``).

    Holds per-regime sub-models; ``boundaries[i]`` is the absolute start time
    of regime ``i`` (cumulative maturities).
    """

    stock_model_names: Sequence[str]
    hyperparam_dicts: Sequence[dict]

    def submodels(self):
        return [make_model(n, hp) for n, hp in
                zip(self.stock_model_names, self.hyperparam_dicts)]

    def boundaries(self):
        """Absolute end time of each regime."""
        ends, t = [], 0.0
        for hp in self.hyperparam_dicts:
            t += hp["maturity"]
            ends.append(t)
        return np.asarray(ends)

    def next_cond_exp(self, y, dt, t_prev):
        """Piecewise conditional-expectation step: select regime by time.

        The reference chains per-regime ``compute_cond_exp`` calls
        (``stock_model.py:426-453``); on a shared grid this is equivalent to
        selecting the regime whose window contains ``t_prev``.
        """
        subs = self.submodels()
        ends = self.boundaries()
        out = subs[0].next_cond_exp(y, dt, t_prev)
        for i in range(1, len(subs)):
            nxt = subs[i].next_cond_exp(y, dt, t_prev)
            out = jnp.where(t_prev >= ends[i - 1] - 1e-12, nxt, out)
        return out

    def generate_paths(self, key, start_X=None):
        subs = self.submodels()
        keys = jax.random.split(key, len(subs))
        paths, dt = subs[0].generate_paths(keys[0], start_X=start_X)
        last = paths[:, :, -1]
        for i in range(1, len(subs)):
            p, dt_i = subs[i].generate_paths(keys[i], start_X=last)
            assert abs(dt_i - dt) < 1e-12, "all regimes must share dt"
            last = p[:, :, -1]
            paths = jnp.concatenate([paths, p[:, :, 1:]], axis=2)
        return paths, dt


_MODEL_CLASSES = {
    "BlackScholes": BlackScholes,
    "Heston": Heston,
    "OrnsteinUhlenbeck": OrnsteinUhlenbeck,
    "HestonWOFeller": HestonWOFeller,
    # sine_* aliases map to the same classes; the sine behavior comes from
    # the `sine_coeff` hyperparameter (``stock_model.py:486-495``)
    "sine_BlackScholes": BlackScholes,
    "sine_Heston": Heston,
    "sine_OrnsteinUhlenbeck": OrnsteinUhlenbeck,
}

_FIELD_NAMES = {
    "drift", "volatility", "mean", "speed", "correlation", "nb_paths",
    "nb_steps", "S0", "maturity", "dimension", "sine_coeff",
}
_WOF_EXTRA = {"scheme", "return_vol", "v0"}


def make_model(name: str, hyperparams: dict):
    """Instantiate a model from its registry name + hyperparameter dict.

    Mirrors ``STOCK_MODELS[name](**hyperparam_dict)``
    (``stock_model.py:486-495``), tolerating extra keys in the dict.
    """
    if name == "combined":
        return Combined(stock_model_names=hyperparams["stock_model_names"],
                        hyperparam_dicts=hyperparams["hyperparam_dicts"])
    cls = _MODEL_CLASSES[name]
    allowed = set(_FIELD_NAMES)
    if cls is HestonWOFeller:
        allowed |= _WOF_EXTRA
    kwargs = {k: v for k, v in hyperparams.items() if k in allowed}
    return cls(**kwargs)


STOCK_MODELS = dict(_MODEL_CLASSES)
STOCK_MODELS["combined"] = Combined


def draw_path_heston(hyperparams=None, n_paths: int = 10, seed: int = 0,
                     save_path=None):
    """Heston debug plot (``Heston.draw_path_heston``,
    ``stock_model.py:223-246``)."""
    return draw_stock_model("Heston", hyperparams, n_paths, seed, save_path)


def draw_stock_model(name: str = "BlackScholes", hyperparams=None,
                     n_paths: int = 10, seed: int = 0, save_path=None):
    """Debug plot of simulated paths (``draw_stock_model``,
    ``stock_model.py:505-528``). Returns the saved filename."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    hp = dict(hyperparams or {})
    hp.setdefault("drift", 2.0)
    hp.setdefault("volatility", 0.3)
    hp.setdefault("mean", 4.0)
    hp.setdefault("speed", 2.0)
    hp.setdefault("correlation", 0.5)
    hp.setdefault("nb_steps", 100)
    hp.setdefault("S0", 1.0)
    hp.setdefault("maturity", 1.0)
    hp.setdefault("dimension", 1)
    hp["nb_paths"] = n_paths
    model = make_model(name, hp)
    paths, dt = model.generate_paths(jax.random.PRNGKey(seed))
    paths = np.asarray(paths)
    ts = np.arange(paths.shape[2]) * dt
    plt.figure()
    for i in range(paths.shape[0]):
        plt.plot(ts, paths[i, 0])
    plt.xlabel("$t$")
    plt.title(name)
    out = save_path or f"{name}_drawn_paths.pdf"
    plt.savefig(out, bbox_inches="tight")
    plt.close()
    return out
