"""Statistical and analytic tests for the JAX SDE samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from njode_tpu.data import sde

HP = dict(drift=2.0, volatility=0.3, mean=4.0, speed=2.0, correlation=0.5,
          nb_paths=4000, nb_steps=100, S0=1.0, maturity=1.0, dimension=1)


def test_black_scholes_moments():
    m = sde.make_model("BlackScholes", HP)
    paths, dt = m.generate_paths(jax.random.PRNGKey(0))
    assert paths.shape == (4000, 1, 101)
    assert abs(dt - 0.01) < 1e-12
    xT = np.asarray(paths[:, 0, -1])
    # E[S_T] = S0 exp(mu T); MC error ~ std/sqrt(N)
    assert abs(xT.mean() - np.exp(2.0)) < 4 * xT.std() / np.sqrt(len(xT))
    assert np.all(np.asarray(paths[:, 0, 0]) == 1.0)


def test_ornstein_uhlenbeck_moments():
    m = sde.make_model("OrnsteinUhlenbeck", HP)
    paths, _ = m.generate_paths(jax.random.PRNGKey(1))
    xT = np.asarray(paths[:, 0, -1])
    # E[X_T] = S0 e^{-kT} + mean(1-e^{-kT})
    expected = 1.0 * np.exp(-2.0) + 4.0 * (1 - np.exp(-2.0))
    assert abs(xT.mean() - expected) < 4 * xT.std() / np.sqrt(len(xT))


def test_heston_spot_mean():
    m = sde.make_model("Heston", HP)
    paths, _ = m.generate_paths(jax.random.PRNGKey(2))
    xT = np.asarray(paths[:, 0, -1])
    assert abs(xT.mean() - np.exp(2.0)) < 6 * xT.std() / np.sqrt(len(xT))


def test_heston_wof_return_vol_dims():
    hp = dict(HP, return_vol=True, v0=1.0, volatility=2.0)
    m = sde.make_model("HestonWOFeller", hp)
    paths, _ = m.generate_paths(jax.random.PRNGKey(3))
    assert paths.shape == (4000, 2, 101)  # spot + variance stacked
    assert np.all(np.isfinite(np.asarray(paths)))


def test_sine_drift_changes_mean():
    hp = dict(HP, sine_coeff=2 * np.pi)
    m = sde.make_model("sine_BlackScholes", hp)
    m0 = sde.make_model("BlackScholes", HP)
    p1, _ = m.generate_paths(jax.random.PRNGKey(4))
    p0, _ = m0.generate_paths(jax.random.PRNGKey(4))
    mid1 = float(jnp.mean(p1[:, 0, 25]))
    mid0 = float(jnp.mean(p0[:, 0, 25]))
    assert mid1 > mid0  # 1+sin boosts drift in the first quarter period


def test_combined_chains_continuously():
    hp = dict(HP, nb_paths=50)
    m = sde.Combined(stock_model_names=["BlackScholes", "OrnsteinUhlenbeck"],
                     hyperparam_dicts=[hp, hp])
    paths, dt = m.generate_paths(jax.random.PRNGKey(5))
    assert paths.shape == (50, 1, 201)
    assert abs(dt - 0.01) < 1e-12


def test_cond_exp_formulas():
    bs = sde.make_model("BlackScholes", HP)
    y = jnp.array([[2.0]])
    out = bs.next_cond_exp(y, 0.1, 0.0)
    assert np.allclose(out, 2.0 * np.exp(2.0 * 0.1))

    ou = sde.make_model("OrnsteinUhlenbeck", HP)
    out = ou.next_cond_exp(y, 0.1, 0.0)
    e = np.exp(-2.0 * 0.1)
    assert np.allclose(out, 2.0 * e + 4.0 * (1 - e))

    wof = sde.make_model("HestonWOFeller", dict(HP, return_vol=True))
    y2 = jnp.array([[2.0, 3.0]])
    out = wof.next_cond_exp(y2, 0.1, 0.0)
    assert np.allclose(out[0, 0], 2.0 * np.exp(0.2))
    assert np.allclose(out[0, 1], 3.0 * e + 4.0 * (1 - e))


def test_combined_cond_exp_switches_regime():
    hp_bs = dict(HP)
    hp_ou = dict(HP)
    m = sde.Combined(stock_model_names=["BlackScholes", "OrnsteinUhlenbeck"],
                     hyperparam_dicts=[hp_bs, hp_ou])
    y = jnp.array([[2.0]])
    out_early = m.next_cond_exp(y, 0.1, 0.5)   # t<1 => BS regime
    out_late = m.next_cond_exp(y, 0.1, 1.5)    # t>1 => OU regime
    assert np.allclose(out_early, 2.0 * np.exp(0.2))
    e = np.exp(-0.2)
    assert np.allclose(out_late, 2.0 * e + 4.0 * (1 - e))
