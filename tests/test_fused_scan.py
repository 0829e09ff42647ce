"""Fused Pallas scan kernel vs the XLA scan: loss and gradient parity in
interpret mode (CPU)."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.flatten_util
import jax.numpy as jnp

from njode_tpu.data import grid
from njode_tpu.models import njode
from njode_tpu.ops import fused_scan

NN = ((13, "tanh"), (7, "relu"))


def make_batch(seed=0, B=8, D=2, steps=15, obs_perc=0.35):
    rs = np.random.RandomState(seed)
    dt = 1.0 / steps
    paths = rs.lognormal(0.0, 0.3, size=(B, D, steps + 1))
    observed = (rs.random((B, steps + 1)) < obs_perc).astype(np.int64)
    observed[0, steps] = 1
    for i in range(B):
        if observed[i, 1:].sum() == 0:
            observed[i, 3] = 1
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    return jax.tree.map(jnp.asarray, b)


CONFIGS = [
    dict(),                                  # default: residual, standard
    dict(which_loss="easy"),
    dict(residual_enc_dec=False),
    dict(dropout_rate=0.1),
]


@pytest.mark.parametrize("kw", CONFIGS)
@pytest.mark.parametrize("train", [False, True])
def test_fused_loss_and_grads_match_xla(kw, train):
    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN, **kw)
    assert fused_scan.supported(cfg)
    params = njode.init_params(jax.random.PRNGKey(1), cfg)
    batch = make_batch(seed=3)
    rng = jax.random.PRNGKey(7)
    weight = jnp.float32(0.7)

    fused = fused_scan.make_fused_loss_fn(cfg, interpret=True)

    def loss_xla(p):
        _, loss = njode.forward(p, cfg, batch, weight=weight, rng=rng,
                                train=train, get_loss=True)
        return loss

    def loss_fused(p):
        return fused(p, batch, weight, rng, train)

    l_ref, g_ref = jax.value_and_grad(loss_xla)(params)
    l_fus, g_fus = jax.value_and_grad(loss_fused)(params)
    assert np.allclose(float(l_fus), float(l_ref), rtol=1e-5, atol=1e-6)
    flat_ref, _ = jax.flatten_util.ravel_pytree(g_ref)
    flat_fus, _ = jax.flatten_util.ravel_pytree(g_fus)
    assert np.allclose(np.asarray(flat_fus), np.asarray(flat_ref),
                       rtol=2e-4, atol=2e-5), (
        np.abs(np.asarray(flat_fus) - np.asarray(flat_ref)).max())


def test_fused_with_padding_steps():
    """dt==0 padding steps must be exact no-ops in both passes."""
    cfg = njode.NJODEConfig(input_size=1, hidden_size=6, output_size=1,
                            ode_nn=((8, "tanh"),), readout_nn=((8, "tanh"),),
                            enc_nn=((8, "tanh"),))
    params = njode.init_params(jax.random.PRNGKey(0), cfg)
    b = make_batch(seed=5, B=4, D=1, steps=10)
    # append 3 padding steps
    K, B = b.times.shape[0], b.start_X.shape[0]
    pad = 3
    b = b._replace(
        times=jnp.concatenate([b.times, jnp.full((pad,), 1.0)]),
        dt=jnp.concatenate([b.dt, jnp.zeros((pad,))]),
        obs=jnp.concatenate([b.obs, jnp.zeros((pad, B))]),
        X=jnp.concatenate([b.X, jnp.zeros((pad, B, 1))]),
        M=jnp.concatenate([b.M, jnp.zeros((pad, B, 1))]))
    rng = jax.random.PRNGKey(2)
    fused = fused_scan.make_fused_loss_fn(cfg, interpret=True)

    def loss_xla(p):
        _, loss = njode.forward(p, cfg, b, weight=0.5, rng=rng,
                                train=False, get_loss=True)
        return loss

    l_ref, g_ref = jax.value_and_grad(loss_xla)(params)
    l_fus, g_fus = jax.value_and_grad(
        lambda p: fused(p, b, jnp.float32(0.5), rng, False))(params)
    assert np.allclose(float(l_fus), float(l_ref), rtol=1e-5)
    fr, _ = jax.flatten_util.ravel_pytree(g_ref)
    ff, _ = jax.flatten_util.ravel_pytree(g_fus)
    assert np.allclose(np.asarray(ff), np.asarray(fr), rtol=2e-4, atol=2e-5)


def test_supported_gates():
    base = dict(input_size=1, hidden_size=6, output_size=1,
                ode_nn=((8, "tanh"),), readout_nn=((8, "tanh"),),
                enc_nn=((8, "tanh"),))
    assert fused_scan.supported(njode.NJODEConfig(**base))
    assert not fused_scan.supported(njode.NJODEConfig(**base, masked=True))
    assert not fused_scan.supported(njode.NJODEConfig(**base, use_rnn=True))
    assert not fused_scan.supported(
        njode.NJODEConfig(**base, input_current_t=True))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pltpu.prng_seed has no CPU interpret rule")
def test_prng_mask_mode():
    """In-kernel PRNG dropout ('prng' mode): deterministic per rng,
    differentiable, statistically equivalent to input-mode dropout.
    (TPU-only: driven by the on-chip verification runs.)"""
    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN,
                            dropout_rate=0.1)
    params = njode.init_params(jax.random.PRNGKey(1), cfg)
    batch = make_batch(seed=3)
    rng = jax.random.PRNGKey(7)
    weight = jnp.float32(0.5)
    fused = fused_scan.make_fused_loss_fn(cfg, mask_mode="prng")

    l1 = fused(params, batch, weight, rng, True)
    l2 = fused(params, batch, weight, rng, True)
    assert np.isfinite(float(l1))
    # deterministic given the same rng; different rng -> different masks
    assert float(l1) == float(l2)
    l3 = fused(params, batch, weight, jax.random.PRNGKey(8), True)
    assert float(l3) != float(l1)

    # gradient flows and is finite (backward re-draws identical masks)
    g = jax.grad(lambda p: fused(p, batch, weight, rng, True))(params)
    flat = jax.flatten_util.ravel_pytree(g)[0]
    assert np.isfinite(np.asarray(flat)).all()

    # eval mode (no dropout) is bit-identical to the input-mode kernel
    fused_in = fused_scan.make_fused_loss_fn(cfg, mask_mode="input")
    le_p = fused(params, batch, weight, rng, False)
    le_i = fused_in(params, batch, weight, rng, False)
    assert float(le_p) == float(le_i)

    # statistical sanity: train-mode losses across rngs bracket the
    # eval-mode loss scale (dropout perturbs but does not explode)
    ls = [float(fused(params, batch, weight, jax.random.PRNGKey(100 + i),
                      True)) for i in range(5)]
    assert np.std(ls) > 0
    assert abs(np.mean(ls) - float(le_p)) < 2.0 * abs(float(le_p)) + 1.0


def test_fused_eval_matches_xla():
    """Histogram-free eval kernel: loss equals the XLA eval forward."""
    cfg = njode.NJODEConfig(input_size=2, hidden_size=10, output_size=2,
                            ode_nn=NN, readout_nn=NN, enc_nn=NN,
                            dropout_rate=0.1)
    params = njode.init_params(jax.random.PRNGKey(1), cfg)
    batch = make_batch(seed=3)
    ev = fused_scan.make_fused_eval_fn(cfg, interpret=True)
    l_f = ev(params, batch, jnp.float32(0.7))
    _, l_x = njode.forward(params, cfg, batch, weight=0.7, train=False,
                           get_loss=True)
    assert np.allclose(float(l_f), float(l_x), rtol=1e-5, atol=1e-6)
