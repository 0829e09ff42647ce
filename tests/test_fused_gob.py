"""Fused GRU-ODE-Bayes Pallas kernel vs the XLA scan: loss and gradient
parity in interpret mode (CPU), across the trainer-reachable config grid."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.flatten_util
import jax.numpy as jnp

from njode_tpu.data import grid
from njode_tpu.models import gru_ode_bayes as gob
from njode_tpu.ops import fused_gob


def make_batch(seed=0, B=6, D=2, steps=12, obs_perc=0.4, pad=2):
    rs = np.random.RandomState(seed)
    dt = 1.0 / steps
    paths = rs.lognormal(0.0, 0.3, size=(B, D, steps + 1))
    observed = (rs.random((B, steps + 1)) < obs_perc).astype(np.int64)
    observed[0, steps] = 1
    for i in range(B):
        if observed[i, 1:].sum() == 0:
            observed[i, 3] = 1
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, observed, dt))
    # partial coordinate masks + dt==0 padding steps at the tail
    m = (rs.random(b.M.shape) < 0.7).astype(np.float32)
    m[..., 0] = 1.0
    M = m * b.obs[:, :, None]
    b = b._replace(
        times=np.concatenate([b.times, np.full(pad, float(b.times[-1]))]),
        dt=np.concatenate([b.dt, np.zeros(pad)]),
        obs=np.concatenate([b.obs, np.zeros((pad, B))]),
        X=np.concatenate([b.X * M, np.zeros((pad, B, D))]),
        M=np.concatenate([M, np.zeros((pad, B, D))]))
    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), b)


CONFIGS = [
    dict(),                                          # minimal, no impute
    dict(impute=True),
    dict(full_gru_ode=True),
    dict(full_gru_ode=True, impute=True),
    dict(logvar=False, impute=True),
    dict(solver="midpoint", impute=True),
    dict(solver="midpoint"),
    dict(solver="midpoint", full_gru_ode=True, impute=True,
         dropout_rate=0.1),
    dict(discretized=True, impute=True),
    dict(discretized=True),
    dict(impute=True, dropout_rate=0.1),
    dict(full_gru_ode=True, logvar=False),
    dict(bias=False, impute=True),
]


@pytest.mark.parametrize("kw", CONFIGS)
@pytest.mark.parametrize("train", [False, True])
def test_fused_gob_matches_xla(kw, train):
    cfg = gob.GOBConfig(input_size=2, hidden_size=9, p_hidden=7,
                        prep_hidden=5, cov_size=2, cov_hidden=6,
                        mixing=1e-2, **kw)
    assert fused_gob.supported(cfg)
    params = gob.init_params(jax.random.PRNGKey(1), cfg)
    batch = make_batch(seed=3)
    rng = jax.random.PRNGKey(7)
    fused = fused_gob.make_fused_loss_fn(cfg, interpret=True)

    def loss_xla(p):
        _, loss = gob.forward(p, cfg, batch, rng=rng, train=train,
                              get_loss=True)
        return loss

    l_ref, g_ref = jax.value_and_grad(loss_xla)(params)
    l_fus, g_fus = jax.value_and_grad(
        lambda p: fused(p, batch, rng, train))(params)
    assert np.allclose(float(l_fus), float(l_ref), rtol=1e-5,
                       atol=1e-6), (float(l_fus), float(l_ref))
    fr, _ = jax.flatten_util.ravel_pytree(
        {k: v for k, v in g_ref.items() if k != "class_model"})
    ff, _ = jax.flatten_util.ravel_pytree(
        {k: v for k, v in g_fus.items() if k != "class_model"})
    assert np.allclose(np.asarray(ff), np.asarray(fr), rtol=2e-4,
                       atol=2e-5), np.abs(np.asarray(ff)
                                          - np.asarray(fr)).max()


@pytest.mark.parametrize("train", [False, True])
def test_fused_gob_d1_published_shape(train):
    """D=1 — the published GOB-comparison shape (scalar BlackScholes/
    Heston/OU series, reference parallel_train.py:354-424). The
    backward's input-gradient dots contract with [1, W] single-row
    transposed weights, the exact pattern Mosaic rejected on chip in
    round 5 ("only constant accumulators supported"); they now route
    through the single-column `_dot_wT` branch (see
    scripts/gob_mosaic_bisect.py), whose semantics this pins."""
    cfg = gob.GOBConfig(input_size=1, hidden_size=9, p_hidden=7,
                        prep_hidden=5, cov_size=1, cov_hidden=6,
                        mixing=1e-4, impute=True, logvar=True,
                        dropout_rate=0.1, full_gru_ode=True)
    assert fused_gob.supported(cfg)
    params = gob.init_params(jax.random.PRNGKey(1), cfg)
    batch = make_batch(seed=3, D=1)
    rng = jax.random.PRNGKey(7)
    fused = fused_gob.make_fused_loss_fn(cfg, interpret=True)

    def loss_xla(p):
        _, loss = gob.forward(p, cfg, batch, rng=rng, train=train,
                              get_loss=True)
        return loss

    l_ref, g_ref = jax.value_and_grad(loss_xla)(params)
    l_fus, g_fus = jax.value_and_grad(
        lambda p: fused(p, batch, rng, train))(params)
    assert np.allclose(float(l_fus), float(l_ref), rtol=1e-5,
                       atol=1e-6), (float(l_fus), float(l_ref))
    fr, _ = jax.flatten_util.ravel_pytree(
        {k: v for k, v in g_ref.items() if k != "class_model"})
    ff, _ = jax.flatten_util.ravel_pytree(
        {k: v for k, v in g_fus.items() if k != "class_model"})
    assert np.allclose(np.asarray(ff), np.asarray(fr), rtol=2e-4,
                       atol=2e-5), np.abs(np.asarray(ff)
                                          - np.asarray(fr)).max()


def test_fused_gob_chunked(monkeypatch):
    """Multi-chunk plan: loss + grads still match the XLA scan."""
    cfg = gob.GOBConfig(input_size=2, hidden_size=9, p_hidden=7,
                        prep_hidden=5, cov_size=2, cov_hidden=6,
                        mixing=1e-2, impute=True, dropout_rate=0.1)
    params = gob.init_params(jax.random.PRNGKey(0), cfg)
    batch = make_batch(seed=5, steps=30)
    monkeypatch.setattr(fused_gob.fs, "MONO_BUDGET", 0)
    spec = fused_gob._Spec(cfg, "input")
    K, B = batch.times.shape[0], batch.start_X.shape[0]
    plan = fused_gob._plan(spec, K, B, True)
    assert plan is not None and plan[1] >= 2, plan
    rng = jax.random.PRNGKey(9)
    fused = fused_gob.make_fused_loss_fn(cfg, interpret=True)

    def loss_xla(p):
        _, loss = gob.forward(p, cfg, batch, rng=rng, train=True,
                              get_loss=True)
        return loss

    l_ref, g_ref = jax.value_and_grad(loss_xla)(params)
    l_fus, g_fus = jax.value_and_grad(
        lambda p: fused(p, batch, rng, True))(params)
    assert np.allclose(float(l_fus), float(l_ref), rtol=1e-5, atol=1e-6)
    fr, _ = jax.flatten_util.ravel_pytree(
        {k: v for k, v in g_ref.items() if k != "class_model"})
    ff, _ = jax.flatten_util.ravel_pytree(
        {k: v for k, v in g_fus.items() if k != "class_model"})
    assert np.allclose(np.asarray(ff), np.asarray(fr), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("train", [False, True])
def test_fused_gob_mesh_matches_solo_and_xla(train):
    """shard_map-composed GOB kernel on a 3-device mesh (B=6 -> 2 rows per
    shard) vs the solo kernel and the XLA scan — loss and gradients,
    'input'-mode dropout (global draws => bit-identical stream)."""
    from njode_tpu.parallel import sharding

    cfg = gob.GOBConfig(input_size=2, hidden_size=10, p_hidden=7,
                        prep_hidden=3, cov_size=2, cov_hidden=9, mixing=0.1,
                        dropout_rate=0.1, logvar=True, impute=True,
                        solver="euler", full_gru_ode=True)
    assert fused_gob.supported(cfg)
    params = gob.init_params(jax.random.PRNGKey(1), cfg)
    batch = make_batch(seed=3)
    rng = jax.random.PRNGKey(7)
    mesh = sharding.make_mesh(3)

    fused_solo = fused_gob.make_fused_loss_fn(cfg, interpret=True)
    fused_mesh = fused_gob.make_fused_loss_fn(cfg, interpret=True,
                                              mesh=mesh)

    def loss_xla(p):
        _, loss = gob.forward(p, cfg, batch, rng=rng, train=train,
                              get_loss=True)
        return loss

    l_ref, g_ref = jax.value_and_grad(loss_xla)(params)
    l_solo, g_solo = jax.value_and_grad(
        lambda p: fused_solo(p, batch, rng, train))(params)
    l_mesh, g_mesh = jax.value_and_grad(
        lambda p: fused_mesh(p, batch, rng, train))(params)
    # the GOB loss is an unnormalized SUM over observations (values ~1e3),
    # so the shard psum reassociates float adds — tolerances scale with
    # the overall gradient magnitude, not per-element
    assert np.allclose(float(l_mesh), float(l_solo), rtol=1e-6, atol=1e-5)
    assert np.allclose(float(l_mesh), float(l_ref), rtol=1e-5, atol=1e-5)
    fr, _ = jax.flatten_util.ravel_pytree(g_ref)
    fs_, _ = jax.flatten_util.ravel_pytree(g_solo)
    fm, _ = jax.flatten_util.ravel_pytree(g_mesh)
    scale = float(np.max(np.abs(np.asarray(fs_))))
    assert np.allclose(np.asarray(fm), np.asarray(fs_), rtol=1e-5,
                       atol=1e-5 * scale), np.abs(np.asarray(fm)
                                                  - np.asarray(fs_)).max()
    assert np.allclose(np.asarray(fm), np.asarray(fr), rtol=2e-4,
                       atol=2e-5 * scale)
