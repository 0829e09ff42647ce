"""Vmapped ensemble training tests: learning progress, member
independence, and solo-run equivalence."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from njode_tpu.models import njode
from njode_tpu.training import vmap_sweep
from njode_tpu.training.steps import dense_batch, make_optimizer

CFG = njode.NJODEConfig(input_size=1, hidden_size=6, output_size=1,
                        ode_nn=((10, "tanh"),), readout_nn=((10, "tanh"),),
                        enc_nn=((10, "tanh"),), dropout_rate=0.0)


def make_data(N=60, steps=12, seed=0):
    rs = np.random.RandomState(seed)
    paths = rs.lognormal(0, 0.2, (N, 1, steps + 1))
    obs = (rs.random((N, steps + 1)) < 0.35).astype(np.int64)
    return paths, obs, 1.0 / steps


def test_ensemble_trains_and_members_differ():
    paths, obs, dt = make_data()
    out = vmap_sweep.train_ensemble(
        CFG, paths, obs, dt, train_idx=np.arange(40),
        val_idx=np.arange(40, 60), seeds=[1, 2, 3], epochs=8,
        batch_size=20, learning_rate=0.01)
    ev = out["eval_losses"]
    assert ev.shape == (8, 3)
    assert np.isfinite(ev).all()
    # everybody learns
    assert (ev[-1] < ev[0]).all()
    # different seeds -> different members
    assert not np.allclose(ev[-1][0], ev[-1][1])
    leaves = jax.tree.leaves(out["params"])
    assert all(leaf.shape[0] == 3 for leaf in leaves)


def test_singleton_ensemble_matches_solo_training():
    """E=1 ensemble reproduces a hand-rolled solo loop with identical seeds
    bit-for-bit (no dropout => RNG only orders batches)."""
    paths, obs, dt = make_data(seed=5)
    seeds = [7]
    epochs, bs = 4, 20
    out = vmap_sweep.train_ensemble(
        CFG, paths, obs, dt, train_idx=np.arange(40),
        val_idx=np.arange(40, 60), seeds=seeds, epochs=epochs,
        batch_size=bs, learning_rate=0.01)

    # solo replication of the exact same step math
    K = paths.shape[2] - 1
    times = (np.arange(1, K + 1) * dt).astype(np.float32)
    dts = np.full(K, dt, dtype=np.float32)
    optimizer = make_optimizer(0.01)
    params = njode.init_params(jax.random.PRNGKey(7), CFG)
    opt_state = optimizer.init(params)
    d_paths = jnp.asarray(paths.astype(np.float32))
    d_obs = jnp.asarray(obs.astype(np.float32))
    rng = jax.random.PRNGKey(7 + 10_000)
    import optax
    evs = []
    for epoch in range(1, epochs + 1):
        perm = np.random.RandomState(7 * 100_003 + epoch).permutation(
            np.arange(40))[:40].reshape(-1, bs)
        for k in range(perm.shape[0]):
            idx = jnp.asarray(perm[k].astype(np.int32))
            pb = jnp.take(d_paths, idx, axis=0)
            ob = jnp.take(d_obs, idx, axis=0)
            batch = dense_batch(pb, ob, jnp.asarray(times),
                                jnp.asarray(dts))

            def loss_fn(p):
                _, loss = njode.forward(
                    p, CFG, batch, weight=0.5,
                    rng=jax.random.fold_in(
                        jax.random.fold_in(rng, epoch), k),
                    train=True, get_loss=True)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
        vb = dense_batch(jnp.take(d_paths, jnp.arange(40, 60), axis=0),
                         jnp.take(d_obs, jnp.arange(40, 60), axis=0),
                         jnp.asarray(times), jnp.asarray(dts))
        _, ev = njode.forward(params, CFG, vb, weight=0.5, train=False,
                              get_loss=True)
        evs.append(float(ev))
    assert np.allclose(out["eval_losses"][:, 0], np.asarray(evs),
                       rtol=1e-5, atol=1e-7)

def test_hetero_ensemble_matches_solo_small_net():
    """Width-heterogeneous ensemble (zero-padded to the super-architecture):
    the SMALL member's whole training trajectory equals training the small
    architecture alone (rate 0 => exact; padded rows/cols stay exactly 0
    under Adam + L2)."""
    paths, obs, dt = make_data(seed=9)

    def cfg_w(w):
        return njode.NJODEConfig(
            input_size=1, hidden_size=6, output_size=1,
            ode_nn=((w, "tanh"),), readout_nn=((w, "tanh"),),
            enc_nn=((w, "tanh"),), dropout_rate=0.0)

    cfgs = [cfg_w(6), cfg_w(16)]
    out = vmap_sweep.train_ensemble(
        None, paths, obs, dt, train_idx=np.arange(40),
        val_idx=np.arange(40, 60), seeds=[3, 4], epochs=5,
        batch_size=20, learning_rate=0.01, cfgs=cfgs)

    solo = vmap_sweep.train_ensemble(
        cfg_w(6), paths, obs, dt, train_idx=np.arange(40),
        val_idx=np.arange(40, 60), seeds=[3], epochs=5,
        batch_size=20, learning_rate=0.01)

    assert np.allclose(out["eval_losses"][:, 0], solo["eval_losses"][:, 0],
                       rtol=1e-6, atol=1e-8)
    # the padded regions are EXACTLY zero after training
    w_big = out["params"]["ode_f"][0]["w"][0]      # member 0, layer 0
    assert np.all(np.asarray(w_big)[:, 6:] == 0.0)
    w_out = out["params"]["ode_f"][1]["w"][0]      # layer 1: [16, 6]
    assert np.all(np.asarray(w_out)[6:, :] == 0.0)
    # member 1 (the wide net) actually uses its extra width
    assert np.abs(np.asarray(out["params"]["ode_f"][0]["w"][1])[:, 6:]
                  ).max() > 0


def test_hetero_super_config_rejects_mismatch():
    c1 = njode.NJODEConfig(1, 6, 1, ((8, "tanh"),), ((8, "tanh"),),
                           ((8, "tanh"),))
    c2 = njode.NJODEConfig(1, 8, 1, ((8, "tanh"),), ((8, "tanh"),),
                           ((8, "tanh"),))
    with pytest.raises(ValueError):
        vmap_sweep.hetero_super_config([c1, c2])
