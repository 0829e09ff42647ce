"""Sharding tests on the 8-device virtual CPU mesh: tensor-parallel weight
sharding must be numerically equivalent to replicated execution, and the
driver's multichip dry run must pass."""

import numpy as np

import conftest  # noqa: F401

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from njode_tpu.data.grid import batch_from_paths, recompute_n_obs
from njode_tpu.models import njode
from njode_tpu.parallel import sharding


def _setup():
    cfg = njode.NJODEConfig(
        input_size=1, hidden_size=10, output_size=1,
        ode_nn=((16, "tanh"), (16, "tanh")),
        readout_nn=((16, "tanh"), (16, "tanh")),
        enc_nn=((16, "tanh"), (16, "tanh")))
    params = njode.init_params(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    B, K = 16, 10
    paths = rs.lognormal(0, 0.2, (B, 1, K + 1))
    obs = (rs.random((B, K + 1)) < 0.3).astype(np.int64)
    b = recompute_n_obs(batch_from_paths(paths, obs, 1.0 / K))
    return cfg, params, jax.tree.map(jnp.asarray, b)


def test_tp_sharding_matches_replicated():
    cfg, params, batch = _setup()
    _, loss_ref = jax.jit(
        lambda p, b: njode.forward(p, cfg, b, train=False, get_loss=True)
    )(params, batch)

    mesh = sharding.make_mesh_2d(8, model_parallel=2)
    tp = sharding.njode_tp_sharding(params, mesh)
    params_tp = jax.device_put(params, tp)
    batch_tp = jax.device_put(batch, NamedSharding(mesh, P()))
    _, loss_tp = jax.jit(
        lambda p, b: njode.forward(p, cfg, b, train=False, get_loss=True)
    )(params_tp, batch_tp)
    assert np.allclose(float(loss_ref), float(loss_tp), rtol=1e-5)

    # 4-way model parallel too
    mesh4 = sharding.make_mesh_2d(8, model_parallel=4)
    params_tp4 = jax.device_put(params,
                                sharding.njode_tp_sharding(params, mesh4))
    _, loss_tp4 = jax.jit(
        lambda p, b: njode.forward(p, cfg, b, train=False, get_loss=True)
    )(params_tp4, jax.device_put(batch, NamedSharding(mesh4, P())))
    assert np.allclose(float(loss_ref), float(loss_tp4), rtol=1e-5)


def test_ffnn_tp_specs_shapes():
    layers = [{"w": np.zeros((4, 16)), "b": np.zeros(16)},
              {"w": np.zeros((16, 16)), "b": np.zeros(16)},
              {"w": np.zeros((16, 2)), "b": np.zeros(2)}]
    specs = sharding.ffnn_tp_specs(layers)
    assert specs[0]["w"] == P(None, "model") and specs[0]["b"] == P("model")
    assert specs[1]["w"] == P("model", None) and specs[1]["b"] == P()
    assert specs[2]["w"] == P(None, "model")


def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
