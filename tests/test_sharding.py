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


def test_multihost_helpers_single_process(tmp_path):
    """Single-process degradation of the multi-host coordination helpers."""
    from njode_tpu.parallel import multihost
    from njode_tpu.training import registry
    assert multihost.is_coordinator()
    multihost.barrier()
    assert multihost.broadcast_from_coordinator(np.arange(3)).sum() == 3
    smp = str(tmp_path / "sm")
    mid, desc, params, resume = multihost.resolve_model_id_synced(
        smp, None, '{"a": 1}')
    assert mid == 1 and not resume
    mid2, desc2, params2, resume2 = multihost.resolve_model_id_synced(
        smp, 1, '{"a": 2}')
    assert mid2 == 1 and resume2 and params2 == {"a": 1}
