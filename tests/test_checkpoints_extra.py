"""Checkpoint backends (msgpack + orbax/async), batch validation, and
1-vs-N-device data-parallel equivalence."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from njode_tpu.data import grid
from njode_tpu.models import njode
from njode_tpu.parallel import sharding
from njode_tpu.training import checkpoints
from njode_tpu.training.steps import make_optimizer


def _setup():
    cfg = njode.NJODEConfig(input_size=1, hidden_size=6, output_size=1,
                            ode_nn=((8, "tanh"),), readout_nn=((8, "tanh"),),
                            enc_nn=((8, "tanh"),))
    params = njode.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-3)
    return cfg, params, opt, opt.init(params)


@pytest.mark.parametrize("async_save", [False, True])
def test_orbax_roundtrip(tmp_path, async_save):
    cfg, params, opt, opt_state = _setup()
    d = str(tmp_path / "ck")
    checkpoints.save_checkpoint_orbax(d, params, opt_state, epoch=7,
                                      weight=0.6, async_save=async_save)
    checkpoints.wait_for_async_saves()
    p2 = njode.init_params(jax.random.PRNGKey(5), cfg)
    o2 = opt.init(p2)
    # generic load_checkpoint auto-detects the orbax layout
    pr, orr, ep, w = checkpoints.load_checkpoint(d, p2, o2)
    assert ep == 7 and w == 0.6
    chk = jax.tree.map(lambda a, b: np.allclose(a, b), params, pr)
    assert all(jax.tree.leaves(chk))


def _make_batch(B=16, steps=10, seed=0):
    rs = np.random.RandomState(seed)
    paths = rs.lognormal(0, 0.2, (B, 1, steps + 1))
    obs = (rs.random((B, steps + 1)) < 0.4).astype(np.int64)
    return grid.recompute_n_obs(grid.batch_from_paths(paths, obs,
                                                      1.0 / steps))


def test_validate_batch_accepts_good_and_flags_bad():
    b = _make_batch()
    assert grid.validate_batch(b) == []
    bad = b._replace(n_obs_ot=b.n_obs_ot + 1)
    with pytest.raises(ValueError, match="n_obs_ot"):
        grid.validate_batch(bad)
    assert grid.validate_batch(bad, strict=False)
    bad2 = b._replace(X=np.where(b.X == 0, np.nan, b.X).astype(np.float32))
    probs = grid.validate_batch(bad2, strict=False)
    assert any("non-finite" in p for p in probs)
    # live step after padding
    dt = np.asarray(b.dt).copy()
    dt[3] = 0.0
    probs = grid.validate_batch(b._replace(dt=dt), strict=False)
    assert any("padding step before" in p for p in probs)


def test_dp_equivalence_1_vs_8_devices():
    """Identical loss and gradients replicated vs sharded over 8 devices
    (SURVEY §4: device-count-parametrized equivalence)."""
    cfg, params, opt, _ = _setup()
    b = _make_batch(B=16)
    bj = jax.tree.map(jnp.asarray, b)

    def loss_fn(p, batch):
        _, loss = njode.forward(p, cfg, batch, train=False, get_loss=True)
        return loss

    l1, g1 = jax.value_and_grad(loss_fn)(params, bj)

    mesh = sharding.make_mesh(8)
    b_sh = sharding.shard_batch(bj, mesh)
    p_sh = jax.device_put(params, NamedSharding(mesh, P()))
    l8, g8 = jax.jit(jax.value_and_grad(loss_fn))(p_sh, b_sh)
    assert np.allclose(float(l1), float(l8), rtol=1e-6)
    f1 = jax.flatten_util.ravel_pytree(g1)[0]
    f8 = jax.flatten_util.ravel_pytree(g8)[0]
    assert np.allclose(np.asarray(f1), np.asarray(f8), rtol=1e-5,
                       atol=1e-7)


import jax.flatten_util  # noqa: E402


def test_async_meta_staged_until_wait(tmp_path):
    """Async orbax saves stage the meta file and publish it only once the
    payload write has finished (ADVICE r1: crash between them must not
    pair fresh metadata with an old payload)."""
    import os
    cfg, params, opt, opt_state = _setup()
    d = str(tmp_path / "ck")
    checkpoints.save_checkpoint_orbax(d, params, opt_state, epoch=3,
                                      weight=0.7, async_save=True)
    meta = os.path.join(d, checkpoints.META_FILE)
    assert not os.path.exists(meta)
    assert os.path.exists(meta + ".pending")
    checkpoints.wait_for_async_saves()
    assert os.path.exists(meta) and not os.path.exists(meta + ".pending")
    _, _, ep, w = checkpoints.load_checkpoint(d, params, opt_state)
    assert ep == 3 and w == 0.7


def test_msgpack_save_drains_async_orbax_same_slot(tmp_path):
    """save_checkpoint after an in-flight async orbax save to the same slot
    must not be shadowed by the stale orbax payload (ADVICE r1)."""
    cfg, params, opt, opt_state = _setup()
    d = str(tmp_path / "ck")
    checkpoints.save_checkpoint_orbax(d, params, opt_state, epoch=1,
                                      weight=0.9, async_save=True)
    p2 = jax.tree.map(lambda a: a + 1.0, params)
    checkpoints.save_checkpoint(d, p2, opt_state, epoch=2, weight=0.5)
    pr, _, ep, w = checkpoints.load_checkpoint(d, params, opt_state)
    assert ep == 2 and w == 0.5
    chk = jax.tree.map(lambda a, b: np.allclose(a, b), p2, pr)
    assert all(jax.tree.leaves(chk))
