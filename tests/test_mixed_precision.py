"""Mixed-precision (compute_dtype='bfloat16') tests.

The bf16 path rounds matmul OPERANDS to bfloat16 and contracts with
fp32 accumulation (``mlp._mm``); params, activations between layers,
scan carries and optimizer state all stay float32.  No reference
counterpart (the reference trains fp32/fp64 on CPU/GPU,
/root/reference/NJODE/models.py) — this is the TPU-native MXU option.
"""

import numpy as np
import pytest

import conftest  # noqa: F401  (forces CPU platform)

import jax
import jax.numpy as jnp

from njode_tpu.data import grid, sde
from njode_tpu.models import njode
from njode_tpu.ops import fused_scan

BASE = dict(input_size=1, hidden_size=10, output_size=1,
            ode_nn=((32, "tanh"),), readout_nn=((32, "tanh"),),
            enc_nn=((32, "tanh"),))


def _batch(B=24, steps=30, seed=0):
    hp = dict(drift=2.0, volatility=0.3, mean=4.0, speed=2.0,
              correlation=0.5, nb_paths=B, nb_steps=steps, S0=1.0,
              maturity=1.0, dimension=1)
    model = sde.make_model("BlackScholes", hp)
    paths, dt = model.generate_paths(jax.random.PRNGKey(seed))
    rs = np.random.RandomState(seed + 1)
    obs = (rs.random((B, steps + 1)) < 0.15).astype(np.int64)
    obs[:, 0] = 0
    for i in range(B):
        if obs[i].sum() == 0:
            obs[i, 1 + rs.randint(steps)] = 1
    b = grid.recompute_n_obs(grid.batch_from_paths(np.asarray(paths),
                                                   obs, dt))
    return jax.tree.map(jnp.asarray, b)


def test_config_validates_compute_dtype():
    with pytest.raises(ValueError, match="compute_dtype"):
        njode.NJODEConfig(compute_dtype="float16", **BASE)
    assert njode.NJODEConfig(**BASE).dot_dtype is None
    assert (njode.NJODEConfig(compute_dtype="bfloat16", **BASE).dot_dtype
            is jnp.bfloat16)


@pytest.mark.parametrize("use_rnn", [False, True])
def test_bf16_close_to_fp32_and_grads_stay_fp32(use_rnn):
    b = _batch()
    cfg32 = njode.NJODEConfig(use_rnn=use_rnn, **BASE)
    cfg16 = njode.NJODEConfig(use_rnn=use_rnn, compute_dtype="bfloat16",
                              **BASE)
    params = njode.init_params(jax.random.PRNGKey(1), cfg32)

    def loss(p, cfg):
        return njode.forward(p, cfg, b, train=True,
                             rng=jax.random.PRNGKey(2))[1]

    l32, g32 = jax.value_and_grad(loss)(params, cfg32)
    l16, g16 = jax.value_and_grad(loss)(params, cfg16)
    # bf16 has ~3 decimal digits; losses agree to ~1e-2 relative
    assert abs(float(l16) - float(l32)) / abs(float(l32)) < 2e-2
    # every grad leaf stays float32 (master-weight recipe)
    for leaf in jax.tree.leaves(g16):
        assert leaf.dtype == jnp.float32
    # grad direction agrees (cosine similarity)
    v32 = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g32)])
    v16 = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g16)])
    cos = float(v32 @ v16 / (jnp.linalg.norm(v32) * jnp.linalg.norm(v16)))
    assert cos > 0.99


def test_fused_kernel_gates_off_bf16():
    """The Pallas kernel is fp32 end-to-end; bf16 configs take the XLA
    path (and the option surfaces don't silently change numerics)."""
    assert fused_scan.supported(njode.NJODEConfig(**BASE))
    assert not fused_scan.supported(
        njode.NJODEConfig(compute_dtype="bfloat16", **BASE))


def test_trainer_accepts_compute_dtype(tmp_path):
    from njode_tpu.data import datasets as du
    from njode_tpu.training import trainer
    hp = dict(drift=2.0, volatility=0.3, mean=4, speed=2.0, correlation=0.5,
              nb_paths=40, nb_steps=20, S0=1, maturity=1.0, dimension=1,
              obs_perc=0.15, scheme="euler", return_vol=False, v0=1)
    base = str(tmp_path / "data")
    du.create_dataset("BlackScholes", hp, seed=1, base_path=base)
    smp = str(tmp_path / "saved_models")
    ret = trainer.train(
        model_id=None, epochs=2, batch_size=20, save_every=1,
        learning_rate=0.01, test_size=0.2, seed=7,
        hidden_size=10, bias=True, dropout_rate=0.1,
        ode_nn=((16, "tanh"),), readout_nn=((16, "tanh"),),
        enc_nn=((16, "tanh"),), compute_dtype="bfloat16",
        dataset="BlackScholes", plot=False,
        saved_models_path=smp, base_data_path=base, evaluate=True)
    assert ret == 0
    import pandas as pd
    dfm = pd.read_csv(str(tmp_path / "saved_models" / "id-1" /
                          "metric_id-1.csv"), index_col=0)
    assert np.all(np.isfinite(dfm["eval_loss"].values))
