"""End-to-end trainer tests on a tiny dataset (CPU, 8 virtual devices)."""

import json
import os

import numpy as np
import pytest

import conftest  # noqa: F401  (forces CPU platform)

import jax

from njode_tpu.data import datasets as du
from njode_tpu.training import trainer

SMALL_HP = dict(drift=2.0, volatility=0.3, mean=4, speed=2.0,
                correlation=0.5, nb_paths=80, nb_steps=25, S0=1,
                maturity=1.0, dimension=1, obs_perc=0.15,
                scheme="euler", return_vol=False, v0=1)


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("training_data"))
    path, time_id = du.create_dataset("BlackScholes", SMALL_HP, seed=1,
                                      base_path=base)
    return base, time_id


def test_dataset_roundtrip(tiny_dataset):
    base, time_id = tiny_dataset
    paths, observed, nb_obs, meta = du.load_dataset(
        "BlackScholes", None, base_path=base)
    assert paths.shape == (80, 1, 26)
    assert observed.shape == (80, 26)
    assert np.all(nb_obs == observed[:, 1:].sum(axis=1))
    assert meta["model_name"] == "BlackScholes"
    assert abs(meta["dt"] - 0.04) < 1e-12
    # latest-id resolution
    assert du._get_time_id("BlackScholes", None, base) == time_id


def test_train_end_to_end(tiny_dataset, tmp_path):
    base, _ = tiny_dataset
    smp = str(tmp_path / "saved_models")
    ret = trainer.train(
        model_id=None, epochs=3, batch_size=20, save_every=1,
        learning_rate=0.01, test_size=0.2, seed=398,
        hidden_size=10, bias=True, dropout_rate=0.1,
        ode_nn=((20, "tanh"),), readout_nn=((20, "tanh"),),
        enc_nn=((20, "tanh"),),
        dataset="BlackScholes", plot=False,
        saved_models_path=smp, base_data_path=base, evaluate=True)
    assert ret == 0
    # registry + metric file + checkpoints exist
    assert os.path.exists(os.path.join(smp, "model_overview.csv"))
    metric_file = os.path.join(smp, "id-1", "metric_id-1.csv")
    assert os.path.exists(metric_file)
    import pandas as pd
    dfm = pd.read_csv(metric_file, index_col=0)
    assert list(dfm.columns) == trainer.METR_COLUMNS + [
        "evaluation_mean_diff"]
    assert len(dfm) == 3
    assert np.all(np.isfinite(dfm["eval_loss"].values))
    assert os.path.exists(os.path.join(smp, "id-1", "last_checkpoint",
                                       "checkpt.msgpack"))
    assert os.path.exists(os.path.join(smp, "id-1", "best_checkpoint",
                                       "checkpt.msgpack"))
    # loss should be finite & above optimal
    opt = dfm["optimal_eval_loss"].values[0]
    assert dfm["eval_loss"].values[-1] > 0
    assert np.isfinite(opt)

    # ------- resume by id continues from checkpoint (train.py:400-427) ----
    ret = trainer.train(
        model_id=1, epochs=5, batch_size=20, save_every=1,
        learning_rate=0.01, test_size=0.2, seed=398,
        dataset="BlackScholes", plot=False,
        saved_models_path=smp, base_data_path=base, evaluate=True)
    assert ret == 0
    dfm2 = pd.read_csv(metric_file, index_col=0)
    assert dfm2["epoch"].values.max() == 5
    # epochs are contiguous, no restart from 1
    assert sorted(dfm2["epoch"].values.tolist()) == [1, 2, 3, 4, 5]


def test_training_converges_toward_optimal(tiny_dataset, tmp_path):
    """The reference's correctness criterion: eval_loss -> optimal_eval_loss
    (SURVEY §4.1)."""
    base, _ = tiny_dataset
    smp = str(tmp_path / "saved_models_conv")
    trainer.train(
        model_id=None, epochs=30, batch_size=32, save_every=30,
        learning_rate=0.01, test_size=0.2, seed=398,
        hidden_size=10, dropout_rate=0.0,
        ode_nn=((30, "tanh"),), readout_nn=((30, "tanh"),),
        enc_nn=((30, "tanh"),),
        dataset="BlackScholes", plot=False,
        saved_models_path=smp, base_data_path=base)
    import pandas as pd
    dfm = pd.read_csv(os.path.join(smp, "id-1", "metric_id-1.csv"),
                      index_col=0)
    opt = dfm["optimal_eval_loss"].values[0]
    first, last = dfm["eval_loss"].values[0], dfm["eval_loss"].values[-1]
    # training reduces the gap to the optimum substantially
    assert (last - opt) < 0.5 * (first - opt)


def test_train_with_mesh(tiny_dataset, tmp_path):
    """Data-parallel training over the 8-device CPU mesh."""
    from njode_tpu.parallel import sharding
    base, _ = tiny_dataset
    smp = str(tmp_path / "saved_models_mesh")
    mesh = sharding.make_mesh()
    assert mesh.devices.size == 8
    ret = trainer.train(
        model_id=None, epochs=2, batch_size=16, save_every=5,
        learning_rate=0.01, test_size=0.2, seed=398,
        hidden_size=10, dropout_rate=0.0,
        ode_nn=((20, "tanh"),), readout_nn=((20, "tanh"),),
        enc_nn=((20, "tanh"),),
        dataset="BlackScholes", plot=False,
        saved_models_path=smp, base_data_path=base, mesh=mesh)
    assert ret == 0


def test_train_other_model_gru_ode_bayes(tiny_dataset, tmp_path):
    """Baseline-model training via other_model='GRU_ODE_Bayes'
    (``train.py:354-392``) with the comparison-grid option surface."""
    base, _ = tiny_dataset
    smp = str(tmp_path / "saved_models_gob")
    ret = trainer.train(
        model_id=None, epochs=2, batch_size=20, save_every=5,
        learning_rate=0.01, test_size=0.2, seed=398,
        hidden_size=10, dropout_rate=0.0,
        dataset="BlackScholes", plot=False,
        saved_models_path=smp, base_data_path=base, evaluate=True,
        other_model="GRU_ODE_Bayes",
        **{"GRU_ODE_Bayes-impute": False, "GRU_ODE_Bayes-logvar": True,
           "GRU_ODE_Bayes-mixing": 0.0001})
    assert ret == 0
    import pandas as pd
    dfm = pd.read_csv(os.path.join(smp, "id-1", "metric_id-1.csv"),
                      index_col=0)
    assert len(dfm) == 2
    assert np.all(np.isfinite(dfm["eval_loss"].values))
    assert np.all(np.isfinite(dfm["evaluation_mean_diff"].values))
    # optimal loss is NaN for other models (train.py:285-287 comparability)
    assert np.all(np.isnan(dfm["optimal_eval_loss"].values))


def test_func_appl_X_power2(tiny_dataset, tmp_path):
    """Moment learning: power-2 doubles input/output dims."""
    base, _ = tiny_dataset
    smp = str(tmp_path / "saved_models_m2")
    trainer.train(
        model_id=None, epochs=2, batch_size=20, save_every=5,
        learning_rate=0.01, test_size=0.2, seed=398,
        hidden_size=10, dropout_rate=0.0,
        ode_nn=((20, "tanh"),), readout_nn=((20, "tanh"),),
        enc_nn=((20, "tanh"),),
        dataset="BlackScholes", plot=False,
        saved_models_path=smp, base_data_path=base,
        func_appl_X=["power-2"])
    import pandas as pd
    df = pd.read_csv(os.path.join(smp, "model_overview.csv"), index_col=0)
    desc = json.loads(df["description"].values[0])
    assert desc["input_size"] == 2 and desc["output_size"] == 2


def test_train_combined_dataset(tmp_path):
    """Regime-switching dataset end-to-end: chained simulation, piecewise
    oracle, training + evaluate."""
    base = str(tmp_path / "td_combined")
    hp = dict(SMALL_HP)
    hp.update(nb_paths=40, nb_steps=10, maturity=0.5, mean=10)
    du.create_combined_dataset(
        stock_model_names=("OrnsteinUhlenbeck", "BlackScholes"),
        hyperparam_dicts=(hp, hp), seed=2, base_path=base)
    smp = str(tmp_path / "sm_combined")
    ret = trainer.train(
        model_id=None, epochs=2, batch_size=16, save_every=5,
        learning_rate=0.01, test_size=0.2, seed=398,
        hidden_size=10, dropout_rate=0.0,
        ode_nn=((16, "tanh"),), readout_nn=((16, "tanh"),),
        enc_nn=((16, "tanh"),),
        dataset="combined_OrnsteinUhlenbeck_BlackScholes", plot=False,
        saved_models_path=smp, base_data_path=base, evaluate=True)
    assert ret == 0
    import pandas as pd
    dfm = pd.read_csv(os.path.join(smp, "id-1", "metric_id-1.csv"),
                      index_col=0)
    assert np.isfinite(dfm["optimal_eval_loss"].values).all()
    assert np.isfinite(dfm["evaluation_mean_diff"].values).all()


def test_train_heston_wo_feller_return_vol(tmp_path):
    """2-D observable (spot + variance) with the mixed BS/OU-style oracle."""
    base = str(tmp_path / "td_wof")
    hp = dict(drift=2.0, volatility=3.0, mean=1.0, speed=2.0,
              correlation=0.5, nb_paths=40, nb_steps=12, S0=1,
              maturity=1.0, dimension=2, obs_perc=0.2,
              scheme="euler", return_vol=True, v0=0.5)
    du.create_dataset("HestonWOFeller", hp, seed=3, base_path=base)
    smp = str(tmp_path / "sm_wof")
    ret = trainer.train(
        model_id=None, epochs=2, batch_size=16, save_every=5,
        learning_rate=0.01, test_size=0.2, seed=398,
        hidden_size=10, dropout_rate=0.0,
        ode_nn=((16, "tanh"),), readout_nn=((16, "tanh"),),
        enc_nn=((16, "tanh"),),
        dataset="HestonWOFeller", plot=False,
        saved_models_path=smp, base_data_path=base, evaluate=True)
    assert ret == 0
    import pandas as pd
    dfm = pd.read_csv(os.path.join(smp, "id-1", "metric_id-1.csv"),
                      index_col=0)
    assert np.isfinite(dfm["eval_loss"].values).all()
    assert np.isfinite(dfm["evaluation_mean_diff"].values).all()


def test_train_sine_dataset(tmp_path):
    """Explicit time dependence (sine drift) flows through simulation,
    oracle, and training."""
    base = str(tmp_path / "td_sine")
    hp = dict(SMALL_HP)
    hp["sine_coeff"] = 2 * np.pi
    du.create_dataset("sine_BlackScholes", hp, seed=4, base_path=base)
    smp = str(tmp_path / "sm_sine")
    ret = trainer.train(
        model_id=None, epochs=2, batch_size=16, save_every=5,
        learning_rate=0.01, test_size=0.2, seed=398,
        hidden_size=10, dropout_rate=0.0,
        ode_nn=((16, "tanh"),), readout_nn=((16, "tanh"),),
        enc_nn=((16, "tanh"),),
        dataset="sine_BlackScholes", plot=False,
        saved_models_path=smp, base_data_path=base, evaluate=True)
    assert ret == 0


def test_train_with_orbax_checkpoints(tiny_dataset, tmp_path):
    """The async orbax backend behind the trainer option surface
    (use_orbax/orbax_async) produces resumable checkpoints."""
    base, _ = tiny_dataset
    smp = str(tmp_path / "saved_models_orbax")
    kw = dict(
        batch_size=20, save_every=1, learning_rate=0.01, test_size=0.2,
        seed=398, hidden_size=10, dropout_rate=0.0,
        ode_nn=((10, "tanh"),), readout_nn=((10, "tanh"),),
        enc_nn=((10, "tanh"),), dataset="BlackScholes", plot=False,
        saved_models_path=smp, base_data_path=base,
        use_orbax=True, orbax_async=True)
    assert trainer.train(model_id=None, epochs=2, **kw) == 0
    slot = os.path.join(smp, "id-1", "last_checkpoint")
    assert os.path.isdir(os.path.join(slot, "orbax"))
    assert os.path.exists(os.path.join(slot, "checkpt_meta.json"))
    # resume from the orbax checkpoint and train one more epoch
    assert trainer.train(model_id=1, epochs=3, **kw) == 0
    import pandas as pd
    dfm = pd.read_csv(os.path.join(smp, "id-1", "metric_id-1.csv"),
                      index_col=0)
    assert dfm["epoch"].values.tolist() == [1, 2, 3]


def test_remat_scan_matches_plain_backward():
    """jax.checkpoint on the scan body (SURVEY §2.16 SP row) must not change
    loss or gradients — only the backward's memory/compute trade."""
    import jax
    import jax.numpy as jnp
    import jax.flatten_util
    from njode_tpu.data import grid
    from njode_tpu.models import njode

    rs = np.random.RandomState(3)
    B, K = 12, 30
    paths = rs.lognormal(0, 0.2, (B, 2, K + 1))
    obs = (rs.random((B, K + 1)) < 0.3).astype(np.int64)
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, obs, 1.0 / K))
    bj = jax.tree.map(jnp.asarray, b)
    cfg = njode.NJODEConfig(input_size=2, hidden_size=8, output_size=2,
                            ode_nn=((16, "tanh"),),
                            readout_nn=((16, "tanh"),),
                            enc_nn=((16, "tanh"),), dropout_rate=0.1,
                            masked=True)
    params = njode.init_params(jax.random.PRNGKey(0), cfg)
    rng = jax.random.PRNGKey(5)

    def loss(p, remat):
        return njode.forward(p, cfg, bj, rng=rng, train=True,
                             get_loss=True, remat=remat)[1]

    l0, g0 = jax.value_and_grad(loss)(params, False)
    l1, g1 = jax.value_and_grad(loss)(params, True)
    assert np.allclose(float(l0), float(l1), rtol=1e-6)
    f0 = np.asarray(jax.flatten_util.ravel_pytree(g0)[0])
    f1 = np.asarray(jax.flatten_util.ravel_pytree(g1)[0])
    assert np.allclose(f0, f1, rtol=1e-5, atol=1e-8)

    # GOB too
    from njode_tpu.models import gru_ode_bayes as gob
    gcfg = gob.GOBConfig(input_size=2, hidden_size=8, p_hidden=8,
                         prep_hidden=4, cov_size=2, cov_hidden=8,
                         impute=False, full_gru_ode=True)
    gparams = gob.init_params(jax.random.PRNGKey(1), gcfg)

    def gloss(p, remat):
        return gob.forward(p, gcfg, bj, rng=rng, train=True,
                           get_loss=True, remat=remat)[1]

    gl0, gg0 = jax.value_and_grad(gloss)(gparams, False)
    gl1, gg1 = jax.value_and_grad(gloss)(gparams, True)
    assert np.allclose(float(gl0), float(gl1), rtol=1e-6)
    gf0 = np.asarray(jax.flatten_util.ravel_pytree(gg0)[0])
    gf1 = np.asarray(jax.flatten_util.ravel_pytree(gg1)[0])
    assert np.allclose(gf0, gf1, rtol=1e-5, atol=1e-8)


def test_per_step_dropout_draws_above_budget(monkeypatch):
    """Above FUSED_DRAW_BUDGET, forward draws dropout per step inside the
    scan (fold_in counter) instead of materializing the [K,S,B,Wmax]
    tensor — the fused draw's remat copies OOM'd HBM at climate-400 scale
    under a 5-member vmapped fold group (58G/15.75G, round 3). The
    per-step stream must be deterministic, remat-invariant, and identical
    between a solo forward and a vmapped (grouped) forward."""
    import jax
    import jax.numpy as jnp
    import jax.flatten_util
    from njode_tpu.data import grid
    from njode_tpu.models import njode

    rs = np.random.RandomState(3)
    B, K = 12, 30
    paths = rs.lognormal(0, 0.2, (B, 2, K + 1))
    obs = (rs.random((B, K + 1)) < 0.3).astype(np.int64)
    b = grid.recompute_n_obs(grid.batch_from_paths(paths, obs, 1.0 / K))
    bj = jax.tree.map(jnp.asarray, b)
    cfg = njode.NJODEConfig(input_size=2, hidden_size=8, output_size=2,
                            ode_nn=((16, "tanh"),),
                            readout_nn=((16, "tanh"),),
                            enc_nn=((16, "tanh"),), dropout_rate=0.1)
    params = njode.init_params(jax.random.PRNGKey(0), cfg)
    rng = jax.random.PRNGKey(5)

    def loss(p, remat=False):
        return njode.forward(p, cfg, bj, rng=rng, train=True,
                             get_loss=True, remat=remat)[1]

    l_fused = float(loss(params))
    monkeypatch.setattr(njode, "FUSED_DRAW_BUDGET", 0)
    l_ps, g_ps = jax.value_and_grad(loss)(params)
    # a different (per-step) stream, same loss scale, finite grads
    assert np.isfinite(float(l_ps)) and float(l_ps) != l_fused
    assert np.isfinite(
        np.asarray(jax.flatten_util.ravel_pytree(g_ps)[0])).all()
    # deterministic + remat-invariant (the per-step keys recompute exactly)
    assert float(loss(params)) == float(l_ps)
    l_rm, g_rm = jax.value_and_grad(lambda p: loss(p, remat=True))(params)
    assert np.allclose(float(l_rm), float(l_ps), rtol=1e-6)
    assert np.allclose(
        np.asarray(jax.flatten_util.ravel_pytree(g_rm)[0]),
        np.asarray(jax.flatten_util.ravel_pytree(g_ps)[0]),
        rtol=1e-5, atol=1e-8)
    # vmapped members reproduce their solo streams bit-for-bit (the gate
    # depends only on per-member shapes, so grouped == solo holds in the
    # per-step regime exactly as in the fused-draw regime)
    pe = jax.vmap(lambda k: njode.init_params(k, cfg))(
        jax.random.split(jax.random.PRNGKey(2), 3))
    lv = jax.vmap(loss)(pe)
    ls = [float(loss(jax.tree.map(lambda a, i=i: a[i], pe)))
          for i in range(3)]
    assert np.allclose(np.asarray(lv), np.asarray(ls), rtol=1e-6)


def test_remat_shrinks_backward_memory():
    """Compiled temp-buffer footprint of a train step with scan remat must
    be a small fraction of the plain backward's (VERDICT r1 #4; measured
    5.9x temp-HBM reduction at PhysioNet scale on TPU — RESULTS.md)."""
    import jax
    import jax.numpy as jnp
    import optax
    from njode_tpu.data.grid import GridBatch
    from njode_tpu.models import njode
    from njode_tpu.training.steps import make_optimizer

    B, K, D, H = 32, 400, 5, 10
    cfg = njode.NJODEConfig(D, H, D, ((20, "tanh"),), ((20, "tanh"),),
                            ((20, "tanh"),), dropout_rate=0.0, masked=True)
    params = njode.init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-3)
    ost = opt.init(params)
    obs = np.zeros((K, B), np.float32)
    obs[::5] = 1.0
    batch = GridBatch(
        times=jnp.asarray((np.arange(1, K + 1) / K).astype(np.float32)),
        dt=jnp.full((K,), 1.0 / K, jnp.float32), obs=jnp.asarray(obs),
        X=jnp.zeros((K, B, D)),
        M=jnp.asarray(np.broadcast_to(obs[:, :, None], (K, B, D)).copy()),
        start_X=jnp.zeros((B, D)), n_obs_ot=jnp.asarray(obs.sum(0)))

    def temp_bytes(remat):
        def ts(params, ost, batch):
            def loss_fn(p):
                return njode.forward(p, cfg, batch,
                                     rng=jax.random.PRNGKey(0), train=True,
                                     get_loss=True, remat=remat)[1]
            loss, g = jax.value_and_grad(loss_fn)(params)
            up, o2 = opt.update(g, ost, params)
            return optax.apply_updates(params, up), o2, loss

        ma = jax.jit(ts).lower(params, ost, batch).compile() \
            .memory_analysis()
        if ma is None or not hasattr(ma, "temp_size_in_bytes"):
            pytest.skip("memory_analysis unavailable on this backend")
        return ma.temp_size_in_bytes

    plain, rematted = temp_bytes(False), temp_bytes(True)
    assert rematted < plain / 4, (plain, rematted)


def test_train_with_ema_averaging(tiny_dataset, tmp_path):
    """'ema_decay' maintains an epoch-level Polyak average and logs its
    eval columns (round-3 accuracy-campaign instrumentation)."""
    base, _ = tiny_dataset
    smp = str(tmp_path / "saved_models_ema")
    ret = trainer.train(
        model_id=None, epochs=3, batch_size=20, save_every=1,
        learning_rate=0.01, test_size=0.2, seed=398,
        hidden_size=10, bias=True, dropout_rate=0.1,
        ode_nn=((20, "tanh"),), readout_nn=((20, "tanh"),),
        enc_nn=((20, "tanh"),),
        dataset="BlackScholes", plot=False,
        saved_models_path=smp, base_data_path=base, evaluate=True,
        ema_decay=0.5)
    assert ret == 0
    import pandas as pd
    dfm = pd.read_csv(os.path.join(smp, "id-1", "metric_id-1.csv"),
                      index_col=0)
    for col in ("eval_loss_ema", "evaluation_mean_diff_ema"):
        assert col in dfm.columns
        assert np.isfinite(dfm[col].values).all()
    # epoch 1: ema = 0.5*init + 0.5*params_1 differs from the last iterate
    assert not np.allclose(dfm["eval_loss_ema"].values,
                           dfm["eval_loss"].values)


def test_epoch_chunk_matches_per_epoch_loop(tiny_dataset, tmp_path):
    """'epoch_chunk' (N epochs + evals as one device program) must
    reproduce the per-epoch loop's metric values and checkpoints exactly
    (same perms/weights/rng streams; times are amortized)."""
    base, _ = tiny_dataset

    def run(tag, **kw):
        smp = str(tmp_path / tag)
        ret = trainer.train(
            model_id=None, epochs=5, batch_size=16, save_every=2,
            learning_rate=0.01, test_size=0.2, seed=398,
            hidden_size=10, bias=True, dropout_rate=0.1,
            ode_nn=((20, "tanh"),), readout_nn=((20, "tanh"),),
            enc_nn=((20, "tanh"),), weight=0.7, weight_decay=0.9,
            dataset="BlackScholes", plot=False,
            saved_models_path=smp, base_data_path=base, evaluate=True,
            **kw)
        assert ret == 0
        import pandas as pd
        return smp, pd.read_csv(os.path.join(smp, "id-1", "metric_id-1.csv"),
                                index_col=0)

    smp_c, dc = run("chunked", epoch_chunk=2)
    smp_p, dp = run("plain")
    assert dc["epoch"].tolist() == dp["epoch"].tolist() == [1, 2, 3, 4, 5]
    for col in ("train_loss", "eval_loss", "optimal_eval_loss",
                "evaluation_mean_diff"):
        np.testing.assert_allclose(dc[col].values, dp[col].values,
                                   rtol=1e-6, atol=1e-7, err_msg=col)
    # checkpoints: same (epoch, weight) metadata and same weights
    import jax.flatten_util
    from njode_tpu.models import njode
    from njode_tpu.training import checkpoints
    from njode_tpu.training.steps import make_optimizer
    cfg = njode.NJODEConfig(1, 10, 1, ((20, "tanh"),), ((20, "tanh"),),
                            ((20, "tanh"),), dropout_rate=0.1)
    like = njode.init_params(jax.random.PRNGKey(0), cfg)
    olike = make_optimizer(0.01).init(like)
    for slot in ("last_checkpoint", "best_checkpoint"):
        pc, _, ec, wc = checkpoints.load_checkpoint(
            os.path.join(smp_c, "id-1", slot), like, olike)
        pp, _, ep, wp = checkpoints.load_checkpoint(
            os.path.join(smp_p, "id-1", slot), like, olike)
        assert ec == ep and abs(wc - wp) < 1e-9, slot
        fc = jax.flatten_util.ravel_pytree(pc)[0]
        fp = jax.flatten_util.ravel_pytree(pp)[0]
        np.testing.assert_allclose(np.asarray(fc), np.asarray(fp),
                                   rtol=1e-6, atol=1e-7, err_msg=slot)


def test_trainer_pallas_options_thread_through(tiny_dataset, tmp_path):
    """'use_pallas'/'pallas_mask_mode'/'pallas_interpret' are trainer
    options: the end-to-end trainer driven through the interpret-mode
    kernel in 'input' mask mode (the exact-parity dropout path) must
    reproduce the XLA-scan run's metrics."""
    base, _ = tiny_dataset

    def run(tag, **kw):
        smp = str(tmp_path / tag)
        ret = trainer.train(
            model_id=None, epochs=2, batch_size=16, save_every=1,
            learning_rate=0.01, test_size=0.2, seed=398,
            hidden_size=10, bias=True, dropout_rate=0.1,
            ode_nn=((20, "tanh"),), readout_nn=((20, "tanh"),),
            enc_nn=((20, "tanh"),),
            dataset="BlackScholes", plot=False,
            saved_models_path=smp, base_data_path=base, evaluate=True,
            **kw)
        assert ret == 0
        import pandas as pd
        return pd.read_csv(os.path.join(smp, "id-1", "metric_id-1.csv"),
                           index_col=0)

    dk = run("kernel", use_pallas=True, pallas_mask_mode="input",
             pallas_interpret=True)
    dx = run("xla", use_pallas=False)
    for col in ("train_loss", "eval_loss", "evaluation_mean_diff"):
        np.testing.assert_allclose(dk[col].values, dx[col].values,
                                   rtol=1e-5, atol=1e-6, err_msg=col)


def test_gob_epoch_chunk_matches_per_epoch_loop(tiny_dataset, tmp_path):
    """GRU-ODE-Bayes now has whole-epoch and multi-epoch device programs
    (models/gru_ode_bayes.py train_epoch/train_epochs, same contracts as
    training/steps.py): 'epoch_chunk' must reproduce the per-epoch loop's
    metrics exactly for the baseline model too."""
    base, _ = tiny_dataset

    def run(tag, **kw):
        smp = str(tmp_path / tag)
        ret = trainer.train(
            model_id=None, epochs=4, batch_size=16, save_every=2,
            learning_rate=0.01, test_size=0.2, seed=398,
            hidden_size=10, bias=True, dropout_rate=0.1,
            ode_nn=((20, "tanh"),), readout_nn=((20, "tanh"),),
            enc_nn=((20, "tanh"),),
            dataset="BlackScholes", plot=False,
            saved_models_path=smp, base_data_path=base, evaluate=True,
            other_model="GRU_ODE_Bayes", solver="euler",
            **{"GRU_ODE_Bayes-impute": False, "GRU_ODE_Bayes-logvar": True,
               "GRU_ODE_Bayes-mixing": 0.0001}, **kw)
        assert ret == 0
        import pandas as pd
        return pd.read_csv(os.path.join(smp, "id-1", "metric_id-1.csv"),
                           index_col=0)

    dc = run("gob_chunked", epoch_chunk=2)
    dp = run("gob_plain")
    assert dc["epoch"].tolist() == dp["epoch"].tolist() == [1, 2, 3, 4]
    for col in ("train_loss", "eval_loss"):
        np.testing.assert_allclose(dc[col].values, dp[col].values,
                                   rtol=1e-6, atol=1e-7, err_msg=col)


def test_repeat_seed_streams(tiny_dataset, tmp_path):
    """'repeat_seed' gives repeated sweep entries independent init/shuffle/
    dropout streams (the reference's unseeded-repeat variance, explicit)
    while keeping the train/val split pinned to 'seed'. Absent == 0
    byte-identically; nonzero differs."""
    base, _ = tiny_dataset
    import pandas as pd

    def run(tag, **kw):
        smp = str(tmp_path / tag)
        ret = trainer.train(
            model_id=None, epochs=3, batch_size=20, save_every=1,
            learning_rate=0.01, test_size=0.2, seed=398,
            hidden_size=10, bias=True, dropout_rate=0.1,
            ode_nn=((20, "tanh"),), readout_nn=((20, "tanh"),),
            enc_nn=((20, "tanh"),),
            dataset="BlackScholes", plot=False,
            saved_models_path=smp, base_data_path=base, evaluate=True, **kw)
        assert ret == 0
        return pd.read_csv(os.path.join(smp, "id-1", "metric_id-1.csv"),
                           index_col=0)

    d_abs = run("rs_absent")
    d_0 = run("rs_zero", repeat_seed=0)
    d_1 = run("rs_one", repeat_seed=1)
    for col in ("train_loss", "eval_loss", "evaluation_mean_diff"):
        np.testing.assert_array_equal(d_abs[col].values, d_0[col].values,
                                      err_msg=col)
    assert not np.array_equal(d_abs["train_loss"].values,
                              d_1["train_loss"].values)
    assert not np.array_equal(d_abs["evaluation_mean_diff"].values,
                              d_1["evaluation_mean_diff"].values)
    # split unchanged -> same validation set -> same optimal loss
    np.testing.assert_array_equal(d_abs["optimal_eval_loss"].values,
                                  d_1["optimal_eval_loss"].values)
