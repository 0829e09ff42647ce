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
