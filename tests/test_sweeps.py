"""Sweep orchestration tests: grid expansion, dispatch, id reconciliation,
resume with overwrite_params."""

import json
import os

import numpy as np
import pytest

import conftest  # noqa: F401

from njode_tpu.data import datasets as du
from njode_tpu.training import sweeps

SMALL_HP = dict(drift=2.0, volatility=0.3, mean=4, speed=2.0,
                correlation=0.5, nb_paths=40, nb_steps=20, S0=1,
                maturity=1.0, dimension=1, obs_perc=0.15,
                scheme="euler", return_vol=False, v0=1)


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("training_data_sweep"))
    du.create_dataset("BlackScholes", SMALL_HP, seed=1, base_path=base)
    return base


def test_get_parameter_array():
    grid = sweeps.get_parameter_array({"lr": [0.1, 0.01], "h": [5, 10, 20]})
    assert len(grid) == 6
    assert {"lr": 0.1, "h": 5} in grid


def test_train_switcher_dispatch_errors():
    with pytest.raises(KeyError):
        sweeps.train_switcher(epochs=1)
    with pytest.raises(ValueError):
        sweeps.train_switcher(dataset="nope")


def test_parallel_training_and_resume(tiny_dataset, tmp_path):
    smp = str(tmp_path / "sweep_models")
    base_param = dict(
        epochs=1, batch_size=20, save_every=1, learning_rate=0.01,
        test_size=0.2, seed=398, hidden_size=10, dropout_rate=0.0,
        ode_nn=((10, "tanh"),), readout_nn=((10, "tanh"),),
        enc_nn=((10, "tanh"),), dataset="BlackScholes", plot=False,
        saved_models_path=smp, base_data_path=tiny_dataset)
    grid = sweeps.get_parameter_array(
        {**{k: [v] for k, v in base_param.items()},
         "learning_rate": [0.01, 0.005]})
    assert len(grid) == 2

    results = sweeps.parallel_training(params=grid, nb_jobs=1)
    assert results == [0, 0]
    import pandas as pd
    df = pd.read_csv(os.path.join(smp, "model_overview.csv"), index_col=0)
    assert sorted(df["id"].values.tolist()) == [1, 2]
    for mid in (1, 2):
        assert os.path.exists(os.path.join(smp, f"id-{mid}",
                                           f"metric_id-{mid}.csv"))

    # resume both ids, extending epochs via overwrite_params
    results = sweeps.parallel_training(
        model_ids=[1, 2], saved_models_path=smp,
        overwrite_params={"epochs": 2})
    assert results == [0, 0]
    df = pd.read_csv(os.path.join(smp, "model_overview.csv"), index_col=0)
    for mid in (1, 2):
        desc = json.loads(
            df["description"].loc[df["id"] == mid].values[0])
        assert desc["epochs"] == 2
        dfm = pd.read_csv(os.path.join(smp, f"id-{mid}",
                                       f"metric_id-{mid}.csv"), index_col=0)
        assert sorted(dfm["epoch"].values.tolist()) == [1, 2]

    # re-running the same sweep with first_id resumes (no new ids)
    results = sweeps.parallel_training(params=list(grid), first_id=1)
    df = pd.read_csv(os.path.join(smp, "model_overview.csv"), index_col=0)
    assert sorted(df["id"].values.tolist()) == [1, 2]


def test_parallel_training_isolates_per_run_failures(tiny_dataset, tmp_path):
    """One bad config must not zero the whole sweep: the failing run's
    return value is the exception, the remaining runs still train (the
    round-5 gob-block failure mode — reference parallel_train.py:229-238
    returns None for everything; consciously deviated)."""
    smp = str(tmp_path / "iso_models")
    good = dict(
        epochs=1, batch_size=20, save_every=1, learning_rate=0.01,
        test_size=0.2, seed=398, hidden_size=10, dropout_rate=0.0,
        ode_nn=((10, "tanh"),), readout_nn=((10, "tanh"),),
        enc_nn=((10, "tanh"),), dataset="BlackScholes", plot=False,
        saved_models_path=smp, base_data_path=tiny_dataset)
    bad = dict(good, dataset="NoSuchDataset")  # train_switcher raises
    results = sweeps.parallel_training(params=[dict(good), bad, dict(good)],
                                       nb_jobs=1)
    assert results is not None and len(results) == 3
    assert results[0] == 0 and results[2] == 0
    assert isinstance(results[1], Exception)
    for mid in (1, 3):
        assert os.path.exists(os.path.join(smp, f"id-{mid}"))
