"""Canonical experiment grids + aux subsystems (profiling, anomaly mode)."""

import os

import numpy as np
import pytest

import conftest  # noqa: F401

from njode_tpu.experiments import configs
from njode_tpu.utils.profiling import StepTimer, trace


def test_base_synthetic_grid():
    params, first_id = configs.base_synthetic()
    assert len(params) == 3 and first_id == 4
    assert {p["dataset"] for p in params} == {
        "BlackScholes", "Heston", "OrnsteinUhlenbeck"}
    assert all(p["epochs"] == 200 and p["batch_size"] == 200 for p in params)


def test_convergence_study_grid():
    params, _ = configs.convergence_study(repeats=5)
    # 6 network sizes x 7 training sizes x 5 repeats (parallel_train.py:303)
    assert len(params) == 6 * 7 * 5
    sizes = {p["ode_nn"][0][0] for p in params}
    assert sizes == {10, 20, 40, 80, 160, 320}
    tsizes = {p["training_size"] for p in params}
    assert min(tsizes) == 200 and max(tsizes) == 12800


def test_gru_ode_bayes_comparison_grid():
    params, _ = configs.gru_ode_bayes_comparison()
    gob = [p for p in params if "other_model" in p]
    nj = [p for p in params if "other_model" not in p]
    # 3 datasets x 2 hidden x 2 impute x 2 logvar x 2 mixing = 48
    assert len(gob) == 48 and len(nj) == 3


def test_climate_cv_grid():
    params, first_id = configs.climate_cross_validation()
    assert first_id == 101
    nj = [p for p in params if "other_model" not in p]
    gob = [p for p in params if "other_model" in p]
    assert len(nj) == 10 and len(gob) == 1          # 2 sizes x 5 folds + ref
    assert {p["data_index"] for p in nj} == {0, 1, 2, 3, 4}


def test_physionet_comparison_grid():
    params, _ = configs.physionet_comparison(repeats=5)
    assert len(params) == 2 * 5
    assert {p["ode_nn"][0][0] for p in params} == {50, 200}
    assert all(p["quantization"] == 0.016 for p in params)


def test_dataset_creating_grids(tmp_path):
    base = str(tmp_path / "td")
    import njode_tpu.data.datasets as du
    small = dict(du.hyperparam_default)
    small["nb_paths"] = 8
    small["nb_steps"] = 5
    # monkey-free small versions: call the helpers with tiny sizes
    import copy
    orig = copy.deepcopy(du.hyperparam_default)
    try:
        du.hyperparam_default.update(small)
        params, _ = configs.combined_regime(base_path=base)
        assert len(params) == 1
        assert params[0]["dataset"].startswith("combined_")
        params, _ = configs.sine_models(base_path=base)
        assert len(params) == 2                      # two sine datasets
    finally:
        du.hyperparam_default.clear()
        du.hyperparam_default.update(orig)


def test_step_timer():
    t = StepTimer()
    t.start()
    for _ in range(5):
        t.step(10)
    out = t.stop()
    assert out["steps_per_sec"] > 0
    assert np.isclose(out["items_per_sec"] / out["steps_per_sec"], 10)


def test_trace_noop_and_capture(tmp_path):
    with trace(None):
        pass
    d = str(tmp_path / "prof")
    import jax.numpy as jnp
    with trace(d):
        jnp.ones(8).sum().block_until_ready()
    assert os.path.isdir(d) and len(os.listdir(d)) > 0


def test_trainer_profile_capture(tmp_path):
    """'profile_dir' option captures a jax.profiler trace of epoch 1."""
    from njode_tpu.data import datasets as du
    from njode_tpu.training import trainer
    base = str(tmp_path / "td")
    hp = dict(du.hyperparam_default)
    hp.update(nb_paths=30, nb_steps=10)
    du.create_dataset("BlackScholes", hp, seed=1, base_path=base)
    prof = str(tmp_path / "prof")
    trainer.train(
        model_id=None, epochs=1, batch_size=10, save_every=5,
        hidden_size=10, dropout_rate=0.0,
        ode_nn=((8, "tanh"),), readout_nn=((8, "tanh"),),
        enc_nn=((8, "tanh"),),
        dataset="BlackScholes", plot=False,
        saved_models_path=str(tmp_path / "sm"), base_data_path=base,
        profile_dir=prof)
    assert os.path.isdir(prof) and len(os.listdir(prof)) > 0


def test_experiments_registry():
    assert set(configs.EXPERIMENTS) == {
        "base_synthetic", "convergence_study", "gru_ode_bayes_comparison",
        "climate_cross_validation", "heston_wo_feller", "combined_regime",
        "physionet_comparison", "sine_models"}


def test_canonical_grids_plan_into_groups():
    """The canonical statistical-harness grids must plan into the intended
    vmap groups AFTER parallel_training's registry JSON round trip:
    climate CV -> two 5-fold groups + the GOB single; the PhysioNet
    comparison -> one group of repeats per network size."""
    import json
    from njode_tpu.experiments import configs
    from njode_tpu.training import climate_group, physionet_group

    def roundtrip(params):
        rt = []
        for i, p in enumerate(params):
            q = json.loads(json.dumps(p, sort_keys=True, default=str))
            q.update(model_id=i + 1, resume_training=False, parallel=True,
                     saved_models_path="/tmp/x")
            rt.append(q)
        return rt

    params, _ = configs.EXPERIMENTS["climate_cross_validation"](epochs=20)
    groups, singles = climate_group.plan_groups(roundtrip(params))
    assert groups == [[0, 1, 2, 3, 4], [5, 6, 7, 8, 9]]
    assert singles == [10]                       # the GRU-ODE-Bayes arm

    params, _ = configs.EXPERIMENTS["physionet_comparison"](
        epochs=8, repeats=3)
    groups, singles = physionet_group.plan_groups(roundtrip(params))
    assert sorted(len(g) for g in groups) == [3, 3] and singles == []
