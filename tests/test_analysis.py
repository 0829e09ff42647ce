"""Analysis-layer tests: training overview, convergence plot, loss plots,
progress GIF, plot-from-checkpoint, cross-validation aggregation."""

import json
import os

import numpy as np
import pytest

import conftest  # noqa: F401

from njode_tpu.analysis import extras
from njode_tpu.data import datasets as du
from njode_tpu.training import trainer

SMALL_HP = dict(drift=2.0, volatility=0.3, mean=4, speed=2.0,
                correlation=0.5, nb_paths=40, nb_steps=20, S0=1,
                maturity=1.0, dimension=1, obs_perc=0.15,
                scheme="euler", return_vol=False, v0=1)


@pytest.fixture(scope="module")
def trained_models(tmp_path_factory):
    """Two tiny trained models (different training_size) with plots+metrics."""
    base = str(tmp_path_factory.mktemp("training_data_an"))
    du.create_dataset("BlackScholes", SMALL_HP, seed=1, base_path=base)
    smp = str(tmp_path_factory.mktemp("saved_models_an"))
    for tsize in (16, 32):
        trainer.train(
            model_id=None, epochs=2, batch_size=16, save_every=1,
            learning_rate=0.01, test_size=0.2, seed=398,
            hidden_size=10, dropout_rate=0.0,
            ode_nn=((10, "tanh"),), readout_nn=((10, "tanh"),),
            enc_nn=((10, "tanh"),),
            dataset="BlackScholes", plot=True, paths_to_plot=(0,),
            saved_models_path=smp, base_data_path=base, evaluate=True,
            training_size=tsize, plot_save_format="png")
    return base, smp


def test_get_training_overview(trained_models):
    _, smp = trained_models
    df = extras.get_training_overview(path=smp)
    assert sorted(df["id"].values.tolist()) == [1, 2]
    assert set(df["training_size"].values) == {16, 32}
    assert (df["network_size"] == 10).all()
    assert (df["epochs_trained"] == 2).all()
    assert np.isfinite(df["eval_metric_min"].values.astype(float)).all()
    assert os.path.exists(os.path.join(
        smp, "model_overview-training_results.csv"))


def test_plot_losses(trained_models, tmp_path):
    _, smp = trained_models
    files = [os.path.join(smp, f"id-{i}", f"metric_id-{i}.csv")
             for i in (1, 2)]
    out = extras.plot_losses(files, ["m1", "m2"], path=str(tmp_path),
                             filename="losses.png")
    assert os.path.exists(out)


def test_plot_convergence_study(trained_models, tmp_path):
    _, smp = trained_models
    out = extras.plot_convergence_study(
        path=smp, x_axis="training_size", save_path=str(tmp_path))
    assert os.path.exists(out)


def test_plot_loss_and_metric(trained_models):
    _, smp = trained_models
    outs = extras.plot_loss_and_metric(model_ids=(1,), saved_models_path=smp)
    assert all(os.path.exists(o) for o in outs)


def test_generate_training_progress_gif(trained_models):
    _, smp = trained_models
    out = extras.generate_training_progress_gif(1, which_path=0,
                                                saved_models_path=smp)
    assert out.endswith(".gif") and os.path.exists(out)
    assert os.path.getsize(out) > 0


def test_plot_paths_from_checkpoint(trained_models):
    base, smp = trained_models
    ret = extras.plot_paths_from_checkpoint(
        model_ids=(1,), which="best", saved_models_path=smp,
        base_data_path=base, plot_save_format="png")
    assert ret == 0
    plots = os.listdir(os.path.join(smp, "id-1", "plots"))
    assert any(f.startswith("demo-plot") for f in plots)


def test_get_cross_validation(trained_models, tmp_path):
    _, smp = trained_models
    out_csv = str(tmp_path / "cv.csv")
    df = extras.get_cross_validation(
        params_extract_desc=("dataset", "network_size", "training_size"),
        val_test_params_extract=(
            ("min", "evaluation_mean_diff", "evaluation_mean_diff",
             "eval_metric_min"),),
        target_col=("eval_metric_min",),
        param_combinations=({"network_size": 10},),
        save_path=out_csv, path=smp)
    assert os.path.exists(out_csv)
    assert len(df) == 1
    assert np.isfinite(df["mean_eval_metric_min"].values.astype(float)).all()


def _fake_run_dir(tmp_path, cols):
    """A saved-models dir with one registered run whose metric CSV has only
    ``cols`` (no evaluation_mean_diff)."""
    import pandas as pd
    smp = str(tmp_path / "smp")
    os.makedirs(os.path.join(smp, "id-1"), exist_ok=True)
    desc = json.dumps({"enc_nn": [[10, "tanh"]], "hidden_size": 10,
                       "dataset": "BlackScholes",
                       "options": {"training_size": 16}})
    pd.DataFrame([[1, desc]], columns=["id", "description"]).to_csv(
        os.path.join(smp, "model_overview.csv"))
    data = {c: [0.1, 0.2] for c in cols}
    data["epoch"] = [1, 2]
    pd.DataFrame(data).to_csv(os.path.join(smp, "id-1", "metric_id-1.csv"))
    return smp


def test_overview_warns_on_missing_metric_column(tmp_path):
    """A run without evaluation_mean_diff gets empty aggregate cells plus a
    warning naming the column (r1 VERDICT: no blind exception swallowing)."""
    smp = _fake_run_dir(tmp_path, ["train_loss", "eval_loss"])
    with pytest.warns(UserWarning, match="evaluation_mean_diff"):
        df = extras.get_training_overview(path=smp, save_file=False)
    assert df.loc[df.index[0], "eval_metric_min"] is None


def test_convergence_study_missing_column_message(tmp_path):
    smp = _fake_run_dir(tmp_path, ["train_loss", "eval_loss"])
    with pytest.raises(ValueError, match="evaluation_mean_diff"):
        extras.plot_convergence_study(path=smp, x_axis="training_size",
                                      save_path=str(tmp_path / "plots"))
